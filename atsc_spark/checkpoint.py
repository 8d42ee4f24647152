"""Checkpoint / lineage table and resumable stage execution.

North-rule requirement with no reference equivalent (the reference is
a one-shot CLI).  Every stage run writes one lineage row per partition
key; a resumed job anti-joins completed keys and recomputes nothing.

The log is an append-only parquet table (an Iceberg table in
production — append-only means plain parquet is safe here too: a
partition is "done" iff a done-row exists; duplicate done-rows are
harmless and resolved by max(attempt)).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

LINEAGE_SCHEMA = StructType(
    [
        StructField("stage", StringType()),
        StructField("partition_key", StringType()),
        StructField("status", StringType()),
        StructField("rows_in", LongType()),
        StructField("rows_out", LongType()),
        StructField("bytes_out", LongType()),
        StructField("max_err", DoubleType()),
        StructField("wall_ms", LongType()),
        StructField("attempt", IntegerType()),
        StructField("updated_at", TimestampType()),
    ]
)


@dataclass
class StageResult:
    stage: str
    processed_keys: int
    skipped_keys: int
    wall_ms: int


class CheckpointLog:
    def __init__(self, spark: SparkSession, path: str) -> None:
        self.spark = spark
        self.path = path

    def read(self) -> DataFrame:
        try:
            return self.spark.read.schema(LINEAGE_SCHEMA).parquet(self.path)
        except Exception:  # first run: no log yet
            return self.spark.createDataFrame([], LINEAGE_SCHEMA)

    def completed_keys(self, stage: str) -> DataFrame:
        return (
            self.read()
            .filter((F.col("stage") == stage) & (F.col("status") == "done"))
            .select("partition_key")
            .distinct()
        )

    def pending(self, keys: DataFrame, stage: str) -> DataFrame:
        """Anti-join candidate partition keys against completed ones."""
        return keys.join(self.completed_keys(stage), "partition_key", "left_anti")

    def attempt_number(self, stage: str) -> int:
        row = (
            self.read()
            .filter(F.col("stage") == stage)
            .agg(F.max("attempt").alias("a"))
            .collect()[0]
        )
        return (row.a or 0) + 1

    def record(self, rows: list[dict]) -> None:
        """Append lineage rows.  Local stores write DRIVER-SIDE with
        pyarrow (tmp + atomic rename; same r7 rationale as the cagg
        fingerprint log — a Spark write job costs ~1 s of scheduling
        overhead for a few-KB append, which at one append per stage
        per refresh dominates the incremental-refresh floor).  Remote
        URIs keep the Spark writer."""
        if not rows:
            return
        norm = [
            (
                r["stage"],
                r["partition_key"],
                r.get("status", "done"),
                int(r.get("rows_in", 0)),
                int(r.get("rows_out", 0)),
                int(r.get("bytes_out", 0)),
                float(r["max_err"]) if r.get("max_err") is not None else None,
                int(r.get("wall_ms", 0)),
                int(r.get("attempt", 1)),
                r.get("updated_at"),
            )
            for r in rows
        ]
        # same gate as cagg._record_fingerprints: driver-side pyarrow
        # needs BOTH a local path and a local-mode session (elsewhere a
        # scheme-less path resolves against the session's Hadoop FS)
        local_session = self.spark.sparkContext.master.startswith("local")
        if ("://" in self.path and not self.path.startswith("file:")) or not local_session:
            df = self.spark.createDataFrame(norm, LINEAGE_SCHEMA).withColumn(
                "updated_at", F.coalesce("updated_at", F.current_timestamp())
            )
            df.write.mode("append").parquet(self.path)
            return
        import os
        import uuid
        from datetime import datetime, timezone

        import pyarrow as pa
        import pyarrow.parquet as pq

        now = datetime.now(timezone.utc)
        local = self.path[7:] if self.path.startswith("file://") else self.path
        os.makedirs(local, exist_ok=True)
        cols = list(zip(*norm))
        tbl = pa.table(
            {
                "stage": pa.array(cols[0], pa.string()),
                "partition_key": pa.array(cols[1], pa.string()),
                "status": pa.array(cols[2], pa.string()),
                "rows_in": pa.array(cols[3], pa.int64()),
                "rows_out": pa.array(cols[4], pa.int64()),
                "bytes_out": pa.array(cols[5], pa.int64()),
                "max_err": pa.array(cols[6], pa.float64()),
                "wall_ms": pa.array(cols[7], pa.int64()),
                "attempt": pa.array(cols[8], pa.int32()),
                "updated_at": pa.array(
                    [u if u is not None else now for u in cols[9]],
                    pa.timestamp("us", tz="UTC"),
                ),
            }
        )
        tmp = os.path.join(local, f".tmp-{uuid.uuid4().hex}.parquet")
        pq.write_table(tbl, tmp)
        os.replace(tmp, os.path.join(local, f"lin-{uuid.uuid4().hex}.parquet"))


def run_stage(
    log: CheckpointLog,
    stage: str,
    inputs: DataFrame,
    key_col,
    process,
    output_path: str,
    metrics_agg=None,
) -> StageResult:
    """Resumable stage: process only partition keys without a 'done'
    lineage row, write output partitioned by the key, then log.

    key_col: a Column producing the string partition key for each
    input row; process: DataFrame -> DataFrame (must preserve a
    `partition_key` column); metrics_agg: optional dict of extra agg
    columns for the lineage row (e.g. max_err).
    """
    t0 = time.time()
    keyed = inputs.withColumn("partition_key", key_col)
    all_keys = keyed.select("partition_key").distinct()
    todo = log.pending(all_keys, stage)
    n_total = all_keys.count()
    n_todo = todo.count()
    if n_todo == 0:
        return StageResult(stage, 0, n_total, int((time.time() - t0) * 1000))

    pending_rows = keyed.join(F.broadcast(todo), "partition_key")
    out = process(pending_rows)
    # Dynamic partition overwrite: a crash between this write and the
    # lineage record leaves keys with data but no 'done' row; the
    # resumed run then REPLACES those keys' partitions instead of
    # appending duplicate rows (idempotent resume).
    spark = log.spark
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        out.write.mode("overwrite").partitionBy("partition_key").parquet(output_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)

    written = log.spark.read.parquet(output_path).join(
        F.broadcast(todo), "partition_key"
    )
    aggs = [
        F.count(F.lit(1)).alias("rows_out"),
        *(metrics_agg or []),
    ]
    attempt = log.attempt_number(stage)
    stats = {r["partition_key"]: r.asDict() for r in written.groupBy("partition_key").agg(*aggs).collect()}
    rows_in = {
        r["partition_key"]: r["c"]
        for r in pending_rows.groupBy("partition_key").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    wall = int((time.time() - t0) * 1000)
    log.record(
        [
            {
                "stage": stage,
                "partition_key": k,
                "status": "done",
                "rows_in": rows_in.get(k, 0),
                "rows_out": stats.get(k, {}).get("rows_out", 0),
                "bytes_out": stats.get(k, {}).get("bytes_out", 0) or 0,
                "max_err": stats.get(k, {}).get("max_err"),
                "wall_ms": wall,
                "attempt": attempt,
            }
            for k in [r.partition_key for r in todo.collect()]
        ]
    )
    return StageResult(stage, n_todo, n_total - n_todo, wall)
