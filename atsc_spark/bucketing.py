"""Storage-level bucketing: shuffle-free co-located joins at rest.

At 100 TB the dominant cost of joining two big per-conversation
tables (raw series <-> fitted frames, series <-> rollups, frames <->
lineage) is the pair of hash Exchanges the join plans.  Spark's
bucketed tables (`bucketBy` + `sortBy` at write time) pre-partition
AND pre-sort both sides by the join key at rest, so a SortMergeJoin
of two same-bucketed tables plans with NO Exchange and NO Sort — the
shuffle is paid once at write time and amortized over every
subsequent join (ISO: the classic Hive-style bucketing contract,
`spark.sql.sources.bucketing.enabled`).

This module is the thin, tested wrapper the engine's stores use:
``write_bucketed`` lays a DataFrame down as an external parquet table
bucketed by the given keys; ``read_table`` reads it back with the
bucket metadata intact (a plain ``spark.read.parquet`` of the same
files would LOSE the bucket spec — the catalog carries it).

Scale notes:
- choose ``n_buckets`` so one bucket of the BIGGER table fits an
  executor core's working set (same arithmetic as shuffle
  partitions); both sides must use the SAME n_buckets for the
  exchange-free plan.
- bucketed writes produce n_buckets files per write-task; callers
  should coalesce/repartition by the bucket key first so file counts
  stay bounded (``write_bucketed`` does this by default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
    pre_repartition: bool = True,
) -> None:
    """Write ``df`` as an EXTERNAL parquet table bucketed (and sorted)
    by ``bucket_cols`` at ``path``, registered as ``name`` in the
    session catalog.  ``pre_repartition`` shuffles by the bucket key
    first so each write task owns whole buckets (n_buckets files
    total instead of tasks x n_buckets)."""
    sort_cols = sort_cols or bucket_cols
    out = df.repartition(n_buckets, *bucket_cols) if pre_repartition else df
    (
        out.write.format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*sort_cols)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(name)
    )


def read_table(spark: SparkSession, name: str) -> DataFrame:
    """Catalog read — REQUIRED for the bucket spec to reach the plan
    (reading the parquet path directly drops it)."""
    return spark.table(name)


def drop_table(spark: SparkSession, name: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {name}")
