"""Tiered retention: replace raw series rows with compressed frames as
data ages.

Tier layout (ages are policy-configurable):

| tier | age          | representation                  | fidelity |
|------|--------------|---------------------------------|----------|
| raw  | < t0_days    | parquet rows                    | exact    |
| 0    | >= t0_days   | Gorilla blocks (lossless)       | exact    |
| 1    | >= t1_days   | ATSC frames @ 1% max error      | <= 1%    |
| 2    | >= t2_days   | ATSC frames @ 3% max error      | <= 3%    |
| 3    | >= t3_days   | 1h rollup only                  | aggregate|

The reference positions ATSC exactly here: "in places where time
series are rolled over" (`/root/reference/README.md:66`).  Storage is
day-partitioned parquet directories (an Iceberg catalog swap makes the
partition replacement a single atomic snapshot commit; with plain
parquet we write target partitions with dynamic partition overwrite,
validate counts, then drop the source partitions — a crash between
those steps leaves *both* copies, never neither, and the next pass
overwrites the target partition idempotently and finishes the drop).

Scale shape: one Spark job per (source_tier -> target_tier) pair, not
one per day — a year of aged days is ONE fit job whose output is
``partitionBy("day")``.  Partition drops go through the Hadoop
FileSystem API, so any object store with a Hadoop connector works (no
local-FS ``shutil`` assumptions).

Data in later tiers keeps aging: a tier0 day that crosses the t1
threshold is decoded and re-fitted into tier1, and so on.  Re-fitting
a lossy tier bounds the NEW error against the decoded values, so the
end-to-end error can compound up to the sum of the tier bounds —
documented behaviour, same as the reference re-compressing its own
output.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import date

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .frames import decode_frames, fit_frames
from .lossless import decode_lossless, fit_lossless
from .rollup import rollup

_TIER_ORDER = {"raw": 0, "tier0": 1, "tier1": 2, "tier2": 3, "rollup": 4}


@dataclass
class TierPolicy:
    t0_days: int = 1  # raw -> gorilla
    t1_days: int = 7  # gorilla -> frames @ 1%
    t2_days: int = 30  # frames@1% -> frames @ 3%
    t3_days: int = 365  # frames -> rollup-only
    err_tier1: float = 0.01
    err_tier2: float = 0.03

    def tier_for_age(self, age_days: int) -> str:
        if age_days >= self.t3_days:
            return "rollup"
        if age_days >= self.t2_days:
            return "tier2"
        if age_days >= self.t1_days:
            return "tier1"
        if age_days >= self.t0_days:
            return "tier0"
        return "raw"


@dataclass
class TieredStore:
    spark: SparkSession
    base: str
    policy: TierPolicy = field(default_factory=TierPolicy)

    def path(self, name: str) -> str:
        return f"{self.base}/{name}"

    # ------------------------------------------------------------ write

    def write_raw(self, series: DataFrame) -> None:
        (
            series.withColumn("day", F.to_date("bucket_ts"))
            .write.mode("append")
            .partitionBy("day")
            .parquet(self.path("raw"))
        )

    def _read_or_empty(self, name: str) -> DataFrame | None:
        try:
            return self.spark.read.parquet(self.path(name))
        except Exception:
            return None

    def tier_days(self, name: str) -> list[date]:
        df = self._read_or_empty(name)
        if df is None:
            return []
        return sorted(r.day for r in df.select("day").distinct().collect())

    def raw_days(self) -> list[date]:
        return self.tier_days("raw")

    def _delete_partition(self, tier: str, day: date) -> None:
        """Drop one day partition via the Hadoop FileSystem API —
        works on any FS/object store the cluster can mount, unlike a
        local shutil.rmtree."""
        jvm = self.spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(f"{self.path(tier)}/day={day.isoformat()}")
        fs = p.getFileSystem(self.spark._jsc.hadoopConfiguration())
        fs.delete(p, True)

    # -------------------------------------------------------- retention

    def retention_pass(self, today: date) -> list[tuple[str, str]]:
        """Age every day partition in every tier to its policy tier.

        Returns [(day, tier)] transitions performed.  Grouped: all days
        sharing a (source, target) pair are decoded + re-fitted in ONE
        Spark job and written with dynamic partition overwrite, so a
        crash-and-rerun replaces the target partitions instead of
        duplicating them, and the source partitions are only dropped
        after the written counts validate.
        """
        moves: list[tuple[str, str]] = []
        plan: dict[tuple[str, str], list[date]] = {}
        for source in ("raw", "tier0", "tier1", "tier2"):
            for day in self.tier_days(source):
                target = self.policy.tier_for_age((today - day).days)
                if _TIER_ORDER[target] > _TIER_ORDER[source]:
                    plan.setdefault((source, target), []).append(day)
        if not plan:
            return moves

        prev_mode = self.spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            for (source, target), days in sorted(plan.items()):
                src = self.spark.read.parquet(self.path(source)).filter(
                    F.col("day").isin(days)
                )
                if source == "raw":
                    series = src.select("conv_id", "metric", "bucket_ts", "value")
                elif source == "tier0":
                    series = decode_lossless(src)
                else:
                    series = decode_frames(src)

                if target == "tier0":
                    out = fit_lossless(series)
                elif target == "tier1":
                    out = fit_frames(series, max_error=self.policy.err_tier1)
                elif target == "tier2":
                    out = fit_frames(series, max_error=self.policy.err_tier2)
                else:  # rollup-only
                    out = rollup(series, "1 hour").withColumn(
                        "day", F.to_date("bucket_ts")
                    )

                # one job: write all moved days, replacing only those
                # partitions (dynamic overwrite = idempotent rerun)
                out.write.mode("overwrite").partitionBy("day").parquet(self.path(target))

                # validate written counts, then drop source partitions
                written = self.spark.read.parquet(self.path(target)).filter(
                    F.col("day").isin(days)
                )
                counts = {
                    r["day"]: r["n"]
                    for r in written.groupBy("day").agg(F.count(F.lit(1)).alias("n")).collect()
                }
                src_counts = {
                    r["day"]: r["n"]
                    for r in src.groupBy("day").agg(F.count(F.lit(1)).alias("n")).collect()
                }
                for day in days:
                    if counts.get(day, 0) == 0 and src_counts.get(day, 0) > 0:
                        raise RuntimeError(
                            f"retention: empty {target} output for {day}; "
                            f"source {source} partition kept"
                        )
                    self._delete_partition(source, day)
                    moves.append((day.isoformat(), target))
        finally:
            self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
        return moves

    # ------------------------------------------------------------- read

    def read_series(self) -> DataFrame:
        """Unified read across tiers: raw rows ∪ decoded tier0 blocks ∪
        decoded tier1/2 frames.  (Rollup-only days are aggregates and
        are served from read_rollup.)"""
        parts: list[DataFrame] = []
        raw = self._read_or_empty("raw")
        if raw is not None:
            parts.append(raw.select("conv_id", "metric", "bucket_ts", "value"))
        t0 = self._read_or_empty("tier0")
        if t0 is not None:
            parts.append(decode_lossless(t0))
        for tier in ("tier1", "tier2"):
            t = self._read_or_empty(tier)
            if t is not None:
                parts.append(decode_frames(t))
        if not parts:
            raise RuntimeError("empty store")
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def read_rollup(self) -> DataFrame | None:
        return self._read_or_empty("rollup")
