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
parquet we stage-write the tier output, validate counts, then drop the
raw partition — crash between those steps leaves *both* copies, never
neither, and the retention pass is idempotent).
"""

from __future__ import annotations

import shutil
from dataclasses import dataclass, field
from datetime import date
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .frames import decode_frames, fit_frames
from .lossless import decode_lossless, fit_lossless
from .rollup import rollup


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

    def raw_days(self) -> list[date]:
        raw = self._read_or_empty("raw")
        if raw is None:
            return []
        return sorted(r.day for r in raw.select("day").distinct().collect())

    # -------------------------------------------------------- retention

    def retention_pass(self, today: date) -> list[tuple[str, str]]:
        """Move every raw day partition to its policy tier.

        Returns [(day, tier)] transitions performed.  Idempotent: a
        crash after the tier write but before the raw drop re-runs the
        (deterministic) tier write into a staged overwrite.
        """
        moves: list[tuple[str, str]] = []
        for day in self.raw_days():
            age = (today - day).days
            tier = self.policy.tier_for_age(age)
            if tier == "raw":
                continue
            day_df = self.spark.read.parquet(self.path("raw")).filter(
                F.col("day") == F.lit(day)
            ).select("conv_id", "metric", "bucket_ts", "value")

            if tier == "tier0":
                out = fit_lossless(day_df)
            elif tier == "tier1":
                out = fit_frames(day_df, max_error=self.policy.err_tier1)
            elif tier == "tier2":
                out = fit_frames(day_df, max_error=self.policy.err_tier2)
            else:  # rollup-only
                out = rollup(day_df, "1 hour").withColumn("day", F.lit(day))

            # stage-write the tier partition (overwrite = idempotent)
            (
                out.write.mode("overwrite")
                .parquet(self.path(f"{tier}/day={day.isoformat()}"))
            )
            # validate, then drop the raw partition
            n = self.spark.read.parquet(self.path(f"{tier}/day={day.isoformat()}")).count()
            if n == 0 and day_df.limit(1).count() > 0:
                raise RuntimeError(f"retention: empty tier output for {day}")
            shutil.rmtree(Path(self.base) / "raw" / f"day={day.isoformat()}")
            moves.append((day.isoformat(), tier))
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
