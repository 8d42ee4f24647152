"""Explicit skew handling for hot conversations.

Conversation sizes are Zipf-like (a few conversations carry orders of
magnitude more turns).  Three tools, composable:

1. :func:`salted_repartition` — spread rows of the same conv across
   ``salt_buckets`` partitions using a deterministic hash of the time
   bucket, so one hot conv cannot pin a whole executor during
   derivation.  Aggregations then run in two phases (partial per salt,
   final merge) — which Spark's hash aggregate does automatically when
   the salt is part of the first groupBy.
2. :func:`hot_keys` — sample-based hot-key detection (the explicit
   counterpart to AQE's runtime skew split; useful for logging and for
   choosing per-key strategies).
3. two_phase_agg — groupBy with a salt column then re-aggregate; the
   pattern the derive step uses for the global distinct series.

AQE's skew-join splitting stays enabled as the backstop
(`session.py`).  Note the frame-fitting groupBy needs no salting: its
key includes the day, so a group is bounded at 86,400 samples by
construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_repartition(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    salt_buckets: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Repartition by (keys..., salt) where salt = hash(time bucket) %
    salt_buckets — rows of a hot key spread over `salt_buckets`
    partitions while staying time-local within each."""
    salted = df.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.date_trunc("hour", F.col(ts_col))), F.lit(salt_buckets)),
    )
    cols = [F.col(c) for c in key_cols] + [F.col("__salt")]
    out = (
        salted.repartition(num_partitions, *cols)
        if num_partitions
        else salted.repartition(*cols)
    )
    return out.drop("__salt")


def hot_keys(
    df: DataFrame,
    key_cols: list[str],
    fraction: float = 0.01,
    threshold_ratio: float = 10.0,
    seed: int = 42,
) -> DataFrame:
    """Sampled hot-key report: keys whose sampled row count exceeds
    `threshold_ratio` x the mean.  One pass over a 1% sample."""
    sampled = df.sample(fraction=fraction, seed=seed)
    counts = sampled.groupBy(*key_cols).count()
    mean = counts.agg(F.avg("count").alias("m"))
    return (
        counts.crossJoin(F.broadcast(mean))
        .filter(F.col("count") >= F.col("m") * threshold_ratio)
        .select(*key_cols, "count", F.round(F.col("count") / F.col("m"), 1).alias("x_mean"))
    )


def two_phase_count_distinct(
    df: DataFrame, group_cols: list[str], distinct_col: str, salt_buckets: int = 16
) -> DataFrame:
    """countDistinct with a salted partial phase: phase 1 dedups
    (group, salt-of-value), phase 2 counts — the shuffle key space is
    `salt_buckets`x wider, so a hot group cannot bottleneck one task."""
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(salt_buckets))
    )
    phase1 = salted.groupBy(*group_cols, "__salt").agg(
        F.countDistinct(distinct_col).alias("partial")
    )
    return phase1.groupBy(*group_cols).agg(F.sum("partial").alias("n_distinct"))


def task_skew_probe(spark, action, group: str = "skew-probe") -> list[dict]:
    """Run ``action()`` under a job group and return PER-TASK runtime
    distributions for every stage it executed, via the Spark UI REST
    API — the measured evidence that a hot key did (or did not) pin a
    straggler task.

    Returns one dict per stage, heaviest first:
    ``{stage_id, n_tasks, total_ms, max_ms, median_ms, skew_ratio}``
    where ``skew_ratio = max/median`` task executorRunTime.  A value
    near 1 means flat tasks; >3 flags a straggler.  Works in any
    deploy mode with the UI enabled (default); returns ``[]`` if the
    REST endpoint is unavailable rather than failing the job.
    """
    import json as _json
    import statistics
    import urllib.request

    sc = spark.sparkContext
    sc.setJobGroup(group, "task skew probe", False)
    try:
        action()
    finally:
        sc.setJobGroup("", "")
    try:
        job_ids = sc.statusTracker().getJobIdsForGroup(group)
        stage_ids: set[int] = set()
        for j in job_ids:
            info = sc.statusTracker().getJobInfo(j)
            if info is not None:
                stage_ids.update(info.stageIds)
        base = sc.uiWebUrl
        app_id = sc.applicationId
        out = []
        for sid in sorted(stage_ids):
            # the dedicated taskList endpoint; the stage endpoint's
            # embedded tasks map is not reliably populated
            url = (
                f"{base}/api/v1/applications/{app_id}/stages/{sid}/0/"
                f"taskList?length=100000"
            )
            try:
                with urllib.request.urlopen(url, timeout=10) as resp:
                    tasks = _json.load(resp)
            except Exception:
                continue
            times = [
                t["taskMetrics"]["executorRunTime"]
                for t in tasks
                if t.get("taskMetrics") is not None
            ]
            if not times:
                continue
            med = statistics.median(times)
            out.append(
                {
                    "stage_id": sid,
                    "n_tasks": len(times),
                    "total_ms": int(sum(times)),
                    "max_ms": int(max(times)),
                    "median_ms": int(med),
                    "skew_ratio": round(max(times) / max(med, 1.0), 2),
                }
            )
        out.sort(key=lambda s: -s["total_ms"])
        return out
    except Exception:
        return []
