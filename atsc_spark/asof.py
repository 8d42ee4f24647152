"""As-of join and visual downsampling operators.

The reference's VSRI exposes nearest-sample lookups
(`get_this_or_previous`, `/root/reference/vsri/src/lib.rs:137-192`);
the relational generalization is the AS-OF join: match each left row
to the most recent right row at or before its timestamp, per key.

Implementation is the scalable union+window formulation — no UDF, no
range explosion:

    tag both sides -> union -> one window pass carrying the last right
    value forward -> keep left rows.

One shuffle on (key), identical cost profile to a sort-merge join, and
immune to the cross-product blowup a naive range join would risk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row: the latest right row with right.on <= left.on
    within the same `by` group.  Right `value_cols` appear with
    `suffix`.
    """
    by = by or []
    value_cols = value_cols or [c for c in right.columns if c != on and c not in by]

    l_tag = left.withColumn("__side", F.lit(1))
    r_tag = right.select(
        *by, on, *[F.col(c).alias(c + suffix) for c in value_cols]
    ).withColumn("__side", F.lit(0))

    merged = l_tag.unionByName(r_tag, allowMissingColumns=True)
    # right rows sort before left rows at the same timestamp, so a
    # same-instant right row is visible to the left row (<= semantics)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "*",
        *[
            F.last(c + suffix, ignorenulls=True).over(w).alias(c + suffix + "__c")
            for c in value_cols
        ],
    )
    out = carried.filter(F.col("__side") == 1).drop("__side")
    for c in value_cols:
        out = out.drop(c + suffix).withColumnRenamed(c + suffix + "__c", c + suffix)
    return out


def lttb_downsample(
    series: DataFrame,
    n_out: int = 500,
    keys: list[str] = ("conv_id", "metric"),
) -> DataFrame:
    """Largest-Triangle-Three-Buckets visual downsampling per series
    (Steinarsson 2013), as an ``applyInPandas`` grouped map — the
    classic lossy *point-selection* downsampler complementing the
    ATSC function-fitting frames."""
    import numpy as np
    import pandas as pd

    keys = list(keys)

    def lttb(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket_ts")
        n = len(pdf)
        if n <= n_out:
            return pdf
        x = pdf["bucket_ts"].astype("int64").to_numpy() / 1e9
        y = pdf["value"].to_numpy(dtype=np.float64)
        idx = [0]
        bucket_bounds = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
        for b in range(n_out - 2):
            lo, hi = bucket_bounds[b], bucket_bounds[b + 1]
            if hi <= lo:
                hi = lo + 1
            ax, ay = x[idx[-1]], y[idx[-1]]
            nxt_lo, nxt_hi = bucket_bounds[b + 1], (
                bucket_bounds[b + 2] if b + 2 < len(bucket_bounds) else n
            )
            cx, cy = x[nxt_lo:nxt_hi].mean(), y[nxt_lo:nxt_hi].mean()
            seg_x, seg_y = x[lo:hi], y[lo:hi]
            area = np.abs((ax - cx) * (seg_y - ay) - (ax - seg_x) * (cy - ay))
            idx.append(int(lo + area.argmax()))
        idx.append(n - 1)
        return pdf.iloc[sorted(set(idx))]

    schema = series.schema
    return series.groupBy(*keys).applyInPandas(lambda p: lttb(p), schema)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "bucket_ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    by: list[str] | None = None,
    bucket_s: int = 3600,
) -> DataFrame:
    """Points-in-interval join (half-open ``[start, end)``) as a
    BUCKETED EQUI-JOIN — never a nested loop.

    A naive ``p.ts >= i.start AND p.ts < i.end`` join has no equi-key,
    so Spark plans BroadcastNestedLoopJoin — O(|points| × |intervals|)
    and a driver OOM the moment the interval side stops being tiny.
    Instead each interval explodes into the fixed-width time buckets it
    covers, both sides equi-join on (bucket [, by]) — shuffle volume is
    |points| + Σ buckets-per-interval — and the exact range predicate
    filters the boundary buckets.  Pick ``bucket_s`` near the typical
    interval length: explode cost is ceil(span / bucket_s) + 1 rows per
    interval (a year-long interval at 1h buckets is ~8.8k rows — cap or
    pre-split pathological spans upstream).

    Output: every points column plus the matched interval's columns
    (an interval overlapping k points emits k rows; points in no
    interval are dropped — inner semantics).
    """
    by = by or []
    p_b = points.withColumn(
        "__b", F.floor(F.col(point_ts).cast("timestamp").cast("double") / bucket_s)
    )
    i_b = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col).cast("timestamp").cast("double") / bucket_s),
                F.floor(F.col(end_col).cast("timestamp").cast("double") / bucket_s),
            )
        ),
    )
    joined = p_b.join(i_b, ["__b", *by]).filter(
        (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) < F.col(end_col))
    )
    return joined.drop("__b")
