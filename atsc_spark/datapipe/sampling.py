"""Deterministic corpus sampling and source mixing.

The domain-mixing step of a training-data pipeline: downsample some
sources, upsample (multi-epoch) others, reproducibly.  Spark's own
`df.sample`/`sampleBy` draw per-partition random streams, so the
selected rows CHANGE whenever partitioning changes (a repartition, a
different file split, AQE coalescing) — unacceptable for a pipeline
whose sample must be auditable and stable across reruns at different
parallelism.  Everything here keys the decision on a hash of the
row's identity instead: same row + same seed = same decision, on any
cluster layout.  Pure projections — zero shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# xxhash64 output spans the full signed-64 range; map it to [0, 1)
_HASH_SPAN = 2.0**64


def _unit_hash(key: Column, seed: int) -> Column:
    """Deterministic uniform [0, 1) draw from a row key: the row's
    xxhash64 (salted with `seed`) rescaled from signed-64 range."""
    return (F.xxhash64(key, F.lit(seed)).cast("double") / _HASH_SPAN) + 0.5


def sample_fraction(
    docs: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Keep ~`fraction` of rows, chosen by identity hash — stable
    under any repartitioning, unlike `DataFrame.sample`."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return docs.where(_unit_hash(F.col(key_col), seed) < fraction)


def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 0,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum keep fractions (e.g. {"web": 0.1, "books": 1.0});
    strata absent from `fractions` keep `default_fraction`.  The
    per-row decision is the same identity hash as
    :func:`sample_fraction`, so adding a stratum later never changes
    which rows of the existing strata are kept."""
    for s, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {s!r} must be in [0, 1]")
    frac = F.lit(float(default_fraction))
    for s, f in fractions.items():
        frac = F.when(F.col(strata_col) == s, float(f)).otherwise(frac)
    return docs.where(_unit_hash(F.col(key_col), seed) < frac)


def mix_corpus(
    docs: DataFrame,
    weights: dict[str, float],
    strata_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 0,
    default_weight: float = 1.0,
) -> DataFrame:
    """Epoch-weighted source mixing: weight 0.3 keeps ~30% of a
    source, weight 2.5 repeats every row twice and a hash-chosen ~50%
    a third time (the fractional epoch).  Adds `epoch` (0-based copy
    index) so downstream shuffling can separate copies; all other
    columns pass through.

    Implemented as one `explode(sequence(...))` projection: row count
    scales by the weight with zero shuffle.  The fractional-epoch
    draw is salted with `seed+1` so it is independent of any
    :func:`sample_fraction` draw on the same seed.
    """
    for s, w in weights.items():
        if w < 0:
            raise ValueError(f"weight for {s!r} must be >= 0")
    w = F.lit(float(default_weight))
    for s, wt in weights.items():
        w = F.when(F.col(strata_col) == s, float(wt)).otherwise(w)
    extra = (_unit_hash(F.col(key_col), seed + 1) < (w - F.floor(w))).cast("int")
    n_copies = (F.floor(w).cast("int") + extra).alias("_n")
    return (
        docs.select("*", n_copies)
        .where(F.col("_n") > 0)
        .select(
            *docs.columns,
            F.explode(F.sequence(F.lit(0), F.col("_n") - 1)).alias("epoch"),
        )
    )


def train_order(
    docs: DataFrame,
    key_cols: list[str] | None = None,
    seed: int = 0,
) -> DataFrame:
    """Global deterministic pseudo-random training order: sort by an
    identity-hash key.  One range-partitioned sort (the unavoidable
    shuffle for a global order), but the ORDER itself is a pure
    function of (row identity, seed) — rerunning on different
    partitioning or cluster size yields the identical sequence, which
    per-partition `rand()` sorts do not."""
    keys = [F.col(c) for c in (key_cols or ["doc_id"])]
    return docs.orderBy(F.xxhash64(*keys, F.lit(seed)), *keys)
