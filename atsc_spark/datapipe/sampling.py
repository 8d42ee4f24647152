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
    xxhash64 (salted with `seed`) rescaled from signed-64 range.

    Clamped below 1.0: hash values within ~1024 of 2^63 round UP to
    2^63 when cast to double (double spacing there is 2048), which
    would yield exactly 1.0 — breaking `fraction=1.0` keep-all
    semantics and the floor(u*n)<n bucket invariant."""
    u = (F.xxhash64(key, F.lit(seed)).cast("double") / _HASH_SPAN) + 0.5
    return F.least(u, F.lit(1.0 - 2.0**-53))


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
    for s, f in list(fractions.items()) + [("default_fraction", default_fraction)]:
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
    for s, wt in list(weights.items()) + [("default_weight", default_weight)]:
        if wt < 0:
            raise ValueError(f"weight for {s!r} must be >= 0")
    clash = {"_n", "epoch"} & set(docs.columns)
    if clash:
        raise ValueError(
            f"mix_corpus reserves column(s) {sorted(clash)}; rename them "
            "first (for re-mixing, fold the previous epoch into the key: "
            "concat_ws('#', key, 'epoch'))"
        )
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


def _global_token_offsets(
    docs: DataFrame,
    n_tokens: Column,
    unit_key: Column,
    tiebreak_col: str,
    n_buckets: int = 256,
    max_bucket_rows: int | None = 50_000_000,
) -> DataFrame:
    """Each doc's exclusive prefix-sum of token counts in the global
    order (unit_key, tiebreak), WITHOUT the single-task global-window
    trap (`Window.orderBy` with no partitionBy funnels every row
    through one partition — fine at test scale, a cliff at 100 TB).

    Scalable two-phase prefix sum: bucket = floor(unit_key *
    n_buckets) — a DETERMINISTIC range partitioning of the uniform
    hash space (no `repartitionByRange`, whose sampled boundaries
    could differ between the totals job and the main job and corrupt
    the offsets) — cumsum within each bucket via a partitioned
    window, then add per-bucket base offsets: a driver-side cumsum
    over n_buckets scalars joined back via broadcast.  Buckets are
    hash-uniform, so load is balanced; raise `n_buckets` so one
    bucket's rows fit an executor.

    `max_bucket_rows` is the loud-failure guard for that sizing: the
    per-bucket cumsum is ONE window task, so a bucket bigger than an
    executor's comfortable row budget silently serializes (and
    eventually spills) at 100-TB scale.  The per-bucket counts come
    free with the totals aggregate, so the guard costs nothing; it
    raises with the offending bucket size and the `n_buckets` value to
    retune.  Pass ``None`` to disable.
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    base = (
        docs.withColumn("_u", unit_key)
        .withColumn("_n", n_tokens)
        .withColumn("_pid", F.floor(F.col("_u") * n_buckets).cast("int"))
    )
    # pin ONE realization of the source: the totals job and the main
    # job must see identical rows, or base offsets disagree with the
    # cumsum and sequences corrupt.  A nondeterministic upstream
    # (sample(), a shuffle retry, files changing between jobs) makes
    # the double execution unsafe without this; it also halves the
    # tokenize cost.  At warehouse scale, materialize the corpus to a
    # table first and this persist is a cheap no-op-sized cache.
    base = base.persist(StorageLevel.MEMORY_AND_DISK)
    w = (
        Window.partitionBy("_pid")
        .orderBy("_u", tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    df = base.withColumn("_cum", F.sum("_n").over(w))
    stats = base.groupBy("_pid").agg(
        F.sum("_n").alias("t"), F.count(F.lit(1)).alias("c")
    ).collect()
    if max_bucket_rows is not None:
        fat = [(r["_pid"], r["c"]) for r in stats if r["c"] > max_bucket_rows]
        if fat:
            pid, rows = max(fat, key=lambda x: x[1])
            raise ValueError(
                f"prefix-sum bucket {pid} holds {rows} rows "
                f"(> max_bucket_rows={max_bucket_rows}) with "
                f"n_buckets={n_buckets}: one window task would process "
                f"all of them — raise n_buckets (or max_bucket_rows if "
                f"the executors can take it)"
            )
    totals = {r["_pid"]: r["t"] for r in stats}
    base, acc = {}, 0
    for pid in sorted(totals):
        base[pid] = acc
        acc += totals[pid]
    spark = docs.sparkSession
    base_df = spark.createDataFrame(
        [(int(p), int(b)) for p, b in base.items()] or [(0, 0)],
        "_pid int, _base long",
    )
    return df.join(F.broadcast(base_df), "_pid").withColumn(
        "_offset", F.col("_base") + F.col("_cum") - F.col("_n")
    )


def pack_sequences(
    docs: DataFrame,
    seq_tokens: int = 2048,
    key_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 0,
    separator: str = "<|eod|>",
    unit_expr: Column | None = None,
    n_buckets: int = 256,
    max_bucket_rows: int | None = 50_000_000,
) -> DataFrame:
    """GPT-style sequence packing: concatenate the whole corpus in
    deterministic pseudo-random order (identity-hash key, like
    :func:`train_order`), insert `separator` after each document, and
    slice the stream into exact `seq_tokens`-token training
    sequences: (seq_id, text, n_tokens, doc_ids).

    Every sequence except the last has exactly `seq_tokens` tokens; a
    document straddling a boundary is split across the adjacent
    sequences (its id appears in both `doc_ids`).  Deterministic for
    a given (corpus, seed, seq_tokens) regardless of parallelism —
    PROVIDED `key_col` is unique: the global order ties break on the
    key, so rows sharing a key (e.g. epochs out of
    :func:`mix_corpus`) have no defined mutual order — fold the epoch
    into the key first (`concat_ws('#', 'doc_id', 'epoch')`).

    `unit_expr` overrides the ordering/bucketing key (must be a
    deterministic [0, 1) expression over the row).  The default is
    the xxhash64 identity hash; the graded-oracle entry passes an
    md5-derived unit instead, because xxhash64 exists only in Spark
    and the DuckDB oracle must replay the identical global order.

    Plan shape: one hash-bucketed window shuffle for the global order
    (the two-phase prefix sum in :func:`_global_token_offsets` — no
    single-task window), a bounded explode of each doc onto the
    sequences it touches (ceil(n/seq_tokens)+1 rows max), and one
    groupBy(seq_id).  No Python in the hot path.
    """
    if seq_tokens < 1:
        raise ValueError("seq_tokens must be >= 1")
    toks = F.concat(
        F.split(F.col(text_col), " "), F.array(F.lit(separator))
    )  # doc tokens + end-of-doc marker, counted like any token
    offs = _global_token_offsets(
        docs.select(key_col, text_col),
        F.size(toks),
        unit_expr if unit_expr is not None else _unit_hash(F.col(key_col), seed),
        tiebreak_col=key_col,
        n_buckets=n_buckets,
        max_bucket_rows=max_bucket_rows,
    ).select(
        F.col(key_col),
        toks.alias("_toks"),
        "_n",
        "_offset",
    )
    first_seq = F.floor(F.col("_offset") / seq_tokens).cast("long")
    last_seq = F.floor((F.col("_offset") + F.col("_n") - 1) / seq_tokens).cast(
        "long"
    )
    pieces = offs.select(
        key_col,
        "_toks",
        "_n",
        "_offset",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    # the token range of this doc that lands in this sequence
    piece_start = F.greatest(F.col("seq_id") * seq_tokens, F.col("_offset"))
    piece_end = F.least(
        (F.col("seq_id") + 1) * seq_tokens, F.col("_offset") + F.col("_n")
    )
    pieces = pieces.select(
        "seq_id",
        F.col(key_col),
        piece_start.alias("_ps"),
        F.slice(
            "_toks",
            (piece_start - F.col("_offset") + 1).cast("int"),
            (piece_end - piece_start).cast("int"),
        ).alias("_piece"),
    )
    assembled = (
        pieces.groupBy("seq_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_ps"), F.col("_piece"), F.col(key_col)))
            ).alias("_parts")
        )
        .select(
            "seq_id",
            F.concat_ws(
                " ", F.flatten(F.transform("_parts", lambda p: p["_piece"]))
            ).alias(text_col),
            F.aggregate(
                "_parts", F.lit(0), lambda acc, p: acc + F.size(p["_piece"])
            )
            .cast("long")
            .alias("n_tokens"),
            F.transform("_parts", lambda p: p[key_col]).alias("doc_ids"),
        )
    )
    return assembled


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
