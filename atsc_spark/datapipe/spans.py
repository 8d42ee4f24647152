"""Exact-substring (span-level) deduplication.

Document-level dedup (`dedup.dedup_exact`, MinHash, SimHash) misses
the dominant duplication mode in web corpora: the same paragraph —
boilerplate, license text, quoted replies — embedded in otherwise
distinct documents.  The published fix (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better") removes exact token
spans repeated across the corpus.  Their suffix-array construction is
a single-machine algorithm; the Spark-native equivalent here is
windowed span hashing:

1. slide a `window_tokens`-token window with `stride` over each
   document's SPACE-delimited tokens — the corpus convention shared
   with `textstats.token_count`; normalize other whitespace upstream
   (`regexp_replace(text, '\\s+', ' ')`, cf. `textstats.fingerprint`)
   or newline-formatted text degenerates into few giant tokens —
   and hash each window (JVM `xxhash64` over the joined slice — one
   projection, no Python);
2. one `groupBy(win_hash)` finds windows occurring >= `min_count`
   times corpus-wide (with the globally-first occurrence chosen by
   `min_by` in the same aggregate);
3. join the duplicated hashes back to the window rows (1:1 per window
   row — NO pair explosion, unlike candidate-pair LSH: a span
   occurring a million times still costs one shuffle row per
   occurrence, so no bucket cap is needed here).

`stride < window_tokens` trades cost for recall like Lee et al.'s
suffix granularity: duplicated regions >= window+stride-1 tokens are
always caught; shorter ones only when window-aligned.  Collisions:
xxhash64 over >= window-token strings — corpus-scale false-merge
probability ~n^2/2^64, the same budget the MinHash path accepts.

Scale shape: |tokens|/stride window rows, ONE hash-partition shuffle,
one equi-join back.  All expressions are built-in functions inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_windows(
    docs: DataFrame,
    window_tokens: int = 32,
    stride: int = 16,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, start_tok, win_hash): one row per sliding window.

    Documents shorter than `window_tokens` produce no rows (a span
    shorter than the window cannot be a duplicated *span*; whole-doc
    duplicates are `dedup.dedup_exact`'s job).
    """
    if stride < 1 or window_tokens < 1:
        raise ValueError("window_tokens and stride must be >= 1")
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    starts = F.sequence(F.lit(0), n - window_tokens, F.lit(stride))
    return (
        docs.where(n >= window_tokens)
        .select("doc_id", toks.alias("_toks"), F.explode(starts).alias("start_tok"))
        .select(
            "doc_id",
            "start_tok",
            F.xxhash64(
                F.concat_ws(
                    " ", F.slice("_toks", F.col("start_tok") + 1, window_tokens)
                )
            ).alias("win_hash"),
        )
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 512,
    overlap: int = 64,
    text_col: str = "text",
) -> DataFrame:
    """Split documents into fixed-size training chunks with overlap:
    (doc_id, chunk_idx, text, n_tokens) — the standard pre-tokenizer
    packing step of an LLM data pipeline.

    Chunk i starts at token i*(chunk_tokens-overlap); the final chunk
    may be shorter (it is never empty), and every token appears in at
    least one chunk.  A document with <= chunk_tokens tokens yields
    exactly one chunk.  Pure JVM sequence/slice/concat_ws projection:
    zero shuffle, output rows ~ n_tokens/(chunk_tokens-overlap).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    # last start: the largest multiple of stride <= n-overlap-1 (so a
    # chunk never lies wholly inside the previous one's overlap)
    starts = F.sequence(
        F.lit(0), F.greatest(n - overlap - 1, F.lit(0)), F.lit(stride)
    )
    piece = F.slice("_toks", F.col("start") + 1, chunk_tokens)
    return (
        docs.select("doc_id", toks.alias("_toks"), F.posexplode(starts))
        .withColumnRenamed("pos", "chunk_idx")
        .withColumnRenamed("col", "start")
        .select(
            "doc_id",
            "chunk_idx",
            F.concat_ws(" ", piece).alias(text_col),
            F.size(piece).cast("long").alias("n_tokens"),
        )
    )


def duplicate_spans(
    docs: DataFrame,
    window_tokens: int = 32,
    stride: int = 16,
    min_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Every occurrence of every span repeated >= `min_count` times:
    (doc_id, start_tok, win_hash, n_occurrences, n_docs, is_first).

    `is_first` marks the globally-first occurrence (min (doc_id,
    start_tok)) — the copy :func:`mask_duplicate_spans` keeps.
    """
    wins = token_windows(docs, window_tokens, stride, text_col)
    dup = (
        wins.groupBy("win_hash")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min_by(
                F.struct("doc_id", "start_tok"), F.struct("doc_id", "start_tok")
            ).alias("_first"),
        )
        .where(F.col("n_occurrences") >= min_count)
    )
    return wins.join(dup, "win_hash").select(
        "doc_id",
        "start_tok",
        "win_hash",
        "n_occurrences",
        "n_docs",
        (
            (F.col("doc_id") == F.col("_first.doc_id"))
            & (F.col("start_tok") == F.col("_first.start_tok"))
        ).alias("is_first"),
    )


def contaminated_doc_ids(
    docs: DataFrame,
    eval_docs: DataFrame,
    ngram: int = 13,
    text_col: str = "text",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Training documents sharing at least one `ngram`-token span with
    the eval set: (doc_id, n_hits) — benchmark decontamination in the
    GPT-3 style (13-gram overlap; Brown et al. 2020, Appendix C).

    Doc-side n-grams are stride-1 windows (every n-gram, not a
    sample); eval-side n-grams are hashed and made distinct, then —
    eval sets being tiny next to a training corpus — broadcast, so
    the corpus side is a map-side hash semi-join with NO shuffle of
    the big table.  Set `broadcast_eval=False` for a pathologically
    large eval set to fall back to a shuffle join.

    A doc shorter than `ngram` tokens cannot contain an n-gram and is
    never flagged.
    """
    doc_grams = token_windows(docs, ngram, 1, text_col)
    eval_grams = token_windows(
        eval_docs.select(F.monotonically_increasing_id().alias("doc_id"), text_col),
        ngram,
        1,
        text_col,
    ).select("win_hash").distinct()
    if broadcast_eval:
        eval_grams = F.broadcast(eval_grams)
    return (
        doc_grams.join(eval_grams, "win_hash", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_hits"))
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    ngram: int = 13,
    text_col: str = "text",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Drop every training document flagged by
    :func:`contaminated_doc_ids`; schema passes through unchanged."""
    hits = contaminated_doc_ids(docs, eval_docs, ngram, text_col, broadcast_eval)
    return docs.join(hits.select("doc_id"), "doc_id", "left_anti")


def mask_duplicate_spans(
    docs: DataFrame,
    window_tokens: int = 32,
    stride: int = 16,
    min_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Cut every duplicated span except its globally-first occurrence
    (Lee et al. 2022 semantics: each cluster of identical spans keeps
    exactly one copy corpus-wide).

    Token-level surgery: per document, the non-first duplicate windows
    become [start, start+window) ranges; the text is rebuilt from the
    tokens whose index falls in no masked range, joined with single
    spaces (so runs of whitespace in the original collapse — the
    reconstruction is token-faithful, not byte-faithful).  Overlapping
    windows union naturally.  Adds `n_masked_tokens`; other columns
    pass through.  A document whose every token sits in masked ranges
    comes back as the empty string (token count 0 — but note Spark's
    `split('', ' ')` yields `['']`, size 1, if you re-tokenize it).

    Plan: the duplicate-span aggregate (one shuffle) + a groupBy
    doc_id of masked ranges (second shuffle, rows bounded by duplicate
    occurrences only) + one equi-join back to the docs — no pair
    explosion anywhere.
    """
    dups = duplicate_spans(docs, window_tokens, stride, min_count, text_col)
    masked_ranges = (
        dups.where(~F.col("is_first"))
        .groupBy("doc_id")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("start_tok").alias("s"),
                    (F.col("start_tok") + window_tokens).alias("e"),
                )
            ).alias("_ranges")
        )
    )
    toks = F.split(F.col(text_col), " ")
    keep = F.filter(
        toks,
        lambda t, i: ~F.exists(
            F.col("_ranges"), lambda r: (i >= r["s"]) & (i < r["e"])
        ),
    )
    rebuilt = F.when(F.col("_ranges").isNull(), F.col(text_col)).otherwise(
        F.concat_ws(" ", keep)
    )
    n_masked = F.when(F.col("_ranges").isNull(), F.lit(0)).otherwise(
        F.size(toks) - F.size(keep)
    )
    passthrough = [c for c in docs.columns if c != text_col]
    return (
        docs.join(masked_ranges, "doc_id", "left")
        .select(
            *passthrough,
            rebuilt.alias(text_col),
            n_masked.cast("long").alias("n_masked_tokens"),
        )
    )
