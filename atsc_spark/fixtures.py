"""Deterministic synthetic transcripts table (FIXTURES.md §1).

Schema per BASELINE.json ``input_hint``:
``(conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp)``.

Generation is fully distributed and JVM-side: ``spark.range`` over
conversations, hash-derived uniforms (xxhash64), Zipf conversation
lengths for hot-key skew realism, ``sequence``+``explode`` for turns,
and a bounded per-conversation window cumsum for timestamps.  No
Python executes per row, and determinism comes from hashing
(conv, turn) coordinates — the same rows appear for any partitioning
or cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

EPOCH_START = "2024-01-01 00:00:00"
TOOLS = [
    "search", "python", "browser", "calculator", "sql", "files", "email", "calendar",
]
_FILLER = (
    "the quick brown token stream rolls over the frame boundary while the "
    "compressor fits a polynomial to the turn rate and the fft hums along "
)


def _uniform(*cols, salt: int):
    """Deterministic uniform in [0, 1) from a row coordinate hash."""
    h = F.xxhash64(*cols, F.lit(salt))
    return (F.pmod(h, F.lit(1 << 30)).cast("double")) / float(1 << 30)


def transcripts(
    spark: SparkSession,
    n_convs: int = 2000,
    window_days: int = 7,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Build the synthetic transcripts DataFrame.

    Conversation length ~ Zipf(a=1.5) clipped to [2, 4096] (inverse-CDF
    of a hash uniform), so a few conversations are "hot" — the skew the
    north rule requires us to handle explicitly.
    """
    convs = spark.range(n_convs, numPartitions=partitions)
    u_len = _uniform(F.col("id"), salt=seed * 7 + 1)
    # P(L >= x) ~ x^-(a-1) with a=1.5  =>  L = 2 * u^-2, clipped
    # clamp in double BEFORE the int cast: ANSI mode rejects overflow
    raw_len = F.least(F.lit(4096.0), F.lit(2.0) / F.pow(F.greatest(u_len, F.lit(1e-9)), 2.0))
    n_turns = F.greatest(F.lit(2), raw_len.cast("int"))
    u_start = _uniform(F.col("id"), salt=seed * 7 + 2)
    conv_start = F.to_timestamp(F.lit(EPOCH_START)) + F.make_interval(
        secs=F.round(u_start * (window_days * 86400.0), 0)
    )

    turns = (
        convs.select(
            F.format_string("conv_%08d", F.col("id")).alias("conv_id"),
            F.col("id").alias("conv_no"),
            n_turns.alias("n_turns"),
            conv_start.alias("conv_start"),
        )
        .select(
            "conv_id",
            "conv_no",
            "conv_start",
            F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
        )
    )

    u_role = _uniform("conv_no", "turn_idx", salt=seed * 7 + 3)
    role = (
        F.when(u_role < 0.10, F.lit("tool"))
        .when(F.pmod(F.col("turn_idx"), F.lit(2)) == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
    )

    # text length ~ lognormal(mu=5, sigma=1), via Box-Muller on hash uniforms
    u1 = _uniform("conv_no", "turn_idx", salt=seed * 7 + 4)
    u2 = _uniform("conv_no", "turn_idx", salt=seed * 7 + 5)
    z = F.sqrt(-2.0 * F.log(F.greatest(u1, F.lit(1e-12)))) * F.cos(2.0 * 3.141592653589793 * u2)
    text_len = F.least(F.lit(20000), F.greatest(F.lit(1), F.exp(F.lit(5.0) + z).cast("int")))
    filler_reps = (20000 // len(_FILLER)) + 2
    text = F.substring(F.repeat(F.lit(_FILLER), filler_reps), 1, text_len)

    # tool name: Zipf-ish categorical over 8 tools, null for non-tool turns
    u_tool = _uniform("conv_no", "turn_idx", salt=seed * 7 + 6)
    tool_expr = F.lit(None).cast("string")
    # cumulative Zipf(1.0)-ish buckets: p_i ~ 1/i
    weights = [1.0 / (i + 1) for i in range(len(TOOLS))]
    total = sum(weights)
    acc = 0.0
    branch = None
    for name, wgt in zip(TOOLS, weights):
        acc += wgt / total
        cond = u_tool < acc
        branch = F.when(cond, F.lit(name)) if branch is None else branch.when(cond, F.lit(name))
    tool = F.when(role == "tool", branch.otherwise(F.lit(TOOLS[-1]))).otherwise(tool_expr)

    # inter-turn gap ~ Exp(mean 20 s), quantized to whole seconds >= 1
    u_gap = _uniform("conv_no", "turn_idx", salt=seed * 7 + 7)
    gap = F.greatest(F.lit(1.0), F.round(-20.0 * F.log(F.greatest(u_gap, F.lit(1e-12))), 0))
    w = Window.partitionBy("conv_id").orderBy("turn_idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    elapsed = F.sum(gap).over(w)

    return turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        (F.col("conv_start") + F.make_interval(secs=elapsed)).alias("ts"),
    )


def monitoring_series(
    spark: SparkSession,
    n_series: int = 100,
    samples_per_series: int = 4320,
    seed: int = 42,
    cadence_s: int = 20,
) -> DataFrame:
    """Reference-demo-corpora shapes recast as series (BASELINE.md):
    cpu_utilization-like (noisy % with flat tail), iowait-like
    (near-zero spiky), heap-gauge-like (large integral), uptime-like
    (constant).  One series-day is 4,320 samples at the reference's
    20 s cadence.  Fully JVM-side generation (sequence+explode, hash
    uniforms, Box-Muller) — scales to any series count.
    """
    base = spark.range(n_series).select(
        F.format_string("series_%06d", F.col("id")).alias("conv_id"),
        F.col("id").alias("sid"),
        F.explode(F.sequence(F.lit(0), F.lit(samples_per_series - 1))).alias("i"),
    )
    u1 = _uniform("sid", "i", salt=seed * 13 + 1)
    u2 = _uniform("sid", "i", salt=seed * 13 + 2)
    u3 = _uniform("sid", "i", salt=seed * 13 + 3)
    gauss = F.sqrt(-2.0 * F.log(F.greatest(u1, F.lit(1e-12)))) * F.cos(
        2.0 * 3.141592653589793 * u2
    )
    # Mix mirrors the paper corpus' composition (§7: mostly slow DB
    # monitoring gauges, ~13% near-perfect-fit, spiky signals rare):
    # 40% cpu-like, 5% iowait-like, 35% heap-like, 20% constant.
    bucket = F.pmod(F.col("sid"), F.lit(20))
    kind = (
        F.when(bucket < 8, 0).when(bucket < 9, 1).when(bucket < 16, 2).otherwise(3)
    )
    i = F.col("i").cast("double")
    flat_start = int(samples_per_series * 0.8)
    i_eff = F.when((kind == 0) & (F.col("i") >= flat_start), F.lit(float(flat_start))).otherwise(i)
    cpu = F.round(F.abs(40.0 + 20.0 * F.sin(i_eff / 120.0)
                        + F.when(F.col("i") >= flat_start, 0.0).otherwise(0.8 * gauss)), 2) + 1.0
    iowait = F.round(F.abs(0.02 + 0.005 * gauss), 3) + 0.01 + F.when(
        u3 > 0.97, F.round(u1 * 2.0, 3)
    ).otherwise(0.0)
    heap = F.round(1e8 + 1e6 * F.sin(i / 300.0) + F.floor(u3 * 1e5), 0)
    uptime = F.lit(12345.0)
    value = (
        F.when(kind == 0, cpu)
        .when(kind == 1, iowait)
        .when(kind == 2, heap)
        .otherwise(uptime)
    )
    metric = (
        F.when(kind == 0, "cpu_like")
        .when(kind == 1, "iowait_like")
        .when(kind == 2, "heap_like")
        .otherwise(F.lit("uptime_like"))
    )
    ts = F.to_timestamp(F.lit(EPOCH_START)) + F.make_interval(secs=F.col("i") * cadence_s)
    return base.select(
        "conv_id", metric.alias("metric"), ts.alias("bucket_ts"), value.alias("value")
    )


def documents_dupheavy(
    spark: SparkSession, n_docs: int = 100_000, plant_pii: bool = True
) -> DataFrame:
    """Duplicate-heavy document corpus for dedup scale evidence.

    Deterministic and fully JVM-side: families of 5 near-identical
    documents (same ~190-char body, one trailing variant token), plus
    an adversarial shared boilerplate on every 50th id — a single text
    repeated n_docs/50 times, which lands in one LSH bucket per band
    and must be CAPPED, not joined (the O(m^2) pattern that turns a
    bucketed join quadratic at 10^9 docs).

    With ``plant_pii`` (default, since r6 — VERDICT r5 #2: the bench
    corpus carried no PII, so the scrub timing measured scan/match
    only, never the redaction fold), 30% of the non-boilerplate docs
    carry a deterministic PII tail: every id%10==3 a unique email,
    ==7 a Luhn-valid card (exercising the aggregate() replace fold),
    ==5 an SSN + IPv4.  Boilerplate docs (id%50==0 implies id%10==0)
    are never planted, so the every-copy-identical property that
    drives the LSH cap test is preserved.
    """
    fam = (F.col("id") / 5).cast("long")
    member = F.pmod(F.col("id"), F.lit(5))
    topic = F.pmod(fam * 2654435761, F.lit(997))
    body = F.concat(
        F.lit("conversation transcript about topic "),
        topic.cast("string"),
        F.lit(" where the agent calls tools and summarizes findings "),
        F.lit("across many turns with consistent terminology and a "),
        F.lit("stable narrative arc covering analysis of dataset "),
        fam.cast("string"),
        F.lit(" variant "),
        member.cast("string"),
    )
    boilerplate = F.lit(
        "standard system prompt boilerplate that every conversation "
        "shares verbatim including safety guidelines and formatting "
        "rules repeated identically across the entire corpus"
    )
    text = F.when(F.pmod(F.col("id"), F.lit(50)) == 0, boilerplate).otherwise(body)
    if plant_pii:
        mod10 = F.pmod(F.col("id"), F.lit(10))
        tail = (
            F.when(
                mod10 == 3,
                F.concat(
                    F.lit(" contact agent"),
                    F.col("id").cast("string"),
                    F.lit("@example.com today"),
                ),
            )
            .when(mod10 == 7, F.lit(" pay card 4532 0151 1283 0366 now"))
            .when(mod10 == 5, F.lit(" ssn 123-45-6789 from 10.0.255.3"))
            .otherwise(F.lit(""))
        )
        text = F.concat(text, tail)
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
    )


def spammy_documents(
    spark: SparkSession, n_docs: int = 500, start_id: int = 10_000_000
) -> DataFrame:
    """Documents GUARANTEED to fail Gopher repetition thresholds, for
    benching/testing that the filter actually drops rows (the
    dup-heavy corpus never trips any threshold — its repetition is
    ACROSS documents, which is dedup's job, not within them).  Kept a
    SEPARATE fixture unioned in at call sites so the dup-heavy
    corpus' dedup/LSH/span trend lines stay untouched (the lesson of
    the r6 plant_pii discontinuity, ADVICE r6).  Three failure
    shapes, JVM-side:

    - id%3==0: one 2-gram repeated wall-to-wall (top_2gram_char_frac
      ~1 >> 0.20);
    - id%3==1: one line duplicated 40x (dup_line_frac ~0.97 >> 0.30);
    - id%3==2: a 6-token sentence repeated 30x (dup_5gram+ fracs
      ~1 >> 0.10-0.15).
    """
    mod = F.pmod(F.col("id"), F.lit(3))
    uniq = F.col("id").cast("string")  # keeps docs distinct for dedup
    text = (
        F.when(mod == 0, F.concat(F.lit(("buy now " * 60).strip() + " offer "), uniq))
        .when(mod == 1, F.concat(F.lit("identical spam line\n" * 40), F.lit("end "), uniq))
        .otherwise(
            F.concat(
                F.lit(("click here to claim your free prize " * 30).strip() + " ref "),
                uniq,
            )
        )
    )
    return spark.range(start_id, start_id + n_docs).select(
        F.col("id").alias("doc_id"), text.alias("text")
    )


def hot_transcripts(
    spark: SparkSession,
    n_convs: int = 64,
    total_turns: int = 400_000,
    hot_share: float = 0.5,
    window_days: int = 2,
) -> DataFrame:
    """Pathologically-skewed transcripts: ONE conversation carries
    ``hot_share`` of all turns (default half), the rest split evenly.
    The deliberate hot-key corpus for skew evidence — far beyond the
    Zipf tail :func:`transcripts` produces naturally.  Fully JVM-side
    generation."""
    hot_turns = int(total_turns * hot_share)
    cold_each = max((total_turns - hot_turns) // max(n_convs - 1, 1), 2)
    span_s = float(window_days * 86400)

    def turn_cols(conv_id_col, idx_col, n_turns: int):
        ts = F.to_timestamp(F.lit(EPOCH_START)) + F.make_interval(
            secs=F.round(idx_col.cast("double") * (span_s / float(n_turns)), 0)
        )
        return [
            conv_id_col.alias("conv_id"),
            idx_col.cast("int").alias("turn_idx"),
            F.when(F.pmod(idx_col, F.lit(2)) == 0, "user")
            .otherwise("assistant")
            .alias("role"),
            F.repeat(F.lit("x"), (F.pmod(idx_col, F.lit(50)) + 5).cast("int")).alias(
                "text"
            ),
            F.when(F.pmod(idx_col, F.lit(7)) == 0, F.lit("search")).alias("tool"),
            ts.alias("ts"),
        ]

    hot = spark.range(hot_turns).select(
        *turn_cols(F.lit("conv_hot"), F.col("id"), hot_turns)
    )
    cold = (
        spark.range(n_convs - 1)
        .select(
            F.format_string("conv_%08d", F.col("id")).alias("cid"),
            F.explode(F.sequence(F.lit(0), F.lit(cold_each - 1))).alias("i"),
        )
        .select(*turn_cols(F.col("cid"), F.col("i").cast("long"), cold_each))
    )
    return hot.unionByName(cold)
