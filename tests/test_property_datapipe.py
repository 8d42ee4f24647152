"""Property-based checks for the new datapipe operators.

Spark jobs are expensive per example, so each property draws a BATCH
of random cases and evaluates them in one DataFrame action (the
repo's convention for Spark-side hypothesis, cf.
test_property_codec.py which stays numpy-side)."""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from atsc_spark.datapipe import sampling, scrub


def _py_luhn(digits: str) -> bool:
    if len(digits) < 12 or not digits.isdigit():
        return False
    total = 0
    for i, ch in enumerate(reversed(digits)):
        v = int(ch)
        if i % 2 == 1:
            v *= 2
            if v > 9:
                v -= 9
        total += v
    return total % 10 == 0


@given(
    st.lists(
        st.text(
            alphabet="0123456789 -abx", min_size=0, max_size=24
        ),
        min_size=1,
        max_size=200,
    )
)
@settings(max_examples=5, deadline=None)
def test_luhn_matches_python(spark, cases):
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], ["i", "d"])
    got = {
        r["i"]: r["ok"]
        for r in df.select("i", scrub.luhn_valid_expr("d").alias("ok")).collect()
    }
    for i, c in enumerate(cases):
        assert got[i] == _py_luhn(c), repr(c)


@given(
    st.lists(
        st.integers(min_value=0, max_value=10**9),
        min_size=1,
        max_size=120,
        unique=True,
    ),
    st.integers(min_value=1, max_value=30),
    st.integers(min_value=1, max_value=6),
)
@settings(max_examples=5, deadline=None)
def test_pack_sequences_matches_python(spark, ids, seq_tokens, seed):
    """pack_sequences == the straightforward Python concat+slice for
    arbitrary corpora, window sizes and seeds."""
    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range((i * 13) % 17 + 1))) for i in ids
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["seq_id"]: (r["text"], r["n_tokens"], list(r["doc_ids"]))
        for r in sampling.pack_sequences(
            df, seq_tokens=seq_tokens, seed=seed, separator="<e>"
        ).collect()
    }
    hashes = {
        r["doc_id"]: r["h"]
        for r in df.select(
            "doc_id",
            F.least(
                (F.xxhash64("doc_id", F.lit(seed)).cast("double") / 2.0**64) + 0.5,
                F.lit(1.0 - 2.0**-53),
            ).alias("h"),
        ).collect()
    }
    stream, stream_docs = [], []
    for did, text in sorted(rows, key=lambda r: (hashes[r[0]], r[0])):
        ts = text.split(" ") + ["<e>"]
        stream.extend(ts)
        stream_docs.extend([did] * len(ts))
    n_seqs = (len(stream) + seq_tokens - 1) // seq_tokens
    assert len(got) == n_seqs
    for k in range(0, len(stream), seq_tokens):
        want = stream[k : k + seq_tokens]
        text, n, dids = got[k // seq_tokens]
        assert text.split(" ") == want
        assert n == len(want)
        assert dids == list(dict.fromkeys(stream_docs[k : k + seq_tokens]))


@given(st.integers(min_value=0, max_value=2**31), st.integers(1, 400))
@settings(max_examples=5, deadline=None)
def test_pii_redact_idempotent(spark, seed, n):
    """Redacting already-redacted text changes nothing: placeholders
    contain no digits or @, so no pattern can re-fire across them."""
    import random

    rng = random.Random(seed)
    frags = [
        "call 555-123-4567 now",
        "a@b.io",
        "card 4532 0151 1283 0366",
        "ssn 123-45-6789",
        "ip 10.0.0.1",
        "just words here",
        "numbers 1234 5678",
    ]
    rows = [
        (i, " ".join(rng.choice(frags) for _ in range(rng.randint(1, 6))))
        for i in range(min(n, 50))
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    once = scrub.pii_redact(df).select("doc_id", "text")
    twice = scrub.pii_redact(once).select("doc_id", "text", "n_redactions")
    out = twice.collect()
    assert all(r["n_redactions"] == 0 for r in out)
    a = {r["doc_id"]: r["text"] for r in once.collect()}
    assert {r["doc_id"]: r["text"] for r in out} == a
