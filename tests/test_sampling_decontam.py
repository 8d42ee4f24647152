"""Deterministic sampling/mixing (datapipe/sampling.py) and eval-set
decontamination (datapipe/spans.py)."""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from atsc_spark.datapipe import sampling, spans


def _plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (i, f"doc {i} " + " ".join(f"w{i}_{j}" for j in range(10)),
         ["web", "books", "code"][i % 3])
        for i in range(300)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


# ------------------------------------------------------- sampling


def test_sample_fraction_stable_under_repartition(corpus):
    a = {r[0] for r in sampling.sample_fraction(corpus, 0.4, seed=7).select("doc_id").collect()}
    b = {
        r[0]
        for r in sampling.sample_fraction(corpus.repartition(13), 0.4, seed=7)
        .select("doc_id")
        .collect()
    }
    assert a == b  # the property DataFrame.sample does NOT have
    assert 0.25 < len(a) / 300 < 0.55
    # different seed = different (overlapping but not equal) sample
    c = {r[0] for r in sampling.sample_fraction(corpus, 0.4, seed=8).select("doc_id").collect()}
    assert c != a


def test_sample_fraction_bounds(corpus):
    assert sampling.sample_fraction(corpus, 0.0).count() == 0
    assert sampling.sample_fraction(corpus, 1.0).count() == 300
    with pytest.raises(ValueError):
        sampling.sample_fraction(corpus, 1.5)


def test_stratified_sample(corpus):
    out = sampling.stratified_sample(
        corpus, {"web": 1.0, "books": 0.3}, seed=3
    )
    by_src = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by_src["web"] == 100  # keep all
    assert 15 <= by_src.get("books", 0) <= 55  # ~30 of 100
    assert "code" not in by_src  # default_fraction 0

    # adding a stratum later never changes existing strata's rows
    out2 = sampling.stratified_sample(
        corpus, {"web": 1.0, "books": 0.3, "code": 0.5}, seed=3
    )
    books = lambda df: {r[0] for r in df.where("source='books'").select("doc_id").collect()}
    assert books(out) == books(out2)


def test_mix_corpus_epochs(corpus):
    out = sampling.mix_corpus(corpus, {"web": 2.0, "books": 0.4, "code": 2.5}, seed=1)
    n = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert n["web"] == 200  # exactly 2 epochs
    assert 20 <= n["books"] <= 60  # ~40
    assert 200 <= n["code"] <= 300  # 2 + ~0.5 epochs
    # epoch column: every web doc appears with epochs {0, 1}
    eps = out.where("source='web'").groupBy("doc_id").agg(
        F.sort_array(F.collect_list("epoch")).alias("e")
    )
    assert all(r["e"] == [0, 1] for r in eps.collect())
    # deterministic: rerun identical
    again = sampling.mix_corpus(corpus, {"web": 2.0, "books": 0.4, "code": 2.5}, seed=1)
    key = lambda df: sorted((r["doc_id"], r["epoch"]) for r in df.collect())
    assert key(out) == key(again)


def test_mix_corpus_guards(corpus):
    # reserved-column collisions raise instead of silently duplicating
    with pytest.raises(ValueError, match="epoch"):
        sampling.mix_corpus(
            sampling.mix_corpus(corpus, {"web": 2.0}), {"web": 2.0}
        )
    # defaults validated like dict values
    with pytest.raises(ValueError, match="default_weight"):
        sampling.mix_corpus(corpus, {}, default_weight=-1.0)
    with pytest.raises(ValueError, match="default_fraction"):
        sampling.stratified_sample(corpus, {}, default_fraction=1.5)


def test_mix_and_sample_zero_shuffle(corpus):
    for df in (
        sampling.sample_fraction(corpus, 0.5),
        sampling.stratified_sample(corpus, {"web": 0.5}),
        sampling.mix_corpus(corpus, {"web": 2.5}),
    ):
        plan = _plan_of(df)
        assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_train_order_deterministic_across_parallelism(corpus):
    a = [r["doc_id"] for r in sampling.train_order(corpus, seed=5).collect()]
    b = [r["doc_id"] for r in sampling.train_order(corpus.repartition(17), seed=5).collect()]
    assert a == b and a != sorted(a)
    assert sorted(a) == list(range(300))


# ------------------------------------------------ sequence packing


def test_pack_sequences_exact(spark):
    """Full GPT-style packing semantics against a Python reference:
    concat in hash order with separators, slice into exact windows."""
    rows = [(i, " ".join(f"d{i}w{j}" for j in range(3 + (i * 7) % 11))) for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    SEQ, SEED, SEP = 16, 3, "<|eod|>"

    out = {
        r["seq_id"]: r
        for r in sampling.pack_sequences(df, seq_tokens=SEQ, seed=SEED, separator=SEP).collect()
    }

    # python reference, ordered by the same unit-hash the op uses
    hashes = {
        r["doc_id"]: r["h"]
        for r in df.select(
            "doc_id",
            (
                (F.xxhash64("doc_id", F.lit(SEED)).cast("double") / 2.0**64) + 0.5
            ).alias("h"),
        ).collect()
    }
    stream, stream_docs = [], []
    for did, text in sorted(rows, key=lambda r: (hashes[r[0]], r[0])):
        ts = text.split(" ") + [SEP]
        stream.extend(ts)
        stream_docs.extend([did] * len(ts))
    for k in range(0, len(stream), SEQ):
        want = stream[k : k + SEQ]
        got = out[k // SEQ]
        assert got["text"].split(" ") == want, k // SEQ
        assert got["n_tokens"] == len(want)
        want_docs = list(dict.fromkeys(stream_docs[k : k + SEQ]))
        assert list(got["doc_ids"]) == want_docs
    assert len(out) == (len(stream) + SEQ - 1) // SEQ
    # every sequence but the last is exactly full
    assert all(out[s]["n_tokens"] == SEQ for s in range(len(out) - 1))


def test_pack_sequences_parallelism_invariant(spark):
    rows = [(i, " ".join(f"x{i}_{j}" for j in range(5))) for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    a = sorted(
        (r["seq_id"], r["text"])
        for r in sampling.pack_sequences(df, seq_tokens=32, seed=1).collect()
    )
    b = sorted(
        (r["seq_id"], r["text"])
        for r in sampling.pack_sequences(
            df.repartition(11), seq_tokens=32, seed=1
        ).collect()
    )
    assert a == b


def test_pack_sequences_bucket_overflow_guard(spark):
    """An undersized n_buckets must fail loudly, not silently funnel
    the corpus through one window task (VERDICT r5 #4): with one bucket
    and a sub-corpus row budget the guard names the bucket and knob."""
    rows = [(i, f"a b c {i}") for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    with pytest.raises(ValueError, match="n_buckets"):
        sampling.pack_sequences(df, seq_tokens=8, n_buckets=1, max_bucket_rows=10)
    # same corpus under the default budget still packs fine
    assert sampling.pack_sequences(df, seq_tokens=8, n_buckets=1).count() > 0


def test_pack_sequences_doc_longer_than_seq(spark):
    df = spark.createDataFrame(
        [(0, " ".join(f"t{j}" for j in range(50)))], ["doc_id", "text"]
    )
    out = sorted(
        sampling.pack_sequences(df, seq_tokens=16).collect(),
        key=lambda r: r["seq_id"],
    )
    # 51 tokens (incl separator) -> seqs of 16,16,16,3; doc in all
    assert [r["n_tokens"] for r in out] == [16, 16, 16, 3]
    assert all(list(r["doc_ids"]) == [0] for r in out)
    rejoined = " ".join(r["text"] for r in out)
    assert rejoined == " ".join(f"t{j}" for j in range(50)) + " <|eod|>"


# -------------------------------------------------- decontamination


@pytest.fixture(scope="module")
def train_eval(spark):
    leak = " ".join(f"q{i}" for i in range(13))  # a 13-gram from the eval set
    train = spark.createDataFrame(
        [
            (0, "clean " + " ".join(f"a{i}" for i in range(20))),
            (1, f"prefix text {leak} suffix text here"),
            (2, " ".join(f"b{i}" for i in range(30))),
            (3, "too short to hold any thirteen gram"),
        ],
        ["doc_id", "text"],
    )
    evals = spark.createDataFrame(
        [(f"question: {leak} answer: 42",), ("unrelated eval prompt entirely",)],
        ["text"],
    )
    return train, evals


def test_contaminated_doc_ids(train_eval):
    train, evals = train_eval
    hits = {r["doc_id"]: r["n_hits"] for r in spans.contaminated_doc_ids(train, evals).collect()}
    assert set(hits) == {1} and hits[1] >= 1


def test_decontaminate(train_eval):
    train, evals = train_eval
    kept = {r["doc_id"] for r in spans.decontaminate(train, evals).collect()}
    assert kept == {0, 2, 3}
    # schema passes through
    assert spans.decontaminate(train, evals).columns == train.columns


def test_decontaminate_broadcasts_eval(train_eval):
    train, evals = train_eval
    plan = _plan_of(spans.decontaminate(train, evals))
    assert "BroadcastHashJoin" in plan
    # corpus side is never shuffled for the semi-join: the only
    # Exchange allowed is the contaminated-ids aggregation (tiny side)
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan
