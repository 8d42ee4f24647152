"""PII scrub and exact-substring span dedup (datapipe/scrub.py,
datapipe/spans.py)."""

import io
from contextlib import redirect_stdout

import duckdb
import pytest

from atsc_spark.datapipe import scrub, spans


def _plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ------------------------------------------------------------- PII


@pytest.fixture(scope="module")
def pii_docs(spark):
    rows = [
        (0, "contact john.doe+spam@example.co.uk or call 555-123-4567 today"),
        (1, "card 4532 0151 1283 0366 expires soon; order id 1234 5678 1234 5678"),
        (2, "ssn 123-45-6789 leaked from 10.0.255.3 at 3pm"),
        (3, "clean document with no pii at all, just 42 numbers"),
        (4, "two mails a@b.io c@d.org and ip 192.168.0.1"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_luhn_expr(spark):
    # 4532015112830366 is a Luhn-valid test PAN; flipping a digit breaks it
    df = spark.createDataFrame(
        [("4532015112830366",), ("4532015112830367",), ("",), ("12",)], ["d"]
    )
    got = [r[0] for r in df.select(scrub.luhn_valid_expr("d")).collect()]
    assert got == [True, False, False, False]


def test_pii_counts(pii_docs):
    got = {
        r["doc_id"]: r.asDict()
        for r in scrub.pii_counts(pii_docs).collect()
    }
    assert got[0]["n_email"] == 1 and got[0]["n_phone"] == 1
    # doc 1: first 16-digit group Luhn-valid, second (1234...) is not
    assert got[1]["n_card"] == 1
    assert got[2]["n_ssn"] == 1 and got[2]["n_ipv4"] == 1
    assert got[3]["has_pii"] is False
    assert got[4]["n_email"] == 2 and got[4]["n_ipv4"] == 1
    assert all(got[i]["has_pii"] for i in (0, 1, 2, 4))


def test_pii_counts_vs_duckdb(pii_docs):
    """Pattern portability: the regex kinds (not card — Luhn is not a
    regex) count identically under DuckDB's RE2."""
    pdf = pii_docs.toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    for kind, pattern, _ in scrub.PII_KINDS:
        if kind == "card":
            continue
        oracle = {
            int(r[0]): int(r[1])
            for r in con.sql(
                "select doc_id, length(list_filter(regexp_extract_all(text, "
                f"'{pattern}'), x -> x != '')) from docs"
            ).fetchall()
        }
        got = {
            r["doc_id"]: r[f"n_{kind}"]
            for r in scrub.pii_counts(pii_docs).collect()
        }
        assert got == oracle, kind


def test_pii_findings(pii_docs):
    rows = scrub.pii_findings(pii_docs).collect()
    found = {(r["doc_id"], r["kind"], r["match"]) for r in rows}
    assert (0, "email", "john.doe+spam@example.co.uk") in found
    assert (1, "card", "4532 0151 1283 0366") in found
    assert (2, "ssn", "123-45-6789") in found
    assert (2, "ipv4", "10.0.255.3") in found
    # the Luhn-invalid 16-digit group is NOT reported as a card
    assert not any(k == "card" and "1234" in m for _, k, m in found)


def test_pii_redact(pii_docs):
    got = {
        r["doc_id"]: (r["text"], r["n_redactions"])
        for r in scrub.pii_redact(pii_docs).collect()
    }
    assert got[0] == ("contact <EMAIL> or call <PHONE> today", 2)
    # valid card masked, invalid digit-run untouched
    assert got[1] == (
        "card <CARD> expires soon; order id 1234 5678 1234 5678",
        1,
    )
    assert got[2] == ("ssn <SSN> leaked from <IP> at 3pm", 2)
    assert got[3] == ("clean document with no pii at all, just 42 numbers", 0)
    assert got[4] == ("two mails <EMAIL> <EMAIL> and ip <IP>", 3)


def test_luhn_expr_ansi_safe_on_raw_strings(spark):
    # non-digit input returns false, never CAST_INVALID_INPUT
    df = spark.createDataFrame(
        [("4111-1111-1111-1111",), ("abcd5678",), ("453201511283036x",)], ["d"]
    )
    got = [r[0] for r in df.select(scrub.luhn_valid_expr("d")).collect()]
    assert got == [False, False, False]


def test_card_digit_boundary_guards(spark):
    # a >19-digit identifier yields NO candidate (not a 19-digit
    # prefix), and a valid card embedded in a longer digit run is not
    # matched — so redaction can never cut a chunk out of a hash/id
    df = spark.createDataFrame(
        [
            (0, "txn 1234567890123456789012345 ok"),
            (1, "id 94532015112830366 and card 4532015112830366"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: (r["text"], r["n_redactions"])
           for r in scrub.pii_redact(df).collect()}
    assert got[0] == ("txn 1234567890123456789012345 ok", 0)
    # the 17-digit id contains the valid card as a substring, but only
    # the boundary-guarded standalone occurrence is masked
    assert got[1] == ("id 94532015112830366 and card <CARD>", 1)


def test_pii_findings_single_scan(pii_docs):
    import re

    plan = _plan_of(scrub.pii_findings(pii_docs))
    # one explode node (formatted explain prints each node in the tree
    # AND a numbered detail header — count the headers)
    assert len(re.findall(r"^\(\d+\) Generate", plan, re.M)) == 1
    assert "Union" not in plan and "Exchange" not in plan


def test_pii_redact_passthrough_and_plan(pii_docs):
    out = scrub.pii_redact(pii_docs.withColumn("extra", pii_docs.doc_id * 2))
    assert set(out.columns) == {"doc_id", "extra", "text", "n_redactions"}
    plan = _plan_of(out)
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


# ------------------------------------------------- duplicate spans


BOILER = " ".join(f"b{i}" for i in range(8))  # an 8-token boilerplate span


@pytest.fixture(scope="module")
def span_docs(spark):
    uniq = lambda tag, n: " ".join(f"{tag}{i}" for i in range(n))
    rows = [
        (0, f"{uniq('u', 6)} {BOILER} {uniq('v', 6)}"),
        (1, f"{BOILER} {uniq('w', 12)}"),
        (2, uniq("x", 20)),
        (3, "short doc"),
        (4, f"{uniq('y', 3)} {BOILER} tail1 tail2 tail3 tail4 tail5"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_token_windows_shape(span_docs):
    wins = spans.token_windows(span_docs, window_tokens=8, stride=4).collect()
    by_doc = {}
    for r in wins:
        by_doc.setdefault(r["doc_id"], []).append(r["start_tok"])
    # doc 3 (2 tokens) emits nothing; doc 2 (20 tokens) -> starts 0,4,8,12
    assert 3 not in by_doc
    assert sorted(by_doc[2]) == [0, 4, 8, 12]


def test_duplicate_spans_finds_cross_doc_boilerplate(span_docs):
    dup = spans.duplicate_spans(span_docs, window_tokens=8, stride=1).collect()
    hits = {(r["doc_id"], r["start_tok"]): r for r in dup}
    # the exact boilerplate window: doc0 @6, doc1 @0, doc4 @3
    assert set(hits) == {(0, 6), (1, 0), (4, 3)}
    r = hits[(1, 0)]
    assert r["n_occurrences"] == 3 and r["n_docs"] == 3
    # global first = min (doc_id, start_tok) = (0, 6)
    assert hits[(0, 6)]["is_first"] and not r["is_first"]


def test_mask_duplicate_spans(span_docs):
    out = {
        r["doc_id"]: (r["text"], r["n_masked_tokens"])
        for r in spans.mask_duplicate_spans(
            span_docs, window_tokens=8, stride=1
        ).collect()
    }
    # doc 0 keeps the first occurrence intact
    assert BOILER in out[0][0] and out[0][1] == 0
    # docs 1 and 4 lose exactly the 8 boilerplate tokens
    assert out[1] == ("w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11", 8)
    assert out[4] == ("y0 y1 y2 tail1 tail2 tail3 tail4 tail5", 8)
    # untouched docs byte-identical (no-range branch returns original)
    assert out[2][0].startswith("x0 x1") and out[2][1] == 0
    assert out[3] == ("short doc", 0)


def test_mask_within_doc_repeat(spark):
    # the SAME span twice inside one doc: second occurrence cut
    text = f"{BOILER} mid1 mid2 {BOILER} end1"
    df = spark.createDataFrame([(7, text)], ["doc_id", "text"])
    out = spans.mask_duplicate_spans(df, window_tokens=8, stride=1).collect()[0]
    assert out["text"] == f"{BOILER} mid1 mid2 end1"
    assert out["n_masked_tokens"] == 8


def test_duplicate_spans_python_oracle(spark):
    """Cross-check detection against a brute-force Python sliding
    window on a small random-ish corpus."""
    import random

    rng = random.Random(7)
    vocab = [f"t{i}" for i in range(30)]
    base = [rng.choice(vocab) for _ in range(40)]
    docs = []
    for d in range(6):
        toks = [rng.choice(vocab) for _ in range(rng.randint(5, 50))]
        if d % 2 == 0:  # plant a shared 12-token run
            pos = rng.randint(0, max(0, len(toks) - 1))
            toks[pos:pos] = base[10:22]
        docs.append((d, " ".join(toks)))
    W, S = 8, 2
    expected = {}
    for d, text in docs:
        toks = text.split(" ")
        for s in range(0, len(toks) - W + 1, S):
            expected.setdefault(tuple(toks[s : s + W]), []).append((d, s))
    expected_hits = {
        occ for occs in expected.values() if len(occs) >= 2 for occ in occs
    }
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r["doc_id"], r["start_tok"])
        for r in spans.duplicate_spans(df, window_tokens=W, stride=S).collect()
    }
    assert got == expected_hits


def test_chunk_documents(spark):
    toks = [f"t{i}" for i in range(25)]
    df = spark.createDataFrame(
        [(0, " ".join(toks)), (1, "a b c"), (2, "solo")], ["doc_id", "text"]
    )
    out = spans.chunk_documents(df, chunk_tokens=10, overlap=3).collect()
    by_doc = {}
    for r in sorted(out, key=lambda r: (r["doc_id"], r["chunk_idx"])):
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 0: starts 0,7,14,21 -> sizes 10,10,10,4
    c0 = by_doc[0]
    assert [r["n_tokens"] for r in c0] == [10, 10, 10, 4]
    assert c0[0]["text"].split(" ") == toks[0:10]
    assert c0[1]["text"].split(" ") == toks[7:17]
    assert c0[3]["text"].split(" ") == toks[21:25]
    # consecutive chunks share exactly `overlap` tokens
    assert c0[0]["text"].split(" ")[-3:] == c0[1]["text"].split(" ")[:3]
    # every token appears in at least one chunk
    covered = {t for r in c0 for t in r["text"].split(" ")}
    assert covered == set(toks)
    # short docs: exactly one chunk, intact
    assert [(r["chunk_idx"], r["text"]) for r in by_doc[1]] == [(0, "a b c")]
    assert [(r["chunk_idx"], r["text"]) for r in by_doc[2]] == [(0, "solo")]

    with pytest.raises(ValueError):
        spans.chunk_documents(df, chunk_tokens=10, overlap=10)


def test_chunk_documents_zero_shuffle(spark):
    df = spark.createDataFrame([(0, "a b c d e")], ["doc_id", "text"])
    plan = _plan_of(spans.chunk_documents(df, chunk_tokens=4, overlap=1))
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_mask_token_conservation_real_corpus(spark):
    """On the driver's documents table: every token is either kept or
    counted in n_masked_tokens — nothing duplicated, nothing lost."""
    import os

    import pyspark.sql.functions as F

    path = "/root/testdata/sf0.001/documents.parquet"
    if not os.path.exists(path):
        pytest.skip("driver testdata not available")
    docs = spark.read.parquet(path)
    m = spans.mask_duplicate_spans(docs, window_tokens=16, stride=8)

    def tok(c):
        # empty text = 0 tokens (split('', ' ') artifacts to [''])
        return F.when(F.col(c) == "", 0).otherwise(F.size(F.split(F.col(c), " ")))

    before = docs.agg(F.sum(tok("text"))).first()[0]
    row = m.agg(F.sum(tok("text")), F.sum("n_masked_tokens")).first()
    assert before == row[0] + row[1]


def test_span_plan_single_agg_no_python(span_docs):
    df = spans.duplicate_spans(span_docs, window_tokens=8, stride=4)
    plan = _plan_of(df)
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan
