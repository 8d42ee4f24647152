"""End-to-end corpus preparation: the full training-data story chained
on the driver's documents table — survivors of exact dedup, span
masking, eval decontamination, PII redaction, source mixing, sequence
packing.  Each stage is plan-hygienic on its own (per-module tests);
this pins the COMPOSITION: schemas flow, row accounting stays
consistent, and the final packed output conserves every token."""

import os

import pytest
from pyspark.sql import functions as F

from atsc_spark.datapipe import dedup, sampling, scrub, spans

PATH = "/root/testdata/sf0.001/documents.parquet"

pytestmark = pytest.mark.skipif(
    not os.path.exists(PATH), reason="driver testdata not available"
)


def test_full_corpus_prep(spark):
    docs = spark.read.parquet(PATH).select("doc_id", "text", "source")
    n0 = docs.count()

    # 1. exact dedup -> survivors only
    survivors = dedup.dedup_exact_survivors(docs, "text")
    keep = docs.join(survivors.select("doc_id"), "doc_id", "left_semi")
    n1 = keep.count()
    assert 0 < n1 <= n0

    # 2. span-level masking (cut repeated boilerplate spans)
    masked = spans.mask_duplicate_spans(keep, window_tokens=16, stride=8)
    assert masked.count() == n1  # masking never drops documents

    # 3. decontaminate against a fake eval set drawn from the corpus
    evals = docs.where("doc_id % 50 = 0").select("text")
    clean = spans.decontaminate(
        masked.select("doc_id", "text", "source"), evals, ngram=8
    )
    n3 = clean.count()
    assert n3 < n1  # the planted eval docs must be caught

    # 4. PII redaction (no-op on this synthetic corpus, but the
    #    schema contract is what we pin)
    scrubbed = scrub.pii_redact(clean)
    assert set(scrubbed.columns) == {"doc_id", "source", "text", "n_redactions"}
    assert scrubbed.count() == n3

    # 5. deterministic source mixing (keep half of everything)
    mixed = sampling.mix_corpus(
        scrubbed.select("doc_id", "text", "source"), {}, default_weight=0.5, seed=9
    )
    n5 = mixed.count()
    assert 0 < n5 < n3

    # 6. pack into training sequences; total packed tokens ==
    #    surviving corpus tokens + one separator per doc
    def n_toks(df):
        return df.agg(
            F.sum(
                F.when(F.col("text") == "", 0).otherwise(
                    F.size(F.split("text", " "))
                )
            )
        ).first()[0]

    corpus_tokens = n_toks(mixed)
    packed = sampling.pack_sequences(
        mixed.withColumn(
            "doc_id", F.concat_ws("#", "doc_id", "epoch")
        ).select("doc_id", "text"),
        seq_tokens=256,
    )
    row = packed.agg(F.sum("n_tokens"), F.max("n_tokens"), F.count("*")).first()
    # empty-text docs still carry their separator token
    assert row[0] == corpus_tokens + n5
    assert row[1] <= 256 and row[2] >= corpus_tokens // 256
