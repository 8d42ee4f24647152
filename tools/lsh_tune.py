"""MinHash-LSH band/row parameter probe (VERDICT r5 #7).

The r5 scale numbers showed an honest super-linear candidate tail
(10k -> 100k docs grew candidates 7.3x for 10x docs at the lsh_scale
config num_hashes=32, bands=4).  This probe measures the
recall/candidate-volume tradeoff across (num_hashes, bands) on the
duplicate-heavy corpus, against the corpus' KNOWN ground truth
(families of 5 near-identical docs), so the 100-TB default is a
measured choice rather than a folklore one.

Ground truth: a pair is a true near-dup iff both docs are
non-boilerplate members of the same 5-doc family (boilerplate docs —
every 50th id — are exact dupes of each other and trivially caught by
dedup_exact; they are excluded from recall, and their bucket is what
max_bucket caps).

r6 established (32, 8) as the band/row knee and max_bucket — not
bands — as the 100-TB recall lever (recall eroded 0.82 -> 0.71 from
10k to 100k docs at a fixed max_bucket=1000: cap truncation, not
hash collisions).  r7 adds the max_bucket sweep at the (32, 8)
default (VERDICT r6 #7) so the cap is a measured choice too.

Usage: python tools/lsh_tune.py [n_docs] [n_docs ...]
       python tools/lsh_tune.py --buckets-only [n_docs ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

CONFIGS = [
    # (num_hashes, bands) -> rows_per_band = num_hashes // bands
    (16, 8),   # r=2: loosest, most candidates
    (32, 8),   # r=4: the pre-r6 default
    (32, 6),   # r=5 (30 hashes used)
    (32, 4),   # r=8: the lsh_scale config
    (64, 8),   # r=8 at double signature cost
    (16, 4),   # r=4 at half signature cost
]


def truth_pairs(spark, n_docs: int):
    """All within-family pairs among non-boilerplate docs."""
    ids = spark.range(n_docs).select(F.col("id").alias("doc_id")).filter(
        F.pmod("doc_id", F.lit(50)) != 0
    ).withColumn("fam", (F.col("doc_id") / 5).cast("long"))
    a, b = ids.alias("a"), ids.alias("b")
    return (
        a.join(b, (F.col("a.fam") == F.col("b.fam")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    )


#: max_bucket sweep points at the (32, 8) default: the r5/r6 cap,
#: then progressively looser (the boilerplate bucket is ~n_docs/50
#: rows, so 20k uncaps it entirely at 100k docs)
BUCKET_SWEEP = [1000, 5000, 20000]


def _measure(docs, truth, n_truth, n_docs, dedup, num_hashes, bands, max_bucket):
    t0 = time.time()
    cand = dedup.minhash_lsh_candidates(
        docs, num_hashes=num_hashes, bands=bands, max_bucket=max_bucket
    ).cache()
    n_cand = cand.count()
    wall = time.time() - t0
    hit = cand.join(truth, ["doc_a", "doc_b"], "left_semi").count()
    cand.unpersist()
    return {
        "n_docs": n_docs,
        "num_hashes": num_hashes,
        "bands": bands,
        "rows_per_band": num_hashes // bands,
        "max_bucket": max_bucket,
        "candidates": n_cand,
        "truth_pairs": n_truth,
        "recall": round(hit / max(n_truth, 1), 4),
        "cand_per_doc": round(n_cand / n_docs, 2),
        "sec": round(wall, 2),
    }


def main() -> int:
    args = sys.argv[1:]
    buckets_only = "--buckets-only" in args
    sizes = [int(a) for a in args if not a.startswith("--")] or [10_000]
    from atsc_spark.session import get_spark
    from atsc_spark.fixtures import documents_dupheavy
    from atsc_spark.datapipe import dedup

    spark = get_spark("lsh_tune", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    out = []
    for n_docs in sizes:
        docs = documents_dupheavy(spark, n_docs, plant_pii=False).cache()
        docs.count()
        truth = truth_pairs(spark, n_docs).cache()
        n_truth = truth.count()
        if not buckets_only:
            for num_hashes, bands in CONFIGS:
                row = _measure(
                    docs, truth, n_truth, n_docs, dedup, num_hashes, bands, 1000
                )
                out.append(row)
                print(json.dumps(row), flush=True)
        # recall-vs-cap sweep at the tuned (32, 8) default (r7)
        for max_bucket in BUCKET_SWEEP:
            row = _measure(
                docs, truth, n_truth, n_docs, dedup, 32, 8, max_bucket
            )
            out.append(row)
            print(json.dumps(row), flush=True)
        docs.unpersist()
        truth.unpersist()
    print(json.dumps({"rows": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
