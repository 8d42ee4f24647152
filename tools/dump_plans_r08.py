"""Dump formatted physical plans for the round-8 optimization targets.

Usage: python tools/dump_plans_r08.py <out_dir> <suffix>
e.g.   python tools/dump_plans_r08.py plans/r08 before

Writes <out_dir>/<name>_<suffix>.txt for each named plan: the bench
flagship pipelines (which are compositions, not registry entries) plus
the registry queries this round touches.  The judge diffs before/after.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def formatted_plan(df) -> str:
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "plans", "r08")
    suffix = sys.argv[2] if len(sys.argv) > 2 else "after"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    os.makedirs(out_dir, exist_ok=True)

    from atsc_spark.session import get_spark
    from atsc_spark import queries as Q
    from atsc_spark.datapipe import dedup as _dedup
    from atsc_spark.datapipe import quality as _quality
    from atsc_spark.datapipe import sampling as _sampling
    from atsc_spark.datapipe import scrub as _scrub
    from atsc_spark.datapipe import spans as _spans
    from atsc_spark.fixtures import documents_dupheavy, monitoring_series, transcripts
    from atsc_spark.frames import decode_frames, fit_frames
    from atsc_spark.lossless import decode_lossless, fit_lossless
    from atsc_spark.rollup import rollup, rollup_cascade_step
    from atsc_spark.series import derive_series, series_from_events

    spark = get_spark("dump_plans_r08", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    m_input = monitoring_series(spark, n_series=8)
    t_input = transcripts(spark, n_convs=50)
    prep = documents_dupheavy(spark, 2000)

    def cascade():
        series = series_from_events(events, "1 minute")
        r1m = rollup(series, "1 minute")
        r1h = rollup_cascade_step(r1m, "1 hour")
        return rollup_cascade_step(r1h, "1 day")

    def corpus_prep():
        eval_texts = prep.orderBy("doc_id").limit(20).select("text")
        m = _spans.mask_duplicate_spans(prep, window_tokens=16, stride=8)
        clean = _spans.decontaminate(m, eval_texts, ngram=13)
        scrubbed = _scrub.pii_redact(clean)
        return _sampling.pack_sequences(
            scrubbed.select("doc_id", "text"), seq_tokens=2048
        )

    plans = {
        "bench_rollup_cascade": cascade,
        "bench_monitoring_fit": lambda: fit_frames(m_input, max_error=0.03),
        "bench_monitoring_decode": lambda: decode_frames(
            fit_frames(m_input, max_error=0.03)
        ),
        "bench_transcripts_fit": lambda: fit_frames(
            derive_series(t_input), max_error=0.03
        ),
        "bench_events_fit": lambda: fit_frames(
            series_from_events(events, "1 minute"),
            max_error=0.0, gap_fill="locf", gap_fill_interval_s=60,
            quantize_rel=0.0296,
        ),
        "bench_gorilla_fit": lambda: fit_lossless(m_input),
        "bench_gorilla_decode": lambda: decode_lossless(fit_lossless(m_input)),
        "bench_minhash_lsh": lambda: _dedup.minhash_lsh_candidates(
            docs, num_hashes=32, bands=4
        ),
        "bench_gopher_filter": lambda: _quality.gopher_repetition_filter(
            prep.select("doc_id", "text")
        ),
        "bench_corpus_prep_packed": corpus_prep,
        "q_gapfill_locf": lambda: Q.q_gapfill_locf(spark, sf_dir),
        "q_gapfill_linear": lambda: Q.q_gapfill_linear(spark, sf_dir),
        "q_rollup_1h_cascade": lambda: Q.q_rollup_1h_cascade(spark, sf_dir),
        "q_rollup_1d_cascade": lambda: Q.q_rollup_1d_cascade(spark, sf_dir),
        "q_histogram_cascade": lambda: Q.q_histogram_cascade(spark, sf_dir),
        "q_histogram_p95": lambda: Q.q_histogram_p95(spark, sf_dir),
        "q_ann_cosine_topk": lambda: Q.q_ann_cosine_topk(spark, sf_dir),
        "q_dedup_clusters": lambda: Q.q_dedup_clusters(spark, sf_dir),
        "q_minhash_lsh": lambda: Q.q_minhash_lsh(spark, sf_dir),
    }
    for name, fn in plans.items():
        try:
            txt = formatted_plan(fn())
        except Exception as exc:  # noqa: BLE001
            txt = f"ERROR: {exc!r}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(name, "ok" if not txt.startswith("ERROR") else txt[:120])
    spark.stop()


if __name__ == "__main__":
    main()
