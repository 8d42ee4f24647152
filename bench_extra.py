"""Phase-isolation profiling harness for the optimization round.

bench.py is FROZEN (the driver times the round-start copy); this file
is the guide-§1.4 companion: each flagship query is decomposed into
its pipeline phases and each phase is timed separately with a noop
sink (``df.write.format("noop")``), so the numbers attribute wall to
computation, not to the sink or to downstream phases.

Usage: python bench_extra.py [query ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0)
       SPARK_GRAFT_CPUS   (default 32)
       BENCH_EXTRA_REPEATS (default 2; best-of)
Prints one JSON line per query: {"query": ..., "phases": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    repeats = max(1, int(os.environ.get("BENCH_EXTRA_REPEATS", "2")))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    only = set(sys.argv[1:])

    from pyspark.sql import functions as F

    from atsc_spark.session import get_spark
    from atsc_spark.frames import (
        compression_report,
        decode_frames,
        fit_frames,
        grouped_points,
    )
    from atsc_spark.lossless import decode_lossless, fit_lossless
    from atsc_spark.rollup import rollup, rollup_cascade_step
    from atsc_spark.series import derive_series, series_from_events

    spark = get_spark(
        "atsc_spark_bench_extra", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    from atsc_spark.fixtures import monitoring_series as _warm

    fit_frames(_warm(spark, n_series=int(cpus), samples_per_series=64)).count()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(fn) -> float:
        best = float("inf")
        for _ in range(repeats):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        return round(best, 3)

    def report(query: str, phases: dict) -> None:
        print(json.dumps({"query": query, "sf": sf, "phases": phases}), flush=True)

    def want(q: str) -> bool:
        return not only or q in only

    events = spark.read.parquet(f"{sf_dir}/events.parquet").cache()
    events.count()

    sc = spark.sparkContext

    # ---------------------------------------------------- monitoring
    if want("monitoring"):
        from atsc_spark.fixtures import monitoring_series

        n_series = max(8, int(2400 * sf))
        m_input = monitoring_series(spark, n_series=n_series).cache()
        m_input.count()
        ph = {}
        sc.setJobDescription("monitoring: grouped_points only")
        ph["grouped_points"] = timed(lambda: noop(grouped_points(m_input, 256)))
        sc.setJobDescription("monitoring: fit_frames")
        ph["fit"] = timed(lambda: noop(fit_frames(m_input, max_error=0.03)))
        frames = fit_frames(m_input, max_error=0.03).cache()
        frames.count()
        sc.setJobDescription("monitoring: report from cached frames")
        ph["report_cached"] = timed(lambda: compression_report(frames).collect())
        sc.setJobDescription("monitoring: decode from cached frames")
        ph["decode_cached"] = timed(lambda: decode_frames(frames).count())
        frames.unpersist()
        report("monitoring", ph)
        if want("gorilla"):
            ph = {}
            sc.setJobDescription("gorilla: fit_lossless")
            ph["fit"] = timed(lambda: noop(fit_lossless(m_input)))
            blocks = fit_lossless(m_input).cache()
            blocks.count()
            sc.setJobDescription("gorilla: agg on cached blocks")
            ph["agg_cached"] = timed(
                lambda: blocks.agg(
                    F.sum("raw_bytes").alias("r"), F.sum("payload_bytes").alias("p")
                ).collect()
            )
            sc.setJobDescription("gorilla: decode")
            ph["decode_cached"] = timed(lambda: decode_lossless(blocks).count())
            blocks.unpersist()
            report("gorilla", ph)
        m_input.unpersist()

    # --------------------------------------------------- transcripts
    if want("transcripts"):
        from atsc_spark.fixtures import transcripts

        n_convs = max(50, int(30000 * sf))
        t_input = transcripts(spark, n_convs=n_convs).cache()
        t_input.count()
        ph = {}
        sc.setJobDescription("transcripts: derive_series only")
        ph["derive"] = timed(lambda: noop(derive_series(t_input)))
        sc.setJobDescription("transcripts: derive + grouped_points")
        ph["derive_grouped"] = timed(
            lambda: noop(grouped_points(derive_series(t_input), 256))
        )
        sc.setJobDescription("transcripts: derive + fit")
        ph["derive_fit"] = timed(
            lambda: noop(fit_frames(derive_series(t_input), max_error=0.03))
        )
        frames = fit_frames(derive_series(t_input), max_error=0.03).cache()
        frames.count()
        sc.setJobDescription("transcripts: decode from cached frames")
        ph["decode_cached"] = timed(lambda: decode_frames(frames).count())
        frames.unpersist()
        t_input.unpersist()
        report("transcripts", ph)

    # -------------------------------------------------------- events
    if want("events"):
        _EVENTS_Q = 0.0296
        ph = {}
        sc.setJobDescription("events: series_from_events only")
        ph["series"] = timed(lambda: noop(series_from_events(events, "1 minute")))
        sc.setJobDescription("events: fit (locf+quantize)")
        ph["fit"] = timed(
            lambda: noop(
                fit_frames(
                    series_from_events(events, "1 minute"),
                    max_error=0.0,
                    gap_fill="locf",
                    gap_fill_interval_s=60,
                    quantize_rel=_EVENTS_Q,
                )
            )
        )
        frames = fit_frames(
            series_from_events(events, "1 minute"),
            max_error=0.0,
            gap_fill="locf",
            gap_fill_interval_s=60,
            quantize_rel=_EVENTS_Q,
        ).cache()
        frames.count()
        sc.setJobDescription("events: decode from cached frames")
        ph["decode_cached"] = timed(lambda: decode_frames(frames).count())
        frames.unpersist()
        report("events", ph)

    # ------------------------------------------------------- cascade
    if want("cascade"):
        ph = {}
        sc.setJobDescription("cascade: series_from_events only")
        ph["series"] = timed(lambda: noop(series_from_events(events, "1 minute")))
        sc.setJobDescription("cascade: + rollup 1m")
        ph["r1m"] = timed(
            lambda: noop(rollup(series_from_events(events, "1 minute"), "1 minute"))
        )
        sc.setJobDescription("cascade: full")

        def full():
            series = series_from_events(events, "1 minute")
            r1m = rollup(series, "1 minute")
            r1h = rollup_cascade_step(r1m, "1 hour")
            rollup_cascade_step(r1h, "1 day").count()

        ph["full"] = timed(full)
        report("cascade", ph)

    # ------------------------------------------------------- minhash
    if want("minhash"):
        from atsc_spark.datapipe import dedup as _dedup

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        ph = {}
        sc.setJobDescription("minhash: signatures only")
        ph["signatures"] = timed(
            lambda: noop(_dedup.minhash_signatures(docs, num_hashes=32))
        )
        sc.setJobDescription("minhash: banded plan")
        ph["banded"] = timed(
            lambda: noop(_dedup._banded_plan(docs, "text", 32, 4, 5))
        )
        sc.setJobDescription("minhash: full candidates")
        ph["full"] = timed(
            lambda: _dedup.minhash_lsh_candidates(docs, num_hashes=32, bands=4).count()
        )
        report("minhash", ph)

    # ------------------------------------------------ dedup_clusters
    if want("dedup_clusters"):
        from atsc_spark.datapipe import dedup as _dedup

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        ph = {}
        sc.setJobDescription("dedup_clusters: candidates")
        ph["candidates"] = timed(
            lambda: _dedup.minhash_lsh_candidates(
                docs, num_hashes=16, bands=4, max_bucket=200
            ).count()
        )

        def full():
            pairs = _dedup.minhash_lsh_candidates(
                docs, num_hashes=16, bands=4, max_bucket=200
            )
            labels = _dedup.connected_components(pairs, docs.select("doc_id"))
            labels.select("cluster_id").distinct().count()

        sc.setJobDescription("dedup_clusters: full")
        ph["full"] = timed(full)
        report("dedup_clusters", ph)

    # -------------------------------------------------------- gopher
    if want("gopher"):
        from atsc_spark.datapipe import quality as _quality
        from atsc_spark.fixtures import documents_dupheavy, spammy_documents

        prep_n = max(2_000, int(1_000_000 * sf))
        corpus = (
            documents_dupheavy(spark, prep_n)
            .select("doc_id", "text")
            .unionByName(spammy_documents(spark, 500))
            .cache()
        )
        corpus.count()
        ph = {}
        sc.setJobDescription("gopher: filter count")
        ph["filter"] = timed(
            lambda: _quality.gopher_repetition_filter(corpus).count()
        )
        sc.setJobDescription("gopher: stats only (noop)")
        ph["stats_noop"] = timed(
            lambda: noop(_quality.repetition_stats(corpus))
        )
        corpus.unpersist()
        report("gopher", ph)

    # --------------------------------------------------- corpus_prep
    if want("corpus_prep"):
        from atsc_spark.datapipe import sampling as _sampling
        from atsc_spark.datapipe import scrub as _scrub
        from atsc_spark.datapipe import spans as _spans
        from atsc_spark.fixtures import documents_dupheavy

        prep_n = max(2_000, int(1_000_000 * sf))
        prep = documents_dupheavy(spark, prep_n).cache()
        prep.count()
        eval_texts = prep.orderBy("doc_id").limit(20).select("text")
        ph = {}
        sc.setJobDescription("corpus_prep: mask spans")
        ph["mask"] = timed(
            lambda: noop(_spans.mask_duplicate_spans(prep, window_tokens=16, stride=8))
        )
        sc.setJobDescription("corpus_prep: +decontaminate")
        ph["mask_decon"] = timed(
            lambda: noop(
                _spans.decontaminate(
                    _spans.mask_duplicate_spans(prep, window_tokens=16, stride=8),
                    eval_texts,
                    ngram=13,
                )
            )
        )
        sc.setJobDescription("corpus_prep: +redact")
        ph["mask_decon_redact"] = timed(
            lambda: noop(
                _scrub.pii_redact(
                    _spans.decontaminate(
                        _spans.mask_duplicate_spans(prep, window_tokens=16, stride=8),
                        eval_texts,
                        ngram=13,
                    )
                )
            )
        )

        def full():
            m = _spans.mask_duplicate_spans(prep, window_tokens=16, stride=8)
            clean = _spans.decontaminate(m, eval_texts, ngram=13)
            scrubbed = _scrub.pii_redact(clean)
            packed = _sampling.pack_sequences(
                scrubbed.select("doc_id", "text"), seq_tokens=2048
            )
            packed.agg(F.count("*"), F.sum("n_tokens")).collect()

        sc.setJobDescription("corpus_prep: full")
        ph["full"] = timed(full)
        prep.unpersist()
        report("corpus_prep", ph)

    # ------------------------------------------------------ ann_topk
    if want("ann_topk"):
        from atsc_spark import queries as Q

        ph = {}
        sc.setJobDescription("ann_topk")
        ph["full"] = timed(lambda: Q.q_ann_cosine_topk(spark, sf_dir).count())
        report("ann_topk", ph)

    # ------------------------------------------------------- gapfill
    if want("gapfill"):
        from atsc_spark import queries as Q

        ph = {}
        sc.setJobDescription("gapfill_locf")
        ph["locf"] = timed(lambda: Q.q_gapfill_locf(spark, sf_dir).count())
        sc.setJobDescription("gapfill_linear")
        ph["linear"] = timed(lambda: Q.q_gapfill_linear(spark, sf_dir).count())
        report("gapfill", ph)

    events.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
