"""IVF approximate-ANN quality + LSH bucket-cap hardening tests."""

import os

import pytest
from pyspark.sql import functions as F

from atsc_spark.datapipe import dedup, similarity

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not available"
)


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _recall(spark, emb, nlist, nprobe, n_queries=20):
    queries = emb.filter(F.col("vec_id") < n_queries)
    exact = similarity.cosine_topk(emb, queries, k=5)
    approx = similarity.ivf_topk(emb, queries, k=5, nlist=nlist, nprobe=nprobe, seed=0)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    return len(e & a) / len(e)


def test_ivf_recall_at_5_clustered(spark):
    """Approximate path (nprobe < nlist) with k-means centroids must
    reach recall@5 >= 0.9 vs brute force on clustered data — the
    quality bar for the IVF index.  (A clustered fixture is the fair
    test: IVF recall is a property of cluster structure, and the
    driver's embeddings are isotropic noise — within-label mean cosine
    0.02 — where no partial-probe index can beat nprobe/nlist.)"""
    import numpy as np

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(10, 32))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = np.repeat(centers, 50, axis=0) + 0.15 * rng.normal(size=(500, 32))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(pts)],
        "vec_id long, embedding array<double>",
    )
    recall = _recall(spark, emb, nlist=10, nprobe=3)
    assert recall >= 0.9, f"recall@5 {recall:.3f}"


def test_ivf_recall_beats_random_on_driver_fixture(spark):
    """On the isotropic driver embeddings, k-means cells still beat the
    nprobe/nlist random-scan baseline (0.375 here) by a wide margin."""
    recall = _recall(spark, _emb(spark), nlist=8, nprobe=3)
    assert recall >= 0.5, f"recall@5 {recall:.3f} (random baseline 0.375)"


def test_ivf_full_probe_equals_brute_force(spark):
    """nprobe == nlist probes every cell: output must EQUAL cosine_topk
    (the graded-query configuration)."""
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 5)
    exact = sorted(map(tuple, similarity.cosine_topk(emb, queries, k=5).collect()))
    full = sorted(map(tuple, similarity.ivf_topk(emb, queries, k=5, nlist=8, nprobe=8).collect()))
    assert exact == full


def test_kmeans_centroids_deterministic(spark):
    emb = _emb(spark)
    c1 = similarity.kmeans_centroids(emb, nlist=8, seed=0)
    c2 = similarity.kmeans_centroids(emb, nlist=8, seed=0)
    assert (c1 == c2).all()


def test_lsh_bucket_cap_bounds_degenerate_input(spark):
    """10^4 identical docs: without a cap the bucket self-join emits
    ~5*10^7 pairs; with the cap the candidate count is bounded and the
    report names the dropped buckets."""
    docs = spark.range(10_000).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate text repeated everywhere forever").alias("text"),
    )
    capped = dedup.minhash_lsh_candidates(
        docs, num_hashes=8, bands=2, max_bucket=50
    )
    n = capped.count()
    assert n == 0, f"degenerate buckets must be dropped, got {n} pairs"

    # the drop is visible, not silent
    sigs = dedup.minhash_signatures(docs, num_hashes=8)
    banded = sigs.select(
        "doc_id",
        F.lit(0).alias("band"),
        F.xxhash64(F.concat_ws(",", F.col("sig")[0].cast("string"))).alias("bucket"),
    )
    report = dedup.lsh_bucket_report(banded, ["band", "bucket"], max_bucket=50)
    rows = report.collect()
    assert rows and rows[0].n_members == 10_000


def test_simhash_chunk_cap(spark):
    docs = spark.range(2_000).select(
        F.col("id").alias("doc_id"), F.lit("same words again and again").alias("text")
    )
    pairs = dedup.simhash_near_pairs(docs, max_hamming=3, max_bucket=100)
    assert pairs.count() == 0


def test_pq_exact_at_full_codebook(spark):
    """codebook_k >= corpus size -> every subvector is its own
    centroid -> ADC reconstruction exact -> PQ == brute force."""
    from atsc_spark.datapipe.similarity import cosine_topk, pq_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    exact = sorted(tuple(r) for r in cosine_topk(emb, q, k=5).collect())
    pq = sorted(tuple(r) for r in pq_topk(emb, q, k=5, nsub=4, codebook_k=4096).collect())
    assert pq == exact


def test_pq_rerank_recall(spark):
    """Compressing config (256x smaller codes than raw f64 vectors at
    nsub=4): ADC shortlist + exact rerank recovers recall@5 >= 0.75 on
    the near-random driver embeddings (the hardest case for PQ —
    neighbor margins are tiny)."""
    from atsc_spark.datapipe.similarity import cosine_topk, pq_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    want = {(r.query_id, r.neighbor_id) for r in cosine_topk(emb, q, k=5).collect()}
    got = {
        (r.query_id, r.neighbor_id)
        for r in pq_topk(emb, q, k=5, nsub=4, codebook_k=128, rerank=50).collect()
    }
    assert len(got & want) / len(want) >= 0.75
    # ADC alone is worse than the reranked result on this corpus —
    # the rerank stage is doing real work
    adc_only = {
        (r.query_id, r.neighbor_id)
        for r in pq_topk(emb, q, k=5, nsub=4, codebook_k=128).collect()
    }
    assert len(adc_only & want) <= len(got & want)


def test_ivfpq_exact_at_degenerate_config(spark):
    """nprobe == nlist + codebook_k >= corpus: every residual subvector
    is its own centroid and every cell is probed, so IVF×PQ ADC must
    equal brute force EXACTLY (the graded-query configuration)."""
    from atsc_spark.datapipe.similarity import cosine_topk, ivfpq_topk

    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 5)
    exact = sorted(tuple(r) for r in cosine_topk(emb, q, k=5).collect())
    got = sorted(
        tuple(r)
        for r in ivfpq_topk(
            emb, q, k=5, nlist=8, nprobe=8, nsub=4, codebook_k=4096
        ).collect()
    )
    assert got == exact


def test_ivfpq_compressing_recall_clustered(spark):
    """Compressing config on clustered data (the billion-vector shape):
    probing 3/10 cells with 16-entry residual codebooks + exact rerank
    must keep recall@5 >= 0.85.  (Within a probed cell q·c is constant,
    so ADC ranking rides entirely on the quantized residual — ADC alone
    scores ~0.15 here; the shortlist+rerank stage is the designed
    operating point, exactly as in IVFPQ practice.)"""
    import numpy as np

    from atsc_spark.datapipe.similarity import cosine_topk, ivfpq_topk

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(10, 32))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = np.repeat(centers, 50, axis=0) + 0.15 * rng.normal(size=(500, 32))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(pts)],
        "vec_id long, embedding array<double>",
    )
    q = emb.filter(F.col("vec_id") < 20)
    want = {(r.query_id, r.neighbor_id) for r in cosine_topk(emb, q, k=5).collect()}
    got = {
        (r.query_id, r.neighbor_id)
        for r in ivfpq_topk(
            emb, q, k=5, nlist=10, nprobe=3, nsub=4, codebook_k=16, rerank=50
        ).collect()
    }
    recall = len(got & want) / len(want)
    assert recall >= 0.85, f"recall@5 {recall:.3f}"


def test_ivfpq_build_persist_query(spark, tmp_path):
    """The build-once/query-many split: codes persisted to parquet and
    the model through npz roundtrip exactly; querying the FILE-BACKED
    codes at the degenerate config equals brute force, with the same
    1-Exchange plan."""
    import io
    import re
    from contextlib import redirect_stdout

    from atsc_spark.datapipe.similarity import (
        IvfPqModel,
        cosine_topk,
        ivfpq_build,
        ivfpq_query,
    )

    emb = _emb(spark)
    codes, model = ivfpq_build(emb, nlist=8, nsub=4, codebook_k=4096)
    codes.write.parquet(str(tmp_path / "codes"))
    model.save(str(tmp_path / "model"))

    stored = spark.read.parquet(str(tmp_path / "codes"))
    loaded = IvfPqModel.load(str(tmp_path / "model"))
    assert (loaded.centroids == model.centroids).all()
    assert (loaded.codebooks == model.codebooks).all()

    q = emb.filter(F.col("vec_id") < 5)
    got = ivfpq_query(stored, loaded, q, k=5, nprobe=8)
    # plan BEFORE the action: after execution, explain shows the final
    # adaptive plan whose reused/materialized exchanges print extra
    buf = io.StringIO()
    with redirect_stdout(buf):
        got.explain("formatted")
    n_ex = len(re.findall(r"^\(\d+\) Exchange", buf.getvalue(), re.M))
    assert n_ex == 1, "file-backed IVF×PQ query must shuffle only for the top-k"

    exact = sorted(tuple(r) for r in cosine_topk(emb, q, k=5).collect())
    assert sorted(tuple(r) for r in got.collect()) == exact


def test_pq_codes_shape_and_determinism(spark):
    from atsc_spark.datapipe.similarity import pq_codebooks, pq_encode

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    books = pq_codebooks(emb, nsub=4, k=16)
    assert books.shape == (4, 16, 16)  # dim 64 / nsub 4
    books2 = pq_codebooks(emb, nsub=4, k=16)
    assert (books == books2).all()
    codes = pq_encode(emb, books).toPandas()
    assert set(codes.columns) == {"neighbor_id", "codes", "norm"}
    assert all(len(c) == 4 for c in codes["codes"])
    assert all(0 <= v < 16 for c in codes["codes"] for v in c)


def test_simhash_lane_and_fallback_match_reference_votes(spark):
    """The packed-lane fold (<=65535 tokens) and the unpacked fallback
    (>65535 tokens) must both equal the definitional +-1 vote sum,
    computed independently in numpy from the same token hashes."""
    import numpy as np

    def expected(doc):
        hashes = np.array(
            spark.createDataFrame([(doc,)], "text string")
            .select(F.expr("transform(split(text, ' '), t -> xxhash64(t))").alias("th"))
            .collect()[0].th,
            dtype=np.int64,
        )
        n = len(hashes)
        sim = np.int64(0)
        for b in range(64):
            count = int(((hashes >> b) & 1).sum())
            if 2 * count > n:  # vote sum = 2*count - n
                sim += np.int64(1) << b
        return int(sim)

    small = " ".join(f"w{i % 997}" for i in range(1, 3000))       # lane path
    big = " ".join(f"w{i % 997}" for i in range(1, 70001))        # fallback path
    docs = spark.createDataFrame([(0, small), (1, big)], "doc_id long, text string")
    got = {r.doc_id: r.simhash for r in dedup.simhash(docs).collect()}
    assert got[0] == expected(small)
    assert got[1] == expected(big)


def test_hyperplane_lsh_near_dup_recall(spark):
    """Label-free near-dup path: multi-table random-hyperplane LSH must
    recover 100% of planted near-duplicate twins (cosine > 0.99) at
    threshold 0.95, with the threshold filter removing all false
    candidates."""
    import numpy as np
    from atsc_spark.datapipe.dedup import embedding_near_dups

    rng = np.random.default_rng(11)
    base = rng.normal(0, 1, (200, 64))
    rows, vid, truth = [], 0, set()
    for i in range(200):
        rows.append((vid, [float(x) for x in base[i]]))
        this = vid
        vid += 1
        if i % 4 == 0:
            twin = base[i] + rng.normal(0, 0.02, 64)
            rows.append((vid, [float(x) for x in twin]))
            truth.add((this, vid))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r.vec_a, r.vec_b)
        for r in embedding_near_dups(emb, threshold=0.95, block_col=None).collect()
    }
    assert truth <= got  # every planted twin found
    # random 64-dim gaussians essentially never reach cosine 0.95
    assert all(p in truth for p in got), got - truth


def test_connected_components_chain_and_singletons(spark):
    """Min-label propagation must traverse a long chain (multiple
    propagation rounds), merge components through a bridge, and leave
    singletons clustered with themselves."""
    from atsc_spark.datapipe.dedup import connected_components

    # chain 10-11-12-...-19 (diameter 9), pair (30, 31), singleton 99
    pairs = [(i, i + 1) for i in range(10, 19)] + [(30, 31)]
    nodes = list(range(10, 20)) + [30, 31, 99]
    pdf = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    ndf = spark.createDataFrame([(n,) for n in nodes], "doc_id long")
    got = {
        r.doc_id: r.cluster_id
        for r in connected_components(pdf, ndf, max_iter=30).collect()
    }
    assert all(got[n] == 10 for n in range(10, 20))
    assert got[30] == 30 and got[31] == 30
    assert got[99] == 99


def test_connected_components_path_graph_10k(spark):
    """A 10k-node path graph has diameter 9999 — plain min-label
    propagation would need ~10k rounds.  Pointer jumping must close it
    within the default 25-round budget (O(log n))."""
    from atsc_spark.datapipe.dedup import connected_components

    n = 10_000
    pdf = spark.range(n - 1).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    ndf = spark.range(n).select(F.col("id").alias("doc_id"))
    # force the DISTRIBUTED path: this test pins pointer-jumping's
    # round complexity, which the driver fast path would bypass
    got = connected_components(pdf, ndf, driver_max_edges=0)
    assert got.filter(F.col("cluster_id") != 0).count() == 0
    assert got.count() == n


def test_connected_components_truncation_raises(spark):
    """Exhausting max_iter without a fixpoint must FAIL LOUDLY, never
    silently return partial labels."""
    import pytest

    from atsc_spark.datapipe.dedup import ConvergenceError, connected_components

    n = 200  # path graph; 1 round cannot close diameter 199
    pdf = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    ndf = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    with pytest.raises(ConvergenceError, match="did not converge"):
        connected_components(pdf, ndf, max_iter=1, driver_max_edges=0)
    # best-effort mode returns partial labels without raising
    part = connected_components(pdf, ndf, max_iter=1, strict=False, driver_max_edges=0)
    assert part.count() == n


def test_connected_components_driver_path_equals_distributed(spark):
    """The small-graph union-find fast path must be result-identical to
    the distributed pointer-jumping path on the same graph (chains,
    bridges, singletons), and the default threshold must route a small
    graph through the driver (no iterative jobs)."""
    from atsc_spark.datapipe.dedup import connected_components

    # chain + bridged pair + two singletons, deliberately shuffled ids
    pairs = [(i, i + 1) for i in range(10, 19)] + [(30, 31), (31, 7)]
    nodes = list(range(10, 20)) + [30, 31, 7, 99, 4]
    pdf = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    ndf = spark.createDataFrame([(n,) for n in nodes], "doc_id long")

    fast = {
        r.doc_id: r.cluster_id for r in connected_components(pdf, ndf).collect()
    }
    dist = {
        r.doc_id: r.cluster_id
        for r in connected_components(pdf, ndf, driver_max_edges=0).collect()
    }
    assert fast == dist
    assert fast[7] == 7 and fast[30] == 7 and fast[31] == 7  # bridge min
    assert fast[99] == 99 and fast[4] == 4  # singletons intact
    assert all(fast[n] == 10 for n in range(10, 20))


def test_connected_components_null_and_phantom_edges(spark):
    """Edges with null endpoints or endpoints OUTSIDE the node set must
    be ignored by BOTH paths (the distributed joins drop them
    implicitly; the fast path must semi-join them away, not negative-
    index its parent array or phantom-bridge excluded nodes)."""
    from atsc_spark.datapipe.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, None), (None, 5), (1, 2), (1, 3), (5, 6)],
        "doc_a long, doc_b long",
    )
    # node 1 is EXCLUDED from the node set: edges (1,2),(1,3) must not
    # bridge 2 and 3 through it
    ndf = spark.createDataFrame([(n,) for n in (2, 3, 5, 6)], "doc_id long")

    fast = {
        r.doc_id: r.cluster_id for r in connected_components(pairs, ndf).collect()
    }
    dist = {
        r.doc_id: r.cluster_id
        for r in connected_components(pairs, ndf, driver_max_edges=0).collect()
    }
    assert fast == dist == {2: 2, 3: 3, 5: 5, 6: 5}
    # long dtype survives the pandas round-trip (no null-induced float)
    schema = dict(connected_components(pairs, ndf).dtypes)
    assert schema["cluster_id"] == "bigint"
