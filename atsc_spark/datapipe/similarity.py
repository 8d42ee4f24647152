"""Similarity search over an embedding column (array<float>).

- :func:`cosine_topk` — brute-force exact top-k: broadcast the (small)
  query set against the corpus; the corpus side streams, no shuffle
  until the final per-query top-k (a tiny aggregation).  This is the
  exact baseline.
- :func:`ivf_topk` — IVF-style approximate path for scale: corpus
  vectors are assigned to the nearest of `nlist` centroids (sampled
  deterministically from the data); a query probes only `nprobe`
  cells, cutting the scanned fraction to nprobe/nlist.

All arithmetic is JVM-side (`zip_with` + `aggregate` folds in double
precision); scores are rounded to 4 decimals before ranking so results
are stable across engines and summation orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _as_double(col: str):
    return F.expr(f"transform({col}, x -> cast(x as double))")


_DOT = "aggregate(zip_with(q, v, (x, y) -> x * y), cast(0.0 as double), (acc, x) -> acc + x)"
_NORM = "sqrt(aggregate({c}, cast(0.0 as double), (acc, x) -> acc + x * x))"


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbours for each query vector.

    Output: (query_id, rnk, neighbor_id, cosine).  Ties broken by
    neighbor id for determinism.  The query side is broadcast.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("q")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("v")
    )
    joined = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
    cos = F.round(
        F.expr(_DOT) / (F.expr(_NORM.format(c="q")) * F.expr(_NORM.format(c="v"))), 4
    )
    scored = joined.select("query_id", "neighbor_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "rnk", "neighbor_id", "cosine")
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-bucketed approximate top-k.

    Centroids = the `nlist` corpus vectors with the smallest ids
    (deterministic stand-in for k-means; at production scale swap in a
    sampled k-means fit).  Every corpus vector is assigned to its
    nearest centroid once; a query scans only its `nprobe` nearest
    cells.
    """
    cents = embeddings.orderBy(id_col).limit(nlist).select(
        F.col(id_col).alias("cent_id"), _as_double(vec_col).alias("cv")
    )

    def nearest_cells(side: DataFrame, idname: str, vecname: str, keep: int) -> DataFrame:
        j = side.crossJoin(F.broadcast(cents))
        dot = F.expr(
            f"aggregate(zip_with({vecname}, cv, (x, y) -> x * y),"
            " cast(0.0 as double), (acc, x) -> acc + x)"
        )
        sim = F.round(dot, 6)
        w = Window.partitionBy(idname).orderBy(F.desc("sim"), F.asc("cent_id"))
        return (
            j.select(idname, vecname, "cent_id", sim.alias("sim"))
            .withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= keep)
            .drop("sim", "r")
        )

    corpus = embeddings.select(F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("v"))
    assigned = nearest_cells(corpus, "neighbor_id", "v", 1)
    q = queries.select(F.col(id_col).alias("query_id"), _as_double(vec_col).alias("q"))
    probes = nearest_cells(q, "query_id", "q", nprobe)

    joined = assigned.join(F.broadcast(probes), "cent_id").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    cos = F.round(
        F.expr(_DOT) / (F.expr(_NORM.format(c="q")) * F.expr(_NORM.format(c="v"))), 4
    )
    scored = joined.select("query_id", "neighbor_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "rnk", "neighbor_id", "cosine")
    )


def embedding_norms(embeddings: DataFrame) -> DataFrame:
    """(vec_id, l2) — sanity/feature op, fully JVM-side."""
    return embeddings.select(
        "vec_id",
        F.round(
            F.sqrt(
                F.expr(
                    "aggregate(transform(embedding, x -> cast(x as double)),"
                    " cast(0.0 as double), (acc, x) -> acc + x * x)"
                )
            ),
            4,
        ).alias("l2"),
    )
