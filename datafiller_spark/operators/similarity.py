"""Similarity search over embedding columns.

- ``cosine_topk``: exact brute-force top-k — the correctness baseline.
  Dot products via ``zip_with`` + ``aggregate`` (JVM-side, codegen'd);
  the query set is small and **broadcast**, so the scan side streams
  once with no shuffle before the per-query top-k window.
- ``lsh_topk``: the scale path — random-hyperplane sign buckets shrink
  the candidate set from |corpus| to a bucket (multi-probe over Hamming
  ≤ 1 neighbors keeps recall high); exact cosine re-ranks candidates.
- ``embedding_near_dupes``: cosine-threshold near-duplicate pairs.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_topk(
    df: DataFrame,
    query_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query vector (self-match excluded).

    Ties break on neighbor id ascending for determinism.
    Output: (query_id, neighbor_id, cosine, rank).
    """
    corpus = df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__v"))
    queries = query_df.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__q"))
    scored = corpus.join(F.broadcast(queries), F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        F.round(_dot(F.col("__q"), F.col("__v")) / (_norm(F.col("__q")) * _norm(F.col("__v"))), 6).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 17) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_planes, dim)).astype(np.float64)


def _bucket_expr(vec_col, planes: np.ndarray):
    """Sign-bit bucket id from ``n_planes`` fixed random hyperplanes."""
    bits = []
    for i, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(float(c)) for c in plane]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return bucket


def lsh_topk(
    df: DataFrame,
    query_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    dim: int | None = None,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate top-k: hyperplane-bucketed candidates, exact cosine
    re-rank inside buckets.

    Standard multi-table LSH: ``n_tables`` independent sets of
    ``n_planes`` hyperplanes; a corpus vector is a candidate if it shares
    a (table, bucket) with the query in ANY table, with multi-probe
    (Hamming ≤ 1) flips on the query side. One table with few planes
    either prunes nothing or misses most true neighbors; tables
    multiply recall while candidate volume stays
    ~``n_tables · (n_planes+1) / 2^n_planes`` of the corpus.

    ``dim`` (the embedding width) is required: inferring it would cost a
    driver-side action on the corpus before the plan is even built.
    """
    if dim is None:
        raise ValueError(
            "lsh_topk requires dim (embedding width); inferring it would "
            "trigger a driver-side scan of the corpus."
        )
    tables = [_hyperplanes(dim, n_planes, seed=17 + 31 * t) for t in range(n_tables)]

    corpus = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__v"),
        F.posexplode(
            F.array(*[_bucket_expr(F.col(vec_col), planes) for planes in tables])
        ).alias("table", "bucket"),
    )
    probes = F.array(F.lit(0), *[F.lit(1 << i) for i in range(n_planes)])

    def _probe_buckets(planes):
        base = _bucket_expr(F.col(vec_col), planes)
        return F.transform(probes, lambda m: base.bitwiseXOR(m))

    queries = query_df.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__q"),
        F.posexplode(F.array(*[_probe_buckets(planes) for planes in tables])).alias(
            "table", "buckets"
        ),
    ).select("query_id", "__q", "table", F.explode("buckets").alias("bucket"))
    scored = corpus.join(F.broadcast(queries), ["table", "bucket"]).where(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = scored.select(
        "query_id",
        "neighbor_id",
        F.round(_dot(F.col("__q"), F.col("__v")) / (_norm(F.col("__q")) * _norm(F.col("__v"))), 6).alias(
            "cosine"
        ),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_near_dupes(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Pairs with cosine ≥ threshold (id_a < id_b). Brute-force verifier;
    at scale run it per LSH bucket instead of globally."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__a"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(_dot(F.col("__a"), F.col("__b")) / (_norm(F.col("__a")) * _norm(F.col("__b"))), 6).alias(
                "cosine"
            ),
        )
        .where(F.col("cosine") >= threshold)
    )


def train_ivf_centroids(
    df: DataFrame,
    vec_col: str,
    n_clusters: int,
    dim: int,
    sample_size: int = 4096,
    n_iter: int = 10,
    seed: int = 29,
) -> np.ndarray:
    """Coarse quantizer for IVF: k-means on a seeded, bounded sample.

    The sample collect is O(sample_size × dim) — bounded regardless of
    corpus size, the standard IVF training recipe. Deterministic: seeded
    sample, seeded init, fixed Lloyd iterations on L2-normalized vectors
    (so nearest-centroid == highest cosine). Returns (k, dim) float64.
    """
    # seeded hash order + limit plans as TakeOrderedAndProject: one scan
    # with per-partition size-k heaps, no global sort, no full collect
    sample = (
        df.select(F.col(vec_col).alias("__v"))
        .orderBy(F.xxhash64(F.col(vec_col).cast("string"), F.lit(seed)))
        .limit(sample_size)
        .collect()
    )
    x = np.asarray([r["__v"] for r in sample], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    centroids = x[rng.choice(len(x), size=min(n_clusters, len(x)), replace=False)]
    for _ in range(n_iter):
        assign = np.argmax(x @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = x[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids /= np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
    return centroids


def _nearest_clusters_expr(vec_col, centroids: np.ndarray, top: int):
    """Column expr: array of the ``top`` nearest centroid ids (by dot
    product on normalized centroids) — pure built-ins, no Python."""
    sims = F.array(
        *[
            _dot(
                vec_col,
                F.array(*[F.lit(float(c)) for c in centroid]),
            )
            / _norm(vec_col)
            for centroid in centroids
        ]
    )
    idx = F.sequence(F.lit(0), F.lit(len(centroids) - 1))
    pairs = F.zip_with(sims, idx, lambda s, i: F.struct(s.alias("s"), i.alias("i")))
    ranked = F.reverse(F.array_sort(pairs))
    return F.transform(F.slice(ranked, 1, top), lambda p: p["i"])


def ivf_topk(
    df: DataFrame,
    query_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_clusters: int = 16,
    nprobe: int = 4,
    dim: int | None = None,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors are inverted-listed under
    their nearest coarse centroid; each query probes its ``nprobe``
    nearest lists and exact cosine re-ranks the candidates.

    Candidate volume ≈ ``nprobe / n_clusters`` of the corpus. Pass
    pre-trained ``centroids`` to skip training (e.g. reuse across
    batches); otherwise a bounded seeded sample trains them.
    """
    if dim is None:
        raise ValueError("ivf_topk requires dim (embedding width).")
    if centroids is None:
        centroids = train_ivf_centroids(df, vec_col, n_clusters, dim)

    corpus = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__v"),
        _nearest_clusters_expr(F.col(vec_col), centroids, 1)[0].alias("cluster"),
    )
    queries = query_df.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__q"),
        F.explode(_nearest_clusters_expr(F.col(vec_col), centroids, nprobe)).alias("cluster"),
    )
    scored = (
        corpus.join(F.broadcast(queries), "cluster")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("__q"), F.col("__v")) / (_norm(F.col("__q")) * _norm(F.col("__v"))), 6
            ).alias("cosine"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
