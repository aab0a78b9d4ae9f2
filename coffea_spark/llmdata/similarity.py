"""Similarity search over embedding columns (array<float>).

- exact cosine / dot as pure ``zip_with``+``aggregate`` column math
  (sequential double-precision accumulation -> bit-stable across engines)
- brute-force top-k against a literal query vector: one scan + one tiny
  top-k reduce. At 100 TB this is the "gold" path you run on a sample.
- hyperplane-LSH bucketing (SimHash for vectors) as the scale path:
  bucket id is per-row column math from seeded deterministic planes;
  candidate search touches only matching buckets (+ optional multi-probe).
- IVF-style variant: coarse-quantize by bucket, search the n_probe
  nearest buckets by centroid... approximated here by Hamming-adjacent
  buckets to stay shuffle-free (no training pass).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i in double precision, positional left-to-right."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _lit_vec(v) -> Column:
    return F.array(*[F.lit(float(x)) for x in v])


def topk_cosine(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector.
    Deterministic: ordered by (rounded cosine desc, id). The plan is
    scan -> project -> TakeOrderedAndProject (no full sort, no shuffle of
    the data — only k rows per partition reach the driver side)."""
    sim = F.round(cosine(F.col(vec_col), _lit_vec(query)), round_digits)
    return (
        df.select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def hyperplane_planes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes (seeded standard normals)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def hyperplane_bucket(vec: Column, planes: np.ndarray) -> Column:
    """LSH bucket id: bit j = sign(vec . plane_j). Pure column math —
    n_planes dot products against literal arrays, packed into a bigint."""
    bits = []
    for j in range(planes.shape[0]):
        d = dot(vec, _lit_vec(planes[j]))
        bits.append(
            F.when(d > 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(F.lit(0).cast("long"))
        )
    out = F.lit(0).cast("long")
    for b in bits:
        out = out + b
    return out


def ann_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    max_hamming: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: restrict to vectors whose hyperplane bucket is
    within ``max_hamming`` bits of the query's bucket, then exact cosine.
    Candidate fraction ~ C(n_planes, <=max_hamming) / 2^n_planes; the
    filter is pushed into the scan stage (bucket is column math)."""
    q = np.asarray(query, dtype=float)
    planes = hyperplane_planes(len(q), n_planes, seed)
    qbits = 0
    for j in range(n_planes):
        if float(planes[j] @ q) > 0:
            qbits |= 1 << j
    bucket = hyperplane_bucket(F.col(vec_col), planes)
    mask = F.bit_count(bucket.bitwiseXOR(F.lit(qbits))) <= max_hamming
    sim = F.round(cosine(F.col(vec_col), _lit_vec(query)), 6)
    return (
        df.filter(mask)
        .select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def knn_join_blocked(
    left: DataFrame,
    right: DataFrame,
    k: int,
    id_left: str,
    id_right: str,
    vec_col: str = "embedding",
    n_planes: int = 10,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate k-NN join: both sides bucketed by the same hyperplanes,
    equi-join on bucket, per-left top-k by window. The all-pairs explosion
    is bounded by bucket sizes (2^n_planes buckets)."""
    from pyspark.sql import Window as W

    if dim is None:
        raise ValueError("pass dim (embedding dimensionality)")
    planes = hyperplane_planes(dim, n_planes, seed)
    lb = left.withColumn("_bucket", hyperplane_bucket(F.col(vec_col), planes))
    rb = right.withColumn("_bucket", hyperplane_bucket(F.col(vec_col), planes))
    a = lb.select("_bucket", F.col(id_left).alias("_lid"), F.col(vec_col).alias("_lv"))
    b = rb.select("_bucket", F.col(id_right).alias("_rid"), F.col(vec_col).alias("_rv"))
    pairs = a.join(b, "_bucket").withColumn("cosine", cosine(F.col("_lv"), F.col("_rv")))
    w = W.partitionBy("_lid").orderBy(F.col("cosine").desc(), F.col("_rid"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("_lid").alias(id_left), F.col("_rid").alias(id_right), "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) index — the trained coarse quantizer scale path
# ---------------------------------------------------------------------------

def ivf_train(
    df: DataFrame,
    n_lists: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
) -> np.ndarray:
    """Train the IVF coarse quantizer (k-means centroids) with Spark ML.
    Returns (n_lists, dim) float64 centroids. At 100 TB: train on a
    sample (`df.sample(...)`) — centroid quality converges long before
    the full corpus is seen."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = df.select(array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"))
    km = KMeans(k=n_lists, seed=seed, maxIter=max_iter, initMode="k-means||")
    model = km.fit(feats)
    return np.array([np.asarray(c) for c in model.clusterCenters()])


def ivf_assign(vec: Column, centroids: np.ndarray) -> Column:
    """List id = argmin_c ||v - c||^2 = argmin_c (|c|^2 - 2 v.c) — pure
    column math against literal centroid arrays (no UDF, no shuffle).

    The argmin is array_min over (distance, id) structs — NOT a chained
    when/otherwise fold, which references the running best twice per
    level and doubles the expression tree each centroid (2^n_lists
    nodes stalls the analyzer)."""
    entries = F.array(
        *[
            F.struct(
                (F.lit(float(centroids[i] @ centroids[i])) - 2.0 * dot(vec, _lit_vec(centroids[i]))).alias("d"),
                F.lit(i).alias("i"),
            )
            for i in range(centroids.shape[0])
        ]
    )
    return F.array_min(entries)["i"]


def ivf_topk(
    df: DataFrame,
    query: list[float],
    centroids: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: probe the ``n_probe`` lists whose centroids are
    nearest the query, exact cosine inside them. The list-id filter is
    column math, so Catalyst pushes the candidate restriction into the
    scan stage; recall is tuned by n_probe, cost ~ n_probe/n_lists of
    brute force. Assumes list ids were precomputed OR computes them
    inline (precompute + partitionBy(list_id) at scale)."""
    q = np.asarray(query, dtype=float)
    d2 = ((centroids - q) ** 2).sum(axis=1)
    probe = [int(i) for i in np.argsort(d2)[:n_probe]]
    lid = ivf_assign(F.col(vec_col), centroids)
    sim = F.round(cosine(F.col(vec_col), _lit_vec(query)), 6)
    return (
        df.withColumn("_list", lid)
        .filter(F.col("_list").isin(probe))
        .select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )
