"""Similarity search over an embedding column (array<float>).

- :func:`cosine` — double-precision cosine as a pure column expression
  (``zip_with`` + ``aggregate``: JVM-side, no Python in the hot path).
- :func:`brute_force_topk` — exact top-k neighbors for a query set:
  broadcast the (small) query side, window top-k per query. The
  verification baseline.
- :func:`lsh_ann` — the scale path: deterministic random-hyperplane LSH.
  Planes are hash-derived (plane p, dim i -> xxhash64 -> uniform in
  [-1, 1]), so signatures are reproducible with no RNG state. Probing
  joins on the signature bucket, then exact cosine re-ranks inside the
  bucket: O(candidates) instead of O(n) per query.
- :func:`ivf_ann` — IVF-style variant: k-means-free coarse quantization
  using the LSH bucket as the inverted list key, with multi-probe via
  Hamming-adjacent buckets.

At 100 TB the brute-force path is a full-table broadcast-join scan per
query batch — linear but embarrassingly parallel; the LSH path turns it
into a bucket-pruned shuffle join. Both avoid collect()-loops entirely.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (excluding self).

    Output: (query_id, neighbor_id, rank, cos). Query side is broadcast;
    the corpus is scanned once — the right plan when |queries| << |corpus|.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def _plane_component(plane: int, i: Column) -> Column:
    """Deterministic pseudo-random hyperplane component in [-1, 1]."""
    h = F.xxhash64(F.lit(f"plane-{plane}"), i)
    return (F.pmod(h, F.lit(2000001)) - F.lit(1000000)) / F.lit(1000000.0)


def lsh_signature(vec: Column, num_planes: int = 8) -> Column:
    """Random-hyperplane signature: bit p = sign(<vec, plane_p>)."""
    idx = F.sequence(F.lit(0), F.size(vec) - 1)
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec,
                    F.transform(idx, lambda i: _plane_component(p, i)),
                    lambda x, w: x.cast("double") * w,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for p in range(num_planes)
    ]
    return F.concat(*bits)


def lsh_ann(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN via hyperplane-LSH bucket join + exact re-rank in-bucket."""
    sig = lambda d: d.withColumn("sig", lsh_signature(F.col(vec_col), num_planes))  # noqa: E731
    c = sig(emb).select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "sig")
    q = sig(queries).select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "sig")
    scored = (
        c.join(F.broadcast(q), ["sig"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def ivf_ann(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 6,
    n_probes: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style multi-probe: query probes its own bucket plus the
    ``n_probes - 1`` Hamming-distance-1 neighbor buckets, widening recall
    without widening the corpus shuffle (corpus stays single-bucketed)."""
    c = emb.withColumn("sig", lsh_signature(F.col(vec_col), num_planes)).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "sig"
    )
    q0 = queries.withColumn("sig0", lsh_signature(F.col(vec_col), num_planes)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "sig0"
    )
    flips = F.array(
        *[
            F.concat(
                F.substring("sig0", 1, p),
                F.when(F.substring("sig0", p + 1, 1) == "1", "0").otherwise("1"),
                F.substring("sig0", p + 2, num_planes - p - 1),
            )
            for p in range(min(n_probes - 1, num_planes))
        ]
    )
    q = q0.withColumn(
        "sig", F.explode(F.array_distinct(F.concat(F.array(F.col("sig0")), flips)))
    ).select("query_id", "qv", "sig")
    scored = (
        c.join(F.broadcast(q), ["sig"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )
