"""Similarity search over an embedding column (array<float>).

- :func:`cosine` — double-precision cosine as a pure column expression
  (``zip_with`` + ``aggregate``: JVM-side, no Python in the hot path).
- :func:`brute_force_topk` — exact top-k neighbors for a query set:
  broadcast the (small) query side, window top-k per query. The
  verification baseline.
- :func:`lsh_ann` — the scale path: deterministic random-hyperplane LSH,
  BANDED over ``num_tables`` independent signature tables (a vector lands
  in one bucket per table; candidates = union over tables), so recall
  isn't capped by a single 2^num_planes bucketing. Probing joins on the
  (table, signature) bucket, then exact cosine re-ranks inside the
  bucket: O(candidates) instead of O(n) per query.
- :func:`ivf_ann` — IVF-style variant: k-means-free coarse quantization
  using the LSH bucket as the inverted list key, with multi-probe via
  Hamming-adjacent buckets.

Hyperplanes are md5-derived in plain Python (:func:`hyperplanes`) and
inlined as literal arrays, so the signature arithmetic is bit-identical
in Spark, in the DuckDB oracle (:func:`lsh_sig_sql` emits the same
left-to-right dot product), and in any other engine — no RNG state, no
engine-specific hash function.

At 100 TB the brute-force path is a full-table broadcast-join scan per
query batch — linear but embarrassingly parallel; the LSH path turns it
into a bucket-pruned shuffle join. Both avoid collect()-loops entirely.
"""

from __future__ import annotations

import hashlib

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
    from dvx.ops.util import widen_partitions

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    # widen the corpus: the per-pair cosine (zip_with + aggregate over
    # the vector) is compute-heavy per row, and a single-file corpus
    # otherwise scans as ONE partition (guide §2.5 input skew)
    c = widen_partitions(emb).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
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


def hyperplanes(num_planes: int, dim: int, table: int = 0) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes, component in [-1, 1].

    md5-derived in plain Python so ANY engine reproduces them: component
    (table t, plane p, dim i) = (int(md5("plane-t-p-i")[:12], 16)
    % 2000001 - 1000000) / 1e6. The doubles are computed once here and
    inlined as literals on both the Spark and oracle sides, so the dot
    products are bit-identical."""
    out = []
    for p in range(num_planes):
        row = []
        for i in range(dim):
            h = int(
                hashlib.md5(f"plane-{table}-{p}-{i}".encode()).hexdigest()[:12], 16
            )
            row.append((h % 2000001 - 1000000) / 1e6)
        out.append(row)
    return out


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: bit p = sign(<vec, plane_p>).
    Weights are literal arrays (no per-row hash computation)."""
    bits = []
    for plane in planes:
        warr = F.array(*[F.lit(w) for w in plane])
        dotp = F.aggregate(
            F.zip_with(vec, warr, lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dotp >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_sig_sql(planes: list[list[float]], vexpr: str = "v") -> str:
    """ANSI-SQL text of :func:`lsh_signature` over a DOUBLE[] column
    (1-based indexing; left-to-right sum order matches Spark's aggregate
    fold, so the bits are bit-identical)."""
    cases = []
    for plane in planes:
        dot = " + ".join(
            f"{vexpr}[{i + 1}] * {w!r}" for i, w in enumerate(plane)
        )
        cases.append(f"CASE WHEN ({dot}) >= 0 THEN '1' ELSE '0' END")
    return " || ".join(cases)


def _dim_of(df: DataFrame, vec_col: str) -> int:
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is None:
        raise ValueError("empty embedding table")
    return int(row["d"])


def lsh_ann(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 8,
    num_tables: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """ANN via banded hyperplane-LSH bucket join + exact re-rank in-bucket.

    ``num_tables`` independent signature tables (bands): a pair is a
    candidate if it collides in ANY table, so recall grows with tables
    while each table's bucket join stays pruned — the standard banding
    trade-off (P[candidate] = 1 - (1 - s^planes)^tables)."""
    from dvx.ops.util import widen_partitions

    if dim is None:
        dim = _dim_of(emb, vec_col)
    emb = widen_partitions(emb)  # per-row signature dot products
    bands = [hyperplanes(num_planes, dim, table=t) for t in range(num_tables)]

    def with_sigs(df: DataFrame, idname: str, vname: str) -> DataFrame:
        entries = F.array(
            *[
                F.struct(
                    F.lit(t).alias("tbl"),
                    lsh_signature(F.col(vec_col), bands[t]).alias("sig"),
                )
                for t in range(num_tables)
            ]
        )
        return df.select(
            F.col(id_col).alias(idname),
            F.col(vec_col).alias(vname),
            F.explode(entries).alias("_e"),
        ).select(idname, vname, "_e.tbl", "_e.sig")

    c = with_sigs(emb, "neighbor_id", "cv")
    q = with_sigs(queries, "query_id", "qv")
    scored = (
        c.join(F.broadcast(q), ["tbl", "sig"])
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


def ivf_ann(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 6,
    n_probes: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """IVF-style multi-probe: query probes its own bucket plus the
    ``n_probes - 1`` Hamming-distance-1 neighbor buckets, widening recall
    without widening the corpus shuffle (corpus stays single-bucketed)."""
    from dvx.ops.util import widen_partitions

    if dim is None:
        dim = _dim_of(emb, vec_col)
    planes = hyperplanes(num_planes, dim, table=0)
    emb = widen_partitions(emb)  # per-row signature dot products
    c = emb.withColumn("sig", lsh_signature(F.col(vec_col), planes)).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "sig"
    )
    q0 = queries.withColumn("sig0", lsh_signature(F.col(vec_col), planes)).select(
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
