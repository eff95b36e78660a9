"""Deduplication operators for training-data pipelines.

Five families, all deterministic (hash-seeded, no RNG) and shuffle-aware:

- :func:`exact_dedup` — hash-groupBy on the normalization fingerprint.
- :func:`shingles` / :func:`minhash_signatures` / :func:`lsh_pairs` —
  MinHash + banded LSH: shingle -> per-seed min of md5(seed~shingle) ->
  band buckets -> candidate pairs from bucket joins. MD5-based so the
  DuckDB oracle reproduces signatures bit-for-bit.
- :func:`simhash` — 32-bit SimHash from per-token MD5 nibble votes.
- :func:`jaccard_pairs` — exact n-gram Jaccard over an inverted-index
  self-join (the verification stage after LSH candidate generation).
- :func:`near_dups_lsh` — cosine near-duplicate pairs over an embedding
  column: banded hyperplane-LSH candidates -> exact cosine re-rank
  (the product path); :func:`embedding_near_dups` is its brute-force
  O(n²) recall oracle (verification only).

Scale notes
-----------
- Everything is expressed as explode -> groupBy / join, i.e. map-side
  shingling + shuffle on shingle/bucket keys; no driver-side loops.
- The inverted-index join emits each candidate pair once per shared
  shingle, then groupBy reduces — a hot shingle (stop-phrase) explodes
  candidate pairs quadratically, so :func:`jaccard_pairs` drops shingles
  shared by more than ``max_df`` docs (standard near-dup practice: a
  shingle that common carries no dedup signal anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dvx.ops.textstats import fingerprint
from dvx.ops.util import widen_partitions


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Keeper per exact-normalized-duplicate group: min doc_id wins.
    Returns (fp, keeper_id, n_dups)."""
    return (
        widen_partitions(docs)
        .select(F.col("doc_id"), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keeper_id"), F.count("*").alias("n_dups"))
    )


def shingles(docs: DataFrame, text_col: str = "text", k: int = 5) -> DataFrame:
    """Word k-shingles of the normalized text: (doc_id, shingle).

    The input is widened to cluster parallelism first: the tokenize +
    slice + array_join pipeline is the measured cost center of every
    shingle consumer, and a single-file parquet input would otherwise
    run it on one core (dvx.ops.util.widen_partitions)."""
    docs = widen_partitions(docs)
    toks = F.split(F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    sh = F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i, k), " ")
    )
    return docs.select("doc_id", F.explode(F.array_distinct(sh)).alias("shingle"))


def minhash_signatures(
    sh: DataFrame, num_hashes: int = 8
) -> DataFrame:
    """Per-doc MinHash signature: for seed s, min over shingles of
    md5(s ~ shingle). The seeds are computed as ``num_hashes`` COLUMNS of
    one shingle row (not an explode): the seed fan-out previously
    multiplied the rows flowing through the projection and the partial
    aggregate by ``num_hashes`` for the same md5 work — N rows with
    ``num_hashes`` min-agg columns do strictly less row handling and
    shuffle the same post-partial-agg bytes (guide §2.3: aggregate before
    you shuffle; don't explode what a column can carry).
    Output: (doc_id, mh0..mh{n-1}) — string mins, oracle-reproducible,
    bit-identical to the exploded form."""
    hashed = sh.select(
        "doc_id",
        *[
            F.md5(F.concat_ws("~", F.lit(str(i)), F.col("shingle"))).alias(f"h{i}")
            for i in range(num_hashes)
        ],
    )
    aggs = [F.min(F.col(f"h{i}")).alias(f"mh{i}") for i in range(num_hashes)]
    return hashed.groupBy("doc_id").agg(*aggs)


def lsh_pairs(
    sigs: DataFrame, num_hashes: int = 8, bands: int = 4, max_bucket: int = 10000
) -> DataFrame:
    """Banded LSH candidate pairs: docs sharing any band bucket.
    bucket = md5(band ~ concat of the band's minhashes); pairs via a
    self-equi-join on (band, bucket) — shuffle keyed on the bucket, so
    scale-out is linear in candidates, not in |docs|^2.

    ``max_bucket`` is the hot-bucket guard (the analog of
    ``jaccard_pairs.max_df``): a degenerate band bucket — e.g. a
    boilerplate-heavy corpus where thousands of docs share a band
    signature — would otherwise emit O(n²) pairs in ONE join task.
    Buckets holding more than ``max_bucket`` docs are dropped; such a
    bucket carries no dedup signal beyond "these are all near-identical",
    which exact_dedup already reports more cheaply."""
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        parts = [F.lit(str(b))] + [
            F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)
        ]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("~", *parts)).alias("bucket"))
        )
    exploded = sigs.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bb")
    ).select("doc_id", "bb.band", "bb.bucket")
    bucket_df = exploded.groupBy("band", "bucket").agg(F.count("*").alias("_bdf"))
    exploded = exploded.join(
        bucket_df.filter(F.col("_bdf") <= max_bucket).select("band", "bucket"),
        ["band", "bucket"],
    )
    a, b_ = exploded.alias("a"), exploded.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def simhash(sh_tokens: DataFrame, token_col: str = "shingle") -> DataFrame:
    """32-bit SimHash as a bit string: position p's bit is the majority
    vote of md5(token)'s p-th nibble high bit ('8'..'f' => +1 else -1).
    Pure hex-char comparisons — no hex->int casts, so the DuckDB oracle
    matches byte-for-byte. Output: (doc_id, simhash string).

    The 32 positions are 32 sum-agg COLUMNS over one token row, not a
    32-way explode: the previous shape pushed 32x the rows through two
    groupBys plus a collect_list sort per doc; one groupBy with 32
    map-side-combining sums computes the identical votes (guide §2.3/§2.4:
    same aggregate, one exchange, no row multiplication)."""
    hx = sh_tokens.select("doc_id", F.md5(F.col(token_col)).alias("h"))
    vote_aggs = [
        F.sum(
            F.when(F.substring(F.col("h"), p, 1) >= "8", 1).otherwise(-1)
        ).alias(f"v{p}")
        for p in range(1, 33)
    ]
    voted = hx.groupBy("doc_id").agg(*vote_aggs)
    bit = lambda p: F.when(F.col(f"v{p}") > 0, F.lit("1")).otherwise(F.lit("0"))  # noqa: E731
    return voted.select(
        "doc_id", F.concat(*[bit(p) for p in range(1, 33)]).alias("simhash")
    )


def jaccard_pairs(
    sh: DataFrame, threshold: float = 0.5, max_df: int = 100
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs from an inverted index.

    |A ∩ B| via the shingle self-join, |A ∪ B| = |A| + |B| - |A ∩ B|.
    Shingles appearing in > max_df docs are dropped (hot-key guard)."""
    df_counts = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    pruned = sh.join(
        df_counts.filter(F.col("df") <= max_df).select("shingle"), "shingle"
    )
    sizes = pruned.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a, b = pruned.alias("a"), pruned.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def near_dups_lsh(
    emb: DataFrame,
    threshold: float = 0.95,
    num_planes: int = 8,
    num_tables: int = 2,
    max_bucket: int = 100000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Cosine near-duplicate pairs at scale — the PRODUCT path.

    Banded hyperplane-LSH candidate generation (a pair is a candidate if
    its signatures collide in ANY of ``num_tables`` independent tables)
    -> exact cosine re-rank -> threshold filter. The self-join is keyed
    on the (table, signature) bucket, so cost is O(candidates), never
    O(n²) — :func:`embedding_near_dups` is the all-pairs
    verification-grade oracle of this op, not the path to run on a
    corpus. Deterministic: hyperplanes are md5-derived literals
    (dvx.ops.similarity.hyperplanes), so the approximate candidate set
    is bit-reproducible in any engine.

    ``max_bucket`` is the hot-bucket guard (same rationale as
    :func:`lsh_pairs`): a degenerate signature bucket — e.g. a corpus
    of near-identical embeddings — would emit O(n²) pairs in one join
    task; such a bucket carries no *pair-level* signal beyond "all
    near-identical". Recall at the threshold is tuned by
    (num_planes, num_tables): P[candidate] = 1 - (1 - (1 - θ/π)^planes)
    ^tables with θ = arccos(threshold).
    """
    from dvx.ops.similarity import _dim_of, cosine, hyperplanes, lsh_signature

    if dim is None:
        dim = _dim_of(emb, vec_col)
    emb = widen_partitions(emb)  # signature dot products are per-row heavy
    bands = [hyperplanes(num_planes, dim, table=t) for t in range(num_tables)]
    entries = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                lsh_signature(F.col(vec_col), bands[t]).alias("sig"),
            )
            for t in range(num_tables)
        ]
    )
    sigs = emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
        F.explode(entries).alias("_e"),
    ).select("id", "v", "_e.tbl", "_e.sig")
    bucket_df = sigs.groupBy("tbl", "sig").agg(F.count("*").alias("_bdf"))
    sigs = sigs.join(
        bucket_df.filter(F.col("_bdf") <= max_bucket).select("tbl", "sig"),
        ["tbl", "sig"],
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.v").alias("va"),
            F.col("b.v").alias("vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("cos", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )


def embedding_near_dups(
    emb: DataFrame, threshold: float = 0.95, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Cosine near-duplicate pairs (brute force — the VERIFICATION-grade
    path, O(n²) by construction; the product path at corpus scale is
    :func:`near_dups_lsh`, which this op serves as the exact recall
    oracle for). Double-precision accumulation in array order so the
    oracle's list_cosine_similarity agrees."""
    from dvx.ops.similarity import cosine

    emb = widen_partitions(emb)
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )
