"""Core CDC batch apply: changelog micro-batch -> hub / link / sat merges.

Re-expresses the reference's RawVaultETL load semantics (SURVEY.md §3.1)
with the *intended* behavior (proper SCD2 end-dating — the reference's
UPDATE is broken, RawVaultETL.scala:1032-1078; ours folds end-dating and
insertion into one copy-on-write merge):

1. redelivery dedup (exact duplicate events by ``seq``),
2. last-writer-wins collapse to one change per (conv_id, turn_idx) by
   (ts, seq) — skew-safe two-phase ``max_by`` with salting,
3. vectorized-UDF hashing (business keys, link key, hash-diff),
4. hub/link merges = insert-only anti-join on hash key (J1,
   RawVaultETL.scala:204-205),
5. satellite merge = SCD2: end-date the superseded current version and
   insert the new one; stale (out-of-order) changes are discarded by
   (valid_from, src_seq) comparison; deletes are tombstone versions.

Scale notes
-----------
- Hash computation is Arrow-vectorized (dvx.hashing), no per-row Python.
- The LWW collapse is the hot-key choke point at 10^10 events: a naive
  ``Window.partitionBy(conv_id, turn_idx)`` puts one hot conversation's
  whole history in one task. :func:`latest_per_key` instead does
  partial ``max_by`` per (key, salt) then a final ``max_by`` per key —
  map-side-combine shaped, so a hot key's rows reduce in parallel.
- Merges rewrite only touched buckets (dvx.lake COW), and each merge_fn
  is a bucket-colocated join: both sides are filtered to the same bucket
  set before shuffling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dvx.hashing import hash_expr_udf
from dvx.lake import BUCKET_COL
from dvx.schema import CHANGELOG_SCHEMA, RECORD_SOURCE, Vault

DESCRIPTIVE_COLS = ["role", "text", "tool"]  # canonical satellite attrs
_ENVELOPE = {f.name for f in CHANGELOG_SCHEMA.fields}


def latest_per_key(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    salt_buckets: int = 32,
) -> DataFrame:
    """One row per key: the max by ``order_cols`` (lexicographic).

    Two-phase aggregation (partial per salt, final per key) so a single
    hot key reduces in ``salt_buckets``-way parallelism instead of one
    task — the explicit skew lever the north_rule requires on top of AQE
    skew-join handling.
    """
    payload = F.struct(*[F.col(c) for c in df.columns])
    order = F.struct(*[F.col(c) for c in order_cols])
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in order_cols]), F.lit(salt_buckets))
    partial = df.groupBy(*keys, salt.alias("_salt")).agg(
        F.max_by(payload, order).alias("_row"), F.max(order).alias("_ord")
    )
    final = partial.groupBy(*keys).agg(F.max_by("_row", "_ord").alias("_row"))
    return final.select("_row.*")


def descriptive_cols_of(df: DataFrame) -> list[str]:
    """Canonical descriptive attrs + any additive extras present in the
    batch (the reference's intersection pattern, RawVaultETL.scala:250-309)."""
    extras = [c for c in df.columns if c not in _ENVELOPE and not c.startswith("_")]
    return DESCRIPTIVE_COLS + sorted(extras)


def prepare_batch(df: DataFrame, salt_buckets: int = 32) -> DataFrame:
    """Dedup + version-chain + hash enrichment of one changelog micro-batch.

    Emits EVERY distinct version per (conv_id, turn_idx) in the batch —
    not just the last writer — chained via ``_next_ts`` (the successor's
    valid_from, NULL for the batch-final version), so a PIT as-of any
    date inside the batch window is still correct. Consecutive events
    with identical hash_diff collapse (P5 change filter); exact
    redeliveries collapse on ``seq``.
    """
    from pyspark.sql.window import Window

    desc = descriptive_cols_of(df)
    df = df.dropDuplicates(["seq"])  # exactly-once vs redelivered events
    enriched = (
        df.withColumn("conv_hash_key", hash_expr_udf("conv_id"))
        .withColumn("turn_hash_key", hash_expr_udf("conv_id", "turn_idx"))
        # link hash = MD5 over the parent hash keys (RawVaultETL.scala:477-490)
        .withColumn("link_hash_key", hash_expr_udf("conv_hash_key", "turn_hash_key"))
        .withColumn(
            "is_deleted", F.when(F.col("op") == "D", F.lit("Y")).cast("string")
        )
        .withColumn("hash_diff", hash_expr_udf(*desc, "is_deleted"))
        .withColumn("load_date", F.date_format("ts", "yyyy-MM-dd"))
        .withColumn("record_source", F.lit(RECORD_SOURCE))
    )
    w = Window.partitionBy("conv_id", "turn_idx").orderBy("ts", "seq")
    chained = enriched.withColumn("_prev_diff", F.lag("hash_diff").over(w)).filter(
        F.col("_prev_diff").isNull() | (F.col("_prev_diff") != F.col("hash_diff"))
    )
    # second window reuses the first's hash partitioning (same keys)
    return chained.withColumn("_next_ts", F.lead("ts").over(w)).drop("_prev_diff")


def _insert_only_merge(key: str, select_cols: list[str]):
    """Hub/link merge_fn: current ∪ (source ∖ current) on the hash key —
    the J1 left-anti idempotent insert, expressed per touched bucket."""

    def fn(cur: DataFrame, src: DataFrame) -> DataFrame:
        cols = select_cols + [BUCKET_COL]
        others = [c for c in select_cols if c != key]
        # deterministic pick per key (min over the attr struct), not
        # dropDuplicates' arbitrary row — replays must byte-match
        src_rows = (
            src.select(*cols)
            .groupBy(key, BUCKET_COL)
            .agg(F.min(F.struct(*others)).alias("_s"))
            .select(key, "_s.*", BUCKET_COL)
        )
        new = src_rows.join(cur.select(key), key, "left_anti")
        return cur.select(*cols).unionByName(new.select(*cols))

    return fn


def _sat_scd2_merge(cur: DataFrame, src: DataFrame) -> DataFrame:
    """Satellite SCD2 merge_fn (one COW pass over touched buckets).

    - stale guard: incoming change older than the stored current version
      (by event ts, tie-broken by seq) is dropped — total-ordered LWW
      across batches;
    - no-op guard: identical hash_diff is dropped (P5 change filter,
      RawVaultETL.scala:340-346);
    - survivors end-date the current version (valid_to = new valid_from)
      and insert a fresh current version in the same commit.
    """
    from pyspark.sql.window import Window

    key = "turn_hash_key"
    cur_live = cur.filter(F.col("valid_to").isNull()).select(
        F.col(key),
        F.col("hash_diff").alias("_cur_diff"),
        F.col("valid_from").alias("_cur_vf"),
        F.col("src_seq").alias("_cur_seq"),
    )
    j = src.join(cur_live, key, "left")
    fresh = (
        F.col("_cur_diff").isNull()
        | (F.col("ts") > F.col("_cur_vf"))
        | ((F.col("ts") == F.col("_cur_vf")) & (F.col("seq") > F.col("_cur_seq")))
    )
    survivors = j.filter(fresh)
    # the batch's earliest surviving version is a no-op if it matches the
    # stored current version's hash_diff (P5); later versions in the
    # chain differ from each other by construction (prepare_batch)
    w = Window.partitionBy(key).orderBy("ts", "seq")
    winners = (
        survivors.withColumn("_rn", F.row_number().over(w))
        .filter(
            ~(
                (F.col("_rn") == 1)
                & F.col("_cur_diff").isNotNull()
                & (F.col("_cur_diff") == F.col("hash_diff"))
            )
        )
        .drop("_rn")
    )

    sat_cols = [f.name for f in cur.schema.fields if f.name != BUCKET_COL]
    new_rows = winners.select(
        *[
            F.col("ts").alias("valid_from")
            if c == "valid_from"
            else F.col("_next_ts").cast("timestamp").alias("valid_to")
            if c == "valid_to"
            else F.col("seq").alias("src_seq")
            if c == "src_seq"
            else F.col(c)
            for c in sat_cols
        ],
        F.col(BUCKET_COL),
    )
    enders = winners.groupBy(key).agg(F.min("ts").alias("_end_ts"))
    kept = (
        cur.join(enders, key, "left")
        .withColumn(
            "valid_to",
            F.when(
                F.col("valid_to").isNull() & F.col("_end_ts").isNotNull(),
                F.col("_end_ts"),
            ).otherwise(F.col("valid_to")),
        )
        .select(*sat_cols, BUCKET_COL)
    )
    return kept.unionByName(new_rows)


def apply_batch(
    vault: Vault,
    batch: DataFrame,
    epoch_id: int | None = None,
    stream_id: str = "default",
    salt_buckets: int = 32,
    collect_metrics: bool = False,
    parallel: bool = True,
) -> dict:
    """Apply one changelog micro-batch to the vault (idempotent).

    The prepared batch is persisted once and feeds all four merges (the
    reference re-reads staging per entity; we don't). The four table
    merges are independent, so they run as concurrent driver-thread jobs
    sharing the executors — the per-batch fixed overhead (scheduling,
    commit latency) overlaps instead of summing, which matters most for
    small/frequent micro-batches.

    ``collect_metrics`` additionally returns per-bucket row counts (one
    small agg on the cached batch) for the lineage table.
    """
    from concurrent.futures import ThreadPoolExecutor

    from dvx.evolve import evolve_for_batch

    desc_extras = evolve_for_batch(vault, batch)
    prepared = prepare_batch(batch, salt_buckets).persist()
    try:
        summary = {"epochs": {stream_id: epoch_id}} if epoch_id is not None else None

        bucket_counts: list[tuple[int, int]] = []
        n = None
        if collect_metrics:
            bucketed = vault.sat_turn_text.with_bucket(prepared)
            bucket_counts = [
                (r[0], r[1])
                for r in bucketed.groupBy(BUCKET_COL).count().collect()
            ]
            n = sum(c for _, c in bucket_counts)
        else:
            n = prepared.count()

        sat_cols = [f.name for f in vault.sat_turn_text.schema().fields]
        tasks = [
            (
                vault.hub_conversation,
                prepared.select("conv_hash_key", "conv_id", "load_date", "record_source"),
                _insert_only_merge(
                    "conv_hash_key",
                    ["conv_hash_key", "conv_id", "load_date", "record_source"],
                ),
            ),
            (
                vault.hub_turn,
                prepared.select(
                    "turn_hash_key", "conv_id", "turn_idx", "load_date", "record_source"
                ),
                _insert_only_merge(
                    "turn_hash_key",
                    ["turn_hash_key", "conv_id", "turn_idx", "load_date", "record_source"],
                ),
            ),
            (
                vault.link_conversation_turn,
                prepared.select(
                    "link_hash_key",
                    "conv_hash_key",
                    "turn_hash_key",
                    "load_date",
                    "record_source",
                ),
                _insert_only_merge(
                    "link_hash_key",
                    [
                        "link_hash_key",
                        "conv_hash_key",
                        "turn_hash_key",
                        "load_date",
                        "record_source",
                    ],
                ),
            ),
            (
                vault.sat_turn_text,
                prepared.select(
                    *[c for c in sat_cols if c not in ("valid_from", "valid_to", "src_seq")],
                    "ts",
                    "seq",
                    "_next_ts",
                ),
                _sat_scd2_merge,
            ),
        ]
        if parallel:
            with ThreadPoolExecutor(max_workers=4) as ex:
                futs = [
                    ex.submit(tbl.merge, src, fn, summary) for tbl, src, fn in tasks
                ]
                for f in futs:
                    f.result()
        else:
            for tbl, src, fn in tasks:
                tbl.merge(src, fn, summary=summary)
        return {"events": n, "extras": desc_extras, "bucket_counts": bucket_counts}
    finally:
        prepared.unpersist()
