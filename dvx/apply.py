"""Core CDC batch apply: changelog micro-batch -> hub / link / sat merges.

Re-expresses the reference's RawVaultETL load semantics (SURVEY.md §3.1)
with the *intended* behavior (proper SCD2 end-dating — the reference's
UPDATE is broken, RawVaultETL.scala:1032-1078; ours folds end-dating and
insertion into one copy-on-write merge):

1. vectorized-UDF hashing (business keys + link key fused in one Arrow
   pass; hash-diff),
2. per-key version chaining ordered by (ts, seq): consecutive duplicate
   hash-diffs (incl. exact redeliveries) collapse, survivors carry their
   in-batch end timestamp,
3. hub/link merges = insert-only anti-join on hash key (J1,
   RawVaultETL.scala:204-205),
4. satellite apply = SCD2 over a bounded CURRENT table + append-only
   HISTORY: end-date displaced versions, insert the batch-final version
   as current; stale (out-of-order) arrivals trigger a per-bucket
   re-chain that splices them into history (one-shot semantics, nothing
   lost); deletes are tombstone versions.

Scale notes
-----------
- Hash computation is Arrow-vectorized (dvx.hashing) and fully fused:
  all three business keys + the hash-diff in ONE Arrow round trip.
- The SCD2 decision logic runs on narrow (key, ts, seq, hash_diff) rows;
  full-width transcript rows never sort or shuffle through the chain —
  they are recovered per output by an anti-join against the (tiny,
  AQE-broadcast) dropped set.
- Hot-conversation skew: the chain window partitions by (conv_id,
  turn_idx) — a hot conversation's events spread across its turns, so
  no single task holds a whole hot conversation, only one turn's
  version run (bounded by the per-turn edit count). The rows that flow
  through that window are the narrow ~100B decision columns, so even a
  pathological single-turn run is cheap to sort.
- Merges rewrite only touched buckets (dvx.lake COW), and each merge_fn
  is a bucket-colocated join: both sides are filtered to the same bucket
  set before shuffling.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dvx.hashing import turn_all_hashes
from dvx.lake import BUCKET_COL
from dvx.schema import CHANGELOG_SCHEMA, RECORD_SOURCE, Vault

DESCRIPTIVE_COLS = ["role", "text", "tool"]  # canonical satellite attrs
_ENVELOPE = {f.name for f in CHANGELOG_SCHEMA.fields}


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
    date inside the batch window is still correct.

    Exact redeliveries need no dedicated ``dropDuplicates(seq)`` shuffle:
    a redelivered event has the same (ts, seq, content), so it sorts
    adjacent to its original in the per-key chain and the consecutive
    hash-diff filter removes it — one shuffle total for the whole
    prepare stage.
    """
    from pyspark.sql.window import Window

    desc = descriptive_cols_of(df)
    # Redistribute on the chain keys BEFORE the Arrow hash UDFs. A micro-
    # batch often arrives as one file (= 1-3 scan tasks), and ArrowEval
    # runs in the scan stage — without this, MD5 hashing of millions of
    # rows is pinned to those few Python workers regardless of cluster
    # size (measured: replay throughput flat from local[4] to local[32]).
    # The chain window below requires exactly this clustering, so Catalyst
    # reuses the exchange — one shuffle total, same as before, but the
    # UDFs now run at full width.
    # Measured (synth100000, 4 micro-batches): without this, 16 cores run
    # SLOWER than 4 (14.2k vs 19.7k ev/s); with it, 16 cores win (22.0k vs
    # 16.8k). The small low-core cost is the price of the high-core win.
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    df = df.repartition(n_part, "conv_id", "turn_idx")
    is_del = F.when(F.col("op") == "D", F.lit("Y")).cast("string")
    enriched = (
        df.withColumn("is_deleted", is_del)
        .withColumn(
            "_keys",
            turn_all_hashes("conv_id", "turn_idx", [*desc, "is_deleted"]),
        )
        .select("*", "_keys.*")
        .drop("_keys")
        .withColumn("load_date", F.date_format("ts", "yyyy-MM-dd"))
        .withColumn("record_source", F.lit(RECORD_SOURCE))
    )
    w = Window.partitionBy("conv_id", "turn_idx").orderBy("ts", "seq")
    chained = enriched.withColumn("_prev_diff", F.lag("hash_diff").over(w)).filter(
        F.col("_prev_diff").isNull() | (F.col("_prev_diff") != F.col("hash_diff"))
    )
    # second window reuses the first's hash partitioning (same keys)
    return chained.withColumn("_next_ts", F.lead("ts").over(w)).drop("_prev_diff")


def _spill_path(vault: Vault) -> str:
    """Scratch dir for intra-batch spills, colocated with Spark's own
    shuffle scratch (tmpfs when available, dvx.session._scratch_dir)."""
    import uuid

    base = vault.spark.conf.get("spark.local.dir", "/tmp").split(",")[0]
    return os.path.join(base, "dvx_spill", uuid.uuid4().hex)


def _insert_new_keys(
    tbl,
    src: DataFrame,
    key: str,
    select_cols: list[str],
    epoch_id: int | None,
    stream_id: str,
    summary: dict | None,
) -> None:
    """Insert-only hub/link apply as an anti-join + APPEND.

    Hubs and links never update, so COW-rewriting their touched buckets
    every batch is pure write amplification — O(table) per batch once
    batches spread across all buckets. This path reads only the key
    column of the touched buckets (parquet column pruning), anti-joins
    (J1, RawVaultETL.scala:204-205), and appends just the new rows:
    write IO is O(new keys). Appends are not naturally idempotent, so
    the table's epoch watermark guards re-delivered batches (the same
    handshake the satellite history table uses)."""
    if epoch_id is not None and tbl.last_epoch(stream_id) >= epoch_id:
        return
    others = [c for c in select_cols if c != key]
    src_b = tbl.with_bucket(src)
    touched = sorted(r[0] for r in src_b.select(BUCKET_COL).distinct().collect())
    if not touched:
        return
    existing = tbl.read(buckets=touched).select(key)
    src_rows = (
        src_b.groupBy(key, BUCKET_COL)
        .agg(F.min(F.struct(*[F.col(c) for c in others])).alias("_s"))
        .select(key, "_s.*", BUCKET_COL)
    )
    new = src_rows.join(existing, key, "left_anti")
    tbl.append(new, summary=summary)


def _apply_satellite(
    vault: Vault,
    src: DataFrame,
    epoch_id: int | None,
    stream_id: str,
    summary: dict | None,
) -> None:
    """Satellite SCD2 apply over the current/history split.

    Semantics (reference's *intended* end-dating, RawVaultETL.scala
    1032-1078 fixed):

    - FRESH rows (strictly newer than the stored current by (ts, seq)):
      the in-batch chain applies directly — the no-op guard drops the
      batch's earliest surviving version if it matches the stored current
      hash_diff (P5 change filter, RawVaultETL.scala:340-346), non-final
      chain versions + displaced old current rows append to the HISTORY
      table (guarded by its epoch watermark — appends are not naturally
      idempotent), and the batch-final version per key replaces the
      CURRENT row (COW on touched buckets only).
    - EQUAL rows (same (ts, seq) as the stored current): exact
      redeliveries — dropped, idempotent.
    - STALE rows (strictly older than the stored current): out-of-order
      arrivals. These are NOT discarded (round-1 defect: dropping them
      loses past-as-of PIT rows). Every bucket containing a stale row is
      re-chained from scratch: union(history ∪ current ∪ incoming) for
      that bucket, dedup on (key, ts, seq), re-collapse consecutive
      duplicate hash_diffs, recompute valid_from/valid_to by lead() —
      i.e. the one-shot oracle semantics, recomputed for O(stale buckets)
      only. The re-chain is a pure function of (stored state ∪ batch), so
      crash-replay at any point converges to the same state.
    """
    from pyspark.sql.window import Window

    import shutil as _shutil

    import time as _time

    _prof = os.environ.get("DVX_PROFILE_SAT") == "1"
    _marks: list[tuple[str, float]] = [("start", _time.time())]

    def _mark(label: str) -> None:
        if _prof:
            _marks.append((label, _time.time()))

    key = "turn_hash_key"
    cur_tbl = vault.sat_turn_text
    hist_tbl = vault.sat_turn_text_hist
    # no extra cache here: src projects the (cached) prepared batch, and
    # every extra multi-million-row block-manager cache serializes on the
    # memory store at high core counts (measured: 3 caches alive made the
    # satellite block 4x slower at local[32] than local[8])
    src = cur_tbl.with_bucket(src)
    spill_j = None
    try:
        touched = sorted(r[0] for r in src.select(BUCKET_COL).distinct().collect())
        _mark("touched_collect")
        if not touched:
            return
        cur = cur_tbl.with_bucket(cur_tbl.read(buckets=touched))
        sat_cols = [f.name for f in cur_tbl.schema().fields]

        cur_live = cur.select(
            F.col(key),
            F.col("hash_diff").alias("_cur_diff"),
            F.col("valid_from").alias("_cur_vf"),
            F.col("src_seq").alias("_cur_seq"),
        )
        stale = F.col("_cur_diff").isNotNull() & (
            (F.col("ts") < F.col("_cur_vf"))
            | ((F.col("ts") == F.col("_cur_vf")) & (F.col("seq") < F.col("_cur_seq")))
        )
        # NARROW chain: the whole versioning decision (stale detection,
        # fresh filter, window, no-op guard) needs only key/ts/seq/
        # hash_diff — ~100B/row. Running it narrow keeps `text` (the bulk
        # of a transcript row) out of the chain's shuffles and spills;
        # full rows are re-fetched ONCE per output by a (key, ts, seq)
        # semi-join against the prepared-batch parquet, whose scan is
        # column-pruned per consumer.
        src_n = src.select(key, "ts", "seq", "hash_diff", BUCKET_COL)
        fresh = (
            F.col("_cur_diff").isNull()
            | (F.col("ts") > F.col("_cur_vf"))
            | ((F.col("ts") == F.col("_cur_vf")) & (F.col("seq") > F.col("_cur_seq")))
        )
        w = Window.partitionBy(key).orderBy("ts", "seq")
        # running count of fresh rows per key: the first fresh row (the
        # one the old row_number guard saw as _rn == 1) has _fidx == 1.
        # The join shuffles on `key` and the window needs exactly that
        # clustering, so join + window + flags are ONE job — every
        # per-row decision (_stale, _win) lands in a single narrow spill
        # instead of three chained spill/read barriers.
        fidx = F.sum(fresh.cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        noop = (
            fresh
            & (fidx == 1)
            & F.col("_cur_diff").isNotNull()
            & (F.col("_cur_diff") == F.col("hash_diff"))
        )
        decisions = (
            src_n.join(cur_live, key, "left")
            .withColumn("_stale", stale)
            .withColumn("_win", fresh & ~noop)
            .select(key, "ts", "seq", BUCKET_COL, "_stale", "_win")
        )
        spill_j = _spill_path(vault)
        decisions.write.mode("overwrite").option(
            "compression", "uncompressed"
        ).parquet(spill_j)
        _mark("spill_decisions")
        decisions = vault.spark.read.parquet(spill_j)

        stale_buckets = sorted(
            r[0]
            for r in decisions.filter("_stale").select(BUCKET_COL).distinct().collect()
        )
        _mark("stale_collect")

        # per-key windows are bucket-local, so excluding stale buckets
        # AFTER the flag pass leaves fast-bucket decisions unchanged
        in_stale = (
            F.col(BUCKET_COL).isin(stale_buckets) if stale_buckets else F.lit(False)
        )
        winners_n = decisions.filter(F.col("_win") & ~in_stale)
        # full winner rows = src MINUS the dropped set. In steady state
        # almost every batch row survives the chain (drops = redeliveries,
        # stale rows, the no-op guard), so the dropped set is tiny — the
        # anti-join broadcasts under AQE and the full-text src rows never
        # shuffle or sort on this path. (A semi-join against winner keys
        # is the same rows but sort-merge-joins 1.8M text rows; measured
        # 15s vs ~3s for the downstream write at local[16].)
        dropped_n = decisions.filter(~F.col("_win") | in_stale).select(key, "ts", "seq")
        winners = src.join(dropped_n, [key, "ts", "seq"], "left_anti")

        def as_sat(df: DataFrame, valid_to) -> DataFrame:
            return df.select(
                *[
                    F.col("ts").alias("valid_from")
                    if c == "valid_from"
                    else valid_to.alias("valid_to")
                    if c == "valid_to"
                    else F.col("seq").alias("src_seq")
                    if c == "src_seq"
                    else F.col(c)
                    for c in sat_cols
                ],
                F.col(BUCKET_COL),
            )

        # ---- fast path (buckets with in-order arrivals only) ----
        # batch-final winner per key -> new current (valid_to NULL);
        # earlier chain versions -> history with their chained end ts
        finals = winners.filter(F.col("_next_ts").isNull())
        intermediates = winners.filter(F.col("_next_ts").isNotNull())

        cur_fast = (
            cur.filter(~F.col(BUCKET_COL).isin(stale_buckets)) if stale_buckets else cur
        )
        # shuffle_hash hint: enders is a narrow key set — hashing it beats
        # sort-merge, which would sort the full-text cur rows
        enders = winners_n.groupBy(key).agg(F.min("ts").alias("_end_ts")).hint(
            "shuffle_hash"
        )
        displaced = (
            cur_fast.join(enders, key, "inner")
            .withColumn("valid_to", F.col("_end_ts"))
            .select(*sat_cols, BUCKET_COL)
        )
        hist_rows = as_sat(
            intermediates, F.col("_next_ts").cast("timestamp")
        ).unionByName(displaced)

        # history append first: if we crash before the current commit, the
        # re-run recomputes the same displaced/intermediate rows (current
        # is unchanged) and the epoch guard skips the duplicate append
        if epoch_id is None or hist_tbl.last_epoch(stream_id) < epoch_id:
            hist_tbl.append(hist_rows, summary=summary)
        _mark("hist_append")

        re_current = None

        # ---- re-chain path (buckets that received out-of-order rows) ----
        if stale_buckets:
            vcols = [
                c for c in sat_cols if c not in ("valid_from", "valid_to", "src_seq")
            ]
            attr_cols = [c for c in vcols if c != key]

            def as_version(df: DataFrame) -> DataFrame:
                return df.select(
                    F.col(key),
                    F.col("valid_from").alias("ts"),
                    F.col("src_seq").alias("seq"),
                    *attr_cols,
                    F.col(BUCKET_COL),
                )

            inc_re = src.filter(F.col(BUCKET_COL).isin(stale_buckets)).select(
                F.col(key), "ts", "seq", *attr_cols, F.col(BUCKET_COL)
            )
            hist_re = as_version(
                hist_tbl.with_bucket(hist_tbl.read(buckets=stale_buckets))
            )
            cur_re = as_version(cur.filter(F.col(BUCKET_COL).isin(stale_buckets)))
            # dedup redeliveries on (key, ts, seq) with a deterministic
            # attr pick, then re-collapse consecutive duplicate diffs and
            # recompute the valid_from/valid_to chain — the one-shot
            # semantics over everything ever seen for these buckets
            allv = (
                inc_re.unionByName(hist_re)
                .unionByName(cur_re)
                .groupBy(key, "ts", "seq", BUCKET_COL)
                .agg(F.min(F.struct(*attr_cols)).alias("_s"))
                .select(key, "ts", "seq", BUCKET_COL, "_s.*")
            )
            wv = Window.partitionBy(key).orderBy("ts", "seq")
            collapsed = allv.withColumn("_pd", F.lag("hash_diff").over(wv)).filter(
                F.col("_pd").isNull() | (F.col("_pd") != F.col("hash_diff"))
            )
            chained = collapsed.withColumn("_nt", F.lead("ts").over(wv)).drop("_pd")
            re_sat = chained.select(
                *[
                    F.col("ts").alias("valid_from")
                    if c == "valid_from"
                    else F.col("_nt").cast("timestamp").alias("valid_to")
                    if c == "valid_to"
                    else F.col("seq").alias("src_seq")
                    if c == "src_seq"
                    else F.col(c)
                    for c in sat_cols
                ],
                F.col(BUCKET_COL),
            )
            hist_tbl.replace_buckets(
                stale_buckets,
                re_sat.filter(F.col("valid_to").isNotNull()),
                summary=summary,
            )
            re_current = re_sat.filter(F.col("valid_to").isNull())

        # ---- current-table apply: merge-on-read ----
        # The round-2 scale-killer was the COW rewrite here: replacing
        # every touched bucket's full contents made per-batch write IO
        # O(current ∩ touched buckets) — with uniform keys that is the
        # whole current table per batch. Now only the CHANGED rows are
        # written: the batch-final version per displaced/new key goes
        # into per-bucket DELTA files (lake.upsert_delta) and readers
        # last-wins-merge them; unchanged current rows are never
        # rewritten. compact_deltas folds them back every
        # DVX_SAT_DELTA_COMPACT commits per bucket, so the amortized
        # rewrite is O(bucket / threshold) per batch.
        #
        # Crash ordering: the stale-bucket replacement carries NO epoch
        # mark — only the delta commit does. A crash between them leaves
        # the epoch unrecorded, so the re-run redoes both; the re-chain
        # is a pure function of (stored state ∪ batch) and the delta
        # upsert re-derives the same finals, so replay converges.
        if epoch_id is None or cur_tbl.last_epoch(stream_id) < epoch_id:
            if re_current is not None:
                cur_tbl.replace_buckets(stale_buckets, re_current)
            cur_tbl.upsert_delta(
                as_sat(finals, F.lit(None).cast("timestamp")), summary=summary
            )
            _mark("upsert_delta")
            cur_tbl.compact_deltas(
                int(os.environ.get("DVX_SAT_DELTA_COMPACT", "8"))
            )
        _mark("compact_deltas")
        if _prof:
            deltas = {b: round(tb - ta, 2) for (_, ta), (b, tb) in zip(_marks, _marks[1:])}
            print(f"DVX_PROFILE_SAT {deltas}", flush=True)
    finally:
        for d in (spill_j,):
            if d:
                _shutil.rmtree(d, ignore_errors=True)


def apply_batch(
    vault: Vault,
    batch: DataFrame,
    epoch_id: int | None = None,
    stream_id: str = "default",
    salt_buckets: int = 32,
    collect_metrics: bool = False,
    parallel: bool = True,
    pit_dates: list[str] | None = None,
) -> dict:
    """Apply one changelog micro-batch to the vault (idempotent).

    The prepared batch is materialized ONCE as scratch parquet and feeds
    all four merges (the reference re-reads staging per entity; we
    don't). Parquet spill instead of ``persist()``: downstream consumers
    are column-disjoint (hubs/link read 3-5 narrow key columns, only the
    satellite reads ``text``), so column-pruned parquet reads do strictly
    less decompression than columnar-cache scans — and the block-manager
    eviction race under concurrent jobs at high core counts made cached
    replays bimodal (measured: identical profile runs at local[16]
    swinging 43s ↔ 172s wall / 470 ↔ 2000 CPU-sec with persist(); spill
    reads are deterministic). The four table merges are independent, so
    they run as concurrent driver-thread jobs sharing the executors — the
    per-batch fixed overhead (scheduling, commit latency) overlaps
    instead of summing, which matters most for small/frequent
    micro-batches.

    ``collect_metrics`` additionally returns per-bucket row counts (one
    small agg on the spilled batch) for the lineage table.
    """
    import shutil as _shutil
    from concurrent.futures import ThreadPoolExecutor

    from dvx.evolve import evolve_for_batch

    import time as _time

    _prof = os.environ.get("DVX_PROFILE_BATCH") == "1"
    _t0 = _time.time()
    _pts: dict[str, float] = {}

    def _pmark(label: str) -> None:
        nonlocal _t0
        if _prof:
            _pts[label] = round(_time.time() - _t0, 2)
            _t0 = _time.time()

    desc_extras = evolve_for_batch(vault, batch)
    _pmark("evolve")
    # spills are scratch on tmpfs: snappy would cost CPU with no I/O to save
    spill = _spill_path(vault)
    pre = prepare_batch(batch, salt_buckets)
    pre.write.mode("overwrite").option("compression", "uncompressed").parquet(spill)
    prepared = vault.spark.read.schema(pre.schema).parquet(spill)
    _pmark("prepare_spill")
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
        _pmark("counts")

        sat_cols = [f.name for f in vault.sat_turn_text.schema().fields]
        tasks = [
            (
                vault.hub_conversation,
                prepared.select("conv_hash_key", "conv_id", "load_date", "record_source"),
                "conv_hash_key",
                ["conv_hash_key", "conv_id", "load_date", "record_source"],
            ),
            (
                vault.hub_turn,
                prepared.select(
                    "turn_hash_key", "conv_id", "turn_idx", "load_date", "record_source"
                ),
                "turn_hash_key",
                ["turn_hash_key", "conv_id", "turn_idx", "load_date", "record_source"],
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
                "link_hash_key",
                [
                    "link_hash_key",
                    "conv_hash_key",
                    "turn_hash_key",
                    "load_date",
                    "record_source",
                ],
            ),
        ]
        sat_src = prepared.select(
            *[c for c in sat_cols if c not in ("valid_from", "valid_to", "src_seq")],
            "ts",
            "seq",
            "_next_ts",
        )
        if parallel:
            # each merge thread gets its OWN fair-scheduler pool: with
            # spark.scheduler.mode=FAIR alone, all jobs land in the
            # default pool whose intra-pool scheduling is FIFO — an early
            # hub job would still hog every slot. Distinct on-demand pools
            # (default weight 1) round-robin slots across the four merges.
            sc = vault.spark.sparkContext

            def _pooled(pool: str, fn, *args):
                sc.setLocalProperty("spark.scheduler.pool", pool)
                try:
                    return fn(*args)
                finally:
                    sc.setLocalProperty("spark.scheduler.pool", None)

            with ThreadPoolExecutor(max_workers=4) as ex:
                futs = [
                    ex.submit(
                        _pooled, f"dvx_merge_{i}",
                        _insert_new_keys, tbl, src, key, cols, epoch_id, stream_id, summary
                    )
                    for i, (tbl, src, key, cols) in enumerate(tasks)
                ]
                futs.append(
                    ex.submit(
                        _pooled, "dvx_merge_sat",
                        _apply_satellite, vault, sat_src, epoch_id, stream_id, summary
                    )
                )
                for f in futs:
                    f.result()
            _pmark("merges")
        else:
            for tbl, src, key, cols in tasks:
                _insert_new_keys(tbl, src, key, cols, epoch_id, stream_id, summary)
            _apply_satellite(vault, sat_src, epoch_id, stream_id, summary)
        if pit_dates:
            # maintain PIT snapshots incrementally while the prepared batch
            # (with its already-computed hash keys) is still cached — no
            # second Arrow hashing pass over the raw batch
            from dvx.pit import build_pit_incremental

            touched_keys = prepared.select("turn_hash_key").distinct()
            for d in pit_dates:
                build_pit_incremental(vault, d, touched_keys)
        if pit_dates:
            _pmark("pit_incr")
        if _prof:
            print(f"DVX_PROFILE_BATCH {_pts}", flush=True)
        return {"events": n, "extras": desc_extras, "bucket_counts": bucket_counts}
    finally:
        _shutil.rmtree(spill, ignore_errors=True)
