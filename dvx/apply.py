"""Core CDC batch apply: changelog micro-batch -> hub / link / sat merges.

Re-expresses the reference's RawVaultETL load semantics (SURVEY.md §3.1)
with the *intended* behavior (proper SCD2 end-dating — the reference's
UPDATE is broken, RawVaultETL.scala:1032-1078; ours folds end-dating and
insertion into one commit), driven by a declarative entity registry
(dvx.entities) instead of the reference's per-entity copy-paste
(RawVaultETL.scala:176-224, 243-367, 413-520, 700-800):

1. vectorized-UDF hashing (every hub/link business key + every
   satellite's hash-diff fused in ONE Arrow pass),
2. deterministic dedup of exact redeliveries and (ts, seq) ties at the
   version grain (min attr struct — replays must byte-match even on
   anomalous inputs),
3. hub/link merges = insert-only anti-join on hash key (J1,
   RawVaultETL.scala:204-205),
4. per-satellite SCD2 apply over a bounded CURRENT table + append-only
   HISTORY: the batch chains per key on the satellite's OWN hash-diff
   (consecutive duplicates collapse), displaced versions are end-dated
   into history, the batch-final version upserts into current as a
   merge-on-read delta; stale (out-of-order) arrivals trigger a
   per-bucket re-chain that splices them into history (one-shot
   semantics, nothing lost); deletes are tombstone versions.

Scale notes
-----------
- Hash computation is Arrow-vectorized (dvx.hashing.registry_hashes)
  and fully fused: all business keys + every satellite's hash-diff in
  ONE Arrow round trip.
- The SCD2 decision logic runs on narrow (key, ts, seq, hash_diff)
  rows; full-width transcript rows never sort or shuffle through the
  chain — they are recovered per output by an anti-join against the
  (tiny, AQE-broadcast) dropped set.
- Hot-conversation skew: the chain window partitions by the satellite
  parent key (one turn) — a hot conversation's events spread across its
  turns, so no single task holds a whole hot conversation, only one
  turn's version run (bounded by the per-turn edit count). The rows
  that flow through that window are the narrow ~100B decision columns,
  so even a pathological single-turn run is cheap to sort.
- Current-table writes are merge-on-read deltas (dvx.lake.upsert_delta):
  per-batch write IO is O(changed rows), never O(touched buckets).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dvx.entities import DEFAULT_REGISTRY, EntityRegistry, SatelliteSpec
from dvx.hashing import registry_hashes
from dvx.lake import BUCKET_COL
from dvx.schema import CHANGELOG_SCHEMA, RECORD_SOURCE, Vault

_ENVELOPE = {f.name for f in CHANGELOG_SCHEMA.fields}


def descriptive_cols_of(df: DataFrame) -> list[str]:
    """Additive-evolution extras present in the batch (the reference's
    intersection pattern, RawVaultETL.scala:250-309)."""
    return sorted(c for c in df.columns if c not in _ENVELOPE and not c.startswith("_"))


def prepare_batch(df: DataFrame, registry: EntityRegistry | None = None) -> DataFrame:
    """Dedup + hash enrichment of one changelog micro-batch.

    Emits one row per (version grain, ts, seq) carrying every hub/link
    hash key and every satellite's hash-diff. Exact redeliveries (same
    grain, ts, seq, content) collapse in the dedup agg; distinct-content
    ties on (ts, seq) — an ingest-contract violation — resolve
    DETERMINISTICALLY to the min attr struct, so replays byte-match even
    on anomalous inputs. Per-satellite version chaining happens inside
    each satellite's apply (each chains on its own diff).
    """
    registry = registry or DEFAULT_REGISTRY
    extras = descriptive_cols_of(df)
    grain = list(registry.version_grain())
    # Redistribute on the version grain BEFORE the Arrow hash UDFs. A
    # micro-batch often arrives as one file (= 1-3 scan tasks), and
    # ArrowEval runs in the scan stage — without this, MD5 hashing of
    # millions of rows is pinned to those few Python workers regardless
    # of cluster size (measured: replay throughput flat from local[4] to
    # local[32]). The dedup agg below groups on a superset of the grain,
    # so Catalyst reuses the exchange — one shuffle total, and the UDFs
    # run at full width. Measured (synth100000, 4 micro-batches):
    # without this, 16 cores run SLOWER than 4 (14.2k vs 19.7k ev/s);
    # with it, 16 cores win (22.0k vs 16.8k).
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    df = df.repartition(n_part, *grain)
    others = [c for c in df.columns if c not in (*grain, "ts", "seq")]
    deduped = (
        df.groupBy(*grain, "ts", "seq")
        .agg(F.min(F.struct(*[F.col(c) for c in others])).alias("_r"))
        .select(*grain, "ts", "seq", "_r.*")
    )
    is_del = F.when(F.col("op") == "D", F.lit("Y")).cast("string")
    sat_diff_cols = {
        s.name: [*s.attrs, *(extras if s.dynamic_extras else []), "is_deleted"]
        for s in registry.satellites
    }
    return (
        deduped.withColumn("is_deleted", is_del)
        .withColumn("_keys", registry_hashes(registry, sat_diff_cols))
        .select("*", "_keys.*")
        .drop("_keys")
        .withColumn("load_date", F.date_format("ts", "yyyy-MM-dd"))
        .withColumn("record_source", F.lit(RECORD_SOURCE))
    )


def _spill_path(vault: Vault) -> str:
    """Scratch dir for intra-batch spills, colocated with Spark's own
    shuffle scratch (tmpfs when available, dvx.session._scratch_dir)."""
    import uuid

    base = vault.spark.conf.get("spark.local.dir", "/tmp").split(",")[0]
    return os.path.join(base, "dvx_spill", uuid.uuid4().hex)


def _bloom_scan(
    prepared: DataFrame, specs: list[tuple[str, object, str]]
) -> dict[str, dict[int, tuple[int, bytes, int]]]:
    """ONE shuffle-keyed job serving every bloom-enabled key table of the
    batch: per (table, bucket), test the batch keys against the bucket's
    existing bloom segments, build this batch's new segment, and count
    rows. Returns ``{table: {bucket: (possible_hits, segment, rows)}}``.

    Fusing the tables into a single applyInPandas pass matters because
    each extra Spark job is per-batch fixed floor (~0.3-0.5 s at 16
    cores): this one job replaces three per-table scans AND the
    per-bucket lineage counts agg AND the per-table touched-bucket
    distinct-collects (its group keys are exactly the touched buckets).
    Executors read segment files straight from the table directory — no
    bitmap broadcast through the driver. A bucket without complete bloom
    coverage reports all keys as possible hits (= must read)."""
    from functools import reduce

    import pandas as pd

    from dvx import bloom as _bloom

    info = {}
    frames = []
    for name, tbl, key in specs:
        m = tbl.snapshot()
        if m["bucket_cols"] != [key]:  # scan recomputes the bucket fn inline
            raise ValueError(
                f"{name}: bloom scan requires bucket_cols == [{key}], "
                f"got {m['bucket_cols']}"
            )
        info[name] = (
            tbl.bloom_paths(),
            {int(k) for k in (set(m["files"]) | set(m.get("deltas", {}))) if k.isdigit()},
        )
        frames.append(
            prepared.select(
                F.lit(name).alias("_t"),
                F.col(key).alias("_k"),
                F.pmod(F.xxhash64(F.col(key)), F.lit(m["num_buckets"]))
                .cast("int")
                .alias("_b"),
            )
        )
    allk = reduce(lambda a, b: a.unionByName(b), frames)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        name = pdf["_t"].iloc[0]
        b = int(pdf["_b"].iloc[0])
        seg_paths, with_files = info[name]
        uniq = pdf["_k"].drop_duplicates().tolist()
        if b in seg_paths:
            segs = []
            for p in seg_paths[b]:
                with open(p, "rb") as f:
                    segs.append(f.read())
            hits = int(_bloom.contains_any(segs, uniq).sum())
        elif b in with_files:
            hits = len(uniq)  # no coverage: must read the plain way
        else:
            hits = 0  # bucket has no data at all
        return pd.DataFrame(
            [{"t": name, "bucket": b, "hits": hits, "cnt": len(pdf),
              "segment": _bloom.build(uniq)}]
        )

    rows = (
        allk.groupBy("_t", "_b")
        .applyInPandas(fn, "t string, bucket int, hits long, cnt long, segment binary")
        .collect()
    )
    out: dict[str, dict[int, tuple[int, bytes, int]]] = {n: {} for n, _, _ in specs}
    for r in rows:
        out[r.t][r.bucket] = (r.hits, bytes(r.segment), r.cnt)
    return out


def _insert_new_keys(
    tbl,
    src: DataFrame,
    key: str,
    select_cols: list[str],
    epoch_id: int | None,
    stream_id: str,
    summary: dict | None,
    touched: list[int] | None = None,
    scan: dict[int, tuple[int, bytes, int]] | None = None,
) -> None:
    """Insert-only hub/link apply as an anti-join + APPEND.

    Hubs and links never update, so COW-rewriting their touched buckets
    every batch is pure write amplification — O(table) per batch once
    batches spread across all buckets. This path reads only the key
    column of the touched buckets (parquet column pruning), anti-joins
    (J1, RawVaultETL.scala:204-205), and appends just the new rows:
    write IO is O(new keys). Appends are not naturally idempotent, so
    the table's epoch watermark guards re-delivered batches (the same
    handshake the satellite history table uses).

    When the table carries key blooms (dvx.bloom; hubs/links by
    default), the existence read is first PRUNED to the buckets whose
    blooms report a possible hit — a batch of brand-new keys reads
    (almost) no existing data — and the scan's per-bucket segments ride
    along into the append commit, keeping coverage complete.
    ``scan`` is the table's slice of apply_batch's fused
    :func:`_bloom_scan` (standalone callers compute their own); disable
    wholesale with DVX_KEY_BLOOM=0 (A/B lever)."""
    if epoch_id is not None and tbl.last_epoch(stream_id) >= epoch_id:
        return
    others = [c for c in select_cols if c != key]
    src_b = tbl.with_bucket(src)
    if scan is None and (
        os.environ.get("DVX_KEY_BLOOM", "1") != "0" and tbl.bloom_enabled()
    ):
        scan = _bloom_scan(src, [("t", tbl, key)])["t"]
    if touched is None:
        touched = sorted(scan) if scan is not None else sorted(
            r[0] for r in src_b.select(BUCKET_COL).distinct().collect()
        )
    if not touched:
        return
    segments = None
    candidates = touched
    if scan is not None:
        candidates = sorted(b for b, (hits, _, _) in scan.items() if hits)
        segments = {str(b): seg for b, (_, seg, _) in scan.items()}
    src_rows = (
        src_b.groupBy(key, BUCKET_COL)
        .agg(F.min(F.struct(*[F.col(c) for c in others])).alias("_s"))
        .select(key, "_s.*", BUCKET_COL)
    )
    if candidates:
        existing = tbl.read(buckets=candidates).select(key)
        new = src_rows.join(existing, key, "left_anti")
    else:
        new = src_rows  # every batch key is provably absent
    tbl.append(new, summary=summary, bloom_segments=segments)


def _apply_satellite(
    vault: Vault,
    spec: SatelliteSpec,
    prepared: DataFrame,
    epoch_id: int | None,
    stream_id: str,
    summary: dict | None,
    touched: list[int] | None = None,
) -> None:
    """One satellite's SCD2 apply over its current/history split.

    Semantics (reference's *intended* end-dating, RawVaultETL.scala
    1032-1078 fixed), per version of THIS satellite's hash-diff:

    - The batch chains per key in (ts, seq) order; rows whose diff equals
      the immediately preceding row's collapse (consecutive-duplicate
      removal — equivalent to comparing against the previous surviving
      version, since dropped rows share their predecessor's diff).
    - FRESH surviving rows (strictly newer than the stored current by
      (ts, seq)): the no-op guard drops the batch's earliest surviving
      version if it matches the stored current hash_diff (P5 change
      filter, RawVaultETL.scala:340-346); non-final chain versions +
      displaced old current rows append to the HISTORY table (guarded by
      its epoch watermark); the batch-final version per key upserts into
      CURRENT as a merge-on-read delta (O(changed rows) write IO).
    - EQUAL rows (same (ts, seq) as the stored current): exact
      redeliveries — dropped, idempotent.
    - STALE rows (strictly older than the stored current): out-of-order
      arrivals. Every bucket containing one is re-chained from scratch:
      union(history ∪ current ∪ incoming) for that bucket, dedup on
      (key, ts, seq), re-collapse consecutive duplicate hash_diffs,
      recompute valid_from/valid_to — the one-shot oracle semantics for
      O(stale buckets) only. The re-chain is a pure function of (stored
      state ∪ batch), so crash-replay at any point converges.

    Crash ordering: history appends first (epoch-guarded); the
    stale-bucket current replacement carries NO epoch mark — only the
    final delta commit does — so a crash anywhere in between re-runs
    the whole satellite apply, which converges.
    """
    from pyspark.sql.window import Window

    import shutil as _shutil

    import time as _time

    _prof = os.environ.get("DVX_PROFILE_SAT") == "1"
    _marks: list[tuple[str, float]] = [("start", _time.time())]

    def _mark(label: str) -> None:
        if _prof:
            _marks.append((label, _time.time()))

    key = spec.parent_key
    cur_tbl = vault.table(spec.name)
    hist_tbl = vault.table(spec.hist_name)
    sat_fields = cur_tbl.schema().fields
    sat_cols = [f.name for f in sat_fields]
    types = {f.name: f.dataType for f in sat_fields}

    # project the prepared batch onto this satellite's surface: its own
    # diff column becomes hash_diff; schema attrs missing from the batch
    # (evolved columns absent this epoch) null-fill
    proj = []
    for c in sat_cols:
        if c == "hash_diff":
            proj.append(F.col(spec.diff_col).alias("hash_diff"))
        elif c in ("valid_from", "valid_to", "src_seq"):
            continue
        elif c in prepared.columns:
            proj.append(F.col(c))
        else:
            proj.append(F.lit(None).cast(types[c]).alias(c))
    # no extra cache here: src projects the spilled prepared batch, and
    # every extra multi-million-row block-manager cache serializes on the
    # memory store at high core counts (measured: 3 caches alive made the
    # satellite block 4x slower at local[32] than local[8])
    src = cur_tbl.with_bucket(prepared.select(*proj, "ts", "seq"))
    spill_j = None
    spill_r = None
    try:
        if touched is None:
            touched = sorted(r[0] for r in src.select(BUCKET_COL).distinct().collect())
        _mark("touched_collect")
        if not touched:
            return

        # the decisions pass needs only the version columns of current —
        # and only for keys THE BATCH CARRIES: a column-pruned,
        # key-filtered read keeps the MOR last-wins agg off `text` AND
        # off every key the batch doesn't mention, so this read (and the
        # decisions join below, whose build side it is) stays O(batch)
        # as the table grows instead of O(touched buckets' live keys)
        cur_live = cur_tbl.read(
            buckets=touched, columns=[key, "hash_diff", "valid_from", "src_seq"],
            key_filter=src.select(key),
        ).select(
            F.col(key),
            F.col("hash_diff").alias("_cur_diff"),
            F.col("valid_from").alias("_cur_vf"),
            F.col("src_seq").alias("_cur_seq"),
        )
        stale = F.col("_cur_diff").isNotNull() & (
            (F.col("ts") < F.col("_cur_vf"))
            | ((F.col("ts") == F.col("_cur_vf")) & (F.col("seq") < F.col("_cur_seq")))
        )
        # NARROW chain: the whole versioning decision (in-batch chain,
        # stale detection, fresh filter, no-op guard) needs only key/ts/
        # seq/hash_diff — ~100B/row. Running it narrow keeps `text` (the
        # bulk of a transcript row) out of the chain's shuffles and
        # spills; full rows are re-fetched per output by anti-joins
        # against the (tiny) dropped sets. The cur_live join shuffles on
        # `key` and every window needs exactly that clustering, so join
        # + chain + flags are ONE job — all decisions land in a single
        # narrow spill.
        src_n = src.select(key, "ts", "seq", "hash_diff", BUCKET_COL)
        fresh = (
            F.col("_cur_diff").isNull()
            | (F.col("ts") > F.col("_cur_vf"))
            | ((F.col("ts") == F.col("_cur_vf")) & (F.col("seq") > F.col("_cur_seq")))
        )
        w = Window.partitionBy(key).orderBy("ts", "seq")
        pd_ = F.lag("hash_diff").over(w)
        surv = pd_.isNull() | (pd_ != F.col("hash_diff"))
        joined = (
            src_n.join(cur_live, key, "left")
            .withColumn("_surv", surv)
            .withColumn("_fresh", fresh)
            .withColumn("_stale", stale)
            .withColumn("_eq_cur", F.col("_cur_diff") == F.col("hash_diff"))
        )
        # running count of surviving fresh rows per key: the first one
        # (the candidate the no-op guard compares to stored current) has
        # _fidx == 1. _next_ts = ts of the NEXT surviving version (an
        # unbounded-following frame over the same sort — no new shuffle).
        fidx = F.sum((F.col("_fresh") & F.col("_surv")).cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        nxt = F.min(F.when(F.col("_surv"), F.col("ts"))).over(
            w.rowsBetween(1, Window.unboundedFollowing)
        )
        noop = (
            F.col("_surv")
            & F.col("_fresh")
            & (fidx == 1)
            & F.col("_eq_cur").isNotNull()
            & F.col("_eq_cur")
        )
        decisions = joined.select(
            key,
            "ts",
            "seq",
            BUCKET_COL,
            # int-typed so the spill's hive-style partition value ("0"/"1")
            # round-trips with a stable inferred type
            F.col("_stale").cast("int").alias("_stale"),
            (F.col("_surv") & F.col("_fresh") & ~noop).alias("_win"),
            nxt.alias("_next_ts"),
        )
        spill_j = _spill_path(vault)
        # spill PARTITIONED by the stale flag: whether any out-of-order
        # row exists — and which buckets hold them — is then a driver-side
        # listdir + a partition-pruned read of the (rare) _stale=1 slice,
        # not a full extra Spark job over the decisions every batch. In
        # the near-ordered steady state (_stale=1 absent) the stale check
        # costs ZERO jobs — one fewer sequential job on the satellite
        # critical path (guide §2.4 / §1.2: per-batch fixed floor).
        dec_schema = decisions.schema
        decisions.write.mode("overwrite").option(
            "compression", "snappy"
        ).partitionBy("_stale").parquet(spill_j)
        _mark("spill_decisions")
        # explicit schema: the spill's shape is known, so the re-read
        # skips the per-batch driver-side footer/partition inference job
        decisions = vault.spark.read.schema(dec_schema).parquet(spill_j)

        if os.path.isdir(os.path.join(spill_j, "_stale=1")):
            stale_buckets = sorted(
                r[0]
                for r in decisions.filter("_stale = 1")
                .select(BUCKET_COL)
                .distinct()
                .collect()
            )
        else:
            stale_buckets = []
        _mark("stale_collect")

        # Staleness is KEY-granular: windows are per key, so only the
        # keys that actually received an out-of-order row re-chain —
        # every other key in the same bucket stays on the fast path.
        # (Bucket-granular staleness re-chained whole buckets: ONE
        # straggler event forced a dedup+window recompute over every
        # key's full history in its bucket.) The anti-joins below are
        # free when no stale rows exist, and broadcast-sized otherwise
        # (stale keys are narrow and rare in a near-ordered stream).
        stale_keys = decisions.filter("_stale = 1").select(key).distinct()

        def anti_stale(df: DataFrame) -> DataFrame:
            return df.join(stale_keys, key, "left_anti") if stale_buckets else df

        winners_n = anti_stale(decisions.filter(F.col("_win")))
        # full winner rows = src MINUS the dropped set. In steady state
        # almost every batch row survives (drops = redeliveries, chain
        # collapses, stale rows, the no-op guard), so the dropped set is
        # tiny — the anti-join broadcasts under AQE and the full-text src
        # rows never shuffle or sort on this path. Likewise the non-final
        # (intermediate) versions are the rare within-batch supersedes,
        # so recovering their full rows is a broadcast-sized inner join.
        src_fast = anti_stale(src)
        dropped_n = anti_stale(decisions.filter(~F.col("_win"))).select(
            key, "ts", "seq"
        )
        inter_n = winners_n.filter(F.col("_next_ts").isNotNull()).select(
            key, "ts", "seq", "_next_ts"
        )

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
        intermediates = src_fast.join(inter_n, [key, "ts", "seq"], "inner")
        finals = src_fast.join(
            dropped_n.unionByName(inter_n.select(key, "ts", "seq")),
            [key, "ts", "seq"],
            "left_anti",
        )

        # shuffle_hash hint: enders is a narrow key set — hashing it beats
        # sort-merge, which would sort the full-text cur rows. Stale keys
        # never appear in enders (winners_n excludes them), so the inner
        # join needs no extra stale filter on the cur side.
        enders = winners_n.groupBy(key).agg(F.min("ts").alias("_end_ts")).hint(
            "shuffle_hash"
        )
        # full current rows are needed ONLY for the displaced set (keys
        # whose stored version gets end-dated into history) — key_filter
        # prunes the full-text MOR merge to those keys BEFORE it runs, so
        # the displaced read is O(updated keys), not O(touched buckets).
        # enders derives from the spilled decisions parquet, so this does
        # not recompute the chain.
        cur = cur_tbl.with_bucket(
            cur_tbl.read(buckets=touched, key_filter=enders.select(key))
        )
        displaced = (
            cur.join(enders, key, "inner")
            .withColumn("valid_to", F.col("_end_ts"))
            .select(*sat_cols, BUCKET_COL)
        )
        hist_rows = as_sat(
            intermediates, F.col("_next_ts").cast("timestamp")
        ).unionByName(displaced)

        do_hist = epoch_id is None or hist_tbl.last_epoch(stream_id) < epoch_id
        do_cur = epoch_id is None or cur_tbl.last_epoch(stream_id) < epoch_id

        if not stale_buckets and do_hist and do_cur:
            # ---- fast-path write overlap ----
            # history and current are INDEPENDENT tables, but their
            # commits must stay ordered: displaced rows must reach
            # history before current advances, or a crash between the
            # two commits loses the old version entirely (it is no
            # longer in current and never reached history — the re-run
            # would classify the batch rows stale and re-chain from
            # state that no longer contains it). So: run both multi-
            # second WRITE jobs concurrently on the executors
            # (lake.stage_write), then publish the two metadata commits
            # strictly history-first. Crash windows collapse to the
            # sequential path's: before hist commit = nothing published;
            # between commits = the already-safe state.
            from concurrent.futures import ThreadPoolExecutor as _TPE

            from dvx.lake import CommitConflict

            delta_rows = as_sat(finals, F.lit(None).cast("timestamp"))
            sc = vault.spark.sparkContext

            def _staged(pool: str, tbl, frame):
                # scheduler-pool localProperty is per python thread
                sc.setLocalProperty("spark.scheduler.pool", pool)
                try:
                    return tbl.stage_write(frame)
                finally:
                    sc.setLocalProperty("spark.scheduler.pool", None)

            with _TPE(max_workers=2) as ex2:
                # both staged writes ARE the critical path — keep them in
                # the weighted pool (intra-pool FAIR shares between them)
                fh = ex2.submit(_staged, "dvx_critical", hist_tbl, hist_rows)
                fd = ex2.submit(_staged, "dvx_critical", cur_tbl, delta_rows)
                sh, sd = fh.result(), fd.result()
            try:
                hist_tbl.commit_staged(sh, "append", summary=summary)
            except CommitConflict:  # external writer moved the table
                cur_tbl._drop_attempt(sd["commit_rel"])
                sd = None
                hist_tbl.append(hist_rows, summary=summary)
            _mark("hist_append")
            if sd is not None:
                try:
                    cur_tbl.commit_staged(sd, "upsert_delta", summary=summary)
                except CommitConflict:
                    cur_tbl.upsert_delta(delta_rows, summary=summary)
            else:
                cur_tbl.upsert_delta(delta_rows, summary=summary)
            _mark("upsert_delta")
            cur_tbl.compact_deltas(
                int(os.environ.get("DVX_SAT_DELTA_COMPACT", "8"))
            )
            _mark("compact_deltas")
            if _prof:
                deltas = {
                    b: round(tb - ta, 2)
                    for (_, ta), (b, tb) in zip(_marks, _marks[1:])
                }
                print(f"DVX_PROFILE_SAT {spec.name} {deltas}", flush=True)
            return

        # ---- sequential path (stale re-chain, or partial epoch replay) ----
        # history append first: if we crash before the current commit, the
        # re-run recomputes the same displaced/intermediate rows (current
        # is unchanged) and the epoch guard skips the duplicate append
        if do_hist:
            hist_tbl.append(hist_rows, summary=summary)
        _mark("hist_append")

        re_current = None

        # ---- re-chain path (KEYS that received out-of-order rows) ----
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

            inc_re = src.join(stale_keys, key, "left_semi").select(
                F.col(key), "ts", "seq", *attr_cols, F.col(BUCKET_COL)
            )
            # equality-delete splice (default): history write IO for the
            # re-chain is O(stale keys' versions) — a per-key tombstone +
            # append in one atomic commit (lake.delete_keys_insert) —
            # instead of rewriting every stale BUCKET (O(touched
            # buckets) read+write per stale batch; guide §1.2: the
            # distributed algorithm first). DVX_HIST_EQ_DELETE=0 falls
            # back to the bucket-rewrite path (A/B lever).
            use_eq = os.environ.get("DVX_HIST_EQ_DELETE", "1") != "0"
            hist_stale = None
            if use_eq:
                # key-filtered read: the re-chain consumes only the stale
                # keys' history — no full-bucket passthrough needed when
                # nothing is rewritten
                hist_re = as_version(
                    hist_tbl.with_bucket(
                        hist_tbl.read(buckets=stale_buckets, key_filter=stale_keys)
                    )
                )
            else:
                # read only the stale buckets (manifest file pruning),
                # then restrict to the stale KEYS: the expensive dedup +
                # window recompute below runs over O(stale keys'
                # history), not the whole bucket's
                hist_stale = hist_tbl.with_bucket(
                    hist_tbl.read(buckets=stale_buckets)
                )
                hist_re = as_version(hist_stale.join(stale_keys, key, "left_semi"))
            # key_filter pushes the stale-key semi below the MOR merge:
            # the re-chain's current read pays the last-wins agg over the
            # stale KEYS' rows only (hist_stale stays a full-bucket read —
            # its untouched keys pass through into new_hist)
            cur_re = as_version(
                cur_tbl.with_bucket(
                    cur_tbl.read(buckets=stale_buckets, key_filter=stale_keys)
                )
            )
            # dedup redeliveries on (key, ts, seq) with a deterministic
            # attr pick, then re-collapse consecutive duplicate diffs and
            # recompute the valid_from/valid_to chain — the one-shot
            # semantics over everything ever seen for these keys
            # repartition on the key FIRST: HashPartitioning(key) is a
            # subset of the dedup agg's grouping cols, so the agg reuses
            # this exchange, and the chain windows below (partitionBy
            # key) need only a sort — the full-text version rows cross
            # ONE exchange instead of two (guide §2.4: two operations
            # keyed the same way share one exchange)
            n_part = int(
                vault.spark.conf.get("spark.sql.shuffle.partitions", "32")
            )
            allv = (
                inc_re.unionByName(hist_re)
                .unionByName(cur_re)
                .repartition(n_part, F.col(key))
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
            # spill the re-chained versions ONCE: re_sat feeds BOTH the
            # history bucket rewrite and the current-table delta below —
            # without the spill each write job recomputes the whole
            # re-chain (two table reads + MOR merge + dedup agg + two
            # windows) from scratch (guide §1.2: don't compute things
            # twice; §5 localCheckpoint/materialize shared subtrees)
            spill_r = _spill_path(vault)
            re_schema = re_sat.schema
            re_sat.write.mode("overwrite").option(
                "compression", "snappy"
            ).parquet(spill_r)
            re_sat = vault.spark.read.schema(re_schema).parquet(spill_r)
            _mark("rechain_spill")
            if use_eq:
                # atomic splice: tombstone the stale keys' old history
                # rows, append their re-chained ended versions. Re-running
                # converges — the newer tombstone also covers the previous
                # attempt's inserts.
                hist_tbl.delete_keys_insert(
                    stale_keys,
                    re_sat.filter(F.col("valid_to").isNotNull()),
                    summary=summary,
                )
            else:
                # history bucket rewrite: untouched keys pass through
                # unmodified (one anti-join, no recompute); stale keys get
                # their re-chained ended versions
                new_hist = (
                    hist_stale.select(*sat_cols, BUCKET_COL)
                    .join(stale_keys, key, "left_anti")
                    .unionByName(re_sat.filter(F.col("valid_to").isNotNull()))
                )
                hist_tbl.replace_buckets(stale_buckets, new_hist, summary=summary)
            _mark("hist_splice")
            re_current = re_sat.filter(F.col("valid_to").isNull())

        # ---- current-table apply: merge-on-read ----
        # Only the CHANGED rows are written: the batch-final version per
        # displaced/new key — and the re-chained current row per stale
        # key (one row per key, disjoint from finals) — go into
        # per-bucket DELTA files (lake.upsert_delta, last-wins-merged at
        # read time); unchanged current rows are never rewritten.
        # compact_deltas folds them back every DVX_SAT_DELTA_COMPACT
        # commits per bucket, so the amortized rewrite is
        # O(bucket / threshold) per batch.
        if do_cur:
            delta_rows = as_sat(finals, F.lit(None).cast("timestamp"))
            if re_current is not None:
                delta_rows = delta_rows.unionByName(re_current)
            cur_tbl.upsert_delta(delta_rows, summary=summary)
            _mark("upsert_delta")
            cur_tbl.compact_deltas(
                int(os.environ.get("DVX_SAT_DELTA_COMPACT", "8"))
            )
        _mark("compact_deltas")
        if _prof:
            deltas = {b: round(tb - ta, 2) for (_, ta), (b, tb) in zip(_marks, _marks[1:])}
            print(f"DVX_PROFILE_SAT {spec.name} {deltas}", flush=True)
    finally:
        for d in (spill_j, spill_r):
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
    every merge (the reference re-reads staging per entity; we don't).
    Parquet spill instead of ``persist()``: downstream consumers are
    column-disjoint (hubs/link read 3-5 narrow key columns, only a text
    satellite reads ``text``), so column-pruned parquet reads do
    strictly less decompression than columnar-cache scans — and the
    block-manager eviction race under concurrent jobs at high core
    counts made cached replays bimodal (measured: identical profile runs
    at local[16] swinging 43s ↔ 172s wall / 470 ↔ 2000 CPU-sec with
    persist(); spill reads are deterministic). The table merges are
    independent, so they run as concurrent driver-thread jobs (each in
    its own fair-scheduler pool) sharing the executors — the per-batch
    fixed overhead (scheduling, commit latency) overlaps instead of
    summing, which matters most for small/frequent micro-batches.

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

    registry = vault.registry
    desc_extras = evolve_for_batch(vault, batch)
    _pmark("evolve")
    # snappy spills even on tmpfs scratch: transcript text compresses 3-4x,
    # and tmpfs "IO" is kernel memcpy, so fewer bytes = less sys-CPU (16c
    # A/B 2026-08-17: prepare stage 27.2s -> 17.4s, kernel CPU 128 -> 12s)
    spill = _spill_path(vault)
    pre = prepare_batch(batch, registry)
    pre.write.mode("overwrite").option("compression", "snappy").parquet(spill)
    prepared = vault.spark.read.schema(pre.schema).parquet(spill)
    _pmark("prepare_spill")
    try:
        summary = {"epochs": {stream_id: epoch_id}} if epoch_id is not None else None

        first_sat = registry.satellites[0] if registry.satellites else None
        bucket_counts: list[tuple[int, int]] = []
        n = None

        # ONE fused scan job for every bloom-enabled key table: bloom
        # prune + this batch's segments, replacing per-table scans —
        # each extra Spark job is pure per-batch fixed floor.
        scan_specs = [
            (h.name, vault.table(h.name), h.hash_key) for h in registry.hubs
        ] + [
            (l.name, vault.table(l.name), l.hash_key) for l in registry.links
        ]
        use_bloom = os.environ.get("DVX_KEY_BLOOM", "1") != "0"
        bloomed = [
            (nm, t, k) for nm, t, k in scan_specs if use_bloom and t.bloom_enabled()
        ]

        audit = ["load_date", "record_source"]
        tasks = []
        for h in registry.hubs:
            cols = [h.hash_key, *h.business_keys, *audit]
            tasks.append((vault.table(h.name), h.name, h.hash_key, cols))
        for l in registry.links:
            cols = [l.hash_key, *l.parents, *audit]
            tasks.append((vault.table(l.name), l.name, l.hash_key, cols))

        def _count_buckets() -> list[tuple[int, int]]:
            # per-bucket row counts on the first satellite's bucket
            # function — serves the lineage metrics AND the satellite /
            # same-key hub touched-bucket lists in ONE narrow job
            bucketed = vault.table(first_sat.name).with_bucket(
                prepared.select(first_sat.parent_key)
            )
            return sorted(
                (r[0], r[1])
                for r in bucketed.groupBy(BUCKET_COL).count().collect()
            )

        if parallel:
            # each merge thread gets its OWN fair-scheduler pool: with
            # spark.scheduler.mode=FAIR alone, all jobs land in the
            # default pool whose intra-pool scheduling is FIFO — an early
            # hub job would still hog every slot. Distinct on-demand pools
            # (default weight 1) round-robin slots across the merges.
            # The fused bloom scan and the bucket-count collect run as
            # concurrent pooled jobs too: the satellite applies (the
            # critical path) start as soon as the counts land (~sub-second
            # narrow agg) instead of waiting behind the multi-second scan
            # that only the hub/link inserts consume (guide §2.6 overlap).
            sc = vault.spark.sparkContext

            def _pooled(pool: str, label: str, fn, *args):
                sc.setLocalProperty("spark.scheduler.pool", pool)
                _tt0 = _time.time()
                try:
                    return fn(*args)
                finally:
                    if _prof:  # per-task walls (overlapping — attribution only)
                        _pts[f"t_{label}"] = round(_time.time() - _tt0, 2)
                    sc.setLocalProperty("spark.scheduler.pool", None)

            n_workers = 2 + len(tasks) + len(registry.satellites)
            with ThreadPoolExecutor(max_workers=n_workers) as ex:
                fut_scan = (
                    ex.submit(_pooled, "dvx_merge_scan", "scan", _bloom_scan,
                              prepared, bloomed)
                    if bloomed
                    else None
                )
                fut_counts = (
                    # the counts job GATES the satellite start — run it
                    # in the weighted critical pool so it never queues
                    # behind the scan/hub stages
                    ex.submit(_pooled, "dvx_critical", "counts",
                              _count_buckets)
                    if first_sat is not None
                    else None
                )

                def _run_sat(s):
                    touched = None
                    if fut_counts is not None and s.parent_key == first_sat.parent_key:
                        touched = [b for b, c in fut_counts.result() if c]
                    _apply_satellite(
                        vault, s, prepared, epoch_id, stream_id, summary, touched
                    )

                def _run_key_table(tbl, nm, key, cols):
                    scan = (
                        fut_scan.result().get(nm) if fut_scan is not None else None
                    )
                    touched = None
                    if (
                        scan is None
                        and fut_counts is not None
                        and key == first_sat.parent_key
                    ):
                        touched = [b for b, c in fut_counts.result() if c]
                    _insert_new_keys(
                        tbl, prepared.select(*cols), key, cols, epoch_id,
                        stream_id, summary, touched, scan
                    )

                futs = [
                    # the satellite applies are the critical path of the
                    # batch: the weighted `dvx_critical` pool (dvx.session
                    # _alloc_file) gives them most task slots; hub/link/
                    # scan backfill (guide §2.6)
                    ex.submit(_pooled, "dvx_critical", s.name, _run_sat, s)
                    for s in registry.satellites
                ]
                futs += [
                    ex.submit(
                        _pooled, f"dvx_merge_{os.path.basename(tbl.root)}",
                        os.path.basename(tbl.root), _run_key_table,
                        tbl, nm, key, cols
                    )
                    for tbl, nm, key, cols in tasks
                ]
                for f in futs:
                    f.result()
                if fut_counts is not None:
                    bucket_counts = fut_counts.result()
                    n = sum(c for _, c in bucket_counts)
                else:
                    n = prepared.count()
            _pmark("merges")
        else:
            scans = _bloom_scan(prepared, bloomed) if bloomed else {}
            if first_sat is not None:
                bucket_counts = _count_buckets()
                n = sum(c for _, c in bucket_counts)
            else:
                n = prepared.count()
            touched_list = [b for b, c in bucket_counts if c]
            for tbl, nm, key, cols in tasks:
                scan = scans.get(nm)
                touched = (
                    touched_list
                    if scan is None
                    and first_sat is not None
                    and key == first_sat.parent_key
                    else None
                )
                _insert_new_keys(
                    tbl, prepared.select(*cols), key, cols, epoch_id, stream_id,
                    summary, touched, scan
                )
            for s in registry.satellites:
                _apply_satellite(
                    vault, s, prepared, epoch_id, stream_id, summary,
                    touched_list if s.parent_key == first_sat.parent_key else None,
                )
        if pit_dates:
            # maintain PIT snapshots incrementally while the prepared batch
            # (with its already-computed hash keys) is still spilled — no
            # second Arrow hashing pass over the raw batch. The PIT is
            # built over the text satellite (dvx.pit), so resolve its
            # parent key from the registry rather than assuming a column.
            from dvx.pit import PIT_SATELLITE, build_pit_incremental

            pit_sats = [s for s in registry.satellites if s.name == PIT_SATELLITE]
            if not pit_sats:
                raise ValueError(
                    f"pit_dates maintenance requires the '{PIT_SATELLITE}' "
                    "satellite in the registry (dvx.pit builds the PIT over it); "
                    f"this registry has {[s.name for s in registry.satellites]}"
                )
            touched_keys = prepared.select(pit_sats[0].parent_key).distinct()
            for d in pit_dates:
                build_pit_incremental(vault, d, touched_keys)
        if pit_dates:
            _pmark("pit_incr")
        if _prof:
            print(f"DVX_PROFILE_BATCH {_pts}", flush=True)
        return {"events": n, "extras": desc_extras, "bucket_counts": bucket_counts}
    finally:
        _shutil.rmtree(spill, ignore_errors=True)
