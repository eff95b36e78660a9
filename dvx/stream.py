"""Structured Streaming ingestion: changelog tail -> vault, exactly-once.

The reference has no streaming (SURVEY.md §2.10) — NiFi polls
``updated_at`` and Spark batch-applies. This module is the north_rule's
re-expression: ``readStream`` over a binlog/WAL-style changelog directory
-> ``foreachBatch`` -> :func:`dvx.apply.apply_batch` (keyed COW MERGE),
with:

- **exactly-once**: each micro-batch's ``epoch_id`` is recorded in every
  table's snapshot summary; on restart, foreachBatch replays the last
  uncommitted batch and :func:`ingest_batch` skips entities whose tables
  already committed that epoch (the Iceberg snapshot-summary handshake —
  analog of the reference's anti-join idempotency J1, RawVaultETL.scala:
  204-205, but O(1) metadata instead of a join).
- **resume from checkpoint**: the standard Structured Streaming
  checkpointLocation contract; killed mid-replay runs continue.
- **per-partition lineage + metrics**: load_metadata rows per epoch and
  per bucket at every checkpoint (north_rule).

File-source note: the changelog directory is read with
``maxFilesPerTrigger`` so replay batch boundaries are deterministic per
file — tests inject restarts between files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dvx import metadata
from dvx.apply import apply_batch
from dvx.schema import CHANGELOG_SCHEMA, Vault

ENTITY = "transcript_changes"

#: sentinel token for the fail_after_batches test hook. The Python
#: exception TYPE does not survive the foreachBatch -> JVM ->
#: StreamingQueryException round trip — only the message text does — so
#: recognition is by this (collision-proof) token, not isinstance.
_INJECT_TOKEN = "dvx::injected-restart-failure::d41d8cd9"


class InjectedFailure(RuntimeError):
    """Raised by the ``fail_after_batches`` restart-test hook."""

    def __init__(self) -> None:
        super().__init__(_INJECT_TOKEN)


def ingest_batch(
    vault: Vault,
    batch: DataFrame,
    epoch_id: int,
    stream_id: str = "default",
    salt_buckets: int = 32,
    log_lineage: bool = True,
    pit_dates: list[str] | None = None,
) -> dict:
    """Apply one micro-batch exactly once.

    Epoch skip: every vault table commits the epoch in its snapshot
    summary inside apply_batch (the merges run as concurrent jobs). The
    batch is skipped only when ALL four tables have committed it; a crash
    that left the epoch partially applied re-runs it, which is safe —
    every merge is idempotent (anti-join inserts; SCD2 stale/no-op
    guards).

    ``pit_dates``: PIT snapshot dates to maintain incrementally per
    micro-batch (north_star: "PIT tables rebuilt incrementally per
    micro-batch") — only the keys this batch touched are recomputed
    (dvx.pit.build_pit_incremental). The rebuild derives purely from
    satellite state, so it is idempotent and needs no epoch guard.
    """
    applied = min(
        vault.table(t).last_epoch(stream_id)
        for t in vault.registry.table_names()
    )
    if applied >= epoch_id:
        if log_lineage:
            metadata.complete_load(
                vault, epoch_id, ENTITY, 0, 0, stream_id=stream_id, status="SKIPPED"
            )
        return {"skipped": True, "epoch": epoch_id}
    stats = apply_batch(
        vault,
        batch,
        epoch_id=epoch_id,
        stream_id=stream_id,
        salt_buckets=salt_buckets,
        collect_metrics=log_lineage,
        pit_dates=pit_dates,
    )
    if log_lineage:
        # ONE lineage append per epoch: per-bucket metric rows + the
        # COMPLETED row together (north_rule per-partition lineage, at a
        # single tiny write instead of three)
        metadata.log_epoch_lineage(
            vault,
            epoch_id,
            ENTITY,
            stats["bucket_counts"],
            records=stats["events"],
            stream_id=stream_id,
        )
    return {"skipped": False, "epoch": epoch_id, **stats}


def run_stream(
    vault: Vault,
    changelog_dir: str,
    checkpoint_dir: str,
    stream_id: str = "default",
    max_files_per_trigger: int = 1,
    salt_buckets: int = 32,
    fail_after_batches: int | None = None,
    log_lineage: bool = True,
    pit_dates: list[str] | None = None,
) -> int:
    """Tail a changelog directory and ingest until drained.

    ``fail_after_batches`` injects a crash after N foreachBatch commits —
    the restart-replay test harness (SURVEY.md §5 item 3). Returns the
    number of batches processed this run.
    """
    processed = {"n": 0}

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        if fail_after_batches is not None and processed["n"] >= fail_after_batches:
            raise InjectedFailure()
        ingest_batch(
            vault,
            batch_df,
            epoch_id,
            stream_id=stream_id,
            salt_buckets=salt_buckets,
            log_lineage=log_lineage,
            pit_dates=pit_dates,
        )
        processed["n"] += 1

    reader = (
        vault.spark.readStream.schema(CHANGELOG_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(changelog_dir)
    )
    q = (
        reader.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    injected = False
    stream_error = None
    try:
        q.awaitTermination()
    except Exception as e:
        # swallow ONLY the injected crash (matched by its sentinel token,
        # which Spark wraps in StreamingQueryException) — any other
        # failure in a fail_after_batches run is a real bug and must
        # propagate, or the restart test would "pass" while masking it
        injected = fail_after_batches is not None and _INJECT_TOKEN in str(e)
        if not injected:
            stream_error = e
            raise
    finally:
        if q.isActive:
            q.stop()
        # fold any remaining current-table deltas so serving reads revert
        # to plain scans with filter pushdown and column pruning
        # (mid-stream reads pay the merge-on-read agg; a drained table
        # should not). Runs in finally so a drained-but-errored run still
        # folds — compaction only reads the last COMMITTED snapshot, so
        # it is safe at any point. Skipped after the injected crash: the
        # restart tests examine the mid-stream state on purpose.
        if not injected:
            try:
                # independent tables: run the fold jobs concurrently on
                # the executors (same overlap pattern as apply_batch's
                # merges) — the drain fold is the largest single block of
                # replay wall outside the batches (bench/profile_floor)
                from concurrent.futures import ThreadPoolExecutor as _TPE

                sats = list(vault.registry.satellites)
                with _TPE(max_workers=max(1, 2 * len(sats))) as ex:
                    futs = [
                        ex.submit(
                            vault.table(s.name).compact_deltas, 1
                        )
                        for s in sats
                    ]
                    # fold equality-delete tombstones left by stale
                    # re-chains (lake.delete_keys_insert): history
                    # serving reads revert to plain scans with pushdown
                    futs += [
                        ex.submit(vault.table(s.hist_name).compact_tombstones)
                        for s in sats
                    ]
                    for f in futs:
                        f.result()
            except Exception as ce:
                # NOTE: sys.exc_info() inside this handler reports `ce`
                # itself, so it cannot detect a propagating stream error —
                # the explicit stream_error capture above does.
                if stream_error is not None:
                    # a real streaming exception is already propagating;
                    # raising from finally would REPLACE it and mask the
                    # root cause (often the same underlying fault) —
                    # log-and-suppress the compaction error instead
                    import sys as _sys

                    print(
                        "dvx: end-of-drain delta compaction failed while a "
                        f"streaming error is propagating (suppressed): {ce!r}",
                        file=_sys.stderr,
                    )
                else:
                    raise
    return processed["n"]


def write_changelog_files(changelog: DataFrame, out_dir: str, n_files: int) -> None:
    """Materialize a changelog as N seq-ordered parquet files (the
    deterministic micro-batch boundaries for replay tests/bench).

    The Structured Streaming file source orders files by modification
    time; parquet part files written in one job share an mtime, so tie
    order (and therefore batch order) would be nondeterministic — the
    round-1 flaky-PIT root cause. Stamp strictly increasing mtimes in
    part-file (= seq-range) order so replay order is deterministic."""
    import os as _os
    import time as _time

    (
        changelog.repartitionByRange(n_files, F.col("seq"))
        .sortWithinPartitions("seq")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    parts = sorted(f for f in _os.listdir(out_dir) if f.endswith(".parquet"))
    base = _time.time() - 2 * len(parts)
    for i, fn in enumerate(parts):
        t = base + 2 * i
        _os.utime(_os.path.join(out_dir, fn), (t, t))
