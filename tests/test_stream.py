"""Streaming replay: exactly-once under injected restarts, checkpoint
resume, epoch dedup, lineage (SURVEY.md §5 items 3 & 5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dvx.changelog import synthetic_changelog
from dvx.schema import Vault
from dvx.stream import ingest_batch, run_stream, write_changelog_files
from tests.test_apply import assert_frames_equal, current_state, oracle_state


@pytest.fixture(scope="module")
def changelog(spark):
    return synthetic_changelog(spark, n_convs=30, hot_convs=2, hot_turns=40).persist()


def make_vault(spark, tmp_path):
    v = Vault(spark, str(tmp_path / "wh"), num_buckets=4)
    v.create_all_tables()
    return v


def test_stream_replay_matches_batch_oracle(spark, tmp_path, changelog):
    vault = make_vault(spark, tmp_path)
    cdir = str(tmp_path / "changelog")
    write_changelog_files(changelog, cdir, n_files=4)
    n = run_stream(vault, cdir, str(tmp_path / "ckpt"), log_lineage=False)
    assert n == 4
    assert_frames_equal(current_state(vault), oracle_state(changelog))


def test_restart_mid_replay_resumes_and_matches(spark, tmp_path, changelog):
    vault = make_vault(spark, tmp_path)
    cdir = str(tmp_path / "changelog")
    ckpt = str(tmp_path / "ckpt")
    write_changelog_files(changelog, cdir, n_files=5)
    # crash after 2 committed batches
    n1 = run_stream(vault, cdir, ckpt, fail_after_batches=2, log_lineage=True)
    assert n1 == 2
    # restart: resumes from checkpoint, replays nothing already committed
    run_stream(vault, cdir, ckpt, log_lineage=True)
    assert_frames_equal(current_state(vault), oracle_state(changelog))
    # lineage recorded per epoch
    meta = vault.load_metadata.read()
    assert meta.filter("status = 'COMPLETED'").count() >= 5
    assert meta.filter("status = 'PARTITION_METRIC'").count() > 0


def test_non_injected_failure_propagates(spark, tmp_path, changelog, monkeypatch):
    """fail_after_batches must swallow ONLY the injected crash: a real
    failure inside the batch handler still propagates (the restart
    harness cannot mask genuine bugs)."""
    import pytest

    import dvx.stream as stream_mod

    def boom(*a, **kw):
        raise RuntimeError("genuine batch failure")

    monkeypatch.setattr(stream_mod, "ingest_batch", boom)
    vault = make_vault(spark, tmp_path)
    cdir = str(tmp_path / "changelog")
    write_changelog_files(changelog.limit(100), cdir, n_files=2)
    with pytest.raises(Exception, match="genuine batch failure"):
        run_stream(
            vault, cdir, str(tmp_path / "ckpt"),
            fail_after_batches=1, log_lineage=False,
        )


def test_replayed_epoch_is_skipped(spark, tmp_path, changelog):
    vault = make_vault(spark, tmp_path)
    b = changelog.limit(200)
    r1 = ingest_batch(vault, b, epoch_id=0)
    assert not r1["skipped"]
    counts = vault.sat_all().count()
    r2 = ingest_batch(vault, b, epoch_id=0)  # exact redelivery
    assert r2["skipped"]
    assert vault.sat_all().count() == counts
    skipped = vault.load_metadata.read().filter("status = 'SKIPPED'")
    assert skipped.count() == 1


def test_incremental_pit_per_microbatch_equals_full_rebuild(spark, tmp_path, changelog):
    """north_star: PIT rebuilt incrementally per micro-batch must equal a
    one-shot full build over the final satellite state."""
    from dvx.pit import build_pit

    # mid-stream: inserts span Jan 1-2, updates +1 day, deletes +2 days,
    # so this date excludes part of the update/delete tail (real as-of)
    pit_date = "2024-01-02"
    vault = make_vault(spark, tmp_path)
    cdir = str(tmp_path / "changelog")
    write_changelog_files(changelog, cdir, n_files=3)
    run_stream(vault, cdir, str(tmp_path / "ckpt"), log_lineage=False,
               pit_dates=[pit_date])
    incremental = vault.pit_turn.read(partitions=[pit_date])

    oracle_vault = Vault(spark, str(tmp_path / "wh2"), num_buckets=4)
    oracle_vault.create_all_tables()
    ingest_batch(oracle_vault, changelog, epoch_id=0, log_lineage=False)
    build_pit(oracle_vault, pit_date)
    full = oracle_vault.pit_turn.read(partitions=[pit_date])

    cols = [c for c in incremental.columns]
    assert_frames_equal(
        incremental.select(*cols).orderBy("turn_hash_key"),
        full.select(*cols).orderBy("turn_hash_key"),
    )


def test_shuffled_file_order_matches_oracle_with_incremental_pit(
    spark, tmp_path, changelog
):
    """Adversarial replay order: stamp the changelog files' mtimes in
    REVERSED seq order so the streaming file source processes the newest
    changes first. The satellite's out-of-order re-chain must still
    converge to the one-shot state, including the per-micro-batch
    incremental PIT for a past as-of date (round-1 flaky-loss regression)."""
    import os

    from dvx.pit import build_pit

    pit_date = "2024-01-02"
    vault = make_vault(spark, tmp_path)
    cdir = str(tmp_path / "changelog")
    write_changelog_files(changelog, cdir, n_files=4)
    # reverse the deterministic mtime order: part-0003 (highest seqs) first
    parts = sorted(f for f in os.listdir(cdir) if f.endswith(".parquet"))
    base = os.path.getmtime(os.path.join(cdir, parts[0]))
    for i, fn in enumerate(reversed(parts)):
        os.utime(os.path.join(cdir, fn), (base + 2 * i, base + 2 * i))
    run_stream(vault, cdir, str(tmp_path / "ckpt"), log_lineage=False,
               pit_dates=[pit_date])
    assert_frames_equal(current_state(vault), oracle_state(changelog))

    oracle_vault = Vault(spark, str(tmp_path / "wh2"), num_buckets=4)
    oracle_vault.create_all_tables()
    ingest_batch(oracle_vault, changelog, epoch_id=0, log_lineage=False)
    build_pit(oracle_vault, pit_date)
    cols = ["turn_hash_key", "conv_id", "turn_idx", "role", "text", "tool"]
    assert_frames_equal(
        vault.pit_turn.read(partitions=[pit_date]).select(*cols).orderBy("turn_hash_key"),
        oracle_vault.pit_turn.read(partitions=[pit_date]).select(*cols).orderBy("turn_hash_key"),
    )


def test_epochs_recorded_in_snapshots(spark, tmp_path, changelog):
    vault = make_vault(spark, tmp_path)
    ingest_batch(vault, changelog.limit(100), epoch_id=7, log_lineage=False)
    for t in ("hub_conversation", "hub_turn", "link_conversation_turn", "sat_turn_text", "sat_turn_text_hist"):
        assert vault.table(t).last_epoch("default") == 7
