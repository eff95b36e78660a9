"""Equality-delete tombstones (lake.delete_keys_insert) — the splice
primitive for out-of-order SCD2 re-chains: delete-by-key + append in one
atomic commit, O(stale keys) write IO instead of bucket rewrites."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from dvx.lake import LakeTable

SCHEMA = StructType(
    [
        StructField("k", StringType()),
        StructField("ver", IntegerType()),
        StructField("payload", StringType()),
    ]
)


def _rows(spark, items):
    return spark.createDataFrame(
        [(k, v, f"p-{k}-{v}") for k, v in items], SCHEMA
    )


def _keys(spark, names):
    return spark.createDataFrame([(k,) for k in names], "k string")


@pytest.fixture()
def tbl(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, num_buckets=4, bucket_cols=["k"]
    )
    # two append commits: history-like, multiple rows per key
    t.append(_rows(spark, [("a", 1), ("a", 2), ("b", 1), ("c", 1)]))
    t.append(_rows(spark, [("b", 2), ("d", 1)]))
    return t


def _contents(t):
    return sorted(
        (r.k, r.ver, r.payload) for r in t.read().collect()
    )


def test_delete_keys_insert_replaces_only_named_keys(spark, tbl):
    tbl.delete_keys_insert(
        _keys(spark, ["a", "b"]),
        _rows(spark, [("a", 10), ("b", 10), ("b", 11)]),
    )
    assert _contents(tbl) == [
        ("a", 10, "p-a-10"),
        ("b", 10, "p-b-10"),
        ("b", 11, "p-b-11"),
        ("c", 1, "p-c-1"),
        ("d", 1, "p-d-1"),
    ]
    # untouched buckets stay plain; touched buckets carry tombstones
    assert any(tbl.snapshot()["tombstones"].values())


def test_rerun_converges(spark, tbl):
    """Crash-replay semantics: re-running the same splice must not
    duplicate — the newer tombstone covers the previous inserts."""
    for _ in range(2):
        tbl.delete_keys_insert(
            _keys(spark, ["a"]), _rows(spark, [("a", 10), ("a", 11)])
        )
    rows = [r for r in _contents(tbl) if r[0] == "a"]
    assert rows == [("a", 10, "p-a-10"), ("a", 11, "p-a-11")]


def test_append_after_delete_survives(spark, tbl):
    tbl.delete_keys_insert(_keys(spark, ["a"]), _rows(spark, [("a", 10)]))
    tbl.append(_rows(spark, [("a", 20)]))
    rows = [r for r in _contents(tbl) if r[0] == "a"]
    assert rows == [("a", 10, "p-a-10"), ("a", 20, "p-a-20")]


def test_key_filter_with_tombstones(spark, tbl):
    tbl.delete_keys_insert(_keys(spark, ["a"]), _rows(spark, [("a", 10)]))
    got = sorted(
        (r.k, r.ver)
        for r in tbl.read(key_filter=_keys(spark, ["a", "c"])).collect()
    )
    assert got == [("a", 10), ("c", 1)]


def test_time_travel_sees_pre_delete_state(spark, tbl):
    v = tbl.version()
    tbl.delete_keys_insert(_keys(spark, ["a"]), _rows(spark, [("a", 10)]))
    old = sorted((r.k, r.ver) for r in tbl.read(v).collect() if r.k == "a")
    assert old == [("a", 1), ("a", 2)]


def test_compact_tombstones_folds_and_preserves_contents(spark, tbl):
    tbl.delete_keys_insert(
        _keys(spark, ["a", "b"]), _rows(spark, [("a", 10), ("b", 10)])
    )
    before = _contents(tbl)
    folded = tbl.compact_tombstones()
    assert folded >= 1
    assert not any(tbl.snapshot()["tombstones"].values())
    assert _contents(tbl) == before
    assert tbl.compact_tombstones() == 0  # idempotent no-op


def test_compact_also_clears_tombstones(spark, tbl):
    tbl.delete_keys_insert(_keys(spark, ["a"]), _rows(spark, [("a", 10)]))
    tbl.compact(max_files_per_key=1)
    assert not any(tbl.snapshot()["tombstones"].values())
    rows = [r for r in _contents(tbl) if r[0] == "a"]
    assert rows == [("a", 10, "p-a-10")]


def test_expire_keeps_live_tombstone_files(spark, tbl):
    import os

    tbl.delete_keys_insert(_keys(spark, ["a"]), _rows(spark, [("a", 10)]))
    tbl.expire_snapshots(retain_last=1)
    for ps in tbl.snapshot()["tombstones"].values():
        for p in ps:
            assert os.path.exists(os.path.join(tbl.root, p))
    rows = [r for r in _contents(tbl) if r[0] == "a"]
    assert rows == [("a", 10, "p-a-10")]


def test_publish_mirror_refuses_pending_tombstones(spark, tbl, tmp_path):
    tbl.delete_keys_insert(_keys(spark, ["a"]), _rows(spark, [("a", 10)]))
    with pytest.raises(ValueError, match="tombstone"):
        tbl.publish_mirror(str(tmp_path / "mirror"))
    tbl.compact_tombstones()
    assert tbl.publish_mirror(str(tmp_path / "mirror")) > 0


def test_guards(spark, tmp_path):
    comp = LakeTable.create(
        spark, str(tmp_path / "comp"), SCHEMA,
        num_buckets=4, bucket_cols=["k"], partition_col="payload",
    )
    with pytest.raises(ValueError, match="plain bucketed"):
        comp.delete_keys_insert(_keys(spark, ["a"]), _rows(spark, [("a", 1)]))
    bloomed = LakeTable.create(
        spark, str(tmp_path / "bl"), SCHEMA,
        num_buckets=4, bucket_cols=["k"], properties={"key_bloom": True},
    )
    with pytest.raises(ValueError, match="key_bloom"):
        bloomed.delete_keys_insert(
            _keys(spark, ["a"]), _rows(spark, [("a", 1)])
        )


def test_delete_with_mor_deltas_coexists(spark, tmp_path):
    """A bucket with BOTH pending deltas and tombstones: tombstone filter
    applies below the last-wins merge."""
    t = LakeTable.create(
        spark, str(tmp_path / "t2"), SCHEMA, num_buckets=2, bucket_cols=["k"]
    )
    t.append(_rows(spark, [("a", 1), ("b", 1)]))
    t.delete_keys_insert(_keys(spark, ["a"]), _rows(spark, [("a", 2)]))
    t.upsert_delta(_rows(spark, [("b", 9)]))
    got = sorted((r.k, r.ver) for r in t.read().collect())
    assert got == [("a", 2), ("b", 9)]


def test_stale_rechain_uses_eq_delete_and_drain_folds(spark, tmp_path, monkeypatch):
    """End-to-end: an out-of-order redelivery splices history via
    delete_keys_insert (no bucket rewrite commit), and the stream drain
    folds the tombstones; final state equals the bucket-rewrite path."""
    from dvx.changelog import synthetic_changelog
    from dvx.schema import Vault
    from dvx.stream import run_stream, write_changelog_files

    def build(root, eq):
        monkeypatch.setenv("DVX_HIST_EQ_DELETE", "1" if eq else "0")
        v = Vault(spark, str(root), num_buckets=8)
        v.create_all_tables()
        # negate seq: batches are seq-ranged, so updates/deletes (large
        # original seq) land in batch 1 and the original inserts in
        # batch 2 with OLDER (ts, seq) — the stale re-chain path fires.
        # Both arms replay the identical (negated) stream.
        cl = synthetic_changelog(spark, n_convs=40, seed=7)
        cdir = str(root) + "_cl"
        write_changelog_files(cl.withColumn("seq", -F.col("seq")), cdir, 2)
        run_stream(v, cdir, str(root) + "_ck", log_lineage=False)
        return v

    va = build(tmp_path / "wa", eq=True)
    vb = build(tmp_path / "wb", eq=False)
    for name in ("sat_turn_text", "sat_turn_text_hist"):
        a = sorted(map(tuple, va.table(name).read().collect()))
        b = sorted(map(tuple, vb.table(name).read().collect()))
        assert a == b, name
    # drain folded every tombstone
    assert not any(
        va.table("sat_turn_text_hist").snapshot()["tombstones"].values()
    )
