"""ACID lake-table format: snapshots, COW merge, time travel, rollback,
expiry, compaction, epoch tracking, additive evolution.

These mirror the Iceberg capabilities the reference relies on
(IcebergWriter.scala — SURVEY.md §2.1 S5-S13, §2.9 D4).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from dvx.lake import BUCKET_COL, LakeTable

SCHEMA = StructType(
    [
        StructField("k", StringType()),
        StructField("v", IntegerType()),
    ]
)


@pytest.fixture()
def tbl(spark, tmp_path):
    return LakeTable.create(
        spark,
        str(tmp_path / "t"),
        SCHEMA,
        num_buckets=4,
        bucket_cols=["k"],
    )


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_create_is_idempotent(spark, tmp_path):
    root = str(tmp_path / "t")
    t1 = LakeTable.create(spark, root, SCHEMA, num_buckets=4, bucket_cols=["k"])
    t2 = LakeTable.create(spark, root, SCHEMA, num_buckets=4, bucket_cols=["k"])
    assert t1.version() == t2.version() == 1


def test_append_and_read(spark, tbl):
    tbl.append(_df(spark, [("a", 1), ("b", 2)]))
    tbl.append(_df(spark, [("c", 3)]))
    got = sorted((r.k, r.v) for r in tbl.read().collect())
    assert got == [("a", 1), ("b", 2), ("c", 3)]


def test_merge_upsert_only_rewrites_touched_buckets(spark, tbl):
    tbl.append(_df(spark, [("a", 1), ("b", 2), ("c", 3)]))
    v_before = tbl.version()
    files_before = tbl.snapshot()["files"]

    def upsert(cur, src):
        cols = ["k", "v", BUCKET_COL]
        keep = cur.join(src.select("k"), "k", "left_anti").select(*cols)
        return keep.unionByName(src.select(*cols))

    tbl.merge(tbl.with_bucket(_df(spark, [("a", 10), ("d", 4)])), upsert)
    got = sorted((r.k, r.v) for r in tbl.read().collect())
    assert got == [("a", 10), ("b", 2), ("c", 3), ("d", 4)]

    # untouched buckets carried over as metadata (identical file paths)
    files_after = tbl.snapshot()["files"]
    touched = {r[0] for r in tbl.with_bucket(_df(spark, [("a", 0), ("d", 0)]))
               .select(BUCKET_COL).distinct().collect()}
    for key, paths in files_before.items():
        if int(key) not in touched:
            assert files_after.get(key) == paths
    assert tbl.version() == v_before + 1


def test_time_travel_and_rollback(spark, tbl):
    tbl.append(_df(spark, [("a", 1)]))
    v1 = tbl.version()
    tbl.append(_df(spark, [("b", 2)]))
    assert tbl.read(v1).count() == 1
    assert tbl.read().count() == 2
    tbl.rollback(v1)
    assert tbl.read().count() == 1
    ops = [h["operation"] for h in tbl.history()]
    assert ops[-1] == "rollback"


def test_expire_snapshots_keeps_live_files(spark, tbl):
    for i in range(6):
        tbl.append(_df(spark, [(f"k{i}", i)]))
    removed = tbl.expire_snapshots(retain_last=2)
    assert removed == 0  # append-only: every file is still live
    assert len(tbl._versions()) == 2
    assert tbl.read().count() == 6


def test_expire_reclaims_replaced_merge_files(spark, tbl):
    tbl.append(_df(spark, [("a", 1)]))

    def replace(cur, src):
        return src

    for i in range(3):
        tbl.merge(tbl.with_bucket(_df(spark, [("a", i)])), replace)
    removed = tbl.expire_snapshots(retain_last=1)
    assert removed > 0
    assert [(r.k, r.v) for r in tbl.read().collect()] == [("a", 2)]


def test_compact_reduces_files(spark, tbl):
    for i in range(4):
        tbl.append(_df(spark, [("a", i), ("b", i)]))
    before = sum(len(p) for p in tbl.snapshot()["files"].values())
    tbl.compact(max_files_per_key=1)
    after = sum(len(p) for p in tbl.snapshot()["files"].values())
    assert after < before
    assert tbl.read().count() == 8


def test_epoch_tracking(spark, tbl):
    assert tbl.last_epoch("s1") == -1
    tbl.append(_df(spark, [("a", 1)]), summary={"epochs": {"s1": 0}})
    tbl.append(_df(spark, [("b", 2)]), summary={"epochs": {"s1": 3}})
    assert tbl.last_epoch("s1") == 3
    assert tbl.last_epoch("other") == -1
    # lower epoch never regresses the max
    tbl.append(_df(spark, [("c", 3)]), summary={"epochs": {"s1": 1}})
    assert tbl.last_epoch("s1") == 3


def test_add_columns_null_fills_history(spark, tbl):
    tbl.append(_df(spark, [("a", 1)]))
    tbl.add_columns([StructField("model", StringType())])
    df = spark.createDataFrame([("b", 2, "m1")], tbl.schema())
    tbl.append(df)
    rows = {r.k: r.model for r in tbl.read().collect()}
    assert rows == {"a": None, "b": "m1"}


def test_partitioned_overwrite(spark, tmp_path):
    schema = StructType(
        [StructField("d", StringType()), StructField("n", IntegerType())]
    )
    t = LakeTable.create(spark, str(tmp_path / "p"), schema, partition_col="d")
    t.append(spark.createDataFrame([("2024-01-01", 1), ("2024-01-02", 2)], schema))
    t.overwrite_partitions(spark.createDataFrame([("2024-01-02", 99)], schema))
    got = sorted((r.d, r.n) for r in t.read().collect())
    assert got == [("2024-01-01", 1), ("2024-01-02", 99)]
    # partition-pruned read touches only one key's files
    assert t.read(partitions=["2024-01-01"]).count() == 1


def test_bucket_pruned_read(spark, tbl):
    rows = [(f"k{i}", i) for i in range(20)]
    tbl.append(_df(spark, rows))
    one = tbl.with_bucket(_df(spark, [("k7", 0)])).select(BUCKET_COL).first()[0]
    pruned = tbl.read(buckets=[one])
    assert pruned.count() < 20
    assert "k7" in {r.k for r in pruned.collect()}


def test_delta_manifests_and_checkpoints(spark, tbl):
    """Commits between checkpoints are delta manifests (O(touched keys)
    metadata); resolution folds them onto the checkpoint and time travel
    still sees every version."""
    from dvx.lake import _CHECKPOINT_EVERY

    for i in range(_CHECKPOINT_EVERY + 3):  # cross one checkpoint boundary
        tbl.append(_df(spark, [(f"k{i}", i)]))
    raw = {v: tbl._read_manifest(v) for v in tbl._versions()}
    deltas = [v for v, m in raw.items() if "files" not in m]
    fulls = [v for v, m in raw.items() if "files" in m]
    assert deltas, "expected delta manifests between checkpoints"
    assert _CHECKPOINT_EVERY in fulls, "checkpoint version must embed full map"
    # a delta's metadata is O(touched): exactly the appended key's bucket
    assert all(len(raw[v].get("files_set", {})) <= 2 for v in deltas)
    # resolution: latest sees all rows; a mid-chain delta version resolves too
    assert tbl.read().count() == _CHECKPOINT_EVERY + 3
    mid = deltas[len(deltas) // 2]
    assert tbl.read(version=mid).count() == mid - 1  # v1=create, each append +1


def test_expire_rewrites_oldest_delta_as_checkpoint(spark, tbl):
    for i in range(8):
        tbl.append(_df(spark, [(f"k{i}", i)]))
    tbl.expire_snapshots(retain_last=3)
    vs = tbl._versions()
    assert len(vs) == 3
    assert "files" in tbl._read_manifest(vs[0])  # self-contained chain
    assert tbl.read().count() == 8
    assert tbl.read(version=vs[0]).count() == vs[0] - 1


# ---------------------------------------------------------------- MOR deltas


def test_upsert_delta_last_wins_read(spark, tbl):
    tbl.append(_df(spark, [("a", 1), ("b", 2), ("c", 3)]))
    tbl.upsert_delta(_df(spark, [("a", 10), ("d", 40)]))
    tbl.upsert_delta(_df(spark, [("a", 100)]))
    got = sorted((r.k, r.v) for r in tbl.read().collect())
    assert got == [("a", 100), ("b", 2), ("c", 3), ("d", 40)]
    # nothing in the base was rewritten: delta commits add only new files
    assert tbl.snapshot()["summary"]["total_delta_files"] >= 2


def test_upsert_delta_write_io_is_o_of_changed_rows(spark, tbl):
    """The MOR point: upserting one key must not rewrite the bucket."""
    tbl.append(_df(spark, [(f"k{i}", i) for i in range(64)]))
    files_before = dict(tbl.snapshot()["files"])
    tbl.upsert_delta(_df(spark, [("k0", -1)]))
    m = tbl.snapshot()
    assert m["files"] == files_before  # base untouched
    assert m["summary"]["added_files"] == 1  # one delta file
    assert [r.v for r in tbl.read().filter("k = 'k0'").collect()] == [-1]


def test_replace_buckets_supersedes_deltas(spark, tbl):
    tbl.append(_df(spark, [("a", 1)]))
    tbl.upsert_delta(_df(spark, [("a", 10)]))
    bucket = tbl.with_bucket(_df(spark, [("a", 1)])).select(BUCKET_COL).first()[0]
    tbl.replace_buckets([bucket], _df(spark, [("a", 99)]))
    m = tbl.snapshot()
    assert not m["deltas"].get(str(bucket))
    assert [r.v for r in tbl.read().collect()] == [99]


def test_compact_deltas_folds_and_preserves_contents(spark, tbl):
    tbl.append(_df(spark, [("a", 1), ("b", 2)]))
    for i in range(3):
        tbl.upsert_delta(_df(spark, [("a", 10 + i)]))
    before = sorted((r.k, r.v) for r in tbl.read().collect())
    folded = tbl.compact_deltas(max_delta_files=3)
    assert folded >= 1
    m = tbl.snapshot()
    assert sum(len(p) for p in m["deltas"].values()) < 3
    assert sorted((r.k, r.v) for r in tbl.read().collect()) == before


def test_time_travel_sees_deltas_as_of_version(spark, tbl):
    tbl.append(_df(spark, [("a", 1)]))
    v1 = tbl.version()
    tbl.upsert_delta(_df(spark, [("a", 2)]))
    v2 = tbl.version()
    tbl.upsert_delta(_df(spark, [("a", 3)]))
    assert [r.v for r in tbl.read(version=v1).collect()] == [1]
    assert [r.v for r in tbl.read(version=v2).collect()] == [2]
    assert [r.v for r in tbl.read().collect()] == [3]


def test_expire_keeps_live_delta_files(spark, tbl):
    import os

    tbl.append(_df(spark, [("a", 1)]))
    tbl.upsert_delta(_df(spark, [("a", 2)]))
    for i in range(12):
        tbl.append(_df(spark, [(f"x{i}", i)]))
    tbl.expire_snapshots(retain_last=3)
    # the delta file is still referenced by the latest snapshot
    m = tbl.snapshot()
    for ps in m["deltas"].values():
        for p in ps:
            assert os.path.exists(os.path.join(tbl.root, p))
    assert [r.v for r in tbl.read().filter("k = 'a'").collect()] == [2]


def test_append_refuses_same_key_over_pending_delta(spark, tbl):
    """The MOR ordering guard: an appended base file would outrank a
    pending delta for the SAME key in the last-wins merge — append must
    refuse; distinct-key appends stay allowed (previous test)."""
    tbl.append(_df(spark, [("a", 1)]))
    tbl.upsert_delta(_df(spark, [("a", 2)]))
    with pytest.raises(ValueError, match="pending"):
        tbl.append(_df(spark, [("a", 99)]))
    tbl.compact_deltas(max_delta_files=1)
    tbl.append(_df(spark, [("a", 99)]))  # folded: append is fine again
    assert sorted(r.v for r in tbl.read().filter("k = 'a'").collect()) == [2, 99]


def test_concurrent_writers_occ(spark, tmp_path):
    """Optimistic concurrency under REAL contention: N threads appending
    to one table simultaneously. Every commit must land (no lost
    update), versions must be dense, and every manifest-referenced file
    must exist — the CommitConflict retry loop is load-bearing."""
    import os
    from concurrent.futures import ThreadPoolExecutor

    tbl = LakeTable.create(
        spark, str(tmp_path / "occ"), SCHEMA, num_buckets=4, bucket_cols=["k"]
    )
    n_writers, rows_each = 8, 5

    def write(i):
        tbl.append(_df(spark, [(f"w{i}_r{j}", i * 100 + j) for j in range(rows_each)]))

    with ThreadPoolExecutor(max_workers=n_writers) as ex:
        list(ex.map(write, range(n_writers)))

    # no lost update, no duplicate
    assert tbl.read().count() == n_writers * rows_each
    assert tbl.read().select("k").distinct().count() == n_writers * rows_each
    # versions dense: create + one commit per writer, no gaps
    vs = tbl._versions()
    assert vs == list(range(1, n_writers + 2))
    # every file referenced by the final snapshot exists on disk
    m = tbl.snapshot()
    for ps in m["files"].values():
        for p in ps:
            assert os.path.exists(os.path.join(tbl.root, p))


def test_concurrent_delta_upserts_converge(spark, tmp_path):
    """Concurrent MOR upserts to DISJOINT keys: all land, last-wins merge
    serves every key."""
    from concurrent.futures import ThreadPoolExecutor

    tbl = LakeTable.create(
        spark, str(tmp_path / "occd"), SCHEMA, num_buckets=4, bucket_cols=["k"]
    )
    tbl.append(_df(spark, [(f"k{i}", 0) for i in range(6)]))

    def upsert(i):
        tbl.upsert_delta(_df(spark, [(f"k{i}", i + 10)]))

    with ThreadPoolExecutor(max_workers=6) as ex:
        list(ex.map(upsert, range(6)))

    got = {r.k: r.v for r in tbl.read().collect()}
    assert got == {f"k{i}": i + 10 for i in range(6)}


def test_read_key_filter_prunes_below_mor_merge(spark, tbl):
    """key_filter semantics: per-key last-wins is preserved for kept
    keys, other keys are absent, and the semi-join sits BELOW the
    merge-on-read aggregate (the whole point: the agg never hashes rows
    of keys the caller didn't ask for)."""
    tbl.append(_df(spark, [("a", 1), ("b", 2), ("c", 3)]))
    tbl.upsert_delta(_df(spark, [("a", 10), ("d", 40)]))
    tbl.upsert_delta(_df(spark, [("a", 100), ("b", 20)]))

    kf = spark.createDataFrame([("a",), ("d",), ("zz",)], "k string")
    got = sorted((r.k, r.v) for r in tbl.read(key_filter=kf).collect())
    # last-wins for kept keys; b/c filtered out; zz absent from table
    assert got == [("a", 100), ("d", 40)]

    # plan shape: the LeftSemi join must be a descendant of the
    # last-wins Aggregate, not above it
    plan = tbl.read(key_filter=kf)._jdf.queryExecution().optimizedPlan().toString()
    agg_at = plan.find("Aggregate")
    semi_at = plan.find("LeftSemi")
    assert agg_at != -1 and semi_at != -1
    assert semi_at > agg_at  # deeper in the tree prints later

    # non-bucketed tables refuse key_filter instead of mis-filtering
    import pytest as _pytest

    from pyspark.sql.types import StringType, StructField, StructType

    flat = LakeTable.create(
        spark, tbl.root + "_flat",
        StructType([StructField("k", StringType())]),
    )
    with _pytest.raises(ValueError, match="bucketed"):
        flat.read(key_filter=kf)
