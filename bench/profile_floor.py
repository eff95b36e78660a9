"""Attribute the per-micro-batch FIXED floor of the streaming replay.

The DVX_PROFILE_BATCH marks cover apply_batch's stages; what they do NOT
cover (the round-4 "~7 s/batch outside the marks") is attributed here:

- ``source_gap``   wall time between one foreachBatch return and the next
                   invocation — Structured Streaming offset/commit log
                   writes, file-source listing, micro-batch planning.
- ``epoch_guard``  the min-over-tables last_epoch() check per batch.
- ``lineage``      metadata.log_epoch_lineage (the per-epoch tiny append).
- ``commit``       cumulative LakeTable._commit wall (json + fsync + link),
                   with call count.
- ``versions``     cumulative LakeTable._versions listdir wall, with count.
- ``snapshot``     cumulative LakeTable.snapshot resolve wall (cache hits
                   are ~free; misses fold deltas), with count.
- ``apply``        apply_batch wall per batch (the marked region).
- ``handle``       full foreachBatch wall per batch.
- ``drain_compact`` cumulative compact_deltas wall (dominated by the
                   end-of-drain fold in run_stream's finally block).
- ``startup``      run_stream start -> first foreachBatch invocation
                   (stream query planning + first file-source listing).

Usage: python bench/profile_floor.py <cpus> [n_convs] [n_batches]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ACC: dict[str, list] = {}


def _wrap(cls_or_mod, name: str, key: str):
    fn = getattr(cls_or_mod, name)
    ACC[key] = [0.0, 0]

    def timed(*a, **kw):
        t0 = time.time()
        try:
            return fn(*a, **kw)
        finally:
            ACC[key][0] += time.time() - t0
            ACC[key][1] += 1

    setattr(cls_or_mod, name, timed)
    return fn


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_convs = int(sys.argv[2]) if len(sys.argv) > 2 else 50000
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    import dvx.apply as applymod
    import dvx.metadata as metadata
    import dvx.stream as stream
    from dvx.changelog import synthetic_changelog
    from dvx.lake import LakeTable
    from dvx.schema import Vault
    from dvx.session import get_spark
    from dvx.stream import run_stream, write_changelog_files

    spark = get_spark(
        app_name="dvx-floor", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )
    scratch = "/dev/shm" if os.access("/dev/shm", os.W_OK) else None
    tmp = tempfile.mkdtemp(prefix="dvx_floor_", dir=scratch)

    _wrap(LakeTable, "_commit", "commit")
    _wrap(LakeTable, "_versions", "versions")
    _wrap(LakeTable, "snapshot", "snapshot")
    _wrap(metadata, "log_epoch_lineage", "lineage")
    orig_apply = _wrap(applymod, "apply_batch", "apply")
    stream.apply_batch = applymod.apply_batch  # stream imported it by name
    # epoch guard: wrap last_epoch
    _wrap(LakeTable, "last_epoch", "epoch_guard")
    _wrap(LakeTable, "compact_deltas", "drain_compact")

    # per-batch handle walls + inter-batch gaps via ingest_batch wrap
    batch_walls: list[float] = []
    gaps: list[float] = []
    last_exit = [None]
    first_entry = [None]
    orig_ingest = stream.ingest_batch

    def timed_ingest(*a, **kw):
        t0 = time.time()
        if first_entry[0] is None:
            first_entry[0] = t0
        if last_exit[0] is not None:
            gaps.append(round(t0 - last_exit[0], 2))
        try:
            return orig_ingest(*a, **kw)
        finally:
            t1 = time.time()
            batch_walls.append(round(t1 - t0, 2))
            last_exit[0] = t1

    stream.ingest_batch = timed_ingest

    try:
        cl = synthetic_changelog(spark, n_convs=n_convs)
        cdir = os.path.join(tmp, "cl")
        write_changelog_files(cl, cdir, n_files=n_batches)
        n_events = spark.read.parquet(cdir).count()

        vault = Vault(spark, os.path.join(tmp, "wh"), num_buckets=max(cpus, 16))
        vault.create_all_tables()
        # zero the accumulators after setup noise
        for v in ACC.values():
            v[0], v[1] = 0.0, 0

        os.environ["DVX_PROFILE_BATCH"] = "1"
        t0 = time.time()
        run_stream(
            vault, cdir, os.path.join(tmp, "ckpt"),
            max_files_per_trigger=1, log_lineage=True,
        )
        wall = time.time() - t0
        os.environ.pop("DVX_PROFILE_BATCH", None)

        per_batch_apply = ACC["apply"][0] / max(1, ACC["apply"][1])
        startup = round(first_entry[0] - t0, 2) if first_entry[0] else None
        out = {
            "cpus": cpus,
            "events": n_events,
            "batches": len(batch_walls),
            "replay_wall": round(wall, 2),
            "batch_walls": batch_walls,
            "source_gaps": gaps,
            "source_gap_total": round(sum(gaps), 2),
            "startup": startup,
            "outside_handle": round(wall - sum(batch_walls) - sum(gaps), 2),
            "acc": {
                k: {"total_s": round(v[0], 2), "calls": v[1]} for k, v in ACC.items()
            },
            "per_batch": {
                "apply": round(per_batch_apply, 2),
                "handle": round(sum(batch_walls) / max(1, len(batch_walls)), 2),
                "handle_minus_apply": round(
                    (sum(batch_walls) - ACC["apply"][0]) / max(1, len(batch_walls)), 2
                ),
            },
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
