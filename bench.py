"""Benchmark harness (driver contract: one JSON line on stdout).

Measures the engine's headline numbers at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]:

- ``replay``        full CDC streaming replay of the derived changelog
                    (N micro-batches, exactly-once path, hub+link+sat
                    merges) — headline metric is events/sec.
- ``pit_build``     full PIT materialization for one date.
- ``current_state`` serving read: live satellite join hub.
- ``q1/q2``         reference benchmark shapes (aggregation / 3-way join).
- ``dedup_minhash`` minhash signatures over documents.
- ``ann_topk``      brute-force cosine top-k.

Env:
  SPARK_GRAFT_SF_DIR  data dir          (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[N] threads  (default 32)
  DVX_BENCH_BATCHES   micro-batches in the replay (default 4)
  DVX_SYNTH_CONVS     if set, replay the deterministic synthetic transcript
                      changelog with N conversations instead of the
                      sf-derived one (the scale knob for the two-
                      parallelism scaling evidence — same byte-identical
                      input at any parallelism)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_batches = int(os.environ.get("DVX_BENCH_BATCHES", "4"))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from dvx.changelog import changelog_from_testdata, synthetic_changelog
    from dvx.pit import build_pit
    from dvx.schema import Vault
    from dvx.session import get_spark
    from dvx.stream import run_stream, write_changelog_files

    spark = get_spark(
        app_name="dvx-bench", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )

    # table data on tmpfs when available (per-executor-disk stand-in; the
    # shared /tmp virtual disk otherwise serializes the write path)
    scratch_root = "/dev/shm" if os.access("/dev/shm", os.W_OK) else None
    tmp = tempfile.mkdtemp(prefix="dvx_bench_", dir=scratch_root)
    queries: dict[str, float] = {}
    try:
        synth_convs = int(os.environ.get("DVX_SYNTH_CONVS", "0"))
        if synth_convs:
            changelog = synthetic_changelog(spark, n_convs=synth_convs)
            sf = f"synth{synth_convs}"
            # mid-range as-of date: synthetic ts = 2024-01-01 + conv hours,
            # so half the keys have versions on both sides of the cut —
            # pit_build does real work (round 1 built an EMPTY 1998 PIT)
            pit_date = f"{2024 + max(0, synth_convs // (2 * 8760))}-06-01"
        else:
            changelog = changelog_from_testdata(spark, sf_dir)
            pit_date = "1998-06-01"
        cdir = os.path.join(tmp, "changelog")
        write_changelog_files(changelog, cdir, n_files=n_batches)
        n_events = spark.read.parquet(cdir).count()

        vault = Vault(spark, os.path.join(tmp, "wh"), num_buckets=max(cpus, 16))
        vault.create_all_tables()

        t0 = time.time()
        run_stream(
            vault,
            cdir,
            os.path.join(tmp, "ckpt"),
            max_files_per_trigger=1,
            log_lineage=True,
        )
        replay_sec = time.time() - t0
        queries["replay"] = round(replay_sec, 3)

        t0 = time.time()
        build_pit(vault, pit_date, if_exists="replace")
        queries["pit_build"] = round(time.time() - t0, 3)

        t0 = time.time()
        sat = vault.sat_turn_text.read().filter(
            F.col("valid_to").isNull() & F.col("is_deleted").isNull()
        )
        hub = vault.hub_turn.read().select("turn_hash_key", "conv_id", "turn_idx")
        n_current = sat.join(hub, "turn_hash_key").count()
        queries["current_state"] = round(time.time() - t0, 3)

        for name in ("q1_pricing_summary", "q2_top_customers", "minhash_signatures", "ann_topk"):
            fn = entrymod.queries()[name]
            t0 = time.time()
            fn(spark, sf_dir).count()
            key = {"minhash_signatures": "dedup_minhash", "q1_pricing_summary": "q1",
                   "q2_top_customers": "q2"}.get(name, name)
            queries[key] = round(time.time() - t0, 3)

        events_per_sec = n_events / replay_sec if replay_sec else 0.0
        print(
            json.dumps(
                {
                    "metric": "cdc_apply_throughput",
                    "value": round(events_per_sec, 1),
                    "unit": "events/sec",
                    "queries": queries,
                    "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                    "events": n_events,
                    "current_rows": n_current,
                    "cpus": cpus,
                    "batches": n_batches,
                    "replay_wall_sec": round(replay_sec, 3),
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
