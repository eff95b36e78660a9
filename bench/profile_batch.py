"""Per-stage profile of one apply_batch at a given parallelism.

Usage: python bench/profile_batch.py <cpus> [n_convs]

Times each stage of the batch apply pipeline separately (sequential, not
the production thread-pool overlap) so anti-scaling stages are
attributable. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_convs = int(sys.argv[2]) if len(sys.argv) > 2 else 100000

    from dvx.apply import _apply_satellite, _insert_new_keys, prepare_batch
    from dvx.changelog import synthetic_changelog
    from dvx.schema import Vault
    from dvx.session import get_spark

    spark = get_spark(
        app_name="dvx-profile", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )
    scratch = "/dev/shm" if os.access("/dev/shm", os.W_OK) else None
    tmp = tempfile.mkdtemp(prefix="dvx_prof_", dir=scratch)
    t: dict[str, float] = {}
    cpu: dict[str, float] = {}
    sys_cpu: dict[str, float] = {}

    def _jvm_cpu() -> tuple[float, float]:
        """Cumulative (user, system) CPU seconds of every process (JVM +
        Python workers), from /proc — attributes wall vs compute per
        stage, and user vs kernel (tmpfs page churn shows up as system)."""
        u = s = 0.0
        tick = os.sysconf("SC_CLK_TCK")
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/stat") as f:
                    parts = f.read().rsplit(")", 1)[1].split()
                u += int(parts[11]) / tick
                s += int(parts[12]) / tick
            except OSError:
                continue
        return u, s
    try:
        cl = synthetic_changelog(spark, n_convs=n_convs)
        cdir = os.path.join(tmp, "cl")
        cl.write.mode("overwrite").parquet(cdir)
        batch = spark.read.parquet(cdir)
        n = batch.count()

        vault = Vault(spark, os.path.join(tmp, "wh"), num_buckets=max(cpus, 16))
        vault.create_all_tables()

        t0 = time.time(); c0 = _jvm_cpu()
        pre = prepare_batch(batch)
        pspill = os.path.join(tmp, "prepared")
        pre.write.mode("overwrite").parquet(pspill)
        prepared = spark.read.schema(pre.schema).parquet(pspill)
        n_prep = prepared.count()
        t["prepare"] = round(time.time() - t0, 2)
        c1 = _jvm_cpu(); cpu["prepare"] = round(c1[0] - c0[0], 1); sys_cpu["prepare"] = round(c1[1] - c0[1], 1)

        specs = [
            ("hub_conv", vault.hub_conversation,
             prepared.select("conv_hash_key", "conv_id", "load_date", "record_source"),
             "conv_hash_key", ["conv_hash_key", "conv_id", "load_date", "record_source"]),
            ("hub_turn", vault.hub_turn,
             prepared.select("turn_hash_key", "conv_id", "turn_idx", "load_date", "record_source"),
             "turn_hash_key", ["turn_hash_key", "conv_id", "turn_idx", "load_date", "record_source"]),
            ("link", vault.link_conversation_turn,
             prepared.select("link_hash_key", "conv_hash_key", "turn_hash_key", "load_date", "record_source"),
             "link_hash_key", ["link_hash_key", "conv_hash_key", "turn_hash_key", "load_date", "record_source"]),
        ]
        for name, tbl, src, key, cols in specs:
            t0 = time.time(); c0 = _jvm_cpu()
            _insert_new_keys(tbl, src, key, cols, None, "default", None)
            t[name] = round(time.time() - t0, 2)
            c1 = _jvm_cpu()
            cpu[name] = round(c1[0] - c0[0], 1)
            sys_cpu[name] = round(c1[1] - c0[1], 1)

        t0 = time.time(); c0 = _jvm_cpu()
        _apply_satellite(
            vault, vault.registry.satellites[0], prepared, None, "default", None
        )
        t["satellite"] = round(time.time() - t0, 2)
        c1 = _jvm_cpu(); cpu["satellite"] = round(c1[0] - c0[0], 1); sys_cpu["satellite"] = round(c1[1] - c0[1], 1)

        print(json.dumps({"cpus": cpus, "events": n, "prepared": n_prep, "stages": t,
                          "cpu_user": cpu, "cpu_sys": sys_cpu,
                          "total": round(sum(t.values()), 2)}))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
