"""Same-window interleaved A/B: full pit_build under the round-4
overwrite_partitions policy (salts = defaultParallelism, no wide factor)
vs HEAD's composite-aware policy (salts = ceil(par / num_buckets), wide).

The round-4 bench showed pit_build 4.62 -> 7.77 s (r3 -> r4) across host
windows; the suspect is the composite layout's write fan (each
"<date>|<bucket>" key sprayed over ~salts writer files). This harness
removes the window variable: ONE warehouse, both policies alternated in
one process, medians of N.

Usage: python bench/ab_pit.py [sf_dir] [trials]   (defaults sf0.1, 3)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import dvx.lake as lake
    from dvx.changelog import changelog_from_testdata
    from dvx.pit import build_pit
    from dvx.schema import Vault
    from dvx.session import get_spark
    from dvx.stream import run_stream, write_changelog_files

    spark = get_spark(
        app_name="dvx-ab-pit", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )
    scratch = "/dev/shm" if os.access("/dev/shm", os.W_OK) else None
    tmp = tempfile.mkdtemp(prefix="dvx_abpit_", dir=scratch)

    orig = lake.LakeTable.overwrite_partitions

    def r4_policy(self, df, summary=None):
        """Replica of the round-4 path: full-parallelism salting on every
        overwrite, including composite tables (the suspected regression)."""
        while True:
            v = self.version()
            m = self.snapshot(v)
            salts = max(2, self.spark.sparkContext.defaultParallelism)
            new_files, commit_rel = self._write_files(
                self._schema_aligned(df, m), m, v + 1, salts=salts
            )
            deltas = None
            if not m["partition_col"] and m["num_buckets"] is None:
                files = dict(new_files)
            elif lake._is_composite(m):
                parts = {lake._part_of(k) for k in new_files}
                files = {
                    k: ps for k, ps in m["files"].items()
                    if lake._part_of(k) not in parts
                }
                files.update(new_files)
                deltas = {
                    k: ps for k, ps in m.get("deltas", {}).items()
                    if lake._part_of(k) not in parts
                }
            else:
                files = {k: ps for k, ps in m["files"].items() if k not in new_files}
                files.update(new_files)
            try:
                return self._commit_next(
                    m, v, "overwrite_partitions", files, new_files, summary,
                    deltas=deltas,
                )
            except lake.CommitConflict:
                self._drop_attempt(commit_rel)
                continue

    try:
        changelog = changelog_from_testdata(spark, sf_dir)
        cdir = os.path.join(tmp, "cl")
        write_changelog_files(changelog, cdir, n_files=4)
        vault = Vault(spark, os.path.join(tmp, "wh"), num_buckets=max(cpus, 16))
        vault.create_all_tables()
        run_stream(vault, cdir, os.path.join(tmp, "ckpt"), max_files_per_trigger=1,
                   log_lineage=False)

        res: dict[str, list[float]] = {"r4_salted": [], "head_composite": []}
        files_per_key: dict[str, int] = {}
        for _ in range(trials):
            for name, impl in (("r4_salted", r4_policy), ("head_composite", orig)):
                lake.LakeTable.overwrite_partitions = impl
                t0 = time.time()
                build_pit(vault, "1998-06-01", if_exists="replace")
                res[name].append(round(time.time() - t0, 3))
                snap = vault.pit_turn.snapshot()
                files_per_key[name] = round(
                    sum(len(p) for p in snap["files"].values())
                    / max(1, len(snap["files"])), 1,
                )
        out = {
            "cpus": cpus,
            "trials": res,
            "medians": {k: statistics.median(v) for k, v in res.items()},
            "mean_files_per_partition_key": files_per_key,
        }
        print(json.dumps(out))
    finally:
        lake.LakeTable.overwrite_partitions = orig
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
