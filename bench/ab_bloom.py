"""Interleaved same-window A/B of the key-bloom insert prune on the
replay path: DVX_KEY_BLOOM=1 vs =0 (no segments, plain existence reads),
median of N pairs, each trial a subprocess running profile_floor.

Usage: python bench/ab_bloom.py [cpus] [n_convs] [pairs]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int, n_convs: int, bloom: str) -> dict:
    env = dict(os.environ, DVX_KEY_BLOOM=bloom)
    cmd = [sys.executable, os.path.join(REPO, "bench", "profile_floor.py"),
           str(cpus), str(n_convs), "4"]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, env=env, capture_output=True, text=True, check=True)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_convs = int(sys.argv[2]) if len(sys.argv) > 2 else 300000
    pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    res: dict[str, list] = {"bloom": [], "nobloom": []}
    for _ in range(pairs):
        res["bloom"].append(run(cpus, n_convs, "1"))
        res["nobloom"].append(run(cpus, n_convs, "0"))
    out = {
        "cpus": cpus,
        "n_convs": n_convs,
        "replay_walls": {k: [r["replay_wall"] for r in v] for k, v in res.items()},
        "medians": {
            k: statistics.median(r["replay_wall"] for r in v)
            for k, v in res.items()
        },
        "apply_per_batch": {
            k: [r["per_batch"]["apply"] for r in v] for k, v in res.items()
        },
        "drain_compact": {
            k: [r["acc"]["drain_compact"]["total_s"] for r in v]
            for k, v in res.items()
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
