"""Interleaved A/B/C of the driver bench across code revisions.

Round-2 verdict item 1: the driver bench's replay wall regressed 41.6 s
(r1) -> 67.0 s (r2) at local[32]/sf0.1, measured in different host
windows — this script settles whether that was code or host by running
each revision's own bench.py on the IDENTICAL derived changelog
(dvx/changelog.py is unchanged across revisions), interleaved within
one window so drift hits every arm equally, medians reported.

Usage: python bench/ab_replay.py [trials] [rev:path ...]
       default arms: r1=.ab/r1, r2=.ab/r2, r3=<repo HEAD>
Writes bench/AB_REPLAY.json and prints a summary line per arm.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "bench"))
from scaling import canary  # noqa: E402


def run_bench(path: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "32"),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(path, "bench.py")],
        env=env, capture_output=True, text=True, check=True, cwd=path,
    )
    line = [l for l in out.stdout.splitlines() if l.strip().startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    arms = (
        dict(a.split(":", 1) for a in sys.argv[2:])
        if len(sys.argv) > 2
        else {
            "r1": os.path.join(REPO, ".ab", "r1"),
            "r2": os.path.join(REPO, ".ab", "r2"),
            "r3": REPO,
        }
    )
    results: dict[str, list[dict]] = {k: [] for k in arms}
    canaries = []
    for t in range(trials):
        canaries.append(round(canary(), 2))
        for name, path in arms.items():
            r = run_bench(path)
            results[name].append(r)
            print(
                f"trial {t} {name}: replay={r['queries']['replay']}s "
                f"({r['value']} ev/s)",
                flush=True,
            )
    summary = {"canaries": canaries, "trials": trials, "arms": {}}
    for name, rs in results.items():
        replays = [r["queries"]["replay"] for r in rs]
        summary["arms"][name] = {
            "replay_median_s": statistics.median(replays),
            "replay_all_s": replays,
            "events_per_sec_median": statistics.median(r["value"] for r in rs),
            "queries_median": {
                k: statistics.median(r["queries"][k] for r in rs)
                for k in rs[0]["queries"]
                if all(k in r["queries"] for r in rs)
            },
            "events": rs[0]["events"],
        }
    summary["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    with open(os.path.join(REPO, "bench", "AB_REPLAY.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
