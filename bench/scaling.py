"""Two-parallelism scaling run (BASELINE.json north_rule evidence).

No real cluster exists in this sandbox, so per BASELINE.md the N->4N
executor criterion is evidenced by running the identical replay job on
identical input at local[N] and local[4N] (shuffle partitions scaled
proportionally) and reporting throughput at both plus
efficiency = throughput(4N) / (4 * throughput(N)).

Usage: python bench/scaling.py [sf_dir] [N] [synth_convs]
       (defaults: sf0.1, N=4, synth_convs=300000)

N defaults to 4: the sandbox exposes 32 vCPUs, and at local[4N] the JVM
also runs 4N shuffle/GC threads plus up to 4N Python (Arrow UDF) worker
processes in the SAME address space — at local[32] that is ~3x
oversubscription of the host, which measures contention, not scaling.
local[4] -> local[16] keeps both levels under the host's capacity so the
ratio isolates the quantity a real N -> 4N executor comparison varies:
task parallelism on the same per-core budget.

The replay input is the deterministic synthetic transcript changelog
(dvx.changelog.synthetic_changelog — byte-identical at any parallelism),
sized by synth_convs so the run is compute-dominated rather than
fixed-overhead-dominated; pass 0 to use the sf-derived changelog instead.
Writes bench/SCALING_LAST.{md,json} and prints a JSON summary. Run on an
otherwise idle machine — concurrent load contaminates the ratio.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def canary() -> float:
    """Single-core busy-loop score (M iters/sec) — a host-health probe.

    The sandbox is multi-tenant: identical runs were measured swinging 3x
    (e.g. 13.0k vs 39.1k ev/s) purely with host state. Trials taken while
    the canary is depressed measure the neighbors, not the engine, so
    each trial pair is gated on canary >= CANARY_GATE x best-seen."""
    t0 = time.time()
    x = 0
    while time.time() - t0 < 2.0:
        x += 1
    return x / 2.0 / 1e6


CANARY_GATE = float(os.environ.get("DVX_CANARY_GATE", "0.90"))
CANARY_WAIT_S = int(os.environ.get("DVX_CANARY_WAIT_S", "1800"))
# absolute floor (M iters/s) a pair must see before starting, on top of
# the relative ratchet: the ratchet seeds from the launch window, so a
# campaign started in a trough would otherwise accept the trough as
# "healthy". Healthy observed on this host: ~11-12.2; trough: 4.5-8.
CANARY_FLOOR = float(os.environ.get("DVX_CANARY_FLOOR", "0"))


def wait_healthy(best: float) -> tuple[float, float]:
    """Block until the host canary recovers to >= CANARY_GATE*best and
    >= CANARY_FLOOR (or the wait budget runs out). Returns
    (score, updated best)."""
    deadline = time.time() + CANARY_WAIT_S
    while True:
        s = canary()
        best = max(best, s)
        if (s >= CANARY_GATE * best and s >= CANARY_FLOOR) or time.time() > deadline:
            return s, best
        time.sleep(45)


def run_bench(sf_dir: str, cpus: int, synth_convs: int = 0) -> dict:
    """One bench.py run pinned to exactly `cpus` physical cores.

    taskset confines the WHOLE process tree (JVM + pyspark Python
    workers + GC/shuffle threads) — local[N] alone caps only task slots,
    and the untracked helpers leak onto extra host cores, which flatters
    the small-N side of the comparison. Pinning emulates what a real
    N-core executor host provides."""
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=str(cpus))
    if synth_convs:
        env["DVX_SYNTH_CONVS"] = str(synth_convs)
    cmd = [sys.executable, os.path.join(REPO, "bench.py")]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, env=env, capture_output=True, text=True, check=True)
    line = [l for l in out.stdout.splitlines() if l.strip().startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    synth = int(sys.argv[3]) if len(sys.argv) > 3 else 300000
    trials = int(os.environ.get("DVX_BENCH_TRIALS", "3"))
    # interleave N / 4N trials so machine-level drift (shared VM, page
    # cache, thermal) hits both levels equally instead of one side, and
    # gate each pair on the host-health canary
    rs_n, rs_4n, canaries = [], [], []
    # seed the ratchet with spaced probes so a degraded first sample
    # doesn't define "healthy" down
    best = canary()
    for _ in range(2):
        time.sleep(20)
        best = max(best, canary())
    for _ in range(trials):
        score, best = wait_healthy(best)
        canaries.append(round(score, 1))
        rs_n.append(run_bench(sf_dir, n, synth))
        rs_4n.append(run_bench(sf_dir, 4 * n, synth))
    med = lambda rs: sorted(rs, key=lambda r: r["value"])[len(rs) // 2]  # noqa: E731
    r_n, r_4n = med(rs_n), med(rs_4n)
    r_n["trial_values"] = [r["value"] for r in rs_n]
    r_4n["trial_values"] = [r["value"] for r in rs_4n]
    eff = r_4n["value"] / (4 * r_n["value"]) if r_n["value"] else 0.0
    summary = {
        "sf_dir": sf_dir,
        "synth_convs": synth,
        "N_cpus": n,
        "throughput_N": r_n["value"],
        "throughput_4N": r_4n["value"],
        "trials_N": r_n.get("trial_values", [r_n["value"]]),
        "trials_4N": r_4n.get("trial_values", [r_4n["value"]]),
        "canary_scores": canaries,
        "scaling_efficiency": round(eff, 3),
        "events": r_n["events"],
        "queries_N": r_n["queries"],
        "queries_4N": r_4n["queries"],
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    print(json.dumps(summary))
    md = f"""# BENCH — measured throughput & scaling

## CDC replay (streaming foreachBatch -> hub/link/sat merges, exactly-once)

Input: deterministic synthetic transcript changelog ({r_n['events']:,} change events,
{r_n['batches']} micro-batches; `synthetic_changelog(n_convs={synth})` — byte-identical
at any parallelism, includes hot-conversation skew). Identical input and job at both
parallelism levels (sandbox protocol for the N->4N executor criterion, see BASELINE.md).
Each run is `taskset`-pinned to exactly N physical cores (local[N] alone caps only task
slots — Python workers and JVM helper threads leak onto extra host cores, flattering the
small-N side), and each interleaved trial pair is admitted only while a single-core
busy-loop canary reads >= {int(CANARY_GATE*100)}% of its best observed value (the host is
multi-tenant; identical runs measured 3x apart purely with host state — canary scores
this run: {canaries}).

| parallelism | throughput (events/sec, median of {trials} interleaved) | all trials | replay wall (s) |
|---|---|---|---|
| local[{n}]  | {r_n['value']:,} | {r_n.get('trial_values', [r_n['value']])} | {r_n['replay_wall_sec']} |
| local[{4*n}] | {r_4n['value']:,} | {r_4n.get('trial_values', [r_4n['value']])} | {r_4n['replay_wall_sec']} |

**Scaling efficiency (N -> 4N): {eff:.3f}** (target >= 0.8 on a real
multi-executor cluster; local-mode numbers under-report because all
"executors" share one JVM, one disk, and the driver-side commit path).

## Per-stage timings (seconds)

| stage | local[{n}] | local[{4*n}] |
|---|---|---|
""" + "".join(
        f"| {k} | {r_n['queries'].get(k, '-')} | {r_4n['queries'].get(k, '-')} |\n"
        for k in r_n["queries"]
    ) + f"""
## 10^10 extrapolation

events/sec/core at local[{4*n}]: {r_4n['value']/(4*n):,.0f}. A 1000-executor,
4-core cluster at the same per-core rate sustains ~{r_4n['value']/(4*n)*4000:,.0f}
events/sec -> ~{10**10/(r_4n['value']/(4*n)*4000)/3600:.1f} h for 10^10 events,
before cluster-side wins unavailable locally (real parallel shuffle service,
per-executor disks, no shared-JVM contention).
"""
    # BENCH.md is hand-curated (campaign context, A/B evidence, floor
    # attribution); campaign output goes to a sidecar so a rerun never
    # clobbers the narrative — fold numbers into BENCH.md by hand.
    with open(os.path.join(REPO, "bench", "SCALING_LAST.md"), "w") as f:
        f.write(md)
    with open(os.path.join(REPO, "bench", "SCALING_LAST.json"), "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
