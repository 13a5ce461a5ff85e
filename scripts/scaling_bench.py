"""Scaling-efficiency evidence (north rule: >=0.8 from N to 4N parallelism).

Sandbox protocol (BASELINE.md): identical input + job in separate pinned
JVMs at local[N] and local[4N]; eff = (throughput_4N / throughput_N) / 4.
Writes BENCH/BASELINE.md.

N defaults to 2 (i.e. 2 vs 8 cores). The wide end of this shared VM is
unusable for a RATIO: back-to-back local[32] runs of the identical job swing
4-12x (282k -> 70k -> 23k URLs/s observed) under bursty co-tenant steal,
while pinned 2- and 8-core runs reproduce within a few percent. The 32-core
run is still reported as the peak-throughput point, with that disclosure.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cores: int, sf_dir: str) -> dict:
    """One JVM at local[cores], CPU-PINNED to exactly ``cores`` cores.

    Without the taskset pin, local[N] on a 32-core box cheats: GC, Arrow
    serialization and shuffle-IO threads overflow onto the idle cores,
    inflating the small-N baseline and understating scaling efficiency. The
    pin makes the run a faithful stand-in for an N-core cluster node (the
    north rule's N vs 4N executors)."""
    cpu_list = f"0-{cores - 1}"
    out = subprocess.run(
        ["taskset", "-c", cpu_list, sys.executable,
         os.path.join(REPO, "scripts", "scaling_worker.py"), str(cores), sf_dir],
        capture_output=True,
        text=True,
        check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_small = int(os.environ.get("SPARK_GRAFT_SCALE_N", "2"))
    n_big = 4 * n_small
    max_attempts = int(os.environ.get("SPARK_GRAFT_BENCH_ATTEMPTS", "3"))
    attempts = []
    # run EVERY paired measurement and report the MEDIAN pair — a best-of
    # selection (or an early break on a passing ratio) is biased toward
    # favorable noise; the median with all attempts disclosed is not
    for _ in range(max_attempts):
        r_small = run(n_small, sf_dir)
        r_big = run(n_big, sf_dir)
        eff = (r_big["urls_per_sec"] / r_small["urls_per_sec"]) / 4.0
        attempts.append((eff, r_small, r_big))
    eff, r_small, r_big = sorted(attempts, key=lambda a: a[0])[len(attempts) // 2]

    peak = None
    if os.environ.get("SPARK_GRAFT_SKIP_PEAK", "") != "1":
        peak = run(32, sf_dir)

    peak_md = ""
    if peak is not None:
        peak_md = f"""
Peak-throughput point (NOT part of the efficiency ratio): pinned local[32],
same job/input: **{peak["urls_per_sec"]:,} URLs/sec** ({peak["sec"]} s). The
32-core end of this shared VM swings 4-12x between identical runs under
bursty co-tenant steal (282k / 70k / 23k URLs/sec observed back-to-back), so
it is reported as a point measurement only; the N vs 4N ratio above uses the
narrow, reproducible end of the machine.
"""

    md = f"""# BENCH/BASELINE — scaling evidence (north rule)

Protocol (BASELINE.md): the same frontier-expansion wave kernel
(fetch-gate -> Arrow-batched link extraction -> URL canonicalize -> wave
dedup -> policy route) over the identical input (sf0.1 documents-derived
corpus, replicated x{r_small["mult"]} = {r_small["urls"]:,} routed URLs), run
in separate JVMs at local[{n_small}] and local[{n_big}], fixed 128 shuffle
partitions, shuffle dirs on tmpfs. Each JVM is CPU-PINNED (taskset) to
exactly its core count — without the pin, the small-N JVM's GC/Arrow/shuffle
threads overflow onto the idle cores of this 32-core box and inflate the
small-N baseline; the pin makes local[N] a faithful stand-in for an N-core
cluster node (the north rule's N vs 4N executors). Throughput = routed
URLs/sec (warm-up run first; each JVM reports the median of 3 measured runs).

| parallelism (pinned) | wall sec | URLs/sec |
|---|---|---|
| local[{n_small}], cores 0-{n_small - 1} | {r_small["sec"]} | {r_small["urls_per_sec"]:,} |
| local[{n_big}], cores 0-{n_big - 1} | {r_big["sec"]} | {r_big["urls_per_sec"]:,} |

**Scaling efficiency ({n_small} -> {n_big} cores) = (tp{n_big} / tp{n_small}) / 4 = {eff:.3f}**
(target >= 0.8 per BASELINE.json north_rule; values slightly above 1.0 are
GC-amortization noise — the pinned small-N JVM pays proportionally more GC)
{peak_md}
Noise disclosure: this sandbox VM shows bursty co-tenant interference; a
pure-python pinned CPU probe (no Spark) measures hardware scaling 0.83-0.90
for the same core ratios, bounding what any software can show here. The
paired ({n_small}, {n_big}) measurement is run {max_attempts} times and the
MEDIAN pair reported. All attempts: {[round(a[0], 3) for a in attempts]}.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({
        "eff": round(eff, 3),
        f"tp{n_small}": r_small["urls_per_sec"],
        f"tp{n_big}": r_big["urls_per_sec"],
        "tp32_peak": peak["urls_per_sec"] if peak else None,
    }))


if __name__ == "__main__":
    main()
