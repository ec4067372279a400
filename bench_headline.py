"""Clean-protocol headline bench (VERDICT r2 #3): one kernel per fresh
JVM, warmup + N timed trials, median ± spread, idle machine required.

This separates kernel performance from JVM co-tenancy: the one-JVM
bench.py run conflates GC/heap pressure from earlier kernels with the
later ones (r2's plp/triangles "regression" was exactly that + shared-host
noise). Per-kernel subprocesses are the same protocol as
bench_scaling.py.

Writes BENCH/HEADLINE.md and prints a JSON summary.
Usage: python bench_headline.py [--trials N] [--kernels a,b,c]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))

KERNELS = [
    "pagerank_cs",
    "wcc_cs",
    "plp_co",
    "triangles_conv",
    "kcore_hindex_co",
    "scc_cs",
    "betweenness_est_cs",
]


def run_once(kernel: str, cpus: str, sf_dir: str) -> float:
    env = dict(os.environ)
    env.update(
        BENCH_KERNELS=kernel,
        SPARK_GRAFT_CPUS=cpus,
        SPARK_GRAFT_SF_DIR=sf_dir,
        # bench.py's in-JVM median-of-BENCH_TRIALS (driver stability) would
        # nest medians here; this protocol's unit is ONE cold sample per
        # fresh JVM, so pin it to a single trial
        BENCH_TRIALS="1",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)["queries"][kernel]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--warmups", type=int, default=1)
    ap.add_argument("--kernels", default=",".join(KERNELS))
    args = ap.parse_args()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    results: dict[str, dict] = {}
    for kernel in args.kernels.split(","):
        times = []
        for i in range(args.warmups + args.trials):
            t = run_once(kernel, cpus, sf_dir)
            tag = "warmup" if i < args.warmups else "trial"
            print(f"  {kernel} {tag} {i}: {t}s", flush=True)
            if i >= args.warmups:
                times.append(t)
        med = statistics.median(times)
        results[kernel] = {
            "median_sec": round(med, 3),
            "min_sec": round(min(times), 3),
            "max_sec": round(max(times), 3),
            "spread_pct": round(100.0 * (max(times) - min(times)) / med, 1),
            "trials": times,
        }

    summary = {
        "protocol": f"1 kernel/JVM, {args.warmups} warmup + {args.trials} trials, median",
        "cpus": cpus,
        "sf_dir": sf_dir,
        "kernels": results,
    }
    print(json.dumps(summary))

    md = [
        "",
        "## Remeasure — clean per-kernel medians",
        "",
        f"Protocol: one kernel per fresh JVM (subprocess), {args.warmups} warmup +",
        f"{args.trials} timed trials, median reported; local[{cpus}] on {sf_dir};",
        "idle machine (no concurrent Spark sessions).",
        "",
        "| kernel | median s | min | max | spread |",
        "|---|---|---|---|---|",
    ]
    for k, r in results.items():
        md.append(
            f"| {k} | {r['median_sec']} | {r['min_sec']} | {r['max_sec']} |"
            f" ±{r['spread_pct'] / 2:.0f}% |"
        )
    md += ["", f"raw: {json.dumps(summary)}", ""]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    # append — earlier rounds' sections are the measurement history
    with open(os.path.join(REPO, "BENCH", "HEADLINE.md"), "a") as f:
        f.write("\n".join(md))


if __name__ == "__main__":
    main()
