"""Scaling-efficiency evidence (BASELINE.json north rule).

No real cluster exists in this sandbox, so the two-cluster-size
criterion is evidenced by running the IDENTICAL flagship pipeline job at
two local parallelism levels (local[N] and local[4N]) on the SAME input
and reporting throughput at both plus
``efficiency = throughput(4N) / (4 * throughput(N))``.

Each run is a fresh subprocess (fresh JVM) via bench.py. Results go to
BENCH_SCALING.json and a markdown section in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

N_SMALL = int(os.environ.get("SCALING_N", "8"))
N_BIG = 4 * N_SMALL
DOCS = int(os.environ.get("SCALING_DOCS", "60000"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def launch(cpus: int, core_list: str):
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=SF_DIR,
        BENCH_PIPELINE_DOCS=str(DOCS),
        SPARK_DRIVER_MEMORY=os.environ.get("SPARK_DRIVER_MEMORY", "40g"),
    )
    return subprocess.Popen(
        ["taskset", "-c", core_list, sys.executable, "bench.py"],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )


def run_pair() -> tuple[dict, dict]:
    """Run local[N] and local[4N] SIMULTANEOUSLY on disjoint pinned core
    sets (N cores vs 4N cores of the same host at the same moment): the
    shared-host contention that poisons sequential comparisons applies
    identically to both sides, so the throughput *ratio* is meaningful.
    This emulates two cluster sizes drawing from one pool — the closest
    honest analogue of the N-vs-4N-executors criterion this sandbox
    allows."""
    p_small = launch(N_SMALL, f"0-{N_SMALL - 1}")
    p_big = launch(N_BIG, f"{N_SMALL}-{N_SMALL + N_BIG - 1}")
    out_s, _ = p_small.communicate(timeout=3600)
    out_b, _ = p_big.communicate(timeout=3600)
    small = json.loads([l for l in out_s.strip().splitlines() if l.startswith("{")][-1])
    big = json.loads([l for l in out_b.strip().splitlines() if l.startswith("{")][-1])
    return small, big


def main() -> None:
    reps = int(os.environ.get("SCALING_REPS", "2"))
    smalls, bigs = [], []
    for _ in range(reps):
        s, b = run_pair()
        smalls.append(s)
        bigs.append(b)
    # pick the rep with the best COMBINED throughput (least-contended
    # window); sides within a rep share identical host conditions
    pair_idx = max(
        range(reps),
        key=lambda i: smalls[i]["docs_per_sec"] + bigs[i]["docs_per_sec"] / 4,
    )
    small, big = smalls[pair_idx], bigs[pair_idx]
    tp_small = small["docs_per_sec"]
    tp_big = big["docs_per_sec"]
    eff = tp_big / (4 * tp_small)
    result = {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "n_small": N_SMALL,
        "n_big": N_BIG,
        "pipeline_docs": DOCS,
        "docs_per_sec_small": tp_small,
        "docs_per_sec_big": tp_big,
        "pipeline_sec_small": small["pipeline_sec"],
        "pipeline_sec_big": big["pipeline_sec"],
        "reps": reps,
        "all_docs_per_sec_small": [r["docs_per_sec"] for r in smalls],
        "all_docs_per_sec_big": [r["docs_per_sec"] for r in bigs],
        "detail_small": small,
        "detail_big": big,
    }
    with open("BENCH_SCALING.json", "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps({k: v for k, v in result.items() if not k.startswith("detail")}))


if __name__ == "__main__":
    main()
