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


def run(cpus: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=SF_DIR,
        BENCH_PIPELINE_DOCS=str(DOCS),
        SPARK_DRIVER_MEMORY=os.environ.get("SPARK_DRIVER_MEMORY", "60g"),
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        env=env,
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
        timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    reps = int(os.environ.get("SCALING_REPS", "2"))
    # interleave configs and take the best rep per config: the sandbox
    # host is shared, so single-shot timings carry large noise
    smalls, bigs = [], []
    for _ in range(reps):
        smalls.append(run(N_SMALL))
        bigs.append(run(N_BIG))
    small = max(smalls, key=lambda r: r["docs_per_sec"])
    big = max(bigs, key=lambda r: r["docs_per_sec"])
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
