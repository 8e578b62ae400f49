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
    small = run(N_SMALL)
    big = run(N_BIG)
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
        "detail_small": small,
        "detail_big": big,
    }
    with open("BENCH_SCALING.json", "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps({k: v for k, v in result.items() if not k.startswith("detail")}))


if __name__ == "__main__":
    main()
