"""Scaling-efficiency evidence (BASELINE.json north rule).

No real cluster exists in this sandbox, so the two-cluster-size
criterion is evidenced by running the IDENTICAL flagship pipeline job at
two local parallelism levels (local[N] and local[4N]) on the SAME input
and reporting throughput at both plus
``efficiency = throughput(4N) / (4 * throughput(N))``.

Protocol:
- each run is a fresh subprocess (fresh JVM) via bench.py, executed
  SEQUENTIALLY on an otherwise idle host so each level sees identical
  conditions;
- BENCH_REPS in-JVM repetitions per level, best taken (the sandbox VM
  shows 2x wall-clock noise between identical runs; min is the standard
  noise-robust aggregate), then SCALING_REPS process-level repetitions,
  best taken again;
- the caveat this cannot remove: local[4N] gets 4x the cores of
  local[N] but the SAME memory bandwidth, page cache and disks, whereas
  a real 4N-executor cluster scales those 4x too (this host measures
  ~2.1x aggregate stream bandwidth at 4 workers and ~3.6x at 16 — a
  hard ceiling of ~0.43 on the efficiency of any bandwidth-bound stage
  that no job structure can exceed). The reported figure is therefore a
  LOWER BOUND on cluster scaling efficiency.

Results go to BENCH_SCALING.json and a markdown section in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

N_SMALL = int(os.environ.get("SCALING_N", "4"))
N_BIG = 4 * N_SMALL
DOCS = int(os.environ.get("SCALING_DOCS", "120000"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BENCH_REPS = os.environ.get("BENCH_REPS", "3")


def run(cpus: int) -> dict:
    env = dict(
        os.environ,
        # default: full workloads per level (the per-workload efficiency
        # decomposition needs them); SCALING_PIPELINE_ONLY=1 for a quick
        # pipeline-only pass
        **(
            {"BENCH_ONLY": "pipeline"}
            if os.environ.get("SCALING_PIPELINE_ONLY")
            else {}
        ),
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=SF_DIR,
        BENCH_PIPELINE_DOCS=str(DOCS),
        BENCH_REPS=BENCH_REPS,
        SPARK_DRIVER_MEMORY=os.environ.get("SPARK_DRIVER_MEMORY", "40g"),
    )
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
        timeout=3600,
    )
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(
            f"bench.py (cpus={cpus}) produced no JSON line, rc={proc.returncode}\n"
            + proc.stderr[-3000:]
        )
    return json.loads(lines[-1])


def git_head() -> str | None:
    try:
        out = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            stdout=subprocess.PIPE,
            text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
            timeout=10,
        )
        return out.stdout.strip() or None
    except OSError:
        return None


def merge_previous(result: dict) -> dict:
    """Best-of merge with an existing BENCH_SCALING.json of the same
    configuration (the BASELINE.md noise protocol, applied ACROSS
    invocations): this host shows minutes-long hypervisor stalls, so
    per-level / per-stage / per-workload bests are accumulated over
    every process rep ever run rather than overwritten by whichever
    invocation ran last. Each merged entry is still one real measured
    run at its level. SCALING_MERGE=0 disables (fresh file)."""
    if os.environ.get("SCALING_MERGE", "1") == "0":
        return result
    try:
        with open("BENCH_SCALING.json") as fh:
            old = json.load(fh)
    except (OSError, ValueError):
        return result
    if any(
        old.get(k) != result[k]
        for k in ("metric", "n_small", "n_big", "pipeline_docs")
    ):
        return result  # different configuration: no merge
    if old.get("git_head") != result.get("git_head"):
        # different code: merging per-workload bests would mix
        # measurements of different engines — start fresh
        return result
    m = dict(result)
    for side in ("small", "big"):
        if old[f"docs_per_sec_{side}"] > m[f"docs_per_sec_{side}"]:
            m[f"docs_per_sec_{side}"] = old[f"docs_per_sec_{side}"]
            m[f"pipeline_sec_{side}"] = old[f"pipeline_sec_{side}"]
            m[f"detail_{side}"] = old[f"detail_{side}"]
        m[f"all_docs_per_sec_{side}"] = (
            old[f"all_docs_per_sec_{side}"] + m[f"all_docs_per_sec_{side}"]
        )
    tp_s, tp_b = m["docs_per_sec_small"], m["docs_per_sec_big"]
    m["value"] = round(tp_b / (4 * tp_s), 3)
    m["speedup"] = round(tp_b / tp_s, 2)
    for st, new_e in m["stage_efficiency"].items():
        old_e = old.get("stage_efficiency", {}).get(st)
        if old_e is None:
            continue
        ts = min(new_e["sec_small"], old_e["sec_small"])
        tb = min(new_e["sec_big"], old_e["sec_big"])
        m["stage_efficiency"][st] = {
            "sec_small": ts,
            "sec_big": tb,
            "speedup": round(ts / tb, 2),
            "efficiency": round(ts / (4 * tb), 3),
        }
    for k, new_w in m["workload_efficiency"].items():
        old_w = old.get("workload_efficiency", {}).get(k)
        if old_w is None:
            continue
        qs = max(new_w["small"], old_w["small"])
        qb = max(new_w["big"], old_w["big"])
        m["workload_efficiency"][k] = {
            "small": qs,
            "big": qb,
            "efficiency": round(qb / (4 * qs), 3),
        }
    m["reps"] = old.get("reps", 0) + result["reps"]
    m["note"] = (
        f"best-of-{m['reps']} process-level repetitions accumulated across "
        "scaling_bench invocations (per-level / per-stage / per-workload "
        "bests per the BASELINE.md noise protocol; SCALING_MERGE=0 for a "
        "fresh file)"
    )
    return m


def main() -> None:
    reps = int(os.environ.get("SCALING_REPS", "2"))
    smalls, bigs = [], []
    for _ in range(reps):
        smalls.append(run(N_SMALL))
        bigs.append(run(N_BIG))
    small = max(smalls, key=lambda r: r["docs_per_sec"])
    big = max(bigs, key=lambda r: r["docs_per_sec"])
    tp_small = small["docs_per_sec"]
    tp_big = big["docs_per_sec"]
    eff = tp_big / (4 * tp_small)
    # Per-stage decomposition: efficiency of each pipeline stage computed
    # from the per-stage best across process reps (stage noise is
    # independent of which rep won overall). This attributes the
    # aggregate figure: compute-bound stages should approach 1.0 while
    # bandwidth-bound stages sit on the measured ~0.43 host memory wall.
    stage_eff = {}
    for st in ("pipeline_signatures", "pipeline_edges", "pipeline_clusters"):
        ts = min(r["queries"][st] for r in smalls)
        tb = min(r["queries"][st] for r in bigs)
        stage_eff[st] = {
            "sec_small": ts,
            "sec_big": tb,
            "speedup": round(ts / tb, 2),
            "efficiency": round(ts / (4 * tb), 3),
        }
    # Per-workload efficiencies from the same two runs: rates scale as
    # eff = rate(4N) / (4 * rate(N)). Compute-dominated workloads
    # (compound's per-document fold + kernels) should approach 1.0;
    # join/scan-dominated ones sit on the host bandwidth wall.
    workload_eff = {}
    for k in (
        "lookup_en_qps",
        "compound_en_docs_per_sec",
        "segmentation_en_docs_per_sec",
        "segmentation_en_d1_docs_per_sec",
    ):
        qs = small["queries"].get(k)
        qb = big["queries"].get(k)
        if qs and qb:
            workload_eff[k] = {
                "small": qs,
                "big": qb,
                "efficiency": round(qb / (4 * qs), 3),
            }
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
        "speedup": round(tp_big / tp_small, 2),
        "stage_efficiency": stage_eff,
        "workload_efficiency": workload_eff,
        "reps": reps,
        "bench_reps_per_run": int(BENCH_REPS),
        "all_docs_per_sec_small": [r["docs_per_sec"] for r in smalls],
        "all_docs_per_sec_big": [r["docs_per_sec"] for r in bigs],
        "detail_small": small,
        "detail_big": big,
        "git_head": git_head(),
    }
    result = merge_previous(result)
    with open("BENCH_SCALING.json", "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps({k: v for k, v in result.items() if not k.startswith("detail")}))


if __name__ == "__main__":
    main()
