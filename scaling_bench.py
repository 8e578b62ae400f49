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
        # scale the EN compute workloads so each level runs tens of
        # seconds of sustained work: at the default sizes the kernels
        # finish in ~2 s and fixed job overhead — not throughput —
        # dominates the 4-vs-16 comparison
        BENCH_EN_SCALE=os.environ.get("SCALING_EN_SCALE", "6"),
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
    """The ENGINE tree hash (``git rev-parse HEAD:symspellpy_spark``),
    with ``-dirty`` appended when tracked files under the package are
    modified: two runs merge only when they measured the same engine
    code. Commit-level hashing would orphan accumulated measurements on
    every docs/bench-tooling commit; workload-shape changes in bench.py
    are fine to merge across because every merged figure is a RATE and
    the merge takes per-entry bests."""
    cwd = os.path.dirname(os.path.abspath(__file__))
    try:
        out = subprocess.run(
            ["git", "rev-parse", "HEAD:symspellpy_spark"],
            stdout=subprocess.PIPE,
            text=True,
            cwd=cwd,
            timeout=10,
        )
        head = out.stdout.strip() or None
        if head is None:
            return None
        st = subprocess.run(
            ["git", "status", "--porcelain", "--untracked-files=no",
             "--", "symspellpy_spark"],
            stdout=subprocess.PIPE,
            text=True,
            cwd=cwd,
            timeout=10,
        )
        dirty = any(l.strip() for l in st.stdout.splitlines())
        return head + "-dirty" if dirty else head
    except (OSError, subprocess.SubprocessError):
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
    if (
        old.get("git_head") is None
        or result.get("git_head") is None
        or old.get("git_head") != result.get("git_head")
    ):
        # different code — or an UNKNOWN revision on either side (git
        # absent/failed): merging per-workload bests would risk mixing
        # measurements of different engines — start fresh
        return result
    m = dict(result)
    # own the nested dicts: the per-entry merges below reassign inside
    # them, and the caller's ``result`` must stay untouched
    m["stage_efficiency"] = dict(result["stage_efficiency"])
    m["workload_efficiency"] = dict(result["workload_efficiency"])
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
    # iterate the UNION of keys: a pipeline-only rerun (empty workload
    # dict, SCALING_PIPELINE_ONLY=1) must not erase accumulated
    # full-run bests — entries present on only one side carry over
    old_st = old.get("stage_efficiency", {})
    for st in set(m["stage_efficiency"]) | set(old_st):
        new_e = m["stage_efficiency"].get(st)
        old_e = old_st.get(st)
        if new_e is None or old_e is None:
            m["stage_efficiency"][st] = new_e or old_e
            continue
        ts = min(new_e["sec_small"], old_e["sec_small"])
        tb = min(new_e["sec_big"], old_e["sec_big"])
        m["stage_efficiency"][st] = {
            "sec_small": ts,
            "sec_big": tb,
            "speedup": round(ts / tb, 2),
            "efficiency": round(ts / (4 * tb), 3),
        }
    old_wl = old.get("workload_efficiency", {})
    for k in set(m["workload_efficiency"]) | set(old_wl):
        new_w = m["workload_efficiency"].get(k)
        old_w = old_wl.get(k)
        if new_w is None or old_w is None:
            m["workload_efficiency"][k] = new_w or old_w
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
