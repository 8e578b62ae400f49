"""Scaling efficiency vs corpus size (the amortization evidence behind
the 10^12-doc claim).

`BENCH_SCALING.json` measures the north-rule criterion at ONE corpus
size; its caveat section attributes the sub-0.8 aggregate to (a) the
host's memory-bandwidth wall (a local[4N] run shares one memory bus,
a real 4N-executor cluster does not) and (b) fixed floors that do not
shrink with cores — pointer-jumping driver rounds in the clusters
stage, job-scheduling overhead, JVM warmup. Claim (b) predicts a
specific measurable signature: efficiency RISES with corpus size,
because the fixed floors amortize while per-core work grows. This
harness measures that curve instead of narrating it.

NOTE on default runtime: SCALING_SIZES includes the 960k- and
1.92M-doc levels, so a full default sweep takes well over 30 minutes
(the 1.92M level alone runs ~510 s at local[4] plus ~300 s at
local[16] per repetition); pass a smaller SCALING_SIZES env for quick
iteration.

Protocol (same discipline as scaling_bench.py):
- for each size in SIZE_SWEEP, run the IDENTICAL pipeline-only bench
  (`BENCH_ONLY=pipeline`) at local[N] and local[4N], fresh JVMs,
  sequentially on an otherwise idle host;
- BENCH_REPS in-JVM repetitions per invocation, best taken; the whole
  sweep can be re-invoked and per-(size, level) bests accumulate across
  invocations into BENCH_SCALING_SIZE.json when the engine tree hash
  matches (the BASELINE.md noise protocol — this VM shows minutes-long
  hypervisor stalls, so single readings record the noise);
- the same single-memory-bus caveat applies to every point: each
  per-size efficiency is a LOWER BOUND on cluster scaling efficiency,
  but the SLOPE of the curve is exactly the amortization effect.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

from scaling_bench import git_head

N_SMALL = int(os.environ.get("SCALING_N", "4"))
N_BIG = 4 * N_SMALL
SIZES = [
    int(s)
    for s in os.environ.get(
        "SCALING_SIZES", "30000,120000,480000,960000,1920000"
    ).split(",")
]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BENCH_REPS = os.environ.get("BENCH_REPS", "2")
OUT = "BENCH_SCALING_SIZE.json"
STAGES = ("pipeline_signatures", "pipeline_edges", "pipeline_clusters")


def run(cpus: int, docs: int) -> dict:
    env = dict(
        os.environ,
        BENCH_ONLY="pipeline",
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=SF_DIR,
        BENCH_PIPELINE_DOCS=str(docs),
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
            f"bench.py (cpus={cpus}, docs={docs}) produced no JSON, "
            f"rc={proc.returncode}\n" + proc.stderr[-3000:]
        )
    return json.loads(lines[-1])


def level_entry(r: dict) -> dict:
    return {
        "docs_per_sec": r["docs_per_sec"],
        "pipeline_sec": r["pipeline_sec"],
        "stages": {st: r["queries"][st] for st in STAGES},
        "host_bw_reps": r.get("host_bw_reps"),
    }


def merge_point(new: dict, old: dict | None) -> dict:
    """Per-(size, level) best-of across invocations; stage bests taken
    independently (stage noise is independent of which run won)."""
    if old is None:
        new = dict(new)
        new["reps"] = new.get("reps", 1)
        return new
    best = dict(new if new["docs_per_sec"] >= old["docs_per_sec"] else old)
    best["stages"] = {
        st: min(new["stages"][st], old["stages"][st]) for st in STAGES
    }
    best["reps"] = old.get("reps", 1) + new.get("reps", 1)
    return best


def main() -> None:
    head = git_head()
    prev: dict = {}
    try:
        with open(OUT) as fh:
            prev_file = json.load(fh)
        if (
            os.environ.get("SCALING_MERGE", "1") != "0"
            and prev_file.get("git_head") == head
            and head is not None
            and prev_file.get("n_small") == N_SMALL
        ):
            prev = {p["docs"]: p for p in prev_file.get("points", [])}
    except (OSError, ValueError):
        pass

    points = []
    for docs in SIZES:
        small = level_entry(run(N_SMALL, docs))
        big = level_entry(run(N_BIG, docs))
        old = prev.get(docs)
        small = merge_point(small, (old or {}).get("small"))
        big = merge_point(big, (old or {}).get("big"))
        eff = round(big["docs_per_sec"] / (4 * small["docs_per_sec"]), 3)
        stage_eff = {
            st: round(small["stages"][st] / (4 * big["stages"][st]), 3)
            for st in STAGES
        }
        point = {
            "docs": docs,
            "efficiency": eff,
            "speedup": round(big["docs_per_sec"] / small["docs_per_sec"], 2),
            "stage_efficiency": stage_eff,
            "small": small,
            "big": big,
        }
        points.append(point)
        print(
            json.dumps(
                {
                    "docs": docs,
                    "efficiency": eff,
                    "tp_small": small["docs_per_sec"],
                    "tp_big": big["docs_per_sec"],
                    "stage_efficiency": stage_eff,
                }
            ),
            flush=True,
        )

    # Keep accumulated points for sizes not re-swept this invocation.
    for docs, old in prev.items():
        if docs not in {p["docs"] for p in points}:
            points.append(old)
    points.sort(key=lambda p: p["docs"])

    result = {
        "metric": "scaling_efficiency_vs_corpus_size",
        "n_small": N_SMALL,
        "n_big": N_BIG,
        "bench_reps_per_run": int(BENCH_REPS),
        "points": points,
        "git_head": head,
        "note": (
            "pipeline-only throughput at local[N] vs local[4N] per corpus "
            "size; per-(size,level) bests accumulate across invocations on "
            "the same engine tree (see module docstring for the protocol "
            "and the shared-memory-bus caveat: each point is a lower bound, "
            "the SLOPE is the amortization evidence)"
        ),
    }
    with open(OUT, "w") as fh:
        json.dump(result, fh, indent=2)
    print(
        json.dumps(
            {
                "metric": result["metric"],
                "points": [
                    {"docs": p["docs"], "efficiency": p["efficiency"]}
                    for p in points
                ],
            }
        )
    )


if __name__ == "__main__":
    main()
