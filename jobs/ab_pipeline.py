"""Same-session A/B harness for the flagship dedup pipeline.

Round-3's end-to-end pipeline bench regressed 21.5s -> 51.4s on a host
whose bandwidth probe read 20-44% of the round-2 healthy figure; the
VERDICT asked for committed evidence attributing the delta to host or
code. This script runs the IDENTICAL pipeline benchmark (same corpus
seed/size, same warmup, same stage protocol as bench.py's
run_pipeline) against whatever engine tree is first on PYTHONPATH, and
stamps the result with a before/after bandwidth probe — so two
invocations, one per tree, interleaved in the same host phase, give a
like-for-like code comparison with the host term measured out.

Usage (tree selected by PYTHONPATH, e.g. a git worktree of the r2 tag):
    PYTHONPATH=/tmp/r2tree python jobs/ab_pipeline.py --label r2
    PYTHONPATH=/root/repo python jobs/ab_pipeline.py --label r4

Prints one JSON line per invocation:
  {"label": ..., "bw_before": N, "bw_after": N,
   "pipeline_signatures": s, "pipeline_edges": s, "pipeline_clusters": s,
   "pipeline_sec": s, "reps": [...], "n_docs": N}
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time


def bw_probe(seconds: float = 5.0) -> int:
    # deliberately a local copy of bench.py's host_bw_probe, NOT an
    # import: bench.py inserts its own directory at sys.path[0] on
    # import, which would put /root/repo's engine ahead of the
    # PYTHONPATH-selected tree and silently break the A/B's core
    # property (the r2 invocation must run the r2 engine). Keep the
    # constants in sync with BASELINE.md's probe protocol.
    import numpy as np

    a = np.arange(8 * 1024 * 1024, dtype=np.uint64)
    t_end = time.time() + seconds
    reps = 0
    while time.time() < t_end:
        (a * np.uint64(2862933555777941757)).min()
        reps += 1
    return int(reps * (5.0 / seconds))


def run_once(spark, pages, DedupConfig, DedupPipeline) -> dict[str, float]:
    pipe = DedupPipeline(spark, DedupConfig())
    t0 = time.perf_counter()
    pipe.signatures(pages).count()
    t1 = time.perf_counter()
    pipe.edges(pages).count()
    t2 = time.perf_counter()
    pipe.clusters(pages).count()
    t3 = time.perf_counter()
    return {
        "pipeline_signatures": round(t1 - t0, 3),
        "pipeline_edges": round(t2 - t1, 3),
        "pipeline_clusters": round(t3 - t2, 3),
        "pipeline_sec": round(t3 - t0, 3),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--label", required=True)
    ap.add_argument("--docs", type=int, default=60_000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    bw_before = bw_probe()

    from symspellpy_spark.plans.pipeline import DedupConfig, DedupPipeline
    from symspellpy_spark.session import get_spark
    from symspellpy_spark.sources.pages import synthesize_pages

    spark = get_spark(f"ab_{args.label}", cores=args.cores)

    scratch = os.path.join(
        "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp",
        f"ab_pipeline_{args.label}",
    )
    shutil.rmtree(scratch, ignore_errors=True)
    # identical corpus to bench.py sf0.1: seed 42, n_base = n/4, 80-400 tok
    synthesize_pages(
        spark, n_docs=args.docs, n_base=args.docs // 4, seed=42,
        min_tokens=80, max_tokens=400,
    ).write.mode("overwrite").parquet(scratch)
    pages = spark.read.parquet(scratch)

    warm = synthesize_pages(
        spark, n_docs=4000, n_base=1000, seed=7, min_tokens=80, max_tokens=400
    ).localCheckpoint(eager=True)
    run_once(spark, warm, DedupConfig, DedupPipeline)

    reps = [
        run_once(spark, pages, DedupConfig, DedupPipeline)
        for _ in range(args.reps)
    ]
    best = min(reps, key=lambda r: r["pipeline_sec"])
    spark.stop()

    out = {
        "label": args.label,
        "n_docs": args.docs,
        "cores": args.cores,
        "bw_before": bw_before,
        "bw_after": bw_probe(),
        **best,
        "reps": reps,
    }
    shutil.rmtree(scratch, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
