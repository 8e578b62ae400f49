"""Same-session A/B: the d=2 deep-verify work — fused length-band
fan-out in ``deep_pairs`` + character-bag prefilter in ``TopResolver``.

VERDICT_r04 Next #7: ``segmentation_en_d2`` has hovered 174-228 docs/s
across rounds; profiling the resolve stage (round 5) showed the
dominant cost was not the DP kernel but ``deep_pairs``'s fan-out, which
materialized every (query x prefix-pool) pair BEFORE the
``|len(t)-len(q)| <= d`` mask discarded ~3/4 of them. Two changes:

1. **fused length-band fan-out** (``neighborhood.deep_pairs``): each
   prefix pool sorts by term length once; a query's survivors are one
   contiguous slice found by two vectorized searchsorteds — discarded
   pairs are never materialized. Single-threaded resolve of the bench's
   62,896 distinct d=2 substrings: 10.7 s -> 3.1 s (same pair set).
2. **character-bag prefilter** (``TopResolver``, ``char_bags``): a
   27-bucket bag L1 lower bound prunes 55% of surviving pairs before
   the DP kernel (kernel 1.87 s -> 0.57 s single-threaded); provably
   lossless (every unit edit moves the exact bag by <= 2; bucketing
   only shrinks the L1), pinned end-to-end by
   ``tests/test_neighborhood.py::test_top_resolver_matches_bruteforce``.

This harness interleaves THREE cells in one host phase, each in its own
child process (fresh JVM + cold worker caches; the prefilter toggle
``SGRAFT_BAG_PREFILTER`` is read at python-worker import time):

- ``base``  — engine tree passed via --base-tree (pre-change HEAD
  worktree), measuring the committed round-4 kernel;
- ``off``   — this tree, fused fan-out only (prefilter disabled);
- ``on``    — this tree, fan-out + bag prefilter (the default).

Each child runs the bench's exact d=2 workload (500 glued 8-token EN
docs, the 28x cell-blowup shape) twice: rep 1 = cold worker caches (the
deep path's arena), rep 2 = bench.py's steady state. Parent stamps
host-bandwidth probes before/after (BASELINE.md protocol).

Usage:
    git worktree add /tmp/r5base HEAD
    python jobs/ab_bag_prefilter.py --base-tree /tmp/r5base
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EN_DICT = "/root/reference/symspellpy/frequency_dictionary_en_82_765.txt"


def bw_probe(seconds: float = 5.0) -> int:
    import numpy as np

    a = np.arange(8 * 1024 * 1024, dtype=np.uint64)
    t_end = time.time() + seconds
    reps = 0
    while time.time() < t_end:
        (a * np.uint64(2862933555777941757)).min()
        reps += 1
    return int(reps * (5.0 / seconds))


def child(tree: str, cores: int, inner_reps: int) -> None:
    """One cell: build the bench's sdocs_d2 workload against the engine
    tree at ``tree``, time the d=2 segmentation batch ``inner_reps``
    times, print one JSON line."""
    sys.path.insert(0, tree)

    from pyspark.sql import functions as F

    from symspellpy_spark.operators.dictionary import SparkDictionary
    from symspellpy_spark.operators.segmentation import (
        word_segmentation_batch,
    )
    from symspellpy_spark.session import get_spark

    spark = get_spark("ab_bag_prefilter", cores=cores)
    d = SparkDictionary.load_dictionary(spark, EN_DICT).cache()
    d.deletes.count()

    # bench.py's sdocs_d2, verbatim (en_scale=1): 500 docs of 8 glued
    # >=6-char dictionary terms
    pool = (
        d.words.where(F.length("term") >= 6)
        .orderBy(F.desc("count"))
        .limit(16000)
        .withColumn("rn", F.monotonically_increasing_id())
    )
    sdocs = (
        pool.crossJoin(spark.range(10).withColumnRenamed("id", "rep"))
        .select(
            F.col("term").alias("w"),
            ((F.col("rn") * 10 + F.col("rep")) % 20000)
            .cast("long")
            .alias("doc_id"),
        )
        .groupBy("doc_id")
        .agg(F.concat_ws("", F.collect_list("w")).alias("text"))
        .localCheckpoint(eager=True)
    )
    sdocs_d2 = sdocs.where(F.col("doc_id") < 500).localCheckpoint(eager=True)
    n = sdocs_d2.count()

    # warm codegen/broadcast machinery WITHOUT touching the d=2 deep
    # path: a d=0 run compiles the segmentation stages but never builds
    # a FuzzyIndex resolver, so rep 1 below is a true cold-cache d=2
    word_segmentation_batch(sdocs_d2, d, max_edit_distance=0).count()

    reps = []
    checksum = None
    for _ in range(inner_reps):
        t0 = time.perf_counter()
        seg = word_segmentation_batch(sdocs_d2, d, max_edit_distance=2)
        rows = seg.count()
        reps.append(round(time.perf_counter() - t0, 3))
        # output invariant across cells: same rows + same corrected-text
        # hash sum (cheap full-value check, computed untimed)
        # bit_xor, not sum: xxhash64 spans the full int64 range and a
        # sum overflows under Spark 4's default ANSI mode; XOR is
        # order-independent and overflow-free
        checksum = (
            rows,
            seg.select(
                F.expr(
                    "bit_xor(xxhash64(doc_id, segmented_string,"
                    " corrected_string, distance_sum))"
                ).alias("h")
            ).collect()[0]["h"],
        )
    print(
        "CHILD"
        + json.dumps(
            {
                "tree": tree,
                "prefilter": os.environ.get("SGRAFT_BAG_PREFILTER", "1"),
                "docs": n,
                "reps": reps,
                "checksum": list(checksum),
            }
        )
    )
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2,
                    help="interleaved passes over the cells")
    ap.add_argument("--inner-reps", type=int, default=2)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--base-tree", default=None,
                    help="pre-change engine tree (git worktree of HEAD); "
                         "omit to compare only prefilter off/on")
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--tree", default=REPO)
    args = ap.parse_args()

    if args.child:
        child(args.tree, args.cores, args.inner_reps)
        return

    cells = [("off", REPO, "0"), ("on", REPO, "1")]
    if args.base_tree:
        cells.insert(0, ("base", args.base_tree, "1"))

    bw_before = bw_probe()
    runs: dict[str, list[dict]] = {label: [] for label, _, _ in cells}
    for _ in range(args.reps):
        for label, tree, flag in cells:
            # PYTHONPATH + cwd both select the WORKER-side engine tree
            # (the ab_pipeline.py pattern that carried BENCH_AB_r04):
            # module-level kernel symbols (TopResolver, worker_resolver)
            # are cloudpickled BY REFERENCE, so local-mode python
            # workers — which inherit the driver's environment — must
            # import the same tree the driver planned with
            env = dict(
                os.environ, SGRAFT_BAG_PREFILTER=flag, PYTHONPATH=tree
            )
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 "--tree", tree, "--cores", str(args.cores),
                 "--inner-reps", str(args.inner_reps)],
                env=env, capture_output=True, text=True, check=True,
                cwd=tree,
            )
            line = [l for l in out.stdout.splitlines()
                    if l.startswith("CHILD")][-1]
            runs[label].append(json.loads(line[len("CHILD"):]))
    bw_after = bw_probe()

    sums = {r["checksum"][1] for rs in runs.values() for r in rs}
    rowns = {r["checksum"][0] for rs in runs.values() for r in rs}
    summary: dict = {
        "bw_before": bw_before,
        "bw_after": bw_after,
        "identical_output": len(sums) == 1 and len(rowns) == 1,
        "cells": runs,
    }
    for label, _, _ in cells:
        rs = runs[label]
        docs = rs[0]["docs"]
        cold = min(r["reps"][0] for r in rs)
        best = min(min(r["reps"]) for r in rs)
        summary[f"{label}_cold_best_sec"] = cold
        summary[f"{label}_steady_best_sec"] = best
        summary[f"{label}_cold_docs_per_sec"] = round(docs / cold, 1)
        summary[f"{label}_steady_docs_per_sec"] = round(docs / best, 1)
    if args.base_tree:
        summary["cold_speedup_vs_base"] = round(
            summary["base_cold_best_sec"] / summary["on_cold_best_sec"], 3
        )
        summary["steady_speedup_vs_base"] = round(
            summary["base_steady_best_sec"] / summary["on_steady_best_sec"],
            3,
        )
    summary["prefilter_cold_speedup"] = round(
        summary["off_cold_best_sec"] / summary["on_cold_best_sec"], 3
    )
    summary["prefilter_steady_speedup"] = round(
        summary["off_steady_best_sec"] / summary["on_steady_best_sec"], 3
    )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
