"""Same-process interleaved A/B: Gopher repetition stage, doc-local
Arrow kernel vs the round-4 relational formulation.

Round-5 full bench (BENCH artifacts) attributed 47.2 s of the 64.1 s
composed corpus job to the gopher stage — the relational shape explodes
every n-gram occurrence STRING for all 9 published n values through a
hash aggregate and a coverage join-back, so its cost is dominated by
shuffling ~9x the corpus' token mass as strings. Repetition is strictly
per-document, so ``operators/quality.py`` now defaults to a doc-local
``mapInPandas`` kernel (zero exchanges, one narrow pass); the relational
path remains selectable (``strategy="relational"``) and is proven
bit-identical by ``tests/test_quality.py::test_kernel_matches_relational``
plus the unchanged DuckDB contract oracles.

This harness replays the EXACT bench stage — same synthesized corpus
(seed 42, 60k pages, 80-400 tokens), same crc32 1-in-12 winnowing
subset, same keep -> left_semi join-back consumption as
``jobs/corpus_job.py``'s gopher stage — interleaving the two strategies
rel,kern,rel,kern in ONE warm JVM so both see identical host phase and
cache state, with before/after host-bandwidth probes (BASELINE.md
protocol). Survivor counts must agree across every cell.

Usage: python jobs/ab_gopher_kernel.py [--reps 2] [--cores 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def bw_probe(seconds: float = 5.0) -> int:
    import numpy as np

    a = np.arange(8 * 1024 * 1024, dtype=np.uint64)
    t_end = time.time() + seconds
    reps = 0
    while time.time() < t_end:
        (a * np.uint64(2862933555777941757)).min()
        reps += 1
    return int(reps * (5.0 / seconds))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--docs", type=int, default=60_000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from symspellpy_spark.operators.quality import gopher_quality_filter
    from symspellpy_spark.session import get_spark
    from symspellpy_spark.sources.pages import synthesize_pages

    spark = get_spark("ab_gopher_kernel", cores=args.cores)
    pages = synthesize_pages(
        spark,
        n_docs=args.docs,
        n_base=args.docs // 4,
        seed=42,
        min_tokens=80,
        max_tokens=400,
    ).localCheckpoint(eager=True)
    frac = max(1, args.docs // 5_000)
    win = pages.where(F.crc32(F.col("url")) % frac == 0).localCheckpoint(
        eager=True
    )
    n_win = win.count()

    def stage(strategy: str) -> tuple[float, int]:
        t0 = time.perf_counter()
        keep = (
            gopher_quality_filter(win, id_col="url", strategy=strategy)
            .where(F.col("keep"))
            .select(F.col("id").alias("url"))
        )
        n = win.join(keep, "url", "left_semi").count()
        return round(time.perf_counter() - t0, 3), n

    # warmup both codegen/Arrow paths on a small slice (untimed)
    small = win.limit(200).localCheckpoint(eager=True)
    for s in ("relational", "kernel"):
        gopher_quality_filter(small, id_col="url", strategy=s).count()

    bw_before = bw_probe()
    cells: dict[str, list[float]] = {"relational": [], "kernel": []}
    survivors: set[int] = set()
    for _ in range(args.reps):
        for s in ("relational", "kernel"):
            sec, n = stage(s)
            cells[s].append(sec)
            survivors.add(n)
    bw_after = bw_probe()

    out = {
        "bw_before": bw_before,
        "bw_after": bw_after,
        "docs": n_win,
        "identical_survivors": len(survivors) == 1,
        "survivors": sorted(survivors),
        "relational_sec": cells["relational"],
        "kernel_sec": cells["kernel"],
        "relational_best_sec": min(cells["relational"]),
        "kernel_best_sec": min(cells["kernel"]),
        "speedup": round(
            min(cells["relational"]) / min(cells["kernel"]), 2
        ),
        "kernel_docs_per_sec": round(n_win / min(cells["kernel"]), 1),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
