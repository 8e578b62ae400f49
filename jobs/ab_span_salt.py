"""Same-session A/B: duplicate-span hot-join salting on a skewed corpus.

VERDICT_r04 Next #5: ``duplicate_spans(join_salt=...)`` exists as the
deterministic skew defense for the duplicated-gram join-back, but
defaults off; measure a skewed corpus (one boilerplate gram planted in
~30% of docs) and either enable a sane default or document the
threshold where it pays.

The decisive variable is the JOIN REGIME, not just the salt:

- **broadcast regime** (the default config): the duplicated-gram
  aggregate is small, AQE broadcasts it, the join-back never shuffles —
  a hot gram costs nothing extra and the salt can only add work
  (S-way aggregate replication + a wider join key).
- **shuffle regime** (models 100 TB, where the hot set exceeds any
  broadcast threshold — forced here with
  ``spark.sql.autoBroadcastJoinThreshold=-1``): the join shuffles on
  the gram hash, a gram occurring in 30% of docs lands ALL its
  occurrence rows in one task, and the salt spreads that task S ways.
  AQE's skew-join split is the runtime alternative; it is measured
  both on and off.

So the A/B interleaves salt=1 / salt=8 within each regime in ONE host
phase (probe-stamped per the BASELINE.md protocol), asserts the span
output is IDENTICAL across salts (the correctness invariant: results
are a pure function of the data for any S), and prints one JSON line
per cell for BENCH_SPAN_SALT.json.

Usage:
    python jobs/ab_span_salt.py [--docs 60000] [--hot-frac 0.3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


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
    ap.add_argument("--docs", type=int, default=60_000)
    ap.add_argument("--hot-frac", type=float, default=0.3)
    ap.add_argument("--salt", type=int, default=8)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    bw_before = bw_probe()

    from pyspark.sql import functions as F

    from symspellpy_spark.operators.corpus_prep import duplicate_spans
    from symspellpy_spark.session import get_spark
    from symspellpy_spark.sources.pages import synthesize_pages

    spark = get_spark("ab_span_salt", cores=args.cores)

    # skewed corpus: the bench synthesizer's pages, with one 8-token
    # boilerplate sentence PREPENDED to a deterministic ~hot_frac of
    # docs — one gram (plus its overlap neighbors) occurring in 30% of
    # the corpus, the "cookie banner" shape the salt exists for
    hot_mod = max(1, round(1 / args.hot_frac))
    boiler = "please accept all cookies to continue reading this site"
    pages = (
        synthesize_pages(
            spark, n_docs=args.docs, n_base=args.docs // 4, seed=42
        )
        .withColumn(
            "text",
            F.when(
                F.pmod(F.xxhash64("url"), F.lit(hot_mod)) == 0,
                F.concat(F.lit(boiler + " "), F.col("text")),
            ).otherwise(F.col("text")),
        )
        .localCheckpoint(eager=True)
    )
    n = pages.count()

    def run(salt: int, broadcast: bool) -> float:
        thresh = "10485760" if broadcast else "-1"
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        t0 = time.perf_counter()
        duplicate_spans(
            pages, k=8, id_col="url", join_salt=salt
        ).count()
        return round(time.perf_counter() - t0, 3)

    # correctness first: identical span relations for salt=1 vs salt=S
    a = duplicate_spans(pages, k=8, id_col="url", join_salt=1)
    b = duplicate_spans(pages, k=8, id_col="url", join_salt=args.salt)
    cols = ["id", "span_id", "span_start", "span_end", "n_grams"]
    diff = (
        a.select(cols).exceptAll(b.select(cols)).count()
        + b.select(cols).exceptAll(a.select(cols)).count()
    )
    assert diff == 0, f"salted spans differ from unsalted: {diff} rows"

    # warmup (codegen) before any timed cell
    run(1, True)

    results = []
    for broadcast in (True, False):
        for skew_join in ((True,) if broadcast else (True, False)):
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.enabled", str(skew_join).lower()
            )
            cell: dict = {
                "regime": "broadcast" if broadcast else "shuffle",
                "aqe_skew_join": skew_join,
                "n_docs": n,
                "hot_frac": args.hot_frac,
            }
            # interleave salt=1 / salt=S within the cell so host drift
            # lands on both sides (the ab_pipeline.py protocol)
            reps: dict[int, list[float]] = {1: [], args.salt: []}
            for _ in range(args.reps):
                for salt in (1, args.salt):
                    reps[salt].append(run(salt, broadcast))
            for salt in (1, args.salt):
                cell[f"salt{salt}_reps"] = reps[salt]
                cell[f"salt{salt}_best"] = min(reps[salt])
            results.append(cell)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    bw_after = bw_probe()
    print(
        json.dumps(
            {
                "bw_before": bw_before,
                "bw_after": bw_after,
                "salt": args.salt,
                "identical_output": True,
                "cells": results,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
