"""Benchmark harness.

Runs the engine's headline workloads at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": ..., "unit": "sec", "queries": {...},
"sf": ...}.

Workloads:
- testdata-table queries (index build, fuzzy lookup, ANN top-k,
  sessionization, TPC-H-style rollup) straight from __spark_entry__;
- the flagship near-dup pipeline (signatures -> LSH/SimHash/substring
  candidates -> exact-Jaccard verify -> connected components) over a
  deterministic synthesized Common-Crawl-style corpus sized by sf
  (the testdata documents table has a 31-word vocabulary — too small to
  exercise signature stages), reporting docs/sec.

Env:
  SPARK_GRAFT_SF_DIR   input dir            (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local parallelism    (default 32)
  BENCH_PIPELINE_DOCS  override corpus size (default 200000*sf)
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from symspellpy_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1
    n_pages = int(os.environ.get("BENCH_PIPELINE_DOCS", str(int(200_000 * sf))))
    min_tok, max_tok = map(
        int, os.environ.get("BENCH_DOC_TOKENS", "80,400").split(",")
    )

    spark = get_spark("bench", cores=cpus)

    import __spark_entry__ as E
    from symspellpy_spark.plans.pipeline import DedupConfig, DedupPipeline
    from symspellpy_spark.sources.pages import synthesize_pages

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        return out

    # --- testdata-table workloads ---
    timed("index_build", lambda: E.q_deletes_index(spark, sf_dir).count())
    timed("lookup_top", lambda: E.q_lookup_top(spark, sf_dir).count())
    timed("embedding_topk", lambda: E.q_embedding_topk(spark, sf_dir).count())
    timed("sessionize", lambda: E.q_sessionize(spark, sf_dir).count())
    timed("tpch_q1", lambda: E.q_tpch_q1(spark, sf_dir).count())

    # --- flagship pipeline over synthesized pages ---
    pages = timed(
        "pages_synth",
        lambda: synthesize_pages(
            spark,
            n_docs=n_pages,
            n_base=n_pages // 4,
            seed=42,
            min_tokens=min_tok,
            max_tokens=max_tok,
        ).localCheckpoint(eager=True),
    )
    pipe = DedupPipeline(spark, DedupConfig())
    timed("pipeline_signatures", lambda: pipe.signatures(pages).count())
    timed("pipeline_edges", lambda: pipe.edges(pages).count())
    timed("pipeline_clusters", lambda: pipe.clusters(pages).count())

    pipeline_sec = (
        timings["pipeline_signatures"]
        + timings["pipeline_edges"]
        + timings["pipeline_clusters"]
    )
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                "pipeline_docs": n_pages,
                "pipeline_sec": round(pipeline_sec, 3),
                "docs_per_sec": round(n_pages / pipeline_sec, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
