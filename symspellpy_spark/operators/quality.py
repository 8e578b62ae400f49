"""Document-quality signals: the Gopher/MassiveText repetition family.

The published filter set (Rae et al. 2021, "Scaling Language Models:
Methods, Analysis & Insights from Training Gopher", Table A1) scores
each document by within-document n-gram repetition along two axes:

- the fraction contributed by the single most frequent {2,3,4}-gram
  (templated/boilerplate text repeats one phrase over and over);
- the fraction of duplicate {5..10}-grams (degenerate text loops long
  passages).

:func:`gopher_ngram_stats` computes BOTH families for every requested
``n`` in one pass, in long form — one row per (document, n) — so a
filter applies its per-n thresholds with a single pivot-free ``where``.
All counts are exact integers and each fraction is ONE IEEE division of
two exact integers, so a DuckDB replay is bit-identical (the pattern
the single-n ``gopher_repetition`` contract entry established).

Shape (100 TB story): pure Catalyst — the n fan-out and the per-n gram
explode are bounded by ``|ns| * doc_len`` rows per document, repetition
is per-document so nothing ever self-joins, and the two aggregations
(per-(doc, n, gram) count, then per-(doc, n) rollup) both combine
map-side. Gram keys are strings here because the stats need exact
distinct counts that an oracle can replay; a recall-tolerant variant
can xxhash64 the gram before the shuffle exactly as
``duplicate_spans`` does.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["gopher_ngram_stats", "gopher_quality_filter", "GOPHER_THRESHOLDS"]

_DEFAULT_TOKEN_RE = "[a-z0-9]+"

# Published MassiveText repetition thresholds (Rae et al. 2021 Table A1):
# a document is dropped when the fraction EXCEEDS the threshold.
GOPHER_THRESHOLDS: dict[str, dict[int, float]] = {
    "top_frac": {2: 0.20, 3: 0.18, 4: 0.16},
    "dup_frac": {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10},
}


def gopher_ngram_stats(
    docs: DataFrame,
    ns: Sequence[int] = (2, 3, 4, 5, 6, 7, 8, 9, 10),
    token_re: str = _DEFAULT_TOKEN_RE,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (id, n, n_grams, n_distinct, top_count, top_frac, dup_frac):
    within-document n-gram repetition statistics for every ``n``.

    ``top_frac = top_count / n_grams`` is the most-frequent-n-gram
    fraction (the Gopher top-{2,3,4}-gram signal); ``dup_frac =
    (n_grams - n_distinct) / n_grams`` is the duplicate-n-gram fraction
    (the Gopher dup-{5..10}-gram signal). A (doc, n) row exists only
    when the document has at least ``n`` tokens (``n_grams >= 1``), so
    neither fraction ever divides by zero.
    """
    if not ns or any(n < 1 for n in ns):
        raise ValueError(f"ns must be non-empty positive ints, got {ns!r}")
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(token_re), 0
        ).alias("ts"),
    )
    fan = toks.select(
        "id",
        "ts",
        F.explode(F.array(*[F.lit(int(n)) for n in ns])).alias("n"),
    ).where(F.size("ts") >= F.col("n"))
    grams = fan.select(
        "id",
        "n",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("ts") - F.col("n")),
                lambda i: F.concat_ws(
                    " ", F.slice("ts", i + 1, F.col("n"))
                ),
            )
        ).alias("g"),
    )
    agg = (
        grams.groupBy("id", "n", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("id", "n")
        .agg(
            F.sum("c").alias("n_grams"),
            F.count("*").alias("n_distinct"),
            F.max("c").alias("top_count"),
        )
    )
    return agg.select(
        "id",
        F.col("n").cast("int").alias("n"),
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.col("top_count").cast("long").alias("top_count"),
        (
            F.col("top_count").cast("double") / F.col("n_grams").cast("double")
        ).alias("top_frac"),
        (
            (F.col("n_grams") - F.col("n_distinct")).cast("double")
            / F.col("n_grams").cast("double")
        ).alias("dup_frac"),
    )


def gopher_quality_filter(
    docs: DataFrame,
    thresholds: dict[str, dict[int, float]] | None = None,
    token_re: str = _DEFAULT_TOKEN_RE,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (id, keep): the repetition-filter verdict per document.

    A document is kept iff NO configured signal exceeds its threshold:
    ``top_frac(n) <= thresholds['top_frac'][n]`` for every top-n and
    ``dup_frac(n) <= thresholds['dup_frac'][n]`` for every dup-n
    (defaults: the published MassiveText values, strict-greater drop).
    Documents too short to form any configured n-gram have nothing to
    repeat and are kept. One aggregation over the stats — no second
    corpus scan.
    """
    th = thresholds or GOPHER_THRESHOLDS
    ns = sorted({*th.get("top_frac", {}), *th.get("dup_frac", {})})
    stats = gopher_ngram_stats(
        docs, ns=ns, token_re=token_re, id_col=id_col, text_col=text_col
    )
    top_map = th.get("top_frac", {})
    dup_map = th.get("dup_frac", {})
    viol = F.lit(False)
    for n, t in sorted(top_map.items()):
        viol = viol | ((F.col("n") == n) & (F.col("top_frac") > t))
    for n, t in sorted(dup_map.items()):
        viol = viol | ((F.col("n") == n) & (F.col("dup_frac") > t))
    verdict = stats.groupBy("id").agg(
        (~F.max(viol.cast("int")).cast("boolean")).alias("keep")
    )
    return docs.select(F.col(id_col).alias("id")).join(
        verdict, "id", "left"
    ).select("id", F.coalesce("keep", F.lit(True)).alias("keep"))
