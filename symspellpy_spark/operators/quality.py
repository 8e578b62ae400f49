"""Document-quality signals: the Gopher/MassiveText repetition family.

The published filter set (Rae et al. 2021, "Scaling Language Models:
Methods, Analysis & Insights from Training Gopher", Table A1) scores
each document by within-document n-gram repetition along two axes,
both defined over CHARACTER fractions (as in the public DataTrove /
RefinedWeb reimplementations):

- the fraction of characters contained within the single most frequent
  {2,3,4}-gram (templated/boilerplate text repeats one phrase over and
  over): ``count(top gram) * chars(top gram) / doc chars``;
- the fraction of characters contained within duplicate {5..10}-grams
  (degenerate text loops long passages): characters covered by REPEAT
  occurrences of a within-doc-duplicated gram — every occurrence after
  the first, position-union (overlaps counted once) — over doc chars.
  Excluding the first occurrence matches the published calibration
  (DataTrove's greedy ``find_all_duplicate`` counts only repeats; in
  the non-overlapping case the two measures coincide), while the union
  keeps the measure order-free and exactly replayable in SQL.

Character accounting here is whitespace-free on both sides of every
division (token characters only; separators contribute to neither
numerator nor denominator), which keeps each fraction an exact-integer
ratio both engines compute identically — a deterministic variant of the
published raw-text measure. ``gopher_ngram_stats`` emits the character
fractions alongside the gram-count diagnostics (``top_frac`` /
``dup_frac``), in long form — one row per (document, n) — so a filter
applies its per-n thresholds with a single pivot-free ``where``. All
counts are exact integers and each fraction is ONE IEEE division of two
exact integers, so a DuckDB replay is bit-identical (the pattern the
single-n ``gopher_repetition`` contract entry established).

Shape (100 TB story): pure Catalyst — the n fan-out and the per-n gram
explode are bounded by ``|ns| * doc_len`` rows per document, repetition
is per-document so nothing ever self-joins, and every aggregation
combines map-side. The duplicate-coverage pass joins gram occurrences
back to the per-(doc, n, gram) counts on a key that INCLUDES the doc
id, so — unlike a corpus-level gram join — its skew is bounded by
document length, never by a gram's corpus ubiquity. Gram keys are
strings here because the stats need exact distinct counts that an
oracle can replay; a recall-tolerant variant can xxhash64 the gram
before the shuffle exactly as ``duplicate_spans`` does.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["gopher_ngram_stats", "gopher_quality_filter", "GOPHER_THRESHOLDS"]

_DEFAULT_TOKEN_RE = "[a-z0-9]+"

# Published MassiveText repetition thresholds (Rae et al. 2021 Table A1):
# a document is dropped when the CHARACTER fraction EXCEEDS the threshold.
GOPHER_THRESHOLDS: dict[str, dict[int, float]] = {
    "top_char_frac": {2: 0.20, 3: 0.18, 4: 0.16},
    "dup_char_frac": {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10},
}


def gopher_ngram_stats(
    docs: DataFrame,
    ns: Sequence[int] = (2, 3, 4, 5, 6, 7, 8, 9, 10),
    token_re: str = _DEFAULT_TOKEN_RE,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (id, n, n_grams, n_distinct, top_count, top_frac, dup_frac,
    doc_chars, top_char_frac, dup_char_frac): within-document n-gram
    repetition statistics for every ``n``.

    Character signals (the published Gopher measures; whitespace-free):

    - ``top_char_frac = top_count * chars(top gram) / doc_chars`` where
      the top gram is the most frequent by count (ties broken
      deterministically by gram char length then lexicographic order,
      identically in the SQL oracle);
    - ``dup_char_frac = covered_chars / doc_chars`` where
      ``covered_chars`` sums the characters of token positions covered
      by a REPEAT occurrence (any occurrence after the first, by start
      position) of a within-doc-duplicated gram, as a position union —
      overlapping repeats never double-count, so the fraction is always
      in [0, 1], and the first occurrence contributes nothing, matching
      the published implementations' repeat-only accounting.

    Gram-count diagnostics (retained): ``top_frac = top_count /
    n_grams``; ``dup_frac = (n_grams - n_distinct) / n_grams``.

    A (doc, n) row exists only when the document has at least ``n``
    tokens (``n_grams >= 1``), so no fraction ever divides by zero
    (``doc_chars >= 1`` whenever a token exists).
    """
    if not ns or any(n < 1 for n in ns):
        raise ValueError(f"ns must be non-empty positive ints, got {ns!r}")
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(token_re), 0
        ).alias("ts"),
    ).select(
        "id",
        "ts",
        F.length(F.array_join("ts", "")).cast("long").alias("doc_chars"),
    )
    fan = toks.select(
        "id",
        "ts",
        "doc_chars",
        F.explode(F.array(*[F.lit(int(n)) for n in ns])).alias("n"),
    ).where(F.size("ts") >= F.col("n"))
    # one row per gram OCCURRENCE, with its start position i (posexplode
    # index == i because the transform enumerates starts in order)
    occ = fan.select(
        "id",
        "n",
        "doc_chars",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("ts") - F.col("n")),
                lambda i: F.concat_ws(
                    " ", F.slice("ts", i + 1, F.col("n"))
                ),
            )
        ).alias("i", "g"),
    )
    cnt = occ.groupBy("id", "n", "doc_chars", "g").agg(
        F.count(F.lit(1)).alias("c"),
        F.min("i").alias("first_i"),
    )
    # chars of the gram's tokens = length(g) minus its n-1 separators
    clen = (F.length("g") - (F.col("n") - F.lit(1))).cast("long")
    stats = cnt.groupBy("id", "n", "doc_chars").agg(
        F.sum("c").alias("n_grams"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_count"),
        F.max(
            F.struct(
                F.col("c").alias("c"), clen.alias("clen"), F.col("g").alias("g")
            )
        ).alias("top"),
    )
    # duplicate-coverage: positions covered by REPEAT occurrences of
    # duplicated grams (first occurrence excluded), as a position union;
    # the join key includes the doc id, so skew is bounded by doc length
    dup_occ = (
        occ.join(
            cnt.where(F.col("c") >= 2).select("id", "n", "g", "first_i"),
            ["id", "n", "g"],
        )
        .where(F.col("i") != F.col("first_i"))
        .select("id", "n", "i")
    )
    tokpos = toks.select(
        "id", F.posexplode("ts").alias("j", "t")
    ).select("id", "j", F.length("t").cast("long").alias("tl"))
    covered = (
        dup_occ.select(
            "id",
            "n",
            F.explode(
                F.sequence(F.col("i"), F.col("i") + F.col("n") - 1)
            ).alias("j"),
        )
        .distinct()
        .join(tokpos, ["id", "j"])
        .groupBy("id", "n")
        .agg(F.sum("tl").alias("dup_chars"))
    )
    out = stats.join(covered, ["id", "n"], "left")
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    return out.select(
        "id",
        F.col("n").cast("int").alias("n"),
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.col("top_count").cast("long").alias("top_count"),
        (dbl("top_count") / dbl("n_grams")).alias("top_frac"),
        (
            (F.col("n_grams") - F.col("n_distinct")).cast("double")
            / dbl("n_grams")
        ).alias("dup_frac"),
        F.col("doc_chars"),
        (
            (F.col("top.c") * F.col("top.clen")).cast("double")
            / dbl("doc_chars")
        ).alias("top_char_frac"),
        (
            F.coalesce(F.col("dup_chars"), F.lit(0)).cast("double")
            / dbl("doc_chars")
        ).alias("dup_char_frac"),
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
    ``top_char_frac(n) <= thresholds['top_char_frac'][n]`` for every
    top-n and ``dup_char_frac(n) <= thresholds['dup_char_frac'][n]``
    for every dup-n (defaults: the published MassiveText values,
    strict-greater drop, applied to the character fractions the paper
    defines — see the module docstring for the whitespace-free
    accounting). Documents too short to form any configured n-gram have
    nothing to repeat and are kept. One aggregation over the stats — no
    second corpus scan.

    Note: the published thresholds presume MassiveText's companion
    minimum-length gate (~50 words) runs first — on very short
    documents a SINGLE long {2,3,4}-gram can exceed a top-n character
    bar (ties at count 1 resolve to the longest gram here; DataTrove's
    insertion-order tie is equally arbitrary on such docs). Compose
    with a length filter, as the corpus job's boilerplate stage
    effectively does.
    """
    th = thresholds or GOPHER_THRESHOLDS
    ns = sorted({*th.get("top_char_frac", {}), *th.get("dup_char_frac", {})})
    stats = gopher_ngram_stats(
        docs, ns=ns, token_re=token_re, id_col=id_col, text_col=text_col
    )
    top_map = th.get("top_char_frac", {})
    dup_map = th.get("dup_char_frac", {})
    viol = F.lit(False)
    for n, t in sorted(top_map.items()):
        viol = viol | ((F.col("n") == n) & (F.col("top_char_frac") > t))
    for n, t in sorted(dup_map.items()):
        viol = viol | ((F.col("n") == n) & (F.col("dup_char_frac") > t))
    verdict = stats.groupBy("id").agg(
        (~F.max(viol.cast("int")).cast("boolean")).alias("keep")
    )
    return docs.select(F.col(id_col).alias("id")).join(
        verdict, "id", "left"
    ).select("id", F.coalesce("keep", F.lit(True)).alias("keep"))
