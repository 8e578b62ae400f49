"""Batch word segmentation.

Reference: ``SymSpell.word_segmentation`` (symspellpy.py:867-1015) — a
triangular DP over all (start, length<=max_word_len) substrings with a
circular Composition buffer, where each cell consults a TOP lookup.

Spark shape: the O(n * max_word_len) substring enumeration, space
accounting, and probability scoring are pure Catalyst expressions; the
inner lookups are hoisted into ONE batch ``lookup_batch`` over distinct
part strings; only the (inherently sequential, per-document) DP relax
loop runs in ``applyInPandas``. This mirrors the reference's exact cell
ordering and tie-breaking (symspellpy.py:976-1013).
"""

from __future__ import annotations

import math
import string as _string
import unicodedata

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StringType

from symspellpy_spark.config import DistanceAlgorithm, Verbosity
from symspellpy_spark.operators.dictionary import SparkDictionary
from symspellpy_spark.operators.lookup import lookup_batch
from symspellpy_spark.operators.neighborhood import (
    fuzzy_index_broadcast,
    worker_resolver,
)

__all__ = ["word_segmentation_batch", "nfkc_strip_hyphens_udf"]


def nfkc_strip_hyphens_udf():
    """NFKC normalize + remove U+002D (reference symspellpy.py:906)."""

    @F.pandas_udf(StringType())
    def _norm(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: None
            if x is None
            else unicodedata.normalize("NFKC", x).replace("-", "")
        )

    return _norm


def word_segmentation_batch(
    docs: DataFrame,
    dictionary: SparkDictionary,
    max_edit_distance: int | None = None,
    max_segmentation_word_length: int | None = None,
    ignore_pattern: str | None = None,
    doc_col: str = "doc_id",
    text_col: str = "text",
    strategy: str = "auto",
    broadcast_vocab_limit: int = 1_000_000,
) -> DataFrame:
    """-> (doc_id, segmented_string, corrected_string, distance_sum,
    log_prob_sum) — one row per document (the reference's Composition).

    At ``max_edit_distance=0`` every inner lookup is a plain membership
    probe, so instead of exploding O(len * max_word_len) substring rows
    into a join + shuffle, the words table is broadcast as a plain dict
    into a ``mapInPandas`` kernel and the whole DP runs doc-local —
    same results, no per-substring relation.

    For fuzzy (d > 0) segmentation the default (``strategy="auto"``) is
    the broadcast-LUT path: ONE relational ``lookup_batch`` over the
    corpus's *distinct* part strings (the delete index does its job
    exactly once per distinct string), then only the FOUND entries are
    broadcast as a dict and the DP runs doc-local. Unknown parts never
    need the LUT — their score is the closed unknown-word formula — so
    the broadcast is bounded by |distinct substrings within d of the
    vocabulary| (≈ vocab × neighborhood, NOT corpus size). Pass
    ``strategy="relational"`` to shuffle every scored (doc, j, i) cell
    into a per-document ``applyInPandas`` fold instead — the shape to
    use when the found-part set itself is too large to broadcast.
    """
    cfg = dictionary.config
    if max_edit_distance is None:
        max_edit_distance = cfg.max_dictionary_edit_distance
    if max_segmentation_word_length is None:
        max_segmentation_word_length = dictionary.max_length
    n_const = float(cfg.corpus_n)
    max_word_len = max_segmentation_word_length

    # the broadcast fast paths collect the whole vocabulary to the
    # driver (fine at dictionary scale: 82k terms ~ 2MB; a 100TB-corpus
    # vocabulary is a driver/worker-memory bottleneck) — above the
    # limit, route to the relational shape automatically
    broadcastable = (
        strategy != "relational"
        and dictionary.num_terms <= broadcast_vocab_limit
    )
    if max_edit_distance == 0 and broadcastable:
        return _segmentation_broadcast_d0(
            docs,
            dictionary,
            max_word_len,
            ignore_pattern,
            n_const,
            doc_col,
            text_col,
        )
    if strategy == "auto" and broadcastable:
        return _segmentation_broadcast_fuzzy(
            docs,
            dictionary,
            max_edit_distance,
            max_word_len,
            ignore_pattern,
            n_const,
            doc_col,
            text_col,
        )

    norm = nfkc_strip_hyphens_udf()
    docs = docs.select(
        F.col(doc_col).alias("doc_id"), norm(F.col(text_col)).alias("phrase")
    )

    # all (j, i) parts, with the reference's space accounting
    # (symspellpy.py:925-942) done relationally
    parts = (
        docs.where(F.length("phrase") > 0)
        .select(
            "doc_id",
            "phrase",
            F.explode(F.sequence(F.lit(0), F.length("phrase") - 1)).alias("j"),
        )
        .select(
            "doc_id",
            "phrase",
            "j",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.least(
                        F.length("phrase") - F.col("j"), F.lit(max_word_len)
                    ),
                )
            ).alias("i"),
        )
        .select(
            "doc_id",
            "j",
            "i",
            F.expr("substring(phrase, j + 1, i)").alias("raw_part"),
        )
        .withColumn(
            "lead_space", F.substring("raw_part", 1, 1).rlike(r"(?U)^\s")
        )
        .withColumn(
            "part1",
            F.when(
                F.col("lead_space"), F.expr("substring(raw_part, 2, 2147483647)")
            ).otherwise(F.col("raw_part")),
        )
        .withColumn("separator_len", F.when(F.col("lead_space"), 0).otherwise(1))
        .withColumn("part", F.replace(F.col("part1"), F.lit(" "), F.lit("")))
        .withColumn(
            "spaces_removed", F.length("part1") - F.length("part")
        )
        .withColumn("query", F.lower(F.col("part")))
        .drop("raw_part", "part1", "lead_space")
    )

    lut = lookup_batch(
        parts.select("query"),
        dictionary,
        Verbosity.TOP,
        max_edit_distance=max_edit_distance,
        ignore_pattern=ignore_pattern,
    ).select(
        "query",
        F.col("term").alias("s_term"),
        F.col("distance").alias("s_dist"),
        F.col("count").alias("s_count"),
    )

    found = F.col("s_term").isNotNull()
    first_upper = F.substring("part", 1, 1) != F.lower(F.substring("part", 1, 1))
    scored = (
        parts.join(lut, "query", "left")
        .withColumn(
            "top_result",
            F.when(
                found,
                # capitalization retention (symspellpy.py:954-955):
                # Python str.capitalize() = upper first char, lower rest
                F.when(
                    (F.length("part") > 0) & first_upper,
                    F.concat(
                        F.upper(F.substring("s_term", 1, 1)),
                        F.lower(F.expr("substring(s_term, 2, 2147483647)")),
                    ),
                ).otherwise(F.col("s_term")),
            ).otherwise(F.col("part")),
        )
        .withColumn(
            "top_ed",
            F.col("spaces_removed")
            + F.when(found, F.col("s_dist")).otherwise(F.length("part")),
        )
        .withColumn(
            "top_log_prob",
            F.when(
                found, F.log10(F.col("s_count").cast("double") / F.lit(n_const))
            ).otherwise(
                F.lit(1.0)
                - F.log10(F.lit(n_const))
                - F.length("part").cast("double")
            ),
        )
        .select(
            "doc_id",
            "j",
            "i",
            "part",
            "separator_len",
            "top_result",
            "top_ed",
            "top_log_prob",
        )
    )

    punct = set(_string.punctuation)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["j", "i"])
        doc_id = pdf["doc_id"].iloc[0]
        n_j = int(pdf["j"].max()) + 1
        array_size = min(max_word_len, n_j)
        # Composition tuples: (segmented, corrected, distance_sum, log_prob_sum)
        comps = [("", "", 0, 0.0)] * array_size
        idx = -1
        cells = {(int(r.j), int(r.i)): r for r in pdf.itertuples()}
        for j in range(n_j):
            imax = min(n_j - j, max_word_len)
            for i in range(1, imax + 1):
                r = cells[(j, i)]
                part = r.part
                top_result = r.top_result
                top_ed = int(r.top_ed)
                top_log_prob = float(r.top_log_prob)
                separator_len = int(r.separator_len)
                dest = (i + idx) % array_size
                if j == 0:
                    comps[dest] = (part, top_result, top_ed, top_log_prob)
                elif (
                    i == max_word_len
                    or (
                        comps[dest][2]
                        in (
                            comps[idx][2] + top_ed,
                            comps[idx][2] + separator_len + top_ed,
                        )
                        and comps[dest][3] < comps[idx][3] + top_log_prob
                    )
                    or comps[idx][2] + separator_len + top_ed < comps[dest][2]
                ):
                    if (len(top_result) == 1 and top_result[0] in punct) or (
                        len(top_result) == 2 and top_result.startswith("'")
                    ):
                        comps[dest] = (
                            comps[idx][0] + part,
                            comps[idx][1] + top_result,
                            comps[idx][2] + top_ed,
                            comps[idx][3] + top_log_prob,
                        )
                    else:
                        comps[dest] = (
                            comps[idx][0] + " " + part,
                            comps[idx][1] + " " + top_result,
                            comps[idx][2] + separator_len + top_ed,
                            comps[idx][3] + top_log_prob,
                        )
            idx = (idx + 1) % array_size
        seg, corr, dist, logp = comps[idx]
        return pd.DataFrame(
            {
                "doc_id": [doc_id],
                "segmented_string": [seg],
                "corrected_string": [corr],
                "distance_sum": [dist],
                "log_prob_sum": [logp],
            }
        )

    doc_id_type = dict(docs.dtypes)["doc_id"]
    out_schema = (
        f"doc_id {doc_id_type}, segmented_string string, corrected_string string, "
        "distance_sum int, log_prob_sum double"
    )
    result = scored.groupBy("doc_id").applyInPandas(fold, schema=out_schema)
    return _with_empties(result, docs)


def _with_empties(result: DataFrame, docs: DataFrame) -> DataFrame:
    # empty/whitespace-normalized-away phrases produce no part rows; the
    # reference raises on these — we return the empty Composition instead
    empties = docs.where(F.length("phrase") == 0).select(
        "doc_id",
        F.lit("").alias("segmented_string"),
        F.lit("").alias("corrected_string"),
        F.lit(0).alias("distance_sum"),
        F.lit(0.0).alias("log_prob_sum"),
    )
    return result.unionByName(empties)


_PUNCT = set(_string.punctuation)
_WS_RE = None  # compiled lazily on executors


def _segment_phrase(
    phrase: str,
    resolve,
    max_word_len: int,
    n_const: float,
    log10_n: float,
) -> tuple[str, str, int, float]:
    """The reference's triangular DP over one phrase
    (symspellpy.py:925-1013), parameterized by ``resolve(query) ->
    (s_term, s_dist, s_count) | None`` — the only piece that differs
    between the d=0 membership kernel and the fuzzy broadcast-LUT
    kernel. Every scoring expression mirrors the relational path's
    Catalyst expression, so all strategies are bit-identical."""
    import re

    global _WS_RE
    if _WS_RE is None:
        _WS_RE = re.compile(r"\s")
    ws = _WS_RE
    punct = _PUNCT
    n_j = len(phrase)
    # ASCII whitespace-free fast path (the overwhelming cell shape for
    # glued web tokens): every cell then has lead=False, separator_len=1,
    # spaces_removed=0, part == raw slice and query == lower slice, so
    # the per-cell match/replace/lower collapses to two slices of
    # precomputed strings. Restricted to ASCII because str.lower() is
    # only context-free and length-preserving there (final sigma,
    # İ -> i+combining-dot would misalign the precomputed lower).
    if phrase.isascii() and ws.search(phrase) is None:
        return _segment_phrase_ascii(
            phrase, resolve, max_word_len, n_const, log10_n
        )
    array_size = min(max_word_len, n_j)
    comps = [("", "", 0, 0.0)] * array_size
    idx = -1
    for j in range(n_j):
        imax = min(n_j - j, max_word_len)
        for i in range(1, imax + 1):
            raw_part = phrase[j : j + i]
            lead = bool(ws.match(raw_part[:1]))
            part1 = raw_part[1:] if lead else raw_part
            separator_len = 0 if lead else 1
            part = part1.replace(" ", "")
            spaces_removed = len(part1) - len(part)
            query = part.lower()
            res = resolve(query)
            if res is not None:
                s_term, s_dist, s_count = res
                if part[:1] != part[:1].lower():
                    top_result = s_term[:1].upper() + s_term[1:].lower()
                else:
                    top_result = s_term
                top_ed = spaces_removed + s_dist
                top_log_prob = math.log10(float(s_count) / n_const)
            else:
                top_result = part
                top_ed = spaces_removed + len(part)
                top_log_prob = 1.0 - log10_n - float(len(part))
            dest = (i + idx) % array_size
            if j == 0:
                comps[dest] = (part, top_result, top_ed, top_log_prob)
            elif (
                i == max_word_len
                or (
                    comps[dest][2]
                    in (
                        comps[idx][2] + top_ed,
                        comps[idx][2] + separator_len + top_ed,
                    )
                    and comps[dest][3] < comps[idx][3] + top_log_prob
                )
                or comps[idx][2] + separator_len + top_ed < comps[dest][2]
            ):
                if (len(top_result) == 1 and top_result[0] in punct) or (
                    len(top_result) == 2 and top_result.startswith("'")
                ):
                    comps[dest] = (
                        comps[idx][0] + part,
                        comps[idx][1] + top_result,
                        comps[idx][2] + top_ed,
                        comps[idx][3] + top_log_prob,
                    )
                else:
                    comps[dest] = (
                        comps[idx][0] + " " + part,
                        comps[idx][1] + " " + top_result,
                        comps[idx][2] + separator_len + top_ed,
                        comps[idx][3] + top_log_prob,
                    )
        idx = (idx + 1) % array_size
    return comps[idx]


def _segment_phrase_ascii(
    phrase: str,
    resolve,
    max_word_len: int,
    n_const: float,
    log10_n: float,
) -> tuple[str, str, int, float]:
    """ASCII whitespace-free specialization of :func:`_segment_phrase`
    — decision-identical (the general loop with lead=False,
    separator_len=1, spaces_removed=0 constant-folded and the previous
    composition hoisted out of the inner loop)."""
    punct = _PUNCT
    low = phrase.lower()
    n_j = len(phrase)
    array_size = min(max_word_len, n_j)
    comps = [("", "", 0, 0.0)] * array_size
    idx = -1
    for j in range(n_j):
        imax = min(n_j - j, max_word_len)
        prev = comps[idx] if j > 0 else None
        upper_j = phrase[j] != low[j]
        for i in range(1, imax + 1):
            part = phrase[j : j + i]
            res = resolve(low[j : j + i])
            if res is not None:
                s_term, s_dist, s_count = res
                if upper_j:
                    top_result = s_term[:1].upper() + s_term[1:].lower()
                else:
                    top_result = s_term
                top_ed = s_dist
                top_log_prob = math.log10(float(s_count) / n_const)
            else:
                top_result = part
                top_ed = i
                top_log_prob = 1.0 - log10_n - float(i)
            dest = (i + idx) % array_size
            if j == 0:
                comps[dest] = (part, top_result, top_ed, top_log_prob)
            elif (
                i == max_word_len
                or (
                    comps[dest][2]
                    in (prev[2] + top_ed, prev[2] + 1 + top_ed)
                    and comps[dest][3] < prev[3] + top_log_prob
                )
                or prev[2] + 1 + top_ed < comps[dest][2]
            ):
                if (len(top_result) == 1 and top_result[0] in punct) or (
                    len(top_result) == 2 and top_result.startswith("'")
                ):
                    comps[dest] = (
                        prev[0] + part,
                        prev[1] + top_result,
                        prev[2] + top_ed,
                        prev[3] + top_log_prob,
                    )
                else:
                    comps[dest] = (
                        prev[0] + " " + part,
                        prev[1] + " " + top_result,
                        prev[2] + 1 + top_ed,
                        prev[3] + top_log_prob,
                    )
        idx = (idx + 1) % array_size
    return comps[idx]


def _run_doc_local_dp(
    docs: DataFrame,
    make_resolve,
    max_word_len: int,
    n_const: float,
    doc_col: str,
    text_col: str,
) -> DataFrame:
    """Common mapInPandas harness for the doc-local DP kernels.

    ``make_resolve()`` runs once per python worker and returns the
    ``resolve`` closure (typically over a broadcast map)."""
    log10_n = math.log10(n_const)
    norm = nfkc_strip_hyphens_udf()
    prepped = docs.select(
        F.col(doc_col).alias("doc_id"), norm(F.col(text_col)).alias("phrase")
    )
    doc_id_type = dict(prepped.dtypes)["doc_id"]
    out_schema = (
        f"doc_id {doc_id_type}, segmented_string string, corrected_string string, "
        "distance_sum int, log_prob_sum double"
    )

    def run(batches):
        made = make_resolve()
        prepare, resolve = made if isinstance(made, tuple) else (None, made)
        for pdf in batches:
            if prepare is not None:
                prepare(list(pdf["phrase"]))
            out = []
            for doc_id, phrase in zip(pdf["doc_id"], pdf["phrase"]):
                if phrase is None or len(phrase) == 0:
                    continue
                seg, corr, dist, logp = _segment_phrase(
                    phrase, resolve, max_word_len, n_const, log10_n
                )
                out.append((doc_id, seg, corr, dist, logp))
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "segmented_string",
                    "corrected_string",
                    "distance_sum",
                    "log_prob_sum",
                ],
            )

    live = prepped.where(F.length("phrase") > 0)
    # the kernel is compute-bound (~1 ms/row vs ~100 B/row), so AQE's
    # size-based coalescing would serialize it onto one task; pin a
    # row-balanced partitioning when the input arrives under-partitioned
    para = docs.sparkSession.sparkContext.defaultParallelism
    if live.rdd.getNumPartitions() < para:
        live = live.repartition(para * 2)
    result = live.mapInPandas(run, schema=out_schema)
    return _with_empties(result, prepped)


def _segmentation_broadcast_d0(
    docs: DataFrame,
    dictionary: SparkDictionary,
    max_word_len: int,
    ignore_pattern: str | None,
    n_const: float,
    doc_col: str,
    text_col: str,
) -> DataFrame:
    """d=0 fast path: broadcast words map + doc-local DP in mapInPandas.

    NOTE on scale: the whole vocabulary is collected to the driver (fine
    at dictionary scale, 82k terms ≈ 2 MB; a web-scale vocab should use
    the relational d>0 path or a pruned vocabulary instead).
    """
    words_map = {
        r["term"]: r["count"] for r in dictionary.words.select("term", "count").collect()
    }
    bc = docs.sparkSession.sparkContext.broadcast(words_map)
    ign_pat = ignore_pattern

    def make_resolve():
        import re

        words = bc.value
        ign = re.compile(f"^(?:{ign_pat})") if ign_pat is not None else None

        def resolve(query):
            count = words.get(query)
            if count is not None:
                return (query, 0, count)
            if ign is not None and ign.match(query):
                return (query, 0, 1)
            return None

        return resolve

    return _run_doc_local_dp(
        docs, make_resolve, max_word_len, n_const, doc_col, text_col
    )


def _segmentation_broadcast_fuzzy(
    docs: DataFrame,
    dictionary: SparkDictionary,
    max_edit_distance: int,
    max_word_len: int,
    ignore_pattern: str | None,
    n_const: float,
    doc_col: str,
    text_col: str,
) -> DataFrame:
    """Fuzzy (d > 0) fast path: worker-local SymSpell lookup inside the
    doc-local DP kernel.

    The relational path's cost is one distributed ``lookup_batch`` over
    the corpus's distinct substrings — O(len * max_word_len) candidate
    strings per document through a join pipeline. Here the delete-key
    index is built ONCE on the driver as flat numpy arrays
    (operators/neighborhood.py) and broadcast — workers deserialize it
    at memcpy speed instead of re-deriving a ~5 s dict index each —
    then cell queries resolve locally with the semantics of ``lookup_batch``
    TOP (delete-neighborhood candidate gen per deletes.py:62, |len|
    prune, exact verify with the SAME numpy kernels distance_udf uses,
    (distance ASC, count DESC, term ASC) tie-break, ignore_pattern and
    exact-hit short-circuits per lookup.py:70-108). Queries of a batch
    are resolved in ONE vectorized verify call, and the resolution
    cache persists across batches in the worker.
    """
    from symspellpy_spark.functions.distance import (
        damerau_osa_batch,
        levenshtein_batch,
    )

    cfg = dictionary.config
    if cfg.distance_algorithm not in (
        DistanceAlgorithm.LEVENSHTEIN,
        DistanceAlgorithm.DAMERAU_OSA,
    ):
        raise ValueError(
            "strategy='auto' fuzzy segmentation supports the built-in "
            "kernels; pass strategy='relational' for USER_PROVIDED"
        )
    transpositions = cfg.distance_algorithm == DistanceAlgorithm.DAMERAU_OSA
    kernel = damerau_osa_batch if transpositions else levenshtein_batch
    d_ = max_edit_distance
    p_ = cfg.prefix_length
    dict_max_len = dictionary.max_length
    ign_pat = ignore_pattern

    # index built ONCE on the driver and broadcast as flat numpy arrays
    # (neighborhood.py): workers deserialize at memcpy speed instead of
    # re-deriving a ~5 s Python dict index per worker process
    idx_bc, bc_token = fuzzy_index_broadcast(
        docs.sparkSession, dictionary, d_, p_
    )

    def make_resolve():
        import re

        resolver = worker_resolver(
            idx_bc, bc_token, kernel, transpositions, ign_pat=ign_pat
        )
        ws = re.compile(r"\s")

        def prepare(phrases):
            """Enumerate every distinct cell query of the batch (the
            reference's space accounting, symspellpy.py:925-942) and
            resolve them in one vectorized TopResolver pass."""
            todo = set()
            add = todo.add
            for phrase in phrases:
                if not phrase:
                    continue
                n_j = len(phrase)
                if phrase.isascii() and ws.search(phrase) is None:
                    # cell queries are plain slices of the lowered
                    # phrase (same guard as _segment_phrase_ascii)
                    low = phrase.lower()
                    for j in range(n_j):
                        imax = min(n_j - j, max_word_len) + j + 1
                        for e in range(j + 1, imax):
                            add(low[j:e])
                    continue
                for j in range(n_j):
                    imax = min(n_j - j, max_word_len)
                    for i in range(1, imax + 1):
                        raw = phrase[j : j + i]
                        if ws.match(raw[:1]):
                            raw = raw[1:]
                        todo.add(raw.replace(" ", "").lower())
            resolver.prepare(todo)
            return None

        return prepare, resolver.get

    return _run_doc_local_dp(
        docs, make_resolve, max_word_len, n_const, doc_col, text_col
    )
