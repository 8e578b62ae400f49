"""Worker-local batch lookup: the broadcast-dictionary fast path.

Same result contract as :func:`operators.lookup.lookup_batch`
(reference ``SymSpell.lookup``, symspellpy.py:358-637 — verbosity cuts,
ignore_token short-circuits, the ALL-verbosity one-char duplicate
quirk, transfer_casing, include_unknown), but no joins: only the words
map (term -> count, ~2 MB for the EN dictionary) is broadcast; each
python worker derives the delete-key candidate index from it once and
resolves queries locally, verifying candidates with the SAME numpy
kernels ``distance_udf`` uses, one vectorized call per Arrow batch.
Resolutions are cached across batches in the worker.

When to use which (measured, local[32], EN dictionary):
- ``lookup_batch`` (relational) — the 100-TB scale path AND the faster
  choice for DISTINCT-heavy query sets (its candidate join runs at JVM
  speed; 222k distinct synthetic misspellings: ~15k qps vs ~5k here).
- ``lookup_batch_local`` — wins when the query stream repeats tokens
  (real web text: Zipfian tokens → the per-worker resolution cache
  absorbs most lookups) or when many small lookup calls would each pay
  the relational plan/broadcast overhead. The same worker-local shape
  powers the fuzzy word_segmentation kernel, where cell queries repeat
  heavily and it cut the stage from 402 s to 61 s (segmentation.py).

Equivalence between the two is pinned by
``tests/test_local_lookup.py`` on the reference's noisy-query corpus
at every verbosity.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from symspellpy_spark.config import DistanceAlgorithm, Verbosity
from symspellpy_spark.functions.distance import (
    damerau_osa_batch,
    levenshtein_batch,
)
from symspellpy_spark.functions.text import case_transfer_similar_py
from symspellpy_spark.operators.dictionary import SparkDictionary

__all__ = ["lookup_batch_local"]

# per-python-worker state keyed by (broadcast id, d, p); workers are
# reused across tasks so the index builds once per worker
_STATE: dict = {}
_CACHE_CAP = 4_000_000

# driver-side broadcast reuse: one words broadcast per SparkDictionary
# instance, so repeated lookup_batch_local calls hit the same worker
# state (and its cross-call resolution cache) instead of re-broadcasting
# and re-indexing per call
_BC_CACHE: dict = {}


def _words_broadcast(queries: DataFrame, dictionary: SparkDictionary):
    """-> (broadcast, token). The token is a driver-generated uuid made
    once per broadcast and shipped in the task closure: worker-side
    state must NOT key on id(bc) because Broadcast wrappers are
    per-task objects whose CPython addresses are readily reused after
    GC — a later job with a different dictionary could silently hit a
    stale delete index."""
    import uuid
    import weakref

    entry = _BC_CACHE.get(id(dictionary))
    if entry is not None:
        ref, bc, token = entry
        if ref() is dictionary:
            return bc, token
    words_map = {
        r["term"]: r["count"]
        for r in dictionary.words.select("term", "count").collect()
    }
    bc = queries.sparkSession.sparkContext.broadcast(words_map)
    token = uuid.uuid4().hex
    _BC_CACHE.clear()
    _BC_CACHE[id(dictionary)] = (weakref.ref(dictionary), bc, token)
    return bc, token


def _neighborhood(s: str, d: int, p: int) -> set[str]:
    """Deletes of s[:p] up to depth d, plus "" for short s — the exact
    key set of operators/deletes.py:62 (reference symspellpy.py:1038)."""
    pref = s[:p]
    seen = {pref}
    frontier = [pref]
    for _ in range(d):
        nxt = []
        for t in frontier:
            for i in range(len(t)):
                k = t[:i] + t[i + 1 :]
                if k not in seen:
                    seen.add(k)
                    nxt.append(k)
        frontier = nxt
    if len(s) <= d:
        seen.add("")
    return seen


def _build_state(words: dict, d: int, p: int):
    # full single-delete index: any OSA-distance-1 pair shares a full
    # single delete, and buckets stay tiny (no prefix conflation) — see
    # segmentation.py for the argument. Used directly at d=1 and as the
    # staged shallow pass at d>=2 (a query with ANY distance<=1 match is
    # fully resolved by it for TOP/CLOSEST, the same argument as the
    # relational staged read path, lookup.py:110-121).
    idx1: dict[str, list[str]] = {}
    for t in words:
        idx1.setdefault(t, []).append(t)
        for i in range(len(t)):
            idx1.setdefault(t[:i] + t[i + 1 :], []).append(t)
    deep: dict[str, list[str]] | None = None
    if d >= 2:
        deep = {}
        for t in words:
            for k in _neighborhood(t, d, p):
                deep.setdefault(k, []).append(t)
    one_char = sorted(t for t in words if len(t) == 1)
    max_len = max((len(t) for t in words), default=0)
    return idx1, deep, one_char, max_len


def lookup_batch_local(
    queries: DataFrame,
    dictionary: SparkDictionary,
    verbosity: Verbosity = Verbosity.TOP,
    max_edit_distance: int | None = None,
    include_unknown: bool = False,
    ignore_pattern: str | None = None,
    transfer_casing: bool = False,
    query_col: str = "query",
    broadcast_vocab_limit: int = 1_000_000,
) -> DataFrame:
    """Drop-in result-equivalent of ``lookup_batch`` for
    worker-broadcastable dictionaries. -> (query, term, distance, count)
    over the DISTINCT queries."""
    if dictionary.num_terms > broadcast_vocab_limit:
        # a web-scale vocabulary must not be collected to the driver:
        # delegate to the relational staged path (the bucketed index,
        # dictionary.save_bucketed, covers the too-big-to-broadcast
        # dictionary there too)
        from symspellpy_spark.operators.lookup import lookup_batch

        return lookup_batch(
            queries,
            dictionary,
            verbosity,
            max_edit_distance=max_edit_distance,
            include_unknown=include_unknown,
            ignore_pattern=ignore_pattern,
            transfer_casing=transfer_casing,
            query_col=query_col,
        )
    cfg = dictionary.config
    if max_edit_distance is None:
        max_edit_distance = cfg.max_dictionary_edit_distance
    if max_edit_distance > cfg.max_dictionary_edit_distance:
        raise ValueError("Distance too large")
    if cfg.distance_algorithm not in (
        DistanceAlgorithm.LEVENSHTEIN,
        DistanceAlgorithm.DAMERAU_OSA,
    ):
        raise ValueError("lookup_batch_local supports the built-in kernels")
    transpositions = cfg.distance_algorithm == DistanceAlgorithm.DAMERAU_OSA
    kernel = damerau_osa_batch if transpositions else levenshtein_batch
    d_, p_ = max_edit_distance, cfg.prefix_length
    verb = verbosity
    ign_pat = ignore_pattern
    tc = transfer_casing
    inc_unknown = include_unknown

    bc, bc_token = _words_broadcast(queries, dictionary)

    q = (
        queries.select(F.col(query_col).alias("query"))
        .where(F.col("query").isNotNull())
        .distinct()
    )
    # .distinct() above already hash-partitions by query (deterministic
    # query->partition routing, so duplicate work never lands twice in
    # one call); only repartition when the input arrives under-partitioned
    para = queries.sparkSession.sparkContext.defaultParallelism
    if q.rdd.getNumPartitions() < para:
        q = q.repartition(para * 2, "query")

    def run(batches):
        import re

        # staged (TOP/CLOSEST at d>=2) and exhaustive (ALL) resolutions
        # differ, so the cache is keyed by the staging mode too
        staged = d_ >= 2 and verb in (Verbosity.TOP, Verbosity.CLOSEST)
        key = (bc_token, d_, p_, staged)
        state = _STATE.get(key)
        if state is None:
            words = bc.value
            idx1, deep, one_char, max_len = _build_state(words, d_, p_)
            state = (words, idx1, deep, one_char, max_len, {})
            for k in [k for k in _STATE if k[0] != bc_token]:
                del _STATE[k]  # one dictionary per worker
            _STATE[key] = state
        words, idx1, deep, one_char, max_len, cache = state
        ign = re.compile(f"^(?:{ign_pat})") if ign_pat is not None else None

        def within_one(a: str, b: str) -> bool:
            la, lb = len(a), len(b)
            if la == lb:
                i = 0
                while i < la and a[i] == b[i]:
                    i += 1
                if i == la or a[i + 1 :] == b[i + 1 :]:
                    return True
                return (
                    transpositions
                    and i + 1 < la
                    and a[i] == b[i + 1]
                    and a[i + 1] == b[i]
                    and a[i + 2 :] == b[i + 2 :]
                )
            s, l = (a, b) if la < lb else (b, a)
            i = 0
            ls = len(s)
            while i < ls and s[i] == l[i]:
                i += 1
            return s[i:] == l[i + 1 :]

        def candidates_d1(phrase: str) -> set[str]:
            lq = len(phrase)
            cands: set[str] = set()
            for k in [phrase] + [
                phrase[:i] + phrase[i + 1 :] for i in range(lq)
            ]:
                for t in idx1.get(k, ()):
                    if abs(len(t) - lq) <= 1:
                        cands.add(t)
            return cands

        def resolve_d1(phrase: str) -> list:
            out = []
            for t in candidates_d1(phrase):
                if t == phrase:
                    out.append((t, 0, words[t]))
                elif within_one(phrase, t):
                    out.append((t, 1, words[t]))
            return out

        def candidates_deep(phrase: str) -> list[str]:
            lq = len(phrase)
            cands: set[str] = set()
            for k in _neighborhood(phrase, d_, p_):
                for t in deep.get(k, ()):
                    if abs(len(t) - lq) <= d_:
                        cands.add(t)
            return list(cands)

        def resolve_batch(todo: list[str]) -> None:
            """cache[phrase] = verified [(term, dist, count), ...]."""
            if len(cache) > _CACHE_CAP:
                cache.clear()
            pairs_q: list[str] = []
            pairs_t: list[str] = []
            cand_map: dict[str, list[str]] = {}
            for phrase in todo:
                if d_ == 0:
                    c = words.get(phrase)
                    cache[phrase] = [(phrase, 0, c)] if c is not None else []
                    continue
                if len(phrase) - d_ > max_len:
                    cache[phrase] = []
                    continue
                if d_ == 1:
                    cache[phrase] = resolve_d1(phrase)
                    continue
                if staged:
                    # shallow pass: any distance<=1 match fully resolves
                    # a TOP/CLOSEST query (deeper matches cannot beat it)
                    near = resolve_d1(phrase)
                    if near:
                        cache[phrase] = near
                        continue
                cl = candidates_deep(phrase)
                if not cl:
                    cache[phrase] = []
                    continue
                cand_map[phrase] = cl
                pairs_q.extend([phrase] * len(cl))
                pairs_t.extend(cl)
            if not pairs_q:
                return
            dists = kernel(
                pd.Series(pairs_q, dtype=object),
                pd.Series(pairs_t, dtype=object),
                d_,
            ).to_numpy()
            pos = 0
            for phrase, cl in cand_map.items():
                out = []
                for t, dist in zip(cl, dists[pos : pos + len(cl)]):
                    dist = int(dist)
                    if dist >= 0:
                        out.append((t, dist, words[t]))
                pos += len(cl)
                cache[phrase] = out

        for pdf in batches:
            qs = list(pdf["query"])
            phrases = [
                (s.lower() if tc else s) if s is not None else None for s in qs
            ]
            todo = [
                ph
                for ph in set(phrases)
                if ph is not None and ph not in cache
            ]
            # ignored non-ALL queries never need fuzzy resolution
            if ign is not None and verb != Verbosity.ALL:
                todo = [
                    ph for ph in todo if ph in words or not ign.match(ph)
                ]
            resolve_batch(todo)

            rows = []
            for query, phrase in zip(qs, phrases):
                if phrase is None:
                    continue
                ignored_row = None
                matches: list[tuple[str, int, int]] = []
                if ign is not None and ign.match(phrase):
                    if verb == Verbosity.ALL:
                        # ALL keeps the injected row AND the fuzzy search
                        ignored_row = (phrase, 0, 1)
                        matches = list(cache.get(phrase) or [])
                    elif phrase not in words:
                        # exact dictionary hits win over the ignore
                        # short-circuit (lookup.py:83-86)
                        ignored_row = (phrase, 0, 1)
                    else:
                        matches = list(cache[phrase])
                else:
                    matches = list(cache.get(phrase) or [])

                if verb == Verbosity.ALL and 0 < len(phrase) <= d_:
                    # one-char duplicate quirk (lookup.py:239-263)
                    for t in one_char:
                        if t in phrase and t != phrase:
                            matches.append((t, len(phrase), words[t]))

                if verb == Verbosity.TOP and matches:
                    matches = [min(matches, key=lambda m: (m[1], -m[2], m[0]))]
                elif verb == Verbosity.CLOSEST and matches:
                    mind = min(m[1] for m in matches)
                    matches = [m for m in matches if m[1] == mind]

                if ignored_row is not None:
                    matches.append(ignored_row)
                if tc:
                    matches = [
                        (case_transfer_similar_py(query, t), dist, c)
                        for t, dist, c in matches
                    ]
                if not matches and inc_unknown:
                    matches = [(phrase if tc else query, d_ + 1, 0)]
                for t, dist, c in matches:
                    rows.append((query, t, dist, c))
            yield pd.DataFrame(
                rows, columns=["query", "term", "distance", "count"]
            )

    return q.mapInPandas(
        run, schema="query string, term string, distance int, count long"
    )
