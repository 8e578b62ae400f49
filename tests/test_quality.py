"""Gopher/MassiveText repetition-family tests (operators/quality.py)."""

import re
from collections import Counter

import pytest

from symspellpy_spark.operators.quality import (
    GOPHER_THRESHOLDS,
    gopher_ngram_stats,
    gopher_quality_filter,
)

pytestmark = pytest.mark.usefixtures("spark")


_DOCS = [
    # heavy bigram repetition ("very very ... very") -> top_frac(2) high
    (1, "this is " + " ".join(["very"] * 12) + " repetitive"),
    # a looped 6-token passage -> dup_frac(5..6) high
    (2, " ".join(["a b c d e f"] * 4)),
    # clean prose: every signal low
    (3, "the quick brown fox jumps over the lazy dog and runs away"),
    # too short for any n >= 2
    (4, "one"),
    (5, ""),
]


def _py_stats(text, ns):
    ts = re.findall("[a-z0-9]+", text.lower())
    out = {}
    for n in ns:
        if len(ts) < n:
            continue
        grams = Counter(
            " ".join(ts[i : i + n]) for i in range(len(ts) - n + 1)
        )
        total = sum(grams.values())
        distinct = len(grams)
        top = max(grams.values())
        out[n] = (total, distinct, top, top / total, (total - distinct) / total)
    return out


def test_stats_match_bruteforce(spark):
    ns = (2, 3, 4, 5, 6, 7, 8, 9, 10)
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    got = {
        (r["id"], r["n"]): (
            r["n_grams"],
            r["n_distinct"],
            r["top_count"],
            r["top_frac"],
            r["dup_frac"],
        )
        for r in gopher_ngram_stats(df, ns=ns).collect()
    }
    want = {
        (i, n): v for i, t in _DOCS for n, v in _py_stats(t, ns).items()
    }
    assert got == want


def test_filter_verdicts(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    keep = {r["id"]: r["keep"] for r in gopher_quality_filter(df).collect()}
    assert set(keep) == {1, 2, 3, 4, 5}
    # docs 1 and 2 violate their families; 3 is clean; 4/5 too short -> kept
    assert keep[1] is False
    assert keep[2] is False
    assert keep[3] is True
    assert keep[4] is True
    assert keep[5] is True
    # sanity: the violating signals really exceed the published bars
    s1 = _py_stats(_DOCS[0][1], (2,))[2]
    assert s1[3] > GOPHER_THRESHOLDS["top_frac"][2]
    s2 = _py_stats(_DOCS[1][1], (5,))[5]
    assert s2[4] > GOPHER_THRESHOLDS["dup_frac"][5]


def test_stats_validation():
    with pytest.raises(ValueError):
        gopher_ngram_stats(None, ns=())
    with pytest.raises(ValueError):
        gopher_ngram_stats(None, ns=(0, 2))


def test_stats_plan_has_no_join(spark):
    """Repetition is per-document: the plan must contain no join at all."""
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    plan = (
        gopher_ngram_stats(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan, plan
