"""Corpus-prep operators: passage chunking boundaries and URL
canonicalization edge cases (the entry-contract test covers the
sf0.01 DuckDB parity of both; these pin the operator semantics on
hand-built rows a random corpus never exercises)."""

import pytest
from pyspark.sql import functions as F

from symspellpy_spark.operators.corpus_prep import (
    canonicalize_url,
    duplicate_spans,
    passage_chunks,
    pii_scrub,
    remove_duplicate_spans,
    url_dedup,
)


def _chunks(spark, text, c, s):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = (
        passage_chunks(df, chunk_tokens=c, stride=s)
        .orderBy("chunk_id")
        .collect()
    )
    return [(r["chunk_id"], r["chunk_text"], r["n_tokens"]) for r in rows]


def test_chunks_short_doc_is_single_chunk(spark):
    assert _chunks(spark, "a b c", 5, 3) == [(0, "a b c", 3)]
    # exactly one chunk's worth of tokens -> still one chunk
    assert _chunks(spark, "a b c d e", 5, 3) == [(0, "a b c d e", 5)]


def test_chunks_overlap_and_short_tail(spark):
    text = " ".join(str(i) for i in range(12))
    got = _chunks(spark, text, 5, 3)
    # starts 0,3,6,9 -> last chunk is the 3-token tail; every token in
    # >=1 chunk; consecutive chunks overlap by chunk-stride=2 tokens
    assert got == [
        (0, "0 1 2 3 4", 5),
        (1, "3 4 5 6 7", 5),
        (2, "6 7 8 9 10", 5),
        (3, "9 10 11", 3),
    ]
    # boundary: n - c divisible by stride -> final chunk exactly full
    got = _chunks(spark, " ".join(str(i) for i in range(11)), 5, 3)
    assert got[-1] == (2, "6 7 8 9 10", 5)


def test_chunks_empty_and_null_text_yield_nothing(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "x")], "doc_id long, text string"
    )
    rows = passage_chunks(df, 4, 2).collect()
    assert [(r["id"], r["chunk_text"]) for r in rows] == [(3, "x")]


def test_chunks_validation():
    with pytest.raises(ValueError):
        passage_chunks(None, chunk_tokens=0, stride=1)
    with pytest.raises(ValueError):
        passage_chunks(None, chunk_tokens=4, stride=0)


@pytest.mark.parametrize(
    "raw,canon",
    [
        # case, www, default port, fragment, trailing slash
        ("HTTPS://WWW.Ex.COM:443/A/", "https://ex.com/A"),
        ("http://ex.com:80/A#frag", "http://ex.com/A"),
        # non-default port survives; path case survives
        ("http://Ex.com:8080/A/B", "http://ex.com:8080/A/B"),
        # utm params dropped wherever they sit; real params survive
        ("https://ex.com/p?utm_source=a&ref=1", "https://ex.com/p?ref=1"),
        ("https://ex.com/p?ref=1&utm_campaign=x", "https://ex.com/p?ref=1"),
        ("https://ex.com/p?utm_a=1&utm_b=2", "https://ex.com/p"),
        # root slash strips; scheme-less string passes through lowered
        ("https://ex.com/", "https://ex.com"),
        ("not a url", "not a url"),
        # www only strips at host start, not inside the path
        ("https://www.ex.com/www.keep/", "https://ex.com/www.keep"),
    ],
)
def test_canonicalize_url_cases(spark, raw, canon):
    got = (
        spark.range(1)
        .select(canonicalize_url(F.lit(raw)).alias("c"))
        .head()["c"]
    )
    assert got == canon, (raw, got)


def test_url_dedup_survivor_and_counts(spark):
    df = spark.createDataFrame(
        [
            (3, "HTTPS://WWW.Ex.COM:443/A/"),
            (1, "https://ex.com/A"),
            (2, "https://ex.com/A?utm_source=x"),
            (9, "https://other.com/B"),
        ],
        "id long, url string",
    )
    rows = {
        r["canonical_url"]: (r["survivor_id"], r["n_dups"])
        for r in url_dedup(df).collect()
    }
    assert rows == {
        "https://ex.com/A": (1, 3),
        "https://other.com/B": (9, 1),
    }


def test_pii_scrub_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex-1.co.uk twice x@y.io end"),
            (2, "server 192.168.0.1 and phone +44 123-456-7890 ok"),
            (3, "clean text with no pii at all"),
            # 999.999.999.999 is syntactically an IPv4 per the pattern
            # (no range check — redaction errs toward removal)
            (4, "edge 999.999.999.999 and not-an-ip 1.2.3 stays"),
        ],
        "doc_id long, text string",
    )
    rows = {r["id"]: r for r in pii_scrub(df).collect()}
    assert rows[1]["clean_text"] == "mail <EMAIL> twice <EMAIL> end"
    assert rows[1]["n_email"] == 2 and rows[1]["n_ipv4"] == 0
    assert rows[2]["clean_text"] == "server <IP> and phone <PHONE> ok"
    assert rows[2]["n_ipv4"] == 1 and rows[2]["n_phone"] == 1
    assert rows[3]["clean_text"] == "clean text with no pii at all"
    assert (rows[3]["n_email"], rows[3]["n_ipv4"], rows[3]["n_phone"]) == (
        0,
        0,
        0,
    )
    assert rows[4]["clean_text"] == "edge <IP> and not-an-ip 1.2.3 stays"


def test_pii_scrub_plan_is_narrow(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = pii_scrub(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


# ---------------------------------------------------------------- dup spans


def _py_dup_spans(docs, k, keep_first=True):
    """Brute-force oracle: duplicated-gram occurrences (minus the
    globally first per gram under keep_first) merged into maximal
    [start, end) token spans, numbered per doc in position order."""
    occ = {}
    for i, t in docs:
        ts = t.split(" ")
        for p in range(len(ts) - k + 1):
            occ.setdefault(" ".join(ts[p : p + k]), []).append((i, p))
    dup = set()
    for lst in occ.values():
        if len(lst) >= 2:
            dup.update(sorted(lst)[1 if keep_first else 0 :])
    per_doc = {}
    for i, p in sorted(dup):
        per_doc.setdefault(i, []).append(p)
    out = []
    for i, ps in per_doc.items():
        sid, cur_s, cur_e, n = 1, ps[0], ps[0] + k, 1
        for p in ps[1:]:
            if p > cur_e:
                out.append((i, sid, cur_s, cur_e, n))
                sid, cur_s, cur_e, n = sid + 1, p, p + k, 1
            else:
                cur_e, n = max(cur_e, p + k), n + 1
        out.append((i, sid, cur_s, cur_e, n))
    return sorted(out)


_DUP_DOCS = [
    # doc 1 and 3 share an 8-token boilerplate; doc 3 also repeats a
    # passage WITHIN itself; doc 4 is shorter than k; doc 5 is unique
    (1, "subscribe to our newsletter for all the latest a b c d"),
    (3, "x y subscribe to our newsletter for all the latest z "
        "subscribe to our newsletter for all the latest"),
    (4, "too short"),
    (5, " ".join(f"u{i}" for i in range(20))),
]


def _spark_spans(spark, docs, k, **kw):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = duplicate_spans(df, k=k, **kw).collect()
    return sorted(
        (r["id"], r["span_id"], r["span_start"], r["span_end"], r["n_grams"])
        for r in rows
    )


def test_dup_spans_matches_bruteforce(spark):
    for k in (3, 8):
        assert _spark_spans(spark, _DUP_DOCS, k) == _py_dup_spans(
            _DUP_DOCS, k
        ), k


def test_dup_spans_keep_first_leaves_one_copy(spark):
    got = _spark_spans(spark, _DUP_DOCS, 8)
    # doc 1 (the globally first occurrence: smallest id) keeps its copy;
    # both of doc 3's occurrences are flagged
    assert all(i != 1 for i, *_ in got)
    assert {i for i, *_ in got} == {3}
    # keep_first=False flags every occurrence, including doc 1's
    got_all = _spark_spans(spark, _DUP_DOCS, 8, keep_first=False)
    assert {i for i, *_ in got_all} == {1, 3}
    assert got_all == _py_dup_spans(_DUP_DOCS, 8, keep_first=False)


def test_dup_spans_hash_and_string_grams_agree(spark):
    assert _spark_spans(spark, _DUP_DOCS, 4, hash_grams=True) == _spark_spans(
        spark, _DUP_DOCS, 4, hash_grams=False
    )


def test_dup_spans_overlapping_grams_merge(spark):
    # a 10-token shared passage with k=4 yields 7 duplicated grams in
    # doc 7 that must merge into ONE maximal span covering all 10 tokens
    shared = " ".join(f"s{i}" for i in range(10))
    docs = [(6, shared + " tail6"), (7, "head7 " + shared)]
    got = _spark_spans(spark, docs, 4)
    assert got == [(7, 1, 1, 11, 7)]


def test_remove_dup_spans_reconstructs_text(spark):
    df = spark.createDataFrame(_DUP_DOCS, "doc_id long, text string")
    rows = {r["id"]: r for r in remove_duplicate_spans(df, k=8).collect()}
    # doc 1: first occurrence survives byte-identical
    assert rows[1]["clean_text"] == _DUP_DOCS[0][1]
    assert rows[1]["n_tokens_removed"] == 0
    # doc 3: both flagged passages excised, surrounding tokens survive
    spans = {
        (s, e)
        for i, _, s, e, _ in _py_dup_spans(_DUP_DOCS, 8)
        if i == 3
    }
    ts = _DUP_DOCS[1][1].split(" ")
    expect = " ".join(
        t
        for p, t in enumerate(ts)
        if not any(s <= p < e for s, e in spans)
    )
    assert rows[3]["clean_text"] == expect
    assert rows[3]["n_tokens_removed"] == sum(e - s for s, e in spans)
    # untouched docs pass through byte-identical with 0 removed
    assert rows[4]["clean_text"] == "too short"
    assert rows[5]["n_tokens_removed"] == 0
    assert rows[5]["clean_text"] == _DUP_DOCS[3][1]


def test_remove_dup_spans_null_and_empty_pass_through(spark):
    """Every input doc yields exactly one output row: null/empty text
    passes through untouched (clean_text = text, 0 tokens removed)."""
    docs = _DUP_DOCS + [(8, None), (9, "")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r["id"]: r for r in remove_duplicate_spans(df, k=8).collect()}
    assert set(rows) == {1, 3, 4, 5, 8, 9}
    assert rows[8]["clean_text"] is None
    assert rows[9]["clean_text"] == ""
    for i in (8, 9):
        assert rows[i]["n_tokens"] == 0
        assert rows[i]["n_tokens_removed"] == 0


def test_dup_spans_join_salt_is_result_invariant(spark):
    """The skew salt replicates the aggregate side only — results are
    identical for any salt factor."""
    for k in (4, 8):
        assert _spark_spans(spark, _DUP_DOCS, k, join_salt=4) == _spark_spans(
            spark, _DUP_DOCS, k
        ), k


def test_dup_spans_plan_has_no_cartesian(spark):
    df = spark.createDataFrame(_DUP_DOCS, "doc_id long, text string")
    plan = (
        remove_duplicate_spans(df, k=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan


def test_chunks_plan_is_narrow(spark):
    """No exchange in the chunking plan: it must pipeline with the scan."""
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = passage_chunks(df, 4, 2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
