"""Corpus-prep operators: passage chunking boundaries and URL
canonicalization edge cases (the entry-contract test covers the
sf0.01 DuckDB parity of both; these pin the operator semantics on
hand-built rows a random corpus never exercises)."""

import pytest
from pyspark.sql import functions as F

from symspellpy_spark.operators.corpus_prep import (
    canonicalize_url,
    passage_chunks,
    pii_scrub,
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


def test_chunks_plan_is_narrow(spark):
    """No exchange in the chunking plan: it must pipeline with the scan."""
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = passage_chunks(df, 4, 2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
