"""Corpus-preparation operators: passage chunking and URL dedup.

Two training-data pipeline stages that sit beside the dedup/quality
operators (``operators/dedup.py``, ``operators/sampling.py``) in the
corpus assembly job: splitting documents into bounded-token passages
(for embedding / retrieval indexing and sequence-length-capped
training examples) and canonical-URL deduplication (the cheapest and
highest-yield dedup pass on web crawls — the same page fetched under
``http://www.X/``, ``https://x/?utm_source=...`` etc. is an EXACT dup
that no content hashing is needed for).

Both are pure Catalyst — whole-stage-codegen string/array expressions,
no Python, no UDF:

- :func:`passage_chunks` is narrow (no shuffle at all): each document
  expands into its own chunks via ``posexplode`` over a computed start
  sequence; fan-out is bounded by ``len/stride``. At 100 TB it
  pipelines with the parquet scan and partition count is inherited
  from the input splits.
- :func:`url_dedup` shuffles once, on the canonical URL (the groupBy
  key) — with map-side partial aggregation the exchange carries one
  row per distinct (partition, canonical) pair. A boilerplate-hot URL
  (a crawler trap fetched millions of times) is ONE group whose
  min/count aggregate stays O(1) in state, so no skew cap is needed
  (unlike pair-producing joins, aggregation never fans out).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["passage_chunks", "canonicalize_url", "url_dedup", "pii_scrub"]

# scheme://host[:port] prefix — everything up to the first /, ? or #.
# Kept to the RE2 ∩ java.util.regex common subset (no lookaround, no
# replacement backreferences) so the DuckDB oracle can run the SAME
# pattern text (see __spark_entry__.py url_dedup oracle).
_SCHEME_HOST_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"


def passage_chunks(
    docs: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (id, chunk_id, chunk_text, n_tokens): overlapping fixed-size
    token windows over whitespace-tokenized text.

    Chunk ``i`` covers tokens ``[i*stride, i*stride + chunk_tokens)``;
    the number of chunks is ``1 + ceil((n - chunk_tokens) / stride)``
    for ``n > chunk_tokens`` else 1, so every token lands in >=1 chunk,
    consecutive chunks overlap by ``chunk_tokens - stride`` tokens, and
    the final chunk may be short (never empty). A document shorter than
    one chunk yields exactly itself. Empty/null text yields no rows.

    All integer arithmetic (``div``, no floats) so the DuckDB oracle
    reproduces chunk boundaries bit-exactly.
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    c, s = chunk_tokens, stride
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.split(F.col(text_col), " ").alias("ts"),
    ).where(F.col(text_col).isNotNull() & (F.length(text_col) > 0))
    toks = toks.withColumn("n", F.size("ts")).withColumn(
        "n_chunks",
        F.lit(1)
        + F.greatest(F.lit(0), F.expr(f"(n - {c} + {s} - 1) div {s}")),
    )
    # the exploded VALUE (array<long> element) is the chunk id so its
    # type is long on both engines (posexplode's pos is int)
    return toks.select(
        "id",
        F.posexplode(F.expr("sequence(0, n_chunks - 1)")).alias(
            "_pos", "chunk_id"
        ),
        "ts",
    ).select(
        "id",
        "chunk_id",
        F.array_join(
            F.slice("ts", (F.col("chunk_id") * s + 1).cast("int"), c), " "
        ).alias("chunk_text"),
        F.size(F.slice("ts", (F.col("chunk_id") * s + 1).cast("int"), c))
        .cast("long")
        .alias("n_tokens"),
    )


def canonicalize_url(url: Column | str) -> Column:
    """Canonical form of a web URL, as one codegen expression chain.

    Normalizations (each a documented, deterministic choice — the point
    is that BOTH fetch variants of the same page map to one key, not
    that the result is a valid resolvable URL):

    - scheme and host lowercased (path/query case preserved);
    - leading ``www.`` stripped from the host;
    - default ports ``:80`` / ``:443`` stripped;
    - fragment (``#...``) dropped;
    - ``utm_*`` tracking query parameters dropped, dangling ``?``/``&``
      cleaned up;
    - trailing slashes stripped (``https://x/`` == ``https://x``).

    Patterns stay inside the RE2/Java common regex subset with literal
    replacements only, so the DuckDB oracle runs the same pattern text
    (DuckDB needs the explicit ``'g'`` flag where Spark's
    ``regexp_replace`` is global by default).
    """
    u = F.col(url) if isinstance(url, str) else url
    prefix = F.regexp_extract(u, _SCHEME_HOST_RE, 0)
    rest = u.substr(F.length(prefix) + 1, F.length(u))
    prefix = F.lower(prefix)
    prefix = F.regexp_replace(prefix, r"://www\.", "://")
    prefix = F.regexp_replace(prefix, ":(80|443)$", "")
    rest = F.regexp_replace(rest, "#.*$", "")
    rest = F.regexp_replace(rest, "utm_[a-z_]+=[^&#]*&?", "")
    rest = F.regexp_replace(rest, "[?&]+$", "")
    rest = F.regexp_replace(rest, "/+$", "")
    return F.concat(prefix, rest)


# PII patterns: RE2 ∩ java.util.regex subset (greedy, no lookaround,
# no backreferences) so Spark and the DuckDB oracle match identically.
# ASCII \b and \d are supported by both engines.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PHONE_RE = r"\+\d{1,3}[- ]\d{3}[- ]\d{3}[- ]\d{4}"
PII_PATTERNS = {
    "email": (_EMAIL_RE, "<EMAIL>"),
    "ipv4": (_IPV4_RE, "<IP>"),
    "phone": (_PHONE_RE, "<PHONE>"),
}


def pii_scrub(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_all: bool = False,
) -> DataFrame:
    """-> (id, clean_text, n_email, n_ipv4, n_phone): redact emails,
    IPv4 addresses and international-format phone numbers, with
    per-kind match counts for filtering/reporting. With ``keep_all``
    the full input schema is preserved (``text_col`` replaced in place,
    count columns appended) so a job can scrub without a join.

    Pure codegen: ``regexp_extract_all`` sizes for the counts plus a
    chained ``regexp_replace`` for the redaction — no Python, narrow
    plan (no shuffle), pipelines with the scan like
    :func:`passage_chunks`. The redaction order is email → ipv4 →
    phone; patterns are disjoint enough that order only matters for
    pathological overlaps (an email whose domain is an IP literal is
    redacted as an email).
    """
    u = F.col(text_col)
    counts = [
        F.size(F.regexp_extract_all(u, F.lit(p), F.lit(0)))
        .cast("long")
        .alias(f"n_{k}")
        for k, (p, _) in PII_PATTERNS.items()
    ]
    clean = u
    for p, repl in PII_PATTERNS.values():
        clean = F.regexp_replace(clean, p, repl)
    if keep_all:
        cols = [
            clean.alias(text_col) if c == text_col else F.col(c)
            for c in docs.columns
        ]
        return docs.select(*cols, *counts)
    return docs.select(
        F.col(id_col).alias("id"),
        clean.alias("clean_text"),
        *counts,
    )


def url_dedup(
    pages: DataFrame, url_col: str = "url", id_col: str = "id"
) -> DataFrame:
    """-> (canonical_url, survivor_id, n_dups): one row per canonical
    URL with the smallest id as the deterministic survivor.

    The first dedup pass of a crawl pipeline: runs before any content
    hashing and removes re-fetches/tracking-variant duplicates for the
    cost of ONE hash aggregation (map-side combine; no joins, no pair
    generation, skew-safe by construction).
    """
    return (
        pages.select(
            canonicalize_url(url_col).alias("canonical_url"),
            F.col(id_col).alias("_id"),
        )
        .groupBy("canonical_url")
        .agg(
            F.min("_id").alias("survivor_id"),
            F.count("*").alias("n_dups"),
        )
    )
