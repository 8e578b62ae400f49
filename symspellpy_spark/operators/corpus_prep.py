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

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = [
    "passage_chunks",
    "canonicalize_url",
    "url_dedup",
    "pii_scrub",
    "duplicate_spans",
    "remove_duplicate_spans",
]

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
    if stride > chunk_tokens:
        # a stride past the window would leave tokens in NO chunk and
        # emit empty trailing chunks — both documented impossibilities
        raise ValueError(
            f"stride ({stride}) must be <= chunk_tokens ({chunk_tokens})"
        )
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


def duplicate_spans(
    docs: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_grams: bool = True,
    keep_first: bool = True,
    join_salt: int = 1,
) -> DataFrame:
    """-> (id, span_id, span_start, span_end, n_grams): maximal token
    spans covered by corpus-duplicated k-grams, per document.

    Span-level exact-substring dedup in the style of Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better"): a
    k-token gram that occurs more than once ANYWHERE in the corpus
    (across or within documents) marks every occurrence except — with
    ``keep_first`` — the globally first one (smallest ``(id, pos)``),
    so exactly one copy of each duplicated passage survives excision.
    Overlapping/adjacent duplicated grams merge into maximal spans
    ``[span_start, span_end)`` over 0-based token positions.

    Shape (100 TB story):

    - grams are one row per token ``(id 8B, pos 4B, gh 8B)``; with
      ``hash_grams`` the shuffle key is the 8-byte ``xxhash64`` of the
      gram text, never the string (collision odds at 64 bits are
      negligible next to the 0.99-recall budget; the oracle runs
      ``hash_grams=False`` so its replay is collision-free).
    - ONE wide aggregation keyed on the gram (map-side combine;
      ``min(struct(id, pos))`` + count — the same single-pass shape as
      :func:`url_dedup`'s survivor rule) followed by the join back on
      the same key, which Catalyst plans without a second exchange of
      the aggregated side.
    - join-back skew: the duplicated-gram aggregate is small at test
      scale (AQE broadcasts it, measured single-exchange in PLANS.md),
      but at 100 TB the hot set exceeds the broadcast threshold and the
      join shuffles — then a ubiquitous boilerplate gram lands ALL its
      occurrence rows in one partition. ``join_salt = S > 1`` is the
      deterministic defense (the analogue of LSH's ``max_bucket_size``
      for a join that must not drop rows): the aggregate side is
      replicated S ways and each occurrence row picks a salt from
      ``xxhash64(id, pos)``, spreading any single gram's occurrences
      across S partitions for S x the (small) aggregate side. Results
      are identical for any S (tested); AQE's skew-join split is the
      runtime complement for moderate skew. Default is OFF, measured
      (``BENCH_SPAN_SALT.json``, 60k docs with one gram planted in 30%
      of them, interleaved A/B): the join-back is LINEAR per occurrence
      row — each occurrence matches exactly one aggregate row — so the
      hot gram costs one task only its own occurrence count, and salt=8
      added 7-12% in every regime (broadcast; forced shuffle with AQE
      skew split on AND off). Turn it on only when a single gram's
      occurrence count exceeds the per-task row budget
      (~ total gram rows / shuffle partitions), i.e.
      ``S ~ ceil(hot_count / target_task_rows)`` — the 10^12-doc
      boilerplate case, where AQE's 256MB-per-partition split is the
      first line and salt the deterministic guarantee.
    - only DUPLICATED occurrences (a small fraction of a crawl) reach
      the per-document interval-merge window, which shuffles on ``id``.
    - interval merge is SQL island detection, not a kernel: a position
      opens a new span iff it lies past the running ``max(pos + k)`` of
      everything before it; ``sum(new_span)`` numbers the islands.

    Compare :func:`boilerplate_segments <symspellpy_spark.operators.dedup>`
    (document-frequency over ALIGNED windows, a quality signal) — this
    operator tracks arbitrary-offset exact duplication and feeds
    :func:`remove_duplicate_spans`, which edits the text.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    toks = (
        docs.select(
            F.col(id_col).alias("id"),
            F.split(F.col(text_col), " ").alias("ts"),
        )
        .where(F.col(text_col).isNotNull() & (F.length(text_col) > 0))
        .where(F.size("ts") >= k)
    )
    grams = toks.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("ts") - k),
                lambda i: F.concat_ws(" ", F.slice("ts", i + 1, k)),
            )
        ).alias("pos", "g"),
    )
    key = F.xxhash64("g") if hash_grams else F.col("g")
    grams = grams.select("id", "pos", key.alias("gh"))
    hot = (
        grams.groupBy("gh")
        .agg(F.min(F.struct("id", "pos")).alias("first"), F.count("*").alias("n"))
        .where(F.col("n") >= 2)
    )
    if join_salt > 1:
        hot = hot.withColumn(
            "_salt", F.explode(F.sequence(F.lit(0), F.lit(join_salt - 1)))
        )
        salted = grams.withColumn(
            "_salt",
            F.pmod(F.xxhash64("id", "pos"), F.lit(join_salt)).cast("int"),
        )
        dup = salted.join(hot, ["gh", "_salt"]).drop("_salt")
    else:
        dup = grams.join(hot, "gh")
    if keep_first:
        dup = dup.where(
            (F.col("id") != F.col("first.id")) | (F.col("pos") != F.col("first.pos"))
        )
    w = Window.partitionBy("id").orderBy("pos")
    prev_max_end = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = (
        dup.select("id", "pos", (F.col("pos") + k).alias("e"))
        .withColumn(
            "new_span",
            F.when(prev_max_end.isNull() | (F.col("pos") > prev_max_end), 1).otherwise(
                0
            ),
        )
        .withColumn(
            "span_id",
            F.sum("new_span").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return flagged.groupBy("id", "span_id").agg(
        F.min("pos").cast("long").alias("span_start"),
        F.max("e").cast("long").alias("span_end"),
        F.count("*").alias("n_grams"),
    )


def remove_duplicate_spans(
    docs: DataFrame,
    spans: DataFrame | None = None,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_grams: bool = True,
    join_salt: int = 1,
) -> DataFrame:
    """-> (id, clean_text, n_tokens, n_tokens_removed): documents with
    their :func:`duplicate_spans` excised (keep-first semantics: the
    globally first occurrence of each duplicated passage survives).

    Pure Catalyst: the merged spans aggregate to one
    ``array<struct<span_start, span_end>>`` per affected document
    (bounded by ``n_tokens / 1`` but in practice tiny), left-join back
    on ``id`` (AQE broadcasts the small span side), and the excision is
    a ``filter``/``exists`` higher-order expression over the token
    array — no Python. EVERY input document yields exactly one output
    row: documents with no duplicated span pass through byte-identical
    (``clean_text = text``), and null/empty-text documents — which can
    contain no span — pass through with ``clean_text = text`` and
    ``n_tokens = n_tokens_removed = 0``, preserving the pipeline's
    byte-identical-text invariant for survivors.

    ``join_salt`` passes through to :func:`duplicate_spans`' hot-gram
    join-back (identical output for any value; see that docstring and
    ``BENCH_SPAN_SALT.json`` for when it pays).
    """
    if spans is None:
        spans = duplicate_spans(
            docs,
            k=k,
            id_col=id_col,
            text_col=text_col,
            hash_grams=hash_grams,
            join_salt=join_salt,
        )
    sp = spans.groupBy("id").agg(
        F.sort_array(F.collect_list(F.struct("span_start", "span_end"))).alias("sps")
    )
    base = docs.select(
        F.col(id_col).alias("id"),
        F.split(F.col(text_col), " ").alias("ts"),
    ).where(F.col(text_col).isNotNull() & (F.length(text_col) > 0))
    kept = F.filter(
        F.zip_with(
            F.col("ts"),
            F.sequence(F.lit(0), F.size("ts") - 1),
            lambda t, i: F.struct(t.alias("t"), i.alias("p")),
        ),
        lambda x: ~F.exists(
            F.col("sps"),
            lambda s: (x["p"] >= s["span_start"]) & (x["p"] < s["span_end"]),
        ),
    )
    no_spans = F.col("sps").isNull()
    out = (
        base.join(sp, "id", "left")
        .withColumn("kept", kept)
        .select(
            "id",
            F.when(no_spans, F.array_join("ts", " "))
            .otherwise(F.array_join(F.transform("kept", lambda x: x["t"]), " "))
            .alias("clean_text"),
            F.size("ts").cast("long").alias("n_tokens"),
            F.when(no_spans, F.lit(0))
            .otherwise(F.size("ts") - F.size("kept"))
            .cast("long")
            .alias("n_tokens_removed"),
        )
    )
    # null/empty-text docs (excluded from tokenization above) pass
    # through untouched instead of vanishing from the output
    passthrough = docs.where(
        F.col(text_col).isNull() | (F.length(text_col) == 0)
    ).select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("clean_text"),
        F.lit(0).cast("long").alias("n_tokens"),
        F.lit(0).cast("long").alias("n_tokens_removed"),
    )
    return out.unionByName(passthrough)


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
