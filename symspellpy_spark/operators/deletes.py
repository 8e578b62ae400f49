"""Symmetric-delete neighborhood as a relational operator.

The reference builds its candidate index by recursively enumerating
single-character deletions of each (prefix-truncated) term
(symspellpy.py:1038-1068, ``_edits`` / ``_edits_prefix``). The resulting
*set* for a term is exactly: every distinct string obtainable by
deleting at most ``max_edit_distance`` characters from
``term[:prefix_length]``, plus ``""`` when ``len(term) <=
max_edit_distance``, plus the truncated term itself.

Here that set is produced with pure Catalyst expressions — iterated
``posexplode(sequence(...))`` + substring splicing, one round per edit
level, then ``distinct`` — so index build is whole-stage-codegen
JVM work with no Python boundary. At 100 TB this matters: delete
generation runs on every token of every document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from symspellpy_spark.config import EngineConfig

__all__ = ["delete_neighborhood", "single_deletes"]


def single_deletes(df: DataFrame, key_col: str, out_col: str) -> DataFrame:
    """All single-character deletions of ``key_col`` (one output row per
    deletion position; empty input strings produce no rows)."""
    pos = F.explode(F.sequence(F.lit(1), F.length(F.col(key_col))))
    return (
        df.where(F.length(F.col(key_col)) > 0)
        .select(
            *[c for c in df.columns if c != out_col],
            pos.alias("__pos"),
        )
        .select(
            *[c for c in df.columns if c != out_col],
            F.concat(
                F.expr(f"substring({key_col}, 1, __pos - 1)"),
                F.expr(f"substring({key_col}, __pos + 1, 2147483647)"),
            ).alias(out_col),
        )
    )


def _deletes_of(s):
    """array<string> of all single-character deletions of string column
    ``s`` (empty array for the empty string)."""
    body = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(
            F.substr(s, F.lit(1), i - F.lit(1)),
            F.substr(s, i + F.lit(1), F.length(s)),
        ),
    )
    return F.when(F.length(s) > 0, body).otherwise(
        F.array().cast("array<string>")
    )


def delete_neighborhood(
    terms: DataFrame,
    config: EngineConfig,
    term_col: str = "term",
) -> DataFrame:
    """(term, delete_key) rows for the full delete neighborhood.

    Output has one row per distinct (term, delete_key) — assuming
    distinct input terms — and carries through every other column of
    ``terms``.

    The neighborhood is built as a per-row array expression
    (``transform``/``flatten``/``array_distinct``) and exploded once:
    dedup happens inside the row, so no shuffle and no Python boundary.
    For pathological fanout (long prefixes at high edit distance) the
    per-row array would get large; fall back to the union+distinct
    relational path there.
    """
    d = config.max_dictionary_edit_distance
    p = config.prefix_length
    fanout = 1
    for i in range(d):
        fanout *= max(p - i, 1)
    if fanout > 20_000:
        return _delete_neighborhood_relational(terms, config, term_col)

    extra = [c for c in terms.columns if c != term_col]
    prefix = F.substring(F.col(term_col), 1, p)

    levels = [F.array(prefix)]
    frontier = levels[0]
    for _ in range(d):
        frontier = F.flatten(F.transform(frontier, _deletes_of))
        levels.append(frontier)

    keys = F.concat(*levels)
    # reference _edits_prefix:1063-1064 — explicit "" for short terms
    # (also reachable via deletions; array_distinct collapses it)
    keys = F.concat(
        keys,
        F.when(
            F.length(F.col(term_col)) <= d, F.array(F.lit(""))
        ).otherwise(F.array().cast("array<string>")),
    )
    return terms.select(
        term_col, *extra, F.explode(F.array_distinct(keys)).alias("delete_key")
    )


def _delete_neighborhood_relational(
    terms: DataFrame,
    config: EngineConfig,
    term_col: str = "term",
) -> DataFrame:
    """Union+distinct fallback for very large per-term neighborhoods."""
    d = config.max_dictionary_edit_distance
    extra = [c for c in terms.columns if c != term_col]

    prefixed = terms.select(
        *terms.columns,
        F.substring(F.col(term_col), 1, config.prefix_length).alias("delete_key"),
    )

    levels = [prefixed.select(term_col, *extra, "delete_key")]
    frontier = levels[0]
    for _ in range(d):
        tmp = frontier.withColumnRenamed("delete_key", "__src")
        nxt = single_deletes(tmp, "__src", "delete_key").select(
            term_col, *extra, "delete_key"
        )
        levels.append(nxt)
        frontier = nxt

    empty = prefixed.where(F.length(F.col(term_col)) <= d).select(
        term_col, *extra, F.lit("").alias("delete_key")
    )

    out = levels[0]
    for lvl in levels[1:]:
        out = out.unionByName(lvl)
    out = out.unionByName(empty)
    return out.distinct()
