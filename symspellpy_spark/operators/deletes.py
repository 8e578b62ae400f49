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


def delete_neighborhood(
    terms: DataFrame,
    config: EngineConfig,
    term_col: str = "term",
) -> DataFrame:
    """(term, delete_key) rows for the full delete neighborhood.

    Output has one row per distinct (term, delete_key); carries through
    every other column of ``terms``.
    """
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

    # reference _edits_prefix:1063-1064 — explicit "" for short terms
    # (also reachable via deletions; distinct() collapses it)
    empty = prefixed.where(F.length(F.col(term_col)) <= d).select(
        term_col, *extra, F.lit("").alias("delete_key")
    )

    out = levels[0]
    for lvl in levels[1:]:
        out = out.unionByName(lvl)
    out = out.unionByName(empty)
    return out.distinct()
