"""Frequency-dictionary file readers.

Behavioral spec from the reference loaders:
- unigram: ``_load_dictionary_stream`` (symspellpy.py:1110-1141) — split
  each line on ``separator``, need >= 2 parts, term at ``term_index``,
  count at ``count_index``; non-int64 counts are skipped with a warning.
- bigram: ``_load_bigram_dictionary_stream`` (symspellpy.py:1070-1108) —
  default separator None means whitespace-split with >= 3 parts and key
  ``parts[i] + " " + parts[i+1]``; explicit separator means >= 2 parts
  with the key taken verbatim (may contain spaces).

Expressed as line scans + split/element_at/try_cast — all JVM-side, so
a 100 GB dictionary file would load as a normal distributed scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["read_unigram_dictionary", "read_bigram_dictionary", "dict_to_df"]


def _split_col(separator: str):
    # split() takes a regex; quote the separator literally
    import re

    return re.escape(separator)


def read_unigram_dictionary(
    spark: SparkSession,
    path: str,
    term_index: int = 0,
    count_index: int = 1,
    separator: str = " ",
) -> DataFrame:
    """-> vocab rows ``(term STRING, count LONG)``; malformed lines dropped."""
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), _split_col(separator))
    df = lines.select(
        F.element_at(parts, term_index + 1).alias("term"),
        F.element_at(parts, count_index + 1).cast("string").alias("_count_raw"),
        F.size(parts).alias("_n"),
    )
    return (
        df.where(F.col("_n") >= 2)
        .select(
            "term",
            F.col("_count_raw").try_cast("long").alias("count"),
        )
        .where(F.col("count").isNotNull() & F.col("term").isNotNull())
    )


def read_bigram_dictionary(
    spark: SparkSession,
    path: str,
    term_index: int = 0,
    count_index: int = 2,
    separator: str | None = None,
) -> DataFrame:
    """-> bigram rows ``(bigram STRING, count LONG)``."""
    lines = spark.read.text(path)
    if separator is None:
        parts = F.split(F.trim(F.col("value")), r"\s+")
        df = lines.select(
            F.concat_ws(
                " ",
                F.element_at(parts, term_index + 1),
                F.element_at(parts, term_index + 2),
            ).alias("bigram"),
            F.element_at(parts, count_index + 1).alias("_count_raw"),
            F.size(parts).alias("_n"),
        ).where(F.col("_n") >= 3)
    else:
        parts = F.split(F.col("value"), _split_col(separator))
        df = lines.select(
            F.element_at(parts, term_index + 1).alias("bigram"),
            F.element_at(parts, count_index + 1).alias("_count_raw"),
            F.size(parts).alias("_n"),
        ).where(F.col("_n") >= 2)
    return df.select(
        "bigram", F.col("_count_raw").try_cast("long").alias("count")
    ).where(F.col("count").isNotNull() & F.col("bigram").isNotNull())


def dict_to_df(spark: SparkSession, mapping: dict[str, int]) -> DataFrame:
    """In-memory dict -> vocab DataFrame (analogue of helpers.DictIO,
    reference helpers.py:287-308)."""
    return spark.createDataFrame(
        list(mapping.items()), schema="term string, count long"
    )
