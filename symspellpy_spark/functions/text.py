"""Scalar text functions (reference helpers.py + _parse_words).

Tokenization stays JVM-side via ``regexp_extract_all`` with the Java
``(?U)`` flag so ``\\w`` matches Unicode word characters exactly like
Python's ``re`` module does in the reference (symspellpy.py:42,
helpers.py:214-218). Case transfer runs only on final lookup survivors,
so a per-row difflib pandas UDF is acceptable there.
"""

from __future__ import annotations

from difflib import SequenceMatcher

import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.types import StringType

__all__ = [
    "WORD_PATTERN",
    "parse_words_expr",
    "is_acronym_expr",
    "saturating_sum",
    "case_transfer_matching_py",
    "case_transfer_similar_py",
    "case_transfer_similar_udf",
]

#: reference symspellpy.py:42 — ``(([^\W_]|['’])+)`` with Python (Unicode)
#: word semantics; ``(?U)`` gives Java regex the same character classes.
#: Used by create_dictionary / _parse_words.
WORD_PATTERN = r"(?U)([^\W_]|['’])+"

#: reference helpers.py:214-218 — the slightly different tokenizer used by
#: lookup_compound / word_segmentation (token must start with a word char).
PARSE_WORDS_PATTERN = r"(?U)[^\W_]+['’]*[^\W_]*"


def parse_words_expr(
    text: Column, preserve_case: bool = False, split_by_space: bool = False
) -> Column:
    """array<string> of word tokens (reference helpers.py:195-218)."""
    src = text if preserve_case else F.lower(text)
    if split_by_space:
        # Python str.split(): runs of whitespace, leading/trailing stripped,
        # empty string -> []
        return F.filter(
            F.split(F.trim(src), r"\s+"), lambda t: F.length(t) > 0
        )
    return F.regexp_extract_all(src, F.lit(PARSE_WORDS_PATTERN), 0)


def corpus_words_expr(text: Column) -> Column:
    """Tokenizer used when building a dictionary from raw corpus text
    (reference _parse_words, symspellpy.py:1143-1157)."""
    return F.regexp_extract_all(F.lower(text), F.lit(WORD_PATTERN), 0)


def is_acronym_expr(word: Column, contain_digits: bool = False) -> Column:
    """reference helpers.py:153-168."""
    if contain_digits:
        return word.rlike(r"\b[A-Z0-9]{2,}\b") | word.rlike(r"\d")
    return word.rlike(r"\b[A-Z0-9]{2,}\b")


def saturating_sum(count: Column) -> Column:
    """Aggregate: sum with saturation at int64 max
    (reference helpers.increment_count, helpers.py:146-150). Sum in
    decimal(38,0) so intermediate totals cannot overflow, then clamp."""
    from symspellpy_spark.config import MAX_INT64

    total = F.sum(count.cast("decimal(38,0)"))
    return F.least(total, F.lit(MAX_INT64).cast("decimal(38,0)")).cast("long")


def case_transfer_matching_py(cased: str, uncased: str) -> str:
    """Char-by-char casing copy, equal lengths only (reference helpers.py:45-69)."""
    if len(cased) != len(uncased):
        raise ValueError(
            "'cased_text' and 'uncased_text' don't have the same length, "
            "use case_transfer_similar() instead"
        )
    return "".join(
        u.upper() if c.isupper() else u.lower() for c, u in zip(cased, uncased)
    )


def case_transfer_similar_py(cased: str, uncased: str) -> str:
    """Casing transfer between similar strings via SequenceMatcher opcodes
    (reference helpers.py:72-143)."""
    if not uncased:
        return uncased
    if not cased:
        raise ValueError("'cased_text' cannot be empty")

    matcher = SequenceMatcher(a=cased.lower(), b=uncased)
    result = ""
    for tag, ia1, ia2, ib1, ib2 in matcher.get_opcodes():
        if tag == "delete":
            continue
        if tag == "insert":
            # first char / after-a-space inserts inherit the following
            # char's casing, otherwise the prior char's
            ia_ref = ia1 if ia1 == 0 or cased[ia1 - 1] == " " else ia1 - 1
            if cased[ia_ref].isupper():
                result += uncased[ib1:ib2].upper()
            else:
                result += uncased[ib1:ib2].lower()
        elif tag == "equal":
            result += cased[ia1:ia2]
        else:  # replace
            cased_seq = cased[ia1:ia2]
            uncased_seq = uncased[ib1:ib2]
            if len(cased_seq) == len(uncased_seq):
                result += case_transfer_matching_py(cased_seq, uncased_seq)
            else:
                for c_ch, u_ch in zip(cased_seq, uncased_seq):
                    result += u_ch.upper() if c_ch.isupper() else u_ch.lower()
                if len(cased_seq) < len(uncased_seq):
                    upper = cased_seq[-1].isupper()
                    rest = uncased_seq[len(cased_seq):]
                    result += rest.upper() if upper else rest.lower()
    return result


def case_transfer_similar_udf():
    """Pandas UDF (cased, uncased) -> recased suggestion."""

    @F.pandas_udf(StringType())
    def _transfer(cased: pd.Series, uncased: pd.Series) -> pd.Series:
        return pd.Series(
            [
                (
                    u
                    if c is None or u is None
                    else case_transfer_similar_py(c, u)
                )
                for c, u in zip(cased, uncased)
            ],
            index=cased.index,
        )

    return _transfer
