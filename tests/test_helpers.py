"""Helper parity (reference tests/test_helpers.py)."""

import pytest

from symspellpy_spark.functions.text import (
    case_transfer_matching_py,
    case_transfer_similar_py,
)


def test_case_transfer_matching_parity(reference_symspell_module):
    from symspellpy import helpers as ref_helpers

    cases = [
        ("Haw", "haw"),
        ("HaW", "haw"),
        ("HAW", "haw"),
        ("aBc", "xyz"),
        ("", ""),
    ]
    for cased, uncased in cases:
        assert case_transfer_matching_py(cased, uncased) == (
            ref_helpers.case_transfer_matching(cased, uncased)
        )
    with pytest.raises(ValueError):
        case_transfer_matching_py("ab", "abc")


def test_case_transfer_similar_parity(reference_symspell_module):
    from symspellpy import helpers as ref_helpers

    cases = [
        ("Haaw", "haw"),
        ("Haw", "haaw"),
        ("HAW", "haaw"),
        ("Widht", "width"),
        ("SOme", "some"),
        ("New York", "new york city"),
        ("imPortant", "important"),
        ("Whereis th elove", "where is the love"),
        ("A", "a longer phrase"),
    ]
    for cased, uncased in cases:
        assert case_transfer_similar_py(cased, uncased) == (
            ref_helpers.case_transfer_similar(cased, uncased)
        ), (cased, uncased)
    assert case_transfer_similar_py("abc", "") == ""
    with pytest.raises(ValueError):
        case_transfer_similar_py("", "abc")


def test_parse_words_expr_parity(spark, reference_symspell_module):
    from symspellpy import helpers as ref_helpers

    from pyspark.sql import functions as F
    from symspellpy_spark.functions.text import parse_words_expr

    texts = [
        "The quick-brown fox; don't stop_now 123abc",
        "Привет, мир! 你好 世界",
        "it's O'Brien's co’op",
        "  spaced\tout\nlines ",
        "",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    for preserve in (False, True):
        for by_space in (False, True):
            got = df.select(
                parse_words_expr(
                    F.col("text"), preserve_case=preserve, split_by_space=by_space
                ).alias("w")
            ).collect()
            for row, t in zip(got, texts):
                exp = ref_helpers.parse_words(
                    t, preserve_case=preserve, split_by_space=by_space
                )
                assert list(row["w"]) == exp, (t, preserve, by_space)
