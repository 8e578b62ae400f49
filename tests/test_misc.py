"""Smaller contract tests: persistence version gate, custom comparer,
similarity expression, config validation."""

import json
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from symspellpy_spark.config import EngineConfig
from symspellpy_spark.functions.distance import distance_udf, to_similarity
from symspellpy_spark.operators.dictionary import SparkDictionary


def test_config_validation_matches_reference(reference_symspell_module):
    from symspellpy import SymSpell

    with pytest.raises(ValueError):
        SymSpell(max_dictionary_edit_distance=-1)
    with pytest.raises(ValueError):
        EngineConfig(max_dictionary_edit_distance=-1)
    with pytest.raises(ValueError):
        SymSpell(prefix_length=2, max_dictionary_edit_distance=2)
    with pytest.raises(ValueError):
        EngineConfig(prefix_length=2, max_dictionary_edit_distance=2)
    with pytest.raises(ValueError):
        SymSpell(count_threshold=-1)
    with pytest.raises(ValueError):
        EngineConfig(count_threshold=-1)


def test_checkpoint_version_reject(spark, tmp_path):
    """Analogue of pickle_mixin.py:138-139 data_version gate."""
    words = spark.createDataFrame([("a", 1)], "term string, count long")
    d = SparkDictionary.from_words(spark, words)
    path = str(tmp_path / "ckpt")
    d.save(path)
    props = json.load(open(os.path.join(path, "properties.json")))
    props["data_version"] = 2
    json.dump(props, open(os.path.join(path, "properties.json"), "w"))
    with pytest.raises(ValueError, match="data_version"):
        SparkDictionary.load(spark, path)


def test_user_provided_comparer(spark):
    """E10: the USER_PROVIDED distance plug point
    (reference abstract_distance_comparer.py:4-23)."""

    def constant_comparer(s1: pd.Series, s2: pd.Series, max_d: int) -> pd.Series:
        return pd.Series([1] * len(s1), index=s1.index)

    udf = distance_udf(comparer=constant_comparer, max_distance=2)
    df = spark.createDataFrame([("abc", "xyz")], "a string, b string")
    assert df.select(udf("a", "b").alias("d")).first()["d"] == 1


def test_to_similarity(spark):
    """E9 (reference helpers.py:253-265)."""
    df = spark.createDataFrame([(1, 5), (-1, 5), (0, 4)], "d int, l int")
    got = [
        r["s"]
        for r in df.select(
            to_similarity(F.col("d"), F.col("l")).alias("s")
        ).collect()
    ]
    assert got == [0.8, -1.0, 1.0]


def test_saturating_sum(spark):
    from symspellpy_spark.functions.text import saturating_sum

    big = 2**62
    df = spark.createDataFrame(
        [("t", big), ("t", big), ("t", big)], "term string, count long"
    )
    got = df.groupBy("term").agg(saturating_sum(F.col("count")).alias("c")).first()
    assert got["c"] == 2**63 - 1
