"""lookup_batch_local must be result-equivalent to the relational
lookup_batch — pinned on the reference's noisy-query corpus at every
verbosity, and on the option quirks (ignore_pattern, include_unknown,
transfer_casing) with a small dictionary."""

import pytest
from pyspark.sql import functions as F

from symspellpy_spark.config import EngineConfig, Verbosity
from symspellpy_spark.operators.dictionary import SparkDictionary
from symspellpy_spark.operators.local_lookup import lookup_batch_local
from symspellpy_spark.operators.lookup import lookup_batch

DICT_PATH = "/root/reference/symspellpy/frequency_dictionary_en_82_765.txt"
NOISY_PATH = "/root/reference/tests/fortests/noisy_query_en_1000.txt"


@pytest.fixture(scope="module")
def en_dict(spark):
    return SparkDictionary.load_dictionary(spark, DICT_PATH).cache()


@pytest.fixture(scope="module")
def small_dict(spark):
    words = spark.createDataFrame(
        [("steama", 4), ("steamb", 6), ("steam", 10), ("steams", 5),
         ("steem", 8), ("a", 3), ("i", 2)],
        "term string, count long",
    )
    return SparkDictionary.from_words(spark, words).cache()


def _rows(df):
    return sorted(
        (r["query"], r["term"], r["distance"], r["count"]) for r in df.collect()
    )


@pytest.mark.parametrize(
    "verb", [Verbosity.TOP, Verbosity.CLOSEST, Verbosity.ALL]
)
def test_equivalence_on_noisy_corpus(spark, en_dict, verb):
    with open(NOISY_PATH) as fh:
        noisy = [line.split()[0] for line in fh if line.strip()][::5]
    qdf = spark.createDataFrame([(w,) for w in noisy], "query string")
    d = 1 if verb == Verbosity.ALL else 2
    rel = _rows(lookup_batch(qdf, en_dict, verb, max_edit_distance=d))
    loc = _rows(lookup_batch_local(qdf, en_dict, verb, max_edit_distance=d))
    assert loc == rel


@pytest.mark.parametrize(
    "kw",
    [
        dict(ignore_pattern=r"\w+\d"),
        dict(include_unknown=True),
        dict(transfer_casing=True),
        dict(ignore_pattern=r"steam\w*", include_unknown=True),
    ],
    ids=["ignore", "unknown", "casing", "ignore+unknown"],
)
@pytest.mark.parametrize("verb", [Verbosity.TOP, Verbosity.CLOSEST, Verbosity.ALL])
def test_equivalence_option_quirks(spark, small_dict, verb, kw):
    qdf = spark.createDataFrame(
        [("steam",), ("steemx",), ("STEab",), ("steamx77",), ("zzqqzz",), ("a",), ("ab",)],
        "query string",
    )
    rel = _rows(lookup_batch(qdf, small_dict, verb, max_edit_distance=2, **kw))
    loc = _rows(lookup_batch_local(qdf, small_dict, verb, max_edit_distance=2, **kw))
    assert loc == rel, (verb, kw)


def test_distance_too_large(spark, small_dict):
    qdf = spark.createDataFrame([("x",)], "query string")
    with pytest.raises(ValueError):
        lookup_batch_local(qdf, small_dict, Verbosity.TOP, max_edit_distance=5)


def test_membership_probe_d0(spark, small_dict):
    qdf = spark.createDataFrame([("steam",), ("nope",)], "query string")
    rel = _rows(lookup_batch(qdf, small_dict, Verbosity.TOP, max_edit_distance=0))
    loc = _rows(lookup_batch_local(qdf, small_dict, Verbosity.TOP, max_edit_distance=0))
    assert loc == rel == [("steam", "steam", 0, 10)]


def test_vocab_limit_routes_to_relational(spark):
    """lookup_batch_local above broadcast_vocab_limit must delegate to
    the relational lookup_batch (no driver-side vocab collect) with
    identical results."""
    from symspellpy_spark.config import Verbosity
    from symspellpy_spark.operators.dictionary import SparkDictionary
    from symspellpy_spark.operators.local_lookup import lookup_batch_local

    words = spark.createDataFrame(
        [("steam", 10), ("steem", 8), ("spark", 4)], "term string, count long"
    )
    d = SparkDictionary.from_words(spark, words)
    q = spark.createDataFrame([("steems",), ("sprak",)], "query string")
    fast = lookup_batch_local(q, d, Verbosity.ALL)
    routed = lookup_batch_local(q, d, Verbosity.ALL, broadcast_vocab_limit=2)
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "Join" in plan  # relational shape
    key = lambda r: (r["query"], r["term"], r["distance"], r["count"])  # noqa: E731
    assert sorted(map(key, fast.collect())) == sorted(map(key, routed.collect()))


def test_release_worker_state(spark, small_dict):
    """release_worker_state drops the driver broadcast caches and the
    per-worker dictionary state, and the next lookup rebuilds them with
    identical results (release is a memory event, not a semantic one)."""
    from symspellpy_spark.operators import compound, local_lookup, neighborhood
    from symspellpy_spark.operators.scoped_cache import release_worker_state

    qdf = spark.createDataFrame([("steems",), ("sprak",)], "query string")
    before = _rows(lookup_batch_local(qdf, small_dict, Verbosity.ALL))
    assert local_lookup._BC_CACHE or neighborhood._IDX_CACHE

    release_worker_state(spark)
    assert not local_lookup._BC_CACHE
    assert not neighborhood._IDX_CACHE
    assert not compound._BIGRAM_CACHE
    # every reused worker's module caches are gone (probe the pool the
    # same way the release fanned out; no lookup ran in between, so a
    # hit on any worker would be leaked state)
    n = spark.sparkContext.defaultParallelism * 4
    sizes = (
        spark.sparkContext.parallelize(range(n), n)
        .map(
            lambda _: (
                len(local_lookup._STATE),
                len(neighborhood._WORKER_RESOLVERS),
                len(compound._WORKER_SPLIT_STATE),
            )
        )
        .collect()
    )
    assert all(s == (0, 0, 0) for s in sizes), sizes

    assert _rows(lookup_batch_local(qdf, small_dict, Verbosity.ALL)) == before


def test_release_keeps_outstanding_plans_executable(spark, small_dict):
    """A DataFrame plan built BEFORE release_worker_state still executes
    AFTER it (round-4 advice): release unpersists — never destroys —
    the cached broadcasts, so a stale plan lazily re-ships them instead
    of failing with a destroyed-broadcast error."""
    from symspellpy_spark.operators.scoped_cache import release_worker_state

    qdf = spark.createDataFrame([("steems",), ("sprak",)], "query string")
    plan_before = lookup_batch_local(qdf, small_dict, Verbosity.ALL)
    expect = _rows(plan_before)  # also warms the caches

    stale = lookup_batch_local(qdf, small_dict, Verbosity.ALL)
    release_worker_state(spark)
    assert _rows(stale) == expect
