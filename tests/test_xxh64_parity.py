"""XXH64 parity pins: every reimplementation of Spark's xxhash64 in
this repo (the DuckDB SQL stage chain used by the simhash_pairs /
winnowing_xxhash oracles, the vectorized per-gram numpy kernel, and
the scalar Python fallback) must be bit-exact vs Spark itself."""

import random

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from symspellpy_spark.operators.dedup import _xxh64_grams, _xxh64_py

ALPHA = "abcdefghijklmnopqrstuvwxyz0123456789"


def _spark_xxh(spark, strs):
    df = spark.createDataFrame([(s,) for s in strs], "s string")
    return {
        r["s"]: r["h"]
        for r in df.select("s", F.xxhash64("s").alias("h")).collect()
    }


def test_sql_chain_matches_spark(spark):
    """DuckDB XXH64 stage chain == Spark xxhash64, lengths 1..15."""
    import __spark_entry__ as E

    rng = random.Random(99)
    toks = sorted(
        {
            "".join(rng.choice(ALPHA) for _ in range(L))
            for L in range(1, 16)
            for _ in range(25)
        }
    )
    exp = _spark_xxh(spark, toks)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(tokv VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(t,) for t in toks])
    inner = E._xxh64_nested_sql("SELECT tokv FROM t")
    sql = f"""
    SELECT tokv,
           CAST(CASE WHEN xxh >= {1 << 63}
                     THEN CAST(xxh AS HUGEINT) - {E._M64}
                     ELSE CAST(xxh AS HUGEINT) END AS BIGINT) AS h
    FROM ({inner})"""
    got = dict(con.execute(sql).fetchall())
    assert got == exp


def test_sql_chain_rejects_long_tokens():
    import __spark_entry__ as E

    con = duckdb.connect()
    con.execute("CREATE TABLE t(tokv VARCHAR)")
    con.execute(f"INSERT INTO t VALUES ('{'a' * 16}')")
    inner = E._xxh64_nested_sql("SELECT tokv FROM t")
    with pytest.raises(duckdb.Error, match="len<=15"):
        con.execute(f"SELECT xxh FROM ({inner})").fetchall()


def test_long_sql_chain_matches_spark(spark):
    """DuckDB XXH64-of-long stage chain (the data_mix oracle) ==
    Spark xxhash64 over a LONG column: the 8-byte little-endian block
    short path, extremes and random values."""
    import __spark_entry__ as E

    rng = random.Random(41)
    vals = sorted(
        {0, 1, -1, 2**63 - 1, -(2**63), 499}
        | {rng.randrange(-(2**63), 2**63) for _ in range(200)}
    )
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    exp = {
        r["v"]: r["h"]
        for r in df.select("v", F.xxhash64("v").alias("h")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    inner = "SELECT v FROM t"
    for c in E._xxh64_long_cols("v"):
        inner = f"SELECT *, {c} FROM ({inner})"
    got = dict(con.execute(f"SELECT v, xxh_signed FROM ({inner})").fetchall())
    assert got == exp


def test_gram_kernel_matches_spark(spark):
    """Vectorized per-gram XXH64 == Spark xxhash64 of each substring,
    several gram sizes across the short-path chunk schedule."""
    rng = random.Random(7)
    text = "".join(rng.choice(ALPHA + " ") for _ in range(400))
    buf = np.frombuffer(text.encode(), dtype=np.uint8)
    for k in (3, 5, 8, 13, 20, 31):
        grams = [text[i : i + k] for i in range(len(text) - k + 1)]
        exp = _spark_xxh(spark, sorted(set(grams)))
        got = _xxh64_grams(buf, k).view(np.int64)
        assert all(int(got[i]) == exp[g] for i, g in enumerate(grams)), k


def test_scalar_fallback_matches_spark(spark):
    """_xxh64_py (non-ASCII winnowing fallback) == Spark xxhash64,
    including the >=32-byte stripe path and multi-byte utf8."""
    cases = ["héllo", "ünïcöde gräms", "a" * 67, "x" * 32, "q" * 31]
    exp = _spark_xxh(spark, cases)
    for s in cases:
        h = _xxh64_py(s.encode())
        signed = h - (1 << 64) if h >= (1 << 63) else h
        assert signed == exp[s], s
