"""Emulate the driver's correctness gate: run every queries() entry at
sf0.01 and compare against its oracle_sql() via DuckDB (row count +
schema column names + order-insensitive values)."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.10g}"
    return str(v)


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = [r[i] for i in order] if not isinstance(r, dict) else [r[cols[i]] for i in order]
        out.append(tuple(_norm_cell(v) for v in vals))
    return sorted(out)


ALL_QUERIES = sorted(entry_mod.queries())


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    oracle = entry_mod.oracle_sql().get(name)
    if oracle is None:
        # rows-only contract: just require a stable, non-erroring result
        assert isinstance(srows, list)
        return
    res = duck.execute(oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    assert sorted(c.lower() for c in scols) == sorted(c.lower() for c in ocols), (
        name,
        scols,
        ocols,
    )
    assert len(srows) == len(orows), (name, len(srows), len(orows))
    got = _normalize(srows, scols)
    exp = _normalize(orows, ocols)
    mism = [i for i, (g, e) in enumerate(zip(got, exp)) if g != e]
    assert not mism, (name, [(got[i], exp[i]) for i in mism[:3]])


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert rows is not None and df.columns
