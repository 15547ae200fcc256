"""Replica of the driver's t2 correctness gate: run every registered query
through Spark AND its DuckDB oracle at sf0.01, compare row count, column
names, and order-insensitive values (the driver's value-hash analog).
"""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def normalize(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse fp noise beyond what both engines agree on
        return round(v, 9)
    if isinstance(v, list):
        return tuple(normalize(x) for x in v)
    return v


def to_sorted_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(normalize(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


ORACLE_KEYS = sorted(entry_mod.oracle_sql().keys())


def test_every_query_has_callable():
    qs = entry_mod.queries()
    for k in entry_mod.oracle_sql():
        assert k in qs, f"oracle {k} has no query"


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(entry_mod.oracle_sql()[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column mismatch"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"

    s = to_sorted_rows(spark_cols, spark_rows)
    d = to_sorted_rows(duck_cols, duck_rows)
    mism = [i for i, (a, b) in enumerate(zip(s, d)) if a != b]
    assert not mism, f"{name}: {len(mism)} mismatched rows; first: {s[mism[0]]} vs {d[mism[0]]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_rows_only_queries_run(spark):
    for name, q in entry_mod.queries().items():
        if name not in entry_mod.oracle_sql():
            assert q(spark, SF_DIR).count() >= 0, name
