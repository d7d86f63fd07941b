"""Self-check of the __spark_entry__ contract: every oracle-checked query
must produce value-identical results to its DuckDB SQL at sf0.001 —
exactly what the driver verifies at sf0.01."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm(v):
    # EXACT equality, floats included: both engines compute rounded
    # doubles from identical inputs, so even the bits must match (this
    # mirrors the driver's value-hash, which tolerates no fuzz).
    #
    # DTYPE-STRICT: the comparison key carries the Python type, so
    # 1301 (Spark long) vs 1301.0 (DuckDB HUGEINT→float) FAILS here the
    # way it fails the driver's dtype-sensitive value-hash. This exact
    # class (sum() dtype drift) caused the only red CORRECTNESS row in
    # BOTH round 1 (events_sessionize) and round 2 (pipeline_corpus_prep)
    # while the old value-only compare passed locally.
    if isinstance(v, float) and math.isnan(v):
        return ("float", "NaN")
    return (type(v).__name__, v)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


ORACLE_QUERIES = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, ddb, name):
    qdf = entrymod.queries()[name](spark, sf_dir)
    spark_cols = qdf.columns
    spark_rows = [tuple(r) for r in qdf.collect()]

    res = ddb.sql(entrymod.oracle_sql()[name])
    duck_cols = [c for c in res.columns]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs oracle {len(duck_rows)}"
    )
    a = _rowset(spark_cols, spark_rows)
    b = _rowset(duck_cols, duck_rows)
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: values differ, first diffs: {diff}")


def test_rows_only_queries_run(spark, sf_dir):
    """Queries without an oracle must still run and return a stable schema."""
    qs = entrymod.queries()
    for name in set(qs) - set(entrymod.oracle_sql()):
        df = qs[name](spark, sf_dir)
        assert df.columns, name
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"host", "n_urls", "total_tokens", "avg_quality"}
