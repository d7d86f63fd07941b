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


def _frame_rows(pdf):
    """Canonical (dtype-kind, value) row tuples from a PANDAS frame.

    DTYPE-STRICT through the driver's own path: the driver value-hashes
    pandas frames (spark .toPandas() vs duckdb .df()), so the mirror must
    compare what PANDAS sees, not raw fetchall() values —
    - DuckDB HUGEINT (sum of bigint) → float64 in pandas, vs Spark long →
      int64: kind 'f' vs 'i' FAILS here the way it failed the driver in
      rounds 1 and 2 (events_sessionize, pipeline_corpus_prep), while raw
      fetchall() returns a Python int that a value compare can't catch;
    - DuckDB DECIMAL → float64 ≡ Spark double: passes, as in the driver
      (a typed fetchall() compare false-alarms on Decimal('1.00') vs 1.0).
    """
    import pandas as pd

    cols = sorted(pdf.columns)
    kinds = ["i" if pdf[c].dtype.kind == "u" else pdf[c].dtype.kind for c in cols]
    rows = []
    for tup in pdf[cols].itertuples(index=False, name=None):
        row = []
        for k, v in zip(kinds, tup):
            if v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
                row.append((k, "NA"))
            else:
                row.append((k, v))
        rows.append(tuple(row))
    return sorted(rows, key=repr)


ORACLE_QUERIES = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, ddb, name):
    spdf = entrymod.queries()[name](spark, sf_dir).toPandas()
    ddf = ddb.sql(entrymod.oracle_sql()[name]).df()

    assert sorted(spdf.columns) == sorted(ddf.columns), f"{name}: column names differ"
    assert len(spdf) == len(ddf), (
        f"{name}: row count {len(spdf)} vs oracle {len(ddf)}"
    )
    a = _frame_rows(spdf)
    b = _frame_rows(ddf)
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: values/dtypes differ, first diffs: {diff}")


def test_mirror_is_dtype_strict():
    """The exact bug class behind the only red driver row in rounds 1 AND
    2: DuckDB sum(bigint) returns HUGEINT → float64 in pandas, Spark
    returns long → int64. The mirror must fail on it locally (the old
    value-only compare said 1301 == 1301.0) and pass once the oracle
    casts the sum to bigint."""
    import pandas as pd

    spark_like = pd.DataFrame({"s": pd.Series([1301], dtype="int64")})
    hug = duckdb.sql("select sum(x) as s from (select 1301::bigint as x)").df()
    cast = duckdb.sql(
        "select cast(sum(x) as bigint) as s from (select 1301::bigint as x)"
    ).df()
    assert _frame_rows(hug) != _frame_rows(spark_like), (
        "mirror failed to flag the HUGEINT→float64 dtype drift"
    )
    assert _frame_rows(cast) == _frame_rows(spark_like)


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
