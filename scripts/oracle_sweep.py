"""Sweep every oracle-checked contract query at one or more scale
factors with the SAME pandas-path dtype-strict compare the mirror test
uses (tests/test_oracle_contract._frame_rows). The pytest fixture pins
sf0.001; the driver verifies at sf0.01 — run this before shipping new
queries (sf0.001 once missed a rounding drift that sf0.01 caught).

Usage: python3 scripts/oracle_sweep.py [sf0.01 sf0.1 ...] [--only q1,q2]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import duckdb  # noqa: E402

import __spark_entry__ as em  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    from test_oracle_contract import _frame_rows

    from xtracted_crawlers_spark.session import get_spark

    argv = sys.argv[1:]
    only: set[str] | None = None
    if "--only" in argv:
        i = argv.index("--only")
        if i + 1 >= len(argv):
            sys.exit("--only wants a comma-separated query list")
        only = set(argv[i + 1].split(","))
        unknown = only - set(em.oracle_sql())
        if unknown:
            # a misspelled name must not let the sweep exit green
            # having verified nothing
            sys.exit(f"--only names not in oracle_sql(): {sorted(unknown)}")
        argv = argv[:i] + argv[i + 2 :]
    sfs = argv or ["sf0.01"]
    spark = get_spark("oracle-sweep", master="local[16]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    failures = []
    for sf in sfs:
        sf_dir = os.path.join("/root/testdata", sf)
        con = duckdb.connect()
        for t in TABLES:
            con.sql(
                f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')"
            )
        for name in sorted(em.oracle_sql()):
            if only is not None and name not in only:
                continue
            spdf = em.queries()[name](spark, sf_dir).toPandas()
            ddf = con.sql(em.oracle_sql()[name]).df()
            ok = (
                sorted(spdf.columns) == sorted(ddf.columns)
                and len(spdf) == len(ddf)
                and _frame_rows(spdf) == _frame_rows(ddf)
            )
            print(f"{sf} {name}: {'OK' if ok else 'MISMATCH'} ({len(spdf)} rows)", flush=True)
            if not ok:
                failures.append((sf, name))
        con.close()
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
