"""North-rule deployment surface: the engine runs via spark-submit
--py-files from a packaged zip, with NO repo checkout on sys.path —
the exact cluster submission path (north_rule: "run via spark-submit
--py-files on multi-executor clusters").

The test builds dist zip → gen-corpus → crawl, all through
`spark-submit --py-files <zip> scripts/submit_crawl.py`, from a cwd
outside the repo and with PYTHONPATH scrubbed, then checks the per-round
JSON metrics and that the committed frontier contains completed rows.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


def _run_submit(zip_path: str, args: list[str], cwd: str) -> subprocess.CompletedProcess:
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    return subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[8]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zip_path,
            os.path.join(REPO, "scripts", "submit_crawl.py"),
            *args,
        ],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_crawl(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from package_pyfiles import build

    zip_path = build(str(tmp_path / "xcs.zip"))
    corpus = str(tmp_path / "corpus")
    wh = str(tmp_path / "wh")

    r = _run_submit(
        zip_path,
        ["gen-corpus", "--out", corpus, "--pages", "300", "--seeds", "60", "--hosts", "6"],
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]

    r = _run_submit(
        zip_path,
        [
            "crawl",
            "--pages", f"{corpus}/pages.parquet",
            "--seeds", f"{corpus}/seeds.parquet",
            "--robots", f"{corpus}/robots.parquet",
            "--warehouse", wh,
            "--rounds", "3",
            "--global-budget", "40",
        ],
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rounds = [json.loads(l) for l in r.stdout.splitlines() if l.startswith("{")]
    assert rounds, r.stdout[-2000:]
    assert all("round" in m and "selected" in m for m in rounds)
    assert sum(m.get("completed", 0) for m in rounds) > 0

    # the committed warehouse is readable back through the library
    sys.path.insert(0, REPO)
    from xtracted_crawlers_spark.catalog import ParquetSnapshotCatalog
    from xtracted_crawlers_spark.crawl import load_frontier
    from xtracted_crawlers_spark.session import get_spark

    spark = get_spark("submit-check", master="local[4]", shuffle_partitions=4)
    fr = load_frontier(spark, ParquetSnapshotCatalog(wh))
    assert fr.filter(fr.status == "complete").count() == sum(
        m.get("completed", 0) for m in rounds
    )
