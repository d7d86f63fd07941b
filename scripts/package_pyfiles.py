"""Build the spark-submit --py-files artifact: a zip of the
`xtracted_crawlers_spark` package (sources only, no caches), written to
dist/xtracted_crawlers_spark.zip by default.

This is the cluster deployment path the north_rule names: the driver
script ships this zip with `spark-submit --py-files`, Spark places it on
the driver's and every executor's sys.path, and the package imports the
same way it does from a repo checkout (tests/test_spark_submit.py runs
that end-to-end with a real spark-submit).

Usage: python3 scripts/package_pyfiles.py [out.zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "xtracted_crawlers_spark"


def build(out_path: str) -> str:
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    src_root = os.path.join(REPO, PKG)
    # ZIP_STORED + fixed timestamps: the artifact content is a pure
    # function of the sources (reproducible builds diff cleanly)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_STORED) as zf:
        for dirpath, dirnames, filenames in os.walk(src_root):
            dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                arc = os.path.relpath(full, REPO)
                info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
                info.compress_type = zipfile.ZIP_STORED
                with open(full, "rb") as f:
                    zf.writestr(info, f.read())
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", f"{PKG}.zip")
    print(build(out))
