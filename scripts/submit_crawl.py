"""spark-submit driver script for the crawl CLI.

The cluster deployment path (north_rule: "runs via spark-submit
--py-files on multi-executor clusters"):

    python3 scripts/package_pyfiles.py dist/xtracted_crawlers_spark.zip
    spark-submit --master <cluster> \
        --py-files dist/xtracted_crawlers_spark.zip \
        scripts/submit_crawl.py crawl --pages ... --seeds ... \
        --warehouse ... --rounds 10

This file deliberately contains NO package imports at module top level:
spark-submit places the --py-files zip on sys.path before running it, so
the import inside main() resolves from the shipped zip — the repo
checkout need not exist on the cluster. All CLI subcommands
(gen-corpus / crawl / urls / jobs / history) work unchanged.
"""

from __future__ import annotations

import sys


def main() -> int:
    from xtracted_crawlers_spark.__main__ import main as cli_main

    return cli_main(sys.argv[1:])


if __name__ == "__main__":
    sys.exit(main())
