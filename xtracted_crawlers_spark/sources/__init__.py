"""Table sources/sinks: schema-enforced readers for the pages corpus and
crawl-state tables, parquet now, Iceberg-ready (same call sites)."""

from .pages import read_pages, PAGES_TABLE_SCHEMA  # noqa: F401
from .warc import (  # noqa: F401
    parse_warc_stream,
    parse_wet_stream,
    read_warc,
    read_wet,
    warc_sink,
    wet_sink,
    write_warc_file,
)
