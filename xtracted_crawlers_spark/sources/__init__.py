"""Table sources/sinks: schema-enforced readers for the pages corpus and
crawl-state tables, parquet now, Iceberg-ready (same call sites)."""

from .pages import read_pages, PAGES_TABLE_SCHEMA  # noqa: F401
from .warc import read_warc, warc_sink, write_warc_file, parse_warc_stream  # noqa: F401
