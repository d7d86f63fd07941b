"""Structured Streaming surface: continuous seed ingestion + micro-batch
crawl rounds (the always-on deployment mode of the round loop)."""

from .rounds import stream_seed_ingest  # noqa: F401
