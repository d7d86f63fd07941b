"""Co-citation / bibliographic coupling and the Heaps vocabulary curve
vs brute-force pure-Python twins."""

from __future__ import annotations

import itertools
import math
import re
from collections import Counter, defaultdict

import pytest

from xtracted_crawlers_spark.operators import cocitation as cc
from xtracted_crawlers_spark.operators import corpusstats


def _py_cocitation(edges, max_degree, min_common):
    out = defaultdict(set)
    for s, d in set(edges):
        out[s].add(d)
    pairs = Counter()
    for s, ds in out.items():
        if len(ds) > max_degree:
            continue
        for a, b in itertools.combinations(sorted(ds), 2):
            pairs[(a, b)] += 1
    return {p: n for p, n in pairs.items() if n >= min_common}


EDGES = [
    # s1..s4 all cite (x, y); s3/s4 also cite z; s5 is a hub.
    ("s1", "x"), ("s1", "y"),
    ("s2", "x"), ("s2", "y"),
    ("s3", "x"), ("s3", "y"), ("s3", "z"),
    ("s4", "y"), ("s4", "z"),
    ("s5", "x"), ("s5", "y"), ("s5", "z"), ("s5", "w"), ("s5", "v"),
    ("s1", "x"),  # duplicate edge must not double-count
]


def test_cocitation_matches_bruteforce(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {(r.a, r.b): r.n_common for r in cc.cocitation(df, max_degree=4, min_common=2).collect()}
    want = _py_cocitation(EDGES, max_degree=4, min_common=2)
    assert got == want
    assert got[("x", "y")] == 3  # s1, s2, s3 (s5 capped out, dup ignored)
    assert ("v", "w") not in got  # only the capped hub cites both


def test_cocitation_degree_cap_drops_hub(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    uncapped = {(r.a, r.b): r.n_common for r in cc.cocitation(df, max_degree=100, min_common=1).collect()}
    assert uncapped[("x", "y")] == 4  # hub back in
    assert uncapped[("v", "w")] == 1


def test_bibliographic_coupling_is_transpose(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {(r.a, r.b): r.n_common for r in cc.bibliographic_coupling(df, max_degree=4, min_common=1).collect()}
    want = _py_cocitation([(d, s) for s, d in EDGES], max_degree=4, min_common=1)
    assert got == want
    # y's in-degree is 5 (s1..s5) so y is capped out; x's is 4 (dup edge
    # collapsed) so s1/s2 still couple through x alone.
    assert got[("s1", "s2")] == 1
    assert got[("s3", "s4")] == 1  # shared z survives the cap


def _py_heaps(texts_by_id, n_buckets):
    max_id = max(texts_by_id)
    rows = []
    for k in range(1, n_buckets + 1):
        cutoff = (k * max_id) // n_buckets
        docs = {i: t for i, t in texts_by_id.items() if i <= cutoff}
        toks = [w for t in docs.values() for w in re.findall(r"[a-z0-9]+", t.lower())]
        rows.append((k, cutoff, len(docs), len(toks), len(set(toks))))
    return rows


@pytest.mark.parametrize("n_buckets", [4, 10])
def test_heaps_curve_matches_bruteforce(spark, n_buckets):
    texts = {
        i: " ".join(f"w{(i * j) % 37}" for j in range(1, 8)) + " common the a"
        for i in range(0, 53)
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = [
        (r.bucket, r.cutoff_id, r.n_docs, r.n_tokens, r.vocab)
        for r in corpusstats.heaps_curve(df, n_buckets=n_buckets).orderBy("bucket").collect()
    ]
    assert got == _py_heaps(texts, n_buckets)


def test_heaps_curve_monotone_and_total(spark):
    texts = {i: f"alpha beta doc{i}" for i in range(1, 31)}
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    rows = corpusstats.heaps_curve(df, n_buckets=5).orderBy("bucket").collect()
    assert [r.bucket for r in rows] == [1, 2, 3, 4, 5]
    for a, b in zip(rows, rows[1:]):
        assert b.n_docs >= a.n_docs and b.n_tokens >= a.n_tokens and b.vocab >= a.vocab
    last = rows[-1]
    assert last.n_docs == 30 and last.n_tokens == 90 and last.vocab == 32
    # sublinear vocabulary growth on this corpus (Heaps bend is visible)
    assert rows[-1].vocab / rows[0].vocab < rows[-1].n_tokens / rows[0].n_tokens


def test_heaps_curve_doc_id_zero_lands_in_first_bucket(spark):
    df = spark.createDataFrame([(0, "zero words"), (10, "ten words")], "doc_id long, text string")
    rows = {r.bucket: r for r in corpusstats.heaps_curve(df, n_buckets=2).collect()}
    assert rows[1].n_docs == 1 and rows[1].vocab == 2
    assert rows[2].n_docs == 2 and rows[2].vocab == 3  # "words" shared


def _py_template(url):
    m = re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", url)
    t = m.group(1) if m else url
    t = re.sub(r"[0-9a-fA-F]{8,}", "{h}", t)
    return re.sub(r"[0-9]+", "{n}", t)


def test_url_template_counts_match_bruteforce(spark):
    from urllib.parse import urlsplit

    from xtracted_crawlers_spark.operators import urltemplates

    urls = (
        [f"https://a.test/product/{i}/view" for i in range(20)]
        + [f"https://a.test/item/deadbeef{i:04d}?session=cafe1234beef" for i in range(5)]
        + ["https://a.test/item/deadbeef0001?session=cafe1234beef"]  # dup URL
        + [f"https://b.test/cal/2024/{m:02d}/{d:02d}" for m in (1, 2) for d in (1, 2, 3)]
        + ["https://b.test/"]
        + ["not-a-url/123"]  # no host -> dropped
    )
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        (r.host, r.template): (r.n_urls, r.n_distinct)
        for r in urltemplates.template_counts(df).collect()
    }
    from collections import defaultdict

    rows = defaultdict(lambda: [0, set()])
    for u in urls:
        host = urlsplit(u).netloc.lower() if "://" in u else ""
        if not host:
            continue
        k = (host, _py_template(u))
        rows[k][0] += 1
        rows[k][1].add(u)
    want = {k: (n, len(d)) for k, (n, d) in rows.items()}
    assert got == want
    assert got[("a.test", "/product/{n}/view")] == (20, 20)
    # hex collapsed BEFORE digits: session ids become {h}, not {n}x{n}
    assert got[("a.test", "/item/{h}?session={h}")] == (6, 5)
    assert got[("b.test", "/cal/{n}/{n}/{n}")] == (6, 6)
    assert got[("b.test", "/")] == (1, 1)
    assert not any(h == "" for h, _ in got)


def test_corpus_report_composition(spark):
    from collections import Counter

    texts = [(i, "new york city data " + ("boilerplate footer text all rights reserved " if i % 2 else "") + f"unique{i} content body") for i in range(1, 41)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    rep = corpusstats.corpus_report(df, n_buckets=4, top_collocations=5)
    toks = [w for _, t in texts for w in re.findall(r"[a-z0-9]+", t.lower())]
    assert rep["docs"] == 40
    assert rep["tokens"] == len(toks)
    assert rep["vocab"] == len(set(toks))
    assert len(rep["heaps"]) == 4 and rep["heaps"][-1]["n_docs"] == 40
    assert len(rep["collocations"]) <= 5
    assert {"w1", "w2", "n_pair", "lift"} <= set(rep["collocations"][0])
    # the repeated boilerplate run (>= w+k-1 tokens, 20 docs) must show
    # up as heavily shared winnowing fingerprints
    assert rep["winnow"]["max_share"] == 20
    assert rep["winnow"]["shared_by_2plus_docs"] >= 1
    assert rep["winnow"]["fingerprints"] > 0


def test_heaps_single_doc_id_zero(spark):
    """max(doc_id) == 0 must not divide by zero (ANSI mode aborts);
    the lone doc lands in bucket 1 and every cumulative bucket."""
    df = spark.createDataFrame([(0, "only document words")], "doc_id long, text string")
    rows = corpusstats.heaps_curve(df, n_buckets=3).orderBy("bucket").collect()
    assert [(r.bucket, r.cutoff_id, r.n_docs, r.n_tokens, r.vocab) for r in rows] == [
        (1, 0, 1, 3, 3), (2, 0, 1, 3, 3), (3, 0, 1, 3, 3),
    ]


def test_corpus_report_top_collocations_not_capped_at_100(spark):
    """top_collocations > 100 must not be silently truncated by the
    inner query's default top_k."""
    texts = [(i, " ".join(f"w{j} w{j}" for j in range(60))) for i in range(1, 11)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    rep = corpusstats.corpus_report(df, n_buckets=2, top_collocations=110)
    assert len(rep["collocations"]) > 100


def test_cocitation_materializes_selfjoin_input_once(spark):
    """r6: the capped edge set feeds both aliased sides of the pair
    self-join; aliased projections defeat exchange reuse, so it must be
    materialized (localCheckpoint -> ExistingRDD scan) or the caller's
    edge pipeline runs once per side (measured 3x at sf0.1)."""
    df = spark.createDataFrame(EDGES, "src string, dst string")
    out = cc.cocitation(df, max_degree=4, min_common=1)
    pp = out._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in pp, pp
