"""Deterministic bulk fuzz for the wave-2 operators (one Spark job per
case, python-twin compare over every generated row — the repo's
enumerated-grid fuzz pattern)."""

from __future__ import annotations

import hashlib
import itertools
import re
from collections import Counter, defaultdict

import pytest

from xtracted_crawlers_spark.operators import cocitation as cc
from xtracted_crawlers_spark.operators import corpusstats, urltemplates, winnow


def _rnd(seed):
    x = seed
    while True:
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        yield x


def test_url_template_grid(spark):
    schemes = ["https", "http", "ftp"]
    hosts = ["a.test", "Sho99.Example.TEST", "x-y.z.co", "127.0.0.1:8080"]
    paths = [
        "", "/", "/plain", "/a/1/b/22/c/333", "/DEADBEEFcafe42", "/deadbeef",
        "/id/0123456789abcdef", "/q?x=1&y=deadbeefdead&z=", "/%7Euser/2024",
        "/a;b,c/77?s=ABCDEF12", "/#frag9", "/0000000/1", "/hex7f/ff00ff00",
    ]
    urls = [f"{s}://{h}{p}" for s, h, p in itertools.product(schemes, hosts, paths)]
    urls += ["no-scheme/123", "mailto:x@y.test", ""]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    from pyspark.sql import functions as F

    got = {
        r.url: r.t
        for r in df.select("url", urltemplates.url_template(F.col("url")).alias("t")).collect()
    }

    def py_template(u):
        m = re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", u)
        t = m.group(1) if m else u
        t = re.sub(r"[0-9a-fA-F]{8,}", "{h}", t)
        return re.sub(r"[0-9]+", "{n}", t)

    for u in urls:
        assert got[u] == py_template(u), u


@pytest.mark.parametrize("n_buckets", [3, 7, 10])
def test_heaps_irregular_ids(spark, n_buckets):
    g = _rnd(99)
    ids = sorted({next(g) % 10_000 for _ in range(120)})
    texts = {i: " ".join(f"w{(i * j) % 101}" for j in range(1, 1 + (i % 9) + 1)) for i in ids}
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = [
        (r.bucket, r.cutoff_id, r.n_docs, r.n_tokens, r.vocab)
        for r in corpusstats.heaps_curve(df, n_buckets=n_buckets).orderBy("bucket").collect()
    ]
    max_id = max(ids)
    want = []
    for k in range(1, n_buckets + 1):
        cutoff = (k * max_id) // n_buckets
        docs = [i for i in ids if i <= cutoff]
        toks = [w for i in docs for w in re.findall(r"[a-z0-9]+", texts[i].lower())]
        want.append((k, cutoff, len(docs), len(toks), len(set(toks))))
    assert got == want


@pytest.mark.parametrize("k,w", [(3, 2), (5, 4), (4, 7)])
def test_winnow_random_corpus(spark, k, w):
    g = _rnd(7)
    texts = [
        (i, " ".join(f"t{next(g) % 40}" for _ in range(next(g) % 60)))
        for i in range(40)
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = defaultdict(set)
    for r in winnow.winnow_fingerprints(df, k=k, w=w).collect():
        got[r.doc_id].add(r.fp)
    for i, t in texts:
        toks = re.findall(r"[a-z0-9]+", t.lower())
        grams = [" ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)]
        hs = [hashlib.md5(x.encode()).hexdigest() for x in grams]
        want = {min(hs[j : j + w]) for j in range(len(hs) - w + 1)}
        assert got.get(i, set()) == want, (i, k, w)


@pytest.mark.parametrize("cap,minc", [(3, 1), (10, 2)])
def test_cocitation_random_graph(spark, cap, minc):
    g = _rnd(5)
    edges = [(f"s{next(g) % 40}", f"d{next(g) % 25}") for _ in range(400)]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        (r.a, r.b): r.n_common
        for r in cc.cocitation(df, max_degree=cap, min_common=minc).collect()
    }
    out = defaultdict(set)
    for s, d in set(edges):
        out[s].add(d)
    pairs = Counter()
    for s, ds in out.items():
        if len(ds) > cap:
            continue
        for a, b in itertools.combinations(sorted(ds), 2):
            pairs[(a, b)] += 1
    want = {p: n for p, n in pairs.items() if n >= minc}
    assert got == want
    # transpose consistency: coupling(edges) == cocitation(swapped)
    got_t = {
        (r.a, r.b): r.n_common
        for r in cc.bibliographic_coupling(df, max_degree=cap, min_common=minc).collect()
    }
    want_t = {
        (r.a, r.b): r.n_common
        for r in cc.cocitation(
            spark.createDataFrame([(d, s) for s, d in edges], "src string, dst string"),
            max_degree=cap,
            min_common=minc,
        ).collect()
    }
    assert got_t == want_t
