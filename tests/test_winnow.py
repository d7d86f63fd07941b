"""Winnowing fingerprints vs a pure-Python twin + the winnowing
theorem's overlap guarantee."""

from __future__ import annotations

import hashlib
import re

from xtracted_crawlers_spark.operators import winnow


def _py_winnow(text, k, w):
    toks = re.findall(r"[a-z0-9]+", text.lower())
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hs = [hashlib.md5(g.encode()).hexdigest() for g in grams]
    mins = [min(hs[j : j + w]) for j in range(len(hs) - w + 1)]
    out, seen = [], set()
    for m in mins:
        if m not in seen:
            seen.add(m)
            out.append(m)
    return out


def test_winnow_matches_bruteforce(spark):
    texts = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "words " * 30),
        (3, "short doc"),  # < k tokens -> no fingerprints
        (4, "exactly five tokens here now"),  # == k -> 1 gram < w windows
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {}
    for r in winnow.winnow_fingerprints(df, k=5, w=4).collect():
        got.setdefault(r.doc_id, set()).add(r.fp)
    for i, t in texts:
        want = set(_py_winnow(t, 5, 4))
        assert got.get(i, set()) == want, i
    assert 3 not in got and 4 not in got


def test_winnow_theorem_shared_substring_detected(spark):
    """Any shared run of >= w+k-1 tokens yields a shared fingerprint."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 = w+k-1
    a = "unique one two three " + shared + " tail x y z"
    b = "other prefix tokens here " + shared + " different ending"
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    fps = winnow.winnow_fingerprints(df, k=5, w=4)
    common = (
        winnow.shared_fingerprints(fps).filter("n_docs >= 2").count()
    )
    assert common >= 1


def test_winnow_density(spark):
    """Selection keeps roughly 2/(w+1) of k-gram hashes on random-ish
    text (sanity bound, not exact)."""
    text = " ".join(f"tok{(i * 7919) % 1000}x{i % 13}" for i in range(400))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    n_fp = winnow.winnow_fingerprints(df, k=5, w=4).count()
    n_grams = 400 - 4
    assert n_fp < 0.5 * n_grams
    assert n_fp > 0.1 * n_grams


def test_overlap_pairs_bruteforce_and_cap(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    boiler = "all rights reserved contact us terms of service privacy policy"
    texts = [
        (1, "one two three " + shared + " x1 y1 z1 " + boiler),
        (2, "four five six " + shared + " x2 y2 z2 " + boiler),
        (3, "seven eight nine totally different content here now " + boiler),
        (4, "unrelated document with its very own words only here"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    fps = winnow.winnow_fingerprints(df, k=5, w=4)

    # brute-force twin (no cap)
    per_doc = {i: set(_py_winnow(t, 5, 4)) for i, t in texts}
    import itertools
    from collections import Counter

    want = {}
    for a, b in itertools.combinations(sorted(per_doc), 2):
        n = len(per_doc[a] & per_doc[b])
        if n >= 2:
            want[(a, b)] = n
    got = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in winnow.overlap_pairs(fps, min_shared=2, fp_cap=100).collect()
    }
    assert got == want
    assert (1, 2) in got  # the planted 10-token overlap
    # fp_cap=2 drops fingerprints shared by 3+ docs (the boilerplate),
    # so pairs that overlap ONLY through boilerplate disappear while
    # the planted 1-2 overlap (unique to that pair) survives
    capped = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in winnow.overlap_pairs(fps, min_shared=2, fp_cap=2).collect()
    }
    assert (1, 2) in capped
    assert all(a != 3 and b != 3 for a, b in capped)  # 3 only shared boilerplate


def test_overlap_pairs_singleton_prefilter(spark):
    """The r6 pre-filter drops fingerprints selected by exactly one
    document BEFORE the self-join (they can only self-match, which
    doc_a < doc_b discards). Sound for every min_shared: an
    all-singleton corpus yields no pairs, and min_shared=1 still
    reports every genuinely shared fingerprint pair."""
    texts = [
        (1, "completely distinct words aaa bbb ccc ddd eee fff ggg hhh"),
        (2, "another unique run iii jjj kkk lll mmm nnn ooo ppp qqq"),
        (3, "shared run alpha beta gamma delta epsilon zeta eta plus own tail one"),
        (4, "shared run alpha beta gamma delta epsilon zeta eta with other tail"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    fps = winnow.winnow_fingerprints(df, k=5, w=4)
    # docs 1/2: all fingerprints singleton -> no pairs at min_shared=1
    only_12 = fps.filter("doc_id <= 2")
    assert winnow.overlap_pairs(only_12, min_shared=1, fp_cap=100).count() == 0
    # docs 3/4 share an 11-token run (>= w+k-1 = 8 tokens guarantees a
    # shared fingerprint) and must still pair at min_shared=1
    got = {
        (r.doc_a, r.doc_b)
        for r in winnow.overlap_pairs(fps, min_shared=1, fp_cap=100).collect()
    }
    assert (3, 4) in got
    # docs 1 and 2 never appear: every one of their fps is a singleton
    assert not any(1 in pair or 2 in pair for pair in got)


def test_overlap_pairs_materializes_selfjoin_input_once(spark):
    """r6: both aliased sides of the pair self-join (and the skew-guard
    aggregate) must consume a MATERIALIZED (doc_id, fp) set — aliased
    projections defeat exchange reuse, so an unmaterialized input
    re-runs the winnowing kernel once per consumer. The localCheckpoint
    shows up as an ExistingRDD scan in the physical plan."""
    texts = [(i, "shared run alpha beta gamma delta epsilon zeta eta " + f"t{i}")
             for i in range(1, 5)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    out = winnow.overlap_pairs(winnow.winnow_fingerprints(df, k=5, w=4),
                               min_shared=1, fp_cap=100)
    pp = out._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in pp, pp
