"""Synthetic corpus invariants: determinism and the byte-identical-text
contract (pages.text == extract_text(pages.html) for every row)."""

import pytest

from xtracted_crawlers_spark import extract, fixtures


def test_render_page_deterministic():
    a = fixtures.render_page(7, 10, 2.0, 42)
    b = fixtures.render_page(7, 10, 2.0, 42)
    assert a == b
    c = fixtures.render_page(7, 10, 2.0, 43)
    assert a != c


def test_text_invariant_pure():
    """The golden text column equals what the extractor produces — checked
    analytically (expected text composed independently of extract_text)."""
    for i in range(0, 300):
        url, html, text, lang = fixtures.render_page(i, 20, 2.0, 42)
        assert extract.extract_text(html) == text, f"page {i}"


def test_payload_semantics_on_synthetic_pages():
    saw_fail = saw_null_asin = saw_novar = saw_full = 0
    for i in range(0, 200):
        url, html, text, _ = fixtures.render_page(i, 20, 2.0, 42)
        pj, tx, er = extract.extract_one(url, html)
        if er is not None:
            assert "#averageCustomerReviews" in er
            saw_fail += 1
            continue
        import json

        p = json.loads(pj)
        assert p["url"] == url
        assert len(p["feature_bullets"]) >= 3
        if p["asin"] is None:
            saw_null_asin += 1
        if p["variants"] == {}:
            saw_novar += 1
        elif len(p["variants"]) == 5:
            saw_full += 1
            # variant URLs synthesized from the page's root
            root = url.rsplit("/dp/", 1)[0]
            for v in p["variants"]["variants"]:
                assert v["url"].startswith(root + "/dp/")
                assert v["url"].endswith("?psc=1")
    assert saw_fail and saw_null_asin and saw_novar and saw_full


def test_gen_pages_spark(spark):
    df = fixtures.gen_pages(spark, 50, n_hosts=5, partitions=4).cache()
    assert df.count() == 50
    assert df.select("url").distinct().count() == 50
    row = df.filter("page_id = 3").first()
    url, html, text, lang = fixtures.render_page(3, 5, 2.0, 42)
    assert row["url"] == url
    assert bytes(row["html"]).decode() == html
    assert row["text"] == text
    df.unpersist()


def test_gen_seeds_paths(spark):
    seeds = fixtures.gen_seeds(spark, 50, 40, n_hosts=5).collect()
    urls = [s["url"] for s in seeds]
    assert any("junk" in u for u in urls)  # routing-drop path
    assert any("?ref=dup" in u for u in urls)  # duplicate identity path
    assert len({s["seed_idx"] for s in seeds}) == 40


def test_host_skew(spark):
    df = fixtures.gen_pages(spark, 400, n_hosts=20, zipf=2.0, partitions=4)
    from pyspark.sql import functions as F
    from xtracted_crawlers_spark import urlnorm

    counts = sorted(
        r["n"]
        for r in df.select(urlnorm.host("url").alias("h")).groupBy("h").agg(F.count("*").alias("n")).collect()
    )
    assert counts[-1] > 5 * counts[0]  # hot host dominates
