"""Canonicalization semantics pinned by the reference (SURVEY.md §2 C1/B4/D1):

- url_id = ASIN (B0|BT)[A-Z0-9]{8} from the /dp/ path segment
  (tests/integration/test_crawlers_services.py:131 in the reference asserts
  url_id == 'B0931VRJT9' for .../dp/B0931VRJT9).
- query string ignored for identity, preserved in url
  (test_pg_crawl_job_syncer.py:84-89: same ASIN + '?something=different'
  is a duplicate).
- non-matching URLs route to no extractor and are dropped
  (extractor_factory.py:15-28 returns None).
- root_url = scheme://netloc for http(s), else None
  (amazon_async_product.py:21-26).
"""

from pyspark.sql import functions as F

from xtracted_crawlers_spark import urlnorm


def _one(spark, url, col):
    return spark.createDataFrame([(url,)], ["url"]).select(col.alias("v")).first()["v"]


def test_url_id_from_dp_path(spark):
    assert _one(spark, "https://www.amazon.co.uk/dp/B0931VRJT9", urlnorm.url_id("url")) == "B0931VRJT9"
    assert _one(spark, "https://www.amazon.co.uk/Apple-iPad/dp/B0DZ77X9FQ?th=1", urlnorm.url_id("url")) == "B0DZ77X9FQ"
    assert _one(spark, "https://www.amazon.com/dp/BTABCDEF12", urlnorm.url_id("url")) == "BTABCDEF12"


def test_url_id_ignores_query_and_requires_dp(spark):
    # ASIN-looking token in the query string is NOT an identity
    assert _one(spark, "https://x.com/search?asin=/dp/B0931VRJT9", urlnorm.url_id("url")) == ""
    assert _one(spark, "https://x.com/gp/product/B0931VRJT9", urlnorm.url_id("url")) == ""


def test_query_insensitive_identity(spark):
    a = _one(spark, "https://www.amazon.co.uk/dp/B0931VRJT9?x=foo&bar=y", urlnorm.url_id("url"))
    b = _one(spark, "https://www.amazon.co.uk/dp/B0931VRJT9?something=different", urlnorm.url_id("url"))
    assert a == b == "B0931VRJT9"


def test_url_type_routing(spark):
    assert _one(spark, "https://www.amazon.co.uk/dp/B0931VRJT9", urlnorm.url_type("url")) == "amazon_product"
    assert _one(spark, "https://example.com/not/a/product", urlnorm.url_type("url")) is None


def test_root_url_and_host_keep_port(spark):
    u = "http://localhost:8123/dp/B0CX9DVZDP?x=foo&bar=y"
    assert _one(spark, u, urlnorm.root_url("url")) == "http://localhost:8123"
    assert _one(spark, u, urlnorm.host("url")) == "localhost:8123"
    assert _one(spark, "ftp://files.example.com/x", urlnorm.root_url("url")) is None


def test_python_mirror_agrees_with_spark(spark):
    urls = [
        "https://www.amazon.co.uk/dp/B0931VRJT9?x=foo&bar=y",
        "http://localhost:8123/dp/B0CX9DVZDP",
        "https://example.com/no/product",
        "https://www.amazon.de/-/en/Some-Product-Name/dp/B0B1J1GG9T?th=1&psc=1",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"]).select(
        "url",
        urlnorm.url_id("url").alias("uid"),
        urlnorm.url_type("url").alias("ty"),
        urlnorm.host("url").alias("h"),
        urlnorm.root_url("url").alias("r"),
    )
    for row in df.collect():
        assert (row["uid"] or None) == urlnorm.py_url_id(row["url"])
        assert row["ty"] == urlnorm.py_url_type(row["url"])
        assert row["h"] == urlnorm.py_host(row["url"])
        assert row["r"] == urlnorm.py_root_url(row["url"])


def test_seen_key_is_stable_and_query_insensitive(spark):
    df = spark.createDataFrame(
        [
            ("u1", 1, "https://www.amazon.co.uk/dp/B0931VRJT9?x=1"),
            ("u1", 1, "https://www.amazon.co.uk/dp/B0931VRJT9?y=2"),
            ("u1", 2, "https://www.amazon.co.uk/dp/B0931VRJT9"),
        ],
        ["user_id", "job_id", "url"],
    ).select(urlnorm.seen_key("user_id", "job_id", urlnorm.url_id("url")).alias("k"))
    ks = [r["k"] for r in df.collect()]
    assert ks[0] == ks[1]  # same identity despite query
    assert ks[0] != ks[2]  # different job ⇒ different key


def test_registrable_domain_rules(spark):
    """Each eTLD+1 rule: multi-label suffix -> last 3 labels, default ->
    last 2, too-few-labels and IPv4 pass through, port stripped,
    case-normalized."""
    cases = {
        "www.shop1.example.test": "shop1.example.test",
        "a.b.shop.co.uk": "shop.co.uk",
        "shop.com.au": "shop.com.au",
        "cdn.shop.de": "shop.de",
        "cdn.shop.de:8443": "shop.de",
        "shop.de": "shop.de",
        "localhost": "localhost",
        "CO.UK": "co.uk",          # bare suffix: too few labels to split
        "10.0.0.7": "10.0.0.7",
        "WWW.Shop.Example.TEST": "shop.example.test",
    }
    from xtracted_crawlers_spark import urlnorm

    df = spark.createDataFrame([(h,) for h in cases], "host string")
    got = {
        r["host"]: r["d"]
        for r in df.select(
            "host", urlnorm.registrable_domain(F.col("host")).alias("d")
        ).collect()
    }
    for h, want in cases.items():
        assert got[h] == want, (h, got[h])
        assert urlnorm.py_registrable_domain(h) == want, h


def test_registrable_domain_engine_matches_py_twin_fuzz(spark):
    import random

    from xtracted_crawlers_spark import urlnorm

    rnd = random.Random(777)
    labels = ["www", "a", "b9", "shop", "x-y", "co", "com", "uk", "au",
              "de", "test", "example", "10", "0"]
    hosts = []
    for _ in range(300):
        n = rnd.randint(1, 5)
        h = ".".join(rnd.choice(labels) for _ in range(n))
        if rnd.random() < 0.2:
            h += f":{rnd.randint(1, 65535)}"
        hosts.append(h)
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {
        r["host"]: r["d"]
        for r in df.select(
            "host", urlnorm.registrable_domain(F.col("host")).alias("d")
        ).collect()
    }
    for h in hosts:
        assert got[h] == urlnorm.py_registrable_domain(h), h
