"""Redirect-chain resolution (operators/redirects.py): hand-built
topologies covering every status, plus the alias map the seen-set
consumes. Reference behavior note: the reference's browser follows
redirects inside page.goto (amazon_async_product.py fetch path); batch
resolution must reproduce chain-following with a hop cap."""

from pyspark.sql import functions as F

from xtracted_crawlers_spark.operators import redirects


def _resolve(spark, urls, edges, max_hops=8):
    u = spark.createDataFrame([(x,) for x in urls], "url string")
    e = spark.createDataFrame(edges, "src string, dst string")
    got = redirects.resolve_redirects(u, e, max_hops=max_hops).collect()
    return {r.url: (r.final_url, r.n_hops, r.status) for r in got}


def test_statuses_and_hop_counts(spark):
    edges = [
        ("a", "b"), ("b", "c"),          # chain a->b->c (c terminal)
        ("p", "q"), ("q", "p"),          # 2-cycle
        ("s", "s"),                      # self-loop
        ("l1", "l2"), ("l2", "l3"), ("l3", "l4"), ("l4", "l5"),  # long
    ]
    got = _resolve(spark, ["a", "b", "c", "p", "s", "l1", "x"], edges, max_hops=3)
    assert got["a"] == ("c", 2, "ok")
    assert got["b"] == ("c", 1, "ok")
    assert got["c"] == ("c", 0, "ok")          # no out-edge: 0 hops
    assert got["x"] == ("x", 0, "ok")          # never redirected
    assert got["p"] == ("q", 1, "loop")        # final = last before re-entry
    assert got["s"] == ("s", 0, "loop")        # self-loop detected at hop 0
    assert got["l1"] == ("l4", 3, "too_many")  # cap hit while still redirecting


def test_exactly_max_hops_is_ok_not_too_many(spark):
    """A chain of exactly max_hops follows terminates 'ok' — too_many
    requires an UNFOLLOWED edge past the cap."""
    edges = [("a", "b"), ("b", "c"), ("c", "d")]
    got = _resolve(spark, ["a"], edges, max_hops=3)
    assert got["a"] == ("d", 3, "ok")
    got = _resolve(spark, ["a"], edges, max_hops=2)
    assert got["a"] == ("c", 2, "too_many")


def test_every_input_url_appears_exactly_once(spark):
    edges = [("a", "b"), ("p", "q"), ("q", "p")]
    urls = ["a", "b", "p", "q", "z"]
    u = spark.createDataFrame([(x,) for x in urls], "url string")
    e = spark.createDataFrame(edges, "src string, dst string")
    out = redirects.resolve_redirects(u, e, max_hops=4)
    assert sorted(r.url for r in out.collect()) == sorted(urls)


def test_canonical_alias_map(spark):
    edges = [("a", "b"), ("b", "c"), ("p", "q"), ("q", "p")]
    u = spark.createDataFrame([(x,) for x in ["a", "b", "c", "p"]], "url string")
    e = spark.createDataFrame(edges, "src string, dst string")
    res = redirects.resolve_redirects(u, e, max_hops=4)
    m = {r.url: r.canonical_url for r in redirects.canonical_alias_map(res).collect()}
    # terminated chains collapse to the final URL; cycles stay themselves
    assert m == {"a": "c", "b": "c", "c": "c", "p": "p"}


def test_no_python_on_the_hot_path(spark):
    from xtracted_crawlers_spark.plans import audit

    u = spark.createDataFrame([("a",)], "url string")
    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    df = redirects.resolve_redirects(u, e, max_hops=4)
    assert audit.python_eval_nodes(df) == []
