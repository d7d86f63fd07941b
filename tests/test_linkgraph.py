"""Link-graph operators: extraction regex, host graph, degrees, PageRank
(vs a pure-Python reference implementation)."""

from pyspark.sql import functions as F

from xtracted_crawlers_spark.operators import linkgraph


def test_extract_links_string_and_binary(spark):
    html = (
        '<html><body><a href="https://a.test/x">x</a>'
        '<a href="https://b.test/y?q=1">y</a>'
        '<a href="#frag">skip</a>'
        "<a href='https://single.test/nope'>unmatched quote style</a>"
        '<img src="https://c.test/img"><a href="https://a.test/z">z</a></body></html>'
    )
    pages_s = spark.createDataFrame([("https://src.test/p", html)], "url string, html string")
    got = sorted(r["dst"] for r in linkgraph.extract_links(pages_s).collect())
    assert got == ["https://a.test/x", "https://a.test/z", "https://b.test/y?q=1"]
    pages_b = spark.createDataFrame(
        [("https://src.test/p", html.encode())], "url string, html binary"
    )
    got_b = sorted(r["dst"] for r in linkgraph.extract_links(pages_b).collect())
    assert got_b == got


def test_host_graph_and_degrees(spark):
    links = spark.createDataFrame(
        [
            ("https://a.test/1", "https://b.test/x"),
            ("https://a.test/2", "https://b.test/y"),
            ("https://a.test/3", "https://a.test/self"),
            ("https://b.test/1", "https://c.test/z"),
            ("https://a.test/4", "not a url"),
        ],
        "src string, dst string",
    )
    edges = linkgraph.host_edges(links)
    w = {(r["src_host"], r["dst_host"]): r["weight"] for r in edges.collect()}
    assert w == {("a.test", "b.test"): 2, ("a.test", "a.test"): 1, ("b.test", "c.test"): 1}
    deg = {r["host"]: r for r in linkgraph.host_degrees(edges).collect()}
    assert deg["a.test"]["out_degree"] == 2 and deg["a.test"]["in_degree"] == 1
    assert deg["b.test"]["in_degree"] == 1 and deg["b.test"]["out_degree"] == 1
    assert deg["c.test"]["out_degree"] == 0 and deg["c.test"]["in_weight"] == 1
    assert deg["a.test"]["out_weight"] == 3  # 2 + self-loop


def _pagerank_py(edges, d=0.85, iters=10):
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    n = len(nodes)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        contrib = {v: 0.0 for v in nodes}
        for s, t in edges:
            contrib[t] += rank[s] / out[s]
        rank = {v: (1 - d) / n + d * contrib[v] for v in nodes}
    return rank


def test_pagerank_matches_reference_impl(spark):
    edges_py = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"), ("b", "d"),
    ]
    edges = spark.createDataFrame(edges_py, "src_host string, dst_host string")
    got = {r["node"]: r["rank"] for r in linkgraph.pagerank(edges, iters=12).collect()}
    want = _pagerank_py(edges_py, iters=12)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])
    # c has the most in-links -> highest rank
    assert max(got, key=got.get) == "c"


def test_pagerank_plan_bounded_by_checkpoint(spark):
    """localCheckpoint must keep the iterative plan from growing without
    bound — the 20-iteration plan must not embed 20 joins."""
    edges = spark.createDataFrame(
        [(f"h{i}", f"h{(i*7+1) % 20}") for i in range(40)],
        "src_host string, dst_host string",
    )
    ranks = linkgraph.pagerank(edges, iters=20, checkpoint_every=4)
    plan = ranks._jdf.queryExecution().executedPlan().toString()
    # after the final checkpoint at iter 20 the residual plan holds at
    # most checkpoint_every iterations' joins
    assert plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin") <= 16, plan[:2000]
    total = sum(r["rank"] for r in ranks.collect())
    assert 0.5 < total <= 1.0 + 1e-6  # mass bounded (dangling leak allowed)
