"""Frontier ingest (dedup, seq, routing) + politeness scheduler semantics."""

import pytest
from pyspark.sql import functions as F

from xtracted_crawlers_spark import frontier as FR
from xtracted_crawlers_spark import scheduler, seen

U1 = "00000000-0000-0000-0000-000000000001"
U2 = "00000000-0000-0000-0000-000000000002"


def _seeds(spark, rows):
    return spark.createDataFrame(rows, "user_id string, job_id long, seed_idx int, url string")


def test_ingest_dedup_and_seq(spark):
    rows = [
        (U1, 100, 0, "https://a.test/dp/B000000001"),
        (U1, 100, 1, "https://a.test/dp/B000000002?x=1"),
        (U1, 100, 2, "https://a.test/dp/B000000001?dup=yes"),  # dup identity
        (U1, 100, 3, "https://a.test/search?q=junk"),  # unroutable
        (U1, 101, 0, "https://a.test/dp/B000000001"),  # same asin, other job: kept
        (U2, 100, 0, "https://b.test/dp/B000000009"),
    ]
    out = FR.ingest_seeds(_seeds(spark, rows)).orderBy("user_id", "job_urls_seq").collect()
    assert len(out) == 4
    u1 = [r for r in out if r["user_id"] == U1]
    assert [(r["job_id"], r["url_id"], r["job_urls_seq"]) for r in u1] == [
        (100, "B000000001", 1),
        (100, "B000000002", 2),
        (101, "B000000001", 3),
    ]
    # dup kept the FIRST url (seed_idx 0, no query)
    assert u1[0]["url"] == "https://a.test/dp/B000000001"
    u2 = [r for r in out if r["user_id"] == U2]
    assert u2[0]["job_urls_seq"] == 1  # per-user sequence
    assert all(r["status"] == "pending" and r["retries"] == 0 for r in out)


def test_ingest_against_existing_frontier(spark):
    first = FR.ingest_seeds(_seeds(spark, [(U1, 100, 0, "https://a.test/dp/B000000001")]))
    second = FR.ingest_seeds(
        _seeds(
            spark,
            [
                (U1, 100, 0, "https://a.test/dp/B000000001?again=1"),  # already seen
                (U1, 100, 1, "https://a.test/dp/B000000003"),
            ],
        ),
        frontier=first,
    ).collect()
    assert len(second) == 1
    assert second[0]["url_id"] == "B000000003"
    assert second[0]["job_urls_seq"] == 2  # offset carried from existing frontier


def test_reset_job(spark):
    fr = FR.ingest_seeds(
        _seeds(
            spark,
            [(U1, 100, 0, "https://a.test/dp/B000000001"), (U2, 100, 0, "https://a.test/dp/B000000002")],
        )
    )
    done = (
        fr.withColumn("status", F.lit("complete"))
        .withColumn("retries", F.lit(2))
        .withColumn("errors", F.array(F.lit("Boom('old failure')")))
    )
    reset = FR.reset_job(done, U1, 100)
    rows = {r["user_id"]: r for r in reset.collect()}
    assert rows[U1]["status"] == "pending" and rows[U1]["retries"] == 0
    assert rows[U2]["status"] == "complete" and rows[U2]["retries"] == 2
    # seq survives reset (reference reset doesn't touch job_urls_seq)
    assert rows[U1]["job_urls_seq"] == 1
    # errors survive reset: the reference's run_job reset updates only
    # data/created_at/retries/status (pg_crawl_job_worker.py:98)
    assert rows[U1]["errors"] == ["Boom('old failure')"]


def test_selectable_filter(spark):
    fr = FR.ingest_seeds(_seeds(spark, [(U1, 100, i, f"https://a.test/dp/B00000000{i}") for i in range(4)]))
    fr = (
        fr.withColumn("status", F.when(F.col("url_id") == "B000000000", "complete").otherwise(F.col("status")))
        .withColumn("retries", F.when(F.col("url_id") == "B000000001", 3).otherwise(F.col("retries")))
        .withColumn("status", F.when(F.col("url_id") == "B000000002", "running").otherwise(F.col("status")))
    )
    got = {r["url_id"] for r in FR.selectable(fr).collect()}
    assert got == {"B000000002", "B000000003"}  # running-retry + pending


def test_robots_parse():
    dis, allow, delay = scheduler.parse_robots(
        "User-agent: googlebot\nDisallow: /private\n\n"
        "User-agent: *\nDisallow: /gp/\nDisallow: /search\nAllow: /gp/public/\n"
        "Crawl-delay: 2\n# comment\nDisallow:\nAllow:\n"
    )
    assert dis == ["/gp/", "/search"]
    assert allow == ["/gp/public/"]
    assert delay == 2.0
    assert scheduler.parse_robots("") == ([], [], None)


# (pattern, path, should_match) — the RFC 9309 / Google robots-spec
# wildcard examples: '*' any run, trailing '$' end anchor, else literal.
_WILDCARD_CASES = [
    ("/fish", "/fish", True),
    ("/fish", "/fishheads/yummy.html", True),
    ("/fish", "/Fish.asp", False),
    ("/fish", "/catfish", False),
    ("/fish*", "/fish.html?id=anything", True),
    ("/fish*", "/desert/fish", False),
    ("/fish/", "/fish/", True),
    ("/fish/", "/fish", False),
    ("/fish/", "/fish/salmon.htm", True),
    ("/*.php", "/index.php", True),
    ("/*.php", "/folder/any.php.file.html", True),
    ("/*.php", "/", False),
    ("/*.php", "/windows.PHP", False),
    ("/*.php$", "/filename.php", True),
    ("/*.php$", "/filename.php?parameters", False),
    ("/*.php$", "/filename.php5", False),
    ("/fish*.php", "/fish.php", True),
    ("/fish*.php", "/fishheads/catfish.php?parameters", True),
    ("/fish*.php", "/Fish.PHP", False),
    ("/a$", "/a", True),
    ("/a$", "/ab", False),
    ("/p+q(1)", "/p+q(1)x", True),  # regex specials stay literal
    ("/p+q(1)", "/ppq1x", False),
]


def test_robots_pattern_regex_spec_cases():
    import re

    for pat, path, want in _WILDCARD_CASES:
        got = re.search(scheduler.robots_pattern_regex(pat), path) is not None
        assert got is want, (pat, path, want)


def test_robots_gate_wildcards_engine_matches_python(spark):
    """The gate's JVM \\Q..\\E translation ≡ robots_pattern_regex over
    the spec cases AND a seeded fuzz grid of wildcard patterns × paths
    (incl. regex metacharacters and the $ mid-pattern literal case)."""
    import random
    import re

    rnd = random.Random(909)
    # paths must be URI-legal (parse_url rejects raw \ { } | etc.);
    # patterns are free-form and may carry any regex metacharacter
    path_chars = "ab.$+()!',;=:@-_~/E"
    pat_chars = "ab.$*+?()[]{}|\\/E"
    fuzz_paths = [
        "/" + "".join(rnd.choice(path_chars) for _ in range(rnd.randint(0, 12)))
        for _ in range(40)
    ]
    fuzz_pats = [
        "/" + "".join(rnd.choice(pat_chars) for _ in range(rnd.randint(1, 8)))
        for _ in range(25)
    ]
    cases = [(p, pth) for p, pth, _ in _WILDCARD_CASES] + [
        (p, pth) for p in fuzz_pats for pth in fuzz_paths
    ]
    rows = [
        (f"case{i}.test", f"https://case{i}.test{path}", [pat])
        for i, (pat, path) in enumerate(cases)
    ]
    sel = spark.createDataFrame(rows, "host string, url string, disallow array<string>")
    rules = sel.select("host", "disallow").withColumn(
        "allow", F.array().cast("array<string>")
    )
    kept = {
        r["host"]
        for r in scheduler.apply_robots_gate(sel.drop("disallow"), rules).collect()
    }
    for i, (pat, path) in enumerate(cases):
        blocked = re.search(scheduler.robots_pattern_regex(pat), path) is not None
        assert (f"case{i}.test" not in kept) is blocked, (pat, path)


def test_robots_gate_wildcard_precedence(spark):
    """Longest raw pattern (wildcards counted) wins; Allow wins ties —
    with wildcard rules on both sides."""
    sel = spark.createDataFrame(
        [
            ("w.test", "https://w.test/shop/item.php"),   # dis /*.php (6) vs alw /shop/* (7) -> allowed
            ("w.test", "https://w.test/x/item.php"),      # only dis matches -> blocked
            ("w.test", "https://w.test/shop/item.html"),  # only alw matches -> allowed
            ("t.test", "https://t.test/a/b.php"),         # tie len 6: /*.php$ vs /a/*.p* ... see rules
        ],
        "host string, url string",
    )
    rules = spark.createDataFrame(
        [
            ("w.test", ["/*.php"], ["/shop/*"]),
            ("t.test", ["/a/*.php"], ["/a/*.ph*"]),  # equal len 8: Allow wins tie
        ],
        "host string, disallow array<string>, allow array<string>",
    )
    kept = sorted(
        (r["host"], r["url"]) for r in scheduler.apply_robots_gate(sel, rules).collect()
    )
    assert kept == [
        ("t.test", "https://t.test/a/b.php"),
        ("w.test", "https://w.test/shop/item.html"),
        ("w.test", "https://w.test/shop/item.php"),
    ]


def test_robots_gate_and_budget(spark):
    fr = FR.ingest_seeds(
        _seeds(
            spark,
            [(U1, 100, i, f"https://h1.test/dp/B0000000{i:02d}") for i in range(5)]
            + [(U1, 100, 5, "https://h1.test/gp/dp/B000000099")]  # disallowed path
            + [(U1, 100, 6, "https://h2.test/dp/B000000098")],
        )
    )
    robots = spark.createDataFrame(
        [("h1.test", "User-agent: *\nDisallow: /gp/\nCrawl-delay: 10", None, None)],
        "host string, robots_txt string, crawl_delay_s double, max_tokens int",
    )
    rules = scheduler.robots_rules(robots)
    sel = scheduler.select_round(FR.selectable(fr), rules, round_seconds=30.0).collect()
    # h1 budget = floor(30/10)=3, /gp/ row excluded, h2 unlimited
    h1 = sorted(r["job_urls_seq"] for r in sel if r["host"] == "h1.test")
    assert h1 == [1, 2, 3]  # FIFO by seq
    assert {r["url_id"] for r in sel if r["host"] == "h2.test"} == {"B000000098"}
    assert all(r["url_id"] != "B000000099" for r in sel)


def test_global_budget_cut(spark):
    fr = FR.ingest_seeds(
        _seeds(spark, [(U1, 100, i, f"https://h{i%3}.test/dp/B0000000{i:02d}") for i in range(9)])
    )
    sel = scheduler.select_round(FR.selectable(fr), None, global_budget=4).collect()
    assert sorted(r["job_urls_seq"] for r in sel) == [1, 2, 3, 4]


def test_bloom_no_false_negatives_and_authority(spark):
    fr = FR.ingest_seeds(
        _seeds(spark, [(U1, 100, i, f"https://h.test/dp/B0{i:08d}") for i in range(200)])
    )
    keys = fr.select("user_id", "job_id", "url_id")
    bloom = seen.build_bloom(keys, n_buckets=8, expected_per_bucket=64).cache()
    assert bloom.count() <= 8
    # candidates: 100 seen + 150 new
    cands = _seeds(
        spark,
        [(U1, 100, i, f"https://h.test/dp/B0{i:08d}?q=1") for i in range(100)]
        + [(U1, 100, 1000 + i, f"https://h.test/dp/B0{9000+i:08d}") for i in range(150)],
    )
    cands = FR.canonicalize_candidates(cands)
    flagged = seen.bloom_maybe_seen(cands, bloom, n_buckets=8)
    seen_flags = {r["url_id"]: r["maybe_seen"] for r in flagged.collect()}
    # zero false negatives: every truly-seen key must flag maybe_seen
    for i in range(100):
        assert seen_flags[f"B0{i:08d}"] is True
    # end-to-end dedup equals plain anti-join (bloom is only a pruner)
    with_bloom = {
        r["url_id"] for r in seen.dedup_new_urls(cands, keys, bloom, n_buckets=8).collect()
    }
    without = {r["url_id"] for r in seen.dedup_new_urls(cands, keys, None).collect()}
    assert with_bloom == without == {f"B0{9000+i:08d}" for i in range(150)}
    bloom.unpersist()


def test_bloom_merge(spark):
    fr1 = FR.ingest_seeds(_seeds(spark, [(U1, 100, i, f"https://h.test/dp/B0{i:08d}") for i in range(50)]))
    bloom = seen.build_bloom(fr1.select("user_id", "job_id", "url_id"), n_buckets=4)
    new = FR.ingest_seeds(_seeds(spark, [(U1, 100, i, f"https://h.test/dp/B0{500+i:08d}") for i in range(50)]))
    merged = seen.merge_bloom(bloom, new.select("user_id", "job_id", "url_id"), n_buckets=4)
    flagged = seen.bloom_maybe_seen(new.select("user_id", "job_id", "url_id", "url"), merged, n_buckets=4)
    assert all(r["maybe_seen"] for r in flagged.collect())  # no false negatives post-merge


def test_effective_config_clamps_to_finite_robots_budget(spark):
    """round-3 advice: the literal max_host_budget must never under-cut a
    FINITE robots-derived budget; unbounded hosts keep the literal cap."""
    from xtracted_crawlers_spark.crawl import CrawlConfig, effective_config

    robots = spark.createDataFrame(
        [
            ("fast.test", "User-agent: *\nCrawl-delay: 0.01", None, None),  # 6000/round
            ("open.test", "User-agent: *\n", None, None),  # unbounded
        ],
        "host string, robots_txt string, crawl_delay_s double, max_tokens int",
    )
    rules = scheduler.robots_rules(robots)
    cfg = effective_config(CrawlConfig(round_seconds=60.0), rules)
    assert cfg.max_host_budget == 6000  # floor(60/0.01); unbounded host ignored

    slow = spark.createDataFrame(
        [("slow.test", "User-agent: *\nCrawl-delay: 10", None, None)],
        "host string, robots_txt string, crawl_delay_s double, max_tokens int",
    )
    cfg2 = effective_config(CrawlConfig(round_seconds=60.0), scheduler.robots_rules(slow))
    assert cfg2.max_host_budget == 1000  # finite budgets below the cap: unchanged

    assert effective_config(CrawlConfig(max_host_budget=None), rules).max_host_budget is None
    assert effective_config(CrawlConfig(), None).max_host_budget == 1000


def test_allow_overrides_disallow_longest_match(spark):
    """RFC 9309 precedence in the gate: the longest matching rule wins,
    Allow winning ties — engine gate and simulator agree."""
    fr = FR.ingest_seeds(
        _seeds(
            spark,
            [
                (U1, 100, 0, "https://h1.test/dp/B000000001"),  # Disallow /dp/ → blocked
                (U1, 100, 1, "https://h1.test/dp/B000GOOD01"),  # Allow /dp/B000GOOD longer → kept
                (U1, 100, 2, "https://h1.test/dp/B000GOOD02"),
                (U1, 100, 3, "https://h2.test/dp/B000000003"),  # no rules host → kept
            ],
        )
    )
    robots = spark.createDataFrame(
        [("h1.test", "User-agent: *\nDisallow: /dp/\nAllow: /dp/B000GOOD", None, None)],
        "host string, robots_txt string, crawl_delay_s double, max_tokens int",
    )
    rules = scheduler.robots_rules(robots)
    sel = {r["url_id"] for r in scheduler.select_round(FR.selectable(fr), rules).collect()}
    assert sel == {"B000GOOD01", "B000GOOD02", "B000000003"}

    # tie: Allow and Disallow same prefix length → Allow wins
    robots_tie = spark.createDataFrame(
        [("h1.test", "User-agent: *\nDisallow: /dp/\nAllow: /dp/", None, None)],
        "host string, robots_txt string, crawl_delay_s double, max_tokens int",
    )
    sel_tie = {
        r["url_id"]
        for r in scheduler.select_round(
            FR.selectable(fr), scheduler.robots_rules(robots_tie)
        ).collect()
    }
    assert sel_tie == {"B000000001", "B000GOOD01", "B000GOOD02", "B000000003"}

    # simulator mirror agrees row-for-row
    from xtracted_crawlers_spark.simulator import ReferenceSimulator

    sim = ReferenceSimulator(
        pages={},
        robots={"h1.test": "User-agent: *\nDisallow: /dp/\nAllow: /dp/B000GOOD"},
    )
    sim.submit(U1, 100, [
        "https://h1.test/dp/B000000001",
        "https://h1.test/dp/B000GOOD01",
        "https://h2.test/dp/B000000003",
    ])
    blocked = {r.url_id for r in sim.rows.values() if sim._disallowed(r)}
    assert blocked == {"B000000001"}


def test_priority_decade_buckets(spark):
    rows = [(h, s) for h, s in [("a", 1), ("b", 9), ("c", 10), ("d", 99),
                                ("e", 100), ("f", 999), ("g", 1000), ("h", 123456)]]
    df = spark.createDataFrame(rows, "host string, score long")
    got = {r["host"]: r["p"] for r in df.select(
        "host", scheduler.priority_decade("score", 4).alias("p")).collect()}
    assert got == {"a": 3, "b": 3, "c": 2, "d": 2, "e": 1, "f": 1, "g": 0, "h": 0}


def test_host_priority_reorders_global_cut(spark):
    """Authority beats FIFO across hosts: with a global budget smaller
    than the frontier, the high-score host's URLs are selected even
    though every one of its seqs is later than the low-score host's —
    and within each host, FIFO order is preserved (reference parity:
    constant priority degrades to pure FIFO)."""
    rows = (
        [(U1, 100, i, f"https://cold.test/dp/B00000000{i}") for i in range(4)]
        + [(U1, 100, 10 + i, f"https://hot.test/dp/B00000001{i}") for i in range(4)]
    )
    fr = FR.ingest_seeds(_seeds(spark, rows))
    scores = spark.createDataFrame(
        [("hot.test", 5000), ("cold.test", 3)], "host string, score long"
    )
    sel = FR.selectable(fr)
    prioritized = scheduler.with_host_priority(sel, scores, n_buckets=4)
    cut = scheduler.select_round(prioritized, rules=None, global_budget=5).collect()
    picked = [(r["host"], r["job_urls_seq"]) for r in
              sorted(cut, key=lambda r: (r["priority"], r["job_urls_seq"]))]
    # all 4 hot rows first (priority 0), then the earliest cold row
    assert [h for h, _ in picked] == ["hot.test"] * 4 + ["cold.test"]
    assert [s for h, s in picked if h == "hot.test"] == sorted(
        s for h, s in picked if h == "hot.test")
    # constant scores (same bucket) degrade to the FIFO schedule
    flat = spark.createDataFrame(
        [("hot.test", 7), ("cold.test", 7)], "host string, score long"
    )
    flat_cut = scheduler.select_round(
        scheduler.with_host_priority(sel, flat), rules=None, global_budget=5
    ).collect()
    fifo_cut = scheduler.select_round(sel, rules=None, global_budget=5).collect()
    key = lambda r: (r["user_id"], r["job_id"], r["url_id"])
    assert sorted(map(key, flat_cut)) == sorted(map(key, fifo_cut))


def test_fair_users_interleaves_and_defaults_unchanged(spark):
    """job_urls_seq is a PER-USER LIFETIME counter (frontier.assign_seq
    carries the offset across jobs), so under global FIFO a veteran
    tenant's new job (seq 5001+) starves behind any fresh tenant's
    entire queue. fair_users ranks by position in the CURRENT pending
    set instead — and with one user it is a provable no-op."""
    from xtracted_crawlers_spark import scheduler

    rows = []
    # fresh tenant: 100 pending, seq 1..100
    for i in range(100):
        rows.append((f"hA{i % 7}", "userA", 1, f"A{i:03d}", f"https://hA{i % 7}/dp/A{i:03d}", 0, i + 1))
    # veteran tenant: 10 pending, lifetime seq 5001..5010
    for i in range(10):
        rows.append((f"hB{i % 3}", "userB", 9, f"B{i:03d}", f"https://hB{i % 3}/dp/B{i:03d}", 0, 5001 + i))
    fr = spark.createDataFrame(
        rows,
        "host string, user_id string, job_id long, url_id string, "
        "url string, priority int, job_urls_seq long",
    )
    fifo = scheduler.select_round(fr, global_budget=10)
    assert {r["user_id"] for r in fifo.collect()} == {"userA"}

    fair = scheduler.select_round(fr, global_budget=10, fair_users=True)
    by_user = {r["user_id"] for r in fair.collect()}
    assert by_user == {"userA", "userB"}
    got = sorted(
        (r["user_id"], r["job_urls_seq"]) for r in fair.collect()
    )
    # round-robin: positions 1..5 of each user, regardless of lifetime seq
    assert got == [("userA", s) for s in range(1, 6)] + [
        ("userB", s) for s in range(5001, 5006)
    ]

    one_user = fr.filter(F.col("user_id") == "userA")
    a = scheduler.select_round(one_user, global_budget=10)
    b = scheduler.select_round(one_user, global_budget=10, fair_users=True)
    assert sorted(r["url_id"] for r in a.collect()) == sorted(r["url_id"] for r in b.collect())


def test_fair_users_crawl_parity_with_simulator(spark, tmp_path):
    from xtracted_crawlers_spark import fixtures
    from xtracted_crawlers_spark.catalog import ParquetSnapshotCatalog
    from xtracted_crawlers_spark.crawl import CrawlConfig, load_frontier, run_crawl
    from xtracted_crawlers_spark.simulator import ReferenceSimulator

    out = str(tmp_path / "fcorpus")
    paths = fixtures.write_corpus(spark, out, 80, 40, n_hosts=6)
    pages_df = spark.read.parquet(paths["pages"])
    seeds_df = spark.read.parquet(paths["seeds"])
    catalog = ParquetSnapshotCatalog(str(tmp_path / "wh"))
    cfg = CrawlConfig(global_budget=7, max_rounds=20, fair_users=True)
    run_crawl(spark, catalog, pages_df, seeds_df, cfg=cfg)

    pages = {
        r["url"]: bytes(r["html"]).decode()
        for r in pages_df.collect()
    }
    sim = ReferenceSimulator(pages, global_budget=7, fair_users=True)
    seeds = sorted(
        seeds_df.collect(), key=lambda r: (r["user_id"], r["job_id"], r["seed_idx"])
    )
    by_job: dict = {}
    for s in seeds:
        by_job.setdefault((s["user_id"], s["job_id"]), []).append(s["url"])
    for (u, j), urls in sorted(by_job.items()):
        sim.submit(u, j, urls)
    sim.run(max_rounds=20)

    sim_rows = {(r["user_id"], r["job_id"], r["url_id"]): r for r in sim.frontier_rows()}
    eng = {
        (r["user_id"], r["job_id"], r["url_id"]): r
        for r in load_frontier(spark, catalog).collect()
    }
    assert set(eng) == set(sim_rows)
    for k, s in sim_rows.items():
        assert eng[k]["status"] == s["status"], k
        assert eng[k]["retries"] == s["retries"], k
        assert eng[k]["payload_json"] == s["payload_json"], k


def test_robots_percent_decoding_unit(spark):
    """RFC 9309 §2.2.2: percent-encoded pattern octets decode before
    matching ('Disallow: /a%3Fb' blocks '/a?b'), path octets decode the
    same way ('/a%3Fb' in the URL also blocks), %2F stays an encoded
    slash, and %2A / %24 never become live wildcard metacharacters."""
    cases = [
        # (pattern, url, blocked?)
        ("/a%3Fb", "https://h.test/a?b", True),        # pattern decode
        ("/a%3Fb", "https://h.test/a%3Fb", True),      # both sides decode
        ("/a%20b", "https://h.test/a%20b", True),
        ("/fish%2Fchips", "https://h.test/fish%2Fchips", True),   # kept, both encoded
        ("/fish%2fchips", "https://h.test/fish%2Fchips", True),   # case-normalized
        ("/fish%2Fchips", "https://h.test/fish/chips", False),    # encoded slash != raw slash
        ("/a%2Ab", "https://h.test/aXXb", False),      # %2A is NOT a wildcard
        ("/a%2Ab", "https://h.test/a%2Ab", True),      # ... but matches a literal %2A
        ("/a%24", "https://h.test/a%24zzz", True),     # %24 is NOT an end anchor
        # RFC 9309 §2.2.3 special-characters example: %2A is the
        # prescribed way to write a literal '*', and it must match a RAW
        # '*' in the URL path (raw '*'/'$' are legal path characters)
        ("/file-with-a-%2A.html", "https://h.test/file-with-a-*.html", True),
        ("/a%24b", "https://h.test/a$b", True),        # %24 matches raw '$'
        ("/a$b", "https://h.test/a$b", True),          # mid-'$' is literal
        ("/a$b", "https://h.test/axb", False),
        ("/x*y$", "https://h.test/xzzy", True),        # wildcard+anchor intact
    ]
    # a '%' that starts no valid triplet canonicalizes to '%25' on BOTH
    # sides, so the pure twin matches it in one form; the engine never
    # sees such paths because try_parse_url nulls invalid URLs
    assert scheduler.decode_robots_octets("/p%ZZq") == "/p%25ZZq"
    assert scheduler.robots_blocked(
        "/p%ZZq", [scheduler.canonicalize_robots_pattern("/p%ZZq")], []
    ) is True
    rows = [
        (f"c{i}.test", f"https://c{i}.test{u[len('https://h.test'):]}")
        for i, (_, u, _b) in enumerate(cases)
    ]
    sel = spark.createDataFrame(rows, "host string, url string")
    rules = spark.createDataFrame(
        [(f"c{i}.test", [p], []) for i, (p, _, _b) in enumerate(cases)],
        "host string, disallow array<string>, allow array<string>",
    )
    kept = {r["host"] for r in scheduler.apply_robots_gate(sel, rules).collect()}
    for i, (pat, url, blocked) in enumerate(cases):
        assert (f"c{i}.test" not in kept) is blocked, (pat, url)
        # pure twin agrees (patterns canonicalized the parse_robots way)
        dec = scheduler.canonicalize_robots_pattern(pat)
        path = url[len("https://h.test"):]
        assert scheduler.robots_blocked(path, [dec], []) is blocked, (pat, url)


def test_robots_gate_percent_fuzz_engine_matches_twin(spark):
    """Seeded fuzz with %-octets on BOTH sides: the gate (pattern decode
    + path decode + JVM regex) ≡ robots_blocked over parse_robots-style
    decoded patterns, including longest-decoded-match precedence."""
    import random

    rnd = random.Random(4242)
    # patterns are free-form (invalid triplets stay literal); PATHS must
    # be %-valid or the JVM URL parser nulls them before the gate
    pat_frags = ["a", "b", "/", "*", "$", "%3F", "%2F", "%41", "%2A", "%25",
                 "%7E", "%zz", "%4", "?x=1", "=", "."]
    path_frags = ["a", "b", "/", "%3F", "%2F", "%41", "%2A", "%25",
                  "%7E", "?x=1", "=", ".", "*", "$"]
    def mk(n, frags):
        return "/" + "".join(rnd.choice(frags) for _ in range(rnd.randint(0, n)))
    cases = []
    for i in range(120):
        dis = [mk(5, pat_frags) for _ in range(rnd.randint(1, 3))]
        alw = [mk(5, pat_frags) for _ in range(rnd.randint(0, 2))]
        path = mk(7, path_frags)
        cases.append((dis, alw, path))
    rows = [
        (f"f{i}.test", f"https://f{i}.test{path}", dis, alw)
        for i, (dis, alw, path) in enumerate(cases)
    ]
    sel = spark.createDataFrame(
        rows, "host string, url string, disallow array<string>, allow array<string>"
    )
    rules = sel.select("host", "disallow", "allow")
    kept = {
        r["host"]
        for r in scheduler.apply_robots_gate(
            sel.drop("disallow", "allow"), rules
        ).collect()
    }
    from urllib.parse import urlparse

    for i, (dis, alw, path) in enumerate(cases):
        pr = urlparse(f"https://f{i}.test{path}")
        pq = pr.path + (("?" + pr.query) if pr.query else "")
        want = scheduler.robots_blocked(
            pq,
            [scheduler.canonicalize_robots_pattern(p) for p in dis],
            [scheduler.canonicalize_robots_pattern(p) for p in alw],
        )
        assert (f"f{i}.test" not in kept) is want, (dis, alw, path)


def test_domain_budget_parity_with_simulator(spark, tmp_path):
    """CrawlConfig.domain_budget: the engine's crawl under a per-eTLD+1
    cap ends byte-identical to the simulator twin — subdomain sharding
    (w0/w1/w2.shopN.example.test) cannot multiply a site's crawl rate."""
    from xtracted_crawlers_spark.catalog import ParquetSnapshotCatalog
    from xtracted_crawlers_spark.crawl import CrawlConfig, load_frontier, run_crawl
    from xtracted_crawlers_spark.simulator import ReferenceSimulator

    seeds = [
        ("u", 1, i, f"https://w{i % 3}.shop{i % 4}.example.test/dp/B0{i:08d}")
        for i in range(48)
    ]
    sdf = spark.createDataFrame(
        seeds, "user_id string, job_id long, seed_idx int, url string"
    )
    pages = spark.createDataFrame([], "url string, html binary, text string")
    cat = ParquetSnapshotCatalog(str(tmp_path / "wh"))
    cfg = CrawlConfig(max_rounds=2, default_budget=4, domain_budget=6)
    run_crawl(spark, cat, pages, sdf, cfg=cfg)
    eng = {r["url_id"]: r for r in load_frontier(spark, cat).collect()}

    sim = ReferenceSimulator({}, default_budget=4, domain_budget=6)
    sim.submit("u", 1, [u for (_, _, _, u) in seeds])
    sim.run(max_rounds=2)
    srows = {r["url_id"]: r for r in sim.frontier_rows()}
    assert set(eng) == set(srows)
    for k, s in srows.items():
        assert eng[k]["status"] == s["status"], k
        assert eng[k]["retries"] == s["retries"], k
    # the cap bit: per round, each domain got at most 6 attempts even
    # though its 3 subdomain hosts could carry 12 under the host budget
    attempted = [r for r in eng.values() if r["retries"] > 0]
    assert attempted and len(attempted) <= 2 * 4 * 6  # rounds*domains*cap


def test_domain_budget_window_group_limits(spark):
    """The literal domain cap must run as a Partial WindowGroupLimit,
    like the host window — no full-frontier domain sort."""
    from xtracted_crawlers_spark import plans

    sel = spark.createDataFrame(
        [
            ("u", 1, f"B0{i:08d}", f"https://w{i % 3}.s{i % 5}.example.test/dp/B0{i:08d}",
             0, i + 1, f"w{i % 3}.s{i % 5}.example.test")
            for i in range(100)
        ],
        "user_id string, job_id long, url_id string, url string,"
        " priority int, job_urls_seq long, host string",
    )
    out = scheduler.select_round(sel, domain_budget=3)
    plan = plans.physical_plan(out)
    assert plan.count("WindowGroupLimit") >= 1 and "Partial" in plan, plan
    per_domain = (
        out.groupBy(F.regexp_extract("host", r"(s\d+\.example\.test)$", 1))
        .count()
        .collect()
    )
    assert all(r["count"] <= 3 for r in per_domain)


def test_merge_bloom_into_absent_bucket_no_false_negative(spark):
    """Regression (round-5 review): build_bloom materializes only
    buckets that held keys, so merging keys into a previously-empty
    bucket must CREATE its state row (full outer fold) — the old left
    join silently dropped such keys and a later probe answered
    definitely-new (false negative)."""
    from xtracted_crawlers_spark import seen

    nb = 16
    base = spark.createDataFrame(
        [("u", 1, f"B0{i:08d}") for i in range(3)],
        "user_id string, job_id long, url_id string",
    )
    bloom = seen.build_bloom(base, n_buckets=nb)
    assert bloom.count() < nb  # some buckets genuinely absent
    extra = spark.createDataFrame(
        [("u", 1, f"BT{i:08d}") for i in range(200)],
        "user_id string, job_id long, url_id string",
    )
    merged = seen.merge_bloom(bloom, extra, nb)
    flagged = seen.bloom_maybe_seen(base.unionByName(extra), merged, nb)
    assert flagged.filter(~F.col("maybe_seen")).count() == 0


def test_pagerank_priority_cut_spans_buckets(spark, sf_dir):
    """crawl_pagerank_priority must be non-vacuous: the skewed harmonic
    edge graph has to spread PageRank over >= 2 priority decades INSIDE
    the selected cut (the default bijective graph yields exactly uniform
    rank — one bucket — which would let mis-bucketing pass unobserved),
    and the top bucket must be scheduled ahead of the next."""
    import __spark_entry__ as em

    pdf = em.queries()["crawl_pagerank_priority"](spark, sf_dir).toPandas()
    assert pdf.priority.nunique() >= 2, dict(pdf.priority.value_counts())
    # global cut orders by priority first: every bucket-0 row's seq rank
    # position precedes any lower-authority row only in priority order
    assert set(pdf.priority.unique()) == set(range(pdf.priority.nunique()))


def test_politeness_by_ip_shares_budget_across_cohosted(spark):
    """Two hostnames on one IP must share ONE per-host budget; an
    unresolved host keeps its own; origin_host survives for fetch."""
    from xtracted_crawlers_spark import scheduler

    rows = [
        (i, f"https://{h}/dp/B0{i:08d}", "u0", 0, f"B0{i:08d}", h, 0)
        for i, h in enumerate(
            ["a.test"] * 5 + ["b.test"] * 5 + ["solo.test"] * 5
        )
    ]
    fr = spark.createDataFrame(
        rows,
        "k long, url string, user_id string, job_id long, url_id string, host string, priority int",
    )
    from pyspark.sql import Window

    fr = fr.withColumn(
        "job_urls_seq",
        F.row_number().over(Window.partitionBy(F.lit(1)).orderBy("k")).cast("long"),
    )
    host_ip = spark.createDataFrame(
        [("a.test", "10.0.0.9"), ("b.test", "10.0.0.9")], "host string, ip string"
    )
    keyed = scheduler.with_politeness_key(fr, host_ip)
    cut = scheduler.select_round(keyed, rules=None, default_budget=3).collect()
    by_key = {}
    for r in cut:
        by_key.setdefault(r.host, []).append(r.origin_host)
    assert len(by_key["ip:10.0.0.9"]) == 3          # SHARED cap, not 3+3
    assert sorted(set(by_key["ip:10.0.0.9"])) == ["a.test"]  # FIFO: a's seqs first
    assert len(by_key["solo.test"]) == 3            # unresolved host unmerged
    assert all(r.origin_host in ("a.test", "b.test", "solo.test") for r in cut)
