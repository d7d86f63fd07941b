"""Unit tests for pipeline operators not fully covered by the oracle
contract: multimodal plumbing, ANN recall, dedup plan shape."""

import pytest
from pyspark.sql import functions as F

from xtracted_crawlers_spark.operators import dedup, multimodal, similarity, textops


def test_media_features_deterministic(spark):
    media = multimodal.gen_media(spark, 30)
    feats = multimodal.image_features(media).orderBy("media_id")
    rows1 = feats.collect()
    rows2 = multimodal.image_features(multimodal.gen_media(spark, 30)).orderBy("media_id").collect()
    assert rows1 == rows2
    assert all(r["kind"] == "image" for r in media.filter(F.col("media_id").isin(
        [x["media_id"] for x in rows1])).select("kind").collect())
    for r in rows1:
        assert 16 <= r["width"] <= 255 and 16 <= r["height"] <= 255
        assert len(r["feat"]) == 8
        assert len(r["digest"]) == 32
        # the float array decodes from its hex fingerprint
        assert len(r["feat_fp"]) == 16
        decoded = [int(r["feat_fp"][2 * i : 2 * i + 2], 16) / 255.0 for i in range(8)]
        assert all(abs(a - b) < 1e-6 for a, b in zip(decoded, r["feat"]))


def test_frame_sample_shapes(spark):
    media = multimodal.gen_media(spark, 30)
    frames = multimodal.frame_sample(media, every_n_bytes=32, max_frames=4).collect()
    assert frames
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    for mid, idxs in by_media.items():
        assert sorted(idxs) == list(range(len(idxs)))  # contiguous frame idx
        assert len(idxs) <= 4


def test_decode_stub_gated():
    assert not multimodal.decode_available()
    with pytest.raises(NotImplementedError):
        multimodal._decode_image_real(b"xx")


def test_ann_recall_vs_bruteforce(spark, sf_dir):
    """Shippable-bar recall: ≥0.8 at tuned tables/planes (measured 0.88
    at 4 planes × 12 tables on this corpus)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    exact = similarity.cosine_topk(emb, q, k=5)
    approx = similarity.ann_lsh_topk(emb, q, k=5, n_planes=4, n_tables=12, dim=64)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.8, f"LSH recall too low: {recall}"
    # approx scores, where present, must equal exact scores
    es = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact.collect()}
    for r in approx.collect():
        key = (r["query_id"], r["neighbor_id"])
        if key in es:
            assert abs(r["cosine"] - es[key]) < 1e-9


def test_minhash_estimates_track_jaccard(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    est = {
        (r["doc_a"], r["doc_b"]): r["est_sim"]
        for r in dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    assert exact, "corpus should contain high-jaccard near-dups"
    hits = set(exact) & set(est)
    assert len(hits) >= len(exact) * 0.5  # LSH finds most strong pairs


def test_incremental_minhash_equals_full_restricted(spark, sf_dir):
    """The exactness contract of the continuous-ingest path: incremental
    (corpus signatures + batch text) must equal the full minhash_lsh run
    over corpus ∪ batch, restricted to pairs touching ≥1 batch doc —
    same pairs, same est_sim. Also proves the corpus side works from
    signatures alone (text column dropped before the call)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    corpus_sigs = dedup.minhash_signatures(corpus).select("doc_id", "sig")
    inc = {
        frozenset((r["doc_a"], r["doc_b"])): (r["est_sim"], r["vs"])
        for r in dedup.incremental_minhash_pairs(corpus_sigs, batch, threshold=0.2).collect()
    }
    full = {
        frozenset((r["doc_a"], r["doc_b"])): r["est_sim"]
        for r in dedup.minhash_lsh_pairs(docs, threshold=0.2).collect()
        if r["doc_a"] % 2 == 1 or r["doc_b"] % 2 == 1
    }
    assert set(inc) == set(full)
    assert full, "corpus should contain cross-parity near-dups"
    for pair, (sim, vs) in inc.items():
        assert sim == full[pair]
        assert vs == ("batch" if all(d % 2 == 1 for d in pair) else "corpus")


def test_connected_components_vs_union_find(spark, sf_dir):
    """Components over the real minhash pair list equal a pure-Python
    union-find ground truth (iters covers the observed diameters)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.2)
    got = {
        r["doc_id"]: r["component"]
        for r in dedup.connected_components(pairs, iters=6).collect()
    }
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    plist = [(r["doc_a"], r["doc_b"]) for r in pairs.collect()]
    for a, b in plist:
        parent[find(a)] = find(b)
    want = {n: min(m for m in parent if find(m) == find(n)) for n in parent}
    assert got == want
    assert plist and any(v != k for k, v in got.items())


def test_connected_components_chain_needs_iters(spark):
    """Honest iters contract: a 10-edge path clusters fully at iters ≥
    diameter and visibly under-merges below it."""
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "doc_a long, doc_b long"
    )
    full = dedup.connected_components(chain, iters=10).collect()
    assert {r["component"] for r in full} == {0}
    short = dedup.connected_components(chain, iters=2).collect()
    assert {r["component"] for r in short} != {0}


def test_minhash_plan_has_no_shuffle(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = dedup.minhash_signatures(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # signature build must stay map-only


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    """The production IVF path: spherical-kmeans codebook (trained on a
    deterministic sample), probe 3 of 8 clusters, recall ≥0.8 (measured
    0.90). The untrained md5 codebook stays only as the oracle baseline."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    code = similarity.kmeans_codebook(emb, n_clusters=8, dim=64, n_iters=4)
    exact = similarity.cosine_topk(emb, q, k=5)
    approx = similarity.ann_ivf_topk(emb, q, k=5, n_probe=3, dim=64, codebook=code)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.8, f"kmeans-IVF recall too low: {recall}"


def test_kmeans_codebook_deterministic_and_balanced(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    c1 = similarity.kmeans_codebook(emb, n_clusters=4, dim=64, n_iters=2)
    c2 = similarity.kmeans_codebook(emb, n_clusters=4, dim=64, n_iters=2)
    assert c1 == c2  # deterministic init + iteration order
    assigned = emb.select(
        similarity.ivf_assign(F.col("embedding").cast("array<double>"), c1).alias("c")
    )
    counts = {r["c"]: r["n"] for r in assigned.groupBy("c").agg(F.count("*").alias("n")).collect()}
    assert len(counts) == 4  # no empty cluster on this corpus
    assert max(counts.values()) <= 0.9 * sum(counts.values())  # not degenerate


def test_metrics_history(spark, sf_dir, tmp_path):
    from xtracted_crawlers_spark import fixtures
    from xtracted_crawlers_spark.catalog import ParquetSnapshotCatalog
    from xtracted_crawlers_spark.crawl import CrawlConfig, metrics_history, run_crawl

    paths = fixtures.write_corpus(spark, str(tmp_path / "c"), 30, 12, n_hosts=3)
    cat = ParquetSnapshotCatalog(str(tmp_path / "wh"))
    run_crawl(spark, cat, spark.read.parquet(paths["pages"]),
              spark.read.parquet(paths["seeds"]), cfg=CrawlConfig(max_rounds=3))
    hist = metrics_history(cat)
    assert hist[0]["event"] == "bootstrap"
    assert all("n_files" in h and h["n_files"] > 0 for h in hist)
    assert any(h.get("completed", 0) > 0 for h in hist)


def test_near_dup_lsh_matches_exact(spark, sf_dir):
    """Production near-dup path: LSH candidates + exact cosine filter.
    Precision is exact by construction (all emitted pairs re-scored);
    recall vs the all-pairs baseline must be >=0.8 at tuned tables."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {(r["doc_a"], r["doc_b"]): r["cosine"]
             for r in similarity.near_dup_pairs(emb, threshold=0.3).collect()}
    approx = {(r["doc_a"], r["doc_b"]): r["cosine"]
              for r in similarity.near_dup_pairs_lsh(emb, threshold=0.3).collect()}
    assert exact, "corpus should contain near-dups at this threshold"
    assert set(approx) <= set(exact)  # exact precision
    for k, v in approx.items():
        assert v == exact[k]  # bit-identical rounded scores
    recall = len(approx) / len(exact)
    assert recall >= 0.8, f"near-dup LSH recall too low: {recall}"


def test_simhash64_hamming_pairs(spark):
    """64-bit simhash + banded hamming join: identical docs collide at
    distance 0; a one-word-in-many change stays within the band budget;
    unrelated docs don't pair."""
    base = " ".join(f"w{i}" for i in range(60))
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),                                  # exact dup
            (3, base.replace("w30", "CHANGED")),        # near dup
            (4, " ".join(f"z{i}" for i in range(60))),  # unrelated
        ],
        "doc_id long, text string",
    )
    sigs = dedup.simhash64(docs)
    assert sigs.count() == 4
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in dedup.simhash_hamming_pairs(sigs, max_distance=6).collect()}
    assert pairs.get((1, 2)) == 0
    assert (1, 3) in pairs and pairs[(1, 3)] <= 6
    assert not any(4 in k for k in pairs)


def test_simhash64_plan_single_shuffle(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from xtracted_crawlers_spark import plans
    assert plans.count_exchanges(dedup.simhash64(docs)) == 1  # one groupBy


def test_bmp_ppm_roundtrip():
    """Codec-free decoders: encode -> decode is the identity, including
    BMP row padding at odd widths and bottom-up storage."""
    import numpy as np

    rng = np.random.default_rng(7)
    for w, h in [(1, 1), (3, 2), (5, 4), (16, 9)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        for enc, dec in [
            (multimodal.encode_bmp, multimodal._decode_bmp),
            (multimodal.encode_ppm, multimodal._decode_ppm),
        ]:
            got = dec(enc(px))
            assert got is not None, (enc.__name__, w, h)
            gw, gh, gc, gpx = got
            assert (gw, gh, gc) == (w, h, 3)
            assert np.array_equal(gpx, px), (enc.__name__, w, h)
    # malformed inputs -> None (stub path), never an exception
    assert multimodal._decode_bmp(b"BMxx") is None
    assert multimodal._decode_ppm(b"P6\n5 5\n70000\n" + b"\x00" * 75) is None
    assert multimodal.decode_image(b"\x89PNG junk") is None


def test_image_features_real_pixels_through_spark(spark):
    """Round-3 verdict #7: REAL decoded pixel features (not md5
    arithmetic) flow through the mapInPandas path for BMP/PPM rows, while
    undecodable rows keep the deterministic stub — in the same batch."""
    import hashlib
    import numpy as np

    red = np.zeros((8, 6, 3), dtype=np.uint8)
    red[:, :, 0] = 255  # solid red: mean_R=1, mean_G=B=0, stds=0
    grad = np.zeros((4, 4, 3), dtype=np.uint8)
    grad[:, :, 1] = np.linspace(0, 255, 16).reshape(4, 4).astype(np.uint8)
    rows = [
        (0, "image", multimodal.encode_bmp(red), {}),
        (1, "image", multimodal.encode_ppm(red), {}),
        (2, "image", multimodal.encode_bmp(grad), {}),
        (3, "image", b"not an image at all", {}),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in multimodal.image_features(media).collect()}
    assert len(feats) == 4
    for mid in (0, 1):
        r = feats[mid]
        assert (r["width"], r["height"], r["channels"]) == (6, 8, 3)
        # [mean_R, mean_G, mean_B, std_R, std_G, std_B, mean, std]
        assert r["feat"][:6] == [1.0, 0.0, 0.0, 0.0, 0.0, 0.0]
        assert r["feat_fp"].startswith("ff0000")
    g = feats[2]
    assert (g["width"], g["height"]) == (4, 4)
    assert g["feat"][0] == 0.0 and g["feat"][1] > 0.4  # green gradient mean
    assert g["feat"][4] > 0.0  # green std nonzero
    stub = feats[3]
    b = rows[3][2]
    fhex = hashlib.md5(b + b"#feat").hexdigest()[:16]
    assert stub["feat_fp"] == fhex  # md5-arithmetic stub untouched
    # the feat <-> fp roundtrip invariant holds on BOTH paths (feat is
    # array<float>, so compare at float32 precision)
    for r in feats.values():
        for i, v in enumerate(r["feat"]):
            assert abs(v - int(r["feat_fp"][2 * i : 2 * i + 2], 16) / 255.0) < 1e-6


def test_redact_pii_masks_and_counts(spark):
    from xtracted_crawlers_spark.operators import textops

    rows = [
        ("reach me at jo.doe+x@mail-7.example thanks",),
        ("server 10.0.0.1 and 192.168.001.255 up",),
        ("call +1 (555) 010-2034 today",),
        ("mixed: a@b.co from 8.8.8.8 tel 555 123 4567 ok",),
        ("clean text, nothing to scrub 12",),
    ]
    df = spark.createDataFrame(rows, "t string")
    out = df.select(
        textops.redact_pii(F.col("t")).alias("r"),
        *[c.alias(n) for c, n in zip(textops.pii_counts(F.col("t")),
                                     ["n_email", "n_ip", "n_phone"])],
    ).collect()
    assert out[0]["r"] == "reach me at <EMAIL> thanks"
    assert (out[0]["n_email"], out[0]["n_ip"], out[0]["n_phone"]) == (1, 0, 0)
    assert out[1]["r"] == "server <IP> and <IP> up"
    assert out[1]["n_ip"] == 2 and out[1]["n_phone"] == 0  # IPs never double-match as phones
    assert out[2]["r"] == "call <PHONE> today"
    assert (out[3]["n_email"], out[3]["n_ip"], out[3]["n_phone"]) == (1, 1, 1)
    assert out[3]["r"] == "mixed: <EMAIL> from <IP> tel <PHONE> ok"
    assert out[4]["r"] == rows[4][0]


def test_sig_bands_plan_is_projection_only(spark, sf_dir):
    """Banding from persisted signatures must stay map-only: the
    continuous-ingest path re-derives the corpus band table from the
    signatures snapshot with zero shuffles."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sigs = dedup.minhash_signatures(docs)
    plan = dedup.sig_bands(sigs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_redact_pii_spares_dates_and_small_numbers(spark):
    from xtracted_crawlers_spark.operators import textops

    rows = [
        ("released 2026-08-17 and ranged 2010-2020",),
        ("about 20 000 000 people",),
        ("+1 (555) 010-2034 stays a phone",),
    ]
    df = spark.createDataFrame(rows, "t string")
    out = [r["r"] for r in df.select(textops.redact_pii(F.col("t")).alias("r")).collect()]
    assert out[0] == rows[0][0]  # ISO dates / year ranges survive
    assert out[1] == rows[1][0]  # 8-digit spaced numbers survive
    assert out[2] == "<PHONE> stays a phone"


def test_incremental_band_cap_is_per_side(spark):
    """The corpus join is capped by CORPUS bucket size only: a band hot
    in the batch but cold in the corpus must still yield batch-corpus
    candidates (review fix), while the batch self-join respects the
    batch-side cap."""
    text = "alpha beta gamma delta epsilon zeta"  # identical shingles
    batch = spark.createDataFrame([(i, text) for i in range(1, 6)], "doc_id long, text string")
    corpus = spark.createDataFrame([(100, text)], "doc_id long, text string")
    corpus_sigs = dedup.minhash_signatures(corpus)
    pairs = dedup.incremental_minhash_pairs(
        corpus_sigs, batch, threshold=0.5, band_cap=2
    ).collect()
    by_vs = {}
    for r in pairs:
        by_vs.setdefault(r["vs"], set()).add((r["doc_a"], r["doc_b"]))
    # corpus bucket size 1 <= cap: all 5 batch docs pair with doc 100
    assert by_vs.get("corpus") == {(i, 100) for i in range(1, 6)}
    # batch bucket size 5 > cap: self-join candidates dropped
    assert "batch" not in by_vs


def test_contamination_flags_planted(spark):
    """Decontamination: a corpus doc quoting a 13-gram from the probe
    set is flagged; paraphrases and clean docs are not; short docs
    still appear with zero hits."""
    probe_text = ("alpha bravo charlie delta echo foxtrot golf hotel india "
                  "juliet kilo lima mike november oscar")
    probes = spark.createDataFrame([(1000, probe_text)], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [
            (1, "intro words then alpha bravo charlie delta echo foxtrot golf "
                "hotel india juliet kilo lima mike quoted verbatim"),
            (2, "alpha bravo charlie but then it diverges completely from the "
                "benchmark text entirely different words here now ok"),
            (3, "totally unrelated content with no overlap whatsoever at all "
                "in any of its words"),
            (4, "too short"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_hits"], r["contaminated"]) for r in
           dedup.contamination_flags(corpus, probes, n=13).collect()}
    assert got[1][1] is True and got[1][0] >= 1
    assert got[2] == (0, False)  # 3-word prefix overlap < 13-gram window
    assert got[3] == (0, False)
    assert got[4] == (0, False)  # shingle-less doc still reported
    assert set(got) == {1, 2, 3, 4}


def test_repetition_stats_hand_cases(spark):
    """Gopher repetition filters on hand-computed documents: duplicate
    lines, duplicate-line chars, top-bigram coverage, and the combined
    gate at the published thresholds."""
    from pyspark.sql import functions as F

    from xtracted_crawlers_spark.operators import textops

    rows = [
        # 4 nonblank lines ("a b c" x2), dup chars 10/29, top bigram
        # "a b" (2 occurrences, 2 chars) over 22 word chars
        (0, "a b c\na b c\nunique line here\n\n  \nx y"),
        (1, ""),                                  # blank: all zero, kept
        (2, "one two one two one two one two"),   # top bigram covers all
        (3, "single"),                            # no bigram
        (4, "word " * 50),                        # overlapping runs: capped at 1.0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    t = F.col("text")
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            textops.dup_line_frac(t).alias("dlf"),
            textops.dup_line_char_frac(t).alias("dlcf"),
            textops.top_bigram_char_frac(t).alias("tbcf"),
            textops.gopher_keep(t).alias("keep"),
        ).collect()
    }
    assert got[0]["dlf"] == 0.25
    assert got[0]["dlcf"] == round(10 / 29, 4)
    assert got[0]["tbcf"] == round(4 / 22, 4)
    assert got[0]["keep"] is False  # dlcf 0.3448 > 0.20
    assert (got[1]["dlf"], got[1]["dlcf"], got[1]["tbcf"], got[1]["keep"]) == (
        0.0, 0.0, 0.0, True)
    assert got[2]["tbcf"] == 1.0 and got[2]["keep"] is False
    assert (got[3]["tbcf"], got[3]["keep"]) == (0.0, True)
    assert got[4]["tbcf"] == 1.0  # 49 overlapping "word word" capped


def test_repetition_stats_map_only_plan(spark):
    """The repetition statistics must stay shuffle-free: per-document
    higher-order expressions, no Exchange, no Python in the plan."""
    from pyspark.sql import functions as F

    from xtracted_crawlers_spark.operators import textops

    df = spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("x y z\nx y z\nw "), F.col("id").cast("string")).alias("text"),
    )
    out = df.select(
        textops.dup_line_frac(F.col("text")).alias("a"),
        textops.dup_line_char_frac(F.col("text")).alias("b"),
        textops.top_bigram_char_frac(F.col("text")).alias("c"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "BatchEvalPython" not in plan


def test_line_dedup_keep_first(spark):
    """CCNet-style keep-first: a line survives only at its globally first
    (doc_id, pos) occurrence; matching is case/whitespace-insensitive but
    the ORIGINAL line text is what survives."""
    from xtracted_crawlers_spark.operators import dedup

    rows = [
        (0, "Nav Bar\nunique zero\nfooter (c) 2026"),
        (1, "nav  bar\nunique one\nfooter (c) 2026"),   # both boilerplate lines lose
        (2, "unique two\nNav Bar"),                      # later occurrence loses
        (3, ""),                                          # empty doc: zero lines
        (4, "unique zero"),                               # dup of doc 0's line
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in dedup.line_dedup(df).collect()}
    assert got[0]["clean_text"] == "Nav Bar\nunique zero\nfooter (c) 2026"
    assert (got[0]["n_lines"], got[0]["n_kept"]) == (3, 3)
    assert got[1]["clean_text"] == "unique one"
    assert (got[1]["n_lines"], got[1]["n_kept"]) == (3, 1)
    assert got[2]["clean_text"] == "unique two"
    assert got[3]["clean_text"] == "" and got[3]["n_lines"] == 0
    assert got[4]["clean_text"] == "" and got[4]["n_lines"] == 1 and got[4]["n_kept"] == 0


def test_line_dedup_drop_frequent(spark):
    """C4-style drop-frequent: every occurrence of a line with corpus
    document-frequency >= min_df disappears, including the first."""
    from xtracted_crawlers_spark.operators import dedup

    rows = [
        (0, "boiler\nkeep zero\ntwice"),
        (1, "boiler\nkeep one\ntwice"),
        (2, "boiler\nkeep two"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in dedup.line_dedup(df, mode="drop_frequent", min_df=3).collect()}
    # 'boiler' df=3 -> dropped everywhere; 'twice' df=2 -> survives both
    assert got[0]["clean_text"] == "keep zero\ntwice"
    assert got[1]["clean_text"] == "keep one\ntwice"
    assert got[2]["clean_text"] == "keep two"
    assert all(got[i]["n_lines"] == 3 for i in (0, 1)) and got[2]["n_lines"] == 2


def test_line_dedup_no_window_over_line_key(spark):
    """The first-occurrence winner must be a partial-combine aggregate,
    never a window over the line key: a boilerplate line in 10^9 docs
    would concentrate a window's whole partition on one task."""
    from pyspark.sql import functions as F

    from xtracted_crawlers_spark.operators import dedup

    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("shared line\nuniq "), F.col("id").cast("string")).alias("text"),
    )
    out = dedup.line_dedup(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert out.count() == 100


def test_bm25_ranking_and_fold_parity(spark):
    """BM25 sanity on a hand-built corpus: the doc with more query-term
    occurrences (and shorter length) ranks first, docs without any query
    term are absent, rare terms outweigh common ones; and the production
    F.sum path equals the deterministic exact_fold path to 1e-9."""
    from xtracted_crawlers_spark.operators import search

    docs = spark.createDataFrame(
        [
            (0, "spark spark join fast"),
            (1, "spark filter table scan window merge sort group agg batch"),
            (2, "filter table scan merge sort group agg batch row value"),
            (3, "join join join"),
        ],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame([("q0", "spark join")], "query_id string, query_text string")
    got = {r["doc_id"]: r for r in search.bm25_topk(docs, queries, k=4).collect()}
    assert 2 not in got  # no query term
    assert got[0]["rank"] == 1  # both terms, twice, short doc
    assert set(got) == {0, 1, 3}
    # 'spark' (df=2) carries more idf weight than... both terms have df=2
    # here; doc 3 (one term thrice, shortest) must beat doc 1 (one term
    # once, longest)
    assert got[3]["rank"] < got[1]["rank"]

    exact = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in search.bm25_topk(docs, queries, k=4, exact_fold=True).collect()
    }
    for r in got.values():
        assert abs(exact[("q0", r["doc_id"])] - r["score"]) <= 1e-9


def test_bm25_plan_broadcasts_queries_and_prunes_topk(spark, sf_dir):
    """Scale shape: the query side reaches the postings join as a
    broadcast (the corpus side must never shuffle for it) and the
    literal top-k rank cap runs as a Partial WindowGroupLimit before the
    final window's exchange."""
    from xtracted_crawlers_spark.operators import search

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    queries = spark.createDataFrame(
        [("q0", "spark join window")], "query_id string, query_text string"
    )
    plan = (
        search.bm25_topk(docs, queries, k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_url_quality_hand_cases(spark):
    """Feature extraction and keep gate on hand-built URLs, including
    the blocklist path."""
    from xtracted_crawlers_spark.operators import urlquality

    rows = [
        (0, "https://good.test/article/title"),
        (1, "https://good.test/search?q=x&page=2&sort=asc&ref=srp"),  # 4 params
        (2, "https://good.test/2024/01/15/123456789/0987654321"),     # digit-heavy
        (3, "https://spam.test/fine/path"),                           # blocklisted
        (4, "https://good.test/" + "a/" * 13 + "deep"),               # depth > 12
    ]
    df = spark.createDataFrame(rows, "k long, url string")
    blocked = spark.createDataFrame([("spam.test",)], "host string")
    got = {
        r["k"]: r
        for r in urlquality.url_keep(
            df, blocked_hosts=blocked, max_digit_ratio=0.5, max_params=3
        ).collect()
    }
    assert got[0]["keep"] and got[0]["n_params"] == 0 and got[0]["depth"] == 2
    assert not got[1]["keep"] and got[1]["n_params"] == 4
    assert not got[2]["keep"] and got[2]["digit_ratio"] > 0.5
    assert not got[3]["keep"] and got[3]["host"] == "spam.test"
    assert not got[4]["keep"] and got[4]["depth"] == 14


def test_url_quality_blocklist_broadcasts(spark, sf_dir):
    """The blocklist join must plan as a broadcast against the URL side
    (a frontier-scale shuffle for a 10^4-row blocklist is the exact
    anti-pattern this operator exists to avoid)."""
    from pyspark.sql import functions as F

    from xtracted_crawlers_spark.operators import urlquality

    urls = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.concat(F.lit("https://h"), (F.col("o_orderkey") % 100).cast("string"),
                 F.lit(".test/p/"), F.col("o_orderkey").cast("string")).alias("url")
    )
    blocked = spark.createDataFrame([(f"h{i}.test",) for i in range(0, 100, 7)], "host string")
    plan = (
        urlquality.url_keep(urls, blocked_hosts=blocked)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_html_to_text_hand_cases(spark):
    """Script bodies with '<' and quotes vanish entirely; style,
    comments, tags → space; entities decode single-pass (&amp;lt; stays
    '&lt;' literally-decoded once, not twice); whitespace collapses."""
    from xtracted_crawlers_spark.operators import textops

    cases = [
        (0, '<p>a</p><script>if (x < 2) { s = "</p>h"; }</script><p>b</p>', "a b"),
        (1, "<style>h1 { x: 1; }</style>ok", "ok"),
        (2, "x<!-- <p>gone</p> -->y", "x y"),
        (3, "5 &lt; 7 &amp;&amp; 3 &gt; 1", '5 < 7 && 3 > 1'),
        (4, "&amp;lt;", "&lt;"),  # single-pass decode
        (5, "  a \t b\n\nc  ", "a b c"),
        (6, b"<b>bytes</b> ok".decode() if True else "", "bytes ok"),
    ]
    df = spark.createDataFrame([(k, h) for k, h, _ in cases], "k long, html string")
    got = {r["k"]: r["t"] for r in df.select("k", textops.html_to_text(F.col("html")).alias("t")).collect()}
    for k, _, want in cases:
        assert got[k] == want, (k, got[k], want)


def test_containment_catches_quotes_jaccard_misses(spark):
    from xtracted_crawlers_spark.operators import dedup

    small = "alpha beta gamma delta epsilon zeta eta theta"
    big = small + " " + " ".join(f"filler{i} pad{i} word{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, small), (2, big), (3, "totally unrelated content here now")],
        "doc_id long, text string",
    )
    cont = {
        (r["doc_sub"], r["doc_super"]): r["containment"]
        for r in dedup.ngram_containment_pairs(docs, threshold=0.8).collect()
    }
    assert cont.get((1, 2), 0) >= 0.99  # the small doc is fully contained
    assert (2, 1) not in cont           # direction matters
    jac = dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    assert not any({r["doc_a"], r["doc_b"]} == {1, 2} for r in jac)  # jaccard misses it


def test_gopher_word_rules_each_rule_fires(spark):
    """Each Gopher word rule (Rae et al. 2021 Table A1) flips keep on
    its own minimal violation; the base document passes all rules."""
    base = ("the quick brown fox jumps over that lazy dog and we have "
            "been to many of those places with great delight indeed " * 5)
    cases = {
        "pass": (base, True),
        "too_short": ("the and of to be that have with words here", False),
        "mean_len_low": (base + " " + "a b c d e f g h i j " * 40, False),
        "symbols": (base + " " + "# " * 40, False),
        "bullets": (base + "\n- one\n- two\n- three\n- four\n- five", False),
        "ellipsis": ("\n".join([base, "x...", "y...", "z..."]), False),
        "non_alpha": (base + " " + "12345 " * 150, False),
        "no_stops": (
            "quick brown fox jumps high above every fence here today " * 10,
            False,
        ),
    }
    df = spark.createDataFrame(
        [(k, t) for k, (t, _) in cases.items()], "name string, text string"
    )
    got = {
        r["name"]: r["keep"]
        for r in df.select(
            "name", textops.gopher_word_keep(F.col("text")).alias("keep")
        ).collect()
    }
    for name, (_, want) in cases.items():
        assert got[name] is want, name
    # the stats are pure projections — no shuffle, no Python
    from xtracted_crawlers_spark import plans

    out = df.select(
        "name", *[c.alias(n) for n, c in textops.gopher_word_stats(F.col("text")).items()]
    )
    assert plans.python_eval_nodes(out) == []
    assert "Exchange" not in plans.physical_plan(out)


def test_canonical_docs_selection_and_shape(spark):
    """Per component: highest quality wins, ties break to the LOWEST
    doc_id; singletons keep themselves. Plan: struct-max aggregation,
    no per-component sort window (mega-cluster skew safety)."""
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7), (9, 9)],
        "doc_id long, component long",
    )
    docs = spark.createDataFrame(
        [(1, 0.5), (2, 0.75), (3, 0.75), (7, 0.25), (8, 0.25), (9, 1.0)],
        "doc_id long, quality double",
    )
    out = dedup.canonical_docs(labels, docs)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[2]["keep"] and rows[2]["canonical_id"] == 2  # tie -> lowest id
    assert not rows[3]["keep"] and rows[3]["canonical_id"] == 2
    assert not rows[1]["keep"]
    assert rows[7]["keep"] and not rows[8]["keep"]  # tie -> lowest id
    assert rows[9]["keep"]  # singleton
    from xtracted_crawlers_spark import plans

    assert "Window" not in plans.physical_plan(out)
    assert plans.python_eval_nodes(out) == []


# ---------------------------------------------------------------------------
# exact substring dedup (Lee et al. 2021 — dedup.duplicated_spans)
# ---------------------------------------------------------------------------


def _spans(spark, rows, k=4, min_docs=2):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.duplicated_spans(docs, k=k, min_docs=min_docs).collect()
    return sorted((r.doc_id, r.span_start, r.span_end, r.n_windows) for r in out)


def test_substring_spans_basic_shared_sentence(spark):
    # docs 1 and 2 share an exact 6-token run at different offsets;
    # doc 3 is unrelated
    shared = "the quick brown fox jumps high"
    rows = [
        (1, f"{shared} and then some more words"),
        (2, f"totally different lead in here {shared}"),
        (3, "nothing in common with anybody at all whatsoever today"),
    ]
    got = _spans(spark, rows, k=4)
    # 6 tokens, k=4 -> 3 windows; doc1 run starts at 0, doc2 at 5
    assert got == [(1, 0, 5, 3), (2, 5, 10, 3)]


def test_substring_spans_short_docs_and_min_docs(spark):
    rows = [
        (1, "a b c"),                      # shorter than k -> no windows
        (2, "x y z w x y z w x y z w"),    # internal repetition only
        (3, "completely unrelated content of twelve tokens for padding out"),
    ]
    # min_docs=2 counts DISTINCT docs: doc 2's self-repeats don't qualify
    assert _spans(spark, rows, k=4) == []


def test_substring_spans_merge_rule_token_contiguity(spark):
    # Windows at gap == k have touching token coverage -> ONE span;
    # gap == k+1 leaves a one-token hole -> two spans. Construct via two
    # shared runs separated by per-doc unique filler of width k-? tokens.
    k = 4
    runA = "alpha beta gamma delta"          # 4 tokens -> 1 window
    runB = "epsilon zeta eta theta"          # 4 tokens -> 1 window
    # gap between window starts = len(runA tokens) + filler
    for filler_n, want in [(k - 4, 1), (k + 1 - 4 + 1, 2)]:
        rows = []
        for d in (1, 2):
            filler = " ".join(f"u{d}f{j}" for j in range(filler_n))
            text = f"{runA} {filler} {runB}".replace("  ", " ").strip()
            rows.append((d, text))
        got = _spans(spark, rows, k=k)
        per_doc = [g for g in got if g[0] == 1]
        assert len(per_doc) == want, (filler_n, got)


def test_substring_span_stats_never_double_counts(spark):
    shared = " ".join(f"s{i}" for i in range(10))
    rows = [(d, f"lead{d} {shared} mid{d} {shared} tail{d}") for d in (1, 2)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    st = {r.doc_id: r for r in dedup.duplicated_span_stats(docs, k=4).collect()}
    for d in (1, 2):
        r = st[d]
        assert r.dup_tokens <= r.total_tokens
        assert r.n_spans == 2
        assert r.dup_frac_pct == r.dup_tokens * 100 // r.total_tokens


def test_substring_spans_match_bruteforce(spark):
    """Cross-check against a pure-Python suffix-free brute force on a
    small random-ish corpus with planted boilerplate."""
    import hashlib

    k = 5
    vocab = [f"w{i}" for i in range(12)]
    boiler = "pb1 pb2 pb3 pb4 pb5 pb6 pb7"
    rows = []
    for d in range(12):
        h = int(hashlib.md5(str(d).encode()).hexdigest(), 16)
        words = [vocab[(h >> (4 * j)) % len(vocab)] for j in range(14)]
        if d % 3 == 0:
            words[5:5] = boiler.split()
        rows.append((d, " ".join(words)))

    # brute force: same window-hash + island logic in plain Python
    from collections import Counter, defaultdict

    wins = defaultdict(list)  # doc -> positions of duplicated windows
    seen = defaultdict(set)   # window text -> docs
    toks = {d: t.split() for d, t in rows}
    for d, ws in toks.items():
        for p in range(len(ws) - k + 1):
            seen[" ".join(ws[p : p + k])].add(d)
    for d, ws in toks.items():
        for p in range(len(ws) - k + 1):
            if len(seen[" ".join(ws[p : p + k])]) >= 2:
                wins[d].append(p)
    want = []
    for d, ps in wins.items():
        start = prev = ps[0]
        nw = 1
        for p in ps[1:]:
            if p - prev > k:
                want.append((d, start, prev + k - 1, nw))
                start, nw = p, 0
            prev = p
            nw += 1
        want.append((d, start, prev + k - 1, nw))
    assert _spans(spark, rows, k=k) == sorted(want)


# ---------------------------------------------------------------------------
# DSIR importance resampling (Xie et al. 2023 — sampling.dsir_logweights)
# ---------------------------------------------------------------------------


def test_dsir_matches_pure_python(spark):
    """Bit-for-bit (to 4dp) cross-check of the whole DSIR computation
    against a plain-Python reimplementation."""
    import hashlib
    import math
    from collections import Counter

    from xtracted_crawlers_spark.operators import sampling

    B = 64
    pool = [
        (1, "alpha beta gamma alpha"),
        (2, "delta epsilon zeta"),
        (3, "alpha beta unrelated filler words"),
        (4, "zz yy xx ww vv"),
    ]
    target = [(10, "alpha beta gamma"), (11, "beta gamma alpha alpha")]

    def feats(text):
        ws = text.lower().strip().split()
        fs = list(ws) + [" ".join(ws[i : i + 2]) for i in range(len(ws) - 1)]
        return [int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % B for f in fs if f]

    rawc, tgtc = Counter(), Counter()
    for _, t in pool:
        rawc.update(feats(t))
    for _, t in target:
        tgtc.update(feats(t))
    rt, tt = sum(rawc.values()), sum(tgtc.values())

    def weight(text):
        lrs = sorted(
            (b, math.log((tgtc[b] + 1.0) / (tt + B)) - math.log((rawc[b] + 1.0) / (rt + B)))
            for b in feats(text)
        )
        acc = 0.0
        for _, lr in lrs:
            acc += lr
        return round(acc, 4)

    docs = spark.createDataFrame(pool, "doc_id long, text string")
    tgt = spark.createDataFrame(target, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_feats, r.dsir_logweight, r.selected)
        for r in sampling.dsir_logweights(docs, tgt, n_buckets=B).collect()
    }
    for d, t in pool:
        w = weight(t)
        nf = len(feats(t))
        assert got[d] == (nf, w, w > 0), (d, got[d], w)
    # semantic direction: target-like doc 1 beats junk doc 4
    assert got[1][1] > got[4][1]


def test_dsir_plan_is_broadcast_and_shuffle_lean(spark):
    """The bucket log-ratio table must join back as a BROADCAST (it is
    n_buckets rows); no Python eval nodes anywhere."""
    from xtracted_crawlers_spark import plans
    from xtracted_crawlers_spark.operators import sampling

    docs = spark.createDataFrame(
        [(i, f"w{i % 7} w{i % 3} w{i % 5}") for i in range(60)], "doc_id long, text string"
    )
    tgt = docs.filter(F.col("doc_id") % 2 == 0)
    out = sampling.dsir_logweights(docs, tgt, n_buckets=32)
    pp = plans.physical_plan(out)
    assert "BroadcastHashJoin" in pp or "BroadcastNestedLoopJoin" in pp
    assert plans.python_eval_nodes(out) == []


# ---------------------------------------------------------------------------
# SemDeDup (Abbas et al. 2023 — similarity.semdedup)
# ---------------------------------------------------------------------------


def test_semdedup_triangular_rule_drops_whole_chain(spark):
    """a~b and b~c above threshold with a!~c: the paper's rule compares
    vs ALL earlier items (not only kept ones), so BOTH b and c drop."""
    from xtracted_crawlers_spark.operators import similarity

    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.96, 0.28, 0.0]),   # cos(1,2) ~ 0.96
        (3, [0.85, 0.53, 0.0]),   # cos(2,3) ~ 0.96, cos(1,3) ~ 0.85
        (4, [0.0, 0.0, 1.0]),     # orthogonal: kept
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r.vec_id: (r.keep, r.max_prior_cosine)
        for r in similarity.semdedup(
            df, threshold=0.9, codebook=[[1.0, 0.0, 0.0]], dim=3
        ).collect()
    }
    assert got[1][0] is True and got[1][1] == -1.0
    assert got[2][0] is False
    assert got[3][0] is False          # dropped via b even though cos(a,c) < T
    assert got[4][0] is True


def test_semdedup_only_compares_within_cluster(spark):
    """Near-identical vectors in DIFFERENT clusters are both kept — the
    documented IVF recall trade, pinned so it stays a deliberate
    property, not an accident."""
    from xtracted_crawlers_spark.operators import similarity

    # axis-aligned codebook: x-ish vectors -> cluster 0, y-ish -> 1
    rows = [
        (1, [1.0, 0.05]),
        (2, [0.05, 1.0]),
        (3, [0.06, 1.0]),  # ~identical to 2, same cluster -> dropped
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r.vec_id: (r.keep, r.cluster)
        for r in similarity.semdedup(
            df, threshold=0.95, codebook=[[1.0, 0.0], [0.0, 1.0]], dim=2
        ).collect()
    }
    assert got[1] == (True, 0)
    assert got[2] == (True, 1)
    assert got[3][0] is False and got[3][1] == 1


def test_semdedup_plan_no_python_and_equi_join(spark):
    from xtracted_crawlers_spark import plans
    from xtracted_crawlers_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = similarity.semdedup(emb, threshold=0.25, n_clusters=8, dim=64)
    pp = plans.physical_plan(out)
    assert plans.python_eval_nodes(out) == []
    # the quadratic piece must be an equi join on cluster, never a
    # cartesian/broadcast-nested-loop over the whole table
    assert "CartesianProduct" not in pp and "BroadcastNestedLoopJoin" not in pp


def test_c4_rules_each_rule_fires(spark):
    """Each C4 rule (Raffel et al. 2020 §2.2) flips its own minimal
    case. Line rules act through c4_clean (dropped lines vanish from
    the cleaned text); page rules act through c4_keep, measured AFTER
    line cleaning as in the paper."""
    good = "\n".join(
        ["this sentence ends with a period."] * 3
        + ["does this line ask a question?", "yes it surely does!"]
    )
    cases = {
        "pass": (good, True),
        "few_sentences": ("only one good sentence lives here.", False),
        "lorem": (good + "\nlorem ipsum dolor sit amet.", False),
        "brace": (good + "\ncode goes here { sometimes.", False),
        "blockword": (good + "\nbadword2 is not allowed here.", False),
        # line-dropped page killers: the killer line fails the LINE
        # rules, so the page survives (C4 order of operations)
        "lorem_line_dropped": (good + "\nlorem ipsum", True),
    }
    df = spark.createDataFrame(
        [(k, t) for k, (t, _) in cases.items()], "name string, text string"
    )
    got = {
        r["name"]: r["keep"]
        for r in df.select(
            "name", textops.c4_keep(F.col("text")).alias("keep")
        ).collect()
    }
    for name, (_, want) in cases.items():
        assert got[name] is want, name


def test_c4_clean_line_rules(spark):
    """c4_clean drops exactly: short lines (<3 words), lines without
    terminal punctuation, and lines containing 'javascript' (any case);
    survivors keep their bytes and order."""
    text = "\n".join(
        [
            "first kept line stays here.",
            "too short.",                          # <3 words
            "no terminal punctuation on this line", # bad ending
            "please enable JavaScript to view.",    # javascript
            'he said "stop right there."',          # quote terminal: kept
            "second kept line follows naturally!",
        ]
    )
    df = spark.createDataFrame([(text,)], "text string")
    out = df.select(textops.c4_clean(F.col("text")).alias("c")).collect()[0]["c"]
    assert out.split("\n") == [
        "first kept line stays here.",
        'he said "stop right there."',
        "second kept line follows naturally!",
    ]
    # pure projection: no Python nodes, no shuffle
    from xtracted_crawlers_spark import plans

    proj = df.select(
        textops.c4_clean(F.col("text")).alias("c"),
        textops.c4_keep(F.col("text")).alias("k"),
        *[c.alias(n) for n, c in textops.c4_stats(F.col("text")).items()],
    )
    assert plans.python_eval_nodes(proj) == []
    assert "Exchange" not in plans.physical_plan(proj)


def test_image_dhash_brightness_invariance(spark):
    """dHash is invariant to a constant brightness shift (all pairwise
    comparisons preserved) while the byte digest changes — the property
    the perceptual near-dup family exists for. Real BMP encode->decode
    round trip, no stub."""
    import numpy as np

    from xtracted_crawlers_spark.operators import multimodal

    x = np.arange(24)[None, :]
    y = np.arange(16)[:, None]
    base = ((7 * x + 11 * y + x * y) % 180).astype(np.uint8)
    rows = []
    for mid, off in [(1, 0), (2, 8)]:
        px = np.repeat((base + off)[:, :, None], 3, axis=2)
        rows.append((mid, "image", multimodal.encode_bmp(px), {}))
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in multimodal.image_dhash(media).collect()}
    assert got[1]["dhash"] == got[2]["dhash"]
    assert got[1]["digest"] != got[2]["digest"]
    assert (got[1]["width"], got[1]["height"]) == (24, 16)
    pairs = multimodal.dhash_near_dup(
        multimodal.image_dhash(media), max_hamming=7
    ).collect()
    assert len(pairs) == 1
    assert pairs[0]["hamming"] == 0 and pairs[0]["same_bytes"] is False


def test_image_dhash_undecodable_dropped_and_hamming(spark):
    """Undecodable bytes produce no hash row; a one-lattice-pixel edit
    yields a small positive hamming and the banded join still finds the
    pair (pigeonhole: hamming <= bands-1 guarantees a shared band)."""
    import numpy as np

    from xtracted_crawlers_spark.operators import multimodal

    x = np.arange(27)[None, :]
    y = np.arange(16)[:, None]
    base = (5 * x + 3 * y + x * y) % 180
    pert = base + np.where((x == (3 * 27) // 9) & (y == (2 * 16) // 8), 70, 0)
    rows = [
        (1, "image", multimodal.encode_bmp(np.repeat(base.astype(np.uint8)[:, :, None], 3, axis=2)), {}),
        (2, "image", multimodal.encode_bmp(np.repeat(pert.astype(np.uint8)[:, :, None], 3, axis=2)), {}),
        (3, "image", b"not an image at all", {}),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    hashes = multimodal.image_dhash(media)
    assert sorted(r["media_id"] for r in hashes.collect()) == [1, 2]
    pairs = multimodal.dhash_near_dup(hashes, max_hamming=7).collect()
    assert len(pairs) == 1
    assert 1 <= pairs[0]["hamming"] <= 2

    # band equi-join, never a cartesian / nested-loop over all pairs
    from xtracted_crawlers_spark import plans

    pp = plans.physical_plan(multimodal.dhash_near_dup(hashes))
    assert "CartesianProduct" not in pp
    assert "BroadcastNestedLoopJoin" not in pp
    # r6: the exploded band table is materialized once — without it the
    # image-decode mapInPandas lineage ran once per aliased join side
    assert "ExistingRDD" in pp, pp


def test_audio_features_real_wav_decode(spark):
    """PCM WAV round trip through the real numpy decode: statistics
    match a hand computation; stereo interleave and non-adjacent chunks
    decode; undecodable bytes produce no row."""
    import numpy as np

    from xtracted_crawlers_spark.operators import multimodal

    mono = np.array([0, 1000, -1000, 2000, -2000, 0], dtype="<i2")
    wav = multimodal.encode_wav(mono, sample_rate=8000)
    # splice an ignorable LIST chunk between fmt and data (word-aligned)
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + (4).to_bytes(4, "little") + b"INFO"
    spliced = wav[:fmt_end] + extra + wav[fmt_end:]
    stereo = np.array([100, -100, 200, -200], dtype="<i2")  # 2ch interleaved
    rows = [
        (1, "audio", wav, {}),
        (2, "audio", spliced, {}),
        (3, "audio", multimodal.encode_wav(stereo, 16000, n_channels=2), {}),
        (4, "audio", b"ID3\x03not really audio", {}),
        (5, "image", wav, {}),  # wrong kind: filtered before decode
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in multimodal.audio_features(media).collect()}
    assert sorted(got) == [1, 2, 3]
    exp_rms = round(float(np.sqrt((mono.astype(np.int64) ** 2).sum() / 6)), 4)
    for mid in (1, 2):  # chunk splice must not change any statistic
        r = got[mid]
        assert (r["sample_rate"], r["n_channels"], r["n_samples"]) == (8000, 1, 6)
        assert r["duration_ms"] == 0  # 6 samples @ 8 kHz -> floor(0.75ms)
        assert r["rms"] == exp_rms
        assert r["zero_crossings"] == 4  # >=0 flags 1,1,0,1,0,1 -> 4 flips
        assert r["peak"] == 2000
    s = got[3]
    assert (s["sample_rate"], s["n_channels"], s["n_samples"]) == (16000, 2, 2)
    assert s["peak"] == 200


def test_classifier_score_math_and_plan(spark):
    """Hashed n-gram linear classifier: score equals the hand-computed
    sigmoid over integer bucket weights (unigrams + bigrams, with
    multiplicity); empty text scores 0.0; the whole thing is map-only
    column expressions (no Python, no shuffle)."""
    import hashlib
    import math

    n_buckets = 16
    weights = [(b * 7 + 3) % 41 - 20 for b in range(n_buckets)]

    def bucket(f):
        return int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % n_buckets

    text = "Spark Filters The Web"
    toks = ["spark", "filters", "the", "web"]
    feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    s = sum(weights[bucket(f)] for f in feats)
    want = round(1.0 / (1.0 + math.exp(-(0.1 + s / (100.0 * len(feats))))), 4)

    df = spark.createDataFrame([(1, text), (2, "   ")], "doc_id long, text string")
    cols = textops.classifier_score(F.col("text"), weights, bias=0.1)
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", cols["n_feats"].alias("n"), cols["score"].alias("sc")
        ).collect()
    }
    assert got[1]["n"] == len(feats)
    assert got[1]["sc"] == want
    assert (got[2]["n"], got[2]["sc"]) == (0, 0.0)

    from xtracted_crawlers_spark import plans

    out = df.select(cols["score"].alias("sc"))
    assert plans.python_eval_nodes(out) == []
    assert "Exchange" not in plans.physical_plan(out)


# ---- positional postings + phrase search (operators/search.py) ------


def test_phrase_search_semantics(spark):
    from xtracted_crawlers_spark.operators import search

    docs = spark.createDataFrame(
        [
            (1, "a a a b"),           # 'a a' overlaps: 2 matches
            (2, "the table scan won"),
            (3, "table ... scan"),    # punctuation splits: still adjacent
            (4, "scan table"),        # wrong order: no match
            (5, "x"),                 # shorter than any 2-gram phrase
        ],
        "doc_id long, text string",
    )
    phrases = spark.createDataFrame(
        [("q1", "a a"), ("q2", "Table SCAN"), ("q3", "a"), ("q4", "zz yy")],
        "phrase_id string, phrase_text string",
    )
    got = {
        (r.phrase_id, r.doc_id): r.n_matches
        for r in search.phrase_search(docs, phrases).collect()
    }
    assert got == {
        ("q1", 1): 2,                 # overlapping occurrences both count
        ("q2", 2): 1,
        ("q2", 3): 1,                 # tokenizer strips punctuation
        ("q3", 1): 3,                 # single term == term frequency
    }


def test_positional_postings_positions(spark):
    from xtracted_crawlers_spark.operators import search

    d = spark.createDataFrame([(7, "b a b")], "doc_id long, text string")
    got = sorted(
        (r.term, r.pos) for r in search.positional_postings(d).collect()
    )
    assert got == [("a", 1), ("b", 0), ("b", 2)]


def test_pmi_collocations_match_pure_python(spark):
    """pmi_collocations vs a brute-force Counter twin on a small corpus
    with known structure: 'new york' is a strong collocation (always
    adjacent), 'the of' never occurs, and 'a a' has lift < 1."""
    import re
    from collections import Counter

    from xtracted_crawlers_spark.operators import collocations

    texts = [
        "new york is big and new york is loud",
        "I saw New York from a plane over new york",
        "a a a the cat the dog a the bird",
        "the cat saw a dog in new york",
    ] * 3
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {
        (r["w1"], r["w2"]): (r["n_pair"], r["n_w1"], r["n_w2"], r["lift"])
        for r in collocations.pmi_collocations(docs, min_count=2, top_k=1000).collect()
    }

    uni, big = Counter(), Counter()
    for t in texts:
        ws = re.findall(r"[a-z0-9]+", t.lower())
        uni.update(ws)
        big.update(zip(ws, ws[1:]))
    n = sum(uni.values())
    want = {
        (w1, w2): (c, uni[w1], uni[w2], round(n * c / (uni[w1] * uni[w2]), 4))
        for (w1, w2), c in big.items()
        if c >= 2
    }
    assert got == want
    assert got[("new", "york")][3] > 1.0  # genuine collocation
    assert ("the", "of") not in got
    # "new york" is always adjacent; "a a" only sometimes — lift ranks
    # the true collocation strictly above the incidental repetition
    # (111*15/15^2 = 7.4 vs 111*6/18^2 = 2.06 on this corpus).
    assert got[("new", "york")][3] > got[("a", "a")][3]


def test_pmi_collocations_topk_boundary_deterministic(spark):
    """Ties in lift at the k-boundary are broken by (w1, w2) — two runs
    and a permuted-input run return identical sets."""
    from xtracted_crawlers_spark.operators import collocations

    texts = [(i, "x y p q x y p q m n") for i in range(20)]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    a = collocations.pmi_collocations(docs, min_count=2, top_k=3).collect()
    b = collocations.pmi_collocations(
        spark.createDataFrame(list(reversed(texts)), "doc_id long, text string"),
        min_count=2,
        top_k=3,
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == 3


def test_pmi_collocations_tokenless_docs_do_not_crash(spark):
    """Empty/punctuation-only/non-Latin docs are routine in a web
    corpus; the bigram zip must not evaluate slice with length -1."""
    from xtracted_crawlers_spark.operators import collocations

    docs = spark.createDataFrame(
        [(1, ""), (2, "!!! ??? ..."), (3, "один два"), (4, "real words here real words here")],
        "doc_id long, text string",
    )
    rows = collocations.pmi_collocations(docs, min_count=2, top_k=10).collect()
    # (here, real) occurs once — below min_count
    assert {(r.w1, r.w2) for r in rows} == {("real", "words"), ("words", "here")}


def test_semdedup_and_lsh_materialize_selfjoin_input_once(spark):
    """r6: the assigned/normalized vectors (semdedup) and the SRP
    bucket table (near_dup_pairs_lsh) each feed both aliased sides of
    a self-join; aliased projections defeat exchange reuse, so the
    operators must materialize them once (localCheckpoint ->
    ExistingRDD scan in the executed plan)."""
    from xtracted_crawlers_spark.operators import similarity

    rows = [(i, [float((i * 7 + d) % 5) for d in range(8)]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for out in (
        similarity.semdedup(df, n_clusters=2, dim=8),
        similarity.near_dup_pairs_lsh(df, n_planes=2, n_tables=2, dim=8),
    ):
        pp = out._jdf.queryExecution().executedPlan().toString()
        assert "ExistingRDD" in pp, pp
