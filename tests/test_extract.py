"""Golden extraction tests against the reference's own fixtures
(/root/reference/tests, read-only) and the captured twister blobs.

Pins (reference tests/test_amazon_async_product.py):
- happy path B0CX9DVZDP: asin == 'B0CX9DVZDP', url echoed with query,
  variants non-empty (lines 25-30);
- failure path B0BXD1PRJQ: missing #averageCustomerReviews element fails
  the whole URL (lines 48-60);
- variants shape: 5 keys when all twister fields present, per
  tests/sample.json / tests/_2variants.json.
"""

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from xtracted_crawlers_spark import extract

REF = "/root/reference/tests"


def _read(path: str) -> str:
    with open(path, encoding="utf-8", errors="replace") as f:
        return f.read()


@pytest.fixture(scope="module")
def happy_html():
    return _read(f"{REF}/asins/B0CX9DVZDP.html")


@pytest.fixture(scope="module")
def failing_html():
    return _read(f"{REF}/asins/B0BXD1PRJQ.html")


def test_extract_asin_happy(happy_html):
    assert extract.extract_asin(happy_html) == "B0CX9DVZDP"


def test_extract_asin_missing_element_raises(failing_html):
    with pytest.raises(extract.ExtractionError):
        extract.extract_asin(failing_html)


def test_extract_asin_missing_attribute_is_none():
    html = '<div id="averageCustomerReviews" data-ref="x">stars</div>'
    assert extract.extract_asin(html) is None


def test_extract_asin_all_reference_fixtures():
    """Every golden page except the failure fixture carries its own ASIN."""
    for path in sorted(glob.glob(f"{REF}/asins/*.html")):
        asin = os.path.basename(path)[:-5]
        html = _read(path)
        if asin == "B0BXD1PRJQ":
            with pytest.raises(extract.ExtractionError):
                extract.extract_asin(html)
        else:
            assert extract.extract_asin(html) == asin, path


def test_feature_bullets_strip_and_drop_empty(happy_html):
    bullets = extract.extract_feature_bullets(happy_html)
    assert len(bullets) >= 3
    for b in bullets:
        assert b == b.strip() and b != ""
    assert any("Flicker Free" in b for b in bullets)


def test_feature_bullets_synthetic_whitespace():
    html = (
        '<div id="feature-bullets"><ul>'
        "<li><span>  padded  </span></li>"
        "<li><span>\n\t</span></li>"  # empty after strip ⇒ dropped
        "<li>plain <b>nested&amp;</b> text</li>"
        "</ul></div>"
    )
    assert extract.extract_feature_bullets(html) == ["padded", "plain nested& text"]


def test_feature_bullets_absent_div():
    assert extract.extract_feature_bullets("<html><body>no bullets</body></html>") == []


def test_build_variants_sample_json():
    matrix = json.load(open(f"{REF}/sample.json"))
    v = extract.build_variants(matrix, "http://localhost:1234")
    assert len(v) == 5  # pinned by reference test line 30
    assert list(v.keys()) == [
        "variants_count",
        "current_asin",
        "parent_asin",
        "variationDisplayLabels",
        "variants",
    ]
    assert v["variants_count"] == matrix["num_total_variations"]
    assert v["current_asin"] == matrix["current_asin"]
    assert v["parent_asin"] == matrix["parent_asin"]
    # variant order = JSON key order of dimensionValuesDisplayData
    expected_order = list(matrix["dimensionValuesDisplayData"].keys())
    assert [x["asin"] for x in v["variants"]] == expected_order
    # detail: one {dimensionLabel: value} per dimension
    dims = matrix["dimensionsDisplay"]
    first = v["variants"][0]
    assert first["detail"] == [
        {dims[i]: matrix["dimensionValuesDisplayData"][first["asin"]][i]}
        for i in range(len(dims))
    ]
    assert first["url"] == f"http://localhost:1234/dp/{first['asin']}?psc=1"


def test_build_variants_2variants_json():
    matrix = json.load(open(f"{REF}/_2variants.json"))
    v = extract.build_variants(matrix, None)
    # root None ⇒ '' prefix (reference amazon_async_product.py:62)
    assert all(x["url"] == f"/dp/{x['asin']}?psc=1" for x in v["variants"])


def test_build_variants_partial_matrix():
    v = extract.build_variants({"num_total_variations": 3}, "https://a.com")
    assert v == {"variants_count": 3}
    assert extract.build_variants({}, None) == {}


def test_variants_optional_never_fatal():
    html = '<div id="averageCustomerReviews" data-asin="B012345678"></div>'
    payload = extract.extract_payload("https://x.com/dp/B012345678", html)
    assert payload["variants"] == {}


def test_payload_shape_and_key_order(happy_html):
    url = "http://localhost:9999/dp/B0CX9DVZDP?x=foo&bar=y"
    payload = extract.extract_payload(url, happy_html)
    assert list(payload.keys()) == ["asin", "feature_bullets", "url", "variants"]
    assert payload["asin"] == "B0CX9DVZDP"
    assert payload["url"] == url  # query preserved
    j = extract.payload_to_json(payload)
    assert json.loads(j) == payload
    # default separators, no indent (context.py:141 byte format)
    assert ", " in j and ": " in j and "\n" not in j


def test_extract_text_deterministic_and_clean():
    html = (
        "<html><head><script>var x=1;</script><style>.a{}</style></head>"
        "<body><h1>Title&nbsp;A</h1>\n\n<p>two   words</p></body></html>"
    )
    t = extract.extract_text(html)
    assert "var x" not in t and ".a{}" not in t
    # nbsp is unicode whitespace ⇒ collapsed like any other run
    assert t == "Title A two words"
    assert extract.extract_text(html) == t


def test_extract_one_error_is_repr(failing_html):
    pj, tx, er = extract.extract_one("http://x/dp/B0BXD1PRJQ", failing_html)
    assert pj is None and tx is None
    assert er.startswith("ExtractionError(")


def test_extract_udf_matches_python_mirror(spark, happy_html, failing_html):
    """Byte-identical invariant: the Arrow UDF output equals the pure-Python
    mirror for every (url, html) — including binary html input."""
    rows = [
        ("http://localhost:1/dp/B0CX9DVZDP?x=foo&bar=y", happy_html.encode()),
        ("http://localhost:1/dp/B0BXD1PRJQ?x=foo&bar=y", failing_html.encode()),
        ("http://localhost:1/dp/B012345678", b"<html><body>not a product</body></html>"),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = extract.with_extraction(df).select("url", "payload_json", "text", "error", "data").collect()
    by_url = {r["url"]: r for r in out}
    for url, html in rows:
        pj, tx, er = extract.extract_one(url, html.decode())
        r = by_url[url]
        assert r["payload_json"] == pj
        assert r["text"] == tx
        assert r["error"] == er
        if pj is not None:
            assert r["data"]["asin"] == json.loads(pj)["asin"]


def test_typed_struct_roundtrip(spark, happy_html):
    """from_json(payload_json) recovers the full nested structure."""
    df = spark.createDataFrame(
        [("http://localhost:1/dp/B0CX9DVZDP", happy_html.encode())], "url string, html binary"
    )
    row = extract.with_extraction(df).select("data").first()["data"]
    assert row["asin"] == "B0CX9DVZDP"
    assert isinstance(row["feature_bullets"], list) and row["feature_bullets"]


def _differential(spark, rows):
    """Both with_extraction paths must equal the pure-Python kernel
    byte-for-byte on every row. rows: [(url, html_bytes)]."""
    df = spark.createDataFrame(rows, "url string, html binary")
    for presliced in (True, False):
        got = {
            r["url"]: r
            for r in extract.with_extraction(df, presliced=presliced)
            .select("url", "payload_json", "text", "error")
            .collect()
        }
        for url, html in rows:
            pj, tx, er = extract.extract_one(url, html.decode("utf-8", errors="replace"))
            r = got[url]
            assert r["payload_json"] == pj, (presliced, url)
            assert r["text"] == tx, (presliced, url)
            assert r["error"] == er, (presliced, url)


def test_sliced_differential_reference_fixtures(spark):
    """The pre-sliced hot path (round-3 verdict #4) over EVERY real
    reference page == the full-html kernel, byte-for-byte."""
    files = sorted(glob.glob(f"{REF}/asins/*.html"))
    assert len(files) >= 20
    rows = []
    for f in files:
        asin = os.path.basename(f)[:-5]
        with open(f, "rb") as fh:
            rows.append((f"https://www.amazon.co.uk/dp/{asin}", fh.read()))
    _differential(spark, rows)


def test_sliced_differential_adversarial(spark):
    """Pages built to break every slice: oversized / unbalanced regions
    force the needs_full fallback, which must be byte-identical too."""
    acr = '<span id="averageCustomerReviews" data-asin="B000TEST01"></span>'
    tw = (
        '<script>var dataToReturn = {"num_total_variations": 2,'
        '"current_asin": "B000TEST01", "parent_asin": "B000TEST00",'
        '"variationDisplayLabels": {"size": "Size"},'
        '"dimensionsDisplay": ["Size"],'
        '"dimensionValuesDisplayData": {"B000TEST01": ["S"], "B000TEST02": ["M"]}};'
        "</script>"
    )
    big_bullets = (
        acr + '<div id="feature-bullets"><ul>'
        + "".join(f"<li>bullet {i} &amp; co</li>" for i in range(8000))
        + "</ul></div>" + tw
    )  # element >> FB_SLICE_K: balanced scan runs off the slice
    unbalanced = acr + '<div id="feature-bullets"><ul><li>one<li>two' + tw
    sq_marker = acr + "<div id='feature-bullets'><ul><li>only &lt;li&gt;</li></ul></div>"
    huge_matrix = ",".join(
        f'"B{i:09d}": ["v{i}"]' for i in range(20000)
    )  # blob >> TW_SLICE_K: raw_decode runs off the clipped slice
    big_twister = (
        acr + '<div id="feature-bullets"><ul><li>x</li></ul></div>'
        + '<script>var dataToReturn = {"num_total_variations": 20000,'
        '"dimensionsDisplay": ["Size"], "dimensionValuesDisplayData": {'
        + huge_matrix + "}};</script>" + "<p>tail pad</p>" * 40000
    )
    two_blobs = (
        acr + "<script>var dataToReturn = {'not': 'the one'};</script>"
        + "<div>filler</div>" + tw
    )
    no_acr = '<div id="feature-bullets"><ul><li>never read</li></ul></div>' + tw
    entity_soup = (
        acr + '<div id="feature-bullets"><ul><li>&lt;&amp;&#39;&nbsp;&bogus; x</li></ul></div>'
        + "<p>Caf&eacute; &copy; &#x1F600; text</p>"
    )
    marker_in_script = (
        acr + '<script>var s = "id=\\"feature-bullets\\"";</script>'
        + '<div id="feature-bullets"><ul><li>real</li></ul></div>'
    )
    cases = {
        "https://h.test/dp/A1": big_bullets.encode(),
        "https://h.test/dp/A2": unbalanced.encode(),
        "https://h.test/dp/A3": sq_marker.encode(),
        "https://h.test/dp/A4": big_twister.encode(),
        "https://h.test/dp/A5": two_blobs.encode(),
        "https://h.test/dp/A6": no_acr.encode(),
        "https://h.test/dp/A7": entity_soup.encode(),
        "https://h.test/dp/A8": marker_in_script.encode(),
        # invalid UTF-8: JVM replacement decode differs from Python's
        # byte-wise 'replace' — must route through the full kernel
        "https://h.test/dp/A9": (acr + "<p>bad \xff\xfe bytes</p>").encode(
            "utf-8", errors="ignore"
        ) + b"\xff\xfe" + tw.encode(),
    }
    _differential(spark, sorted(cases.items()))


def test_sliced_differential_synthetic_corpus(spark):
    """Sliced == full over a slice of the generated bench corpus."""
    from xtracted_crawlers_spark import fixtures

    pages = fixtures.gen_pages(spark, 3000, n_hosts=40, zipf=2.0)
    rows = [
        (r["url"], r["html"] if isinstance(r["html"], bytes) else r["html"].encode())
        for r in pages.select("url", "html").collect()
    ]
    _differential(spark, rows)


def test_sliced_fallback_is_rare_on_corpus(spark):
    """The needs_full fallback must not silently swallow the hot path:
    on the well-formed synthetic corpus, zero rows may need it."""
    from xtracted_crawlers_spark import fixtures
    from pyspark.sql import functions as FF

    pages = fixtures.gen_pages(spark, 2000, n_hosts=40, zipf=2.0)
    df = pages.withColumn("_h", FF.col("html").cast("string"))
    sliced = extract.extract_sliced_udf(
        FF.col("url"), *extract.sliced_inputs(FF.col("_h"))
    )
    n_full = df.withColumn("_s", sliced).filter(FF.col("_s.needs_full")).count()
    assert n_full == 0
