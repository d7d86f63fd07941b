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
