"""Extraction over the reference's locale fixtures
(/root/reference/tests/{en_GB,fr_FR,de_DE,ja_JP,ar_EG,en_AU,nl_BE}/ and
tests/variants/) — the engine must behave deterministically across
locales: asin from the #averageCustomerReviews attribute, bullets
stripped, variants from the twister blob where present."""

import glob
import os

import pytest

from xtracted_crawlers_spark import extract

REF = "/root/reference/tests"
LOCALE_PAGES = sorted(
    p
    for loc in ("en_GB", "fr_FR", "de_DE", "ja_JP", "ar_EG", "en_AU", "nl_BE")
    for p in glob.glob(f"{REF}/{loc}/*.html")
)


def _read(p):
    with open(p, encoding="utf-8", errors="replace") as f:
        return f.read()


@pytest.mark.parametrize("path", LOCALE_PAGES, ids=lambda p: "/".join(p.split("/")[-2:]))
def test_locale_page_extracts(path):
    html = _read(path)
    url = f"https://www.amazon.example/dp/B000000000"
    pj, text, err = extract.extract_one(url, html)
    if err is not None:
        # a locale capture may legitimately lack the reviews element;
        # the failure must then be the defined whole-URL failure
        assert "#averageCustomerReviews" in err
        return
    import json

    p = json.loads(pj)
    # asin attribute is a 10-char token when present
    if p["asin"] is not None:
        assert len(p["asin"]) == 10
    assert isinstance(p["feature_bullets"], list)
    for b in p["feature_bullets"]:
        assert b == b.strip() and b != ""
    assert isinstance(p["variants"], dict)
    assert text  # page text extraction never empty on real pages


def test_extraction_deterministic_across_runs():
    path = LOCALE_PAGES[0]
    html = _read(path)
    a = extract.extract_one("https://x/dp/B000000000", html)
    b = extract.extract_one("https://x/dp/B000000000", html)
    assert a == b


def test_2variants_fixture():
    html = _read(f"{REF}/variants/2variants.html")
    try:
        matrix = extract.extract_twister_matrix(html)
    except extract.ExtractionError:
        pytest.skip("2variants capture carries no parseable twister blob")
    v = extract.build_variants(matrix, "https://www.amazon.co.uk")
    if "variants" in v:
        assert all(x["url"].endswith("?psc=1") for x in v["variants"])
