"""Property-based tests (hypothesis) for the pure kernels — no Spark."""

import re
import string

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from xtracted_crawlers_spark import extract, urlnorm
from xtracted_crawlers_spark.scheduler import parse_robots
from xtracted_crawlers_spark.seen import _params, _positions

ASIN = st.builds(
    lambda p, body: p + body,
    st.sampled_from(["B0", "BT"]),
    st.text(alphabet=string.ascii_uppercase + string.digits, min_size=8, max_size=8),
)


@given(ASIN, st.text(alphabet=string.ascii_letters + string.digits + "=&%", max_size=30))
def test_url_id_query_insensitive(asin, query):
    base = f"https://shop.example.test/dp/{asin}"
    assert urlnorm.py_url_id(base) == asin
    assert urlnorm.py_url_id(f"{base}?{query}") == asin
    assert urlnorm.py_url_type(f"{base}?{query}") == "amazon_product"


@given(st.text(max_size=500))
def test_extract_text_canonical_form(html):
    t = extract.extract_text(html)
    assert t == t.strip()
    assert not re.search(r"\s\s", t)
    assert "\n" not in t and "\t" not in t


@given(st.text(max_size=300))
def test_parse_robots_total(txt):
    dis, allow, delay = parse_robots(txt)
    assert isinstance(dis, list)
    assert isinstance(allow, list)
    assert delay is None or isinstance(delay, float)


@given(
    st.dictionaries(
        st.sampled_from(
            ["num_total_variations", "current_asin", "parent_asin",
             "variationDisplayLabels", "other_junk"]
        ),
        st.one_of(st.integers(), st.text(max_size=10)),
        max_size=5,
    )
)
def test_build_variants_key_order_and_subset(matrix):
    v = extract.build_variants(matrix, None)
    allowed = ["variants_count", "current_asin", "parent_asin",
               "variationDisplayLabels", "variants"]
    keys = list(v.keys())
    assert keys == [k for k in allowed if k in keys]  # fixed insertion order
    assert "variants" not in v  # needs BOTH dimension keys


@given(
    st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), min_size=1, max_size=200),
    st.integers(min_value=100, max_value=5000),
)
@settings(max_examples=50)
def test_bloom_kernel_no_false_negatives(hashes, n):
    """Bit-kernel property: every inserted (h1,h2) pair tests positive."""
    m, k = _params(n, 0.01)
    h1 = np.array(hashes, dtype=np.int64)
    h2 = (h1 * np.int64(31)) ^ np.int64(0x9E3779B9)
    bits = np.zeros(m // 8, dtype=np.uint8)
    pos = _positions(h1, h2, k, m).ravel()
    np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    probe = _positions(h1, h2, k, m)
    assert bool(((bits[probe >> 3] >> (probe & 7)) & 1).all())


@given(st.binary(max_size=200))
def test_extract_one_total_on_garbage(blob):
    """The kernel never raises — any failure becomes an error string."""
    pj, tx, er = extract.extract_one(
        "https://x.test/dp/B012345678", blob.decode("utf-8", errors="replace")
    )
    assert (pj is None) == (er is not None)


@given(st.text(alphabet="abAB%0129fF/~*$? -", max_size=24))
def test_decode_robots_octets_total_and_idempotent(s):
    from xtracted_crawlers_spark.scheduler import decode_robots_octets

    d = decode_robots_octets(s)
    assert isinstance(d, str)
    assert decode_robots_octets(d) == d  # idempotent


@given(st.lists(st.integers(min_value=0x20, max_value=0x7E), max_size=8))
def test_decode_robots_octets_matches_unquote_on_decodables(octets):
    """For printable-ASCII octets outside the kept set the decode is
    exactly urllib.parse.unquote."""
    from urllib.parse import unquote

    from xtracted_crawlers_spark.scheduler import decode_robots_octets

    keep = {0x2F, 0x2A, 0x24, 0x25}
    octets = [o for o in octets if o not in keep]
    s = "/p" + "".join(f"%{o:02X}" for o in octets)
    assert decode_robots_octets(s) == unquote(s)
