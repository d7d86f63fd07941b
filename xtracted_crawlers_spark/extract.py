"""HTML extraction — SURVEY.md §2 D1-D6, re-expressed for static HTML.

The reference extracts with a headless browser
(/root/reference/xtracted/crawlers/amazon/amazon_async_product.py):

- D2 asin: ``#averageCustomerReviews`` first element's ``data-asin``
  attribute (amazon_async_product.py:68-71). A *missing element* raises
  (locator timeout) and fails the whole URL — pinned by the B0BXD1PRJQ
  fixture + /root/reference/tests/test_amazon_async_product.py:48-60.
  A present element with a *missing attribute* yields asin=None.
- D3 feature bullets: text of every ``#feature-bullets ul li``, stripped,
  empty strings dropped (amazon_async_product.py:73-79).
- D4 variants: fields of the twister matrix JSON, assembled in a fixed key
  order with synthesized ``{root_url}/dp/{asin}?psc=1`` URLs
  (amazon_async_product.py:28-66). On any failure: ``{}`` — variants are
  optional and never fatal (amazon_async_product.py:81-91).
- payload assembly + JSON serialization with dict insertion order and
  ``json.dumps`` default separators (amazon_async_product.py:93-104,
  context.py:141) — this is the byte-identical invariant.

Here the browser is replaced by a static-HTML parse: the pages corpus (an
Iceberg/parquet table of Common-Crawl-style captures) IS the web, and
"fetch" is a join. The twister matrix is read from the ``var dataToReturn =
{...}`` script blob that carries ``dimensionValuesDisplayData`` (there is
exactly one such blob per product page; a real one sits at
/root/reference/tests/asins/B0CX9DVZDP.html:6940).

Hot path = ONE Arrow-batched pandas UDF (``extract_udf``) returning flat
strings (payload_json / text / error); the typed payload struct is
recovered JVM-side with ``from_json`` so Arrow never has to move nested
struct-of-array-of-map batches. The pure-Python functions below double as
the golden-oracle mirror used by tests. (Batch-transfer UDF execution over
columnar data — vs row-at-a-time Python — follows the design argument in
"Accelerating Python UDFs in Vectorized Query Execution", CIDR'22; see
PAPERS.md.)
"""

from __future__ import annotations

import json
import re
from functools import lru_cache
from html import unescape
from html.parser import HTMLParser
from typing import Any, Optional

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .urlnorm import py_root_url

# ---------------------------------------------------------------------------
# Typed payload schema (SURVEY.md §1.3 / FIXTURES.md §5)
# ---------------------------------------------------------------------------

VARIANT_SCHEMA = T.StructType(
    [
        T.StructField("asin", T.StringType()),
        T.StructField("detail", T.ArrayType(T.MapType(T.StringType(), T.StringType()))),
        T.StructField("url", T.StringType()),
    ]
)

VARIANTS_SCHEMA = T.StructType(
    [
        T.StructField("variants_count", T.IntegerType()),
        T.StructField("current_asin", T.StringType()),
        T.StructField("parent_asin", T.StringType()),
        T.StructField("variationDisplayLabels", T.MapType(T.StringType(), T.StringType())),
        T.StructField("variants", T.ArrayType(VARIANT_SCHEMA)),
    ]
)

PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("asin", T.StringType()),
        T.StructField("feature_bullets", T.ArrayType(T.StringType())),
        T.StructField("url", T.StringType()),
        T.StructField("variants", VARIANTS_SCHEMA),
    ]
)

EXTRACT_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("payload_json", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)


class ExtractionError(Exception):
    """Raised when a required element is absent — the whole-URL failure
    path (mirrors the reference's locator timeout on a missing
    #averageCustomerReviews)."""


# ---------------------------------------------------------------------------
# D2: asin attribute
# ---------------------------------------------------------------------------

# `id="averageCustomerReviews"` must be the `id` attribute itself, not a
# substring of another attribute (`data-csa-c-content-id="average..."`
# appears on pages that LACK the element — the B0BXD1PRJQ failure fixture).
_ACR_TAG_RE = re.compile(
    r"""<[^>]*\sid\s*=\s*["']averageCustomerReviews["'][^>]*>""", re.IGNORECASE
)
_DATA_ASIN_RE = re.compile(r"""\sdata-asin\s*=\s*(?:"([^"]*)"|'([^']*)')""", re.IGNORECASE)


def extract_asin(html: str) -> Optional[str]:
    """data-asin of the first #averageCustomerReviews element.

    Missing element ⇒ ExtractionError (URL fails, reference D2);
    missing attribute ⇒ None (payload carries asin null).
    """
    m = _ACR_TAG_RE.search(html)
    if m is None:
        raise ExtractionError("locator '#averageCustomerReviews' not found")
    a = _DATA_ASIN_RE.search(m.group(0))
    if a is None:
        return None
    return unescape(a.group(1) if a.group(1) is not None else a.group(2))


# ---------------------------------------------------------------------------
# D3: feature bullets (#feature-bullets ul li)
# ---------------------------------------------------------------------------


class _BulletParser(HTMLParser):
    """Collects textContent of every li inside a ul inside the element with
    id=feature-bullets. Entity references are decoded (convert_charrefs),
    matching DOM textContent."""

    _VOID = {
        "area", "base", "br", "col", "embed", "hr", "img", "input",
        "link", "meta", "param", "source", "track", "wbr",
    }

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.bullets: list[str] = []
        self._stack: list[str] = []  # open tags inside the target element
        self._in_target = False
        self._ul_depth = 0
        self._li_depth = 0
        self._buf: list[str] = []

    def handle_starttag(self, tag: str, attrs: list) -> None:
        if not self._in_target:
            for k, v in attrs:
                if k == "id" and v == "feature-bullets":
                    self._in_target = True
                    self._stack = [tag]
                    return
            return
        if tag in self._VOID:
            return
        if tag == "li" and self._ul_depth > 0:
            if self._li_depth > 0:
                # implicit </li> before a sibling <li>
                self._flush_li()
            self._li_depth += 1
        elif tag == "ul":
            self._ul_depth += 1
        self._stack.append(tag)

    class Done(Exception):
        """Raised to abort parsing once the target element closes — the
        rest of a multi-MB document need not be scanned."""

    def handle_endtag(self, tag: str) -> None:
        if not self._in_target:
            return
        if tag in self._stack:
            while self._stack:
                popped = self._stack.pop()
                if popped == "li" and self._li_depth > 0:
                    self._flush_li()
                    self._li_depth -= 1
                elif popped == "ul" and self._ul_depth > 0:
                    self._ul_depth -= 1
                if popped == tag:
                    break
        if not self._stack:
            self._in_target = False
            raise _BulletParser.Done()

    def handle_data(self, data: str) -> None:
        if self._in_target and self._li_depth > 0:
            self._buf.append(data)

    def _flush_li(self) -> None:
        text = "".join(self._buf).strip()
        self._buf = []
        if text:
            self.bullets.append(text)


_LI_OPEN_RE = re.compile(r"(?i)<li\b[^>]*>")
_LI_CLOSE_RE = re.compile(r"(?i)</li")
_UL_OPEN_RE = re.compile(r"(?i)<ul\b")
_TAG_NAME_RE = re.compile(r"<\s*([a-zA-Z][a-zA-Z0-9]*)")
_INNER_TAG_RE = re.compile(r"<[^>]*>")


@lru_cache(maxsize=64)
def _tag_token_re(tag: str) -> "re.Pattern[str]":
    return re.compile(rf"(?i)<(/?){re.escape(tag)}\b")


def _balanced_element_end(html: str, start: int, tag: str) -> int:
    """End index (exclusive) of the element whose open tag starts at
    ``start``, by counting same-name open/close tags. -1 if unbalanced."""
    token = _tag_token_re(tag)
    depth = 0
    for m in token.finditer(html, start):
        if m.group(1):
            depth -= 1
            if depth == 0:
                close = html.find(">", m.end())
                return close + 1 if close >= 0 else len(html)
        else:
            depth += 1
    return -1


def extract_feature_bullets(html: str) -> list[str]:
    """Stripped non-empty textContent of each '#feature-bullets ul li'
    (leaf li items). Regex + balanced-scan fast path (~2x the HTMLParser
    walk); falls back to the HTMLParser for a region it can't bound."""
    i = html.find('id="feature-bullets"')
    if i < 0:
        i = html.find("id='feature-bullets'")
        if i < 0:
            return []
    start = html.rfind("<", 0, i)
    tag_m = _TAG_NAME_RE.match(html, start)
    region_end = (
        _balanced_element_end(html, start, tag_m.group(1)) if tag_m else -1
    )
    if region_end < 0:
        return _bullets_htmlparser(html, start)
    region = html[start:region_end]
    bullets: list[str] = []
    # ul sub-regions inside the element, then leaf li items inside each
    pos = 0
    while True:
        um = _UL_OPEN_RE.search(region, pos)
        if not um:
            break
        ul_start = um.start()
        ul_end = _balanced_element_end(region, ul_start, "ul")
        if ul_end < 0:
            return _bullets_htmlparser(html, start)
        ul_region = region[ul_start:ul_end]
        parts = _LI_OPEN_RE.split(ul_region)[1:]
        for p in parts:
            p = _LI_CLOSE_RE.split(p, 1)[0]
            text = unescape(_INNER_TAG_RE.sub("", p)).strip()
            if text:
                bullets.append(text)
        pos = ul_end
    return bullets


def _bullets_htmlparser(html: str, start: int) -> list[str]:
    p = _BulletParser()
    try:
        p.feed(html[start:])
        p.close()
    except _BulletParser.Done:
        pass  # target element fully consumed — early stop
    except Exception:
        pass
    return p.bullets


# ---------------------------------------------------------------------------
# D4/D5: twister variants matrix
# ---------------------------------------------------------------------------

_TWISTER_KEYS = (
    "num_total_variations",
    "current_asin",
    "parent_asin",
    "variationDisplayLabels",
    "dimensionsDisplay",
    "dimensionValuesDisplayData",
)
_TWISTER_KEY_RES = {k: re.compile(r'"%s"\s*:' % re.escape(k)) for k in _TWISTER_KEYS}
_JSON_DECODER = json.JSONDecoder()


def _balanced_json_value(s: str, start: int) -> Optional[str]:
    """Return the JSON value beginning at s[start] (object/array/string/
    scalar) using a string-aware bracket scan."""
    n = len(s)
    while start < n and s[start] in " \t\r\n":
        start += 1
    if start >= n:
        return None
    c = s[start]
    if c in "{[":
        depth = 0
        in_str = False
        esc = False
        for k in range(start, n):
            ch = s[k]
            if in_str:
                if esc:
                    esc = False
                elif ch == "\\":
                    esc = True
                elif ch == '"':
                    in_str = False
                continue
            if ch == '"':
                in_str = True
            elif ch in "{[":
                depth += 1
            elif ch in "}]":
                depth -= 1
                if depth == 0:
                    return s[start : k + 1]
        return None
    if c == '"':
        esc = False
        for k in range(start + 1, n):
            ch = s[k]
            if esc:
                esc = False
            elif ch == "\\":
                esc = True
            elif ch == '"':
                return s[start : k + 1]
        return None
    m = re.match(r"-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?|true|false|null", s[start:])
    return m.group(0) if m else None


def extract_twister_matrix(html: str) -> dict[str, Any]:
    """Parse the twister init blob out of static HTML.

    Finds the script region around the single occurrence of
    ``dimensionValuesDisplayData``; tries a whole-blob ``json.loads`` first
    (our synthetic pages embed pure JSON), then falls back to per-key
    balanced-scan extraction (real Amazon blobs contain JS string
    concatenation that is not valid JSON). Raises if the blob is absent —
    callers convert that to the ``{}`` optional-variants path (D5).
    """
    anchor = html.find("dimensionValuesDisplayData")
    if anchor < 0:
        raise ExtractionError("twister blob not found")
    blob_start = html.rfind("var dataToReturn", 0, anchor)
    if blob_start < 0:
        blob_start = max(0, anchor - 2_000_000)
    brace = html.find("{", blob_start)
    # valid-JSON fast path: raw_decode parses one value starting at the
    # brace in C, replacing the Python char-by-char balanced scan + a
    # second json.loads pass. A valid blob yields the identical dict (a
    # balanced-scan span of valid JSON IS the raw_decode span); anything
    # invalid raises and falls through to the original scan + per-key path.
    if brace >= 0:
        try:
            parsed, _ = _JSON_DECODER.raw_decode(html, brace)
            if isinstance(parsed, dict):
                return parsed
        except ValueError:
            pass
    blob = _balanced_json_value(html, brace)
    # per-key fallback over the blob region
    region = blob if blob is not None else html[blob_start : anchor + 2_000_000]
    out: dict[str, Any] = {}
    for key in _TWISTER_KEYS:
        m = _TWISTER_KEY_RES[key].search(region)
        if not m:
            continue
        raw = _balanced_json_value(region, m.end())
        if raw is None:
            continue
        try:
            out[key] = json.loads(raw)
        except (json.JSONDecodeError, ValueError):
            continue
    if not out:
        raise ExtractionError("twister blob unparseable")
    return out


def build_variants(matrix: dict[str, Any], root: Optional[str]) -> dict[str, Any]:
    """Assemble the variants payload from a twister matrix dict.

    Field-for-field mirror of the reference's semantics
    (amazon_async_product.py:40-66): conditional key presence, key order
    (variants_count, current_asin, parent_asin, variationDisplayLabels,
    variants), one ``{dimensionLabel: value}`` map per dimension in
    ``detail``, variant order = JSON key order of
    ``dimensionValuesDisplayData``, synthesized
    ``{root}/dp/{asin}?psc=1`` URLs ('' when root is None).
    """
    result: dict[str, Any] = {}
    if "num_total_variations" in matrix:
        result["variants_count"] = matrix["num_total_variations"]
    if "current_asin" in matrix:
        result["current_asin"] = matrix["current_asin"]
    if "parent_asin" in matrix:
        result["parent_asin"] = matrix["parent_asin"]
    if "variationDisplayLabels" in matrix:
        result["variationDisplayLabels"] = matrix["variationDisplayLabels"]
    if "dimensionValuesDisplayData" in matrix and "dimensionsDisplay" in matrix:
        variants = []
        dims = matrix["dimensionsDisplay"]
        for asin, values in matrix["dimensionValuesDisplayData"].items():
            detail = [{dims[i]: values[i]} for i in range(len(dims))]
            variants.append(
                {
                    "asin": asin,
                    "detail": detail,
                    "url": f'{"" if root is None else root}/dp/{asin}?psc=1',
                }
            )
        result["variants"] = variants
    return result


def extract_variations_matrix(html: str, root: Optional[str]) -> dict[str, Any]:
    """D5: variants are optional — any failure yields {} (never fatal)."""
    try:
        return build_variants(extract_twister_matrix(html), root)
    except Exception:
        return {}


# ---------------------------------------------------------------------------
# D6: payload assembly + page text
# ---------------------------------------------------------------------------


def extract_payload(url: str, html: str) -> dict[str, Any]:
    """Full payload dict in reference key order; raises ExtractionError on
    the required-element failure path."""
    asin = extract_asin(html)  # raises on missing element
    bullets = extract_feature_bullets(html)
    variants = extract_variations_matrix(html, py_root_url(url))
    return {
        "asin": asin,
        "feature_bullets": bullets,
        "url": url,
        "variants": variants,
    }


def payload_to_json(payload: dict[str, Any]) -> str:
    """json.dumps with default separators + insertion order — the exact
    serialization the reference persists (context.py:141)."""
    return json.dumps(payload)


# Visible-text extraction, regex pipeline (~8x faster than an HTMLParser
# walk, which profiling showed at 85% of the kernel). Semantics (the
# engine-wide definition of "extracted text", shared by the corpus
# generator, the Arrow UDF, and the parity simulator):
#   script/style/template/noscript bodies and comments dropped; every tag
#   boundary is a whitespace separator; entities decoded; whitespace runs
#   collapsed to single spaces; stripped.
_SKIP_BLOCK_RE = re.compile(
    r"(?is)<(script|style|template|noscript)\b[^>]*>.*?</\1\s*>"
)
_COMMENT_RE = re.compile(r"(?s)<!--.*?-->")
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")


def extract_text(html: str) -> str:
    no_blocks = _SKIP_BLOCK_RE.sub(" ", html)
    no_comments = _COMMENT_RE.sub(" ", no_blocks)
    no_tags = _TAG_RE.sub(" ", no_comments)
    return _WS_RE.sub(" ", unescape(no_tags)).strip()


def extract_one(url: str, html: str) -> tuple[Optional[str], Optional[str], Optional[str]]:
    """(payload_json, text, error) for one page — the per-row kernel both
    the Arrow UDF and the golden oracle share."""
    try:
        payload = extract_payload(url, html)
        return payload_to_json(payload), extract_text(html), None
    except Exception as e:  # reference stores repr(error) (context.py:100)
        return None, None, repr(e)


# ---------------------------------------------------------------------------
# Pre-sliced kernel (JVM cuts bytes into Python; round-3 verdict #4)
# ---------------------------------------------------------------------------
# The full-html kernel ships the whole page through Arrow and re-scans it
# in Python. But the payload only ever reads three bounded regions (the
# #averageCustomerReviews tag, the #feature-bullets element, the twister
# blob) and the text pipeline's first three regex passes (script/comment/
# tag removal) are pure Java-regex-expressible. So this path slices
# JVM-side and Python receives ~KBs per row (slices + de-tagged text)
# instead of the full page.
#
# MEASURED RESULT (round 4, this sandbox): the sliced path is SLOWER
# than the full kernel on BOTH corpus shapes — 86k vs 179k urls/s on the
# 1.2 KB synthetic bench pages and ~35 vs ~45 urls/s on the 2.3 MB real
# reference pages (interleaved A/B, 32 cores). Root cause: every Spark
# string expression (regexp_extract / instr / substr / regexp_replace)
# converts the UTF8String input to a java.lang.String PER INVOCATION —
# the ~8 slicing expressions re-decode and copy the page ~8x (observed
# as GCLocker alloc stalls on MB pages), which costs more than the
# Arrow transfer + Python scan they avoid; Arrow moves MB/row in
# microseconds, so bytes-into-Python was not the binding constraint.
# with_extraction therefore DEFAULTS to the full kernel; the sliced
# path stays available (presliced=True), byte-identical and fully
# tested, for environments where the Python side, not the JVM, is the
# scarce resource (e.g. few python workers per executor, or a cluster
# where Arrow IPC crosses a real network).
#
# Byte-identity is guaranteed by construction, not hope: every slice
# mirrors the Python kernel's own find/rfind logic exactly (see the
# per-column notes below), and whenever a slice CANNOT prove it contains
# everything the full kernel would have read (balanced scan runs off the
# slice end, clipped twister region, U+FFFD in the JVM decode — where
# Java and Python replacement-decoding can differ), the row sets
# needs_full and is re-extracted by the unchanged full-html UDF in a
# masked second pass (nulls for the common rows, so Arrow ships almost
# nothing). tests/test_extract.py runs the sliced path differentially
# against extract_one on the reference fixtures, the synthetic corpus
# and adversarial pages.

# JVM twins of the Python patterns. Java needs explicit Unicode flags to
# match Python re semantics: (?U) = UNICODE_CHARACTER_CLASS makes \s/\b
# Unicode-aware (Python's default on str) and implies UNICODE_CASE for
# (?i).
_ACR_PATTERN_JVM = "(?iU)<[^>]*\\sid\\s*=\\s*[\"']averageCustomerReviews[\"'][^>]*>"
_SKIP_BLOCK_JVM = "(?isU)<(script|style|template|noscript)\\b[^>]*>.*?</\\1\\s*>"
_COMMENT_JVM = "(?s)<!--.*?-->"
_TAG_JVM = "<[^>]*>"

FB_SLICE_K = 65_536  # chars kept past the feature-bullets marker
TW_SLICE_K = 262_144  # chars kept past the twister anchor
_TW_BACK = 2_000_000  # the kernel's own backward reach for the blob start

SLICED_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("payload_json", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("error", T.StringType()),
        T.StructField("needs_full", T.BooleanType()),
    ]
)


def _detag_jvm(h: Column) -> Column:
    """extract_text's first three passes (block/comment/tag removal) as
    JVM regexp_replace; Python finishes with unescape + whitespace
    collapse on the (much smaller) result — same order as extract_text,
    so the bytes are identical."""
    nb = F.regexp_replace(h, _SKIP_BLOCK_JVM, " ")
    nc = F.regexp_replace(nb, _COMMENT_JVM, " ")
    return F.regexp_replace(nc, _TAG_JVM, " ")


def _twister_slice_jvm(h: Column) -> tuple[Column, Column, Column]:
    """(tw_has, slice, clipped): the region the kernel's twister scan
    reads, starting exactly where the kernel starts — the LAST
    'var dataToReturn' before the FIRST anchor (greedy-.* regexp = rfind)
    or, absent that, the kernel's max(0, anchor-2MB) back-window — and
    extending TW_SLICE_K past the anchor. clipped = the forward window
    ends before the document does (parse running off the slice end then
    means needs_full; unclipped means the slice IS the document tail and
    the replay is exact)."""
    pos = F.instr(h, "dimensionValuesDisplayData")
    has = pos > 0
    prefix = h.substr(F.lit(1), F.greatest(pos - 1, F.lit(0)))
    last_dtr = F.regexp_extract(prefix, "(?s).*(var dataToReturn.*)", 1)
    back = prefix.substr(
        F.greatest(F.lit(1), F.length(prefix) - F.lit(_TW_BACK - 1)), F.lit(_TW_BACK)
    )
    fwd = h.substr(pos, F.lit(TW_SLICE_K))
    sl = F.when(~has, F.lit("")).when(last_dtr != "", F.concat(last_dtr, fwd)).otherwise(
        F.concat(back, fwd)
    )
    clipped = (pos - 1 + TW_SLICE_K) < F.length(h)
    return has, sl, clipped


def _bullets_from_slice(
    fb_dq: str, dq_has: bool, fb_sq: str, sq_has: bool
) -> tuple[list[str], bool]:
    """(bullets, needs_full). The slice starts at the last '<' before the
    first marker — exactly the kernel's rfind — so the replay below IS
    extract_feature_bullets with shifted offsets. Any path the full
    kernel would hand to the whole-document HTMLParser walk (unbalanced
    element/ul) sets needs_full instead."""
    if dq_has:
        sl, marker = fb_dq, 'id="feature-bullets"'
    elif sq_has:
        sl, marker = fb_sq, "id='feature-bullets'"
    else:
        return [], False
    if not sl:
        return [], True  # marker present but no preceding '<' — pathological
    i = sl.find(marker)
    if i < 0:
        return [], True
    start = sl.rfind("<", 0, i)
    tag_m = _TAG_NAME_RE.match(sl, start)
    region_end = _balanced_element_end(sl, start, tag_m.group(1)) if tag_m else -1
    if region_end < 0:
        return [], True
    region = sl[start:region_end]
    bullets: list[str] = []
    pos = 0
    while True:
        um = _UL_OPEN_RE.search(region, pos)
        if not um:
            break
        ul_start = um.start()
        ul_end = _balanced_element_end(region, ul_start, "ul")
        if ul_end < 0:
            return [], True
        ul_region = region[ul_start:ul_end]
        parts = _LI_OPEN_RE.split(ul_region)[1:]
        for p in parts:
            p = _LI_CLOSE_RE.split(p, 1)[0]
            text = unescape(_INNER_TAG_RE.sub("", p)).strip()
            if text:
                bullets.append(text)
        pos = ul_end
    return bullets, False


def _twister_from_slice(tw: str, clipped: bool) -> tuple[Optional[dict], bool]:
    """(matrix, needs_full) — extract_twister_matrix replayed on the
    slice. A JSON value that completes within the slice completes
    identically in the full document (values are self-delimiting), so
    success never needs the full page; incompleteness does only when the
    slice was clipped."""
    anchor = tw.find("dimensionValuesDisplayData")
    if anchor < 0:
        return None, True  # defensive: flag said present
    blob_start = tw.rfind("var dataToReturn", 0, anchor)
    if blob_start < 0:
        blob_start = max(0, anchor - _TW_BACK)
    brace = tw.find("{", blob_start)
    if brace < 0:
        return None, True  # kernel's brace<0 path indexes from the doc end — full replay
    if brace >= 0:
        try:
            parsed, _ = _JSON_DECODER.raw_decode(tw, brace)
            if isinstance(parsed, dict):
                return parsed, False
        except ValueError:
            pass
    blob = _balanced_json_value(tw, brace)
    if blob is None and clipped:
        return None, True
    region = blob if blob is not None else tw[blob_start : anchor + _TW_BACK]
    out: dict[str, Any] = {}
    for key in _TWISTER_KEYS:
        m = _TWISTER_KEY_RES[key].search(region)
        if not m:
            continue
        raw = _balanced_json_value(region, m.end())
        if raw is None:
            continue
        try:
            out[key] = json.loads(raw)
        except (json.JSONDecodeError, ValueError):
            continue
    if not out:
        raise ExtractionError("twister blob unparseable")
    return out, False


def _variants_from_slice(
    tw_has: bool, tw: str, clipped: bool, root: Optional[str]
) -> tuple[Optional[dict], bool]:
    """extract_variations_matrix over the slice: failures yield {} (D5,
    never fatal), incompleteness yields needs_full."""
    if not tw_has:
        return {}, False
    try:
        matrix, nf = _twister_from_slice(tw, clipped)
        if nf:
            return None, True
        return build_variants(matrix, root), False
    except Exception:
        return {}, False


def extract_one_sliced(
    url: str,
    acr: Optional[str],
    fb_dq: Optional[str],
    fb_dq_has: bool,
    fb_sq: Optional[str],
    fb_sq_has: bool,
    tw_has: bool,
    tw: Optional[str],
    tw_clipped: bool,
    detagged: Optional[str],
    bad_decode: bool,
) -> tuple[Optional[str], Optional[str], Optional[str], bool]:
    """(payload_json, text, error, needs_full) from the JVM slices."""
    if detagged is None:
        return None, None, repr(ExtractionError("fetch miss: url absent from pages")), False
    if bad_decode:
        return None, None, None, True
    try:
        if not acr:
            raise ExtractionError("locator '#averageCustomerReviews' not found")
        a = _DATA_ASIN_RE.search(acr)
        asin = (
            None
            if a is None
            else unescape(a.group(1) if a.group(1) is not None else a.group(2))
        )
        bullets, nf = _bullets_from_slice(fb_dq or "", fb_dq_has, fb_sq or "", fb_sq_has)
        if nf:
            return None, None, None, True
        variants, nf = _variants_from_slice(tw_has, tw or "", tw_clipped, py_root_url(url))
        if nf:
            return None, None, None, True
        payload = {
            "asin": asin,
            "feature_bullets": bullets,
            "url": url,
            "variants": variants,
        }
        text = _WS_RE.sub(" ", unescape(detagged)).strip()
        return payload_to_json(payload), text, None, False
    except Exception as e:  # reference stores repr(error) (context.py:100)
        return None, None, repr(e), False


@F.pandas_udf(SLICED_RESULT_SCHEMA)
def extract_sliced_udf(
    url: pd.Series,
    acr: pd.Series,
    fb_dq: pd.Series,
    fb_dq_has: pd.Series,
    fb_sq: pd.Series,
    fb_sq_has: pd.Series,
    tw_has: pd.Series,
    tw: pd.Series,
    tw_clipped: pd.Series,
    detagged: pd.Series,
    bad_decode: pd.Series,
) -> pd.DataFrame:
    payloads: list[Optional[str]] = []
    texts: list[Optional[str]] = []
    errors: list[Optional[str]] = []
    fulls: list[bool] = []
    for row in zip(
        url, acr, fb_dq, fb_dq_has, fb_sq, fb_sq_has, tw_has, tw, tw_clipped,
        detagged, bad_decode,
    ):
        pj, tx, er, nf = extract_one_sliced(
            row[0], row[1], row[2], bool(row[3]), row[4], bool(row[5]),
            bool(row[6]), row[7], bool(row[8]), row[9], bool(row[10]),
        )
        payloads.append(pj)
        texts.append(tx)
        errors.append(er)
        fulls.append(nf)
    return pd.DataFrame(
        {"payload_json": payloads, "text": texts, "error": errors, "needs_full": fulls}
    )


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------


@F.pandas_udf(EXTRACT_RESULT_SCHEMA)
def extract_udf(url: pd.Series, html: pd.Series) -> pd.DataFrame:
    """Arrow-batched extraction kernel. html may be bytes (pages.html is
    binary) or str."""
    payloads: list[Optional[str]] = []
    texts: list[Optional[str]] = []
    errors: list[Optional[str]] = []
    for u, h in zip(url, html):
        if h is None:
            payloads.append(None)
            texts.append(None)
            errors.append(repr(ExtractionError("fetch miss: url absent from pages")))
            continue
        if isinstance(h, (bytes, bytearray, memoryview)):
            h = bytes(h).decode("utf-8", errors="replace")
        pj, tx, er = extract_one(u, h)
        payloads.append(pj)
        texts.append(tx)
        errors.append(er)
    return pd.DataFrame({"payload_json": payloads, "text": texts, "error": errors})


def sliced_inputs(h: Column) -> list[Column]:
    """The ten JVM slice/flag columns extract_sliced_udf consumes, from
    the decoded html column (shared by with_extraction and tests)."""
    # feature-bullets slices: from the last '<' before the FIRST marker
    # ([^<]* cannot cross a '<', so the regex start IS the kernel's
    # rfind) through FB_SLICE_K chars past the marker
    fb_dq = F.regexp_extract(h, '(?s)<[^<]*id="feature-bullets".{0,%d}' % FB_SLICE_K, 0)
    fb_sq = F.regexp_extract(h, "(?s)<[^<]*id='feature-bullets'.{0,%d}" % FB_SLICE_K, 0)
    tw_has, tw_slice, tw_clipped = _twister_slice_jvm(h)
    return [
        F.regexp_extract(h, _ACR_PATTERN_JVM, 0),
        fb_dq,
        F.instr(h, 'id="feature-bullets"') > 0,
        fb_sq,
        F.instr(h, "id='feature-bullets'") > 0,
        tw_has,
        tw_slice,
        tw_clipped,
        _detag_jvm(h),
        # U+FFFD present ⇒ the JVM UTF-8 replacement decode may differ
        # from Python's byte-wise 'replace' — route through the full
        # kernel, which decodes in Python exactly as before
        F.instr(h, "�") > 0,
    ]


def with_extraction(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    presliced: bool = False,
) -> DataFrame:
    """Append extraction columns: payload_json, text, error, and the typed
    ``data`` struct (recovered JVM-side via from_json — Arrow only ever
    carries flat strings).

    presliced=True: the JVM slices the three payload regions + de-tags
    the text first, so Arrow carries ~KBs per row instead of the full
    page; rows whose slices can't prove completeness (needs_full) are
    re-extracted by the full-html kernel in a masked second pass — html
    is nulled for all other rows, so the second Arrow transfer is almost
    free. Byte-identical to the default path (differential-tested), but
    MEASURED SLOWER in this environment (see the pre-sliced section
    banner) — default stays the single-pass full-html kernel."""
    if not presliced:
        res = extract_udf(F.col(url_col), F.col(html_col))
        return (
            df.withColumn("_x", res)
            .withColumn("payload_json", F.col("_x.payload_json"))
            .withColumn("text", F.col("_x.text"))
            .withColumn("error", F.col("_x.error"))
            .drop("_x")
            .withColumn("data", F.from_json("payload_json", PAYLOAD_SCHEMA))
        )
    sliced = extract_sliced_udf(F.col(url_col), *sliced_inputs(F.col("_h")))
    out = (
        df.withColumn("_h", F.col(html_col).cast("string"))
        .withColumn("_s", sliced)
        .withColumn(
            "_f",
            extract_udf(
                F.col(url_col),
                F.when(F.col("_s.needs_full"), F.col(html_col)).otherwise(F.lit(None)),
            ),
        )
    )
    pick = F.when(F.col("_s.needs_full"), F.col("_f")).otherwise(
        F.struct(
            F.col("_s.payload_json").alias("payload_json"),
            F.col("_s.text").alias("text"),
            F.col("_s.error").alias("error"),
        )
    )
    return (
        out.withColumn("_x", pick)
        .withColumn("payload_json", F.col("_x.payload_json"))
        .withColumn("text", F.col("_x.text"))
        .withColumn("error", F.col("_x.error"))
        .drop("_x", "_s", "_f", "_h")
        .withColumn("data", F.from_json("payload_json", PAYLOAD_SCHEMA))
    )
