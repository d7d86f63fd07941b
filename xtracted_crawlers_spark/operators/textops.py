"""Text analysis operators — JVM-side column expressions only.

Every function here returns Column expressions built from pyspark.sql
built-ins (split/regexp/length/md5), so the hot path is whole-stage
codegen with zero Python. Each has an exact DuckDB-SQL twin in
__spark_entry__.oracle_sql() — the semantics are deliberately chosen to be
expressible identically in both engines (ASCII \\w tokenization, marker-
word occurrence counts) so the driver can value-hash-compare them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# language marker words: space-delimited so they only match whole words.
# Deterministic, closed-world language ID (en/de/es/fr + und fallback) —
# an n-gram-profile classifier is out of scope for an exact SQL oracle.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "es": [" el ", " de ", " la "],
    "fr": [" le ", " la ", " et "],
}

STOPWORDS = [" the ", " a ", " and ", " of ", " to "]

PUNCT_CLASS = r"""[.,;:!?'"()\[\]{}-]"""


def occurrences(text: Column, needle: str) -> Column:
    """Count non-overlapping needle occurrences via the length-delta trick
    — identical semantics in Spark and DuckDB."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("int")


def word_count(text: Column) -> Column:
    """Whitespace-delimited word count; 0 for blank text."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def token_count(text: Column) -> Column:
    """BPE-ish token count: ASCII word runs + each non-word-non-space char
    (CJK text degrades to per-character tokens, as a byte-level BPE would)."""
    return F.size(F.regexp_extract_all(text, F.lit(r"\w+|[^\w\s]"), 0))


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    stripped = F.length(F.regexp_replace(text, PUNCT_CLASS, ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.round((n - stripped).cast("double") / n, 4)
    )


def stopword_ratio(text: Column) -> Column:
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    hits = None
    for w in STOPWORDS:
        c = occurrences(padded, w)
        hits = c if hits is None else hits + c
    wc = word_count(text)
    return F.when(wc == 0, F.lit(0.0)).otherwise(
        F.round(hits.cast("double") / wc, 4)
    )


def quality_score(text: Column) -> Column:
    """Heuristic [0,1] quality: length band + word-length sanity +
    punctuation sanity + stopword presence. Deterministic, oracle-exact."""
    wc = word_count(text)
    awl = F.when(wc == 0, F.lit(0.0)).otherwise(F.length(F.trim(text)).cast("double") / wc)
    s_len = F.when((wc >= 20) & (wc <= 10000), 0.25).otherwise(0.0)
    s_awl = F.when((awl >= 3.0) & (awl <= 12.0), 0.25).otherwise(0.0)
    s_punct = F.when(punct_ratio(text) <= 0.2, 0.25).otherwise(0.0)
    s_stop = F.when(stopword_ratio(text) >= 0.01, 0.25).otherwise(0.0)
    return F.round(s_len + s_awl + s_punct + s_stop, 2)


def lang_id(text: Column) -> Column:
    """Marker-word argmax language ID over a closed language set; 'und'
    when no marker fires. Ties broken by fixed language order."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    scores = {
        lang: sum_cols([occurrences(padded, m) for m in markers])
        for lang, markers in LANG_MARKERS.items()
    }
    best_score = F.greatest(*scores.values())
    expr = F.lit("und")
    # reversed fixed order so earlier languages win ties via last-when-wins
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when((scores[lang] > 0) & (scores[lang] == best_score), F.lit(lang)).otherwise(
            expr
        )
    return expr


def sum_cols(cols: list[Column]) -> Column:
    out = cols[0]
    for c in cols[1:]:
        out = out + c
    return out


# PII scrubbing (C4/Dolma-style pre-training hygiene) — RE2-compatible
# patterns (no lookarounds) so the DuckDB oracle runs them verbatim.
# Order matters and is fixed: emails first (their local parts contain
# digits), then IPv4 (dots keep them out of the phone class), then
# phone-like digit runs.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# 9-14 digits with at most one ()-/space separator between digits: real
# phone shapes match; ISO dates (8 digits) and '20 000 000'-style
# numbers under 9 digits do NOT. A 10+-digit spaced number is still a
# false positive — this is a documented digit-run heuristic, not NER.
PHONE_RE = r"\+?\d(?:[ ()-]{0,2}\d){8,13}"
_PII = [(EMAIL_RE, "<EMAIL>"), (IPV4_RE, "<IP>"), (PHONE_RE, "<PHONE>")]


def redact_pii(text: Column) -> Column:
    """Text with emails/IPv4s/phone-like digit runs replaced by typed
    mask tokens — applied in the fixed order above. Pure JVM
    regexp_replace chain (codegen, zero Python), the per-row scrubbing
    pass every pre-training corpus ships through."""
    out = text
    for pat, mask in _PII:
        out = F.regexp_replace(out, pat, mask)
    return out


def pii_counts(text: Column) -> tuple[Column, Column, Column]:
    """(n_email, n_ip, n_phone) found by the same patterns — counted on
    the same partially-redacted intermediates redact_pii rewrites, so
    counts always agree with what redaction actually removed."""
    counts = []
    out = text
    for pat, mask in _PII:
        counts.append(F.size(F.regexp_extract_all(out, F.lit(pat), 0)))
        out = F.regexp_replace(out, pat, mask)
    return tuple(counts)


# entity → char, &amp; deliberately LAST so '&amp;lt;' decodes to '&lt;'
# (single-pass decode, the same convention as sources/sitemap.py)
HTML_ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def html_to_text(html: Column) -> Column:
    """Generic page text from raw html — the WET-style extraction a
    Common-Crawl-shaped corpus runs on every page (vs the reference's
    product-field extraction, which targets specific elements):
    script/style blocks and comments removed FIRST (their bodies carry
    '<'/quotes that would derail a naive tag stripper), then all tags
    → space, the six common entities decoded (&amp; last, single-pass),
    whitespace collapsed. Pure chained JVM regexp/replace — one
    codegen'd map pass, mirrored operator-for-operator by the DuckDB
    oracle. html may be binary (cast decodes UTF-8) or string."""
    s = html.cast("string")
    s = F.regexp_replace(s, "(?is)<script\\b[^>]*>.*?</script>", " ")
    s = F.regexp_replace(s, "(?is)<style\\b[^>]*>.*?</style>", " ")
    s = F.regexp_replace(s, "(?s)<!--.*?-->", " ")
    s = F.regexp_replace(s, "<[^>]*>", " ")
    for ent, ch in HTML_ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(s, "\\s+", " "))


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 over whitespace-normalized lowercase text
    (the rolling-hash document signature, exact-dedup key)."""
    return F.md5(F.lower(F.regexp_replace(F.trim(text), r"\s+", " ")))


# ---------------------------------------------------------------------------
# Repetition statistics (Gopher-style quality filters, Rae et al. 2021
# "Scaling Language Models", Table A1). All three are MAP-ONLY: each
# document's statistics depend only on its own text, computed with
# higher-order array functions inside whole-stage codegen — no shuffle,
# no Python, so they cost one pass over the corpus at any scale.
# ---------------------------------------------------------------------------


def _nonblank_lines(text: Column) -> Column:
    """Trimmed non-blank lines of the document (the unit of the
    duplicate-line filters; blank lines are layout, not content)."""
    return F.filter(
        F.transform(F.split(text, r"\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )


def _words_array(text: Column) -> Column:
    """Whitespace-split words; empty array for blank text."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def dup_line_frac(text: Column) -> Column:
    """Fraction of non-blank lines that are repeats of an earlier line
    (n_lines - n_distinct) / n_lines; 0.0 for line-less text."""
    lines = _nonblank_lines(text)
    n = F.size(lines)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.round((n - F.size(F.array_distinct(lines))).cast("double") / n, 4)
    )


def dup_line_char_frac(text: Column) -> Column:
    """Fraction of line characters inside lines that occur more than once.

    Sort the line array, then an index-aware transform marks elements
    equal to a sorted neighbour (= members of a duplicate group) and
    sums their lengths — O(L log L) per document, still map-only."""
    s = F.array_sort(_nonblank_lines(text))
    n = F.size(s)
    total = F.aggregate(s, F.lit(0), lambda acc, x: acc + F.length(x))
    # transform index i is 0-based; element_at is 1-based, so the sorted
    # predecessor of element i is element_at(s, i) and the successor is
    # element_at(s, i + 2).
    dup = F.aggregate(
        F.transform(
            s,
            lambda x, i: F.when(
                ((i > 0) & (x == F.element_at(s, i)))
                | ((i < n - 1) & (x == F.element_at(s, i + 2))),
                F.length(x),
            ).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return F.when(total == 0, F.lit(0.0)).otherwise(
        F.round(dup.cast("double") / total, 4)
    )


def top_bigram_char_frac(text: Column) -> Column:
    """Fraction of word characters covered by the most frequent word
    bigram: top_count * top_bigram_chars / total_word_chars, where a
    bigram's chars are its two words' lengths (the joining space is not
    counted and inter-word whitespace is not part of the denominator).

    Sorting the bigram array makes equal bigrams adjacent, so one
    aggregate fold tracks the longest run — map-only like the line
    stats. Among equally-frequent bigrams the longest is taken; any
    further tie has the same (count, chars) and therefore the same
    fraction, so the statistic is deterministic without a total order."""
    w = _words_array(text)
    n = F.size(w)
    total = F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x))
    bigrams = F.array_sort(
        F.zip_with(
            F.slice(w, 1, n - 1),
            F.slice(w, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    )
    zero = F.lit(0)
    init = F.struct(
        F.lit("").alias("prev"),
        zero.alias("run"),
        zero.alias("bcnt"),
        zero.alias("blen"),
    )

    def step(acc, x):
        run2 = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        clen = F.length(x) - 1
        better = (run2 > acc["bcnt"]) | ((run2 == acc["bcnt"]) & (clen > acc["blen"]))
        return F.struct(
            x.alias("prev"),
            run2.alias("run"),
            F.when(better, run2).otherwise(acc["bcnt"]).alias("bcnt"),
            F.when(better, clen).otherwise(acc["blen"]).alias("blen"),
        )

    best = F.aggregate(bigrams, init, step)
    # overlapping occurrences ("word word word ...") can cover more
    # char-slots than the document has characters; cap keeps this a
    # fraction, matching the spirit of "characters contained within".
    return F.when((n < 2) | (total == 0), F.lit(0.0)).otherwise(
        F.round(
            F.least(F.lit(1.0), (best["bcnt"] * best["blen"]).cast("double") / total), 4
        )
    )


def gopher_keep(
    text: Column,
    max_dup_line_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    max_top_bigram_char_frac: float = 0.20,
) -> Column:
    """Combined repetition gate with the Gopher paper's published
    thresholds (dup lines 30%, dup line chars 20%, top-2-gram chars
    20%) — true = document survives the repetition filters."""
    return (
        (dup_line_frac(text) <= max_dup_line_frac)
        & (dup_line_char_frac(text) <= max_dup_line_char_frac)
        & (top_bigram_char_frac(text) <= max_top_bigram_char_frac)
    )


# Gopher word-level quality rules (Rae et al. 2021, "Scaling Language
# Models: ...Gopher", Table A1) — the non-repetition half of the Gopher
# filter (the repetition half is gopher_keep above). All thresholds are
# applied as INTEGER cross-multiplications (10*symbols <= words instead
# of symbols/words <= 0.1), so the DuckDB oracle reproduces every flag
# byte-for-byte with no float-division drift.
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_word_stats(text: Column) -> dict[str, Column]:
    """Per-document counters the Gopher word rules gate on — all
    map-only array/string expressions (no UDF, no shuffle):
    wc, word_chars, alpha_words, symbol_cnt ('#' + '...' + '…'),
    n_lines, bullet_lines ('-'/'*'/'•' starts), ellipsis_lines
    ('...'/'…' ends), stop_hits (distinct Gopher stopwords present)."""
    words = _words_array(text)
    lower = F.transform(words, lambda x: F.lower(x))
    lines = _nonblank_lines(text)
    return {
        "wc": F.size(words),
        "word_chars": F.aggregate(words, F.lit(0), lambda a, x: a + F.length(x)),
        "alpha_words": F.size(F.filter(words, lambda x: x.rlike("[A-Za-z]"))),
        "symbol_cnt": occurrences(text, "#")
        + occurrences(text, "...")
        + occurrences(text, "…"),
        "n_lines": F.size(lines),
        "bullet_lines": F.size(
            F.filter(
                lines,
                lambda x: x.startswith("-") | x.startswith("*") | x.startswith("•"),
            )
        ),
        "ellipsis_lines": F.size(
            F.filter(lines, lambda x: x.endswith("...") | x.endswith("…"))
        ),
        "stop_hits": sum_cols(
            [F.array_contains(lower, w).cast("int") for w in GOPHER_STOPS]
        ),
    }


def gopher_word_keep(text: Column) -> Column:
    """True = document survives the Gopher word rules: 50 <= words <=
    100k; mean word length in [3,10]; symbol-to-word ratio <= 0.1;
    <=10% bullet-start lines; <=30% ellipsis-end lines; >=80% words
    with an alphabetic character; >=2 Gopher stopwords present."""
    s = gopher_word_stats(text)
    return (
        s["wc"].between(50, 100_000)
        & (3 * s["wc"] <= s["word_chars"])
        & (s["word_chars"] <= 10 * s["wc"])
        & (10 * s["symbol_cnt"] <= s["wc"])
        & (10 * s["bullet_lines"] <= s["n_lines"])
        & (10 * s["ellipsis_lines"] <= 3 * s["n_lines"])
        & (5 * s["alpha_words"] >= 4 * s["wc"])
        & (s["stop_hits"] >= 2)
    )


# C4 heuristic cleaning (Raffel et al. 2020, "Exploring the Limits of
# Transfer Learning with a Unified Text-to-Text Transformer", §2.2 —
# the rules behind the C4 corpus). Reference parity note: the reference
# crawler (jobomix/xtracted-crawlers) extracts structured product data,
# not corpus text; this family is the additional LLM-pipeline surface
# the engine needs at 100 TB. Line rules drop lines; page rules drop
# documents. Everything is a map-only array/string expression — one
# scan, no UDF, no shuffle — so the filter runs at full codegen speed
# over any corpus size.
#
# The real C4 page rule uses the "List of Dirty, Naughty, Obscene..."
# word list; the engine takes the list as a parameter and ships these
# placeholder slots so tests stay printable. Production supplies the
# published list.
C4_BLOCKLIST = ("badword1", "badword2")

# A line survives C4 only if it ends in terminal punctuation (period,
# exclamation, question mark, closing quote) ...
_C4_TERMINALS = (".", "!", "?", '"')


def c4_line_keep(line: Column, min_words: int = 3) -> Column:
    """C4 line rule: ends in a terminal punctuation mark, has at least
    ``min_words`` whitespace words, and does not contain the word
    'javascript' (case-insensitive) — the three line-level C4 rules."""
    ends_ok = sum_cols([line.endswith(t).cast("int") for t in _C4_TERMINALS]) >= 1
    enough_words = F.size(F.split(line, r"\s+")) >= min_words
    no_js = ~F.lower(line).contains("javascript")
    return ends_ok & enough_words & no_js


def c4_clean(text: Column, min_words: int = 3) -> Column:
    """The document after C4's line filters: trimmed non-blank lines
    that pass :func:`c4_line_keep`, re-joined with newlines. Byte-
    deterministic, so downstream hashes are stable across engines."""
    kept = F.filter(_nonblank_lines(text), lambda x: c4_line_keep(x, min_words))
    return F.array_join(kept, "\n")


def c4_stats(text: Column, blocklist: tuple = C4_BLOCKLIST) -> dict[str, Column]:
    """Per-document C4 counters, computed on the line-cleaned text:
    n_lines / kept_lines (line-rule effect), n_sentences (terminal-
    punctuation occurrences in the cleaned text — C4's sentence proxy),
    and the three page-killer flags (lorem ipsum, curly brace,
    blocklisted word)."""
    lines = _nonblank_lines(text)
    cleaned = c4_clean(text)
    low = F.lower(cleaned)
    return {
        "n_lines": F.size(lines),
        "kept_lines": F.size(F.filter(lines, lambda x: c4_line_keep(x))),
        "n_sentences": occurrences(cleaned, ".")
        + occurrences(cleaned, "!")
        + occurrences(cleaned, "?"),
        "has_lorem": low.contains("lorem ipsum"),
        "has_brace": cleaned.contains("{"),
        "has_blockword": sum_cols([low.contains(w).cast("int") for w in blocklist])
        >= 1,
    }


def c4_keep(
    text: Column, min_sentences: int = 5, blocklist: tuple = C4_BLOCKLIST
) -> Column:
    """True = the line-cleaned document survives C4's page rules: at
    least ``min_sentences`` sentences, no 'lorem ipsum', no '{', no
    blocklisted word. Apply together with :func:`c4_clean` — the
    sentence count is measured AFTER line cleaning, as in the paper."""
    s = c4_stats(text, blocklist)
    return (
        (s["n_sentences"] >= min_sentences)
        & ~s["has_lorem"]
        & ~s["has_brace"]
        & ~s["has_blockword"]
    )


# Model-based quality scoring (the DCLM / FineWeb-Edu filtering family:
# a trained classifier scores every document; Li et al. 2024, Penedo et
# al. 2024). The engine-side operator is the INFERENCE step — a hashed
# n-gram linear model (fastText architecture, Joulin et al. 2016):
# lowercased unigram+bigram features hashed into n_buckets, score =
# sigmoid(mean feature weight). Map-only column expressions end to end
# (split -> hash -> array fold), so scoring costs one codegen pass over
# the corpus at any scale — no UDF, no shuffle, no model server.
#
# Weights are INTEGER (fixed-point, /scale at the end): integer sums
# are associative, so the fold is bit-exact regardless of evaluation
# order — the property that lets a DuckDB oracle verify the score
# hash-exactly. Production exports a trained model the same way
# (quantize weights to ints); for vocabularies too large for a literal
# array (fastText uses 2M buckets), explode + broadcast-join a weights
# table instead — same math, one narrow shuffle.

QCLF_BUCKETS = 256


def hash_feature_buckets(text: Column, n_buckets: int = QCLF_BUCKETS) -> Column:
    """array<long> of hashed unigram+bigram feature buckets with
    multiplicity (the fastText feature map): tokens are lowercased
    whitespace words; bucket = first 8 md5 hex chars mod n_buckets
    (md5 so any SQL engine reproduces every bucket bit-for-bit —
    same scheme as operators/sampling.py:dsir_features)."""
    words = F.filter(
        F.split(F.trim(F.lower(text)), r"\s+"), lambda x: x != ""
    )
    n = F.size(words)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(words, 1, n - 1),
            F.slice(words, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = F.concat(words, bigrams)
    return F.transform(
        feats,
        lambda f: F.conv(F.substring(F.md5(f), 1, 8), 16, 10).cast("long")
        % n_buckets,
    )


def classifier_score(
    text: Column,
    weights: list[int],
    scale: float = 100.0,
    bias: float = 0.0,
) -> dict[str, Column]:
    """Linear-classifier inference columns: ``n_feats``, ``score`` =
    sigmoid(bias + sum(weights[bucket]) / (scale * n_feats)) rounded to
    4 decimals, for integer ``weights`` indexed by feature bucket
    (len(weights) = n_buckets). Feature-less documents score 0.0 (no
    evidence -> reject, never NaN)."""
    b = hash_feature_buckets(text, len(weights))
    warr = F.array(*[F.lit(int(w)) for w in weights])
    n = F.size(b)
    s = F.aggregate(
        b,
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.element_at(warr, x.cast("int") + 1),
    )
    z = F.lit(bias) + s.cast("double") / (F.lit(float(scale)) * n)
    score = F.when(n == 0, F.lit(0.0)).otherwise(
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 4)
    )
    return {"n_feats": n, "score": score}
