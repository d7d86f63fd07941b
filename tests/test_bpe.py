"""BPE trainer/tokenizer (operators/bpe.py) vs a pure-Python Sennrich
reference implementation.

The reference crawler has no tokenizer; this is LLM-pipeline surface
(SURVEY.md §2 additions). The contract the tests pin:

- bpe_learn == the textbook greedy trainer (pair-count over the word
  table, argmax with (count desc, pair asc) tie-break, leftmost
  non-overlapping merge) — property-tested over random corpora;
- bpe_apply replays learned merges in rank order and round-trips: the
  concatenated symbols reconstruct each word;
- token counts shrink monotonically as merges are added.
"""

from __future__ import annotations

import collections

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from xtracted_crawlers_spark.operators import bpe


# --- pure-Python reference trainer (Sennrich et al. 2016, alg. 1) ----
def _py_bpe(words: dict[str, int], k: int):
    """Returns [(rank, 'a b', freq)] using the same tie-break."""
    syms = {w: tuple(w) + (bpe.END_OF_WORD,) for w in words}
    out = []
    for rank in range(k):
        counts = collections.Counter()
        for w, freq in words.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += freq
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1]))
        (a, b), cnt = best
        out.append((rank, a + " " + b, cnt))
        for w in list(syms):
            s, merged, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(s[i])
                    i += 1
            syms[w] = tuple(merged)
    return out


def _learn_spark(spark, docs: list[str], k: int, cache: bool = False):
    df = spark.createDataFrame([(d,) for d in docs], "text string")
    rows = bpe.bpe_learn(df, n_merges=k, cache=cache).collect()
    return [(r.merge_rank, r.pair, r.freq) for r in sorted(rows)]


def _word_freqs(docs: list[str]) -> dict[str, int]:
    c = collections.Counter()
    for d in docs:
        c.update(w for w in d.lower().split() if w)
    return dict(c)


def test_learn_matches_reference_basic(spark):
    docs = ["low low low low low", "lower lower newest newest",
            "newest newest newest newest", "widest widest widest"]
    got = _learn_spark(spark, docs, 6)
    want = _py_bpe(_word_freqs(docs), 6)
    assert got == want
    # the classic first merges on this corpus: 'es', 'est', 'est</w>'
    assert got[0][1] == "e s"
    assert got[1][1] == "es t"
    assert got[2][1] == "est </w>"


def test_adjacent_repeats_merge_like_textbook(spark):
    """Regression for the consumed-delimiter replace pitfall: with
    single-space joints, merging (a,a) in 'aaaa' yields [aa,a,a]
    because the match eats the next candidate's leading space; textbook
    greedy (Sennrich's zero-width regex) yields [aa,aa]. The
    double-space joint encoding must reproduce the textbook result —
    measured divergence on this exact corpus before the fix."""
    docs = ["aaaa aaaa aa b"]
    got = _learn_spark(spark, docs, 3)
    want = _py_bpe(_word_freqs(docs), 3)
    assert got == want
    # and the tokenizer side: 'aaaa' under merge (a,a) -> [aa, aa, </w>]
    df = spark.createDataFrame([("aaaa",)], "text string")
    toks = df.select(bpe.bpe_apply(F.col("text"), ["a a"]).alias("t")).first().t
    assert toks == ["aa", "aa", bpe.END_OF_WORD]


def test_learn_cache_equals_lazy(spark):
    docs = ["aa ab aa ba", "ab ab aa cc cc cc"]
    assert _learn_spark(spark, docs, 4, cache=True) == _learn_spark(
        spark, docs, 4, cache=False
    )


def test_tie_break_is_lexicographic(spark):
    # 'xy' and 'ab' both appear exactly once -> every pair count is 1;
    # winner must be the lexicographically smallest pair string.
    got = _learn_spark(spark, ["xy ab"], 1)
    want = _py_bpe({"xy": 1, "ab": 1}, 1)
    assert got == want
    assert got[0][1] == min(got[0][1], "a b")  # 'a b' is the floor here


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        # two-letter alphabet => dense repeat runs ('aabab', 'bbbb'),
        # the regime where the joint encoding matters most
        st.text(alphabet="ab ", min_size=1, max_size=24),
        min_size=1,
        max_size=8,
    )
)
def test_learn_matches_reference_fuzz(spark_mod, corpus):
    wf = _word_freqs(corpus)
    if not wf:
        return
    got = _learn_spark(spark_mod, corpus, 4)
    want = _py_bpe(wf, 4)
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcx .", min_size=1, max_size=24),
        min_size=1,
        max_size=8,
    )
)
def test_learn_matches_reference_fuzz_wide(spark_mod, corpus):
    wf = _word_freqs(corpus)
    if not wf:
        return
    got = _learn_spark(spark_mod, corpus, 3)
    want = _py_bpe(wf, 3)
    assert got == want


@pytest.fixture(scope="module")
def spark_mod(spark):
    # hypothesis needs a non-function-scoped fixture alias
    return spark


def test_apply_round_trips_and_respects_merges(spark):
    docs = ["low low low lower newest newest widest"]
    merges = [p for _, p, _ in _learn_spark(spark, docs, 4)]
    df = spark.createDataFrame([(docs[0],)], "text string")
    toks = df.select(
        bpe.bpe_apply(F.col("text"), merges).alias("toks"),
        bpe.bpe_token_count(F.col("text"), merges).alias("n"),
    ).first()
    assert toks.n == len(toks.toks)
    # round-trip: concatenating symbols (dropping </w>) rebuilds the text
    rebuilt = "".join(toks.toks).replace(bpe.END_OF_WORD, " ").strip()
    assert rebuilt == docs[0]
    # every multi-char token is a learned merge product or a raw char+</w>
    vocab = {m.replace(" ", "") for m in merges}
    for t in toks.toks:
        base = t.replace(bpe.END_OF_WORD, "")
        assert len(base) <= 1 or t in vocab or base in vocab, t


def test_token_count_monotone_in_merges(spark):
    docs = ["the cat sat on the mat the cat sat"]
    merges = [p for _, p, _ in _learn_spark(spark, docs, 6)]
    df = spark.createDataFrame([(docs[0],)], "text string")
    counts = [
        df.select(bpe.bpe_token_count(F.col("text"), merges[:i]).alias("n"))
        .first()
        .n
        for i in range(len(merges) + 1)
    ]
    assert counts == sorted(counts, reverse=True)
    assert counts[-1] < counts[0]


def test_tokenize_query_is_map_only(spark, sf_dir):
    """The apply path is the half that scans 100 TB: its plan must be a
    single map-only codegen projection — zero shuffles, zero Python."""
    import __spark_entry__ as em
    from xtracted_crawlers_spark.plans import audit

    df = em.queries()["corpus_tokenize_bpe"](spark, sf_dir)
    audit.assert_no_exchange(df, "corpus_tokenize_bpe must be map-only")
    assert audit.python_eval_nodes(df) == []
    rows = df.limit(50).collect()
    assert all(r.n_tokens >= r.n_words for r in rows if r.n_words > 0)


def test_apply_without_eow_marker(spark):
    df = spark.createDataFrame([("ab ab",)], "text string")
    toks = df.select(
        bpe.bpe_apply(F.col("text"), ["a b", "ab </w>"], with_eow=False).alias("t")
    ).first()
    assert toks.t == ["ab", "ab"]
    assert all(bpe.END_OF_WORD not in t for t in toks.t)
