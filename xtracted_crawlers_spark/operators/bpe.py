r"""BPE vocabulary induction over a corpus, as a declarative Spark plan.

Byte-pair encoding (Sennrich et al. 2016, "Neural Machine Translation of
Rare Words with Subword Units") is THE tokenizer-training step of an LLM
data pipeline. The trainer here is Spark-first and fully in-plan:

- the corpus collapses to a (word, freq) table first (one shuffle);
  every later step runs on that table, whose size follows Heaps' law —
  tiny relative to a 100 TB corpus — so K merges cost K passes over the
  word table, never over the corpus;
- each word is a SYMBOL STRING with DOUBLE-SPACE joints: symbols
  joined by two spaces, wrapped in one leading/trailing space
  (" h  e  l  l  o  </w> "). The double joint is load-bearing: plain
  `replace` consumes its match, so with single-space joints the
  trailing space of one merge eats the leading space of the next
  candidate and immediately-adjacent repeats under-merge ("aaaa" with
  merge (a,a) -> [aa,a,a], textbook says [aa,aa] — measured, not
  hypothetical). With two spaces per joint each boundary owns one
  space per side, and leftmost non-overlapping consumed-delimiter
  replace becomes EXACTLY the zero-width-boundary greedy scan of
  Sennrich's reference regex `(?<!\S)a b(?!\S)` — which RE2 (DuckDB)
  cannot express, but plain replace both engines share can;
- one iteration = adjacent-pair count (split + zip_with + explode +
  sum(freq)) -> argmax with a deterministic tie-break (count desc, pair
  asc) -> merge applied by one `replace` of " a  b " with " ab ".
  Spark's `replace`, ANSI replace, and Python str.replace agree on
  leftmost-non-overlapping scan, so the entire K-iteration trainer is
  reproducible in pure SQL (the oracle unrolls the same K iterations
  as a materialized CTE chain) and equals the textbook trainer
  (property-tested vs a pure-Python Sennrich implementation);
- the argmax row is crossJoin-ed back (single-row broadcast), so the
  merge choice stays a column, not a driver round-trip: the whole
  trainer is ONE lazy DAG. `cache=True` persists each iteration's word
  table, making iteration k cost O(1) instead of O(k) recomputation —
  at scale this is a few GB of word table per checkpoint.

Reference parity note: the reference crawler (jobomix/xtracted-crawlers)
has no tokenizer; this is the additional LLM-pipeline surface the 100 TB
engine needs (SURVEY.md LLM-data-pipeline family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "</w>"


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over lowercased whitespace tokens — the table every
    BPE iteration runs on (one corpus shuffle, Heaps-law sized)."""
    words = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda x: x != ""
    )
    return (
        docs.select(F.explode(words).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def to_symbols(word: Column) -> Column:
    """Initial symbol string: chars joined by DOUBLE spaces (see module
    docstring), end-of-word marker, single outer boundary spaces
    (' h  e  l  l  o  </w> ')."""
    return F.concat(
        F.lit(" "),
        F.regexp_replace(word, "(.)", "$1  "),
        F.lit(END_OF_WORD + " "),
    )


def _adjacent_pairs(sym: Column) -> Column:
    """array<string> of single-space-joined adjacent symbol pairs (with
    multiplicity — overlapping adjacencies both count, as in the
    reference algorithm's get_stats). Pair strings are the CANONICAL
    single-space form ('a b'), independent of the joint encoding."""
    a = F.split(F.trim(sym), "  ")
    n = F.size(a)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(a, 1, n - 1),
            F.slice(a, 2, n - 1),
            lambda x, y: F.concat(x, F.lit(" "), y),
        ),
    ).otherwise(F.array().cast("array<string>"))


def apply_merge(sym: Column, pair: Column) -> Column:
    """One greedy BPE merge: ' a  b ' -> ' ab ' on the double-joint
    encoding — equals Sennrich's zero-width-boundary greedy regex (see
    module docstring). `pair` is the canonical single-space pair string
    as a Column, so the merge choice can come from the plan itself
    (bpe_learn) or from a literal (bpe_apply)."""
    return F.replace(
        sym,
        F.concat(
            F.lit(" "), F.replace(pair, F.lit(" "), F.lit("  ")), F.lit(" ")
        ),
        F.concat(F.lit(" "), F.replace(pair, F.lit(" "), F.lit("")), F.lit(" ")),
    )


def bpe_learn(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    cache: bool = False,
) -> DataFrame:
    """Learn the top ``n_merges`` BPE merges: (merge_rank, pair, freq),
    where ``pair`` is the space-joined symbol pair chosen at that rank
    and ``freq`` its corpus-weighted adjacency count at choice time.
    Deterministic: ties break lexicographically on the pair string.

    cache=False keeps the trainer a single lazy DAG (iteration k
    recomputes the chain — fine for small K / the oracle twin);
    cache=True persists each iteration's word table so K merges cost
    K passes (the production setting)."""
    cur = word_freqs(docs, text_col).select(
        to_symbols(F.col("word")).alias("sym"), "freq"
    )
    outs = []
    for rank in range(n_merges):
        if cache:
            cur = cur.persist()
        pairs = (
            cur.select(F.explode(_adjacent_pairs(F.col("sym"))).alias("pair"), "freq")
            .groupBy("pair")
            .agg(F.sum("freq").alias("cnt"))
        )
        best = pairs.orderBy(F.col("cnt").desc(), F.col("pair").asc()).limit(1)
        if cache:
            # `best` is consumed twice — the rank-k output row AND the
            # crossJoin building iteration k+1's word table (which every
            # later rank depends on). Left lazy, the full pair-count
            # aggregation over the word table runs twice per rank
            # (measured r6: ~2x trainer cost at sf0.1). Materialize the
            # single row eagerly (localCheckpoint, not persist — caching
            # a global-limit plan as the build side of the crossJoin
            # blew the driver heap) so both consumers read it back.
            best = best.localCheckpoint()
        outs.append(
            best.select(
                F.lit(rank).cast("int").alias("merge_rank"),
                F.col("pair"),
                F.col("cnt").alias("freq"),
            )
        )
        cur = cur.crossJoin(best.select(F.col("pair").alias("_p"))).select(
            apply_merge(F.col("sym"), F.col("_p")).alias("sym"), "freq"
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def bpe_apply(
    text: Column, merges: list[str], with_eow: bool = True
) -> Column:
    """Tokenize: array<string> of BPE symbols for the document's
    lowercased whitespace words after applying ``merges`` (the learned
    pair strings, rank order) greedily — a map-only chain of K literal
    replaces per word, one codegen pass over any corpus size."""
    words = F.filter(
        F.split(F.trim(F.lower(text)), r"\s+"), lambda x: x != ""
    )

    def seg(w: Column) -> Column:
        s = to_symbols(w)
        for m in merges:
            s = apply_merge(s, F.lit(m))
        return F.split(F.trim(s), "  ")

    toks = F.flatten(F.transform(words, seg))
    if with_eow:
        return toks
    return F.transform(toks, lambda t: F.replace(t, F.lit(END_OF_WORD), F.lit("")))


def bpe_token_count(text: Column, merges: list[str]) -> Column:
    """Token count under the learned vocabulary — the statistic corpus
    packing and mixture budgeting consume."""
    return F.size(bpe_apply(text, merges))
