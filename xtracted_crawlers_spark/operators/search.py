"""Full-text retrieval over a document corpus: tokenized postings,
collection statistics, and BM25 ranked top-k — the query-side
complement to the dedup/quality operators (probe a training corpus for
benchmark contamination by topic, audit composition, find exemplars).

Spark-first design for the 100-TB path:
- postings are one explode + one (doc_id, term) aggregate with map-side
  combine; document length rides the same pass (constant per doc, so it
  sits in the grouping key without widening the shuffle);
- per-term document frequency is a second aggregate keyed on term
  (postings are already unique per (doc, term), so df = count);
- the query set is tiny by construction (a handful of probe strings) —
  broadcast against postings, so scoring never shuffles the corpus side
  and only postings for query terms survive the join;
- collection scalars (N, total token count) ride a one-row aggregate
  cross-joined into the score expression — no driver collect;
- top-k per query is a row_number window over (score desc, doc_id) —
  the LITERAL rank cap becomes a Partial WindowGroupLimit, so each map
  task forwards only its per-query top-k before the exchange.

exact_fold=True makes the per-(query, doc) sum of term contributions a
deterministic left fold in term order (collect_list → array_sort →
F.aggregate) instead of F.sum, whose accumulation order depends on
partitioning — the same verification/production split as
linkgraph.pagerank: bit-reproducible and DuckDB-mirrorable
(list_dot_product against a ones vector folds in the same order) at the
cost of materializing each doc's matched-term list; production keeps
F.sum's partial combine.

Scoring is Robertson/Sparck Jones BM25 with the Lucene-default
smoothed idf = ln(1 + (N - df + 0.5)/(df + 0.5)) (always positive),
k1 = 1.2, b = 0.75. The reference engine has no search surface (its
reads are crawl-state point lookups, /root/reference/xtracted/
context.py) — this is new corpus-analytics surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokens(text: Column) -> Column:
    """Lowercased alphanumeric token array (empty strings dropped) —
    the same tokenizer the dedup shingles and the DuckDB oracles use."""
    return F.filter(F.split(F.lower(text), TOKEN_SPLIT_RE), lambda t: t != F.lit(""))


def postings(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, term, tf, dl): term frequency per document plus the
    document's token count. One explode + one aggregate; dl is constant
    per doc_id so keying on it adds no shuffle width."""
    t = docs.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_toks"))
    t = t.select("doc_id", F.size("_toks").cast("long").alias("dl"), F.explode("_toks").alias("term"))
    return t.groupBy("doc_id", "dl", "term").agg(F.count("*").cast("long").alias("tf"))


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    exact_fold: bool = False,
) -> DataFrame:
    """Top-k documents per query by BM25, deterministically ordered:
    (query_id, doc_id, rank, score) with score rounded to 4 decimals and
    rank breaking ties on doc_id. Only documents matching at least one
    query term are scored (standard BM25 over an inverted index)."""
    from pyspark.sql import Window

    p = postings(docs, id_col=id_col, text_col=text_col)
    corpus = (
        p.select("doc_id", "dl")
        .distinct()
        .agg(
            F.count("*").cast("double").alias("n_docs"),
            F.sum("dl").cast("double").alias("total_dl"),
        )
    )
    dfreq = p.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    qt = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(F.array_distinct(tokens(F.col(query_text_col)))).alias("term"),
    )
    # idf/norm written with the exact operator shape the oracle mirrors:
    # IEEE +,-,*,/ are bit-identical across engines given identical trees
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df").cast("double") + F.lit(0.5))
    )
    avgdl = F.col("total_dl") / F.col("n_docs")
    denom = F.col("tf").cast("double") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / avgdl
    )
    contrib = (idf * (F.col("tf").cast("double") * F.lit(k1 + 1.0)) / denom).alias("contrib")
    scored = (
        p.join(F.broadcast(qt), "term")
        .join(dfreq, "term")
        .crossJoin(F.broadcast(corpus))
        .select("query_id", "doc_id", "term", contrib)
    )
    if exact_fold:
        score = F.aggregate(
            F.array_sort(F.collect_list(F.struct("term", "contrib"))),
            F.lit(0.0),
            lambda acc, s: acc + s["contrib"],
        )
    else:
        score = F.sum("contrib")
    g = scored.groupBy("query_id", "doc_id").agg(F.round(score, 4).alias("score"))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        g.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= F.lit(k))
        .select("query_id", "doc_id", "rank", "score")
    )


# ---------------------------------------------------------------------
# Positional postings + phrase search
# ---------------------------------------------------------------------


def positional_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, term, pos): one row per token OCCURRENCE with its
    0-based position — the positional index phrase/proximity queries
    need. posexplode keeps position assignment inside codegen; the
    table is corpus-token-sized (bigger than the (doc,term) postings —
    that is inherent to positional indexes, not a plan defect)."""
    t = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_toks")
    )
    return t.select(
        "doc_id", F.posexplode("_toks").alias("pos", "term")
    ).select("doc_id", "term", F.col("pos").cast("long").alias("pos"))


def phrase_search(
    docs: DataFrame,
    phrases: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    phrase_id_col: str = "phrase_id",
    phrase_text_col: str = "phrase_text",
) -> DataFrame:
    """(phrase_id, doc_id, n_matches): exact-phrase occurrence counts
    via positional-join intersection — the classic inverted-index
    phrase algorithm. The phrase's first term anchors; each subsequent
    term must appear at anchor_pos + i. That is len(phrase)-1 equi-joins
    on (doc_id, term, pos) — every join SHRINKS the candidate set (only
    anchors that survived every previous position check continue), and
    the corpus is touched once to build the positional table, however
    many phrases probe it. Phrases are tokenized with the shared
    tokenizer; the phrase table is query-sized (broadcast side).

    Phrases longer than the longest document trivially match nothing;
    single-term phrases degenerate to term frequency. Matches may
    overlap ('a a' occurs twice in 'a a a') — standard positional
    semantics."""
    # Materialize the positional table once (r6): it is probed by the
    # anchor join AND once per phrase position, it is map-only (no
    # exchange for Spark to reuse), and each probe joins on a different
    # key — so without this the corpus re-tokenized once per phrase
    # position, which is exactly what the paragraph above promises NOT
    # to do. Locally a first-plan win (7.8 -> 3.6 s rep0 at sf0.1,
    # steady within noise); at corpus scale this IS the positional
    # index build.
    p = positional_postings(docs, id_col=id_col, text_col=text_col).localCheckpoint()
    q = phrases.select(
        F.col(phrase_id_col).alias("phrase_id"),
        F.posexplode(tokens(F.col(phrase_text_col))).alias("i", "qterm"),
    )
    # the longest phrase bounds the unrolled join chain — one scalar off
    # the QUERY-sized table (same driver-scalar exception class as the
    # k-means codebook in similarity.py; never corpus-dependent)
    max_len_row = q.agg(F.max("i").alias("m")).first()
    max_i = int(max_len_row.m if max_len_row.m is not None else 0)

    anchors = (
        q.filter(F.col("i") == 0)
        .join(p, F.col("qterm") == p["term"])
        .select("phrase_id", "doc_id", F.col("pos").alias("anchor"))
    )
    cur = anchors
    for i in range(1, max_i + 1):
        qi = q.filter(F.col("i") == i).select("phrase_id", "qterm")
        # phrases shorter than i+1 terms have no row in qi and must
        # pass through unchecked: split, check, re-union
        checked = (
            cur.join(qi, "phrase_id")
            .join(
                p,
                (cur["doc_id"] == p["doc_id"])
                & (F.col("qterm") == p["term"])
                & (p["pos"] == cur["anchor"] + i),
            )
            .select("phrase_id", cur["doc_id"].alias("doc_id"), "anchor")
        )
        unchecked = cur.join(qi.select("phrase_id"), "phrase_id", "left_anti")
        cur = checked.unionByName(unchecked)
    return cur.groupBy("phrase_id", "doc_id").agg(
        F.count("*").cast("long").alias("n_matches")
    )
