"""Co-citation and bibliographic coupling over the link graph.

Two classic link-structure similarity signals (Small 1973; Kessler
1963), both standard tools in web-graph analysis and crawl frontier
shaping:

- **co-citation**(a, b) = number of distinct pages that link to BOTH
  a and b.  Pages that are repeatedly cited together are topically
  related even when they never link to each other — useful for
  related-page discovery and for propagating topical labels in a
  focused crawl.
- **bibliographic coupling**(s, t) = number of distinct pages that
  BOTH s and t link to.  Sources sharing many out-links are near-
  mirror / template candidates — a cheap structural near-dup signal
  that needs no page content at all.

The two are transposes of each other: coupling(edges) ==
cocitation(edges with src/dst swapped), which is exactly how
:func:`bibliographic_coupling` is implemented.

Scale shape (10^10-edge graph): the pair generator is a self-join of
the edge table on the shared endpoint, so a hub with degree d emits
C(d, 2) pairs — a single src linking to 10^5 pages would alone emit
5×10^9 rows.  The standard mitigation (same one SimRank / co-citation
systems use) is a **degree cap**: endpoints whose fanout exceeds
``max_degree`` are dropped BEFORE the self-join, because a page that
links to everything carries almost no pairwise signal while costing
O(d²).  The cap bounds per-key join output at C(max_degree, 2) and
makes total output ≤ |kept sources| × C(max_degree, 2) — linear in the
source count.  Every stage before the final pair-count groupBy is keyed
on the join endpoint (no second partitioning scheme is introduced), and
pair counting is partially aggregated map-side before it shuffles, so
shuffle volume is bounded by distinct pairs, not generated pairs.
``min_common``
prunes the long tail of coincidental pairs before it leaves the
aggregate.

The reference crawler (jobomix/xtracted-crawlers) has no link-graph
analytics; this operator is part of the web-graph surface the engine
adds on top of the §2 crawl contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cocitation(
    edges: DataFrame,
    max_degree: int = 64,
    min_common: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(a, b, n_common) for a < b: distinct sources linking to both.

    ``edges`` may contain duplicates; they are collapsed first so
    n_common counts distinct sources.  Sources with more than
    ``max_degree`` distinct out-links are excluded entirely (hub cap —
    see module docstring); pairs with fewer than ``min_common`` shared
    sources are dropped.  Ordering of (a, b) is lexicographic so each
    unordered pair appears exactly once.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).distinct()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
    # Materialize the capped edge set once (r6): BOTH sides of the
    # self-join below consume `kept`, and the differently-aliased
    # projections defeat exchange reuse, so an uncached `kept` re-ran
    # the caller's whole edge pipeline (distinct + degree join — for
    # the contract queries, URL synthesis + host regexes too) per side
    # (measured: link_cocitation 4.0-5.6 s -> 1.2-1.4 s at sf0.1,
    # interleaved same-session A/B). The checkpoint is edge-set-sized —
    # the standard self-join materialization; at cluster scale use the
    # same shape with a reliable checkpoint/persist-to-disk.
    kept = (
        e.join(deg.filter(F.col("_deg") <= max_degree), "src")
        .drop("_deg")
        .localCheckpoint()
    )
    a = kept.select("src", F.col("dst").alias("a"))
    b = kept.select("src", F.col("dst").alias("b"))
    return (
        a.join(b, "src")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )


def bibliographic_coupling(
    edges: DataFrame,
    max_degree: int = 64,
    min_common: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(a, b, n_common) for a < b: distinct targets both sources link
    to.  Transpose of :func:`cocitation`; the degree cap applies to
    target in-degree (a page linked from everywhere is dropped)."""
    return cocitation(
        edges, max_degree=max_degree, min_common=min_common,
        src_col=dst_col, dst_col=src_col,
    )
