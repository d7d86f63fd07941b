"""Redirect-chain resolution, fully in-plan.

A crawler that ignores 3xx chains both loses pages (the content lives
at the final URL) and poisons its seen-set / dedup keys (the same page
reached via N aliases counts N times). The reference crawler gets this
implicitly — its headless browser follows redirects inside page.goto()
(reference: amazon_async_product.py fetch path) — so a batch engine
must reproduce it explicitly over a redirect-edge table harvested from
fetch results (status 301/302/303/307/308 + Location header).

Shape, 100-TB first:
- ``edges`` is (src, dst) with AT MOST ONE dst per src (a fetch
  observes one Location per URL; enforce upstream). It holds only the
  3xx rows — typically a few percent of fetches — so each hop is an
  equi-join of the still-unresolved frontier against a much smaller
  table, shuffling on the url key like any frontier join.
- resolution unrolls ``max_hops`` joins into ONE lazy DAG; no
  collect, no driver loop state. Real crawlers cap hops anyway
  (curl defaults to 50, browsers ~20), so the unroll bound is the
  semantics, not a compromise.
- loop detection carries the visited path as an array column —
  bounded by max_hops+1 entries, so row width stays O(max_hops).

Statuses:
- ``ok``        chain terminated (a URL with no outgoing redirect);
- ``loop``      the next hop is already on the path (cycle) — final_url
                is the LAST url before re-entry;
- ``too_many``  still redirecting after max_hops follows (the curl
                --max-redirs behavior).

n_hops counts FOLLOWED redirects (0 for a URL that redirects nowhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(
    urls: DataFrame,
    edges: DataFrame,
    max_hops: int = 8,
    url_col: str = "url",
) -> DataFrame:
    """(url, final_url, n_hops, status) for every input url. ``edges``
    must be (src, dst), one dst per src."""
    e = edges.select(F.col("src").alias("_src"), F.col("dst").alias("_dst"))
    cur = urls.select(F.col(url_col).alias("url")).select(
        "url",
        F.col("url").alias("final_url"),
        F.array(F.col("url")).alias("_path"),
        F.lit(0).cast("int").alias("n_hops"),
    )
    out_cols = ["url", "final_url", "n_hops", "status"]
    outs = []
    # decided rows LEAVE the frontier each hop, so join k touches only
    # chains still alive at depth k (geometric shrink in practice)
    for _ in range(max_hops):
        j = cur.join(e, cur["final_url"] == e["_src"], "left")
        hit_loop = F.array_contains(F.col("_path"), F.col("_dst"))
        outs.append(
            j.filter(F.col("_dst").isNull())
            .withColumn("status", F.lit("ok"))
            .select(*out_cols)
        )
        outs.append(
            j.filter(F.col("_dst").isNotNull() & hit_loop)
            .withColumn("status", F.lit("loop"))
            .select(*out_cols)
        )
        cur = j.filter(F.col("_dst").isNotNull() & ~hit_loop).select(
            "url",
            F.col("_dst").alias("final_url"),
            F.concat(F.col("_path"), F.array(F.col("_dst"))).alias("_path"),
            (F.col("n_hops") + 1).alias("n_hops"),
        )
    # rows alive after max_hops follows: 'too_many' if still redirecting
    j = cur.join(e, cur["final_url"] == e["_src"], "left")
    outs.append(
        j.withColumn(
            "status",
            F.when(F.col("_dst").isNull(), F.lit("ok")).otherwise(
                F.lit("too_many")
            ),
        ).select(*out_cols)
    )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def canonical_alias_map(resolved: DataFrame) -> DataFrame:
    """(url, canonical_url) for seen-set / dedup keying: every alias on
    a terminated chain maps to its final URL; loop and too_many rows
    map to themselves (there is no trustworthy canonical inside a cycle
    or an unfinished chain — crawlers treat both as fetch errors)."""
    return resolved.select(
        "url",
        F.when(F.col("status") == "ok", F.col("final_url"))
        .otherwise(F.col("url"))
        .alias("canonical_url"),
    )
