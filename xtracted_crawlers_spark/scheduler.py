"""Politeness scheduler: robots rules, crawl-delay token buckets, per-host
priority queues with skew mitigation (new surface required by north_rule —
the reference's only politeness is a global 1-task concurrency cap,
crawler_configuration.py:6-11, so these semantics are defined HERE and
documented as new; at test scale with budget=∞ the schedule degenerates to
the reference's FIFO-by-seq order, which is the compatibility invariant).

Per round:
1. robots gate: rows whose URL path matches a Disallow prefix for their
   host are excluded (never fetched, never retried — they stay pending
   and are re-excluded each round; metrics count them);
2. per-host budget = min(max_tokens, floor(round_seconds / crawl_delay))
   — the token bucket a polite fetcher would accumulate over one round;
   hosts without robots rows get ``default_budget``;
3. two-level top-k: rank() within host by (priority, job_urls_seq) —
   FIFO per host, matching the reference's pgmq order — cut at the host
   budget, then a global ordered cut at ``global_budget``
   (TakeOrderedAndProject, not a full sort);
4. skew: the downstream fetch/extract stage repartitions by salted host
   so one hot host spreads over many partitions (urlnorm.salted_host);
   the rank window itself is per-host and bounded by the budget cut.

All pure DataFrame ops — Catalyst handles pushdown; the robots table and
budget table are tiny and broadcast.
"""

from __future__ import annotations

import re
from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import urlnorm

_DEFAULT_ROUND_SECONDS = 60.0


# RFC 9309 §2.2.2 canonical comparison form: percent-encoded octets are
# decoded before matching EXCEPT the ones below, which stay encoded
# (uppercase-normalized) on BOTH the pattern and the path side:
#   %2F '/' — path structure (an encoded slash is not a path separator),
#   %2A '*', %24 '$' — pattern metacharacters (a decoded %2A would
#     silently become a wildcard),
#   %25 '%' — decoding it re-opens triplet ambiguity ('%2525' would
#     collapse twice in a split-based pass).
# Octets outside printable US-ASCII also stay encoded (they are UTF-8
# sequence bytes; per-octet decode would corrupt them).
_KEEP_ENCODED = frozenset({0x2F, 0x2A, 0x24, 0x25})
_HEX_DIGITS = "0123456789ABCDEF"


def decode_robots_octets(s: str) -> str:
    """Canonical %-decode (RFC 9309 §2.2.2) shared by patterns (applied
    at parse time) and URL paths (applied at match time): '%XY' with
    valid hex decodes to its character when the octet is printable
    US-ASCII outside ``_KEEP_ENCODED``; kept triplets uppercase their
    hex; a '%' that does NOT start a valid triplet canonicalizes to
    '%25' (a literal percent — so pattern '%zz' and path '%zz' compare
    equal in one form). Idempotent. Pure twin of ``decode_octets_col``
    (fuzz-tested equivalent)."""
    if "%" not in s:
        return s
    parts = s.split("%")
    out = [parts[0]]
    for frag in parts[1:]:
        h = frag[:2].upper()
        if len(h) == 2 and h[0] in _HEX_DIGITS and h[1] in _HEX_DIGITS:
            o = int(h, 16)
            if 0x20 <= o <= 0x7E and o not in _KEEP_ENCODED:
                out.append(chr(o) + frag[2:])
            else:
                out.append("%" + h + frag[2:])
        else:
            out.append("%25" + frag)
    return "".join(out)


def canonicalize_robots_path(path: str) -> str:
    """Full canonical comparison form for the URL-PATH side: %-decode,
    then encode raw '*' and '$' (legal in URL paths, metacharacters in
    patterns) as %2A/%24 — so the RFC's §2.2.3 special-characters
    example works: pattern '/file-with-a-%2A.html' (the prescribed way
    to write a literal asterisk) matches path '/file-with-a-*.html'.
    Pure twin of the gate's path expression."""
    return decode_robots_octets(path).replace("*", "%2A").replace("$", "%24")


def canonicalize_robots_pattern(p: str) -> str:
    """Canonical comparison form for a PATTERN: %-decode, then encode
    any NON-TRAILING '$' as %24 (RFC 9309 gives '$' meaning only at the
    end of a pattern; elsewhere it is a literal that must match the
    path side's encoded form). Raw '*' stays — it is the wildcard.
    Specificity (longest-match precedence) is the length of THIS
    canonical string, consistently in the gate, the pure twin and the
    oracles."""
    d = decode_robots_octets(p)
    if d.endswith("$"):
        return d[:-1].replace("$", "%24") + "$"
    return d.replace("$", "%24")


def decode_octets_col(c):
    """JVM Column twin of decode_robots_octets: split on '%', decode each
    fragment's leading hex pair via conv+char, re-join. Pure string
    expressions (codegen-able, no UDF); a no-'%' fast path skips the
    transform for the common case."""
    parts = F.split(c, "%", -1)
    rest = F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0)))

    def frag(s):
        h = F.upper(F.substring(s, 1, 2))
        valid = h.rlike("^[0-9A-F]{2}$")
        o = F.conv(h, 16, 10).cast("int")
        keep = o.isin([0x2F, 0x2A, 0x24, 0x25])
        tail = F.substring(s, 3, 2147483647)
        return (
            F.when(valid & (o >= 0x20) & (o <= 0x7E) & ~keep, F.concat(F.char(o), tail))
            .when(valid, F.concat(F.lit("%"), h, tail))
            .otherwise(F.concat(F.lit("%25"), s))
        )

    decoded = F.concat(
        F.element_at(parts, 1), F.array_join(F.transform(rest, frag), "")
    )
    return F.when(c.contains("%"), decoded).otherwise(c)


def canonicalize_path_col(c):
    """JVM Column twin of canonicalize_robots_path: decode octets, then
    encode raw '*'/'$' so path literals meet the patterns' kept forms."""
    return F.replace(
        F.replace(decode_octets_col(c), F.lit("*"), F.lit("%2A")),
        F.lit("$"),
        F.lit("%24"),
    )


def canonicalize_pattern_col(p):
    """JVM Column twin of canonicalize_robots_pattern: decode octets,
    then encode NON-TRAILING '$' as %24 (trailing '$' stays the end
    anchor; raw '*' stays the wildcard)."""
    d = decode_octets_col(p)
    anchored = d.endswith("$")
    body = F.when(anchored, F.substr(d, F.lit(1), F.length(d) - 1)).otherwise(d)
    body = F.replace(body, F.lit("$"), F.lit("%24"))
    return F.when(anchored, F.concat(body, F.lit("$"))).otherwise(body)


def parse_robots(robots_txt: str) -> tuple[list[str], list[str], Optional[float]]:
    """Minimal robots.txt parse for the 'User-agent: *' group: Disallow
    and Allow path patterns (empty value = no rule) and Crawl-delay.
    Patterns may carry RFC 9309 '*' (any char run) and trailing '$'
    (end anchor) wildcards — matching and longest-match precedence are
    applied by the gate, not here. Percent-encoded pattern octets are
    decoded here, at parse time (RFC 9309 §2.2.2 — 'Disallow: /a%3Fb'
    must match path '/a?b'); see decode_robots_octets for the kept-
    encoded exceptions. Pure function; used both by the vectorized
    parser and the simulator."""
    disallow: list[str] = []
    allow: list[str] = []
    delay: Optional[float] = None
    applies = False
    for raw in (robots_txt or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            applies = val == "*"
        elif applies and key == "disallow" and val:
            disallow.append(canonicalize_robots_pattern(val))
        elif applies and key == "allow" and val:
            allow.append(canonicalize_robots_pattern(val))
        elif applies and key == "crawl-delay":
            try:
                delay = float(val)
            except ValueError:
                pass
    return disallow, allow, delay


def robots_pattern_regex(pattern: str) -> str:
    """RFC 9309 path pattern → anchored Python regex: '*' matches any
    char run (incl. empty), a TRAILING '$' anchors at end-of-path, every
    other char is literal (a mid-pattern '$' reaches here as '%24', per
    canonicalize_robots_pattern). Specificity for longest-match
    precedence is the CANONICAL pattern length (decoded octets, wildcard
    chars counted — the gate, the simulator and the oracles all use the
    length of the canonicalized pattern).
    Pure-Python twin of the gate's JVM translation (same split/anchor
    construction; the JVM side quotes with \\Q..\\E, this side with
    re.escape — fuzz-tested equivalent in tests)."""
    ends = pattern.endswith("$")
    core = pattern[:-1] if ends else pattern
    body = ".*".join(re.escape(seg) for seg in core.split("*"))
    return "^" + body + ("$" if ends else "")


def robots_blocked(path: str, disallow: list[str], allow: list[str]) -> bool:
    """Pure-Python twin of apply_robots_gate's per-row decision, for the
    simulator and fuzz tests: patterns are expected in canonical form
    (parse_robots / canonicalize_robots_pattern output); the path is
    canonicalized here the same way the gate canonicalizes its path
    column (decode + encode raw '*'/'$'). Longest canonical pattern
    wins, Allow wins ties."""
    p = canonicalize_robots_path(path)

    def hit(pat: str) -> bool:
        return re.search(robots_pattern_regex(pat), p) is not None

    maxd = max((len(x) for x in disallow if hit(x)), default=0)
    maxa = max((len(x) for x in allow if hit(x)), default=0)
    return maxd > maxa


def _pattern_rx(p):
    """JVM Column twin of robots_pattern_regex: trailing '$' → anchor,
    '*' → '.*', literal segments quoted with \\Q..\\E (any embedded
    '\\E' re-opened the Pattern.quote way), '^' prepended. Pure string
    expressions — evaluated inside the gate's higher-order filter."""
    ends = p.endswith("$")
    core = F.when(ends, F.regexp_replace(p, r"\$$", "")).otherwise(p)
    segs = F.split(core, r"\*", -1)
    esc = F.transform(
        segs,
        lambda s: F.concat(
            F.lit("\\Q"),
            F.replace(s, F.lit("\\E"), F.lit("\\E\\\\E\\Q")),
            F.lit("\\E"),
        ),
    )
    return F.concat(
        F.lit("^"),
        F.array_join(esc, ".*"),
        F.when(ends, F.lit("$")).otherwise(F.lit("")),
    )


def robots_rules(robots: DataFrame) -> DataFrame:
    """(host, disallow array, allow array, crawl_delay_s, max_tokens)
    from the raw robots table; parsing is one Arrow batch pass over a
    tiny table."""

    @F.pandas_udf("disallow array<string>, allow array<string>, delay double")
    def parse(txt: pd.Series) -> pd.DataFrame:
        rows = [parse_robots(t) for t in txt]
        return pd.DataFrame(
            {
                "disallow": [r[0] for r in rows],
                "allow": [r[1] for r in rows],
                "delay": [r[2] for r in rows],
            }
        )

    out = robots.withColumn("_p", parse("robots_txt"))
    return out.select(
        "host",
        F.col("_p.disallow").alias("disallow"),
        F.col("_p.allow").alias("allow"),
        F.coalesce(F.col("crawl_delay_s"), F.col("_p.delay"), F.lit(0.0)).alias("crawl_delay_s"),
        F.coalesce(F.col("max_tokens"), F.lit(2**31 - 1)).alias("max_tokens"),
    )


def host_budgets(
    rules: DataFrame,
    round_seconds: float = _DEFAULT_ROUND_SECONDS,
) -> DataFrame:
    """(host, budget): the per-round token bucket. crawl_delay=0 ⇒ only
    max_tokens caps the host."""
    return rules.select(
        "host",
        F.least(
            F.col("max_tokens").cast("long"),
            F.when(
                F.col("crawl_delay_s") > 0,
                F.floor(F.lit(round_seconds) / F.col("crawl_delay_s")),
            ).otherwise(F.lit(2**62)),
        ).alias("budget"),
    )


# Internal "no finite limit" sentinel for the token-bucket path. Chosen
# far below 2**62 so `tokens + refill` can NEVER overflow a long
# (capacity ≤ 2**40, refill ≤ floor(round_seconds/delay); their sum is
# well under 2**63) while still being unreachable by any real crawl
# round (2**40 ≈ 1.1e12 URLs/round/host).
_TOKEN_UNCAPPED = 2**40


def _token_refill(round_seconds: float) -> F.Column:
    """Tokens granted per round: floor(round_seconds / crawl_delay), the
    polite request count one round permits. No crawl-delay ⇒ uncapped."""
    return (
        F.when(
            F.col("crawl_delay_s") > 0,
            F.floor(F.lit(round_seconds) / F.col("crawl_delay_s")),
        )
        .otherwise(F.lit(_TOKEN_UNCAPPED))
        .cast("long")
    )


def _token_capacity(round_seconds: float, burst_rounds: int) -> F.Column:
    """Bucket capacity: an idle host may bank at most ``burst_rounds``
    rounds of refill, still clamped by the robots max_tokens cap."""
    if burst_rounds < 1:
        # burst_rounds 0 would make capacity 0 and silently starve every
        # ruled host forever (budget stuck at 0) — reject loudly instead
        raise ValueError(f"burst_rounds must be >= 1, got {burst_rounds}")
    refill = _token_refill(round_seconds)
    return F.least(
        F.col("max_tokens").cast("long"),
        F.least(refill * F.lit(burst_rounds), F.lit(_TOKEN_UNCAPPED)),
    )


def token_budgets(
    rules: DataFrame,
    state: Optional[DataFrame] = None,
    round_seconds: float = _DEFAULT_ROUND_SECONDS,
    burst_rounds: int = 4,
) -> DataFrame:
    """(host, budget): the CARRY-OVER per-domain token bucket (north_star
    surface — ``host_budgets`` is its memoryless per-round degenerate).

    budget_r = min(capacity, tokens_{r-1} + refill) where
    refill   = floor(round_seconds / crawl_delay)   (per-round grant)
    capacity = min(max_tokens, refill * burst_rounds) (bank limit)
    tokens   = the carried state from ``spend_tokens`` (0 at bootstrap,
               so round 1 equals the memoryless ``host_budgets`` cut for
               any finitely-budgeted host — the compatibility invariant;
               a host whose frontier runs dry banks its unspent grant
               and may burst up to ``capacity`` when URLs arrive).

    Pure column arithmetic over the rules table (one row per host) plus
    one equi-join against the equally tiny state table — the result is
    broadcast into the rank cut by ``select_round``. All integer math:
    the DuckDB oracle reproduces it exactly, and nothing can overflow
    (capacity ≤ 2**40, see _TOKEN_UNCAPPED)."""
    b = rules.select(
        "host",
        _token_refill(round_seconds).alias("_refill"),
        _token_capacity(round_seconds, burst_rounds).alias("_cap"),
    )
    if state is not None:
        b = b.join(state.select("host", "tokens"), "host", "left")
    else:
        b = b.withColumn("tokens", F.lit(None).cast("long"))
    return b.select(
        "host",
        F.least(
            F.col("_cap"), F.coalesce(F.col("tokens"), F.lit(0)) + F.col("_refill")
        ).alias("budget"),
    )


def spend_tokens(budgets: DataFrame, selection: DataFrame) -> DataFrame:
    """Next-round token state (host, tokens): this round's unspent budget.
    Left join over ALL budgeted hosts — a host that selected nothing
    keeps (and therefore banks) its entire budget; ``token_budgets``
    re-clamps at capacity next round. The selection side is the round's
    politeness-cut (bounded) set; budgets is one row per ruled host, so
    this is a tiny aggregate + tiny join, committed as the host_tokens
    snapshot by the crawl loop."""
    spent = selection.groupBy("host").agg(F.count(F.lit(1)).cast("long").alias("_spent"))
    return budgets.join(spent, "host", "left").select(
        "host",
        F.greatest(
            F.lit(0).cast("long"),
            F.col("budget") - F.coalesce(F.col("_spent"), F.lit(0)),
        ).alias("tokens"),
    )


def apply_robots_gate(selectable: DataFrame, rules: Optional[DataFrame]) -> DataFrame:
    """Drop rows blocked by their host's robots rules: RFC 9309
    longest-match precedence — the most-specific (longest raw pattern,
    wildcards counted) matching Disallow blocks unless an Allow of equal
    or greater specificity also matches (Allow wins ties). Patterns
    support '*' and trailing '$' wildcards; plain prefixes (the common
    case in the wild) take a startswith fast-path so the per-row regex
    compile only ever runs for rules that actually carry a wildcard.
    With no Allow rules this degrades to the any-Disallow-match gate.
    Pure JVM exprs (filter + aggregate over the tiny broadcast rule
    arrays).

    RFC 9309 §2.2.2/§2.2.3 canonical form: both sides are compared in
    one form — octets decoded (except the kept metacharacter set),
    raw '*'/'$' in the PATH encoded to %2A/%24, non-trailing '$' in
    PATTERNS encoded to %24. Patterns canonicalize once per host row
    here (so hand-built rule tables behave like parse_robots output —
    the transform is idempotent); the path canonicalizes per selectable
    row behind a no-'%' fast path inside the decode. Specificity for
    longest-match precedence is the CANONICAL pattern length,
    consistently in the gate, the simulator and the oracles."""
    if rules is None:
        return selectable
    rules_dec = rules.select(
        "host",
        F.transform(F.col("disallow"), canonicalize_pattern_col).alias("disallow"),
        F.transform(F.col("allow"), canonicalize_pattern_col).alias("allow"),
    )
    gated = selectable.join(F.broadcast(rules_dec), "host", "left")
    # RFC 9309 matches against the path INCLUDING the query string
    # ('/*.php$' must NOT match '/filename.php?parameters' — spec example)
    q = F.try_parse_url("url", F.lit("QUERY"))
    path = canonicalize_path_col(
        F.concat(
            F.coalesce(F.try_parse_url("url", F.lit("PATH")), F.lit("")),
            F.when(q.isNotNull(), F.concat(F.lit("?"), q)).otherwise(F.lit("")),
        )
    )

    def longest_match(col: str):
        def matches(p):
            wild = p.contains("*") | p.endswith("$")
            return F.when(wild, F.regexp_like(path, _pattern_rx(p))).otherwise(
                path.startswith(p)
            )

        matching = F.filter(
            F.coalesce(F.col(col), F.array().cast("array<string>")), matches
        )
        return F.aggregate(matching, F.lit(0), lambda acc, p: F.greatest(acc, F.length(p)))

    blocked = longest_match("disallow") > longest_match("allow")
    return gated.filter(~blocked).drop("disallow", "allow")


def select_round(
    selectable: DataFrame,
    rules: Optional[DataFrame] = None,
    round_seconds: float = _DEFAULT_ROUND_SECONDS,
    default_budget: Optional[int] = None,
    global_budget: Optional[int] = None,
    max_host_budget: Optional[int] = None,
    budgets: Optional[DataFrame] = None,
    fair_users: bool = False,
    domain_budget: Optional[int] = None,
) -> DataFrame:
    """The round's fetch set: robots gate → per-host FIFO rank ≤ budget →
    per-domain rank ≤ domain_budget → global ordered cut.

    ``domain_budget``: optional LITERAL cap on rows per registrable
    domain (eTLD+1 — urlnorm.registrable_domain) per round, applied to
    the host-cut survivors in crawl order. Per-host budgets alone
    over-crawl multi-subdomain sites (shard1.example.co.uk and
    shard2.example.co.uk are one crawl target with one operator); this
    is the domain-level politeness backstop. Literal cap ⇒ the domain
    window runs as a Partial WindowGroupLimit, same pruning as the host
    window.

    ``budgets``: optional explicit (host, budget) table — e.g. the
    carry-over ``token_budgets`` — overriding the memoryless per-round
    derivation from ``rules``. The robots Disallow/Allow gate still
    comes from ``rules`` either way.

    ``fair_users``: opt-in multi-tenant fairness. The default crawl
    order is the reference's global FIFO by (priority, job_urls_seq) —
    under a global budget a tenant who enqueued first monopolizes every
    round until their backlog drains. With fairness on, the global cut
    orders by (priority, per-user position, …): position k of EVERY
    user beats position k+1 of any user, i.e. a round-robin interleave
    (the new per-user rank window shuffles on user_id — same cardinality
    class as the per-host window it runs beside). Per-host budgets and
    the robots gate are unchanged; with a single user the schedule is
    provably identical to the default.

    Shuffle pruning: a LITERAL rank cap turns the window into a
    WindowGroupLimit with a Partial stage BEFORE the exchange — each map
    task forwards only its per-host top-K, so the rank shuffle moves
    O(hosts·K) rows instead of the whole selectable frontier. The cap is
    sound for any row with _host_rank > global_budget (at least
    global_budget same-host rows precede it in crawl order, so the
    global cut excludes it regardless of host budgets) and for
    max_host_budget when the caller knows an upper bound on every
    per-host budget (e.g. max crawl-rate × round_seconds fleet-wide).

    The per-user position window deliberately carries NO such cap: a
    literal ``_user_pos <= global_budget`` filter is UNSOUND, unlike the
    host-rank cap. The host cap is sound because a row's same-host
    predecessors survive the (per-host-constant) budget cut whenever the
    row itself does; a user's predecessors span OTHER hosts with other
    budgets, so they can all die in their own host cuts and the global
    cut then reaches a row whose _user_pos exceeds global_budget
    (budgets h1=0,h2=1, G=1, users a/b each with pos-1@h1, pos-2@h2 ⇒
    a's pos-2 row is selected — pinned by
    tests/test_skew.py::test_fair_users_user_position_window_cap_would_be_unsound).
    Compacting positions post-cut is equally out: positions are defined
    over the full gated set (oracle + simulator), and compaction changes
    the cross-user interleave at the cut boundary. A mega-tenant
    therefore pays one full sort of its partition here; the sort spills
    rather than breaking, and the host window downstream still
    group-limits."""
    gated = apply_robots_gate(selectable, rules)
    # full tie-break (user_id, job_id, url_id) — two users can share a
    # (priority, seq) pair; the schedule must be deterministic for parity
    if fair_users:
        wu = Window.partitionBy("user_id").orderBy(
            "priority", "job_urls_seq", "job_id", "url_id"
        )
        gated = gated.withColumn("_user_pos", F.row_number().over(wu).cast("long"))
        order = ["priority", "_user_pos", "user_id", "job_urls_seq", "job_id", "url_id"]
    else:
        order = ["priority", "job_urls_seq", "user_id", "job_id", "url_id"]
    w = Window.partitionBy("host").orderBy(*order)
    ranked = gated.withColumn("_host_rank", F.row_number().over(w))
    caps = [c for c in (global_budget, max_host_budget) if c is not None]
    if caps:
        ranked = ranked.filter(F.col("_host_rank") <= F.lit(min(caps)))
    if budgets is None and rules is not None:
        budgets = host_budgets(rules, round_seconds)
    if budgets is not None:
        ranked = ranked.join(F.broadcast(budgets.select("host", "budget")), "host", "left")
    else:
        ranked = ranked.withColumn("budget", F.lit(None).cast("long"))
    eff_default = default_budget if default_budget is not None else 2**62
    ranked = ranked.withColumn("_budget", F.coalesce(F.col("budget"), F.lit(eff_default)))
    cut = ranked.filter(F.col("_host_rank") <= F.col("_budget")).drop("budget", "_budget")
    if domain_budget is not None:
        wd = Window.partitionBy(
            urlnorm.registrable_domain(F.col("host"))
        ).orderBy(*order)
        cut = (
            cut.withColumn("_dom_rank", F.row_number().over(wd))
            .filter(F.col("_dom_rank") <= F.lit(domain_budget))
            .drop("_dom_rank")
        )
    if global_budget is not None:
        # ordered global cut — top-k by crawl order, not a full sort
        cut = cut.orderBy(*order).limit(global_budget)
    return cut.drop("_host_rank", "_user_pos")


def priority_decade(score_col, n_buckets: int = 4):
    """Authority score → small-int priority bucket, 0 = most
    authoritative = scheduled first (select_round orders by priority
    before FIFO seq). Log-decade bucketing: priority =
    max(0, n_buckets - digits(score)) — scores 1-9 land in the last
    bucket, 10-99 one earlier, ≥10^(n_buckets-1) in bucket 0. Chosen
    over ntile/percentile for the 100-TB path: it is a PER-ROW
    expression (zero shuffle, no single-partition ranking window over
    the host table) and exact in integer arithmetic, so the DuckDB
    oracle reproduces it byte-for-byte (float log2 differs in ULPs
    between engines at power-of-two boundaries). Natural fit for
    power-law link-degree scores, where decade = authority tier."""
    digits = F.length(F.col(score_col).cast("long").cast("string"))
    return F.greatest(F.lit(0), F.lit(n_buckets) - digits).cast("int")


def with_host_priority(
    frontier_df: DataFrame,
    host_scores: DataFrame,
    n_buckets: int = 4,
    score_col: str = "score",
) -> DataFrame:
    """Stamp per-host crawl priority from an authority score table
    (host, score) — e.g. linkgraph.host_degrees in-degree or PageRank —
    onto frontier rows. Hosts without a score sort after every scored
    bucket (priority = n_buckets). The scores table is one row per host
    (small side); the hint is left to AQE, which broadcasts when it
    actually is. This is the frontier-priority composition the
    north_star's 'host-partitioned priority queues' implies beyond the
    reference's constant priority 0 (pg_crawl_job_worker inserts have
    no priority column at all — new surface, documented).

    Priority takes effect where rows COMPETE across hosts: the global
    ordered cut (select_round's global_budget) and the quota cut
    (quota.apply_quota's crawl order). The per-host rank window
    partitions by host, so with neither a global budget nor quotas
    every selectable row is taken and stamping priority cannot change
    the schedule."""
    pr = host_scores.select(
        "host", priority_decade(score_col, n_buckets).alias("_hp")
    )
    return (
        frontier_df.join(pr, "host", "left")
        .withColumn("priority", F.coalesce(F.col("_hp"), F.lit(n_buckets)).cast("int"))
        .drop("_hp")
    )


def with_politeness_key(
    frontier_df: DataFrame, host_ip: DataFrame, ip_col: str = "ip"
) -> DataFrame:
    """Collapse co-hosted sites onto one politeness key (the Mercator/
    Heritrix 'politeness by IP' option): hosts sharing a resolved
    address share ONE per-host budget/token bucket, because a thousand
    vanity hostnames on one CDN edge are still one server. ``host_ip``
    is (host, ip) from the resolver cache — hosts without a row keep
    their hostname as the key (conservative: unresolved hosts are never
    merged). The frontier's ``host`` column is REPLACED by the key
    ('ip:<addr>' or the original hostname) so select_round's rank
    window, host_budgets and token_budgets all enforce per-server
    politeness unchanged; the original hostname is kept as
    ``origin_host`` for fetch/display. One equi-join against the
    resolver table (hosts-sized, tiny next to the frontier; AQE
    broadcasts it)."""
    m = host_ip.select("host", F.col(ip_col).alias("_ip"))
    return (
        frontier_df.join(m, "host", "left")
        .withColumn("origin_host", F.col("host"))
        .withColumn(
            "host",
            F.coalesce(F.concat(F.lit("ip:"), F.col("_ip")), F.col("host")),
        )
        .drop("_ip")
    )


def salted_repartition(df: DataFrame, salt_n: int = 16, partitions: Optional[int] = None) -> DataFrame:
    """Spread hot hosts across partitions for the fetch/extract stage."""
    key = urlnorm.salted_host(F.col("host"), F.col("job_urls_seq"), salt_n)
    if partitions:
        return df.repartition(partitions, key)
    return df.repartition(key)
