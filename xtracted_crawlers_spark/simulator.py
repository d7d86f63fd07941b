"""Pure-Python reference simulator — the parity oracle for crawl ordering,
final URL-seen set, and extraction bytes (SURVEY.md §5 "crawl-equivalence").

Encodes the reference's observable semantics (§2 B/C/F) with plain dicts
and the SAME pure extraction kernel the engine's Arrow UDF uses
(extract.extract_one), so engine-vs-simulator equality checks ordering and
state-machine logic, while extraction byte-equality is checked separately
against golden fixtures. Deliberately sequential and driver-side — it is
a test oracle, never a production path.

Semantics mirrored:
- seed ingest in submission order; first occurrence of an identity wins
  (check-then-insert, crawlers_services.py:76-95); unroutable URLs are
  dropped (extractor_factory.py returns None);
- job_urls_seq: per-user counter incremented per successful insert;
- per round: eligible = status∈{pending,running} ∧ retries<3, robots
  Disallow gate, per-host FIFO by (priority, seq) capped by the host
  budget, then global cut by (priority, seq);
- fetch hit ⇒ extract; success ⇒ complete+payload; failure or fetch miss
  ⇒ status running, retries+1, error appended; give-up at 3.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

from .extract import extract_one
from .scheduler import parse_robots
from .urlnorm import py_host, py_url_id, py_url_type


@dataclass
class SimRow:
    user_id: str
    job_id: int
    url_id: str
    url: str
    url_type: str
    host: str
    status: str = "pending"
    retries: int = 0
    errors: list[str] = field(default_factory=list)
    priority: int = 0
    job_urls_seq: int = 0
    payload_json: Optional[str] = None
    text: Optional[str] = None
    round: int = 0


class ReferenceSimulator:
    def __init__(
        self,
        pages: dict[str, str],  # url -> html
        robots: Optional[dict[str, str]] = None,  # host -> robots_txt
        round_seconds: float = 60.0,
        default_budget: Optional[int] = None,
        global_budget: Optional[int] = None,
        max_tokens: Optional[dict[str, int]] = None,
        quota: Optional[dict[str, int]] = None,  # user_id -> api_requests
        host_scores: Optional[dict[str, float]] = None,  # host -> authority
        priority_buckets: int = 4,
        token_carryover: bool = False,  # twin of CrawlConfig.token_carryover
        burst_rounds: int = 4,
        fair_users: bool = False,  # twin of CrawlConfig.fair_users
        domain_budget: Optional[int] = None,  # twin of CrawlConfig.domain_budget
    ):
        self.pages = pages
        self.rows: dict[tuple[str, int, str], SimRow] = {}
        self.seq: dict[str, int] = {}
        self.round_seconds = round_seconds
        self.default_budget = default_budget if default_budget is not None else 2**62
        self.global_budget = global_budget
        self.rules: dict[str, tuple[list[str], list[str], Optional[float]]] = {}
        self.max_tokens = max_tokens or {}
        # twin of scheduler.with_host_priority/priority_decade: log-decade
        # buckets, 0 = most authoritative, unscored hosts sort last
        self.host_scores = host_scores
        self.priority_buckets = priority_buckets
        # A5 quota: remaining api_requests per user (context.py:147-150);
        # users absent from the dict are unlimited
        self.quota = dict(quota) if quota is not None else None
        # twin of scheduler.token_budgets/spend_tokens: banked unspent
        # grant per RULED host, clamped at capacity = refill*burst_rounds
        self.token_carryover = token_carryover
        self.burst_rounds = burst_rounds
        self.fair_users = fair_users
        self.domain_budget = domain_budget
        self.tokens: dict[str, int] = {}
        for h, txt in (robots or {}).items():
            self.rules[h] = parse_robots(txt)

    # -- ingest -------------------------------------------------------------
    def submit(self, user_id: str, job_id: int, urls: list[str]) -> None:
        for url in urls:
            uid = py_url_id(url)
            ty = py_url_type(url)
            if not uid or not ty:
                continue  # no extractor routes it
            key = (user_id, job_id, uid)
            if key in self.rows:
                continue  # duplicate identity
            self.seq[user_id] = self.seq.get(user_id, 0) + 1
            self.rows[key] = SimRow(
                user_id=user_id,
                job_id=job_id,
                url_id=uid,
                url=url,
                url_type=ty,
                host=py_host(url),
                job_urls_seq=self.seq[user_id],
                priority=self._host_priority(py_host(url)),
            )

    def _host_priority(self, host: str) -> int:
        # mirror of scheduler.priority_decade over a host_scores table:
        # max(0, n_buckets - digits(long(score))); absent host → n_buckets
        if self.host_scores is None:
            return 0
        score = self.host_scores.get(host)
        if score is None:
            return self.priority_buckets
        return max(0, self.priority_buckets - len(str(int(score))))

    # -- politeness ----------------------------------------------------------
    def _host_budget(self, host: str) -> int:
        rule = self.rules.get(host)
        budget = self.default_budget if rule is None else 2**62
        if rule is not None and rule[2]:
            budget = min(budget, int(self.round_seconds / rule[2]))
        if host in self.max_tokens:
            budget = min(budget, self.max_tokens[host])
        return budget

    def _token_budget(self, host: str) -> int:
        """Twin of scheduler.token_budgets for one RULED host:
        min(capacity, banked + refill), capacity = min(max_tokens,
        refill * burst_rounds), refill = floor(round_seconds / delay)."""
        from .scheduler import _TOKEN_UNCAPPED

        if self.burst_rounds < 1:
            raise ValueError(f"burst_rounds must be >= 1, got {self.burst_rounds}")
        rule = self.rules[host]
        refill = int(self.round_seconds / rule[2]) if rule[2] else _TOKEN_UNCAPPED
        cap = min(
            self.max_tokens.get(host, 2**31 - 1),
            refill * self.burst_rounds,
            _TOKEN_UNCAPPED,
        )
        return min(cap, self.tokens.get(host, 0) + refill)

    def _disallowed(self, row: SimRow) -> bool:
        # RFC 9309 longest-match via the shared pure twin: the most-
        # specific (longest DECODED pattern, '*'/'$' wildcards counted)
        # matching Disallow blocks unless an Allow of >= specificity
        # matches (Allow wins ties); %-octets decode on both sides
        # (patterns at parse_robots time, the path inside robots_blocked)
        rule = self.rules.get(row.host)
        if not rule:
            return False
        from urllib.parse import urlparse

        from .scheduler import robots_blocked

        pr = urlparse(row.url)
        path = pr.path + (("?" + pr.query) if pr.query else "")
        return robots_blocked(path, rule[0], rule[1])

    # -- rounds ---------------------------------------------------------------
    def run_round(self, round_id: int) -> dict[str, Any]:
        eligible = [
            r
            for r in self.rows.values()
            if r.status in ("pending", "running") and r.retries < 3 and not self._disallowed(r)
        ]
        if self.fair_users:
            # twin of select_round(fair_users=True): per-user queue
            # position in (priority, seq, job, url) order, then a
            # round-robin interleave across users
            eligible.sort(key=lambda r: (r.priority, r.job_urls_seq, r.job_id, r.url_id))
            pos: dict[str, int] = {}
            keyed = []
            for r in eligible:
                p = pos.get(r.user_id, 0) + 1
                pos[r.user_id] = p
                keyed.append(((r.priority, p, r.user_id, r.job_urls_seq, r.job_id, r.url_id), r))
            keyed.sort(key=lambda t: t[0])
            eligible = [r for _, r in keyed]
        else:
            eligible.sort(key=lambda r: (r.priority, r.job_urls_seq, r.user_id, r.job_id, r.url_id))
        round_budgets: dict[str, int] = {}
        if self.token_carryover:
            # budgets snapshot BEFORE the cut (twin of token_budgets
            # reading last round's committed state); ruled hosts only —
            # unruled hosts stay on the memoryless default_budget
            round_budgets = {h: self._token_budget(h) for h in self.rules}
        taken: list[SimRow] = []
        per_host: dict[str, int] = {}
        per_domain: dict[str, int] = {}
        for r in eligible:
            budget = round_budgets.get(r.host)
            if budget is None:
                budget = self._host_budget(r.host)
            if per_host.get(r.host, 0) >= budget:
                continue
            # a host-cut survivor consumes its host slot even when the
            # domain cut then drops it — twin of the engine's window
            # order (host rank first, domain rank over the survivors)
            per_host[r.host] = per_host.get(r.host, 0) + 1
            if self.domain_budget is not None:
                from .urlnorm import py_registrable_domain

                d = py_registrable_domain(r.host)
                if per_domain.get(d, 0) >= self.domain_budget:
                    continue
                per_domain[d] = per_domain.get(d, 0) + 1
            taken.append(r)
        if self.global_budget is not None:
            taken = taken[: self.global_budget]
        if self.quota is not None:
            kept: list[SimRow] = []
            per_user: dict[str, int] = {}
            for r in taken:
                req = self.quota.get(r.user_id)
                if req is None:
                    kept.append(r)
                    continue
                c = per_user.get(r.user_id, 0)
                if c < req:
                    per_user[r.user_id] = c + 1
                    kept.append(r)
            taken = kept
        if self.token_carryover and taken:
            # twin of spend_tokens: spent = the POST-quota dispatched set.
            # An empty round banks NOTHING — the engine's run_round
            # early-exits before the host_tokens commit when selected==0
            spent: dict[str, int] = {}
            for r in taken:
                spent[r.host] = spent.get(r.host, 0) + 1
            for h, b in round_budgets.items():
                self.tokens[h] = max(0, b - spent.get(h, 0))
        completed = failed = missed = 0
        for r in taken:
            r.round = round_id
            html = self.pages.get(r.url)
            if html is None:
                r.status = "running"
                r.retries += 1
                r.errors.append("ExtractionError('fetch miss: url absent from pages')")
                missed += 1
                continue
            pj, tx, er = extract_one(r.url, html)
            if er is None:
                r.status = "complete"
                r.payload_json = pj
                r.text = tx
                completed += 1
            else:
                r.status = "running"
                r.retries += 1
                r.errors.append(er)
                failed += 1
            if r.status == "complete" and self.quota is not None and r.user_id in self.quota:
                self.quota[r.user_id] -= 1  # decrement-on-complete
        return {
            "round": round_id,
            "selected": len(taken),
            "completed": completed,
            "extract_failed": failed,
            "fetch_missed": missed,
        }

    def run(self, max_rounds: int = 100) -> list[dict[str, Any]]:
        out = []
        for r in range(1, max_rounds + 1):
            m = self.run_round(r)
            out.append(m)
            if m["selected"] == 0:
                break
        return out

    # -- oracle views ----------------------------------------------------------
    def frontier_rows(self) -> list[dict[str, Any]]:
        return [
            {
                "user_id": r.user_id,
                "job_id": r.job_id,
                "url_id": r.url_id,
                "url": r.url,
                "status": r.status,
                "retries": r.retries,
                "errors": list(r.errors),
                "job_urls_seq": r.job_urls_seq,
                "priority": r.priority,
                "payload_json": r.payload_json,
                "text": r.text,
            }
            for r in self.rows.values()
        ]

    def seen_set(self) -> set[tuple[str, int, str]]:
        return set(self.rows.keys())

    def crawl_order(self) -> list[tuple[str, int]]:
        """(user_id, seq) in crawl order per user — the F1 invariant."""
        done = [r for r in self.rows.values() if r.status == "complete"]
        done.sort(key=lambda r: (r.user_id, r.round, r.priority, r.job_urls_seq))
        return [(r.user_id, r.job_urls_seq) for r in done]
