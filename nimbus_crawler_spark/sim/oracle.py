"""Sequential oracle: the reference semantics as a scalar discrete simulation.

The reference is a free-running async pipeline whose observed order is
timing-dependent (SURVEY.md §3.4). The deterministic ground truth this oracle
implements — and that the Spark engine must reproduce *exactly* — is the
reference executed sequentially under a logical clock:

* FIFO frontier ≡ priority ``(depth, seq)`` where ``seq`` is the discovery
  counter (seeds: file order; children: ``parent_seq·stride + pos + 1`` in
  document order — parser.go:196-208, seeder.go:28-72);
* per-host sliding-window politeness quantized to rounds via the shared
  ``host_budget`` formula (ratelimiter.go:12-27 → operators/politeness.py);
* robots gating before rate limiting (crawler.go:152-182): denied URLs are
  skipped in the round they first become eligible and consume no budget;
* fetch = closed-world lookup in the ``pages`` table; missing row or
  lang='binary' (content-type gate, fetcher.go:153-157) ⇒ retry with
  deterministic backoff rounds (backoff.go:11-15, jitter=0), terminal
  ``failed`` at max_retries (models/url.go IncrementRetryAndMaybeFailURL);
* content dedup first-wins in crawl order (parser.go:111-128);
* children merged at end of round, eligible from round r+1; per-page
  order-preserving dedup inside extract_links (extractor.go:68-72); global
  first-discovery-wins across the round ordered by (child depth, child seq);
* frontier backpressure (parser.go:158-164): when the pending frontier
  exceeds the threshold at round start, no children are enqueued this round
  (they are NOT in the seen set — rediscoverable later, reference parity).

The oracle shares the *pure kernels* (extract/robots/urlnorm/keys/backoff)
with the engine; what it independently specifies is the scheduling, state
machine, and dedup order the Spark plans must reproduce.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..config import CrawlConfig
from ..functions.backoff import backoff_rounds
from ..functions.extract import extract_links, extract_text
from ..functions.keys import html_key, text_key
from ..functions.robots import extract_crawl_delay_ms, parse_robots
from ..functions.urlnorm import hostname, parse_url, registrable_domain
from ..sources.seeds import parse_seed_lines


@dataclass
class OracleResult:
    url_state: dict[str, dict] = field(default_factory=dict)
    domains: dict[str, dict] = field(default_factory=dict)
    crawl_order: list[dict] = field(default_factory=list)  # crawl_seq, round, url, depth, host
    extracted: dict[str, dict] = field(default_factory=dict)  # url → text/links/keys
    rounds_run: int = 0

    @property
    def seen_set(self) -> set[str]:
        return set(self.url_state)


def _politeness_key(host: str, cfg: CrawlConfig) -> str:
    return registrable_domain(host) if cfg.politeness_key == "registrable_domain" else host


def simulate(
    pages: dict[str, dict],
    seeds_text: str,
    cfg: CrawlConfig = CrawlConfig(),
    max_rounds: int = 500,
) -> OracleResult:
    res = OracleResult()
    state = res.url_state
    domains = res.domains

    robots_bodies: dict[str, str] = {}
    for url, p in pages.items():
        if url.endswith("/robots.txt") and url.startswith("https://"):
            robots_bodies[url[len("https://") : -len("/robots.txt")]] = (
                p["html"].decode("utf-8", errors="replace")
                if isinstance(p["html"], (bytes, bytearray))
                else p["html"]
            )

    def ensure_domain(pkey: str, r: int) -> dict:
        d = domains.get(pkey)
        if d is None:
            body = robots_bodies.get(pkey)
            # robots checking disabled ⇒ reference paces at the default delay
            # (crawler.go:152-169: IsAllowed — and its delay — is skipped)
            delay = (
                extract_crawl_delay_ms(body)
                if cfg.respect_robots_txt
                else cfg.default_crawl_delay_ms
            )
            d = {
                "robots_body": body,
                "crawl_delay_ms": delay,
                "next_free_ms": 0,
                "first_seen_round": r,
            }
            domains[pkey] = d
        return d

    # --- seed round (seeder.go:18-81; verbatim URLs, file order) ---
    for i, (url, host) in enumerate(parse_seed_lines(seeds_text)):
        if url in state:
            continue
        state[url] = {
            "host": host,
            "depth": 0,
            "seq": i,
            "status": "pending",
            "retry_count": 0,
            "next_round": 0,
            "content_hash": None,
            "html_key": None,
            "text_key": None,
            "discovered_round": -1,
        }

    seen_hashes: set[str] = set()
    fetch_seq = 0
    stride = cfg.max_links_per_page

    for r in range(max_rounds):
        frontier = [
            (u, s) for u, s in state.items() if s["status"] in ("pending", "crawling")
        ]
        if not frontier:
            res.rounds_run = r
            return res
        backpressured = (
            cfg.frontier_backpressure is not None
            and len(frontier) > cfg.frontier_backpressure
        )
        # O4 lossy trim (XAdd MaxLen analog): evict the OLDEST frontier rows
        # by (discovered_round, depth, seq) down to the cap; victims become
        # terminal 'trimmed' but remain in the seen set
        if cfg.frontier_trim is not None and len(frontier) > cfg.frontier_trim:
            frontier.sort(
                key=lambda t: (t[1]["discovered_round"], t[1]["depth"], t[1]["seq"])
            )
            n_drop = len(frontier) - cfg.frontier_trim
            for _u, s in frontier[:n_drop]:
                s["status"] = "trimmed"
            frontier = frontier[n_drop:]
        eligible = sorted(
            (
                (u, s)
                for u, s in frontier
                if s["next_round"] <= r and s["depth"] <= cfg.max_depth
            ),
            key=lambda t: (t[1]["depth"], t[1]["seq"]),
        )
        if not eligible:
            continue

        # robots gate first (F5 precedes rate limit, crawler.go:152-182)
        runnable: list[tuple[str, dict]] = []
        robots_cache: dict[str, object] = {}
        for u, s in eligible:
            pkey = _politeness_key(s["host"], cfg)
            d = ensure_domain(pkey, r)
            body = d["robots_body"]
            if body and cfg.respect_robots_txt:
                data = robots_cache.get(pkey)
                if data is None:
                    data = parse_robots(body)
                    robots_cache[pkey] = data
                p = parse_url(u)
                uri = p.request_uri() if p else "/"
                if not data.test_agent(uri, "NimbusCrawler"):
                    s["status"] = "skipped"
                    continue
            runnable.append((u, s))

        # politeness budgets (shared formula — operators/politeness.py)
        from ..operators.politeness import host_budget

        budgets: dict[str, int] = {}
        t0s: dict[str, int] = {}
        taken: dict[str, int] = {}
        selected: list[tuple[str, dict]] = []
        for u, s in runnable:
            pkey = _politeness_key(s["host"], cfg)
            d = domains[pkey]
            if pkey not in budgets:
                budgets[pkey], t0s[pkey] = host_budget(
                    d["next_free_ms"], d["crawl_delay_ms"], r, cfg.round_ms
                )
                taken[pkey] = 0
            if taken[pkey] < budgets[pkey]:
                if cfg.round_capacity is not None and len(selected) >= cfg.round_capacity:
                    break
                taken[pkey] += 1
                selected.append((u, s))
        for pkey, k in taken.items():
            if k > 0:
                domains[pkey]["next_free_ms"] = t0s[pkey] + k * domains[pkey]["crawl_delay_ms"]

        # fetch + parse in crawl order
        children: list[tuple[str, str, int, int]] = []  # url, host, depth, seq
        for u, s in selected:
            page = pages.get(u)
            # null html is a fetch failure (matches the engine's _ok gate:
            # html IS NOT NULL AND lang != 'binary')
            ok = (
                page is not None
                and page.get("html") is not None
                and page.get("lang") != "binary"
            )
            if not ok:
                s["retry_count"] += 1
                if s["retry_count"] >= cfg.max_retries:
                    s["status"] = "failed"
                else:
                    s["status"] = "crawling"
                    s["next_round"] = r + backoff_rounds(
                        s["retry_count"], cfg.round_ms, cfg.backoff_jitter
                    )
                continue
            html = page["html"]
            res.crawl_order.append(
                {"crawl_seq": fetch_seq, "round": r, "url": u, "depth": s["depth"], "host": s["host"]}
            )
            fetch_seq += 1
            s["html_key"] = html_key(u)
            import hashlib

            h = hashlib.sha256(html).hexdigest()
            if h in seen_hashes:
                # dup path persists status + html link only (parser.go:123
                # calls UpdateURLStatus; content_hash is written solely by
                # UpdateURLParsed) — content_hash/text_key stay NULL
                s["status"] = "skipped"
                continue
            s["content_hash"] = h
            links = extract_links(html, u) or []
            text = extract_text(html)
            s["text_key"] = text_key(u)
            s["status"] = "parsed"
            seen_hashes.add(h)
            res.extracted[u] = {
                "text": text,
                "links": links,
                "html_key": s["html_key"],
                "text_key": s["text_key"],
                "content_hash": h,
            }
            if backpressured or s["depth"] + 1 > cfg.max_depth:
                continue
            # stride-bounded fan-out: at most max_links_per_page children
            # (mirrors the engine's F.slice before posexplode)
            for pos, link in enumerate(links[: cfg.max_links_per_page]):
                child_host = hostname(link)
                if not child_host:
                    continue
                children.append((link, child_host, s["depth"] + 1, s["seq"] * stride + pos + 1))

        # merge children (first-wins by (depth, seq) — selected order is already
        # (depth, seq)-sorted, so iteration order IS discovery order)
        for link, child_host, depth, seq in children:
            if link in state:
                continue
            state[link] = {
                "host": child_host,
                "depth": depth,
                "seq": seq,
                "status": "pending",
                "retry_count": 0,
                "next_round": r + 1,
                "content_hash": None,
                "html_key": None,
                "text_key": None,
                "discovered_round": r,
            }

    res.rounds_run = max_rounds
    return res
