"""Deterministic synthetic web corpus generator (FIXTURES.md §1, §6).

Produces the closed-world ``pages`` table the engine crawls against —
Common-Crawl-style rows ``(url, warc_ts, html, text, lang)`` — plus a
``seeds.txt`` body. Everything is derived from ``random.Random(seed)``; no
wall-clock, no external data.

The golden ``text`` column is constructed *independently* of the engine's
extractor: the generator knows exactly which text nodes it embedded, so the
expected extraction output is assembled from those strings directly
(title+para+anchors concatenated — no whitespace between element boundaries),
not by running the extractor. Byte-level agreement is therefore a real test.

Corpus shape knobs exercise every reference path (FIXTURES.md §1 special rows):
robots-disallowed pages (→ skipped), dead links (→ retry×3 → failed),
duplicate html bytes (→ content-dedup skip), lang='binary' rows (→ the
content-type reject path, fetcher.go:153-157), a link chain deeper than
max_depth (→ depth gate), Zipf host sizes (→ politeness/skew), and seeds in
raw non-normalized form (seeder.go:66).
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone

from ..functions.urlnorm import canonicalize

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu lorem ipsum dolor amet crawl frontier politeness"
).split()


@dataclass
class Corpus:
    pages: list[dict] = field(default_factory=list)        # url, warc_ts, html(bytes), text, lang
    seeds_text: str = ""
    meta: dict = field(default_factory=dict)

    def pages_by_url(self) -> dict[str, dict]:
        return {p["url"]: p for p in self.pages}


def _para(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def _page_html(
    title: str,
    para: str,
    links: list[tuple[str, str]],
    noise: bool,
    heavy_dom: int = 0,
) -> tuple[bytes, str]:
    """Build well-formed HTML5 and its golden extracted text.

    ``heavy_dom`` appends N extra element nodes (realistic pages are
    DOM-heavy, and parse cost scales with node count, not byte count)."""
    li = "".join(f'<li><a href="{href}">{anchor}</a></li>' for href, anchor in links)
    heavy = "".join(
        f'<div class="s{k}"><span>seg{k}</span><em>x</em></div>' for k in range(heavy_dom)
    )
    heavy_text = "".join(f"seg{k}x" for k in range(heavy_dom))
    noise_html = (
        '<script>var x = "SECRET";</script><style>.x{color:red}</style>'
        '<noscript>NOJS</noscript><iframe>FRAME</iframe>'
        '<a href="javascript:void(0)">js</a><a href="mailto:x@y.z">mail</a>'
        '<a href="#frag">frag</a><a href="tel:555">tel</a>'
        if noise
        else ""
    )
    html = (
        f"<html><head><title>HEAD-{title}</title><meta charset=\"utf-8\"></head>"
        f"<body><h1>{title}</h1><p>{para}</p>{noise_html}{heavy}<ul>{li}</ul></body></html>"
    )
    # golden text: body text nodes in document order, concatenated, TrimSpaced.
    noise_text = "jsmailfragtel" if noise else ""
    text = f"{title}{para}{noise_text}{heavy_text}" + "".join(a for _, a in links)
    return html.encode("utf-8"), text.strip()


def make_corpus(
    seed: int = 42,
    n_hosts: int = 5,
    pages_per_host: int = 10,
    zipf_s: float = 1.0,
    fanout: int = 3,
    cross_host_prob: float = 0.25,
    dead_link_prob: float = 0.08,
    dup_content_pairs: int = 2,
    binary_rows: int = 1,
    robots_hosts_frac: float = 0.6,
    chain_beyond_depth: int = 5,
    para_words: tuple[int, int] = (8, 30),
    heavy_dom: int = 0,
) -> Corpus:
    rng = random.Random(seed)
    base_ts = datetime(2026, 1, 1, tzinfo=timezone.utc)

    # paragraph pool: body text is drawn from 512 pre-generated paragraphs —
    # O(1) per page instead of O(words), which is what makes multi-100k-page
    # bench corpora cheap. Page HTML stays unique via the url-derived title.
    para_pool = [_para(rng, rng.randint(*para_words)) for _ in range(512)]

    def pick_para() -> str:
        return para_pool[rng.randrange(len(para_pool))]

    hosts = [f"host{i:02d}.example" for i in range(n_hosts)]
    host_pages: dict[str, int] = {
        h: max(2, int(pages_per_host / (i + 1) ** zipf_s)) for i, h in enumerate(hosts)
    }

    # robots bodies: mix of wildcard groups, NimbusCrawler groups, crawl delays,
    # wildcard-pattern rules, and one slow host.
    robots: dict[str, str] = {}
    for i, h in enumerate(hosts):
        if i / max(1, n_hosts) >= robots_hosts_frac:
            continue
        if i % 4 == 0:
            robots[h] = (
                "User-agent: *\nDisallow: /private/\nCrawl-delay: 0.5\n"
            )
        elif i % 4 == 1:
            robots[h] = (
                "User-agent: NimbusCrawler\nDisallow: /private/\nDisallow: /*.pdf\n"
                "Crawl-delay: 0.05\n\nUser-agent: *\nDisallow: /\n"
            )
        elif i % 4 == 2:
            robots[h] = "User-agent: *\nCrawl-delay: 2\nDisallow: /tmp$\n"
        else:
            robots[h] = "User-agent: *\nDisallow:\n"

    pages: list[dict] = []
    url_of: dict[tuple[str, int], str] = {}
    for h in hosts:
        for j in range(host_pages[h]):
            url_of[(h, j)] = f"https://{h}/" if j == 0 else f"https://{h}/p/{j}"

    # a private (robots-disallowed) page and a deep chain per first host
    h0 = hosts[0]
    private_url = f"https://{h0}/private/x"
    chain_urls = [f"https://{h0}/chain/{k}" for k in range(chain_beyond_depth)]

    dead_candidates = []
    page_links: dict[str, list[tuple[str, str]]] = {}
    for h in hosts:
        n = host_pages[h]
        for j in range(n):
            url = url_of[(h, j)]
            links: list[tuple[str, str]] = []
            for c in range(fanout):
                child = j * fanout + c + 1
                if child < n:
                    # relative links exercise resolution (P4)
                    href = f"/p/{child}" if rng.random() < 0.5 else url_of[(h, child)]
                    links.append((href, f"l{j}c{c}"))
                elif rng.random() < cross_host_prob:
                    oh = rng.choice(hosts)
                    oj = rng.randrange(host_pages[oh])
                    links.append((url_of[(oh, oj)], f"x{j}c{c}"))
            if rng.random() < dead_link_prob:
                dead = f"https://{h}/missing/{j}"
                links.append((dead, f"dead{j}"))
                dead_candidates.append(dead)
            if j == 0 and h == h0:
                links.append((private_url, "priv"))
                links.append((chain_urls[0], "chain0"))
            page_links[url] = links

    # chain pages: each links to the next (one link), depth grows past max_depth
    for k, cu in enumerate(chain_urls):
        nxt = chain_urls[k + 1] if k + 1 < len(chain_urls) else None
        page_links[cu] = [(nxt, f"chain{k + 1}")] if nxt else []

    all_urls = list(page_links.keys()) + [private_url]

    def emit(url: str, title: str, para: str, links, lang="en", noise=False, html_override=None, text_override=None):
        if html_override is not None:
            html, text = html_override, text_override
        else:
            html, text = _page_html(title, para, links, noise, heavy_dom)
        pages.append(
            {
                "url": url,
                "warc_ts": base_ts + timedelta(seconds=len(pages)),
                "html": html,
                "text": text,
                "lang": lang,
            }
        )

    for url in all_urls:
        h = url.split("/")[2]
        title = f"T-{url.split('//', 1)[1]}"
        para = pick_para()
        emit(url, title, para, page_links.get(url, []), noise=(rng.random() < 0.3))

    # duplicate-content pairs: identical html bytes under two distinct urls
    dup_urls = []
    for d in range(dup_content_pairs):
        h = hosts[d % len(hosts)]
        u1, u2 = f"https://{h}/dup/{d}a", f"https://{h}/dup/{d}b"
        html, text = _page_html(f"DUP-{d}", pick_para(), [], noise=False)
        emit(u1, "", "", [], html_override=html, text_override=text)
        emit(u2, "", "", [], html_override=html, text_override=text)
        dup_urls.append((u1, u2))
        # linked from each host's root so both get crawled
        page_links[url_of[(h, 0)]].extend([(u1, f"d{d}a"), (u2, f"d{d}b")])

    # re-emit roots whose link lists changed (dup links appended after emit)
    by_url = {p["url"]: p for p in pages}
    for h in hosts[: dup_content_pairs if dup_content_pairs <= len(hosts) else len(hosts)]:
        root = url_of[(h, 0)]
        title = f"T-{root.split('//', 1)[1]}"
        para = pick_para()
        html, text = _page_html(title, para, page_links[root], noise=False, heavy_dom=heavy_dom)
        by_url[root]["html"], by_url[root]["text"] = html, text

    # content-type reject rows (lang='binary'): linked but never parseable
    for b in range(binary_rows):
        h = hosts[-1]
        bu = f"https://{h}/blob/{b}.bin"
        pages.append(
            {
                "url": bu,
                "warc_ts": base_ts + timedelta(seconds=len(pages)),
                "html": b"\x00\x01BINARY",
                "text": "",
                "lang": "binary",
            }
        )
        page_links[url_of[(h, 0)]].append((bu, f"bin{b}"))
        root = url_of[(h, 0)]
        title = f"T-{root.split('//', 1)[1]}"
        para = pick_para()
        html, text = _page_html(title, para, page_links[root], noise=False, heavy_dom=heavy_dom)
        by_url[root]["html"], by_url[root]["text"] = html, text

    # robots.txt rows (FIXTURES.md §1: special rows)
    for h, body in robots.items():
        pages.append(
            {
                "url": f"https://{h}/robots.txt",
                "warc_ts": base_ts,
                "html": body.encode("utf-8"),
                "text": "",
                "lang": "robots",
            }
        )

    # seeds: raw forms (incl. trailing slash + uppercase host), comments,
    # blanks, invalid rows — seeder.go:29-49 filters
    seed_lines = [
        "# nimbus synthetic seeds",
        "",
        f"https://{hosts[0]}/",              # raw, trailing slash (not normalized)
        f"ftp://{hosts[0]}/skipme",          # scheme filter
        "https:///nohost",                   # empty host filter
        "://invalid",                        # parse error filter
    ]
    for h in hosts[1:]:
        seed_lines.append(f"https://{h}/")
    seed_lines.append(f"https://{hosts[0]}/")  # duplicate seed (first wins)

    # ensure canonical child forms of roots exist as pages too: children link
    # to canonicalize('https://h/') == 'https://h' — distinct raw string
    existing_urls = {p["url"] for p in pages}
    for h in hosts:
        raw_root = f"https://{h}/"
        canon_root = canonicalize(raw_root)
        if canon_root != raw_root and canon_root not in existing_urls:
            src = by_url[raw_root]
            pages.append(
                {
                    "url": canon_root,
                    "warc_ts": base_ts + timedelta(seconds=len(pages)),
                    "html": src["html"],
                    "text": src["text"],
                    "lang": "en",
                }
            )

    return Corpus(
        pages=pages,
        seeds_text="\n".join(seed_lines) + "\n",
        meta={
            "hosts": hosts,
            "robots": robots,
            "dup_urls": dup_urls,
            "dead_candidates": dead_candidates,
            "private_url": private_url,
            "chain_urls": chain_urls,
            "seed": seed,
        },
    )


def corpus_to_pages_df(spark, corpus: Corpus):
    from ..schemas import PAGES_SCHEMA

    rows = [
        (p["url"], p["warc_ts"], p["html"], p["text"], p["lang"]) for p in corpus.pages
    ]
    return spark.createDataFrame(rows, PAGES_SCHEMA)
