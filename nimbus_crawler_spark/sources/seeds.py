"""Seed-file ingestion (SURVEY.md §2.1 S1).

Reference: ``/root/reference/internal/seeder/seeder.go:18-81`` — skip blank
and ``#`` lines, require a parseable URL with scheme ∈ {http, https} and a
non-empty host, publish **verbatim** (seeds are NOT normalized — the seen set
holds raw seeds plus normalized children, SURVEY §3.1), first duplicate wins,
depth 0, discovery order = file order.
"""

from __future__ import annotations

from ..functions.urlnorm import parse_url


def parse_seed_lines(seeds_text: str) -> list[tuple[str, str]]:
    """Returns ordered, deduplicated (url, host) pairs of valid seeds."""
    out: list[tuple[str, str]] = []
    seen: set[str] = set()
    for raw in seeds_text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        p = parse_url(line)
        if p is None:
            continue
        if p.scheme not in ("http", "https"):
            continue
        host = p.hostname
        if not host:
            continue
        if line in seen:  # InsertURL ON CONFLICT DO NOTHING (url.go InsertURL)
            continue
        seen.add(line)
        out.append((line, host))
    return out
