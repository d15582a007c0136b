"""Retry backoff as deterministic logical rounds.

The reference waits ``2^retry + rand*0.5*2^retry`` seconds before
re-publishing a failed URL (``/root/reference/internal/crawler/backoff.go:11-15``,
invoked crawler.go:188-214). Wall-clock sleeps and RNG jitter are hostile to
deterministic batch replay, so the engine maps backoff to *logical rounds*
(SURVEY.md §2.2 P11): with jitter=0 the wait is exactly ``2^retry`` seconds,
converted to rounds of ``round_ms`` each, minimum 1 round. An optional
seeded-jitter mode exists for realism but is off for all fixtures.
"""

from __future__ import annotations

import math


def backoff_seconds(retry_count: int, jitter: float = 0.0) -> float:
    base = 2.0 ** retry_count
    return base + jitter * 0.5 * base


def backoff_rounds(retry_count: int, round_ms: int, jitter: float = 0.0) -> int:
    """Rounds to wait before the URL becomes eligible again (≥1)."""
    secs = backoff_seconds(retry_count, jitter)
    return max(1, math.ceil(secs * 1000.0 / round_ms))
