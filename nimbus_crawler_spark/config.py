"""Engine configuration mirroring the reference's defaults.

Reference defaults (``/root/reference/internal/config/config.go:105-113``):
workers=10, max_depth=3, max_retries=3, timeout=30s, max_redirects=5,
prefetch_count=10, parser workers=5. Worker counts are an async-runtime
concern the batch engine replaces with per-round capacity; the semantic knobs
(depth, retries, politeness) carry over directly.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass


@dataclass(frozen=True)
class CrawlConfig:
    # --- semantics (reference parity) ---
    max_depth: int = 3                    # config.go:106
    max_retries: int = 3                  # config.go:107
    default_crawl_delay_ms: int = 200     # robots.go:30
    min_crawl_delay_ms: int = 100         # robots.go:32
    respect_robots_txt: bool = True       # crawler.go:153
    # politeness key: 'hostname' = reference parity (crawler.go:120);
    # 'registrable_domain' = north-rule mode (BASELINE.json)
    politeness_key: str = "hostname"

    # --- batch-round mapping ---
    round_ms: int = 1000                  # logical ms of crawl time per round
    round_capacity: int | None = None     # global per-round fetch cap (O3); None = unbounded
    frontier_backpressure: int | None = 80000  # F10: skip enqueuing children when pending exceeds this (parser.go:158)
    # O4: lossy frontier trim — keep only the NEWEST N pending URLs by
    # (discovered_round, depth, seq), mark the rest 'trimmed' (terminal,
    # stays in the seen set). Batch analog of the reference's Redis
    # XAdd MaxLen≈100000 oldest-entry eviction (queue/publisher.go:12,29-33);
    # None (default) = lossless frontier.
    frontier_trim: int | None = None
    # fetch join strategy: when the round's frontier fits (rows), broadcast
    # the politeness-selected side into the pages scan — page payloads then
    # never shuffle (map-side hash join on the scan). Larger rounds fall
    # back to a shuffle join, which AQE plans. The explicit hint bypasses
    # autoBroadcastJoinThreshold, so the cap is sized for the documented
    # 4 GiB/core posture: ~200 B/url_state row ⇒ ≤~100 MB hash relation
    # per executor at the default.
    fetch_broadcast_max_rows: int = 500_000
    backoff_jitter: float = 0.0           # 0 ⇒ deterministic 2^retry seconds (backoff.go:11-15)
    max_links_per_page: int = 1024        # discovery_seq stride (SURVEY §4.3.3)
    # politeness fast path: for round quanta at/above this, TRY the exact
    # budgets-cannot-bind check (one partial-agg job) before the two-phase
    # window rank — production-sized quanta (minutes of logical crawl time)
    # almost never bind, so the rank's two shuffles are usually skippable.
    # Small-quantum configs (tests, paced loops) stay on the rank path.
    politeness_fastpath_min_round_ms: int = 60_000

    # --- scale knobs ---
    state_buckets: int = 32               # hash buckets for url_state partitioning
    host_salt_buckets: int = 8            # two-phase politeness rank salt (SURVEY §4.3.1)
    bloom_bits_per_key: int = 12          # seen-filter sizing (~0.3% FPP at k=5)
    bloom_num_hashes: int = 5
    bloom_nbits_per_bucket: int = 1 << 17  # 16 KiB/bucket at sandbox scale; size
    # to bits_per_key × expected keys/bucket in production (SURVEY §4.3.2)
    use_seen_bloom: bool = True           # prefilter before the exact anti-join
    shuffle_partitions: int = 32

    def config_hash(self) -> str:
        return hashlib.sha256(
            json.dumps(asdict(self), sort_keys=True).encode()
        ).hexdigest()[:16]


REFERENCE_DEFAULTS = CrawlConfig()
