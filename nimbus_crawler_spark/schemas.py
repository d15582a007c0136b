"""Explicit StructType DDL for every engine table (SURVEY.md §1.3).

Mirrors the reference's migration-managed schema
(``/root/reference/internal/database/migrations/001_initial.up.sql``) with the
Spark-native substitutions from SURVEY.md §1.2: no UUIDs (deterministic
``xxhash64`` keys), logical round counters instead of wall-clock, blobs as
table columns.

Input table (BASELINE.json input_hint):
``pages(url string, warc_ts timestamp, html binary, text string, lang string)``.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Status enum — url.go:14-21 / 001_initial.up.sql:1. 'crawling' additionally
# covers the reference's awaiting-retry limbo (IncrementRetryAndMaybeFailURL
# leaves status unchanged below max_retries, url.go: see models/url.go).
STATUS_PENDING = "pending"
STATUS_CRAWLING = "crawling"
STATUS_CRAWLED = "crawled"
STATUS_PARSED = "parsed"
STATUS_FAILED = "failed"
STATUS_SKIPPED = "skipped"

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# urls table analog (001_initial.up.sql:11-24) + batch-round columns.
URL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),   # xxhash64(url) — bucket/join key
        T.StructField("bucket", T.IntegerType(), False),  # pmod(url_hash, state_buckets)
        T.StructField("host", T.StringType(), False),     # politeness key (crawler.go:120)
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("seq", T.LongType(), False),        # discovery_seq (SURVEY §4.3.3)
        T.StructField("status", T.StringType(), False),
        T.StructField("retry_count", T.IntegerType(), False),
        T.StructField("next_round", T.LongType(), False), # next_eligible_round (backoff P11)
        T.StructField("content_hash", T.StringType(), True),  # sha256 hex, parsed only
        T.StructField("html_key", T.StringType(), True),  # keys.go:16-18 analog
        T.StructField("text_key", T.StringType(), True),
        T.StructField("discovered_round", T.LongType(), False),
    ]
)

# domains table analog (001_initial.up.sql:3-9) + politeness clock.
DOMAINS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("robots_body", T.StringType(), True),   # null ⇒ no robots page ⇒ allow-all
        T.StructField("crawl_delay_ms", T.IntegerType(), False),
        T.StructField("next_free_ms", T.LongType(), False),   # logical politeness clock
        T.StructField("first_seen_round", T.LongType(), False),
    ]
)

# Output per successfully fetched page (MinIO-blob analog, SURVEY §2.1 S11/S12).
CRAWL_RESULTS_SCHEMA = T.StructType(
    [
        T.StructField("round", T.LongType(), False),
        T.StructField("crawl_seq", T.LongType(), False),  # global fetch order
        T.StructField("url", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("content_hash", T.StringType(), False),
        T.StructField("html_key", T.StringType(), False),
        T.StructField("dup_content", T.BooleanType(), False),
        T.StructField("text", T.StringType(), True),      # null for dup-skipped pages
        T.StructField("text_key", T.StringType(), True),
        T.StructField("n_links", T.IntegerType(), True),
        T.StructField("html_bytes", T.LongType(), False),
    ]
)

# DLQ analog (queue/streams.go:14-15 → SURVEY §2.1 S6).
QUARANTINE_SCHEMA = T.StructType(
    [
        T.StructField("round", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("reason", T.StringType(), False),
        T.StructField("retry_count", T.IntegerType(), False),
    ]
)

# Per-round, per-partition lineage/metrics (north rule; SURVEY §2.7 A4).
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("round", T.LongType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("rows", T.LongType(), False),
        T.StructField("distinct_hosts", T.LongType(), False),
        T.StructField("bytes", T.LongType(), False),
    ]
)

# Partitioned Bloom seen-filter rows (SURVEY §4.3.2); one bitset per
# bucket(url_hash) partition, persisted across rounds.
SEEN_FILTER_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("nbits", T.IntegerType(), False),
        T.StructField("k", T.IntegerType(), False),
        T.StructField("n_keys", T.LongType(), False),
        T.StructField("bits", T.BinaryType(), False),
    ]
)

EMPTY_SCHEMAS = {
    "seen_filter": SEEN_FILTER_SCHEMA,
    "url_state": URL_STATE_SCHEMA,
    "domains": DOMAINS_SCHEMA,
    "crawl_results": CRAWL_RESULTS_SCHEMA,
    "quarantine": QUARANTINE_SCHEMA,
    "lineage": LINEAGE_SCHEMA,
}
