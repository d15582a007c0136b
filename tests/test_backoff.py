"""Backoff vectors: /root/reference/internal/crawler/backoff_test.go pins
retry r ⇒ [2^r, 1.5·2^r) seconds; jitter=0 mode is exactly 2^r seconds."""

from nimbus_crawler_spark.functions.backoff import backoff_rounds, backoff_seconds


def test_backoff_seconds_deterministic():
    assert backoff_seconds(0) == 1.0
    assert backoff_seconds(1) == 2.0
    assert backoff_seconds(2) == 4.0
    assert backoff_seconds(3) == 8.0


def test_backoff_seconds_jitter_band():
    for r in range(4):
        lo, hi = 2.0**r, 1.5 * 2.0**r
        assert lo <= backoff_seconds(r, jitter=0.999) < hi
        assert backoff_seconds(r, jitter=0.0) == lo


def test_backoff_rounds():
    assert backoff_rounds(0, round_ms=1000) == 1
    assert backoff_rounds(1, round_ms=1000) == 2
    assert backoff_rounds(2, round_ms=1000) == 4
    assert backoff_rounds(2, round_ms=500) == 8
    assert backoff_rounds(0, round_ms=10000) == 1  # minimum one round
