"""Politeness budget formula vectors (pure, no Spark).

The formula quantizes the reference's 1-per-delay sliding window
(ratelimiter.go:12-27, limit=1) into rounds; these vectors pin the admission
sequence the Spark window rank and the oracle must both produce."""

from nimbus_crawler_spark.operators.politeness import host_budget


def test_fresh_host_full_window():
    # delay 200ms, 1000ms round ⇒ 5 fetches (t0=0,200,...,800)
    assert host_budget(0, 200, 0, 1000) == (5, 0)


def test_clock_mid_window():
    # next_free 500ms into round 0 ⇒ fetches at 500,700,900 ⇒ 3
    assert host_budget(500, 200, 0, 1000) == (3, 500)


def test_clock_beyond_round():
    assert host_budget(1500, 200, 0, 1000) == (0, 1500)
    # round 1 window [1000,2000): t0=1500 ⇒ 1500,1700,1900 ⇒ 3
    assert host_budget(1500, 200, 1, 1000) == (3, 1500)


def test_slow_host_skips_rounds():
    # delay 2000ms > round 1000ms ⇒ 1 fetch, then next_free=2000 ⇒ round 1
    # gets budget 0, round 2 gets 1 — one fetch every 2 rounds
    b, t0 = host_budget(0, 2000, 0, 1000)
    assert (b, t0) == (1, 0)
    nf = t0 + b * 2000
    assert host_budget(nf, 2000, 1, 1000) == (0, 2000)
    assert host_budget(nf, 2000, 2, 1000)[0] == 1


def test_exact_boundary():
    # delay exactly the window: one per round
    assert host_budget(0, 1000, 0, 1000) == (1, 0)
    assert host_budget(1000, 1000, 1, 1000) == (1, 1000)


def test_min_delay_cap():
    # clamped min delay 100ms ⇒ ceiling 10/sec/host (BASELINE.md)
    assert host_budget(0, 100, 0, 1000)[0] == 10


def test_advancing_sequence_is_sliding_window():
    # simulate 3 rounds; admission times must be exactly t0 + k*delay
    nf, times = 0, []
    for r in range(3):
        b, t0 = host_budget(nf, 300, r, 1000)
        times.extend(t0 + k * 300 for k in range(b))
        nf = t0 + b * 300
    # 1-per-300ms sliding window from t=0: 0,300,...,2700
    assert times == [t * 300 for t in range(len(times))]
    assert all(b - a >= 300 for a, b in zip(times, times[1:]))
