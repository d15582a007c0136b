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


class TestFastPath:
    """politeness_select(try_fast_path=True) must be selection-identical to
    the rank path whenever it activates, and must fall through to the rank
    when any host's budget binds."""

    def _cands(self, spark, rows):
        return spark.createDataFrame(
            rows, "url string, host string, depth int, seq long, next_free_ms long, crawl_delay_ms int"
        )

    def test_identity_when_budgets_do_not_bind(self, spark):
        from nimbus_crawler_spark.operators.politeness import politeness_select

        rows = [
            (f"u{h}-{i}", f"h{h}", i % 3, h * 100 + i, 0, 200)
            for h in range(5)
            for i in range(4)
        ]
        # round_ms=3_600_000 / delay 200 => budget 18000 >> 4 rows/host
        fast = politeness_select(
            self._cands(spark, rows), 0, 3_600_000, salt_buckets=4, try_fast_path=True
        )
        slow = politeness_select(
            self._cands(spark, rows), 0, 3_600_000, salt_buckets=4, try_fast_path=False
        )
        f = {(r["url"], r["t0_ms"]) for r in fast.collect()}
        s = {(r["url"], r["t0_ms"]) for r in slow.collect()}
        assert f == s and len(f) == len(rows)
        assert all(r["host_rank"] is None for r in fast.collect())

    def test_falls_through_when_any_host_binds(self, spark):
        from nimbus_crawler_spark.operators.politeness import politeness_select

        # round_ms 1000 / delay 400 => budget 3; host h0 has 5 rows (binds)
        rows = [(f"a{i}", "h0", 0, i, 0, 400) for i in range(5)] + [
            (f"b{i}", "h1", 0, i, 0, 400) for i in range(2)
        ]
        fast = politeness_select(
            self._cands(spark, rows), 0, 1000, salt_buckets=4, try_fast_path=True
        )
        slow = politeness_select(
            self._cands(spark, rows), 0, 1000, salt_buckets=4, try_fast_path=False
        )
        f = sorted((r["url"], r["host_rank"]) for r in fast.collect())
        s = sorted((r["url"], r["host_rank"]) for r in slow.collect())
        assert f == s
        assert len(f) == 5  # 3 from h0 (budget-bound) + 2 from h1
        assert all(hr is not None for _u, hr in f)  # rank path ran

    def test_zero_budget_host_admits_nothing(self, spark):
        from nimbus_crawler_spark.operators.politeness import politeness_select

        # h0's clock is beyond the whole round => budget 0; h1 free
        rows = [("a0", "h0", 0, 0, 5_000_000_000, 200), ("b0", "h1", 0, 0, 0, 200)]
        fast = politeness_select(
            self._cands(spark, rows), 0, 3_600_000, salt_buckets=4, try_fast_path=True
        )
        assert [r["url"] for r in fast.collect()] == ["b0"]
