"""Partitioned Bloom seen-filter: no false negatives ever, bounded false
positives, incremental update, and exact-join fallback correctness."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from nimbus_crawler_spark.operators.dedup import (
    _set_bits,
    _test_bits,
    filter_unseen,
    update_seen_filter,
)


class TestBitOps:
    def test_no_false_negatives(self):
        rng = np.random.default_rng(42)
        keys = rng.integers(-(2**62), 2**62, size=5000, dtype=np.int64)
        nbits, k = 1 << 17, 5
        bits = np.zeros(nbits // 8, dtype=np.uint8)
        _set_bits(bits, keys, k, nbits)
        assert _test_bits(bits, keys, k, nbits).all()

    def test_false_positive_rate_bounded(self):
        rng = np.random.default_rng(7)
        keys = rng.integers(-(2**62), 2**62, size=5000, dtype=np.int64)
        probes = rng.integers(-(2**62), 2**62, size=20000, dtype=np.int64)
        nbits, k = 1 << 17, 5  # ~26 bits/key here ⇒ fpp ≪ 1%
        bits = np.zeros(nbits // 8, dtype=np.uint8)
        _set_bits(bits, keys, k, nbits)
        fpp = _test_bits(bits, probes, k, nbits).mean()
        assert fpp < 0.02


@pytest.fixture()
def keyed(spark):
    def make(urls):
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        return df.withColumn("url_hash", F.xxhash64("url")).withColumn(
            "bucket", F.pmod(F.xxhash64("url"), F.lit(8)).cast("int")
        )

    return make


class TestFilterLifecycle:
    def test_build_update_filter(self, spark, keyed):
        from nimbus_crawler_spark.schemas import SEEN_FILTER_SCHEMA

        empty = spark.createDataFrame([], SEEN_FILTER_SCHEMA)
        seen1 = keyed([f"https://h{i}.example/{i}" for i in range(200)])
        f1 = update_seen_filter(seen1, empty, nbits=1 << 14, k=5)
        rows = {r["bucket"]: r for r in f1.collect()}
        assert sum(r["n_keys"] for r in rows.values()) == 200

        # incremental: add more keys, prior buckets must be preserved/merged
        seen2 = keyed([f"https://new{i}.example/x" for i in range(50)])
        f2 = update_seen_filter(seen2, f1, nbits=1 << 14, k=5)
        rows2 = {r["bucket"]: r for r in f2.collect()}
        assert sum(r["n_keys"] for r in rows2.values()) == 250

    def test_filter_unseen_no_false_drops(self, spark, keyed):
        from nimbus_crawler_spark.schemas import SEEN_FILTER_SCHEMA

        seen_urls = [f"https://h{i}.example/p" for i in range(300)]
        new_urls = [f"https://fresh{i}.example/p" for i in range(100)]
        state = keyed(seen_urls)
        empty = spark.createDataFrame([], SEEN_FILTER_SCHEMA)
        filt = update_seen_filter(state, empty, nbits=1 << 14, k=5)

        candidates = keyed(seen_urls[:50] + new_urls)  # mix of dup + new
        got = {r["url"] for r in filter_unseen(candidates, state, filt).collect()}
        assert got == set(new_urls)  # every new url kept, every seen dropped

    def test_empty_filter_passes_everything_to_exact_join(self, spark, keyed):
        from nimbus_crawler_spark.schemas import SEEN_FILTER_SCHEMA

        empty = spark.createDataFrame([], SEEN_FILTER_SCHEMA)
        state = keyed(["https://a.example/"])
        cands = keyed(["https://a.example/", "https://b.example/"])
        got = {r["url"] for r in filter_unseen(cands, state, empty).collect()}
        # empty filter ⇒ bloom says 'certainly new' for all — WRONG unless the
        # caller maintains the invariant; this test documents that contract:
        assert got == {"https://a.example/", "https://b.example/"}
