"""Crawl-side URL-seen dedup at scale: partitioned Bloom prefilter + exact
anti-join (SURVEY.md §2.4 J1, §4.3.2).

The URL-seen set is authoritative in ``url_state`` (the analog of the
reference's ``urls.url`` UNIQUE constraint, 001_initial.up.sql:13 /
BulkInsertURLs ON CONFLICT DO NOTHING). At 10^10 rows the per-round
anti-join of candidate links against it is the dominant shuffle; the Bloom
prefilter removes ~99% of *genuinely-new* candidates from that join:

* one Bloom bitset per ``bucket(url_hash)`` partition, built/updated with
  Arrow-batched numpy (``applyInPandas`` cogroup — never row-at-a-time);
* persisted as rows ``(bucket, nbits, k, n_keys, bits)`` in the snapshot
  store, so the build cost amortizes across rounds (Spark's own runtime
  bloom-filter join cannot persist across jobs);
* candidates testing NEGATIVE are *certainly* unseen → skip the exact join;
  POSITIVE candidates (true dups + false positives) still go through the
  exact anti-join, so the seen set stays authoritative — **no false drops**.

Sizing: ``bloom_bits_per_key``≈12 with k=5 ⇒ ~0.3% FPP. At 10^10 URLs over
4096 buckets that is ~2.4M keys × 12 bits ≈ 3.7 MB/bucket — bitsets stay
bucket-local; candidates shuffle once on the same bucket key they already
need for the exact join.

A cuckoo filter (deletable) is unnecessary: URLs are never unseen again —
the seen set only grows (SURVEY §4.3.2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import SEEN_FILTER_SCHEMA  # noqa: E402  (shared table DDL)


def _indices(hashes: np.ndarray, k: int, nbits: int) -> np.ndarray:
    """k bit positions per key via double hashing: idx_i = h1 + i·h2 mod nbits."""
    h = hashes.astype(np.uint64)
    h1 = h
    h2 = (h ^ (h >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD) | np.uint64(1)
    out = np.empty((k, h.shape[0]), dtype=np.uint64)
    for i in range(k):
        out[i] = (h1 + np.uint64(i) * h2) % np.uint64(nbits)
    return out


def _set_bits(bits: np.ndarray, hashes: np.ndarray, k: int, nbits: int) -> None:
    idx = _indices(hashes, k, nbits).ravel()
    np.bitwise_or.at(bits, (idx >> np.uint64(3)).astype(np.int64), (1 << (idx & np.uint64(7))).astype(np.uint8))


def _test_bits(bits: np.ndarray, hashes: np.ndarray, k: int, nbits: int) -> np.ndarray:
    idx = _indices(hashes, k, nbits)
    res = np.ones(hashes.shape[0], dtype=bool)
    for i in range(k):
        byte = (idx[i] >> np.uint64(3)).astype(np.int64)
        mask = (1 << (idx[i] & np.uint64(7))).astype(np.uint8)
        res &= (bits[byte] & mask) != 0
    return res


def update_seen_filter(
    new_urls: DataFrame,
    prior_filter: DataFrame,
    nbits: int,
    k: int,
) -> DataFrame:
    """OR the hashes of ``new_urls`` (cols: url_hash, bucket) into the
    per-bucket bitsets; buckets absent from the prior filter are created."""

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(right):
            row = right.iloc[0]
            bits = np.frombuffer(row["bits"], dtype=np.uint8).copy()
            cur_nbits, cur_k, n_keys = int(row["nbits"]), int(row["k"]), int(row["n_keys"])
        else:
            bits = np.zeros(nbits // 8, dtype=np.uint8)
            cur_nbits, cur_k, n_keys = nbits, k, 0
        bucket = int(left.iloc[0]["bucket"]) if len(left) else int(right.iloc[0]["bucket"])
        if len(left):
            _set_bits(bits, left["url_hash"].to_numpy(dtype=np.int64), cur_k, cur_nbits)
            n_keys += len(left)
        return pd.DataFrame(
            {
                "bucket": [bucket],
                "nbits": [cur_nbits],
                "k": [cur_k],
                "n_keys": [n_keys],
                "bits": [bits.tobytes()],
            }
        )

    return (
        new_urls.select("url_hash", "bucket")
        .groupBy("bucket")
        .cogroup(prior_filter.groupBy("bucket"))
        .applyInPandas(merge, SEEN_FILTER_SCHEMA)
    )


def filter_unseen(
    candidates: DataFrame,
    state_urls: DataFrame,
    seen_filter: DataFrame,
) -> DataFrame:
    """Candidates (must carry url, url_hash, bucket) minus the seen set.

    Bloom-negative rows skip the exact join entirely; Bloom-positive rows are
    verified with the authoritative anti-join against ``state_urls`` (url).
    Output preserves the candidate columns (plus none).
    """
    cols = candidates.columns
    out_schema = T.StructType(
        candidates.schema.fields + [T.StructField("_maybe_seen", T.BooleanType(), False)]
    )

    def test(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if not len(left):
            return pd.DataFrame(columns=[*left.columns, "_maybe_seen"])
        if not len(right):
            left = left.copy()
            left["_maybe_seen"] = False
            return left
        row = right.iloc[0]
        bits = np.frombuffer(row["bits"], dtype=np.uint8)
        res = _test_bits(
            bits, left["url_hash"].to_numpy(dtype=np.int64), int(row["k"]), int(row["nbits"])
        )
        left = left.copy()
        left["_maybe_seen"] = res
        return left

    tested = (
        candidates.groupBy("bucket")
        .cogroup(seen_filter.groupBy("bucket"))
        .applyInPandas(test, out_schema)
    )
    certain_new = tested.where(~F.col("_maybe_seen")).drop("_maybe_seen")
    verified_new = (
        tested.where(F.col("_maybe_seen"))
        .drop("_maybe_seen")
        .join(state_urls.select("url"), "url", "left_anti")
    )
    return certain_new.unionByName(verified_new).select(*cols)
