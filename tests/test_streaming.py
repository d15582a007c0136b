"""Streaming ingestion: availableNow drain, exactly-once re-run, watermarked
window stats."""

import pytest

from nimbus_crawler_spark.sources.corpus import make_corpus
from nimbus_crawler_spark.streaming.ingest import ingest_available_now


@pytest.fixture()
def staged(spark, tmp_path):
    corpus = make_corpus(seed=3, n_hosts=3, pages_per_host=5)
    from nimbus_crawler_spark.plans.bench import _write_pages_parquet

    inp = tmp_path / "incoming"
    _write_pages_parquet(corpus, str(inp), rows_per_file=10)
    return corpus, inp


def test_available_now_ingest_and_rerun_idempotence(spark, staged, tmp_path):
    corpus, inp = staged
    out, stats, ckpt = (str(tmp_path / d) for d in ("pages", "stats", "ckpt"))

    # corpus warc_ts advances 1 s per page; 10 s windows with a 5 s watermark
    # let all but the trailing window(s) close and emit in append mode
    ingest_available_now(
        spark, str(inp), out, stats, ckpt, window="10 seconds", watermark="5 seconds"
    )
    n1 = spark.read.parquet(out).count()
    assert n1 == len(corpus.pages)

    s = spark.read.parquet(stats)
    rows = s.collect()
    assert len(rows) > 0
    assert set(s.columns) == {"window_start", "window_end", "host", "n_pages", "bytes"}
    total = sum(r["n_pages"] for r in rows)
    # append mode: closed windows only — everything except the watermark tail
    assert 0 < total <= len(corpus.pages)
    assert all(r["n_pages"] > 0 and r["bytes"] > 0 for r in rows)

    # re-run with same checkpoint: no new files ⇒ no duplicates
    ingest_available_now(
        spark, str(inp), out, stats, ckpt, window="10 seconds", watermark="5 seconds"
    )
    assert spark.read.parquet(out).count() == n1
