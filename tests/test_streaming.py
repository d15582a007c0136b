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


def test_stateful_politeness_admission(spark, staged, tmp_path):
    """applyInPandasWithState: per-host cumulative budget holds ACROSS
    micro-batches (one file per trigger), admit_seq dense per host."""
    import os

    from nimbus_crawler_spark.streaming.stateful import admit_available_now

    corpus, inp = staged
    # deterministic micro-batch order: strictly increasing mtimes per file
    for i, f in enumerate(sorted(os.listdir(inp))):
        os.utime(inp / f, (1_700_000_000 + i, 1_700_000_000 + i))
    out, ckpt = str(tmp_path / "admitted"), str(tmp_path / "ckpt2")
    budget = 3
    admit_available_now(spark, str(inp), out, ckpt, budget_per_host=budget)

    got = spark.read.parquet(out).collect()
    from collections import defaultdict

    per_host = defaultdict(list)
    for r in got:
        per_host[r["host"]].append(r["admit_seq"])
    # every host in the corpus with ≥budget pages admits exactly budget rows
    from nimbus_crawler_spark.functions.urlnorm import hostname

    totals = defaultdict(int)
    for p in corpus.pages:
        h = hostname(p["url"])
        if h:
            totals[h] += 1
    assert set(per_host) == {h for h, n in totals.items() if n > 0}
    for h, seqs in per_host.items():
        assert sorted(seqs) == list(range(min(budget, totals[h]))), h
    # with 10-row files and 3 hosts × 5-6 pages, hosts span multiple files —
    # the budget can only hold if state carried across micro-batches
    n_files = len([f for f in os.listdir(inp) if f.endswith(".parquet")])
    assert n_files > 1
