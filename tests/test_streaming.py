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


def test_watermark_drops_late_rows(spark, tmp_path):
    """Append-mode windowed agg with a watermark: a row arriving AFTER the
    watermark passed its window is dropped; the window emits without it.

    Sequence (window 30s, watermark 10s, one file per micro-batch):
      batch 1: 4 rows in window [0,30)            → no emission (wm < 30)
      batch 2: 1 row at t=100                      → wm advances to 90
      batch 3: 1 row at t=150 — wm ≥ 90 this batch, so window [0,30) is
               evicted and emitted with n_pages=4
      batch 4: 1 fresh row at t=200 + 1 LATE row at t=3: its window was
               already finalized, so the row is dropped by the watermark
               (numRowsDroppedByWatermark=1), NOT double-counted
    (Empirical Spark contract, verified here: a late row is reliably
    dropped once its window was evicted in a PRIOR batch; a row arriving
    in the same batch as its window's eviction still joins the emission.)
    """
    import datetime as dt
    import os

    from nimbus_crawler_spark.streaming.ingest import arrival_stats, read_pages_stream

    def ts(sec):
        return dt.datetime(2026, 1, 1, 0, 0, 0, tzinfo=dt.timezone.utc) + dt.timedelta(seconds=sec)

    def row(sec):
        return ("https://late.example/p/%d" % sec, ts(sec), b"<html>x</html>", None, None)

    inp = tmp_path / "late-in"
    inp.mkdir()
    batches = [[row(0), row(1), row(2), row(5)], [row(100)], [row(150)], [row(200), row(3)]]
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary, text string, lang string")
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / f"stage{i}"))
        part = next(
            f for f in os.listdir(tmp_path / f"stage{i}") if f.endswith(".parquet")
        )
        os.rename(tmp_path / f"stage{i}" / part, inp / f"b{i}.parquet")
        os.utime(inp / f"b{i}.parquet", (1_700_000_000 + i, 1_700_000_000 + i))

    out, ckpt = str(tmp_path / "late-stats"), str(tmp_path / "late-ckpt")
    q = (
        arrival_stats(
            read_pages_stream(spark, str(inp), max_files_per_trigger=1),
            window="30 seconds",
            watermark="10 seconds",
        )
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        (r["window_start"].second + r["window_start"].minute * 60): r["n_pages"]
        for r in spark.read.parquet(out).collect()
    }
    # window [0,30) emitted WITHOUT the late t=3 row (4, not 5); the t=100
    # and t=150 windows also closed once wm reached 190
    assert got.get(0) == 4, got
    assert got.get(90) == 1, got
    assert got.get(150) == 1, got
    # the late row was dropped by the watermark, not silently merged
    dropped = sum(
        (p["stateOperators"][0].get("numRowsDroppedByWatermark", 0) if p["stateOperators"] else 0)
        for p in q.recentProgress
    )
    assert dropped == 1


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
