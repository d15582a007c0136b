"""Resumability (north rule): kill after round k, resume, identical final
state; uncommitted round data is ignored (SURVEY.md §4.3.4)."""

import json

import pytest

from nimbus_crawler_spark.config import CrawlConfig
from nimbus_crawler_spark.plans.crawl import crawl
from nimbus_crawler_spark.sources.corpus import corpus_to_pages_df, make_corpus
from nimbus_crawler_spark.store import SnapshotStore


@pytest.fixture(scope="module")
def small(spark):
    corpus = make_corpus(seed=11, n_hosts=3, pages_per_host=6)
    return corpus, corpus_to_pages_df(spark, corpus)


def _final_state(spark, wh):
    store = SnapshotStore(spark, wh)
    return (
        {r["url"]: (r["status"], r["retry_count"]) for r in store.read("url_state").collect()},
        sorted(
            (r["crawl_seq"], r["url"]) for r in store.read_appends("crawl_results").collect()
        ),
        store.latest_commit()["meta"].get("fetched_total"),
    )


def test_interrupt_and_resume_equals_uninterrupted(spark, small, tmp_path):
    corpus, pages = small
    cfg = CrawlConfig()

    crawl(spark, str(tmp_path / "full"), pages, corpus.seeds_text, cfg, max_rounds=60)
    expected = _final_state(spark, str(tmp_path / "full"))

    # "kill" after 3 rounds, then resume to completion
    wh = str(tmp_path / "resumed")
    crawl(spark, wh, pages, corpus.seeds_text, cfg, max_rounds=3)
    crawl(spark, wh, pages, None, cfg, max_rounds=60, resume=True)
    assert _final_state(spark, wh) == expected


def test_uncommitted_round_data_is_ignored(spark, small, tmp_path):
    corpus, pages = small
    cfg = CrawlConfig()
    wh = tmp_path / "torn"
    crawl(spark, str(wh), pages, corpus.seeds_text, cfg, max_rounds=2)
    store = SnapshotStore(spark, str(wh))
    committed = store.latest_round()

    # simulate a torn write: version dir beyond the last commit, no marker
    torn = wh / "url_state" / "v99999999"
    torn.mkdir(parents=True)
    (torn / "part-00000.parquet").write_bytes(b"garbage not parquet")
    # and a leftover commit tmp file
    (wh / "_commits" / ".tmp-99999999.json").write_text("{}")

    assert store.latest_round() == committed  # torn data invisible
    crawl(spark, str(wh), pages, None, cfg, max_rounds=60, resume=True)
    full = tmp_path / "ref"
    crawl(spark, str(full), pages, corpus.seeds_text, cfg, max_rounds=60)
    assert _final_state(spark, str(wh))[0] == _final_state(spark, str(full))[0]


def test_commit_marker_contents(spark, small, tmp_path):
    corpus, pages = small
    wh = str(tmp_path / "meta")
    crawl(spark, wh, pages, corpus.seeds_text, CrawlConfig(), max_rounds=2)
    store = SnapshotStore(spark, wh)
    c = store.latest_commit()
    assert c["round"] == 1
    assert "url_state" in c["tables"] and "domains" in c["tables"]
    assert "crawl_results" in c["appends"]
    assert "config_hash" in c["meta"]
    # markers are sequential and json-valid
    commits = sorted((tmp_path / "meta" / "_commits").glob("c*.json"))
    assert len(commits) == 3  # seed + 2 rounds
    for p in commits:
        json.loads(p.read_text())
