"""End-to-end golden test: the Spark engine must reproduce the sequential
oracle exactly — crawl order, URL-seen set, final statuses, and byte-identical
extracted text per url (BASELINE.json north_star)."""

import pytest

from nimbus_crawler_spark.config import CrawlConfig
from nimbus_crawler_spark.plans.crawl import crawl
from nimbus_crawler_spark.sim.oracle import simulate
from nimbus_crawler_spark.sources.corpus import corpus_to_pages_df, make_corpus
from nimbus_crawler_spark.store import SnapshotStore


@pytest.fixture(scope="module")
def corpus():
    return make_corpus(seed=42, n_hosts=5, pages_per_host=10)


@pytest.fixture(scope="module")
def oracle_result(corpus):
    cfg = CrawlConfig()
    pages = {p["url"]: p for p in corpus.pages}
    return simulate(pages, corpus.seeds_text, cfg)


@pytest.fixture(scope="module")
def engine_result(spark, corpus, tmp_path_factory):
    cfg = CrawlConfig()
    wh = tmp_path_factory.mktemp("warehouse")
    pages_df = corpus_to_pages_df(spark, corpus)
    summary = crawl(spark, str(wh), pages_df, corpus.seeds_text, cfg)
    store = SnapshotStore(spark, str(wh))
    return {
        "summary": summary,
        "url_state": {r["url"]: r.asDict() for r in store.read("url_state").collect()},
        "results": sorted(
            (r.asDict() for r in store.read_appends("crawl_results").collect()),
            key=lambda d: d["crawl_seq"],
        ),
        "domains": {r["host"]: r.asDict() for r in store.read("domains").collect()},
        "quarantine": [r.asDict() for r in store.read_appends("quarantine").collect()],
        "store": store,
    }


def test_corpus_is_nontrivial(corpus, oracle_result):
    assert len(corpus.pages) > 40
    assert len(oracle_result.crawl_order) > 20
    statuses = {s["status"] for s in oracle_result.url_state.values()}
    # every terminal transition exercised (url.go:14-21)
    assert {"parsed", "skipped", "failed"} <= statuses


def test_seen_set_matches(engine_result, oracle_result):
    assert set(engine_result["url_state"]) == oracle_result.seen_set


def test_final_statuses_match(engine_result, oracle_result):
    mismatches = {
        u: (s["status"], oracle_result.url_state[u]["status"])
        for u, s in engine_result["url_state"].items()
        if s["status"] != oracle_result.url_state[u]["status"]
    }
    assert not mismatches


def test_depth_seq_retry_match(engine_result, oracle_result):
    for u, s in engine_result["url_state"].items():
        o = oracle_result.url_state[u]
        assert (s["depth"], s["seq"], s["retry_count"]) == (
            o["depth"],
            o["seq"],
            o["retry_count"],
        ), u


def test_crawl_order_matches_exactly(engine_result, oracle_result):
    engine_order = [
        (r["crawl_seq"], r["round"], r["url"], r["depth"]) for r in engine_result["results"]
    ]
    oracle_order = [
        (o["crawl_seq"], o["round"], o["url"], o["depth"]) for o in oracle_result.crawl_order
    ]
    assert engine_order == oracle_order


def test_extracted_text_byte_identical_vs_golden(engine_result, corpus):
    """Per-row invariant: engine text == generator's independently-constructed
    golden text, byte for byte (input_hint)."""
    golden = {p["url"]: p["text"] for p in corpus.pages}
    checked = 0
    for r in engine_result["results"]:
        if r["dup_content"]:
            assert r["text"] is None
            continue
        assert r["text"] == golden[r["url"]], r["url"]
        checked += 1
    assert checked > 20


def test_extracted_text_matches_oracle(engine_result, oracle_result):
    engine_text = {
        r["url"]: r["text"] for r in engine_result["results"] if not r["dup_content"]
    }
    oracle_text = {u: e["text"] for u, e in oracle_result.extracted.items()}
    assert engine_text == oracle_text


def test_content_hash_and_keys_match(engine_result, oracle_result):
    for u, e in oracle_result.extracted.items():
        s = engine_result["url_state"][u]
        assert s["content_hash"] == e["content_hash"], u
        assert s["html_key"] == e["html_key"], u
        assert s["text_key"] == e["text_key"], u


def test_keys_match_for_all_states_including_dups(engine_result, oracle_result):
    """Dup-skipped rows persist html_key but NOT content_hash/text_key
    (parser.go:123 — UpdateURLStatus only); robots-skips persist none.
    Compare the three columns for EVERY url, not just parsed ones."""
    dup_rows = 0
    for u, s in engine_result["url_state"].items():
        o = oracle_result.url_state[u]
        assert s["content_hash"] == o["content_hash"], u
        assert s["html_key"] == o["html_key"], u
        assert s["text_key"] == o["text_key"], u
        if s["status"] == "skipped" and s["html_key"] is not None:
            assert s["content_hash"] is None and s["text_key"] is None, u
            dup_rows += 1
    assert dup_rows >= 1  # corpus has dup_content_pairs >= 1


def test_domains_clock_and_delay_match(engine_result, oracle_result):
    eng = engine_result["domains"]
    assert set(eng) == set(oracle_result.domains)
    for h, d in oracle_result.domains.items():
        assert eng[h]["crawl_delay_ms"] == d["crawl_delay_ms"], h
        assert eng[h]["next_free_ms"] == d["next_free_ms"], h


def test_quarantine_holds_terminal_failures(engine_result, oracle_result):
    failed = {u for u, s in oracle_result.url_state.items() if s["status"] == "failed"}
    assert {q["url"] for q in engine_result["quarantine"]} == failed


def test_statuses_cover_reference_paths(oracle_result, corpus):
    states = oracle_result.url_state
    # robots-denied page was discovered and skipped, never fetched
    private = corpus.meta["private_url"]
    assert states[private]["status"] == "skipped"
    assert private not in {o["url"] for o in oracle_result.crawl_order}
    # dup pages: exactly one of each pair parsed
    for u1, u2 in corpus.meta["dup_urls"]:
        st = {states[u1]["status"], states[u2]["status"]}
        assert st == {"parsed", "skipped"}, (u1, u2)
    # depth gate: chain page at depth max_depth+1 never entered the state
    chain = corpus.meta["chain_urls"]
    cfg = CrawlConfig()
    reached = [c for c in chain if c in states]
    assert all(states[c]["depth"] <= cfg.max_depth for c in reached)
    assert len(reached) < len(chain)
