"""Engine ≡ oracle under non-default configs: registrable-domain politeness
(north-rule mode), frontier backpressure (F10), and round capacity (O3)."""

import pytest

from nimbus_crawler_spark.config import CrawlConfig
from nimbus_crawler_spark.plans.crawl import crawl
from nimbus_crawler_spark.sim.oracle import simulate
from nimbus_crawler_spark.sources.corpus import corpus_to_pages_df, make_corpus
from nimbus_crawler_spark.store import SnapshotStore


@pytest.fixture(scope="module")
def corpus():
    # multi-label hosts exercise registrable-domain grouping
    c = make_corpus(seed=5, n_hosts=4, pages_per_host=6)
    # rewrite hosts to subdomains of two registrable domains
    return c


def _run_both(spark, corpus, cfg, tmp_path, name):
    pages = {p["url"]: p for p in corpus.pages}
    oracle = simulate(pages, corpus.seeds_text, cfg)
    wh = str(tmp_path / name)
    crawl(spark, wh, corpus_to_pages_df(spark, corpus), corpus.seeds_text, cfg, max_rounds=80)
    store = SnapshotStore(spark, wh)
    engine_state = {r["url"]: r.asDict() for r in store.read("url_state").collect()}
    engine_order = sorted(
        ((r["crawl_seq"], r["url"]) for r in store.read_appends("crawl_results").collect())
    )
    oracle_order = sorted((o["crawl_seq"], o["url"]) for o in oracle.crawl_order)
    return oracle, engine_state, engine_order, oracle_order


def test_registrable_domain_politeness(spark, corpus, tmp_path):
    cfg = CrawlConfig(politeness_key="registrable_domain", round_ms=4000)
    oracle, state, eorder, oorder = _run_both(spark, corpus, cfg, tmp_path, "regdom")
    assert set(state) == oracle.seen_set
    assert eorder == oorder
    for u, s in state.items():
        assert s["status"] == oracle.url_state[u]["status"], u


def test_backpressure_drops_children(spark, corpus, tmp_path):
    # threshold below the corpus frontier size ⇒ children of pages parsed
    # while backpressured are neither inserted nor enqueued (parser.go:158-164)
    cfg = CrawlConfig(frontier_backpressure=3, round_ms=4000)
    oracle, state, eorder, oorder = _run_both(spark, corpus, cfg, tmp_path, "bp")
    assert set(state) == oracle.seen_set
    assert eorder == oorder
    # with threshold 3 and >3 seeds the crawl must stay shallow: seen set is
    # far smaller than the unthrottled crawl's
    full = simulate({p["url"]: p for p in corpus.pages}, corpus.seeds_text, CrawlConfig())
    assert len(oracle.seen_set) < len(full.seen_set)


def test_round_capacity_cap(spark, tmp_path):
    # dedicated small corpus: cap=2 forces one round per 2 fetches, so the
    # round count (and test wall) is proportional to corpus size
    corpus = make_corpus(seed=5, n_hosts=2, pages_per_host=4)
    cfg = CrawlConfig(round_capacity=2, round_ms=4000)
    oracle, state, eorder, oorder = _run_both(spark, corpus, cfg, tmp_path, "cap")
    assert set(state) == oracle.seen_set
    assert eorder == oorder
    # cap=2 ⇒ no round fetches more than 2
    per_round: dict[int, int] = {}
    for o in oracle.crawl_order:
        per_round[o["round"]] = per_round.get(o["round"], 0) + 1
    assert max(per_round.values()) <= 2


def test_backoff_jitter_engine_matches_oracle(spark, corpus, tmp_path):
    # non-zero deterministic jitter: engine's column formula must stay
    # bit-identical to functions/backoff.backoff_rounds (ADVICE r1)
    cfg = CrawlConfig(backoff_jitter=0.7, round_ms=2000)
    oracle, state, eorder, oorder = _run_both(spark, corpus, cfg, tmp_path, "jitter")
    assert set(state) == oracle.seen_set
    assert eorder == oorder
    retried = 0
    for u, s in state.items():
        o = oracle.url_state[u]
        assert (s["status"], s["retry_count"], s["next_round"]) == (
            o["status"],
            o["retry_count"],
            o["next_round"],
        ), u
        retried += int(s["retry_count"] > 0)
    assert retried >= 1  # dead links exist in the corpus


def test_null_html_is_fetch_failure(spark, corpus, tmp_path):
    # a pages row with NULL html must take the retry path in BOTH branches
    # of the engine (fetch _ok gate and the slim flags branch) — a one-sided
    # gate would burn a crawl_seq and desync ordering (ADVICE r1)
    import copy

    c2 = copy.deepcopy(corpus)
    victim = None
    for p in c2.pages:  # a root (seed) page — guaranteed to be scheduled
        if p["url"].count("/") == 3 and p["url"].endswith("/") and p.get("lang") != "binary":
            victim = p["url"]
            p["html"] = None
            break
    assert victim is not None
    cfg = CrawlConfig(round_ms=4000)
    oracle, state, eorder, oorder = _run_both(spark, c2, cfg, tmp_path, "nullhtml")
    assert set(state) == oracle.seen_set
    assert eorder == oorder
    assert state[victim]["status"] == "failed"
    assert state[victim]["retry_count"] == oracle.url_state[victim]["retry_count"] >= 1


def test_frontier_trim_lossy(spark, corpus, tmp_path):
    # O4: XAdd MaxLen analog — oldest pending rows are evicted ('trimmed')
    # when the frontier exceeds the cap; engine must match the oracle row
    # for row, and the crawl must be strictly lossy vs the lossless run
    cfg = CrawlConfig(frontier_trim=6, round_ms=4000)
    oracle, state, eorder, oorder = _run_both(spark, corpus, cfg, tmp_path, "trim")
    assert set(state) == oracle.seen_set
    assert eorder == oorder
    for u, s in state.items():
        assert s["status"] == oracle.url_state[u]["status"], u
    assert any(s["status"] == "trimmed" for s in state.values())
    full = simulate(
        {p["url"]: p for p in corpus.pages}, corpus.seeds_text, CrawlConfig(round_ms=4000)
    )
    assert len(oorder) < len(full.crawl_order)


def test_robots_disabled(spark, corpus, tmp_path):
    cfg = CrawlConfig(respect_robots_txt=False, round_ms=4000)
    oracle, state, eorder, oorder = _run_both(spark, corpus, cfg, tmp_path, "norobots")
    assert set(state) == oracle.seen_set
    assert eorder == oorder
    # the robots-denied page is now fetched
    priv = corpus.meta["private_url"]
    assert oracle.url_state.get(priv, {}).get("status") in ("parsed", "skipped")
