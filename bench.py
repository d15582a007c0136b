#!/usr/bin/env python
"""Bench harness (driver contract): runs headline queries at
$SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS], the crawl-engine loop and a
mega fetch round on the deterministic synthetic corpus, and (unless
SPARK_GRAFT_SCALING=0) the N→4N scaling probe at local[1] vs local[4].

Prints ONE COMPACT JSON line (the round-4 lesson: the driver records only
the LAST 2,000 characters of stdout — r4's line, grown past that by
estimator prose and per-sample diagnostics, decapitated itself and the
record parsed null):
  {"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...2dp},
   "sf": ..., "crawl": {...}, "mega_round": {...}, "scaling": {low/high
   medians, factor, efficiency, corpus_hosts, storm_corpus, contaminated}}
The headline is guaranteed ≤ HEADLINE_MAX (1900) chars and is the LAST
bytes written to stdout; the FULL diagnostics (per-sample probe columns,
gate logs, estimator description, stage profiles) are spilled to
BENCH/last_run_full.json on disk.

Budget discipline (the round-3 lesson): EVERY phase deadline derives from ONE
total wall budget (NIMBUS_BENCH_TOTAL_WALL, default 1500 s — the last
completed-and-recorded driver run took 1497 s, so the driver's cap is known
to be at least ~1500; and because a SIGTERM from a tighter external cap
still prints the partial record, overshooting the unknown cap degrades to
a partial JSON, never to nothing). The harness is also
crash-proof: the output dict is filled INCREMENTALLY and printed by a
SIGTERM/SIGINT/SIGALRM handler (plus a normal-path finalize), so a wall-cap
kill still records every completed query, the crawl loop, the mega round,
and any completed scaling samples instead of destroying the run. A SIGALRM
is armed slightly before the budget expires so the harness terminates
itself — with output — even if the external cap is tighter than expected.
"""

from __future__ import annotations

import faulthandler
import json
import os
import shutil
import signal
import statistics
import subprocess
import sys
import tempfile
import threading
import time

# a hard crash (SIGSEGV/SIGBUS/SIGABRT in a native lib) is the one exit the
# incremental-output machinery cannot intercept — at least leave a stderr
# traceback saying where (observed once: a rehearsal died silently mid-query
# with zero stdout and no kernel OOM record)
faulthandler.enable()

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCALING = os.environ.get("SPARK_GRAFT_SCALING", "1") != "0"

BENCH_QUERIES = [
    "tpch_q1_pricing",
    "top_customers",
    "lineitem_rollup",
    "events_sessionize",
    "politeness_budget_rank",
    "seen_antijoin",
    "content_dedup_first_wins",
    "frontier_priority_topk",
    "retry_backoff",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_minhash_verified",
    "dedup_simhash",
    "simhash_near_pairs",
    "dedup_ngram_jaccard",
    "multimodal_features",
    "multimodal_raw_stats",
    "multimodal_decode",
    "quality",
    "repetition",
    "curation",
    "decontaminate",
    "pii_scrub",
    "dedup_clusters",
    "dedup_survivors",
    "lang_id",
    "token_counts",
    "chunk_documents",
    "pack_sequences",
    "term_stats",
    "unigram_lm",
    "importance_weights",
    "pagerank",
    "inverted_index",
    "bpe_pair_counts",
    "bm25_topk",
    "quality_histogram",
    "mixture_sample",
    "stratified_topk",
    "hash_split",
    "epoch_shuffle",
    "boilerplate_lines",
    "fingerprints",
    "canonicalize",
    "extract_roundtrip",
    "ann_cosine_topk",
    "ann_bucketed",
    "ann_ivf",
    "embedding_norms",
    "dedup_embedding_cosine",
]

# crawl-loop corpus (politeness-paced, several rounds — orchestration cost)
LOOP_HOSTS = int(os.environ.get("NIMBUS_BENCH_LOOP_HOSTS", "150"))
LOOP_PPH = int(os.environ.get("NIMBUS_BENCH_LOOP_PPH", "12"))
# mega-round corpus (one big fetch round — the scaling unit; sized so the
# Arrow-batched parse UDF dominates fixed per-job latency)
MEGA_HOSTS = int(os.environ.get("NIMBUS_BENCH_MEGA_HOSTS", "10000"))
MEGA_PPH = int(os.environ.get("NIMBUS_BENCH_MEGA_PPH", "45"))
MEGA_DOM = int(os.environ.get("NIMBUS_BENCH_MEGA_DOM", "40"))
# scaling pair: N→4N cores. 1→4 keeps BOTH levels below the host socket's
# memory-bandwidth knee as well as far from core saturation: the round-5
# streaming parser is ~2.7× more bandwidth-intensive per core, and at
# 8 pinned cores the round runs AT the socket's own memcpy ceiling (the
# host's aggregate memcpy scales ~0.78 from 1→8 cores — BENCH/BASELINE.md
# §2 control), so a 2→8 ratio measures the bus, not the plan (measured:
# fetch_parse 3.1-3.7× at 2→8 vs a clean 4.01× at 1→4 on the same
# input). A real N→4N executor fleet adds nodes with their own memory
# buses — the narrow pair is the honest stand-in. Each level runs in an
# isolated subprocess pinned to exactly N (+1 driver) cores with
# 4 GiB/core heap (plans/scalerun.py).
SCALE_LOW = int(os.environ.get("SPARK_GRAFT_SCALE_LOW", "1"))
SCALE_HIGH = int(os.environ.get("SPARK_GRAFT_SCALE_HIGH", str(min(4 * SCALE_LOW, CPUS))))
# scaling corpus at production-weight DOM (d200 pages, ~20-30 KB HTML — still
# LIGHTER than median real-web HTML). Sized so the ~14-17 s fixed per-round
# driver cost (plan construction, py4j, commit marker — constant across
# corpus sizes; at production round sizes amortized to nothing) stays a
# small share of the HIGH level's wall: at 4000 hosts the clean-host pair
# recorded 0.785 purely because 14 s was 20% of the 70 s 8-core wall while
# the variable work scaled at 0.92. Round 4 re-sized to 8000 hosts after
# a ~2× engine speedup; round 5's streaming HTML parser made the engine
# another ~2.2× faster at the round level (8-core wall 102 → 48.65 s on
# the 8000-host corpus, clean window), pushing the fixed share back to 31%
# and a clean-pair ceiling of ~0.74 — so the measurement re-sizes again:
# 10,000 hosts at the 1→4 level pair, restoring the proven wall shape
# (~355 s at 1 core, ~100 at 4 — measured 0.881 clean, fetch_parse 4.01×)
# at unchanged budget cost.
SCALE_HOSTS = int(os.environ.get("NIMBUS_BENCH_SCALE_HOSTS", "10000"))
SCALE_DOM = int(os.environ.get("NIMBUS_BENCH_SCALE_DOM", "200"))
# storm fallback corpus: when the scaling phase STARTS inside a declared
# contention storm (same probes as the gate), no full-corpus pair can
# finish — a dress rehearsal measured the 2-core rep at 906 s (2.1× quiet;
# even the "storm-immune" level collapses under sustained steal of 30-65
# jiffies/s) which alone ate the phase budget. The fallback keeps the same
# 1:4 size ratio to the full corpus across re-sizings (2000:8000 before
# the streaming parser, 2500:10000 after — the 2.2× engine speedup keeps
# the 2500-host storm walls near the old 2000-host cost, which fits even
# at the measured worst-case inflation: wide reps slow >3.2× under ~80
# jiffies/s steal). The smaller frontier raises the fixed-driver-cost
# share, biasing the measured efficiency DOWN — conservative for the ≥0.8
# criterion and recorded (`storm_corpus: true`) so provenance is auditable.
SCALE_HOSTS_STORM = int(os.environ.get("NIMBUS_BENCH_SCALE_HOSTS_STORM", "2500"))

# ---------------------------------------------------------------------------
# one total wall budget; crash-proof incremental output
# ---------------------------------------------------------------------------

TOTAL_WALL = float(os.environ.get("NIMBUS_BENCH_TOTAL_WALL", "1500"))
RESERVE = 40.0  # tail reserve: finalize + JSON print + interpreter teardown
# Protected scaling budget: the north-rule number is the round's #1
# deliverable, so the main phase may spend at most TOTAL_WALL - SCALE_RESERVE
# before handing over. Sized for the quiet-case 1→4 schedule (pathfinder
# ~60 s + 1 low rep ~440 s + 3 high reps ~140 s, ×1.15 fit margin,
# + gates/probes ≈ 880 s); the quiet main phase needs ~300 s, so both fit
# with headroom (measured: the two validating runs closed at 1,102/1,108 s
# total with the full schedule and a budget-skipped second low rep). Under a
# contention storm (observed: main phase inflates 3-5×) the main phase
# skips its tail — recorded, never silent — instead of starving scaling
# to zero samples (the failure a round-4 storm rehearsal demonstrated).
SCALE_RESERVE = float(os.environ.get("NIMBUS_BENCH_SCALE_RESERVE", "900")) if SCALING else 0.0
T0 = time.monotonic()

OUT: dict = {
    "sf": SF_DIR,
    "cpus": CPUS,
    "budget_sec": TOTAL_WALL,
    "metric": "crawl URLs/sec + query secs",
    "unit": "sec",
}
_PRINTED = False
_HEADLINE_PRINTED = False
_CHILD: subprocess.Popen | None = None

# The driver's record is the LAST 2,000 characters of stdout; the headline
# line must fit entirely inside that window with margin for its newline.
HEADLINE_MAX = 1900
FULL_DIAG_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH", "last_run_full.json"
)


def _compact_level(lev) -> dict | None:
    """One scaling level for the headline: median + validity count only."""
    if not isinstance(lev, dict):
        return None
    return {
        "cores": lev.get("cores"),
        "urls_per_sec_median": lev.get("urls_per_sec_median"),
        "n_valid": 0 if lev.get("fallback_all_samples") else lev.get("median_over_valid", 0),
    }


def compact_headline(out: dict) -> dict:
    """Distill the full incremental record into the ≤HEADLINE_MAX headline.

    Keeps: identity (metric/unit/sf/cpus/budget), per-query secs (2 dp),
    crawl + mega_round throughput, the scaling verdict (per-level medians,
    factor, efficiency, corpus provenance, contamination flag), value, and
    any truncated error markers. Drops: samples, gate logs, estimator prose,
    stage profiles, notes — all of which live in BENCH/last_run_full.json.
    Degrades (queries → summary) rather than ever exceeding the cap.
    """
    head: dict = {
        "metric": out.get("metric"),
        "unit": out.get("unit"),
        "sf": out.get("sf"),
        "cpus": out.get("cpus"),
        "budget_sec": out.get("budget_sec"),
    }
    for k in ("terminated_by", "main_phase_error", "scaling_phase_error"):
        if k in out:
            head[k] = str(out[k])[:80]
    q = out.get("queries")
    if isinstance(q, dict):
        head["queries"] = {k: round(v, 2) for k, v in q.items()}
    if out.get("skipped_queries"):
        head["skipped_queries_n"] = len(out["skipped_queries"])
    for k in ("crawl", "mega_round"):
        blk = out.get(k)
        if isinstance(blk, dict):
            head[k] = {
                kk: blk[kk]
                for kk in ("urls_per_sec", "fetched", "rounds", "frontier",
                           "wall_sec", "skipped")
                if kk in blk
            }
    sc = out.get("scaling")
    if isinstance(sc, dict):
        head["scaling"] = {
            "low": _compact_level(sc.get("low_parallelism")),
            "high": _compact_level(sc.get("high_parallelism")),
            "factor": sc.get("factor"),
            "efficiency": sc.get("efficiency"),
            "corpus_hosts": sc.get("corpus_hosts"),
            "storm_corpus": sc.get("storm_corpus"),
            "contaminated": bool(sc.get("contaminated_record", False)),
        }
        if sc.get("partial"):
            head["scaling"]["partial"] = True
    elif isinstance(out.get("scaling_probe"), dict):
        # killed before both levels had a sample: record the attempt counts
        samp = out["scaling_probe"].get("samples") or []
        head["scaling_samples"] = {
            "n": len(samp),
            "n_valid": sum(1 for s in samp if s.get("valid")),
        }
    pss = out.get("parse_stage_scaling")
    if isinstance(pss, dict):
        head["parse_stage_efficiency"] = pss.get("efficiency")
    if "value" in out:
        head["value"] = out["value"]
    # never exceed the window: degrade in two bounded steps instead of
    # asserting (an assert here would destroy the record it protects)
    if len(json.dumps(head)) > HEADLINE_MAX and "queries" in head:
        qs = head.pop("queries")
        vals = list(qs.values())
        head["queries_summary"] = {
            "n": len(qs),
            "sum_sec": round(sum(vals), 1) if vals else 0,
            "max_sec": round(max(vals), 1) if vals else 0,
        }
    if len(json.dumps(head)) > HEADLINE_MAX:
        for k in ("crawl", "mega_round", "parse_stage_efficiency", "scaling_samples"):
            head.pop(k, None)
    return head


def writeback_mb() -> float:
    """Dirty+Writeback from /proc/meminfo in MB (0.0 if unreadable) — the
    self-noise counter the pathfinder settle waits on: right after the
    32-core main phase the kernel is still flushing our own page-cache
    exhaust, which the mid-run bandwidth poller would read as weather."""
    try:
        mb = 0.0
        with open("/proc/meminfo") as f:
            for ln in f:
                if ln.startswith(("Dirty:", "Writeback:")):
                    mb += int(ln.split()[1]) / 1024.0
        return mb
    except (OSError, ValueError, IndexError):
        return 0.0


def bw_during_only_invalid(s: dict, valid_steal: float, bw_thresh: float) -> bool:
    """True iff a sample failed validity SOLELY on the mid-run bandwidth
    median — steal and both bracketing probes clean. This is the signature
    of post-main-phase writeback self-noise (observed 2026-08-20: pathfinder
    bw_during_median 1.56 GB/s against brackets 4.43/4.78 and steal 2.6/s,
    followed by five straight valid reps). Any invalid pathfinder now earns
    one reprobe-gated retry; this predicate only labels the retry's reason
    (bw-only self-noise vs generic transient). Missing fields read as
    failing (steal 99/s, bw 0.0): an aborted or crashed sample never
    matches."""
    return (
        s.get("steal_rate_during", 99.0) <= valid_steal
        and s.get("bw_before", 0.0) >= bw_thresh
        and s.get("bw_after", 0.0) >= bw_thresh
    )


def remaining() -> float:
    return TOTAL_WALL - (time.monotonic() - T0)


def main_remaining() -> float:
    """Budget left for the (skippable) main phase, net of the scaling reserve."""
    return remaining() - SCALE_RESERVE


def finalize() -> None:
    """Spill full diagnostics to disk, then print the headline LAST.

    NOTHING between the re-entrancy guard and the print may abort the
    print: the diag dump catches Exception (not just OSError — a stray
    non-JSON-serializable value, e.g. a numpy scalar in a sample column,
    raises TypeError) and both serializations use ``default=str`` so an
    unexpected value degrades to its repr instead of destroying the
    record. A headline-build failure still prints a minimal error line —
    a short record always beats rc-0-with-no-output (the round-4 lesson,
    generalized)."""
    global _PRINTED, _HEADLINE_PRINTED
    if _PRINTED:
        return
    _PRINTED = True
    OUT["value"] = round(time.monotonic() - T0, 2)
    try:
        # serialize BEFORE opening: a mid-dump failure (circular ref) must
        # not leave a torn file over the previous run's good diagnostics
        blob = json.dumps(OUT, indent=1, default=str)
        os.makedirs(os.path.dirname(FULL_DIAG_PATH), exist_ok=True)
        with open(FULL_DIAG_PATH, "w") as f:
            f.write(blob)
    except Exception:
        pass
    try:
        line = json.dumps(compact_headline(OUT), default=str)
        if len(line) > HEADLINE_MAX:
            raise ValueError(f"headline {len(line)} > {HEADLINE_MAX}")
    except Exception as exc:  # pragma: no cover - defensive
        line = json.dumps(
            {
                "metric": OUT.get("metric"),
                "unit": "sec",
                "value": OUT.get("value"),
                "headline_error": f"{type(exc).__name__}: {exc}"[:200],
            },
            default=str,
        )
    # the headline must be the LAST bytes on stdout: flush both streams
    # first, print it, write nothing after
    sys.stderr.flush()
    sys.stdout.flush()
    print(line, flush=True)
    _HEADLINE_PRINTED = True


def _on_signal(signum, frame):  # noqa: ARG001
    child = _CHILD
    if child is not None:
        try:
            child.kill()
        except OSError:
            pass
    if not _PRINTED:
        OUT["terminated_by"] = signal.Signals(signum).name
        finalize()
        os._exit(0)
    if _HEADLINE_PRINTED:
        os._exit(0)
    # the signal interrupted an in-progress finalize() (it runs on this
    # same main-thread stack): returning resumes it so the headline still
    # prints; exiting here would discard the record at the finish line
    return


for _sig in (signal.SIGTERM, signal.SIGINT, signal.SIGALRM):
    signal.signal(_sig, _on_signal)
# self-terminate (with output) before the budget expires: if an external cap
# kills us first the SIGTERM handler prints; if not, the alarm does
signal.alarm(max(int(TOTAL_WALL - RESERVE / 2), 60))


def _force(df) -> int:
    """Execute the full plan INCLUDING every output column.

    A bare ``df.count()`` lets Catalyst prune unreferenced columns, so for
    pure-projection queries (quality, lang_id, repetition, fingerprints, …)
    it timed only the parquet scan — the expressions never ran (discovered
    round 4: 'quality' measured 0.2 s pruned vs ~1 s real). Hashing all
    columns into one JVM-side aggregate forces evaluation with negligible
    overhead and no driver-side data movement."""
    from pyspark.sql import functions as F

    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        # bit_xor, not sum: sum(hash) overflows long under ANSI mode
        F.bit_xor(F.xxhash64(*df.columns)).alias("h"),
    ).collect()[0]
    return row["n"]


def _bench_tmpdir(prefix: str) -> str:
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    return tempfile.mkdtemp(prefix=prefix, dir=base)


def _session(master: str):
    from nimbus_crawler_spark.session import build_session

    return build_session(app_name="nimbus-bench", master=master, shuffle_partitions=32)


def run_main_phase(spark) -> None:
    """Headline queries + crawl loop + mega round; fills OUT incrementally.

    Storm posture: everything here is SKIPPABLE (recorded, never silent) —
    the phase must hand the scaling phase its reserved budget even when host
    contention inflates each item 3-5×. The scale corpus + template are built
    FIRST (the scaling phase cannot run without them and a storm rehearsal
    measured 176 s for this setup mid-storm), then queries, then mega round,
    then crawl loop, each fit-checked against the main-phase budget.
    """
    import __spark_entry__ as entrymod
    from nimbus_crawler_spark.plans.bench import (
        bench_crawl_loop,
        bench_mega_round,
        cached_corpus_path,
    )

    qs = entrymod.queries()

    # untimed warmup: JIT, codegen caches, Python UDF workers, parquet
    # footer reads — the timed queries then measure steady-state throughput
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.limit(256).selectExpr("md5(text)").count()
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(256).count()

    if SCALING:
        # generate the scaling corpus and pre-seed its template warehouse on
        # THIS 32-core session, BEFORE any skippable work: setup stays out of
        # the (pinned, slow) first scaling rep and a storm-inflated main
        # phase can never starve the scaling phase of its prerequisites
        from nimbus_crawler_spark.plans.bench import ensure_scale_template

        t_gen = time.monotonic()
        # storm corpus first: it is the one needed when time is shortest
        for hosts in (SCALE_HOSTS_STORM, SCALE_HOSTS):
            scale_pages = cached_corpus_path(
                None, hosts, MEGA_PPH, fanout=4, zipf_s=0.12,
                para_words=(60, 160), heavy_dom=SCALE_DOM,
            )
            ensure_scale_template(spark, scale_pages)
        OUT["scale_setup_sec"] = round(time.monotonic() - t_gen, 1)

    query_secs: dict[str, float] = {}
    skipped_queries: list[str] = []
    OUT["queries"] = query_secs
    # per-query fit estimate: 1.5× the slowest query observed so far (the
    # timed queries are ≤ ~16 s quiet; under a storm the growing estimate
    # tracks the inflation), floor 15 s
    q_est = 15.0
    for name in BENCH_QUERIES:
        if name not in qs:
            continue
        if main_remaining() < q_est:
            skipped_queries.append(name)
            continue
        t0 = time.perf_counter()
        if name == "dedup_ngram_jaccard":
            # run via the operator with an Observation so the candidate-pair
            # count (the DF-cap's coverage bound) is visible, not silent —
            # same params as the queries() entry, no extra job
            from pyspark.sql import Observation

            from nimbus_crawler_spark.operators.textdedup import ngram_jaccard_pairs

            obs = Observation()
            _force(
                ngram_jaccard_pairs(
                    docs, threshold=0.3, shingle_n=3, max_doc_freq=20, observation=obs
                )
            )
            OUT["ngram_candidate_pairs"] = int(obs.get["candidate_pairs"])
        else:
            _force(qs[name](spark, SF_DIR))
        secs = round(time.perf_counter() - t0, 3)
        query_secs[name] = secs
        q_est = max(q_est, 1.5 * secs)
    if skipped_queries:
        OUT["skipped_queries"] = skipped_queries

    # mega round before crawl loop: it is the headline throughput number
    # (BASELINE.md §1) — if the budget only fits one, it's this one.
    # Estimates are storm-aware: quiet walls are ~21 s (mega) / ~34 s
    # (crawl), storm-observed ~107/~101 s; the corpus cache build (first run
    # on a host) adds ~30-60 s, covered by the margin in the estimates.
    if main_remaining() > 150.0:
        mega_pages = cached_corpus_path(
            spark, MEGA_HOSTS, MEGA_PPH, fanout=4, zipf_s=0.12,
            para_words=(60, 160), heavy_dom=MEGA_DOM,
        )
        wh = _bench_tmpdir("nimbus-bench-mega-")
        OUT["mega_round"] = bench_mega_round(spark, mega_pages, wh)
        shutil.rmtree(wh, ignore_errors=True)
    else:
        OUT["mega_round"] = {"skipped": "budget"}

    if main_remaining() > 150.0:
        loop_pages = cached_corpus_path(spark, LOOP_HOSTS, LOOP_PPH, fanout=5)
        wh = _bench_tmpdir("nimbus-bench-wh-")
        OUT["crawl"] = bench_crawl_loop(spark, loop_pages, wh)
        shutil.rmtree(wh, ignore_errors=True)
    else:
        OUT["crawl"] = {"skipped": "budget"}


def run_scaling_phase() -> None:
    """N→4N scaling probe: fixed rep schedule, per-level median over
    environment-valid samples, all inside the remaining total budget.

    The sandbox host has bursty external contention with TWO faces, both
    hitting the levels ASYMMETRICALLY (the 2-core level uses 2 of 32 host
    cores and is nearly immune; the 8-core level swings ±50%):
      (1) hypervisor CPU steal — visible in /proc/stat; bursts last minutes.
          Throughput tracks during-run steal even at low rates (measured
          0.4/s → 1920, 2.1/s → 1864, 4.4/s → 1600 URLs/s on identical
          input).
      (2) memory-bandwidth contention from co-tenants — INVISIBLE to steal
          (measured: an 8-core round at 2.0 jiffies/s steal ran 2.3× slower
          than quiet-window pairs while a single-core 256 MB memcpy probe
          collapsed from 4.3 GB/s to 0.26 GB/s).
    Both defenses are pre-registered ENVIRONMENTAL checks, never the measured
    throughput: the gate before each rep requires steal-rate < quiet_thresh
    AND probe bandwidth ≥ bw_thresh — but the gate WAIT is bounded (default
    ≤120 s per rep, doubling per consecutive invalid sample at that level:
    storms last tens of minutes, so once a rep has demonstrably burned into
    one, waiting longer beats burning another): with during-run validity
    marking as the real defense, an endless gate would just burn the budget
    sleeping (the round-3
    failure mode). A sample is VALID iff its during-run steal ≤ valid_steal
    AND the bandwidth probes bracketing it (pre + post) both clear bw_thresh
    AND — when the rep ran long enough for ≥2 readings — the MEDIAN of
    mid-run bandwidth probes (polled every ~20 s while the rep runs) clears
    bw_thresh too. The mid-run criterion closes the one false-accept hole
    the bracketing probes left: a round-5 rehearsal recorded an 8-core rep
    that walled 244 s (~2× quiet) under co-tenant bandwidth contention that
    started after the pre-probe and ended before the post-probe — during-run
    steal 1.6/s, brackets 4.9/4.0 GB/s, sample "valid", efficiency 0.621
    unflagged. The median (never the min) is what's tested so the rep's own
    page-cache writeback — a known ~5 s self-noise dip, see settled_probe —
    cannot false-reject a quiet rep (calibration on a quiet host: mid-run
    readings median 5.07, min 2.78 GB/s, rep throughput undisturbed). The base schedule runs with NO inline retries (securing one
    sample per level first, so an efficiency record always exists); a retry
    pass then backfills validity from bounded per-level budgets (a crashed
    subprocess consumes a retry and is recorded in the samples log — never
    silently dropped): HIGH re-runs until all its reps are valid, LOW only
    if no valid low sample exists — a contaminated low sample can only bias
    efficiency UP, so discarding it is conservative and its re-run must
    never crowd out a high rep. Rep allocation is noise-weighted:
    high ×3, low ×2 (the insensitive level needs fewer reps). The corpus is
    chosen by a PATHFINDER rep (one cheap storm-corpus high rep whose
    during-run validity measures the coming window — a point probe cannot);
    the base schedule is then L,H,H,H(,L): the expensive low rep runs first,
    inside the window the pathfinder proved, and the cheap abort-capped high
    reps follow; the trailing low rep is the first budget-skipped. Before each
    rep the harness checks the rep's estimated wall (last observed wall for
    that level × 1.15) against the remaining budget and skips reps that
    don't fit, keeping ≥1 attempted sample per level.
    """
    from nimbus_crawler_spark.plans.bench import cached_corpus_path

    global _CHILD

    reps_low = int(os.environ.get("NIMBUS_BENCH_REPS_LOW", "2"))
    reps_high = int(os.environ.get("NIMBUS_BENCH_REPS_HIGH", "3"))
    # quiet threshold: steal-rate in jiffies/s (1 jiffy = 10 ms CPU);
    # quiet windows measure <1, bursts tens-to-hundreds
    quiet_thresh = float(os.environ.get("NIMBUS_BENCH_QUIET_STEAL", "10"))
    # during-run steal ≤ 3 jiffies/s ≈ ≤3% throughput effect (measured
    # 2.1/s → −3% on identical input); stricter thresholds discard
    # near-clean samples and burn the retry budget on this bursty host
    valid_steal = float(os.environ.get("NIMBUS_BENCH_VALID_STEAL", "3.0"))
    # single-core memcpy probe: quiet host measures 4.3-5.7 GB/s,
    # contended 0.01-3.2 GB/s
    bw_thresh = float(os.environ.get("NIMBUS_BENCH_QUIET_BW", "3.0"))
    gate_wait_max = float(os.environ.get("NIMBUS_BENCH_GATE_WAIT", "120"))
    retries = {
        SCALE_LOW: int(os.environ.get("NIMBUS_BENCH_RETRIES_LOW", "2")),
        SCALE_HIGH: int(os.environ.get("NIMBUS_BENCH_RETRIES_HIGH", "3")),
    }
    # initial per-rep wall estimates (subprocess total: JVM start + warmup +
    # template copy + timed round + optional parse probe), refined from each
    # observed rep; used only for budget fit checks and abort caps. Seeded
    # after the weather probe picks the corpus (linear in frontier size on
    # top of the measured ~100/80 s fixed subprocess cost; 8000 hosts ≙ the
    # measured 500/180 s walls).
    est: dict = {}
    corpus: dict = {"hosts": None, "path": None}
    storm: dict = {"on": False}
    runs: dict = {SCALE_LOW: [], SCALE_HIGH: []}
    ps: dict = {}
    samples: list = []
    gate_log: list = []
    skipped: list = []
    # live references into OUT from the phase start: a kill at ANY moment
    # (even before both levels have a sample — dress rehearsal 2 lost a
    # completed high rep exactly that way) then still records every
    # completed sample and gate probe; replaced by the full scaling block
    # once both levels have data
    OUT["scaling_probe"] = {
        "samples": samples,
        "quiet_gate_rates": gate_log,
        "skipped_reps": skipped,
    }
    env = {**os.environ, "PYTHONPATH": os.path.dirname(os.path.abspath(__file__))}
    if CPUS < SCALE_HIGH + 1:
        # not enough host CPUs to grant BOTH levels the +1 shared driver
        # core — disable it symmetrically rather than skewing one level
        env["NIMBUS_SCALE_DRIVER_CORE"] = "0"

    def steal_jiffies() -> int:
        try:
            with open("/proc/stat") as f:
                parts = f.readline().split()
            return int(parts[8]) if len(parts) > 8 else 0
        except OSError:
            return 0

    def steal_rate(window_s: float = 3.0) -> float:
        s0 = steal_jiffies()
        time.sleep(window_s)
        return (steal_jiffies() - s0) / window_s

    import numpy as _np

    _bw_src = _np.ones(64 * 1024 * 1024, dtype=_np.uint8)
    _bw_dst = _bw_src.copy()

    def bw_gbps() -> float:
        """Single-core memcpy rate on warm buffers (2×64 MB copies)."""
        t0 = time.perf_counter()
        _np.copyto(_bw_dst, _bw_src)
        _np.copyto(_bw_dst, _bw_src)
        return 0.125 / max(time.perf_counter() - t0, 1e-9)

    def env_probe() -> tuple[float, float]:
        return steal_rate(), bw_gbps()

    def settled_probe() -> tuple[float, float]:
        """Post-run probe: steal rate plus the BEST of ≤3 bw readings 5 s
        apart. A single memcpy reading taken within ~30 s of a rep's
        subprocess exiting can catch the kernel writing back the rep's own
        page-cache exhaust (measured on a quiet host: a 3 GB-write child
        exits, readings go 4.5 → 4.6 → 1.8 → 4.7 GB/s as the ~5 s-delayed
        writeback burst passes through) — self-noise, not host weather. A
        real storm depresses ALL readings; writeback only some, so best-of
        separates them. Early-exits once a reading clears bw_thresh; still
        counter-based and outcome-independent (never reads throughput).
        Worst case +10 s per rep, only paid when the first reading is low."""
        rate = steal_rate()
        best = bw_gbps()
        for _ in range(2):
            if best >= bw_thresh:
                break
            time.sleep(5)
            best = max(best, bw_gbps())
        return rate, best

    def quiet_gate(wait_budget: float, cap_mult: float = 1.0) -> tuple[float, float]:
        """Wait (bounded) for a quiet host window; returns the last probe.

        ``cap_mult`` escalates the wait cap when a level's samples keep
        coming back invalid: contention storms on this host last tens of
        minutes, so burning a rep into a known-bad window wastes ~3-7 min of
        budget that waiting would spend outlasting the storm instead. The
        escalation keys on validity flags (host counters), never measured
        throughput — outcome-independent."""
        waited = 0.0
        rate, bw = env_probe()
        cap = min(gate_wait_max * cap_mult, wait_budget)
        while (rate > quiet_thresh or bw < bw_thresh) and waited < cap:
            time.sleep(20)
            waited += 23.0
            rate, bw = env_probe()
        gate_log.append([round(rate, 1), round(bw, 2)])
        return rate, bw

    # parse probes count VALID probes only: a probe that ran inside a
    # contaminated rep measures the storm, not the stage (dress rehearsal 5
    # recorded parse_stage efficiency 0.195 from exactly that), so an
    # invalid rep's probe is discarded and the next rep at that level probes
    # again — bounded by a per-level attempt cap so storms can't make every
    # rep pay the ~25 s probe cost forever
    parse_probes = {SCALE_LOW: 0, SCALE_HIGH: 0}
    probe_attempts = {SCALE_LOW: 0, SCALE_HIGH: 0}

    def update_scaling(partial: bool) -> None:
        """(Re)compute the scaling block from samples so far — called after
        every rep so a kill at ANY point leaves the best current answer."""
        if not (runs[SCALE_LOW] and runs[SCALE_HIGH]):
            return
        lo, hi = median_run(runs[SCALE_LOW]), median_run(runs[SCALE_HIGH])
        factor = SCALE_HIGH / SCALE_LOW
        eff = hi["urls_per_sec_median"] / (factor * lo["urls_per_sec_median"])
        contaminated = lo["fallback_all_samples"] or hi["fallback_all_samples"]
        OUT["scaling"] = {
            **(
                {
                    "contaminated_record": True,
                    "note": (
                        "one or both levels have no environment-valid sample: "
                        "this ratio measures host contention, not the engine "
                        "— see per-sample steal/bw columns below and the "
                        "clean-host reproductions (0.833/0.839, 8000-host "
                        "corpus) in BENCH/BASELINE.md §2"
                    ),
                }
                if contaminated
                else {}
            ),
            "low_parallelism": {"cores": SCALE_LOW, **lo},
            "high_parallelism": {"cores": SCALE_HIGH, **hi},
            "factor": factor,
            "efficiency": round(eff, 3),
            "corpus_hosts": corpus["hosts"],
            "storm_corpus": storm["on"],
            "isolation": "cpu-pinned subprocess, 4GiB/core",
            "estimator": (
                f"median per level over environment-valid reps "
                f"(low×{reps_low}, high×{reps_high}; gate: steal < "
                f"{quiet_thresh}/s AND probe bw ≥ {bw_thresh} GB/s, wait "
                f"≤{gate_wait_max:.0f}s ×2^consecutive-invalid at that "
                f"level; sample valid iff during-run steal "
                f"≤ {valid_steal}/s AND pre/post bw probes ≥ {bw_thresh} "
                f"GB/s (post = best of ≤3 readings 5 s apart: post-exit "
                f"writeback of the rep's own exhaust is self-noise, not "
                f"weather) AND, with ≥2 mid-run bw readings (polled every "
                f"~20 s), their median ≥ {bw_thresh} GB/s (median not min: "
                f"one reading can be the rep's own writeback dip); corpus "
                f"picked by a storm-corpus pathfinder rep (one retry iff it "
                f"completed invalid AND a fresh point probe reads quiet AND "
                f"budget fits — transient-vs-sustained separation, reason "
                f"recorded; a ≤60 s Dirty+Writeback settle precedes it), "
                f"base schedule L,H,H,H,L with no inline retries, "
                f"then a retry pass: high until {reps_high} valid or budget "
                f"out, low only if no valid low sample; retries unused: "
                f"low {retries[SCALE_LOW]} high {retries[SCALE_HIGH]})"
            ),
            "quiet_gate_rates": gate_log,
            "samples": samples,
            "skipped_reps": skipped,
            "partial": partial,
        }
        if not partial:
            del OUT["scaling"]["partial"]
        if SCALE_LOW in ps and SCALE_HIGH in ps:
            OUT["parse_stage_scaling"] = {
                "low": {"cores": SCALE_LOW, **ps[SCALE_LOW]},
                "high": {"cores": SCALE_HIGH, **ps[SCALE_HIGH]},
                "factor": factor,
                "efficiency": round(
                    ps[SCALE_HIGH]["pages_per_sec"]
                    / (factor * ps[SCALE_LOW]["pages_per_sec"]), 3
                ),
            }

    consec_invalid = {SCALE_LOW: 0, SCALE_HIGH: 0}

    def fits(m: int) -> bool:
        """THE budget predicate — shared by the schedule loop, the retry
        loops, and one_run's own skip check, so a rep that passes the outer
        check can never be immediately re-skipped inside (which burned
        retries on no-op attempts in r4). Includes the storm-mode protect
        term: a low rep must always leave room for one high rep, or no
        ratio exists at all."""
        protect = est[SCALE_HIGH] * 4.0 if (storm["on"] and m == SCALE_LOW) else 0.0
        return remaining() - RESERVE - protect > est[m]

    def one_run(m: int, rep: int, allow_parse: bool = True, pathfinder: bool = False) -> str:
        """One pinned measurement; returns 'valid' | 'invalid' | 'crashed' | 'skipped'."""
        global _CHILD
        # a rep whose abort cap cannot even cover its own estimate is futile
        # — it would burn the whole cap and record nothing (observed: a
        # trailing low rep got a 60 s floor-cap attempt against a ~200 s
        # estimate). Skip it, keeping the ≥1-attempted-sample-per-level
        # invariant.
        if runs[m] and not pathfinder and not fits(m):
            skipped.append({"cores": m, "rep": rep, "reason": "cap"})
            return "skipped"
        # storm escalation: each consecutive invalid sample at this level
        # doubles the gate wait cap (120 → 240 → 480 s…), bounded by what
        # the budget can spare beyond the rep itself
        pre_rate, pre_bw = quiet_gate(
            remaining() - est[m] - RESERVE, cap_mult=2.0 ** consec_invalid[m]
        )
        # the parse-stage probe costs ~25 s per low-level run: probe until
        # TWO probes land inside VALID reps (≤3 attempts), then stop. Two,
        # not one, because the estimator is keep-max and a single probe can
        # straddle a bandwidth dip inside an otherwise-valid rep (observed:
        # a probe inside a valid-but-weakest rep recorded parse efficiency
        # 0.278 against the 0.89-0.99 clean-weather range)
        with_parse = allow_parse and parse_probes[m] < 2 and probe_attempts[m] < 3
        probe_attempts[m] += 1 if with_parse else 0
        renv = {**env, "NIMBUS_SCALE_PARSE": "1" if with_parse else "0"}
        t_rep = time.monotonic()
        proc = subprocess.Popen(
            [sys.executable, "-m", "nimbus_crawler_spark.plans.scalerun",
             str(m), corpus["path"]],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=renv,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        _CHILD = proc
        # mid-run bandwidth poller: one ~30 ms memcpy reading every ~20 s
        # while the rep runs (the parent is otherwise blocked in
        # communicate(); the probe thread schedules on host cores outside
        # the child's pinned set — calibrated to not disturb the rep). The
        # main thread only touches the shared probe buffers before start()
        # and after join(), so the readings never race the gate probes.
        bw_during: list[float] = []
        _poll_stop = threading.Event()

        def _poll_bw() -> None:
            while not _poll_stop.wait(20.0):
                bw_during.append(bw_gbps())

        _poller = threading.Thread(target=_poll_bw, daemon=True)
        _poller.start()

        def _stop_poller() -> None:
            _poll_stop.set()
            _poller.join(timeout=30.0)

        def _bw_during_fields() -> dict:
            if not bw_during:
                return {}
            return {
                "bw_during_median": round(statistics.median(bw_during), 2),
                "bw_during_min": round(min(bw_during), 2),
                "bw_during_n": len(bw_during),
            }
        # Per-rep wall cap, outcome-independent (time + budget, never
        # throughput): a rep running past 2× its level's estimate is inside
        # a contention storm (dress rehearsal: a quiet-gated 8-core rep hit
        # mid-rep steal of 51 jiffies/s and walled 479 s vs ~175 quiet) and
        # would fail during-run validity anyway — killing it reclaims the
        # budget so a later rep can run when the storm passes, instead of
        # one doomed rep eating the whole phase. The remaining-budget bound
        # converts "self-alarm kills a mid-flight rep and loses everything
        # after it" into a recorded abort with budget left for the record.
        # Declared-storm mode runs KNOWINGLY contaminated reps (for the
        # flagged fallback record), so the 2× storm-detector cap doesn't
        # apply; there the cap's only job is budget protection — and the low
        # rep must leave room for one high rep or no ratio exists at all.
        # storm-mode multiplier is 4×: a rehearsal measured an 8-core rep
        # aborting at 3× its estimate while a completed one would have given
        # the round its only ratio — heavy steal (~80 jiffies/s) inflates
        # the 8-core level >3.2×. The pathfinder needs only to DETECT a
        # storm, not measure through one, so it aborts at 1.5×.
        if pathfinder:
            cap = max(min(est[m] * 1.5, remaining() - RESERVE), 60.0)
        elif storm["on"]:
            protect = est[SCALE_HIGH] * 4.0 if m == SCALE_LOW else 0.0
            cap = max(min(est[m] * 4.0, remaining() - RESERVE - protect), 60.0)
        else:
            cap = max(min(est[m] * 2.0, remaining() - RESERVE), 60.0)
        try:
            out_s, err_s = proc.communicate(timeout=cap)
        except subprocess.TimeoutExpired:
            proc.kill()
            out_s, err_s = proc.communicate()
            _CHILD = None
            _stop_poller()
            rep_wall = time.monotonic() - t_rep
            samples.append(
                {
                    "cores": m,
                    "rep": rep,
                    "rep_wall_sec": round(rep_wall, 1),
                    "aborted": f"wall_cap_{cap:.0f}s",
                    "corpus_hosts": corpus["hosts"],
                    **_bw_during_fields(),
                    "valid": False,
                }
            )
            # an abort is storm evidence: escalate the next gate wait, and
            # do NOT let the contaminated wall inflate the fit estimate
            consec_invalid[m] += 1
            return "crashed"
        _CHILD = None
        _stop_poller()
        rep_wall = time.monotonic() - t_rep
        post_rate, post_bw = settled_probe()
        line = out_s.strip().splitlines()[-1] if out_s.strip() else ""
        if not line.startswith("{"):
            print(f"scalerun {m} failed: {err_s[-500:]}", file=sys.stderr)
            samples.append(
                {
                    "cores": m,
                    "rep": rep,
                    "rep_wall_sec": round(rep_wall, 1),
                    "error": (err_s or "no output")[-200:],
                    "corpus_hosts": corpus["hosts"],
                    **_bw_during_fields(),
                    "valid": False,
                }
            )
            # like the wall-cap abort path: a crash is storm evidence too —
            # escalate the next gate wait at this level
            consec_invalid[m] += 1
            return "crashed"
        res = json.loads(line)
        r, p = res["round"], res.get("parse")
        rate_during = (r.get("steal_jiffies") or 0) / max(r["wall_sec"], 1.0)
        # the mid-run criterion applies only with ≥2 readings: a single
        # reading can be the rep's own writeback dip (self-noise), while a
        # median over ≥2 requires the contention to persist across polls
        bw_during_ok = (
            len(bw_during) < 2 or statistics.median(bw_during) >= bw_thresh
        )
        valid = (
            rate_during <= valid_steal
            and pre_bw >= bw_thresh
            and post_bw >= bw_thresh
            and bw_during_ok
        )
        r["_valid"] = valid
        # refine the fit estimate from VALID walls only: a storm-inflated
        # wall is not an estimate of quiet-weather cost, and letting it in
        # made fits() budget-skip reps that a cleared storm would have
        # afforded (observed: one 357 s storm rep inflated est to 410 and
        # skipped two high reps)
        if valid:
            est[m] = rep_wall * 1.15
        samples.append(
            {
                "cores": m,
                "rep": rep,
                "urls_per_sec": r["urls_per_sec"],
                "rep_wall_sec": round(rep_wall, 1),
                "steal_rate_during": round(rate_during, 2),
                "steal_rate_before": round(pre_rate, 2),
                "bw_before": round(pre_bw, 2),
                "bw_after": round(post_bw, 2),
                "steal_rate_after": round(post_rate, 2),
                "corpus_hosts": corpus["hosts"],
                **_bw_during_fields(),
                "valid": valid,
            }
        )
        runs[m].append(r)
        consec_invalid[m] = 0 if valid else consec_invalid[m] + 1
        if with_parse and valid:
            parse_probes[m] += 1
        if p and valid and (m not in ps or p["pages_per_sec"] > ps[m]["pages_per_sec"]):
            ps[m] = p
        update_scaling(partial=True)
        return "valid" if valid else "invalid"

    def median_run(rs: list) -> dict:
        # median over environment-valid samples; if contamination never
        # cleared, fall back to all samples (flagged, never silent)
        valid = [r for r in rs if r.get("_valid")]
        pool = valid or rs
        med = statistics.median(r["urls_per_sec"] for r in pool)
        # report the sample closest to the median (the median IS a
        # sample for odd rep counts)
        return min(pool, key=lambda r: abs(r["urls_per_sec"] - med)) | {
            "urls_per_sec_median": round(med, 1),
            "median_over_valid": len(pool),
            "fallback_all_samples": not valid,
        }

    # Weather-adaptive base order, pre-registered and outcome-independent
    # (it keys on the SAME host counters as the gate — steal rate + memcpy
    # probe — never on measured throughput):
    # * QUIET → H,L,H,H,L: the high level carries the noise (valid 8-core
    #   samples have been observed 48% apart) and its MEDIAN drives the
    #   efficiency — with only 2 samples statistics.median averages them, so
    #   landing all 3 high reps matters more than the second low rep. Highs
    #   are also 3× cheaper, so when the budget runs short the trailing LOW
    #   rep is the one skipped.
    # * STORM → L,H,H,H,L: the 2-core level uses 2 of 32 host cores and is
    #   nearly storm-immune (±7% across recorded samples), so its rep stays
    #   valid whatever the weather — run it FIRST so the one storm-robust
    #   sample exists before any budget burns on gate waits; the high reps
    #   then get the remaining budget (and the escalating gate waits) to
    #   outlast the storm.
    # Base schedule first, NO inline retries: under a sustained contention
    # storm (dress rehearsal 3: 25 straight minutes of 10-126 jiffies/s
    # steal) inline retries burned 800 s re-running one hopeless high rep
    # and the low level never ran at all — no efficiency number. Securing
    # one sample per level FIRST guarantees an efficiency record (flagged
    # all-invalid in the worst weather); the retry pass then backfills
    # validity from the bounded budgets. Retries depend only on validity
    # flags (host counters), never on measured values — no optional
    # stopping.
    def set_corpus(hosts: int) -> None:
        """Pick the scaling corpus (normally a cache hit — the main phase
        pre-seeded both templates) and reseed the per-rep wall estimates:
        linear in frontier size on top of the measured ~100/80 s fixed
        subprocess cost (8000 hosts ≙ the measured 500/180 s walls)."""
        corpus["hosts"] = hosts
        t_gen = time.monotonic()
        corpus["path"] = cached_corpus_path(
            None, hosts, MEGA_PPH, fanout=4, zipf_s=0.12,
            para_words=(60, 160), heavy_dom=SCALE_DOM,
        )
        OUT["scale_corpus_gen_sec"] = round(time.monotonic() - t_gen, 1)
        OUT["scale_corpus_hosts"] = hosts
        # linear in frontier size on top of the ~60-80 s fixed subprocess
        # cost, re-seeded for the streaming-parser engine at the 1→4 pair
        # (measured: 10,000 hosts ≙ ~410 s low / ~160 s high subprocess)
        frac = hosts / 10000.0
        est[SCALE_LOW] = 100.0 + 340.0 * frac
        est[SCALE_HIGH] = 80.0 + 95.0 * frac

    rate0, bw0 = env_probe()
    OUT["scaling_weather_at_start"] = {
        "steal_rate": round(rate0, 2),
        "bw_gbps": round(bw0, 2),
        "stormy": rate0 > quiet_thresh or bw0 < bw_thresh,
    }
    # Corpus decision. A 3 s point probe cannot predict the next 10 minutes
    # on this host (rehearsal: the probe read 0.67 jiffies/s and the first
    # rep then ran at during-run steal 20.5/s). Unless the probe already
    # reads stormy, the decision is made by a PATHFINDER rep: one cheap
    # storm-corpus high rep whose during-run validity measures the coming
    # window under exactly the pre-registered sample criteria.
    #   valid → quiet confirmed: the ratio runs on the full corpus; the
    #     pathfinder sample is set aside (different corpus — it must never
    #     mix into the ratio's medians, though it stays in the samples log).
    #   invalid (completed, environment criteria failed) → AMBIGUOUS: a
    #     single invalidated rep cannot distinguish a sustained storm from a
    #     transient confined to the pathfinder's own window. Two observed
    #     false-positive classes (both 2026-08-20, both followed by
    #     majority-valid windows on the fallback corpus): (a) mid-run
    #     bandwidth-only failure with clean steal + brackets — the kernel
    #     digesting the 32-core main phase's own page-cache exhaust
    #     (bw_during 1.56 GB/s vs brackets 4.43/4.78, steal 2.6/s, then
    #     FIVE straight valid reps), and (b) a steal burst confined to the
    #     pathfinder (5.11 jiffies/s during, then 5 of 6 following reps
    #     valid). ONE bounded retry — gated on a fresh point probe reading
    #     quiet AND the budget fitting another high rep — separates
    #     transient from sustained: a real storm fails the reprobe or
    #     invalidates the retry too. Conditions key on host counters only —
    #     never throughput. The reason (bw-only self-noise vs generic
    #     transient) is recorded in pathfinder_retry.reason.
    #   aborted / crashed, or the retry also invalid → storm mode on the
    #     small corpus, keeping the pathfinder(s) as high reps — cost never
    #     wasted.
    # A bounded writeback settle runs first (same self-noise mechanism,
    # addressed at the source): wait ≤60 s for Dirty+Writeback to drain
    # below 256 MB so the pathfinder doesn't measure our own exhaust.
    # (writeback_mb / bw_during_only_invalid are module-level, unit-tested.)
    set_corpus(SCALE_HOSTS_STORM)
    if OUT["scaling_weather_at_start"]["stormy"]:
        storm["on"] = True
    else:
        waited = 0.0
        mb = writeback_mb()
        while mb > 256.0 and waited < 60.0:
            time.sleep(5)
            waited += 5.0
            mb = writeback_mb()
        OUT["scale_settle"] = {"dirty_mb": round(mb, 1), "waited_sec": waited}
        pf = one_run(SCALE_HIGH, 0, allow_parse=False, pathfinder=True)
        if pf == "invalid" and fits(SCALE_HIGH):
            reason = (
                "bw_during_only_invalid"
                if bw_during_only_invalid(samples[-1], valid_steal, bw_thresh)
                else "transient_invalid"
            )
            rate1, bw1 = env_probe()
            if rate1 <= quiet_thresh and bw1 >= bw_thresh:
                OUT["pathfinder_retry"] = {
                    "reason": reason,
                    "reprobe": [round(rate1, 2), round(bw1, 2)],
                }
                pf = one_run(SCALE_HIGH, 1, allow_parse=False, pathfinder=True)
        if pf == "valid":
            OUT["pathfinder"] = samples[-1]
            # drop ALL storm-corpus pathfinder runs (1 or 2): corpora must
            # never mix into the full-corpus medians
            runs[SCALE_HIGH].clear()
            set_corpus(SCALE_HOSTS)
        else:
            storm["on"] = True
    # Base schedule L,H,H,H(,L), no inline retries: the expensive low rep
    # runs FIRST, inside the window the pathfinder just proved quiet (in
    # storm mode it is also the level least hurt by contention); the cheap,
    # abort-capped high reps follow — a storm breaking mid-high now costs
    # one bounded abort, where a storm breaking mid-low used to cost the
    # whole ratio. The trailing low rep is the first budget-skipped (the
    # low level is the stable one, ±2% across recorded valid samples).
    have_high = len(runs[SCALE_HIGH])
    schedule = [(SCALE_LOW, 0)] if reps_low > 0 else []
    schedule += [(SCALE_HIGH, j) for j in range(have_high, reps_high)]
    schedule += [(SCALE_LOW, i) for i in range(1, reps_low)]
    for m, rep in schedule:
        if runs[m] and not fits(m):
            skipped.append({"cores": m, "rep": rep, "reason": "budget"})
            continue  # budget exhausted; keep ≥1 attempted sample per level
        one_run(m, rep)
    # Retry pass — high level first (its median drives the efficiency and
    # valid 8-core samples have been observed 48% apart); the low level
    # retries only if it has NO valid sample (a contaminated low sample can
    # only bias efficiency UP, so discarding it is conservative and its
    # re-run must never crowd out a high rep).
    def n_valid(m: int) -> int:
        return sum(1 for r in runs[m] if r.get("_valid"))

    while n_valid(SCALE_HIGH) < reps_high and retries[SCALE_HIGH] > 0 and fits(SCALE_HIGH):
        retries[SCALE_HIGH] -= 1
        if one_run(SCALE_HIGH, len(runs[SCALE_HIGH])) == "skipped":
            break  # budget moved between checks — stop burning retries
    while n_valid(SCALE_LOW) == 0 and retries[SCALE_LOW] > 0 and fits(SCALE_LOW):
        retries[SCALE_LOW] -= 1
        if one_run(SCALE_LOW, len(runs[SCALE_LOW])) == "skipped":
            break
    update_scaling(partial=False)
    if "scaling" in OUT:
        OUT.pop("scaling_probe", None)  # superseded — same lists live inside


def main() -> None:
    # stage profile on every crawl round (driver-side perf_counter ticks at
    # existing barriers, zero extra jobs): mega_round and every scaling
    # sample then carry per-stage walls — the evidence for WHICH stage
    # scales and which carries the fixed driver cost
    os.environ.setdefault("NIMBUS_ROUND_TIMING", "1")
    spark = _session(f"local[{CPUS}]")
    try:
        run_main_phase(spark)
    except Exception as exc:  # record, then still attempt the scaling phase
        OUT["main_phase_error"] = f"{type(exc).__name__}: {exc}"[:300]
    finally:
        spark.stop()
    if SCALING:
        try:
            run_scaling_phase()
        except Exception as exc:
            OUT["scaling_phase_error"] = f"{type(exc).__name__}: {exc}"[:300]
    finalize()


if __name__ == "__main__":
    try:
        main()
    finally:
        finalize()
