"""Capture .explain('formatted') for the engine's key plans and assert the
physical properties we rely on at scale:

- pages scan is column-pruned (ReadSchema ⊆ url,html,lang) for the fetch join
- domains join is a BroadcastHashJoin
- the seen anti-join is present (or replaced by the Bloom cogroup path)
- whole-stage codegen spans cover the non-UDF pipeline

Usage: python tools/explain_plans.py [out_md]
"""

from __future__ import annotations

import contextlib
import io
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/nimbus_plans.md"

    from pyspark.sql import functions as F

    from nimbus_crawler_spark.config import CrawlConfig
    from nimbus_crawler_spark.plans.crawl import seed
    from nimbus_crawler_spark.session import build_session
    from nimbus_crawler_spark.sources.corpus import corpus_to_pages_df, make_corpus
    from nimbus_crawler_spark.store import SnapshotStore

    spark = build_session(master="local[8]", shuffle_partitions=8)
    corpus = make_corpus(seed=9, n_hosts=4, pages_per_host=8)
    pages_dir = tempfile.mkdtemp(prefix="nimbus-plans-pages-")
    corpus_to_pages_df(spark, corpus).write.mode("overwrite").parquet(pages_dir)
    pages = spark.read.parquet(pages_dir)

    cfg = CrawlConfig()
    wh = tempfile.mkdtemp(prefix="nimbus-plans-wh-")
    store = SnapshotStore(spark, wh)
    seed(spark, store, corpus.seeds_text, cfg)

    sections: list[tuple[str, str, list[str]]] = []

    # 1. fetch join: pages ⋈ broadcast(selected) — the round-2 shape: page
    # payloads never shuffle (selected broadcast into the scan), and the
    # pages scan is column-pruned to (url, html, lang)
    state = store.read("url_state")
    eligible = state.where(
        (F.col("status").isin("pending", "crawling")) & (F.col("next_round") <= 0)
    )
    fetch = (
        pages.select("url", "html", "lang")
        .join(F.broadcast(eligible), "url")
        .where(F.col("html").isNotNull() & (F.coalesce(F.col("lang"), F.lit("")) != "binary"))
    )
    sections.append(
        (
            "fetch join (J4): pages ⋈ broadcast(selected) — html never shuffles",
            explain_str(fetch),
            [
                "ReadSchema: struct<url:string,html:binary,lang:string>",
                "BroadcastHashJoin",
            ],
        )
    )

    # 2. domains broadcast join (J2)
    from nimbus_crawler_spark.functions.udfs import crawl_delay_udf

    domains = pages.where(F.col("url").endswith("/robots.txt")).select(
        F.col("url").alias("pkey"), F.col("html").cast("string").alias("robots_body")
    ).withColumn("crawl_delay_ms", crawl_delay_udf("robots_body"))
    cand = eligible.withColumn("pkey", F.col("host")).join(
        F.broadcast(domains), "pkey", "left"
    )
    sections.append(("domains broadcast join (J2)", explain_str(cand), ["BroadcastHashJoin"]))

    # 3. seen anti-join (J1 exact path)
    links = pages.select(F.explode(F.split(F.col("url"), "/")).alias("url"))
    anti = links.join(state.select("url"), "url", "left_anti")
    sections.append(("seen anti-join (J1)", explain_str(anti), ["LeftAnti"]))

    # 4. politeness window rank (O2)
    from nimbus_crawler_spark.operators.politeness import politeness_select

    pol = politeness_select(
        eligible.withColumn("pkey", F.col("host"))
        .withColumn("next_free_ms", F.lit(0).cast("long"))
        .withColumn("crawl_delay_ms", F.lit(200)),
        round_idx=0,
        round_ms=1000,
        salt_buckets=4,
        key_col="pkey",
    )
    sections.append(("politeness two-phase rank (O2)", explain_str(pol), ["Window"]))

    # 5. ngram Jaccard candidate generation: the doc-frequency COUNT gate
    # (constant-memory partial agg) must sit upstream of the semi-join that
    # feeds the only collect_set — a stop-word shingle then never
    # materializes an O(n) doc array in an aggregation buffer (round-4 fix)
    from nimbus_crawler_spark.operators.textdedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [(i, f"tok{i} alpha beta gamma delta eps zeta eta theta") for i in range(50)],
        "doc_id long, text string",
    )
    ngp = ngram_jaccard_pairs(docs, threshold=0.3, shingle_n=3, max_doc_freq=5)
    sections.append(
        (
            "ngram Jaccard: DF count-gate + semi-join before collect_set",
            explain_str(ngp),
            ["LeftSemi", "count(1)", "collect_set"],
        )
    )

    # 6. decontaminate: the eval-suite n-gram set must BROADCAST into the
    # training-corpus shingle stream — the train side never shuffles for the
    # join; the only exchange is the per-doc hit-count aggregation
    from nimbus_crawler_spark.operators.textdedup import decontaminate

    dec = decontaminate(
        docs.where(F.col("doc_id") % 5 != 0), docs.where(F.col("doc_id") % 5 == 0)
    )
    sections.append(
        (
            "decontaminate: eval n-gram set broadcast into train shingles",
            explain_str(dec),
            ["BroadcastHashJoin", "HashAggregate"],
        )
    )

    # 7. robots gate-once barrier (round-5 restructure, plans/round.py): the
    # verdict is ONE boolean column from ONE ArrowEvalPython pass over the
    # eligible⋈broadcast(domains) join, and robots_body is projected away
    # before the checkpoint — downstream consumers (politeness check, fetch
    # broadcast, denied branch) read the slim cache, so the ~KB-per-row
    # bodies cross the Arrow boundary exactly once per round
    from nimbus_crawler_spark.functions.udfs import robots_allowed_udf

    # in the real round, domains is read back from the store's parquet (or a
    # checkpoint) — materialize here so the build side's crawl_delay UDF does
    # not appear as a second Arrow node in the captured plan
    gated = (
        eligible.withColumn("pkey", F.col("host"))
        .join(F.broadcast(domains.localCheckpoint(eager=True)), "pkey")
        .withColumn("_allowed", robots_allowed_udf("robots_body", "url"))
        .drop("robots_body")
    )
    gated_text = explain_str(gated)
    # formatted explain names each node twice (tree + detail) — count tree rows
    one_arrow = gated_text.count("- ArrowEvalPython (") == 1
    sections.append(
        (
            "robots gate-once: one ArrowEvalPython, bodies dropped pre-barrier",
            gated_text,
            ["ArrowEvalPython", "BroadcastHashJoin"],
        )
    )
    print(f"[{'OK' if one_arrow else 'MISSING'}] gate-once: exactly one "
          "ArrowEvalPython node")

    ok = True
    lines = ["# Physical plans (captured by tools/explain_plans.py)\n"]
    for title, text, must_contain in sections:
        lines.append(f"\n## {title}\n\n```\n{text}\n```\n")
        for needle in must_contain:
            found = needle in text
            ok &= found
            status = "OK" if found else "MISSING"
            lines.append(f"- `{needle}`: **{status}**\n")
            print(f"[{status}] {title}: {needle}")

    Path(out_path).write_text("".join(lines))
    print(f"wrote {out_path}")
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
