"""Cluster entry point: the driver program ``spark-submit --py-files``
launches (north rule's deployment form; ``tools/submit_crawl.py`` is the
submitable shim, ``tools/make_pyfiles_zip.py`` prints the artifact path).

Reference analog: ``cmd/seeder`` + ``cmd/crawler`` + ``cmd/parser``
(/root/reference/cmd) collapsed into one batch-iterative driver — seed
round, then rounds to frontier exhaustion, resumable from the latest
committed round marker.

Master resolution respects the launcher: under ``spark-submit --master``
the submit configuration wins (we only pass a master when the user gave
``--master`` explicitly or nothing was configured at all), so the same
script runs unchanged on ``local[N]``, standalone, YARN, or k8s — the
multi-executor form the scaling criterion targets.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="nimbus-crawler-spark",
        description="Batch-iterative URL-frontier crawl over a pages table.",
    )
    p.add_argument("--pages", required=True,
                   help="parquet dir of the pages table (url, warc_ts, html, text, lang)")
    p.add_argument("--warehouse", required=True,
                   help="snapshot-store warehouse dir (created if missing)")
    g = p.add_mutually_exclusive_group()
    g.add_argument("--seeds-file", help="seed list, one URL per line (# comments ok)")
    g.add_argument("--seed-urls", help="comma-separated seed URLs")
    p.add_argument("--resume", action="store_true",
                   help="continue from the latest committed round of an existing warehouse")
    p.add_argument("--max-rounds", type=int, default=200)
    p.add_argument("--max-depth", type=int, default=None)
    p.add_argument("--round-capacity", type=int, default=None)
    p.add_argument("--politeness-key", choices=["hostname", "registrable_domain"], default=None)
    p.add_argument("--master", default=None,
                   help="override the Spark master (otherwise spark-submit's --master, "
                        "then $SPARK_GRAFT_MASTER, then local[$SPARK_GRAFT_CPUS])")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    args = p.parse_args(argv)

    if not args.resume and not (args.seeds_file or args.seed_urls):
        p.error("--seeds-file or --seed-urls is required unless --resume")

    from pyspark import SparkConf

    from nimbus_crawler_spark.session import build_session

    # spark-submit materializes --master as spark.master in the system
    # properties before this script runs; honor it unless the user overrode
    submit_master = SparkConf().get("spark.master", None)
    master = args.master or submit_master  # build_session falls back to env
    sp = args.shuffle_partitions or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(
        app_name="nimbus-crawler-spark", master=master, shuffle_partitions=sp
    )

    from nimbus_crawler_spark.config import CrawlConfig
    from nimbus_crawler_spark.plans.crawl import crawl

    cfg_kwargs = {}
    for k in ("max_depth", "round_capacity", "politeness_key"):
        v = getattr(args, k)
        if v is not None:
            cfg_kwargs[k] = v
    cfg = CrawlConfig(**cfg_kwargs)

    seeds_text = None
    if args.seeds_file:
        with open(args.seeds_file, encoding="utf-8") as fh:
            seeds_text = fh.read()
    elif args.seed_urls:
        seeds_text = "\n".join(s for s in args.seed_urls.split(",") if s.strip())

    pages = spark.read.parquet(args.pages)
    summary = crawl(
        spark, args.warehouse, pages, seeds_text, cfg,
        max_rounds=args.max_rounds, resume=args.resume,
    )
    print(json.dumps({
        "rounds_run": summary.rounds_run,
        "fetched_total": summary.fetched_total,
        "warehouse": args.warehouse,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
