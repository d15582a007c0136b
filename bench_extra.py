"""Per-query isolation harness for the optimization rounds (guide §1.4).

``bench.py`` is FROZEN for measurement; this file holds the builder-side
instrumentation: it times individual ``__spark_entry__.queries()`` entries
with bench.py's exact ``_force`` methodology (count + xxhash64 over every
output column — no column pruning, no driver data movement), labels jobs,
and can dump ``.explain('formatted')`` to ``plans/r06/``.

Usage:
    python bench_extra.py [--reps N] [--plans TAG] [query ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
Prints one line per query: name, per-rep seconds, min.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _force(df) -> int:
    from pyspark.sql import functions as F

    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(*df.columns)).alias("h"),
    ).collect()[0]
    return row["n"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", help="query names (default: all)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None, metavar="TAG",
                    help="dump explain('formatted') to plans/r06/<q>_<TAG>.txt")
    ap.add_argument("--no-time", action="store_true", help="plans only")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from nimbus_crawler_spark.session import build_session

    spark = build_session(app_name="nimbus-bench-extra", master=f"local[{CPUS}]",
                          shuffle_partitions=32)
    qs = entrymod.queries()
    names = args.queries or [n for n in qs]

    # bench.py's warmup: JIT, codegen caches, Python workers, parquet footers
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.limit(256).selectExpr("md5(text)").count()
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(256).count()

    out = {}
    for name in names:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        if args.plans:
            os.makedirs("plans/r06", exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                qs[name](spark, SF_DIR).explain("formatted")
            with open(f"plans/r06/{name}_{args.plans}.txt", "w") as f:
                f.write(buf.getvalue())
        if args.no_time:
            continue
        secs = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}#{rep}")
            t0 = time.perf_counter()
            n = _force(qs[name](spark, SF_DIR))
            secs.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = {"rows": n, "secs": secs, "min": min(secs)}
        print(f"{name:28s} rows={n:<8d} secs={secs} min={min(secs)}", flush=True)
    print(json.dumps({"sf": SF_DIR, "cpus": CPUS, "queries": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
