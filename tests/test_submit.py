"""The north rule's deployment form, end to end: a REAL ``spark-submit
--py-files <zip>`` subprocess running tools/submit_crawl.py from a foreign
cwd — the package must reach the driver and its Python workers through the
zip alone (no repo on PYTHONPATH, no cwd fallback)."""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _spark_submit() -> str:
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def test_spark_submit_pyfiles_crawl(spark, tmp_path):
    from nimbus_crawler_spark.session import package_zip_path
    from nimbus_crawler_spark.sources.corpus import corpus_to_pages_df, make_corpus

    corpus = make_corpus(seed=11, n_hosts=2, pages_per_host=4)
    pages_dir = str(tmp_path / "pages")
    corpus_to_pages_df(spark, corpus).write.parquet(pages_dir)
    seeds = tmp_path / "seeds.txt"
    seeds.write_text(corpus.seeds_text)
    wh = str(tmp_path / "wh")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the ONLY package source
    env["PYSPARK_PYTHON"] = env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            _spark_submit(),
            "--master", "local[2]",
            "--py-files", package_zip_path(),
            str(REPO / "tools" / "submit_crawl.py"),
            "--pages", pages_dir,
            "--seeds-file", str(seeds),
            "--warehouse", wh,
            "--max-depth", "1",
            "--max-rounds", "12",
            "--shuffle-partitions", "4",
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # NOT the repo: imports must resolve via the zip
        env=env,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    rec = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rec["fetched_total"] > 0
    assert rec["rounds_run"] >= 1

    # the submitted driver really committed: the warehouse is readable by a
    # fresh store and the seeds were fetched
    from pyspark.sql import functions as F

    from nimbus_crawler_spark.store import SnapshotStore

    store = SnapshotStore(spark, wh)
    statuses = {
        r["status"]: r["n"]
        for r in store.read("url_state")
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert "parsed" in statuses
