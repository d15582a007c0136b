"""SparkSession factory with the engine's required configuration."""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def package_zip_path() -> str:
    """Build (idempotently) and return the ``--py-files`` zip of this
    package — the artifact ``spark-submit --py-files <zip>`` ships to a real
    cluster's executors (north rule's deployment form; ``tools/
    submit_crawl.py`` is the matching driver script).

    The zip is content-addressed (deterministic timestamps, hash in the
    filename) and kept on disk: executors fetch py-files lazily, so the
    source file must outlive this function, and distinct contents must never
    collide under one name within a context."""
    import hashlib

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    entries = []
    for root, _dirs, files in os.walk(pkg_dir):
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(root, f)
                rel = os.path.join("nimbus_crawler_spark", os.path.relpath(full, pkg_dir))
                entries.append((rel, full))
    entries.sort()
    digest = hashlib.sha256()
    for rel, full in entries:
        digest.update(rel.encode())
        with open(full, "rb") as fh:
            digest.update(fh.read())
    h = digest.hexdigest()[:16]

    zdir = os.path.join(tempfile.gettempdir(), "nimbus-pyfiles")
    os.makedirs(zdir, exist_ok=True)
    zpath = os.path.join(zdir, f"nimbus_crawler_spark-{h}.zip")
    if not os.path.exists(zpath):
        tmp_path = zpath + ".tmp"
        with zipfile.ZipFile(tmp_path, "w") as zf:
            for rel, full in entries:
                with open(full, "rb") as fh:
                    info = zipfile.ZipInfo(rel, date_time=(2026, 1, 1, 0, 0, 0))
                    zf.writestr(info, fh.read())
        os.replace(tmp_path, zpath)
    return zpath


def _ship_package(spark: SparkSession) -> None:
    """Ship this package to executors (the in-session analog of
    ``spark-submit --py-files``). Without it, Python workers spawned from a
    different cwd cannot unpickle our pandas UDFs."""
    zpath = package_zip_path()
    sc = spark.sparkContext
    if getattr(sc, "_nimbus_shipped", None) == zpath:
        return
    sc.addPyFile(zpath)
    sc._nimbus_shipped = zpath


def build_session(
    app_name: str = "nimbus-crawler-spark",
    master: str | None = None,
    shuffle_partitions: int = 32,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """local[N] session tuned like the multi-executor deployment would be.

    AQE on (skew-join splitting / partition coalescing), Arrow on (every
    Python kernel runs as a vectorized pandas UDF per the input_hint's
    no-per-row-Python rule), small broadcast threshold left at default so the
    `domains` broadcast join (SURVEY §2.4 J2) is chosen by size, not forced.
    """
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    # shuffle/spill on tmpfs when available: local-mode shuffle files on a
    # throttled virtio disk serialize high-parallelism stages (on a real
    # cluster this is the executors' local NVMe)
    local_dir = os.environ.get("SPARK_LOCAL_DIRS")
    if not local_dir and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/nimbus-spark-local"
        os.makedirs(local_dir, exist_ok=True)
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "snappy")
    )
    if local_dir:
        b = b.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    _ship_package(spark)
    return spark
