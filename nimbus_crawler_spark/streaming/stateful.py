"""Custom stateful streaming operator: per-host politeness admission.

The batch engine's politeness gate (operators/politeness.py, O2/F6) admits a
bounded number of fetches per host per round. This is the same semantic as a
*streaming* operator over a live page/frontier stream: per host, admit at
most ``budget`` rows cumulatively across all micro-batches, carrying the
admitted count in keyed state — the reference analog is the Redis-stream
consumer taking a bounded batch per host while the stream keeps flowing
(consumer.go prefetch + crawler.go:120 per-host pacing).

Built on ``applyInPandasWithState`` (SURVEY.md §2.9's "custom stateful
operator" mapping): keyed GroupState holds one integer per host, rows cross
as Arrow batches (no per-row Python), and the operator composes with any
file/Kafka source and ``availableNow`` incremental-batch triggers.

At scale: state is one long per distinct host (millions of hosts ⇒ MBs per
state-store partition), shuffled once on the group key — the same shuffle
key the batch politeness rank uses.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ADMIT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("admit_seq", T.IntegerType(), False),
    ]
)

_STATE_SCHEMA = T.StructType([T.StructField("admitted", T.IntegerType(), False)])


def politeness_admit_stream(pages_stream: DataFrame, budget_per_host: int = 5) -> DataFrame:
    """Admit ≤ ``budget_per_host`` rows per host across the stream's lifetime.

    Rows within a micro-batch are ordered deterministically (warc_ts, url)
    before admission; ``admit_seq`` is the host's cumulative admission
    ordinal (0-based, dense). Rows beyond the budget are dropped — the lossy
    XAdd-MaxLen analog of the batch engine's O4 trim, keyed per host.
    """

    def admit(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        count = state.get[0] if state.exists else 0
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["warc_ts", "url"], kind="mergesort")
        take = max(0, budget_per_host - count)
        adm = batch.head(take)
        out = pd.DataFrame(
            {
                "host": host,
                "url": adm["url"],
                "warc_ts": adm["warc_ts"],
                "admit_seq": range(count, count + len(adm)),
            }
        )
        state.update((count + len(adm),))
        yield out

    from ..functions.udfs import hostname_udf

    keyed = (
        pages_stream.withColumn("host", hostname_udf("url"))
        .where(F.col("host").isNotNull())
        .select("host", "url", "warc_ts")
    )
    return keyed.groupBy("host").applyInPandasWithState(
        admit,
        outputStructType=ADMIT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def admit_available_now(
    spark,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    budget_per_host: int = 5,
    max_files_per_trigger: int | None = 1,
) -> None:
    """Drain the input directory through the stateful admission operator as an
    incremental batch (availableNow); ``max_files_per_trigger=1`` forces one
    micro-batch per file so keyed state demonstrably carries across batches."""
    from .ingest import read_pages_stream

    stream = read_pages_stream(spark, input_dir, max_files_per_trigger)
    q = (
        politeness_admit_stream(stream, budget_per_host)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
