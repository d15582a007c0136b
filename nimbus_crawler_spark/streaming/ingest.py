"""Structured-Streaming ingestion for the closed-world pages table.

The crawl itself is deliberately batch-iterative (north rule); streaming's
role in this engine is *ingestion*: new page captures (e.g. fresh WARC
conversions) land as parquet files and flow into the corpus between crawl
rounds. ``readStream`` file source → watermarked per-host tumbling-window
arrival stats → ``foreachBatch`` append. Watermarks bound state for late
captures; ``Trigger.AvailableNow`` lets the same pipeline run as an
incremental batch job — which is exactly how a round-based crawler consumes
it (reference analog: the seeder/crawler processes feeding streams
continuously, cmd/seeder + queue/streams.go, re-expressed as bounded
micro-batches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import PAGES_SCHEMA


def read_pages_stream(spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    reader = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("pathGlobFilter", "*.parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(input_dir)


def arrival_stats(pages_stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Per-host tumbling-window arrival counts with late-data watermark."""
    from ..functions.udfs import hostname_udf

    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .withColumn("host", hostname_udf("url"))
        .groupBy(F.window("warc_ts", window).alias("win"), "host")
        .agg(
            F.count("*").alias("n_pages"),
            F.sum(F.length("html")).alias("bytes"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "host",
            "n_pages",
            "bytes",
        )
    )


def ingest_available_now(
    spark: SparkSession,
    input_dir: str,
    pages_out_dir: str,
    stats_out_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> None:
    """Drain everything currently available, then stop (incremental batch).

    foreachBatch appends the raw pages to the corpus directory and the
    windowed stats to a side table; the streaming checkpoint makes re-runs
    exactly-once per input file.
    """
    stream = read_pages_stream(spark, input_dir)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(pages_out_dir)

    q1 = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", f"{checkpoint_dir}/pages")
        .trigger(availableNow=True)
        .start()
    )
    q2 = (
        arrival_stats(stream, window=window, watermark=watermark)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", stats_out_dir)
        .option("checkpointLocation", f"{checkpoint_dir}/stats")
        .trigger(availableNow=True)
        .start()
    )
    q1.awaitTermination()
    q2.awaitTermination()
