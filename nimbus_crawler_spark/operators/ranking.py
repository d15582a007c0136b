"""Distributed global row numbering (no single-partition window).

``Window.orderBy(keys)`` with no partitionBy funnels every row through ONE
task — fine at 10^5 rows, a serial-stage scale-killer at 10^8 (the exact
shape a politeness-unbounded mega round produces). ``global_row_number``
computes the same total-order ordinal in three fully-parallel steps:

1. ``repartitionByRange(n, keys)`` — range exchange puts partition i's keys
   entirely before partition i+1's (equal keys co-located, so the result is
   boundary-placement-independent as long as the order keys are unique);
2. per-partition ``row_number`` windows (parallel, one group per range);
3. per-partition row counts → cumulative offsets (a window over ≤n tiny
   rows) broadcast-joined back.

The range exchange is sampled deterministically by Spark's RangePartitioner,
and the ordinal itself is invariant to where the boundaries land, so the
output is bit-stable across cluster sizes — required for engine ≡ oracle
crawl_seq equality (SURVEY §3.4 O1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_running_sum(
    df: DataFrame,
    order_cols: list[str | Column],
    value: Column,
    out_col: str,
    num_partitions: int = 32,
) -> DataFrame:
    """Add ``out_col`` = EXCLUSIVE global prefix sum of ``value`` by the
    ``order_cols`` total order (the first row gets 0; order keys must be
    unique tuples).

    Same three-step distributed shape as ``global_row_number`` (which is
    the ``value = 1`` special case): range exchange, per-range local
    prefix-sum windows in parallel, per-range totals → cumulative offsets
    (a window over ≤num_partitions tiny rows) broadcast-joined back."""
    part = df.repartitionByRange(num_partitions, *order_cols).withColumn(
        "_gpid", F.spark_partition_id()
    )
    # INVARIANT: `ranked` and `offsets` below both contain the range
    # exchange; their _gpid values agree because Spark executes the exchange
    # ONCE and reuses it (ReusedExchange — the two subtrees are canonically
    # identical). With exchange reuse disabled the exchange would run twice
    # and RangePartitioner's rdd-id-seeded sampling could place boundaries
    # differently per run, silently corrupting the ordinals — so in that
    # configuration we pin the partitioning by materializing it first.
    if df.sparkSession.conf.get("spark.sql.exchange.reuse", "true").lower() != "true":
        part = part.localCheckpoint(eager=True)
    w_local = (
        Window.partitionBy("_gpid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = part.withColumn(
        "_glcs", F.coalesce(F.sum(value).over(w_local), F.lit(0)).cast("long")
    )
    # tiny side-plan: one row per non-empty range partition; the range
    # exchange is reused (ReusedExchange) so the base is not recomputed
    w_cum = Window.orderBy("_gpid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        part.groupBy("_gpid")
        .agg(F.sum(value).alias("_gn"))
        .withColumn("_goff", F.coalesce(F.sum("_gn").over(w_cum), F.lit(0)).cast("long"))
        .select("_gpid", "_goff")
    )
    return (
        ranked.join(F.broadcast(offsets), "_gpid")
        .withColumn(out_col, (F.col("_goff") + F.col("_glcs")).cast("long"))
        .drop("_gpid", "_glcs", "_goff")
    )


def global_row_number(
    df: DataFrame,
    order_cols: list[str | Column],
    out_col: str,
    num_partitions: int = 32,
    start: int = 0,
) -> DataFrame:
    """Add ``out_col`` = 0-based global row number by ``order_cols`` + start.

    Order keys must be a total order (unique tuples) — true for crawl
    (depth, seq) by the disjoint-stride construction (parser.go:196-208).
    The exclusive prefix COUNT of rows before a row IS its 0-based ordinal,
    so this is ``global_running_sum`` of a literal 1.
    """
    with_sum = global_running_sum(df, order_cols, F.lit(1), out_col, num_partitions)
    if start:
        with_sum = with_sum.withColumn(out_col, (F.col(out_col) + F.lit(start)).cast("long"))
    return with_sum
