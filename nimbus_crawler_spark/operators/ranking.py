"""Distributed global row numbering (no single-partition window).

``Window.orderBy(keys)`` with no partitionBy funnels every row through ONE
task — fine at 10^5 rows, a serial-stage scale-killer at 10^8 (the exact
shape a politeness-unbounded mega round produces). ``global_row_number``
computes the same total-order ordinal in three fully-parallel steps:

1. assign each row a bucket id ``_gpid`` = the number of pre-computed range
   bounds ≤ its key — a PURE EXPRESSION of the row's own order key, so
   every branch of the plan that evaluates it agrees by construction;
2. per-bucket ``row_number`` windows (parallel, one group per bucket);
3. per-bucket row counts → cumulative offsets (a window over ≤n tiny rows)
   broadcast-joined back.

The bounds are sampled once at plan-build time (two driver jobs over the
column-pruned key projection: a count and a seeded sample) and embedded in
the plan as literals. Correctness is invariant to WHERE the bounds land —
a row's ordinal is (#rows in lower buckets) + (#rows before it in its own
bucket) = #rows before it globally, for ANY monotone bucketing — so the
output is bit-stable across cluster sizes and reruns; bounds quality only
affects load balance. This deliberately does NOT use
``repartitionByRange`` + ``spark_partition_id()``: that shape forks the
range exchange into two subtrees which Catalyst prunes differently, the
canonical plans stop matching, ReusedExchange does not fire, and the two
independently-sampled RangePartitioners place boundaries differently —
silently corrupting ordinals once partitions outgrow the sample (verified
at 2M rows: 1.97M wrong ordinals). Required for engine ≡ oracle crawl_seq
equality (SURVEY §3.4 O1).

Order keys must be unique, non-null tuples of orderable scalar types
whose Python sort order matches Spark's ascending order (ints/floats,
UTF-8 strings, dates/timestamps — true for every engine call site).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Sampled keys per requested bucket. 100 gives the same boundary quality as
# Spark's own RangePartitioner default (samplePointsPerPartitionHint=20,
# 3x oversampled) while keeping the collected sample tiny (p * 100 rows).
_SAMPLE_PER_BUCKET = 100


def _range_bounds(
    df: DataFrame, cols: list[Column], num_partitions: int, approx_count: int | None = None
) -> tuple[list[tuple], list]:
    """Sample ``num_partitions - 1`` ascending range bounds for the key
    tuple ``cols`` (two driver jobs over the column-pruned key projection —
    one when ``approx_count`` spares the count job).
    Returns ``(bounds, key_datatypes)``; bounds may be shorter than p-1
    (deduplicated) or empty (small/empty input → one bucket, still correct).

    ``approx_count``: optional row-count estimate (any order-of-magnitude
    upper bound works — callers pass e.g. the frontier size). Bounds affect
    ONLY load balance, never correctness (see module docstring), so an
    over-estimate merely under-samples; the count job is pure overhead when
    the caller already tracks a size.
    """
    keys = df.select(*[c.alias(f"_k{i}") for i, c in enumerate(cols)])
    dtypes = [f.dataType for f in keys.schema.fields]
    if num_partitions <= 1:
        return [], dtypes
    n = approx_count if approx_count is not None else keys.count()
    if n == 0:
        return [], dtypes
    target = num_partitions * _SAMPLE_PER_BUCKET
    if n > target:
        # seeded Bernoulli sample; 1.05x so short draws still cover p buckets
        keys = keys.sample(fraction=min(1.0, 1.05 * target / n), seed=0x5EED)
    rows = sorted(tuple(r) for r in keys.collect())
    if not rows:
        return [], dtypes
    step = len(rows) / num_partitions
    bounds: list[tuple] = []
    for i in range(1, num_partitions):
        b = rows[min(int(i * step), len(rows) - 1)]
        if not bounds or b > bounds[-1]:
            bounds.append(b)
    return bounds, dtypes


def global_running_sum(
    df: DataFrame,
    order_cols: list[str | Column],
    value: Column,
    out_col: str,
    num_partitions: int = 32,
    approx_count: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = EXCLUSIVE global prefix sum of ``value`` by the
    ``order_cols`` total order (the first row gets 0; order keys must be
    unique non-null tuples).

    Three-step distributed shape (``global_row_number`` is the ``value=1``
    special case): literal-bounds bucket assignment, per-bucket local
    prefix-sum windows in parallel, per-bucket totals → cumulative offsets
    (a window over ≤num_partitions tiny rows) broadcast-joined back.
    ONE full-row shuffle (the window's hash exchange on ``_gpid``); the
    offsets branch re-scans only the pruned (key, value) columns."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    bounds, dtypes = _range_bounds(df, cols, num_partitions, approx_count)
    key = F.struct(*[c.alias(f"_k{i}") for i, c in enumerate(cols)])
    if bounds:
        # literal bound structs, cast field-wise to the exact key dtypes so
        # the struct comparison resolves without implicit coercion surprises.
        # A plain sum of comparisons, not a higher-order-function lambda —
        # lambdas capturing outer attributes break Catalyst when the
        # expression is duplicated into the offsets branch. O(p) comparisons
        # per row; p is the shuffle-partition count (tens to hundreds).
        lits = [
            F.struct(
                *[F.lit(v).cast(dt).alias(f"_k{i}") for i, (v, dt) in enumerate(zip(b, dtypes))]
            )
            for b in bounds
        ]
        gpid = sum(((b <= key).cast("int") for b in lits), start=F.lit(0))
    else:
        # constant 0 via a non-foldable expression: a bare lit(0) would be
        # constant-folded out of the local window's partition spec, turning
        # it into an unpartitioned window (WARN + single-task semantics the
        # small-input case tolerates but should not advertise)
        gpid = F.pmod(F.xxhash64(cols[0]), F.lit(1)).cast("int")
    part = df.withColumn("_gpid", gpid)
    w_local = (
        Window.partitionBy("_gpid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = part.withColumn(
        "_glcs", F.coalesce(F.sum(value).over(w_local), F.lit(0)).cast("long")
    )
    # tiny side-plan: one row per non-empty bucket. _gpid is the same literal
    # expression in both branches, so the branches agree even though this one
    # re-executes the (column-pruned) scan independently.
    # constant-0 partition key (pmod of a non-null column — a bare lit(0)
    # gets constant-folded out of the window spec): identical
    # single-partition semantics over the ≤num_partitions offset rows,
    # without WindowExec's unpartitioned-window WARN (which reads like a
    # scale bug in the driver's captured stdout)
    w_cum = (
        Window.partitionBy(F.pmod(F.col("_gpid"), F.lit(1)))  # constant 0, non-foldable
        .orderBy("_gpid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
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
    approx_count: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = 0-based global row number by ``order_cols`` + start.

    Order keys must be a total order (unique tuples) — true for crawl
    (depth, seq) by the disjoint-stride construction (parser.go:196-208).
    The exclusive prefix COUNT of rows before a row IS its 0-based ordinal,
    so this is ``global_running_sum`` of a literal 1.
    """
    with_sum = global_running_sum(df, order_cols, F.lit(1), out_col, num_partitions, approx_count)
    if start:
        with_sum = with_sum.withColumn(out_col, (F.col(out_col) + F.lit(start)).cast("long"))
    return with_sum
