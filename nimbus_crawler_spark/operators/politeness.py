"""Per-host politeness scheduling (SURVEY.md §2.6 O1/O2).

The reference enforces ≤1 request per ``crawl_delay_ms`` sliding window per
host via an atomic Redis ZSET script and blocking workers
(``/root/reference/internal/cache/ratelimiter.go:12-27,46-78``, invoked
crawler.go:172 with limit=1). The batch engine quantizes the same pacing into
logical rounds of ``round_ms``: each host owns a monotone politeness clock
``next_free_ms``; in round r (window ``[r·Q, (r+1)·Q)``) the host may fetch at
times ``t0, t0+delay, t0+2·delay, …`` where ``t0 = max(next_free_ms, r·Q)``.
That yields the closed-form per-round budget below, and the clock advances by
``k·delay`` for the ``k`` URLs actually taken — byte-for-byte the sliding
window's admission sequence, made deterministic.

Selection order inside a host is the frontier priority ``(depth, seq)``
(FIFO-as-BFS, SURVEY §3.4); unselected rows simply stay in the frontier —
the batch analog of the reference's blocked-worker re-wait.

Skew (north rule): one hot host ⇒ one hot window partition at 10^10 scale.
``politeness_select`` therefore ranks in two phases when ``salt_buckets > 1``:
a per-(host, salt) pre-rank bounds any single task's sort to ~budget rows per
salt, then the cheap final rank runs over ≤ salt·budget rows per host
(SURVEY §4.3.1). Budgets are per-round small (≤ Q/min_delay = 10 by default),
so the pre-rank prune is aggressive.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def host_budget(next_free_ms: int, delay_ms: int, round_idx: int, round_ms: int) -> tuple[int, int]:
    """Pure budget formula shared verbatim with the oracle simulator.

    Returns (budget, t0). next_free' = t0 + taken*delay_ms.
    """
    start = round_idx * round_ms
    end = start + round_ms
    t0 = max(next_free_ms, start)
    if t0 >= end:
        return 0, t0
    return 1 + (end - t0 - 1) // delay_ms, t0


def budget_cols(round_idx: int, round_ms: int) -> tuple[Column, Column]:
    """host_budget as JVM-side expressions over (next_free_ms, crawl_delay_ms)."""
    start = F.lit(round_idx * round_ms).cast("long")
    end = F.lit((round_idx + 1) * round_ms).cast("long")
    t0 = F.greatest(F.col("next_free_ms"), start)
    budget = F.when(t0 >= end, F.lit(0)).otherwise(
        (F.lit(1) + F.floor((end - t0 - F.lit(1)) / F.col("crawl_delay_ms"))).cast("int")
    )
    return budget, t0


def politeness_select(
    candidates: DataFrame,
    round_idx: int,
    round_ms: int,
    salt_buckets: int = 1,
    round_capacity: int | None = None,
    key_col: str = "host",
    try_fast_path: bool = False,
    materialize=None,
) -> DataFrame:
    """Token-bucket selection. Input needs columns
    (url, ``key_col``, depth, seq, next_free_ms, crawl_delay_ms); output adds
    ``host_rank`` and ``t0_ms`` and contains only the admitted rows
    (``host_rank`` is null on the fast path below — nothing downstream
    consumes it; the clock advance needs only ``t0_ms`` + the taken count).

    ``try_fast_path``: when budgets cannot bind — no host has more eligible
    rows than its budget, the common case for production round quanta where
    ``round_ms/delay`` ≫ per-host frontier — selection is the identity, so
    one cheap partial-agg check job replaces BOTH window ranks (two
    shuffles + sorts of the full candidate set). The check is exact
    (per-host count vs per-host budget), so the fast path can never admit
    a different set than the rank path; if any host binds, we fall through
    to the rank. Callers with small round quanta (budgets bind nearly every
    round) should leave it off — the check would just add a job.

    ``materialize``: optional callable applied to the RANK path's result
    (which shuffles — its consumers should read a barrier, not re-shuffle).
    The fast path returns a plain filter untouched: when the input is
    already cached, selection adds no extra barrier.
    """
    budget, t0 = budget_cols(round_idx, round_ms)
    df = candidates.withColumn("_budget", budget).withColumn("t0_ms", t0)

    if try_fast_path and round_capacity is None:
        # budget is constant within a host (it derives from next_free_ms /
        # crawl_delay_ms, both per-host), so min() is THE budget
        binding = (
            df.groupBy(key_col)
            .agg(F.count(F.lit(1)).alias("_n"), F.min("_budget").alias("_b"))
            .where(F.col("_n") > F.col("_b"))
            .limit(1)
            .count()
        )
        if binding == 0:
            return (
                df.where(F.col("_budget") > 0)
                .withColumn("host_rank", F.lit(None).cast("int"))
                .drop("_budget")
            )

    if salt_buckets > 1:
        # Phase 1: bound the per-task sort for Zipf-hot hosts. Each salt keeps
        # only its local top-budget rows — a superset of the final selection.
        salt = F.pmod(F.xxhash64(F.col("url")), F.lit(salt_buckets))
        w_salt = Window.partitionBy(F.col(key_col), salt).orderBy("depth", "seq")
        df = (
            df.withColumn("_salt_rank", F.row_number().over(w_salt))
            .where(F.col("_salt_rank") <= F.col("_budget"))
            .drop("_salt_rank")
        )

    w_host = Window.partitionBy(key_col).orderBy("depth", "seq")
    df = (
        df.withColumn("host_rank", F.row_number().over(w_host))
        .where(F.col("host_rank") <= F.col("_budget"))
        .drop("_budget")
    )

    if round_capacity is not None:
        # Global cap (O3). A full sort-limit is acceptable because politeness
        # already bounded rows to Σ budgets; at cluster scale this is a TakeOrdered.
        df = df.orderBy("depth", "seq").limit(round_capacity)
    return materialize(df) if materialize is not None else df


def advance_clock(selected: DataFrame, key_col: str = "host") -> DataFrame:
    """Per-politeness-key clock advance: next_free' = t0 + taken·delay."""
    return selected.groupBy(F.col(key_col).alias("pkey")).agg(
        (F.min("t0_ms") + F.count("*") * F.min("crawl_delay_ms")).alias("new_next_free_ms")
    )
