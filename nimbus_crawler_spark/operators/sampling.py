"""Training-data mixture construction: deterministic weighted sampling and
per-stratum quality budgets.

Real LLM corpora are MIXTURES — each source (Common-Crawl snapshot, code,
books, wiki) enters the training set at a tuned rate (C4/Pile/LLaMA-style
mixture weights), and per-source budgets keep one giant source from
swamping the rest. Both operators here are the scale-correct shapes:

* ``mixture_sample`` is pure per-row codegen — a hash-threshold predicate
  with NO shuffle, NO rand(): at 100 TB it fuses into the scan projection,
  is reproducible run-to-run (resumable pipelines re-derive the identical
  sample), and composes with partition pruning. ``rand(seed)`` is
  partition-layout-dependent in Spark (seed is per-partition), so a
  repartitioned rerun would sample DIFFERENT rows — the md5 keyed on the
  row identity is layout-independent.
* ``stratified_topk`` spends a per-source budget on the BEST documents
  (quality-score ranked) instead of a uniform coin flip. Selection is the
  shared rank-filtered window (similarity.topk_per_group), whose map-side
  ``WindowGroupLimit`` prunes every input partition to its per-source top-k
  BEFORE the single exchange — no task ever buffers a whole source (10^9+
  docs for a crawl snapshot), and only ≤ partitions·k rows per source are
  shuffled at all.

The crawl-side analog is the reference's frontier prioritisation
(/root/reference/internal/frontier/frontier.go): both decide "which rows
deserve the budget" with a deterministic, restart-stable rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nimbus_crawler_spark.operators.ranking import global_row_number
from nimbus_crawler_spark.operators.similarity import topk_per_group
from nimbus_crawler_spark.operators.textstats import (
    _quality_feature_cols,
    quality_score_col,
)


def sample_key_col(id_col: Column, salt: str) -> Column:
    """First 8 hex chars of md5("<salt>:<id>") — a uniform draw in [0, 2^32)
    encoded as fixed-width lowercase hex, so a plain STRING comparison
    against a fixed-width hex threshold is the numeric comparison (both
    Spark and DuckDB emit lowercase hex md5; proven portable by the
    fingerprint gates)."""
    return F.substring(F.md5(F.concat_ws(":", F.lit(salt), id_col.cast("string"))), 1, 8)


def weight_threshold_hex(rate: float) -> str:
    """Fixed-width hex threshold for a keep-rate in [0, 1): floor(rate·2^32)
    as 8 lowercase hex chars. Rates ≥ 1.0 must be handled as keep-all by the
    caller (2^32 needs 9 chars and breaks the fixed-width comparison)."""
    if not 0.0 <= rate < 1.0:
        raise ValueError(f"rate must be in [0,1): {rate}")
    return format(int(rate * 2**32), "08x")


def mixture_sample(
    docs: DataFrame,
    weights: dict[str, float],
    default_weight: float = 0.0,
    id_col: str = "doc_id",
    source_col: str = "source",
    salt: str = "mix",
) -> DataFrame:
    """Deterministic weighted mixture sampling: keep each document of source
    ``s`` with probability ``weights.get(s, default_weight)``, decided by a
    salted content-independent hash of its id — (doc_id, source, sample_key).

    The weight map is tiny (one entry per corpus source), so it compiles to
    a chained CASE inside whole-stage codegen — no join, no shuffle, no
    driver round-trip. Changing ``salt`` redraws the sample; keeping it
    fixed makes the sample stable across reruns, executors, AND partition
    layouts (unlike ``df.sample``/``rand(seed)``, whose draws depend on the
    partition index). A rate ≥ 1.0 keeps the whole source.
    """
    key = sample_key_col(F.col(id_col), salt)
    keep: Column = (
        F.lit(True) if default_weight >= 1.0
        else key < F.lit(weight_threshold_hex(default_weight))
    )
    for src, rate in sorted(weights.items()):
        cond = F.lit(True) if rate >= 1.0 else key < F.lit(weight_threshold_hex(rate))
        keep = F.when(F.col(source_col) == src, cond).otherwise(keep)
    return docs.select(
        id_col, source_col, key.alias("sample_key")
    ).where(keep)


def hash_split(
    docs: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: every document gets exactly
    one named split by where its salted id-hash falls between cumulative
    fraction thresholds — (doc_id, split, sample_key).

    ``fractions`` is an ordered name→fraction map that must sum to 1.0;
    thresholds are the cumulative sums rendered as fixed-width hex
    (``weight_threshold_hex``), and the LAST split takes everything at or
    above its lower bound, so float dust can never leave a row unassigned.
    Like ``mixture_sample`` this is a chained CASE over a content-independent
    md5 key: pure per-row codegen, NO shuffle, NO rand() — the assignment is
    stable across reruns, executors, partition layouts, and cluster sizes,
    which is what makes a 100 TB split reproducible and lets train/val/test
    be materialized in separate passes (or separate jobs) that can never
    disagree. Changing ``salt`` redraws the partition.
    """
    items = list(fractions.items())
    if len(items) < 2:
        raise ValueError(f"need >= 2 splits, got {len(items)}")
    if any(f <= 0.0 for _, f in items):
        raise ValueError(f"fractions must be positive: {fractions}")
    total = sum(f for _, f in items)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    key = sample_key_col(F.col(id_col), salt)
    split: Column = F.lit(items[-1][0])
    cum = 0.0
    bounds = []
    for name, frac in items[:-1]:
        cum += frac
        bounds.append((name, weight_threshold_hex(min(cum, 1.0 - 2**-33))))
    for name, hex_bound in reversed(bounds):
        split = F.when(key < F.lit(hex_bound), F.lit(name)).otherwise(split)
    return docs.select(id_col, split.alias("split"), key.alias("sample_key"))


def stratified_topk(
    docs: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source quality budget: the k highest-quality documents of every
    source — (doc_id, source, quality_score, rank).

    Scoring is the shared composite quality score (one scan projection, pure
    codegen); selection is the rank-filtered window whose map-side
    WindowGroupLimit bounds every task at ≤ partitions·k rows per source —
    see ``topk_per_group``. Ties break on ``id_col`` ascending:
    deterministic, oracle-exact.
    """
    scored = docs.select(
        id_col,
        source_col,
        quality_score_col(_quality_feature_cols(F.col(text_col))).alias("quality_score"),
    )
    return topk_per_group(
        scored, source_col, [F.desc("quality_score"), F.asc(id_col)], k
    ).select(id_col, source_col, "quality_score", "rank")


def epoch_shuffle(
    docs: DataFrame,
    epoch: int,
    id_col: str = "doc_id",
    num_partitions: int = 32,
) -> DataFrame:
    """Deterministic global training-order shuffle for one epoch: every row
    gets ``shuffle_key = md5("epoch<n>:<id>")`` and ``epoch_pos`` = its
    0-based rank in the total order (shuffle_key, id).

    The step between packing and the data loader: each epoch must visit the
    corpus in a different-but-reproducible random order. ``ORDER BY rand()``
    is neither (partition-layout-dependent and unstable across reruns); a
    salted content-independent hash is both — epoch ``n`` is one salt, and
    a resumed/re-run job re-derives the identical order on any cluster
    size. The rank comes from ``global_row_number`` (the literal-bounds
    prefix-sum shape, one full-row shuffle, NO single-partition window), so
    the position column — what a loader needs to seek/shard the epoch — is
    bit-stable across partition layouts too. The full 128-bit key avoids
    birthday collisions at corpus scale and ``id_col`` tie-breaks make the
    order total even under a collision.
    """
    key = F.md5(
        F.concat_ws(":", F.lit(f"epoch{epoch}"), F.col(id_col).cast("string"))
    )
    keyed = docs.withColumn("shuffle_key", key)
    return global_row_number(
        keyed, ["shuffle_key", id_col], "epoch_pos", num_partitions
    )
