"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline; the bucketed variant is
the scale path (search only within a deterministic sign-pattern bucket —
an LSH-family partition that turns the O(n·q) cross join into per-bucket
joins). Dot products stay JVM-side via ``aggregate``/``zip_with`` higher-order
functions — no Python, no UDF, whole-stage codegen throughout.

At 100 TB scale: queries are broadcast (q ≪ n); the corpus side streams
through the join without a shuffle; the per-query top-k window is bounded by
the broadcast row count. The bucketed variant adds one shuffle on the bucket
key and prunes the candidate set by ~2^bits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query: (query_id, neighbor_id, rank, score).

    Self-matches are excluded. Scores rounded to 6 decimals for stable
    cross-engine comparison; ties broken by neighbor id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score", F.round(cosine(F.col("_qv"), F.col("_cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def sign_bucket(vec: Column, bits: int = 8) -> Column:
    """Deterministic LSH-style bucket: sign pattern of the first ``bits``
    components packed into an integer (component i ≥ 0 ⇒ bit i set)."""
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out + F.when(F.element_at(vec, i + 1) >= 0, F.lit(2 ** i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out


def cosine_topk_bucketed(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    bits: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign bucket.

    Recall is traded for a ~2^bits candidate prune; exactness within the
    bucket is preserved, so results are deterministic and oracle-checkable.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        sign_bucket(F.col(vec_col), bits).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        sign_bucket(F.col(vec_col), bits).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score", F.round(cosine(F.col("_qv"), F.col("_cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def norm_stats_by_label(
    embeddings: DataFrame, vec_col: str = "embedding", label_col: str = "label"
) -> DataFrame:
    """Per-label embedding statistics: (label, n, avg_norm, min_norm, max_norm)."""
    withn = embeddings.withColumn("_norm", F.round(_norm(F.col(vec_col)), 6))
    return (
        withn.groupBy(label_col)
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("_norm"), 4).alias("avg_norm"),
            F.round(F.min("_norm"), 4).alias("min_norm"),
            F.round(F.max("_norm"), 4).alias("max_norm"),
        )
    )
