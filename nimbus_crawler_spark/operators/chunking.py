"""Fixed-token-window document chunking — the max-sequence-length splitter
every pretraining / embedding pipeline runs between curation and
tokenization (reference analog: none — the crawler stops at whole
documents, storage/minio.go blobs are opaque; this is part of the
training-data operator family layered on top).

Pure JVM expressions end to end: whitespace tokenization, a ``sequence``
of window starts, ``explode``, ``slice``, ``array_join`` — no Python, no
shuffle. Each document fans out to ``ceil(n_tokens / stride)`` rows on its
own scan partition, so at 100 TB the cost is the bounded output-size
multiplication (``chunk_tokens / stride`` token-duplication factor when
windows overlap), never data movement: the plan is Scan → Project →
Generate → Project, whole-stage-codegen throughout, and downstream
repartitioning is the consumer's choice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nimbus_crawler_spark.operators.ranking import global_running_sum


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    stride: int = 96,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into token windows of ``chunk_tokens`` whitespace
    tokens, starting every ``stride`` tokens.

    ``stride < chunk_tokens`` gives overlapping windows (the usual
    embedding-pipeline shape, so no boundary context is lost);
    ``stride == chunk_tokens`` partitions the token stream exactly;
    ``stride > chunk_tokens`` subsamples it. Window starts are
    ``0, stride, 2·stride, …`` while ``start < n_tokens``, so the final
    window may be short (``n_chunk_tokens < chunk_tokens``) and a document
    shorter than ``chunk_tokens`` yields exactly one window. Documents with
    no tokens yield no rows.

    Returns ``(doc_id, chunk_idx, start_token, n_chunk_tokens,
    chunk_text)`` with ``chunk_idx = start_token / stride`` — deterministic
    and rerun-stable, no window functions, no ordering dependence.
    """
    if chunk_tokens < 1 or stride < 1:
        raise ValueError(f"chunk_tokens and stride must be >= 1, got {chunk_tokens}, {stride}")
    toks = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != "")
    base = (
        docs.select(
            F.col(id_col).alias("doc_id"), toks.alias("_t"), F.size(toks).alias("_n")
        )
        .where(F.col("_n") > 0)
        .select(
            "doc_id",
            "_t",
            F.explode(F.sequence(F.lit(0), F.col("_n") - 1, F.lit(stride))).alias("_s"),
        )
    )
    window = F.slice(F.col("_t"), F.col("_s") + 1, chunk_tokens)
    return base.select(
        "doc_id",
        (F.col("_s") / stride).cast("int").alias("chunk_idx"),
        F.col("_s").cast("int").alias("start_token"),
        F.size(window).cast("int").alias("n_chunk_tokens"),
        F.array_join(window, " ").alias("chunk_text"),
    )


def pack_sequences(
    chunks: DataFrame,
    seq_len: int = 1024,
    order_cols: tuple[str, ...] = ("doc_id", "chunk_idx"),
    token_col: str = "n_chunk_tokens",
) -> DataFrame:
    """Concatenate-and-cut sequence packing (GPT-style pretraining batches):
    lay every chunk's tokens end to end in ``order_cols`` order and cut the
    stream every ``seq_len`` tokens; each chunk learns which training
    sequence its first token lands in and at what offset.

    ``token_offset`` is the chunk's exclusive global prefix sum of
    ``token_col`` — computed by the same three-step distributed shape that
    gives the crawl its bit-stable ``crawl_seq`` (literal-bounds buckets →
    per-bucket prefix windows → broadcast offsets; ``global_running_sum``),
    so NO single-partition window exists at any corpus size and the
    assignment is bit-stable across cluster sizes. ``order_cols`` must be
    unique tuples (true for (doc_id, chunk_idx) by construction).

    Returns the chunk rows plus ``token_offset``, ``seq_id``
    (= token_offset // seq_len) and ``offset_in_seq`` (= token_offset %
    seq_len). A chunk may straddle a cut — exactly as concat-and-cut
    training pipelines do; consumers that forbid straddling filter on
    ``offset_in_seq + n_chunk_tokens <= seq_len``.
    """
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    with_offset = global_running_sum(
        chunks, list(order_cols), F.col(token_col), "token_offset"
    )
    return with_offset.select(
        *chunks.columns,
        "token_offset",
        (F.col("token_offset") / seq_len).cast("long").alias("seq_id"),
        (F.col("token_offset") % seq_len).cast("long").alias("offset_in_seq"),
    )
