"""Corpus-estimated unigram language-model scoring — the CCNet-style
"perplexity proxy" quality signal (Wenzek et al. 2020: filter Common Crawl
by LM score; Gopher/LLaMA curation stacks run the same gate with a KenLM
model) and the DSIR-style importance weight (Xie et al. 2023: select
pretraining data by the log-ratio of a target-domain LM to the raw-corpus
LM). The sandbox has no KenLM, so the models here are the honest
first-order version a Spark pipeline can train IN the same job: unigram
LMs estimated from the corpora themselves, capped to a top-``V`` vocabulary
with all out-of-vocabulary tokens sharing the leftover probability mass —
the same vocab-cap shape a SentencePiece-vocab KenLM has. Swapping in a
real KenLM later only changes the broadcast log-prob table, not the plan.

Scale design (the reason the models are vocab-capped):
* per-doc term frequencies aggregate on the (doc_id, token) composite key —
  skew-proof (doc_id spreads every stopword) and map-side combinable;
* corpus counts aggregate ONE pre-combined row per (doc, token) and are
  materialized ONCE (three consumers — the top-V cut, total mass, kept
  mass — would otherwise each re-plan the tokenize+aggregate subtree);
  the top-``V`` cut is a distributed TakeOrdered (orderBy + limit) — never
  a full-vocabulary sort on one task;
* the resulting log-prob table is ≤ V rows (a few MB at V = 2^16), so it
  BROADCASTS into the scoring join — the 10^10-doc token stream never
  shuffles for the model lookup; the only full shuffle keyed by doc_id is
  the final per-document average, again map-side combinable.

An uncapped MLE model would make the lookup table |vocab|-sized (10^8-10^9
rows at web scale) and force the token stream through a sort-merge join —
the cap is what keeps the scoring pass broadcast-shaped, exactly like the
production KenLM gate (fixed model, streamed corpus).

Reference analog: none — the crawler stops at extracted text
(/root/reference/internal/parser/parser.go); this is the training-data
curation family layered on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nimbus_crawler_spark.operators.textdedup import _tokens


def _doc_term_freqs(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, token, tf) — whitespace tokens, lowercased; the shared
    pre-aggregation both the model estimate and the scoring pass consume.
    ``_spread`` parallelizes the tokenize+explode for small one-file scans
    (no-op at production file counts)."""
    from nimbus_crawler_spark.operators.textdedup import _spread

    return (
        _spread(docs).select(
            F.col(id_col).alias("doc_id"),
            F.explode(_tokens(F.col(text_col))).alias("token"),
        )
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def _unigram_model(
    docs: DataFrame, top_vocab: int, id_col: str, text_col: str, prefix: str
) -> tuple[DataFrame, DataFrame, Column]:
    """Estimate one vocab-capped unigram LM: returns (logp_table, totals,
    oov_logp) where logp_table is ≤ top_vocab rows of
    (token, <prefix>_logp), totals is ONE row of (<prefix>_n_total,
    <prefix>_n_kept) to crossJoin-broadcast into the scorer, and oov_logp is
    the column expression for the shared out-of-vocabulary mass (valid
    wherever totals' columns are in scope)."""
    tf = _doc_term_freqs(docs, id_col, text_col)
    # materialize the vocabulary ONCE: counts feeds three consumers (the
    # top-V cut, n_total, n_kept) and unpinned Catalyst would re-plan the
    # whole tokenize+aggregate subtree per consumer — 4-5 corpus passes
    # instead of the two a train-then-score pipeline needs (one to estimate
    # the model, one to score). The checkpoint is vocab-sized, distributed.
    counts = (
        tf.groupBy("token").agg(F.sum("tf").alias("cnt")).localCheckpoint(eager=True)
    )
    # distributed TakeOrdered: the vocabulary cut never sorts the full
    # vocab on one task
    kept = counts.orderBy(F.desc("cnt"), F.asc("token")).limit(top_vocab)
    nt, nk = f"{prefix}_n_total", f"{prefix}_n_kept"
    totals = counts.agg(F.sum("cnt").cast("double").alias(nt)).crossJoin(
        kept.agg(F.sum("cnt").cast("double").alias(nk))
    )
    logp = kept.crossJoin(F.broadcast(totals)).select(
        "token",
        F.log(F.col("cnt").cast("double") / F.col(nt)).alias(f"{prefix}_logp"),
    )
    oov_logp = F.log(F.greatest(F.col(nt) - F.col(nk), F.lit(1.0)) / F.col(nt))
    return logp, totals, oov_logp


def unigram_lm_score(
    docs: DataFrame,
    top_vocab: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document unigram-LM negative log-likelihood:
    (doc_id, n_tokens, avg_nll) — avg_nll is the mean over the document's
    tokens of -ln p(token), rounded to 6 dp (float summation order differs
    across engines; the rounded value is the deterministic result).
    exp(avg_nll) is the document's unigram perplexity; curation pipelines
    keep the low-perplexity head / drop the gibberish tail.

    Model: p(t) = count(t) / N for the ``top_vocab`` most frequent tokens
    (ties broken by token ascending — a deterministic vocabulary), and ALL
    other tokens share one OOV event with p = max(N - kept_mass, 1) / N.
    Documents with no tokens produce no row.
    """
    if top_vocab < 1:
        raise ValueError(f"top_vocab must be >= 1, got {top_vocab}")
    logp, totals, oov_logp = _unigram_model(docs, top_vocab, id_col, text_col, "m")
    tf = _doc_term_freqs(docs, id_col, text_col)
    return (
        tf.join(F.broadcast(logp), "token", "left")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.round(
                -F.sum(F.col("tf") * F.coalesce(F.col("m_logp"), oov_logp))
                / F.sum("tf"),
                6,
            ).alias("avg_nll"),
        )
    )


def importance_weights(
    docs: DataFrame,
    target: DataFrame,
    top_vocab: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR-style per-document importance weight:
    (doc_id, n_tokens, log_importance) with ``log_importance`` = the mean
    over the document's tokens of ln p_target(t) − ln p_source(t), rounded
    to 6 dp. Positive means the document looks more like the ``target``
    corpus (the curated domain you want more of) than like ``docs`` as a
    whole; importance RESAMPLING keeps documents with probability
    proportional to exp(log_importance · n_tokens) — the caller composes
    that with ``sampling.mixture_sample``-style hash thresholds.

    Both models are vocab-capped unigram LMs (see module docstring)
    estimated in-job — target from ``target``, source from ``docs`` — and
    broadcast into ONE scoring pass over the token stream: the corpus
    shuffles only for the per-document average. Tokens OOV in either model
    fall back to that model's shared leftover-mass probability
    independently.
    """
    if top_vocab < 1:
        raise ValueError(f"top_vocab must be >= 1, got {top_vocab}")
    t_logp, t_totals, t_oov = _unigram_model(target, top_vocab, id_col, text_col, "t")
    s_logp, s_totals, s_oov = _unigram_model(docs, top_vocab, id_col, text_col, "s")
    tf = _doc_term_freqs(docs, id_col, text_col)
    ratio = F.coalesce(F.col("t_logp"), t_oov) - F.coalesce(F.col("s_logp"), s_oov)
    return (
        tf.join(F.broadcast(t_logp), "token", "left")
        .join(F.broadcast(s_logp), "token", "left")
        .crossJoin(F.broadcast(t_totals))
        .crossJoin(F.broadcast(s_totals))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.round(F.sum(F.col("tf") * ratio) / F.sum("tf"), 6).alias(
                "log_importance"
            ),
        )
    )
