"""Multinomial Naive-Bayes text classifier as pure DataFrame algebra.

The quality-filter stage of public training-data pipelines (CCNet, GPT-3
as described, LLaMA) is a linear text classifier: score each document by
a sum of per-token weights learned from a labeled seed (e.g. "looks like
a reference corpus" vs "random web"). fastText is the usual tool; its
scoring core — bag-of-tokens dot a weight vector — is exactly a token
join + per-document sum, which Spark runs JVM-side at scan speed. This
module trains the closed-form member of that family (multinomial Naive
Bayes with Laplace smoothing — counting, so one aggregation pass) and
scores with the same join, making the whole train+score loop two shuffles
and zero Python.

Scale notes:

* Training is ONE ``groupBy(token)`` over the seed with map-side partial
  aggregation; class totals and priors ride along as a broadcast 1-row
  frame (``crossJoin(broadcast(...))`` — never a driver ``collect``).
* Scoring joins token *instances* against the weight table on the token
  key. Stopword keys are hot — the join is followed immediately by the
  per-document aggregate, so AQE's skew-join split applies; for a
  deployed filter the weight table (≤ vocabulary) is usually small
  enough to broadcast outright.
* All arithmetic is plain ``log``/``+`` column expressions inside
  whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _token_instances(df: DataFrame, id_cols: list[str], text_col: str):
    return df.select(
        *id_cols,
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("tok"),
    )


def nb_train(
    seed: DataFrame,
    label_col: str,
    text_col: str = "text",
    smoothing: float = 1.0,
) -> DataFrame:
    """Train NB log-odds token weights from a 0/1-labeled seed frame.

    Returns one row per token: ``(tok, weight)`` with

        weight = log (c_pos + a) / (tot_pos + a·V)
               - log (c_neg + a) / (tot_neg + a·V)

    (a = ``smoothing``, V = vocabulary size). A document's NB decision
    score is ``prior + Σ weight(tok)`` over its token instances — see
    :func:`nb_score`.
    """
    toks = _token_instances(seed, [label_col], text_col)
    is_pos = (F.col(label_col) == 1).cast("long")
    counts = toks.groupBy("tok").agg(
        F.sum(is_pos).alias("c_pos"),
        F.sum(1 - is_pos).alias("c_neg"),
    )
    totals = counts.agg(
        F.sum("c_pos").alias("tot_pos"),
        F.sum("c_neg").alias("tot_neg"),
        F.count("*").alias("vocab"),
    )
    a = F.lit(float(smoothing))
    return counts.crossJoin(F.broadcast(totals)).select(
        "tok",
        (
            F.log((F.col("c_pos") + a) / (F.col("tot_pos") + a * F.col("vocab")))
            - F.log((F.col("c_neg") + a) / (F.col("tot_neg") + a * F.col("vocab")))
        ).alias("weight"),
    )


def nb_prior(seed: DataFrame, label_col: str) -> DataFrame:
    """1-row frame ``(prior)`` = log P(pos)/P(neg) over the seed docs."""
    is_pos = (F.col(label_col) == 1).cast("long")
    return seed.agg(
        F.log(F.sum(is_pos) / F.sum(1 - is_pos)).alias("prior")
    )


def nb_score(
    docs: DataFrame,
    weights: DataFrame,
    prior: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents under a trained NB model.

    Output per document: ``(id, n_scored, score)`` where ``n_scored``
    counts the token instances that appeared in the training vocabulary
    (out-of-vocabulary tokens contribute nothing — the standard NB
    convention) and ``score`` is the log-odds decision value
    (> 0 ⇒ positive class).
    """
    toks = _token_instances(docs, [id_col], text_col)
    scored = (
        toks.join(weights, "tok")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_scored"),
            F.sum("weight").alias("_w"),
        )
    )
    keyed = docs.select(id_col).join(scored, id_col, "left")
    return keyed.crossJoin(F.broadcast(prior)).select(
        id_col,
        F.coalesce(F.col("n_scored"), F.lit(0)).alias("n_scored"),
        (F.coalesce(F.col("_w"), F.lit(0.0)) + F.col("prior")).alias("score"),
    )


def nb_train_score(
    docs: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    smoothing: float = 1.0,
) -> DataFrame:
    """Self-train convenience: fit on ``docs`` (which carries its own
    heuristic 0/1 ``label_col``) and score the same frame — the shape of
    a bootstrap quality filter (seed labels from cheap heuristics, NB
    generalizes them to a per-token model)."""
    w = nb_train(docs, label_col, text_col, smoothing)
    p = nb_prior(docs, label_col)
    return nb_score(docs, w, p, id_col, text_col)
