"""DSIR-style importance resampling — data selection for language models.

Published method (Xie et al. 2023, "Data Selection for Language Models
via Importance Resampling"): estimate a cheap feature-space language
model on a small TARGET corpus (the distribution you want more of) and
on the RAW corpus, weight every raw document by the likelihood ratio

    log w(x) = log p_target(x) - log p_raw(x)
             = Σ over tokens t of (log p_t(t) - log p_r(t))

and sample without replacement proportional to w.  Documents that look
like the target are upweighted; generic/noisy documents are downweighted
— the principled version of "filter toward Wikipedia-like text" that a
plain perplexity threshold (`operators/text.py::perplexity_score`)
approximates one-sidedly.

Engine shape (everything composes from existing pieces):
  - both LMs are `fit_unigram_lm` tables (hashed-ngram features in the
    paper degrade gracefully to unigrams; the relation stays
    vocabulary-sized either way);
  - the two vocabularies are FULL-OUTER merged into one (token,
    logp_t, logp_r) relation so scoring needs ONE broadcast join, not
    two — the corpus side never shuffles for it;
  - the weighted draw is `operators/sampling.weighted_sample_log`
    (A-ES in log space — importance ratios overflow a double as plain
    weights long before they overflow as logs; TakeOrderedAndProject,
    no global sort).

At 100 TB: one explode + broadcast join + per-doc aggregation over the
raw corpus (map-side partial, one shuffle keyed by doc id), then the
no-shuffle top-k.  The target corpus is small by construction (it is
the thing you curated by hand).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geoscan_fraud_spark.operators.sampling import weighted_sample_log
from geoscan_fraud_spark.operators.text import fit_unigram_lm


def merge_lms(
    target_lm: DataFrame,
    target_oov: float,
    raw_lm: DataFrame,
    raw_oov: float,
) -> DataFrame:
    """(token, logp_t, logp_r): full-outer merge of two unigram LM
    relations; a token absent from either vocabulary carries that side's
    OOV mass. Vocabulary-sized — broadcast-joinable at scoring time."""
    # full outer cannot broadcast (both sides must produce unmatched
    # rows) — this one SortMergeJoin is vocabulary-sized and never sees
    # the corpus; the corpus-side scoring join broadcasts its output
    t = target_lm.select("t", F.col("logp").alias("logp_t"))
    r = raw_lm.select("t", F.col("logp").alias("logp_r"))
    return t.join(r, "t", "full_outer").select(
        "t",
        F.coalesce(F.col("logp_t"), F.lit(float(target_oov))).alias("logp_t"),
        F.coalesce(F.col("logp_r"), F.lit(float(raw_oov))).alias("logp_r"),
    )


def importance_weights(
    df: DataFrame,
    target_lm: DataFrame,
    target_oov: float,
    raw_lm: DataFrame,
    raw_oov: float,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_tokens, log_weight): per-document log importance ratio
    Σ_t (log p_target(t) - log p_raw(t)).

    Tokens whitespace-split, empties dropped (the `fit_unigram_lm`
    convention). A token in NEITHER vocabulary contributes
    ``target_oov - raw_oov`` (both sides coalesce to their OOV mass).
    Empty documents score log_weight 0 (an empty product — neutral
    weight, kept samplable). Plan: explode -> ONE broadcast join against
    the merged vocabulary -> groupBy(id) with map-side partial
    aggregation; the corpus never shuffles for the join."""
    lm = merge_lms(target_lm, target_oov, raw_lm, raw_oov)
    tok = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), r"\s+")).alias("t")
    ).filter(F.col("t") != "")
    scored = tok.join(F.broadcast(lm), "t", "left_outer").select(
        id_col,
        F.coalesce(F.col("logp_t"), F.lit(float(target_oov))).alias("lt"),
        F.coalesce(F.col("logp_r"), F.lit(float(raw_oov))).alias("lr"),
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.col("lt") - F.col("lr")).alias("__lw"),
    )
    return df.select(id_col).join(agg, id_col, "left_outer").select(
        id_col,
        F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
        F.round(F.coalesce(F.col("__lw"), F.lit(0.0)), 6).alias("log_weight"),
    )


def dsir_sample(
    df: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    seed: int = 42,
    length_normalize: bool = False,
) -> DataFrame:
    """Select ``k`` documents from ``df`` by importance resampling toward
    ``target``'s token distribution. Returns the selected rows of ``df``
    plus their ``log_weight`` audit column.

    Fits both unigram LMs here (two eager aggregations — the amortizable
    one-off; pre-fit with `fit_unigram_lm` + `importance_weights` +
    `weighted_sample_log` to reuse models across draws). The draw is
    seeded and deterministic.

    ``length_normalize=True`` divides the log-ratio by the token count
    (geometric-mean ratio): raw DSIR weights compound per token, so long
    documents dominate both tails — normalization makes the weight a
    per-token affinity, the practical choice when document lengths vary
    by orders of magnitude."""
    t_lm, t_oov = fit_unigram_lm(target, text_col, alpha)
    r_lm, r_oov = fit_unigram_lm(df, text_col, alpha)
    w = importance_weights(df, t_lm, t_oov, r_lm, r_oov, text_col, id_col)
    if length_normalize:
        w = w.withColumn(
            "log_weight",
            F.when(F.col("n_tokens") > 0, F.col("log_weight") / F.col("n_tokens"))
            .otherwise(F.lit(0.0)),
        )
    picked = weighted_sample_log(
        w.select(id_col, "log_weight"), "log_weight", k, id_col, seed
    )
    return df.join(picked, id_col)
