"""N-gram language-model quality scoring — the perplexity-proxy gate.

CCNet (Wenzek et al., LREC 2020) ranks web documents by the perplexity
of a KenLM 5-gram model trained on a clean reference corpus; RefinedWeb,
RedPajama and Dolma keep the same gate. This module is the distributed,
oracle-checkable analog: a word-BIGRAM model with add-alpha smoothing,
trained and scored entirely in Catalyst — deterministic, engine-portable
(no binary KenLM artifact), and exact enough to separate fluent text
from token soup, which is all the gate needs.

Model: P(w2|w1) = (c(w1 w2) + alpha) / (c(w1) + alpha * V)
where V = distinct unigram types in the baseline. A document's score is
the mean negative log2-probability of its bigrams (avg_nll — low =
baseline-like, high = out-of-domain/garbage); 2**avg_nll would be the
per-token perplexity.

Scale shape:
* ``train_bigram_lm``: ONE scan of the baseline emits unigrams and
  bigrams from the same tokenization (one explode of tagged structs),
  one hash aggregation with map-side combine — the shuffle carries
  (gram, partial count), bounded by gram-type cardinality per partition,
  never raw text. The model frame is data-bounded (distinct grams).
* ``lm_quality_scores``: the corpus explodes to bigram rows joined
  against the model. When the model fits the broadcast threshold
  (typical: a curated baseline), both lookups are broadcast hash joins
  and the corpus never shuffles before its per-document aggregation;
  otherwise AQE falls back to a gram-keyed shuffle — the honest cost of
  per-token scoring, identical in shape to token_distribution_drift.
* Token identity travels as the token STRING (the model frame is
  vocab-bounded); hashing grams to 8-byte ints is the 100 TB knob and
  changes nothing structurally.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "tokens_expr",
    "train_bigram_lm",
    "lm_quality_scores",
    "lm_quality_census",
]


def tokens_expr(text_col: Column | str) -> Column:
    """Lowercased whitespace tokens with empties dropped — the shared
    tokenization of both training and scoring (they MUST match, or every
    surface-form mismatch scores as an unseen gram)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != "")


def _tagged_grams(toks: Column) -> Column:
    """array<struct<w1,w2>> of the row's unigrams (w2 NULL) and bigrams —
    one structure so a single explode feeds both count families."""
    uni = F.transform(toks, lambda w: F.struct(w.alias("w1"), F.lit(None).cast("string").alias("w2")))
    bi = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.slice(toks, 1, F.size(toks) - 1),
            lambda w, i: F.struct(
                w.alias("w1"), F.element_at(toks, i + 2).alias("w2")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return F.concat(uni, bi)


def train_bigram_lm(
    baseline: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """(w1, w2, cnt) gram counts from the baseline corpus — w2 NULL rows
    are unigram counts, others bigram counts. ONE scan, one map-side-
    combined aggregation; the shuffle carries gram tuples only."""
    toks = baseline.select(tokens_expr(text_col).alias("_t"))
    grams = toks.select(
        F.explode_outer(_tagged_grams(F.col("_t"))).alias("g")
    ).filter(F.col("g").isNotNull())
    return grams.groupBy(
        F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def lm_quality_scores(
    corpus: DataFrame,
    model: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    broadcast_model: bool = True,
) -> DataFrame:
    """(id, n_bigrams, avg_nll) per corpus document.

    ``avg_nll`` = mean over the document's bigrams of
    −log2 P(w2|w1) under the add-alpha model; NULL for documents with
    fewer than 2 tokens (no bigram to score). Deterministic: every term
    is a closed-form function of exact counts.
    """
    uni = model.filter(F.col("w2").isNull()).select(
        F.col("w1").alias("_u_w1"), F.col("cnt").alias("_c_uni")
    )
    bi = model.filter(F.col("w2").isNotNull()).select(
        F.col("w1").alias("_b_w1"),
        F.col("w2").alias("_b_w2"),
        F.col("cnt").alias("_c_bi"),
    )
    if broadcast_model:
        uni, bi = F.broadcast(uni), F.broadcast(bi)
    # V rides the score expression as a 1-row cross-joined literal frame
    # (computed once, broadcast), not a driver-side collect
    v = model.filter(F.col("w2").isNull()).agg(
        F.count(F.lit(1)).cast("double").alias("_V")
    )

    toks = corpus.select(
        F.col(f"`{id_col}`").alias("_id"), tokens_expr(text_col).alias("_t")
    )
    pairs = toks.select(
        "_id",
        F.explode_outer(
            F.when(
                F.size("_t") >= 2,
                F.transform(
                    F.slice("_t", 1, F.size("_t") - 1),
                    lambda w, i: F.struct(
                        w.alias("w1"), F.element_at(F.col("_t"), i + 2).alias("w2")
                    ),
                ),
            )
        ).alias("g"),
    )
    # explode_outer keeps short docs as a NULL-gram row so they surface
    # with n_bigrams = 0 instead of vanishing from the report
    scored = (
        pairs.join(
            bi,
            (F.col("g.w1") == F.col("_b_w1")) & (F.col("g.w2") == F.col("_b_w2")),
            "left",
        )
        .join(uni, F.col("g.w1") == F.col("_u_w1"), "left")
        .crossJoin(F.broadcast(v))
        .select(
            "_id",
            F.when(
                F.col("g").isNotNull(),
                -F.log2(
                    (F.coalesce(F.col("_c_bi"), F.lit(0)).cast("double") + F.lit(alpha))
                    / (
                        F.coalesce(F.col("_c_uni"), F.lit(0)).cast("double")
                        + F.lit(alpha) * F.col("_V")
                    )
                ),
            ).alias("_nll"),
        )
    )
    return scored.groupBy(F.col("_id").alias(id_col)).agg(
        F.count("_nll").cast("bigint").alias("n_bigrams"),
        F.round(F.avg("_nll"), 6).alias("avg_nll"),
    )


def lm_quality_census(
    corpus: DataFrame,
    baseline: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    alpha: float = 0.5,
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-group fluency census: train on ``baseline``, score ``corpus``,
    aggregate per ``group_col`` — (group, n_docs, avg_doc_nll,
    min_doc_nll, max_doc_nll). The triage view: a group whose avg_nll
    sits far above the rest is out-of-domain or garbage relative to the
    reference corpus."""
    model = train_bigram_lm(baseline, text_col=text_col)
    scores = lm_quality_scores(
        corpus,
        model,
        text_col=text_col,
        id_col=id_col,
        alpha=alpha,
        broadcast_model=broadcast_model,
    )
    labeled = scores.join(
        corpus.select(F.col(f"`{id_col}`").alias(id_col), F.col(group_col)),
        id_col,
    )
    return labeled.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(F.avg("avg_nll"), 6).alias("avg_doc_nll"),
        F.round(F.min("avg_nll"), 6).alias("min_doc_nll"),
        F.round(F.max("avg_nll"), 6).alias("max_doc_nll"),
    )
