"""Vocabulary-health census: Zipf conformance + lexical-diversity stats.

A natural-language corpus has a signature the per-document quality
screens can't check: its RANK-FREQUENCY curve. Healthy text follows
Zipf's law — log(freq) ≈ intercept + slope·log(rank) with slope ≈ −1
(Zipf 1949; public corpus-analysis staple). Machine-generated spam,
templated boilerplate, and over-deduplicated corpora bend the curve:
a too-shallow slope means suspiciously uniform vocabulary use, a
too-steep one means a few tokens dominating (template artifacts).
Alongside the fit, two classic diversity ratios: type/token ratio
(vocab / token occurrences) and hapax fraction (share of the vocab
seen exactly once — collapsing hapaxes are an over-dedup or
template-flood symptom).

100 TB shape: ONE corpus scan — explode to (group, token) with
map-side partial aggregation, so the exchange carries distinct-token
partials, never occurrences. Ranking and the least-squares fold then
run over the (groups × vocab) count frame: a per-group window for
rank (one exchange on group), a groupBy(group) closed-form regression
over the top-``fit_top_n`` ranks (ln-ln sums — no iterative fitting,
no driver math, merge-order-independent doubles summed per group).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens_expr, word_ngrams_expr

__all__ = ["zipf_census", "ngram_diversity_census"]


def zipf_census(
    df: DataFrame,
    *,
    text_col: str = "text",
    group_col: str = "source",
    fit_top_n: int = 1000,
    lowercase: bool = True,
) -> DataFrame:
    """Per-group vocabulary census → (group, n_tokens, vocab_size,
    hapax_frac, type_token_ratio, chao1_vocab, zipf_slope, zipf_r2).

    ``chao1_vocab`` is the Chao1 lower-bound estimate of the TRUE
    vocabulary size including unseen types (Chao 1984, the classic
    unseen-species estimator): D + f1·(f1−1)/(2·(f2+1)) with f1/f2 the
    singleton/doubleton counts (bias-corrected form, defined even at
    f2 = 0). chao1_vocab ≫ vocab_size means the corpus slice has not
    begun to saturate its vocabulary — sampling more of it buys
    genuinely new text, the data-acquisition question behind every
    "do we need another crawl of this source" decision.

    The Zipf fit is ordinary least squares of ln(freq) on ln(rank)
    over the ``fit_top_n`` most frequent tokens (rank ties break by
    token ascending, so the fit is deterministic); the tail is
    excluded because finite-sample counts flatten it below any
    corpus-health signal. ``zipf_slope``/``zipf_r2`` are NULL for
    groups with fewer than 2 ranked tokens or a degenerate variance
    (all counts equal ⇒ r2 undefined). Empty-string tokens are
    excluded; NULL texts contribute nothing.
    """
    if fit_top_n < 2:
        raise ValueError(f"fit_top_n must be >= 2, got {fit_top_n}")
    toks = tokens_expr(text_col)
    if lowercase:
        toks = F.transform(toks, lambda t: F.lower(t))
    counts = (
        df.select(
            F.col(f"`{group_col}`").alias("group"),
            F.explode_outer(toks).alias("token"),
        )
        .filter(F.col("token").isNotNull() & (F.col("token") != F.lit("")))
        .groupBy("group", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("group").orderBy(F.desc("n"), F.asc("token"))
    ranked = counts.select(
        "group",
        "n",
        F.row_number().over(w).alias("rank"),
    )
    x = F.log(F.col("rank").cast("double"))
    y = F.log(F.col("n").cast("double"))
    in_fit = F.col("rank") <= F.lit(fit_top_n)
    agg = ranked.groupBy("group").agg(
        F.sum("n").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab_size"),
        F.round(
            F.count_if(F.col("n") == 1) / F.count(F.lit(1)), 6
        ).alias("hapax_frac"),
        F.round(F.count(F.lit(1)) / F.sum("n"), 6).alias("type_token_ratio"),
        F.count_if(F.col("n") == 1).alias("_f1"),
        F.count_if(F.col("n") == 2).alias("_f2"),
        # closed-form OLS sufficient statistics over the fitted head
        F.count_if(in_fit).alias("_m"),
        F.sum(F.when(in_fit, x)).alias("_sx"),
        F.sum(F.when(in_fit, y)).alias("_sy"),
        F.sum(F.when(in_fit, x * x)).alias("_sxx"),
        F.sum(F.when(in_fit, y * y)).alias("_syy"),
        F.sum(F.when(in_fit, x * y)).alias("_sxy"),
    )
    m = F.col("_m").cast("double")
    cov = m * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    varx = m * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    vary = m * F.col("_syy") - F.col("_sy") * F.col("_sy")
    slope = F.when((F.col("_m") >= 2) & (varx > 0), cov / varx)
    r2 = F.when(
        (F.col("_m") >= 2) & (varx > 0) & (vary > 0),
        (cov * cov) / (varx * vary),
    )
    f1 = F.col("_f1").cast("double")
    f2 = F.col("_f2").cast("double")
    chao1 = F.col("vocab_size") + f1 * (f1 - 1) / (2.0 * (f2 + 1.0))
    return agg.select(
        "group",
        "n_tokens",
        "vocab_size",
        "hapax_frac",
        "type_token_ratio",
        F.round(chao1, 6).alias("chao1_vocab"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round(r2, 6).alias("zipf_r2"),
    )


def ngram_diversity_census(
    df: DataFrame,
    *,
    text_col: str = "text",
    group_col: str = "source",
    n: int = 2,
    lowercase: bool = True,
    exact: bool = True,
) -> DataFrame:
    """Distinct-n diversity census (Li et al. 2016 "distinct" metric) —
    the mode-collapse detector for synthetic/templated slices: a source
    whose documents are individually fluent but drawn from a few
    templates shows a normal per-doc distinct ratio and a CRATERED
    corpus-level one (the same n-grams repeat across documents).

    Per group → (group, n_docs, grams_total, avg_doc_distinct_ratio,
    corpus_distinct_grams, corpus_distinct_ratio).

    - per-doc ratio: distinct n-grams / n-grams of the doc, row-local
      (array_distinct over the gram array — never leaves the task);
    - corpus distinct: exact ``count_distinct`` over the exploded
      (group, gram) pairs — partial-aggregated map-side so the exchange
      carries the per-partition distinct gram set, bounded by gram
      vocabulary, not occurrences. At 10^12 tokens the gram vocabulary
      itself is huge: set ``exact=False`` to swap in
      ``approx_count_distinct`` (HLL, fixed-size state) — same shape,
      sketch-sized exchange. Exact mode is the oracle-verified path.

    ONE scan: the doc marker struct and the gram explode share a single
    projection (tagged rows: one marker row per doc + one row per gram
    occurrence), so per-doc stats and corpus distinct counts fold from
    the same exchange — the salient-terms/zipf plan shape.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    base = F.coalesce(F.col(text_col), F.lit(""))
    split = tokens_expr(F.lower(base) if lowercase else base)
    # empty/NULL text = ZERO tokens, never one: split('', ' ') yields
    # [''], which for n=1 would mint a phantom '' gram per empty doc
    # (inflating grams_total, ratio 1.0 into the avg, '' in the corpus
    # set) — the family convention is tokenizer_efficiency_census's
    # "empty text = 0 words". n>=2 is unaffected (size 1 < n already
    # yields zero grams).
    toks = F.when(F.length(base) == 0, F.array().cast("array<string>")).otherwise(
        split
    )
    # materialize the token array behind a projection barrier first —
    # an inline tokens_expr would re-split the text once per n-gram
    # (the word_ngrams_expr lambda trap)
    rows = df.select(
        F.col(group_col).alias("group"), toks.alias("_toks")
    ).select(
        "group",
        word_ngrams_expr(F.col("_toks"), n).alias("_grams"),
    ).select(
        "group",
        F.size("_grams").alias("_n_grams"),
        F.size(F.array_distinct("_grams")).alias("_n_distinct"),
        "_grams",
    )
    # tagged union in one projection: marker row (gram NULL) per doc +
    # one row per gram occurrence; explode_outer keeps gram-less docs
    tagged = rows.select(
        "group",
        "_n_grams",
        "_n_distinct",
        F.explode_outer(
            F.concat(F.array(F.lit(None).cast("string")), F.col("_grams"))
        ).alias("_gram"),
        # marker = the injected NULL head element; real grams are
        # non-NULL (word_ngrams_expr output is concat_ws, never NULL)
    ).withColumn("_is_marker", F.col("_gram").isNull())
    distinct_grams = (
        F.count_distinct(F.col("_gram"))
        if exact
        else F.approx_count_distinct(F.col("_gram"))
    )
    agg = tagged.groupBy("group").agg(
        F.count_if(F.col("_is_marker")).alias("n_docs"),
        F.sum(F.when(F.col("_is_marker"), F.col("_n_grams"))).alias(
            "grams_total"
        ),
        F.avg(
            F.when(
                F.col("_is_marker") & (F.col("_n_grams") > 0),
                F.col("_n_distinct") / F.col("_n_grams"),
            )
        ).alias("_avg_ratio"),
        distinct_grams.alias("corpus_distinct_grams"),
    )
    return agg.select(
        "group",
        "n_docs",
        F.col("grams_total").cast("bigint").alias("grams_total"),
        F.round("_avg_ratio", 6).alias("avg_doc_distinct_ratio"),
        "corpus_distinct_grams",
        F.round(
            F.when(
                F.col("grams_total") > 0,
                F.col("corpus_distinct_grams") / F.col("grams_total"),
            ),
            6,
        ).alias("corpus_distinct_ratio"),
    )
