"""Label-agreement census: declared metadata vs content-derived labels.

Metadata columns lie. A crawl's ``lang`` tag comes from HTTP headers or
site defaults, a ``source`` label from an ingest config — and models
trained on mislabeled slices inherit the mismatch. The generic check:
derive the label FROM THE CONTENT with any deterministic classifier
(``text.language_id``, a quality gate, a media-kind sniffer) and cross-
tabulate it against the declared column. The diagonal is agreement;
off-diagonal cells name exactly which declared label leaks which real
content.

100 TB shape: ONE scan — the classifier is a row-local projection and
the census a groupBy on the (declared, predicted) pair with map-side
combine, so the exchange carries labels² cells, not rows. The
row-normalized share (``declared_frac``) and the one-row summary are
windows/folds over that labels-bounded frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "label_agreement_census",
    "label_agreement_summary",
    "label_agreement_kappa",
]


def label_agreement_census(
    df: DataFrame,
    *,
    declared_col: str,
    predicted_col: str,
) -> DataFrame:
    """Confusion census → (declared, predicted, n, declared_frac) with
    ``declared_frac`` = n / rows carrying that declared label.

    NULL labels are cells like any other (an untagged document
    agreeing with nothing is a finding, not a skip); agreement
    downstream uses null-safe equality.
    """
    cells = (
        df.select(
            F.col(f"`{declared_col}`").cast("string").alias("declared"),
            F.col(f"`{predicted_col}`").cast("string").alias("predicted"),
        )
        .groupBy("declared", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("declared")
    return cells.select(
        "declared",
        "predicted",
        "n",
        F.round(F.col("n") / F.sum("n").over(w), 6).alias("declared_frac"),
    )


def _distinct_with_null(col_name: str):
    """Distinct label VALUES including NULL — ``count_distinct`` skips
    NULL, which would undercount the label set whenever an untagged
    slice exists (the docstrings promise NULL counts as a label)."""
    c = F.col(col_name)
    return F.count_distinct(c) + F.coalesce(
        F.max(F.when(c.isNull(), F.lit(1))), F.lit(0)
    )


def label_agreement_summary(
    df: DataFrame,
    *,
    declared_col: str,
    predicted_col: str,
) -> DataFrame:
    """ONE row → (n_rows, n_agree, agreement_rate, n_declared_labels,
    n_predicted_labels, n_offdiag_cells). Folds the census frame, so
    the corpus is still scanned once."""
    cells = label_agreement_census(
        df, declared_col=declared_col, predicted_col=predicted_col
    )
    agree = F.col("declared").eqNullSafe(F.col("predicted"))
    return cells.agg(
        F.sum("n").alias("n_rows"),
        F.coalesce(F.sum(F.when(agree, F.col("n"))), F.lit(0)).alias(
            "n_agree"
        ),
        F.round(
            F.coalesce(F.sum(F.when(agree, F.col("n"))), F.lit(0))
            / F.sum("n"),
            6,
        ).alias("agreement_rate"),
        _distinct_with_null("declared").alias("n_declared_labels"),
        _distinct_with_null("predicted").alias("n_predicted_labels"),
        F.count_if(~agree).alias("n_offdiag_cells"),
    )


def label_agreement_kappa(
    df: DataFrame,
    *,
    declared_col: str,
    predicted_col: str,
) -> DataFrame:
    """Cohen's kappa — chance-corrected agreement (Cohen 1960). Raw
    agreement_rate flatters any pair of skewed labelers (two raters who
    both say "en" 95% of the time agree ~90% by luck alone); kappa
    subtracts the agreement their marginals predict under independence:

        kappa = (p_o - p_e) / (1 - p_e),
        p_e   = sum_L rowshare(L) * colshare(L)

    ONE row → (n_rows, p_observed, p_expected, kappa,
    n_declared_labels, n_predicted_labels). ``kappa`` is NULL when
    p_e == 1 (both raters constant and equal — the statistic is
    undefined, not 1.0). NULL labels count as a label value (null-safe
    diagonal, same convention as the census).

    100 TB shape: the corpus collapses to the labels²-bounded census
    frame in one scan; that frame is materialized once
    (``localCheckpoint``, the terms.py convention) because three
    derivations read it (p_o fold + the two marginal frames joined
    null-safely for p_e) — without the barrier each would re-scan the
    corpus.
    """
    cells = label_agreement_census(
        df, declared_col=declared_col, predicted_col=predicted_col
    ).select("declared", "predicted", "n").localCheckpoint()

    agree = F.col("declared").eqNullSafe(F.col("predicted"))
    obs = cells.agg(
        F.sum("n").alias("n_rows"),
        F.coalesce(F.sum(F.when(agree, F.col("n"))), F.lit(0)).alias("n_agree"),
        _distinct_with_null("declared").alias("n_declared_labels"),
        _distinct_with_null("predicted").alias("n_predicted_labels"),
    )
    # marginals: inner null-safe join — a label seen by only one rater
    # contributes rowshare * 0 to p_e, so the inner join is exact
    rm = cells.groupBy("declared").agg(F.sum("n").alias("n_d"))
    cm = cells.groupBy("predicted").agg(F.sum("n").alias("n_p"))
    pe_num = (
        rm.join(cm, rm["declared"].eqNullSafe(cm["predicted"]), "inner")
        .agg(F.coalesce(F.sum(F.col("n_d") * F.col("n_p")), F.lit(0)).alias("pe_n"))
    )
    j = obs.crossJoin(pe_num)  # two 1-row frames
    p_o = F.col("n_agree") / F.col("n_rows")
    p_e = F.col("pe_n") / (F.col("n_rows") * F.col("n_rows"))
    return j.select(
        "n_rows",
        F.round(p_o, 6).alias("p_observed"),
        F.round(p_e, 6).alias("p_expected"),
        F.round(
            F.when(p_e < 1, (p_o - p_e) / (F.lit(1.0) - p_e)), 6
        ).alias("kappa"),
        "n_declared_labels",
        "n_predicted_labels",
    )
