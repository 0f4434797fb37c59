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

__all__ = ["label_agreement_census", "label_agreement_summary"]


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
        F.count_distinct("declared").alias("n_declared_labels"),
        F.count_distinct("predicted").alias("n_predicted_labels"),
        F.count_if(~agree).alias("n_offdiag_cells"),
    )
