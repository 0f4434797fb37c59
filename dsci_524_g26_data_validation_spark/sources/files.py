"""Per-file health census — which shard is broken?

At 10^12 rows a table is tens of thousands of parquet files, and the
failure mode row-level contracts miss is FILE-shaped: one shard written
by a sick executor (truncated, all-NULL column, stale schema default),
one backfill job that double-wrote a day. Table-level stats dilute a
single bad file to invisibility; ``input_file_name()`` keys the same
fused aggregates to the physical file so the census names the culprit.

Scale shape: ONE scan; the aggregation is map-side combined and the
shuffle carries O(files × stats) rows — a partition almost always reads
one file, so the partial aggregate usually collapses to one row per
file before the exchange. ``flag_outlier_files`` reuses the
median/MAD-robust z-score (the same estimator as
``operators.outliers``) over the FILE-count frame — a population of
file sizes is exactly where mean/σ breaks (the bad file inflates σ and
hides itself).

No SQL oracle: file paths are environment-local, so this operator is
pinned by pytest over a deterministically partitioned write instead
(the honest check — the driver compare can't see paths).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["file_census", "flag_outlier_files"]


def file_census(
    df: DataFrame,
    *,
    null_cols: Sequence[str] = (),
    key_col: Optional[str] = None,
) -> DataFrame:
    """(file, n_rows[, <col>_null_frac…][, key_min, key_max]) per input
    file of a file-backed DataFrame.

    ``null_cols``: columns whose per-file NULL fraction is reported — an
    all-NULL column in ONE file is the classic sick-writer signature.
    ``key_col``: a monotonic-ish key whose per-file min/max exposes
    duplicate/overlapping ranges (double-written shards) when compared
    across files.

    Call on a freshly-read frame (``spark.read.parquet(...)``):
    ``input_file_name()`` is empty for rows that did not originate from
    a file scan; such rows are surfaced under the ``""`` file rather
    than dropped, because an unexpected non-file source IS a finding.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in null_cols:
        aggs.append(
            F.avg(F.col(f"`{c}`").isNull().cast("double")).alias(
                f"{c}_null_frac"
            )
        )
    if key_col is not None:
        aggs.append(F.min(F.col(f"`{key_col}`")).alias("key_min"))
        aggs.append(F.max(F.col(f"`{key_col}`")).alias("key_max"))
    return df.groupBy(F.input_file_name().alias("file")).agg(*aggs)


def flag_outlier_files(
    census: DataFrame,
    *,
    metric_col: str = "n_rows",
    threshold: float = 3.5,
) -> DataFrame:
    """Append (median, mad_z, is_outlier) to a file census — modified
    z-score of ``metric_col`` against the population of FILES (Hampel
    identifier, ×1.4826 consistency constant; meanAD ×1.2533 fallback
    when MAD degenerates to 0, i.e. when more than half the files are
    identical — exactly the healthy case where the detector must stay
    live for the one deviant file).

    The census frame is O(files) rows, so the two unpartitioned windows
    are single-task by construction — the correct plan at any corpus
    size (the window runs over files, not rows)."""
    w = Window.partitionBy()
    m = F.col(f"`{metric_col}`").cast("double")
    with_med = census.withColumn(
        "median", F.expr(f"percentile(`{metric_col}`, 0.5)").over(w)
    )
    dev = F.abs(m - F.col("median"))
    with_mad = with_med.withColumn(
        "_mad", F.expr("percentile(abs(`{0}` - median), 0.5)".format(metric_col)).over(w)
    ).withColumn("_meanad", F.avg(dev).over(w))
    scale = F.when(F.col("_mad") > 0, F.col("_mad") * 1.4826).otherwise(
        F.col("_meanad") * 1.2533
    )
    z = F.when(scale > 0, dev / scale)
    return (
        with_mad.withColumn("mad_z", F.round(z, 6))
        .withColumn(
            "is_outlier",
            F.coalesce(F.col("mad_z") > threshold, F.lit(False)),
        )
        .drop("_mad", "_meanad")
    )
