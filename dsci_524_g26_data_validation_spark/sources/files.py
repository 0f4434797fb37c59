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

__all__ = ["file_census", "flag_outlier_files", "clustering_report"]


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


def clustering_report(census: DataFrame) -> DataFrame:
    """ONE row → (n_files, n_ranged_files, n_overlapping_files,
    overlap_frac, span_inflation) from a :func:`file_census` frame that
    carried ``key_col``.

    The data-layout health check behind every slow scan: parquet/
    Iceberg min/max pruning only skips a file when the predicate's key
    range misses the FILE's range — if file key ranges overlap heavily
    (append-order writes, unsorted backfills), every point query touches
    every file and "partition pruning" silently becomes a full scan.
    ``n_overlapping_files`` counts files whose [key_min, key_max] range
    intersects ANY earlier range (the monotonic running-max sweep —
    same any-predecessor shape as ``timeseries.interval_overlaps``, so
    one long file swallowing many is charged to each); ``span_inflation``
    = Σ file spans / global span (≈1 for disjoint sorted layout, ≫1 for
    interleaved writes). High numbers say: rewrite sorted (or cluster by
    the key) before blaming the reader.

    The census frame is O(files) rows, so the single-task windows are
    the correct plan at any corpus size.
    """
    if "key_min" not in census.columns or "key_max" not in census.columns:
        raise ValueError("census must be built with key_col= (key_min/key_max)")
    ranged = census.filter(
        F.col("key_min").isNotNull() & F.col("key_max").isNotNull()
    )
    w = Window.orderBy(F.asc("key_min"), F.asc("key_max"), F.asc("file"))
    prev_max = F.max("key_max").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    swept = ranged.select(
        F.col("key_min").cast("double"),
        F.col("key_max").cast("double"),
        (F.col("key_min") <= prev_max).alias("_overlaps"),
    )
    total = census.agg(F.count(F.lit(1)).alias("n_files"))
    stats = swept.agg(
        F.count(F.lit(1)).alias("n_ranged_files"),
        F.coalesce(F.count_if(F.col("_overlaps")), F.lit(0)).alias(
            "n_overlapping_files"
        ),
        F.sum(F.col("key_max") - F.col("key_min")).alias("_span_sum"),
        F.min("key_min").alias("_lo"),
        F.max("key_max").alias("_hi"),
    )
    return total.crossJoin(F.broadcast(stats)).select(
        "n_files",
        "n_ranged_files",
        "n_overlapping_files",
        F.round(
            F.when(
                F.col("n_ranged_files") > 0,
                F.col("n_overlapping_files") / F.col("n_ranged_files"),
            ),
            6,
        ).alias("overlap_frac"),
        F.round(
            F.when(
                F.col("_hi") > F.col("_lo"),
                F.col("_span_sum") / (F.col("_hi") - F.col("_lo")),
            ),
            6,
        ).alias("span_inflation"),
    )
