"""Robust outlier detection — median/MAD z-scores per group.

Mean/stddev outlier rules break on the data they're meant to catch (the
outliers inflate the stddev that defines them); the robust estimator
pair — median and MAD (median absolute deviation, scaled by 1.4826 to
be a consistent σ estimator under normality; Hampel 1974, the standard
robust-statistics identifier) — has a 50% breakdown point.

Plan shape (three passes, each over the PROJECTED (group, value)
columns only — parquet column pruning means none of them re-reads the
corpus payload):

1. per-group median — one hash aggregate,
2. per-group MAD — one re-scan joined (broadcast: the group frame is
   |groups| rows) against the medians,
3. outlier census — one re-scan joined against the (median, MAD) frame.

``approx=True`` swaps the exact ``median`` (a full sort-based aggregate
— fine at test scale, expensive at 10^12 rows) for
``approx_percentile`` with configurable ``accuracy`` — the
GK-sketch single-pass form the 100 TB deployment uses. Exact mode
exists so results are engine-reproducible (the DuckDB oracle matches it
bit-for-bit); both modes share every other part of the plan.

Degenerate groups: MAD == 0 (over half the values identical) makes the
robust z undefined — those groups report ``n_outliers = NULL`` rather
than flagging everything/nothing silently.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["robust_outlier_stats", "robust_outlier_rows", "append_robust_z"]

#: MAD → σ consistency constant under normality (1/Φ⁻¹(3/4)).
MAD_SCALE = 1.4826

#: mean-absolute-deviation → σ consistency constant (√(π/2)); the
#: Hampel fallback scale when MAD degenerates to 0 (>50% of the
#: population identical — the NORMAL case for healthy uniform censuses,
#: exactly where the detector must stay live for the one deviant).
MEANAD_SCALE = 1.2533


def append_robust_z(
    df: DataFrame, metric_col: str, *, z_col: str = "robust_z"
) -> DataFrame:
    """Append ``_med``, ``_scale`` and ``z_col`` — the exact-median
    Hampel modified z-score of ``metric_col`` against the WHOLE frame.

    The single shared implementation behind every small-census outlier
    flagger (``sources.files.flag_outlier_files``,
    ``timeseries.volume_calendar``): one estimator, one MAD→meanAD
    fallback policy, so a change to either can never drift between
    call sites. Unpartitioned exact-median windows — single-task by
    construction, which is the CORRECT plan only because callers score
    O(files)/O(buckets) census frames, never row-scale data; for
    grouped row-scale scoring use :func:`robust_outlier_stats` (which
    keeps the two-aggregation shape and an approx-percentile mode).

    ``z_col`` is NULL when even the meanAD scale is 0 (every value
    identical — nothing can be an outlier) — callers decide the verdict
    (``coalesce(z > t, false)`` or a ``_scale > 0`` gate).
    """
    from pyspark.sql import Window

    w = Window.partitionBy()
    m = F.col(f"`{metric_col}`").cast("double")
    with_med = df.withColumn("_med", F.median(m).over(w))
    dev = F.abs(m - F.col("_med"))
    scored = with_med.withColumn("_mad", F.median(dev).over(w)).withColumn(
        "_meanad", F.avg(dev).over(w)
    )
    scale = F.when(
        F.col("_mad") > 0, F.lit(MAD_SCALE) * F.col("_mad")
    ).otherwise(F.lit(MEANAD_SCALE) * F.col("_meanad"))
    return (
        scored.withColumn("_scale", scale)
        .withColumn(z_col, F.when(F.col("_scale") > 0, dev / F.col("_scale")))
        .drop("_mad", "_meanad")
    )


def _median(col: str, approx: bool, accuracy: int):
    if approx:
        return F.approx_percentile(F.col(col), F.lit(0.5), F.lit(accuracy))
    return F.median(F.col(col))


def _med_mad(
    df: DataFrame, value_col: str, group_col: Optional[str],
    approx: bool, accuracy: int,
):
    gcols = [group_col] if group_col else []
    proj = df.select(*gcols, F.col(value_col).alias("_x"))
    med = (
        proj.groupBy(*gcols).agg(
            _median("_x", approx, accuracy).alias("_med"),
            F.count("_x").alias("_n"),
        )
        if gcols
        else proj.agg(
            _median("_x", approx, accuracy).alias("_med"),
            F.count("_x").alias("_n"),
        )
    ).localCheckpoint()  # ≤|groups| rows; referenced by the dev pass AND
    # the stats join — un-checkpointed, each broadcast branch would
    # replay the median's full corpus scan (4+ scans instead of 3)
    dev = proj.join(F.broadcast(med), on=gcols or None, how="inner") if gcols \
        else proj.crossJoin(F.broadcast(med))
    dev = dev.withColumn("_dev", F.abs(F.col("_x") - F.col("_med")))
    mad = (
        dev.groupBy(*gcols).agg(_median("_dev", approx, accuracy).alias("_mad"))
        if gcols
        else dev.agg(_median("_dev", approx, accuracy).alias("_mad"))
    )
    stats = (
        med.join(F.broadcast(mad), on=gcols or None, how="inner")
        if gcols
        else med.crossJoin(F.broadcast(mad))
    ).localCheckpoint()  # ≤|groups| rows; consumed by both the census and
    # the row filter — pins the MAD pass to exactly one execution
    return proj, gcols, stats


def robust_outlier_stats(
    df: DataFrame,
    value_col: str,
    *,
    group_col: Optional[str] = None,
    threshold: float = 3.5,
    approx: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group robust outlier census: ``(group?, n_rows, median, mad,
    n_outliers, outlier_frac)``.

    ``threshold`` is in robust-σ units (3.5 is Iglewicz–Hoaglin's
    recommended cut for the modified z-score). NULL values never count
    as rows or outliers."""
    proj, gcols, stats = _med_mad(df, value_col, group_col, approx, accuracy)
    j = proj.join(F.broadcast(stats), on=gcols or None, how="inner") if gcols \
        else proj.crossJoin(F.broadcast(stats))
    is_out = F.abs(F.col("_x") - F.col("_med")) > (
        F.lit(float(threshold)) * F.lit(MAD_SCALE) * F.col("_mad")
    )
    out_count = F.when(
        F.col("_mad") > 0, F.count_if(is_out)
    ).cast("bigint")
    grouped = j.groupBy(*gcols, "_med", "_mad") if gcols else j.groupBy("_med", "_mad")
    res = grouped.agg(
        F.count("_x").alias("n_rows"),
        out_count.alias("n_outliers"),
    )
    return res.select(
        *gcols,
        F.col("n_rows"),
        F.round("_med", 6).alias("median"),
        F.round("_mad", 6).alias("mad"),
        F.col("n_outliers"),
        F.round(
            F.col("n_outliers").cast("double")
            / F.greatest(F.col("n_rows"), F.lit(1)),
            6,
        ).alias("outlier_frac"),
    )


def robust_outlier_rows(
    df: DataFrame,
    value_col: str,
    *,
    group_col: Optional[str] = None,
    threshold: float = 3.5,
    approx: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """The flagged rows themselves: input columns + ``robust_z``.

    Payload columns rejoin only AFTER the cheap projected passes decide
    the medians — the wide read happens once, filtered at scan by
    nothing (every row must be scored), but the scoring join broadcasts
    the |groups|-row stats frame, so no corpus shuffle."""
    _, gcols, stats = _med_mad(df, value_col, group_col, approx, accuracy)
    j = df.join(F.broadcast(stats), on=gcols or None, how="inner") if gcols \
        else df.crossJoin(F.broadcast(stats))
    z = F.when(
        F.col("_mad") > 0,
        F.abs(F.col(value_col) - F.col("_med"))
        / (F.lit(MAD_SCALE) * F.col("_mad")),
    )
    return (
        j.withColumn("robust_z", F.round(z, 6))
        .filter(F.col("robust_z") > float(threshold))
        .drop("_med", "_mad", "_n")
    )
