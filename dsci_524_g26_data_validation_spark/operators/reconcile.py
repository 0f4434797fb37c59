"""Cross-table aggregate reconciliation (parent total vs sum of child).

Engine extension beyond the reference package (which validates one
table at a time): the classic warehouse integrity check "does the
parent's stored total equal the aggregate of its child rows?" —
orders.total vs sum(lineitem amounts), account balance vs sum of
postings, shard row-counts vs manifest.

Determinism contract: measures are converted to **fixed-point integer
units** per row (``CAST(round(expr * scale) AS BIGINT)``) before
summing. Integer sums are associative, so the result is independent of
partitioning / merge order — the same number on 4 cores, 4,000 cores,
or a different engine (the DuckDB oracle reproduces it exactly).
Float sums are NOT (IEEE addition is non-associative); never reconcile
on raw doubles.

At-scale shape:

* child side: ``groupBy(key).agg(sum(units))`` — map-side partial agg
  collapses per-partition rows, the exchange carries (key, bigint,
  bigint) only, never child payloads.
* parent side: projected to (key, units) before the join — column
  pruning reaches the scan.
* the reconciliation is ONE full-outer shuffle join on the key (both
  sides may be huge; AQE handles skewed keys). No broadcast is forced —
  pass a pre-broadcast parent if the dimension is genuinely small.
* ``reconcile_summary`` reduces the per-key frame to O(groups) rows —
  constant driver traffic.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["fixed_point_units", "reconcile_aggregate", "reconcile_summary"]


def fixed_point_units(expr: str, scale: int) -> Column:
    """Per-row integer units: CAST(round(expr * scale) AS BIGINT).

    round() on a double is identical IEEE arithmetic in Spark and
    DuckDB (half-away-from-zero), so cross-engine results agree.
    """
    return F.expr(f"CAST(round(({expr}) * {scale}) AS BIGINT)")


def reconcile_aggregate(
    child: DataFrame,
    parent: DataFrame,
    *,
    child_key: str,
    parent_key: str,
    child_measure: str,
    parent_measure: str,
    scale: int = 100,
    abs_tol_units: int = 0,
    parent_extra_cols: Sequence[str] = (),
) -> DataFrame:
    """Per parent key: stored parent total vs summed child measure.

    child_measure / parent_measure: Spark SQL numeric expressions in
    natural units (e.g. ``l_extendedprice * (1 - l_discount)``);
    ``scale`` fixes the decimal precision (100 = cents).

    Returns one row per key present on EITHER side (full outer):
      key, parent_units, child_units, n_child, diff_units, status
    where status ∈ {'ok','mismatch','missing_child','orphan_child',
    'null_parent_measure'} — the last for a parent row that EXISTS but
    whose measure evaluates to NULL (distinct from orphan_child, which
    means no parent row at all). NULL child measure rows contribute 0
    units but still count in n_child. ``abs_tol_units`` absorbs
    acceptable rounding slack.
    """
    c = (
        child.groupBy(F.col(f"`{child_key}`").alias("key"))
        .agg(
            F.coalesce(F.sum(fixed_point_units(child_measure, scale)), F.lit(0))
            .cast("bigint")
            .alias("child_units"),
            F.count(F.lit(1)).cast("bigint").alias("n_child"),
        )
    )
    p = parent.select(
        F.col(f"`{parent_key}`").alias("key"),
        fixed_point_units(parent_measure, scale).alias("parent_units"),
        F.lit(1).alias("_parent_present"),
        *[F.col(f"`{x}`") for x in parent_extra_cols],
    )
    j = p.join(c, on="key", how="full_outer")
    diff = F.col("parent_units") - F.col("child_units")
    # presence is tested via the marker, NOT parent_units IS NULL: a
    # parent row whose measure evaluates to NULL is a real upstream
    # defect and gets its own status — misfiling it as 'orphan_child'
    # (key present on the child side only) would misdirect triage
    status = (
        F.when(F.col("_parent_present").isNull(), F.lit("orphan_child"))
        .when(F.col("parent_units").isNull(), F.lit("null_parent_measure"))
        .when(F.col("child_units").isNull(), F.lit("missing_child"))
        .when(F.abs(diff) <= F.lit(abs_tol_units), F.lit("ok"))
        .otherwise(F.lit("mismatch"))
    )
    return j.select(
        "key",
        "parent_units",
        "child_units",
        F.coalesce(F.col("n_child"), F.lit(0)).cast("bigint").alias("n_child"),
        diff.alias("diff_units"),
        status.alias("status"),
        *[F.col(f"`{x}`") for x in parent_extra_cols],
    )


def reconcile_summary(
    recon: DataFrame, group_cols: Sequence[str] = ()
) -> DataFrame:
    """Reduce a reconciliation frame to O(groups) verdict rows:
    (group_cols..., status, n_keys, abs_diff_units) — the audit number a
    100 TB run actually ships to the driver / metrics sink."""
    return (
        recon.groupBy(*[F.col(f"`{c}`") for c in group_cols], "status")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.coalesce(F.sum(F.abs(F.col("diff_units"))), F.lit(0))
            .cast("bigint")
            .alias("abs_diff_units"),
        )
        .orderBy(*[F.col(f"`{c}`") for c in group_cols], "status")
    )
