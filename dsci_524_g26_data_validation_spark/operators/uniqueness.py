"""E1 — uniqueness check with explicit two-level (salted) aggregation.

North rule (BASELINE.json:14): uniqueness over e.g. ``doc_id`` at 10^12
rows with explicit skew handling — AQE alone is not the deliverable
(SURVEY.md §4.2).

Strategy: counting duplicates of a key shuffles on that key; a hot key
would funnel all its rows to one reducer. The two-level aggregation
bounds every reducer-side group:

  stage 1  groupBy(key, salt).count()   — salt = spark_partition_id(),
           so a stage-1 group never exceeds one input partition; the
           (key, salt) shuffle spreads a hot key over as many reducers
           as it has input partitions.
  stage 2  groupBy(key).sum(count)      — at most (#partitions) rows per
           key enter the final agg: bounded regardless of skew.

Both stages are plain hash aggregates (partial+final, codegen).
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "duplicate_keys",
    "uniqueness_violation_count",
    "functional_dependency_violations",
]


def _keys(key: Union[str, Sequence[str]]):
    return [key] if isinstance(key, str) else list(key)


def duplicate_keys(df: DataFrame, key: Union[str, Sequence[str]]) -> DataFrame:
    """Keys appearing more than once → (key cols..., dup_count).

    NULL keys participate (a NULL key appearing twice is a duplicate),
    matching SQL GROUP BY semantics.
    """
    keys = _keys(key)
    kcols = [F.col(f"`{k}`") for k in keys]
    stage1 = (
        df.select(*kcols, F.spark_partition_id().alias("_salt"))
        .groupBy(*keys, "_salt")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    return (
        stage1.groupBy(*keys)
        .agg(F.sum("_c").alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


def uniqueness_violation_count(df: DataFrame, key: Union[str, Sequence[str]]) -> dict:
    """Driver-side scalar summary for the validation Issue: number of
    distinct duplicated keys and total surplus rows."""
    row = (
        duplicate_keys(df, key)
        .agg(
            F.count(F.lit(1)).alias("dup_keys"),
            F.coalesce(F.sum(F.col("dup_count") - 1), F.lit(0)).alias("surplus_rows"),
        )
        .collect()[0]
    )
    return {"dup_keys": int(row["dup_keys"]), "surplus_rows": int(row["surplus_rows"])}


def functional_dependency_violations(
    df: DataFrame,
    *,
    determinant: Union[str, Sequence[str]],
    dependent: str,
) -> DataFrame:
    """Determinant-value groups that map to MORE than one distinct
    dependent value — violations of the functional dependency
    ``determinant → dependent`` (e.g. ``zip → city``,
    ``doc_id → content_hash``, ``order → customer``).

    The cross-column integrity check E1 can't express: uniqueness says
    "this key appears once"; an FD says "whenever this key appears, the
    dependent agrees". Returns one row per violating determinant with
    ``n_values`` (distinct dependent count, NULL counted as a value —
    {x, NULL} IS an inconsistency) and two bounded witnesses
    (``witness_min``/``witness_max``, min/max over non-NULL dependents).

    100 TB shape: stage 1 deduplicates (determinant, dependent) PAIRS in
    a hash aggregate — map-side partials collapse repeats before the
    shuffle, so the exchange carries distinct pairs, not rows; stage 2
    aggregates pair-counts per determinant. Witness state is two values
    per group (min/max), never a collect_set — bounded no matter how
    badly the FD is broken. Both stages are partial+final hash
    aggregates; skew note: a determinant value with millions of
    DISTINCT dependents is itself the pathology this check reports, and
    stage 1's (det, dep) grouping already spreads it across reducers.
    """
    det = _keys(determinant)
    pairs = df.select(*det, dependent).groupBy(*det, dependent).agg(
        F.lit(1).alias("_one")
    )
    return (
        pairs.groupBy(*det)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_values"),
            F.min(dependent).alias("witness_min"),
            F.max(dependent).alias("witness_max"),
        )
        .filter(F.col("n_values") > 1)
    )
