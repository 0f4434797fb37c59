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

__all__ = ["duplicate_keys", "uniqueness_violation_count"]


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
