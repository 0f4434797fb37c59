"""Join pre-flight: predicted join cardinality and hot-key report.

The most expensive failure on a shared cluster is the join that
"worked at sf0.01" and explodes in production — a many-to-many key
nobody declared (the double-booked dimension row, the NULL-adjacent
default key, the re-crawled URL). Both sides' row counts say nothing:
join output is Σ_k count_left(k)·count_right(k), a quantity dominated
by a handful of hot keys.

:func:`join_explosion_report` computes that sum EXACTLY before any
join runs, plus the key-overlap census (orphan keys each side — the
referential-integrity picture at key granularity) and the worst
single-key fan-out. :func:`hot_join_keys` names the offending keys —
the input `operators.skew.suggested_salt` needs to size a salted join.

100 TB shape: each side collapses to its (key, count) frame first
(map-side combine — the exchange carries one partial per distinct key
per task, never rows), the full-outer join runs on those two
key-frames, and the report is a 1-row fold. Nothing about the real
join is materialized; cost ~ two distinct-count aggregations.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["join_explosion_report", "hot_join_keys"]


def _key_counts(df: DataFrame, keys: Sequence[str], side: str) -> DataFrame:
    if not keys:
        raise ValueError("keys must name at least one column")
    return df.groupBy(
        *[F.col(f"`{k}`").alias(k) for k in keys]
    ).agg(F.count(F.lit(1)).alias(f"_c_{side}"))


def _joined_counts(
    left: DataFrame, right: DataFrame, keys: Sequence[str]
) -> DataFrame:
    lc = _key_counts(left, keys, "l")
    rc = _key_counts(right, keys, "r")
    # NULL keys never pair in a real equi-join, but Spark's USING-join
    # on a column list matches NULL to NULL — so NULL-key rows are
    # tagged and excluded from the pairing here, and reported as their
    # own mass by the caller instead of silently inflating a side.
    null_key = None
    for k in keys:
        cond = F.col(f"`{k}`").isNull()
        null_key = cond if null_key is None else null_key | cond
    lc = lc.withColumn("_lnull", null_key)
    rc = rc.withColumn("_rnull", null_key)
    j = lc.filter(~F.col("_lnull")).join(
        rc.filter(~F.col("_rnull")), on=list(keys), how="full_outer"
    )
    return j, lc, rc


def join_explosion_report(
    left: DataFrame,
    right: DataFrame,
    *,
    keys: Sequence[str],
) -> DataFrame:
    """ONE row → (n_rows_left, n_rows_right, n_keys_left, n_keys_right,
    n_shared_keys, n_keys_left_only, n_keys_right_only, join_rows,
    max_key_fanout, null_key_rows_left, null_key_rows_right).

    ``join_rows`` is the EXACT inner-join output cardinality
    (Σ over shared keys of count_l·count_r) — compare to
    max(n_rows_left, n_rows_right) before submitting the real thing.
    ``max_key_fanout`` is the largest single-key product (the skew
    ceiling a salted join must flatten). NULL keys never pair in an
    equi-join; their row mass is reported separately instead of
    silently inflating either side.
    """
    j, lc, rc = _joined_counts(left, right, keys)
    pair = (
        F.coalesce(F.col("_c_l"), F.lit(0))
        * F.coalesce(F.col("_c_r"), F.lit(0))
    ).cast("bigint")
    both = F.col("_c_l").isNotNull() & F.col("_c_r").isNotNull()
    per_key = j.agg(
        F.coalesce(F.sum("_c_l"), F.lit(0)).alias("n_rows_left_nonnull"),
        F.coalesce(F.sum("_c_r"), F.lit(0)).alias("n_rows_right_nonnull"),
        F.count_if(F.col("_c_l").isNotNull()).alias("n_keys_left"),
        F.count_if(F.col("_c_r").isNotNull()).alias("n_keys_right"),
        F.count_if(both).alias("n_shared_keys"),
        F.count_if(F.col("_c_r").isNull()).alias("n_keys_left_only"),
        F.count_if(F.col("_c_l").isNull()).alias("n_keys_right_only"),
        F.coalesce(F.sum(pair), F.lit(0)).alias("join_rows"),
        F.coalesce(F.max(pair), F.lit(0)).alias("max_key_fanout"),
    )
    lnull = lc.filter(F.col("_lnull")).agg(
        F.coalesce(F.sum("_c_l"), F.lit(0)).alias("null_key_rows_left")
    )
    rnull = rc.filter(F.col("_rnull")).agg(
        F.coalesce(F.sum("_c_r"), F.lit(0)).alias("null_key_rows_right")
    )
    return (
        per_key.crossJoin(F.broadcast(lnull))
        .crossJoin(F.broadcast(rnull))
        .select(
            (F.col("n_rows_left_nonnull") + F.col("null_key_rows_left")).alias(
                "n_rows_left"
            ),
            (
                F.col("n_rows_right_nonnull") + F.col("null_key_rows_right")
            ).alias("n_rows_right"),
            "n_keys_left",
            "n_keys_right",
            "n_shared_keys",
            "n_keys_left_only",
            "n_keys_right_only",
            "join_rows",
            "max_key_fanout",
            "null_key_rows_left",
            "null_key_rows_right",
        )
    )


def hot_join_keys(
    left: DataFrame,
    right: DataFrame,
    *,
    keys: Sequence[str],
    top_k: int = 10,
) -> DataFrame:
    """The offending keys: top-``top_k`` shared keys by output fan-out →
    key columns + (n_left, n_right, join_rows). Feed the worst
    ``join_rows / tasks`` ratio into `skew.suggested_salt` to size the
    salted join. Deterministic: ties break by the key values ascending.
    TakeOrderedAndProject over the key-count frame — no full sort.
    """
    if top_k <= 0:
        raise ValueError(f"top_k must be > 0, got {top_k}")
    j, _, _ = _joined_counts(left, right, keys)
    both = F.col("_c_l").isNotNull() & F.col("_c_r").isNotNull()
    return (
        j.filter(both)
        .select(
            *keys,
            F.col("_c_l").alias("n_left"),
            F.col("_c_r").alias("n_right"),
            (F.col("_c_l") * F.col("_c_r")).cast("bigint").alias("join_rows"),
        )
        .orderBy(
            F.desc("join_rows"), *[F.asc(f"`{k}`") for k in keys]
        )
        .limit(top_k)
    )
