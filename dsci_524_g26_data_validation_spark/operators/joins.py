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
    """Full-outer join of the two (key, count) frames on STRICT key
    equality — equality is FALSE on NULL operands, so NULL-key groups
    never pair and flow through as orphan rows carrying ``_lnull`` /
    ``_rnull`` flags instead. One aggregation per side, one join: each
    input is scanned exactly once (branching the count frames into a
    separate null-mass aggregate would re-run the scans — Spark shares
    no subplans across DataFrame branches)."""
    lc = _key_counts(left, keys, "l").alias("l")
    rc = _key_counts(right, keys, "r").alias("r")

    def any_null(side: str):
        cond = None
        for k in keys:
            c = F.col(f"{side}.{k}").isNull()
            cond = c if cond is None else cond | c
        return cond

    on = None
    for k in keys:
        eq = F.col(f"l.{k}") == F.col(f"r.{k}")
        on = eq if on is None else on & eq
    j = lc.join(rc, on=on, how="full_outer").select(
        *[F.coalesce(F.col(f"l.{k}"), F.col(f"r.{k}")).alias(k) for k in keys],
        F.col("_c_l"),
        F.col("_c_r"),
        F.coalesce(F.col("_c_l").isNotNull() & any_null("l"), F.lit(False)).alias(
            "_lnull"
        ),
        F.coalesce(F.col("_c_r").isNotNull() & any_null("r"), F.lit(False)).alias(
            "_rnull"
        ),
    )
    return j


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
    j = _joined_counts(left, right, keys)
    # decimal(38,0), not bigint: the per-key product (and the summed
    # cardinality) of two 10^12-row sides can pass 2^63, and under ANSI
    # (Spark 4 default) a bigint multiply would abort the pre-flight on
    # exactly the mega-hot-key it exists to detect. Same widening as
    # rowdiff.partition_digests.
    pair = (
        F.coalesce(F.col("_c_l"), F.lit(0)).cast("decimal(38,0)")
        * F.coalesce(F.col("_c_r"), F.lit(0))
    ).cast("decimal(38,0)")
    both = F.col("_c_l").isNotNull() & F.col("_c_r").isNotNull()
    lnull, rnull = F.col("_lnull"), F.col("_rnull")
    return j.agg(
        F.coalesce(F.sum("_c_l"), F.lit(0)).alias("n_rows_left"),
        F.coalesce(F.sum("_c_r"), F.lit(0)).alias("n_rows_right"),
        F.count_if(F.col("_c_l").isNotNull() & ~lnull).alias("n_keys_left"),
        F.count_if(F.col("_c_r").isNotNull() & ~rnull).alias("n_keys_right"),
        F.count_if(both).alias("n_shared_keys"),
        F.count_if(
            F.col("_c_l").isNotNull() & F.col("_c_r").isNull() & ~lnull
        ).alias("n_keys_left_only"),
        F.count_if(
            F.col("_c_r").isNotNull() & F.col("_c_l").isNull() & ~rnull
        ).alias("n_keys_right_only"),
        F.coalesce(F.sum(F.when(both, pair)), F.lit(0))
        .cast("decimal(38,0)")
        .alias("join_rows"),
        F.coalesce(F.max(F.when(both, pair)), F.lit(0))
        .cast("decimal(38,0)")
        .alias("max_key_fanout"),
        F.coalesce(F.sum(F.when(lnull, F.col("_c_l"))), F.lit(0)).alias(
            "null_key_rows_left"
        ),
        F.coalesce(F.sum(F.when(rnull, F.col("_c_r"))), F.lit(0)).alias(
            "null_key_rows_right"
        ),
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
    j = _joined_counts(left, right, keys)
    both = F.col("_c_l").isNotNull() & F.col("_c_r").isNotNull()
    return (
        j.filter(both)
        .select(
            *keys,
            F.col("_c_l").alias("n_left"),
            F.col("_c_r").alias("n_right"),
            # decimal(38,0): a hot key's fan-out can pass 2^63 (see
            # join_explosion_report) — ANSI would abort the bigint cast
            (F.col("_c_l").cast("decimal(38,0)") * F.col("_c_r"))
            .cast("decimal(38,0)")
            .alias("join_rows"),
        )
        .orderBy(
            F.desc("join_rows"), *[F.asc(f"`{k}`") for k in keys]
        )
        .limit(top_k)
    )
