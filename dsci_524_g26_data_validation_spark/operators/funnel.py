"""Sequential filter funnel — the corpus-cleaning pipeline report.

Every web-scale curation pipeline (C4, CCNet, Gopher, FineWeb — public
recipes) is an ORDERED cascade of document filters, and the number that
drives every tuning decision is the funnel: how many documents each
stage kills GIVEN everything before it let them through. Summing
per-filter kill counts independently double-counts (a short spammy doc
dies once, not twice); the funnel attributes each document to its
FIRST failing stage, which is also exactly how the production pipeline
would behave.

100 TB shape: ONE scan — the first-failing-stage index is a single
row-local CASE over the filter predicates, the census is a
groupBy on that tiny index (map-side combined, ≤ |filters|+1 keys
[× groups]), and the funnel arithmetic (n_in per stage = survivors of
all earlier stages) is a window over the |filters|-row counts frame.
No filter is evaluated twice; documents never shuffle.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["filter_funnel", "apply_filters"]


def _first_fail(filters) -> Column:
    """Row-local index of the first failing filter (TRUE = keep;
    NULL evaluations fail — 'could not establish the property'),
    |filters| when every stage passes."""
    expr = None
    for i, (_, pred) in enumerate(filters):
        cond = ~F.coalesce(pred, F.lit(False))
        expr = F.when(cond, i) if expr is None else expr.when(cond, i)
    if expr is None:
        raise ValueError("filters must declare at least one stage")
    return expr.otherwise(F.lit(len(filters)))


def _normalize(filters) -> Sequence[Tuple[str, Column]]:
    out = []
    for name, pred in filters:
        if isinstance(pred, str):
            pred = F.expr(pred)
        out.append((str(name), pred))
    return out


def filter_funnel(
    df: DataFrame,
    filters: Sequence[Tuple[str, Union[str, Column]]],
    *,
    group_col: Optional[str] = None,
) -> DataFrame:
    """Funnel census → ([group,] stage, filter, n_in, n_killed, n_out,
    kill_frac) per stage, in declared order, plus survivors implied by
    the last stage's ``n_out``.

    ``filters``: ordered (name, keep-predicate) pairs — predicate TRUE
    keeps the document; FALSE or NULL kills it at that stage (explicit
    3VL: an unevaluable property is a failed property, matching the
    violation operators). ``kill_frac`` = n_killed / n_in (NULL when
    the stage saw nothing — an upstream stage killed everything).
    """
    filters = _normalize(filters)
    ff = _first_fail(filters)
    keys = ([F.col(f"`{group_col}`").alias("group")] if group_col else [])
    # two derivations read this frame (stage join + totals); materialize
    # it once (localCheckpoint, the json_profile/terms pattern) so the
    # corpus is scanned exactly once — it is ≤ (stages+1) [x groups] rows
    counts = (
        df.select(*keys, ff.alias("_ff"))
        .groupBy(*(["group"] if group_col else []), "_ff")
        .agg(F.count(F.lit(1)).alias("_n"))
    ).localCheckpoint()
    # attach zero-count stages so every declared filter reports a row
    spark_range = counts.sparkSession.createDataFrame(
        [(i, name) for i, (name, _) in enumerate(filters)],
        "stage int, filter string",
    )
    base = counts
    if group_col:
        stages = base.select("group").distinct().crossJoin(spark_range)
        joined = stages.alias("s").join(
            base.alias("b"),
            on=[F.col("s.group") == F.col("b.group"),
                F.col("s.stage") == F.col("b._ff")],
            how="left",
        ).select(
            F.col("s.group").alias("group"),
            F.col("s.stage").alias("stage"),
            F.col("s.filter").alias("filter"),
            F.col("b._n").alias("_killed"),
        )
        win = Window.partitionBy("group").orderBy("stage")
    else:
        joined = spark_range.alias("s").join(
            base.alias("b"),
            on=[F.col("s.stage") == F.col("b._ff")],
            how="left",
        ).select(
            F.col("s.stage").alias("stage"),
            F.col("s.filter").alias("filter"),
            F.col("b._n").alias("_killed"),
        )
        win = Window.partitionBy().orderBy("stage")
    # totals fold the counts frame (every row carries a _ff), NOT the
    # corpus — keeping the operator a genuine single scan
    if group_col:
        total = base.groupBy("group").agg(F.sum("_n").alias("_total"))
        joined = joined.join(total, on="group")
    else:
        total = base.agg(
            F.coalesce(F.sum("_n"), F.lit(0)).alias("_total")
        )
        joined = joined.crossJoin(F.broadcast(total))
    killed = F.coalesce(F.col("_killed"), F.lit(0))
    killed_before = F.coalesce(
        F.sum(killed).over(win.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    n_in = F.col("_total") - killed_before
    return joined.select(
        *(["group"] if group_col else []),
        "stage",
        "filter",
        n_in.cast("bigint").alias("n_in"),
        killed.cast("bigint").alias("n_killed"),
        (n_in - killed).cast("bigint").alias("n_out"),
        F.round(
            F.when(n_in > 0, killed / n_in), 6
        ).alias("kill_frac"),
    )


def apply_filters(
    df: DataFrame,
    filters: Sequence[Tuple[str, Union[str, Column]]],
) -> DataFrame:
    """The survivors: rows passing EVERY filter (same 3VL as the
    funnel — NULL fails). One row-local conjunction; compose with
    `filter_funnel` for the report and this for the output corpus."""
    filters = _normalize(filters)
    keep = None
    for _, pred in filters:
        p = F.coalesce(pred, F.lit(False))
        keep = p if keep is None else keep & p
    if keep is None:
        raise ValueError("filters must declare at least one stage")
    return df.filter(keep)
