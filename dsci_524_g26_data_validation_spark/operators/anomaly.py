"""Group-level metric anomaly detection (per-slice data-quality monitor).

The standard production question after "is this table valid?" is "is
any SLICE of it off?" — one source out of 200 whose average quality
collapsed, one ingest day whose row volume halved. Contract rules can't
express that (the bound depends on the other slices); this operator
flags groups whose metric is a z-score outlier against the population
of groups.

100 TB shape: ONE scan with map-side partial aggregation down to one
row per group, an unpartitioned window over the group-sized frame for
the population stats, and a group-sized select — no second scan, no
driver loop, fully lazy. The
group count (sources, days, shards: 10^2-10^5) is what bounds every
post-scan step, so this costs the same as any single groupBy at any
corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["group_metric_anomalies"]


def group_metric_anomalies(
    df: DataFrame,
    *,
    group_col: str,
    metric_expr: str,
    k: float = 3.0,
) -> DataFrame:
    """Per-group metric + z-score vs the population of groups.

    ``metric_expr`` is any Spark SQL aggregate expression (e.g.
    ``avg(o_totalprice)``, ``count(*)``,
    ``count_if(n_tok = 0) / count(*)``); ``group_col`` any grouping
    expression's column name (pre-compute ``date_trunc`` etc. into a
    column first). A group is ``is_anomaly`` when
    ``|metric − mean| > k · stddev`` where mean/stddev (sample) are
    over the per-group metrics. NULL metrics (e.g. ``avg`` of an
    all-NULL slice) are flagged unconditionally — "couldn't establish
    the metric" is an anomaly, matching the engine's NULL-fails check
    semantics — and excluded from the population stats. With fewer
    than 2 non-null groups (stddev undefined) or zero spread, only
    NULL-metric groups flag.

    Returns (group, metric, z, is_anomaly) ordered by group for
    deterministic comparison.
    """
    per = df.groupBy(F.col(group_col).alias("group")).agg(
        F.expr(metric_expr).cast("double").alias("metric")
    )
    # Population stats via an unpartitioned window, NOT agg + crossJoin:
    # a self-join on an aggregate of `per` would rescan the corpus twice
    # (caught by the r3 plan audit). The window touches only the
    # group-sized frame — one task over 10^2-10^5 rows.
    w = Window.partitionBy()
    mu = F.avg("metric").over(w)
    sd = F.stddev_samp("metric").over(w)
    z = F.when(
        F.col("metric").isNotNull() & (sd > 0),
        (F.col("metric") - mu) / sd,
    )
    return (
        per.select(
            "group",
            F.round("metric", 6).alias("metric"),
            F.round(z, 6).alias("z"),
            (
                F.col("metric").isNull()
                | F.coalesce(F.abs(z) > F.lit(float(k)), F.lit(False))
            ).alias("is_anomaly"),
        )
        .orderBy("group")
    )
