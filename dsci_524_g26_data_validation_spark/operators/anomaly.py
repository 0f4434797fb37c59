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

__all__ = ["group_metric_anomalies", "cohort_compare"]


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


def cohort_compare(
    df: DataFrame,
    *,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """ONE-row two-cohort comparison of a numeric column →
    (n_a, n_b, mean_a, mean_b, var_a, var_b, mean_diff, cohens_d,
    welch_t, welch_df).

    The A/B question behind every slice report ("web docs score lower
    than books — is that real or noise?"): Welch's unequal-variance t
    statistic (compare |t| to ≈1.96 for the usual 5% level; no p-value
    is emitted because the t CDF isn't closed-form and the engine ships
    no scipy) plus Cohen's d for the effect SIZE — a huge corpus makes
    any difference "significant", d says whether it matters.

    Everything derives from the 6 sufficient statistics (n, Σx, Σx²
    per cohort) computed in ONE scan over the two groups (the filter
    pushes into the scan), with variances in the explicit closed form
    so the oracle reproduces them bit-for-bit — never an engine's own
    stddev implementation. Cohorts with n < 2 yield NULL inference
    columns instead of dividing by zero; NULL values are excluded
    (pairwise-complete, like the correlation census).
    """
    g = F.col(f"`{group_col}`").cast("string")
    v = F.col(f"`{value_col}`").cast("double")
    side_a = g == F.lit(str(group_a))
    side_b = g == F.lit(str(group_b))
    pick = lambda cond, expr: F.sum(F.when(cond & v.isNotNull(), expr))  # noqa: E731
    agg = df.filter(side_a | side_b).agg(
        F.coalesce(pick(side_a, F.lit(1)), F.lit(0)).alias("n_a"),
        F.coalesce(pick(side_b, F.lit(1)), F.lit(0)).alias("n_b"),
        pick(side_a, v).alias("_sa"),
        pick(side_b, v).alias("_sb"),
        pick(side_a, v * v).alias("_qa"),
        pick(side_b, v * v).alias("_qb"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ma = F.when(na > 0, F.col("_sa") / na)
    mb = F.when(nb > 0, F.col("_sb") / nb)
    va = F.when(na > 1, (F.col("_qa") - F.col("_sa") * F.col("_sa") / na) / (na - 1))
    vb = F.when(nb > 1, (F.col("_qb") - F.col("_sb") * F.col("_sb") / nb) / (nb - 1))
    se2 = va / na + vb / nb
    welch_t = F.when(se2 > 0, (ma - mb) / F.sqrt(se2))
    welch_df = F.when(
        se2 > 0,
        (se2 * se2)
        / (
            (va / na) * (va / na) / (na - 1)
            + (vb / nb) * (vb / nb) / (nb - 1)
        ),
    )
    pooled = F.when(
        na + nb > 2, ((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)
    )
    cohens_d = F.when(pooled > 0, (ma - mb) / F.sqrt(pooled))
    return agg.select(
        "n_a",
        "n_b",
        F.round(ma, 6).alias("mean_a"),
        F.round(mb, 6).alias("mean_b"),
        F.round(va, 6).alias("var_a"),
        F.round(vb, 6).alias("var_b"),
        F.round(ma - mb, 6).alias("mean_diff"),
        F.round(cohens_d, 6).alias("cohens_d"),
        F.round(welch_t, 6).alias("welch_t"),
        F.round(welch_df, 6).alias("welch_df"),
    )
