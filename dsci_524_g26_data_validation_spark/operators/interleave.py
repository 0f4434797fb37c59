"""Training-order interleaving quality (shard mixing census).

Validation the *loader's-eye view* of a sharded corpus that composition
reports can't see: two shards with identical source mixtures can still
train very differently if one interleaves sources finely and the other
is a few giant same-source blocks — gradient batches then see long
single-source streaks (the "ordering matters" result of curriculum /
data-ordering studies; the shuffle-quality check every large pretraining
run does before committing shards).

:func:`interleaving_census` reports, per shard, both failure modes:

* **composition skew** — source entropy (bits) and Jensen–Shannon
  divergence of the shard's source mix vs the global corpus mix (same
  0.5·p·log2(p/m) form as ``operators/drift.py``);
* **clumping** — run-length statistics of consecutive same-source rows
  in training order (n_runs, mean_run, max_run): a shard can match the
  global mixture perfectly and still be one giant run per source.

At-scale shape: ONE corpus scan and ONE corpus-sized exchange (the hash
partition on the shard key that any order-sensitive statistic needs),
then a window + running-sum collapses each shard to its runs frame
(|runs| rows, localCheckpointed because three derivations read it);
counts, entropy, and JS all derive from the runs frame — the corpus is
never re-read or re-shuffled. Absent sources contribute the closed-form
0.5·q to JS (p=0 ⇒ m=q/2), so no shard×source scaffold frame is built.
When the input is the ``write_shards`` read-back the data is already
laid out by shard, and the exchange carries the one partition column.

``order_col`` must be unique within a shard (doc_id, row offset): the
running-sum run ids use the SQL-standard RANGE frame, so duplicate
order keys would merge rows into one frame step in BOTH engines.
NULL sources form their own run group (null-safe comparison).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["interleaving_census"]


def interleaving_census(
    df: DataFrame,
    *,
    shard_col: str = "shard",
    order_col: str,
    source_col: str = "source",
) -> DataFrame:
    """Per-shard mixing report: ``(shard, n_rows, n_sources, n_runs,
    mean_run, max_run, entropy, js_vs_global)``, ordered by shard.

    ``entropy`` is the Shannon entropy (bits) of the shard's source
    distribution; ``js_vs_global`` the Jensen–Shannon divergence (bits,
    0..1) between the shard's mix and the whole corpus's; ``max_run``
    the longest streak of consecutive same-source rows in ``order_col``
    order. See module docstring for the single-scan shape.
    """
    shard = F.col(shard_col)
    source = F.col(source_col)

    w = Window.partitionBy(shard_col).orderBy(order_col)
    rn = F.row_number().over(w)
    prev = F.lag(source_col).over(w)
    boundary = F.when(rn == 1, F.lit(1)).otherwise(
        F.when(source.eqNullSafe(prev), F.lit(0)).otherwise(F.lit(1))
    )
    run_id = F.sum(boundary).over(w)  # running sum: RANGE unbounded..current

    # corpus collapses to its runs frame here — one (shard, run_id,
    # source, run_len) row per streak; three aggregates below read it
    runs = (
        df.select(shard, source, run_id.alias("_run"))
        .groupBy(shard_col, "_run", source_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("_len"))
    ).localCheckpoint()

    per_shard_runs = runs.groupBy(shard_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_runs"),
        F.max("_len").alias("max_run"),
    )

    counts = runs.groupBy(shard_col, source_col).agg(
        F.sum("_len").alias("_n")
    )
    wsh = Window.partitionBy(shard_col)
    p = F.col("_n").cast("double") / F.sum("_n").over(wsh).cast("double")
    counts = counts.withColumn("_p", p)

    shard_stats = counts.groupBy(shard_col).agg(
        F.sum("_n").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_sources"),
        # + 0.0 normalizes IEEE -0.0 (all-one-source shard) so the
        # value renders identically to the SQL oracle's
        F.round(-F.sum(F.col("_p") * F.log2("_p")) + F.lit(0.0), 6).alias(
            "entropy"
        ),
    )

    # global mix q, |sources| rows — broadcast against the counts frame
    gtot = Window.partitionBy()
    q = (
        counts.groupBy(source_col)
        .agg(F.sum("_n").alias("_gn"))
        .select(
            F.col(source_col).alias("_qsrc"),
            (
                F.col("_gn").cast("double")
                / F.sum("_gn").over(gtot).cast("double")
            ).alias("_q"),
        )
    )
    joined = counts.join(
        F.broadcast(q), counts[source_col].eqNullSafe(q["_qsrc"]), "inner"
    )
    pm = F.col("_p")
    qm = F.col("_q")
    m = (pm + qm) / 2
    term = F.when(pm > 0, F.lit(0.5) * pm * F.log2(pm / m)).otherwise(
        F.lit(0.0)
    ) + F.when(qm > 0, F.lit(0.5) * qm * F.log2(qm / m)).otherwise(F.lit(0.0))
    # sources ABSENT from the shard: p=0 ⇒ m=q/2 ⇒ the pair contributes
    # 0.5·q·log2(2) = 0.5·q — folded in closed form over the q mass the
    # shard does NOT cover, so no shard×source scaffold is ever built
    js = joined.groupBy(shard_col).agg(
        F.round(
            F.sum(term) + F.lit(0.5) * (F.lit(1.0) - F.sum(qm)) + F.lit(0.0),
            6,
        ).alias("js_vs_global")
    )

    return (
        shard_stats.join(per_shard_runs, shard_col)
        .join(js, shard_col)
        .select(
            shard_col,
            "n_rows",
            "n_sources",
            "n_runs",
            F.round(
                F.col("n_rows").cast("double")
                / F.col("n_runs").cast("double"),
                6,
            ).alias("mean_run"),
            "max_run",
            "entropy",
            "js_vs_global",
        )
        .orderBy(shard_col)
    )
