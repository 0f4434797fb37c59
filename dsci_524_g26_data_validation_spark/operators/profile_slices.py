"""Incremental profiling — mergeable per-slice sufficient statistics.

``infer_profile`` answers "what does this table look like?" with one
fused scan; at 100 TB with daily appends nobody re-runs that scan over
all of history. This module makes the profile INCREMENTAL the same way
``operators.sketches`` made distinct counts incremental:

* :func:`profile_partials` — ONE fused scan over a slice (an ingest
  batch, a day partition) emits one tiny row per column of mergeable
  sufficient statistics: ``n, n_null, min, max, sum, sum_sq`` plus an
  HLL distinct sketch. All of them merge exactly or within the
  sketch's error bound — the engine persists these rows next to the
  checkpoint manifest at a few hundred bytes per column per slice.
* :func:`merge_profile_partials` — folds ANY subset of slice rows
  (all-time, this quarter, one source) into the same per-column shape
  by pure aggregation: counts/sums add, min/min and max/max fold,
  sketches union. Associative and commutative, so day→month→year
  rollups are safe to any depth.
* :func:`profile_report` — decodes merged partials into the familiar
  profile surface (null_frac, mean, stddev via the sum-of-squares
  identity, approx_distinct) WITHOUT touching the corpus.

What deliberately does NOT merge: quantiles (the fused profile's GK
sketch is not exposed as a mergeable value by Spark SQL — claiming
mergeable quantiles here would be a lie; use per-slice histograms via
``drift.capture_histograms`` with fixed bin edges, whose counts add
exactly) and categorical domains (merge per-slice ``collect_set``
output instead — it is already a set union).

Numeric stability note: ``sum_sq`` accumulates in double; for values
up to ~1e9 over 10^12 rows the running sum stays ≤ 1e30, within
double's range, and variance uses the centered form
``(sum_sq − sum²/n) / (n−1)`` clamped at 0 to absorb the cancellation
error a one-pass identity admits.

Scale shape: one partial+final HashAggregate per slice scan (the
exchange carries ONE row of struct-typed accumulators per partition);
merging aggregates the slice-rows frame, which is O(slices) rows —
no corpus access, ever.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "profile_partials",
    "merge_profile_partials",
    "profile_report",
]

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def _is_numeric(dt: T.DataType) -> bool:
    return isinstance(dt, _NUMERIC)


def _sketch_col(df: DataFrame, c: str):
    # single source of truth for the injective-cast policy: merged
    # sketches are only comparable across operators if both sides cast
    # identically
    from .sketches import _sketch_input

    return _sketch_input(df, c)


def profile_partials(
    df: DataFrame,
    cols: Optional[Sequence[str]] = None,
    *,
    slice_id: str = "",
    lg_k: int = 12,
) -> DataFrame:
    """One fused scan → one mergeable stats row per column.

    Output rows: ``(slice_id, column, dtype, n, n_null, min, max, sum,
    sum_sq, hll binary)`` — min/max/sum/sum_sq are NULL for
    non-numeric columns (min/max over strings would merge fine but
    collide with the numeric decode downstream; keep the row honest).
    ``slice_id`` labels the slice for lineage; merging ignores it.
    ``lg_k`` must be pinned across slices that will ever merge (same
    policy as :func:`~.sketches.distinct_sketches`).

    The scan computes every column's terms in ONE ``df.agg`` (a single
    partial+final HashAggregate); the per-column rows are unpivoted
    from that one result row driver-side — no second job.
    """
    if cols is None:
        cols = [f.name for f in df.schema.fields]
    if not cols:
        raise ValueError("cols must be non-empty")
    terms = []
    for c in cols:
        q = F.col(f"`{c}`")
        dt = df.schema[c].dataType
        terms.append(F.count(F.lit(1)).alias(f"{c}__n"))
        terms.append(F.count_if(q.isNull()).alias(f"{c}__n_null"))
        if _is_numeric(dt):
            d = q.cast("double")
            terms.append(F.min(d).alias(f"{c}__min"))
            terms.append(F.max(d).alias(f"{c}__max"))
            terms.append(F.sum(d).alias(f"{c}__sum"))
            terms.append(F.sum(d * d).alias(f"{c}__sum_sq"))
        terms.append(
            F.hll_sketch_agg(_sketch_col(df, c), int(lg_k)).alias(f"{c}__hll")
        )
    row = df.agg(*terms).collect()[0]

    out = []
    for c in cols:
        dt = df.schema[c].dataType
        out.append(
            {
                "slice_id": slice_id,
                "column": c,
                "dtype": dt.simpleString(),
                "n": row[f"{c}__n"],
                "n_null": row[f"{c}__n_null"],
                "min": row[f"{c}__min"] if _is_numeric(dt) else None,
                "max": row[f"{c}__max"] if _is_numeric(dt) else None,
                "sum": row[f"{c}__sum"] if _is_numeric(dt) else None,
                "sum_sq": row[f"{c}__sum_sq"] if _is_numeric(dt) else None,
                "hll": bytes(row[f"{c}__hll"]),
            }
        )
    schema = (
        "slice_id string, column string, dtype string, n bigint, "
        "n_null bigint, min double, max double, sum double, "
        "sum_sq double, hll binary"
    )
    return df.sparkSession.createDataFrame(out, schema)


def merge_profile_partials(partials: DataFrame) -> DataFrame:
    """Fold slice rows per column: counts/sums add, bounds fold,
    sketches union. Input is any union/subset of
    :func:`profile_partials` outputs; mixing dtypes for one column
    (schema drifted between slices) raises rather than merging apples
    into oranges."""
    merged = partials.groupBy("column").agg(
        F.count_distinct("dtype").alias("_ndt"),
        F.min("dtype").alias("dtype"),
        F.sum("n").alias("n"),
        F.sum("n_null").alias("n_null"),
        F.min("min").alias("min"),
        F.max("max").alias("max"),
        F.sum("sum").alias("sum"),
        F.sum("sum_sq").alias("sum_sq"),
        F.hll_union_agg("hll").alias("hll"),
        F.count(F.lit(1)).alias("n_slices"),
    )
    bad = merged.filter(F.col("_ndt") > 1).select("column").collect()
    if bad:
        names = sorted(r["column"] for r in bad)
        raise ValueError(
            f"dtype drifted across slices for columns {names}; re-profile "
            "or reconcile the schema before merging"
        )
    return merged.drop("_ndt")


def profile_report(merged: DataFrame) -> DataFrame:
    """Decode merged partials into the profile surface — all derived
    driver-free from the O(columns) merged frame:

    ``(column, dtype, n, n_null, null_frac, min, max, mean, stddev,
    approx_distinct, n_slices)``; mean/stddev NULL for non-numeric
    columns and for n−n_null < 2 where variance is undefined."""
    nn = F.col("n") - F.col("n_null")
    mean = F.when(nn > 0, F.col("sum") / nn)
    raw_var = (F.col("sum_sq") - (F.col("sum") * F.col("sum")) / nn) / (nn - 1)
    # clamp cancellation-negative variance to 0 — but via when(), not
    # greatest(): greatest(NULL, 0.0) is 0.0, which would mint a fake
    # stddev for non-numeric columns whose sums are honestly NULL
    var = F.when(nn > 1, F.when(raw_var < 0, F.lit(0.0)).otherwise(raw_var))
    return merged.select(
        "column",
        "dtype",
        "n",
        "n_null",
        F.when(F.col("n") > 0, F.col("n_null") / F.col("n")).alias("null_frac"),
        "min",
        "max",
        mean.alias("mean"),
        F.sqrt(var).alias("stddev"),
        F.hll_sketch_estimate("hll").alias("approx_distinct"),
        "n_slices",
    )
