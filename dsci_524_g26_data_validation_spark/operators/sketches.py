"""Mergeable distinct-count sketches — incremental profiling.

The reference profiles a table by scanning it (`infer.py` semantics);
at 100 TB the table arrives in batches and nobody rescans history. The
Datasketches HLL functions Spark ships (``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate``) make distinct-count
profiling INCREMENTAL: sketch each ingest slice once (a few KB per
column per slice), persist the sketches next to the manifest, and
answer "distinct ids all-time / this quarter / per source" by merging
sketches — no second corpus scan, ever.

The correctness property this module exposes and the driver oracle
checks: EVERY merge shape stays inside the sketch's error bound.
That is deliberately weaker than the claims one might expect, both of
which are measurably FALSE for Spark's Datasketches HLL and would rot
into silent assumptions if left unstated:

* merged ≠ direct: a low-cardinality single sketch sits in exact
  sparse mode while a union promotes to dense estimation (measured
  here: direct 600 vs merged 584 on a 600-distinct column, lg_k=12);
* merge shape is not estimate-invariant: sketches carry an
  order-sensitive HIP estimator, so one big union vs a two-stage
  rollup of the SAME slices can differ by a few counts (measured:
  604 vs 601).

What does hold — and what the consistency report verifies — is that
the direct, one-shot-merged, and staged-merged estimates each land
within the configured tolerance of the exact count, so day→month→year
rollups are safe to any depth. Relative standard error ≈
1.04/√2^lg_k, ~1.6 % at the default lg_k=12.

Scale shape: one scan computes every column's per-slice sketch in one
fused groupBy (map-side combined — sketches merge associatively, so the
exchange carries one ~2^lg_k-byte sketch per column per slice per
partition); merging runs over the slice-count-sized sketch frame.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "distinct_sketches",
    "merged_distinct_estimates",
    "sketch_consistency_report",
]


def _sk(col: str) -> str:
    return f"{col}__hll"


def _sketch_input(df: DataFrame, col: str):
    """``hll_sketch_agg`` accepts int/bigint/string/binary only; every
    other type is fed through a string cast, which is injective for
    the types a profile meets (timestamps render to full precision,
    dates/decimals/booleans uniquely) — so distinct counts are
    preserved. Floats note: distinct-by-rendering equals distinct-by-
    value except the 0.0/−0.0 pair, which SQL DISTINCT also conflates.
    """
    dt = df.schema[col].dataType.simpleString()
    c = F.col(f"`{col}`")
    if dt in ("int", "bigint", "string", "binary"):
        return c
    return c.cast("string")


def distinct_sketches(
    df: DataFrame,
    cols: Sequence[str],
    *,
    slice_col: Optional[str] = None,
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch per column (per slice) — the persistable artifact.

    Returns (slice?, <col>__hll binary, n_rows). Write this next to the
    checkpoint manifest at ingest; it is a few KB per column per slice
    regardless of slice size. ``lg_k`` must be held constant across
    slices that will ever merge (union at differing lg_k degrades to
    the smaller — this engine pins it instead of allowing silent
    precision loss).
    """
    aggs = [
        F.hll_sketch_agg(_sketch_input(df, c), int(lg_k)).alias(_sk(c))
        for c in cols
    ] + [F.count(F.lit(1)).alias("n_rows")]
    if slice_col is None:
        return df.agg(*aggs)
    return df.groupBy(slice_col).agg(*aggs)


def merged_distinct_estimates(
    sketches: DataFrame, cols: Sequence[str]
) -> DataFrame:
    """Union per-slice sketches → one row of distinct estimates.

    Input is :func:`distinct_sketches` output (any subset of slices —
    that's the point: estimate any time-range/source union without
    touching data). One row: <col> bigint estimate per column +
    ``n_rows`` total.
    """
    return sketches.agg(
        *[
            F.hll_sketch_estimate(F.hll_union_agg(F.col(_sk(c)))).alias(c)
            for c in cols
        ],
        F.sum("n_rows").alias("n_rows"),
    )


def sketch_consistency_report(
    df: DataFrame,
    cols: Sequence[str],
    *,
    slice_col: str,
    lg_k: int = 12,
    tolerance: float = 0.05,
) -> DataFrame:
    """Per-column audit of the incremental-profiling contract:
    (column, exact_distinct, direct_estimate, merged_estimate,
    two_stage_estimate, direct_within_tolerance,
    merged_within_tolerance, two_stage_within_tolerance).

    Three estimation paths — a direct whole-table sketch, a one-shot
    union of the per-slice sketches, and a two-stage rollup (first
    slice re-unioned with the merged rest via ``hll_union``) — each
    verified independently against the exact count:
    |estimate − exact| / exact ≤ ``tolerance`` (exact-0 columns compare
    estimate == 0). The paths legitimately differ from each other by a
    few counts (sparse-mode promotion + the order-sensitive HIP
    estimator — module docstring), which is WHY the contract is
    per-path bounds, not cross-path equality.

    Costs one exact-distinct scan (the audit's ground truth — run this
    on a sample slice, not the 100 TB table; production uses the
    sketches alone) plus the sketch passes.
    """
    # each 1-row frame below is referenced once PER COLUMN in the report
    # union — checkpoint them or every column branch re-runs its full
    # corpus scan (C columns would cost 2C+1 scans instead of 3)
    direct = distinct_sketches(df, cols, lg_k=lg_k).localCheckpoint()
    per_slice = distinct_sketches(
        df, cols, slice_col=slice_col, lg_k=lg_k
    ).localCheckpoint()  # tiny (one row per slice); reused by 3 plans below
    merged = merged_distinct_estimates(per_slice, cols).localCheckpoint()
    # two-stage merge: min slice separately, remainder separately, then
    # a binary hll_union of the two partial sketches
    first_slice = per_slice.orderBy(slice_col).limit(1)
    rest = per_slice.join(
        first_slice.select(slice_col), slice_col, "left_anti"
    )
    def _partial(frame, c, alias):
        return frame.agg(F.hll_union_agg(F.col(_sk(c))).alias(alias))
    exact = df.agg(
        *[F.count_distinct(F.col(f"`{c}`")).alias(c) for c in cols]
    ).localCheckpoint()
    def _tol(est, ex):
        return (
            F.when(
                ex > 0, (F.abs(est - ex) / ex) <= F.lit(float(tolerance))
            )
            .otherwise(est == 0)
        )
    rows = []
    for c in cols:
        two_stage = (
            _partial(first_slice, c, "_a")
            .join(_partial(rest, c, "_b"))
            .select(
                F.lit(c).alias("column"),
                F.hll_sketch_estimate(
                    F.hll_union(F.col("_a"), F.col("_b"), True)
                ).alias("two_stage_estimate"),
            )
        )
        d = direct.select(
            F.lit(c).alias("column"),
            F.hll_sketch_estimate(F.col(_sk(c))).alias("direct_estimate"),
        )
        m = merged.select(
            F.lit(c).alias("column"),
            F.col(f"`{c}`").alias("merged_estimate"),
        )
        e = exact.select(
            F.lit(c).alias("column"),
            F.col(f"`{c}`").cast("bigint").alias("exact_distinct"),
        )
        rows.append(
            e.join(d, "column")
            .join(m, "column")
            .join(two_stage, "column")
            .select(
                "column",
                "exact_distinct",
                "direct_estimate",
                "merged_estimate",
                "two_stage_estimate",
                _tol(
                    F.col("direct_estimate"), F.col("exact_distinct")
                ).alias("direct_within_tolerance"),
                _tol(
                    F.col("merged_estimate"), F.col("exact_distinct")
                ).alias("merged_within_tolerance"),
                _tol(
                    F.col("two_stage_estimate"), F.col("exact_distinct")
                ).alias("two_stage_within_tolerance"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("column")
