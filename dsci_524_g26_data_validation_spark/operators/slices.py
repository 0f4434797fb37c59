"""Slice finder: which data slices are confidently the worst?

When a contract fails on a 100 TB table, "6 M range violations" is not
actionable — "source=cc_2019, lang=und has a 34% violation rate" is.
This operator ranks (dimension, value) slices by the LOWER bound of the
95% Wilson interval of their violation rate, so small noisy slices
can't outrank large confidently-bad ones (the same
heavy-slice-triage idea as SliceFinder, Chung et al., ICDE 2019 —
re-expressed as two Catalyst jobs, no search loop).

At-scale shape: ONE scan, ONE shuffle for ALL dimensions. Each row is
melted to ``len(dims)`` (dim, value) pairs via an inline array-explode
*after* the row's violation bit is computed once; the partial aggregate
collapses pairs per partition, so the exchange carries O(distinct
slices), not O(rows·dims). Top-k is a TakeOrderedAndProject (no global
sort). The violation predicate stays a Catalyst expression — adding
dimensions never adds scans.

NULL semantics: a NULL invariant evaluation is a violation ("couldn't
establish the property", engine-wide stance); a NULL dimension value is
a real slice (rendered as NULL, often the worst one!).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import wilson_interval_cols

__all__ = ["slice_violation_report"]


def slice_violation_report(
    df: DataFrame,
    invariant: str,
    dims: Sequence[str],
    *,
    min_rows: int = 1,
    k: Optional[int] = None,
) -> DataFrame:
    """Per-slice violation triage over every ``dims`` column at once.

    invariant: Spark SQL boolean expression that must hold per row
    (violated = ``NOT coalesce(invariant, false)`` — NULL fails).

    Returns (dim, value, n, violations, rate, rate_lo) with value cast
    to string (NULL preserved), ordered worst-first by ``rate_lo``
    (Wilson 95% lower bound) with a deterministic (dim, value)
    tiebreak; ``k`` limits to the top slices, ``min_rows`` suppresses
    slices too small to act on.
    """
    if not dims:
        raise ValueError("slice_violation_report requires at least one dim")
    viol = F.coalesce(~F.expr(invariant), F.lit(True))
    pairs = F.array(
        *[
            F.struct(
                F.lit(d).alias("dim"),
                F.col(f"`{d}`").cast("string").alias("value"),
            )
            for d in dims
        ]
    )
    melted = df.select(viol.alias("_v"), F.explode(pairs).alias("s"))
    g = (
        melted.groupBy(F.col("s.dim").alias("dim"), F.col("s.value").alias("value"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.count_if(F.col("_v")).cast("bigint").alias("violations"),
        )
        .filter(F.col("n") >= min_rows)
    )
    p, center, half = wilson_interval_cols(F.col("n"), F.col("violations"))
    out = g.select(
        "dim",
        "value",
        "n",
        "violations",
        F.round(p, 9).alias("rate"),
        F.round(F.greatest(center - half, F.lit(0.0)), 9).alias("rate_lo"),
    ).orderBy(F.col("rate_lo").desc(), "dim", "value")
    return out.limit(k) if k is not None else out
