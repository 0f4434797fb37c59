"""Benford first-significant-digit conformance (fraud/corruption smell
test for numeric columns).

Naturally-occurring magnitude-spanning quantities (prices, populations,
file sizes) follow Benford's law: P(first digit = d) = log10(1 + 1/d).
Systematic deviation flags fabricated, truncated, clipped, or
unit-mangled data — a distribution-level validation check that
complements the engine's histogram drift suite (operators/drift.py)
with an expected distribution that needs NO baseline capture.

Determinism contract: the first digit is extracted from the column's
**fixed-point integer units** (``CAST(round(x*scale) AS BIGINT)``, the
same trick operators/reconcile.py uses) via the bigint's decimal string
— never via ``log10``/``pow`` double math, whose last-ulp differences
across engines flip digits at decade boundaries (100 → digit 1 vs 9).
Expected fractions are embedded as full-precision Python literals so
the oracle SQL carries the identical constants.

At-scale shape: ONE scan (groupBy of a 9-value key; partial aggregation
collapses to ≤10 rows per partition), then literal-frame joins and an
unpartitioned window over ≤9 rows — no second pass over the data.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["BENFORD_EXPECTED", "first_digit_expr", "benford_report", "benford_stat"]

#: P(first digit = d), full double precision; repr() of these literals
#: is what the oracle SQL embeds.
BENFORD_EXPECTED = {d: math.log10(1.0 + 1.0 / d) for d in range(1, 10)}


def first_digit_expr(col: Column | str, *, scale: int = 100) -> Column:
    """First significant digit of ``round(col * scale)`` as an int;
    NULL for NULL/zero values (excluded from the distribution)."""
    c = F.col(col) if isinstance(col, str) else col
    units = F.abs(F.round(c * scale).cast("bigint"))
    return F.when(
        c.isNotNull() & (units > 0),
        F.substring(units.cast("string"), 1, 1).cast("int"),
    )


def benford_report(df: DataFrame, col: str, *, scale: int = 100) -> DataFrame:
    """Per-digit conformance: (digit, n, observed_frac, expected_frac,
    chi2_term) for digits 1-9 — digits absent from the data appear with
    n = 0. ``chi2_term`` is n_total·(o-e)²/e; sum them for the
    chi-square statistic (8 degrees of freedom)."""
    counts = (
        df.select(first_digit_expr(F.col(f"`{col}`"), scale=scale).alias("digit"))
        .filter(F.col("digit").isNotNull())
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    spark = df.sparkSession
    expected = spark.createDataFrame(
        [(d, BENFORD_EXPECTED[d]) for d in range(1, 10)],
        "digit int, expected_frac double",
    )
    j = expected.join(counts, on="digit", how="left").select(
        "digit",
        F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"),
        "expected_frac",
    )
    w = Window.partitionBy()  # ≤9 rows: the unpartitioned window is free
    total = F.sum("n").over(w)
    # guard total = 0 (all-NULL / all-zero column): observed_frac and
    # chi2_term degrade to NULL instead of raising ANSI DIVIDE_BY_ZERO —
    # a validation operator must report on empty input, never abort
    obs = F.when(total > 0, F.col("n") / total)
    chi2 = total * (obs - F.col("expected_frac")) * (obs - F.col("expected_frac")) / F.col("expected_frac")
    return (
        j.select(
            "digit",
            "n",
            F.round(obs, 9).alias("observed_frac"),
            F.round(F.col("expected_frac"), 9).alias("expected_frac"),
            F.round(chi2, 6).alias("chi2_term"),
        )
        .orderBy("digit")
    )


def benford_stat(df: DataFrame, col: str, *, scale: int = 100) -> dict:
    """Driver-side verdict numbers: chi_square (8 dof) and MAD (mean
    absolute deviation of observed vs expected fractions — Nigrini's
    conformance bands: <0.006 close, <0.012 acceptable, <0.015
    marginal). One tiny collect of 9 rows."""
    rows = benford_report(df, col, scale=scale).collect()
    n = sum(r["n"] for r in rows)
    if n == 0:  # empty/all-NULL column: report a neutral verdict
        return {"chi_square": 0.0, "mad": 0.0, "n": 0}
    chi_square = sum(r["chi2_term"] for r in rows)
    mad = sum(abs(r["observed_frac"] - r["expected_frac"]) for r in rows) / 9.0
    return {"chi_square": chi_square, "mad": mad, "n": n}
