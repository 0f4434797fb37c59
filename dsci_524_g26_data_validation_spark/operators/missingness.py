"""Structured-missingness analysis: null patterns and co-missingness.

The reference checks missingness one column at a time
(``validate_contract.py`` max_missing_frac); real corpora fail in
CORRELATED ways — an upstream joiner drops a whole struct, so five
columns go null together. Two views, both single-scan:

* ``null_patterns`` — the per-row null indicator vector as a compact
  '0'/'1' string key, grouped and ranked. The shuffle key is ≤ one byte
  per analyzed column and the distinct-pattern count is bounded by the
  data's real structure (collapsed map-side), so this is a tiny shuffle
  at any corpus size; top-k plans as TakeOrderedAndProject.
* ``comissingness`` — for every column pair: marginal null counts,
  joint null count, lift (observed joint / expected-under-independence)
  and Jaccard overlap. ONE fused aggregation (k + k(k+1)/2 count_if
  terms, zero shuffle beyond the 1-row agg); the pair table is then
  unpivoted from that single row with explode — no collect, no second
  scan. Quadratic in columns, constant in rows: fine for the tens of
  analyzed columns a contract names, which is the intended use.

Lift semantics: > 1 ⇒ the columns go missing together more often than
independence predicts (a shared upstream cause); NULL when either
marginal is zero (lift undefined — nothing ever missing on one side).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["null_patterns", "comissingness"]


def _check_cols(df: DataFrame, cols) -> list:
    cols = list(cols) if cols is not None else list(df.columns)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in input: {missing}")
    if not cols:
        raise ValueError("no columns to analyze")
    return cols


def null_patterns(
    df: DataFrame,
    *,
    cols: Optional[Sequence[str]] = None,
    top_k: int = 20,
) -> DataFrame:
    """Top-k row null-patterns: ``(pattern, n_rows, frac)``.

    ``pattern`` holds one character per analyzed column in the given
    order — '1' where the cell is NULL. The all-'0' pattern (complete
    rows) is included so ``frac`` is interpretable directly."""
    cols = _check_cols(df, cols)
    pat = F.concat(
        *[
            F.when(F.col(f"`{c}`").isNull(), F.lit("1")).otherwise(F.lit("0"))
            for c in cols
        ]
    )
    counted = (
        df.select(pat.alias("pattern"))
        .groupBy("pattern")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    # unpartitioned window over the DISTINCT-PATTERN frame (tiny by
    # construction), not the corpus — same shape as the drift totals
    total = F.sum("n_rows").over(Window.partitionBy())
    return (
        counted.withColumn(
            "frac", F.round(F.col("n_rows") / total, 6)
        )
        .orderBy(F.desc("n_rows"), "pattern")
        .limit(top_k)
    )


def comissingness(
    df: DataFrame, *, cols: Optional[Sequence[str]] = None
) -> DataFrame:
    """Pairwise co-missingness: ``(col_a, col_b, n_a, n_b, n_both,
    lift, jaccard)`` for every unordered column pair (a < b by the
    given order).

    One fused aggregation computes every marginal and joint null count
    in a single scan; the pair frame is unpivoted from that 1-row
    result with explode — never a second pass over the data."""
    cols = _check_cols(df, cols)
    if len(cols) < 2:
        raise ValueError("comissingness needs at least 2 columns")
    isnull = {c: F.col(f"`{c}`").isNull() for c in cols}
    aggs = [F.count(F.lit(1)).alias("_n")]
    aggs += [F.count_if(isnull[c]).alias(f"_m_{i}") for i, c in enumerate(cols)]
    pairs = [(i, j) for i in range(len(cols)) for j in range(i + 1, len(cols))]
    aggs += [
        F.count_if(isnull[cols[i]] & isnull[cols[j]]).alias(f"_j_{i}_{j}")
        for i, j in pairs
    ]
    one = df.agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(cols[i]).alias("col_a"),
                F.lit(cols[j]).alias("col_b"),
                F.col(f"_m_{i}").alias("n_a"),
                F.col(f"_m_{j}").alias("n_b"),
                F.col(f"_j_{i}_{j}").alias("n_both"),
            )
            for i, j in pairs
        ]
    )
    p = one.select(F.col("_n"), F.explode(structs).alias("p")).select(
        "p.*", "_n"
    )
    lift = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0),
        F.round(
            F.col("n_both").cast("double") * F.col("_n")
            / (F.col("n_a").cast("double") * F.col("n_b")),
            6,
        ),
    )
    jac = F.when(
        F.col("n_a") + F.col("n_b") - F.col("n_both") > 0,
        F.round(
            F.col("n_both").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_both")),
            6,
        ),
    ).otherwise(F.lit(None).cast("double"))
    return p.select(
        "col_a", "col_b", "n_a", "n_b", "n_both",
        lift.alias("lift"), jac.alias("jaccard"),
    )
