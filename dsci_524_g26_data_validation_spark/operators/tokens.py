"""E5/E6 — token-array invariants on the pre-tokenized sequence table.

* E5 ``n_tok == size(tokens)``: pure Catalyst filter — no UDF, codegen
  applies, the parquet reader only decodes the two columns involved.
* E6 per-row token-array equality vs a reference table: join on
  ``doc_id`` then a **vectorized Arrow pandas UDF** (BASELINE.json:15
  mandates the Arrow/pandas-UDF form, no per-row Python). The UDF body
  works on flattened token buffers: per row it touches O(1) Python
  objects (length bookkeeping); all token comparisons are single numpy
  vector ops over the concatenated buffers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

__all__ = [
    "ntok_invariant_violations",
    "arrays_equal_udf",
    "token_equality_violations",
    "token_equality_report",
]


def ntok_invariant_violations(
    df: DataFrame, *, n_col: str = "n_tok", arr_col: str = "tokens"
) -> DataFrame:
    """Rows violating ``n_tok == size(tokens)`` (E5). Pure Catalyst —
    NULL array counts as size -1 per Spark semantics, which violates any
    non-negative n_tok, i.e. NULL tokens are flagged (desired)."""
    return df.filter(F.col(n_col) != F.size(F.col(arr_col)))


# type instance (not DDL string) so import needs no active SparkSession
@pandas_udf(BooleanType())
def arrays_equal_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized equality of two array<int> columns (Arrow batches).

    Token-level work is numpy-vectorized over the flattened buffers;
    Python-level work is one length lookup per row (not per token).
    NULL handling: both NULL → equal; one NULL → not equal.
    """
    n = len(a)
    null_a = a.isna().to_numpy()
    null_b = b.isna().to_numpy()
    out = np.zeros(n, dtype=bool)
    out[null_a & null_b] = True
    both = ~null_a & ~null_b
    if both.any():
        av = a[both].to_numpy()
        bv = b[both].to_numpy()
        la = np.fromiter((len(x) for x in av), dtype=np.int64, count=len(av))
        lb = np.fromiter((len(x) for x in bv), dtype=np.int64, count=len(bv))
        same_len = la == lb
        eq = same_len.copy()
        if same_len.any():
            lens = la[same_len]
            fa = np.concatenate([np.asarray(x) for x in av[same_len]] or [[]])
            fb = np.concatenate([np.asarray(x) for x in bv[same_len]] or [[]])
            bad = np.zeros(int(same_len.sum()), dtype=bool)
            if fa.size:
                diff = fa != fb
                starts = np.cumsum(lens) - lens
                nonzero = lens > 0  # zero-length rows compare equal
                if nonzero.any():
                    seg = np.add.reduceat(diff, starts[nonzero])
                    bad[nonzero] = seg > 0
            eq[same_len] = ~bad
        out[np.flatnonzero(both)] = eq
    return pd.Series(out)


def token_equality_violations(
    df: DataFrame,
    reference: DataFrame,
    *,
    key: str = "doc_id",
    arr_col: str = "tokens",
    verify_with_udf: bool = True,
) -> DataFrame:
    """Rows of ``df`` whose token array differs from ``reference``'s (E6).

    Scale-first two-phase design:

    1. **Hash pre-filter (pure Catalyst).** Each side is reduced to
       ``(key, xxhash64(tokens), size(tokens))`` inside the scan, so the
       equi-join on ``key`` shuffles ~24 bytes/row instead of whole token
       arrays (~1 KB/row at typical sequence lengths — a 40× shuffle
       reduction at 100 TB). A differing hash or length *proves* the
       arrays differ; equal hashes mean equal arrays up to a 2^-64
       collision.
    2. **Arrow-UDF confirmation on candidates only.** The (tiny)
       candidate key set is broadcast back against both tables to fetch
       the actual arrays; the vectorized ``arrays_equal_udf`` re-checks
       them batch-wise. The UDF therefore only ever sees the mismatch
       set, never the full table.

    Inner-join on the key (rows missing from the reference are the
    referential check's job, not this one). NULL-key rows never match and
    are dropped, same as before. Returns (key, n_tok_observed,
    n_tok_reference).
    """
    k, arr = f"`{key}`", f"`{arr_col}`"
    left = df.select(
        F.col(k).alias("_k"),
        F.xxhash64(F.col(arr)).alias("_h_obs"),
        F.size(F.col(arr)).alias("n_tok_observed"),
    )
    right = reference.select(
        F.col(k).alias("_k"),
        F.xxhash64(F.col(arr)).alias("_h_ref"),
        F.size(F.col(arr)).alias("n_tok_reference"),
    )
    cand = (
        left.join(right, on="_k", how="inner")
        .filter(
            (F.col("_h_obs") != F.col("_h_ref"))
            | (F.col("n_tok_observed") != F.col("n_tok_reference"))
        )
        .select(F.col("_k"), "n_tok_observed", "n_tok_reference")
    )
    if not verify_with_udf:
        return cand.withColumnRenamed("_k", key)

    # Phase 2: semi-join the candidate keys (AQE picks broadcast when the
    # set is small — the normal case; falls back to shuffle join when a
    # mass mismatch makes it huge), fetch both arrays, confirm with the
    # mandated Arrow UDF. Pruned scans read only (key, tokens).
    keys = cand.select("_k").distinct()
    obs = df.join(keys, on=df[k] == F.col("_k"), how="left_semi").select(
        F.col(k).alias("_k"), F.col(arr).alias("_obs_tokens")
    )
    ref = reference.join(keys, on=reference[k] == F.col("_k"), how="left_semi").select(
        F.col(k).alias("_k"), F.col(arr).alias("_ref_tokens")
    )
    return (
        obs.join(ref, on="_k", how="inner")
        .withColumn(
            "_eq", arrays_equal_udf(F.col("_obs_tokens"), F.col("_ref_tokens"))
        )
        .filter(~F.col("_eq"))
        .select(
            F.col("_k").alias(key),
            F.size("_obs_tokens").alias("n_tok_observed"),
            F.size("_ref_tokens").alias("n_tok_reference"),
        )
    )


def token_equality_report(
    df: DataFrame, reference: DataFrame, *, key: str = "doc_id", arr_col: str = "tokens"
) -> dict:
    """Driver-side scalar summary for the Issue payload."""
    n_bad = token_equality_violations(df, reference, key=key, arr_col=arr_col).count()
    return {"mismatched_rows": int(n_bad)}
