"""Deterministic training-shard writer.

The last mile of a 100 TB pipeline: the validated corpus must land as
N size-balanced shards whose membership is REPRODUCIBLE — re-running
the job, resuming after a failure, or rebuilding one shard must produce
the same document→shard mapping, or downstream training-data orderings
(and any per-shard caching) silently change. ``df.repartition(N)``
cannot promise that: round-robin assignment depends on input split
order and partition count.

Design:

* **Assignment is a pure function of the row id** —
  ``portable_hash64(salt ‖ id) mod n_shards`` (the top-60-bits-of-md5
  hash the sampling/mixing operators standardize on), so the mapping is
  stable across runs, engines, resumes, and cluster sizes, and the
  DuckDB oracle reproduces it exactly. ``salt`` re-deals the corpus
  without touching ids (epoch re-sharding).
* **Balance is statistical, not enforced**: an md5-uniform hash over
  K rows gives shard sizes within ~±4·√(K/N) at 99.99% — at 10^9 rows
  into 1024 shards that is ±0.4% — and :func:`shard_plan` measures the
  realized balance BEFORE any data moves (the plan aggregate shuffles
  (shard, count) stubs only).
* **The write is ONE shuffle**: ``repartition(n_shards, shard)`` hash-
  partitions on the shard key so each shard's rows co-locate (a task
  may own several shard values — ``partitionBy`` still splits them into
  the right directories), ``sortWithinPartitions(sort_col)`` makes
  every shard file's ROW ORDER deterministic too, and
  ``maxRecordsPerFile`` bounds file sizes for the training loader.

Reference framing: the reference package ends at a validation verdict
(reference ``validation.py``); this is the conforming-egress step a
lakehouse deployment bolts on after the verdict says "ship it".
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sampling import portable_hash64

__all__ = ["assign_shards", "shard_plan", "write_shards"]


def assign_shards(
    df: DataFrame,
    *,
    id_col: str,
    n_shards: int,
    salt: str = "",
    out_col: str = "shard",
) -> DataFrame:
    """Append the deterministic shard id (0..n_shards-1).

    Row-local projection, zero shuffle. NULL ids hash as the bare salt
    and land together in one shard — run the uniqueness/missingness
    checks on ``id_col`` first (same precondition as keep-one dedup)."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    # coalesce BEFORE concat: concat null-propagates, so a NULL id would
    # otherwise get a NULL shard and fall out of the 0..N-1 layout
    # entirely (__HIVE_DEFAULT_PARTITION__ on write) — the docstring's
    # "NULL ids hash as the bare salt" promise requires the empty-string
    # stand-in, same as sampling.hash_sample / splits._split_expr.
    h = portable_hash64(
        F.concat(F.lit(salt), F.coalesce(F.col(id_col).cast("string"), F.lit("")))
    )
    return df.withColumn(out_col, (h % n_shards).cast("int"))


def shard_plan(
    df: DataFrame,
    *,
    id_col: str,
    n_shards: int,
    salt: str = "",
    weight_col: Optional[str] = None,
) -> DataFrame:
    """Per-shard census of the assignment BEFORE writing: row count,
    share, and balance ratio vs the ideal N/n_shards (plus a weighted
    volume when ``weight_col`` — chars, tokens, bytes — is given, since
    loaders care about bytes-per-shard more than rows-per-shard).

    One scan; the aggregate shuffles (shard, partial counts) only. The
    totals needed for share/balance ride an unpartitioned window over
    the n_shards-row RESULT frame, not a second pass over the corpus.
    """
    assigned = assign_shards(df, id_col=id_col, n_shards=n_shards, salt=salt)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if weight_col is not None:
        aggs.append(F.sum(F.col(weight_col).cast("bigint")).alias("total_weight"))
    plan = assigned.groupBy("shard").agg(*aggs)
    from pyspark.sql import Window

    w = Window.partitionBy()
    plan = plan.select(
        "*",
        F.round(
            F.col("n_rows") / F.sum("n_rows").over(w).cast("double"), 9
        ).alias("row_share"),
        F.round(
            F.col("n_rows")
            * F.lit(float(n_shards))
            / F.sum("n_rows").over(w).cast("double"),
            9,
        ).alias("balance_ratio"),
    )
    return plan


def write_shards(
    df: DataFrame,
    path: str,
    *,
    id_col: str,
    n_shards: int,
    salt: str = "",
    sort_col: Optional[str] = None,
    max_records_per_file: Optional[int] = None,
    format: str = "parquet",
    mode: str = "error",
) -> DataFrame:
    """Write the corpus as ``path/shard=K/…`` with deterministic
    membership and row order; returns the per-shard manifest
    (shard, n_rows) read back from the written data — counts come from
    the FILES, not the plan, so the manifest doubles as a write audit.

    One shuffle total (the repartition on the shard key); the sort is
    within partitions only (no global ordering exchange)."""
    assigned = assign_shards(df, id_col=id_col, n_shards=n_shards, salt=salt)
    out = assigned.repartition(n_shards, "shard").sortWithinPartitions(
        sort_col or id_col
    )
    writer = out.write.mode(mode).format(format).partitionBy("shard")
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.save(path)
    spark = df.sparkSession
    return (
        spark.read.format(format)
        .load(path)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
