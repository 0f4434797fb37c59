"""Row-level table reconciliation — the migration/backfill validation check.

After any rewrite of a 100 TB table (engine migration, compaction,
re-partition, format change) the question is "same rows, exactly?".
Answering it by joining payloads is a full-corpus double shuffle;
answering it by count(*) alone misses silent corruption. The scale
shape here is the digest multiset diff:

1. Per side, project each row to a **128-bit digest** — two independent
   ``xxhash64`` seeds over null-sentineled string encodings. One scan
   per side; everything stays in codegen; no UDF. 64 bits alone is NOT
   enough at 10^12 rows (birthday collisions are certain: n²/2⁶⁵ ≫ 1);
   the seed pair gives 2¹²⁸ space where they are negligible.
2. ``groupBy(digest).count()`` per side — map-side partial aggregation
   collapses duplicates, so the one shuffle carries (16-byte digest,
   count), ~24 B/row worst case, never payloads.
3. Full-outer join of the two digest-count frames (both sides already
   hash-partitioned on the join key by step 2, so AQE plans it without
   an extra exchange) and a final 1-row aggregate.

Multiset semantics throughout: a row appearing 3× left and 1× right
contributes 2 to ``n_only_left`` and 1 to ``n_common`` — the diff a
replayed writer or a dedup-happy migration actually produces.

NULL encoding: each column is ``coalesce(cast(c as string), '\\x00')``
— a 1-byte sentinel that cannot collide with real data containing the
NUL character only if the source bans it; for byte-exact sources pass
custom ``encode`` expressions. Columns are compared by NAME: both
inputs must share the compared column set (validated up front, the
reference's ``compare_contracts`` input-guard idiom).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["row_digest", "table_diff", "table_diff_rows"]

_SENTINEL = "\x00"


def row_digest(cols: Sequence[str], *, seed: int = 42) -> Column:
    """128-bit row digest as ``struct<h1:bigint, h2:bigint>`` over the
    named columns (order-sensitive — pass a canonical column order)."""
    enc = [
        F.coalesce(F.col(f"`{c}`").cast("string"), F.lit(_SENTINEL))
        for c in cols
    ]
    return F.struct(
        F.xxhash64(*enc, F.lit(seed)).alias("h1"),
        F.xxhash64(*enc, F.lit(seed + 1)).alias("h2"),
    )


def _digest_counts(df: DataFrame, cols: Sequence[str], seed: int) -> DataFrame:
    return (
        df.select(row_digest(cols, seed=seed).alias("_d"))
        .groupBy("_d")
        .agg(F.count(F.lit(1)).alias("_c"))
    )


def _validate(left: DataFrame, right: DataFrame, cols) -> list:
    cols = list(cols) if cols is not None else list(left.columns)
    for side, df in (("left", left), ("right", right)):
        missing = [c for c in cols if c not in df.columns]
        if missing:
            raise ValueError(f"columns missing from {side} input: {missing}")
    return cols


def table_diff_rows(
    left: DataFrame,
    right: DataFrame,
    *,
    cols: Optional[Sequence[str]] = None,
    seed: int = 42,
) -> DataFrame:
    """Digests whose multiplicities differ between the sides:
    ``(h1, h2, left_count, right_count)``.

    Join back to either input on ``row_digest(cols) == struct(h1, h2)``
    to fetch witness payloads — candidates only, never the corpus."""
    cols = _validate(left, right, cols)
    lc = _digest_counts(left, cols, seed).withColumnRenamed("_c", "left_count")
    rc = _digest_counts(right, cols, seed).withColumnRenamed("_c", "right_count")
    return (
        lc.join(rc, on="_d", how="full_outer")
        .select(
            F.col("_d.h1").alias("h1"),
            F.col("_d.h2").alias("h2"),
            F.coalesce("left_count", F.lit(0)).alias("left_count"),
            F.coalesce("right_count", F.lit(0)).alias("right_count"),
        )
        .filter(F.col("left_count") != F.col("right_count"))
    )


def table_diff(
    left: DataFrame,
    right: DataFrame,
    *,
    cols: Optional[Sequence[str]] = None,
    seed: int = 42,
) -> DataFrame:
    """One-row reconciliation summary.

    ``n_left``/``n_right``: input row counts. ``n_common``: multiset
    intersection size. ``n_only_left``/``n_only_right``: rows (with
    multiplicity) present on one side only. ``n_distinct_diff``:
    distinct row-values whose multiplicities differ — the number of
    witness groups ``table_diff_rows`` returns. Identical tables ⇔
    ``n_only_left == n_only_right == 0``."""
    cols = _validate(left, right, cols)
    lc = _digest_counts(left, cols, seed)
    rc = _digest_counts(right, cols, seed).withColumnRenamed("_c", "_rc")
    j = lc.join(rc, on="_d", how="full_outer").select(
        F.coalesce("_c", F.lit(0)).alias("l"),
        F.coalesce("_rc", F.lit(0)).alias("r"),
    )
    return j.agg(
        F.sum("l").alias("n_left"),
        F.sum("r").alias("n_right"),
        F.sum(F.least("l", "r")).alias("n_common"),
        F.sum(F.greatest(F.col("l") - F.col("r"), F.lit(0))).alias("n_only_left"),
        F.sum(F.greatest(F.col("r") - F.col("l"), F.lit(0))).alias("n_only_right"),
        F.count_if(F.col("l") != F.col("r")).alias("n_distinct_diff"),
    )


# -- per-partition digests (Merkle-style incremental verification) -----------


def partition_digests(
    df: DataFrame,
    *,
    partition_col: str,
    cols: Sequence[str],
    hash_fn: str = "xxhash",
    seed: int = 42,
) -> DataFrame:
    """Order-independent content digest PER PARTITION VALUE →
    (partition, n_rows, digest_1[, digest_2]) — the Merkle-leaf frame
    that localizes a migration diff without ever shuffling rows.

    :func:`table_diff` answers "same rows?" for the whole table; at
    10^12 rows the follow-up is *which day / which shard do I re-copy?*
    Summing per-row hashes inside each partition gives a multiset
    invariant (equal multisets ⇒ equal sums, regardless of row or
    merge order), so two sides can be compared partition-by-partition
    with |partitions|-row frames.

    ``hash_fn='xxhash'`` (default): two independent 64-bit xxhash sums
    as decimal(38,0) — the scale path (collision-canceling across two
    seeds, pure JVM). ``hash_fn='portable'``: one 60-bit md5 sum
    renderable identically by any engine with md5 (the
    sampling.portable_hash64 convention) — use it when the other side
    of the comparison is a different engine entirely.

    100 TB shape: row-local digest projection → ONE groupBy on the
    partition value with map-side combine (the exchange carries one
    partial (partition, sums) row per task), never a row payload.
    """
    enc = [
        F.coalesce(F.col(f"`{c}`").cast("string"), F.lit(_SENTINEL))
        for c in cols
    ]
    if not cols:
        raise ValueError("cols must name at least one column")
    if hash_fn == "xxhash":
        digests = [
            F.sum(
                F.xxhash64(*enc, F.lit(seed)).cast("decimal(38,0)")
            ).alias("digest_1"),
            F.sum(
                F.xxhash64(*enc, F.lit(seed + 1)).cast("decimal(38,0)")
            ).alias("digest_2"),
        ]
    elif hash_fn == "portable":
        from .sampling import portable_hash64

        digests = [
            F.sum(
                portable_hash64(F.concat_ws("\x01", *enc)).cast(
                    "decimal(38,0)"
                )
            ).alias("digest_1")
        ]
    else:
        raise ValueError(f"hash_fn must be 'xxhash' or 'portable': {hash_fn}")
    return df.groupBy(
        F.col(f"`{partition_col}`").alias("partition")
    ).agg(F.count(F.lit(1)).alias("n_rows"), *digests)


def partition_diff(
    left: DataFrame,
    right: DataFrame,
    *,
    partition_col: str,
    cols: Optional[Sequence[str]] = None,
    hash_fn: str = "xxhash",
    seed: int = 42,
) -> DataFrame:
    """Partition-level reconciliation → (partition, n_rows_left,
    n_rows_right, status) with status ∈ match | differs | only_left |
    only_right — the re-copy worklist after a migration.

    Each side is reduced to its :func:`partition_digests` frame first,
    so the full-outer join touches |partitions| rows; 'differs' means
    both sides have the partition but content diverges (count or any
    digest sum), which localizes :func:`table_diff_rows` witness
    hunting to the named partitions only.
    """
    cols = _validate(left, right, cols)
    cols = [c for c in cols if c != partition_col] or list(cols)
    ld = partition_digests(
        left, partition_col=partition_col, cols=cols, hash_fn=hash_fn,
        seed=seed,
    )
    rd = partition_digests(
        right, partition_col=partition_col, cols=cols, hash_fn=hash_fn,
        seed=seed,
    )
    dcols = [c for c in ld.columns if c.startswith("digest_")]
    r = rd.select(
        "partition",
        F.col("n_rows").alias("_rn"),
        *[F.col(c).alias(f"_r{c}") for c in dcols],
    )
    same = F.col("n_rows") == F.col("_rn")
    for c in dcols:
        same = same & F.col(c).eqNullSafe(F.col(f"_r{c}"))
    status = (
        F.when(F.col("_rn").isNull(), "only_left")
        .when(F.col("n_rows").isNull(), "only_right")
        .when(same, "match")
        .otherwise("differs")
    )
    return ld.join(r, on="partition", how="full_outer").select(
        "partition",
        F.col("n_rows").alias("n_rows_left"),
        F.col("_rn").alias("n_rows_right"),
        status.alias("status"),
    )
