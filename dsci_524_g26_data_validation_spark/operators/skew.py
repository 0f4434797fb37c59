"""Key-skew diagnostics — the measurement half of the engine's explicit
skew handling (BASELINE.json: "salted repartition-by-key joins with
explicit skew handling on the source column").

The uniqueness/referential operators *apply* salting; this module tells
you whether you need it and how much: per-key frequencies for the top
heavy hitters, their share of the table, and the skew factor
(max key count / mean key count) that sizes the salt fan-out.

Scale shape: one partial-agg groupBy on the key — the exchange carries
(key, count), never rows — then a driver-side ``TakeOrderedAndProject``
for the top-k and a 1-row reaggregate for the global stats. Total
ordering (count desc, key asc) makes the report reproducible under any
partitioning. At 10^12 rows the heavy-hitter pass is the same cost as
``uniqueness`` (it IS the same aggregate), so running it ahead of a big
join is essentially free relative to the join it protects.
"""

from __future__ import annotations

import math
from typing import Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["key_skew_report", "suggested_salt", "salted_join"]


def key_skew_report(
    df: DataFrame, key: Union[str, Sequence[str]], *, top_k: int = 10
) -> DataFrame:
    """Top-``top_k`` heaviest keys with share-of-table and skew factor.

    Columns: key column(s), ``cnt``, ``share`` (cnt/total rows),
    ``skew_factor`` (cnt / mean rows-per-key). ``skew_factor`` ≈ 1 means
    uniform; a key at 50 means its shuffle partition does 50× the mean
    work — salt by about that factor (:func:`suggested_salt`). NULL keys
    are counted as a key of their own: NULL-heavy columns are the single
    most common real-world skew source and must show up here.
    """
    if top_k <= 0:
        raise ValueError(f"top_k must be positive, got {top_k}")
    keys = [key] if isinstance(key, str) else list(key)
    # EAGER by design: the (key, cnt) frame feeds two consumers (top-k
    # and the 1-row global stats), and Spark plans an un-checkpointed
    # frame twice — two corpus scans (measured; ReuseExchange does not
    # collapse them even under AQE). The alternatives are worse at
    # scale: an unpartitioned window funnels the |keys|-row frame
    # through ONE task. localCheckpoint materializes the count rows
    # once, distributed, and both consumers read the blocks.
    counts = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("cnt")
    ).localCheckpoint()
    totals = counts.agg(
        F.sum("cnt").alias("_total"), F.count(F.lit(1)).alias("_nkeys")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            *keys,
            "cnt",
            F.round(F.col("cnt") / F.col("_total"), 6).alias("share"),
            # cast to double BEFORE the multiply: cnt * nkeys as bigint
            # can pass 2^63 on a 10^12-row table (hot key ~1e11 ×
            # ~1e10 keys) and ANSI would abort the very report that
            # exists to expose that key; the factor is a rounded ratio,
            # double is its natural type
            F.round(
                F.col("cnt").cast("double") * F.col("_nkeys") / F.col("_total"),
                4,
            ).alias("skew_factor"),
        )
        .orderBy(F.col("cnt").desc(), *[F.col(k).asc_nulls_first() for k in keys])
        .limit(top_k)
    )


def suggested_salt(max_skew_factor: float, *, target: float = 2.0) -> int:
    """Salt fan-out that brings the hottest key down to ``target``× the
    mean partition load: ``ceil(skew / target)``, min 1. Pass the
    ``skew_factor`` of :func:`key_skew_report`'s top row."""
    if target <= 0:
        raise ValueError(f"target must be positive, got {target}")
    return max(1, math.ceil(max_skew_factor / target))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Union[str, Sequence[str]],
    salt: int,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join with EXPLICIT skew salting: the big (left) side spreads
    each key across ``salt`` buckets, the small-but-not-broadcastable
    (right) side is replicated ``salt``× via a row-local explode, and
    the join keys on (key…, bucket) — the hot key's shuffle partition is
    split ``salt`` ways instead of landing on one straggler task.

    Use when AQE's skew-join can't save you: AQE splits oversized
    partitions of a *sort-merge* join after the fact, but a single
    mega-key still hashes to one partition per side and its right-side
    rows must be duplicated to every split — exactly what explicit
    salting does deterministically, before the shuffle, under the
    engine's control (the north rule asks for explicit handling, not
    optimizer hope). Size ``salt`` with :func:`suggested_salt` from
    :func:`key_skew_report`.

    Semantics: identical to ``left.join(right, on, how)`` for
    ``inner``/``left``/``left_outer``/``left_semi``/``left_anti`` —
    bucket assignment on the left is ``rand(seed)``-based (any
    assignment is correct because the right side carries every bucket;
    the seed only stabilizes task-level placement). Right/full joins
    would need the mirrored construction; they raise instead of
    silently mis-joining. NULL keys behave exactly as in the plain
    join (never match).
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)} joins, got {how!r}"
        )
    if salt < 1:
        raise ValueError(f"salt must be >= 1, got {salt}")
    keys = [on] if isinstance(on, str) else list(on)
    if not keys:
        raise ValueError("on must name at least one key column")
    lb = left.withColumn(
        "_salt", (F.floor(F.rand(seed) * salt)).cast("int")
    )
    rb = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = lb.join(rb, on=keys + ["_salt"], how=how)
    return out.drop("_salt")
