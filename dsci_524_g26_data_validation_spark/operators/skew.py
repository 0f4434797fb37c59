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

__all__ = ["key_skew_report", "suggested_salt"]


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
            F.round(
                F.col("cnt") * F.col("_nkeys") / F.col("_total"), 4
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
