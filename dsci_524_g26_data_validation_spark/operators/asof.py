"""As-of (temporal) join — attach to each left row the temporally
nearest right row per key, a primitive Spark's DataFrame API lacks
(pandas ``merge_asof`` / QuestDB-KDB ``aj`` / DuckDB ``ASOF JOIN``
semantics) and the join every point-in-time feature lookup, slowly
changing dimension attribution, and staleness audit needs.

Not implemented as a range join (no inequality-join explosion, no
``mapInPandas`` merge): both sides are tagged, UNIONed, and resolved
with ONE sorted window pass per key — the scale-safe formulation.

    union(left tagged side=1, right tagged side=0)
      -> Window.partitionBy(key).orderBy(ts, side, tiebreak)
      -> last(right payload, ignorenulls=True) up to the current row
      -> keep left rows

Cost at 100 TB: one hash-partition Exchange on the key (the same
single shuffle the join itself would need), one partition-local sort,
zero UDFs — the whole pass stays inside WholeStageCodegen. A hot key
costs its own row volume, never a cross product; candidate blowup is
structurally impossible because no pairing ever materializes (compare
the capped self-joins in ``operators/dedup.py``, which DO pair rows).

Semantics (deterministic, ANSI-SQL-expressible for the oracle):

- ``direction="backward"``: match the right row with the greatest
  ``right_ts`` <= left ts (>= for ``"forward"``); ``strict=True``
  makes the inequality strict (excludes equal timestamps).
- Ties on (key, right_ts) are broken by ``tiebreak`` — greatest wins
  for backward, least for forward — so the result is total-order
  reproducible, the same determinism contract as
  ``operators/sessions.py`` keys.
- ``tolerance_seconds`` nulls out matches farther than the bound
  (pandas ``merge_asof(tolerance=...)``).
- Every left row survives (left-outer shape). Left rows with NULL
  key/ts get NULL matches; right rows with NULL key/ts/tiebreak never
  match (no defined temporal position — surface via missingness).

Reference scope note: the reference engine (UBC-MDS data validation,
``src/dsci524_group26_dscheck``) has no joins at all (SURVEY.md §2.7);
this operator is part of the beyond-reference pipeline mandate
(§2.8), feeding the freshness/staleness checks in
``operators/timeseries.py``.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]

_SIDE_RIGHT = 0
_SIDE_LEFT = 1


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    tiebreak: str,
    right_cols: Optional[Sequence[str]] = None,
    direction: str = "backward",
    strict: bool = False,
    tolerance_seconds: Optional[float] = None,
) -> DataFrame:
    """Left as-of join: left columns + matched right payload + gap.

    Parameters
    ----------
    on : equi-join key column name, present on both sides.
    left_ts / right_ts : timestamp column on each side (timestamp or
        timestamp_ntz; compared via ``timestamp_diff`` microseconds).
    tiebreak : right-side column making (on, right_ts, tiebreak)
        unique-enough for a reproducible winner among equal
        timestamps (e.g. the right table's id column).
    right_cols : right payload columns to attach (default: all right
        columns except ``on``). Names must not collide with left's.
    direction : ``"backward"`` (match at-or-before, the default) or
        ``"forward"`` (at-or-after).
    strict : exclude equal-timestamp matches.
    tolerance_seconds : maximum |left ts - matched right ts|; farther
        matches become NULL (the row itself is kept).

    Returns all left columns plus the requested right columns (NULL
    when unmatched) plus ``asof_gap_us`` — the non-negative
    microsecond staleness of the match, NULL when unmatched.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    if tolerance_seconds is not None and tolerance_seconds < 0:
        raise ValueError(f"tolerance_seconds must be >= 0, got {tolerance_seconds}")
    requested = list(right_cols) if right_cols is not None else [
        c for c in right.columns if c != on
    ]
    payload = list(requested)
    for c in (right_ts, tiebreak):
        if c not in payload:
            payload.append(c)
    missing = [c for c in payload if c not in right.columns]
    if missing:
        raise ValueError(f"right_cols not in right schema: {missing}")
    collide = [c for c in requested + ["asof_gap_us"] if c in left.columns]
    if collide:
        raise ValueError(
            f"right columns collide with left schema: {collide}; rename before joining"
        )

    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(_SIDE_LEFT).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(
            right.select(
                F.struct(*[F.col(c) for c in payload]).alias("s")
            ).schema["s"].dataType
        ).alias("_r"),
        F.lit(None).cast(right.schema[tiebreak].dataType).alias("_tb"),
    )
    r_tag = (
        right.filter(
            F.col(on).isNotNull()
            & F.col(right_ts).isNotNull()
            & F.col(tiebreak).isNotNull()
        )
        .select(
            F.col(on).alias("_k"),
            F.col(right_ts).alias("_ts"),
            F.lit(_SIDE_RIGHT).alias("_side"),
            F.lit(None).cast(
                left.select(
                    F.struct(*[F.col(c) for c in left.columns]).alias("s")
                ).schema["s"].dataType
            ).alias("_l"),
            F.struct(*[F.col(c) for c in payload]).alias("_r"),
            F.col(tiebreak).alias("_tb"),
        )
    )

    backward = direction == "backward"
    # Traversal order: for backward, scan timestamps ascending so the
    # running `last` right row is the greatest right_ts <= current;
    # forward scans descending (last seen = least right_ts >= current).
    ts_ord = F.col("_ts").asc_nulls_first() if backward else F.col("_ts").desc_nulls_first()
    # At equal timestamps the right row sorts BEFORE the left row for
    # inclusive matching (so `last` already sees it at the left row)
    # and AFTER it when strict.
    side_ord = F.col("_side").desc() if strict else F.col("_side").asc()
    # Among equal (key, ts) right rows: backward keeps the greatest
    # tiebreak (last in asc order), forward the least (last in desc).
    tb_ord = F.col("_tb").asc_nulls_first() if backward else F.col("_tb").desc_nulls_first()

    w = (
        Window.partitionBy("_k")
        .orderBy(ts_ord, side_ord, tb_ord)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("_r", ignorenulls=True).over(w)

    u = l_tag.unionByName(r_tag)
    resolved = (
        u.withColumn("_m", matched)
        .filter(F.col("_side") == _SIDE_LEFT)
        .drop("_r", "_tb", "_side")
    )
    # NULL left key/ts rows: partitionBy groups NULL keys together and
    # NULLs sort first, so `last` over the preceding frame is NULL
    # there — the no-match contract falls out of the sort order, but
    # make it explicit (and direction-safe for desc ordering):
    resolved = resolved.withColumn(
        "_m",
        F.when(F.col("_k").isNotNull() & F.col("_ts").isNotNull(), F.col("_m")),
    )
    if backward:
        gap = F.timestamp_diff("MICROSECOND", F.col("_m")[right_ts], F.col("_ts"))
    else:
        gap = F.timestamp_diff("MICROSECOND", F.col("_ts"), F.col("_m")[right_ts])
    resolved = resolved.withColumn("_gap", gap)
    if tolerance_seconds is not None:
        tol_us = int(round(tolerance_seconds * 1_000_000))
        resolved = resolved.withColumn(
            "_m", F.when(F.col("_gap") <= tol_us, F.col("_m"))
        ).withColumn("_gap", F.when(F.col("_gap") <= tol_us, F.col("_gap")))

    final = [F.col(f"_l.{c}").alias(c) for c in left.schema.fieldNames()]
    final += [F.col(f"_m.{c}").alias(c) for c in requested]
    final.append(F.col("_gap").alias("asof_gap_us"))
    return resolved.select(*final)
