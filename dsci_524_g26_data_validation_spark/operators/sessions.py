"""Gap-based sessionization of event streams — the batch twin of the
Structured Streaming session window (public Spark semantics:
``F.session_window`` / Databricks sessionization pattern), implemented
with explicit windows so the per-event session assignment is exposed,
deterministic, and ANSI-SQL-expressible for the oracle.

Semantics: within each ``user_col``, events ordered by ``ts_col`` (ties
broken by ``id_col`` so the order is total and the result reproducible)
start a new session whenever the gap to the previous event exceeds
``gap``. ``session_seq`` is the 1-based session index per user, so
(user, session_seq) is a stable session key that survives
repartitioning — the same stability argument as the engine's
partition-value verdict keys.

Scale shape: ONE hash-partition shuffle on the user key, then two
sorted partition-local window passes (lag → flag, running sum → index)
that share the same sort order — Spark plans a single Exchange + a
single Sort for both. Per-user event counts bound partition-local work;
a hot user is bounded by their own event volume, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sessionize", "session_stats"]


def sessionize(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-event session assignment: input columns plus ``session_seq``.

    NULL users or timestamps are excluded (no defined position in any
    session; surface them via the missingness check instead).
    """
    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds must be positive, got {gap_seconds}")
    order = [F.col(ts_col).asc(), F.col(id_col).asc()]
    w = Window.partitionBy(user_col).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # timestamp_diff works identically for timestamp AND timestamp_ntz
    # (parquet reads as ntz in Spark 4; ntz casts to neither double nor
    # epoch, and a tz round-trip would be DST-dependent) — microsecond
    # granularity keeps the gap comparison exact.
    gap_us = F.timestamp_diff("MICROSECOND", prev_ts, F.col(ts_col))
    new_session = F.when(
        prev_ts.isNull() | (gap_us > int(gap_seconds) * 1_000_000), 1
    ).otherwise(0)
    return (
        df.filter(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .withColumn("_new", new_session)
        .withColumn(
            "session_seq",
            F.sum("_new").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .drop("_new")
    )


def session_stats(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """One row per (user, session): start/end, event count, duration.

    The groupBy key extends the window's partition key, so the
    aggregation reuses the sessionize exchange — one shuffle total.
    """
    s = sessionize(
        df, user_col=user_col, ts_col=ts_col, id_col=id_col, gap_seconds=gap_seconds
    )
    return s.groupBy(user_col, "session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.timestamp_diff("MICROSECOND", F.min(ts_col), F.max(ts_col))
            / F.lit(1_000_000.0),
            6,
        ).alias("duration_sec"),
    )
