"""Temporal-integrity operators (operators/timeseries.py): freshness,
out-of-order detection, sequence-gap buckets, inter-arrival cadence —
planted-anomaly tests with hand-computed expectations."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

import dsci_524_g26_data_validation_spark as dv


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_freshness_exact_lag(spark):
    df = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00.250000")),
            (2, _ts("2024-01-01 09:00:00")),
            (3, None),
        ],
        "id int, ts timestamp",
    )
    r = dv.freshness(df, ts_col="ts", as_of="2024-01-01 11:00:00").collect()[0]
    assert (r["n_rows"], r["n_null_ts"]) == (3, 1)
    assert r["max_ts"] == _ts("2024-01-01 10:00:00.250000")
    # 59 min 59.75 s -> floor = 3599 (duration truncation, NOT the 3600
    # a second-boundary-crossing count would give)
    assert r["seconds_behind"] == 3599
    # data from the future goes negative
    r2 = dv.freshness(df, ts_col="ts", as_of="2024-01-01 10:00:00").collect()[0]
    assert r2["seconds_behind"] == -1


def test_freshness_requires_as_of(spark):
    df = spark.createDataFrame([(1, _ts("2024-01-01 00:00:00"))], "id int, ts timestamp")
    with pytest.raises(ValueError, match="as_of"):
        dv.freshness(df, ts_col="ts")


def test_order_health_planted_regressions(spark):
    rows = [
        # user 1: seq 1..4, one regression at seq 3 (ts goes back)
        (1, 1, _ts("2024-01-01 00:00:01")),
        (1, 2, _ts("2024-01-01 00:00:05")),
        (1, 3, _ts("2024-01-01 00:00:03")),
        (1, 4, _ts("2024-01-01 00:00:03")),  # equal ts: NOT a regression
        # user 2: monotone
        (2, 1, _ts("2024-01-01 00:00:01")),
        (2, 2, _ts("2024-01-01 00:00:02")),
        # NULL key/ts/seq rows are excluded
        (None, 9, _ts("2024-01-01 00:00:00")),
        (3, None, _ts("2024-01-01 00:00:00")),
        (3, 1, None),
    ]
    df = spark.createDataFrame(rows, "user_id int, event_id int, ts timestamp")
    r = dv.order_health(df).collect()[0]
    assert (r["n_events"], r["n_pairs"], r["n_regressions"]) == (6, 4, 1)
    assert r["regression_frac"] == pytest.approx(0.25)
    assert r["n_keys_affected"] == 1


def test_order_health_empty_and_single(spark):
    df = spark.createDataFrame([], "user_id int, event_id int, ts timestamp")
    r = dv.order_health(df).collect()[0]
    assert (r["n_events"], r["n_pairs"], r["n_regressions"]) == (0, 0, 0)
    assert r["regression_frac"] == 0.0
    one = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01 00:00:00"))], "user_id int, event_id int, ts timestamp"
    )
    r1 = dv.order_health(one).collect()[0]
    assert (r1["n_pairs"], r1["regression_frac"]) == (0, 0.0)


def test_sequence_gap_buckets_interior_holes(spark):
    # bucket 0: ids 0..9 present except 4,5 -> span 10, n 8, missing 2
    # bucket 1: ids 10..19 fully present (with a duplicate: counted once)
    # bucket 3: only 35 present -> span 1, no hole (bucket 2 entirely
    #           absent: surfaces as the 0,1,3 bucket-number break)
    ids = [0, 1, 2, 3, 6, 7, 8, 9] + list(range(10, 20)) + [12, 35]
    df = spark.createDataFrame([(i,) for i in ids], "event_id bigint")
    out = dv.sequence_gap_buckets(df, id_col="event_id", bucket_size=10).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["bucket"], r["n_ids"], r["min_id"], r["max_id"], r["n_missing"]) == (
        0, 8, 0, 9, 2,
    )


def test_sequence_gap_buckets_validates_and_orders(spark):
    df = spark.createDataFrame([(1,)], "event_id bigint")
    with pytest.raises(ValueError, match="bucket_size"):
        dv.sequence_gap_buckets(df, bucket_size=0)
    # ordering: most holes first, bucket asc tiebreak; limit respected
    ids = [0, 9, 10, 12, 19, 20, 29]  # b0 missing 8, b1 missing 7, b2 missing 8
    df2 = spark.createDataFrame([(i,) for i in ids], "event_id bigint")
    out = dv.sequence_gap_buckets(df2, bucket_size=10, limit=2).collect()
    assert [(r["bucket"], r["n_missing"]) for r in out] == [(0, 8), (2, 8)]


def test_interarrival_stats_cadence(spark):
    rows = [
        # user 1: gaps +2s, -1s (regression; excluded from avg/max), +4s
        (1, 1, _ts("2024-01-01 00:00:00")),
        (1, 2, _ts("2024-01-01 00:00:02")),
        (1, 3, _ts("2024-01-01 00:00:01")),
        (1, 4, _ts("2024-01-01 00:00:05")),
        # user 2: single event -> no gaps, NULL avg/max
        (2, 1, _ts("2024-01-01 00:00:00")),
    ]
    df = spark.createDataFrame(rows, "user_id int, event_id int, ts timestamp")
    out = dv.interarrival_stats(df, top_k=5).collect()
    by_key = {r["key"]: r for r in out}
    r1 = by_key[1]
    assert (r1["n_events"], r1["n_regressions"]) == (4, 1)
    assert r1["avg_gap_s"] == pytest.approx(3.0)  # (2 + 4) / 2
    assert r1["max_gap_us"] == 4_000_000
    r2 = by_key[2]
    assert (r2["n_regressions"], r2["avg_gap_s"], r2["max_gap_us"]) == (0, None, None)
    # regression-heavy keys sort first
    assert out[0]["key"] == 1


# -- interval overlaps --------------------------------------------------------


@pytest.fixture(scope="module")
def intervals(spark):
    return spark.createDataFrame(
        [
            # key a: [0,10) then [5,8) overlaps; [10,12) back-to-back OK
            ("a", 0, 10),
            ("a", 5, 8),
            ("a", 10, 12),
            # long interval swallows a later short one (non-adjacent)
            ("b", 0, 100),
            ("b", 20, 25),
            ("b", 30, 35),
            # inverted and null bounds
            ("c", 10, 5),
            ("c", None, 7),
            # clean key
            ("d", 0, 1),
        ],
        "k string, s int, e int",
    )


def test_interval_overlaps_classes(intervals):
    out = dv.interval_overlaps(
        intervals, key_col="k", start_col="s", end_col="e"
    ).collect()
    by_kind = {}
    for r in out:
        by_kind.setdefault(r["overlap_kind"], []).append(r)
    assert len(by_kind["overlap"]) == 3  # a:[5,8) and BOTH b shorts
    assert {r["key"] for r in by_kind["overlap"]} == {"a", "b"}
    assert len(by_kind["inverted"]) == 1
    assert len(by_kind["null_bounds"]) == 1
    # witness: the swallowed b-interval reports the long end
    b_wit = [r for r in by_kind["overlap"] if r["key"] == "b"]
    assert all(r["prev_max_end"] == 100 for r in b_wit)


def test_adjacent_intervals_do_not_overlap(spark):
    """Half-open convention: start == previous end is legal."""
    g = spark.createDataFrame(
        [("x", 0, 10), ("x", 10, 20)], "k string, s int, e int"
    )
    assert dv.interval_overlaps(
        g, key_col="k", start_col="s", end_col="e"
    ).count() == 0


def test_interval_sweep_single_shuffle(intervals):
    plan = (
        dv.interval_overlaps(
            intervals, key_col="k", start_col="s", end_col="e"
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1  # one key shuffle, no self-join
    assert "Join" not in plan


# -- monotonic counters -------------------------------------------------------


def test_monotonic_violations(spark):
    from dsci_524_g26_data_validation_spark.operators.timeseries import (
        monotonic_violations,
    )

    df = spark.createDataFrame(
        [
            # key a: 1,5,3,4,6 -> 3 and 4 are below high-water 5
            ("a", 1, 1.0),
            ("a", 2, 5.0),
            ("a", 3, 3.0),
            ("a", 4, 4.0),
            ("a", 5, 6.0),
            # key b: clean
            ("b", 1, 1.0),
            ("b", 2, 2.0),
            # nulls
            ("c", None, 9.0),
            ("c", 1, None),
        ],
        "k string, seq int, v double",
    )
    out = monotonic_violations(
        df, key_col="k", order_col="seq", value_col="v"
    ).collect()
    by = {(r["key"], r["order"]): r for r in out}
    assert by[("a", 3)]["kind"] == "regression"
    assert by[("a", 3)]["prev_max"] == 5.0
    assert by[("a", 4)]["kind"] == "regression"
    assert ("a", 5) not in by and ("b", 2) not in by
    assert by[("c", None)]["kind"] == "null_order"
    assert by[("c", 1)]["kind"] == "null_value"
    assert len(out) == 4


# -- volume calendar ----------------------------------------------------------


def test_volume_calendar_missing_and_anomaly(spark):
    from dsci_524_g26_data_validation_spark.operators.timeseries import (
        volume_calendar,
    )

    rows = []
    # 9 normal days of 10 rows, day 5 absent, day 7 spiked to 200
    for d in range(1, 11):
        if d == 5:
            continue
        n = 200 if d == 7 else 10
        for i in range(n):
            rows.append((f"2024-03-{d:02d} 12:00:00",))
    df = spark.createDataFrame(rows, "s string").select(
        F.to_timestamp("s").alias("ts")
    )
    out = {r["bucket_ts"].day: r for r in volume_calendar(df, bucket="day").collect()}
    assert len(out) == 10  # full spine, no gaps
    assert out[5]["n_rows"] == 0 and out[5]["status"] == "missing"
    assert out[7]["status"] == "anomaly"
    assert out[1]["status"] == "ok"
    assert out[1]["median_rows"] == 10.0


def test_volume_calendar_null_ts_row(spark):
    from dsci_524_g26_data_validation_spark.operators.timeseries import (
        volume_calendar,
    )

    df = spark.createDataFrame(
        [("2024-01-01 00:00:00",), ("2024-01-02 00:00:00",), (None,)],
        "s string",
    ).select(F.to_timestamp("s").alias("ts"))
    out = volume_calendar(df, bucket="day").collect()
    assert [r["status"] for r in out] == ["ok", "ok", "null_ts"]
    assert out[-1]["bucket_ts"] is None and out[-1]["n_rows"] == 1


def test_volume_calendar_rejects_bad_bucket(spark):
    from dsci_524_g26_data_validation_spark.operators.timeseries import (
        volume_calendar,
    )

    with pytest.raises(ValueError):
        volume_calendar(spark.range(1).select(F.lit(None).alias("ts")), bucket="minute")


# -- change point --------------------------------------------------------------


def test_change_point_finds_level_shift(spark):
    from dsci_524_g26_data_validation_spark.operators.timeseries import (
        change_point_report,
    )

    # 20 periods at ~100, then 20 at ~150 (deterministic wiggle)
    rows = [(t, 100.0 + (t % 3)) for t in range(20)] + [
        (t, 150.0 + (t % 3)) for t in range(20, 40)
    ]
    df = spark.createDataFrame(rows, "t int, v double")
    r = change_point_report(df, order_col="t", value_col="v").first()
    assert r["split_after"] == 19  # last period of the old regime
    assert r["n_before"] == 20 and r["n_after"] == 20
    assert abs(r["shift"] - 50.0) < 0.1
    assert r["cusum_stat"] > 1.36  # clearly significant


def test_change_point_null_on_flat_series(spark):
    from dsci_524_g26_data_validation_spark.operators.timeseries import (
        change_point_report,
    )

    df = spark.createDataFrame([(t, 5.0) for t in range(10)], "t int, v double")
    r = change_point_report(df, order_col="t", value_col="v").first()
    assert r["cusum_stat"] == 0.0
    assert r["split_after"] is None


def test_change_point_excludes_nulls(spark):
    from dsci_524_g26_data_validation_spark.operators.timeseries import (
        change_point_report,
    )

    df = spark.createDataFrame(
        [(1, 1.0), (2, None), (None, 9.0), (3, 1.0), (4, 9.0), (5, 9.0)],
        "t int, v double",
    )
    r = change_point_report(df, order_col="t", value_col="v").first()
    assert r["n_before"] + r["n_after"] == 4  # the two NULL rows excluded
    assert r["split_after"] == 3


def test_monotonic_null_order_does_not_poison_running_max(spark):
    """r3 review fix: a NULL-order row's value must NOT enter the sweep
    — it previously sorted nulls-first and flagged every later valid
    row as a regression."""
    from dsci_524_g26_data_validation_spark.operators.timeseries import (
        monotonic_violations,
    )

    df = spark.createDataFrame(
        [("k", None, 1000), ("k", 1, 5), ("k", 2, 6)],
        "key string, o int, v int",
    )
    out = monotonic_violations(
        df, key_col="key", order_col="o", value_col="v"
    ).collect()
    kinds = sorted(r.kind for r in out)
    assert kinds == ["null_order"], out
    null_row = out[0]
    assert null_row.prev_max is None


def test_interval_null_bounds_do_not_poison_sweep(spark):
    """r3 review fix: a NULL-start row with a far-future end must not
    flag later valid intervals of its key as overlaps."""
    from dsci_524_g26_data_validation_spark.operators.timeseries import (
        interval_overlaps,
    )

    df = spark.createDataFrame(
        [
            ("k", None, 2_000_000_000),
            ("k", 100, 200),
            ("k", 300, 400),
            ("k", 350, 450),  # genuine overlap with (300, 400)
        ],
        "key string, s long, e long",
    )
    out = interval_overlaps(df, key_col="key", start_col="s", end_col="e")
    rows = {(r.start, r.overlap_kind) for r in out.collect()}
    assert rows == {(None, "null_bounds"), (350, "overlap")}


def test_change_point_degenerate_series_contract(spark):
    """r3 review fix: < 2 usable rows must return the documented single
    row (NULL split, cusum_stat 0), never an empty frame."""
    from dsci_524_g26_data_validation_spark.operators.timeseries import (
        change_point_report,
    )

    one = spark.createDataFrame([(1, 10.0)], "t int, v double")
    r = change_point_report(one, order_col="t", value_col="v").collect()
    assert len(r) == 1
    assert r[0].split_after is None and r[0].cusum_stat == 0.0
    assert r[0].n_before == 1 and r[0].mean_before == 10.0

    empty = spark.createDataFrame([], "t int, v double")
    r = change_point_report(empty, order_col="t", value_col="v").collect()
    assert len(r) == 1
    assert r[0].split_after is None and r[0].cusum_stat == 0.0
    assert r[0].n_before == 0 and r[0].mean_before is None


def test_sweeps_are_single_scan(spark, tmp_path):
    """The junk-row exclusion lives INSIDE the one window (guarded max,
    junk ordered last) — a clean/bad branch pair would scan twice."""
    from dsci_524_g26_data_validation_spark.operators.timeseries import (
        interval_overlaps,
        monotonic_violations,
    )

    path = str(tmp_path / "sweep_src")
    spark.createDataFrame(
        [("k", i, i, i + 1) for i in range(50)],
        "key string, o int, s long, e long",
    ).write.parquet(path)
    d = spark.read.parquet(path)
    m = monotonic_violations(d, key_col="key", order_col="o", value_col="s")
    assert m._jdf.queryExecution().executedPlan().toString().count("Scan parquet") == 1
    iv = interval_overlaps(d, key_col="key", start_col="s", end_col="e")
    assert iv._jdf.queryExecution().executedPlan().toString().count("Scan parquet") == 1
