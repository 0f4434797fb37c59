"""Structured Streaming surface: windowed violation counts + per-batch
fused validation, driven deterministically with a file source and
``trigger(availableNow=True)``."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

import dsci_524_g26_data_validation_spark as dv
from dsci_524_g26_data_validation_spark.streaming import (
    validate_each_batch,
    violation_counts_stream,
)

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("event_type", T.StringType()),
    ]
)


@pytest.fixture()
def event_files(spark, tmp_path):
    """Two parquet chunk files: minute 0 clean-ish, minute 1 dirtier."""
    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = []
    for i in range(200):
        minute = i % 2
        # values > 100 violate the contract; id picks a deterministic subset
        bad = (i % 10 == 0) if minute == 0 else (i % 5 == 0)
        rows.append(
            (
                i,
                base + dt.timedelta(minutes=minute, seconds=i % 60),
                150.0 if bad else float(i % 90),
                "click" if i % 3 else "view",
            )
        )
    df = spark.createDataFrame(rows, EVENTS_SCHEMA)
    path = str(tmp_path / "events_in")
    df.repartition(2).write.parquet(path)
    return path


CONTRACT = dv.Contract(
    name="events",
    columns={
        "event_id": dv.ColumnRule(dtype="bigint"),
        "ts": dv.ColumnRule(dtype="timestamp"),
        "value": dv.ColumnRule(dtype="double", min_value=0, max_value=100),
        "event_type": dv.ColumnRule(
            dtype="string", allowed_values={"click", "view"}
        ),
    },
)


def test_violation_counts_stream(spark, event_files, tmp_path):
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(event_files)
    counted = violation_counts_stream(
        stream, CONTRACT, time_col="ts", window_duration="1 minute"
    )
    q = (
        counted.writeStream.format("memory")
        .queryName("vc")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"].minute, r["column"], r["kind"], r["facet"]): (
            r["n_violations"],
            r["n_rows"],
        )
        for r in spark.sql("select * from vc").collect()
    }
    # batch oracle: same data, same predicate, plain groupBy
    batch = spark.read.parquet(event_files)
    expected = {
        m: n
        for m, n in batch.filter("value > 100")
        .groupBy(F.minute("ts").alias("m"))
        .count()
        .collect()
    }
    rows_per_min = {
        m: n for m, n in batch.groupBy(F.minute("ts").alias("m")).count().collect()
    }
    for minute in (0, 1):
        # facet 0 = lower bound (clean), facet 1 = upper bound (violations)
        assert got[(minute, "value", "range", 0)][0] == 0
        assert got[(minute, "value", "range", 1)][0] == expected[minute]
        # n_rows is the window's row count on every facet row
        for key, (_, n_rows) in got.items():
            if key[0] == minute:
                assert n_rows == rows_per_min[minute]
        # category rule saw no violations
        assert got[(minute, "event_type", "category", 0)][0] == 0


def test_validate_each_batch(spark, event_files, tmp_path):
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(event_files)
    query, verdicts = validate_each_batch(
        stream,
        CONTRACT,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    query.awaitTermination(120)
    assert len(verdicts) >= 1
    assert sum(v.n_rows for v in verdicts) == 200
    # data contains values > 100 → every verdict covering them fails on range
    kinds = {i.kind for v in verdicts for i in v.result.issues}
    assert "range" in kinds
    # resume from checkpoint with no new files → no further verdicts
    stream2 = spark.readStream.schema(EVENTS_SCHEMA).parquet(event_files)
    query2, verdicts2 = validate_each_batch(
        stream2,
        CONTRACT,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    query2.awaitTermination(120)
    assert verdicts2 == []
