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


def test_violation_running_totals_state_across_restarts(spark, tmp_path):
    """applyInPandasWithState: per-key totals accumulate across
    micro-batches AND across query restarts (state store recovery)."""
    import shutil

    from dsci_524_g26_data_validation_spark.streaming import (
        violation_running_totals,
    )

    base = dt.datetime(2026, 1, 1, 12, 0, 0)

    def make_chunk(start_id, n, bad_every):
        rows = [
            (
                start_id + i,
                base + dt.timedelta(seconds=i),
                150.0 if i % bad_every == 0 else 50.0,
                "click" if (start_id + i) % 2 else "view",
            )
            for i in range(n)
        ]
        return spark.createDataFrame(rows, EVENTS_SCHEMA)

    indir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    stage = str(tmp_path / "stage1")
    make_chunk(0, 100, bad_every=10).coalesce(1).write.parquet(stage)

    def run(name):
        # foreachBatch sink: unlike the memory sink it supports resuming
        # from an existing checkpoint (exactly what this test asserts)
        stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(indir)
        totals = violation_running_totals(stream, CONTRACT, key_col="event_type")
        acc = []

        def collect_batch(bdf, _bid):
            acc.extend(bdf.collect())

        q = (
            totals.writeStream.foreachBatch(collect_batch)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        if q.isActive:
            q.stop()
            q.awaitTermination(60)
        # update mode emits one row per key per batch; keep the latest
        out = {}
        for r in acc:
            out[r["key"]] = (r["total_rows"], r["total_violations"])
        return out

    shutil.copytree(stage, indir)
    got1 = run("rt1")
    # chunk 1: 100 rows (50 click / 50 view), 10 bad values (i % 10 == 0,
    # even i -> alternating start_id parity: i even means id even -> "view")
    assert got1["click"][0] + got1["view"][0] == 100
    assert got1["click"][1] + got1["view"][1] == 10

    # second chunk lands; RESTARTED query must resume state from ckpt
    stage2 = str(tmp_path / "stage2")
    make_chunk(1000, 60, bad_every=6).coalesce(1).write.parquet(stage2)
    import glob
    import os

    for f in glob.glob(f"{stage2}/*.parquet"):
        shutil.copy(f, os.path.join(indir, "chunk2.parquet"))
    got2 = run("rt2")
    assert got2["click"][0] + got2["view"][0] == 160
    assert got2["click"][1] + got2["view"][1] == 20
    # per-key totals are monotone across the restart
    for k in ("click", "view"):
        assert got2[k][0] >= got1[k][0]
        assert got2[k][1] >= got1[k][1]


def test_deduplicate_stream_drops_redelivered_keys(spark, tmp_path):
    """At-least-once ingest: the same doc_id re-delivered across
    micro-batch files must survive exactly once (first arrival wins),
    with state bounded by the watermark."""
    import uuid

    from dsci_524_g26_data_validation_spark.streaming import deduplicate_stream

    src = tmp_path / "src"
    src.mkdir()
    schema = "doc_id bigint, ts timestamp, text string"
    spark.createDataFrame(
        [(i, dt.datetime(2026, 1, 1, 10, 0, i % 60), f"doc {i}") for i in range(50)],
        schema,
    ).coalesce(1).write.mode("append").parquet(str(src))
    # second file re-delivers ids 0..24 plus 25 new ids
    spark.createDataFrame(
        [(i, dt.datetime(2026, 1, 1, 10, 1, i % 60), f"doc {i}") for i in range(25)]
        + [(i, dt.datetime(2026, 1, 1, 10, 1, i % 60), f"doc {i}") for i in range(50, 75)],
        schema,
    ).coalesce(1).write.mode("append").parquet(str(src))

    stream = spark.readStream.schema(schema).parquet(str(src))
    deduped = deduplicate_stream(
        stream, id_cols=("doc_id",), time_col="ts", watermark_delay="1 hour"
    )
    name = f"dd_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table(name).select("doc_id").collect()
    ids = [r["doc_id"] for r in got]
    assert sorted(ids) == sorted(set(ids)) == list(range(75))


def test_deduplicate_stream_by_content(spark, tmp_path):
    import uuid

    from dsci_524_g26_data_validation_spark.streaming import (
        deduplicate_stream_by_content,
    )

    src = tmp_path / "src"
    src.mkdir()
    schema = "doc_id bigint, ts timestamp, text string"
    # distinct ids but only 10 distinct bodies
    spark.createDataFrame(
        [(i, dt.datetime(2026, 1, 1, 12, 0, i % 60), f"body {i % 10}") for i in range(40)],
        schema,
    ).coalesce(1).write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(schema).parquet(str(src))
    deduped = deduplicate_stream_by_content(
        stream, content_cols=("text",), time_col="ts", watermark_delay="1 hour"
    )
    name = f"dc_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.table(name).collect()
    assert len(rows) == 10
    assert len({r["content_digest"] for r in rows}) == 10


def test_category_drift_stream_matches_batch_formula(spark, event_files):
    """Per-window PSI/JS vs declared priors, cross-checked against the
    batch scorers on the same windows (novel values pooled)."""
    import math

    from dsci_524_g26_data_validation_spark.streaming import (
        category_drift_stream,
    )

    baseline = dv.Histogram(
        labels=("click", "view"), fracs=(0.5, 0.5), kind="categorical"
    )
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(event_files)
    drift = category_drift_stream(
        stream, baseline, column="event_type", time_col="ts",
        window_duration="1 minute",
    )
    q = (
        drift.writeStream.format("memory")
        .queryName("cd")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["window_start"].minute: r
        for r in spark.sql("select * from cd").collect()
    }
    batch = spark.read.parquet(event_files)
    for minute in (0, 1):
        rows = batch.filter(F.minute("ts") == minute)
        n = rows.count()
        counts = {
            r["event_type"]: r["count"]
            for r in rows.groupBy("event_type").count().collect()
        }
        obs = {
            "click": counts.get("click", 0) / n,
            "view": counts.get("view", 0) / n,
            "novel": sum(v for k, v in counts.items()
                         if k not in ("click", "view")) / n,
        }
        eps = 1e-6
        psi = sum(
            (max(p, eps) - max(q, eps)) * math.log(max(p, eps) / max(q, eps))
            for p, q in [(obs["click"], 0.5), (obs["view"], 0.5),
                         (obs["novel"], 0.0)]
        )
        r = got[minute]
        assert r["n_rows"] == n and r["n_observed"] == n
        assert r["psi"] == pytest.approx(psi, abs=1e-6)
        assert r["novel_frac"] == pytest.approx(obs["novel"], abs=1e-6)
        assert 0.0 <= r["js"] <= 1.0


def test_category_drift_stream_rejects_numeric_baseline(spark, event_files):
    from dsci_524_g26_data_validation_spark.streaming import (
        category_drift_stream,
    )

    hist = dv.Histogram(labels=("0", "1"), fracs=(0.5, 0.5), kind="numeric",
                        lo=0.0, hi=1.0, n_bins=1)
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(event_files)
    with pytest.raises(ValueError, match="categorical"):
        category_drift_stream(
            stream, hist, column="event_type", time_col="ts"
        )


def test_histogram_drift_stream_numeric_bins_match_batch(spark, event_files):
    """Numeric baseline: the stream bins with the same equi-width rule
    as the batch `_bucket_label` (underflow/overflow pool as novel)."""
    from dsci_524_g26_data_validation_spark.streaming import (
        histogram_drift_stream,
    )

    baseline = dv.Histogram(
        labels=("1", "2"), fracs=(0.5, 0.5), kind="numeric",
        lo=0.0, hi=100.0, n_bins=2,
    )
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(event_files)
    drift = histogram_drift_stream(
        stream, baseline, column="value", time_col="ts",
        window_duration="1 minute",
    )
    q = (
        drift.writeStream.format("memory")
        .queryName("nd")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["window_start"].minute: r
           for r in spark.sql("select * from nd").collect()}
    batch = spark.read.parquet(event_files)
    for minute in (0, 1):
        rows = batch.filter(F.minute("ts") == minute)
        n = rows.count()
        over = rows.filter("value >= 100 OR value < 0").count()
        r = got[minute]
        assert r["n_observed"] == n
        assert r["novel_frac"] == pytest.approx(over / n, abs=1e-6)
        assert r["psi"] > 0  # the fixture's values are not uniform


def test_boolean_baseline_matches_batch_capture(spark, tmp_path):
    """r3 review fix: a batch-captured boolean baseline renders
    'True'/'False' (pandas-style); the stream must bucket identically
    or every row pools as novel (permanent max-drift alarm)."""
    from dsci_524_g26_data_validation_spark.streaming import (
        category_drift_stream,
    )

    import datetime as dt

    rows = [
        (i, dt.datetime(2026, 1, 1, 12, 0, i % 60), i % 3 == 0)
        for i in range(90)
    ]
    df = spark.createDataFrame(rows, "id bigint, ts timestamp, flag boolean")
    path = str(tmp_path / "flags")
    df.write.parquet(path)
    baseline = dv.capture_histograms(df, categorical_cols=["flag"])["flag"]
    assert set(baseline.labels) == {"True", "False"}
    stream = spark.readStream.schema(
        "id bigint, ts timestamp, flag boolean"
    ).parquet(path)
    drift = category_drift_stream(
        stream, baseline, column="flag", time_col="ts",
        window_duration="1 minute",
    )
    q = (
        drift.writeStream.format("memory")
        .queryName("bd")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    r = spark.sql("select * from bd").first()
    # identical data vs its own baseline: zero drift, zero novel mass
    assert r["novel_frac"] == 0.0
    assert r["psi"] == pytest.approx(0.0, abs=1e-6)


def test_json_violation_counts_stream(spark, tmp_path):
    """Windowed JSON payload monitor: per-minute per-rule violation
    counts match the hand-planted payload faults; the __payload__ row is
    zero-inclusive for the clean minute."""
    import datetime as dt2

    from dsci_524_g26_data_validation_spark import JsonFieldRule
    from dsci_524_g26_data_validation_spark.streaming import (
        json_violation_counts_stream,
    )

    base = dt2.datetime(2026, 1, 1, 12, 0, 0)
    rows = []
    for i in range(60):
        minute = i % 2
        if minute == 0:
            props = '{"k": 5}'                      # clean
        else:
            props = (
                "not json" if i % 10 == 1           # payload rot
                else '{"k": 9999}' if i % 10 == 3   # range
                else '{"k": 5}'
            )
        rows.append(
            (i, base + dt2.timedelta(minutes=minute, seconds=i % 50), props)
        )
    schema = "event_id bigint, ts timestamp, props string"
    path = str(tmp_path / "json_events_in")
    spark.createDataFrame(rows, schema).repartition(2).write.parquet(path)

    stream = spark.readStream.schema(schema).parquet(path)
    counted = json_violation_counts_stream(
        stream,
        [JsonFieldRule(field="k", required=True, dtype="integer",
                       min_value=0, max_value=100)],
        col="props",
        time_col="ts",
        window_duration="1 minute",
        watermark_delay="5 minutes",
    )
    q = (
        counted.writeStream.format("memory")
        .queryName("jvc_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_jvc"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = {
        (r["window_start"].minute, r["rule"]): r.asDict()
        for r in spark.table("jvc_test").collect()
    }
    # minute 0: 30 clean rows, no violations anywhere
    assert out[(0, "$.k")]["n_violations"] == 0
    assert out[(0, "__payload__")]["n_violations"] == 0
    assert out[(0, "$.k")]["n_rows"] == 30
    # minute 1 (odd i): i%10==1 -> 6 payload-rot rows; i%10==3 -> 6 range
    assert out[(1, "__payload__")]["n_violations"] == 6
    assert out[(1, "$.k")]["n_violations"] == 6
    assert out[(1, "$.k")]["n_rows"] == 30
