"""Deterministic shard assignment / plan / writer."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dsci_524_g26_data_validation_spark.sources import shards


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
        (F.col("id") % 7).alias("w"),
    )


def test_assign_shards_deterministic_and_in_range(spark):
    df = _docs(spark)
    a = shards.assign_shards(df, id_col="doc_id", n_shards=8)
    b = shards.assign_shards(df, id_col="doc_id", n_shards=8)
    rows_a = {r["doc_id"]: r["shard"] for r in a.collect()}
    rows_b = {r["doc_id"]: r["shard"] for r in b.collect()}
    assert rows_a == rows_b  # pure function of id
    assert set(rows_a.values()) <= set(range(8))
    # salt re-deals the mapping
    c = {
        r["doc_id"]: r["shard"]
        for r in shards.assign_shards(
            df, id_col="doc_id", n_shards=8, salt="epoch2"
        ).collect()
    }
    assert c != rows_a


def test_assign_shards_validates_n(spark):
    with pytest.raises(ValueError, match="n_shards"):
        shards.assign_shards(_docs(spark), id_col="doc_id", n_shards=0)


def test_shard_plan_sums_and_balance(spark):
    df = _docs(spark, 400)
    plan = shards.shard_plan(
        df, id_col="doc_id", n_shards=4, weight_col="w"
    ).collect()
    assert len(plan) == 4
    assert sum(r["n_rows"] for r in plan) == 400
    assert abs(sum(r["row_share"] for r in plan) - 1.0) < 1e-6
    for r in plan:
        # md5-uniform over 400 rows into 4 shards: loose sanity band
        assert 0.5 < r["balance_ratio"] < 1.5
        assert r["total_weight"] >= 0


def test_write_shards_roundtrip(spark, tmp_path):
    df = _docs(spark, 120)
    path = str(tmp_path / "shards_out")
    manifest = shards.write_shards(
        df, path, id_col="doc_id", n_shards=4, max_records_per_file=50
    )
    got = {r["shard"]: r["n_rows"] for r in manifest.collect()}
    want = {
        r["shard"]: r["n_rows"]
        for r in shards.shard_plan(df, id_col="doc_id", n_shards=4).collect()
    }
    assert got == want  # files match the pre-write plan exactly
    back = spark.read.parquet(path)
    assert back.count() == 120
    # membership is the same pure function the reader can recompute
    recomputed = shards.assign_shards(
        back.drop("shard"), id_col="doc_id", n_shards=4
    )
    mismatch = (
        back.select("doc_id", "shard")
        .join(recomputed.select("doc_id", F.col("shard").alias("s2")), "doc_id")
        .filter(F.col("shard") != F.col("s2"))
        .count()
    )
    assert mismatch == 0


def test_write_shards_single_shard(spark, tmp_path):
    df = _docs(spark, 10)
    path = str(tmp_path / "one")
    manifest = shards.write_shards(df, path, id_col="doc_id", n_shards=1)
    rows = manifest.collect()
    assert len(rows) == 1 and rows[0]["n_rows"] == 10 and rows[0]["shard"] == 0


def test_assign_shards_null_id_lands_in_a_real_shard(spark):
    """A NULL id must land in a deterministic shard 0..N-1 (the bare-salt
    hash), never shard NULL / __HIVE_DEFAULT_PARTITION__."""
    from dsci_524_g26_data_validation_spark.sources import shards

    df = spark.createDataFrame(
        [("a",), (None,), (None,)], "doc_id string"
    )
    got = shards.assign_shards(df, id_col="doc_id", n_shards=8).collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r.doc_id, set()).add(r.shard)
    assert all(s is not None and 0 <= s < 8 for ss in by_id.values() for s in ss)
    assert len(by_id[None]) == 1  # both NULL rows land together
