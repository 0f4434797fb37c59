"""Per-file health census (sources/files.py): counts, null fractions and
key ranges keyed to physical files; robust outlier flagging over the
file population. Files are controlled deterministically via a
partitioned write (each partition value = its own directory/file)."""

import pytest
from pyspark.sql import functions as F

from dsci_524_g26_data_validation_spark.sources.files import (
    file_census,
    flag_outlier_files,
)


@pytest.fixture()
def shard_dir(spark, tmp_path):
    """6 'shards' with planted faults: shard b has an all-NULL value
    column (sick writer), shard c overlaps a's key range AND is 10x the
    size (double-write); d/e/f are healthy equal-size shards so the
    robust scale has a genuine majority population."""
    rows = []
    rows += [("a", i, float(i)) for i in range(10)]            # keys 0-9
    rows += [("b", 100 + i, None) for i in range(10)]          # all-NULL v
    rows += [("c", i, float(i)) for i in range(100)]           # overlap + big
    rows += [("d", 200 + i, float(i)) for i in range(10)]
    rows += [("e", 300 + i, float(i)) for i in range(10)]
    rows += [("f", 400 + i, float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "shard string, k bigint, v double")
    path = str(tmp_path / "sharded")
    # one input partition per shard -> exactly one physical file per shard
    df.repartition("shard").write.partitionBy("shard").parquet(path)
    return path


def test_file_census_counts_nulls_ranges(spark, shard_dir):
    df = spark.read.parquet(shard_dir)
    got = file_census(df, null_cols=["v"], key_col="k").collect()
    by_shard = {}
    for r in got:
        assert "/shard=" in r.file  # keyed to the physical file
        by_shard[r.file.split("/shard=")[1].split("/")[0]] = r
    assert set(by_shard) == {"a", "b", "c", "d", "e", "f"}
    assert by_shard["a"].n_rows == 10
    assert by_shard["a"].v_null_frac == 0.0
    assert (by_shard["a"].key_min, by_shard["a"].key_max) == (0, 9)
    # sick writer: the all-NULL column is visible per file
    assert by_shard["b"].v_null_frac == 1.0
    # double-write: c's key range overlaps a's
    assert by_shard["c"].n_rows == 100
    assert by_shard["c"].key_min <= by_shard["a"].key_max


def test_flag_outlier_files_robust(spark, shard_dir):
    """The 10x file is flagged; the healthy equal-sized files are not —
    and the detector stays live when MAD degenerates (5 of 6 sizes
    equal -> MAD is 0; the meanAD fallback still scores the deviant)."""
    df = spark.read.parquet(shard_dir)
    census = file_census(df)
    flagged = {
        r.file.split("/shard=")[1].split("/")[0]: r.is_outlier
        for r in flag_outlier_files(census, threshold=3.5).collect()
    }
    assert flagged == {
        "a": False, "b": False, "c": True, "d": False, "e": False,
        "f": False,
    }


def test_file_census_single_scan(spark, shard_dir):
    df = spark.read.parquet(shard_dir)
    out = file_census(df, null_cols=["v"], key_col="k")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1
