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


def test_clustering_report_sorted_vs_interleaved(spark, tmp_path):
    from dsci_524_g26_data_validation_spark.sources.files import (
        clustering_report,
    )

    # sorted layout: disjoint key ranges per file
    sorted_rows = (
        [("a", i) for i in range(0, 10)]
        + [("b", i) for i in range(10, 20)]
        + [("c", i) for i in range(20, 30)]
    )
    sdf = spark.createDataFrame(sorted_rows, "shard string, k bigint")
    p1 = str(tmp_path / "sorted")
    sdf.repartition("shard").write.partitionBy("shard").parquet(p1)
    rep = clustering_report(
        file_census(spark.read.parquet(p1), key_col="k")
    ).first()
    assert rep.n_files == 3 and rep.n_overlapping_files == 0
    assert rep.overlap_frac == 0.0
    # spans 9+9+9 over global span 29
    assert rep.span_inflation == round(27 / 29, 6)

    # interleaved layout: every file covers the full key range
    inter_rows = [(s, i) for i in range(0, 30) for s in ("a", "b", "c")]
    idf = spark.createDataFrame(inter_rows, "shard string, k bigint")
    p2 = str(tmp_path / "interleaved")
    idf.repartition("shard").write.partitionBy("shard").parquet(p2)
    rep2 = clustering_report(
        file_census(spark.read.parquet(p2), key_col="k")
    ).first()
    # all but the first file overlap a predecessor
    assert rep2.n_overlapping_files == 2 and rep2.overlap_frac == round(2 / 3, 6)
    assert rep2.span_inflation == 3.0


def test_clustering_report_requires_key(spark, shard_dir):
    from dsci_524_g26_data_validation_spark.sources.files import (
        clustering_report,
    )

    census = file_census(spark.read.parquet(shard_dir))
    with pytest.raises(ValueError, match="key_col"):
        clustering_report(census)
