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


# --- within-file sort-order validation -----------------------------------


def _write_single_file(spark, rows, schema, path):
    """Write rows as exactly ONE parquet file in exactly this order
    (single partition, order preserved by createDataFrame + write)."""
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(path)


def test_file_order_census_sorted_file(spark, tmp_path):
    from dsci_524_g26_data_validation_spark.sources.files import (
        file_order_census,
    )

    p = str(tmp_path / "sorted1")
    _write_single_file(
        spark, [(i, f"d{i}") for i in range(50)], "k bigint, s string", p
    )
    got = file_order_census(spark.read.parquet(p), "k").collect()
    assert len(got) == 1
    r = got[0]
    assert (r.n_rows, r.n_null_keys) == (50, 0)
    assert (r.n_pairs, r.n_inversions) == (49, 0)
    assert r.is_sorted and r.sorted_frac == 1.0
    assert (r.key_min, r.key_max) == (0, 49)


def test_file_order_census_exact_inversions(spark, tmp_path):
    from dsci_524_g26_data_validation_spark.sources.files import (
        file_order_census,
    )

    # physical order 3,1,2 -> adjacent pairs (3,1) inverted, (1,2) fine
    p = str(tmp_path / "perm")
    _write_single_file(spark, [(3,), (1,), (2,)], "k bigint", p)
    r = file_order_census(spark.read.parquet(p), "k").first()
    assert (r.n_pairs, r.n_inversions) == (2, 1)
    assert not r.is_sorted and r.sorted_frac == 0.5
    # descending: pairs (3,1),(1,2) -> one ascent
    r2 = file_order_census(
        spark.read.parquet(p), "k", descending=True
    ).first()
    assert (r2.n_pairs, r2.n_inversions) == (2, 1)


def test_file_order_census_null_bridging(spark, tmp_path):
    from dsci_524_g26_data_validation_spark.sources.files import (
        file_order_census,
    )

    # 1, NULL, 5, 2 -> non-null sequence 1,5,2: pairs (1,5) ok, (5,2) inv
    p = str(tmp_path / "withnull")
    _write_single_file(spark, [(1,), (None,), (5,), (2,)], "k bigint", p)
    r = file_order_census(spark.read.parquet(p), "k").first()
    assert r.n_rows == 4 and r.n_null_keys == 1
    assert (r.n_pairs, r.n_inversions) == (2, 1)


def test_file_order_census_multi_file_and_summary(spark, tmp_path):
    from dsci_524_g26_data_validation_spark.sources.files import (
        file_order_census,
        file_order_summary,
    )

    base = tmp_path / "multi"
    _write_single_file(
        spark, [(i,) for i in range(10)], "k bigint", str(base / "s=good")
    )
    _write_single_file(
        spark, [(9,), (0,), (5,), (3,)], "k bigint", str(base / "s=bad")
    )
    census = file_order_census(spark.read.parquet(str(base)), "k")
    by_file = {("good" if "s=good" in r.file else "bad"): r for r in census.collect()}
    assert by_file["good"].is_sorted
    # 9,0,5,3 -> pairs (9,0) inv, (0,5) ok, (5,3) inv
    assert (by_file["bad"].n_pairs, by_file["bad"].n_inversions) == (3, 2)
    s = file_order_summary(census).first()
    assert (s.n_files, s.n_sorted_files) == (2, 1)
    assert s.sorted_file_frac == 0.5
    assert (s.n_pairs, s.n_inversions) == (12, 2)
    assert s.global_sorted_frac == round(1 - 2 / 12, 6)


def test_file_order_census_segment_boundaries(spark, tmp_path):
    """Force one file to split across many input partitions: segment
    fold must stitch boundaries back in physical order and still report
    a perfectly sorted file."""
    from dsci_524_g26_data_validation_spark.sources.files import (
        file_order_census,
    )

    p = str(tmp_path / "bigsorted")
    # small parquet row groups: a parquet split can only start at a
    # row-group boundary, so a single-group file never splits
    spark.createDataFrame(
        [(i, "x" * 50) for i in range(20000)], "k bigint, pad string"
    ).coalesce(1).write.option("parquet.block.size", 65536).parquet(p)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
        census = file_order_census(spark.read.parquet(p), "k")
        r = census.first()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert r.n_rows == 20000
    assert r.n_segments > 1  # the split actually happened
    assert r.is_sorted and r.n_inversions == 0 and r.n_pairs == 19999
    assert (r.key_min, r.key_max) == (0, 19999)


def test_file_order_census_feeds_clustering_report(spark, tmp_path):
    """key_min/key_max in the order census make it a valid
    clustering_report input: one pass answers both layout questions."""
    from dsci_524_g26_data_validation_spark.sources.files import (
        clustering_report,
        file_order_census,
    )

    base = tmp_path / "combo"
    _write_single_file(
        spark, [(i,) for i in range(0, 10)], "k bigint", str(base / "s=a")
    )
    _write_single_file(
        spark, [(i,) for i in range(10, 20)], "k bigint", str(base / "s=b")
    )
    census = file_order_census(spark.read.parquet(str(base)), "k")
    rep = clustering_report(census).first()
    assert rep.n_files == 2 and rep.n_overlapping_files == 0


def test_file_order_census_single_scan(spark, tmp_path):
    from dsci_524_g26_data_validation_spark.sources.files import (
        file_order_census,
    )

    p = str(tmp_path / "plan")
    _write_single_file(spark, [(i,) for i in range(10)], "k bigint", p)
    out = file_order_census(spark.read.parquet(p), "k")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1
