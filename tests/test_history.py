"""Cross-run manifest history (sources/manifest.py): long-format
read-back, numeric casting, per-run metric series, change-point glue,
sketch-mode join overlap census (operators/joins.py)."""

import pytest
from pyspark.sql import functions as F

import dsci_524_g26_data_validation_spark as dv
from dsci_524_g26_data_validation_spark.operators.joins import key_overlap_sketch


@pytest.fixture()
def manifest_root(tmp_path):
    root = str(tmp_path / "manifests")
    # 6 runs: violation count stable at ~10 then jumps to ~50 (run 4+)
    for i, total in enumerate([10, 11, 9, 50, 52, 51]):
        store = dv.FileManifestStore(root, run_id=f"run{i:02d}")
        store.record(
            "src=a",
            {"violations": total - 4, "rows": 1000, "note": "clean"},
        )
        store.record("src=b", {"violations": 4, "rows": 2000})
    return root


def test_history_long_format(spark, manifest_root):
    h = dv.run_history(spark, manifest_root)
    assert h.count() == 6 * (3 + 2)  # run0 has 3 metrics on src=a, 2 on src=b
    row = h.filter(
        (F.col("run_id") == "run00")
        & (F.col("partition") == "src=a")
        & (F.col("metric") == "violations")
    ).first()
    assert row.value == 6.0 and row.value_str == "6"
    # non-numeric metric survives as value_str, value NULL
    note = h.filter(F.col("metric") == "note").first()
    assert note.value is None and note.value_str == "clean"


def test_metric_series_sums_partitions(spark, manifest_root):
    h = dv.run_history(spark, manifest_root)
    s = dv.metric_series(h, "violations").collect()
    assert [r.run_id for r in s] == [f"run{i:02d}" for i in range(6)]
    assert [int(r.value) for r in s] == [10, 11, 9, 50, 52, 51]
    only_b = dv.metric_series(h, "violations", partition="src=b").collect()
    assert all(int(r.value) == 4 for r in only_b)


def test_series_feeds_change_point(spark, manifest_root):
    h = dv.run_history(spark, manifest_root)
    s = dv.metric_series(h, "violations")
    cp = dv.change_point_report(
        s, order_col="finished_at", value_col="value"
    ).first()
    assert cp.n_before == 3 and cp.n_after == 3
    assert cp.mean_before == pytest.approx(10.0)
    assert cp.mean_after == pytest.approx(51.0)


def test_key_overlap_sketch_regimes(spark):
    left = spark.createDataFrame([(i,) for i in range(2000)], "k int")
    right = spark.createDataFrame(
        [(i,) for i in range(1000, 3000)] + [(None,)], "k int"
    )
    r = key_overlap_sketch(left, right, ["k"]).first()
    # true: |A|=2000 |B|=2000 |A∩B|=1000 |A∪B|=3000 (NULL excluded)
    assert r.n_keys_left_est == pytest.approx(2000, rel=0.05)
    assert r.n_keys_right_est == pytest.approx(2000, rel=0.05)
    assert r.n_union_est == pytest.approx(3000, rel=0.05)
    assert r.n_shared_est == pytest.approx(1000, rel=0.25)
    assert r.containment_left == pytest.approx(0.5, abs=0.15)
    assert r.jaccard_est == pytest.approx(1 / 3, abs=0.1)


def test_key_overlap_sketch_disjoint_clamps(spark):
    left = spark.createDataFrame([(i,) for i in range(500)], "k int")
    right = spark.createDataFrame([(i,) for i in range(10000, 10500)], "k int")
    r = key_overlap_sketch(left, right, ["k"]).first()
    assert r.n_shared_est >= 0  # inclusion-exclusion clamped, never negative
    assert r.n_shared_est < 100
    assert r.regime == "disjoint"


def test_key_overlap_sketch_contained_regime(spark):
    # right ⊂ left: containment_right ≈ 1 regardless of size ratio
    left = spark.createDataFrame([(i,) for i in range(5000)], "k int")
    right = spark.createDataFrame([(i,) for i in range(500)], "k int")
    r = key_overlap_sketch(left, right, ["k"]).first()
    assert r.containment_right == pytest.approx(1.0, abs=0.1)
    assert r.regime == "contained"
    # equal key sets are "contained" too (both containments ~1)
    r2 = key_overlap_sketch(left, left, ["k"]).first()
    assert r2.regime == "contained"


def test_key_overlap_sketch_small_overlap_blowup_keeps_label(spark):
    # THE documented error-contract case: true overlap (20 keys) is far
    # below the subtraction noise of two ~5k-key sketches, so the
    # ESTIMATE is untrustworthy (may be 0 or several times the truth) —
    # but the triage label must still read "disjoint" (≈ nothing within
    # sketch noise), never "overlapping". This is the executable form
    # of the docstring's small-overlap caveat.
    left = spark.createDataFrame([(i,) for i in range(5000)], "k int")
    right = spark.createDataFrame(
        [(i,) for i in range(4980, 10000)], "k int"
    )
    r = key_overlap_sketch(left, right, ["k"]).first()
    assert r.regime == "disjoint"
    # and the clamp still holds
    assert r.n_shared_est >= 0


def test_key_overlap_sketch_overlapping_regime(spark):
    # genuine ~50% overlap: neither contained nor disjoint
    left = spark.createDataFrame([(i,) for i in range(2000)], "k int")
    right = spark.createDataFrame([(i,) for i in range(1000, 3000)], "k int")
    r = key_overlap_sketch(left, right, ["k"]).first()
    assert r.regime == "overlapping"


def test_key_overlap_sketch_composite_keys(spark):
    left = spark.createDataFrame(
        [(i % 10, i // 10) for i in range(400)], "a int, b int"
    )
    r = key_overlap_sketch(left, left, ["a", "b"]).first()
    assert r.n_keys_left_est == pytest.approx(400, rel=0.05)
    assert r.jaccard_est == pytest.approx(1.0, abs=0.05)
    with pytest.raises(ValueError, match="at least one"):
        key_overlap_sketch(left, left, [])
    with pytest.raises(ValueError, match="lg_k"):
        key_overlap_sketch(left, left, ["a"], lg_k=30)


def test_run_history_empty_root_returns_empty(spark, tmp_path):
    # fresh root, no completed runs: empty frame, not PATH_NOT_FOUND
    root = str(tmp_path / "nothing_here")
    h = dv.run_history(spark, root)
    assert h.count() == 0
    assert "metric" in h.columns and "value" in h.columns


def test_run_history_root_with_glob_metachars(spark, tmp_path):
    # '[' and '?' in the root must not defeat the driver-side glob probe
    # (glob.escape): records written under such a root read back fine
    root = str(tmp_path / "runs [prod]")
    store = dv.FileManifestStore(root, run_id="run00")
    store.record("src=a", {"violations": 7})
    h = dv.run_history(spark, root)
    assert h.count() == 1
    assert h.first()["value"] == 7.0


def test_run_history_missing_remote_style_root_is_empty(spark, tmp_path):
    # a root WITH a URI scheme skips the local glob probe; a missing
    # path then maps Spark's PATH_NOT_FOUND to the empty frame instead
    # of silently treating a real remote root as history-less
    root = "file://" + str(tmp_path / "remote_nothing")
    h = dv.run_history(spark, root)
    assert h.count() == 0
    assert "metric" in h.columns


def test_key_overlap_sketch_separator_injective(spark):
    # composite tuples ('a\x1fb','c') vs ('a','b\x1fc') are DISJOINT;
    # a concat_ws rendering would conflate them into full overlap
    left = spark.createDataFrame([("a\x1fb", "c")], ["a", "b"])
    right = spark.createDataFrame([("a", "b\x1fc")], ["a", "b"])
    r = key_overlap_sketch(left, right, ["a", "b"]).first()
    assert r["n_shared_est"] == 0.0
