"""End-to-end curation pipeline (operators/curate.py): recipe
correctness against hand-computable inputs, per-stage manifest resume
(including a mid-stage kill), and config-edit invalidation via the
chained fingerprint."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

import dsci_524_g26_data_validation_spark as dv
from dsci_524_g26_data_validation_spark.operators import curate as cur


def _corpus(spark):
    # 12 docs: 3, 7 duplicate 1's text; 9 contains the benchmark 4-gram;
    # 10 is too short for the quality gate; 11 has a banned word.
    rows = [
        (1, "alpha beta gamma delta epsilon zeta", "web"),
        (2, "one two three four five six seven", "web"),
        (3, "alpha beta gamma delta epsilon zeta", "web"),      # dup of 1
        (4, "quick brown fox jumps over lazy dog", "books"),
        (5, "pack my box with five dozen liquor jugs", "books"),
        (6, "sphinx of black quartz judge my vow today", "books"),
        (7, "alpha beta gamma delta epsilon zeta", "wiki"),     # dup of 1
        (8, "jived fox nymph grabs quick waltz often", "wiki"),
        (9, "leaked answer key alpha bravo charlie delta", "wiki"),
        (10, "too short", "web"),                                # quality kill
        (11, "spam spam spam spam spam spam spam spam", "web"),  # banned
        (12, "crisp fall air lifts the morning fog away", "books"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def _benchmark(spark):
    return spark.createDataFrame(
        [(100, "the answer key alpha bravo charlie delta is here")],
        "bench_id long, text string",
    )


FILTERS = [
    ("min_words", "size(split(text, ' ')) >= 5"),
    ("no_spam", "NOT text LIKE '%spam%'"),
]


def _run(spark, workdir, **kw):
    return dv.curate(
        _corpus(spark),
        workdir=workdir,
        benchmark=_benchmark(spark),
        contamination_ngram=4,
        filters=FILTERS,
        splits={"train": 0.8, "val": 0.2},
        n_shards=2,
        **kw,
    )


def test_curate_recipe_correctness(spark, tmp_path):
    res = _run(spark, str(tmp_path / "w"))
    got = {r["doc_id"] for r in res.admitted.collect()}
    # dropped: 3,7 (dup keep-one), 9 (contaminated), 10 (short), 11 (spam)
    assert got == {1, 2, 4, 5, 6, 8, 12}
    cols = set(res.admitted.columns)
    assert {"split", "shard"} <= cols
    stages = {r["stage"]: r for r in res.report}
    assert stages["dedup"]["n_dropped"] == 2
    assert stages["decontaminate"]["n_dropped"] == 1
    assert stages["quality:min_words"]["n_dropped"] == 1
    assert stages["quality:no_spam"]["n_dropped"] == 1
    assert stages["assemble"]["n_admitted"] == 7
    assert res.resumed_stages == []
    # deterministic: same config + fresh workdir -> identical admitted set
    res2 = _run(spark, str(tmp_path / "w2"))
    assert {r["doc_id"] for r in res2.admitted.collect()} == got


def test_curate_full_resume_skips_every_stage(spark, tmp_path, monkeypatch):
    wd = str(tmp_path / "w")
    first = _run(spark, wd)
    # poison the expensive builders: a resume that recomputes would blow up
    monkeypatch.setattr(
        cur, "exact_dropped_ids",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("recomputed dedup")),
    )
    monkeypatch.setattr(
        cur, "contaminated_ids",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("recomputed decon")),
    )
    second = _run(spark, wd)
    assert set(second.resumed_stages) == {
        "dedup", "decontaminate", "quality", "assemble"
    }
    assert {r["doc_id"] for r in second.admitted.collect()} == {
        r["doc_id"] for r in first.admitted.collect()
    }
    # the resumed report still carries every stage's census
    assert {r["stage"] for r in second.report} == {r["stage"] for r in first.report}


def test_curate_mid_stage_kill_recomputes_that_stage(spark, tmp_path):
    """A job killed mid-write leaves a sidecar without a manifest record;
    the rerun must redo that stage (and downstream) but keep completed
    upstream stages."""
    wd = str(tmp_path / "w")
    first = _run(spark, wd)
    first_ids = {r["doc_id"] for r in first.admitted.collect()}
    run_dir = os.path.join(wd, "curate")
    # simulate the kill: decontaminate's manifest record vanishes and its
    # sidecar is left half-built (no _SUCCESS)
    removed = [
        f for f in os.listdir(run_dir) if "decontaminate" in f and f.endswith(".json")
    ]
    assert len(removed) == 1
    os.remove(os.path.join(run_dir, removed[0]))
    shutil.rmtree(os.path.join(run_dir, "sidecar-decontaminate"))
    os.makedirs(os.path.join(run_dir, "sidecar-decontaminate"))  # partial dir
    # assemble depends on decontaminate's output; drop its record too so the
    # rerun rebuilds the final corpus from the recomputed decision set
    for f in os.listdir(run_dir):
        if "assemble" in f and f.endswith(".json"):
            os.remove(os.path.join(run_dir, f))

    second = _run(spark, wd)
    assert "dedup" in second.resumed_stages          # upstream kept
    assert "decontaminate" not in second.resumed_stages  # recomputed
    assert {r["doc_id"] for r in second.admitted.collect()} == first_ids


def test_curate_config_edit_invalidates_downstream(spark, tmp_path):
    """Changing a stage's parameters re-runs it and everything after it
    (chained fingerprint), while stages before it resume."""
    wd = str(tmp_path / "w")
    _run(spark, wd)
    # loosen the quality gate: doc 11 (spam) is now admitted
    looser = [("min_words", "size(split(text, ' ')) >= 5")]
    res = dv.curate(
        _corpus(spark),
        workdir=wd,
        benchmark=_benchmark(spark),
        contamination_ngram=4,
        filters=looser,
        splits={"train": 0.8, "val": 0.2},
        n_shards=2,
    )
    assert "dedup" in res.resumed_stages
    assert "decontaminate" in res.resumed_stages
    assert "quality" not in res.resumed_stages
    assert "assemble" not in res.resumed_stages
    got = {r["doc_id"] for r in res.admitted.collect()}
    assert 11 in got and got == {1, 2, 4, 5, 6, 8, 11, 12}


def test_curate_mixture_downsampling(spark, tmp_path):
    """mixture rates: 0.0 drops a group entirely, 1.0 keeps everything,
    unknown groups default to keep-all."""
    res = dv.curate(
        _corpus(spark),
        workdir=str(tmp_path / "w"),
        dedup=False,
        mixture={"web": 0.0, "books": 1.0},
    )
    srcs = {r["source"] for r in res.admitted.collect()}
    assert "web" not in srcs
    assert "books" in srcs and "wiki" in srcs  # wiki unmentioned -> kept


def test_curate_filter_must_be_sql_string(spark, tmp_path):
    with pytest.raises(TypeError, match="SQL strings"):
        dv.curate(
            _corpus(spark),
            workdir=str(tmp_path / "w"),
            filters=[("bad", F.col("text").isNotNull())],
        )


def test_curate_custom_id_col_with_benchmark(spark, tmp_path):
    """Regression: contaminated_ids always emits the literal column
    'doc_id'; curate must rename THAT sidecar column for the anti-join,
    not assume it carries the caller's id_col — a non-default id_col
    with a benchmark used to crash analysis (UNRESOLVED_COLUMN)."""
    corpus = _corpus(spark).withColumnRenamed("doc_id", "id")
    res = dv.curate(
        corpus,
        workdir=str(tmp_path / "w"),
        id_col="id",
        benchmark=_benchmark(spark),
        contamination_ngram=4,
        filters=FILTERS,
    )
    got = {r["id"] for r in res.admitted.collect()}
    assert got == {1, 2, 4, 5, 6, 8, 12}


def test_curate_benchmark_swap_invalidates_sidecar(spark, tmp_path):
    """Swapping the benchmark with the SAME workdir must re-run
    decontamination — the stage fingerprint covers the benchmark's
    content, so the stale contaminated-id sidecar is never reused."""
    w = str(tmp_path / "w")
    res1 = _run(spark, w)
    assert {r["doc_id"] for r in res1.admitted.collect()} == {
        1, 2, 4, 5, 6, 8, 12
    }
    # new benchmark contaminating doc 8 instead of doc 9
    bench2 = spark.createDataFrame(
        [(200, "the jived fox nymph grabs quick waltz anywhere")],
        "bench_id long, text string",
    )
    res2 = dv.curate(
        _corpus(spark),
        workdir=w,
        benchmark=bench2,
        contamination_ngram=4,
        filters=FILTERS,
        splits={"train": 0.8, "val": 0.2},
        n_shards=2,
    )
    assert "decontaminate" not in res2.resumed_stages
    got2 = {r["doc_id"] for r in res2.admitted.collect()}
    assert 8 not in got2 and 9 in got2
    # dedup's input/params were untouched -> still resumed
    assert "dedup" in res2.resumed_stages


def test_mixture_cutoff_uses_rounding_not_truncation(spark):
    """0.3 * 1e6 floats to 299999.99999...; the keep predicate must use
    the driver-side int(round(...)) cutoff (300000) like hash_sample and
    assign_splits — an engine-side bigint cast truncates to 299999,
    silently dropping bucket 299999's rows vs the documented 1e-6
    resolution and the DuckDB oracle's rounding."""
    from dsci_524_g26_data_validation_spark.operators.sampling import (
        _BUCKETS,
        portable_hash64,
    )

    ids = spark.range(0, 5000).select(
        F.col("id").alias("doc_id"), F.lit("g").alias("source")
    )
    kept = ids.filter(
        cur._mixture_keep_expr(
            {"g": 0.3}, group_col="source", id_col="doc_id", salt="s"
        )
    )
    bucket = F.pmod(
        portable_hash64(F.concat(F.lit("s"), F.col("doc_id").cast("string"))),
        F.lit(_BUCKETS),
    )
    expected = ids.filter(bucket < F.lit(int(round(0.3 * _BUCKETS))))
    assert kept.count() == expected.count()
    assert kept.exceptAll(expected).count() == 0
