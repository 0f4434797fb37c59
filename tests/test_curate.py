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
