"""CLI (spark-submit orchestration surface): infer → validate → compare →
table-validate with checkpoint resume, all through ``cli.main``."""

from __future__ import annotations

import json

import dsci_524_g26_data_validation_spark as dv
from dsci_524_g26_data_validation_spark.cli import main


def _last_json(capsys):
    out = capsys.readouterr().out.strip().splitlines()
    return json.loads(out[-1])


def test_cli_infer_validate_compare(spark, sf_dir, tmp_path, capsys):
    cpath = str(tmp_path / "c.json")
    assert main(["infer", "--input", f"{sf_dir}/orders.parquet",
                 "--output", cpath]) == 0
    assert _last_json(capsys)["n_columns"] == 6

    # validating the SAME data against its own inferred contract passes
    assert main(["validate", "--input", f"{sf_dir}/orders.parquet",
                 "--contract", cpath, "--fail"]) == 0
    assert _last_json(capsys)["ok"] is True

    # bigger sf naturally exceeds inferred bounds -> exit 1 with --fail
    rc = main(["validate", "--input", "/root/testdata/sf0.01/orders.parquet",
               "--contract", cpath, "--fail",
               "--violations-out", str(tmp_path / "viol")])
    assert rc == 1
    rep = _last_json(capsys)
    assert rep["ok"] is False and rep["counts_by_kind"]["range"] >= 1
    viol = spark.read.parquet(str(tmp_path / "viol"))
    assert viol.count() > 0 and "payload" in viol.columns

    assert main(["compare", "--old", cpath, "--new", cpath]) == 0
    assert _last_json(capsys)["has_drift"] is False


def test_cli_table_validate_with_resume(spark, tmp_path, capsys):
    data = str(tmp_path / "tokens")
    dv.token_table(spark, 3000, bad_ntok_frac=0.01, num_partitions=4).write.parquet(data)
    tc = dv.TableContract(
        contract=dv.Contract(
            columns={
                "doc_id": dv.ColumnRule(dtype="string"),
                "tokens": dv.ColumnRule(dtype="array<int>"),
                "n_tok": dv.ColumnRule(dtype="int"),
                "source": dv.ColumnRule(dtype="string"),
            }
        ),
        unique_keys=("doc_id",),
        invariants=("n_tok = size(tokens)",),
    )
    tcpath = str(tmp_path / "tc.json")
    with open(tcpath, "w") as f:
        f.write(dv.table_contract_to_json(tc))

    rc = main(["table-validate", "--input", data, "--table-contract", tcpath])
    assert rc == 0
    rep = _last_json(capsys)
    assert rep["ok"] is False
    assert {i["kind"] for i in rep["issues"]} == {"invariant"}

    # resumable run: first call validates every source partition...
    manifest = str(tmp_path / "manifest")
    rc = main(["table-validate", "--input", data, "--table-contract", tcpath,
               "--resume-manifest", manifest, "--partition-col", "source"])
    assert rc == 0
    first = _last_json(capsys)
    assert len(first["partitions_ran"]) == 4  # web/books/code/wiki
    # ...second call is a no-op (everything checkpointed)
    rc = main(["table-validate", "--input", data, "--table-contract", tcpath,
               "--resume-manifest", manifest, "--partition-col", "source"])
    assert rc == 0
    assert _last_json(capsys)["partitions_ran"] == {}


def test_cli_infer_profile_flag(spark, sf_dir, tmp_path, capsys):
    import json

    from dsci_524_g26_data_validation_spark.cli import main

    out = str(tmp_path / "c.json")
    assert main(["infer", "--input", f"{sf_dir}/orders.parquet",
                 "--output", out, "--profile"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_rows"] > 0
    tp = rep["profile"]["o_totalprice"]
    assert tp["quantiles"] is not None and len(tp["quantiles"]) == 3
    assert tp["min"] <= tp["quantiles"][0] <= tp["quantiles"][2] <= tp["max"]
    assert rep["profile"]["o_orderpriority"]["quantiles"] is None


def _near_dup_corpus(spark, path):
    """3 planted near-dup pairs (one-word edits of 40-word docs), one
    short doc fully contained in a long one, and unique filler."""
    base = " ".join(f"tok{i}" for i in range(40))
    near = " ".join(f"tok{i}" if i != 20 else "EDIT" for i in range(40))
    quote = " ".join(f"tok{i}" for i in range(10, 20))
    rows = [(0, base), (1, near), (2, quote)] + [
        (i, " ".join(f"w{i}_{j}" for j in range(30))) for i in range(3, 20)
    ]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(path)


def test_cli_near_dedup_minhash_modes(spark, tmp_path, capsys):
    src = str(tmp_path / "corpus")
    _near_dup_corpus(spark, src)
    out = str(tmp_path / "kept")

    # jaccard verify, min-id survivor: doc 1 drops, doc 0 survives
    assert main(["near-dedup", "--input", src, "--output", out,
                 "--mode", "minhash", "--threshold", "0.5"]) == 0
    rep = _last_json(capsys)
    assert rep["mode"] == "minhash" and rep["verify"] == "jaccard"
    kept_ids = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert 0 in kept_ids and 1 not in kept_ids and 2 in kept_ids

    # edit verify at a high threshold: the one-word edit still pairs
    assert main(["near-dedup", "--input", src, "--output", out,
                 "--mode", "minhash", "--verify", "edit",
                 "--threshold", "0.8", "--keep", "best"]) == 0
    rep = _last_json(capsys)
    assert rep["verify"] == "edit" and rep["keep"] == "best"
    kept = spark.read.parquet(out)
    kept_ids = {r.doc_id for r in kept.collect()}
    assert len(kept_ids & {0, 1}) == 1  # one member of the pair survives
    assert "_metric" not in kept.columns


def test_cli_near_dedup_containment(spark, tmp_path, capsys):
    src = str(tmp_path / "corpus")
    _near_dup_corpus(spark, src)
    out = str(tmp_path / "kept")
    # quote (doc 2) is contained in doc 0; --keep best keeps the
    # CONTAINER (longer text)
    assert main(["near-dedup", "--input", src, "--output", out,
                 "--mode", "containment", "--threshold", "0.9",
                 "--keep", "best"]) == 0
    rep = _last_json(capsys)
    assert rep["mode"] == "containment"
    kept_ids = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert 2 not in kept_ids and 0 in kept_ids


def test_cli_near_dedup_semantic(spark, sf_dir, tmp_path, capsys):
    out = str(tmp_path / "kept")
    assert main(["near-dedup", "--input", f"{sf_dir}/embeddings.parquet",
                 "--output", out, "--mode", "semantic",
                 "--id-col", "vec_id", "--threshold", "0.99"]) == 0
    rep = _last_json(capsys)
    assert rep["mode"] == "semantic"
    assert rep["rows_out"] + rep["rows_dropped"] == rep["rows_in"]
    assert spark.read.parquet(out).count() == rep["rows_out"]


def test_cli_near_dedup_flag_validation(spark, tmp_path):
    src = str(tmp_path / "corpus")
    _near_dup_corpus(spark, src)
    import pytest

    # --output required unless --init-index
    with pytest.raises(SystemExit, match="--output"):
        main(["near-dedup", "--input", src, "--mode", "minhash"])
    # flags that a mode silently ignored now refuse loudly
    with pytest.raises(SystemExit, match="do not apply"):
        main(["near-dedup", "--input", src, "--output",
              str(tmp_path / "o"), "--mode", "semantic",
              "--keep", "best"])
    with pytest.raises(SystemExit, match="does not apply"):
        main(["near-dedup", "--input", src, "--output",
              str(tmp_path / "o"), "--mode", "containment",
              "--verify", "edit"])


def test_cli_near_dedup_incremental(spark, tmp_path, capsys):
    corpus = str(tmp_path / "corpus")
    _near_dup_corpus(spark, corpus)
    idx = str(tmp_path / "index")
    # build the persisted index from the corpus — no --output needed
    assert main(["near-dedup", "--input", corpus,
                 "--mode", "incremental",
                 "--index-dir", idx, "--init-index"]) == 0
    assert _last_json(capsys)["indexed"] == 20

    # batch: one doc near-dups the indexed base (dropped), one novel
    base_edit = " ".join(
        f"tok{i}" if i != 5 else "OTHER" for i in range(40)
    )
    batch = str(tmp_path / "batch")
    spark.createDataFrame(
        [(100, base_edit), (101, " ".join(f"z{j}" for j in range(30)))],
        "doc_id bigint, text string",
    ).write.parquet(batch)
    out = str(tmp_path / "admitted")
    assert main(["near-dedup", "--input", batch, "--output", out,
                 "--mode", "incremental", "--index-dir", idx,
                 "--threshold", "0.5", "--update-index"]) == 0
    rep = _last_json(capsys)
    assert rep["rows_in"] == 2 and rep["rows_out"] == 1
    assert rep["index_updated"] is True
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {101}
    # the admitted doc joined the index: re-running the same batch
    # now drops BOTH members
    out2 = str(tmp_path / "admitted2")
    assert main(["near-dedup", "--input", batch, "--output", out2,
                 "--mode", "incremental", "--index-dir", idx,
                 "--threshold", "0.5"]) == 0
    assert _last_json(capsys)["rows_out"] == 0


def test_cli_near_dedup_incremental_custom_id_col(spark, tmp_path, capsys):
    # a non-default --id-col must flow to index_id_col too (the index
    # parquet carries the custom name; admit must select it, not doc_id)
    base = " ".join(f"tok{i}" for i in range(40))
    corpus = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(0, base), (1, " ".join(f"w{j}" for j in range(30)))],
        "uid bigint, text string",
    ).write.parquet(corpus)
    idx = str(tmp_path / "index")
    assert main(["near-dedup", "--input", corpus, "--mode", "incremental",
                 "--id-col", "uid", "--index-dir", idx,
                 "--init-index"]) == 0
    batch = str(tmp_path / "batch")
    near = " ".join(f"tok{i}" if i != 5 else "X" for i in range(40))
    spark.createDataFrame(
        [(100, near)], "uid bigint, text string"
    ).write.parquet(batch)
    out = str(tmp_path / "admitted")
    assert main(["near-dedup", "--input", batch, "--output", out,
                 "--mode", "incremental", "--id-col", "uid",
                 "--index-dir", idx, "--threshold", "0.5"]) == 0
    assert _last_json(capsys)["rows_out"] == 0  # near-dup of indexed doc


def test_cli_dedup_and_decontaminate(spark, tmp_path, capsys):
    src = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(i, f"document body {'x' if i < 90 else 'y'} {i % 45}") for i in range(100)],
        "doc_id bigint, text string",
    ).write.parquet(src)

    out = str(tmp_path / "deduped")
    assert main(["dedup", "--input", src, "--output", out]) == 0
    rep = _last_json(capsys)
    # ids 0..89 share 45 bodies (2 each), 90..99 share 45.. distinct mix:
    # exact groups = distinct texts
    n_distinct = spark.read.parquet(src).select("text").distinct().count()
    assert rep["rows_out"] == n_distinct
    assert rep["rows_in"] == 100 and rep["rows_dropped"] == 100 - n_distinct

    bench = str(tmp_path / "bench")
    spark.createDataFrame(
        [(1, "document body x 7")], "bench_id bigint, text string"
    ).write.parquet(bench)
    clean = str(tmp_path / "clean")
    assert main([
        "decontaminate", "--input", src, "--benchmark", bench,
        "--output", clean, "--ngram", "4",
    ]) == 0
    rep = _last_json(capsys)
    assert rep["rows_in"] == 100
    assert rep["rows_contaminated"] >= 1
    kept = spark.read.parquet(clean)
    assert kept.filter("text = 'document body x 7'").count() == 0


def test_spark_submit_py_files_end_to_end(tmp_path):
    """The north rule's deployment path, actually exercised: build the
    --py-files artifact (tools/make_pyfiles.py), then ``spark-submit
    --py-files dist/dv_engine.zip job.py`` in a FRESH JVM whose cwd and
    PYTHONPATH point away from the repo — so the engine imports from the
    zip alone — and run a real contract validation plus an Arrow UDF
    (executors must deserialize engine code shipped via --py-files)."""
    import os
    import shutil
    import subprocess
    import sys
    from pathlib import Path

    import pytest

    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    if not os.path.exists(spark_submit):
        pytest.skip("spark-submit not installed")
    repo = Path(__file__).resolve().parent.parent
    subprocess.run(
        [sys.executable, str(repo / "tools" / "make_pyfiles.py")],
        check=True,
        capture_output=True,
        cwd=str(repo),
    )
    zip_path = repo / "dist" / "dv_engine.zip"
    assert zip_path.exists()

    job = tmp_path / "job.py"
    job.write_text(
        "import json\n"
        "from pyspark.sql import SparkSession\n"
        "import dsci_524_g26_data_validation_spark as dv\n"
        "from dsci_524_g26_data_validation_spark import functions as dvf\n"
        "spark = SparkSession.builder.getOrCreate()\n"
        "df = spark.createDataFrame([(1, 10.0), (2, 99.0), (3, None)],\n"
        "                           'id bigint, score double')\n"
        "contract = dv.Contract(columns={\n"
        "    'id': dv.ColumnRule(dtype='bigint', min_value=0),\n"
        "    'score': dv.ColumnRule(dtype='double', max_value=50.0,\n"
        "                           max_missing_frac=0.5),\n"
        "})\n"
        "res = dv.validate_contract(df, contract)\n"
        "tdf = spark.createDataFrame([([1, 2], [1, 2]), ([1, 2], [1, 3])],\n"
        "                            'a array<int>, b array<int>')\n"
        "n_eq = tdf.select(dvf.arrays_equal_udf('a', 'b').alias('e'))\\\n"
        "          .filter('e').count()\n"
        "print('DV_RESULT ' + json.dumps({\n"
        "    'ok': res.ok,\n"
        "    'kinds': sorted(i.kind for i in res.issues),\n"
        "    'n_eq': n_eq,\n"
        "}))\n"
        "spark.stop()\n"
    )
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only import path
    r = subprocess.run(
        [
            spark_submit,
            "--master",
            "local[2]",
            "--py-files",
            str(zip_path),
            str(job),
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        env=env,
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("DV_RESULT ")][-1]
    rep = json.loads(line[len("DV_RESULT "):])
    # score max 99 > 50 -> range issue; 1/3 missing <= 0.5 -> no
    # missingness issue; the Arrow UDF found exactly one equal pair
    assert rep == {"ok": False, "kinds": ["range"], "n_eq": 1}


def test_cli_quarantine_routes_and_gates(spark, sf_dir, tmp_path, capsys):
    cpath = str(tmp_path / "c.json")
    # contract inferred from sf0.001 → sf0.01 naturally violates ranges
    assert main(["infer", "--input", f"{sf_dir}/orders.parquet",
                 "--output", cpath]) == 0
    capsys.readouterr()
    out = str(tmp_path / "routed")
    rc = main(["quarantine", "--input", "/root/testdata/sf0.01/orders.parquet",
               "--contract", cpath, "--output", out, "--fail"])
    rep = _last_json(capsys)
    assert rc == 1 and rep["n_quarantined"] > 0
    assert rep["n_rows"] == rep["n_valid"] + rep["n_quarantined"]
    valid = spark.read.parquet(rep["valid_path"])
    quar = spark.read.parquet(rep["quarantine_path"])
    assert valid.count() == rep["n_valid"]
    assert quar.count() == rep["n_quarantined"]
    assert "violations" in quar.columns


def test_cli_strip_lines_and_skew_and_span_census(spark, tmp_path, capsys):
    docs = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, f"BANNER LINE\nbody text {i}", "s%d" % (i % 2))
         for i in range(40)],
        "doc_id bigint, text string, source string",
    ).write.parquet(docs)

    out = str(tmp_path / "stripped")
    assert main(["strip-lines", "--input", docs, "--output", out,
                 "--min-doc-frac", "0.5"]) == 0
    rep = _last_json(capsys)
    assert rep["n_docs_changed"] == 40 and rep["n_lines_dropped"] == 40
    assert all(
        r.text == f"body text {r.doc_id}"
        for r in spark.read.parquet(out).collect()
    )

    assert main(["skew", "--input", docs, "--key", "source"]) == 0
    rep = _last_json(capsys)
    assert len(rep["top_keys"]) == 2 and rep["suggested_salt"] >= 1

    toks = str(tmp_path / "toks")
    spark.createDataFrame(
        [(0, "a", list(range(30))), (1, "a", list(range(30))),
         (2, "b", list(range(100, 130)))],
        "doc_id bigint, source string, tokens array<int>",
    ).write.parquet(toks)
    assert main(["span-census", "--input", toks, "--k", "25"]) == 0
    rep = _last_json(capsys)
    by_src = {g["source"]: g for g in rep["groups"]}
    # docs 0 and 1 are identical → every gram in source a is duplicated
    assert by_src["a"]["dup_frac"] == 1.0
    assert by_src["b"]["dup_occurrences"] == 0


def test_cli_split_census_leakage_and_write(spark, sf_dir, tmp_path, capsys):
    out = str(tmp_path / "split_out")
    rc = main([
        "split", "--input", f"{sf_dir}/documents.parquet",
        "--splits", "train=0.8,val=0.1,test=0.1",
        "--id-col", "doc_id", "--content-col", "text",
        "--output", out,
    ])
    assert rc == 0
    rep = _last_json(capsys)
    census = {c["split"]: c for c in rep["census"]}
    assert set(census) <= {"train", "val", "test"}
    assert sum(c["n_rows"] for c in census.values()) > 0
    assert census["train"]["declared_share"] == 0.8
    assert "leaked_content_groups" in rep["leakage"]
    # the written layout is partitioned by split and covers every row
    back = spark.read.parquet(out)
    assert back.count() == sum(c["n_rows"] for c in census.values())
    assert set(r.split for r in back.select("split").distinct().collect()) == set(census)


def test_cli_join_preflight_report(spark, sf_dir, tmp_path, capsys):
    left = str(tmp_path / "l")
    right = str(tmp_path / "r")
    spark.read.parquet(f"{sf_dir}/orders.parquet").selectExpr(
        "o_orderkey AS k"
    ).write.parquet(left)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").selectExpr(
        "l_orderkey AS k"
    ).write.parquet(right)
    capsys.readouterr()
    assert main([
        "join-preflight", "--left", left, "--right", right,
        "--keys", "k", "--top-k", "3",
    ]) == 0
    rep = _last_json(capsys)
    real = (
        spark.read.parquet(left)
        .join(spark.read.parquet(right), on="k")
        .count()
    )
    assert rep["join_rows"] == real
    assert len(rep["hot_keys"]) == 3


def test_cli_partition_diff(spark, sf_dir, tmp_path, capsys):
    left = str(tmp_path / "pl")
    right = str(tmp_path / "pr")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderpriority", "o_orderkey"
    )
    o.write.parquet(left)
    o.filter("o_orderkey % 5 != 0").write.parquet(right)
    capsys.readouterr()
    assert main([
        "partition-diff", "--left", left, "--right", right,
        "--partition-col", "o_orderpriority", "--portable",
    ]) == 0
    rep = _last_json(capsys)
    assert rep["ok"] is False and rep["n_not_matching"] >= 1
    assert all(r["status"] in ("match", "differs") for r in rep["partitions"])


def test_cli_strip_lines_empty_input(spark, tmp_path, capsys):
    """SUM over zero rows is SQL NULL — an empty backfill partition must
    still produce the JSON report (zeros), not a TypeError."""
    docs = str(tmp_path / "empty_docs")
    spark.createDataFrame(
        [], "doc_id bigint, text string, source string"
    ).write.parquet(docs)
    out = str(tmp_path / "empty_out")
    assert main(["strip-lines", "--input", docs, "--output", out,
                 "--min-doc-frac", "0.5"]) == 0
    rep = _last_json(capsys)
    assert rep["n_docs"] == 0 and rep["n_lines_dropped"] == 0


def test_cli_file_order(spark, tmp_path, capsys):
    base = tmp_path / "fo"
    spark.createDataFrame(
        [(i,) for i in range(20)], "k bigint"
    ).coalesce(1).write.parquet(str(base / "s=sorted"))
    spark.createDataFrame(
        [(9,), (0,), (5,)], "k bigint"
    ).coalesce(1).write.parquet(str(base / "s=shuffled"))
    # summary only, --fail: one unsorted file -> exit 1
    assert main(["file-order", "--input", str(base), "--key", "k",
                 "--fail"]) == 1
    rep = _last_json(capsys)
    assert rep["n_files"] == 2 and rep["n_sorted_files"] == 1
    # per-file rows, worst first
    assert main(["file-order", "--input", str(base), "--key", "k",
                 "--per-file"]) == 0
    rep = _last_json(capsys)
    assert "s=shuffled" in rep["files"][0]["file"]
    assert rep["files"][0]["is_sorted"] is False


def test_cli_heavy_hitters(spark, sf_dir, capsys):
    rc = main([
        "heavy-hitters", "--input", f"{sf_dir}/lineitem.parquet",
        "--key", "l_partkey", "--min-share", "0.002",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_keys"] == len(out["heavy_hitters"])
    for r in out["heavy_hitters"]:
        assert r["cnt"] >= 1


def test_cli_canary(spark, sf_dir, tmp_path, capsys):
    cfile = tmp_path / "canaries.txt"
    cfile.write_text("merge batch\ncanary-not-there-xyz\n")
    rc = main([
        "canary", "--input", f"{sf_dir}/documents.parquet",
        "--canaries", str(cfile),
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_canaries"] == 2
    by_name = {r["canary"]: r for r in out["canaries"]}
    assert by_name["canary-not-there-xyz"]["n_docs"] == 0
    assert by_name["merge batch"]["n_docs"] > 0
    assert out["n_leaked"] == 1 and out["ok"] is False
    # --fail gates CI on leakage
    rc = main([
        "canary", "--input", f"{sf_dir}/documents.parquet",
        "--canaries", str(cfile), "--fail",
    ])
    assert rc == 1


def test_cli_gopher_census_and_gate(spark, sf_dir, capsys):
    # census over the real documents table: word-salad docs fail some
    # rules but the report must cover every source with ok JSON
    assert main(["gopher", "--input", f"{sf_dir}/documents.parquet"]) == 0
    rep = _last_json(capsys)
    assert rep["n_groups"] > 0 and rep["ok"] is True
    for g in rep["groups"]:
        assert 0.0 <= g["pass_frac"] <= 1.0

    # an impossible threshold trips the gate
    rc = main(["gopher", "--input", f"{sf_dir}/documents.parquet",
               "--min-pass-frac", "1.1"])
    assert rc == 1
    assert _last_json(capsys)["ok"] is False


def test_cli_curate_end_to_end_and_resume(spark, tmp_path, capsys):
    """curate command: full recipe JSON report, and a second invocation
    with the same workdir resumes every stage."""
    src = str(tmp_path / "corpus")
    rows = [
        (i, f"some training document body number {i} with plenty of words here",
         "web" if i % 2 else "books")
        for i in range(40)
    ] + [(100, "some training document body number 1 with plenty of words here",
          "web"),  # exact dup of doc 1
         (101, "short", "web")]  # quality kill
    spark.createDataFrame(
        rows, "doc_id bigint, text string, source string"
    ).write.parquet(src)

    wd = str(tmp_path / "curate_wd")
    argv = [
        "curate", "--input", src, "--workdir", wd,
        "--filter", "min_words=size(split(text, ' ')) >= 5",
        "--splits", "train=0.9,val=0.1",
        "--n-shards", "2",
    ]
    assert main(argv) == 0
    rep = _last_json(capsys)
    stages = {r["stage"]: r for r in rep["report"]}
    assert stages["dedup"]["n_dropped"] == 1
    assert stages["quality:min_words"]["n_dropped"] == 1
    assert stages["assemble"]["n_admitted"] == 40
    assert rep["resumed_stages"] == []
    out = spark.read.parquet(rep["output"])
    assert out.count() == 40 and {"split", "shard"} <= set(out.columns)

    assert main(argv) == 0
    rep2 = _last_json(capsys)
    assert set(rep2["resumed_stages"]) == {"dedup", "quality", "assemble"}
    assert {r["stage"] for r in rep2["report"]} == set(stages)


def test_cli_blocklist_gate(spark, sf_dir, tmp_path, capsys):
    lex = tmp_path / "lex.txt"
    lex.write_text("spark\nvector\n")
    assert main(["blocklist", "--input", f"{sf_dir}/documents.parquet",
                 "--lexicon", str(lex)]) == 0
    rep = _last_json(capsys)
    assert rep["n_words"] == 2 and rep["n_groups"] == 20 and rep["ok"]
    # the synthetic corpus uses these words everywhere: a tiny cap trips
    rc = main(["blocklist", "--input", f"{sf_dir}/documents.parquet",
               "--lexicon", str(lex), "--max-flagged-frac", "0.01"])
    assert rc == 1
    assert _last_json(capsys)["ok"] is False


def test_cli_template_leak(spark, sf_dir, tmp_path, capsys):
    # built-in markers: clean corpus -> ok, zero-inclusive cells
    assert main(["template-leak", "--input", f"{sf_dir}/documents.parquet",
                 "--fail"]) == 0
    rep = _last_json(capsys)
    assert rep["ok"] and rep["n_cells_hit"] == 0
    assert len(rep["cells"]) == 20 * rep["n_markers"]
    # a marker that DOES occur trips --fail
    mk = tmp_path / "mk.txt"
    mk.write_text("the\n")
    rc = main(["template-leak", "--input", f"{sf_dir}/documents.parquet",
               "--markers", str(mk), "--fail"])
    assert rc == 1
    assert _last_json(capsys)["ok"] is False


def test_cli_template_leak_crlf_markers(spark, sf_dir, tmp_path, capsys):
    """Regression: a CRLF-saved markers file must not leave '\\r' glued
    to every marker (the gate would silently never fire — a false pass
    on a contaminated corpus)."""
    mk = tmp_path / "mk_crlf.txt"
    mk.write_bytes(b"the\r\nand\r\n")
    rc = main(["template-leak", "--input", f"{sf_dir}/documents.parquet",
               "--markers", str(mk), "--fail"])
    assert rc == 1
    rep = _last_json(capsys)
    assert rep["ok"] is False
    assert {c["marker"] for c in rep["cells"]} == {"the", "and"}


def test_cli_suggest(spark, sf_dir, tmp_path, capsys):
    cpath = str(tmp_path / "suggested.json")
    assert main(["suggest", "--input", f"{sf_dir}/orders.parquet",
                 "--output", cpath, "--budget", "0.05"]) == 0
    rep = _last_json(capsys)
    assert rep["written"] == cpath and rep["n_columns"] == 6
    cols = {b["column"] for b in rep["bounds"]}
    assert "o_totalprice" in cols
    # the suggested contract round-trips and validates its own data
    # with at most the budgeted tail flagged as range issues
    from dsci_524_g26_data_validation_spark import (
        contract_from_json,
        validate_contract,
    )

    with open(cpath) as f:
        c = contract_from_json(f.read())
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    res = validate_contract(df, c)
    assert any(i.kind == "range" for i in res.issues)


def test_cli_json_contract(spark, sf_dir, tmp_path, capsys):
    import json as _json

    rules = str(tmp_path / "rules.json")
    with open(rules, "w") as f:
        _json.dump(
            [{"field": "k", "required": True, "dtype": "integer",
              "min_value": 0, "max_value": 10},
             {"field": "tag", "allowed": ["a", "b"]}],
            f,
        )
    rc = main(["json-contract", "--input", f"{sf_dir}/events.parquet",
               "--rules", rules, "--col", "props", "--fail",
               "--id-col", "event_id",
               "--violations-out", str(tmp_path / "jviol")])
    rep = _last_json(capsys)
    # events props k runs 0..99 -> range violations above 10 -> fail
    assert rc == 1 and rep["ok"] is False
    viol = spark.read.parquet(str(tmp_path / "jviol"))
    assert viol.count() > 0 and set(viol.columns) == {
        "event_id", "rule", "facet"
    }


def test_cli_interleave(spark, sf_dir, capsys):
    from dsci_524_g26_data_validation_spark.sources.shards import (
        assign_shards,
    )

    # CLI reads a table path; pre-assign shards into a temp parquet
    import tempfile

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    with tempfile.TemporaryDirectory() as td:
        path = f"{td}/sharded"
        assign_shards(d, id_col="doc_id", n_shards=4).write.parquet(path)
        assert main(["interleave", "--input", path,
                     "--order-col", "doc_id"]) == 0
        rep = _last_json(capsys)
        assert rep["n_shards"] == 4
        assert all("max_run" in s and "entropy" in s for s in rep["shards"])


def test_cli_datacard(spark, sf_dir, tmp_path, capsys):
    out = str(tmp_path / "card.json")
    assert main(["datacard", "--input", f"{sf_dir}/documents.parquet",
                 "--text-col", "text", "--id-col", "doc_id",
                 "--source-col", "source", "--output", out]) == 0
    card = _last_json(capsys)
    assert card["n_rows"] > 0 and "doc_id" in card["columns"]
    assert card["sources"] and abs(
        sum(s["share"] for s in card["sources"]) - 1.0
    ) < 0.01
    assert card["text"]["avg_words"] > 0
    assert 0.0 <= card["dedup"]["approx_exact_dup_frac"] < 1.0
    import json as _json

    with open(out) as f:
        assert _json.load(f) == card
