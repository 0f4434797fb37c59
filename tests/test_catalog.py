"""Catalog-table path of sources.load_table (VERDICT r1 item 8).

No Iceberg jar ships in this sandbox, so these tests exercise the
``spark.table()`` branch through Spark's built-in session catalog — the
exact code path an Iceberg catalog table takes (load_table is identical
either way; Iceberg is spark-submit configuration, sources/tables.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

import dsci_524_g26_data_validation_spark as dv
from dsci_524_g26_data_validation_spark.sources.tables import load_table


def test_load_table_temp_view_branch(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.createOrReplaceTempView("dv_docs_view")
    got = load_table(spark, "dv_docs_view")
    assert got.count() == docs.count()
    assert got.schema == docs.schema


def test_load_table_catalog_db_table_validates(spark, sf_dir, tmp_path):
    """db.table through the session catalog: write a managed table, load
    it by qualified name, run the real engine on it."""
    spark.sql("CREATE DATABASE IF NOT EXISTS dv_cat_test")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    try:
        docs.write.mode("overwrite").saveAsTable("dv_cat_test.docs")
        tbl = load_table(spark, "dv_cat_test.docs")
        assert "/" not in "dv_cat_test.docs"  # catalog branch, not parquet
        contract = dv.infer_contract(tbl)
        assert set(contract.columns) == set(docs.columns)
        res = dv.validate_contract(tbl, contract)
        assert res.ok  # a table always conforms to its own inferred contract
    finally:
        spark.sql("DROP TABLE IF EXISTS dv_cat_test.docs")
        spark.sql("DROP DATABASE IF EXISTS dv_cat_test")


def test_load_table_path_branch(spark, sf_dir):
    got = load_table(spark, f"{sf_dir}/documents.parquet")
    assert got.count() > 0


def test_load_table_csv_json_landing_zone(spark, tmp_path):
    """Raw landing-zone formats: CSV (header + inferred schema) and JSON
    lines, loaded by extension, validated by the real engine."""
    df = spark.createDataFrame(
        [(1, "alice", 10.5), (2, "bob", 99.0)], "id bigint, name string, score double"
    )
    csv_dir = str(tmp_path / "in.csv")
    json_dir = str(tmp_path / "in.json")
    df.write.option("header", "true").csv(csv_dir)
    df.write.json(json_dir)

    got_csv = load_table(spark, csv_dir)
    assert set(got_csv.columns) == {"id", "name", "score"}
    assert got_csv.count() == 2
    contract = dv.Contract(
        columns={"score": dv.ColumnRule(dtype="double", max_value=50.0)}
    )
    res = dv.validate_contract(got_csv, contract, strict=False)
    assert not res.ok and res.issues[0].kind == "range"  # 99 > 50 survived CSV

    got_json = load_table(spark, json_dir)
    assert got_json.count() == 2
    assert not dv.validate_contract(got_json, contract, strict=False).ok

    # fmt= forces the reader when the path has no telling extension
    plain = str(tmp_path / "plain_dir")
    df.write.option("header", "true").csv(plain)
    got_forced = load_table(spark, plain, fmt="csv")
    assert got_forced.count() == 2 and "score" in got_forced.columns


def test_time_travel_options_mapping():
    """time_travel_options maps args to Iceberg's documented read-option
    names and rejects combinations on the driver (r3 VERDICT item 4)."""
    import pytest as _pytest

    from dsci_524_g26_data_validation_spark.sources.tables import (
        time_travel_options,
    )

    assert time_travel_options() == {}
    assert time_travel_options(snapshot_id=123) == {"snapshot-id": "123"}
    assert time_travel_options(as_of_timestamp=1700000000000) == {
        "as-of-timestamp": "1700000000000"
    }
    assert time_travel_options(branch="audit") == {"branch": "audit"}
    assert time_travel_options(tag="v1") == {"tag": "v1"}
    with _pytest.raises(ValueError, match="at most one"):
        time_travel_options(snapshot_id=1, branch="b")


def test_load_table_threads_time_travel_options(spark, sf_dir):
    """The catalog branch sets the time-travel option on the reader.
    Without an Iceberg source the session catalog ignores unknown read
    options, so the pin here is: options flow through load_table without
    breaking the read, and are rejected for filesystem paths."""
    import pytest as _pytest

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    docs.createOrReplaceTempView("dv_tt_view")
    got = load_table(spark, "dv_tt_view", snapshot_id=42)
    assert got.count() == 50
    with _pytest.raises(ValueError, match="catalog tables only"):
        load_table(spark, f"{sf_dir}/documents.parquet", snapshot_id=42)


def test_contract_in_table_properties_roundtrip(spark, sf_dir):
    """SURVEY §1.1: the contract lives beside the data as the dv.contract
    table property — write with store_contract, read with load_contract,
    validate against the live table. ALTER TABLE SET TBLPROPERTIES /
    SHOW TBLPROPERTIES are the same statements Iceberg tables accept."""
    from dsci_524_g26_data_validation_spark.sources.tables import (
        load_contract,
        store_contract,
    )

    spark.sql("CREATE DATABASE IF NOT EXISTS dv_props_test")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    try:
        docs.write.mode("overwrite").saveAsTable("dv_props_test.docs")
        assert load_contract(spark, "dv_props_test.docs") is None

        contract = dv.infer_contract(load_table(spark, "dv_props_test.docs"))
        store_contract(spark, "dv_props_test.docs", contract)
        back = load_contract(spark, "dv_props_test.docs")
        assert back == contract
        res = dv.validate_contract(
            load_table(spark, "dv_props_test.docs"), back
        )
        assert res.ok

        # TableContract envelope round-trips through the same property
        tc = dv.TableContract(contract=contract, unique_keys=("doc_id",))
        store_contract(spark, "dv_props_test.docs", tc)
        back_tc = load_contract(spark, "dv_props_test.docs")
        assert isinstance(back_tc, dv.TableContract)
        assert back_tc.unique_keys == ("doc_id",)
        assert back_tc.contract == contract

        # Regression: a pattern rule carries backslashes (JSON renders
        # \d as \\d); Spark's string-literal parsing collapses \\ -> \
        # unless store_contract doubles them, corrupting the stored JSON.
        rules = dict(contract.columns)
        rules["doc_id"] = dv.ColumnRule(
            dtype=rules["doc_id"].dtype, pattern=r"\d+"
        )
        pat_contract = dv.Contract(columns=rules, name="pat")
        store_contract(spark, "dv_props_test.docs", pat_contract)
        back_pat = load_contract(spark, "dv_props_test.docs")
        assert back_pat == pat_contract
        assert back_pat.columns["doc_id"].pattern == r"\d+"
    finally:
        spark.sql("DROP TABLE IF EXISTS dv_props_test.docs")
        spark.sql("DROP DATABASE IF EXISTS dv_props_test")
