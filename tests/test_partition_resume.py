"""Iceberg-shaped partition semantics (VERDICT r2 item 7), using a
hive-partitioned parquet table as the sandbox's Iceberg stand-in:

* verdict keys are DATA partition values — stable across repartition(),
  unlike spark_partition_id() (SURVEY.md §7 risk f);
* a resume's per-partition filter prunes the scan to unfinished
  partitions (PartitionFilters on the partitioned layout);
* the manifest is keyed by partition value, so resume survives any
  physical re-layout of the table between runs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import dsci_524_g26_data_validation_spark as dv
from dsci_524_g26_data_validation_spark.operators.table_validate import (
    run_resumable_validation,
)
from dsci_524_g26_data_validation_spark.sources.manifest import FileManifestStore


@pytest.fixture(scope="module")
def part_path(spark, tmp_path_factory):
    """documents-like table written hive-partitioned by source."""
    path = str(tmp_path_factory.mktemp("iceberg_standin") / "docs")
    rows = [
        (i, f"document body number {i} with words", f"src{i % 4}", (i * 37) % 100)
        for i in range(2000)
    ]
    (
        spark.createDataFrame(
            rows, "doc_id bigint, text string, source string, score bigint"
        )
        .write.partitionBy("source")
        .parquet(path)
    )
    return path


CONTRACT = dv.Contract(
    name="docs",
    columns={"score": dv.ColumnRule(dtype="bigint", min_value=0, max_value=90)},
)


def test_verdict_keys_stable_across_repartition(spark, part_path):
    df = spark.read.parquet(part_path)
    base = {
        r["partition"]: (r["n_violations"], r["verdict"])
        for r in dv.partition_verdicts(df, CONTRACT, partition_col="source").collect()
    }
    assert set(base) == {"src0", "src1", "src2", "src3"}
    # any physical re-layout must not move a single verdict
    for relayout in (df.repartition(13), df.repartition(3, "score"), df.coalesce(1)):
        again = {
            r["partition"]: (r["n_violations"], r["verdict"])
            for r in dv.partition_verdicts(
                relayout, CONTRACT, partition_col="source"
            ).collect()
        }
        assert again == base


def test_partition_filter_prunes_scan(spark, part_path):
    """The per-partition resume filter must reach the source as a
    partition filter (scan touches one directory), not a post-scan
    predicate over the whole table."""
    df = spark.read.parquet(part_path)
    sub = df.filter(F.col("source").cast("string") == "src2")
    plan = sub._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the partition predicate is IN the partition-filter clause
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "source" in pf
    assert sub.count() == 500


def test_resume_on_partitioned_table(spark, part_path, tmp_path):
    df = spark.read.parquet(part_path)
    tc = dv.TableContract(contract=CONTRACT)
    m1 = FileManifestStore(str(tmp_path), "runA")
    ran = run_resumable_validation(df, tc, partition_col="source", manifest=m1)
    assert set(ran) == {"src0", "src1", "src2", "src3"}
    # resume after a simulated crash: manifest rows keyed by partition
    # VALUE survive even a rewritten physical layout
    rewritten = df.repartition(7)
    m2 = FileManifestStore(str(tmp_path), "runA")
    assert run_resumable_validation(
        rewritten, tc, partition_col="source", manifest=m2
    ) == {}
    import os

    os.remove(m2._file("src1"))
    ran3 = run_resumable_validation(
        rewritten, tc, partition_col="source", manifest=m2
    )
    assert set(ran3) == {"src1"}
    # metrics reflect the contract outcome per partition value
    recs = m2.completed()
    assert all(r["metrics"]["n_issues"] >= 1 for r in recs.values())  # max 90 < 99


def test_resume_invalidated_by_contract_edit(spark, part_path, tmp_path):
    """A completed partition's pass was earned under a SPECIFIC
    contract; resuming with an edited contract (same name!) must re-run
    every partition, not inherit stale pass-records."""
    from dsci_524_g26_data_validation_spark.types import (
        table_contract_fingerprint,
    )

    df = spark.read.parquet(part_path)
    tc1 = dv.TableContract(contract=CONTRACT)
    m = FileManifestStore(str(tmp_path), "runB")
    ran1 = run_resumable_validation(df, tc1, partition_col="source", manifest=m)
    assert len(ran1) == 4
    # same contract → nothing re-runs
    assert run_resumable_validation(
        df, tc1, partition_col="source", manifest=m
    ) == {}
    # edited contract, SAME name → different fingerprint → full re-run
    edited = dv.Contract(
        columns={
            **CONTRACT.columns,
            "score": dv.ColumnRule(dtype="double", min_value=0, max_value=10.0),
        },
        name=CONTRACT.name,
    )
    tc2 = dv.TableContract(contract=edited)
    assert table_contract_fingerprint(tc2) != table_contract_fingerprint(tc1)
    ran2 = run_resumable_validation(df, tc2, partition_col="source", manifest=m)
    assert len(ran2) == 4
    # records now carry the new fingerprint; resume under tc2 is clean
    assert run_resumable_validation(
        df, tc2, partition_col="source", manifest=m
    ) == {}
