"""bench.py — headline benchmark for the PySpark data-validation engine.

Default mode (what the driver runs):
    python bench.py
emits ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {<name>: sec, ...}, "sf": <sf>,
     "token_pass": {"rows": N, "sec": t, "sequences_per_sec": r}, ...}

The headline workload is the north-star "full contract pass" (BASELINE.json)
over the synthetic tokenized-sequence table (doc_id, tokens:array<int>,
n_tok, source): column contract + fused stats + uniqueness (E1, salted) +
referential integrity (E2) + PSI/chi-square drift (E3/E4) + row invariant
(E5) + token-array equality vs a reference copy (E6, Arrow UDF). Throughput
is reported as validated sequences/sec. The per-query section times every
`__spark_entry__.queries()` entry at $SPARK_GRAFT_SF_DIR.

Scaling evidence (north rule: >=0.8 efficiency N -> 4N executors; sandbox
proxy = two local parallelism levels on identical input):
    python bench.py --scaling
runs the token pass in two fresh subprocesses at local[8] and local[32]
and prints throughput at both plus efficiency = (tput32/tput8)/4.

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_TOKEN_ROWS (default 2_000_000).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TOKEN_ROWS = int(os.environ.get("SPARK_GRAFT_TOKEN_ROWS", "2000000"))


def _session(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("dv-bench")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _force(df) -> int:
    """Execute a DataFrame's full plan without driver materialization cost."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def token_pass(spark, n_rows: int, workdir: str) -> dict:
    """North-star workload: full TableContract pass over a parquet-backed
    token table. Table build/write is NOT timed; the validation pass is."""
    import dsci_524_g26_data_validation_spark as dv

    dirty_path = f"{workdir}/tokens_dirty"
    ref_path = f"{workdir}/tokens_ref"
    parts = spark.sparkContext.defaultParallelism * 2
    dv.token_table(
        spark,
        n_rows,
        dup_frac=0.001,
        bad_ntok_frac=0.001,
        unknown_source_frac=0.001,
        mutate_frac=0.001,
        num_partitions=parts,
    ).write.mode("overwrite").parquet(dirty_path)
    dv.token_table(spark, n_rows, num_partitions=parts).write.mode(
        "overwrite"
    ).parquet(ref_path)

    dirty = spark.read.parquet(dirty_path)
    ref = spark.read.parquet(ref_path)
    baseline = dv.capture_histograms(
        ref,
        categorical_cols=["source"],
        numeric_bins={"n_tok": (0.0, 512.0, 16)},
    )
    tc = dv.TableContract(
        contract=dv.Contract(
            name="tokens",
            columns={
                "doc_id": dv.ColumnRule(dtype="string"),
                "tokens": dv.ColumnRule(dtype="array<int>"),
                "n_tok": dv.ColumnRule(dtype="int", min_value=1, max_value=100_000),
                "source": dv.ColumnRule(
                    dtype="string", allowed_values={"web", "books", "code", "wiki"}
                ),
            },
        ),
        unique_keys=("doc_id",),
        foreign_keys=(dv.ForeignKeyRule("source", "sources", "source"),),
        histograms=baseline,
        invariants=("n_tok = size(tokens)",),
    )
    dims = {"sources": dv.source_dim(spark)}

    t0 = time.perf_counter()
    result = dv.validate_table_contract(dirty, tc, dims=dims, reference=ref)
    sec = time.perf_counter() - t0
    return {
        "rows": n_rows,
        "sec": round(sec, 3),
        "sequences_per_sec": round(n_rows / sec, 1),
        "ok": result.ok,
        "n_issues": len(result.issues),
        "issue_kinds": sorted({i.kind for i in result.issues}),
    }


def run_queries(spark, sf_dir: str) -> dict:
    import __spark_entry__ as entrymod

    times = {}
    for name, fn in entrymod.queries().items():
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        times[name] = round(time.perf_counter() - t0, 3)
    return times


def main_default() -> None:
    spark = _session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="dv_bench_")
    try:
        tp = token_pass(spark, TOKEN_ROWS, workdir)
        qt = run_queries(spark, SF_DIR)
        total = round(tp["sec"] + sum(qt.values()), 3)
        print(
            json.dumps(
                {
                    "metric": "full_contract_pass_plus_query_suite_sec",
                    "value": total,
                    "unit": "sec",
                    "queries": qt,
                    "sf": SF_DIR.rstrip("/").split("sf")[-1],
                    "token_pass": tp,
                    "sequences_per_sec": tp["sequences_per_sec"],
                    "cpus": CPUS,
                }
            )
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


def main_token_only() -> None:
    spark = _session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="dv_bench_")
    try:
        print(json.dumps(token_pass(spark, TOKEN_ROWS, workdir)))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


def main_scaling() -> None:
    """N vs 4N evidence: identical input + job at local[8] and local[32]."""
    results = {}
    for cpus in (8, 32):
        env = dict(os.environ)
        env["SPARK_GRAFT_CPUS"] = str(cpus)
        env.setdefault("SPARK_GRAFT_TOKEN_ROWS", str(TOKEN_ROWS))
        out = subprocess.run(
            [sys.executable, __file__, "--token-only"],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
    t8 = results[8]["sequences_per_sec"]
    t32 = results[32]["sequences_per_sec"]
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency_8_to_32_cores",
                "value": round((t32 / t8) / 4.0, 3),
                "unit": "efficiency",
                "rows": results[32]["rows"],
                "throughput_local8_seq_per_sec": t8,
                "throughput_local32_seq_per_sec": t32,
                "sec_local8": results[8]["sec"],
                "sec_local32": results[32]["sec"],
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        main_scaling()
    elif "--token-only" in sys.argv:
        main_token_only()
    else:
        main_default()
