"""Generate PLANS.md — formatted physical plans of the engine's headline
operators, so the at-scale properties the code claims (single fused scan,
pruned columns, pushed filters, broadcast joins, capped self-joins,
WindowGroupLimit top-k) are visible in the committed artifact, not just
asserted in tests.

Run: python tools/dump_plans.py [sf_dir]  (writes PLANS.md at repo root)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import dsci_524_g26_data_validation_spark as dv
    from dsci_524_g26_data_validation_spark.operators import (
        contamination,
        dedup,
        similarity,
        text,
    )
    from dsci_524_g26_data_validation_spark.plans.rule_compiler import (
        compile_stats_pass,
    )

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    contract = dv.Contract(
        columns={
            "o_totalprice": dv.ColumnRule(dtype="double", min_value=0, max_value=1e6),
            "o_orderpriority": dv.ColumnRule(
                dtype="string", allowed_values={"1-URGENT", "2-HIGH"}
            ),
        }
    )

    sections = []

    def add(title: str, note: str, df, mode: str = "formatted") -> None:
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
        )
        # control-byte literals (NULL sentinels, concat separators) appear
        # verbatim in plan text; keep the artifact plain text
        plan = plan.replace("\x00", "\\x00").replace("\x01", "\\x01")
        sections.append(f"## {title}\n\n{note}\n\n```\n{plan.strip()}\n```\n")

    plan = compile_stats_pass(orders, contract)
    add(
        "Fused stats pass (P1-P6 + every rule, one scan)",
        "Everything the contract needs rides ONE parquet scan and one "
        "single-row HashAggregate: note the solitary `Scan parquet` with a "
        "pruned `ReadSchema` (only contract columns) and whole-stage codegen "
        "`(n)` stages.",
        orders.agg(*plan.terms),
    )

    d = docs.select("doc_id", F.substring("text", 1, 60).alias("text"))
    add(
        "MinHash-LSH candidates (capped band self-join)",
        "The signature pipeline is computed once (ReusedExchange); the "
        "self-join keys on 8-byte band digests; the Window annotates bucket "
        "sizes for the degenerate-bucket cap. Document text never shuffles.",
        dedup.minhash_lsh_candidates(d, num_hashes=16, bands=8),
    )

    add(
        "Keep-one exact dedup (no payload shuffle)",
        "Dropped ids come from a (digest, id)-only window; the corpus joins "
        "against them with a (AQE-elected broadcast) LeftAnti — full rows are "
        "never exchanged.",
        dedup.deduplicate_exact(d, cols=("text",), id_col="doc_id"),
    )

    bench = docs.filter("doc_id % 97 = 3").select(
        F.col("doc_id").alias("bench_id"),
        F.substring("text", 30, 200).alias("text"),
    )
    add(
        "Benchmark decontamination (broadcast n-gram join)",
        "The benchmark side (with per-doc totals) broadcasts; the corpus "
        "streams through scan-bound — note `BroadcastHashJoin` and the "
        "absence of any corpus-side Exchange before the hit aggregation.",
        contamination.contamination_pairs(docs, bench, n=8),
    )

    add(
        "Heavy hitters (top-k tokens per group)",
        "Spark's WindowGroupLimit pushes the top-k below the shuffle: each "
        "partition keeps only k rows per group before the exchange.",
        text.top_tokens(docs, k=5),
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = [0.0] * 64
    q[0] = 1.0
    add(
        "Cosine top-k (brute force)",
        "`TakeOrderedAndProject`: per-partition k-heaps, driver merges "
        "#partitions x k rows — no full sort.",
        similarity.cosine_topk_bruteforce(emb, q, k=10),
    )

    from dsci_524_g26_data_validation_spark.operators.joins import (
        join_explosion_report,
    )
    from dsci_524_g26_data_validation_spark.operators.rowdiff import (
        partition_diff,
    )

    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    add(
        "Join pre-flight (exact predicted cardinality)",
        "Each side collapses to its (key, count) frame before anything "
        "joins: the exchanges carry distinct-key partials (map-side "
        "combine), the full-outer join runs on key frames, and the report "
        "is a 1-row fold — the real join's size is known without running it.",
        join_explosion_report(
            orders.select(F.col("o_orderkey").alias("k")),
            lineitem.select(F.col("l_orderkey").alias("k")),
            keys=["k"],
        ),
    )

    add(
        "Per-partition Merkle digest diff",
        "Both sides reduce to |partitions|-row digest-sum frames (one "
        "groupBy each, map-side combined); the full-outer join and status "
        "projection never touch row payloads.",
        partition_diff(
            orders.select("o_orderpriority", "o_orderkey"),
            orders.select("o_orderpriority", "o_orderkey").filter(
                "o_orderkey % 7 != 0"
            ),
            partition_col="o_orderpriority",
        ),
    )

    add(
        "Per-cohort contract validation (one grouped fused agg)",
        "Every aggregate facet for every group rides ONE scan and one "
        "hash exchange on the group key; issues assemble via a lazy "
        "`inline` unpivot over the |groups|-row aggregate.",
        dv.validate_by_group(orders, contract, group_col="o_orderpriority"),
    )

    from dsci_524_g26_data_validation_spark.operators.funnel import (
        filter_funnel,
    )
    from dsci_524_g26_data_validation_spark.operators.skew import salted_join

    add(
        "Sequential filter funnel (first-fail attribution)",
        "One corpus scan: the first-failing-stage index is a row-local "
        "CASE, the census groups on that tiny index (map-side combined), "
        "and the funnel arithmetic is a window over the counts frame — "
        "no filter evaluates twice, documents never shuffle.",
        filter_funnel(
            docs,
            [("min_chars", "n_chars >= 200"),
             ("min_tokens", "size(split(text, ' ')) >= 30")],
        ),
    )

    add(
        "Explicit salted join (hot key split before the shuffle)",
        "The big side spreads keys across salt buckets, the small side "
        "replicates via a row-local explode, and the join keys on "
        "(key, _salt) — the mega-key's partition is divided "
        "deterministically ahead of the exchange.",
        salted_join(
            orders.selectExpr("o_custkey AS k", "o_totalprice AS v"),
            orders.selectExpr("o_custkey AS k").distinct().limit(1000),
            on="k",
            salt=8,
        ),
    )

    from dsci_524_g26_data_validation_spark.sources.files import (
        file_order_census,
    )

    add(
        "Within-file sort-order census (zero data shuffle)",
        "The scan reads only (\\_metadata, key) — pruned ReadSchema; "
        "`MapInPandas` collapses each input split to one summary row "
        "BEFORE any exchange, so the groupBy(file) shuffle carries "
        "O(#splits) rows, never O(rows); segment boundaries fold via "
        "array HOFs inside the aggregate projection.",
        file_order_census(orders, "o_orderkey"),
    )

    from dsci_524_g26_data_validation_spark.operators.heavy import (
        heavy_hitters,
    )

    add(
        "Sketch-first exact heavy hitters (bounded-shuffle frequency census)",
        "Stage 1 `MapInPandas` folds each partition into a k-counter "
        "Misra-Gries summary (≤k rows shuffled per partition — the "
        "distinct-key domain never crosses an exchange); the exact "
        "verify pass scans the corpus once more behind a "
        "`BroadcastHashJoin ... LeftSemi` on the (tiny) candidate set, "
        "so the final groupBy's key domain is the candidates, not the "
        "corpus.",
        heavy_hitters(lineitem, "l_partkey", min_count=35),
    )

    from dsci_524_g26_data_validation_spark.operators.joins import (
        key_overlap_sketch,
    )

    add(
        "Sketch-mode join-key overlap pre-flight (one HLL row per side)",
        "Each side collapses to ONE ~2^lg_k-byte HLL via map-side-merged "
        "`hll_sketch_agg` (the exchange carries a single sketch row per "
        "task); the union/intersection estimates are a 1-row×1-row "
        "cross join — nothing about either corpus shuffles.",
        key_overlap_sketch(
            orders.selectExpr("o_custkey AS k"),
            orders.selectExpr("o_custkey AS k").limit(5000),
            ["k"],
        ),
    )

    from dsci_524_g26_data_validation_spark.operators.quality_rules import (
        gopher_census,
    )

    add(
        "Gopher quality-rule census (7 predicates, one scan)",
        "All seven published rule predicates (word/line array lambdas, "
        "stop-word contains, symbol counts via length-replace) evaluate in "
        "one projection over a ReadSchema pruned to (text, source); the "
        "census is a single map-side-combined HashAggregate on |sources| "
        "keys — the exchange carries flag tuples, never rows.",
        gopher_census(docs),
    )

    # curate assembly: survivors = corpus anti-joined against the two
    # id sidecars + row-local quality/split predicates — ONE corpus scan
    import tempfile

    from dsci_524_g26_data_validation_spark.operators.curate import (
        _mixture_keep_expr,
    )
    from dsci_524_g26_data_validation_spark.operators.funnel import (
        apply_filters,
    )
    from dsci_524_g26_data_validation_spark.operators.splits import (
        assign_splits,
    )

    side_dir = tempfile.mkdtemp(prefix="dv_plans_curate_")
    from dsci_524_g26_data_validation_spark.operators.dedup import (
        exact_dropped_ids,
    )

    exact_dropped_ids(docs, cols=("text",)).write.mode("overwrite").parquet(
        f"{side_dir}/dropped"
    )
    dropped = spark.read.parquet(f"{side_dir}/dropped").withColumnRenamed(
        "doc_id", "_drop"
    )
    survivors = docs.join(dropped, docs["doc_id"] == dropped["_drop"], "left_anti")
    assembled = assign_splits(
        apply_filters(
            survivors, [("min_words", "size(split(text, ' ')) >= 12")]
        ).filter(
            _mixture_keep_expr(
                {"src0": 0.5}, group_col="source", id_col="doc_id", salt="mix"
            )
        ),
        {"train": 0.8, "val": 0.2},
        id_col="doc_id",
    )
    add(
        "Curation assembly (decision sidecars, one corpus scan)",
        "The curate() final assembly: the corpus anti-joins the parquet-"
        "backed dropped-id sidecar (tiny — size-based planning broadcasts "
        "it), and the quality gate, mixture downsample, and split label are "
        "all row-local expressions in the SAME projection — the corpus is "
        "scanned once and the only later shuffle is the optional shard "
        "repartition. The stage decisions are ids-only; full rows are "
        "never written or shuffled until this final pass.",
        assembled,
    )

    from dsci_524_g26_data_validation_spark.operators.interleave import (
        interleaving_census,
    )
    from dsci_524_g26_data_validation_spark.operators.json_contract import (
        JsonFieldRule,
        json_contract_report,
    )

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    add(
        "JSON payload contract report (one fused scan, ONE parse/row)",
        "Every per-field facet counter (missing/type/range/domain/pattern "
        "x rules, plus payload rot) is a count_if term of ONE global "
        "aggregate over one scan; the stack pivot to per-rule rows sits "
        "ABOVE the 1-row aggregate, so adding rules adds projection "
        "columns, never scans or shuffles. The payload parses ONCE per "
        "row: a single from_json with the merged string-leaf schema is "
        "materialized as a projected column (visible below the "
        "HashAggregate), never one get_json_object per rule.",
        json_contract_report(
            events,
            [
                JsonFieldRule(field="k", required=True, dtype="integer",
                              min_value=0, max_value=100),
                JsonFieldRule(field="tag", allowed=("a", "b")),
            ],
            col="props",
            declared_only=True,
        ),
    )
    add(
        "Shard interleaving census (corpus collapses to its runs frame)",
        "One corpus scan, one shard-key exchange (the minimum any "
        "order-sensitive statistic needs), a window + running sum, then "
        "the localCheckpointed |runs| frame feeds run stats, entropy, and "
        "JS — the plan below reads Scan ExistingRDD, never parquet: the "
        "corpus is not re-read.",
        interleaving_census(
            docs.withColumn("shard", (F.col("doc_id") % 8).cast("int")),
            shard_col="shard",
            order_col="doc_id",
            source_col="source",
        ),
    )
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    add(
        "Embedding centroid-outlier top-k (codegen distance, heap top-k)",
        "The L2 distance to the (driver-sized) centroid literal is a "
        "zip_with/aggregate codegen expression — no Arrow/Python eval "
        "node anywhere — and the top-k is TakeOrderedAndProject: a "
        "per-partition heap of k rows, never a global sort.",
        similarity.embedding_outlier_topk(
            emb, id_col="vec_id", vec_col="embedding", dim=64, k=10
        ),
    )

    header = (
        "# PLANS — headline physical plans (generated by tools/dump_plans.py)\n\n"
        f"Input: `{SF_DIR}` on local[4]; plans are pre-execution "
        "(`explain formatted`), i.e. what Catalyst commits to before AQE "
        "runtime re-optimization. Regenerate after plan-affecting changes.\n\n"
    )
    Path(__file__).resolve().parent.parent.joinpath("PLANS.md").write_text(
        header + "\n".join(sections)
    )
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
