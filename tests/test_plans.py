"""Physical-plan guarantees — the properties that make the engine work at
10^12 rows are asserted on the plan itself, not just trusted:

* the fused stats pass is ONE parquet scan with whole-stage codegen,
* the scan reads ONLY contract columns (column pruning),
* rule predicates push down to the parquet reader (PushedFilters),
* small-dim referential integrity plans a broadcast anti-join,
* the key-integrity check is hash aggregation, never a sort-merge join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import dsci_524_g26_data_validation_spark as dv
from dsci_524_g26_data_validation_spark.plans.rule_compiler import (
    compile_stats_pass,
    violation_predicates,
)


def _spark_plan(df) -> str:
    """Pre-AQE physical plan text (deterministic without executing)."""
    return df._jdf.queryExecution().sparkPlan().toString()


def _final_plan(df) -> str:
    """Post-execution AQE final plan text."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


CONTRACT = dv.Contract(
    columns={
        "o_totalprice": dv.ColumnRule(dtype="double", min_value=0, max_value=1e6),
        "o_orderpriority": dv.ColumnRule(
            dtype="string", allowed_values={"1-URGENT", "2-HIGH"}
        ),
    }
)


def test_fused_pass_is_one_pruned_codegen_scan(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    plan = compile_stats_pass(orders, CONTRACT)
    agg = orders.agg(*plan.terms)
    final = _final_plan(agg)
    final = final.split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "*(" in final  # whole-stage codegen
    # column pruning: only the two contract columns are read
    read_schema = [l for l in final.splitlines() if "ReadSchema" in l][0]
    assert "o_totalprice" in read_schema and "o_orderpriority" in read_schema
    assert "o_custkey" not in read_schema and "o_comment" not in read_schema


def test_rule_predicates_push_down_to_parquet(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    preds = violation_predicates(orders, CONTRACT)
    flat = [p for plist in preds.values() for _, p in plist]
    cond = flat[0]
    for p in flat[1:]:
        cond = cond | p
    plan = _spark_plan(orders.filter(cond))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "PushedFilters: []" not in pushed  # something actually pushed


def test_referential_small_dim_is_broadcast_anti_join(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    dim = spark.read.parquet(f"{sf_dir}/customer.parquet")
    bad = dv.referential_violations(orders, dim, "o_custkey", "c_custkey")
    plan = _spark_plan(bad)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_key_integrity_never_sort_merge_joins(spark):
    df = dv.token_table(spark, 2000, num_partitions=4)
    ref = dv.token_table(spark, 2000, num_partitions=4)
    u = df.select(
        F.col("doc_id").alias("_k"),
        F.xxhash64("tokens").alias("_h"),
        F.lit(1).alias("_s"),
    ).unionByName(
        ref.select(
            F.col("doc_id").alias("_k"),
            F.xxhash64("tokens").alias("_h"),
            F.lit(0).alias("_s"),
        )
    )
    per_hash = u.groupBy("_k", "_h").agg(F.count_if(F.col("_s") == 1).alias("n1"))
    plan = _spark_plan(per_hash)
    assert "SortMergeJoin" not in plan and "HashAggregate" in plan


def test_topk_plans_take_ordered(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    from dsci_524_g26_data_validation_spark.operators import similarity

    q = [0.0] * 64
    q[0] = 1.0
    top = similarity.cosine_topk_bruteforce(e, q, k=5)
    plan = _spark_plan(top)
    assert "TakeOrderedAndProject" in plan  # per-partition heap, no full sort


def test_minhash_cap_plan_no_cartesian(spark):
    from dsci_524_g26_data_validation_spark.operators import dedup

    df = spark.createDataFrame(
        [(i, f"some document number {i} with shared words") for i in range(20)],
        "doc_id bigint, text string",
    )
    cand = dedup.minhash_lsh_candidates(df, num_hashes=16, bands=8)
    plan = _spark_plan(cand)
    # candidate generation is an equi-join on band digests + a windowed
    # bucket-size annotation — never an all-pairs product
    assert "CartesianProduct" not in plan
    assert "Window" in plan


def test_minhash_cap_signatures_computed_once(spark, tmp_path):
    """The expensive signature pipeline must run ONCE: ReuseExchange
    collapses the three derivations (join sides + star branch) onto one
    (band, digest) shuffle — one parquet scan in the final plan.

    Uses its own parquet file: a cached DataFrame over a shared testdata
    path (other test modules cache documents.parquet) would swap the
    scan for an InMemoryRelation and change the plan under test."""
    from dsci_524_g26_data_validation_spark.operators import dedup

    path = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, f"document number {i} with overlapping words") for i in range(200)],
        "doc_id bigint, text string",
    ).write.parquet(path)
    d = spark.read.parquet(path)
    cand = dedup.minhash_lsh_candidates(d, num_hashes=16, bands=8)
    final = _final_plan(cand).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "ReusedExchange" in final


def test_embedding_near_dup_plan_no_cartesian(spark):
    from dsci_524_g26_data_validation_spark.operators import similarity

    df = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.0, 0.5]) for i in range(20)],
        "vec_id bigint, embedding array<double>",
    )
    pairs = similarity.embedding_near_duplicates(
        df, threshold=0.95, n_planes=4, n_tables=2
    )
    plan = _spark_plan(pairs)
    # bucket equi-join on (table, bucket) ints; vectors only join back to
    # the deduplicated candidate pairs
    assert "CartesianProduct" not in plan


def test_deduplicate_exact_plan_no_payload_shuffle(spark, tmp_path):
    """Keep-one exact dedup must never shuffle row payloads: the dropped-id
    computation's exchange carries only (digest, id), and the corpus-side
    anti-join broadcasts the (tiny) dropped set (VERDICT r2 item 1)."""
    from dsci_524_g26_data_validation_spark.operators import dedup

    path = str(tmp_path / "docs")
    spark.createDataFrame(
        [
            (i, f"text body {i % 50}", f"payload column {i} " * 20)
            for i in range(500)
        ],
        "doc_id bigint, text string, payload string",
    ).write.parquet(path)
    d = spark.read.parquet(path)
    kept = dedup.deduplicate_exact(d, cols=("text",), id_col="doc_id")
    final = _final_plan(kept).split("== Initial Plan ==")[0]
    # AQE turns the anti-join into a broadcast (dropped set is tiny)
    assert "BroadcastHashJoin" in final and "LeftAnti" in final
    # the dropped-id side scans only (text, doc_id) — the payload column
    # never enters the window/exchange path
    schemas = [l for l in final.splitlines() if "ReadSchema" in l]
    assert any("payload" not in l for l in schemas), schemas
    # the only exchange in the plan is the (digest, id) hash partitioning
    # for the window — no exchange ever carries the payload column
    exchanges = [l for l in final.splitlines() if "Exchange hashpartitioning" in l]
    assert exchanges and all("payload" not in l for l in exchanges)
    assert kept.count() == 50  # 50 distinct texts -> 50 survivors


def test_quality_by_source_single_eval(spark, sf_dir):
    """The quality score must be materialized behind a projection barrier
    so its expression tree (which re-splits the text) evaluates once per
    row, not once per aggregate referencing it (VERDICT r2 item 5)."""
    from dsci_524_g26_data_validation_spark.operators import text

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    agg = text.quality_by_source(d)
    plan = agg._jdf.queryExecution().optimizedPlan().toString()
    # regexp_replace is the score's most expensive node; exactly one
    # occurrence means the whole tree is shared by avg() and min()
    assert plan.count("regexp_replace") == 1


def test_repetition_metrics_row_local(spark, sf_dir):
    """Repetition metrics must be a pure row-local map — no Exchange at
    all per-document (the mode count is a sort+fold inside the row, not
    an explode+groupBy) — and tokenization must evaluate once per row
    (projection barrier), so the per-group rollup plans exactly one
    shuffle: the final hash aggregate."""
    from dsci_524_g26_data_validation_spark.operators import text

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    per_doc = text.repetition_metrics(d)
    plan = _spark_plan(per_doc)
    assert "Exchange" not in plan
    opt = per_doc._jdf.queryExecution().optimizedPlan().toString()
    # the token split feeds n_words/distinct/bigrams/trigrams but must
    # materialize once behind the barrier
    assert opt.count("split(text") == 1
    # On a multi-partition input the per-group rollup plans exactly one
    # hash-partitioned shuffle (the tiny test file is a single split, so
    # Spark rightly elides even that — force partitions to see the agg).
    rollup = text.repetition_by_group(d.repartition(4))
    # executedPlan (post-EnsureRequirements; sparkPlan() is pre-exchange)
    agg_plan = rollup._jdf.queryExecution().executedPlan().toString()
    assert agg_plan.count("Exchange hashpartitioning") == 1
    assert "Generate" not in agg_plan  # no explode anywhere


def test_ivf_cell_partitioned_probe_prunes_files(spark, sf_dir, tmp_path):
    """The ingest-time IVF layout claim, proven on disk: write the table
    partitioned by ivf_cell, and a probe's cell filter must reach the
    scan as a PartitionFilter (only the probed cells' directories are
    read) — the ~n_probe/n_cells I/O story at 100 TB."""
    from dsci_524_g26_data_validation_spark.operators import similarity

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = similarity.ivf_centroids(e, n_cells=4, seed=1)
    path = str(tmp_path / "emb_ivf")
    similarity.with_ivf_cells(e, cents).write.partitionBy("ivf_cell").parquet(path)
    indexed = spark.read.parquet(path)
    q = list(e.filter("vec_id = 2").first()["embedding"])
    top = similarity.cosine_topk_ivf(
        indexed, q, cents, k=5, n_probe=1, cell_col="ivf_cell"
    )
    plan = top._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "ivf_cell" in pf  # probe prunes whole directories
    assert top.count() == 5


def test_line_strip_text_never_in_exchange(spark):
    """strip_frequent_lines' contract: document text moves through
    scans and row-local projections only — every Exchange carries
    digests, positions, ids, or drop lists, NEVER the text column."""
    from dsci_524_g26_data_validation_spark.operators.lines import (
        strip_frequent_lines,
    )

    df = spark.createDataFrame(
        [(i, "A\ncontent %d" % i) for i in range(50)],
        "doc_id long, text string",
    )
    out = strip_frequent_lines(df, min_docs=10)
    plan = _final_plan(out)
    plan = plan.split("== Initial Plan ==")[0]
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text" not in line, f"text shuffled: {line[:200]}"


def test_url_ops_are_row_local(spark):
    """parse + canonicalize are pure projections (zero exchanges); the
    domain census needs exactly the groupBy exchanges, and no Exchange
    ever carries the raw url string (only the domain key and the
    projected census stubs)."""
    from dsci_524_g26_data_validation_spark.operators import urls

    df = spark.createDataFrame(
        [(i, f"https://www.ex{i % 3}.com/p?utm_source=x&id={i}") for i in range(30)],
        "doc_id long, url string",
    )
    proj_plan = _spark_plan(urls.canonicalize_urls(urls.parse_urls(df)))
    assert "Exchange" not in proj_plan  # scan-rewrite only

    census_plan = _final_plan(urls.domain_census(df, url_col="url"))
    census_plan = census_plan.split("== Initial Plan ==")[0]
    assert "Exchange" in census_plan  # the groupBy is real


def test_normalize_text_no_shuffle(spark):
    from dsci_524_g26_data_validation_spark.operators import normalize

    df = spark.createDataFrame(
        [(i, "text  %d" % i) for i in range(20)], "doc_id long, text string"
    )
    plan = _spark_plan(normalize.normalize_text(df))
    assert "Exchange" not in plan
    # the NFC hop is the ONLY python/arrow operator; regexp steps are codegen
    assert plan.count("ArrowEvalPython") <= 1


def test_shard_assignment_no_shuffle_and_plan_one_exchange(spark):
    from dsci_524_g26_data_validation_spark.sources import shards

    df = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("text")
    )
    assign_plan = _spark_plan(
        shards.assign_shards(df, id_col="doc_id", n_shards=8)
    )
    assert "Exchange" not in assign_plan  # pure projection

    plan = _final_plan(shards.shard_plan(df, id_col="doc_id", n_shards=8))
    plan = plan.split("== Initial Plan ==")[0]
    # the per-shard aggregate: partial agg before the exchange, and the
    # share/balance window runs on the 8-row result, adding no corpus pass
    assert "partial_count" in plan or "partial" in plan.lower()


def test_curate_assembly_one_corpus_scan_row_local_stages(spark, sf_dir, tmp_path):
    """curate()'s final assembly plan: the corpus appears in exactly ONE
    scan; the dropped-id sidecar anti-join broadcasts (size-based — the
    sidecar is a tiny parquet); quality/mixture/split are row-local
    expressions in the same stage (no additional Exchange)."""
    from dsci_524_g26_data_validation_spark.operators.curate import (
        _mixture_keep_expr,
    )
    from dsci_524_g26_data_validation_spark.operators.dedup import (
        exact_dropped_ids,
    )
    from dsci_524_g26_data_validation_spark.operators.funnel import apply_filters
    from dsci_524_g26_data_validation_spark.operators.splits import assign_splits

    # planted duplicates: an EMPTY sidecar would let AQE prune the
    # anti-join away entirely (also a fine plan — but not the one this
    # test pins)
    docs = spark.createDataFrame(
        [(i, "doc body %d with plenty of words in it" % (i % 40),
          "src%d" % (i % 3)) for i in range(80)],
        "doc_id long, text string, source string",
    )
    side = str(tmp_path / "dropped")
    exact_dropped_ids(docs, cols=("text",)).write.parquet(side)
    dropped = spark.read.parquet(side).withColumnRenamed("doc_id", "_drop")
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
    plan = _final_plan(assembled).split("== Initial Plan ==")[0]
    # one scan of the sidecar parquet; the corpus (createDataFrame here,
    # a table/parquet scan in production) appears exactly once too
    assert plan.count("Scan parquet") == 1  # the sidecar
    assert plan.count("LocalTableScan") + plan.count("Scan ExistingRDD") == 1
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # the quality/mixture/split expressions add NO exchange beyond the
    # broadcast side (no aggregation, no repartition in the assembly)
    exchange_lines = [
        l for l in plan.splitlines()
        if "Exchange" in l and "BroadcastExchange" not in l
    ]
    assert exchange_lines == [], exchange_lines


def test_lexicon_gates_are_row_local(spark):
    """blocklist matching and template-marker hits are pure codegen
    projections (zero Python eval nodes anywhere); the row fetch plans
    with NO exchange, and each census needs exactly its one groupBy
    exchange whose input projects only (group, tiny flag/hit columns) —
    the document text never crosses an exchange."""
    from dsci_524_g26_data_validation_spark.operators import lexicon

    df = spark.createDataFrame(
        [(i, f"spam text number {i}", f"s{i % 3}") for i in range(30)],
        "doc_id long, text string, source string",
    )
    rows_plan = _spark_plan(lexicon.blocklist_rows(df, words=["spam"]))
    assert "Exchange" not in rows_plan
    assert "EvalPython" not in rows_plan

    census_plan = _final_plan(lexicon.blocklist_census(df, words=["spam"]))
    census_plan = census_plan.split("== Initial Plan ==")[0]
    assert "EvalPython" not in census_plan
    for line in census_plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text" not in line

    tpl_plan = _final_plan(lexicon.template_leak_census(df))
    tpl_plan = tpl_plan.split("== Initial Plan ==")[0]
    assert "EvalPython" not in tpl_plan
    assert "*(" in tpl_plan  # whole-stage codegen carries the hit terms


def test_containment_candidate_exchange_is_fixed_width(spark):
    """containment_pairs candidate generation: no cartesian product
    anywhere, no Python eval, and the window/self-join exchanges on the
    inverted index carry only (id, 8-byte hash) — the document text and
    shingle arrays stay out of every candidate-side exchange (arrays are
    fetched only in the candidates-only verify join)."""
    from dsci_524_g26_data_validation_spark.operators.dedup import (
        containment_pairs,
    )

    df = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(12))) for i in range(40)],
        "doc_id long, text string",
    )
    plan = _spark_plan(containment_pairs(df, threshold=0.5))
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning(_h" in line:
            assert "_sh" not in line and "text" not in line


def test_fertility_census_is_one_fused_scan(spark, tmp_path):
    """Uses its own parquet file: other modules cache documents.parquet,
    and the substituted InMemoryRelation's printed subtree carries a
    full-schema parquet scan that defeats the pruning assertion."""
    from dsci_524_g26_data_validation_spark.operators.tokens import (
        tokenizer_efficiency_census,
    )

    path = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, f"doc {i} text body", "en", f"s{i % 3}") for i in range(50)],
        "doc_id bigint, text string, lang string, source string",
    ).write.parquet(path)
    d = spark.read.parquet(path).withColumn(
        "tokens", F.array(F.lit(1), F.lit(2))
    )
    final = _final_plan(tokenizer_efficiency_census(d))
    final = final.split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "EvalPython" not in final
    # column pruning: the census never reads doc_id or lang
    read_schema = [l for l in final.splitlines() if "ReadSchema" in l][0]
    assert "doc_id" not in read_schema and "lang" not in read_schema


def test_component_survivors_broadcasts_pair_graph(spark, tmp_path):
    """The survivor election must broadcast the pair-graph-sized
    components frame against the column-pruned corpus projection — the
    corpus never shuffles. Regression: a LEFT-outer join with the hint
    on the preserved side is structurally un-broadcastable
    (BroadcastHashJoin LeftOuter only builds right), so the hint was
    silently dropped and the corpus projection shuffled.

    Own parquet file (the fertility-plan-test convention): other
    modules cache documents.parquet, and the substituted
    InMemoryRelation's printed subtree carries a full-schema scan that
    defeats the pruning assertion."""
    from dsci_524_g26_data_validation_spark.operators.dedup import (
        component_survivors,
    )

    path = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, f"body text {i}", i % 90 + 10) for i in range(200)],
        "doc_id bigint, text string, n_chars int",
    ).write.parquet(path)
    docs = spark.read.parquet(path)
    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (5, 5), (6, 5)], "id bigint, comp bigint"
    )
    out = component_survivors(comp, docs, metric_col="n_chars")
    plan = _spark_plan(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    # column pruning: only (doc_id, n_chars) read from the corpus scan
    scan = [l for l in plan.splitlines() if "FileScan parquet" in l][0]
    assert "text" not in scan


def test_json_contract_report_single_fused_agg(spark, sf_dir):
    """Every JSON-contract facet counter must ride ONE fused global
    aggregate over one scan: no hash-partitioned exchange (the only
    exchange is the 1-row SinglePartition gather), no Generate (facets
    are predicates, never an explode), and the stack pivot sits above
    the aggregate, adding zero jobs."""
    from dsci_524_g26_data_validation_spark.operators.json_contract import (
        JsonFieldRule,
        json_contract_report,
    )

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    rules = [
        JsonFieldRule(field="k", required=True, dtype="integer",
                      min_value=0, max_value=100),
        JsonFieldRule(field="tag", allowed=("a", "b")),
    ]
    rep = json_contract_report(
        e.repartition(4), rules, col="props", declared_only=True
    )
    plan = _spark_plan(rep)
    # no key shuffle anywhere — the only exchange this plan may ever
    # contain is the 1-row gather between partial and final
    # HashAggregate (AQE defers materializing it on small inputs)
    assert "Exchange hashpartitioning" not in plan
    assert plan.count("Exchange SinglePartition") <= 1
    assert plan.count("HashAggregate") == 2  # partial + final, fused
    # the only Generate is the JVM-side stack pivot ABOVE the aggregate
    # (a row-multiplying explode below it would be a defect)
    gens = [l for l in plan.splitlines() if "Generate" in l]
    assert len(gens) == 1 and "stack" in gens[0]
    assert plan.count("FileScan parquet") == 1


def test_json_contract_violations_single_parse(spark, sf_dir):
    """Triage must stay shuffle-free and parse the payload exactly ONCE
    per row no matter how many fields the contract declares: one
    from_json in the whole plan (no per-rule get_json_object fan-out,
    no pruned-parse copies pushed into a pre-explode filter), and the
    clean-row guard sits ABOVE the Generate (explode_outer of the
    null-filtered label array), where the optimizer cannot substitute
    facet expressions back into a pushed-down filter."""
    from dsci_524_g26_data_validation_spark.operators.json_contract import (
        JsonFieldRule,
        json_contract_violations,
    )

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    rules = [
        JsonFieldRule(field="k", required=True, dtype="integer"),
        JsonFieldRule(field="tag", allowed=("a", "b")),
        JsonFieldRule(field="sess", pattern="^s"),
    ]
    out = json_contract_violations(e, rules, ["event_id"], col="props")
    plan = _spark_plan(out)
    assert "Exchange" not in plan
    assert plan.count("from_json") == 1
    assert "get_json_object" not in plan
    lines = plan.splitlines()
    gen = next(i for i, l in enumerate(lines) if "Generate" in l)
    # plans print top-down: the isnotnull(_v) guard is ABOVE the
    # Generate, and no Filter anywhere re-parses the payload (a pushed
    # pre-explode filter would carry substituted pruned from_json
    # copies evaluated on every row)
    assert any("Filter" in l for l in lines[:gen])
    assert not any(
        "Filter" in l and ("from_json" in l or "get_json_object" in l)
        for l in lines
    )


def test_json_contract_report_single_parse(spark, sf_dir):
    """The report's fused aggregate must carry exactly one JSON parse
    per payload column — k rules ride one from_json projection, never
    k GetJsonObject parses of the same string per row."""
    from dsci_524_g26_data_validation_spark.operators.json_contract import (
        JsonFieldRule,
        json_contract_report,
    )

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    rules = [
        JsonFieldRule(field="k", required=True, dtype="integer",
                      min_value=0, max_value=100),
        JsonFieldRule(field="tag", allowed=("a", "b")),
        JsonFieldRule(field="sess", pattern="^s"),
    ]
    rep = json_contract_report(e, rules, col="props")
    plan = _spark_plan(rep)
    assert plan.count("from_json") == 1
    assert "get_json_object" not in plan


def test_interleave_census_corpus_read_once(spark, tmp_path):
    """The runs-frame localCheckpoint must truncate lineage so every
    downstream aggregate (run stats, entropy, JS) reads the materialized
    |runs|-frame, never the corpus: the output plan contains NO parquet
    scan — the corpus was scanned exactly once, inside the checkpoint."""
    from dsci_524_g26_data_validation_spark.operators.interleave import (
        interleaving_census,
    )

    path = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, f"src{i % 3}") for i in range(300)],
        "doc_id bigint, source string",
    ).repartition(4).write.parquet(path)
    d = spark.read.parquet(path).withColumn(
        "shard", (F.col("doc_id") % 4).cast("int")
    )
    out = interleaving_census(
        d, shard_col="shard", order_col="doc_id", source_col="source"
    )
    plan = _spark_plan(out)
    assert "FileScan parquet" not in plan
    assert "Scan ExistingRDD" in plan


def test_embedding_outlier_plans(spark, sf_dir):
    """Centroid-distance ops must stay UDF-free (the distance is a
    zip_with/aggregate codegen expression — no Arrow/Python eval node)
    and top-k must plan a per-partition heap, never a global sort."""
    from dsci_524_g26_data_validation_spark.operators import similarity

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    top = similarity.embedding_outlier_topk(
        e, id_col="vec_id", vec_col="embedding", dim=64, k=5
    )
    plan = _spark_plan(top)
    assert "TakeOrderedAndProject" in plan
    assert "EvalPython" not in plan  # no Batch/ArrowEvalPython
    census = similarity.embedding_outlier_census(
        e, vec_col="embedding", dim=64, z=2.0
    )
    cplan = _spark_plan(census)
    assert "EvalPython" not in cplan
