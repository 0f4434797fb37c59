"""dsci_524_g26_data_validation_spark — a from-scratch PySpark-native
data-contract validation engine with the capabilities of
UBC-MDS/DSCI_524_G26_Data_Validation (``pyos_data_validation``), rebuilt
Spark-first for Iceberg tables of pre-tokenized sequences at 10^12-row
scale (BASELINE.json north rule).

Public API mirrors the reference's four entry points plus the engine-level
checks; see SURVEY.md §2 for the operator inventory.
"""

from .types import (
    AggregateCheck,
    ConditionalRule,
    FunctionalDependencyRule,
    ColumnProfile,
    ColumnRule,
    Contract,
    ContractViolationError,
    DriftReport,
    ForeignKeyRule,
    Histogram,
    Issue,
    Summary,
    TableContract,
    TableProfile,
    ValidationResult,
    contract_from_dict,
    contract_from_json,
    contract_to_dict,
    contract_to_json,
    table_contract_from_dict,
    table_contract_from_json,
    table_contract_fingerprint,
    table_contract_to_dict,
    table_contract_to_json,
    dtypes_equivalent,
    normalize_dtype,
)
from .operators.infer import (
    column_entropies,
    frequent_values,
    correlation_census,
    group_quantiles,
    infer_contract,
    infer_profile,
)
from .operators.validate import (
    partition_verdicts,
    validate_and_fail,
    validate_by_group,
    validate_contract,
    violation_rows,
)
from .operators.compare import (
    compare_contracts,
    compare_table_contracts,
    read_compatibility,
)
from .operators.summarize import (
    DistributedSummary,
    summarize_violations,
    summarize_violations_df,
    summarize_violations_distributed,
)
from .operators.uniqueness import (
    duplicate_keys,
    functional_dependency_violations,
    uniqueness_violation_count,
)
from .operators.referential import referential_violations
from .operators.drift import (
    capture_histograms,
    chi_square,
    drift_scores,
    emd,
    js,
    ks,
    psi,
    drift_calendar,
    token_distribution_drift,
    token_drift_movers,
    token_histogram,
    unseen_categories,
    expected_distribution_check,
)
from .operators.sampling import (
    hash_sample,
    mixture_plan,
    mixture_report,
    stratified_hash_sample,
    violation_rate_estimate,
)
from .operators.slices import slice_violation_report
from .operators.benford import benford_report, benford_stat
from .operators.anomaly import cohort_compare, group_metric_anomalies
from .operators.tokens import (
    key_integrity_counts,
    tokenizer_efficiency_census,
    arrays_equal_udf,
    ntok_invariant_violations,
    token_equality_violations,
    vocab_violations,
)
from .operators.checks import aggregate_checks_report
from .operators.conditional import conditional_report, conditional_violations
from .operators.reconcile import (
    fixed_point_units,
    reconcile_aggregate,
    reconcile_summary,
)
from .operators.pii import (
    detect_pii,
    k_anonymity_report,
    pii_by_group,
    pii_documents,
    redact_pii,
    smallest_quasi_groups,
)
from .operators.funnel import apply_filters, filter_funnel
from .operators.curate import CurationResult, curate
from .operators.packing import pack_sequences, packing_summary
from .operators.preferences import (
    duplicate_prompt_census,
    preference_pair_report,
    preference_pair_violations,
)
from .operators.sessions import session_stats, sessionize
from .operators.splits import assign_splits, split_census, split_leakage
from .operators.chats import conversation_census, conversation_violations
from .operators.joins import (
    hot_join_keys,
    join_explosion_report,
    key_overlap_sketch,
)
from .operators.labels import (
    label_agreement_census,
    label_agreement_kappa,
    label_agreement_summary,
)
from .operators.terms import salient_terms
from .operators.vocab import ngram_diversity_census, zipf_census
from .operators.asof import asof_join
from .operators.timeseries import (
    change_point_report,
    freshness,
    interarrival_stats,
    interval_overlaps,
    monotonic_violations,
    order_health,
    sequence_gap_buckets,
    volume_calendar,
)
from .operators.quarantine import (
    quarantine_split,
    repair_rows,
    tag_rows,
    write_quarantine,
)
from .operators.skew import key_skew_report, salted_join, suggested_salt
from .adapters import (
    UnsupportedExpectation,
    expectations_to_table_contract,
    table_contract_to_expectations,
)
from .operators.heavy import (
    heavy_hitters,
    heavy_hitters_estimate,
    misra_gries_partials,
)
from .operators.missingness import comissingness, null_patterns
from .operators.lines import (
    frequent_lines,
    line_frequency,
    line_strip_report,
    strip_frequent_lines,
)
from .operators.outliers import robust_outlier_rows, robust_outlier_stats
from .operators.rowdiff import (
    partition_diff,
    partition_digests,
    row_digest,
    table_diff,
    table_diff_rows,
)
from .operators.sketches import (
    distinct_sketches,
    merged_distinct_estimates,
    sketch_consistency_report,
)
from .operators.profile_slices import (
    merge_profile_partials,
    profile_partials,
    profile_report,
)
from .operators.structure import (
    SequenceSpec,
    length_clipping_census,
    structure_census,
    structure_violations,
)
from .operators.detok import (
    detok_expr,
    detok_udf,
    roundtrip_census,
    roundtrip_violations,
)
from .operators.text import char_entropy_expr, entropy_census
from .operators.quality_rules import (
    GOPHER_RULE_NAMES,
    GOPHER_STOPWORDS,
    compression_census,
    dictionary_ratio_expr,
    gopher_census,
    gopher_flags,
    with_compression_ratio,
)
from .operators.multimodal import media_format_census, sniff_format_expr
from .operators.similarity import (
    centroid_vector,
    embedding_outlier_census,
    embedding_outlier_topk,
    semantic_dedup_pairs,
    semantic_deduplicate,
)
from .operators.json_profile import json_field_stats, json_key_census
from .operators.json_contract import (
    JsonFieldRule,
    json_contract_report,
    json_contract_violations,
)
from .operators.interleave import interleaving_census
from .operators.advisor import (
    suggest_bounds,
    suggest_contract,
    suggest_contract_and_bounds,
)
from .operators.incremental import (
    admit_batch,
    incremental_near_dup_pairs,
    minhash_index,
    shingle_hash_index,
)
from .operators.spans import (
    span_duplication_census,
    token_kgram_occurrences,
    top_duplicate_spans,
)
from .operators.table_validate import (
    DriftThresholds,
    run_resumable_validation,
    validate_table_contract,
)
from .operators.urls import (
    canonicalize_urls,
    domain_census,
    filter_blocked_domains,
    parse_urls,
)
from .operators.normalize import normalization_census, normalize_text
from .sources.manifest import FileManifestStore, metric_series, run_history
from .sources.files import clustering_report, file_census, flag_outlier_files
from .sources.shards import assign_shards, shard_plan, write_shards
from .sources.token_table import source_dim, token_table

__version__ = "0.1.0"

__all__ = [
    "AggregateCheck",
    "aggregate_checks_report",
    "ConditionalRule",
    "conditional_report",
    "conditional_violations",
    "tag_rows",
    "quarantine_split",
    "write_quarantine",
    "repair_rows",
    "SequenceSpec",
    "structure_census",
    "length_clipping_census",
    "detok_expr",
    "detok_udf",
    "roundtrip_census",
    "roundtrip_violations",
    "structure_violations",
    "char_entropy_expr",
    "entropy_census",
    "GOPHER_RULE_NAMES",
    "GOPHER_STOPWORDS",
    "compression_census",
    "curate",
    "CurationResult",
    "dictionary_ratio_expr",
    "gopher_census",
    "gopher_flags",
    "with_compression_ratio",
    "media_format_census",
    "sniff_format_expr",
    "semantic_dedup_pairs",
    "semantic_deduplicate",
    "row_digest",
    "distinct_sketches",
    "merged_distinct_estimates",
    "sketch_consistency_report",
    "profile_partials",
    "merge_profile_partials",
    "profile_report",
    "table_diff",
    "table_diff_rows",
    "partition_digests",
    "partition_diff",
    "null_patterns",
    "comissingness",
    "json_key_census",
    "json_field_stats",
    "JsonFieldRule",
    "json_contract_report",
    "json_contract_violations",
    "interleaving_census",
    "suggest_bounds",
    "suggest_contract",
    "suggest_contract_and_bounds",
    "centroid_vector",
    "embedding_outlier_census",
    "embedding_outlier_topk",
    "minhash_index",
    "shingle_hash_index",
    "incremental_near_dup_pairs",
    "admit_batch",
    "token_kgram_occurrences",
    "span_duplication_census",
    "top_duplicate_spans",
    "line_frequency",
    "frequent_lines",
    "strip_frequent_lines",
    "line_strip_report",
    "robust_outlier_stats",
    "robust_outlier_rows",
    "unseen_categories",
    "interval_overlaps",
    "monotonic_violations",
    "volume_calendar",
    "change_point_report",
    "fixed_point_units",
    "reconcile_aggregate",
    "reconcile_summary",
    "slice_violation_report",
    "benford_report",
    "benford_stat",
    "ColumnProfile",
    "FunctionalDependencyRule",
    "ColumnRule",
    "Contract",
    "ContractViolationError",
    "DriftReport",
    "ForeignKeyRule",
    "Histogram",
    "Issue",
    "Summary",
    "TableContract",
    "TableProfile",
    "ValidationResult",
    "contract_from_dict",
    "contract_from_json",
    "contract_to_dict",
    "contract_to_json",
    "table_contract_from_dict",
    "table_contract_from_json",
    "table_contract_fingerprint",
    "table_contract_to_dict",
    "table_contract_to_json",
    "dtypes_equivalent",
    "normalize_dtype",
    "group_quantiles",
    "infer_contract",
    "infer_profile",
    "validate_contract",
    "validate_and_fail",
    "validate_by_group",
    "violation_rows",
    "partition_verdicts",
    "compare_contracts",
    "compare_table_contracts",
    "summarize_violations",
    "summarize_violations_df",
    "summarize_violations_distributed",
    "DistributedSummary",
    "duplicate_keys",
    "uniqueness_violation_count",
    "referential_violations",
    "capture_histograms",
    "chi_square",
    "emd",
    "js",
    "ks",
    "psi",
    "column_entropies",
    "frequent_values",
    "correlation_census",
    "drift_scores",
    "drift_calendar",
    "read_compatibility",
    "functional_dependency_violations",
    "group_metric_anomalies",
    "cohort_compare",
    "hash_sample",
    "stratified_hash_sample",
    "mixture_plan",
    "filter_funnel",
    "apply_filters",
    "mixture_report",
    "expected_distribution_check",
    "token_distribution_drift",
    "token_drift_movers",
    "token_histogram",
    "violation_rate_estimate",
    "arrays_equal_udf",
    "ntok_invariant_violations",
    "token_equality_violations",
    "vocab_violations",
    "detect_pii",
    "pii_by_group",
    "pii_documents",
    "redact_pii",
    "pack_sequences",
    "packing_summary",
    "sessionize",
    "assign_splits",
    "split_census",
    "split_leakage",
    "salient_terms",
    "k_anonymity_report",
    "smallest_quasi_groups",
    "zipf_census",
    "ngram_diversity_census",
    "conversation_violations",
    "conversation_census",
    "label_agreement_census",
    "label_agreement_summary",
    "label_agreement_kappa",
    "join_explosion_report",
    "hot_join_keys",
    "preference_pair_violations",
    "preference_pair_report",
    "duplicate_prompt_census",
    "asof_join",
    "freshness",
    "interarrival_stats",
    "order_health",
    "sequence_gap_buckets",
    "session_stats",
    "key_skew_report",
    "suggested_salt",
    "salted_join",
    "heavy_hitters",
    "heavy_hitters_estimate",
    "misra_gries_partials",
    "UnsupportedExpectation",
    "expectations_to_table_contract",
    "table_contract_to_expectations",
    "DriftThresholds",
    "validate_table_contract",
    "run_resumable_validation",
    "FileManifestStore",
    "run_history",
    "metric_series",
    "key_overlap_sketch",
    "source_dim",
    "token_table",
    "parse_urls",
    "canonicalize_urls",
    "domain_census",
    "filter_blocked_domains",
    "normalize_text",
    "normalization_census",
    "assign_shards",
    "file_census",
    "clustering_report",
    "flag_outlier_files",
    "shard_plan",
    "write_shards",
]
