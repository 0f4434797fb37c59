"""Catalyst expression surface of the engine — every reusable column
expression in one importable namespace.

These are plain ``pyspark.sql.Column`` builders (no UDFs unless noted),
so they compose with any user DataFrame code and stay inside whole-stage
codegen. Operators build on these; users can too:

    from dsci_524_g26_data_validation_spark import functions as dvf
    df.select(dvf.quality_score_expr("text"), dvf.token_count_expr("text"))
"""

from ..operators.text import (
    BPE_SPLIT_PATTERN,
    bpe_token_count_expr,
    bpe_tokens_expr,
    char_trigrams_expr,
    fingerprint_expr,
    kgram_hashes_expr,
    language_scores_expr,
    max_run_expr,
    ngram_profile_hits_expr,
    quality_score_expr,
    token_count_expr,
    tokens_expr,
    winnow_expr,
    word_ngrams_expr,
)
from ..operators.dedup import minhash_signature_expr, shingles_expr
from ..operators.similarity import (
    cosine_expr,
    dot_expr,
    lsh_signature_expr,
    norm_expr,
)
from ..operators.tokens import arrays_equal_udf  # Arrow pandas UDF (E6)
from ..plans.rule_compiler import categorical_cast, violation_predicates

__all__ = [
    "tokens_expr",
    "token_count_expr",
    "BPE_SPLIT_PATTERN",
    "bpe_tokens_expr",
    "bpe_token_count_expr",
    "quality_score_expr",
    "language_scores_expr",
    "char_trigrams_expr",
    "ngram_profile_hits_expr",
    "word_ngrams_expr",
    "max_run_expr",
    "fingerprint_expr",
    "kgram_hashes_expr",
    "winnow_expr",
    "shingles_expr",
    "minhash_signature_expr",
    "dot_expr",
    "norm_expr",
    "cosine_expr",
    "lsh_signature_expr",
    "arrays_equal_udf",
    "categorical_cast",
    "violation_predicates",
]
