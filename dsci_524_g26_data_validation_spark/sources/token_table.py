"""Deterministic synthetic tokenized-sequence table (FIXTURES.md F7).

The north-rule target table (BASELINE.json input_hint):
``(doc_id:string, tokens:array<int>, n_tok:int, source:string)``.

Generation is **pure Catalyst over spark.range** — no driver-side data, no
Python UDFs, fully distributed and seed-deterministic, so the same call
produces the identical table at 10^4 rows (tests) or 10^9+ rows (bench /
cluster). Violation-injection switches create exactly the anomalies the
engine's checks must catch:

* ``dup_frac``            → duplicate doc_ids           (uniqueness, E1)
* ``unknown_source_frac`` → source values outside the dim (referential, E2)
* ``bad_ntok_frac``       → n_tok != size(tokens)        (invariant, E5)
* ``mutate_frac``         → token arrays differing from the clean copy (E6)

All selections hash the row id with distinct salts, so the injected sets
are disjoint-ish, reproducible, and scale-invariant in expectation.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["token_table", "source_dim", "SOURCES", "VOCAB_SIZE"]

SOURCES = ["web", "books", "code", "wiki"]
#: skewed source weights (percent) — 'web' dominates to exercise salting
_SOURCE_CUTS = [85, 93, 98]  # web <85, books <93, code <98, wiki else
VOCAB_SIZE = 50257


def _u(seed: int, salt: int, mod: int):
    """Deterministic uniform integer in [0, mod) per row id."""
    return F.pmod(F.xxhash64(F.col("id"), F.lit(seed), F.lit(salt)), F.lit(mod))


def token_table(
    spark: SparkSession,
    n_rows: int,
    *,
    seed: int = 42,
    dup_frac: float = 0.0,
    bad_ntok_frac: float = 0.0,
    unknown_source_frac: float = 0.0,
    mutate_frac: float = 0.0,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Build the synthetic token table.

    Token lengths follow a skewed mixture (70% short 16–79, 30% long
    80–463) so partitions carry uneven byte weight, like real pre-tokenized
    training shards.
    """
    num_partitions = num_partitions or spark.sparkContext.defaultParallelism
    df = spark.range(0, n_rows, 1, num_partitions)
    ppm = lambda frac: int(round(frac * 1_000_000))  # noqa: E731

    # doc_id; duplicates point a marked row at its predecessor's id
    dup_marker = (_u(seed, 1, 1_000_000) < F.lit(ppm(dup_frac))) & (F.col("id") > 0)
    base_id = F.when(dup_marker, F.col("id") - 1).otherwise(F.col("id"))
    doc_id = F.format_string("doc%012d", base_id)

    # skewed length mixture
    short = _u(seed, 2, 10) < 7
    length = F.when(short, F.lit(16) + _u(seed, 3, 64)).otherwise(
        F.lit(80) + _u(seed, 4, 384)
    )

    # tokens: element j hashes (id, j) into the vocab — array built by
    # Catalyst transform(), evaluated executor-side, codegen-friendly.
    tokens = F.transform(
        F.sequence(F.lit(1), length),
        lambda j: F.pmod(
            F.xxhash64(F.col("id"), j, F.lit(seed), F.lit(5)), F.lit(VOCAB_SIZE)
        ).cast("int"),
    )

    # optional E6 mutation: bump the first token on marked rows
    if mutate_frac > 0:
        mut_marker = _u(seed, 6, 1_000_000) < F.lit(ppm(mutate_frac))
        tokens = F.when(
            mut_marker,
            F.concat(
                F.array(
                    F.pmod(F.element_at(tokens, 1) + 1, F.lit(VOCAB_SIZE)).cast("int")
                ),
                F.slice(tokens, 2, 1_000_000),
            ),
        ).otherwise(tokens)

    # n_tok invariant, with injected off-by-one on marked rows (E5)
    n_tok = F.size(tokens)
    if bad_ntok_frac > 0:
        bad_marker = _u(seed, 7, 1_000_000) < F.lit(ppm(bad_ntok_frac))
        n_tok = F.when(bad_marker, n_tok + 1).otherwise(n_tok)

    # skewed source; optional unknown values (E2)
    r = _u(seed, 8, 100)
    source = (
        F.when(r < _SOURCE_CUTS[0], SOURCES[0])
        .when(r < _SOURCE_CUTS[1], SOURCES[1])
        .when(r < _SOURCE_CUTS[2], SOURCES[2])
        .otherwise(SOURCES[3])
    )
    if unknown_source_frac > 0:
        unk_marker = _u(seed, 9, 1_000_000) < F.lit(ppm(unknown_source_frac))
        source = F.when(unk_marker, F.lit("martian")).otherwise(source)

    return df.select(
        doc_id.alias("doc_id"),
        tokens.alias("tokens"),
        n_tok.cast("int").alias("n_tok"),
        source.alias("source"),
    )


def source_dim(spark: SparkSession) -> DataFrame:
    """The sources dimension the token table's ``source`` FK points at."""
    return spark.createDataFrame([(s,) for s in SOURCES], "source string")
