"""E2 — referential-integrity check with broadcast / salted anti-join.

North rule (BASELINE.json:14): fact.key ⊆ dim.key at 10^12 fact rows,
with explicit skew handling on the key (the token table's ``source``
column is deliberately skewed ~85% to one value).

Two physical strategies, chosen explicitly:

* **broadcast** (default for small dims — the usual case for a sources /
  language / license dimension): ``left_anti`` against
  ``F.broadcast(dim)``; zero shuffle of the fact table, embarrassingly
  parallel, perfect scaling.
* **salted shuffle** for large dims: the fact side gets a salt column
  (derived from its physical partition, cheap and deterministic-enough);
  the dim side is replicated S× with every salt value; the anti-join runs
  on (key, salt) so a hot key spreads over S reducers instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["referential_violations", "DEFAULT_SALT_BUCKETS"]

DEFAULT_SALT_BUCKETS = 16


def referential_violations(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str | None = None,
    *,
    strategy: str = "broadcast",
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Rows of ``fact`` whose ``fact_key`` has no match in ``dim.dim_key``.

    NULL fact keys are violations only per SQL anti-join semantics: a NULL
    never matches, so NULL-keyed rows are returned (they reference
    nothing). Filter them upstream if NULLs are allowed.
    """
    dim_key = dim_key or fact_key
    dim_keys = dim.select(F.col(f"`{dim_key}`").alias("_dk")).dropDuplicates(["_dk"])

    if strategy == "broadcast":
        return fact.join(
            F.broadcast(dim_keys),
            on=fact[f"`{fact_key}`"] == F.col("_dk"),
            how="left_anti",
        )
    if strategy != "salted":
        raise ValueError(f"unknown strategy: {strategy!r} (broadcast|salted)")

    # salted shuffle anti-join: fact salt is a cheap function of physical
    # placement (uniform across a hot key's rows because a hot key spans
    # many input partitions); dim replicated salt_buckets times.
    fact_s = fact.withColumn(
        "_salt", F.pmod(F.spark_partition_id(), F.lit(salt_buckets))
    )
    dim_s = dim_keys.join(
        F.broadcast(
            fact.sparkSession.range(salt_buckets).select(
                F.col("id").cast("int").alias("_salt")
            )
        )
    )
    joined = fact_s.join(
        dim_s,
        on=(fact_s[f"`{fact_key}`"] == dim_s["_dk"])
        & (fact_s["_salt"] == dim_s["_salt"]),
        how="left_anti",
    )
    return joined.drop("_salt")
