"""Semi-structured (JSON string) column profiling.

Event tables almost always carry a free-form JSON payload column
(`props` here) that flat column contracts cannot see into. This module
profiles such columns without ever materializing parsed structs:

* :func:`json_key_census` — which keys exist and how often (the schema
  you actually have, vs the one you assumed), plus NULL / malformed /
  empty-object pseudo-keys so payload rot is visible in the same report;
* :func:`json_field_stats` — numeric health of one declared field path
  (missing / non-numeric counts, min/max/avg) — the range-facet analog
  for a field the contract cannot address as a column.

Everything is Catalyst (`json_object_keys`, `get_json_object`,
`try_cast`) and deliberately mirrors DuckDB's `json_keys` /
`json_extract_string` / `TRY_CAST` semantics so the oracle replicates
values exactly: a row counts as ``__invalid__`` when the payload is
non-NULL but not a JSON object (Spark's ``json_object_keys`` returns
NULL there; DuckDB via ``json_valid``/``json_type``).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["json_key_census", "json_field_stats"]

NULL_KEY = "__null__"
INVALID_KEY = "__invalid__"
EMPTY_KEY = "__empty_object__"


def json_key_census(df: DataFrame, *, col: str = "props") -> DataFrame:
    """One row per JSON key: ``(key, n_rows, frac)`` — plus the
    ``__null__`` / ``__invalid__`` / ``__empty_object__`` pseudo-keys,
    so 100% of rows are accounted for by the report (a key's ``frac``
    is its presence rate over ALL rows, pseudo-rows included in the
    denominator).

    Scale shape: keys explode row-locally into a map-side-combined
    ``(key, count)`` aggregate — the exchange carries one row per
    distinct key per partition. The tiny count frame is materialized
    once (localCheckpoint, the skew-report pattern) because both the
    output and its total-row denominator read it; distinct JSON keys
    are bounded by the payload schema, not corpus size.
    """
    c = F.col(col)
    keys = F.json_object_keys(c)
    row_keys = (
        F.when(c.isNull(), F.array(F.lit(NULL_KEY)))
        .when(keys.isNull(), F.array(F.lit(INVALID_KEY)))
        .when(F.size(keys) == 0, F.array(F.lit(EMPTY_KEY)))
        .otherwise(keys)
    )
    # '__row__' marker per row rides the same explode so the total-row
    # denominator comes out of the SAME single scan as the key counts
    marked = F.concat(F.array(F.lit("__row__")), row_keys)
    counts = (
        df.select(F.explode_outer(marked).alias("key"))
        .filter(F.col("key").isNotNull())
        .groupBy("key")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    ).localCheckpoint()
    total = counts.filter(F.col("key") == "__row__").select(
        F.col("n_rows").alias("_total")
    )
    return (
        counts.filter(F.col("key") != "__row__")
        .crossJoin(F.broadcast(total))
        .select(
            "key",
            "n_rows",
            F.round(
                F.col("n_rows").cast("double") / F.col("_total").cast("double"),
                6,
            ).alias("frac"),
        )
        .orderBy(F.desc("n_rows"), F.asc("key"))
    )


def json_field_stats(
    df: DataFrame,
    *,
    col: str = "props",
    field: str,
    group_col: Optional[str] = None,
) -> DataFrame:
    """Numeric health of one JSON field path per group:
    ``(group?, n_rows, n_missing, n_nonnumeric, min_value, max_value,
    avg_value)``.

    ``n_missing`` counts rows where the field (or the whole payload) is
    absent; ``n_nonnumeric`` counts present values that don't cast to
    double (``try_cast`` — never an ANSI abort). One scan, one
    |groups|-row aggregate.
    """
    v = F.get_json_object(F.col(col), f"$.{field}")
    num = v.try_cast("double")
    gcols = [F.col(group_col)] if group_col else []
    pre = df.select(*gcols, v.alias("_v"), num.alias("_n"))
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.count_if(F.col("_v").isNull()).cast("bigint").alias("n_missing"),
        F.count_if(F.col("_v").isNotNull() & F.col("_n").isNull())
        .cast("bigint")
        .alias("n_nonnumeric"),
        F.round(F.min("_n"), 6).alias("min_value"),
        F.round(F.max("_n"), 6).alias("max_value"),
        F.round(F.avg("_n"), 6).alias("avg_value"),
    ]
    if group_col:
        return pre.groupBy(group_col).agg(*aggs)
    return pre.agg(*aggs)
