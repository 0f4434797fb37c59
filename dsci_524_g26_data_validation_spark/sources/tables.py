"""Table loading — Iceberg catalog tables or plain parquet paths.

The production target (BASELINE.json north rule) is Iceberg tables of
pre-tokenized sequences. Iceberg support in Spark is configuration, not
code: with the runtime jar on the classpath and a catalog configured,

    spark-submit \
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \
      --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.lake.type=rest \
      --conf spark.sql.catalog.lake.uri=... \
      --py-files dist/dv_engine.zip job.py

`spark.table("lake.db.tokens")` returns a DataFrame indistinguishable to
this engine from any other: the fused aggregation pushes column pruning
and predicate/partition pruning down through Iceberg's scan planning
(min/max column stats + partition spec), and the E7 resume path's
partition-column filters prune whole files. This sandbox ships no Iceberg
jar, so tests use parquet paths; the engine code is identical either way
— that is the point of this loader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["load_table"]


def load_table(spark: SparkSession, source: str) -> DataFrame:
    """Load a dataset by catalog table name or filesystem path.

    * ``"catalog.db.table"`` / ``"db.table"`` → ``spark.table`` — works
      for Iceberg, Hive, or any configured catalog; time travel via
      ``VERSION AS OF`` is available through ``spark.sql`` on top.
    * ``"/path/to/dir"`` or ``"...parquet"`` → parquet reader (dev/test).
    """
    looks_like_path = "/" in source or source.endswith(".parquet")
    if looks_like_path:
        return spark.read.parquet(source)
    return spark.table(source)
