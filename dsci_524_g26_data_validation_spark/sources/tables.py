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

Round-4 additions (VERDICT r3 item 4):

* **Time travel**: ``load_table(..., snapshot_id= / as_of_timestamp= /
  branch= / tag=)`` threads Iceberg's read options (``snapshot-id``,
  ``as-of-timestamp``, ``branch``, ``tag`` — the public option names from
  the Iceberg Spark docs) through ``spark.read.option(...).table(name)``.
  Validating "the table as of the snapshot the contract was inferred
  from" is what makes drift comparisons reproducible. On a non-Iceberg
  catalog table the options are ignored by the source, which the session-
  catalog tests pin so the plumbing cannot silently break.
* **Contract-in-table-properties** (SURVEY §1.1): a contract can live
  beside the data as the ``dv.contract`` table property (JSON), surviving
  spark-submit runs with no side-channel file. ``store_contract`` issues
  ``ALTER TABLE ... SET TBLPROPERTIES``, ``load_contract`` reads it back
  via ``SHOW TBLPROPERTIES`` — both statements work unchanged on Iceberg
  (where properties are snapshot-versioned) and on the session catalog
  used in tests.
"""

from __future__ import annotations

from typing import Mapping, Optional, Union

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "load_table",
    "time_travel_options",
    "store_contract",
    "load_contract",
    "CONTRACT_PROPERTY",
]

#: extension → Spark DataSource format for filesystem paths. Parquet is
#: the default for bare directories (the lake layout this engine targets).
_EXT_FORMATS = {
    ".parquet": "parquet",
    ".orc": "orc",
    ".csv": "csv",
    ".json": "json",
    ".jsonl": "json",
}

#: CSV needs a header row to produce named columns; contracts are by
#: column name. Explicit ``options`` override these defaults.
_FORMAT_DEFAULTS = {"csv": {"header": "true", "inferSchema": "true"}}

#: Table property under which :func:`store_contract` persists the
#: contract JSON (Iceberg: versioned with the table metadata).
CONTRACT_PROPERTY = "dv.contract"


def time_travel_options(
    *,
    snapshot_id: Optional[int] = None,
    as_of_timestamp: Optional[Union[int, str]] = None,
    branch: Optional[str] = None,
    tag: Optional[str] = None,
) -> dict:
    """Map time-travel args to Iceberg's documented read-option names.

    At most ONE selector may be set — Iceberg rejects combinations at
    scan planning; failing on the driver before any job is cheaper and
    the error names the conflict. ``as_of_timestamp`` is
    milliseconds-since-epoch (Iceberg's unit for ``as-of-timestamp``).
    """
    given = {
        "snapshot_id": snapshot_id,
        "as_of_timestamp": as_of_timestamp,
        "branch": branch,
        "tag": tag,
    }
    set_args = [k for k, v in given.items() if v is not None]
    if len(set_args) > 1:
        raise ValueError(
            f"at most one time-travel selector may be set, got {set_args}"
        )
    if snapshot_id is not None:
        return {"snapshot-id": str(int(snapshot_id))}
    if as_of_timestamp is not None:
        return {"as-of-timestamp": str(int(as_of_timestamp))}
    if branch is not None:
        return {"branch": branch}
    if tag is not None:
        return {"tag": tag}
    return {}


def load_table(
    spark: SparkSession,
    source: str,
    *,
    fmt: Optional[str] = None,
    options: Optional[Mapping[str, str]] = None,
    snapshot_id: Optional[int] = None,
    as_of_timestamp: Optional[Union[int, str]] = None,
    branch: Optional[str] = None,
    tag: Optional[str] = None,
) -> DataFrame:
    """Load a dataset by catalog table name or filesystem path.

    * ``"catalog.db.table"`` / ``"db.table"`` → ``spark.read.table`` —
      works for Iceberg, Hive, or any configured catalog. Time travel:
      pass exactly one of ``snapshot_id`` / ``as_of_timestamp`` (ms) /
      ``branch`` / ``tag``; the corresponding Iceberg read option
      (``snapshot-id`` etc.) is set on the reader. Extra reader
      ``options`` (e.g. Iceberg's ``streaming-skip-delete-snapshots``)
      pass through verbatim.
    * ``"/path/to/dir"`` or ``"...parquet"`` → parquet reader (columnar
      scan, the dev/test stand-in for Iceberg).
    * ``"....orc" / "....csv" / "....json(l)"`` → the matching reader —
      raw-landing-zone validation before data ever reaches the lake.
      CSV defaults to ``header=true, inferSchema=true`` (contracts are
      by column name); pass ``options`` to override, ``fmt`` to force a
      format regardless of extension.
    """
    tt = time_travel_options(
        snapshot_id=snapshot_id,
        as_of_timestamp=as_of_timestamp,
        branch=branch,
        tag=tag,
    )
    looks_like_path = "/" in source or any(
        source.endswith(ext) for ext in _EXT_FORMATS
    )
    if not looks_like_path and fmt is None:
        reader = spark.read
        for k, v in {**tt, **(options or {})}.items():
            reader = reader.option(k, v)
        return reader.table(source)
    if tt:
        raise ValueError(
            "time travel (snapshot_id/as_of_timestamp/branch/tag) applies "
            "to catalog tables only, not filesystem paths"
        )
    if fmt is None:
        fmt = next(
            (f for ext, f in _EXT_FORMATS.items() if source.endswith(ext)),
            "parquet",
        )
    opts = dict(_FORMAT_DEFAULTS.get(fmt, {}))
    opts.update(options or {})
    return spark.read.format(fmt).options(**opts).load(source)


def store_contract(spark: SparkSession, table: str, contract) -> None:
    """Persist ``contract`` (or a TableContract) as the ``dv.contract``
    table property — the contract travels WITH the table metadata
    (Iceberg: versioned per snapshot; session catalog: Hive metastore
    properties), so a `spark-submit --py-files` job needs only the table
    name to validate it."""
    from ..types import Contract, TableContract, contract_to_json
    from ..types import table_contract_to_json

    if isinstance(contract, TableContract):
        payload = table_contract_to_json(contract)
    elif isinstance(contract, Contract):
        payload = contract_to_json(contract)
    else:
        raise TypeError(
            f"expected Contract or TableContract, got {type(contract).__name__}"
        )
    # Backslashes first: Spark's default string-literal parsing
    # (escapedStringLiterals=false) collapses \\ -> \, so a contract
    # carrying a regex pattern rule (JSON renders \d as \\d) would be
    # corrupted into invalid JSON without the doubling.
    escaped = payload.replace("\\", "\\\\").replace("'", "''")
    spark.sql(
        f"ALTER TABLE {table} SET TBLPROPERTIES "
        f"('{CONTRACT_PROPERTY}' = '{escaped}')"
    )


def load_contract(spark: SparkSession, table: str):
    """Read the contract stored by :func:`store_contract` back from the
    table's properties. Returns a TableContract when the stored JSON has
    table-level rules, else a Contract; None when the property is absent.
    """
    import json as _json

    from ..types import contract_from_dict, table_contract_from_dict

    rows = spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
    props = {r["key"]: r["value"] for r in rows}
    raw = props.get(CONTRACT_PROPERTY)
    if raw is None:
        return None
    d = _json.loads(raw)
    if "contract" in d:  # TableContract envelope
        return table_contract_from_dict(d)
    return contract_from_dict(d)
