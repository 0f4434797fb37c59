"""Local replica of the driver's correctness gate: run every
__spark_entry__ query at sf0.01 AND its DuckDB oracle, compare
row-count + schema + order-insensitive values (columns sorted by name).

Driver-faithful typing (round-4): the driver hashes values after a
pandas-style conversion, so DuckDB HUGEINT/DOUBLE render as ``5.0``
while a Spark BIGINT renders as ``5`` — str()-based normalization
alone misses that (this is exactly how the two r3 hash-reds slipped
past the replica).  We therefore ALSO compare "render classes":
integer-like vs float-like vs bool vs string vs temporal vs nested,
derived from the real engine types (duckdb ``rel.types`` / Spark
``df.schema``).  A HUGEINT oracle column against a Spark bigint is a
TYPE-FAIL even when the numeric values agree.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2:] or None

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if v != v:
            return "nan"
        return f"{v:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, bool):
        return str(v).lower()
    if v is None:
        return ""
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out), [cols[i] for i in order]


def duck_render_class(t) -> str:
    """Render class a pandas-based hasher sees for a DuckDB type."""
    s = str(t).upper()
    if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if s in ("HUGEINT", "UHUGEINT"):
        # pandas converts int128 to float64 -> renders "5.0" not "5"
        return "float"
    if s in ("FLOAT", "DOUBLE", "REAL") or s.startswith("DECIMAL"):
        return "float"
    if s == "BOOLEAN":
        return "bool"
    if s in ("VARCHAR", "STRING", "TEXT", "UUID"):
        return "str"
    if s == "DATE":
        return "date"
    if s.startswith("TIMESTAMP"):
        return "timestamp"
    if s.endswith("[]") or s.startswith(("LIST", "ARRAY")):
        return "array"
    if s.startswith(("STRUCT", "MAP")):
        return "nested"
    return "other"


def spark_render_class(dt) -> str:
    """Render class for a Spark SQL type (df.schema field dataType)."""
    s = dt.simpleString()
    if s in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    # Spark decimals arrive in pandas as Decimal objects which render
    # like floats ("5.0"); group with float as DuckDB DECIMAL does.
    if s in ("float", "double") or s.startswith("decimal"):
        return "float"
    if s == "boolean":
        return "bool"
    if s in ("string", "varchar", "char"):
        return "str"
    if s == "date":
        return "date"
    if s.startswith("timestamp"):
        return "timestamp"
    if s.startswith("array"):
        return "array"
    if s.startswith(("struct", "map")):
        return "nested"
    return "other"


def main():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
            sclasses = {
                f.name: spark_render_class(f.dataType)
                for f in sdf.schema.fields
            }
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            orel = con.sql(oracles[name])
            orows = orel.fetchall()
            ocols = [d[0] for d in orel.description]
            oclasses = {
                c: duck_render_class(t)
                for c, t in zip(ocols, orel.types)
            }
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        type_mismatch = [
            (c, sclasses.get(c), oclasses.get(c))
            for c in sorted(set(scols) & set(ocols))
            if sclasses.get(c) != oclasses.get(c)
        ]
        if type_mismatch:
            print(f"FAIL {name}: render-class mismatch "
                  f"(col, spark, oracle): {type_mismatch}")
            n_fail += 1
            continue
        sv, sc = canon(srows, scols)
        ov, oc = canon(orows, ocols)
        if sc != oc:
            print(f"FAIL {name}: columns differ spark={sc} oracle={oc}")
            n_fail += 1
        elif len(sv) != len(ov):
            print(f"FAIL {name}: rowcount spark={len(sv)} oracle={len(ov)}")
            n_fail += 1
        elif sv != ov:
            diffs = [(a, b) for a, b in zip(sv, ov) if a != b][:5]
            print(f"FAIL {name}: values differ; first diffs: {diffs}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(sv)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
