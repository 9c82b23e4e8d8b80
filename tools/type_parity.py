"""Engine/oracle output-TYPE parity audit — the strict gate behind the
driver's value hash.

Root cause found in round 6: every round-5 driver ``hash_match: false``
query had at least one DuckDB oracle output column of type HUGEINT
(``sum()`` over integer inputs widens to int128 in DuckDB) while the Spark
side emits BIGINT. Under python ``fetchall`` both arrive as ``int`` and
compare equal (so tools/check_oracle.py stayed green), but under an
Arrow/pandas fetch — evidently the driver's path — HUGEINT becomes
``decimal128(38,0)`` / ``object``, and its canonical string differs from
an int64's. Every driver-green query had only BIGINT/INTEGER/DOUBLE/
VARCHAR/DATE/TIMESTAMP/BOOLEAN outputs.

Rule enforced here, per query, WITHOUT executing either engine (Spark
schema is lazy; DuckDB types come from binding the relation):

- no oracle column may be HUGEINT, UHUGEINT, or DECIMAL;
- oracle and Spark column types must agree cross-family per column name
  (integer-family vs float-family vs string vs bool vs temporal vs list).

Usage: python tools/type_parity.py [query ...]   (default: all)
Exit 1 if any violation.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

_INT = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT", "USMALLINT",
        "UINTEGER", "UBIGINT"}
_BAD = {"HUGEINT", "UHUGEINT"}
_FLOAT = {"FLOAT", "DOUBLE"}


def _family_duck(t: str) -> str:
    t = str(t).upper()
    if t in _BAD or t.startswith("DECIMAL"):
        return "BAD"
    if t in _INT:
        return "int"
    if t in _FLOAT:
        return "float"
    if t == "VARCHAR":
        return "str"
    if t == "BOOLEAN":
        return "bool"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP"):
        return "ts"
    if t.endswith("[]") or t.startswith("STRUCT") or t.startswith("MAP"):
        return "nested"
    return t


def _family_spark(t: str) -> str:
    if t in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if t in ("float", "double"):
        return "float"
    if t == "string":
        return "str"
    if t == "boolean":
        return "bool"
    if t == "date":
        return "date"
    if t.startswith("timestamp"):
        return "ts"
    if t.startswith(("array", "struct", "map")):
        return "nested"
    return t


def main(names):
    import __spark_entry__ as entrymod
    from gridmet_etl_spark.session import get_spark

    spark = get_spark()
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    if not names:
        names = [n for n in qs if n in sqls]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    bad = {}
    for name in names:
        if name not in sqls:
            continue
        try:
            sdf = qs[name](spark, SF_DIR)
            stypes = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
            rel = con.sql(sqls[name])
            otypes = dict(zip(rel.columns, [str(t) for t in rel.types]))
        except Exception as e:  # noqa: BLE001
            bad[name] = [f"ERROR building schemas: {e!r:.200}"]
            continue
        probs = []
        for c, ot in otypes.items():
            fo = _family_duck(ot)
            if fo == "BAD":
                probs.append(f"{c}: oracle {ot} (HUGEINT/DECIMAL not hash-safe)")
                continue
            if c not in stypes:
                probs.append(f"{c}: oracle-only column")
                continue
            fs = _family_spark(stypes[c])
            if fo != fs:
                probs.append(f"{c}: spark {stypes[c]} vs oracle {ot}")
        for c in stypes:
            if c not in otypes:
                probs.append(f"{c}: spark-only column")
        if probs:
            bad[name] = probs
    if bad:
        for n, probs in sorted(bad.items()):
            print(f"FAIL {n}")
            for p in probs:
                print(f"   {p}")
        print(f"\n{len(bad)}/{len(names)} queries with type-parity violations")
        return 1
    print(f"OK: {len(names)} queries type-parity clean")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
