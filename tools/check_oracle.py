"""Local driver-style oracle check: run a contract query on Spark and its
DuckDB oracle SQL at sf0.01, sort columns by name, and compare row count,
schema width, and an order-insensitive canonical value multiset.

Usage: python tools/check_oracle.py [query ...]   (default: all with oracles)
"""
from __future__ import annotations

import math
import os
import sys
from collections import Counter
from datetime import datetime, date
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    if isinstance(v, Decimal):
        return f"{float(v):.6f}"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, datetime):
        # both engines floor ns->us on the nanos events table
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def _rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_canon(r[i]) for i in order) for r in rows)


def main(names):
    import __spark_entry__ as entrymod
    from gridmet_etl_spark.session import get_spark

    spark = get_spark()
    ALL_QUERIES = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    targets = names or [n for n in ALL_QUERIES if n in oracles]
    failures = []
    for name in targets:
        if name not in oracles:
            print(f"{name:28s} SKIP (no oracle)")
            continue
        sdf = ALL_QUERIES[name](spark, SF_DIR)
        srows = sdf.collect()
        scols = sdf.columns
        res = con.execute(oracles[name])
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        ok_rows = len(srows) == len(orows)
        ok_cols = sorted(scols) == sorted(ocols)
        sms = _rows_to_multiset(scols, srows)
        oms = _rows_to_multiset(ocols, orows)
        ok_vals = sms == oms
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        print(
            f"{name:28s} {status}  rows {len(srows)}/{len(orows)}"
            f" cols={'ok' if ok_cols else f'{sorted(scols)} vs {sorted(ocols)}'}"
            f" vals={'ok' if ok_vals else 'MISMATCH'}"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_vals and ok_rows and ok_cols:
                diff_s = list((sms - oms).keys())[:3]
                diff_o = list((oms - sms).keys())[:3]
                print(f"  spark-only: {diff_s}")
                print(f"  oracle-only: {diff_o}")
    print(f"\n{len(targets) - len(failures)}/{len(targets)} OK")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
