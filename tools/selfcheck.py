#!/usr/bin/env python
"""Self-check harness mimicking the driver's correctness gate.

For every key in __spark_entry__.queries():
  - run the Spark query at SF_DIR
  - if an oracle_sql() entry exists, run it in DuckDB with the parquet
    tables registered as views
  - compare row count, sorted column names, and a value hash computed
    the way the driver does: sort columns by name, sort rows, hash a
    canonical string rendering.

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""
from __future__ import annotations

import hashlib
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])


def _validate_only(known: set[str]) -> None:
    """A typo in ONLY must not produce a green '0 ok, 0 fail' run."""
    unknown = ONLY - known
    if unknown:
        sys.exit(f"unknown query name(s): {sorted(unknown)}")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round(9), matching tests/test_entry.py's normalize(): the two
        # harnesses must agree on tolerance or a query can pass one
        # gate and fail the other; queries round explicitly (6-8 dp)
        # wherever cross-engine float math happens, so this is a
        # drift DETECTOR, not a mask
        return repr(round(v, 9))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def hash_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    import __spark_entry__ as entry
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("selfcheck")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry.queries()
    _validate_only(set(qs))
    oracles = entry.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle)")
            n_rowsonly += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            otypes = {
                r[0]: r[1]
                for r in con.execute("DESCRIBE " + oracles[name]).fetchall()
            }
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        stypes = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
        equiv = {
            "BIGINT": {"bigint"},
            "INTEGER": {"int"},
            "SMALLINT": {"smallint"},
            "TINYINT": {"tinyint"},
            "UBIGINT": {"bigint"},
            "HUGEINT": {"bigint", "decimal(38,0)"},
            "DOUBLE": {"double"},
            "FLOAT": {"float"},
            "BOOLEAN": {"boolean"},
            "VARCHAR": {"string"},
            "DATE": {"date"},
            "TIMESTAMP": {"timestamp", "timestamp_ntz"},
            "TIMESTAMP WITH TIME ZONE": {"timestamp"},
        }
        for c in scols:
            st, ot = stypes.get(c), otypes.get(c)
            if ot is None or st is None:
                continue
            if ot.startswith(("DECIMAL", "VARCHAR[]", "STRUCT", "MAP")) or st.startswith(("array", "struct", "map")):
                # containers compared by value hash; DECIMAL always flagged
                if ot.startswith("DECIMAL") and not st.startswith("decimal"):
                    problems.append(f"type {c}: spark={st} duckdb={ot}")
                continue
            ok = equiv.get(ot)
            if ok is not None and st not in ok:
                problems.append(f"type {c}: spark={st} duckdb={ot}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if not problems:
            hs = hash_rows(scols, srows)
            ho = hash_rows(ocols, orows)
            if hs != ho:
                problems.append("value-hash mismatch")
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                ls = sorted("|".join(canon(r[i]) for i in order_s) for r in srows)
                lo = sorted("|".join(canon(r[i]) for i in order_o) for r in orows)
                for a, b in zip(ls, lo):
                    if a != b:
                        problems.append(f"first diff:\n  spark : {a[:300]}\n  oracle: {b[:300]}")
                        break
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems[:3]))
            n_fail += 1
        else:
            print(f"OK    {name}: {len(srows)} rows")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_rowsonly} rows-only, {n_fail} fail")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
