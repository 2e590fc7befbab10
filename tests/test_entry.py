"""Driver-contract replica: run every ``queries()`` entry on Spark and
its ``oracle_sql()`` on DuckDB over the same parquet, compare row count,
column names, and order-insensitive values — the same comparison the
harness applies at sf0.01 (here at sf0.001 for speed)."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"


def duck_run(sql: str):
    con = duckdb.connect()
    for t in entry_mod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 9)
            if isinstance(v, bool):
                v = bool(v)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(cols), sorted(out, key=lambda t: tuple(map(str, t)))


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql().keys()))
def test_query_matches_oracle(spark, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    d_cols, d_rows = duck_run(entry_mod.oracle_sql()[name])

    nc_s, nr_s = normalize(s_cols, s_rows)
    nc_d, nr_d = normalize(d_cols, d_rows)
    assert nc_s == nc_d, f"{name}: columns {nc_s} vs {nc_d}"
    assert len(nr_s) == len(nr_d), f"{name}: rowcount {len(nr_s)} vs {len(nr_d)}"
    mismatches = [
        (a, b) for a, b in zip(nr_s, nr_d) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_spark_only_queries_run(spark):
    oracles = set(entry_mod.oracle_sql())
    for name, q in entry_mod.queries().items():
        if name in oracles:
            continue
        df = q(spark, SF_DIR)
        assert df.count() >= 0 and df.columns, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"url", "domain", "rank_in_domain", "fetch_at_s"}
