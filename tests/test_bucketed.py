"""Bucketed membership tables (plans/bucketed.py): the exact anti-join
authority must move O(|wave|), not O(|seen|) — clustering the state
table on url at write time removes its per-wave Exchange. Parity with
the plain-parquet join is pinned (same survivors), and the plan shape
is asserted so the property can't rot silently."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from kryptone_spark.plans.bucketed import (
    is_bucketed_scan,
    n_exchanges,
    register_membership_bucketed,
    save_membership_bucketed,
)
from kryptone_spark.synth import synth_frontier_df


@pytest.fixture()
def no_broadcast(spark):
    """Pin the sort-merge shape: at test scale the seen side would
    broadcast and hide the exchange count under test."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _frontier_urls(spark, n, start=0):
    return synth_frontier_df(
        spark, n, n_domains=50, hot_domain_share=0.0, start=start
    ).select("url")


def test_bucketed_antijoin_parity_and_plan(spark, tmp_path, no_broadcast):
    tbl = f"seen_bucketed_{uuid.uuid4().hex[:8]}"
    seen = _frontier_urls(spark, 20_000)
    # candidates straddle the seen boundary: ids 10k-30k, first half seen
    cand = _frontier_urls(spark, 20_000, start=10_000)
    try:
        save_membership_bucketed(seen, tbl, n_buckets=4)

        seen.write.mode("overwrite").parquet(str(tmp_path / "seen_plain"))
        plain = cand.join(
            spark.read.parquet(str(tmp_path / "seen_plain")), "url", "left_anti"
        )
        bucketed = cand.join(spark.table(tbl), "url", "left_anti")

        a = sorted(r["url"] for r in plain.collect())
        b = sorted(r["url"] for r in bucketed.collect())
        assert a == b and len(a) == 10_000

        # plain SMJ exchanges BOTH sides; bucketed exchanges only the
        # candidate batch — the state side is read in place
        assert n_exchanges(plain) == 2
        assert n_exchanges(bucketed) == 1
        assert is_bucketed_scan(bucketed)
        assert not is_bucketed_scan(plain)

        # per-wave delta append keeps the property (multi-file buckets:
        # the join may re-sort the state slice per task, but still no
        # state-side exchange)
        save_membership_bucketed(
            _frontier_urls(spark, 5_000, start=20_000), tbl, n_buckets=4,
            mode="append",
        )
        after = cand.join(spark.table(tbl), "url", "left_anti")
        assert after.count() == 5_000
        assert n_exchanges(after) == 1
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_register_existing_bucketed_dir(spark, no_broadcast):
    """Restart path: the in-memory catalog loses the metadata but the
    bucketed files survive — register_membership_bucketed re-attaches
    them with the clustering declared, and the join stays
    state-exchange-free."""
    tbl = f"seen_bucketed_{uuid.uuid4().hex[:8]}"
    tbl2 = f"{tbl}_reattached"
    seen = _frontier_urls(spark, 8_000)
    cand = _frontier_urls(spark, 8_000, start=4_000)
    try:
        save_membership_bucketed(seen, tbl, n_buckets=4)
        loc = (
            spark.sql(f"DESCRIBE TABLE EXTENDED {tbl}")
            .where(F.col("col_name") == "Location")
            .collect()[0]["data_type"]
        )
        reattached = register_membership_bucketed(spark, tbl2, loc, n_buckets=4)
        assert reattached.count() == 8_000
        j = cand.join(reattached, "url", "left_anti")
        assert j.count() == 4_000
        assert n_exchanges(j) == 1
        assert is_bucketed_scan(j)
    finally:
        # drop the re-attached (external) table FIRST — dropping the
        # managed one deletes the shared files
        spark.sql(f"DROP TABLE IF EXISTS {tbl2}")
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
