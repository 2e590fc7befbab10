"""functions/rank.py — two-phase global ordering must equal the
single-partition window exactly, while never planning an
all-to-one-partition exchange."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from kryptone_spark.functions.rank import global_row_number, ranked_top_k


@pytest.fixture(scope="module")
def skewed(spark):
    # non-uniform keys: exercises uneven range partitions + empty ones
    return spark.range(5000).select(
        F.concat(
            F.lit("http://d"),
            (F.col("id") % 7).cast("string"),
            F.lit(".test/p-"),
            F.pow(F.col("id"), 2).cast("long").cast("string"),
        ).alias("url"),
        (F.col("id") % 3 == 0).alias("matched"),
    ).localCheckpoint()


def test_global_row_number_matches_window(skewed):
    order = [F.desc("matched"), F.asc("url")]
    got = {
        r["url"]: r["rk"]
        for r in global_row_number(skewed, order, out_col="rk").collect()
    }
    w = Window.partitionBy(F.lit(1)).orderBy(*order)
    want = {
        r["url"]: r["rk"]
        for r in skewed.withColumn("rk", F.row_number().over(w)).collect()
    }
    assert got == want


def test_global_row_number_start_offset(skewed):
    got = global_row_number(skewed, [F.asc("url")], out_col="rk", start=0)
    rows = got.orderBy("rk").limit(3).collect()
    assert [r["rk"] for r in rows] == [0, 1, 2]
    urls = sorted(r["url"] for r in skewed.collect())
    assert [r["url"] for r in rows] == urls[:3]


def test_global_row_number_empty(spark):
    df = spark.createDataFrame([], "url string")
    assert global_row_number(df, [F.asc("url")]).count() == 0


def test_ranked_top_k_matches_window(skewed):
    order = [F.asc("matched"), F.desc("url")]
    got = ranked_top_k(skewed, order, 25).collect()
    assert len(got) == 25
    w = Window.partitionBy(F.lit(1)).orderBy(*order)
    want = (
        skewed.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 25)
        .collect()
    )
    assert sorted((r["url"], r["rnk"]) for r in got) == sorted(
        (r["url"], r["rnk"]) for r in want
    )


def test_ranked_top_k_plans_take_ordered(skewed):
    plan = ranked_top_k(
        skewed, [F.asc("url")], 10
    )._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_no_single_partition_exchange(skewed):
    plan = global_row_number(
        skewed, [F.asc("url")]
    )._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_global_row_number_shuffles_once(skewed):
    """The mid-index form must stay window-free and single-exchange:
    the old window-on-__pid form planned a SECOND full exchange
    (hashpartitioning(__pid)) after the range exchange — the whole
    dataset crossed the wire twice. Offsets must ride a broadcast, not
    a create_map literal (per-row linear scan, codegen blowup at
    cluster-scale P)."""
    plan = global_row_number(
        skewed, [F.asc("url")], num_partitions=4
    )._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(__pid" not in plan
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan


def test_ranked_top_k_plans_no_window(skewed):
    plan = ranked_top_k(
        skewed, [F.asc("url")], 10
    )._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_global_cumsum_decimal_values(spark):
    """A DECIMAL value column must not have its fractional
    per-partition totals truncated in the driver-side offset fold
    (int(Decimal('2.5')) == 2 would corrupt every downstream
    partition's running sum): decimal folds in the double family."""
    from decimal import Decimal

    from kryptone_spark.functions.rank import global_cumsum

    rows = [(i, Decimal(f"{i}.5")) for i in range(40)]
    df = spark.createDataFrame(rows, "k int, v decimal(10,1)")
    got = {
        r["k"]: float(r["cs"])
        for r in global_cumsum(
            df, [F.asc("k")], F.col("v"), out_col="cs", num_partitions=4
        ).collect()
    }
    acc, want = 0.0, {}
    for i in range(40):
        want[i] = acc
        acc += i + 0.5
    assert got == pytest.approx(want)
