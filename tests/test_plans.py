"""Plan-shape regression tests — the physical plans the engine promises.

These pin the properties that matter at 100 TB and that silently rot:
filter pushdown reaching the parquet scan, column pruning, broadcast
joins for small dims, zero/one-exchange shapes for the hot pipeline
stages, and no Python evaluation nodes in the data path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kryptone_spark.config import CrawlConfig
from kryptone_spark.operators import admission, schedule

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


@pytest.fixture(scope="module")
def entry():
    import __spark_entry__ as e
    return e


def test_pricing_pushdown_and_pruning(spark, entry):
    plan = plan_of(entry.queries()["lineitem_pricing"](spark, SF))
    # the shipdate filter must reach the parquet scan
    assert "LessThanOrEqual(l_shipdate" in plan
    # column pruning: the scan reads only the 6 needed columns
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_tax" not in read and "l_orderkey" not in read
    assert read.count(":") >= 6


def test_revenue_chain_broadcasts_dims(spark, entry):
    import re

    plan = plan_of(entry.queries()["revenue_by_nation"](spark, SF))
    # all three dims broadcast at test scale; the fact table streams
    # (formatted explain lists each operator once in the tree and once
    # as a numbered detail header — count the detail headers)
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) == 3
    assert "SortMergeJoin" not in plan


def test_top_revenue_topk_before_join(spark, entry):
    """top_revenue_orders must take the top-10 of the aggregated
    revenue side FIRST (TakeOrderedAndProject) and then broadcast those
    10 keys to orders — the orders table itself never shuffles. The
    old join-then-topk shape exchanged the full orders table to rank
    10 rows."""
    plan = plan_of(entry.queries()["top_revenue_orders"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    # the only exchanges allowed: the revenue groupBy's own shuffle and
    # the single-partition pass that ranks the 10 survivors — no plain
    # exchange may touch the orders scan side (the orders scan feeds
    # the broadcast join directly)
    import re
    exchanges = re.findall(r"\(\d+\) Exchange", plan)
    assert len(exchanges) <= 2, plan
    orders_scan = plan.index("orders.parquet")
    assert not re.search(r"\(\d+\) Exchange", plan[orders_scan:]), plan


def test_semi_and_anti_joins(spark, entry):
    assert "LeftSemi" in plan_of(entry.queries()["customer_semi_join"](spark, SF))
    assert "LeftAnti" in plan_of(entry.queries()["part_anti_join"](spark, SF))


def test_admission_is_map_only_no_shuffle(spark):
    """Stateless admission (P1-P13 minus membership) must compile to a
    map-only plan: zero exchanges, zero Python eval nodes. The P2
    dot-segment fold (a higher-order function, not codegen-able) is
    deliberately isolated in ONE interpreted single-column projection
    behind a barrier (admission.py) — every OTHER operator, including
    the regex-heavy part extractions and all predicates, must still be
    inside whole-stage codegen."""
    links = spark.range(100).select(
        F.concat(F.lit("http://site0.test/p-"), F.col("id")).alias("url")
    )
    config = CrawlConfig(
        start_urls=["http://site0.test/"], ignore_images=True,
        gather_ignore_tests=[r"/x/"], rule_tests=[],
    )
    plan = plan_of(admission.admit(links, config, allow_home=False))
    assert "Exchange" not in plan
    assert "EvalPython" not in plan  # no row- or arrow-Python in the path
    # in formatted explain every operator detail line is either
    # '(N) Op [codegen id : M]' or '(N) Op' (outside codegen); exactly
    # ONE op may be outside codegen — the resolve projection — and the
    # regex-heavy part extraction + all predicates must stay codegen'd
    # on both sides of it (two spans).
    import re as _re
    outside = _re.findall(r"(?m)^\(\d+\) (\w+)$", plan)
    assert outside == ["Project"], outside
    codegen_spans = set(_re.findall(r"\[codegen id : (\d+)\]", plan))
    assert len(codegen_spans) == 2, codegen_spans


def test_politeness_schedule_single_exchange(spark):
    """The W1 window costs exactly one hash exchange on domain
    (unsalted form); salting adds exactly one more."""
    frontier = spark.range(1000).select(
        F.concat(F.lit("http://site"), (F.col("id") % 5), F.lit(".test/p-"), F.col("id")).alias("url"),
        F.concat(F.lit("site"), (F.col("id") % 5), F.lit(".test")).alias("domain"),
        F.lit(0).alias("domain_bucket"),
        F.lit(0).alias("depth"),
        F.lit(0).alias("discovered_wave"),
        F.lit(0.0).alias("priority"),
    )
    import re

    def n_exchanges(df) -> int:
        return len(re.findall(r"\(\d+\) Exchange", plan_of(df)))

    config = CrawlConfig(max_per_domain_per_wave=10, wait_time=1.0)
    batch, _ = schedule.politeness_schedule(frontier, config, wave=0, global_rank=False)
    assert n_exchanges(batch) == 1
    salted, _ = schedule.politeness_schedule(
        frontier, config, wave=0, global_rank=False, salt_buckets=8
    )
    assert n_exchanges(salted) == 2


def test_seen_antijoin_no_python(spark, entry):
    plan = plan_of(entry.queries()["seen_antijoin"](spark, SF))
    assert "LeftAnti" in plan
    assert "EvalPython" not in plan


def test_torn_write_is_not_committed(spark, tmp_path):
    """A wave directory without Spark's _SUCCESS job-commit marker
    (what a crash mid-write leaves behind) must NOT count as committed
    — directory existence satisfying the 'lineage last' contract would
    resume past an unwritten wave."""
    import pathlib

    from kryptone_spark.plans.tableio import TableIO

    io = TableIO(spark, str(tmp_path / "t"))
    df = spark.createDataFrame([("http://a.test/", 0)], "url string, domain_bucket int")
    io.write_wave("lineage", df, 0)
    io.write_wave("lineage", df, 1)
    assert io.committed_waves("lineage") == [0, 1]
    # simulate the torn write: wave dir exists, no _SUCCESS
    torn = pathlib.Path(tmp_path / "t" / "lineage" / "wave=2")
    torn.mkdir(parents=True)
    (torn / "_temporary").mkdir()
    assert io.committed_waves("lineage") == [0, 1]


def test_incremental_dedup_probe_plan(spark):
    """The in-loop dedup probe's plan promises: the INDEX side is
    pruned by a BROADCAST semi-join on the batch's buckets before the
    pair join (the corpus never rides a shuffle keyed on anything the
    batch didn't touch), and no global window appears anywhere."""
    from kryptone_spark.operators import dedup

    idx = spark.createDataFrame(
        [(f"d{i}", i % 4, f"b{i % 7}") for i in range(100)],
        "doc_id string, band int, bucket string",
    )
    new = spark.createDataFrame(
        [("n1", "some new text here"), ("n2", "other text body")],
        "doc_id string, text string",
    )
    plan = plan_of(dedup.lsh_pairs_vs_index_df(idx, new))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "Window" not in plan


def test_fetch_join_orientation_matches_wave_width(spark):
    """A narrow wave (hub pages whose fan-out dwarfs the page count)
    must BROADCAST the batch and semi-join the documents side, so the
    link explode + admission chain inherits the documents table's full
    width instead of the batch's ~1 coalesced partition. A wide wave
    (or one past the broadcast row ceiling) streams the batch through
    the plain left join."""
    from kryptone_spark.plans.waves import fetch_documents_join

    docs = spark.range(64).select(
        F.concat(F.lit("http://s.test/p-"), F.col("id")).alias("doc_id"),
        F.array().cast(
            "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
        ).alias("spans"),
    ).repartition(8)
    batch = spark.createDataFrame(
        [("http://s.test/p-1",), ("http://s.test/p-2",)], "url string"
    ).coalesce(1)

    narrow = fetch_documents_join(
        batch, docs, nparts=1, fetched=2, parallelism=8
    )
    plan = plan_of(narrow)
    assert "LeftSemi" in plan and "BroadcastHashJoin" in plan
    # output carries the docs side's columns (url + spans)
    assert set(narrow.columns) == {"url", "spans"}

    wide = fetch_documents_join(
        batch, docs, nparts=8, fetched=100_000, parallelism=8
    )
    wplan = plan_of(wide)
    assert "LeftSemi" not in wplan
    # over-ceiling narrow wave must also refuse the broadcast
    over = fetch_documents_join(
        batch, docs, nparts=1, fetched=2_000_000, parallelism=8
    )
    assert "LeftSemi" not in plan_of(over)


def test_clustered_documents_join_exchanges_batch_only(spark):
    """WaveRunner(cluster_documents=True) hash-clusters the documents
    table on doc_id once (checkpointed); the wide-wave fetch join must
    then recognize the docs side's partitioning and plan exactly ONE
    exchange — the wave batch — instead of reshuffling the corpus every
    wave (measured 1.5x on a 400k-page crawl). Without clustering the
    same join exchanges both sides."""
    from kryptone_spark.plans.bucketed import n_exchanges
    from kryptone_spark.plans.waves import (
        cluster_documents_on_id,
        fetch_documents_join,
    )

    nparts = spark.sparkContext.defaultParallelism
    docs = spark.range(50_000).select(
        F.concat(F.lit("http://s.test/p-"), F.col("id")).alias("doc_id"),
        F.array().cast(
            "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
        ).alias("spans"),
    )
    batch = spark.range(20_000).select(
        F.concat(F.lit("http://s.test/p-"), F.col("id")).alias("url")
    )
    # a corpus-sized docs table is never broadcastable — emulate by
    # disabling auto-broadcast so the pin captures the shuffle shape
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        clustered = cluster_documents_on_id(spark, docs)
        joined = fetch_documents_join(
            batch, clustered, nparts=nparts, fetched=2_000_000,
            parallelism=nparts,
        )
        assert n_exchanges(joined) == 1, (
            joined._jdf.queryExecution().toString()
        )
        # the pre-sorted layout also elides the docs-side merge sort:
        # only the batch side sorts (storage-partitioned-join shape)
        import re as _re

        jplan = joined._jdf.queryExecution().executedPlan().toString()
        assert len(_re.findall(r"\bSort\b", jplan)) == 1, jplan
        plain = fetch_documents_join(
            batch, docs.localCheckpoint(), nparts=nparts, fetched=2_000_000,
            parallelism=nparts,
        )
        assert n_exchanges(plain) == 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
