"""Redirect-chain resolution: values on hand chains/cycles and the
broadcast plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from kryptone_spark.operators import redirects as R
from tests.test_plans import plan_of


def _fixture(spark):
    urls = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("x",), ("z",)], ["url"]
    )
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("y", "x")],
        ["src_url", "dst_url"],
    )
    return urls, edges


def test_resolve_redirects_chains_and_cycles(spark):
    urls, edges = _fixture(spark)
    got = {r.url: r for r in R.resolve_redirects(urls, edges).collect()}
    assert (got["a"].final_url, got["a"].n_hops, got["a"].is_terminal) == ("c", 2, True)
    assert (got["b"].final_url, got["b"].n_hops, got["b"].is_terminal) == ("c", 1, True)
    assert (got["c"].final_url, got["c"].n_hops, got["c"].is_terminal) == ("c", 0, True)
    assert (got["z"].final_url, got["z"].n_hops, got["z"].is_terminal) == ("z", 0, True)
    # cycle x<->y: walks the hop cap, lands wherever parity says,
    # reported unresolved — never an infinite loop
    assert got["x"].n_hops == 8 and not got["x"].is_terminal
    assert got["x"].final_url in ("x", "y")


def test_resolve_redirects_broadcast_no_big_side_shuffle(spark):
    urls, edges = _fixture(spark)
    plan = plan_of(R.resolve_redirects(urls, F.broadcast(edges)))
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan


def test_duplicate_edge_observations_do_not_multiply(spark):
    """The same redirect observed by several fetches must not fork the
    pointer-chase: t^h row blowup guard."""
    from kryptone_spark.operators.redirects import resolve_redirects

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("a", "b"), ("b", "c"), ("b", "c")],
        "src_url string, dst_url string",
    )
    df = spark.createDataFrame([("a",), ("x",)], "url string")
    rows = resolve_redirects(df, edges, max_hops=4).collect()
    assert len(rows) == 2
    got = {r["url"]: (r["final_url"], r["n_hops"], r["is_terminal"]) for r in rows}
    assert got["a"] == ("c", 2, True)
    assert got["x"] == ("x", 0, True)
