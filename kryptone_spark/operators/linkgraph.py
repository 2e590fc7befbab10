"""Link-graph analytics over the crawl edge table — frontier
prioritization beyond the reference's regex reorder (base.py:757-775).

A BFS frontier treats every pending URL alike; real crawl schedulers
order by link evidence (OPIC / PageRank-family scores) so high-value
pages are fetched first under a politeness budget. The engine computes
PageRank with unrolled power iterations of pure DataFrame joins/aggs —
each iteration is one join on src + one shuffle on dst, exactly the
map-reduce PageRank plan, so 100 TB scaling is the textbook case
(co-partition edges by src, AQE handles hub skew).

Determinism contract: float sums are order-dependent across engines,
so each iteration ROUNDS the rank to ``round_dp`` decimals — both the
engine and the SQL oracle state the identical computation and the
intermediate error (~1e-16 relative) sits far below the rounding
granularity. Unnormalized form: init 1.0, update
``(1-d) + d * Σ rank/outdeg`` — dangling-node mass is not
redistributed (documented; rank ordering, which is what scheduling
consumes, is unaffected for crawl graphs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kryptone_spark.plans.lineage_cut import checkpoint_cut


def pagerank(
    edges: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    iters: int = 3,
    damping: float = 0.85,
    round_dp: int = 9,
) -> DataFrame:
    """(url, rank) for every node of the (src, dst) edge multiset.

    Duplicate edges are collapsed first (a page linking twice confers
    one endorsement — matches the seen-set's URL identity). Nodes with
    no in-links converge to (1 - damping) immediately."""
    # the loop re-reads e/nodes/outdeg every iteration and each ranks_i
    # feeds ranks_{i+1}: without truncation the final plan replays the
    # whole chain (edge dedup included) once per consumer and analysis
    # cost grows with iters — lazy localCheckpoints make every
    # iteration read materialized inputs, the standard iterative-
    # algorithm shape (same pattern as dedup's CC contraction loop)
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .transform(checkpoint_cut)
    )
    nodes = (
        e.select(F.col("src").alias("url"))
        .union(e.select(F.col("dst").alias("url")))
        .distinct()
        .transform(checkpoint_cut)
    )
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    ranks = nodes.withColumn("rank", F.lit(1.0))
    for _ in range(iters):
        contrib = (
            e.join(ranks, e["src"] == ranks["url"])
            .join(outdeg, "src")
            .select(F.col("dst"), (F.col("rank") / F.col("outdeg")).alias("c"))
        )
        inflow = contrib.groupBy("dst").agg(F.sum("c").alias("inflow"))
        ranks = nodes.join(
            inflow, nodes["url"] == inflow["dst"], "left"
        ).select(
            "url",
            F.round(
                F.lit(1.0 - damping)
                + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0)),
                round_dp,
            ).alias("rank"),
        ).transform(checkpoint_cut)
    return ranks


def prioritize_frontier(
    frontier: DataFrame, ranks: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Overwrite the frontier's ``priority`` with -rank so the
    politeness window (orderBy priority, url) fetches high-rank pages
    first; unranked URLs (no in-link evidence yet) sort last among
    their domain at priority 0. One left join — broadcast when ranks
    is a per-seed-site slice, hash otherwise (AQE decides)."""
    r = ranks.select(F.col("url").alias(url_col), F.col("rank"))
    return (
        frontier.drop("priority")
        .join(r, url_col, "left")
        .withColumn("priority", -F.coalesce(F.col("rank"), F.lit(0.0)))
        .drop("rank")
    )


def domain_graph(
    edges: DataFrame, src_col: str = "src_url", dst_col: str = "dst_url"
) -> DataFrame:
    """Host-level rollup of the URL edge table — the graph real crawl
    schedulers actually rank (host centrality à la Common Crawl's
    harmonic-centrality ranking): (src_domain, dst_domain, n_links,
    n_src_pages), intra-domain edges excluded (self-endorsement is
    navigation, not evidence). Feed the result to ``pagerank(...,
    src_col='src_domain', dst_col='dst_domain')`` for host ranks.

    Scale: the rollup is one groupBy over host pairs — domains number
    ~10^7-10^8 where URLs number 10^10, so every downstream graph op
    runs on a table 100-1000× smaller than the URL graph."""
    from kryptone_spark.functions import urls as U

    e = edges.select(
        U.host(F.col(src_col)).alias("src_domain"),
        U.host(F.col(dst_col)).alias("dst_domain"),
        F.col(src_col).alias("__src"),
    ).where(F.col("src_domain") != F.col("dst_domain"))
    return e.groupBy("src_domain", "dst_domain").agg(
        F.count("*").alias("n_links"),
        F.countDistinct("__src").alias("n_src_pages"),
    )
