"""Redirect-chain resolution — URL alias canonicalization.

The reference follows redirects implicitly (Selenium lands on the
final URL) and records only what the browser ends up at; a distributed
crawler sees redirects as DATA — a (src_url, dst_url) edge table from
fetch responses — and must resolve every frontier/seen URL to its
terminal alias, or the same page is fetched once per alias and the
dedup/seen machinery fragments.

``resolve_redirects`` is the classic bounded pointer-chase: ``k``
unrolled left joins against the redirect edge table (chains in real
crawls are short — HTTP clients cap at 5-10 hops — so ``max_hops=8``
covers them; anything longer is a cycle or a trap and is reported
unresolved, never looped on). The driver holds nothing: the loop
unrolls into one lazy plan of ``k`` joins that AQE right-sizes.

Scale notes: the edge table is usually a small fraction of the corpus
(a few % of fetches redirect) — broadcast it when it fits
(``F.broadcast(redirects)`` at the call site) and every hop is a
map-side probe with NO shuffle of the big side; when it doesn't fit,
each hop is one shuffle join on the current alias column and AQE's
skew handling covers hot targets (a redirect sink like '/gone' is the
canonical skew case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(
    df: DataFrame,
    redirects: DataFrame,
    url_col: str = "url",
    max_hops: int = 8,
) -> DataFrame:
    """Adds ``final_url``, ``n_hops``, ``is_terminal``.

    ``redirects`` is (src_url, dst_url). A URL with no redirect entry
    is its own terminal with 0 hops. ``is_terminal`` is False when the
    walk still sits on a redirecting URL after ``max_hops`` (a cycle
    or an over-long chain — the caller quarantines those, it never
    makes sense to fetch them).

    Duplicate (src, dst) observations are deduped here; a src with two
    DIFFERENT dsts (a redirect that changed between fetches) still
    forks the walk — that's contradictory input the caller resolves by
    recency before calling (the edge schema carries no timestamp).
    """
    # distinct FIRST: a crawl log observes the same redirect once per
    # fetch, and duplicate (src,dst) rows would multiply every joined
    # row — a t-times-observed h-hop chain emits t^h copies otherwise
    edges = redirects.select(
        F.col("src_url").alias("__src"), F.col("dst_url").alias("__dst")
    ).distinct()
    out = df.withColumn("final_url", F.col(url_col)).withColumn(
        "n_hops", F.lit(0)
    )
    for _ in range(max_hops):
        out = (
            out.join(edges, out["final_url"] == edges["__src"], "left")
            .withColumn(
                "n_hops",
                F.when(F.col("__dst").isNotNull(), F.col("n_hops") + 1).otherwise(
                    F.col("n_hops")
                ),
            )
            .withColumn("final_url", F.coalesce(F.col("__dst"), F.col("final_url")))
            .drop("__src", "__dst")
        )
    # terminal = the walk settled on a non-redirecting URL
    out = out.join(
        edges.select(F.col("__src")).distinct(),
        out["final_url"] == F.col("__src"),
        "left",
    )
    return out.withColumn("is_terminal", F.col("__src").isNull()).drop("__src")
