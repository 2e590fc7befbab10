"""Crawl-snapshot diff — what changed between two crawls.

The reference has no recrawl story at all: a second run of the same
spider starts from the persisted ``cache.json`` seen-set and simply
skips everything it already saw (`/root/reference/kryptone/base.py`
resume path) — it cannot say WHICH pages changed. A production
recrawl pipeline needs exactly that delta: the set of added / removed
/ changed / unchanged URLs between snapshot N-1 and snapshot N drives
re-extraction, downstream dedup invalidation, and the adaptive
revisit scheduler (``operators/schedule.py:recrawl_schedule`` consumes
per-URL change observations — this operator is where they come from).

``crawl_diff`` is one full-outer join on the URL key comparing a
content fingerprint column (any stable hash — ``functions/text.py:
fingerprint64`` or a raw md5 — the operator is fingerprint-agnostic):

- ``added``     — in new only
- ``removed``   — in old only
- ``changed``   — in both, fingerprints differ
- ``unchanged`` — in both, fingerprints equal

Scale notes: one shuffle per side on the key (the join), partial-agg
map-side combine for ``diff_summary``. At 100 TB both snapshots are
stored bucketed by URL (the seen/visited tables already are —
``plans/tableio.py`` partitions on ``domain_bucket``), so the
sort-merge join co-locates without exchanging either side; AQE handles
the residual skew. Nothing is collected; the summary is O(4) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def crawl_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    fp_col: str = "fingerprint",
) -> DataFrame:
    """Full-outer fingerprint compare of two crawl snapshots.

    Input: two DataFrames each carrying ``key_col`` (unique per
    snapshot — pre-aggregate if a snapshot can hold several rows per
    URL) and ``fp_col``. Output: one row per URL present in either
    snapshot — (key, status, old_fp, new_fp), status in
    {added, removed, changed, unchanged}.
    """
    o = old.select(
        F.col(key_col).alias(key_col), F.col(fp_col).alias("old_fp")
    )
    n = new.select(
        F.col(key_col).alias(key_col), F.col(fp_col).alias("new_fp")
    )
    joined = o.join(n, key_col, "full_outer")
    status = (
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") == F.col("new_fp"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(key_col, status.alias("status"), "old_fp", "new_fp")


def diff_summary(diff: DataFrame) -> DataFrame:
    """O(4)-row rollup of a ``crawl_diff`` result: (status, n) —
    the churn-rate signal the revisit scheduler consumes."""
    return diff.groupBy("status").agg(F.count("*").alias("n"))
