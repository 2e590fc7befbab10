"""Domain-level reputation rollup — the corpus-curation aggregate.

The reference only ever *counts* per domain (``urls_to_visit`` /
``visited_urls`` lengths, base.py:562-575); a training-data pipeline
needs the domain-level *quality* view: per registrable domain (or
source label), how many documents, how duplicated, what average
quality, what language mix. CommonCrawl-derived pipelines (CCNet,
RefinedWeb — public papers) gate whole domains on exactly these
aggregates before any per-document work, because domain-level
filtering prunes terabytes with a kilobyte-sized dim table.

Scale shape — deliberately a two-stage aggregation, NOT a
``countDistinct`` alongside other aggs (which Catalyst plans as an
expand + double-width shuffle):

  stage 1: groupBy (domain, content_fp)  — map-side combine collapses
           exact duplicates inside each scan partition first; the
           shuffle carries one row per distinct (domain, fp).
  stage 2: groupBy domain — input is already tiny (one row per
           distinct document per domain); n_docs/avg recompose from
           stage-1 partial sums, n_distinct is a plain count.

The result is O(#domains) rows — broadcastable back against the full
corpus as a filter dim (``domain_filter``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kryptone_spark.functions import text as TXT


def domain_stats(
    docs: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    lang_col: str | None = "lang",
) -> DataFrame:
    """Per-domain rollup: volume, exact-dup rate, quality, language mix.

    Output: one row per domain with ``n_docs`` (long), ``n_distinct``
    (long), ``dup_rate`` (double, 1 - distinct/total), ``avg_quality``
    (double, mean of the [0,1] composite quality score), ``avg_chars``
    (double), and — when ``lang_col`` is given — ``en_share`` (double).
    Doubles are rounded to 6 dp (stable across summation orders).
    """
    fp = F.md5(TXT.normalize_spaces(F.lower(F.col(text_col))))
    quality = TXT.quality_score(F.col(text_col))
    en = (
        F.when(F.col(lang_col) == "en", 1).otherwise(0)
        if lang_col is not None
        else F.lit(0)
    )
    stage1 = (
        docs.select(
            F.col(domain_col).alias("domain"),
            fp.alias("fp"),
            quality.alias("q"),
            F.length(F.col(text_col)).alias("nc"),
            en.alias("en"),
        )
        .groupBy("domain", "fp")
        .agg(
            F.count("*").alias("n"),
            F.sum("q").alias("sum_q"),
            F.sum("nc").alias("sum_nc"),
            F.sum("en").alias("sum_en"),
        )
    )
    out = stage1.groupBy("domain").agg(
        F.sum("n").alias("n_docs"),
        F.count("*").alias("n_distinct"),
        F.round(
            F.lit(1.0) - F.count("*").cast("double") / F.sum("n").cast("double"), 6
        ).alias("dup_rate"),
        F.round(F.sum("sum_q") / F.sum("n").cast("double"), 6).alias("avg_quality"),
        F.round(F.sum("sum_nc").cast("double") / F.sum("n").cast("double"), 6).alias(
            "avg_chars"
        ),
        F.round(F.sum("sum_en").cast("double") / F.sum("n").cast("double"), 6).alias(
            "en_share"
        ),
    )
    if lang_col is None:
        out = out.drop("en_share")
    return out


def domain_filter(
    docs: DataFrame,
    stats: DataFrame,
    domain_col: str = "source",
    min_quality: float = 0.0,
    max_dup_rate: float = 1.0,
) -> DataFrame:
    """Keeps documents whose domain passes the reputation gates.

    ``stats`` is O(#domains) — explicitly broadcast so the corpus-side
    scan never shuffles; the join is a codegen'd broadcast hash probe.
    """
    keep = stats.where(
        (F.col("avg_quality") >= F.lit(float(min_quality)))
        & (F.col("dup_rate") <= F.lit(float(max_dup_rate)))
    ).select(F.col("domain").alias("__keep_domain"))
    return docs.join(
        F.broadcast(keep), on=F.col(domain_col) == F.col("__keep_domain"), how="inner"
    ).drop("__keep_domain")


def frontier_age_stats(
    frontier: DataFrame,
    visited: DataFrame | None,
    current_wave: int,
    domain_col: str = "domain",
) -> DataFrame:
    """Frontier starvation monitor — the operational view a long crawl
    needs: per domain, how much work is still pending and how STALE the
    oldest pending URL is (a domain whose max_age keeps growing is
    being starved by politeness budgets or quota — the signal to raise
    its budget or shed its tail). The reference can't see this at all:
    its frontier is an unordered in-memory set with no discovery
    metadata.

    Input: the frontier state table (url, domain, discovered_wave) and
    the visited table (url) — pending = frontier − visited, exactly the
    wave loop's anti-join. Output per domain: n_pending, oldest_wave,
    max_age (current_wave - oldest_wave), avg_age (2 dp). One anti-join
    + one partial-agg groupBy; O(#domains) rows out."""
    pending = frontier
    if visited is not None:
        pending = pending.join(visited.select("url"), "url", "left_anti")
    age = F.lit(current_wave) - F.col("discovered_wave")
    return pending.groupBy(domain_col).agg(
        F.count("*").alias("n_pending"),
        F.min("discovered_wave").alias("oldest_wave"),
        F.max(age).alias("max_age"),
        F.round(F.avg(age), 2).alias("avg_age"),
    )
