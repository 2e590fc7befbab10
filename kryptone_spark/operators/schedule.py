"""Politeness scheduling (W1) + robots enforcement (J6) + skew salting (W4).

The reference sleeps ``WAIT_TIME`` (default 25 s) between page visits of
its single domain (/root/reference/kryptone/conf/base.py:28-36, applied
base.py:1185-1194). The engine never sleeps: each wave ranks the pending
frontier per domain and *assigns* ``fetch_at`` timestamps spaced by the
domain's crawl delay — the politeness queue becomes a window function.

Robots enforcement is a new capability (the reference has none — no
robots handling anywhere in its tree): a broadcast join against the
small ``robots(domain, disallow, crawl_delay)`` dim, path-prefix match
against disallow rules, crawl-delay override of the global wait time.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kryptone_spark.config import CrawlConfig
from kryptone_spark.functions import urls as U

EPOCH = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)


def with_robots(pending: DataFrame, robots: DataFrame | None, config: CrawlConfig) -> DataFrame:
    """Adds ``robots_blocked`` + effective ``crawl_delay`` columns.
    Robots is a per-domain dim — small by construction — so this is a
    broadcast hash join: no shuffle of the (huge) pending side."""
    if robots is None:
        return pending.withColumn("robots_blocked", F.lit(False)).withColumn(
            "crawl_delay", F.lit(float(config.wait_time))
        )
    r = robots.select(
        "domain",
        F.col("disallow").alias("__disallow"),
        F.col("crawl_delay").alias("__rdelay"),
    )
    out = pending.join(F.broadcast(r), "domain", "left")
    # robots.txt 'Disallow:' with an EMPTY value means allow-all; and
    # startswith('') is true for every path, so empty rules must be
    # dropped or they'd block the domain's entire URL space
    blocked = F.exists(
        F.coalesce(F.col("__disallow"), F.array().cast("array<string>")),
        lambda d: (d != "") & U.path(F.col("url")).startswith(d),
    )
    return (
        out.withColumn("robots_blocked", F.coalesce(blocked, F.lit(False)))
        .withColumn(
            "crawl_delay", F.coalesce(F.col("__rdelay"), F.lit(float(config.wait_time)))
        )
        .drop("__disallow", "__rdelay")
    )


def politeness_schedule(
    pending: DataFrame,
    config: CrawlConfig,
    wave: int,
    robots: DataFrame | None = None,
    wave_start_offset: float = 0.0,
    global_rank: bool = True,
    salt_buckets: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """Rank pending URLs per domain and take each domain's budget.

    Returns ``(batch, blocked)``:
    - batch: (url, domain, domain_bucket, depth, rank_in_domain,
      rank_in_wave, fetch_at, wave) — ≤ max_per_domain_per_wave rows per
      domain, ordered by (priority, url) — the lexicographic contract.
    - blocked: robots-disallowed rows (removed from the crawl, recorded
      so the frontier anti-join retires them).

    The window partitions by *true* domain. At scale the frontier is
    stored bucketed by ``domain_bucket`` (W4 salting), so this shuffle
    moves only the wave's pending slice, and AQE splits any hot-domain
    partition (skew-join handling is on in session.py).
    """
    pending = with_robots(pending, robots, config)
    blocked = pending.where(F.col("robots_blocked")).drop(
        "robots_blocked", "crawl_delay"
    )
    ok = pending.where(~F.col("robots_blocked"))

    # Two-phase top-k for hot-domain skew (salt_buckets > 0): AQE's
    # skew handling splits joins, not windows, so a domain holding most
    # of the frontier would rank in ONE task. Phase 1 ranks within
    # (domain, salt) partitions and keeps each salt's local budget —
    # the true per-domain top-k is a subset of the union of salted
    # top-ks — so the exact phase-2 window sees ≤ salt_buckets × budget
    # rows per domain instead of the domain's whole pending set.
    budget = config.max_per_domain_per_wave
    # the default budget (1e9 = CrawlConfig's effectively-unbounded
    # sentinel) must skip phase 1: a salted window that filters nothing
    # is a pure extra shuffle
    if salt_buckets > 1 and budget < 1_000_000_000:
        w_salt = Window.partitionBy("domain", "__salt").orderBy("priority", "url")
        ok = (
            ok.withColumn(
                "__salt", F.pmod(F.xxhash64("url"), F.lit(salt_buckets))
            )
            .withColumn("__lrank", F.row_number().over(w_salt))
            .where(F.col("__lrank") <= budget)
            .drop("__salt", "__lrank")
        )

    w_dom = Window.partitionBy("domain").orderBy("priority", "url")
    ranked = ok.withColumn("rank_in_domain", F.row_number().over(w_dom))
    batch = ranked.where(F.col("rank_in_domain") <= config.max_per_domain_per_wave)

    # deterministic virtual schedule: wave_start + (rank-1) * delay
    batch = batch.withColumn(
        "fetch_at",
        F.timestamp_seconds(
            F.lit(EPOCH.timestamp() + wave_start_offset)
            + (F.col("rank_in_domain") - 1) * F.col("crawl_delay")
        ),
    )
    # rank_in_wave: the oracle's global lexicographic processing order —
    # computed as a two-phase range-partitioned rank (functions/rank.py)
    # so no single task ever sorts the whole batch; disable
    # (global_rank=False) when per-domain rank is the only ordering
    # politeness needs.
    if global_rank:
        from kryptone_spark.functions.rank import global_row_number

        batch = global_row_number(
            batch, [F.asc("url")], out_col="rank_in_wave", start=0
        )
    else:
        batch = batch.withColumn("rank_in_wave", F.lit(None).cast("int"))
    batch = batch.withColumn("wave", F.lit(wave)).drop("robots_blocked")
    return batch, blocked


def wave_duration(batch: DataFrame) -> float:
    """Virtual seconds the wave occupies: max over domains of
    budget-spaced fetch ends — feeds the next wave's start offset."""
    row = batch.agg(
        F.max(F.col("rank_in_domain") * F.col("crawl_delay")).alias("d")
    ).collect()[0]
    return float(row["d"] or 0.0)


def parse_robots_txt(
    df: DataFrame,
    domain_col: str = "domain",
    text_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """Columnar robots.txt parser: raw fetched robots bodies →
    (domain, disallow array<string>, crawl_delay double) — the shape
    ``with_robots`` broadcasts. Completes the politeness pipeline end
    to end: fetch robots.txt once per domain, parse it AS DATA, join it
    against every wave.

    Parsing is section-scoped: split the body on 'User-agent:', keep
    the first section whose agent line matches ``agent`` exactly, then
    pull its Disallow values and Crawl-delay. Everything is
    split/filter/transform — deliberately NO regex lookarounds, so a
    SQL oracle (RE2) states the identical computation. One projection,
    no shuffle, no Python: parsing 10^7 robots bodies is a scan.

    Scope (documented subset of the RFC): exact-match agent sections
    (no prefix matching or specificity ranking), Disallow prefix rules
    and Crawl-delay only (no Allow precedence, wildcards, or
    Sitemap) — the subset ``with_robots`` enforces.
    """
    s = F.col(text_col)
    # normalize line endings; sections[0] is the pre-amble before the
    # first User-agent and never matches an agent line
    sections = F.split(F.regexp_replace(s, "\r\n", "\n"), "User-agent:")
    target = F.filter(
        sections,
        lambda sec: F.trim(F.element_at(F.split(sec, "\n"), 1)) == agent,
    )
    # first matching section (RFC: groups may repeat; we take the first)
    body = F.when(F.size(target) > 0, F.element_at(target, 1)).otherwise(F.lit(""))
    lines = F.transform(F.split(body, "\n"), lambda ln: F.trim(ln))
    directive = lambda name: F.transform(
        F.filter(lines, lambda ln: ln.startswith(name + ":")),
        lambda ln: F.trim(F.substring(ln, len(name) + 2, 100000)),
    )
    disallow = F.filter(directive("Disallow"), lambda v: v != "")
    delay_vals = directive("Crawl-delay")
    crawl_delay = F.when(
        F.size(delay_vals) > 0,
        F.element_at(delay_vals, 1).try_cast("double"),
    )
    return df.select(
        F.col(domain_col).alias("domain"),
        disallow.alias("disallow"),
        crawl_delay.alias("crawl_delay"),
    )
