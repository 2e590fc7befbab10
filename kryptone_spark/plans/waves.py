"""WaveRunner — the iterative crawl dataflow (SURVEY.md §3.1 engine form).

One wave = one pure DataFrame job:

    pending  = frontier − visited − robots_blocked        (anti-joins)
    batch    = politeness_schedule(pending)               (W1 window)
    docs     = batch ⋈ documents                          (the "browser"
               is a table lookup — fetch results are the synthetic
               interleaved documents; a missing doc behaves like an
               empty 404 body, links = ∅)
    visited ∪= batch                                      (base.py:1121)
    links    = explode(spans)[kind='link']                (S7)
    admitted = admission.admit(links, seen, visited_pre)  (P1-P13)
    frontier ∪= admitted.valid ∧ ¬filtered                (add_urls)
    seen    ∪= admitted                                   (P12)

All state tables are APPEND-ONLY with one parquet partition per wave
(TableIO): a wave commit is idempotent (re-running wave k rewrites only
its own partitions), which is the checkpoint/resume contract — the
reference instead rewrites its whole frontier JSON every iteration
(/root/reference/kryptone/base.py:562-575).

Scale notes (10^10 frontier):
- frontier/visited/seen never touch the driver; `pending` is derived by
  anti-join, co-partitioned on domain_bucket by the table layout.
- the only per-wave shuffles: schedule window (wave slice only), the
  candidate↔seen anti-join (bloom-prefiltered via operators/seen.py
  when `use_bloom=True`), and the batch↔documents join.
- driver holds scalars only (counts, wave offsets) — no collect() of
  URL lists anywhere.
"""

from __future__ import annotations

import datetime
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kryptone_spark.config import CrawlConfig
from kryptone_spark.functions import urls as U
from kryptone_spark.operators import admission, schedule
from kryptone_spark.plans.tableio import TableIO


@dataclass
class WaveSummary:
    wave: int
    fetched: int
    candidates: int
    new_frontier: int
    duration_s: float


@dataclass
class CrawlResult:
    waves: list[WaveSummary] = field(default_factory=list)

    @property
    def total_fetched(self) -> int:
        return sum(w.fetched for w in self.waves)


class WaveRunner:
    def __init__(
        self,
        spark: SparkSession,
        config: CrawlConfig,
        documents: DataFrame,
        io: TableIO,
        robots: DataFrame | None = None,
        use_bloom: bool = False,
    ):
        self.spark = spark
        self.config = config
        self.documents = documents
        self.io = io
        self.robots = robots
        self.use_bloom = use_bloom
        self._offset = 0.0

    # ---- state table helpers -------------------------------------------

    def _seen(self) -> DataFrame | None:
        return self.io.read("seen")

    def _visited(self) -> DataFrame | None:
        return self.io.read("visited")

    def _frontier(self) -> DataFrame | None:
        return self.io.read("frontier")

    def _with_bucket(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "domain_bucket",
            U.domain_bucket(F.col("domain"), self.config.n_domain_buckets),
        )

    # ---- bootstrap ------------------------------------------------------

    def seed(self) -> None:
        """before_start (base.py:1006-1051): admit the seed list with
        the home page allowed (iteration_count == 0)."""
        seeds = list(dict.fromkeys(self.config.start_urls))
        df = self.spark.createDataFrame([(u,) for u in seeds], "url string")
        admitted = admission.admit(df, self.config, allow_home=True)
        seen_rows = admitted.select(
            "url", "domain_bucket",
            F.lit(0).alias("first_wave"),
            F.col("verdict"),
        )
        self.io.write_wave("seen", seen_rows, 0)
        frontier_rows = (
            admitted.where((F.col("verdict") == "valid") & ~F.col("filtered"))
            .select(
                "url", "domain", "domain_bucket",
                F.lit(0).alias("depth"),
                F.lit(0).alias("discovered_wave"),
                F.lit(0.0).alias("priority"),
            )
        )
        self.io.write_wave("frontier", frontier_rows, 0)

    # ---- one wave -------------------------------------------------------

    def run_wave(self, wave: int) -> WaveSummary | None:
        frontier = self._frontier()
        if frontier is None:
            return None
        visited = self._visited()
        blocked = self.io.read("robots_blocked")

        pending = frontier
        if visited is not None:
            pending = pending.join(visited.select("url"), "url", "left_anti")
        if blocked is not None:
            pending = pending.join(blocked.select("url"), "url", "left_anti")

        batch, new_blocked = schedule.politeness_schedule(
            pending, self.config, wave, robots=self.robots,
            wave_start_offset=self._offset,
        )
        batch = batch.cache()
        fetched = batch.count()
        if fetched == 0:
            nb = new_blocked.count()
            if nb > 0:
                self.io.write_wave("robots_blocked", new_blocked, wave)
            batch.unpersist()
            return None

        self.io.write_wave(
            "fetch_batches",
            batch.select(
                "wave", "domain", "url", "rank_in_domain", "rank_in_wave",
                "fetch_at", "crawl_delay", "domain_bucket",
            ),
            wave,
        )
        if self.robots is not None:
            self.io.write_wave("robots_blocked", new_blocked, wave)

        # mark the whole batch visited (reference marks page-at-a-time,
        # base.py:1121; batch pages are all in `seen` already, so links
        # to them reject on 'seen' either way — reason parity holds
        # because admission below joins the PRE-wave visited table).
        self.io.write_wave(
            "visited",
            batch.select("url", "domain_bucket", F.col("wave")),
            wave,
        )

        # fetch = join against the interleaved documents table (S7)
        docs = batch.select("url").join(
            self.documents.withColumnRenamed("doc_id", "url"), "url", "left"
        )
        links = (
            docs.select(F.col("url").alias("src_url"), F.explode_outer("spans").alias("s"))
            .where(F.col("s.kind") == "link")
            .select("src_url", F.col("s.media_ref").alias("url"))
        )

        # home page admissible only from the first-ever processed page
        # (iteration_count semantics, base.py:706-717)
        allow_home: bool | str = False
        if wave == 0:
            first = batch.orderBy("rank_in_wave").select("url").first()
            allow_home = first["url"] if first else False

        seen = self._seen()
        seen_urls = seen.select("url") if seen is not None else None
        if self.use_bloom and seen_urls is not None:
            from kryptone_spark.operators.seen import bloom_prefilter
            admitted = bloom_prefilter(
                links, seen_urls, self.config, visited=visited,
                allow_home=allow_home,
            )
        else:
            admitted = admission.admit(
                links, self.config, seen=seen_urls,
                visited=visited.select("url") if visited is not None else None,
                allow_home=allow_home,
            )
        admitted = admitted.cache()
        candidates = admitted.count()

        # per-URL aggregation: any-valid wins (matches the oracle's
        # sorted per-page processing — see plans/waves.py design note)
        per_url = admitted.groupBy("url", "domain", "domain_bucket").agg(
            F.max(F.col("verdict") == "valid").alias("is_valid"),
            F.max(F.col("filtered")).alias("filtered"),
        )

        seen_rows = per_url.select(
            "url", "domain_bucket",
            F.lit(wave + 1).alias("first_wave"),
            F.when(F.col("is_valid"), F.lit("valid")).otherwise(F.lit("rejected")).alias("verdict"),
        )
        self.io.write_wave("seen", seen_rows, wave + 1)

        new_frontier = per_url.where(F.col("is_valid") & ~F.col("filtered")).select(
            "url", "domain", "domain_bucket",
            F.lit(wave + 1).alias("depth"),
            F.lit(wave + 1).alias("discovered_wave"),
            F.lit(0.0).alias("priority"),
        )
        self.io.write_wave("frontier", new_frontier, wave + 1)
        out_count = new_frontier.count()

        # edges (A3 url_distribution) + lineage (per-bucket audit)
        edges = admitted.select(
            F.col("src_url"), F.col("url").alias("dst_url"), F.lit(wave).alias("wave"),
            "domain_bucket",
        )
        self.io.write_wave("edges", edges, wave)
        lineage = (
            admitted.groupBy("domain_bucket")
            .agg(
                F.count("*").alias("urls_in"),
                F.sum(
                    ((F.col("verdict") == "valid") & ~F.col("filtered")).cast("long")
                ).alias("urls_out"),
            )
            .select(
                F.lit(wave).alias("wave_id"),
                F.col("domain_bucket").alias("partition_id"),
                "urls_in", "urls_out",
                F.current_timestamp().alias("ts"),
            )
        )
        self.io.write_wave("lineage", lineage, wave)

        dur = schedule.wave_duration(batch)
        self._offset += dur
        batch.unpersist()
        admitted.unpersist()
        return WaveSummary(wave, fetched, candidates, out_count, dur)

    # ---- full crawl -----------------------------------------------------

    def run(self, max_waves: int | None = None, start_wave: int = 0) -> CrawlResult:
        if start_wave == 0:
            self.seed()
        result = CrawlResult()
        wave = start_wave
        limit = max_waves if max_waves is not None else self.config.max_waves
        while wave < limit:
            summary = self.run_wave(wave)
            if summary is None:
                break
            result.waves.append(summary)
            wave += 1
        return result

    # ---- resume ---------------------------------------------------------

    def resume(self, max_waves: int | None = None) -> CrawlResult:
        """Restart from the last fully-committed wave: lineage rows mark
        completed waves; partial writes of wave k+1 are rolled back and
        wave k+1 recomputes from its committed inputs (idempotent)."""
        done = self.io.committed_waves("lineage")
        next_wave = (done[-1] + 1) if done else 0
        for t in ("seen", "frontier"):
            self.io.drop_waves_after(t, next_wave)
        for t in ("visited", "fetch_batches", "edges", "lineage", "robots_blocked"):
            self.io.drop_waves_after(t, next_wave - 1)
        if next_wave == 0:
            return self.run(max_waves=max_waves)
        # rebuild the virtual clock offset from committed batches
        fb = self.io.read("fetch_batches")
        if fb is not None:
            row = fb.agg(
                F.max(F.unix_timestamp("fetch_at") + F.col("crawl_delay"))
            ).collect()[0][0]
            if row is not None:
                self._offset = max(0.0, row - schedule.EPOCH.timestamp())
        return self.run(max_waves=max_waves, start_wave=next_wave)
