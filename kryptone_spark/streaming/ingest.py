"""Structured-Streaming ingest of externally-produced fetch results.

The crawl loop itself is iterative batch (the wave-k→wave-k+1 frontier
feedback cannot be one streaming query — SURVEY.md §2.9); what CAN
stream is the fetch side: external fetchers drop result files
(url, fetch_ts, status, spans) and the engine folds them into state
incrementally. This module is that extension point:

- ``fetch_results_stream`` — readStream over a result directory with
  the fixed schema + watermark on fetch_ts for late arrivals.
- ``windowed_fetch_stats`` — event-time windowed per-domain counts
  (politeness monitoring).
- ``run_visited_merge`` — foreachBatch merge of streamed results into
  the visited table (idempotent per batch id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kryptone_spark.functions import urls as U
from kryptone_spark.plans.lineage_cut import checkpoint_cut
from kryptone_spark.plans.tableio import TableIO

FETCH_RESULT = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("fetch_ts", T.TimestampType(), False),
        T.StructField("status", T.IntegerType(), False),
        T.StructField("n_links", T.IntegerType(), True),
    ]
)


def fetch_results_stream(
    spark: SparkSession,
    results_dir: str,
    late_threshold: str = "30 seconds",
    max_files_per_trigger: int = 16,
) -> DataFrame:
    return (
        spark.readStream.schema(FETCH_RESULT)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(results_dir)
        .withWatermark("fetch_ts", late_threshold)
    )


def windowed_fetch_stats(stream: DataFrame, window: str = "1 minute") -> DataFrame:
    """Event-time windowed per-domain fetch counts — the politeness
    monitor (late rows beyond the watermark are dropped by design)."""
    return (
        stream.withColumn("domain", U.host(F.col("url")))
        .groupBy(F.window("fetch_ts", window), F.col("domain"))
        .agg(
            F.count("*").alias("n_fetched"),
            F.sum((F.col("status") >= 400).cast("long")).alias("n_errors"),
        )
    )


POLITENESS_AUDIT = T.StructType(
    [
        T.StructField("domain", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("fetch_ts", T.TimestampType(), False),
        T.StructField("gap_s", T.DoubleType(), True),
        T.StructField("violation", T.BooleanType(), False),
    ]
)

_AUDIT_STATE = T.StructType([T.StructField("last_ts", T.DoubleType(), True)])


def politeness_audit_stream(
    stream: DataFrame, crawl_delay: float = 25.0
) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-domain
    politeness enforcement over the live fetch stream.

    The reference enforces politeness by sleeping WAIT_TIME between its
    single domain's page visits (/root/reference/kryptone/base.py:1185-1194);
    batch-side the engine *assigns* fetch_at slots (operators/schedule.py).
    This operator closes the loop on the ingest side: state = the last
    observed fetch timestamp per domain (one double — O(domains) state,
    not O(events)); every arriving fetch emits its gap to the previous
    fetch on that domain and a violation flag when the gap undercuts
    the crawl delay. Arrow-batched pandas per group — no per-row Python.
    """
    import pandas as pd  # noqa: F401 — vectorized path

    def audit(key, pdf_iter, state):
        import pandas as pd

        (domain,) = key
        last = state.get[0] if state.exists else None
        events = pd.concat(list(pdf_iter)).sort_values("fetch_ts")
        ts = events["fetch_ts"].astype("int64") / 1e9
        gaps = ts.diff()  # vectorized; first row vs carried state
        if last is not None and len(ts):
            gaps.iloc[0] = float(ts.iloc[0]) - last
        if len(ts):
            # the watermark does NOT drop late input rows for
            # applyInPandasWithState — a late event must not rewind the
            # per-domain anchor, or every subsequent on-time event
            # measures its gap against the wrong timestamp
            newest = float(ts.iloc[-1])
            state.update((newest if last is None else max(last, newest),))
        # negative gap = late-arriving event (it sorted before the
        # carried anchor); that is an ordering artifact, not a
        # politeness violation — only a genuine small forward gap is
        yield pd.DataFrame(
            {
                "domain": domain,
                "url": events["url"].values,
                "fetch_ts": events["fetch_ts"].values,
                # NaN would survive Arrow as a double NaN — emit a real
                # NULL for "no previous fetch on this domain"
                "gap_s": gaps.astype(object).where(gaps.notna(), None).values,
                "violation": ((gaps >= 0) & (gaps < crawl_delay)).fillna(False).values,
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        stream.withColumn("domain", U.host(F.col("url")))
        .groupBy("domain")
        .applyInPandasWithState(
            audit,
            outputStructType=POLITENESS_AUDIT,
            stateStructType=_AUDIT_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def dedup_results_stream(stream: DataFrame, key: str = "url") -> DataFrame:
    """Streaming exact-dedup — the streaming face of the seen-set (J1).

    ``dropDuplicatesWithinWatermark`` keeps per-key state only until the
    event-time watermark passes the key's first arrival, so state stays
    bounded by (arrival rate x late-threshold) at any corpus size — a
    plain streaming ``dropDuplicates`` would grow its state table
    forever at 10^10 URLs. Re-delivered fetch results and duplicate
    URLs inside the late-arrival horizon collapse to one row;
    cross-horizon dedup is the batch seen anti-join's job
    (operators/seen.py), which this feeds via ``run_visited_merge``.
    The input must already carry a watermark (``fetch_results_stream``
    sets one).
    """
    return stream.dropDuplicatesWithinWatermark([key])


def run_crawl_ingest(
    stream: DataFrame,
    documents: DataFrame,
    config,
    io: TableIO,
    checkpoint_dir: str,
    n_buckets: int = 64,
):
    """Streaming-driven crawl-state maintenance: external fetchers
    stream back (url, fetch_ts, status) results and each micro-batch is
    folded through the SAME admission pipeline the batch wave loop uses
    — visited ∪= successful fetches, links = batch ⋈ documents,
    seen ∪= admit(links, seen, visited_pre) — committed idempotently
    per batch id (``seen_stream`` / ``visited_stream`` delta tables).

    Parity contract (tests/test_sources_sinks_streaming.py): a stream
    delivering the wave loop's own fetch batches in crawl order reaches
    the SAME final seen (url, verdict) and visited sets as the batch
    loop / the Python oracle replay — per-URL admission verdicts are
    order-deterministic, and the home-rule anchor (first SUCCESSFUL
    fetch = the lexicographically-first ok URL of the first non-empty
    batch) matches the wave loop's because results arrive in crawl
    order. Failed fetches (status ≥ 400) consume no visited row and
    contribute no links, exactly like the wave loop's failure channel;
    re-delivered results collapse via the same anti-joins that make
    P12 a set union.
    """
    from kryptone_spark.operators import admission

    state: dict = {"seen": None, "visited": None, "any_fetched": False}

    def _seed() -> None:
        spark = documents.sparkSession
        seeds = list(dict.fromkeys(config.start_urls))
        df = spark.createDataFrame([(u,) for u in seeds], "url string")
        admitted = admission.admit(df, config, allow_home=True)
        rows = admitted.select(
            "url", "domain_bucket",
            F.lit(0).alias("first_wave"), F.col("verdict"),
        ).localCheckpoint(eager=True)
        state["seen"] = rows
        io.write_wave("seen_stream", rows, 0)

    def _bootstrap() -> None:
        """Seed on first start; REHYDRATE on restart. A restarted query
        resumes from the streaming checkpoint's next batch id, so the
        in-memory seen/visited must reload to the exact committed point
        — re-seeding from scratch would compute every post-restart
        verdict against state missing all prior batches (URLs admitted
        twice, seen rows duplicated). ``seen_stream`` is written LAST
        per batch, so its highest committed wave is the batch's commit
        marker; a ``visited_stream`` wave past it is a torn commit and
        is rolled back here (Structured Streaming re-delivers that
        batch id, and the per-wave writes are overwrite-idempotent)."""
        committed = io.committed_waves("seen_stream")
        if not committed:
            _seed()
            return
        io.drop_waves_after("visited_stream", max(committed))
        state["seen"] = (
            io.read("seen_stream").drop("wave").localCheckpoint(eager=True)
        )
        vt = io.read("visited_stream")
        if vt is not None:
            v = vt.drop("wave").localCheckpoint(eager=True)
            state["visited"] = v
            # the home-rule anchor fires only on the first SUCCESSFUL
            # fetch; any committed visited row means that already
            # happened in a pre-restart batch
            state["any_fetched"] = bool(v.limit(1).count())

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        if state["seen"] is None:
            _bootstrap()
        ok = batch_df.where(F.col("status") < 400).select("url").distinct()
        visited = state["visited"]
        if visited is not None:  # re-delivery: visited is a set
            ok = ok.join(visited.select("url"), "url", "left_anti")
        ok = ok.localCheckpoint(eager=True)
        anchor: bool | str = False
        if not state["any_fetched"]:
            first = ok.agg(F.min("url").alias("u")).collect()[0]["u"]
            if first is not None:
                anchor, state["any_fetched"] = first, True
        visited_rows = ok.select(
            "url", U.domain_bucket(U.host(F.col("url")), n_buckets).alias("domain_bucket")
        )
        links = (
            ok.join(documents.withColumnRenamed("doc_id", "url"), "url", "left")
            .select(F.col("url").alias("src_url"), F.explode_outer("spans").alias("s"))
            .where(F.col("s.kind") == "link")
            .select("src_url", F.col("s.media_ref").alias("url"))
        )
        seen = state["seen"]
        admitted = admission.admit(
            links, config, seen=seen.select("url"),
            visited=visited.select("url") if visited is not None else None,
            allow_home=anchor,
        )
        per_url = admitted.groupBy("url", "domain_bucket").agg(
            F.max(F.col("verdict") == "valid").alias("is_valid"),
        )
        seen_rows = per_url.select(
            "url", "domain_bucket",
            F.lit(int(batch_id) + 1).alias("first_wave"),
            F.when(F.col("is_valid"), F.lit("valid"))
            .otherwise(F.lit("rejected")).alias("verdict"),
        ).join(seen.select("url"), "url", "left_anti").localCheckpoint(eager=True)
        visited_rows = visited_rows.localCheckpoint(eager=True)
        state["seen"] = seen.unionByName(seen_rows)
        state["visited"] = (
            visited_rows if visited is None else visited.unionByName(visited_rows)
        )
        # long-running streams accumulate one union segment per batch —
        # the same O(batches) plan-depth growth the wave loop folds away
        # (plans/waves.py:_append_state): every 16 batches, collapse
        # each state union into one right-width checkpointed scan
        state["appends"] = state.get("appends", 0) + 1
        if state["appends"] >= 16:
            state["appends"] = 0
            par = batch_df.sparkSession.sparkContext.defaultParallelism
            for k in ("seen", "visited"):
                if state[k] is not None:
                    state[k] = checkpoint_cut(state[k].coalesce(max(1, par)))
        io.write_wave("visited_stream", visited_rows, int(batch_id) + 1)
        io.write_wave("seen_stream", seen_rows, int(batch_id) + 1)

    return (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_visited_merge(
    stream: DataFrame, io: TableIO, checkpoint_dir: str, n_buckets: int = 64
):
    """foreachBatch merge into the visited table: each micro-batch is an
    idempotent wave-style commit keyed by the batch id (exactly-once on
    top of at-least-once delivery)."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        rows = batch_df.select(
            "url",
            U.domain_bucket(U.host(F.col("url")), n_buckets).alias("domain_bucket"),
        )
        # batch ids are monotonically increasing → reuse the per-wave
        # idempotent commit (re-delivered batches overwrite themselves)
        io.write_wave("visited_stream", rows, int(batch_id))

    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
