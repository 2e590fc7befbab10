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
    spark: SparkSession, results_dir: str, late_threshold: str = "30 seconds"
) -> DataFrame:
    return (
        spark.readStream.schema(FETCH_RESULT)
        .option("maxFilesPerTrigger", 16)
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
