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
