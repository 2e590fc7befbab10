"""SparkSession helpers tuned for the crawl workload.

Local testing runs on ``local[N]``; the same configs apply unchanged on
a real cluster via ``spark-submit --py-files`` (see bench/README).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kryptone-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    master: str | None = "local",
) -> SparkSession:
    """``master="local"`` (default) pins local[cores] for tests and
    benches. Pass ``master=None`` under spark-submit: a master set HERE
    would silently override ``--master`` and run the "cluster" job on
    local[N] — the cluster entry point (package.py) does exactly that."""
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    builder = SparkSession.builder
    if master is not None:
        builder = builder.master(f"local[{cores}]" if master == "local" else master)
    return (
        builder.appName(app_name)
        # AQE: runtime coalescing of the small post-shuffle partitions a
        # wave produces, plus skew-join splitting for hot domains.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for every pandas UDF extension point.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
