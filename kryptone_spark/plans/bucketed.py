"""Bucketed membership state — exchange-free exact anti-joins.

The per-wave EXACT membership joins (candidate ⟕̸ seen, pending ⟕̸
visited — plans/waves.py:305,620; admission.py:246-248) are the one
wave cost proportional to |state| rather than |wave|: a sort-merge
anti-join over a plain parquet state table hash-exchanges the ENTIRE
state side under every wave's join, so at the 10^10-URL design point
~10^10 rows cross the shuffle per wave while the batch being admitted
is ~10^6-10^7. The bloom/cuckoo sidecars (operators/seen.py) shrink
the candidate slice that reaches the join; this module removes the
state side's per-wave exchange altogether.

Mechanism: hash-cluster the state table on ``url`` at WRITE time — a
Spark bucketed table (``bucketBy(n, "url").sortBy("url")``). The scan
itself then reports ``HashPartitioning(url, n)``, Catalyst drops the
state side's Exchange under the join (only the candidate batch is
exchanged, to the bucket count), and each wave moves O(|wave|) rows
over the network instead of O(|seen|). Clustering costs one shuffle at
write time and is amortized over every subsequent wave. Per-wave
deltas APPEND cleanly: each append adds one file per bucket and the
bucket-to-task mapping is unchanged (multi-file buckets drop the
sortedness guarantee, so the join re-sorts each state slice per task —
an in-memory sort of |seen|/n rows, never a network exchange; fold the
files periodically exactly like TableIO.compact).

Deployment mapping: on Iceberg this layout is the ``bucket(N, url)``
partition transform read under storage-partitioned joins
(``spark.sql.sources.v2.bucketing.enabled``) — same contract: cluster
the authority table on its join key at write time; never let a wave
re-shuffle it. The sandbox form uses the session catalog + parquet
bucketed tables, which is what local deployments get for free.

Why the sandbox wave loop does NOT switch its state tables to this
layout: TableIO's resume/rollback contract is per-wave directory
partitions (drop_waves_after = rm of wave dirs), and parquet bucketed
tables can only append — a wave could not be rolled back. That is a
limitation of the parquet stand-in only: Iceberg composes the
bucket(N, url) transform WITH snapshot rollback (they're orthogonal
there), so the deploy target gets both; in-sandbox the layout is
exercised and measured standalone (tests/test_bucketed.py,
tools/soak_seen.py).

Reference parity note: the reference holds seen/visited as in-memory
Python sets (/root/reference/kryptone/base.py:292-295), where layout
is meaningless; this is the table-scale re-expression of the same
membership authority. Measured: tools/soak_seen.py compares the plain
vs bucketed anti-join at a 4x10^8-row seen table (SCALING.md).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


def save_membership_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int = 64,
    key: str = "url",
    mode: str = "overwrite",
) -> None:
    """Write a membership/state table hash-clustered on ``key``.
    ``mode="append"`` is the per-wave delta path (one extra file per
    bucket per wave — compact periodically). The table is managed by
    the session catalog under ``spark.sql.warehouse.dir``."""
    (
        df.write.bucketBy(n_buckets, key)
        .sortBy(key)
        .mode(mode)
        .format("parquet")
        .saveAsTable(table)
    )


def register_membership_bucketed(
    spark: SparkSession,
    table: str,
    location: str,
    n_buckets: int = 64,
    key: str = "url",
    schema_ddl: str = "url STRING",
) -> DataFrame:
    """Re-attach an EXISTING bucketed-table directory (e.g. after a
    restart — the default session catalog is in-memory, so the files
    outlive the metadata). The files must have been written by
    ``save_membership_bucketed`` with the same (n_buckets, key), since
    the declared clustering is trusted, not re-verified."""
    spark.sql(
        f"CREATE TABLE {table} ({schema_ddl}) USING parquet "
        f"CLUSTERED BY ({key}) SORTED BY ({key} ASC) INTO {n_buckets} BUCKETS "
        f"LOCATION '{location}'"
    )
    return spark.table(table)


def _formatted_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def n_exchanges(df: DataFrame) -> int:
    """Number of SHUFFLE Exchange operators in the physical plan — the
    plan audit behind the module's claim (tests + tools/soak_seen.py
    assert the bucketed anti-join plans exactly one exchange: the
    candidate side). Counts tree-form nodes (``Exchange (n)``) in the
    final/current plan section only: an executed adaptive plan appends
    an ``== Initial Plan ==`` tree that would double the count, and the
    detail headers live after that marker. ``\\b`` keeps
    BroadcastExchange out of the count — and also ``ReusedExchange``
    nodes: a plan that reuses a shuffle under-counts here. Fine for
    the pinned shapes (none reuse), but callers comparing plans that
    may contain ReusedExchange should count it explicitly."""
    tree = _formatted_plan(df).split("== Initial Plan ==")[0]
    return len(re.findall(r"\bExchange \(\d+\)", tree))


def is_bucketed_scan(df: DataFrame) -> bool:
    """True when some scan in ``df``'s physical plan actually reads
    bucketed (``Bucketed: true`` in the scan details — Spark reports
    ``false (disabled by query planner)`` when the bucketing was
    declared but unused, which this helper correctly rejects)."""
    return "Bucketed: true" in _formatted_plan(df)
