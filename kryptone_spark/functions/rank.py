"""Scale-safe global ordering primitives.

``row_number() OVER (ORDER BY ...)`` with an empty PARTITION BY moves
the entire input to ONE task (Spark warns "No Partition Defined for
Window operation") — a non-starter for wave-sized inputs. The engine
needs a global ordering in three places (the W3 reorder command, the
oracle-parity ``rank_in_wave``, and global top-k exports), so this
module provides the classic two-phase form:

1. range-repartition on the sort keys (sampled boundaries, the same
   mechanism as a distributed ORDER BY),
2. rank *within* each range partition (parallel windows),
3. add per-partition row-count offsets (a tiny driver-side cumulative
   sum over ``num_partitions`` longs).

The result is identical to the single-partition window whenever the
sort keys form a total order (callers must include a unique tiebreaker
— every engine call sites uses ``url``, which is unique per batch).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_by: list[Column],
    out_col: str = "rk",
    num_partitions: int | None = None,
    start: int = 1,
) -> DataFrame:
    """Append ``out_col`` = global row number under ``order_by``.

    ``order_by`` must be a total order (unique tiebreaker included):
    rows that compare equal may land in different range partitions, and
    their relative rank would then depend on boundary sampling.

    The range exchange is materialized once (lazy localCheckpoint) so
    the offset scan and the final rank provably see the same partition
    boundaries — exchange reuse alone is not guaranteed under AQE.
    """
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    if num_partitions == 1:
        # degenerate-but-useful case (ranked_top_k's ≤ k rows): one
        # range partition needs no offsets collect and no checkpoint;
        # __pid is a real column, so the window never degenerates to
        # the warned empty-partition-spec form
        ranged = df.repartitionByRange(1, *order_by).withColumn(
            "__pid", F.spark_partition_id()
        )
        w = Window.partitionBy("__pid").orderBy(*order_by)
        return ranged.withColumn(
            out_col, F.row_number().over(w) + F.lit(start - 1)
        ).drop("__pid")
    ranged = (
        df.repartitionByRange(num_partitions, *order_by)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    sizes = {
        r["__pid"]: r["n"]
        for r in ranged.groupBy("__pid").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = {}, start - 1
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    w_local = Window.partitionBy("__pid").orderBy(*order_by)
    offset_col = F.element_at(
        F.create_map(
            *[x for pid, off in offsets.items() for x in (F.lit(pid), F.lit(off))]
        ),
        F.col("__pid"),
    ) if offsets else F.lit(start - 1)
    return (
        ranged.withColumn(out_col, F.row_number().over(w_local) + offset_col)
        .drop("__pid")
    )


def ranked_top_k(
    df: DataFrame,
    order_by: list[Column],
    k: int,
    out_col: str = "rnk",
) -> DataFrame:
    """Global top-k with a rank column, without a global window.

    ``orderBy().limit(k)`` compiles to TakeOrderedAndProject — a
    per-partition heap + driver merge of k rows, no full sort, no
    single-partition shuffle. The rank then comes from
    ``global_row_number`` over the ≤ k surviving rows (num_partitions=1
    is exact and trivially cheap at that size): its partition spec is a
    real column, so the plan never degenerates to the warned
    "No Partition Defined" global window. (The earlier
    ``partitionBy(lit(1))`` was constant-folded to exactly that empty
    spec — harmless on ≤ k rows but indistinguishable in the plan from
    a genuine global-window violation.)"""
    top = df.orderBy(*order_by).limit(k)
    return global_row_number(top, order_by, out_col=out_col, num_partitions=1)


def global_cumsum(
    df: DataFrame,
    order_by: list[Column],
    value: Column,
    out_col: str = "cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``out_col`` = EXCLUSIVE running sum of ``value`` under the
    global order ``order_by`` — the scale-safe form of
    ``sum() OVER (ORDER BY …)`` (which, unpartitioned, is a
    single-task sort, banned in this repo). Same two-phase shape as
    ``global_row_number``: range exchange on the sort keys, windowed
    sum within each range partition, per-partition totals (O(P) longs
    on the driver) folded into starting offsets. ``order_by`` must be
    a total order (unique tiebreaker included)."""
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.withColumn("__v", value)
        .repartitionByRange(num_partitions, *order_by)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    totals = {
        r["__pid"]: r["s"]
        for r in ranged.groupBy("__pid")
        .agg(F.coalesce(F.sum("__v"), F.lit(0)).alias("s"))
        .collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset_col = (
        F.element_at(
            F.create_map(
                *[x for pid, off in offsets.items() for x in (F.lit(pid), F.lit(off))]
            ),
            F.col("__pid"),
        )
        if offsets
        else F.lit(0)
    )
    return (
        ranged.withColumn(
            out_col, F.coalesce(F.sum("__v").over(w), F.lit(0)) + offset_col
        )
        .drop("__pid", "__v")
    )
