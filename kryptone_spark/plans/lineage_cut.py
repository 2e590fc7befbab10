"""Stats-safe ``localCheckpoint`` for iterative DataFrame loops.

Spark 4's ``Dataset.checkpoint`` copies the origin plan's statistics
onto the returned ``LogicalRDD`` (``LogicalRDD.fromDataset`` →
``rewriteStatsAndConstraints``, sql/classic/Dataset.scala). That is the
right call for one-shot checkpoints — the estimate stays informative —
but it is quadratic poison for iterative dataflows: join size
estimation MULTIPLIES the children's ``sizeInBytes`` BigInts
(``SizeInBytesOnlyStatsPlanVisitor.visitJoin`` → ``default``), so a
loop whose wave k+1 plan joins wave k checkpoints has estimate DIGITS
that grow ~3x per wave. By wave ~40 the driver spends whole minutes
inside ``BigInteger.multiplyToomCook3`` computing million-digit size
products *at plan time* (measured: a 120-wave chain crawl never
finished; jstack showed 864+ s of CPU in BigInteger under
``LogicalRDD$.rewriteStatsAndConstraints``).

``checkpoint_cut`` is ``localCheckpoint`` + a rebuild of the resulting
``LogicalRDD`` with ``originStats = None`` / ``originConstraints =
None`` (the node's pre-Spark-3.4 behavior): the estimate falls back to
``spark.sql.defaultSizeInBytes`` — a CONSTANT — so per-wave products
stay a few hundred bits forever. Runtime join strategy is unaffected
where it matters: AQE re-plans from ACTUAL shuffle sizes, and the
engine's dimension joins use explicit ``F.broadcast`` hints. The one
cost is that Catalyst will not *statically* auto-broadcast a small
checkpointed frame (exactly the pre-3.4 status quo).

There is no public switch for this (checked Spark 4.1.2 bytecode: the
rewrite in ``Dataset.checkpoint`` is unconditional), hence the py4j
surgery. It is defensive: any JVM-shape surprise falls back to the
plain checkpointed frame — correctness never depends on the strip, only
deep-crawl planning time does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LOGICAL_RDD = "org.apache.spark.sql.execution.LogicalRDD"


def checkpoint_cut(df: DataFrame, eager: bool = False) -> DataFrame:
    """``df.localCheckpoint(eager)`` with inherited plan statistics
    stripped from the checkpoint node (see module docstring)."""
    cp = df.localCheckpoint(eager=eager)
    try:
        jdf = cp._jdf  # classic-mode only; Connect has no _jdf
        lp = jdf.queryExecution().logical()
        if lp.getClass().getName() != _LOGICAL_RDD:
            return cp
        spark = cp.sparkSession
        jvm = spark._jvm
        none = getattr(getattr(jvm.scala, "None$"), "MODULE$")
        jspark = spark._jsparkSession
        # case-class copy: (output, rdd, outputPartitioning,
        # outputOrdering, isStreaming, stream)(session, originStats,
        # originConstraints) — curried lists flatten to one 9-arg method
        stripped = lp.copy(
            lp.output(), lp.rdd(), lp.outputPartitioning(),
            lp.outputOrdering(), lp.isStreaming(), lp.stream(),
            jspark, none, none,
        )
        new_jdf = jvm.org.apache.spark.sql.classic.Dataset.ofRows(
            jspark, stripped
        )
        return DataFrame(new_jdf, spark)
    except Exception:  # pragma: no cover - JVM-shape drift fallback
        return cp


def plan_stats_digits(df: DataFrame) -> int:
    """Decimal digits of the plan's estimated sizeInBytes — the
    regression probe for stats compounding (tests assert this stays
    bounded across waves)."""
    return len(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
