"""Corpus-curation operators: deterministic sampling and shard packing.

Engine-only capability (the reference crawls; it never curates a
training corpus) — first-class alongside the dedup/ANN family. Every
operator is reproducible from the data alone: selection is driven by a
portable md5-derived bucket, never ``rand()``, so the same corpus
always yields the same sample on any cluster size, and every operator
has an exact DuckDB oracle.

Scale notes (100 TB): ``hash_sample`` / ``stratified_sample`` are pure
narrow filters — no shuffle, fully pushed into the scan's codegen
span. ``stratified_take`` shuffles once on the stratum key (a
partitioned window, never a global one). ``pack_shards`` needs a
global running sum, which uses the two-phase range exchange from
``functions/rank.py`` (per-partition windows + O(P) driver offsets) —
the single-task ``sum() OVER (ORDER BY …)`` form is banned here.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kryptone_spark.functions.rank import global_cumsum

# 4 hex chars = 16 bits: granularity 1/65536 ≈ 0.0015% — enough for
# sampling rates, small enough that DuckDB's integer build from hex
# digits (strpos arithmetic, no conv()) stays exact.
BUCKETS = 65536


def portable_bucket(key: Column, salt: str = "") -> Column:
    """Deterministic bucket in [0, 65536): the first 4 hex chars of
    md5(key || salt) as an int. Identical in DuckDB via per-digit
    strpos arithmetic, so sampling decisions are engine-portable.
    A salt gives independent draws for repeated sampling of the same
    corpus (different salt ⇒ statistically independent selection)."""
    return F.conv(
        F.substring(F.md5(F.concat(key, F.lit(salt))), 1, 4), 16, 10
    ).cast("int")


def hash_sample(
    df: DataFrame, fraction: float, key_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash — reproducible,
    order-independent, join-stable (the same doc_id is kept in every
    table it appears in, so sampled fact/dim tables stay consistent)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    thresh = int(round(fraction * BUCKETS))
    return df.where(portable_bucket(F.col(key_col), salt) < F.lit(thresh))


def stratified_sample(
    df: DataFrame,
    fractions: Mapping[str, float],
    strata_col: str,
    key_col: str = "doc_id",
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum hash sampling (the deterministic twin of Spark's
    ``sampleBy``): each stratum value gets its own keep-fraction —
    the standard rebalancing move for a training mix (e.g. upweight
    low-resource languages, downsample boilerplate-heavy domains).
    Still a pure narrow filter: the per-stratum threshold folds into
    one CASE expression against the same portable bucket."""
    for s, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for stratum {s!r} must be in [0, 1]")
    thresh: Column = F.lit(int(round(default_fraction * BUCKETS)))
    for s, frac in fractions.items():
        thresh = F.when(
            F.col(strata_col) == F.lit(s), F.lit(int(round(frac * BUCKETS)))
        ).otherwise(thresh)
    return df.where(portable_bucket(F.col(key_col), salt) < thresh)


def stratified_take(
    df: DataFrame,
    n: int,
    strata_col: str,
    key_col: str = "doc_id",
    salt: str = "",
    salt_buckets: int = 0,
) -> DataFrame:
    """EXACTLY ``n`` rows per stratum (fewer if the stratum is smaller),
    chosen by hash order — exact quotas where ``stratified_sample``
    gives expected ones. Hash-then-key ordering makes the quota a
    uniform draw yet fully deterministic.

    A partitioned window still puts EACH STRATUM in one task — with a
    handful of sources over a 100 TB corpus that is tens of TB through
    a single task. ``salt_buckets > 1`` engages the same salted
    two-phase top-k the politeness scheduler uses (operators/
    schedule.py W4): phase 1 ranks within (stratum, salt) — parallel
    within each stratum — and keeps each salt's local n (the true
    per-stratum top-n is a subset of the union of salted top-ns), so
    the exact phase-2 window sees ≤ salt_buckets × n rows per stratum
    instead of the stratum's whole corpus. Identical output
    (test_stratified_take_salted_matches_plain); default off so small
    callers keep the single-shuffle plan."""
    from pyspark.sql import Window

    if n < 0:
        raise ValueError(f"n must be >= 0, got {n}")
    order = [portable_bucket(F.col(key_col), salt), F.col(key_col)]
    out = df
    if salt_buckets > 1:
        out = out.withColumn(
            "__salt", F.pmod(F.xxhash64(F.col(key_col)), F.lit(salt_buckets))
        )
        w1 = Window.partitionBy(strata_col, "__salt").orderBy(*order)
        out = (
            out.withColumn("__rk1", F.row_number().over(w1))
            .where(F.col("__rk1") <= n)
            .drop("__rk1", "__salt")
        )
    w = Window.partitionBy(strata_col).orderBy(*order)
    return (
        out.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= n)
        .drop("__rk")
    )


def temperature_mix(
    df: DataFrame,
    temperature: float,
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Temperature-scaled source rebalancing (the mT5/CC-mix move):
    expected kept counts ∝ n_i^(1/T). Downsample-only — keep_frac_i =
    (n_i^(α-1)) / max_j(n_j^(α-1)) with α = 1/T, so the most-boosted
    source keeps everything and no row is ever duplicated. T=1 is a
    no-op; T→∞ flattens toward a uniform source mix; T<1 sharpens
    toward the head sources.

    Fully in-plan: one groupBy(source) count (O(#sources) rows), a
    1-row max broadcast-crossjoined back, and the same portable md5
    bucket as ``hash_sample`` for the keep decision — deterministic,
    join-stable, engine-portable (the fraction is rounded to 6 dp
    before thresholding so JVM/libm pow ulp noise can't flip a row).
    At 100 TB this is a metadata-sized agg plus a narrow filter; no
    row-level shuffle."""
    if temperature <= 0:
        raise ValueError(f"temperature must be positive, got {temperature}")
    alpha = 1.0 / temperature
    counts = df.groupBy(source_col).agg(
        F.pow(F.count("*").cast("double"), F.lit(alpha - 1.0)).alias("__pw")
    )
    norm = counts.agg(F.max("__pw").alias("__mx"))
    fracs = counts.crossJoin(F.broadcast(norm)).select(
        source_col,
        # explicit floor: Spark's int cast truncates but DuckDB's
        # ::INT rounds — floor() is the portable spelling of both
        F.floor(F.round(F.col("__pw") / F.col("__mx"), 6) * BUCKETS)
        .cast("int")
        .alias("__thresh"),
    )
    # null-safe join: a NULL source is its own stratum (groupBy put it
    # in `fracs`), but an equi-join key would silently drop those rows
    # — breaking the T=1-is-a-no-op contract
    fr = fracs.withColumnRenamed(source_col, "__src")
    return (
        df.join(
            F.broadcast(fr), F.col(source_col).eqNullSafe(F.col("__src"))
        )
        .where(portable_bucket(F.col(key_col), salt) < F.col("__thresh"))
        .drop("__thresh", "__src")
    )


def pack_shards(
    df: DataFrame,
    budget: int | float,
    token_col: str,
    order_col: str = "doc_id",
    out_col: str = "shard_id",
) -> DataFrame:
    """Assign each doc to a training shard by FIXED TOKEN-OFFSET
    binning: shard_id = floor(exclusive running token sum / budget) —
    shard k owns token offsets [k·budget, (k+1)·budget). A doc
    straddling a boundary lands in the shard its first token falls in,
    so that shard runs over by the straddle amount and the NEXT shard
    is short by the same amount (offsets, not per-shard re-fill: a
    greedy accumulate-then-reset rule is a sequential recurrence that
    cannot be expressed as a distributed cumsum). Deterministic on any
    cluster size; docs larger than the budget get their own
    boundary-straddling shard rather than being split.

    Scale: the running sum is the two-phase ``global_cumsum`` — one
    range exchange, per-partition windowed sums, O(P) driver offsets.
    No global window, no driver data path."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    out = global_cumsum(
        df,
        order_by=[F.col(order_col)],
        value=F.col(token_col).cast("long"),
        out_col="__cum",
    )
    return out.withColumn(
        out_col, F.floor(F.col("__cum") / F.lit(budget)).cast("int")
    ).drop("__cum")
