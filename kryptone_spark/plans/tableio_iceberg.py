"""IcebergTableIO — the deploy-mode binding of the TableIO contract.

The north rule stores engine state in Iceberg tables; this sandbox
ships no Iceberg runtime jars (verified SURVEY.md §4.2.6), so
``plans/tableio.py`` implements the contract over partitioned parquet
and THIS module is the 1:1 adapter a real cluster swaps in:

    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<v> \\
      --conf spark.sql.catalog.crawl=org.apache.iceberg.spark.SparkCatalog \\
      --conf spark.sql.catalog.crawl.type=hadoop \\
      --conf spark.sql.catalog.crawl.warehouse=s3://bucket/warehouse ...
    io = IcebergTableIO(spark, catalog="crawl", namespace="crawler")
    WaveRunner(spark, config, docs, io).run()

Contract mapping (each method mirrors tableio.TableIO exactly — the
contract tests run both against the same mock transcript):

- ``write_wave``  → atomic ``overwrite(wave == k)`` via the V2 writer
  (one snapshot commit replaces exactly wave k — the parquet twin's
  rewrite-one-subdirectory, but transactional). First write creates
  the table ``USING iceberg PARTITIONED BY (wave[, domain_bucket])``.
- ``committed_waves`` → the ``<table>.partitions`` metadata table:
  Iceberg commits are atomic, so a wave partition is visible iff its
  write committed — the manifest IS the _SUCCESS marker.
- ``read`` / ``read_wave`` → catalog scans; the wave predicate prunes
  by partition through the manifests.
- ``compact`` → ``rewrite_data_files`` (binpack) — Iceberg's own
  generational small-file fold; ``full=True`` adds
  ``expire_snapshots`` to drop superseded manifests.
- ``drop_waves_after`` → ``DELETE FROM ... WHERE wave > k`` (an atomic
  metadata-only delete on a partition boundary).
- ``folded_waves`` → always empty: Iceberg has no dir-vs-snapshot
  split, every committed row is in the current snapshot.

Unlike the parquet twin there is no crash-window protocol to hand-roll
— every mutation above is a single snapshot-pointer swap.

Membership-table layout at deploy time: declare the seen/visited
tables ``PARTITIONED BY (bucket(64, url))`` and read them under
``spark.sql.sources.v2.bucketing.enabled`` — the storage-partitioned
join then drops the state-side Exchange under the per-wave exact
anti-join, exactly the property ``plans/bucketed.py`` implements (and
tools/soak_seen.py measures: 13.5x at 4x10^8 keys) over parquet
bucketed tables in-sandbox. On Iceberg the bucket transform composes
with snapshot rollback, so ``drop_waves_after`` keeps working — the
parquet stand-ins can offer one or the other, not both (bucketed.py
docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class IcebergTableIO:
    def __init__(
        self,
        spark: SparkSession,
        catalog: str,
        namespace: str = "crawler",
        prefix: str = "",
    ):
        self.spark = spark
        self.catalog = catalog
        self.namespace = namespace
        self.prefix = prefix
        self.spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {catalog}.{namespace}")

    # -- naming -----------------------------------------------------------
    def _t(self, name: str) -> str:
        return f"{self.catalog}.{self.namespace}.{self.prefix}{name}"

    def _exists(self, name: str) -> bool:
        return self.spark.catalog.tableExists(self._t(name))

    # commit-conflict retry budget: Iceberg uses optimistic concurrency
    # — a concurrent writer (a metrics exporter, a late compaction, a
    # zombie executor from a pre-crash attempt) can win the snapshot
    # CAS and fail this commit with CommitFailedException. The wave
    # commit is safe to retry blindly: overwrite(wave == k) is
    # idempotent (it replaces exactly wave k however many times it
    # runs), which also makes CommitStateUnknownException retryable —
    # if the unknown commit actually landed, the retry just replaces
    # the same rows.
    COMMIT_RETRIES = 3
    _RETRYABLE = ("CommitFailedException", "CommitStateUnknownException")

    def _retryable(self, exc: Exception) -> bool:
        s = f"{type(exc).__name__}: {exc}"
        return any(m in s for m in self._RETRYABLE)

    # -- contract ----------------------------------------------------------
    def write_wave(self, name: str, df: DataFrame, wave: int) -> None:
        """Idempotent per-wave commit: one atomic snapshot replaces
        exactly the rows of wave k (a crashed earlier attempt included
        — there is no partial-partition residue to heal, unlike dynamic
        ``overwritePartitions`` which only replaces the buckets the new
        attempt happens to touch). The commit stamps ``wave`` into the
        snapshot summary (``snapshot-property.wave``), giving the
        snapshot-id ↔ wave mapping ``wave_snapshots`` reads back — the
        Iceberg twin of the parquet binding's per-wave _SUCCESS dirs.
        Optimistic-concurrency conflicts retry up to COMMIT_RETRIES
        (see above); a non-conflict failure propagates immediately."""
        if "wave" in df.columns:
            df = df.drop("wave")
        df = df.withColumn("wave", F.lit(int(wave)).cast("int"))
        t = self._t(name)
        if not self._exists(name):
            parts = [F.col("wave")]
            if "domain_bucket" in df.columns:
                parts.append(F.col("domain_bucket"))
            df.writeTo(t).using("iceberg").option(
                "snapshot-property.wave", str(int(wave))
            ).partitionedBy(*parts).create()
            return
        last: Exception | None = None
        for _ in range(self.COMMIT_RETRIES + 1):
            try:
                df.writeTo(t).option(
                    "snapshot-property.wave", str(int(wave))
                ).overwrite(F.col("wave") == int(wave))
                return
            except Exception as e:  # noqa: BLE001 — classified below
                if not self._retryable(e):
                    raise
                last = e
        raise last

    def read(self, name: str, schema=None) -> DataFrame | None:
        """Current-snapshot scan. ``schema`` is accepted for signature
        parity but ignored — an Iceberg table is self-describing (the
        parquet twin needs it only for empty-dir reads)."""
        if not self._exists(name):
            return None
        return self.spark.table(self._t(name))

    def read_wave(self, name: str, wave: int) -> DataFrame | None:
        df = self.read(name)
        if df is None:
            return None
        return df.where(F.col("wave") == int(wave))

    def committed_waves(self, name: str) -> list[int]:
        """Atomic commits make the partitions metadata table the
        committed set — O(#partitions) metadata rows through the
        driver, the same order as the parquet twin's directory glob."""
        if not self._exists(name):
            return []
        rows = self.spark.sql(
            f"SELECT DISTINCT partition.wave AS wave FROM {self._t(name)}.partitions"
        ).collect()
        return sorted(int(r["wave"]) for r in rows)

    def folded_waves(self, name: str) -> list[int]:
        """No dir-vs-snapshot split in Iceberg: every committed row is
        in the current snapshot, nothing is ever 'folded but live'."""
        return []

    def compact(self, name: str, full: bool = False) -> int:
        """Small-file fold via Iceberg's own maintenance procedures.
        Returns 0: rewrite_data_files reshapes files, it never changes
        which waves are committed (the parquet twin's return counts
        folded wave DIRS, a concept Iceberg doesn't have)."""
        if not self._exists(name):
            return 0
        tbl = f"{self.namespace}.{self.prefix}{name}"
        self.spark.sql(
            f"CALL {self.catalog}.system.rewrite_data_files"
            f"(table => '{tbl}', strategy => 'binpack')"
        )
        if full:
            self.spark.sql(
                f"CALL {self.catalog}.system.expire_snapshots"
                f"(table => '{tbl}', retain_last => 1)"
            )
        return 0

    def wave_snapshots(self, name: str) -> list[tuple[int, int]]:
        """(wave, snapshot_id) pairs in commit order — the snapshot-id ↔
        wave mapping from the summary property ``write_wave`` stamps.
        One wave can map to several snapshots (conflict retries, resume
        re-runs): the LAST snapshot for a wave is its committed state.
        Maintenance commits (compaction, expire) carry no wave property
        and are excluded."""
        if not self._exists(name):
            return []
        rows = self.spark.sql(
            f"SELECT snapshot_id, summary['wave'] AS wave "
            f"FROM {self._t(name)}.snapshots "
            f"WHERE summary['wave'] IS NOT NULL ORDER BY committed_at"
        ).collect()
        return [(int(r["wave"]), int(r["snapshot_id"])) for r in rows]

    def drop_waves_after(self, name: str, wave: int, via: str = "delete") -> None:
        """Rollback. ``via='delete'`` (default): an atomic,
        partition-boundary DELETE (metadata-only in Iceberg — manifests
        drop whole wave partitions); always correct, leaves history
        intact for time travel. ``via='rollback'``: rewind the table
        pointer to the LAST snapshot whose stamped wave ≤ ``wave``
        (``rollback_to_snapshot`` — O(1) pointer swap, and the dropped
        waves' data files are reclaimed by the next expire). Rollback
        is only sound when every later snapshot is a to-be-dropped wave
        write — the crash-resume case; if ANY snapshot is not
        wave-stamped (e.g. a compaction — which, if it ran after the
        target wave, rewinding would undo too), the method
        conservatively falls back to DELETE."""
        if not self._exists(name):
            return
        if via == "rollback":
            snaps = self.wave_snapshots(name)
            keep = [sid for w, sid in snaps if w <= wave]
            dropped_ids = {sid for w, sid in snaps if w > wave}
            all_ids = {
                int(r["snapshot_id"])
                for r in self.spark.sql(
                    f"SELECT snapshot_id FROM {self._t(name)}.snapshots"
                ).collect()
            }
            unstamped = all_ids - {sid for _, sid in snaps}
            if keep and not unstamped:
                tbl = f"{self.namespace}.{self.prefix}{name}"
                self.spark.sql(
                    f"CALL {self.catalog}.system.rollback_to_snapshot"
                    f"(table => '{tbl}', snapshot_id => {keep[-1]})"
                )
                return
            if not keep and dropped_ids:
                # nothing to keep: fall through to DELETE (a table
                # cannot roll back to 'before its first snapshot')
                pass
        self.spark.sql(f"DELETE FROM {self._t(name)} WHERE wave > {int(wave)}")
