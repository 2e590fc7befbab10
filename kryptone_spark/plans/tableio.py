"""TableIO — the Iceberg seam (SURVEY.md §4.2.6).

The target deployment stores engine state in Iceberg tables partitioned
by ``(domain_bucket)`` with snapshot-based resume. This sandbox ships no
Iceberg runtime jars, so TableIO implements the same contract over
partitioned Parquet directories:

- ``write_wave(name, df, wave)`` — idempotent per-wave commit: each wave
  writes only its own subdirectory ``<name>/wave=<k>``; re-running a
  wave overwrites exactly that subdirectory (write-once per wave ≙ the
  reference's whole-cache JSON dump, /root/reference/kryptone/base.py:562-575,
  but append-only and partition-pruned instead of O(frontier) rewrites).
- ``read(name)`` — union of all committed waves.
- ``committed_waves(name)`` — resume point discovery.

Swapping in Iceberg is a 1:1 adapter: ``write_wave`` → ``MERGE INTO`` /
append with snapshot ID = wave, ``read`` → time-travel-free scan,
``committed_waves`` → snapshot log.
"""

from __future__ import annotations

import pathlib
import shutil

from pyspark.sql import DataFrame, SparkSession


class TableIO:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = pathlib.Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def _dir(self, name: str) -> pathlib.Path:
        return self.root / name

    def write_wave(self, name: str, df: DataFrame, wave: int) -> None:
        """Idempotent: rewrites only wave=<k>. The wave id is a
        directory partition (dropped from the data, restored on read);
        domain_bucket sub-partitions keep downstream anti-joins prunable
        to the buckets a wave actually touches."""
        path = self._dir(name) / f"wave={wave}"
        if path.exists():
            shutil.rmtree(path)
        if "wave" in df.columns:
            df = df.drop("wave")
        writer = df.write.mode("overwrite")
        if "domain_bucket" in df.columns:
            writer = writer.partitionBy("domain_bucket")
        writer.parquet(str(path))

    def read(self, name: str, schema=None) -> DataFrame | None:
        base = self._dir(name)
        if not sorted(base.glob("wave=*")):
            return None
        # an all-empty table (e.g. no robots-blocked rows yet) has wave
        # dirs but no part files — nothing to read
        if next(base.rglob("*.parquet"), None) is None:
            return None
        reader = self.spark.read.option("basePath", str(base))
        if schema is not None:
            reader = reader.schema(schema)
        return reader.parquet(str(base))

    def read_wave(self, name: str, wave: int) -> DataFrame | None:
        path = self._dir(name) / f"wave={wave}"
        if not path.exists():
            return None
        return self.spark.read.option("basePath", str(self._dir(name))).parquet(
            str(path)
        )

    def committed_waves(self, name: str) -> list[int]:
        """A wave counts as committed only when its write actually
        finished: the _SUCCESS marker (written by Spark's output
        committer at job commit) must exist. A crash mid-write leaves
        the wave directory with only _temporary content — directory
        existence alone would satisfy the 'lineage last = commit
        marker' contract with an uncommitted write."""
        base = self._dir(name)
        return sorted(
            int(p.name.split("=")[1])
            for p in base.glob("wave=*")
            if (p / "_SUCCESS").exists()
        )

    def drop_waves_after(self, name: str, wave: int) -> None:
        """Roll back a partially-committed resume point."""
        for p in self._dir(name).glob("wave=*"):
            if int(p.name.split("=")[1]) > wave:
                shutil.rmtree(p)
