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

import json
import pathlib
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


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
        if wave in self.folded_waves(name):
            # rewriting a folded wave would double its rows in read();
            # rollback through drop_waves_after first
            raise ValueError(
                f"wave {wave} of '{name}' is folded into the compacted "
                f"snapshot; drop_waves_after({wave - 1}) before rewriting"
            )
        if path.exists():
            shutil.rmtree(path)
        if "wave" in df.columns:
            df = df.drop("wave")
        writer = df.write.mode("overwrite")
        if "domain_bucket" in df.columns:
            writer = writer.partitionBy("domain_bucket")
        writer.parquet(str(path))

    # -- snapshot compaction (Iceberg rewrite_data_files analogue) ----
    #
    # A long crawl leaves one directory per (wave, table) with up to
    # n_domain_buckets part files each — the classic data-lake
    # small-files failure: at 10^4 waves the state tables are millions
    # of kilobyte files and every read pays a listing + open per file.
    # ``compact`` folds the contiguous committed prefix of wave dirs
    # into ONE consolidated snapshot (``<name>/compacted/``, wave kept
    # as a DATA column, rows sorted by wave inside each file so wave
    # predicates prune row groups) and then removes the folded dirs.
    # Readers union snapshot + not-yet-folded wave dirs; commit
    # discovery unions the snapshot's _WAVES.json manifest with the
    # _SUCCESS-marked dirs — the resume contract is unchanged.
    #
    # Crash ordering: the new snapshot is fully written (manifest
    # inside) under compacted.tmp, the old snapshot moves to
    # compacted.bak, tmp renames in, bak and folded dirs are removed
    # last. ``_recover`` heals the one window where compacted/ is
    # missing but .bak exists. (Real Iceberg gets this from atomic
    # snapshot pointer swaps; this is the same protocol hand-rolled on
    # a filesystem.)

    def _compacted_dir(self, name: str) -> pathlib.Path:
        return self._dir(name) / "compacted"

    def _recover(self, name: str) -> None:
        comp, bak = self._compacted_dir(name), self._dir(name) / "compacted.bak"
        if bak.exists():
            if comp.exists():
                shutil.rmtree(bak)  # swap completed; stale backup
            else:
                bak.rename(comp)  # crashed between the two renames

    def folded_waves(self, name: str) -> list[int]:
        """Waves whose rows live in the compacted snapshot."""
        self._recover(name)
        m = self._compacted_dir(name) / "_WAVES.json"
        if not m.exists():
            return []
        return sorted(json.loads(m.read_text()))

    def _wave_dirs(self, name: str) -> list[pathlib.Path]:
        folded = set(self.folded_waves(name))
        return [
            p
            for p in sorted(self._dir(name).glob("wave=*"))
            if int(p.name.split("=")[1]) not in folded
        ]

    def read(self, name: str, schema=None) -> DataFrame | None:
        base = self._dir(name)
        parts: list[DataFrame] = []
        comp = self._compacted_dir(name)
        if self.folded_waves(name) and next(comp.rglob("*.parquet"), None) is not None:
            r = self.spark.read.option("basePath", str(comp))
            if schema is not None:
                r = r.schema(schema)
            parts.append(r.parquet(str(comp)))
        # an all-empty wave dir (e.g. no robots-blocked rows yet) has a
        # _SUCCESS marker but no part files — nothing to read from it
        live = [
            p
            for p in self._wave_dirs(name)
            if next(p.rglob("*.parquet"), None) is not None
        ]
        if live:
            r = self.spark.read.option("basePath", str(base))
            if schema is not None:
                r = r.schema(schema)
            parts.append(r.parquet(*[str(p) for p in live]))
        if not parts:
            return None
        if len(parts) == 1:
            return parts[0]
        return parts[0].unionByName(parts[1].select(parts[0].columns))

    def read_wave(self, name: str, wave: int) -> DataFrame | None:
        if wave in self.folded_waves(name):
            comp = self._compacted_dir(name)
            return (
                self.spark.read.option("basePath", str(comp))
                .parquet(str(comp))
                .where(F.col("wave") == wave)
            )
        path = self._dir(name) / f"wave={wave}"
        if not path.exists():
            return None
        return self.spark.read.option("basePath", str(self._dir(name))).parquet(
            str(path)
        )

    def committed_waves(self, name: str) -> list[int]:
        """A wave counts as committed only when its write actually
        finished: the _SUCCESS marker (written by Spark's output
        committer at job commit) must exist — a crash mid-write leaves
        only _temporary content — or when it has been folded into the
        compacted snapshot (only committed waves are ever folded)."""
        live = {
            int(p.name.split("=")[1])
            for p in self._dir(name).glob("wave=*")
            if (p / "_SUCCESS").exists()
        }
        return sorted(live | set(self.folded_waves(name)))

    def compact(self, name: str) -> int:
        """Fold every committed wave dir (plus any prior snapshot) into
        a fresh consolidated snapshot. Returns the number of wave dirs
        folded (0 = nothing to do)."""
        self._recover(name)
        live = [
            p for p in self._wave_dirs(name) if (p / "_SUCCESS").exists()
        ]
        if not live:
            return 0
        df = self.read(name)
        if df is None:
            return 0
        folded = sorted(
            set(self.folded_waves(name))
            | {int(p.name.split("=")[1]) for p in live}
        )
        self._write_snapshot(name, df, folded)
        for p in live:
            shutil.rmtree(p)
        return len(live)

    def _write_snapshot(self, name: str, df: DataFrame, folded: list[int]) -> None:
        comp = self._compacted_dir(name)
        tmp = self._dir(name) / "compacted.tmp"
        bak = self._dir(name) / "compacted.bak"
        if tmp.exists():
            shutil.rmtree(tmp)
        writer = (
            df.withColumn("wave", F.col("wave").cast("int"))
            .sortWithinPartitions("wave")
            .write.mode("overwrite")
        )
        if "domain_bucket" in df.columns:
            writer = writer.partitionBy("domain_bucket")
        writer.parquet(str(tmp))
        (tmp / "_WAVES.json").write_text(json.dumps(folded))
        if comp.exists():
            comp.rename(bak)
        tmp.rename(comp)
        if bak.exists():
            shutil.rmtree(bak)

    def drop_waves_after(self, name: str, wave: int) -> None:
        """Roll back a partially-committed resume point. If the cut
        reaches into the compacted snapshot, the snapshot is rewritten
        filtered to the surviving waves (rare: compaction folds only
        committed waves, and rollback targets the uncommitted tail)."""
        for p in self._dir(name).glob("wave=*"):
            if int(p.name.split("=")[1]) > wave:
                shutil.rmtree(p)
        folded = self.folded_waves(name)
        if folded and folded[-1] > wave:
            keep = [w for w in folded if w <= wave]
            comp = self._compacted_dir(name)
            if not keep:
                shutil.rmtree(comp)
                return
            df = (
                self.spark.read.option("basePath", str(comp))
                .parquet(str(comp))
                .where(F.col("wave") <= wave)
            )
            # materialize before the swap clobbers the source files
            df = df.localCheckpoint(eager=True)
            self._write_snapshot(name, df, keep)
