"""IcebergTableIO contract tests — mock-driven (the sandbox ships no
Iceberg jars, SURVEY.md §4.2.6), pinning the SQL/DDL the adapter emits
and its signature parity with the parquet TableIO so WaveRunner can
swap either in unchanged."""

from __future__ import annotations

import inspect

import pytest

from kryptone_spark.plans.tableio import TableIO
from kryptone_spark.plans.tableio_iceberg import IcebergTableIO


@pytest.fixture(autouse=True)
def _jvm(spark):
    """The adapter builds pyspark Column expressions (F.col/F.lit),
    which need an active SparkContext even though these tests never
    execute a plan — the fakes only record the operation transcript."""
    yield


# -- minimal fakes capturing the operation transcript ---------------------

class FakeCommitFailedException(Exception):
    """Stands in for org.apache.iceberg.exceptions.CommitFailedException
    — the adapter classifies by exception TYPE NAME / message substring
    (no Iceberg classes importable in this sandbox), so the fake's class
    name is the contract."""


class FakeWriterV2:
    def __init__(self, log, table, fail_plan=None):
        self.log, self.table = log, table
        self._fail_plan = fail_plan  # mutable list shared across writers

    def using(self, fmt):
        self.log.append(("using", self.table, fmt))
        return self

    def option(self, k, v):
        self.log.append(("option", self.table, k, v))
        return self

    def partitionedBy(self, *cols):
        self.log.append(("partitionedBy", self.table, [str(c) for c in cols]))
        return self

    def create(self):
        self.log.append(("create", self.table))

    def overwrite(self, cond):
        if self._fail_plan:
            exc = self._fail_plan.pop(0)
            if exc is not None:
                self.log.append(("overwrite-failed", self.table))
                raise exc
        self.log.append(("overwrite", self.table, str(cond)))


class FakeDF:
    def __init__(self, log, columns, fail_plan=None):
        self.log, self.columns = log, list(columns)
        self._fail_plan = fail_plan

    def drop(self, *cols):
        return FakeDF(self.log, [c for c in self.columns if c not in cols],
                      self._fail_plan)

    def withColumn(self, name, col):
        return FakeDF(self.log, self.columns + [name], self._fail_plan)

    def writeTo(self, table):
        return FakeWriterV2(self.log, table, self._fail_plan)

    def where(self, cond):
        self.log.append(("where", str(cond)))
        return self


class FakeResult:
    def __init__(self, rows):
        self._rows = rows

    def collect(self):
        return self._rows


class FakeCatalog:
    def __init__(self, existing):
        self.existing = existing

    def tableExists(self, t):
        return t in self.existing


class FakeSpark:
    def __init__(self, existing=(), partition_rows=(), stamped_snapshots=(),
                 unstamped_ids=()):
        self.log: list = []
        self.catalog = FakeCatalog(set(existing))
        self._partition_rows = list(partition_rows)
        # (wave, snapshot_id) in commit order, as the summary query sees
        self._stamped = list(stamped_snapshots)
        self._unstamped = list(unstamped_ids)

    def sql(self, q):
        self.log.append(("sql", q))
        if ".snapshots" in q and "summary" in q:
            return FakeResult(
                [{"wave": w, "snapshot_id": s} for w, s in self._stamped]
            )
        if ".snapshots" in q:
            return FakeResult(
                [{"snapshot_id": s} for _, s in self._stamped]
                + [{"snapshot_id": s} for s in self._unstamped]
            )
        return FakeResult(self._partition_rows)

    def table(self, t):
        self.log.append(("table", t))
        return FakeDF(self.log, ["url", "domain_bucket", "wave"])


def test_init_creates_namespace():
    sp = FakeSpark()
    IcebergTableIO(sp, catalog="crawl", namespace="crawler")
    assert ("sql", "CREATE NAMESPACE IF NOT EXISTS crawl.crawler") in sp.log


def test_write_wave_creates_iceberg_table_partitioned():
    sp = FakeSpark()
    io = IcebergTableIO(sp, "crawl", "crawler")
    df = FakeDF(sp.log, ["url", "domain_bucket"])
    io.write_wave("seen", df, 3)
    assert ("using", "crawl.crawler.seen", "iceberg") in sp.log
    parts = [e for e in sp.log if e[0] == "partitionedBy"][0]
    assert "wave" in parts[2][0] and "domain_bucket" in parts[2][1]
    assert ("create", "crawl.crawler.seen") in sp.log


def test_write_wave_existing_table_overwrites_exactly_that_wave():
    sp = FakeSpark(existing={"crawl.crawler.seen"})
    io = IcebergTableIO(sp, "crawl", "crawler")
    df = FakeDF(sp.log, ["url", "wave"])  # stale wave col is re-stamped
    io.write_wave("seen", df, 7)
    ow = [e for e in sp.log if e[0] == "overwrite"]
    assert len(ow) == 1 and ow[0][1] == "crawl.crawler.seen"
    assert "wave" in ow[0][2] and "7" in ow[0][2]
    assert not any(e[0] == "create" for e in sp.log)


def test_committed_waves_reads_partitions_metadata():
    rows = [{"wave": 2}, {"wave": 0}, {"wave": 1}]
    sp = FakeSpark(existing={"crawl.crawler.lineage"}, partition_rows=rows)
    io = IcebergTableIO(sp, "crawl", "crawler")
    assert io.committed_waves("lineage") == [0, 1, 2]
    q = [e[1] for e in sp.log if e[0] == "sql" and "partitions" in e[1]][0]
    assert "crawl.crawler.lineage.partitions" in q
    assert io.committed_waves("missing") == []  # unknown table: no SQL


def test_drop_waves_after_is_partition_boundary_delete():
    sp = FakeSpark(existing={"crawl.crawler.frontier"})
    io = IcebergTableIO(sp, "crawl", "crawler")
    io.drop_waves_after("frontier", 4)
    assert ("sql", "DELETE FROM crawl.crawler.frontier WHERE wave > 4") in sp.log
    io.drop_waves_after("missing", 4)  # no-op, must not raise
    assert not any("missing" in e[1] for e in sp.log if e[0] == "sql")


def test_compact_calls_maintenance_procedures():
    sp = FakeSpark(existing={"crawl.crawler.seen"})
    io = IcebergTableIO(sp, "crawl", "crawler")
    assert io.compact("seen") == 0
    calls = [e[1] for e in sp.log if e[0] == "sql" and e[1].startswith("CALL")]
    assert any("rewrite_data_files" in c and "crawler.seen" in c for c in calls)
    assert not any("expire_snapshots" in c for c in calls)
    io.compact("seen", full=True)
    calls = [e[1] for e in sp.log if e[0] == "sql" and e[1].startswith("CALL")]
    assert any("expire_snapshots" in c for c in calls)
    assert io.compact("missing") == 0


def test_read_and_read_wave():
    sp = FakeSpark(existing={"crawl.crawler.seen"})
    io = IcebergTableIO(sp, "crawl", "crawler")
    assert io.read("missing") is None
    assert io.read_wave("missing", 1) is None
    df = io.read("seen")
    assert df is not None and ("table", "crawl.crawler.seen") in sp.log
    io.read_wave("seen", 2)
    assert any(e[0] == "where" and "wave" in e[1] and "2" in e[1] for e in sp.log)


def test_signature_parity_with_parquet_tableio():
    """WaveRunner must be able to swap either binding in unchanged:
    every contract method exists on both with the same parameter names
    as a PREFIX (Iceberg-only extras like drop_waves_after's ``via``
    must be defaulted so contract-shaped calls still work)."""
    for meth in ("write_wave", "read", "read_wave", "committed_waves",
                 "folded_waves", "compact", "drop_waves_after"):
        a = inspect.signature(getattr(TableIO, meth))
        b = inspect.signature(getattr(IcebergTableIO, meth))
        bp = list(b.parameters)
        assert bp[: len(a.parameters)] == list(a.parameters), meth
        for extra in bp[len(a.parameters):]:
            assert b.parameters[extra].default is not inspect.Parameter.empty, (
                meth, extra,
            )


def test_write_wave_stamps_wave_into_snapshot_summary():
    """Every wave commit (create AND overwrite) must carry the
    snapshot-property.wave stamp — it IS the snapshot-id ↔ wave mapping
    (the Iceberg twin of the parquet binding's per-wave dirs)."""
    sp = FakeSpark()
    io = IcebergTableIO(sp, "crawl", "crawler")
    io.write_wave("seen", FakeDF(sp.log, ["url"]), 3)
    assert ("option", "crawl.crawler.seen", "snapshot-property.wave", "3") in sp.log
    sp2 = FakeSpark(existing={"crawl.crawler.seen"})
    io2 = IcebergTableIO(sp2, "crawl", "crawler")
    io2.write_wave("seen", FakeDF(sp2.log, ["url"]), 7)
    assert ("option", "crawl.crawler.seen", "snapshot-property.wave", "7") in sp2.log


def test_write_wave_retries_commit_conflicts():
    """Optimistic-concurrency conflicts retry (the wave overwrite is
    idempotent, so blind retry is sound — also for commit-state-unknown,
    where the lost commit may have landed); a non-conflict error
    propagates immediately; an exhausted budget re-raises the conflict."""
    sp = FakeSpark(existing={"crawl.crawler.seen"})
    io = IcebergTableIO(sp, "crawl", "crawler")
    # two conflicts then success — within the budget of 3 retries
    plan = [FakeCommitFailedException("snapshot CAS lost"),
            FakeCommitFailedException("snapshot CAS lost"), None]
    io.write_wave("seen", FakeDF(sp.log, ["url"], fail_plan=plan), 5)
    assert [e[0] for e in sp.log if e[0].startswith("overwrite")] == [
        "overwrite-failed", "overwrite-failed", "overwrite",
    ]

    # non-conflict error: no retry
    sp2 = FakeSpark(existing={"crawl.crawler.seen"})
    io2 = IcebergTableIO(sp2, "crawl", "crawler")
    with pytest.raises(ValueError):
        io2.write_wave(
            "seen", FakeDF(sp2.log, ["url"], fail_plan=[ValueError("schema")]), 5
        )
    assert sum(e[0] == "overwrite-failed" for e in sp2.log) == 1

    # budget exhausted: the conflict surfaces
    sp3 = FakeSpark(existing={"crawl.crawler.seen"})
    io3 = IcebergTableIO(sp3, "crawl", "crawler")
    plan3 = [FakeCommitFailedException("busy")] * (io3.COMMIT_RETRIES + 1)
    with pytest.raises(FakeCommitFailedException):
        io3.write_wave("seen", FakeDF(sp3.log, ["url"], fail_plan=plan3), 5)


def test_wave_snapshots_mapping():
    """wave_snapshots returns (wave, snapshot_id) in commit order from
    the stamped summary property; a wave recommitted after a conflict
    retry appears twice and the LAST entry is its committed state;
    unstamped maintenance snapshots are excluded by the query filter."""
    stamped = [(0, 100), (1, 101), (1, 102), (2, 103)]
    sp = FakeSpark(existing={"crawl.crawler.seen"}, stamped_snapshots=stamped)
    io = IcebergTableIO(sp, "crawl", "crawler")
    assert io.wave_snapshots("seen") == stamped
    assert io.wave_snapshots("missing") == []
    q = [e[1] for e in sp.log if e[0] == "sql" and "summary" in e[1]][0]
    assert "summary['wave'] IS NOT NULL" in q and "ORDER BY committed_at" in q


def test_drop_waves_after_rollback_time_travel():
    """via='rollback': rewinds the table pointer to the last snapshot
    whose stamped wave <= target — an O(1) metadata swap instead of a
    DELETE — exactly the crash-resume case where every later snapshot
    is a to-be-dropped wave write."""
    stamped = [(0, 100), (1, 101), (2, 102), (3, 103)]
    sp = FakeSpark(existing={"crawl.crawler.frontier"}, stamped_snapshots=stamped)
    io = IcebergTableIO(sp, "crawl", "crawler")
    io.drop_waves_after("frontier", 1, via="rollback")
    calls = [e[1] for e in sp.log if e[0] == "sql" and "rollback_to_snapshot" in e[1]]
    assert len(calls) == 1
    assert "snapshot_id => 101" in calls[0] and "crawler.frontier" in calls[0]
    assert not any("DELETE FROM" in e[1] for e in sp.log if e[0] == "sql")


def test_drop_waves_after_rollback_falls_back_on_unstamped_snapshots():
    """A compaction (unstamped) snapshot in history makes pointer
    rewind unsound — rewinding past it would undo the rewrite — so the
    adapter conservatively falls back to the partition DELETE. Same
    fallback when nothing remains to roll back TO."""
    stamped = [(0, 100), (1, 101)]
    sp = FakeSpark(
        existing={"crawl.crawler.frontier"},
        stamped_snapshots=stamped,
        unstamped_ids=[999],  # rewrite_data_files commit
    )
    io = IcebergTableIO(sp, "crawl", "crawler")
    io.drop_waves_after("frontier", 0, via="rollback")
    assert not any(
        "rollback_to_snapshot" in e[1] for e in sp.log if e[0] == "sql"
    )
    assert ("sql", "DELETE FROM crawl.crawler.frontier WHERE wave > 0") in sp.log

    # nothing to keep (wave < first commit): DELETE, never a bad rewind
    sp2 = FakeSpark(existing={"crawl.crawler.frontier"}, stamped_snapshots=stamped)
    io2 = IcebergTableIO(sp2, "crawl", "crawler")
    io2.drop_waves_after("frontier", -1, via="rollback")
    assert ("sql", "DELETE FROM crawl.crawler.frontier WHERE wave > -1") in sp2.log


def test_prefix_namespacing():
    sp = FakeSpark(existing={"c.n.exp_seen"})
    io = IcebergTableIO(sp, "c", "n", prefix="exp_")
    io.drop_waves_after("seen", 0)
    assert ("sql", "DELETE FROM c.n.exp_seen WHERE wave > 0") in sp.log
