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

class FakeWriterV2:
    def __init__(self, log, table):
        self.log, self.table = log, table

    def using(self, fmt):
        self.log.append(("using", self.table, fmt))
        return self

    def partitionedBy(self, *cols):
        self.log.append(("partitionedBy", self.table, [str(c) for c in cols]))
        return self

    def create(self):
        self.log.append(("create", self.table))

    def overwrite(self, cond):
        self.log.append(("overwrite", self.table, str(cond)))


class FakeDF:
    def __init__(self, log, columns):
        self.log, self.columns = log, list(columns)

    def drop(self, *cols):
        return FakeDF(self.log, [c for c in self.columns if c not in cols])

    def withColumn(self, name, col):
        return FakeDF(self.log, self.columns + [name])

    def writeTo(self, table):
        return FakeWriterV2(self.log, table)

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
    def __init__(self, existing=(), partition_rows=()):
        self.log: list = []
        self.catalog = FakeCatalog(set(existing))
        self._partition_rows = list(partition_rows)

    def sql(self, q):
        self.log.append(("sql", q))
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
    every contract method exists on both with the same parameter
    names (self included)."""
    for meth in ("write_wave", "read", "read_wave", "committed_waves",
                 "folded_waves", "compact", "drop_waves_after"):
        a = inspect.signature(getattr(TableIO, meth))
        b = inspect.signature(getattr(IcebergTableIO, meth))
        assert list(a.parameters) == list(b.parameters), meth


def test_prefix_namespacing():
    sp = FakeSpark(existing={"c.n.exp_seen"})
    io = IcebergTableIO(sp, "c", "n", prefix="exp_")
    io.drop_waves_after("seen", 0)
    assert ("sql", "DELETE FROM c.n.exp_seen WHERE wave > 0") in sp.log
