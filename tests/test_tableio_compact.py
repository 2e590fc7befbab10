"""TableIO snapshot compaction (the Iceberg rewrite_data_files
analogue): folding committed wave dirs into one snapshot must be
invisible through the whole read/commit-discovery/rollback contract,
shrink the file count, and survive the crash window."""

from __future__ import annotations


import pytest
from pyspark.sql import functions as F

from kryptone_spark.plans.tableio import TableIO


def _rows(df):
    if df is None:
        return []
    return sorted(tuple(r) for r in df.select(*sorted(df.columns)).collect())


def _mk(spark, tmp_path, waves=4, buckets=3):
    io = TableIO(spark, str(tmp_path))
    for w in range(waves):
        df = spark.range(w * 10, w * 10 + 10).select(
            F.concat(F.lit("u"), F.col("id")).alias("url"),
            (F.col("id") % buckets).cast("int").alias("domain_bucket"),
        )
        io.write_wave("seen", df, w)
    return io


def test_compact_preserves_read_contract(spark, tmp_path):
    io = _mk(spark, tmp_path)
    before = _rows(io.read("seen"))
    before_w2 = _rows(io.read_wave("seen", 2))
    n_files_before = len(list((tmp_path / "seen").rglob("*.parquet")))

    assert io.compact("seen") == 4
    assert io.folded_waves("seen") == [0, 1, 2, 3]
    assert io.committed_waves("seen") == [0, 1, 2, 3]
    assert _rows(io.read("seen")) == before
    assert _rows(io.read_wave("seen", 2)) == before_w2
    n_files_after = len(list((tmp_path / "seen").rglob("*.parquet")))
    assert n_files_after < n_files_before
    # idempotent: nothing new to fold
    assert io.compact("seen") == 0


def test_compact_then_new_waves_union(spark, tmp_path):
    io = _mk(spark, tmp_path, waves=3)
    io.compact("seen")
    df = spark.range(100, 105).select(
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        (F.col("id") % 3).cast("int").alias("domain_bucket"),
    )
    io.write_wave("seen", df, 3)
    assert io.committed_waves("seen") == [0, 1, 2, 3]
    got = _rows(io.read("seen"))
    assert len(got) == 35
    assert _rows(io.read_wave("seen", 3)) == _rows(
        io.read("seen").where(F.col("wave") == 3)
    )
    # second compact is incremental: only the new wave folds (gen=1)
    assert io.compact("seen") == 1
    assert len(_rows(io.read("seen"))) == 35


def test_rollback_into_snapshot(spark, tmp_path):
    io = _mk(spark, tmp_path, waves=4)
    io.compact("seen")
    io.drop_waves_after("seen", 1)
    assert io.folded_waves("seen") == [0, 1]
    assert io.committed_waves("seen") == [0, 1]
    assert len(_rows(io.read("seen"))) == 20
    # rewriting wave 2 is legal again after the rollback
    df = spark.range(200, 203).select(
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        F.lit(0).cast("int").alias("domain_bucket"),
    )
    io.write_wave("seen", df, 2)
    assert io.committed_waves("seen") == [0, 1, 2]
    assert len(_rows(io.read("seen"))) == 23


def test_rewriting_folded_wave_is_refused(spark, tmp_path):
    io = _mk(spark, tmp_path, waves=2)
    io.compact("seen")
    df = spark.range(3).select(
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        F.lit(0).cast("int").alias("domain_bucket"),
    )
    with pytest.raises(ValueError, match="folded"):
        io.write_wave("seen", df, 1)


def test_crash_windows(spark, tmp_path):
    import shutil

    io = _mk(spark, tmp_path, waves=3)
    io.compact("seen")
    before = _rows(io.read("seen"))

    # window 1: generation renamed in, folded wave dirs NOT yet deleted
    # → the manifest excludes them from the live set, no duplicates;
    # the next compact garbage-collects them
    src = tmp_path / "seen" / "compacted" / "gen=0"
    stale = tmp_path / "seen" / "wave=1"
    shutil.copytree(
        tmp_path / "seen" / "compacted", tmp_path / "seen" / "bak_copy"
    )
    stale.mkdir()
    (stale / "_SUCCESS").write_text("")
    assert _rows(io.read("seen")) == before
    io.compact("seen")  # gc pass
    assert not stale.exists()

    # window 2: crashed mid-swap of a generation rewrite (gen=0.bak
    # present, gen=0 missing) → _recover heals on next read
    shutil.rmtree(src)
    (tmp_path / "seen" / "bak_copy" / "gen=0").rename(
        tmp_path / "seen" / "compacted" / "gen=0.bak"
    )
    shutil.rmtree(tmp_path / "seen" / "bak_copy")
    assert _rows(io.read("seen")) == before
    assert io.folded_waves("seen") == [0, 1, 2]


def test_crawl_resumes_after_compaction(spark, tmp_path):
    """Full-stack: crawl, compact every state table, then resume — the
    resumed run must complete identically to an uninterrupted one."""
    from kryptone_spark.config import CrawlConfig
    from kryptone_spark.plans.waves import WaveRunner
    from kryptone_spark.synth import site_df, synth_site

    site = synth_site(n_domains=2, n_products=12, page_size=6, seed=7)
    config = CrawlConfig(start_urls=["http://sitea.test/"])

    io_full = TableIO(spark, str(tmp_path / "full"))
    WaveRunner(spark, config, site_df(spark, site), io_full).run()
    want = _rows(io_full.read("fetch_batches").select("wave", "url"))

    io_part = TableIO(spark, str(tmp_path / "part"))
    WaveRunner(spark, config, site_df(spark, site), io_part).run(max_waves=2)
    for t in ("seen", "frontier", "visited", "fetch_batches", "edges",
              "lineage", "robots_blocked"):
        io_part.compact(t)
    WaveRunner(spark, config, site_df(spark, site), io_part).resume()
    got = _rows(io_part.read("fetch_batches").select("wave", "url"))
    assert got == want


def test_wave_loop_compact_every(spark, tmp_path):
    """Opt-in in-loop compaction: identical crawl output, fewer files."""
    from kryptone_spark.config import CrawlConfig
    from kryptone_spark.plans.waves import WaveRunner
    from kryptone_spark.synth import site_df, synth_site

    site = synth_site(n_domains=2, n_products=12, page_size=6, seed=7)
    config = CrawlConfig(start_urls=["http://sitea.test/"])

    io_plain = TableIO(spark, str(tmp_path / "plain"))
    WaveRunner(spark, config, site_df(spark, site), io_plain).run()
    io_cmp = TableIO(spark, str(tmp_path / "cmp"))
    WaveRunner(
        spark, config, site_df(spark, site), io_cmp, compact_every=2
    ).run()

    want = _rows(io_plain.read("fetch_batches").select("wave", "rank_in_wave", "url"))
    got = _rows(io_cmp.read("fetch_batches").select("wave", "rank_in_wave", "url"))
    assert got == want
    n_plain = len(list((tmp_path / "plain").rglob("*.parquet")))
    n_cmp = len(list((tmp_path / "cmp").rglob("*.parquet")))
    assert n_cmp < n_plain


def test_full_merge_tiers_generations(spark, tmp_path):
    io = _mk(spark, tmp_path, waves=2)
    io.compact("seen")                      # gen=0 (waves 0,1)
    df = spark.range(50, 55).select(
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        (F.col("id") % 3).cast("int").alias("domain_bucket"),
    )
    io.write_wave("seen", df, 2)
    io.compact("seen")                      # gen=1 (wave 2)
    assert len(list((tmp_path / "seen" / "compacted").glob("gen=*"))) == 2
    before = _rows(io.read("seen"))
    io.compact("seen", full=True)           # single merged generation
    gens = list((tmp_path / "seen" / "compacted").glob("gen=*"))
    assert len(gens) == 1
    assert _rows(io.read("seen")) == before
    assert io.folded_waves("seen") == [0, 1, 2]
    assert _rows(io.read_wave("seen", 1)) == _rows(
        io.read("seen").where(F.col("wave") == 1)
    )
