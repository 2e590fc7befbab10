#!/usr/bin/env python
"""Per-phase profile of the bench crawl loop (tools-only, not a gate).

Mirrors bench.bench_crawl_loop's measured crawl (warmup then one timed
run) and prints WaveRunner.phase_seconds — where each wave's wall time
actually goes on the driver's critical path.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import get_spark  # noqa: E402
from kryptone_spark.config import CrawlConfig  # noqa: E402
from kryptone_spark.plans.tableio import TableIO  # noqa: E402
from kryptone_spark.plans.waves import WaveRunner  # noqa: E402
from kryptone_spark.synth import site_df, synth_site  # noqa: E402


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_products = int(os.environ.get("PROFILE_N_PRODUCTS", "500"))
    spark = get_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    config = CrawlConfig(start_urls=["http://sitea.test/"], ignore_images=True)

    warm_docs = site_df(
        spark, synth_site(n_domains=1, n_products=4, page_size=4, seed=7)
    ).localCheckpoint()
    warm_dir = tempfile.mkdtemp(prefix="prof_crawl_warm_")
    WaveRunner(
        spark, config, warm_docs, TableIO(spark, warm_dir),
        collect_stats=False, global_rank=False,
    ).run()
    shutil.rmtree(warm_dir, ignore_errors=True)

    site = synth_site(n_domains=1, n_products=n_products, page_size=n_products, seed=42)
    docs = site_df(spark, site).localCheckpoint()
    crawl_dir = tempfile.mkdtemp(prefix="prof_crawl_")
    try:
        runner = WaveRunner(
            spark, config, docs, TableIO(spark, crawl_dir),
            collect_stats=False, global_rank=False,
        )
        t = time.time()
        result = runner.run()
        dt = time.time() - t
    finally:
        shutil.rmtree(crawl_dir, ignore_errors=True)

    print(f"total {dt:.2f}s  waves={len(result.waves)}  pages={result.total_fetched}")
    for k, v in sorted(runner.phase_seconds.items(), key=lambda kv: -kv[1]):
        print(f"  {k:12s} {v:7.2f}s  ({100 * v / dt:4.1f}%)")
    spark.stop()


if __name__ == "__main__":
    main()
