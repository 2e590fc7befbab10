#!/usr/bin/env python
"""Scaling-efficiency evidence: the same job at N and 4N parallelism.

The north rule's two-cluster-size criterion (≥0.8 throughput scaling
efficiency from N to 4N executors) cannot use a real cluster in this
sandbox; per the driver protocol it is evidenced by running the SAME
job on the SAME input at local[8] and local[32] in fresh JVMs and
reporting URLs/sec at both plus efficiency = (T_8 / T_32) / 4.

The measured job is the north-metric pipeline: frontier-pop →
politeness-schedule → fetch-batch + admission + seen anti-join over a
synthetic frontier (default 4M URLs, 1000 domains, 80% hot-domain skew).

Prints one JSON line and appends a markdown row block to SCALING.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import json, os, sys, time
from pyspark.sql import SparkSession, functions as F

cpus = int(sys.argv[1]); n = int(sys.argv[2])
spark = (SparkSession.builder.master(f"local[{cpus}]")
         .appName(f"scaling-{cpus}")
         .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.enabled", "true")
         .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.range(10_000_000).selectExpr("sum(id)").collect()  # JIT warmup

from kryptone_spark.config import CrawlConfig
from kryptone_spark.operators import schedule, admission
from kryptone_spark.synth import synth_frontier_df

config = CrawlConfig(start_urls=["http://site0.test/"], ignore_images=True,
                     max_per_domain_per_wave=5000, wait_time=0.01)
frontier = synth_frontier_df(spark, n, n_domains=1000, hot_domain_share=0.8).localCheckpoint()
links = frontier.select("url")

t = time.time()
# salt_buckets spreads the hot domain's top-k rank across cores (the
# frontier is 80% one domain by construction) — without it the window
# serializes into one task and BOTH cluster sizes bottleneck on it.
batch, _ = schedule.politeness_schedule(
    frontier, config, wave=0, global_rank=False, salt_buckets=cpus
)
n_batch = batch.count()
admitted = admission.admit(links, config, seen=batch.select("url"), allow_home=False)
n_valid = admitted.where("verdict = 'valid'").count()
dt = time.time() - t

print("RESULT " + json.dumps({
    "cpus": cpus, "n_urls": n, "sec": dt,
    "urls_per_sec": (2 * n) / dt,   # frontier pass + admission pass
    "batch": n_batch, "valid": n_valid,
}))
spark.stop()
"""


def run(cpus: int, n: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cpus), str(n)],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.abspath(__file__)),
        timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    sys.stderr.write(out.stdout[-2000:] + out.stderr[-4000:])
    raise RuntimeError(f"worker local[{cpus}] produced no result")


def main() -> None:
    n = int(os.environ.get("SCALING_N", "16000000"))
    lo = int(os.environ.get("SCALING_LO", "8"))
    hi = int(os.environ.get("SCALING_HI", "32"))
    r_lo, r_hi = run(lo, n), run(hi, n)
    efficiency = (r_lo["sec"] / r_hi["sec"]) / (hi / lo)
    result = {
        "metric": "frontier-pop→fetch-batch scaling efficiency",
        "n_urls": n,
        f"local[{lo}]": {"sec": round(r_lo["sec"], 2), "urls_per_sec": round(r_lo["urls_per_sec"])},
        f"local[{hi}]": {"sec": round(r_hi["sec"], 2), "urls_per_sec": round(r_hi["urls_per_sec"])},
        "efficiency": round(efficiency, 3),
        "criterion": ">= 0.8",
        "pass": efficiency >= 0.8,
    }
    print(json.dumps(result))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "SCALING.md"), "a") as f:
        f.write(
            f"\n| {n} | local[{lo}] | {r_lo['sec']:.2f}s | {r_lo['urls_per_sec']:.0f}/s | "
            f"local[{hi}] | {r_hi['sec']:.2f}s | {r_hi['urls_per_sec']:.0f}/s | "
            f"{efficiency:.3f} | {'PASS' if efficiency >= 0.8 else 'FAIL'} |"
        )


if __name__ == "__main__":
    main()
