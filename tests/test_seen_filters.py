"""Bloom + cuckoo sidecars: no false negatives, bounded FP, deletes."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kryptone_spark.config import CrawlConfig
from kryptone_spark.functions.cuckoo import CuckooFilter
from kryptone_spark.operators import seen as seen_ops


def test_cuckoo_basic_properties():
    rng = np.random.default_rng(42)
    keys = rng.integers(-(2**62), 2**62, size=5000, dtype=np.int64)
    inside, outside = keys[:4000], keys[4000:]
    f = CuckooFilter(capacity=8000)
    assert f.insert_many(inside) == 4000
    # no false negatives
    assert f.contains_many(inside).all()
    # bounded false positives (16-bit fingerprints → ~0.1% expected)
    fp_rate = f.contains_many(outside).mean()
    assert fp_rate < 0.01, fp_rate


def test_cuckoo_delete():
    rng = np.random.default_rng(7)
    keys = rng.integers(-(2**62), 2**62, size=1000, dtype=np.int64)
    f = CuckooFilter(capacity=2000)
    f.insert_many(keys)
    removed = f.delete_many(keys[:500])
    assert removed == 500
    assert f.contains_many(keys[500:]).all()      # survivors intact
    assert f.contains_many(keys[:500]).mean() < 0.02  # deleted mostly gone


def test_cuckoo_roundtrip_bytes():
    keys = np.arange(100, dtype=np.int64) * 7919
    f = CuckooFilter(capacity=256)
    f.insert_many(keys)
    g = CuckooFilter.from_bytes(f.to_bytes())
    assert g.contains_many(keys).all()
    assert g.n_buckets == f.n_buckets


@pytest.fixture(scope="module")
def config():
    return CrawlConfig(start_urls=["http://sitea.test/"])


def test_bloom_no_false_negatives(spark, config):
    urls = [f"http://sitea.test/p-{i}" for i in range(500)]
    seen_df = spark.createDataFrame([(u,) for u in urls], "url string")
    sidecar = seen_ops.build_bloom_sidecar(seen_df, config)
    cand = spark.createDataFrame(
        [(u,) for u in urls + [f"http://sitea.test/new-{i}" for i in range(500)]],
        "url string",
    )
    probed = {r["url"]: r["might_seen"] for r in seen_ops.probe_bloom(cand, sidecar, config).collect()}
    for u in urls:
        assert probed[u] is True, u
    fp = sum(probed[f"http://sitea.test/new-{i}"] for i in range(500)) / 500
    assert fp < 0.05, fp


def test_cuckoo_sidecar_probe_and_expire(spark, config):
    urls = [f"http://sitea.test/p-{i}" for i in range(300)]
    seen_df = spark.createDataFrame([(u,) for u in urls], "url string")
    sidecar = seen_ops.build_cuckoo_sidecar(seen_df, config)
    cand = spark.createDataFrame(
        [(u,) for u in urls[:50] + [f"http://sitea.test/x-{i}" for i in range(50)]],
        "url string",
    )
    probed = {
        r["url"]: r["might_seen"]
        for r in seen_ops.probe_cuckoo(cand, sidecar, config).collect()
    }
    for u in urls[:50]:
        assert probed[u] is True
    # re-crawl window: expire the first 50 → they read unseen again
    expired = spark.createDataFrame([(u,) for u in urls[:50]], "url string")
    sidecar2 = seen_ops.expire_urls(sidecar, expired, config)
    probed2 = {
        r["url"]: r["might_seen"]
        for r in seen_ops.probe_cuckoo(cand, sidecar2, config).collect()
    }
    refetchable = sum(not probed2[u] for u in urls[:50])
    assert refetchable >= 48  # tiny residual FP allowed


def test_cuckoo_overfill_never_loses_inserted_keys():
    """The kick loop must unwind on failure: an aborted displacement
    chain would evict a PREVIOUSLY INSERTED key (false negative — the
    one contract a seen-set filter cannot break)."""
    import numpy as np

    from kryptone_spark.functions.cuckoo import CuckooFilter

    rng = np.random.default_rng(3)
    keys = rng.integers(1, 2**63, size=400, dtype=np.int64).view(np.uint64)
    f = CuckooFilter(capacity=60)  # far over capacity → inserts WILL fail
    accepted = [
        k for k in keys if f.insert_many(np.array([k], dtype=np.uint64)) == 1
    ]
    assert 0 < len(accepted) < len(keys)  # some failed — the scenario under test
    got = f.contains_many(np.array(accepted, dtype=np.uint64))
    assert got.all(), f"{(~got).sum()} accepted keys read as absent"
