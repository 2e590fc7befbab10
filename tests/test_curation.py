"""Corpus-curation operators: deterministic sampling + shard packing.

Each operator is checked against a pure-Python oracle computing the
same md5-bucket / running-sum math, so determinism and engine parity
(the DuckDB contract oracles use identical formulas) are both pinned.
"""

import hashlib
from collections import Counter

import pytest
from pyspark.sql import functions as F

from kryptone_spark.operators import curation

ROWS = [(f"d{i:04d}", ["en", "es", "fr"][i % 3], (i * 37) % 500 + 1) for i in range(2000)]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        ROWS, "doc_id string, lang string, n_tokens int"
    ).localCheckpoint()


def _bucket(k: str, salt: str = "") -> int:
    return int(hashlib.md5((k + salt).encode()).hexdigest()[:4], 16)


def test_hash_sample_matches_python_oracle(docs):
    got = sorted(r["doc_id"] for r in curation.hash_sample(docs, 0.25).collect())
    want = sorted(k for k, _, _ in ROWS if _bucket(k) < round(0.25 * 65536))
    assert got == want
    # rate lands near the target
    assert abs(len(got) / len(ROWS) - 0.25) < 0.03


def test_hash_sample_salt_gives_independent_draw(docs):
    a = {r["doc_id"] for r in curation.hash_sample(docs, 0.5).collect()}
    b = {r["doc_id"] for r in curation.hash_sample(docs, 0.5, salt="v2").collect()}
    assert a != b
    # two independent 50% draws intersect in ~25% of the corpus
    assert 0.15 < len(a & b) / len(ROWS) < 0.35


def test_stratified_sample_per_stratum_thresholds(docs):
    fr = {"en": 0.5, "es": 0.1}
    got = sorted(
        r["doc_id"]
        for r in curation.stratified_sample(docs, fr, "lang").collect()
    )
    want = sorted(
        k for k, l, _ in ROWS if _bucket(k) < round(fr.get(l, 0.0) * 65536)
    )
    assert got == want  # fr has no 'fr' entry -> default 0.0 drops that stratum


def test_stratified_take_exact_quotas(docs):
    out = curation.stratified_take(docs, 7, "lang").collect()
    assert all(v == 7 for v in Counter(r["lang"] for r in out).values())
    bylang: dict[str, list[str]] = {}
    for k, l, _ in ROWS:
        bylang.setdefault(l, []).append(k)
    want = sorted(
        k
        for ks in bylang.values()
        for k in sorted(ks, key=lambda k: (_bucket(k), k))[:7]
    )
    assert sorted(r["doc_id"] for r in out) == want


def test_stratified_take_salted_matches_plain(docs):
    """The salted two-phase form (the 100 TB path — one stratum never
    rides a single task) must pick EXACTLY the same rows as the
    single-window form, for salt counts that do and don't divide the
    strata evenly."""
    want = sorted(
        (r["doc_id"], r["lang"])
        for r in curation.stratified_take(docs, 7, "lang").collect()
    )
    for b in (2, 3, 16):
        got = sorted(
            (r["doc_id"], r["lang"])
            for r in curation.stratified_take(
                docs, 7, "lang", salt_buckets=b
            ).collect()
        )
        assert got == want, b


def test_stratified_take_small_stratum_unpadded(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("c", "y")], "doc_id string, lang string"
    )
    out = Counter(
        r["lang"] for r in curation.stratified_take(df, 5, "lang").collect()
    )
    assert out == {"x": 2, "y": 1}


def test_pack_shards_sequential_fill(docs):
    got = {
        r["doc_id"]: r["shard_id"]
        for r in curation.pack_shards(docs, 10_000, "n_tokens").collect()
    }
    cum, want = 0, {}
    for k, _, t in sorted(ROWS):
        want[k] = cum // 10_000
        cum += t
    assert got == want
    # shards are contiguous doc_id ranges (sequential fill, no gaps)
    sids = [want[k] for k in sorted(want)]
    assert sids == sorted(sids)
    assert set(sids) == set(range(max(sids) + 1))


def test_pack_shards_oversized_doc_own_shard(spark):
    df = spark.createDataFrame(
        [("a", 10), ("b", 5000), ("c", 10)], "doc_id string, n_tokens int"
    )
    got = {
        r["doc_id"]: r["shard_id"]
        for r in curation.pack_shards(df, 100, "n_tokens").collect()
    }
    # b starts in shard 0's leftover (cum=10 -> shard 0); c lands past it
    assert got == {"a": 0, "b": 0, "c": 50}


def test_temperature_mix_matches_python_oracle(spark):
    """T=2 on a 1500/60-row skew: thresholds from the same
    pow/round/floor arithmetic, membership from the same md5 bucket —
    exact row-set equality with a hashlib reimplementation. T=1 keeps
    everything; higher T flattens the mix further."""
    rows = [(f"big{i:04d}", "big") for i in range(1500)] + [
        (f"sml{i:04d}", "small") for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id string, source string")

    def expect(temp):
        alpha = 1.0 / temp
        pw = {"big": 1500 ** (alpha - 1), "small": 60 ** (alpha - 1)}
        mx = max(pw.values())
        thr = {s: int(round(p / mx, 6) * 65536 // 1) for s, p in pw.items()}
        return {d for d, s in rows if _bucket(d) < thr[s]}

    got2 = {r["doc_id"] for r in curation.temperature_mix(df, 2.0).collect()}
    assert got2 == expect(2.0)
    kept2 = Counter(d[:3] for d in got2)
    # expected counts ∝ n^0.5: small keeps ~all, big keeps ~sqrt ratio
    assert kept2["sml"] == 60
    assert 0.15 < kept2["big"] / 1500 < 0.25  # sqrt(60/1500) ≈ 0.2

    got1 = curation.temperature_mix(df, 1.0).count()
    assert got1 == len(rows)  # T=1 is a no-op

    # NULL source is its own stratum, not silently dropped
    with_null = spark.createDataFrame(
        rows + [("nul0001", None), ("nul0002", None)],
        "doc_id string, source string",
    )
    assert curation.temperature_mix(with_null, 1.0).count() == len(rows) + 2
    got8 = {r["doc_id"] for r in curation.temperature_mix(df, 8.0).collect()}
    assert got8 == expect(8.0)
    assert len(got8 & {d for d, _ in rows}) == len(got8)  # subset, no dup


def test_validation_errors(docs):
    with pytest.raises(ValueError):
        curation.hash_sample(docs, 1.5)
    with pytest.raises(ValueError):
        curation.temperature_mix(docs, 0.0, source_col="lang")
    with pytest.raises(ValueError):
        curation.stratified_sample(docs, {"en": -0.1}, "lang")
    with pytest.raises(ValueError):
        curation.stratified_take(docs, -1, "lang")
    with pytest.raises(ValueError):
        curation.pack_shards(docs, 0, "n_tokens")
