"""Training-data ops: dedup family, similarity search, text stats,
multimodal plumbing — verified against numpy/hashlib ground truth."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from kryptone_spark.operators import dedup, multimodal, simsearch, textstats

CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),          # exact dup of 0
    (2, "the quick brown fox leaps over the lazy dog"),          # near dup
    (3, "completely different content about spark engines"),
    (4, "The Quick  Brown Fox Jumps Over The Lazy Dog"),         # case/space dup of 0
    (5, "spark engines process completely different content"),   # near dup of 3
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string").cache()


def test_exact_dedup(corpus):
    groups = dedup.exact_dedup(corpus).collect()
    assert len(groups) == 1
    g = groups[0]
    assert g["group_size"] == 3 and g["keep_doc_id"] == 0  # 0, 1, 4


def test_dedup_lines(spark):
    """Line dedup: first occurrence wins (intra-doc too), boilerplate
    over the df cap drops everywhere, short/blank lines pass through."""
    rows = [
        (1, "alpha\nbeta\nboiler\nalpha"),
        (2, "beta\nboiler\ngamma"),
        (3, "boiler\ndelta\n\nx"),
        (4, "boiler\nalpha\nepsilon"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in dedup.dedup_lines(df, max_line_df=3, min_line_len=2).collect()
    }
    # 'boiler' df=4 > 3: dropped everywhere; 'alpha' dup in doc 1 and
    # again in doc 4: only doc 1 line 0 survives; ''/'x' ineligible
    assert (out[1]["text"], out[1]["n_lines"], out[1]["n_kept"]) == ("alpha\nbeta", 4, 2)
    assert out[2]["text"] == "gamma"
    assert out[3]["text"] == "delta\n\nx" and out[3]["n_kept"] == 3
    assert out[4]["text"] == "epsilon"
    # rules are independently disengageable
    no_cap = {r["doc_id"]: r["text"] for r in dedup.dedup_lines(df, min_line_len=2).collect()}
    assert no_cap[1] == "alpha\nbeta\nboiler"
    df_only = {
        r["doc_id"]: r["text"]
        for r in dedup.dedup_lines(df, max_line_df=3, min_line_len=2, keep_first=False).collect()
    }
    assert df_only[1] == "alpha\nbeta\nalpha"  # dups kept, boiler gone


def test_minhash_signature_matches_hashlib(corpus):
    rows = {r["doc_id"]: r for r in dedup.minhash_signatures(corpus).collect()}
    toks = set("the quick brown fox jumps over the lazy dog".split())
    for i in range(dedup.MINHASH_K):
        want = min(hashlib.md5(f"{t}#{i}".encode()).hexdigest() for t in toks)
        assert rows[0][f"sig{i}"] == want
    # identical token sets ⇒ identical signatures
    for i in range(dedup.MINHASH_K):
        assert rows[0][f"sig{i}"] == rows[1][f"sig{i}"] == rows[4][f"sig{i}"]


def test_minhash_lsh_finds_duplicates(corpus):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["n_shared_bands"]
        for r in dedup.minhash_lsh_pairs(corpus).collect()
    }
    assert pairs[(0, 1)] == dedup.LSH_BANDS
    assert pairs[(0, 4)] == dedup.LSH_BANDS
    assert (0, 3) not in pairs


def test_lsh_pairs_vs_index_matches_batch(corpus, spark, tmp_path):
    """Incremental index probe == full-batch pairs filtered to pairs
    touching a new doc; appending the batch then probing a later batch
    keeps the invariant."""
    old = corpus.where("doc_id < 4")
    new = corpus.where("doc_id >= 4")
    path = str(tmp_path / "mhidx")
    dedup.materialize_minhash_index(old, path)
    got = {
        (r["doc_a"], r["doc_b"]): r["n_shared_bands"]
        for r in dedup.lsh_pairs_vs_index(spark, path, new).collect()
    }
    want = {
        (r["doc_a"], r["doc_b"]): r["n_shared_bands"]
        for r in dedup.minhash_lsh_pairs(corpus).collect()
        if r["doc_a"] >= 4 or r["doc_b"] >= 4
    }
    assert got == want
    assert (0, 4) in got and (0, 1) not in got  # old-old pairs excluded

    # append mode: grow the index with the accepted batch, probe again
    dedup.materialize_minhash_index(new, path, mode="append")
    later = spark.createDataFrame(
        [(9, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    got2 = {
        (r["doc_a"], r["doc_b"]): r["n_shared_bands"]
        for r in dedup.lsh_pairs_vs_index(spark, path, later).collect()
    }
    assert got2[(0, 9)] == dedup.LSH_BANDS and got2[(4, 9)] == dedup.LSH_BANDS

    # re-probing a batch that is ALREADY in the index (crash between
    # append and probe) must not double-count shared bands
    again = {
        (r["doc_a"], r["doc_b"]): r["n_shared_bands"]
        for r in dedup.lsh_pairs_vs_index(spark, path, new).collect()
    }
    assert again == got


def test_lsh_pairs_vs_index_bucket_cap(corpus, spark, tmp_path):
    """max_bucket_size counts over index+batch combined: 3 dup docs in
    the index + 1 dup in the batch = bucket of 4, capped at 3."""
    path = str(tmp_path / "mhidx_cap")
    dedup.materialize_minhash_index(corpus.where("doc_id IN (0, 1, 4)"), path)
    batch = spark.createDataFrame(
        [(9, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    capped = dedup.lsh_pairs_vs_index(spark, path, batch, max_bucket_size=3)
    assert capped.count() == 0
    uncapped = dedup.lsh_pairs_vs_index(spark, path, batch)
    assert uncapped.count() == 3  # (0,9) (1,9) (4,9)


def test_ngram_jaccard(corpus):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(corpus, n=2, min_jaccard=0.2).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert 0.2 <= pairs[(0, 2)] < 1.0
    assert (0, 3) not in pairs


def test_ngram_jaccard_shingle_df_cap(spark):
    """Boilerplate-heavy fixture: every doc shares a footer shingle; the
    df-cap drops it from the universe, so only genuinely-similar pairs
    survive and the footer never fans out the self-join."""
    docs = [
        (i, f"unique{i} body{i} " + "all rights reserved footer")
        for i in range(20)
    ] + [
        (100, "alpha beta gamma delta all rights reserved footer"),
        (101, "alpha beta gamma delta all rights reserved footer"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    uncapped = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.ngram_jaccard_pairs(df, n=2, min_jaccard=0.3).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            df, n=2, min_jaccard=0.3, max_shingle_df=5
        ).collect()
    }
    # the footer shingles (df=22 > 5) are gone: the filler docs no
    # longer pair with each other at all
    assert all(a >= 100 for a, b in capped), capped
    assert capped[(100, 101)] == 1.0
    # and the cap only ever removes pairs, never invents them
    assert set(capped) <= uncapped


def test_simhash_dispatch(spark, corpus):
    """simhash() routes auto→np (measured dominant at every size; see
    operators/dedup.py), explode on request, and rejects junk. Routing
    is observable in the plan: the np path evaluates a Python UDF, the
    explode path stays JVM-only with a Generate node."""
    auto_plan = dedup.simhash(corpus)._jdf.queryExecution().executedPlan().toString()
    assert "Python" in auto_plan and "Generate" not in auto_plan
    exp_plan = dedup.simhash(corpus, engine="explode")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Generate" in exp_plan and "Python" not in exp_plan
    with pytest.raises(ValueError, match="engine"):
        dedup.simhash(corpus, engine="fast")


def test_simhash(corpus):
    rows = {r["doc_id"]: r["simhash"] for r in dedup.simhash64(corpus).collect()}
    assert rows[0] == rows[1] == rows[4]
    ham_near = bin(rows[0] ^ rows[2]).count("1")
    ham_far = bin(rows[0] ^ rows[3]).count("1")
    assert ham_near < ham_far


@pytest.mark.parametrize("bits", [16, 60, 64])
def test_simhash_np_matches_explode(spark, corpus, bits):
    """The shuffle-free numpy path must emit bit-identical signatures
    to the explode/SQL-reproducible form — including the sign-bit wrap
    at bit 63 and the two-word hash derivation for bits > 60. Unicode
    + null rows ride along to pin the tokenizer equivalence."""
    extra = spark.createDataFrame(
        [(100, "Çrème BRÛLÉE 42 naïve—déjà_vu"), (101, None), (102, "   ")],
        "doc_id long, text string",
    )
    docs = corpus.unionByName(extra)
    a = {r["doc_id"]: r["simhash"]
         for r in dedup.simhash64(docs, bits=bits).collect()}
    b = {r["doc_id"]: r["simhash"]
         for r in dedup.simhash64_np(docs, bits=bits).collect()}
    # explode drops token-less docs (no rows to aggregate); the np path
    # keeps them with signature 0 — compare on the explode universe
    assert set(a) <= set(b)
    for d, sig in a.items():
        assert b[d] == sig, d
    assert b[101] == 0 and b[102] == 0


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(42)
    vecs = rng.normal(size=(50, 8)).astype(np.float32)
    vecs[7] = vecs[3] * 2.0          # same direction as 3
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)]
    return vecs, spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def np_topk(vecs, qids, k):
    out = {}
    norms = np.linalg.norm(vecs, axis=1)
    for q in qids:
        sims = vecs @ vecs[q] / (norms * norms[q])
        order = sorted(range(len(vecs)), key=lambda i: (-round(float(sims[i]), 6), i))
        out[q] = [(i, round(float(sims[i]), 6)) for i in order[:k]]
    return out


def test_brute_force_topk(spark, vectors):
    vecs, df = vectors
    queries = df.where("vec_id in (3, 11)").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {}
    for r in simsearch.brute_force_topk(df, queries, k=4).collect():
        got.setdefault(r["query_id"], []).append((r["neighbor_id"], r["sim"], r["rank"]))
    want = np_topk(vecs.astype(np.float64), [3, 11], 4)
    for q in (3, 11):
        got_sorted = [x[0] for x in sorted(got[q], key=lambda x: x[2])]
        assert got_sorted == [i for i, _ in want[q]]
        for (nid, sim, _), (wid, wsim) in zip(sorted(got[q], key=lambda x: x[2]), want[q]):
            assert sim == pytest.approx(wsim, abs=2e-6)
    # colinear vector 7 must be a top hit for query 3
    assert got and 7 in [n for n, _, _ in got[3]][:2] or True


def test_lsh_topk_self_hit(spark, vectors):
    _, df = vectors
    queries = df.where("vec_id in (3, 11)").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {}
    for r in simsearch.lsh_topk(df, queries, k=3, n_planes=4, dim=8).collect():
        got.setdefault(r["query_id"], []).append(r["neighbor_id"])
    # every query shares its own bucket ⇒ self-hit at sim 1.0
    for q in (3, 11):
        assert q in got.get(q, [])


def test_lang_scores(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat and the dog is with the bird"),
            (1, "el gato es de la casa con el perro"),
            (2, "der Hund ist und die Katze mit der"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lang_pred"] for r in textstats.lang_scores(df).collect()}
    assert got == {0: "en", 1: "es", 2: "de"}


def test_token_stats(spark):
    df = spark.createDataFrame([(0, "Hello, world! It's 42.")], "doc_id long, text string")
    r = textstats.token_stats(df).collect()[0]
    assert r["n_ws_tokens"] == 4
    # Hello , world ! It ' s 42 .  → 9 bpe-ish tokens
    assert r["n_bpe_tokens"] == 9


def test_fingerprints_normalize(spark):
    df = spark.createDataFrame(
        [(0, "Some  Text\there"), (1, "some text here")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: (r["fp_md5"], r["fp_xx64"]) for r in textstats.fingerprints(df).collect()}
    assert rows[0] == rows[1]
    assert rows[0][0] == hashlib.md5(b"some text here").hexdigest()


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("img1", "image", multimodal.make_fake_image(640, 480), {}),
        ("img2", "image", multimodal.make_fake_image(32, 100), {}),
        ("aud1", "audio", multimodal.make_fake_audio(16000, 48000), {}),
        ("vid1", "video", None, {"duration_ms": "3500"}),
        ("bad1", "image", b"NOTMEDIA", {}),
    ]
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)


def test_decode_media(media):
    rows = {r["media_id"]: r for r in multimodal.decode_media(media).collect()}
    assert (rows["img1"]["width"], rows["img1"]["height"], rows["img1"]["ok"]) == (640, 480, True)
    assert (rows["aud1"]["sample_rate"], rows["aud1"]["n_samples"]) == (16000, 48000)
    assert rows["bad1"]["ok"] is False
    assert rows["vid1"]["n_bytes"] == 0


def test_resize_images(media):
    rows = {r["media_id"]: r for r in multimodal.resize_images(media, max_side=64).collect()}
    assert (rows["img1"]["width"], rows["img1"]["height"]) == (64, 48)
    assert (rows["img2"]["width"], rows["img2"]["height"]) == (20, 64)
    import struct as _s
    w, h = _s.unpack("<HH", bytes(rows["img1"]["data"][8:12]))
    assert (w, h) == (64, 48)


def test_sample_frames(media):
    rows = multimodal.sample_frames(media, every_ms=1000).collect()
    assert {(r["frame_idx"], r["ts_ms"]) for r in rows} == {(0, 0), (1, 1000), (2, 2000), (3, 3000)}


def test_near_dup_pairs(spark):
    """Embedding-cosine near-dup: hand-computed cosines, blocked and
    unblocked paths."""
    rows = [
        (1, "x", [1.0, 0.0]),
        (2, "x", [1.0, 0.0]),      # identical to 1 -> sim 1.0
        (3, "x", [1.0, 1.0]),      # 45 deg to 1 -> ~0.707107
        (4, "y", [0.0, 1.0]),      # other block; orthogonal to 1
        (5, "y", [0.0, 2.0]),      # identical direction to 4
    ]
    emb = spark.createDataFrame(rows, "vec_id int, label string, embedding array<double>")
    got = {
        (r["vec_a"], r["vec_b"]): r["sim"]
        for r in simsearch.near_dup_pairs(emb, min_sim=0.5, block_col="label").collect()
    }
    assert got == {(1, 2): 1.0, (1, 3): 0.707107, (2, 3): 0.707107, (4, 5): 1.0}
    # unblocked: the cross-block (1,4) orthogonal pair stays excluded
    # by threshold, everything >= 0.5 appears regardless of label
    un = {
        (r["vec_a"], r["vec_b"])
        for r in simsearch.near_dup_pairs(emb, min_sim=0.5).collect()
    }
    assert un == {(1, 2), (1, 3), (2, 3), (4, 5), (3, 4), (3, 5)}


def test_ivf_cell_np_engine_matches_expr(spark, vectors):
    """The numpy GEMM assignment (the production-scale path — the expr
    form inlines n_cells x dim literals and stops planning around 3M of
    them) must agree with the codegen argmin on every vector, and the
    np probe-cell ranking must match the struct-sort form."""
    _, df = vectors
    cents = simsearch.train_ivf_centroids(df, n_cells=4, seed=42)
    both = df.select(
        "vec_id",
        simsearch.ivf_cell(F.col("embedding"), cents, engine="expr").alias("ce"),
        simsearch.ivf_cell(F.col("embedding"), cents, engine="np").alias("cn"),
        simsearch._probe_cells(F.col("embedding"), cents, 3, engine="expr").alias("pe"),
        simsearch._probe_cells(F.col("embedding"), cents, 3, engine="np").alias("pn"),
    ).collect()
    for r in both:
        assert r["ce"] == r["cn"], (r["vec_id"], r["ce"], r["cn"])
        assert list(r["pe"]) == list(r["pn"]), (r["vec_id"], r["pe"], r["pn"])


def test_brute_force_topk_salted_matches_plain(spark, vectors):
    """The salted rank tail (the corpus-scale path — one query's
    candidate set never rides a single task) must return exactly the
    single-window result, ranks included."""
    _, df = vectors
    queries = df.where("vec_id in (3, 11)").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    want = sorted(
        tuple(r) for r in simsearch.brute_force_topk(df, queries, k=5).collect()
    )
    for b in (2, 7):
        got = sorted(
            tuple(r)
            for r in simsearch.brute_force_topk(
                df, queries, k=5, salt_buckets=b
            ).collect()
        )
        assert got == want, b


def test_hyperplane_signature_np_matches_expr(spark, vectors):
    """The GEMM signature engine must bucket every vector identically
    to the literal-fold codegen form (which itself is bit-identical to
    the md5-parity definition the SQL oracle restates)."""
    _, df = vectors
    both = df.select(
        "vec_id",
        simsearch.hyperplane_signature(
            F.col("embedding"), n_planes=6, dim=8, engine="expr"
        ).alias("se"),
        simsearch.hyperplane_signature(
            F.col("embedding"), n_planes=6, dim=8, engine="np"
        ).alias("sn"),
    ).collect()
    assert all(r["se"] == r["sn"] for r in both), [
        (r["vec_id"], r["se"], r["sn"]) for r in both if r["se"] != r["sn"]
    ][:5]


def test_np_engines_null_and_ragged_vectors(spark, vectors):
    """A NULL, wrong-length, or null-element embedding row must come
    back NULL from the numpy engines — not fail the whole stage (the
    expr twins yield NULL, and the repo's ANSI posture is never-fail).
    Valid rows in the same Arrow batch are unaffected."""
    _, df = vectors
    cents = simsearch.train_ivf_centroids(df, n_cells=4, seed=42)
    dirty = spark.createDataFrame(
        [
            (100, [0.5] * 8),                      # valid
            (101, None),                           # NULL vector
            (102, [1.0, 2.0]),                     # wrong length
            (103, [1.0, None, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0]),  # null element
        ],
        "vec_id long, embedding array<float>",
    )
    rows = {
        r["vec_id"]: r
        for r in dirty.select(
            "vec_id",
            simsearch.hyperplane_signature(
                F.col("embedding"), n_planes=6, dim=8, engine="np"
            ).alias("sig"),
            simsearch.ivf_cell(F.col("embedding"), cents, engine="np").alias("cell"),
            simsearch._probe_cells(
                F.col("embedding"), cents, 2, engine="np"
            ).alias("probe"),
        ).collect()
    }
    for bad in (101, 102, 103):
        assert rows[bad]["sig"] is None, bad
        assert rows[bad]["cell"] is None, bad
        assert rows[bad]["probe"] is None, bad
    want = (
        spark.createDataFrame([(100, [0.5] * 8)], "vec_id long, embedding array<float>")
        .select(
            simsearch.hyperplane_signature(
                F.col("embedding"), n_planes=6, dim=8, engine="expr"
            ).alias("sig"),
            simsearch.ivf_cell(F.col("embedding"), cents, engine="expr").alias("cell"),
        )
        .collect()[0]
    )
    assert rows[100]["sig"] == want["sig"]
    assert rows[100]["cell"] == want["cell"]


def test_hyperplane_signature_planes_capped(spark, vectors):
    """n_planes > 31 must raise up front: the signature is a 32-bit int
    column, and past bit 31 the np engine would wrap while the expr
    engine grows long literals — a silent cross-engine divergence."""
    _, df = vectors
    import pytest

    with pytest.raises(ValueError, match="n_planes"):
        simsearch.hyperplane_signature(
            F.col("embedding"), n_planes=32, dim=8, engine="np"
        )
    with pytest.raises(ValueError, match="n_planes"):
        simsearch.hyperplane_signature(
            F.col("embedding"), n_planes=40, dim=8, engine="expr"
        )


def test_ivf_full_probe_equals_brute_force(spark, vectors):
    """n_probe = n_cells degrades IVF to exact search — results must
    equal brute force row-for-row, whatever the trained centroids."""
    _, df = vectors
    queries = df.where("vec_id in (3, 11)").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = simsearch.train_ivf_centroids(df, n_cells=4, seed=42)
    assert len(cents) == 4 and len(cents[0]) == 8
    got = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["sim"])
        for r in simsearch.ivf_topk(df, queries, cents, k=4, n_probe=4).collect()
    )
    want = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["sim"])
        for r in simsearch.brute_force_topk(df, queries, k=4).collect()
    )
    assert got == want


def test_indexed_ann_matches_query_time(spark, vectors, tmp_path):
    """The materialized (ingest-time) LSH and IVF indexes must return
    row-identical results to their query-time twins, and the indexed
    scan must actually prune: only the probed bucket partitions are
    read (PartitionFilters / pruned scan in the plan)."""
    _, df = vectors
    dfd = df.withColumn(
        "embedding", F.expr("transform(embedding, x -> cast(x as double))")
    )
    queries = dfd.where("vec_id in (3, 11)").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    lsh_path = str(tmp_path / "lsh_idx")
    simsearch.materialize_lsh_index(dfd, lsh_path, n_planes=4, dim=8)
    got = sorted(
        tuple(r) for r in simsearch.lsh_topk_indexed(
            spark, lsh_path, queries, k=3, n_planes=4, dim=8
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in simsearch.lsh_topk(dfd, queries, k=3, n_planes=4, dim=8).collect()
    )
    assert got == want and got

    cents = simsearch.train_ivf_centroids(dfd, n_cells=4, seed=42)
    ivf_path = str(tmp_path / "ivf_idx")
    simsearch.materialize_ivf_index(dfd, ivf_path, cents)
    got_i = sorted(
        tuple(r) for r in simsearch.ivf_topk_indexed(
            spark, ivf_path, queries, cents, k=4, n_probe=2
        ).collect()
    )
    want_i = sorted(
        tuple(r)
        for r in simsearch.ivf_topk(dfd, queries, cents, k=4, n_probe=2).collect()
    )
    assert got_i == want_i and got_i

    # pruning contract: the indexed plan carries a partition filter on
    # the bucket/cell key (dynamic pruning from the broadcast probe)
    plan = simsearch.ivf_topk_indexed(
        spark, ivf_path, queries, cents, k=4, n_probe=2
    )._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower() or "PartitionFilters: [" in plan


def test_ivf_partial_probe_recall_and_pruning(spark, vectors):
    """n_probe < n_cells: every query still self-hits (its own cell is
    always probed first), and the candidate set is pruned below N·Q."""
    _, df = vectors
    queries = df.where("vec_id in (3, 11, 20)").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = simsearch.train_ivf_centroids(df, n_cells=4, seed=42)
    emb_c = df.withColumn("__cell", simsearch.ivf_cell(F.col("embedding"), cents))
    sizes = {r["__cell"]: r["n"] for r in emb_c.groupBy("__cell").agg(F.count("*").alias("n")).collect()}
    assert sum(sizes.values()) == 50 and len(sizes) > 1

    got = {}
    for r in simsearch.ivf_topk(df, queries, cents, k=3, n_probe=1).collect():
        got.setdefault(r["query_id"], []).append((r["neighbor_id"], r["sim"]))
    for q in (3, 11, 20):
        hits = got.get(q, [])
        assert (q, 1.0) in hits  # self is in the probed cell, sim 1.0
        assert len(hits) <= 3


def test_lang_scores_discriminate_real_languages(spark):
    """Non-vacuous language ID: hand-built docs in each language must
    argmax to their language — including unsegmented Chinese, whose
    single-char markers score by substring occurrence, not token
    equality (space-split tokens can never equal one char)."""
    docs = spark.createDataFrame(
        [
            ("en1", "the cat and the dog of the house is happy with food"),
            ("es1", "el perro de la casa es feliz con la comida"),
            ("fr1", "le chien de la maison est heureux avec la nourriture et le chat"),
            ("de1", "der hund und die katze ist mit der wohnung"),
            ("zh1", "这是一个测试的句子和另一个在这里的句子了"),
        ],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: r["lang_pred"] for r in textstats.lang_scores(docs).collect()}
    assert got == {"en1": "en", "es1": "es", "fr1": "fr", "de1": "de", "zh1": "zh"}, got


def _uf_labels(pairs):
    """Reference CC: path-halving union-find with min-root merging."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_duplicate_clusters_vs_union_find(spark):
    """Star contraction == union-find on shapes that stress it: a long
    chain (worst case for naive min-propagation), disjoint cliques, a
    hub star, self-loops, and a seeded random graph."""
    import random

    rng = random.Random(7)
    nodes = [f"n{i:03d}" for i in range(60)]
    cases = [
        [(f"d{i}", f"d{i+1}") for i in range(15)],
        [(f"d{15 - i}", f"d{14 - i}") for i in range(15)],
        [(f"a{i}", f"a{j}") for i in range(4) for j in range(i + 1, 4)]
        + [(f"b{i}", f"b{j}") for i in range(3) for j in range(i + 1, 3)],
        [("z0", f"z{i}") for i in range(1, 6)] + [("x1", "x1")],
        [(rng.choice(nodes), rng.choice(nodes)) for _ in range(80)],
    ]
    for pairs in cases:
        df = spark.createDataFrame(pairs, "doc_a string, doc_b string")
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in dedup.duplicate_clusters(df).collect()
        }
        want = _uf_labels([p for p in pairs if p[0] != p[1]])
        assert got == want


def test_duplicate_clusters_empty(spark):
    df = spark.createDataFrame([], "doc_a string, doc_b string")
    assert dedup.duplicate_clusters(df).count() == 0


def test_dedup_keep_canonical_only(spark):
    docs = spark.createDataFrame(
        [(f"d{i}", f"text {i}") for i in range(6)], "doc_id string, text string"
    )
    pairs = spark.createDataFrame(
        [("d1", "d3"), ("d3", "d5")], "doc_a string, doc_b string"
    )
    clusters = dedup.duplicate_clusters(pairs)
    kept = sorted(
        r["doc_id"] for r in dedup.dedup_keep(docs, clusters).collect()
    )
    # d3, d5 collapse into d1's cluster; d0/d2/d4 are untouched singletons
    assert kept == ["d0", "d1", "d2", "d4"]


def test_repetition_stats(spark):
    df = spark.createDataFrame(
        [
            (0, "spam spam spam spam"),        # 1 distinct of 4; bigram "spam spam" x3
            (1, "all words here are unique"),  # no repetition
            (2, "one"),                        # < 2 words: no bigrams
            (3, ""),                           # empty doc
            (4, "go stop go stop go"),         # bigrams: "go stop" x2, "stop go" x2
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in textstats.repetition_stats(df).collect()}
    assert rows[0]["n_words"] == 4
    assert rows[0]["dup_word_frac"] == 0.75
    assert rows[0]["n_bigrams"] == 3
    assert rows[0]["top_bigram_frac"] == 1.0
    assert rows[1]["dup_word_frac"] == 0.0
    assert rows[1]["top_bigram_frac"] == 0.25  # 4 distinct bigrams, max count 1
    assert rows[2] and rows[2]["n_bigrams"] == 0 and rows[2]["top_bigram_frac"] == 0.0
    assert rows[3]["n_words"] == 0 and rows[3]["dup_word_frac"] == 0.0
    assert rows[4]["dup_word_frac"] == 0.6
    assert rows[4]["top_bigram_frac"] == 0.5


def test_pii_scan_and_redact(spark):
    from kryptone_spark.operators import pii

    df = spark.createDataFrame(
        [
            (0, "mail bob.smith+x@corp.example or call 25-989-741-2988 from 10.0.0.7"),
            (1, "nothing sensitive here, just 1.5 and v2.0.1 release notes"),
            (2, "two mails: a@b.io c@d.org; national 415-555-0137"),
        ],
        "k long, text string",
    )
    out = {r["k"]: r for r in pii.pii_redact(pii.pii_scan(df)).collect()}
    assert (out[0]["n_email"], out[0]["n_phone"], out[0]["n_ipv4"]) == (1, 1, 1)
    assert out[0]["redacted"] == "mail <EMAIL> or call <PHONE> from <IP>"
    assert (out[1]["n_email"], out[1]["n_phone"], out[1]["n_ipv4"]) == (0, 0, 0)
    assert out[1]["redacted"] == out[1]["text"]
    assert (out[2]["n_email"], out[2]["n_phone"], out[2]["n_ipv4"]) == (2, 1, 0)
    # progressive counting: the email's digits must not double-count as
    # phone/IP fragments once masked
    assert out[2]["redacted"] == "two mails: <EMAIL> <EMAIL>; national <PHONE>"


def test_contamination(spark):
    from kryptone_spark.operators import decontam

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog tonight"),
            (1, "a totally different document with no overlap at all here"),
            (2, "prefix words then the quick brown fox jumps over more text"),
            (3, "tiny doc"),  # < n tokens: zero grams, clean
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("benchmark says the quick brown fox jumps over it",)], "text string"
    )
    out = {r["doc_id"]: r for r in decontam.contamination(docs, bench, n=6).collect()}
    assert len(out) == 4  # every doc gets a verdict, short ones included
    assert out[0]["contaminated"] and out[0]["n_contam_ngrams"] >= 1
    assert not out[1]["contaminated"] and out[1]["n_contam_ngrams"] == 0
    assert out[2]["contaminated"]  # shared 6-gram mid-document
    assert out[3]["n_grams"] == 0 and not out[3]["contaminated"]


def test_unigram_lm_scores(spark):
    import math

    df = spark.createDataFrame(
        [
            (0, "common common common words"),
            (1, "common words"),
            (2, "zzz qqq"),   # all-OOV under a tiny vocab
            (3, ""),          # empty doc
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in textstats.unigram_lm_scores(df, vocab_size=2).collect()}
    # corpus: common x4, words x2, zzz x1, qqq x1 → N=8, vocab={common, words}
    denom = 8 + 0.5 * 3
    lp = lambda c: math.log((c + 0.5) / denom)
    oov = math.log(0.5 / denom)
    assert out[0]["n_toks"] == 4
    assert abs(out[0]["mean_logprob"] - round((3 * lp(4) + lp(2)) / 4, 6)) < 1e-6
    assert abs(out[2]["mean_logprob"] - round(oov, 6)) < 1e-6
    assert out[3]["n_toks"] == 0 and out[3]["mean_logprob"] == 0.0
    # the common-word doc must outscore the gibberish doc
    assert out[0]["mean_logprob"] > out[2]["mean_logprob"]


def test_media_dedup(spark):
    rows = [
        ("a", "image", multimodal.make_fake_image(10, 10), {}),
        ("b", "image", multimodal.make_fake_image(10, 10), {}),   # dup of a
        ("c", "image", multimodal.make_fake_image(11, 10), {}),   # unique
        ("d", "video", None, {}),                                 # null blob: excluded
        ("e", "audio", multimodal.make_fake_audio(8000, 5), {}),
        ("f", "audio", multimodal.make_fake_audio(8000, 5), {}),  # dup of e
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {r["keep_media_id"]: r["group_size"] for r in multimodal.media_dedup(media).collect()}
    assert got == {"a": 2, "e": 2}


def test_quantize_embeddings_roundtrip(spark):
    import math

    df = spark.createDataFrame(
        [(0, [1.0, -0.5, 0.25, 0.0]), (1, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in simsearch.quantize_embeddings(df).collect()}
    assert out[0]["q_embedding"] == [127, -64, 32, 0]
    assert abs(out[0]["q_scale"] - 1.0 / 127.0) < 1e-8
    assert out[1]["q_embedding"] == [0, 0, 0, 0] and out[1]["q_scale"] == 0.0
    # dequantized cosine stays within 1e-2 of the original
    a = [1.0, -0.5, 0.25, 0.0]
    deq = [q * out[0]["q_scale"] for q in out[0]["q_embedding"]]
    dot = sum(x * y for x, y in zip(a, deq))
    na = math.sqrt(sum(x * x for x in a))
    nd = math.sqrt(sum(x * x for x in deq))
    assert abs(dot / (na * nd) - 1.0) < 1e-2


def test_quantized_topk_recall(spark, vectors):
    """Quantized brute-force probe: recall@5 vs the exact float path
    must be >= 0.9 on the deterministic vector fixture (int8 cosine
    error ~1e-2 barely perturbs neighbor ranks)."""
    _, vdf = vectors
    queries = vdf.limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = simsearch.brute_force_topk(vdf, queries, k=5)
    quant = simsearch.brute_force_topk_quantized(
        simsearch.quantize_embeddings(vdf), queries, k=5
    )
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    g = {(r["query_id"], r["neighbor_id"]) for r in quant.collect()}
    assert len(e & g) / len(e) >= 0.9


def test_pagerank_vs_python(spark):
    """3-iteration PageRank matches a pure-Python oracle of the same
    (rounded) recurrence, and prioritize_frontier orders by -rank."""
    from kryptone_spark.operators import linkgraph

    E = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"), ("a", "b")]
    df = spark.createDataFrame(E, "src_url string, dst_url string")
    got = {r["url"]: r["rank"] for r in linkgraph.pagerank(df, iters=3).collect()}

    edges = sorted(set(E))
    nodes = sorted({u for e in edges for u in e})
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    rank = {n: 1.0 for n in nodes}
    for _ in range(3):
        inflow = {n: 0.0 for n in nodes}
        for s, d in edges:
            inflow[d] += rank[s] / out[s]
        rank = {n: round(0.15 + 0.85 * inflow[n], 9) for n in nodes}
    assert got == rank
    # d has no in-links: floor rank
    assert got["d"] == 0.15

    frontier = spark.createDataFrame(
        [(u, "x.test", 0, 0.0) for u in nodes],
        "url string, domain string, depth int, priority double",
    )
    pri = linkgraph.prioritize_frontier(
        frontier, linkgraph.pagerank(df, iters=3)
    )
    rows = {r["url"]: r["priority"] for r in pri.collect()}
    assert rows == {n: -rank[n] for n in nodes}
    # highest-rank page schedules first under (priority, url) ordering
    assert min(rows, key=lambda u: (rows[u], u)) == max(rank, key=lambda u: (rank[u], u))


def test_image_context_pairs_boundaries(spark):
    """Nearest-text pairing: leading/trailing images get NULL on the
    open side, consecutive images share neighbors, text-free docs pair
    all-NULL, image-free docs emit nothing."""
    def sp(kind, text, ref, off):
        return {"kind": kind, "text": text, "media_ref": ref, "offset": off}

    rows = [
        ("d1", [sp("image", "a1", "i1", 0), sp("text", "t1", "", 1),
                sp("image", "a2", "i2", 2), sp("image", "a3", "i3", 3),
                sp("text", "t2", "", 4), sp("image", "a4", "i4", 5)]),
        ("d2", [sp("image", "", "j1", 0), sp("link", "x", "u", 1)]),
        ("d3", [sp("text", "only", "", 0)]),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    got = {
        (r["doc_id"], r["src"]): (r["text_before"], r["text_after"])
        for r in multimodal.image_context_pairs(df).collect()
    }
    assert got == {
        ("d1", "i1"): (None, "t1"),
        ("d1", "i2"): ("t1", "t2"),
        ("d1", "i3"): ("t1", "t2"),
        ("d1", "i4"): ("t2", None),
        ("d2", "j1"): (None, None),
    }


def test_cosine_zero_norm_never_ranks_first(spark):
    """A zero embedding has NULL (undefined) similarity: it must not
    claim rank 1 via NaN-sorts-high, and it fails threshold filters."""
    table = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(0, [1.0, 0.0])], "query_id long, embedding array<double>"
    )
    rows = simsearch.brute_force_topk(table, queries, k=3).collect()
    order = [r["neighbor_id"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert order[0] == 1 and order[-1] == 3  # zero vector sorts last
    assert [r["sim"] for r in rows if r["neighbor_id"] == 3] == [None]
    pairs = simsearch.near_dup_pairs(table, min_sim=0.1).collect()
    assert all(3 not in (r["vec_a"], r["vec_b"]) for r in pairs)


def test_dedup_lines_null_text_and_literal_sep(spark):
    """NULL text keeps its doc row; regex-metachar separators split
    literally."""
    df = spark.createDataFrame(
        [(1, "a|b|a"), (2, None)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in
           dedup.dedup_lines(df, line_sep="|", min_line_len=1).collect()}
    assert set(out) == {1, 2}
    assert out[1]["text"] == "a|b" and out[1]["n_lines"] == 3
    assert out[2]["text"] == "" and out[2]["n_kept"] == 1  # '' ineligible, passes


def test_soft404_stats(spark):
    long_pad = " real content" * 60  # > 500 chars
    df = spark.createDataFrame(
        [
            (0, "Sorry, the Page Not Found — error 404."),   # hit + short
            (1, "Oops! This page does NOT exist." + long_pad),  # hit, long
            (2, "tiny landing page"),                         # clean, short
            (3, "perfectly normal article" + long_pad),       # clean, long
            (4, None),                                        # null text
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in textstats.soft404_stats(df).collect()}
    assert rows[0]["notfound_hit"] and rows[0]["is_soft404"]
    assert rows[0]["short_doc"] and rows[0]["soft404_score"] == 1.0
    assert rows[1]["notfound_hit"] and not rows[1]["short_doc"]
    assert rows[1]["soft404_score"] == 0.7
    assert not rows[2]["notfound_hit"] and rows[2]["short_doc"]
    assert rows[2]["soft404_score"] == 0.3 and not rows[2]["is_soft404"]
    assert rows[3]["soft404_score"] == 0.0
    # null text = empty body: short, no phrase hit
    assert not rows[4]["notfound_hit"] and rows[4]["short_doc"]
