"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (one broadcast of the
query vectors, zip_with dot products JVM-side); the LSH-bucketed
variant is the 100 TB path — random-hyperplane signatures shrink the
candidate set before exact scoring, so the full N×Q cross product never
materializes.

Ingest-time indexes: ``materialize_lsh_index`` / ``materialize_ivf_index``
write the table partitioned by bucket/cell ONCE; the ``*_indexed``
variants read it back and probe with a broadcast join on the partition
column, so dynamic partition pruning limits the scan to the probed
buckets — queries never recompute signatures over the full table.
"""

from __future__ import annotations

import functools as _functools

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _topk_by_sim(cand: DataFrame, k: int, salt_buckets: int = 0) -> DataFrame:
    """Shared ranking tail: per-query top-k by (sim desc, neighbor_id)
    — the tie-break/rounding contract lives here once for all three
    search strategies.

    A window partitioned on query_id puts each query's WHOLE candidate
    set in one task — for brute force that is the full corpus per
    query. ``salt_buckets > 1`` engages the repo-standard salted
    two-phase top-k (schedule.py W4 / curation.stratified_take): rank
    within (query, salt-of-neighbor), keep each salt's local k, then
    the exact window sees ≤ salt_buckets × k rows per query. Identical
    output (test pins equality); default off so bucket-pruned probes
    keep the single-window plan."""
    order = [F.desc("sim"), F.asc("neighbor_id")]
    out = cand
    if salt_buckets > 1:
        w1 = Window.partitionBy(
            "query_id", F.pmod(F.xxhash64("neighbor_id"), F.lit(salt_buckets))
        ).orderBy(*order)
        out = (
            out.withColumn("__rk1", F.row_number().over(w1))
            .where(F.col("__rk1") <= k)
            .drop("__rk1")
        )
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        out.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a, b):
    """NULL (not NaN) for zero-norm vectors: 0/0 is IEEE NaN even under
    ANSI, and Spark sorts NaN ABOVE every double — one dead/padded
    embedding would otherwise claim rank 1 of every query's top-k.
    NULLs sort last under desc and fail every `sim >= t` filter."""
    den = _norm(a) * _norm(b)
    return F.when(den != 0, _dot(a, b) / den)


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt_buckets: int = 0,
) -> DataFrame:
    """Exact top-k neighbours for each query vector.

    queries: (query_id, embedding). The query side broadcasts (it is
    small by definition); scoring is a single pass over the embedding
    table inside codegen — at 100 TB this is scan-bound, the optimal
    shape for exact search. Ties broken by neighbour id.
    """
    q = queries.select(
        F.col("query_id"), F.col(vec_col).alias("q_vec")
    )
    scored = embeddings.crossJoin(F.broadcast(q)).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col(vec_col), F.col("q_vec")), 6).alias("sim"),
    )
    return _topk_by_sim(scored, k, salt_buckets)


@_functools.lru_cache(maxsize=None)
def _hyperplane_signs(n_planes: int, dim: int) -> tuple[tuple[float, ...], ...]:
    """The deterministic ±1 hyperplanes: sign(p, i) = +1 iff
    md5('p_i') is even — the exact constants the SQL oracle restates
    (hex parity = last-digit parity). hashlib here is a one-time
    driver cost; the previous form re-derived every weight with a
    PER-ROW md5 expression — n_planes × dim md5 calls per scanned row
    (1024/row at 16×64), pure waste since the weights are constants."""
    import hashlib

    return tuple(
        tuple(
            1.0
            if int(hashlib.md5(f"{p}_{i}".encode()).hexdigest()[:4], 16) % 2 == 0
            else -1.0
            for i in range(dim)
        )
        for p in range(n_planes)
    )


def _vec_matrix(vs: pd.Series, dim: int):
    """(matrix, valid_mask) for an Arrow batch of embedding arrays.
    A NULL, wrong-length, or null-element row is zero-filled in the
    matrix and masked invalid — callers emit NULL for masked rows
    instead of raising mid-stage (the repo's ANSI never-fail posture;
    the expr twins already yield NULL/0 rather than erroring). The
    clean-batch fast path is one np.asarray; only a dirty batch pays
    the per-row fallback loop."""
    vals = vs.tolist()
    n = len(vals)
    try:
        M = np.asarray(vals, dtype=np.float64)
        if M.ndim == 2 and M.shape[1] == dim:
            # Arrow surfaces a null ELEMENT as NaN in a float array —
            # a NaN-bearing vector is as unusable as a NULL one
            return np.nan_to_num(M), ~np.isnan(M).any(axis=1)
    except (TypeError, ValueError):
        pass
    M = np.zeros((n, dim), dtype=np.float64)
    valid = np.zeros(n, dtype=bool)
    for i, v in enumerate(vals):
        if v is None or len(v) != dim:
            continue
        try:
            M[i] = v
        except (TypeError, ValueError):
            continue
        if not np.isnan(M[i]).any():
            valid[i] = True
        else:
            M[i] = 0.0
    return M, valid


def hyperplane_signature(
    vec, n_planes: int = 16, dim: int = 64, engine: str = "auto"
) -> F.Column:
    """Random-hyperplane LSH signature: bit p = sign(v · h_p) where
    h_p is a deterministic pseudo-random ±1 hyperplane derived from
    md5(p, i) — reproducible in SQL, no RNG state. ``engine='expr'``
    folds each plane's precomputed weights as a literal array inside
    codegen (left-to-right float fold — bit-identical to the old
    per-row-md5 form and the SQL oracle); ``'np'`` is one
    (batch × dim) @ (dim × planes) GEMM per Arrow batch for
    production-sized signatures where n_planes × dim literals would
    hit the same plan-size wall as ivf_cell (ulp-level sign flips
    possible on projections exactly at 0; first-bit semantics match).
    ``'auto'`` picks by literal count. n_planes is capped at 31: the
    signature is an int column (the contract dtype), and past bit 31
    the np path's int32 cast would silently wrap while the expr path
    builds unbounded long literals — the engines would diverge exactly
    where ``'auto'`` switches. 2^31 buckets is far beyond any useful
    banding granularity; wider sketches belong to simhash64."""
    if n_planes > 31:
        raise ValueError(
            f"n_planes={n_planes} > 31: signature is a 32-bit int column"
        )
    signs = _hyperplane_signs(n_planes, dim)
    if engine == "expr" or (engine == "auto" and n_planes * dim <= _IVF_EXPR_MAX_LITERALS):
        out = F.lit(0)
        for p in range(n_planes):
            w = F.array(*[F.lit(s) for s in signs[p]])
            proj = F.aggregate(
                F.zip_with(vec, w, lambda v, s: v * s),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            out = out + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
        return out

    W = np.asarray(signs)  # (planes, dim)
    pows = (1 << np.arange(n_planes)).astype(np.int64)

    @pandas_udf("int")
    def _sig(vs: pd.Series) -> pd.Series:
        M, valid = _vec_matrix(vs, dim)
        sigs = ((M @ W.T > 0) @ pows).astype("int32")
        out = pd.Series(sigs, dtype="Int32")
        out[~valid] = pd.NA
        return out

    return _sig(vec)


def _bucket_probe_topk(
    emb_s: DataFrame, q_s: DataFrame, key: str, k: int, id_col: str, vec_col: str,
    salt_buckets: int = 0,
) -> DataFrame:
    """Shared probe tail for every bucketed strategy (query-time or
    indexed): broadcast the (query, bucket) side, equi-join on the
    bucket key — when emb_s comes from a table partitioned on the key,
    dynamic partition pruning drops unprobed partitions from the scan —
    then exact-cosine re-score and rank."""
    cand = emb_s.join(F.broadcast(q_s), key).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col(vec_col), F.col("q_vec")), 6).alias("sim"),
    )
    return _topk_by_sim(cand, k, salt_buckets)


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates = vectors sharing the query's
    hyperplane bucket (plus Hamming-adjacent buckets would be the
    recall knob); exact cosine re-scores candidates only. Signatures
    are computed at query time over the full table — fine for one-off
    scans; repeated querying at scale wants materialize_lsh_index +
    lsh_topk_indexed."""
    sig = hyperplane_signature(F.col(vec_col), n_planes, dim)
    emb_s = embeddings.withColumn("bucket", sig)
    q_s = queries.select(
        "query_id", F.col(vec_col).alias("q_vec")
    ).withColumn("bucket", hyperplane_signature(F.col("q_vec"), n_planes, dim))
    return _bucket_probe_topk(emb_s, q_s, "bucket", k, id_col, vec_col)


def materialize_lsh_index(
    embeddings: DataFrame,
    path: str,
    n_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
) -> None:
    """Ingest-time LSH index: write the embedding table WITH its
    hyperplane bucket, hive-partitioned on the bucket. One full pass at
    build time; every subsequent lsh_topk_indexed probe scans only the
    probed buckets (~N/2^planes rows per query) via partition pruning.
    Rebuild = re-run (overwrite) after bulk ingest; deterministic
    hyperplanes mean a rebuild never changes existing buckets."""
    emb_s = embeddings.withColumn(
        "bucket", hyperplane_signature(F.col(vec_col), n_planes, dim)
    )
    emb_s.write.partitionBy("bucket").mode("overwrite").parquet(path)


def lsh_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a materialized LSH index: identical results to lsh_topk
    (tests pin equality) but the scan reads only the partitions whose
    bucket matches a query signature — no full-table signature
    recompute. n_planes/dim must match the build (the signature of the
    QUERY vector is still computed here, O(|queries|))."""
    emb_s = spark.read.parquet(path)
    q_s = queries.select(
        "query_id", F.col(vec_col).alias("q_vec")
    ).withColumn("bucket", hyperplane_signature(F.col("q_vec"), n_planes, dim))
    return _bucket_probe_topk(emb_s, q_s, "bucket", k, id_col, vec_col)


def train_ivf_centroids(
    embeddings: DataFrame,
    n_cells: int = 8,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
) -> list[list[float]]:
    """IVF coarse quantizer: k-means cell centroids via Spark MLlib
    (distributed fit — at 100 TB, train on a sample(frac) instead of
    the full table; assignment below is a full-scan either way).
    Returns plain Python lists so downstream assignment folds the
    centroids into plan-time literals — the whole index build stays
    JVM-side codegen, no Python in the scan."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = embeddings.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter).fit(feats)
    return [[float(x) for x in c] for c in model.clusterCenters()]


def _sqdist_to(vec, centroid: list[float]):
    c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


# Above this many inlined centroid floats (n_cells × dim) the literal
# expression tree stops being a plan and starts being a payload:
# analysis walks every literal and Janino gets one method per array
# element — production IVF (4096 cells × 768 dims ≈ 3.1M literals)
# never finishes planning. The numpy pandas-UDF twin ships the
# centroid matrix once per task in the closure and does the argmin as
# one (batch × dim) @ (dim × cells) GEMM.
_IVF_EXPR_MAX_LITERALS = 4096


def _centroid_matrix(centroids: list[list[float]]):
    return np.asarray(centroids, dtype=np.float64)


def ivf_cell(vec, centroids: list[list[float]], engine: str = "auto"):
    """Nearest-centroid cell id (0-based). ``engine='expr'`` is the
    pure-codegen argmin over constant centroid arrays (exact (a-b)²
    sums — the form the SQL oracle restates); ``'np'`` is the GEMM
    form ‖x‖²−2x·c+‖c‖² (may differ by float ulps on near-ties;
    first-index tie-break matches). ``'auto'`` picks by literal count
    so small indexes keep the oracle-identical expression and
    production-sized ones never hit the plan-size wall."""
    n_lit = len(centroids) * (len(centroids[0]) if centroids else 0)
    if engine == "expr" or (engine == "auto" and n_lit <= _IVF_EXPR_MAX_LITERALS):
        dists = F.array(*[_sqdist_to(vec, c) for c in centroids])
        return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")

    C = _centroid_matrix(centroids)
    c_sq = (C * C).sum(axis=1)

    @pandas_udf("int")
    def _cell(vs: pd.Series) -> pd.Series:
        M, valid = _vec_matrix(vs, C.shape[1])
        d = M @ (-2.0 * C.T) + c_sq  # ‖x‖² omitted: constant per row
        out = pd.Series(d.argmin(axis=1).astype("int32"), dtype="Int32")
        out[~valid] = pd.NA  # expr twin yields NULL for NULL/ragged vecs
        return out

    return _cell(vec)


def _probe_cells(vec, centroids: list[list[float]], n_probe: int, engine: str = "auto"):
    """Ids of the n_probe nearest cells. expr form: sort (dist, id)
    structs — struct ordering is field-lexicographic — then project
    ids; np form: one GEMM + argsort per Arrow batch (query side is
    small, but the PLAN must stay small too — same literal-count wall
    as ivf_cell)."""
    n_lit = len(centroids) * (len(centroids[0]) if centroids else 0)
    if engine == "expr" or (engine == "auto" and n_lit <= _IVF_EXPR_MAX_LITERALS):
        tagged = F.array(
            *[
                F.struct(_sqdist_to(vec, c).alias("d"), F.lit(i).alias("i"))
                for i, c in enumerate(centroids)
            ]
        )
        return F.slice(
            F.transform(F.array_sort(tagged), lambda s: s["i"]), 1, n_probe
        )

    C = _centroid_matrix(centroids)
    c_sq = (C * C).sum(axis=1)

    @pandas_udf("array<int>")
    def _cells(vs: pd.Series) -> pd.Series:
        M, valid = _vec_matrix(vs, C.shape[1])
        d = M @ (-2.0 * C.T) + c_sq
        # stable sort = first-index tie-break, matching array_sort on
        # (d, i) structs
        order = np.argsort(d, axis=1, kind="stable")[:, :n_probe].astype("int32")
        return pd.Series(
            [row if ok else None for row, ok in zip(list(order), valid)]
        )

    return _cells(vec)


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: candidates = vectors whose cell is among the query's
    n_probe nearest cells; exact cosine re-scores candidates only.

    The 100 TB shape: ``ivf_cell`` is computed once at ingest and the
    table is partitioned/bucketed by it, so a query's scan prunes to
    n_probe/n_cells of the data; the (tiny) query side explodes to
    (query, cell) pairs and broadcast-joins. n_probe = n_cells degrades
    gracefully to exact brute force — the correctness oracle."""
    emb_c = embeddings.withColumn("__cell", ivf_cell(F.col(vec_col), centroids))
    q = (
        queries.select(F.col("query_id"), F.col(vec_col).alias("q_vec"))
        .withColumn(
            "__cell", F.explode(_probe_cells(F.col("q_vec"), centroids, n_probe))
        )
    )
    return _bucket_probe_topk(emb_c, q, "__cell", k, id_col, vec_col)


def materialize_ivf_index(
    embeddings: DataFrame,
    path: str,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> None:
    """Ingest-time IVF index: assign each vector its nearest-centroid
    cell ONCE (codegen argmin over plan-time literal centroids) and
    write hive-partitioned on the cell. A probe then scans
    n_probe/n_cells of the data via partition pruning. The centroids
    used at build time must be passed to ivf_topk_indexed — persist
    them next to the index (they are a few KB of floats)."""
    emb_c = embeddings.withColumn("__cell", ivf_cell(F.col(vec_col), centroids))
    emb_c.write.partitionBy("__cell").mode("overwrite").parquet(path)


def ivf_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a materialized IVF index: identical results to ivf_topk
    for the same centroids (tests pin equality); the scan prunes to the
    probed cells' partitions."""
    emb_c = spark.read.parquet(path)
    q = (
        queries.select(F.col("query_id"), F.col(vec_col).alias("q_vec"))
        .withColumn(
            "__cell", F.explode(_probe_cells(F.col("q_vec"), centroids, n_probe))
        )
    )
    return _bucket_probe_topk(emb_c, q, "__cell", k, id_col, vec_col)


def near_dup_pairs(
    embeddings: DataFrame,
    min_sim: float,
    block_col: str | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the dedup-family ANN op):
    all (a, b) with cosine ≥ min_sim. ``block_col`` restricts the
    self-join to a blocking key (label, LSH bucket, shard) — at 100 TB
    the unblocked self-join is quadratic, so callers block on an LSH
    bucket from ``hyperplane_signature`` (recall tunable via planes) or
    a coarse cluster id; within-block scoring is one shuffled
    equi-join + codegen dot products, no Python."""
    keys = [block_col] if block_col else []
    a = embeddings.select(
        *keys, F.col(id_col).alias("vec_a"), F.col(vec_col).alias("__va")
    )
    b = embeddings.select(
        *keys, F.col(id_col).alias("vec_b"), F.col(vec_col).alias("__vb")
    )
    joined = a.join(b, keys) if keys else a.crossJoin(b)
    return (
        joined.where(F.col("vec_a") < F.col("vec_b"))
        .select(
            *keys, "vec_a", "vec_b",
            F.round(cosine(F.col("__va"), F.col("__vb")), 6).alias("sim"),
        )
        .where(F.col("sim") >= min_sim)
    )


def quantize_embeddings(
    df: DataFrame, col: str = "embedding", out_col: str = "q_embedding"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: q_i = round(x_i * 127 /
    max|x|), with ``q_scale`` = max|x| / 127 kept alongside. The memory
    lever for ANN at 10^10 vectors — a 4x cut on the scanned bytes
    (float32→int8), and dot(q_a, q_b) * scale_a * scale_b approximates
    dot(a, b) to ~1e-2 relative. Pure projection (codegen'd arithmetic,
    no shuffle); all-zero vectors quantize to zeros with scale 0."""
    x = F.transform(F.col(col), lambda v: v.cast("double"))
    mx = F.array_max(F.transform(x, lambda v: F.abs(v)))
    q = F.when(
        mx > 0,
        F.transform(x, lambda v: F.round(v * 127.0 / mx).cast("int")),
    ).otherwise(F.transform(x, lambda v: F.lit(0)))
    return df.withColumn(out_col, q).withColumn(
        "q_scale", F.when(mx > 0, F.round(mx / 127.0, 8)).otherwise(F.lit(0.0))
    )


def brute_force_topk_quantized(
    embeddings_q: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    qvec_col: str = "q_embedding",
    scale_col: str = "q_scale",
    vec_col: str = "embedding",
    salt_buckets: int = 0,
) -> DataFrame:
    """Exact-shape top-k over a ``quantize_embeddings`` table: the scan
    reads int8 arrays + one scale per vector (4x fewer bytes than
    float32 — at 10^10 vectors the probe is scan-bound, so that is 4x
    wall time), reconstructs dot(a, q) ≈ dot(q_a, q) * scale_a, and
    ranks with the same (sim desc, id) tail as the float path. The
    query side stays float (it is tiny and broadcast). Approximation
    error is the quantization's ~1e-2 on cosine; a recall test pins it.
    Cosine normalizes by the DEQUANTIZED norm, so the scale cancels in
    ranking only when vectors share a scale — we keep it explicit."""
    q = queries.select(F.col("query_id"), F.col(vec_col).alias("q_vec"))
    deq = F.transform(
        F.col(qvec_col), lambda v: v.cast("double") * F.col(scale_col)
    )
    scored = embeddings_q.crossJoin(F.broadcast(q)).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(deq, F.col("q_vec")), 6).alias("sim"),
    )
    return _topk_by_sim(scored, k, salt_buckets)
