"""Deduplication operators for large-scale text corpora.

Engine-only capability (the reference dedups URLs, never content) —
first-class for a training-data pipeline. All hashing uses md5 hex
(identical across Spark and DuckDB) so every operator has an exact SQL
oracle; the scale-path notes say what changes at 100 TB.

Operators:
- exact_dedup        — normalized-text hash groups (hash-groupBy)
- minhash_signatures — k-permutation MinHash over distinct tokens
- minhash_lsh_pairs  — banded LSH candidate pairs (band → bucket join)
- ngram_jaccard_pairs— exact n-gram Jaccard via common-shingle join
- simhash64          — 64-bit SimHash from per-token md5 bits
- simhash64_np       — same signatures, shuffle-free numpy pandas UDF
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kryptone_spark.plans.lineage_cut import checkpoint_cut

# fixed salts keep signatures deterministic and SQL-reproducible
MINHASH_K = 8
LSH_BANDS = 4  # rows-per-band = MINHASH_K / LSH_BANDS = 2


def normalized_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, tok) distinct — lowercase, alnum-only, space-split.
    The shared tokenizer for every dedup op (identical SQL form:
    regexp_replace(lower(text),'[^a-z0-9 ]',' ','g') then split)."""
    toks = F.split(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", " "), " +"
    )
    return (
        df.select("doc_id", F.explode(toks).alias("tok"))
        .where(F.col("tok") != "")
        .distinct()
    )


def _distinct_token_array(text_col: str) -> F.Column:
    """Per-row distinct token array (lowercase, alnum-only) — the
    shuffle-free form of ``normalized_tokens().distinct()``: identical
    token set, built in the projection instead of a cluster-wide
    (doc_id, tok) dedup exchange. Sorted-order consumers wrap it in
    array_sort; exploded consumers get the same rows the old path
    shuffled for."""
    return F.array_distinct(
        F.split(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", " "), " +")
    )


def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups on whitespace-normalized text. Scale: one
    shuffle on a 32-hex key; at 100 TB this is the cheapest possible
    full-corpus op (map-side partial agg, no row wider than the hash)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return (
        df.select("doc_id", F.md5(norm).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.count("*").alias("group_size"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .where(F.col("group_size") > 1)
    )


def dedup_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_sep: str = "\n",
    min_line_len: int = 1,
    max_line_df: int | None = None,
    keep_first: bool = True,
) -> DataFrame:
    """Cross-corpus line-level dedup + boilerplate removal (the
    CCNet/RefinedWeb line-granularity curation step — the reference has
    no content dedup at all). Two independently-usable rules over the
    exploded (doc, line) stream:

    - ``keep_first``: of every group of identical lines, only the FIRST
      occurrence in corpus order (min (doc_id, line_no)) survives —
      later copies, including later copies inside the same document,
      are dropped.
    - ``max_line_df``: lines whose document frequency exceeds the cap
      are dropped EVERYWHERE (navigation bars, cookie banners — text
      repeated across many pages carries no training signal).

    Lines shorter than ``min_line_len`` are not dedup-eligible and pass
    through untouched (dedup-ing "" would collapse every blank line in
    the corpus into the first document).

    Returns (id_col, text: the re-joined surviving lines, n_lines,
    n_kept) — one row per input doc, docs whose every line was dropped
    keep an empty text.

    Scale: lines are keyed by md5 (32-hex, so the group-by shuffle
    never carries a line's full text twice); one shuffle to find first
    owners + doc frequencies (map-side partial agg), one line-key join
    back, one doc_id regroup to reassemble — all hash-partitioned, no
    window over the corpus, nothing driver-side. The join's build side
    is only the DUPLICATED line keys (groups of size 1 are dropped
    before the join and pass through by coalesce), which at 100 TB is
    the small minority of a crawl's distinct lines.
    """
    import re as _re

    # literal separator (F.split takes a REGEX — '|' or '.' would
    # shred the text per-character) + NULL text survives as '' (a
    # plain posexplode would silently drop the doc from the output)
    lines = df.select(
        id_col,
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), _re.escape(line_sep))
        ).alias("line_no", "line"),
    )
    elig = F.length("line") >= min_line_len
    lines = lines.withColumn("__k", F.when(elig, F.md5(F.col("line"))))
    groups = (
        lines.where(F.col("__k").isNotNull())
        .groupBy("__k")
        .agg(
            F.min(F.struct(id_col, "line_no")).alias("__first"),
            F.count_distinct(F.col(id_col)).alias("__df"),
            F.count("*").alias("__n"),
        )
        # singleton lines can't lose either rule (first occurrence of
        # themselves, df=1 ≤ any cap) — dropping them here keeps the
        # join's build side to just the contended keys
        .where(
            (F.col("__n") > 1)
            | (F.lit(max_line_df is not None) & (F.col("__df") > (max_line_df or 0)))
        )
    )
    j = lines.join(groups, "__k", "left")
    survive = (
        F.col("__k").isNull()  # ineligible: always kept
        | F.col("__first").isNull()  # uncontended singleton
        | (
            (
                F.struct(F.col(id_col), F.col("line_no")) == F.col("__first")
                if keep_first
                else F.lit(True)
            )
            & (
                (F.col("__df") <= max_line_df)
                if max_line_df is not None
                else F.lit(True)
            )
        )
    )
    kept = j.withColumn("__keep", survive)
    return (
        kept.groupBy(id_col)
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("__keep").cast("long")).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__keep"), F.struct("line_no", "line")
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
                line_sep,
            ).alias(text_col),
        )
    )


def minhash_signatures(df: DataFrame, text_col: str = "text", k: int = MINHASH_K) -> DataFrame:
    """MinHash: sig_i = min over tokens of md5(tok || '#i'). One wide
    groupBy; hex-string min == numeric min (fixed 32-char strings).

    Scale shape (r2): token dedup happens INSIDE the row via
    ``array_distinct`` (a projection — min is insensitive to duplicate
    tokens, so this is value-identical to the old
    ``normalized_tokens().distinct()`` path, which shuffled every
    (doc_id, tok) pair across the cluster just to dedup). The only
    remaining exchange is the groupBy's, and partial aggregation
    collapses it to k sigs per doc — |docs| rows, not |tokens|.
    Measured 1.46x at sf0.1 locally; at 100 TB the removed shuffle is
    the corpus's whole tokenized volume. The md5 chain stays inside
    whole-stage codegen (explode + hash + partial-min)."""
    t = df.select(
        "doc_id", F.explode(_distinct_token_array(text_col)).alias("tok")
    ).where(F.col("tok") != "")
    aggs = [
        F.min(F.md5(F.concat(F.col("tok"), F.lit(f"#{i}")))).alias(f"sig{i}")
        for i in range(k)
    ]
    return t.groupBy("doc_id").agg(*aggs)


def banded_rows(sigs: DataFrame, k: int = MINHASH_K, bands: int = LSH_BANDS) -> DataFrame:
    """Signature table → one (doc_id, band, bucket) row per band.
    bucket = md5 of the band's signature slice, so banded rows are a
    deterministic pure function of the text — appends to a persisted
    index never disagree with earlier builds."""
    rows_per_band = k // bands
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"sig{i}") for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("|", *parts)).alias("bucket"))
        )
    return sigs.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def materialize_minhash_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    mode: str = "overwrite",
) -> None:
    """Ingest-time MinHash-LSH index: persist the corpus's banded rows
    (doc_id, band, bucket — ~bands·48 B/doc, never the text) so
    incremental dedup of a new batch tokenizes and minhashes ONLY the
    batch. ``mode="append"`` grows the index after each accepted batch
    (the md5 chain is deterministic — appends are consistent with any
    earlier build). At 100 TB this is the difference between
    re-minhashing the whole corpus per increment and an O(|batch|)
    signature pass + a bucket join."""
    if k % bands != 0:
        raise ValueError(f"k={k} not divisible by bands={bands}")
    banded = banded_rows(minhash_signatures(df, text_col, k), k, bands)
    banded.write.partitionBy("band").mode(mode).parquet(path)


def _pairs_from_banded(
    rows: DataFrame, max_bucket_size: int | None = None, new_only: bool = False
) -> DataFrame:
    """Shared pair-join tail over (doc_id, band, bucket[, is_new])
    rows: hot-bucket cap, self-join on the bucket key, per-pair
    shared-band count. ``new_only`` keeps pairs touching ≥1 ``is_new``
    row (the incremental probe's contract)."""
    if max_bucket_size is not None:
        sizes = (
            rows.groupBy("band", "bucket")
            .agg(F.count("*").alias("__bs"))
            .where(F.col("__bs") <= max_bucket_size)
            .drop("__bs")
        )
        rows = rows.join(sizes, ["band", "bucket"], "left_semi")
    a = rows.alias("a")
    b_ = rows.alias("b")
    j = a.join(b_, ["band", "bucket"]).where(F.col("a.doc_id") < F.col("b.doc_id"))
    if new_only:
        j = j.where(F.col("a.is_new") | F.col("b.is_new"))
    return j.groupBy(
        F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
    ).agg(F.count("*").alias("n_shared_bands"))


def lsh_pairs_vs_index_df(
    idx: DataFrame,
    new_docs: DataFrame,
    text_col: str = "text",
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    max_bucket_size: int | None = None,
    banded_new: DataFrame | None = None,
) -> DataFrame:
    """Incremental LSH candidate pairs against an index that is already
    a DataFrame of (doc_id, band, bucket) rows — the form the wave loop
    maintains through TableIO (committed-wave partitions, so a resume
    rolls the index back in lockstep with every other state table).
    ``banded_new`` lets a caller that already banded the batch (e.g. to
    persist the same rows) skip a second signature pass."""
    if banded_new is None:
        banded_new = banded_rows(minhash_signatures(new_docs, text_col, k), k, bands)
    banded_new = banded_new.select("doc_id", "band", "bucket").withColumn(
        "is_new", F.lit(True)
    )
    # exclude index copies of the batch's own doc_ids: after a crash
    # between append and probe (or a deliberate re-probe of an already
    # ingested batch) the same rows exist on both sides — without this
    # anti-join every pair double-counts its shared bands and every
    # bucket size doubles, spuriously tripping max_bucket_size
    idx = (
        idx.join(
            F.broadcast(new_docs.select("doc_id").distinct()),
            "doc_id",
            "left_anti",
        )
        .select("doc_id", "band", "bucket", F.lit(False).alias("is_new"))
    )
    probe = F.broadcast(banded_new.select("band", "bucket").distinct())
    rows = idx.join(probe, ["band", "bucket"], "left_semi").unionByName(banded_new)
    return _pairs_from_banded(rows, max_bucket_size, new_only=True)


def lsh_pairs_vs_index(
    spark,
    path: str,
    new_docs: DataFrame,
    text_col: str = "text",
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Incremental LSH candidate pairs: new batch vs a materialized
    index AND within the new batch — exactly the pairs
    ``minhash_lsh_pairs(corpus ∪ batch)`` would emit that touch ≥1
    batch doc (corpus-internal pairs were already known when the index
    was built; re-emitting them per increment is wasted work).

    Plan shape: signatures are computed for the BATCH ONLY; the index
    side is pruned to the batch's buckets with a broadcast semi-join
    before the pair join (a daily increment touches a tiny fraction of
    the corpus's buckets — the big side is pruned map-side, no
    shuffle). ``max_bucket_size`` counts over the pruned-union rows,
    which equals the full-union count for every bucket that can emit an
    incremental pair — cap semantics match the batch variant."""
    return lsh_pairs_vs_index_df(
        spark.read.parquet(path), new_docs, text_col, k, bands, max_bucket_size
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Banded LSH: docs sharing any band bucket become candidate pairs.
    Scale: the band→bucket groupBy-join touches only signatures (never
    text); hot buckets (boilerplate signatures shared by thousands of
    docs) would make the self-join quadratic — ``max_bucket_size`` drops
    them (standard web-dedup practice: a bucket that big is template
    noise, not near-duplication), and AQE skew-join splits the rest."""
    if k % bands != 0:
        raise ValueError(
            f"k={k} not divisible by bands={bands}: trailing signature "
            "columns would be computed but silently excluded from every "
            "bucket, weakening LSH recall"
        )
    sigs = minhash_signatures(df, text_col, k)
    banded = banded_rows(sigs, k, bands)
    return _pairs_from_banded(banded, max_bucket_size)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    n: int = 2,
    min_jaccard: float = 0.3,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard over word n-grams via the common-shingle join:
    |A∩B| from a self-join on shingle, |A|,|B| from per-doc counts.

    Scale: the shingle self-join is the classic quadratic risk — a
    shingle appearing in d docs contributes d^2 join rows, so ONE
    boilerplate shingle ('all rights' in half the web) melts the
    stage. ``max_shingle_df`` drops shingles whose document frequency
    exceeds the cap from the whole universe (both the intersection AND
    the per-doc sizes, so the result is exact Jaccard over the reduced
    shingle set — the same treatment minhash_lsh_pairs gives hot
    buckets via max_bucket_size: template noise carries no
    near-duplication signal). At 100 TB this cap is mandatory; LSH
    prefiltering (minhash_lsh_pairs) bounds the candidate set further.

    r2: the per-doc sorted distinct token array is built IN-ROW
    (array_sort(array_distinct(split))) — value-identical to the old
    normalized_tokens().distinct() + collect_list path but with zero
    shuffles where that path paid two (the (doc_id, tok) dedup exchange
    and the collect_list regroup)."""
    toks = df.select(
        "doc_id",
        F.array_sort(
            F.array_remove(_distinct_token_array(text_col), "")
        ).alias("toks"),
    )
    # n-grams over the doc's sorted distinct tokens — deterministic and
    # SQL-reproducible (set semantics, not positional shingles). Docs
    # with fewer than n tokens produce NO grams (the old greatest()
    # clamp emitted one truncated short gram, which made any two sub-n
    # docs with equal token sets jaccard=1.0 "near-duplicates" despite
    # having zero actual n-grams).
    grams = (
        toks.where(F.size("toks") >= n)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - n),
                    lambda i: F.array_join(F.slice(F.col("toks"), i + 1, n), " "),
                )
            ).alias("gram"),
        )
        .where(F.length("gram") > 0)
        # no .distinct(): windows over a strictly-increasing (sorted
        # array_distinct) token array can never repeat — window j > i
        # starts with a strictly greater token — so the dedup exchange
        # it cost was a no-op by construction
    )
    if max_shingle_df is not None:
        keep = (
            grams.groupBy("gram")
            .agg(F.count("*").alias("__df"))
            .where(F.col("__df") <= max_shingle_df)
            .drop("__df")
        )
        grams = grams.join(keep, "gram", "left_semi")
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    a, b = grams.alias("a"), grams.alias("b")
    inter = (
        a.join(b, "gram")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_grams").alias("ga"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_grams").alias("gb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a", "doc_b",
            F.round(
                F.col("n_common") / (F.col("ga") + F.col("gb") - F.col("n_common")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= min_jaccard)
    )


def simhash64(df: DataFrame, text_col: str = "text", bits: int = 16) -> DataFrame:
    """SimHash: per-token md5 → first `bits` bits; signature bit j set
    iff Σ_tokens (±1 for bit j) > 0. Exploding bit positions keeps it
    SQL-reproducible; the 100 TB path replaces the explode with a
    vectorized pandas UDF doing the same popcount math in numpy.

    bits ≤ 60 derives the token hash from one conv() (15 hex chars is
    the most a signed long can take — conv of 16 chars overflows and
    Spark 4's default ANSI mode fails the cast); 61-64 derives two
    32-bit words instead. Bit 63 lands on the sign bit, so full-64
    signatures are negative for docs with that bit set — consistent in
    both engines, and no sum overflow (distinct powers of two with
    2^63 ≡ LONG_MIN can never overflow a two's-complement sum)."""
    if not 1 <= bits <= 64:
        raise ValueError(f"bits must be in 1..64, got {bits}")
    toks = df.select(
        "doc_id", F.explode(_distinct_token_array(text_col)).alias("tok")
    ).where(F.col("tok") != "")
    pos = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("j")
    if bits <= 60:
        toks = toks.withColumn(
            "h",
            F.conv(F.substring(F.md5(F.col("tok")), 1, (bits + 3) // 4), 16, 10).cast("long"),
        )
        bit_is_set = F.expr("shiftright(h, cast(j as int)) & 1") == 1
        contrib = toks.select("doc_id", pos, F.col("h")).select(
            "doc_id", "j",
            F.when(bit_is_set, 1).otherwise(-1).alias("c"),
        )
    else:
        toks = toks.withColumns(
            {
                "h1": F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long"),
                "h2": F.conv(F.substring(F.md5(F.col("tok")), 9, 8), 16, 10).cast("long"),
            }
        )
        bit_is_set = (
            F.when(
                F.col("j") < 32,
                F.expr("shiftright(h1, cast(j as int)) & 1"),
            ).otherwise(F.expr("shiftright(h2, cast(j - 32 as int)) & 1"))
            == 1
        )
        contrib = toks.select("doc_id", pos, "h1", "h2").select(
            "doc_id", "j",
            F.when(bit_is_set, 1).otherwise(-1).alias("c"),
        )
    return (
        contrib.groupBy("doc_id", "j")
        .agg(F.sum("c").alias("s"))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("s") > 0, F.expr("shiftleft(cast(1 as bigint), cast(j as int))")).otherwise(0)
            ).alias("simhash")
        )
    )


def simhash64_np(df: DataFrame, text_col: str = "text", bits: int = 16) -> DataFrame:
    """The 100 TB SimHash path: identical signatures to ``simhash64``
    (pinned by ``test_simhash_np_matches_explode``), computed
    shuffle-free in one Arrow-batched pandas UDF. The explode form
    pushes |tokens|·bits rows through a (doc_id, j) shuffle — at 100 TB
    that is the dominant cost; here the ±1 popcount math happens in a
    numpy matrix per batch and the only data movement is the document
    scan itself. Tokenization and per-token md5 bit derivation mirror
    ``normalized_tokens``/``simhash64`` exactly (lowercase, alnum-only,
    distinct tokens; hex-prefix hash words, sign-bit wrap at bit 63)."""
    if not 1 <= bits <= 64:
        raise ValueError(f"bits must be in 1..64, got {bits}")

    import hashlib
    import re as _re

    import numpy as np
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    nhex = (bits + 3) // 4

    @pandas_udf(LongType())
    def _sig(texts: pd.Series) -> pd.Series:
        shifts = np.arange(bits, dtype=np.uint64)

        def one(text: str | None) -> int:
            toks = set() if text is None else {
                t for t in _re.sub(r"[^a-z0-9 ]", " ", text.lower()).split() if t
            }
            if not toks:
                return 0
            digs = [hashlib.md5(t.encode()).hexdigest() for t in toks]
            if bits <= 60:
                h = np.array([int(d[:nhex], 16) for d in digs], dtype=np.uint64)
                bitmat = (h[:, None] >> shifts[None, :]) & 1
            else:
                h1 = np.array([int(d[:8], 16) for d in digs], dtype=np.uint64)
                h2 = np.array([int(d[8:16], 16) for d in digs], dtype=np.uint64)
                lo = (h1[:, None] >> shifts[None, :32]) & 1
                hi = (h2[:, None] >> (shifts[None, 32:bits] - 32)) & 1
                bitmat = np.concatenate([lo, hi], axis=1)
            s = (2 * bitmat.astype(np.int64) - 1).sum(axis=0)
            total = int(((s > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64))
            return total - (1 << 64) if total >= (1 << 63) else total

        return texts.map(one)

    return df.select("doc_id", _sig(F.col(text_col)).alias("simhash"))


def simhash(
    df: DataFrame, text_col: str = "text", bits: int = 16, engine: str = "auto"
) -> DataFrame:
    """SimHash dispatch — the production entry point. Both engines
    produce IDENTICAL signatures (pinned by
    ``test_simhash_np_matches_explode``); the choice is purely a plan
    shape: ``explode`` (simhash64) is whole-stage-codegen but shuffles
    |tokens|·bits contribution rows through a (doc_id, j) exchange,
    ``np`` (simhash64_np) is shuffle-free Arrow popcount math. A size
    gate was considered and MEASURED OUT: steady-state best-of-3 at
    sf0.001 reads explode 0.56s vs np 0.27s and at sf0.1 explode 1.75s
    vs np 0.56s (cold 12.0 vs 2.6 — the explode plan is also the
    bigger Janino compile) — there is no size regime where the explode
    shuffle wins, so ``auto`` = np at every size. The explode form
    stays as the SQL-reproducible twin (it IS the DuckDB oracle's
    formulation) and for plans that must stay Python-worker-free."""
    if engine == "auto":
        engine = "np"
    if engine == "np":
        return simhash64_np(df, text_col, bits)
    if engine == "explode":
        return simhash64(df, text_col, bits)
    raise ValueError(f"engine must be auto|np|explode, got {engine!r}")


def _star_round(edges: DataFrame, large: bool) -> DataFrame:
    """One star-contraction step over a distinct (u, v) edge set with
    u > v. Treats the graph as undirected (symmetrizes), computes per
    center u the component-local minimum m = min(neighbors ∪ {u}), and
    rewires: large-star points every strictly-larger neighbor at m,
    small-star points every ≤-neighbor and u itself at m. Both emit
    only (bigger, smaller) edges, so the invariant is preserved."""
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("__mn"))
        .withColumn("m", F.least(F.col("u"), F.col("__mn")))
        .select("u", "m")
    )
    j = sym.join(mins, "u")
    if large:
        out = j.where(F.col("v") > F.col("u")).select(
            F.col("v").alias("u"), F.col("m").alias("v")
        )
    else:
        out = (
            j.where(F.col("v") <= F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mins.select(F.col("u"), F.col("m").alias("v")))
        )
    return out.where(F.col("u") != F.col("v")).distinct()


def _edge_fingerprint(edges: DataFrame) -> tuple[int, int]:
    """O(1)-driver fixpoint probe: (row count, xor of per-edge 64-bit
    hashes). Sets are distinct, so multiset anomalies can't cancel; a
    false fixpoint needs an xxhash64 xor collision between successive
    edge sets of equal size — negligible, and any such run would be
    caught by the label-vs-oracle tests."""
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return row["n"], row["h"]


def duplicate_clusters(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_rounds: int = 30,
) -> DataFrame:
    """Connected components over a near-duplicate pair list → cluster
    labels: (doc_id, cluster_id) where cluster_id is the minimum doc_id
    of the component under the id column's natural ordering
    (lexicographic for strings, numeric for ints — deterministic either
    way). The missing third stage of the
    standard web-scale dedup pipeline (minhash → LSH pairs → CLUSTERS →
    canonical keep, as in C4/RefinedWeb-style corpus curation); the
    reference never needs it because it dedups URLs, not content.

    Algorithm: alternating large-star / small-star contraction
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    O(log n) rounds even on pathological chain graphs, each round a
    constant number of key shuffles on the edge set, nothing
    driver-side but two scalars per half-step. Naive min-label
    propagation (the obvious join-loop) needs O(diameter) rounds,
    which a 10k-doc chained near-dup family would turn into 10k
    shuffles at 100 TB; star contraction is the scale-correct choice.
    Convergence: a full round where neither half-step changes the edge
    set (both probed by count+hash fingerprint, never a driver
    collect of edges). At the fixpoint the edge set IS the star forest
    (every doc points at its component minimum), so labels read off
    directly. Only docs appearing in ≥1 pair are labeled — callers
    left-join and coalesce(cluster_id, doc_id) for singletons."""
    edges = (
        pairs.select(
            F.greatest(F.col(a_col), F.col(b_col)).alias("u"),
            F.least(F.col(a_col), F.col(b_col)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .transform(checkpoint_cut, eager=True)
    )
    fp = _edge_fingerprint(edges)
    for _ in range(max_rounds):
        grown = _star_round(edges, large=True).transform(checkpoint_cut, eager=True)
        fp_l = _edge_fingerprint(grown)
        shrunk = _star_round(grown, large=False).transform(checkpoint_cut, eager=True)
        fp_s = _edge_fingerprint(shrunk)
        edges = shrunk
        if fp_l == fp and fp_s == fp_l:
            break
        fp = fp_s
    else:
        raise RuntimeError(
            f"duplicate_clusters did not converge in {max_rounds} rounds"
        )
    roots = edges.select(F.col("v")).distinct()
    return edges.select(
        F.col("u").alias("doc_id"), F.col("v").alias("cluster_id")
    ).union(
        roots.select(F.col("v").alias("doc_id"), F.col("v").alias("cluster_id"))
    )


def dedup_keep(
    docs: DataFrame, clusters: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Canonical-representative filter: drop every doc whose cluster
    label is some OTHER doc (the component minimum survives). One
    anti-join against the (small) non-canonical label set; docs not in
    any cluster pass through untouched."""
    drop = clusters.where(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias(id_col)
    )
    return docs.join(drop, id_col, "left_anti")
