"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship frontier-pop→fetch-batch pipeline over
sf0.001. ``queries()`` — one entry per implemented operator family from
SURVEY.md §2 (+ the training-data ops). ``oracle_sql()`` — exact DuckDB
equivalents; every hash-sensitive column is aliased identically and
floats are computed with the same fold order / rounding in both
engines. The flagship crawl wave loop is value-verified against an
independent recursive-CTE BFS oracle; only the genuinely
engine-specific HLL sketch estimate omits the oracle → rows-only (the
mapInPandas media decode is oracle-checked: its fake-codec wire format
is deterministic, so the expected header fields are SQL-statable).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _urls_from_orders(orders: DataFrame) -> DataFrame:
    """Deterministic URL corpus synthesized from the orders table —
    identical string arithmetic exists in URLS_CTE below so Spark and
    DuckDB operate on the same inputs."""
    k = F.col("o_orderkey")
    dom = F.concat(F.lit("site"), (F.col("o_custkey") % 7).cast("string"), F.lit(".test"))
    branch = k % 10
    suffix = (
        F.when(branch == 0, F.concat(F.lit("/img/photo-"), k.cast("string"), F.lit(".jpg")))
        .when(branch == 1, F.concat(F.lit("/product-"), k.cast("string"), F.lit("#reviews")))
        .when(branch == 2, F.concat(F.lit("/products?page="), (k % 50).cast("string")))
        .otherwise(F.concat(F.lit("/product-"), k.cast("string")))
    )
    url = F.when(
        branch == 3,
        F.concat(F.lit("http://offsite.example/item-"), k.cast("string")),
    ).otherwise(F.concat(F.lit("https://"), dom, suffix))
    return orders.select(
        F.col("o_orderkey").alias("k"), url.alias("url")
    )


URLS_CTE = """
urls AS (
  SELECT o_orderkey AS k,
         (o_custkey % 7) AS dn,
         CASE WHEN o_orderkey % 10 = 3
              THEN 'http://offsite.example/item-' || o_orderkey
              ELSE 'https://site' || (o_custkey % 7) || '.test' ||
                   CASE o_orderkey % 10
                     WHEN 0 THEN '/img/photo-' || o_orderkey || '.jpg'
                     WHEN 1 THEN '/product-' || o_orderkey || '#reviews'
                     WHEN 2 THEN '/products?page=' || (o_orderkey % 50)
                     ELSE '/product-' || o_orderkey
                   END
         END AS url
  FROM orders
)
"""

# porter-lite stemmer steps, kept in the operator module next to the
# Spark expression so the two rule lists cannot drift
from kryptone_spark.operators.seo import (  # noqa: E402
    PORTER_LITE_SQL as _SEO_STEP_C,
    PORTER_LITE_STEP_A_SQL as _SEO_STEP_A,
    PORTER_LITE_STEP_B_SQL as _SEO_STEP_B,
)

# shared tokenizer CTE for the text/dedup oracles (mirrors
# kryptone_spark.operators.dedup.normalized_tokens)
TOKS_CTE = """
toks AS (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id,
           unnest(string_split_regex(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +')) AS tok
    FROM documents
  ) WHERE tok <> ''
)
"""


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthesize a frontier from sf0.001 orders, run the
    stateless admission predicates, politeness-schedule fetch batches
    (rank ≤ 8 per domain, 25 s spacing)."""
    return _fetch_batch_pipeline(spark, "/root/testdata/sf0.001")


def _fetch_batch_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kryptone_spark.functions import urls as U

    urls = _urls_from_orders(_load(spark, sf_dir, "orders"))
    host = U.host(F.col("url"))
    kept = urls.where(
        ~U.has_fragment(F.col("url"))
        & ~U.is_image(F.col("url"), (".jpg",))
        & (host != "offsite.example")
    ).select("url", host.alias("domain"))
    w = Window.partitionBy("domain").orderBy("url")
    return (
        kept.withColumn("rank_in_domain", F.row_number().over(w))
        .where(F.col("rank_in_domain") <= 8)
        .withColumn(
            "fetch_at_s",
            ((F.col("rank_in_domain") - 1) * F.lit(25.0)).cast("double"),
        )
        .orderBy("domain", "rank_in_domain")
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_url_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parser (F8/F9 family) against reconstructed components."""
    from kryptone_spark.functions import urls as U

    urls = _urls_from_orders(_load(spark, sf_dir, "orders"))
    c = F.col("url")
    return urls.select(
        "k", "url",
        U.host(c).alias("host"),
        U.path(c).alias("path"),
        U.query(c).alias("query"),
        U.fragment(c).alias("fragment"),
        U.is_secured(c).alias("is_secured"),
    )


def q_url_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4/P6/P8 stateless admission verdicts via the real admission
    pipeline, audited (A10)."""
    from kryptone_spark.config import CrawlConfig
    from kryptone_spark.operators import admission

    urls = _urls_from_orders(_load(spark, sf_dir, "orders")).select("url")
    config = CrawlConfig(
        start_urls=["https://site0.test/"],
        ignore_images=True,
        image_extensions=(".jpg",),
    )
    out = admission.admit(urls, config, allow_home=False)
    return (
        out.groupBy(F.coalesce(F.col("reject_reason"), F.lit("kept")).alias("reason"))
        .agg(F.count("*").alias("n"))
    )


def q_frontier_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 politeness window: per-domain rank + virtual fetch offsets."""
    return _fetch_batch_pipeline(spark, sf_dir)


def q_seen_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 seen anti-join at query granularity."""
    urls = _urls_from_orders(_load(spark, sf_dir, "orders"))
    frontier = urls.where(F.col("k") % 10 >= 4).select("url")
    seen = urls.where(F.col("k") % 2 == 0).select("url")
    from kryptone_spark.functions import urls as U

    return (
        frontier.join(seen, "url", "left_anti")
        .groupBy(U.host(F.col("url")).alias("domain"))
        .agg(F.count("*").alias("n"))
    )


def q_seen_antijoin_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 seen anti-join over the BUCKETED membership layout
    (plans/bucketed.py): byte-identical verdicts to seen_antijoin —
    the layout changes the PLAN (state-side Exchange eliminated; the
    scan-level property is asserted here before returning), never the
    answer. The merge hint pins the sort-merge shape at oracle scale,
    where the tiny seen side would otherwise broadcast and leave the
    bucketed scan unused. Reference: the in-memory seen set
    (/root/reference/kryptone/base.py:292-295) re-expressed as a
    url-clustered table."""
    from kryptone_spark.functions import urls as U
    from kryptone_spark.plans.bucketed import (
        is_bucketed_scan,
        save_membership_bucketed,
    )

    import uuid

    urls = _urls_from_orders(_load(spark, sf_dir, "orders"))
    frontier = urls.where(F.col("k") % 10 >= 4).select("url")
    seen = urls.where(F.col("k") % 2 == 0).select("url")
    # per-run unique managed table (a fixed name orphans its warehouse
    # dir across sessions — the in-memory catalog forgets it but the dir
    # persists and CREATE refuses with LOCATION_ALREADY_EXISTS);
    # dropped in the finally, so no rmtree of shared warehouse contents
    tbl = f"q_seen_bucketed_{uuid.uuid4().hex[:8]}"
    save_membership_bucketed(seen, tbl, n_buckets=4)
    try:
        joined = frontier.join(
            spark.table(tbl).hint("merge"), "url", "left_anti"
        )
        # explicit raise, not assert: the plan-shape gate must survive -O
        if not is_bucketed_scan(joined):
            raise RuntimeError("bucketed layout must reach the scan")
        # eager O(#domains) checkpoint so the table can be dropped before
        # the driver consumes the returned DataFrame
        return (
            joined.groupBy(U.host(F.col("url")).alias("domain"))
            .agg(F.count("*").alias("n"))
            .localCheckpoint(eager=True)
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def q_url_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4/S6 URL generators: sweep ?page=1..10 per region seed."""
    region = _load(spark, sf_dir, "region")
    return region.select(
        F.explode(F.sequence(F.lit(1), F.lit(10))).alias("page"),
        F.col("r_regionkey").alias("rk"),
    ).select(
        "rk", "page",
        F.concat(
            F.lit("https://shop"), F.col("rk").cast("string"),
            F.lit(".test/list?page="), F.col("page").cast("string"),
        ).alias("url"),
    )


def q_url_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 decompose_path: segment count + first segment."""
    from kryptone_spark.functions import urls as U

    urls = _urls_from_orders(_load(spark, sf_dir, "orders"))
    segs = U.decompose_path(F.col("url"))
    return urls.select(
        "k",
        F.size(segs).alias("n_segments"),
        F.element_at(segs, 1).alias("seg1"),
    )


def q_file_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13 filename/directory derivation (functions/files.py, re-
    expressing utils/functions.py:12-79) over a deterministic
    path+breadcrumb corpus from part: media directory from the URL path
    (exclude 'shop', punctuation stripped keep '_', '-'→'_', last
    segment dropped), directory from the breadcrumb trail (all
    punctuation stripped, spaces→'_'), and the deterministic
    md5-derived twin of create_filename."""
    from kryptone_spark.functions import files as FF

    p = _load(spark, sf_dir, "part")
    key = F.col("p_partkey").cast("string")
    path = F.concat(
        F.lit("/shop/"), F.col("p_brand"), F.lit("/"), F.col("p_type"),
        F.lit("/item-"), key, F.lit(".html"),
    )
    crumbs = F.concat_ws(
        " > ", F.col("p_brand"), F.col("p_type"), F.col("p_name")
    )
    return p.select(
        F.col("p_partkey").alias("k"),
        FF.directory_from_url(path, exclude=("shop",)).alias("dir_url"),
        FF.directory_from_breadcrumbs(crumbs).alias("dir_crumbs"),
        FF.derived_filename(F.col("p_partkey"), 8, extension="jpg").alias("fname"),
    )


def q_lineitem_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-family flagship agg (TPC-H Q1 shape) with exact decimal sums."""
    li = _load(spark, sf_dir, "lineitem")
    d = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(d("l_quantity")).cast("double"), 2).alias("sum_qty"),
            F.round(F.sum(d("l_extendedprice")).cast("double"), 2).alias("sum_base_price"),
            F.round(
                F.sum(
                    (d("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - d("l_discount")))
                ).cast("double"), 2,
            ).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


def q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-family join + W2 top-k: top 10 orders by exact revenue."""
    li = _load(spark, sf_dir, "lineitem")
    orders = _load(spark, sf_dir, "orders")
    rev = li.groupBy("l_orderkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
        ).alias("rev_d")
    )
    from kryptone_spark.functions.rank import ranked_top_k

    # top-k FIRST (TakeOrderedAndProject on the aggregated side), THEN
    # broadcast the 10 surviving keys to orders: under FK integrity
    # (every l_orderkey exists in orders — TPC-H guarantee) the answer
    # is identical, and the orders table never shuffles — at 100x scale
    # the join side is 10 rows, not an exchange of the full table.
    # l_orderkey == o_orderkey on the join, so tie-breaking on it
    # pre-join matches the old post-join ordering exactly.
    top = ranked_top_k(rev, [F.desc("rev_d"), F.asc("l_orderkey")], 10)
    return (
        F.broadcast(top)
        .join(orders, top["l_orderkey"] == orders["o_orderkey"])
        .select(
            "o_orderkey", "o_orderpriority",
            F.round(F.col("rev_d").cast("double"), 2).alias("revenue"),
            F.col("rnk").alias("rnk"),
        )
    )


def q_events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


def q_events_topk_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 top-k per key: top 3 events by value per user."""
    ev = _load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("user_id", "event_id", F.round("value", 2).alias("value"), "rnk")
    )


def q_customer_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3/J semi join: customers with orders, per nation."""
    c = _load(spark, sf_dir, "customer")
    o = _load(spark, sf_dir, "orders")
    return (
        c.join(o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_semi")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n"))
    )


def q_part_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 anti join: parts never shipped."""
    p = _load(spark, sf_dir, "part")
    li = _load(spark, sf_dir, "lineitem")
    return (
        p.join(li.select(F.col("l_partkey").alias("p_partkey")), "p_partkey", "left_anti")
        .select("p_partkey", "p_brand")
    )


def q_user_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1-T3 set algebra on user populations."""
    ev = _load(spark, sf_dir, "events")
    buyers = ev.where(F.col("event_type") == "purchase").select("user_id").distinct()
    errs = ev.where(F.col("event_type") == "error").select("user_id").distinct()
    return spark.createDataFrame(
        [], "op string, n long"
    ).unionByName(
        buyers.intersect(errs).agg(F.lit("intersect").alias("op"), F.count("*").alias("n"))
    ).unionByName(
        buyers.exceptAll(errs).agg(F.lit("except").alias("op"), F.count("*").alias("n"))
    ).unionByName(
        buyers.union(errs).distinct().agg(F.lit("union").alias("op"), F.count("*").alias("n"))
    )


def q_scalar_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F5 scalar text functions over part names."""
    from kryptone_spark.functions import text as TXT

    p = _load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower(F.regexp_replace(F.col("p_name"), " ", "-")).alias("slug"),
        TXT.normalize_spaces(F.col("p_name")).alias("clean"),
        F.length("p_name").alias("n_chars"),
        TXT.parse_price(
            F.concat(F.floor("p_retailprice").cast("string"), F.lit("€"), F.lit("50"))
        ).alias("price"),
    )


def q_orders_by_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 date functions: weekday (Mon=0) / month histogram."""
    from kryptone_spark.functions import dates as D

    o = _load(spark, sf_dir, "orders")
    return o.groupBy(
        D.weekday(F.col("o_orderdate")).alias("wd"),
        D.month(F.col("o_orderdate")).alias("mo"),
    ).agg(F.count("*").alias("n"))


def q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 JSON access: props.k aggregated per type."""
    ev = _load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.max(k).alias("max_k")
    )


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-shaped windowed agg (batch form): events per hour.
    The identical plan runs under readStream + watermark (see
    kryptone_spark/streaming)."""
    ev = _load(spark, sf_dir, "events")
    return ev.groupBy(
        F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_epoch")
    ).agg(F.count("*").alias("n"), F.round(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2).alias("sum_value"))


def q_docs_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kryptone_spark.operators import dedup

    return dedup.exact_dedup(_load(spark, sf_dir, "documents"))


def q_docs_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus line dedup + boilerplate cap (dedup.dedup_lines):
    the flat documents are re-lined deterministically (8-token chunks
    joined by newline — the same construction stated in the oracle), so
    the operator's keep-first and line-df-cap rules are exercised on
    genuinely repeated lines (the synthetic corpus's word soup repeats
    8-grams across docs)."""
    from kryptone_spark.operators import dedup

    docs = _load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    lines = F.transform(
        F.sequence(F.lit(0), F.ceil(F.size(toks) / F.lit(8.0)).cast("int") - 1),
        lambda i: F.array_join(F.slice(toks, i * 8 + 1, 8), " "),
    )
    chunked = docs.select(
        "doc_id", F.array_join(lines, "\n").alias("text")
    )
    out = dedup.dedup_lines(chunked, max_line_df=4, min_line_len=1)
    return out.select("doc_id", "n_lines", "n_kept", "text")


def q_docs_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kryptone_spark.operators import dedup

    return dedup.minhash_signatures(_load(spark, sf_dir, "documents"))


def q_docs_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kryptone_spark.operators import dedup

    return dedup.minhash_lsh_pairs(
        _load(spark, sf_dir, "documents"), max_bucket_size=50
    )


def q_docs_lsh_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup through the INGEST-TIME MinHash index
    (operators/dedup.py:materialize_minhash_index): the corpus slice
    (doc_id%5!=0) is banded once into a persisted index; the new batch
    (doc_id%5==0) is minhashed alone and probed against it — emitting
    exactly the minhash_lsh_pairs(corpus ∪ batch) pairs that touch ≥1
    batch doc. The oracle restates the full-union pairs and filters to
    the same incremental set."""
    from kryptone_spark.operators import dedup

    docs = _load(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    batch = docs.where(F.col("doc_id") % 5 == 0)
    path = _index_dir(sf_dir, "mhidx")
    dedup.materialize_minhash_index(corpus, path)
    return dedup.lsh_pairs_vs_index(spark, path, batch, max_bucket_size=50)


def q_docs_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full dedup pipeline: minhash → banded LSH pairs → connected
    components (alternating star contraction) → per-doc cluster label +
    canonical flag. Every doc appears; singletons label themselves.
    Oracle: same pairs in SQL, then a recursive-CTE transitive closure
    with min-label aggregation — an independent CC algorithm, so the
    star contraction's fixpoint is value-checked, not replayed."""
    from kryptone_spark.operators import dedup

    docs = _load(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, max_bucket_size=50)
    labels = dedup.duplicate_clusters(pairs)
    return (
        docs.select("doc_id")
        .join(labels, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
        )
        .withColumn("is_canonical", F.col("doc_id") == F.col("cluster_id"))
    )


def q_docs_sample_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-mix rebalance: per-language keep
    fractions (en .5, es .25, zh 1.0, everything else .1) driven by a
    portable md5 bucket — no rand(), so the sample is reproducible on
    any cluster size and the oracle re-derives the same selection."""
    from kryptone_spark.operators import curation

    docs = _load(spark, sf_dir, "documents").select("doc_id", "lang")
    out = curation.stratified_sample(
        docs, {"en": 0.5, "es": 0.25, "zh": 1.0},
        strata_col="lang", default_fraction=0.1,
    )
    return out.withColumn(
        "bucket", curation.portable_bucket(F.col("doc_id"))
    )


def q_docs_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source rebalance at T=2 (expected kept counts
    ∝ n^0.5, downsample-only, most-boosted source keeps all rows) —
    operators/curation.py:temperature_mix. The oracle re-derives the
    per-source thresholds (pow/round/floor spelled identically) and the
    same portable md5 bucket per doc."""
    from kryptone_spark.operators import curation

    docs = _load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    kept = curation.temperature_mix(docs, temperature=2.0)
    return kept.groupBy("source").agg(
        F.count("*").alias("n_kept"), F.sum("n_chars").alias("chars_kept")
    )


def q_docs_shard_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard plan: docs in doc_id order fill 1000-token
    training shards; shard_id = floor(exclusive running sum / budget)
    via the two-phase global cumsum (range exchange + per-partition
    windows), never a single-task global window."""
    from kryptone_spark.functions import text as TXT
    from kryptone_spark.operators import curation

    docs = _load(spark, sf_dir, "documents").select(
        "doc_id", TXT.token_count(F.col("text")).alias("n_tokens")
    )
    return curation.pack_shards(docs, budget=1000, token_col="n_tokens")


def q_docs_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard with the hot-shingle cap exercised: tokens
    in >250 docs (stopwords at sf0.01's 500 docs) are dropped from the
    shingle universe — the cap that keeps the self-join from going
    quadratic on boilerplate at 100 TB."""
    from kryptone_spark.operators import dedup

    return dedup.ngram_jaccard_pairs(
        _load(spark, sf_dir, "documents"), n=1, min_jaccard=0.9,
        max_shingle_df=250,
    )


def q_docs_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kryptone_spark.operators import dedup

    # production dispatch (auto = the shuffle-free numpy path, measured
    # faster at every size); the oracle below is the explode form's SQL
    # twin — the two engines are signature-identical by pinned test, so
    # this query value-checks the np path against the explode math
    return dedup.simhash(_load(spark, sf_dir, "documents"), bits=16)


def q_docs_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kryptone_spark.operators import textstats

    docs = _load(spark, sf_dir, "documents")
    return textstats.lang_scores(docs).select(
        "doc_id", "lang", "lang_pred",
        "score_en", "score_es", "score_fr", "score_de", "score_zh",
    )


def q_docs_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kryptone_spark.operators import textstats

    return textstats.quality(_load(spark, sf_dir, "documents")).select("doc_id", "quality")


def q_docs_soft404(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft-404 curation gate (operators/textstats.py:soft404_stats) —
    pages answering 200 with an error body; engine-only (the reference
    trusts whatever Selenium rendered)."""
    from kryptone_spark.operators import textstats

    return textstats.soft404_stats(_load(spark, sf_dir, "documents")).select(
        "doc_id", "notfound_hit", "short_doc", "soft404_score"
    )


def q_docs_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kryptone_spark.operators import textstats

    return textstats.token_stats(_load(spark, sf_dir, "documents")).select(
        "doc_id", "n_ws_tokens", "n_bpe_tokens"
    )


def q_docs_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality gates (dup-word fraction +
    top-bigram fraction) — the degenerate-repetition scrub a training
    corpus runs before tokenization."""
    from kryptone_spark.operators import textstats

    return textstats.repetition_stats(_load(spark, sf_dir, "documents")).select(
        "doc_id", "n_words", "dup_word_frac", "n_bigrams", "top_bigram_frac"
    )


def q_docs_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scan + redaction over deterministic PII-bearing text
    synthesized from customer rows (name→email, c_phone, derived IPv4).
    Counts are taken on progressively-redacted text so kinds never
    double-count; one codegen projection, no shuffle."""
    from kryptone_spark.operators import pii

    c = _load(spark, sf_dir, "customer")
    key = F.col("c_custkey")
    text = F.concat(
        F.lit("Contact "),
        F.when(
            key % 3 != 0,
            F.concat(
                F.lower(F.regexp_replace(F.col("c_name"), "#", ".")),
                F.lit("@corp"), (key % 7).cast("string"), F.lit(".example"),
            ),
        ).otherwise(F.lit("the desk")),
        F.lit(" or call "),
        F.when(
            key % 4 != 0,
            F.concat(
                (key % 90 + 10).cast("string"), F.lit("-"),
                (key % 900 + 100).cast("string"), F.lit("-"),
                ((key * 7) % 900 + 100).cast("string"), F.lit("-"),
                ((key * 13) % 9000 + 1000).cast("string"),
            ),
        ).otherwise(F.lit("later")),
        F.lit(" from host "),
        F.when(
            key % 5 != 0,
            F.concat(
                F.lit("10."), (key % 256).cast("string"),
                F.lit(".0."), (key % 100).cast("string"),
            ),
        ).otherwise(F.lit("unknown")),
    )
    df = c.select(key.alias("c_custkey"), text.alias("text"))
    out = pii.pii_redact(pii.pii_scan(df), out_col="redacted")
    return out.select("c_custkey", "n_email", "n_phone", "n_ipv4", "redacted")


def q_docs_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: every doc whose positional 8-grams
    collide with a synthetic benchmark set (the first 120 chars of
    every 50th document) is flagged. The benchmark side is broadcast —
    the corpus never shuffles on gram."""
    from kryptone_spark.operators import decontam

    docs = _load(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 50 == 0).select(
        F.substring("text", 1, 120).alias("text")
    )
    return decontam.contamination(docs, bench, n=8).select(
        "doc_id", "n_grams", "n_contam_ngrams", "contaminated"
    )


def q_docs_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality scoring (CCNet-style perplexity proxy):
    vocab_size=16 on purpose so the OOV path is exercised by the
    corpus (its distinct-token count exceeds 16)."""
    from kryptone_spark.operators import textstats

    return textstats.unigram_lm_scores(
        _load(spark, sf_dir, "documents"), vocab_size=16
    ).select("doc_id", "n_toks", "mean_logprob")


def q_docs_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kryptone_spark.operators import textstats

    return textstats.fingerprints(_load(spark, sf_dir, "documents")).select(
        "doc_id", "fp_md5"
    )


def q_docs_wordfreq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/A5/W2 word frequency over the flat documents table."""
    docs = _load(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(
            F.split(F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", " "), " +")
        ).alias("word")
    ).where(F.col("word") != "")
    counts = toks.groupBy("word").agg(F.count("*").alias("freq"))
    from kryptone_spark.functions.rank import ranked_top_k

    return ranked_top_k(counts, [F.desc("freq"), F.asc("word")], 20)


def q_docs_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6-A8 TF-IDF over the flat documents table (top term per doc)."""
    docs = _load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.split(F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", " "), " +")
        ).alias("term"),
    ).where(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("n"))
    tf = tf.withColumn("tf", F.col("n") / F.sum("n").over(Window.partitionBy("doc_id")))
    nd = docs.select(F.countDistinct("doc_id").alias("nd"))
    dfq = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = dfq.crossJoin(F.broadcast(nd)).select(
        "term", F.log(F.col("nd") / (1 + F.col("df"))).alias("idf")
    )
    scored = tf.join(idf, "term").select(
        "doc_id", "term", F.round(F.col("tf") * F.col("idf"), 8).alias("tfidf")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return scored.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") == 1).drop("rnk")


def q_emb_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN baseline: exact cosine top-5 for query vectors 0..2."""
    from kryptone_spark.operators import simsearch

    emb = _load(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.expr("transform(embedding, x -> cast(x as double))")
    )
    queries = emb.where("vec_id < 3").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return simsearch.brute_force_topk(emb, queries, k=5)


def q_emb_label_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector math JVM-side: mean L2 norm per label."""
    from kryptone_spark.operators.simsearch import _norm

    emb = _load(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.expr("transform(embedding, x -> cast(x as double))")
    )
    return emb.groupBy("label").agg(
        F.count("*").alias("n"),
        F.round(F.avg(_norm(F.col("embedding"))), 6).alias("avg_norm"),
    )


# ---- Spark-only (no SQL oracle → rows-only check) -------------------------

def _interleaved_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic interleaved documents (the input_hint shape:
    doc_id + ordered spans of kind text/link/image/email) synthesized
    from the flat documents table — identical arithmetic in the
    DOCS_SPANS oracle CTE."""
    d = _load(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    mk = lambda kind, text, ref, off: F.struct(
        F.lit(kind).alias("kind"), text.alias("text"),
        ref.alias("media_ref"), F.lit(off).cast("int").alias("offset"),
    )
    return d.select(
        did.alias("doc_id"),
        F.array(
            mk("text", F.substring("text", 1, 40), F.lit(""), 0),
            mk("link", F.lit("next"),
               F.concat(F.lit("https://docs.test/doc-"), ((F.col("doc_id") + 1) % 500).cast("string")), 1),
            mk("text", F.substring("text", 41, 40), F.lit(""), 2),
            mk("image", F.concat(F.lit("alt-"), did),
               F.concat(F.lit("https://img.test/i-"), did, F.lit(".jpg")), 3),
            mk("email", F.concat(F.lit("c"), did, F.lit("@docs.test")), F.lit(""), 4),
        ).alias("spans"),
    )


def q_doc_spans_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7/S8/S9 + F7 over the interleaved span shape: per page, the
    document-order text join, out-link, image (alt, src) and email —
    the input_hint's span-sequence invariant under the oracle gate."""
    from kryptone_spark.operators import extract

    docs = _interleaved_docs(spark, sf_dir)
    text = extract.page_text(docs)
    links = extract.page_links(docs).groupBy(F.col("src_url").alias("doc_id")).agg(
        F.count("*").alias("n_links"), F.min("url").alias("first_link")
    )
    images = extract.page_images(docs).select(
        F.col("page_url").alias("doc_id"), F.col("alt"), F.col("src")
    )
    emails = extract.page_emails(docs).groupBy("doc_id").agg(
        F.min("email").alias("email")
    )
    return (
        text.join(links, "doc_id").join(images, "doc_id").join(emails, "doc_id")
    )


def q_spans_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interleaved-span integrity audit over the input_hint shape, with
    deterministic corruption so both verdicts fire: every 7th doc gets
    a non-monotonic first offset, every 11th an empty image media_ref.
    The oracle states the closed-form expected audit per doc_id."""
    from kryptone_spark.operators import extract

    docs = _interleaved_docs(spark, sf_dir)
    did = F.col("doc_id").cast("long")
    corrupted = docs.select(
        "doc_id",
        F.transform(
            F.col("spans"),
            lambda sp, i: F.struct(
                sp["kind"].alias("kind"),
                sp["text"].alias("text"),
                F.when(
                    (did % 11 == 0) & (sp["kind"] == "image"), F.lit("")
                ).otherwise(sp["media_ref"]).alias("media_ref"),
                F.when((did % 7 == 0) & (i == 0), F.lit(3))
                .otherwise(sp["offset"]).cast("int").alias("offset"),
            ),
        ).alias("spans"),
    )
    return extract.span_audit(corrupted)


def q_interleave_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interleaving-mix profile (OBELICS-style composition stats) over
    VARIABLE interleaved docs: span templates kept/dropped by doc_id
    arithmetic so media density, alt coverage, leading/trailing kind
    and text-run length all vary. The oracle rebuilds the same span
    lists in DuckDB and re-derives every stat generically (the
    max-text-run via non-text boundary gaps) — so the operator's fold
    math is cross-checked, not the corpus arithmetic."""
    from kryptone_spark.operators import extract

    return extract.interleave_profile(_variable_interleaved_docs(spark, sf_dir))


def _variable_interleaved_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIABLE-layout interleaved docs: span templates kept/dropped by
    doc_id arithmetic so media density, alt coverage, leading/trailing
    kind and text-run length all vary; restated span-for-span in the
    interleave_profile / image_text_pairs oracles."""
    d = _load(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("long")
    ds = F.col("doc_id").cast("string")
    mk = lambda kind, text, ref, off: F.struct(
        F.lit(kind).alias("kind"), text.alias("text"),
        ref.alias("media_ref"), F.lit(off).cast("int").alias("offset"),
    )
    all_spans = F.array(
        mk("text", F.substring("text", 1, 30), F.lit(""), 0),
        mk("image",
           F.when(did % 4 == 0, F.lit("")).otherwise(F.concat(F.lit("alt-"), ds)),
           F.concat(F.lit("https://img.test/i-"), ds, F.lit(".jpg")), 1),
        mk("text", F.substring("text", 31, 25), F.lit(""), 2),
        mk("link", F.lit("next"),
           F.concat(F.lit("https://docs.test/doc-"), ((did + 1) % 500).cast("string")), 3),
        mk("image", F.lit(""),
           F.concat(F.lit("https://img.test/j-"), ds, F.lit(".jpg")), 4),
        mk("email", F.concat(F.lit("c"), ds, F.lit("@docs.test")), F.lit(""), 5),
    )
    keep = lambda sp: (
        F.when(sp["offset"] == 0, did % 7 != 0)
        .when(sp["offset"] == 1, did % 2 == 0)
        .when(sp["offset"] == 4, did % 3 == 0)
        .when(sp["offset"] == 5, did % 5 == 0)
        .otherwise(F.lit(True))
    )
    return d.select(ds.alias("doc_id"), F.filter(all_spans, keep).alias("spans"))


def q_anchor_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text profile per destination (extract.anchor_profile):
    a 3-links-per-doc synthesis (shared 'home'/'read more' anchors +
    a per-doc text prefix) gives real collisions, ties, and anchor
    diversity; the oracle re-derives the top anchor with a
    row_number window — independent of the engine's arg-min fold."""
    from kryptone_spark.operators import extract

    docs = _load(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("long")
    ds = F.col("doc_id").cast("string")
    mk = lambda j, anchor: F.struct(
        F.concat(
            F.lit("https://docs.test/doc-"),
            ((did * 3 + j * 17) % 500).cast("string"),
        ).alias("url"),
        anchor.alias("anchor"),
    )
    links = docs.select(
        F.concat(F.lit("doc-"), ds).alias("src_url"),
        F.explode(
            F.array(
                mk(0, F.lit("home")),
                mk(1, F.substring("text", 1, 6)),
                mk(2, F.lit("read more")),
            )
        ).alias("l"),
    ).select("src_url", "l.url", "l.anchor")
    return extract.anchor_profile(links)


def q_image_text_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-text pair mining (operators/multimodal.py:
    image_context_pairs): nearest preceding/following text span per
    image, as one shuffle-free array fold. The oracle is an
    INDEPENDENT formulation — unnest + IGNORE NULLS window frames —
    so the neighbor semantics are cross-checked, not transcribed."""
    from kryptone_spark.operators import multimodal

    return multimodal.image_context_pairs(
        _variable_interleaved_docs(spark, sf_dir)
    )


def q_seo_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEO page-audit flags (contrib/seo.py:431-529) over deterministic
    interleaved pages synthesized from the documents table: head title
    with varying lengths (missing every 5th page), h1 with messy
    whitespace (missing every 3rd), meta description straddling the
    150-char budget, one alt-less image on even pages, JSON-LD every
    4th page. The audit itself is operators/seo.audit_pages — a single
    spans projection."""
    from kryptone_spark.operators import seo

    d = _load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    ds = did.cast("string")
    mk = lambda kind, text, ref, off: F.struct(
        F.lit(kind).alias("kind"), text.alias("text"),
        ref.alias("media_ref"), F.lit(off).cast("int").alias("offset"),
    )
    title = F.when(
        did % 5 != 0, F.expr("substr(text, 1, 30 + (doc_id % 3) * 20)")
    ).otherwise(F.lit(""))
    desc = F.expr("substr(text, 1, 100 + (doc_id % 4) * 20)")
    base = [
        mk("title", title, F.lit(""), 0),
        mk("description", desc, F.lit(""), 1),
        mk("image", F.when(did % 2 == 0, F.lit("")).otherwise(F.concat(F.lit("alt-"), ds)),
           F.concat(F.lit("https://img.test/a-"), ds, F.lit(".jpg")), 2),
        mk("image", F.lit("logo"), F.lit("https://img.test/logo.png"), 3),
    ]
    h1 = mk("h1", F.concat(F.lit("  Doc   "), ds, F.lit("  ")), F.lit(""), 4)
    ld = mk("ldjson", F.lit('{"@type": "Article"}'), F.lit(""), 5)
    spans = F.array(*base)
    spans = F.when(
        (did % 3 != 0) & (did % 4 == 0), F.concat(F.array(*base), F.array(h1, ld))
    ).when(did % 3 != 0, F.concat(F.array(*base), F.array(h1))).when(
        did % 4 == 0, F.concat(F.array(*base), F.array(ld))
    ).otherwise(F.array(*base))
    docs = d.select("doc_id", spans.alias("spans"))
    return seo.audit_pages(docs)


def q_docs_stemmed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stemmed word frequency (seo.py:407-429 create_stemmed_words +
    calculate_word_frequency): porter-lite stem inside codegen, top-20
    via TakeOrderedAndProject."""
    from kryptone_spark.operators import seo

    return seo.stemmed_word_frequency(
        _load(spark, sf_dir, "documents"), top_k=20
    ).withColumnRenamed("rank", "rnk")


def q_product_models(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scraped-item model shape (contrib/models.py:59-121 Product):
    typed StructType row with array fields, derived complex_name
    (models.py:115-121), collection-id regex (models.py:100-113),
    number_of_images property — the dataclass → DataFrame mapping."""
    from kryptone_spark.functions import text as TXT

    p = _load(spark, sf_dir, "part")
    pid = F.col("p_partkey").cast("string")
    url = F.concat(F.lit("https://shop.test/product-"), pid)
    images = F.sort_array(
        F.array(
            F.concat(F.lit("https://img.test/p"), pid, F.lit("-1.jpg")),
            F.concat(F.lit("https://img.test/p"), pid, F.lit("-2.jpg")),
        )
    )
    sizes = F.array(
        F.concat(F.lit("EU"), F.col("p_size").cast("string")),
        F.when(F.col("p_size") < 15, F.lit("S"))
        .when(F.col("p_size") < 30, F.lit("M"))
        .otherwise(F.lit("L")),
    )
    out = p.select(
        F.col("p_partkey").alias("product_id"),
        F.col("p_name").alias("name"),
        F.concat(
            F.regexp_replace(TXT.normalize_spaces(F.col("p_name")), " ", "_"),
            F.lit("_"), pid,
        ).alias("complex_name"),
        url.alias("url"),
        F.regexp_extract(url, "product-([0-9]+)", 1).alias("collection_id"),
        F.col("p_retailprice").alias("price"),
        # Array columns are pipe-serialized for the driver's pandas
        # canon (lists are unhashable in sort_values); element order is
        # deterministic (sort_array / construction order).
        F.array_join(images, "|").alias("images"),
        F.size(images).alias("number_of_images"),
        F.array_join(sizes, "|").alias("sizes"),
        (F.col("p_partkey") % 7 == 0).alias("out_of_stock"),
    )
    # §2.10 model field cleaners (base.py:527-534 clean_<field> hooks)
    # as a declarative spec — compiled into one projection by
    # apply_cleaners, so the hook runs JVM-side.
    from kryptone_spark.operators.models import apply_cleaners

    return apply_cleaners(out, {"price": lambda c: F.round(c, 2)})


def q_emb_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, label-blocked (the quadratic
    self-join is bounded by the blocking key; LSH buckets at scale)."""
    from kryptone_spark.operators import simsearch

    emb = _load(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.expr("transform(embedding, x -> cast(x as double))")
    )
    return simsearch.near_dup_pairs(emb, min_sim=0.30, block_col="label")


def _index_dir(sf_dir: str, kind: str) -> str:
    """Deterministic per-SF scratch dir for materialized ANN indexes —
    the contract queries exercise the ingest-time path end-to-end
    (build partitioned index, probe with partition pruning)."""
    import hashlib
    import tempfile

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    return str(
        __import__("pathlib").Path(tempfile.gettempdir())
        / f"kryptone_ann_{tag}" / kind
    )


def q_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC ingestion end-to-end: the documents table is serialized as
    a WARC archive (sources/warc.py write_warc — deterministic record
    framing), read back through the columnar reader (record split in
    the text scan via lineSep, header parse as a str_to_map projection,
    zero Python), and summarized. The oracle states the expected
    records straight from the documents table."""
    from kryptone_spark.sources import warc

    docs = _load(spark, sf_dir, "documents").select(
        F.concat(F.lit("https://docs.test/doc-"), F.col("doc_id").cast("string")).alias("url"),
        "text",
    )
    path = _index_dir(sf_dir, "warc")
    warc.write_warc(docs, path)
    recs = warc.read_warc(spark, path)
    return recs.select(
        F.col("target_uri"),
        F.col("warc_type"),
        F.col("content_length"),
        F.md5("body").alias("body_md5"),
    )


def q_emb_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH ANN (the scale path for emb_cosine_topk), through
    the INGEST-TIME index: the table is materialized partitioned on its
    hyperplane bucket, and the probe scans only the queried buckets
    (partition pruning) before exact cosine re-scoring. The md5-derived
    hyperplanes are engine-portable, so the DuckDB oracle (_lsh_oracle)
    re-derives buckets AND scores independently."""
    from kryptone_spark.operators import simsearch

    emb = _load(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.expr("transform(embedding, x -> cast(x as double))")
    )
    queries = emb.where("vec_id < 3").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    path = _index_dir(sf_dir, "lsh")
    simsearch.materialize_lsh_index(emb, path, n_planes=4)
    return simsearch.lsh_topk_indexed(spark, path, queries, k=5, n_planes=4)


def _lsh_oracle() -> str:
    """DuckDB oracle for emb_lsh_ann. The md5-derived ±1 hyperplanes
    ARE portable: sign(p,i) = +1 iff conv(substr(md5('p_i'),1,4),16,10)
    is even, and a hex number's parity is its LAST digit's parity — so
    substr(md5(..), 4, 1) IN ('0','2','4','6','8','a','c','e') decides
    the sign with no hex-to-int conversion at all."""
    projs = ",\n                     ".join(
        "list_sum(list_transform(generate_series(0, 63), i -> v[i+1] * "
        f"(CASE WHEN substr(md5('{p}_' || i), 4, 1) IN "
        "('0','2','4','6','8','a','c','e') THEN 1.0 ELSE -1.0 END)))"
        f" AS proj{p}" for p in range(4)
    )
    bucket = " + ".join(
        f"(CASE WHEN proj{p} > 0 THEN {1 << p} ELSE 0 END)" for p in range(4)
    )
    return f"""
            WITH vecs AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            projd AS (
              SELECT vec_id, v,
                     {projs}
              FROM vecs),
            sigged AS (
              SELECT vec_id, v, {bucket} AS bucket FROM projd),
            q AS (SELECT vec_id AS query_id, v AS qv, bucket
                  FROM sigged WHERE vec_id < 3),
            cand AS (
              SELECT q.query_id, e.vec_id AS neighbor_id,
                     round(list_dot_product(e.v, q.qv)
                           / (sqrt(list_dot_product(e.v, e.v))
                              * sqrt(list_dot_product(q.qv, q.qv))), 6) AS sim
              FROM sigged e JOIN q USING (bucket))
            SELECT query_id, neighbor_id, sim,
                   row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id)::INTEGER AS rank
            FROM cand QUALIFY rank <= 5
    """


def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-rule URL canonicalizer (functions/urls.py:canonicalize_full,
    SURVEY §2.2 note — STRONGER than the reference, which drops
    fragment URLs instead of stripping, urls.py:474-492): lowercase
    scheme+host, strip fragment, elide the scheme-default port (RFC
    3986 §6.2.3), strip tracking params, normalize the trailing slash
    on non-root paths. Corpus exercises every rule: uppercase
    scheme/host, ':443' under https, trailing slashes, mixed
    tracking+real params, all-tracking queries, root paths,
    fragments."""
    from kryptone_spark.config import DEFAULT_TRACKING_PARAMS

    orders = _load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    ks = k.cast("string")
    dom_mixed = F.concat(F.lit("Site"), (F.col("o_custkey") % 7).cast("string"), F.lit(".Test"))
    dom = F.lower(dom_mixed)
    b = k % 6
    url = (
        F.when(b == 0, F.concat(F.lit("HTTPS://"), dom_mixed, F.lit("/Product-"), ks, F.lit("/")))
        .when(b == 1, F.concat(F.lit("https://"), dom, F.lit("/product-"), ks, F.lit("?utm_source=google&page=2")))
        .when(b == 2, F.concat(F.lit("https://"), dom, F.lit("/product-"), ks, F.lit("#reviews")))
        .when(b == 3, F.concat(F.lit("https://"), dom, F.lit("/p?gclid="), ks))
        .when(b == 4, F.concat(F.lit("HTTPS://"), dom_mixed, F.lit(":443/")))
        .otherwise(F.concat(F.lit("https://"), dom, F.lit("/a/b?x=1&fbclid="), ks, F.lit("&y=2")))
    )
    from kryptone_spark.functions import urls as UU

    return orders.select(k.alias("k"), url.alias("url")).select(
        "k", "url",
        UU.canonicalize_full(F.col("url"), DEFAULT_TRACKING_PARAMS).alias("canonical"),
    )


def q_emb_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (KMeans coarse quantizer, cell-pruned candidate scan).
    Run at n_probe = n_cells, where IVF provably degrades to exact
    search — so the brute-force SQL oracle pins its values regardless
    of the trained centroids; partial-probe recall is covered by
    tests/test_training_ops.py."""
    from kryptone_spark.operators import simsearch

    emb = _load(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.expr("transform(embedding, x -> cast(x as double))")
    )
    queries = emb.where("vec_id >= 3 and vec_id < 6").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = simsearch.train_ivf_centroids(emb, n_cells=4, seed=42, max_iter=5)
    path = _index_dir(sf_dir, "ivf")
    simsearch.materialize_ivf_index(emb, path, cents)
    return simsearch.ivf_topk_indexed(spark, path, queries, cents, k=4, n_probe=4)


def q_crawl_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full wave-loop crawl of the synthetic interleaved-document site
    (the BASELINE.json north capability). Value-verified two ways: the
    Python oracle replay (tests/test_crawl_e2e.py) and an independent
    DuckDB recursive-CTE BFS over the same inlined link spans
    (_crawl_flagship_oracle)."""
    import tempfile

    from kryptone_spark.config import CrawlConfig
    from kryptone_spark.plans.tableio import TableIO
    from kryptone_spark.plans.waves import WaveRunner
    from kryptone_spark.synth import site_df, synth_site

    site = synth_site(n_domains=1, n_products=8, page_size=4, seed=42)
    config = CrawlConfig(start_urls=["http://sitea.test/"], ignore_images=True)
    io = TableIO(spark, tempfile.mkdtemp(prefix="kryptone_flagship_"))
    WaveRunner(spark, config, site_df(spark, site), io).run()
    return io.read("fetch_batches").select(
        "wave", "rank_in_wave", "url"
    ).orderBy("wave", "rank_in_wave")


def _dedup_site() -> list[dict]:
    """Deterministic interleaved-document site with duplicated page
    texts across AND within waves — the in-loop dedup fixture shared by
    the Spark query and the oracle builder. BFS waves: 0 = home,
    1 = a,b; 2 = c,d,e; 3 = f. Dup classes: boiler1 on a/c/f' (f is a
    near-dup with extra tokens), boiler2 on d/e (same wave)."""
    base = "http://dup.test"
    boiler1 = (
        "standard product description boilerplate shared by many pages "
        "in this catalog with sizing materials and care instructions"
    )
    boiler2 = (
        "shipping and returns policy text repeated across regional "
        "storefront pages verbatim for compliance reasons"
    )

    def page(path, links, text):
        return {
            "doc_id": base + path,
            "spans": (
                [{"kind": "text", "text": text, "media_ref": "", "offset": 0}]
                + [
                    {"kind": "link", "text": "", "media_ref": base + l, "offset": i + 1}
                    for i, l in enumerate(links)
                ]
            ),
        }

    return [
        page("/", ["/a", "/b"], "welcome to the dup test site catalog of goods"),
        page("/a", ["/c", "/d"], boiler1),
        page("/b", ["/e"], "a genuinely unique essay about distributed crawl engines"),
        page("/c", ["/f"], boiler1),
        page("/d", [], boiler2),
        page("/e", [], boiler2),
        page("/f", [], boiler1 + " plus one extra trailing clause here"),
    ]


def q_crawl_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wave-loop crawl with the in-loop near-dup stage (WaveRunner
    dedup=True): each wave's fetched page texts are MinHash-banded,
    probed against the loop-maintained index, and appended to it — the
    accumulated dup_pairs table holds every LSH candidate pair among
    fetched docs exactly once, stamped with the LATER member's fetch
    wave. Oracle: BFS fetch waves re-derived via recursive CTE over the
    inlined site, minhash/banding restated in SQL, pair wave =
    greatest(member waves)."""
    import tempfile

    from kryptone_spark.config import CrawlConfig
    from kryptone_spark.plans.tableio import TableIO
    from kryptone_spark.plans.waves import WaveRunner
    from kryptone_spark.synth import site_df

    site = _dedup_site()
    config = CrawlConfig(start_urls=["http://dup.test/"], ignore_images=True)
    io = TableIO(spark, tempfile.mkdtemp(prefix="kryptone_dedup_"))
    WaveRunner(spark, config, site_df(spark, site), io, dedup=True).run()
    return io.read("dup_pairs").select(
        "doc_a", "doc_b", "n_shared_bands", F.col("wave").cast("int").alias("wave")
    )


def _crawl_dedup_oracle() -> str:
    """Self-contained DuckDB oracle for the in-loop dedup crawl: the
    INPUT (link edges + page texts) is inlined; fetch waves, minhash
    signatures, band buckets, and pair waves are all re-derived in
    SQL."""
    site = _dedup_site()
    edge_vals = ",\n              ".join(
        "('{}', '{}')".format(r["doc_id"], s["media_ref"])
        for r in site
        for s in r["spans"]
        if s["kind"] == "link"
    )
    text_vals = ",\n              ".join(
        "('{}', '{}')".format(
            r["doc_id"],
            next(s["text"] for s in r["spans"] if s["kind"] == "text").replace("'", "''"),
        )
        for r in site
    )
    return f"""
        WITH RECURSIVE edges(src, href) AS (
            VALUES {edge_vals}
        ),
        pagetext(doc_id, text) AS (
            VALUES {text_vals}
        ),
        walk(url, wave) AS (
            SELECT 'http://dup.test/' AS url, 0 AS wave
            UNION
            SELECT e.href, w.wave + 1
            FROM walk w JOIN edges e ON e.src = w.url
            WHERE w.wave < 16
        ),
        ff AS (SELECT url, MIN(wave) AS wave FROM walk GROUP BY url),
        fdocs AS (
            SELECT p.doc_id, p.text FROM pagetext p
            JOIN ff f ON f.url = p.doc_id WHERE p.text <> ''
        ),
        toks AS (
            SELECT DISTINCT doc_id, tok FROM (
                SELECT doc_id,
                       unnest(string_split_regex(
                           regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                           ' +')) AS tok
                FROM fdocs
            ) WHERE tok <> ''
        ),
        sigs AS (SELECT doc_id, {_SIG_COLS} FROM toks GROUP BY doc_id),
        bands AS ({_BANDS_SQL}),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   count(*) AS n_shared_bands
            FROM bands a
            JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
                        AND a.doc_id < b.doc_id
            GROUP BY doc_a, doc_b
        )
        SELECT p.doc_a, p.doc_b, p.n_shared_bands,
               CAST(greatest(fa.wave, fb.wave) AS INT) AS wave
        FROM pairs p
        JOIN ff fa ON fa.url = p.doc_a
        JOIN ff fb ON fb.url = p.doc_b
    """


def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: binary media → mapInPandas header decode.
    Deterministic fake codec (real codecs absent in this container)."""
    from kryptone_spark.operators import multimodal

    rows = []
    for i in range(64):
        if i % 3 == 0:
            rows.append((f"img{i}", "image", multimodal.make_fake_image(100 + i, 50 + i), {}))
        elif i % 3 == 1:
            rows.append((f"aud{i}", "audio", multimodal.make_fake_audio(8000 + i, 1000 * i), {}))
        else:
            rows.append((f"vid{i}", "video", None, {"duration_ms": str(500 * i)}))
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    return multimodal.decode_media(media).orderBy("media_id")


def q_media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact media dedup over binary blobs (content-hash groups). The
    fake-codec bytes are deterministic functions of i, so the duplicate
    classes (image dims i%5, audio params i%4) are closed-form — the
    oracle restates the expected groups without rebuilding the bytes;
    the Spark side genuinely hashes the binary column."""
    from kryptone_spark.operators import multimodal

    rows = []
    for i in range(64):
        if i % 3 == 0:
            rows.append((f"img{i}", "image", multimodal.make_fake_image(100 + i % 5, 50), {}))
        elif i % 3 == 1:
            rows.append((f"aud{i}", "audio", multimodal.make_fake_audio(8000 + i % 4, 500), {}))
        else:
            rows.append((f"vid{i}", "video", None, {}))
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    return multimodal.media_dedup(media).select("group_size", "keep_media_id")


def q_emb_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 embedding quantization (the ANN memory lever): per-vector
    symmetric scale, quantized array pipe-serialized for the driver's
    pandas canon."""
    from kryptone_spark.operators import simsearch

    emb = _load(spark, sf_dir, "embeddings")
    out = simsearch.quantize_embeddings(emb)
    return out.select(
        "vec_id",
        "q_scale",
        F.array_join(
            F.transform(F.col("q_embedding"), lambda v: v.cast("string")), "|"
        ).alias("q_emb"),
    )


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 approx_count_distinct (sketch — engine-specific estimate)."""
    ev = _load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users")
    )


def _trap_urls_from_orders(orders: DataFrame) -> DataFrame:
    """Trap-shaped URL corpus from orders (branch = k % 8): path loop,
    jsessionid path param, session-key query + param minting, calendar
    archive, runaway length, plus benign shapes. Identical string
    arithmetic in TRAP_URLS_CTE below."""
    k = F.col("o_orderkey")
    ks = k.cast("string")
    dom = F.concat(F.lit("https://site"), (F.col("o_custkey") % 7).cast("string"), F.lit(".test"))
    b = k % 8
    suffix = (
        F.when(b == 0, F.concat(F.lit("/a/b/a/b/a/b/page-"), ks))
        .when(b == 1, F.concat(F.lit("/p-"), ks, F.lit(";jsessionid=AB"), ks))
        .when(b == 2, F.concat(F.lit("/shop?phpsessid=x"), ks, F.lit("&a=1&b=2&c=3&d=4&e=5")))
        .when(b == 3, F.concat(
            F.lit("/archive/2020/"), (1 + k % 12).cast("string"),
            F.lit("/"), (1 + k % 28).cast("string"),
            F.lit("/2021/"), (1 + (k + 5) % 12).cast("string"),
            F.lit("/"), (1 + (k + 11) % 28).cast("string"),
            F.lit("/post-"), ks))
        .when(b == 4, F.concat(F.lit("/product-"), ks))
        .when(b == 5, F.lit("/"))
        .when(b == 6, F.concat(F.lit("/products?page="), (k % 50).cast("string")))
        .otherwise(F.concat(F.lit("/"), F.repeat(F.lit("x"), 200), F.lit("/item-"), ks))
    )
    return orders.select(F.col("o_orderkey").alias("k"), F.concat(dom, suffix).alias("url"))


TRAP_URLS_CTE = """
trap_urls AS (
  SELECT o_orderkey AS k,
         'https://site' || (o_custkey % 7) || '.test' ||
         CASE o_orderkey % 8
           WHEN 0 THEN '/a/b/a/b/a/b/page-' || o_orderkey
           WHEN 1 THEN '/p-' || o_orderkey || ';jsessionid=AB' || o_orderkey
           WHEN 2 THEN '/shop?phpsessid=x' || o_orderkey || '&a=1&b=2&c=3&d=4&e=5'
           WHEN 3 THEN '/archive/2020/' || (1 + o_orderkey % 12) || '/' || (1 + o_orderkey % 28)
                       || '/2021/' || (1 + (o_orderkey + 5) % 12) || '/' || (1 + (o_orderkey + 11) % 28)
                       || '/post-' || o_orderkey
           WHEN 4 THEN '/product-' || o_orderkey
           WHEN 5 THEN '/'
           WHEN 6 THEN '/products?page=' || (o_orderkey % 50)
           ELSE '/' || repeat('x', 200) || '/item-' || o_orderkey
         END AS url
  FROM orders)
"""


def q_url_trap_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-trap detection (operators/traps.py): columnar URL-shape
    heuristics — path loops, session ids, calendar explosions,
    parameter minting — scored before admission so trap URLs never
    reach the seen anti-join. The reference has no trap defense
    (base.py:292-295 admits every passing URL into an unbounded set).
    The oracle parses the SAME url strings generically in DuckDB —
    split/filter/max over list values — so the signal math itself is
    cross-checked, not the corpus arithmetic."""
    from kryptone_spark.operators import traps

    urls = _trap_urls_from_orders(_load(spark, sf_dir, "orders"))
    return traps.trap_signals(urls).select(
        "k", "url", "path_depth", "max_seg_repeat", "n_numeric_segs",
        "n_query_params", "has_session_id", "trap_score", "is_trap",
    )


def q_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-reputation rollup (operators/domains.py): per-source
    volume, exact-dup rate, mean quality, mean length, language share —
    the domain-level gate a CCNet/RefinedWeb-style curation pipeline
    applies before per-document work. Two-stage agg: (domain, fp)
    partial first, so the shuffle carries one row per distinct doc."""
    from kryptone_spark.operators import domains

    return domains.domain_stats(_load(spark, sf_dir, "documents"))


def q_route_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 route dispatch (routing.py:123-131): first-match-wins over an
    ordered regex route table, compiled to a chained CASE — Catalyst
    folds it into one codegen stage, no join needed for a static table."""
    urls = _urls_from_orders(_load(spark, sf_dir, "orders"))
    u = F.col("url")
    route = (
        F.when(u.rlike("/img/"), F.lit("media"))
        .when(u.rlike("[?]page="), F.lit("listing"))
        .when(u.rlike("offsite"), F.lit("external"))
        .when(u.rlike("#reviews$"), F.lit("reviews"))
        .when(u.rlike("product-[0-9]+$"), F.lit("product"))
        .otherwise(F.lit("other"))
    )
    return urls.select("k", "url", route.alias("route"))


def q_sitemap_seeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap ingestion (reference base.py:1275, NotImplemented there):
    urlset bodies with 3 locs per region + one sitemapindex body, all
    genuinely XML-parsed by the engine; closed-form oracle."""
    from kryptone_spark.sources import seeds

    r = _load(spark, sf_dir, "region")
    key = F.col("r_regionkey")
    urlset = F.concat(
        F.lit('<?xml version="1.0"?><urlset><url><loc> https://r'),
        key.cast("string"),
        F.lit(".test/a </loc></url><url><loc>https://r"),
        key.cast("string"),
        F.lit(".test/b</loc><lastmod>2024-01-01</lastmod></url><url><loc>https://r"),
        key.cast("string"),
        F.lit(".test/c</loc></url></urlset>"),
    )
    index = F.concat(
        F.lit("<sitemapindex><sitemap><loc>https://r"),
        key.cast("string"),
        F.lit(".test/sitemap-products.xml</loc></sitemap></sitemapindex>"),
    )
    raw = r.select(
        F.concat(F.lit("https://r"), key.cast("string"), F.lit(".test/sitemap.xml")).alias("sitemap_url"),
        F.when(key % 2 == 0, urlset).otherwise(index).alias("xml"),
    )
    return seeds.sitemap_seeds(raw)


def q_sitemap_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sitemaps.org recrawl hints (sources/seeds.py:sitemap_entries):
    urlset bodies synthesized from part — entry 1 carries
    lastmod/changefreq/priority (changefreq cycles through all seven
    protocol values), entry 2 is loc-only so every hint column
    exercises its NULL path. changefreq maps to interval_hint_s."""
    from kryptone_spark.sources import seeds

    p = _load(spark, sf_dir, "part")
    k = F.col("p_partkey")
    ks = k.cast("string")
    cf = F.element_at(
        F.lit(["always", "hourly", "daily", "weekly", "monthly", "yearly", "never"]),
        (k % 7).cast("int") + 1,
    )
    xml = F.concat(
        F.lit("<urlset><url><loc> https://shop.test/p"), ks,
        F.lit(" </loc><lastmod>2024-03-"),
        F.lpad(((k % 28) + 1).cast("string"), 2, "0"),
        F.lit("</lastmod><changefreq>"), cf,
        F.lit("</changefreq><priority>0."), (k % 10).cast("string"),
        F.lit("</priority></url><url><loc>https://shop.test/q"), ks,
        F.lit("</loc></url></urlset>"),
    )
    raw = p.select(
        F.concat(F.lit("https://shop.test/sm"), ks, F.lit(".xml")).alias(
            "sitemap_url"
        ),
        xml.alias("xml"),
    )
    return seeds.sitemap_entries(raw)


def q_robots_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar robots.txt parsing: raw bodies synthesized from nation
    rows (three shapes: a '*' section with rules + crawl-delay, a
    foreign-agent-only body, an allow-all '*' section; one class uses
    CRLF endings), genuinely string-parsed by parse_robots_txt. The
    oracle restates the closed-form parse per class."""
    from kryptone_spark.operators import schedule

    n = _load(spark, sf_dir, "nation")
    key = F.col("n_nationkey")
    body = (
        F.when(
            key % 3 == 0,
            F.concat(
                F.lit("User-agent: googlebot\nDisallow: /secret\n\nUser-agent: *\nDisallow: /img/\nDisallow: /n"),
                key.cast("string"),
                F.lit("/\nCrawl-delay: "),
                (key % 5 + 2).cast("string"),
                F.lit("\nUser-agent: other\nDisallow: /x\n"),
            ),
        )
        .when(
            key % 3 == 1,
            F.lit("User-agent: googlebot\r\nDisallow: /private\r\nCrawl-delay: 9\r\n"),
        )
        .otherwise(F.lit("User-agent: *\r\nDisallow:\r\n"))
    )
    raw = n.select(
        F.concat(F.lit("nation"), key.cast("string"), F.lit(".test")).alias("domain"),
        body.alias("robots_txt"),
    )
    out = schedule.parse_robots_txt(raw)
    return out.select(
        "domain",
        F.array_join("disallow", "|").alias("disallow"),
        F.col("crawl_delay").cast("double").alias("crawl_delay"),
    )


def q_robots_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 robots enforcement: broadcast join of the pending frontier
    against the per-domain robots dim (disallow prefixes + crawl-delay
    override), aggregated per domain."""
    from kryptone_spark.config import CrawlConfig
    from kryptone_spark.functions import urls as U
    from kryptone_spark.operators import schedule

    urls = _urls_from_orders(_load(spark, sf_dir, "orders"))
    pending = urls.select("url", U.host(F.col("url")).alias("domain"))
    region = _load(spark, sf_dir, "region")
    robots = region.select(
        F.concat(F.lit("site"), F.col("r_regionkey").cast("string"), F.lit(".test")).alias("domain"),
        F.when(F.col("r_regionkey") % 2 == 0, F.array(F.lit("/img/")))
        .otherwise(F.array().cast("array<string>"))
        .alias("disallow"),
        (F.lit(5.0) + F.col("r_regionkey")).cast("double").alias("crawl_delay"),
    )
    out = schedule.with_robots(pending, robots, CrawlConfig(wait_time=25.0))
    return out.groupBy("domain").agg(
        F.sum(F.col("robots_blocked").cast("long")).alias("n_blocked"),
        F.count("*").alias("n_urls"),
        F.max("crawl_delay").cast("double").alias("crawl_delay"),
    )


def q_robots_rep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 robots matching (engine upgrade over J6's prefix
    subset): '*' wildcards, '$' anchors, Allow/Disallow with
    longest-pattern precedence, matched against path+query — evaluated
    as a native aggregate fold (no regex, no Python) over a broadcast
    rules dim. The oracle restates the matcher with DuckDB's GLOB
    (pattern||'*' for unanchored prefix-embedding, stripped '$' for
    full-match anchoring) and the precedence with a window — an
    independent formulation of the same RFC semantics. Rule patterns
    avoid GLOB-special '?'/'[' so both formulations are comparable."""
    from kryptone_spark.config import CrawlConfig
    from kryptone_spark.functions import urls as U
    from kryptone_spark.operators import schedule

    urls = _urls_from_orders(_load(spark, sf_dir, "orders"))
    pending = urls.select("k", "url", U.host(F.col("url")).alias("domain"))
    rules_schema = (
        "domain string, rules array<struct<allow:boolean,pattern:string>>, "
        "crawl_delay double"
    )
    robots = spark.createDataFrame(
        [
            ("site0.test", [(False, "/img/*"), (True, "/img/photo-1*")], 2.0),
            ("site1.test", [(False, "/*.jpg$")], 3.0),
            ("site2.test", [(False, "/product"), (True, "/products")], None),
            ("site3.test", [(False, "/*page=*")], 4.0),
            ("site4.test", [(True, "/"), (False, "/product-4")], None),
            ("site6.test", [(False, "/"), (True, "/*page=")], 1.5),
        ],
        rules_schema,
    )
    out = schedule.with_robots_rep(pending, robots, CrawlConfig(wait_time=25.0))
    return out.select("k", "url", "robots_blocked", F.col("crawl_delay").cast("double"))


ROBOTS_REP_RULES_CTE = """
rep_rules(domain, allow, pattern) AS (VALUES
  ('site0.test', false, '/img/*'),
  ('site0.test', true,  '/img/photo-1*'),
  ('site1.test', false, '/*.jpg$'),
  ('site2.test', false, '/product'),
  ('site2.test', true,  '/products'),
  ('site3.test', false, '/*page=*'),
  ('site4.test', true,  '/'),
  ('site4.test', false, '/product-4'),
  ('site6.test', false, '/'),
  ('site6.test', true,  '/*page=')),
rep_delays(domain, delay) AS (VALUES
  ('site0.test', 2.0), ('site1.test', 3.0), ('site2.test', NULL),
  ('site3.test', 4.0), ('site4.test', NULL), ('site6.test', 1.5))
"""


def q_redirect_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redirect-chain resolution (operators/redirects.py): bounded
    pointer-chase over a (src,dst) edge table — single hops, 2-hop
    chains, and a u↔v cycle that must surface as is_terminal=false
    after the hop cap, never loop. The oracle walks the same edges
    with a recursive CTE capped at the same 8 hops."""
    from kryptone_spark.operators import redirects as R

    orders = _load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    u = F.concat(F.lit("https://r.test/u-"), k.cast("string"))
    v = F.concat(F.lit("https://r.test/v-"), k.cast("string"))
    w = F.concat(F.lit("https://r.test/w-"), k.cast("string"))
    urls = orders.select(k.alias("k"), u.alias("url"))
    edges = (
        orders.where(k % 5 == 1).select(u.alias("src_url"), v.alias("dst_url"))
        .unionAll(orders.where(k % 25 == 6).select(v.alias("src_url"), w.alias("dst_url")))
        .unionAll(orders.where(k % 50 == 11).select(v.alias("src_url"), u.alias("dst_url")))
    )
    out = R.resolve_redirects(urls, F.broadcast(edges))
    return out.select(
        "k", "url", "final_url", F.col("n_hops").cast("int").alias("n_hops"),
        "is_terminal",
    )


def q_frontier_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 + the Heritrix-style global queue budget: the REAL
    politeness_schedule with max_pages_per_domain=10 against a
    fetched-counts dim (region-derived: site{r}.test has already
    fetched 3r pages) — site4 (12 ≥ cap) retires entirely, the others
    take min(wave budget 8, remaining quota 10-3r)."""
    from kryptone_spark.config import CrawlConfig
    from kryptone_spark.functions import urls as U
    from kryptone_spark.operators import schedule

    urls = _urls_from_orders(_load(spark, sf_dir, "orders"))
    host = U.host(F.col("url"))
    kept = urls.where(
        ~U.has_fragment(F.col("url"))
        & ~U.is_image(F.col("url"), (".jpg",))
        & (host != "offsite.example")
    ).select("url", host.alias("domain"), F.lit(0.0).alias("priority"))
    counts = _load(spark, sf_dir, "region").select(
        F.concat(F.lit("site"), F.col("r_regionkey").cast("string"), F.lit(".test")).alias("domain"),
        (F.col("r_regionkey") * 3).cast("long").alias("n_fetched"),
    )
    config = CrawlConfig(
        wait_time=25.0, max_per_domain_per_wave=8, max_pages_per_domain=10
    )
    batch, _ = schedule.politeness_schedule(
        kept, config, wave=0, fetched_counts=counts, global_rank=False
    )
    return batch.select("url", "domain", F.col("rank_in_domain").cast("int"))


def q_crawl_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (operators/diffs.py): old = docs minus the
    doc_id%17==3 slice (those show as 'added'), new = docs minus the
    doc_id%13==5 slice ('removed') with the doc_id%7==2 slice's text
    rewritten ('changed'); everything else 'unchanged'. Fingerprint =
    md5(text) — portable to DuckDB verbatim. Returns the per-status
    rollup plus a value probe (min url per status) so the hash pins
    both the join and the classification."""
    from kryptone_spark.operators import diffs

    docs = _load(spark, sf_dir, "documents").select(
        F.concat(F.lit("https://d.test/"), F.col("doc_id").cast("string")).alias(
            "url"
        ),
        "doc_id",
        "text",
    )
    old = docs.where(F.col("doc_id") % 17 != 3).select(
        "url", F.md5(F.col("text")).alias("fingerprint")
    )
    new = docs.where(F.col("doc_id") % 13 != 5).select(
        "url",
        F.md5(
            F.when(
                F.col("doc_id") % 7 == 2, F.concat(F.col("text"), F.lit(" v2"))
            ).otherwise(F.col("text"))
        ).alias("fingerprint"),
    )
    d = diffs.crawl_diff(old, new)
    return d.groupBy("status").agg(
        F.count("*").alias("n"), F.min("url").alias("first_url")
    )


def q_domain_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level link graph + host PageRank (linkgraph.domain_graph →
    pagerank over domains): the ranking real crawl schedulers use.
    Edges synthesized from lineitem span 5 src-hosts × 7 dst-hosts;
    intra-domain edges drop in the rollup. Oracle restates the rollup
    and the 3 unrolled iterations."""
    from kryptone_spark.operators import linkgraph

    li = _load(spark, sf_dir, "lineitem")
    edges = li.select(
        F.concat(
            F.lit("http://h"), (F.col("l_orderkey") % 5).cast("string"),
            F.lit(".test/o-"), F.col("l_orderkey").cast("string"),
        ).alias("src_url"),
        F.concat(
            F.lit("http://h"), (F.col("l_partkey") % 7).cast("string"),
            F.lit(".test/p-"), F.col("l_partkey").cast("string"),
        ).alias("dst_url"),
    )
    dg = linkgraph.domain_graph(edges)
    ranks = linkgraph.pagerank(
        dg, src_col="src_domain", dst_col="dst_domain"
    ).select(F.col("url").alias("domain"), "rank")
    inbound = dg.groupBy(F.col("dst_domain").alias("domain")).agg(
        F.sum("n_links").alias("n_inbound_links")
    )
    return ranks.join(inbound, "domain", "left").select(
        "domain", "rank",
        F.coalesce(F.col("n_inbound_links"), F.lit(0)).alias("n_inbound_links"),
    )


def q_url_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL shape-template mining (traps.url_templates): the synthesized
    orders corpus collapses to a handful of {n}-templates with big
    instance counts — the crawl-budget-sink view per-URL trap scores
    can't see. Oracle restates the same RE2 replacement chain with the
    'g' flag (DuckDB replaces first-match by default; Spark replaces
    all)."""
    from kryptone_spark.operators import traps

    urls = _urls_from_orders(_load(spark, sf_dir, "orders"))
    return traps.url_templates(urls)


def q_cache_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cache-Control revalidation scheduling
    (schedule.parse_cache_control): headers synthesized from events
    cover max-age, no-cache, directive-less, compound, and NULL; exact
    integer-micros next_fetch_us."""
    from kryptone_spark.operators import schedule

    ev = _load(spark, sf_dir, "events")
    b = F.col("event_id") % 5
    log = ev.select(
        "event_id",
        F.when(b == 0, F.lit("public, max-age=300"))
        .when(b == 1, F.lit("no-cache"))
        .when(b == 2, F.lit("public"))
        .when(b == 3, F.lit("max-age=86400, stale-while-revalidate=60"))
        .otherwise(F.lit(None).cast("string"))
        .alias("cache_control"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("fetch_us"),
    )
    return schedule.parse_cache_control(log)


def q_frontier_age(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontier starvation monitor (domains.frontier_age_stats): a
    synthetic frontier from orders (discovered_wave = key%6, domain =
    custkey%7) minus a visited slice (key%3=0), aged at wave 9."""
    from kryptone_spark.operators import domains

    o = _load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    url = F.concat(
        F.lit("http://site"), (F.col("o_custkey") % 7).cast("string"),
        F.lit(".test/p-"), k.cast("string"),
    )
    frontier = o.select(
        url.alias("url"),
        F.concat(
            F.lit("site"), (F.col("o_custkey") % 7).cast("string"), F.lit(".test")
        ).alias("domain"),
        (k % 6).cast("int").alias("discovered_wave"),
    )
    visited = o.where(k % 3 == 0).select(url.alias("url"))
    return domains.frontier_age_stats(frontier, visited, current_wave=9)


def q_robots_sitemaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap discovery from robots bodies (schedule.robots_sitemaps):
    even regions declare two sitemaps (one lowercase directive, CRLF
    endings), odd regions none — the robots→sitemap→seeds pipeline's
    missing hop, oracle-restated line-for-line."""
    from kryptone_spark.operators import schedule

    r = _load(spark, sf_dir, "region")
    rk = F.col("r_regionkey").cast("string")
    body = F.when(
        F.col("r_regionkey") % 2 == 0,
        F.concat(
            F.lit("User-agent: *\r\nDisallow: /tmp\r\nSitemap: https://site"),
            rk,
            F.lit(".test/s1.xml\r\nsitemap:https://site"),
            rk,
            F.lit(".test/s2.xml\r\n"),
        ),
    ).otherwise(F.lit("User-agent: *\r\nDisallow: /x\r\n"))
    robots = r.select(
        F.concat(F.lit("site"), rk, F.lit(".test")).alias("domain"),
        body.alias("robots_txt"),
    )
    return schedule.robots_sitemaps(robots)


def q_schedule_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness-compliance audit (schedule.schedule_audit) over a
    drifting fetch log synthesized from events (domain = user_id % 20,
    real event timestamps): per domain — fetch count, min inter-fetch
    gap, undershoots of a 30 s delay, ok flag. Integer micros
    throughout (unix_micros ↔ epoch_us)."""
    from kryptone_spark.operators import schedule

    ev = _load(spark, sf_dir, "events")
    log = ev.select(
        F.concat(F.lit("d"), (F.col("user_id") % 20).cast("string")).alias("domain"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("fetch_us"),
    )
    return schedule.schedule_audit(log, delay_us=30_000_000)


def q_recrawl_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive recrawl scheduling (Cho & Garcia-Molina revisit
    policy): change-rate per URL from a fetch history synthesized from
    events, geometric interval interpolation, next-fetch in exact
    integer microseconds (unix_micros ↔ epoch_us — no float epoch
    drift)."""
    from kryptone_spark.operators import schedule

    ev = _load(spark, sf_dir, "events")
    hist = ev.select(
        F.concat(
            F.lit("https://h.test/p-"), (F.col("user_id") % 500).cast("string")
        ).alias("url"),
        F.col("ts").alias("fetch_ts"),
        (F.col("event_id") % 3 == 0).alias("changed"),
    )
    return schedule.recrawl_schedule(hist)


def q_url_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/J5 url_distribution (base.py:312,502): page → sorted out-link
    list + degree, over an edge table synthesized from lineitem."""
    from kryptone_spark.operators import extract

    li = _load(spark, sf_dir, "lineitem")
    base = F.concat(F.lit("https://site"), (F.col("l_orderkey") % 7).cast("string"), F.lit(".test"))
    edges = li.select(
        F.concat(base, F.lit("/order-"), F.col("l_orderkey").cast("string")).alias("src_url"),
        F.concat(base, F.lit("/part-"), F.col("l_partkey").cast("string")).alias("dst_url"),
    )
    # out_links is pipe-serialized for the driver's pandas canon (lists
    # are unhashable); the list is already sort_array'ed by the operator.
    return extract.url_distribution(edges).select(
        "src_url",
        F.array_join("out_links", "|").alias("out_links"),
        "n_links",
    )


def q_link_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontier prioritization by link evidence: 3 power iterations of
    PageRank over the synthetic order→part edge graph (the same edges
    as url_distribution). Each iteration rounds to 9 dp in BOTH engines
    so float sum-order differences stay below the hash (see
    operators/linkgraph.py determinism contract)."""
    from kryptone_spark.operators import linkgraph

    li = _load(spark, sf_dir, "lineitem")
    base = F.concat(F.lit("https://site"), (F.col("l_orderkey") % 7).cast("string"), F.lit(".test"))
    edges = li.select(
        F.concat(base, F.lit("/order-"), F.col("l_orderkey").cast("string")).alias("src_url"),
        F.concat(base, F.lit("/part-"), F.col("l_partkey").cast("string")).alias("dst_url"),
    )
    return linkgraph.pagerank(edges, iters=3).select(
        "url", F.col("rank").cast("double").alias("rank")
    )


def q_doc_emails(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7/A9 EmailMixin token scan (seo.py:587-643): contains '@', not
    a social handle, \\S+@\\S+ — distinct per source row."""
    from kryptone_spark.functions import text as TXT

    c = _load(spark, sf_dir, "customer")
    text = F.concat(
        F.lit("contact "),
        F.lower(F.regexp_replace(F.col("c_name"), "#", ".")),
        F.lit("@site"), (F.col("c_custkey") % 7).cast("string"),
        F.lit(".test via @support now"),
    )
    return c.select(
        "c_custkey", F.explode(TXT.extract_emails(text)).alias("email")
    )


def q_frontier_reorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 reorder command (management/commands/reorder.py:25-52):
    regex-matched URLs first, then lexicographic."""
    urls = _urls_from_orders(_load(spark, sf_dir, "orders"))
    matched = F.col("url").rlike("/products")
    from kryptone_spark.functions.rank import global_row_number

    return global_row_number(
        urls.select("url", matched.alias("matched")),
        [F.desc("matched"), F.asc("url")],
        out_col="rk",
    )


def q_query_params_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 parse_qs/rebuild_query (urls.py:307-311,333-358): query
    string → map, typed param extraction."""
    from kryptone_spark.functions import urls as U

    urls = _urls_from_orders(_load(spark, sf_dir, "orders"))
    qm = U.query_map(F.col("url"))
    return urls.where(U.has_query(F.col("url"))).select(
        "k",
        F.element_at(qm, "page").cast("int").alias("page"),
        F.size(F.map_keys(qm)).alias("n_params"),
    )


def q_completion_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 Performance counters (base.py:776-796): visited / pending /
    completion, exact basis-point integer to dodge float rounding."""
    from kryptone_spark.functions import urls as U

    urls = _urls_from_orders(_load(spark, sf_dir, "orders"))
    host = U.host(F.col("url"))
    valid = urls.where(
        ~U.has_fragment(F.col("url"))
        & ~U.is_image(F.col("url"), (".jpg",))
        & (host != "offsite.example")
    )
    visited = (F.col("k") % 2 == 0).cast("long")
    return valid.agg(
        F.sum(visited).alias("n_visited"),
        F.sum(F.lit(1) - visited).alias("n_pending"),
        F.floor(F.lit(10000) * F.sum(visited) / F.count("*")).alias("completion_bp"),
    )


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table join chain (customer ⋈ orders ⋈ lineitem ⋈ nation)
    with broadcast dims — the join-reordering/broadcast showcase."""
    c = _load(spark, sf_dir, "customer")
    o = _load(spark, sf_dir, "orders")
    li = _load(spark, sf_dir, "lineitem")
    n = _load(spark, sf_dir, "nation")
    d = lambda col: F.col(col).cast("decimal(18,2)")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(d("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - d("l_discount"))).cast("double"),
                2,
            ).alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "url_parts": q_url_parts,
        "url_admission": q_url_admission,
        "frontier_schedule": q_frontier_schedule,
        "seen_antijoin": q_seen_antijoin,
        "seen_antijoin_bucketed": q_seen_antijoin_bucketed,
        "url_pagination": q_url_pagination,
        "url_decompose": q_url_decompose,
        "file_paths": q_file_paths,
        "lineitem_pricing": q_lineitem_pricing,
        "top_revenue_orders": q_top_revenue_orders,
        "events_by_type": q_events_by_type,
        "events_topk_per_user": q_events_topk_per_user,
        "customer_semi_join": q_customer_semi_join,
        "part_anti_join": q_part_anti_join,
        "user_set_ops": q_user_set_ops,
        "scalar_text": q_scalar_text,
        "orders_by_weekday": q_orders_by_weekday,
        "events_json": q_events_json,
        "events_hourly": q_events_hourly,
        "docs_exact_dedup": q_docs_exact_dedup,
        "docs_line_dedup": q_docs_line_dedup,
        "docs_minhash": q_docs_minhash,
        "docs_lsh_pairs": q_docs_lsh_pairs,
        "docs_lsh_incremental": q_docs_lsh_incremental,
        "docs_dup_clusters": q_docs_dup_clusters,
        "docs_sample_mix": q_docs_sample_mix,
        "docs_temperature_mix": q_docs_temperature_mix,
        "docs_shard_pack": q_docs_shard_pack,
        "docs_jaccard": q_docs_jaccard,
        "docs_simhash": q_docs_simhash,
        "docs_langid": q_docs_langid,
        "docs_quality": q_docs_quality,
        "docs_soft404": q_docs_soft404,
        "docs_token_stats": q_docs_token_stats,
        "docs_fingerprint": q_docs_fingerprint,
        "docs_repetition": q_docs_repetition,
        "docs_pii": q_docs_pii,
        "docs_decontam": q_docs_decontam,
        "docs_lm_score": q_docs_lm_score,
        "docs_wordfreq_topk": q_docs_wordfreq_topk,
        "docs_tfidf": q_docs_tfidf,
        "emb_cosine_topk": q_emb_cosine_topk,
        "emb_label_norms": q_emb_label_norms,
        "doc_spans_extract": q_doc_spans_extract,
        "spans_audit": q_spans_audit,
        "interleave_profile": q_interleave_profile,
        "image_text_pairs": q_image_text_pairs,
        "anchor_profile": q_anchor_profile,
        "robots_rep": q_robots_rep,
        "redirect_resolve": q_redirect_resolve,
        "recrawl_schedule": q_recrawl_schedule,
        "crawl_diff": q_crawl_diff,
        "schedule_audit": q_schedule_audit,
        "robots_sitemaps": q_robots_sitemaps,
        "frontier_age": q_frontier_age,
        "url_templates": q_url_templates,
        "domain_pagerank": q_domain_pagerank,
        "cache_control": q_cache_control,
        "frontier_quota": q_frontier_quota,
        "seo_audit": q_seo_audit,
        "docs_stemmed_topk": q_docs_stemmed_topk,
        "product_models": q_product_models,
        "emb_near_dup": q_emb_near_dup,
        "emb_lsh_ann": q_emb_lsh_ann,
        "emb_ivf_ann": q_emb_ivf_ann,
        "url_canonicalize": q_url_canonicalize,
        "route_dispatch": q_route_dispatch,
        "sitemap_seeds": q_sitemap_seeds,
        "sitemap_entries": q_sitemap_entries,
        "warc_roundtrip": q_warc_roundtrip,
        "robots_parse": q_robots_parse,
        "robots_join": q_robots_join,
        "url_distribution": q_url_distribution,
        "link_pagerank": q_link_pagerank,
        "doc_emails": q_doc_emails,
        "frontier_reorder": q_frontier_reorder,
        "query_params_map": q_query_params_map,
        "completion_stats": q_completion_stats,
        "revenue_by_nation": q_revenue_by_nation,
        "crawl_flagship": q_crawl_flagship,
        "crawl_dedup": q_crawl_dedup,
        "media_decode": q_media_decode,
        "media_dedup": q_media_dedup,
        "emb_quantize": q_emb_quantize,
        "approx_distinct": q_approx_distinct,
        "url_trap_score": q_url_trap_score,
        "domain_stats": q_domain_stats,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_SIG_COLS = ", ".join(
    f"min(md5(tok || '#{i}')) AS sig{i}" for i in range(8)
)

_BANDS_SQL = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, md5(sig{2*b} || '|' || sig{2*b+1}) AS bucket FROM sigs"
    for b in range(4)
)

_HEXVAL = (
    "((strpos('0123456789abcdef', substr(h16,1,1))-1)*4096 + "
    "(strpos('0123456789abcdef', substr(h16,2,1))-1)*256 + "
    "(strpos('0123456789abcdef', substr(h16,3,1))-1)*16 + "
    "(strpos('0123456789abcdef', substr(h16,4,1))-1))"
)

_LANG_SCORE = {
    "en": "('the','and','of','is','with')",
    "es": "('el','la','de','es','con')",
    "fr": "('le','la','et','est','avec')",
    "de": "('der','die','und','ist','mit')",
    "zh": "('的','是','和','在','了')",
}

_ZH_CHARS = ("的", "是", "和", "在", "了")

_LANG_COLS = ", ".join(
    # zh scores by substring-occurrence count (unsegmented text — token
    # equality can never match); latin langs by whole-token equality
    (
        "("
        + " + ".join(
            f"(length(text) - length(replace(text, '{c}', '')))" for c in _ZH_CHARS
        )
        + f")::INTEGER AS score_{l}"
    )
    if l == "zh"
    else f"len(list_filter(string_split_regex(regexp_replace(lower(text),'[^a-z0-9一-鿿 ]',' ','g'), ' +'), t -> t IN {m}))::INTEGER AS score_{l}"
    for l, m in _LANG_SCORE.items()
)


def _crawl_flagship_oracle() -> str:
    """Self-contained DuckDB oracle for the flagship wave-loop crawl.

    The same deterministic synthetic site the Spark query crawls is
    inlined as raw (src, href) link spans — the INPUT, not any computed
    result — and the entire crawl is re-derived independently in SQL:
    relative-URL resolution, the admission predicates active under the
    flagship config (same-domain, non-empty, fragment-drop, image-
    suffix drop), BFS via a recursive CTE (UNION-dedup on (url, wave),
    first-fetch wave = MIN over walks — identical to BFS depth since
    every admitted URL is fetched the wave after discovery under an
    unbounded politeness budget), and the lexicographic rank_in_wave
    contract. Cycles terminate via the wave cap (site depth < 16)."""
    from kryptone_spark.config import CrawlConfig
    from kryptone_spark.synth import synth_site

    site = synth_site(n_domains=1, n_products=8, page_size=4, seed=42)
    config = CrawlConfig(start_urls=["http://sitea.test/"], ignore_images=True)
    vals = ",\n              ".join(
        "('{}', '{}')".format(
            r["doc_id"].replace("'", "''"), s["media_ref"].replace("'", "''")
        )
        for r in site
        for s in r["spans"]
        if s["kind"] == "link"
    )
    exts = ", ".join(f"'{e}'" for e in config.image_extensions)
    return f"""
        WITH RECURSIVE edges(src, href) AS (
            VALUES {vals}
        ),
        resolved AS (
            SELECT src,
                   CASE WHEN href LIKE '/%' AND href NOT LIKE '//%'
                        THEN 'http://sitea.test' || trim(href)
                        ELSE href END AS url
            FROM edges
        ),
        admitted AS (
            SELECT DISTINCT src, url FROM resolved
            WHERE url <> ''
              AND NOT contains(url, '#')
              AND regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) = 'sitea.test'
              AND COALESCE(
                    CASE WHEN contains(url, '?')
                         THEN regexp_extract(regexp_extract(url,
                                '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1),
                                '[^./](\\.[^./]+)$', 1)
                         ELSE regexp_extract(url, '[^./](\\.[^./]+)$', 1)
                    END, '') NOT IN ({exts})
        ),
        walk(url, wave) AS (
            SELECT 'http://sitea.test/' AS url, 0 AS wave
            UNION
            SELECT a.url, w.wave + 1
            FROM walk w JOIN admitted a ON a.src = w.url
            WHERE w.wave < 16
        ),
        first_fetch AS (
            SELECT url, MIN(wave) AS wave FROM walk GROUP BY url
        )
        SELECT CAST(wave AS INT) AS wave,
               CAST(row_number() OVER (PARTITION BY wave ORDER BY url) - 1 AS INT) AS rank_in_wave,
               url
        FROM first_fetch
        ORDER BY wave, rank_in_wave
    """


def oracle_sql() -> dict[str, str]:
    return {
        "crawl_flagship": _crawl_flagship_oracle(),
        "crawl_dedup": _crawl_dedup_oracle(),
        "url_parts": f"""
            WITH {URLS_CTE.strip()}
            SELECT k, url,
                   CASE WHEN k % 10 = 3 THEN 'offsite.example'
                        ELSE 'site' || dn || '.test'
                   END AS host,
                   CASE k % 10
                     WHEN 0 THEN '/img/photo-' || k || '.jpg'
                     WHEN 1 THEN '/product-' || k
                     WHEN 2 THEN '/products'
                     WHEN 3 THEN '/item-' || k
                     ELSE '/product-' || k
                   END AS path,
                   CASE WHEN k % 10 = 2 THEN 'page=' || (k % 50) ELSE '' END AS query,
                   CASE WHEN k % 10 = 1 THEN 'reviews' ELSE '' END AS fragment,
                   (k % 10 <> 3) AS is_secured
            FROM urls
        """,
        "url_admission": f"""
            WITH {URLS_CTE.strip()},
            verdicts AS (
              SELECT CASE
                WHEN NOT (url LIKE 'https://site0.test/%') THEN 'domain'
                WHEN contains(url, '#') THEN 'fragment'
                WHEN url LIKE '%.jpg' THEN 'image'
                ELSE 'kept' END AS reason
              FROM urls)
            SELECT reason, count(*) AS n FROM verdicts GROUP BY reason
        """,
        "frontier_schedule": f"""
            WITH {URLS_CTE.strip()},
            kept AS (
              SELECT url, 'site' || dn || '.test' AS domain
              FROM urls
              WHERE k % 10 NOT IN (0, 1, 3)),
            ranked AS (
              SELECT url, domain,
                     row_number() OVER (PARTITION BY domain ORDER BY url)::INTEGER AS rank_in_domain
              FROM kept)
            SELECT url, domain, rank_in_domain,
                   ((rank_in_domain - 1) * 25.0)::DOUBLE AS fetch_at_s
            FROM ranked WHERE rank_in_domain <= 8
        """,
        "seen_antijoin": f"""
            WITH {URLS_CTE.strip()},
            frontier AS (SELECT url, dn FROM urls WHERE k % 10 >= 4),
            seen AS (SELECT url FROM urls WHERE k % 2 = 0)
            SELECT 'site' || dn || '.test' AS domain,
                   count(*) AS n
            FROM frontier
            WHERE NOT EXISTS (SELECT 1 FROM seen WHERE seen.url = frontier.url)
            GROUP BY domain
        """,
        # the bucketed layout must give byte-identical verdicts — the
        # oracle is deliberately the SAME anti-join semantics
        "seen_antijoin_bucketed": f"""
            WITH {URLS_CTE.strip()},
            frontier AS (SELECT url, dn FROM urls WHERE k % 10 >= 4),
            seen AS (SELECT url FROM urls WHERE k % 2 = 0)
            SELECT 'site' || dn || '.test' AS domain,
                   count(*) AS n
            FROM frontier
            WHERE NOT EXISTS (SELECT 1 FROM seen WHERE seen.url = frontier.url)
            GROUP BY domain
        """,
        "url_pagination": """
            SELECT r_regionkey AS rk, page::INTEGER AS page,
                   'https://shop' || r_regionkey || '.test/list?page=' || page AS url
            FROM region CROSS JOIN (SELECT unnest(generate_series(1, 10)) AS page)
        """,
        "url_decompose": f"""
            WITH {URLS_CTE.strip()}
            SELECT k,
                   (CASE WHEN k % 10 = 0 THEN 2 ELSE 1 END)::INTEGER AS n_segments,
                   CASE k % 10
                     WHEN 0 THEN 'img'
                     WHEN 2 THEN 'products'
                     WHEN 3 THEN 'item-' || k
                     ELSE 'product-' || k
                   END AS seg1
            FROM urls
        """,
        # punctuation delete-sets are string.punctuation verbatim
        # (minus '_' for dir_url, matching functions.py:57 keep=['_'])
        "file_paths": """
            WITH p AS (
              SELECT p_partkey AS k,
                     '/shop/' || p_brand || '/' || p_type || '/item-'
                       || p_partkey || '.html' AS path,
                     p_brand || ' > ' || p_type || ' > ' || p_name AS crumbs
              FROM part
            ), toks AS (
              SELECT k,
                     list_filter(string_split(path, '/'),
                                 t -> t <> '' AND t <> 'shop') AS segs,
                     string_split(
                       trim(regexp_replace(lower(crumbs), ' +', ' ', 'g')),
                       '>') AS ctoks
              FROM p
            )
            SELECT k,
                   array_to_string(
                     list_transform(
                       list_slice(segs, 1, len(segs) - 1),
                       t -> translate(lower(replace(t, '-', '_')),
                              '!"#$%&''()*+,-./:;<=>?@[\\]^`{|}~', '')),
                     '/') AS dir_url,
                   array_to_string(
                     list_transform(
                       list_slice(ctoks, 1, len(ctoks) - 1),
                       t -> replace(
                              translate(trim(t),
                                '!"#$%&''()*+,-./:;<=>?@[\\]^_`{|}~', ''),
                              ' ', '_')),
                     '/') AS dir_crumbs,
                   substring(md5(k::VARCHAR), 1, 8) || '.jpg' AS fname
            FROM toks
        """,
        "lineitem_pricing": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity::DECIMAL(18,2))::DOUBLE, 2) AS sum_qty,
                   round(sum(l_extendedprice::DECIMAL(18,2))::DOUBLE, 2) AS sum_base_price,
                   round(sum(l_extendedprice::DECIMAL(18,2) * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2)))::DOUBLE, 2) AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "top_revenue_orders": """
            WITH rev AS (
              SELECT l_orderkey,
                     sum(l_extendedprice::DECIMAL(18,2) * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2))) AS rev_d
              FROM lineitem GROUP BY l_orderkey)
            SELECT o_orderkey, o_orderpriority,
                   round(rev_d::DOUBLE, 2) AS revenue,
                   row_number() OVER (ORDER BY rev_d DESC, o_orderkey)::INTEGER AS rnk
            FROM rev JOIN orders ON l_orderkey = o_orderkey
            QUALIFY rnk <= 10
        """,
        "events_by_type": """
            SELECT event_type, count(*) AS n,
                   round(avg(value), 4) AS avg_value,
                   count(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type
        """,
        "events_topk_per_user": """
            SELECT user_id, event_id, round(value, 2) AS value,
                   row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id)::INTEGER AS rnk
            FROM events QUALIFY rnk <= 3
        """,
        "customer_semi_join": """
            SELECT c_nationkey, count(*) AS n
            FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            GROUP BY c_nationkey
        """,
        "part_anti_join": """
            SELECT p_partkey, p_brand FROM part
            WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        """,
        "user_set_ops": """
            WITH buyers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
                 errs   AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
            SELECT 'intersect' AS op, count(*) AS n FROM (SELECT user_id FROM buyers INTERSECT SELECT user_id FROM errs)
            UNION ALL
            SELECT 'except', count(*) FROM (SELECT user_id FROM buyers EXCEPT SELECT user_id FROM errs)
            UNION ALL
            SELECT 'union', count(*) FROM (SELECT user_id FROM buyers UNION SELECT user_id FROM errs)
        """,
        "scalar_text": """
            SELECT p_partkey,
                   lower(replace(p_name, ' ', '-')) AS slug,
                   trim(regexp_replace(p_name, ' +', ' ', 'g')) AS clean,
                   length(p_name)::INTEGER AS n_chars,
                   (floor(p_retailprice)::BIGINT || '.' || '50')::DOUBLE AS price
            FROM part
        """,
        "orders_by_weekday": """
            SELECT (isodow(o_orderdate) - 1)::INTEGER AS wd,
                   month(o_orderdate)::INTEGER AS mo,
                   count(*) AS n
            FROM orders GROUP BY wd, mo
        """,
        "events_json": """
            SELECT event_type,
                   cast(sum(json_extract_string(props, '$.k')::BIGINT) AS BIGINT) AS sum_k,
                   max(json_extract_string(props, '$.k')::BIGINT) AS max_k
            FROM events GROUP BY event_type
        """,
        "events_hourly": """
            SELECT epoch(date_trunc('hour', ts))::BIGINT AS hour_epoch,
                   count(*) AS n,
                   round(sum(value::DECIMAL(18,2))::DOUBLE, 2) AS sum_value
            FROM events GROUP BY hour_epoch
        """,
        "docs_exact_dedup": """
            SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS text_hash,
                   count(*) AS group_size,
                   min(doc_id) AS keep_doc_id
            FROM documents
            GROUP BY text_hash HAVING count(*) > 1
        """,
        "docs_line_dedup": """
            WITH chunked AS (
              SELECT doc_id,
                     list_transform(
                       range(0, cast(ceil(len(string_split(text, ' ')) / 8.0) AS INT)),
                       i -> array_to_string(string_split(text, ' ')[i*8+1 : i*8+8], ' ')
                     ) AS lns
              FROM documents),
            lines AS (
              SELECT doc_id,
                     generate_subscripts(lns, 1) - 1 AS line_no,
                     unnest(lns) AS line
              FROM chunked),
            scored AS (
              SELECT *,
                     length(line) >= 1 AS elig,
                     CASE WHEN length(line) >= 1 THEN
                       row_number() OVER (
                         PARTITION BY CASE WHEN length(line) >= 1 THEN line END
                         ORDER BY doc_id, line_no) END AS rn,
                     CASE WHEN length(line) >= 1 THEN
                       count(DISTINCT doc_id) OVER (
                         PARTITION BY CASE WHEN length(line) >= 1 THEN line END)
                       END AS line_df
              FROM lines)
            SELECT doc_id,
                   count(*) AS n_lines,
                   sum(CASE WHEN NOT elig OR (rn = 1 AND line_df <= 4)
                            THEN 1 ELSE 0 END)::BIGINT AS n_kept,
                   coalesce(string_agg(
                     CASE WHEN NOT elig OR (rn = 1 AND line_df <= 4) THEN line END,
                     chr(10) ORDER BY line_no), '') AS text
            FROM scored GROUP BY doc_id
        """,
        "docs_minhash": f"""
            WITH {TOKS_CTE.strip()}
            SELECT doc_id, {_SIG_COLS} FROM toks GROUP BY doc_id
        """,
        "docs_lsh_pairs": f"""
            WITH {TOKS_CTE.strip()},
            sigs AS (SELECT doc_id, {_SIG_COLS} FROM toks GROUP BY doc_id),
            bands0 AS ({_BANDS_SQL}),
            ok AS (SELECT band, bucket FROM bands0 GROUP BY band, bucket HAVING count(*) <= 50),
            bands AS (SELECT bands0.* FROM bands0 JOIN ok USING (band, bucket))
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared_bands
            FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
            GROUP BY doc_a, doc_b
        """,
        "docs_lsh_incremental": f"""
            WITH {TOKS_CTE.strip()},
            sigs AS (SELECT doc_id, {_SIG_COLS} FROM toks GROUP BY doc_id),
            bands0 AS ({_BANDS_SQL}),
            ok AS (SELECT band, bucket FROM bands0 GROUP BY band, bucket HAVING count(*) <= 50),
            bands AS (SELECT bands0.* FROM bands0 JOIN ok USING (band, bucket))
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared_bands
            FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
            WHERE a.doc_id % 5 = 0 OR b.doc_id % 5 = 0
            GROUP BY doc_a, doc_b
        """,
        "docs_dup_clusters": f"""
            WITH RECURSIVE {TOKS_CTE.strip()},
            sigs AS (SELECT doc_id, {_SIG_COLS} FROM toks GROUP BY doc_id),
            bands0 AS ({_BANDS_SQL}),
            ok AS (SELECT band, bucket FROM bands0 GROUP BY band, bucket HAVING count(*) <= 50),
            bands AS (SELECT bands0.* FROM bands0 JOIN ok USING (band, bucket)),
            pairs AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
              GROUP BY doc_a, doc_b),
            edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
                      UNION SELECT doc_b, doc_a FROM pairs),
            reach(a, b) AS (
              SELECT a, b FROM edges
              UNION
              SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
            labels AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a)
            SELECT d.doc_id,
                   coalesce(l.cluster_id, d.doc_id) AS cluster_id,
                   (d.doc_id = coalesce(l.cluster_id, d.doc_id)) AS is_canonical
            FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id
        """,
        "docs_temperature_mix": f"""
            WITH c AS (
              SELECT source, pow(count(*)::DOUBLE, -0.5) AS pw
              FROM documents GROUP BY source),
            m AS (SELECT max(pw) AS mx FROM c),
            t AS (SELECT source, floor(round(pw / mx, 6) * 65536)::INT AS thresh
                  FROM c, m),
            b AS (
              SELECT d.doc_id, d.source, d.n_chars,
                     substr(md5(d.doc_id::VARCHAR), 1, 4) AS h16, t.thresh
              FROM documents d JOIN t USING (source)),
            kept AS (SELECT * FROM b WHERE {_HEXVAL} < thresh)
            SELECT source, count(*)::BIGINT AS n_kept,
                   sum(n_chars)::BIGINT AS chars_kept
            FROM kept GROUP BY source
        """,
        "docs_sample_mix": f"""
            WITH b AS (SELECT doc_id, lang, substr(md5(doc_id::VARCHAR), 1, 4) AS h16 FROM documents),
            v AS (SELECT doc_id, lang, {_HEXVAL}::INTEGER AS bucket FROM b)
            SELECT doc_id, lang, bucket FROM v
            WHERE bucket < CASE lang
                             WHEN 'en' THEN 32768
                             WHEN 'es' THEN 16384
                             WHEN 'zh' THEN 65536
                             ELSE 6554
                           END
        """,
        "docs_shard_pack": """
            WITH t AS (
              SELECT doc_id,
                     (CASE WHEN trim(text) = '' THEN 0
                           ELSE len(string_split_regex(trim(text), '\\s+'))
                      END)::INTEGER AS n_tokens
              FROM documents)
            SELECT doc_id, n_tokens,
                   floor(coalesce(SUM(n_tokens) OVER (
                       ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) / 1000)::INTEGER AS shard_id
            FROM t
        """,
        "docs_jaccard": f"""
            WITH {TOKS_CTE.strip()},
            keep AS (SELECT tok FROM toks GROUP BY tok HAVING count(*) <= 250),
            ctoks AS (SELECT t.doc_id, t.tok FROM toks t JOIN keep k ON t.tok = k.tok),
            sizes AS (SELECT doc_id, count(*) AS ng FROM ctoks GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
              FROM ctoks a JOIN ctoks b ON a.tok = b.tok AND a.doc_id < b.doc_id
              GROUP BY doc_a, doc_b)
            SELECT doc_a, doc_b,
                   round(c / (sa.ng + sb.ng - c), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE round(c / (sa.ng + sb.ng - c), 6) >= 0.9
        """,
        "docs_simhash": f"""
            WITH {TOKS_CTE.strip()},
            th AS (SELECT doc_id, {_HEXVAL} AS h
                   FROM (SELECT doc_id, substr(md5(tok), 1, 4) AS h16 FROM toks)),
            contrib AS (
              SELECT doc_id, j, CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END AS c
              FROM th CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS j)),
            bitsum AS (SELECT doc_id, j, sum(c) AS s FROM contrib GROUP BY doc_id, j)
            SELECT doc_id,
                   cast(sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS simhash
            FROM bitsum GROUP BY doc_id
        """,
        "docs_langid": f"""
            WITH scored AS (
              SELECT doc_id, lang, text, {_LANG_COLS} FROM documents)
            SELECT doc_id, lang,
                   CASE
                     WHEN score_zh > greatest(score_en, score_es, score_fr, score_de) THEN 'zh'
                     WHEN score_de > greatest(score_en, score_es, score_fr) THEN 'de'
                     WHEN score_fr > greatest(score_en, score_es) THEN 'fr'
                     WHEN score_es > score_en THEN 'es'
                     ELSE 'en'
                   END AS lang_pred,
                   score_en, score_es, score_fr, score_de, score_zh
            FROM scored
        """,
        "docs_quality": """
            WITH q AS (
              SELECT doc_id,
                     length(text) AS nc,
                     len(string_split_regex(lower(text), '\\s+')) AS nt,
                     len(list_filter(string_split_regex(lower(text), '\\s+'),
                         t -> t IN ('the','of','and','a','to','in','is','it','you','that','was','for','on','are','as','with','his','they','at'))) AS sw,
                     length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS np
              FROM documents)
            SELECT doc_id,
                   round(0.4 * least(nc / 500.0, 1.0)
                       + 0.4 * least((CASE WHEN nt > 0 THEN sw::DOUBLE / nt ELSE 0 END) * 4.0, 1.0)
                       + 0.2 * (1.0 - least((np::DOUBLE / greatest(nc, 1)) * 5.0, 1.0)), 6) AS quality
            FROM q
        """,
        "docs_soft404": """
            SELECT doc_id,
                   (contains(lower(coalesce(text, '')), 'page not found')
                    OR contains(lower(coalesce(text, '')), '404 not found')
                    OR contains(lower(coalesce(text, '')), 'error 404')
                    OR contains(lower(coalesce(text, '')), 'http 404')
                    OR contains(lower(coalesce(text, '')), 'does not exist')
                    OR contains(lower(coalesce(text, '')), 'no longer available')
                    OR contains(lower(coalesce(text, '')), 'page you requested')
                    OR contains(lower(coalesce(text, '')), 'cannot be found')
                    OR contains(lower(coalesce(text, '')), 'could not be found')) AS notfound_hit,
                   length(coalesce(text, '')) < 500 AS short_doc,
                   round((CASE WHEN (contains(lower(coalesce(text, '')), 'page not found')
                    OR contains(lower(coalesce(text, '')), '404 not found')
                    OR contains(lower(coalesce(text, '')), 'error 404')
                    OR contains(lower(coalesce(text, '')), 'http 404')
                    OR contains(lower(coalesce(text, '')), 'does not exist')
                    OR contains(lower(coalesce(text, '')), 'no longer available')
                    OR contains(lower(coalesce(text, '')), 'page you requested')
                    OR contains(lower(coalesce(text, '')), 'cannot be found')
                    OR contains(lower(coalesce(text, '')), 'could not be found')) THEN 0.7 ELSE 0.0 END
                   + CASE WHEN length(coalesce(text, '')) < 500 THEN 0.3 ELSE 0.0 END)::DOUBLE, 1) AS soft404_score
            FROM documents
        """,
        "docs_token_stats": """
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\\s+'))
                   END::INTEGER AS n_ws_tokens,
                   len(list_filter(
                       string_split_regex(regexp_replace(text, '([^A-Za-z0-9\\s])', ' \\1 ', 'g'), '\\s+'),
                       t -> t <> ''))::INTEGER AS n_bpe_tokens
            FROM documents
        """,
        "docs_fingerprint": """
            SELECT doc_id,
                   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp_md5
            FROM documents
        """,
        "docs_repetition": """
            WITH w AS (
              SELECT doc_id,
                     list_filter(
                       string_split_regex(
                         regexp_replace(lower(text), '[^a-z0-9一-鿿 ]', ' ', 'g'),
                         ' +'),
                       t -> t <> '') AS words
              FROM documents),
            b AS (
              SELECT doc_id,
                     CASE WHEN len(words) >= 2
                          THEN list_transform(
                                 generate_series(1, len(words) - 1),
                                 i -> words[i] || ' ' || words[i + 1])
                          ELSE CAST([] AS VARCHAR[]) END AS bigrams,
                     words
              FROM w),
            bg AS (SELECT doc_id, unnest(bigrams) AS bgram FROM b),
            cnt AS (SELECT doc_id, bgram, count(*) AS c FROM bg GROUP BY doc_id, bgram),
            agg AS (SELECT doc_id, max(c) AS mx, sum(c) AS tot FROM cnt GROUP BY doc_id)
            SELECT b.doc_id,
                   len(b.words)::BIGINT AS n_words,
                   round(CASE WHEN len(b.words) > 0
                              THEN 1 - len(list_distinct(b.words))::DOUBLE / len(b.words)
                              ELSE 0 END, 6) AS dup_word_frac,
                   coalesce(agg.tot, 0)::BIGINT AS n_bigrams,
                   coalesce(round(agg.mx::DOUBLE / agg.tot, 6), 0.0) AS top_bigram_frac
            FROM b LEFT JOIN agg USING (doc_id)
        """,
        "docs_pii": """
            WITH synth AS (
              SELECT c_custkey,
                     'Contact ' ||
                     CASE WHEN c_custkey % 3 <> 0
                          THEN lower(replace(c_name, '#', '.')) ||
                               '@corp' || (c_custkey % 7) || '.example'
                          ELSE 'the desk' END ||
                     ' or call ' ||
                     CASE WHEN c_custkey % 4 <> 0
                          THEN (c_custkey % 90 + 10) || '-' ||
                               (c_custkey % 900 + 100) || '-' ||
                               ((c_custkey * 7) % 900 + 100) || '-' ||
                               ((c_custkey * 13) % 9000 + 1000)
                          ELSE 'later' END ||
                     ' from host ' ||
                     CASE WHEN c_custkey % 5 <> 0
                          THEN '10.' || (c_custkey % 256) || '.0.' || (c_custkey % 100)
                          ELSE 'unknown' END AS text
              FROM customer),
            s1 AS (
              SELECT c_custkey,
                     len(regexp_extract_all(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))::INTEGER AS n_email,
                     regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g') AS t1
              FROM synth),
            s2 AS (
              SELECT c_custkey, n_email,
                     len(regexp_extract_all(t1,
                       '\\b\\d{2,3}[- ]\\d{3}[- ]\\d{3}[- ]\\d{4}\\b|\\b\\d{3}[- ]\\d{3}[- ]\\d{4}\\b'))::INTEGER AS n_phone,
                     regexp_replace(t1,
                       '\\b\\d{2,3}[- ]\\d{3}[- ]\\d{3}[- ]\\d{4}\\b|\\b\\d{3}[- ]\\d{3}[- ]\\d{4}\\b',
                       '<PHONE>', 'g') AS t2
              FROM s1)
            SELECT c_custkey, n_email, n_phone,
                   len(regexp_extract_all(t2,
                     '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'))::INTEGER AS n_ipv4,
                   regexp_replace(t2,
                     '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b',
                     '<IP>', 'g') AS redacted
            FROM s2
        """,
        "docs_decontam": """
            WITH tok AS (
              SELECT doc_id,
                     list_filter(
                       string_split_regex(
                         regexp_replace(lower(text), '[^a-z0-9一-鿿 ]', ' ', 'g'), ' +'),
                       t -> t <> '') AS toks
              FROM documents),
            grams AS (
              SELECT doc_id,
                     CASE WHEN len(toks) >= 8
                          THEN list_transform(
                                 generate_series(1, len(toks) - 7),
                                 i -> array_to_string(toks[i : i + 7], ' '))
                          ELSE CAST([] AS VARCHAR[]) END AS glist
              FROM tok),
            btok AS (
              SELECT list_filter(
                       string_split_regex(
                         regexp_replace(lower(substr(text, 1, 120)), '[^a-z0-9一-鿿 ]', ' ', 'g'), ' +'),
                       t -> t <> '') AS toks
              FROM documents WHERE doc_id % 50 = 0),
            bgrams AS (
              SELECT DISTINCT unnest(
                       CASE WHEN len(toks) >= 8
                            THEN list_transform(
                                   generate_series(1, len(toks) - 7),
                                   i -> array_to_string(toks[i : i + 7], ' '))
                            ELSE CAST([] AS VARCHAR[]) END) AS gram
              FROM btok),
            dg AS (SELECT doc_id, unnest(glist) AS gram FROM grams),
            hits AS (
              SELECT dg.doc_id, count(*) AS n_hit
              FROM dg JOIN bgrams USING (gram)
              GROUP BY dg.doc_id)
            SELECT g.doc_id,
                   len(g.glist)::BIGINT AS n_grams,
                   coalesce(h.n_hit, 0)::BIGINT AS n_contam_ngrams,
                   coalesce(h.n_hit, 0) > 0 AS contaminated
            FROM grams g LEFT JOIN hits h USING (doc_id)
        """,
        "docs_lm_score": """
            WITH toks AS (
              SELECT doc_id,
                     unnest(list_filter(
                       string_split_regex(
                         regexp_replace(lower(text), '[^a-z0-9一-鿿 ]', ' ', 'g'), ' +'),
                       t -> t <> '')) AS tok
              FROM documents),
            c AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
            tot AS (SELECT sum(c)::DOUBLE AS n FROM c),
            vocab AS (
              SELECT tok, ln((c + 0.5) / (n + 8.5)) AS logp
              FROM (SELECT tok, c,
                           row_number() OVER (ORDER BY c DESC, tok) AS rk
                    FROM c), tot
              WHERE rk <= 16),
            scored AS (
              SELECT t.doc_id,
                     coalesce(v.logp, (SELECT ln(0.5 / (n + 8.5)) FROM tot)) AS lp
              FROM toks t LEFT JOIN vocab v USING (tok)),
            agg AS (
              SELECT doc_id, count(*) AS n_toks, avg(lp) AS m
              FROM scored GROUP BY doc_id)
            SELECT d.doc_id,
                   coalesce(a.n_toks, 0)::BIGINT AS n_toks,
                   round(coalesce(a.m, 0.0), 6) AS mean_logprob
            FROM documents d LEFT JOIN agg a USING (doc_id)
        """,
        "spans_audit": """
            -- closed-form expected audit: the interleaved synthesis is
            -- deterministic (5 spans, offsets 0..4), the query corrupts
            -- every 7th doc's first offset (→ non-monotonic) and every
            -- 11th doc's image media_ref (→ coverage fail)
            SELECT doc_id::VARCHAR AS doc_id,
                   5::INTEGER AS n_spans,
                   2::INTEGER AS n_text,
                   1::INTEGER AS n_links,
                   1::INTEGER AS n_images,
                   (doc_id % 7 <> 0) AS offsets_monotonic,
                   (doc_id % 11 <> 0) AS media_ref_ok,
                   (length(substr(text, 1, 40)) + length(substr(text, 41, 40)))::INTEGER AS text_chars
            FROM documents
        """,
        "docs_wordfreq_topk": """
            WITH t AS (
              SELECT unnest(string_split_regex(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +')) AS word
              FROM documents),
            c AS (SELECT word, count(*) AS freq FROM t WHERE word <> '' GROUP BY word)
            SELECT word, freq, row_number() OVER (ORDER BY freq DESC, word)::INTEGER AS rnk
            FROM c QUALIFY rnk <= 20
        """,
        "docs_tfidf": """
            WITH t AS (
              SELECT doc_id,
                     unnest(string_split_regex(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +')) AS term
              FROM documents),
            t2 AS (SELECT doc_id, term FROM t WHERE term <> ''),
            tf AS (SELECT doc_id, term, count(*) AS n FROM t2 GROUP BY doc_id, term),
            tf2 AS (SELECT doc_id, term, n / sum(n) OVER (PARTITION BY doc_id) AS tf FROM tf),
            nd AS (SELECT count(DISTINCT doc_id) AS nd FROM documents),
            dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM t2 GROUP BY term),
            idf AS (SELECT term, ln(nd.nd / (1 + df)) AS idf FROM dfq CROSS JOIN nd),
            scored AS (
              SELECT doc_id, tf2.term AS term, round(tf * idf, 8) AS tfidf,
                     row_number() OVER (PARTITION BY doc_id ORDER BY round(tf * idf, 8) DESC, tf2.term)::INTEGER AS rnk
              FROM tf2 JOIN idf ON tf2.term = idf.term)
            SELECT doc_id, term, tfidf FROM scored WHERE rnk = 1
        """,
        "emb_cosine_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 3),
            s AS (
              SELECT q.query_id, e.vec_id AS neighbor_id,
                     round(list_dot_product(e.embedding::DOUBLE[], q.qv)
                           / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                              * sqrt(list_dot_product(q.qv, q.qv))), 6) AS sim
              FROM embeddings e CROSS JOIN q)
            SELECT query_id, neighbor_id, sim,
                   row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id)::INTEGER AS rank
            FROM s QUALIFY rank <= 5
        """,
        "emb_lsh_ann": _lsh_oracle(),
        "url_canonicalize": """
            WITH curls AS (
              SELECT o_orderkey AS k,
                     CASE o_orderkey % 6
                       WHEN 0 THEN 'HTTPS://Site' || (o_custkey % 7) || '.Test/Product-' || o_orderkey || '/'
                       WHEN 1 THEN 'https://site' || (o_custkey % 7) || '.test/product-' || o_orderkey || '?utm_source=google&page=2'
                       WHEN 2 THEN 'https://site' || (o_custkey % 7) || '.test/product-' || o_orderkey || '#reviews'
                       WHEN 3 THEN 'https://site' || (o_custkey % 7) || '.test/p?gclid=' || o_orderkey
                       WHEN 4 THEN 'HTTPS://Site' || (o_custkey % 7) || '.Test:443/'
                       ELSE 'https://site' || (o_custkey % 7) || '.test/a/b?x=1&fbclid=' || o_orderkey || '&y=2'
                     END AS url
              FROM orders),
            parts AS (
              SELECT k, url,
                     lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS sch,
                     lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS hst,
                     regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS pth,
                     CASE WHEN contains(url, '?')
                          THEN regexp_extract(url, '\\?([^#]*)', 1) ELSE '' END AS qry
              FROM curls),
            kept AS (
              SELECT k, url, sch,
                     CASE WHEN sch = 'http' THEN regexp_replace(hst, ':80$', '')
                          WHEN sch = 'https' THEN regexp_replace(hst, ':443$', '')
                          ELSE hst END AS hst,
                     CASE WHEN pth = '/' THEN pth
                          ELSE regexp_replace(pth, '/$', '') END AS pnorm,
                     array_to_string(list_filter(string_split(qry, '&'),
                       kv -> NOT list_contains(
                         ['utm_source','utm_medium','utm_campaign','utm_term',
                          'utm_content','gclid','fbclid','msclkid','mc_eid'],
                         split_part(kv, '=', 1))), '&') AS qkept
              FROM parts)
            SELECT k, url,
                   sch || '://' || hst || pnorm ||
                   CASE WHEN qkept <> '' THEN '?' || qkept ELSE '' END AS canonical
            FROM kept
        """,
        "emb_ivf_ann": """
            WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id >= 3 AND vec_id < 6),
            s AS (
              SELECT q.query_id, e.vec_id AS neighbor_id,
                     round(list_dot_product(e.embedding::DOUBLE[], q.qv)
                           / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                              * sqrt(list_dot_product(q.qv, q.qv))), 6) AS sim
              FROM embeddings e CROSS JOIN q)
            SELECT query_id, neighbor_id, sim,
                   row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id)::INTEGER AS rank
            FROM s QUALIFY rank <= 4
        """,
        "emb_label_norms": """
            SELECT label, count(*) AS n,
                   round(avg(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 6) AS avg_norm
            FROM embeddings GROUP BY label
        """,
        "frontier_quota": f"""
            WITH {URLS_CTE.strip()},
            kept AS (
              SELECT url, 'site' || dn || '.test' AS domain
              FROM urls
              WHERE k % 10 NOT IN (0, 1, 3)),
            counts AS (
              SELECT 'site' || r_regionkey || '.test' AS domain,
                     r_regionkey * 3 AS nf
              FROM region),
            ranked AS (
              SELECT kept.url, kept.domain,
                     coalesce(counts.nf, 0) AS nf,
                     row_number() OVER (PARTITION BY kept.domain ORDER BY kept.url)::INTEGER
                         AS rank_in_domain
              FROM kept LEFT JOIN counts ON kept.domain = counts.domain
              WHERE coalesce(counts.nf, 0) < 10)
            SELECT url, domain, rank_in_domain
            FROM ranked
            WHERE rank_in_domain <= 8 AND rank_in_domain <= 10 - nf
        """,
        "frontier_age": """
            WITH f AS (
              SELECT 'http://site' || (o_custkey % 7) || '.test/p-' || o_orderkey AS url,
                     'site' || (o_custkey % 7) || '.test' AS domain,
                     (o_orderkey % 6)::INT AS dw
              FROM orders
              WHERE o_orderkey % 3 <> 0)
            SELECT domain,
                   count(*)::BIGINT AS n_pending,
                   min(dw)::INT AS oldest_wave,
                   max(9 - dw)::INT AS max_age,
                   round(avg(9.0 - dw), 2) AS avg_age
            FROM f GROUP BY domain
        """,
        "robots_sitemaps": """
            WITH b AS (
              SELECT 'site' || r_regionkey || '.test' AS domain,
                     CASE WHEN r_regionkey % 2 = 0 THEN
                       'User-agent: *' || chr(13) || chr(10) ||
                       'Disallow: /tmp' || chr(13) || chr(10) ||
                       'Sitemap: https://site' || r_regionkey || '.test/s1.xml'
                         || chr(13) || chr(10) ||
                       'sitemap:https://site' || r_regionkey || '.test/s2.xml'
                         || chr(13) || chr(10)
                     ELSE 'User-agent: *' || chr(13) || chr(10) ||
                          'Disallow: /x' || chr(13) || chr(10) END AS body
              FROM region),
            l AS (
              SELECT domain,
                     trim(unnest(string_split(replace(body, chr(13) || chr(10), chr(10)), chr(10)))) AS ln
              FROM b)
            SELECT domain, trim(substr(ln, 9)) AS sitemap_url
            FROM l
            WHERE lower(ln) LIKE 'sitemap:%' AND trim(substr(ln, 9)) <> ''
        """,
        "domain_pagerank": """
            WITH ue AS (
              SELECT 'h' || (l_orderkey % 5) || '.test' AS sd,
                     'h' || (l_partkey % 7) || '.test' AS dd
              FROM lineitem),
            dg AS (
              SELECT sd, dd, count(*) AS n_links
              FROM ue WHERE sd <> dd GROUP BY sd, dd),
            edges AS (SELECT DISTINCT sd AS src, dd AS dst FROM dg),
            nodes AS (SELECT src AS url FROM edges UNION SELECT dst FROM edges),
            outdeg AS (SELECT src, count(*) AS od FROM edges GROUP BY src),
            r0 AS (SELECT url, 1.0::DOUBLE AS rank FROM nodes),
            r1 AS (
              SELECT n.url,
                     round(0.15 + 0.85 * coalesce(sum(r0.rank / o.od), 0), 9) AS rank
              FROM nodes n
              LEFT JOIN edges e ON e.dst = n.url
              LEFT JOIN r0 ON r0.url = e.src
              LEFT JOIN outdeg o ON o.src = e.src
              GROUP BY n.url),
            r2 AS (
              SELECT n.url,
                     round(0.15 + 0.85 * coalesce(sum(r1.rank / o.od), 0), 9) AS rank
              FROM nodes n
              LEFT JOIN edges e ON e.dst = n.url
              LEFT JOIN r1 ON r1.url = e.src
              LEFT JOIN outdeg o ON o.src = e.src
              GROUP BY n.url),
            r3 AS (
              SELECT n.url,
                     round(0.15 + 0.85 * coalesce(sum(r2.rank / o.od), 0), 9) AS rank
              FROM nodes n
              LEFT JOIN edges e ON e.dst = n.url
              LEFT JOIN r2 ON r2.url = e.src
              LEFT JOIN outdeg o ON o.src = e.src
              GROUP BY n.url),
            inbound AS (
              SELECT dd AS domain, sum(n_links)::BIGINT AS n_inbound_links
              FROM dg GROUP BY dd)
            SELECT r3.url AS domain, r3.rank::DOUBLE AS rank,
                   coalesce(i.n_inbound_links, 0)::BIGINT AS n_inbound_links
            FROM r3 LEFT JOIN inbound i ON r3.url = i.domain
        """,
        "url_templates": f"""
            WITH {URLS_CTE.strip()},
            t AS (
              SELECT url,
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(url,
                           '[0-9a-fA-F]{{8}}-[0-9a-fA-F]{{4}}-[0-9a-fA-F]{{4}}-[0-9a-fA-F]{{4}}-[0-9a-fA-F]{{12}}',
                           '{{uuid}}', 'g'),
                         '[0-9a-f]{{16,}}', '{{hex}}', 'g'),
                       '[0-9]+', '{{n}}', 'g') AS template
              FROM urls)
            SELECT template, count(*)::BIGINT AS n_urls, min(url) AS example_url
            FROM t GROUP BY template
        """,
        "cache_control": """
            WITH log AS (
              SELECT event_id,
                     CASE event_id % 5
                       WHEN 0 THEN 'public, max-age=300'
                       WHEN 1 THEN 'no-cache'
                       WHEN 2 THEN 'public'
                       WHEN 3 THEN 'max-age=86400, stale-while-revalidate=60'
                       ELSE NULL END AS cache_control,
                     epoch_us(ts) AS fetch_us
              FROM events),
            p AS (
              SELECT *,
                     TRY_CAST(regexp_extract(
                       lower(coalesce(cache_control, '')),
                       'max-age=([0-9]+)', 1) AS BIGINT) AS max_age_s,
                     (lower(coalesce(cache_control, '')) LIKE '%no-store%'
                      OR lower(coalesce(cache_control, '')) LIKE '%no-cache%')
                         AS no_store
              FROM log)
            SELECT event_id, cache_control, fetch_us, max_age_s, no_store,
                   (fetch_us + (CASE WHEN no_store THEN 0
                                     ELSE coalesce(max_age_s, 3600) END)
                              * 1000000)::BIGINT AS next_fetch_us
            FROM p
        """,
        "schedule_audit": """
            WITH log AS (
              SELECT 'd' || (user_id % 20) AS domain, epoch_us(ts) AS fetch_us
              FROM events),
            g AS (
              SELECT domain,
                     fetch_us - lag(fetch_us) OVER (
                       PARTITION BY domain ORDER BY fetch_us) AS gap_us
              FROM log)
            SELECT domain,
                   count(*)::BIGINT AS n_fetches,
                   min(gap_us)::BIGINT AS min_gap_us,
                   coalesce(sum(CASE WHEN gap_us < 30000000 THEN 1 ELSE 0 END)
                            FILTER (WHERE gap_us IS NOT NULL), 0)::BIGINT
                       AS n_violations,
                   coalesce(sum(CASE WHEN gap_us < 30000000 THEN 1 ELSE 0 END)
                            FILTER (WHERE gap_us IS NOT NULL), 0) = 0
                       AS politeness_ok
            FROM g GROUP BY domain
        """,
        "crawl_diff": """
            WITH docs AS (
              SELECT 'https://d.test/' || doc_id AS url, doc_id, text
              FROM documents),
            old AS (
              SELECT url, md5(text) AS old_fp
              FROM docs WHERE doc_id % 17 <> 3),
            new AS (
              SELECT url,
                     md5(CASE WHEN doc_id % 7 = 2 THEN text || ' v2'
                              ELSE text END) AS new_fp
              FROM docs WHERE doc_id % 13 <> 5),
            d AS (
              SELECT coalesce(old.url, new.url) AS url,
                     CASE WHEN old_fp IS NULL THEN 'added'
                          WHEN new_fp IS NULL THEN 'removed'
                          WHEN old_fp = new_fp THEN 'unchanged'
                          ELSE 'changed' END AS status
              FROM old FULL OUTER JOIN new ON old.url = new.url)
            SELECT status, count(*)::BIGINT AS n, min(url) AS first_url
            FROM d GROUP BY status
        """,
        "recrawl_schedule": """
            WITH h AS (
              SELECT 'https://h.test/p-' || (user_id % 500) AS url,
                     ts, (event_id % 3 = 0) AS changed
              FROM events),
            a AS (
              SELECT url, count(*) AS n_obs,
                     sum(CASE WHEN changed THEN 1 ELSE 0 END) AS n_changes,
                     max(epoch_us(ts)) AS last_us
              FROM h GROUP BY url)
            SELECT url,
                   n_obs::BIGINT AS n_obs,
                   n_changes::BIGINT AS n_changes,
                   round(n_changes::DOUBLE / n_obs, 6) AS change_rate,
                   round(604800.0 * pow(3600.0 / 604800.0, n_changes::DOUBLE / n_obs), 6)
                       AS interval_s,
                   (last_us
                    + floor(round(604800.0 * pow(3600.0 / 604800.0, n_changes::DOUBLE / n_obs), 6)
                            * 1000000.0)::BIGINT)::BIGINT AS next_fetch_us
            FROM a
        """,
        "redirect_resolve": """
            WITH RECURSIVE ru AS (
              SELECT o_orderkey AS k,
                     'https://r.test/u-' || o_orderkey AS url
              FROM orders),
            redges AS (
              SELECT 'https://r.test/u-' || o_orderkey AS src,
                     'https://r.test/v-' || o_orderkey AS dst
              FROM orders WHERE o_orderkey % 5 = 1
              UNION ALL
              SELECT 'https://r.test/v-' || o_orderkey,
                     'https://r.test/w-' || o_orderkey
              FROM orders WHERE o_orderkey % 25 = 6
              UNION ALL
              SELECT 'https://r.test/v-' || o_orderkey,
                     'https://r.test/u-' || o_orderkey
              FROM orders WHERE o_orderkey % 50 = 11),
            walk(k, url, cur, hops) AS (
              SELECT k, url, url, 0 FROM ru
              UNION ALL
              SELECT w.k, w.url, e.dst, w.hops + 1
              FROM walk w JOIN redges e ON w.cur = e.src
              WHERE w.hops < 8),
            f AS (
              SELECT k, url, arg_max(cur, hops) AS final_url,
                     max(hops) AS n_hops
              FROM walk GROUP BY k, url)
            SELECT k, url, final_url, n_hops::INTEGER AS n_hops,
                   final_url NOT IN (SELECT src FROM redges) AS is_terminal
            FROM f
        """,
        "robots_rep": f"""
            WITH {URLS_CTE.strip()},
            {ROBOTS_REP_RULES_CTE.strip()},
            t AS (
              SELECT k, url,
                     CASE WHEN k % 10 = 3 THEN 'offsite.example'
                          ELSE 'site' || dn || '.test' END AS domain,
                     -- RFC 3986 §6.2.3: absent path ≡ '/' (mirrors
                     -- rep_target; corpus URLs always carry a path, so
                     -- this is defensive parity)
                     CASE WHEN regexp_extract(url, '^[a-z]+://[^/?#]*([^#]*)', 1) LIKE '/%'
                          THEN regexp_extract(url, '^[a-z]+://[^/?#]*([^#]*)', 1)
                          ELSE '/' || regexp_extract(url, '^[a-z]+://[^/?#]*([^#]*)', 1)
                     END AS target
              FROM urls),
            m AS (
              SELECT t.k, t.url, t.domain, r.allow, r.pattern
              FROM t LEFT JOIN rep_rules r ON t.domain = r.domain AND
                (CASE WHEN r.pattern LIKE '%$'
                      THEN t.target GLOB substr(r.pattern, 1, length(r.pattern) - 1)
                      ELSE t.target GLOB (r.pattern || '*') END)),
            mm AS (
              SELECT k, url, domain, allow, pattern,
                     max(length(pattern)) OVER (PARTITION BY k) AS best
              FROM m),
            v AS (
              SELECT k, url, domain,
                     CASE WHEN count(pattern) = 0 THEN false
                          ELSE NOT coalesce(bool_or(allow AND length(pattern) = best), false)
                     END AS robots_blocked
              FROM mm GROUP BY k, url, domain)
            SELECT v.k, v.url, v.robots_blocked,
                   coalesce(d.delay, 25.0)::DOUBLE AS crawl_delay
            FROM v LEFT JOIN rep_delays d ON v.domain = d.domain
        """,
        "anchor_profile": """
            WITH l AS (
              SELECT 'doc-' || doc_id AS src,
                     'https://docs.test/doc-' || ((doc_id * 3) % 500) AS url,
                     'home' AS anchor
              FROM documents
              UNION ALL
              SELECT 'doc-' || doc_id,
                     'https://docs.test/doc-' || ((doc_id * 3 + 17) % 500),
                     substr(text, 1, 6)
              FROM documents
              UNION ALL
              SELECT 'doc-' || doc_id,
                     'https://docs.test/doc-' || ((doc_id * 3 + 34) % 500),
                     'read more'
              FROM documents),
            pa AS (SELECT url, anchor, count(*) AS cnt FROM l GROUP BY url, anchor),
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY url ORDER BY cnt DESC, anchor) AS rn
              FROM pa),
            agg AS (
              SELECT url, sum(cnt)::BIGINT AS n_inlinks,
                     count(*)::BIGINT AS n_distinct_anchors
              FROM pa GROUP BY url),
            srcs AS (
              SELECT url, count(DISTINCT src)::BIGINT AS n_src_pages
              FROM l GROUP BY url)
            SELECT agg.url, n_inlinks, n_src_pages, n_distinct_anchors,
                   r.anchor AS top_anchor, r.cnt::BIGINT AS top_anchor_count
            FROM agg
            JOIN ranked r ON agg.url = r.url AND r.rn = 1
            JOIN srcs ON agg.url = srcs.url
        """,
        "image_text_pairs": """
            WITH sp AS (
              SELECT doc_id::VARCHAR AS doc_id,
                     list_filter([
                       struct_pack(kind := 'text',
                                   txt := substr(text, 1, 30),
                                   mref := '', off := 0),
                       struct_pack(kind := 'image',
                                   txt := CASE WHEN doc_id % 4 = 0 THEN ''
                                               ELSE 'alt-' || doc_id END,
                                   mref := 'https://img.test/i-' || doc_id || '.jpg',
                                   off := 1),
                       struct_pack(kind := 'text',
                                   txt := substr(text, 31, 25),
                                   mref := '', off := 2),
                       struct_pack(kind := 'link', txt := 'next',
                                   mref := 'https://docs.test/doc-' || ((doc_id + 1) % 500),
                                   off := 3),
                       struct_pack(kind := 'image', txt := '',
                                   mref := 'https://img.test/j-' || doc_id || '.jpg',
                                   off := 4),
                       struct_pack(kind := 'email',
                                   txt := 'c' || doc_id || '@docs.test',
                                   mref := '', off := 5)
                     ], s -> CASE s.off
                               WHEN 0 THEN doc_id % 7 <> 0
                               WHEN 1 THEN doc_id % 2 = 0
                               WHEN 4 THEN doc_id % 3 = 0
                               WHEN 5 THEN doc_id % 5 = 0
                               ELSE true END) AS spans
              FROM documents),
            u AS (
              SELECT doc_id, unnest(spans, recursive := true)
              FROM sp),
            w AS (
              SELECT doc_id, kind, txt, mref, off,
                     last_value(CASE WHEN kind = 'text' THEN txt END IGNORE NULLS)
                       OVER (PARTITION BY doc_id ORDER BY off
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS text_before,
                     first_value(CASE WHEN kind = 'text' THEN txt END IGNORE NULLS)
                       OVER (PARTITION BY doc_id ORDER BY off
                             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                       AS text_after
              FROM u)
            SELECT doc_id, mref AS src, txt AS alt, off::INT AS offset,
                   text_before, text_after
            FROM w WHERE kind = 'image'
        """,
        "interleave_profile": """
            WITH sp AS (
              SELECT doc_id::VARCHAR AS doc_id,
                     list_filter([
                       struct_pack(kind := 'text',
                                   txt := substr(text, 1, 30),
                                   off := 0),
                       struct_pack(kind := 'image',
                                   txt := CASE WHEN doc_id % 4 = 0 THEN ''
                                               ELSE 'alt-' || doc_id END,
                                   off := 1),
                       struct_pack(kind := 'text',
                                   txt := substr(text, 31, 25),
                                   off := 2),
                       struct_pack(kind := 'link', txt := 'next', off := 3),
                       struct_pack(kind := 'image', txt := '', off := 4),
                       struct_pack(kind := 'email',
                                   txt := 'c' || doc_id || '@docs.test',
                                   off := 5)
                     ], s -> CASE s.off
                               WHEN 0 THEN doc_id % 7 <> 0
                               WHEN 1 THEN doc_id % 2 = 0
                               WHEN 4 THEN doc_id % 3 = 0
                               WHEN 5 THEN doc_id % 5 = 0
                               ELSE true END) AS spans
              FROM documents),
            b AS (
              SELECT doc_id, spans,
                     len(spans) AS n,
                     len(list_filter(spans, s -> s.kind = 'image')) AS ni,
                     len(list_filter(spans, s -> s.kind = 'image' AND s.txt <> '')) AS nalt,
                     list_concat(list_concat(
                       [0],
                       list_filter(list_transform(spans,
                           (s, i) -> CASE WHEN s.kind <> 'text' THEN i END),
                         v -> v IS NOT NULL)),
                       [len(spans) + 1]) AS bounds
              FROM sp)
            SELECT doc_id,
                   round(CASE WHEN n > 0 THEN ni::DOUBLE / n ELSE 0.0 END, 6) AS media_ratio,
                   CASE WHEN ni > 0 THEN round(nalt::DOUBLE / ni, 6) END AS image_alt_coverage,
                   (n > 0 AND spans[1].kind = 'text') AS starts_with_text,
                   (n > 0 AND spans[n].kind = 'image') AS ends_with_media,
                   list_max(list_transform(generate_series(1, len(bounds) - 1),
                       i -> bounds[i + 1] - bounds[i] - 1))::INTEGER AS max_text_run
            FROM b
        """,
        "seo_audit": """
            WITH s AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 5 <> 0
                          THEN substr(text, 1, (30 + (doc_id % 3) * 20)::INTEGER)
                          ELSE '' END AS title,
                     substr(text, 1, (100 + (doc_id % 4) * 20)::INTEGER) AS descr
              FROM documents)
            SELECT doc_id,
                   title <> '' AS has_title,
                   length(title)::INTEGER AS title_length,
                   length(title) <= 60 AS title_is_valid,
                   (doc_id % 3 <> 0) AS has_h1,
                   CASE WHEN doc_id % 3 <> 0 THEN 'Doc ' || doc_id END AS h1,
                   length(descr)::INTEGER AS description_length,
                   length(descr) <= 150 AS description_is_valid,
                   CASE WHEN doc_id % 2 = 0 THEN 50.0 ELSE 0.0 END AS pct_images_with_no_alt,
                   CASE WHEN doc_id % 2 = 0 THEN '|logo'
                        ELSE 'alt-' || doc_id || '|logo' END AS image_alts,
                   (doc_id % 4 = 0) AS has_structured_data,
                   CASE WHEN doc_id % 4 = 0 THEN 'Article' END AS structured_data_type
            FROM s
        """,
        "docs_stemmed_topk": f"""
            WITH t AS (
              SELECT unnest(string_split_regex(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +')) AS w
              FROM documents),
            t1 AS (SELECT w FROM t WHERE w <> ''),
            a AS (SELECT ({_SEO_STEP_A}) AS sa FROM t1),
            b AS (SELECT ({_SEO_STEP_B}) AS sb FROM a),
            s AS (SELECT ({_SEO_STEP_C}) AS stem FROM b),
            c AS (SELECT stem, count(*) AS freq FROM s GROUP BY stem)
            SELECT stem, freq,
                   row_number() OVER (ORDER BY freq DESC, stem)::INTEGER AS rnk
            FROM c QUALIFY rnk <= 20
        """,
        "product_models": """
            SELECT p_partkey AS product_id,
                   p_name AS name,
                   replace(trim(regexp_replace(p_name, ' +', ' ', 'g')), ' ', '_')
                     || '_' || p_partkey AS complex_name,
                   'https://shop.test/product-' || p_partkey AS url,
                   p_partkey::VARCHAR AS collection_id,
                   round(p_retailprice, 2) AS price,
                   array_to_string(list_sort(list_value(
                     'https://img.test/p' || p_partkey || '-1.jpg',
                     'https://img.test/p' || p_partkey || '-2.jpg')), '|') AS images,
                   2 AS number_of_images,
                   array_to_string(list_value('EU' || p_size,
                     CASE WHEN p_size < 15 THEN 'S'
                          WHEN p_size < 30 THEN 'M' ELSE 'L' END), '|') AS sizes,
                   (p_partkey % 7 = 0) AS out_of_stock
            FROM part
        """,
        "doc_spans_extract": """
            SELECT doc_id::VARCHAR AS doc_id,
                   substr(text, 1, 40) || ' ' || substr(text, 41, 40) AS text,
                   1::BIGINT AS n_links,
                   'https://docs.test/doc-' || ((doc_id + 1) % 500) AS first_link,
                   'alt-' || doc_id AS alt,
                   'https://img.test/i-' || doc_id || '.jpg' AS src,
                   'c' || doc_id || '@docs.test' AS email
            FROM documents
        """,
        "emb_near_dup": """
            WITH e AS (
              SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
            SELECT a.label,
                   a.vec_id AS vec_a, b.vec_id AS vec_b,
                   round(list_dot_product(a.v, b.v)
                         / (sqrt(list_dot_product(a.v, a.v))
                            * sqrt(list_dot_product(b.v, b.v))), 6) AS sim
            FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE round(list_dot_product(a.v, b.v)
                        / (sqrt(list_dot_product(a.v, a.v))
                           * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.30
        """,
        "media_decode": """
            -- the fake-codec wire format is deterministic in the row
            -- index, so the mapInPandas binary decode is fully
            -- oracle-checkable: the oracle states the expected header
            -- fields the Spark side must recover by struct-unpacking
            -- the blobs (12-byte FAKEIMG! / 16-byte FAKEAUD! headers).
            SELECT
              CASE i % 3 WHEN 0 THEN 'img' || i
                         WHEN 1 THEN 'aud' || i
                         ELSE 'vid' || i END AS media_id,
              CASE i % 3 WHEN 0 THEN 'image'
                         WHEN 1 THEN 'audio'
                         ELSE 'video' END AS kind,
              (CASE WHEN i % 3 = 0 THEN 100 + i END)::INTEGER AS width,
              (CASE WHEN i % 3 = 0 THEN 50 + i END)::INTEGER AS height,
              (CASE WHEN i % 3 = 1 THEN 8000 + i END)::INTEGER AS sample_rate,
              (CASE WHEN i % 3 = 1 THEN 1000 * i END)::INTEGER AS n_samples,
              (CASE i % 3 WHEN 0 THEN 12 WHEN 1 THEN 16 ELSE 0 END)::BIGINT AS n_bytes,
              i % 3 IN (0, 1) AS ok
            FROM generate_series(0, 63) t(i)
            ORDER BY media_id
        """,
        "media_dedup": """
            -- the blobs are deterministic in i (image dims = i % 5,
            -- audio params = i % 4), so the duplicate-group structure
            -- is closed-form; videos carry NULL data and are excluded
            WITH m AS (
              SELECT i,
                     CASE WHEN i % 3 = 0 THEN 'img' || i ELSE 'aud' || i END AS media_id,
                     CASE WHEN i % 3 = 0 THEN 'I' || (i % 5) ELSE 'A' || (i % 4) END AS cls
              FROM generate_series(0, 63) t(i)
              WHERE i % 3 IN (0, 1))
            SELECT count(*)::BIGINT AS group_size, min(media_id) AS keep_media_id
            FROM m GROUP BY cls
            HAVING count(*) > 1
        """,
        "emb_quantize": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
            m AS (SELECT vec_id, x,
                         list_max(list_transform(x, v -> abs(v))) AS mx
                  FROM e)
            SELECT vec_id,
                   CASE WHEN mx > 0 THEN round(mx / 127.0, 8) ELSE 0.0 END AS q_scale,
                   CASE WHEN mx > 0
                        THEN array_to_string(list_transform(x, v -> round(v * 127.0 / mx)::INTEGER), '|')
                        ELSE array_to_string(list_transform(x, v -> 0), '|') END AS q_emb
            FROM m
        """,
        "url_trap_score": f"""
            WITH {TRAP_URLS_CTE.strip()},
            parts AS (
              SELECT k, url,
                     regexp_replace(regexp_extract(url, '^[a-z]+://[^/?#]*([^?#]*)', 1),
                                    ';[^/]*$', '') AS path,
                     regexp_extract(regexp_extract(url, '^[a-z]+://[^/?#]*([^?#]*)', 1),
                                    ';([^/]*)$', 1) AS pparams,
                     regexp_extract(url, '[?]([^#]*)', 1) AS query
              FROM trap_urls),
            segs AS (
              SELECT k, url, pparams, query,
                     list_filter(string_split(path, '/'), s -> s <> '') AS seg
              FROM parts),
            sig AS (
              SELECT k, url,
                     len(seg)::INTEGER AS path_depth,
                     (CASE WHEN len(seg) = 0 THEN 0
                           ELSE list_max(list_transform(seg,
                                s -> len(list_filter(seg, x -> x = s))))
                      END)::INTEGER AS max_seg_repeat,
                     len(list_filter(seg, s -> regexp_matches(s, '^[0-9]+$')))::INTEGER
                         AS n_numeric_segs,
                     (CASE WHEN query = '' THEN 0
                           ELSE len(list_filter(string_split(query, '&'), kv -> kv <> ''))
                      END)::INTEGER AS n_query_params,
                     ((pparams <> '' AND lower(split_part(pparams, '=', 1)) IN
                        ('sid','sessionid','session_id','phpsessid','jsessionid',
                         'cfid','cftoken','aspsessionid','zenid'))
                      OR len(list_filter(string_split(lower(query), '&'),
                             kv -> kv <> '' AND split_part(kv, '=', 1) IN
                               ('sid','sessionid','session_id','phpsessid','jsessionid',
                                'cfid','cftoken','aspsessionid','zenid'))) > 0)
                         AS has_session_id,
                     length(url)::INTEGER AS url_len
              FROM segs)
            SELECT k, url, path_depth, max_seg_repeat, n_numeric_segs,
                   n_query_params, has_session_id,
                   ((CASE WHEN max_seg_repeat >= 3 THEN 2 ELSE 0 END)
                    + (CASE WHEN has_session_id THEN 2 ELSE 0 END)
                    + (CASE WHEN path_depth >= 8 THEN 1 ELSE 0 END)
                    + (CASE WHEN n_numeric_segs >= 4 THEN 1 ELSE 0 END)
                    + (CASE WHEN n_query_params >= 6 THEN 1 ELSE 0 END)
                    + (CASE WHEN url_len >= 200 THEN 1 ELSE 0 END))::INTEGER AS trap_score,
                   ((CASE WHEN max_seg_repeat >= 3 THEN 2 ELSE 0 END)
                    + (CASE WHEN has_session_id THEN 2 ELSE 0 END)
                    + (CASE WHEN path_depth >= 8 THEN 1 ELSE 0 END)
                    + (CASE WHEN n_numeric_segs >= 4 THEN 1 ELSE 0 END)
                    + (CASE WHEN n_query_params >= 6 THEN 1 ELSE 0 END)
                    + (CASE WHEN url_len >= 200 THEN 1 ELSE 0 END)) >= 2 AS is_trap
            FROM sig
        """,
        "domain_stats": """
            WITH per_doc AS (
              SELECT source AS domain,
                     md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
                     round(0.4 * least(length(text) / 500.0, 1.0)
                         + 0.4 * least((CASE WHEN len(string_split_regex(lower(text), '\\s+')) > 0
                                             THEN len(list_filter(string_split_regex(lower(text), '\\s+'),
                                                  t -> t IN ('the','of','and','a','to','in','is','it','you','that','was','for','on','are','as','with','his','they','at')))::DOUBLE
                                                  / len(string_split_regex(lower(text), '\\s+'))
                                             ELSE 0 END) * 4.0, 1.0)
                         + 0.2 * (1.0 - least(((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::DOUBLE
                                               / greatest(length(text), 1)) * 5.0, 1.0)), 6) AS q,
                     length(text) AS nc,
                     CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS en
              FROM documents),
            s1 AS (
              SELECT domain, fp, count(*) AS n, sum(q) AS sum_q,
                     sum(nc) AS sum_nc, sum(en) AS sum_en
              FROM per_doc GROUP BY domain, fp)
            SELECT domain,
                   sum(n)::BIGINT AS n_docs,
                   count(*)::BIGINT AS n_distinct,
                   round(1.0 - count(*)::DOUBLE / sum(n)::DOUBLE, 6) AS dup_rate,
                   round(sum(sum_q)::DOUBLE / sum(n)::DOUBLE, 6) AS avg_quality,
                   round(sum(sum_nc)::DOUBLE / sum(n)::DOUBLE, 6) AS avg_chars,
                   round(sum(sum_en)::DOUBLE / sum(n)::DOUBLE, 6) AS en_share
            FROM s1 GROUP BY domain
        """,
        "route_dispatch": f"""
            WITH {URLS_CTE.strip()}
            SELECT k, url,
                   CASE
                     WHEN regexp_matches(url, '/img/') THEN 'media'
                     WHEN regexp_matches(url, '[?]page=') THEN 'listing'
                     WHEN regexp_matches(url, 'offsite') THEN 'external'
                     WHEN regexp_matches(url, '#reviews$') THEN 'reviews'
                     WHEN regexp_matches(url, 'product-[0-9]+$') THEN 'product'
                     ELSE 'other'
                   END AS route
            FROM urls
        """,
        "sitemap_entries": """
            WITH p AS (
              SELECT 'https://shop.test/sm' || p_partkey || '.xml' AS sitemap_url,
                     '<urlset><url><loc> https://shop.test/p' || p_partkey
                     || ' </loc><lastmod>2024-03-'
                     || lpad(((p_partkey % 28) + 1)::VARCHAR, 2, '0')
                     || '</lastmod><changefreq>'
                     || (['always','hourly','daily','weekly','monthly',
                          'yearly','never'])[(p_partkey % 7)::INT + 1]
                     || '</changefreq><priority>0.' || (p_partkey % 10)
                     || '</priority></url><url><loc>https://shop.test/q'
                     || p_partkey || '</loc></url></urlset>' AS xml
              FROM part
            ), e AS (
              SELECT sitemap_url,
                     unnest(regexp_extract_all(xml, '(?s)<url>(.*?)</url>', 1)) AS entry
              FROM p
            ), x AS (
              SELECT sitemap_url,
                     regexp_extract(entry, '(?s)<loc>\\s*(.*?)\\s*</loc>', 1) AS url,
                     nullif(regexp_extract(entry,
                       '(?s)<lastmod>\\s*(.*?)\\s*</lastmod>', 1), '') AS lastmod,
                     nullif(lower(regexp_extract(entry,
                       '(?s)<changefreq>\\s*(.*?)\\s*</changefreq>', 1)), '') AS changefreq,
                     try_cast(nullif(regexp_extract(entry,
                       '(?s)<priority>\\s*(.*?)\\s*</priority>', 1), '') AS DOUBLE) AS priority
              FROM e
            )
            SELECT sitemap_url, url, lastmod, changefreq, priority,
                   (CASE changefreq
                      WHEN 'always' THEN 300 WHEN 'hourly' THEN 3600
                      WHEN 'daily' THEN 86400 WHEN 'weekly' THEN 604800
                      WHEN 'monthly' THEN 2592000 WHEN 'yearly' THEN 31536000
                    END)::BIGINT AS interval_hint_s
            FROM x WHERE url <> ''
        """,
        "warc_roundtrip": """
            -- the WARC archive is synthesized from documents with
            -- Content-Length = UTF-8 BYTES of text (spec octets; DuckDB
            -- strlen = bytes, length = chars) and body = text, so the
            -- parsed records must reproduce the table exactly
            SELECT 'https://docs.test/doc-' || doc_id AS target_uri,
                   'response' AS warc_type,
                   strlen(text)::BIGINT AS content_length,
                   md5(text) AS body_md5
            FROM documents
        """,
        "sitemap_seeds": """
            -- closed-form: even regions emit a 3-loc urlset (first loc
            -- whitespace-padded, trimmed by the parser); odd regions an
            -- index row pointing at a child sitemap
            WITH r AS (SELECT r_regionkey AS k FROM region),
            u AS (
              SELECT 'https://r' || k || '.test/sitemap.xml' AS sitemap_url,
                     'url' AS kind,
                     unnest(list_value(
                       'https://r' || k || '.test/a',
                       'https://r' || k || '.test/b',
                       'https://r' || k || '.test/c')) AS url
              FROM r WHERE k % 2 = 0),
            s AS (
              SELECT 'https://r' || k || '.test/sitemap.xml' AS sitemap_url,
                     'sitemap' AS kind,
                     'https://r' || k || '.test/sitemap-products.xml' AS url
              FROM r WHERE k % 2 = 1)
            SELECT * FROM u UNION ALL SELECT * FROM s
        """,
        "robots_parse": """
            -- closed-form expected parse per synthesis class:
            -- %3=0: '*' section with /img/ + /n<k>/ and crawl-delay 2+k%5
            -- %3=1: googlebot-only body → no rules for '*'
            -- %3=2: allow-all '*' section (empty Disallow dropped)
            SELECT 'nation' || n_nationkey || '.test' AS domain,
                   CASE WHEN n_nationkey % 3 = 0
                        THEN '/img/|/n' || n_nationkey || '/'
                        ELSE '' END AS disallow,
                   CASE WHEN n_nationkey % 3 = 0
                        THEN (n_nationkey % 5 + 2)::DOUBLE END AS crawl_delay
            FROM nation
        """,
        "robots_join": f"""
            WITH {URLS_CTE.strip()},
            pending AS (
              SELECT url,
                     CASE WHEN k % 10 = 3 THEN 'offsite.example'
                          ELSE 'site' || dn || '.test' END AS domain,
                     CASE WHEN k % 10 = 3 THEN '/item-' || k
                          WHEN k % 10 = 0 THEN '/img/photo-' || k || '.jpg'
                          WHEN k % 10 = 1 THEN '/product-' || k
                          WHEN k % 10 = 2 THEN '/products'
                          ELSE '/product-' || k END AS path
              FROM urls),
            robots AS (
              SELECT 'site' || r_regionkey || '.test' AS domain,
                     (r_regionkey % 2 = 0) AS dis,
                     (5.0 + r_regionkey)::DOUBLE AS rdelay
              FROM region)
            SELECT p.domain,
                   sum(CASE WHEN coalesce(r.dis, FALSE) AND p.path LIKE '/img/%'
                            THEN 1 ELSE 0 END)::BIGINT AS n_blocked,
                   count(*) AS n_urls,
                   max(coalesce(r.rdelay, 25.0))::DOUBLE AS crawl_delay
            FROM pending p LEFT JOIN robots r ON p.domain = r.domain
            GROUP BY p.domain
        """,
        "url_distribution": """
            WITH edges AS (
              SELECT 'https://site' || (l_orderkey % 7) || '.test/order-' || l_orderkey AS src_url,
                     'https://site' || (l_orderkey % 7) || '.test/part-' || l_partkey AS dst_url
              FROM lineitem)
            SELECT src_url,
                   array_to_string(list_sort(list(dst_url)), '|') AS out_links,
                   count(*) AS n_links
            FROM edges GROUP BY src_url
        """,
        "link_pagerank": """
            WITH edges AS (
              SELECT DISTINCT
                'https://site' || (l_orderkey % 7) || '.test/order-' || l_orderkey AS src,
                'https://site' || (l_orderkey % 7) || '.test/part-' || l_partkey AS dst
              FROM lineitem),
            nodes AS (SELECT src AS url FROM edges UNION SELECT dst FROM edges),
            outdeg AS (SELECT src, count(*) AS od FROM edges GROUP BY src),
            r0 AS (SELECT url, 1.0::DOUBLE AS rank FROM nodes),
            r1 AS (
              SELECT n.url,
                     round(0.15 + 0.85 * coalesce(sum(r0.rank / o.od), 0), 9) AS rank
              FROM nodes n
              LEFT JOIN edges e ON e.dst = n.url
              LEFT JOIN r0 ON r0.url = e.src
              LEFT JOIN outdeg o ON o.src = e.src
              GROUP BY n.url),
            r2 AS (
              SELECT n.url,
                     round(0.15 + 0.85 * coalesce(sum(r1.rank / o.od), 0), 9) AS rank
              FROM nodes n
              LEFT JOIN edges e ON e.dst = n.url
              LEFT JOIN r1 ON r1.url = e.src
              LEFT JOIN outdeg o ON o.src = e.src
              GROUP BY n.url),
            r3 AS (
              SELECT n.url,
                     round(0.15 + 0.85 * coalesce(sum(r2.rank / o.od), 0), 9) AS rank
              FROM nodes n
              LEFT JOIN edges e ON e.dst = n.url
              LEFT JOIN r2 ON r2.url = e.src
              LEFT JOIN outdeg o ON o.src = e.src
              GROUP BY n.url)
            SELECT url, rank::DOUBLE AS rank FROM r3
        """,
        "doc_emails": """
            WITH texts AS (
              SELECT c_custkey,
                     'contact ' || lower(replace(c_name, '#', '.')) ||
                     '@site' || (c_custkey % 7) || '.test via @support now' AS text
              FROM customer),
            toks AS (
              SELECT DISTINCT c_custkey,
                     unnest(string_split(text, ' ')) AS tok
              FROM texts)
            SELECT c_custkey, tok AS email
            FROM toks
            WHERE contains(tok, '@') AND NOT starts_with(tok, '@')
              AND regexp_matches(tok, '\\S+@\\S+')
        """,
        "frontier_reorder": f"""
            WITH {URLS_CTE.strip()}
            SELECT url,
                   regexp_matches(url, '/products') AS matched,
                   row_number() OVER (
                     ORDER BY regexp_matches(url, '/products') DESC, url
                   )::INTEGER AS rk
            FROM urls
        """,
        "query_params_map": f"""
            WITH {URLS_CTE.strip()}
            SELECT k,
                   regexp_extract(url, 'page=([0-9]+)', 1)::INTEGER AS page,
                   1 AS n_params
            FROM urls
            WHERE contains(url, '?')
        """,
        "completion_stats": f"""
            WITH {URLS_CTE.strip()},
            valid AS (
              SELECT k FROM urls
              WHERE k % 10 NOT IN (0, 1, 3))
            SELECT sum(CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_visited,
                   sum(CASE WHEN k % 2 = 0 THEN 0 ELSE 1 END)::BIGINT AS n_pending,
                   ((10000 * sum(CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END)) // count(*))::BIGINT AS completion_bp
            FROM valid
        """,
        "revenue_by_nation": """
            SELECT n_name,
                   round(sum(l_extendedprice::DECIMAL(18,2) * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2)))::DOUBLE, 2) AS revenue,
                   count(DISTINCT o_orderkey) AS n_orders
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
    }
