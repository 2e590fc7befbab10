"""Deterministic synthetic web graph of interleaved documents.

Emits the FIXTURES.md §1 `documents(doc_id, spans)` shape, modeled on
the reference's golden pages and e-commerce URL families
(/root/reference/tests/pages/*.html, tests/utils/test_urls.py:8-21,
tests/test_spider.py:340-358): home → paginated list pages →
product detail pages, plus legal/about/wishlist, image links, fragment
and relative variants, off-domain links, emails, and data: image refs.

Two generators:
- ``synth_site`` — pure-Python rows (small scale) shared by the Spark
  engine tests AND the Python oracle, so both crawl the same graph.
- ``synth_frontier_df`` — Spark-side 10^6..10^8-row frontier built from
  ``sequence``/``explode`` for throughput benchmarks (the 10^10 design
  point is exercised via partition math, never materialized locally).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kryptone_spark import schemas

ACCENT_WORDS = ["bébé", "fille", "tee-shirt", "été", "curaçao", "naïve", "prix"]
PLAIN_WORDS = [
    "new", "sale", "classic", "cotton", "denim", "summer", "winter",
    "dress", "shirt", "shoes", "the", "of", "and", "a", "to", "in", "is",
]


def _text(rng: random.Random, n: int) -> str:
    words = [rng.choice(PLAIN_WORDS + ACCENT_WORDS) for _ in range(n)]
    return " ".join(words)


def synth_site(
    n_domains: int = 2,
    n_products: int = 20,
    page_size: int = 8,
    seed: int = 42,
    hot_domain_share: float = 0.0,
) -> list[dict]:
    """Returns rows ``{"doc_id": url, "spans": [(kind, text, media_ref,
    offset), ...]}`` — spans as dicts. Deterministic in ``seed``.

    ``hot_domain_share`` > 0 skews product counts toward domain 0 to
    exercise salted partitioning / AQE skew handling.
    """
    rng = random.Random(seed)
    rows: list[dict] = []
    domains = [f"site{chr(ord('a') + i)}.test" for i in range(n_domains)]

    for di, dom in enumerate(domains):
        if hot_domain_share > 0 and n_domains > 1:
            if di == 0:
                np_d = max(1, int(n_products * n_domains * hot_domain_share))
            else:
                np_d = max(
                    1,
                    int(n_products * n_domains * (1 - hot_domain_share) / (n_domains - 1)),
                )
        else:
            np_d = n_products
        base = f"http://{dom}"
        n_pages = (np_d + page_size - 1) // page_size

        def spans_for_home() -> list[dict]:
            s, off = [], 0

            def add(kind, text="", media_ref=""):
                nonlocal off
                s.append({"kind": kind, "text": text, "media_ref": media_ref, "offset": off})
                off += 1

            add("text", f"Welcome to {dom} — {_text(rng, 12)}")
            add("link", "all products", "/products?page=1")
            add("link", "about", f"{base}/about")
            add("link", "legal", "/legal")
            add("link", "home again", "/")                      # self link
            add("link", "fragment nav", f"{base}/products?page=1#top")
            add("link", "off-domain", "http://othersite.test/promo")
            add("link", "social", "http://facebook.com/acme")
            add("image", "logo", f"{base}/img/logo.png")
            add("image", "inline", "data:image/png;base64,iVBORw0KGgo=")
            add("email", f"contact@{dom}", "")
            add("text", _text(rng, 20))
            return s

        def spans_for_list(page: int) -> list[dict]:
            s, off = [], 0

            def add(kind, text="", media_ref=""):
                nonlocal off
                s.append({"kind": kind, "text": text, "media_ref": media_ref, "offset": off})
                off += 1

            add("text", f"products page {page} — {_text(rng, 8)}")
            lo, hi = (page - 1) * page_size, min(page * page_size, np_d)
            for k in range(lo, hi):
                add("link", f"product {k}", f"/product-{k}")
                if k % 3 == 0:
                    add("image", f"thumb {k}", f"/img/product-{k}.jpg")
            if page < n_pages:
                add("link", "next", f"/products?page={page + 1}")
            if page > 1:
                add("link", "prev", f"{base}/products?page={page - 1}")
            add("link", "wishlist", "/customer/wishlist")
            add("link", "dup products", "/products?page=1")     # duplicate
            add("link", "empty href", "")
            add("text", _text(rng, 10))
            return s

        def spans_for_product(k: int) -> list[dict]:
            s, off = [], 0

            def add(kind, text="", media_ref=""):
                nonlocal off
                s.append({"kind": kind, "text": text, "media_ref": media_ref, "offset": off})
                off += 1

            add("text", f"Product {k}: {_text(rng, 15)}")
            add("text", f"prix {rng.randint(1, 99)},{rng.randint(10, 99)} €")
            add("image", f"photo {k}", f"{base}/img/product-{k}.jpg")
            add("link", "back home", "/")
            add("link", "back to list", f"/products?page={k // page_size + 1}")
            rel = (k + 7) % np_d
            add("link", f"related {rel}", f"/product-{rel}")
            add("link", "share", f"{base}/product-{k}#reviews")
            if k % 5 == 0:
                add("email", f"support@{dom}", "")
            add("text", _text(rng, 12))
            return s

        rows.append({"doc_id": f"{base}/", "spans": spans_for_home()})
        for page in range(1, n_pages + 1):
            rows.append({"doc_id": f"{base}/products?page={page}", "spans": spans_for_list(page)})
        for k in range(np_d):
            rows.append({"doc_id": f"{base}/product-{k}", "spans": spans_for_product(k)})
        rows.append(
            {"doc_id": f"{base}/legal",
             "spans": [{"kind": "text", "text": "Legal — " + _text(rng, 30), "media_ref": "", "offset": 0},
                        {"kind": "link", "text": "home", "media_ref": "/", "offset": 1}]}
        )
        rows.append(
            {"doc_id": f"{base}/about",
             "spans": [{"kind": "text", "text": f"About {dom} — " + _text(rng, 25), "media_ref": "", "offset": 0},
                        {"kind": "email", "text": f"team@{dom}", "media_ref": "", "offset": 1},
                        {"kind": "link", "text": "products", "media_ref": "/products?page=1", "offset": 2}]}
        )
        rows.append(
            {"doc_id": f"{base}/customer/wishlist",
             "spans": [{"kind": "text", "text": "Your wishlist — " + _text(rng, 5), "media_ref": "", "offset": 0},
                        {"kind": "link", "text": "home", "media_ref": "/", "offset": 1}]}
        )
    return rows


def site_df(spark: SparkSession, rows: list[dict]) -> DataFrame:
    """Rows → typed documents DataFrame (schemas.DOCUMENTS)."""
    data = [
        (r["doc_id"], [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]])
        for r in rows
    ]
    return spark.createDataFrame(data, schemas.DOCUMENTS)


def synth_frontier_df(
    spark: SparkSession,
    n_urls: int,
    n_domains: int = 1000,
    hot_domain_share: float = 0.8,
    seed: int = 42,
    start: int = 0,
) -> DataFrame:
    """Distributed synthetic frontier for throughput benchmarks: built
    with sequence/explode entirely JVM-side (no Python in the loop).
    ``hot_domain_share`` of URLs land on domain 0 (hot-domain skew).
    ``start`` offsets the id range: the URL for a given (id, n_domains,
    seed, hot cutoff) is a pure function of the id, so two calls with
    overlapping id ranges emit IDENTICAL urls for the shared ids — the
    membership-soak generator (tools/soak_seen.py) relies on this to
    synthesize candidate batches that straddle a seen table's boundary.
    The hot cutoff stays ``n_urls * share`` counted from id 0."""
    hot = int(n_urls * hot_domain_share)
    if n_domains <= 1:
        cold_domain = F.lit("site0.test")  # pmod(_, 0) would divide by zero
    else:
        cold_domain = F.concat(
            F.lit("site"),
            (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(n_domains - 1)) + 1).cast("string"),
            F.lit(".test"),
        )
    df = spark.range(start, start + n_urls).withColumn(
        "domain",
        F.when(F.col("id") < hot, F.lit("site0.test")).otherwise(cold_domain),
    )
    return df.select(
        F.concat(F.lit("http://"), "domain", F.lit("/product-"), F.col("id").cast("string")).alias("url"),
        "domain",
        F.pmod(F.xxhash64("domain"), F.lit(64)).cast("int").alias("domain_bucket"),
        F.lit(0).alias("depth"),
        F.lit(0).alias("discovered_wave"),
        F.lit(0.0).alias("priority"),
    )


def synth_big_site_df(
    spark: SparkSession,
    n_products: int,
    n_list_pages: int = 10,
    domain: str = "siteb.test",
    text_words: int = 12,
) -> DataFrame:
    """Spark-side ~10^5-10^6-page site for wave-loop THROUGHPUT
    benches: home → ``n_list_pages`` hub pages → ``n_products`` product
    leaves, built entirely with ``sequence``/``explode``/``transform``
    (no driver-side row list — the 100k-page documents table never
    exists in Python). BFS waves: 0 = home (1 page), 1 = hubs,
    2 = products — one wave of 10^4-10^6 URLs, the shape that measures
    per-wave throughput rather than pagination depth. Product text is a
    deterministic function of the product id (distinct per page, so
    content ops see no accidental dup cliff)."""
    base = f"http://{domain}"
    span = lambda kind, text, ref, off: F.struct(
        kind.alias("kind"),
        text.alias("text"),
        ref.alias("media_ref"),
        off.cast("int").alias("offset"),
    )
    home = spark.range(1).select(
        F.lit(f"{base}/").alias("doc_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(n_list_pages - 1)),
            lambda i: span(
                F.lit("link"),
                F.lit(""),
                F.concat(F.lit(f"{base}/list-"), i.cast("string")),
                i,
            ),
        ).alias("spans"),
    )
    per_hub = (n_products + n_list_pages - 1) // n_list_pages
    hubs = spark.range(n_list_pages).select(
        F.concat(F.lit(f"{base}/list-"), F.col("id").cast("string")).alias("doc_id"),
        F.transform(
            F.sequence(
                F.col("id") * per_hub,
                F.least(F.col("id") * per_hub + per_hub - 1, F.lit(n_products - 1)),
            ),
            lambda k, i: span(
                F.lit("link"),
                F.lit(""),
                F.concat(F.lit(f"{base}/product-"), k.cast("string")),
                i,
            ),
        ).alias("spans"),
    ).where(F.size("spans") > 0)
    words = F.array(*[F.lit(w) for w in PLAIN_WORDS])
    nw = len(PLAIN_WORDS)
    products = spark.range(n_products).select(
        F.concat(F.lit(f"{base}/product-"), F.col("id").cast("string")).alias("doc_id"),
        F.array(
            span(
                F.lit("text"),
                F.concat_ws(
                    " ",
                    F.transform(
                        F.sequence(F.lit(0), F.lit(text_words - 1)),
                        lambda i: F.element_at(
                            words,
                            (F.pmod(F.xxhash64(F.col("id") * 31 + i), F.lit(nw)) + 1).cast("int"),
                        ),
                    ),
                ),
                F.lit(""),
                F.lit(0),
            ),
            span(F.lit("email"), F.lit("sales@example.com"), F.lit(""), F.lit(1)),
        ).alias("spans"),
    )
    return home.unionByName(hubs).unionByName(products)


def synth_layered_site_df(
    spark: SparkSession,
    width: int,
    depth: int,
    domain: str = "sitelay.test",
    text_words: int = 6,
) -> DataFrame:
    """Spark-side LAYERED site for sustained multi-wave loop benches:
    home → layer 0 (``width`` pages) → layer 1 → … → layer depth-1,
    where wave k+1 fetches exactly layer k. Complements the two
    existing throughput shapes — ``synth_big_site_df`` (one wide wave)
    and the pagination chain of tools/probe_deep_crawl.py (many 1-page
    waves) — with the shape a real crawl sustains: MANY WIDE WAVES,
    state (seen/visited/frontier/bloom deltas) accumulating across
    them.

    Link structure (all JVM-side ``sequence``/``transform``, no driver
    rows):
    - home ``/`` fans out to every ``/L0-i`` (the hub fan-out path —
      plans/waves.py:fetch_documents_join broadcasts the 1-row batch
      and semi-joins the documents side);
    - ``/L{k}-{i}`` links to ``/L{k+1}-{i}`` and to a shuffled cross
      page ``/L{k+1}-{(31*i+7) % width}`` — ~2 candidate links per new
      URL, so per-URL dedup (J3) and the seen membership path see
      realistic duplicate pressure every wave;
    - the LAST layer links back to layer 0: its whole candidate wave is
      already-seen, the pure membership-rejection regime (the bloom
      sidecar's worst case — every probe is a hit).

    Pages = 1 + width × depth; waves = depth + 1; page text is a
    deterministic hash of the page id (distinct per page)."""
    base = f"http://{domain}"
    span = lambda kind, text, ref, off: F.struct(
        kind.alias("kind"),
        text.alias("text"),
        ref.alias("media_ref"),
        off.cast("int").alias("offset"),
    )
    home = spark.range(1).select(
        F.lit(f"{base}/").alias("doc_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(width - 1)),
            lambda i: span(
                F.lit("link"), F.lit(""),
                F.concat(F.lit(f"{base}/L0-"), i.cast("string")), i,
            ),
        ).alias("spans"),
    )
    words = F.array(*[F.lit(w) for w in PLAIN_WORDS])
    nw = len(PLAIN_WORDS)
    layer = (F.col("id") / width).cast("long")
    idx = F.col("id") % width
    nxt = layer + 1
    # last layer wraps to layer 0 (seen-rejection wave); others advance
    tgt_layer = F.when(nxt < depth, nxt).otherwise(F.lit(0))
    link1 = F.concat(
        F.lit(f"{base}/L"), tgt_layer.cast("string"), F.lit("-"), idx.cast("string")
    )
    link2 = F.concat(
        F.lit(f"{base}/L"), tgt_layer.cast("string"), F.lit("-"),
        ((idx * 31 + 7) % width).cast("string"),
    )
    pages = spark.range(width * depth).select(
        F.concat(
            F.lit(f"{base}/L"), layer.cast("string"), F.lit("-"), idx.cast("string")
        ).alias("doc_id"),
        F.array(
            span(
                F.lit("text"),
                F.concat_ws(
                    " ",
                    F.transform(
                        F.sequence(F.lit(0), F.lit(text_words - 1)),
                        lambda i: F.element_at(
                            words,
                            (F.pmod(F.xxhash64(F.col("id") * 17 + i), F.lit(nw)) + 1).cast("int"),
                        ),
                    ),
                ),
                F.lit(""), F.lit(0),
            ),
            span(F.lit("link"), F.lit(""), link1, F.lit(1)),
            span(F.lit("link"), F.lit(""), link2, F.lit(2)),
        ).alias("spans"),
    )
    return home.unionByName(pages)
