"""Span extractors over interleaved documents (S7-S9, F7, A3-A9).

The reference extracts per page with browser JS + BeautifulSoup
(/root/reference/kryptone/base.py:473-503, contrib/seo.py:232-243,
utils/iterators.py:113-195); here every extractor is a whole-table
DataFrame op over ``documents(doc_id, spans)``. Span order (``offset``)
is the per-row invariant the driver checks (BASELINE.json input_hint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kryptone_spark.functions import text as TXT


def spans_table(documents: DataFrame) -> DataFrame:
    """Flattened spans preserving document order — the golden
    ``spans.csv`` shape (doc_id, offset, kind, text, media_ref)."""
    return documents.select(
        "doc_id", F.explode("spans").alias("s")
    ).select(
        "doc_id",
        F.col("s.offset").alias("offset"),
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
    )


def page_links(documents: DataFrame) -> DataFrame:
    """S7 collect_page_urls: hrefs in document order."""
    return spans_table(documents).where(F.col("kind") == "link").select(
        F.col("doc_id").alias("src_url"), F.col("media_ref").alias("url"), "offset"
    )


def page_images(documents: DataFrame) -> DataFrame:
    """S8 PageImagesIterator: (alt, src) pairs; base64 data-URIs dropped
    (iterators.py:144-145)."""
    return (
        spans_table(documents)
        .where(F.col("kind") == "image")
        .where(~F.col("media_ref").startswith("data:"))
        .select(
            F.col("doc_id").alias("page_url"),
            F.col("text").alias("alt"),
            F.col("media_ref").alias("src"),
            "offset",
        )
    )


def page_text(documents: DataFrame) -> DataFrame:
    """S9 get_page_text: text spans joined in document order."""
    return documents.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.array_sort(
                    F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("text")),
                    lambda a, b: F.when(a["offset"] < b["offset"], -1)
                    .when(a["offset"] > b["offset"], 1)
                    .otherwise(0),
                ),
                lambda s: s["text"],
            ),
            " ",
        ).alias("text"),
    )


def page_emails(documents: DataFrame) -> DataFrame:
    """F7/A9 EmailMixin: emails from text spans (token scan) ∪ email
    spans, distinct per page (seo.py:587-643)."""
    from_text = (
        page_text(documents)
        .select("doc_id", F.explode(TXT.extract_emails(F.col("text"))).alias("email"))
    )
    from_spans = (
        spans_table(documents)
        .where(F.col("kind") == "email")
        .where(~F.col("text").startswith("@"))
        .select("doc_id", F.col("text").alias("email"))
    )
    return from_text.unionByName(from_spans).distinct()


def word_frequency(documents: DataFrame, per_page: bool = False, top_k: int | None = None) -> DataFrame:
    """A4/A5 — token frequencies (site-wide or per page), optional W2
    top-k via a rank window."""
    toks = page_text(documents).select(
        "doc_id", F.explode(TXT.tokenize(F.col("text"))).alias("word")
    ).where(F.col("word") != "")
    keys = ["doc_id", "word"] if per_page else ["word"]
    counts = toks.groupBy(*keys).agg(F.count("*").alias("freq"))
    if top_k is not None:
        order = [F.desc("freq"), F.asc("word")]
        if per_page:
            w = Window.partitionBy("doc_id").orderBy(*order)
            counts = counts.withColumn("rank", F.row_number().over(w)).where(
                F.col("rank") <= top_k
            )
        else:
            # site-wide top-k: TakeOrderedAndProject (per-partition heap
            # + driver merge of k rows), never a single-partition window
            from kryptone_spark.functions.rank import ranked_top_k

            counts = ranked_top_k(counts, order, top_k, out_col="rank")
    return counts


def tf_idf(documents: DataFrame) -> DataFrame:
    """A6-A8 — TF-IDF per (doc, term) from first principles:
    tf = n/Σn per doc, idf = ln(N / (1+df)) (seo.py:56-102's formula),
    all partial-aggregated by Catalyst — no ML pipeline needed."""
    toks = page_text(documents).select(
        "doc_id", F.explode(TXT.tokenize(F.col("text"))).alias("term")
    ).where(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("n"))
    tf = tf.withColumn(
        "tf", F.col("n") / F.sum("n").over(Window.partitionBy("doc_id"))
    )
    n_docs = documents.select(F.countDistinct("doc_id").alias("nd"))
    df_ = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = df_.crossJoin(F.broadcast(n_docs)).select(
        "term", F.log(F.col("nd") / (1 + F.col("df"))).alias("idf")
    )
    return tf.join(idf, "term").select(
        "doc_id", "term", F.round(F.col("tf") * F.col("idf"), 8).alias("tfidf")
    )


def url_distribution(edges: DataFrame) -> DataFrame:
    """A3 url_distribution (base.py:312,502): page → out-links."""
    return edges.groupBy("src_url").agg(
        F.sort_array(F.collect_list("dst_url")).alias("out_links"),
        F.count("*").alias("n_links"),
    )


def span_audit(documents: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Interleaved-document integrity audit over the north-rule input
    shape (doc_id, spans:array<struct<kind,text,media_ref,offset>>).

    Ingest-side data validation for a 100 TB corpus of interleaved
    text+media: per-doc span counts, strict offset monotonicity
    (sorted AND all-distinct — the portable formulation both Spark and
    the SQL oracle state identically), media_ref coverage for
    link/image spans, and total text payload. One pure-HOF projection:
    no explode, no shuffle, scan-bound.
    """
    s = F.col(spans_col)
    offs = F.transform(s, lambda sp: sp["offset"])
    kind_count = lambda k: F.size(F.filter(s, lambda sp: sp["kind"] == k))
    bad_refs = F.filter(
        s,
        lambda sp: sp["kind"].isin("link", "image") & (sp["media_ref"] == ""),
    )
    text_chars = F.aggregate(
        F.filter(s, lambda sp: sp["kind"] == "text"),
        F.lit(0),
        lambda acc, sp: acc + F.length(sp["text"]),
    )
    return documents.select(
        "doc_id",
        F.size(s).alias("n_spans"),
        kind_count("text").alias("n_text"),
        kind_count("link").alias("n_links"),
        kind_count("image").alias("n_images"),
        (
            (F.sort_array(offs) == offs)
            & (F.size(F.array_distinct(offs)) == F.size(offs))
        ).alias("offsets_monotonic"),
        (F.size(bad_refs) == 0).alias("media_ref_ok"),
        text_chars.alias("text_chars"),
    )


def interleave_profile(documents: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Interleaving-mix profile over the north-rule input shape — the
    curation view an interleaved image-text corpus needs (the OBELICS
    paper's document-composition statistics, public): how media-dense
    a document is, whether images carry alt text, how it opens and
    closes, and the longest uninterrupted text run (the context-window
    packing signal).

    Complements ``span_audit`` (integrity) with *composition*:
    ``media_ratio`` (image spans / spans), ``image_alt_coverage``
    (NULL when no images — distinct from 0.0 = all alt-less),
    ``starts_with_text`` / ``ends_with_media``, ``max_text_run``
    (longest consecutive text-span run, via a single aggregate fold).
    One pure-HOF projection: no explode, no shuffle, scan-bound at
    100 TB."""
    s = F.col(spans_col)
    n = F.size(s)
    n_img = F.size(F.filter(s, lambda sp: sp["kind"] == "image"))
    with_alt = F.size(
        F.filter(s, lambda sp: (sp["kind"] == "image") & (sp["text"] != ""))
    )
    run0 = F.struct(F.lit(0).alias("run"), F.lit(0).alias("best"))

    def _merge(a, sp):
        run = F.when(sp["kind"] == "text", a["run"] + 1).otherwise(F.lit(0))
        return F.struct(run.alias("run"), F.greatest(a["best"], run).alias("best"))

    max_text_run = F.aggregate(s, run0, _merge, lambda a: a["best"]).cast("int")
    return documents.select(
        "doc_id",
        F.round(
            F.when(n > 0, n_img.cast("double") / n.cast("double")).otherwise(0.0), 6
        ).alias("media_ratio"),
        F.when(
            n_img > 0, F.round(with_alt.cast("double") / n_img.cast("double"), 6)
        ).alias("image_alt_coverage"),
        ((n > 0) & (F.element_at(s, 1)["kind"] == "text")).alias("starts_with_text"),
        ((n > 0) & (F.element_at(s, -1)["kind"] == "image")).alias("ends_with_media"),
        max_text_run.alias("max_text_run"),
    )


def anchor_profile(links: DataFrame) -> DataFrame:
    """Per-destination anchor-text profile — the classic IR/crawl
    signal (anchor text describes the TARGET page better than the page
    itself; reference pages carry it as the link span's text,
    base.py:473-503 harvests only the href). Input: (src_url, url,
    anchor). Output per url: n_inlinks, n_src_pages (distinct linking
    pages), n_distinct_anchors, top_anchor (+count) — most frequent,
    ties broken lexicographically.

    Scale shape: word-count style two-level aggregate — the
    (url, anchor) partial collapses the raw link volume map-side, the
    url-level rollup sees |distinct pairs| rows; top-anchor selection
    is an arg-min over struct((-count), anchor), no window. The
    distinct-src count is its own partial-agg pass; both url-keyed
    sides meet in one co-partitioned join."""
    per_anchor = links.groupBy("url", "anchor").agg(F.count("*").alias("__cnt"))
    top = per_anchor.groupBy("url").agg(
        F.sum("__cnt").alias("n_inlinks"),
        F.count("*").alias("n_distinct_anchors"),
        F.min(
            F.struct((-F.col("__cnt")).alias("neg"), F.col("anchor"))
        ).alias("__t"),
    )
    srcs = links.groupBy("url").agg(
        F.countDistinct("src_url").alias("n_src_pages")
    )
    return top.join(srcs, "url").select(
        "url", "n_inlinks", "n_src_pages", "n_distinct_anchors",
        F.col("__t.anchor").alias("top_anchor"),
        (-F.col("__t.neg")).alias("top_anchor_count"),
    )
