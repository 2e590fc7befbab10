"""Extractors: span-sequence equality and aggregation parity vs pure
Python recomputation over the same synthetic documents."""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from kryptone_spark.operators import extract
from kryptone_spark.synth import site_df, synth_site


@pytest.fixture(scope="module")
def site():
    return synth_site(n_domains=1, n_products=10, page_size=4, seed=42)


@pytest.fixture(scope="module")
def docs(spark, site):
    return site_df(spark, site).cache()


def test_spans_sequence_equality(docs, site):
    """The per-row invariant from BASELINE.json input_hint:
    (kind, text, media_ref, order) preserved exactly."""
    got = {
        (r["doc_id"], r["offset"], r["kind"], r["text"], r["media_ref"])
        for r in extract.spans_table(docs).collect()
    }
    want = {
        (d["doc_id"], s["offset"], s["kind"], s["text"], s["media_ref"])
        for d in site
        for s in d["spans"]
    }
    assert got == want


def test_page_links_order(docs, site):
    got = [
        (r["src_url"], r["offset"], r["url"])
        for r in extract.page_links(docs).orderBy("src_url", "offset").collect()
    ]
    want = sorted(
        (d["doc_id"], s["offset"], s["media_ref"])
        for d in site
        for s in d["spans"]
        if s["kind"] == "link"
    )
    assert got == want


def test_page_images_drop_base64(docs, site):
    got = {(r["page_url"], r["alt"], r["src"]) for r in extract.page_images(docs).collect()}
    want = {
        (d["doc_id"], s["text"], s["media_ref"])
        for d in site
        for s in d["spans"]
        if s["kind"] == "image" and not s["media_ref"].startswith("data:")
    }
    assert got == want
    assert all(not s.startswith("data:") for _, _, s in got)


def py_text(site):
    return {
        d["doc_id"]: " ".join(
            s["text"] for s in sorted(d["spans"], key=lambda s: s["offset"]) if s["kind"] == "text"
        )
        for d in site
    }


def test_page_text_document_order(docs, site):
    got = {r["doc_id"]: r["text"] for r in extract.page_text(docs).collect()}
    assert got == py_text(site)


def test_page_emails(docs, site):
    got = {(r["doc_id"], r["email"]) for r in extract.page_emails(docs).collect()}
    want = {
        (d["doc_id"], s["text"])
        for d in site
        for s in d["spans"]
        if s["kind"] == "email" and not s["text"].startswith("@")
    }
    # text spans in the synthetic site contain no inline emails
    assert want <= got
    for _, e in got:
        assert "@" in e and not e.startswith("@")


def test_word_frequency_topk(docs, site):
    texts = py_text(site)
    counter = Counter()
    for t in texts.values():
        counter.update(w for w in t.lower().split(" ") if w)
    got = {
        r["word"]: r["freq"]
        for r in extract.word_frequency(docs, top_k=10).collect()
    }
    # python tie-break: freq desc, word asc — same as the window spec
    want = dict(sorted(counter.items(), key=lambda kv: (-kv[1], kv[0]))[:10])
    assert got == want


def test_tf_idf_matches_formula(docs, site):
    texts = py_text(site)
    n_docs = len(texts)
    tokens = {d: [w for w in t.lower().split(" ") if w] for d, t in texts.items()}
    df_counter = Counter()
    for d, toks in tokens.items():
        df_counter.update(set(toks))
    rows = extract.tf_idf(docs).collect()
    assert rows
    for r in rows[:50]:
        toks = tokens[r["doc_id"]]
        tf = toks.count(r["term"]) / len(toks)
        idf = math.log(n_docs / (1 + df_counter[r["term"]]))
        assert r["tfidf"] == pytest.approx(round(tf * idf, 8), abs=1e-8)


# ---------------------------------------------------------------------------
# SEO audit + stemming (operators/seo.py — contrib/seo.py:407-529)
# ---------------------------------------------------------------------------

def _span(kind, text, ref="", off=0):
    return {"kind": kind, "text": text, "media_ref": ref, "offset": off}


def test_seo_audit_flags(spark):
    from kryptone_spark.operators import seo

    rows = [
        {  # fully healthy page
            "doc_id": "p1",
            "spans": [
                _span("title", "Short title"),
                _span("h1", "  Main   Heading  ", off=1),
                _span("description", "d" * 100, off=2),
                _span("image", "an alt", "img1.jpg", 3),
                _span("image", "logo", "logo.png", 4),
                _span("ldjson", '{"@type": "Product"}', off=5),
            ],
        },
        {  # empty title, no h1, overlong title/desc, alt-less images
            "doc_id": "p2",
            "spans": [
                _span("title", "t" * 70),
                _span("description", "d" * 200, off=1),
                _span("image", "", "a.jpg", 2),
                _span("image", "", "b.jpg", 3),
                _span("image", "x", "c.jpg", 4),
            ],
        },
        {"doc_id": "p3", "spans": [_span("text", "no audit targets")]},
    ]
    schema = (
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>"
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in seo.audit_pages(spark.createDataFrame(rows, schema)).collect()
    }
    p1, p2, p3 = out["p1"], out["p2"], out["p3"]
    assert p1["has_title"] and p1["title_is_valid"] and p1["title_length"] == 11
    assert p1["has_h1"] and p1["h1"] == "Main Heading"
    assert p1["description_is_valid"] and p1["description_length"] == 100
    assert p1["pct_images_with_no_alt"] == 0.0
    assert p1["image_alts"] == "an alt|logo"
    assert p1["has_structured_data"] and p1["structured_data_type"] == "Product"

    assert p2["has_title"] and not p2["title_is_valid"]  # 70 > 60
    assert not p2["has_h1"] and p2["h1"] is None
    assert not p2["description_is_valid"]  # 200 > 150
    assert p2["pct_images_with_no_alt"] == pytest.approx(66.67)
    assert p2["image_alts"] == "|x"
    assert not p2["has_structured_data"]

    assert not p3["has_title"] and p3["title_length"] is None
    assert p3["pct_images_with_no_alt"] == 0.0 and p3["image_alts"] == ""


def test_porter_lite_stem_rules(spark):
    from kryptone_spark.operators import seo

    cases = {
        # step A
        "caresses": "caress", "ponies": "poni", "caress": "caress",
        "cats": "cat", "is": "is", "as": "as",
        # step B (vowel-in-stem + length guards)
        "hopping": "hopp", "sing": "sing", "walked": "walk", "red": "red",
        # step C
        "quickly": "quick", "fly": "fly", "only": "only",  # len 4 < 5 guard
        # chained: plurals then verbal
        "meetings": "meet",
    }
    df = spark.createDataFrame([(w,) for w in cases], "w string")
    got = {
        r["w"]: r["s"]
        for r in df.select("w", seo.porter_lite_stem(F.col("w")).alias("s")).collect()
    }
    assert got == cases


def test_stemmed_word_frequency_folds_variants(spark):
    from kryptone_spark.operators import seo

    df = spark.createDataFrame(
        [(0, "walk walked walking walks"), (1, "cat cats CATS!")],
        "doc_id long, text string",
    )
    got = {
        r["stem"]: r["freq"]
        for r in seo.stemmed_word_frequency(df, top_k=5).collect()
    }
    assert got == {"walk": 4, "cat": 3}


def test_apply_cleaners_single_projection(spark):
    """§2.10 model field cleaners: callable and ready-Column specs both
    apply; every hook sees the ORIGINAL value (order-independent, like
    the reference's clean_<field> dispatch); unknown fields raise; and
    all cleaners compile into one Project (one codegen span)."""
    from kryptone_spark.operators.models import apply_cleaners

    df = spark.createDataFrame(
        [(" Widget  A ", 12.349, "X")], "name string, price double, tag string"
    )
    out = apply_cleaners(
        df,
        {
            "name": lambda c: F.trim(F.regexp_replace(c, r"\s+", " ")),
            "price": F.round(F.col("price"), 2),
            # 'tag' cleaner reads 'name' — must see the raw value
            "tag": F.substring(F.col("name"), 1, 1),
        },
    )
    r = out.collect()[0]
    assert r["name"] == "Widget A"
    assert r["price"] == 12.35
    assert r["tag"] == " "  # raw name's leading space, not the cleaned one

    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Project") == 1

    with pytest.raises(ValueError, match="not in DataFrame"):
        apply_cleaners(df, {"missing": F.lit(1)})


def test_span_audit(spark):
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("spans", T.ArrayType(T.StructType([
            T.StructField("kind", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("media_ref", T.StringType()),
            T.StructField("offset", T.IntegerType()),
        ]))),
    ])
    rows = [
        ("ok", [("text", "hello", "", 0), ("image", "alt", "ref.jpg", 1), ("text", "bye", "", 2)]),
        ("bad_order", [("text", "a", "", 2), ("link", "x", "u", 1)]),
        ("dup_offset", [("text", "a", "", 0), ("text", "b", "", 0)]),
        ("no_ref", [("image", "alt", "", 0)]),
        ("empty", []),
    ]
    df = spark.createDataFrame(rows, schema)
    got = {r["doc_id"]: r for r in extract.span_audit(df).collect()}
    assert got["ok"]["offsets_monotonic"] and got["ok"]["media_ref_ok"]
    assert got["ok"]["n_text"] == 2 and got["ok"]["n_images"] == 1
    assert got["ok"]["text_chars"] == 8
    assert not got["bad_order"]["offsets_monotonic"]
    assert not got["dup_offset"]["offsets_monotonic"]
    assert not got["no_ref"]["media_ref_ok"]
    assert got["empty"]["n_spans"] == 0 and got["empty"]["offsets_monotonic"]
    assert got["empty"]["media_ref_ok"] and got["empty"]["text_chars"] == 0


def test_interleave_profile(spark):
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("spans", T.ArrayType(T.StructType([
            T.StructField("kind", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("media_ref", T.StringType()),
            T.StructField("offset", T.IntegerType()),
        ]))),
    ])
    rows = [
        # text,text,image(alt),text,text,text → run 3, ratio 1/6
        ("runs", [("text", "a", "", 0), ("text", "b", "", 1),
                  ("image", "alt", "i.jpg", 2), ("text", "c", "", 3),
                  ("text", "d", "", 4), ("text", "e", "", 5)]),
        # image-led, image-closed, one alt-less of two images
        ("media", [("image", "", "i.jpg", 0), ("text", "t", "", 1),
                   ("image", "alt", "j.jpg", 2)]),
        ("textonly", [("text", "x", "", 0)]),
        ("empty", []),
    ]
    got = {
        r["doc_id"]: r
        for r in extract.interleave_profile(spark.createDataFrame(rows, schema)).collect()
    }
    r = got["runs"]
    assert r["max_text_run"] == 3
    assert r["media_ratio"] == pytest.approx(round(1 / 6, 6))
    assert r["image_alt_coverage"] == 1.0
    assert r["starts_with_text"] and not r["ends_with_media"]
    m = got["media"]
    assert (m["max_text_run"], m["image_alt_coverage"]) == (1, 0.5)
    assert not m["starts_with_text"] and m["ends_with_media"]
    t = got["textonly"]
    assert t["image_alt_coverage"] is None and t["media_ratio"] == 0.0
    e = got["empty"]
    assert (e["max_text_run"], e["media_ratio"]) == (0, 0.0)
    assert not e["starts_with_text"] and not e["ends_with_media"]
    # composition profile is a pure projection — no shuffle
    from tests.test_plans import plan_of

    assert "Exchange" not in plan_of(
        extract.interleave_profile(spark.createDataFrame(rows, schema))
    )


def test_anchor_profile_top_anchor_ties(spark):
    """Most-frequent anchor wins; count ties break lexicographically;
    src multiplicity vs distinct pages counted separately."""
    from kryptone_spark.operators.extract import anchor_profile

    rows = [
        ("p1", "t", "nav"), ("p1", "t", "nav"),
        ("p2", "t", "buy"), ("p2", "t", "buy"),
        ("p3", "t", "buy"),
        ("p1", "t", "apple"), ("p1", "t", "zebra"),
        ("p4", "t", "apple"),                        # apple=2 < buy=3
    ]
    links = spark.createDataFrame(
        [(s, "http://x/t", a) for s, _, a in rows],
        "src_url string, url string, anchor string",
    )
    r = anchor_profile(links).collect()
    assert len(r) == 1
    row = r[0]
    assert (row["n_inlinks"], row["n_src_pages"], row["n_distinct_anchors"]) == (8, 4, 4)
    assert (row["top_anchor"], row["top_anchor_count"]) == ("buy", 3)

    # exact count tie: lexicographic winner
    tied = spark.createDataFrame(
        [("a", "u", "zeta"), ("b", "u", "zeta"), ("c", "u", "alpha"), ("d", "u", "alpha")],
        "src_url string, url string, anchor string",
    )
    t = anchor_profile(tied).collect()[0]
    assert (t["top_anchor"], t["top_anchor_count"]) == ("alpha", 2)
