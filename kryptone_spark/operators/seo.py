"""SEO page-audit flags + stemming over interleaved documents.

The reference audits each page driver-side with Selenium JS
(/root/reference/kryptone/contrib/seo.py:431-529 — audit_structure,
audit_head, audit_images, audit_structured_data) and stems tokens with
NLTK Snowball (seo.py:423-429). The engine re-expresses both as
whole-table columnar ops over ``documents(doc_id, spans)``:

- ``audit_pages`` — every flag from one projection over the spans
  array (filter/exists/transform HOFs, no explode, no shuffle): a page
  audit at 100 TB is a map-only pass.
- ``porter_lite_stem`` — a deterministic suffix-stripping stemmer as a
  native column expression (JVM-side, whole-stage codegen) rather than
  a Python UDF. It is a documented APPROXIMATION of Porter/Snowball
  (plural fold, ing/ed with vowel-in-stem guard, adverbial -ly) chosen
  because it is exactly reproducible in ANSI SQL — the oracle gate the
  reference's NLTK call could never have. Exact Snowball output, if a
  user needs it, drops in as an Arrow-batched pandas UDF at the same
  call site (the ``remove_accents`` pattern in functions/text.py).

Span kinds consumed: title, h1, description, image (alt in ``text``),
ldjson (JSON-LD payload in ``text``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kryptone_spark.functions.text import normalize_spaces

TITLE_MAX_LEN = 60   # seo.py:466 — head title budget
DESC_MAX_LEN = 150   # seo.py:471 — meta description budget


def _first_text(spans_filtered) -> F.Column:
    """text of the first matching span, null when none (the reference
    audits the single document.querySelector hit). try_element_at: ANSI
    element_at throws on the empty (no-match) array."""
    return F.try_element_at(
        F.transform(spans_filtered, lambda s: s["text"]), F.lit(1)
    )


def audit_pages(documents: DataFrame) -> DataFrame:
    """Structural/head/image/structured-data audit flags per page
    (seo.py:431-529), one flag column each:

    - has_title (non-empty head title, audit_structure 431-437)
    - has_h1 + cleaned h1 text (audit_structure 439-455; clean_text =
      whitespace normalization)
    - title_length / title_is_valid ≤60, description_length /
      description_is_valid ≤150 (audit_head 461-472 — expressing the
      intended semantics; the reference's `if page_title is None:
      len(page_title)` guard is inverted and crashes, so its flags
      never update)
    - pct_images_with_no_alt (round 2, 0.0 for pages with no images)
      and the unique alt inventory, sorted + pipe-joined
      (audit_images 474-502)
    - has_structured_data / structured_data_type from the first JSON-LD
      span's @type (audit_structured_data 504-529)

    Pure projection over the spans array — no explode, no shuffle; the
    HOF chain is one non-codegen Project (the repo-wide HOF isolation
    rule), everything downstream stays columnar.
    """
    spans = F.col("spans")
    titles = F.filter(spans, lambda s: s["kind"] == "title")
    h1s = F.filter(spans, lambda s: s["kind"] == "h1")
    descs = F.filter(spans, lambda s: s["kind"] == "description")
    imgs = F.filter(spans, lambda s: s["kind"] == "image")
    ldjson = F.filter(spans, lambda s: s["kind"] == "ldjson")

    title = _first_text(titles)
    h1 = _first_text(h1s)
    desc = _first_text(descs)
    n_imgs = F.size(imgs)
    n_empty_alts = F.size(F.filter(imgs, lambda s: s["text"] == ""))
    ld = _first_text(ldjson)

    return documents.select(
        "doc_id",
        F.coalesce(title != "", F.lit(False)).alias("has_title"),
        F.length(title).alias("title_length"),
        F.coalesce(F.length(title) <= TITLE_MAX_LEN, F.lit(False)).alias(
            "title_is_valid"
        ),
        h1.isNotNull().alias("has_h1"),
        normalize_spaces(h1).alias("h1"),
        F.length(desc).alias("description_length"),
        F.coalesce(F.length(desc) <= DESC_MAX_LEN, F.lit(False)).alias(
            "description_is_valid"
        ),
        F.when(n_imgs > 0, F.round(F.lit(100.0) * n_empty_alts / n_imgs, 2))
        .otherwise(F.lit(0.0))
        .alias("pct_images_with_no_alt"),
        # unique alts, sorted + serialized (arrays are unhashable in the
        # driver's pandas canon)
        F.array_join(
            F.array_sort(F.array_distinct(F.transform(imgs, lambda s: s["text"]))),
            "|",
        ).alias("image_alts"),
        ld.isNotNull().alias("has_structured_data"),
        F.from_json(ld, "map<string,string>")["@type"].alias(
            "structured_data_type"
        ),
    )


def porter_lite_stem(col) -> F.Column:
    """Deterministic suffix-stripping stemmer (porter-lite), native
    column expression. Three sequential steps, first-match-wins within
    each — the exact rule list, for SQL mirroring:

    A (plural fold, Porter 1a):  sses$→ss · ies$→i · ss$ keep ·
      s$→'' when len≥4
    B (verbal, Porter 1b w/ vowel-in-stem guard): ing$→'' when a vowel
      precedes and len≥6 · ed$→'' when a vowel precedes and len≥5
    C (adverbial): ly$→'' when len≥5

    Length guards replace Porter's measure() so short function words
    (is, as, red, fly) survive. Runs entirely inside codegen — at
    100 TB this stems in the scan, no Python round-trip.
    """
    w = F.lower(col)
    a = (
        F.when(w.rlike("sses$"), F.regexp_replace(w, "sses$", "ss"))
        .when(w.rlike("ies$"), F.regexp_replace(w, "ies$", "i"))
        .when(w.rlike("ss$"), w)
        .when(w.rlike("s$") & (F.length(w) >= 4), F.regexp_replace(w, "s$", ""))
        .otherwise(w)
    )
    b = (
        F.when(
            a.rlike("[aeiou].*ing$") & (F.length(a) >= 6),
            F.regexp_replace(a, "ing$", ""),
        )
        .when(
            a.rlike("[aeiou].*ed$") & (F.length(a) >= 5),
            F.regexp_replace(a, "ed$", ""),
        )
        .otherwise(a)
    )
    return F.when(
        b.rlike("ly$") & (F.length(b) >= 5), F.regexp_replace(b, "ly$", "")
    ).otherwise(b)


# the same three steps as ANSI SQL over a column reference — kept next
# to the Spark expression so the two rule lists cannot drift
PORTER_LITE_SQL = """
    CASE WHEN regexp_matches(sb, 'ly$') AND length(sb) >= 5
         THEN regexp_replace(sb, 'ly$', '') ELSE sb END
""".strip()

PORTER_LITE_STEP_A_SQL = """
    CASE WHEN regexp_matches(w, 'sses$') THEN regexp_replace(w, 'sses$', 'ss')
         WHEN regexp_matches(w, 'ies$') THEN regexp_replace(w, 'ies$', 'i')
         WHEN regexp_matches(w, 'ss$') THEN w
         WHEN regexp_matches(w, 's$') AND length(w) >= 4
              THEN regexp_replace(w, 's$', '')
         ELSE w END
""".strip()

PORTER_LITE_STEP_B_SQL = """
    CASE WHEN regexp_matches(sa, '[aeiou].*ing$') AND length(sa) >= 6
         THEN regexp_replace(sa, 'ing$', '')
         WHEN regexp_matches(sa, '[aeiou].*ed$') AND length(sa) >= 5
         THEN regexp_replace(sa, 'ed$', '')
         ELSE sa END
""".strip()


def stemmed_word_frequency(
    documents: DataFrame, text_col: str = "text", top_k: int | None = None
) -> DataFrame:
    """create_stemmed_words + calculate_word_frequency (seo.py:407-429)
    engine form: tokenize (the corpus-wide alnum tokenizer, same as
    word_frequency's), stem, count — top_k via the per-partition heap
    (TakeOrderedAndProject), never a global window."""
    toks = documents.select(
        F.explode(
            F.split(
                F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", " "), " +"
            )
        ).alias("word")
    ).where(F.col("word") != "")
    counts = (
        toks.select(porter_lite_stem(F.col("word")).alias("stem"))
        .groupBy("stem")
        .agg(F.count("*").alias("freq"))
    )
    if top_k is not None:
        from kryptone_spark.functions.rank import ranked_top_k

        counts = ranked_top_k(
            counts, [F.desc("freq"), F.asc("stem")], top_k, out_col="rank"
        )
    return counts
