"""F13 filename/directory derivation (functions/files.py) — pins the
reference's own docstring examples (utils/functions.py:12-79)."""

from pyspark.sql import functions as F

from kryptone_spark.functions import files as FF


def _one(spark, col, value):
    df = spark.createDataFrame([(value,)], "t string")
    return df.select(col.alias("o")).collect()[0]["o"]


def test_directory_from_url_reference_example(spark):
    # functions.py:45-47 (the code's actual output: '-'→'_', no leading
    # slash, punctuation stripped keep '_', last segment dropped)
    got = _one(
        spark,
        FF.directory_from_url(F.col("t"), exclude=("ma",)),
        "/ma/woman/clothing/dresses/short-dresses/shirt-dress-1.html",
    )
    assert got == "woman/clothing/dresses/short_dresses"


def test_directory_from_url_single_segment_and_accents(spark):
    # one kept segment → popped → empty dir
    assert _one(spark, FF.directory_from_url(F.col("t")), "/only.html") == ""
    # unaccent applies to the directory (reference cleans per token)
    got = _one(spark, FF.directory_from_url(F.col("t")), "/bébé/vêtements/robe.html")
    assert got == "bebe/vetements"


def test_directory_from_breadcrumbs_reference_example(spark):
    # functions.py:15-18 — accents KEPT, all punctuation stripped,
    # spaces → '_', last crumb (current page) dropped
    got = _one(
        spark,
        FF.directory_from_breadcrumbs(F.col("t")),
        "Bébé fille > T-shirt, polo, sous pull > "
        "T-shirt manches longues en coton bio à message printé",
    )
    assert got == "bébé_fille/tshirt_polo_sous_pull"


def test_directory_from_breadcrumbs_options(spark):
    got = _one(
        spark,
        FF.directory_from_breadcrumbs(
            F.col("t"), separator="|", remove_last=False, exclude=("home",)
        ),
        "Home | Shoes & Bags | Sandals",
    )
    assert got == "shoes__bags/sandals"


def test_derived_filename_deterministic_shape(spark):
    df = spark.createDataFrame([(42,), (42,), (7,)], "k long")
    rows = df.select(
        FF.derived_filename(F.col("k"), 8, extension="jpg", suffix="cat").alias("f")
    ).collect()
    names = [r["f"] for r in rows]
    assert names[0] == names[1]  # same key → same name (retry-safe)
    assert names[0] != names[2]
    stem = names[0]
    assert stem.endswith("_cat.jpg") and len(stem) == 8 + len("_cat.jpg")
    assert all(c in "0123456789abcdef" for c in stem[:8])
