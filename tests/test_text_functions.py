"""F1-F6 scalar text functions (functions/text.py) — unit coverage for
the pieces the scalar_text contract query doesn't exercise (accent
transliteration, slugify's unaccent branch, punctuation keep-lists)."""

from pyspark.sql import functions as F

from kryptone_spark.functions import text as TXT


def _one(spark, col_fn, value):
    df = spark.createDataFrame([(value,)], "t string")
    return df.select(col_fn(F.col("t")).alias("o")).collect()[0]["o"]


def test_remove_accents_composed_latin(spark):
    assert _one(spark, TXT.remove_accents, "crème brûlée à Paris") == (
        "creme brulee a Paris"
    )
    assert _one(spark, TXT.remove_accents, "niño señor") == "nino senor"


def test_remove_accents_non_decomposable(spark):
    """The unidecode-parity cases NFKD alone cannot fold (no combining
    mark to strip): German ß, Nordic ø/æ/þ/ð, Polish ł, Croatian đ."""
    cases = {
        "straße": "strasse",
        "Søren Kierkegaard": "Soren Kierkegaard",
        "Ærø": "AEro",
        "Łódź": "Lodz",
        "Đorđe": "Dorde",
        "Þórr fæddist á ströndum": "Thorr faeddist a strondum",
    }
    for src, want in cases.items():
        assert _one(spark, TXT.remove_accents, src) == want, src


def test_slugify_ascii_and_accented(spark):
    assert _one(spark, TXT.slugify, "Hello World") == "hello-world"
    assert _one(spark, TXT.slugify, "Crème Brûlée") == "creme-brulee"


def test_remove_punctuation_keep_and_email(spark):
    assert _one(spark, TXT.remove_punctuation, "a,b.c!") == "abc"
    assert (
        _one(spark, lambda c: TXT.remove_punctuation(c, keep="."), "a,b.c!")
        == "ab.c"
    )
    assert (
        _one(
            spark,
            lambda c: TXT.remove_punctuation(c, email_exception=True),
            "x@y.test!",
        )
        == "x@ytest"
    )
