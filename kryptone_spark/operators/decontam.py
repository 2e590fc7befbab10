"""Benchmark decontamination for training corpora.

Before a corpus trains a model, any document overlapping an evaluation
benchmark must be flagged (n-gram collision is the standard criterion —
GPT-3 appendix C / PaLM §7 style, public method). This is the corpus ×
benchmark join done Spark-first:

- positional word n-grams (order preserved — unlike the dedup family's
  set-semantic shingles, a benchmark hit is a *sequence* match);
- the benchmark side is n-grammed, deduped, and **broadcast** — eval
  suites are MBs while the corpus is TBs, so the contamination probe
  must never shuffle the corpus on gram;
- output is doc-level stats only (doc_id, n_grams, n_contam_ngrams,
  contaminated) — deliberately NOT the input-plus-columns shape, so the
  text column never rides a shuffle; callers who want the text join the
  verdict back on the (already co-partitioned) key.

Scale shape: one corpus scan → explode_outer (short docs keep a null
row, so every doc gets a verdict) → broadcast left join on gram → one
doc-keyed aggregation. O(total corpus tokens) work, one shuffle of
(doc_id, gram-hit) pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _toks(text_col: Column) -> Column:
    """Order-preserving non-distinct tokenizer, charset-aligned with
    textstats._tok: CJK codepoints ARE tokens — an ASCII-only charset
    would tokenize a Chinese/Japanese benchmark to zero n-grams and
    silently mark every doc uncontaminated, exactly the docs this
    operator exists to flag."""
    return F.filter(
        F.split(F.regexp_replace(F.lower(text_col), "[^a-z0-9一-鿿 ]", " "), " +"),
        lambda t: t != "",
    )


def _positional_ngrams(toks: Column, n: int) -> Column:
    """Array of order-preserving word n-grams; empty for < n tokens
    (sequence() flips descending for hi < lo, so guard explicitly)."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def contamination(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 8,
    text_col: str = "text",
    key_col: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Flag corpus documents sharing any positional word ``n``-gram with
    the benchmark set.

    Returns (key_col, n_grams, n_contam_ngrams, contaminated):
    ``n_grams`` counts the doc's positional n-grams (repeats included),
    ``n_contam_ngrams`` how many of them appear anywhere in the
    benchmark, ``contaminated`` = n_contam_ngrams > 0.
    """
    bench_grams = (
        bench.select(F.explode(_positional_ngrams(_toks(F.col(bench_text_col)), n)).alias("gram"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    exploded = docs.select(
        F.col(key_col),
        F.explode_outer(_positional_ngrams(_toks(F.col(text_col)), n)).alias("gram"),
    )
    joined = exploded.join(F.broadcast(bench_grams), "gram", "left")
    return (
        joined.groupBy(key_col)
        .agg(
            F.count("gram").cast("long").alias("n_grams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("long").alias("n_contam_ngrams"),
        )
        .withColumn("contaminated", F.col("n_contam_ngrams") > 0)
    )
