"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, fingerprinting. All pure-column (scan-speed);
each has an exact DuckDB oracle in __spark_entry__.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kryptone_spark.functions import text as TXT

# tiny per-language stopword lists for the n-gram/stopword heuristic.
# Latin-script languages score by whole-token equality; zh has no word
# delimiters, so its single-character function words are scored by
# SUBSTRING OCCURRENCE COUNT (token equality against an unsegmented
# Chinese sentence can never match).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "with"),
    "es": ("el", "la", "de", "es", "con"),
    "fr": ("le", "la", "et", "est", "avec"),
    "de": ("der", "die", "und", "ist", "mit"),
    "zh": ("的", "是", "和", "在", "了"),
}

_CHAR_COUNT_LANGS = ("zh",)


def _tok(text_col):
    return F.split(
        F.regexp_replace(F.lower(text_col), "[^a-z0-9一-鿿 ]", " "), " +"
    )


def lang_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-language marker-hit counts + argmax prediction. At 100 TB
    this is one pass of array intersects inside codegen."""
    toks = _tok(F.col(text_col))
    out = df
    score_cols = []
    for lang, markers in LANG_MARKERS.items():
        if lang in _CHAR_COUNT_LANGS:
            c = F.lit(0)
            for m in markers:
                c = c + (
                    F.length(F.col(text_col))
                    - F.length(F.replace(F.col(text_col), F.lit(m)))
                )
            c = c.cast("int").alias(f"score_{lang}")
        else:
            c = F.size(
                F.filter(toks, lambda t: t.isin(*markers))
            ).alias(f"score_{lang}")
        score_cols.append((lang, c))
        out = out.withColumn(f"score_{lang}", c)
    pred = None
    best = None
    for lang, _ in score_cols:
        col = F.col(f"score_{lang}")
        if pred is None:
            pred, best = F.lit(lang), col
        else:
            pred = F.when(col > best, F.lit(lang)).otherwise(pred)
            best = F.greatest(best, col)
    return out.withColumn("lang_pred", pred)


def quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("quality", TXT.quality_score(F.col(text_col)))


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + a BPE-ish subword proxy (alnum runs and
    punctuation counted separately — deterministic, SQL-equivalent)."""
    ws = TXT.token_count(F.col(text_col))  # 0 for empty/blank docs
    bpe_ish = F.size(
        F.filter(
            F.split(F.regexp_replace(F.col(text_col), r"([^A-Za-z0-9\s])", " $1 "), r"\s+"),
            lambda t: t != "",
        )
    )
    return df.withColumn("n_ws_tokens", ws).withColumn("n_bpe_tokens", bpe_ish)


def repetition_stats(
    df: DataFrame, text_col: str = "text", key_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1, public):
    per-document duplicate-word fraction and top-bigram fraction — the
    standard "boilerplate / degenerate repetition" quality gates of a
    training-data pipeline.

    Output columns (added): ``n_words`` (long), ``dup_word_frac``
    (double, 1 - distinct/total, 0.0 for empty docs), ``n_bigrams``
    (long), ``top_bigram_frac`` (double, occurrences of the most
    frequent word bigram / total bigrams, 0.0 when < 2 words). Both
    fractions rounded to 6 dp (oracle-hash parity).

    Scale shape: ZERO shuffles — one projection. The word stats are
    array expressions, and the top-bigram count is an IN-ROW fold over
    the doc's sorted bigram array (max consecutive-equal run): a doc's
    bigrams are already colocated in its row, so nothing needs a
    groupBy. (The previous explode → groupBy(key, bigram) form carried
    every input column — including the full text — as first() through
    two exchanges: one copy of the text PER DISTINCT BIGRAM.) Cost is
    O(n log n) in-row per doc; the fold knocks this one projection out
    of codegen, which a 100 TB corpus trades gladly for the removed
    token-volume shuffle.
    """
    words = F.filter(_tok(F.col(text_col)), lambda t: t != "")
    base = (
        df.withColumn("__words", words)
        .withColumn("n_words", F.size("__words").cast("long"))
        .withColumn(
            "dup_word_frac",
            F.when(
                F.col("n_words") > 0,
                F.round(
                    F.lit(1.0)
                    - F.size(F.array_distinct("__words")).cast("double")
                    / F.col("n_words"),
                    6,
                ),
            ).otherwise(F.lit(0.0)),
        )
    )
    # bigram list: sequence() is descending for hi < lo, so guard the
    # < 2-word case explicitly with an empty array
    bigrams = F.when(
        F.size("__words") >= 2,
        F.expr(
            "transform(sequence(1, size(__words) - 1), "
            "i -> concat(element_at(__words, i), ' ', element_at(__words, i + 1)))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    carried = [c for c in base.columns if c != "__words"]
    # in-row top-bigram count: sort the bigram list, fold once tracking
    # the longest equal run. Bigrams are 'w1 w2' of nonempty words, so
    # the '' sentinel can never collide with a real element.
    zero = F.lit(0).cast("long")
    run_best = F.aggregate(
        F.array_sort(bigrams),
        F.struct(
            F.lit("").alias("prev"), zero.alias("run"), zero.alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(
                F.lit(1).cast("long")
            ).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(
                    F.lit(1).cast("long")
                ),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    out = (
        base.withColumn("n_bigrams", F.size(bigrams).cast("long"))
        .withColumn("__mx", run_best)
        .withColumn(
            "top_bigram_frac",
            # explicit n_bigrams > 0 guard: 0/0 double division is NaN
            # (not null), which coalesce would pass through
            F.when(
                F.col("n_bigrams") > 0,
                F.round(F.col("__mx").cast("double") / F.col("n_bigrams"), 6),
            ).otherwise(F.lit(0.0)),
        )
        .drop("__mx", "__words")
    )
    return out.select(*carried, "n_bigrams", "top_bigram_frac")


def unigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    vocab_size: int = 50_000,
    alpha: float = 0.5,
) -> DataFrame:
    """Perplexity-proxy quality filter: per-doc mean token log-prob
    under the corpus's OWN add-alpha-smoothed unigram LM (the cheap,
    model-free stand-in for a KenLM pass — CCNet-style, public method).

    logp(tok) = ln((c(tok) + a) / (N + a*(V+1))) for the top-``V``
    vocabulary (count desc, token asc tie-break); every out-of-vocab
    token scores ln(a / (N + a*(V+1))). Low mean-logp = gibberish or
    boilerplate-rare tokens; high = stereotypical text.

    Returns (key_col, n_toks, mean_logprob) — doc-level only, so the
    text column never rides a shuffle; mean rounded to 6 dp, 0.0 for
    empty docs.

    Scale shape: pass 1 builds the vocab — one token-keyed count
    (map-side partial agg) + TakeOrderedAndProject top-V + a broadcast
    1-row total (never collected to Python); pass 2 scores — one corpus
    scan, explode_outer, broadcast join to the V-row vocab, one
    doc-keyed agg. No shuffle ever carries more than (key, token).
    """
    from kryptone_spark.functions.rank import ranked_top_k

    toks = F.filter(_tok(F.col(text_col)), lambda t: t != "")
    exploded = df.select(F.col(key_col), F.explode_outer(toks).alias("__tok"))
    counts = (
        exploded.where(F.col("__tok").isNotNull())
        .groupBy("__tok")
        .agg(F.count("*").alias("__c"))
    )
    total = counts.agg(F.sum("__c").cast("double").alias("__n"))
    vocab = (
        ranked_top_k(counts, [F.desc("__c"), F.asc("__tok")], k=vocab_size)
        .drop("rnk")
        .crossJoin(F.broadcast(total))
        .select(
            "__tok",
            F.log((F.col("__c") + alpha) / (F.col("__n") + alpha * (vocab_size + 1))).alias("__logp"),
        )
    )
    oov = total.select(
        F.log(F.lit(alpha) / (F.col("__n") + alpha * (vocab_size + 1))).alias("__oov")
    )
    scored = (
        exploded.join(F.broadcast(vocab), "__tok", "left")
        .crossJoin(F.broadcast(oov))
        .withColumn(
            "__lp",
            F.when(
                F.col("__tok").isNotNull(),
                F.coalesce(F.col("__logp"), F.col("__oov")),
            ),
        )
    )
    return (
        scored.groupBy(key_col)
        .agg(
            F.count("__tok").cast("long").alias("n_toks"),
            F.round(F.coalesce(F.avg("__lp"), F.lit(0.0)), 6).alias("mean_logprob"),
        )
    )


def fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """md5 + xxhash64 content fingerprints over normalized text."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.withColumn("fp_md5", F.md5(norm)).withColumn(
        "fp_xx64", F.xxhash64(norm)
    )


# Standard soft-404 body phrases (the public heuristic inventory used
# by crawl curation since Bar-Yossef et al., WWW'04 "Sic Transit Gloria
# Telae"; Heritrix and CommonCrawl pipelines gate on the same family).
SOFT404_PATTERNS: tuple[str, ...] = (
    "page not found",
    "404 not found",
    "error 404",
    "http 404",
    "does not exist",
    "no longer available",
    "page you requested",
    "cannot be found",
    "could not be found",
)


def soft404_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Soft-404 detection — pages that answered HTTP 200 with an error
    body. A crawler that treats soft 404s as content pollutes both the
    training corpus and the link graph (their outlinks are template
    chrome), so this is a standard curation gate; the reference has no
    equivalent (it trusts whatever Selenium rendered). Engine-only op,
    same family as the quality/repetition gates above.

    Adds: ``notfound_hit`` (any standard error phrase in the lowered
    text), ``short_doc`` (chars < 500 — error pages are terse),
    ``soft404_score`` (0.7·hit + 0.3·short, one decimal: phrase
    evidence dominates, shortness alone never flags), ``is_soft404``
    (= notfound_hit). One codegen projection, zero shuffles —
    ``contains`` only, so the DuckDB oracle states the identical
    computation; scanning 10^10 bodies is a map-only pass."""
    low = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    hit = F.lit(False)
    for p in SOFT404_PATTERNS:
        hit = hit | low.contains(p)
    short = F.length(F.coalesce(F.col(text_col), F.lit(""))) < 500
    score = F.round(
        F.when(hit, F.lit(0.7)).otherwise(F.lit(0.0))
        + F.when(short, F.lit(0.3)).otherwise(F.lit(0.0)),
        1,
    )
    return (
        df.withColumn("notfound_hit", hit)
        .withColumn("short_doc", short)
        .withColumn("soft404_score", score)
        .withColumn("is_soft404", hit)
    )
