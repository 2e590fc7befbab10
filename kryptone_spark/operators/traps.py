"""Crawl-trap detection — columnar URL-shape heuristics.

The reference has no trap defense at all: ``urls_to_visit`` grows
without bound on a calendar archive or a session-id mint
(/root/reference/kryptone/base.py:292-295 — an in-memory set fed by
every admitted URL). At 10^10-URL frontier scale a single trap domain
can mint URLs faster than the whole politeness budget drains them, so
a production crawler scores URL *shape* before admission and caps or
drops high-scoring candidates (the Heritrix/Nutch "spider trap"
playbook: path-loop detection, session-id strip lists, calendar
explosion, query-parameter minting).

Everything here is a single codegen-friendly projection over the URL
string — no shuffle, no UDF, no state — so at 100 TB it runs at scan
speed as a pre-filter *before* the seen anti-join, which is exactly
where it pays: trap URLs never reach the bloom probe, the seen table,
or the frontier checkpoint.

Signals (each native, each independently testable):

- ``path_depth``     — non-empty '/'-separated segments.
- ``max_seg_repeat`` — highest occurrence count of any single path
  segment (``/a/b/a/b/a/b`` → 3): the classic link-loop trap.
- ``n_numeric_segs`` — all-digit segments; 4+ reads as a calendar /
  archive explosion (``/2026/08/17/2026/...``).
- ``n_query_params`` — '&'-separated k=v pairs; parameter minting.
- ``has_session_id`` — ``;jsessionid=`` path parameter or a known
  session key in the query string (case-insensitive).
- ``url_len``        — raw length; runaway URLs compound other traps.

``trap_score`` is an integer weighted sum (session ids and path loops
weigh 2 — they *always* mint unbounded aliases; shape signals weigh
1), ``is_trap`` is score >= threshold. The weights are deliberately
plain integers so the score is exactly reproducible in any SQL engine
(the contract query ``url_trap_score`` pins it against DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kryptone_spark.functions import urls as U

# Session-id query keys seen across the big public crawlers' strip
# lists (Nutch's urlnormalizer-querystring defaults + classic CF/PHP
# ids). Lower-case; matching lower-cases the key first.
SESSION_KEYS = (
    "sid", "sessionid", "session_id", "phpsessid", "jsessionid",
    "cfid", "cftoken", "aspsessionid", "zenid",
)

#: default ``is_trap`` threshold: one strong signal (weight 2) or two
#: weak shape signals trip it.
DEFAULT_TRAP_THRESHOLD = 2


def _segments(url: Column) -> Column:
    return F.filter(F.split(U.path(url), "/"), lambda s: s != "")


def max_segment_repeat(url: Column) -> Column:
    """Highest per-segment occurrence count (0 for a root path).

    O(depth^2) per row, but depth is tens at worst and the whole
    expression stays inside one projection — no explode, no shuffle.
    """
    segs = _segments(url)
    return F.coalesce(
        F.array_max(
            F.transform(segs, lambda s: F.size(F.filter(segs, lambda x: x == s)))
        ),
        F.lit(0),
    ).cast("int")


def has_session_id(url: Column) -> Column:
    # ';jsessionid=...' rides the urlparse PARAMS component (U.path
    # strips it — CPython _splitparams), so probe params, not path.
    p = U.params(url)
    in_params = (p != "") & F.lower(F.substring_index(p, "=", 1)).isin(*SESSION_KEYS)
    q_keys = F.transform(
        F.filter(F.split(F.lower(U.query(url)), "&"), lambda kv: kv != ""),
        lambda kv: F.substring_index(kv, "=", 1),
    )
    in_query = F.arrays_overlap(q_keys, F.lit(list(SESSION_KEYS)))
    return in_params | F.coalesce(in_query, F.lit(False))


def trap_signals(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds the six signal columns + ``trap_score`` + ``is_trap``."""
    url = F.col(url_col)
    segs = _segments(url)
    q = U.query(url)
    n_params = F.when(q == "", F.lit(0)).otherwise(
        F.size(F.filter(F.split(q, "&"), lambda kv: kv != ""))
    ).cast("int")
    depth = F.size(segs).cast("int")
    numeric = F.size(F.filter(segs, lambda s: s.rlike(r"^[0-9]+$"))).cast("int")
    rep = max_segment_repeat(url)
    sess = has_session_id(url)
    ln = F.length(url).cast("int")
    score = (
        F.when(rep >= 3, 2).otherwise(0)
        + F.when(sess, 2).otherwise(0)
        + F.when(depth >= 8, 1).otherwise(0)
        + F.when(numeric >= 4, 1).otherwise(0)
        + F.when(n_params >= 6, 1).otherwise(0)
        + F.when(ln >= 200, 1).otherwise(0)
    ).cast("int")
    return (
        df.withColumn("path_depth", depth)
        .withColumn("max_seg_repeat", rep)
        .withColumn("n_numeric_segs", numeric)
        .withColumn("n_query_params", n_params)
        .withColumn("has_session_id", sess)
        .withColumn("url_len", ln)
        .withColumn("trap_score", score)
        .withColumn("is_trap", (score >= DEFAULT_TRAP_THRESHOLD))
    )


def trap_filter(
    df: DataFrame,
    url_col: str = "url",
    threshold: int = DEFAULT_TRAP_THRESHOLD,
) -> DataFrame:
    """Pre-admission trap gate: keeps rows scoring below ``threshold``,
    preserving the input schema (signal columns are internal).

    Sits *before* ``admission.admit`` / the seen anti-join in a wave,
    mirroring ``gather_filter``'s position: trapped URLs never cost a
    bloom probe or a seen-table row.
    """
    scored = trap_signals(df, url_col=url_col)
    return scored.where(F.col("trap_score") < F.lit(int(threshold))).select(
        *df.columns
    )


def url_templates(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Mine URL *shape* templates: UUIDs → {uuid}, long hex runs →
    {hex}, digit runs → {n}, then group. The inverse view of
    trap_signals: a template with a huge instance count and few
    distinct shapes is a minted URL space (calendar pages, session
    permalinks, faceted search) — the classic crawl-budget sink that
    per-URL scoring can't see because every INSTANCE looks harmless.

    Pure projection + one partial-agg groupBy on the template string;
    replacement order matters (uuid before hex before digits — a uuid
    contains hex runs, a hex run contains digits) and every pattern is
    RE2-safe so the oracle restates it verbatim."""
    u = F.col(url_col)
    t = F.regexp_replace(
        u,
        r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}",
        "{uuid}",
    )
    t = F.regexp_replace(t, r"[0-9a-f]{16,}", "{hex}")
    t = F.regexp_replace(t, r"[0-9]+", "{n}")
    return (
        df.select(t.alias("template"), u.alias("__u"))
        .groupBy("template")
        .agg(
            F.count("*").alias("n_urls"),
            F.min("__u").alias("example_url"),
        )
    )
