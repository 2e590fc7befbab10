"""Crawl-trap detection (operators/traps.py) + domain reputation
rollup (operators/domains.py): value tests against hand-computed
expectations and plan-shape pins for the 100 TB promises (trap scoring
is shuffle-free; domain_stats never plans a distinct-agg Expand; the
domain filter dim is broadcast)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kryptone_spark.operators import domains, traps
from tests.test_plans import plan_of

TRAP_URLS = [
    # (url, depth, rep, numeric, params, session, score)
    ("https://a.test/a/b/a/b/a/b/page-1", 7, 3, 0, 0, False, 2),
    ("https://a.test/p-5;jsessionid=AB5", 1, 1, 0, 0, True, 2),
    ("https://a.test/shop?phpsessid=x&a=1&b=2&c=3&d=4&e=5", 1, 1, 0, 6, True, 3),
    ("https://a.test/archive/2020/3/7/2021/4/9/post-1", 8, 1, 6, 0, False, 2),
    ("https://a.test/product-9", 1, 1, 0, 0, False, 0),
    ("https://a.test/", 0, 0, 0, 0, False, 0),
    ("https://a.test/products?page=4", 1, 1, 0, 1, False, 0),
    ("https://a.test/" + "x" * 200, 1, 1, 0, 0, False, 1),
]


@pytest.fixture(scope="module")
def trap_df(spark):
    return spark.createDataFrame([(u[0],) for u in TRAP_URLS], ["url"])


def test_trap_signal_values(spark, trap_df):
    rows = {
        r.url: r
        for r in traps.trap_signals(trap_df).collect()
    }
    for url, depth, rep, numeric, params, session, score in TRAP_URLS:
        r = rows[url]
        assert (
            r.path_depth, r.max_seg_repeat, r.n_numeric_segs,
            r.n_query_params, r.has_session_id, r.trap_score,
        ) == (depth, rep, numeric, params, session, score), url
        assert r.is_trap == (score >= traps.DEFAULT_TRAP_THRESHOLD)


def test_trap_filter_keeps_schema_and_drops_traps(spark, trap_df):
    out = traps.trap_filter(trap_df)
    assert out.columns == ["url"]
    kept = {r.url for r in out.collect()}
    expected = {u for u, *_, score in TRAP_URLS if score < 2}
    assert kept == expected


def test_trap_scoring_is_shuffle_free(spark, trap_df):
    """The whole signal projection must plan without an Exchange —
    it runs at scan speed as a pre-admission gate."""
    plan = plan_of(traps.trap_signals(trap_df))
    assert "Exchange" not in plan


DOCS = [
    ("d1", "hello world the and of a to in is", "en", "s1"),
    ("d2", "hello   world the and of a to in is", "en", "s1"),  # ws-normalized dup of d1
    ("d3", "a genuinely different body with the of and", "en", "s1"),
    ("d4", "autre texte sans anglais", "fr", "s2"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text", "lang", "source"])


def test_domain_stats_values(spark, docs_df):
    rows = {r.domain: r for r in domains.domain_stats(docs_df).collect()}
    s1, s2 = rows["s1"], rows["s2"]
    assert (s1.n_docs, s1.n_distinct) == (3, 2)  # d1/d2 collapse on fp
    assert s1.dup_rate == pytest.approx(1 - 2 / 3, abs=1e-6)
    assert s1.en_share == 1.0
    assert (s2.n_docs, s2.n_distinct, s2.dup_rate, s2.en_share) == (1, 1, 0.0, 0.0)
    # avg_quality equals the mean of the per-doc rounded scores
    from kryptone_spark.functions import text as TXT

    q = [
        r.q
        for r in docs_df.select(TXT.quality_score(F.col("text")).alias("q")).collect()
    ]
    assert s1.avg_quality == pytest.approx(round(sum(q[:3]) / 3, 6), abs=1e-6)


def test_domain_stats_plans_without_expand(spark, docs_df):
    """The dup-rate distinct count must come from the two-stage
    (domain, fp) aggregation, NOT a countDistinct Expand (which
    doubles the shuffle width at corpus scale)."""
    plan = plan_of(domains.domain_stats(docs_df))
    assert "Expand" not in plan


def test_domain_filter_broadcasts_the_dim(spark, docs_df):
    stats = domains.domain_stats(docs_df)
    out = domains.domain_filter(docs_df, stats, max_dup_rate=0.2)
    assert "BroadcastHashJoin" in plan_of(out)
    assert {r.doc_id for r in out.collect()} == {"d4"}


def _trap_site(spark):
    """Tiny site whose /p1 page mints trap URLs (path loop + session
    id) alongside one real link."""
    from kryptone_spark.synth import site_df

    def page(url, links):
        return {
            "doc_id": url,
            "spans": [
                {"kind": "text", "text": f"body of {url}", "media_ref": "", "offset": 0}
            ]
            + [
                {"kind": "link", "text": "l", "media_ref": l, "offset": i + 1}
                for i, l in enumerate(links)
            ],
        }

    base = "http://sitea.test"
    rows = [
        page(f"{base}/", [f"{base}/p1", f"{base}/p2", f"{base}/cal"]),
        page(f"{base}/p1", [
            f"{base}/a/b/a/b/a/b/t1",
            f"{base}/x;jsessionid=Z1",
            f"{base}/p3",
        ]),
        page(f"{base}/p2", []),
        page(f"{base}/p3", []),
        page(f"{base}/cal", []),
    ]
    return site_df(spark, rows)


TRAP_SITE_URLS = {"http://sitea.test/a/b/a/b/a/b/t1", "http://sitea.test/x;jsessionid=Z1"}


def _crawl(spark, docs, tmpdir, **config_kw):
    from kryptone_spark.config import CrawlConfig
    from kryptone_spark.plans.tableio import TableIO
    from kryptone_spark.plans.waves import WaveRunner

    config = CrawlConfig(start_urls=["http://sitea.test/"], **config_kw)
    io = TableIO(spark, str(tmpdir))
    WaveRunner(spark, config, docs, io).run()
    fetched = {r.url for r in io.read("fetch_batches").collect()}
    seen = {r.url for r in io.read("seen").collect()}
    return fetched, seen


def test_wave_loop_trap_gate(spark, tmp_path):
    docs = _trap_site(spark)
    # gate ON: trap URLs are neither fetched nor ever enter seen
    fetched, seen = _crawl(spark, docs, tmp_path / "on", trap_threshold=2)
    assert fetched == {
        "http://sitea.test/", "http://sitea.test/p1", "http://sitea.test/p2",
        "http://sitea.test/cal", "http://sitea.test/p3",
    }
    assert not (seen & TRAP_SITE_URLS)
    # default (reference parity): traps are admitted like any URL
    fetched_off, seen_off = _crawl(spark, docs, tmp_path / "off")
    assert TRAP_SITE_URLS <= seen_off
    assert TRAP_SITE_URLS <= fetched_off


def test_url_templates_replacement_order(spark):
    """uuid before hex before digits: a uuid must not shred into
    {hex}/{n} fragments; shared shapes group."""
    from kryptone_spark.operators.traps import url_templates

    rows = [
        ("http://s.test/item/123",),
        ("http://s.test/item/456",),
        ("http://s.test/doc/deadbeefdeadbeefcafe",),
        ("http://s.test/u/01234567-89ab-cdef-0123-456789abcdef",),
        ("http://s.test/plain",),
    ]
    df = spark.createDataFrame(rows, "url string")
    got = {r["template"]: (r["n_urls"], r["example_url"])
           for r in url_templates(df).collect()}
    assert got["http://s.test/item/{n}"] == (2, "http://s.test/item/123")
    assert got["http://s.test/doc/{hex}"][0] == 1
    assert got["http://s.test/u/{uuid}"][0] == 1
    assert got["http://s.test/plain"][0] == 1


def test_domain_graph_rollup(spark):
    """Intra-domain edges drop; counts and distinct-src per pair."""
    from kryptone_spark.operators.linkgraph import domain_graph

    edges = spark.createDataFrame(
        [
            ("http://a.test/1", "http://b.test/x"),
            ("http://a.test/1", "http://b.test/y"),
            ("http://a.test/2", "http://b.test/x"),
            ("http://a.test/3", "http://a.test/4"),   # intra — dropped
            ("http://b.test/x", "http://a.test/1"),
        ],
        "src_url string, dst_url string",
    )
    got = {
        (r["src_domain"], r["dst_domain"]): (r["n_links"], r["n_src_pages"])
        for r in domain_graph(edges).collect()
    }
    assert got == {("a.test", "b.test"): (3, 2), ("b.test", "a.test"): (1, 1)}


def test_frontier_age_stats(spark):
    """Pending = frontier − visited; ages from discovered_wave."""
    from kryptone_spark.operators.domains import frontier_age_stats

    frontier = spark.createDataFrame(
        [
            ("u1", "a.test", 0), ("u2", "a.test", 3), ("u3", "a.test", 5),
            ("u4", "b.test", 5),
        ],
        "url string, domain string, discovered_wave int",
    )
    visited = spark.createDataFrame([("u2",)], "url string")
    got = {r["domain"]: r for r in
           frontier_age_stats(frontier, visited, current_wave=6).collect()}
    a = got["a.test"]
    assert (a["n_pending"], a["oldest_wave"], a["max_age"], a["avg_age"]) == (2, 0, 6, 3.5)
    b = got["b.test"]
    assert (b["n_pending"], b["max_age"]) == (1, 1)
