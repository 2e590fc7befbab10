"""RFC 9309 robots matching (schedule.rep_match / rep_blocked /
parse_robots_rep / with_robots_rep): the native glob fold is checked
against an independent Python regex formulation over a pattern×target
grid, precedence against hand cases, and the parser + broadcast join
end-to-end."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from kryptone_spark.config import CrawlConfig
from kryptone_spark.operators import schedule
from tests.test_plans import plan_of

PATTERNS = [
    "/fish", "/fish*", "/fish*.php$", "/*.php$", "*fish", "/",
    "/*/p", "/a*b*c$", "/p*", "*", "/a**b", "/products*page=",
    "fish$", "/fish*fish", "/*/*/", "$",
]

TARGETS = [
    "/fish", "/fishheads", "/fish.php", "/fish-headache.php", "/catfish",
    "/a.php.php", "/a.php.html", "/", "/x/p", "/x/y/p", "/abYbc", "/abc",
    "/aXbYc", "/products?page=3", "/page", "", "/fish/salad", "/fish.PHP",
    "/fishXfish", "/x/y/",
]


def ref_match(target: str, pattern: str) -> bool:
    """Independent formulation: REP glob → anchored Python regex."""
    anchored = pattern.endswith("$")
    core = pattern[:-1] if anchored else pattern
    rx = "^" + ".*".join(re.escape(p) for p in core.split("*")) + ("$" if anchored else "")
    return re.search(rx, target, re.DOTALL) is not None


def test_rep_match_vs_python_reference(spark):
    rows = [(t, p) for t in TARGETS for p in PATTERNS]
    df = spark.createDataFrame(rows, ["t", "p"])
    got = df.select(
        "t", "p", schedule.rep_match(F.col("t"), F.col("p")).alias("m")
    ).collect()
    bad = [
        (r.t, r.p, r.m, ref_match(r.t, r.p))
        for r in got
        if r.m != ref_match(r.t, r.p)
    ]
    assert not bad, bad[:10]


def test_rep_precedence(spark):
    """Longest pattern wins; tie → Allow wins; no match → allowed."""
    rules = [
        (False, "/p"), (True, "/page"),       # longer Allow overrides
        (False, "/dl$"),                       # anchored block
        (True, "/tie"), (False, "/tie"),       # exact tie → Allow
    ]
    cases = [
        ("/page/1", False), ("/p1", True), ("/q", False),
        ("/dl", True), ("/dl2", False), ("/tie/x", False),
    ]
    df = spark.createDataFrame([(t,) for t, _ in cases], ["t"])
    lit_rules = F.array(*[
        F.struct(F.lit(a).alias("allow"), F.lit(p).alias("pattern"))
        for a, p in rules
    ])
    got = {
        r.t: r.b
        for r in df.select(
            "t", schedule.rep_blocked(F.col("t"), lit_rules).alias("b")
        ).collect()
    }
    for t, expect_blocked in cases:
        assert got[t] == expect_blocked, t


def test_parse_robots_rep(spark):
    body = (
        "User-agent: googlebot\nDisallow: /private\n\n"
        "User-agent: *\nAllow: /img/public*\nDisallow: /img/\n"
        "Disallow:\nCrawl-delay: 2\n"
    )
    df = spark.createDataFrame(
        [("a.test", body), ("b.test", "junk")], "domain string, robots_txt string"
    )
    got = {r["domain"]: r for r in schedule.parse_robots_rep(df).collect()}
    assert [tuple(x) for x in got["a.test"]["rules"]] == [
        (True, "/img/public*"), (False, "/img/"),
    ]
    assert got["a.test"]["crawl_delay"] == 2.0
    assert got["b.test"]["rules"] == [] and got["b.test"]["crawl_delay"] is None


def test_with_robots_rep_end_to_end(spark):
    body = (
        "User-agent: *\nAllow: /img/public*\nDisallow: /img/\n"
        "Disallow: /*.pdf$\nCrawl-delay: 2\n"
    )
    robots = schedule.parse_robots_rep(
        spark.createDataFrame([("a.test", body)], "domain string, robots_txt string")
    )
    pending = spark.createDataFrame(
        [
            ("http://a.test/img/x.jpg", "a.test"),
            ("http://a.test/img/public/x.jpg", "a.test"),
            ("http://a.test/doc.pdf", "a.test"),
            ("http://a.test/doc.pdf?dl=1", "a.test"),  # query breaks the $ anchor
            ("http://b.test/img/x.jpg", "b.test"),
        ],
        "url string, domain string",
    )
    out = schedule.with_robots_rep(pending, robots, CrawlConfig(wait_time=9.0))
    rows = {r["url"]: r for r in out.collect()}
    assert rows["http://a.test/img/x.jpg"]["robots_blocked"]
    assert not rows["http://a.test/img/public/x.jpg"]["robots_blocked"]
    assert rows["http://a.test/doc.pdf"]["robots_blocked"]
    assert not rows["http://a.test/doc.pdf?dl=1"]["robots_blocked"]
    assert not rows["http://b.test/img/x.jpg"]["robots_blocked"]
    assert rows["http://a.test/img/x.jpg"]["crawl_delay"] == 2.0
    assert rows["http://b.test/img/x.jpg"]["crawl_delay"] == 9.0
    # the rules dim broadcasts; the pending side never shuffles
    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan


def test_recrawl_schedule_values(spark):
    """Change-rate → geometric interval → exact-micros next fetch."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("A", t0, False), ("A", t0 + dt.timedelta(hours=1), True),
        ("A", t0 + dt.timedelta(hours=2, microseconds=250), False),
        ("B", t0, False), ("B", t0 + dt.timedelta(days=1), False),
        ("C", t0 + dt.timedelta(minutes=5), True),
    ]
    df = spark.createDataFrame(rows, "url string, fetch_ts timestamp, changed boolean")
    got = {r.url: r for r in schedule.recrawl_schedule(df).collect()}

    def expect(rate):
        return round(604800.0 * (3600.0 / 604800.0) ** rate, 6)

    a = got["A"]
    assert (a.n_obs, a.n_changes) == (3, 1)
    assert a.change_rate == pytest.approx(round(1 / 3, 6))
    assert a.interval_s == expect(1 / 3)
    last_us_a = int((t0 + dt.timedelta(hours=2, microseconds=250)
                     - dt.datetime(1970, 1, 1)).total_seconds() * 1e6)
    import math

    assert a.next_fetch_us == last_us_a + math.floor(expect(1 / 3) * 1e6)
    assert got["B"].interval_s == 604800.0  # never changed → max interval
    assert got["C"].interval_s == 3600.0    # changes every fetch → min


def test_rep_match_seeded_fuzz(spark):
    """500 seeded-random pattern×target pairs over a trap-prone
    alphabet (repeated stars, '$' mid-pattern, regex metachars, empty
    runs) vs the independent regex formulation — one DataFrame pass."""
    import random

    rng = random.Random(4309)
    alphabet = "ab/.*?+()[x-"
    def rand_s(maxlen, extra=""):
        return "".join(
            rng.choice(alphabet + extra) for _ in range(rng.randrange(maxlen))
        )

    cases = []
    for _ in range(500):
        pat = rand_s(8)
        if rng.random() < 0.4:
            pat += "$"
        tgt = rand_s(12)
        if rng.random() < 0.3 and pat:
            # seed near-miss targets that share material with the pattern
            tgt = pat.replace("*", rand_s(3)).replace("$", "") + rand_s(4)
        cases.append((tgt, pat))
    df = spark.createDataFrame(cases, ["t", "p"])
    got = df.select(
        "t", "p", schedule.rep_match(F.col("t"), F.col("p")).alias("m")
    ).collect()
    bad = [
        (repr(r.t), repr(r.p), r.m, ref_match(r.t, r.p))
        for r in got
        if bool(r.m) != ref_match(r.t, r.p)
    ]
    assert not bad, bad[:10]


def test_schedule_audit_gaps_and_violations(spark):
    """Audit semantics: gap undershoot counts per domain, single-fetch
    domains audit clean (no NULL leakage), exact integer micros."""
    from kryptone_spark.operators.schedule import schedule_audit

    rows = [
        ("a", 0), ("a", 30_000_000), ("a", 45_000_000),   # one 15s gap
        ("b", 0), ("b", 30_000_000), ("b", 60_000_000),   # clean
        ("c", 5),                                          # single fetch
    ]
    log = spark.createDataFrame(rows, "domain string, fetch_us long")
    got = {r["domain"]: r for r in schedule_audit(log, delay_us=30_000_000).collect()}
    assert (got["a"]["n_fetches"], got["a"]["min_gap_us"],
            got["a"]["n_violations"], got["a"]["politeness_ok"]) == (3, 15_000_000, 1, False)
    assert (got["b"]["n_violations"], got["b"]["politeness_ok"]) == (0, True)
    assert (got["c"]["n_fetches"], got["c"]["min_gap_us"],
            got["c"]["n_violations"], got["c"]["politeness_ok"]) == (1, None, 0, True)


def test_parse_cache_control_directives(spark):
    """no-store beats max-age; absent header takes the default TTL;
    exact integer micros."""
    from kryptone_spark.operators.schedule import parse_cache_control

    rows = [
        (1, "max-age=60, public", 1_000_000),
        (2, "no-store, max-age=60", 1_000_000),
        (3, None, 1_000_000),
        (4, "Max-Age=120", 0),
    ]
    df = spark.createDataFrame(rows, "id long, cache_control string, fetch_us long")
    got = {r["id"]: r for r in parse_cache_control(df, default_ttl_s=10).collect()}
    assert (got[1]["max_age_s"], got[1]["no_store"], got[1]["next_fetch_us"]) == (60, False, 61_000_000)
    assert (got[2]["no_store"], got[2]["next_fetch_us"]) == (True, 1_000_000)
    assert (got[3]["max_age_s"], got[3]["next_fetch_us"]) == (None, 11_000_000)
    assert got[4]["next_fetch_us"] == 120_000_000  # case-insensitive


def test_rep_target_empty_path_is_root(spark):
    """RFC 3986 §6.2.3: 'Disallow: /' must block the domain root even
    when the URL carries no path, and a bare-query URL matches as
    '/?...'."""
    from kryptone_spark.operators.schedule import rep_target

    df = spark.createDataFrame(
        [("http://a.test",), ("http://a.test?q=1",), ("http://a.test/p?x=2",)],
        "url string",
    )
    got = [r["t"] for r in df.select(rep_target(F.col("url")).alias("t")).collect()]
    assert got == ["/", "/?q=1", "/p?x=2"]


def test_robots_sitemaps_to_seeds_pipeline(spark):
    """robots_sitemaps: case-insensitive directive, CRLF bodies,
    several declarations per domain, none for silent domains — and the
    output feeds sitemap_seeds end-to-end."""
    from kryptone_spark.operators.schedule import robots_sitemaps
    from kryptone_spark.sources.seeds import sitemap_seeds

    robots = spark.createDataFrame(
        [
            ("a.test", "User-agent: *\r\nSitemap: http://a.test/s.xml\r\n"
                       "SITEMAP:http://a.test/t.xml\r\nDisallow: /x"),
            ("b.test", "User-agent: *\nDisallow: /"),
        ],
        "domain string, robots_txt string",
    )
    got = {(r["domain"], r["sitemap_url"]) for r in robots_sitemaps(robots).collect()}
    assert got == {
        ("a.test", "http://a.test/s.xml"),
        ("a.test", "http://a.test/t.xml"),
    }

    # discovered sitemap bodies flow into the seed source unchanged
    bodies = spark.createDataFrame(
        [("http://a.test/s.xml",
          "<urlset><url><loc>http://a.test/p1</loc></url>"
          "<url><loc>http://a.test/p2</loc></url></urlset>")],
        "sitemap_url string, xml string",
    )
    seeds = {r["url"] for r in sitemap_seeds(bodies).collect()}
    assert seeds == {"http://a.test/p1", "http://a.test/p2"}
