"""Property test: the native URL splitter vs the reference's parser.

The reference's URL object wraps ``urllib.parse.urlparse``
(/root/reference/kryptone/utils/urls.py:94); the engine re-expresses
the split as one RFC-3986 regex (kryptone_spark/functions/urls.py).
This test fuzzes a seeded corpus of adversarial URLs — userinfo,
ports, IPv6 brackets, %-escapes, empty components, embedded
tab/newline (urllib strips them before splitting), unicode, '#'/'?'
permutations — and asserts component-exact agreement with urlparse in
ONE Spark job.
"""

from __future__ import annotations

import random
import urllib.parse

from pyspark.sql import functions as F

from kryptone_spark.functions import urls as U

SCHEMES = ["http", "https", "HTTP", "ftp", "a+b-c.d", ""]
HOSTS = [
    "example.com", "EXAMPLE.com", "sub.shop.example.co.uk", "localhost",
    "127.0.0.1", "[::1]", "[2001:db8::1]:8080", "user:pw@example.com",
    "example.com:8443", "xn--bcher-kva.example", "",
]
PATHS = [
    "", "/", "/a", "/a/b/c", "/a//b", "/a/b/", "/%20space", "/café",
    "/img/photo.jpg", "/file.tar.gz", "/.hidden", "/trailing.", "/a;params",
    "/with\ttab", "/with\nnewline", "/products",
]
QUERIES = ["", "a=1", "a=1&b=2", "a=1&a=2", "page=", "=nokey", "a%3D1", "&&a=1"]
FRAGS = ["", "top", "sec-1", "a#b", "?notquery"]


def gen_urls(n: int, seed: int = 42) -> list[str]:
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        s = rng.choice(SCHEMES)
        h = rng.choice(HOSTS)
        p = rng.choice(PATHS)
        q = rng.choice(QUERIES)
        f = rng.choice(FRAGS)
        url = ""
        if s:
            url += s + ":"
        if h or rng.random() < 0.3:
            url += "//" + h
        url += p
        if q:
            url += "?" + q
        if f:
            url += "#" + f
        out.append(url)
    # hand-picked regressions
    out += [
        "http://a/x?q=1#frag#frag2",
        "//network/path",
        "relative/seg",
        "/rooted/seg",
        "http:opaque-no-slashes",
        "HTTPS://UPPER.example/PATH?Q=V#F",
        "http://h\t.co/\nm",
        "?leading-query",
        "#only-frag",
        "",
    ]
    return out


def test_url_split_matches_urlparse(spark):
    urls = gen_urls(400)
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = df.select(
        "url",
        U.scheme(F.col("url")).alias("s"),
        U.netloc(F.col("url")).alias("n"),
        U.path(F.col("url")).alias("p"),
        U.query(F.col("url")).alias("q"),
        U.fragment(F.col("url")).alias("f"),
    ).collect()
    assert len(got) == len(urls)
    mismatches = []
    for row in got:
        exp = urllib.parse.urlparse(row["url"])
        want = (exp.scheme, exp.netloc, exp.path, exp.query, exp.fragment)
        have = (row["s"], row["n"], row["p"], row["q"], row["f"])
        if want != have:
            mismatches.append((row["url"], want, have))
    assert not mismatches, mismatches[:10]


def test_resolve_relative_matches_urljoin_dot_segments(spark):
    """resolve_relative vs the reference's exact resolution
    (unquote(urljoin(origin, path.strip())), base.py:611-616) over a
    fuzzed corpus of dot-segment-bearing relative paths — the RFC-3986
    remove_dot_segments fold must agree with CPython segment-for-segment."""
    rng = random.Random(7)
    segs = ["a", "b", "c.d", ".", "..", "", "caf%C3%A9", "x%20y", "%2E%2E"]
    cases = []
    for _ in range(400):
        n = rng.randint(1, 6)
        path = "/" + "/".join(rng.choice(segs) for _ in range(n))
        if rng.random() < 0.3:
            path += "/"
        if rng.random() < 0.25:
            path += "?q=1&r=." 
        if rng.random() < 0.15:
            path += "#frag"
        cases.append(path)
    cases += ["/..", "/.", "/./", "/../../x", "/a/b/..", "/a/./b/../c",
              "/a//b/./", "/a/%2E%2E/b", "/a/b/c/../../d?q=1#f", "/ /..",
              # empty-netloc network-path refs: CPython keeps base netloc
              # AND runs the segment loop on the path
              "///../a", "///a/./b", "//", "///..", "/.///b",
              # urlparse strips tab/CR/LF before splitting (bpo-43882)
              "/a/.\t./b", "/a/\t../b", "/a\n/../b", "/x/.\r./y/z",
              # str.strip() removes ALL whitespace; urlunparse drops
              # the '?'/'#' of empty query/fragment components
              "/a\x0c", "/a\x0b", "/a\xa0", "/a#", "/a?", "/a?#",
              "/a?#f", "/a??", "/a##", "//h?#", "/..#", "/a/..#",
              "/a#?", "/a?q#",
              # deep '..' chains within the pass budget
              "/a/b/c/d/e/../../../../f", "/../../../../x"]
    origin = "http://x.test"
    want = {c: urllib.parse.unquote(urllib.parse.urljoin(origin, c.strip())) for c in cases}
    df = spark.createDataFrame([(c,) for c in cases], "u string")
    got = {
        r["u"]: r["resolved"]
        for r in df.select(
            "u", U.resolve_relative(F.col("u"), F.lit(origin)).alias("resolved")
        ).collect()
    }
    for c in cases:
        assert got[c] == want[c], (c, got[c], want[c])


def test_canonicalize_full_matches_python_reference(spark):
    """The LIVE canonicalizer (admission's canonicalize='full' mode)
    vs an independent Python restatement of its documented rules:
    first-# fragment cut, lowercase scheme+netloc, one trailing slash
    stripped from non-root paths, tracking params dropped order- and
    duplicate-preserving, ';params' dropped for uses_params schemes
    (urlparse path semantics). Fuzzed over the adversarial corpus plus
    targeted tracking/edge cases."""
    import re

    from kryptone_spark.config import DEFAULT_TRACKING_PARAMS

    urls = gen_urls(400, seed=7) + [
        "http://EX.com/a/?utm_source=x&b=2#f",
        "http://ex.com/?gclid=1",
        "http://ex.com/p?a=1&utm_medium=m&a=2",
        "http://ex.com",
        "http://ex.com/",
        "//host/p/?utm_term=1",
        "http://ex.com/p;params?utm_source=s&keep=1",
        "http://ex.com/p?utm_source=1&utm_source=2",
        "http://ex.com/p?&&a=1&fbclid=z",
        "http://EX.com:80/p",
        "https://ex.com:443/",
        "http://ex.com:8080/p",
        "https://ex.com:80/p",
        "http://ex.com:8080/p?utm_source=x",
    ]
    tracked = set(DEFAULT_TRACKING_PARAMS)

    def ref(u):
        base = u.split("#", 1)[0]
        p = urllib.parse.urlparse(base)
        path = p.path if p.path == "/" else re.sub("/$", "", p.path)
        q = p.query
        if q != "":
            q = "&".join(
                kv for kv in q.split("&") if kv.split("=", 1)[0] not in tracked
            )
        netloc = p.netloc.lower()
        # RFC 3986 §6.2.3 default-port elision, scheme-conditional
        if p.scheme == "http" and netloc.endswith(":80"):
            netloc = netloc[:-3]
        elif p.scheme == "https" and netloc.endswith(":443"):
            netloc = netloc[:-4]
        out = (p.scheme + "://" if p.scheme else "") + netloc + path
        if q:
            out += "?" + q
        return out

    df = spark.createDataFrame([(u,) for u in dict.fromkeys(urls)], "url string")
    got = {
        r["url"]: r["c"]
        for r in df.select(
            "url",
            U.canonicalize_full(F.col("url"), DEFAULT_TRACKING_PARAMS).alias("c"),
        ).collect()
    }
    bad = {u: (g, ref(u)) for u, g in got.items() if g != ref(u)}
    assert not bad, dict(list(bad.items())[:5])
