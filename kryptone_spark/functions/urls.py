"""URL algebra as native Spark columns.

Reproduces the observable behaviour of the reference's ``URL`` value
object (/root/reference/kryptone/utils/urls.py:41-311) with zero
per-row Python: one RFC-3986 regex split (faithful to
``urllib.parse.urlparse`` on the shapes the crawler meets), predicate
columns, and the relative-URL resolution + percent-decoding that
``SiteCrawler.urljoin`` performs (/root/reference/kryptone/base.py:611-616).

Everything is a Column-in → Column-out function so Catalyst can fold
constants, push filters into scans, and keep the whole admission
pipeline inside one WholeStageCodegen span.
"""

from __future__ import annotations

import functools as _functools

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# RFC-3986 appendix-B split, restricted the way urlparse restricts it:
# a scheme must match [a-zA-Z][a-zA-Z0-9+.-]* and is lowercased; the
# netloc exists only when '//' immediately follows the scheme; the
# fragment is everything after the FIRST '#'. (?s) lets '.*' cross the
# newlines that appear in the reference's invalid-URL corpus.
_URL_RE = r"(?s)^(?:([a-zA-Z][a-zA-Z0-9+.\-]*):)?(//[^/?#]*)?([^?#]*)(?:\?([^#]*))?(?:#(.*))?$"


def _part(url: Column, group: int) -> Column:
    # urllib strips ASCII tab/newline anywhere in the url before
    # splitting (WHATWG rule adopted in CPython, bpo-43882); the raw
    # string (URL identity) keeps them — only parsing ignores them.
    cleaned = F.translate(url, "\t\r\n", "")
    return F.regexp_extract(cleaned, _URL_RE, group)


def scheme(url: Column) -> Column:
    """urlparse lowercases the scheme (urllib behaviour)."""
    return F.lower(_part(url, 1))


def netloc(url: Column) -> Column:
    """Full authority component, case/userinfo/port preserved —
    ``is_same_domain`` compares raw netlocs (urls.py:355-373)."""
    return F.regexp_replace(_part(url, 2), "^//", "")


def host(url: Column) -> Column:
    """Lowercased hostname without userinfo/port (engine-side, used for
    domain bucketing; the reference never separates host from netloc)."""
    n = netloc(url)
    n = F.substring_index(n, "@", -1)
    # strip :port but not IPv6 brackets' colons
    return F.lower(
        F.when(n.startswith("["), F.regexp_extract(n, r"^(\[[^\]]*\])", 1))
        .otherwise(F.substring_index(n, ":", 1))
    )


# CPython urllib.parse.uses_params — urlparse only splits ';params'
# off the path for these schemes (note '' IS in the list)
_USES_PARAMS = (
    "", "ftp", "hdl", "prospero", "http", "imap", "https", "shttp",
    "rtsp", "rtspu", "sip", "sips", "mms", "sftp", "tel",
)


def path(url: Column) -> Column:
    """The reference parses with ``urlparse`` (urls.py:94), whose path
    EXCLUDES the ';params' suffix of the last segment (CPython
    ``_splitparams``: first ';' at-or-after the last '/') — but only
    for schemes in ``uses_params``. ``;[^/]*$`` is exactly that split."""
    raw = _part(url, 3)
    return F.when(
        scheme(url).isin(*_USES_PARAMS),
        F.regexp_replace(raw, ";[^/]*$", ""),
    ).otherwise(raw)


def params(url: Column) -> Column:
    """urlparse's 6-tuple ``params`` component (last-segment ';...')."""
    return F.when(
        scheme(url).isin(*_USES_PARAMS),
        F.regexp_extract(_part(url, 3), ";([^/]*)$", 1),
    ).otherwise(F.lit(""))


def query(url: Column) -> Column:
    return _part(url, 4)


def fragment(url: Column) -> Column:
    return _part(url, 5)


def has_fragment(url: Column) -> Column:
    """urls.py:206-215 — fragment non-empty OR trailing '#'; both cases
    collapse to 'contains #' because everything after the first '#' IS
    the fragment."""
    return url.contains("#")


def is_empty(url: Column) -> Column:
    """urls.py:175-178 (None handled upstream as empty string)."""
    return url.isNull() | (url == F.lit(""))


def is_relative_path(url: Column) -> Column:
    """urls.py:179-183 — raw string starts with '/'."""
    return url.startswith("/")


def is_secured(url: Column) -> Column:
    return scheme(url) == F.lit("https")


def has_query(url: Column) -> Column:
    return query(url) != F.lit("")


def has_path(url: Column) -> Column:
    return path(url) != F.lit("")


def url_decode_form(url: Column) -> Column:
    """``unquote_plus`` equivalent: %XX decode AND '+' → space.
    Malformed escapes leave the input unchanged (urllib behaviour),
    hence the try/coalesce."""
    return F.coalesce(F.try_url_decode(url), url)


def url_unquote(url: Column) -> Column:
    """``urllib.parse.unquote`` equivalent: %XX decode, '+' preserved.
    Protect literal '+' before form-decoding, restore after."""
    protected = F.regexp_replace(url, r"\+", "%2B")
    return F.coalesce(F.try_url_decode(protected), url)


def pathlib_suffix(p: Column) -> Column:
    """``pathlib.Path(p).suffix``: extension (with dot) of the last
    path component; '' for dotless, leading-dot-only, or trailing-dot
    names. Case preserved — the reference compares it case-sensitively
    against a lowercase list (urls.py:242-246)."""
    name = F.substring_index(p, "/", -1)
    return F.regexp_extract(name, r"(?<=.)(\.[^./]+)$", 1)


def is_image(url: Column, image_extensions: tuple[str, ...]) -> Column:
    """urls.py:241-246: suffix of ``as_path`` ∈ PIL extension list,
    where as_path = unquote_plus(path) when a query is present else
    unquote_plus(raw_url) (urls.py:262-274)."""
    base = F.when(has_query(url), path(url)).otherwise(url)
    suffix = pathlib_suffix(url_decode_form(base))
    return suffix.isin(*image_extensions) if image_extensions else F.lit(False)


def is_file(url: Column, file_extensions: tuple[str, ...] | None = None) -> Column:
    """urls.py:248-259 — same suffix logic vs the file-extension list;
    None loads the reference's bundled default list (2447 entries —
    Catalyst rewrites the isin to an InSet hash probe, O(1)/row)."""
    if file_extensions is None:
        from kryptone_spark.config import load_default_file_extensions

        file_extensions = load_default_file_extensions()
    base = F.when(has_query(url), path(url)).otherwise(url)
    suffix = pathlib_suffix(url_decode_form(base))
    return suffix.isin(*file_extensions) if file_extensions else F.lit(False)


_SOCIAL_HOSTS = (
    "facebook.com", "twitter.com", "tiktok.com", "snapchat.com",
    "youtube.com", "pinterest.com", "spotify.com",
)


def is_social_link(url: Column) -> Column:
    """urls.py:156-169 — substring containment on the whole url."""
    out = F.lit(False)
    for h in _SOCIAL_HOSTS:
        out = out | url.contains(h)
    return ~is_empty(url) & out


def origin_of(url: Column) -> Column:
    """``get_origin`` (base.py:341-352): scheme://netloc with empty
    path/query/fragment via urlunparse."""
    return F.concat(scheme(url), F.lit("://"), netloc(url))


def remove_dot_segments(p: Column) -> Column:
    """Dot-segment normalization for absolute paths ('/…') — the
    normalization ``urljoin`` applies when the reference resolves
    relative links (base.py:611-616). Mirrors CPython's urljoin
    segment loop EXACTLY, which differs from pure RFC 3986: '..' pops
    whatever is on the stack — including the leading root segment and
    empty segments — and underflow is silently ignored ('/../..//b' →
    '/b', where strict RFC yields '//b'). '.' is skipped; a trailing
    '.'/'..' keeps the directory slash; an emptied stack re-joins to
    '/'. '%2E' stays opaque (normalization runs before any
    percent-decoding, as urljoin does).
    """
    # Implemented as a direct transcription of CPython's segment loop
    # into an array-aggregate stack fold. The higher-order function
    # splits the admission projection's WholeStageCodegen span in two
    # (documented trade in test_plans) — measured this is FASTER than
    # every regex-chain alternative tried (a 5-rule × 16-pass chain
    # blew Janino compile to ~80 s and a 1-pattern × 16-pass chain
    # still ran 6× slower end-to-end): the fold is one pass over the
    # split segments, and the _normalize_ref guard keeps it off
    # dot-free rows entirely.
    segs = F.split(p, "/")  # leading '' is a poppable segment (CPython)
    folded = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, s: (
            F.when(s == ".", acc)
            .when(
                s == "..",
                F.when(
                    F.size(acc) > 0, F.slice(acc, 1, F.size(acc) - 1)
                ).otherwise(acc),
            )
            .otherwise(F.concat(acc, F.array(s)))
        ),
    )
    last = F.element_at(segs, -1)
    folded = F.when(
        last.isin(".", ".."), F.concat(folded, F.array(F.lit("")))
    ).otherwise(folded)
    joined = F.concat_ws("/", folded)
    # urlunparse re-roots the path when a netloc is present ('/../a'
    # pops the root, folds to 'a', and comes back as '/a'); an emptied
    # stack ('' here) re-roots to '/' the same way
    return F.when(joined.startswith("/"), joined).otherwise(
        F.concat(F.lit("/"), joined)
    )


def _normalize_ref(s: Column) -> Column:
    """Dot-segment normalization of a path(+query/fragment) reference.
    Two-level guard: a cheap substring scan ('/.' anywhere) keeps the
    dot-free common case out of the regexes entirely — codegen CASE
    evaluates the expensive branch only for rows that pass."""
    path_part = F.regexp_extract(s, r"^([^?#]*)", 1)
    rest = F.regexp_replace(s, r"^[^?#]*", "")
    return F.when(~s.contains("/."), s).otherwise(
        F.when(
            path_part.rlike(r"/\.\.?(/|$)"),
            F.concat(remove_dot_segments(path_part), rest),
        ).otherwise(s)
    )


def resolve_relative(url: Column, origin: Column) -> Column:
    """``SiteCrawler.urljoin`` (base.py:611-616): strip(), join against
    the origin with CPython's dot-segment removal on the path part,
    then ``unquote`` the WHOLE result. Only applied when the raw string
    starts with '/' (check_urls, base.py:681-683)."""
    # The reference strips the raw string first (str.strip() — ALL
    # whitespace incl. \x0b/\x0c/unicode, hence (?U)\s, not trim());
    # urlparse then strips ASCII tab/CR/LF anywhere before splitting
    # (bpo-43882); and urlunparse drops an empty query's '?' and an
    # empty fragment's '#' on the way back out. urljoin's output — and
    # therefore the reference's resolved URL — reflects all three.
    t = F.regexp_replace(url, r"(?U)^\s+|\s+$", "")
    t = F.translate(t, "\t\r\n", "")
    t = F.regexp_replace(t, r"^([^#]*)#$", "$1")
    t = F.regexp_replace(t, r"^([^?#]*)\?(?=#|$)", "$1")
    # branch routing MUST use the raw string: normalization can produce
    # a '//'-leading path ('/.///b' → '///b') that is still an
    # absolute-PATH reference, not a network-path reference.
    # '//netloc/...' network-path references keep the base scheme and,
    # per CPython, skip dot-segment processing entirely (urljoin
    # returns urlunparse directly when the ref has a netloc); an EMPTY
    # netloc ('//', '///a') keeps the base netloc and DOES normalize
    # (it falls through to the segment loop).
    new_netloc = F.regexp_extract(t, r"^//([^/?#]*)", 1)
    after_netloc = F.regexp_replace(t, r"^//[^/?#]*", "")
    t_ref = _normalize_ref(t)
    an_ref = _normalize_ref(after_netloc)
    joined = (
        F.when(~t.startswith("//"), F.concat(origin, t_ref))
        .when(new_netloc != "", F.concat(scheme(origin), F.lit(":"), t))
        .otherwise(F.concat(origin, an_ref))
    )
    return F.when(is_relative_path(url), url_unquote(joined)).otherwise(url)


def decompose_path(url: Column) -> Column:
    """urls.py:455-472 — path split on '/', empties dropped."""
    return F.filter(F.split(path(url), "/"), lambda x: x != F.lit(""))


def query_map(url: Column) -> Column:
    """``parse_qs``-lite: query → map<string,string>, last value wins
    (the reference's dict-of-lists collapses the same way when rebuilt,
    urls.py:307-311, 333-358), empty keys dropped, no query → NULL.

    Native HOFs only: ``str_to_map``/``map_from_entries`` raise under
    Spark's default EXCEPTION dup-key policy, so duplicates are removed
    first — keep entry i iff no later entry shares its key (arrays are
    a handful of params, the O(n²) scan folds into codegen)."""
    q = query(url)
    entries = F.filter(
        F.transform(
            F.split(q, "&"),
            lambda s: F.struct(
                F.regexp_extract(s, "^([^=]*)", 1).alias("key"),
                F.regexp_replace(s, "^[^=]*=?", "").alias("value"),
            ),
        ),
        lambda e: e["key"] != F.lit(""),
    )
    last_wins = F.filter(
        entries,
        lambda e, i: ~F.exists(
            F.slice(entries, i + F.lit(2), F.size(entries)),
            lambda e2: e2["key"] == e["key"],
        ),
    )
    return F.when(q != "", F.map_from_entries(last_wins))


def strip_fragment(url: Column) -> Column:
    """urls.py:474-492 ``remove_fragment`` — the reference rebuilds
    without fragment AND query; full-canonicalize mode keeps the query
    (north rule) so we only cut at '#'."""
    return F.substring_index(url, "#", 1)


def registrable_domain(h: Column) -> Column:
    """PSL-lite heuristic: last two labels, or last three when the
    2nd-level label is a common ccTLD second level. The reference only
    ever compares full netlocs (base.py:694-696); this exists for
    salted domain bucketing at scale. Codegen-friendly (pure Column
    algebra) but mis-buckets multi-label suffixes the heuristic table
    misses (*.nsw.au, *.or.jp, github.io, …) — use
    ``registrable_domain_psl`` where exact grouping matters (politeness
    fairness for those TLDs); this stays the default for plans that
    must remain whole-stage-codegen."""
    parts = F.split(h, r"\.")
    n = F.size(parts)
    second = F.element_at(parts, -2)
    common_sl = F.lit(["co", "com", "net", "org", "gov", "ac", "edu"])
    take3 = (n >= 3) & F.array_contains(common_sl, second)
    return F.when(
        take3,
        F.concat_ws(".", F.element_at(parts, -3), second, F.element_at(parts, -1)),
    ).otherwise(
        F.when(n >= 2, F.concat_ws(".", second, F.element_at(parts, -1))).otherwise(h)
    )


@_functools.lru_cache(maxsize=1)
def load_public_suffix_rules() -> tuple[frozenset, frozenset, frozenset]:
    """Vendored public-suffix snapshot (publicsuffix.org, MPL-2.0 —
    the same public list Debian ships at /usr/share/publicsuffix and
    the JDK embeds) parsed into (exact, wildcard_bases, exceptions):
    ``*.kawasaki.jp`` lands its base ``kawasaki.jp`` in wildcard_bases,
    ``!city.kawasaki.jp`` lands in exceptions. ~9.5k rules, ~200 KB —
    ships to executors once inside the UDF closure."""
    import pathlib

    p = pathlib.Path(__file__).parent.parent / "data" / "public_suffix_list.dat"
    exact, wild, exc = set(), set(), set()
    for line in p.read_text(encoding="utf-8").splitlines():
        line = line.strip()
        if not line or line.startswith("//"):
            continue
        if line.startswith("!"):
            exc.add(line[1:])
        elif line.startswith("*."):
            wild.add(line[2:])
        else:
            exact.add(line)
    return frozenset(exact), frozenset(wild), frozenset(exc)


def registrable_domain_psl(h: Column) -> Column:
    """Exact registrable domain per the Public Suffix List algorithm
    (publicsuffix.org/list): longest matching rule wins, ``*`` matches
    one label, exception rules prevail and shed their leftmost label;
    unlisted TLDs take the implicit ``*`` rule (suffix = last label —
    identical to the heuristic's last-two answer, so .com/.test
    bucketing is unchanged). A host that IS a public suffix comes back
    unchanged (same contract as the heuristic's single-label case).
    Arrow-batched pandas UDF over the vendored snapshot — hash-set
    lookups against at most 6 candidate suffixes per host, no per-row
    Python UDF."""
    from pyspark.sql import types as T

    exact, wild, exc = load_public_suffix_rules()

    @F.pandas_udf(T.StringType())
    def _reg(hosts: pd.Series) -> pd.Series:
        def one(host):
            if host is None:
                return None
            # PSL normalization step: a fully-qualified trailing dot is
            # stripped before matching — 'example.com.' must share a
            # politeness/seen bucket with 'example.com' (an empty last
            # label would otherwise match no rule and return 'com.').
            host = host[:-1] if host.endswith(".") else host
            if not host:
                return None
            labels = host.split(".")
            low = host.lower().split(".")
            n = len(labels)
            ps = 1
            hit = False
            for k in range(min(6, n), 1, -1):  # exception rules prevail
                if ".".join(low[n - k :]) in exc:
                    ps, hit = k - 1, True
                    break
            if not hit:
                for k in range(min(5, n), 0, -1):  # longest rule wins
                    if ".".join(low[n - k :]) in exact or (
                        k >= 2 and ".".join(low[n - k + 1 :]) in wild
                    ):
                        ps = k
                        break
            if n <= ps:  # the host is itself a (or shorter than a) suffix
                return host
            return ".".join(labels[n - ps - 1 :])

        return hosts.map(one)

    return _reg(h)


def idna_host(h: Column) -> Column:
    """Fold an internationalized hostname to its DNS wire form
    (IDNA/punycode, lowercase) so ``münchen.de`` and
    ``xn--mnchen-3ya.de`` share one politeness bucket, one robots
    fetch, and one seen-set identity — engine-only (the reference
    compares raw urlparse netlocs). ASCII hosts (the overwhelming
    majority of crawl traffic) stay on the codegen fast path — the
    Arrow-batched codec UDF only decides the non-ASCII branch. A host
    the codec rejects (empty/overlong label) falls back to plain
    lowercase rather than failing the stage (ANSI posture: the
    engine's 'caught' is the unnormalized value, never an error)."""
    from pyspark.sql import types as T

    @F.pandas_udf(T.StringType())
    def _fold(hosts: pd.Series) -> pd.Series:
        def one(host):
            if host is None:
                return None
            try:
                return host.encode("idna").decode("ascii")
            except (UnicodeError, ValueError):
                return host.lower()

        return hosts.map(one)

    return F.when(h.rlike("^[\\x00-\\x7F]*$"), F.lower(h)).otherwise(_fold(h))


def domain_bucket(domain: Column, n_buckets: int) -> Column:
    """W4 salted-hash partitioning: stable bucket for frontier/seen
    partition pruning and co-located anti-joins."""
    return F.pmod(F.xxhash64(domain), F.lit(n_buckets)).cast("int")


def canonicalize_full(url: Column, tracking_params: tuple[str, ...]) -> Column:
    """North-rule canonicalizer: lowercase scheme+host, strip fragment,
    elide the scheme-default port (RFC 3986 §6.2.3 — ':80' under http,
    ':443' under https; any other port is identity-preserved), strip
    tracking params, normalize trailing slash on non-root paths.
    Parity mode (the default) bypasses this — the reference rejects
    fragment URLs instead of stripping them (SURVEY.md §2.2 note)."""
    base = strip_fragment(url)
    sch, nl, p, q = scheme(base), netloc(base), path(base), query(base)
    host_lc = F.lower(nl)
    host_lc = (
        F.when(sch == "http", F.regexp_replace(host_lc, ":80$", ""))
        .when(sch == "https", F.regexp_replace(host_lc, ":443$", ""))
        .otherwise(host_lc)
    )
    p_norm = F.when(p == "/", p).otherwise(F.regexp_replace(p, "/$", ""))
    tracked = F.lit(list(tracking_params))
    q_kept = F.when(
        q != "",
        F.array_join(
            F.filter(
                F.split(q, "&"),
                lambda kv: ~F.array_contains(tracked, F.substring_index(kv, "=", 1)),
            ),
            "&",
        ),
    ).otherwise(F.lit(""))
    rebuilt = F.concat(
        F.when(sch != "", F.concat(sch, F.lit("://"))).otherwise(F.lit("")),
        host_lc,
        p_norm,
        F.when(q_kept != "", F.concat(F.lit("?"), q_kept)).otherwise(F.lit("")),
    )
    return rebuilt
