"""Pure-Python oracle of the reference crawl loop.

A clean-room reimplementation (no reference code copied) of the
observable semantics of ``check_urls``/``run_url_filters``/the crawl
loop (/root/reference/kryptone/base.py:652-774, 1053-1211) under the
deterministic ordering contract of SURVEY.md §3.4: waves = BFS depths,
intra-wave order = lexicographic (the reference's own canonical order,
base.py:577-587, since its ``set.pop`` is arbitrary).

The Spark engine must match this oracle exactly on crawl order, seen
set, visited set, and extracted span sequences.
"""

from __future__ import annotations

import pathlib
import re
from dataclasses import dataclass, field
from urllib.parse import unquote, unquote_plus, urljoin, urlparse

from kryptone_spark.config import CrawlConfig


def safe_parse(url: str):
    """URL.__init__ catches ValueError (invalid bracketed IPv6 hosts on
    py3.11+) and keeps an empty parse (urls.py:89-96)."""
    try:
        return urlparse(url)
    except ValueError:
        return urlparse("")


def _origin(url: str) -> str:
    p = safe_parse(url)
    return f"{p.scheme}://{p.netloc}"


def _is_image(url: str, exts: tuple[str, ...]) -> bool:
    # urls.py:241-246, 262-274: suffix of unquote_plus(path-or-raw)
    p = safe_parse(url)
    base = p.path if p.query != "" else url
    return pathlib.PurePosixPath(unquote_plus(base)).suffix in exts


@dataclass
class OracleState:
    seen: set[str] = field(default_factory=set)
    visited: set[str] = field(default_factory=set)
    frontier: set[str] = field(default_factory=set)
    pages_processed: int = 0
    crawl_order: list[tuple[int, int, str]] = field(default_factory=list)
    seen_verdicts: dict[str, str] = field(default_factory=dict)
    reject_reasons: dict[str, str] = field(default_factory=dict)
    failed_attempts: list[tuple[int, int, str]] = field(default_factory=list)


def check_urls(
    urls: list[str],
    config: CrawlConfig,
    state: OracleState,
    refresh: bool = False,
) -> set[str]:
    """Faithful ``check_urls`` (base.py:652-760): returns the valid set
    and updates the seen set with valid ∪ invalid (P12)."""
    start = config.start_url
    start_p = safe_parse(start) if start else None
    raw = set(urls)

    # P1 gather-ignore: pre-resolution, pre-seen (base.py:661-670)
    if config.gather_ignore_tests:
        raw = {
            u for u in raw
            if not any(re.search(rx, safe_parse(u).path) for rx in config.gather_ignore_tests)
        }

    valid: set[str] = set()
    invalid: set[str] = set()
    for u in raw:
        # P2 urljoin + unquote (base.py:681-683, 611-616)
        if u.startswith("/"):
            u = unquote(urljoin(_origin(start), str(u).strip()))
        p = safe_parse(u)

        def reject(reason: str) -> None:
            invalid.add(u)
            state.reject_reasons.setdefault(u, reason)

        if refresh and u in state.seen:               # P3
            reject("refresh_seen")
            continue
        if start_p is None or p.netloc != start_p.netloc:  # P4
            reject("domain")
            continue
        if u == "":                                    # P5
            reject("empty")
            continue
        if p.fragment != "" or u.endswith("#"):        # P6
            reject("fragment")
            continue
        if p.path == "/" and start_p.path == "/" and state.pages_processed > 0:  # P7
            reject("home")
            continue
        if config.ignore_images and _is_image(u, config.image_extensions):  # P8
            reject("image")
            continue
        if u in state.visited:                         # P9
            reject("visited")
            continue
        if u in state.seen:                            # P10
            reject("seen")
            continue
        if config.rule_tests and not all(              # P11
            re.search(rx, p.path) for rx in config.rule_tests
        ):
            reject("rule")
            continue
        valid.add(u)

    for u in valid:                                    # P12
        state.seen.add(u)
        state.seen_verdicts.setdefault(u, "valid")
    for u in invalid:
        state.seen.add(u)
        state.seen_verdicts.setdefault(u, "rejected")
    return valid


def run_url_filters(urls: set[str], config: CrawlConfig) -> set[str]:
    """P13 (base.py:618-650 + urls.py:509-581): drop on any hit."""
    kept = set()
    for u in urls:
        path = safe_parse(u).path
        hit = any(s in path for s in config.ignore_path_substrings) or any(
            re.search(rx, u) for rx in config.ignore_url_regexes
        )
        if not hit:
            kept.add(u)
    return kept


def schedule(frontier: set[str], config: CrawlConfig) -> list[str]:
    """W1 politeness: per-domain lexicographic rank ≤ budget."""
    by_domain: dict[str, list[str]] = {}
    for u in sorted(frontier):
        by_domain.setdefault(safe_parse(u).netloc, []).append(u)
    batch: list[str] = []
    for dom in by_domain:
        batch.extend(by_domain[dom][: config.max_per_domain_per_wave])
    return sorted(batch)


def crawl(
    docs: list[dict],
    config: CrawlConfig,
    failures: dict[str, int] | None = None,
) -> OracleState:
    """Wave-structured BFS with lexicographic intra-wave order.

    ``failures`` maps url -> n_failures (the first n attempts at the
    URL fail: not visited, no links, the politeness slot is consumed —
    reference base.py:1096-1101 drops a failed fetch with `continue`).
    A failed URL retries once per wave until its failure count exceeds
    ``config.max_retries``, then retires (max_retries=0 = reference
    parity: one strike and it's gone)."""
    pages = {r["doc_id"]: r["spans"] for r in docs}
    fail_n = failures or {}
    attempts: dict[str, int] = {}
    state = OracleState()

    seeds = check_urls(list(dict.fromkeys(config.start_urls)), config, state)
    state.frontier = run_url_filters(seeds, config)

    wave = 0
    while state.frontier and wave < config.max_waves:
        batch = schedule(state.frontier, config)
        if not batch:
            break
        for rank, url in enumerate(batch):
            if attempts.get(url, 0) < fail_n.get(url, 0):
                attempts[url] = attempts.get(url, 0) + 1
                state.failed_attempts.append((wave, attempts[url], url))
                if attempts[url] > config.max_retries:
                    state.frontier.discard(url)  # retired
                continue
            state.frontier.discard(url)
            state.visited.add(url)
            state.crawl_order.append((wave, rank, url))
            links = [
                s["media_ref"]
                for s in pages.get(url, [])
                if s["kind"] == "link"
            ]
            valid = check_urls(links, config, state)
            state.frontier |= run_url_filters(valid, config)
            state.pages_processed += 1
        wave += 1
    return state
