"""WARC (ISO 28500) ingestion — the web-archive container every
large-scale crawl/training pipeline reads (Common Crawl's format).

The reference crawls live pages through Selenium and never touches an
archive format; a 100 TB training pipeline starts from WARC dumps, so
the engine ships a columnar reader:

- record framing via Spark's text reader with ``lineSep`` set to the
  record magic — splitting happens IN the scan (distributed,
  splittable at file granularity), never in Python;
- header parsing is pure projection: ``substring_index`` isolates the
  header block, a first-wins fold turns ``Name: value`` lines into a
  map (the spec allows REPEATED header names, e.g. several
  WARC-Concurrent-To lines — ``str_to_map`` would throw
  DUPLICATE_MAP_KEY under Spark's default dedup policy), typed fields
  project out with ``try_cast`` (ANSI-safe on dirty headers).

Two framing paths:

- ``read_warc`` (text): record boundaries are trusted from the
  ``WARC/1.0\\r\\n`` framing via the text scan's ``lineSep`` —
  fastest for text-payload archives (response text, robots bodies),
  but a *binary* body that embeds the magic would split early.
- ``read_warc_binary`` (strict): offset-seeking splitter honouring
  Content-Length over the raw byte stream (the warcio framing), fed
  by the binaryFile source — correct for arbitrary binary payloads
  (images, media — the interleaved-document case) and for
  per-record-gzip-member archives (Common Crawl ships .warc.gz as
  one gzip member per record; plain gzip codecs see only the first).
  Parallelism is per file — Common Crawl's ~1 GB segment layout —
  and each file's bytes are held once per task, so size
  ``spark.sql.files``/executor memory to the segment size.

``parse_warc`` is exposed separately so pre-split record strings from
any source (Kafka, a custom splitter) reuse the same projection; both
readers share the first-wins header-map fold.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAGIC = "WARC/1.0\r\n"


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """One row per WARC record in ``path`` (file, dir, or glob):
    (warc_type, target_uri, warc_date, content_length, body)."""
    raw = spark.read.option("lineSep", MAGIC).text(path)
    # the file starts with the magic, so element 0 of the split is
    # empty; trailing whitespace-only fragments are likewise framing
    recs = raw.where(F.trim(F.col("value")) != "")
    return parse_warc(recs, "value")


def _header_map(headers):
    """First-wins ``Name: value`` map over a header-block column:
    duplicate names are spec-legal (several WARC-Concurrent-To lines),
    so a plain str_to_map raises DUPLICATE_MAP_KEY on real archives."""
    hkey = lambda l: F.substring_index(l, ": ", 1)
    hval = lambda l: F.substring(l, F.length(hkey(l)) + 3, F.length(l))
    return F.aggregate(
        F.filter(F.split(headers, "\r\n"), lambda l: l.contains(": ")),
        F.expr("cast(map() as map<string,string>)"),
        lambda acc, l: F.when(F.map_contains_key(acc, hkey(l)), acc).otherwise(
            F.map_concat(acc, F.create_map(hkey(l), hval(l)))
        ),
    )


def parse_warc(df: DataFrame, col: str = "value") -> DataFrame:
    """Project WARC columns out of pre-split record strings (the text
    between two record magics): ``<headers>\\r\\n\\r\\n<body>\\r\\n\\r\\n``."""
    rec = F.col(col)
    headers = F.substring_index(rec, "\r\n\r\n", 1)
    # body = everything after the first blank line, minus the record's
    # trailing \r\n\r\n separator (kept intact if the separator was
    # already consumed by record framing)
    after = F.expr(
        f"substring({col}, length(substring_index({col}, '\\r\\n\\r\\n', 1)) + 5)"
    )
    # trailing CR/LF runs are framing (the record separator plus the
    # text writer's line terminator), not payload — a body's own
    # trailing newlines are not preserved (documented subset)
    body = F.regexp_replace(after, r"[\r\n]+$", "")
    m = _header_map(headers)
    return df.select(
        F.element_at(m, "WARC-Type").alias("warc_type"),
        F.element_at(m, "WARC-Target-URI").alias("target_uri"),
        F.element_at(m, "WARC-Date").alias("warc_date"),
        F.element_at(m, "Content-Length").try_cast("long").alias("content_length"),
        body.alias("body"),
    )


def _gunzip_members(blob: bytes) -> bytes:
    """Decompress a multi-member gzip stream (Common Crawl frames one
    gzip member PER RECORD so readers can seek; a plain one-shot gunzip
    stops after the first member and silently drops the archive tail).
    Not gzip at all ⇒ returned unchanged.

    Damage tolerance (a single bad archive must not fail the whole
    ``binaryFile`` scan): a corrupt member stops the walk and keeps
    every member that decompressed cleanly before it; a TRUNCATED final
    member (no zlib error, stream just ends) keeps its decodable prefix
    — ``_split_records`` then drops any half-record tail via its normal
    framing. Non-gzip trailer bytes after the last member (writer
    garbage, ranged-read slop) are deliberately dropped by the magic
    check: they cannot be member bytes of this archive."""
    if blob[:2] != b"\x1f\x8b":
        return blob
    parts = []
    data = blob
    while data[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        try:
            parts.append(d.decompress(data))
            parts.append(d.flush())
        except zlib.error:
            break  # corrupt member: keep the clean prefix
        if not d.eof:
            break  # truncated final member: prefix kept, nothing follows
        data = d.unused_data
    return b"".join(parts)


def _split_records(blob: bytes) -> Iterator[tuple[str, bytes]]:
    """Offset-seeking record walk (the warcio framing): read the header
    block up to the blank line, take the block length from
    Content-Length, SEEK past it — a body embedding ``WARC/1.0\\r\\n``
    never splits early because body bytes are skipped, not scanned.
    Yields (header_block_text, body_bytes). A record missing a parseable
    Content-Length (non-conformant) falls back to scanning for the next
    magic at a line start."""
    blob = _gunzip_members(blob)
    pos, n = 0, len(blob)
    while pos < n:
        while pos < n and blob[pos] in (0x0D, 0x0A):  # inter-record CRLFs
            pos += 1
        if pos >= n:
            break
        hdr_end = blob.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        headers = blob[pos:hdr_end]
        clen = None
        for line in headers.split(b"\r\n"):
            if line.lower().startswith(b"content-length:"):
                try:
                    clen = int(line.split(b":", 1)[1].strip())
                except ValueError:
                    clen = None
                break
        body_start = hdr_end + 4
        if clen is not None and body_start + clen <= n:
            body = blob[body_start : body_start + clen]
            pos = body_start + clen
        else:
            nxt = blob.find(b"\r\nWARC/", body_start)
            body = blob[body_start : nxt if nxt >= 0 else n].rstrip(b"\r\n")
            pos = nxt + 2 if nxt >= 0 else n
        yield headers.decode("utf-8", "replace"), body


def read_warc_binary(spark: SparkSession, path: str) -> DataFrame:
    """Strict-framing WARC reader: one row per record with the body as
    BYTES — (warc_type, target_uri, warc_date, content_length, body
    binary). Handles binary bodies that embed the record magic and
    multi-member .warc.gz (per-record gzip members). Splitting runs in
    an Arrow-batched mapInPandas over whole-file bytes from the
    binaryFile source; header typing reuses the same columnar
    projection as the text path."""
    files = spark.read.format("binaryFile").load(path).select("content")

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for blob in pdf["content"]:
                hs, bs = [], []
                for h, b in _split_records(bytes(blob)):
                    hs.append(h)
                    bs.append(b)
                yield pd.DataFrame({"headers": hs, "body": bs})

    recs = files.mapInPandas(_gen, "headers string, body binary")
    m = _header_map(F.col("headers"))
    return recs.select(
        F.element_at(m, "WARC-Type").alias("warc_type"),
        F.element_at(m, "WARC-Target-URI").alias("target_uri"),
        F.element_at(m, "WARC-Date").alias("warc_date"),
        F.element_at(m, "Content-Length").try_cast("long").alias("content_length"),
        F.col("body"),
    )


def write_warc_gz_fixture(records: list[tuple[str, bytes]], path: str,
                          date: str = "2024-01-01T00:00:00Z") -> None:
    """Fixture synthesizer (local, not a Spark sink — no real archives
    ship in this sandbox): write (url, body_bytes) records as a
    Common-Crawl-style .warc.gz, one gzip member per record, bodies
    framed by Content-Length so arbitrary bytes (including the record
    magic) are legal payload."""
    import gzip

    with open(path, "wb") as f:
        for url, body in records:
            rec = (
                f"WARC/1.0\r\nWARC-Type: response\r\n"
                f"WARC-Target-URI: {url}\r\nWARC-Date: {date}\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode() + body + b"\r\n\r\n"
            f.write(gzip.compress(rec))


def write_warc(docs: DataFrame, path: str, url_col: str = "url",
               text_col: str = "text", date: str = "2024-01-01T00:00:00Z") -> None:
    """Serialize (url, text) rows as WARC response records — the
    round-trip twin of ``read_warc`` (and the test/bench synthesizer:
    no real archives ship in this sandbox). One text part-file per
    partition; record order within a file follows partition order."""
    rec = F.concat(
        F.lit("WARC/1.0\r\n"),
        F.lit("WARC-Type: response\r\n"),
        F.lit("WARC-Target-URI: "), F.col(url_col), F.lit("\r\n"),
        F.lit(f"WARC-Date: {date}\r\n"),
        # UTF-8 BYTES per the spec (octet_length) — char count under-
        # reports any non-ASCII body and desyncs spec-honoring readers
        F.lit("Content-Length: "), F.octet_length(text_col).cast("string"), F.lit("\r\n"),
        F.lit("\r\n"),
        F.col(text_col), F.lit("\r\n"),
    )
    # each row ends '...\r\n' and the writer's lineSep appends the
    # second CRLF — the spec's two-CRLF record terminator, exactly
    docs.select(rec.alias("value")).write.mode("overwrite").option(
        "lineSep", "\r\n"
    ).text(path)
