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

Scope (documented subset): record boundaries are trusted from the
``WARC/1.0\\r\\n`` framing, so a *binary* body that embeds the magic
would split early — the strict scale path (offset-seeking reader
honouring Content-Length over the raw byte stream, as warcio does)
needs a binary-stream source, which text-payload archives (the
training-data case: response text, robots bodies) don't require.
``parse_warc`` is exposed separately so pre-split record strings from
any source (Kafka, binaryFiles + splitter) reuse the same projection.
"""

from __future__ import annotations

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
    # first-wins header map: duplicate names are spec-legal, so a
    # plain str_to_map raises DUPLICATE_MAP_KEY on real archives
    hkey = lambda l: F.substring_index(l, ": ", 1)
    hval = lambda l: F.substring(l, F.length(hkey(l)) + 3, F.length(l))
    m = F.aggregate(
        F.filter(F.split(headers, "\r\n"), lambda l: l.contains(": ")),
        F.expr("cast(map() as map<string,string>)"),
        lambda acc, l: F.when(F.map_contains_key(acc, hkey(l)), acc).otherwise(
            F.map_concat(acc, F.create_map(hkey(l), hval(l)))
        ),
    )
    return df.select(
        F.element_at(m, "WARC-Type").alias("warc_type"),
        F.element_at(m, "WARC-Target-URI").alias("target_uri"),
        F.element_at(m, "WARC-Date").alias("warc_date"),
        F.element_at(m, "Content-Length").try_cast("long").alias("content_length"),
        body.alias("body"),
    )


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
