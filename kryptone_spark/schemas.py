"""Fixed explicit schemas for every engine table (FIXTURES.md §1-3).

The reference is schemaless (Python sets + JSON blobs,
/root/reference/kryptone/base.py:292-295, 562-575); the engine pins
StructTypes so scans prune columns and checkpoints are stable.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Interleaved text+media documents — the BASELINE.json input_hint shape.
SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),      # text|link|image|email
        T.StructField("text", T.StringType(), True),       # content / anchor / alt
        T.StructField("media_ref", T.StringType(), True),  # href / src / ''
        T.StructField("offset", T.IntegerType(), False),   # document order
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),  # canonical page URL
        T.StructField("spans", T.ArrayType(SPAN), False),
    ]
)

FRONTIER = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("domain", T.StringType(), True),
        T.StructField("domain_bucket", T.IntegerType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("discovered_wave", T.IntegerType(), False),
        T.StructField("priority", T.DoubleType(), False),
    ]
)

SEEN = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("domain_bucket", T.IntegerType(), False),
        T.StructField("first_wave", T.IntegerType(), False),
        T.StructField("verdict", T.StringType(), False),  # valid|rejected
    ]
)

VISITED = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("domain_bucket", T.IntegerType(), False),
        T.StructField("wave", T.IntegerType(), False),
    ]
)

FETCH_BATCHES = T.StructType(
    [
        T.StructField("wave", T.IntegerType(), False),
        T.StructField("domain", T.StringType(), True),
        T.StructField("url", T.StringType(), False),
        T.StructField("rank_in_domain", T.IntegerType(), False),
        T.StructField("fetch_at", T.TimestampType(), False),
    ]
)

EDGES = T.StructType(
    [
        T.StructField("src_url", T.StringType(), False),
        T.StructField("dst_url", T.StringType(), False),
        T.StructField("wave", T.IntegerType(), False),
    ]
)

LINEAGE = T.StructType(
    [
        T.StructField("wave_id", T.IntegerType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("urls_in", T.LongType(), False),
        T.StructField("urls_out", T.LongType(), False),
        T.StructField(
            "filter_cardinality", T.MapType(T.StringType(), T.LongType()), True
        ),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

ROBOTS = T.StructType(
    [
        T.StructField("domain", T.StringType(), False),
        T.StructField("disallow", T.ArrayType(T.StringType()), True),
        T.StructField("crawl_delay", T.DoubleType(), True),
    ]
)

SEEDS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("domain", T.StringType(), True),
    ]
)
