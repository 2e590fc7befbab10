"""kryptone_spark — a from-scratch PySpark-native crawl-frontier engine.

Re-expresses the query/data-processing capabilities of the reference
crawler (Zadigo/kryptone, surveyed in SURVEY.md) as idiomatic Spark:
DataFrame/SQL column pipelines, broadcast/anti joins, window-based
politeness scheduling, bloom/cuckoo-filtered URL-seen sets, and an
iterative wave runner with checkpointed lineage.

Everything here is DataFrame-first: per-row Python is banned from the
hot path; the only Python UDFs are Arrow-vectorized pandas UDFs in
explicitly-marked extension points.
"""

__version__ = "0.1.0"

from kryptone_spark.config import CrawlConfig  # noqa: F401
