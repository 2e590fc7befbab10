from kryptone_spark.functions import dates, text, urls  # noqa: F401
