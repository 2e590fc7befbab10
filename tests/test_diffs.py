"""crawl_diff: snapshot compare semantics (all four statuses, summary)."""

from kryptone_spark.operators.diffs import crawl_diff, diff_summary


def test_crawl_diff_statuses(spark):
    old = spark.createDataFrame(
        [("a", "1"), ("b", "2"), ("c", "3")], ["url", "fingerprint"]
    )
    new = spark.createDataFrame(
        [("b", "2"), ("c", "9"), ("d", "4")], ["url", "fingerprint"]
    )
    d = crawl_diff(old, new)
    got = {r["url"]: (r["status"], r["old_fp"], r["new_fp"]) for r in d.collect()}
    assert got == {
        "a": ("removed", "1", None),
        "b": ("unchanged", "2", "2"),
        "c": ("changed", "3", "9"),
        "d": ("added", None, "4"),
    }
    s = {r["status"]: r["n"] for r in diff_summary(d).collect()}
    assert s == {"removed": 1, "unchanged": 1, "changed": 1, "added": 1}


def test_crawl_diff_disjoint_and_identical(spark):
    a = spark.createDataFrame([("x", "7")], ["url", "fingerprint"])
    b = spark.createDataFrame([("y", "8")], ["url", "fingerprint"])
    got = {r["url"]: r["status"] for r in crawl_diff(a, b).collect()}
    assert got == {"x": "removed", "y": "added"}
    same = crawl_diff(a, a)
    assert [r["status"] for r in same.collect()] == ["unchanged"]
