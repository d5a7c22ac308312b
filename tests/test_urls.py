"""URL canonicalization Column builders (functions/urls.py): equivalence
folding, tracking-param removal, host/domain extraction, NULL/junk
tolerance, and the zero-UDF plan shape."""

import pytest
from pyspark.sql import functions as F

from edna_dbt_library_spark.functions.urls import (
    canonicalize_url,
    url_host,
    url_registered_domain,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r["c"] for r in df.select(canonicalize_url("url").alias("c")).collect()]


def test_equivalent_urls_fold_to_one_string(spark):
    variants = [
        "HTTP://Example.COM:80/Path/?b=2&a=1",
        "http://example.com/Path?a=1&b=2#frag",
        "http://example.com:80/Path/?b=2&a=1&utm_source=x",
        "http://user@example.com/Path?utm_campaign=y&a=1&b=2",
    ]
    got = set(_canon(spark, variants))
    assert got == {"http://example.com/Path?a=1&b=2"}


def test_canonicalize_cases(spark):
    cases = {
        # root path materializes; default https port strips
        "https://A.B.C:443": "https://a.b.c/",
        # non-default port survives
        "http://h:8080/x": "http://h:8080/x",
        # fragment-only query handling
        "http://h/x?#f": "http://h/x",
        # all-tracking query drops entirely
        "http://h/x?utm_source=a&fbclid=b": "http://h/x",
        # path case preserved; host case folded
        "http://HOST/CaseSensitive": "http://host/CaseSensitive",
        # no scheme -> trimmed passthrough
        "  example.com/x  ": "example.com/x",
        # junk passthrough (never throws under ANSI)
        "not a url at all": "not a url at all",
        # '?' INSIDE the fragment is not a query (r4 ADVICE: the old
        # pattern matched the first '?' anywhere and fabricated ?b=1)
        "http://h/x#a?b=1": "http://h/x",
        "http://h/x?real=1#a?fake=2": "http://h/x?real=1",
    }
    got = _canon(spark, list(cases))
    assert got == list(cases.values())


def test_null_propagates(spark):
    df = spark.createDataFrame([(None,)], "url string")
    assert df.select(canonicalize_url("url").alias("c")).collect()[0]["c"] is None


def test_host_and_registered_domain(spark):
    df = spark.createDataFrame(
        [
            ("https://a.b.example.co/x?q=1",),
            ("http://user:pw@sub.site.org:8080/p",),
            ("relative/path",),
        ],
        "url string",
    )
    rows = df.select(
        url_host("url").alias("h"), url_registered_domain("url").alias("d")
    ).collect()
    assert (rows[0]["h"], rows[0]["d"]) == ("a.b.example.co", "example.co")
    assert (rows[1]["h"], rows[1]["d"]) == ("sub.site.org", "site.org")
    assert rows[2]["h"] is None and rows[2]["d"] is None


def test_canonicalization_is_idempotent(spark):
    urls = [
        "HTTP://Example.COM:80/Path/?b=2&a=1&utm_source=x#f",
        "https://h/x",
        "weird junk",
    ]
    once = _canon(spark, urls)
    df = spark.createDataFrame([(u,) for u in once], "url string")
    twice = [r["c"] for r in df.select(canonicalize_url("url").alias("c")).collect()]
    assert once == twice


def test_urls_stay_jvm_side(spark):
    df = spark.createDataFrame([("http://a/b",)], "url string")
    plan = (
        df.select(canonicalize_url("url"), url_host("url"), url_registered_domain("url"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_registered_domain_multi_part_suffixes(spark):
    """Public-suffix-aware grouping: multi-part suffixes keep the
    registrable label, bare suffixes and near-miss hosts fall through
    to the plain last-2-label rule."""
    cases = {
        "https://www.example.co.uk/x": "example.co.uk",
        "http://sub.a.com.au": "a.com.au",
        "http://deep.sub.shop.co.jp/p": "shop.co.jp",
        "https://example.com/x": "example.com",
        "http://co.uk/": "co.uk",        # host IS the suffix: default rule
        "http://marco.uk": "marco.uk",   # label-aligned: not a .co.uk hit
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = [r["d"] for r in df.select(url_registered_domain("url").alias("d")).collect()]
    assert got == list(cases.values())
    # opting out restores the plain behavior
    plain = [
        r["d"]
        for r in df.select(
            url_registered_domain("url", multi_suffixes=()).alias("d")
        ).collect()
    ]
    assert plain[0] == "co.uk"
