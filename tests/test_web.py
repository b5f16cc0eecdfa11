"""Unit edge cases for URL canonicalization beyond what the synthetic
oracle construction exercises."""

from __future__ import annotations

import pyspark.sql.functions as F

from aram_matchdata_etl_spark.operators.web import (
    canonicalize_url,
    registered_domain,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select(
        "url",
        canonicalize_url(F.col("url")).alias("c"),
        registered_domain(F.col("url")).alias("d"),
    ).collect()
    return {r["url"]: (r["c"], r["d"]) for r in rows}


def test_canonicalize_edge_cases(spark):
    got = _canon(
        spark,
        [
            "HTTP://WWW.Foo.COM/A/B?utm_source=x&utm_medium=y",  # all-utm -> no '?'
            "https://foo.com/p?a=1&utm_x=2&b=3#frag",  # keeps real params in order
            "https://Sub.Deep.Foo.Co/p",  # >2 labels -> last two
            "ftp://HOST/file",  # non-http scheme preserved (lowercased)
            "https://single/path",  # single-label host: domain == host
            "https://h.example/p#frag?x=1",  # '?' inside fragment is NOT a query
        ],
    )
    assert got["HTTP://WWW.Foo.COM/A/B?utm_source=x&utm_medium=y"] == (
        "http://www.foo.com/A/B",
        "foo.com",
    )
    assert got["https://foo.com/p?a=1&utm_x=2&b=3#frag"] == (
        "https://foo.com/p?a=1&b=3",
        "foo.com",
    )
    assert got["https://Sub.Deep.Foo.Co/p"] == ("https://sub.deep.foo.co/p", "foo.co")
    assert got["ftp://HOST/file"] == ("ftp://host/file", "host")
    assert got["https://single/path"] == ("https://single/path", "single")
    # fragment dropped entirely — its '?x=1' must not resurrect as a query
    assert got["https://h.example/p#frag?x=1"] == (
        "https://h.example/p",
        "h.example",
    )


def test_canonicalize_idempotent(spark):
    urls = [
        "HTTPS://A.B.C/x?utm_a=1&q=2#z",
        "http://foo.com/",
        "https://foo.com/p?a=1",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(canonicalize_url(F.col("url")).alias("url"))
    twice = once.select(
        "url", canonicalize_url(F.col("url")).alias("again")
    ).collect()
    for r in twice:
        assert r["url"] == r["again"]
