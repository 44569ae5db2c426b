"""Web-curation operators: HTML stripping + URL normalization
(operators/web.py — the C4/RefinedWeb pre-text stages)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from server2_vector_search_server_spark.operators.web import (
    normalize_url,
    strip_html,
    url_domain,
)


def _one(spark, expr, value):
    return (spark.createDataFrame([(value,)], "v string")
            .select(expr(F.col("v")).alias("out")).first()["out"])


@pytest.mark.parametrize("html,want", [
    ("<p>Hello <b>world</b></p>", "Hello world"),
    ("<script>if (a<b) x();</script>after", "after"),
    ("<style>p{}</style>text<title>t</title>", "text"),
    ("line one<br>line two<br/>line three", "line one\nline two\nline three"),
    ("<div>a</div><div>b</div>", "a\nb"),
    ("A &amp; B &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end",
     "A & B <tag> \"q\" 's' end"),
    ("<!-- hidden -->visible<!-- also\nhidden -->", "visible"),
    ("  <p>  spaced   out  </p>  ", "spaced out"),
    ("<ul><li>x</li><li>y</li></ul>", "x\ny"),
])
def test_strip_html_cases(spark, html, want):
    assert _one(spark, strip_html, html) == want


@pytest.mark.parametrize("url,want", [
    # authority lowercased, path case preserved
    ("HTTP://ExAmple.COM/Path/File", "http://example.com/Path/File"),
    # default ports dropped, non-default kept
    ("https://a.com:443/x", "https://a.com/x"),
    ("http://a.com:80/x", "http://a.com/x"),
    ("http://a.com:8080/x", "http://a.com:8080/x"),
    # fragment always dropped
    ("https://a.com/x#section", "https://a.com/x"),
    # tracking params dropped, real params kept in order
    ("https://a.com/x?utm_source=s&q=1&fbclid=f&page=2",
     "https://a.com/x?q=1&page=2"),
    ("https://a.com/x?utm_source=s", "https://a.com/x"),
    # trailing slash stripped from non-root path, kept at root
    ("https://a.com/x/", "https://a.com/x"),
    ("https://a.com/x/?q=1", "https://a.com/x?q=1"),
    ("https://a.com/", "https://a.com/"),
])
def test_normalize_url_cases(spark, url, want):
    assert _one(spark, normalize_url, url) == want


def test_url_domain(spark):
    assert _one(spark, url_domain,
                "https://www.sub.Example.com/x") == "sub.example.com"
    assert _one(spark, url_domain,
                "http://plain.org:8080/y") == "plain.org"
