"""Web-ingest text front end (functions/text.py): HTML→text
extraction, URL domain parsing, blocklist ratios."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from avro_spark.functions.text import blocklist_ratio, html_to_text, url_domain


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


@pytest.mark.parametrize(
    "html,want",
    [
        ("<p>Hello <b>world</b></p>", "Hello world"),
        ("<script>var x = '<p>';</script>text", "text"),
        ("<style>p { color: red }</style>after", "after"),
        ("<SCRIPT>upper</SCRIPT>kept", "kept"),
        ("a<!-- comment \n lines -->b", "a b"),
        ("&lt;tag&gt; &amp; &quot;q&quot; &#39;s&#39; x&nbsp;y", "<tag> & \"q\" 's' x y"),
        ("&amp;lt;", "&lt;"),  # double-encoded stays encoded once
        ("  lots \n of\t space  ", "lots of space"),
        ("", ""),
        # heuristic, not a parser: a '>' inside an attribute value ends
        # the tag early and the remainder survives as text
        ("<div class='a' data-x=\"<y>\">inner</div>", '">inner'),
    ],
)
def test_html_to_text(spark, html, want):
    assert _one(spark, html_to_text(F.lit(html))) == want


@pytest.mark.parametrize(
    "url,want",
    [
        ("https://Sub.Example.COM:8080/path?q=1", "sub.example.com"),
        ("http://example.org", "example.org"),
        ("ftp://user:pw@Host.net/file", "host.net"),
        ("example.com/path", "example.com"),
        ("example.com", "example.com"),
        # protocol-relative //host is not a scheme; host extraction
        # needs either a scheme or a bare-host form
        ("//cdn.example.com/x", ""),
        ("", ""),
    ],
)
def test_url_domain(spark, url, want):
    assert _one(spark, url_domain(F.lit(url))) == want


def test_blocklist_ratio(spark):
    df = spark.createDataFrame(
        [("bad worse fine fine",), ("all good here",), ("",)], "text string"
    )
    got = [
        r["r"]
        for r in df.select(
            blocklist_ratio(F.col("text"), ("bad", "worse")).alias("r")
        ).collect()
    ]
    assert got[0] == pytest.approx(0.5)
    assert got[1] == 0.0
    assert got[2] == 0.0


def test_blocklist_case_insensitive(spark):
    df = spark.createDataFrame([("BAD Bad bad ok",)], "text string")
    got = df.select(
        blocklist_ratio(F.col("text"), ("Bad",)).alias("r")
    ).collect()[0]["r"]
    assert got == pytest.approx(0.75)


def test_html_pipeline_composes(spark):
    # extraction feeds the standard text stats unchanged
    from avro_spark.functions.text import token_count

    df = spark.createDataFrame(
        [("<p>one two</p><script>x</script>",)], "html string"
    )
    n = df.select(token_count(html_to_text(F.col("html"))).alias("n")).collect()
    assert n[0]["n"] == 2
