"""Extraction invariants (BASELINE.json input_hint): the Arrow-UDF path must
reproduce the stored ``text`` column byte-identically per url, and the
column-expression url canonicalizer must agree with the Python oracle."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from pybiodatafuse_spark.datagen import generate_pages_pdf
from pybiodatafuse_spark.functions.extraction import (
    extract_links,
    extract_text,
    extract_text_udf,
    extract_links_udf,
)
from pybiodatafuse_spark.functions.urlnorm import canonicalize_url, canonicalize_url_col


def test_text_byte_identical_per_url(spark, pages_df):
    mismatches = (
        pages_df.select(
            "url", "text", extract_text_udf(F.col("html")).alias("extracted")
        )
        .where(~F.col("extracted").eqNullSafe(F.col("text")))
        .count()
    )
    assert mismatches == 0


def test_extract_text_strips_script_style_and_collapses_ws():
    html = b"<html><style>p{}</style><script>x</script><p>a\n\n  b</p></html>"
    assert extract_text(html) == "a b"
    assert extract_text(None) is None


def test_extract_links_resolves_and_canonicalizes():
    html = (
        b'<a href="/rel">r</a> <a href="HTTP://Example.COM:80/x#frag">a</a> '
        b"<a href='https://other.example/y'>s</a> <a href=\"#skip\">n</a> "
        b'<a href="mailto:x@y.z">m</a>'
    )
    links = extract_links(html, "https://base.example/dir/page")
    assert links == [
        "https://base.example/rel",
        "http://example.com/x",
        "https://other.example/y",
    ]


def test_canonicalize_col_matches_python(spark):
    urls = [
        "https://Site0.Example/p1",
        "http://example.com:80/a?q=1#frag",
        "https://example.com:443/",
        "https://example.com",
        "ftp://nope.example/x",
        "https://example.com/path?a=1&b=2",
        "  https://pad.example/x  ",
        "not a url",
        "https://example.com#only-frag",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = [
        r["canon"]
        for r in df.select(canonicalize_url_col(F.col("url")).alias("canon"))
        .collect()
    ]
    expected = [canonicalize_url(u) for u in urls]
    assert got == expected


def test_links_udf_matches_python(spark, pages_df):
    sample = pages_df.limit(50)
    rows = sample.select(
        "url", "html", extract_links_udf(F.col("html"), F.col("url")).alias("links")
    ).collect()
    for r in rows:
        assert list(r["links"]) == extract_links(bytes(r["html"]), r["url"])


def test_datagen_deterministic_across_partitionings(spark):
    from pybiodatafuse_spark.datagen import generate_pages

    a = generate_pages(spark, 200, partitions=2).orderBy("url").collect()
    b = generate_pages(spark, 200, partitions=7).orderBy("url").collect()
    assert a == b


def test_datagen_matches_local_pdf(spark):
    from pybiodatafuse_spark.datagen import generate_pages

    spark_rows = generate_pages(spark, 100, partitions=4).orderBy("url").collect()
    pdf = generate_pages_pdf(np.arange(100), 100).sort_values("url")
    assert [r["url"] for r in spark_rows] == pdf["url"].tolist()
    assert [r["text"] for r in spark_rows] == pdf["text"].tolist()
    assert [bytes(r["html"]) for r in spark_rows] == pdf["html"].tolist()
