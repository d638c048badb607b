"""Sitemap parsing (ops/sitemap): field extraction, entity unescape,
index files, malformed-field tolerance, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docling_spark.ops.sitemap import parse_sitemaps


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _parse(spark, xml, host="h.test"):
    df = spark.createDataFrame(
        [(host, xml)], "host string, sitemap_xml string"
    )
    return parse_sitemaps(df).collect()


def test_urlset_fields(spark):
    xml = (
        "<urlset>"
        "<url><loc> https://h.test/a?x=1&amp;y=2 </loc>"
        "<lastmod>2026-03-15T10:00:00+00:00</lastmod>"
        "<changefreq>daily</changefreq><priority>0.8</priority></url>"
        "<url><loc>https://h.test/b</loc></url>"
        "</urlset>"
    )
    rows = {r["entry_idx"]: r for r in _parse(spark, xml)}
    a, b = rows[0], rows[1]
    assert a["loc"] == "https://h.test/a?x=1&y=2"  # trimmed + unescaped
    assert a["lastmod"] == "2026-03-15T10:00:00+00:00"
    assert a["lastmod_date"] == "2026-03-15"
    assert a["changefreq"] == "daily" and a["priority"] == 0.8
    assert a["kind"] == "url"
    assert b["lastmod"] is None and b["lastmod_date"] is None
    assert b["changefreq"] is None and b["priority"] is None


def test_sitemapindex_and_empty_loc(spark):
    xml = (
        "<sitemapindex>"
        "<sitemap><loc>https://h.test/s1.xml</loc></sitemap>"
        "<sitemap><loc></loc></sitemap>"
        "<sitemap><loc>https://h.test/s2.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    rows = _parse(spark, xml)
    assert [r["kind"] for r in rows] == ["sitemap", "sitemap"]
    # the empty-loc entry is dropped but keeps its slot in entry_idx
    assert sorted(r["entry_idx"] for r in rows) == [0, 2]


def test_malformed_fields_null_not_error(spark):
    xml = (
        "<urlset><url><loc>https://h.test/x</loc>"
        "<lastmod>next tuesday</lastmod>"
        "<priority>high</priority></url></urlset>"
    )
    (r,) = _parse(spark, xml)
    assert r["lastmod"] == "next tuesday"  # raw claim preserved
    assert r["lastmod_date"] is None  # but the typed view is NULL
    assert r["priority"] is None


def test_double_escaped_entity_not_over_decoded(spark):
    xml = "<urlset><url><loc>https://h.test/?q=&amp;lt;tag&amp;gt;</loc></url></urlset>"
    (r,) = _parse(spark, xml)
    # &amp;lt; must decode to &lt; (one level), never to <
    assert r["loc"] == "https://h.test/?q=&lt;tag&gt;"


def test_plan_no_shuffle_no_python(spark):
    df = spark.createDataFrame(
        [("h.test", "<urlset></urlset>")], "host string, sitemap_xml string"
    )
    plan = parse_sitemaps(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_wet_record_shape(spark):
    import hashlib

    from docling_spark.ops.wet import wet_records

    df = spark.createDataFrame(
        [("https://h.test/a", "2024-01-01 00:00:05", "héllo")],
        "url string, warc_ts string, text string",
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    (r,) = wet_records(df).collect()
    rec = r["wet_record"]
    head, _, body = rec.partition("\r\n\r\n")
    lines = head.split("\r\n")
    assert lines[0] == "WARC/1.0"
    assert "WARC-Type: conversion" in lines
    assert "WARC-Target-URI: https://h.test/a" in lines
    assert "WARC-Date: 2024-01-01T00:00:05Z" in lines
    # Content-Length counts BYTES (é is 2 in UTF-8): 6, not 5
    assert "Content-Length: 6" in lines
    rid = hashlib.md5(b"https://h.test/a@2024-01-01T00:00:05Z").hexdigest()
    assert f"WARC-Record-ID: <urn:md5:{rid}>" in lines
    assert body == "héllo\n\n"
    assert r["record_bytes"] == len(rec.encode("utf-8"))


def test_lang_confusion_rates(spark):
    from docling_spark.ops.textstats import lang_confusion

    rows = [
        (0, "en", "the cat and the dog of a house in a town"),
        (1, "en", "zzz qqq www"),  # declared en, detected unknown
        (2, "de", "kein englisches stoppwort hier"),
        (3, "de", "noch ein satz ohne treffer"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        (r["lang"], r["lang_pred"]): r for r in lang_confusion(df).collect()
    }
    assert got[("en", "en")]["n"] == 1 and got[("en", "en")]["rate"] == 0.5
    assert got[("en", "unknown")]["rate"] == 0.5
    assert got[("de", "unknown")]["n"] == 2
    assert got[("de", "unknown")]["rate"] == 1.0
    assert ("de", "en") not in got


def test_recrawl_due_law(spark):
    from docling_spark.ops.sitemap import parse_sitemaps, recrawl_due

    xml = (
        "<urlset>"
        "<url><loc>https://h.test/fresh</loc>"
        "<lastmod>2026-06-14</lastmod><changefreq>daily</changefreq></url>"
        "<url><loc>https://h.test/stale-weekly</loc>"
        "<lastmod>2026-06-01</lastmod><changefreq>weekly</changefreq></url>"
        "<url><loc>https://h.test/fresh-weekly</loc>"
        "<lastmod>2026-06-10</lastmod><changefreq>weekly</changefreq></url>"
        "<url><loc>https://h.test/never</loc>"
        "<lastmod>2020-01-01</lastmod><changefreq>never</changefreq></url>"
        "<url><loc>https://h.test/no-lastmod</loc>"
        "<changefreq>never</changefreq></url>"
        "<url><loc>https://h.test/defaults</loc>"
        "<lastmod>2026-06-01</lastmod><priority>0.9</priority></url>"
        "</urlset>"
    )
    df = spark.createDataFrame(
        [("h.test", xml)], "host string, sitemap_xml string"
    )
    got = {
        r["loc"].rsplit("/", 1)[-1]: r
        for r in recrawl_due(parse_sitemaps(df), asof="2026-06-15").collect()
    }
    assert got["fresh"]["due"]  # 1 day elapsed >= daily interval
    assert got["stale-weekly"]["due"]  # 14 days >= 7
    assert not got["fresh-weekly"]["due"]  # 5 days < 7
    assert not got["never"]["due"]  # never + valid lastmod
    assert got["no-lastmod"]["due"]  # missing lastmod always fetches
    assert got["no-lastmod"]["interval_days"] is None
    d = got["defaults"]
    assert d["interval_days"] == 7 and d["due"]  # default freq
    assert d["fetch_priority"] == 0.9
    assert got["fresh"]["fetch_priority"] == 0.5  # protocol default
