"""URL canonicalization + snapshot dedup (ops/urlnorm)."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from docling_spark.ops.urlnorm import (
    canonical_dedup,
    canonicalize_url,
    synth_messy_urls,
)


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _canon(spark, urls: list[str]) -> list[str]:
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r["c"] for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()
    ]


CASES = [
    # fragment dropped, scheme+host lowered
    ("HTTPS://WWW.Example.COM/Path#frag", "https://www.example.com/Path"),
    # default ports stripped, non-default kept
    ("https://a.test:443/x", "https://a.test/x"),
    ("http://a.test:80/x", "http://a.test/x"),
    ("http://a.test:8080/x", "http://a.test:8080/x"),
    # userinfo stripped
    ("https://user:pw@a.test/x", "https://a.test/x"),
    # path: // collapse, /index.html, trailing slash, empty path
    ("https://a.test//x///y", "https://a.test/x/y"),
    ("https://a.test/dir/index.html", "https://a.test/dir"),
    ("https://a.test/dir/", "https://a.test/dir"),
    ("https://a.test", "https://a.test/"),
    ("https://a.test/", "https://a.test/"),
    # query: tracking dropped, survivors sorted, empty -> no '?'
    ("https://a.test/x?utm_source=f&b=2&a=1", "https://a.test/x?a=1&b=2"),
    ("https://a.test/x?gclid=1&fbclid=2&utm_campaign=z", "https://a.test/x"),
    ("https://a.test/x?sid=9&z=1&ref=h", "https://a.test/x?z=1"),
    # '?' inside the query survives (only the FIRST ? splits)
    ("https://a.test/x?a=1?b", "https://a.test/x?a=1?b"),
]


def test_canonicalize_cases(spark):  # noqa: F811
    got = _canon(spark, [c[0] for c in CASES])
    for (raw, want), g in zip(CASES, got):
        assert g == want, f"{raw}: {g!r} != {want!r}"


def test_canonicalize_idempotent(spark):  # noqa: F811
    """canon(canon(u)) == canon(u) over the synthetic corpus."""
    docs = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    urls = synth_messy_urls(docs)
    once = urls.select(canonicalize_url(F.col("url")).alias("c1"))
    twice = once.select(
        "c1", canonicalize_url(F.col("c1")).alias("c2")
    ).filter(F.col("c1") != F.col("c2"))
    assert twice.count() == 0


def test_dedup_keeps_latest_snapshot(spark):  # noqa: F811
    rows = [
        ("https://a.test/x?utm_source=1", "2024-01-01 00:00:00"),
        ("https://a.test/x?utm_source=2", "2024-01-03 00:00:00"),
        ("https://a.test/x#frag", "2024-01-02 00:00:00"),
        ("https://b.test/y", "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "url string, ts string").select(
        "url", F.to_timestamp("ts").alias("warc_ts")
    )
    out = {r["canonical_url"]: r for r in canonical_dedup(df).collect()}
    assert len(out) == 2
    a = out["https://a.test/x"]
    assert a["kept_url"] == "https://a.test/x?utm_source=2"
    assert a["n_snapshots"] == 3
    assert out["https://b.test/y"]["n_snapshots"] == 1


def test_dedup_tiebreak_deterministic(spark):  # noqa: F811
    """Equal warc_ts: bytewise-largest raw url wins, every run."""
    rows = [
        ("https://a.test/x?utm_source=aa", "2024-01-01 00:00:00"),
        ("https://a.test/x?utm_source=zz", "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "url string, ts string").select(
        "url", F.to_timestamp("ts").alias("warc_ts")
    )
    for _ in range(2):
        [r] = canonical_dedup(df).collect()
        assert r["kept_url"] == "https://a.test/x?utm_source=zz"


def test_plan_single_exchange_no_python(spark):  # noqa: F811
    docs = spark.range(0, 50).select(F.col("id").alias("doc_id"))
    plan = canonical_dedup(synth_messy_urls(docs))._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "SortMergeJoin"):
        assert bad not in plan


def test_malformed_urls_stay_themselves(spark):
    """No scheme/host -> canonical = the raw url: malformed rows must
    NOT collapse into one degenerate '://'-key group (a dedup over that
    key would silently merge unrelated pages)."""
    raws = [
        "not a url at all",
        "/rooted/path/only",
        "ftp:broken",
        "",
        "://x",
    ]
    got = _canon(spark, raws)
    assert got == raws
    # and therefore they never dedup against each other
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(u, ts) for u in raws if u], "url string, warc_ts timestamp"
    )
    assert canonical_dedup(df).count() == len([u for u in raws if u])


def test_url_patterns_trap_mining(spark):
    from docling_spark.ops.urlnorm import url_patterns

    rows = (
        [(f"https://t.test/cal/20{i:02d}/{1 + i % 12}/x",) for i in range(120)]
        + [("https://t.test/about",)]
        + [(f"https://s.test/s/deadbeefcafe{i:04d}/v",) for i in range(3)]
    )
    df = spark.createDataFrame(rows, "url string")
    got = {
        (r["host"], r["pattern"]): r
        for r in url_patterns(df, trap_min_urls=100, trap_min_depth=3).collect()
    }
    trap = got[("t.test", "/cal/{n}/{n}/x")]
    assert trap["n_urls"] == 120 and trap["depth"] == 4 and trap["is_trap"]
    assert not got[("t.test", "/about")]["is_trap"]
    # 16 hex chars collapse to ONE {h} token (hex pass runs first)
    hexp = got[("s.test", "/s/{h}/v")]
    assert hexp["n_urls"] == 3 and not hexp["is_trap"]
