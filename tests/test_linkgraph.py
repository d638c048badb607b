"""Hyperlink extraction + link graph (ops/linkgraph): resolution rules,
drop rules, degree law, PageRank composition over EXTRACTED edges, and
the zero-Python plan pin."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from docling_spark.ops.linkgraph import (
    extract_links,
    link_degrees,
    synth_linked_pages,
    web_edges,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _page(spark, url: str, body: str):
    return spark.createDataFrame(
        [(url, body.encode())], "url string, html binary"
    )


def test_resolution_rules(spark):
    body = """
    <a href="https://abs.example/p">abs</a>
    <a href="/rel/path">root-rel</a>
    <a href="//proto.example/q">proto-rel</a>
    <a href="mailto:x@y.test">mail</a>
    <a href="javascript:void(0)">js</a>
    <a href="#frag">frag</a>
    <a href="">empty</a>
    """
    edges = extract_links(_page(spark, "https://src.test:8080/dir/page", body))
    got = sorted(r["dst"] for r in edges.collect())
    assert got == [
        "https://abs.example/p",
        "https://proto.example/q",
        "https://src.test:8080/rel/path",
    ]


def test_self_links_and_dups_dropped(spark):
    body = (
        '<a href="https://s.test/a">1</a>'
        '<a href="https://s.test/a">2</a>'
        '<a href="/self">3</a>'
    )
    edges = extract_links(_page(spark, "https://s.test/self", body))
    got = sorted(r["dst"] for r in edges.collect())
    assert got == ["https://s.test/a"]


def test_degree_law_matches_arithmetic(spark):
    """Out-degree of doc i over the synthetic law = distinct non-self
    targets + external at i%5==0 (derived independently in Python)."""
    n = spark.read.parquet(f"{SF}/documents.parquet").count()
    edges = web_edges(spark, SF)
    deg = {
        r["node"]: (r["out_degree"], r["in_degree"], r["is_dangling"])
        for r in link_degrees(edges).collect()
    }
    for i in (0, 1, 7, n - 1):
        url = f"https://synth.test/doc/{i}.html"
        targets = {(i * 7 + 11 * j) % n for j in range(1, i % 3 + 2)} - {i}
        want = len(targets) + (1 if i % 5 == 0 else 0)
        assert deg[url][0] == want, (i, deg[url])
    # external pages are dangling: linked to, no outlinks
    ext = f"https://other.example/page{5 if n > 5 else 0}"
    assert deg[ext][0] == 0 and deg[ext][2] is True


def test_pagerank_over_extracted_edges(spark):
    """ops/graph.pagerank composes directly on extracted URL edges
    (string node ids): ranks sum to ~n and converge deterministically."""
    from docling_spark.ops import graph

    edges = web_edges(spark, SF)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    pr = graph.pagerank(nodes, edges, iters=5)
    total = pr.agg(F.sum("rank").alias("s")).collect()[0]["s"]
    # dangling mass is redistributed, so total rank mass is conserved
    # at 1.0 (up to the 6-decimal per-node rounding)
    assert abs(total - 1.0) < 1e-3
    a = sorted((r[0], round(r[1], 10)) for r in pr.collect())
    b = sorted((r[0], round(r[1], 10)) for r in pr.collect())
    assert a == b


def test_plan_zero_python_extract(spark):
    plan = (
        web_edges(spark, SF)._jdf.queryExecution().executedPlan().toString()
    )
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan


def test_anchor_text_pairing(spark):
    """href/text arrays come from the SAME regex, so they zip exactly:
    same href with two texts keeps both triples; identical (href, text)
    pairs collapse."""
    from docling_spark.ops.linkgraph import extract_links_text

    body = (
        '<a href="https://s.test/a">first</a>'
        '<a class="z" href="https://s.test/a">second</a>'
        '<a href="https://s.test/a">first</a>'
        '<a href="mailto:x@y.z">mail</a>'
        '<a href="/rel">rooted</a>'
    )
    got = sorted(
        (r["dst"], r["anchor"])
        for r in extract_links_text(
            _page(spark, "https://s.test/p", body)
        ).collect()
    )
    assert got == [
        ("https://s.test/a", "first"),
        ("https://s.test/a", "second"),
        ("https://s.test/rel", "rooted"),
    ]


def test_anchor_stats_profile(spark):
    """Per-target aggregation over the synthetic law: n_refs counts
    referencing triples, anchors is the sorted-distinct '|'-join."""
    from docling_spark.ops.linkgraph import (
        anchor_stats,
        extract_links_text,
        synth_linked_pages,
    )

    n = spark.read.parquet(f"{SF}/documents.parquet").count()
    stats = {
        r["url"]: (r["n_refs"], r["n_texts"], r["anchors"])
        for r in anchor_stats(
            extract_links_text(synth_linked_pages(spark, SF))
        ).collect()
    }
    # independent derivation from the law in plain python
    from collections import defaultdict

    triples = defaultdict(set)
    for i in range(n):
        for j in range(1, i % 3 + 2):
            t = (i * 7 + 11 * j) % n
            if t != i:
                triples[f"https://synth.test/doc/{t}.html"].add(
                    (f"https://synth.test/doc/{i}.html", f"d{t}.{i % 7}")
                )
        if i % 5 == 0:
            triples[f"https://other.example/page{i}"].add(
                (f"https://synth.test/doc/{i}.html", f"x{i}")
            )
    for url, trips in triples.items():
        texts = sorted({a for _, a in trips})
        assert stats[url] == (len(trips), len(texts), "|".join(texts)), url
    assert set(stats) == set(triples)


def test_invalid_utf8_never_throws(spark):
    # lenient decode posture: arbitrary binary yields zero edges, no error
    from docling_spark.ops.linkgraph import extract_links, extract_links_text

    hostile = _page(spark, "https://h.test/p", "")
    hostile = hostile.withColumn(
        "html", F.lit(b"\xff\xfe\x80<a href=" + b"\x81" * 50)
    )
    assert extract_links(hostile).count() == 0
    assert extract_links_text(hostile).count() == 0


def test_anchor_nested_markup_kept(spark):
    """Most real anchors wrap <b>/<img>/<span>: the element regex must
    capture them (lazy to the first </a>) and strip tags from the text,
    so the edge set matches extract_links."""
    from docling_spark.ops.linkgraph import extract_links, extract_links_text

    body = (
        '<a href="https://x.test/a"><b>Click</b> here</a>'
        '<a href="https://x.test/b"><img src="i.png"></a>'
        '<a href="https://x.test/c">plain</a>'
    )
    page = _page(spark, "https://s.test/p", body)
    triples = {
        (r["dst"], r["anchor"]) for r in extract_links_text(page).collect()
    }
    assert triples == {
        ("https://x.test/a", "Click here"),
        ("https://x.test/b", ""),
        ("https://x.test/c", "plain"),
    }
    # edge parity with the href-only extractor
    assert {r["dst"] for r in extract_links(page).collect()} == {
        t[0] for t in triples
    }
