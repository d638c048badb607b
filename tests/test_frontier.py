"""Crawl-frontier scheduler (ops/frontier): politeness-queue law,
host-sticky slot assignment, makespan bounds, edge cases, plan pin."""

from __future__ import annotations

import hashlib

import pytest

from docling_spark.ops.frontier import (
    SLOT_SALT,
    frontier_load,
    schedule_frontier,
)


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


def _ref_slot(host: str, fetchers: int) -> int:
    h = hashlib.md5((SLOT_SALT + host).encode()).hexdigest()
    return int(int(h[:8], 16) / 2**32 * fetchers)


def _urls(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, url string")


def test_politeness_queue_and_slots(spark):
    rows = [
        (1, "https://a.example/p1"),
        (2, "https://a.example/p2"),
        (3, "https://A.EXAMPLE/p0"),  # case-folded into the same host
        (4, "https://b.example/only"),
        (5, "not a url at all"),  # no authority -> '' host queue
    ]
    got = {
        r["doc_id"]: r
        for r in schedule_frontier(
            _urls(spark, rows), fetchers=8, delay_s=2.0
        ).collect()
    }
    # a.example queue in (url, doc_id) order: upper-case URL sorts first
    a = [got[3], got[1], got[2]]
    assert [r["seq"] for r in a] == [1, 2, 3]
    assert [r["start_s"] for r in a] == [0.0, 2.0, 4.0]
    assert {r["host"] for r in a} == {"a.example"}
    # one host -> one slot (host-sticky), matching the python md5 law
    assert len({r["slot"] for r in a}) == 1
    assert a[0]["slot"] == _ref_slot("a.example", 8)
    assert got[4]["seq"] == 1 and got[4]["start_s"] == 0.0
    assert got[5]["host"] == "" and got[5]["seq"] == 1


def test_all_rows_schedule_exactly_once(spark):
    rows = [(i, f"https://h{i % 3}.test/p{i}") for i in range(30)]
    out = schedule_frontier(_urls(spark, rows), fetchers=4).collect()
    assert len(out) == 30
    assert sorted(r["doc_id"] for r in out) == list(range(30))
    # each host queue is a gapless 1..n sequence
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r["seq"])
    for seqs in by_host.values():
        assert sorted(seqs) == list(range(1, len(seqs) + 1))


def test_load_bounds(spark):
    # giant host (20 pages) + 10 singleton hosts, one slot (fetchers=1)
    rows = [(i, f"https://giant.test/p{i}") for i in range(20)] + [
        (100 + i, f"https://tiny{i}.test/") for i in range(10)
    ]
    load = frontier_load(
        _urls(spark, rows), fetchers=1, delay_s=1.0, rate_rps=10.0
    ).collect()
    assert len(load) == 1
    r = load[0]
    assert r["n_urls"] == 30 and r["n_hosts"] == 11
    assert r["max_host_queue"] == 20
    assert r["politeness_s"] == 19.0  # (20-1)*1.0 — the giant host
    assert r["bandwidth_s"] == 3.0  # 30/10
    assert r["makespan_s"] == 19.0  # politeness-bound slot


def test_deterministic_across_parallelism(spark):
    rows = [(i, f"https://h{i % 7}.test/p{i:03d}") for i in range(100)]
    a = schedule_frontier(_urls(spark, rows).repartition(1)).collect()
    b = schedule_frontier(_urls(spark, rows).repartition(13)).collect()
    key = lambda r: r["doc_id"]
    assert sorted(a, key=key) == sorted(b, key=key)


def test_plan_single_exchange_no_python(spark):
    df = _urls(spark, [(1, "https://x.test/")])
    plan = (
        schedule_frontier(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1  # the host window, nothing else
    assert "Python" not in plan


def test_crawl_plan_composition(spark):
    from docling_spark.ops.frontier import crawl_plan

    robots = spark.createDataFrame(
        [
            ("a.test", "User-agent: *\nDisallow: /private\nCrawl-delay: 2\n"),
            ("b.test", "User-agent: *\nDisallow: /\n"),
        ],
        "host string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [
            (1, "https://a.test/x"),
            (2, "https://a.test/private/y"),  # gated out
            (3, "https://a.test/z"),
            (4, "https://b.test/anything"),  # whole host disallowed
            (5, "https://norobots.test/ok"),  # no file -> default delay
        ],
        "doc_id long, url string",
    )
    got = {
        r["doc_id"]: r
        for r in crawl_plan(
            urls, robots, fetchers=4, default_delay_s=1.0
        ).collect()
    }
    assert set(got) == {1, 3, 5}  # 2 and 4 never enter a queue
    # a.test queue sequenced at ITS crawl-delay
    assert got[1]["delay_s"] == 2.0 and got[3]["delay_s"] == 2.0
    assert {got[1]["start_s"], got[3]["start_s"]} == {0.0, 2.0}
    # host without robots falls back to the default delay
    assert got[5]["delay_s"] == 1.0 and got[5]["start_s"] == 0.0
