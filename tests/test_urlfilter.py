"""URL curation tests: ops/urlfilter.py (blocklist + keyword gates)."""

import pytest
from pyspark.sql import functions as F

from docling_spark.ops import urlfilter


@pytest.fixture(scope="module")
def spark():
    from docling_spark.job import tuned_session

    s = tuned_session(master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = urlfilter.url_filter(df, urlfilter.blocked_domains(spark))
    return {r["doc_id"]: r["reason"] for r in out.collect()}


def test_subdomain_of_blocked_is_blocked(spark):
    res = _run(
        spark,
        [
            (1, "https://bad.example/home"),
            (2, "https://deep.sub.bad.example/x"),
            (3, "https://notbad.example/x"),  # suffix must align on labels
            (4, "https://www.news.example/article"),
        ],
    )
    assert res[1] == "blocked_domain"
    assert res[2] == "blocked_domain"
    assert res[3] == "keep"
    assert res[4] == "keep"


def test_gate_order_first_failing_reason(spark):
    res = _run(
        spark,
        [
            # blocked host + hard keyword -> blocked wins
            (1, "https://bad.example/xxx"),
            # hard beats soft
            (2, "https://ok.example/xxx-poker-bet"),
            # two soft keywords reject; one keeps
            (3, "https://ok.example/poker-and-bet"),
            (4, "https://ok.example/poker-only"),
            # spam digit run
            (5, "https://ok.example/a?session=123456789012345"),
            # depth 7 > 6
            (6, "https://ok.example/a/b/c/d/e/f/g"),
        ],
    )
    assert res[1] == "blocked_domain"
    assert res[2] == "hard_keyword"
    assert res[3] == "soft_keywords"
    assert res[4] == "keep"
    assert res[5] == "spam_query"
    assert res[6] == "too_deep"


def test_synth_corpus_exercises_every_reason(spark):
    docs = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    out = urlfilter.url_filter(
        urlfilter.synth_urls(docs), urlfilter.blocked_domains(spark)
    )
    reasons = {r["reason"] for r in out.select("reason").distinct().collect()}
    assert reasons == {
        "blocked_domain",
        "hard_keyword",
        "soft_keywords",
        "spam_query",
        "too_deep",
        "keep",
    }


def test_hostile_urls(spark):
    res = _run(
        spark,
        [
            (1, None),                                # null url survives
            (2, ""),                                  # empty
            (3, "no-scheme-here"),                    # unparseable
            (4, "https://bad.example:8080/x"),        # port must not evade
            (5, "https://user:pw@bad.example/x"),     # userinfo stripped
            (6, "https://ünïcode.example/ok"),
        ],
    )
    assert res[1] == "invalid_url"
    assert res[2] == "invalid_url"
    assert res[3] == "invalid_url"
    assert res[4] == "blocked_domain"
    assert res[5] == "blocked_domain"
    assert res[6] == "keep"
    assert len(res) == 6  # nothing silently dropped


def test_plan_single_broadcast_join(spark):
    docs = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    out = urlfilter.url_filter(
        urlfilter.synth_urls(docs), urlfilter.blocked_domains(spark)
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # one slim exchange (the re-collapse groupBy) + the broadcast — the
    # corpus is never shuffled twice
    import re

    assert len(re.findall(r"\bExchange hashpartitioning", plan)) <= 1
