"""PII scrubbing (docling_spark/ops/pii.py): hand cases + plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from docling_spark.ops.pii import pii_scrub, synth_pii_text

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("pii-test")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    yield s


def _scrub(spark, text: str):
    df = spark.createDataFrame([(0, text)], "doc_id long, ptext string")
    return pii_scrub(df).collect()[0]


def test_scrub_all_types(spark):
    r = _scrub(
        spark,
        "mail a.b+c@sub.example.org or x@y.io, call 555-1234, "
        "server 192.168.0.1 and 10.0.0.255 end",
    )
    assert r.scrubbed == (
        "mail <EMAIL> or <EMAIL>, call <PHONE>, "
        "server <IP> and <IP> end"
    )
    assert (r.n_email, r.n_phone, r.n_ip) == (2, 1, 2)


def test_non_pii_untouched(spark):
    text = "version 1.2.3 of pkg; 555-12 is short; a@b is not a domain."
    r = _scrub(spark, text)
    assert r.scrubbed == text
    assert (r.n_email, r.n_phone, r.n_ip) == (0, 0, 0)


def test_numeric_corpus_words_not_ips(spark):
    # the webtext numeric classes end lines with "123." — never IP-shaped
    out = pii_scrub(synth_pii_text(spark, SF))
    rows = out.filter("doc_id % 3 > 0 AND doc_id % 5 > 0").collect()
    assert all(r.n_email == 0 and r.n_ip == 0 for r in rows)
    hit = {r.doc_id: r for r in out.collect()}
    assert hit[30].n_email == 1 and hit[30].n_ip == 1
    assert "<EMAIL>" in hit[30].scrubbed and "<IP>" in hit[30].scrubbed
    assert hit[12].n_phone == 1 and "<PHONE>" in hit[12].scrubbed


def test_plan_scan_project_only(spark):
    out = pii_scrub(synth_pii_text(spark, SF))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
    assert "MapInPandas" not in plan and "EvalPython" not in plan
