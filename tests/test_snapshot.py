"""Crawl-snapshot CDC (ops/snapshot): classification law, work-list
content, slim-join plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from docling_spark.ops.snapshot import delta_worklist, snapshot_delta

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


def _snap(spark, rows):
    return spark.createDataFrame(
        [(u, None, b, None, None) for u, b in rows],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )


def test_classification(spark):
    old = _snap(spark, [("u1", b"a"), ("u2", b"b"), ("u3", b"c")])
    new = _snap(spark, [("u2", b"b"), ("u3", b"C2"), ("u4", b"d")])
    got = {
        r["url"]: r["status"] for r in snapshot_delta(old, new).collect()
    }
    assert got == {
        "u1": "removed",
        "u2": "unchanged",
        "u3": "changed",
        "u4": "added",
    }


def test_worklist_carries_new_versions(spark):
    old = _snap(spark, [("u1", b"v1"), ("u2", b"same")])
    new = _snap(spark, [("u1", b"v2"), ("u2", b"same"), ("u3", b"new")])
    got = {
        r["url"]: (r["status"], bytes(r["html"]))
        for r in delta_worklist(old, new).collect()
    }
    # unchanged u2 filtered; u1 carries the NEW blob
    assert got == {"u1": ("changed", b"v2"), "u3": ("added", b"new")}
    # work-list schema = new snapshot columns + status
    cols = delta_worklist(old, new).columns
    assert cols == ["url", "warc_ts", "html", "text", "lang", "status"]


def test_empty_old_snapshot_all_added(spark):
    old = _snap(spark, []).limit(0)
    new = _snap(spark, [("u1", b"x")])
    assert [r["status"] for r in snapshot_delta(old, new).collect()] == [
        "added"
    ]
    assert delta_worklist(old, new).count() == 1


def test_plan_is_slim_and_python_free(spark):
    """The classifier join must not move blobs: `html` appears only under
    sha2 in pre-exchange projections, and nothing crosses into Python."""
    old = _snap(spark, [("u1", b"a")])
    new = _snap(spark, [("u1", b"a")])
    plan = (
        snapshot_delta(old, new)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "pythonUDF" not in plan and "mapinpandas" not in plan.lower()
    # blobs are hashed below the join (slim projections feed the
    # exchange) and never reach the output row
    assert "sha2" in plan
    assert "html" not in snapshot_delta(old, new).columns


def test_cli_since_snapshot_incremental(spark, tmp_path):
    """`python -m docling_spark --since-snapshot` processes ONLY the
    added/changed urls of the new crawl — the O(delta) nightly mode."""
    from docling_spark.__main__ import main

    old_rows = [
        ("https://t.test/a", None, b"<html><body>A v1</body></html>", None, None),
        ("https://t.test/b", None, b"<html><body>B v1</body></html>", None, None),
    ]
    new_rows = [
        ("https://t.test/a", None, b"<html><body>A v1</body></html>", None, None),
        ("https://t.test/b", None, b"<html><body>B v2</body></html>", None, None),
        ("https://t.test/c", None, b"<html><body>C new</body></html>", None, None),
    ]
    schema = (
        "url string, warc_ts timestamp, html binary, "
        "text string, lang string"
    )
    old_p = str(tmp_path / "old")
    new_p = str(tmp_path / "new")
    out = str(tmp_path / "out")
    spark.createDataFrame(old_rows, schema).write.parquet(old_p)
    spark.createDataFrame(new_rows, schema).write.parquet(new_p)

    rc = main(
        [
            "--input", new_p,
            "--output", out,
            "--run-id", "cdc-test",
            "--num-chunks", "2",
            "--since-snapshot", old_p,
            "--master", "local[4]",
        ]
    )
    assert rc == 0
    got = {
        r["url"]: r["extracted_text"]
        for r in spark.read.parquet(f"{out}/data").collect()
    }
    # unchanged url a skipped; changed b and added c extracted
    assert set(got) == {"https://t.test/b", "https://t.test/c"}
    assert got["https://t.test/b"] == "B v2"
    assert got["https://t.test/c"] == "C new"


def test_null_html_is_content_not_presence(spark):
    """A fetch-failure NULL blob must classify by URL presence, with
    NULL treated as empty content — never as 'added'/'removed', and
    content->NULL transitions must reach the work list as 'changed'."""
    old = _snap(spark, [("u1", b"body"), ("u2", None), ("u3", None)])
    new = _snap(spark, [("u1", None), ("u2", b"now has body"), ("u3", None)])
    got = {r["url"]: r["status"] for r in snapshot_delta(old, new).collect()}
    assert got == {"u1": "changed", "u2": "changed", "u3": "unchanged"}
    wl = {r["url"] for r in delta_worklist(old, new).collect()}
    assert wl == {"u1", "u2"}
