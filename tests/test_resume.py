"""Resume / exactly-once tests for the chunked ExtractionRunner
(SURVEY.md §7.4 risk 5: prove idempotence under kill + rerun).

Strategy per SURVEY §5 rebuild plan (c): run the job, kill it after k
chunks (simulated by a runner that raises mid-run), rerun, and assert the
committed url set is exactly the input set — no loss, no duplicates."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from docling_spark.job import ExtractionRunner, RunConfig, dedup_latest_crawl
from docling_spark.ops.corpus import synth_pages

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("resume-test")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "128")
        .getOrCreate()
    )
    yield s


class _KilledMidRun(Exception):
    pass


class _KillingRunner(ExtractionRunner):
    """Raises after `kill_after` chunk commits — simulates a lost driver."""

    def __init__(self, spark, cfg, kill_after: int):
        super().__init__(spark, cfg)
        self.kill_after = kill_after
        self._commits = 0

    def _append_lineage(self, row):
        super()._append_lineage(row)
        self._commits += 1
        if self._commits >= self.kill_after:
            raise _KilledMidRun()


def test_kill_and_resume_exactly_once(spark, tmp_path):
    out = str(tmp_path / "out")
    # the kill phase runs serial (max_concurrent_chunks=1) so the kill point
    # is deterministic; the RESUME below uses the default concurrent pool,
    # proving exactly-once holds with overlapping chunk jobs
    cfg = RunConfig(
        run_id=f"r-{uuid.uuid4().hex[:8]}",
        output_path=out,
        num_chunks=6,
        max_concurrent_chunks=1,
    )
    pages = synth_pages(spark, SF)
    n_input = pages.count()

    with pytest.raises(_KilledMidRun):
        _KillingRunner(spark, cfg, kill_after=2).run(pages)

    partial = ExtractionRunner(spark, cfg)
    done = partial.committed_chunks()
    assert len(done) == 2

    # rerun with a plain runner at the default concurrency: must process
    # ONLY the remaining chunks, overlapping their jobs
    cfg_concurrent = RunConfig(
        run_id=cfg.run_id, output_path=out, num_chunks=6
    )
    stats = ExtractionRunner(spark, cfg_concurrent).run(pages)
    assert stats["chunks_skipped"] == 2
    assert stats["chunks_total"] == 6

    result = ExtractionRunner(spark, cfg).read_output()
    urls = [r.url for r in result.select("url").collect()]
    assert len(urls) == n_input
    assert len(set(urls)) == n_input  # exactly once
    assert result.filter(F.col("status") == "success").count() == n_input


def test_rerun_completed_job_is_noop(spark, tmp_path):
    out = str(tmp_path / "out")
    cfg = RunConfig(run_id="r-full", output_path=out, num_chunks=3)
    pages = synth_pages(spark, SF).limit(60)
    ExtractionRunner(spark, cfg).run(pages)
    stats = ExtractionRunner(spark, cfg).run(pages)
    assert stats["chunks_skipped"] == 3


def test_lineage_metrics_complete(spark, tmp_path):
    out = str(tmp_path / "out")
    cfg = RunConfig(run_id="r-met", output_path=out, num_chunks=4)
    pages = synth_pages(spark, SF)
    n_input = pages.count()
    ExtractionRunner(spark, cfg).run(pages)
    lin = spark.read.parquet(f"{out}/lineage")
    rows = lin.filter(F.col("run_id") == "r-met").collect()
    assert len(rows) == 4
    assert sum(r.url_count for r in rows) == n_input
    assert all(r.docs_per_sec > 0 for r in rows)
    assert all(dict(r.status_counts).get("success", 0) > 0 for r in rows)


def test_latest_crawl_dedup(spark):
    pages = synth_pages(spark, SF).limit(50)
    older = pages.withColumn(
        "warc_ts", F.col("warc_ts") - F.expr("INTERVAL 1 DAY")
    ).withColumn("html", F.lit(b"<html><body><p>stale</p></body></html>"))
    both = pages.unionByName(older)
    latest = dedup_latest_crawl(both)
    assert latest.count() == 50
    # every surviving row is the newer snapshot
    assert latest.filter(F.col("html") == F.lit(b"<html><body><p>stale</p></body></html>")).count() == 0
