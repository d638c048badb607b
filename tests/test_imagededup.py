"""Perceptual-hash image dedup (ops/imagededup): dHash brightness
invariance through the REAL PNG codec, twin recovery, corrupt-blob
containment, and the JVM-side pair-stage plan pin."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from docling_spark.ops.imagededup import (
    _dhash_bits,
    _img_dims,
    _law_px,
    dhash_images,
    dhash_near_dups,
    synth_phash_corpus,
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


def test_dhash_brightness_invariant():
    """A uniform non-wrapping brightness shift never changes the hash —
    the property that makes dHash a dedup key."""
    w, h = 24, 16
    px = [(13 * (x + 5) * (x + 5) + 5 * y) % 200 for y in range(h) for x in range(w)]
    shifted = [v + 40 for v in px]
    assert _dhash_bits(px, w, h) == _dhash_bits(shifted, w, h)
    assert 0 < _dhash_bits(px, w, h) < 1 << 64


def test_twins_recovered_through_real_codec(spark):
    """Every %5 brightness twin must appear as a hamming-0 pair with its
    base — decoded from real PNG bytes, not the law."""
    pairs = dhash_near_dups(
        dhash_images(synth_phash_corpus(spark, SF))
    ).toPandas()
    n = spark.read.parquet(f"{SF}/documents.parquet").count()
    found = {(r.id_a, r.id_b) for r in pairs[pairs.hamming == 0].itertuples()}
    missing = [
        i for i in range(0, n, 5) if (i, i + 500000) not in found
    ]
    assert missing == [], f"brightness twins not recovered: {missing[:5]}"


def test_hash_matches_law(spark):
    """Spark's decode→hash equals a pure-Python law derivation for a
    sample of docs (the cross-engine oracle does this corpus-wide)."""
    rows = {
        r["doc_id"]: (r["h_hi"], r["h_lo"])
        for r in dhash_images(synth_phash_corpus(spark, SF))
        .filter(F.col("doc_id") < 10)
        .collect()
    }
    for base in rows:
        w, h = _img_dims(base)
        px = [
            _law_px(base, x, y, False) for y in range(h) for x in range(w)
        ]
        bits = _dhash_bits(px, w, h)
        assert rows[base] == (bits >> 32, bits & 0xFFFFFFFF), base
    assert len(rows) == 10


def test_corrupt_blob_contained(spark):
    df = spark.createDataFrame(
        [(1, b"\x89PNG\r\n\x1a\nGARBAGE"), (2, b""), (3, None)],
        "doc_id long, png binary",
    )
    assert dhash_images(df).count() == 0  # no rows, no task failure


def test_pair_stage_is_jvm_only(spark):
    hashes = dhash_images(synth_phash_corpus(spark, SF))
    plan = (
        dhash_near_dups(hashes)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the decode+hash Python stage is persisted so the self-join reads
    # the cache on both sides instead of re-running the codec; banding
    # join + hamming verify stay JVM-side
    assert "InMemoryTableScan" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
