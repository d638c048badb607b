"""Audio fingerprint dedup (ops/audiofp): volume invariance through the
real WAV container, twin recovery, containment, and law parity."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import SparkSession

from docling_spark.ops.audiofp import (
    N_FRAMES,
    _aud_law_params,
    _fp_bits,
    audio_dup_pairs,
    audio_fingerprints,
    synth_audio_corpus,
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


def test_fp_volume_invariant():
    e = [100, 300, 250, 900, 50] + list(range(N_FRAMES - 5))
    assert _fp_bits(e) == _fp_bits([2 * v for v in e])


def test_volume_twins_recovered(spark):
    pairs = audio_dup_pairs(spark, SF).toPandas()
    n = spark.read.parquet(f"{SF}/documents.parquet").count()
    zero = {(r.id_a, r.id_b) for r in pairs[pairs.hamming == 0].itertuples()}
    missing = [i for i in range(0, n, 4) if (i, i + 600000) not in zero]
    assert missing == [], f"volume twins not recovered: {missing[:5]}"


def test_hash_matches_law(spark):
    """Spark container-parse→PCM→hash equals the pure law for a sample."""
    rows = {
        r["doc_id"]: (r["h_hi"], r["h_lo"])
        for r in audio_fingerprints(synth_audio_corpus(spark, SF))
        .filter("doc_id < 8")
        .collect()
    }
    for base in rows:
        a, bq, c, flen = _aud_law_params(base)
        energies = [
            sum(
                abs((a * (k * flen + j) ** 2 + bq * (k * flen + j) + c) % 2001 - 1000)
                for j in range(flen)
            )
            for k in range(N_FRAMES)
        ]
        bits = _fp_bits(energies)
        assert rows[base] == (bits >> 32, bits & 0xFFFFFFFF), base
    assert len(rows) == 8


def test_corrupt_containers_contained(spark):
    rows = [
        (1, b"RIFFxxxxWAVEfmt "),       # truncated
        (2, b"NOTAWAV"),                # wrong magic
        (3, b""),                       # empty
        (4, None),                      # null
        (5, b"RIFF" + struct.pack("<I", 4) + b"WAVE"),  # no data chunk
    ]
    df = spark.createDataFrame(rows, "doc_id long, wav binary")
    assert audio_fingerprints(df).count() == 0
