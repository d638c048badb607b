"""RIFF/WAVE container parse (ops/multimodal.parse_wav) — stdlib-verified."""

from __future__ import annotations

import io
import struct
import wave

import pytest

from docling_spark.ops.multimodal import _aud_params, make_wav, parse_wav


@pytest.mark.parametrize("doc_id", [0, 1, 2, 7, 50, 96, 191])
def test_roundtrip_matches_params_and_stdlib(doc_id):
    blob = make_wav(doc_id)
    rate, ch, bits, n = parse_wav(blob)
    want_rate, want_n = _aud_params(doc_id)
    assert (rate, ch, bits, n) == (want_rate, 1, 16, want_n)
    # cross-check the container against the stdlib wave module
    w = wave.open(io.BytesIO(blob))
    assert w.getframerate() == rate
    assert w.getnframes() == n
    assert w.getnchannels() == 1 and w.getsampwidth() == 2


def test_extra_chunks_skipped():
    """RIFF walk must skip unknown chunks (LIST/INFO metadata is common)."""
    blob = bytearray(make_wav(3))
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    # splice the extra chunk between fmt and data
    insert_at = 12 + 8 + 16
    patched = bytes(blob[:insert_at]) + extra + bytes(blob[insert_at:])
    patched = b"RIFF" + struct.pack("<I", len(patched) - 8) + patched[8:]
    assert parse_wav(patched) == parse_wav(bytes(blob))


def test_odd_sized_chunk_word_alignment():
    """Chunks pad to even sizes; the walker must honor the pad byte."""
    odd = b"junk" + struct.pack("<I", 3) + b"abc\x00"  # 3 bytes + pad
    base = make_wav(5)
    patched = base[:12] + odd + base[12:]
    patched = b"RIFF" + struct.pack("<I", len(patched) - 8) + patched[8:]
    assert parse_wav(patched) == parse_wav(base)


@pytest.mark.parametrize(
    "blob", [b"", b"RIFFxxxx", b"RIFF\x00\x00\x00\x00WAVE", b"FAUD1234"]
)
def test_garbage_rejected(blob):
    with pytest.raises(ValueError):
        parse_wav(blob)


def test_audio_features_law():
    """audio_features' per-blob math (mean/peak/RMS over the PCM16
    payload) matches a direct stdlib computation of the sample law
    s_i = ((doc_id*7 + i) % 2001) - 1000 — including the chunk walk that
    must not be fooled by b"data" occurring inside sample bytes."""
    import math

    import pandas as pd

    from docling_spark.ops.multimodal import audio_features

    run = None

    class _Fake:
        def select(self, *cols):
            return self

        def mapInPandas(self, fn, schema):
            nonlocal run
            run = fn
            return self

    audio_features(_Fake(), col="wav")
    for doc_id in (0, 7, 17, 96):
        blob = make_wav(doc_id)
        out = next(run(iter([pd.DataFrame({"doc_id": [doc_id], "wav": [blob]})])))
        _rate, n = _aud_params(doc_id)
        s = [((doc_id * 7 + i) % 2001) - 1000 for i in range(n)]
        assert out.loc[0, "mean_amp"] == sum(s) / n
        assert out.loc[0, "peak"] == max(abs(v) for v in s)
        assert out.loc[0, "rms"] == round(math.sqrt(sum(v * v for v in s) / n), 6)
