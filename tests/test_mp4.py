"""ISO-BMFF container tests: ops/mp4.py builder + parser."""

import struct

import pytest

from docling_spark.ops.mp4 import _box, build_mp4, parse_mp4


def test_law_roundtrip_exhaustive():
    for i in range(0, 300):
        m = parse_mp4(build_mp4(i))
        assert m["timescale"] == 600
        assert m["duration_ms"] == (600 * (3 + i % 27) + i % 7) * 1000 // 600
        assert m["width"] == 160 + 16 * (i % 20)
        assert m["height"] == 120 + 16 * (i % 15)
        assert m["n_tracks"] == 1 + i % 2
        assert m["brand"] == ["isom", "mp42", "avc1"][i % 3]


def test_version1_64bit_times():
    # doc_id % 5 == 0 builds version-1 mvhd/tkhd
    m = parse_mp4(build_mp4(5))
    assert m["duration_ms"] == (600 * (3 + 5 % 27) + 5) * 1000 // 600


def test_largesize_mdat_parses():
    blob = build_mp4(11)  # doc_id % 11 == 0 -> largesize mdat
    assert struct.pack(">I", 1) in blob  # the largesize marker exists
    assert parse_mp4(blob)["n_tracks"] == 2


def test_size_zero_box_extends_to_eof():
    blob = build_mp4(2)
    # rewrite the trailing mdat header to size=0 (extends to EOF)
    idx = blob.rindex(b"mdat") - 4
    blob = blob[:idx] + struct.pack(">I", 0) + blob[idx + 4 :]
    assert parse_mp4(blob)["brand"] == "avc1"


def test_unknown_boxes_skipped():
    blob = build_mp4(3)
    blob = _box(b"xxxx", b"junkjunk") + blob + _box(b"yyyy", b"")
    assert parse_mp4(blob)["width"] == 160 + 16 * 3


def test_rejects_non_bmff():
    for bad in (b"", b"RIFF0000WAVE", b"\x89PNG\r\n\x1a\n", b"A" * 64):
        with pytest.raises(ValueError):
            parse_mp4(bad)


def test_rejects_truncated_moov():
    blob = build_mp4(7)
    with pytest.raises(ValueError):
        parse_mp4(blob[: len(blob) // 3] )


def test_fuzz_no_hangs_or_crashes():
    """Seeded byte fuzz: parse must either return or raise ValueError/
    struct.error — never hang or throw anything else."""
    import hashlib

    for seed in range(200):
        blob = hashlib.md5(f"fuzz:{seed}".encode()).digest() * (seed % 7 + 1)
        try:
            parse_mp4(blob)
        except (ValueError, struct.error):
            pass
    # structured fuzz: valid container with corrupted interior bytes
    base = bytearray(build_mp4(42))
    for pos in range(0, len(base), 13):
        mut = bytearray(base)
        mut[pos] ^= 0xFF
        try:
            parse_mp4(bytes(mut))
        except (ValueError, struct.error):
            pass


# ----------------------------------------------- round-5 PCM sample decode
def test_pcm_roundtrip_exact():
    """build_mp4_pcm → extract_pcm_mp4 recovers every sample exactly
    (two-chunk stco/stsc layout, big-endian 'twos')."""
    import numpy as np

    from docling_spark.ops.mp4 import build_mp4_pcm, extract_pcm_mp4

    for d in (0, 1, 13, 63, 64, 255):
        r = extract_pcm_mp4(build_mp4_pcm(d))
        n = 64 + d % 64
        assert (r["rate"], r["channels"], r["n_samples"]) == (8000, 1, n)
        got = np.frombuffer(r["samples"], dtype=np.int16)
        want = np.array(
            [((d * 31 + i * 7) % 65536) - 32768 for i in range(n)],
            dtype=np.int16,
        )
        assert np.array_equal(got, want)


def test_pcm_sowt_little_endian_variant():
    """'sowt' (little-endian) stsd entries decode identically — byte order
    is normalized to host order."""
    import numpy as np

    from docling_spark.ops.mp4 import build_mp4_pcm, extract_pcm_mp4

    blob = build_mp4_pcm(5)
    # rewrite the stsd format and byteswap the mdat payload
    i = blob.index(b"twos")
    swapped = bytearray(blob)
    swapped[i : i + 4] = b"sowt"
    j = blob.index(b"mdat") + 4
    pcm = np.frombuffer(blob[j:], dtype=">i2").astype("<i2")
    swapped[j:] = pcm.tobytes()
    a = extract_pcm_mp4(bytes(blob))
    b = extract_pcm_mp4(bytes(swapped))
    assert a["samples"] == b["samples"]


def test_compressed_codec_raises_clean_seam_error():
    from docling_spark.ops.mp4 import build_mp4_pcm, extract_pcm_mp4

    blob = bytearray(build_mp4_pcm(3))
    i = blob.index(b"twos")
    blob[i : i + 4] = b"mp4a"
    try:
        extract_pcm_mp4(bytes(blob))
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "seam" in str(e)


def test_pcm_parser_survives_fuzz():
    """Truncated/bit-flipped PCM containers raise ValueError or decode —
    never hang or throw unexpected exception types."""
    import hashlib
    import struct as _struct

    from docling_spark.ops.mp4 import build_mp4_pcm, extract_pcm_mp4

    base = build_mp4_pcm(9)
    for cut in (0, 7, 20, 60, len(base) // 2, len(base) - 3):
        try:
            extract_pcm_mp4(base[:cut])
        except (ValueError, _struct.error, IndexError):
            pass
    for seed in range(24):
        h = hashlib.md5(f"fuzz{seed}".encode()).digest()
        pos = int.from_bytes(h[:4], "big") % len(base)
        flipped = bytearray(base)
        flipped[pos] ^= h[4] or 1
        try:
            extract_pcm_mp4(bytes(flipped))
        except (ValueError, _struct.error, IndexError):
            pass
