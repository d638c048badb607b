"""Animated-GIF codec (ops/gif.py): LZW both ways + container structure."""

from __future__ import annotations

import random
import struct

import pytest

from docling_spark.ops.gif import decode_gif, encode_gif, lzw_decode, lzw_encode


@pytest.mark.parametrize("min_code", [2, 4, 8])
def test_lzw_roundtrip_random(min_code):
    rng = random.Random(min_code)
    hi = 1 << min_code
    data = bytes(rng.randrange(hi) for _ in range(4000))
    assert lzw_decode(lzw_encode(data, min_code), min_code) == data


def test_lzw_table_reset_at_4096():
    # highly diverse data forces the dictionary past 4096 -> clear+rebuild
    rng = random.Random(99)
    data = bytes(rng.randrange(256) for _ in range(30000))
    assert lzw_decode(lzw_encode(data, 8), 8) == data


def test_lzw_kwkwk_case():
    # repetitive run triggers the code==len(table) branch
    data = b"\x01" * 500
    assert lzw_decode(lzw_encode(data, 8), 8) == data


def test_gif_roundtrip_multiframe():
    w, h = 21, 7
    frames = [
        bytes((k * 31 + x + y) % 256 for y in range(h) for x in range(w))
        for k in range(5)
    ]
    raw = encode_gif(frames, w, h)
    dw, dh, df, gct = decode_gif(raw)
    assert (dw, dh) == (w, h)
    assert df == frames
    assert len(gct) == 768
    assert raw[-1:] == b"\x3b"


def test_gif_large_frame_splits_sub_blocks():
    # > 255 compressed bytes forces multiple data sub-blocks
    w, h = 64, 32
    rng = random.Random(5)
    frame = bytes(rng.randrange(256) for _ in range(w * h))
    raw = encode_gif([frame], w, h)
    _, _, df, _ = decode_gif(raw)
    assert df == [frame]


def test_gif_positioned_frame_composites():
    """A frame smaller than the screen composites onto the previous one
    (do-not-dispose animation semantics)."""
    base = encode_gif([bytes([7]) * 12], 4, 3)
    # hand-build a second frame: 2x1 patch at (1,1) with value 9
    patch_idx = bytes([9, 9])
    from docling_spark.ops.gif import _sub_blocks

    img = (
        b"\x2c"
        + struct.pack("<HHHHB", 1, 1, 2, 1, 0)
        + bytes([8])
        + _sub_blocks(lzw_encode(patch_idx, 8))
    )
    raw = base[:-1] + img + b"\x3b"
    _, _, frames, _ = decode_gif(raw)
    assert len(frames) == 2
    expect = bytearray(bytes([7]) * 12)
    expect[4 * 1 + 1 : 4 * 1 + 3] = b"\x99"[:1] * 0 + bytes([9, 9])
    assert frames[1] == bytes(expect)


def test_gif_rejects_garbage():
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF")
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + struct.pack("<HHBBB", 2, 2, 0, 0, 0) + b"\x99")


def test_video_gif_matches_fvid_law():
    """The real-GIF sampler and the FVID fake yield identical rows."""
    from docling_spark.ops.multimodal import (
        _vid_params,
        make_video,
        make_video_gif,
    )

    for doc_id in (0, 3, 17, 250):
        nframes, fw, fh = _vid_params(doc_id)
        raw = make_video_gif(doc_id)
        w, h, frames, _ = decode_gif(raw)
        assert (w, h, len(frames)) == (fw, fh, nframes)
        for k, f in enumerate(frames):
            assert len(f) == fw * fh
            assert f[0] == (doc_id + k) % 256
