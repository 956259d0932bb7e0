"""Pure-stdlib PNG decode: exact pixel recovery across every scanline
filter type and supported color type, plus the mode="real" actor-pool
decode stage end-to-end.

The reference encoder below is written from the PNG spec (RFC 2083):
per-scanline filtering (types 0-4), zlib-compressed IDAT, CRC-stamped
chunks — so the decoder is certified against an independent
implementation of the same spec, not against itself.
"""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from halvesting_geometric_ray.functions.multimodal import (
    N_FEATURES, decode_binary, decode_png, png_features)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))


def _filter_line(ft, line, prev, bpp):
    """Apply (forward) PNG filter `ft` to one scanline."""
    n = line.size
    out = np.zeros(n, dtype=np.int32)
    for x in range(n):
        a = int(line[x - bpp]) if x >= bpp else 0
        b = int(prev[x])
        c = int(prev[x - bpp]) if x >= bpp else 0
        if ft == 0:
            pred = 0
        elif ft == 1:
            pred = a
        elif ft == 2:
            pred = b
        elif ft == 3:
            pred = (a + b) >> 1
        else:
            p = a + b - c
            pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa_ <= pb and pa_ <= pc) else \
                (b if pb <= pc else c)
        out[x] = (int(line[x]) - pred) & 0xFF
    return out.astype(np.uint8)


def encode_png(px: np.ndarray, color: int, filters=None,
               palette: np.ndarray = None) -> bytes:
    """Minimal spec-following PNG encoder for tests: bit depth 8, no
    interlace.  `px` is (h, w, samples) uint8 (samples = raw samples,
    i.e. palette INDICES for color type 3).  `filters` assigns a filter
    type per scanline (default: cycle 0..4)."""
    h, w, samples = px.shape
    stride = w * samples
    filters = list(filters) if filters is not None else \
        [y % 5 for y in range(h)]
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.uint8)
    flat = px.reshape(h, stride)
    for y in range(h):
        ft = filters[y]
        raw.append(ft)
        raw.extend(_filter_line(ft, flat[y], prev, samples).tobytes())
        prev = flat[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if color == 3:
        out += _chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    body = zlib.compress(bytes(raw))
    # split IDAT in two to exercise multi-chunk reassembly
    mid = max(1, len(body) // 2)
    out += _chunk(b"IDAT", body[:mid]) + _chunk(b"IDAT", body[mid:])
    out += _chunk(b"IEND", b"")
    return out


@pytest.mark.parametrize("color,samples", [(0, 1), (2, 3), (4, 2),
                                           (6, 4)])
def test_decode_exact_all_filters(color, samples):
    rng = np.random.default_rng(color)
    px = rng.integers(0, 256, size=(11, 7, samples), dtype=np.uint8)
    # 11 rows cycle through filters 0..4 twice + one more
    data = encode_png(px, color)
    w, h, c, got = decode_png(data)
    assert (w, h, c) == (7, 11, samples)
    np.testing.assert_array_equal(got, px)


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_decode_exact_single_filter(ft):
    rng = np.random.default_rng(ft + 10)
    px = rng.integers(0, 256, size=(6, 9, 3), dtype=np.uint8)
    data = encode_png(px, 2, filters=[ft] * 6)
    _, _, _, got = decode_png(data)
    np.testing.assert_array_equal(got, px)


def test_decode_palette():
    rng = np.random.default_rng(3)
    palette = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(5, 8, 1), dtype=np.uint8)
    data = encode_png(idx, 3, palette=palette)
    w, h, c, got = decode_png(data)
    assert (w, h, c) == (8, 5, 3)
    np.testing.assert_array_equal(got, palette[idx[:, :, 0]])


def test_decode_rejects():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF....")
    # 16-bit depth unsupported
    px = np.zeros((2, 2, 1), dtype=np.uint8)
    data = bytearray(encode_png(px, 0))
    data[24] = 16  # IHDR bit-depth byte
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(bytes(data))


def test_png_features_oracle():
    px = np.zeros((4, 4, 2), dtype=np.uint8)
    px[:, :, 0] = 255   # gray channel saturated
    px[:, :, 1] = 0     # alpha zero
    f = png_features(px)
    assert f[0] == 1.0 and f[1] == 0.0
    assert f[4] == 0.5                      # half the samples > 127
    assert f[5] == pytest.approx(0.5)       # std of {0,255}/255
    assert f[6] == 2.0 and f[7] == 0.0
    assert f.shape == (N_FEATURES,)


def test_decode_stage_real_end_to_end(ray_session):
    rng = np.random.default_rng(42)
    imgs = [rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            for h, w in [(5, 6), (12, 3), (1, 1)]]
    payloads = [encode_png(px, 2) for px in imgs]
    t = pa.table({"url": pa.array(["a", "b", "c"]),
                  "html": pa.array(payloads, type=pa.binary())})
    out = decode_binary(rd.from_arrow(t), mode="real",
                        concurrency=(1, 2)).to_pandas().set_index("url")
    for key, px in zip(["a", "b", "c"], imgs):
        assert out.loc[key, "width"] == px.shape[1]
        assert out.loc[key, "height"] == px.shape[0]
        np.testing.assert_allclose(
            np.asarray(out.loc[key, "features"]), png_features(px),
            rtol=0, atol=0)
