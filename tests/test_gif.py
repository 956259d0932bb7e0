"""GIF codec: variable-width LZW decode/encode, interlace,
transparency, local color tables, and the real decode/resize stage
wiring.

The encoder and decoder are written from the GIF89a specification
independently (the encoder emits CLEAR/EOI and grows code width by the
spec's rules; the decoder implements the KwKwK case and dictionary
reset), so a round-trip certifies both against the spec's shared
contract, and a hand-packed byte-level fixture certifies the decoder
against the spec alone.
"""

import struct

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from halvesting_geometric_ray.functions.multimodal import (
    decode_gif, encode_gif, decode_binary, resize_binary, decode_png)


def _rt(idx, pal, **kw):
    w, h, c, px = decode_gif(encode_gif(idx, pal, **kw))
    return w, h, c, px


# ------------------------------------------------------------ roundtrip

def test_roundtrip_small_palettes():
    rng = np.random.default_rng(0)
    for n in (2, 4, 16, 64, 256):
        pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
        idx = rng.integers(0, n, (13, 9), dtype=np.uint8)
        w, h, c, px = _rt(idx, pal)
        assert (w, h, c) == (9, 13, 3)
        np.testing.assert_array_equal(px, pal[idx])


def test_roundtrip_interlaced():
    rng = np.random.default_rng(1)
    pal = rng.integers(0, 256, (32, 3), dtype=np.uint8)
    for hgt in (1, 2, 3, 7, 8, 9, 33):  # pass-boundary heights
        idx = rng.integers(0, 32, (hgt, 5), dtype=np.uint8)
        w, h, c, px = _rt(idx, pal, interlace=True)
        np.testing.assert_array_equal(px, pal[idx])


def test_roundtrip_transparency_gives_alpha():
    pal = np.array([[255, 0, 0], [0, 255, 0]], dtype=np.uint8)
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    w, h, c, px = _rt(idx, pal, transparent=1)
    assert c == 4 and px.shape == (2, 2, 4)
    np.testing.assert_array_equal(px[:, :, 3],
                                  [[255, 0], [0, 255]])


def test_roundtrip_dict_overflow_clear_codes():
    # 300x300 with high entropy forces the 4096-entry dictionary to
    # overflow several times -> CLEAR emission + width reset paths
    rng = np.random.default_rng(2)
    pal = np.arange(768, dtype=np.uint8).reshape(256, 3)
    idx = rng.integers(0, 256, (300, 300), dtype=np.uint8)
    w, h, c, px = _rt(idx, pal)
    np.testing.assert_array_equal(px, pal[idx])


# ----------------------------------------------- spec-level byte fixture

def test_handpacked_2x2_gif_decodes():
    """A 2x2 2-color image packed by hand from the GIF89a spec:
    min code size 2, codes [CLEAR, 0, 1, 1, 0, EOI] with CLEAR=4,
    EOI=5.  After the third pixel code the dictionary holds 8 entries
    (roots 0-3 + CLEAR + EOI + two strings), so the code width grows
    from 3 to 4 bits mid-stream — the fixture packs exactly that,
    LSB-first."""
    codes = [(0b100, 3), (0b000, 3), (0b001, 3), (0b001, 3),
             (0b0000, 4), (0b0101, 4)]
    acc = n = 0
    data = bytearray()
    for cd, width in codes:
        acc |= cd << n
        n += width
        while n >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        data.append(acc & 0xFF)
    gif = bytearray(b"GIF89a")
    gif += struct.pack("<HHBBB", 2, 2, 0x80, 0, 0)  # GCT, 2 entries
    gif += bytes([10, 20, 30, 200, 210, 220])
    gif += b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
    gif += bytes([2, len(data)]) + bytes(data) + b"\x00\x3b"
    w, h, c, px = decode_gif(bytes(gif))
    assert (w, h, c) == (2, 2, 3)
    np.testing.assert_array_equal(
        px, np.array([[[10, 20, 30], [200, 210, 220]],
                      [[200, 210, 220], [10, 20, 30]]], dtype=np.uint8))


def test_local_color_table_overrides_global():
    pal_g = np.zeros((2, 3), dtype=np.uint8)
    pal_l = np.array([[9, 8, 7], [1, 2, 3]], dtype=np.uint8)
    idx = np.array([[0, 1]], dtype=np.uint8)
    base = encode_gif(idx, pal_l)
    # splice: keep encoder's GCT (pal_l), then rewrite to use a local
    # table instead: set LCT flag on the image descriptor
    # simpler: hand-assemble with GCT=pal_g and LCT=pal_l
    body = base[13 + 6:]  # after header+LSD+GCT(2*3)
    gif = bytearray(base[:13])
    gif[10] = 0x80  # GCT flag, 2 entries
    gif += pal_g.tobytes()
    # body starts at image descriptor (no extensions emitted w/o transp.)
    assert body[0] == 0x2C
    desc = bytearray(body[:10])
    desc[9] |= 0x80  # LCT flag, size bits already 0 -> 2 entries
    gif += desc + pal_l.tobytes() + body[10:]
    w, h, c, px = decode_gif(bytes(gif))
    np.testing.assert_array_equal(px, pal_l[idx])


def test_bad_inputs_raise():
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF....")
    with pytest.raises(ValueError):
        encode_gif(np.zeros((2, 2), dtype=np.uint8),
                   np.zeros((3, 3), dtype=np.uint8))  # non-power-of-two


# ------------------------------------------------------- stage wiring

def test_decode_stage_real_mode_handles_gif():
    rng = np.random.default_rng(4)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    rows = []
    for i in range(4):
        idx = rng.integers(0, 16, (6 + i, 5), dtype=np.uint8)
        rows.append({"url": f"g{i}", "blob": encode_gif(idx, pal)})
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = decode_binary(ds, id_col="url", payload_col="blob",
                        mode="real").to_pandas().sort_values("url")
    assert list(out["width"]) == [5, 5, 5, 5]
    assert list(out["height"]) == [6, 7, 8, 9]


def test_resize_stage_real_mode_gif_to_png():
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    idx = np.ones((16, 16), dtype=np.uint8)  # constant white
    ds = rd.from_arrow(pa.Table.from_pylist(
        [{"url": "g", "blob": encode_gif(idx, pal)}]))
    out = resize_binary(ds, id_col="url", payload_col="blob",
                        out_w=4, out_h=4, mode="real").to_pandas()
    w, h, c, px = decode_png(out["resized"].iloc[0])
    assert (w, h) == (4, 4)
    assert (px == 255).all()  # box filter exact on constant images
