"""Header-only media_meta vs the real decoders: dims must agree
WITHOUT decoding (the 10^9-image triage pass)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from halvesting_geometric_ray.functions.multimodal import (
    decode_bmp, decode_gif, decode_jpeg, decode_png, decode_wav,
    encode_png, encode_wav, encode_y4m, media_meta, media_metadata)


def test_png_header_matches_decode():
    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, (13, 21, 3), dtype=np.uint8)
    data = encode_png(px)
    m = media_meta(data)
    w, h, c, _ = decode_png(data)
    assert (m["format"], m["width"], m["height"]) == ("png", w, h)
    assert m["n_components"] == 3 and not m["progressive"]


def test_jpeg_header_baseline_and_progressive():
    from tests.test_jpeg import Q1, encode_jpeg, encode_jpeg_progressive

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (17, 23), dtype=np.uint8)
    b = encode_jpeg(img, Q1)
    p = encode_jpeg_progressive(img, Q1)
    mb, mp = media_meta(b), media_meta(p)
    assert mb["format"] == mp["format"] == "jpeg"
    assert (mb["width"], mb["height"]) == (23, 17)
    assert (mp["width"], mp["height"]) == (23, 17)
    assert not mb["progressive"] and mp["progressive"]
    # header agrees with the full decode
    w, h, c, _ = decode_jpeg(p)
    assert (mp["width"], mp["height"], mp["n_components"]) == (w, h, c)


def test_wav_y4m_and_unknown():
    rng = np.random.default_rng(3)
    samples = rng.integers(-1000, 1000, (50, 2)).astype(np.int16)
    wav = encode_wav(samples, 8000)
    m = media_meta(wav)
    rate, n_ch, dec = decode_wav(wav)
    assert (m["format"], m["width"], m["height"]) == (
        "wav", dec.shape[0], n_ch)
    frames = [bytes([100] * 24)]
    y4m = encode_y4m(frames, 6, 4)
    m = media_meta(y4m)
    assert (m["format"], m["width"], m["height"]) == ("y4m", 6, 4)
    m = media_meta(b"\x00\x01garbage")
    assert m["format"] == "unknown" and m["width"] == -1
    # recognized-but-truncated: format set, dims -1, no crash
    m = media_meta(b"\xff\xd8\xff")
    assert m["format"] == "jpeg" and m["width"] == -1


def test_media_metadata_stage(ray_session):
    from tests.test_jpeg import Q1, encode_jpeg

    rng = np.random.default_rng(4)
    rows = [
        {"url": "a", "html": encode_png(
            rng.integers(0, 256, (8, 9, 3), dtype=np.uint8))},
        {"url": "b", "html": encode_jpeg(
            rng.integers(0, 256, (10, 12), dtype=np.uint8), Q1)},
        {"url": "c", "html": b"junk"},
    ]
    out = media_metadata(rd.from_arrow(pa.Table.from_pylist(rows)),
                         batch_size=2).to_pandas()
    out = out.set_index("url")
    assert out.loc["a", "format"] == "png"
    assert (out.loc["a", "width"], out.loc["a", "height"]) == (9, 8)
    assert out.loc["b", "format"] == "jpeg"
    assert (out.loc["b", "width"], out.loc["b", "height"]) == (12, 10)
    assert out.loc["c", "format"] == "unknown"
    assert (out.n_bytes > 0).all()


def test_mp3_header_triage():
    # MPEG1 Layer III, 128 kbps, 44100 Hz, stereo — header-only
    # catalog metadata (no MP3 decoder in this container by design)
    frame = bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\x00" * 100
    m = media_meta(frame)
    assert m["format"] == "mp3"
    assert m["width"] == 44100          # sample rate
    assert m["height"] == 2             # channels
    assert m["n_components"] == 128     # kbps
    # ID3v2-tagged stream: skip the syncsafe tag, find the frame
    tag = b"ID3\x04\x00\x00\x00\x00\x00\x0a" + b"\x00" * 10
    m2 = media_meta(tag + frame)
    assert m2["format"] == "mp3" and m2["width"] == 44100
    # mono MPEG2, 22050 Hz
    f2 = bytes([0xFF, 0xF3, 0x90, 0xC0]) + b"\x00" * 10
    m3 = media_meta(f2)
    assert m3["format"] == "mp3"
    assert m3["width"] == 22050 and m3["height"] == 1
    # JPEG must NOT be swallowed by the MP3 sync check
    from tests.test_jpeg import Q1, encode_jpeg
    img = np.full((8, 8), 50, dtype=np.uint8)
    assert media_meta(encode_jpeg(img, Q1))["format"] == "jpeg"
