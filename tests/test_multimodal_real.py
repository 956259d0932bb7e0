"""Real (pure-stdlib) multimodal codecs beyond PNG: WAV audio decode +
features, BMP image decode, box-filter resize with PNG re-encode, and
YUV4MPEG2 frame sampling.

Every crafted fixture below is written from the public format spec
(RIFF/WAVE, BITMAPINFOHEADER, yuv4mpeg(5)) with independent byte-level
packing, so the decoders are certified against the specs — not against
themselves.
"""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from halvesting_geometric_ray.functions.multimodal import (
    N_FEATURES, box_resize, decode_binary, decode_bmp, decode_png,
    decode_wav, encode_png, frame_sample, parse_y4m, resize_binary,
    wav_features)


# ---------------------------------------------------------------- WAV

def _wav_bytes(samples: np.ndarray, rate: int, bits: int = 16,
               audio_fmt: int = 1, extensible: bool = False,
               extra_chunk: bytes = b"") -> bytes:
    """Independent RIFF/WAVE writer.  `samples` is (n_frames, n_ch)
    float64 in [-1, 1]."""
    n_frames, n_ch = samples.shape
    if audio_fmt == 3:
        raw = samples.astype("<f4").tobytes()
        bits = 32
    elif bits == 16:
        raw = (np.clip(samples, -1, 1) * 32767.0).astype("<i2").tobytes()
    else:
        raw = ((np.clip(samples, -1, 1) * 127.0) + 128.0).astype(
            np.uint8).tobytes()
    block = n_ch * bits // 8
    if extensible:
        # 40-byte fmt: cbSize=22, validBits, mask, GUID(first 2 = fmt)
        fmt_body = struct.pack(
            "<HHIIHHHHI", 0xFFFE, n_ch, rate, rate * block, block, bits,
            22, bits, 0) + struct.pack("<H", audio_fmt) + b"\x00" * 14
    else:
        fmt_body = struct.pack("<HHIIHH", audio_fmt, n_ch, rate,
                               rate * block, block, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    if len(fmt_body) % 2:
        chunks += b"\x00"
    chunks += extra_chunk
    chunks += b"data" + struct.pack("<I", len(raw)) + raw
    if len(raw) % 2:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_wav_16bit_roundtrip_exact():
    rng = np.random.default_rng(7)
    x = rng.uniform(-0.9, 0.9, size=(480, 1))
    rate, n_ch, got = decode_wav(_wav_bytes(x, 8000, bits=16))
    assert (rate, n_ch) == (8000, 1)
    # bit-exact vs the writer's quantization replayed independently
    exp = (x * 32767.0).astype("<i2").astype(np.float64) / 32768.0
    np.testing.assert_array_equal(got, exp)
    assert np.abs(got - x).max() <= 2.0 / 32768.0


def test_wav_float32_stereo_exact():
    t = np.arange(600) / 16000.0
    x = np.stack([np.sin(2 * np.pi * 440 * t),
                  np.cos(2 * np.pi * 220 * t)], axis=1)
    rate, n_ch, got = decode_wav(_wav_bytes(x, 16000, audio_fmt=3))
    assert (rate, n_ch) == (16000, 2)
    np.testing.assert_allclose(got, x.astype(np.float32), rtol=0, atol=0)


def test_wav_8bit_and_skip_chunks():
    x = np.linspace(-1, 1, 64)[:, None]
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"  # pre-data chunk
    rate, n_ch, got = decode_wav(
        _wav_bytes(x, 44100, bits=8, extra_chunk=extra))
    assert rate == 44100 and got.shape == (64, 1)
    exp = (np.rint(np.clip(x, -1, 1) * 127.0)) / 128.0
    assert np.abs(got - exp).max() <= 1.0 / 128.0


def test_wav_extensible_header():
    x = np.zeros((32, 2))
    rate, n_ch, got = decode_wav(_wav_bytes(x, 22050, extensible=True))
    assert (rate, n_ch) == (22050, 2)
    np.testing.assert_array_equal(got, x)


def test_wav_rejects_garbage():
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxAVI LIST")
    with pytest.raises(ValueError):
        decode_wav(b"not audio at all")


def test_wav_features_against_numpy():
    """Features certified against a from-scratch numpy computation on a
    known sine: RMS ~ 1/sqrt(2), ZCR ~ 2f/rate, centroid at bin f."""
    rate, f0, n = 8000, 400, 8000
    t = np.arange(n) / rate
    x = np.sin(2 * np.pi * f0 * t)[:, None]
    feats = wav_features(rate, 1, x)
    assert feats.shape == (N_FEATURES,)
    assert abs(feats[1] - 1 / np.sqrt(2)) < 1e-3          # RMS
    assert abs(feats[2] - 2 * f0 / rate) < 2e-3           # ZCR
    # spectral centroid: bin f0 of rfft(n=8000) -> fraction f0/(n/2)
    assert abs(feats[3] - f0 / (n / 2)) < 2e-3
    assert feats[4] == pytest.approx(1.0)                 # duration s
    assert feats[5] == rate and feats[6] == 1.0


def test_decode_stage_real_wav_dims():
    """Actor-pool stage maps width <- n_frames, height <- n_channels."""
    x = np.zeros((300, 2))
    ds = rd.from_arrow(pa.table({
        "url": ["a"], "html": [_wav_bytes(x, 8000)]}))
    row = decode_binary(ds, mode="real", concurrency=1).take_all()[0]
    assert row["width"] == 300 and row["height"] == 2
    assert row["features"][5] == 8000.0


# ---------------------------------------------------------------- BMP

def _bmp24_bytes(px: np.ndarray, top_down: bool = False) -> bytes:
    """Independent 24-bit BI_RGB writer (padded rows, BGR order)."""
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[:, :, ::-1].reshape(h, w * 3)  # RGB -> BGR
    body = rows.tobytes() if top_down else rows[::-1].tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, -h if top_down else h, 1,
                       24, 0, len(body), 2835, 2835, 0, 0)
    off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    return hdr + info + body


def _bmp8_bytes(idx: np.ndarray, palette: np.ndarray) -> bytes:
    """8-bit palette BMP writer (BGRX palette quads)."""
    h, w = idx.shape
    stride = (w + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w] = idx
    body = rows[::-1].tobytes()
    n_pal = palette.shape[0]
    pal = np.zeros((n_pal, 4), dtype=np.uint8)
    pal[:, :3] = palette[:, ::-1]  # RGB -> BGR
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(body),
                       2835, 2835, n_pal, 0)
    off = 14 + 40 + n_pal * 4
    hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    return hdr + info + pal.tobytes() + body


def test_bmp24_exact_pixels():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    for td in (False, True):
        w, h, c, got = decode_bmp(_bmp24_bytes(px, top_down=td))
        assert (w, h, c) == (7, 5, 3)
        np.testing.assert_array_equal(got, px)


def test_bmp8_palette_exact():
    rng = np.random.default_rng(4)
    palette = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(6, 5), dtype=np.uint8)
    w, h, c, got = decode_bmp(_bmp8_bytes(idx, palette))
    assert (w, h, c) == (5, 6, 3)
    np.testing.assert_array_equal(got, palette[idx])


def test_bmp_rejects_compressed():
    bad = bytearray(_bmp24_bytes(np.zeros((2, 2, 3), dtype=np.uint8)))
    struct.pack_into("<I", bad, 30, 1)  # BI_RLE8
    with pytest.raises(ValueError):
        decode_bmp(bytes(bad))


def test_decode_stage_real_bmp():
    px = np.full((4, 6, 3), 200, dtype=np.uint8)
    ds = rd.from_arrow(pa.table({"url": ["b"],
                                 "html": [_bmp24_bytes(px)]}))
    row = decode_binary(ds, mode="real", concurrency=1).take_all()[0]
    assert row["width"] == 6 and row["height"] == 4
    assert row["features"][0] == pytest.approx(200 / 255.0)


# ------------------------------------------------------- resize (real)

def test_encode_decode_png_roundtrip():
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(9, 4, 3), dtype=np.uint8)
    w, h, c, got = decode_png(encode_png(px))
    assert (w, h, c) == (4, 9, 3)
    np.testing.assert_array_equal(got, px)


def test_box_resize_constant_and_mean():
    const = np.full((8, 8, 1), 99, dtype=np.uint8)
    np.testing.assert_array_equal(box_resize(const, 3, 5),
                                  np.full((5, 3, 1), 99))
    # 2x2 -> 1x1 is the exact mean
    q = np.array([[[10], [20]], [[30], [44]]], dtype=np.uint8)
    assert box_resize(q, 1, 1)[0, 0, 0] == 26  # rint(104/4)
    # upscale repeats by nearest index
    up = box_resize(np.array([[[1], [2]]], dtype=np.uint8), 4, 1)
    np.testing.assert_array_equal(up[0, :, 0], [1, 1, 2, 2])


def test_resize_stage_real_png_and_bmp():
    rng = np.random.default_rng(6)
    png_px = rng.integers(0, 256, size=(16, 12, 3), dtype=np.uint8)
    bmp_px = rng.integers(0, 256, size=(10, 10, 3), dtype=np.uint8)
    ds = rd.from_arrow(pa.table({
        "url": ["p", "b"],
        "html": [encode_png(png_px), _bmp24_bytes(bmp_px)]}))
    rows = {r["url"]: r for r in resize_binary(
        ds, out_w=4, out_h=4, mode="real", concurrency=1).take_all()}
    for key, src in (("p", png_px), ("b", bmp_px)):
        w, h, c, got = decode_png(rows[key]["resized"])
        assert (w, h, c) == (4, 4, 3)
        np.testing.assert_array_equal(got, box_resize(src, 4, 4))


def test_resize_stage_real_rejects_unknown():
    ds = rd.from_arrow(pa.table({"url": ["x"], "html": [b"JFIFnope"]}))
    with pytest.raises(Exception):  # NotImplementedError via Ray task
        resize_binary(ds, mode="real", concurrency=1).take_all()


# ------------------------------------------------------------- y4m

def _y4m_bytes(frames, w, h, chroma=b"C420jpeg") -> bytes:
    head = b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 %s" % (w, h, chroma)
    out = head + b"\n"
    for f in frames:
        out += b"FRAME\n" + f
    return out


def test_parse_y4m_exact_frames():
    w, h = 4, 2
    fsize = (w * h * 3) // 2
    frames = [bytes([i]) * fsize for i in range(5)]
    gw, gh, chroma, header, got = parse_y4m(_y4m_bytes(frames, w, h))
    assert (gw, gh) == (w, h) and chroma == "420jpeg"
    assert got == frames


def test_parse_y4m_mono_and_truncated():
    w, h = 3, 3
    frames = [bytes(range(9))]
    gw, gh, chroma, _, got = parse_y4m(
        _y4m_bytes(frames, w, h, chroma=b"Cmono"))
    assert chroma == "mono" and got == frames
    with pytest.raises(ValueError):
        parse_y4m(_y4m_bytes(frames, w, h, chroma=b"Cmono")[:-2])


def test_frame_sample_real_even_spacing_and_rewrap():
    w, h = 2, 2
    fsize = (w * h * 3) // 2
    frames = [bytes([i]) * fsize for i in range(10)]
    ds = rd.from_arrow(pa.table({
        "url": ["v"], "html": [_y4m_bytes(frames, w, h)]}))
    rows = sorted(frame_sample(ds, n_frames=4, mode="real",
                               concurrency=1).take_all(),
                  key=lambda r: r["frame_idx"])
    # evenly spaced ORIGINAL indices: (k*10)//4 for k in 0..3
    assert [r["frame_idx"] for r in rows] == [0, 2, 5, 7]
    for r in rows:
        # each emitted frame re-parses as a single-frame y4m
        gw, gh, _, _, fr = parse_y4m(r["frame"])
        assert (gw, gh) == (w, h) and fr == [frames[r["frame_idx"]]]


def test_frame_sample_real_fewer_frames_than_requested():
    w, h = 2, 2
    fsize = (w * h * 3) // 2
    frames = [b"\x07" * fsize]
    ds = rd.from_arrow(pa.table({
        "url": ["v"], "html": [_y4m_bytes(frames, w, h)]}))
    rows = frame_sample(ds, n_frames=4, mode="real",
                        concurrency=1).take_all()
    assert len(rows) == 1 and rows[0]["frame_idx"] == 0


# ---------------------------------------------------- motion features

def test_motion_energy_matches_numpy_oracle():
    from halvesting_geometric_ray.functions.multimodal import motion_energy

    rng = np.random.default_rng(7)
    w, h, n = 6, 4, 5
    fsize = (w * h * 3) // 2
    frames = [rng.integers(0, 256, fsize, dtype=np.uint8).tobytes()
              for _ in range(n)]
    got = motion_energy(frames, w, h)
    # independent oracle: luma-plane-only mean abs diff
    luma = np.stack([np.frombuffer(f[:w * h], dtype=np.uint8)
                     for f in frames]).astype(np.float64)
    want = np.abs(luma[1:] - luma[:-1]).mean(axis=1)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)
    assert motion_energy(frames[:1], w, h).shape == (0,)


def test_motion_stage_real_cuts_and_chroma_invariance():
    from halvesting_geometric_ray.functions.multimodal import motion_features

    w, h = 4, 2
    wh, fsize = w * h, (w * h * 3) // 2
    # static: constant luma, chroma planes that CHANGE between frames —
    # motion must stay 0 (luma-only measure)
    static = [b"\x40" * wh + bytes([i]) * (fsize - wh) for i in range(4)]
    # hard cut: black -> black -> white -> white (one 255-energy cut)
    cut = [lv * wh + b"\x00" * (fsize - wh)
           for lv in (b"\x00", b"\x00", b"\xff", b"\xff")]
    ds = rd.from_arrow(pa.table({
        "url": ["static", "cut"],
        "html": [_y4m_bytes(static, w, h), _y4m_bytes(cut, w, h)]}))
    rows = {r["url"]: r for r in motion_features(
        ds, mode="real", concurrency=1).take_all()}
    s, c = rows["static"], rows["cut"]
    assert s["n_frames"] == 4 and s["mean_motion"] == 0.0 \
        and s["max_motion"] == 0.0 and s["n_cuts"] == 0
    assert c["n_frames"] == 4 and c["max_motion"] == 255.0 \
        and c["n_cuts"] == 1
    np.testing.assert_allclose(c["mean_motion"], 255.0 / 3)


def test_motion_stage_single_frame_and_fake_oracle():
    from halvesting_geometric_ray.functions.multimodal import motion_features

    one = _y4m_bytes([b"\x10" * 6], 3, 2, chroma=b"Cmono")
    ds = rd.from_arrow(pa.table({"url": ["one"], "html": [one]}))
    r = motion_features(ds, mode="real", concurrency=1).take_all()[0]
    assert r["n_frames"] == 1 and r["mean_motion"] == 0.0 \
        and r["n_cuts"] == 0

    payload = bytes(range(16))  # fake mode: 4 chunks of 4 bytes
    ds = rd.from_arrow(pa.table({"url": ["f"], "html": [payload]}))
    r = motion_features(ds, mode="fake", fake_frames=4,
                        concurrency=1).take_all()[0]
    chunks = np.frombuffer(payload, dtype=np.uint8).reshape(
        4, 4).astype(np.float64)
    want = np.abs(np.diff(chunks, axis=0)).mean(axis=1)
    assert r["n_frames"] == 4
    np.testing.assert_allclose(r["mean_motion"], want.mean())
    np.testing.assert_allclose(r["std_motion"], want.std())


# ------------------------------------------------- gate query parity

def test_q_audio_features_matches_closed_form():
    """The query's per-doc features match the closed-form sine
    expectations (parameters re-derived from doc_id independently)."""
    from halvesting_geometric_ray.queries_text import QUERIES

    rows = {r["doc_id"]: r
            for r in QUERIES["q_audio_features"](
                "/root/testdata/sf0.001").take_all()}
    assert len(rows) >= 300
    for d in (0, 7, 123, 499):
        r = rows[d]
        rate, f0 = 8000, 100 + d % 900
        n = 400 + (d * 7) % 400
        amp = 0.2 + (d % 5) * 0.15
        assert r["n_samples"] == n and r["n_channels"] == 1
        assert r["duration_s"] == pytest.approx(n / rate)
        # RMS of amp*sin over a non-integral number of cycles: compute
        # the exact quantized reference
        x = amp * np.sin(2 * np.pi * f0 * np.arange(n) / rate)
        q = (np.clip(x, -1, 1) * 32767.0).astype("<i2") / 32768.0
        assert r["rms"] == pytest.approx(np.sqrt((q ** 2).mean()),
                                         abs=1e-6)
        assert r["zcr"] == pytest.approx(
            (np.signbit(q[1:]) != np.signbit(q[:-1])).mean(), abs=1e-9)


def test_q_image_resize_matches_box_filter():
    """Resized means match an independent decode->box_resize replay."""
    from halvesting_geometric_ray.functions.multimodal import (
        box_resize)
    from halvesting_geometric_ray.queries_text import QUERIES

    rows = {r["doc_id"]: r
            for r in QUERIES["q_image_resize"](
                "/root/testdata/sf0.001").take_all()}
    for d in (0, 42, 310):
        h = 8 + d % 9
        w = 8 + (d // 9) % 9
        base = np.uint64(d) * np.uint64(2654435761)
        px = ((np.arange(h * w * 3, dtype=np.uint64) * np.uint64(31)
               + base) % np.uint64(256)).astype(np.uint8).reshape(h, w, 3)
        exp = box_resize(px, 8, 8).astype(np.float64).mean(
            axis=(0, 1)) / 255.0
        r = rows[d]
        assert (r["width"], r["height"]) == (8, 8)
        for i, k in enumerate(("mean_r", "mean_g", "mean_b")):
            assert r[k] == pytest.approx(exp[i], abs=1e-8)


def test_q_video_frames_sampling_and_luma():
    from halvesting_geometric_ray.queries_text import QUERIES

    rows = [r for r in QUERIES["q_video_frames"](
        "/root/testdata/sf0.001").take_all()]
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d in (0, 5, 499):
        got = sorted(by_doc[d], key=lambda r: r["frame_idx"])
        n_fr = 3 + d % 6
        exp_idx = [(k * n_fr) // 2 for k in range(2)]
        assert [r["frame_idx"] for r in got] == exp_idx
        for r in got:
            f = r["frame_idx"]
            exp = np.array([(d + 31 * f + i) % 256 for i in range(16)],
                           dtype=np.float64).mean()
            assert r["luma_mean"] == pytest.approx(exp, abs=1e-9)
