"""Multimodal (binary-payload) column plumbing.

Images/audio/video are opaque ``binary`` columns with typed metadata.
The Ray-side machinery — schema, actor-pool stage shape, batch sizing,
output layout — is real and tested.  ``DecodeStage`` mode="real" now
REALLY decodes several formats with the pure-stdlib codecs below:

- PNG  (zlib inflate + per-scanline unfiltering, color types 0/2/3/4/6
  at bit depth 8),
- BMP  (BITMAPINFOHEADER, 8-bit palette and 24/32-bit BI_RGB,
  bottom-up or top-down rows),
- WAV  (RIFF/PCM 8/16-bit + IEEE-float32; features = amplitude stats,
  zero-crossing rate and FFT spectral centroid),
- JPEG (sequential AND progressive DCT, ITU-T T.81: Huffman entropy
  decode, dequantize, IDCT, chroma upsample, YCbCr->RGB; SOF0/SOF1/
  SOF2 — progressive spectral selection + successive approximation
  with EOBRUN — 1- or 3-component, arbitrary sampling factors,
  DRI/RSTn restarts — certified against independent spec-following
  baseline AND progressive encoders in tests/test_jpeg.py),
- GIF  (87a/89a variable-width LZW with CLEAR/EOI and dictionary
  reset, global/local color tables, interlace, transparency->alpha;
  round-trip + hand-packed spec fixtures in tests/test_gif.py),

plus audio ANALYSIS beyond decode: Hann STFT power spectrogram and
HTK mel filterbank features (``AudioMelStage`` — certified against a
direct O(n^2) DFT oracle in tests/test_audio.py),

and ``ResizeStage`` / ``FrameSampleStage`` mode="real" really resample
PNG/BMP/JPEG images (box-filter area average, re-encoded as PNG) and
really split YUV4MPEG2 (y4m) uncompressed video into per-frame
payloads.  MP3/H.264-class compressed codecs remain
NotImplementedError — absent from this container — and mode="fake"
remains the deterministic byte featurizer so those pipelines stay
end-to-end executable.

Batch-size guidance: payloads are large (100 KB-10 MB); size batches so
batch_size x concurrency x payload fits the worker heap (config
extract_batch_size discussion) — callers pass small batch_size here.
"""

from __future__ import annotations

import struct
import zlib
from typing import List, Tuple

import numpy as np
import pyarrow as pa

N_FEATURES = 8

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# samples per pixel by PNG color type (3 = palette indices, 1 sample)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_unfilter(raw: bytes, height: int, stride: int,
                  bpp: int) -> np.ndarray:
    """Reverse the PNG scanline filters (types 0-4: None/Sub/Up/
    Average/Paeth) over the inflated IDAT stream.  Returns the
    (height, stride) uint8 sample matrix.  Up/None vectorize across
    the row; Sub/Average/Paeth carry an intra-row dependency and run
    per-byte (fine for the bounded-size payloads a decode stage sees
    per batch)."""
    out = np.zeros((height, stride), dtype=np.uint8)
    buf = np.frombuffer(raw, dtype=np.uint8)
    if buf.size < height * (stride + 1):
        raise ValueError("PNG: truncated IDAT stream")
    pos = 0
    zero = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        ft = int(buf[pos])
        line = buf[pos + 1:pos + 1 + stride].astype(np.int32)
        pos += 1 + stride
        prev = out[y - 1].astype(np.int32) if y else zero
        if ft == 0:
            cur = line
        elif ft == 2:      # Up
            cur = (line + prev) & 0xFF
        elif ft == 1:      # Sub
            cur = line
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ft == 3:      # Average
            cur = line
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ft == 4:      # Paeth
            cur = line
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                c = int(prev[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else \
                    (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {ft}")
        out[y] = cur.astype(np.uint8)
    return out


def decode_png(data: bytes) -> Tuple[int, int, int, np.ndarray]:
    """Pure-stdlib PNG decode (zlib + struct + numpy): returns
    (width, height, channels, pixels[h, w, channels] uint8).

    Supports bit depth 8, no interlace, color types 0 (gray), 2 (RGB),
    3 (palette -> RGB), 4 (gray+alpha), 6 (RGBA) — the common subset;
    anything else raises ValueError.  This is the de-stubbed
    mode="real" decode path (the container has no image libraries;
    PNG needs none)."""
    if not data.startswith(PNG_SIG):
        raise ValueError("not a PNG (bad signature)")
    pos = len(PNG_SIG)
    ihdr = None
    idat = bytearray()
    plte = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG: missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"PNG: unsupported (depth={depth}, interlace={interlace})")
    if color not in _PNG_CHANNELS:
        raise ValueError(f"PNG: unsupported color type {color}")
    samples = _PNG_CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    mat = _png_unfilter(raw, h, w * samples, samples)
    px = mat.reshape(h, w, samples)
    if color == 3:
        if plte is None:
            raise ValueError("PNG: palette image without PLTE")
        px = plte[px[:, :, 0]]
        samples = 3
    return w, h, samples, px


def png_features(px: np.ndarray) -> np.ndarray:
    """Deterministic N_FEATURES-vector from decoded pixels: per-channel
    means / 255 (slots 0-3, zero-padded), fraction of samples > 127,
    population std / 255, channel count, and a reserved 0."""
    h, w, c = px.shape
    f = np.zeros(N_FEATURES, dtype=np.float64)
    flat = px.astype(np.float64)
    f[:c] = flat.mean(axis=(0, 1)) / 255.0  # c is 1..4 by construction
    f[4] = float((flat > 127).mean())
    f[5] = float(flat.std()) / 255.0
    f[6] = float(c)
    return f


def decode_bmp(data: bytes) -> Tuple[int, int, int, np.ndarray]:
    """Pure-stdlib BMP decode: returns (width, height, channels,
    pixels[h, w, channels] uint8, RGB order).

    Supports the BITMAPINFOHEADER (and the larger V4/V5 headers that
    embed it) with BI_RGB compression at 8 (palette), 24 and 32 bits
    per pixel, bottom-up (positive height) or top-down (negative)
    rows.  Rows are 4-byte aligned per the spec."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP (bad signature)")
    (data_off,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise ValueError(f"BMP: unsupported header size {hdr_size}")
    w, h_raw = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    (comp,) = struct.unpack_from("<I", data, 30)
    if comp != 0:  # BI_RGB only
        raise ValueError(f"BMP: unsupported compression {comp}")
    if bpp not in (8, 24, 32):
        raise ValueError(f"BMP: unsupported bit depth {bpp}")
    top_down = h_raw < 0
    h = abs(h_raw)
    if w <= 0 or h <= 0:
        raise ValueError("BMP: bad dimensions")
    stride = ((w * bpp // 8) + 3) & ~3
    need = data_off + stride * h
    if len(data) < need:
        raise ValueError("BMP: truncated pixel data")
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h,
                         offset=data_off).reshape(h, stride)
    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        # palette sits right after the info header: BGRX quads
        pal_off = 14 + hdr_size
        (used,) = struct.unpack_from("<I", data, 46)
        n_pal = used or 256
        pal = np.frombuffer(data, dtype=np.uint8, count=n_pal * 4,
                            offset=pal_off).reshape(n_pal, 4)
        idx = rows[:, :w]
        px = pal[idx][:, :, [2, 1, 0]]  # BGRX -> RGB
        return w, h, 3, np.ascontiguousarray(px)
    nch = bpp // 8
    px = rows[:, : w * nch].reshape(h, w, nch)
    if nch == 3:
        px = px[:, :, [2, 1, 0]]                 # BGR -> RGB
    else:
        px = px[:, :, [2, 1, 0, 3]]              # BGRA -> RGBA
    return w, h, nch, np.ascontiguousarray(px)


def decode_wav(data: bytes) -> Tuple[int, int, np.ndarray]:
    """Pure-stdlib WAV (RIFF/PCM) decode: returns (sample_rate,
    n_channels, samples[n_frames, n_channels] float64 in [-1, 1]).

    Supports format 1 (integer PCM, 8-bit unsigned / 16-bit signed)
    and format 3 (IEEE float32), plus WAVE_FORMAT_EXTENSIBLE (0xFFFE)
    wrapping either.  Chunks are walked generically (word-aligned), so
    LIST/fact/cue chunks before ``data`` are fine."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF/WAVE header)")
    pos, fmt, fmt_body, raw = 12, None, b"", None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            fmt_body = body
        elif cid == b"data":
            raw = body
    if fmt is None or raw is None:
        raise ValueError("WAV: missing fmt/data chunk")
    audio_fmt, n_ch, rate, _byte_rate, _align, bits = fmt
    if audio_fmt == 0xFFFE:  # EXTENSIBLE: real format leads the GUID
        if len(fmt_body) < 26:
            raise ValueError("WAV: truncated extensible fmt chunk")
        (audio_fmt,) = struct.unpack_from("<H", fmt_body, 24)
    if audio_fmt not in (1, 3):
        raise ValueError(f"WAV: unsupported audio format {audio_fmt}")
    if n_ch < 1 or rate <= 0:
        raise ValueError("WAV: bad fmt chunk")
    if audio_fmt == 3:
        if bits != 32:
            raise ValueError(f"WAV: float format needs 32 bits, got {bits}")
        x = np.frombuffer(raw, dtype="<f4").astype(np.float64)
    elif bits == 16:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 8:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
             - 128.0) / 128.0
    else:
        raise ValueError(f"WAV: unsupported bit depth {bits}")
    n_frames = x.size // n_ch
    return rate, n_ch, x[: n_frames * n_ch].reshape(n_frames, n_ch)


def wav_features(rate: int, n_ch: int, samples: np.ndarray) -> np.ndarray:
    """Deterministic N_FEATURES-vector from decoded PCM: mean |x|, RMS,
    zero-crossing rate, FFT spectral centroid (fraction of Nyquist),
    duration seconds, sample rate, channel count, and a reserved 0.
    Multi-channel audio is averaged to mono first."""
    f = np.zeros(N_FEATURES, dtype=np.float64)
    mono = samples.mean(axis=1) if samples.size else np.zeros(1)
    f[0] = float(np.abs(mono).mean())
    f[1] = float(np.sqrt((mono ** 2).mean()))
    if mono.size > 1:
        f[2] = float((np.signbit(mono[1:]) != np.signbit(mono[:-1])).mean())
        mag = np.abs(np.fft.rfft(mono))
        tot = mag.sum()
        if tot > 0:
            # centroid as fraction of Nyquist, in [0, 1]
            f[3] = float((mag * np.arange(mag.size)).sum()
                         / (tot * (mag.size - 1)))
    f[4] = samples.shape[0] / float(rate)
    f[5] = float(rate)
    f[6] = float(n_ch)
    return f


WAV_SIG = b"RIFF"
BMP_SIG = b"BM"
Y4M_SIG = b"YUV4MPEG2 "


def encode_png(px: np.ndarray) -> bytes:
    """Minimal PNG encoder (filter type 0 on every scanline, one zlib
    IDAT): inverse of ``decode_png`` for bit-depth-8 images.  Channel
    count picks the color type (1 gray, 2 gray+alpha, 3 RGB, 4 RGBA)."""
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(c)
    if color is None:
        raise ValueError(f"encode_png: bad channel count {c}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = np.concatenate(
        [np.concatenate(([0], row)) for row in
         px.astype(np.uint8).reshape(h, w * c)]).astype(np.uint8)
    idat = zlib.compress(raw.tobytes(), 6)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    return (PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Minimal 16-bit PCM RIFF/WAVE encoder — inverse of ``decode_wav``
    for integer PCM.  `samples` is (n_frames, n_channels) float in
    [-1, 1]."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n_ch = samples.shape[1]
    raw = (np.clip(samples, -1.0, 1.0) * 32767.0).astype("<i2").tobytes()
    block = n_ch * 2
    fmt_body = struct.pack("<HHIIHH", 1, n_ch, rate, rate * block,
                           block, 16)
    chunks = (b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
              + b"data" + struct.pack("<I", len(raw)) + raw)
    if len(raw) % 2:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def encode_y4m(frames, w: int, h: int, chroma: str = "mono") -> bytes:
    """Minimal YUV4MPEG2 encoder — inverse of ``parse_y4m``: a stream
    header plus FRAME-delimited raw planes."""
    out = bytearray(b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C%s\n"
                    % (w, h, chroma.encode()))
    for f in frames:
        out += b"FRAME\n" + f
    return bytes(out)


def _box_resize_axis(px: np.ndarray, out: int, axis: int) -> np.ndarray:
    """Resample one axis to length `out`: area-average (np.add.reduceat
    over integer bucket edges) when shrinking, nearest-index repeat when
    growing.  Deterministic; exact on constant images either way."""
    n = px.shape[axis]
    if out == n:
        return px
    if out < n:
        edges = (np.arange(out, dtype=np.int64) * n) // out
        sums = np.add.reduceat(px.astype(np.float64), edges, axis=axis)
        counts = np.diff(np.append(edges, n)).astype(np.float64)
        shape = [1] * px.ndim
        shape[axis] = out
        avg = sums / counts.reshape(shape)
        return np.clip(np.rint(avg), 0, 255).astype(np.uint8)
    idx = (np.arange(out, dtype=np.int64) * n) // out
    return np.take(px, idx, axis=axis)


def box_resize(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Box-filter resize of an (h, w, c) uint8 image to (out_h, out_w, c)."""
    return _box_resize_axis(_box_resize_axis(px, out_h, 0), out_w, 1)


def parse_y4m(data: bytes):
    """Parse a YUV4MPEG2 stream: returns (width, height, chroma,
    header:bytes, frames:list[bytes]) where each frame is the raw plane
    payload (no FRAME marker).  Supports the C420* / C422 / C444 / Cmono
    chroma taggings (frame size W*H * {1.5, 2, 3, 1})."""
    if not data.startswith(Y4M_SIG):
        raise ValueError("not a y4m stream (bad magic)")
    nl = data.index(b"\n")
    header = data[:nl]
    w = h = None
    chroma = "420jpeg"
    for tok in header.split(b" ")[1:]:
        if not tok:
            continue
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"C":
            chroma = val.decode()
    if not w or not h:
        raise ValueError("y4m: missing W/H in stream header")
    if chroma.startswith("420"):
        fsize = (w * h * 3) // 2
    elif chroma.startswith("422"):
        fsize = w * h * 2
    elif chroma.startswith("444"):
        fsize = w * h * 3
    elif chroma == "mono":
        fsize = w * h
    else:
        raise ValueError(f"y4m: unsupported chroma {chroma}")
    frames = []
    pos = nl + 1
    while pos < len(data):
        if not data.startswith(b"FRAME", pos):
            raise ValueError("y4m: bad FRAME marker")
        fnl = data.index(b"\n", pos)
        body = data[fnl + 1:fnl + 1 + fsize]
        if len(body) < fsize:
            raise ValueError("y4m: truncated frame")
        frames.append(body)
        pos = fnl + 1 + fsize
    return w, h, chroma, header, frames


class DecodeStage:
    """Actor-pool map_batches stage: (id, payload binary) ->
    (id, n_bytes, width, height, features list<float>).

    mode="fake": deterministic pseudo-decode — dimensions and features
    derived from the payload bytes (stable across runs).
    mode="real": PNG and BMP payloads decode for real (``decode_png`` /
    ``decode_bmp`` above); width/height come from the headers and
    features from the decoded pixels (``png_features``).  WAV payloads
    decode via ``decode_wav`` — width maps to n_frames, height to
    n_channels, features to ``wav_features`` (RMS/ZCR/spectral
    centroid/duration/rate).  Other formats raise NotImplementedError —
    JPEG/MP3/video codecs are absent from this container; drop a
    PIL/libsndfile decode into ``_decode_real`` with the same signature
    at deploy time.
    """

    def __init__(self, id_col: str = "url", payload_col: str = "html",
                 mode: str = "fake"):
        self.id_col = id_col
        self.payload_col = payload_col
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.mode = mode

    @staticmethod
    def _decode_real(p: bytes):
        """Real decode of one payload -> (width, height, features).
        PNG/BMP/WAV are handled in-process (pure stdlib codecs above);
        extend per format at deploy time.  Audio maps width <- n_frames
        and height <- n_channels so the output schema stays uniform."""
        if p.startswith(PNG_SIG):
            w, h, _, px = decode_png(p)
            return w, h, png_features(px)
        if p.startswith(BMP_SIG):
            w, h, _, px = decode_bmp(p)
            return w, h, png_features(px)
        if p.startswith(WAV_SIG) and p[8:12] == b"WAVE":
            rate, n_ch, samples = decode_wav(p)
            return samples.shape[0], n_ch, wav_features(rate, n_ch, samples)
        if p.startswith(JPEG_SIG):
            w, h, _, px = decode_jpeg(p)
            return w, h, png_features(px)
        if p[:6] in GIF_SIGS:
            w, h, _, px = decode_gif(p)
            return w, h, png_features(px)
        raise NotImplementedError(
            "real decode implemented for PNG/BMP/WAV/JPEG/GIF only in "
            "this container (no MP3/video codecs); use mode='fake' for "
            "other formats' plumbing tests")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads: List[bytes] = batch.column(self.payload_col).to_pylist()
        n = len(payloads)
        n_bytes = np.fromiter((len(p) for p in payloads), dtype=np.int64,
                              count=n)
        width = np.empty(n, dtype=np.int64)
        height = np.empty(n, dtype=np.int64)
        feats = np.empty((n, N_FEATURES), dtype=np.float64)
        if self.mode == "real":
            for i, p in enumerate(payloads):
                width[i], height[i], feats[i] = self._decode_real(p)
            return pa.table({
                self.id_col: batch.column(self.id_col),
                "n_bytes": pa.array(n_bytes),
                "width": pa.array(width),
                "height": pa.array(height),
                "features": pa.array(
                    list(feats), type=pa.list_(pa.float64(), N_FEATURES)),
            })
        for i, p in enumerate(payloads):
            h = np.frombuffer(p, dtype=np.uint8)
            width[i] = 16 + (int(h[: 64].sum()) % 1024) if h.size else 0
            height[i] = 16 + (int(h[-64:].sum()) % 1024) if h.size else 0
            # deterministic byte-histogram features
            hist = np.bincount(h % 8, minlength=N_FEATURES)[:N_FEATURES] \
                if h.size else np.zeros(N_FEATURES)
            feats[i] = hist / max(1, h.size)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "n_bytes": pa.array(n_bytes),
            "width": pa.array(width),
            "height": pa.array(height),
            "features": pa.array(list(feats),
                                 type=pa.list_(pa.float64(), N_FEATURES)),
        })


def decode_binary(ds, id_col: str = "url", payload_col: str = "html",
                  mode: str = "fake", batch_size: int = 256,
                  concurrency=(1, 8)):
    """The actor-pool decode/featurize stage over a binary column."""
    return ds.map_batches(
        DecodeStage, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency,
        fn_constructor_kwargs={"id_col": id_col, "payload_col": payload_col,
                               "mode": mode})


class ResizeStage:
    """(id, payload) -> (id, out_w, out_h, resized:binary).

    mode="fake": deterministic byte-grid subsample to out_w x out_h
    (stable across runs; output payload is exactly out_w*out_h bytes).
    mode="real": PNG/BMP payloads REALLY resample — decode, box-filter
    area average (``box_resize``), re-encode as PNG (``encode_png``) —
    pure stdlib; other formats raise NotImplementedError (their codecs
    are absent; a PIL/libvips resample drops in with this signature)."""

    def __init__(self, id_col: str = "url", payload_col: str = "html",
                 out_w: int = 32, out_h: int = 32, mode: str = "fake"):
        self.id_col = id_col
        self.payload_col = payload_col
        self.out_w = out_w
        self.out_h = out_h
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.mode = mode

    @staticmethod
    def _resize_real(p: bytes, out_w: int, out_h: int) -> bytes:
        if p.startswith(PNG_SIG):
            _, _, _, px = decode_png(p)
        elif p.startswith(BMP_SIG):
            _, _, _, px = decode_bmp(p)
        elif p.startswith(JPEG_SIG):
            _, _, _, px = decode_jpeg(p)
        elif p[:6] in GIF_SIGS:
            _, _, _, px = decode_gif(p)
        else:
            raise NotImplementedError(
                "real resample implemented for PNG/BMP/JPEG/GIF only in "
                "this container")
        return encode_png(box_resize(px, out_w, out_h))

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "real":
            out = [self._resize_real(p, self.out_w, self.out_h)
                   for p in batch.column(self.payload_col).to_pylist()]
            return pa.table({
                self.id_col: batch.column(self.id_col),
                "out_w": pa.array(np.full(batch.num_rows, self.out_w,
                                          dtype=np.int64)),
                "out_h": pa.array(np.full(batch.num_rows, self.out_h,
                                          dtype=np.int64)),
                "resized": pa.array(out, type=pa.binary()),
            })
        n_out = self.out_w * self.out_h
        out: List[bytes] = []
        for p in batch.column(self.payload_col).to_pylist():
            h = np.frombuffer(p, dtype=np.uint8)
            if h.size == 0:
                out.append(b"\x00" * n_out)
                continue
            idx = (np.arange(n_out, dtype=np.int64) * h.size) // n_out
            out.append(h[idx].tobytes())
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "out_w": pa.array(np.full(batch.num_rows, self.out_w,
                                      dtype=np.int64)),
            "out_h": pa.array(np.full(batch.num_rows, self.out_h,
                                      dtype=np.int64)),
            "resized": pa.array(out, type=pa.binary()),
        })


class FrameSampleStage:
    """Video-style frame sampling: (id, payload) -> one row PER FRAME
    (id, frame_idx, frame:binary) — the row-expanding stage shape
    (flat_map semantics via a batch fn returning more rows than it got).

    mode="fake": the payload is treated as n_frames equal-length chunks
    sampled at evenly spaced offsets.
    mode="real": YUV4MPEG2 (y4m) payloads REALLY split — ``parse_y4m``
    walks the uncompressed frame stream, n_frames are sampled at evenly
    spaced frame indices, and each output frame is re-wrapped as a
    self-contained single-frame y4m (stream header + FRAME + planes) so
    downstream stages can re-parse it; frame_idx is the ORIGINAL frame
    number.  Compressed containers (MP4/H.264) raise
    NotImplementedError — an ffmpeg/pyav keyframe sampler drops in with
    the same signature and output layout."""

    def __init__(self, id_col: str = "url", payload_col: str = "html",
                 n_frames: int = 4, mode: str = "fake"):
        self.id_col = id_col
        self.payload_col = payload_col
        self.n_frames = n_frames
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.mode = mode

    def _sample_real(self, p: bytes):
        """One y4m payload -> [(orig_frame_idx, single-frame y4m bytes)]."""
        if not p.startswith(Y4M_SIG):
            raise NotImplementedError(
                "real frame sampling implemented for y4m only in this "
                "container (no MP4/H.264 codecs)")
        _, _, _, header, frames = parse_y4m(p)
        n = len(frames)
        if n == 0:
            return []
        k = min(self.n_frames, n)
        picks = (np.arange(k, dtype=np.int64) * n) // k
        return [(int(i), header + b"\nFRAME\n" + frames[i]) for i in picks]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        if self.mode == "real":
            out_id, out_fi, out_fr = [], [], []
            for i, p in enumerate(
                    batch.column(self.payload_col).to_pylist()):
                for fi, fr in self._sample_real(p):
                    out_id.append(ids[i])
                    out_fi.append(fi)
                    out_fr.append(fr)
            return pa.table({
                self.id_col: pa.array(out_id,
                                      type=batch.column(self.id_col).type),
                "frame_idx": pa.array(out_fi, type=pa.int64()),
                "frame": pa.array(out_fr, type=pa.binary()),
            })
        out_id, out_fi, out_fr = [], [], []
        for i, p in enumerate(batch.column(self.payload_col).to_pylist()):
            size = len(p)
            k = min(self.n_frames, max(1, size))
            step = max(1, size // k)
            for f in range(k if size else 1):
                out_id.append(ids[i])
                out_fi.append(f)
                out_fr.append(p[f * step:(f + 1) * step] if size else b"")
        return pa.table({
            self.id_col: pa.array(out_id),
            "frame_idx": pa.array(out_fi, type=pa.int64()),
            "frame": pa.array(out_fr, type=pa.binary()),
        })


def resize_binary(ds, id_col: str = "url", payload_col: str = "html",
                  out_w: int = 32, out_h: int = 32, mode: str = "fake",
                  batch_size: int = 256, concurrency=(1, 8)):
    return ds.map_batches(
        ResizeStage, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency,
        fn_constructor_kwargs={"id_col": id_col, "payload_col": payload_col,
                               "out_w": out_w, "out_h": out_h, "mode": mode})


def frame_sample(ds, id_col: str = "url", payload_col: str = "html",
                 n_frames: int = 4, mode: str = "fake",
                 batch_size: int = 64, concurrency=(1, 8)):
    """Small batch_size: output is n_frames x input rows of binary
    payload — batch x concurrency x payload must fit the worker heap."""
    return ds.map_batches(
        FrameSampleStage, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency,
        fn_constructor_kwargs={"id_col": id_col, "payload_col": payload_col,
                               "n_frames": n_frames, "mode": mode})


def motion_energy(frames, w: int, h: int) -> np.ndarray:
    """Per-transition motion energy of a frame sequence: mean absolute
    luma difference per pixel between consecutive frames.  ``frames``
    are raw y4m plane payloads; only the first w*h bytes (the luma
    plane — the whole frame for Cmono) participate, so the measure is
    chroma-subsampling-invariant.  Returns a float64 array of length
    len(frames) - 1 (empty for 0/1-frame clips)."""
    n = len(frames)
    if n < 2:
        return np.zeros(0, dtype=np.float64)
    wh = w * h
    luma = np.stack([np.frombuffer(f, dtype=np.uint8, count=wh)
                     for f in frames]).astype(np.int16)
    return np.abs(np.diff(luma, axis=0)).mean(axis=1).astype(np.float64)


class MotionFeatureStage:
    """Actor-pool map_batches stage: (id, y4m payload) -> one row per
    clip with frame-difference motion features — the shot-boundary /
    static-clip signal a video curation pipeline filters on (drop
    still-image "videos", flag cut-heavy clips before frame sampling).

    mode="real": payloads are parsed with ``parse_y4m`` and per-
    transition energy is the mean |Y_t - Y_{t-1}| over the luma plane
    (``motion_energy``).  Compressed containers (MP4/H.264) raise
    NotImplementedError — a pyav decode drops in with the same
    signature.  mode="fake": the payload is treated as ``fake_frames``
    equal-length byte chunks (the FrameSampleStage fake convention)
    and the same diff math runs on the raw bytes, keeping the plumbing
    testable without codecs.

    Output per row: n_frames, mean_motion / max_motion / std_motion
    (per-pixel mean abs diff stats over transitions; 0.0 for <2
    frames), and n_cuts = transitions with energy > cut_threshold
    (hard-cut detector).  Scale shape: one row in, one row out, all
    math per-clip numpy — no exchange, payload never leaves the task."""

    def __init__(self, id_col: str = "url", payload_col: str = "html",
                 mode: str = "fake", cut_threshold: float = 48.0,
                 fake_frames: int = 4):
        self.id_col = id_col
        self.payload_col = payload_col
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.mode = mode
        self.cut_threshold = float(cut_threshold)
        self.fake_frames = int(fake_frames)

    def _energies(self, p: bytes):
        """One payload -> (n_frames, per-transition energy array)."""
        if self.mode == "real":
            if not p.startswith(Y4M_SIG):
                raise NotImplementedError(
                    "real motion features implemented for y4m only in "
                    "this container (no MP4/H.264 codecs)")
            w, h, _, _, frames = parse_y4m(p)
            return len(frames), motion_energy(frames, w, h)
        size = len(p)
        if not size:
            return 1, np.zeros(0, dtype=np.float64)
        k = min(self.fake_frames, size)
        step = size // k
        chunks = [p[f * step:(f + 1) * step] for f in range(k)]
        return k, motion_energy(chunks, step, 1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        nf, mean_m, max_m, std_m, cuts = [], [], [], [], []
        for p in batch.column(self.payload_col).to_pylist():
            n, e = self._energies(p)
            nf.append(n)
            if len(e):
                mean_m.append(float(e.mean()))
                max_m.append(float(e.max()))
                std_m.append(float(e.std()))
                cuts.append(int((e > self.cut_threshold).sum()))
            else:
                mean_m.append(0.0)
                max_m.append(0.0)
                std_m.append(0.0)
                cuts.append(0)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "n_frames": pa.array(nf, type=pa.int64()),
            "mean_motion": pa.array(mean_m, type=pa.float64()),
            "max_motion": pa.array(max_m, type=pa.float64()),
            "std_motion": pa.array(std_m, type=pa.float64()),
            "n_cuts": pa.array(cuts, type=pa.int64()),
        })


def motion_features(ds, id_col: str = "url", payload_col: str = "html",
                    mode: str = "fake", cut_threshold: float = 48.0,
                    fake_frames: int = 4, batch_size: int = 64,
                    concurrency=(1, 8)):
    """Small batch_size: each task holds batch_size raw clips in heap
    while diffing; size batch x concurrency x clip bytes to the node."""
    return ds.map_batches(
        MotionFeatureStage, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency,
        fn_constructor_kwargs={
            "id_col": id_col, "payload_col": payload_col, "mode": mode,
            "cut_threshold": cut_threshold, "fake_frames": fake_frames})


# ---------------------------------------------------------------------------
# Baseline JPEG (ITU-T T.81 sequential DCT, Huffman) — pure stdlib + numpy
# ---------------------------------------------------------------------------

JPEG_SIG = b"\xff\xd8"

# zigzag scan order: ZIGZAG[k] = natural (row-major) index of the k-th
# coefficient in scan order (T.81 Figure 5)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)


def _idct_basis() -> np.ndarray:
    """A[u, x] = c(u)/2 * cos((2x+1) u pi / 16); spatial = A.T @ F @ A."""
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    A = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16.0)
    A[0] *= 1.0 / np.sqrt(2.0)
    return A


_IDCT_A = _idct_basis()


class _HuffTable:
    """Canonical Huffman decode table from a DHT (counts, symbols)."""

    __slots__ = ("mincode", "maxcode", "valptr", "symbols")

    def __init__(self, counts: List[int], symbols: bytes):
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.symbols = symbols
        code = 0
        k = 0
        for ln in range(1, 17):
            n = counts[ln - 1]
            self.valptr[ln] = k
            self.mincode[ln] = code
            code += n
            k += n
            self.maxcode[ln] = code - 1 if n else -1
            code <<= 1
        if k != len(symbols):
            raise ValueError("JPEG: DHT counts/symbols mismatch")


class _BitReader:
    """Entropy-coded-segment bit reader with 0xFF00 unstuffing and
    restart-marker detection."""

    __slots__ = ("data", "pos", "bitbuf", "nbits", "marker")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0
        self.marker = None  # marker byte seen (ends entropy data)

    def _fill(self):
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                # a real marker terminates the entropy stream; feed 0s
                self.marker = nxt
                self.bitbuf = (self.bitbuf << 8)
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def get_bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.bitbuf >> self.nbits) & ((1 << n) - 1)
        self.bitbuf &= (1 << self.nbits) - 1
        return v

    def decode_huff(self, tab: _HuffTable) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.get_bits(1)
            if tab.maxcode[ln] >= code >= tab.mincode[ln]:
                return tab.symbols[tab.valptr[ln] + code - tab.mincode[ln]]
        raise ValueError("JPEG: invalid Huffman code")

    def restart(self):
        """Byte-align and consume an RSTn marker."""
        self.bitbuf = 0
        self.nbits = 0
        if self.marker is not None:
            if not (0xD0 <= self.marker <= 0xD7):
                raise ValueError("JPEG: expected RSTn marker")
            # pos still points at the 0xFF of the marker _fill saw
            self.pos += 2
            self.marker = None
            return
        d = self.data
        # skip fill bytes to the marker
        while d[self.pos] != 0xFF:
            self.pos += 1
        while d[self.pos + 1] == 0xFF:
            self.pos += 1
        m = d[self.pos + 1]
        if not (0xD0 <= m <= 0xD7):
            raise ValueError("JPEG: expected RSTn marker")
        self.pos += 2


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t-bit magnitude v to signed coefficient."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(data: bytes) -> Tuple[int, int, int, np.ndarray]:
    """Sequential (SOF0/SOF1) AND progressive (SOF2) Huffman JPEG
    decode: returns (width, height, channels, pixels[h, w, channels]
    uint8).

    1-component frames return grayscale (channels=1); 3-component
    frames are YCbCr -> RGB (BT.601 full range, the JFIF convention).
    Chroma upsampling is nearest-neighbor replication.  Progressive
    streams accumulate per-component coefficient arrays across scans
    (spectral selection + successive approximation per T.81 G.1.2 /
    the jdphuff algorithms), then dequantize + IDCT once at EOI.
    Arithmetic-coded, hierarchical, lossless and 12-bit streams raise
    ValueError."""
    if not data.startswith(JPEG_SIG):
        raise ValueError("not a JPEG (bad SOI)")
    qt: Dict[int, np.ndarray] = {}
    hdc: Dict[int, _HuffTable] = {}
    hac: Dict[int, _HuffTable] = {}
    frame = None   # (h, w, comps) comps: list of (cid, hs, vs, tq)
    progressive = False
    restart_interval = 0
    planes: Dict[int, np.ndarray] = {}
    coeffs: Dict[int, np.ndarray] = {}  # progressive: per-comp blocks
    pos = 2
    n = len(data)
    while pos < n:
        if data[pos] != 0xFF:
            raise ValueError("JPEG: marker sync lost")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xFF:          # fill byte
            pos -= 1
            continue
        if marker == 0xD9:          # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue                # standalone markers
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        body = data[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:          # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                if pq != 0:
                    raise ValueError("JPEG: 16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = np.frombuffer(body[i + 1:i + 65], dtype=np.uint8)
                qt[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 prog
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("JPEG: only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (h, w, comps)
            progressive = marker == 0xC2
            if progressive:
                hmax = max(hs for _, hs, _, _ in comps)
                vmax = max(vs for _, _, vs, _ in comps)
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                for cid, hs, vs, _tq in comps:
                    coeffs[cid] = np.zeros((mcuy * vs, mcux * hs, 64),
                                           dtype=np.int32)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("JPEG: only sequential (SOF0/SOF1) and "
                             "progressive (SOF2) Huffman frames are "
                             "supported")
        elif marker == 0xC4:        # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                counts = list(body[i + 1:i + 17])
                nsym = sum(counts)
                syms = bytes(body[i + 17:i + 17 + nsym])
                tab = _HuffTable(counts, syms)
                (hdc if tc == 0 else hac)[th] = tab
                i += 17 + nsym
        elif marker == 0xDD:        # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:        # SOS
            if frame is None:
                raise ValueError("JPEG: SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                scan.append((cs, tt >> 4, tt & 15))
            if progressive:
                ss = body[1 + 2 * ns]
                se = body[2 + 2 * ns]
                aa = body[3 + 2 * ns]
                pos = _decode_scan_prog(data, pos, frame, scan, ss, se,
                                        aa >> 4, aa & 15, hdc, hac,
                                        restart_interval, coeffs)
            else:
                pos = _decode_scan(data, pos, frame, scan, qt, hdc,
                                   hac, restart_interval, planes)
    if progressive:
        if frame is None or not coeffs:
            raise ValueError("JPEG: no image data")
        planes = _idct_planes(frame, coeffs, qt)
    if frame is None or not planes:
        raise ValueError("JPEG: no image data")
    return _assemble(frame, planes)


def _comp_block_grid(frame, cid):
    """(non-interleaved block rows, cols) of one component — ceil of
    the component's scaled pixel dims, NOT MCU-padded (T.81 A.2.2)."""
    h, w, comps = frame
    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    hs, vs = next((hs, vs) for c, hs, vs, _ in comps if c == cid)
    cw = -(-w * hs // hmax)
    ch = -(-h * vs // vmax)
    return -(-ch // 8), -(-cw // 8)


def _decode_scan_prog(data, pos, frame, scan, ss, se, ah, al,
                      hdc, hac, ri, coeffs):
    """One progressive scan into the per-component coefficient arrays
    (zigzag-index order).  DC scans (Ss=0) may be interleaved; AC
    scans are single-component per T.81.  Successive approximation:
    first scans (Ah=0) store values << Al; refinement scans (Ah>0)
    restore one magnitude bit (the jdphuff decode_mcu_*_refine
    algorithms)."""
    h, w, comps = frame
    byid = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    br = _BitReader(data, pos)
    p1, m1 = 1 << al, -(1 << al)

    def finish():
        p = br.pos
        if br.marker is not None:
            return p
        while p + 1 < len(data) and not (data[p] == 0xFF and
                                         data[p + 1] != 0x00):
            p += 1
        return p

    if ss == 0:
        if se != 0:
            raise ValueError("JPEG: progressive DC scan must have Se=0")
        preds = {cs: 0 for cs, _, _ in scan}

        def dc_block(blk, cs, tdc):
            if ah == 0:
                t = br.decode_huff(tdc)
                diff = _extend(br.get_bits(t), t) if t else 0
                preds[cs] += diff
                blk[0] = preds[cs] << al
            else:
                blk[0] |= br.get_bits(1) << al

        if len(scan) > 1:  # interleaved DC scan over MCUs
            count = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if ri and count and count % ri == 0:
                        br.restart()
                        for k in preds:
                            preds[k] = 0
                    count += 1
                    for cs, td, _ta in scan:
                        hs, vs, _tq = byid[cs]
                        C = coeffs[cs]
                        tdc = hdc[td] if ah == 0 else None
                        for by in range(vs):
                            for bx in range(hs):
                                dc_block(C[my * vs + by, mx * hs + bx],
                                         cs, tdc)
        else:
            cs, td, _ta = scan[0]
            C = coeffs[cs]
            tdc = hdc[td] if ah == 0 else None
            bh, bw = _comp_block_grid(frame, cs)
            count = 0
            for by in range(bh):
                for bx in range(bw):
                    if ri and count and count % ri == 0:
                        br.restart()
                        preds[cs] = 0
                    count += 1
                    dc_block(C[by, bx], cs, tdc)
        return finish()

    # ---- AC scan: single component ----
    if len(scan) != 1:
        raise ValueError("JPEG: progressive AC scan must be "
                         "single-component")
    cs, _td, ta = scan[0]
    tac = hac[ta]
    C = coeffs[cs]
    bh, bw = _comp_block_grid(frame, cs)
    eobrun = 0
    count = 0
    for by in range(bh):
        for bx in range(bw):
            if ri and count and count % ri == 0:
                br.restart()
                eobrun = 0
            count += 1
            blk = C[by, bx]
            if ah == 0:  # AC first scan
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = br.decode_huff(tac)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += br.get_bits(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("JPEG: AC index overflow")
                    blk[k] = _extend(br.get_bits(s), s) << al
                    k += 1
            else:  # AC refinement scan (jdphuff decode_mcu_AC_refine)
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = br.decode_huff(tac)
                        r, s = rs >> 4, rs & 15
                        if s:
                            if s != 1:
                                raise ValueError(
                                    "JPEG: bad AC refinement symbol")
                            newval = p1 if br.get_bits(1) else m1
                        else:
                            if r != 15:
                                eobrun = 1 << r
                                if r:
                                    eobrun += br.get_bits(r)
                                break
                            newval = 0  # ZRL: skip 16 zero-history
                        while k <= se:
                            c = int(blk[k])
                            if c != 0:
                                if br.get_bits(1) and (c & p1) == 0:
                                    blk[k] = c + (p1 if c >= 0 else m1)
                            else:
                                r -= 1
                                if r < 0:
                                    break
                            k += 1
                        if newval:
                            if k > se:
                                raise ValueError(
                                    "JPEG: AC refine overflow")
                            blk[k] = newval
                        k += 1
                if eobrun > 0:
                    while k <= se:
                        c = int(blk[k])
                        if c != 0:
                            if br.get_bits(1) and (c & p1) == 0:
                                blk[k] = c + (p1 if c >= 0 else m1)
                        k += 1
                    eobrun -= 1
    return finish()


def _idct_planes(frame, coeffs, qt) -> Dict[int, np.ndarray]:
    """Progressive finish: dequantize the accumulated zigzag-order
    coefficient blocks and run one batched IDCT per component."""
    h, w, comps = frame
    A = _IDCT_A
    planes: Dict[int, np.ndarray] = {}
    for cid, hs, vs, tq in comps:
        C = coeffs[cid].astype(np.float64)
        q = qt[tq].astype(np.float64).reshape(-1)
        bh, bw = C.shape[:2]
        nat = np.zeros((bh, bw, 64))
        nat[:, :, ZIGZAG] = C  # zigzag-index -> natural order
        F = nat.reshape(bh, bw, 8, 8) * q.reshape(8, 8)
        blk = np.einsum("ij,mnjk,kl->mnil", A.T, F, A) + 128.0
        planes[cid] = blk.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    return planes


def _decode_scan(data, pos, frame, scan, qt, hdc, hac, ri, planes):
    h, w, comps = frame
    if len(scan) != len(comps):
        raise ValueError("JPEG: only single-scan (interleaved) streams "
                         "supported")
    byid = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # per-component padded planes + dequant tables + huff tables
    meta = []
    for cs, td, ta in scan:
        hs, vs, tq = byid[cs]
        plane = np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.float64)
        planes[cs] = plane
        meta.append((cs, hs, vs, qt[tq].astype(np.float64),
                     hdc[td], hac[ta], plane))
    br = _BitReader(data, pos)
    preds = {cs: 0 for cs, _, _ in scan}
    coef = np.zeros(64, dtype=np.float64)
    A = _IDCT_A
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if ri and mcu_count and mcu_count % ri == 0:
                br.restart()
                for k in preds:
                    preds[k] = 0
            mcu_count += 1
            for cs, hs, vs, q, tdc, tac, plane in meta:
                for by in range(vs):
                    for bx in range(hs):
                        coef[:] = 0.0
                        t = br.decode_huff(tdc)
                        diff = _extend(br.get_bits(t), t) if t else 0
                        preds[cs] += diff
                        coef[0] = preds[cs]
                        k = 0
                        while k < 63:
                            rs = br.decode_huff(tac)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break       # EOB
                            k += r + 1
                            if k > 63:
                                raise ValueError("JPEG: AC index overflow")
                            coef[ZIGZAG[k]] = _extend(br.get_bits(s), s)
                        F = (coef.reshape(8, 8)) * q
                        blk = A.T @ F @ A + 128.0
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        plane[y0:y0 + 8, x0:x0 + 8] = blk
    # advance past entropy data to the next marker
    pos = br.pos
    if br.marker is not None:
        return pos  # _decode_jpeg loop will re-sync on data[pos]==0xFF
    while pos + 1 < len(data) and not (data[pos] == 0xFF and
                                       data[pos + 1] != 0x00):
        pos += 1
    return pos


def _assemble(frame, planes) -> Tuple[int, int, int, np.ndarray]:
    h, w, comps = frame
    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    chans = []
    for cid, hs, vs, _ in comps:
        p = planes[cid]
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs,
                          axis=1)
        chans.append(p[:h, :w])
    if len(chans) == 1:
        px = np.clip(np.round(chans[0]), 0, 255).astype(np.uint8)
        return w, h, 1, px[:, :, None]
    if len(chans) != 3:
        raise ValueError("JPEG: only 1- or 3-component frames supported")
    Y, Cb, Cr = chans
    r = Y + 1.402 * (Cr - 128.0)
    g = Y - 0.344136 * (Cb - 128.0) - 0.714136 * (Cr - 128.0)
    b = Y + 1.772 * (Cb - 128.0)
    px = np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255)
    return w, h, 3, px.astype(np.uint8)


# ---------------------------------------------------------------------------
# Audio analysis: STFT power spectrogram + mel filterbank (pure numpy)
# ---------------------------------------------------------------------------
#
# The audio analogue of the image featurizers above: a WAV payload
# column -> fixed-width log-mel feature vectors, as an actor-pool
# map_batches stage.  The FFT path is certified against a direct
# O(n^2) DFT oracle in tests/test_audio.py; the filterbank follows the
# standard HTK mel construction (triangles over rfft bin centers).


def hann_window(n: int) -> np.ndarray:
    """Periodic Hann window: 0.5 - 0.5 cos(2 pi k / n)."""
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


def frame_signal(mono: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    """Left-aligned analysis frames (n_frames, n_fft).  Signals shorter
    than one frame are zero-padded to a single frame; the ragged tail
    past the last full frame is dropped (deterministic either way)."""
    x = np.asarray(mono, dtype=np.float64).ravel()
    if x.size < n_fft:
        pad = np.zeros(n_fft, dtype=np.float64)
        pad[: x.size] = x
        return pad[None, :]
    n_frames = 1 + (x.size - n_fft) // hop
    idx = (np.arange(n_frames)[:, None] * hop
           + np.arange(n_fft)[None, :])
    return x[idx]


def stft_power(mono: np.ndarray, n_fft: int = 512,
               hop: int = 256) -> np.ndarray:
    """Hann-windowed power spectrogram |rfft|^2:
    (n_frames, n_fft // 2 + 1) float64."""
    frames = frame_signal(mono, n_fft, hop) * hann_window(n_fft)[None, :]
    spec = np.fft.rfft(frames, axis=1)
    return (spec.real ** 2 + spec.imag ** 2)


def hz_to_mel(f) -> np.ndarray:
    """HTK mel scale: 2595 log10(1 + f / 700)."""
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz(m) -> np.ndarray:
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(rate: int, n_fft: int, n_mels: int,
                   fmin: float = 0.0, fmax: float = None) -> np.ndarray:
    """(n_mels, n_fft//2 + 1) triangular mel filterbank.  Band edges are
    n_mels + 2 points equally spaced in mel between fmin and fmax
    (default Nyquist); each row is the standard rising/falling triangle
    evaluated at the rfft bin center frequencies."""
    if fmax is None:
        fmax = rate / 2.0
    n_bins = n_fft // 2 + 1
    freqs = np.arange(n_bins, dtype=np.float64) * rate / n_fft
    edges = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax),
                                  n_mels + 2))
    fb = np.zeros((n_mels, n_bins), dtype=np.float64)
    for m in range(n_mels):
        lo, mid, hi = edges[m], edges[m + 1], edges[m + 2]
        up = (freqs - lo) / max(mid - lo, 1e-12)
        down = (hi - freqs) / max(hi - mid, 1e-12)
        fb[m] = np.clip(np.minimum(up, down), 0.0, None)
    return fb


def log_mel_spectrogram(rate: int, mono: np.ndarray, *,
                        n_fft: int = 512, hop: int = 256,
                        n_mels: int = 16,
                        eps: float = 1e-10) -> np.ndarray:
    """(n_frames, n_mels) log-energy mel spectrogram."""
    P = stft_power(mono, n_fft, hop)
    fb = mel_filterbank(rate, n_fft, n_mels)
    return np.log(P @ fb.T + eps)


def audio_mel_features(rate: int, n_ch: int, samples: np.ndarray, *,
                       n_mels: int = 16, n_fft: int = 512,
                       hop: int = 256) -> np.ndarray:
    """Fixed-width clip embedding: time-mean and time-std of the
    log-mel spectrogram, concatenated -> (2 * n_mels,) float64.
    Multi-channel audio is averaged to mono first (same convention as
    ``wav_features``)."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    lm = log_mel_spectrogram(rate, mono, n_fft=n_fft, hop=hop,
                             n_mels=n_mels)
    return np.concatenate([lm.mean(axis=0), lm.std(axis=0)])


class AudioMelStage:
    """Actor-pool map_batches stage: (id, WAV payload binary) ->
    (id, rate, n_frames, mel: list<float64>[2 * n_mels]).

    The mel filterbank depends on the sample rate, so per-rate
    filterbanks are memoized on the actor (built once per distinct
    rate, reused across every batch the actor sees) — the stateful
    setup-in-__init__ pattern the other Decode/Resize stages follow."""

    def __init__(self, id_col: str = "url", payload_col: str = "html",
                 n_mels: int = 16, n_fft: int = 512, hop: int = 256):
        self.id_col = id_col
        self.payload_col = payload_col
        self.n_mels = n_mels
        self.n_fft = n_fft
        self.hop = hop
        self._fb = {}  # rate -> filterbank

    def _features(self, rate: int, mono: np.ndarray) -> np.ndarray:
        fb = self._fb.get(rate)
        if fb is None:
            fb = self._fb[rate] = mel_filterbank(rate, self.n_fft,
                                                 self.n_mels)
        P = stft_power(mono, self.n_fft, self.hop)
        lm = np.log(P @ fb.T + 1e-10)
        return np.concatenate([lm.mean(axis=0), lm.std(axis=0)])

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads: List[bytes] = batch.column(self.payload_col).to_pylist()
        n = len(payloads)
        rates = np.empty(n, dtype=np.int64)
        frames = np.empty(n, dtype=np.int64)
        feats = np.empty((n, 2 * self.n_mels), dtype=np.float64)
        for i, p in enumerate(payloads):
            rate, n_ch, samples = decode_wav(p)
            mono = samples.mean(axis=1)
            rates[i] = rate
            frames[i] = samples.shape[0]
            feats[i] = self._features(rate, mono)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "rate": pa.array(rates),
            "n_frames": pa.array(frames),
            "mel": pa.array(list(feats),
                            type=pa.list_(pa.float64(), 2 * self.n_mels)),
        })


def audio_mel(ds, id_col: str = "url", payload_col: str = "html",
              n_mels: int = 16, n_fft: int = 512, hop: int = 256,
              batch_size: int = 64, concurrency=(1, 8)):
    """The actor-pool log-mel featurize stage over a WAV binary column.
    Small batch_size: audio payloads are large (see module docstring)."""
    return ds.map_batches(
        AudioMelStage, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency,
        fn_constructor_kwargs={"id_col": id_col, "payload_col": payload_col,
                               "n_mels": n_mels, "n_fft": n_fft,
                               "hop": hop})


# ---------------------------------------------------------------------------
# GIF (87a/89a): LZW decode/encode — the last common legacy image format
# ---------------------------------------------------------------------------

GIF_SIGS = (b"GIF87a", b"GIF89a")


def _lzw_decode(data: bytes, min_code: int, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW: variable code width min_code+1..12, CLEAR
    resets the dictionary, EOI terminates.  Returns uint8 index
    stream of length <= n_pixels (extra codes past n_pixels ignored,
    per spec tolerance)."""
    clear = 1 << min_code
    eoi = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0
    # dictionary as (prefix_code, last_byte); first `clear` entries are roots
    prefix = np.full(4096, -1, dtype=np.int32)
    last = np.zeros(4096, dtype=np.uint8)
    last[:clear] = np.arange(clear, dtype=np.uint8)

    def entry_bytes(code: int) -> bytes:
        buf = bytearray()
        while code >= 0:
            buf.append(last[code])
            code = prefix[code]
        buf.reverse()
        return bytes(buf)

    width = min_code + 1
    next_code = eoi + 1
    acc = 0
    n_bits = 0
    prev = -1
    pos = 0
    nd = len(data)
    while pos < nd or n_bits >= width:
        while n_bits < width and pos < nd:
            acc |= data[pos] << n_bits
            n_bits += 8
            pos += 1
        if n_bits < width:
            break
        code = acc & ((1 << width) - 1)
        acc >>= width
        n_bits -= width
        if code == clear:
            width = min_code + 1
            next_code = eoi + 1
            prev = -1
            continue
        if code == eoi:
            break
        if prev < 0:
            if code >= clear:
                raise ValueError("GIF: first code after CLEAR not a root")
            if n_out < n_pixels:
                out[n_out] = code
            n_out += 1
            prev = code
            continue
        if code < next_code:
            seq = entry_bytes(code)
        elif code == next_code:
            seq = entry_bytes(prev)
            seq += seq[:1]
        else:
            raise ValueError("GIF: LZW code out of range")
        take = min(len(seq), max(0, n_pixels - n_out))
        if take:
            out[n_out:n_out + take] = np.frombuffer(seq[:take],
                                                    dtype=np.uint8)
        n_out += len(seq)
        if next_code < 4096:
            prefix[next_code] = prev
            last[next_code] = seq[0] if code == next_code else \
                entry_bytes(code)[0]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
        if n_out >= n_pixels:
            # consume until EOI or end; spec allows trailing codes
            break
    if n_out < n_pixels:
        raise ValueError("GIF: LZW stream ended short "
                         f"({n_out}/{n_pixels} pixels)")
    return out[:n_pixels]


_GIF_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray, w: int, h: int) -> np.ndarray:
    rows = idx.reshape(h, w)
    out = np.empty_like(rows)
    src = 0
    for start, step in _GIF_PASSES:
        n = len(range(start, h, step))
        out[start:h:step] = rows[src:src + n]
        src += n
    return out.reshape(-1)


def decode_gif(data: bytes) -> Tuple[int, int, int, np.ndarray]:
    """Pure-stdlib GIF decode (first image frame): returns
    (width, height, channels, pixels[h, w, c] uint8) with c = 3, or 4
    when the frame's graphic-control extension declares a transparent
    index (alpha 0 there, 255 elsewhere).  Supports 87a/89a, global
    and local color tables, interlacing, and the full variable-width
    LZW with CLEAR/EOI handling."""
    if data[:6] not in GIF_SIGS:
        raise ValueError("not a GIF (bad signature)")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos:pos + 3 * n],
                            dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    transparent = -1
    while pos < len(data):
        b0 = data[pos]
        pos += 1
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9 and data[pos] >= 4:  # graphic control
                flags = data[pos + 1]
                tidx = data[pos + 4]
                if flags & 0x01:
                    transparent = tidx
            while data[pos]:  # skip sub-blocks
                pos += 1 + data[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"GIF: unexpected block 0x{b0:02x}")
        _lx, _ty, w, h, ipacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            ct = np.frombuffer(data[pos:pos + 3 * n],
                               dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF: image has no color table")
        min_code = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos]:
            ln = data[pos]
            lzw += data[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(bytes(lzw), min_code, w * h)
        if ipacked & 0x40:
            idx = _deinterlace(idx, w, h)
        safe = np.minimum(idx, len(ct) - 1)
        rgb = ct[safe].reshape(h, w, 3)
        if transparent >= 0:
            alpha = np.where(idx.reshape(h, w) == transparent, 0,
                             255).astype(np.uint8)
            return w, h, 4, np.dstack([rgb, alpha])
        return w, h, 3, rgb
    raise ValueError("GIF: no image descriptor found")


def _lzw_encode(indices: np.ndarray, min_code: int) -> bytes:
    """GIF-variant LZW encoder (dict-of-tuples; CLEAR emitted at
    start and on dictionary overflow)."""
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    acc = 0
    n_bits = 0
    width = min_code + 1

    def emit(code: int):
        nonlocal acc, n_bits
        acc |= code << n_bits
        n_bits += width
        while n_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_bits -= 8

    table = {(-1, i): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    prev = -1
    for v in indices.tolist():
        key = (prev, v)
        code = table.get(key)
        if code is not None:
            prev = code
            continue
        emit(prev)
        table[key] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear)
            width = min_code + 1
            table = {(-1, i): i for i in range(clear)}
            next_code = eoi + 1
        prev = v
    if prev >= 0:
        emit(prev)
    emit(eoi)
    if n_bits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(indices: np.ndarray, palette: np.ndarray,
               interlace: bool = False,
               transparent: int = -1) -> bytes:
    """Minimal single-frame GIF89a encoder — inverse of ``decode_gif``
    for palette images.  `indices` is (h, w) uint8, `palette`
    (n, 3) uint8 with n a power of two >= 2."""
    h, w = indices.shape
    n = len(palette)
    bits = max(1, int(n - 1).bit_length())
    if n != (1 << bits):
        raise ValueError("palette size must be a power of two")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += palette.astype(np.uint8).tobytes()
    if transparent >= 0:
        out += b"\x21\xf9\x04\x01\x00\x00" + bytes([transparent, 0])
    ipacked = 0x40 if interlace else 0
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, ipacked)
    rows = indices
    if interlace:
        order = []
        for start, step in _GIF_PASSES:
            order.extend(range(start, h, step))
        rows = indices[np.array(order, dtype=np.int64)]
    min_code = max(2, bits)
    out.append(min_code)
    lzw = _lzw_encode(rows.reshape(-1), min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


# ---------------------------------------------------------------------------
# Header-only media metadata: dimensions / format / shape WITHOUT
# decoding the payload.  At 10^9-image scale this is the triage pass
# that decides what to decode at all — bytes touched per image are
# the first few KB of headers, not the pixel data.
# ---------------------------------------------------------------------------


def media_meta(data: bytes) -> Dict[str, object]:
    """Sniff one payload's format + shape from its headers only.

    Returns {"format", "width", "height", "n_components",
    "progressive"} — width/height -1 when the format is recognized
    but the needed header is missing/corrupt; format "unknown" (all
    else -1/False) when no signature matches.  JPEG walks markers to
    the first SOFn (skipping entropy data is never needed before
    SOF); PNG reads IHDR; BMP the BITMAPINFOHEADER; GIF the logical
    screen descriptor; WAV reports (n_samples, n_channels) as
    (width, height) like the decode stage; y4m parses the stream
    header."""
    out = {"format": "unknown", "width": -1, "height": -1,
           "n_components": -1, "progressive": False}
    try:
        if data.startswith(PNG_SIG):
            out["format"] = "png"
            if data[12:16] == b"IHDR":
                w, h = struct.unpack(">II", data[16:24])
                bit_depth, color = data[24], data[25]
                out.update(width=int(w), height=int(h),
                           n_components={0: 1, 2: 3, 3: 1, 4: 2,
                                         6: 4}.get(color, -1))
            return out
        if data.startswith(BMP_SIG):
            out["format"] = "bmp"
            if len(data) >= 30:
                w, h = struct.unpack("<ii", data[18:26])
                bpp = struct.unpack("<H", data[28:30])[0]
                out.update(width=int(w), height=abs(int(h)),
                           n_components=3 if bpp >= 24 else 1)
            return out
        if data[:6] in GIF_SIGS:
            out["format"] = "gif"
            w, h = struct.unpack("<HH", data[6:10])
            out.update(width=int(w), height=int(h), n_components=3)
            return out
        if data.startswith(WAV_SIG) and data[8:12] == b"WAVE":
            out["format"] = "wav"
            pos = 12
            n_ch = rate = bits = -1
            n_bytes = -1
            while pos + 8 <= len(data):
                cid = data[pos:pos + 4]
                (sz,) = struct.unpack("<I", data[pos + 4:pos + 8])
                if cid == b"fmt ":
                    n_ch, rate = struct.unpack(
                        "<HI", data[pos + 10:pos + 16])
                    (bits,) = struct.unpack(
                        "<H", data[pos + 22:pos + 24])
                elif cid == b"data":
                    n_bytes = sz
                    break
                pos += 8 + sz + (sz & 1)
            if n_ch > 0 and bits > 0 and n_bytes >= 0:
                out.update(width=n_bytes // (n_ch * (bits // 8)),
                           height=int(n_ch), n_components=int(n_ch))
            return out
        if data.startswith(Y4M_SIG):
            out["format"] = "y4m"
            hdr = data[:data.index(b"\n")].decode("ascii",
                                                  "replace").split()
            w = h = -1
            for tok in hdr[1:]:
                if tok.startswith("W"):
                    w = int(tok[1:])
                elif tok.startswith("H"):
                    h = int(tok[1:])
            out.update(width=w, height=h, n_components=1)
            return out
        if data.startswith(b"ID3") or (
                len(data) >= 2 and data[0] == 0xFF
                and (data[1] & 0xE0) == 0xE0 and (data[1] & 0x18) != 0x08):
            # MP3 triage: no decoder in this container, but the frame
            # header carries the catalogable metadata.  Skip an ID3v2
            # tag (syncsafe size), then parse the first MPEG audio
            # frame header: (width, height) <- (sample rate, channels)
            # mirroring the WAV convention; n_components <- kbps.
            pos2 = 0
            if data.startswith(b"ID3") and len(data) >= 10:
                sz = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14)                     | ((data[8] & 0x7F) << 7) | (data[9] & 0x7F)
                pos2 = 10 + sz
            while pos2 + 4 <= len(data):
                b0, b1, b2, b3 = data[pos2:pos2 + 4]
                if b0 == 0xFF and (b1 & 0xE0) == 0xE0:
                    ver = (b1 >> 3) & 3      # 3=MPEG1, 2=MPEG2, 0=2.5
                    layer = (b1 >> 1) & 3    # 1=III, 2=II, 3=I
                    br_idx = (b2 >> 4) & 15
                    sr_idx = (b2 >> 2) & 3
                    if ver != 1 and layer != 0 and br_idx not in (0, 15)                             and sr_idx != 3:
                        out["format"] = "mp3"
                        base = {3: 44100, 2: 22050, 0: 11025}[ver]
                        sr = {0: base, 1: base * 48000 // 44100,
                              2: base * 32000 // 44100}[sr_idx]
                        # MPEG1 Layer III bitrate table (kbps)
                        mpeg1_l3 = [0, 32, 40, 48, 56, 64, 80, 96, 112,
                                    128, 160, 192, 224, 256, 320, 0]
                        kbps = mpeg1_l3[br_idx] if (ver == 3 and
                                                    layer == 1) else -1
                        out.update(width=sr,
                                   height=1 if ((b3 >> 6) & 3) == 3
                                   else 2,
                                   n_components=kbps)
                        return out
                pos2 += 1
            if data.startswith(b"ID3"):
                out["format"] = "mp3"  # tagged but no parsable frame
            return out
        if data.startswith(JPEG_SIG):
            out["format"] = "jpeg"
            pos = 2
            n = len(data)
            while pos + 4 <= n:
                if data[pos] != 0xFF:
                    break
                marker = data[pos + 1]
                pos += 2
                if marker == 0xFF:
                    pos -= 1
                    continue
                if marker in (0xD8, 0xD9, 0x01) or \
                        0xD0 <= marker <= 0xD7:
                    continue
                (seglen,) = struct.unpack(">H", data[pos:pos + 2])
                if 0xC0 <= marker <= 0xCF and marker not in (
                        0xC4, 0xC8, 0xCC):  # SOFn
                    _prec, h, w, nc = struct.unpack(
                        ">BHHB", data[pos + 2:pos + 8])
                    out.update(width=int(w), height=int(h),
                               n_components=int(nc),
                               progressive=marker in (0xC2, 0xC6,
                                                      0xCA, 0xCE))
                    return out
                if marker == 0xDA:  # SOS before SOF: corrupt
                    break
                pos += seglen
            return out
    except (struct.error, IndexError, ValueError):
        return out
    return out


class MediaMetaStage:
    """Actor-pool stage: (id, payload) -> header-only metadata
    columns.  Pass to ``map_batches(MediaMetaStage,
    fn_constructor_args=(id_col, payload_col), concurrency=(1, N))``
    — reads only header bytes per row, the 10^9-image triage pass."""

    def __init__(self, id_col: str = "url", payload_col: str = "html"):
        self.id_col = id_col
        self.payload_col = payload_col

    def __call__(self, b: pa.Table) -> pa.Table:
        payloads = b.column(self.payload_col).to_pylist()
        metas = [media_meta(p or b"") for p in payloads]
        return pa.table({
            self.id_col: b.column(self.id_col),
            "format": pa.array([m["format"] for m in metas],
                               type=pa.string()),
            "width": pa.array([m["width"] for m in metas],
                              type=pa.int64()),
            "height": pa.array([m["height"] for m in metas],
                               type=pa.int64()),
            "n_components": pa.array(
                [m["n_components"] for m in metas], type=pa.int64()),
            "progressive": pa.array(
                [m["progressive"] for m in metas], type=pa.bool_()),
            "n_bytes": pa.array([len(p or b"") for p in payloads],
                                type=pa.int64())})


def media_metadata(ds, id_col: str = "url", payload_col: str = "html",
                   batch_size: int = 1024, concurrency=(1, 8)):
    """Header-only media triage over a binary payload column."""
    return ds.map_batches(
        MediaMetaStage, fn_constructor_args=(id_col, payload_col),
        batch_size=batch_size, concurrency=concurrency,
        batch_format="pyarrow")
