"""Audio spectral analysis: STFT power spectrogram + mel filterbank.

The FFT path is certified against a direct O(n^2) DFT evaluated from
the definition (independent of np.fft's algorithm choice beyond final
float tolerance); the mel filterbank against closed-form HTK mel
properties; the actor-pool stage against the sequential
``audio_mel_features`` on the same clips.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from halvesting_geometric_ray.functions.multimodal import (
    AudioMelStage, audio_mel, audio_mel_features, encode_wav,
    frame_signal, hann_window, hz_to_mel, log_mel_spectrogram,
    mel_filterbank, mel_to_hz, stft_power)


def _dft_power(frame: np.ndarray) -> np.ndarray:
    """Direct-definition DFT power of one windowed frame (O(n^2))."""
    n = frame.size
    k = np.arange(n // 2 + 1)[:, None]
    t = np.arange(n)[None, :]
    w = np.exp(-2j * np.pi * k * t / n)
    spec = (w * frame[None, :]).sum(axis=1)
    return (spec.real ** 2 + spec.imag ** 2)


# ---------------------------------------------------------------- STFT

def test_stft_power_matches_direct_dft():
    rng = np.random.default_rng(7)
    x = rng.normal(size=300)
    n_fft, hop = 64, 32
    P = stft_power(x, n_fft, hop)
    win = hann_window(n_fft)
    frames = frame_signal(x, n_fft, hop)
    assert P.shape == (frames.shape[0], n_fft // 2 + 1)
    for i in range(frames.shape[0]):
        np.testing.assert_allclose(P[i], _dft_power(frames[i] * win),
                                   rtol=1e-9, atol=1e-9)


def test_frame_signal_layout():
    x = np.arange(10, dtype=np.float64)
    f = frame_signal(x, 4, 2)
    assert f.shape == (4, 4)
    np.testing.assert_array_equal(f[0], [0, 1, 2, 3])
    np.testing.assert_array_equal(f[3], [6, 7, 8, 9])
    # shorter than one frame: zero-padded single frame
    f = frame_signal(np.ones(3), 8, 4)
    assert f.shape == (1, 8)
    np.testing.assert_array_equal(f[0], [1, 1, 1, 0, 0, 0, 0, 0])


def test_pure_tone_peaks_at_its_bin():
    rate, n_fft = 8000, 256
    # tone exactly on bin 32: f = 32 * rate / n_fft = 1000 Hz
    f0 = 32 * rate / n_fft
    t = np.arange(n_fft * 4) / rate
    x = np.sin(2 * np.pi * f0 * t)
    P = stft_power(x, n_fft, n_fft)
    assert int(np.argmax(P[1])) == 32


# ------------------------------------------------------------ mel scale

def test_mel_scale_inverts():
    f = np.array([0.0, 440.0, 1000.0, 3999.5])
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, rtol=1e-12)
    assert hz_to_mel(1000.0) == pytest.approx(1000.0, rel=0.001)


def test_mel_filterbank_shape_and_coverage():
    rate, n_fft, n_mels = 16000, 512, 20
    fb = mel_filterbank(rate, n_fft, n_mels)
    assert fb.shape == (n_mels, n_fft // 2 + 1)
    assert (fb >= 0).all() and fb.max() <= 1.0 + 1e-12
    # every filter has support, peak near 1 at its center bin
    assert (fb.max(axis=1) > 0.5).all()
    # interior bins are covered by at least one filter
    interior = fb.sum(axis=0)[3:-3]
    assert (interior > 0).all()


def test_log_mel_tone_band_tracks_frequency():
    rate = 8000
    t = np.arange(4096) / rate
    lo = log_mel_spectrogram(rate, np.sin(2 * np.pi * 300 * t),
                             n_fft=512, hop=256, n_mels=16)
    hi = log_mel_spectrogram(rate, np.sin(2 * np.pi * 2500 * t),
                             n_fft=512, hop=256, n_mels=16)
    assert int(np.argmax(lo.mean(axis=0))) < int(np.argmax(hi.mean(axis=0)))


# ------------------------------------------------------------- features

def test_audio_mel_features_shape_and_stereo_mono():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(4000, 2)) * 0.1
    f = audio_mel_features(8000, 2, x, n_mels=12)
    assert f.shape == (24,)
    mono = x.mean(axis=1)
    np.testing.assert_allclose(
        f, audio_mel_features(8000, 1, mono, n_mels=12), rtol=1e-12)


# ---------------------------------------------------------------- stage

def test_audio_mel_stage_matches_sequential():
    rng = np.random.default_rng(11)
    rows = []
    expect = {}
    for i in range(6):
        rate = 8000 if i % 2 == 0 else 16000  # exercises per-rate memo
        x = rng.normal(size=(3000 + 100 * i, 1)) * 0.3
        wav = encode_wav(x, rate)
        rows.append({"url": f"u{i}", "wav": wav})
        # the stage decodes the QUANTIZED 16-bit samples — replay that
        from halvesting_geometric_ray.functions.multimodal import decode_wav
        r2, c2, s2 = decode_wav(wav)
        expect[f"u{i}"] = (r2, s2.shape[0],
                           audio_mel_features(r2, c2, s2, n_mels=16))
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = audio_mel(ds, id_col="url", payload_col="wav",
                    n_mels=16, concurrency=(1, 2)).to_pandas()
    assert len(out) == 6
    for _, row in out.iterrows():
        rate, n_frames, feats = expect[row["url"]]
        assert row["rate"] == rate and row["n_frames"] == n_frames
        np.testing.assert_allclose(np.asarray(row["mel"]), feats,
                                   rtol=1e-9, atol=1e-9)


def test_audio_mel_stage_deterministic_across_batch_sizes():
    rng = np.random.default_rng(5)
    rows = [{"url": f"u{i}",
             "wav": encode_wav(rng.normal(size=(2500, 1)) * 0.2, 8000)}
            for i in range(10)]
    t = pa.Table.from_pylist(rows)
    a = audio_mel(rd.from_arrow(t), id_col="url", payload_col="wav",
                  batch_size=3).to_pandas().sort_values("url")
    b = audio_mel(rd.from_arrow(t), id_col="url", payload_col="wav",
                  batch_size=10).to_pandas().sort_values("url")
    np.testing.assert_allclose(np.stack(a["mel"].to_numpy()),
                               np.stack(b["mel"].to_numpy()))


def test_query_audio_mel_smoke():
    from halvesting_geometric_ray.queries_text import QUERIES

    df = QUERIES["q_audio_mel"]("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 500
    assert set(df.columns) == {"doc_id", "rate", "n_frames",
                               "dominant_band", "mel0"}
    # dominant band is monotone-ish in the synthesized f0 = 200+50*(id%12):
    # same id class -> same band (featurization is a pure function of id)
    g = df.groupby(df.doc_id % 12)["dominant_band"].nunique()
    assert (g == 1).all()
