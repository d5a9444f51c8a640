"""Audio feature extraction: resample fidelity, frame shapes, and
feature sanity on known signals."""

from __future__ import annotations

import numpy as np

from go_pkg_spider_spark.operators import audio_features as af


def test_linear_resample_preserves_sine():
    sr_in, sr_out, freq = 48_000, 16_000, 440.0
    t = np.arange(sr_in) / sr_in
    sig = np.sin(2 * np.pi * freq * t)
    res = af.linear_resample(sig, sr_in, sr_out)
    assert res.size == sr_out
    t2 = np.arange(sr_out) / sr_out
    want = np.sin(2 * np.pi * freq * t2)
    err = want - res
    # err can be exactly zero (perfect reconstruction) -> SNR inf, which
    # trivially clears the floor; silence the divide-by-zero warning.
    with np.errstate(divide="ignore"):
        snr = 10 * np.log10((want**2).mean() / (err**2).mean())
    assert snr >= 30.0


def test_frames_shape():
    pcm = np.zeros(16_000)  # 1s @ 16k
    fr = af._frames(pcm, 16_000)
    assert fr.shape[1] == 400  # 25ms
    assert 95 <= fr.shape[0] <= 100  # ~ (16000-400)/160 + 1


def test_spectral_centroid_of_tone():
    sr = 16_000
    t = np.arange(sr) / sr
    sig = np.sin(2 * np.pi * 1000.0 * t)
    centroid, rolloff = af._spectral(sig, sr)
    assert 900 <= centroid <= 1100
    assert 900 <= rolloff <= 1200


def test_extract_in_spark(spark, clips_path):
    df = spark.read.parquet(clips_path)
    out = af.extract_audio_features(df).collect()
    ok = [r for r in out if r.ok is None]
    assert len(out) == df.count()
    assert len(ok) > len(out) * 0.4
    r = ok[0]
    assert r.n_frames == len(r.frame_rms) == len(r.frame_zcr) > 0
    assert r.resampled_sr == 16_000
    assert 0.0 <= r.silence_ratio <= 1.0
    # sine clips are non-silent and band-limited
    assert r.spectral_centroid_hz > 0
