"""Decode-fidelity invariant (BASELINE.json input_hint): decoded PCM
allclose vs the generator's reference signal at SNR >= 30 dB, plus the
decode-reject paths."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from go_pkg_spider_spark import datagen
from go_pkg_spider_spark.operators import decode


def _snr_db(ref: np.ndarray, got: np.ndarray) -> float:
    n = min(ref.size, got.size)
    ref, got = ref[:n], got[:n]
    noise = ref - got
    p_sig = float(np.mean(ref**2))
    p_noise = float(np.mean(noise**2)) or 1e-12
    return 10.0 * np.log10(p_sig / p_noise)


def test_wav_roundtrip_snr():
    """Pure-python decode path: every generated wav/pcm row must
    reconstruct the seeded reference signal at SNR>=30dB (16-bit
    quantization gives ~90dB, so 30 is a loose gate)."""
    checked = 0
    for i in range(120):
        cid, blob, sr, dur_ms, codec, _ = datagen.make_row(i)
        if codec not in ("wav", "pcm_s16le"):
            continue
        pcm, sr_dec, err = decode.decode_blob(blob, codec, sr)
        if err is not None:
            continue  # corrupt-share rows
        ref = datagen.expected_pcm(i, sr, pcm.size)
        assert _snr_db(ref, pcm) >= 30.0, (cid, codec)
        checked += 1
    assert checked >= 50


def test_reject_paths():
    assert decode.decode_blob(None, "wav", 16000)[2] == "empty_bytes"
    assert decode.decode_blob(b"x" * 10, "mp3", 16000)[2] == "codec_not_whitelisted"
    assert decode.decode_blob(b"notriff" + b"\0" * 100, "wav", 16000)[2] == "bad_riff_header"
    big = b"RIFF" + b"\0" * (decode.MAX_CONTENT_LENGTH + 1)
    assert decode.decode_blob(big, "wav", 16000)[2] == "max_content_length"
    # malformed flac container -> typed decode error (real decoder now)
    assert decode.decode_blob(b"fLaC" + b"\0" * 32, "flac", 16000)[2] == "bad_flac_header"


def test_decode_udf_in_spark(spark, clips_path):
    df = spark.read.parquet(clips_path)
    out = decode.with_decode_features(df).select("clip_id", "codec", "audio")
    rows = out.collect()
    ok = [r for r in rows if r.audio.ok]
    assert len(ok) > len(rows) * 0.4
    for r in ok[:20]:
        assert r.audio.n_samples > 0
        assert 0.0 <= r.audio.rms <= 1.0


def test_prefilter_pushdown(spark, clips_path):
    """The codec/size guards must appear as data filters (pushdown to the
    scan), so rejected rows never reach the Arrow batch."""
    df = spark.read.parquet(clips_path).filter(decode.decode_prefilter())
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan or "Filter" in plan
    assert df.count() > 0
