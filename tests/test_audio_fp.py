"""Audio fingerprint + cross-codec near-dup: frozen-truth integrity,
hand-pinned arithmetic (independent of the kernel), robustness
contracts, and the Spark grouping path (pigeonhole LSH + components)
against the brute-force-derived expected partition."""

from __future__ import annotations

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from go_pkg_spider_spark.fixtures import audio_fp_fixtures as fpx
from go_pkg_spider_spark.fixtures.audio_fixtures import _i16, _wav
from go_pkg_spider_spark.operators import audio_fp as afp


def test_expected_matches_live_derivation():
    derived = fpx.derive_expected()
    assert len(derived) == len(fpx.EXPECTED) == 15
    for got, frozen in zip(derived, fpx.EXPECTED):
        assert got == frozen, f"fid {frozen[0]} drifted: {got} != {frozen}"


def test_splitmix64_hand_pin():
    """The degenerate fp64 constant, re-derived with pure-Python int
    arithmetic (independent of the numpy kernel): an all-zero
    sub-fingerprint stream makes every shingle 0, every shingle hash
    splitmix64(0), and a unanimous vote returns that hash verbatim."""
    M = (1 << 64) - 1
    z = (0 + 0x9E3779B97F4A7C15) & M
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M
    z = z ^ (z >> 31)
    assert z == 0xE220A8397B1DCDAF  # the published splitmix64(0)
    want = z - (1 << 64)  # int64 view (top bit set)
    assert afp.fp64_of_subfps(np.zeros(8, dtype=np.uint64)) == want
    by_fid = {r[0]: r for r in fpx.EXPECTED}
    assert by_fid[10][3] == by_fid[11][3] == want  # tone == silence


def test_reencode_twins_bit_identical():
    """The six-way duplicate decodes to the same sub-fingerprint
    STREAM, not just the same fp64 — container, word width, sample
    rate, and gain all cancel by construction."""
    rows = {fid: (b, c, s) for fid, b, c, s in fpx.build_rows()}
    streams = []
    for fid in range(6):
        from go_pkg_spider_spark.operators.decode import decode_blob

        pcm, sr, err = decode_blob(*rows[fid])
        assert err is None, fid
        streams.append(afp.subfingerprints(pcm, sr))
    for fid, s in enumerate(streams[1:], start=1):
        assert np.array_equal(streams[0], s), f"fid {fid} stream diverged"


def test_distinct_clips_are_far():
    """Pairwise fp64 hamming between the four distinct singletons and
    the duplicate group stays far above the grouping threshold —
    near-random (measured 28..35), frozen here with margin."""
    by_fid = {r[0]: r[3] for r in fpx.EXPECTED}
    anchors = [0, 6, 7, 8, 9]
    for i, a in enumerate(anchors):
        for b in anchors[i + 1 :]:
            h = bin((by_fid[a] ^ by_fid[b]) & ((1 << 64) - 1)).count("1")
            assert h >= 3 * fpx.FP_GROUP_HAMMING, (a, b, h)


def test_degenerate_flag_semantics():
    """Stationary clips collapse to equal fp64 but stay ungrouped; a
    sub-two-frame clip yields zero sub-fingerprints and no error."""
    by_fid = {r[0]: r for r in fpx.EXPECTED}
    assert by_fid[10][4] and by_fid[11][4]  # degenerate
    assert by_fid[10][5] == 10 and by_fid[11][5] == 11  # NOT merged
    assert by_fid[14] == (14, None, 0, 0, True, 14)


def test_tie_guard_absorbs_16bit_quantization():
    """FP_TIE_EPS sits above the measured 16-bit quantization
    perturbation: the float signal and its 16-bit quantized twin
    produce identical streams (the contract the 24-bit WAV fixture
    rides on). 8-bit is documented OUTSIDE the contract."""
    sig = fpx._chirp(16_000, 16_000, 200.0, 2000.0)
    q16 = _i16(sig).astype(np.float64) / 32767.0
    assert np.array_equal(
        afp.subfingerprints(sig, 16_000), afp.subfingerprints(q16, 16_000)
    )


def test_max_subfp_cap_bounds_long_clips():
    """A clip past FP_MAX_SUBFP transitions is truncated, not O(dur)."""
    long_pcm = fpx._am(afp.FP_SR * 5, afp.FP_SR, 440.0, 3.0)
    old = afp.FP_MAX_SUBFP
    afp.FP_MAX_SUBFP = 16
    try:
        assert afp.subfingerprints(long_pcm, afp.FP_SR).size == 16
    finally:
        afp.FP_MAX_SUBFP = old


def test_spark_grouping_matches_brute_force(spark):
    """The production pigeonhole-LSH + connected-components path must
    reproduce the brute-force union-find partition frozen in EXPECTED
    — the block split's recall guarantee at hamming <= 7, verified on
    the corpus plus a synthetic near-miss pair (hamming exactly 8
    must NOT merge; hamming exactly 7 must)."""
    from go_pkg_spider_spark.operators.audio_fp import (
        audio_neardup_groups,
        fingerprint_clips,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        fpx.build_rows(), "fid long, bytes binary, codec string, sr_hz int"
    ).select(
        F.col("fid").cast("string").alias("clip_id"), "bytes", "codec", "sr_hz"
    )
    fp = fingerprint_clips(df)
    got = {
        int(r.clip_id): int(r.group_id)
        for r in audio_neardup_groups(fp).collect()
    }
    want = {r[0]: r[5] for r in fpx.EXPECTED}
    assert got == want

    base = fpx.EXPECTED[0][3]
    flip7 = base ^ ((1 << 7) - 1)  # hamming 7 from base
    flip8 = base ^ (0xFF << 32)  # hamming 8 from base, 15 from flip7
    syn = spark.createDataFrame(
        [("a", base, False, None), ("b", flip7, False, None), ("c", flip8, False, None)],
        "clip_id string, fp64 long, fp_degenerate boolean, err string",
    )
    g = {r.clip_id: r.group_id for r in audio_neardup_groups(syn).collect()}
    assert g["a"] == g["b"] == "a" and g["c"] == "c"


def test_fingerprint_clips_schema_and_errors(spark):
    """Typed-error contract through the mapInPandas operator: the
    whitelist/empty errors surface in `err`, never as exceptions, and
    NULL sr_hz rides the decoder default (the decode.py contract)."""
    from go_pkg_spider_spark.operators.audio_fp import fingerprint_clips

    pcm = fpx._chirp(8000, 8000, 300.0, 1500.0)
    df = spark.createDataFrame(
        [
            ("ok", _wav(pcm, 8000), "wav", 8000),
            ("bad", b"JUNK", "wav", 8000),
            ("unlisted", _wav(pcm, 8000), "speex", 8000),
            ("nullsr", _i16(pcm).tobytes(), "pcm_s16le", None),
        ],
        "clip_id string, bytes binary, codec string, sr_hz int",
    )
    rows = {r.clip_id: r for r in fingerprint_clips(df).collect()}
    assert rows["ok"].err is None and rows["ok"].n_subfp > 0
    assert rows["bad"].err == "bad_riff_header" and rows["bad"].fp64 == 0
    assert rows["unlisted"].err == "codec_not_whitelisted"
    assert rows["nullsr"].err is None and not rows["nullsr"].fp_degenerate


# ------------------------------------------------------ property fuzz

from hypothesis import given, settings, strategies as st


@settings(max_examples=40, deadline=None, derandomize=True)
@given(
    st.lists(
        st.floats(
            min_value=-1.5, max_value=1.5, allow_nan=False, allow_infinity=False
        ),
        min_size=0,
        max_size=4000,
    ),
    st.integers(min_value=4000, max_value=192_000),
)
def test_kernel_total_on_finite_pcm(samples, sr):
    """The kernel's contract over everything decode_blob can hand it
    (finite float PCM, plausible rate): never raises, subfp dtype/size
    bounded, fp64 in int64 range, degenerate consistent with n==0."""
    pcm = np.asarray(samples, dtype=np.float64)
    subs = afp.subfingerprints(pcm, sr)
    assert subs.dtype == np.uint16 and subs.size <= afp.FP_MAX_SUBFP
    fp64 = afp.fp64_of_subfps(subs)
    assert -(1 << 63) <= fp64 < (1 << 63)
    if subs.size == 0:
        assert fp64 == 0


def test_fp_robustness_contract():
    """Measured robustness floors (tools/fp_robustness.py, published in
    BENCH/BASELINE.md): every lossless-ish re-encode (quantization to
    8-bit, gain, exact 2:1 resample) must fingerprint IDENTICALLY;
    40 dB additive noise must still group at the default threshold;
    the distinct-signal control must stay far. The 30 dB row documents
    the 64-bit compression tradeoff: low sub-fingerprint BER but no
    fp64 grouping — pinned so a silent recall change surfaces."""
    from tools.fp_robustness import measure

    rows = {r["perturbation"]: r for r in measure()["rows"]}
    for name in (
        "quantize_16bit",
        "quantize_8bit",
        "gain_0.25x",
        "resample_2to1_8k",
    ):
        assert rows[name]["fp64_hamming"] == 0, (name, rows[name])
    assert rows["add_noise_snr40dB"]["groups_at_default"]
    assert rows["add_noise_snr30dB"]["subfp_ber"] <= 0.15
    assert not rows["add_noise_snr30dB"]["groups_at_default"]
    assert rows["control_distinct_signal"]["fp64_hamming"] >= 20


def test_pairs_match_brute_force(spark):
    """Canonical-block emission (round 8): audio_fp_pairs must equal
    the brute-force all-pairs set (unordered, exactly once — no
    duplicate edges despite up to 8 block collisions per pair) on the
    fixture corpus AND on a synthetic set engineered to collide in
    several blocks at once."""
    from go_pkg_spider_spark.operators.audio_fp import (
        audio_fp_pairs,
        fingerprint_clips,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        fpx.build_rows(), "fid long, bytes binary, codec string, sr_hz int"
    ).select(
        F.col("fid").cast("string").alias("clip_id"), "bytes", "codec", "sr_hz"
    )
    fp = fingerprint_clips(df).localCheckpoint()
    got = [
        (min(int(r.id_a), int(r.id_b)), max(int(r.id_a), int(r.id_b)))
        for r in audio_fp_pairs(fp).collect()
    ]
    assert len(got) == len(set(got))  # exactly-once emission
    elig = {
        r[0]: r[3] for r in fpx.EXPECTED if r[1] is None and not r[4]
    }
    ids = sorted(elig)
    want = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin((elig[a] ^ elig[b]) & ((1 << 64) - 1)).count("1")
        <= fpx.FP_GROUP_HAMMING
    }
    assert set(got) == want

    # synthetic: base and base^(bit 17) agree in blocks 0,1 and 3..7
    # (7 collisions) — must come out exactly once; a pair differing in
    # EVERY block must not appear at all
    base = fpx.EXPECTED[0][3]
    syn = spark.createDataFrame(
        [
            ("x", base, False, None),
            ("y", base ^ (1 << 17), False, None),
            ("z", base ^ 0x0101010101010101, False, None),  # 1 bit/block
        ],
        "clip_id string, fp64 long, fp_degenerate boolean, err string",
    )
    sp = [(r.id_a, r.id_b, r.hamming) for r in audio_fp_pairs(syn).collect()]
    assert sorted((min(a, b), max(a, b)) for a, b, _ in sp) == [("x", "y")]
