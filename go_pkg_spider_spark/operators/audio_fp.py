"""Robust audio fingerprint + cross-codec near-duplicate grouping.

The real-world audio dedup problem at corpus scale is NOT byte-exact
dedup: the same clip recurs re-containerized (WAV vs FLAC vs AIFF),
re-quantized (16- vs 24-bit), or resampled — every byte differs while
the audio is identical. This module implements the Haitsma & Kalker
fingerprint ("A Highly Robust Audio Fingerprinting System", ISMIR
2002 — public literature): per overlapping frame, log-spaced band
energies; each bit is the SIGN of the band-energy difference's
time-derivative, so the fingerprint encodes spectro-temporal shape
and is invariant to container, word width, and gain.

Reference analog: the exact-hash frontier dedup (url.go seen-set /
crawler.go de-dup) is the byte-exact half; this is its perceptual
twin for the north-star's audio payload, composed with the SAME
downstream group machinery as text near-dup (operators/dedup.py
simhash pigeonhole blocks -> operators/components.py components).

Scale shape (SURVEY.md §4.3 confinement): decode + fingerprint run in
ONE mapInPandas stage — PCM never crosses a shuffle; only (clip_id,
fp64, n_subfp, flags) leave, ~20 bytes/clip. Grouping shuffles once
on (block_idx, 8-bit block value) with capped buckets, then O(log n)
component rounds. A stationary clip (silence, constant tone) has zero
spectro-temporal change, so ALL its bits are zero — a known property
of the scheme, surfaced as `fp_degenerate` and EXCLUDED from grouping
(otherwise every silent clip on earth lands in one group).

Determinism: closed-form math only (rfft, reduceat, splitmix64 — the
public-domain Steele/Lea/Vigna mix); no RNG, no library slots.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .audio_features import linear_resample
from .bucketing import capped_buckets, pair_array
from .components import connected_components
from .decode import decode_blob

# Canonical analysis rate: band content tops out at FP_BAND_HI well
# under the 4 kHz Nyquist, so any source rate >= 8 kHz carries the
# fingerprint's whole spectral support and resampled twins agree.
FP_SR = 8_000
FP_FRAME = 512  # 64 ms @ 8 kHz
FP_HOP = 256  # 50% overlap
FP_N_BANDS = 17  # 17 bands -> 16 adjacent-band differences -> 16 bits
FP_BAND_LO = 300.0
FP_BAND_HI = 3_000.0
FP_SHINGLE = 4  # consecutive subfps packed into one 64-bit shingle
FP_MAX_SUBFP = 4_096  # ~2 min of audio; caps per-row cost at 100 TB
# Tie guard: a bit fires only when the spectro-temporal delta exceeds
# FP_TIE_EPS x the transition's total frame energy. Without it, bits
# in bands the signal never visits are leakage-level numeric noise and
# flip under re-quantization (measured: 16-bit quantization perturbs
# |dd|/E_total by <= 5.7e-5 on the fixture chirp; active-band deltas
# are ~0.2). 1e-3 sits ~17x above the 16-bit noise ceiling and ~200x
# below real deltas; 8-bit twins are OUTSIDE the contract (their
# quantization perturbation ~1e-2 crosses the guard).
FP_TIE_EPS = 1e-3

_WINDOW = np.hanning(FP_FRAME)

# rfft bin k sits at k * FP_SR / FP_FRAME Hz; geometric band edges over
# [LO, HI] mapped to bin boundaries once at import. searchsorted keeps
# the boundaries monotone; the narrowest band (300–343 Hz) still spans
# ~2.8 bins at the 15.625 Hz bin width, so no band collapses to empty.
_EDGES_HZ = FP_BAND_LO * (FP_BAND_HI / FP_BAND_LO) ** (
    np.arange(FP_N_BANDS + 1) / FP_N_BANDS
)
_BIN_FREQS = np.fft.rfftfreq(FP_FRAME, d=1.0 / FP_SR)
_EDGE_BINS = np.searchsorted(_BIN_FREQS, _EDGES_HZ)

_SPLITMIX_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SPLITMIX_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SPLITMIX_M2 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constants)."""
    z = x.astype(np.uint64) + _SPLITMIX_GAMMA
    z = (z ^ (z >> np.uint64(30))) * _SPLITMIX_M1
    z = (z ^ (z >> np.uint64(27))) * _SPLITMIX_M2
    return z ^ (z >> np.uint64(31))


def subfingerprints(pcm: np.ndarray, sr: int) -> np.ndarray:
    """uint16 sub-fingerprint per frame transition.

    bit b of frame t: (E[t,b]-E[t,b+1]) - (E[t-1,b]-E[t-1,b+1]) >
    FP_TIE_EPS*(E_tot[t]+E_tot[t-1]) — the H&K bit with a relative
    tie guard (see FP_TIE_EPS), over FP_N_BANDS log-spaced
    power-spectrum bands of Hann-windowed FP_FRAME frames at the
    canonical FP_SR. Returns an empty array for clips shorter than
    two frames.
    """
    res = linear_resample(np.asarray(pcm, dtype=np.float64), sr, FP_SR)
    if res.size < FP_FRAME + FP_HOP:
        return np.empty(0, dtype=np.uint16)
    n = 1 + (res.size - FP_FRAME) // FP_HOP
    n = min(n, FP_MAX_SUBFP + 1)  # +1: T frames -> T-1 transitions
    idx = np.arange(FP_FRAME)[None, :] + FP_HOP * np.arange(n)[:, None]
    frames = res[idx] * _WINDOW[None, :]
    power = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    # reduceat over the precomputed bin boundaries: E is (n, FP_N_BANDS)
    energy = np.add.reduceat(power, _EDGE_BINS[:-1], axis=1)[
        :, : FP_N_BANDS
    ]
    d_spec = energy[:, :-1] - energy[:, 1:]  # (n, 16)
    e_tot = energy.sum(axis=1)  # (n,)
    thr = FP_TIE_EPS * (e_tot[1:] + e_tot[:-1])[:, None]
    bits = (d_spec[1:] - d_spec[:-1]) > thr  # (n-1, 16)
    weights = (np.uint16(1) << np.arange(15, -1, -1, dtype=np.uint16))[None, :]
    return (bits.astype(np.uint16) * weights).sum(axis=1, dtype=np.uint16)


def fp64_of_subfps(subs: np.ndarray) -> int:
    """64-bit SimHash over splitmix64 hashes of FP_SHINGLE-length
    sub-fingerprint shingles (Charikar 2002 vote, same semantics as
    dedup.simhash64: bit=1 iff strictly more than half vote 1).
    Signed int64 for Spark LongType. Empty input -> 0."""
    subs = np.asarray(subs, dtype=np.uint64)
    if subs.size == 0:
        return 0
    if subs.size < FP_SHINGLE:
        subs = np.pad(subs, (0, FP_SHINGLE - subs.size))
    n_sh = subs.size - FP_SHINGLE + 1
    shingles = np.zeros(n_sh, dtype=np.uint64)
    for j in range(FP_SHINGLE):
        shingles |= subs[j : j + n_sh] << np.uint64(16 * (FP_SHINGLE - 1 - j))
    hs = _splitmix64(shingles)
    shifts = np.arange(64, dtype=np.uint64)
    votes = ((hs[:, None] >> shifts[None, :]) & np.uint64(1)).sum(axis=0)
    bits = (votes * 2 > n_sh).astype(np.uint64)
    return int((bits << shifts).sum(dtype=np.uint64).astype(np.int64))


def fingerprint_for_clip(cid, blob, codec, sr_hz) -> tuple:
    """One AUDIO_FP_SCHEMA row — the pure per-row kernel shared by the
    mapInPandas operator and the frozen-truth fixture oracle
    (fixtures/audio_fp_fixtures.py), so the driver gate exercises the
    exact production code path (the features_for_clip convention)."""
    pcm, sr_dec, err = decode_blob(blob, codec, sr_hz)
    if pcm is None:
        return (cid, err, 0, 0, True)
    subs = subfingerprints(pcm, sr_dec)
    # zero spectro-temporal variation (silence / pure stationary tone /
    # sub-two-frame clip) carries no identity — flag it out of grouping
    degenerate = bool(subs.size == 0 or (subs == subs[0]).all())
    return (cid, None, int(subs.size), fp64_of_subfps(subs), degenerate)


AUDIO_FP_SCHEMA = StructType(
    [
        StructField("clip_id", StringType()),
        StructField("err", StringType()),
        StructField("n_subfp", IntegerType()),
        StructField("fp64", LongType()),
        StructField("fp_degenerate", BooleanType()),
    ]
)


def fingerprint_clips(df: DataFrame) -> DataFrame:
    """clips(clip_id, bytes, codec, sr_hz) -> AUDIO_FP_SCHEMA rows.
    One mapInPandas pass; PCM and the per-frame spectra die inside the
    stage (the extract_audio_features confinement shape)."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in AUDIO_FP_SCHEMA.fields]
        for b in batches:
            rows = [
                fingerprint_for_clip(
                    b.clip_id.iloc[i],
                    b.bytes.iloc[i],
                    b.codec.iloc[i],
                    None if pd.isna(b.sr_hz.iloc[i]) else int(b.sr_hz.iloc[i]),
                )
                for i in range(len(b))
            ]
            yield pd.DataFrame.from_records(rows, columns=cols)

    return df.select("clip_id", "bytes", "codec", "sr_hz").mapInPandas(
        compute, AUDIO_FP_SCHEMA
    )


def _eligible(fp: DataFrame) -> DataFrame:
    return fp.filter(F.col("err").isNull() & ~F.col("fp_degenerate")).select(
        "clip_id", "fp64"
    )


def audio_fp_pairs(
    fp: DataFrame,
    max_hamming: int = 7,
    max_bucket_size: int = 1024,
    observation=None,
) -> DataFrame:
    """(id_a, id_b, hamming) candidate near-dup pairs over decoded
    non-degenerate fingerprints — the materializable middle stage of
    the composed audio dedup job (jobs/run_audio_dedup.py commits this
    table so the component rounds never re-run the fingerprint UDF).

    Candidate generation is the simhash pigeonhole (dedup.py): 8
    blocks of 8 bits guarantee any pair within hamming <= 7 collides
    on at least one exact block; hot blocks are capped (a viral jingle
    cannot quadratically explode one bucket — drop accounting via
    `observation`). One shuffle on (blk_idx, blk)."""
    cand = _eligible(fp)
    blocked = cand.select(
        "clip_id",
        "fp64",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("fp64"), i * 8).bitwiseAND(F.lit(0xFF))
                    for i in range(8)
                ]
            )
        ).alias("blk_idx", "blk"),
    )
    buckets = capped_buckets(
        blocked,
        ["blk_idx", "blk"],
        F.struct("clip_id", "fp64"),
        max_bucket_size,
        observation=observation,
    )
    # canonical-block emission: a near pair collides in up to 8 blocks
    # and would be generated (and shuffled through dropDuplicates) up
    # to 8x — keep it only in the FIRST block where the two keys agree
    # (computable from the pair itself), so each pair is emitted exactly
    # once and the dedup shuffle carries 1/8th the rows. Exact while no
    # bucket hits the cap; under cap pressure a pair can be rank-dropped
    # from its canonical block's bucket yet survive in a later one, and
    # this filter would drop it — the same lossiness regime the cap
    # already puts us in, and the drop accounting flags it loudly.
    xor = F.col("p.a.fp64").bitwiseXOR(F.col("p.b.fp64"))
    first_match = F.array_position(
        F.array(
            *[
                F.shiftright(xor, i * 8).bitwiseAND(F.lit(0xFF)) == 0
                for i in range(8)
            ]
        ),
        True,
    )
    return (
        buckets.select(
            "blk_idx", F.explode(pair_array(F.col("ms"))).alias("p")
        )
        .filter(first_match == F.col("blk_idx") + 1)
        .select(
            F.col("p.a.clip_id").alias("id_a"),
            F.col("p.b.clip_id").alias("id_b"),
            F.bit_count(xor).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        # no dropDuplicates: canonical emission + i<j pair_array make
        # each unordered pair unique by construction (one shuffle saved;
        # pinned by test_audio_fp::test_pairs_match_brute_force)
    )


def audio_neardup_groups(
    fp: DataFrame,
    max_hamming: int = 7,
    max_bucket_size: int = 1024,
) -> DataFrame:
    """(clip_id, group_id) for EVERY input row: decoded non-degenerate
    clips within fp64 hamming <= max_hamming join a group labeled by
    its smallest clip_id; error rows and degenerate fingerprints stay
    singleton (group_id = clip_id). Pairs via audio_fp_pairs, then
    O(log n) component rounds over the pair list.

    The fp lineage is cut ONCE up front (lazy localCheckpoint of the
    ~20-byte/clip projection): this function references fp three times
    (pair blocking, the component node set, the final left join), and
    an unmaterialized fingerprint_clips lineage would re-run the
    decode+FFT UDF per reference — measured 3x the job's real cost at
    100k clips (the round-4 re-execution-per-reference class). The
    composed job (jobs/run_audio_dedup.py) materializes fingerprints
    to a parquet stage instead and never hits this path."""
    fp = fp.select("clip_id", "fp64", "fp_degenerate", "err").localCheckpoint(
        eager=False
    )
    pairs = audio_fp_pairs(fp, max_hamming, max_bucket_size)
    # components over PAIR ENDPOINTS only (nodes=None): clips in no
    # pair are singletons by definition and the left-join coalesce
    # below labels them — a corpus-wide node set would drag O(corpus)
    # rows through every iterative round instead of O(near-dup
    # members). Measured at 100k clips / 313k pairs (local[8]): the
    # corpus-node version scaled INVERSELY 2->8 (30->51s, per-round
    # label tables at corpus size); endpoint-only removes that term
    # (~31s both levels — what remains is pair-volume work plus the
    # iterative rounds' fixed job latency, which amortizes once pair
    # volume grows past toy scale). BENCH/R8_NOTES.md has the table.
    comp = connected_components(pairs, id_col="id")
    return fp.select("clip_id").join(
        comp, fp["clip_id"] == comp["id"], "left"
    ).select(
        "clip_id",
        F.coalesce(F.col("component"), F.col("clip_id")).alias("group_id"),
    )
