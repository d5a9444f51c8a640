"""Image/video multimodal plumbing: schemas, batch shapes, determinism,
partition-preserving plans. Real codecs live in test_imaging; these
tests exercise the Arrow plumbing via the tests-only allow_fake decode
and pin the DEFAULT behavior for undecodable payloads: a typed error
row (ok=false, err="no_codec:<fmt>"), never fabricated features."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from go_pkg_spider_spark.operators import visual


def _img_rows(n):
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"img{i}".encode()).digest() * 4
        rows.append((f"img-{i}", bytearray(payload), 32, 16))
    return rows


def test_unknown_format_is_error_row_by_default(spark):
    """An unknown-format payload with no codec library present must
    produce ok=false + err=no_codec:* — NOT plausible fake features
    (round-3 verdict: silent fabrication is a data-honesty defect)."""
    df = spark.createDataFrame(
        _img_rows(2), "image_id string, payload binary, width int, height int"
    )
    out = {r.image_id: r for r in visual.image_features(df).collect()}
    for r in out.values():
        assert not r.ok
        assert r.err.startswith("no_codec:")
        assert r.mean_intensity == 0.0 and r.thumb_w == 0


def test_unknown_container_video_is_error_row_by_default(spark):
    df = spark.createDataFrame(
        [("v0", bytearray(b"not-a-video" * 20), 16, 8, 25, 12.5)],
        "video_id string, payload binary, width int, height int, n_frames int, fps double",
    )
    out = visual.video_frame_sample(df, every_nth=10).collect()
    assert len(out) == 1 and not out[0].ok and out[0].frame_idx == -1


def test_decode_image_raises_no_codec():
    with pytest.raises(ValueError, match="no_codec"):
        visual._decode_image(b"\x00\x01garbage", 8, 8)


def test_image_features_schema_and_determinism(spark):
    df = spark.createDataFrame(
        _img_rows(6) + [("img-bad", None, 32, 16)],
        "image_id string, payload binary, width int, height int",
    )
    out1 = {r.image_id: r for r in visual.image_features(df, allow_fake=True).collect()}
    out2 = {r.image_id: r for r in visual.image_features(df, allow_fake=True).collect()}
    assert set(out1) == {f"img-{i}" for i in range(6)} | {"img-bad"}
    for k in out1:
        assert out1[k] == out2[k]  # pure function of (bytes, dims)
    ok = out1["img-0"]
    assert ok.ok and 0 <= ok.mean_intensity <= 255 and ok.thumb_w == 8
    # fake pixels are uniform-ish: mean near 127, edges high
    assert 100 < ok.mean_intensity < 155 and ok.edge_ratio > 0.1
    bad = out1["img-bad"]
    assert not bad.ok and bad.err == "bad_meta"


def test_image_features_matches_local_fake(spark):
    """The Spark path must equal a driver-side recomputation from the
    same deterministic fake (pins batch plumbing: no row mixups)."""
    rows = _img_rows(3)
    df = spark.createDataFrame(
        rows, "image_id string, payload binary, width int, height int"
    )
    got = {r.image_id: r for r in visual.image_features(df, allow_fake=True).collect()}
    for rid, payload, w, h in rows:
        px = visual._fake_pixels(bytes(payload), w, h).astype(np.float64)
        assert abs(got[rid].mean_intensity - round(float(px.mean()), 6)) < 1e-9


def test_video_frame_sample_shape(spark):
    rows = [
        ("v0", bytearray(b"video-payload-0" * 10), 16, 8, 25, 12.5),
        ("v1", bytearray(b"video-payload-1" * 10), 16, 8, 5, 25.0),
        ("vbad", bytearray(b"x"), 16, 8, 0, 25.0),
    ]
    df = spark.createDataFrame(
        rows,
        "video_id string, payload binary, width int, height int, n_frames int, fps double",
    )
    out = visual.video_frame_sample(df, every_nth=10, allow_fake=True).collect()
    by_vid = {}
    for r in out:
        by_vid.setdefault(r.video_id, []).append(r)
    # 25 frames / every 10th -> frames 0,10,20; ts at 12.5 fps
    v0 = sorted(by_vid["v0"], key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in v0] == [0, 10, 20]
    assert [r.frame_ts_ms for r in v0] == [0, 800, 1600]
    assert v0[0].motion_proxy == 0.0 and v0[1].motion_proxy > 0.0
    assert [r.frame_idx for r in by_vid["v1"]] == [0]
    assert not by_vid["vbad"][0].ok


def test_visual_ops_no_shuffle(spark):
    df = spark.createDataFrame(
        _img_rows(4), "image_id string, payload binary, width int, height int"
    ).repartition(2)
    plan = (
        visual.image_features(df)._jdf.queryExecution().executedPlan().toString()
    )
    # one Python stage, partitioning inherited: the ONLY Exchange is the
    # explicit test repartition, and nothing reshuffles above the UDF
    assert "MapInPandas" in plan
    assert plan.count("Exchange") == 1
    assert "Exchange" not in plan.split("MapInPandas")[0]
