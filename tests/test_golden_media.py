"""Pin the multimodal golden parquets (data/golden_media_*.parquet) two
ways:

1. NON-CIRCULAR: re-derive every expected value here, inline, from the
   committed input table data/media.parquet using only numpy + hashlib —
   no imports from the package or from the generator script — and
   compare to the goldens.  If the goldens (or the stand-in decode
   semantics) drift, this fails.
2. OPERATOR EQUALITY: run the Spark operators on the same input and
   compare row-for-row to the goldens (including the raw float32
   feature vectors, not just their md5).
"""

import hashlib
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(ROOT, "data")
MEDIA = os.path.join(DATA, "media.parquet")


def _media_rows():
    return pq.read_table(MEDIA).to_pylist()


def _decode(payload: bytes) -> np.ndarray:
    # the stand-in decode spec: sha1(payload) tiled to 64 pseudo-pixels
    h = hashlib.sha1(payload).digest()
    return (
        np.frombuffer((h * 8)[:64], dtype=np.uint8).astype(np.float32) / 255.0
    )


def _expected_feature(payload: bytes):
    arr = _decode(payload)
    pooled = arr.reshape(-1, 16).mean(axis=0).astype(np.float32)
    return pooled, hashlib.md5(pooled.tobytes()).hexdigest()


def test_media_input_matches_synthetic_generator():
    """The committed input table must be exactly what the (seeded)
    synthetic_media generator describes — pure-python re-derivation."""
    rows = _media_rows()
    assert len(rows) == 240
    for i, r in enumerate(rows):
        payload = hashlib.sha256(f"42:{i}".encode()).digest() * (1 + i % 7)
        assert r["media_id"] == f"m{i:06d}"
        assert r["kind"] == ["image", "audio", "video"][i % 3]
        assert bytes(r["payload"]) == payload
        assert r["duration_ms"] == (0 if i % 3 == 0 else 1000 + i % 9000)


def test_golden_features_rederived():
    golden = {r["media_id"]: r for r in pq.read_table(
        os.path.join(DATA, "golden_media_features.parquet")).to_pylist()}
    rows = _media_rows()
    assert set(golden) == {r["media_id"] for r in rows}
    for r in rows:
        g = golden[r["media_id"]]
        payload = bytes(r["payload"])
        pooled, fmd5 = _expected_feature(payload)
        assert g["sha1"] == hashlib.sha1(payload).hexdigest()
        assert g["n_bytes"] == len(payload)
        assert g["feature_md5"] == fmd5
        assert np.array_equal(
            np.asarray(g["feature"], dtype=np.float32), pooled
        )


def test_golden_resized_rederived():
    golden = {r["media_id"]: r for r in pq.read_table(
        os.path.join(DATA, "golden_media_resized.parquet")).to_pylist()}
    images = [r for r in _media_rows() if r["kind"] == "image"]
    assert set(golden) == {r["media_id"] for r in images}
    for r in images:
        img = _decode(bytes(r["payload"]))[:64].reshape(8, 8)
        idx = (np.arange(32) * 8 // 32).clip(0, 7)
        blob = (img[np.ix_(idx, idx)] * 255).astype(np.uint8).tobytes()
        assert golden[r["media_id"]]["resized_sha1"] == (
            hashlib.sha1(blob).hexdigest()
        )


def test_golden_frames_rederived():
    golden = {}
    for r in pq.read_table(
        os.path.join(DATA, "golden_media_frames.parquet")
    ).to_pylist():
        golden[(r["media_id"], r["frame_idx"])] = r
    videos = [r for r in _media_rows() if r["kind"] == "video"]
    expect_keys = set()
    for r in videos:
        n_frames = min(r["duration_ms"] // 1000 + 1, 32)
        for fi in range(n_frames):
            expect_keys.add((r["media_id"], fi))
            frame = hashlib.sha1(
                bytes(r["payload"]) + (fi * 1000).to_bytes(8, "big")
            ).digest()
            g = golden[(r["media_id"], fi)]
            assert g["ts_ms"] == fi * 1000
            assert g["frame_sha1"] == hashlib.sha1(frame).hexdigest()
    assert set(golden) == expect_keys


@pytest.fixture(scope="module")
def media_df(spark):
    return spark.read.parquet(MEDIA)


def test_spark_features_match_golden(spark, media_df):
    from helix_html2md_spark.operators.multimodal import extract_features

    got = {r["media_id"]: r for r in extract_features(media_df).collect()}
    golden = pq.read_table(
        os.path.join(DATA, "golden_media_features.parquet")
    ).to_pylist()
    assert len(got) == len(golden)
    for g in golden:
        s = got[g["media_id"]]
        assert s["feature_md5"] == g["feature_md5"]
        assert s["sha1"] == g["sha1"] and s["n_bytes"] == g["n_bytes"]
        assert np.array_equal(
            np.asarray(s["feature"], dtype=np.float32),
            np.asarray(g["feature"], dtype=np.float32),
        )


def test_spark_resize_and_frames_match_golden(spark, media_df):
    from helix_html2md_spark.operators.multimodal import (
        resize_images, sample_frames,
    )

    got_r = {
        r["media_id"]: r["resized_sha1"]
        for r in resize_images(media_df, out_w=32, out_h=32).collect()
    }
    golden_r = {
        r["media_id"]: r["resized_sha1"]
        for r in pq.read_table(
            os.path.join(DATA, "golden_media_resized.parquet")
        ).to_pylist()
    }
    assert got_r == golden_r

    got_f = {
        (r["media_id"], r["frame_idx"]): (r["ts_ms"], r["frame_sha1"])
        for r in sample_frames(media_df, every_ms=1000, max_frames=32).collect()
    }
    golden_f = {
        (r["media_id"], r["frame_idx"]): (r["ts_ms"], r["frame_sha1"])
        for r in pq.read_table(
            os.path.join(DATA, "golden_media_frames.parquet")
        ).to_pylist()
    }
    assert got_f == golden_f


def test_null_metadata_and_corrupt_payload_degrade_rows(spark):
    """NULL duration/width/height media rows and a decoder that raises
    must degrade the ROW (error column / filtered), never the task —
    the contract operators/pdf.py established for binary inputs."""
    from helix_html2md_spark.operators.multimodal import (
        extract_features, resize_images, sample_frames,
    )

    media = spark.createDataFrame(
        [
            ("m0", "d0", "video", "video/mp4", None, None, None, b"vv"),
            ("m1", "d1", "video", "video/mp4", 8, 8, 1500, b"vv"),
            ("m2", "d2", "image", "image/png", None, None, None, b"ii"),
        ],
        "media_id string, doc_id string, kind string, content_type string,"
        " width int, height int, duration_ms int, payload binary",
    )
    # NULL-duration video is unmeasured: no fabricated ts=0 frame
    frames = sample_frames(media, every_ms=1000).collect()
    assert {r["media_id"] for r in frames} == {"m1"}
    assert len(frames) == 2 and all(r["error"] is None for r in frames)

    # NULL width/height stay NULL, row survives
    rz = {r["media_id"]: r for r in resize_images(media).collect()}
    assert rz["m2"]["width"] is None and rz["m2"]["resized_sha1"]

    def bomb(b):
        raise ValueError("corrupt payload")

    feats = {r["media_id"]: r for r in extract_features(media, decoder=bomb).collect()}
    assert len(feats) == 3
    assert all(r["feature"] is None for r in feats.values())
    assert all("corrupt payload" in r["error"] for r in feats.values())
    rz2 = {r["media_id"]: r for r in resize_images(media, decoder=bomb).collect()}
    assert rz2["m2"]["resized"] is None and "corrupt" in rz2["m2"]["error"]

    def bomb2(b, ts):
        raise ValueError("corrupt frame")

    fr2 = sample_frames(media, every_ms=1000, decoder=bomb2).collect()
    assert len(fr2) == 2 and all("corrupt frame" in r["error"] for r in fr2)
