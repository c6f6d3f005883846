"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark side — schema, partition-preserving mapInPandas, Arrow batch
shape, deterministic feature extraction — is real and tested, and the
decode slot now has REAL pure-stdlib codecs for PNG, BMP, and WAV
(``core/codecs.py::decode_media`` — clean-room from the published
specs; tests/test_codecs.py drives the operators end-to-end over
actual encoded payloads).  JPEG/MP3/H.264 still require an injected
decoder (their entropy coders need native libraries absent from this
container): ``decode_image`` dispatches PNG/BMP/WAV natively and
raises for the rest, and ``fake_decode`` remains the deterministic
stand-in the golden-parquet driver oracles are pinned to.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id string, doc_id string, kind string, content_type string, "
    "width int, height int, duration_ms int, payload binary"
)

FEATURE_SCHEMA = (
    "media_id string, doc_id string, kind string, n_bytes int, "
    "sha1 string, feature array<float>, feature_md5 string, error string"
)


def decode_image(payload: bytes) -> np.ndarray:
    """Real decoder: PNG/BMP/WAV natively via the pure-stdlib codecs;
    other formats raise ValueError (inject PIL/libvips via
    ``extract_features(decoder=...)`` on a production cluster — both
    for JPEG/video coverage and for native-codec throughput)."""
    from ..core.codecs import decode_media

    return decode_media(payload)


def fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for decode: bytes -> pseudo-pixel array."""
    h = hashlib.sha1(payload).digest()
    arr = np.frombuffer((h * 8)[:64], dtype=np.uint8).astype(np.float32)
    return arr / 255.0


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes], np.ndarray] = fake_decode,
    dim: int = 16,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    One Python crossing per batch; the per-row work is vectorized numpy
    over the decoded arrays.  Real decode plugs in via ``decoder``.
    ``feature_md5`` is md5 over the float32 bytes of the pooled vector —
    a content address that pins the exact feature values through any
    later storage round-trip (and lets a golden-parquet oracle verify
    the whole decode->pool pipeline with a string compare).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, hashes, sizes, fmd5, errs = [], [], [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                hashes.append(hashlib.sha1(b).hexdigest())
                sizes.append(len(b))
                # per-row capture: with a REAL decoder injected, one
                # corrupt payload among billions must degrade its row,
                # never the task (same contract as operators/pdf.py)
                try:
                    # ravel: a REAL image decoder returns (h, w) pixels
                    # — without flattening, len() counts ROWS and a
                    # whole image silently pools to the zero vector.
                    # Identity for 1-D decoders (fake_decode, audio),
                    # so existing feature_md5 goldens are unchanged.
                    arr = np.asarray(decoder(b), dtype=np.float32).ravel()
                    # mean-pool to a fixed dim (the stand-in "embedding")
                    pooled = arr[: dim * (len(arr) // dim)].reshape(
                        -1, dim
                    ).mean(axis=0) if len(arr) >= dim else np.zeros(
                        dim, np.float32
                    )
                    pooled32 = np.asarray(pooled, dtype=np.float32)
                    feats.append([float(x) for x in pooled32])
                    fmd5.append(hashlib.md5(pooled32.tobytes()).hexdigest())
                    errs.append(None)
                except Exception as e:  # noqa: BLE001 - row resilience
                    feats.append(None)
                    fmd5.append(None)
                    errs.append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "n_bytes": sizes,
                    "sha1": hashes,
                    "feature": feats,
                    "feature_md5": fmd5,
                    "error": errs,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def synthetic_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic binary media table for tests/bench."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "media_id": [], "doc_id": [], "kind": [],
                "content_type": [], "width": [], "height": [],
                "duration_ms": [], "payload": [],
            }
            for i in pdf["id"]:
                i = int(i)
                payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (
                    1 + i % 7
                )
                rows["media_id"].append(f"m{i:06d}")
                rows["doc_id"].append(f"synth:{i % 100:08d}")
                rows["kind"].append(["image", "audio", "video"][i % 3])
                rows["content_type"].append(
                    ["image/png", "audio/wav", "video/mp4"][i % 3]
                )
                rows["width"].append(64 + i % 512)
                rows["height"].append(64 + (i * 3) % 512)
                rows["duration_ms"].append(0 if i % 3 == 0 else 1000 + i % 9000)
                rows["payload"].append(payload)
            yield pd.DataFrame(rows)

    return spark.range(0, n, numPartitions=4).mapInPandas(
        gen, schema=MEDIA_SCHEMA
    )


RESIZED_SCHEMA = (
    "media_id string, doc_id string, width int, height int, "
    "out_width int, out_height int, resized_sha1 string, resized binary, "
    "error string"
)


def resize_pixels(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resample of a (h, w) or (h, w, c) float array —
    pure numpy, deterministic; the real path swaps in PIL/libvips via
    the decoder.  ``np.ix_`` indexes the two leading axes, so channels
    (the trailing axis) ride along untouched."""
    h, w = arr.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return arr[np.ix_(ys, xs)]


def resize_images(
    media: DataFrame,
    out_w: int = 32,
    out_h: int = 32,
    decoder: Callable[[bytes], np.ndarray] = fake_decode,
) -> DataFrame:
    """Resize image rows to (out_w, out_h): decode (injectable codec
    slot; deterministic stand-in by default), nearest-neighbor resample
    in numpy, re-encode as raw bytes.  Arrow-batched, image rows only,
    partition-preserving — no shuffle, no per-row Python crossing.

    Decoder contract: may return a 2-D (h, w) grayscale array (the
    built-in codecs), a 3-D (h, w, c) channel array (a real PIL/libvips
    decoder — channels are preserved through the resample, and the
    emitted blob is h*w*c interleaved bytes), OR a 1-D feature vector
    (the deterministic stand-in), which is squared up for the resample.
    Pixel values: floats are treated as [0, 1] (clipped), integer
    dtypes as [0, 255] — a uint8 PIL image is normalized rather than
    wrapped modulo 256 by the uint8 re-encode."""
    # non-image payloads never cross Arrow: the kind filter is JVM-side
    media = media.filter(F.col("kind") == "image")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [], "doc_id": [], "width": [], "height": [],
                "out_width": [], "out_height": [], "resized_sha1": [],
                "resized": [], "error": [],
            }
            for row in pdf.itertuples(index=False):
                payload = bytes(row.payload) if row.payload is not None else b""
                try:
                    arr = np.asarray(decoder(payload))
                    if np.issubdtype(arr.dtype, np.integer):
                        # real decoders hand back uint8 [0, 255]; the
                        # *255 re-encode below would wrap modulo 256
                        arr = arr.astype(np.float64) / 255.0
                    if arr.ndim in (2, 3):
                        img = arr  # (h, w[, c]) — channels preserved
                    else:
                        flat = arr.ravel()
                        side = max(int(len(flat) ** 0.5), 1)
                        img = flat[: side * side].reshape(side, side)
                    resized = resize_pixels(img, out_w, out_h)
                    blob = (
                        (np.clip(resized, 0.0, 1.0) * 255)
                        .astype(np.uint8)
                        .tobytes()
                    )
                    sha, err = hashlib.sha1(blob).hexdigest(), None
                except Exception as e:  # noqa: BLE001 - row resilience
                    blob, sha, err = None, None, f"{type(e).__name__}: {e}"
                out["media_id"].append(row.media_id)
                out["doc_id"].append(row.doc_id)
                # NULL metadata stays NULL (int(NaN) raises; width/height
                # are nullable per MEDIA_SCHEMA and never validated)
                out["width"].append(
                    None if pd.isna(row.width) else int(row.width)
                )
                out["height"].append(
                    None if pd.isna(row.height) else int(row.height)
                )
                out["out_width"].append(out_w)
                out["out_height"].append(out_h)
                out["resized_sha1"].append(sha)
                out["resized"].append(blob)
                out["error"].append(err)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = (
    "media_id string, doc_id string, frame_idx int, ts_ms int, "
    "frame_sha1 string, frame binary, error string"
)


def decode_frame(payload: bytes, ts_ms: int):  # pragma: no cover
    """Real frame-decoder slot (pyav/ffmpeg on a production cluster)."""
    raise NotImplementedError(
        "video codecs are not available in this environment; "
        "inject a decoder via sample_frames(decoder=...)"
    )


def fake_frame(payload: bytes, ts_ms: int) -> bytes:
    """Deterministic frame stand-in: keyed hash of (payload, timestamp)."""
    return hashlib.sha1(payload + ts_ms.to_bytes(8, "big")).digest()


def sample_frames(
    media: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 32,
    decoder: Callable[[bytes, int], bytes] = fake_frame,
) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled
    timestamp (0, every_ms, 2*every_ms, ... up to duration, capped).

    Partition-preserving mapInPandas: a video's frames are emitted by
    the task that holds the video row — no shuffle, and the fan-out
    factor is bounded by ``max_frames`` so a 10-hour outlier cannot blow
    up one task's output.  Real decode plugs in via ``decoder``.
    """
    if every_ms <= 0:
        raise ValueError("every_ms must be positive")
    # non-video payloads never cross Arrow; NULL duration means
    # "unmeasured" — sampling it would fabricate a ts=0 frame nobody
    # measured (same contract as audio_chunks), and the NaN it arrives
    # as in pandas would crash int()
    media = media.filter(
        (F.col("kind") == "video") & F.col("duration_ms").isNotNull()
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [], "doc_id": [], "frame_idx": [],
                "ts_ms": [], "frame_sha1": [], "frame": [], "error": [],
            }
            for row in pdf.itertuples(index=False):
                payload = bytes(row.payload) if row.payload is not None else b""
                dur = int(row.duration_ms)
                n_frames = min(dur // every_ms + 1, max_frames)
                for fi in range(n_frames):
                    ts = fi * every_ms
                    try:
                        frame = decoder(payload, ts)
                        sha, err = hashlib.sha1(frame).hexdigest(), None
                    except Exception as e:  # noqa: BLE001 - row resilience
                        frame, sha = None, None
                        err = f"{type(e).__name__}: {e}"
                    out["media_id"].append(row.media_id)
                    out["doc_id"].append(row.doc_id)
                    out["frame_idx"].append(fi)
                    out["ts_ms"].append(ts)
                    out["frame_sha1"].append(sha)
                    out["frame"].append(frame)
                    out["error"].append(err)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def audio_chunks(
    media: DataFrame, chunk_ms: int = 5000, max_chunks: int = 4096
) -> DataFrame:
    """Audio chunk manifest: JVM-side explode of chunk boundaries per
    audio row (no decode — pure metadata; byte-range decode happens at
    the consumer with the codec slot).  One sequence/explode, no Python.

    Fan-out is bounded by ``max_chunks`` (same contract as
    ``sample_frames``'s max_frames: one corrupt duration_ms of 2^31
    must not explode a single task's output by ~429k rows — the
    default still admits ~5.7 hours of audio at 5 s chunks).  Negative
    durations are dropped with the NULLs: both mean "unmeasured", and
    a fabricated chunk with end_ms < start_ms poisons consumers.
    """
    if chunk_ms <= 0:
        raise ValueError("chunk_ms must be positive")
    if max_chunks <= 0:
        raise ValueError("max_chunks must be positive")
    n_chunks = F.least(
        F.greatest(
            F.ceil(F.col("duration_ms") / F.lit(chunk_ms)).cast("int"),
            F.lit(1),
        ),
        F.lit(max_chunks),
    )
    return (
        # NULL duration means "unmeasured": greatest/least skip NULLs,
        # which would otherwise fabricate a full [0, chunk_ms] chunk of
        # audio nobody measured — drop those rows instead
        media.filter(
            (F.col("kind") == "audio")
            & (F.col("duration_ms") >= 0)
        )
        .select(
            "media_id",
            "doc_id",
            "duration_ms",
            F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias(
                "chunk_idx", "_c"
            ),
        )
        .select(
            "media_id",
            "doc_id",
            "chunk_idx",
            (F.col("chunk_idx") * chunk_ms).alias("start_ms"),
            F.least(
                (F.col("chunk_idx") + 1) * chunk_ms, F.col("duration_ms")
            ).alias("end_ms"),
        )
    )


def media_stats(media: DataFrame) -> DataFrame:
    """JVM-side metadata aggregation (no decode needed)."""
    return (
        media.groupBy("kind")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.max("width").alias("max_width"),
        )
        .orderBy("kind")
    )
