"""Generate the committed multimodal fixtures:

* data/media.parquet        — deterministic input media table (the same
  rows operators/multimodal.synthetic_media(n=240, seed=42) produces,
  regenerated here in PURE python so the fixture does not depend on the
  package under test)
* data/golden_media_features.parquet — expected extract_features output
* data/golden_media_resized.parquet  — expected resize_images output
* data/golden_media_frames.parquet   — expected sample_frames output

The expected outputs are computed with an INDEPENDENT inline
implementation of the deterministic stand-in decoders (numpy + hashlib
only — nothing imported from helix_html2md_spark), so the golden
parquets are a spec the Spark operators must match, not an echo of them.
tests/test_golden_media.py re-derives everything a third time.

Rerun after any intentional change to the stand-in decode semantics:
    python scratch/gen_golden_media.py
"""

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(ROOT, "data")
N, SEED = 240, 42
KINDS = ["image", "audio", "video"]
CTYPES = ["image/png", "audio/wav", "video/mp4"]


def media_rows():
    for i in range(N):
        payload = hashlib.sha256(f"{SEED}:{i}".encode()).digest() * (1 + i % 7)
        yield {
            "media_id": f"m{i:06d}",
            "doc_id": f"synth:{i % 100:08d}",
            "kind": KINDS[i % 3],
            "content_type": CTYPES[i % 3],
            "width": 64 + i % 512,
            "height": 64 + (i * 3) % 512,
            "duration_ms": 0 if i % 3 == 0 else 1000 + i % 9000,
            "payload": payload,
        }


def fake_decode(payload: bytes) -> np.ndarray:
    h = hashlib.sha1(payload).digest()
    return np.frombuffer((h * 8)[:64], dtype=np.uint8).astype(np.float32) / 255.0


def write(name, cols, schema):
    table = pa.table(cols, schema=pa.schema(schema))
    pq.write_table(table, os.path.join(DATA, name))
    print(f"{name}: {table.num_rows} rows")


def main():
    rows = list(media_rows())

    write(
        "media.parquet",
        {k: [r[k] for r in rows] for k in rows[0]},
        [
            ("media_id", pa.string()), ("doc_id", pa.string()),
            ("kind", pa.string()), ("content_type", pa.string()),
            ("width", pa.int32()), ("height", pa.int32()),
            ("duration_ms", pa.int32()), ("payload", pa.binary()),
        ],
    )

    # --- extract_features expectation (dim=16 mean-pool) ---------------
    feat = {k: [] for k in
            ("media_id", "doc_id", "kind", "n_bytes", "sha1", "feature",
             "feature_md5")}
    dim = 16
    for r in rows:
        arr = fake_decode(r["payload"])
        pooled = (
            arr[: dim * (len(arr) // dim)].reshape(-1, dim).mean(axis=0)
            if len(arr) >= dim
            else np.zeros(dim, np.float32)
        )
        pooled32 = np.asarray(pooled, dtype=np.float32)
        feat["media_id"].append(r["media_id"])
        feat["doc_id"].append(r["doc_id"])
        feat["kind"].append(r["kind"])
        feat["n_bytes"].append(len(r["payload"]))
        feat["sha1"].append(hashlib.sha1(r["payload"]).hexdigest())
        feat["feature"].append([float(x) for x in pooled32])
        feat["feature_md5"].append(hashlib.md5(pooled32.tobytes()).hexdigest())
    write(
        "golden_media_features.parquet",
        feat,
        [
            ("media_id", pa.string()), ("doc_id", pa.string()),
            ("kind", pa.string()), ("n_bytes", pa.int32()),
            ("sha1", pa.string()), ("feature", pa.list_(pa.float32())),
            ("feature_md5", pa.string()),
        ],
    )

    # --- resize_images expectation (32x32 nearest-neighbor) ------------
    out_w = out_h = 32
    res = {k: [] for k in
           ("media_id", "doc_id", "out_width", "out_height", "resized_sha1")}
    for r in rows:
        if r["kind"] != "image":
            continue
        arr = fake_decode(r["payload"])
        side = max(int(len(arr) ** 0.5), 1)
        img = arr[: side * side].reshape(side, side)
        ys = (np.arange(out_h) * side // out_h).clip(0, side - 1)
        xs = (np.arange(out_w) * side // out_w).clip(0, side - 1)
        blob = (img[np.ix_(ys, xs)] * 255).astype(np.uint8).tobytes()
        res["media_id"].append(r["media_id"])
        res["doc_id"].append(r["doc_id"])
        res["out_width"].append(out_w)
        res["out_height"].append(out_h)
        res["resized_sha1"].append(hashlib.sha1(blob).hexdigest())
    write(
        "golden_media_resized.parquet",
        res,
        [
            ("media_id", pa.string()), ("doc_id", pa.string()),
            ("out_width", pa.int32()), ("out_height", pa.int32()),
            ("resized_sha1", pa.string()),
        ],
    )

    # --- sample_frames expectation (every 1000 ms, max 32) -------------
    every_ms, max_frames = 1000, 32
    frm = {k: [] for k in
           ("media_id", "doc_id", "frame_idx", "ts_ms", "frame_sha1")}
    for r in rows:
        if r["kind"] != "video":
            continue
        n_frames = min(r["duration_ms"] // every_ms + 1, max_frames)
        for fi in range(n_frames):
            ts = fi * every_ms
            frame = hashlib.sha1(
                r["payload"] + ts.to_bytes(8, "big")
            ).digest()
            frm["media_id"].append(r["media_id"])
            frm["doc_id"].append(r["doc_id"])
            frm["frame_idx"].append(fi)
            frm["ts_ms"].append(ts)
            frm["frame_sha1"].append(hashlib.sha1(frame).hexdigest())
    write(
        "golden_media_frames.parquet",
        frm,
        [
            ("media_id", pa.string()), ("doc_id", pa.string()),
            ("frame_idx", pa.int32()), ("ts_ms", pa.int32()),
            ("frame_sha1", pa.string()),
        ],
    )


if __name__ == "__main__":
    main()
