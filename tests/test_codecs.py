"""Pure-stdlib codecs (core/codecs.py): PNG/BMP/WAV.

Oracles are construction-time: pixel/sample arrays are built first,
encoded with the filter-0 writers (or hand-filtered scanlines for the
PNG filter coverage), and the decoder must return exactly those values.
No Spark needed except the final operator-integration test."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from helix_html2md_spark.core.codecs import (
    PNG_SIG, decode_bmp, decode_media, decode_png, decode_wav,
    encode_bmp, encode_png, encode_wav,
)


def _pix(h, w, ch=None, seed=7):
    rng = np.arange(h * w * (ch or 1), dtype=np.int64)
    vals = ((rng * 37 + seed * 101) % 256).astype(np.uint8)
    return vals.reshape((h, w) if ch is None else (h, w, ch))


def test_png_gray_roundtrip():
    a = _pix(5, 9)
    got = decode_png(encode_png(a))
    assert got.shape == (5, 9) and got.dtype == np.float32
    assert np.array_equal(got, a.astype(np.float32) / 255.0)


def test_png_rgb_roundtrip_collapses_mean():
    a = _pix(4, 3, 3)
    got = decode_png(encode_png(a))
    want = a.astype(np.float32).mean(axis=2) / 255.0
    assert np.allclose(got, want)


def _filter_line(f, line, prev, ch):
    """Encoder-side PNG filter (the spec's forward direction) — the
    construction oracle for the decoder's unfilter."""
    out = bytearray(len(line))
    for i in range(len(line)):
        a = line[i - ch] if i >= ch else 0
        b = prev[i]
        c = prev[i - ch] if i >= ch else 0
        if f == 0:
            v = line[i]
        elif f == 1:
            v = line[i] - a
        elif f == 2:
            v = line[i] - b
        elif f == 3:
            v = line[i] - ((a + b) >> 1)
        else:  # Paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            v = line[i] - pr
        out[i] = v & 0xFF
    return bytes(out)


def test_png_all_filter_types_unfilter():
    """One scanline per filter type 0..4, hand-filtered forward; the
    decoder must recover the original pixels for every type."""
    h, w, ch = 5, 7, 1
    a = _pix(h, w)
    prev = bytes(w * ch)
    raw = b""
    for y in range(h):
        line = a[y].tobytes()
        raw += bytes([y]) + _filter_line(y, line, prev, ch)
        prev = line

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    png = (
        PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    got = decode_png(png)
    assert np.array_equal(got, a.astype(np.float32) / 255.0)


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    with pytest.raises(ValueError):
        decode_png(PNG_SIG + b"\x00\x00")  # truncated
    # interlaced flag rejected
    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )
    bad = (
        PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1))
        + chunk(b"IDAT", zlib.compress(b"\x00ab\x00cd"))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(bad)


def test_bmp_roundtrip_padding_and_order():
    # w=3 forces 4-byte row padding; encoder writes bottom-up
    a = _pix(4, 3, 3)
    got = decode_bmp(encode_bmp(a))
    want = a.astype(np.float32).mean(axis=2) / 255.0
    assert got.shape == (4, 3)
    assert np.allclose(got, want)
    with pytest.raises(ValueError):
        decode_bmp(b"XX whatever")
    with pytest.raises(ValueError):
        decode_bmp(encode_bmp(a)[:30])  # truncated header


def test_wav_roundtrip_mono_and_stereo_mix():
    rate = 16000
    mono = np.sin(np.linspace(0, 6.28, 200)).astype(np.float32) * 0.5
    r, got = decode_wav(encode_wav(rate, mono))
    assert r == rate and got.shape == (200,)
    # 32767 encode scale vs 32768 decode scale + int truncation
    assert np.allclose(got, mono, atol=2.0 / 32767)
    # stereo: interleave L/R, decoder mixes by mean
    left = np.full(50, 0.5, np.float32)
    right = np.full(50, -0.5, np.float32)
    inter = np.empty(100, np.float32)
    inter[0::2], inter[1::2] = left, right
    r2, mixed = decode_wav(encode_wav(rate, inter, channels=2))
    assert mixed.shape == (50,)
    assert np.allclose(mixed, 0.0, atol=1.0 / 32767)
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxWAVEjunk")


def test_decode_media_dispatch():
    img = encode_png(_pix(3, 3))
    assert decode_media(img).shape == (3, 3)
    bmp = encode_bmp(_pix(2, 5, 3))
    assert decode_media(bmp).shape == (2, 5)
    wav = encode_wav(8000, np.zeros(10, np.float32))
    assert decode_media(wav).shape == (10,)
    with pytest.raises(ValueError):
        decode_media(b"\xff\xd8\xff\xe0 jpeg-ish")


def test_operators_run_real_codecs(spark):
    """The multimodal operators run the REAL decoder end-to-end: a
    table of actual PNG/BMP/WAV payloads flows through
    extract_features and resize_images with zero error rows, and the
    features/resizes are deterministic."""
    import pandas as pd

    from helix_html2md_spark.operators.multimodal import (
        extract_features, resize_images,
    )

    rows = []
    for i in range(6):
        kind = ["image", "image", "audio"][i % 3]
        if i % 3 == 0:
            payload = encode_png(_pix(8 + i, 6, seed=i))
            ct = "image/png"
        elif i % 3 == 1:
            payload = encode_bmp(_pix(5, 4 + i, 3, seed=i))
            ct = "image/bmp"
        else:
            payload = encode_wav(8000, np.linspace(-0.4, 0.4, 64 + i))
            ct = "audio/wav"
        rows.append(
            (f"m{i}", f"d{i}", kind, ct, None, None, None,
             bytearray(payload))
        )
    media = spark.createDataFrame(
        rows,
        "media_id string, doc_id string, kind string, content_type "
        "string, width int, height int, duration_ms int, payload binary",
    )
    feats = extract_features(media, decoder=decode_media).collect()
    assert len(feats) == 6
    assert all(r["error"] is None for r in feats), [r["error"] for r in feats]
    assert all(len(r["feature"]) == 16 for r in feats)
    # REAL pixels reach the pool: image features must not be the zero
    # vector (pre-fix, 2-D arrays pooled to zeros because len() counted
    # rows)
    assert all(
        any(abs(x) > 0 for x in r["feature"])
        for r in feats if r["kind"] == "image"
    )
    # determinism: re-run hashes identically
    again = {
        r["media_id"]: r["feature_md5"]
        for r in extract_features(media, decoder=decode_media).collect()
    }
    assert again == {r["media_id"]: r["feature_md5"] for r in feats}

    res = resize_images(media, 16, 16, decoder=decode_media).collect()
    assert len(res) == 4  # image rows only (JVM kind filter)
    assert all(r["error"] is None for r in res)
    assert all(len(bytes(r["resized"])) == 16 * 16 for r in res)
    # a corrupt payload degrades its ROW, not the task
    bad = spark.createDataFrame(
        [("mx", "dx", "image", "image/png", None, None, None,
          bytearray(b"\x89PNGgarbage"))],
        media.schema,
    )
    br = extract_features(bad, decoder=decode_media).collect()[0]
    assert br["error"] is not None and br["feature"] is None


def test_codec_hostile_payload_guards():
    """Decompression bombs, wrong exception types, and zero-dim
    encodes — every hostile path must raise ValueError cheaply."""
    import zlib as _z

    from helix_html2md_spark.core.codecs import MAX_PIXELS, encode_wav

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", _z.crc32(ctype + body) & 0xFFFFFFFF)
        )

    # 20000x20000 declared dims: rejected by the pixel cap BEFORE any
    # decompression (a ~1MB zero IDAT would expand to ~1.2GB)
    bomb = (
        PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 20000, 20000, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", _z.compress(b"\x00" * 1000))
        + chunk(b"IEND", b"")
    )
    assert 20000 * 20000 > MAX_PIXELS
    with pytest.raises(ValueError):
        decode_png(bomb)
    # garbage IDAT raises ValueError, not zlib.error
    garb = (
        PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", b"\xde\xad\xbe\xef")
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(garb)
    # short IHDR raises ValueError, not struct.error
    with pytest.raises(ValueError):
        decode_png(PNG_SIG + chunk(b"IHDR", b"\x00\x01") + chunk(b"IEND", b""))
    # truncated WAV fmt raises ValueError, not EOFError
    with pytest.raises(ValueError):
        decode_wav(b"RIFF\x24\x00\x00\x00WAVEfmt \x10\x00\x00\x00\x01")
    # zero-dim encodes rejected (round-trip symmetry with the decoders)
    with pytest.raises(ValueError):
        encode_png(np.zeros((0, 5), np.uint8))
    with pytest.raises(ValueError):
        encode_bmp(np.zeros((3, 0, 3), np.uint8))
    # IDAT longer than the declared dims: bounded decompress rejects
    extra = (
        PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", _z.compress(b"\x00ab" + b"trailing-junk"))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(extra)
