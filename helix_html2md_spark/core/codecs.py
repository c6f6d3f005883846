"""Pure-stdlib media codecs: PNG, BMP, and WAV — REAL decoders for the
multimodal slots, clean-room from the published specs (PNG: ISO/IEC
15948 / RFC 2083 chunk + filter model over stdlib zlib; BMP:
BITMAPFILEHEADER/BITMAPINFOHEADER; WAV: RIFF PCM via the stdlib
``wave`` module).

These upgrade ``operators/multimodal.py``'s injectable decode slots
from stand-ins to real codecs for the formats a stdlib-only container
can handle.  JPEG/MP3/H.264 remain injectable (their entropy coders
need native libraries); on a production cluster PIL/libvips also wins
on throughput — these decoders are correctness-first, built for the
per-row Arrow batch path where one corrupt payload must raise (and
degrade its row) rather than crash a task.

All decoders return float32 in [0, 1] (images, grayscale ``(h, w)``;
RGB(A) collapses by channel mean) or [-1, 1] (audio, mono) — the shape
contract ``extract_features`` / ``resize_images`` already accept.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples/pixel

# Decode admission cap: a 1 MB crafted IDAT can deflate-expand ~1000x,
# and the unfilter pass is O(pixels) — without a cap one hostile
# payload OOMs or stalls an executor task instead of degrading its row
MAX_PIXELS = 16_777_216  # 16 MP


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> np.ndarray:
    """PNG -> grayscale float32 (h, w) in [0, 1].

    Supports bit depth 8, color types 0/2/4/6 (gray, RGB, gray+alpha,
    RGBA), non-interlaced — the overwhelming majority of real-corpus
    PNGs; anything else raises ValueError (the row-resilience contract
    turns that into an error ROW upstream).  Alpha is dropped; color
    collapses by RGB mean."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), data[
            pos + 4:pos + 8
        ]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            if length != 13:
                raise ValueError("malformed PNG IHDR")
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG depth/color ({depth},{color})")
    if comp != 0 or filt != 0:
        raise ValueError("unsupported PNG compression/filter method")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    if w == 0 or h == 0:
        raise ValueError("empty PNG")
    if w * h > MAX_PIXELS:
        raise ValueError(f"PNG exceeds {MAX_PIXELS} pixel cap ({w}x{h})")
    ch = _PNG_CHANNELS[color]
    stride = w * ch
    expected = h * (stride + 1)
    # bounded decompress: a tiny crafted IDAT can expand ~1000x, and a
    # plain zlib.decompress would allocate it ALL before the length
    # check — cap at expected+1 so oversized streams fail cheaply
    try:
        d = zlib.decompressobj()
        raw = d.decompress(b"".join(idat), expected + 1)
    except zlib.error as e:
        raise ValueError(f"corrupt PNG pixel stream: {e}") from None
    if len(raw) != expected or d.decompress(b"", 1):
        raise ValueError("PNG pixel data length mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = raw[y * (stride + 1)]
        base = y * (stride + 1) + 1
        if f == 0:
            line = np.frombuffer(raw, np.uint8, stride, base).copy()
        elif f == 1:  # Sub: per-channel prefix sum (exact mod 256)
            line = np.frombuffer(raw, np.uint8, stride, base).copy()
            for c in range(ch):
                line[c::ch] = np.cumsum(
                    line[c::ch], dtype=np.uint32
                ).astype(np.uint8)
        elif f == 2:  # Up: one vectorized add
            line = (
                np.frombuffer(raw, np.uint8, stride, base) + prev
            ).astype(np.uint8)
        elif f in (3, 4):  # Average/Paeth: inherently sequential
            bline = bytearray(raw[base:base + stride])
            if f == 3:
                for i in range(stride):
                    a = bline[i - ch] if i >= ch else 0
                    bline[i] = (bline[i] + ((a + prev[i]) >> 1)) & 0xFF
            else:
                for i in range(stride):
                    a = bline[i - ch] if i >= ch else 0
                    c2 = prev[i - ch] if i >= ch else 0
                    bline[i] = (
                        bline[i] + _paeth(a, int(prev[i]), c2)
                    ) & 0xFF
            line = np.frombuffer(bytes(bline), np.uint8, stride)
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = line
        prev = line
    px = out.reshape(h, w, ch).astype(np.float32)
    if color == 0:
        gray = px[:, :, 0]
    elif color == 4:  # gray + alpha: drop alpha
        gray = px[:, :, 0]
    else:  # RGB / RGBA: channel mean over RGB
        gray = px[:, :, :3].mean(axis=2)
    return gray / 255.0


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 (h, w) gray or (h, w, 3) RGB -> PNG bytes (filter 0)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color, ch = 0, 1
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] == 3:
        color, ch = 2, 3
    else:
        raise ValueError("encode_png expects (h,w) or (h,w,3) uint8")
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("cannot encode an empty image")
    raw = b"".join(
        b"\x00" + a[y].tobytes() for y in range(h)
    )

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB BMP -> grayscale float32 (h, w) in
    [0, 1].  Handles bottom-up (positive height) and top-down
    (negative) row order and 4-byte row padding."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP (bad signature)")
    if len(data) < 54:
        raise ValueError("truncated BMP header")
    offset = struct.unpack("<I", data[10:14])[0]
    w, h_signed = struct.unpack("<ii", data[18:26])
    _planes, bpp = struct.unpack("<HH", data[26:30])
    compression = struct.unpack("<I", data[30:34])[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, comp={compression})")
    if w <= 0 or h_signed == 0:
        raise ValueError("bad BMP dimensions")
    h = abs(h_signed)
    if w * h > MAX_PIXELS:
        raise ValueError(f"BMP exceeds {MAX_PIXELS} pixel cap ({w}x{h})")
    stride = (w * 3 + 3) & ~3
    if len(data) < offset + stride * h:
        raise ValueError("truncated BMP pixel data")
    px = (
        np.frombuffer(data, np.uint8, stride * h, offset)
        .reshape(h, stride)[:, : w * 3]
        .reshape(h, w, 3)
        .astype(np.float32)
        .mean(axis=2)
    )
    if h_signed > 0:  # positive height = bottom-up storage
        px = px[::-1]
    return px / 255.0


def encode_bmp(arr: np.ndarray) -> bytes:
    """uint8 (h, w, 3) RGB -> 24-bit bottom-up BMP bytes."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_bmp expects (h,w,3) uint8")
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("cannot encode an empty image")
    stride = (w * 3 + 3) & ~3
    pad = b"\x00" * (stride - w * 3)
    body = b"".join(
        a[y, :, ::-1].tobytes() + pad for y in range(h - 1, -1, -1)
    )  # BGR, bottom-up
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
    )
    return header + body


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """RIFF/PCM WAV -> (sample_rate, mono float32 in [-1, 1]).
    8/16/32-bit PCM via the stdlib ``wave`` module; multi-channel
    mixes by mean."""
    try:
        with wave.open(io.BytesIO(data), "rb") as wf:
            rate = wf.getframerate()
            nch = wf.getnchannels()
            width = wf.getsampwidth()
            frames = wf.readframes(wf.getnframes())
    except (wave.Error, EOFError, struct.error) as e:
        raise ValueError(f"bad WAV: {e}") from None
    if width == 1:  # unsigned 8-bit
        samples = (
            np.frombuffer(frames, dtype=np.uint8).astype(np.float32)
            - 128.0
        ) / 128.0
    elif width == 2:
        samples = (
            np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
        )
    elif width == 4:
        samples = (
            np.frombuffer(frames, dtype="<i4").astype(np.float32)
            / 2147483648.0
        )
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if nch > 1:
        samples = samples[: len(samples) - len(samples) % nch]
        samples = samples.reshape(-1, nch).mean(axis=1)
    return rate, samples


def encode_wav(rate: int, samples: np.ndarray, channels: int = 1) -> bytes:
    """float [-1, 1] -> 16-bit PCM WAV bytes (stdlib ``wave``).
    For channels > 1 the input is interleaved frames."""
    pcm = (
        np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0) * 32767.0
    ).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def decode_media(payload: bytes) -> np.ndarray:
    """Magic-byte dispatch for the multimodal decode slot: PNG and BMP
    return (h, w) grayscale pixels; RIFF/WAVE returns the mono sample
    vector (both float32, the shapes the feature/resize operators
    accept).  Anything else raises ValueError — the per-row try
    upstream turns that into an error row, never a task failure."""
    if payload[:8] == PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)[1]
    raise ValueError(
        "unsupported codec (PNG/BMP/WAV decode natively; inject a "
        "decoder for JPEG/MP3/video)"
    )
