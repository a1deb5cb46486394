"""Real media decoding from public container formats — no codec libraries.

The container ships no PIL/ffmpeg, but several formats are decodable with
nothing beyond the standard library + numpy, from their public specs:

Full pixel/frame decode (decode_status='ok' downstream):

- PNG  (RFC 2083 / ISO 15948): zlib-inflate IDAT, undo scanline filters 0-4
  (None/Sub/Up/Average/Paeth), 8-bit gray/RGB/RGBA — ``decode_png``;
- BMP  (Windows BITMAPINFOHEADER): uncompressed 24/32-bit pixels, bottom-up
  or top-down, BGR(A)→RGB(A) — ``decode_bmp``;
- WAV  (RIFF): stdlib ``wave`` — channels, sample rate, duration, and PCM
  frames for feature extraction.

Header-only probe (decode_status='probe' downstream — real dimensions, no
pixel access, so the publish gate can distinguish them from full decodes):

- GIF  (87a/89a): dimension probe from the logical screen descriptor;
- JPEG (ISO 10918): dimension probe from the SOF0/1/2 frame header.

Everything is a pure function of the payload bytes (kernel = oracle); the
Spark side calls these inside Arrow ``mapInPandas`` batches. Formats outside
this set fall back to the documented deterministic stub with
``decode_status='stub'`` — and the publish gate quarantines those rows.

Encoders for PNG (filter-0 scanlines) and WAV are included so fixtures and
oracles generate genuine format bytes.
"""

from __future__ import annotations

import struct
import wave
import zlib
from io import BytesIO

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# ------------------------------------------------------------------ probes


def probe_bytes(payload: bytes) -> dict | None:
    """Container-format probe → {kind, width, height, duration_ms} or None.

    Pure header parsing — never decodes pixel data. None = unrecognized
    (caller falls back to the stub and labels the row 'stub').
    """
    if payload.startswith(PNG_MAGIC) and len(payload) >= 24:
        w, h = struct.unpack(">II", payload[16:24])
        return {"kind": "image/png", "width": w, "height": h, "duration_ms": 0}
    if payload[:2] == b"BM" and len(payload) >= 26:
        w, h = struct.unpack("<ii", payload[18:26])
        return {"kind": "image/bmp", "width": w, "height": abs(h), "duration_ms": 0}
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        w, h = struct.unpack("<HH", payload[6:10])
        return {"kind": "image/gif", "width": w, "height": h, "duration_ms": 0}
    if payload[:2] == b"\xff\xd8":
        dims = _jpeg_dims(payload)
        if dims is not None:
            return {"kind": "image/jpeg", "width": dims[0], "height": dims[1], "duration_ms": 0}
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        try:
            with wave.open(BytesIO(payload)) as f:
                # a malformed fmt chunk can carry framerate=0; stdlib wave
                # accepts it, so guard the division (record-and-continue:
                # the row must become a stub, not a task-killing exception)
                ms = int(round(1000 * f.getnframes() / f.getframerate()))
                return {"kind": "audio/wav", "width": f.getnchannels(),
                        "height": f.getsampwidth() * 8, "duration_ms": ms}
        except (wave.Error, EOFError, ZeroDivisionError):
            return None
    return None


def _jpeg_dims(payload: bytes) -> tuple[int, int] | None:
    """Walk JPEG segments to the first SOF0/1/2 frame header (public layout:
    marker 0xFF,code, 2-byte length, then precision, height, width)."""
    i = 2
    n = len(payload)
    while i + 9 < n:
        if payload[i] != 0xFF:
            return None
        code = payload[i + 1]
        if code in (0xC0, 0xC1, 0xC2):
            h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
            return w, h
        if code in (0xD8, 0x01) or 0xD0 <= code <= 0xD7:  # no-length markers
            i += 2
            continue
        (seg_len,) = struct.unpack(">H", payload[i + 2 : i + 4])
        i += 2 + seg_len
    return None


# -------------------------------------------------------------- PNG decode

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, rgb, gray+a, rgba


def decode_png(payload: bytes) -> np.ndarray:
    """Full PNG pixel decode (8-bit depth, no interlace) → (h, w, c) uint8.

    Implements the spec's scanline reconstruction: concatenate IDAT chunks,
    inflate, then undo per-row filters. Rows with filter None/Up/Average
    reconstruct vectorized; Sub/Paeth are sequential along x by definition.
    """
    if not payload.startswith(PNG_MAGIC):
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    bit_depth = color_type = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (ln,), typ = struct.unpack(">I", payload[pos : pos + 4]), payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            width, height, bit_depth, color_type = struct.unpack(">IIBB", data[:10])
            if bit_depth != 8 or data[12] != 0:
                raise ValueError("unsupported PNG variant (need 8-bit, non-interlaced)")
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if width is None or color_type not in _CHANNELS:
        raise ValueError("bad PNG structure")
    c = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * c
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters, rows = arr[:, 0], arr[:, 1:].astype(np.int64)
    out = np.zeros((height, stride), dtype=np.int64)
    for y in range(height):
        f = filters[y]
        cur = rows[y].copy()
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.int64)
        if f == 0:
            out[y] = cur
        elif f == 2:  # Up
            out[y] = (cur + prev) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                left = out[y, x - c] if x >= c else 0
                out[y, x] = (cur[x] + (left + prev[x]) // 2) & 0xFF
        elif f in (1, 4):  # Sub / Paeth: sequential along x
            for x in range(stride):
                left = out[y, x - c] if x >= c else 0
                if f == 1:
                    out[y, x] = (cur[x] + left) & 0xFF
                else:
                    up = prev[x]
                    ul = prev[x - c] if x >= c else 0
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                    out[y, x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
    return out.astype(np.uint8).reshape(height, width, c)


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, c) uint8 → PNG bytes (filter-0 scanlines, one IDAT)."""
    h, w, c = pixels.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


# -------------------------------------------------------------- BMP decode


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP pixel decode → (h, w, 3|4) uint8 RGB(A).

    Public BITMAPFILEHEADER + BITMAPINFOHEADER layout: pixel-array offset at
    byte 10, width/height (signed; negative height = top-down) at 18, bit
    depth at 28, compression at 30 (must be 0 = BI_RGB). Rows are padded to
    4-byte boundaries and stored bottom-up in BGR(A) order — both undone here
    so features see the same orientation/channel order as PNG.
    """
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, compression={compression})")
    h, top_down = abs(h_signed), h_signed < 0
    c = bpp // 8
    stride = (w * c + 3) & ~3
    end = data_off + stride * h
    if w <= 0 or h == 0 or len(payload) < end:
        raise ValueError("BMP data length mismatch")
    rows = np.frombuffer(payload[data_off:end], dtype=np.uint8).reshape(h, stride)
    px = rows[:, : w * c].reshape(h, w, c)
    if not top_down:
        px = px[::-1]
    # BGR(A) → RGB(A)
    order = [2, 1, 0] + ([3] if c == 4 else [])
    return np.ascontiguousarray(px[..., order])


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit bottom-up BMP bytes (for fixtures)."""
    h, w, c = pixels.shape
    if c != 3:
        raise ValueError("encode_bmp writes 24-bit RGB only")
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):
        row = pixels[y, :, ::-1].tobytes()  # RGB → BGR
        body += row + b"\x00" * (stride - len(row))
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return file_hdr + info + bytes(body)


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono samples → WAV bytes (stdlib wave writer)."""
    buf = BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


# ----------------------------------------------------- derived real kernels


def resize_box(pixels: np.ndarray, max_w: int, max_h: int) -> np.ndarray:
    """Aspect-preserving downscale by area averaging (real resample math).

    scale = min(1, max_w/w, max_h/h); output pixel = mean of its source box.
    Upscaling never happens (scale clamped at 1). Deterministic integer
    output via floor of the box mean.
    """
    h, w, c = pixels.shape
    if w <= 0 or h <= 0:
        # degenerate decode (e.g. a BMP header declaring a zero dimension):
        # nothing to resample — return as-is rather than divide by zero
        return pixels.copy()
    s = min(1.0, max_w / w, max_h / h)
    ow, oh = max(1, int(w * s)), max(1, int(h * s))
    if (ow, oh) == (w, h):
        return pixels.copy()
    ys = (np.arange(oh + 1) * h // oh).astype(np.int64)
    xs = (np.arange(ow + 1) * w // ow).astype(np.int64)
    out = np.empty((oh, ow, c), dtype=np.uint8)
    for j in range(oh):
        for i in range(ow):
            box = pixels[ys[j] : ys[j + 1], xs[i] : xs[i + 1]]
            out[j, i] = box.reshape(-1, c).mean(axis=0).astype(np.uint8)
    return out


def image_features(pixels: np.ndarray) -> list[float]:
    """8 real image statistics (rounded 6): per-channel mean (first 3,
    gray-broadcast), global std, aspect, edge density proxies."""
    h, w, c = pixels.shape
    px = pixels.astype(np.float64)
    chan = [float(px[..., min(i, c - 1)].mean()) / 255.0 for i in range(3)]
    gx = float(np.abs(np.diff(px.mean(axis=2), axis=1)).mean()) / 255.0 if w > 1 else 0.0
    gy = float(np.abs(np.diff(px.mean(axis=2), axis=0)).mean()) / 255.0 if h > 1 else 0.0
    feats = chan + [
        float(px.std()) / 255.0,
        w / max(h, 1),
        gx,
        gy,
        float(px.min()) / 255.0,
    ]
    return [round(f, 6) for f in feats]


def audio_features(payload: bytes) -> list[float]:
    """4 real audio statistics from PCM frames: rms, peak, zero-cross rate,
    duration seconds (rounded 6)."""
    with wave.open(BytesIO(payload)) as f:
        frames = np.frombuffer(f.readframes(f.getnframes()), dtype="<i2").astype(np.float64)
        rate = f.getframerate()
    if rate <= 0:  # malformed fmt chunk; same guard as probe_bytes
        raise ValueError("zero WAV frame rate")
    if frames.size == 0:
        return [0.0, 0.0, 0.0, 0.0]
    norm = frames / 32768.0
    zc = float(np.mean(np.signbit(norm[1:]) != np.signbit(norm[:-1]))) if frames.size > 1 else 0.0
    return [
        round(float(np.sqrt(np.mean(norm**2))), 6),
        round(float(np.abs(norm).max()), 6),
        round(zc, 6),
        round(frames.size / rate, 6),
    ]
