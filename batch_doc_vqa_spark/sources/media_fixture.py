"""Seeded media fixture (FIXTURES.md F8): genuine container-format payloads.

Real container bytes for the real-decode path (functions/media_decode.py):
PNGs in gray/RGB/RGBA and 24-bit BMPs with deterministic pixel noise (full
pixel decode), WAV sine tones (frame decode), minimal-but-valid-header GIF/
JPEG payloads (header probe only → decode_status='probe'), and
unrecognizable blobs that exercise the stub fallback. Row ``i`` is a pure
function of ``(seed, i)`` — the VALUES oracle regenerates identical bytes
through the same generator (kernel = oracle).
"""

from __future__ import annotations

import hashlib
import random
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..functions.media_decode import encode_bmp, encode_png, encode_wav

MEDIA_SCHEMA = "media_id long, kind string, payload binary"

_KINDS = ("png_gray", "png_rgb", "png_rgba", "wav", "blob", "bmp", "gif", "jpeg")


def _gif_bytes(w: int, h: int, rng: random.Random) -> bytes:
    """GIF89a logical-screen header + noise body (probe reads bytes 6-10)."""
    body = bytes(rng.randrange(256) for _ in range(rng.randint(4, 40)))
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00" + body + b";"


def _jpeg_bytes(w: int, h: int, rng: random.Random) -> bytes:
    """SOI + SOF0 frame header (probe walks segments to SOF) + EOI."""
    sof = struct.pack(">BBHBHHB", 0xFF, 0xC0, 11, 8, h, w, 1) + b"\x01\x11\x00"
    com = bytes(rng.randrange(256) for _ in range(8))
    return b"\xff\xd8" + b"\xff\xfe" + struct.pack(">H", 10) + com + sof + b"\xff\xd9"


def media_row(seed: int, i: int) -> dict:
    key = hashlib.sha256(f"media:{seed}:{i}".encode()).digest()
    rng = random.Random(int.from_bytes(key[:8], "big"))
    nprng = np.random.RandomState(int.from_bytes(key[8:12], "big"))
    kind = _KINDS[i % len(_KINDS)]
    if kind.startswith("png"):
        c = {"png_gray": 1, "png_rgb": 3, "png_rgba": 4}[kind]
        h, w = rng.randint(4, 24), rng.randint(4, 24)
        payload = encode_png(nprng.randint(0, 256, size=(h, w, c)).astype(np.uint8))
    elif kind == "bmp":
        h, w = rng.randint(4, 24), rng.randint(4, 24)
        payload = encode_bmp(nprng.randint(0, 256, size=(h, w, 3)).astype(np.uint8))
    elif kind == "gif":
        payload = _gif_bytes(rng.randint(4, 640), rng.randint(4, 480), rng)
    elif kind == "jpeg":
        payload = _jpeg_bytes(rng.randint(4, 640), rng.randint(4, 480), rng)
    elif kind == "wav":
        n = rng.randint(800, 4000)
        freq = rng.uniform(0.02, 0.4)
        samples = (np.sin(np.arange(n) * freq) * rng.randint(5000, 30000)).astype(np.int16)
        payload = encode_wav(samples, rate=8000)
    else:
        payload = bytes(nprng.randint(0, 256, size=rng.randint(16, 200)).astype(np.uint8))
    return {"media_id": i, "kind": kind, "payload": payload}


def media_df(spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None) -> DataFrame:
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = [media_row(seed, int(i)) for i in b["id"].to_numpy()]
            yield pd.DataFrame(
                {
                    "media_id": [r["media_id"] for r in rows],
                    "kind": [r["kind"] for r in rows],
                    "payload": [r["payload"] for r in rows],
                }
            )

    return spark.range(0, n, numPartitions=parts).mapInPandas(gen, schema=MEDIA_SCHEMA)
