"""Seeded media fixture (FIXTURES.md F8): genuine PNG/WAV/blob payloads.

Real container-format bytes for the real-decode path (functions/
media_decode.py): PNGs in gray/RGB/RGBA with deterministic pixel noise, WAV
sine tones, and unrecognizable blobs that exercise the stub fallback. Row
``i`` is a pure function of ``(seed, i)`` — the VALUES oracle regenerates
identical bytes through the same generator (kernel = oracle).
"""

from __future__ import annotations

import hashlib
import random
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..functions.media_decode import encode_png, encode_wav

MEDIA_SCHEMA = "media_id long, kind string, payload binary"

_KINDS = ("png_gray", "png_rgb", "png_rgba", "wav", "blob")


def media_row(seed: int, i: int) -> dict:
    key = hashlib.sha256(f"media:{seed}:{i}".encode()).digest()
    rng = random.Random(int.from_bytes(key[:8], "big"))
    nprng = np.random.RandomState(int.from_bytes(key[8:12], "big"))
    kind = _KINDS[i % len(_KINDS)]
    if kind.startswith("png"):
        c = {"png_gray": 1, "png_rgb": 3, "png_rgba": 4}[kind]
        h, w = rng.randint(4, 24), rng.randint(4, 24)
        payload = encode_png(nprng.randint(0, 256, size=(h, w, c)).astype(np.uint8))
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
