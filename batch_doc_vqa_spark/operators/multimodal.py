"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The reference feeds page images to vision models as base64 payloads
(/root/reference/src/batch_doc_vqa/core/image_utils.py:13-16) and splits PDFs
into per-page images (utils/image_processing.py:8-53). At 100 TB the same
pattern is: binary column + typed metadata struct, processed by Arrow-batched
``mapInPandas`` so each Python worker sees whole record batches.

The actual codecs (PIL/ffmpeg) are NOT in this container, so the decode step
is a clearly-marked deterministic stub (`_STUB_DECODE`): it derives fake
dimensions/duration from a stable content hash. Everything around it — the
schemas, the batch iteration, the partition-size discipline (media rows are
big: repartition by size before mapInPandas), the UDF signatures — is the
real production plumbing and is tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_id string, kind string, n_bytes long, sha256 string, "
    "width int, height int, duration_ms long, decode_status string"
)

FRAME_SCHEMA = "media_id string, frame_idx int, ts_ms long, frame_sha string"

# Set True if a real codec library is wired in; the stub keeps the pipeline
# shape testable without one.
REAL_DECODE_AVAILABLE = False


def _stub_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode: (width, height, duration_ms) from content.

    Replace with PIL/ffmpeg when available; raising NotImplementedError here
    would be the strict-mode behavior.
    """
    h = hashlib.sha256(payload).digest()
    return 320 + h[0], 240 + h[1], 1000 * (1 + h[2] % 30)


def probe_media(df: DataFrame, id_col: str, bin_col: str, kind_col: str) -> DataFrame:
    """binary column → typed metadata rows via Arrow-batched mapInPandas."""

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            payloads = b[bin_col]
            meta = {
                "media_id": b[id_col].astype(str),
                "kind": b[kind_col],
                "n_bytes": payloads.map(lambda p: len(p) if p is not None else 0),
                "sha256": payloads.map(
                    lambda p: hashlib.sha256(p).hexdigest() if p is not None else ""
                ),
            }
            dims = payloads.map(lambda p: _stub_decode(p) if p else (0, 0, 0))
            meta["width"] = dims.map(lambda d: d[0])
            meta["height"] = dims.map(lambda d: d[1])
            meta["duration_ms"] = dims.map(lambda d: d[2])
            meta["decode_status"] = payloads.map(
                lambda p: ("stub" if not REAL_DECODE_AVAILABLE else "ok") if p else "empty"
            )
            yield pd.DataFrame(meta)

    return df.mapInPandas(probe, schema=MEDIA_META_SCHEMA)


def sample_frames(df: DataFrame, id_col: str, bin_col: str, every_ms: int = 5000) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame timestamp.

    The frame extraction itself is stubbed (frame_sha = hash(payload, ts));
    the fan-out shape (1 media row → N frame rows) is the real pattern.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out: dict[str, list] = {"media_id": [], "frame_idx": [], "ts_ms": [], "frame_sha": []}
            for mid, payload in zip(b[id_col].astype(str), b[bin_col]):
                if payload is None:
                    continue
                _, _, dur = _stub_decode(payload)
                for idx, ts in enumerate(range(0, dur, every_ms)):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["ts_ms"].append(ts)
                    out["frame_sha"].append(
                        hashlib.sha256(payload + ts.to_bytes(8, "big")).hexdigest()[:16]
                    )
            yield pd.DataFrame(out)

    return df.repartition(max(df.sparkSession.sparkContext.defaultParallelism, 8)).mapInPandas(
        sample, schema=FRAME_SCHEMA
    )


def base64_payloads(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """Binary payload → base64 transport encoding (P15).

    The reference base64-encodes page images for vision-model request bodies
    (core/image_utils.py:13-16). Pure JVM column expressions — no Python on
    the hot path; the data-URL prefix mirrors the reference's payload shape.
    Spark's base64 may emit MIME-chunked output (76-char lines joined by
    CRLF, spark.sql.legacy.chunkBase64String); strip the line breaks so the
    payload is canonical RFC 4648 regardless of session config.
    """
    b64 = F.regexp_replace(F.base64(F.col(bin_col)), "\r\n", "")
    return df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.length(F.col(bin_col)).alias("n_bytes"),
        b64.alias("payload_b64"),
        F.concat(F.lit("data:application/octet-stream;base64,"), b64).alias("data_url"),
    )


RESIZE_SCHEMA = "media_id string, width int, height int, out_w int, out_h int"


def resize_media(df: DataFrame, id_col: str, bin_col: str, max_w: int = 256, max_h: int = 256) -> DataFrame:
    """Aspect-preserving resize plumbing (decode stubbed, math real).

    Source dims come from the stub decode; the clamp is the real production
    formula: scale = min(1, max_w/w, max_h/h), out = floor(dim·scale). When a
    codec lands, only ``_stub_decode`` changes.
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out: dict[str, list] = {"media_id": [], "width": [], "height": [], "out_w": [], "out_h": []}
            for mid, payload in zip(b[id_col].astype(str), b[bin_col]):
                # only NULL payloads skip (same contract as extract_features);
                # zero-byte payloads still decode — silently dropping them
                # would lose rows with no status/quarantine trace
                if payload is None:
                    continue
                w, h, _ = _stub_decode(payload)
                s = min(1.0, max_w / w, max_h / h)
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["out_w"].append(int(w * s))
                out["out_h"].append(int(h * s))
            yield pd.DataFrame(out)

    return df.mapInPandas(resize, schema=RESIZE_SCHEMA)


FEATURE_DIM = 8
FEATURES_SCHEMA = "media_id string, " + ", ".join(f"f{i} double" for i in range(FEATURE_DIM))


def extract_features(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """Feature-extraction plumbing: payload → fixed-dim float features.

    The embedding model is stubbed deterministically (sha256 bytes / 255,
    rounded to 6); the Arrow batch shape, fixed-dim schema, and per-column
    layout (f0..f7 — arrays crash hash canonicalizers and lose pushdown) are
    the production pattern a real encoder drops into.
    """

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out: dict[str, list] = {"media_id": []}
            for i in range(FEATURE_DIM):
                out[f"f{i}"] = []
            for mid, payload in zip(b[id_col].astype(str), b[bin_col]):
                if payload is None:
                    continue
                digest = hashlib.sha256(payload).digest()
                out["media_id"].append(mid)
                for i in range(FEATURE_DIM):
                    out[f"f{i}"].append(round(digest[i] / 255.0, 6))
            yield pd.DataFrame(out)

    return df.mapInPandas(feats, schema=FEATURES_SCHEMA)
