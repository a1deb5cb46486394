"""SPDF: a synthetic binary page-layout payload + XY-cut reading-order parser.

The reference splits real PDFs into page images and lets a vision model read
them (/root/reference/src/batch_doc_vqa/utils/image_processing.py:8-53). Real
PDF rasterization libraries are not available in this container, so the binary
branch of the pipeline uses a deterministic stand-in format that still
exercises the interesting part — layout analysis:

    SPDF1\\0 | uint32 n_blocks | n_blocks × (4×float32 bbox, uint32 len, utf8)

bbox is (x0, y0, x1, y1) with y growing downward. ``extract_spdf`` runs
recursive XY-cut segmentation (split on the widest whitespace gap, horizontal
cuts preferred) to recover reading order, then emits the block texts joined by
blank lines with span offsets — the same output contract as the HTML path.

Pure NumPy, deterministic; used both as the test oracle and inside the Arrow
UDF batches.
"""

from __future__ import annotations

import struct

import numpy as np

SPDF_MAGIC = b"SPDF1\x00"
_MIN_GAP = 4.0  # minimum whitespace gap (layout units) that constitutes a cut


def encode_spdf(blocks: list[tuple[tuple[float, float, float, float], str]]) -> bytes:
    """Serialize [(bbox, text), ...] to SPDF bytes (generator + test helper)."""
    out = [SPDF_MAGIC, struct.pack("<I", len(blocks))]
    for (x0, y0, x1, y1), text in blocks:
        data = text.encode("utf-8")
        out.append(struct.pack("<ffffI", x0, y0, x1, y1, len(data)))
        out.append(data)
    return b"".join(out)


def decode_spdf(payload: bytes) -> tuple[np.ndarray, list[str]]:
    if payload[: len(SPDF_MAGIC)] != SPDF_MAGIC:
        raise ValueError("not an SPDF payload")
    off = len(SPDF_MAGIC)
    (n,) = struct.unpack_from("<I", payload, off)
    off += 4
    boxes = np.empty((n, 4), dtype=np.float64)
    texts: list[str] = []
    for i in range(n):
        x0, y0, x1, y1, ln = struct.unpack_from("<ffffI", payload, off)
        off += 20
        boxes[i] = (x0, y0, x1, y1)
        texts.append(payload[off : off + ln].decode("utf-8"))
        off += ln
    return boxes, texts


def _gap_cut(lo: np.ndarray, hi: np.ndarray) -> tuple[float, float] | None:
    """Widest whitespace gap ≥ _MIN_GAP in the 1-D projection of intervals.

    Returns (gap_width, cut_position) or None.
    """
    order = np.argsort(lo, kind="stable")
    lo, hi = lo[order], hi[order]
    run_hi = np.maximum.accumulate(hi)
    gaps = lo[1:] - run_hi[:-1]
    if gaps.size == 0:
        return None
    j = int(np.argmax(gaps))
    if gaps[j] < _MIN_GAP:
        return None
    return float(gaps[j]), float((run_hi[j] + lo[j + 1]) / 2.0)


def _xy_cut(boxes: np.ndarray, idx: np.ndarray, out: list[int], depth: int = 0) -> None:
    if idx.size == 0:
        return
    if idx.size == 1 or depth > 32:
        out.extend(sorted(idx.tolist(), key=lambda i: (boxes[i, 1], boxes[i, 0])))
        return
    b = boxes[idx]
    gy = _gap_cut(b[:, 1], b[:, 3])  # horizontal cut (top/bottom bands)
    gx = _gap_cut(b[:, 0], b[:, 2])  # vertical cut (left/right columns)
    # widest-gap-first: a wide column gutter beats narrow inter-line gaps,
    # so multi-column layouts read column-major
    if gy is not None and (gx is None or gy[0] >= gx[0]):
        top = idx[b[:, 3] <= gy[1]]
        bot = idx[b[:, 3] > gy[1]]
        _xy_cut(boxes, top, out, depth + 1)
        _xy_cut(boxes, bot, out, depth + 1)
        return
    if gx is not None:
        left = idx[b[:, 2] <= gx[1]]
        right = idx[b[:, 2] > gx[1]]
        _xy_cut(boxes, left, out, depth + 1)
        _xy_cut(boxes, right, out, depth + 1)
        return
    out.extend(sorted(idx.tolist(), key=lambda i: (boxes[i, 1], boxes[i, 0])))


def extract_spdf(payload: bytes) -> tuple[str, list[tuple[int, int, str]]]:
    """Decode an SPDF payload → (text, spans) in XY-cut reading order."""
    boxes, texts = decode_spdf(payload)
    if not texts:
        return "", []
    order: list[int] = []
    _xy_cut(boxes, np.arange(len(texts)), order)
    out: list[str] = []
    spans: list[tuple[int, int, str]] = []
    offset = 0
    for i in order:
        t = texts[i].strip()
        if not t:
            continue
        if out:
            offset += 2
        spans.append((offset, offset + len(t), "pdf_block"))
        offset += len(t)
        out.append(t)
    return "\n\n".join(out), spans


def split_blocks(payload: bytes | None) -> list[dict]:
    """Pure kernel: SPDF payload → per-block rows in reading order.

    One dict per extracted span: ``{"block_idx", "bbox", "block_text"}``,
    ``bbox`` as ``[x0, y0, x1, y1]`` floats (empty when the span text can't be
    mapped back to a source box). Non-SPDF / null payloads → ``[]``. This is
    the oracle for ``split_blocks_udf`` — the Spark UDF calls this exact code.
    """
    if payload is None or payload[: len(SPDF_MAGIC)] != SPDF_MAGIC:
        return []
    text, spans = extract_spdf(payload)
    boxes, texts = decode_spdf(payload)
    blocks: list[dict] = []
    by_text: dict[str, list[int]] = {}
    for i, t in enumerate(texts):
        by_text.setdefault(t.strip(), []).append(i)
    for j, (s, e, _) in enumerate(spans):
        seg = text[s:e]
        idx = by_text.get(seg, [None]).pop(0) if by_text.get(seg) else None
        bbox = [float(v) for v in boxes[idx]] if idx is not None else []
        blocks.append({"block_idx": j, "bbox": bbox, "block_text": seg})
    return blocks
