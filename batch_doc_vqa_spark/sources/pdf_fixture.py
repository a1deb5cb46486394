"""Seeded real-PDF fixture (FIXTURES.md F7): deterministic %PDF- payloads.

A crawl corpus contains real PDFs alongside HTML; the reference ingests them
as first-class input (utils/image_processing.py:8-53). This fixture generates
genuine PDF 1.4 bytes via ``pdf_real.encode_minimal_pdf`` — FlateDecode by
default, with deterministic minorities exercising every dispatch branch:

- ``i % 13 == 0`` → uncompressed content streams (raw-stream path);
- ``i % 17 == 0`` → /Encrypt in the trailer → ``unsupported_format``;
- ``i % 19 == 0`` → a /DCTDecode stream → ``unsupported_format``.

Row ``i`` is a pure function of ``(seed, i)`` (sha256-keyed RNG), so the
VALUES oracle and any partitioning see identical bytes.
"""

from __future__ import annotations

import hashlib
import random
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..functions.pdf_real import encode_minimal_pdf
from .pages import _WORDS

PDFS_SCHEMA = "doc_id long, pdf binary"


def pdf_row(seed: int, i: int) -> dict:
    """Pure function (seed, i) → one PDF-corpus row."""
    key = hashlib.sha256(f"pdfs:{seed}:{i}".encode()).digest()
    rng = random.Random(int.from_bytes(key[:8], "big"))
    pages = [
        [
            " ".join(rng.choice(_WORDS) for _ in range(rng.randint(4, 9))).capitalize()
            for _ in range(rng.randint(2, 6))
        ]
        for _ in range(rng.randint(1, 3))
    ]
    if i % 19 == 0:
        # unsupported filter: a real scan-only shape (image stream, no text)
        body = rng.randbytes(64)
        payload = (
            b"%PDF-1.4\n1 0 obj\n<< /Filter /DCTDecode /Length "
            + str(len(body)).encode()
            + b" >>\nstream\n"
            + body
            + b"\nendstream\nendobj\ntrailer\n<< /Root 1 0 R >>\n%%EOF\n"
        )
    else:
        payload = encode_minimal_pdf(
            pages, compress=(i % 13 != 0), encrypted=(i % 17 == 0)
        )
    return {"doc_id": i, "pdf": payload}


def pdfs_df(spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic generation (same pattern as pages_df)."""
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = [pdf_row(seed, int(i)) for i in b["id"].to_numpy()]
            yield pd.DataFrame(
                {"doc_id": [r["doc_id"] for r in rows], "pdf": [r["pdf"] for r in rows]}
            )

    return spark.range(0, n, numPartitions=parts).mapInPandas(gen, schema=PDFS_SCHEMA)
