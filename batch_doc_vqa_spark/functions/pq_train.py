"""Pure-Python mirrors of the Spark PQ / IVF×PQ trainers — the
kernel-as-oracle halves of ``operators.similarity.train_pq_codebook`` and
``operators.similarity.train_ivfpq_model``.

Why they exist: k-means is iterative, so the trained quantizers have no
closed SQL form — but the *trained model itself* is a deterministic function
of the sample, so an oracle can embed the model as SQL VALUES (the
``bootstrap_median_ci`` precedent: seeded kernel output as fixture rows) and
express everything downstream (encode → ADC → re-rank) in plain SQL. These
mirrors recompute the exact model the Spark trainers produce, step for
step, on the same rows:

- sampling: the ``sample_size`` rows with smallest md5(str(id)) — Python
  ``hashlib.md5`` hex compares identically to Spark's ``md5(cast(id as
  string))`` (both lowercase hex, ASCII order);
- canonical order: rows sorted by that md5 key before every fit (the Spark
  side re-sorts inside each ``applyInPandas`` group);
- fits: the SAME ``functions.kmeans.kmeans_fit`` kernel, same derived seeds
  (``seed`` for centroids, ``seed·1000 + m`` per sub-space);
- IVF assignment: squared-L2 as a LEFT fold over ``(x−y)²`` addends (the
  IEEE-identical form ``operators.similarity._sq_l2`` computes), rounded
  HALF_UP to 6 like Spark's ``F.round``, argmin tie-broken by cent_id.

Divergence between a mirror and its Spark twin is a bug in one of them —
``tests/test_dedup_similarity.py`` asserts bit-identity on the committed
fixture, and the driver's DuckDB gate re-proves it end-to-end every round.
"""

from __future__ import annotations

import decimal
import hashlib

import numpy as np

from .kmeans import kmeans_fit


def _md5_key(vec_id) -> str:
    return hashlib.md5(str(vec_id).encode()).hexdigest()


def _round6_half_up(x: float) -> float:
    """Spark's ``F.round(col, 6)`` (BigDecimal HALF_UP on the shortest
    decimal repr) — Python's builtin ``round`` is banker's, which differs
    exactly at .5 ULP boundaries."""
    return float(
        decimal.Decimal(repr(float(x))).quantize(
            decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
        )
    )


def _sq_l2_fold(a, b) -> float:
    """Left fold of (x−y)² — same addends, same order as ``_sq_l2``."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + (x - y) * (x - y)
    return acc


def _sample(rows, sample_size: int):
    """(md5_key, vector) for the ``sample_size`` md5-smallest ids, sorted —
    the exact frame the Spark trainers' ``orderBy(md5).limit(n)`` builds."""
    keyed = sorted(((_md5_key(i), [float(x) for x in v]) for i, v in rows))
    return keyed[:sample_size]


def train_pq_codebook_kernel(
    rows,
    m: int = 8,
    n_codes: int = 16,
    dim: int = 64,
    sample_size: int = 2048,
    iters: int = 20,
    seed: int = 11,
) -> list[tuple[int, int, list[float]]]:
    """(m, code, center) rows — bit-identical to collecting the DataFrame
    ``train_pq_codebook`` returns on the same ``rows`` = [(id, vector)]."""
    if dim % m:
        raise ValueError("dim must divide into m sub-spaces")
    sub = dim // m
    samp = _sample(rows, sample_size)
    out = []
    for mm in range(m):
        X = np.array([v[mm * sub : (mm + 1) * sub] for _, v in samp], dtype=np.float64)
        C = kmeans_fit(X, n_codes, iters, seed * 1000 + mm)
        out.extend((mm, code, [float(x) for x in c]) for code, c in enumerate(C, 1))
    return out


def train_ivfpq_model_kernel(
    rows,
    n_centroids: int = 16,
    m: int = 8,
    n_codes: int = 16,
    dim: int = 64,
    sample_size: int = 4096,
    iters: int = 20,
    seed: int = 11,
) -> tuple[list[tuple[int, list[float]]], list[tuple[int, int, list[float]]]]:
    """(centroids, codebook) — bit-identical to ``train_ivfpq_model`` on the
    same ``rows``: centroids as (cent_id, cent_vec), codebook as
    (m, code, center) over the sample's assignment residuals."""
    if dim % m:
        raise ValueError("dim must divide into m sub-spaces")
    sub = dim // m
    samp = _sample(rows, sample_size)
    X = np.array([v for _, v in samp], dtype=np.float64)
    C = kmeans_fit(X, n_centroids, iters, seed)
    cents = [(cid, [float(x) for x in c]) for cid, c in enumerate(C, 1)]
    residuals = []
    for _, v in samp:
        best = min(
            ((_round6_half_up(_sq_l2_fold(v, cv)), cid, cv) for cid, cv in cents),
            key=lambda t: (t[0], t[1]),
        )
        residuals.append([x - y for x, y in zip(v, best[2])])
    cb = []
    for mm in range(m):
        Xr = np.array([r[mm * sub : (mm + 1) * sub] for r in residuals], dtype=np.float64)
        Cm = kmeans_fit(Xr, n_codes, iters, seed * 1000 + mm)
        cb.extend((mm, code, [float(x) for x in c]) for code, c in enumerate(Cm, 1))
    return cents, cb
