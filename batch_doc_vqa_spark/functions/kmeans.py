"""Deterministic k-means for PQ / IVF codebook training.

Pure-numpy kernel (the repo's kernel-as-oracle rule: the Spark side feeds it
via ``applyInPandas``; nothing here touches Spark). Determinism contract:

- seeded k-means++ init (``np.random.RandomState(seed)``), seed passed IN —
  callers derive it from data (e.g. the sub-space index), never from Spark
  task/partition ids;
- the caller must present rows in a CANONICAL order (sort by a data-derived
  key before calling) — k-means++ draws indices, so row order is part of
  the model identity;
- empty clusters reseed to the currently-farthest point (deterministic);
- returned centers are sorted lexicographically, so code labels are stable
  regardless of init order.

Centers round to 6 decimals — the repo-wide cross-engine float discipline:
every distance computed against them downstream re-rounds to 6 before any
argmin/rank, so a float32/float64 re-materialization of the codebook cannot
flip an assignment.
"""

from __future__ import annotations

import numpy as np


def kmeans_fit(X: np.ndarray, k: int, iters: int = 20, seed: int = 0) -> np.ndarray:
    """Fit k-means on rows of ``X`` (n × d float64). Returns ≤k centers,
    lexicographically sorted, rounded to 6 decimals."""
    X = np.asarray(X, dtype=np.float64)
    n = len(X)
    if n == 0:
        raise ValueError("kmeans_fit: empty sample")
    k = min(k, n)
    rng = np.random.RandomState(seed)
    # k-means++ init
    centers = [X[rng.randint(n)]]
    for _ in range(1, k):
        d2 = np.min(((X[:, None, :] - np.asarray(centers)[None, :, :]) ** 2).sum(-1), axis=1)
        tot = d2.sum()
        if tot > 0:
            centers.append(X[rng.choice(n, p=d2 / tot)])
        else:  # all points coincide with a center — any pick is equivalent
            centers.append(X[rng.randint(n)])
    C = np.asarray(centers, dtype=np.float64)
    for _ in range(iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        lab = d2.argmin(1)
        # empty clusters reseed to the farthest points, each to a DISTINCT
        # one: reseeding every empty cluster to the same argmax would fuse
        # them into permanently duplicated centers (one lost code slot per
        # collision)
        far_order = iter(np.argsort(-d2.min(1)))
        moved = False
        for j in range(k):
            pts = X[lab == j]
            nc = pts.mean(0) if len(pts) else X[next(far_order)]
            if not np.array_equal(nc, C[j]):
                C[j] = nc
                moved = True
        if not moved:
            break
    C = np.round(C, 6)
    order = np.lexsort(C.T[::-1])  # lexicographic row sort → stable labels
    return C[order]
