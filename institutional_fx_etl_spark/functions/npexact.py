"""Bit-exact numpy kernels for the Arrow-vectorized similarity regime.

The similarity operators score candidates with interpreted SQL
higher-order functions (``aggregate(zip_with(...))``) — semantically
perfect, but every element is one interpreter dispatch, so an
O(n·cells·d) assignment or an O(Σ|cell|²·d) pair stage grows a large
constant at scale (the 10× heavy-family bench: knn_join 13× wall for
10× rows). These kernels compute the SAME doubles bit-for-bit so the
Arrow regime can replace the HOF regime above a size threshold without
perturbing a single oracle hash:

- **fold association**: the SQL fold is a left fold over dimensions;
  ``fold_dot``/``fold_sqnorm`` accumulate with one vectorized add per
  dimension IN DIMENSION ORDER, so every partial sum is the identical
  IEEE-754 double the HOF produces. (``X @ C.T`` would use pairwise /
  SIMD summation — right answer, different last ulp.)
- **rounding**: Spark's ``round(x, 6)`` is BigDecimal HALF_UP over the
  double's shortest decimal form. ``round6_block`` fast-paths with
  ``floor(x·1e6 + 0.5)/1e6`` and flags the rare boundary-risky cells
  (within 1e-6 of a half-integer at the 1e6 scale) for
  ``round6_exact`` — ``Decimal(repr(x))`` reproduces Java's
  ``BigDecimal.valueOf`` digit-for-digit, since both use the shortest
  round-trip representation.

Equality with the HOF paths is machine-gated in
tests/test_round7_ops.py (same corpus, both regimes, exact compare).
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import numpy as np


def fold_dot(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """(n, d) × (k, d) → (n, k) dot products, accumulated dimension by
    dimension — the same left-fold association as
    ``aggregate(zip_with(vv, cv, (x, y) -> x*y), 0.0d, (a, x) -> a+x)``.
    """
    n, d = X.shape
    k = C.shape[0]
    acc = np.zeros((n, k), dtype=np.float64)
    for j in range(d):
        acc += X[:, j, None] * C[None, :, j]
    return acc


def fold_sqnorm(X: np.ndarray) -> np.ndarray:
    """(n, d) → (n,) Σx² in dimension order (matches the norm fold)."""
    acc = np.zeros(X.shape[0], dtype=np.float64)
    for j in range(X.shape[1]):
        acc += X[:, j] * X[:, j]
    return acc


def centroid_norms(rows: list) -> np.ndarray:
    """Per-centroid ‖c‖ via the scalar left fold — identical to the
    precomputed ``nc`` literals in ``_scored_cells_expr``."""
    out = []
    for cv in rows:
        acc = 0.0
        for x in cv:
            acc += float(x) * float(x)
        out.append(math.sqrt(acc))
    return np.array(out, dtype=np.float64)


def round6_exact(x: float) -> float:
    """Java BigDecimal.valueOf(x).setScale(6, HALF_UP), reproduced."""
    if not math.isfinite(x):
        return x
    return float(
        Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    )


def round6_block(cc: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized 6-dp half-up rounding + a boolean mask of cells whose
    fast rounding might disagree with the exact decimal form (rows with
    any flagged cell must re-round through :func:`round6_exact`)."""
    y = cc * 1e6
    z = y + 0.5
    rc = np.floor(z) / 1e6
    risky = np.abs(z - np.rint(z)) < 1e-6
    return rc, risky


def exact_row_round(cc_row: np.ndarray) -> np.ndarray:
    """Exact 6-dp rounding of one row (the risky-row slow path)."""
    return np.array([round6_exact(float(x)) for x in cc_row])
