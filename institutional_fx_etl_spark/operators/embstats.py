"""Distributed embedding-matrix statistics (covariance via mergeable
Gram partials).

The reference engine has no embedding layer (its frames are OHLC
ticks, ``/root/reference/src/hybrid_merger.py``); this is part of the
LLM-training-data surface: the d×d covariance (the input to PCA
whitening / feature decorrelation) over an embedding column computed
WITHOUT ever materializing an n×d matrix on one machine.

Pattern: ``mapInPandas`` emits ONE partial row per Arrow batch —
``(n, Σq, Σ qqᵀ)`` with the vectors fix-pointed to integers — and the
partials reduce with plain integer sums. That is the canonical
"mergeable sufficient statistic" shape: the Python boundary touches
each row once (Arrow-vectorized numpy matmul), the shuffle moves only
``#batches × (d² + d)`` longs, and the d² output cells are computed
from exact integers so the result is bit-identical across engines,
partitionings, and batch sizes.

At 100 TB: the scan parallelizes per input split, each executor ships
~32 KB of partial per batch, and the final reduce is O(d²) — the plan
cost is one corpus read, full stop.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_covariance(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    scale: int = 1000,
) -> DataFrame:
    """Population covariance matrix of an ``array<float>`` column.

    Each component fix-points to ``floor(x·scale + 0.5)`` int64 (the
    float32→float64 widening is exact, so both engines quantize the
    same), per-batch partials accumulate ``n``, ``Σq`` (d longs) and
    the Gram matrix ``Σ qqᵀ`` (d² longs, exact integer matmul), and
    ``cov[i,j] = (G[i,j]/n − (S[i]/n)·(S[j]/n)) / scale²``.

    Output: upper triangle ``(i, j, cov)`` with ``i ≤ j`` — d(d+1)/2
    rows regardless of corpus size.
    """
    import numpy as np

    def gram_partials(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(dim, dtype=np.int64)
        g = np.zeros((dim, dim), dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            arr = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            q = np.floor(arr * float(scale) + 0.5).astype(np.int64)
            n += q.shape[0]
            s += q.sum(axis=0)
            g += q.T @ q
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
            )

    partials = df.select(vec_col).mapInPandas(
        gram_partials, schema="n long, s array<long>, g array<long>"
    )
    # persist NOT needed: the three reductions below reuse one shuffle
    # input each; the partials DF is tiny (#batches rows) either way
    partials = partials.localCheckpoint(eager=False)
    gsum = (
        partials.select(F.posexplode("g").alias("idx", "gv"))
        .groupBy("idx")
        .agg(F.sum("gv").alias("g"))
        .selectExpr(
            # BIGINT to match the DuckDB oracle's generate_series width;
            # the driver hash is sensitive to integer width, not just value
            f"CAST(idx div {dim} AS BIGINT) AS i",
            f"CAST(idx % {dim} AS BIGINT) AS j",
            "g",
        )
        .filter("i <= j")
    )
    ssum = (
        partials.select(F.posexplode("s").alias("pos", "sv"))
        .groupBy("pos")
        .agg(F.sum("sv").alias("s"))
    )
    nrow = partials.agg(F.sum("n").alias("n"))
    sc2 = f"({float(scale)!r} * {float(scale)!r})"
    return (
        gsum.join(
            F.broadcast(ssum.selectExpr("pos AS i", "s AS si")), "i"
        )
        .join(F.broadcast(ssum.selectExpr("pos AS j", "s AS sj")), "j")
        .crossJoin(F.broadcast(nrow))
        .selectExpr(
            "i",
            "j",
            # `+ 0.0` folds IEEE -0.0 to +0.0 (a negative covariance
            # rounding to zero keeps its sign bit; the driver hash is
            # bit-pattern-sensitive — the actual round-7 hash-red
            # cause, mirrored in the oracle)
            "round((CAST(g AS DOUBLE) / n"
            " - (CAST(si AS DOUBLE) / n) * (CAST(sj AS DOUBLE) / n))"
            f" / {sc2}, 6) + 0.0D AS cov",
        )
    )
