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


def _gram_partials(
    df: DataFrame, vec_col: str, dim: int, scale: int
) -> DataFrame:
    """One ``mapInPandas`` pass emitting a mergeable ``(n, Σq, Σqqᵀ)``
    partial per Arrow batch over fix-pointed int64 vectors — the
    shared sufficient statistic for :func:`embedding_covariance` and
    :func:`embedding_pca_power`."""
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
    # persist NOT needed: the reductions downstream reuse one shuffle
    # input each; the partials DF is tiny (#batches rows) either way
    return partials.localCheckpoint(eager=False)


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
    partials = _gram_partials(df, vec_col, dim, scale)
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


def embedding_pca_power(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    scale: int = 1000,
    iters: int = 3,
) -> DataFrame:
    """Top principal direction of the embedding corpus by FIXED-UNROLL
    power iteration over the (un-normalized) covariance — the
    whitening / decorrelation primitive downstream of
    :func:`embedding_covariance`, kept cross-engine EXACT with the
    same integer disciplines as pagerank_fixed and dsir_weights:

    - the corpus is touched ONCE (the shared integer Gram partials);
      everything after runs on the d² matrix rows;
    - the iteration matrix is ``M = n·G − s·sᵀ`` (∝ covariance —
      power iteration is scale-invariant), computed in DECIMAL(38,0)
      and then micro-quantized to ``mq = floor((M/max|M|)·1e6 + 0.5)``.
      Both operands of that one division are < 2⁵³, so BIGINT→DOUBLE
      is exact on every engine and the quantized matrix is
      bit-reproducible;
    - each unrolled step is ``w = Σⱼ mq·v`` (pure int64 sums —
      |w| ≤ d·10¹² < 2⁵³, so no float accumulation order exists) and
      a re-scale ``v' = floor((w/max|w|)·1e6 + 0.5)`` whose operands
      are again exactly-representable integers. Covariance is PSD so
      the dominant-eigenvector sign is stable from the all-ones
      start.

    Output: i (BIGINT, 0-based coordinate), v (BIGINT micro-units of
    the unit-∞-norm dominant eigenvector after ``iters`` steps).
    """
    partials = _gram_partials(df, vec_col, dim, scale)
    return _pca_from_partials(partials, dim, iters)


def embedding_pca_power_incremental(
    df: DataFrame,
    new_col: str,
    vec_col: str = "embedding",
    dim: int = 64,
    scale: int = 1000,
    iters: int = 3,
) -> DataFrame:
    """Incremental :func:`embedding_pca_power`: the old corpus
    contributes its PERSISTED Gram partial state (a handful of
    ``(n, Σq, Σqqᵀ)`` rows — at scale loaded from storage, never
    rescanned) and only the NEW batch is scanned; the partials merge
    by plain integer union-sum, so the result is EXACTLY the full
    run's eigenvector (the registered oracle IS the full-run SQL —
    the driver hash match proves incremental ≡ full, the
    knn_incremental pattern). Update cost: one new-batch scan +
    the O(d²) reduce."""
    old = df.filter(f"NOT {new_col}")
    new = df.filter(new_col)
    partials = _gram_partials(old, vec_col, dim, scale).unionByName(
        _gram_partials(new, vec_col, dim, scale)
    )
    return _pca_from_partials(partials, dim, iters)


def _pca_from_partials(
    partials: DataFrame, dim: int, iters: int
) -> DataFrame:
    """The fixed-unroll micro-quantized power iteration downstream of
    the Gram partials (shared by the full and incremental paths)."""
    gsum = (
        partials.select(F.posexplode("g").alias("idx", "gv"))
        .groupBy("idx")
        .agg(F.sum("gv").alias("g"))
        .selectExpr(
            f"CAST(idx div {dim} AS BIGINT) AS i",
            f"CAST(idx % {dim} AS BIGINT) AS j",
            "g",
        )
    )
    ssum = (
        partials.select(F.posexplode("s").alias("pos", "sv"))
        .groupBy("pos")
        .agg(F.sum("sv").alias("s"))
    )
    nrow = partials.agg(F.sum("n").alias("n"))
    m = (
        gsum.join(F.broadcast(ssum.selectExpr("pos AS i", "s AS si")), "i")
        .join(F.broadcast(ssum.selectExpr("pos AS j", "s AS sj")), "j")
        .crossJoin(F.broadcast(nrow))
        .selectExpr(
            "i",
            "j",
            # DECIMAL(38,0): n·G and s·sᵀ individually overflow int64
            # well below 100 TB corpora (G ~ n·scale², n·G ~ n²·scale²)
            "CAST(n AS DECIMAL(38,0)) * g"
            " - CAST(si AS DECIMAL(38,0)) * sj AS m",
        )
    )
    mmax = m.agg(F.expr("MAX(ABS(m)) AS mmax"))
    mq = (
        m.crossJoin(F.broadcast(mmax))
        .selectExpr(
            "i",
            "j",
            "CAST(floor((CAST(m AS DOUBLE) / CAST(mmax AS DOUBLE))"
            " * 1000000.0D + 0.5D) AS BIGINT) AS mq",
        )
        .localCheckpoint(eager=False)
    )
    v = mq.selectExpr("i").distinct().selectExpr(
        "i", "CAST(1000000 AS BIGINT) AS v"
    )
    for _ in range(iters):
        w = (
            mq.join(v.selectExpr("i AS j", "v"), "j")
            .groupBy("i")
            .agg(F.expr("SUM(mq * v) AS w"))
        )
        wmax = w.agg(F.expr("MAX(ABS(w)) AS wmax"))
        v = w.crossJoin(F.broadcast(wmax)).selectExpr(
            "i",
            "CAST(floor((CAST(w AS DOUBLE) / CAST(wmax AS DOUBLE))"
            " * 1000000.0D + 0.5D) AS BIGINT) AS v",
        )
    return v


def embedding_pca_project(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    scale: int = 1000,
    iters: int = 3,
) -> DataFrame:
    """Project every embedding onto the dominant principal direction
    from :func:`embedding_pca_power` — the 1-D "prototypicality"
    coordinate used for PCA-based outlier pruning and stratified
    selection over an embedding corpus.

    The eigenvector is a DRIVER-BOUNDED collect (d rows — the same
    bounded transfer as the k-means centroid literals) embedded as a
    literal, so the projection is a pure scan-side map: zero
    shuffles over the corpus beyond the iteration's own Gram pass.
    Each score is ``Σᵢ floor(xᵢ·scale + 0.5) · vᵢ`` — exact int64
    (|proj| ≤ d·scale·10⁶ ≪ 2⁶³), so the output is engine- and
    order-independent.

    Output: <id_col>, proj_q (BIGINT, scale·micro units).
    """
    from institutional_fx_etl_spark.functions.identifiers import bq, let1

    vrows = embedding_pca_power(df, vec_col, dim, scale, iters).collect()
    coeff = [0] * dim
    for r in vrows:
        coeff[int(r["i"])] = int(r["v"])
    vlit = "array(" + ", ".join(f"{c}L" for c in coeff) + ")"
    q = (
        f"transform({_as_double_expr(vec_col)},"
        f" x -> CAST(floor(x * {float(scale)!r}D + 0.5D) AS BIGINT))"
    )
    proj = let1(
        q,
        "__q",
        f"aggregate(zip_with(__q, {vlit}, (x, c) -> x * c), 0L,"
        " (a, x) -> a + x)",
    )
    return df.selectExpr(bq(id_col), f"{proj} AS proj_q")


def _as_double_expr(col: str) -> str:
    """``array<float|double>`` column → ``array<double>`` SQL expr."""
    return f"transform(`{col}`, x -> CAST(x AS DOUBLE))"
