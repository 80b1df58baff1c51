"""Dataset profiling — the first query anyone runs on unfamiliar data.

The reference has no profiling surface (its validator re-derives one
known pipeline); this is the generic per-column summary a 100 TB data
platform exposes: row count, null count, exact distinct count, min and
max per column, one result row per column.

Plan shape: one aggregate per column UNIONed — parquet column pruning
makes each branch a single-column scan, and Catalyst runs the branches
as independent stages, so the whole profile reads each column exactly
once with no wide expand operator (the multi-`count(distinct)` single
pass plans an Expand that multiplies the scan by the column count —
strictly worse). Min/max serialize to strings so the result schema is
column-type-agnostic.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column profile: (column, n_rows, n_nulls, n_distinct,
    min_value, max_value) — one row per requested column, distinct
    counts EXACT (each branch is its own single-column aggregate, so
    no cross-column Expand blowup; swap ``approx_count_distinct`` in
    per branch when ±2% is acceptable at extreme cardinality)."""
    branches = []
    for c in cols:
        branches.append(
            df.select(
                F.lit(c).alias("column"),
                F.col(c).alias("__v"),
            )
            .groupBy("column")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("__v").isNull().cast("long")).alias("n_nulls"),
                F.count_distinct("__v").alias("n_distinct"),
                F.min("__v").cast("string").alias("min_value"),
                F.max("__v").cast("string").alias("max_value"),
            )
        )
    return reduce(DataFrame.unionByName, branches)


#: Benford expected first-digit frequencies log10(1 + 1/d), frozen as
#: 6-dp literals so Spark and any oracle emit bit-identical doubles
#: (libm log10 may differ in the last ulp between engines).
BENFORD_EXPECTED = {
    1: 0.301030, 2: 0.176091, 3: 0.124939, 4: 0.096910, 5: 0.079181,
    6: 0.066947, 7: 0.057992, 8: 0.051153, 9: 0.045757,
}


def benford_profile(
    df: DataFrame, value_col: str, scale: int = 100
) -> DataFrame:
    """First-significant-digit (Benford) distribution of a positive
    numeric column — a classic fraud/synthetic-data screen for large
    numeric datasets.

    Exactness engineering: the value is fixed-pointed to an integer
    (``floor(x·scale + 0.5)``) and the first digit read from the
    BIGINT's STRING form — identical across engines, where a
    float ``log10``-magnitude approach can misclassify values that sit
    on powers of ten. One groupBy on a 9-value key; ratios get ONE
    division against the broadcast total.

    Output per digit 1-9: digit, n, ratio (6 dp), expected (Benford
    literal), deviation = ratio − expected (6 dp).
    """
    exp_case = " ".join(
        f"WHEN {d} THEN {v!r}D" for d, v in BENFORD_EXPECTED.items()
    )
    digits = (
        df.filter(F.col(value_col) > 0)
        .selectExpr(
            f"CAST(substring(CAST(CAST(floor({value_col} * {scale} + 0.5D)"
            " AS BIGINT) AS STRING), 1, 1) AS INT) AS digit"
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = digits.agg(F.sum("n").alias("__t"))
    return (
        digits.crossJoin(F.broadcast(total))
        .selectExpr(
            "digit",
            "n",
            "floor(CAST(n AS DOUBLE) / CAST(__t AS DOUBLE) * 1e6 + 0.5D)"
            " / 1e6 AS ratio",
            f"CASE digit {exp_case} END AS expected",
        )
        .selectExpr(
            "digit",
            "n",
            "ratio",
            "expected",
            "floor((ratio - expected) * 1e6 + 0.5D) / 1e6 AS deviation",
        )
    )


def k_anonymity(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """k-anonymity risk profile over a quasi-identifier combination:
    group the table by the quasi columns and report, in ONE row, how
    re-identifiable the dataset is — the governance screen run before
    releasing any derived dataset.

    Two chained aggregations, both map-side combinable: rows →
    (quasi-group, size), then sizes → the scalar profile. Shuffle
    volume is one row per distinct quasi group; nothing wide.

    Output: n_rows, n_groups, min_group_size, groups_below_k,
    rows_below_k, at_risk_share (6 dp; rows in groups smaller than
    ``k`` — each such row is k-anonymous only at level < k).
    """
    sizes = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("__g"))
    return sizes.agg(
        F.sum("__g").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.min("__g").alias("min_group_size"),
        F.sum(F.expr(f"CASE WHEN __g < {k} THEN 1 ELSE 0 END")).alias(
            "groups_below_k"
        ),
        F.sum(F.expr(f"CASE WHEN __g < {k} THEN __g ELSE 0 END")).alias(
            "rows_below_k"
        ),
    ).selectExpr(
        "n_rows",
        "n_groups",
        "min_group_size",
        "groups_below_k",
        "rows_below_k",
        "floor(CAST(rows_below_k AS DOUBLE) / CAST(n_rows AS DOUBLE)"
        " * 1e6 + 0.5D) / 1e6 AS at_risk_share",
    )

CHISQ_TERM = (
    "(CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * CAST(c AS DOUBLE)"
    " / CAST(n AS DOUBLE))"
    " * (CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * CAST(c AS DOUBLE)"
    " / CAST(n AS DOUBLE))"
    " / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))"
)
"""Per-cell Pearson chi-square term ``(o-e)²/e`` with the expected
count ``e = r·c/n`` inlined — one SQL string shared verbatim by the
Spark plan and the DuckDB oracle so every intermediate double is
IEEE-identical on both engines (expression-shape mirroring)."""


def chisq_independence(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns — the feature-screening statistic a corpus/feature
    pipeline runs before trusting a segmentation.

    Plan: one hash aggregate to the contingency cells (the only
    full-data pass — shuffle is bounded by |A|·|B| cells), then
    window-sum marginals OVER the TINY cell table (the unpartitioned
    ``OVER ()`` single-task window is |A|·|B| rows, never data rows),
    per-cell terms in mirrored-double arithmetic, micro-unit
    fixed-point (``floor(t·1e6 + 0.5)``) summed as DECIMAL(38,0) so
    the cross-engine hash cannot drift with summation order. Output:
    one row — n_cells, dof, chi2 (micro-rounded).
    """
    cells = df.groupBy(
        F.col(col_a).alias("a"), F.col(col_b).alias("b")
    ).agg(F.count(F.lit(1)).alias("o"))
    marg = cells.selectExpr(
        "a",
        "b",
        "o",
        "SUM(o) OVER (PARTITION BY a) AS r",
        "SUM(o) OVER (PARTITION BY b) AS c",
        "SUM(o) OVER () AS n",
    )
    return marg.selectExpr(f"{CHISQ_TERM} AS term", "a", "b").agg(
        F.expr("count(*) AS n_cells"),
        F.expr(
            "(count(DISTINCT a) - 1) * (count(DISTINCT b) - 1) AS dof"
        ),
        F.expr(
            "CAST(SUM(CAST(floor(term * 1e6 + 0.5) AS DECIMAL(38,0)))"
            " AS DOUBLE) / 1e6 AS chi2"
        ),
    )
