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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from institutional_fx_etl_spark.functions.cachereg import cached, cached_deser, cached_disk

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

def l_diversity(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 3,
) -> DataFrame:
    """l-diversity risk profile (Machanavajjhala et al. 2007 — the
    audit k-anonymity misses: a group can be large yet carry ONE
    sensitive value, so membership alone discloses it): group by the
    quasi-identifier, count DISTINCT sensitive values per group, and
    report in ONE row how many groups (and rows) sit below ``l``
    distinct values.

    Same two chained map-side-combinable aggregations as
    :func:`k_anonymity`; the distinct count adds the standard
    two-level expand-and-collapse — shuffle volume stays one row per
    (quasi group, sensitive value), never wide.

    Output: n_rows, n_groups, l_min (the dataset's effective l),
    groups_below_l, rows_below_l, at_risk_share (6 dp).
    """
    sizes = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("__g"),
        F.countDistinct(sensitive_col).alias("__l"),
    )
    return sizes.agg(
        F.sum("__g").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.min("__l").alias("l_min"),
        F.sum(F.expr(f"CASE WHEN __l < {l} THEN 1 ELSE 0 END")).alias(
            "groups_below_l"
        ),
        F.sum(F.expr(f"CASE WHEN __l < {l} THEN __g ELSE 0 END")).alias(
            "rows_below_l"
        ),
    ).selectExpr(
        "n_rows",
        "n_groups",
        "l_min",
        "groups_below_l",
        "rows_below_l",
        "floor(CAST(rows_below_l AS DOUBLE) / CAST(n_rows AS DOUBLE)"
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

CHISQ_EXPECTED = (
    "(CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))"
)
"""The expected count ``e = r·c/n`` alone — needed for the zero-cell
correction: the contingency aggregate only materializes OBSERVED
(a, b) combinations, but every unobserved cell still contributes
``(0-e)²/e = e`` to the statistic, and ``Σ_zero e = n − Σ_observed e``
exactly (marginals sum to n). Omitting it understates χ² on sparse
tables — badly when the association is strong (the perfectly
associated k×k table loses its entire off-diagonal mass)."""

CHISQ_AGG = (
    "CAST(SUM(CAST(floor(term * 1e6 + 0.5) AS DECIMAL(38,0)))"
    " + CAST(MAX(n) AS DECIMAL(38,0)) * 1000000"
    " - SUM(CAST(floor(e * 1e6 + 0.5) AS DECIMAL(38,0)))"
    " AS DOUBLE) / 1e6"
)
"""Order-invariant χ² total: micro-rounded observed-cell terms plus
the zero-cell mass ``n − Σe``, every addend fixed to DECIMAL before
summation so distributed aggregation order cannot drift the double."""


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
    the cross-engine hash cannot drift with summation order. Cells
    never observed are not materialized but still contribute: each
    zero cell adds ``(0-e)²/e = e``, and their total is exactly
    ``n − Σ_observed e`` (see ``CHISQ_EXPECTED``) — added as a single
    micro-exact correction, so the statistic is the full textbook χ²,
    not the observed-support truncation. Output:
    one row — n_cells (observed), dof, chi2 (micro-rounded).
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
    return marg.selectExpr(
        f"{CHISQ_TERM} AS term", f"{CHISQ_EXPECTED} AS e", "a", "b", "n"
    ).agg(
        F.expr("count(*) AS n_cells"),
        F.expr(
            "(count(DISTINCT a) - 1) * (count(DISTINCT b) - 1) AS dof"
        ),
        F.expr(f"{CHISQ_AGG} AS chi2"),
    )

def welch_ttest(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Welch's unequal-variance two-sample t statistic with the
    Welch–Satterthwaite degrees of freedom (Welch, Biometrika 1947)
    — the pairwise follow-up to :func:`anova_oneway` when the
    equal-variance assumption doesn't hold. The statistic and dof are
    closed-form, so the operator releases both and leaves the CDF
    lookup to the caller (no special functions in either engine).

    Exactness (the anova discipline): values fix-point to micro-units
    scan-side, per-group moment sums (Σx, Σx²) accumulate as
    DECIMAL(38,0) — order-independent on any partitioning — and the
    final t/dof arithmetic is mirrored-double with pinned
    association. One hash aggregate over the data; nothing global.

    Output (one row): n_a, n_b, mean_a, mean_b, var_a, var_b,
    t_stat, dof (round 6).
    """
    x = df.filter(
        f"{value_col} IS NOT NULL"
        f" AND {group_col} IN ('{group_a}', '{group_b}')"
    ).selectExpr(
        f"CASE WHEN {group_col} = '{group_a}' THEN 0 ELSE 1 END AS g",
        f"CAST(floor({value_col} * 1e6 + 0.5) AS DECIMAL(18,0)) AS v",
    )
    grp = x.groupBy("g").agg(
        F.expr("CAST(count(*) AS BIGINT) AS n_g"),
        F.expr("SUM(v) AS s_g"),
        F.expr("SUM(v * v) AS q_g"),
    )
    # mean = (s/1e6)/n ; var = (q/1e12 - n*mean^2)/(n-1) — expression
    # TEXT mirrored verbatim in the oracle (float association matters)
    stats = grp.selectExpr(
        "g",
        "n_g",
        "(CAST(s_g AS DOUBLE) / 1e6) / CAST(n_g AS DOUBLE) AS m_g",
        "(CAST(q_g AS DOUBLE) / 1e12"
        " - CAST(n_g AS DOUBLE)"
        "   * (((CAST(s_g AS DOUBLE) / 1e6) / CAST(n_g AS DOUBLE))"
        "      * ((CAST(s_g AS DOUBLE) / 1e6) / CAST(n_g AS DOUBLE))))"
        " / CAST(n_g - 1 AS DOUBLE) AS v_g",
    )
    wide = stats.groupBy().agg(
        F.expr("MAX(CASE WHEN g = 0 THEN n_g END) AS n_a"),
        F.expr("MAX(CASE WHEN g = 1 THEN n_g END) AS n_b"),
        F.expr("MAX(CASE WHEN g = 0 THEN m_g END) AS m_a"),
        F.expr("MAX(CASE WHEN g = 1 THEN m_g END) AS m_b"),
        F.expr("MAX(CASE WHEN g = 0 THEN v_g END) AS v_a"),
        F.expr("MAX(CASE WHEN g = 1 THEN v_g END) AS v_b"),
    )
    return wide.selectExpr(
        "n_a",
        "n_b",
        "round(m_a, 6) AS mean_a",
        "round(m_b, 6) AS mean_b",
        "round(v_a, 6) AS var_a",
        "round(v_b, 6) AS var_b",
        "round((m_a - m_b)"
        " / sqrt(v_a / CAST(n_a AS DOUBLE)"
        "        + v_b / CAST(n_b AS DOUBLE)), 6) + 0.0D AS t_stat",
        "round(((v_a / CAST(n_a AS DOUBLE) + v_b / CAST(n_b AS DOUBLE))"
        "  * (v_a / CAST(n_a AS DOUBLE) + v_b / CAST(n_b AS DOUBLE)))"
        " / ((v_a / CAST(n_a AS DOUBLE)) * (v_a / CAST(n_a AS DOUBLE))"
        "     / CAST(n_a - 1 AS DOUBLE)"
        "    + (v_b / CAST(n_b AS DOUBLE)) * (v_b / CAST(n_b AS DOUBLE))"
        "      / CAST(n_b - 1 AS DOUBLE)), 6) AS dof",
    )


def anova_oneway(
    df: DataFrame, value_col: str, group_col: str
) -> DataFrame:
    """One-way ANOVA F-statistic across groups — the
    does-this-segmentation-matter screen (continuous response ×
    categorical factor; the chi-square's numeric sibling).

    Exactness: values fix-point to micro-units scan-side, so the
    per-group moment sums (Σx, Σx²) accumulate as DECIMAL(38,0) —
    order-independent, bit-identical on any engine/partitioning. The
    between-group term Σ S_g²/n_g is per-group mirrored-double
    arithmetic micro-rounded back to DECIMAL before the (tiny,
    group-count-sized) final sum. One hash aggregate over the data,
    one over the groups — no window, no sort.

    Output (one row): k, n, ssb, ssw, f_stat (round 6).
    """
    x = df.filter(f"{value_col} IS NOT NULL").selectExpr(
        f"{group_col} AS g",
        f"CAST(floor({value_col} * 1e6 + 0.5) AS DECIMAL(18,0)) AS v",
    )
    grp = x.groupBy("g").agg(
        F.expr("CAST(count(*) AS BIGINT) AS n_g"),
        F.expr("SUM(v) AS s_g"),
        F.expr("SUM(v * v) AS q_g"),
    )
    tb = (
        "(CAST(s_g AS DOUBLE) / 1e6) * (CAST(s_g AS DOUBLE) / 1e6)"
        " / CAST(n_g AS DOUBLE)"
    )
    agg = grp.agg(
        F.expr("CAST(count(*) AS BIGINT) AS k"),
        F.expr("CAST(SUM(n_g) AS BIGINT) AS n"),
        F.expr("CAST(SUM(s_g) AS DOUBLE) / 1e6 AS s"),
        F.expr("CAST(SUM(q_g) AS DOUBLE) / 1e12 AS q"),
        F.expr(
            f"CAST(SUM(CAST(floor(({tb}) * 1e6 + 0.5)"
            " AS DECIMAL(38,0))) AS DOUBLE) / 1e6 AS t_between"
        ),
    )
    return agg.selectExpr(
        "k",
        "n",
        "round(t_between - s * s / CAST(n AS DOUBLE), 6) AS ssb",
        "round(q - t_between, 6) AS ssw",
        "round(((t_between - s * s / CAST(n AS DOUBLE))"
        " / CAST(k - 1 AS DOUBLE))"
        " / ((q - t_between) / CAST(n - k AS DOUBLE)), 6) AS f_stat",
    )


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    bucket_width: float = 16.0,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between the value
    distributions of two groups: ``D = max_v |F_a(v) - F_b(v)|`` over
    the distinct observed values — EXACT (integer cumulative counts;
    the per-value double ratio is deterministic and ``max`` is
    order-free).

    The ECDF is a value-ORDERED prefix sum, which naively plans as one
    single-partition global window. Spark shape instead: two-level
    range prefix — distinct values carry fixed-width range buckets,
    per-bucket subtotals (one tiny row per bucket) prefix-sum in a
    bucket-count-sized window, and the within-bucket window runs
    PARTITIONED BY bucket with the bucket offset broadcast-joined
    back. No full-data single-partition stage at any point; the oracle
    uses the plain global window (single-node engine) and matches
    because integer cumsums are decomposition-invariant.
    """
    labeled = df.filter(
        f"{value_col} IS NOT NULL"
        f" AND {group_col} IN ('{group_a}', '{group_b}')"
    ).selectExpr(
        f"{value_col} AS v",
        f"CASE WHEN {group_col} = '{group_a}' THEN 1 ELSE 0 END AS ia",
        f"CASE WHEN {group_col} = '{group_b}' THEN 1 ELSE 0 END AS ib",
    )
    from pyspark import StorageLevel

    # persisted: BOTH the bucket-offset branch and the in-bucket window
    # consume the distinct-value table — without this the corpus scan
    # + per-value aggregate runs twice. (value, 2 counts, bucket) rows
    # only, bounded by the number of DISTINCT values.
    per_v = (
        labeled.groupBy("v")
        .agg(
            F.expr("CAST(SUM(ia) AS BIGINT) AS ca"),
            F.expr("CAST(SUM(ib) AS BIGINT) AS cb"),
        )
        .selectExpr(
            "*", f"CAST(floor(v / {bucket_width!r}) AS BIGINT) AS bkt"
        )
        .transform(cached)
    )
    offsets = (
        per_v.groupBy("bkt")
        .agg(
            F.expr("SUM(ca) AS ta"),
            F.expr("SUM(cb) AS tb"),
        )
        .selectExpr(
            "bkt",
            "SUM(ta) OVER (ORDER BY bkt ROWS BETWEEN UNBOUNDED PRECEDING"
            " AND CURRENT ROW) - ta AS off_a",
            "SUM(tb) OVER (ORDER BY bkt ROWS BETWEEN UNBOUNDED PRECEDING"
            " AND CURRENT ROW) - tb AS off_b",
        )
    )
    in_bucket = per_v.join(F.broadcast(offsets), "bkt").selectExpr(
        "v",
        "SUM(ca) OVER (PARTITION BY bkt ORDER BY v ROWS BETWEEN UNBOUNDED"
        " PRECEDING AND CURRENT ROW) + off_a AS cum_a",
        "SUM(cb) OVER (PARTITION BY bkt ORDER BY v ROWS BETWEEN UNBOUNDED"
        " PRECEDING AND CURRENT ROW) + off_b AS cum_b",
    )
    totals = labeled.agg(
        F.expr("CAST(SUM(ia) AS BIGINT) AS n_a"),
        F.expr("CAST(SUM(ib) AS BIGINT) AS n_b"),
    )
    return (
        in_bucket.crossJoin(F.broadcast(totals))
        .groupBy("n_a", "n_b")
        .agg(
            F.expr(
                "round(max(abs(CAST(cum_a AS DOUBLE) / CAST(n_a AS DOUBLE)"
                " - CAST(cum_b AS DOUBLE) / CAST(n_b AS DOUBLE))), 6)"
                " AS ks_d"
            )
        )
        .select("n_a", "n_b", "ks_d")
    )


def gini_by_group(
    df: DataFrame,
    value_col: str,
    group_col: str,
    key_col: str,
) -> DataFrame:
    """Per-group Gini coefficient of a non-negative quantity —
    inequality/concentration profiling (is 90% of the balance held by
    3% of the accounts?).

    Closed form over the sorted sample ``G = Σ(2i−n−1)·x_i / (n·Σx)``;
    values fix-point to cents so the rank-weighted sum accumulates as
    exact DECIMAL (BIGINT terms), one ranking window per group + one
    hash aggregate. Ties: Σ(2i−n−1) over a tie run is
    permutation-invariant, so ``row_number`` with a key tiebreak is
    deterministic AND correct. Groups parallelize; no global sort.

    Output: group, n, total (cents→unit, round 2), gini (round 6).
    """
    cents = df.selectExpr(
        f"{group_col} AS grp",
        f"{key_col} AS k",
        f"CAST(floor(greatest({value_col}, 0.0) * 100 + 0.5) AS BIGINT)"
        " AS xc",
    )
    ranked = cents.selectExpr(
        "grp",
        "xc",
        "row_number() OVER (PARTITION BY grp ORDER BY xc, k) AS i",
        "count(*) OVER (PARTITION BY grp) AS n",
    )
    return (
        ranked.groupBy("grp")
        .agg(
            F.expr("CAST(max(n) AS BIGINT) AS n"),
            F.expr("SUM(CAST(xc AS DECIMAL(18,0))) AS sx"),
            F.expr(
                "SUM(CAST(xc AS DECIMAL(18,0)) * CAST(2 * i - n - 1 AS DECIMAL(19,0))) AS sw"
            ),
        )
        .selectExpr(
            "grp",
            "n",
            "round(CAST(sx AS DOUBLE) / 100, 2) AS total",
            "round(CAST(sw AS DOUBLE)"
            " / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS gini",
        )
    )


def mannwhitney_u(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    bucket_width: float = 16.0,
) -> DataFrame:
    """Two-sample Mann-Whitney U (Wilcoxon rank-sum) test — the
    nonparametric "did the distribution shift?" companion to
    ``ks_two_sample``, sensitive to location where KS is sensitive to
    shape.

    Exactness: with midranks for ties, every rank is a multiple of ½ —
    so the whole computation runs in HALF-UNIT BIGINTs. The midrank of
    a tied value v is ``before(v) + (t_v + 1)/2`` where ``before`` is
    the cumulative count of smaller values; in half-units that is
    ``2·before + t + 1``, an integer. ``R_a`` (rank sum of sample a)
    accumulates as Σ c_a(v) · midrank2(v) BIGINT, and
    ``U_a = R_a − n_a(n_a+1)/2`` stays in half-units until one final
    exact division by 2 (halves are exactly representable doubles).
    The normal-approximation z uses the tie-corrected variance
    ``σ² = n_a·n_b/12 · ((N+1) − Σ(t³−t)/(N(N−1)))`` — every input an
    exact BIGINT, the double expression mirrored verbatim in the
    oracle, so even z hashes identically.

    Spark shape: identical to ``ks_two_sample`` — per-distinct-value
    counts (ONE corpus aggregate), a two-level range-bucket prefix for
    ``before(v)`` (no single-partition full-data window), then one
    scalar aggregate. The oracle uses the plain global window; integer
    cumsums are decomposition-invariant.

    Output: n_a, n_b, u_a, u_b (doubles, exact halves), z (round 6).
    """
    labeled = df.filter(
        f"{value_col} IS NOT NULL"
        f" AND {group_col} IN ('{group_a}', '{group_b}')"
    ).selectExpr(
        f"{value_col} AS v",
        f"CASE WHEN {group_col} = '{group_a}' THEN 1 ELSE 0 END AS ia",
        f"CASE WHEN {group_col} = '{group_b}' THEN 1 ELSE 0 END AS ib",
    )
    per_v = (
        labeled.groupBy("v")
        .agg(
            F.expr("CAST(SUM(ia) AS BIGINT) AS ca"),
            F.expr("CAST(SUM(ib) AS BIGINT) AS cb"),
        )
        .selectExpr(
            "*",
            "ca + cb AS t",
            f"CAST(floor(v / {bucket_width!r}) AS BIGINT) AS bkt",
        )
    )
    offsets = (
        per_v.groupBy("bkt")
        .agg(F.expr("SUM(t) AS tt"))
        .selectExpr(
            "bkt",
            "CAST(SUM(tt) OVER (ORDER BY bkt ROWS BETWEEN UNBOUNDED"
            " PRECEDING AND CURRENT ROW) - tt AS BIGINT) AS off",
        )
    )
    ranked = per_v.join(F.broadcast(offsets), "bkt").selectExpr(
        "ca",
        "cb",
        "t",
        # before(v) = bucket offset + in-bucket exclusive cumsum
        "off + CAST(SUM(t) OVER (PARTITION BY bkt ORDER BY v ROWS"
        " BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t AS BIGINT)"
        " AS before",
    )
    return (
        ranked.selectExpr(
            "ca",
            "cb",
            "t",
            # DECIMAL(38,0) intermediates: t³ overflows int64 once a
            # single value is tied ~2.1M times, and ca·before nears
            # int64 at n≈3e9 — both silent wraps under non-ANSI mode
            # at the 100 TB scale this module targets (round-7 ADVICE)
            "CAST(ca AS DECIMAL(38,0)) * (2 * before + t + 1)"
            " AS ra2_term",
            "CAST(t AS DECIMAL(38,0)) * t * t - t AS tie_term",
        )
        .agg(
            F.expr("CAST(SUM(ca) AS BIGINT) AS n_a"),
            F.expr("CAST(SUM(cb) AS BIGINT) AS n_b"),
            F.expr("CAST(SUM(ra2_term) AS DECIMAL(38,0)) AS r_a2"),
            F.expr("CAST(SUM(tie_term) AS DECIMAL(38,0)) AS ties"),
        )
        .selectExpr(
            "n_a",
            "n_b",
            "(CAST(r_a2 - CAST(n_a AS DECIMAL(38,0)) * (n_a + 1)"
            " AS DOUBLE)) / 2 AS u_a",
            "CAST(n_a AS DOUBLE) * n_b"
            " - CAST(r_a2 - CAST(n_a AS DECIMAL(38,0)) * (n_a + 1)"
            " AS DOUBLE) / 2 AS u_b",
            "round((CAST(r_a2 - CAST(n_a AS DECIMAL(38,0)) * (n_a + 1)"
            " AS DOUBLE) / 2"
            "  - CAST(n_a AS DOUBLE) * n_b / 2)"
            " / sqrt(CAST(n_a AS DOUBLE) * n_b / 12.0"
            "   * ((CAST(n_a + n_b AS DOUBLE) + 1)"
            "      - CAST(ties AS DOUBLE)"
            "        / (CAST(n_a + n_b AS DOUBLE)"
            "           * (CAST(n_a + n_b AS DOUBLE) - 1)))), 6) AS z",
        )
    )


def cramers_v(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Cramér's V effect size between two categorical columns — the
    normalized companion to :func:`chisq_independence` (chi-square says
    "dependent?", V says "how strongly", on a 0..1 scale comparable
    across tables): ``V = sqrt((χ²/n) / min(r-1, c-1))``.

    Same plan as the chi-square (one contingency aggregate, marginal
    windows over the tiny cell table, micro-rounded DECIMAL term sum);
    the final sqrt is a correctly-rounded IEEE op over an exact
    double, so even V hashes identically against the oracle. Output:
    one row — n, n_cells, dof, chi2, cramers_v (round 6).
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
    return (
        marg.selectExpr(
            f"{CHISQ_TERM} AS term", f"{CHISQ_EXPECTED} AS e", "a", "b", "n"
        )
        .agg(
            F.expr("CAST(MAX(n) AS BIGINT) AS n"),
            F.expr("count(*) AS n_cells"),
            F.expr(
                "(count(DISTINCT a) - 1) * (count(DISTINCT b) - 1) AS dof"
            ),
            F.expr(f"{CHISQ_AGG} AS chi2"),
            F.expr(
                "least(count(DISTINCT a) - 1, count(DISTINCT b) - 1)"
                " AS mindim"
            ),
        )
        .selectExpr(
            "n",
            "n_cells",
            "dof",
            "chi2",
            "round(sqrt(chi2 / CAST(n AS DOUBLE)"
            " / CAST(mindim AS DOUBLE)), 6) AS cramers_v",
        )
    )


def referential_integrity(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    fk_name: str,
) -> DataFrame:
    """One FK-edge integrity audit: how many child rows / distinct
    child keys reference a parent key that does not exist — the
    constraint check a lakehouse ingest runs before promoting a batch
    (plain parquet has no enforced foreign keys; this IS the
    enforcement).

    NULL child keys are excluded (SQL FK semantics: NULL references
    nothing and violates nothing). Plan: the child aggregates to
    per-key counts FIRST (narrow key+count rows), then one
    key-partitioned anti-join against the parent's distinct keys —
    the join moves distinct keys, never child rows, so a 100 TB fact
    table audits with a shuffle bounded by its key cardinality.

    Output: one row — fk, child_rows, orphan_rows, orphan_keys.
    """
    keyed = child.filter(f"{child_key} IS NOT NULL")
    per_key = keyed.groupBy(
        F.col(child_key).alias("k")
    ).agg(F.count(F.lit(1)).alias("c"))
    return _fk_edge_report(per_key, parent, parent_key, fk_name)


def _fk_edge_report(
    per_key: DataFrame,
    parent: DataFrame,
    parent_key: str,
    fk_name: str,
) -> DataFrame:
    """Shared audit tail over a ``(k, c)`` per-child-key relation."""
    orphans = per_key.join(
        parent.selectExpr(f"{parent_key} AS k").distinct(), "k", "left_anti"
    )
    # r14 (guide §1.2): child_rows == Σ c over the per-key relation,
    # so the total rides the SAME aggregate instead of a second full
    # child scan — one pass over the fact table per edge, not two
    # (the per-key exchange is shared with the anti-join leg via
    # exchange reuse)
    totals = per_key.agg(
        F.expr("CAST(COALESCE(SUM(c), 0) AS BIGINT) AS child_rows")
    )
    orph = orphans.agg(
        F.expr("CAST(COALESCE(SUM(c), 0) AS BIGINT) AS orphan_rows"),
        F.expr("CAST(COUNT(1) AS BIGINT) AS orphan_keys"),
    )
    return totals.crossJoin(orph).selectExpr(
        f"'{fk_name}' AS fk", "child_rows", "orphan_rows", "orphan_keys"
    )


def referential_integrity_multi(
    child: DataFrame,
    edges: list[tuple[str, DataFrame, str, str]],
) -> DataFrame:
    """All FK edges of ONE child table from ONE scan (r15, guide §1.2
    / §6): a fact table with e foreign keys was scanned e times (once
    per :func:`referential_integrity` call); here a single
    ``stack(e, ...)`` pass emits every (edge-index, key) incidence and
    one aggregate produces all per-edge per-key counts, which the
    shared audit tail consumes per edge. ``edges`` is a list of
    ``(child_key, parent_df, parent_key, fk_name)``; results are
    row-identical to e independent single-edge audits, in ``edges``
    order. Child keys must share a comparable type (stack coerces to
    a common type; only counts leave the aggregate, so a widening
    coercion cannot change any output).

    The shared per-key relation is NOT persisted: all 2e consumers
    (totals + anti-join per edge) contain the identical scan → stack →
    partial-aggregate exchange subtree, so ReuseExchange evaluates the
    fact-table scan ONCE and each consumer only re-runs the tiny
    post-shuffle final aggregate (a persist variant was measured and
    rejected: the cached relation pins the full un-coalesced shuffle
    partitioning — cached plans bypass AQE coalescing — turning every
    consumer into a 32-task near-empty cache read).
    """
    n = len(edges)
    stack_args = ", ".join(
        f"{i}, {ck}" for i, (ck, _, _, _) in enumerate(edges)
    )
    keyed = child.selectExpr(
        f"stack({n}, {stack_args}) AS (__fkx, k)"
    ).filter("k IS NOT NULL")
    per_key_all = keyed.groupBy("__fkx", "k").agg(
        F.count(F.lit(1)).alias("c")
    )
    out = None
    for i, (_ck, parent, pk, fk_name) in enumerate(edges):
        per_key = per_key_all.filter(F.col("__fkx") == i).select("k", "c")
        rep = _fk_edge_report(per_key, parent, pk, fk_name)
        out = rep if out is None else out.unionByName(rep)
    return out


def proportion_ztest(
    df: DataFrame,
    success_expr: str,
    cohort_expr: str,
) -> DataFrame:
    """Two-proportion z-test (pooled variance) between two cohorts —
    the A/B-test readout: is the success rate of cohort 0 different
    from cohort 1?

    ``success_expr`` / ``cohort_expr`` are boolean SQL expressions
    (cohort TRUE → cohort 1). One hash aggregate produces the four
    exact BIGINT counts; rates and z are single mirrored double
    expressions over them (sqrt is correctly-rounded IEEE), so the
    output hashes identically cross-engine. Output: one row —
    n_0, x_0, n_1, x_1, rate_0, rate_1, z (round 6).
    """
    counted = df.agg(
        F.expr(
            f"CAST(SUM(CASE WHEN NOT ({cohort_expr}) THEN 1 ELSE 0 END)"
            " AS BIGINT) AS n_0"
        ),
        F.expr(
            f"CAST(SUM(CASE WHEN NOT ({cohort_expr}) AND ({success_expr})"
            " THEN 1 ELSE 0 END) AS BIGINT) AS x_0"
        ),
        F.expr(
            f"CAST(SUM(CASE WHEN ({cohort_expr}) THEN 1 ELSE 0 END)"
            " AS BIGINT) AS n_1"
        ),
        F.expr(
            f"CAST(SUM(CASE WHEN ({cohort_expr}) AND ({success_expr})"
            " THEN 1 ELSE 0 END) AS BIGINT) AS x_1"
        ),
    )
    return counted.selectExpr(
        "n_0",
        "x_0",
        "n_1",
        "x_1",
        "round(CAST(x_0 AS DOUBLE) / n_0, 6) AS rate_0",
        "round(CAST(x_1 AS DOUBLE) / n_1, 6) AS rate_1",
        "round((CAST(x_0 AS DOUBLE) / n_0 - CAST(x_1 AS DOUBLE) / n_1)"
        " / sqrt((CAST(x_0 + x_1 AS DOUBLE) / (n_0 + n_1))"
        "   * (1 - CAST(x_0 + x_1 AS DOUBLE) / (n_0 + n_1))"
        "   * (1.0 / n_0 + 1.0 / n_1)), 6) AS z",
    )


def pareto_topshare(
    df: DataFrame,
    group_col: str,
    key_col: str,
    value_col: str,
    share: tuple[int, int] = (4, 5),
) -> DataFrame:
    """Concentration readout per group: how many top keys (and what
    fraction of the key base) carry ``share`` of the total value —
    the "do 20% of customers drive 80% of revenue?" Pareto audit, the
    count-side companion to ``gini_by_group``.

    Values fix-point to cents and the ``share = (num, den)`` fraction
    (default 4/5 = 80%) is tested by integer cross-multiplication
    ``den·cum ≥ num·total`` — no floating threshold anywhere.
    One ranking window per group (groups parallelize, same shape as
    ``weighted_median``: cumulative value rises monotonically with
    rank, so ``min(rank)`` past the threshold IS the answer — no
    second pass). Output: group, n_keys, total_value (round 2),
    k_top, k_share (round 6).
    """
    num, den = share
    cents = df.selectExpr(
        f"{group_col} AS grp",
        f"{key_col} AS k",
        f"CAST(floor({value_col} * 100 + 0.5) AS BIGINT) AS v",
    )
    per_key = cents.groupBy("grp", "k").agg(
        F.expr("CAST(SUM(v) AS BIGINT) AS kv")
    )
    from pyspark.sql import Window as W

    wrank = W.partitionBy("grp").orderBy(
        F.col("kv").desc(), F.col("k").asc()
    )
    ranked = per_key.select(
        "grp",
        F.row_number().over(wrank).alias("rn"),
        F.sum("kv")
        .over(wrank.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("cum"),
        F.sum("kv").over(W.partitionBy("grp")).alias("total"),
        F.count(F.lit(1)).over(W.partitionBy("grp")).alias("n_keys"),
    )
    return (
        ranked.filter(f"{den} * cum >= {num} * total")
        .groupBy("grp")
        .agg(
            F.expr("CAST(MAX(n_keys) AS BIGINT) AS n_keys"),
            F.expr(
                "round(CAST(MAX(total) AS DOUBLE) / 100, 2) AS total_value"
            ),
            F.expr("CAST(MIN(rn) AS BIGINT) AS k_top"),
        )
        .selectExpr(
            "grp",
            "n_keys",
            "total_value",
            "k_top",
            "round(CAST(k_top AS DOUBLE) / n_keys, 6) AS k_share",
        )
    )


def diff_in_diff(
    df: DataFrame,
    value_col: str,
    treated_expr: str,
    post_expr: str,
) -> DataFrame:
    """Difference-in-differences estimator — the causal companion to
    :func:`proportion_ztest`: how much MORE did the treated cohort's
    mean move across the treatment boundary than the control cohort's
    (which nets out the common time trend).

    One hash aggregate produces the four cells' exact micro-unit
    DECIMAL sums and BIGINT counts; the four means and the DiD are
    single mirrored double expressions over them — no float
    accumulates distributed, so the estimate hashes identically.

    Output: one row — n per cell, mean per cell (round 6),
    did (round 6).
    """
    cells = {
        "c_pre": f"NOT ({treated_expr}) AND NOT ({post_expr})",
        "c_post": f"NOT ({treated_expr}) AND ({post_expr})",
        "t_pre": f"({treated_expr}) AND NOT ({post_expr})",
        "t_post": f"({treated_expr}) AND ({post_expr})",
    }
    aggs = []
    for name, cond in cells.items():
        aggs.append(
            F.expr(
                f"CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END)"
                f" AS BIGINT) AS n_{name}"
            )
        )
        aggs.append(
            F.expr(
                f"SUM(CASE WHEN {cond} THEN"
                f" CAST(floor({value_col} * 1000000 + 0.5)"
                " AS DECIMAL(38,0)) ELSE 0 END)"
                f" AS s_{name}"
            )
        )
    mean = (
        lambda c: f"CAST(s_{c} AS DOUBLE) / 1000000 / n_{c}"
    )  # noqa: E731
    return (
        df.filter(f"{value_col} IS NOT NULL")
        .agg(*aggs)
        .selectExpr(
            *(f"n_{c}" for c in cells),
            *(f"round({mean(c)}, 6) AS mean_{c}" for c in cells),
            f"round(({mean('t_post')} - {mean('t_pre')})"
            f" - ({mean('c_post')} - {mean('c_pre')}), 6) AS did",
        )
    )


NORMAL_SF_TWO_SIDED = (
    "2.0D * (exp(-(zz) * (zz) / 2) / sqrt(2 * pi()))"
    " * (0.319381530D * (1 / (1 + 0.2316419D * (zz)))"
    "    - 0.356563782D * pow(1 / (1 + 0.2316419D * (zz)), 2)"
    "    + 1.781477937D * pow(1 / (1 + 0.2316419D * (zz)), 3)"
    "    - 1.821255978D * pow(1 / (1 + 0.2316419D * (zz)), 4)"
    "    + 1.330274429D * pow(1 / (1 + 0.2316419D * (zz)), 5))"
)
"""Two-sided normal p-value ``2·(1 − Φ(zz))`` for ``zz ≥ 0`` via the
Zelen-Severo polynomial (Abramowitz & Stegun 26.2.17, |ε| < 7.5e-8 —
far below the 6-dp output grain). ``zz`` is a placeholder for the
ABSOLUTE z expression; the string is shared verbatim by the Spark
plan and the DuckDB oracle (expression-shape mirroring) so every
intermediate double is IEEE-identical on both engines."""


def fdr_bh(
    df: DataFrame,
    group_col: str,
    value_col: str,
    alpha_pct: int = 5,
) -> DataFrame:
    """Benjamini-Hochberg FDR control over a family of per-group sign
    tests — the multiple-testing correction any profiling sweep needs
    once it tests MANY segments at once (m tests at α each expect
    m·α false alarms; BH bounds the false-discovery RATE instead).

    The per-group hypothesis is the exact-count sign test: under H0
    each row's value is equally likely above or below the GLOBAL
    mean, so ``z = (2k − n)/√n`` with k = #above (integer counts; the
    global mean is a DECIMAL-exact micro-unit ratio, never a float
    sum). p-values come from the shared :data:`NORMAL_SF_TWO_SIDED`
    polynomial; the BH step-up itself is EXACT integer arithmetic —
    ``p_(i) ≤ i·α/m`` compares ``p_micro·m·100 ≤ i·alpha_pct·10⁶``
    (p is already micro-quantized), so the reject frontier cannot
    drift on float rounding.

    Plan shape: one global mean aggregate (scalar-attach broadcast),
    one per-group count aggregate, one m-row ranking window (m =
    #groups — metadata scale). Output: group col, n, k_above,
    z (6 dp), p_value (6 dp), bh_rank, reject.
    """
    if not 1 <= int(alpha_pct) <= 50:
        raise ValueError(f"alpha_pct in 1..50, got {alpha_pct}")
    vals = df.filter(f"{value_col} IS NOT NULL")
    gm = vals.agg(
        F.expr(
            f"SUM(CAST(floor({value_col} * 1e6 + 0.5) AS DECIMAL(38,0)))"
            " AS __s"
        ),
        F.expr("count(1) AS __n"),
    )
    counts = (
        vals.crossJoin(F.broadcast(gm))
        .selectExpr(
            group_col,
            # exact comparison: v > mean ⇔ v_micro·n > Σv_micro
            f"CASE WHEN CAST(floor({value_col} * 1e6 + 0.5)"
            " AS DECIMAL(38,0)) * __n > __s THEN 1 ELSE 0 END AS __above",
        )
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__above").cast("long").alias("k_above"),
        )
    )
    z_abs = "(abs(CAST(2 * k_above - n AS DOUBLE)) / sqrt(CAST(n AS DOUBLE)))"
    scored = counts.selectExpr(
        group_col,
        "n",
        "k_above",
        "round(CAST(2 * k_above - n AS DOUBLE)"
        " / sqrt(CAST(n AS DOUBLE)), 6) AS z",
        "CAST(floor(least(1.0D, "
        + NORMAL_SF_TWO_SIDED.replace("(zz)", z_abs)
        + ") * 1e6 + 0.5) AS BIGINT) AS __pm",
    )
    wrank = Window.orderBy("__pm", group_col)
    wall = Window.partitionBy()
    ranked = (
        scored.withColumn("bh_rank", F.row_number().over(wrank))
        .withColumn("__m", F.count(F.lit(1)).over(wall))
        .withColumn(
            "__ok",
            F.expr(
                f"__pm * __m * 100 <= bh_rank * {int(alpha_pct)}"
                " * 1000000"
            ),
        )
        .withColumn(
            "__cut",
            F.max(F.expr("CASE WHEN __ok THEN bh_rank ELSE 0 END")).over(
                wall
            ),
        )
    )
    return ranked.selectExpr(
        group_col,
        "n",
        "k_above",
        "z",
        "round(CAST(__pm AS DOUBLE) / 1e6, 6) AS p_value",
        # BIGINT to match DuckDB's row_number width (the driver hash
        # is width-sensitive — tests/test_type_widths.py)
        "CAST(bh_rank AS BIGINT) AS bh_rank",
        "bh_rank <= __cut AS reject",
    )


def t_closeness(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
) -> DataFrame:
    """t-closeness profile (Li et al. 2007 — the audit after
    :func:`k_anonymity` and :func:`l_diversity`: a group can be large
    AND diverse yet still leak, if its sensitive-value DISTRIBUTION
    differs sharply from the corpus-wide one): per quasi-identifier
    group, the total-variation distance ``½·Σ_v |p_g(v) − p(v)|``
    between the group's sensitive distribution and the global.

    EXACT integer arithmetic throughout (the chisq zero-cell
    discipline): the per-value numerator is
    ``|c(g,v)·N − c(v)·n_g|`` (all BIGINT counts), values absent
    from the group contribute their entire global mass
    ``(N − Σ_{v∈g} c(v))·n_g``, and the single double division +
    6-dp round happens once per group. Two map-side-combinable
    aggregates + one broadcast of the (vocabulary-bounded) global
    value distribution. Output: quasi cols, n_rows, n_values,
    t_closeness (6 dp).
    """
    cell = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).alias("__c")
    )
    gsize = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("__ng"))
    gval = df.groupBy(sensitive_col).agg(F.count(F.lit(1)).alias("__cv"))
    tot = df.agg(F.count(F.lit(1)).alias("__n"))
    num = (
        cell.join(F.broadcast(gval), sensitive_col)
        .join(gsize, list(quasi_cols))
        .crossJoin(F.broadcast(tot))
        .groupBy(*quasi_cols)
        .agg(
            # CAST the factors to DECIMAL(38,0) BEFORE multiplying (the
            # herfindahl discipline): c·N approaches N², so a raw
            # BIGINT product overflows int64 past ~3e9 rows — exactly
            # the corpus size the 100 TB claim is about (r12 ADVICE).
            F.expr(
                "SUM(abs(CAST(__c AS DECIMAL(38,0)) * __n"
                " - CAST(__cv AS DECIMAL(38,0)) * __ng)) AS __present"
            ),
            # Σ over values present in the group of their GLOBAL count
            F.expr("CAST(SUM(__cv) AS DECIMAL(38,0)) AS __sg"),
            F.expr("MAX(__ng) AS __ng"),
            F.expr("MAX(__n) AS __n"),
            F.count(F.lit(1)).alias("n_values"),
        )
    )
    return num.selectExpr(
        *quasi_cols,
        "__ng AS n_rows",
        "n_values",
        "round(CAST(__present + CAST((__n - __sg) AS DECIMAL(38,0))"
        " * __ng AS DOUBLE) / (2.0D * __ng * __n), 6) AS t_closeness",
    )


def bootstrap_ci_mean(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    n_resamples: int = 40,
) -> DataFrame:
    """Percentile-bootstrap confidence interval for the per-group mean
    — the distribution-free error bar a profiling sweep attaches to
    every segment statistic. Deterministic POISSON BOOTSTRAP (the
    standard distributed formulation — no global resample index
    needed): each of ``n_resamples`` replicas gives every row a
    multiplicity in {0..4} drawn from a Poisson(1) approximation
    keyed by an md5 digest slice — ⌈B/10⌉ digests per row, ten
    3-hex-digit uniforms per digest (the engine's md5-seeded
    determinism discipline, one hash per TEN replicas — md5 was the
    exploded hot path's entire cost), so both engines materialize
    the IDENTICAL replicas.

    Exactness: row values quantize to micro-units once; replica means
    are exact integer sums divided once and re-quantized to micro, so
    the order statistics compare integers; the CI bounds are the
    ``⌊B·0.025⌋+1``-th and ``B−⌊B·0.025⌋``-th order statistics (B=40
    → the 2nd and 39th — the standard percentile-bootstrap ranks).
    Groups where fewer than ``2·(⌊B·0.025⌋+1)`` replicas survive
    (every replica dropped all rows bar a handful) report NULL
    bounds — the ranks would cross, and an inverted interval is
    worse than an absent one.

    Plan shape: one ×B explode (map-side), one (group, replica) hash
    aggregate, one B-row-per-group ranking window — shuffle volume is
    B rows per group, never the corpus. Output: group col, n, mean
    (6 dp), ci_lo, ci_hi (6 dp), n_resamples (non-empty replicas).
    """
    if n_resamples < 4:
        raise ValueError(f"n_resamples must be >= 4, got {n_resamples}")
    b = int(n_resamples)
    vals = df.filter(f"{value_col} IS NOT NULL").selectExpr(
        group_col,
        f"CAST(floor({value_col} * 1e6 + 0.5) AS BIGINT) AS __vm",
        f"{id_col} AS __id",
    )
    # re-spread BEFORE the ×B fan-out (the repo's amplification
    # discipline): the replica explode multiplies every input row by
    # B and all of that work runs inside the scan's own stage — a
    # small single-file scan otherwise serializes the entire
    # resampling onto one task (measured 4.3 s single-task vs ~0.6 s
    # spread at sf0.1; the one narrow-row shuffle costs 1/B-th of the
    # work it parallelizes)
    rep_src = vals.repartition(
        df.sparkSession.sparkContext.defaultParallelism
    )
    # Poisson(1) pmf over a 3-hex-digit uniform (u in [0, 4096)):
    # P(0)=1507/4096 P(1)=1507/4096 P(2)=753/4096 P(3)=251/4096
    # P(4+)=78/4096. ONE md5 per 10 replicas (each 32-hex digest
    # yields ten 3-digit slices) instead of one per replica — md5 was
    # the 24M-row hot path's whole cost (9.8 s → ~2 s at sf0.1).
    n_digests = (b + 9) // 10
    u_of = (
        "CAST(conv(substr(element_at(__hs, CAST(x div 10 AS INT) + 1),"
        " 1 + 3 * CAST(x % 10 AS INT), 3), 16, 10) AS BIGINT)"
    )
    mult = (
        "CASE WHEN u < 1507 THEN 0 WHEN u < 3014 THEN 1"
        " WHEN u < 3767 THEN 2 WHEN u < 4018 THEN 3 ELSE 4 END"
    )
    rep = (
        rep_src.selectExpr(
            group_col,
            "__vm",
            "array("
            + ", ".join(
                f"md5(concat('boot', CAST(__id AS STRING), ':', '{j}'))"
                for j in range(n_digests)
            )
            + ") AS __hs",
        )
        .selectExpr(
            group_col,
            "__vm",
            # the inner transform let-binds u so each replica does one
            # conv/substr; md5 itself is hoisted into __hs
            "posexplode(transform("
            f"transform(sequence(0, {b - 1}), x -> {u_of}),"
            f" u -> {mult})) AS (__b, __m)",
        )
        .filter("__m > 0")
        .groupBy(group_col, "__b")
        .agg(
            F.expr("SUM(CAST(__vm * __m AS DECIMAL(38,0))) AS __s"),
            F.expr("CAST(SUM(__m) AS BIGINT) AS __n"),
        )
        .selectExpr(
            group_col,
            "__b",
            "CAST(floor(CAST(__s AS DOUBLE) / __n + 0.5) AS BIGINT)"
            " AS __mean_m",
        )
    )
    wrank = Window.partitionBy(group_col).orderBy("__mean_m", "__b")
    wall = Window.partitionBy(group_col)
    r_lo = b // 40 + 1  # floor(B*0.025)+1
    stats = (
        rep.withColumn("__rk", F.row_number().over(wrank))
        .withColumn("__nb", F.count(F.lit(1)).over(wall))
        .selectExpr(
            group_col,
            "__mean_m",
            "__rk",
            "__nb",
        )
    )
    # Degenerate-replica clamp (r12 ADVICE): with fewer than 2·r_lo
    # surviving replicas the lo/hi ranks cross (nb=2, r_lo=2 → lo rank
    # 2 > hi rank 1), so both bounds are NULL — a group too thin to
    # bootstrap reports "no interval", never an inverted one.
    lo = stats.filter(f"__rk = least({r_lo}, __nb)").selectExpr(
        group_col,
        f"CASE WHEN __nb >= {2 * r_lo} THEN"
        " round(CAST(__mean_m AS DOUBLE) / 1e6, 6) END AS ci_lo",
        "__nb AS n_resamples",
    )
    hi = stats.filter(f"__rk = greatest(__nb - {r_lo} + 1, 1)").selectExpr(
        group_col,
        f"CASE WHEN __nb >= {2 * r_lo} THEN"
        " round(CAST(__mean_m AS DOUBLE) / 1e6, 6) END AS ci_hi",
    )
    point = vals.groupBy(group_col).agg(
        F.expr("CAST(count(1) AS BIGINT) AS n"),
        F.expr(
            "round(CAST(SUM(CAST(__vm AS DECIMAL(38,0))) AS DOUBLE)"
            " / count(1) / 1e6, 6) AS mean"
        ),
    )
    return (
        point.join(lo, group_col)
        .join(hi, group_col)
        .select(group_col, "n", "mean", "ci_lo", "ci_hi", "n_resamples")
    )


def herfindahl_concentration(
    df: DataFrame,
    group_col: str,
    member_col: str,
) -> DataFrame:
    """Herfindahl-Hirschman concentration of ``member_col`` within
    each ``group_col`` — the one-number answer to "is this slice of
    the corpus dominated by a single source?" that a mixture pipeline
    checks before trusting per-group statistics. HHI = Σ_s share_s²
    (1/k for k equal members, → 1.0 under monopoly); the reciprocal
    is the EFFECTIVE member count (Laakso-Taagepera).

    EXACT integer arithmetic: shares are rationals c_s/n, so
    HHI = Σ c_s² / n² — two chained map-side-combinable aggregates
    over integer counts (the k_anonymity shape), one double division
    + 6-dp round per group at the end. Output: group col, n_rows,
    n_members, hhi (6 dp), effective_members (6 dp).
    """
    cell = df.groupBy(group_col, member_col).agg(
        F.count(F.lit(1)).alias("__c")
    )
    return (
        cell.groupBy(group_col)
        .agg(
            F.expr("CAST(SUM(__c) AS BIGINT) AS n_rows"),
            F.expr("CAST(count(1) AS BIGINT) AS n_members"),
            F.expr(
                "SUM(CAST(__c AS DECIMAL(38,0)) * __c) AS __ss"
            ),
        )
        .selectExpr(
            group_col,
            "n_rows",
            "n_members",
            "round(CAST(__ss AS DOUBLE)"
            " / (CAST(n_rows AS DOUBLE) * n_rows), 6) AS hhi",
            "round(CAST(n_rows AS DOUBLE) * n_rows"
            " / CAST(__ss AS DOUBLE), 6) AS effective_members",
        )
    )


def dp_count_laplace(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float = 1.0,
    seed_tag: str = "dp",
) -> DataFrame:
    """ε-differentially-private group counts via the Laplace
    mechanism (Dwork et al., TCC 2006 — the canonical DP release: a
    COUNT query has L1 sensitivity 1, so adding Laplace(1/ε) noise to
    each group's count gives ε-DP) — what a profiling sweep publishes
    when the segment counts themselves are sensitive.

    DETERMINISTIC noise (the engine's md5-seeded discipline — the
    bootstrap/weighted_sample pattern): each group's noise draw seeds
    from ``md5(seed_tag | md5(v) per group value)`` — hashing each
    component BEFORE joining makes the seed injective over the group
    tuple (r13 ADVICE: raw '|' joins let ('a|b','c') and ('a','b|c')
    collide and draw identical noise), the first 15 hex digits
    become a 60-bit integer, ``u = (h + 0.5)/2^60 ∈ (0,1)`` (the
    half-up offset keeps u strictly interior, so the inverse CDF
    never sees ln(0)), and the Laplace inverse CDF
    ``b·ln(2u)`` / ``−b·ln(2−2u)`` is one branch + one ln per group
    — both engines materialize the IDENTICAL release. The noise
    scale ``b = 1/ε`` is embedded as a repr'd double literal so
    neither engine re-derives it.

    Determinism is a TESTING property here, not a privacy one: a
    public seed means the release is exactly reproducible (and the
    noise is not secret); a production deployment would swap the seed
    for a private RNG and keep every other line. ``n_true`` is
    emitted for calibration audits against the oracle — drop it (and
    the seed) when actually releasing.

    One hash aggregate + map-side noise expression; nothing global.
    Output: group cols, n_true, epsilon, dp_count (6 dp).
    """
    from institutional_fx_etl_spark.functions.identifiers import bq

    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0, got {epsilon}")
    b = 1.0 / float(epsilon)
    seed = ", ".join(
        ["'" + seed_tag + "'"]
        + [f"md5(CAST({bq(c)} AS STRING))" for c in group_cols]
    )
    return (
        df.groupBy(*group_cols)
        .agg(F.expr("CAST(count(1) AS BIGINT) AS n_true"))
        .selectExpr(
            *[bq(c) for c in group_cols],
            "n_true",
            f"CAST({float(epsilon)!r} AS DOUBLE) AS epsilon",
            f"(CAST(conv(substr(md5(concat_ws('|', {seed})), 1, 15),"
            " 16, 10) AS BIGINT) + 0.5)"
            " / 1152921504606846976.0 AS __u",
        )
        .selectExpr(
            *[bq(c) for c in group_cols],
            "n_true",
            "epsilon",
            # `+ 0.0D` folds IEEE -0.0 (a count the noise pushes to
            # exactly zero keeps its sign bit otherwise)
            f"round(n_true + (CASE WHEN __u < 0.5 THEN"
            f" {b!r} * ln(2 * __u) ELSE"
            f" -{b!r} * ln(2 - 2 * __u) END), 6) + 0.0D AS dp_count",
        )
    )


def survival_km(
    df: DataFrame,
    duration_col: str,
    observed_col: str,
    group_col: str,
) -> DataFrame:
    """Kaplan–Meier product-limit survival estimator per group
    (Kaplan & Meier, JASA 1958 — THE nonparametric survival curve
    under right-censoring): at each distinct duration t_i,
    ``S(t_i) = Π_{j≤i} (1 − d_j / n_j)`` with d_j events at t_j and
    n_j subjects still at risk; censored subjects leave the risk set
    without dropping the curve.

    Plan shape: durations micro-quantize scan-side (grouping floats
    is engine-hazardous), ONE hash aggregate to the per-(group, t)
    event/censor counts — bounded by the DISTINCT-duration domain,
    not the subject count — then the at-risk prefix and the running
    Σln(1−d/n) ride one window over that bounded relation,
    partitioned by group. The survival product materializes as
    ``exp`` of the running log-sum (each engine accumulates the same
    ordered term sequence); a zero factor (everyone at risk dies)
    poisons the tail to exactly 0 via a prefix-max flag instead of
    feeding ln(0).

    Output per (group, t): n_at_risk, n_events, n_censored,
    survival (6dp).
    """
    base = df.filter(f"{duration_col} IS NOT NULL").selectExpr(
        f"{group_col} AS g",
        f"CAST(floor({duration_col} * 1e6 + 0.5) AS BIGINT) AS tq",
        f"CASE WHEN {observed_col} THEN 1 ELSE 0 END AS obs",
    )
    per_t = base.groupBy("g", "tq").agg(
        F.expr("CAST(SUM(obs) AS BIGINT) AS d"),
        F.expr("CAST(SUM(1 - obs) AS BIGINT) AS c"),
    )
    tot = base.groupBy("g").agg(
        F.expr("CAST(count(*) AS BIGINT) AS n_tot")
    )
    w_prev = (
        "(PARTITION BY g ORDER BY tq"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
    )
    w_cur = (
        "(PARTITION BY g ORDER BY tq"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    risk = per_t.join(tot, "g").selectExpr(
        "g",
        "tq",
        "d",
        "c",
        f"n_tot - coalesce(SUM(d + c) OVER {w_prev}, 0) AS n",
    ).selectExpr(
        "g",
        "tq",
        "d",
        "c",
        "n",
        "CAST(1 AS DOUBLE) - CAST(d AS DOUBLE) / n AS __f",
    )
    return risk.selectExpr(
        "g",
        "tq",
        "d",
        "c",
        "n",
        f"max(CASE WHEN __f <= 0 THEN 1 ELSE 0 END) OVER {w_cur}"
        " AS __dead",
        f"SUM(CASE WHEN __f > 0 THEN ln(__f) END) OVER {w_cur} AS __ls",
    ).selectExpr(
        "g AS " + group_col,
        "CAST(tq AS DOUBLE) / 1e6 AS t",
        "n AS n_at_risk",
        "d AS n_events",
        "c AS n_censored",
        "CASE WHEN __dead = 1 THEN CAST(0 AS DOUBLE)"
        " ELSE round(exp(coalesce(__ls, CAST(0 AS DOUBLE))), 6)"
        " END AS survival",
    )
