"""Time-series indicator operators (round-6 surface widening).

The reference's analytics stop at the OHLC/consensus pipeline
(`/root/reference/src/hybrid_merger.py` — no indicator layer); these
are the standard financial-series follow-ons a user of such a pipeline
computes next, each expressed as one partitioned window pass or one
hash aggregate — JVM-side expressions only, no UDFs, every window
keyed by the series column so partitions parallelize at 100 TB.

Determinism contract (shared with plans/driver_queries.py): ordered
windows carry a total-order tiebreak; float outputs are rounded to 6
decimals with expression shapes mirrored verbatim in the DuckDB
oracles; cross-engine-exact sums go through integer/decimal fixed-
point (``floor(x·1e6+0.5)`` micro-units summed as DECIMAL(38,0)) so
summation order cannot drift the hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from institutional_fx_etl_spark.functions.cachereg import cached, cached_deser, cached_disk


def vwap(
    df: DataFrame,
    price_col: str,
    qty_col: str,
    group_cols: tuple[str, ...],
) -> DataFrame:
    """Volume-weighted average price per group:
    ``sum(price·qty)/sum(qty)`` with DECIMAL-exact partial sums (the
    repo's decimal-sum trick — map-side combine + one vocabulary-
    bounded shuffle, bit-identical across engines and partitionings).
    Output: group cols, vwap (round 6), total_qty."""
    pq = (F.col(price_col) * F.col(qty_col)).cast("decimal(38,6)")
    q = F.col(qty_col).cast("decimal(38,6)")
    return (
        df.groupBy(*group_cols)
        .agg(
            F.sum(pq).alias("__spq"),
            F.sum(q).alias("__sq"),
        )
        .select(
            *group_cols,
            F.round(
                (F.col("__spq") / F.col("__sq")).cast("double"), 6
            ).alias("vwap"),
            F.col("__sq").cast("double").alias("total_qty"),
        )
    )


def max_drawdown(
    df: DataFrame,
    value_col: str,
    order_cols: tuple[str, ...],
    partition_cols: tuple[str, ...],
) -> DataFrame:
    """Maximum drawdown per series: running peak (unbounded-preceding
    max) then the largest peak-to-value decline ``(peak − v)/peak``.
    One ordered window + one hash aggregate per series. Output:
    partition cols, max_drawdown (round 6), n_rows."""
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    peak = F.max(value_col).over(w)
    dd = (peak - F.col(value_col)) / peak
    return (
        df.select(*partition_cols, dd.alias("__dd"))
        .groupBy(*partition_cols)
        .agg(
            F.round(F.max("__dd"), 6).alias("max_drawdown"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def realized_volatility(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    order_cols: tuple[str, ...],
    partition_cols: tuple[str, ...],
) -> DataFrame:
    """Realized volatility per (series, day): the square root of the
    day's sum of squared log returns (the standard high-frequency
    vol estimator). The log-return lag runs over the full series
    order (returns spanning midnight belong to the day they land in);
    the per-day sum is fixed-point (micro-unit bigint of each squared
    return, summed as DECIMAL — order-independent) so the hash cannot
    drift. Output: partition cols, d, realized_vol (round 6),
    n_returns."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    lr = F.log(F.col(value_col) / F.lag(value_col).over(w))
    sq_micro = F.expr(
        "CAST(floor(__lr * __lr * 1e6 + 0.5) AS DECIMAL(38,0))"
    )
    return (
        df.withColumn("__lr", lr)
        .filter(F.col("__lr").isNotNull())
        .select(
            *partition_cols,
            # date-of-day as midnight TIMESTAMP: the contract compare
            # is dtype-strict and DATE surfaces differently per engine
            F.to_date(ts_col).cast("timestamp").alias("d"),
            sq_micro.alias("__sq"),
        )
        .groupBy(*partition_cols, "d")
        .agg(
            F.round(
                F.sqrt(F.sum("__sq").cast("double") / F.lit(1e6)), 6
            ).alias("realized_vol"),
            F.count(F.lit(1)).alias("n_returns"),
        )
    )


def rsi_cutler(
    df: DataFrame,
    value_col: str,
    order_cols: tuple[str, ...],
    partition_cols: tuple[str, ...],
    n: int = 14,
) -> DataFrame:
    """Cutler's RSI (simple-moving-average form — window-expressible,
    unlike Wilder's recursive smoothing): over the trailing ``n``
    diffs, ``rsi = 100 − 100/(1 + avgGain/avgLoss)``; all-gain
    windows pin to 100, all-loss to 0, and the first row (no diff)
    is NULL. One ordered window pass per series."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    diff = F.col(value_col) - F.lag(value_col).over(w)
    frame = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(-(n - 1), 0)
    )
    gain = F.avg(F.greatest(F.col("__diff"), F.lit(0.0))).over(frame)
    loss = F.avg(F.greatest(-F.col("__diff"), F.lit(0.0))).over(frame)
    rsi = (
        F.when(F.col("__diff").isNull(), F.lit(None).cast("double"))
        .when(F.col("__loss") == 0.0, F.lit(100.0))
        .otherwise(
            F.lit(100.0)
            - F.lit(100.0) / (F.lit(1.0) + F.col("__gain") / F.col("__loss"))
        )
    )
    return (
        df.withColumn("__diff", diff)
        .withColumn("__gain", gain)
        .withColumn("__loss", loss)
        .withColumn("rsi", F.round(rsi, 6))
        .drop("__diff", "__gain", "__loss")
    )


def autocorr_exact(
    df: DataFrame,
    value_col: str,
    order_cols: tuple[str, ...],
    partition_cols: tuple[str, ...],
    lag: int = 1,
) -> DataFrame:
    """Lag-k autocorrelation per series, EXACT across engines: built-in
    ``corr`` is a streaming co-moment whose last-ulp result depends on
    partition/visit order, so instead the inputs are fixed-pointed to
    micro-units (``floor(v·1e6+0.5)`` bigints) and the five Pearson
    sums (Σx Σy Σxy Σx² Σy²) accumulate as DECIMAL(38,0) — integer-
    exact under any grouping — with the final formula evaluated once
    in doubles with an expression shape the oracle mirrors verbatim.
    Output: partition cols, autocorr (round 6), n_pairs."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    # micro-unit BIGINTs at row level (products stay in long range for
    # |v| < ~3e3); the per-group sums cast to DECIMAL(38,0) so they
    # are integer-exact under any partial-aggregation grouping
    x = F.expr(f"CAST(floor({value_col} * 1e6 + 0.5) AS BIGINT)")
    dec = "decimal(38,0)"
    paired = (
        df.withColumn("__x", x)
        .withColumn("__y", F.lag("__x", lag).over(w))
        .filter(F.col("__y").isNotNull())
    )
    agg = paired.groupBy(*partition_cols).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.col("__x").cast(dec)).alias("__sx"),
        F.sum(F.col("__y").cast(dec)).alias("__sy"),
        F.sum((F.col("__x") * F.col("__y")).cast(dec)).alias("__sxy"),
        F.sum((F.col("__x") * F.col("__x")).cast(dec)).alias("__sxx"),
        F.sum((F.col("__y") * F.col("__y")).cast(dec)).alias("__syy"),
    )
    corr_sql = (
        "round((CAST(n_pairs AS DOUBLE) * CAST(__sxy AS DOUBLE)"
        " - CAST(__sx AS DOUBLE) * CAST(__sy AS DOUBLE))"
        " / sqrt((CAST(n_pairs AS DOUBLE) * CAST(__sxx AS DOUBLE)"
        " - CAST(__sx AS DOUBLE) * CAST(__sx AS DOUBLE))"
        " * (CAST(n_pairs AS DOUBLE) * CAST(__syy AS DOUBLE)"
        " - CAST(__sy AS DOUBLE) * CAST(__sy AS DOUBLE))), 6)"
    )
    return agg.selectExpr(
        *partition_cols, f"{corr_sql} AS autocorr", "n_pairs"
    )


def minmax_normalize(
    df: DataFrame,
    value_col: str,
    partition_cols: tuple[str, ...],
    out_col: str = "value_mm",
) -> DataFrame:
    """Per-group min-max scaling ``(v − min)/(max − min)`` (the
    companion to ``zscore_normalize``): one hash aggregate per group,
    broadcast back onto the scan — no window, no per-group sort.
    Constant groups (max == min) scale to NULL (division by zero under
    non-ANSI — the oracle mirrors with NULLIF)."""
    bounds = df.groupBy(*partition_cols).agg(
        F.min(value_col).alias("__mn"), F.max(value_col).alias("__mx")
    )
    joined = (
        df.join(F.broadcast(bounds), list(partition_cols))
        if partition_cols
        else df.crossJoin(F.broadcast(bounds))
    )
    return joined.withColumn(
        out_col,
        F.round(
            (F.col(value_col) - F.col("__mn"))
            / F.nullif(F.col("__mx") - F.col("__mn"), F.lit(0.0)),
            6,
        ),
    ).drop("__mn", "__mx")


def mad_robust(
    df: DataFrame,
    value_col: str,
    partition_cols: tuple[str, ...],
) -> DataFrame:
    """Median absolute deviation per group — the robust dispersion
    statistic quality filters use where stddev is outlier-poisoned:
    ``MAD = median(|x − median(x)|)``. Two exact interpolating
    percentiles: the group median broadcasts back onto the scan, then
    one more hash aggregate over the absolute deviations. Output:
    partition cols, med (round 6), mad (round 6), n_rows."""
    med = df.groupBy(*partition_cols).agg(
        F.percentile(value_col, 0.5).alias("__med")
    )
    joined = (
        df.join(F.broadcast(med), list(partition_cols))
        if partition_cols
        else df.crossJoin(F.broadcast(med))
    )
    return (
        joined.withColumn(
            "__ad", F.abs(F.col(value_col) - F.col("__med"))
        )
        .groupBy(*partition_cols)
        .agg(
            F.round(F.max("__med"), 6).alias("med"),
            F.round(F.percentile("__ad", 0.5), 6).alias("mad"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    partition_cols: tuple[str, ...],
    lo: float = 0.01,
    hi: float = 0.99,
    out_col: str = "value_w",
) -> DataFrame:
    """Per-group winsorization: clip to the group's [lo, hi] exact
    interpolated percentiles — the outlier treatment before training
    on heavy-tailed features. One percentile aggregate broadcast back
    onto the scan, clip is a scan-side ``least/greatest``. Clip
    bounds are rounded to 6 before clipping so both engines clip
    against the identical number."""
    bounds = df.groupBy(*partition_cols).agg(
        F.round(F.percentile(value_col, lo), 6).alias("__lo"),
        F.round(F.percentile(value_col, hi), 6).alias("__hi"),
    )
    joined = (
        df.join(F.broadcast(bounds), list(partition_cols))
        if partition_cols
        else df.crossJoin(F.broadcast(bounds))
    )
    return joined.withColumn(
        out_col,
        F.least(F.greatest(F.col(value_col), F.col("__lo")), F.col("__hi")),
    ).drop("__lo", "__hi")


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    num_buckets: int = 10,
    lo: float = 0.0,
    hi: float = 500.0,
    eps: float = 1e-4,
) -> DataFrame:
    """Population Stability Index between a reference and a current
    window of the same metric — the standard production drift monitor
    (PSI > 0.2 ≈ significant shift): equi-width buckets over a FIXED
    [lo, hi) range (fixed, so the two sides bucket identically and
    the monitor is comparable across runs), per-bucket population
    shares clamped by ``eps``, ``Σ (cur−ref)·ln(cur/ref)``. Two scans
    + one ``num_buckets``-row join; everything else is scalar math on
    the bounded bucket table. Output: one row — psi (round 6),
    n_ref, n_cur."""
    width = (hi - lo) / num_buckets
    bucket = F.least(
        F.greatest(
            F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)), F.lit(0)
        ),
        F.lit(num_buckets - 1),
    ).cast("int")

    def shares(df: DataFrame, name: str) -> DataFrame:
        counts = df.groupBy(bucket.alias("b")).agg(
            F.count(F.lit(1)).alias(f"__c_{name}")
        )
        return counts

    r = shares(ref, "ref")
    c = shares(cur, "cur")
    n_r = "CAST(sum(__c_ref) OVER () AS DOUBLE)"
    n_c = "CAST(sum(__c_cur) OVER () AS DOUBLE)"
    per_bucket = (
        r.join(c, "b", "full_outer")
        .selectExpr(
            "b",
            "coalesce(__c_ref, 0L) AS __c_ref",
            "coalesce(__c_cur, 0L) AS __c_cur",
        )
        .selectExpr(
            "__c_ref",
            "__c_cur",
            f"greatest(coalesce(__c_ref, 0L) / {n_r}, {eps!r}D) AS __p_ref",
            f"greatest(coalesce(__c_cur, 0L) / {n_c}, {eps!r}D) AS __p_cur",
        )
        .selectExpr(
            "__c_ref",
            "__c_cur",
            "(__p_cur - __p_ref) * ln(__p_cur / __p_ref) AS __term",
        )
    )
    return per_bucket.agg(
        F.round(F.sum("__term"), 6).alias("psi"),
        F.sum("__c_ref").alias("n_ref"),
        F.sum("__c_cur").alias("n_cur"),
    )


def linreg_per_group(
    df: DataFrame,
    ts_col: str,
    y_col: str,
    partition_cols: tuple[str, ...],
    base_ts: str = "2024-01-01 00:00:00",
    y_scale: int = 1_000_000,
) -> DataFrame:
    """Exact per-group ordinary-least-squares trend (slope, intercept,
    r²) from mergeable second moments — the distributed form of a
    regression: one map-side-combinable hash aggregate computes
    (n, Σx, Σy, Σx², Σxy, Σy²) per group, then the closed-form OLS
    formulas run on the six scalars. No window, no sort, no second
    pass — the plan is a partial agg → one small exchange → final agg,
    the same shape at 100 TB.

    Cross-engine exactness: x is integer MICROSECONDS since
    ``base_ts`` (``unix_micros`` — timestamps are microsecond-grain,
    so no float rounding), y fix-points to ``floor(y·y_scale+0.5)``
    BIGINT, and the five sums accumulate as DECIMAL(38,0) (integer
    sums — order-independent). The final formulas cast each exact sum
    to DOUBLE once and keep one parenthesization, mirrored verbatim
    in the DuckDB oracle (HUGEINT sums there).

    Output: partition cols, n_rows, slope_per_sec, intercept, r2.
    """
    x = (
        f"unix_micros(CAST({ts_col} AS TIMESTAMP))"
        f" - unix_micros(CAST(TIMESTAMP '{base_ts}' AS TIMESTAMP))"
    )
    qy = f"CAST(floor({y_col} * {y_scale} + 0.5) AS BIGINT)"
    dec = "DECIMAL(38,0)"
    moments = df.selectExpr(
        *partition_cols, f"({x}) AS __x", f"({qy}) AS __y"
    ).groupBy(*partition_cols).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.expr(f"CAST(__x AS {dec})")).alias("__sx"),
        F.sum(F.expr(f"CAST(__y AS {dec})")).alias("__sy"),
        F.sum(
            F.expr(f"CAST(__x AS {dec}) * CAST(__x AS {dec})")
        ).alias("__sxx"),
        F.sum(
            F.expr(f"CAST(__x AS {dec}) * CAST(__y AS {dec})")
        ).alias("__sxy"),
        F.sum(
            F.expr(f"CAST(__y AS {dec}) * CAST(__y AS {dec})")
        ).alias("__syy"),
    )
    n = "CAST(__n AS DOUBLE)"
    sx = "CAST(__sx AS DOUBLE)"
    sy = "CAST(__sy AS DOUBLE)"
    sxx = "CAST(__sxx AS DOUBLE)"
    sxy = "CAST(__sxy AS DOUBLE)"
    syy = "CAST(__syy AS DOUBLE)"
    num = f"({n} * {sxy} - {sx} * {sy})"
    den = f"({n} * {sxx} - {sx} * {sx})"
    deny = f"({n} * {syy} - {sy} * {sy})"
    # slope in y-units per SECOND: micro-y per microsecond is
    # y/1e6 per x/1e6 — the two scales cancel only when
    # y_scale == 1e6; keep both factors explicit so other scales work
    slope_units = f"({num} / {den}) * (1000000.0 / {float(y_scale)!r})"
    intercept = (
        f"(({sy} / {n}) - ({num} / {den}) * ({sx} / {n}))"
        f" / {float(y_scale)!r}"
    )
    r2 = f"({num} * {num}) / ({den} * {deny})"
    return moments.selectExpr(
        *partition_cols,
        "__n AS n_rows",
        f"round({slope_units}, 6) AS slope_per_sec",
        f"round({intercept}, 6) AS intercept",
        f"round({r2}, 6) AS r2",
    )


def twap(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    group_cols: tuple[str, ...],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Time-weighted average price per group over IRREGULARLY spaced
    observations: each value holds until the next observation, so its
    weight is the gap to the successor (``sum(vᵢ·Δtᵢ)/sum(Δtᵢ)``; the
    final observation of a series has no successor and carries zero
    weight — the standard left-closed TWAP convention). The duration
    weighting is what distinguishes this from ``vwap``/plain mean:
    bursts of quotes stop dominating the average.

    One per-group ordered window (``lead`` — the ordering carries a
    total-order tiebreak) then one hash aggregate; both keyed on the
    group columns, so series parallelize independently at 100 TB.

    Cross-engine exactness: Δt is integer MICROSECONDS
    (``unix_micros`` — no float time math), values fix-point to
    ``floor(v·1e6+0.5)`` BIGINT, and the weighted sum accumulates as
    DECIMAL(38,0), so summation order cannot drift the result; the
    single double division happens once at the end, mirrored verbatim
    in the oracle. Output: group cols, twap (round 6), dur_seconds.
    """
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(*group_cols).orderBy(*order)
    us = f"unix_micros(CAST({ts_col} AS TIMESTAMP))"
    stepped = df.withColumn(
        "__dt",
        F.lead(F.expr(us)).over(w) - F.expr(us),
    ).filter(F.col("__dt").isNotNull())
    vdt = (
        f"CAST(floor({value_col} * 1000000.0 + 0.5) AS DECIMAL(38,0))"
        " * CAST(__dt AS DECIMAL(38,0))"
    )
    return (
        stepped.selectExpr(
            *group_cols, f"{vdt} AS __vdt", "CAST(__dt AS DECIMAL(38,0)) AS __dtd"
        )
        .groupBy(*group_cols)
        .agg(
            F.sum("__vdt").alias("__svdt"),
            F.sum("__dtd").alias("__sdt"),
        )
        .selectExpr(
            *group_cols,
            "round(CAST(__svdt AS DOUBLE) / CAST(__sdt AS DOUBLE)"
            " / 1000000.0, 6) AS twap",
            "round(CAST(__sdt AS DOUBLE) / 1000000.0, 6) AS dur_seconds",
        )
    )


def spearman_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: tuple[str, ...] = (),
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Exact Spearman rank correlation per group, deterministic under
    ties: ranks are ``row_number`` over ``(value, *tiebreak_cols)`` —
    a TOTAL order (callers pass a unique tiebreak), so both engines
    assign identical integer ranks and the whole statistic reduces to
    the classic ρ = 1 − 6·Σd² / (n·(n²−1)) with Σd² an exact BIGINT
    sum (DECIMAL(38,0) against overflow at scale) and ONE final double
    division — no float summation order anywhere (the micro-unit
    exactness policy, ROADMAP §19).

    Scale shape (r15): DISTRIBUTED two-phase ranking
    (:mod:`functions.distrank`) — the former per-group ranking
    windows sorted each whole group on ONE task (O(group) critical
    path; 3 tasks carried the full 1.9 s of lineitem CPU at sf0.1).
    Now each rank is a range-repartition + bounded local sort + tiny
    offset rollup: no task ever sorts more than its range slice, at
    any group-size distribution.

    Tie determinism: the caller's tiebreak need not be unique in the
    physical data (the synthetic lineitem repeats (orderkey,
    linenumber)), and the former plan's tie order was SCAN order only
    by accident of a single-map shuffle — so an explicit scan-position
    column (``monotonically_increasing_id`` taken on the raw input,
    before any exchange) is appended as the final tiebreak. On a
    single-split scan that IS the stable-sort/arrival order both the
    old plan and the DuckDB oracle resolve ties by (hash-verified at
    sf0.001/0.01), and at any parallelism it stays deterministic
    instead of arrival-order-dependent. Ranks are then bit-identical
    to the single-task window and the oracle hash is unchanged.
    """
    from institutional_fx_etl_spark.functions.distrank import (
        dist_row_number,
    )

    g = list(group_cols)
    tb = list(tiebreak_cols)
    base = df.select(*g, x_col, y_col, *tb).withColumn(
        "__mid", F.monotonically_increasing_id()
    )
    sx = dist_row_number(base, g, [x_col, *tb, "__mid"], "__rx")
    # the y-ranking's final tiebreak is __rx, NOT scan position: the
    # former plan sorted the y-window over the x-window's output, so
    # stable-sort ties in (y, tb) resolved in x-rank order — mirrored
    # here exactly (and __rx is unique, so the order is total)
    ranked = dist_row_number(
        sx.select(*g, y_col, *tb, "__rx"),
        g,
        [y_col, *tb, "__rx"],
        "__ry",
    ).select(*g, "__rx", "__ry")
    d2 = "CAST((__rx - __ry) AS DECIMAL(38,0)) * (__rx - __ry)"
    agg = ranked.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(f"sum({d2})").alias("__sd2"),
    )
    rho = (
        "1.0D - 6.0D * CAST(__sd2 AS DOUBLE)"
        " / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)"
        " - 1.0D))"
    )
    return agg.selectExpr(
        *g,
        "CAST(n AS BIGINT) AS n",
        f"CASE WHEN n > 1 THEN floor(({rho}) * 1e6 + 0.5) / 1e6"
        " ELSE NULL END AS spearman",
    )


def rolling_distinct(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    window_days: int = 7,
) -> DataFrame:
    """Trailing-``window_days`` EXACT distinct-key count per active day
    (rolling 7-day-active-users over an event stream).

    Exact rolling COUNT(DISTINCT) cannot ride an ordinary window frame
    (distinctness does not decompose), and the naive day×window range
    join rescans the fact table per day. Spark shape instead: each
    event row EMITS its ≤``window_days`` target days scan-side
    (``explode(sequence(day, day+w-1))`` — bounded ×w fan-out, no
    range join), a semi-join keeps only days that actually occur, and
    one hash aggregate counts distinct keys per target day. Shuffle
    keys are (day, key) ids — at 100 TB the fan-out is the constant
    ``window_days``, never O(days²), and partial aggregation collapses
    per-day duplicates map-side.
    """
    day = f"date_trunc('DAY', {ts_col})"
    emitted = df.selectExpr(
        f"explode(sequence({day}, {day} + make_interval(0, 0, 0,"
        f" {window_days - 1}, 0, 0, 0), interval 1 day)) AS day",
        f"{key_col} AS k",
    )
    active = df.selectExpr(f"{day} AS day").distinct()
    return (
        emitted.join(active, "day", "left_semi")
        .groupBy("day")
        .agg(F.count_distinct("k").alias(f"{key_col}_{window_days}d"))
    )

def ewma_exprs(
    value_col: str,
    over_sql: str,
    alpha: float = 0.25,
    k: int = 8,
) -> str:
    """SQL text for a truncated-horizon EWMA: ``round(num/den, 6)``
    where ``num = Σ_{j<k} w_j·lag(value, j)`` and ``den`` re-normalizes
    over the lags actually present (series head), with
    ``w_j = α(1-α)^j``.

    The infinite-memory EWMA recurrence is order-SERIAL (each row
    depends on the previous result) — it cannot ride a window frame
    and would force a single-pass stateful scan. The truncated form is
    the distributable equivalent: at j=8, the dropped tail carries
    (1-α)^8 ≈ 10% of the mass which the denominator re-normalization
    absorbs, and every term is an independent ``lag`` over ONE
    partitioned sort — the same single window pass all the indicator
    family shares.

    Cross-engine exactness: this returns one SQL string used VERBATIM
    by both the Spark `selectExpr` and the DuckDB oracle — weights are
    `CAST('<repr>' AS DOUBLE)` literals (string→double is correctly
    rounded in both engines) and the `+`/`*`/`/` chains parse
    left-associative in both, so every intermediate is the same IEEE
    double on both sides (the expression-shape-mirroring contract,
    plans/driver_queries.py docstring).
    """
    weights = [alpha * (1.0 - alpha) ** j for j in range(k)]

    def lit(w: float) -> str:
        return f"CAST('{w!r}' AS DOUBLE)"

    def lagged(j: int) -> str:
        if j == 0:
            return value_col
        return f"lag({value_col}, {j}) OVER {over_sql}"

    num = " + ".join(
        f"{lit(w)} * coalesce({lagged(j)}, {lit(0.0)})"
        for j, w in enumerate(weights)
    )
    den = " + ".join(
        [lit(weights[0])]
        + [
            f"(CASE WHEN {lagged(j)} IS NULL THEN {lit(0.0)}"
            f" ELSE {lit(w)} END)"
            for j, w in enumerate(weights)
            if j > 0
        ]
    )
    return f"round(({num}) / ({den}), 6)"

def candle_pattern_exprs(over_sql: str) -> list[str]:
    """SQL flag expressions for the classic single/two-candle
    candlestick patterns over OHLC columns ``open/high/low/close``:
    doji (body ≤ 10% of range), hammer (lower shadow ≥ 2× body, upper
    shadow ≤ body), shooting star (mirrored), and bullish/bearish
    engulfing (current body swallows the previous candle's body —
    needs ``lag(open/close)`` over ``over_sql``, the one window pass).

    Division-free forms (``body·10 ≤ range`` instead of
    ``body/range ≤ 0.1``) avoid div-by-zero rows; every comparison is
    plain IEEE arithmetic on the candle doubles with the expression
    text shared verbatim between the Spark plan and the DuckDB oracle
    (expression-shape mirroring), so the flags are bit-identical.
    First row per partition: engulfing flags are NULL (no previous
    candle) — both engines agree.
    """
    body = "abs(close - open)"
    rng = "(high - low)"
    upsh = "(high - greatest(open, close))"
    dnsh = "(least(open, close) - low)"
    po = f"(lag(open, 1) OVER {over_sql})"
    pc = f"(lag(close, 1) OVER {over_sql})"
    return [
        f"({body} * 10.0 <= {rng}) AS doji",
        f"({dnsh} >= {body} * 2.0 AND {upsh} <= {body}) AS hammer",
        f"({upsh} >= {body} * 2.0 AND {dnsh} <= {body}) AS shooting_star",
        f"({pc} < {po} AND close > open AND open <= {pc}"
        f" AND close >= {po}) AS bull_engulf",
        f"({pc} > {po} AND close < open AND open >= {pc}"
        f" AND close <= {po}) AS bear_engulf",
    ]


def cusum_changepoint(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    id_col: str = "event_id",
    group_col: str = "event_type",
    target: float = 55.0,
    threshold: float = 200.0,
    bucket_seconds: int = 86_400,
) -> DataFrame:
    """Per-group upper CUSUM drift statistic with alarm flags — the
    classic sequential changepoint detector ``S_i = max(0, S_{i-1} +
    (x_i - target))``, alarm when ``S_i > threshold``.

    The recursion looks inherently sequential, but it has a prefix
    closed form: with ``P_i = Σ_{j<=i}(x_j - target)``,

        ``S_i = P_i - min(0, min_{j<=i} P_j)``

    (the reflected-walk identity: subtracting the running minimum of
    the unreflected walk, floored at the origin, IS the reflection).
    That turns the stateful filter into a running sum + running min —
    and those decompose into the same two-level range prefix
    ``ks_two_sample`` uses: rows carry time buckets; per-bucket
    subtotals (sum, min-of-local-prefix) prefix in a bucket-count-sized
    window; the bucket offset and the prior-buckets' global minimum
    broadcast back onto the in-bucket window. No single-partition
    full-data stage even when one group holds the whole corpus.

    Exactness: values fix-point to micro-units
    (``floor(x*1e6 + 0.5)`` BIGINT) so every sum/min/comparison is
    integer — the output hashes identically against a single-window
    oracle because integer prefix sums and mins are
    decomposition-invariant.

    Output: group, id, ``cusum_micro`` (BIGINT, micro-units), ``alarm``
    (boolean). Two-sided monitoring is this operator applied twice
    (negate the series for the lower side).
    """
    k_micro = int(round(target * 1_000_000))
    h_micro = int(round(threshold * 1_000_000))
    base = df.selectExpr(
        f"{group_col} AS grp",
        f"{id_col} AS id",
        f"{ts_col} AS ts",
        f"CAST(floor({value_col} * 1000000 + 0.5) AS BIGINT)"
        f" - {k_micro} AS d",
        # divisor computed in PYTHON: an in-SQL `3600 * 1000000`
        # multiplies as int32 and silently wraps (ansi off), which
        # broke bucket monotonicity for sub-day bucket sizes
        f"unix_micros(CAST({ts_col} AS TIMESTAMP))"
        f" div {bucket_seconds * 1_000_000} AS bkt",
    )
    from pyspark import StorageLevel

    in_bucket_w = (
        "(PARTITION BY grp, bkt ORDER BY ts, id"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    # one in-bucket sort feeds BOTH window functions (p, then its
    # running min — same spec, one exchange+sort); persisted because
    # the bucket rollup and the final combine both consume it
    local = (
        base.withColumn(
            "p", F.expr(f"CAST(SUM(d) OVER {in_bucket_w} AS BIGINT)")
        )
        .withColumn(
            "m", F.expr(f"CAST(MIN(p) OVER {in_bucket_w} AS BIGINT)")
        )
        .select("grp", "id", "bkt", "d", "p", "m")
        .transform(cached)
    )
    # bucket rollup: one tiny row per (group, bucket). t is the
    # bucket's TOTAL delta (sum of d — not max(p): with negative
    # deltas the running prefix peaks mid-bucket); off = sum of PRIOR
    # buckets; mprior = min of (off' + whole-bucket min-prefix) over
    # PRIOR buckets (NULL for the group's first bucket).
    per_bkt = (
        local.groupBy("grp", "bkt")
        .agg(
            F.expr("CAST(SUM(d) AS BIGINT) AS t"),
            F.expr("CAST(MIN(m) AS BIGINT) AS mstar"),
        )
        .selectExpr(
            "grp",
            "bkt",
            "mstar",
            "CAST(SUM(t) OVER (PARTITION BY grp ORDER BY bkt"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t"
            " AS BIGINT) AS off",
        )
        .selectExpr(
            "grp",
            "bkt",
            "off",
            "CAST(MIN(off + mstar) OVER (PARTITION BY grp ORDER BY bkt"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
            " AS BIGINT) AS mprior",
        )
    )
    return (
        local.join(F.broadcast(per_bkt), ["grp", "bkt"])
        .selectExpr(
            "grp",
            "id",
            "off + p AS pre",
            "least(coalesce(mprior, off + m), off + m) AS runmin",
        )
        .selectExpr(
            "grp",
            "id",
            "CAST(pre - least(0, runmin) AS BIGINT) AS cusum_micro",
            f"pre - least(0, runmin) > {h_micro} AS alarm",
        )
    )


def decay_score(
    df: DataFrame,
    key_col: str,
    value_col: str,
    ts_col: str,
    as_of: str,
    half_life_days: int = 1,
    max_age: int = 40,
) -> DataFrame:
    """Recency-weighted engagement score per key: ``Σ value ·
    2^(−age/half_life)`` with age in whole days against a fixed
    ``as_of`` date — the feature a ranking/abuse system keeps per user
    where a plain sum never forgets.

    The decay base is deliberately 2 (not e): ``2^(−k)`` for integer k
    is an EXACT double (one exact division by ``pow(2, k)``, itself an
    exactly-representable integer ≤ 2⁴⁰), so there is no libm
    transcendental anywhere — the classic ``exp(−λΔt)`` form drifts in
    the last ulp across engines. Any half-life is expressible by
    rescaling ``half_life_days``. Per-term micro-rounding + DECIMAL
    summation make the aggregate order-invariant; ages beyond
    ``max_age`` half-lives floor to a zero term anyway (2⁻⁴⁰ < 1e-6
    for any bounded value). One scan, one hash aggregate.

    Output: key, n_events, decayed_score (round 6 via the micro grid).
    """
    k = (
        f"least(greatest(CAST(datediff(DATE'{as_of}',"
        f" CAST({ts_col} AS DATE)) AS INT) div {half_life_days}, 0),"
        f" {max_age})"
    )
    term = (
        f"CAST(floor({value_col} / CAST(pow(2, {k}) AS BIGINT)"
        " * 1000000 + 0.5) AS DECIMAL(38,0))"
    )
    return (
        df.filter(f"{value_col} IS NOT NULL")
        .selectExpr(f"{key_col} AS key", f"{term} AS t")
        .groupBy("key")
        .agg(
            F.expr("CAST(COUNT(1) AS BIGINT) AS n_events"),
            F.expr("CAST(SUM(t) AS DOUBLE) / 1000000 AS decayed_score"),
        )
    )


def roll_spread(
    df: DataFrame,
    value_col: str,
    order_cols: tuple[str, ...],
    partition_cols: tuple[str, ...],
) -> DataFrame:
    """Roll (1984) effective-spread estimator per series: bid-ask
    bounce makes consecutive price CHANGES negatively autocorrelated,
    and the implied spread is ``2·√(−cov(Δp_t, Δp_{t−1}))`` — the
    classic microstructure statistic a tick pipeline reports next to
    realized volatility.

    One ordered window pass (two chained lags) + one hash aggregate
    per series. Cross-engine exactness: Δp quantizes to micro-units
    FIRST (``floor(Δ·1e6 + 0.5)`` BIGINT), then the covariance's
    three sums (Σxy, Σx, Σy) accumulate those integers as
    DECIMAL(38,0), so the numerator ``n·Σxy − Σx·Σy`` is exact
    integer arithmetic — only the final division/sqrt is a double,
    mirrored in the oracle.

    Output: partition cols, n_pairs, autocov (6 dp),
    roll_spread (6 dp; NULL when the autocovariance is non-negative —
    the estimator is undefined there, the standard convention).
    """
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    base = df.select(
        *partition_cols,
        F.col(value_col).alias("__v"),
        *[F.col(c) for c in order_cols if c not in partition_cols],
    )
    lag1 = F.lag("__v").over(w)
    dm = F.floor((F.col("__v") - lag1) * F.lit(1e6) + F.lit(0.5)).cast(
        "long"
    )
    stepped = base.withColumn("__dm", dm).withColumn(
        "__dp", F.lag("__dm").over(w)
    )
    pairs = stepped.filter("__dm IS NOT NULL AND __dp IS NOT NULL")
    return (
        pairs.groupBy(*partition_cols)
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.expr(
                "SUM(CAST(__dm AS DECIMAL(38,0))"
                " * CAST(__dp AS DECIMAL(38,0))) AS __sxy"
            ),
            F.expr("SUM(CAST(__dm AS DECIMAL(38,0))) AS __sx"),
            F.expr("SUM(CAST(__dp AS DECIMAL(38,0))) AS __sy"),
        )
        .selectExpr(
            *partition_cols,
            "n_pairs",
            "CAST(CAST(n_pairs AS DECIMAL(38,0)) * __sxy - __sx * __sy"
            " AS DOUBLE) / (CAST(n_pairs AS DOUBLE) * n_pairs) / 1e12"
            " AS __cov",
        )
        .selectExpr(
            *partition_cols,
            "n_pairs",
            "round(__cov, 6) AS autocov",
            "CASE WHEN __cov < 0 THEN round(2 * sqrt(-__cov), 6)"
            " ELSE NULL END AS roll_spread",
        )
    )


def parkinson_vol(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    partition_cols: tuple[str, ...],
) -> DataFrame:
    """Parkinson (1980) high-low volatility per (series, day): the
    range-based estimator ``√(ln(H/L)² / (4·ln 2))`` — ~5× more
    efficient than close-to-close on the same data, and the reason
    OHLC candles carry their extremes. One hash aggregate (max/min —
    map-side combinable) per (series, day); positive values only
    (the ratio needs H, L > 0). H and L are EXACT (no float
    summation anywhere); the single ln/sqrt expression is mirrored
    in the oracle. Output: partition cols, d (day as timestamp),
    n_ticks, hi, lo, park_vol (6 dp).
    """
    return (
        df.filter(f"{value_col} IS NOT NULL AND {value_col} > 0")
        .groupBy(
            *partition_cols,
            F.expr(f"CAST(CAST({ts_col} AS DATE) AS TIMESTAMP)").alias(
                "d"
            ),
        )
        .agg(
            F.count(F.lit(1)).alias("n_ticks"),
            F.max(value_col).alias("hi"),
            F.min(value_col).alias("lo"),
        )
        .selectExpr(
            *partition_cols,
            "d",
            "n_ticks",
            "hi",
            "lo",
            "round(sqrt(pow(ln(hi / lo), 2) / (4 * ln(2))), 6)"
            " AS park_vol",
        )
    )


def theil_sen_slope(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    order_cols: tuple[str, ...],
    partition_cols: tuple[str, ...],
    max_points: int = 200,
) -> DataFrame:
    """Theil-Sen robust trend per series: the MEDIAN of all pairwise
    slopes ``(y_j − y_i)/(x_j − x_i)`` — up to 29% outlier
    contamination leaves it unmoved, which is why it is the robust
    counterpart to :func:`linreg_per_group`'s OLS.

    The pairwise step is inherently O(n²), so each series is first
    capped to its ``max_points`` EARLIEST rows (row_number over the
    deterministic order — the dedup_recall_eval capped-quadratic
    discipline, documented not silent); the self-join then stays
    ≤ C(max_points, 2) rows per series, distributed on the series
    key. Slopes quantize to micro-units (exact double division then
    ``floor(·1e6+0.5)``), and the median is the LOWER median (rank
    ``(n+1) div 2`` of the ascending micro-slopes) — rank selection
    over integers, no interpolation, bit-identical cross-engine.

    A series whose capped points admit NO valid pair (a single
    point, or every point sharing one timestamp) still surfaces —
    ``n_pairs = 0`` and a NULL ``ts_slope`` (r12 ADVICE: the silent
    inner-join row drop is gone; the caller sees the degenerate
    series instead of losing it).

    Output: partition cols, n_points, n_pairs, ts_slope (6 dp).
    """
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    pts = (
        df.filter(f"{value_col} IS NOT NULL")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(max_points))
        .selectExpr(
            *partition_cols,
            f"CAST(to_unix_timestamp({ts_col}) AS BIGINT) AS __x",
            f"CAST({value_col} AS DOUBLE) AS __y",
            "__rn",
        )
    )
    a = pts.selectExpr(
        *partition_cols, "__x AS xa", "__y AS ya", "__rn AS ra"
    )
    b = pts.selectExpr(
        *partition_cols, "__x AS xb", "__y AS yb", "__rn AS rb"
    )
    slopes = (
        a.join(b, list(partition_cols))
        .filter("ra < rb AND xa <> xb")
        .selectExpr(
            *partition_cols,
            "CAST(floor((yb - ya) / (xb - xa) * 1e6 + 0.5) AS BIGINT)"
            " AS __sm",
        )
    )
    ws = Window.partitionBy(*partition_cols).orderBy("__sm")
    wn = Window.partitionBy(*partition_cols)
    npts = pts.groupBy(*partition_cols).agg(
        F.count(F.lit(1)).alias("n_points")
    )
    med = (
        slopes.withColumn("__rk", F.row_number().over(ws))
        .withColumn("__np", F.count(F.lit(1)).over(wn))
        .filter("__rk = (__np + 1) div 2")
        .selectExpr(
            *partition_cols,
            "__np AS n_pairs",
            "round(CAST(__sm AS DOUBLE) / 1e6, 6) AS ts_slope",
        )
    )
    return npts.join(med, list(partition_cols), "left").selectExpr(
        *partition_cols,
        "n_points",
        "CAST(coalesce(n_pairs, 0) AS BIGINT) AS n_pairs",
        "ts_slope",
    )


def garman_klass_vol(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    order_cols: tuple[str, ...],
    partition_cols: tuple[str, ...],
) -> DataFrame:
    """Garman-Klass (1980) range-based volatility per (series, day) —
    the OHLC estimator one rung above :func:`parkinson_vol`: it uses
    all four candle prices, ``σ² = ½·ln(hi/lo)² − (2ln2−1)·ln(c/o)²``,
    for ~7.4× the efficiency of close-to-close variance. The
    expression is non-negative by construction (``hi ≥ max(o,c)``,
    ``lo ≤ min(o,c)`` force the range term to dominate), so the final
    sqrt never sees a negative operand.

    One hash aggregate per (series, day): open/close are
    ``min_by``/``max_by`` on the composite order key (the repo's
    deterministic ordered-pick discipline — the oracle mirrors with
    ``first/last(... ORDER BY ...)``), hi/lo are plain max/min. The
    single ln/sqrt expression is mirrored token-for-token in the
    oracle, constants written as ``(2 * ln(2) - 1)`` on both engines.

    Output: partition cols, day (timestamp), n_ticks, o, hi, lo, c,
    gk_vol (6 dp).
    """
    okey = "struct(" + ", ".join(order_cols) + ")"
    return (
        df.filter(f"{value_col} IS NOT NULL AND {value_col} > 0")
        .groupBy(
            *partition_cols,
            F.expr(f"CAST(CAST({ts_col} AS DATE) AS TIMESTAMP)").alias(
                "d"
            ),
        )
        .agg(
            F.count(F.lit(1)).alias("n_ticks"),
            F.expr(f"min_by({value_col}, {okey}) AS o"),
            F.expr(f"max({value_col}) AS hi"),
            F.expr(f"min({value_col}) AS lo"),
            F.expr(f"max_by({value_col}, {okey}) AS c"),
        )
        .selectExpr(
            *partition_cols,
            "d",
            "n_ticks",
            "o",
            "hi",
            "lo",
            "c",
            "round(sqrt(0.5 * pow(ln(hi / lo), 2)"
            " - (2 * ln(2) - 1) * pow(ln(c / o), 2)), 6) AS gk_vol",
        )
    )


def var_cvar(
    df: DataFrame,
    value_col: str,
    order_cols: tuple[str, ...],
    partition_cols: tuple[str, ...],
    alpha_pct: int = 5,
) -> DataFrame:
    """Historical Value-at-Risk and Conditional VaR (expected
    shortfall) of the per-tick price moves, per series — the risk
    tail summary a desk attaches to every symbol. VaR(α) is the
    α-quantile loss; CVaR is the mean loss AT OR BEYOND it
    (coherent where VaR alone is not, per Artzner et al. 1999).

    Exact integer order statistics (the :func:`roll_spread`
    discipline): moves quantize to micro-units via the lag diff, the
    tail rank is ``k = ⌈n·α/100⌉`` in pure integer arithmetic, the
    ascending (move, order-key) rank is a row_number with a total-
    order tiebreak, VaR is the NEGATED move at rank k and CVaR the
    negated DECIMAL-exact mean of ranks 1..k — one double division
    per series at the end, 6-dp round. Per-series windows + one hash
    aggregate; nothing global.

    Output: partition cols, n_returns, k_tail, var_loss, cvar_loss.
    """
    if not 0 < alpha_pct < 100:
        raise ValueError(f"alpha_pct in (0,100), got {alpha_pct}")
    d = (
        df.filter(f"{value_col} IS NOT NULL")
        .withColumn(
            "__dm",
            F.expr(
                f"CAST(floor(({value_col} - lag({value_col}) OVER"
                f" (PARTITION BY {', '.join(partition_cols)}"
                f" ORDER BY {', '.join(order_cols)}))"
                " * 1e6 + 0.5) AS BIGINT)"
            ),
        )
        .filter("__dm IS NOT NULL")
    )
    wr = Window.partitionBy(*partition_cols).orderBy("__dm", *order_cols)
    wn = Window.partitionBy(*partition_cols)
    ranked = (
        d.withColumn("__rk", F.row_number().over(wr))
        .withColumn("__n", F.count(F.lit(1)).over(wn))
        .withColumn(
            "__k", F.expr(f"(__n * {int(alpha_pct)} + 99) div 100")
        )
    )
    return (
        ranked.groupBy(*partition_cols)
        .agg(
            F.expr("CAST(max(__n) AS BIGINT) AS n_returns"),
            F.expr("CAST(max(__k) AS BIGINT) AS k_tail"),
            F.expr(
                "max(CASE WHEN __rk = __k THEN __dm END) AS __var_m"
            ),
            F.expr(
                "SUM(CASE WHEN __rk <= __k THEN"
                " CAST(__dm AS DECIMAL(38,0)) ELSE CAST(0 AS"
                " DECIMAL(38,0)) END) AS __tail_sum"
            ),
        )
        .selectExpr(
            *partition_cols,
            "n_returns",
            "k_tail",
            # `+ 0.0D` folds IEEE -0.0 to +0.0 (a zero move at the
            # VaR rank negates to -0.0; the driver hash is sign-bit-
            # sensitive)
            "round(-CAST(__var_m AS DOUBLE) / 1e6, 6) + 0.0D"
            " AS var_loss",
            "round(-(CAST(__tail_sum AS DOUBLE) / k_tail) / 1e6, 6)"
            " + 0.0D AS cvar_loss",
        )
    )


def kendall_tau(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    order_cols: tuple[str, ...],
    partition_cols: tuple[str, ...],
    max_points: int = 200,
) -> DataFrame:
    """Kendall's τ-b rank correlation between time and value per
    series — the concordance twin of :func:`spearman_corr` (τ is the
    probability a random pair moves together minus the probability it
    moves apart; the tie-corrected τ-b is the standard form on data
    with repeated values).

    Same capped-quadratic discipline as :func:`theil_sen_slope`
    (documented, never silent): each series contributes its
    ``max_points`` EARLIEST rows, the C(n,2) pair join distributes on
    the series key, and every count (concordant, discordant, x-ties,
    y-ties) is exact integer; τ-b divides once per series —
    ``(C − D) / sqrt((n0 − tx)·(n0 − ty))`` — with NULL when either
    factor is zero (a constant x or y admits no ranking signal).

    Output: partition cols, n_points, n_pairs, concordant,
    discordant, tau_b (6 dp).
    """
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    pts = (
        df.filter(f"{value_col} IS NOT NULL")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(max_points))
        .selectExpr(
            *partition_cols,
            f"CAST(to_unix_timestamp({ts_col}) AS BIGINT) AS __x",
            f"CAST(floor({value_col} * 1e6 + 0.5) AS BIGINT) AS __y",
            "__rn",
        )
    )
    a = pts.selectExpr(
        *partition_cols, "__x AS xa", "__y AS ya", "__rn AS ra"
    )
    b = pts.selectExpr(
        *partition_cols, "__x AS xb", "__y AS yb", "__rn AS rb"
    )
    pairs = (
        a.join(b, list(partition_cols))
        .filter("ra < rb")
        .selectExpr(
            *partition_cols,
            "CAST(sign(xb - xa) AS BIGINT) AS sx",
            "CAST(sign(yb - ya) AS BIGINT) AS sy",
        )
    )
    npts = pts.groupBy(*partition_cols).agg(
        F.count(F.lit(1)).alias("n_points")
    )
    stats = pairs.groupBy(*partition_cols).agg(
        F.expr("CAST(count(1) AS BIGINT) AS n_pairs"),
        F.expr(
            "CAST(SUM(CASE WHEN sx * sy > 0 THEN 1 ELSE 0 END)"
            " AS BIGINT) AS concordant"
        ),
        F.expr(
            "CAST(SUM(CASE WHEN sx * sy < 0 THEN 1 ELSE 0 END)"
            " AS BIGINT) AS discordant"
        ),
        F.expr(
            "CAST(SUM(CASE WHEN sx = 0 THEN 1 ELSE 0 END)"
            " AS BIGINT) AS __tx"
        ),
        F.expr(
            "CAST(SUM(CASE WHEN sy = 0 THEN 1 ELSE 0 END)"
            " AS BIGINT) AS __ty"
        ),
    )
    return (
        npts.join(stats, list(partition_cols), "left")
        .selectExpr(
            *partition_cols,
            "n_points",
            "CAST(coalesce(n_pairs, 0) AS BIGINT) AS n_pairs",
            "CAST(coalesce(concordant, 0) AS BIGINT) AS concordant",
            "CAST(coalesce(discordant, 0) AS BIGINT) AS discordant",
            "CASE WHEN coalesce(n_pairs, 0) - coalesce(__tx, 0) > 0"
            " AND coalesce(n_pairs, 0) - coalesce(__ty, 0) > 0 THEN"
            " round((concordant - discordant)"
            " / sqrt(CAST(n_pairs - __tx AS DOUBLE)"
            " * CAST(n_pairs - __ty AS DOUBLE)), 6) + 0.0D"
            " END AS tau_b",
        )
    )


def seasonal_decompose_exprs(
    value_col: str,
    part_cols: str,
    order_cols: str,
    period: int = 7,
) -> tuple[str, str, str]:
    """Shared SQL text for classical additive seasonal decomposition
    (the three-layer macd_signal_exprs discipline): returns the
    ``(idx_and_quantized, trend, detrended)`` layer expressions both
    engines consume VERBATIM so every intermediate is the same IEEE
    double.

    value = trend + seasonal + residual, with
    - trend: centered moving average of width ``period`` (odd), NULL
      where the window is incomplete (the classical edge rule);
    - seasonal: per-phase (idx mod period) mean of the detrended
      series, centered to sum ~0 across phases;
    - residual: the rest.

    Exactness: the value micro-quantizes scan-side and the sliding
    trend sum accumulates as DECIMAL — sliding-window float
    aggregation is the one place engines legally disagree (Spark
    rescans the frame, DuckDB slides a segment tree), and integer
    frame sums are decomposition-invariant. Phase means quantize the
    detrended value the same way before their hash aggregate.
    """
    h = period // 2
    over = f"(PARTITION BY {part_cols} ORDER BY {order_cols})"
    frame = (
        f"(PARTITION BY {part_cols} ORDER BY {order_cols}"
        f" ROWS BETWEEN {h} PRECEDING AND {h} FOLLOWING)"
    )
    quant = (
        f"CAST(floor({value_col} * 1e6 + 0.5) AS DECIMAL(18,0))"
    )
    idx = f"row_number() OVER {over} - 1"
    trend = (
        f"CASE WHEN count(*) OVER {frame} = {period}"
        f" THEN (CAST(SUM(vq) OVER {frame} AS DOUBLE) / 1e6)"
        f"      / CAST({period} AS DOUBLE)"
        " END"
    )
    return quant, idx, trend


def seasonal_decompose(
    df: DataFrame,
    value_col: str,
    part_cols: tuple[str, ...],
    order_cols: tuple[str, ...],
    period: int = 7,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Classical additive decomposition per series — see
    :func:`seasonal_decompose_exprs` for the shared-text exactness
    contract. Plan: one partitioned window sort feeds the index, the
    centered-MA frame and the full-series phase aggregate keys; the
    phase means are a (series × period)-bounded hash aggregate
    broadcast-joined back; the phase-mean centering is a
    period-bounded window over that tiny relation. No global sort,
    no UDF.

    Output: part/order/keep cols, value, trend, seasonal, resid
    (trend/resid NULL at the ``period//2`` series edges).
    """
    if period % 2 != 1 or period < 3:
        raise ValueError(f"period must be odd and >= 3, got {period}")
    pc = ", ".join(part_cols)
    oc = ", ".join(order_cols)
    quant, idx, trend = seasonal_decompose_exprs(
        value_col, pc, oc, period
    )
    base = df.filter(f"{value_col} IS NOT NULL").selectExpr(
        *part_cols,
        *order_cols,
        *keep_cols,
        f"{value_col} AS __v",
        f"{quant} AS vq",
    )
    with_trend = base.selectExpr(
        "*",
        f"CAST(({idx}) % {period} AS INT) AS __phase",
        f"{trend} AS __trend",
    ).selectExpr(
        "*",
        "CAST(vq AS DOUBLE) / 1e6 - __trend AS __detr",
    )
    from pyspark import StorageLevel

    with_trend = with_trend.transform(cached)
    phase = (
        with_trend.filter("__detr IS NOT NULL")
        .selectExpr(
            *part_cols,
            "__phase",
            "CAST(floor(__detr * 1e6 + 0.5) AS DECIMAL(18,0)) AS dq",
        )
        .groupBy(*part_cols, "__phase")
        .agg(
            F.expr(
                "CAST(SUM(dq) AS DOUBLE) / count(*) / 1e6 AS __s_raw"
            )
        )
    )
    # center the p seasonal values per series (tiny relation)
    wp = f"(PARTITION BY {pc})"
    phase_c = phase.selectExpr(
        *part_cols,
        "__phase",
        "round(__s_raw"
        " - CAST(SUM(CAST(floor(__s_raw * 1e6 + 0.5) AS DECIMAL(18,0)))"
        f"   OVER {wp} AS DOUBLE)"
        f"   / (count(*) OVER {wp}) / 1e6, 6) AS seasonal",
    )
    return (
        with_trend.join(F.broadcast(phase_c), [*part_cols, "__phase"])
        .selectExpr(
            *part_cols,
            *order_cols,
            *keep_cols,
            "CAST(vq AS DOUBLE) / 1e6 AS value_q",
            "round(__trend, 6) AS trend",
            "seasonal",
            "round(CAST(vq AS DOUBLE) / 1e6 - __trend - seasonal, 6)"
            " AS resid",
        )
    )


def macd_signal_exprs(
    value_col: str,
    over_sql: str,
    fast: int = 12,
    slow: int = 26,
    signal: int = 9,
    k: int = 32,
    k_signal: int = 16,
) -> tuple[str, str, str, str]:
    """Shared SQL text for MACD + signal line + histogram + crossover
    — each layer reuses :func:`ewma_exprs`' truncated-horizon EWMA
    (the serial EMA recurrence's distributable form, same
    re-normalized weights): α_fast = 2/(fast+1), α_slow = 2/(slow+1),
    α_sig = 2/(signal+1). The signal line is an EWMA OF the macd
    column, so consumers project layer by layer (nested window
    expressions are illegal in both engines). Returns
    ``(macd, signal_line, histogram, crossover)`` layer texts.
    """
    ema_f = ewma_exprs(value_col, over_sql, alpha=2.0 / (fast + 1), k=k)
    ema_s = ewma_exprs(value_col, over_sql, alpha=2.0 / (slow + 1), k=k)
    macd = (
        f"round(({ema_f}) - ({ema_s}), 6) + CAST(0 AS DOUBLE)"
    )
    sig = ewma_exprs("macd", over_sql, alpha=2.0 / (signal + 1), k=k_signal)
    hist = "round(macd - signal_line, 6) + CAST(0 AS DOUBLE)"
    cross = (
        f"CASE WHEN histogram > 0 AND lag(histogram) OVER {over_sql} <= 0"
        " THEN 1"
        f" WHEN histogram < 0 AND lag(histogram) OVER {over_sql} >= 0"
        " THEN -1 ELSE 0 END"
    )
    return macd, sig, hist, cross


def macd_signal(
    df: DataFrame,
    value_col: str,
    part_cols: tuple[str, ...],
    order_cols: tuple[str, ...],
    fast: int = 12,
    slow: int = 26,
    signal: int = 9,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """MACD(fast, slow) + signal(signal) + histogram + crossover flag
    per series (Appel's moving-average-convergence-divergence — the
    trend-following complement to the bollinger/rsi indicator
    family). See :func:`macd_signal_exprs` for the shared-text layer
    contract; all three EWMA horizons ride the SAME partitioned
    window sort, so the whole indicator is one exchange + one sort
    regardless of series count.

    Output: part/order/keep cols, value, macd, signal_line,
    histogram, crossover (+1 bullish zero-cross, −1 bearish, 0).
    """
    pc = ", ".join(part_cols)
    oc = ", ".join(order_cols)
    over = f"(PARTITION BY {pc} ORDER BY {oc})"
    macd, sig, hist, cross = macd_signal_exprs(
        value_col, over, fast=fast, slow=slow, signal=signal
    )
    l1 = df.filter(f"{value_col} IS NOT NULL").selectExpr(
        *part_cols,
        *order_cols,
        *keep_cols,
        f"{value_col} AS value",
        f"{macd} AS macd",
    )
    l2 = l1.selectExpr("*", f"{sig} AS signal_line")
    return l2.selectExpr(
        "*",
        f"{hist} AS histogram",
    ).selectExpr(
        "*",
        f"{cross} AS crossover",
    )
