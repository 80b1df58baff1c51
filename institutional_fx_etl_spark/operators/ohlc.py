"""Tumbling time-window OHLC aggregation (SURVEY.md §2.5, A1–A4).

The reference resamples ticks to 1-minute candles per 50M-row chunk and
re-merges chunk-boundary minutes with a second groupby
(``/root/reference/src/hybrid_merger.py:100-133``). In Spark this whole
two-level dance is ONE declarative aggregation: a ``groupBy(window(...))``
compiles to a partial (map-side) + final hash aggregate around a single
shuffle on the minute key — the hand-rolled chunk merge (and its
mean-of-means spread bug, trap T5) disappears.

Determinism (trap T4): pandas ``.ohlc()`` takes first/last *by time*;
Spark's ``first()``/``last()`` aggregates are shuffle-order-
nondeterministic. We use ``min_by``/``max_by`` with a composite
``(timestamp, value)`` ordering key so ties on identical timestamps
break deterministically (the reference itself is nondeterministic there;
we must be stricter to hash-match any oracle — SURVEY.md §7.4-2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from institutional_fx_etl_spark.functions.identifiers import bq


def ticks_to_candles(
    ticks: DataFrame,
    ts_col: str = "datetime",
    ask_col: str = "ask",
    bid_col: str = "bid",
    window_duration: str = "1 minute",
    partition_cols: tuple[str, ...] = (),
) -> DataFrame:
    """A1–A3 — ticks → OHLC candles on a left-closed, left-labeled
    tumbling window.

    Per minute bucket: open/close = mid of the earliest/latest tick
    (deterministic tiebreak on value), high/low = max/min mid,
    volume = count of ask updates (the reference's "volume
    reconstruction", README.md:69-73), spread = mean(ask − bid).

    Output: ``partition_cols + [datetime, open, high, low, close,
    volume, spread]`` where ``datetime`` is the window start (Spark
    windows are left-closed; ``window.start`` equals pandas' left
    label).
    """
    # SQL-string expressions parsed JVM-side (one py4j call per string)
    # instead of Column trees — a measured ~10× construction-cost
    # difference that matters because every pipeline-family query
    # builds this subtree (semantics unchanged, oracle-hash-checked);
    # caller-supplied names are backtick-quoted (bq) so names needing
    # escaping parse as identifiers, as the Column API did
    ts, ask, bid = bq(ts_col), bq(ask_col), bq(bid_col)
    enriched = ticks.selectExpr(
        *[bq(c) for c in partition_cols],
        f"{ts} AS __ts",
        f"{ask} AS __ask",
        f"({ask} + {bid}) / 2 AS __mid",
        f"{ask} - {bid} AS __spread",
    )

    # pandas resample().ohlc() skips NaN mids (a null-ask/bid tick that
    # survived the null-safe bad-tick filter, trap T1, contributes volume
    # but no price). min_by/max_by skip rows whose ordering key is NULL,
    # so null out the key when mid is null.
    tiebreak = "CASE WHEN __mid IS NOT NULL THEN struct(__ts, __mid) END"
    agg = enriched.groupBy(
        *partition_cols, F.window("__ts", window_duration).alias("__w")
    ).agg(
        F.expr(f"min_by(__mid, {tiebreak})").alias("open"),
        F.expr("max(__mid)").alias("high"),
        F.expr("min(__mid)").alias("low"),
        F.expr(f"max_by(__mid, {tiebreak})").alias("close"),
        F.expr("count(__ask)").alias("__n"),
        F.expr("avg(__spread)").alias("spread"),
    )
    return agg.selectExpr(
        *[bq(c) for c in partition_cols],
        f"__w.start AS {bq(ts_col)}",
        "open",
        "high",
        "low",
        "close",
        "CAST(__n AS DOUBLE) AS volume",
        "spread",
    ).filter("close IS NOT NULL")


def resample_candles(
    candles: DataFrame,
    ts_col: str = "datetime",
    window_duration: str = "4 hours",
    partition_cols: tuple[str, ...] = (),
) -> DataFrame:
    """A4 at candle grain — hierarchical OHLC rollup (1-minute candles
    → coarser bars) without touching ticks: the hypertable-rollup /
    continuous-aggregate pattern. OHLC partials are mergeable — open
    rides ``min_by`` on the sub-candle timestamp, close ``max_by``,
    high/low fold with max/min, volume adds — so a coarse bar over
    stored fine candles equals the bar computed from raw ticks (modulo
    tick-level spread weighting, which needs the sum/count partials
    ``plans/incremental.py`` keeps). Same partial+final single-shuffle
    plan shape as :func:`ticks_to_candles`; at 100 TB this re-agg
    reads the (3 orders of magnitude smaller) candle store, never the
    tick corpus."""
    ts = bq(ts_col)
    agg = candles.groupBy(
        *partition_cols, F.window(ts_col, window_duration).alias("__w")
    ).agg(
        F.expr(f"min_by(open, {ts})").alias("open"),
        F.expr("max(high)").alias("high"),
        F.expr("min(low)").alias("low"),
        F.expr(f"max_by(close, {ts})").alias("close"),
        F.expr("sum(volume)").alias("volume"),
    )
    return agg.selectExpr(
        *[bq(c) for c in partition_cols],
        f"__w.start AS {ts}",
        "open",
        "high",
        "low",
        "close",
        "volume",
    )
