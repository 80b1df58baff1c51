"""Driver-contract queries: one oracle-checked query per operator family
(SURVEY.md §7.5 maps each key to the §2 inventory).

Every entry is a pair: a Spark callable ``(spark, sf_dir) -> DataFrame``
built from the engine's operators, and an ANSI-SQL oracle string DuckDB
runs over the same parquet tables. The driver compares row count, schema
and an order-insensitive value hash, so each pair:

- aliases every computed column identically on both sides;
- is **deterministic**: ordered aggregates get explicit total-order
  tiebreaks (``min_by/max_by`` on composite keys ↔ ``first(... ORDER
  BY ...)``), top-k queries a total order;
- controls floating point: money/quantity sums go through the
  **decimal-sum trick** (cast to DECIMAL, sum exactly, cast back to
  double — bit-identical in both engines, no summation-order drift);
  small-group averages and interpolated percentiles are rounded to 6
  decimals on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from institutional_fx_etl_spark.functions.localrel import local_rows_df
from pyspark.sql import functions as F

from institutional_fx_etl_spark.functions.cachereg import cached
from institutional_fx_etl_spark.functions.chunked import epoch_seconds
from institutional_fx_etl_spark.functions.merge import combine_first
from institutional_fx_etl_spark.functions.nullsafe import drop_where, is_true
from institutional_fx_etl_spark.functions.timeutils import fx_offsession_mask, time_spine
from institutional_fx_etl_spark.functions.windows import (
    ffill,
    pct_change,
    rolling_median_centered,
)
from institutional_fx_etl_spark.operators.ohlc import ticks_to_candles
from institutional_fx_etl_spark.sources.readers import load_table


def _stream_shuffle_partitions(spark: SparkSession) -> int | None:
    """Shuffle-partition count for STREAMING queries, or None for "keep
    the session setting". A stateful micro-batch instantiates one state
    store per shuffle partition, and each store pays a fixed
    open/commit/checkpoint cost per batch — so the store count should
    track STATE SIZE, not core count: the contract streams here carry
    10^2-10^4 keys of state, where 32 stores are pure fixed cost
    (measured: 7-query family 9.7 s -> 7.1 s at 8). Production streams
    with real state size the knob via $SPARK_GRAFT_STREAM_SHUFFLE (any
    int; 0 keeps the session setting). The override only ever LOWERS
    the session setting — a local[4] driver run stays at 4.
    """
    import os

    raw = os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE")
    try:
        cur = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        return None
    if raw is not None:
        try:
            n = int(raw)
        except ValueError:
            return None
        return min(n, cur) if n > 0 else None
    return min(8, cur)


def _start_stream(spark: SparkSession, writer):
    """Start a streaming writer under the stream shuffle-partition
    override (the conf is snapshotted into the stream's own session
    clone at ``start()``, so the session value is restored immediately
    after and batch plans built later are unaffected)."""
    n = _stream_shuffle_partitions(spark)
    if n is None:
        return writer.start()
    cur = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        return writer.start()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", cur)



def _stream_tmpdir(prefix: str) -> str:
    """Fresh scratch dir for a streaming query's checkpoint/source
    files (one per invocation — never reused across runs, so nothing
    is cached between bench passes). Placement is a pure harness
    knob: checkpoint METADATA fsyncs dominated the micro-batch wall on
    the bench box (9-query streaming family 14.1 s -> 12.4 s measured
    with tmpfs), so prefer $SPARK_GRAFT_STREAM_TMPDIR, then /dev/shm
    when present, then the system default — a cluster run can point
    this at fast local disk (or durable storage for real jobs).
    """
    import os
    import tempfile

    base = os.environ.get("SPARK_GRAFT_STREAM_TMPDIR")
    if base is None and os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        base = "/dev/shm"
    return tempfile.mkdtemp(prefix=prefix, dir=base)


QuerySpec = tuple[Callable[[SparkSession, str], DataFrame], str | None]


def _auto_cells(n: int, target_cell: int = 512) -> int:
    """Corpus-sized nearest-centroid cell count for the cell-blocked
    similarity queries (semdedup / knn_join / embedding_near_dup):
    cells of ~``target_cell`` vectors keep the in-cell pairwise
    compare at n·target_cell total pairs — LINEAR in the corpus —
    instead of the quadratic blowup a fixed cell count hits as n
    grows (round-6 bench: 8 cells at 50k vectors made knn_join 8.8 s;
    ~100 right-sized cells cut the candidate set 12x). Mirrored in
    the oracles as a scalar-subquery bound; past
    MAX_LITERAL_CENTROIDS the assignment automatically switches to
    the broadcast-join regime."""
    import math

    return max(8, math.ceil(n / target_cell))

#: registry: name -> (spark_fn, oracle_sql or None for rows-only checks)
REGISTRY: dict[str, QuerySpec] = {}

#: session confs the engine's semantics require (UTC timestamps like
#: the reference's `utc=True` parsing; NULL-on-div-by-zero like the
#: DuckDB oracle). get_spark() sets these at build time; when a query
#: runs under a FOREIGN session (the test driver's), pin them at
#: runtime — both are runtime-settable SQL confs.
_REQUIRED_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.ansi.enabled": "false",
}


def _pin_session_confs(spark: SparkSession) -> None:
    for k, v in _REQUIRED_CONFS.items():
        if str(spark.conf.get(k, None)).lower() != v.lower():
            spark.conf.set(k, v)


def register(name: str, oracle: str | None):
    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            _pin_session_confs(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        if name in REGISTRY:
            raise ValueError(
                f"duplicate contract query name: {name!r}"
            )
        REGISTRY[name] = (wrapped, oracle)
        return wrapped

    return deco


# ---------------------------------------------------------------------
# S/P family — scans, projections, casts (SURVEY.md §2.1-2.2)
# ---------------------------------------------------------------------


@register(
    "scan_project",
    """
    SELECT o_orderkey AS order_id,
           o_orderstatus AS status,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           o_totalprice * 1.1 AS total_with_tax
    FROM orders
    """,
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P3/P7: projection + rename + computed column + cast on a scan.
    Catalyst prunes the parquet scan to the four referenced columns."""
    return load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderstatus").alias("status"),
        F.year("o_orderdate").cast("int").alias("order_year"),
        (F.col("o_totalprice") * F.lit(1.1)).alias("total_with_tax"),
    )


@register(
    "filter_nullsafe",
    """
    WITH t AS (
      SELECT event_id,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      FROM events
    )
    SELECT event_id, v FROM t WHERE NOT coalesce(v < 100.0, false)
    """,
)
def q_filter_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/T1: null-safe negated filter — NULL-valued rows must survive,
    reproducing pandas ``NaN < x == False`` drop semantics."""
    events = load_table(spark, sf_dir, "events")
    t = events.select(
        "event_id",
        F.when(F.col("event_type") == "error", F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("v"),
    )
    return drop_where(t, F.col("v") < 100.0)


@register(
    "weekday_filter",
    """
    SELECT event_id, ts FROM events
    WHERE NOT (dayofweek(ts) = 6
               OR (dayofweek(ts) = 5 AND hour(ts) >= 22)
               OR (dayofweek(ts) = 0 AND hour(ts) < 21))
    """,
)
def q_weekday_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2/T2: FX off-session filter — pandas Mon=0 convention translated
    to Spark's Sun=1 (and DuckDB's Sun=0) dayofweek codes."""
    events = load_table(spark, sf_dir, "events")
    return events.filter(~fx_offsession_mask(F.col("ts"))).select("event_id", "ts")


# ---------------------------------------------------------------------
# A family — aggregations (SURVEY.md §2.5)
# ---------------------------------------------------------------------


@register(
    "tumbling_ohlc",
    """
    WITH t AS (
      SELECT ts, value + 0.01 AS ask, value - 0.01 AS bid FROM events
    ),
    t2 AS (
      SELECT ts, (ask + bid) / 2 AS mid, ask - bid AS spread, ask FROM t
    )
    SELECT date_trunc('hour', ts) AS datetime,
           first(mid ORDER BY ts, mid) AS open,
           max(mid) AS high,
           min(mid) AS low,
           last(mid ORDER BY ts, mid) AS close,
           CAST(count(ask) AS DOUBLE) AS volume,
           round(avg(spread), 6) AS spread
    FROM t2 GROUP BY 1
    """,
)
def q_tumbling_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-A3/T4: tumbling-window OHLC with deterministic
    min_by/max_by open/close — the engine's load-bearing aggregation."""
    events = load_table(spark, sf_dir, "events")
    ticks = events.select(
        F.col("ts").alias("datetime"),
        (F.col("value") + 0.01).alias("ask"),
        (F.col("value") - 0.01).alias("bid"),
    )
    return ticks_to_candles(ticks, window_duration="1 hour").withColumn(
        "spread", F.round("spread", 6)
    )


@register(
    "global_median",
    "SELECT median(l_quantity) AS median_qty FROM lineitem",
)
def q_global_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: exact global median (the reference's spread-median fill).
    Scale knob: percentile_approx at 100 TB (SURVEY.md §7.3)."""
    return load_table(spark, sf_dir, "lineitem").agg(
        F.median("l_quantity").alias("median_qty")
    )


@register(
    "groupby_agg",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
             AS sum_disc_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-family breadth (TPC-H Q1 shape): multi-key hash aggregate with
    exact decimal sums (no fp summation-order drift); one partial+final
    shuffle, fully whole-stage-codegen'd."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_base_price"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------
# J family — joins / merges / alignment (SURVEY.md §2.4)
# ---------------------------------------------------------------------


@register(
    "align_left_join",
    """
    SELECT o_orderkey, o_custkey, c_mktsegment
    FROM orders
    LEFT JOIN (SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 0.0) c
      ON o_custkey = c_custkey
    """,
)
def q_align_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: left alignment join (missing keys → NULL row), broadcastable
    dimension side."""
    orders = load_table(spark, sf_dir, "orders")
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0.0)
        .select("c_custkey", "c_mktsegment")
    )
    return orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey, "left"
    ).select("o_orderkey", "o_custkey", "c_mktsegment")


@register(
    "anti_join",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 150000.0)
    """,
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: anti join — drop keys present in the other relation (the
    consensus rejection shape); right side pre-filtered so both branches
    of the anti-join are exercised."""
    cust = load_table(spark, sf_dir, "customer")
    big_orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 150000.0)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return cust.join(big_orders, on="c_custkey", how="left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "combine_first",
    """
    WITH p AS (
      SELECT date_trunc('hour', ts) AS h,
             max(value) FILTER (event_type = 'click') AS a,
             max(value) FILTER (event_type = 'view') AS b
      FROM events WHERE event_type IN ('click', 'view') GROUP BY 1
    ),
    f AS (
      SELECT date_trunc('hour', ts) AS h,
             max(value) FILTER (event_type = 'purchase') AS a,
             max(value) FILTER (event_type = 'signup') AS b
      FROM events WHERE event_type IN ('purchase', 'signup') GROUP BY 1
    )
    SELECT coalesce(p.h, f.h) AS h,
           coalesce(p.a, f.a) AS a,
           coalesce(p.b, f.b) AS b
    FROM p FULL OUTER JOIN f ON p.h = f.h
    """,
)
def q_combine_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/T8: cell-level coalescing full-outer merge (pandas
    ``combine_first``) — fills missing *cells* of present rows AND adds
    missing rows."""
    events = load_table(spark, sf_dir, "events")

    def slice_agg(t1: str, t2: str) -> DataFrame:
        return (
            events.filter(F.col("event_type").isin(t1, t2))
            .groupBy(F.date_trunc("hour", F.col("ts")).alias("h"))
            .agg(
                F.max(F.when(F.col("event_type") == t1, F.col("value"))).alias("a"),
                F.max(F.when(F.col("event_type") == t2, F.col("value"))).alias("b"),
            )
        )

    p = slice_agg("click", "view")
    f = slice_agg("purchase", "signup")
    return combine_first(p, f, on=["h"])


@register(
    "time_spine",
    """
    WITH m AS (SELECT date_trunc('minute', ts) AS datetime FROM events),
    b AS (SELECT min(datetime) AS t0, max(datetime) AS t1 FROM m),
    spine AS (
      SELECT unnest(generate_series(t0, t1, INTERVAL 1 MINUTE)) AS datetime FROM b
    ),
    c AS (SELECT datetime, count(*) AS n_events FROM m GROUP BY 1)
    SELECT spine.datetime AS datetime, coalesce(c.n_events, 0) AS n_events
    FROM spine LEFT JOIN c ON spine.datetime = c.datetime
    """,
)
def q_time_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: generated gapless minute spine LEFT JOIN observed minutes —
    the Immutable Time Grid shape; absent minutes get n_events=0."""
    events = load_table(spark, sf_dir, "events")
    mins = events.select(F.date_trunc("minute", F.col("ts")).alias("datetime"))
    spine = time_spine(mins, ts_col="datetime", step="1 minute")
    counts = mins.groupBy("datetime").agg(F.count(F.lit(1)).alias("n_events"))
    return spine.join(counts, on="datetime", how="left").select(
        "datetime", F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events")
    )


@register(
    "inner_reconcile",
    """
    WITH a AS (
      SELECT date_trunc('hour', ts) AS h, max(value) AS a_close
      FROM events WHERE event_type = 'click' GROUP BY 1
    ),
    b AS (
      SELECT date_trunc('hour', ts) AS h, max(value) AS b_close
      FROM events WHERE event_type = 'view' GROUP BY 1
    )
    SELECT a.h AS h, a_close, b_close, abs(a_close - b_close) AS deviation
    FROM a JOIN b ON a.h = b.h
    WHERE coalesce(abs(a_close - b_close) > 50.0, false)
    """,
)
def q_inner_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 + P5 + F7 (the validator's reconciliation query): inner-align
    two series on time, flag deviations above a threshold."""
    events = load_table(spark, sf_dir, "events")

    def hourly_max(t: str, alias: str) -> DataFrame:
        return (
            events.filter(F.col("event_type") == t)
            .groupBy(F.date_trunc("hour", F.col("ts")).alias("h"))
            .agg(F.max("value").alias(alias))
        )

    a = hourly_max("click", "a_close")
    b = hourly_max("view", "b_close")
    joined = a.join(b, on="h", how="inner")
    dev = F.abs(F.col("a_close") - F.col("b_close"))
    return joined.withColumn("deviation", dev).filter(
        is_true(F.col("deviation") > 50.0)
    )


# ---------------------------------------------------------------------
# W family — ordered-row window functions (SURVEY.md §2.6)
# ---------------------------------------------------------------------


@register(
    "lag_pct_change",
    """
    SELECT user_id, event_id,
           (value - lag(value) OVER w) / lag(value) OVER w AS pct
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_lag_pct_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/T3: lag-based pct_change per user (partitioned scale path);
    first row of each partition NULL."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "user_id",
        "event_id",
        pct_change("value", order_cols=("ts", "event_id"), partition_cols=("user_id",)).alias(
            "pct"
        ),
    )


@register(
    "ffill",
    """
    SELECT event_id,
           last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
             OVER (ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
    FROM events
    """,
)
def q_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2/T7: forward-fill with leading NULLs preserved."""
    events = load_table(spark, sf_dir, "events")
    v = F.when(F.col("event_type") == "click", F.col("value"))
    return events.select(
        "event_id",
        ffill(v, order_cols=("ts", "event_id")).alias("filled"),
    )


@register(
    "rolling_median_centered",
    """
    SELECT event_id,
           round(quantile_cont(value, 0.5) OVER
             (ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING), 6)
             AS med
    FROM events
    """,
)
def q_rolling_median_centered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: centered 5-row exact rolling median (pandas
    ``rolling(5, center=True, min_periods=1).median()``), edge-shrinking."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.round(
            rolling_median_centered("value", order_cols=("ts", "event_id")), 6
        ).alias("med"),
    )


# ---------------------------------------------------------------------
# P6/F5 + O family — conditional fix, union, top-k (SURVEY.md §2.2/2.7)
# ---------------------------------------------------------------------


@register(
    "greatest_least_fix",
    """
    WITH c AS (
      SELECT date_trunc('hour', ts) AS h,
             first(value ORDER BY ts, event_id) AS open,
             last(value ORDER BY ts, event_id) AS close,
             max(value) * 0.5 AS high,
             min(value) * 1.5 AS low
      FROM events GROUP BY 1
    )
    SELECT h, open, close, high, low,
           greatest(open, close, high) AS fixed_high,
           least(open, close, low) AS fixed_low,
           CAST(coalesce(open > high OR open < low OR close > high OR close < low,
                         false) AS INTEGER) AS was_bad
    FROM c
    """,
)
def q_greatest_least_fix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6/F5: row-wise greatest/least structural repair of candles whose
    open/close escaped [low, high] (violations synthesized by scaling)."""
    events = load_table(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    c = events.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.min_by("value", key).alias("open"),
        F.max_by("value", key).alias("close"),
        (F.max("value") * 0.5).alias("high"),
        (F.min("value") * 1.5).alias("low"),
    )
    bad = is_true(
        (F.col("open") > F.col("high"))
        | (F.col("open") < F.col("low"))
        | (F.col("close") > F.col("high"))
        | (F.col("close") < F.col("low"))
    )
    return c.select(
        "h",
        "open",
        "close",
        "high",
        "low",
        F.greatest("open", "close", "high").alias("fixed_high"),
        F.least("open", "close", "low").alias("fixed_low"),
        bad.cast("int").alias("was_bad"),
    )


@register(
    "audit_union",
    """
    SELECT event_id, ts, value, 'extreme_value' AS reason
    FROM events WHERE value > 400.0
    UNION ALL
    SELECT event_id, ts, value, 'error_event' AS reason
    FROM events WHERE event_type = 'error'
    """,
)
def q_audit_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2/S4: the forensic-audit shape — union of reason-tagged anomaly
    subsets (a row can appear under several tags, as in the reference)."""
    events = load_table(spark, sf_dir, "events")
    extreme = events.filter(F.col("value") > 400.0).select(
        "event_id", "ts", "value", F.lit("extreme_value").alias("reason")
    )
    errors = events.filter(F.col("event_type") == "error").select(
        "event_id", "ts", "value", F.lit("error_event").alias("reason")
    )
    return extreme.unionByName(errors)


@register(
    "topk",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 5
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: top-k with a deterministic total-order tiebreak (the
    validator's top-5 offenders report)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .orderBy(
            F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")
        )
        .limit(5)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


# ---------------------------------------------------------------------
# General OLAP breadth — as-of join, JSON, sessionization, pivot, rollup
# ---------------------------------------------------------------------


@register(
    "asof_join",
    """
    WITH trades AS (
      SELECT event_id, ts, value FROM events WHERE event_type = 'purchase'
    ),
    quotes AS (
      SELECT ts, value AS quote, user_id AS quote_user
      FROM events WHERE event_type = 'view'
    )
    SELECT t.event_id, t.ts, t.value, q.quote AS quote_asof,
           q.quote_user AS quote_user_asof
    FROM trades t ASOF LEFT JOIN quotes q ON t.ts >= q.ts
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (quote-at-trade-time): latest 'view' quote at or
    before each 'purchase' — union+ffill technique vs DuckDB's native
    ASOF JOIN."""
    from institutional_fx_etl_spark.operators.asof import asof_join

    events = load_table(spark, sf_dir, "events")
    trades = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "value"
    )
    quotes = events.filter(F.col("event_type") == "view").select(
        "ts",
        F.col("value").alias("quote"),
        F.col("user_id").alias("quote_user"),
    )
    return asof_join(trades, quotes, ts_col="ts")


@register(
    "json_extract",
    """
    SELECT CAST(json_extract(props, '$.k') AS INTEGER) % 10 AS k_bucket,
           count(*) AS n,
           CAST(sum(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k
    FROM events GROUP BY 1
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured columns: JSON path extraction from the events
    props payload, aggregated — get_json_object stays JVM-side."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        events.select((k % 10).alias("k_bucket"), k.alias("__k"))
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__k").cast("bigint").alias("sum_k"),
        )
    )


@register(
    "sessionize",
    """
    WITH gaps AS (
      SELECT user_id, event_id, ts,
             CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    OR lag(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id,
           CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS session_id
    FROM gaps
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag-gap detection + running sum of session
    starts per user (30-minute inactivity timeout) — the batch twin of
    streaming ``session_window``."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    is_new = F.when(
        prev.isNull()
        # NTZ-tolerant epoch diff: the testdata's ts is TIMESTAMP_NTZ,
        # which cannot cast to numeric directly (cast through TIMESTAMP
        # is legal and a no-op for tz-aware inputs)
        | (
            F.col("ts").cast("timestamp").cast("long")
            - prev.cast("timestamp").cast("long")
            > 30 * 60
        ),
        1,
    ).otherwise(0)
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.select(
        "user_id",
        "event_id",
        F.sum(is_new).over(cum).cast("bigint").alias("session_id"),
    )


@register(
    "rolling_stats",
    """
    SELECT event_id,
           round(avg(value) OVER w, 6) AS ma7,
           min(value) OVER w AS min7,
           max(value) OVER w AS max7,
           CAST(count(*) OVER w AS BIGINT) AS n7
    FROM events
    WINDOW w AS (ORDER BY ts, event_id ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    """,
)
def q_rolling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centered rolling aggregates (moving average / extrema / count
    over a ±3 row frame) — the smoothing family beyond the exact
    rolling median."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = (
        Window.orderBy("ts", "event_id").rowsBetween(-3, 3)
    )
    return events.select(
        "event_id",
        F.round(F.avg("value").over(w), 6).alias("ma7"),
        F.min("value").over(w).alias("min7"),
        F.max("value").over(w).alias("max7"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n7"),
    )


@register(
    "value_histogram",
    """
    WITH b AS (
      SELECT CAST(floor(value / 50.0) AS INTEGER) AS bucket FROM events
    )
    SELECT bucket, CAST(bucket * 50.0 AS DOUBLE) AS bucket_low,
           count(*) AS n
    FROM b GROUP BY bucket
    """,
)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (floor-bucketing — portable alternative to
    width_bucket): the profiling aggregation every ingest pipeline runs."""
    events = load_table(spark, sf_dir, "events")
    bucket = F.floor(F.col("value") / 50.0).cast("int")
    return (
        events.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("bucket", (F.col("bucket") * 50.0).alias("bucket_low"), "n")
    )


@register(
    "array_agg_functions",
    """
    SELECT user_id,
           array_to_string(list_sort(list(event_type)), ',') AS all_types,
           CAST(len(list_distinct(list(event_type))) AS INTEGER) AS n_distinct_types,
           array_to_string(list_sort(list_distinct(list(event_type)))[1:2], ',')
             AS first_two_types,
           CAST(list_contains(list(event_type), 'error') AS INTEGER) AS had_error
    FROM events GROUP BY user_id
    """,
)
def q_array_agg_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation surface: collect → sort (collect_list alone is
    shuffle-order-nondeterministic; sorting restores determinism),
    distinct, slicing, membership. Arrays serialize to joined strings
    in the output — array-typed result columns hash unstably across
    engines."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.array_join(F.sort_array(F.collect_list("event_type")), ",").alias(
            "all_types"
        ),
        F.size(F.array_distinct(F.collect_list("event_type")))
        .cast("int")
        .alias("n_distinct_types"),
        F.array_join(
            F.slice(
                F.sort_array(F.array_distinct(F.collect_list("event_type"))), 1, 2
            ),
            ",",
        ).alias("first_two_types"),
        F.array_contains(F.collect_list("event_type"), "error")
        .cast("int")
        .alias("had_error"),
    )


@register(
    "datetime_functions",
    """
    SELECT event_id,
           CAST(year(ts) AS INTEGER) AS y,
           CAST(month(ts) AS INTEGER) AS mo,
           CAST(dayofmonth(ts) AS INTEGER) AS d,
           CAST(hour(ts) AS INTEGER) AS h,
           CAST(minute(ts) AS INTEGER) AS mi,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
           date_trunc('hour', ts) AS hour_start,
           CAST(date_diff('minute', TIMESTAMP '2024-01-01 00:00:00', ts)
                AS BIGINT) AS minutes_since_epoch0
    FROM events
    """,
)
def q_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar surface: extraction, truncation, differences."""
    events = load_table(spark, sf_dir, "events")
    epoch0 = F.lit("2024-01-01 00:00:00").cast("timestamp")
    return events.select(
        "event_id",
        F.year("ts").cast("int").alias("y"),
        F.month("ts").cast("int").alias("mo"),
        F.dayofmonth("ts").cast("int").alias("d"),
        F.hour("ts").cast("int").alias("h"),
        F.minute("ts").cast("int").alias("mi"),
        F.date_trunc("day", F.col("ts")).alias("day_start"),
        F.date_trunc("hour", F.col("ts")).alias("hour_start"),
        ((F.unix_timestamp("ts") - F.unix_timestamp(epoch0)) / 60)
        .cast("bigint")
        .alias("minutes_since_epoch0"),
    )


@register(
    "string_functions",
    """
    SELECT doc_id,
           upper(substring(text, 1, 10)) AS head_upper,
           CAST(length(text) AS INTEGER) AS len,
           regexp_extract(text, '([a-z]+)', 1) AS first_word,
           replace(substring(text, 1, 20), ' ', '_') AS head_snake,
           CAST(strpos(text, 'data') AS INTEGER) AS data_pos,
           lpad(CAST(doc_id AS VARCHAR), 6, '0') AS padded_id,
           concat_ws('|', lang, source) AS lang_source
    FROM documents
    """,
)
def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar surface: case, slicing, regex extraction, padding,
    search, concat."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.upper(F.substring("text", 1, 10)).alias("head_upper"),
        F.length("text").cast("int").alias("len"),
        F.regexp_extract("text", "([a-z]+)", 1).alias("first_word"),
        F.replace(
            F.substring("text", 1, 20), F.lit(" "), F.lit("_")
        ).alias("head_snake"),
        F.instr(F.col("text"), "data").cast("int").alias("data_pos"),
        F.lpad(F.col("doc_id").cast("string"), 6, "0").alias("padded_id"),
        F.concat_ws("|", "lang", "source").alias("lang_source"),
    )


@register(
    "stats_agg",
    """
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
           round(stddev_samp(l_discount), 6) AS sd_discount,
           round(var_samp(l_tax), 6) AS var_tax
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (corr / covariance / stddev / variance)
    per group — both engines use single-pass co-moment updates; rounding
    absorbs the residual fp drift."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "covar_qty_price"
        ),
        F.round(F.stddev_samp("l_discount"), 6).alias("sd_discount"),
        F.round(F.var_samp("l_tax"), 6).alias("var_tax"),
    )


@register(
    "topk_per_group",
    """
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(rk AS INTEGER) AS rk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders
    ) WHERE rk <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (each customer's 3 largest orders): the window
    row_number pattern — rank computed inside each hash partition, no
    global sort."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


@register(
    "latest_record_dedup",
    """
    SELECT user_id, event_id AS latest_event_id, ts AS latest_ts, value
    FROM (
      SELECT user_id, event_id, ts, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q_latest_record_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style key dedup: keep each key's most recent record
    (row_number = 1 by recency) — the upsert-compaction shape used to
    emulate MERGE INTO without a lakehouse format."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("latest_event_id"),
            F.col("ts").alias("latest_ts"),
            "value",
        )
    )


@register(
    "train_test_split",
    """
    WITH h AS (
      SELECT doc_id, lang,
             CAST(concat('0x', substr(md5(concat('split', doc_id)),1,8)) AS BIGINT)
               % 100 AS bucket
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN bucket < 10 THEN 'test'
                WHEN lang = 'en' AND bucket < 20 THEN 'validation'
                ELSE 'train' END AS split
    FROM h
    """,
)
def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based dataset splitting (the reproducible
    alternative to randomSplit): md5-bucketed 10% test holdout plus a
    stratified extra validation slice for the majority language —
    stable across runs, engines and partitionings."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.expr(
            "cast(conv(substr(md5(concat('split', doc_id)),1,8),16,10) as bigint)"
        )
        % 100
    )
    split = (
        F.when(bucket < 10, F.lit("test"))
        .when((F.col("lang") == "en") & (bucket < 20), F.lit("validation"))
        .otherwise(F.lit("train"))
    )
    return docs.select("doc_id", "lang", split.alias("split"))


@register(
    "stratified_sample",
    """
    SELECT doc_id, lang
    FROM documents
    WHERE CAST(concat('0x', substr(md5(concat('strat', doc_id)),1,8)) AS BIGINT)
            % 100
          < CASE WHEN lang = 'en' THEN 35 ELSE 80 END
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class deterministic downsampling (training-data rebalancing:
    keep 35% of the majority language, 80% of the rest) via md5
    buckets — reproducible across runs, engines and partitionings,
    unlike rand()-based sampleBy."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.expr(
            "cast(conv(substr(md5(concat('strat', doc_id)),1,8),16,10) as bigint)"
        )
        % 100
    )
    rate = F.when(F.col("lang") == "en", F.lit(35)).otherwise(F.lit(80))
    return docs.filter(bucket < rate).select("doc_id", "lang")


@register(
    "unpivot",
    """
    SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
           l_quantity AS value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'extendedprice' AS measure,
           l_extendedprice AS value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount' AS measure,
           l_discount AS value FROM lineitem
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide → long): three measure columns to (measure, value)
    rows via ``stack`` — generated in-place, no shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.selectExpr(
        "l_orderkey",
        "l_linenumber",
        "stack(3, 'quantity', l_quantity,"
        " 'extendedprice', l_extendedprice,"
        " 'discount', l_discount) AS (measure, value)",
    )


@register(
    "cube_agg",
    """
    SELECT l_returnflag, l_linestatus,
           count(*) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cube: all grouping-set combinations with exact decimal sums."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_qty"),
    )


@register(
    "set_ops",
    """
    SELECT 'click_not_purchase' AS cohort, user_id FROM (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
      EXCEPT
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    )
    UNION ALL
    SELECT 'click_and_signup' AS cohort, user_id FROM (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
      INTERSECT
      SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'
    )
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators (EXCEPT / INTERSECT, distinct semantics): cohort
    construction over event types."""
    events = load_table(spark, sf_dir, "events")

    def users(t: str) -> DataFrame:
        return events.filter(F.col("event_type") == t).select("user_id").distinct()

    except_ = users("click").subtract(users("purchase")).select(
        F.lit("click_not_purchase").alias("cohort"), "user_id"
    )
    intersect_ = users("click").intersect(users("signup")).select(
        F.lit("click_and_signup").alias("cohort"), "user_id"
    )
    return except_.unionByName(intersect_)


@register(
    "session_window_agg",
    """
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    OR lag(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    tagged AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM gaps
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events
    FROM tagged GROUP BY user_id, sid
    """,
)
def q_session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (native ``session_window``, 30-minute gap):
    per-user sessions with start/end/count — the dynamic-window
    aggregation family the fixed tumbling window can't express.
    Window end = last event + gap (Spark session_window semantics)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.session_window("ts", "30 minutes").alias("__w"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("__w.start").alias("session_start"),
            F.col("__w.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "pivot_agg",
    """
    SELECT user_id,
           count(*) FILTER (event_type = 'click') AS click,
           count(*) FILTER (event_type = 'view') AS view,
           count(*) FILTER (event_type = 'purchase') AS purchase,
           count(*) FILTER (event_type = 'signup') AS signup,
           count(*) FILTER (event_type = 'error') AS error
    FROM events GROUP BY user_id
    """,
)
def q_pivot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event-type counts as columns (explicit value
    list so the schema is static — required for plan stability at
    scale)."""
    events = load_table(spark, sf_dir, "events")
    out = (
        events.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .count()
    )
    return out.select(
        "user_id",
        *[
            F.coalesce(F.col(c), F.lit(0)).alias(c)
            for c in ["click", "view", "purchase", "signup", "error"]
        ],
    )


@register(
    "rollup_agg",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup totals (GROUPING SETS family) with exact
    decimal sums."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------
# Extension operators — dedup / similarity / text / multimodal
# (BASELINE.json north star; operators/{dedup,similarity,text,multimodal}.py)
# ---------------------------------------------------------------------

#: DuckDB twin of operators.text._token_hash
_DUCK_HASH = "CAST(concat('0x', substr(md5({t}),1,8)) AS BIGINT)"

#: DuckDB twin of operators.text.shingle_hashes_expr (3-gram)
_DUCK_SHINGLES = """
  list_distinct(list_transform(
    list_transform(range(1, greatest(len({toks})-1, 1)),
                   i -> concat_ws(' ', {toks}[i], {toks}[i+1], {toks}[i+2])),
    s -> CAST(concat('0x', substr(md5(s),1,8)) AS BIGINT)))
""".strip()


@register(
    "dedup_exact",
    """
    SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_dups
    FROM documents GROUP BY text
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content, min-id representative."""
    from institutional_fx_etl_spark.operators.dedup import exact_dedup_groups

    return exact_dedup_groups(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_minhash_lsh",
    f"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks FROM documents
    ),
    t2 AS (
      SELECT doc_id, {_DUCK_SHINGLES.format(toks='toks')} AS sh
      FROM t WHERE len(toks) >= 3
    ),
    sigs AS (
      SELECT doc_id, sh,
             list_transform(range(0, 16), i -> list_min(
               list_transform(sh, h -> ((2*i+1)*h + (7*i+3)) % 2147483647))) AS sig
      FROM t2
    ),
    banded AS (
      SELECT doc_id, b.band_idx,
             md5(array_to_string(sig[b.band_idx*4+1 : b.band_idx*4+4], ',')) AS band_sig
      FROM sigs, (SELECT unnest(range(0, 4)) AS band_idx) b
    ),
    capped AS (
      SELECT doc_id, band_idx, band_sig FROM (
        SELECT *, count(*) OVER (PARTITION BY band_idx, band_sig) AS __n
        FROM banded
      ) WHERE __n <= 64
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
      FROM capped a JOIN capped c USING (band_idx, band_sig)
      WHERE a.doc_id < c.doc_id
    )
    SELECT id_a, id_b,
           round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                 / len(list_distinct(list_concat(sa.sh, sb.sh))), 6) AS jaccard
    FROM cand
    JOIN t2 sa ON sa.doc_id = cand.id_a
    JOIN t2 sb ON sb.doc_id = cand.id_b
    WHERE round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                / len(list_distinct(list_concat(sa.sh, sb.sh))), 6) >= 0.2
    """,
)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash (16 perms) + banded LSH (4×4) candidate pairs with exact
    shingle-Jaccard verification."""
    from institutional_fx_etl_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"), jaccard_threshold=0.2
    )


@register(
    "dedup_clusters",
    f"""
    WITH RECURSIVE t AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks FROM documents
    ),
    t2 AS (
      SELECT doc_id, {_DUCK_SHINGLES.format(toks='toks')} AS sh
      FROM t WHERE len(toks) >= 3
    ),
    sigs AS (
      SELECT doc_id, sh,
             list_transform(range(0, 16), i -> list_min(
               list_transform(sh, h -> ((2*i+1)*h + (7*i+3)) % 2147483647))) AS sig
      FROM t2
    ),
    banded AS (
      SELECT doc_id, b.band_idx,
             md5(array_to_string(sig[b.band_idx*4+1 : b.band_idx*4+4], ',')) AS band_sig
      FROM sigs, (SELECT unnest(range(0, 4)) AS band_idx) b
    ),
    capped AS (
      SELECT doc_id, band_idx, band_sig FROM (
        SELECT *, count(*) OVER (PARTITION BY band_idx, band_sig) AS __n
        FROM banded
      ) WHERE __n <= 64
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
      FROM capped a JOIN capped c USING (band_idx, band_sig)
      WHERE a.doc_id < c.doc_id
    ),
    pairs AS (
      SELECT id_a, id_b FROM cand
      JOIN t2 sa ON sa.doc_id = cand.id_a
      JOIN t2 sb ON sb.doc_id = cand.id_b
      WHERE round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                  / len(list_distinct(list_concat(sa.sh, sb.sh))), 6) >= 0.2
    ),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ),
    reach(a, b) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    )
    SELECT a AS doc_id, min(b) AS comp FROM reach GROUP BY a
    """,
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-components dedup clustering: LSH near-dup pairs →
    iterative min-label propagation → canonical representative per
    document (oracle: recursive-CTE transitive closure)."""
    from institutional_fx_etl_spark.operators.dedup import (
        dedup_clusters,
        minhash_lsh_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, jaccard_threshold=0.2)
    return dedup_clusters(docs.select("doc_id"), pairs)


@register(
    "dedup_simhash",
    """
    WITH t AS (
      SELECT doc_id, source,
             list_transform(string_split_regex(lower(text), '\\s+'),
                            tk -> CAST(concat('0x', substr(md5(tk),1,8)) AS BIGINT)) AS ths
      FROM documents
    ),
    fp AS (
      SELECT doc_id, source,
             CAST(list_sum(list_transform(range(0, 32), b ->
               CASE WHEN list_sum(list_transform(ths, h ->
                      CASE WHEN (h >> b) % 2 = 1 THEN 1 ELSE -1 END)) > 0
                    THEN (1::BIGINT << b) ELSE 0::BIGINT END)) AS BIGINT) AS simhash
      FROM t
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM fp a JOIN fp b ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
    """,
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints + blocked Hamming-distance pairs."""
    from institutional_fx_etl_spark.operators.dedup import simhash_near_pairs

    pairs = simhash_near_pairs(
        load_table(spark, sf_dir, "documents"), max_hamming=8, block_col="source"
    )
    return pairs.select("id_a", "id_b", "hamming")


@register(
    "dedup_ngram_jaccard",
    f"""
    WITH t AS (
      SELECT doc_id, source, string_split_regex(lower(text), '\\s+') AS toks
      FROM documents
    ),
    t2 AS (
      SELECT doc_id, source, {_DUCK_SHINGLES.format(toks='toks')} AS sh
      FROM t WHERE len(toks) >= 3
    )
    SELECT a.source AS source, a.doc_id AS id_a, b.doc_id AS id_b,
           round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
    FROM t2 a JOIN t2 b ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                / len(list_distinct(list_concat(a.sh, b.sh))), 6) >= 0.05
    """,
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard within a blocking key (source)."""
    from institutional_fx_etl_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.05
    )


@register(
    "embedding_near_dup",
    """
    WITH v AS (SELECT vec_id AS vid, CAST(embedding AS DOUBLE[]) AS vv
               FROM embeddings),
    cents AS (SELECT vid AS cid, vv AS cv FROM v
              WHERE vid < greatest(8, CAST(ceil(
                (SELECT count(*) FROM v) / 512.0) AS BIGINT))),
    scored AS (
      SELECT v.vid, v.vv, c.cid,
             round(list_dot_product(v.vv, c.cv)
                   / (sqrt(list_dot_product(v.vv, v.vv))
                      * sqrt(list_dot_product(c.cv, c.cv))), 6) AS ccos
      FROM v CROSS JOIN cents c
    ),
    assigned AS (
      SELECT vid, vv, cid FROM (
        SELECT *, row_number() OVER
          (PARTITION BY vid ORDER BY ccos DESC, cid) AS rn
        FROM scored) WHERE rn = 1
    ),
    normed AS (
      SELECT vid, cid,
             list_transform(vv, x -> x / sqrt(list_dot_product(vv, vv)))
               AS vn
      FROM assigned
    )
    SELECT a.vid AS id_a, b.vid AS id_b,
           round(list_dot_product(a.vn, b.vn), 6) AS cosine
    FROM normed a JOIN normed b ON a.cid = b.cid AND a.vid < b.vid
    ORDER BY cosine DESC, id_a, id_b
    LIMIT 20
    """,
)
def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: SemDeDup-cell (nearest-centroid)
    candidate blocking + exact cosine verify, global top-20
    most-similar pairs (round-5 verdict fix: blocking is now
    data-dependent — no id-boundary recall hole)."""
    from institutional_fx_etl_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(
        emb, num_centroids=_auto_cells(emb.count())
    )


@register(
    "ann_topk",
    """
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
    n AS (SELECT vec_id, vv, sqrt(list_dot_product(vv, vv)) AS nv FROM v),
    q AS (SELECT vec_id AS q_id, vv AS qv, nv AS nq FROM n WHERE vec_id < 3),
    s AS (
      SELECT q_id, n.vec_id,
             round(list_dot_product(vv, qv) / (nv * nq), 6) AS cosine
      FROM n CROSS JOIN q
    ),
    r AS (
      SELECT *, CAST(row_number() OVER
               (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS INTEGER) AS rank
      FROM s
    )
    SELECT q_id, vec_id, rank, cosine FROM r WHERE rank <= 10
    """,
)
def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for 3 query vectors — the ANN
    exactness baseline (LSH-bucketed variant: lsh_ann_pairs)."""
    from institutional_fx_etl_spark.operators.similarity import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(emb, emb.filter(F.col("vec_id") < 3), k=10)


@register(
    "ivf_topk",
    """
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
    cents AS (SELECT vec_id AS cid, vv AS cv FROM v WHERE vec_id < 8),
    scored AS (
      SELECT v.vec_id AS vid, v.vv, c.cid,
             round(list_dot_product(v.vv, c.cv)
                   / (sqrt(list_dot_product(v.vv, v.vv))
                      * sqrt(list_dot_product(c.cv, c.cv))), 6) AS ccos
      FROM v CROSS JOIN cents c
    ),
    assigned AS (
      SELECT vid,
             list_transform(vv, x -> x / sqrt(list_dot_product(vv, vv)))
               AS vn,
             cid FROM (
        SELECT *, row_number() OVER
          (PARTITION BY vid ORDER BY ccos DESC, cid) AS rn
        FROM scored) WHERE rn = 1
    ),
    q AS (
      SELECT vid AS q_id,
             list_transform(vv, x -> x / sqrt(list_dot_product(vv, vv)))
               AS qn,
             cid FROM (
        SELECT *, row_number() OVER
          (PARTITION BY vid ORDER BY ccos DESC, cid) AS rn
        FROM scored WHERE vid IN (0, 1, 2)) WHERE rn <= 2
    ),
    s AS (
      SELECT q.q_id, a.vid AS vec_id,
             round(list_dot_product(a.vn, q.qn), 6) AS cosine
      FROM assigned a JOIN q ON a.cid = q.cid
    )
    SELECT q_id, vec_id,
           CAST(row_number() OVER
             (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS INTEGER) AS rank,
           cosine
    FROM s QUALIFY rank <= 5
    """,
)
def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: deterministic coarse centroids bucket the corpus;
    each query probes its 2 nearest cells (nprobe=2) — 2/8 of the
    corpus per query instead of a full scan. k-means-centroid variant
    (`kmeans_centroids`) recall-asserted in tests/test_extensions.py."""
    from institutional_fx_etl_spark.operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(emb, query_ids=[0, 1, 2], k=5, nprobe=2)


#: k-means centroids precomputed ONCE with a fixed seed
#: (operators.similarity.kmeans_centroids, k=8, seed=7, maxIter=20,
#: fitted on testdata sf0.01 embeddings) and frozen as literals so
#: the DuckDB oracle can mirror the exact same quantizer. As IVF
#: cell centers they are a fixed parameter, valid at any sf.
_IVF_KMEANS_CENTROIDS = [
    (0, [-0.002214, -0.013256, 0.015181, -0.047723, 0.038324, 0.003277, -0.065891, -0.066173, -0.001508, -0.030765, -0.037889, -0.065588, -0.044862, 0.008935, -0.049924, -0.008287, 0.059182, 0.009186, 0.044998, 0.066475, -0.00894, -0.029636, -0.034434, -0.023017, -0.076177, -0.044402, 0.038103, -0.028273, 0.060962, 0.008364, 0.003496, -0.095819, -0.06091, -0.00421, 0.069089, -0.065585, 0.012927, 0.001768, 0.032723, 0.025147, -0.033297, 0.014068, 0.009117, 0.007805, 0.014613, 0.000474, -0.042807, -0.024007, 0.023867, 0.026352, -0.000688, -0.07979, 0.039532, -0.010272, 0.053106, -0.012434, -0.026745, 0.014063, 0.018831, 0.019655, -0.049104, -0.019799, -0.008128, -0.018372]),
    (1, [0.017944, 0.045197, -0.013181, -0.008449, -0.041762, -0.002712, -0.082438, -0.073124, -0.015466, -0.017026, -0.038522, 0.009012, -0.039812, 0.035397, -0.011061, -0.015328, 0.032814, 0.008817, 0.042854, -0.023965, -0.013594, 0.011327, 0.028653, 0.033707, 0.070734, -0.029474, -0.02155, -0.008891, -0.030532, -0.001331, -0.012924, 0.076884, -0.035039, -0.039616, -0.012827, -0.053592, 0.011711, -0.037662, -0.040571, -0.077614, 0.016168, 0.029396, 0.02501, 0.000443, 0.029708, 0.037584, -0.012586, -0.049568, -0.025772, -0.015534, 0.013313, 0.045488, -0.018892, 0.026122, -0.004808, 0.002768, 0.022101, 0.031242, 0.015263, 0.047217, 0.035356, 0.035538, 0.044044, -0.01996]),
    (2, [0.016242, 0.029362, -0.015901, 0.030362, -0.029839, 0.00172, -0.035216, 0.017195, -0.013768, -0.059455, 0.013803, -0.032779, -0.028089, -0.02622, -0.026906, -0.020143, -0.063948, -0.01382, -0.005219, 0.006457, 0.00195, 0.022742, 0.002811, 0.060364, 0.016869, 0.022609, 0.002576, 0.018286, 0.018554, 0.047574, -0.04579, -0.024074, -0.011743, -0.028679, 0.034876, 0.002879, -0.026929, -0.010159, 0.008292, 0.06855, 0.038174, -0.007679, 0.097244, 0.000632, -0.07696, 0.023333, 0.02432, -0.026455, 0.010836, 0.052786, 0.065109, -0.019727, 0.0274, -0.031844, -0.04477, 0.009605, 0.046641, -0.026435, -0.072482, 0.00216, 0.041205, -0.020258, 0.036917, 0.035281]),
    (3, [0.072085, 0.063969, 0.038089, 0.186857, 0.026699, 0.009644, -0.071347, 0.032039, -0.115496, -0.018388, 0.186575, -0.064507, -0.036787, -0.348385, -0.024684, -0.011465, 0.053832, 0.13952, 0.01641, -0.301492, 0.262657, -0.019307, -0.048368, -0.105534, -0.071042, -0.021895, 0.023847, 0.016016, 0.10476, -0.126802, -0.037025, -0.015951, 0.20059, 0.057877, 0.048364, 0.009771, 0.034494, 0.212764, -0.00852, -0.039563, -0.014972, 0.096464, -0.013789, -0.314199, -0.269869, 0.1043, -0.153654, 0.031528, -0.173809, -0.110715, -0.02795, 0.028286, -0.092044, 0.031054, 0.002092, 0.03331, -0.176338, 0.024742, 0.074204, 0.198607, 0.158999, 0.031928, -0.242758, 0.11203]),
    (4, [0.00799, -0.040669, -0.033486, -0.005501, 0.036241, 0.021238, -0.018173, 0.001112, -0.003714, 0.052562, 0.053312, 0.024442, 0.043968, -0.021941, 0.071868, -0.065581, -0.013979, -0.019085, 0.045038, 0.031241, 0.03762, -0.014092, -0.029935, -0.009496, 0.015792, 0.045632, -0.0038, -0.001857, -0.019573, 0.027482, -0.040316, 0.004529, 0.072947, -0.010334, -0.000212, -0.028957, 0.019227, 0.02292, -0.015595, -0.017565, -0.008501, -0.048327, -0.091745, -0.031871, -0.007647, -0.004426, -0.007956, -0.01457, 0.018861, -0.061403, 0.011584, -0.037913, 0.017862, -0.025254, -0.075518, 0.008106, 0.041317, 0.050134, 0.079454, -0.015651, 0.071714, 0.074401, -0.061626, -0.046316]),
    (5, [0.000262, 0.004498, -0.024732, -0.039588, 0.044045, 0.024192, 0.010989, 0.018007, 0.014923, -0.050622, 0.000197, 0.019576, 0.012264, 0.047522, -0.00774, 0.070105, 0.00046, 0.052831, -0.024825, -0.028679, 0.018123, -0.010046, 0.02933, -0.059237, -0.02198, 0.017051, 0.005828, -0.008199, -0.006337, -0.011086, -0.000498, -4e-06, 0.01246, 0.004089, -0.033339, 0.048567, -0.003057, 0.046707, 0.046247, 0.004262, -0.010716, -0.024331, 0.004839, -0.023961, -0.015051, -0.002194, 0.033475, -0.001963, 0.018322, -0.044756, -0.035913, 0.007641, -0.03405, -0.002212, 0.014795, -0.020755, -0.012183, -0.003057, -0.013932, -0.054542, -0.023356, -0.016379, 0.020538, 0.018571]),
    (6, [-0.007714, -0.02093, 0.060409, 0.023516, 0.008407, -0.019349, 0.016938, 0.066301, -0.018486, 0.062444, 0.014388, 0.012132, 0.007541, -0.009633, 0.000184, 0.004502, -0.006144, -0.029928, -0.043856, 0.024747, -0.020786, 0.003353, -0.008836, -0.008448, -0.009134, 0.023553, -0.01266, 0.047439, -0.008949, -0.005421, 0.053987, -0.025837, 0.026859, 0.025016, 0.000954, 0.018496, -0.001198, -0.042187, -0.031239, -0.00186, -0.007217, -0.006523, -0.018127, 0.02455, -0.004973, -0.021294, -0.018214, 0.037419, -0.031294, 0.001138, 0.019501, 0.022095, 0.007305, 0.018819, 0.04102, -0.001304, -0.004492, -0.037173, -0.036708, 0.001026, -0.013302, -0.001418, -0.015319, -0.053314]),
    (7, [-0.01114, -0.041829, -0.009716, -0.008877, -0.02053, 0.070962, -0.05134, -0.010744, 0.050269, -0.002485, 0.027033, 0.027248, -0.009001, -0.060991, 0.029298, 0.027273, 0.080216, 0.058077, 0.04788, -0.088739, -0.076919, 0.056782, 0.045721, -0.008235, 0.005682, 0.026792, -0.005612, 0.018106, 0.007179, -0.076204, 0.044176, 0.049775, 0.002298, -0.070149, 0.047994, 0.004259, -0.085087, 0.021339, -0.006331, -0.021485, -0.000394, -0.040675, -0.010986, 0.026476, -0.007125, 0.046369, 0.003273, 0.131964, -0.02836, -0.004247, 0.019814, -0.003903, 0.098558, -0.052758, 0.012318, -0.000779, -0.025802, 0.00989, 0.060442, -0.040026, -0.074797, 0.006594, -0.039436, 0.02222]),
]


def _ivf_kmeans_oracle() -> str:
    """The ivf_topk oracle with the frozen k-means centroid literals in
    place of the id-seeded cells (same assignment + probe + rank SQL)."""
    vals = ",\n             ".join(
        f"({cid}, CAST({cv} AS DOUBLE[]))"
        for cid, cv in _IVF_KMEANS_CENTROIDS
    )
    return f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
    cents AS (SELECT * FROM (VALUES {vals}) AS t(cid, cv)),
    scored AS (
      SELECT v.vec_id AS vid, v.vv, c.cid,
             round(list_dot_product(v.vv, c.cv)
                   / (sqrt(list_dot_product(v.vv, v.vv))
                      * sqrt(list_dot_product(c.cv, c.cv))), 6) AS ccos
      FROM v CROSS JOIN cents c
    ),
    assigned AS (
      SELECT vid,
             list_transform(vv, x -> x / sqrt(list_dot_product(vv, vv)))
               AS vn,
             cid FROM (
        SELECT *, row_number() OVER
          (PARTITION BY vid ORDER BY ccos DESC, cid) AS rn
        FROM scored) WHERE rn = 1
    ),
    q AS (
      SELECT vid AS q_id,
             list_transform(vv, x -> x / sqrt(list_dot_product(vv, vv)))
               AS qn,
             cid FROM (
        SELECT *, row_number() OVER
          (PARTITION BY vid ORDER BY ccos DESC, cid) AS rn
        FROM scored WHERE vid IN (0, 1, 2)) WHERE rn <= 3
    ),
    s AS (
      SELECT q.q_id, a.vid AS vec_id,
             round(list_dot_product(a.vn, q.qn), 6) AS cosine
      FROM assigned a JOIN q ON a.cid = q.cid
    )
    SELECT q_id, vec_id,
           CAST(row_number() OVER
             (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS INTEGER) AS rank,
           cosine
    FROM s QUALIFY rank <= 5
    """


@register("ivf_topk_kmeans", _ivf_kmeans_oracle())
def q_ivf_topk_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over REAL k-means cells (round-2 verdict ask #8): the
    frozen fixed-seed centroid literals above quantize the corpus, each
    query probes its 2 nearest cells. Same plan shape as ivf_topk —
    broadcast centroid matrix, bucketed probe join, no full scan — but
    with data-fitted cells; recall vs exact cosine_topk is asserted for
    the kmeans path in tests/test_extensions.py."""
    from institutional_fx_etl_spark.operators.similarity import ivf_topk

    cents = local_rows_df(
        spark, _IVF_KMEANS_CENTROIDS, "cid int, cv array<double>"
    )
    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(emb, query_ids=[0, 1, 2], k=5, nprobe=3, centroids=cents)


def _pq_oracle() -> str:
    """DuckDB mirror of operators.similarity.pq_encode over the frozen
    codebook literals (same per-subspace squared distances, same
    first-match argmin, same rounding)."""
    from institutional_fx_etl_spark.operators.similarity import _PQ_CODEBOOK

    m_sub, k_cent = len(_PQ_CODEBOOK), len(_PQ_CODEBOOK[0])
    dims = len(_PQ_CODEBOOK[0][0])
    cols, err = [], []
    for m in range(m_sub):
        dists = []
        for k in range(k_cent):
            cb = "[" + ", ".join(repr(v) for v in _PQ_CODEBOOK[m][k]) + "]"
            dists.append(
                f"list_sum(list_transform(range(1, {dims + 1}), i ->"
                f" (vv[{m * dims} + i] - ({cb})[i])"
                f" * (vv[{m * dims} + i] - ({cb})[i])))"
            )
        darr = "[" + ", ".join(dists) + "]"
        cols.append(
            f"CAST(list_position({darr}, list_min({darr})) - 1 AS INTEGER)"
            f" AS code_{m}"
        )
        err.append(f"list_min({darr})")
    return f"""
    WITH v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vv
               FROM embeddings)
    SELECT id, {", ".join(cols)},
           round({" + ".join(err)}, 6) AS recon_err
    FROM v
    """


@register("pq_encode", _pq_oracle())
def q_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization over the embeddings corpus: each 64-dim
    vector compresses to 4 centroid codes (one per 16-dim subspace,
    frozen literal codebook) + its reconstruction error — the encode
    stage of billion-scale PQ/IVF-PQ ANN indexes, as a pure scan-side
    map (no UDF, no shuffle; see operators/similarity.py::pq_encode)."""
    from institutional_fx_etl_spark.operators.similarity import pq_encode

    return pq_encode(load_table(spark, sf_dir, "embeddings"))


@register(
    "lsh_ann_pairs",
    """
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
    sig AS (
      SELECT vec_id, vv,
             CAST(list_sum(list_transform(range(0, 8), j ->
               CASE WHEN list_sum(list_transform(range(0, len(vv)), i ->
                      vv[i+1] * (CASE WHEN CAST(concat('0x',
                          substr(md5(concat('plane', j, '_', i)),1,8)) AS BIGINT)
                          % 2 = 0 THEN 1.0 ELSE -1.0 END))) > 0
                    THEN (1::BIGINT << j) ELSE 0::BIGINT END)) AS BIGINT) AS bucket
      FROM v
    ),
    normed AS (
      SELECT vec_id, bucket,
             list_transform(vv, x -> x / sqrt(list_dot_product(vv, vv)))
               AS vn
      FROM sig
    )
    SELECT a.bucket AS bucket, a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.vn, b.vn), 6) AS cosine
    FROM normed a JOIN normed b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.vn, b.vn), 6) >= 0.3
    """,
)
def q_lsh_ann_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path ANN: random-hyperplane LSH buckets (8 planes) +
    in-bucket exact cosine verify."""
    from institutional_fx_etl_spark.operators.similarity import lsh_ann_pairs

    return lsh_ann_pairs(load_table(spark, sf_dir, "embeddings"), min_cosine=0.3)


@register(
    "lsh_ann_pairs_multitable",
    """
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
    sig AS (
      SELECT tb.t AS tbl, vec_id, vv,
             CAST(list_sum(list_transform(range(0, 8), j ->
               CASE WHEN list_sum(list_transform(range(0, len(vv)), i ->
                      vv[i+1] * (CASE WHEN CAST(concat('0x',
                          substr(md5(concat(
                            CASE WHEN tb.t = 0 THEN '' ELSE 't1' END,
                            'plane', j, '_', i)),1,8)) AS BIGINT)
                          % 2 = 0 THEN 1.0 ELSE -1.0 END))) > 0
                    THEN (1::BIGINT << j) ELSE 0::BIGINT END))
               + tb.t * 256 AS BIGINT) AS tbucket
      FROM v, (SELECT unnest(range(0, 2)) AS t) tb
    ),
    cand AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             min(a.tbucket) AS bucket
      FROM sig a JOIN sig b
        ON a.tbucket = b.tbucket AND a.vec_id < b.vec_id
      GROUP BY 1, 2
    ),
    normed AS (
      SELECT vec_id,
             list_transform(vv, x -> x / sqrt(list_dot_product(vv, vv)))
               AS vn
      FROM v
    )
    SELECT c.bucket AS bucket, c.id_a, c.id_b,
           round(list_dot_product(a.vn, b.vn), 6) AS cosine
    FROM cand c
    JOIN normed a ON c.id_a = a.vec_id
    JOIN normed b ON c.id_b = b.vec_id
    WHERE round(list_dot_product(a.vn, b.vn), 6) >= 0.3
    """,
)
def q_lsh_ann_pairs_multitable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table (b=8, L=2) LSH ANN (round-6 verdict ask #4): a pair
    is a candidate if it collides in EITHER independent seed-prefixed
    plane set — recall 1 − (1 − p^8)² vs the single table's p^8 —
    deduped narrow (ids only) before one exact-cosine verify. The
    oracle mirrors both plane seeds ('' and 't1'), the
    table-offset bucket key (bucket + t·2^8), and the min-collision
    bucket report bit-for-bit."""
    from institutional_fx_etl_spark.operators.similarity import lsh_ann_pairs

    return lsh_ann_pairs(
        load_table(spark, sf_dir, "embeddings"),
        min_cosine=0.3,
        num_tables=2,
    )


@register(
    "lsh_ann_pairs_scaled",
    """
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
    np AS (SELECT GREATEST(8, LEAST(24,
               CAST(ceil(log2(count(*) / 1.0)) AS BIGINT))) AS p FROM v),
    sig AS (
      SELECT vec_id, vv,
             CAST(list_sum(list_transform(range(0, (SELECT p FROM np)), j ->
               CASE WHEN list_sum(list_transform(range(0, len(vv)), i ->
                      vv[i+1] * (CASE WHEN CAST(concat('0x',
                          substr(md5(concat('plane', j, '_', i)),1,8)) AS BIGINT)
                          % 2 = 0 THEN 1.0 ELSE -1.0 END))) > 0
                    THEN (1::BIGINT << j) ELSE 0::BIGINT END)) AS BIGINT) AS bucket
      FROM v
    ),
    normed AS (
      SELECT vec_id, bucket,
             list_transform(vv, x -> x / sqrt(list_dot_product(vv, vv)))
               AS vn
      FROM sig
    )
    SELECT a.bucket AS bucket, a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.vn, b.vn), 6) AS cosine
    FROM normed a JOIN normed b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.vn, b.vn), 6) >= 0.3
    """,
)
def q_lsh_ann_pairs_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION shape of lsh_ann_pairs (round-9 verdict ask #2):
    the hyperplane count is DERIVED from the corpus size via
    ``auto_planes(n)`` — the knob that keeps in-bucket verify work
    Σ|bucket|² ≈ n·target linear in n — instead of the pinned 8 the
    demo query certifies. The oracle re-derives the same count from
    its own count(*) (GREATEST(8, LEAST(24, ceil(log2(n/target)))))
    so the dynamic-plane path itself is hash-certified end to end.
    ``target_bucket_rows=1`` keeps the derived count off the min-clamp
    at test scales (9 planes at n=500, 11 at n=2000 — a real
    divergence from the pinned query); production sizing uses the
    default target of 8 rows/bucket, same formula."""
    from institutional_fx_etl_spark.operators.similarity import (
        auto_planes,
        lsh_ann_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    planes = auto_planes(emb.count(), target_bucket_rows=1)
    return lsh_ann_pairs(emb, min_cosine=0.3, num_planes=planes)


@register(
    "text_token_count",
    """
    WITH t AS (
      SELECT doc_id, text, lang, source, n_chars,
             string_split_regex(lower(text), '\\s+') AS toks
      FROM documents
    )
    SELECT doc_id, text, lang, source, n_chars,
           CAST(len(toks) AS INTEGER) AS n_tokens,
           CAST(length(text) AS INTEGER) AS n_chars_computed,
           CAST(list_sum(list_transform(toks, tk -> length(tk))) AS DOUBLE)
             / len(toks) AS avg_token_len
    FROM t
    """,
)
def q_text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + length stats (whitespace tokenizer)."""
    from institutional_fx_etl_spark.operators.text import with_text_stats

    df = with_text_stats(load_table(spark, sf_dir, "documents"))
    return df.selectExpr(
        "doc_id", "text", "lang", "source", "n_chars",
        "cast(n_tokens as int) AS n_tokens",
        "cast(n_chars_computed as int) AS n_chars_computed",
        "avg_token_len",
    )


@register(
    "text_quality",
    """
    WITH t AS (
      SELECT doc_id, text, string_split_regex(lower(text), '\\s+') AS toks
      FROM documents
    ),
    s AS (
      SELECT doc_id,
             CAST(len(toks) AS INTEGER) AS n_tokens,
             CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
               / length(text) AS punct_ratio,
             CAST(len(list_filter(toks, tk -> tk IN
               ('the','and','of','to','a','in','is'))) AS DOUBLE) / len(toks)
               AS stopword_ratio
      FROM t
    )
    SELECT doc_id, n_tokens, punct_ratio, stopword_ratio,
           round(0.4 * stopword_ratio - 0.3 * punct_ratio
                 + 0.3 * least(n_tokens, 100) / 100.0, 6) AS quality
    FROM s
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring (stopword/punctuation/length mix)."""
    from institutional_fx_etl_spark.operators.text import quality_score

    df = quality_score(load_table(spark, sf_dir, "documents"))
    return df.selectExpr(
        "doc_id",
        "cast(n_tokens as int) AS n_tokens",
        "punct_ratio",
        "stopword_ratio",
        "quality",
    )


@register(
    "text_lang_id",
    """
    WITH t AS (
      SELECT doc_id, lang, string_split_regex(lower(text), '\\s+') AS toks
      FROM documents
    ),
    h AS (
      SELECT doc_id, lang,
        len(list_filter(toks, tk -> tk IN ('the','and','of','to','a','in','is'))) AS h_en,
        len(list_filter(toks, tk -> tk IN ('el','la','de','que','y','los'))) AS h_es,
        len(list_filter(toks, tk -> tk IN ('le','la','et','les','des','un'))) AS h_fr,
        len(list_filter(toks, tk -> tk IN ('der','die','und','das','ein','zu'))) AS h_de,
        len(list_filter(toks, tk -> tk IN ('的','是','了','我','不'))) AS h_zh
      FROM t
    )
    SELECT doc_id, lang,
           CASE
             WHEN h_zh > greatest(h_en, h_es, h_fr, h_de) THEN 'zh'
             WHEN h_de > greatest(h_en, h_es, h_fr) THEN 'de'
             WHEN h_fr > greatest(h_en, h_es) THEN 'fr'
             WHEN h_es > h_en THEN 'es'
             ELSE 'en'
           END AS predicted_lang
    FROM h
    """,
)
def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language ID heuristic vs the table's lang column."""
    from institutional_fx_etl_spark.operators.text import lang_id

    df = lang_id(load_table(spark, sf_dir, "documents"))
    return df.select("doc_id", "lang", "predicted_lang")


@register(
    "text_fingerprint",
    f"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
      FROM documents
    )
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS set_fingerprint,
           list_min({_DUCK_SHINGLES.format(toks='toks')}) AS min_shingle_hash
    FROM t
    """,
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprints: sorted-token-set md5 + min shingle hash."""
    from institutional_fx_etl_spark.operators.text import fingerprint

    df = fingerprint(load_table(spark, sf_dir, "documents"))
    return df.select("doc_id", "set_fingerprint", "min_shingle_hash")


@register(
    "multimodal_decode",
    """
    SELECT doc_id, 'image/fake' AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           CAST(octet_length(encode(text)) % 64 + 1 AS INTEGER) AS width,
           CAST((octet_length(encode(text)) // 64) % 64 + 1 AS INTEGER) AS height,
           md5(text) AS checksum
    FROM documents
    """,
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload feature extraction through the Arrow-batched
    mapInPandas decode stage (deterministic stub decoder)."""
    from institutional_fx_etl_spark.operators.multimodal import (
        attach_binary_payload,
        decode_features,
    )

    docs = load_table(spark, sf_dir, "documents")
    return decode_features(attach_binary_payload(docs))


@register(
    "multimodal_frames",
    """
    -- DuckDB cannot substring a BLOB; the corpus is pure ASCII
    -- (octet_length(encode(text)) = length(text) for every row), so
    -- byte slices of the utf-8 payload equal char slices of the text.
    SELECT doc_id, CAST(b.frame_idx AS INTEGER) AS frame_idx,
           md5(substring(text,
                         CAST((b.frame_idx * length(text)) // 4 + 1 AS INTEGER),
                         CAST(length(text) // 4 AS INTEGER))) AS frame_checksum
    FROM documents, (SELECT unnest(range(0, 4)) AS frame_idx) b
    """,
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling stub: per-payload byte-slice checksums (the
    explode-per-frame shape of a real video frame sampler)."""
    from institutional_fx_etl_spark.operators.multimodal import (
        attach_binary_payload,
        frame_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    return frame_sample(attach_binary_payload(docs))


@register(
    "streaming_tumbling_ohlc",
    """
    WITH t AS (
      SELECT ts, value + 0.01 AS ask, value - 0.01 AS bid FROM events
    ),
    t2 AS (
      SELECT ts, (ask + bid) / 2 AS mid, ask - bid AS spread, ask FROM t
    )
    SELECT date_trunc('hour', ts) AS datetime,
           first(mid ORDER BY ts, mid) AS open,
           max(mid) AS high,
           min(mid) AS low,
           last(mid ORDER BY ts, mid) AS close,
           CAST(count(ask) AS DOUBLE) AS volume,
           round(avg(spread), 6) AS spread
    FROM t2 GROUP BY 1
    """,
)
def q_streaming_tumbling_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming tumbling OHLC driven to completion over the
    bounded events source — must equal the batch aggregation exactly
    (same oracle as tumbling_ohlc)."""
    from institutional_fx_etl_spark.streaming.candles import run_bounded_stream

    out = run_bounded_stream(
        spark, f"{sf_dir}/events.parquet", table_name="stream_candles_q"
    )
    return out.withColumn("spread", F.round("spread", 6))


# ---------------------------------------------------------------------
# Flagship — the full hybrid-merge pipeline (SURVEY.md §3)
# ---------------------------------------------------------------------


def _pipeline_inputs(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Derive the two reference-shaped sources from the events table:
    a raw tick stream (click/view/purchase events) and a legacy M1
    candle history (signup/error events resampled, spread nulled)."""
    events = load_table(spark, sf_dir, "events")
    ticks = events.filter(
        "event_type IN ('click', 'view', 'purchase')"
    ).selectExpr(
        "ts AS datetime",
        "value + 0.01 AS ask",
        "value - 0.01 AS bid",
    )
    m1_src = events.filter("event_type IN ('signup', 'error')").selectExpr(
        "ts AS datetime",
        "value + 0.02 AS ask",
        "value - 0.02 AS bid",
    )
    m1 = ticks_to_candles(m1_src).withColumn("spread", F.lit(None).cast("double"))
    return m1, ticks


#: Full-pipeline oracle: every stage of HybridMergerSpark.run() as one
#: DuckDB CTE chain (filter → resample → consensus → combine_first →
#: spread repair → clean → densify → float32 cast). The final REAL cast
#: absorbs double-precision drift from interpolated medians, so the
#: match is exact.
_HYBRID_PIPELINE_ORACLE = """
WITH ticks0 AS (
  SELECT ts AS datetime, value + 0.01 AS ask, value - 0.01 AS bid
  FROM events WHERE event_type IN ('click', 'view', 'purchase')
),
ticks1 AS (  -- F1 null-safe bad-tick drop + F2 off-session drop
  SELECT * FROM ticks0
  WHERE NOT coalesce(ask < 0.0001 OR bid < 0.0001, false)
    AND NOT (dayofweek(datetime) = 6
             OR (dayofweek(datetime) = 5 AND hour(datetime) >= 22)
             OR (dayofweek(datetime) = 0 AND hour(datetime) < 21))
),
tick_candles AS (  -- A1-A3 tumbling OHLC
  SELECT date_trunc('minute', datetime) AS datetime,
         first(mid ORDER BY datetime, mid) AS open,
         max(mid) AS high, min(mid) AS low,
         last(mid ORDER BY datetime, mid) AS close,
         CAST(count(ask) AS DOUBLE) AS volume,
         avg(spread) AS spread
  FROM (SELECT datetime, (ask + bid) / 2 AS mid, ask - bid AS spread, ask
        FROM ticks1)
  GROUP BY 1 HAVING last(mid ORDER BY datetime, mid) IS NOT NULL
),
m1src AS (
  SELECT ts AS datetime, value + 0.02 AS ask, value - 0.02 AS bid
  FROM events WHERE event_type IN ('signup', 'error')
),
m1 AS (  -- legacy candles; spread is all-NULL like the reference's M1
  SELECT date_trunc('minute', datetime) AS datetime,
         first(mid ORDER BY datetime, mid) AS open,
         max(mid) AS high, min(mid) AS low,
         last(mid ORDER BY datetime, mid) AS close,
         CAST(count(ask) AS DOUBLE) AS volume,
         CAST(NULL AS DOUBLE) AS spread
  FROM (SELECT datetime, (ask + bid) / 2 AS mid, ask
        FROM m1src)
  GROUP BY 1 HAVING last(mid ORDER BY datetime, mid) IS NOT NULL
),
kept AS (  -- consensus: drop tick minutes deviating > 50.0 from M1
  SELECT t.* FROM tick_candles t LEFT JOIN m1 ON t.datetime = m1.datetime
  WHERE NOT coalesce(abs(t.close - m1.close) > 50.0, false)
),
merged AS (  -- J3 cell-level combine_first
  SELECT coalesce(k.datetime, m1.datetime) AS datetime,
         coalesce(k.open, m1.open) AS open,
         coalesce(k.high, m1.high) AS high,
         coalesce(k.low, m1.low) AS low,
         coalesce(k.close, m1.close) AS close,
         coalesce(k.volume, m1.volume) AS volume,
         coalesce(k.spread, m1.spread) AS spread
  FROM kept k FULL OUTER JOIN m1 ON k.datetime = m1.datetime
),
spreadfix AS (  -- A5 median fill + W3 centered rolling-median smooth
  SELECT datetime, open, high, low, close, volume,
         quantile_cont(coalesce(spread,
           (SELECT CASE WHEN count(*) = 0 THEN 0.0 ELSE median(spread) END
            FROM kept)), 0.5)
           OVER (ORDER BY datetime ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
           AS spread
  FROM merged
),
noninv AS (  -- F4 drop inverted candles (null-safe)
  SELECT * FROM spreadfix WHERE NOT coalesce(low > high, false)
),
fixed AS (  -- F5 structure fix + conditional spread ffill
  SELECT datetime, open, close, volume,
         CASE WHEN bad THEN greatest(open, close, high) ELSE high END AS high,
         CASE WHEN bad THEN least(open, close, low) ELSE low END AS low,
         CASE WHEN max(CAST(bad AS INT)) OVER () > 0
              THEN last_value(CASE WHEN bad THEN NULL ELSE spread END IGNORE NULLS)
                     OVER (ORDER BY datetime ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              ELSE spread END AS spread
  FROM (SELECT *, coalesce(open > high OR open < low
                           OR close > high OR close < low, false) AS bad
        FROM noninv)
),
clean AS (  -- F6 volatility-spike drop (θ = 1e9: never fires here)
  SELECT datetime, open, high, low, close, volume, spread
  FROM (SELECT *,
          (high - low) / open AS amp,
          abs((close - lag(close) OVER (ORDER BY datetime))
              / lag(close) OVER (ORDER BY datetime)) AS jump
        FROM fixed)
  WHERE NOT (coalesce(amp > 1e9, false) OR coalesce(jump > 1e9, false))
),
bounds AS (SELECT min(datetime) AS t0, max(datetime) AS t1 FROM clean),
spine AS (
  SELECT unnest(generate_series(t0, t1, INTERVAL 1 MINUTE)) AS datetime FROM bounds
),
grid AS (
  SELECT spine.datetime AS datetime, c.open, c.high, c.low, c.close,
         c.volume, c.spread, c.close IS NULL AS gap
  FROM spine LEFT JOIN clean c ON spine.datetime = c.datetime
),
dense AS (  -- J4 + W2/W4 flat-candle bridging
  SELECT datetime,
         CASE WHEN gap THEN close_f ELSE open END AS open,
         CASE WHEN gap THEN close_f ELSE high END AS high,
         CASE WHEN gap THEN close_f ELSE low END AS low,
         CASE WHEN gap THEN close_f ELSE close END AS close,
         CASE WHEN gap THEN spread_f ELSE spread END AS spread,
         CASE WHEN gap THEN 0.0 ELSE volume END AS volume,
         CASE WHEN gap THEN 1 ELSE 0 END AS is_flat
  FROM (SELECT *,
          last_value(close IGNORE NULLS) OVER
            (ORDER BY datetime ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS close_f,
          last_value(spread IGNORE NULLS) OVER
            (ORDER BY datetime ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS spread_f
        FROM grid)
)
SELECT datetime,
       CAST(open AS REAL) AS open, CAST(high AS REAL) AS high,
       CAST(low AS REAL) AS low, CAST(close AS REAL) AS close,
       CAST(spread AS REAL) AS spread, CAST(volume AS REAL) AS volume,
       CAST(is_flat AS TINYINT) AS is_flat
FROM dense WHERE close IS NOT NULL
"""


#: Multi-symbol pipeline oracle: the same stage chain with every
#: aggregation, join, window and spine keyed by symbol — the oracle-
#: level proof of the partition_cols scale path (events split into 4
#: synthetic symbols by user_id).
_HYBRID_MULTISYM_ORACLE = """
WITH ticks0 AS (
  SELECT concat('S', user_id % 4) AS symbol, ts AS datetime,
         value + 0.01 AS ask, value - 0.01 AS bid
  FROM events WHERE event_type IN ('click', 'view', 'purchase')
),
ticks1 AS (
  SELECT * FROM ticks0
  WHERE NOT coalesce(ask < 0.0001 OR bid < 0.0001, false)
    AND NOT (dayofweek(datetime) = 6
             OR (dayofweek(datetime) = 5 AND hour(datetime) >= 22)
             OR (dayofweek(datetime) = 0 AND hour(datetime) < 21))
),
tick_candles AS (
  SELECT symbol, date_trunc('minute', datetime) AS datetime,
         first(mid ORDER BY datetime, mid) AS open,
         max(mid) AS high, min(mid) AS low,
         last(mid ORDER BY datetime, mid) AS close,
         CAST(count(ask) AS DOUBLE) AS volume,
         avg(spread) AS spread
  FROM (SELECT symbol, datetime, (ask + bid) / 2 AS mid,
               ask - bid AS spread, ask FROM ticks1)
  GROUP BY 1, 2 HAVING last(mid ORDER BY datetime, mid) IS NOT NULL
),
m1 AS (
  SELECT symbol, date_trunc('minute', datetime) AS datetime,
         first(mid ORDER BY datetime, mid) AS open,
         max(mid) AS high, min(mid) AS low,
         last(mid ORDER BY datetime, mid) AS close,
         CAST(count(ask) AS DOUBLE) AS volume,
         CAST(NULL AS DOUBLE) AS spread
  FROM (SELECT concat('S', user_id % 4) AS symbol, ts AS datetime,
               value AS mid, value + 0.02 AS ask
        FROM events WHERE event_type IN ('signup', 'error'))
  GROUP BY 1, 2 HAVING last(mid ORDER BY datetime, mid) IS NOT NULL
),
kept AS (
  SELECT t.* FROM tick_candles t
  LEFT JOIN m1 ON t.symbol = m1.symbol AND t.datetime = m1.datetime
  WHERE NOT coalesce(abs(t.close - m1.close) > 50.0, false)
),
medians AS (
  SELECT symbol, median(spread) AS med, count(*) AS n FROM kept GROUP BY 1
),
merged AS (
  SELECT coalesce(k.symbol, m1.symbol) AS symbol,
         coalesce(k.datetime, m1.datetime) AS datetime,
         coalesce(k.open, m1.open) AS open,
         coalesce(k.high, m1.high) AS high,
         coalesce(k.low, m1.low) AS low,
         coalesce(k.close, m1.close) AS close,
         coalesce(k.volume, m1.volume) AS volume,
         coalesce(k.spread, m1.spread) AS spread
  FROM kept k FULL OUTER JOIN m1
    ON k.symbol = m1.symbol AND k.datetime = m1.datetime
),
spreadfix AS (
  SELECT m.symbol, datetime, open, high, low, close, volume,
         quantile_cont(coalesce(m.spread,
             CASE WHEN coalesce(md.n, 0) = 0 THEN 0.0 ELSE md.med END), 0.5)
           OVER (PARTITION BY m.symbol ORDER BY datetime
                 ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS spread
  FROM merged m LEFT JOIN medians md ON m.symbol = md.symbol
),
noninv AS (
  SELECT * FROM spreadfix WHERE NOT coalesce(low > high, false)
),
fixed AS (
  SELECT symbol, datetime, open, close, volume,
         CASE WHEN bad THEN greatest(open, close, high) ELSE high END AS high,
         CASE WHEN bad THEN least(open, close, low) ELSE low END AS low,
         CASE WHEN max(CAST(bad AS INT)) OVER (PARTITION BY symbol) > 0
              THEN last_value(CASE WHEN bad THEN NULL ELSE spread END IGNORE NULLS)
                     OVER (PARTITION BY symbol ORDER BY datetime
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              ELSE spread END AS spread
  FROM (SELECT *, coalesce(open > high OR open < low
                           OR close > high OR close < low, false) AS bad
        FROM noninv)
),
clean AS (
  SELECT symbol, datetime, open, high, low, close, volume, spread
  FROM (SELECT *,
          (high - low) / open AS amp,
          abs((close - lag(close) OVER w) / lag(close) OVER w) AS jump
        FROM fixed WINDOW w AS (PARTITION BY symbol ORDER BY datetime))
  WHERE NOT (coalesce(amp > 1e9, false) OR coalesce(jump > 1e9, false))
),
seq AS (
  SELECT *, lead(datetime) OVER (PARTITION BY symbol ORDER BY datetime) AS next_ts,
         last_value(spread IGNORE NULLS) OVER
           (PARTITION BY symbol ORDER BY datetime
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS spread_f
  FROM clean
),
dense AS (
  SELECT symbol, datetime, open, high, low, close, spread, volume, 0 AS is_flat
  FROM seq
  UNION ALL
  SELECT symbol, g.gap_ts, close, close, close, close, spread_f, 0.0, 1
  FROM seq,
       unnest(generate_series(datetime + INTERVAL 1 MINUTE,
                              coalesce(next_ts, datetime) - INTERVAL 1 MINUTE,
                              INTERVAL 1 MINUTE)) AS g(gap_ts)
  WHERE next_ts IS NOT NULL
)
SELECT symbol, datetime,
       CAST(open AS REAL) AS open, CAST(high AS REAL) AS high,
       CAST(low AS REAL) AS low, CAST(close AS REAL) AS close,
       CAST(spread AS REAL) AS spread, CAST(volume AS REAL) AS volume,
       CAST(is_flat AS TINYINT) AS is_flat
FROM dense WHERE close IS NOT NULL
"""


@register("hybrid_pipeline_multisym", _HYBRID_MULTISYM_ORACLE)
def q_hybrid_pipeline_multisym(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path under oracle check: 4 synthetic symbols, every
    shuffle/window/spine keyed by ``partition_cols=('symbol',)`` —
    window sorts run per symbol in parallel (no single-partition
    exchange; asserted in tests/test_multisymbol.py)."""
    from institutional_fx_etl_spark.plans.pipeline import HybridMergerSpark

    events = load_table(spark, sf_dir, "events")
    sym = F.concat(F.lit("S"), (F.col("user_id") % 4).cast("string"))
    ticks = events.filter(
        F.col("event_type").isin("click", "view", "purchase")
    ).select(
        sym.alias("symbol"),
        F.col("ts").alias("datetime"),
        (F.col("value") + 0.01).alias("ask"),
        (F.col("value") - 0.01).alias("bid"),
    )
    m1_src = events.filter(F.col("event_type").isin("signup", "error")).select(
        sym.alias("symbol"),
        F.col("ts").alias("datetime"),
        (F.col("value") + 0.02).alias("ask"),
        (F.col("value") - 0.02).alias("bid"),
    )
    eng = HybridMergerSpark(
        spike_threshold=1e9,
        consensus_threshold=50.0,
        partition_cols=("symbol",),
    )
    m1 = ticks_to_candles(m1_src, partition_cols=("symbol",)).withColumn(
        "spread", F.lit(None).cast("double")
    )
    final, _ = eng.run(m1, ticks)
    return final


@register("hybrid_pipeline", _HYBRID_PIPELINE_ORACLE)
def q_hybrid_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole engine end-to-end: filter → resample → consensus →
    combine_first → spread repair → clean → grid densify → cast.
    Spike threshold is effectively off (events jump wildly by design);
    the cleaning operators are oracle-checked via the fixture tests and
    the per-operator queries above."""
    from institutional_fx_etl_spark.plans.pipeline import HybridMergerSpark

    m1, ticks = _pipeline_inputs(spark, sf_dir)
    eng = HybridMergerSpark(spike_threshold=1e9, consensus_threshold=50.0)
    final, _audit = eng.run(m1, ticks)
    return final


@register(
    "streaming_gap_bridge",
    """
    WITH candles AS (
      SELECT date_trunc('minute', ts) AS datetime,
             first(mid ORDER BY ts, mid) AS open,
             max(mid) AS high, min(mid) AS low,
             last(mid ORDER BY ts, mid) AS close,
             CAST(count(ask) AS DOUBLE) AS volume,
             round(avg(spread), 6) AS spread
      FROM (SELECT ts, (ask + bid) / 2 AS mid, ask - bid AS spread, ask
            FROM (SELECT ts, value + 0.01 AS ask, value - 0.01 AS bid
                  FROM events WHERE event_type = 'click'))
      GROUP BY 1
    ),
    seq AS (
      SELECT *, lead(datetime) OVER (ORDER BY datetime) AS next_ts,
             lead(datetime) OVER (ORDER BY datetime) IS NOT NULL AS has_next
      FROM candles
    ),
    gaps AS (
      SELECT 'X' AS symbol, g.gap_ts AS datetime,
             close AS open, close AS high, close AS low, close AS close,
             0.0 AS volume, spread, 1 AS is_flat
      FROM seq,
           unnest(generate_series(datetime + INTERVAL 1 MINUTE,
                                  coalesce(next_ts, datetime) - INTERVAL 1 MINUTE,
                                  INTERVAL 1 MINUTE)) AS g(gap_ts)
      WHERE has_next
    )
    SELECT 'X' AS symbol, datetime, open, high, low, close, volume, spread,
           0 AS is_flat
    FROM candles
    UNION ALL
    SELECT * FROM gaps
    """,
)
def q_streaming_gap_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    live flat-candle gap bridging over a bounded candle stream — must
    equal the batch densification of the same candles."""
    import tempfile

    from institutional_fx_etl_spark.operators.ohlc import ticks_to_candles
    from institutional_fx_etl_spark.streaming.stateful import streaming_gap_bridge

    events = load_table(spark, sf_dir, "events")
    ticks = events.filter(F.col("event_type") == "click").select(
        F.col("ts").alias("datetime"),
        (F.col("value") + 0.01).alias("ask"),
        (F.col("value") - 0.01).alias("bid"),
    )
    candles = ticks_to_candles(ticks).withColumn(
        "spread", F.round("spread", 6)
    ).withColumn("symbol", F.lit("X"))

    src = _stream_tmpdir(prefix="stream_candles_")
    candles.write.mode("overwrite").parquet(src)

    schema = (
        "datetime timestamp, open double, high double, low double, close double,"
        " volume double, spread double, symbol string"
    )
    stream = spark.readStream.schema(schema).parquet(src)
    q = _start_stream(
        spark,
        streaming_gap_bridge(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("gap_bridge_q")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table("gap_bridge_q")


@register(
    "streaming_dedup",
    """
    SELECT DISTINCT user_id, event_type FROM events
    """,
)
def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup with bounded state:
    ``dropDuplicatesWithinWatermark`` keys on (user_id, event_type) and
    evicts per-key state once the 10-minute event-time watermark
    passes — the streaming counterpart of the batch ``dedup_exact``
    family, with state that does NOT grow with the stream. Over a
    bounded replay the retained first-seen rows are exactly the
    distinct key set (the batch DISTINCT oracle)."""
    from institutional_fx_etl_spark.sources.readers import read_parquet_nanos_safe

    import os
    import tempfile

    static = read_parquet_nanos_safe(spark, f"{sf_dir}/events.parquet")
    ts_is_long = dict(static.dtypes).get("ts") == "bigint"

    stream = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # watermarks demand TIMESTAMP (with zone) — NTZ parquet columns
    # cast through (session-zone interpretation, no-op for tz-aware)
    ts_expr = (
        F.expr("timestamp_micros(ts div 1000)")
        if ts_is_long
        else F.col("ts").cast("timestamp")
    )
    deduped = (
        stream.select(
            "user_id", "event_type", ts_expr.alias("__event_ts")
        )
        .withWatermark("__event_ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    name = f"dedup_q_{abs(hash(sf_dir)) % 10_000}"
    q = _start_stream(
        spark,
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option(
            "checkpointLocation", _stream_tmpdir(prefix="stream_dedup_ck_")
        )
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


@register(
    "ngram_topk",
    """
    WITH t AS (
      SELECT string_split_regex(lower(text), '\\s+') AS toks FROM documents
    ),
    bg AS (
      SELECT unnest(list_transform(range(1, len(toks)),
                    i -> toks[i] || ' ' || toks[i+1])) AS bigram
      FROM t WHERE len(toks) >= 2
    )
    SELECT bigram, CAST(count(*) AS BIGINT) AS n
    FROM bg GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 20
    """,
)
def q_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 bigrams — the n-gram frequency profile every
    training-data audit starts with (boilerplate detection, template
    contamination). Same whitespace tokenization as the dedup/corpus
    family; bigram generation is a scan-side array transform + explode,
    the count is one partial+final hash aggregate, and only the global
    top-k crosses the final ordering."""
    docs = load_table(spark, sf_dir, "documents")
    bg = docs.selectExpr(
        r"split(lower(text), '\\s+') AS toks"
    ).filter("size(toks) >= 2").selectExpr(
        "explode(transform(sequence(0, size(toks) - 2),"
        " i -> concat(element_at(toks, i + 1), ' ',"
        " element_at(toks, i + 2)))) AS bigram"
    )
    return (
        bg.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
    )


@register(
    "corpus_pipeline",
    f"""
    WITH RECURSIVE t AS (
      SELECT doc_id, text, lang, string_split_regex(lower(text), '\\s+') AS toks
      FROM documents
    ),
    t2 AS (
      SELECT doc_id, {_DUCK_SHINGLES.format(toks='toks')} AS sh
      FROM t WHERE len(toks) >= 3
    ),
    sigs AS (
      SELECT doc_id, sh,
             list_transform(range(0, 16), i -> list_min(
               list_transform(sh, h -> ((2*i+1)*h + (7*i+3)) % 2147483647))) AS sig
      FROM t2
    ),
    banded AS (
      SELECT doc_id, b.band_idx,
             md5(array_to_string(sig[b.band_idx*4+1 : b.band_idx*4+4], ',')) AS band_sig
      FROM sigs, (SELECT unnest(range(0, 4)) AS band_idx) b
    ),
    capped AS (
      SELECT doc_id, band_idx, band_sig FROM (
        SELECT *, count(*) OVER (PARTITION BY band_idx, band_sig) AS __n
        FROM banded
      ) WHERE __n <= 64
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
      FROM capped a JOIN capped c USING (band_idx, band_sig)
      WHERE a.doc_id < c.doc_id
    ),
    pairs AS (
      SELECT id_a, id_b FROM cand
      JOIN t2 sa ON sa.doc_id = cand.id_a
      JOIN t2 sb ON sb.doc_id = cand.id_b
      WHERE round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                  / len(list_distinct(list_concat(sa.sh, sb.sh))), 6) >= 0.2
    ),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ),
    reach(a, b) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    comp AS (SELECT a AS doc_id, min(b) AS comp FROM reach GROUP BY a),
    canonical AS (SELECT doc_id FROM comp WHERE doc_id = comp),
    scored AS (
      SELECT t.doc_id, t.lang, CAST(len(toks) AS INTEGER) AS n_tokens,
             round(0.4 * (CAST(len(list_filter(toks, tk -> tk IN
                     ('the','and','of','to','a','in','is'))) AS DOUBLE) / len(toks))
                   - 0.3 * (CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g'))
                            AS DOUBLE) / length(text))
                   + 0.3 * least(len(toks), 100) / 100.0, 6) AS quality
      FROM t JOIN canonical USING (doc_id)
    ),
    kept AS (SELECT * FROM scored WHERE quality >= 0.05)
    SELECT doc_id, lang, n_tokens, quality,
           CAST(floor((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
                / 20000.0) AS INTEGER) AS shard_id
    FROM kept
    """,
)
def q_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension-side flagship: near-dup clustering → canonical doc →
    quality gate → per-language token-budget shard packing, end to end."""
    from institutional_fx_etl_spark.plans.corpus import build_training_corpus

    return build_training_corpus(load_table(spark, sf_dir, "documents"))


#: Validator oracle: the reference's entry point 3 run against the
#: pipeline's own output — reuses the full pipeline CTE and reconciles
#: it with the m1 source (deviation > threshold, top-5, total order).
_VALIDATOR_ORACLE = """
WITH m1src AS (
  SELECT ts AS datetime, value + 0.02 AS ask, value - 0.02 AS bid
  FROM events WHERE event_type IN ('signup', 'error')
),
m1 AS (
  SELECT date_trunc('minute', datetime) AS datetime,
         last(mid ORDER BY datetime, mid) AS close
  FROM (SELECT datetime, (ask + bid) / 2 AS mid FROM m1src)
  GROUP BY 1 HAVING last(mid ORDER BY datetime, mid) IS NOT NULL
),
hybrid AS (
%s
)
SELECT h.datetime AS datetime,
       CAST(h.close AS DOUBLE) AS hybrid_close,
       m1.close AS m1_close,
       abs(CAST(h.close AS DOUBLE) - m1.close) AS deviation
FROM hybrid h JOIN m1 ON h.datetime = m1.datetime
WHERE coalesce(abs(CAST(h.close AS DOUBLE) - m1.close) > 0.05, false)
ORDER BY deviation DESC, datetime
LIMIT 5
""" % "\n".join(
    f"  {line}" for line in _HYBRID_PIPELINE_ORACLE.strip().splitlines()
)


@register("validator_reconcile", _VALIDATOR_ORACLE)
def q_validator_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entry point 3 (validator.py): reconcile the pipeline's own
    output against the legacy M1 closes — top-5 worst deviations."""
    from institutional_fx_etl_spark.plans.pipeline import HybridMergerSpark
    from institutional_fx_etl_spark.plans.validator import reconcile

    m1, ticks = _pipeline_inputs(spark, sf_dir)
    eng = HybridMergerSpark(spike_threshold=1e9, consensus_threshold=50.0)
    final, _ = eng.run(m1, ticks)
    return reconcile(final, m1, threshold=0.05)


#: Audit-log oracle: consensus rejections + gap rows (the spike stage
#: cannot fire at θ=1e9 and the synthetic candles cannot be inverted /
#: structurally broken, so those tag sets are provably empty here — the
#: fixture tests exercise them instead).
_HYBRID_AUDIT_ORACLE = """
WITH ticks0 AS (
  SELECT ts AS datetime, value + 0.01 AS ask, value - 0.01 AS bid
  FROM events WHERE event_type IN ('click', 'view', 'purchase')
),
ticks1 AS (
  SELECT * FROM ticks0
  WHERE NOT coalesce(ask < 0.0001 OR bid < 0.0001, false)
    AND NOT (dayofweek(datetime) = 6
             OR (dayofweek(datetime) = 5 AND hour(datetime) >= 22)
             OR (dayofweek(datetime) = 0 AND hour(datetime) < 21))
),
tick_candles AS (
  SELECT date_trunc('minute', datetime) AS datetime,
         first(mid ORDER BY datetime, mid) AS open,
         max(mid) AS high, min(mid) AS low,
         last(mid ORDER BY datetime, mid) AS close,
         CAST(count(ask) AS DOUBLE) AS volume,
         avg(spread) AS spread
  FROM (SELECT datetime, (ask + bid) / 2 AS mid, ask - bid AS spread, ask
        FROM ticks1)
  GROUP BY 1 HAVING last(mid ORDER BY datetime, mid) IS NOT NULL
),
m1 AS (
  SELECT date_trunc('minute', datetime) AS datetime,
         first(mid ORDER BY datetime, mid) AS open,
         max(mid) AS high, min(mid) AS low,
         last(mid ORDER BY datetime, mid) AS close,
         CAST(count(ask) AS DOUBLE) AS volume
  FROM (SELECT ts AS datetime, value AS mid, value + 0.02 AS ask
        FROM events WHERE event_type IN ('signup', 'error'))
  GROUP BY 1 HAVING last(mid ORDER BY datetime, mid) IS NOT NULL
),
consensus_audit AS (
  SELECT t.datetime, t.open, t.high, t.low, t.close, t.volume,
         'rejected_tick_catastrophe' AS reason
  FROM tick_candles t JOIN m1 ON t.datetime = m1.datetime
  WHERE coalesce(abs(t.close - m1.close) > 50.0, false)
),
kept AS (
  SELECT t.* FROM tick_candles t LEFT JOIN m1 ON t.datetime = m1.datetime
  WHERE NOT coalesce(abs(t.close - m1.close) > 50.0, false)
),
merged AS (
  SELECT coalesce(k.datetime, m1.datetime) AS datetime,
         coalesce(k.close, m1.close) AS close
  FROM kept k FULL OUTER JOIN m1 ON k.datetime = m1.datetime
),
gaps AS (
  SELECT gap_ts AS datetime
  FROM (SELECT datetime,
               lead(datetime) OVER (ORDER BY datetime) AS next_ts
        FROM merged),
       unnest(generate_series(datetime + INTERVAL 1 MINUTE,
                              coalesce(next_ts - INTERVAL 1 MINUTE, datetime),
                              INTERVAL 1 MINUTE)) AS g(gap_ts)
  WHERE next_ts IS NOT NULL
)
SELECT datetime, open, high, low, close, volume, reason FROM consensus_audit
UNION ALL
SELECT datetime, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
       'gap_bridged_flat' AS reason
FROM gaps
"""


@register("hybrid_pipeline_audit", _HYBRID_AUDIT_ORACLE)
def q_hybrid_pipeline_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The forensic audit log of the flagship pipeline run — the
    reference's observable-correctness channel (SURVEY.md §5.2):
    reason-tagged anomaly rows from every cleaning stage."""
    from institutional_fx_etl_spark.plans.pipeline import HybridMergerSpark

    m1, ticks = _pipeline_inputs(spark, sf_dir)
    eng = HybridMergerSpark(spike_threshold=1e9, consensus_threshold=50.0)
    _final, audit = eng.run(m1, ticks)
    return audit


@register("hybrid_pipeline_chunked", _HYBRID_PIPELINE_ORACLE)
def q_hybrid_pipeline_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship under the fused chunked window engine: same stages,
    same oracle, but NO full-series single-partition sort — the clean
    stages run as survivor-conditional running windows over ONE chunk
    sort, densify over a second survivor-only sort, with broadcast
    cross-chunk carries (plans/pipeline_fused.py). This is the
    single-symbol 100 TB path (the vanilla path's one-task window
    buffer dies with GC-overflow at ~56M candles — tools/
    scale_sanity.py --years=150); must hash-match the vanilla
    pipeline's oracle bit-for-bit."""
    from institutional_fx_etl_spark.plans.pipeline import HybridMergerSpark
    from institutional_fx_etl_spark.plans.pipeline_fused import merge_fused

    m1, ticks = _pipeline_inputs(spark, sf_dir)
    eng = HybridMergerSpark(spike_threshold=1e9, consensus_threshold=50.0)
    final, _audit = merge_fused(
        m1,
        eng.resample_ticks(ticks),
        spike_threshold=1e9,
        consensus_threshold=50.0,
        chunk_seconds=6 * 3600,
    )
    return final


#: Re-delivery oracle: the full-pipeline oracle with (a) M1 confined
#: to the first 40% of the event span and ticks to the last 40% — the
#: r3 falsifying-example shape, where the days below the incremental
#: overwrite boundary hold M1 data but NO candles, so a bounded
#: recompute must re-anchor the boundary-day flat bridge from M1
#: context days — and (b) the pre-cut tick slice UNION ALL'd twice:
#: update 3 re-delivers update 1's batch verbatim, and the module
#: contract is equivalence to a from-scratch run over the
#: CONCATENATION of delivered batches (exact-duplicate ticks double
#: candle volume; OHLC/spread averages are unchanged).
_INCREMENTAL_ORACLE = _HYBRID_PIPELINE_ORACLE.replace(
    """WITH ticks0 AS (
  SELECT ts AS datetime, value + 0.01 AS ask, value - 0.01 AS bid
  FROM events WHERE event_type IN ('click', 'view', 'purchase')
),""",
    """WITH cuts AS (
  SELECT to_timestamp(CAST(floor((lo + 0.4 * (hi - lo)) / 86400.0)
                           * 86400 AS BIGINT)) AS m1_hi,
         to_timestamp(CAST(floor((lo + 0.6 * (hi - lo)) / 86400.0)
                           * 86400 AS BIGINT)) AS tick_lo,
         to_timestamp(CAST(floor((lo + 0.8 * (hi - lo)) / 86400.0)
                           * 86400 AS BIGINT)) AS mid_cut
  FROM (SELECT CAST(epoch(min(ts)) AS DOUBLE) AS lo,
               CAST(epoch(max(ts)) AS DOUBLE) AS hi FROM events)
),
ticks_win AS (
  SELECT ts AS datetime, value + 0.01 AS ask, value - 0.01 AS bid
  FROM events, cuts
  WHERE event_type IN ('click', 'view', 'purchase') AND ts >= cuts.tick_lo
),
ticks0 AS (
  SELECT * FROM ticks_win
  UNION ALL
  SELECT t.* FROM ticks_win t, cuts WHERE t.datetime < cuts.mid_cut
),""",
).replace(
    """m1src AS (
  SELECT ts AS datetime, value + 0.02 AS ask, value - 0.02 AS bid
  FROM events WHERE event_type IN ('signup', 'error')
),""",
    """m1src AS (
  SELECT ts AS datetime, value + 0.02 AS ask, value - 0.02 AS bid
  FROM events, cuts
  WHERE event_type IN ('signup', 'error') AND ts < cuts.m1_hi
),""",
)
assert "ticks_win" in _INCREMENTAL_ORACLE and "m1_hi" in _INCREMENTAL_ORACLE, (
    "oracle CTE substitution drifted from _HYBRID_PIPELINE_ORACLE"
)


@register("incremental_merge", _INCREMENTAL_ORACLE)
def q_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental late-data recompute (plans/incremental.py) under
    BATCH RE-DELIVERY: m1 covers only the early 40% of the event span,
    ticks only the late 40% (a multi-day m1-only gap below the first
    tick day — the r3 falsifying-example shape); three ``update()``
    calls deliver the pre-cut tick slice, the post-cut slice, then the
    pre-cut slice AGAIN. Returns the ENTIRE resulting state
    (``read_final()``) — the oracle is the full from-scratch pipeline
    over the concatenation (re-delivered slice doubled), so the hash
    proves both the union-semantics contract and that the mid-history
    re-delivery regrew the boundary day's flat bridge instead of
    truncating it (the r3 bug the driver's append-only sequence could
    not see)."""
    import shutil

    from institutional_fx_etl_spark.plans.incremental import (
        IncrementalHybridPipeline,
        fresh_state_dir,
    )

    m1_all, ticks_all = _pipeline_inputs(spark, sf_dir)
    events = load_table(spark, sf_dir, "events")
    lo, hi = events.agg(
        F.min(epoch_seconds("ts")), F.max(epoch_seconds("ts"))
    ).first()

    def day_cut(frac: float):
        return F.timestamp_seconds(
            F.lit(int((lo + frac * (hi - lo)) // 86400.0) * 86400)
        )

    m1 = m1_all.filter(F.col("datetime") < day_cut(0.4))
    ticks = ticks_all.filter(F.col("datetime") >= day_cut(0.6))
    b1 = ticks.filter(F.col("datetime") < day_cut(0.8))
    b2 = ticks.filter(F.col("datetime") >= day_cut(0.8))

    state = fresh_state_dir()
    try:
        inc = IncrementalHybridPipeline(
            spark,
            state,
            spike_threshold=1e9,
            consensus_threshold=50.0,
            chunk_seconds=6 * 3600,
        )
        inc.update(m1, b1)
        inc.update(m1, b2)
        inc.update(m1, b1)  # re-delivery: mid-history, behind old_max
        out = inc.read_final()
        # state files go with the scratch dir — materialize first
        out = out.localCheckpoint(eager=True)
        return out
    finally:
        shutil.rmtree(state, ignore_errors=True)


def _clean_fixture_frames(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
    """Deterministic 360-minute candle fixture where every cleaning-stage
    predicate provably fires (the flagship runs with the spike stage
    disabled because the synthetic events are volatile by design —
    this fixture is the exact-oracle proof of the F4/F5/F6 interplay).

    All values are dyadic rationals (multiples of 1/16) so every
    comparison and greatest/least is bit-exact in both engines. Special
    rows by modular residue (precedence catastrophe > inverted >
    structure > spike > normal, mirrored in the oracle's CASE):

    - ``i % 37 == 5`` and both sides present → tick close deviates +30
      from M1 (> consensus θ=15) → ``rejected_tick_catastrophe``.
    - ``i % 41 == 7`` → low > high → ``dropped_inverted`` (F4).
    - ``i % 43 == 11`` → open > high → ``fixed_structure_integrity`` (F5).
    - ``i % 53 == 17`` → close jumps +10 (~0.1 > spike θ=0.05, < θ_c=15
      so it SURVIVES consensus) → ``dropped_volatility_spike`` (F6) —
      and the next surviving row is dropped too by the jump-back, the
      lag-predicate interplay the fixture exists to pin.
    - ``i % 29 == 3`` → absent from BOTH sides → ``gap_bridged_flat``.
    """
    i = F.col("i")
    base = F.lit(100.0) + (i % 50).cast("double") * F.lit(0.0625)
    present_t = ~((i % 29 == 3) | (i % 23 == 4))
    present_m = ~((i % 29 == 3) | (i % 19 == 2))
    cat = (
        F.when((i % 37 == 5) & present_t & present_m, F.lit("c"))
        .when(i % 41 == 7, F.lit("i"))
        .when(i % 43 == 11, F.lit("b"))
        .when(i % 53 == 17, F.lit("s"))
        .otherwise(F.lit("n"))
    )
    rows = (
        spark.range(360)
        .select(F.col("id").cast("int").alias("i"))
        .select(
            "i",
            F.expr(
                "timestamp'2024-01-02 00:00:00' + make_dt_interval(0, 0, i, 0)"
            ).alias("datetime"),
            base.alias("b"),
            cat.alias("c"),
            present_t.alias("pt"),
            present_m.alias("pm"),
        )
    )
    b, c = F.col("b"), F.col("c")
    ticks = rows.filter("pt").select(
        "datetime",
        F.when(c == "b", b + 1.0).otherwise(b).alias("open"),
        F.when(c == "c", b + 30.25)
        .when(c == "i", b - 1.0)
        .when(c == "s", b + 10.25)
        .otherwise(b + 0.25)
        .alias("high"),
        F.when(c == "i", b + 1.0).otherwise(b - 0.25).alias("low"),
        F.when(c == "c", b + 30.0)
        .when(c == "s", b + 10.0)
        .otherwise(b + 0.125)
        .alias("close"),
        (i % 7 + 1).cast("double").alias("volume"),
        F.lit(0.03125).alias("spread"),
    )
    m1 = rows.filter("pm").select(
        "datetime",
        (b + 0.0625).alias("open"),
        (b + 0.3125).alias("high"),
        (b - 0.3125).alias("low"),
        (b + 0.1875).alias("close"),
        (i % 5 + 1).cast("double").alias("volume"),
        F.lit(None).cast("double").alias("spread"),
    )
    return m1, ticks


#: Cleaning-stage audit oracle: the same fixture generated by
#: generate_series, pushed through the consensus → F4 → F5 → F6 →
#: densify chain; emits the audit rows. Spread is deliberately absent:
#: no audit column depends on it (OHLCV only), so the oracle pins the
#: drop/fix/bridge semantics without re-deriving the smoother.
_CLEAN_FIXTURE_ORACLE = """
WITH idx AS (SELECT unnest(generate_series(0, 359)) AS i),
rows_ AS (
  SELECT i,
         TIMESTAMP '2024-01-02 00:00:00' + INTERVAL 1 MINUTE * i AS datetime,
         100.0 + (i % 50) * 0.0625 AS b,
         NOT (i % 29 = 3 OR i % 23 = 4) AS pt,
         NOT (i % 29 = 3 OR i % 19 = 2) AS pm,
         CASE WHEN i % 37 = 5 AND NOT (i % 29 = 3 OR i % 23 = 4)
                   AND NOT (i % 29 = 3 OR i % 19 = 2) THEN 'c'
              WHEN i % 41 = 7 THEN 'i'
              WHEN i % 43 = 11 THEN 'b'
              WHEN i % 53 = 17 THEN 's'
              ELSE 'n' END AS c
  FROM idx),
ticks AS (
  SELECT datetime,
         CASE WHEN c = 'b' THEN b + 1.0 ELSE b END AS open,
         CASE WHEN c = 'c' THEN b + 30.25 WHEN c = 'i' THEN b - 1.0
              WHEN c = 's' THEN b + 10.25 ELSE b + 0.25 END AS high,
         CASE WHEN c = 'i' THEN b + 1.0 ELSE b - 0.25 END AS low,
         CASE WHEN c = 'c' THEN b + 30.0 WHEN c = 's' THEN b + 10.0
              ELSE b + 0.125 END AS close,
         CAST(i % 7 + 1 AS DOUBLE) AS volume
  FROM rows_ WHERE pt),
m1 AS (
  SELECT datetime, b + 0.0625 AS open, b + 0.3125 AS high,
         b - 0.3125 AS low, b + 0.1875 AS close,
         CAST(i % 5 + 1 AS DOUBLE) AS volume
  FROM rows_ WHERE pm),
aud_consensus AS (
  SELECT t.datetime, t.open, t.high, t.low, t.close, t.volume,
         'rejected_tick_catastrophe' AS reason
  FROM ticks t JOIN m1 ON t.datetime = m1.datetime
  WHERE abs(t.close - m1.close) > 15.0),
kept AS (
  SELECT t.* FROM ticks t LEFT JOIN m1 ON t.datetime = m1.datetime
  WHERE NOT coalesce(abs(t.close - m1.close) > 15.0, false)),
merged AS (
  SELECT coalesce(k.datetime, m1.datetime) AS datetime,
         coalesce(k.open, m1.open) AS open,
         coalesce(k.high, m1.high) AS high,
         coalesce(k.low, m1.low) AS low,
         coalesce(k.close, m1.close) AS close,
         coalesce(k.volume, m1.volume) AS volume
  FROM kept k FULL OUTER JOIN m1 ON k.datetime = m1.datetime),
aud_inverted AS (
  SELECT datetime, open, high, low, close, volume,
         'dropped_inverted' AS reason
  FROM merged WHERE coalesce(low > high, false)),
flagged AS (
  SELECT *, coalesce(open > high OR open < low
                     OR close > high OR close < low, false) AS bad
  FROM merged WHERE NOT coalesce(low > high, false)),
aud_structure AS (
  SELECT datetime, open, high, low, close, volume,
         'fixed_structure_integrity' AS reason
  FROM flagged WHERE bad),
fixed AS (
  SELECT datetime, open,
         CASE WHEN bad THEN greatest(open, close, high) ELSE high END AS high,
         CASE WHEN bad THEN least(open, close, low) ELSE low END AS low,
         close, volume
  FROM flagged),
spiked AS (
  SELECT *,
         coalesce((high - low) / open > 0.05, false)
         OR coalesce(abs((close - lag(close) OVER (ORDER BY datetime))
                         / lag(close) OVER (ORDER BY datetime)) > 0.05,
                     false) AS spike
  FROM fixed),
aud_spike AS (
  SELECT datetime, open, high, low, close, volume,
         'dropped_volatility_spike' AS reason
  FROM spiked WHERE spike),
clean AS (SELECT * FROM spiked WHERE NOT spike),
bounds AS (SELECT min(datetime) AS t0, max(datetime) AS t1 FROM clean),
spine AS (
  SELECT unnest(generate_series(t0, t1, INTERVAL 1 MINUTE)) AS datetime
  FROM bounds),
aud_gap AS (
  SELECT s.datetime, CAST(NULL AS DOUBLE) AS open,
         CAST(NULL AS DOUBLE) AS high, CAST(NULL AS DOUBLE) AS low,
         CAST(NULL AS DOUBLE) AS close, CAST(NULL AS DOUBLE) AS volume,
         'gap_bridged_flat' AS reason
  FROM spine s LEFT JOIN clean c ON s.datetime = c.datetime
  WHERE c.close IS NULL)
SELECT * FROM aud_consensus
UNION ALL SELECT * FROM aud_inverted
UNION ALL SELECT * FROM aud_structure
UNION ALL SELECT * FROM aud_spike
UNION ALL SELECT * FROM aud_gap
"""


@register("pipeline_clean_fixture", _CLEAN_FIXTURE_ORACLE)
def q_pipeline_clean_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cleaning stages under an EXACT oracle with every threshold live
    (consensus θ=15, spike θ=0.05 — reference predicates at
    hybrid_merger.py:145-173,188-199): all five audit reason tags fire
    and hash-match, including the F6 lag-predicate interplay (a spike
    row also knocks out its successor) and F4-before-F5-before-F6
    ordering. Input tables are unused: the fixture self-generates so the
    planted anomalies are bit-exact in both engines."""
    from institutional_fx_etl_spark.plans.pipeline import HybridMergerSpark

    m1, ticks = _clean_fixture_frames(spark)
    eng = HybridMergerSpark(spike_threshold=0.05, consensus_threshold=15.0)
    _final, audit = eng.merge(m1, ticks)
    return audit


@register("pipeline_clean_fixture_fused", _CLEAN_FIXTURE_ORACLE)
def q_pipeline_clean_fixture_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME live-threshold cleaning fixture and exact oracle as
    ``pipeline_clean_fixture``, but through the fused chunked engine
    (plans/pipeline_fused.py) — so the 100 TB path's F4/F5/F6/F7 stages
    (survivor-conditional running windows + cross-chunk carries) are
    driver-hash-checked with every threshold live, not only
    pytest-equivalence-checked against the vanilla engine. A small
    ``chunk_seconds`` forces several chunk boundaries through the
    planted anomalies, so the carry path itself is under the oracle."""
    from institutional_fx_etl_spark.plans.pipeline_fused import merge_fused

    m1, ticks = _clean_fixture_frames(spark)
    _final, audit = merge_fused(
        m1,
        ticks,
        spike_threshold=0.05,
        consensus_threshold=15.0,
        chunk_seconds=1800,
    )
    return audit


# ---------------------------------------------------------------------
# Round-4 additions: non-equi range join, skew-salted aggregation,
# exact quantiles, repetition quality signals, TF-IDF key terms
# ---------------------------------------------------------------------


@register(
    "range_join_banded",
    """
    SELECT e1.user_id AS key, e1.event_id AS id_a, e2.event_id AS id_b,
           round(epoch(e2.ts) - epoch(e1.ts), 6) AS dt_sec
    FROM events e1 JOIN events e2
      ON e1.user_id = e2.user_id AND e1.event_id < e2.event_id
     AND abs(epoch(e2.ts) - epoch(e1.ts)) <= 3600
    """,
)
def q_range_join_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval self-join (same-user event pairs within one hour)
    WITHOUT the cartesian plan a naive BETWEEN join gets: timestamps
    quantize into ε-wide bands, candidates equi-join on (user, band)
    and (user, band+1), the exact |Δt| ≤ ε predicate verifies — the
    banded range-join pattern (operators/rangejoin.py). The oracle IS
    the naive quadratic join, proving band+verify loses no pairs."""
    from institutional_fx_etl_spark.operators.rangejoin import banded_self_pairs

    events = load_table(spark, sf_dir, "events")
    return banded_self_pairs(
        events,
        ts_col="ts",
        key_col="user_id",
        id_col="event_id",
        band_seconds=3600,
    )


@register(
    "skew_salted_agg",
    """
    SELECT l_suppkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           count(*) AS n_items,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price
    FROM lineitem GROUP BY l_suppkey
    """,
)
def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (functions/skew.py::salted_agg):
    per-key partials on (key, salt) recombine per key — a hot key's
    rows reduce in 16 parallel partitions instead of one. The oracle is
    the DIRECT group-by, proving the salting is value-transparent; the
    decimal-sum trick keeps the re-associated sum bit-exact."""
    from institutional_fx_etl_spark.functions.skew import salted_agg

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "__qty_dec", F.col("l_quantity").cast("decimal(18,2)")
    )
    out = salted_agg(
        li,
        ["l_suppkey"],
        {
            "sum_qty": ("sum", "__qty_dec"),
            "n_items": ("count", "*"),
            "min_price": ("min", "l_extendedprice"),
            "max_price": ("max", "l_extendedprice"),
        },
        factor=16,
    )
    return out.select(
        "l_suppkey",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        "n_items",
        "min_price",
        "max_price",
    )


@register(
    "exact_quantiles",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.25), 6) AS q25,
           round(quantile_cont(value, 0.50), 6) AS q50,
           round(quantile_cont(value, 0.75), 6) AS q75,
           round(quantile_cont(value, 0.99), 6) AS q99
    FROM events GROUP BY event_type
    """,
)
def q_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group EXACT interpolated quantiles (Spark ``percentile`` ↔
    DuckDB ``quantile_cont`` — same linear interpolation). Exactness
    costs a per-group sort of the values; at 100 TB swap in
    ``percentile_approx`` (t-digest sketch, mergeable map-side) when
    the use case tolerates bounded error — same plan shape, no sort."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        *[
            F.round(F.expr(f"percentile(value, {p})"), 6).alias(name)
            for name, p in [
                ("q25", 0.25),
                ("q50", 0.50),
                ("q75", 0.75),
                ("q99", 0.99),
            ]
        ]
    )


@register(
    "text_repetition",
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
      FROM documents
    ),
    b AS (
      SELECT doc_id, toks,
             CASE WHEN len(toks) >= 2 THEN
               list_transform(range(1, len(toks)),
                              i -> concat_ws(' ', toks[i], toks[i+1]))
             ELSE [] END AS bi
      FROM t
    )
    SELECT doc_id,
           CAST(len(bi) AS INTEGER) AS n_bigrams,
           CAST(len(list_distinct(bi)) AS INTEGER) AS n_distinct_bigrams,
           CASE WHEN len(bi) <= 0 THEN 0.0 ELSE
             round(1.0 - CAST(len(list_distinct(bi)) AS DOUBLE) / len(bi), 6)
           END AS rep_ratio,
           round(CAST(list_max(list_transform(list_distinct(toks),
                   tk -> len(list_filter(toks, x -> x = tk)))) AS DOUBLE)
                 / len(toks), 6) AS top_token_share
    FROM b
    """,
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signals (duplicate-bigram fraction + top-token
    share — the Gopher-style boilerplate/spam heuristics) per document,
    as pure scan-side array expressions (operators/text.py::
    repetition_stats)."""
    from institutional_fx_etl_spark.operators.text import repetition_stats

    docs = load_table(spark, sf_dir, "documents")
    return repetition_stats(docs).select(
        "doc_id",
        "n_bigrams",
        "n_distinct_bigrams",
        "rep_ratio",
        "top_token_share",
    )


@register(
    "tfidf_topterms",
    r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(text), '\s+')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
           GROUP BY doc_id, term),
    dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
             round(tf.tf * ln((n.n_docs + 1.0) / (dfq.df + 1.0)), 6) AS tfidf
      FROM tf JOIN dfq USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, CAST(tf AS INTEGER) AS tf,
           CAST(df AS INTEGER) AS df, tfidf,
           CAST(row_number() OVER (PARTITION BY doc_id
                ORDER BY tfidf DESC, term) AS INTEGER) AS rk
    FROM scored QUALIFY rk <= 3
    """,
)
def q_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 characteristic terms by smoothed TF-IDF —
    two hash aggregates (doc-term counts, then vocabulary-bounded
    document frequency), a broadcast scalar N, and a per-doc window
    top-k (operators/text.py::tfidf_top_terms)."""
    from institutional_fx_etl_spark.operators.text import tfidf_top_terms

    docs = load_table(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, k=3)


@register(
    "dedup_stats",
    f"""
    WITH sizes AS (
      SELECT comp, count(*) AS sz
      FROM ({REGISTRY["dedup_clusters"][1]})
      GROUP BY comp
    )
    SELECT CAST(sz AS BIGINT) AS cluster_size,
           count(*) AS n_clusters
    FROM sizes GROUP BY sz
    """,
)
def q_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup yield reporting: the cluster-size histogram of the
    near-dup graph (how much of the corpus is singleton vs grouped —
    the number a dedup run is judged by). One extra pair of hash
    aggregates over the CC labels; the oracle wraps the dedup_clusters
    recursive-CTE oracle."""
    from institutional_fx_etl_spark.operators.dedup import (
        dedup_clusters,
        minhash_lsh_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, jaccard_threshold=0.2)
    clusters = dedup_clusters(docs.select("doc_id"), pairs)
    return (
        clusters.groupBy("comp")
        .agg(F.count(F.lit(1)).alias("sz"))
        .groupBy(F.col("sz").alias("cluster_size"))
        .agg(F.count(F.lit(1)).alias("n_clusters"))
    )


@register(
    "corpus_filter_report",
    r"""
    WITH t AS (
      SELECT doc_id, text, string_split_regex(lower(text), '\s+') AS toks
      FROM documents
    ),
    s AS (
      SELECT doc_id, toks,
             len(toks) AS n_tokens,
             CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
               / length(text) AS punct_ratio,
             CAST(len(list_filter(toks, tk -> tk IN
               ('the','and','of','to','a','in','is'))) AS DOUBLE) / len(toks)
               AS stopword_ratio,
             CASE WHEN len(toks) >= 2 THEN
               list_transform(range(1, len(toks)),
                              i -> concat_ws(' ', toks[i], toks[i+1]))
             ELSE [] END AS bi
      FROM t
    ),
    s2 AS (
      SELECT *,
             CASE WHEN len(bi) <= 0 THEN 0.0 ELSE
               round(1.0 - CAST(len(list_distinct(bi)) AS DOUBLE) / len(bi), 6)
             END AS rep_ratio
      FROM s
    ),
    agg AS (
      SELECT count(*) AS n_docs,
             SUM(CASE WHEN n_tokens < 50 THEN 1 ELSE 0 END) AS f_short,
             SUM(CASE WHEN stopword_ratio < 0.05 THEN 1 ELSE 0 END) AS f_stop,
             SUM(CASE WHEN punct_ratio > 0.05 THEN 1 ELSE 0 END) AS f_punct,
             SUM(CASE WHEN rep_ratio > 0.3 THEN 1 ELSE 0 END) AS f_rep
      FROM s2
    )
    SELECT rule, CAST(n_failed AS BIGINT) AS n_failed,
           CAST(n_docs AS BIGINT) AS n_docs
    FROM (
      SELECT 'too_short' AS rule, f_short AS n_failed, n_docs FROM agg
      UNION ALL
      SELECT 'low_stopword', f_stop, n_docs FROM agg
      UNION ALL
      SELECT 'high_punct', f_punct, n_docs FROM agg
      UNION ALL
      SELECT 'high_repetition', f_rep, n_docs FROM agg
    )
    """,
)
def q_corpus_filter_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-rule rejection counts for a Gopher-style corpus filter
    (length / stopword fluency / punctuation noise / bigram
    repetition) — the acceptance report a training-data pipeline
    publishes before committing a filter config. One scan, conditional
    partial sums, a 4-row unpivot; all ratios derive from integer
    counts, so the threshold comparisons are bit-identical across
    engines."""
    from institutional_fx_etl_spark.operators.text import (
        quality_score,
        repetition_stats,
    )

    docs = load_table(spark, sf_dir, "documents")
    sig = repetition_stats(quality_score(docs))
    agg = sig.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("n_tokens") < 50).cast("long")).alias("f_short"),
        F.sum((F.col("stopword_ratio") < 0.05).cast("long")).alias("f_stop"),
        F.sum((F.col("punct_ratio") > 0.05).cast("long")).alias("f_punct"),
        F.sum((F.col("rep_ratio") > 0.3).cast("long")).alias("f_rep"),
    )
    return agg.selectExpr(
        "stack(4, 'too_short', f_short, 'low_stopword', f_stop,"
        " 'high_punct', f_punct, 'high_repetition', f_rep)"
        " AS (rule, n_failed)",
        "n_docs",
    )


#: the multisym flagship oracle over an INCREMENTAL delivery: batches
#: split by time AND symbol (S2/S3 idle after the cut; S2's pre-cut
#: slice re-delivered), so the union doubles S2's early ticks and
#: excludes S2/S3's late ones — exactly what the per-key incremental
#: engine must reproduce.
_INCREMENTAL_MULTISYM_ORACLE = _HYBRID_MULTISYM_ORACLE.replace(
    """WITH ticks0 AS (
  SELECT concat('S', user_id % 4) AS symbol, ts AS datetime,
         value + 0.01 AS ask, value - 0.01 AS bid
  FROM events WHERE event_type IN ('click', 'view', 'purchase')
),""",
    """WITH cuts AS (
  SELECT to_timestamp(CAST(floor((lo + 0.8 * (hi - lo)) / 86400.0)
                           * 86400 AS BIGINT)) AS mid_cut
  FROM (SELECT CAST(epoch(min(ts)) AS DOUBLE) AS lo,
               CAST(epoch(max(ts)) AS DOUBLE) AS hi FROM events)
),
ticks_all AS (
  SELECT concat('S', user_id % 4) AS symbol, ts AS datetime,
         value + 0.01 AS ask, value - 0.01 AS bid
  FROM events WHERE event_type IN ('click', 'view', 'purchase')
),
ticks0 AS (
  SELECT t.* FROM ticks_all t, cuts
  WHERE t.datetime < cuts.mid_cut OR t.symbol IN ('S0', 'S1')
  UNION ALL
  SELECT t.* FROM ticks_all t, cuts
  WHERE t.datetime < cuts.mid_cut AND t.symbol = 'S2'
),""",
)
assert "ticks_all" in _INCREMENTAL_MULTISYM_ORACLE, (
    "oracle CTE substitution drifted from _HYBRID_MULTISYM_ORACLE"
)


@register("incremental_merge_multisym", _INCREMENTAL_MULTISYM_ORACLE)
def q_incremental_merge_multisym(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental engine under ``partition_cols=('symbol',)`` —
    the multi-asset late-data shape: batch 1 delivers every symbol's
    pre-cut ticks, batch 2 appends post-cut ticks for S0/S1 only
    (S2/S3 idle — per-key boundaries), batch 3 RE-DELIVERS S2's
    pre-cut slice (mid-history re-delivery for one key). The oracle is
    the from-scratch multisym pipeline over the union (S2's early
    ticks doubled), so the hash proves per-key boundary math, per-key
    scalar state and the day-level overwrite all compose."""
    import shutil

    from institutional_fx_etl_spark.plans.incremental import (
        IncrementalHybridPipeline,
        fresh_state_dir,
    )

    events = load_table(spark, sf_dir, "events")
    lo, hi = events.agg(
        F.min(epoch_seconds("ts")), F.max(epoch_seconds("ts"))
    ).first()
    mid_cut = F.timestamp_seconds(
        F.lit(int((lo + 0.8 * (hi - lo)) // 86400.0) * 86400)
    )
    sym = F.concat(F.lit("S"), (F.col("user_id") % 4).cast("string"))
    ticks = events.filter(
        F.col("event_type").isin("click", "view", "purchase")
    ).select(
        sym.alias("symbol"),
        F.col("ts").alias("datetime"),
        (F.col("value") + 0.01).alias("ask"),
        (F.col("value") - 0.01).alias("bid"),
    )
    m1_src = events.filter(F.col("event_type").isin("signup", "error")).select(
        sym.alias("symbol"),
        F.col("ts").alias("datetime"),
        (F.col("value") + 0.02).alias("ask"),
        (F.col("value") - 0.02).alias("bid"),
    )
    m1 = ticks_to_candles(m1_src, partition_cols=("symbol",)).withColumn(
        "spread", F.lit(None).cast("double")
    )
    b1 = ticks.filter(F.col("datetime") < mid_cut)
    b2 = ticks.filter(
        (F.col("datetime") >= mid_cut) & F.col("symbol").isin("S0", "S1")
    )
    b3 = b1.filter(F.col("symbol") == "S2")

    state = fresh_state_dir()
    try:
        inc = IncrementalHybridPipeline(
            spark,
            state,
            spike_threshold=1e9,
            consensus_threshold=50.0,
            chunk_seconds=6 * 3600,
            partition_cols=("symbol",),
        )
        inc.update(m1, b1)
        inc.update(m1, b2)
        inc.update(m1, b3)
        out = inc.read_final()
        out = out.localCheckpoint(eager=True)
        return out
    finally:
        shutil.rmtree(state, ignore_errors=True)


@register(
    "range_frame_window",
    """
    SELECT event_id, user_id, ts,
           count(*) OVER w AS n_1h,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_1h,
           max(value) OVER w AS max_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def q_range_frame_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame windows (trailing 1-hour per-user aggregates) — the
    time-interval frame family ROWS frames can't express: the frame is
    bounded by the ORDER value, so equal-timestamp peers are all in
    frame and gaps shrink it. Spark side orders by epoch MICROseconds
    as long (exact in double below 2^53) with the equivalent numeric
    range; the decimal-sum trick keeps the sliding sum bit-identical."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    e_us = (epoch_seconds("ts") * 1_000_000).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("__e"))
        .rangeBetween(-3600 * 1_000_000, 0)
    )
    return (
        ev.withColumn("__e", e_us)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.count(F.lit(1)).over(w).alias("n_1h"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .over(w)
            .cast("double")
            .alias("sum_1h"),
            F.max("value").over(w).alias("max_1h"),
        )
    )


@register(
    "asof_join_tolerance",
    """
    WITH trades AS (
      SELECT event_id, ts, value FROM events WHERE event_type = 'purchase'
    ),
    quotes AS (
      SELECT ts, value AS quote FROM events WHERE event_type = 'view'
    )
    SELECT t.event_id, t.ts, t.value,
           CASE WHEN q.ts IS NOT NULL
                 AND epoch(t.ts) - epoch(q.ts) <= 1800
                THEN q.quote END AS quote_tol,
           CASE WHEN q.ts IS NOT NULL
                 AND epoch(t.ts) - epoch(q.ts) <= 1800
                THEN round(epoch(t.ts) - epoch(q.ts), 6) END AS gap_sec
    FROM trades t ASOF LEFT JOIN quotes q ON t.ts >= q.ts
    """,
)
def q_asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a max-staleness tolerance (pandas
    ``merge_asof(tolerance=...)`` semantics): the nearest preceding
    quote matches only within 30 minutes, else the columns stay NULL —
    the staleness guard every production as-of pipeline needs. Built
    as the plain as-of join plus a conditional null-out; the matched
    right timestamp rides along as an ordinary right column."""
    from institutional_fx_etl_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    trades = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "value"
    )
    quotes = ev.filter(F.col("event_type") == "view").select(
        "ts", F.col("value").alias("quote"), F.col("ts").alias("qts")
    )
    joined = asof_join(
        trades, quotes, ts_col="ts", right_cols=("quote", "qts")
    )
    gap = epoch_seconds("ts") - epoch_seconds("qts_asof")
    ok = F.col("qts_asof").isNotNull() & (gap <= 1800)
    return joined.select(
        "event_id",
        "ts",
        "value",
        F.when(ok, F.col("quote_asof")).alias("quote_tol"),
        F.when(ok, F.round(gap, 6)).alias("gap_sec"),
    )


@register(
    "rank_distributions",
    """
    SELECT l_orderkey, l_linenumber, l_returnflag,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist() OVER w, 6) AS cd,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile
    FROM lineitem
    WINDOW w AS (PARTITION BY l_returnflag
                 ORDER BY l_extendedprice, l_orderkey, l_linenumber)
    """,
)
def q_rank_distributions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank window family (percent_rank / cume_dist /
    ntile) per group — the normalized-rank surface the top-k queries
    don't cover. Total-order tiebreak keeps every rank value
    engine-identical."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
    )


def sketch_stats_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw mergeable-sketch report — HyperLogLog++ distinct users
    and t-digest quantiles per event type. Both sketches combine
    map-side (one hash aggregate, partial states merge associatively),
    so at 100 TB they cost one scan + a vocabulary-bounded shuffle
    where ``exact_quantiles``' per-group sort and a COUNT(DISTINCT)
    expansion would not. The ESTIMATES are engine-specific by
    construction, so this raw form is not oracle-paired; the
    registered ``sketch_stats`` contract wraps it in the accuracy
    bounds (below), and the pytest gate
    (tests/test_round4_ops.py::test_sketch_accuracy_vs_exact) checks
    the same bounds standalone."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.expr("percentile_approx(value, 0.5, 10000)").alias("approx_p50"),
        F.expr("percentile_approx(value, 0.99, 10000)").alias("approx_p99"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "sketch_stats",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           TRUE AS users_ok, TRUE AS p50_ok, TRUE AS p99_ok
    FROM events GROUP BY event_type
    """,
)
def q_sketch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch accuracy CONTRACT (r9 verdict ask #4 — the one registry
    row that printed ``no_oracle`` every time it rotated into a driver
    window): the HLL++/t-digest sketch report of
    :func:`sketch_stats_raw`, judged in-query against the exact
    answers and emitted as per-group accuracy verdicts the oracle CAN
    pin — ``users_ok`` (|est − exact| ≤ max(2, 5%·exact)),
    ``p50_ok``/``p99_ok`` (the estimate lands between nearby exact
    quantiles — the RANK-error bound, since a t-digest returns an
    actual data value whose rank is within tolerance; in a sparse
    tail the value gap between adjacent ranks can be huge while the
    rank error stays tiny). The oracle asserts TRUE for every group,
    so a driver hash match IS the sketch-accuracy proof — the same
    bounds as the pytest gate, now driver-certified. The exact side
    costs the COUNT(DISTINCT) expand + per-group percentile sort this
    query exists to avoid at 100 TB — users run
    :func:`sketch_stats_raw`; this contract runs both ON PURPOSE."""
    sk = sketch_stats_raw(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    ex = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("nd"),
        F.expr("percentile(value, 0.45)").alias("p45"),
        F.expr("percentile(value, 0.55)").alias("p55"),
        F.expr("percentile(value, 0.97)").alias("p97"),
        F.max("value").alias("pmax"),
    )
    return (
        sk.join(ex, "event_type")
        .selectExpr(
            "event_type",
            "CAST(n_events AS BIGINT) AS n_events",
            "abs(approx_users - nd) <= greatest(2.0D, 0.05D * nd)"
            " AS users_ok",
            "approx_p50 BETWEEN p45 AND p55 AS p50_ok",
            "approx_p99 BETWEEN p97 AND pmax AS p99_ok",
        )
    )


@register(
    "sketch_stats_exact",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           round(quantile_cont(value, 0.50), 6) AS p50,
           round(quantile_cont(value, 0.99), 6) AS p99,
           count(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def q_sketch_stats_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked shadow of ``sketch_stats``: the SAME report
    (distinct users, p50/p99, row count per event type) computed
    exactly — COUNT(DISTINCT) + interpolated ``percentile`` — so the
    sketch query's only-rows driver check is paired with an exact-hash
    row over identical group keys (round-4 verdict ask #6). At 100 TB
    the sketch variant is the plan you run (mergeable map-side
    partials, no expand + no per-group sort); this exact twin is the
    correctness anchor the sketch's pytest accuracy gate
    (test_round4_ops.py::test_sketch_accuracy_vs_exact) compares
    against."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "grouping_sets_agg",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           count(*) AS n,
           CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
           CAST(GROUPING(l_linestatus) AS INT) AS g_ls
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def q_grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping() indicator columns — the
    general multi-granularity form cube/rollup are shorthands for
    (heterogeneous report levels in ONE scan + one partial/final hash
    aggregate instead of a UNION of per-level scans). The decimal-sum
    trick keeps sum_qty bit-identical across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
            F.grouping("l_returnflag").cast("int").alias("g_rf"),
            F.grouping("l_linestatus").cast("int").alias("g_ls"),
        )
    )


@register(
    "bitmap_prune_join",
    """
    SELECT o_orderkey, o_custkey, o_totalprice, c_name
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_nationkey = 3
    """,
)
def q_bitmap_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-side runtime-filter join: a broadcast bitmap of the
    selective dimension's key buckets prunes the orders scan BEFORE
    the shuffle/join (``operators/bloomjoin.py`` — the explicit form
    of Spark's runtime bloom filter), then the exact join removes the
    hash-collision false positives, so the result equals the plain
    inner join the oracle runs."""
    from institutional_fx_etl_spark.operators.bloomjoin import bitmap_prune_join

    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey") == 3)
        .select("c_custkey", "c_name")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    return bitmap_prune_join(
        orders, F.broadcast(cust), "o_custkey", "c_custkey"
    ).select("o_orderkey", "o_custkey", "o_totalprice", "c_name")


@register(
    "funnel_analysis",
    """
    WITH w1 AS (
      SELECT user_id, ts, event_type,
             min(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS t1
      FROM events
    ),
    w2 AS (
      SELECT *, min(CASE WHEN event_type = 'click' AND ts >= t1 THEN ts END)
                  OVER (PARTITION BY user_id) AS t2
      FROM w1
    ),
    w3 AS (
      SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= t2 THEN ts END)
                  OVER (PARTITION BY user_id) AS t3
      FROM w2
    )
    SELECT user_id, max(t1) AS view_ts, max(t2) AS click_ts,
           max(t3) AS purchase_ts,
           CAST(CASE WHEN max(t3) IS NOT NULL THEN 3
                     WHEN max(t2) IS NOT NULL THEN 2
                     WHEN max(t1) IS NOT NULL THEN 1
                     ELSE 0 END AS INT) AS stage
    FROM w3 GROUP BY user_id
    """,
)
def q_funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel per user (first view → first click at
    or after it → first purchase at or after that): the sequential-
    dependency analysis a flat conditional aggregation can't express.
    Three stacked per-user analytic mins — ONE exchange + one sort
    (the window stages share the partitioning, and the final groupBy
    reuses it), no self-joins."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    g = ev.select("user_id", "ts", "event_type").withColumn("t1", t1)
    g = g.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") >= F.col("t1")),
                F.col("ts"),
            )
        ).over(w),
    )
    g = g.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") >= F.col("t2")),
                F.col("ts"),
            )
        ).over(w),
    )
    return g.groupBy("user_id").agg(
        F.max("t1").alias("view_ts"),
        F.max("t2").alias("click_ts"),
        F.max("t3").alias("purchase_ts"),
        F.when(F.max("t3").isNotNull(), 3)
        .when(F.max("t2").isNotNull(), 2)
        .when(F.max("t1").isNotNull(), 1)
        .otherwise(0)
        .cast("int")
        .alias("stage"),
    )


@register(
    "consecutive_streaks",
    """
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    g AS (
      SELECT user_id, d,
             d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                      AS INTEGER) AS grp
      FROM days
    ),
    runs AS (
      SELECT user_id, min(d) AS streak_start, count(*) AS len
      FROM g GROUP BY user_id, grp
    )
    SELECT user_id, CAST(max(len) AS INT) AS best_len,
           CAST(count(*) AS INT) AS n_runs,
           CAST(sum(len) AS INT) AS active_days
    FROM runs GROUP BY user_id
    """,
)
def q_consecutive_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: longest consecutive-active-day streak per
    user via the date-minus-row_number island key — the canonical
    sessionization-on-a-calendar pattern. One exchange: the window,
    both groupBys and the island key all share the user partitioning
    (the island groupBy adds only a local hash, no reshuffle of the
    sorted runs)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    g = days.withColumn("grp", F.date_sub("d", F.row_number().over(w)))
    runs = g.groupBy("user_id", "grp").agg(
        F.min("d").alias("streak_start"), F.count(F.lit(1)).alias("len")
    )
    return runs.groupBy("user_id").agg(
        F.max("len").cast("int").alias("best_len"),
        F.count(F.lit(1)).cast("int").alias("n_runs"),
        F.sum("len").cast("int").alias("active_days"),
    )


@register(
    "streaming_sliding_window",
    """
    WITH e AS (
      SELECT CAST(floor(epoch(ts) / 900) * 900 AS BIGINT) AS b, event_type
      FROM events
    ),
    w AS (
      SELECT make_timestamp((b - k * 900) * 1000000) AS win_start, event_type
      FROM e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) ks
    )
    SELECT win_start, event_type, count(*) AS n
    FROM w GROUP BY win_start, event_type
    """,
)
def q_streaming_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming SLIDING-window counts (1-hour windows
    every 15 minutes — each event lands in exactly 4 overlapping
    windows) driven to completion over the bounded events source in
    complete mode; must equal the batch slide-expansion the oracle
    computes. The tumbling entry can't express overlap — this is the
    trailing-rate/moving-volume family."""
    import tempfile

    from institutional_fx_etl_spark.sources.readers import read_parquet_nanos_safe

    static = read_parquet_nanos_safe(spark, f"{sf_dir}/events.parquet")
    ts_is_long = dict(static.dtypes).get("ts") == "bigint"
    stream = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_expr = (
        F.expr("timestamp_micros(ts div 1000)")
        if ts_is_long
        else F.col("ts").cast("timestamp")
    )
    agg = (
        stream.select(ts_expr.alias("__ts"), "event_type")
        .groupBy(
            F.window("__ts", "1 hour", "15 minutes").alias("__w"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("__w.start").alias("win_start"), "event_type", "n")
    )
    name = f"sliding_q_{abs(hash(sf_dir)) % 10_000}"
    q = _start_stream(
        spark,
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option(
            "checkpointLocation", _stream_tmpdir(prefix="stream_slide_ck_")
        )
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


@register(
    "streaming_stream_join",
    """
    WITH v AS (
      SELECT user_id, ts AS view_ts FROM events WHERE event_type = 'view'
    ),
    p AS (
      SELECT user_id AS p_user, ts AS purchase_ts FROM events
      WHERE event_type = 'purchase'
    )
    SELECT v.user_id, v.view_ts, p.purchase_ts
    FROM v JOIN p ON v.user_id = p.p_user
     AND p.purchase_ts >= v.view_ts
     AND p.purchase_ts <= v.view_ts + INTERVAL 30 MINUTE
    """,
)
def q_streaming_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join: purchases matched to
    every view by the same user in the preceding 30 minutes. Both
    sides carry event-time watermarks and the join predicate bounds
    their skew, so Spark can size and EVICT the join state — the
    attribution-join shape that runs forever on unbounded streams.
    Over the bounded replay it must equal the batch interval join."""
    import tempfile

    from institutional_fx_etl_spark.sources.readers import read_parquet_nanos_safe

    static = read_parquet_nanos_safe(spark, f"{sf_dir}/events.parquet")
    ts_is_long = dict(static.dtypes).get("ts") == "bigint"

    def src():
        stream = (
            spark.readStream.schema(static.schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        ts_expr = (
            F.expr("timestamp_micros(ts div 1000)")
            if ts_is_long
            else F.col("ts").cast("timestamp")
        )
        return stream.select("user_id", "event_type", ts_expr.alias("__ts"))

    views = (
        src()
        .filter(F.col("event_type") == "view")
        .select("user_id", F.col("__ts").alias("view_ts"))
        .withWatermark("view_ts", "1 hour")
    )
    purchases = (
        src()
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("__ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = views.join(
        purchases,
        F.expr(
            """
            user_id = p_user
            AND purchase_ts >= view_ts
            AND purchase_ts <= view_ts + INTERVAL 30 MINUTES
            """
        ),
    ).select("user_id", "view_ts", "purchase_ts")
    name = f"ssj_q_{abs(hash(sf_dir)) % 10_000}"
    q = _start_stream(
        spark,
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option(
            "checkpointLocation", _stream_tmpdir(prefix="stream_ssj_ck_")
        )
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


@register(
    "winnow_fingerprint",
    """
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
      FROM documents
    ),
    f AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 3),
    h AS (
      SELECT doc_id,
             list_transform(range(0, len(toks) - 3 + 1),
               i -> CAST(concat('0x', substr(md5(toks[i+1] || ' ' ||
                    toks[i+2] || ' ' || toks[i+3]), 1, 8)) AS BIGINT)) AS hs
      FROM f
    ),
    w AS (
      SELECT doc_id,
             CASE WHEN len(hs) >= 4
                  THEN list_distinct(list_transform(range(0, len(hs) - 4 + 1),
                         j -> list_min(list_slice(hs, j + 1, j + 4))))
                  ELSE [list_min(hs)] END AS fps
      FROM h
    )
    SELECT doc_id, unnest(fps) AS fp FROM w
    """,
)
def q_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (SIGMOD'03) over the documents corpus:
    min-hash of every 4-shingle window — the position-robust overlap
    fingerprint the single min-shingle in ``text_fingerprint`` is a
    degenerate case of. Scan-side array exprs + one explode; md5-based
    hashes reproduce exactly in the oracle.

    The testdata corpus is ONE small parquet file — one input split —
    and the interpreted higher-order hashing is CPU-bound, so the
    query repartitions the (tiny) text up front to parallelize it. At
    real corpus scale the input has thousands of splits and the
    repartition would be dropped."""
    from institutional_fx_etl_spark.operators.text import winnow_fingerprints

    docs = load_table(spark, sf_dir, "documents").repartition("doc_id")
    return winnow_fingerprints(docs)


@register(
    "decontaminate_ngram",
    """
    WITH corpus AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
      FROM documents WHERE doc_id >= 25
    ),
    bench AS (
      SELECT string_split_regex(lower(text), '\\s+') AS toks
      FROM documents WHERE doc_id < 25
    ),
    bgrams AS (
      SELECT DISTINCT unnest(list_transform(
               range(0, greatest(len(toks) - 5 + 1, 0)),
               i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
                    || ' ' || toks[i+4] || ' ' || toks[i+5])) AS g
      FROM bench
    ),
    cgrams AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(0, greatest(len(toks) - 5 + 1, 0)),
               i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
                    || ' ' || toks[i+4] || ' ' || toks[i+5]))) AS g
      FROM corpus
    ),
    m AS (
      SELECT doc_id, count(*) AS nm FROM cgrams JOIN bgrams USING (g)
      GROUP BY doc_id
    )
    SELECT c.doc_id, CAST(coalesce(m.nm, 0) AS INT) AS n_matched,
           coalesce(m.nm, 0) > 0 AS contaminated
    FROM (SELECT DISTINCT doc_id FROM corpus) c LEFT JOIN m USING (doc_id)
    """,
)
def q_decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs (doc_id >= 25) flagged
    when they share any word 5-gram with the benchmark slice
    (doc_id < 25) — the eval-overlap scrub every pretraining corpus
    needs. The benchmark gram set broadcasts; the corpus explodes
    scan-side into one hash aggregate (no corpus-sized shuffle)."""
    from institutional_fx_etl_spark.operators.text import decontaminate_against

    docs = load_table(spark, sf_dir, "documents")
    return decontaminate_against(
        docs.filter(F.col("doc_id") >= 25),
        docs.filter(F.col("doc_id") < 25),
    )


@register(
    "pii_redact",
    """
    WITH p AS (
      SELECT doc_id,
             text || ' contact u' || CAST(doc_id AS VARCHAR)
                  || '@example.com or +1 555-123-4567 now' AS t
      FROM documents
    ),
    e AS (
      SELECT doc_id,
             regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                            '[EMAIL]', 'g') AS t_no_email,
             CAST(len(regexp_extract_all(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INT)
               AS n_emails
      FROM p
    )
    SELECT doc_id,
           regexp_replace(t_no_email, '\\+?\\d[\\d -]{7,}\\d', '[PHONE]', 'g')
             AS text,
           n_emails,
           CAST(len(regexp_extract_all(t_no_email, '\\+?\\d[\\d -]{7,}\\d'))
                AS INT) AS n_phones
    FROM e
    """,
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing audit: emails/phone-shaped digit runs (planted
    deterministically per doc — the synthetic corpus has none) are
    replaced with [EMAIL]/[PHONE] placeholders and counted. Pure
    codegen'd regexp expressions; patterns are RE2/Java-compatible so
    the oracle applies them verbatim."""
    from institutional_fx_etl_spark.operators.text import pii_redact

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact u"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1 555-123-4567 now"),
        ).alias("text"),
    )
    out = pii_redact(docs)
    return out.select(
        "doc_id",
        "text",
        F.col("n_emails").cast("int").alias("n_emails"),
        F.col("n_phones").cast("int").alias("n_phones"),
    )


@register(
    "winnow_pairs",
    """
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
      FROM documents
    ),
    f AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 3),
    h AS (
      SELECT doc_id,
             list_transform(range(0, len(toks) - 3 + 1),
               i -> CAST(concat('0x', substr(md5(toks[i+1] || ' ' ||
                    toks[i+2] || ' ' || toks[i+3]), 1, 8)) AS BIGINT)) AS hs
      FROM f
    ),
    w AS (
      SELECT doc_id,
             CASE WHEN len(hs) >= 4
                  THEN list_distinct(list_transform(range(0, len(hs) - 4 + 1),
                         j -> list_min(list_slice(hs, j + 1, j + 4))))
                  ELSE [list_min(hs)] END AS fps
      FROM h
    ),
    fp AS (SELECT doc_id, unnest(fps) AS fp FROM w),
    rare AS (
      SELECT fp FROM (SELECT fp, count(*) AS df FROM fp GROUP BY fp)
      WHERE df <= 10
    ),
    fpr AS (SELECT doc_id, fp FROM fp JOIN rare USING (fp)),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
      FROM fpr a JOIN fpr b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, shared FROM pairs WHERE shared >= 3
    """,
)
def q_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlap-pair retrieval from winnowing fingerprints — the use
    winnowing exists for: docs sharing ≥3 selected fingerprints, with
    hot fingerprints (document frequency > 10, boilerplate shingles)
    dropped BEFORE the self-join so pair fan-out is bounded by
    #fingerprints · max_df², not corpus². Same cap strategy as the
    MinHash-LSH band buckets."""
    from institutional_fx_etl_spark.operators.text import winnow_overlap_pairs

    docs = load_table(spark, sf_dir, "documents").repartition("doc_id")
    return winnow_overlap_pairs(docs)


@register(
    "skew_salted_join",
    """
    WITH users AS (
      SELECT user_id, min(ts) AS first_seen FROM events GROUP BY user_id
    )
    SELECT e.event_id, e.user_id, e.value, u.first_seen
    FROM events e JOIN users u USING (user_id)
    """,
)
def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted replicated join (``functions/skew.py::salt_join``): the
    fact side's hot keys are spread across ``factor`` shuffle
    sub-partitions and the small side is replicated to match — the
    standard fix when one join key dominates and the small side is
    still too big to broadcast whole. Deterministic row-hash salt (no
    RNG — stable under task retries); result equals the plain
    equi-join the oracle runs."""
    from institutional_fx_etl_spark.functions.skew import salt_join

    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(F.min("ts").alias("first_seen"))
    fact = ev.select("event_id", "user_id", "value")
    return salt_join(fact, users, ["user_id"], factor=8).select(
        "event_id", "user_id", "value", "first_seen"
    )


@register(
    "doc_chunking",
    """
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
      FROM documents
    ),
    c AS (
      SELECT doc_id, s AS start_tok,
             array_to_string(list_slice(toks, s + 1, s + 64), ' ')
               AS chunk_text,
             least(64, len(toks) - s) AS n_tokens
      FROM t, unnest(range(0, greatest(len(toks), 1), 48)) AS u(s)
    )
    SELECT doc_id, CAST(start_tok AS INT) AS start_tok, chunk_text,
           CAST(n_tokens AS INT) AS n_tokens
    FROM c
    """,
)
def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-window training-sequence chunking (64-token chunks, 48
    stride → 16 overlap) over the documents corpus — the standard
    long-document split every pretraining pipeline runs before
    packing. Scan-side slice+explode, no shuffle."""
    from institutional_fx_etl_spark.operators.text import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs)


@register(
    "candle_resample",
    """
    WITH t AS (
      SELECT ts, value + 0.01 AS ask, value - 0.01 AS bid FROM events
    ),
    t2 AS (
      SELECT ts, (ask + bid) / 2 AS mid, ask FROM t
    ),
    c AS (
      SELECT date_trunc('hour', ts) AS datetime,
             first(mid ORDER BY ts, mid) AS open,
             max(mid) AS high,
             min(mid) AS low,
             last(mid ORDER BY ts, mid) AS close,
             CAST(count(ask) AS DOUBLE) AS volume
      FROM t2 GROUP BY 1
    )
    SELECT CAST(to_timestamp(floor(epoch(datetime) / 14400) * 14400)
                AS TIMESTAMP) AS datetime,
           first(open ORDER BY datetime) AS open,
           max(high) AS high,
           min(low) AS low,
           last(close ORDER BY datetime) AS close,
           SUM(volume) AS volume
    FROM c GROUP BY 1
    """,
)
def q_candle_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 hierarchical rollup: hourly candles re-aggregated to 4-hour
    bars through the mergeable-OHLC partial semantics
    (``operators/ohlc.py::resample_candles``) — the continuous-
    aggregate pattern: the coarse bar reads the candle store, never
    the tick corpus."""
    from institutional_fx_etl_spark.operators.ohlc import resample_candles

    events = load_table(spark, sf_dir, "events")
    ticks = events.select(
        F.col("ts").alias("datetime"),
        (F.col("value") + 0.01).alias("ask"),
        (F.col("value") - 0.01).alias("bid"),
    )
    hourly = ticks_to_candles(ticks, window_duration="1 hour")
    return resample_candles(hourly, window_duration="4 hours")


@register(
    "doc_packing",
    """
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
      FROM documents
    ),
    c AS (
      SELECT doc_id, s AS start_tok,
             least(64, len(toks) - s) AS n_tokens
      FROM t, unnest(range(0, greatest(len(toks), 1), 48)) AS u(s)
    ),
    sh AS (
      SELECT doc_id, CAST(start_tok AS INT) AS start_tok,
             CAST(n_tokens AS INT) AS n_tokens,
             CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),1,8))
                  AS BIGINT) % 64 AS shard
      FROM c
    ),
    w AS (
      SELECT doc_id, start_tok, n_tokens, shard,
             CAST(SUM(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id, start_tok
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) - n_tokens AS pre
      FROM sh
    )
    SELECT doc_id, start_tok, n_tokens, CAST(shard AS INT) AS shard,
           shard * 1099511627776
             + CAST(floor(CAST(pre AS DOUBLE) / 256) AS BIGINT) AS pack_id,
           CAST(pre % 256 AS INT) AS pack_offset
    FROM w
    """,
)
def q_doc_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-and-split sequence packing over the chunked corpus
    (``operators/text.py::pack_chunks``): 256-token training packs
    assembled per md5 shard — the prefix sum runs as one window per
    shard, all shards in parallel, never a global single-partition
    ordering."""
    from institutional_fx_etl_spark.operators.text import (
        chunk_documents,
        pack_chunks,
    )

    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs).drop("chunk_text")
    return pack_chunks(chunks)


@register(
    "text_entropy",
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
      FROM documents
    ),
    f AS (
      SELECT doc_id, len(toks) AS n_tokens, unnest(toks) AS tok
      FROM t WHERE len(toks) >= 1 AND NOT toks = ['']
    ),
    c AS (
      SELECT doc_id, n_tokens, tok, count(*) AS c
      FROM f GROUP BY doc_id, n_tokens, tok
    )
    SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
           CAST(count(*) AS INT) AS n_types,
           round(CAST(count(*) AS DOUBLE) / n_tokens, 6)
             AS type_token_ratio,
           round(log2(CAST(n_tokens AS DOUBLE))
                 - SUM(c * log2(CAST(c AS DOUBLE))) / n_tokens, 6)
             AS entropy
    FROM c GROUP BY doc_id, n_tokens
    """,
)
def q_text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram token entropy + type/token ratio per document — the
    information-density quality signal, computed scan-side from
    run-length-encoded sorted token arrays (no per-(doc, token)
    shuffle; see ``operators/text.py::token_entropy``)."""
    from institutional_fx_etl_spark.operators.text import token_entropy

    docs = load_table(spark, sf_dir, "documents")
    return token_entropy(docs).selectExpr(
        "doc_id",
        "cast(n_tokens as int) AS n_tokens",
        "cast(n_types as int) AS n_types",
        "type_token_ratio",
        "entropy",
    )


@register(
    "emb_centroids",
    """
    WITH d AS (
      SELECT label, u.pos AS pos, u.x AS x
      FROM embeddings,
      unnest(list_transform(range(1, len(embedding)+1),
             i -> struct_pack(pos := i - 1,
                              x := CAST(embedding[i] AS DOUBLE)))) AS t(u)
    ),
    a AS (
      SELECT label, pos,
             SUM(CAST(x AS DECIMAL(27,10))) AS s, count(*) AS n
      FROM d GROUP BY label, pos
    )
    SELECT label,
           array_to_string(
             list(printf('%.6f', round(CAST(s / n AS DOUBLE), 6))
                  ORDER BY pos), ',') AS centroid,
           max(n) AS n_vectors
    FROM a GROUP BY label
    """,
)
def q_emb_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding (the IVF/SemDeDup centroid build) —
    posexplode to (label, dim) partials, ONE vocabulary-bounded
    shuffle, decimal-sum exactness
    (``operators/similarity.py::embedding_centroids``). The contract
    projection prints the centroid as a printf-joined string (the
    repo's array-column compare convention)."""
    from institutional_fx_etl_spark.operators.similarity import (
        embedding_centroids,
    )

    return embedding_centroids(
        load_table(spark, sf_dir, "embeddings")
    ).selectExpr(
        "label",
        "array_join(transform(centroid, x -> format_string('%.6f', x)), ',')"
        " AS centroid",
        "n_vectors",
    )


@register(
    "equidepth_histogram",
    """
    WITH b AS (
      SELECT event_type,
             list_transform(
               quantile_cont(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
               q -> round(q, 6)) AS bounds
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(1 + len(list_filter(b.bounds, x -> e.value > x)) AS INT)
             AS bucket,
           count(*) AS n,
           min(e.value) AS lo,
           max(e.value) AS hi
    FROM events e JOIN b USING (event_type)
    WHERE e.value IS NOT NULL
    GROUP BY e.event_type, bucket
    """,
)
def q_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (decile) histogram per event type: exact
    interpolated-percentile boundaries (rounded 6dp so the bucket
    comparisons are bit-identical across engines), broadcast back, and
    a scan-side bucket assignment + one hash aggregate. No ntile —
    that would sort each event type's full series in ONE window
    partition; this plan is two partial+final aggregates and a
    broadcast join, so it scales with the scan. At 100 TB swap the
    boundary agg to ``percentile_approx`` (same plan, bounded
    memory)."""
    _pin_session_confs(spark)
    ev = load_table(spark, sf_dir, "events").filter("value IS NOT NULL")
    probs = ",".join(str(p / 10) for p in range(1, 10))
    b = ev.groupBy("event_type").agg(
        F.expr(
            f"transform(percentile(value, array({probs})), q -> round(q, 6))"
        ).alias("bounds")
    )
    return (
        ev.join(F.broadcast(b), "event_type")
        .selectExpr(
            "event_type",
            "cast(1 + size(filter(bounds, x -> value > x)) as int) AS bucket",
            "value",
        )
        .groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
    )


@register(
    "linear_interpolate",
    """
    WITH m AS (
      SELECT date_trunc('minute', ts) AS ts,
             round(CAST(SUM(CAST(value AS DECIMAL(27,10))) / count(*)
                   AS DOUBLE), 6) AS v_avg
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    s AS (
      SELECT unnest(generate_series(min(ts), max(ts), INTERVAL 1 MINUTE))
               AS ts
      FROM m
    ),
    g AS (SELECT s.ts, m.v_avg FROM s LEFT JOIN m ON s.ts = m.ts),
    w AS (
      SELECT ts, v_avg,
             last_value(CASE WHEN v_avg IS NOT NULL
                        THEN struct_pack(v := v_avg, t := ts) END IGNORE NULLS)
               OVER (ORDER BY ts
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
             first_value(CASE WHEN v_avg IS NOT NULL
                         THEN struct_pack(v := v_avg, t := ts) END IGNORE NULLS)
               OVER (ORDER BY ts
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nx
      FROM g
    )
    SELECT ts, v_avg,
           floor((CASE WHEN v_avg IS NOT NULL THEN v_avg
                  ELSE p.v + (nx.v - p.v)
                       * ((epoch(ts) - epoch(p.t))
                          / (epoch(nx.t) - epoch(p.t))) END)
                 * 1000000 + 0.5) / 1000000 AS v_filled
    FROM w
    """,
)
def q_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted linear gap interpolation over a sparse per-minute
    series (purchase events on the gapless minute grid): the
    time-spine right join (J4) + ``functions/windows.py::
    interpolate_linear`` — two running-last windows (ASC + DESC), no
    shrinking frames, no self-join. Extends the reference's flat gap
    bridge with the interpolating variant; edges (no neighbour on one
    side) stay NULL by contract."""
    from institutional_fx_etl_spark.functions.timeutils import time_spine
    from institutional_fx_etl_spark.functions.windows import (
        interpolate_linear,
    )

    _pin_session_confs(spark)
    ev = load_table(spark, sf_dir, "events").filter(
        "event_type = 'purchase'"
    )
    m = ev.groupBy(F.date_trunc("minute", "ts").alias("ts")).agg(
        F.round(
            (
                F.sum(F.col("value").cast("decimal(27,10)"))
                / F.count(F.lit(1))
            ).cast("double"),
            6,
        ).alias("v_avg")
    )
    spine = time_spine(m, ts_col="ts", step="1 minute")
    g = spine.join(m, "ts", "left")
    # floor(x·1e6 + 0.5)/1e6 instead of round(x, 6): interpolated
    # values land on exact .5 rounding ties often enough (integral
    # minute weights × 6dp inputs) that engine round() modes diverge;
    # the floor form is bit-identical given identical IEEE inputs
    filled = interpolate_linear("v_avg", ts_col="ts", order_cols=("ts",))
    return g.select(
        "ts",
        "v_avg",
        (F.floor(filled * 1_000_000 + 0.5) / 1_000_000).alias("v_filled"),
    )


@register(
    "dedup_apply",
    None,  # placeholder; real SQL assigned below (wraps the CC oracle)
)
def q_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup application: the KEPT corpus after near-dup
    clustering — a document survives iff it is its cluster's canonical
    representative (min id; singletons keep themselves). Closes the
    loop pairs → clusters → filtered corpus: the relation every
    downstream training-data stage actually consumes. One semi-join
    against the (doc_id = comp) label rows; text stays out of the
    shuffle (labels are ids only)."""
    from institutional_fx_etl_spark.operators.dedup import (
        dedup_clusters,
        minhash_lsh_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, jaccard_threshold=0.2)
    clusters = dedup_clusters(docs.select("doc_id"), pairs)
    keep = clusters.filter(F.col("doc_id") == F.col("comp")).select("doc_id")
    return docs.join(keep, "doc_id", "left_semi").select(
        "doc_id", "lang", "source", "n_chars"
    )


# the dedup_apply oracle wraps the recursive-CTE connected-components
# oracle verbatim (same pattern as dedup_stats)
REGISTRY["dedup_apply"] = (
    REGISTRY["dedup_apply"][0],
    f"""
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d
    JOIN ({REGISTRY["dedup_clusters"][1]}) c ON d.doc_id = c.doc_id
    WHERE c.doc_id = c.comp
    """,
)


@register(
    "corpus_rebalance",
    """
    WITH counts AS (
      SELECT lang, count(*) AS n FROM documents GROUP BY lang
    ),
    tgt AS (SELECT min(n) AS m FROM counts),
    rates AS (
      SELECT lang, CAST(m AS DOUBLE) / n AS rate FROM counts, tgt
    )
    SELECT d.doc_id, d.lang, d.source
    FROM documents d JOIN rates r USING (lang)
    WHERE CAST(concat('0x',
            substr(md5(concat('rebal', CAST(d.doc_id AS VARCHAR))),1,8))
          AS BIGINT) < r.rate * 4294967296
    """,
)
def q_corpus_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-rebalanced corpus sampling: downsample every language
    to the rarest language's count in expectation (the data-mixing
    step of corpus composition). Per-language keep rates from one
    count aggregate, broadcast back; the keep decision is a
    deterministic md5 coin per document, so the sample is reproducible
    across engines, runs, AND partitionings — no rand(), no
    sampleBy-seed drift. Scan-side filter: at 100 TB this is one
    vocabulary-bounded agg + one broadcast join, no corpus shuffle."""
    from institutional_fx_etl_spark.operators.text import _token_hash

    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    rates = counts.crossJoin(
        F.broadcast(counts.agg(F.min("n").alias("m")))
    ).selectExpr("lang", "cast(m as double) / n AS rate")
    coin = _token_hash("concat('rebal', cast(doc_id as string))")
    return (
        docs.join(F.broadcast(rates), "lang")
        .filter(F.expr(f"{coin} < rate * 4294967296"))
        .select("doc_id", "lang", "source")
    )


@register(
    "zscore_normalize",
    """
    WITH s AS (
      SELECT event_type,
             avg(value) AS mu,
             stddev_samp(value) AS sigma
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           round((e.value - s.mu) / s.sigma, 6) AS z
    FROM events e JOIN s USING (event_type)
    WHERE e.value IS NOT NULL
    """,
)
def q_zscore_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-wise z-score feature normalization — per-group moments
    from ONE partial+final aggregate broadcast back onto the scan (the
    fit/transform shape every feature pipeline needs). No window: the
    moments relation is |groups| rows, so the transform is scan-side
    at any scale."""
    _pin_session_confs(spark)
    ev = load_table(spark, sf_dir, "events").filter("value IS NOT NULL")
    s = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sigma"),
    )
    return (
        ev.join(F.broadcast(s), "event_type")
        .selectExpr(
            "event_id",
            "event_type",
            "value",
            "round((value - mu) / sigma, 6) AS z",
        )
    )


@register(
    "semdedup",
    """
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
    cents AS (SELECT vec_id AS cid, vv AS cv FROM v
              WHERE vec_id < greatest(8, CAST(ceil(
                (SELECT count(*) FROM v) / 512.0) AS BIGINT))),
    scored AS (
      SELECT v.vec_id AS vid, v.vv, c.cid,
             round(list_dot_product(v.vv, c.cv)
                   / (sqrt(list_dot_product(v.vv, v.vv))
                      * sqrt(list_dot_product(c.cv, c.cv))), 6) AS ccos
      FROM v CROSS JOIN cents c
    ),
    assigned AS (
      SELECT vid, vv, cid FROM (
        SELECT *, row_number() OVER
          (PARTITION BY vid ORDER BY ccos DESC, cid) AS rn
        FROM scored) WHERE rn = 1
    ),
    normed AS (
      SELECT vid, cid,
             list_transform(vv, x -> x / sqrt(list_dot_product(vv, vv)))
               AS vn
      FROM assigned
    ),
    dups AS (
      SELECT DISTINCT b.vid AS vid
      FROM normed a JOIN normed b
        ON a.cid = b.cid AND a.vid < b.vid
      WHERE round(list_dot_product(a.vn, b.vn), 6) >= 0.9
    )
    SELECT s.vid AS vec_id, s.cid, d.vid IS NULL AS keep
    FROM assigned s LEFT JOIN dups d ON s.vid = d.vid
    """,
)
def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic dedup over the embeddings table: nearest-
    centroid cells, within-cell cosine ≥ 0.9, keep = no smaller-id
    near-dup in the cell. The pairwise compare fans by cell size only
    (``operators/similarity.py::semdedup`` — num_centroids scales with
    n; ``max_cell`` hard-caps skew like the MinHash hot-bucket cap)."""
    from institutional_fx_etl_spark.operators.similarity import semdedup

    emb = load_table(spark, sf_dir, "embeddings")
    out = semdedup(emb, min_cosine=0.9, num_centroids=_auto_cells(emb.count()))
    # bigint cid mirrors the oracle's BIGINT (driver hash is
    # width-sensitive; internal cid stays int for the literal-HOF path)
    return out.withColumn("cid", F.col("cid").cast("bigint"))


@register(
    "doc_packing_text",
    """
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
      FROM documents
    ),
    c AS (
      SELECT doc_id, s AS start_tok,
             array_to_string(list_slice(toks, s + 1, s + 64), ' ')
               AS chunk_text,
             least(64, len(toks) - s) AS n_tokens
      FROM t, unnest(range(0, greatest(len(toks), 1), 48)) AS u(s)
    ),
    sh AS (
      SELECT doc_id, CAST(start_tok AS INT) AS start_tok, chunk_text,
             CAST(n_tokens AS INT) AS n_tokens,
             CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),1,8))
                  AS BIGINT) % 64 AS shard
      FROM c
    ),
    w AS (
      SELECT doc_id, start_tok, chunk_text, n_tokens, shard,
             CAST(SUM(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id, start_tok
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) - n_tokens AS pre
      FROM sh
    ),
    p AS (
      SELECT *, shard * 1099511627776
               + CAST(floor(CAST(pre AS DOUBLE) / 256) AS BIGINT) AS pack_id
      FROM w
    )
    SELECT pack_id,
           string_agg(chunk_text, ' ' ORDER BY doc_id, start_tok)
             AS pack_text,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           count(*) AS n_chunks
    FROM p GROUP BY pack_id
    """,
)
def q_doc_packing_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized training packs: the chunk texts of each pack
    concatenated in packing order — what actually gets tokenized and
    shipped to the trainer. One groupBy(pack_id) over the packed
    chunk assignment; the shuffle key space is |packs| (corpus tokens
    / seq_len), rows are chunk-sized, and the per-pack sort is bounded
    by chunks-per-pack — no global ordering anywhere. (A chunk
    straddling two packs is assigned to the pack it starts in —
    same contract as ``pack_chunks``.)"""
    from institutional_fx_etl_spark.operators.text import (
        chunk_documents,
        pack_chunks,
    )

    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs)
    packed = pack_chunks(chunks)
    with_text = packed.join(
        chunks.select("doc_id", "start_tok", "chunk_text"),
        ["doc_id", "start_tok"],
    )
    return (
        with_text.groupBy("pack_id")
        .agg(
            F.array_join(
                F.expr(
                    "transform(array_sort(collect_list(named_struct("
                    "'doc_id', doc_id, 'start_tok', start_tok,"
                    " 'txt', chunk_text))), s -> s.txt)"
                ),
                " ",
            ).alias("pack_text"),
            F.sum("n_tokens").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_chunks"),
        )
    )


@register(
    "bpe_token_count",
    r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(
               regexp_extract_all(text,
                 '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+'),
               tk -> trim(tk) != '') AS toks,
             length(text) AS n_chars
      FROM documents
    )
    SELECT doc_id, CAST(len(toks) AS INT) AS n_bpe_tokens,
           round(CASE WHEN len(toks) > 0 THEN
             CAST(n_chars AS DOUBLE) / len(toks) END, 6) AS chars_per_token
    FROM t
    """,
)
def q_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-grain token counting (GPT-2 pretokenizer regex, ASCII
    classes so Java and RE2 agree byte-for-byte) — the LM token-budget
    number, vs the whitespace word count of ``text_token_count``.
    Scan-side regexp_extract_all, no shuffle."""
    from institutional_fx_etl_spark.operators.text import bpe_token_stats

    return bpe_token_stats(load_table(spark, sf_dir, "documents"))


@register(
    "asof_join_nearest",
    """
    WITH trades AS (
      SELECT event_id, ts, value FROM events WHERE event_type = 'purchase'
    ),
    quotes AS (
      SELECT ts, value AS quote FROM events WHERE event_type = 'view'
    ),
    j AS (
      SELECT t.event_id, t.ts, t.value,
             b.ts AS bts, b.quote AS bquote,
             f.ts AS fts, f.quote AS fquote
      FROM trades t
      ASOF LEFT JOIN quotes b ON t.ts >= b.ts
      ASOF LEFT JOIN quotes f ON t.ts <= f.ts
    )
    SELECT event_id, ts, value,
           CASE WHEN bts IS NULL THEN fquote
                WHEN fts IS NULL THEN bquote
                WHEN epoch(ts) - epoch(bts) <= epoch(fts) - epoch(ts)
                  THEN bquote ELSE fquote END AS quote_near,
           CASE WHEN bts IS NULL THEN fts
                WHEN fts IS NULL THEN bts
                WHEN epoch(ts) - epoch(bts) <= epoch(fts) - epoch(ts)
                  THEN bts ELSE fts END AS quote_ts_near
    FROM j
    """,
)
def q_asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``merge_asof(direction='nearest')`` semantics: each purchase
    takes the time-closest view quote on either side (earlier wins a
    tie). Two running-last windows (ASC + DESC) over one union — no
    self-join, no shrinking frames (``operators/asof.py::
    asof_join_nearest``); the oracle is a backward + forward DuckDB
    ASOF pair resolved by distance."""
    from institutional_fx_etl_spark.operators.asof import asof_join_nearest

    ev = load_table(spark, sf_dir, "events")
    trades = ev.filter("event_type = 'purchase'").select(
        "event_id", "ts", "value"
    )
    quotes = ev.filter("event_type = 'view'").select(
        "ts",
        F.col("value").alias("quote"),
        F.col("ts").alias("quote_ts"),
    )
    out = asof_join_nearest(trades, quotes, ts_col="ts", suffix="_near")
    return out.selectExpr(
        "event_id", "ts", "value", "quote_near",
        "quote_ts_near",
    )


@register(
    "bollinger_bands",
    """
    WITH s AS (
      SELECT event_type, event_id, ts, value FROM events
      WHERE value IS NOT NULL
    )
    SELECT event_type, event_id, ts, value,
           round(avg(value) OVER w, 6) AS ma20,
           round(stddev_samp(value) OVER w, 6) AS sd20,
           round(avg(value) OVER w + 2 * stddev_samp(value) OVER w, 6)
             AS upper_band,
           round(avg(value) OVER w - 2 * stddev_samp(value) OVER w, 6)
             AS lower_band
    FROM s
    WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    """,
)
def q_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands — the classic FX technical-indicator window
    (20-row trailing mean ± 2σ): one sort per event-type partition,
    bounded moving frame, all JVM-side window aggregates."""
    from pyspark.sql import Window as W

    _pin_session_confs(spark)
    ev = load_table(spark, sf_dir, "events").filter("value IS NOT NULL")
    w = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, 0)
    )
    ma = F.avg("value").over(w)
    sd = F.stddev_samp("value").over(w)
    return ev.select(
        "event_type",
        "event_id",
        "ts",
        "value",
        F.round(ma, 6).alias("ma20"),
        F.round(sd, 6).alias("sd20"),
        F.round(ma + 2 * sd, 6).alias("upper_band"),
        F.round(ma - 2 * sd, 6).alias("lower_band"),
    )


@register(
    "retention_cohorts",
    """
    WITH firsts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(floor(date_diff('day', f.cohort_week,
                                  date_trunc('week', e.ts)) / 7.0) AS INT)
               AS week_no
      FROM events e JOIN firsts f USING (user_id)
    )
    SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week, week_no,
           count(*) AS n_active
    FROM activity GROUP BY cohort_week, week_no
    """,
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts — the canonical product-analytics
    rollup: users grouped by first-seen week, counted per subsequent
    active week. Two hash aggregates (per-user first week; distinct
    (user, week) activity) around user-keyed shuffles; the cohort
    matrix itself is weeks² rows. No window, no self-join over
    events."""
    _pin_session_confs(spark)
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7.0
            )
            .cast("int")
            .alias("week_no"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_no").agg(
        F.count(F.lit(1)).alias("n_active")
    )


@register(
    "weighted_sample",
    """
    WITH q AS (
      SELECT doc_id, lang,
             greatest(
               0.4 * (CAST(len(list_filter(
                        string_split_regex(lower(text), '\\s+'),
                        t -> t IN ('the','and','of','to','a','in','is')))
                      AS DOUBLE)
                      / len(string_split_regex(lower(text), '\\s+')))
               + 0.3 * least(len(string_split_regex(lower(text), '\\s+')),
                             100) / 100.0,
               0.001) AS w,
             (CAST(concat('0x',
                substr(md5(concat('wsamp', CAST(doc_id AS VARCHAR))),1,8))
                AS BIGINT) + 1.0) / 4294967297.0 AS u
      FROM documents
    )
    SELECT doc_id, lang, round(w, 6) AS w,
           round(ln(u) / w, 6) AS sample_key
    FROM q
    ORDER BY sample_key DESC, doc_id
    LIMIT 100
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted sampling without replacement (Efraimidis-
    Spirakis A-ES keys, ln(u)/w form): the corpus-mixing step that
    up-samples fluent documents. The randomness is a deterministic md5
    coin per document, so the drawn sample is identical across
    engines, runs and partitionings — and the plan is a scan-side key
    computation + one top-k (TakeOrderedAndProject — partial top-k
    map-side, never a global sort of the corpus)."""
    _pin_session_confs(spark)
    docs = load_table(spark, sf_dir, "documents")
    toks = r"split(lower(text), '\\s+')"
    stop = (
        f"cast(size(filter({toks}, t -> t IN"
        " ('the','and','of','to','a','in','is'))) as double)"
        f" / size({toks})"
    )
    w = (
        f"greatest(0.4 * ({stop})"
        f" + 0.3 * least(size({toks}), 100) / 100.0, 0.001)"
    )
    coin = (
        "cast(conv(substr(md5(concat('wsamp', cast(doc_id as string))),1,8),"
        "16,10) as bigint)"
    )
    u = f"({coin} + 1.0) / 4294967297.0"
    return (
        docs.selectExpr(
            "doc_id",
            "lang",
            f"round({w}, 6) AS w",
            f"round(ln({u}) / {w}, 6) AS sample_key",
        )
        .orderBy(F.desc("sample_key"), F.asc("doc_id"))
        .limit(100)
    )


@register(
    "dedup_degree_stats",
    None,  # assigned below: wraps the rendered MinHash-LSH oracle
)
def q_dedup_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup graph degree histogram — the skew diagnostic a dedup
    run is sanity-checked with before clustering (a heavy tail means a
    boilerplate cohort slipped the hot-bucket cap). Two hash
    aggregates over the verified pair list; never touches the corpus
    again."""
    from institutional_fx_etl_spark.operators.dedup import minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, jaccard_threshold=0.2)
    deg = (
        pairs.selectExpr("id_a AS id")
        .unionAll(pairs.selectExpr("id_b AS id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_docs"))


# degree-stats oracle wraps the rendered MinHash-LSH pair oracle
# verbatim (same pattern as dedup_stats)
REGISTRY["dedup_degree_stats"] = (
    REGISTRY["dedup_degree_stats"][0],
    f"""
    WITH pairs AS (
      SELECT id_a, id_b FROM ({REGISTRY["dedup_minhash_lsh"][1]})
    ),
    deg AS (
      SELECT id, count(*) AS degree FROM (
        SELECT id_a AS id FROM pairs
        UNION ALL SELECT id_b FROM pairs
      ) GROUP BY id
    )
    SELECT degree, count(*) AS n_docs
    FROM deg GROUP BY degree
    """,
)


@register(
    "doc_feature_matrix",
    r"""
    WITH t AS (
      SELECT doc_id, lang, string_split_regex(lower(text), '\s+') AS toks,
             length(text) AS n_chars, text
      FROM documents
    ),
    base AS (
      SELECT doc_id, lang, CAST(len(toks) AS INT) AS n_tokens,
             CAST(n_chars AS INT) AS n_chars,
             round(CAST(len(list_filter(toks,
                     tk -> tk IN ('the','and','of','to','a','in','is')))
                   AS DOUBLE) / len(toks), 6) AS stopword_ratio,
             round(CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g'))
                   AS DOUBLE) / length(text), 6) AS punct_ratio,
             round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6)
               AS type_token_ratio
      FROM t WHERE len(toks) >= 1 AND NOT toks = ['']
    )
    SELECT * FROM base
    """,
)
def q_doc_feature_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-document feature relation a quality classifier trains
    on: token/char counts, stopword fluency, punctuation noise and
    lexical diversity in ONE scan-side projection (no joins between
    signal families — each signal is an expression over the same token
    array, so the feature build costs one corpus pass)."""
    _pin_session_confs(spark)
    docs = load_table(spark, sf_dir, "documents")
    toks = "__toks"
    stop = (
        f"cast(size(filter({toks}, t -> t IN"
        " ('the','and','of','to','a','in','is'))) as double)"
        f" / size({toks})"
    )
    return (
        docs.selectExpr(
            "doc_id", "lang", "text",
            r"split(lower(text), '\\s+') AS __toks",
        )
        .filter(f"size({toks}) >= 1 AND NOT ({toks} = array(''))")
        .selectExpr(
            "doc_id",
            "lang",
            f"cast(size({toks}) as int) AS n_tokens",
            "cast(length(text) as int) AS n_chars",
            f"round({stop}, 6) AS stopword_ratio",
            "round(cast(length(regexp_replace(text, '[^.,!?;:]', ''))"
            " as double) / length(text), 6) AS punct_ratio",
            f"round(cast(size(array_distinct({toks})) as double)"
            f" / size({toks}), 6) AS type_token_ratio",
        )
    )


@register(
    "interval_merge",
    """
    WITH iv AS (
      SELECT user_id, ts AS s, ts + INTERVAL 5 MINUTE AS e
      FROM events
    ),
    flagged AS (
      SELECT user_id, s, e,
             CASE WHEN s > max(e) OVER (
               PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             OR max(e) OVER (
               PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
             THEN 1 ELSE 0 END AS new_island
      FROM iv
    ),
    islands AS (
      SELECT user_id, s, e,
             SUM(new_island) OVER (
               PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM flagged
    )
    SELECT user_id, CAST(island AS BIGINT) AS island,
           min(s) AS interval_start, max(e) AS interval_end,
           count(*) AS n_events
    FROM islands GROUP BY user_id, island
    """,
)
def q_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval coalescing (merge-overlaps): each event opens a
    5-minute interval; overlapping/touching intervals per user fuse
    into maximal spans — the gaps-and-islands generalization interval
    tables (maintenance windows, user presence) need. One running max
    + one running sum over the same per-user sort, then a hash
    aggregate; all three share a single exchange."""
    from pyspark.sql import Window as W

    _pin_session_confs(spark)
    ev = load_table(spark, sf_dir, "events")
    iv = ev.selectExpr(
        "user_id", "ts AS s", "ts + INTERVAL 5 MINUTE AS e"
    )
    w_prev = (
        W.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    w_run = (
        W.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    prev_end = F.max("e").over(w_prev)
    flagged = iv.withColumn(
        "new_island",
        F.when(
            prev_end.isNull() | (F.col("s") > prev_end), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    islands = flagged.withColumn(
        "island", F.sum("new_island").over(w_run).cast("bigint")
    )
    return islands.groupBy("user_id", "island").agg(
        F.min("s").alias("interval_start"),
        F.max("e").alias("interval_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "vwap",
    """
    SELECT l_returnflag, l_linestatus,
           round(CAST(SUM(CAST(l_extendedprice * l_quantity
                              AS DECIMAL(38,6)))
                      / SUM(CAST(l_quantity AS DECIMAL(38,6)))
                      AS DOUBLE), 6) AS vwap,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
             AS total_qty
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def q_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted average price per (returnflag, linestatus):
    DECIMAL-exact partial sums (map-side combine, one bounded shuffle)
    — ``operators/timeseries.py::vwap``."""
    from institutional_fx_etl_spark.operators.timeseries import vwap

    return vwap(
        load_table(spark, sf_dir, "lineitem"),
        "l_extendedprice",
        "l_quantity",
        ("l_returnflag", "l_linestatus"),
    )


@register(
    "max_drawdown",
    """
    WITH s AS (
      SELECT event_type, event_id, ts, value FROM events
      WHERE value IS NOT NULL AND value > 0
    ),
    r AS (
      SELECT event_type,
             (max(value) OVER w - value) / max(value) OVER w AS dd
      FROM s
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, round(max(dd), 6) AS max_drawdown,
           count(*) AS n_rows
    FROM r GROUP BY event_type
    """,
)
def q_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per series: running peak (unbounded-preceding
    max) then the largest (peak−v)/peak — one ordered window + one
    hash aggregate per event_type
    (``operators/timeseries.py::max_drawdown``)."""
    from institutional_fx_etl_spark.operators.timeseries import max_drawdown

    ev = load_table(spark, sf_dir, "events").filter(
        "value IS NOT NULL AND value > 0"
    )
    return max_drawdown(ev, "value", ("ts", "event_id"), ("event_type",))


@register(
    "realized_vol",
    """
    WITH s AS (
      SELECT event_type, event_id, ts, value FROM events
      WHERE value IS NOT NULL AND value > 0
    ),
    r AS (
      SELECT event_type, ts,
             ln(value / lag(value) OVER
                (PARTITION BY event_type ORDER BY ts, event_id)) AS lr
      FROM s
    ),
    f AS (
      SELECT event_type, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS d,
             CAST(floor(lr * lr * 1e6 + 0.5) AS DECIMAL(38,0)) AS sq
      FROM r WHERE lr IS NOT NULL
    )
    SELECT event_type, d,
           round(sqrt(CAST(SUM(sq) AS DOUBLE) / 1e6), 6)
             AS realized_vol,
           count(*) AS n_returns
    FROM f GROUP BY event_type, d
    """,
)
def q_realized_vol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Realized volatility per (event_type, day): sqrt of the day's
    sum of squared log returns; the squared returns go through
    micro-unit fixed point summed as DECIMAL, so the hash is
    summation-order-proof
    (``operators/timeseries.py::realized_volatility``)."""
    from institutional_fx_etl_spark.operators.timeseries import (
        realized_volatility,
    )

    ev = load_table(spark, sf_dir, "events").filter(
        "value IS NOT NULL AND value > 0"
    )
    return realized_volatility(
        ev, "value", "ts", ("ts", "event_id"), ("event_type",)
    )


@register(
    "rsi_cutler",
    """
    WITH s AS (
      SELECT event_type, event_id, ts, value FROM events
      WHERE value IS NOT NULL
    ),
    d AS (
      SELECT *, value - lag(value) OVER
               (PARTITION BY event_type ORDER BY ts, event_id) AS diff
      FROM s
    ),
    g AS (
      SELECT *, avg(greatest(diff, 0)) OVER w AS gain,
                avg(greatest(-diff, 0)) OVER w AS loss
      FROM d
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, event_id, ts, value,
           round(CASE WHEN diff IS NULL THEN NULL
                      WHEN loss = 0 THEN 100.0
                      ELSE 100.0 - 100.0 / (1.0 + gain / loss) END, 6)
             AS rsi
    FROM g
    """,
)
def q_rsi_cutler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cutler's RSI (simple-average form, window-expressible — unlike
    Wilder's recursive smoothing): one ordered window pass per
    event_type (``operators/timeseries.py::rsi_cutler``). Both engines
    treat the first row's NULL diff identically (greatest skips
    NULLs), so the frame averages agree bit-for-bit."""
    from institutional_fx_etl_spark.operators.timeseries import rsi_cutler

    ev = load_table(spark, sf_dir, "events").filter("value IS NOT NULL")
    out = rsi_cutler(ev, "value", ("ts", "event_id"), ("event_type",), n=14)
    return out.select("event_type", "event_id", "ts", "value", "rsi")


@register(
    "autocorr_lag",
    """
    WITH s AS (
      SELECT event_type, event_id, ts, value FROM events
      WHERE value IS NOT NULL
    ),
    p AS (
      SELECT event_type,
             CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS x,
             lag(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) OVER
               (PARTITION BY event_type ORDER BY ts, event_id) AS y
      FROM s
    ),
    a AS (
      SELECT event_type, count(*) AS n_pairs,
             SUM(CAST(x AS DECIMAL(38,0))) AS sx,
             SUM(CAST(y AS DECIMAL(38,0))) AS sy,
             SUM(CAST(x * y AS DECIMAL(38,0))) AS sxy,
             SUM(CAST(x * x AS DECIMAL(38,0))) AS sxx,
             SUM(CAST(y * y AS DECIMAL(38,0))) AS syy
      FROM p WHERE y IS NOT NULL GROUP BY event_type
    )
    SELECT event_type,
           round((CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / sqrt((CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
             AS autocorr,
           n_pairs
    FROM a
    """,
)
def q_autocorr_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation per series, EXACT across engines: the
    five Pearson sums accumulate over micro-unit bigints as DECIMAL
    (streaming ``corr`` co-moments drift in the last ulp with visit
    order — this doesn't) —
    ``operators/timeseries.py::autocorr_exact``."""
    from institutional_fx_etl_spark.operators.timeseries import autocorr_exact

    ev = load_table(spark, sf_dir, "events").filter("value IS NOT NULL")
    return autocorr_exact(
        ev, "value", ("ts", "event_id"), ("event_type",), lag=1
    )


@register(
    "minmax_scale",
    """
    WITH b AS (
      SELECT event_type, min(value) AS mn, max(value) AS mx
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    )
    SELECT e.event_type, e.event_id, e.ts, e.value,
           round((e.value - b.mn) / NULLIF(b.mx - b.mn, 0.0), 6)
             AS value_mm
    FROM events e JOIN b USING (event_type)
    WHERE e.value IS NOT NULL
    """,
)
def q_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group min-max normalization (companion to
    ``zscore_normalize``): one hash aggregate broadcast back onto the
    scan — no window sort
    (``operators/timeseries.py::minmax_normalize``)."""
    from institutional_fx_etl_spark.operators.timeseries import (
        minmax_normalize,
    )

    ev = load_table(spark, sf_dir, "events").filter("value IS NOT NULL")
    out = minmax_normalize(ev, "value", ("event_type",))
    return out.select("event_type", "event_id", "ts", "value", "value_mm")


@register(
    "segment_dedup",
    """
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
      FROM documents
    ),
    seg AS (
      SELECT doc_id, CAST(s AS INT) AS start,
             array_to_string(list_slice(toks, s + 1, s + 16), ' ') AS seg
      FROM t, unnest(range(0, greatest(len(toks), 1), 16)) AS u(s)
    ),
    r AS (
      SELECT *, row_number() OVER
               (PARTITION BY seg ORDER BY doc_id, start) AS rn
      FROM seg
    )
    SELECT doc_id,
           COALESCE(string_agg(CASE WHEN rn = 1 THEN seg END, ' '
                               ORDER BY start), '') AS clean_text,
           CAST(count(*) AS INT) AS n_segments,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS INT)
             AS n_kept
    FROM r GROUP BY doc_id
    """,
)
def q_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-grain exact substring dedup (Lee et al. 2022 at fixed
    16-token windows): each distinct segment survives only at its
    first (doc, start) occurrence; documents reassemble from kept
    segments. One digest-keyed shuffle + one per-doc regroup
    (``operators/text.py::segment_dedup``)."""
    from institutional_fx_etl_spark.operators.text import segment_dedup

    return segment_dedup(load_table(spark, sf_dir, "documents"))


@register(
    "inverted_index",
    """
    WITH t AS (
      SELECT DISTINCT term, doc_id FROM (
        SELECT doc_id,
               unnest(string_split_regex(lower(text), '\\s+')) AS term
        FROM documents
      ) WHERE term <> ''
    ),
    a AS (
      SELECT term, CAST(count(*) AS INT) AS df,
             list_sort(list(doc_id)) AS ids
      FROM t GROUP BY term
    )
    SELECT term, df,
           array_to_string(list_slice(ids, 1, 10), ',') AS postings
    FROM a WHERE df >= 2
    """,
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term → posting-list build: distinct (term, doc) pairs, one
    term-keyed aggregate emitting the exact document frequency and a
    bounded ascending posting prefix
    (``operators/text.py::inverted_index``)."""
    from institutional_fx_etl_spark.operators.text import inverted_index

    return inverted_index(
        load_table(spark, sf_dir, "documents"), max_postings=10, min_df=2
    )


@register(
    "emb_quantize",
    """
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings
    ),
    s AS (
      SELECT vec_id, vv,
             list_max(list_transform(vv, x -> abs(x))) / 127.0 AS scale
      FROM v
    ),
    c AS (
      SELECT vec_id, vv, scale,
             list_transform(vv, x -> CAST(floor(x / scale + 0.5) AS INT))
               AS codes
      FROM s
    )
    SELECT vec_id, round(scale, 6) AS scale,
           array_to_string(codes, ',') AS codes,
           round(list_max(list_transform(range(1, len(vv) + 1),
                 i -> abs(vv[i] - codes[i] * scale))), 6) AS recon_err
    FROM c
    """,
)
def q_emb_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization: per-vector max-abs scale,
    half-up fixed-point codes, max reconstruction error — a pure
    scan-side map (``operators/similarity.py::emb_quantize_int8``)."""
    from institutional_fx_etl_spark.operators.similarity import (
        emb_quantize_int8,
    )

    return emb_quantize_int8(load_table(spark, sf_dir, "embeddings"))


@register(
    "knn_join",
    """
    WITH v AS (SELECT vec_id AS vid, CAST(embedding AS DOUBLE[]) AS vv
               FROM embeddings),
    cents AS (SELECT vid AS cid, vv AS cv FROM v
              WHERE vid < greatest(8, CAST(ceil(
                (SELECT count(*) FROM v) / 512.0) AS BIGINT))),
    scored AS (
      SELECT v.vid, v.vv, c.cid,
             round(list_dot_product(v.vv, c.cv)
                   / (sqrt(list_dot_product(v.vv, v.vv))
                      * sqrt(list_dot_product(c.cv, c.cv))), 6) AS ccos
      FROM v CROSS JOIN cents c
    ),
    assigned AS (
      SELECT vid, vv, cid FROM (
        SELECT *, row_number() OVER
          (PARTITION BY vid ORDER BY ccos DESC, cid) AS rn
        FROM scored) WHERE rn = 1
    ),
    normed AS (
      SELECT vid, cid,
             list_transform(vv, x -> x / sqrt(list_dot_product(vv, vv)))
               AS vn
      FROM assigned
    ),
    s AS (
      SELECT a.vid, b.vid AS nn_id,
             round(list_dot_product(a.vn, b.vn), 6) AS cosine
      FROM normed a JOIN normed b
        ON a.cid = b.cid AND a.vid <> b.vid
    )
    SELECT vid AS vec_id, nn_id,
           CAST(row_number() OVER
             (PARTITION BY vid ORDER BY cosine DESC, nn_id) AS INT)
             AS rank,
           cosine
    FROM s QUALIFY rank <= 3
    """,
)
def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs KNN join, IVF-cell-bounded: every vector's 3 nearest
    neighbors from its own cell (contrastive-pair / hard-negative
    mining primitive; fan-out Σ|cell|², never corpus²) —
    ``operators/similarity.py::knn_join``."""
    from institutional_fx_etl_spark.operators.similarity import knn_join

    emb = load_table(spark, sf_dir, "embeddings")
    return knn_join(emb, k=3, num_centroids=_auto_cells(emb.count()))


@register(
    "streaming_static_join",
    """
    SELECT date_trunc('hour', e.ts) AS window_start, c.c_mktsegment,
           count(*) AS n_events,
           round(avg(e.value), 6) AS avg_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
)
def q_streaming_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast enrichment + tumbling rollup driven to
    completion over the bounded events source — must equal the batch
    join+aggregate exactly (``streaming/candles.py::
    run_stream_static_enrich``). The stateless streaming join shape:
    no watermark, no buffering, static side re-broadcast per batch."""
    from institutional_fx_etl_spark.streaming.candles import (
        run_stream_static_enrich,
    )

    return run_stream_static_enrich(
        spark,
        f"{sf_dir}/events.parquet",
        load_table(spark, sf_dir, "customer"),
        table_name="stream_enriched_q",
    )


@register(
    "tpch_q3",
    """
    SELECT l.l_orderkey,
           round(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(18,4))) AS DOUBLE), 6) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1996-06-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1996-06-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                      AS DECIMAL(18,4))) DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): a dim-filtered 3-way star
    join — customer is explicitly broadcast (filter first, then
    broadcast the survivors), orders↔lineitem shuffle on the order
    key — topped by a DECIMAL-exact revenue aggregate and a
    TakeOrderedAndProject top-10 (no global sort). The classic
    Catalyst showcase: both filters push to the parquet scans, column
    pruning cuts the fact read to 4 columns."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter("c_mktsegment = 'BUILDING'")
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        "o_orderdate < TIMESTAMP '1996-06-01 00:00:00'"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        "l_shipdate > TIMESTAMP '1996-06-01 00:00:00'"
    )
    rev = F.sum(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
            "decimal(18,4)"
        )
    )
    return (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(rev.alias("__rev"))
        .orderBy(F.desc("__rev"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            F.round(F.col("__rev").cast("double"), 6).alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
    )


@register(
    "tpch_q5",
    """
    SELECT n.n_name,
           round(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(18,4))) AS DOUBLE), 6) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): a SIX-way star join.
    region→nation→supplier collapses to one broadcast dim chain; the
    fact side shuffles once on the order key; the
    same-nation (c_nationkey = s_nationkey) condition rides the
    supplier join. Revenue is DECIMAL-exact per nation."""
    region = load_table(spark, sf_dir, "region").filter("r_name = 'ASIA'")
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        "o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'"
        " AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'"
    )
    li = load_table(spark, sf_dir, "lineitem")
    sn = (
        supp.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    nation.n_regionkey == region.r_regionkey,
                )
            ),
            supp.s_nationkey == nation.n_nationkey,
        )
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    rev = F.sum(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
            "decimal(18,4)"
        )
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(sn),
            (li.l_suppkey == sn.s_suppkey)
            & (cust.c_nationkey == sn.s_nationkey),
        )
        .groupBy("n_name")
        .agg(F.round(rev.cast("double"), 6).alias("revenue"))
    )


@register(
    "tpch_q18",
    """
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN big ON o.o_orderkey = big.l_orderkey
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
             o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume orders): a self-semi-join pattern
    — the HAVING subquery reduces lineitem to qualifying order keys
    (map-side partial sums first), which then SEMI-prune the fact
    re-read before the detail join; the final top-100 is a
    TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("__q"))
        .filter(F.col("__q") > 300)
        .select("l_orderkey")
    )
    return (
        li.join(F.broadcast(big), "l_orderkey", "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
        )
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty")
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "sum_qty",
        )
    )


@register(
    "tpch_q7",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           round(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(18,4))) AS DOUBLE), 6) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    """,
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping between two nations): a 6-way
    join where the two nation dims broadcast onto supplier/customer,
    the disjunctive nation-pair predicate prunes BEFORE the fact
    joins, and revenue rolls up DECIMAL-exact per (nation pair,
    year)."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.selectExpr(
        "n_nationkey AS n1_key", "n_name AS supp_nation"
    ).filter("supp_nation IN ('NATION_1', 'NATION_2')")
    n2 = nation.selectExpr(
        "n_nationkey AS n2_key", "n_name AS cust_nation"
    ).filter("cust_nation IN ('NATION_1', 'NATION_2')")
    sn = s.join(F.broadcast(n1), s.s_nationkey == F.col("n1_key")).select(
        "s_suppkey", "supp_nation"
    )
    cn = cust.join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key")).select(
        "c_custkey", "cust_nation"
    )
    rev = F.sum(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
            "decimal(18,4)"
        )
    )
    return (
        li.join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cn), orders.o_custkey == cn.c_custkey)
        .filter(
            "(supp_nation = 'NATION_1' AND cust_nation = 'NATION_2')"
            " OR (supp_nation = 'NATION_2' AND cust_nation = 'NATION_1')"
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(F.round(rev.cast("double"), 6).alias("revenue"))
    )


@register(
    "tpch_q10",
    """
    SELECT c.c_custkey, c.c_name, n.n_name,
           round(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(18,4))) AS DOUBLE), 6) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                      AS DECIMAL(18,4))) DESC, c.c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): returnflag filter
    pushes to the fact scan, date range prunes orders, customer/nation
    broadcast, top-20 by exact-decimal revenue via
    TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem").filter("l_returnflag = 'R'")
    orders = load_table(spark, sf_dir, "orders").filter(
        "o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'"
        " AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'"
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    cn = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).select("c_custkey", "c_name", "n_name")
    rev = F.sum(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
            "decimal(18,4)"
        )
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cn), orders.o_custkey == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(rev.alias("__rev"))
        .orderBy(F.desc("__rev"), F.asc("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.round(F.col("__rev").cast("double"), 6).alias("revenue"),
        )
    )


@register(
    "tpch_q14",
    """
    SELECT round(
             100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
               THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4))
               END) AS DOUBLE)
             / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(18,4))) AS DOUBLE), 6)
             AS promo_revenue_pct,
           count(*) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion revenue share): date-pruned fact
    scan, broadcast part dim, one conditional DECIMAL aggregate —
    the promo/total ratio is computed once in doubles with the oracle
    mirroring the exact expression."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        "l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'"
        " AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(rev).cast("double"),
                6,
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "tpch_q19",
    """
    SELECT round(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(18,4))) AS DOUBLE), 6) AS revenue,
           count(*) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 35)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunctive brand/size/
    quantity predicates): the classic OR-of-ANDs pushdown test — the
    part-side conjuncts prune the broadcast dim, the quantity
    conjuncts prune the fact scan, and the residual disjunction
    evaluates on the joined row."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    cond = (
        "(p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15"
        " AND l_quantity BETWEEN 1 AND 20)"
        " OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30"
        " AND l_quantity BETWEEN 10 AND 35)"
        " OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50"
        " AND l_quantity BETWEEN 20 AND 50)"
    )
    rev = F.sum(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
            "decimal(18,4)"
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.round(rev.cast("double"), 6).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "mad_robust",
    """
    WITH m AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    )
    SELECT e.event_type, round(max(m.med), 6) AS med,
           round(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad,
           count(*) AS n_rows
    FROM events e JOIN m USING (event_type)
    WHERE e.value IS NOT NULL
    GROUP BY e.event_type
    """,
)
def q_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per series — the robust dispersion
    statistic for outlier-poisoned features: two exact interpolating
    percentiles, group median broadcast back onto the scan
    (``operators/timeseries.py::mad_robust``)."""
    from institutional_fx_etl_spark.operators.timeseries import mad_robust

    ev = load_table(spark, sf_dir, "events").filter("value IS NOT NULL")
    return mad_robust(ev, "value", ("event_type",))


@register(
    "winsorize",
    """
    WITH b AS (
      SELECT event_type,
             round(quantile_cont(value, 0.01), 6) AS lo,
             round(quantile_cont(value, 0.99), 6) AS hi
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    )
    SELECT e.event_type, e.event_id, e.ts, e.value,
           least(greatest(e.value, b.lo), b.hi) AS value_w
    FROM events e JOIN b USING (event_type)
    WHERE e.value IS NOT NULL
    """,
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization (clip at the exact p1/p99): one
    percentile aggregate broadcast onto the scan, scan-side
    least/greatest clip (``operators/timeseries.py::winsorize``)."""
    from institutional_fx_etl_spark.operators.timeseries import winsorize

    ev = load_table(spark, sf_dir, "events").filter("value IS NOT NULL")
    out = winsorize(ev, "value", ("event_type",))
    return out.select("event_type", "event_id", "ts", "value", "value_w")


@register(
    "psi_drift",
    """
    WITH r AS (
      SELECT CAST(least(greatest(floor((value - 0.0) / 50.0), 0), 9)
                  AS INT) AS b, count(*) AS c_ref
      FROM events WHERE value IS NOT NULL
        AND ts < TIMESTAMP '2024-01-16 00:00:00'
      GROUP BY 1
    ),
    c AS (
      SELECT CAST(least(greatest(floor((value - 0.0) / 50.0), 0), 9)
                  AS INT) AS b, count(*) AS c_cur
      FROM events WHERE value IS NOT NULL
        AND ts >= TIMESTAMP '2024-01-16 00:00:00'
      GROUP BY 1
    ),
    j AS (
      SELECT coalesce(r.c_ref, 0) AS c_ref, coalesce(c.c_cur, 0) AS c_cur
      FROM r FULL OUTER JOIN c USING (b)
    ),
    p AS (
      SELECT c_ref, c_cur,
             greatest(c_ref / CAST(SUM(c_ref) OVER () AS DOUBLE), 0.0001)
               AS p_ref,
             greatest(c_cur / CAST(SUM(c_cur) OVER () AS DOUBLE), 0.0001)
               AS p_cur
      FROM j
    )
    SELECT round(SUM((p_cur - p_ref) * ln(p_cur / p_ref)), 6) AS psi,
           CAST(SUM(c_ref) AS BIGINT) AS n_ref,
           CAST(SUM(c_cur) AS BIGINT) AS n_cur
    FROM p
    """,
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first and second half of
    the events window — the standard production drift monitor: fixed
    equi-width buckets so runs are comparable, eps-clamped shares,
    Σ (cur−ref)·ln(cur/ref). Two pruned scans + scalar math on a
    10-row bucket table (``operators/timeseries.py::psi_drift``)."""
    from institutional_fx_etl_spark.operators.timeseries import psi_drift

    ev = load_table(spark, sf_dir, "events").filter("value IS NOT NULL")
    split = "TIMESTAMP '2024-01-16 00:00:00'"
    return psi_drift(
        ev.filter(f"ts < {split}"),
        ev.filter(f"ts >= {split}"),
        "value",
        num_buckets=10,
        lo=0.0,
        hi=500.0,
    )


@register(
    "profile_table",
    """
    SELECT 'l_quantity' AS "column", count(*) AS n_rows,
           CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_nulls,
           count(DISTINCT l_quantity) AS n_distinct,
           CAST(min(l_quantity) AS VARCHAR) AS min_value,
           CAST(max(l_quantity) AS VARCHAR) AS max_value
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', count(*),
           CAST(SUM(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           count(DISTINCT l_discount),
           CAST(min(l_discount) AS VARCHAR), CAST(max(l_discount) AS VARCHAR)
    FROM lineitem
    UNION ALL
    SELECT 'l_returnflag', count(*),
           CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           count(DISTINCT l_returnflag),
           CAST(min(l_returnflag) AS VARCHAR),
           CAST(max(l_returnflag) AS VARCHAR)
    FROM lineitem
    UNION ALL
    SELECT 'l_linestatus', count(*),
           CAST(SUM(CASE WHEN l_linestatus IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           count(DISTINCT l_linestatus),
           CAST(min(l_linestatus) AS VARCHAR),
           CAST(max(l_linestatus) AS VARCHAR)
    FROM lineitem
    """,
)
def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column dataset profile (rows / nulls / exact distincts /
    min / max as strings) — one single-column aggregate per column
    UNIONed, so parquet column pruning reads each column once and no
    multi-distinct Expand multiplies the scan
    (``operators/profiling.py::profile_columns``)."""
    from institutional_fx_etl_spark.operators.profiling import profile_columns

    li = load_table(spark, sf_dir, "lineitem")
    return profile_columns(
        li, ["l_quantity", "l_discount", "l_returnflag", "l_linestatus"]
    )


@register(
    "tpch_q1",
    """
    SELECT l_returnflag, l_linestatus,
           round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
                 AS DOUBLE), 6) AS sum_qty,
           round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
                 AS DOUBLE), 6) AS sum_base_price,
           round(CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount)
                                     * 1000000.0 + 0.5) AS BIGINT))
                 AS DOUBLE) / 1000000.0, 6) AS sum_disc_price,
           round(CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount)
                                     * (1 + l_tax) * 1000000.0 + 0.5)
                               AS BIGINT)) AS DOUBLE) / 1000000.0, 6)
             AS sum_charge,
           round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                 / count(*), 6) AS avg_qty,
           round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
                 AS DOUBLE) / count(*), 6) AS avg_price,
           round(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)
                 / count(*), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1997-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape (pricing summary): the canonical wide
    scan-and-aggregate — one pass over the fact table, eight
    aggregates over a 4-value grouping key, all map-side combinable
    (partial hash agg → 4-row exchange → final agg). Plain-column
    sums use DECIMAL partials; the two product sums fix-point to
    micro-units (floor(x*1e6+0.5) BIGINT) because double→decimal
    cast tie rules differ across engines; averages divide the exact
    sum by the count in double (mirrored in the oracle)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        "l_shipdate <= TIMESTAMP '1997-12-01 00:00:00'"
    )

    def dsum(expr: str):
        return F.sum(F.expr(expr).cast("decimal(18,4)"))

    n = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(dsum("l_quantity").cast("double"), 6).alias("sum_qty"),
            F.round(dsum("l_extendedprice").cast("double"), 6).alias(
                "sum_base_price"
            ),
            F.round(
                F.sum(
                    F.expr(
                        "CAST(floor(l_extendedprice * (1 - l_discount)"
                        " * 1000000.0 + 0.5) AS BIGINT)"
                    )
                ).cast("double")
                / 1000000.0,
                6,
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.expr(
                        "CAST(floor(l_extendedprice * (1 - l_discount)"
                        " * (1 + l_tax) * 1000000.0 + 0.5) AS BIGINT)"
                    )
                ).cast("double")
                / 1000000.0,
                6,
            ).alias("sum_charge"),
            F.round(dsum("l_quantity").cast("double") / n, 6).alias(
                "avg_qty"
            ),
            F.round(dsum("l_extendedprice").cast("double") / n, 6).alias(
                "avg_price"
            ),
            F.round(dsum("l_discount").cast("double") / n, 6).alias(
                "avg_disc"
            ),
            n.alias("count_order"),
        )
    )


@register(
    "tpch_q4",
    """
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 7 DAY)
    GROUP BY o.o_orderpriority
    """,
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking): EXISTS decorrelated
    to a LEFT SEMI join — the fact side never duplicates orders with
    many matching lineitems, so the count is per-order. The reference
    schema has no commit/receipt dates; "late" is adapted to
    shipdate > orderdate + 7d, keeping the correlated-predicate
    shape (the comparison rides the join, not a pre-filter)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        "o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'"
        " AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.expr("o_orderdate + INTERVAL 7 DAY")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "tpch_q6",
    """
    SELECT round(CAST(SUM(CAST(l_extendedprice * l_discount
                               AS DECIMAL(18,4))) AS DOUBLE), 6)
             AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecast revenue change): pure filter +
    global aggregate — every predicate pushes to the parquet scan
    (date range, discount band, quantity cap all appear in
    PushedFilters), the projection prunes to 4 columns, and the
    single-row result needs no wide shuffle (partial sums →
    SinglePartition of 32 partial rows)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        "l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'"
        " AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'"
        " AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
    )
    return li.agg(
        F.round(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_discount")).cast(
                    "decimal(18,4)"
                )
            ).cast("double"),
            6,
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "tpch_q8",
    """
    WITH vol AS (
      SELECT year(o.o_orderdate) AS o_year,
             CAST(l.l_extendedprice * (1 - l.l_discount)
                  AS DECIMAL(18,4)) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      JOIN part p     ON l.l_partkey = p.p_partkey
      WHERE r.r_name = 'AMERICA'
        AND p.p_type LIKE '%PROMO%'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_year,
           round(CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                               THEN volume ELSE CAST(0 AS DECIMAL(18,4))
                          END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM vol GROUP BY o_year
    """,
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): an 8-way join where
    every dimension chain (region→nation→customer, nation→supplier,
    part) collapses to a broadcast and the two fact tables shuffle
    once on the order key; the market-share ratio divides two
    DECIMAL-exact conditional sums. partsupp is absent from the
    reference schema, so the supplier cost leg is omitted — the join
    topology and conditional-share aggregate are the point."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        "o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'"
        " AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'"
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        "r_name = 'AMERICA'"
    )
    part = load_table(spark, sf_dir, "part").filter(
        "p_type LIKE '%PROMO%'"
    )
    cust_am = cust.join(
        F.broadcast(
            nation.join(
                F.broadcast(region),
                nation.n_regionkey == region.r_regionkey,
            ).select("n_nationkey")
        ),
        cust.c_nationkey == F.col("n_nationkey"),
    ).select("c_custkey")
    supp_n = supp.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        supp.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    vol = (
        li.join(
            orders.join(F.broadcast(cust_am), orders.o_custkey == F.col("c_custkey")),
            li.l_orderkey == orders.o_orderkey,
        )
        .join(F.broadcast(supp_n), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("decimal(18,4)")
            .alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return vol.groupBy("o_year").agg(
        F.round(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
                .otherwise(zero)
            ).cast("double")
            / F.sum("volume").cast("double"),
            6,
        ).alias("mkt_share")
    )


@register(
    "tpch_q12",
    """
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_linestatus
    """,
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode priority split): fact-side
    filter + join + conditional two-way counts. The reference schema
    has no l_shipmode, so the grouping key is l_linestatus — the plan
    shape (filtered fact joined to orders, CASE-split counts, tiny
    grouping cardinality) is identical to the canonical query."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        "l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'"
        " AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'"
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q13",
    """
    WITH c_orders AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM c_orders GROUP BY c_count
    """,
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): LEFT
    OUTER join with the filter ON THE JOIN CONDITION (not a WHERE —
    customers with zero qualifying orders must survive with
    c_count=0), then a double aggregation: per-customer count →
    histogram over the counts. The reference schema has no o_comment,
    so the canonical NOT LIKE filter is adapted to an order-priority
    exclusion riding the join."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@register(
    "tpch_q17",
    """
    WITH target AS (
      SELECT p_partkey FROM part
      WHERE p_brand = 'Brand#1' AND p_size <= 5
    ),
    pavg AS (
      SELECT l.l_partkey,
             0.2 * (CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4)))
                    AS DOUBLE) / count(*)) AS qty_cut
      FROM lineitem l JOIN target t ON l.l_partkey = t.p_partkey
      GROUP BY l.l_partkey
    )
    SELECT round(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)))
                 AS DOUBLE) / 7.0, 6) AS avg_yearly,
           count(*) AS n_lines
    FROM lineitem l
    JOIN pavg a ON l.l_partkey = a.l_partkey
    WHERE l.l_quantity < a.qty_cut
    """,
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): the classic
    correlated scalar subquery (per-part 20%-of-average quantity
    cutoff) decorrelated into a self-join — one pass computes the
    per-part average over the brand-filtered parts, broadcast back
    against the same scan, fact rows below their own part's cutoff
    aggregate. The average divides a DECIMAL-exact sum by the count
    in double; the 0.2 multiplier stays in double on both engines so
    the cutoff comparison is bit-identical."""
    part = load_table(spark, sf_dir, "part").filter(
        "p_brand = 'Brand#1' AND p_size <= 5"
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    tgt = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    pavg = tgt.groupBy("l_partkey").agg(
        (
            F.lit(0.2)
            * (
                F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast(
                    "double"
                )
                / F.count(F.lit(1))
            )
        ).alias("qty_cut")
    )
    return (
        tgt.join(F.broadcast(pavg.select(F.col("l_partkey").alias("__pk"), "qty_cut")),
                 tgt.l_partkey == F.col("__pk"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast(
                    "double"
                )
                / 7.0,
                6,
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "tpch_q21",
    """
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
    ),
    multi AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING count(DISTINCT l_suppkey) > 1
    ),
    sole_late AS (
      SELECT l_orderkey, min(l_suppkey) AS l_suppkey
      FROM late GROUP BY l_orderkey
      HAVING count(DISTINCT l_suppkey) = 1
    )
    SELECT s.s_name, count(*) AS numwait
    FROM sole_late sl
    JOIN multi m ON sl.l_orderkey = m.l_orderkey
    JOIN supplier s ON sl.l_suppkey = s.s_suppkey
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the
    EXISTS ("another supplier in the order") + NOT EXISTS ("no OTHER
    late supplier") pair, decorrelated into per-order distinct-supplier
    counts — the multi-supplier semi-set and the exactly-one-late-
    supplier set join back to the supplier dim. Adapted to the reduced
    schema: "late" is shipdate > orderdate + 30d (no receipt/commit
    dates). Top-20 via TakeOrderedAndProject, no global sort."""
    orders = load_table(spark, sf_dir, "orders").filter(
        "o_orderstatus = 'F'"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    late = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
        F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 30 DAY")
    )
    multi = (
        li.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("__ns"))
        .filter("__ns > 1")
        .select("l_orderkey")
    )
    sole_late = (
        late.groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("__nl"),
            F.min("l_suppkey").alias("l_suppkey"),
        )
        .filter("__nl = 1")
        .select("l_orderkey", "l_suppkey")
    )
    return (
        sole_late.join(multi, "l_orderkey", "left_semi")
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


@register(
    "tpch_q22",
    """
    WITH pos AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
             / count(*) AS avg_bal
      FROM customer WHERE c_acctbal > 0.0
        AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
    )
    SELECT c.c_nationkey AS cntrycode, count(*) AS numcust,
           round(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4)))
                 AS DOUBLE), 6) AS totacctbal
    FROM customer c, pos
    WHERE c.c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
      AND c.c_acctbal > pos.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >=
                            TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c.c_nationkey
    """,
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): scalar subquery
    (average positive balance over the country subset) broadcast as a
    one-row crossJoin, NOT EXISTS decorrelated to a LEFT ANTI join
    against the filtered orders side, grouped by country code. The
    reference schema has no c_phone, so the phone-prefix country
    filter is adapted to a nationkey set, and since every customer
    has at least one order in this dataset the NOT EXISTS is scoped
    to recent orders (lapsed customers) so the anti join is
    non-vacuous. The AVG threshold divides a DECIMAL-exact sum by
    the count in double on both engines, so the balance comparison
    is order-independent."""
    nations = [1, 3, 5, 7, 9, 11, 13]
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(nations)
    )
    avg_bal = cust.filter("c_acctbal > 0.0").agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter("o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'")
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast(
                    "double"
                ),
                6,
            ).alias("totacctbal"),
        )
    )


@register(
    "linreg_per_group",
    """
    WITH b AS (
      SELECT event_type,
             CAST(date_diff('microsecond',
                  TIMESTAMP '2024-01-01 00:00:00', ts) AS HUGEINT) AS x,
             CAST(CAST(floor(value * 1000000 + 0.5) AS BIGINT)
                  AS HUGEINT) AS y
      FROM events WHERE value IS NOT NULL
    ),
    m AS (
      SELECT event_type, count(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
      FROM b GROUP BY event_type
    )
    SELECT event_type, n AS n_rows,
           round(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                 * (1000000.0 / 1000000.0), 6) AS slope_per_sec,
           round(((CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                  - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                    * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
                 / 1000000.0, 6) AS intercept,
           round(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
                 / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                 6) AS r2
    FROM m
    """,
)
def q_linreg_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-series OLS trend (slope / intercept / r²) from
    mergeable second moments — one map-side-combinable hash aggregate,
    closed-form finish, no window or sort
    (``operators/timeseries.py::linreg_per_group``). x is integer
    microseconds since a constant base, y fix-points to micro-units,
    moments sum as DECIMAL(38,0) ↔ HUGEINT."""
    from institutional_fx_etl_spark.operators.timeseries import (
        linreg_per_group,
    )

    ev = load_table(spark, sf_dir, "events").filter("value IS NOT NULL")
    return linreg_per_group(ev, "ts", "value", ("event_type",))


@register(
    "quality_gopher",
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
      FROM documents
    ),
    f AS (
      SELECT doc_id,
             len(toks) AS n,
             CAST(list_sum(list_transform(toks, tk -> length(tk)))
                  AS DOUBLE) / len(toks) AS mean_len,
             CAST(len(list_filter(toks,
                  tk -> regexp_matches(tk, '[a-z]'))) AS DOUBLE)
               / len(toks) AS alpha_frac,
             CAST(len(list_filter(toks,
                  tk -> regexp_matches(tk, '#')
                     OR regexp_matches(tk, '\.\.\.'))) AS DOUBLE)
               / len(toks) AS sym_ratio,
             len(list_distinct(list_filter(toks,
                  tk -> tk IN ('the','of','and','to','be'))))
               AS stop_distinct
      FROM t
    )
    SELECT doc_id,
           CAST(n >= 50 AND n <= 100000 AS INTEGER) AS rule_word_count,
           CAST(mean_len >= 3.0 AND mean_len <= 10.0 AS INTEGER)
             AS rule_mean_word_len,
           CAST(alpha_frac >= 0.8 AS INTEGER) AS rule_alpha_words,
           CAST(sym_ratio <= 0.1 AS INTEGER) AS rule_symbol_ratio,
           CAST(stop_distinct >= 2 AS INTEGER) AS rule_stopwords,
           CAST((n >= 50 AND n <= 100000)
                AND (mean_len >= 3.0 AND mean_len <= 10.0)
                AND alpha_frac >= 0.8 AND sym_ratio <= 0.1
                AND stop_distinct >= 2 AS INTEGER) AS gopher_pass
    FROM f
    """,
)
def q_quality_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality rule flags (Rae et al. 2021 §A1.1 subset)
    per document — named boolean rules + the conjunction, all
    scan-side codegen'd array/string expressions
    (``operators/text.py::gopher_quality``)."""
    from institutional_fx_etl_spark.operators.text import gopher_quality

    docs = load_table(spark, sf_dir, "documents")
    out = gopher_quality(docs)
    flags = [
        "rule_word_count",
        "rule_mean_word_len",
        "rule_alpha_words",
        "rule_symbol_ratio",
        "rule_stopwords",
        "gopher_pass",
    ]
    return out.selectExpr(
        "doc_id", *(f"CAST({c} AS INT) AS {c}" for c in flags)
    )


@register(
    "emb_covariance",
    """
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0 + 0.5)
                         AS BIGINT)) AS qv
      FROM embeddings
    ),
    u AS (
      SELECT vec_id, u.pos AS pos, u.x AS x
      FROM q,
      unnest(list_transform(range(1, len(qv)+1),
             i -> struct_pack(pos := i - 1, x := qv[i]))) AS t(u)
    ),
    g AS (
      SELECT a.pos AS i, b.pos AS j, SUM(a.x * b.x) AS g
      FROM u a JOIN u b USING (vec_id)
      WHERE a.pos <= b.pos
      GROUP BY a.pos, b.pos
    ),
    s AS (SELECT pos, SUM(x) AS s FROM u GROUP BY pos),
    n AS (SELECT count(*) AS n FROM q)
    SELECT g.i, g.j,
           round((CAST(g.g AS DOUBLE) / n.n
                  - (CAST(si.s AS DOUBLE) / n.n)
                    * (CAST(sj.s AS DOUBLE) / n.n))
                 / (1000.0 * 1000.0), 6) + 0.0 AS cov
    FROM g, n
    JOIN s si ON si.pos = g.i
    JOIN s sj ON sj.pos = g.j
    """,
)
def q_emb_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d×d embedding covariance (PCA/whitening input) from mergeable
    integer Gram partials — one Arrow ``mapInPandas`` pass emits
    (n, Σq, Σqqᵀ) per batch, partials reduce with plain sums, final
    cells computed from exact integers
    (``operators/embstats.py::embedding_covariance``)."""
    from institutional_fx_etl_spark.operators.embstats import (
        embedding_covariance,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_covariance(emb, "embedding", dim=64, scale=1000)


@register(
    "dedup_containment",
    f"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
      FROM documents
    ),
    t2 AS (
      SELECT doc_id, {_DUCK_SHINGLES.format(toks='toks')} AS sh
      FROM t WHERE len(toks) >= 3
    ),
    posting AS (
      SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS g FROM t2
    ),
    hot AS (
      SELECT g FROM posting GROUP BY g HAVING count(*) > 64
    ),
    cold AS (
      SELECT * FROM posting WHERE g NOT IN (SELECT g FROM hot)
    ),
    pr AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             a.n_sh AS n_a, b.n_sh AS n_b, count(*) AS shared
      FROM cold a JOIN cold b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
    )
    SELECT id_a, id_b, shared,
           round(CAST(shared AS DOUBLE) / n_a, 6) AS containment_a,
           round(CAST(shared AS DOUBLE) / n_b, 6) AS containment_b
    FROM pr
    WHERE greatest(round(CAST(shared AS DOUBLE) / n_a, 6),
                   round(CAST(shared AS DOUBLE) / n_b, 6)) >= 0.2
    """,
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional n-gram containment near-dup pairs via a
    hot-capped shared-shingle inverted index — catches short-in-long
    duplication that Jaccard's union denominator hides
    (``operators/dedup.py::containment_pairs``). The max_df=64 hot
    cap is mirrored in the oracle's HAVING clause."""
    from institutional_fx_etl_spark.operators.dedup import containment_pairs

    return containment_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.2
    )


@register(
    "bigram_lm_score",
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
      FROM documents
    ),
    doc_bi AS (
      SELECT doc_id,
             concat_ws(' ', toks[i], toks[i+1]) AS bg,
             toks[i] AS w1
      FROM t, unnest(range(1, len(toks))) AS u(i)
      WHERE len(toks) >= 2
    ),
    cb AS (SELECT bg, count(*) AS cb FROM doc_bi GROUP BY bg),
    cu AS (SELECT w1, count(*) AS cu FROM doc_bi GROUP BY w1),
    lp AS (
      SELECT d.doc_id,
             log2(CAST(cb.cb AS DOUBLE) / CAST(cu.cu AS DOUBLE)) AS lp
      FROM doc_bi d JOIN cb USING (bg) JOIN cu USING (w1)
    ),
    agg AS (
      SELECT doc_id, count(*) AS n_bigrams,
             round(SUM(lp) / count(*), 6) AS avg_log2_prob
      FROM lp GROUP BY doc_id
    )
    SELECT doc_id, n_bigrams, avg_log2_prob,
           round(power(2.0, -avg_log2_prob), 6) AS perplexity
    FROM agg
    """,
)
def q_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-fit bigram LM quality scoring (mean log2 probability +
    perplexity per document): two vocabulary-bounded count aggregates,
    two hash joins keying the bigram stream to its counts, one per-doc
    finish — all JVM codegen
    (``operators/text.py::bigram_lm_score``)."""
    from institutional_fx_etl_spark.operators.text import bigram_lm_score

    return bigram_lm_score(load_table(spark, sf_dir, "documents"))


@register(
    "streaming_session_window",
    """
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    OR lag(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    tagged AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM gaps
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events
    FROM tagged GROUP BY user_id, sid
    """,
)
def q_streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING session windows (``session_window`` under Structured
    Streaming, 30-minute gap, event-time watermark): the stateful
    dynamic-window operator — state merges adjacent sessions as
    events arrive and the watermark bounds how long a session can
    stay open. Driven to completion over the bounded events source in
    complete mode (the state store holds every merged session);
    must equal the batch islands computation the oracle runs. The
    batch twin is ``session_window_agg`` — this entry certifies the
    same semantics through the streaming state store path."""
    import tempfile

    from institutional_fx_etl_spark.sources.readers import (
        read_parquet_nanos_safe,
    )

    name = "streaming_session_window_result"
    static = read_parquet_nanos_safe(spark, f"{sf_dir}/events.parquet")
    ts_is_long = dict(static.dtypes).get("ts") == "bigint"
    stream = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_expr = (
        F.expr("timestamp_micros(ts div 1000)")
        if ts_is_long
        else F.col("ts").cast("timestamp")
    )
    agg = (
        stream.select(ts_expr.alias("__ts"), "user_id")
        .withWatermark("__ts", "1 hour")
        .groupBy(
            F.session_window("__ts", "30 minutes").alias("__w"),
            F.col("user_id"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("__w.start").alias("session_start"),
            F.col("__w.end").alias("session_end"),
            "n_events",
        )
    )
    q = _start_stream(
        spark,
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option(
            "checkpointLocation",
            _stream_tmpdir(prefix="stream_session_ck_"),
        )
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


@register(
    "scd2_apply",
    """
    WITH ordered AS (
      SELECT user_id, event_type, ts,
             lag(event_type) OVER
               (PARTITION BY user_id ORDER BY ts, event_type) AS prev
      FROM events
    ),
    versions AS (
      SELECT user_id, event_type, ts FROM ordered
      WHERE prev IS NULL OR prev <> event_type
    )
    SELECT user_id, event_type, ts AS valid_from,
           lead(ts) OVER
             (PARTITION BY user_id ORDER BY ts, event_type) AS valid_to
    FROM versions
    """,
)
def q_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension maintenance (the MERGE INTO primitive):
    an open-row snapshot seeded from each user's first event absorbs
    every later event as a change batch — consecutive identical
    attribute values collapse, each surviving version is closed by
    its successor's timestamp, the last stays open
    (``operators/scd.py::scd2_apply``). One key-partitioned shuffle;
    settled history would stream through untouched."""
    from institutional_fx_etl_spark.operators.scd import scd2_apply

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_type")
    ranked = ev.select(
        "user_id", "event_type", "ts", F.row_number().over(w).alias("__rn")
    )
    dim = ranked.filter("__rn = 1").select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    changes = ranked.filter("__rn > 1").select("user_id", "event_type", "ts")
    return scd2_apply(
        dim,
        changes,
        key_cols=("user_id",),
        attr_cols=("event_type",),
        ts_col="ts",
    )


@register(
    "pagerank_fixed",
    """
    WITH pairs AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    e AS (
      SELECT c * 2 AS src, s * 2 + 1 AS dst FROM pairs
      UNION ALL
      SELECT s * 2 + 1 AS src, c * 2 AS dst FROM pairs
    ),
    deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
    nodes AS (
      SELECT src AS node FROM e UNION SELECT dst AS node FROM e
    ),
    r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM nodes),
    c1 AS (
      SELECT e.dst AS node, SUM(r0.pr // d.deg) AS sm
      FROM e JOIN r0 ON e.src = r0.node JOIN deg d ON e.src = d.src
      GROUP BY e.dst
    ),
    r1 AS (
      SELECT n.node,
             CAST(150000 + (85 * coalesce(c1.sm, 0)) // 100 AS BIGINT)
               AS pr
      FROM nodes n LEFT JOIN c1 ON n.node = c1.node
    ),
    c2 AS (
      SELECT e.dst AS node, SUM(r1.pr // d.deg) AS sm
      FROM e JOIN r1 ON e.src = r1.node JOIN deg d ON e.src = d.src
      GROUP BY e.dst
    ),
    r2 AS (
      SELECT n.node,
             CAST(150000 + (85 * coalesce(c2.sm, 0)) // 100 AS BIGINT)
               AS pr
      FROM nodes n LEFT JOIN c2 ON n.node = c2.node
    ),
    c3 AS (
      SELECT e.dst AS node, SUM(r2.pr // d.deg) AS sm
      FROM e JOIN r2 ON e.src = r2.node JOIN deg d ON e.src = d.src
      GROUP BY e.dst
    ),
    r3 AS (
      SELECT n.node,
             CAST(150000 + (85 * coalesce(c3.sm, 0)) // 100 AS BIGINT)
               AS pr
      FROM nodes n LEFT JOIN c3 ON n.node = c3.node
    )
    SELECT node, pr AS pr_scaled FROM r3
    """,
)
def q_pagerank_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration INTEGER PageRank (3 unrolled rounds, damping
    0.85, teleport 0.15, scale 1e6) over the undirected
    customer↔supplier bipartite graph (distinct trade pairs from
    orders⋈lineitem; customers encode as 2k, suppliers 2k+1).
    Contributions use truncating integer division mirrored on both
    engines, so ranks are exact BIGINTs — no float summation order
    anywhere (``operators/graph.py::pagerank_fixed``)."""
    from institutional_fx_etl_spark.operators.graph import pagerank_fixed

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s")
        )
        .distinct()
    )
    # both directions emitted scan-side from ONE pass over the distinct
    # trade pairs (r14): the former union of two selects duplicated the
    # orders⋈lineitem+distinct subtree — Catalyst plans each union arm
    # independently (guide §2.4, remove repeated subtree evaluation)
    edges = pairs.selectExpr(
        "explode(array(struct(c * 2 AS src, s * 2 + 1 AS dst),"
        " struct(s * 2 + 1 AS src, c * 2 AS dst))) AS e"
    ).select("e.*")
    return pagerank_fixed(edges, iterations=3)


@register(
    "tpch_q2",
    """
    WITH supply AS (
      SELECT l_partkey, l_suppkey,
             MIN(CAST(floor(l_extendedprice * 1000000.0 / l_quantity
                            + 0.5) AS BIGINT)) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eu AS (
      SELECT s.s_suppkey
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    cand AS (
      SELECT p.p_partkey, e.s_suppkey, sp.unit_cost
      FROM part p
      JOIN supply sp ON sp.l_partkey = p.p_partkey
      JOIN eu e ON e.s_suppkey = sp.l_suppkey
      WHERE p.p_size <= 10 AND p.p_type = 'ECONOMY'
    ),
    mn AS (
      SELECT p_partkey, MIN(unit_cost) AS min_cost_micro
      FROM cand GROUP BY p_partkey
    )
    SELECT c.p_partkey, m.min_cost_micro,
           MIN(c.s_suppkey) AS best_suppkey
    FROM cand c
    JOIN mn m ON c.p_partkey = m.p_partkey
              AND c.unit_cost = m.min_cost_micro
    GROUP BY c.p_partkey, m.min_cost_micro
    """,
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): the canonical
    correlated MIN subquery decorrelated into (per-part-supplier agg →
    per-part min → equality join back), with the supplier→nation→
    region dimension chain collapsed to a broadcast semi-filter. The
    reference schema has no partsupp, so unit cost is derived from
    lineitem (min observed extendedprice/quantity, micro-unit BIGINT
    fixed point so the min and the equality join are exact on both
    engines); supplier-key MIN is the deterministic tiebreak the
    canonical query gets from its ORDER BY."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    supply = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(
            F.floor(
                F.col("l_extendedprice")
                * F.lit(1000000.0)
                / F.col("l_quantity")
                + F.lit(0.5)
            )
        ).alias("unit_cost")
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        "r_name = 'EUROPE'"
    )
    eu = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    nation.n_regionkey == region.r_regionkey,
                ).select("n_nationkey")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    part = load_table(spark, sf_dir, "part").filter(
        "p_size <= 10 AND p_type = 'ECONOMY'"
    ).select("p_partkey")
    cand = supply.join(
        F.broadcast(part), supply.l_partkey == part.p_partkey
    ).join(F.broadcast(eu), supply.l_suppkey == eu.s_suppkey).select(
        "p_partkey", "s_suppkey", "unit_cost"
    )
    mn = cand.groupBy("p_partkey").agg(
        F.min("unit_cost").alias("min_cost_micro")
    )
    return (
        cand.join(
            mn.selectExpr("p_partkey AS __pk", "min_cost_micro"),
            (cand.p_partkey == F.col("__pk"))
            & (cand.unit_cost == F.col("min_cost_micro")),
        )
        .groupBy("p_partkey", "min_cost_micro")
        .agg(F.min("s_suppkey").alias("best_suppkey"))
    )


@register(
    "tpch_q9",
    """
    SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
           CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                          * 1000000.0 + 0.5) AS BIGINT)
               - CAST(floor(p.p_retailprice * l.l_quantity
                            * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS profit_micro
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit by nation and year): the
    biggest join fan in the suite — lineitem joined to part (LIKE
    filter pushed into the broadcast build side), supplier→nation,
    and orders, aggregating a revenue-minus-cost expression. partsupp
    is absent, so the cost leg uses p_retailprice·quantity; both
    product terms are per-row micro-unit BIGINTs (floor(x·1e6+0.5))
    so the profit sum is exact integer arithmetic on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        "p_name LIKE '%red%'"
    ).select("p_partkey", "p_retailprice")
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    supp_n = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", "n_name")
    rev = F.floor(
        F.col("l_extendedprice")
        * (F.lit(1) - F.col("l_discount"))
        * F.lit(1000000.0)
        + F.lit(0.5)
    )
    cost = F.floor(
        F.col("p_retailprice")
        * F.col("l_quantity")
        * F.lit(1000000.0)
        + F.lit(0.5)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp_n), li.l_suppkey == F.col("s_suppkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("n_name").alias("nation"),
            # bigint to mirror DuckDB year()'s BIGINT exactly — the
            # driver hash is width-sensitive (round-7 lesson)
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            (rev - cost).alias("__amt"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("__amt").alias("profit_micro"))
    )


@register(
    "tpch_q11",
    """
    WITH nat AS (
      SELECT s.s_suppkey
      FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_1'
    ),
    val AS (
      SELECT l.l_partkey,
             SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS v
      FROM lineitem l JOIN nat ON l.l_suppkey = nat.s_suppkey
      GROUP BY l.l_partkey
    ),
    tot AS (SELECT SUM(v) AS t FROM val)
    SELECT v.l_partkey AS p_partkey, CAST(v.v AS DOUBLE) AS part_value
    FROM val v, tot
    WHERE CAST(v.v AS DOUBLE) > CAST(tot.t AS DOUBLE) * 0.001
    """,
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock concentration): a GROUP BY
    HAVING whose threshold is a scalar subquery over the SAME
    aggregate — computed once, broadcast as a literal-free cross
    join, never recomputed per group. Inventory value is adapted to
    supplier-nation lineitem revenue (no partsupp). Sums are
    DECIMAL-exact; the fraction comparison happens in double on both
    engines after the exact sums."""
    nation = load_table(spark, sf_dir, "nation").filter(
        "n_name = 'NATION_1'"
    )
    nat = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    val = (
        li.join(F.broadcast(nat), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias(
                "v"
            )
        )
    )
    tot = val.agg(F.sum("v").alias("t"))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(
            F.col("v").cast("double")
            > F.col("t").cast("double") * F.lit(0.001)
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("v").cast("double").alias("part_value"),
        )
    )


@register(
    "tpch_q15",
    """
    WITH rev AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount)
                            * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS total_rev_micro
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    ),
    mx AS (SELECT MAX(total_rev_micro) AS m FROM rev)
    SELECT s.s_suppkey, s.s_name, r.total_rev_micro
    FROM rev r
    JOIN mx ON r.total_rev_micro = mx.m
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    """,
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): the revenue view is aggregated
    once, its MAX becomes a broadcast scalar, and the equality filter
    selects the argmax rows (ties kept, exactly as the canonical
    query). Micro-unit BIGINT revenue makes the MAX and the equality
    join exact — no float argmax ambiguity across engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        "l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'"
        " AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'"
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.floor(
                F.col("l_extendedprice")
                * (F.lit(1) - F.col("l_discount"))
                * F.lit(1000000.0)
                + F.lit(0.5)
            )
        ).alias("total_rev_micro")
    )
    mx = rev.agg(F.max("total_rev_micro").alias("m"))
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev_micro") == F.col("m"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev_micro")
    )


@register(
    "tpch_q16",
    """
    SELECT p.p_brand, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type NOT LIKE 'ECONOMY%'
      AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_size
    """,
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): negated
    predicates on the dimension (<> / NOT LIKE / IN-list), a NOT IN
    subquery realized as a broadcast ANTI join against the excluded
    supplier set (s_acctbal<0 stands in for the canonical complaint
    comment — no s_comment in the reduced schema), and a COUNT
    DISTINCT grouped at dimension grain."""
    part = load_table(spark, sf_dir, "part").filter(
        "p_brand <> 'Brand#1' AND p_type NOT LIKE 'ECONOMY%'"
        " AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)"
    ).select("p_partkey", "p_brand", "p_size")
    bad = load_table(spark, sf_dir, "supplier").filter(
        "s_acctbal < 0"
    ).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(
            F.broadcast(bad),
            li.l_suppkey == bad.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q20",
    """
    WITH red AS (
      SELECT p_partkey FROM part WHERE p_name LIKE '%red%'
    ),
    avail AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS DECIMAL(18,4))) AS avail_qty
      FROM lineitem JOIN red ON l_partkey = p_partkey
      GROUP BY l_partkey, l_suppkey
    ),
    dem AS (
      SELECT l_partkey, SUM(CAST(l_quantity AS DECIMAL(18,4)))
               AS yr_demand
      FROM lineitem JOIN red ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_partkey
    ),
    excess AS (
      SELECT DISTINCT avail.l_suppkey
      FROM avail JOIN dem ON avail.l_partkey = dem.l_partkey
      WHERE CAST(avail.avail_qty AS DOUBLE)
            > 0.5 * CAST(dem.yr_demand AS DOUBLE)
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN excess e ON s.s_suppkey = e.l_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_2'
    """,
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (excess-supply suppliers): a nested-aggregate
    semi-join chain — the supplier's all-time shipped quantity per
    part stands in for partsupp.ps_availqty and is compared to half
    the part's 1996 demand (the canonical availqty > 0.5·year-demand
    predicate), DISTINCT supplier keys semi-filter the supplier dim,
    nation broadcast-filters the result. Both quantity sums are
    DECIMAL-exact; only the final fraction comparison runs in double,
    identically on both engines."""
    red = load_table(spark, sf_dir, "part").filter(
        "p_name LIKE '%red%'"
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"
    ).join(F.broadcast(red), F.col("l_partkey") == red.p_partkey)
    qdec = F.col("l_quantity").cast("decimal(18,4)")
    avail = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(qdec).alias("avail_qty")
    )
    dem = (
        li.filter(
            "l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'"
            " AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'"
        )
        .groupBy("l_partkey")
        .agg(F.sum(qdec).alias("yr_demand"))
    )
    excess = (
        avail.join(
            dem.selectExpr("l_partkey AS __pk", "yr_demand"),
            avail.l_partkey == F.col("__pk"),
        )
        .filter(
            F.col("avail_qty").cast("double")
            > F.lit(0.5) * F.col("yr_demand").cast("double")
        )
        .select("l_suppkey")
        .distinct()
    )
    nation = load_table(spark, sf_dir, "nation").filter(
        "n_name = 'NATION_2'"
    )
    return (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(excess, F.col("s_suppkey") == excess.l_suppkey)
        .select("s_suppkey", "s_name")
    )


@register(
    "twap_events",
    """
    WITH stepped AS (
      SELECT event_type,
             CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT) AS vmic,
             lead(epoch_us(ts)) OVER (
               PARTITION BY event_type ORDER BY ts, event_id
             ) - epoch_us(ts) AS dt
      FROM events
    )
    SELECT event_type,
           round(CAST(SUM(vmic * CAST(dt AS HUGEINT)) AS DOUBLE)
                 / CAST(SUM(CAST(dt AS HUGEINT)) AS DOUBLE)
                 / 1000000.0, 6) AS twap,
           round(CAST(SUM(CAST(dt AS HUGEINT)) AS DOUBLE)
                 / 1000000.0, 6) AS dur_seconds
    FROM stepped WHERE dt IS NOT NULL
    GROUP BY event_type
    """,
)
def q_twap_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of the event value per event type over
    the irregular event stream — each observation weighted by its
    holding time to the successor (micro-unit integer Δt·value sums,
    one ordered window + one hash agg;
    ``operators/timeseries.py::twap``)."""
    from institutional_fx_etl_spark.operators.timeseries import twap

    return twap(
        load_table(spark, sf_dir, "events"),
        ts_col="ts",
        value_col="value",
        group_cols=("event_type",),
        tiebreak_col="event_id",
    )


@register(
    "event_transitions",
    """
    WITH seq AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS to_type
      FROM events
    ),
    cnt AS (
      SELECT from_type, to_type, count(*) AS n
      FROM seq WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type
    ),
    tot AS (
      SELECT from_type, CAST(SUM(n) AS BIGINT) AS t
      FROM cnt GROUP BY from_type
    )
    SELECT c.from_type, c.to_type, CAST(c.n AS BIGINT) AS n,
           round(CAST(c.n AS DOUBLE) / CAST(t.t AS DOUBLE), 6) AS prob
    FROM cnt c JOIN tot t ON c.from_type = t.from_type
    """,
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of the per-user event
    stream: successor event type via one user-keyed ordered window
    (total-order tiebreak on event_id), transition counts in one hash
    aggregate, and row-normalized probabilities from a broadcast join
    against the per-source totals — |types|² output rows regardless
    of corpus size."""
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cnt = (
        events.withColumn(
            "to_type", F.lead("event_type").over(w)
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"), F.col("to_type")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = cnt.groupBy(F.col("from_type").alias("__f")).agg(
        F.sum("n").alias("t")
    )
    return (
        cnt.join(F.broadcast(tot), cnt.from_type == F.col("__f"))
        .select(
            "from_type",
            "to_type",
            "n",
            F.round(
                F.col("n").cast("double") / F.col("t").cast("double"), 6
            ).alias("prob"),
        )
    )


@register(
    "triangle_count",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    e AS (
      SELECT DISTINCT i1.p AS a, i2.p AS b
      FROM items i1 JOIN items i2 ON i1.o = i2.o AND i1.p < i2.p
    ),
    deg AS (
      SELECT node, count(*) AS d FROM (
        SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e
      ) GROUP BY node
    ),
    w AS (
      SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges FROM deg
    ),
    ne AS (SELECT count(*) AS n_edges FROM e),
    tri AS (
      SELECT count(*) AS n_triangles
      FROM e e1
      JOIN e e2 ON e1.b = e2.a
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT n_edges, n_wedges, n_triangles,
           round(CAST(3.0 AS DOUBLE) * n_triangles / n_wedges, 6)
             AS global_clustering
    FROM ne, w, tri
    """,
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle census + global clustering coefficient of the
    part co-purchase graph (parts are linked when they appear in the
    same order): ordered-wedge two-join plan, each triangle counted
    once under the a<b<c total order
    (``operators/graph.py::triangle_count``)."""
    from institutional_fx_etl_spark.operators.graph import triangle_count

    # r14 note: a basket-aggregate pair emission (collect_set +
    # in-array C(k,2) emit) was measured against this self-join form
    # feeding the full census and lost (4.18 s vs 3.33 s warm at
    # sf0.1): the emission's nested-lambda Generate is interpreted
    # per-pair CPU that exchange reuse cannot dedup, while the
    # self-join's duplicate subtrees dedup at their exchanges.
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
        )
        .distinct()
    )
    i2 = items.selectExpr("o", "p AS p2")
    edges = (
        items.join(i2, "o")
        .filter(F.col("p") < F.col("p2"))
        .select(F.col("p").alias("src"), F.col("p2").alias("dst"))
    )
    return triangle_count(edges)


@register(
    "bpe_merge_candidates",
    """
    WITH words AS (
      SELECT w, count(*) AS cnt FROM (
        SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w
        FROM documents
      ) WHERE w <> '' GROUP BY w
    ),
    pairs AS (
      SELECT unnest(list_transform(range(1, length(w)),
                    i -> substr(w, CAST(i AS INT), 2))) AS pair,
             cnt
      FROM words WHERE length(w) >= 2
    )
    SELECT pair, CAST(SUM(cnt) AS BIGINT) AS freq
    FROM pairs GROUP BY pair
    ORDER BY freq DESC, pair LIMIT 20
    """,
)
def q_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer training, first merge round: most frequent adjacent
    character pairs weighted by word frequency, computed over the
    distinct vocabulary (Sennrich-style) so the corpus is scanned
    once (``operators/text.py::bpe_merge_candidates``)."""
    from institutional_fx_etl_spark.operators.text import (
        bpe_merge_candidates,
    )

    return bpe_merge_candidates(
        load_table(spark, sf_dir, "documents"), top_k=20
    )


@register(
    "cdc_snapshot",
    """
    WITH log AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END
               AS op,
             event_type, value
      FROM events
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM log
    )
    SELECT user_id, ts, op, event_type, value
    FROM ranked WHERE rn = 1 AND op <> 'D'
    """,
)
def q_cdc_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log compaction to the current snapshot: the event stream
    as a change log (error events act as deletes), last-writer-wins
    per user under the (ts, event_id) total order, latest-deleted
    users absent (``operators/scd.py::cdc_apply``)."""
    from institutional_fx_etl_spark.operators.scd import cdc_apply

    log = load_table(spark, sf_dir, "events").selectExpr(
        "user_id",
        "ts",
        "event_id",
        "CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op",
        "event_type",
        "value",
    )
    return cdc_apply(
        log,
        key_cols=("user_id",),
        ts_col="ts",
        op_col="op",
        payload_cols=("event_type", "value"),
        tiebreak_col="event_id",
    )


def _pq_adc_oracle(k: int = 10) -> str:
    """DuckDB mirror of operators.similarity.pq_adc_topk: the PQ
    encode CTE (same frozen codebook) + the SAME driver-computed LUT
    literals, summed in the same left-assoc order, ordered by the
    unrounded adc with the id tiebreak."""
    from institutional_fx_etl_spark.operators.similarity import (
        _ADC_QUERY,
        _PQ_CODEBOOK,
    )

    m_sub, k_cent = len(_PQ_CODEBOOK), len(_PQ_CODEBOOK[0])
    dims = len(_PQ_CODEBOOK[0][0])
    luts = [
        [
            sum(
                (_ADC_QUERY[m * dims + d] - _PQ_CODEBOOK[m][c][d]) ** 2
                for d in range(dims)
            )
            for c in range(k_cent)
        ]
        for m in range(m_sub)
    ]
    terms = [
        "(["
        + ", ".join(repr(v) for v in luts[m])
        + f"])[code_{m} + 1]"
        for m in range(m_sub)
    ]
    adc = " + ".join(terms)
    codes = ", ".join(f"code_{m}" for m in range(m_sub))
    return f"""
    WITH enc AS ({_pq_oracle()})
    SELECT id, {codes}, CAST(round(adc, 6) AS DOUBLE) AS adc_dist FROM (
      SELECT id, {codes}, {adc} AS adc FROM enc
    ) ORDER BY adc, id LIMIT {k}
    """


@register("pq_adc_topk", _pq_adc_oracle())
def q_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ scan stage: asymmetric-distance (ADC) top-10 over the
    PQ-encoded embeddings corpus — per-subspace LUT of squared
    distances to the frozen query, each row costs M ``element_at``
    lookups + an add chain, partial top-k merge
    (``operators/similarity.py::pq_adc_topk``)."""
    from institutional_fx_etl_spark.operators.similarity import pq_adc_topk

    return pq_adc_topk(load_table(spark, sf_dir, "embeddings"), k=10)


@register(
    "dedup_editdistance",
    """
    WITH d AS (SELECT doc_id AS id, lower(text) AS t,
                      length(lower(text)) AS ln
               FROM documents),
    blocks AS (SELECT id, t, ln, (ln // 8) + e AS blk
               FROM d, (SELECT unnest([0, 1]) AS e)),
    small AS (SELECT blk FROM blocks GROUP BY blk HAVING count(*) <= 256),
    bl AS (SELECT b.* FROM blocks b JOIN small USING (blk)),
    pairs AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b,
             levenshtein(a.t, b.t) AS dist
      FROM bl a JOIN bl b ON a.blk = b.blk AND a.id < b.id
      WHERE abs(a.ln - b.ln) <= 8)
    SELECT id_a, id_b, CAST(dist AS INTEGER) AS dist
    FROM pairs WHERE dist <= 8
    """,
)
def q_dedup_editdistance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked exact Levenshtein near-dup pairs (character-grain dedup:
    OCR noise / small in-place edits that shingle Jaccard misses).
    Length-bucket double-emit blocking is lossless for dist<=max_edits;
    oversized blocks drop whole under the max_block cap (mirrored in
    the oracle) — ``operators/dedup.py::editdistance_pairs``."""
    from institutional_fx_etl_spark.operators.dedup import editdistance_pairs

    return editdistance_pairs(load_table(spark, sf_dir, "documents"))


@register(
    "graph_bfs_hops",
    """
    WITH RECURSIVE
    items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
              FROM lineitem),
    g AS (SELECT DISTINCT a.p AS src, b.p AS dst
          FROM items a JOIN items b ON a.o = b.o AND a.p < b.p),
    e AS (SELECT src AS s, dst AS d FROM g
          UNION SELECT dst, src FROM g),
    seeds AS (SELECT DISTINCT p AS node FROM items WHERE p % 97 = 0),
    bfs AS (
      SELECT node, 0 AS hops FROM seeds
      UNION
      SELECT e.d AS node, b.hops + 1 AS hops
      FROM bfs b JOIN e ON b.node = e.s WHERE b.hops < 3
    )
    SELECT node, CAST(min(hops) AS INTEGER) AS hops
    FROM bfs GROUP BY node
    """,
)
def q_graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded (3-hop) BFS distance from a seed set (partkeys divisible
    by 97) over the part co-purchase graph — k-hop neighborhood /
    contamination-blast-radius expansion as unrolled frontier
    join+anti-join rounds (``operators/graph.py::bfs_hops``); the
    oracle is a bounded recursive CTE + min(hops)."""
    from institutional_fx_etl_spark.operators.graph import bfs_hops

    items = (
        load_table(spark, sf_dir, "lineitem")
        .selectExpr("l_orderkey AS o", "l_partkey AS p")
        .distinct()
    )
    a = items.selectExpr("o", "p AS src")
    b = items.selectExpr("o", "p AS dst")
    edges = a.join(b, "o").filter("src < dst").select("src", "dst").distinct()
    seeds = items.filter("p % 97 = 0").selectExpr("p AS node").distinct()
    out = bfs_hops(edges, seeds, max_hops=3)
    return out.selectExpr("node", "CAST(hops AS INT) AS hops")


@register(
    "spearman_corr",
    """
    WITH r AS (
      SELECT l_returnflag,
        row_number() OVER (PARTITION BY l_returnflag
          ORDER BY l_quantity, l_orderkey, l_linenumber) AS rx,
        row_number() OVER (PARTITION BY l_returnflag
          ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS ry
      FROM lineitem),
    a AS (SELECT l_returnflag, count(*) AS n,
                 sum(CAST((rx - ry) AS DECIMAL(38,0)) * (rx - ry)) AS sd2
          FROM r GROUP BY 1)
    SELECT l_returnflag, CAST(n AS BIGINT) AS n,
      CASE WHEN n > 1 THEN
        floor((1.0 - 6.0 * CAST(sd2 AS DOUBLE)
          / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
             - 1.0))) * 1e6 + 0.5) / 1e6
      ELSE NULL END AS spearman
    FROM a
    """,
)
def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-broken Spearman rank correlation of quantity vs
    extended price per return flag: row_number ranks over a TOTAL
    order, Σd² as DECIMAL, the ρ = 1 − 6Σd²/(n(n²−1)) closed form with
    one final double division mirrored shape-identically
    (``operators/timeseries.py::spearman_corr``)."""
    from institutional_fx_etl_spark.operators.timeseries import spearman_corr

    return spearman_corr(
        load_table(spark, sf_dir, "lineitem"),
        "l_quantity",
        "l_extendedprice",
        group_cols=("l_returnflag",),
        tiebreak_cols=("l_orderkey", "l_linenumber"),
    )


@register(
    "benford_profile",
    """
    WITH v AS (
      SELECT CAST(substr(CAST(CAST(floor(l_extendedprice * 100 + 0.5)
               AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
      FROM lineitem WHERE l_extendedprice > 0),
    c AS (SELECT digit, count(*) AS n FROM v GROUP BY digit),
    t AS (SELECT sum(n) AS tt FROM c),
    base AS (
      SELECT digit, n,
        floor(CAST(n AS DOUBLE) / CAST(tt AS DOUBLE) * 1e6 + 0.5) / 1e6
          AS ratio,
        CASE digit
          WHEN 1 THEN CAST(0.301030 AS DOUBLE)
          WHEN 2 THEN CAST(0.176091 AS DOUBLE)
          WHEN 3 THEN CAST(0.124939 AS DOUBLE)
          WHEN 4 THEN CAST(0.096910 AS DOUBLE)
          WHEN 5 THEN CAST(0.079181 AS DOUBLE)
          WHEN 6 THEN CAST(0.066947 AS DOUBLE)
          WHEN 7 THEN CAST(0.057992 AS DOUBLE)
          WHEN 8 THEN CAST(0.051153 AS DOUBLE)
          WHEN 9 THEN CAST(0.045757 AS DOUBLE)
        END AS expected
      FROM c, t)
    SELECT digit, CAST(n AS BIGINT) AS n, ratio, expected,
           floor((ratio - expected) * 1e6 + 0.5) / 1e6 AS deviation
    FROM base
    """,
)
def q_benford_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit screen on extended price:
    fixed-point BIGINT → string first digit (engine-identical, no
    float log10 magnitude), counts + 6-dp ratio/deviation against the
    frozen Benford literals
    (``operators/profiling.py::benford_profile``)."""
    from institutional_fx_etl_spark.operators.profiling import benford_profile

    return benford_profile(
        load_table(spark, sf_dir, "lineitem"), "l_extendedprice", scale=100
    )


@register(
    "rolling_distinct_users",
    """
    WITH days AS (SELECT DISTINCT date_trunc('day', ts) AS day
                  FROM events),
    ev AS (SELECT date_trunc('day', ts) AS d, user_id FROM events)
    SELECT CAST(days.day AS TIMESTAMP) AS day,
           CAST(count(DISTINCT ev.user_id) AS BIGINT) AS user_id_7d
    FROM days JOIN ev
      ON ev.d BETWEEN days.day - INTERVAL 6 DAY AND days.day
    GROUP BY days.day
    """,
)
def q_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day EXACT distinct active users per day: each event
    emits its ≤7 target days scan-side (constant fan-out, no day×fact
    range join), semi-join to occurring days, one distinct-count
    aggregate (``operators/timeseries.py::rolling_distinct``)."""
    from institutional_fx_etl_spark.operators.timeseries import (
        rolling_distinct,
    )

    return rolling_distinct(
        load_table(spark, sf_dir, "events"), "ts", "user_id", window_days=7
    )


@register(
    "cooccurrence_lift",
    """
    WITH d AS (
      SELECT doc_id,
             list_slice(list_sort(list_distinct(
               string_split_regex(lower(text), '\\s+'))), 1, 40) AS ts
      FROM documents),
    n AS (SELECT count(*) AS nd FROM d),
    tc AS (
      SELECT t, count(*) AS n_t
      FROM (SELECT unnest(ts) AS t FROM d) WHERE t <> '' GROUP BY t),
    pr AS (
      SELECT a.t AS tok_a, b.t AS tok_b, count(*) AS n_ab
      FROM (SELECT doc_id, unnest(ts) AS t FROM d) a
      JOIN (SELECT doc_id, unnest(ts) AS t FROM d) b
        ON a.doc_id = b.doc_id AND a.t < b.t
      WHERE a.t <> '' AND b.t <> ''
      GROUP BY 1, 2 HAVING count(*) >= 5)
    SELECT tok_a, tok_b, n_ab, ta.n_t AS n_a, tb.n_t AS n_b,
      floor(CAST(n_ab AS DOUBLE) * nd
        / (CAST(ta.n_t AS DOUBLE) * CAST(tb.n_t AS DOUBLE))
        * 1e6 + 0.5) / 1e6 AS lift
    FROM pr JOIN tc ta ON pr.tok_a = ta.t
            JOIN tc tb ON pr.tok_b = tb.t, n
    """,
)
def q_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token co-occurrence lift (PMI's association ratio without its
    libm logarithm — exact integer counts, one IEEE division):
    attract/repel pairs over document frequencies with a constant
    per-doc pair fan-out (``operators/text.py::cooccurrence_lift``)."""
    from institutional_fx_etl_spark.operators.text import cooccurrence_lift

    return cooccurrence_lift(load_table(spark, sf_dir, "documents"))


#: frozen toy vocabulary for the coverage contract query — a stand-in
#: for a real tokenizer's lexicon, mirrored verbatim in the oracle
_COVERAGE_VOCAB = [
    "the", "of", "and", "to", "in", "a", "is", "that", "for", "it",
    "on", "with", "as", "by", "at", "from", "this", "be", "are", "an",
]


@register(
    "tokenizer_coverage",
    f"""
    WITH t AS (
      SELECT source AS grp,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents),
    c AS (
      SELECT grp, len(toks) AS n,
             len(list_filter(toks, x -> list_contains(
               {sorted(_COVERAGE_VOCAB)!r}, x))) AS cov
      FROM t)
    SELECT grp, CAST(sum(n) AS BIGINT) AS n_tokens,
           CAST(sum(cov) AS BIGINT) AS n_covered,
           floor(CAST(sum(cov) AS DOUBLE) / CAST(sum(n) AS DOUBLE)
             * 1e6 + 0.5) / 1e6 AS coverage
    FROM c GROUP BY grp
    """,
)
def q_tokenizer_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocabulary coverage per source: share of token
    occurrences inside a frozen vocabulary literal — scan-side
    membership fold, exact integers, one final division
    (``operators/text.py::tokenizer_coverage``)."""
    from institutional_fx_etl_spark.operators.text import tokenizer_coverage

    return tokenizer_coverage(
        load_table(spark, sf_dir, "documents"), _COVERAGE_VOCAB
    )


@register(
    "k_anonymity",
    """
    WITH g AS (
      SELECT lang, source, n_chars // 100 AS len_bucket,
             count(*) AS gs
      FROM documents GROUP BY 1, 2, 3),
    a AS (
      SELECT CAST(sum(gs) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_groups,
             CAST(min(gs) AS BIGINT) AS min_group_size,
             CAST(sum(CASE WHEN gs < 5 THEN 1 ELSE 0 END) AS BIGINT)
               AS groups_below_k,
             CAST(sum(CASE WHEN gs < 5 THEN gs ELSE 0 END) AS BIGINT)
               AS rows_below_k
      FROM g)
    SELECT n_rows, n_groups, min_group_size, groups_below_k,
           rows_below_k,
           floor(CAST(rows_below_k AS DOUBLE) / CAST(n_rows AS DOUBLE)
             * 1e6 + 0.5) / 1e6 AS at_risk_share
    FROM a
    """,
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity risk profile of the documents table under the
    (lang, source, length-bucket) quasi-identifier: one row with group
    counts and the at-risk row share
    (``operators/profiling.py::k_anonymity``)."""
    from institutional_fx_etl_spark.operators.profiling import k_anonymity

    docs = load_table(spark, sf_dir, "documents").selectExpr(
        "lang", "source", "n_chars div 100 AS len_bucket"
    )
    return k_anonymity(docs, ["lang", "source", "len_bucket"], k=5)


@register(
    "dedup_incremental",
    None,  # placeholder — real SQL assigned below (reuses the
    # dedup_minhash_lsh CTE chain; see _finalize_incremental_oracle)
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MinHash dedup: merge a 20% 'new batch' (doc_id % 5
    = 0) into the existing corpus and emit ONLY pairs touching a new
    doc — the full run's output restricted to new-involving pairs,
    with the hot-bucket cap evaluated on the combined corpus
    (``operators/dedup.py::minhash_lsh_pairs(new_col=...)``)."""
    from institutional_fx_etl_spark.operators.dedup import minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "__isnew", F.expr("doc_id % 5 = 0")
    )
    return minhash_lsh_pairs(
        docs, jaccard_threshold=0.2, new_col="__isnew"
    )


def _finalize_incremental_oracle() -> None:
    """The incremental oracle IS the full minhash oracle + the
    new-involving filter — share the CTE text so the two can never
    drift (the max_bucket=64 mirroring lesson, ROADMAP §25)."""
    fn, _ = REGISTRY["dedup_incremental"]
    full = REGISTRY["dedup_minhash_lsh"][1]
    REGISTRY["dedup_incremental"] = (
        fn,
        f"""
        SELECT * FROM ({full})
        WHERE id_a % 5 = 0 OR id_b % 5 = 0
        """,
    )


_finalize_incremental_oracle()


@register(
    "leakage_safe_split",
    """
    WITH h AS (
      SELECT doc_id, md5(lower(text)) AS group_key,
             CAST(concat('0x', substr(md5(concat('lsplit',
               md5(lower(text)))), 1, 8)) AS BIGINT) % 100 AS b
      FROM documents)
    SELECT doc_id,
           CASE WHEN b < 10 THEN 'test'
                WHEN b < 20 THEN 'validation'
                ELSE 'train' END AS split,
           group_key
    FROM h
    """,
)
def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: the split coin is drawn per
    exact-duplicate GROUP (md5 of case-folded text), so no duplicate
    pair can straddle train and test — the eval-integrity upgrade over
    per-row hash splitting (``operators/dedup.py::leakage_safe_split``)."""
    from institutional_fx_etl_spark.operators.dedup import leakage_safe_split

    return leakage_safe_split(load_table(spark, sf_dir, "documents"))


# --- round-7 continuation: indicator/profiling/analytics widening ----

from institutional_fx_etl_spark.operators.timeseries import (  # noqa: E402
    candle_pattern_exprs,
    ewma_exprs,
)

_EWMA8 = ewma_exprs(
    "value", "(PARTITION BY event_type ORDER BY ts, event_id)"
)


@register(
    "ewma",
    f"""
    SELECT event_type, event_id, ts, value,
           {_EWMA8} AS ewma8
    FROM events WHERE value IS NOT NULL
    """,
)
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated-horizon EWMA (α=0.25, 8 lags, head-renormalized) per
    event-type series — the distributable form of the serial EWMA
    recurrence (``operators/timeseries.py::ewma_exprs``): one
    partitioned window sort feeds all 8 ``lag`` terms, weights are
    shared ``CAST('<repr>' AS DOUBLE)`` literals so the oracle is
    bit-identical."""
    ev = load_table(spark, sf_dir, "events").filter("value IS NOT NULL")
    return ev.selectExpr(
        "event_type", "event_id", "ts", "value", f"{_EWMA8} AS ewma8"
    )


_CP_OVER = "(PARTITION BY event_type ORDER BY datetime)"
_CP_FLAGS = candle_pattern_exprs(_CP_OVER)
_CP_ANY = "doji OR hammer OR shooting_star OR bull_engulf OR bear_engulf"


@register(
    "candle_patterns",
    f"""
    WITH t AS (
      SELECT event_type, ts, value + 0.01 AS ask, value - 0.01 AS bid
      FROM events
    ),
    t2 AS (
      SELECT event_type, ts, (ask + bid) / 2 AS mid, ask FROM t
    ),
    c AS (
      SELECT event_type, date_trunc('hour', ts) AS datetime,
             first(mid ORDER BY ts, mid) AS open,
             max(mid) AS high,
             min(mid) AS low,
             last(mid ORDER BY ts, mid) AS close
      FROM t2 GROUP BY 1, 2
    ),
    p AS (
      SELECT event_type, datetime, open, high, low, close,
             {", ".join(_CP_FLAGS)}
      FROM c
    )
    SELECT * FROM p WHERE {_CP_ANY}
    """,
)
def q_candle_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candlestick-pattern screen over hourly per-symbol candles —
    doji / hammer / shooting star / engulfing flags
    (``operators/timeseries.py::candle_pattern_exprs``) on the
    mergeable-OHLC layer (A1-A3), one lag window pass per symbol, flag
    expressions shared verbatim with the oracle."""
    ev = load_table(spark, sf_dir, "events")
    ticks = ev.select(
        "event_type",
        F.col("ts").alias("datetime"),
        (F.col("value") + 0.01).alias("ask"),
        (F.col("value") - 0.01).alias("bid"),
    )
    candles = ticks_to_candles(
        ticks, window_duration="1 hour", partition_cols=("event_type",)
    )
    return candles.selectExpr(
        "event_type", "datetime", "open", "high", "low", "close",
        *_CP_FLAGS,
    ).filter(_CP_ANY)


@register(
    "chisq_independence",
    """
    WITH cells AS (
      SELECT c_mktsegment AS a, c_nationkey % 5 AS b, count(*) AS o
      FROM customer GROUP BY 1, 2
    ),
    marg AS (
      SELECT a, b, o,
             SUM(o) OVER (PARTITION BY a) AS r,
             SUM(o) OVER (PARTITION BY b) AS c,
             SUM(o) OVER () AS n
      FROM cells
    ),
    terms AS (
      SELECT a, b, n,
             (CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * CAST(c AS DOUBLE)
              / CAST(n AS DOUBLE))
             * (CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * CAST(c AS DOUBLE)
              / CAST(n AS DOUBLE))
             / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
               AS term,
             (CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
               AS e
      FROM marg
    )
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           CAST((count(DISTINCT a) - 1) * (count(DISTINCT b) - 1)
                AS BIGINT) AS dof,
           CAST(SUM(CAST(floor(term * 1e6 + 0.5) AS DECIMAL(38,0)))
                + CAST(MAX(n) AS DECIMAL(38,0)) * 1000000
                - SUM(CAST(floor(e * 1e6 + 0.5) AS DECIMAL(38,0)))
                AS DOUBLE) / 1e6 AS chi2
    FROM terms
    """,
)
def q_chisq_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence test (market segment × nation
    bucket) — contingency aggregate + tiny-table window marginals +
    micro-unit decimal term sum
    (``operators/profiling.py::chisq_independence``)."""
    from institutional_fx_etl_spark.operators.profiling import (
        chisq_independence,
    )

    cust = load_table(spark, sf_dir, "customer").selectExpr(
        "c_mktsegment", "c_nationkey % 5 AS nat_bucket"
    )
    out = chisq_independence(cust, "c_mktsegment", "nat_bucket")
    return out.selectExpr(
        "CAST(n_cells AS BIGINT) AS n_cells",
        "CAST(dof AS BIGINT) AS dof",
        "chi2",
    )


@register(
    "bot_rate_profile",
    """
    WITH m AS (
      SELECT user_id, date_trunc('minute', ts) AS minute, count(*) AS epm
      FROM events GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(max(epm) AS BIGINT) AS max_epm,
           CAST(SUM(epm) AS BIGINT) AS n_events,
           CAST(count(*) AS BIGINT) AS active_minutes,
           (max(epm) >= 3 OR SUM(epm) >= count(*) * 2) AS bot_flag
    FROM m GROUP BY 1
    """,
)
def q_bot_rate_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot/abuse-rate profile per user — burst detection every event
    pipeline runs before trusting engagement counts: per-minute event
    rates re-aggregated to per-user peaks (A4 partial→final shape:
    the minute grain collapses map-side, the user grain is the only
    wide shuffle), flag = peak ≥ 3/min or sustained ≥ 2/active-minute.
    Pure integer arithmetic — exact on any engine."""
    ev = load_table(spark, sf_dir, "events")
    m = ev.groupBy(
        "user_id", F.date_trunc("minute", F.col("ts")).alias("minute")
    ).agg(F.count(F.lit(1)).alias("epm"))
    return m.groupBy("user_id").agg(
        F.expr("CAST(max(epm) AS BIGINT) AS max_epm"),
        F.expr("CAST(SUM(epm) AS BIGINT) AS n_events"),
        F.expr("CAST(count(*) AS BIGINT) AS active_minutes"),
        F.expr(
            "(max(epm) >= 3 OR SUM(epm) >= count(*) * 2) AS bot_flag"
        ),
    )


@register(
    "source_rollup",
    """
    SELECT source, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT md5(lower(text))) AS BIGINT)
             AS n_distinct_texts,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(floor(CAST(count(*) - count(DISTINCT md5(lower(text)))
                           AS DOUBLE) * 1e6
                      / CAST(count(*) AS DOUBLE) + 0.5) AS BIGINT)
             AS dup_rate_micro
    FROM documents GROUP BY 1, 2
    """,
)
def q_source_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) corpus rollup — the C4-style provenance
    audit: doc counts, exact distinct-text counts (32-byte md5 keys,
    text never shuffles), total chars, and a fixed-point exact-dup
    rate. One hash aggregate; distinct rides the same shuffle as the
    group keys."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source", "lang").agg(
        F.expr("CAST(count(*) AS BIGINT) AS n_docs"),
        F.expr(
            "CAST(count(DISTINCT md5(lower(text))) AS BIGINT)"
            " AS n_distinct_texts"
        ),
        F.expr("CAST(SUM(n_chars) AS BIGINT) AS sum_chars"),
        F.expr(
            "CAST(floor(CAST(count(*) - count(DISTINCT md5(lower(text)))"
            " AS DOUBLE) * 1e6"
            " / CAST(count(*) AS DOUBLE) + 0.5) AS BIGINT)"
            " AS dup_rate_micro"
        ),
    )


@register(
    "anova_oneway",
    """
    WITH x AS (
      SELECT event_type AS g,
             CAST(floor(value * 1e6 + 0.5) AS DECIMAL(18,0)) AS v
      FROM events WHERE value IS NOT NULL
    ),
    grp AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n_g,
             SUM(v) AS s_g, SUM(v * v) AS q_g
      FROM x GROUP BY 1
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(SUM(n_g) AS BIGINT) AS n,
             CAST(SUM(s_g) AS DOUBLE) / 1e6 AS s,
             CAST(SUM(q_g) AS DOUBLE) / 1e12 AS q,
             CAST(SUM(CAST(floor(((CAST(s_g AS DOUBLE) / 1e6)
                 * (CAST(s_g AS DOUBLE) / 1e6)
                 / CAST(n_g AS DOUBLE)) * 1e6 + 0.5)
               AS DECIMAL(38,0))) AS DOUBLE) / 1e6 AS t_between
      FROM grp
    )
    SELECT k, n,
           round(t_between - s * s / CAST(n AS DOUBLE), 6) AS ssb,
           round(q - t_between, 6) AS ssw,
           round(((t_between - s * s / CAST(n AS DOUBLE))
                  / CAST(k - 1 AS DOUBLE))
                 / ((q - t_between) / CAST(n - k AS DOUBLE)), 6) AS f_stat
    FROM agg
    """,
)
def q_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of event value across event types —
    micro-unit DECIMAL moment sums + per-group mirrored-double
    between-term (``operators/profiling.py::anova_oneway``)."""
    from institutional_fx_etl_spark.operators.profiling import anova_oneway

    return anova_oneway(
        load_table(spark, sf_dir, "events"), "value", "event_type"
    )


@register(
    "ks_two_sample",
    """
    WITH p AS (
      SELECT value AS v,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS ib
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')
    ),
    c AS (
      SELECT v, CAST(SUM(ia) AS BIGINT) AS ca,
             CAST(SUM(ib) AS BIGINT) AS cb
      FROM p GROUP BY v
    ),
    w AS (
      SELECT v,
             SUM(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS cum_a,
             SUM(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS cum_b
      FROM c
    ),
    t AS (
      SELECT CAST(SUM(ia) AS BIGINT) AS n_a,
             CAST(SUM(ib) AS BIGINT) AS n_b
      FROM p
    )
    SELECT n_a, n_b,
           round(max(abs(CAST(cum_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                 - CAST(cum_b AS DOUBLE) / CAST(n_b AS DOUBLE))), 6)
             AS ks_d
    FROM w, t GROUP BY n_a, n_b
    """,
)
def q_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS distance (click vs purchase value ECDFs) — the
    distribution-shift test, computed with the two-level range-bucket
    prefix sum (no single-partition full-data window;
    ``operators/profiling.py::ks_two_sample``). The single-node oracle
    uses the plain global window — integer cumsums make the
    decomposition exact."""
    from institutional_fx_etl_spark.operators.profiling import ks_two_sample

    return ks_two_sample(
        load_table(spark, sf_dir, "events"),
        "value",
        "event_type",
        "click",
        "purchase",
    )


@register(
    "gini_by_group",
    """
    WITH cents AS (
      SELECT c_nationkey AS grp, c_custkey AS k,
             CAST(floor(greatest(c_acctbal, 0.0) * 100 + 0.5) AS BIGINT)
               AS xc
      FROM customer
    ),
    ranked AS (
      SELECT grp, xc,
             row_number() OVER (PARTITION BY grp ORDER BY xc, k) AS i,
             count(*) OVER (PARTITION BY grp) AS n
      FROM cents
    ),
    agg AS (
      SELECT grp, CAST(max(n) AS BIGINT) AS n,
             SUM(CAST(xc AS DECIMAL(18,0))) AS sx,
             SUM(CAST(xc AS DECIMAL(18,0))
                 * CAST(2 * i - n - 1 AS DECIMAL(19,0))) AS sw
      FROM ranked GROUP BY grp
    )
    SELECT grp, n,
           round(CAST(sx AS DOUBLE) / 100, 2) AS total,
           round(CAST(sw AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS gini
    FROM agg
    """,
)
def q_gini_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Gini of customer balances — rank-weighted
    cent-exact DECIMAL sums, one per-group window
    (``operators/profiling.py::gini_by_group``)."""
    from institutional_fx_etl_spark.operators.profiling import gini_by_group

    return gini_by_group(
        load_table(spark, sf_dir, "customer"),
        "c_acctbal",
        "c_nationkey",
        "c_custkey",
    )


_CCF_CORR = (
    "round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    " * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
    " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)"
)

_CCF_LAGS = [-3, -2, -1, 0, 1, 2, 3]


def _ccf_shift(lag: int) -> str:
    if lag >= 0:
        return f"lead(y, {lag}) OVER (ORDER BY h)"
    return f"lag(y, {-lag}) OVER (ORDER BY h)"


@register(
    "crosscorr_lags",
    f"""
    WITH hours AS (
      SELECT date_trunc('hour', ts) AS h,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    shifted AS (
      SELECT x,
             {", ".join(f"{_ccf_shift(lg)} AS y_{lg + 3}" for lg in _CCF_LAGS)}
      FROM hours
    ),
    pairs AS (
      {" UNION ALL ".join(
        f"SELECT CAST({lg} AS INT) AS lag_h, x, y_{lg + 3} AS yl"
        f" FROM shifted WHERE y_{lg + 3} IS NOT NULL"
        for lg in _CCF_LAGS
      )}
    ),
    mom AS (
      SELECT lag_h, CAST(count(*) AS BIGINT) AS n,
             SUM(CAST(x AS DECIMAL(18,0))) AS sx,
             SUM(CAST(yl AS DECIMAL(18,0))) AS sy,
             SUM(CAST(x * yl AS DECIMAL(18,0))) AS sxy,
             SUM(CAST(x * x AS DECIMAL(18,0))) AS sxx,
             SUM(CAST(yl * yl AS DECIMAL(18,0))) AS syy
      FROM pairs GROUP BY lag_h
    )
    SELECT lag_h, n, {_CCF_CORR} AS ccf
    FROM mom
    """,
)
def q_crosscorr_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation between two event series (hourly
    click vs purchase counts at lags −3..+3) — the does-X-lead-Y scan.
    The hourly rollup is the only full-data pass (hash aggregate); the
    lag windows and moment sums run over the HOURS series (time-
    bounded, thousands of rows — a single sort is the right plan at
    any corpus size, the series length is calendar-bounded, not
    data-bounded). Pearson per lag from exact DECIMAL integer moments;
    the final expression is mirrored double arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    hours = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.expr(
            "CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)"
            " AS BIGINT) AS x"
        ),
        F.expr(
            "CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)"
            " AS BIGINT) AS y"
        ),
    )
    shifted = hours.selectExpr(
        "x", *[f"{_ccf_shift(lg)} AS y_{lg + 3}" for lg in _CCF_LAGS]
    )
    stack_args = ", ".join(
        f"CAST({lg} AS INT), y_{lg + 3}" for lg in _CCF_LAGS
    )
    pairs = shifted.selectExpr(
        "x", f"stack({len(_CCF_LAGS)}, {stack_args}) AS (lag_h, yl)"
    ).filter("yl IS NOT NULL")
    mom = pairs.groupBy("lag_h").agg(
        F.expr("CAST(count(*) AS BIGINT) AS n"),
        F.expr("SUM(CAST(x AS DECIMAL(18,0))) AS sx"),
        F.expr("SUM(CAST(yl AS DECIMAL(18,0))) AS sy"),
        F.expr("SUM(CAST(x * yl AS DECIMAL(18,0))) AS sxy"),
        F.expr("SUM(CAST(x * x AS DECIMAL(18,0))) AS sxx"),
        F.expr("SUM(CAST(yl * yl AS DECIMAL(18,0))) AS syy"),
    )
    return mom.selectExpr("lag_h", "n", f"{_CCF_CORR} AS ccf")


@register(
    "key_skew_profile",
    """
    WITH c AS (
      SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           CAST(max(cnt) AS BIGINT) AS max_cnt,
           round(quantile_cont(cnt, 0.50), 6) AS p50,
           round(quantile_cont(cnt, 0.90), 6) AS p90,
           round(quantile_cont(cnt, 0.99), 6) AS p99,
           round(CAST(max(cnt) AS DOUBLE) * CAST(count(*) AS DOUBLE)
                 / CAST(SUM(cnt) AS DOUBLE), 6) AS skew_ratio
    FROM c
    """,
)
def q_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew report — the pre-join diagnostic this engine's
    own salting/AQE decisions rest on: per-key count distribution
    (exact interpolated percentiles over the KEY table, not the data),
    the hot-key maximum, and max/mean skew ratio. Two hash aggregates;
    the percentile sort runs over one row per key."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    return c.agg(
        F.expr("CAST(count(*) AS BIGINT) AS n_keys"),
        F.expr("CAST(SUM(cnt) AS BIGINT) AS n_rows"),
        F.expr("CAST(max(cnt) AS BIGINT) AS max_cnt"),
        F.expr("round(percentile(cnt, 0.50), 6) AS p50"),
        F.expr("round(percentile(cnt, 0.90), 6) AS p90"),
        F.expr("round(percentile(cnt, 0.99), 6) AS p99"),
        F.expr(
            "round(CAST(max(cnt) AS DOUBLE) * CAST(count(*) AS DOUBLE)"
            " / CAST(SUM(cnt) AS DOUBLE), 6) AS skew_ratio"
        ),
    )


def _zvalue_duck(x: str, y: str, bits: int = 16) -> str:
    """DuckDB-operator twin of ``operators/zorder.py::zvalue_expr`` —
    same Morton interleave, native ``>>``/``&``/``<<`` syntax; integer
    bit math is exact so the two render identical keys."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


_ZO_Y_DUCK = "date_diff('day', DATE '1995-01-01', o_orderdate)"


@register(
    "zorder_layout",
    f"""
    WITH b AS (
      SELECT o_custkey AS x, {_ZO_Y_DUCK} AS y,
             {_zvalue_duck("o_custkey", _ZO_Y_DUCK, bits=12)} >> 20 AS file_bucket
      FROM orders
    )
    SELECT file_bucket, CAST(count(*) AS BIGINT) AS n,
           CAST(min(x) AS BIGINT) AS min_x, CAST(max(x) AS BIGINT) AS max_x,
           CAST(min(y) AS BIGINT) AS min_y, CAST(max(y) AS BIGINT) AS max_y
    FROM b GROUP BY file_bucket
    """,
)
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout audit over orders clustered on
    (customer, order day): per-file-bucket row counts and min/max of
    BOTH dimensions — the parquet-footer prunability evidence for the
    OPTIMIZE-ZORDER-style writer (``operators/zorder.py``). ``bits``
    is sized to the dimensions' actual ranges (11/12 bits here) so the
    bucket split uses OCCUPIED leading bits — interleaving dead high
    bits would put the whole table in bucket 0. Pure integer bit math;
    the oracle renders the same key with native operators."""
    from institutional_fx_etl_spark.operators.zorder import (
        zorder_layout_stats,
    )

    orders = load_table(spark, sf_dir, "orders")
    return zorder_layout_stats(
        orders,
        "o_custkey",
        "CAST(datediff(o_orderdate, DATE '1995-01-01') AS BIGINT)",
        bits=12,
    )


def _bm25_oracle() -> str:
    from institutional_fx_etl_spark.operators.text import bm25_score_sql

    terms = ["hash", "join", "scan"]
    tf_cols = ", ".join(
        f"CAST(len(list_filter(toks, x -> x = '{t}')) AS INT) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS df{i}"
        for i in range(len(terms))
    )
    return f"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
      FROM documents
    ),
    d AS (
      SELECT doc_id, CAST(len(toks) AS INT) AS dl, {tf_cols} FROM t
    ),
    g AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(dl) AS BIGINT) AS sum_dl, {df_cols}
      FROM d
    )
    SELECT doc_id, dl, tf0, tf1, tf2,
           round({bm25_score_sql(terms)}, 6) AS score
    FROM d, g
    ORDER BY score DESC, doc_id ASC LIMIT 20
    """


@register("bm25_rank", _bm25_oracle())
def q_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 for the query {hash, join, scan} — one corpus scan
    (scan-side per-term tf from a single let-bound token evaluation),
    a one-row global broadcast, a partial TakeOrdered
    (``operators/text.py::bm25_rank``). Ordering key is the ROUNDED
    score + unique id on both engines, so last-ulp ``ln`` drift cannot
    flip the cutoff."""
    from institutional_fx_etl_spark.operators.text import bm25_rank

    return bm25_rank(
        load_table(spark, sf_dir, "documents"), ["hash", "join", "scan"]
    )


@register(
    "dedup_sorted_neighborhood",
    f"""
    WITH t AS (
      SELECT doc_id AS id, length(text) AS nc,
             string_split_regex(lower(text), '\\s+') AS toks
      FROM documents
    ),
    k AS (
      SELECT id, nc, {_DUCK_SHINGLES.format(toks="toks")} AS sh
      FROM t WHERE len(toks) >= 3
    ),
    r AS (
      SELECT id, sh, row_number() OVER (ORDER BY nc, id) AS r FROM k
    ),
    p AS (
      SELECT a.id AS id_a, b.id AS id_b,
             CAST(b.r - a.r AS INT) AS rank_dist,
             round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                   / len(list_distinct(list_concat(a.sh, b.sh))), 6)
               AS jaccard
      FROM r a JOIN r b ON b.r - a.r BETWEEN 1 AND 4
    )
    SELECT id_a, id_b, rank_dist, jaccard FROM p WHERE jaccard >= 0.5
    """,
)
def q_dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood near-dup candidates (window 4 over the
    (n_chars, id) order) + exact-Jaccard verify — the skew-immune
    n·window blocking alternative to MinHash
    (``operators/dedup.py::sorted_neighborhood_pairs``); the global
    rank decomposes into range buckets + broadcast offsets, pairs meet
    by block double-emission."""
    from institutional_fx_etl_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    return sorted_neighborhood_pairs(
        load_table(spark, sf_dir, "documents"), window=4
    )


@register(
    "weighted_median",
    """
    WITH w AS (
      SELECT l_returnflag AS grp, l_extendedprice AS price,
             CAST(l_quantity AS BIGINT) AS q,
             SUM(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumq,
             SUM(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_returnflag) AS totq
      FROM lineitem
    )
    SELECT grp, CAST(max(totq) AS BIGINT) AS total_qty,
           min(price) AS wmedian_price
    FROM w WHERE 2 * cumq >= totq GROUP BY grp
    """,
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group weighted (lower) median — price weighted by
    quantity: one per-group ranking window computes the running weight,
    and ``min(price)`` over the rows past the half-weight threshold IS
    the weighted median (cumulative weight increases with price, so
    the first qualifying row has the minimum qualifying price — no
    second pass, no self-join). Integer weights make the threshold
    exact; the selected value is a row value, so no interpolation
    drift. Ties on price are safe: any tie-order crossing the
    threshold selects the same tied price.

    Scale shape (r15): the running weight is a DISTRIBUTED two-phase
    cumulative sum (:mod:`functions.distrank`) — the former per-group
    window summed each whole group on ONE task (3 tasks carried the
    full 1.3 s of lineitem CPU at sf0.1). Range-repartition + bounded
    local running sum + tiny per-(partition, group) offset rollup;
    the same rollup yields the group grand total, so the former
    second full-data window (``totq``) is gone too. Integer weights
    make the distributed sum bit-identical to the single-task window;
    the oracle keeps the plain global-window form."""
    _pin_session_confs(spark)
    from institutional_fx_etl_spark.functions.distrank import (
        dist_running_sum,
    )

    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_returnflag").alias("grp"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").cast("bigint").alias("__q"),
        "l_orderkey",
        "l_linenumber",
    )
    w = dist_running_sum(
        base,
        ["grp"],
        ["price", "l_orderkey", "l_linenumber"],
        "__q",
        "cumq",
        total_col="totq",
    )
    return (
        w.filter("2 * cumq >= totq")
        .groupBy("grp")
        .agg(
            F.expr("CAST(max(totq) AS BIGINT) AS total_qty"),
            F.expr("min(price) AS wmedian_price"),
        )
    )


@register(
    "countmin_estimate",
    """
    WITH ks AS (SELECT user_id AS k FROM events WHERE user_id IS NOT NULL),
    hrows AS (SELECT i FROM (VALUES (0), (1), (2), (3)) t(i)),
    cnts AS (
      SELECT i,
             CAST(concat('0x', substr(md5(concat('cms', i, '_',
               CAST(k AS VARCHAR))), 1, 8)) AS BIGINT) % 256 AS bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM ks CROSS JOIN hrows GROUP BY 1, 2),
    top AS (
      SELECT k AS key, CAST(COUNT(*) AS BIGINT) AS true_cnt,
             row_number() OVER (ORDER BY COUNT(*) DESC, k ASC) AS rn
      FROM ks GROUP BY k QUALIFY rn <= 10),
    probe AS (
      SELECT t.key, t.true_cnt, r.i,
             CAST(concat('0x', substr(md5(concat('cms', r.i, '_',
               CAST(t.key AS VARCHAR))), 1, 8)) AS BIGINT) % 256 AS bucket
      FROM top t CROSS JOIN hrows r)
    SELECT p.key, p.true_cnt,
           CAST(MIN(c.cnt) AS BIGINT) AS cms_est,
           CAST(MIN(c.cnt) - p.true_cnt AS BIGINT) AS overestimate
    FROM probe p JOIN cnts c ON p.i = c.i AND p.bucket = c.bucket
    GROUP BY p.key, p.true_cnt
    """,
)
def q_countmin_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (d=4, w=256, md5-derived hash rows) built over
    the event user stream, read back at the 10 heaviest users against
    their exact counts — the deterministic sketch construction makes
    the whole counter matrix oracle-checkable, unlike a seeded-random
    CMS (``operators/sketches.py::countmin_estimate``). The shuffle
    carries ≤ partitions·d·w partial cells regardless of stream size
    (map-side combine) — the reason a sketch exists at 100 TB."""
    from institutional_fx_etl_spark.operators.sketches import (
        countmin_estimate,
    )

    ev = load_table(spark, sf_dir, "events").filter("user_id IS NOT NULL")
    return countmin_estimate(ev, "user_id", top_n=10)


@register(
    "proportion_ztest",
    """
    WITH s AS (
      SELECT CAST(SUM(CASE WHEN NOT (user_id % 2 = 1) THEN 1 ELSE 0 END)
               AS BIGINT) AS n_0,
             CAST(SUM(CASE WHEN NOT (user_id % 2 = 1)
                       AND (event_type = 'error') THEN 1 ELSE 0 END)
               AS BIGINT) AS x_0,
             CAST(SUM(CASE WHEN (user_id % 2 = 1) THEN 1 ELSE 0 END)
               AS BIGINT) AS n_1,
             CAST(SUM(CASE WHEN (user_id % 2 = 1)
                       AND (event_type = 'error') THEN 1 ELSE 0 END)
               AS BIGINT) AS x_1
      FROM events)
    SELECT n_0, x_0, n_1, x_1,
           round(CAST(x_0 AS DOUBLE) / n_0, 6) AS rate_0,
           round(CAST(x_1 AS DOUBLE) / n_1, 6) AS rate_1,
           round((CAST(x_0 AS DOUBLE) / n_0 - CAST(x_1 AS DOUBLE) / n_1)
             / sqrt((CAST(x_0 + x_1 AS DOUBLE) / (n_0 + n_1))
               * (1 - CAST(x_0 + x_1 AS DOUBLE) / (n_0 + n_1))
               * (1.0 / n_0 + 1.0 / n_1)), 6) AS z
    FROM s
    """,
)
def q_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test (pooled variance): error-event rate of
    odd-user-id vs even-user-id cohorts — the A/B readout as one hash
    aggregate to four exact BIGINTs plus one mirrored double
    expression (``operators/profiling.py::proportion_ztest``)."""
    from institutional_fx_etl_spark.operators.profiling import (
        proportion_ztest,
    )

    return proportion_ztest(
        load_table(spark, sf_dir, "events"),
        "event_type = 'error'",
        "user_id % 2 = 1",
    )


@register(
    "pareto_topshare",
    """
    WITH per_key AS (
      SELECT c.c_nationkey AS grp, o.o_custkey AS k,
             CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
               AS BIGINT) AS kv
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2),
    ranked AS (
      SELECT grp,
             row_number() OVER (PARTITION BY grp
               ORDER BY kv DESC, k ASC) AS rn,
             SUM(kv) OVER (PARTITION BY grp ORDER BY kv DESC, k ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(kv) OVER (PARTITION BY grp) AS total,
             COUNT(*) OVER (PARTITION BY grp) AS n_keys
      FROM per_key)
    SELECT grp, CAST(MAX(n_keys) AS BIGINT) AS n_keys,
           round(CAST(MAX(total) AS DOUBLE) / 100, 2) AS total_value,
           CAST(MIN(rn) AS BIGINT) AS k_top,
           round(CAST(MIN(rn) AS DOUBLE) / MAX(n_keys), 6) AS k_share
    FROM ranked WHERE 5 * cum >= 4 * total GROUP BY grp
    """,
)
def q_pareto_topshare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration Pareto audit per customer nation: the
    number (and base share) of top customers carrying 80% of order
    revenue — cents-exact integer threshold, one ranking window per
    group, threshold-min extraction with no second pass
    (``operators/profiling.py::pareto_topshare``)."""
    from institutional_fx_etl_spark.operators.profiling import (
        pareto_topshare,
    )

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    joined = orders.join(
        cust.selectExpr("c_custkey", "c_nationkey"),
        orders.o_custkey == F.col("c_custkey"),
    )
    return pareto_topshare(joined, "c_nationkey", "o_custkey", "o_totalprice")


def _register_dedup_ensemble() -> None:
    """High-precision ensemble dedup: pairs flagged by BOTH independent
    signature families (MinHash-Jaccard AND SimHash-Hamming) — the
    precision-stacking trick production dedup pipelines use before an
    expensive human/LLM adjudication pass. Oracle composes the two
    registered oracles (same pattern as ``dedup_apply``)."""
    mh = REGISTRY["dedup_minhash_lsh"][1]
    sh = REGISTRY["dedup_simhash"][1]
    oracle = f"""
    SELECT m.id_a, m.id_b, m.jaccard, s.hamming
    FROM ({mh}) m JOIN ({sh}) s
      ON m.id_a = s.id_a AND m.id_b = s.id_b
    """

    @register("dedup_ensemble_pairs", oracle)
    def q_dedup_ensemble_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Near-dup pairs agreed by BOTH signature families: MinHash
        banded LSH (+ exact-Jaccard verify) ∩ SimHash blocked Hamming —
        one key-partitioned join of two already-bounded pair relations
        (``operators/dedup.py::minhash_lsh_pairs`` /
        ``simhash_near_pairs``)."""
        from institutional_fx_etl_spark.operators.dedup import (
            minhash_lsh_pairs,
            simhash_near_pairs,
        )

        docs = load_table(spark, sf_dir, "documents")
        mh = minhash_lsh_pairs(docs, jaccard_threshold=0.5)
        sh = simhash_near_pairs(
            docs, max_hamming=8, block_col="source"
        ).select("id_a", "id_b", "hamming")
        return mh.join(sh, ["id_a", "id_b"]).select(
            "id_a", "id_b", "jaccard", "hamming"
        )


_register_dedup_ensemble()


def _register_streaming_cusum() -> None:
    """Streaming CUSUM certified against the BATCH operator's oracle —
    the strongest statement a streaming twin can make: identical rows
    over the same bounded input, through the state-store path."""
    oracle = REGISTRY["cusum_changepoint"][1]

    @register("streaming_cusum", oracle)
    def q_streaming_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
        """STREAMING CUSUM drift alarms (``applyInPandasWithState``,
        one-number state per group, vectorized reflected-walk updates
        seeded by the carry) driven over the bounded events source —
        must equal the batch ``cusum_changepoint`` row-for-row (shared
        oracle; ``streaming/stateful.py::streaming_cusum``)."""
        import tempfile

        from institutional_fx_etl_spark.sources.readers import (
            read_parquet_nanos_safe,
        )
        from institutional_fx_etl_spark.streaming.stateful import (
            streaming_cusum,
        )

        _pin_session_confs(spark)
        name = "streaming_cusum_result"
        static = read_parquet_nanos_safe(spark, f"{sf_dir}/events.parquet")
        ts_is_long = dict(static.dtypes).get("ts") == "bigint"
        stream = (
            spark.readStream.schema(static.schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        ts_expr = (
            F.expr("timestamp_micros(ts div 1000)")
            if ts_is_long
            else F.col("ts").cast("timestamp")
        )
        src = stream.select(
            F.col("event_type"),
            F.col("event_id"),
            ts_expr.alias("ts"),
            F.col("value"),
        )
        out = streaming_cusum(src)
        q = _start_stream(
            spark,
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option(
                "checkpointLocation",
                _stream_tmpdir(prefix="stream_cusum_ck_"),
            )
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return spark.table(name)


def _register_dedup_recall_eval() -> None:
    """LSH recall measured against blocking-free ground truth — the
    eval harness that quantifies what the banded-LSH candidate stage
    misses (the verify step makes precision 1.0 by construction; the
    interesting number is recall). Ground truth is a brute-force n²
    pair scan — an EVAL tool, run on a sample at scale, exactly like
    ``ann_recall_eval`` vs the IVF index."""
    # the composed minhash oracle must see the SAME sample corpus the
    # Spark side dedups (the hot-bucket cap is corpus-dependent) — so
    # its `FROM documents` scans are rewritten onto the bounded view
    mh = REGISTRY["dedup_minhash_lsh"][1].replace(
        "FROM documents",
        "FROM (SELECT * FROM documents WHERE doc_id < 500)",
    )
    oracle = f"""
    WITH ev AS (
      SELECT * FROM documents WHERE doc_id < 500
    ),
    t AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
      FROM ev
    ),
    t2 AS (
      SELECT doc_id, {_DUCK_SHINGLES.format(toks='toks')} AS sh
      FROM t WHERE len(toks) >= 3
    ),
    truth AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM t2 a JOIN t2 b ON a.doc_id < b.doc_id
      WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / len(list_distinct(list_concat(a.sh, b.sh))), 6) >= 0.5
    ),
    found AS (SELECT id_a, id_b FROM ({mh})),
    s AS (
      SELECT (SELECT COUNT(*) FROM truth) AS n_truth,
             (SELECT COUNT(*) FROM found) AS n_found,
             (SELECT COUNT(*) FROM found f JOIN truth t
                ON f.id_a = t.id_a AND f.id_b = t.id_b) AS tp)
    SELECT CAST(n_truth AS BIGINT) AS n_truth,
           CAST(n_found AS BIGINT) AS n_found,
           CAST(tp AS BIGINT) AS true_positives,
           round(CAST(tp AS DOUBLE) / n_found, 6) AS precision,
           round(CAST(tp AS DOUBLE) / n_truth, 6) AS recall
    FROM s
    """

    @register("dedup_recall_eval", oracle)
    def q_dedup_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Recall of the banded MinHash LSH against the blocking-free
        exact-Jaccard ground truth (threshold 0.5) — brute-force n²
        on the eval corpus BY DESIGN (sample-based at scale); the
        found side is the production candidate path
        (``operators/dedup.py::minhash_lsh_pairs``)."""
        from institutional_fx_etl_spark.operators.dedup import (
            minhash_lsh_pairs,
            minhash_signatures,
        )

        # deterministic eval-corpus bound: the brute-force truth is n²
        # BY DESIGN, so the harness fixes the sample (doc_id < 500 — a
        # no-op at sf≤0.01, a 10% sample at sf0.1) instead of letting
        # the eval cost grow quadratically with the corpus.
        # round-robin spread BEFORE the signature build: the sample is
        # one parquet split, so the n² nested-loop truth join would
        # otherwise stream on a SINGLE task (profiled 2.3 s of 1-core
        # CPU at sf0.1, guide §2.5 input skew)
        docs = (
            load_table(spark, sf_dir, "documents")
            .filter("doc_id < 500")
            .repartition(spark.sparkContext.defaultParallelism)
        )
        sets = minhash_signatures(docs).select("doc_id", "shingle_hashes")
        a = sets.selectExpr("doc_id AS id_a", "shingle_hashes AS sh_a")
        b = sets.selectExpr("doc_id AS id_b", "shingle_hashes AS sh_b")
        truth = (
            a.join(b, F.col("id_a") < F.col("id_b"))
            .selectExpr(
                "id_a",
                "id_b",
                "round(cast(size(array_intersect(sh_a, sh_b)) as double)"
                " / size(array_union(sh_a, sh_b)), 6) AS j",
            )
            .filter("j >= 0.5")
            .select("id_a", "id_b")
        )
        found = minhash_lsh_pairs(docs, jaccard_threshold=0.5).select(
            "id_a", "id_b"
        )
        # one full-outer pass computes all three counters: the former
        # three separate aggregates (tp join + two counts) evaluated
        # the n² truth subtree TWICE and the LSH subtree twice
        # (profiled: two identical 2.3 s single-task stages per run)
        return (
            truth.withColumn("__t", F.lit(1))
            .join(
                found.withColumn("__f", F.lit(1)),
                ["id_a", "id_b"],
                "full_outer",
            )
            .agg(
                F.count("__t").cast("bigint").alias("n_truth"),
                F.count("__f").cast("bigint").alias("n_found"),
                F.count(F.when(F.col("__t").isNotNull(), F.col("__f")))
                .cast("bigint")
                .alias("tp"),
            )
            .selectExpr(
                "n_truth",
                "n_found",
                "tp AS true_positives",
                "round(CAST(tp AS DOUBLE) / n_found, 6) AS precision",
                "round(CAST(tp AS DOUBLE) / n_truth, 6) AS recall",
            )
        )


_register_dedup_recall_eval()


def _register_dedup_canonical() -> None:
    """Canonical-representative selection composed on the
    connected-components oracle (same wrap pattern as dedup_apply) —
    keep the LONGEST member per cluster instead of the min id."""
    cc = REGISTRY["dedup_clusters"][1]
    oracle = f"""
    WITH c AS ({cc}),
    m AS (
      SELECT c.comp, d.doc_id, d.n_chars
      FROM c JOIN documents d ON c.doc_id = d.doc_id)
    SELECT comp AS cluster,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           first(doc_id ORDER BY n_chars DESC, doc_id) AS rep_doc_id,
           CAST(MAX(n_chars) AS BIGINT) AS rep_n_chars
    FROM m GROUP BY comp
    """

    @register("dedup_canonical", oracle)
    def q_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Quality-aware dedup: each near-dup cluster keeps its LONGEST
        member (id tiebreak) — the keep-the-most-complete-version
        policy, one composite-key ``min_by`` aggregate over the
        cluster assignment (``operators/dedup.py::dedup_canonical``;
        contrast ``dedup_apply``'s min-id keep)."""
        from institutional_fx_etl_spark.operators.dedup import (
            dedup_canonical,
            dedup_clusters,
            minhash_lsh_pairs,
        )

        docs = load_table(spark, sf_dir, "documents")
        pairs = minhash_lsh_pairs(docs, jaccard_threshold=0.2)
        clusters = dedup_clusters(docs.select("doc_id"), pairs)
        members = clusters.join(
            docs.select("doc_id", "n_chars"), "doc_id"
        )
        return dedup_canonical(members)


_register_dedup_canonical()


_FK_EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


def _refint_oracle() -> str:
    parts = []
    for ct, ck, pt, pk in _FK_EDGES:
        parts.append(
            f"""
    SELECT '{ct}.{ck}->{pt}.{pk}' AS fk,
           CAST(COUNT(*) AS BIGINT) AS child_rows,
           CAST(COALESCE(SUM(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS orphan_rows,
           CAST(COUNT(DISTINCT CASE WHEN p.k IS NULL THEN c.{ck} END)
                AS BIGINT) AS orphan_keys
    FROM {ct} c LEFT JOIN (SELECT DISTINCT {pk} AS k FROM {pt}) p
      ON c.{ck} = p.k
    WHERE c.{ck} IS NOT NULL"""
        )
    return " UNION ALL ".join(parts)


@register("referential_integrity", _refint_oracle())
def q_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK integrity audit over the whole TPC-H-ish constellation — one
    row per foreign-key edge with orphan row/key counts (plain parquet
    enforces nothing; this query IS the constraint check a lakehouse
    ingest gate runs). Each edge aggregates the child to per-key
    counts FIRST, then anti-joins the parent's distinct keys — the
    shuffle carries key cardinality, never fact rows
    (``operators/profiling.py::referential_integrity``). The clean
    fixtures yield zero orphans; the orphan path is pytest-proven on a
    synthetic torn batch."""
    from institutional_fx_etl_spark.operators.profiling import (
        referential_integrity,
        referential_integrity_multi,
    )

    # group consecutive edges by child table: a fact table with e FK
    # edges is scanned ONCE via the stacked multi-edge audit instead
    # of e times (r15, guide §1.2/§6 — lineitem carried 3 of the 7
    # edges and therefore 3 of the scans); single-edge children keep
    # the per-edge operator. Union order == _FK_EDGES order, so the
    # output rows are identical.
    by_child: list[tuple[str, list[tuple[str, str, str]]]] = []
    for ct, ck, pt, pk in _FK_EDGES:
        if by_child and by_child[-1][0] == ct:
            by_child[-1][1].append((ck, pt, pk))
        else:
            by_child.append((ct, [(ck, pt, pk)]))
    out = None
    for ct, group in by_child:
        child = load_table(spark, sf_dir, ct)
        if len(group) == 1:
            ck, pt, pk = group[0]
            audit = referential_integrity(
                child,
                ck,
                load_table(spark, sf_dir, pt),
                pk,
                f"{ct}.{ck}->{pt}.{pk}",
            )
        else:
            audit = referential_integrity_multi(
                child,
                [
                    (
                        ck,
                        load_table(spark, sf_dir, pt),
                        pk,
                        f"{ct}.{ck}->{pt}.{pk}",
                    )
                    for ck, pt, pk in group
                ],
            )
        out = audit if out is None else out.unionByName(audit)
    return out


@register(
    "cramers_v",
    """
    WITH cells AS (
      SELECT o_orderpriority AS a, o_orderstatus AS b, count(*) AS o
      FROM orders GROUP BY 1, 2
    ),
    marg AS (
      SELECT a, b, o,
             SUM(o) OVER (PARTITION BY a) AS r,
             SUM(o) OVER (PARTITION BY b) AS c,
             SUM(o) OVER () AS n
      FROM cells
    ),
    terms AS (
      SELECT a, b, n,
             (CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * CAST(c AS DOUBLE)
              / CAST(n AS DOUBLE))
             * (CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * CAST(c AS DOUBLE)
              / CAST(n AS DOUBLE))
             / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
               AS term,
             (CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
               AS e
      FROM marg
    ),
    s AS (
      SELECT CAST(MAX(n) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_cells,
             CAST((count(DISTINCT a) - 1) * (count(DISTINCT b) - 1)
                  AS BIGINT) AS dof,
             CAST(SUM(CAST(floor(term * 1e6 + 0.5) AS DECIMAL(38,0)))
                  + CAST(MAX(n) AS DECIMAL(38,0)) * 1000000
                  - SUM(CAST(floor(e * 1e6 + 0.5) AS DECIMAL(38,0)))
                  AS DOUBLE) / 1e6 AS chi2,
             least(count(DISTINCT a) - 1, count(DISTINCT b) - 1) AS mindim
      FROM terms)
    SELECT n, n_cells, dof, chi2,
           round(sqrt(chi2 / CAST(n AS DOUBLE) / CAST(mindim AS DOUBLE)), 6)
             AS cramers_v
    FROM s
    """,
)
def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V association strength between order priority and
    order status — the normalized 0..1 effect size on top of the
    chi-square machinery (same one-aggregate contingency plan,
    micro-rounded DECIMAL term sum; the final sqrt is a
    correctly-rounded IEEE op so V hashes exactly;
    ``operators/profiling.py::cramers_v``)."""
    from institutional_fx_etl_spark.operators.profiling import cramers_v

    return cramers_v(
        load_table(spark, sf_dir, "orders"), "o_orderpriority", "o_orderstatus"
    )


def _register_ann_recall_eval() -> None:
    """ann_recall_eval composes the two already-registered ANN oracles
    (brute-force truth restricted to rank ≤ 5 vs the IVF nprobe=2
    result) — the standard recall@k evaluation harness an ANN index
    ships with. Registered via a helper because the oracle SQL embeds
    the ann_topk / ivf_topk oracle texts (same composition pattern as
    ``dedup_apply``)."""
    bf = REGISTRY["ann_topk"][1]
    iv = REGISTRY["ivf_topk"][1]
    oracle = f"""
    WITH bf AS (SELECT q_id, vec_id FROM ({bf}) WHERE rank <= 5),
    iv AS (SELECT q_id, vec_id FROM ({iv})),
    h AS (
      SELECT bf.q_id, CAST(COUNT(iv.vec_id) AS BIGINT) AS hits
      FROM bf LEFT JOIN iv
        ON bf.q_id = iv.q_id AND bf.vec_id = iv.vec_id
      GROUP BY bf.q_id)
    SELECT q_id, CAST(5 AS BIGINT) AS k, hits,
           round(CAST(hits AS DOUBLE) / 5, 6) AS recall
    FROM h
    """

    @register("ann_recall_eval", oracle)
    def q_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Recall@5 of the IVF index (nprobe=2) against the brute-force
        cosine truth for the 3 benchmark queries — the evaluation
        harness that quantifies the IVF speed/recall trade
        (``operators/similarity.py::cosine_topk`` vs ``ivf_topk``).
        Both sides shuffle only (q_id, vec_id) pairs; the hit count is
        one key-partitioned join + aggregate."""
        from institutional_fx_etl_spark.operators.similarity import (
            cosine_topk,
            ivf_topk,
        )

        emb = load_table(spark, sf_dir, "embeddings")
        truth = cosine_topk(emb, emb.filter(F.col("vec_id") < 3), k=5).select(
            "q_id", "vec_id"
        )
        got = ivf_topk(emb, query_ids=[0, 1, 2], k=5, nprobe=2).select(
            F.col("q_id").alias("iq"), F.col("vec_id").alias("iv")
        )
        return (
            truth.join(
                got,
                (F.col("q_id") == F.col("iq")) & (F.col("vec_id") == F.col("iv")),
                "left",
            )
            .groupBy("q_id")
            .agg(F.expr("CAST(COUNT(iv) AS BIGINT) AS hits"))
            .selectExpr(
                "q_id",
                "CAST(5 AS BIGINT) AS k",
                "hits",
                "round(CAST(hits AS DOUBLE) / 5, 6) AS recall",
            )
        )


_register_ann_recall_eval()


def _sssp_oracle(rounds: int = 3) -> str:
    """Unrolled Bellman-Ford rounds as chained CTEs — the oracle
    mirrors the Spark DAG round-for-round (a recursive CTE would
    enumerate paths, not labels, and explode on a dense graph)."""
    relax = """
    d{k} AS (
      SELECT node, CAST(MIN(dist) AS BIGINT) AS dist FROM (
        SELECT node, dist FROM d{p}
        UNION ALL
        SELECT e2.d AS node, d{p}.dist + e2.w AS dist
        FROM d{p} JOIN e2 ON d{p}.node = e2.s
      ) GROUP BY node)"""
    steps = ",".join(relax.format(k=k, p=k - 1) for k in range(1, rounds + 1))
    return f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    g AS (
      SELECT a.p AS src, b.p AS dst,
             CAST((11 + COUNT(*)) // COUNT(*) AS BIGINT) AS w
      FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
      GROUP BY 1, 2),
    e AS (SELECT src AS s, dst AS d, w FROM g
          UNION ALL SELECT dst, src, w FROM g),
    e2 AS (SELECT s, d, CAST(MIN(w) AS BIGINT) AS w FROM e GROUP BY 1, 2),
    d0 AS (SELECT DISTINCT p AS node, CAST(0 AS BIGINT) AS dist
           FROM items WHERE p % 97 = 0),{steps}
    SELECT node, dist FROM d{rounds}
    """


@register("graph_sssp_weighted", _sssp_oracle(3))
def q_graph_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded weighted shortest distance from the seed set (partkeys
    divisible by 97) over the part co-purchase graph, edge weight
    ``ceil(12 / co_order_count)`` (stronger affinity = shorter edge) —
    3 unrolled Bellman-Ford relaxation rounds, integer weights
    end-to-end (``operators/graph.py::sssp_weighted``). The oracle
    unrolls the same rounds as chained CTEs."""
    from institutional_fx_etl_spark.operators.graph import sssp_weighted

    items = (
        load_table(spark, sf_dir, "lineitem")
        .selectExpr("l_orderkey AS o", "l_partkey AS p")
        .distinct()
    )
    a = items.selectExpr("o", "p AS src")
    b = items.selectExpr("o", "p AS dst")
    edges = (
        a.join(b, "o")
        .filter("src < dst")
        .groupBy("src", "dst")
        .agg(F.expr("CAST((11 + COUNT(*)) div COUNT(*) AS BIGINT) AS w"))
    )
    seeds = items.filter("p % 97 = 0").selectExpr("p AS node").distinct()
    return sssp_weighted(edges, seeds, rounds=3)


@register(
    "cusum_changepoint",
    """
    WITH e AS (
      SELECT event_type AS grp, event_id AS id, ts,
             CAST(floor(value * 1000000 + 0.5) AS BIGINT)
               - 55000000 AS d
      FROM events),
    p AS (
      SELECT grp, id, ts,
             CAST(SUM(d) OVER (PARTITION BY grp ORDER BY ts, id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS pre
      FROM e),
    m AS (
      SELECT grp, id, pre,
             CAST(MIN(pre) OVER (PARTITION BY grp ORDER BY ts, id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS runmin
      FROM p)
    SELECT grp, id,
           CAST(pre - LEAST(0, runmin) AS BIGINT) AS cusum_micro,
           pre - LEAST(0, runmin) > 200000000 AS alarm
    FROM m
    """,
)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type CUSUM drift statistic (target 55, alarm > 200) —
    the sequential changepoint recursion ``S_i = max(0, S_{i-1} + x_i
    - k)`` computed WITHOUT sequential state via the reflected-walk
    prefix identity ``S_i = P_i - min(0, min_{j<=i} P_j)``, distributed
    as a two-level day-bucket prefix (no single-partition full-data
    window even for one giant group;
    ``operators/timeseries.py::cusum_changepoint``). Micro-unit BIGINT
    arithmetic end-to-end: integer prefix sums/mins are
    decomposition-invariant, so the hash matches the oracle's plain
    global window."""
    from institutional_fx_etl_spark.operators.timeseries import (
        cusum_changepoint,
    )

    return cusum_changepoint(load_table(spark, sf_dir, "events"))


@register(
    "assoc_rules",
    """
    WITH b AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    n AS (SELECT COUNT(DISTINCT o) AS n_txn FROM b),
    s AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS c FROM b GROUP BY p),
    pr AS (
      SELECT a.p AS pa, c.p AS pb, CAST(COUNT(*) AS BIGINT) AS cab
      FROM b a JOIN b c ON a.o = c.o AND a.p < c.p GROUP BY 1, 2)
    SELECT pa AS item_a, pb AS item_b, cab AS pair_orders,
           sa.c AS orders_a, sb.c AS orders_b,
           round(CAST(cab AS DOUBLE) / sa.c, 6) AS confidence_ab,
           round(CAST(cab AS DOUBLE) / sb.c, 6) AS confidence_ba,
           round(CAST(cab AS DOUBLE) * n.n_txn
                 / (CAST(sa.c AS DOUBLE) * sb.c), 6) AS lift
    FROM pr JOIN s sa ON pa = sa.p JOIN s sb ON pb = sb.p CROSS JOIN n
    WHERE cab >= 2
    """,
)
def q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order lines: pairwise
    support / confidence / lift for parts co-ordered ≥ 2 times. The
    pair stage is the engine's standard in-array combination emit (ONE
    groupBy-order shuffle, no self-join, fan-out Σ C(|basket|,2) with
    a degenerate-basket cap); item supports broadcast back onto the
    aggregated pair relation
    (``operators/basket.py::basket_assoc_rules``). The oracle
    self-joins — fine single-node, exactly what the Spark plan
    avoids."""
    from institutional_fx_etl_spark.operators.basket import (
        basket_assoc_rules,
    )

    return basket_assoc_rules(
        load_table(spark, sf_dir, "lineitem"), "l_orderkey", "l_partkey"
    )


@register(
    "mannwhitney_u",
    """
    WITH l AS (
      SELECT value AS v,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS ib
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')),
    per_v AS (
      SELECT v, CAST(SUM(ia) AS BIGINT) AS ca,
             CAST(SUM(ib) AS BIGINT) AS cb,
             CAST(SUM(ia) + SUM(ib) AS BIGINT) AS t
      FROM l GROUP BY v),
    r AS (
      SELECT ca, cb, t,
             CAST(SUM(t) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) - t AS BIGINT) AS before
      FROM per_v),
    s AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
             CAST(SUM(cb) AS BIGINT) AS n_b,
             CAST(SUM(ca * (2 * before + t + 1)) AS BIGINT) AS r_a2,
             CAST(SUM(t * t * t - t) AS BIGINT) AS ties
      FROM r)
    SELECT n_a, n_b,
           (CAST(r_a2 - n_a * (n_a + 1) AS DOUBLE)) / 2 AS u_a,
           CAST(n_a AS DOUBLE) * n_b
             - CAST(r_a2 - n_a * (n_a + 1) AS DOUBLE) / 2 AS u_b,
           round((CAST(r_a2 - n_a * (n_a + 1) AS DOUBLE) / 2
              - CAST(n_a AS DOUBLE) * n_b / 2)
             / sqrt(CAST(n_a AS DOUBLE) * n_b / 12.0
               * ((CAST(n_a + n_b AS DOUBLE) + 1)
                  - CAST(ties AS DOUBLE)
                    / (CAST(n_a + n_b AS DOUBLE)
                       * (CAST(n_a + n_b AS DOUBLE) - 1)))), 6) AS z
    FROM s
    """,
)
def q_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Mann-Whitney U (click vs purchase event values) —
    midranks in HALF-UNIT BIGINTs so rank sums are exact integers; the
    before-counts come from the same two-level range-bucket prefix as
    ``ks_two_sample`` (no single-partition full-data window); the
    tie-corrected z mirrors the oracle's double expression verbatim
    (``operators/profiling.py::mannwhitney_u``)."""
    from institutional_fx_etl_spark.operators.profiling import (
        mannwhitney_u,
    )

    return mannwhitney_u(
        load_table(spark, sf_dir, "events"),
        "value",
        "event_type",
        "click",
        "purchase",
    )


@register(
    "quantile_sketch",
    """
    WITH vm AS (
      SELECT CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL),
    b AS (
      SELECT CASE WHEN v <= 0 THEN 0 ELSE
               (length(bin(v)) * 16)
               + (v // CAST(pow(2, greatest(length(bin(v)) - 5, 0))
                     AS BIGINT)) % 16 END AS bucket,
             v
      FROM vm),
    counts AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS c,
             CAST(MIN(v) AS BIGINT) AS lo
      FROM b GROUP BY bucket),
    walk AS (
      SELECT bucket, c, lo,
             SUM(c) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS cum,
             SUM(c) OVER () AS n
      FROM counts),
    ex AS (
      SELECT
        round(CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY value)
          AS DOUBLE), 6) AS e_0,
        round(CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY value)
          AS DOUBLE), 6) AS e_1,
        round(CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY value)
          AS DOUBLE), 6) AS e_2
      FROM events WHERE value IS NOT NULL),
    sk AS (
      SELECT CAST(0.5 AS DOUBLE) AS q,
             round(CAST(min_by(lo, bucket) AS DOUBLE) / 1000000, 6)
               AS est, CAST(MAX(n) AS BIGINT) AS n
      FROM walk WHERE cum >= ceil(0.5 * n)
      UNION ALL
      SELECT CAST(0.9 AS DOUBLE),
             round(CAST(min_by(lo, bucket) AS DOUBLE) / 1000000, 6),
             CAST(MAX(n) AS BIGINT)
      FROM walk WHERE cum >= ceil(0.9 * n)
      UNION ALL
      SELECT CAST(0.99 AS DOUBLE),
             round(CAST(min_by(lo, bucket) AS DOUBLE) / 1000000, 6),
             CAST(MAX(n) AS BIGINT)
      FROM walk WHERE cum >= ceil(0.99 * n))
    SELECT q, est,
           CASE WHEN q = 0.5 THEN ex.e_0
                WHEN q = 0.9 THEN ex.e_1
                ELSE ex.e_2 END AS exact,
           n
    FROM sk CROSS JOIN ex
    """,
)
def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic log-grid quantile sketch (p50/p90/p99 of event
    values) — the third oracle-paired sketch after CMS and HLL:
    exponential buckets from integer-string bit lengths (no float
    log), fixed state of (count, min) per occupied bucket, cumulative
    readout returning an actual observed value within one sub-bucket
    of truth; the exact percentile rides along as the accuracy audit
    (``operators/sketches.py::quantile_sketch``)."""
    from institutional_fx_etl_spark.operators.sketches import (
        quantile_sketch,
    )

    return quantile_sketch(load_table(spark, sf_dir, "events"), "value")


@register(
    "interarrival_stats",
    """
    WITH d AS (
      SELECT event_type AS grp,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY event_type ORDER BY ts, event_id) AS dt
      FROM events),
    f AS (SELECT grp, CAST(dt AS BIGINT) AS dt FROM d WHERE dt IS NOT NULL)
    SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_gaps,
           round(CAST(SUM(CAST(dt AS DECIMAL(38,0))) AS DOUBLE)
                 / COUNT(*) / 1000000, 6) AS mean_gap_s,
           round(CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY dt)
                 AS DOUBLE) / 1000000, 6) AS p50_gap_s,
           round(CAST(MAX(dt) AS DOUBLE) / 1000000, 6) AS max_gap_s
    FROM f GROUP BY grp
    """,
)
def q_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival time profile per event type (count / mean / exact
    median / max of the gaps) — the traffic-shape diagnostic behind
    rate alerting and sessionization gap choices. One per-type lag
    window (integer MICROSECOND gaps — no float time math), one hash
    aggregate with a DECIMAL mean numerator; the median is
    ``percentile_disc`` over exact BIGINTs, so everything hashes
    identically."""
    _pin_session_confs(spark)
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    us = "unix_micros(CAST(ts AS TIMESTAMP))"
    gaps = (
        ev.withColumn("__us", F.expr(us))
        .withColumn("dt", F.col("__us") - F.lag("__us").over(w))
        .filter("dt IS NOT NULL")
        .selectExpr("event_type AS grp", "CAST(dt AS BIGINT) AS dt")
    )
    return gaps.groupBy("grp").agg(
        F.expr("CAST(COUNT(*) AS BIGINT) AS n_gaps"),
        F.expr(
            "round(CAST(SUM(CAST(dt AS DECIMAL(38,0))) AS DOUBLE)"
            " / COUNT(*) / 1000000, 6) AS mean_gap_s"
        ),
        F.expr(
            "round(CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY dt)"
            " AS DOUBLE) / 1000000, 6) AS p50_gap_s"
        ),
        F.expr("round(CAST(MAX(dt) AS DOUBLE) / 1000000, 6) AS max_gap_s"),
    )


@register(
    "bloom_membership",
    """
    WITH keys AS (
      SELECT DISTINCT user_id AS k FROM events WHERE user_id IS NOT NULL),
    hrows AS (SELECT i FROM (VALUES (0), (1), (2), (3)) t(i)),
    bits AS (
      SELECT DISTINCT i,
             CAST(concat('0x', substr(md5(concat('bf', i, '_',
               CAST(k AS VARCHAR))), 1, 8)) AS BIGINT) % 4096 AS b
      FROM keys CROSS JOIN hrows),
    probes AS (SELECT CAST(range AS BIGINT) AS probe FROM range(0, 300)),
    pb AS (
      SELECT probe, i,
             CAST(concat('0x', substr(md5(concat('bf', i, '_',
               CAST(probe AS VARCHAR))), 1, 8)) AS BIGINT) % 4096 AS b
      FROM probes CROSS JOIN hrows),
    hits AS (
      SELECT probe, CAST(COUNT(*) AS BIGINT) AS n_set
      FROM pb WHERE EXISTS (
        SELECT 1 FROM bits WHERE bits.i = pb.i AND bits.b = pb.b)
      GROUP BY probe)
    SELECT p.probe,
           COALESCE(h.n_set, 0) = 4 AS maybe_present,
           EXISTS (SELECT 1 FROM keys WHERE keys.k = p.probe)
             AS actually_present,
           COALESCE(h.n_set, 0) = 4
             AND NOT EXISTS (SELECT 1 FROM keys WHERE keys.k = p.probe)
             AS false_positive
    FROM probes p LEFT JOIN hits h ON p.probe = h.probe
    """,
)
def q_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Bloom-filter membership audit (d=4, w=4096,
    md5-derived bits) over the event users, probed with ids 0..299 —
    the fourth oracle-paired sketch: the bit set is ≤ d·w rows
    whatever the stream size, probes broadcast against it, and the
    output carries the exact-membership verdict so the false-positive
    rate is measured, not assumed
    (``operators/sketches.py::bloom_membership``)."""
    from institutional_fx_etl_spark.operators.sketches import (
        bloom_membership,
    )

    ev = load_table(spark, sf_dir, "events").filter("user_id IS NOT NULL")
    probes = spark.range(300).selectExpr("id AS probe")
    return bloom_membership(ev, "user_id", probes)


def _register_streaming_hll() -> None:
    """Streaming HLL: the register table (max rho per (group, j)) is
    maintained as a complete-mode streaming aggregation — state fixed
    at groups·m rows forever — and the estimate read out of the
    materialized registers statically. Shares the batch hll_estimate
    oracle: the deterministic construction guarantees the identical
    sketch from any ingestion order."""
    oracle = REGISTRY["hll_estimate"][1]

    @register("streaming_hll", oracle)
    def q_streaming_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
        """STREAMING HyperLogLog per event type — live register
        maintenance through the state store, static readout, certified
        against the batch operator's oracle
        (``operators/sketches.py::hll_estimate`` is the batch twin)."""
        import tempfile

        from institutional_fx_etl_spark.operators.sketches import (
            HLL_ALPHA_256,
            HLL_M,
            HLL_RHO_CAP,
        )
        from institutional_fx_etl_spark.sources.readers import (
            read_parquet_nanos_safe,
        )

        m, cap = HLL_M, HLL_RHO_CAP
        name = "streaming_hll_regs"
        static = read_parquet_nanos_safe(spark, f"{sf_dir}/events.parquet")
        stream = (
            spark.readStream.schema(static.schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        h = (
            "CAST(conv(substr(md5(concat('hll',"
            " CAST(user_id AS STRING))), 1, 15), 16, 10) AS BIGINT)"
        )
        regs = (
            stream.filter("user_id IS NOT NULL")
            .selectExpr("event_type AS grp", f"{h} AS h")
            .selectExpr(
                "grp",
                f"h % {m} AS j",
                f"CASE WHEN h div {m} = 0 THEN {cap}"
                f" ELSE least(53 - length(bin(h div {m})), {cap}) END"
                " AS rho",
            )
            .groupBy("grp", "j")
            .agg(F.expr("CAST(MAX(rho) AS BIGINT) AS mj"))
        )
        q = _start_stream(
            spark,
            regs.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option(
                "checkpointLocation",
                _stream_tmpdir(prefix="stream_hll_ck_"),
            )
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        sketch = (
            spark.table(name)
            .groupBy("grp")
            .agg(
                F.expr("CAST(COUNT(1) AS BIGINT) AS n_hit"),
                F.expr(
                    f"CAST(SUM(CAST(pow(2, {cap} - mj) AS BIGINT))"
                    " AS BIGINT) AS s_hit"
                ),
            )
        )
        truth = (
            static.filter("user_id IS NOT NULL")
            .selectExpr("event_type AS grp", "user_id")
            .groupBy("grp")
            .agg(
                F.countDistinct("user_id").cast("bigint").alias(
                    "true_distinct"
                )
            )
        )
        est_raw = (
            f"{HLL_ALPHA_256} * {m} * {m} * CAST({1 << cap} AS DOUBLE)"
            " / CAST(sum_scaled AS DOUBLE)"
        )
        return (
            truth.join(sketch, "grp")
            .selectExpr(
                "grp",
                "true_distinct",
                f"CAST({m} AS BIGINT) AS m",
                f"{m} - n_hit AS v_zero",
                f"s_hit + ({m} - n_hit) * CAST({1 << cap} AS BIGINT)"
                " AS sum_scaled",
            )
            .selectExpr(
                "grp",
                "true_distinct",
                "m",
                "v_zero",
                "sum_scaled",
                f"round(CASE WHEN {est_raw} <= 2.5 * {m} AND v_zero > 0"
                f" THEN {m} * ln(CAST({m} AS DOUBLE) / v_zero)"
                f" ELSE {est_raw} END, 4) AS est",
            )
        )



def _register_streaming_quantile_sketch() -> None:
    """The live-sketch topology: the (count, min) bucket state is
    maintained as a streaming aggregation (complete mode — the state
    IS the sketch, fixed-size forever); quantiles are read OUT of the
    materialized sketch statically on demand. Certified against the
    batch quantile_sketch oracle — the deterministic construction
    guarantees the same sketch from any ingestion order."""
    oracle = REGISTRY["quantile_sketch"][1]

    @register("streaming_quantile_sketch", oracle)
    def q_streaming_quantile_sketch(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """STREAMING log-grid quantile sketch: bucket (count, min)
        state maintained live over the bounded events source, the
        p50/p90/p99 readout walked statically from the sketch table —
        must equal the batch operator exactly (shared oracle;
        ``operators/sketches.py::quantile_sketch`` is the batch
        twin)."""
        import tempfile

        from institutional_fx_etl_spark.sources.readers import (
            read_parquet_nanos_safe,
        )

        name = "streaming_qsketch_state"
        static = read_parquet_nanos_safe(spark, f"{sf_dir}/events.parquet")
        stream = (
            spark.readStream.schema(static.schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        v = "CAST(floor(value * 1000000 + 0.5) AS BIGINT)"
        bucket = (
            f"CASE WHEN {v} <= 0 THEN 0 ELSE"
            f" (length(bin({v})) * 16)"
            f" + ({v} div CAST(pow(2, greatest(length(bin({v}))"
            f" - 5, 0)) AS BIGINT)) % 16 END"
        )
        counters = (
            stream.filter("value IS NOT NULL")
            .selectExpr(f"{bucket} AS bucket", f"{v} AS vm")
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("c"),
                F.expr("CAST(MIN(vm) AS BIGINT) AS lo"),
            )
        )
        q = _start_stream(
            spark,
            counters.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option(
                "checkpointLocation",
                _stream_tmpdir(prefix="stream_qsk_ck_"),
            )
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        walk = spark.table(name).selectExpr(
            "bucket",
            "lo",
            "SUM(c) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED"
            " PRECEDING AND CURRENT ROW) AS cum",
            "SUM(c) OVER () AS n",
        )
        outs = []
        exacts = static.filter("value IS NOT NULL").agg(
            *[
                F.expr(
                    f"round(CAST(percentile_disc({qq!r}) WITHIN GROUP"
                    f" (ORDER BY value) AS DOUBLE), 6) AS e_{i}"
                )
                for i, qq in enumerate((0.5, 0.9, 0.99))
            ]
        )
        for i, qq in enumerate((0.5, 0.9, 0.99)):
            outs.append(
                walk.filter(f"cum >= ceil({qq!r} * n)")
                .groupBy("n")
                .agg(
                    F.expr("CAST(min_by(lo, bucket) AS BIGINT) AS lo_micro")
                )
                .selectExpr(
                    f"CAST({qq!r} AS DOUBLE) AS q",
                    "round(CAST(lo_micro AS DOUBLE) / 1000000, 6) AS est",
                    "CAST(n AS BIGINT) AS n",
                )
            )
        from functools import reduce as _reduce

        sk = _reduce(DataFrame.unionByName, outs)
        cases = " ".join(
            f"WHEN q = CAST({qq!r} AS DOUBLE) THEN e_{i}"
            for i, qq in enumerate((0.5, 0.9, 0.99))
        )
        return sk.crossJoin(F.broadcast(exacts)).selectExpr(
            "q", "est", f"CASE {cases} END AS exact", "n"
        )


_register_streaming_quantile_sketch()


@register(
    "diff_in_diff",
    """
    WITH s AS (
      SELECT
        CAST(SUM(CASE WHEN NOT (user_id % 2 = 1)
              AND NOT (ts >= TIMESTAMP '2024-01-16 00:00:00')
              THEN 1 ELSE 0 END) AS BIGINT) AS n_c_pre,
        SUM(CASE WHEN NOT (user_id % 2 = 1)
              AND NOT (ts >= TIMESTAMP '2024-01-16 00:00:00')
              THEN CAST(floor(value * 1000000 + 0.5) AS DECIMAL(38,0))
              ELSE 0 END) AS s_c_pre,
        CAST(SUM(CASE WHEN NOT (user_id % 2 = 1)
              AND (ts >= TIMESTAMP '2024-01-16 00:00:00')
              THEN 1 ELSE 0 END) AS BIGINT) AS n_c_post,
        SUM(CASE WHEN NOT (user_id % 2 = 1)
              AND (ts >= TIMESTAMP '2024-01-16 00:00:00')
              THEN CAST(floor(value * 1000000 + 0.5) AS DECIMAL(38,0))
              ELSE 0 END) AS s_c_post,
        CAST(SUM(CASE WHEN (user_id % 2 = 1)
              AND NOT (ts >= TIMESTAMP '2024-01-16 00:00:00')
              THEN 1 ELSE 0 END) AS BIGINT) AS n_t_pre,
        SUM(CASE WHEN (user_id % 2 = 1)
              AND NOT (ts >= TIMESTAMP '2024-01-16 00:00:00')
              THEN CAST(floor(value * 1000000 + 0.5) AS DECIMAL(38,0))
              ELSE 0 END) AS s_t_pre,
        CAST(SUM(CASE WHEN (user_id % 2 = 1)
              AND (ts >= TIMESTAMP '2024-01-16 00:00:00')
              THEN 1 ELSE 0 END) AS BIGINT) AS n_t_post,
        SUM(CASE WHEN (user_id % 2 = 1)
              AND (ts >= TIMESTAMP '2024-01-16 00:00:00')
              THEN CAST(floor(value * 1000000 + 0.5) AS DECIMAL(38,0))
              ELSE 0 END) AS s_t_post
      FROM events WHERE value IS NOT NULL)
    SELECT n_c_pre, n_c_post, n_t_pre, n_t_post,
      round(CAST(s_c_pre AS DOUBLE) / 1000000 / n_c_pre, 6) AS mean_c_pre,
      round(CAST(s_c_post AS DOUBLE) / 1000000 / n_c_post, 6) AS mean_c_post,
      round(CAST(s_t_pre AS DOUBLE) / 1000000 / n_t_pre, 6) AS mean_t_pre,
      round(CAST(s_t_post AS DOUBLE) / 1000000 / n_t_post, 6) AS mean_t_post,
      round((CAST(s_t_post AS DOUBLE) / 1000000 / n_t_post
             - CAST(s_t_pre AS DOUBLE) / 1000000 / n_t_pre)
          - (CAST(s_c_post AS DOUBLE) / 1000000 / n_c_post
             - CAST(s_c_pre AS DOUBLE) / 1000000 / n_c_pre), 6) AS did
    FROM s
    """,
)
def q_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: how much more did odd-user-id (the
    "treated" cohort) event values move across Jan 16 than even-user-id
    values — the causal A/B readout that nets out the common time
    trend. One aggregate to four exact micro-DECIMAL cells; means and
    the DiD are mirrored double expressions
    (``operators/profiling.py::diff_in_diff``)."""
    from institutional_fx_etl_spark.operators.profiling import diff_in_diff

    return diff_in_diff(
        load_table(spark, sf_dir, "events"),
        "value",
        "user_id % 2 = 1",
        "ts >= TIMESTAMP '2024-01-16 00:00:00'",
    )


@register(
    "streaming_countmin",
    """
    WITH ks AS (SELECT user_id AS k FROM events WHERE user_id IS NOT NULL),
    hrows AS (SELECT i FROM (VALUES (0), (1), (2), (3)) t(i))
    SELECT i,
           CAST(concat('0x', substr(md5(concat('cms', i, '_',
             CAST(k AS VARCHAR))), 1, 8)) AS BIGINT) % 256 AS bucket,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM ks CROSS JOIN hrows GROUP BY 1, 2
    """,
)
def q_streaming_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING count-min: the d×w counter matrix maintained as a
    live streaming aggregation (complete mode — the state IS the
    sketch, bounded at d·w rows forever) over the bounded events
    source; must equal the batch ``countmin_counters`` matrix exactly
    (the whole point of a deterministic sketch: any ingestion order,
    batch or streaming, yields the identical structure)."""
    import tempfile

    from institutional_fx_etl_spark.operators.sketches import (
        countmin_counters,
    )
    from institutional_fx_etl_spark.sources.readers import (
        read_parquet_nanos_safe,
    )

    name = "streaming_countmin_result"
    static = read_parquet_nanos_safe(spark, f"{sf_dir}/events.parquet")
    stream = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    counters = countmin_counters(
        stream.filter("user_id IS NOT NULL"), "user_id"
    ).selectExpr("i", "bucket", "CAST(cnt AS BIGINT) AS cnt")
    q = _start_stream(
        spark,
        counters.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option(
            "checkpointLocation",
            _stream_tmpdir(prefix="stream_cms_ck_"),
        )
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


@register(
    "decay_score",
    """
    WITH t AS (
      SELECT user_id AS key,
             CAST(floor(value / CAST(pow(2, least(greatest(
                 CAST(date_diff('day', CAST(ts AS DATE),
                      DATE '2024-02-01') AS INT) // 1, 0), 40))
               AS BIGINT) * 1000000 + 0.5) AS DECIMAL(38,0)) AS t
      FROM events WHERE value IS NOT NULL)
    SELECT key, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(t) AS DOUBLE) / 1000000 AS decayed_score
    FROM t GROUP BY key
    """,
)
def q_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted per-user engagement: Σ value · 2^(−age_days) as
    of 2024-02-01 — base-2 decay so every weight is an EXACT double
    (no libm transcendental to drift), per-term micro-rounding +
    DECIMAL sum for order invariance
    (``operators/timeseries.py::decay_score``)."""
    from institutional_fx_etl_spark.operators.timeseries import decay_score

    return decay_score(
        load_table(spark, sf_dir, "events"),
        "user_id",
        "value",
        "ts",
        "2024-02-01",
    )


@register(
    "fuzzy_lookup_join",
    """
    WITH cat AS (SELECT DISTINCT p_name AS ctext FROM part
                 WHERE length(p_name) >= 3),
    catg AS (
      SELECT ctext,
             list_distinct([substring(lower(ctext), i, 3)
                            for i in range(1, length(lower(ctext)) - 1)])
               AS cg
      FROM cat),
    qs AS (
      SELECT p_partkey AS qid,
             concat(substring(p_name, 1, 2), substring(p_name, 4)) AS qtext
      FROM part WHERE p_partkey % 97 = 0),
    qg AS (
      SELECT qid, qtext,
             list_distinct([substring(lower(qtext), i, 3)
                            for i in range(1, length(lower(qtext)) - 1)])
               AS qg
      FROM qs WHERE length(qtext) >= 3),
    gdf AS (
      SELECT g, count(*) AS df
      FROM (SELECT ctext, unnest(cg) AS g FROM catg)
      GROUP BY g),
    hot AS (
      SELECT coalesce(list(g), []) AS hotg FROM gdf WHERE df > 1024),
    pairs AS (
      SELECT q.qid, q.qtext, c.ctext,
             CAST(len(list_intersect(q.qg, c.cg)) AS BIGINT) AS shared,
             len(q.qg) AS nq, len(c.cg) AS nc,
             len(list_intersect(
               list_filter(q.qg, g -> NOT list_contains(h.hotg, g)),
               c.cg)) AS shared_cool
      FROM qg q CROSS JOIN catg c CROSS JOIN hot h),
    scored AS (
      -- candidate rule mirrors fuzzy_best_match's max_df=1024 cap:
      -- a pair must share >= 1 trigram whose catalog df <= 1024;
      -- the SCORE still uses the full uncapped intersection
      SELECT qid, qtext, ctext, shared,
             round(CAST(shared AS DOUBLE) / (nq + nc - shared), 6) AS j
      FROM pairs WHERE shared_cool >= 1),
    best AS (
      SELECT *, row_number() OVER (PARTITION BY qid
                ORDER BY j DESC, ctext ASC) AS rn
      FROM scored)
    SELECT qid, qtext AS query_text, ctext AS match_text, shared,
           j AS jaccard
    FROM best WHERE rn = 1
    """,
)
def q_fuzzy_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy best-match lookup: part names corrupted by deleting their
    3rd character resolve back against the distinct-name catalog by
    trigram Jaccard — capped-inverted-index blocking (lossless: a
    candidate must share ≥1 trigram, exactly the Jaccard>0 pairs),
    query trigrams broadcast, one composite-key ``min_by`` argmax with
    a deterministic tie order
    (``operators/linkage.py::fuzzy_best_match``). The single-node
    oracle brute-forces the cross product the blocking avoids."""
    from institutional_fx_etl_spark.operators.linkage import (
        fuzzy_best_match,
    )

    part = load_table(spark, sf_dir, "part")
    queries = part.filter("p_partkey % 97 = 0").selectExpr(
        "p_partkey AS qid",
        "concat(substring(p_name, 1, 2), substring(p_name, 4)) AS qtext",
    )
    catalog = part.select("p_name").distinct()
    return fuzzy_best_match(queries, catalog, "qid", "qtext", "p_name")


@register(
    "hll_estimate",
    """
    WITH hashed AS (
      SELECT event_type AS grp, user_id AS k,
             CAST(concat('0x', substr(md5(concat('hll',
               CAST(user_id AS VARCHAR))), 1, 15)) AS BIGINT) AS h
      FROM events WHERE user_id IS NOT NULL),
    rho AS (
      SELECT grp, k, h % 256 AS j,
             CASE WHEN h // 256 = 0 THEN 30
                  ELSE least(53 - length(bin(h // 256)), 30) END AS rho
      FROM hashed),
    regs AS (
      SELECT grp, j, CAST(MAX(rho) AS BIGINT) AS mj
      FROM rho GROUP BY grp, j),
    sk AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_hit,
             CAST(SUM(CAST(pow(2, 30 - mj) AS BIGINT)) AS BIGINT) AS s_hit
      FROM regs GROUP BY grp),
    truth AS (
      SELECT event_type AS grp,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS true_distinct
      FROM events WHERE user_id IS NOT NULL GROUP BY 1),
    joined AS (
      SELECT t.grp, t.true_distinct, CAST(256 AS BIGINT) AS m,
             256 - s.n_hit AS v_zero,
             s.s_hit + (256 - s.n_hit) * CAST(1073741824 AS BIGINT)
               AS sum_scaled
      FROM truth t JOIN sk s ON t.grp = s.grp)
    SELECT grp, true_distinct, m, v_zero, sum_scaled,
           round(CASE WHEN 0.718272 * 256 * 256 * CAST(1073741824 AS DOUBLE)
                        / CAST(sum_scaled AS DOUBLE) <= 2.5 * 256
                        AND v_zero > 0
                  THEN 256 * ln(CAST(256 AS DOUBLE) / v_zero)
                  ELSE 0.718272 * 256 * 256 * CAST(1073741824 AS DOUBLE)
                       / CAST(sum_scaled AS DOUBLE) END, 4) AS est
    FROM joined
    """,
)
def q_hll_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HyperLogLog per event type, exact truth beside
    the estimate — md5-derived registers, leading-zero rank from
    INTEGER STRING ops (no float log), harmonic sum as an exact scaled
    BIGINT so summation order cannot drift it; the one ln (the
    linear-counting small-range branch) and final division are single
    mirrored expressions (``operators/sketches.py::hll_estimate``).
    Upgrades the engine's cardinality-sketch story from the rows-only
    ``sketch_stats`` to a fully oracle-paired construction."""
    from institutional_fx_etl_spark.operators.sketches import hll_estimate

    ev = load_table(spark, sf_dir, "events").filter("user_id IS NOT NULL")
    return hll_estimate(ev, "user_id", "event_type")


@register(
    "mixture_sampling",
    """
    WITH counts AS (
      SELECT source AS grp, count(*) AS n_docs,
             CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1000000.0
                        + 0.5) AS BIGINT) AS w_micro
      FROM documents GROUP BY source),
    tot AS (
      SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total,
             CAST(SUM(w_micro) AS BIGINT) AS w_denom
      FROM counts),
    rates AS (
      SELECT grp, n_docs,
             least(1.0, CAST(floor(0.5 * CAST(n_total AS DOUBLE))
                             AS DOUBLE)
                   * CAST(w_micro AS DOUBLE) / CAST(w_denom AS DOUBLE)
                   / CAST(n_docs AS DOUBLE)) AS rate
      FROM counts CROSS JOIN tot),
    sampled AS (
      SELECT d.source AS grp, count(*) AS n_sampled
      FROM documents d JOIN rates r ON d.source = r.grp
      WHERE CAST(concat('0x', substr(md5(concat('mix',
              CAST(d.doc_id AS VARCHAR))), 1, 15)) AS BIGINT)
            / CAST(1152921504606846976 AS DOUBLE) < r.rate
      GROUP BY d.source)
    SELECT r.grp AS grp_name, r.n_docs,
           CAST(floor(r.rate * 1000000.0 + 0.5) AS BIGINT) AS rate_ppm,
           CAST(COALESCE(s.n_sampled, 0) AS BIGINT) AS n_sampled
    FROM rates r LEFT JOIN sampled s ON r.grp = s.grp
    """,
)
def q_mixture_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted source mixing (alpha=0.5, budget 50%):
    per-source sampling rates that flatten the corpus toward
    sqrt-share, realized by a deterministic md5 Bernoulli per doc —
    the corpus-mixing pass of a pretraining pipeline as a scan
    decoration (one tiny per-source aggregate + broadcast join; the
    corpus never shuffles — ``operators/selection.py::
    mixture_sampling``)."""
    from institutional_fx_etl_spark.operators.selection import (
        mixture_sampling,
    )

    docs = load_table(spark, sf_dir, "documents")
    return mixture_sampling(
        docs, group_col="source", id_col="doc_id",
        alpha=0.5, budget_frac=0.5,
    )


@register(
    "dsir_weights",
    """
    WITH tok AS (
      SELECT id, t,
             CAST(concat('0x', substr(md5(concat('dsir', w)), 1, 8))
                  AS BIGINT) % 64 AS b
      FROM (
        SELECT doc_id AS id,
               CAST(COALESCE(lang = 'en', false) AS INT) AS t,
               unnest(string_split_regex(lower(text), '\\s+')) AS w
        FROM documents)
      WHERE w <> ''),
    dist AS (
      SELECT b, CAST(SUM(t) AS BIGINT) AS ct,
             CAST(SUM(1 - t) AS BIGINT) AS cs
      FROM tok GROUP BY b),
    tots AS (
      SELECT CAST(SUM(ct) AS BIGINT) AS tt,
             CAST(SUM(cs) AS BIGINT) AS ts
      FROM dist),
    lr AS (
      SELECT b,
             CAST(floor((ln((CAST(ct AS DOUBLE) + 1.0)
                            / (CAST(tt AS DOUBLE) + 64.0))
                         - ln((CAST(cs AS DOUBLE) + 1.0)
                              / (CAST(ts AS DOUBLE) + 64.0)))
                        * 1000000.0 + 0.5) AS BIGINT) AS lr_micro
      FROM dist CROSS JOIN tots),
    docb AS (SELECT id, b, count(*) AS c FROM tok GROUP BY id, b)
    SELECT d.id AS doc_id,
           CAST(SUM(d.c) AS BIGINT) AS n_toks,
           CAST(SUM(d.c * l.lr_micro) AS BIGINT) AS log_weight_micro,
           CAST(CAST(SUM(d.c * l.lr_micro) AS BIGINT) AS DOUBLE)
             / 1000000.0 AS log_weight
    FROM docb d JOIN lr l ON d.b = l.b
    GROUP BY d.id
    """,
)
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights against the lang='en' target: hashed-
    unigram log-likelihood ratios, add-one smoothed, micro-quantized
    per bucket so the per-doc sum is exact integer arithmetic —
    the data-selection scoring pass of a pretraining pipeline
    (``operators/selection.py::dsir_weights``; Xie et al. 2023)."""
    from institutional_fx_etl_spark.operators.selection import (
        dsir_weights,
    )

    docs = load_table(spark, sf_dir, "documents")
    return dsir_weights(
        docs, target_expr="COALESCE(lang = 'en', false)",
        text_col="text", id_col="doc_id", buckets=64,
    )


def _rp_oracle(out_dim: int = 16, num_dims: int = 64) -> str:
    """DuckDB twin of ``similarity.py::random_projection``: the SAME
    md5-derived ±1 plane literals (hashlib == both engines' md5),
    ``list_dot_product`` mirroring Spark's zip_with fold — the proven
    cosine-oracle pairing — and the same round-6 + sign-bit
    normalization."""
    import hashlib

    terms = []
    for j in range(out_dim):
        signs = []
        for i in range(num_dims):
            h = int(
                hashlib.md5(f"plane{j}_{i}".encode()).hexdigest()[:8], 16
            )
            signs.append("1.0" if h % 2 == 0 else "-1.0")
        terms.append(
            "round(list_dot_product(vv, ["
            + ", ".join(signs)
            + "]), 6) + 0.0"
        )
    return f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings)
    SELECT vec_id, CAST(p AS BIGINT) AS p, proj FROM (
      SELECT vec_id, unnest(range(1, {out_dim + 1})) AS p,
             unnest([{", ".join(terms)}]) AS proj
      FROM v)
    """


@register(
    "knn_incremental",
    """
    WITH v AS (SELECT vec_id AS vid, CAST(embedding AS DOUBLE[]) AS vv
               FROM embeddings),
    cents AS (SELECT vid AS cid, vv AS cv FROM v
              WHERE vid % 17 <> 0
                AND vid < greatest(8, CAST(ceil(
                  (SELECT count(*) FROM v WHERE vid % 17 <> 0) / 512.0)
                  AS BIGINT))),
    scored AS (
      SELECT v.vid, v.vv, c.cid,
             round(list_dot_product(v.vv, c.cv)
                   / (sqrt(list_dot_product(v.vv, v.vv))
                      * sqrt(list_dot_product(c.cv, c.cv))), 6) AS ccos
      FROM v CROSS JOIN cents c
    ),
    assigned AS (
      SELECT vid, vv, cid FROM (
        SELECT *, row_number() OVER
          (PARTITION BY vid ORDER BY ccos DESC, cid) AS rn
        FROM scored) WHERE rn = 1
    ),
    normed AS (
      SELECT vid, cid,
             list_transform(vv, x -> x / sqrt(list_dot_product(vv, vv)))
               AS vn
      FROM assigned
    ),
    s AS (
      SELECT a.vid, b.vid AS nn_id,
             round(list_dot_product(a.vn, b.vn), 6) AS cosine
      FROM normed a JOIN normed b
        ON a.cid = b.cid AND a.vid <> b.vid
    )
    SELECT vid AS vec_id, nn_id,
           CAST(row_number() OVER
             (PARTITION BY vid ORDER BY cosine DESC, nn_id) AS INT)
             AS rank,
           cosine
    FROM s QUALIFY rank <= 3
    """,
)
def q_knn_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental KNN-table maintenance: the corpus splits into an
    existing part (vec_id % 17 <> 0, with its KNN table already
    built) and an arriving batch (vec_id % 17 = 0); only the cells
    the batch touches recompute — Σ|affected cell|² pair work instead
    of Σ|cell|² (``operators/similarity.py::knn_join_incremental``).
    The ORACLE is the from-scratch full-corpus KNN under the same
    frozen centroids, so a hash match IS the incremental ≡ rebuild
    proof, cross-engine."""
    import math

    from institutional_fx_etl_spark.operators.similarity import (
        knn_join,
        knn_join_incremental,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    old = emb.filter("vec_id % 17 <> 0")
    new = emb.filter("vec_id % 17 = 0")
    n_cells = max(8, math.ceil(old.count() / 512.0))
    centroids = old.filter(f"vec_id < {n_cells}").selectExpr(
        "vec_id AS cid",
        "transform(embedding, x -> cast(x as double)) AS cv",
    )
    # the centroid table is consumed by THREE assignment passes (the
    # standing-table build + both incremental sides), each of which
    # re-collected its probe from the corpus scan — one driver-local
    # VALUES materialization makes those probes job-free (guide §5)
    from institutional_fx_etl_spark.functions.localrel import (
        localized_if_small,
    )

    centroids = localized_if_small(centroids)
    old_topk = knn_join(old, k=3, centroids=centroids)
    return knn_join_incremental(old, new, old_topk, centroids, k=3)


@register(
    "shuffle_shards",
    """
    WITH d AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5(concat('shuf',
               CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) AS draw
      FROM documents)
    SELECT doc_id, draw % 16 AS shard,
           CAST(row_number() OVER (PARTITION BY draw % 16
             ORDER BY draw, doc_id) - 1 AS BIGINT) AS pos
    FROM d
    """,
)
def q_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training shuffle: md5 draw → shard + in-
    shard position (the export layout a pretraining loader streams) —
    one scan expression plus ONE shard-partitioned ranking window;
    reproducible under any partitioning, unlike rand() shuffles
    (``operators/selection.py::shuffle_shards``)."""
    from institutional_fx_etl_spark.operators.selection import (
        shuffle_shards,
    )

    docs = load_table(spark, sf_dir, "documents")
    return shuffle_shards(docs, id_col="doc_id", n_shards=16)


@register("random_projection", _rp_oracle())
def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss ±1 random projection of the embedding
    table to 16 dims (long form — one row per coordinate): the cheap
    distance-preserving sketch in front of clustering/ANN over wide
    vectors. Pure scan-side map, zero shuffles
    (``operators/similarity.py::random_projection``)."""
    from institutional_fx_etl_spark.operators.similarity import (
        random_projection,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return random_projection(emb, out_dim=16)


# ---------------------------------------------------------------------
# Round-9 operators — curriculum/budget corpus composition, n-gram
# novelty, and the fixed-unroll PCA power iteration
# ---------------------------------------------------------------------


@register(
    "curriculum_order",
    """
    WITH n AS (SELECT count(*) AS n FROM documents),
    h AS (SELECT n_chars AS score, count(*) AS cnt
          FROM documents GROUP BY 1),
    c AS (SELECT score, COALESCE(SUM(cnt) OVER (ORDER BY score
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS below FROM h),
    st AS (SELECT score, CAST(1 + (below * 4) // n.n AS BIGINT) AS stage
           FROM c, n),
    d AS (SELECT doc_id, n_chars AS score,
            CAST(concat('0x', substr(md5(concat('curr',
              CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) AS draw
          FROM documents)
    SELECT d.doc_id, d.score, st.stage, d.draw % 8 AS shard,
           CAST(row_number() OVER (PARTITION BY st.stage, d.draw % 8
             ORDER BY d.draw, d.doc_id) - 1 AS BIGINT) AS pos
    FROM d JOIN st USING (score)
    """,
)
def q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum export layout: difficulty stage = tie-stable score
    quantile (from the bounded score histogram, never a global row
    window), then the deterministic md5 shuffle-shards layout within
    each stage (``operators/selection.py::curriculum_order``)."""
    from institutional_fx_etl_spark.operators.selection import (
        curriculum_order,
    )

    docs = load_table(spark, sf_dir, "documents")
    return curriculum_order(docs, stages=4, n_shards=8)


#: the water-filling allocation as a reusable CTE prefix (ends in an
#: `alloc` CTE) — ONE source of truth shared by token_budget_fit and
#: token_quota_take, so a cap-rule change cannot silently diverge them
_DUCK_WATERFILL_CTES = """
    WITH s AS (SELECT source, CAST(SUM(n_chars) AS BIGINT) AS toks
               FROM documents GROUP BY source),
    o AS (SELECT source, toks,
            row_number() OVER (ORDER BY toks, source) AS rk,
            SUM(toks) OVER (ORDER BY toks, source
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM s),
    t AS (SELECT CAST(SUM(toks) AS BIGINT) * 1 // 2 AS budget,
                 count(*) AS m FROM s),
    f AS (SELECT o.*, t.budget, t.m,
            ((cum - toks) + (m - rk + 1) * toks) >= t.budget
              AS capped_here
          FROM o, t),
    x AS (SELECT MIN(rk) AS xk,
                 arg_min(cum - toks, rk) AS cum_below,
                 arg_min(budget, rk) AS budget,
                 arg_min(m, rk) AS m
          FROM f WHERE capped_here),
    p AS (SELECT xk,
                 (budget - cum_below) // (m - xk + 1) AS cap,
                 (budget - cum_below) % (m - xk + 1) AS bonus FROM x),
    alloc AS (
      SELECT f.source, f.toks,
             CAST(CASE WHEN f.rk < p.xk THEN f.toks
                       WHEN f.rk < p.xk + p.bonus THEN p.cap + 1
                       ELSE p.cap END AS BIGINT) AS alloc
      FROM f, p)
""".strip()


@register(
    "token_budget_fit",
    _DUCK_WATERFILL_CTES + """
    SELECT source, toks, alloc FROM alloc
    """,
)
def q_token_budget_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Water-filling token-budget allocation (budget = half the
    corpus): exact integer cap + remainder distribution so
    Σ alloc = budget exactly; corpus touched by ONE aggregate
    (``operators/selection.py::token_budget_fit``)."""
    from institutional_fx_etl_spark.operators.selection import (
        token_budget_fit,
    )

    docs = load_table(spark, sf_dir, "documents")
    return token_budget_fit(docs, budget_num=1, budget_den=2)


@register(
    "token_quota_take",
    _DUCK_WATERFILL_CTES + """,
    d AS (SELECT doc_id, source AS grp, CAST(n_chars AS BIGINT) AS w,
            CAST(concat('0x', substr(md5(concat('tq',
                 CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) AS draw
          FROM documents),
    r AS (SELECT doc_id, grp, w,
            SUM(w) OVER (PARTITION BY grp ORDER BY draw, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_w
          FROM d)
    SELECT r.doc_id, r.grp, r.w, CAST(r.cum_w AS BIGINT) AS cum_w
    FROM r JOIN alloc a ON a.source = r.grp
    WHERE r.cum_w <= a.alloc
    """,
)
def q_token_quota_take(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The executable half of token_budget_fit: per source, the
    md5-ordered document PREFIX whose running token sum fits the
    water-filled allocation — one corpus aggregate + one
    source-partitioned running-sum window, quota table broadcast
    (``operators/selection.py::token_quota_take``)."""
    from institutional_fx_etl_spark.operators.selection import (
        token_quota_take,
    )

    docs = load_table(spark, sf_dir, "documents")
    return token_quota_take(docs, budget_num=1, budget_den=2)


@register(
    "ngram_novelty",
    f"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
      FROM documents
    ),
    e AS (
      SELECT doc_id, unnest({_DUCK_SHINGLES.format(toks='toks')}) AS h
      FROM t WHERE len(toks) >= 3
    ),
    own AS (SELECT h, MIN(doc_id) AS first_doc FROM e GROUP BY h)
    SELECT e.doc_id,
           CAST(count(*) AS BIGINT) AS n_ngrams,
           CAST(SUM(CASE WHEN own.first_doc = e.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           round(CAST(SUM(CASE WHEN own.first_doc = e.doc_id
                          THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
             AS novelty
    FROM e JOIN own USING (h)
    GROUP BY e.doc_id
    """,
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty: fraction of a doc's distinct
    3-gram shingles first seen (min doc id) in that doc — the
    corpus-level "new text" signal; shuffles carry 8-byte hashes only
    (``operators/text.py::ngram_novelty``)."""
    from institutional_fx_etl_spark.operators.text import ngram_novelty

    return ngram_novelty(load_table(spark, sf_dir, "documents"))


@register(
    "emb_pca_power",
    """
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0 + 0.5)
                         AS BIGINT)) AS qv
      FROM embeddings
    ),
    u AS (
      SELECT vec_id, u.pos AS pos, u.x AS x
      FROM q,
      unnest(list_transform(range(1, len(qv)+1),
             i -> struct_pack(pos := i - 1, x := qv[i]))) AS t(u)
    ),
    g AS (
      SELECT a.pos AS i, b.pos AS j, SUM(a.x * b.x) AS g
      FROM u a JOIN u b USING (vec_id)
      GROUP BY a.pos, b.pos
    ),
    s AS (SELECT pos, SUM(x) AS s FROM u GROUP BY pos),
    n AS (SELECT count(*) AS n FROM q),
    m AS (
      SELECT CAST(g.i AS BIGINT) AS i, CAST(g.j AS BIGINT) AS j,
             CAST(n.n AS HUGEINT) * g.g
               - CAST(si.s AS HUGEINT) * sj.s AS m
      FROM g, n
      JOIN s si ON si.pos = g.i
      JOIN s sj ON sj.pos = g.j
    ),
    mm AS (SELECT MAX(ABS(m)) AS mmax FROM m),
    mq AS (
      SELECT i, j,
             CAST(floor((CAST(m AS DOUBLE) / CAST(mmax AS DOUBLE))
               * 1000000.0 + 0.5) AS BIGINT) AS mq
      FROM m, mm
    ),
    v0 AS (SELECT DISTINCT i, CAST(1000000 AS BIGINT) AS v FROM mq),
    w1 AS (SELECT mq.i, SUM(mq.mq * v0.v) AS w
           FROM mq JOIN v0 ON mq.j = v0.i GROUP BY mq.i),
    x1 AS (SELECT MAX(ABS(w)) AS wmax FROM w1),
    v1 AS (SELECT i, CAST(floor((CAST(w AS DOUBLE) / CAST(wmax AS DOUBLE))
             * 1000000.0 + 0.5) AS BIGINT) AS v FROM w1, x1),
    w2 AS (SELECT mq.i, SUM(mq.mq * v1.v) AS w
           FROM mq JOIN v1 ON mq.j = v1.i GROUP BY mq.i),
    x2 AS (SELECT MAX(ABS(w)) AS wmax FROM w2),
    v2 AS (SELECT i, CAST(floor((CAST(w AS DOUBLE) / CAST(wmax AS DOUBLE))
             * 1000000.0 + 0.5) AS BIGINT) AS v FROM w2, x2),
    w3 AS (SELECT mq.i, SUM(mq.mq * v2.v) AS w
           FROM mq JOIN v2 ON mq.j = v2.i GROUP BY mq.i),
    x3 AS (SELECT MAX(ABS(w)) AS wmax FROM w3),
    v3 AS (SELECT i, CAST(floor((CAST(w AS DOUBLE) / CAST(wmax AS DOUBLE))
             * 1000000.0 + 0.5) AS BIGINT) AS v FROM w3, x3)
    SELECT i, v FROM v3
    """,
)
def q_emb_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal direction by 3-step fixed-unroll power
    iteration over the integer Gram statistics — corpus touched once,
    every iterate micro-quantized so both engines walk identical
    integers (``operators/embstats.py::embedding_pca_power``)."""
    from institutional_fx_etl_spark.operators.embstats import (
        embedding_pca_power,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_pca_power(emb, "embedding", dim=64, scale=1000, iters=3)


#: the dedup_minhash_lsh oracle body, reused as a CTE prefix by the
#: pair-consuming round-9 queries (nearest-dup ranking, sketch-error
#: eval) — ONE source of truth for the banding/cap mirror, so a cap
#: change cannot silently diverge the family
_DUCK_LSH_PAIR_CTES = f"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks FROM documents
    ),
    t2 AS (
      SELECT doc_id, {_DUCK_SHINGLES.format(toks='toks')} AS sh
      FROM t WHERE len(toks) >= 3
    ),
    sigs AS (
      SELECT doc_id, sh,
             list_transform(range(0, 16), i -> list_min(
               list_transform(sh, h -> ((2*i+1)*h + (7*i+3)) % 2147483647))) AS sig
      FROM t2
    ),
    banded AS (
      SELECT doc_id, b.band_idx,
             md5(array_to_string(sig[b.band_idx*4+1 : b.band_idx*4+4], ',')) AS band_sig
      FROM sigs, (SELECT unnest(range(0, 4)) AS band_idx) b
    ),
    capped AS (
      SELECT doc_id, band_idx, band_sig FROM (
        SELECT *, count(*) OVER (PARTITION BY band_idx, band_sig) AS __n
        FROM banded
      ) WHERE __n <= 64
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
      FROM capped a JOIN capped c USING (band_idx, band_sig)
      WHERE a.doc_id < c.doc_id
    ),
    pairs AS (
      SELECT id_a, id_b,
             round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                   / len(list_distinct(list_concat(sa.sh, sb.sh))), 6) AS jaccard
      FROM cand
      JOIN t2 sa ON sa.doc_id = cand.id_a
      JOIN t2 sb ON sb.doc_id = cand.id_b
      WHERE round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                  / len(list_distinct(list_concat(sa.sh, sb.sh))), 6) >= 0.2
    )
"""


@register(
    "dedup_nearest_text",
    _DUCK_LSH_PAIR_CTES
    + """
    , sym AS (
      SELECT id_a AS doc_id, id_b AS nn_id, jaccard FROM pairs
      UNION ALL
      SELECT id_b AS doc_id, id_a AS nn_id, jaccard FROM pairs
    )
    SELECT doc_id, nn_id,
           CAST(row_number() OVER (PARTITION BY doc_id
             ORDER BY jaccard DESC, nn_id) AS INTEGER) AS rank,
           jaccard
    FROM sym QUALIFY rank <= 3
    """,
)
def q_dedup_nearest_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 nearest near-duplicates by exact shingle
    Jaccard among the LSH candidates — the text-side knn_join
    (``operators/dedup.py::nearest_text_dupes``)."""
    from institutional_fx_etl_spark.operators.dedup import (
        nearest_text_dupes,
    )

    return nearest_text_dupes(
        load_table(spark, sf_dir, "documents"), k=3, jaccard_threshold=0.2
    )


@register(
    "dedup_minhash_error",
    _DUCK_LSH_PAIR_CTES
    + """
    SELECT p.id_a, p.id_b, p.jaccard,
           round(CAST(list_sum(list_transform(range(1, 17), i ->
             CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END))
             AS DOUBLE) / 16, 6) AS est_jaccard,
           round(abs(round(CAST(list_sum(list_transform(range(1, 17), i ->
             CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END))
             AS DOUBLE) / 16, 6) - p.jaccard), 6) AS abs_err
    FROM pairs p
    JOIN sigs sa ON sa.doc_id = p.id_a
    JOIN sigs sb ON sb.doc_id = p.id_b
    """,
)
def q_dedup_minhash_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch honesty eval: signature-estimated vs exact Jaccard on
    every surviving LSH candidate pair — the num_perm sizing gate
    (``operators/dedup.py::minhash_estimate_error``)."""
    from institutional_fx_etl_spark.operators.dedup import (
        minhash_estimate_error,
    )

    return minhash_estimate_error(
        load_table(spark, sf_dir, "documents"), jaccard_threshold=0.2
    )


@register(
    "ngram_novelty_incremental",
    f"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
      FROM documents
    ),
    e AS (
      SELECT doc_id, unnest({_DUCK_SHINGLES.format(toks='toks')}) AS h
      FROM t WHERE len(toks) >= 3
    ),
    own AS (SELECT h, MIN(doc_id) AS first_doc FROM e GROUP BY h)
    SELECT e.doc_id,
           CAST(count(*) AS BIGINT) AS n_ngrams,
           CAST(SUM(CASE WHEN own.first_doc = e.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           round(CAST(SUM(CASE WHEN own.first_doc = e.doc_id
                          THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
             AS novelty
    FROM e JOIN own USING (h)
    WHERE e.doc_id % 13 = 0
    GROUP BY e.doc_id
    """,
)
def q_ngram_novelty_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental novelty maintenance: new docs (id % 13 = 0) scored
    against the old corpus's (h, first_doc) STATE + the new batch
    itself — the oracle is the FULL run restricted to new ids, so the
    driver hash match proves incremental ≡ full
    (``operators/text.py::ngram_novelty_incremental``)."""
    from institutional_fx_etl_spark.operators.text import (
        ngram_novelty_incremental,
    )

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "is_new", F.expr("doc_id % 13 = 0")
    )
    return ngram_novelty_incremental(docs, "is_new")


@register(
    "lsh_multiprobe_pairs",
    """
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
    pj AS (
      SELECT vec_id, vv,
             list_transform(range(0, 8), j ->
               list_sum(list_transform(range(0, len(vv)), i ->
                 vv[i+1] * (CASE WHEN CAST(concat('0x',
                     substr(md5(concat('plane', j, '_', i)),1,8)) AS BIGINT)
                     % 2 = 0 THEN 1.0 ELSE -1.0 END)))) AS pj
      FROM v
    ),
    sig AS (
      SELECT vec_id, vv, pj,
             CAST(list_sum(list_transform(range(0, 8), j ->
               CASE WHEN pj[j+1] > 0 THEN (1::BIGINT << j)
                    ELSE 0::BIGINT END)) AS BIGINT) AS bucket
      FROM pj
    ),
    pr AS (
      SELECT vec_id, bucket,
             list_concat([bucket],
               list_transform(
                 list_sort(list_transform(range(0, 8),
                   j -> [abs(pj[j+1]), CAST(j AS DOUBLE)]))[1:2],
                 s -> xor(bucket, 1::BIGINT << CAST(s[2] AS BIGINT))))
               AS probes
      FROM sig
    ),
    probes AS (SELECT vec_id, unnest(probes) AS pb FROM pr),
    cand AS (
      SELECT least(p.vec_id, s.vec_id) AS id_a,
             greatest(p.vec_id, s.vec_id) AS id_b,
             MIN(s.bucket) AS bucket
      FROM probes p JOIN sig s ON p.pb = s.bucket
        AND p.vec_id <> s.vec_id
      GROUP BY 1, 2
    ),
    normed AS (
      SELECT vec_id,
             list_transform(vv, x -> x / sqrt(list_dot_product(vv, vv)))
               AS vn
      FROM v
    )
    SELECT c.bucket AS bucket, c.id_a, c.id_b,
           round(list_dot_product(a.vn, b.vn), 6) AS cosine
    FROM cand c
    JOIN normed a ON c.id_a = a.vec_id
    JOIN normed b ON c.id_b = b.vec_id
    WHERE round(list_dot_product(a.vn, b.vn), 6) >= 0.3
    """,
)
def q_lsh_multiprobe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN (Lv et al. 2007): every vector also probes
    the buckets across its 2 lowest-margin hyperplanes — multi-table
    recall without extra tables; index side stays one bucket/vector
    (``operators/similarity.py::lsh_multiprobe_pairs``; recall-gated
    vs single-bucket in tests/test_round9_ops.py)."""
    from institutional_fx_etl_spark.operators.similarity import (
        lsh_multiprobe_pairs,
    )

    return lsh_multiprobe_pairs(
        load_table(spark, sf_dir, "embeddings"),
        num_planes=8,
        num_probes=2,
        min_cosine=0.3,
    )


def _pca_project_oracle() -> str:
    """The emb_pca_power oracle's CTE chain + one long-form projection
    join: proj_q = Σᵢ qᵢ·vᵢ over exact integers."""
    base = REGISTRY["emb_pca_power"][1]
    # reuse everything up to the final select, then project u onto v3
    cut = base.rindex("SELECT i, v FROM v3")
    return (
        base[:cut]
        + """, px AS (
      SELECT u.vec_id, CAST(SUM(u.x * v3.v) AS BIGINT) AS proj_q
      FROM u JOIN v3 ON v3.i = u.pos
      GROUP BY u.vec_id
    )
    SELECT vec_id, proj_q FROM px
    """
    )


@register("emb_pca_project", _pca_project_oracle())
def q_emb_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every embedding's coordinate along the dominant principal
    direction (PCA outlier/prototypicality score): the d-row
    eigenvector collects driver-side and projects as a scan literal —
    exact integer dot, zero corpus shuffles beyond the Gram pass
    (``operators/embstats.py::embedding_pca_project``)."""
    from institutional_fx_etl_spark.operators.embstats import (
        embedding_pca_project,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_pca_project(
        emb, "embedding", dim=64, scale=1000, iters=3
    )


@register(
    "cross_source_overlap",
    f"""
    WITH t AS (
      SELECT doc_id, source, string_split_regex(lower(text), '\\s+') AS toks
      FROM documents
    ),
    v AS (
      SELECT DISTINCT src, h FROM (
        SELECT source AS src,
               unnest({_DUCK_SHINGLES.format(toks='toks')}) AS h
        FROM t WHERE len(toks) >= 3
      )
    ),
    tot AS (SELECT src, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY src),
    sh AS (
      SELECT a.src AS src_a, b.src AS src_b,
             CAST(count(*) AS BIGINT) AS shared
      FROM v a JOIN v b USING (h)
      WHERE a.src < b.src
      GROUP BY 1, 2
    )
    SELECT src_a, src_b, shared, ta.n AS n_a, tb.n AS n_b,
           round(CAST(shared AS DOUBLE) / ta.n, 6) AS containment_a,
           round(CAST(shared AS DOUBLE) / tb.n, 6) AS containment_b
    FROM sh
    JOIN tot ta ON ta.src = sh.src_a
    JOIN tot tb ON tb.src = sh.src_b
    """,
)
def q_cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-pair shingle containment matrix — which feeds are
    near-copies of each other; per-shingle join fan is bounded by the
    source catalog, shuffles carry 8-byte hashes
    (``operators/text.py::cross_source_overlap``)."""
    from institutional_fx_etl_spark.operators.text import (
        cross_source_overlap,
    )

    return cross_source_overlap(load_table(spark, sf_dir, "documents"))


def _lsh_tuning_oracle(num_perm: int = 16, max_bucket: int = 64) -> str:
    """DuckDB mirror of operators.dedup.lsh_tuning_report: the shared
    signature CTEs + one bucket-size aggregate per (bands, rpb)
    config; thresholds via the same nested-sqrt chain."""
    parts = []
    bands = num_perm
    while bands >= 2:
        rpb = num_perm // bands
        thr = f"CAST(1.0 / {bands} AS DOUBLE)"
        r = rpb
        while r > 1:
            thr = f"sqrt({thr})"
            r //= 2
        parts.append(
            f"""
    SELECT CAST({bands} AS INTEGER) AS bands,
           CAST({rpb} AS INTEGER) AS rows_per_band,
           round({thr}, 6) AS s_threshold,
           CAST(SUM(CASE WHEN m BETWEEN 2 AND {max_bucket}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_buckets,
           CAST(SUM(CASE WHEN m BETWEEN 2 AND {max_bucket}
                THEN m*(m-1)//2 ELSE 0 END) AS BIGINT) AS n_candidates,
           CAST(SUM(CASE WHEN m > {max_bucket} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hot_buckets
    FROM (
      SELECT bsig, count(*) AS m FROM (
        SELECT md5(concat(CAST(b.band_idx AS VARCHAR), '|',
               array_to_string(
                 sig[b.band_idx*{rpb}+1 : b.band_idx*{rpb}+{rpb}], ',')))
          AS bsig
        FROM sigs, (SELECT unnest(range(0, {bands})) AS band_idx) b
      ) GROUP BY bsig
    )"""
        )
        bands //= 2
    return f"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
      FROM documents
    ),
    t2 AS (
      SELECT doc_id, {_DUCK_SHINGLES.format(toks='toks')} AS sh
      FROM t WHERE len(toks) >= 3
    ),
    sigs AS (
      SELECT doc_id,
             list_transform(range(0, {num_perm}), i -> list_min(
               list_transform(sh, h -> ((2*i+1)*h + (7*i+3)) % 2147483647)))
               AS sig
      FROM t2
    )
    {" UNION ALL ".join(parts)}
    """


@register("lsh_tuning_report", _lsh_tuning_oracle())
def q_lsh_tuning_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding tuner: S-curve threshold (nested sqrt — pow is not
    correctly rounded) + actual candidate volume per (bands, rpb)
    split of the 16-perm family, straight from bucket-size aggregates
    — no pair fan-out (``operators/dedup.py::lsh_tuning_report``)."""
    from institutional_fx_etl_spark.operators.dedup import (
        lsh_tuning_report,
    )

    return lsh_tuning_report(load_table(spark, sf_dir, "documents"))


def _survivorship_oracle() -> str:
    """The dedup_clusters recursive-closure oracle + field-majority
    survivorship (row_number over per-cluster value counts, value-asc
    tiebreak)."""
    base = REGISTRY["dedup_clusters"][1]
    cut = base.rindex(
        "SELECT a AS doc_id, min(b) AS comp FROM reach GROUP BY a"
    )
    return (
        base[:cut]
        + """, comp AS (
      SELECT a AS doc_id, min(b) AS comp FROM reach GROUP BY a
    ),
    j AS (SELECT c.comp, d.doc_id, d.lang, d.source
          FROM comp c JOIN documents d USING (doc_id)),
    base_agg AS (SELECT comp, CAST(count(*) AS BIGINT) AS n_members,
                 MIN(doc_id) AS keep_id FROM j GROUP BY comp),
    wl AS (SELECT comp, lang FROM (
      SELECT comp, lang, row_number() OVER (PARTITION BY comp
        ORDER BY count(*) DESC, lang ASC NULLS LAST) AS rn
      FROM j GROUP BY comp, lang) WHERE rn = 1),
    ws AS (SELECT comp, source FROM (
      SELECT comp, source, row_number() OVER (PARTITION BY comp
        ORDER BY count(*) DESC, source ASC NULLS LAST) AS rn
      FROM j GROUP BY comp, source) WHERE rn = 1)
    SELECT b.comp, b.n_members, b.keep_id, wl.lang, ws.source
    FROM base_agg b JOIN wl USING (comp) JOIN ws USING (comp)
    """
    )


@register("dedup_survivorship", _survivorship_oracle())
def q_dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-record survivorship: near-dup clusters (LSH pairs →
    connected components) merged to one record per entity — per-field
    majority with deterministic tiebreak, min-id canonical, member
    count (``operators/dedup.py::survivorship_merge``)."""
    from institutional_fx_etl_spark.operators.dedup import (
        dedup_clusters,
        minhash_lsh_pairs,
        survivorship_merge,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, jaccard_threshold=0.2)
    clusters = dedup_clusters(docs.select("doc_id"), pairs)
    return survivorship_merge(docs, clusters, ["lang", "source"])


def _ivfpq_oracle(k: int = 10, nprobe: int = 2) -> str:
    """DuckDB mirror of operators.similarity.ivfpq_topk: the ivf_topk
    assignment CTEs (id-seeded centroids, rn=1 argmax), the query's
    probe-cell ranking against the SAME frozen rational query literal,
    the PQ code argmins, and the driver-computed ADC LUT literals
    summed left-assoc, ordered by unrounded adc + id."""
    from institutional_fx_etl_spark.operators.similarity import (
        _ADC_QUERY,
        _PQ_CODEBOOK,
    )

    m_sub, k_cent = len(_PQ_CODEBOOK), len(_PQ_CODEBOOK[0])
    dims = len(_PQ_CODEBOOK[0][0])
    qlit = "[" + ", ".join(repr(x) for x in _ADC_QUERY) + "]"
    code_exprs = []
    for m in range(m_sub):
        dists = []
        for c in range(k_cent):
            cbl = (
                "["
                + ", ".join(repr(v) for v in _PQ_CODEBOOK[m][c])
                + "]"
            )
            dists.append(
                f"list_sum(list_transform(range(1, {dims + 1}), i ->"
                f" (vv[{m * dims} + i] - ({cbl})[i])"
                f" * (vv[{m * dims} + i] - ({cbl})[i])))"
            )
        darr = "[" + ", ".join(dists) + "]"
        code_exprs.append(
            f"CAST(list_position({darr}, list_min({darr})) - 1"
            f" AS INTEGER) AS code_{m}"
        )
    luts = [
        [
            sum(
                (_ADC_QUERY[m * dims + d] - _PQ_CODEBOOK[m][c][d]) ** 2
                for d in range(dims)
            )
            for c in range(k_cent)
        ]
        for m in range(m_sub)
    ]
    terms = [
        "([" + ", ".join(repr(v) for v in luts[m]) + f"])[code_{m} + 1]"
        for m in range(m_sub)
    ]
    adc = " + ".join(terms)
    return f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
    cents AS (SELECT vec_id AS cid, vv AS cv FROM v WHERE vec_id < 8),
    scored AS (
      SELECT v.vec_id AS vid, v.vv, c.cid,
             round(list_dot_product(v.vv, c.cv)
                   / (sqrt(list_dot_product(v.vv, v.vv))
                      * sqrt(list_dot_product(c.cv, c.cv))), 6) AS ccos
      FROM v CROSS JOIN cents c
    ),
    assigned AS (
      SELECT vid, vv, cid FROM (
        SELECT *, row_number() OVER
          (PARTITION BY vid ORDER BY ccos DESC, cid) AS rn
        FROM scored) WHERE rn = 1
    ),
    probe AS (
      SELECT cid FROM (
        SELECT cid,
               round(list_dot_product(cv, {qlit})
                     / (sqrt(list_dot_product(cv, cv))
                        * sqrt(list_dot_product({qlit}, {qlit}))), 6)
                 AS ccos
        FROM cents
      ) ORDER BY ccos DESC, cid LIMIT {nprobe}
    ),
    sub AS (
      SELECT a.vid, a.vv, a.cid FROM assigned a JOIN probe USING (cid)
    ),
    enc AS (SELECT vid, cid, {", ".join(code_exprs)} FROM sub)
    SELECT vid AS id, cid, CAST(round(adc, 6) AS DOUBLE) AS adc_dist
    FROM (SELECT vid, cid, {adc} AS adc FROM enc)
    ORDER BY adc, vid LIMIT {k}
    """


@register("ivfpq_topk", _ivfpq_oracle())
def q_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full IVF-PQ index architecture (FAISS IVFPQ): the query
    probes its 2 nearest coarse cells, and only those cells' vectors
    get the PQ ADC lookup-table scan — (nprobe/cells)·n lookups, no
    full scan, no per-row vector math
    (``operators/similarity.py::ivfpq_topk``)."""
    from institutional_fx_etl_spark.operators.similarity import ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivfpq_topk(emb, k=10, num_centroids=8, nprobe=2)


def _register_emb_pca_incremental() -> None:
    """Incremental PCA maintenance certified against the FULL run's
    oracle: the Gram partial state merges by integer union-sum, so
    incremental ≡ full exactly (the knn_incremental proof pattern)."""
    oracle = REGISTRY["emb_pca_power"][1]

    @register("emb_pca_incremental", oracle)
    def q_emb_pca_incremental(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Merge-a-batch PCA: old vectors (id % 17 ≠ 0) contribute
        their persisted Gram partial state, ONLY the new batch is
        scanned, and the eigenvector must hash-match the full run
        (shared oracle;
        ``operators/embstats.py::embedding_pca_power_incremental``)."""
        from institutional_fx_etl_spark.operators.embstats import (
            embedding_pca_power_incremental,
        )

        emb = load_table(spark, sf_dir, "embeddings").withColumn(
            "is_new", F.expr("vec_id % 17 = 0")
        )
        return embedding_pca_power_incremental(
            emb, "is_new", "embedding", dim=64, scale=1000, iters=3
        )


_register_emb_pca_incremental()


def _register_streaming_mixture() -> None:
    """Streaming twin of mixture_sampling — rates fit OFFLINE on the
    static corpus (the production shape: mixing rates are a training
    config, not a per-batch estimate), the md5 Bernoulli filter and
    per-source counting run on the STREAM, and the final audit must
    equal the batch operator row-for-row (shared oracle)."""
    oracle = REGISTRY["mixture_sampling"][1]

    @register("streaming_mixture", oracle)
    def q_streaming_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
        """STREAMING corpus mixing: stream-static broadcast join onto
        the offline rate table, scan-side deterministic draw filter,
        bounded per-source count aggregate (complete mode — state is
        #sources rows); batch-equality certified against the
        mixture_sampling oracle."""
        import tempfile

        from institutional_fx_etl_spark.operators.selection import (
            mixture_rates,
            _uniform_expr,
        )

        _pin_session_confs(spark)
        name = "streaming_mixture_result"
        static = spark.read.parquet(f"{sf_dir}/documents.parquet")
        rates = mixture_rates(static, "source", budget_frac=0.5).select(
            "grp", "n_docs", "rate"
        )
        stream = (
            spark.readStream.schema(static.schema)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(sf_dir)
        )
        u = _uniform_expr("__id", "mix")
        sampled = (
            stream.selectExpr("source AS grp", "doc_id AS __id")
            .join(F.broadcast(rates.select("grp", "rate")), "grp")
            .filter(f"{u} < rate")
            .groupBy("grp")
            .agg(F.count(F.lit(1)).alias("n_sampled"))
        )
        q = _start_stream(
            spark,
            sampled.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option(
                "checkpointLocation",
                _stream_tmpdir(prefix="stream_mix_ck_"),
            )
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        counts = spark.table(name)
        return (
            rates.join(F.broadcast(counts), "grp", "left")
            .selectExpr(
                "grp AS grp_name",
                "n_docs",
                "CAST(floor(rate * 1000000.0 + 0.5) AS BIGINT)"
                " AS rate_ppm",
                "CAST(COALESCE(n_sampled, 0) AS BIGINT) AS n_sampled",
            )
        )


_register_streaming_mixture()


def _register_streaming_dedup() -> None:
    """Streaming exact-dedup: the (content-hash → keep_id, n_dups)
    table maintained as a complete-mode streaming aggregation — the
    ingestion-side "have we seen this document before" filter. Shares
    the batch dedup_exact oracle: min/count are ingestion-order-free,
    so the streamed table equals the batch groupBy bit-for-bit. State
    is one 3-column row per DISTINCT document (hash, min, count) —
    inherent to exact dedup; production bounds it with
    dropDuplicatesWithinWatermark or the RocksDB store, both noted in
    streaming/stateful.py."""
    oracle = REGISTRY["dedup_exact"][1]

    @register("streaming_dedup_table", oracle)
    def q_streaming_dedup_table(spark: SparkSession, sf_dir: str) -> DataFrame:
        """STREAMING exact-dedup table maintenance through the state
        store, static readout, certified against the batch
        dedup_exact oracle (``operators/dedup.py::exact_dedup_groups``
        is the batch twin)."""
        import tempfile

        name = "streaming_dedup_groups"
        static = spark.read.parquet(f"{sf_dir}/documents.parquet")
        stream = (
            spark.readStream.schema(static.schema)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(sf_dir)
        )
        groups = (
            stream.selectExpr("md5(text) AS text_hash", "doc_id")
            .groupBy("text_hash")
            .agg(
                F.expr("MIN(doc_id) AS keep_id"),
                F.expr("COUNT(1) AS n_dups"),
            )
        )
        q = _start_stream(
            spark,
            groups.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option(
                "checkpointLocation",
                _stream_tmpdir(prefix="stream_dedup_ck_"),
            )
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return spark.table(name).select("text_hash", "keep_id", "n_dups")


# deferred: need their batch twins' REGISTRY entries (registered above)
_register_streaming_cusum()
_register_streaming_hll()
_register_streaming_dedup()


def _probe_gd_ctes(
    buckets: int = 8,
    steps: int = 3,
    lr_shift: int = 4,
    salt: str = "probe",
    target: str = "COALESCE(d.lang = 'en', false)",
) -> str:
    """DuckDB twin of ``selection.py::linear_probe_gd``: the dsir md5
    bucket hash, presence features + bias, and the SAME fixed-unroll
    integer GD steps as explicit CTEs — the emb_pca_power unroll
    discipline. Both engines cast the identical int64 gradient and
    n·2^lr_shift to DOUBLE before the one division, so the floor(+0.5)
    rounding is bit-identical."""
    denom = f"(CAST(nn.n AS DOUBLE) * {float(1 << lr_shift)!r})"
    ctes = f"""
    WITH tok AS (
      SELECT id,
             CAST(concat('0x', substr(md5(concat('{salt}', w)), 1, 8))
                  AS BIGINT) % {buckets} AS b
      FROM (
        SELECT doc_id AS id,
               unnest(string_split_regex(lower(text), '\\s+')) AS w
        FROM documents)
      WHERE w <> ''),
    xb AS (SELECT DISTINCT id, b, CAST(1 AS BIGINT) AS x FROM tok),
    docs AS (SELECT DISTINCT id FROM xb),
    feats AS (
      SELECT id, b, x FROM xb
      UNION ALL
      SELECT id, CAST({buckets} AS BIGINT) AS b, CAST(1 AS BIGINT) AS x
      FROM docs),
    y AS (
      SELECT docs.id,
             CAST(CAST(({target}) AS INT) * 1000000 AS BIGINT) AS y_micro
      FROM documents d JOIN docs ON docs.id = d.doc_id),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM docs),
    w0 AS (SELECT DISTINCT b, CAST(0 AS BIGINT) AS w FROM feats)"""
    for s in range(1, steps + 1):
        ctes += f""",
    p{s} AS (SELECT f.id, SUM(f.x * w{s - 1}.w) AS p
           FROM feats f JOIN w{s - 1} USING (b) GROUP BY f.id),
    r{s} AS (SELECT y.id, y.y_micro - p{s}.p AS resid
           FROM y JOIN p{s} USING (id)),
    g{s} AS (SELECT f.b, SUM(f.x * r{s}.resid) AS g
           FROM feats f JOIN r{s} USING (id) GROUP BY f.b),
    w{s} AS (SELECT w{s - 1}.b,
                CAST(w{s - 1}.w
                     + floor(CAST(COALESCE(g{s}.g, 0) AS DOUBLE)
                             / {denom} + 0.5) AS BIGINT) AS w
           FROM w{s - 1} LEFT JOIN g{s} USING (b) CROSS JOIN nn)"""
    return ctes


def _probe_gd_oracle(
    buckets: int = 8,
    steps: int = 3,
    lr_shift: int = 4,
    salt: str = "probe",
    target: str = "COALESCE(d.lang = 'en', false)",
) -> str:
    return _probe_gd_ctes(buckets, steps, lr_shift, salt, target) + f"""
    SELECT b, w AS w_micro FROM w{steps}
    """


def _probe_score_oracle(
    buckets: int = 8,
    steps: int = 3,
    lr_shift: int = 4,
    salt: str = "probe",
    target: str = "COALESCE(d.lang = 'en', false)",
    top_ppm: int = 250_000,
) -> str:
    """linear_probe_score twin: the trained-weight CTE chain, per-doc
    presence·weight score, and the exact rank rule
    ``row_number() OVER (score DESC, id ASC) ≤ n·top_ppm // 10⁶`` —
    the oracle may use the global sort the Spark plan avoids."""
    return _probe_gd_ctes(buckets, steps, lr_shift, salt, target) + f""",
    score AS (
      SELECT f.id, SUM(f.x * w{steps}.w) AS score_micro
      FROM feats f JOIN w{steps} USING (b) GROUP BY f.id),
    kk AS (SELECT CAST(count(*) * {top_ppm} // 1000000 AS BIGINT) AS k
           FROM score)
    SELECT id AS doc_id,
           CAST(score_micro AS BIGINT) AS score_micro,
           CAST(CASE WHEN row_number()
                       OVER (ORDER BY score_micro DESC, id ASC) <= kk.k
                THEN 1 ELSE 0 END AS INT) AS kept
    FROM score CROSS JOIN kk
    """


@register("linear_probe_gd", _probe_gd_oracle())
def q_linear_probe_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed linear quality-probe training: 3 fixed-unroll
    batch-GD steps on hashed-unigram presence features against the
    lang='en' label — per step one (buckets+1)-row weight broadcast
    plus two narrow aggregates, the corpus feature matrix built once
    (``operators/selection.py::linear_probe_gd``)."""
    from institutional_fx_etl_spark.operators.selection import (
        linear_probe_gd,
    )

    docs = load_table(spark, sf_dir, "documents")
    return linear_probe_gd(
        docs, target_expr="COALESCE(lang = 'en', false)",
        text_col="text", id_col="doc_id", buckets=8, steps=3,
        lr_shift=4,
    )


@register(
    "dup_span_coverage",
    """
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
      FROM documents
    ),
    tt AS (
      SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) >= 3
    ),
    ex AS (
      SELECT doc_id, i - 1 AS pos,
             CAST(concat('0x', substr(md5(concat_ws(' ', toks[i],
                  toks[i+1], toks[i+2])), 1, 8)) AS BIGINT) AS h
      FROM tt, unnest(range(1, n - 1)) AS r(i)
    ),
    dup AS (SELECT h FROM ex GROUP BY h HAVING count(*) >= 2),
    cov AS (
      SELECT doc_id, CAST(count(DISTINCT p) AS BIGINT) AS n_dup_pos
      FROM (
        SELECT e.doc_id, unnest(range(e.pos, e.pos + 3)) AS p
        FROM ex e JOIN dup USING (h))
      GROUP BY doc_id
    )
    SELECT tt.doc_id,
           CAST(tt.n AS BIGINT) AS n_tokens,
           CAST(COALESCE(cov.n_dup_pos, 0) AS BIGINT) AS n_dup_pos,
           round(CAST(COALESCE(cov.n_dup_pos, 0) AS DOUBLE) / tt.n, 6)
             AS dup_coverage
    FROM tt LEFT JOIN cov USING (doc_id)
    """,
)
def q_dup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional duplicated-span coverage (ExactSubstr-style at
    3-gram granularity): fraction of each doc's token positions
    covered by a shingle occurring ≥2× in the corpus — what you TRIM
    on, vs ngram_novelty's set-semantics weighting signal; shuffles
    carry (id, int pos, 8-byte hash) only
    (``operators/text.py::dup_span_coverage``)."""
    from institutional_fx_etl_spark.operators.text import (
        dup_span_coverage,
    )

    return dup_span_coverage(load_table(spark, sf_dir, "documents"))


@register(
    "kmeans_inertia",
    """
    WITH v AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv
      FROM embeddings),
    c AS (SELECT CAST(vec_id AS BIGINT) AS cid, vv AS cv
          FROM v WHERE vec_id < 8),
    d AS (
      SELECT v.vec_id AS vid, c.cid,
             list_dot_product(v.vv, v.vv) + list_dot_product(c.cv, c.cv)
               - 2.0*list_dot_product(v.vv, c.cv) AS d2
      FROM v CROSS JOIN c),
    a AS (
      SELECT vid, cid,
             CAST(floor(d2 * 1000000.0 + 0.5) AS BIGINT) AS d2_micro,
             row_number() OVER (PARTITION BY vid ORDER BY d2, cid) AS rn
      FROM d)
    SELECT cid, CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(SUM(d2_micro) AS BIGINT) AS inertia_micro,
           round(CAST(SUM(d2_micro) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                 / 1000000.0, 6) AS mean_d2
    FROM a WHERE rn = 1 GROUP BY cid
    """,
)
def q_kmeans_inertia(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell clustering inertia over the deterministic vid<8
    centroid seeding: scan-side arg-min against the centroid literal
    (no corpus×k join), per-vector d² micro-quantized before the Σ so
    the per-cell sum is exact integer arithmetic
    (``operators/similarity.py::kmeans_inertia``)."""
    from institutional_fx_etl_spark.operators.similarity import (
        kmeans_inertia,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_inertia(emb, "embedding", "vec_id", num_centroids=8)


@register(
    "quota_sample_exact",
    """
    WITH g AS (
      SELECT source AS grp, CAST(count(*) AS BIGINT) AS n
      FROM documents GROUP BY source),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM g),
    alloc AS (
      SELECT grp, n, nn,
             CAST(nn * 250000 // 1000000 AS BIGINT) AS K
      FROM g CROSS JOIN t),
    alloc2 AS (
      SELECT grp, n, K,
             (K * n) // nn AS base, (K * n) % nn AS rem
      FROM alloc),
    lo AS (SELECT CAST(K - SUM(base) AS BIGINT) AS L
           FROM alloc2 GROUP BY K),
    quota AS (
      SELECT grp,
             CAST(base + CASE WHEN row_number()
                    OVER (ORDER BY rem DESC, grp ASC) <= lo.L
                  THEN 1 ELSE 0 END AS BIGINT) AS k_g
      FROM alloc2 CROSS JOIN lo),
    d AS (
      SELECT doc_id, source AS grp,
             CAST(concat('0x', substr(md5(concat('quota',
                  CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) AS draw
      FROM documents),
    r AS (
      SELECT doc_id, grp,
             CAST(row_number() OVER (PARTITION BY grp
                  ORDER BY draw, doc_id) AS BIGINT) AS rk
      FROM d)
    SELECT r.doc_id, r.grp, r.rk
    FROM r JOIN quota USING (grp) WHERE r.rk <= quota.k_g
    """,
)
def q_quota_sample_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-count stratified take: precisely N·25% documents,
    largest-remainder apportionment across sources, md5-ranked within
    group — the deterministic twin of Bernoulli stratified sampling
    whose Σ is binomial (``operators/selection.py::quota_sample_exact``)."""
    from institutional_fx_etl_spark.operators.selection import (
        quota_sample_exact,
    )

    docs = load_table(spark, sf_dir, "documents")
    return quota_sample_exact(
        docs, group_col="source", id_col="doc_id", budget_ppm=250_000,
    )


def _mw_oracle(steps: int = 3, eta_shift: int = 2) -> str:
    """DuckDB twin of ``selection.py::domain_reweight_mw`` — the MW
    loop unrolled as CTEs; every op is int64 multiply-then-//, so the
    walk is exact in both engines."""
    denom = (1 << eta_shift) * 1_000_000
    sql = """
    WITH g AS (
      SELECT source AS grp, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(SUM(CAST(floor(CAST((COALESCE(lang <> 'en', true))
                  AS DOUBLE) * 1000000 + 0.5) AS BIGINT))
                  AS BIGINT) AS n_loss_micro
      FROM documents GROUP BY source),
    w0 AS (
      SELECT grp, n_docs, n_loss_micro // n_docs AS loss_micro,
             CAST(1000000 AS BIGINT) AS w
      FROM g)"""
    for s in range(1, steps + 1):
        sql += f""",
    g{s} AS (SELECT grp, n_docs, loss_micro,
               w + (w * loss_micro) // {denom} AS w FROM w{s - 1}),
    t{s} AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM g{s}),
    w{s} AS (SELECT grp, n_docs, loss_micro, (w * 1000000) // tw AS w
           FROM g{s} CROSS JOIN t{s})"""
    return sql + f"""
    SELECT grp, n_docs, loss_micro, w AS w_micro FROM w{steps}
    """


@register(
    "embedding_decontaminate",
    """
    WITH v AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE))
                        AS vv
               FROM embeddings),
    tr AS (SELECT * FROM v WHERE vec_id % 10 <> 0),
    te AS (SELECT * FROM v WHERE vec_id % 10 = 0),
    cents AS (SELECT vec_id AS cid, vv AS cv FROM tr
              WHERE vec_id < greatest(8, CAST(ceil(
                (SELECT count(*) FROM tr) / 512.0) AS BIGINT))),
    sa AS (
      SELECT tr.vec_id AS id, c.cid, tr.vv,
             round(list_dot_product(tr.vv, c.cv)
                   / (sqrt(list_dot_product(tr.vv, tr.vv))
                      * sqrt(list_dot_product(c.cv, c.cv))), 6) AS ccos
      FROM tr CROSS JOIN cents c),
    aa AS (SELECT id, cid, vv FROM (
             SELECT *, row_number() OVER
               (PARTITION BY id ORDER BY ccos DESC, cid) AS rn FROM sa)
           WHERE rn = 1),
    sb AS (
      SELECT te.vec_id AS id, c.cid, te.vv,
             round(list_dot_product(te.vv, c.cv)
                   / (sqrt(list_dot_product(te.vv, te.vv))
                      * sqrt(list_dot_product(c.cv, c.cv))), 6) AS ccos
      FROM te CROSS JOIN cents c),
    ab AS (SELECT id, cid, vv FROM (
             SELECT *, row_number() OVER
               (PARTITION BY id ORDER BY ccos DESC, cid) AS rn FROM sb)
           WHERE rn = 1),
    na AS (SELECT id AS train_id, cid,
                  list_transform(vv,
                    x -> x / sqrt(list_dot_product(vv, vv))) AS va
           FROM aa),
    nb AS (SELECT id AS test_id, cid,
                  list_transform(vv,
                    x -> x / sqrt(list_dot_product(vv, vv))) AS vb
           FROM ab),
    p AS (
      SELECT nb.test_id, na.train_id,
             round(list_dot_product(na.va, nb.vb), 6) AS cosine
      FROM na JOIN nb USING (cid)
      WHERE round(list_dot_product(na.va, nb.vb), 6) >= 0.35),
    best AS (SELECT test_id, train_id AS match_id FROM (
               SELECT *, row_number() OVER (PARTITION BY test_id
                 ORDER BY cosine DESC, train_id ASC) AS rn FROM p)
             WHERE rn = 1)
    SELECT p.test_id, CAST(count(*) AS BIGINT) AS n_matches,
           MAX(p.cosine) AS max_cosine, MAX(best.match_id) AS match_id
    FROM p JOIN best USING (test_id)
    GROUP BY p.test_id
    """,
)
def q_embedding_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-level eval decontamination: every 10th vector plays
    the held-out eval set; cell-blocked cross-table cosine against
    the rest flags semantic leakage the n-gram decontamination pass
    can't see (``operators/similarity.py::embedding_decontaminate``)."""
    from institutional_fx_etl_spark.operators.similarity import (
        embedding_decontaminate,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    train = emb.filter("vec_id % 10 <> 0")
    test = emb.filter("vec_id % 10 = 0")
    # cells scale with the train side (the lsh_ann_pairs_scaled
    # lesson: a pinned blocking parameter is quadratic creep) —
    # mirrored in the oracle's greatest(8, ceil(n/512)) cents rule
    return embedding_decontaminate(
        train, test, min_cosine=0.35,
        num_centroids=_auto_cells(train.count()),
    )


@register("domain_reweight_mw", _mw_oracle())
def q_domain_reweight_mw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style multiplicative-weights domain reweighting against
    a non-English hardness signal: one corpus aggregate, then a
    3-step integer MW loop on the source-cardinality relation — the
    corpus never reshuffles
    (``operators/selection.py::domain_reweight_mw``)."""
    from institutional_fx_etl_spark.operators.selection import (
        domain_reweight_mw,
    )

    docs = load_table(spark, sf_dir, "documents")
    return domain_reweight_mw(
        docs, loss_expr="COALESCE(lang <> 'en', true)",
        group_col="source", steps=3, eta_shift=2,
    )


@register("linear_probe_score", _probe_score_oracle())
def q_linear_probe_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full classifier-selection loop: train the linear probe,
    score every document, keep the exact top 25% by
    (score DESC, id ASC) rank — rank computed from a score histogram
    plus one boundary-tie window, never a global corpus sort
    (``operators/selection.py::linear_probe_score``)."""
    from institutional_fx_etl_spark.operators.selection import (
        linear_probe_score,
    )

    docs = load_table(spark, sf_dir, "documents")
    return linear_probe_score(
        docs, target_expr="COALESCE(lang = 'en', false)",
        text_col="text", id_col="doc_id", buckets=8, steps=3,
        lr_shift=4, top_ppm=250_000,
    )


@register(
    "ivf_incremental",
    """
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
    cents AS (SELECT vec_id AS cid, vv AS cv FROM v
              WHERE vec_id % 13 <> 0 AND vec_id < 9),
    scored AS (
      SELECT v.vec_id AS vid, v.vv, c.cid,
             round(list_dot_product(v.vv, c.cv)
                   / (sqrt(list_dot_product(v.vv, v.vv))
                      * sqrt(list_dot_product(c.cv, c.cv))), 6) AS ccos
      FROM v CROSS JOIN cents c
    ),
    assigned AS (
      SELECT vid,
             list_transform(vv, x -> x / sqrt(list_dot_product(vv, vv)))
               AS vn,
             cid FROM (
        SELECT *, row_number() OVER
          (PARTITION BY vid ORDER BY ccos DESC, cid) AS rn
        FROM scored) WHERE rn = 1
    ),
    q AS (
      SELECT vid AS q_id,
             list_transform(vv, x -> x / sqrt(list_dot_product(vv, vv)))
               AS qn,
             cid FROM (
        SELECT *, row_number() OVER
          (PARTITION BY vid ORDER BY ccos DESC, cid) AS rn
        FROM scored WHERE vid IN (1, 2, 13)) WHERE rn <= 2
    ),
    s AS (
      SELECT q.q_id, a.vid AS vec_id,
             round(list_dot_product(a.vn, q.qn), 6) AS cosine
      FROM assigned a JOIN q ON a.cid = q.cid
    )
    SELECT q_id, vec_id,
           CAST(row_number() OVER
             (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS INTEGER)
             AS rank,
           cosine
    FROM s QUALIFY rank <= 5
    """,
)
def q_ivf_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-only IVF ingest: the corpus splits into a standing index
    (vec_id % 13 <> 0) and an arriving batch (vec_id % 13 = 0); the
    quantizer stays frozen on the OLD corpus's id-seeded centroids, so
    only the batch is assigned and the merged index answers queries —
    including one FROM the new batch (vec_id 13)
    (``operators/similarity.py::ivf_topk_incremental``). The ORACLE is
    the from-scratch IVF over the union under the same centroids, so
    a hash match IS the incremental ≡ rebuild proof, cross-engine —
    the ``knn_incremental`` discipline applied to the IVF index."""
    from institutional_fx_etl_spark.operators.similarity import (
        ivf_topk_incremental,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    old = emb.filter("vec_id % 13 <> 0")
    new = emb.filter("vec_id % 13 = 0")
    centroids = old.filter("vec_id < 9").selectExpr(
        "vec_id AS cid",
        "transform(embedding, x -> CAST(x AS DOUBLE)) AS cv",
    )
    return ivf_topk_incremental(
        old, new, query_ids=[1, 2, 13], k=5, nprobe=2, centroids=centroids
    )


@register(
    "boilerplate_purge",
    # seg <> '' mirrors the operator's tokenless-doc rule (round-10
    # ADVICE #3): empty documents contribute no segments and are
    # restored with zero counts by the final LEFT JOIN
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
      FROM documents
    ),
    seg0 AS (
      SELECT doc_id, CAST(s AS INT) AS start,
             array_to_string(list_slice(toks, s + 1, s + 8), ' ') AS seg
      FROM t, unnest(range(0, greatest(len(toks), 1), 8)) AS u(s)
    ),
    seg AS (SELECT * FROM seg0 WHERE trim(seg) <> ''),
    d AS (SELECT seg, count(DISTINCT doc_id) AS df FROM seg GROUP BY seg),
    agg AS (
      SELECT doc_id,
             COALESCE(string_agg(CASE WHEN df < 2 THEN s.seg END, ' '
                                 ORDER BY start), '') AS clean_text,
             CAST(count(*) AS INT) AS n_segments,
             CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS INT)
               AS n_purged
      FROM seg s JOIN d USING (seg) GROUP BY doc_id
    )
    SELECT t.doc_id,
           COALESCE(a.clean_text, '') AS clean_text,
           CAST(COALESCE(a.n_segments, 0) AS INT) AS n_segments,
           CAST(COALESCE(a.n_purged, 0) AS INT) AS n_purged
    FROM t LEFT JOIN agg a USING (doc_id)
    """,
)
def q_boilerplate_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate removal: every occurrence of any 8-token
    segment shared by ≥2 distinct documents is purged (vs
    ``segment_dedup`` which keeps the first copy). One distinct-pair
    doc-frequency aggregate + one digest join + one per-doc regroup
    (``operators/text.py::boilerplate_purge``)."""
    from institutional_fx_etl_spark.operators.text import boilerplate_purge

    return boilerplate_purge(
        load_table(spark, sf_dir, "documents"), segment_tokens=8, min_df=2
    )


@register(
    "perplexity_buckets",
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
      FROM documents
    ),
    doc_bi AS (
      SELECT doc_id,
             concat_ws(' ', toks[i], toks[i+1]) AS bg,
             toks[i] AS w1
      FROM t, unnest(range(1, len(toks))) AS u(i)
      WHERE len(toks) >= 2
    ),
    cb AS (SELECT bg, count(*) AS cb FROM doc_bi GROUP BY bg),
    cu AS (SELECT w1, count(*) AS cu FROM doc_bi GROUP BY w1),
    lp AS (
      SELECT d.doc_id,
             log2(CAST(cb.cb AS DOUBLE) / CAST(cu.cu AS DOUBLE)) AS lp
      FROM doc_bi d JOIN cb USING (bg) JOIN cu USING (w1)
    ),
    agg AS (
      SELECT doc_id, round(SUM(lp) / count(*), 6) AS avg_log2_prob
      FROM lp GROUP BY doc_id
    ),
    j AS (
      SELECT a.doc_id, COALESCE(d.lang, 'und') AS lang, a.avg_log2_prob
      FROM agg a JOIN documents d USING (doc_id)
    ),
    g AS (
      SELECT lang, avg_log2_prob AS s, count(*) AS c
      FROM j GROUP BY 1, 2
    ),
    cum AS (
      SELECT lang, s,
             COALESCE(SUM(c) OVER (PARTITION BY lang ORDER BY s DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS better,
             SUM(c) OVER (PARTITION BY lang) AS n_lang
      FROM g
    ),
    r AS (
      SELECT j.doc_id, j.lang, j.avg_log2_prob,
             better + row_number() OVER
               (PARTITION BY j.lang, j.avg_log2_prob ORDER BY j.doc_id)
               AS rnk,
             n_lang
      FROM j JOIN cum ON j.lang = cum.lang AND j.avg_log2_prob = cum.s
    )
    SELECT doc_id, lang, avg_log2_prob,
           round(power(2.0, -avg_log2_prob), 6) AS perplexity,
           CAST(rnk AS INT) AS lang_rank,
           CASE WHEN (rnk - 1) * 3 < n_lang THEN 'head'
                WHEN (rnk - 1) * 3 < 2 * n_lang THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM r
    """,
)
def q_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style per-language head/middle/tail perplexity terciles
    over the corpus-fit bigram LM — ranked from a (lang, score)
    histogram plus a tie-group row_number, never a per-language global
    sort (``operators/text.py::perplexity_buckets``)."""
    from institutional_fx_etl_spark.operators.text import perplexity_buckets

    return perplexity_buckets(
        load_table(spark, sf_dir, "documents"),
        lang_expr="coalesce(lang, 'und')",
    )


@register(
    "kfold_assign",
    """
    WITH b AS (
      SELECT doc_id, COALESCE(source, '') AS stratum,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    )
    SELECT doc_id, stratum,
           CAST((row_number() OVER
             (PARTITION BY stratum ORDER BY h, doc_id) - 1) % 5 AS INT)
             AS fold
    FROM b
    """,
)
def q_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified 5-fold assignment: md5-ordered
    round-robin deal within each source stratum — per-stratum fold
    sizes exact to ±1. The md5-prefix sub-bucket trick (256-way) keeps
    the rank window hot-partition-free; the oracle states the same
    order as ONE window since the bucket is a prefix of the sort key
    (``operators/selection.py::kfold_assign``)."""
    from institutional_fx_etl_spark.operators.selection import kfold_assign

    return kfold_assign(
        load_table(spark, sf_dir, "documents"),
        k=5,
        stratum_expr="coalesce(source, '')",
    )


@register(
    "record_linkage_fs",
    """
    WITH e AS (
      SELECT c_custkey AS id, c_nationkey AS blk,
             c_mktsegment AS f0,
             CAST(floor(c_acctbal / 1000.0) AS INT) AS f1,
             right(c_name, 2) AS f2
      FROM customer
    ),
    n AS (SELECT count(*) AS n FROM e),
    s0 AS (SELECT SUM(c * c) AS sq FROM
           (SELECT count(*) AS c FROM e GROUP BY f0)),
    s1 AS (SELECT SUM(c * c) AS sq FROM
           (SELECT count(*) AS c FROM e GROUP BY f1)),
    s2 AS (SELECT SUM(c * c) AS sq FROM
           (SELECT count(*) AS c FROM e GROUP BY f2)),
    w AS (
      SELECT
        CAST(round(log2(CAST(0.9375 AS DOUBLE) * n.n * n.n / s0.sq) * 1e6, 0)
          AS BIGINT) AS wa0,
        CAST(round(log2(CAST(0.0625 AS DOUBLE) * n.n * n.n / (n.n * n.n - s0.sq)) * 1e6,
          0) AS BIGINT) AS wd0,
        CAST(round(log2(CAST(0.875 AS DOUBLE) * n.n * n.n / s1.sq) * 1e6, 0)
          AS BIGINT) AS wa1,
        CAST(round(log2(CAST(0.125 AS DOUBLE) * n.n * n.n / (n.n * n.n - s1.sq)) * 1e6,
          0) AS BIGINT) AS wd1,
        CAST(round(log2(CAST(0.75 AS DOUBLE) * n.n * n.n / s2.sq) * 1e6, 0)
          AS BIGINT) AS wa2,
        CAST(round(log2(CAST(0.25 AS DOUBLE) * n.n * n.n / (n.n * n.n - s2.sq)) * 1e6,
          0) AS BIGINT) AS wd2
      FROM n, s0, s1, s2
    ),
    pr AS (
      SELECT a.id AS id_a, b.id AS id_b,
             CAST(a.f0 IS NOT DISTINCT FROM b.f0 AS INT) AS agree_seg,
             CAST(a.f1 IS NOT DISTINCT FROM b.f1 AS INT) AS agree_bal,
             CAST(a.f2 IS NOT DISTINCT FROM b.f2 AS INT) AS agree_nsx,
             (CASE WHEN a.f0 IS NOT DISTINCT FROM b.f0
                   THEN wa0 ELSE wd0 END)
             + (CASE WHEN a.f1 IS NOT DISTINCT FROM b.f1
                     THEN wa1 ELSE wd1 END)
             + (CASE WHEN a.f2 IS NOT DISTINCT FROM b.f2
                     THEN wa2 ELSE wd2 END) AS micro
      FROM e a JOIN e b ON a.blk = b.blk AND a.id < b.id, w
    )
    SELECT id_a, id_b, agree_seg, agree_bal, agree_nsx,
           CAST(micro AS DOUBLE) / 1e6 AS score
    FROM pr
    ORDER BY micro DESC, id_a, id_b
    LIMIT 200
    """,
)
def q_record_linkage_fs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi–Sunter probabilistic record linkage over nation-blocked
    customer pairs: u-probabilities estimated from exact value
    histograms (Σc²/n²), dyadic m-priors, micro-integer log2 weights
    summed per pair, top-200 by total match weight
    (``operators/dedup.py::record_linkage_fs``)."""
    from institutional_fx_etl_spark.operators.dedup import record_linkage_fs

    return record_linkage_fs(
        load_table(spark, sf_dir, "customer"),
        id_col="c_custkey",
        block_expr="c_nationkey",
        fields=[
            ("seg", "c_mktsegment", 0.9375),
            ("bal", "CAST(floor(c_acctbal / 1000.0) AS INT)", 0.875),
            ("nsx", "right(c_name, 2)", 0.75),
        ],
        top_n=200,
    )


@register(
    "bitext_margin",
    """
    WITH v AS (SELECT vec_id AS vid, CAST(embedding AS DOUBLE[]) AS vv
               FROM embeddings),
    cents AS (SELECT vid AS cid, vv AS cv FROM v
              WHERE vid < greatest(8, CAST(ceil(
                (SELECT count(*) FROM v) / 512.0) AS BIGINT))),
    scored AS (
      SELECT v.vid, v.vv, c.cid,
             round(list_dot_product(v.vv, c.cv)
                   / (sqrt(list_dot_product(v.vv, v.vv))
                      * sqrt(list_dot_product(c.cv, c.cv))), 6) AS ccos
      FROM v CROSS JOIN cents c
    ),
    assigned AS (
      SELECT vid, vv, cid FROM (
        SELECT *, row_number() OVER
          (PARTITION BY vid ORDER BY ccos DESC, cid) AS rn
        FROM scored) WHERE rn = 1
    ),
    normed AS (
      SELECT vid, cid,
             list_transform(vv, x -> x / sqrt(list_dot_product(vv, vv)))
               AS vn
      FROM assigned
    ),
    pr AS (
      SELECT a.vid AS src, b.vid AS tgt,
             round(list_dot_product(a.vn, b.vn), 6) AS cosine,
             CAST(round(round(list_dot_product(a.vn, b.vn), 6) * 1e6, 0)
               AS BIGINT) AS cm
      FROM normed a JOIN normed b
        ON a.cid = b.cid AND a.vid % 2 = 0 AND b.vid % 2 = 1
    ),
    fwd AS (
      SELECT * FROM (
        SELECT *, row_number() OVER
          (PARTITION BY src ORDER BY cosine DESC, tgt) AS fr
        FROM pr) WHERE fr <= 4
    ),
    fstat AS (SELECT src, SUM(cm) AS fs, count(*) AS ka
              FROM fwd GROUP BY src),
    bstat AS (
      SELECT tgt, SUM(cm) AS bs, count(*) AS kb FROM (
        SELECT *, row_number() OVER
          (PARTITION BY tgt ORDER BY cosine DESC, src) AS br
        FROM pr) WHERE br <= 4 GROUP BY tgt
    ),
    cand AS (
      SELECT f.src, f.tgt, f.cosine,
             round(CAST(2 * f.cm * ka * kb AS DOUBLE)
                   / (fs * kb + bs * ka), 6) AS margin
      FROM fwd f JOIN fstat USING (src) JOIN bstat USING (tgt)
      WHERE fs * kb + bs * ka > 0
    )
    SELECT src AS src_id, tgt AS tgt_id, cosine, margin FROM (
      SELECT *, row_number() OVER
        (PARTITION BY src ORDER BY margin DESC, tgt) AS mr
      FROM cand) WHERE mr = 1
    """,
)
def q_bitext_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based bitext mining (Artetxe & Schwenk 2019): even ids
    are the source side, odd ids the target side; candidate cosines
    from shared IVF cells normalize by each endpoint's mean top-4
    cross-side similarity (hubness cancellation), best target per
    source by margin. Exact integer margin arithmetic —
    ``2·cos·ka·kb / (Σfwd·kb + Σbwd·ka)`` — one division, rounded 6
    (``operators/similarity.py::bitext_margin``)."""
    from institutional_fx_etl_spark.operators.similarity import bitext_margin

    emb = load_table(spark, sf_dir, "embeddings")
    return bitext_margin(
        emb, side_expr="vid % 2 = 0", k=4,
        num_centroids=_auto_cells(emb.count()),
    )


@register(
    "hard_negatives",
    """
    WITH v AS (SELECT vec_id AS vid, CAST(embedding AS DOUBLE[]) AS vv,
                      label FROM embeddings),
    cents AS (SELECT vid AS cid, vv AS cv FROM v
              WHERE vid < greatest(8, CAST(ceil(
                (SELECT count(*) FROM v) / 512.0) AS BIGINT))),
    scored AS (
      SELECT v.vid, v.vv, v.label, c.cid,
             round(list_dot_product(v.vv, c.cv)
                   / (sqrt(list_dot_product(v.vv, v.vv))
                      * sqrt(list_dot_product(c.cv, c.cv))), 6) AS ccos
      FROM v CROSS JOIN cents c
    ),
    assigned AS (
      SELECT vid, vv, label, cid FROM (
        SELECT *, row_number() OVER
          (PARTITION BY vid ORDER BY ccos DESC, cid) AS rn
        FROM scored) WHERE rn = 1
    ),
    normed AS (
      SELECT vid, cid, label,
             list_transform(vv, x -> x / sqrt(list_dot_product(vv, vv)))
               AS vn
      FROM assigned
    ),
    s AS (
      SELECT a.vid, b.vid AS neg_id,
             round(list_dot_product(a.vn, b.vn), 6) AS cosine
      FROM normed a JOIN normed b
        ON a.cid = b.cid AND a.label IS DISTINCT FROM b.label
    )
    SELECT vid AS vec_id, neg_id,
           CAST(row_number() OVER
             (PARTITION BY vid ORDER BY cosine DESC, neg_id) AS INT)
             AS rank,
           cosine
    FROM s QUALIFY rank <= 3
    """,
)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard-negative mining: every vector's 3 most
    cosine-similar CELLMATES OF A DIFFERENT LABEL (DPR-style ANN
    negatives). Label-mismatch applies inside the cell join, before
    the rank window (``operators/similarity.py::hard_negatives``)."""
    from institutional_fx_etl_spark.operators.similarity import (
        hard_negatives,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return hard_negatives(
        emb, label_col="label", k=3, num_centroids=_auto_cells(emb.count())
    )


@register(
    "corpus_diversity",
    rf"""
    WITH t AS (
      SELECT doc_id, source AS grp, md5(CAST(doc_id AS VARCHAR)) AS h,
             string_split_regex(lower(text), '\s+') AS toks
      FROM documents
    ),
    el AS (SELECT * FROM t WHERE len(toks) >= 3),
    sm AS (
      SELECT grp, doc_id, toks FROM (
        SELECT *, row_number() OVER
          (PARTITION BY grp ORDER BY h, doc_id) AS rn
        FROM el) WHERE rn <= 16
    ),
    sz AS (
      SELECT grp, doc_id, {_DUCK_SHINGLES.format(toks='toks')} AS s
      FROM sm
    ),
    j AS (
      SELECT a.grp,
             len(list_intersect(a.s, b.s)) AS sh,
             len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS un
      FROM sz a JOIN sz b ON a.grp = b.grp AND a.doc_id < b.doc_id
    ),
    jm AS (
      SELECT grp, CASE WHEN un = 0 THEN 0
                       ELSE CAST(sh AS BIGINT) * 1000000 // un
                  END AS jm
      FROM j
    ),
    agg AS (
      SELECT grp, CAST(count(*) AS BIGINT) AS n_pairs,
             round(CAST(CAST(SUM(jm) AS BIGINT) AS DOUBLE)
                   / count(*) / 1e6, 6) AS mean_jaccard
      FROM jm GROUP BY grp
    ),
    ns AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_sampled
           FROM sm GROUP BY grp)
    SELECT agg.grp, ns.n_sampled, agg.n_pairs, agg.mean_jaccard
    FROM agg JOIN ns USING (grp)
    """,
)
def q_corpus_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus diversity: mean pairwise 3-gram Jaccard over
    a deterministic 16-doc md5 sample per source, INCLUDING
    zero-overlap pairs (the self-BLEU-style redundancy profile) —
    bounded m² pairs per group, exact micro-int Jaccard
    (``operators/text.py::corpus_diversity``)."""
    from institutional_fx_etl_spark.operators.text import corpus_diversity

    return corpus_diversity(
        load_table(spark, sf_dir, "documents"),
        sample_per_group=16,
        shingle_n=3,
    )


@register(
    "zipf_token_fit",
    r"""
    WITH h AS (
      SELECT t AS tok, count(*) AS freq FROM (
        SELECT unnest(string_split_regex(lower(text), '\s+')) AS t
        FROM documents)
      WHERE t <> '' GROUP BY t
    ),
    top AS (SELECT tok, freq FROM h ORDER BY freq DESC, tok LIMIT 1000),
    r AS (
      SELECT CAST(round(ln(rnk) * 1e6, 0) AS HUGEINT) AS x,
             CAST(round(ln(freq) * 1e6, 0) AS HUGEINT) AS y
      FROM (SELECT freq, row_number() OVER
              (ORDER BY freq DESC, tok) AS rnk FROM top)
    ),
    s AS (
      SELECT CAST(count(*) AS HUGEINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy
      FROM r
    )
    SELECT CAST(n AS BIGINT) AS n_tokens_ranked,
           round(CAST(n*sxy - sx*sy AS DOUBLE)
                 / CAST(n*sxx - sx*sx AS DOUBLE), 6) AS slope,
           round((CAST(sy AS DOUBLE) - CAST(n*sxy - sx*sy AS DOUBLE)
                  / CAST(n*sxx - sx*sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE) / 1e6, 6) AS intercept,
           round(POWER(CAST(n*sxy - sx*sy AS DOUBLE), 2)
                 / (CAST(n*sxx - sx*sx AS DOUBLE)
                    * CAST(n*syy - sy*sy AS DOUBLE)), 6) AS r2
    FROM s
    """,
)
def q_zipf_token_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law OLS fit (ln freq ~ ln rank) over the top-1000 token
    head: vocabulary-bounded histogram, TakeOrderedAndProject top-k
    (never a global vocab sort), exact decimal128/hugeint OLS sums
    (``operators/text.py::zipf_token_fit``)."""
    from institutional_fx_etl_spark.operators.text import zipf_token_fit

    return zipf_token_fit(load_table(spark, sf_dir, "documents"), top_r=1000)


@register(
    "probe_calibration",
    "WITH probe AS (" + _probe_score_oracle() + """),
    lab AS (
      SELECT p.doc_id, p.score_micro,
             CAST(COALESCE(d.lang = 'en', false) AS INT) AS y
      FROM probe p JOIN documents d USING (doc_id)
    ),
    mm AS (SELECT min(score_micro) AS mn, max(score_micro) AS mx
           FROM lab),
    b AS (
      SELECT CAST((score_micro - mn) * 10 // (mx - mn + 1) AS INT)
               AS bin,
             score_micro, y
      FROM lab, mm
    )
    SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(y) AS BIGINT) AS n_pos,
           round(CAST(SUM(y) AS DOUBLE) / count(*), 6) AS pos_rate,
           round(CAST(CAST(SUM(score_micro) AS BIGINT) AS DOUBLE)
                 / count(*), 6) AS mean_score_micro
    FROM b GROUP BY bin
    """,
)
def q_probe_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for the linear quality probe: 10
    equal-width bins over the observed micro-score range, per-bin
    size / positive rate / mean score — integer binning, no float
    boundaries (``operators/selection.py::probe_calibration``)."""
    from institutional_fx_etl_spark.operators.selection import (
        probe_calibration,
    )

    docs = load_table(spark, sf_dir, "documents")
    return probe_calibration(
        docs, target_expr="COALESCE(lang = 'en', false)", n_bins=10,
        buckets=8, steps=3, lr_shift=4,
    )


def _register_streaming_ivf() -> None:
    """Streaming IVF ingest stats: every arriving embedding assigns to
    its nearest frozen centroid SCAN-SIDE (the ≤16-centroid literal
    regime of ``_assign_to`` is a pure projection, so it runs inside
    the micro-batch map with no stream-side shuffle beyond the
    complete-mode cell aggregate) and the per-cell (count, min id,
    id-checksum) table is maintained through the state store — the
    ingestion-side view of ``ivf_incremental``. All three aggregates
    are ingestion-order-free, so the streamed table equals the batch
    assignment bit-for-bit."""
    oracle = """
    WITH v AS (SELECT vec_id AS vid, CAST(embedding AS DOUBLE[]) AS vv
               FROM embeddings),
    cents AS (SELECT vid AS cid, vv AS cv FROM v WHERE vid < 8),
    scored AS (
      SELECT v.vid, c.cid,
             round(list_dot_product(v.vv, c.cv)
                   / (sqrt(list_dot_product(v.vv, v.vv))
                      * sqrt(list_dot_product(c.cv, c.cv))), 6) AS ccos
      FROM v CROSS JOIN cents c
    ),
    assigned AS (
      SELECT vid, cid FROM (
        SELECT *, row_number() OVER
          (PARTITION BY vid ORDER BY ccos DESC, cid) AS rn
        FROM scored) WHERE rn = 1
    )
    SELECT cid, CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(min(vid) AS BIGINT) AS min_vid,
           CAST(SUM(vid) AS BIGINT) AS sum_vid
    FROM assigned GROUP BY cid
    """

    @register("streaming_ivf_assign", oracle)
    def q_streaming_ivf_assign(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """STREAMING nearest-centroid ingest against 8 frozen id-seeded
        centroids, per-cell (n, min, Σid) state readout, certified
        against the batch assignment
        (``operators/similarity.py::_assign_to`` literal regime)."""
        import tempfile

        from institutional_fx_etl_spark.operators.similarity import (
            _assign_to,
        )

        _pin_session_confs(spark)
        name = "streaming_ivf_assign_result"
        static = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        centroids = static.filter("vec_id < 8").selectExpr(
            "vec_id AS cid",
            "transform(embedding, x -> CAST(x AS DOUBLE)) AS cv",
        )
        stream = (
            spark.readStream.schema(static.schema)
            .option("pathGlobFilter", "embeddings.parquet")
            .parquet(sf_dir)
        )
        counts = (
            _assign_to(stream, centroids, "embedding", "vec_id")
            # the ≤16-centroid literal regime narrows cid to INT (the
            # struct literal's element type); the contract column is
            # the source vec_id width
            .selectExpr("vid", "CAST(cid AS BIGINT) AS cid")
            .groupBy("cid")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
                F.min("vid").cast("bigint").alias("min_vid"),
                F.sum("vid").cast("bigint").alias("sum_vid"),
            )
        )
        q = _start_stream(
            spark,
            counts.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option(
                "checkpointLocation",
                _stream_tmpdir(prefix="stream_ivf_ck_"),
            )
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return spark.table(name).select(
            "cid", "n_vectors", "min_vid", "sum_vid"
        )


_register_streaming_ivf()


@register(
    "dedup_weights",
    "WITH clus AS ("
    + REGISTRY["dedup_clusters"][1]
    + """)
    SELECT c.doc_id, cs.cluster_size,
           round(CAST(1 AS DOUBLE) / cs.cluster_size, 6) AS weight
    FROM clus c JOIN (SELECT comp, CAST(count(*) AS BIGINT)
                        AS cluster_size
                      FROM clus GROUP BY comp) cs USING (comp)
    """,
)
def q_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft dedup: every document weighted 1/|near-dup cluster| (keep
    all copies, one unit of training mass per CLUSTER — the
    FineWeb/Dolma soft-dedup ablation knob). LSH pairs → connected
    components → one component-sized count
    (``operators/dedup.py::dedup_weights``)."""
    from institutional_fx_etl_spark.operators.dedup import (
        dedup_weights,
        minhash_lsh_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, jaccard_threshold=0.2)
    return dedup_weights(docs.select("doc_id"), pairs)


@register(
    "contamination_audit",
    "WITH emb_leg AS ("
    + REGISTRY["embedding_decontaminate"][1]
    + r"""),
    corpus AS (
      SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
      FROM documents WHERE NOT (doc_id % 10 = 0)
    ),
    ev AS (
      SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
      FROM documents WHERE doc_id % 10 = 0
    ),
    cg AS (
      SELECT DISTINCT unnest(list_transform(
               range(0, greatest(len(toks) - 5 + 1, 0)),
               i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
                    || ' ' || toks[i+4] || ' ' || toks[i+5])) AS g
      FROM corpus
    ),
    eg AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(0, greatest(len(toks) - 5 + 1, 0)),
               i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
                    || ' ' || toks[i+4] || ' ' || toks[i+5]))) AS g
      FROM ev
    ),
    nm AS (
      SELECT doc_id, count(*) AS nm FROM eg JOIN cg USING (g)
      GROUP BY doc_id
    )
    SELECT e.doc_id AS eval_id,
           CAST(COALESCE(nm.nm, 0) AS INT) AS ngram_matched,
           CAST(COALESCE(nm.nm, 0) > 0 AS INT) AS ngram_hit,
           CAST(COALESCE(el.n_matches, 0) AS BIGINT) AS emb_matches,
           el.max_cosine AS emb_max_cosine,
           CAST(COALESCE(nm.nm, 0) > 0 OR el.test_id IS NOT NULL AS INT)
             AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) e
    LEFT JOIN nm USING (doc_id)
    LEFT JOIN emb_leg el ON el.test_id = e.doc_id
    """,
)
def q_contamination_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite eval-contamination audit: one row per held-out doc
    (ids ≡ 0 mod 10) with the lexical 5-gram verdict AND the semantic
    embedding verdict plus the union flag — the release-gate report
    both decontamination passes feed
    (``plans/corpus.py::contamination_audit``)."""
    from institutional_fx_etl_spark.plans.corpus import contamination_audit

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    return contamination_audit(docs, emb)


def _register_boilerplate_incremental() -> None:
    """Incremental ≡ full proof for the append-only boilerplate purge:
    the oracle is the FULL-RUN SQL over the whole documents table, so
    a hash match certifies that the incremental path (new batch + the
    sliver of old docs whose digests crossed min_df) reproduces the
    rebuild bit-for-bit — the ivf_incremental discipline."""
    oracle = REGISTRY["boilerplate_purge"][1]

    @register("boilerplate_incremental", oracle)
    def q_boilerplate_incremental(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Append-only incremental boilerplate purge: docs with
        id ≡ 0 mod 7 arrive as the new batch against the standing
        corpus; only the batch and boundary-crossing old docs
        recompute (``operators/text.py::boilerplate_purge_incremental``
        — oracle = full recompute over the union)."""
        from institutional_fx_etl_spark.operators.text import (
            boilerplate_purge_incremental,
        )

        docs = load_table(spark, sf_dir, "documents")
        return boilerplate_purge_incremental(
            docs.filter("doc_id % 7 <> 0"),
            docs.filter("doc_id % 7 = 0"),
            segment_tokens=8,
            min_df=2,
        )


_register_boilerplate_incremental()


@register(
    "quantile_align",
    """
    WITH b AS (
      SELECT doc_id, COALESCE(source, '') AS grp,
             CAST(n_chars AS BIGINT) AS score
      FROM documents
    )
    SELECT doc_id, grp, score,
           CAST(row_number() OVER
             (PARTITION BY grp ORDER BY score, doc_id) AS BIGINT)
             AS grp_rank,
           round(CAST(row_number() OVER
             (PARTITION BY grp ORDER BY score, doc_id) AS DOUBLE)
             / (count(*) OVER (PARTITION BY grp)), 6) AS pct_rank
    FROM b
    """,
)
def q_quantile_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quantile normalization: exact within-source
    percentile rank of the length score, computed from a
    (source, score) histogram + tie-group window — a single global
    'top X%' threshold then applies uniformly across heterogeneous
    feeds (``operators/selection.py::quantile_align``)."""
    from institutional_fx_etl_spark.operators.selection import (
        quantile_align,
    )

    return quantile_align(
        load_table(spark, sf_dir, "documents"),
        score_expr="n_chars",
        group_col="coalesce(source, '')",
    )


def _register_streaming_lm_score() -> None:
    """Ingest-time LM quality scoring: the bigram model FITS on the
    standing corpus (two vocabulary-bounded batch aggregates), every
    ARRIVING document joins its bigrams to the static count tables
    (stream-static join — stateless) and reduces to one score row.
    Per-bigram log-probs micro-quantize to BIGINT before the stream
    aggregate, so the per-doc sum is INGESTION-ORDER-FREE — stricter
    determinism than the batch op's double sum, which is why this
    query carries its own integer-sum oracle instead of sharing
    ``bigram_lm_score``'s."""
    oracle = r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
      FROM documents
    ),
    doc_bi AS (
      SELECT doc_id,
             concat_ws(' ', toks[i], toks[i+1]) AS bg,
             toks[i] AS w1
      FROM t, unnest(range(1, len(toks))) AS u(i)
      WHERE len(toks) >= 2
    ),
    cb AS (SELECT bg, count(*) AS cb FROM doc_bi GROUP BY bg),
    cu AS (SELECT w1, count(*) AS cu FROM doc_bi GROUP BY w1),
    lp AS (
      SELECT d.doc_id,
             CAST(round(log2(CAST(cb.cb AS DOUBLE)
                             / CAST(cu.cu AS DOUBLE)) * 1e6, 0)
               AS BIGINT) AS lpm
      FROM doc_bi d JOIN cb USING (bg) JOIN cu USING (w1)
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(CAST(CAST(SUM(lpm) AS BIGINT) AS DOUBLE)
                 / count(*) / 1e6, 6) AS avg_log2_prob
    FROM lp GROUP BY doc_id
    """

    @register("streaming_lm_score", oracle)
    def q_streaming_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
        """STREAMING per-document bigram-LM scoring against the
        corpus-fit model: stream-static bigram join + complete-mode
        per-doc integer aggregate, certified against the batch
        integer-sum oracle (``operators/text.py::bigram_lm_score`` is
        the double-sum batch twin)."""
        import tempfile

        from institutional_fx_etl_spark.operators.text import (
            shingles_expr,
        )

        _pin_session_confs(spark)
        name = "streaming_lm_score_result"
        static = spark.read.parquet(f"{sf_dir}/documents.parquet")

        def doc_bigrams(df: DataFrame) -> DataFrame:
            return (
                df.withColumn(
                    "__toks", F.split(F.lower(F.col("text")), r"\s+")
                )
                .filter("size(__toks) >= 2")
                .selectExpr(
                    "doc_id",
                    f"explode({shingles_expr('__toks', 2)}) AS bg",
                )
                .selectExpr(
                    "doc_id", "bg", "substring_index(bg, ' ', 1) AS w1"
                )
            )

        model = doc_bigrams(static)
        cb = model.groupBy("bg").agg(
            F.count(F.lit(1)).alias("cb"), F.expr("max(w1) AS w1")
        )
        cu = cb.groupBy("w1").agg(F.sum("cb").alias("cu"))
        ref = cb.join(cu, "w1").select("bg", "cb", "cu")
        stream = (
            spark.readStream.schema(static.schema)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(sf_dir)
        )
        scored = (
            doc_bigrams(stream)
            .join(ref, "bg")
            .selectExpr(
                "doc_id",
                "CAST(round(log2(CAST(cb AS DOUBLE) / CAST(cu AS DOUBLE))"
                " * 1e6, 0) AS BIGINT) AS lpm",
            )
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
                F.sum("lpm").cast("bigint").alias("__s"),
            )
        )
        q = _start_stream(
            spark,
            scored.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option(
                "checkpointLocation",
                _stream_tmpdir(prefix="stream_lm_ck_"),
            )
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return spark.table(name).selectExpr(
            "doc_id",
            "n_bigrams",
            "round(CAST(__s AS DOUBLE) / n_bigrams / 1e6, 6)"
            " AS avg_log2_prob",
        )


_register_streaming_lm_score()


@register(
    "tokenizer_fertility",
    r"""
    WITH t AS (
      SELECT COALESCE(lang, 'und') AS lang,
             len(list_filter(string_split_regex(lower(text), '\s+'),
                             t -> t != '')) AS w,
             len(list_filter(
               regexp_extract_all(text,
                 '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+'),
               tk -> trim(tk) != '')) AS b,
             length(text) AS c
      FROM documents
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(w) AS BIGINT) AS n_words,
           CAST(SUM(b) AS BIGINT) AS n_bpe_tokens,
           round(CASE WHEN CAST(SUM(b) AS BIGINT) > 0
                       AND CAST(SUM(w) AS BIGINT) > 0 THEN
             CAST(CAST(SUM(b) AS BIGINT) AS DOUBLE)
             / CAST(SUM(w) AS BIGINT) END, 6) AS fertility,
           round(CASE WHEN CAST(SUM(b) AS BIGINT) > 0 THEN
             CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE)
             / CAST(SUM(b) AS BIGINT) END, 6) AS chars_per_token
    FROM t GROUP BY lang
    """,
)
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer fertility (BPE tokens per whitespace
    word) + chars-per-token compression — the multilingual
    vocabulary-rebalancing audit; one scan, one language-keyed exact
    integer aggregate (``operators/text.py::tokenizer_fertility``)."""
    from institutional_fx_etl_spark.operators.text import (
        tokenizer_fertility,
    )

    return tokenizer_fertility(
        load_table(spark, sf_dir, "documents"),
        lang_expr="coalesce(lang, 'und')",
    )


@register(
    "stupid_backoff_lm",
    r"""
    WITH tr AS (
      SELECT string_split_regex(lower(text), '\s+') AS toks
      FROM documents WHERE doc_id % 5 <> 0
    ),
    t3 AS (
      SELECT concat_ws(' ', toks[i], toks[i+1], toks[i+2]) AS g,
             count(*) AS c3
      FROM tr, unnest(range(1, len(toks) - 1)) AS u(i)
      WHERE len(toks) >= 3 GROUP BY g
    ),
    t2 AS (
      SELECT concat_ws(' ', toks[i], toks[i+1]) AS g, count(*) AS c2
      FROM tr, unnest(range(1, len(toks))) AS u(i)
      WHERE len(toks) >= 2 GROUP BY g
    ),
    t1 AS (
      SELECT toks[i] AS g, count(*) AS c1
      FROM tr, unnest(range(1, len(toks) + 1)) AS u(i) GROUP BY g
    ),
    tot AS (
      SELECT count(*) AS n
      FROM tr, unnest(range(1, len(toks) + 1)) AS u(i)
    ),
    ev AS (
      SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
      FROM documents WHERE doc_id % 5 = 0
    ),
    pos AS (
      SELECT doc_id,
             concat_ws(' ', toks[i], toks[i+1], toks[i+2]) AS g3,
             concat_ws(' ', toks[i], toks[i+1]) AS gc,
             concat_ws(' ', toks[i+1], toks[i+2]) AS gb,
             toks[i+1] AS w2, toks[i+2] AS w3
      FROM ev, unnest(range(1, len(toks) - 1)) AS u(i)
      WHERE len(toks) >= 3
    ),
    j AS (
      SELECT p.doc_id,
        CASE
          WHEN COALESCE(a.c3, 0) > 0 THEN
            log2(CAST(a.c3 AS DOUBLE) / CAST(bc.c2 AS DOUBLE))
          WHEN COALESCE(bb.c2, 0) > 0 THEN
            log2(CAST(0.4 AS DOUBLE)
                 * (CAST(bb.c2 AS DOUBLE) / CAST(u2.c1 AS DOUBLE)))
          WHEN COALESCE(u3.c1, 0) > 0 THEN
            log2(CAST(0.16 AS DOUBLE)
                 * (CAST(u3.c1 AS DOUBLE) / CAST(tot.n AS DOUBLE)))
          ELSE log2(CAST(0.064 AS DOUBLE) / CAST(tot.n AS DOUBLE))
        END AS lp,
        CASE WHEN COALESCE(a.c3, 0) > 0 THEN 0
             WHEN COALESCE(bb.c2, 0) > 0 THEN 1
             WHEN COALESCE(u3.c1, 0) > 0 THEN 2 ELSE 3 END AS lvl
      FROM pos p
      LEFT JOIN t3 a ON p.g3 = a.g
      LEFT JOIN t2 bc ON p.gc = bc.g
      LEFT JOIN t2 bb ON p.gb = bb.g
      LEFT JOIN t1 u2 ON p.w2 = u2.g
      LEFT JOIN t1 u3 ON p.w3 = u3.g
      CROSS JOIN tot
    ),
    agg AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_positions,
        CAST(SUM(CASE WHEN lvl = 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_tri,
        CAST(SUM(CASE WHEN lvl = 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_bi_backoff,
        CAST(SUM(CASE WHEN lvl = 2 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_uni_backoff,
        CAST(SUM(CASE WHEN lvl = 3 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_floor,
        round(SUM(lp) / count(*), 6) AS avg_log2_s
      FROM j GROUP BY doc_id
    )
    SELECT doc_id, n_positions, n_tri, n_bi_backoff, n_uni_backoff,
           n_floor, avg_log2_s,
           round(power(2.0, -avg_log2_s), 6) AS score_ppl
    FROM agg
    """,
)
def q_stupid_backoff_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram stupid-backoff LM scoring (Brants et al. 2007): fit
    raw trigram/bigram/unigram count tables on the held-in corpus
    (doc_id % 5 <> 0), score the held-out fifth by mean log2 S with
    α=0.4 backoff and per-level hit counts — the web-scale LM quality
    signal one rung above ``bigram_lm_score``
    (``operators/text.py::stupid_backoff_lm``)."""
    from institutional_fx_etl_spark.operators.text import stupid_backoff_lm

    docs = load_table(spark, sf_dir, "documents")
    return stupid_backoff_lm(
        docs.filter("doc_id % 5 <> 0"), docs.filter("doc_id % 5 = 0")
    )


def _register_mmr_select() -> None:
    """MMR oracle: the same greedy k-step argmax the operator's
    bounded driver loop runs, unrolled as CTEs over the identical
    micro-int relevance/similarity relations (the ``emb_pca_power``
    iterative-oracle discipline) — every step is an integer-score
    ORDER BY ... LIMIT 1 with the (score desc, id asc) tie-break."""
    k, short_n, lam = 5, 64, 5
    parts = [
        "v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv"
        " FROM embeddings)",
        "n AS (SELECT vec_id, vv, sqrt(list_dot_product(vv, vv)) AS nv"
        " FROM v)",
        "q AS (SELECT vv AS qv, nv AS nq FROM n WHERE vec_id = 0)",
        "rel AS (SELECT vec_id,"
        " CAST(round(round(list_dot_product(vv, qv) / (nv * nq), 6)"
        " * 1e6, 0) AS BIGINT) AS rel_m,"
        " round(list_dot_product(vv, qv) / (nv * nq), 6) AS cosine"
        " FROM n CROSS JOIN q)",
        "short AS (SELECT vec_id, rel_m FROM ("
        "  SELECT vec_id, rel_m, row_number() OVER"
        "    (ORDER BY cosine DESC, vec_id) AS rk FROM rel)"
        f" WHERE rk <= {short_n})",
        "sn AS (SELECT n.vec_id, n.vv, n.nv FROM n JOIN short"
        " USING (vec_id))",
        "sims AS (SELECT a.vec_id AS ida, b.vec_id AS idb,"
        " CAST(round(round(list_dot_product(a.vv, b.vv)"
        " / (a.nv * b.nv), 6) * 1e6, 0) AS BIGINT) AS sim_m"
        " FROM sn a JOIN sn b ON a.vec_id <> b.vec_id)",
        f"sel1 AS (SELECT 1 AS rank, vec_id, {lam} * rel_m AS score_m10"
        " FROM short ORDER BY rel_m DESC, vec_id LIMIT 1)",
        "selall1 AS (SELECT * FROM sel1)",
    ]
    for i in range(2, k + 1):
        parts.append(
            f"sel{i} AS (SELECT {i} AS rank, vec_id, sc AS score_m10"
            " FROM ("
            f"  SELECT c.vec_id, {lam} * c.rel_m - {10 - lam} * ms.ms AS sc"
            "   FROM short c JOIN ("
            "     SELECT s.ida AS vec_id, max(s.sim_m) AS ms FROM sims s"
            f"     JOIN selall{i - 1} p ON s.idb = p.vec_id"
            "     GROUP BY s.ida) ms USING (vec_id)"
            f"  WHERE c.vec_id NOT IN (SELECT vec_id FROM selall{i - 1})"
            "   ORDER BY sc DESC, c.vec_id LIMIT 1))"
        )
        parts.append(
            f"selall{i} AS (SELECT * FROM selall{i - 1}"
            f" UNION ALL SELECT * FROM sel{i})"
        )
    oracle = (
        "WITH " + ",\n".join(parts) + "\n"
        "SELECT rank, vec_id,"
        " CAST(rel_m AS DOUBLE) / 1000000.0 AS rel_cosine,"
        " CAST(score_m10 AS DOUBLE) / 10000000.0 AS mmr_score"
        f" FROM selall{k} JOIN short USING (vec_id)"
    )

    @register("mmr_select", oracle)
    def q_mmr_select(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Maximal-marginal-relevance selection (λ=0.5): 5 diverse
        picks from the 64-strongest matches to query vector 0 —
        distributed relevance prune + pairwise sim matrix, bounded
        integer greedy on the driver
        (``operators/selection.py::mmr_select``)."""
        from institutional_fx_etl_spark.operators.selection import mmr_select

        return mmr_select(
            load_table(spark, sf_dir, "embeddings"),
            query_id=0,
            k=5,
            shortlist=64,
            lam_tenths=5,
        )


_register_mmr_select()


def _register_label_prop() -> None:
    """3 synchronous label-propagation rounds, unrolled as CTEs —
    each round is mode-of-neighbor-labels with (count desc, label
    asc) tie-break, a deterministic function of the previous round."""
    rounds = []
    prev = "l0"
    for i in (1, 2, 3):
        rounds.append(
            f"l{i} AS (SELECT node, lbl FROM ("
            "  SELECT e.a AS node, l.lbl, count(*) AS c,"
            "    row_number() OVER (PARTITION BY e.a"
            "      ORDER BY count(*) DESC, l.lbl) AS rk"
            f"  FROM e JOIN {prev} l ON e.b = l.node"
            "  GROUP BY e.a, l.lbl) WHERE rk = 1)"
        )
        prev = f"l{i}"
    oracle = (
        """
    WITH items AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    e0 AS (
      SELECT DISTINCT i1.p AS a, i2.p AS b
      FROM items i1 JOIN items i2 ON i1.o = i2.o AND i1.p < i2.p
    ),
    e AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
    l0 AS (SELECT DISTINCT a AS node, a AS lbl FROM e),
    """
        + ",\n    ".join(rounds)
        + """,
    sizes AS (SELECT lbl, CAST(count(*) AS BIGINT) AS n_members
              FROM l3 GROUP BY lbl)
    SELECT node, l3.lbl AS label, n_members
    FROM l3 JOIN sizes USING (lbl)
    """
    )

    @register("label_prop_communities", oracle)
    def q_label_prop_communities(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Synchronous label propagation (3 fixed rounds, min-label
        tie-break) over the co-order part graph — the community
        detector next to pagerank/triangles/CC in the graph family
        (``operators/graph.py::label_prop_communities``)."""
        from institutional_fx_etl_spark.operators.graph import (
            label_prop_communities,
        )

        # r14 note: the basket-aggregate emission used by
        # q_triangle_count was tried here and measured SLOWER — this
        # query consumes the raw edge relation four times (node set
        # ×2, both-direction build ×2), and the C(k,2) array emission
        # is post-exchange CPU that exchange reuse cannot dedup,
        # while the self-join form's duplicate subtrees ARE deduped
        # at their exchanges. Kept as-is deliberately.
        items = (
            load_table(spark, sf_dir, "lineitem")
            .selectExpr("l_orderkey AS o", "l_partkey AS p")
            .distinct()
        )
        i2 = items.selectExpr("o", "p AS p2")
        edges = (
            items.join(i2, "o")
            .filter("p < p2")
            .selectExpr("p AS src", "p2 AS dst")
            .distinct()
        )
        return label_prop_communities(edges)


_register_label_prop()


@register(
    "kl_source_divergence",
    r"""
    WITH sw AS (
      SELECT source AS s, t AS w, count(*) AS cs FROM (
        SELECT source,
               unnest(string_split_regex(lower(text), '\s+')) AS t
        FROM documents)
      WHERE t <> '' GROUP BY source, t
    ),
    g AS (SELECT w, SUM(cs) AS cg FROM sw GROUP BY w),
    gs AS (
      SELECT CAST(SUM(cg) AS BIGINT) AS ng,
             CAST(count(*) AS BIGINT) AS v,
             CAST(SUM(CAST(round(log2(cg + 1) * 1e6, 0) AS BIGINT))
               AS BIGINT) AS t6
      FROM g
    ),
    ss AS (
      SELECT s, CAST(SUM(cs) AS BIGINT) AS ns,
             CAST(count(*) AS BIGINT) AS vs
      FROM sw GROUP BY s
    ),
    present AS (
      SELECT sw.s,
        CAST(SUM(CAST(round(
          ((CAST(cs + 1 AS DOUBLE) / CAST(ns + v AS DOUBLE))
           * log2((CAST(cs + 1 AS DOUBLE) / CAST(ns + v AS DOUBLE))
                  / (CAST(cg + 1 AS DOUBLE) / CAST(ng + v AS DOUBLE))))
          * 1e12, 0) AS BIGINT)) AS BIGINT) AS s1,
        CAST(SUM(CAST(round(log2(cg + 1) * 1e6, 0) AS BIGINT))
          AS BIGINT) AS s2
      FROM sw JOIN g USING (w) JOIN ss ON sw.s = ss.s CROSS JOIN gs
      GROUP BY sw.s
    )
    SELECT ss.s AS grp, ns AS n_tokens, vs AS vocab_present,
           round(CAST(s1 AS DOUBLE) / 1e12
             + (CAST(v - vs AS DOUBLE) / CAST(ns + v AS DOUBLE))
               * log2(CAST(ng + v AS DOUBLE) / CAST(ns + v AS DOUBLE))
             - (CAST(t6 - s2 AS DOUBLE) / 1e6) / CAST(ns + v AS DOUBLE)
           , 6) AS kl_bits
    FROM ss JOIN present ON ss.s = present.s CROSS JOIN gs
    """,
)
def q_kl_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KL(P_source || P_corpus) in bits, add-one smoothed
    over the corpus vocabulary: exact micro-int sums for every
    vocabulary-sized accumulation, closed-form absent-word remainder
    (``operators/text.py::ngram_kl_divergence``)."""
    from institutional_fx_etl_spark.operators.text import (
        ngram_kl_divergence,
    )

    return ngram_kl_divergence(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_prefix_filter",
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
      FROM documents
    ),
    dt AS (
      SELECT doc_id, unnest(
        list_distinct(list_transform(
          list_transform(range(1, greatest(len(toks)-1, 1)),
                         i -> concat_ws(' ', toks[i], toks[i+1],
                                        toks[i+2])),
          s -> CAST(concat('0x', substr(md5(s),1,8)) AS BIGINT)))) AS t
      FROM t WHERE len(toks) >= 3
    ),
    freq AS (SELECT t, count(*) AS f FROM dt GROUP BY t),
    docs AS (
      SELECT doc_id, list(dt.t ORDER BY f, dt.t) AS toks,
             count(*) AS n
      FROM dt JOIN freq USING (t) GROUP BY doc_id
    ),
    pd AS (
      SELECT doc_id, toks, n,
             list_slice(toks, 1, n
               - CAST(ceil(n * 500000 / 1000000.0) AS INT) + 1) AS prefix
      FROM docs
    ),
    pre AS (SELECT doc_id, unnest(prefix) AS t FROM pd),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM pre a JOIN pre b ON a.t = b.t AND a.doc_id < b.doc_id
    ),
    v AS (
      SELECT id_a, id_b,
             round(CAST(len(list_intersect(x.toks, y.toks)) AS DOUBLE)
                   / (x.n + y.n
                      - len(list_intersect(x.toks, y.toks))), 6)
               AS jaccard
      FROM cand JOIN pd x ON cand.id_a = x.doc_id
                JOIN pd y ON cand.id_b = y.doc_id
    )
    SELECT id_a, id_b, jaccard FROM v WHERE jaccard >= 0.5
    """,
)
def q_dedup_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPJoin-style prefix-filter set-similarity join over hashed
    3-gram SHINGLE sets (Jaccard ≥ 0.5): rarity-ordered elements,
    first n−⌈τn⌉+1 as the prefix, candidates from shared prefix
    elements — COMPLETE by the pigeonhole bound, unlike probabilistic
    MinHash banding; exact-Jaccard verify. The shingle universe keeps
    the semantic sequence-sensitive (the unigram-token grain is
    degenerate on template-heavy corpora: τ=0.7 token-set pairs at
    sf0.1 number 5.1M vs the 25 true shingle near-dups)
    (``operators/dedup.py::prefix_filter_pairs``)."""
    from institutional_fx_etl_spark.operators.dedup import (
        prefix_filter_pairs,
    )

    return prefix_filter_pairs(
        load_table(spark, sf_dir, "documents"),
        jaccard_threshold=0.5,
        shingle_n=3,
    )


def _register_streaming_decontaminate() -> None:
    """Streaming twin of decontaminate_ngram: the eval-suite gram set
    is STATIC (eval suites change rarely; the relation is
    benchmark-sized and broadcasts), documents stream through a
    stream-static left join + complete-mode per-doc integer count —
    ingestion-order-free by construction (each doc's grams ride one
    input row), so the BATCH oracle certifies the stream bit-for-bit
    (the streaming_lm_score discipline)."""
    oracle = REGISTRY["decontaminate_ngram"][1]

    @register("streaming_decontaminate", oracle)
    def q_streaming_decontaminate(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Ingest-time eval-leakage gate: streamed corpus docs
        (doc_id ≥ 25) against the static benchmark 5-gram set
        (doc_id < 25); per-doc distinct-gram match count under
        complete-mode aggregation, hash-certified against the batch
        decontaminate_against oracle."""
        import tempfile

        from institutional_fx_etl_spark.operators.text import (
            shingles_expr,
        )

        _pin_session_confs(spark)
        name = "streaming_decontaminate_result"
        static = spark.read.parquet(f"{sf_dir}/documents.parquet")
        grams5 = (
            "array_distinct(CASE WHEN size(__toks) >= 5"
            f" THEN {shingles_expr('__toks', 5)} ELSE array() END)"
        )
        bench = (
            static.filter("doc_id < 25")
            .withColumn("__toks", F.split(F.lower(F.col("text")), r"\s+"))
            .selectExpr(f"explode({grams5}) AS g")
            .distinct()
            .withColumn("__hit", F.lit(1))
        )
        stream = (
            spark.readStream.schema(static.schema)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(sf_dir)
        )
        scored = (
            stream.filter("doc_id >= 25")
            .withColumn("__toks", F.split(F.lower(F.col("text")), r"\s+"))
            .selectExpr("doc_id", f"explode_outer({grams5}) AS g")
            .join(F.broadcast(bench), "g", "left")
            .groupBy("doc_id")
            .agg(
                F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
                .cast("int")
                .alias("n_matched")
            )
        )
        q = _start_stream(
            spark,
            scored.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option(
                "checkpointLocation",
                _stream_tmpdir(prefix="stream_decon_ck_"),
            )
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return spark.table(name).selectExpr(
            "doc_id",
            "n_matched",
            "n_matched > 0 AS contaminated",
        )


_register_streaming_decontaminate()


def _register_semdedup_incremental() -> None:
    """Incremental ≡ full proof for append-only SemDeDup: the oracle
    is the FULL-RUN semdedup SQL over the whole embeddings table, so
    a hash match certifies the incremental path (new batch compared
    in its own cells + cap-flip rewrite) reproduces the rebuild
    bit-for-bit — the ivf_incremental / boilerplate_incremental
    discipline."""
    oracle = REGISTRY["semdedup"][1]

    @register("semdedup_incremental", oracle)
    def q_semdedup_incremental(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Append-only incremental SemDeDup: the TOP ~1/9 of ids
        arrive as the new batch against the standing corpus — a
        genuinely append-only split (the operator now ENFORCES
        max(old id) < min(new id); the former interleaved split
        satisfied the rebuild oracle only by data luck, the r11
        ADVICE #4 hazard) (``operators/similarity.py::
        semdedup_incremental``)."""
        from institutional_fx_etl_spark.operators.similarity import (
            semdedup_incremental,
        )

        emb = load_table(spark, sf_dir, "embeddings")
        # one column-pruned aggregate serves both split parameters
        # (was a count job + a max job — guide §5 job overhead)
        st = emb.agg(
            F.count(F.lit(1)).alias("n"), F.max("vec_id").alias("mx")
        ).collect()[0]
        n, mx = st["n"], st["mx"]
        cut = mx - max(1, n // 9)
        out = semdedup_incremental(
            emb.filter(f"vec_id <= {cut}"),
            emb.filter(f"vec_id > {cut}"),
            min_cosine=0.9,
            num_centroids=_auto_cells(n),
        )
        return out.withColumn("cid", F.col("cid").cast("bigint"))


_register_semdedup_incremental()


def _register_kcenter_select() -> None:
    """Greedy k-center oracle: the operator's k−1 distributed scans
    unrolled as CTEs — each step an (argmax of min-micro-distance,
    id-asc tie-break) ORDER BY ... LIMIT 1 over the same integer
    relations (the ``mmr_select`` unroll discipline)."""
    k, seed = 6, 0
    dm = (
        "1000000 - CAST(round(round(list_dot_product(x.vv, c.vv)"
        " / (x.nv * c.nv), 6) * 1e6, 0) AS BIGINT)"
    )
    parts = [
        "v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv"
        " FROM embeddings)",
        "n AS (SELECT vec_id, vv, sqrt(list_dot_product(vv, vv)) AS nv"
        " FROM v)",
        f"p1 AS (SELECT 1 AS rank, CAST({seed} AS BIGINT) AS vec_id,"
        " CAST(0 AS BIGINT) AS dist_micro)",
        "sel1 AS (SELECT vec_id FROM p1)",
    ]
    for i in range(2, k + 1):
        prev = f"sel{i - 1}"
        parts.append(
            f"d{i} AS (SELECT x.vec_id, min({dm}) AS dmin"
            f" FROM n x JOIN n c ON c.vec_id IN (SELECT vec_id FROM {prev})"
            "  AND x.vec_id <> c.vec_id"
            f" WHERE x.vec_id NOT IN (SELECT vec_id FROM {prev})"
            " GROUP BY x.vec_id)"
        )
        parts.append(
            f"p{i} AS (SELECT {i} AS rank, vec_id, dmin AS dist_micro"
            f" FROM d{i} ORDER BY dmin DESC, vec_id LIMIT 1)"
        )
        parts.append(
            f"sel{i} AS (SELECT vec_id FROM {prev}"
            f" UNION ALL SELECT vec_id FROM p{i})"
        )
    oracle = (
        "WITH " + ",\n".join(parts) + "\n"
        + " UNION ALL ".join(f"SELECT * FROM p{i}" for i in range(1, k + 1))
    )

    @register("kcenter_select", oracle)
    def q_kcenter_select(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Greedy k-center coreset picks (Gonzalez farthest-point, 6
        centers from seed 0): each step one distributed min-distance
        scan ending in a 1-row integer argmax — pure-coverage
        selection next to mmr_select's relevance/diversity balance
        (``operators/selection.py::kcenter_select``)."""
        from institutional_fx_etl_spark.operators.selection import (
            kcenter_select,
        )

        return kcenter_select(
            load_table(spark, sf_dir, "embeddings"), k=6, seed_id=0
        )


_register_kcenter_select()


def _register_graph_modularity() -> None:
    """Composite oracle: the label_prop_communities CTE chain supplies
    the partition; modularity follows as exact hugeint arithmetic
    (the dedup_stats wrap-an-existing-oracle pattern)."""
    lp = REGISTRY["label_prop_communities"][1]
    oracle = (
        "WITH lp AS (" + lp + "),\n"
        """items2 AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    ee AS (
      SELECT DISTINCT i1.p AS a, i2.p AS b
      FROM items2 i1 JOIN items2 i2 ON i1.o = i2.o AND i1.p < i2.p
    ),
    la AS (SELECT node AS n, label AS l FROM lp),
    deg AS (
      SELECT n, count(*) AS d FROM (
        SELECT a AS n FROM ee UNION ALL SELECT b AS n FROM ee)
      GROUP BY n
    ),
    mc AS (
      SELECT x.l AS l, count(*) AS mc
      FROM ee JOIN la x ON ee.a = x.n JOIN la y ON ee.b = y.n
      WHERE x.l = y.l GROUP BY x.l
    ),
    dc AS (
      SELECT l, SUM(d) AS dcs FROM deg JOIN la ON deg.n = la.n
      GROUP BY l
    ),
    per_l AS (
      SELECT dc.l, CAST(COALESCE(mc.mc, 0) AS HUGEINT) AS mc,
             CAST(dc.dcs AS HUGEINT) AS dcs
      FROM dc LEFT JOIN mc ON dc.l = mc.l
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_communities,
             SUM(mc) AS smc, SUM(dcs*dcs) AS sdc2
      FROM per_l
    ),
    cnt AS (
      SELECT CAST(count(*) AS HUGEINT) AS m,
             (SELECT CAST(count(*) AS BIGINT) FROM la) AS n_nodes
      FROM ee
    )
    SELECT n_communities, n_nodes,
           CAST(m AS BIGINT) AS n_edges,
           CAST(smc AS BIGINT) AS internal_edges,
           round(CAST(4*m*smc - sdc2 AS DOUBLE)
                 / CAST(4*m*m AS DOUBLE), 6) AS modularity
    FROM tot, cnt
    """
    )

    @register("graph_modularity", oracle)
    def q_graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Newman modularity of the 3-round label-propagation
        partition over the co-order part graph — fit + goodness-of-
        fit as one auditable number; exact decimal128 arithmetic to a
        single division (``operators/graph.py::graph_modularity``)."""
        from institutional_fx_etl_spark.operators.graph import (
            graph_modularity,
            label_prop_communities,
        )

        from pyspark import StorageLevel

        # r14 note: the basket-aggregate emission was tried here and
        # measured SLOWER (see q_label_prop_communities) — kept on
        # the self-join form whose duplicate subtrees dedup at their
        # exchanges. ONE materialized edge relation feeds both the
        # detector and the scorer (each persists its own derived
        # view; without this the lineitem self-join scan runs twice).
        items = (
            load_table(spark, sf_dir, "lineitem")
            .selectExpr("l_orderkey AS o", "l_partkey AS p")
            .distinct()
        )
        i2 = items.selectExpr("o", "p AS p2")
        edges = (
            items.join(i2, "o")
            .filter("p < p2")
            .selectExpr("p AS src", "p2 AS dst")
            .distinct()
            .transform(cached)
        )
        labels = label_prop_communities(edges).select("node", "label")
        return graph_modularity(edges, labels)


_register_graph_modularity()


@register(
    "heaps_law_fit",
    r"""
    WITH mm AS (SELECT min(doc_id) AS mn, max(doc_id) AS mx
                FROM documents),
    stream AS (
      SELECT CAST(((doc_id - mn) * 16) // (mx - mn + 1) AS INT) + 1 AS c,
             t AS tok
      FROM (SELECT doc_id,
                   unnest(string_split_regex(lower(text), '\s+')) AS t
            FROM documents) CROSS JOIN mm
      WHERE t <> ''
    ),
    per_c AS (SELECT c, count(*) AS nt FROM stream GROUP BY c),
    news AS (
      SELECT c, count(*) AS nv FROM (
        SELECT tok, min(c) AS c FROM stream GROUP BY tok) GROUP BY c
    ),
    pts0 AS (
      SELECT COALESCE(p.c, n.c) AS c,
             SUM(COALESCE(nt, 0)) OVER (ORDER BY COALESCE(p.c, n.c)
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS n_cum,
             SUM(COALESCE(nv, 0)) OVER (ORDER BY COALESCE(p.c, n.c)
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS v_cum
      FROM per_c p FULL OUTER JOIN news n ON p.c = n.c
    ),
    pts AS (
      SELECT CAST(round(ln(n_cum) * 1e6, 0) AS HUGEINT) AS x,
             CAST(round(ln(v_cum) * 1e6, 0) AS HUGEINT) AS y,
             n_cum, v_cum
      FROM pts0 WHERE n_cum > 0 AND v_cum > 0
    ),
    s AS (
      SELECT CAST(count(*) AS HUGEINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy,
             CAST(MAX(n_cum) AS BIGINT) AS tokens_total,
             CAST(MAX(v_cum) AS BIGINT) AS vocab_total
      FROM pts
    )
    SELECT CAST(n AS BIGINT) AS n_points,
           round(CAST(n*sxy - sx*sy AS DOUBLE)
                 / CAST(n*sxx - sx*sx AS DOUBLE), 6) AS beta,
           round((CAST(sy AS DOUBLE) - CAST(n*sxy - sx*sy AS DOUBLE)
                  / CAST(n*sxx - sx*sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE) / 1e6, 6) AS ln_k,
           round(POWER(CAST(n*sxy - sx*sy AS DOUBLE), 2)
                 / (CAST(n*sxx - sx*sx AS DOUBLE)
                    * CAST(n*syy - sy*sy AS DOUBLE)), 6) AS r2,
           tokens_total, vocab_total
    FROM s
    """,
)
def q_heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth fit (ln V ~ ln N over 16 id-slice
    prefixes): one token-stream pass feeds both the cumulative token
    curve and the first-seen vocabulary rollup; exact hugeint/
    decimal128 OLS (``operators/text.py::heaps_law_fit``)."""
    from institutional_fx_etl_spark.operators.text import heaps_law_fit

    return heaps_law_fit(load_table(spark, sf_dir, "documents"))


@register(
    "l_diversity",
    """
    WITH g AS (
      SELECT lang, n_chars // 100 AS len_bucket,
             count(*) AS gs, count(DISTINCT source) AS gl
      FROM documents GROUP BY 1, 2),
    a AS (
      SELECT CAST(sum(gs) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_groups,
             CAST(min(gl) AS BIGINT) AS l_min,
             CAST(sum(CASE WHEN gl < 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS groups_below_l,
             CAST(sum(CASE WHEN gl < 3 THEN gs ELSE 0 END) AS BIGINT)
               AS rows_below_l
      FROM g)
    SELECT n_rows, n_groups, l_min, groups_below_l, rows_below_l,
           floor(CAST(rows_below_l AS DOUBLE) / CAST(n_rows AS DOUBLE)
             * 1e6 + 0.5) / 1e6 AS at_risk_share
    FROM a
    """,
)
def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity profile under the (lang, length-bucket) quasi-
    identifier with ``source`` as the sensitive attribute — the
    disclosure audit k-anonymity misses (a large group with one
    sensitive value still discloses it)
    (``operators/profiling.py::l_diversity``)."""
    from institutional_fx_etl_spark.operators.profiling import l_diversity

    docs = load_table(spark, sf_dir, "documents").selectExpr(
        "lang", "n_chars div 100 AS len_bucket", "source"
    )
    return l_diversity(docs, ["lang", "len_bucket"], "source", l=3)



from institutional_fx_etl_spark.operators.profiling import (  # noqa: E402
    NORMAL_SF_TWO_SIDED,
)

# ---------------------------------------------------------------------
# Round-12 additions: C4 cleaning signals, temperature rebalancing,
# link prediction, k-core, local clustering, Roll spread, Parkinson
# volatility, Theil-Sen trend, BH FDR, t-closeness.
# ---------------------------------------------------------------------

_C4_TXT = (
    "CASE WHEN doc_id % 41 = 0 THEN"
    " concat('lorem ipsum ', replace(replace(text, ' value ',"
    " ' value. '), ' table ', ' table! '))"
    " WHEN doc_id % 29 = 0 THEN"
    " concat(replace(replace(text, ' value ', ' value. '),"
    " ' table ', ' table! '), ' x{y}')"
    " WHEN doc_id % 37 = 0 THEN"
    " concat(replace(replace(text, ' value ', ' value. '),"
    " ' table ', ' table! '), ' javascript required')"
    " ELSE replace(replace(text, ' value ', ' value. '),"
    " ' table ', ' table! ') END"
)
"""Deterministic punctuation/marker injection for the quality_c4
fixture: the synthetic corpus has no sentence punctuation, so the
fixture creates boundaries by terminating two common words and plants
C4's drop markers on fixed id residues — identical expression on both
engines (plain ``replace``, no regex backreference dialects)."""


@register(
    "quality_c4",
    f"""
    WITH d AS (SELECT doc_id, {_C4_TXT} AS text FROM documents),
    s AS (
      SELECT doc_id,
        len(list_filter(list_transform(string_split_regex(text,
          '[.!?]'), s -> trim(s)), s -> s <> '')) AS n_sentences,
        len(list_filter(regexp_extract_all(text, '[^.!?]+[.!?]', 0),
          s -> len(string_split_regex(trim(s), '\\s+')) >= 3))
          AS n_kept_sentences,
        CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
          AS n_words,
        contains(lower(text), 'lorem ipsum') AS has_lorem,
        contains(text, '{{') AS has_brace,
        contains(lower(text), 'javascript') AS has_js
      FROM d
    )
    SELECT doc_id, n_sentences, n_kept_sentences, n_words, has_lorem,
           has_brace, has_js,
           (n_kept_sentences >= 3 AND NOT has_lorem AND NOT has_brace
            AND NOT has_js) AS keep
    FROM s
    """,
)
def q_quality_c4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style cleaning signals (terminated-sentence rule + marker
    drops) over the documents corpus with deterministic punctuation
    injection — the second canonical heuristic rule set next to
    gopher quality (``operators/text.py::quality_c4``)."""
    from institutional_fx_etl_spark.operators.text import quality_c4

    docs = load_table(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"{_C4_TXT} AS text"
    )
    return quality_c4(docs).select(
        "doc_id",
        "n_sentences",
        "n_kept_sentences",
        "n_words",
        "has_lorem",
        "has_brace",
        "has_js",
        "keep",
    )


@register(
    "temperature_resample",
    """
    WITH g AS (
      SELECT lang, count(*) AS n_rows,
             CAST(SUM(CAST(n_chars AS DECIMAL(38,0))) AS BIGINT) AS mass
      FROM documents GROUP BY lang
    ),
    t AS (SELECT CAST(SUM(CAST(mass AS DECIMAL(38,0))) AS BIGINT) AS tm
          FROM g),
    s AS (
      SELECT lang, n_rows, mass,
             pow(CAST(mass AS DOUBLE) / tm, 70 / 100.0) AS q_raw,
             CAST(mass AS DOUBLE) / tm AS p
      FROM g, t
    ),
    qt AS (
      SELECT CAST(SUM(CAST(floor(q_raw * 1e6 + 0.5) AS DECIMAL(38,0)))
             AS DOUBLE) / 1e6 AS qt FROM s
    )
    SELECT lang, n_rows, mass, round(p, 6) AS nat_share,
           round(q_raw / qt, 6) AS temp_share,
           round((q_raw / qt) / p, 6) AS weight_mult
    FROM s, qt
    """,
)
def q_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-α (0.7) corpus rebalancing weights per language —
    the mBERT/XLM-R sampling rule: low-resource groups up-weighted by
    ``(p^α/Σp^α)/p`` (``operators/selection.py::temperature_resample``).
    """
    from institutional_fx_etl_spark.operators.selection import (
        temperature_resample,
    )

    docs = load_table(spark, sf_dir, "documents")
    return temperature_resample(
        docs, group_col="lang", weight_expr="n_chars", alpha_pct=70
    )


_SMALL_BASKET_EDGES = """
    items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
              FROM lineitem),
    sm AS (SELECT o FROM items GROUP BY o HAVING count(*) <= 3),
    e0 AS (SELECT DISTINCT i1.p AS a, i2.p AS b
           FROM items i1 JOIN items i2 ON i1.o = i2.o AND i1.p < i2.p
           WHERE i1.o IN (SELECT o FROM sm))
"""


def _small_basket_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-purchase graph restricted to small baskets (≤3 distinct
    parts per order): each order contributes ≤3 edges, so wedge
    fan-out stays structurally bounded (1.3M wedges at sf0.1 vs 148M
    unrestricted) — the right fixture for the quadratic-in-degree
    link-prediction/clustering ops.

    Plan shape (r14, guide §2.4): ONE basket aggregate
    (``collect_set`` dedups parts per order map-side) replaces the
    former items-distinct + size pre-pass + self-join — the items
    relation was consumed three times and re-derived per consumer;
    pair emission is in-array over the ≤3-element sorted basket, so
    no join and no second wide exchange exists. Same edge set."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .selectExpr("l_orderkey AS o", "l_partkey AS p")
        .groupBy("o")
        .agg(F.expr("array_sort(collect_set(p)) AS ps"))
        .filter("size(ps) BETWEEN 2 AND 3")
        .selectExpr(
            "explode(flatten(transform(ps, (x, i) ->"
            " transform(slice(ps, i + 2, size(ps) - i - 1), y ->"
            " struct(x AS src, y AS dst))))) AS e"
        )
        .select("e.*")
        .distinct()
    )


@register(
    "adamic_adar",
    f"""
    WITH {_SMALL_BASKET_EDGES},
    nbr AS (SELECT a AS z, b AS x FROM e0
            UNION ALL SELECT b, a FROM e0),
    deg AS (SELECT z, count(*) AS d FROM nbr GROUP BY z),
    mid AS (SELECT n.z, n.x,
                   CAST(floor(1e6 / ln(CAST(d AS DOUBLE)) + 0.5)
                        AS DECIMAL(38,0)) AS aa_m
            FROM nbr n JOIN deg USING (z)),
    w AS (SELECT m1.x AS x, m2.x AS y, count(*) AS cn,
                 SUM(m1.aa_m) AS aa
          FROM mid m1 JOIN mid m2 ON m1.z = m2.z AND m1.x < m2.x
          GROUP BY m1.x, m2.x HAVING count(*) >= 2),
    ne AS (SELECT w.* FROM w LEFT JOIN e0
           ON w.x = e0.a AND w.y = e0.b WHERE e0.a IS NULL)
    SELECT ne.x AS id_a, ne.y AS id_b, cn AS common_neighbors,
           round(CAST(aa AS DOUBLE) / 1e6, 6) AS adamic_adar,
           round(CAST(cn AS DOUBLE) / (dx.d + dy.d - cn), 6)
             AS jaccard_nbr
    FROM ne JOIN deg dx ON ne.x = dx.z JOIN deg dy ON ne.y = dy.z
    """,
)
def q_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-prediction scores (common neighbors, Adamic-Adar,
    neighbor-Jaccard) for non-adjacent part pairs at distance 2 in
    the small-basket co-purchase graph
    (``operators/graph.py::adamic_adar``)."""
    from institutional_fx_etl_spark.operators.graph import adamic_adar

    return adamic_adar(
        _small_basket_edges(spark, sf_dir), min_common=2
    )


@register(
    "kcore_decomposition",
    f"""
    WITH {_SMALL_BASKET_EDGES},
    d1 AS (SELECT n, count(*) AS d FROM
           (SELECT a AS n FROM e0 UNION ALL SELECT b FROM e0)
           GROUP BY n),
    k1 AS (SELECT n FROM d1 WHERE d >= 2),
    e1 AS (SELECT a, b FROM e0 WHERE a IN (SELECT n FROM k1)
           AND b IN (SELECT n FROM k1)),
    d2 AS (SELECT n, count(*) AS d FROM
           (SELECT a AS n FROM e1 UNION ALL SELECT b FROM e1)
           GROUP BY n),
    k2 AS (SELECT n FROM d2 WHERE d >= 2),
    e2 AS (SELECT a, b FROM e1 WHERE a IN (SELECT n FROM k2)
           AND b IN (SELECT n FROM k2)),
    d3 AS (SELECT n, count(*) AS d FROM
           (SELECT a AS n FROM e2 UNION ALL SELECT b FROM e2)
           GROUP BY n),
    k3 AS (SELECT n FROM d3 WHERE d >= 2),
    e3 AS (SELECT a, b FROM e2 WHERE a IN (SELECT n FROM k3)
           AND b IN (SELECT n FROM k3))
    SELECT n AS node, count(*) AS degree FROM
    (SELECT a AS n FROM e3 UNION ALL SELECT b FROM e3)
    GROUP BY n HAVING count(*) >= 2
    """,
)
def q_kcore_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the small-basket co-purchase graph via 3 synchronous
    peel rounds (fixed-round static DAG, oracle unrolls identical
    CTEs) (``operators/graph.py::kcore_decomposition``)."""
    from institutional_fx_etl_spark.operators.graph import (
        kcore_decomposition,
    )

    return kcore_decomposition(
        _small_basket_edges(spark, sf_dir), k=2, rounds=3
    )


@register(
    "clustering_coefficient",
    f"""
    WITH {_SMALL_BASKET_EDGES},
    tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
            FROM e0 e1 JOIN e0 e2 ON e1.b = e2.a
            JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b),
    corners AS (SELECT x AS n FROM tri UNION ALL SELECT y FROM tri
                UNION ALL SELECT z FROM tri),
    tc AS (SELECT n, count(*) AS triangles FROM corners GROUP BY n),
    deg AS (SELECT n, count(*) AS d FROM
            (SELECT a AS n FROM e0 UNION ALL SELECT b FROM e0)
            GROUP BY n)
    SELECT deg.n AS node, d AS degree,
           coalesce(triangles, 0) AS triangles,
           round(CAST(2 * coalesce(triangles, 0) AS DOUBLE)
                 / (CAST(d AS DOUBLE) * (d - 1)), 6) AS lcc
    FROM deg LEFT JOIN tc ON deg.n = tc.n WHERE d >= 2
    """,
)
def q_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient of the small-basket
    co-purchase graph — degree-oriented compact-forward triangle
    corners over C(deg,2), integer-exact until the final division
    (``operators/graph.py::clustering_coefficient``)."""
    from institutional_fx_etl_spark.operators.graph import (
        clustering_coefficient,
    )

    return clustering_coefficient(_small_basket_edges(spark, sf_dir))


@register(
    "roll_spread",
    """
    WITH s AS (
      SELECT event_type, ts, event_id, value FROM events
      WHERE value IS NOT NULL
    ),
    d AS (
      SELECT event_type, ts, event_id,
             CAST(floor((value - lag(value) OVER w) * 1e6 + 0.5)
                  AS BIGINT) AS dm
      FROM s WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    ),
    d2 AS (
      SELECT event_type, dm,
             lag(dm) OVER (PARTITION BY event_type
                           ORDER BY ts, event_id) AS dp
      FROM d
    ),
    p AS (SELECT * FROM d2 WHERE dm IS NOT NULL AND dp IS NOT NULL),
    a AS (
      SELECT event_type, count(*) AS n_pairs,
             SUM(CAST(dm AS DECIMAL(38,0)) * CAST(dp AS DECIMAL(38,0)))
               AS sxy,
             SUM(CAST(dm AS DECIMAL(38,0))) AS sx,
             SUM(CAST(dp AS DECIMAL(38,0))) AS sy
      FROM p GROUP BY event_type
    ),
    c AS (
      SELECT event_type, n_pairs,
             CAST(CAST(n_pairs AS DECIMAL(38,0)) * sxy - sx * sy
                  AS DOUBLE)
               / (CAST(n_pairs AS DOUBLE) * n_pairs) / 1e12 AS cov
      FROM a
    )
    SELECT event_type, n_pairs, round(cov, 6) AS autocov,
           CASE WHEN cov < 0 THEN round(2 * sqrt(-cov), 6)
                ELSE NULL END AS roll_spread
    FROM c
    """,
)
def q_roll_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Roll (1984) effective-spread estimator per event_type —
    2·sqrt(−cov(Δp_t, Δp_{t−1})) with micro-unit integer covariance
    sums (``operators/timeseries.py::roll_spread``)."""
    from institutional_fx_etl_spark.operators.timeseries import roll_spread

    ev = load_table(spark, sf_dir, "events").filter("value IS NOT NULL")
    return roll_spread(ev, "value", ("ts", "event_id"), ("event_type",))


@register(
    "parkinson_vol",
    """
    WITH g AS (
      SELECT event_type, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS d,
             count(*) AS n_ticks, max(value) AS hi, min(value) AS lo
      FROM events WHERE value IS NOT NULL AND value > 0
      GROUP BY event_type, CAST(CAST(ts AS DATE) AS TIMESTAMP)
    )
    SELECT event_type, d, n_ticks, hi, lo,
           round(sqrt(pow(ln(hi / lo), 2) / (4 * ln(2))), 6)
             AS park_vol
    FROM g
    """,
)
def q_parkinson_vol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parkinson (1980) range-based volatility per (event_type, day)
    — exact max/min aggregate, one mirrored ln/sqrt expression
    (``operators/timeseries.py::parkinson_vol``)."""
    from institutional_fx_etl_spark.operators.timeseries import (
        parkinson_vol,
    )

    ev = load_table(spark, sf_dir, "events")
    return parkinson_vol(ev, "value", "ts", ("event_type",))


@register(
    "theil_sen",
    """
    WITH s AS (
      SELECT event_type, ts, event_id, CAST(value AS DOUBLE) AS y
      FROM events WHERE value IS NOT NULL
    ),
    r AS (
      -- floor(epoch()) pins DuckDB's double->bigint cast (round
      -- half-to-even) to Spark's to_unix_timestamp floor semantics
      -- on fractional-second timestamps (r13 ADVICE)
      SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS x, y,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS rn
      FROM s
    ),
    p AS (SELECT * FROM r WHERE rn <= 200),
    sl AS (
      SELECT a.event_type,
             CAST(floor((b.y - a.y) / (b.x - a.x) * 1e6 + 0.5)
                  AS BIGINT) AS sm
      FROM p a JOIN p b ON a.event_type = b.event_type
        AND a.rn < b.rn AND a.x <> b.x
    ),
    m AS (
      SELECT event_type, sm,
             row_number() OVER (PARTITION BY event_type ORDER BY sm)
               AS rk,
             count(*) OVER (PARTITION BY event_type) AS np
      FROM sl
    ),
    med AS (
      SELECT event_type, np AS n_pairs,
             round(CAST(sm AS DOUBLE) / 1e6, 6) AS ts_slope
      FROM m WHERE rk = (np + 1) // 2
    ),
    npts AS (SELECT event_type, count(*) AS n_points FROM p
             GROUP BY event_type)
    SELECT event_type, n_points,
           CAST(coalesce(n_pairs, 0) AS BIGINT) AS n_pairs, ts_slope
    FROM npts LEFT JOIN med USING (event_type)
    """,
)
def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per event_type: lower median of
    pairwise micro-slopes over the earliest 200 points (capped
    quadratic, documented) —
    (``operators/timeseries.py::theil_sen_slope``)."""
    from institutional_fx_etl_spark.operators.timeseries import (
        theil_sen_slope,
    )

    ev = load_table(spark, sf_dir, "events")
    return theil_sen_slope(
        ev, "value", "ts", ("ts", "event_id"), ("event_type",),
        max_points=200,
    )


import re as _re

# DuckDB has no ``D`` double-literal suffix; dropping it is value-
# preserving there (a DECIMAL literal promotes to the identical
# nearest double the moment it meets a double operand).
_BH_P_ORACLE = _re.sub(
    r"(\d)D\b",
    r"\1",
    NORMAL_SF_TWO_SIDED.replace(
        "(zz)",
        "(abs(CAST(2 * k_above - n AS DOUBLE))"
        " / sqrt(CAST(n AS DOUBLE)))",
    ),
)


@register(
    "fdr_bh",
    f"""
    WITH v AS (SELECT event_type, value FROM events
               WHERE value IS NOT NULL),
    gm AS (SELECT SUM(CAST(floor(value * 1e6 + 0.5) AS DECIMAL(38,0)))
                    AS s,
                  count(*) AS nn FROM v),
    c AS (
      SELECT event_type, count(*) AS n,
             CAST(SUM(CASE WHEN CAST(floor(value * 1e6 + 0.5)
                                AS DECIMAL(38,0)) * nn > s
                      THEN 1 ELSE 0 END) AS BIGINT) AS k_above
      FROM v, gm GROUP BY event_type
    ),
    sc AS (
      SELECT event_type, n, k_above,
             round(CAST(2 * k_above - n AS DOUBLE)
                   / sqrt(CAST(n AS DOUBLE)), 6) AS z,
             CAST(floor(least(1.0, {_BH_P_ORACLE}) * 1e6 + 0.5)
                  AS BIGINT) AS pm
      FROM c
    ),
    rk AS (
      SELECT sc.*, row_number() OVER (ORDER BY pm, event_type)
               AS bh_rank,
             count(*) OVER () AS m
      FROM sc
    ),
    cut AS (
      SELECT rk.*, max(CASE WHEN pm * m * 100 <= bh_rank * 5 * 1000000
                        THEN bh_rank ELSE 0 END) OVER () AS cutoff
      FROM rk
    )
    SELECT event_type, n, k_above, z,
           round(CAST(pm AS DOUBLE) / 1e6, 6) AS p_value,
           bh_rank, bh_rank <= cutoff AS reject
    FROM cut
    """,
)
def q_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control (α=0.05) over per-event_type
    sign tests against the global mean — exact integer step-up
    frontier, shared normal-CDF polynomial
    (``operators/profiling.py::fdr_bh``)."""
    from institutional_fx_etl_spark.operators.profiling import fdr_bh

    ev = load_table(spark, sf_dir, "events")
    return fdr_bh(ev, "event_type", "value", alpha_pct=5)


@register(
    "t_closeness",
    """
    WITH d AS (SELECT event_type, CAST(user_id % 7 AS INT) AS sv
               FROM events),
    cell AS (SELECT event_type, sv, count(*) AS c FROM d
             GROUP BY event_type, sv),
    gs AS (SELECT event_type, count(*) AS ng FROM d GROUP BY event_type),
    gv AS (SELECT sv, count(*) AS cv FROM d GROUP BY sv),
    tt AS (SELECT count(*) AS n FROM d),
    agg AS (
      SELECT cell.event_type,
             SUM(abs(CAST(c AS DECIMAL(38,0)) * n
                     - CAST(cv AS DECIMAL(38,0)) * ng))
               AS present,
             CAST(SUM(cv) AS DECIMAL(38,0)) AS sg,
             MAX(ng) AS ng, MAX(n) AS n, count(*) AS n_values
      FROM cell JOIN gv USING (sv) JOIN gs USING (event_type), tt
      GROUP BY cell.event_type
    )
    SELECT event_type, ng AS n_rows, n_values,
           round(CAST(present + CAST((n - sg) AS DECIMAL(38,0)) * ng
                      AS DOUBLE) / (2.0 * ng * n), 6) AS t_closeness
    FROM agg
    """,
)
def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness (total-variation distance to the global
    sensitive-value distribution) per event_type with user_id%7 as
    the sensitive attribute — the disclosure audit after k-anonymity
    and l-diversity (``operators/profiling.py::t_closeness``)."""
    from institutional_fx_etl_spark.operators.profiling import t_closeness

    ev = load_table(spark, sf_dir, "events").selectExpr(
        "event_type", "CAST(user_id % 7 AS INT) AS sv"
    )
    return t_closeness(ev, ["event_type"], "sv")


@register(
    "matryoshka_recall",
    """
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv
               FROM embeddings),
    n AS (SELECT vec_id, vv, sqrt(list_dot_product(vv, vv)) AS nv
          FROM v),
    q AS (SELECT vec_id AS q_id, vv AS qv, nv AS nq FROM n
          WHERE vec_id < 8),
    s AS (SELECT q_id, n.vec_id,
                 round(list_dot_product(vv, qv) / (nv * nq), 6)
                   AS cosine
          FROM n CROSS JOIN q),
    rf AS (SELECT q_id, vec_id,
                  row_number() OVER (PARTITION BY q_id
                    ORDER BY cosine DESC, vec_id) AS rk FROM s),
    tf AS (SELECT q_id, vec_id FROM rf WHERE rk <= 10),
    tv AS (SELECT vec_id, vv[1:16] AS tvv FROM v),
    tn AS (SELECT vec_id, tvv,
                  sqrt(list_dot_product(tvv, tvv)) AS ntv FROM tv),
    tq AS (SELECT vec_id AS q_id, tvv AS qv, ntv AS nq FROM tn
           WHERE vec_id < 8),
    ts AS (SELECT q_id, tn.vec_id,
                  round(list_dot_product(tvv, qv) / (ntv * nq), 6)
                    AS cosine
           FROM tn CROSS JOIN tq),
    tr AS (SELECT q_id, vec_id,
                  row_number() OVER (PARTITION BY q_id
                    ORDER BY cosine DESC, vec_id) AS rk FROM ts),
    tt AS (SELECT q_id, vec_id FROM tr WHERE rk <= 10),
    h AS (SELECT q_id, count(*) AS n_overlap
          FROM tf JOIN tt USING (q_id, vec_id) GROUP BY q_id)
    SELECT qq.q_id, coalesce(n_overlap, 0) AS n_overlap,
           round(CAST(coalesce(n_overlap, 0) AS DOUBLE) / 10, 6)
             AS recall
    FROM (SELECT DISTINCT q_id FROM tf) qq LEFT JOIN h USING (q_id)
    """,
)
def q_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation diagnostic: recall@10 of 16-dim-prefix
    cosine top-k against full 64-dim top-k for 8 query vectors —
    both rankings exact brute force
    (``operators/similarity.py::matryoshka_recall``)."""
    from institutional_fx_etl_spark.operators.similarity import (
        matryoshka_recall,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return matryoshka_recall(
        emb, emb.filter("vec_id < 8"), trunc_dim=16, k=10
    )


def _bootstrap_ci_oracle(b: int = 40) -> str:
    """DuckDB mirror of ``bootstrap_ci_mean`` with the CI ranks derived
    from the SAME ``⌊B·0.025⌋+1`` formula the operator uses (r12
    ADVICE: the previous literal ranks were only valid at B=40), plus
    the matching <2·r_lo NULL-bounds clamp."""
    r_lo = b // 40 + 1
    return f"""
    WITH v AS (
      SELECT event_type,
             CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vm,
             event_id
      FROM events WHERE value IS NOT NULL
    ),
    rep AS (
      SELECT event_type, vm, t.b,
             CAST(concat('0x', substr(md5(concat('boot',
               CAST(event_id AS STRING), ':',
               CAST(t.b // 10 AS STRING))),
               1 + 3 * (t.b % 10), 3)) AS BIGINT) AS u
      FROM v CROSS JOIN range({b}) t(b)
    ),
    mm AS (
      SELECT event_type, vm, b,
             CASE WHEN u < 1507 THEN 0 WHEN u < 3014 THEN 1
                  WHEN u < 3767 THEN 2 WHEN u < 4018 THEN 3
                  ELSE 4 END AS m
      FROM rep
    ),
    agg AS (
      SELECT event_type, b,
             CAST(floor(CAST(SUM(CAST(vm * m AS DECIMAL(38,0)))
                  AS DOUBLE) / CAST(SUM(m) AS BIGINT) + 0.5)
                  AS BIGINT) AS mean_m
      FROM mm WHERE m > 0 GROUP BY event_type, b
    ),
    rk AS (
      SELECT event_type, mean_m,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY mean_m, b) AS rk,
             count(*) OVER (PARTITION BY event_type) AS nb
      FROM agg
    ),
    lo AS (SELECT event_type,
                  CASE WHEN nb >= {2 * r_lo} THEN
                    round(CAST(mean_m AS DOUBLE) / 1e6, 6) END AS ci_lo,
                  nb AS n_resamples
           FROM rk WHERE rk = least({r_lo}, nb)),
    hi AS (SELECT event_type,
                  CASE WHEN nb >= {2 * r_lo} THEN
                    round(CAST(mean_m AS DOUBLE) / 1e6, 6) END AS ci_hi
           FROM rk WHERE rk = greatest(nb - {r_lo} + 1, 1)),
    point AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                     round(CAST(SUM(CAST(vm AS DECIMAL(38,0)))
                           AS DOUBLE) / count(*) / 1e6, 6) AS mean
              FROM v GROUP BY event_type)
    SELECT event_type, n, mean, ci_lo, ci_hi, n_resamples
    FROM point JOIN lo USING (event_type) JOIN hi USING (event_type)
    """


@register(
    "bootstrap_ci_mean",
    _bootstrap_ci_oracle(40),
)
def q_bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Poisson-bootstrap 95% CI for the per-event_type
    mean (B=40 md5-seeded replicas, 2nd/39th order statistics) —
    the distribution-free error bar for segment statistics
    (``operators/profiling.py::bootstrap_ci_mean``)."""
    from institutional_fx_etl_spark.operators.profiling import (
        bootstrap_ci_mean,
    )

    ev = load_table(spark, sf_dir, "events")
    return bootstrap_ci_mean(
        ev, "event_type", "value", "event_id", n_resamples=40
    )


@register(
    "herfindahl_concentration",
    """
    WITH cell AS (
      SELECT lang, source, count(*) AS c FROM documents
      GROUP BY lang, source
    ),
    g AS (
      SELECT lang, CAST(SUM(c) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_members,
             SUM(CAST(c AS DECIMAL(38,0)) * c) AS ss
      FROM cell GROUP BY lang
    )
    SELECT lang, n_rows, n_members,
           round(CAST(ss AS DOUBLE)
                 / (CAST(n_rows AS DOUBLE) * n_rows), 6) AS hhi,
           round(CAST(n_rows AS DOUBLE) * n_rows
                 / CAST(ss AS DOUBLE), 6) AS effective_members
    FROM g
    """,
)
def q_herfindahl_concentration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Herfindahl-Hirschman source concentration per language — is a
    language slice dominated by one source? Exact integer share
    arithmetic, two chained aggregates
    (``operators/profiling.py::herfindahl_concentration``)."""
    from institutional_fx_etl_spark.operators.profiling import (
        herfindahl_concentration,
    )

    docs = load_table(spark, sf_dir, "documents")
    return herfindahl_concentration(docs, "lang", "source")



@register(
    "garman_klass_vol",
    """
    WITH g AS (
      SELECT event_type, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS d,
             count(*) AS n_ticks,
             first(value ORDER BY ts, event_id) AS o,
             max(value) AS hi, min(value) AS lo,
             last(value ORDER BY ts, event_id) AS c
      FROM events WHERE value IS NOT NULL AND value > 0
      GROUP BY event_type, CAST(CAST(ts AS DATE) AS TIMESTAMP)
    )
    SELECT event_type, d, n_ticks, o, hi, lo, c,
           round(sqrt(0.5 * pow(ln(hi / lo), 2)
                 - (2 * ln(2) - 1) * pow(ln(c / o), 2)), 6) AS gk_vol
    FROM g
    """,
)
def q_garman_klass_vol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Garman-Klass OHLC range volatility per (event_type, day) —
    min_by/max_by ordered open/close picks plus one mirrored
    ln/sqrt expression, ~7.4x the efficiency of close-to-close
    variance (``operators/timeseries.py::garman_klass_vol``)."""
    from institutional_fx_etl_spark.operators.timeseries import (
        garman_klass_vol,
    )

    ev = load_table(spark, sf_dir, "events")
    return garman_klass_vol(
        ev, "value", "ts", ("ts", "event_id"), ("event_type",)
    )


@register(
    "var_cvar",
    """
    WITH s AS (
      SELECT event_type, ts, event_id, value FROM events
      WHERE value IS NOT NULL
    ),
    d AS (
      SELECT event_type, ts, event_id,
             CAST(floor((value - lag(value) OVER
               (PARTITION BY event_type ORDER BY ts, event_id))
               * 1e6 + 0.5) AS BIGINT) AS dm
      FROM s
    ),
    p AS (SELECT * FROM d WHERE dm IS NOT NULL),
    r AS (
      SELECT event_type, dm,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY dm, ts, event_id) AS rk,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM p
    ),
    k AS (SELECT *, (n * 5 + 99) // 100 AS kt FROM r),
    a AS (
      SELECT event_type,
             CAST(max(n) AS BIGINT) AS n_returns,
             CAST(max(kt) AS BIGINT) AS k_tail,
             max(CASE WHEN rk = kt THEN dm END) AS var_m,
             SUM(CASE WHEN rk <= kt THEN CAST(dm AS DECIMAL(38,0))
                 ELSE CAST(0 AS DECIMAL(38,0)) END) AS tail_sum
      FROM k GROUP BY event_type
    )
    SELECT event_type, n_returns, k_tail,
           round(-CAST(var_m AS DOUBLE) / 1e6, 6) + 0.0 AS var_loss,
           round(-(CAST(tail_sum AS DOUBLE) / k_tail) / 1e6, 6)
             + 0.0 AS cvar_loss
    FROM a
    """,
)
def q_var_cvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Historical VaR(5%) + CVaR (expected shortfall) of per-tick
    micro-moves per event_type — exact integer order statistics,
    DECIMAL-exact tail mean
    (``operators/timeseries.py::var_cvar``)."""
    from institutional_fx_etl_spark.operators.timeseries import var_cvar

    ev = load_table(spark, sf_dir, "events")
    return var_cvar(
        ev, "value", ("ts", "event_id"), ("event_type",), alpha_pct=5
    )


@register(
    "kendall_tau",
    """
    WITH s AS (
      SELECT event_type, ts, event_id, value FROM events
      WHERE value IS NOT NULL
    ),
    r AS (
      -- floor(epoch()) pins DuckDB's double->bigint cast (round
      -- half-to-even) to Spark's to_unix_timestamp floor semantics
      -- on fractional-second timestamps (r13 ADVICE)
      SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS x,
             CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS y,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS rn
      FROM s
    ),
    p AS (SELECT * FROM r WHERE rn <= 200),
    pr AS (
      SELECT a.event_type,
             CAST(sign(b.x - a.x) AS BIGINT) AS sx,
             CAST(sign(b.y - a.y) AS BIGINT) AS sy
      FROM p a JOIN p b ON a.event_type = b.event_type
        AND a.rn < b.rn
    ),
    st AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(SUM(CASE WHEN sx * sy > 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS concordant,
             CAST(SUM(CASE WHEN sx * sy < 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS discordant,
             CAST(SUM(CASE WHEN sx = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS tx,
             CAST(SUM(CASE WHEN sy = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS ty
      FROM pr GROUP BY event_type
    ),
    np AS (SELECT event_type, count(*) AS n_points FROM p
           GROUP BY event_type)
    SELECT event_type, n_points,
           CAST(coalesce(n_pairs, 0) AS BIGINT) AS n_pairs,
           CAST(coalesce(concordant, 0) AS BIGINT) AS concordant,
           CAST(coalesce(discordant, 0) AS BIGINT) AS discordant,
           CASE WHEN coalesce(n_pairs, 0) - coalesce(tx, 0) > 0
                 AND coalesce(n_pairs, 0) - coalesce(ty, 0) > 0 THEN
             round((concordant - discordant)
                   / sqrt(CAST(n_pairs - tx AS DOUBLE)
                          * CAST(n_pairs - ty AS DOUBLE)), 6) + 0.0
           END AS tau_b
    FROM np LEFT JOIN st USING (event_type)
    """,
)
def q_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b (tie-corrected) between time and value per
    event_type over the earliest 200 points — exact integer
    concordance counts, capped quadratic like theil_sen
    (``operators/timeseries.py::kendall_tau``)."""
    from institutional_fx_etl_spark.operators.timeseries import (
        kendall_tau,
    )

    ev = load_table(spark, sf_dir, "events")
    return kendall_tau(
        ev, "value", "ts", ("ts", "event_id"), ("event_type",),
        max_points=200,
    )


@register(
    "dp_count_laplace",
    """
    WITH g AS (
      SELECT lang, source, CAST(count(*) AS BIGINT) AS n_true
      FROM documents GROUP BY lang, source
    ),
    u AS (
      -- md5 per component before joining: injective over the group
      -- tuple even when values contain '|' (r13 ADVICE)
      SELECT lang, source, n_true,
             (CAST(concat('0x', substr(md5(concat_ws('|', 'dp',
                md5(CAST(lang AS VARCHAR)),
                md5(CAST(source AS VARCHAR)))), 1, 15)) AS BIGINT)
              + 0.5)
             / 1152921504606846976.0 AS uu
      FROM g
    )
    SELECT lang, source, n_true, CAST(1.0 AS DOUBLE) AS epsilon,
           round(n_true + (CASE WHEN uu < 0.5 THEN 1.0 * ln(2 * uu)
                 ELSE -1.0 * ln(2 - 2 * uu) END), 6) + 0.0
             AS dp_count
    FROM u
    """,
)
def q_dp_count_laplace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """epsilon-DP (lang, source) document counts via the Laplace
    mechanism with md5-seeded deterministic noise (testing-grade
    reproducibility, documented) —
    (``operators/profiling.py::dp_count_laplace``)."""
    from institutional_fx_etl_spark.operators.profiling import (
        dp_count_laplace,
    )

    docs = load_table(spark, sf_dir, "documents")
    return dp_count_laplace(docs, ["lang", "source"], epsilon=1.0)


def _register_ccnet_bucket() -> None:
    """ccnet_perplexity_bucket composes the registered bigram LM
    oracle as a CTE (the dedup_weights composite-oracle pattern) and
    adds the integer-predicate tercile cuts on top."""
    lm = REGISTRY["bigram_lm_score"][1]
    oracle = f"""
    WITH scored AS ({lm}),
    dist AS (SELECT perplexity, count(*) AS c FROM scored
             GROUP BY perplexity),
    cum AS (SELECT perplexity,
                   SUM(c) OVER (ORDER BY perplexity) AS cum
            FROM dist),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM scored),
    cuts AS (
      SELECT min(CASE WHEN cum * 3 >= n THEN perplexity END) AS v1,
             min(CASE WHEN cum * 3 >= 2 * n THEN perplexity END) AS v2
      FROM cum, tot
    )
    SELECT doc_id, n_bigrams, perplexity,
           CASE WHEN perplexity <= v1 THEN 'head'
                WHEN perplexity <= v2 THEN 'middle'
                ELSE 'tail' END AS ppl_bucket
    FROM scored, cuts
    """

    @register("ccnet_perplexity_bucket", oracle)
    def q_ccnet_perplexity_bucket(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """CCNet-style head/middle/tail perplexity terciles over the
        corpus-fit bigram LM — threshold cuts from exact order
        statistics without a global sort
        (``operators/text.py::ccnet_perplexity_bucket``)."""
        from institutional_fx_etl_spark.operators.text import (
            ccnet_perplexity_bucket,
        )

        return ccnet_perplexity_bucket(
            load_table(spark, sf_dir, "documents")
        )


_register_ccnet_bucket()


def _ivfpq_probe_report_oracle(
    nprobe: int = 2, max_cell: int = 512
) -> str:
    """DuckDB mirror of ``ivfpq_probe_report``: the ivfpq assignment
    + probe CTEs, then pure integer cell accounting."""
    from institutional_fx_etl_spark.operators.similarity import (
        _ADC_QUERY,
    )

    qlit = "[" + ", ".join(repr(x) for x in _ADC_QUERY) + "]"
    return f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv
               FROM embeddings),
    cents AS (SELECT vec_id AS cid, vv AS cv FROM v WHERE vec_id < 8),
    scored AS (
      SELECT v.vec_id AS vid, c.cid,
             round(list_dot_product(v.vv, c.cv)
                   / (sqrt(list_dot_product(v.vv, v.vv))
                      * sqrt(list_dot_product(c.cv, c.cv))), 6) AS ccos
      FROM v CROSS JOIN cents c
    ),
    assigned AS (
      SELECT vid, cid FROM (
        SELECT *, row_number() OVER
          (PARTITION BY vid ORDER BY ccos DESC, cid) AS rn
        FROM scored) WHERE rn = 1
    ),
    probe AS (
      SELECT cid FROM (
        SELECT cid,
               round(list_dot_product(cv, {qlit})
                     / (sqrt(list_dot_product(cv, cv))
                        * sqrt(list_dot_product({qlit}, {qlit}))), 6)
                 AS ccos
        FROM cents
      ) ORDER BY ccos DESC, cid LIMIT {nprobe}
    ),
    sizes AS (SELECT cid, count(*) AS n FROM assigned GROUP BY cid),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_corpus,
                   CAST(count(DISTINCT cid) AS BIGINT) AS n_cells
            FROM assigned),
    pr AS (SELECT s.cid, s.n FROM sizes s JOIN probe USING (cid)),
    a AS (
      -- coalesce mirrors the Spark side's empty-probe discipline
      -- (r13 ADVICE): NULL aggregates over an empty pr become 0
      SELECT CAST(count(*) AS BIGINT) AS n_cells_probed,
             CAST(coalesce(SUM(n), 0) AS BIGINT) AS n_probed_rows,
             CAST(coalesce(MAX(n), 0) AS BIGINT) AS max_probed_cell,
             CAST(coalesce(SUM(CASE WHEN n > {max_cell} THEN 1
                                    ELSE 0 END), 0)
                  AS BIGINT) AS n_probed_over_cap,
             CAST(coalesce(SUM(CASE WHEN n > {max_cell} THEN n
                                    ELSE 0 END), 0)
                  AS BIGINT) AS rows_skipped_by_cap
      FROM pr
    )
    SELECT n_corpus, n_cells, n_cells_probed, n_probed_rows,
           CASE WHEN n_corpus > 0 THEN
             round(CAST(n_probed_rows AS DOUBLE) / n_corpus, 6)
           ELSE CAST(0 AS DOUBLE) END AS probed_fraction,
           max_probed_cell, n_probed_over_cap, rows_skipped_by_cap
    FROM a, tot
    """


@register("ivfpq_probe_report", _ivfpq_probe_report_oracle())
def q_ivfpq_probe_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probed-fraction + hot-cell cap accounting for the IVF-PQ scan
    (r12 verdict task #5): how much of the corpus the ADC stage
    touches for this query, and what a max_cell=512 cap would skip —
    the skew cost made visible before the wall clock finds it
    (``operators/similarity.py::ivfpq_probe_report``)."""
    from institutional_fx_etl_spark.operators.similarity import (
        ivfpq_probe_report,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return ivfpq_probe_report(
        emb, num_centroids=8, nprobe=2, max_cell=512
    )


# ---------------------------------------------------------------------
# Round-14 debuts
# ---------------------------------------------------------------------


@register(
    "asof_join_nearest_tolerance",
    """
    WITH trades AS (
      SELECT event_id, ts, value FROM events WHERE event_type = 'purchase'
    ),
    quotes AS (
      -- one row per ts: equal-timestamp right rows resolve to the max
      -- payload on the Spark side; collapsing them here keeps the
      -- DuckDB ASOF tie behavior out of the contract
      SELECT ts, max(value) AS quote
      FROM events WHERE event_type = 'view' GROUP BY ts
    ),
    j AS (
      SELECT t.event_id, t.ts, t.value,
             b.ts AS bts, b.quote AS bquote,
             f.ts AS fts, f.quote AS fquote
      FROM trades t
      ASOF LEFT JOIN quotes b ON t.ts >= b.ts
      ASOF LEFT JOIN quotes f ON t.ts <= f.ts
    ),
    m AS (
      -- tolerance mask per side: the ASOF row is the only candidate
      -- on its side, so masking it == never matching (merge_asof)
      SELECT event_id, ts, value,
             CASE WHEN bts IS NOT NULL
                   AND epoch(ts) - epoch(bts) <= 900.0
                  THEN bts END AS bts,
             CASE WHEN bts IS NOT NULL
                   AND epoch(ts) - epoch(bts) <= 900.0
                  THEN bquote END AS bquote,
             CASE WHEN fts IS NOT NULL
                   AND epoch(fts) - epoch(ts) <= 900.0
                  THEN fts END AS fts,
             CASE WHEN fts IS NOT NULL
                   AND epoch(fts) - epoch(ts) <= 900.0
                  THEN fquote END AS fquote
      FROM j
    )
    SELECT event_id, ts, value,
           CASE WHEN bts IS NULL THEN fquote
                WHEN fts IS NULL THEN bquote
                WHEN epoch(ts) - epoch(bts) <= epoch(fts) - epoch(ts)
                  THEN bquote ELSE fquote END AS quote_tol,
           CASE WHEN bts IS NULL THEN fts
                WHEN fts IS NULL THEN bts
                WHEN epoch(ts) - epoch(bts) <= epoch(fts) - epoch(ts)
                  THEN bts ELSE fts END AS quote_ts_tol
    FROM m
    """,
)
def q_asof_join_nearest_tolerance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``merge_asof(direction='nearest', tolerance=900s)``: each
    purchase takes the time-closest view quote on either side, but
    only within 15 minutes — out-of-tolerance purchases keep NULL
    quote columns (``operators/asof.py::asof_join_tolerance``). The
    oracle is a backward + forward DuckDB ASOF pair with per-side
    tolerance masks resolved by distance."""
    from institutional_fx_etl_spark.operators.asof import (
        asof_join_tolerance,
    )

    ev = load_table(spark, sf_dir, "events")
    trades = ev.filter("event_type = 'purchase'").select(
        "event_id", "ts", "value"
    )
    quotes = (
        ev.filter("event_type = 'view'")
        .groupBy("ts")
        .agg(F.expr("max(value) AS quote"))
        .selectExpr("ts", "quote", "ts AS quote_ts")
    )
    out = asof_join_tolerance(
        trades,
        quotes,
        ts_col="ts",
        right_cols=("quote", "quote_ts"),
        tolerance_s=900.0,
        direction="nearest",
        suffix="_tol",
    )
    return out.selectExpr(
        "event_id", "ts", "value", "quote_tol", "quote_ts_tol"
    )


@register(
    "welch_ttest",
    """
    WITH x AS (
      SELECT CASE WHEN event_type = 'view' THEN 0 ELSE 1 END AS g,
             CAST(floor(value * 1e6 + 0.5) AS DECIMAL(18,0)) AS v
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('view', 'purchase')
    ),
    grp AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n_g,
             SUM(v) AS s_g, SUM(v * v) AS q_g
      FROM x GROUP BY 1
    ),
    stats AS (
      SELECT g, n_g,
             (CAST(s_g AS DOUBLE) / 1e6) / CAST(n_g AS DOUBLE) AS m_g,
             (CAST(q_g AS DOUBLE) / 1e12
              - CAST(n_g AS DOUBLE)
                * (((CAST(s_g AS DOUBLE) / 1e6) / CAST(n_g AS DOUBLE))
                   * ((CAST(s_g AS DOUBLE) / 1e6)
                      / CAST(n_g AS DOUBLE))))
             / CAST(n_g - 1 AS DOUBLE) AS v_g
      FROM grp
    ),
    wide AS (
      SELECT MAX(CASE WHEN g = 0 THEN n_g END) AS n_a,
             MAX(CASE WHEN g = 1 THEN n_g END) AS n_b,
             MAX(CASE WHEN g = 0 THEN m_g END) AS m_a,
             MAX(CASE WHEN g = 1 THEN m_g END) AS m_b,
             MAX(CASE WHEN g = 0 THEN v_g END) AS v_a,
             MAX(CASE WHEN g = 1 THEN v_g END) AS v_b
      FROM stats
    )
    SELECT n_a, n_b,
           round(m_a, 6) AS mean_a,
           round(m_b, 6) AS mean_b,
           round(v_a, 6) AS var_a,
           round(v_b, 6) AS var_b,
           round((m_a - m_b)
                 / sqrt(v_a / CAST(n_a AS DOUBLE)
                        + v_b / CAST(n_b AS DOUBLE)), 6) + 0.0
             AS t_stat,
           round(((v_a / CAST(n_a AS DOUBLE) + v_b / CAST(n_b AS DOUBLE))
                  * (v_a / CAST(n_a AS DOUBLE)
                     + v_b / CAST(n_b AS DOUBLE)))
                 / ((v_a / CAST(n_a AS DOUBLE))
                    * (v_a / CAST(n_a AS DOUBLE))
                    / CAST(n_a - 1 AS DOUBLE)
                    + (v_b / CAST(n_b AS DOUBLE))
                      * (v_b / CAST(n_b AS DOUBLE))
                      / CAST(n_b - 1 AS DOUBLE)), 6) AS dof
    FROM wide
    """,
)
def q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t statistic + Welch–Satterthwaite dof
    between 'view' and 'purchase' event values — the pairwise
    follow-up to anova_oneway
    (``operators/profiling.py::welch_ttest``)."""
    from institutional_fx_etl_spark.operators.profiling import welch_ttest

    ev = load_table(spark, sf_dir, "events")
    return welch_ttest(ev, "value", "event_type", "view", "purchase")


@register(
    "corpus_flagship",
    r"""
    WITH t AS (
      SELECT doc_id, text, string_split_regex(lower(text), '\s+') AS toks
      FROM documents
    ),
    tr AS (
      SELECT doc_id, text, CAST(len(toks) AS BIGINT) AS nt,
             length(text) AS nc, toks
      FROM t WHERE NOT (doc_id % 20 = 0)
    ),
    eval_g AS (
      SELECT DISTINCT concat_ws(' ', toks[i], toks[i+1], toks[i+2]) AS g
      FROM t, unnest(range(1, len(toks) - 1)) AS u(i)
      WHERE doc_id % 20 = 0 AND len(toks) >= 3
    ),
    tg AS (
      SELECT DISTINCT doc_id,
             concat_ws(' ', toks[i], toks[i+1], toks[i+2]) AS g
      FROM tr, unnest(range(1, len(toks) - 1)) AS u(i)
      WHERE len(toks) >= 3
    ),
    per AS (
      SELECT tg.doc_id, count(*) AS n_ngrams,
             SUM(CASE WHEN e.g IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
      FROM tg LEFT JOIN eval_g e USING (g) GROUP BY tg.doc_id
    ),
    ratio AS (
      SELECT tr.doc_id,
             CASE WHEN coalesce(per.n_ngrams, 0) > 0
                  THEN round(CAST(coalesce(per.n_hit, 0) AS DOUBLE)
                             / coalesce(per.n_ngrams, 0), 6)
                  ELSE CAST(0 AS DOUBLE) END AS r
      FROM tr LEFT JOIN per USING (doc_id)
    ),
    s1 AS (
      SELECT tr.* FROM tr JOIN ratio USING (doc_id)
      WHERE r < CAST(0.5 AS DOUBLE)
    ),
    keep AS (SELECT min(doc_id) AS doc_id FROM s1 GROUP BY md5(text)),
    s2 AS (SELECT s1.* FROM s1 JOIN keep USING (doc_id)),
    s3 AS (
      SELECT * FROM s2
      WHERE nt BETWEEN 5 AND 10000
        AND CAST(nc AS DOUBLE) / nt <= CAST(12.0 AS DOUBLE)
    ),
    cum AS (
      SELECT doc_id, nt,
             SUM(nt) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED
                           PRECEDING AND CURRENT ROW) - nt AS cb
      FROM s3
    ),
    packs AS (
      SELECT cb // 256 AS pack_id, SUM(nt) AS ptok
      FROM cum GROUP BY 1
    )
    SELECT '00_input' AS stage, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(coalesce(SUM(nt), 0) AS BIGINT) AS n_tokens,
           CAST(coalesce(MAX(nt), 0) AS BIGINT) AS max_unit
    FROM tr
    UNION ALL
    SELECT '01_decontaminated', CAST(count(*) AS BIGINT),
           CAST(coalesce(SUM(nt), 0) AS BIGINT),
           CAST(coalesce(MAX(nt), 0) AS BIGINT)
    FROM s1
    UNION ALL
    SELECT '02_deduped', CAST(count(*) AS BIGINT),
           CAST(coalesce(SUM(nt), 0) AS BIGINT),
           CAST(coalesce(MAX(nt), 0) AS BIGINT)
    FROM s2
    UNION ALL
    SELECT '03_quality', CAST(count(*) AS BIGINT),
           CAST(coalesce(SUM(nt), 0) AS BIGINT),
           CAST(coalesce(MAX(nt), 0) AS BIGINT)
    FROM s3
    UNION ALL
    SELECT '04_packed', CAST(count(*) AS BIGINT),
           CAST(coalesce(SUM(ptok), 0) AS BIGINT),
           CAST(coalesce(MAX(ptok), 0) AS BIGINT)
    FROM packs
    """,
)
def q_corpus_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-14 flagship chain: graded 3-gram decontamination (drop
    overlap ≥ 0.5 vs the doc_id%20 held-out split) → exact md5 dedup
    → token-count/mean-length quality gate → concat-and-chunk packing
    at 256 tokens, released as a five-row audit ledger
    (``plans/corpus.py::corpus_flagship``)."""
    from institutional_fx_etl_spark.plans.corpus import corpus_flagship

    docs = load_table(spark, sf_dir, "documents")
    return corpus_flagship(docs)


@register(
    "ngram_overlap_contamination",
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
      FROM documents
    ),
    eval_g AS (
      SELECT DISTINCT concat_ws(' ', toks[i], toks[i+1], toks[i+2]) AS g
      FROM t, unnest(range(1, len(toks) - 1)) AS u(i)
      WHERE doc_id % 20 = 0 AND len(toks) >= 3
    ),
    train AS (SELECT doc_id, toks FROM t WHERE doc_id % 20 <> 0),
    tg AS (
      SELECT DISTINCT doc_id,
             concat_ws(' ', toks[i], toks[i+1], toks[i+2]) AS g
      FROM train, unnest(range(1, len(toks) - 1)) AS u(i)
      WHERE len(toks) >= 3
    ),
    per AS (
      SELECT tg.doc_id, CAST(count(*) AS BIGINT) AS n_ngrams,
             CAST(SUM(CASE WHEN e.g IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_hit
      FROM tg LEFT JOIN eval_g e USING (g) GROUP BY tg.doc_id
    ),
    alld AS (
      SELECT d.doc_id,
             CAST(coalesce(p.n_ngrams, 0) AS BIGINT) AS n_ngrams,
             CAST(coalesce(p.n_hit, 0) AS BIGINT) AS n_hit
      FROM (SELECT doc_id FROM train) d LEFT JOIN per p USING (doc_id)
    ),
    r AS (
      SELECT doc_id, n_ngrams, n_hit,
             CASE WHEN n_ngrams > 0
                  THEN round(CAST(n_hit AS DOUBLE)
                             / CAST(n_ngrams AS DOUBLE), 6)
                  ELSE CAST(0 AS DOUBLE) END AS overlap_ratio
      FROM alld
    )
    SELECT doc_id, n_ngrams, n_hit, overlap_ratio,
           CASE WHEN overlap_ratio >= CAST(0.5 AS DOUBLE) THEN 'dirty'
                WHEN overlap_ratio >= CAST(0.1 AS DOUBLE)
                  THEN 'suspect'
                ELSE 'clean' END AS verdict
    FROM r
    """,
)
def q_ngram_overlap_contamination(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Graded eval-contamination audit: fraction of each training
    doc's distinct word 3-grams present in the held-out split
    (doc_id % 20 == 0), classified clean/suspect/dirty at 0.1/0.5
    (``operators/text.py::ngram_overlap_contamination``)."""
    from institutional_fx_etl_spark.operators.text import (
        ngram_overlap_contamination,
    )

    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter("doc_id % 20 <> 0")
    bench = docs.filter("doc_id % 20 = 0")
    return ngram_overlap_contamination(train, bench, n=3)


@register(
    "kneser_ney_bigram",
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
      FROM documents
    ),
    bi AS (
      SELECT concat_ws(' ', toks[i], toks[i+1]) AS bg,
             toks[i] AS w1, toks[i+1] AS w2
      FROM t, unnest(range(1, len(toks))) AS u(i)
      WHERE len(toks) >= 2
    ),
    cb AS (
      SELECT bg, max(w1) AS w1, max(w2) AS w2,
             CAST(count(*) AS BIGINT) AS cb
      FROM bi GROUP BY bg
    ),
    cu AS (
      SELECT w1, CAST(SUM(cb) AS BIGINT) AS cu,
             CAST(count(*) AS BIGINT) AS n1f
      FROM cb GROUP BY w1
    ),
    bwd AS (
      SELECT w2, CAST(count(*) AS BIGINT) AS n1b FROM cb GROUP BY w2
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_types FROM cb)
    SELECT bg, cb,
           round(CAST(cb AS DOUBLE) / CAST(cu AS DOUBLE), 6) AS p_mle,
           round(greatest(CAST(cb AS DOUBLE) - CAST(0.75 AS DOUBLE),
                          CAST(0 AS DOUBLE)) / CAST(cu AS DOUBLE)
                 + ((CAST(0.75 AS DOUBLE) * CAST(n1f AS DOUBLE))
                    / CAST(cu AS DOUBLE))
                   * (CAST(n1b AS DOUBLE) / CAST(n_types AS DOUBLE)),
                 6) AS p_kn
    FROM cb JOIN cu USING (w1) JOIN bwd USING (w2), tot
    ORDER BY cb DESC, bg LIMIT 200
    """,
)
def q_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser–Ney bigram table (D = 0.75) over the
    document corpus — top-200 bigrams with MLE vs KN-smoothed
    probability; all counts from one vocabulary-bounded bigram table
    (``operators/text.py::kneser_ney_bigram``)."""
    from institutional_fx_etl_spark.operators.text import (
        kneser_ney_bigram,
    )

    docs = load_table(spark, sf_dir, "documents")
    return kneser_ney_bigram(docs, discount=0.75, top_k=200)


@register(
    "skyline_pareto",
    """
    WITH p AS (
      SELECT o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
             o_totalprice,
             CAST(epoch(o_orderdate) AS DOUBLE) * 1.0 AS __x,
             CAST(o_totalprice AS DOUBLE) * -1.0 AS __y
      FROM orders
    ),
    per_x AS (SELECT __x, min(__y) AS __ymin FROM p GROUP BY __x),
    f AS (
      SELECT __x, __ymin,
             min(__ymin) OVER (ORDER BY __x ROWS BETWEEN UNBOUNDED
                               PRECEDING AND 1 PRECEDING) AS __pm
      FROM per_x
    )
    SELECT p.o_orderkey, p.o_orderdate, p.o_totalprice
    FROM p JOIN f ON p.__x = f.__x AND p.__y = f.__ymin
    WHERE f.__pm IS NULL OR f.__pm > f.__ymin
    """,
)
def q_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto skyline of orders — earliest-and-largest frontier
    (minimize o_orderdate, maximize o_totalprice): the orders no
    other order both predates-or-ties and outprices. Per-x minima +
    one strict-prefix window over the distinct-date relation — no
    dominance pair join (``operators/selection.py::
    pareto_skyline_2d``)."""
    from institutional_fx_etl_spark.operators.selection import (
        pareto_skyline_2d,
    )

    orders = load_table(spark, sf_dir, "orders")
    o = orders.selectExpr(
        "o_orderkey",
        "CAST(o_orderdate AS TIMESTAMP) AS o_orderdate",
        "o_totalprice",
        "CAST(CAST(o_orderdate AS TIMESTAMP) AS DOUBLE) AS od_epoch",
    )
    return pareto_skyline_2d(
        o,
        "od_epoch",
        "o_totalprice",
        maximize=(False, True),
        keep_cols=("o_orderkey", "o_orderdate", "o_totalprice"),
    )


# ---------------------------------------------------------------------
# Round-15 early debuts (the round-10 overflow precedent: registered,
# pytest-gated at sf0.001 via the tail gate and judge-checkable at
# sf0.01, they head the r15 window — the capacity projection counts
# them in test_next_round_demand_fits_window)
# ---------------------------------------------------------------------


def _register_seasonal_decompose() -> None:
    from institutional_fx_etl_spark.operators.timeseries import (
        seasonal_decompose_exprs,
    )

    quant, idx, trend = seasonal_decompose_exprs(
        "value", "event_type", "ts, event_id", 7
    )
    oracle = f"""
    WITH base AS (
      SELECT event_type, ts, event_id, {quant} AS vq
      FROM events WHERE value IS NOT NULL
    ),
    wt AS (
      SELECT *, CAST(({idx}) % 7 AS INT) AS __phase,
             {trend} AS __trend
      FROM base
    ),
    wd AS (
      SELECT *, CAST(vq AS DOUBLE) / 1e6 - __trend AS __detr FROM wt
    ),
    ph AS (
      SELECT event_type, __phase,
             CAST(SUM(CAST(floor(__detr * 1e6 + 0.5) AS DECIMAL(18,0)))
                  AS DOUBLE) / count(*) / 1e6 AS __s_raw
      FROM wd WHERE __detr IS NOT NULL GROUP BY 1, 2
    ),
    phc AS (
      SELECT event_type, __phase,
             round(__s_raw
              - CAST(SUM(CAST(floor(__s_raw * 1e6 + 0.5)
                              AS DECIMAL(18,0)))
                 OVER (PARTITION BY event_type) AS DOUBLE)
                 / (count(*) OVER (PARTITION BY event_type)) / 1e6, 6)
               AS seasonal
      FROM ph
    )
    SELECT wd.event_type, wd.ts, wd.event_id,
           CAST(vq AS DOUBLE) / 1e6 AS value_q,
           round(__trend, 6) AS trend,
           seasonal,
           round(CAST(vq AS DOUBLE) / 1e6 - __trend - seasonal, 6)
             AS resid
    FROM wd JOIN phc ON wd.event_type = phc.event_type
                    AND wd.__phase = phc.__phase
    """

    @register("seasonal_decompose", oracle)
    def q_seasonal_decompose(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Classical additive seasonal decomposition (period 7) of
        each event-type series: centered-MA trend (DECIMAL frame
        sums — sliding float aggregation is engine-hazardous),
        phase-mean seasonal centered per series, residual
        (``operators/timeseries.py::seasonal_decompose``)."""
        from institutional_fx_etl_spark.operators.timeseries import (
            seasonal_decompose,
        )

        ev = load_table(spark, sf_dir, "events")
        return seasonal_decompose(
            ev, "value", ("event_type",), ("ts", "event_id"), period=7
        )


_register_seasonal_decompose()


def _register_macd_signal() -> None:
    from institutional_fx_etl_spark.operators.timeseries import (
        macd_signal_exprs,
    )

    over = "(PARTITION BY event_type ORDER BY ts, event_id)"
    macd, sig, hist, cross = macd_signal_exprs("value", over)
    oracle = f"""
    SELECT *, {cross} AS crossover FROM (
      SELECT *, {hist} AS histogram FROM (
        SELECT *, {sig} AS signal_line FROM (
          SELECT event_type, ts, event_id, value, {macd} AS macd
          FROM events WHERE value IS NOT NULL
        )
      )
    )
    """

    @register("macd_signal", oracle)
    def q_macd_signal(spark: SparkSession, sf_dir: str) -> DataFrame:
        """MACD(12,26) + signal(9) + histogram + zero-cross flag per
        event-type series, all truncated-horizon EWMAs over ONE
        partitioned window sort; every layer's SQL text is shared
        verbatim with the oracle
        (``operators/timeseries.py::macd_signal``)."""
        from institutional_fx_etl_spark.operators.timeseries import (
            macd_signal,
        )

        ev = load_table(spark, sf_dir, "events")
        return macd_signal(
            ev, "value", ("event_type",), ("ts", "event_id")
        )


_register_macd_signal()


@register(
    "survival_km",
    """
    WITH base AS (
      SELECT event_type AS g,
             CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS tq,
             CASE WHEN event_id % 5 <> 0 THEN 1 ELSE 0 END AS obs
      FROM events WHERE value IS NOT NULL
    ),
    per_t AS (
      SELECT g, tq, CAST(SUM(obs) AS BIGINT) AS d,
             CAST(SUM(1 - obs) AS BIGINT) AS c
      FROM base GROUP BY 1, 2
    ),
    tot AS (SELECT g, CAST(count(*) AS BIGINT) AS n_tot
            FROM base GROUP BY 1),
    risk AS (
      SELECT per_t.g, tq, d, c,
             CAST(n_tot - coalesce(SUM(d + c) OVER
               (PARTITION BY per_t.g ORDER BY tq ROWS BETWEEN UNBOUNDED
                PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n
      FROM per_t JOIN tot USING (g)
    ),
    f AS (
      SELECT *, CAST(1 AS DOUBLE) - CAST(d AS DOUBLE) / n AS ff
      FROM risk
    ),
    s AS (
      SELECT *,
             max(CASE WHEN ff <= 0 THEN 1 ELSE 0 END) OVER w AS dead,
             SUM(CASE WHEN ff > 0 THEN ln(ff) END) OVER w AS ls
      FROM f
      WINDOW w AS (PARTITION BY g ORDER BY tq ROWS BETWEEN UNBOUNDED
                   PRECEDING AND CURRENT ROW)
    )
    SELECT g AS event_type, CAST(tq AS DOUBLE) / 1e6 AS t,
           n AS n_at_risk, d AS n_events, c AS n_censored,
           CASE WHEN dead = 1 THEN CAST(0 AS DOUBLE)
                ELSE round(exp(coalesce(ls, CAST(0 AS DOUBLE))), 6)
           END AS survival
    FROM s
    """,
)
def q_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve per event type over the value
    column as a duration, with a deterministic 20% right-censoring
    split (event_id % 5 = 0): micro-quantized duration grouping, the
    at-risk prefix and the running log-product over the
    distinct-duration-bounded relation
    (``operators/profiling.py::survival_km``)."""
    from institutional_fx_etl_spark.operators.profiling import survival_km

    ev = load_table(spark, sf_dir, "events")
    return survival_km(ev, "value", "event_id % 5 <> 0", "event_type")


@register(
    "ndcg_eval",
    """
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv
               FROM embeddings),
    n AS (SELECT vec_id, vv, sqrt(list_dot_product(vv, vv)) AS nv
          FROM v),
    q AS (SELECT vec_id AS q_id, vv AS qv, nv AS nq FROM n
          WHERE vec_id < 8),
    sc AS (
      SELECT q_id, n.vec_id,
             round(list_dot_product(vv, qv) / (nv * nq), 6) AS cosine
      FROM n CROSS JOIN q
    ),
    r AS (
      SELECT *, CAST(row_number() OVER
               (PARTITION BY q_id ORDER BY cosine DESC, vec_id)
               AS INTEGER) AS rank
      FROM sc
    ),
    tk AS (SELECT q_id, vec_id, rank FROM r
           WHERE rank <= 10 AND vec_id <> q_id),
    rel AS (
      SELECT t.q_id, t.rank,
             CASE WHEN l1.label = l2.label THEN 1 ELSE 0 END AS rel
      FROM tk t
      JOIN embeddings l1 ON t.vec_id = l1.vec_id
      JOIN embeddings l2 ON t.q_id = l2.vec_id
    ),
    pos AS (
      SELECT q_id, rel,
             row_number() OVER (PARTITION BY q_id ORDER BY rank)
               AS pos,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY rel DESC, rank) AS ipos
      FROM rel
    ),
    g AS (
      SELECT q_id, rel,
             CAST(floor(CAST(rel AS DOUBLE) / log2(pos + 1) * 1e6
                        + 0.5) AS DECIMAL(18,0)) AS gq,
             CAST(floor(CAST(rel AS DOUBLE) / log2(ipos + 1) * 1e6
                        + 0.5) AS DECIMAL(18,0)) AS iq
      FROM pos
    ),
    a AS (
      SELECT q_id, CAST(SUM(rel) AS BIGINT) AS n_rel,
             CAST(SUM(gq) AS DOUBLE) / 1e6 AS dcg0,
             CAST(SUM(iq) AS DOUBLE) / 1e6 AS idcg0
      FROM g GROUP BY q_id
    )
    SELECT q_id, n_rel, round(dcg0, 6) AS dcg, round(idcg0, 6) AS idcg,
           CASE WHEN idcg0 > 0 THEN round(dcg0 / idcg0, 6)
                ELSE CAST(0 AS DOUBLE) END AS ndcg
    FROM a
    """,
)
def q_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 of the brute-cosine ranking with label-match relevance
    for 8 query vectors (self excluded, positions renumbered, gain
    terms micro-quantized before the per-query sum) — the graded
    retrieval-eval next to ann_recall_eval's set recall
    (``operators/similarity.py::ndcg_eval``)."""
    from institutional_fx_etl_spark.operators.similarity import ndcg_eval

    emb = load_table(spark, sf_dir, "embeddings")
    return ndcg_eval(emb, emb.filter("vec_id < 8"), k=10)


# ---------------------------------------------------------------------
# Registry ordering — the driver's correctness gate checks the FIRST 50
# entries each round. ROTATION POLICY (round 2 verdict ask #4): the
# window is recomposed every round so that
#   1) queries NEW this round come first (they need their first row),
#   2) queries whose last driver row is one round old rotate back in,
#   3) the flagship/streaming family stays in-window every round,
#   4) the demotion tail holds only queries with a GREEN row from the
#      immediately previous round — so the union of any two consecutive
#      rounds' windows covers the whole registry and no entry's latest
#      driver row is ever more than 2 rounds old.
# Out-of-window entries keep an automated gate regardless:
# tests/test_contract_tail.py oracle-checks the current tail at
# sf0.001 in pytest.
# ---------------------------------------------------------------------

#: Core reference-parity tier (r11 verdict task #7): the SURVEY.md §2
#: operator surface + the flagship pipeline family, as registry
#: queries. These re-certify EVERY round regardless of window
#: composition: in-window entries get the driver row, out-of-window
#: entries get an sf0.01 oracle check in pytest
#: (tests/test_core_tier.py) — strictly stronger than the sf0.001
#: tail gate, so reference parity can never go stale as the LLM
#: surface grows around it.
CORE_TIER = [
    "scan_project",  # (ROTATION_RETIRED mirrors this list — see below)
    "tumbling_ohlc",
    "candle_resample",
    "global_median",
    "time_spine",
    "weekday_filter",
    "filter_nullsafe",
    "greatest_least_fix",
    "lag_pct_change",
    "ffill",
    "rolling_median_centered",
    "linear_interpolate",
    "align_left_join",
    "anti_join",
    "combine_first",
    "inner_reconcile",
    "audit_union",
    "topk",
    "set_ops",
    "validator_reconcile",
    "hybrid_pipeline",
    "hybrid_pipeline_audit",
    "hybrid_pipeline_chunked",
    "hybrid_pipeline_multisym",
    "pipeline_clean_fixture",
    "pipeline_clean_fixture_fused",
    "incremental_merge",
    "incremental_merge_multisym",
    "streaming_tumbling_ohlc",
    "streaming_dedup",
    "streaming_gap_bridge",
    "multimodal_decode",
]

#: Window-capacity policy, option (b) — ROTATION RETIREMENT (round 14,
#: r13 verdict ask #6). The 50-slot/MAX_STALE=5 rotation supports 300
#: driver-rotated queries at steady state; the registry reached 293
#: this round, and the r8/r7 full-window cohorts were projecting ZERO
#: debut slots for r16-r18 under option (a)'s hard freeze. The flip:
#: CORE_TIER queries RETIRE from forced rotation. Their certification
#: of record becomes the pytest core-tier gate
#: (tests/test_core_tier.py — every out-of-window core query
#: oracle-checked at sf0.01 on EVERY pytest run, strictly more
#: frequent than a driver row every ≤5 rounds), so the staleness
#: invariant, the 300 ceiling and the one-round-early feasibility
#: projection all count ONLY non-retired queries. Retired queries stay
#: registered (the driver can still sample them if composed into a
#: window — nothing breaks); they are simply never FORCED into one.
#: tools/cert_history.py tags them `retired`;
#: tests/test_cert_freshness.py filters on the tag.
ROTATION_RETIRED = tuple(CORE_TIER)

_HEAD = [
    # --- round-15 window (50) -----------------------------------------
    # Composed per the capacity policy (ROADMAP "window capacity",
    # machine-enforced by tests/test_cert_freshness.py): the forced
    # cohort is the 35 staleness-5 rows (the whole r9 block per
    # tools/cert_history.py), then the 4 never-certified round-14
    # debuts (new ops only debut IN-WINDOW), then the 11 stalest
    # staleness-4 rows smooth the r16 cohort (policy rule (c)).
    "rolling_stats",
    "array_agg_functions",
    "stats_agg",
    "latest_record_dedup",
    "train_test_split",
    "session_window_agg",
    "lsh_ann_pairs_scaled",
    "semdedup",
    "knn_join",
    "tpch_q8",
    "knn_incremental",
    "shuffle_shards",
    "random_projection",
    "curriculum_order",
    "token_budget_fit",
    "token_quota_take",
    "ngram_novelty",
    "emb_pca_power",
    "dedup_nearest_text",
    "dedup_minhash_error",
    "ngram_novelty_incremental",
    "lsh_multiprobe_pairs",
    "emb_pca_project",
    "cross_source_overlap",
    "lsh_tuning_report",
    "ivfpq_topk",
    "emb_pca_incremental",
    "streaming_mixture",
    "streaming_dedup_table",
    "linear_probe_gd",
    "dup_span_coverage",
    "kmeans_inertia",
    "quota_sample_exact",
    "embedding_decontaminate",
    "linear_probe_score",
    "seasonal_decompose",
    "macd_signal",
    "survival_km",
    "ndcg_eval",
    "dedup_exact",
    "text_lang_id",
    "multimodal_frames",
    "range_join_banded",
    "skew_salted_agg",
    "exact_quantiles",
    "text_repetition",
    "tfidf_topterms",
    "range_frame_window",
    "asof_join_tolerance",
    "rank_distributions",
]
_TAIL = [
    # r14-green — the freshest driver rows on the board (demotion
    # tail per policy rule 4: only entries with a green row from the
    # immediately previous round may hold the tail, so the union of
    # any two consecutive windows covers the whole registry). The
    # r10-r13 remainder is NOT listed, so _reorder_registry places it
    # between _HEAD and _TAIL — top of the pytest tail gate, first
    # in line for the r16 window (oldest first; see
    # tools/cert_history.py for the machine-readable ledger).
    "ann_recall_eval",
    "anova_oneway",
    "asof_join_nearest_tolerance",
    "assoc_rules",
    "bloom_membership",
    "bm25_rank",
    "corpus_flagship",
    "countmin_estimate",
    "cramers_v",
    "crosscorr_lags",
    "cusum_changepoint",
    "decay_score",
    "dedup_canonical",
    "dedup_containment",
    "dedup_ensemble_pairs",
    "dedup_recall_eval",
    "dedup_sorted_neighborhood",
    "diff_in_diff",
    "dsir_weights",
    "emb_covariance",
    "fuzzy_lookup_join",
    "gini_by_group",
    "graph_sssp_weighted",
    "hll_estimate",
    "interarrival_stats",
    "key_skew_profile",
    "kneser_ney_bigram",
    "ks_two_sample",
    "lsh_ann_pairs",
    "mannwhitney_u",
    "mixture_sampling",
    "ngram_overlap_contamination",
    "pareto_topshare",
    "profile_table",
    "proportion_ztest",
    "psi_drift",
    "quantile_sketch",
    "referential_integrity",
    "skyline_pareto",
    "streaming_countmin",
    "streaming_cusum",
    "streaming_hll",
    "streaming_quantile_sketch",
    "tpch_q12",
    "tpch_q15",
    "tpch_q9",
    "triangle_count",
    "weighted_median",
    "welch_ttest",
    "zorder_layout",
]


def _reorder_registry() -> None:
    snapshot = dict(REGISTRY)
    ordered = [n for n in _HEAD if n in snapshot]
    ordered += [n for n in snapshot if n not in _HEAD and n not in _TAIL]
    ordered += [n for n in _TAIL if n in snapshot]
    REGISTRY.clear()
    REGISTRY.update({n: snapshot[n] for n in ordered})


_reorder_registry()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql.strip() for name, (_, sql) in REGISTRY.items() if sql is not None
    }
