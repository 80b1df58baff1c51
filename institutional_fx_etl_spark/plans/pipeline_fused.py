"""Fused chunked flagship pipeline — the 100 TB single-symbol path, v2.

Same stage chain and bit-identical output as
:meth:`plans.pipeline.HybridMergerSpark.merge` (the reference run loop,
``/root/reference/src/hybrid_merger.py:175-251``) and as
:func:`plans.pipeline_chunked.merge_chunked` (v1), but where v1
re-chunks and re-shuffles between every filter stage (3 checkpoints,
~4 full-row window exchanges), this version folds the clean stages into
ONE chunk-partitioned window pass using *survivor-conditional running
frames*:

- a drop-stage filter (F4 inverted) never forces a re-shuffle — the
  downstream "previous surviving row" state is
  ``last(when(survivor, x), ignorenulls)`` over a running frame, which
  WindowExec maintains incrementally in O(n). The F6 lag wraps its
  value in a struct so a survivor's NULL close still counts as "the
  previous row" (pandas ``pct_change`` semantics, trap T3) instead of
  being skipped past;
- F5's conditional ffill source is the same running ``last`` (spike
  rows legitimately feed it — the reference ffills at ``:161`` before
  the spike drop at ``:163``);
- densification runs a second, smaller pass over the already-filtered
  survivor rows (plain ``lead`` + running ffill per chunk — no padding
  adjacency needed, so F4/F6 emptying whole chunks is harmless);
- every cross-chunk dependency (ffill carries, previous-survivor
  close, next-survivor timestamp) is a 1-row-per-chunk summary whose
  prefix/suffix resolves via broadcast self-join (the
  :mod:`functions.chunked` design) — full rows never leave their chunk.

Physical shape: 2 checkpoints (consensus-merged frame, pass-1 windowed
frame) and 3 full-row exchanges (consensus join, pass-1 window, pass-2
survivor window) vs v1's 3 checkpoints + ~5 exchanges. No ``Exchange
SinglePartition`` feeds any Sort/Window (asserted in
``tests/test_chunked.py``); the only single-partition movement is the
1-row global aggregate broadcast.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from institutional_fx_etl_spark.functions.chunked import CHUNK, CIDX, PAD
from institutional_fx_etl_spark.functions.nullsafe import is_true
from institutional_fx_etl_spark.operators.clean import _audit_select
from institutional_fx_etl_spark.plans.pipeline import cast_final, fused_consensus_merge
from institutional_fx_etl_spark.sources import schemas


def _chunk_carries(
    frame: DataFrame,
    specs: dict[str, tuple[Column, bool]],
    order_by: Column,
    partition_cols: tuple[str, ...],
) -> DataFrame:
    """Cross-chunk carries for several values in ONE scan of ``frame``.

    ``specs`` maps an output column name to ``(value, forward)``: the
    carry is the last (``forward=True``) or first non-null ``value`` of
    any earlier (later) chunk, per partition key. One groupBy computes
    every chunk-edge summary together; ALL carries then resolve through
    ONE broadcast self-join over that 1-row-per-chunk table (O(C²)
    pairs over the summary, like :func:`functions.chunked.
    ffill_chunked` — trivial up to ~10⁴ chunks): mixed directions
    become conditional ``max_by``/``min_by`` aggregates over the pair
    table, so the stage count stays constant in the number of specs.
    Returns ``(partition_cols…, __cidx, <name>…)`` for broadcast back
    onto the frame.
    """
    part = [*partition_cols, CIDX]
    if PAD in frame.columns:
        frame = frame.filter(~F.col(PAD))
    aggs = [
        (F.max_by if fwd else F.min_by)(
            value, F.when(value.isNotNull(), order_by)
        ).alias(f"__e_{name}")
        for name, (value, fwd) in specs.items()
    ]
    sums = frame.groupBy(*part).agg(*aggs)
    a = sums.select(*part).alias("__sa")
    b = sums.select(
        *[F.col(c).alias(f"__b_{c}") for c in part],
        *[F.col(f"__e_{n}").alias(f"__b_{n}") for n in specs],
    )
    # left join keeps carry-less chunks (their aggregates come out
    # null, exactly like the per-spec left joins this replaces)
    cond = reduce(
        Column.__and__,
        [
            F.col(f"__sa.{c}").eqNullSafe(F.col(f"__b_{c}"))
            for c in partition_cols
        ],
        F.col(f"__b_{CIDX}") != F.col(f"__sa.{CIDX}"),
    )
    carry_aggs = []
    for name, (_value, fwd) in specs.items():
        ok = F.col(f"__b_{name}").isNotNull() & (
            F.col(f"__b_{CIDX}") < F.col(f"__sa.{CIDX}")
            if fwd
            else F.col(f"__b_{CIDX}") > F.col(f"__sa.{CIDX}")
        )
        pick = F.max_by if fwd else F.min_by
        carry_aggs.append(
            pick(
                F.when(ok, F.col(f"__b_{name}")),
                F.when(ok, F.col(f"__b_{CIDX}")),
            ).alias(name)
        )
    return (
        a.join(F.broadcast(b), cond, "left")
        .groupBy(*[F.col(f"__sa.{c}").alias(c) for c in part])
        .agg(*carry_aggs)
    )


def _pad_explode(
    base: DataFrame,
    ts_col: str,
    chunk_seconds: int,
    partition_cols: tuple[str, ...],
) -> DataFrame:
    """Chunk-index + ±2-row boundary padding in ONE scan, no window.

    :func:`functions.chunked.padded` ranks rows with ``row_number``/
    ``count`` windows — a full-row exchange+sort *before* the main
    window pass — and :func:`functions.chunked.with_chunk_index` runs
    its own distinct scan. Candle timestamps are unique, so "first/last
    2 rows of a chunk" is decidable from per-chunk boundary timestamps:
    two 1-row-per-chunk aggregates (map-side combined) double as the
    distinct-chunk list for the dense index, everything broadcasts back
    onto the frame, and each row *emits its own pad copies* through a
    generated shift array + ``explode``. The pass-1 window exchange is
    then the only full-row shuffle between the consensus join and
    densification.
    """
    p = partition_cols
    key = [*p, CHUNK]
    base = base.withColumn(
        CHUNK,
        F.floor(F.col(ts_col).cast("double") / F.lit(float(chunk_seconds))).cast(
            "long"
        ),
    )
    s1 = base.groupBy(*key).agg(
        F.max(ts_col).alias("__hi1"), F.min(ts_col).alias("__lo1")
    )
    s2 = (
        base.join(F.broadcast(s1), on=key, how="left")
        .groupBy(*key)
        .agg(
            F.max(F.when(F.col(ts_col) < F.col("__hi1"), F.col(ts_col))).alias("__hi2"),
            F.min(F.when(F.col(ts_col) > F.col("__lo1"), F.col(ts_col))).alias("__lo2"),
            F.max("__hi1").alias("__hi1"),
            F.min("__lo1").alias("__lo1"),
        )
    )
    # dense chunk ordinal from the (tiny) chunk list — adjacency
    # survives empty chunk ranges (FX weekends)
    a = s1.select(*key).alias("__ca")
    b = s1.select(*[F.col(c).alias(f"__b_{c}") for c in key]).alias("__cb")
    cond = reduce(
        Column.__and__,
        [F.col(f"__ca.{c}").eqNullSafe(F.col(f"__b_{c}")) for c in p],
        F.col(f"__b_{CHUNK}") <= F.col(f"__ca.{CHUNK}"),
    )
    idx = (
        a.join(F.broadcast(b), cond)
        .groupBy(*[F.col(f"__ca.{c}").alias(c) for c in key])
        .agg(F.count(F.lit(1)).alias(CIDX))
    )
    bounds = s2.join(F.broadcast(idx), on=key)

    tail = f"{ts_col} >= coalesce(__hi2, __hi1)"
    head = f"{ts_col} <= coalesce(__lo2, __lo1)"
    empty = "cast(array() as array<struct<s: int, p: boolean>>)"
    shifts = (
        "concat(array(struct(0 as s, false as p)), "
        f"if({tail}, array(struct(1 as s, true as p)), {empty}), "
        f"if({head}, array(struct(-1 as s, true as p)), {empty}))"
    )
    keep = [c for c in base.columns if c != CHUNK]
    return (
        base.join(F.broadcast(bounds), on=key, how="left")
        .selectExpr(*keep, CIDX, f"explode({shifts}) AS __sh")
        .withColumn(CIDX, F.col(CIDX) + F.col("__sh.s"))
        .withColumn(PAD, F.col("__sh.p"))
        .drop("__sh")
    )


def merge_fused(
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
    scalars_override: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Stages 4-9 of the hybrid pipeline, fused-chunk-parallel. Returns
    ``(final, audit)`` exactly like ``HybridMergerSpark.merge``.

    ``materialize=False`` keeps the chain lazy (plan inspection only);
    executing it re-derives shared subtrees once per reference — see
    the measured blowup note in :mod:`plans.pipeline_chunked`.

    ``scalars_override``: a 1-row DataFrame ``(__med, __ntick,
    __anyfix)`` replacing the whole-series aggregate — the incremental
    pipeline passes FULL-HISTORY scalars here so a window-bounded
    recompute fills with the same global median the closed-dataset run
    would (plans/incremental.py). Only supported without
    ``partition_cols``.
    """
    p = partition_cols
    ts = "datetime"
    part = [*p, CIDX]

    # eager localCheckpoint, NOT persist or lazy: each stage is
    # referenced several times (carry summaries + main path). Fully
    # lazy re-derives the subtree per reference (measured 36.5s vs
    # 23.5s at 7.9M rows); forced persist() looked cheaper in isolation
    # but collapsed end-to-end (26s at sf0.1 vs 3.9s — cache-manager
    # substitution does not hold up across this plan's reuse pattern).
    _mat = (lambda df: df.localCheckpoint(eager=True)) if materialize else (lambda df: df)

    merged, audit_consensus = fused_consensus_merge(
        m1, tick_candles, consensus_threshold, p, broadcast_m1
    )
    merged = _mat(merged)

    # -- whole-series scalars as ONE broadcast aggregate (A5/T6/F8) -----
    inverted = is_true(F.col("low") > F.col("high"))
    bad_oc = is_true(
        (F.col("open") > F.col("high"))
        | (F.col("open") < F.col("low"))
        | (F.col("close") > F.col("high"))
        | (F.col("close") < F.col("low"))
    )
    aggs = [
        F.percentile(F.when(F.col("__is_tick"), F.col("spread")), 0.5).alias("__med"),
        F.sum(F.col("__is_tick").cast("int")).alias("__ntick"),
        F.max(F.when(~inverted, bad_oc).cast("int")).alias("__anyfix"),
    ]
    if scalars_override is not None:
        if p:
            raise ValueError("scalars_override requires partition_cols=()")
        base = merged.crossJoin(F.broadcast(scalars_override))
    elif p:
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

    # -- pass 1: ONE padded chunk sort for smoother + clean-stage state -
    pdd = _pad_explode(base, ts, chunk_seconds, p)

    w = Window.partitionBy(*part).orderBy(ts)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    run_prev = w.rowsBetween(Window.unboundedPreceding, -1)
    real = ~F.col(PAD)

    # W3 smoother: pad rows ARE the neighbour rows a chunk-edge ±2
    # frame needs; their own (garbage) results are dropped below
    if smooth_spread:
        pdd = pdd.withColumn(
            "spread", F.percentile("spread", 0.5).over(w.rowsBetween(-2, 2))
        )

    pdd = (
        pdd.withColumn("__inv", inverted)
        .withColumn("__bad", bad_oc)
        # the structure audit logs PRE-fix values (hybrid_merger.py:157),
        # and the fix applies to post-F4 survivors only — an inverted
        # row that also trips bad_oc is dropped untouched
        .withColumn("__fix", ~F.col("__inv") & F.col("__bad"))
        .withColumn("__hi0", F.when(F.col("__fix"), F.col("high")))
        .withColumn("__lo0", F.when(F.col("__fix"), F.col("low")))
        .withColumn(
            "high",
            F.when(
                F.col("__fix"), F.greatest("open", "close", "high")
            ).otherwise(F.col("high")),
        )
        .withColumn(
            "low",
            F.when(F.col("__fix"), F.least("open", "close", "low")).otherwise(
                F.col("low")
            ),
        )
        .withColumn(
            "spread",
            F.when(F.col("__fix"), F.lit(None).cast("double")).otherwise(
                F.col("spread")
            ),
        )
        .drop("__bad")
    )

    # F5 ffill source: last non-null spread among post-F4 rows (spike
    # rows included — the reference ffills before the spike drop).
    # F6 lag: previous post-F4 row, struct-wrapped so its NULL close
    # still counts as "the previous row" (T3) instead of being skipped.
    surv_spread = F.when(real & ~F.col("__inv"), F.col("spread"))
    prev_struct = F.when(real & ~F.col("__inv"), F.struct(F.col("close").alias("c")))
    pdd = (
        pdd.withColumn("__sf_loc", F.last(surv_spread, ignorenulls=True).over(run))
        .withColumn(
            "__pc_loc", F.last(prev_struct, ignorenulls=True).over(run_prev)
        )
        .filter(real)
        .drop(PAD)
    )
    frame = _mat(pdd)

    # -- cross-chunk carries for pass-1 state (one scan, broadcast) -----
    carries1 = _chunk_carries(
        frame,
        {
            "__sf_carry": (F.when(~F.col("__inv"), F.col("spread")), True),
            "__pc_carry": (
                F.when(~F.col("__inv"), F.struct(F.col("close").alias("c"))),
                True,
            ),
        },
        F.col(ts),
        p,
    )

    frame = (
        frame.join(F.broadcast(carries1), on=part, how="left")
        .withColumn("__sf", F.coalesce("__sf_loc", "__sf_carry"))
        .withColumn(
            "__prev_close", F.coalesce("__pc_loc", "__pc_carry").getField("c")
        )
        .drop("__sf_loc", "__sf_carry", "__pc_loc", "__pc_carry")
    )

    # F5's conditional ffill write-back (gated by the global F8 flag).
    # Applied to EVERY row like the vanilla path — for a non-null
    # spread, __sf (last non-null incl. own) IS the row's own value.
    frame = frame.withColumn(
        "spread",
        F.when(F.col("__anyfix") == 1, F.col("__sf")).otherwise(F.col("spread")),
    ).drop("__sf", "__anyfix")

    # -- F6 volatility-spike flag (fixed values, post-F4 row order) -----
    amp = (F.col("high") - F.col("low")) / F.col("open")
    jump = F.abs((F.col("close") - F.col("__prev_close")) / F.col("__prev_close"))
    frame = frame.withColumn(
        "__spike",
        ~F.col("__inv")
        & (
            is_true(amp > F.lit(spike_threshold))
            | is_true(jump > F.lit(spike_threshold))
        ),
    ).drop("__prev_close")

    audit_inverted = _audit_select(
        frame.filter(F.col("__inv")), ts, schemas.REASON_DROPPED_INVERTED
    )
    audit_structure = _audit_select(
        frame.filter(F.col("__fix"))
        .withColumn("high", F.col("__hi0"))
        .withColumn("low", F.col("__lo0")),
        ts,
        schemas.REASON_FIXED_STRUCTURE,
    )
    audit_spike = _audit_select(
        frame.filter(F.col("__spike")), ts, schemas.REASON_DROPPED_SPIKE
    )

    # -- pass 2: densify over the survivor rows only (J4+W2+W4) ---------
    # Plain lead/running-ffill per chunk — survivors are adjacent by
    # construction, so no padding is needed and chunks emptied by F4/F6
    # are harmless (the carries skip them).
    surv = frame.filter(~F.col("__inv") & ~F.col("__spike")).drop(
        "__inv", "__fix", "__spike", "__hi0", "__lo0"
    )

    carries2 = _chunk_carries(
        surv,
        {
            "__nt_carry": (F.col(ts), False),
            "__gf_carry": (F.col("spread"), True),
        },
        F.col(ts),
        p,
    )

    w2 = Window.partitionBy(*part).orderBy(ts)
    seq = (
        surv.join(F.broadcast(carries2), on=part, how="left")
        .withColumn("__next_ts", F.coalesce(F.lead(ts).over(w2), "__nt_carry"))
        .withColumn(
            "__spread_f",
            F.coalesce(
                F.last("spread", ignorenulls=True).over(
                    w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                ),
                "__gf_carry",
            ),
        )
    )

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
