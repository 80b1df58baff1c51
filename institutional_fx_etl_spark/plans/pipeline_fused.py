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
- densification state (next surviving timestamp, running survivor
  spread ffill) is FOLDED into the same window pass, two-versioned:
  survivorship is carry-dependent for exactly ONE row per chunk — the
  first post-F4 candidate, whose F6 lag is the cross-chunk previous
  close — so every densify window is computed against the KNOWN
  survivors inside the pass-1 sort and the first candidate's verdict
  resolves on the per-chunk summary, version-selecting the row-level
  state after the carry broadcast (no second full-row window);
- every cross-chunk dependency (ffill carries, previous-survivor
  close, next-survivor timestamp, first-candidate verdicts) is a
  1-row-per-chunk summary whose prefix/suffix resolves as O(C)
  running windows over the summary itself (the
  :mod:`functions.chunked` design) — full rows never leave their
  chunk.

Physical shape: 2 checkpoints (consensus-merged frame, pass-1 windowed
frame) and 2 full-row exchanges (consensus join, pass-1 window) vs
v1's 3 checkpoints + ~5 exchanges — the former pass-2 survivor
exchange+sort+window is gone (the densify fold above). No ``Exchange
SinglePartition`` feeds any full-row Sort/Window (asserted in
``tests/test_chunked.py``); the only single-partition movement is the
1-row global aggregate broadcast and the C-row carry summary.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from institutional_fx_etl_spark.functions.chunked import CHUNK, CIDX, PAD, epoch_seconds
from institutional_fx_etl_spark.functions.nullsafe import is_true
from institutional_fx_etl_spark.plans.pipeline import cast_final, fused_consensus_merge
from institutional_fx_etl_spark.sources import schemas


def chunk_of(ts_col: str, chunk_seconds: int) -> Column:
    """The raw time-chunk id of a timestamp (fixed-width bucket)."""
    return F.floor(
        epoch_seconds(ts_col) / F.lit(float(chunk_seconds))
    ).cast("long")


def chunk_bounds(
    df: DataFrame,
    ts_col: str,
    chunk_seconds: int,
    partition_cols: tuple[str, ...],
    chunked: bool = False,
) -> DataFrame:
    """Per-chunk top-2/bottom-2 boundary timestamps + the dense chunk
    ordinal, in ONE scan: a two-level skew-proof aggregation (per
    physical-partition candidates, then a per-chunk merge of ≤2
    candidates per sub — O(1) state per chunk row-wise; see the inline
    comment) and a ``row_number`` over the resulting C-row summary.
    ``F.get`` is 0-based and NULL out-of-range regardless of ANSI mode,
    so 1-row chunks get NULL ``__hi2``/``__lo2`` (→ coalesce to
    ``__hi1``/``__lo1``).

    This deliberately takes the PRE-scalar-join frame so its broadcast
    build is independent of the global-scalar aggregate's — AQE
    materializes the two concurrently instead of serially.
    """
    p = partition_cols
    if not chunked:
        df = df.withColumn(CHUNK, chunk_of(ts_col, chunk_seconds))
    # Two-level aggregation, skew-proof (round-6 verdict ask #2).  A
    # single per-chunk ``collect_list(ts)`` holds the WHOLE chunk's
    # timestamps in one final-merge buffer — a flash-crash tick storm
    # landing in one chunk blows that buffer up with the skew.  Level 1
    # instead groups by ``(p, chunk, spark_partition_id)``: each group
    # is wholly contained in one physical input partition, so its
    # buffer is bounded by ``spark.sql.files.maxPartitionBytes`` no
    # matter how skewed the chunk is, and only the per-sub top-2 /
    # bottom-2 candidates + count survive into level 2.  Level 2 state
    # is O(#subs-per-chunk) — #input-partitions at worst — never
    # O(rows).  The global top-2 rows of a chunk are each either their
    # sub's max or its 2nd-max, so they are always inside the candidate
    # set; same for bottom-2.  ``collect_list`` skips NULL ts on both
    # levels exactly as the old single-level collect did.
    lvl1 = (
        df.groupBy(*p, CHUNK, F.spark_partition_id().alias("__sub"))
        .agg(F.sort_array(F.collect_list(ts_col)).alias("__l"))
        .select(
            *p,
            CHUNK,
            # last ≤2 (asc) and first ≤2 (asc); slice is 1-based and
            # tolerates short arrays (1-row subs yield 1-element slices)
            F.slice(
                "__l", F.greatest(F.size("__l") - 1, F.lit(1)), 2
            ).alias("__t2"),
            F.slice("__l", 1, 2).alias("__b2"),
            F.size("__l").alias("__sn"),
        )
    )
    hi_c = F.sort_array(F.flatten(F.collect_list("__t2")))
    lo_c = F.sort_array(F.flatten(F.collect_list("__b2")))
    n = F.col("__n")
    nh = F.size("__hi_c")
    w = Window.partitionBy(*p).orderBy(CHUNK)
    return (
        lvl1.groupBy(*p, CHUNK)
        .agg(
            hi_c.alias("__hi_c"),
            lo_c.alias("__lo_c"),
            F.sum("__sn").alias("__n"),
        )
        .select(
            *p,
            CHUNK,
            F.get("__hi_c", nh - 1).alias("__hi1"),
            F.get("__hi_c", nh - 2).alias("__hi2"),
            F.get("__lo_c", F.lit(0)).alias("__lo1"),
            F.get("__lo_c", F.lit(1)).alias("__lo2"),
            # dense chunk ordinal from the (tiny) chunk list — adjacency
            # survives empty chunk ranges (FX weekends); O(C) row_number
            # over the C-row summary, no full-row sort
            F.row_number().over(w).alias(CIDX),
            # neighbor row counts: a ±2-ROW frame at a chunk edge needs
            # the 2nd-nearest row from TWO dense-chunks over whenever
            # the nearest neighbor chunk holds exactly one row — the
            # pad shift logic consults these (O(C) lag/lead over the
            # summary; the sub-2-row-chunk hole was caught by the
            # fused≡vanilla hypothesis property test)
            F.lag(n).over(w).alias("__n_prev"),
            F.lead(n).over(w).alias("__n_next"),
        )
    )


def _pad_explode(
    base: DataFrame,
    ts_col: str,
    chunk_seconds: int,
    partition_cols: tuple[str, ...],
    bounds: DataFrame | None = None,
) -> DataFrame:
    """Chunk-index + ±2-row boundary padding in ONE scan, no window.

    :func:`functions.chunked.padded` ranks rows with ``row_number``/
    ``count`` windows — a full-row exchange+sort *before* the main
    window pass — and :func:`functions.chunked.with_chunk_index` runs
    its own distinct scan. Candle timestamps are unique, so "first/last
    2 rows of a chunk" is decidable from per-chunk boundary timestamps:
    ONE 1-row-per-chunk aggregate (top-2/bottom-2 timestamps out of a
    per-chunk sorted collect — bounded by chunk row count, which
    ``chunk_seconds`` controls) doubles as the distinct-chunk list for
    the dense index (``row_number`` over the C-row summary), everything
    broadcasts back onto the frame, and each row *emits its own pad
    copies* through a generated shift array + ``explode``. The pass-1
    window exchange is then the only full-row shuffle between the
    consensus join and densification — and the frame is scanned once,
    not twice.
    """
    p = partition_cols
    key = [*p, CHUNK]
    base = base.withColumn(CHUNK, chunk_of(ts_col, chunk_seconds))
    if bounds is None:
        bounds = chunk_bounds(base, ts_col, chunk_seconds, p, chunked=True)

    tail = f"{ts_col} >= coalesce(__hi2, __hi1)"
    head = f"{ts_col} <= coalesce(__lo2, __lo1)"
    # a chunk's LAST row is also the 2nd-preceding row of the chunk
    # TWO dense-steps ahead when the in-between chunk has exactly one
    # row (symmetrically for the first row) — without these ±2 shifts
    # the ±2 smoother frame is incomplete around sub-2-row chunks
    tail2 = f"({ts_col} = __hi1) AND (__n_next = 1)"
    head2 = f"({ts_col} = __lo1) AND (__n_prev = 1)"
    empty = "cast(array() as array<struct<s: int, p: boolean>>)"
    shifts = (
        "concat(array(struct(0 as s, false as p)), "
        f"if({tail}, array(struct(1 as s, true as p)), {empty}), "
        f"if({head}, array(struct(-1 as s, true as p)), {empty}), "
        f"if({tail2}, array(struct(2 as s, true as p)), {empty}), "
        f"if({head2}, array(struct(-2 as s, true as p)), {empty}))"
    )
    keep = [c for c in base.columns if c != CHUNK]
    return (
        base.join(F.broadcast(bounds), on=key, how="left")
        # __lr (the chunk's last REAL timestamp) rides along so the
        # carry extraction can identify each chunk's last real row
        # without a second ranking window
        .selectExpr(*keep, CIDX, "__hi1 AS __lr", f"explode({shifts}) AS __sh")
        .selectExpr(
            *keep,
            f"{CIDX} + __sh.s AS {CIDX}",
            "__lr",
            f"__sh.p AS {PAD}",
        )
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
    checkpoints: str = "auto",
) -> tuple[DataFrame, DataFrame]:
    """Stages 4-9 of the hybrid pipeline, fused-chunk-parallel. Returns
    ``(final, audit)`` exactly like ``HybridMergerSpark.merge``.

    ``materialize=False`` keeps the chain lazy (plan inspection only);
    executing it re-derives shared subtrees once per reference — see
    the measured blowup note in :mod:`plans.pipeline_chunked`.

    ``scalars_override``: a DataFrame replacing the whole-series
    aggregate — the incremental pipeline passes FULL-HISTORY scalars
    here so a window-bounded recompute fills with the same global
    median the closed-dataset run would (plans/incremental.py).
    Without ``partition_cols``: one row ``(__med, __ntick, __anyfix)``.
    With ``partition_cols``: one row PER partition key,
    ``(*partition_cols, __med, __ntick, __anyfix)``, broadcast-joined
    exactly like the per-key aggregate it replaces.
    """
    p = partition_cols
    ts = "datetime"
    part = [*p, CIDX]

    # localCheckpoint, NOT persist or no-op: each stage is referenced
    # several times (carry summaries + main path). materialize=False
    # re-derives the subtree per reference (measured 36.5s vs 23.5s at
    # 7.9M rows); forced persist() looked cheaper in isolation but
    # collapsed end-to-end (26s at sf0.1 vs 3.9s — cache-manager
    # substitution does not hold up across this plan's reuse pattern).
    # Checkpoint POLICY is adaptive on the same Catalyst size estimate
    # as the engine crossover: at SMALL scale, eager=False folds each
    # checkpoint's materialization into the first consuming job (saves
    # a scheduling round-trip per checkpoint; the branches share one
    # JVM RDD, so later references still read cached blocks) at the
    # default MEMORY_AND_DISK level. At scale — or when the estimate
    # is unavailable — checkpoints are EAGER and DISK_ONLY: keeping
    # tens of millions of deserialized rows in block-manager memory
    # starves the window/aggregate execution pool in the same JVM
    # (measured UNABLE_TO_ACQUIRE_MEMORY at 56M merged rows / 8g heap
    # in tools/scale_sanity.py --years=150), while DISK_ONLY blocks
    # cost sequential local IO and zero heap — on a real cluster this
    # is the executor-local equivalent of a shuffle-file
    # materialization.
    from pyspark.storagelevel import StorageLevel

    from institutional_fx_etl_spark.plans.pipeline import HybridMergerSpark

    sizes = [
        HybridMergerSpark._plan_size_bytes(df) for df in (m1, tick_candles)
    ]
    small = (
        None not in sizes
        and sum(sizes) < HybridMergerSpark.FUSED_THRESHOLD_BYTES
    )
    ident = lambda df: df  # noqa: E731
    lazy_ck = lambda df: df.localCheckpoint(eager=False)  # noqa: E731
    disk_ck = lambda df: df.localCheckpoint(  # noqa: E731
        eager=True, storageLevel=StorageLevel.DISK_ONLY
    )
    if not materialize:
        _mat1 = _mat2 = ident  # plan-inspection mode
    elif small:
        # ``checkpoints`` (experiment knob, small scale only):
        # "auto"/"both" = lazy checkpoint both stage boundaries;
        # "last" = only the pass-1 windowed frame; "none" = fully lazy
        if checkpoints == "none":
            _mat1 = _mat2 = ident
        elif checkpoints == "last":
            _mat1, _mat2 = ident, lazy_ck
        else:
            _mat1 = _mat2 = lazy_ck
    else:
        _mat1 = _mat2 = disk_ck

    merged, audit_consensus = fused_consensus_merge(
        m1, tick_candles, consensus_threshold, p, broadcast_m1
    )
    merged = _mat1(merged)

    # pad bounds read only (partition_cols, datetime) of the merged
    # frame — building them here, independent of the scalar aggregate
    # below, lets AQE materialize the two broadcasts concurrently
    pad_bounds = chunk_bounds(merged, ts, chunk_seconds, p)

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
            base = merged.join(
                F.broadcast(scalars_override), on=list(p), how="left"
            )
        else:
            base = merged.crossJoin(F.broadcast(scalars_override))
    elif p:
        gl = merged.groupBy(*p).agg(*aggs)
        base = merged.join(F.broadcast(gl), on=list(p), how="left")
    else:
        base = merged.crossJoin(F.broadcast(merged.agg(*aggs)))

    # -- P9 median fill (+T6 zero-fill on an empty tick side) -----------
    # selectExpr strings, not Column trees, throughout the hot
    # construction path: classic Datasets analyze eagerly per
    # transformation AND every Column operation is a py4j round-trip —
    # a 15-expression select costs ~10× more to BUILD from Columns than
    # from SQL strings parsed JVM-side in one call (measured 184 ms vs
    # 19 ms). At 100 TB this is noise; at bench scale it was the fused
    # engine's dominant cost.
    base = base.selectExpr(
        *p,
        ts,
        "open",
        "high",
        "low",
        "close",
        "volume",
        "coalesce(spread, CASE WHEN coalesce(__ntick, 0) = 0 THEN 0.0D"
        " ELSE __med END) AS spread",
        "__anyfix",
    )

    # -- pass 1: ONE padded chunk sort for smoother + clean-stage state -
    pdd = _pad_explode(base, ts, chunk_seconds, p, bounds=pad_bounds)

    # NOTE (round-11, verdict ask #5): an explicit small-scale
    # repartition(nw, *part) here was measured and REJECTED —
    # interleaved A/B at sf0.1 shows it is noise (min wall 2.52 s with
    # vs 2.46 s without): the pass-1 window exchange is not where the
    # small-scale constant lives. See ROADMAP item 10 for the full
    # decomposition of the residual (py4j construction ≈ 0.7 s,
    # per-checkpoint toRdd planning ≈ 0.3-0.8 s each, and a 15-stage
    # single-task DAG whose depth is the floor).
    part_sql = ", ".join(part)
    run_sql = (
        f"PARTITION BY {part_sql} ORDER BY {ts}"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    )
    run_prev_sql = (
        f"PARTITION BY {part_sql} ORDER BY {ts}"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING"
    )

    # W3 smoother: pad rows ARE the neighbour rows a chunk-edge ±2
    # frame needs; their own (garbage) results are dropped below.
    # Smoother + F4 flag + F5 structure fix land in ONE select (every
    # expression reads the INPUT row, so __hi0/__lo0 see pre-fix
    # values exactly as the per-withColumn chain did): the structure
    # audit logs PRE-fix values (hybrid_merger.py:157), and the fix
    # applies to post-F4 survivors only — an inverted row that also
    # trips bad_oc is dropped untouched.
    inv_sql = "coalesce(low > high, false)"
    fix_sql = (
        f"((NOT {inv_sql}) AND coalesce((open > high) OR (open < low)"
        " OR (close > high) OR (close < low), false))"
    )
    spread_sql = (
        f"percentile(spread, 0.5) OVER (PARTITION BY {part_sql}"
        f" ORDER BY {ts} ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)"
        if smooth_spread
        else "spread"
    )
    pdd = pdd.selectExpr(
        *p,
        ts,
        "open",
        f"CASE WHEN {fix_sql} THEN greatest(open, close, high)"
        " ELSE high END AS high",
        f"CASE WHEN {fix_sql} THEN least(open, close, low)"
        " ELSE low END AS low",
        "close",
        "volume",
        f"CASE WHEN {fix_sql} THEN CAST(NULL AS DOUBLE)"
        f" ELSE {spread_sql} END AS spread",
        "__anyfix",
        CIDX,
        "__lr",
        PAD,
        f"{inv_sql} AS __inv",
        f"{fix_sql} AS __fix",
        f"CASE WHEN {fix_sql} THEN high END AS __hi0",
        f"CASE WHEN {fix_sql} THEN low END AS __lo0",
    )

    # F5 ffill source: last non-null spread among post-F4 rows (spike
    # rows included — the reference ffills before the spike drop).
    # F6 lag: previous post-F4 row, struct-wrapped so its NULL close
    # still counts as "the previous row" (T3) instead of being skipped.
    # __pc_incl (same running last, current row INCLUDED) exists only
    # so the chunk's last real row doubles as the chunk's carry summary
    # below — one more column in the same window pass, no extra scan.
    surv_spread_sql = f"CASE WHEN (NOT {PAD}) AND (NOT __inv) THEN spread END"
    prev_struct_sql = (
        f"CASE WHEN (NOT {PAD}) AND (NOT __inv)"
        " THEN named_struct('c', close) END"
    )
    pdd = (
        pdd.selectExpr(
            "*",
            f"last({surv_spread_sql}, true) OVER ({run_sql}) AS __sf_loc",
            f"last({prev_struct_sql}, true) OVER ({run_prev_sql}) AS __pc_loc",
            f"last({prev_struct_sql}, true) OVER ({run_sql}) AS __pc_incl",
        )
        .filter(f"NOT {PAD}")
        .drop(PAD)
    )

    # -- pass-2 state folded into pass-1's sorted subtree ---------------
    # The densify stage (J4+W2+W4) needs, per SURVIVOR row, its
    # PREDECESSOR survivor's (ts, close, running spread ffill) — the
    # backward bridge. This used to cost a second full-row
    # exchange+sort over the survivor frame (the checkpoint loses
    # partitioning under AQE, so the window re-shuffled everything).
    # Survivorship = post-F4 AND NOT F6-spike, and the spike lag is
    # the PREVIOUS post-F4 row — which is in-chunk-known for every
    # candidate EXCEPT the chunk's first (its lag is the cross-chunk
    # __pc_carry). So the fold works two-versioned: compute every
    # densify window against the KNOWN survivors (non-first
    # candidates) here, inside the pass-1 sort (Filter preserves the
    # ordering — no new exchange; every window below shares the one
    # ASC order), and resolve the single carry-dependent row per chunk
    # on the O(C) summary:
    # - __spike_loc: F6 flag for non-first candidates (post-fix
    #   values, T3 struct lag), NULL-lag → first candidate;
    # - __gf_b: running known-survivor spread ffill; the A-version
    #   (first candidate survives) is coalesce(__gf_b, fc.spread)
    #   since the first candidate is the EARLIEST candidate — later
    #   non-null spreads always win the running last;
    # - __pv_loc / __lsv: exclusive / inclusive running last of the
    #   known-survivor (ts, close, sf, gf) struct — the predecessor
    #   lookup and (at the chunk-last row) the chunk's last-survivor
    #   summary for the cross-chunk carry;
    # - __fc_incl: first-candidate summary struct — read at the
    #   chunk-last row it IS the per-chunk summary the carry
    #   resolution needs.
    thr = f"CAST('{spike_threshold!r}' AS DOUBLE)"
    hl_spike_sql = f"coalesce((high - low) / open > {thr}, false)"
    spike_loc_sql = (
        "(NOT __inv) AND __pc_loc IS NOT NULL AND ("
        f"{hl_spike_sql}"
        f" OR coalesce(abs((close - __pc_loc.c) / __pc_loc.c) > {thr},"
        " false))"
    )
    surv_known_sql = "(NOT __inv) AND __pc_loc IS NOT NULL AND NOT __spike_loc"
    fc_struct_sql = (
        "CASE WHEN (NOT __inv) AND __pc_loc IS NULL THEN named_struct("
        f"'ts', {ts}, 'c', close, 'hl', {hl_spike_sql}, 'sp', spread) END"
    )
    # FORWARD-EMITTING → BACKWARD-EMITTING bridge (round-5 verdict ask
    # #5 / ROADMAP §19 candidate (c)): the old design had every
    # survivor emit its gap FORWARD to the next survivor, which needs
    # the next-survivor timestamp — a running last over the DESCENDING
    # order, i.e. one extra full local re-sort of the frame per chunk
    # partition. Flipped: every survivor bridges BACK to its
    # predecessor, whose (ts, close, spread-state) ride in an ASC
    # running-last struct over the order pass 1 already sorted by —
    # the DESC sort is gone and the emitted flat rows are identical
    # (a bridge between consecutive survivors q < r carries q's close
    # and q's folded spread either way; only the emitting row moved
    # from q to r). __pv_loc is EXCLUSIVE (1 PRECEDING); __lsv is the
    # INCLUSIVE version whose value at the chunk-last row IS the
    # chunk's last-known-survivor summary for the O(C) cross-chunk
    # carry. (The "1 FOLLOWING .. UNBOUNDED FOLLOWING" frame stays
    # banned: WindowExec re-scans shrinking frames to the partition
    # end per row — O(rows·chunk_size), measured 122 s vs 15 s.)
    qstruct_sql = (
        f"CASE WHEN {surv_known_sql} THEN named_struct("
        f"'ts', {ts}, 'c', close, 'sf', __sf_loc, 'gf', __gf_b) END"
    )
    pdd = (
        pdd.selectExpr("*", f"{spike_loc_sql} AS __spike_loc")
        .selectExpr(
            "*",
            f"last(CASE WHEN {surv_known_sql} THEN spread END, true)"
            f" OVER ({run_sql}) AS __gf_b",
            f"first({fc_struct_sql}, true) OVER ({run_sql}) AS __fc_incl",
        )
        .selectExpr(
            "*",
            f"last({qstruct_sql}, true) OVER ({run_prev_sql}) AS __pv_loc",
            f"last({qstruct_sql}, true) OVER ({run_sql}) AS __lsv",
        )
    )
    frame = _mat2(pdd)

    # -- cross-chunk carries, ALL from one C-row summary ------------------
    # Each chunk's LAST real row (ts == __lr, exactly one per chunk)
    # already holds the chunk-edge summary in its running-window
    # columns: __sf_loc = last non-null post-F4 spread, __pc_incl =
    # last non-inverted close, __gf_b = last known-survivor spread,
    # __lsv = last known-survivor summary struct, __fc_incl = the
    # first candidate's (ts, close, hl-flag, spread). Resolution is a
    # chain of O(C) selects over that slice: prefix carries → the
    # per-chunk first-candidate verdict (its F6 lag is __pc_carry) →
    # the chunk's resolved last-survivor summary → the across-chunk
    # predecessor (__pv_carry) and survivor-spread carries the densify
    # fold consumes.
    p_part = f"PARTITION BY {', '.join(p)} " if p else ""
    prefix1_sql = (
        p_part
        + f"ORDER BY {CIDX} ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING"
    )
    spike_first_sql = (
        "__fc_incl IS NOT NULL AND (__fc_incl.hl OR"
        f" coalesce(abs((__fc_incl.c - __pc_carry.c) / __pc_carry.c)"
        f" > {thr}, false))"
    )
    # per-chunk LAST-SURVIVOR summary for the backward bridge: the
    # chunk's last known survivor (__lsv at the chunk-last row) wins —
    # every known survivor follows the first candidate — else the
    # first candidate if the chunk verdict says it survives. 'spf' is
    # that survivor's FINAL folded spread, built with THIS chunk's own
    # carries (exactly the value the old forward emitter computed at
    # the survivor row); the prefix running last over these summaries
    # is the cross-chunk predecessor every chunk-first survivor
    # bridges back to.
    ls_sql = (
        "CASE WHEN __lsv IS NOT NULL THEN named_struct("
        "'ts', __lsv.ts, 'c', __lsv.c, 'spf',"
        " CASE WHEN __anyfix = 1 THEN coalesce(__lsv.sf, __sf_carry)"
        " ELSE coalesce(__lsv.gf,"
        " CASE WHEN __surv_first THEN __fc_incl.sp END,"
        " __gf_carry2) END)"
        " WHEN __surv_first THEN named_struct("
        "'ts', __fc_incl.ts, 'c', __fc_incl.c, 'spf',"
        " CASE WHEN __anyfix = 1 THEN coalesce(__fc_incl.sp, __sf_carry)"
        " ELSE coalesce(__fc_incl.sp, __gf_carry2) END)"
        " END"
    )
    carries1 = (
        frame.filter(f"{ts} = __lr")
        .selectExpr(
            *part,
            "__anyfix",
            "__sf_loc",
            "__pc_incl",
            "__gf_b",
            "__fc_incl",
            "__lsv",
        )
        .selectExpr(
            *part,
            "__anyfix",
            "__gf_b",
            "__fc_incl",
            "__lsv",
            f"last(__sf_loc, true) OVER ({prefix1_sql}) AS __sf_carry",
            f"last(__pc_incl, true) OVER ({prefix1_sql}) AS __pc_carry",
        )
        .selectExpr(
            *part,
            "__anyfix",
            "__sf_carry",
            "__pc_carry",
            "__fc_incl",
            "__lsv",
            "__gf_b",
            f"{spike_first_sql} AS __spike_first",
            f"__fc_incl IS NOT NULL AND NOT ({spike_first_sql})"
            " AS __surv_first",
            # chunk's last survivor spread: known-survivor last wins
            # (later rows); else the surviving first candidate's
            f"coalesce(__gf_b, CASE WHEN __fc_incl IS NOT NULL AND NOT"
            f" ({spike_first_sql}) THEN __fc_incl.sp END) AS __chunk_sp",
        )
        .selectExpr(
            *part,
            "__anyfix",
            "__sf_carry",
            "__pc_carry",
            "__spike_first",
            "__surv_first",
            "__fc_incl",
            "__lsv",
            f"last(__chunk_sp, true) OVER ({prefix1_sql}) AS __gf_carry2",
        )
        .selectExpr(
            *part,
            "__sf_carry",
            "__pc_carry",
            "__spike_first",
            "__surv_first",
            "__fc_incl.ts AS __fc_ts",
            "__fc_incl.c AS __fc_c",
            "__fc_incl.sp AS __fc_sp",
            "__gf_carry2",
            f"{ls_sql} AS __ls",
        )
        .selectExpr(
            *part,
            "__sf_carry",
            "__pc_carry",
            "__spike_first",
            "__surv_first",
            "__fc_ts",
            "__fc_c",
            "__fc_sp",
            "__gf_carry2",
            f"last(__ls, true) OVER ({prefix1_sql}) AS __pv_carry",
        )
    )

    # F5's conditional ffill write-back (gated by the global F8 flag),
    # the RESOLVED F6 spike flag, and the densify state land in ONE
    # select after the single carry join. Write-back: for a non-null
    # spread, __sf (last non-null incl. own) IS the row's own value.
    # Spike: first candidate (NULL local lag) takes the chunk verdict,
    # everyone else its in-chunk flag. __pv.spf (the predecessor's
    # folded spread): with the write-back active every survivor's
    # spread is already ffilled — the fold collapses to
    # coalesce(sf, __sf_carry) over the predecessor's captured state;
    # without it, the version-selected known-survivor ffill with the
    # first-candidate and cross-chunk fallbacks.
    frame = (
        frame.join(F.broadcast(carries1), on=part, how="left")
        .selectExpr(
            *p,
            ts,
            "open",
            "high",
            "low",
            "close",
            "volume",
            "CASE WHEN __anyfix = 1 THEN coalesce(__sf_loc, __sf_carry)"
            " ELSE spread END AS spread",
            CIDX,
            "__inv",
            "__fix",
            "__hi0",
            "__lo0",
            "(NOT __inv) AND (CASE WHEN __pc_loc IS NULL THEN"
            " coalesce(__spike_first, false) ELSE __spike_loc END)"
            " AS __spike",
            # backward-bridge predecessor (ts, close, folded spread):
            # the first candidate (NULL local lag) bridges to the
            # cross-chunk carry; everyone else to the last in-chunk
            # known survivor, else the surviving first candidate, else
            # the carry. 'spf' applies the SAME fold the old forward
            # emitter computed at the predecessor row, from the
            # predecessor's captured (sf, gf) running state and this
            # chunk's carries.
            "CASE WHEN __pc_loc IS NULL THEN __pv_carry"
            " ELSE coalesce("
            "CASE WHEN __pv_loc IS NOT NULL THEN named_struct("
            "'ts', __pv_loc.ts, 'c', __pv_loc.c, 'spf',"
            " CASE WHEN __anyfix = 1 THEN coalesce(__pv_loc.sf, __sf_carry)"
            " ELSE coalesce(__pv_loc.gf, CASE WHEN coalesce(__surv_first,"
            " false) THEN __fc_sp END, __gf_carry2) END) END,"
            " CASE WHEN coalesce(__surv_first, false) THEN named_struct("
            "'ts', __fc_ts, 'c', __fc_c, 'spf',"
            " CASE WHEN __anyfix = 1 THEN coalesce(__fc_sp, __sf_carry)"
            " ELSE coalesce(__fc_sp, __gf_carry2) END) END,"
            " __pv_carry) END AS __pv",
        )
    )

    def _audit(filtered: DataFrame, reason: str, hi: str = "high", lo: str = "low") -> DataFrame:
        return filtered.selectExpr(
            f"{ts} AS datetime",
            "CAST(open AS DOUBLE) AS open",
            f"CAST({hi} AS DOUBLE) AS high",
            f"CAST({lo} AS DOUBLE) AS low",
            "CAST(close AS DOUBLE) AS close",
            "CAST(volume AS DOUBLE) AS volume",
            f"'{reason}' AS reason",
        )

    audit_inverted = _audit(frame.filter("__inv"), schemas.REASON_DROPPED_INVERTED)
    # the structure audit logs PRE-fix high/low (stashed in __hi0/__lo0)
    audit_structure = _audit(
        frame.filter("__fix"), schemas.REASON_FIXED_STRUCTURE, "__hi0", "__lo0"
    )
    audit_spike = _audit(frame.filter("__spike"), schemas.REASON_DROPPED_SPIKE)

    # -- densify inputs: the survivor rows already carry their state ----
    # (the __pv predecessor struct folded above) — no second window
    # pass, no survivor re-shuffle. Each survivor emits the flat rows
    # of the gap BEHIND it (backward bridge): same flat set as the old
    # forward emission — one bridge per consecutive survivor pair,
    # carrying the EARLIER survivor's close/spread — minus the DESC
    # sort the next-ts lookup needed. Chunks emptied by F4/F6 are
    # harmless: their summaries are all-NULL and the O(C) carries skip
    # them. The series-first survivor has a NULL __pv and emits only
    # itself.
    seq = frame.filter("(NOT __inv) AND (NOT __spike)").select(
        *p,
        ts,
        "open",
        "high",
        "low",
        "close",
        "volume",
        "spread",
        "__pv",
    )

    step_expr = f"interval {step}"
    exploded = seq.selectExpr(
        *p,
        "open",
        "high",
        "low",
        "close",
        "volume",
        "spread",
        "__pv",
        f"{ts} AS __real_ts",
        f"explode(sequence(coalesce(__pv.ts + {step_expr}, {ts}),"
        f" {ts}, {step_expr})) AS {ts}",
    )
    gap_sql = f"({ts} != __real_ts)"

    audit_gaps = exploded.filter(gap_sql).selectExpr(
        f"{ts} AS datetime",
        *[
            f"CAST(NULL AS DOUBLE) AS {c}"
            for c in ["open", "high", "low", "close", "volume"]
        ],
        f"'{schemas.REASON_GAP_BRIDGED}' AS reason",
    )

    dense = exploded.selectExpr(
        *p,
        ts,
        *[
            f"CASE WHEN {gap_sql} THEN __pv.c ELSE {c} END AS {c}"
            for c in ["open", "high", "low"]
        ],
        f"CASE WHEN {gap_sql} THEN __pv.c ELSE close END AS close",
        f"CASE WHEN {gap_sql} THEN 0.0D ELSE volume END AS volume",
        f"CASE WHEN {gap_sql} THEN __pv.spf ELSE spread END AS spread",
        f"CASE WHEN {gap_sql} THEN 1 ELSE 0 END AS is_flat",
    ).filter("close IS NOT NULL")

    final = cast_final(dense, p)
    # consensus rows FIRST — the vanilla engine's audit ordering, so
    # engine='auto' returns identically-ordered audit frames on both
    # sides of the size crossover (merge()'s documented tag grouping).
    # The deep consensus subtree is attached as the LEFT side of ONE
    # outer union over the pre-folded shallow (post-checkpoint) frames:
    # classic Datasets re-analyze the accumulated left side at every
    # union, so left-folding consensus-first would re-analyze the deep
    # tree once per union (measured ~0.3 s of pure driver time) — this
    # shape analyzes it once and still yields consensus-first order.
    shallow = reduce(
        DataFrame.unionByName,
        [audit_inverted, audit_structure, audit_spike, audit_gaps],
    )
    audit = audit_consensus.unionByName(shallow)
    return final, audit
