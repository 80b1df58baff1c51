"""Incremental late-data recompute — partition-pruned updates at 100 TB.

The reference is a closed-dataset batch engine: one late tick batch
means re-running the WHOLE pipeline (``/root/reference/src/
hybrid_merger.py:175-251`` has no notion of an update). At 100 TB that
is the difference between a minutes-long partition-pruned job and a
full-corpus rerun, so this module adds the missing piece as a
Spark-first design:

- **Mergeable candle state.** Tick minutes are stored as *partial
  aggregates* (the same partial/final split Spark's hash aggregate
  uses internally, persisted): ``min/max`` of the deterministic
  ``(ts, mid)`` ordering structs for open/close (exactly
  :func:`operators.ohlc.ticks_to_candles`'s T4-safe tiebreak),
  ``max/min`` mid, ask count, spread sum+count. A late batch touching
  an existing minute merges associatively — no raw-tick re-read.
- **Day-partitioned layout.** Candle state, final output and the audit
  log are parquet tables partitioned by ``d = to_date(datetime)``;
  updates rewrite only affected partitions via dynamic partition
  overwrite (``spark.sql.sources.partitionOverwriteMode=dynamic``
  semantics, set per-writer).
- **Windowed recompute with global carry-ins.** A new batch triggers a
  recompute of days ``>= overwrite_lo`` (earliest affected day, or the
  last existing output day when appending past the end — its trailing
  flat bridge changes; widened to the earliest new-or-changed M1 day,
  detected by per-day M1 fingerprints, so M1 backfill and in-span M1
  edits are never dropped; widened further by the **smoother
  backreach** — the W3 spread smoother's CENTERED ±2-row window means
  new rows change the smoothed spread of up to 2 merged rows *before*
  them, and the flat bridge ffills from those values, so the 2 most
  recent data days below the boundary and every bridge day in between
  are rewritten too), plus ``context_days`` of earlier *data* days
  (candles **or** M1 — either can be the nearest real rows below the
  boundary) whose rows absorb the ordered-window boundary (±2
  smoother frame, F6 lag, spread ffill carry) **and re-anchor the time
  grid**: when any data exists below ``overwrite_lo``, a from-scratch
  run's gapless grid enters the boundary day at 00:00, so the bounded
  recompute must include earlier rows for the flat bridge to regrow
  through the day boundary (without them a re-delivered mid-history
  batch would truncate the boundary day at its first real candle).
  Context rows are regenerated and then discarded at the
  ``overwrite_lo`` filter.
- **Incremental scalar state.** The whole-series scalars the reference
  computes over the closed dataset — exact median spread (A5), tick
  count (T6), the F8 any-fixed flag — fold from maintained state
  instead of a whole-history consensus join: ``day_scalars/`` holds
  per-day partials (ntick sum, anyfix max, and the day's tick-spread
  multiset as a sorted array — the exact median's input at candle
  grain). Only days whose candles changed are rebuilt — update cost is
  O(affected + context partitions), not O(history).
  The result is injected via :func:`plans.pipeline_fused.merge_fused`'s
  ``scalars_override``, so a bounded recompute fills exactly like a
  full rerun.
- **Scalar-drift detection.** Output partitions below the overwrite
  boundary keep fills computed from the scalars in force when they
  were written. Each update compares the new effective scalars (P9
  fill value, F8 flag) against the persisted ``scalars/`` row and, on
  drift, widens the rewrite to the whole state — still candle-scale
  (no tick re-read) — so ``read_final()`` always equals a from-scratch
  run, scalar-shifting batches included.

**Update-semantics contract** (the reference is a closed-batch tool —
``/root/reference/src/hybrid_merger.py:175-251`` has no update notion
— so this is the repo's own, stated explicitly):

- ``update(m1, new_ticks)`` takes the FULL current M1 history each
  call plus one tick batch. After any sequence of updates,
  ``read_final()`` equals a from-scratch
  :meth:`HybridMergerSpark.run` over the **concatenation of every
  delivered tick batch** (union semantics). Re-delivering a batch is
  therefore *not* a tick-level no-op: duplicate ticks double-count
  into volume/spread-average exactly as they would in the
  concatenated from-scratch input. Callers wanting exactly-once must
  dedup upstream (e.g. ``dropDuplicates`` on the tick key) — the
  engine guarantees equivalence to the union, nothing stronger.
- M1 rows may be **added** (head backfill or in-span) or **changed**
  between updates; per-day fingerprints (row count + xxhash64 XOR,
  kept in ``day_scalars/``) detect both and widen the rewrite to the
  earliest touched day. **Removing** every M1 row of a
  previously-seen day is unsupported and raises (a shrunk history
  cannot be reconciled day-locally).

Exactness: the recomputed slice is bit-identical to a from-scratch run
of the full pipeline over all ticks, provided the context window
resolves the ffill carry (it fails only if every candle in
``context_days`` is a structure-fixed row — ~2880 candles at the
default; raise ``context_days`` for pathological data). Verified
against the DuckDB full-pipeline oracle (``incremental_merge``
contract query) and against :meth:`HybridMergerSpark.merge` in
``tests/test_incremental.py``, including out-of-order batches that
rewrite existing minutes, and in ``tests/test_properties.py`` against
random 3- and 4-batch sequences with re-delivered and out-of-order
batches.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from institutional_fx_etl_spark.plans.pipeline import (
    HybridMergerSpark,
    fused_consensus_merge,
)
from institutional_fx_etl_spark.plans.pipeline_fused import merge_fused

#: partial-aggregate schema for one tick minute (all mergeable):
#: okey/ckey are the deterministic (ts, mid) ordering structs of
#: ticks_to_candles' min_by/max_by tiebreak (null when mid is null).
_PARTIAL_COLS = [
    "datetime",
    "okey",
    "ckey",
    "high",
    "low",
    "n_ask",
    "s_sum",
    "s_cnt",
]


def tick_partials(
    ticks: DataFrame,
    ts_col: str = "datetime",
    window_duration: str = "1 minute",
    partition_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Ticks → per-minute mergeable partials (A1-A3 partial states).

    ``finalize_partials(tick_partials(b1) ∪-merged tick_partials(b2))``
    equals ``ticks_to_candles(b1 ∪ b2)`` minute-for-minute: the struct
    min/max merge preserves the (ts, mid) tiebreak, counts/sums add.
    (Float caveat: spread sums merge in batch order, so a minute split
    across batches can differ in the last ulp from the single-pass
    average — the same reordering tolerance every shuffled Spark
    ``avg`` already has.)
    """
    mid = (F.col("ask") + F.col("bid")) / 2
    spread = F.col("ask") - F.col("bid")
    enriched = ticks.select(
        *partition_cols,
        F.col(ts_col).alias("__ts"),
        F.col("ask").alias("__ask"),
        mid.alias("__mid"),
        spread.alias("__spread"),
    )
    tiebreak = F.when(
        F.col("__mid").isNotNull(), F.struct(F.col("__ts"), F.col("__mid"))
    )
    return (
        enriched.groupBy(
            *partition_cols, F.window("__ts", window_duration).alias("__w")
        )
        .agg(
            F.min(tiebreak).alias("okey"),
            F.max(tiebreak).alias("ckey"),
            F.max("__mid").alias("high"),
            F.min("__mid").alias("low"),
            F.count("__ask").alias("n_ask"),
            F.sum("__spread").alias("s_sum"),
            F.count("__spread").alias("s_cnt"),
        )
        .select(
            *partition_cols,
            F.col("__w.start").alias(ts_col),
            *_PARTIAL_COLS[1:],
        )
    )


def merge_partials(
    parts: DataFrame,
    ts_col: str = "datetime",
    partition_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Associative merge of partials for the same minute (A4 done
    right: a single groupBy, not the reference's sort-luck regroup)."""
    return parts.groupBy(*partition_cols, ts_col).agg(
        F.min("okey").alias("okey"),
        F.max("ckey").alias("ckey"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.sum("n_ask").alias("n_ask"),
        F.sum("s_sum").alias("s_sum"),
        F.sum("s_cnt").alias("s_cnt"),
    )


def finalize_partials(
    parts: DataFrame,
    ts_col: str = "datetime",
    partition_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Partials → the ticks_to_candles output schema."""
    return parts.select(
        *partition_cols,
        ts_col,
        F.col("okey.__mid").alias("open"),
        "high",
        "low",
        F.col("ckey.__mid").alias("close"),
        F.col("n_ask").cast("double").alias("volume"),
        (F.col("s_sum") / F.nullif(F.col("s_cnt"), F.lit(0))).alias("spread"),
    ).filter(F.col("close").isNotNull())


class IncrementalHybridPipeline:
    """Stateful incremental runner for the hybrid pipeline —
    single-symbol by default, multi-asset with ``partition_cols``
    (e.g. ``('symbol',)``): every input/output carries the key
    columns, scalar state and boundary math run per key, and the
    day-level overwrite boundary is the min across keys (conservative
    for unevenly-updating keys, exact either way). State layout under
    ``state_dir`` (all parquet, day-partitioned on ``d`` unless
    noted — each written day carries every key's rows, so dynamic
    overwrite stays complete; at very high key cardinality add the
    key to ``partitionBy`` in ``_write_partitions``): ``candles/``
    (tick-minute partials), ``final/`` (float32 output), ``audit/``,
    ``day_scalars/`` (per-(key, day) scalar partials incl. the
    tick-spread multiset), ``scalars/`` (unpartitioned, one row per
    key: the effective scalars the last update filled with — the
    drift check's baseline).
    """

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        spike_threshold: float = 0.005,
        consensus_threshold: float = 0.01,
        smooth_spread: bool = True,
        window_duration: str = "1 minute",
        chunk_seconds: int = 21600,
        context_days: int = 3,
        partition_cols: tuple[str, ...] = (),
        max_state_rows: int = 5_000_000,
    ):
        self.spark = spark
        self.state_dir = state_dir.rstrip("/")
        self.max_state_rows = max_state_rows
        # a multi-year state has thousands of day partitions; above 32
        # paths Spark launches a DISTRIBUTED listing job — one task per
        # directory, ~5,475 tasks per state read at 15 years, pure
        # scheduling overhead on a local/HDFS-fast filesystem. Raise
        # the threshold so listing stays driver-side; on an object
        # store with slow LIST calls, lower it back via session conf.
        spark.conf.set(
            "spark.sql.sources.parallelPartitionDiscovery.threshold",
            "100000",
        )
        self.engine = HybridMergerSpark(
            spike_threshold=spike_threshold,
            consensus_threshold=consensus_threshold,
            smooth_spread=smooth_spread,
            window_duration=window_duration,
        )
        self.chunk_seconds = chunk_seconds
        self.context_days = context_days
        self.partition_cols = tuple(partition_cols)

    # -- state helpers --------------------------------------------------
    def _bounded_collect(self, df: DataFrame, what: str) -> list:
        """Guarded metadata collect (round-4 verdict ask #8): the
        driver-side boundary math holds one row per (key, day) — at FX
        scale (10² symbols × 10⁴ days) a few MB, but a pipeline keyed
        on a high-cardinality column would silently turn this into a
        driver OOM. ``count()`` is a cheap aggregate-only job; above
        ``max_state_rows`` we fail fast with guidance instead. The
        join-based alternative (diff day-state distributively, collect
        only the changed set) trades this bound for 3 extra shuffles
        per update; the guard keeps the cheap path honest."""
        n = df.count()
        if n > self.max_state_rows:
            raise RuntimeError(
                f"incremental {what} metadata has {n} (key, day) rows, "
                f"over max_state_rows={self.max_state_rows}. The "
                "driver-side boundary math is O(keys x days); for "
                "high-cardinality keys partition the state by key and "
                "run one IncrementalHybridPipeline per key range, or "
                "raise max_state_rows if the driver has the memory "
                f"(~100 bytes/row => {n * 100 // 2**20} MB here)."
            )
        return df.collect()

    def _path(self, name: str) -> str:
        return f"{self.state_dir}/{name}"

    def _read_state(self, name: str) -> DataFrame | None:
        from pyspark.errors import AnalysisException

        try:
            return self.spark.read.parquet(self._path(name))
        except AnalysisException:  # path-not-found: first update
            return None
        # any other error (corrupt files, transient IO) propagates —
        # silently treating it as "first update" would fork state on
        # top of the unreadable data

    @staticmethod
    def _write_partitions(df: DataFrame, path: str) -> None:
        """Dynamic partition overwrite: only the day partitions present
        in ``df`` are replaced; everything else is untouched. The
        pre-write repartition clusters each day into one task, so a
        partition is one parquet file instead of one per (task, day) —
        at a 15-year first build that is 5,475 files, not ~175k."""
        (
            df.repartition("d")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("d")
            .parquet(path)
        )

    # -- the update ----------------------------------------------------
    def update(self, m1: DataFrame, new_ticks: DataFrame) -> DataFrame:
        """Ingest one tick batch; recompute + rewrite only the affected
        day partitions. Returns the recomputed ``final`` slice (rows
        with ``datetime`` on days >= the overwrite boundary).

        With ``partition_cols`` every boundary quantity (earliest
        affected day, changed-m1 widening, trailing-bridge rule,
        scalar drift, smoother backreach, context days) is computed
        PER KEY and the day-level overwrite boundary is the minimum
        across keys — conservative (a hot symbol's rewrite also
        rewrites quiet symbols' rows on those days, byte-identically)
        but day-partition-exact, since state stays partitioned by
        ``d`` alone and each written day carries every key's rows."""
        spark = self.spark
        p = self.partition_cols

        def sk(row):
            return tuple(row[c] for c in p)

        parts_new = tick_partials(
            self.engine.filter_ticks(new_ticks),
            window_duration=self.engine.window_duration,
            partition_cols=p,
        ).withColumn("d", F.to_date("datetime"))
        parts_new = parts_new.localCheckpoint(eager=True)
        affected: dict[tuple, set] = {}
        for r in self._bounded_collect(
            parts_new.select(*p, "d").distinct(), "affected-days"
        ):
            affected.setdefault(sk(r), set()).add(r["d"])
        if not affected:
            raise RuntimeError("empty tick batch after F1/F2 filters (S5 abort)")
        days_affected = sorted({d for ds in affected.values() for d in ds})
        new_lo = {s: min(ds) for s, ds in affected.items()}

        part_cols = [*p, *_PARTIAL_COLS]

        # 1. merge into candle state (only affected DAY partitions
        # move; prior rows of every key on those days ride along so
        # the rewritten day partition stays complete)
        existing = self._read_state("candles")
        if existing is not None:
            prior = existing.filter(
                F.col("d").isin([str(x) for x in days_affected])
            )
            merged_parts = merge_partials(
                prior.select(*part_cols).unionByName(
                    parts_new.select(*part_cols)
                ),
                partition_cols=p,
            ).withColumn("d", F.to_date("datetime"))
        else:
            merged_parts = parts_new
        self._write_partitions(merged_parts.localCheckpoint(eager=True), self._path("candles"))
        candles_state = self.spark.read.parquet(self._path("candles"))

        # 2. per-(key, day) m1 fingerprints (ONE candle-grain groupBy —
        # the same full-m1 scan the old distinct-days probe already
        # paid; collect is day-count-bounded metadata). A day is
        # "changed" when it is new to state OR its (count, hash-sum)
        # moved — this covers the reference's canonical long-M1-head
        # scenario (all m1 days are new on the first update), head
        # backfill, AND in-span m1 edits, which the old head-only
        # check missed. (docstring "row count + hash" contract:
        # count + bit_xor.)
        m1_fp = {
            (sk(r), r["d"]): (r["m1_cnt"], r["m1_fp"])
            for r in self._bounded_collect(
                m1.groupBy(*p, F.to_date("datetime").alias("d")).agg(
                    F.count(F.lit(1)).alias("m1_cnt"),
                    # bit_xor: order-independent and overflow-free
                    # under ANSI mode (a sum of hashes overflows long);
                    # the count disambiguates the even-multiplicity XOR
                    # cancellation
                    F.bit_xor(F.xxhash64(*m1.columns)).alias("m1_fp"),
                ),
                "m1-fingerprint",
            )
        }
        m1_days: dict[tuple, list] = {}
        for (s, d) in sorted(m1_fp):
            m1_days.setdefault(s, []).append(d)

        day_state = self._read_state("day_scalars")
        state_rows = (
            self._bounded_collect(
                day_state.select(*p, "d", "m1_cnt", "m1_fp", "ntick"),
                "day-scalar",
            )
            if day_state is not None
            else []
        )
        state_m1 = {
            (sk(r), r["d"]): (r["m1_cnt"], r["m1_fp"]) for r in state_rows
        }
        # candle-day sets per key, free from the same collect: every
        # candle day has a day_scalars row (refresh covers `affected`
        # each update) and candle days are exactly the rows with tick
        # content — no 5,475-task distinct scan over candles/ at a
        # 15-year state
        state_candle_days: dict[tuple, set] = {}
        for r in state_rows:
            if (r["ntick"] or 0) > 0:
                state_candle_days.setdefault(sk(r), set()).add(r["d"])
        removed = sorted(
            (s, d)
            for (s, d), (cnt, _) in state_m1.items()
            if cnt and (s, d) not in m1_fp
        )
        if removed:
            raise ValueError(
                "m1 history shrank: previously-seen m1 days "
                f"{removed} are absent from this update's m1 input "
                "(see module contract — day removal is unsupported)"
            )
        changed_m1: dict[tuple, list] = {}
        for (s, d) in sorted(m1_fp):
            if state_m1.get((s, d), (0, None)) != m1_fp[(s, d)]:
                changed_m1.setdefault(s, []).append(d)

        # 3. overwrite boundary PER KEY: earliest affected day, or the
        # key's last existing output day when appending past its end
        # (the trailing flat bridge extends); widened to the key's
        # earliest new-or-changed m1 day (first update: every m1 day
        # is new, so this reproduces the old m1-head widening). The
        # day-level boundary is the minimum across keys.
        final_state = self._read_state("final")
        old_max: dict[tuple, object] = {}
        if final_state is not None:
            for r in final_state.groupBy(*p).agg(F.max("d").alias("mx")).collect():
                old_max[sk(r)] = r["mx"]
        changed_keys = sorted(set(affected) | set(changed_m1))
        lo_by_key: dict[tuple, object] = {}
        for s in changed_keys:
            bounds = []
            if s in new_lo:
                bounds.append(new_lo[s])
            if changed_m1.get(s):
                bounds.append(changed_m1[s][0])
            if old_max.get(s) is not None:
                bounds.append(old_max[s])
            lo_by_key[s] = min(bounds)
        overwrite_lo = min(lo_by_key.values())

        # 4. merged-consensus scalar state, maintained incrementally:
        # one day-partitioned table (day_scalars/) of per-day partials —
        # ntick sum, anyfix max, the day's tick-spread multiset as a
        # sorted array (≤1440 doubles — the exact-median's input at
        # candle grain), and the day's m1 fingerprint. Only days whose
        # candles changed — plus new-or-changed m1 days — are rebuilt,
        # so the whole-history consensus join of earlier rounds is
        # gone: the update never rescans m1 against the full candle
        # state. Every refresh day has ≥1 merged row (candles or m1),
        # so its partition is always rewritten — a day can never go
        # silently stale under dynamic partition overwrite.
        refresh = sorted(
            {d for ds in affected.values() for d in ds}
            | {d for ds in changed_m1.values() for d in ds}
        )
        key_schema = list(parts_new.select(*p).schema) if p else []
        if refresh:
            refresh_strs = [str(d) for d in refresh]
            m1_r = m1.filter(
                F.to_date("datetime").isin(refresh_strs)
            )
            cand_r = finalize_partials(
                candles_state.filter(F.col("d").isin(refresh_strs)).select(
                    *part_cols
                ),
                partition_cols=p,
            )
            merged_r, _ = fused_consensus_merge(
                m1_r, cand_r, self.engine.consensus_threshold, p, False
            )
            inverted = F.coalesce(F.col("low") > F.col("high"), F.lit(False))
            bad_oc = F.coalesce(
                (F.col("open") > F.col("high"))
                | (F.col("open") < F.col("low"))
                | (F.col("close") > F.col("high"))
                | (F.col("close") < F.col("low")),
                F.lit(False),
            )
            day_rows = (
                merged_r.withColumn("d", F.to_date("datetime"))
                .groupBy(*p, "d")
                .agg(
                    F.sum(F.col("__is_tick").cast("int")).alias("ntick"),
                    F.max(
                        F.when(~inverted, bad_oc).cast("int")
                    ).alias("anyfix"),
                    F.sort_array(
                        F.collect_list(
                            F.when(F.col("__is_tick"), F.col("spread"))
                        )
                    ).alias("sps"),
                )
            )
            # attach the (key, day) m1 fingerprint (driver-known map,
            # key×day rows → broadcast-joined literal frame)
            from pyspark.sql.types import (
                DateType,
                LongType,
                StructField,
                StructType,
            )

            fp_schema = StructType(
                [
                    *key_schema,
                    StructField("d", DateType()),
                    StructField("m1_cnt", LongType()),
                    StructField("m1_fp", LongType()),
                ]
            )
            fp_pairs = sorted(
                {(s, d) for (s, d) in m1_fp if d in set(refresh)}
                | {(s, d) for s, ds in affected.items() for d in ds}
                | {(s, d) for s, ds in changed_m1.items() for d in ds}
            )
            fp_df = spark.createDataFrame(
                [
                    (*s, d, *m1_fp.get((s, d), (0, None)))
                    for (s, d) in fp_pairs
                ],
                fp_schema,
            )
            self._write_partitions(
                day_rows.join(F.broadcast(fp_df), [*p, "d"], "left").select(
                    *p,
                    "d",
                    "ntick",
                    "anyfix",
                    "sps",
                    F.coalesce("m1_cnt", F.lit(0)).alias("m1_cnt"),
                    "m1_fp",
                ),
                self._path("day_scalars"),
            )

        # 5. whole-history scalars from the maintained state, PER KEY:
        # a pruned scan of the per-day partials; the exact median runs
        # over the flattened per-day spread multisets
        day_all = self.spark.read.parquet(self._path("day_scalars"))
        sums = {
            sk(r): (r["nt"], r["af"])
            for r in day_all.groupBy(*p)
            .agg(F.sum("ntick").alias("nt"), F.max("anyfix").alias("af"))
            .collect()
        }
        meds = {
            sk(r): r["md"]
            for r in day_all.select(*p, F.explode("sps").alias("sp"))
            .groupBy(*p)
            .agg(F.percentile("sp", 0.5).alias("md"))
            .collect()
        }
        sc = {
            s: (meds.get(s), nt, af) for s, (nt, af) in sums.items()
        }
        if p:
            from pyspark.sql.types import (
                DoubleType,
                IntegerType,
                LongType,
                StructField,
                StructType,
            )

            sc_schema = StructType(
                [
                    *key_schema,
                    StructField("__med", DoubleType()),
                    StructField("__ntick", LongType()),
                    StructField("__anyfix", IntegerType()),
                ]
            )
            scalars = spark.createDataFrame(
                [(*s, md, nt, af) for s, (md, nt, af) in sorted(sc.items())],
                sc_schema,
            )
        else:
            med, ntick, anyfix = sc.get((), (None, None, None))
            scalars = self.spark.range(1).select(
                F.lit(med).cast("double").alias("__med"),
                F.lit(ntick).cast("long").alias("__ntick"),
                F.lit(anyfix).cast("int").alias("__anyfix"),
            )

        # 6. scalar-drift detection PER KEY: day partitions below
        # overwrite_lo keep fills computed from the scalars in force
        # when they were written. If this batch shifts a key's
        # EFFECTIVE scalars (the P9 fill value or the F8 any-fix
        # flag), a bounded rewrite would diverge from a from-scratch
        # run — widen the recompute to that key's whole span (still
        # candle-scale: no tick re-read).
        stored = self._read_state("scalars")
        stored_sc = (
            {
                sk(r): (r["med"], r["ntick"], r["anyfix"])
                for r in stored.collect()
            }
            if stored is not None
            else {}
        )
        for s, (md, nt, af) in sc.items():
            if s not in stored_sc or old_max.get(s) is None:
                continue
            omed, ont, oaf = stored_sc[s]
            old_eff = (0.0 if not ont else omed, oaf)
            new_eff = (0.0 if not nt else md, af)
            if old_eff != new_eff:
                s_days = sorted(
                    {d for (s2, d) in state_m1 if s2 == s}
                    | state_candle_days.get(s, set())
                    | affected.get(s, set())
                    | set(changed_m1.get(s, []))
                )
                if s_days:
                    overwrite_lo = min(overwrite_lo, s_days[0])

        # 7. smoother backreach: the W3 spread smoother is a CENTERED
        # ±2-row window, so a new/changed row changes the smoothed
        # spread of up to 2 merged rows BEFORE it — and the flat
        # bridge between those rows and the next real row ffills from
        # the changed smoothed value (r4 falsifying example: a batch
        # appending on Jan-4 moved Jan-3's candle ±2 windows, so the
        # whole Jan-3 bridge had to refill — days the boundary left
        # stale). Rows already inside the rewrite that PRECEDE the
        # first change absorb the backreach; only when fewer than 2
        # such rows exist does the boundary widen to the most recent
        # data day(s) below — so a plain append onto a populated day
        # still leaves earlier partitions untouched (pruning test).
        def _data_below(s, bound):
            return {
                d
                for d in state_candle_days.get(s, set())
                | affected.get(s, set())
                if d < bound
            } | {d for d in m1_days.get(s, []) if d < bound}

        if self.engine.smooth_spread:
            import datetime as _dt

            first_changed = {
                sk(r): r["fc"]
                for r in parts_new.groupBy(*p)
                .agg(F.min("datetime").alias("fc"))
                .collect()
            }
            for s, ds in changed_m1.items():
                fc_m1 = _dt.datetime.combine(ds[0], _dt.time.min)
                first_changed[s] = min(
                    first_changed.get(s, fc_m1), fc_m1
                )
            # existing rows in [lo_s, first_changed_s) per key — one
            # key-grouped count (broadcast bounds frame when keyed)
            if p:
                from pyspark.sql.types import (
                    DateType,
                    StructField,
                    StructType,
                    TimestampType,
                )

                b_schema = StructType(
                    [
                        *key_schema,
                        StructField("__lo", DateType()),
                        StructField("__fc", TimestampType()),
                    ]
                )
                bdf = spark.createDataFrame(
                    [
                        (*s, lo_by_key[s], first_changed[s])
                        for s in changed_keys
                    ],
                    b_schema,
                )
                pre_rows = {
                    sk(r): r["n"]
                    for r in candles_state.join(F.broadcast(bdf), list(p))
                    .filter(
                        (F.col("d") >= F.col("__lo"))
                        & (F.col("datetime") < F.col("__fc"))
                    )
                    .groupBy(*p)
                    .agg(F.count(F.lit(1)).alias("n"))
                    .collect()
                }
            else:
                n = candles_state.filter(
                    (F.col("d") >= F.lit(overwrite_lo))
                    & (F.col("datetime") < F.lit(first_changed[()]))
                ).count()
                pre_rows = {(): n}
            for s in changed_keys:
                need = 2 - pre_rows.get(s, 0)
                if need <= 0:
                    continue
                # full m1-only days inside [lo_s, changed day) also
                # count (day-granular — partial-day m1 rows on the
                # change day are conservatively ignored, which can
                # only widen more than strictly needed)
                need -= sum(
                    cnt
                    for (s2, d), (cnt, _) in m1_fp.items()
                    if s2 == s
                    and lo_by_key[s] <= d < first_changed[s].date()
                )
                if need <= 0:
                    continue
                back = sorted(_data_below(s, lo_by_key[s]), reverse=True)[
                    :need
                ]
                if back:
                    overwrite_lo = min(overwrite_lo, back[-1])

        # 8. context days: the most recent *data* days (candles OR m1)
        # below the (widened) boundary. They (a) absorb ordered-window
        # boundaries (±2 smoother, F6 lag, ffill carry) and (b)
        # re-anchor the time grid — with any data below overwrite_lo,
        # a from-scratch grid enters the boundary day at 00:00 via the
        # flat bridge, so the recompute must see those earlier rows to
        # regrow it (the r3 falsifying example: a mid-history batch
        # whose day held the only candles, with m1 two days earlier —
        # candle-only context found nothing and the regenerated
        # partition started mid-day, truncating 574 bridge rows).
        # Regenerated context rows are discarded at the overwrite_lo
        # filter below. context_days=3 closes the raw-window chain:
        # kept rows read ≤2 raw rows below the boundary (ctx days 1-2)
        # plus the bridge-fill source row's own ±2 smoother window
        # (≤2 rows below IT — ctx days 2-3).
        # context runs per key against the GLOBAL boundary: every key's
        # rows >= overwrite_lo get rewritten (day-level overwrite), so
        # every key needs its own absorbing rows below it
        all_keys = sorted(
            set(state_candle_days) | set(affected) | set(m1_days)
        )
        ctx_min = None
        for s in all_keys:
            ctx = sorted(_data_below(s, overwrite_lo), reverse=True)[
                : self.context_days
            ]
            lo_s = min(ctx, default=overwrite_lo)
            ctx_min = lo_s if ctx_min is None else min(ctx_min, lo_s)
        w_lo = ctx_min if ctx_min is not None else overwrite_lo

        # 9. windowed recompute over [w_lo, end) with global carry-ins
        cand_w = finalize_partials(
            candles_state.filter(F.col("d") >= F.lit(w_lo)).select(*part_cols),
            partition_cols=p,
        )
        m1_w = m1.filter(F.to_date("datetime") >= F.lit(w_lo))
        final_w, audit_w = merge_fused(
            m1_w,
            cand_w,
            spike_threshold=self.engine.spike_threshold,
            consensus_threshold=self.engine.consensus_threshold,
            smooth_spread=self.engine.smooth_spread,
            step=self.engine.window_duration,
            chunk_seconds=self.chunk_seconds,
            partition_cols=p,
            scalars_override=scalars,
        )

        out = final_w.withColumn("d", F.to_date("datetime")).filter(
            F.col("d") >= F.lit(overwrite_lo)
        )
        out = out.localCheckpoint(eager=True)
        audit_out = audit_w.withColumn("d", F.to_date("datetime")).filter(
            F.col("d") >= F.lit(overwrite_lo)
        )
        self._write_partitions(out, self._path("final"))
        self._write_partitions(
            audit_out.localCheckpoint(eager=True), self._path("audit")
        )
        # persist the effective scalars this update filled with — the
        # next update's drift check compares against them
        if p:
            scalars.selectExpr(
                *[f"`{c}`" for c in p],
                "__med AS med",
                "__ntick AS ntick",
                "__anyfix AS anyfix",
            ).write.mode("overwrite").parquet(self._path("scalars"))
        else:
            self.spark.range(1).select(
                F.lit(med).cast("double").alias("med"),
                F.lit(ntick).cast("long").alias("ntick"),
                F.lit(anyfix).cast("int").alias("anyfix"),
            ).write.mode("overwrite").parquet(self._path("scalars"))
        return out.drop("d")

    def read_final(self) -> DataFrame:
        """The whole current output (all day partitions)."""
        return self.spark.read.parquet(self._path("final")).drop("d")

    def read_audit(self) -> DataFrame:
        return self.spark.read.parquet(self._path("audit")).drop("d")


def fresh_state_dir(prefix: str = "/tmp/fx_incremental") -> str:
    """A unique scratch state dir (contract queries rebuild state per
    invocation so the update sequence stays idempotent per call)."""
    return f"{prefix}_{uuid.uuid4().hex}"
