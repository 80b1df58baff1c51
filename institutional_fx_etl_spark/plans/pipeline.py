"""Pipeline orchestrator — the engine's flagship plan.

Re-expresses ``HybridDataMerger.run()`` (``/root/reference/src/
hybrid_merger.py:175-251``, ten eager pandas stages) as a small number
of lazy Spark plans. Stage order is semantics-bearing (SURVEY.md §7.4-6):
clean runs on the *gappy* merged series — flat candles are never
spike-checked — and W1's pct_change sees post-F4 surviving rows only.

Per-stage mapping (SURVEY.md §3):

  1-2. sources → :mod:`sources.readers` (S1/S2) or any candle/tick DF
  2.   tick resample → :func:`operators.ohlc.ticks_to_candles` (A1-A4)
  4.   consensus → :func:`operators.consensus.consensus_filter` (J1+F7+J2)
  5.   merge → :func:`functions.merge.combine_first` (J3, cell-level)
  6.   spread repair → :func:`operators.spread.repair_spread` (A5+P9+W3)
  7.   validate/clean → :func:`operators.clean.validate_and_clean` (F4-F6)
  8.   grid densify → :func:`operators.densify.densify_grid` (J4+W2+W4)
  9.   cast → :func:`cast_final` (P7, trap T9: double → float32/int8 at
       the sink only)
  10.  sinks → :mod:`sources.writers` (S3/S4)

The audit log is the union of every stage's tagged anomaly rows —
the reference's forensic-audit observability model (SURVEY.md §5.2).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from institutional_fx_etl_spark.functions.identifiers import bq
from institutional_fx_etl_spark.functions.nullsafe import drop_where
from institutional_fx_etl_spark.functions.timeutils import fx_offsession_mask
from institutional_fx_etl_spark.operators.clean import validate_and_clean
from institutional_fx_etl_spark.operators.densify import densify_gaps_explode
from institutional_fx_etl_spark.operators.ohlc import ticks_to_candles
from institutional_fx_etl_spark.operators.spread import repair_spread_windowed
from institutional_fx_etl_spark.sources import readers, schemas, writers
from institutional_fx_etl_spark.sources.writers import audit_path_for


def cast_final(df: DataFrame, partition_cols: tuple[str, ...] = ()) -> DataFrame:
    """Final Type Casting (hybrid_merger.py:243-246): float32 values,
    int8 flag — applied only at the sink; all upstream math is double."""
    return df.select(
        *partition_cols,
        "datetime",
        *[F.col(c).cast("float").alias(c) for c in ["open", "high", "low", "close", "volume", "spread"]],
        F.col("is_flat").cast("tinyint").alias("is_flat"),
    )


def fused_consensus_merge(
    m1: DataFrame,
    tick_candles: DataFrame,
    consensus_threshold: float,
    partition_cols: tuple[str, ...] = (),
    broadcast_m1: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Consensus (J1+F7+J2) fused with the coalescing merge (J3) as ONE
    full-outer join — a consensus-rejected tick minute resolves to the
    M1 side cell-wise, provably identical to drop-then-combine_first at
    one join instead of two (hybrid_merger.py:188-199 two-step).

    Returns ``(merged, audit_consensus)`` where ``merged`` carries the
    ``__is_tick`` marker column the spread-repair stage keys on.
    """
    keys = [*partition_cols, "datetime"]
    m1_side = F.broadcast(m1.alias("__m")) if broadcast_m1 else m1.alias("__m")
    joined = tick_candles.alias("__t").join(m1_side, on=keys, how="full_outer")

    # SQL-string expressions (JVM-parsed, one py4j call each) — the
    # consensus subtree is built by every pipeline-family query, so its
    # Column-tree construction cost was paid everywhere
    cat = (
        "coalesce(abs(__t.close - __m.close) >"
        f" CAST('{consensus_threshold!r}' AS DOUBLE), false)"
    )

    audit_consensus = joined.filter(cat).selectExpr(
        "datetime",
        *[
            f"CAST(__t.{c} AS DOUBLE) AS {c}"
            for c in ["open", "high", "low", "close", "volume"]
        ],
        f"'{schemas.REASON_REJECTED_CATASTROPHE}' AS reason",
    )

    # keys include caller-supplied partition_cols → backtick-quoted so
    # names needing escaping parse as identifiers
    merged = joined.selectExpr(
        *[bq(k) for k in keys],
        *[
            f"CASE WHEN {cat} THEN __m.{c}"
            f" ELSE coalesce(__t.{c}, __m.{c}) END AS {c}"
            for c in schemas.CANDLE_COLS
        ],
        f"(__t.close IS NOT NULL) AND (NOT {cat}) AS __is_tick",
    )
    return merged, audit_consensus


class HybridMergerSpark:
    """Spark-native HybridDataMerger: fuse a legacy M1 bar history with a
    raw tick stream into a gapless, validated 1-minute hybrid dataset.

    ``partition_cols`` (e.g. ``('symbol',)``) is the 100 TB design knob
    the single-symbol reference lacks: every shuffle, window sort, and
    spine generation keys on it, so a multi-asset dataset runs
    embarrassingly parallel (SURVEY.md §4.2, §7.4-3).
    """

    #: auto-crossover: above this estimated combined input size the
    #: single-symbol merge runs through the fused chunked engine
    #: (plans/pipeline_fused.py) instead of the vanilla one-sorter
    #: window plan. ~512 MB ≈ 8M candle rows at ~64 B/row — well below
    #: the ~56M-row point where the single-partition window sort dies
    #: (tools/scale_sanity.py --years=150), well above any size where
    #: the fused engine's fixed checkpoint cost is noticeable.
    FUSED_THRESHOLD_BYTES = 512 << 20
    #: row-count fallback for the same crossover when Catalyst has no
    #: real size estimate (e.g. checkpointed inputs)
    FUSED_THRESHOLD_ROWS = 8_000_000

    def __init__(
        self,
        spike_threshold: float = 0.005,
        consensus_threshold: float = 0.01,
        smooth_spread: bool = True,
        window_duration: str = "1 minute",
        partition_cols: tuple[str, ...] = (),
        broadcast_m1: bool = False,
        engine: str = "auto",
        chunk_seconds: int = 21600,
    ):
        if engine not in ("auto", "vanilla", "fused"):
            raise ValueError(f"unknown engine {engine!r}")
        self.spike_threshold = spike_threshold
        self.consensus_threshold = consensus_threshold
        self.smooth_spread = smooth_spread
        self.window_duration = window_duration
        self.partition_cols = tuple(partition_cols)
        self.broadcast_m1 = broadcast_m1
        self.engine = engine
        self.chunk_seconds = chunk_seconds

    # -- stage 2 -------------------------------------------------------
    def filter_ticks(self, ticks: DataFrame) -> DataFrame:
        """F1 + F2 (hybrid_merger.py:85-93): drop bad-priced ticks
        (null-safely — a NULL ask/bid survives, trap T1) and
        off-session (weekend) ticks."""
        bad = (F.col("ask") < F.lit(1e-4)) | (F.col("bid") < F.lit(1e-4))
        return drop_where(ticks, bad).filter(
            ~fx_offsession_mask(F.col("datetime"))
        )

    def resample_ticks(self, ticks: DataFrame) -> DataFrame:
        return ticks_to_candles(
            self.filter_ticks(ticks),
            window_duration=self.window_duration,
            partition_cols=self.partition_cols,
        )

    @staticmethod
    def _plan_size_bytes(df: DataFrame) -> int | None:
        """Catalyst's optimized-plan ``sizeInBytes`` — free (driver-side
        planning only, no job). Returns None when the statistic is the
        don't-know default (LogicalRDD without origin stats reports an
        effectively-infinite size)."""
        try:
            size = int(
                df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
        except Exception:  # noqa: BLE001 — estimation is best-effort
            return None
        return size if 0 <= size < (1 << 50) else None

    def _pick_engine(self, m1: DataFrame, tick_candles: DataFrame) -> str:
        if self.engine != "auto":
            return self.engine
        # multisym: every window/sort already keys on partition_cols —
        # there is no single-partition stage for fused to rescue
        if self.partition_cols:
            return "vanilla"
        sizes = [self._plan_size_bytes(df) for df in (m1, tick_candles)]
        if None not in sizes:
            total = sum(sizes)
            return "fused" if total >= self.FUSED_THRESHOLD_BYTES else "vanilla"
        # unknown estimate: count() only when both inputs are already
        # materialized (checkpointed LogicalRDD / cached InMemoryRelation
        # leaves — a count is then a cached-block scan, not a job that
        # executes the full upstream subtree before the real run). For
        # un-materialized stat-less plans, default to FUSED and document
        # the asymmetry: at small scale fused costs ≤~1.15× vanilla (a
        # bounded constant), while vanilla's single-partition window
        # sort DIES past ~56M candles — the wrong small-scale pick loses
        # milliseconds, the wrong large-scale pick loses the job. Pass
        # engine='vanilla' explicitly to override.
        if all(self._is_materialized(df) for df in (m1, tick_candles)):
            rows = m1.count() + tick_candles.count()
            return "fused" if rows >= self.FUSED_THRESHOLD_ROWS else "vanilla"
        return "fused"

    @staticmethod
    def _is_materialized(df: DataFrame) -> bool:
        """True when every leaf of the analyzed plan is an
        already-computed relation (checkpoint RDD or cache)."""
        try:
            leaves = df._jdf.queryExecution().analyzed().collectLeaves()
            return all(
                leaves.apply(i).getClass().getSimpleName()
                in ("LogicalRDD", "InMemoryRelation")
                for i in range(leaves.size())
            )
        except Exception:  # noqa: BLE001 — introspection is best-effort
            return False

    # -- stages 4-9 ----------------------------------------------------
    def merge(
        self, m1: DataFrame, tick_candles: DataFrame
    ) -> tuple[DataFrame, DataFrame]:
        """Run consensus → merge → spread repair → clean → densify → cast.

        Plan-shape note (the 100 TB structure): consensus (J1+F7+J2) and
        the coalescing merge (J3) are FUSED into one full-outer join —
        a consensus-rejected tick minute resolves to the M1 side
        cell-wise, which is provably the same result as drop-then-
        combine_first, at one join and one m1-aggregation instead of
        two of each (a lazy plan would otherwise recompute the shared
        subtrees). Spread repair then runs as whole-partition window
        aggregates over the same frame (no second pass over the tick
        candles), cleaning shares the single ordering sort, and
        densification explodes gap rows directly (no spine join).

        Returns ``(final, audit)``. Audit ordering preserves the
        reference's tag grouping (consensus, clean-stage tags, gaps).

        Engine selection (``engine='auto'``, the default): a long
        single-symbol history is the one shape where this plan's
        whole-series window sort runs on one task — at ~56M candles it
        dies (tools/scale_sanity.py --years=150). Above the crossover
        estimate the merge transparently runs through the bit-identical
        fused chunked engine (:func:`plans.pipeline_fused.merge_fused`,
        oracle-hash-equal, no single-partition sort) instead. The
        estimate is Catalyst's free ``sizeInBytes`` plan statistic —
        no extra job — with a candle ``count()`` fallback when the
        statistic is unavailable. Multi-symbol runs always take the
        vanilla plan: every window already keys on ``partition_cols``.
        """
        if self._pick_engine(m1, tick_candles) == "fused":
            from institutional_fx_etl_spark.plans.pipeline_fused import merge_fused

            return merge_fused(
                m1,
                tick_candles,
                spike_threshold=self.spike_threshold,
                consensus_threshold=self.consensus_threshold,
                smooth_spread=self.smooth_spread,
                step=self.window_duration,
                chunk_seconds=self.chunk_seconds,
                partition_cols=self.partition_cols,
                broadcast_m1=self.broadcast_m1,
            )
        p = self.partition_cols

        merged, audit_consensus = fused_consensus_merge(
            m1,
            tick_candles,
            self.consensus_threshold,
            partition_cols=p,
            broadcast_m1=self.broadcast_m1,
        )

        repaired = repair_spread_windowed(
            merged,
            tick_marker_col="__is_tick",
            smooth=self.smooth_spread,
            partition_cols=p,
        )

        clean, audit_clean = validate_and_clean(
            repaired, self.spike_threshold, partition_cols=p
        )

        dense, audit_gaps = densify_gaps_explode(
            clean, step=self.window_duration, partition_cols=p
        )

        final = cast_final(dense, p)
        audit = reduce(
            DataFrame.unionByName, [audit_consensus, audit_clean, audit_gaps]
        )
        return final, audit

    def run(self, m1: DataFrame, ticks: DataFrame) -> tuple[DataFrame, DataFrame]:
        """Full pipeline from raw relations (M1 candles + raw ticks)."""
        tick_candles = self.resample_ticks(ticks)
        return self.merge(m1, tick_candles)

    def run_csv(
        self,
        spark: SparkSession,
        m1_path: str,
        tick_path: str,
        output_path: str,
        output_format: str = "csv",
    ) -> tuple[DataFrame, DataFrame]:
        """File-to-file parity with the reference CLI (S1→S3/S4),
        including the empty-tick fatal guard (S5, hybrid_merger.py:180-182
        — surfaced as an exception, not ``sys.exit``)."""
        m1 = readers.read_m1_csv(spark, m1_path)
        ticks = readers.read_tick_csv(spark, tick_path)

        tick_candles = self.resample_ticks(ticks)
        if tick_candles.isEmpty():
            raise RuntimeError("FATAL: no valid tick data found")

        final, audit = self.merge(m1, tick_candles)
        sort_cols = [*self.partition_cols, "datetime"]
        if output_format == "parquet":
            writers.write_parquet(final, output_path, list(self.partition_cols) or None)
            writers.write_parquet(audit, audit_path_for(output_path))
        else:
            writers.write_csv(final, output_path, sort_cols)
            writers.write_csv(audit, audit_path_for(output_path), ["reason", "datetime"])
        return final, audit
