"""Deep validation & cleaning (SURVEY.md §2.3 F4–F6, §2.2 P6/P8;
``/root/reference/src/hybrid_merger.py:145-173``).

Stage order is semantics-bearing and matches the reference exactly:

1. **F4 drop inverted candles** (``low > high``) — audit tag
   ``dropped_inverted``.
2. **F5 fix structural violations** (open/close outside [low, high]) —
   rewrite high/low with ``greatest``/``least`` (P6), null the fixed
   rows' spread and forward-fill it — audit tag
   ``fixed_structure_integrity``. The reference only runs the spread
   ffill when at least one row was fixed (a data-dependent branch); we
   reproduce that lazily with an "any fixed row in partition" window
   flag rather than a driver-side action.
3. **F6 drop volatility spikes** — amplitude ``(high-low)/open > θ`` OR
   minute-over-minute ``|pct_change(close)| > θ``, both computed on the
   *fixed* values over the surviving (post-F4) row order — audit tag
   ``dropped_volatility_spike``.

All drop predicates are null-safe (traps T1/T3): a NULL amplitude or a
first-row NULL pct_change keeps the row, as pandas does.

Everything is lazy, single plan, zero UDFs. The only expensive physical
ops are the window sorts (ffill, lag), partitioned by ``partition_cols``
at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from institutional_fx_etl_spark.functions.nullsafe import is_true
from institutional_fx_etl_spark.functions.windows import ffill, ordered_window
from institutional_fx_etl_spark.sources import schemas


def _audit_select(df: DataFrame, ts_col: str, reason: str) -> DataFrame:
    return df.select(
        F.col(ts_col).alias("datetime"),
        *[F.col(c).cast("double") for c in ["open", "high", "low", "close", "volume"]],
        F.lit(reason).alias("reason"),
    )


def validate_and_clean(
    df: DataFrame,
    spike_threshold: float = 0.005,
    ts_col: str = "datetime",
    partition_cols: tuple[str, ...] = (),
) -> tuple[DataFrame, DataFrame]:
    """Return ``(clean_candles, audit_rows)``."""
    order = (ts_col,)

    # -- F4: inverted candles ------------------------------------------
    inverted = is_true(F.col("low") > F.col("high"))
    audit_inverted = _audit_select(
        df.filter(inverted), ts_col, schemas.REASON_DROPPED_INVERTED
    )
    surviving = df.filter(~inverted)

    # -- F5: structural integrity --------------------------------------
    bad_oc = is_true(
        (F.col("open") > F.col("high"))
        | (F.col("open") < F.col("low"))
        | (F.col("close") > F.col("high"))
        | (F.col("close") < F.col("low"))
    )
    audit_structure = _audit_select(
        surviving.filter(bad_oc), ts_col, schemas.REASON_FIXED_STRUCTURE
    )

    flagged = surviving.withColumn("__bad_oc", bad_oc)
    fixed = (
        flagged.withColumn(
            "high",
            F.when(
                F.col("__bad_oc"), F.greatest("open", "close", "high")
            ).otherwise(F.col("high")),
        )
        .withColumn(
            "low",
            F.when(F.col("__bad_oc"), F.least("open", "close", "low")).otherwise(
                F.col("low")
            ),
        )
        .withColumn(
            "spread",
            F.when(F.col("__bad_oc"), F.lit(None).cast("double")).otherwise(
                F.col("spread")
            ),
        )
    )
    # The reference runs `spread.ffill()` only if any row was fixed
    # (hybrid_merger.py:156-161): with zero fixed rows, pre-existing
    # spread NULLs stay NULL. A whole-partition max over __bad_oc
    # reproduces that branch without a driver-side action.
    any_fixed = F.max(F.col("__bad_oc").cast("int")).over(
        Window.partitionBy(*partition_cols)
    ) > 0
    fixed = fixed.withColumn(
        "spread",
        F.when(any_fixed, ffill("spread", order, partition_cols)).otherwise(
            F.col("spread")
        ),
    ).drop("__bad_oc")

    # -- F6: volatility spikes (on fixed values, post-F4 row order) ----
    amp = (F.col("high") - F.col("low")) / F.col("open")
    prev_close = F.lag("close").over(ordered_window(order, partition_cols))
    jump = F.abs((F.col("close") - prev_close) / prev_close)
    spike = is_true(amp > F.lit(spike_threshold)) | is_true(
        jump > F.lit(spike_threshold)
    )
    with_spike = fixed.withColumn("__spike", spike)

    audit_spike = _audit_select(
        with_spike.filter(F.col("__spike")), ts_col, schemas.REASON_DROPPED_SPIKE
    )
    clean = with_spike.filter(~F.col("__spike")).drop("__spike")

    audit = audit_inverted.unionByName(audit_structure).unionByName(audit_spike)
    return clean, audit
