"""Fixed, explicitly-declared schemas (SURVEY.md §1.2).

The reference declares every scan schema explicitly (``names=`` +
``dtype=`` at ``/root/reference/src/hybrid_merger.py:44-46,68-71``) and
never relies on inference; we do the same — every reader takes one of
these StructTypes, never ``inferSchema``.

Numeric policy (trap T9): the reference narrows to float32 at scan and
computes in single precision. We scan/compute in DOUBLE (Spark
arithmetic promotes to double regardless) and cast to float/tinyint only
at the sink, mirroring the reference's own "Final Type Casting" stage
(``hybrid_merger.py:243-246``).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- reference-native relations (SURVEY.md §1.1) -------------------------

#: Raw M1 bar CSV: Date,Time,Open,High,Low,Close,TickVol with a header
#: line that the reference replaces (`header=0, names=...`).
M1_CSV_SCHEMA = T.StructType(
    [
        T.StructField("Date", T.StringType()),
        T.StructField("Time", T.StringType()),
        T.StructField("Open", T.DoubleType()),
        T.StructField("High", T.DoubleType()),
        T.StructField("Low", T.DoubleType()),
        T.StructField("Close", T.DoubleType()),
        T.StructField("TickVol", T.DoubleType()),
    ]
)

#: Raw tick CSV: datetime,ask,bid,av,bv — av/bv are declared but never
#: read (`usecols` at hybrid_merger.py:70); Catalyst prunes them here.
TICK_CSV_SCHEMA = T.StructType(
    [
        T.StructField("datetime", T.TimestampType()),
        T.StructField("ask", T.DoubleType()),
        T.StructField("bid", T.DoubleType()),
        T.StructField("av", T.DoubleType()),
        T.StructField("bv", T.DoubleType()),
    ]
)

#: Canonical candle relation used between pipeline stages.
CANDLE_COLS = ["open", "high", "low", "close", "volume", "spread"]

CANDLE_SCHEMA = T.StructType(
    [T.StructField("datetime", T.TimestampType())]
    + [T.StructField(c, T.DoubleType()) for c in CANDLE_COLS]
)

#: Final sink schema (hybrid_merger.py:243-246): float32 values, int8
#: flag, volume-before-spread physical order matching the reference's
#: output file layout (M1 frame order at hybrid_merger.py:51-52).
FINAL_SCHEMA = T.StructType(
    [
        T.StructField("datetime", T.TimestampType()),
        T.StructField("open", T.FloatType()),
        T.StructField("high", T.FloatType()),
        T.StructField("low", T.FloatType()),
        T.StructField("close", T.FloatType()),
        T.StructField("volume", T.FloatType()),
        T.StructField("spread", T.FloatType()),
        T.StructField("is_flat", T.ByteType()),
    ]
)

#: Forensic audit log (hybrid_merger.py:18-28): anomaly rows + reason tag.
AUDIT_SCHEMA = T.StructType(
    [
        T.StructField("datetime", T.TimestampType()),
        T.StructField("open", T.DoubleType()),
        T.StructField("high", T.DoubleType()),
        T.StructField("low", T.DoubleType()),
        T.StructField("close", T.DoubleType()),
        T.StructField("volume", T.DoubleType()),
        T.StructField("reason", T.StringType()),
    ]
)

AUDIT_COLS = ["datetime", "open", "high", "low", "close", "volume", "reason"]

#: Audit reason tags (hybrid_merger.py:152,157,170,195,229).
REASON_DROPPED_INVERTED = "dropped_inverted"
REASON_FIXED_STRUCTURE = "fixed_structure_integrity"
REASON_DROPPED_SPIKE = "dropped_volatility_spike"
REASON_REJECTED_CATASTROPHE = "rejected_tick_catastrophe"
REASON_GAP_BRIDGED = "gap_bridged_flat"

# --- driver test tables (/root/testdata, TESTDATA.md) --------------------

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
