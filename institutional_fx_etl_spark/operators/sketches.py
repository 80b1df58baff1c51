"""Frequency sketches — the mergeable, fixed-size summaries a 100 TB
stream aggregates into when exact per-key state would not fit.

Count-min here is fully DETERMINISTIC (md5-derived hash rows, same
construction the engine's other md5-seeded operators use), so unlike a
seeded-random sketch the whole structure — and every estimate read out
of it — is oracle-checkable cross-engine: DuckDB rebuilds the identical
counter matrix with
``CAST(concat('0x', substr(md5(x),1,8)) AS BIGINT)`` mirroring Spark's
``conv(substr(md5(x),1,8),16,10)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def countmin_counters(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Build the d×w count-min counter matrix for a key stream.

    One scan: each row emits its ``depth`` (row, bucket) coordinates
    (bucket = md5-derived hash of the salted key, mod ``width``) and
    ONE hash aggregate counts them. The explode multiplies rows by
    ``depth`` BEFORE the exchange, but map-side partial aggregation
    collapses every partition to ≤ d·w cells, so the shuffle carries
    at most ``partitions · depth · width`` tiny rows no matter how
    many billions of events scanned — the whole point of a sketch.

    Output: i (hash row), bucket, cnt.
    """
    coords = ", ".join(
        f"struct({i} AS i, CAST(conv(substr(md5(concat('{salt}', {i}, '_',"
        f" CAST({key_col} AS STRING))), 1, 8), 16, 10) AS BIGINT)"
        f" % {width} AS bucket)"
        for i in range(depth)
    )
    return (
        df.selectExpr(f"explode(array({coords})) AS c")
        .groupBy(
            F.col("c.i").alias("i"),
            F.col("c.bucket").cast("bigint").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_estimate(
    df: DataFrame,
    key_col: str,
    top_n: int = 10,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Count-min point estimates vs exact truth for the stream's
    ``top_n`` heaviest keys — the sketch-accuracy audit (CMS never
    underestimates; the overestimate column is the collision noise,
    bounded in expectation by n/width per row and minimized over
    ``depth`` rows).

    The counter matrix and the exact top-n are two aggregates over the
    same scan; the estimate join broadcasts the d·w counter table
    (tiny by construction) onto the n key rows.

    Output: key, true_cnt, cms_est, overestimate (all BIGINT).
    """
    counters = countmin_counters(df, key_col, depth, width, salt)
    top = (
        df.groupBy(F.col(key_col).alias("key"))
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .selectExpr(
            "key",
            "true_cnt",
            "row_number() OVER (ORDER BY true_cnt DESC, key ASC) AS rn",
        )
        .filter(f"rn <= {top_n}")
        .drop("rn")
    )
    probes = ", ".join(
        f"struct({i} AS i, CAST(conv(substr(md5(concat('{salt}', {i}, '_',"
        f" CAST(key AS STRING))), 1, 8), 16, 10) AS BIGINT)"
        f" % {width} AS bucket)"
        for i in range(depth)
    )
    probed = top.selectExpr(
        "key", "true_cnt", f"explode(array({probes})) AS c"
    ).selectExpr(
        "key", "true_cnt", "c.i AS i", "CAST(c.bucket AS BIGINT) AS bucket"
    )
    return (
        probed.join(F.broadcast(counters), ["i", "bucket"])
        .groupBy("key", "true_cnt")
        .agg(F.expr("CAST(MIN(cnt) AS BIGINT) AS cms_est"))
        .selectExpr(
            "key",
            "true_cnt",
            "cms_est",
            "cms_est - true_cnt AS overestimate",
        )
    )
