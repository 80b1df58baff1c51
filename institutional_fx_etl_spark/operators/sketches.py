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


#: α₂₅₆ = 0.7213/(1 + 1.079/256), frozen as a 6-dp literal so both
#: engines multiply by the identical double (same discipline as the
#: Benford table).
HLL_ALPHA_256 = 0.718272

HLL_M = 256  # registers (b = 8 index bits)
HLL_RHO_CAP = 30  # keeps the harmonic sum in exact scaled BIGINTs


def hll_estimate(
    df: DataFrame,
    key_col: str,
    group_col: str,
    salt: str = "hll",
) -> DataFrame:
    """Deterministic HyperLogLog distinct-count estimate per group,
    WITH the exact truth beside it — the mergeable cardinality sketch
    a 100 TB pipeline keeps per partition/day, here in a construction
    where every intermediate is oracle-checkable:

    - hash: 60 md5 bits (15 hex chars — stays positive in a BIGINT),
      register = low 8 bits, ``rho`` = leading-zero rank of the
      remaining 52 bits read off ``length(bin(w))`` — INTEGER STRING
      ops, no float log, identical on any engine;
    - registers: one ``max(rho)`` aggregate, shuffle bounded by
      groups·m (the sketch property — state never tracks keys);
    - harmonic sum: ``Σ 2^(-M_j) = 2^(-cap) · Σ 2^(cap - M_j)`` — the
      right side is an EXACT BIGINT sum (rho capped at 30 ⇒ terms are
      integers ≤ 2³⁰), so distributed summation order cannot drift
      the estimate;
    - the one ``ln`` (linear-counting small-range branch) and the
      final division are single mirrored double expressions, rounded.

    Output per group: grp, true_distinct (exact, for the audit),
    m, v_zero, sum_scaled (BIGINT), est (round 4).
    """
    m, cap = HLL_M, HLL_RHO_CAP
    h = (
        f"CAST(conv(substr(md5(concat('{salt}',"
        f" CAST({key_col} AS STRING))), 1, 15), 16, 10) AS BIGINT)"
    )
    hashed = df.selectExpr(
        f"{group_col} AS grp",
        f"{key_col} AS k",
        f"{h} AS h",
    ).selectExpr(
        "grp",
        "k",
        f"h % {m} AS j",
        f"CASE WHEN h div {m} = 0 THEN {cap}"
        f" ELSE least(53 - length(bin(h div {m})), {cap}) END AS rho",
    )
    regs = hashed.groupBy("grp", "j").agg(
        F.expr("CAST(MAX(rho) AS BIGINT) AS mj")
    )
    sketch = regs.groupBy("grp").agg(
        F.expr(f"CAST(COUNT(1) AS BIGINT) AS n_hit"),
        F.expr(
            f"CAST(SUM(CAST(pow(2, {cap} - mj) AS BIGINT)) AS BIGINT)"
            " AS s_hit"
        ),
    )
    truth = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.countDistinct(key_col).cast("bigint").alias("true_distinct")
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


def quantile_sketch(
    df: DataFrame,
    value_col: str,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    sub_bits: int = 4,
) -> DataFrame:
    """Mergeable approximate-quantile sketch with DETERMINISTIC
    log-grid buckets — the fixed-size percentile summary (p50/p95/p99
    dashboards) whose exact sibling (``exact_quantiles``) needs a
    value-ordered pass.

    Construction: values fix-point to micro-units; each lands in an
    exponential bucket read from the BIGINT's binary STRING length
    (``length(bin(v))`` = ⌊log₂v⌋+1 — integer string ops, the same
    no-float-log trick as the HLL rank) refined by the top ``sub_bits``
    mantissa bits — 2^sub_bits sub-buckets per octave bounds the
    relative error at ~2^(−sub_bits). State is (count, min value) per
    occupied bucket (≤ ~64·2^sub_bits rows — fixed regardless of data
    size, mergeable by add/min). The bucket id is order-isomorphic to
    the value, so the quantile readout is a cumulative walk; the
    reported estimate is the target bucket's MINIMUM OBSERVED value —
    an actual data point, deterministic, within one sub-bucket of the
    true quantile. The exact percentile rides along for the accuracy
    audit.

    Output per quantile: q, est (unit scale, round 6), exact
    (round 6), n.
    """
    v = f"CAST(floor({value_col} * 1000000 + 0.5) AS BIGINT)"
    # bucket id = (bitlen << sub_bits) | top mantissa bits — integer,
    # order-isomorphic to the value, so cumulative walks are valid
    bucket = (
        f"CASE WHEN {v} <= 0 THEN 0 ELSE"
        f" (length(bin({v})) * {1 << sub_bits})"
        f" + ({v} div CAST(pow(2, greatest(length(bin({v}))"
        f" - {1 + sub_bits}, 0)) AS BIGINT)) % {1 << sub_bits} END"
    )
    counts = (
        df.filter(f"{value_col} IS NOT NULL")
        .selectExpr(f"{bucket} AS bucket", f"{v} AS vm")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.expr("CAST(MIN(vm) AS BIGINT) AS lo"),
        )
        .selectExpr(
            "bucket",
            "c",
            "lo",
            "SUM(c) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED"
            " PRECEDING AND CURRENT ROW) AS cum",
            "SUM(c) OVER () AS n",
        )
    )
    outs = []
    for q in quantiles:
        est = (
            counts.filter(f"cum >= ceil({q!r} * n)")
            .groupBy("n")
            .agg(F.expr("CAST(min_by(lo, bucket) AS BIGINT) AS lo_micro"))
            .selectExpr(
                f"CAST({q!r} AS DOUBLE) AS q",
                "round(CAST(lo_micro AS DOUBLE) / 1000000, 6) AS est",
                "CAST(n AS BIGINT) AS n",
            )
        )
        outs.append(est)
    from functools import reduce

    sk = reduce(DataFrame.unionByName, outs)
    exacts = df.filter(f"{value_col} IS NOT NULL").agg(
        *[
            F.expr(
                f"round(CAST(percentile_disc({q!r}) WITHIN GROUP"
                f" (ORDER BY {value_col}) AS DOUBLE), 6) AS e_{i}"
            )
            for i, q in enumerate(quantiles)
        ]
    )
    wide = sk.crossJoin(F.broadcast(exacts))
    cases = " ".join(
        f"WHEN q = CAST({q!r} AS DOUBLE) THEN e_{i}"
        for i, q in enumerate(quantiles)
    )
    return wide.selectExpr(
        "q", "est", f"CASE {cases} END AS exact", "n"
    )


def bloom_membership(
    df: DataFrame,
    key_col: str,
    probes: DataFrame,
    probe_col: str = "probe",
    depth: int = 4,
    width: int = 4096,
    salt: str = "bf",
) -> DataFrame:
    """Deterministic Bloom-filter membership audit: build the filter
    over the stream's keys (md5-derived bit positions — the same
    construction discipline as the CMS/HLL, so the ENTIRE bit set and
    every probe verdict is oracle-checkable), probe it with a query
    relation, and report the verdict against exact membership — the
    false-positive audit that sizes a Bloom-pruned join.

    State: the distinct (row, bit) set — at most d·width rows however
    large the stream (the filter property). A probe is "maybe present"
    iff ALL ``depth`` of its bits are set; Bloom never false-negatives
    (machine-checked in the output: every truly-present probe has
    maybe_present = true).

    Output per probe: probe, maybe_present, actually_present,
    false_positive.
    """
    bit = (
        lambda col, i: f"CAST(conv(substr(md5(concat('{salt}', {i}, '_',"
        f" CAST({col} AS STRING))), 1, 8), 16, 10) AS BIGINT) % {width}"
    )
    key_structs = ", ".join(
        f"struct({i} AS i, {bit(key_col, i)} AS b)" for i in range(depth)
    )
    probe_structs = ", ".join(
        f"struct({i} AS i, {bit('probe', i)} AS b)" for i in range(depth)
    )
    bits_set = (
        df.selectExpr(f"explode(array({key_structs})) AS c")
        .select("c.i", "c.b")
        .distinct()
    )
    # alias first in its own select: sibling selectExpr expressions
    # can't see the `probe` alias, so a probe_col != 'probe' call
    # would hit an unresolved-column error (round-7 ADVICE)
    probe_bits = (
        probes.selectExpr(f"{probe_col} AS probe")
        .selectExpr("probe", f"explode(array({probe_structs})) AS c")
        .select("probe", "c.i", "c.b")
    )
    hits = (
        probe_bits.join(F.broadcast(bits_set), ["i", "b"], "left_semi")
        .groupBy("probe")
        .agg(F.count(F.lit(1)).alias("n_set"))
    )
    member = df.selectExpr(f"{key_col} AS probe").distinct()
    return (
        probes.selectExpr(f"{probe_col} AS probe")
        .distinct()
        .join(hits, "probe", "left")
        .join(
            member.withColumn("__m", F.lit(True)), "probe", "left"
        )
        .selectExpr(
            "probe",
            f"COALESCE(n_set, 0) = {depth} AS maybe_present",
            "COALESCE(__m, false) AS actually_present",
            f"COALESCE(n_set, 0) = {depth} AND NOT COALESCE(__m, false)"
            " AS false_positive",
        )
    )
