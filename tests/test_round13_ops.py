"""Round-13 additions + the four round-12 ADVICE fixes.

ADVICE fixes under test:
1. ``t_closeness``: DECIMAL-before-multiply keeps the TVD numerator
   exact where the raw BIGINT product would overflow int64.
2. ``bootstrap_ci_mean``: groups with too few surviving replicas
   report NULL bounds, never an inverted interval.
3. ``theil_sen_slope``: pairless series surface with n_pairs=0 and a
   NULL slope instead of silently disappearing.
4. ``prefix_filter_pairs`` / ``prefix_filter_cap_report``: both now
   consume the ONE shared collapse relation (lockstep by
   construction) — the report's accounting still reconciles with the
   capped pair run.

New operators: garman_klass_vol, var_cvar, kendall_tau,
ccnet_perplexity_bucket, dp_count_laplace, ivfpq_probe_report (+ the
``max_cell`` probe cap on ivfpq_topk — r12 verdict task #5).
"""

import math

import pytest
from pyspark.sql import functions as F

from institutional_fx_etl_spark.operators.timeseries import (
    garman_klass_vol,
    kendall_tau,
    theil_sen_slope,
    var_cvar,
)


def _ticks(spark, rows):
    return spark.createDataFrame(
        rows, "sym string, ts timestamp, tid bigint, v double"
    )


# ----------------------------------------------------- ADVICE #3
def test_theil_sen_degenerate_series_surface(spark):
    from datetime import datetime as DT

    df = _ticks(
        spark,
        [
            # a real series: exact slope 2.0 per second
            ("up", DT(2024, 1, 1, 0, 0, 0), 1, 10.0),
            ("up", DT(2024, 1, 1, 0, 0, 1), 2, 12.0),
            ("up", DT(2024, 1, 1, 0, 0, 2), 3, 14.0),
            # single-point series: no pair
            ("one", DT(2024, 1, 1), 4, 5.0),
            # all points share one timestamp: no valid pair either
            ("flat_t", DT(2024, 1, 1), 5, 1.0),
            ("flat_t", DT(2024, 1, 1), 6, 2.0),
        ],
    )
    out = {
        r["sym"]: r
        for r in theil_sen_slope(
            df, "v", "ts", ("ts", "tid"), ("sym",)
        ).collect()
    }
    assert set(out) == {"up", "one", "flat_t"}
    assert out["up"]["ts_slope"] == pytest.approx(2.0)
    for s in ("one", "flat_t"):
        assert out[s]["n_pairs"] == 0
        assert out[s]["ts_slope"] is None


# ----------------------------------------------------- ADVICE #1/#2
def test_t_closeness_exact_and_decimal_before_multiply(spark):
    from institutional_fx_etl_spark.operators.profiling import t_closeness

    # hand-checked TVD: global dist {a: 3/6, b: 2/6, c: 1/6};
    # group g1 = {a,a,b} -> p = {a: 2/3, b: 1/3, c: 0}
    # TVD = 0.5*(|2/3-1/2| + |1/3-1/3| + |0-1/6|) = 1/6
    df = spark.createDataFrame(
        [("g1", "a"), ("g1", "a"), ("g1", "b"),
         ("g2", "a"), ("g2", "b"), ("g2", "c")],
        "g string, sv string",
    )
    out = {r["g"]: r for r in t_closeness(df, ["g"], "sv").collect()}
    assert out["g1"]["t_closeness"] == pytest.approx(1 / 6, abs=1e-6)
    assert out["g2"]["t_closeness"] == pytest.approx(
        0.5 * (abs(1 / 3 - 1 / 2) + abs(1 / 3 - 1 / 3) + abs(1 / 3 - 1 / 6)),
        abs=1e-6,
    )
    # the overflow fix is an expression-shape property: the factors
    # must be DECIMAL(38,0) BEFORE the multiply (c*N wraps int64 past
    # ~3e9 rows otherwise) — pin it in the analyzed plan
    import re

    plan = t_closeness(df, ["g"], "sv")._jdf.queryExecution().analyzed().toString()
    assert re.search(r"cast\(__c#\d+L? as decimal\(38,0\)\)", plan)
    assert re.search(r"cast\(__cv#\d+L? as decimal\(38,0\)\)", plan)


def test_bootstrap_ci_clamps_thin_groups(spark):
    from institutional_fx_etl_spark.operators.profiling import (
        bootstrap_ci_mean,
    )

    # one row: most replicas resample it 0 times -> few survivors;
    # whatever survives, lo <= hi must hold (or both bounds NULL)
    df = spark.createDataFrame(
        [("g", 1.0, 1)], "g string, v double, rid bigint"
    )
    row = bootstrap_ci_mean(df, "g", "v", "rid", n_resamples=40).collect()[
        0
    ]
    if row["ci_lo"] is not None and row["ci_hi"] is not None:
        assert row["ci_lo"] <= row["ci_hi"]
    else:
        assert row["ci_lo"] is None and row["ci_hi"] is None


# ----------------------------------------------------- garman_klass
def test_garman_klass_matches_closed_form(spark):
    from datetime import datetime as DT

    df = _ticks(
        spark,
        [
            ("s", DT(2024, 1, 1, 9, 0, 0), 1, 100.0),  # open
            ("s", DT(2024, 1, 1, 9, 0, 1), 2, 110.0),  # high
            ("s", DT(2024, 1, 1, 9, 0, 2), 3, 95.0),  # low
            ("s", DT(2024, 1, 1, 9, 0, 3), 4, 105.0),  # close
        ],
    )
    row = garman_klass_vol(
        df, "v", "ts", ("ts", "tid"), ("sym",)
    ).collect()[0]
    assert (row["o"], row["hi"], row["lo"], row["c"]) == (
        100.0,
        110.0,
        95.0,
        105.0,
    )
    want = math.sqrt(
        0.5 * math.log(110.0 / 95.0) ** 2
        - (2 * math.log(2) - 1) * math.log(105.0 / 100.0) ** 2
    )
    assert row["gk_vol"] == pytest.approx(want, abs=1e-6)


def test_garman_klass_nonnegative_under_sqrt(spark):
    # extreme close/open vs tiny range: hi/lo bounds force the
    # expression >= 0, so gk_vol is never NaN
    from datetime import datetime as DT

    rows = []
    for i, v in enumerate([1.0, 50.0]):  # o=1, c=50 == hi, lo=1
        rows.append(("x", DT(2024, 1, 1, 0, 0, i), i, v))
    row = garman_klass_vol(
        _ticks(spark, rows), "v", "ts", ("ts", "tid"), ("sym",)
    ).collect()[0]
    assert row["gk_vol"] is not None and not math.isnan(row["gk_vol"])


# ----------------------------------------------------- var_cvar
def test_var_cvar_exact_small_series(spark):
    from datetime import datetime as DT

    # moves: -5, +1, -3, +2, -1  (micro-exact)
    vals = [10.0, 5.0, 6.0, 3.0, 5.0, 4.0]
    rows = [
        ("s", DT(2024, 1, 1, 0, 0, i), i, v) for i, v in enumerate(vals)
    ]
    row = var_cvar(
        _ticks(spark, rows), "v", ("ts", "tid"), ("sym",), alpha_pct=40
    ).collect()[0]
    # n=5 moves, k = ceil(5*40/100) = 2; sorted moves: -5,-3,-1,1,2
    assert row["n_returns"] == 5 and row["k_tail"] == 2
    assert row["var_loss"] == pytest.approx(3.0)  # -(-3)
    assert row["cvar_loss"] == pytest.approx(4.0)  # -(-5-3)/2


def test_var_cvar_rejects_bad_alpha(spark):
    with pytest.raises(ValueError):
        var_cvar(None, "v", ("ts",), ("s",), alpha_pct=0)


# ----------------------------------------------------- kendall_tau
def test_kendall_tau_perfect_and_tied(spark):
    from datetime import datetime as DT

    rows = []
    # strictly increasing -> tau_b = 1
    for i in range(5):
        rows.append(("inc", DT(2024, 1, 1, 0, 0, i), i, float(i)))
    # strictly decreasing -> tau_b = -1
    for i in range(5):
        rows.append(("dec", DT(2024, 1, 1, 0, 0, i), 10 + i, float(-i)))
    # constant y -> all y-ties, tau_b NULL
    for i in range(4):
        rows.append(("const", DT(2024, 1, 1, 0, 0, i), 20 + i, 7.0))
    out = {
        r["sym"]: r
        for r in kendall_tau(
            _ticks(spark, rows), "v", "ts", ("ts", "tid"), ("sym",)
        ).collect()
    }
    assert out["inc"]["tau_b"] == pytest.approx(1.0)
    assert out["inc"]["concordant"] == 10
    assert out["dec"]["tau_b"] == pytest.approx(-1.0)
    assert out["const"]["tau_b"] is None
    assert out["const"]["n_pairs"] == 6


def test_kendall_tau_tie_correction(spark):
    from datetime import datetime as DT

    # x strictly increasing; y = [1, 1, 2]: one y-tie pair
    rows = [
        ("t", DT(2024, 1, 1, 0, 0, 0), 0, 1.0),
        ("t", DT(2024, 1, 1, 0, 0, 1), 1, 1.0),
        ("t", DT(2024, 1, 1, 0, 0, 2), 2, 2.0),
    ]
    row = kendall_tau(
        _ticks(spark, rows), "v", "ts", ("ts", "tid"), ("sym",)
    ).collect()[0]
    # C=2, D=0, tx=0, ty=1, n0=3 -> tau_b = 2/sqrt(3*2)
    assert row["concordant"] == 2 and row["discordant"] == 0
    assert row["tau_b"] == pytest.approx(2 / math.sqrt(6), abs=1e-6)


# ----------------------------------------------------- ccnet bucket
def test_ccnet_buckets_are_thresholded_terciles(spark):
    from institutional_fx_etl_spark.operators.text import (
        ccnet_perplexity_bucket,
    )

    # 9 docs with distinct repetitive vocabularies -> 9 distinct
    # perplexities; terciles must split 3/3/3 by threshold
    docs = spark.createDataFrame(
        [
            (i, " ".join("w%d" % (j % (i + 2)) for j in range(20)))
            for i in range(9)
        ],
        "doc_id bigint, text string",
    )
    out = ccnet_perplexity_bucket(docs).collect()
    buckets = {}
    for r in out:
        buckets.setdefault(r["ppl_bucket"], []).append(r["perplexity"])
    assert set(buckets) == {"head", "middle", "tail"}
    assert max(buckets["head"]) <= min(buckets["middle"])
    assert max(buckets["middle"]) <= min(buckets["tail"])
    assert sorted(len(v) for v in buckets.values()) == [3, 3, 3]


# ----------------------------------------------------- dp laplace
def test_dp_count_laplace_deterministic_and_calibrated(spark):
    from institutional_fx_etl_spark.operators.profiling import (
        dp_count_laplace,
    )

    df = spark.createDataFrame(
        [("en", "web")] * 100 + [("de", "web")] * 50 + [("fr", "book")],
        "lang string, source string",
    )
    a = {
        (r["lang"], r["source"]): r
        for r in dp_count_laplace(df, ["lang", "source"]).collect()
    }
    b = {
        (r["lang"], r["source"]): r
        for r in dp_count_laplace(df, ["lang", "source"]).collect()
    }
    assert a.keys() == b.keys() and len(a) == 3
    for k in a:
        # deterministic across runs
        assert a[k]["dp_count"] == b[k]["dp_count"]
        # Laplace(1) noise: |noise| beyond 15 has probability ~3e-7
        assert abs(a[k]["dp_count"] - a[k]["n_true"]) < 15.0

    with pytest.raises(ValueError):
        dp_count_laplace(df, ["lang"], epsilon=0.0)


def test_dp_count_epsilon_scales_noise(spark):
    from institutional_fx_etl_spark.operators.profiling import (
        dp_count_laplace,
    )

    df = spark.createDataFrame(
        [("en", "web")] * 10, "lang string, source string"
    )
    n1 = dp_count_laplace(df, ["lang", "source"], epsilon=1.0).collect()[0]
    n4 = dp_count_laplace(df, ["lang", "source"], epsilon=4.0).collect()[0]
    # same seed -> same u -> noise scales exactly by 1/epsilon
    noise1 = n1["dp_count"] - n1["n_true"]
    noise4 = n4["dp_count"] - n4["n_true"]
    assert noise4 == pytest.approx(noise1 / 4.0, abs=1e-6)


# ----------------------------------------------------- ivfpq probe
def _emb(spark, n=60, dims=64):
    rows = []
    for i in range(n):
        rows.append((i, [((i * 13 + d * 7) % 23 - 11) / 23.0 for d in range(dims)]))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_ivfpq_probe_report_accounts_for_cap(spark):
    from institutional_fx_etl_spark.operators.similarity import (
        ivfpq_probe_report,
        ivfpq_topk,
    )

    emb = _emb(spark)
    rep = ivfpq_probe_report(
        emb, num_centroids=8, nprobe=2, max_cell=3
    ).collect()[0]
    assert rep["n_corpus"] == 60
    assert rep["n_cells_probed"] <= 2
    assert rep["n_probed_rows"] <= rep["n_corpus"]
    assert rep["probed_fraction"] == pytest.approx(
        rep["n_probed_rows"] / rep["n_corpus"], abs=1e-6
    )
    # capped scan: skipped rows == the report's ledger, and the scan
    # only returns hits from cells under the cap
    hits = ivfpq_topk(
        emb, k=10, num_centroids=8, nprobe=2, max_cell=3
    ).collect()
    uncapped = ivfpq_topk(emb, k=10, num_centroids=8, nprobe=2).collect()
    if rep["rows_skipped_by_cap"] > 0:
        assert len(hits) <= len(uncapped)
    else:
        assert [r["id"] for r in hits] == [r["id"] for r in uncapped]


def test_ivfpq_capped_equals_uncapped_when_cap_is_loose(spark):
    from institutional_fx_etl_spark.operators.similarity import ivfpq_topk

    emb = _emb(spark)
    capped = ivfpq_topk(
        emb, k=10, num_centroids=8, nprobe=2, max_cell=10_000
    ).collect()
    uncapped = ivfpq_topk(emb, k=10, num_centroids=8, nprobe=2).collect()
    assert [tuple(r) for r in capped] == [tuple(r) for r in uncapped]


# ----------------------------------------------------- ADVICE #4
def test_cap_report_reconciles_with_capped_pairs(spark):
    from institutional_fx_etl_spark.operators.dedup import (
        prefix_filter_cap_report,
        prefix_filter_pairs,
    )

    # boilerplate cohort (identical token sets) + distinct docs: the
    # collapse keeps completeness, the report's kept-candidate count
    # bounds the verified pairs from the capped run
    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(12)]
        + [
            # fully distinct vocabularies: no shared shingles, so the
            # ONLY over-cap pressure is the duplication cohort above
            (100 + i, "u%da u%db u%dc u%dd u%de u%df" % ((i,) * 6))
            for i in range(6)
        ],
        "doc_id bigint, text string",
    )
    kw = dict(jaccard_threshold=0.5, shingle_n=3, max_bucket=4)
    pairs = prefix_filter_pairs(docs, **kw)
    rep = prefix_filter_cap_report(docs, **kw).collect()[0]
    uncapped = prefix_filter_pairs(
        docs, jaccard_threshold=0.5, shingle_n=3, max_bucket=None
    )
    # duplication-driven skew: capped == uncapped (the escalation
    # property), and the report sees the cohort
    assert sorted(map(tuple, pairs.collect())) == sorted(
        map(tuple, uncapped.collect())
    )
    assert rep["n_exact_cohorts"] >= 1
    assert rep["n_collapsed_docs"] >= 12
    assert rep["candidates_dropped"] == 0


# ------------------------------------------- brute-force references
def test_var_cvar_matches_python_reference_random(spark):
    """Deterministic pseudo-random series vs a pure-Python oracle:
    the exact integer order-statistic path must agree with the naive
    sort at every alpha."""
    import math as m
    from datetime import datetime as DT, timedelta

    vals = [((i * 37 + 11) % 97 - 48) / 9.7 for i in range(60)]
    rows = [
        ("r", DT(2024, 1, 1) + timedelta(seconds=i), i, 100.0 + v)
        for i, v in enumerate(vals)
    ]
    for alpha in (1, 5, 25, 50, 99):
        row = var_cvar(
            _ticks(spark, rows), "v", ("ts", "tid"), ("sym",),
            alpha_pct=alpha,
        ).collect()[0]
        # micro-exact moves, matching the operator's quantization
        prev = [100.0 + v for v in vals]
        dm = [
            m.floor((prev[i + 1] - prev[i]) * 1e6 + 0.5)
            for i in range(len(prev) - 1)
        ]
        dm_sorted = sorted(dm)
        n = len(dm)
        k = -(-n * alpha // 100)  # ceil
        want_var = -dm_sorted[k - 1] / 1e6
        want_cvar = -(sum(dm_sorted[:k]) / k) / 1e6
        assert row["n_returns"] == n and row["k_tail"] == k
        assert row["var_loss"] == pytest.approx(want_var, abs=1e-6)
        assert row["cvar_loss"] == pytest.approx(want_cvar, abs=1e-6)


def test_kendall_tau_matches_python_reference_random(spark):
    import math as m
    from datetime import datetime as DT, timedelta

    # ties in both x (repeated timestamps) and y (quantized values)
    xs = [i // 3 for i in range(24)]  # repeated seconds
    ys = [((i * 29 + 7) % 11) / 2.0 for i in range(24)]
    rows = [
        ("k", DT(2024, 1, 1) + timedelta(seconds=xs[i]), i, ys[i])
        for i in range(24)
    ]
    row = kendall_tau(
        _ticks(spark, rows), "v", "ts", ("ts", "tid"), ("sym",)
    ).collect()[0]
    ymicro = [m.floor(y * 1e6 + 0.5) for y in ys]
    C = D = tx = ty = 0
    for i in range(24):
        for j in range(i + 1, 24):
            dx = xs[j] - xs[i]
            dy = ymicro[j] - ymicro[i]
            if dx == 0:
                tx += 1
            if dy == 0:
                ty += 1
            if dx * dy > 0:
                C += 1
            elif dx * dy < 0 and dx != 0 and dy != 0:
                D += 1
    n0 = 24 * 23 // 2
    want = (C - D) / m.sqrt((n0 - tx) * (n0 - ty))
    assert row["concordant"] == C and row["discordant"] == D
    assert row["tau_b"] == pytest.approx(want, abs=1e-6)
