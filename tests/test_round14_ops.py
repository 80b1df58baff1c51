"""Round-14 operator tests.

1. ``asof_join_tolerance``: direction x tolerance matrix against a
   brute-force per-row reference, plus degeneration to the untoleranced
   siblings when ``tolerance_s=None``.
"""

from __future__ import annotations

import datetime as dt

import pytest

from institutional_fx_etl_spark import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(master="local[4]", shuffle_partitions=4)
    yield s


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 2, 9, minute, second)


@pytest.fixture(scope="module")
def asof_frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts(0)),    # exact match at 09:00
            (2, _ts(7)),    # between quotes (09:05 / 09:10)
            (3, _ts(30)),   # far after the last quote
            (4, _ts(2, 30)),  # nearest tie: 150 s both sides
        ],
        "event_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (_ts(0), 10.0),
            (_ts(5), 20.0),
            (_ts(10), 30.0),
        ],
        "ts timestamp, quote double",
    )
    return left, right


def _run(left, right, **kw):
    from institutional_fx_etl_spark.operators.asof import asof_join_tolerance

    out = asof_join_tolerance(
        left, right, ts_col="ts", right_cols=("quote",), **kw
    )
    return {
        r["event_id"]: r["quote_asof"]
        for r in out.orderBy("event_id").collect()
    }


def test_asof_tolerance_backward(asof_frames):
    left, right = asof_frames
    got = _run(left, right, direction="backward", tolerance_s=180.0)
    # id1: exact match (gap 0); id2: 09:05 at gap 120 s; id3: last
    # quote 20 min stale -> masked; id4: 09:00 at gap 150 s
    assert got == {1: 10.0, 2: 20.0, 3: None, 4: 10.0}


def test_asof_tolerance_forward(asof_frames):
    left, right = asof_frames
    got = _run(left, right, direction="forward", tolerance_s=180.0)
    # id2: next quote 09:10 at gap 180 s (inclusive boundary);
    # id3: nothing follows; id4: 09:05 at gap 150 s
    assert got == {1: 10.0, 2: 30.0, 3: None, 4: 20.0}


def test_asof_tolerance_nearest_tie_prefers_backward(asof_frames):
    left, right = asof_frames
    got = _run(left, right, direction="nearest", tolerance_s=1000.0)
    # id4 sits exactly between 09:00 and 09:05 -> earlier wins the tie
    assert got[4] == 10.0
    # id3: backward masked at 1000 s? gap is 1200 s -> both sides out
    assert got[3] is None


def test_asof_tolerance_unbounded_degenerates_to_siblings(asof_frames):
    from institutional_fx_etl_spark.operators.asof import (
        asof_join,
        asof_join_nearest,
    )

    left, right = asof_frames
    got_b = _run(left, right, direction="backward", tolerance_s=None)
    ref_b = {
        r["event_id"]: r["quote_asof"]
        for r in asof_join(left, right, ts_col="ts")
        .orderBy("event_id")
        .collect()
    }
    assert got_b == ref_b

    got_n = _run(left, right, direction="nearest", tolerance_s=None)
    ref_n = {
        r["event_id"]: r["quote_near"]
        for r in asof_join_nearest(left, right, ts_col="ts")
        .orderBy("event_id")
        .collect()
    }
    assert got_n == ref_n


def test_asof_tolerance_rejects_bad_direction(asof_frames):
    left, right = asof_frames
    with pytest.raises(ValueError, match="direction"):
        _run(left, right, direction="sideways")


# --- welch_ttest ------------------------------------------------------


def test_welch_ttest_matches_brute_force(spark):
    import numpy as np

    from institutional_fx_etl_spark.operators.profiling import welch_ttest

    rng = np.random.RandomState(42)
    a = np.round(rng.normal(10.0, 2.0, 400), 6)
    b = np.round(rng.normal(10.5, 4.0, 300), 6)
    rows = [("a", float(x)) for x in a] + [("b", float(x)) for x in b]
    df = spark.createDataFrame(rows, "g string, v double")
    got = welch_ttest(df, "v", "g", "a", "b").collect()[0]

    # brute force on the SAME micro-quantized values the operator uses
    qa = np.floor(a * 1e6 + 0.5) / 1e6
    qb = np.floor(b * 1e6 + 0.5) / 1e6
    va, vb = qa.var(ddof=1), qb.var(ddof=1)
    na, nb = len(qa), len(qb)
    t = (qa.mean() - qb.mean()) / np.sqrt(va / na + vb / nb)
    dof = (va / na + vb / nb) ** 2 / (
        (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1)
    )
    assert got["n_a"] == na and got["n_b"] == nb
    assert got["mean_a"] == pytest.approx(qa.mean(), abs=1e-5)
    assert got["var_a"] == pytest.approx(va, abs=1e-5)
    assert got["t_stat"] == pytest.approx(t, abs=1e-5)
    assert got["dof"] == pytest.approx(dof, abs=1e-3)


# --- pareto_skyline_2d ------------------------------------------------


def _brute_skyline(points, maximize):
    sx = -1.0 if maximize[0] else 1.0
    sy = -1.0 if maximize[1] else 1.0
    canon = [(sx * x, sy * y, i) for i, (x, y) in enumerate(points)]
    keep = []
    for (x, y, i) in canon:
        dominated = any(
            (qx <= x and qy <= y and (qx < x or qy < y))
            for (qx, qy, j) in canon
            if j != i
        )
        if not dominated:
            keep.append(i)
    return sorted(keep)


@pytest.mark.parametrize("maximize", [(False, False), (False, True),
                                      (True, False), (True, True)])
def test_skyline_matches_brute_force(spark, maximize):
    import random

    from institutional_fx_etl_spark.operators.selection import (
        pareto_skyline_2d,
    )

    rng = random.Random(maximize[0] * 2 + maximize[1])
    pts = [
        (float(rng.randint(0, 20)), float(rng.randint(0, 20)))
        for _ in range(300)
    ]
    # force duplicates (identical points never dominate each other)
    pts += pts[:10]
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)],
        "pid long, x double, y double",
    )
    got = sorted(
        r["pid"]
        for r in pareto_skyline_2d(
            df, "x", "y", maximize=maximize, keep_cols=("pid",)
        ).collect()
    )
    assert got == _brute_skyline(pts, maximize)


def test_skyline_single_partition_window_is_domain_bounded(spark):
    """The only window in the plan runs over the per-x relation —
    row count == distinct x, not input rows."""
    from institutional_fx_etl_spark.operators.selection import (
        pareto_skyline_2d,
    )

    df = spark.range(10000).selectExpr(
        "id AS pid",
        "CAST(id % 5 AS DOUBLE) AS x",
        "CAST(id % 7 AS DOUBLE) AS y",
    )
    out = pareto_skyline_2d(df, "x", "y", keep_cols=("pid",))
    # x in {0..4}, y min always 0 -> frontier is x==0, y==0 only
    pids = {r["pid"] for r in out.collect()}
    assert pids == {i for i in range(10000) if i % 5 == 0 and i % 7 == 0}


# --- ngram_overlap_contamination --------------------------------------


def test_ngram_overlap_contamination_grades(spark):
    from institutional_fx_etl_spark.operators.text import (
        ngram_overlap_contamination,
    )

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            # verbatim copy -> every 3-gram hits -> dirty
            (1, "the quick brown fox jumps over the lazy dog"),
            # one shared trigram ("the quick brown") out of 4 -> 0.25
            (2, "see the quick brown cat sleep"),
            # disjoint -> clean
            (3, "completely different words entirely here now"),
            # too short for a 3-gram -> 0 grams, clean
            (4, "hi there"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in ngram_overlap_contamination(train, bench, n=3).collect()
    }
    assert got[1]["verdict"] == "dirty" and got[1]["overlap_ratio"] == 1.0
    assert got[2]["n_ngrams"] == 4 and got[2]["n_hit"] == 1
    assert got[2]["verdict"] == "suspect"
    assert got[3]["verdict"] == "clean" and got[3]["n_hit"] == 0
    assert got[4]["n_ngrams"] == 0 and got[4]["overlap_ratio"] == 0.0
    assert got[4]["verdict"] == "clean"


# --- corpus_flagship --------------------------------------------------


def test_corpus_flagship_ledger_stages(spark):
    from institutional_fx_etl_spark.plans.corpus import corpus_flagship

    eval_text = "alpha beta gamma delta epsilon zeta"
    rows = [
        # doc_id 0 -> eval split (doc_id % 20 == 0)
        (0, eval_text),
        # 1: verbatim eval copy -> decontaminated away
        (1, eval_text),
        # 2 & 3: exact duplicates -> one survives dedup
        (2, "one two three four five six seven"),
        (3, "one two three four five six seven"),
        # 4: too short for the quality gate (< 5 tokens)
        (4, "tiny doc here"),
        # 5: mean token length over 12 -> quality-dropped
        (5, " ".join(["x" * 20] * 6)),
        # 6-9: clean survivors
        (6, "the quick brown fox jumps over the lazy dog today"),
        (7, "pack these tokens into fixed length sequences now ok"),
        (8, "another perfectly ordinary training document goes here"),
        (9, "final clean document with enough plain words inside"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    led = {
        r["stage"]: (r["n_rows"], r["n_tokens"], r["max_unit"])
        for r in corpus_flagship(df, seq_len=16).collect()
    }
    assert led["00_input"][0] == 9           # doc 0 is eval
    assert led["01_decontaminated"][0] == 8  # doc 1 dropped
    assert led["02_deduped"][0] == 7         # one of 2/3 dropped
    assert led["03_quality"][0] == 5         # 4 and 5 dropped
    # survivors: 3 or 2 (7 tokens) + four 10/9/8-token docs
    total = led["03_quality"][1]
    assert total == led["04_packed"][1]      # packing conserves tokens
    import math

    assert led["04_packed"][0] == math.ceil(total / 16) or led[
        "04_packed"
    ][0] == (total // 16) + (1 if total % 16 else 0)
    assert led["04_packed"][2] <= 16 + led["03_quality"][2]


def test_corpus_flagship_packing_is_chunk_exact(spark):
    """Every pack except possibly the last holds >= seq_len tokens'
    START offsets — i.e. pack_id = floor(cum_before/seq_len) yields
    contiguous ids 0..n_packs-1."""
    from institutional_fx_etl_spark.plans.corpus import corpus_flagship

    rows = [
        (i + 1, " ".join(f"w{i}x{j}" for j in range(11)))
        for i in range(50)
    ]  # 11 distinct tokens each, disjoint across docs
    df = spark.createDataFrame(rows, "doc_id long, text string")
    led = {
        r["stage"]: (r["n_rows"], r["n_tokens"], r["max_unit"])
        for r in corpus_flagship(df, seq_len=64).collect()
    }
    n_docs, total = led["03_quality"][0], led["03_quality"][1]
    assert n_docs == 48  # ids 20 and 40 go to the eval split
    assert total == 48 * 11
    # start offsets 0,11,...,517 -> floor(x/64) covers 0..8
    assert led["04_packed"][0] == 9


# --- kneser_ney_bigram ------------------------------------------------


def test_kneser_ney_matches_reference(spark):
    from collections import Counter

    from institutional_fx_etl_spark.operators.text import kneser_ney_bigram

    corpus = [
        "san francisco is foggy",
        "new york is big",
        "san francisco is big",
        "francisco is not a common word",
        "the fog of san francisco",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    got = {
        r["bg"]: (r["cb"], r["p_mle"], r["p_kn"])
        for r in kneser_ney_bigram(df, top_k=1000).collect()
    }

    # reference KN on the same whitespace-lowercase tokenization
    bigrams = []
    for t in corpus:
        toks = t.lower().split()
        bigrams += [
            (toks[i], toks[i + 1]) for i in range(len(toks) - 1)
        ]
    cb = Counter(bigrams)
    cu = Counter()
    n1f = Counter()
    n1b = Counter()
    for (w1, w2), c in cb.items():
        cu[w1] += c
        n1f[w1] += 1
        n1b[w2] += 1
    n_types = len(cb)
    D = 0.75
    for (w1, w2), c in cb.items():
        p_mle = c / cu[w1]
        p_kn = max(c - D, 0.0) / cu[w1] + (D * n1f[w1] / cu[w1]) * (
            n1b[w2] / n_types
        )
        g = got[f"{w1} {w2}"]
        assert g[0] == c
        assert g[1] == pytest.approx(p_mle, abs=1e-6)
        assert g[2] == pytest.approx(p_kn, abs=1e-6)

    # the KN property: "francisco" is frequent but single-context, so
    # its continuation mass is low; "is" follows many contexts
    assert n1b["francisco"] < n1b["is"]


def test_kneser_ney_probabilities_sum_close_to_one(spark):
    """For each context w1, sum over SEEN w2 of P_KN <= 1 (the
    discounted mass held back funds unseen continuations)."""
    from institutional_fx_etl_spark.operators.text import kneser_ney_bigram

    docs = [(i, f"a b a c a b d {i % 3} b a") for i in range(30)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = kneser_ney_bigram(df, top_k=10000).collect()
    from collections import defaultdict

    per_ctx = defaultdict(float)
    for r in rows:
        per_ctx[r["bg"].split(" ")[0]] += r["p_kn"]
    for w1, s in per_ctx.items():
        assert s <= 1.0 + 1e-4, (w1, s)


# --- r15 early debuts -------------------------------------------------


def test_seasonal_decompose_recovers_planted_seasonality(spark):
    import math

    from institutional_fx_etl_spark.operators.timeseries import (
        seasonal_decompose,
    )

    # value = linear trend + period-7 sawtooth, no noise
    period, n = 7, 140
    rows = [
        ("s", i, float(10 + 0.5 * i + [3, -1, 2, -4, 0, 1, -1][i % 7]))
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "g string, idx long, v double")
    out = seasonal_decompose(
        df, "v", ("g",), ("idx",), period=period
    ).orderBy("idx").collect()
    assert len(out) == n
    # edges: first/last period//2 rows have NULL trend and resid
    assert out[0]["trend"] is None and out[-1]["resid"] is None
    # interior: trend ~ the linear part (MA of linear = linear;
    # sawtooth mean = 0), residual ~ 0
    mid = [r for r in out if r["trend"] is not None]
    for r in mid[5:20]:
        expected_trend = 10 + 0.5 * r["idx"]
        assert math.isclose(r["trend"], expected_trend, abs_tol=1e-4)
        assert abs(r["resid"]) < 1e-4
    # seasonal repeats with period 7 and sums to ~0
    season = {r["idx"] % 7: r["seasonal"] for r in out}
    assert abs(sum(season.values())) < 1e-4
    for r in out:
        assert math.isclose(
            r["seasonal"], season[r["idx"] % 7], abs_tol=1e-9
        )


def test_seasonal_decompose_rejects_even_period(spark):
    from institutional_fx_etl_spark.operators.timeseries import (
        seasonal_decompose,
    )

    df = spark.createDataFrame([("s", 1, 1.0)], "g string, i long, v double")
    with pytest.raises(ValueError, match="odd"):
        seasonal_decompose(df, "v", ("g",), ("i",), period=4)


def test_macd_signal_constant_series_is_flat(spark):
    from institutional_fx_etl_spark.operators.timeseries import macd_signal

    rows = [("s", i, 5.0) for i in range(60)]
    df = spark.createDataFrame(rows, "g string, i long, v double")
    out = macd_signal(df, "v", ("g",), ("i",)).collect()
    for r in out:
        # EWMA of a constant is the constant -> macd == 0 everywhere
        assert r["macd"] == 0.0 and r["histogram"] == 0.0
        assert r["crossover"] == 0


def test_macd_signal_step_crosses_zero(spark):
    from institutional_fx_etl_spark.operators.timeseries import macd_signal

    rows = [("s", i, 1.0 if i < 40 else 10.0) for i in range(80)]
    df = spark.createDataFrame(rows, "g string, i long, v double")
    out = macd_signal(df, "v", ("g",), ("i",)).orderBy("i").collect()
    # after the step the fast EMA leads: macd turns positive
    post = [r for r in out if 45 <= r["i"] <= 60]
    assert all(r["macd"] > 0 for r in post)
    # exactly one bullish histogram zero-cross after the step
    crosses = [r["i"] for r in out if r["crossover"] == 1]
    assert len(crosses) >= 1 and all(i >= 40 for i in crosses)


def test_survival_km_matches_hand_computation(spark):
    from institutional_fx_etl_spark.operators.profiling import survival_km

    # classic textbook set: events at 1,2,4; censored at 3
    rows = [
        ("g", 1.0, True),
        ("g", 2.0, True),
        ("g", 3.0, False),
        ("g", 4.0, True),
        ("g", 4.0, True),
    ]
    df = spark.createDataFrame(rows, "grp string, dur double, obs boolean")
    out = {
        r["t"]: r
        for r in survival_km(df, "dur", "obs", "grp").collect()
    }
    # t=1: n=5, d=1 -> S=0.8 ; t=2: n=4, d=1 -> 0.6
    # t=3: censored only -> S stays 0.6 ; t=4: n=2, d=2 -> 0.0
    assert out[1.0]["n_at_risk"] == 5 and out[1.0]["survival"] == 0.8
    assert out[2.0]["survival"] == 0.6
    assert out[3.0]["n_events"] == 0 and out[3.0]["survival"] == 0.6
    assert out[4.0]["n_at_risk"] == 2 and out[4.0]["survival"] == 0.0


def test_ndcg_eval_perfect_and_zero_rankings(spark):
    from institutional_fx_etl_spark.operators.similarity import ndcg_eval

    # 1-D embeddings: cosine of positive scalars is always 1, so the
    # ranking tiebreaks by id; labels decide relevance.
    # q0 (label 0): every other even id matches -> some gain;
    # q1 (label 1): no other vector has label 1 -> idcg 0 -> ndcg 0.
    rows = [(0, [1.0], 0), (1, [1.0], 1)] + [
        (i, [1.0], 0 if i % 2 == 0 else 2) for i in range(2, 14)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {
        r["q_id"]: r
        for r in ndcg_eval(df, df.filter("vec_id < 2"), k=10).collect()
    }
    assert out[1]["n_rel"] == 0 and out[1]["ndcg"] == 0.0
    assert out[0]["n_rel"] > 0
    # q0's relevant ids are the even ones; with cosine ties the rank
    # order is id order, which interleaves rel/non-rel -> 0 < ndcg < 1
    assert 0.0 < out[0]["ndcg"] <= 1.0


def test_welch_ttest_equal_means_near_zero_t(spark):
    from institutional_fx_etl_spark.operators.profiling import welch_ttest

    rows = [("a", float(i % 7)) for i in range(70)] + [
        ("b", float(i % 7)) for i in range(70)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    got = welch_ttest(df, "v", "g", "a", "b").collect()[0]
    assert got["t_stat"] == 0.0
    # identical samples -> pooled dof = n_a + n_b - 2
    assert got["dof"] == pytest.approx(138.0, abs=1e-6)
