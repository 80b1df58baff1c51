"""Round-7 operators: blocked edit-distance dedup, bounded BFS,
Spearman correlation, Benford profiling, rolling distinct counts —
hand-computed fixtures (the contract queries add the sf0.01 oracle
equivalence on top)."""

from datetime import datetime

import pytest  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401


def test_editdistance_pairs_hand(spark):
    from institutional_fx_etl_spark.operators.dedup import editdistance_pairs

    docs = spark.createDataFrame(
        [
            (1, "hello world"),
            (2, "hello worlds"),
            (3, "completely different text here"),
            (4, "hXLLO world"),  # case-folds to 1 edit from doc 1
        ],
        "doc_id long, text string",
    )
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in editdistance_pairs(docs).collect()
    }
    assert got == {(1, 2): 1, (1, 4): 1, (2, 4): 2}


def test_editdistance_block_cap_drops_whole_block(spark):
    from institutional_fx_etl_spark.operators.dedup import editdistance_pairs

    docs = spark.createDataFrame(
        [(i, "samelength") for i in range(5)], "doc_id long, text string"
    )
    # 5 identical docs: max_block=4 drops both buckets whole → no pairs
    assert editdistance_pairs(docs, max_block=4).count() == 0
    assert editdistance_pairs(docs, max_block=16).count() == 10


def test_bfs_hops_path_graph(spark):
    from institutional_fx_etl_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame(
        [(1, 2), (3, 2), (3, 4), (5, 4)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r["node"]: r["hops"] for r in bfs_hops(edges, seeds).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}  # node 5 is 4 hops → absent


def test_bfs_hops_min_level_wins(spark):
    from institutional_fx_etl_spark.operators.graph import bfs_hops

    # diamond: 1-2, 1-3, 2-4, 3-4 and long tail 4-5; node 4 reachable
    # at level 2 twice — labeled once, at 2
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    out = bfs_hops(edges, seeds).collect()
    got = {r["node"]: r["hops"] for r in out}
    assert len(out) == len(got), "each node labeled exactly once"
    assert got == {1: 0, 2: 1, 3: 1, 4: 2, 5: 3}


def test_spearman_perfect_monotone(spark):
    from institutional_fx_etl_spark.operators.timeseries import spearman_corr

    df = spark.createDataFrame(
        [("g", 1, 1.0, 10.0), ("g", 2, 2.0, 20.0), ("g", 3, 3.0, 30.0),
         ("h", 1, 1.0, 30.0), ("h", 2, 2.0, 20.0), ("h", 3, 3.0, 10.0)],
        "grp string, id long, x double, y double",
    )
    got = {
        r["grp"]: r["spearman"]
        for r in spearman_corr(
            df, "x", "y", group_cols=("grp",), tiebreak_cols=("id",)
        ).collect()
    }
    assert got == {"g": 1.0, "h": -1.0}


def test_benford_profile_hand(spark):
    from institutional_fx_etl_spark.operators.profiling import benford_profile

    df = spark.createDataFrame(
        [(1.0,), (1.5,), (2.0,), (9.99,), (0.5,), (-3.0,), (0.0,)],
        "v double",
    )
    rows = {r["digit"]: r for r in benford_profile(df, "v").collect()}
    # negatives/zeros excluded; 1.0→100, 1.5→150, 2.0→200, 9.99→999, 0.5→50
    assert {d: rows[d]["n"] for d in rows} == {1: 2, 2: 1, 9: 1, 5: 1}
    assert rows[1]["ratio"] == 0.4
    assert rows[1]["expected"] == 0.301030
    assert rows[1]["deviation"] == round(0.4 - 0.301030, 6)


def test_rolling_distinct_window_boundary(spark):
    from institutional_fx_etl_spark.operators.timeseries import (
        rolling_distinct,
    )

    t = lambda d, h: datetime(2024, 1, d, h)  # noqa: E731
    df = spark.createDataFrame(
        [(t(1, 9), "a"), (t(2, 9), "a"), (t(2, 10), "b"), (t(9, 9), "c")],
        "ts timestamp, user_id string",
    )
    got = {
        r["day"].day: r["user_id_7d"]
        for r in rolling_distinct(df, "ts", "user_id").collect()
    }
    # day 9 window is [3..9]: day-2 events fall OUT (boundary exact)
    assert got == {1: 1, 2: 2, 9: 1}


def test_cooccurrence_lift_hand(spark):
    from institutional_fx_etl_spark.operators.text import cooccurrence_lift

    docs = spark.createDataFrame(
        [(i, "x y") for i in range(5)] + [(5, "x z")],
        "doc_id long, text string",
    )
    rows = cooccurrence_lift(docs, min_count=5).collect()
    assert len(rows) == 1  # (x, z) count 1 < min_count drops
    r = rows[0]
    # lift = n_ab·N/(n_a·n_b) = 5·6/(6·5) = 1.0
    assert (r["tok_a"], r["tok_b"], r["n_ab"], r["n_a"], r["n_b"], r["lift"]) \
        == ("x", "y", 5, 6, 5, 1.0)


def test_tokenizer_coverage_hand(spark):
    from institutional_fx_etl_spark.operators.text import tokenizer_coverage

    docs = spark.createDataFrame(
        [("s1", "the cat"), ("s1", "a dog runs"), ("s2", "zebra")],
        "source string, text string",
    )
    got = {
        r["grp"]: (r["n_tokens"], r["n_covered"], r["coverage"])
        for r in tokenizer_coverage(docs, ["the", "a"]).collect()
    }
    assert got == {"s1": (5, 2, 0.4), "s2": (1, 0, 0.0)}


def test_k_anonymity_hand(spark):
    from institutional_fx_etl_spark.operators.profiling import k_anonymity

    rows = [("en", "web")] * 6 + [("en", "book")] * 2 + [("fr", "web")]
    df = spark.createDataFrame(rows, "lang string, source string")
    r = k_anonymity(df, ["lang", "source"], k=5).collect()[0]
    assert (
        r["n_rows"], r["n_groups"], r["min_group_size"],
        r["groups_below_k"], r["rows_below_k"], r["at_risk_share"],
    ) == (9, 3, 1, 2, 3, 0.333333)


def test_round7_plans_have_no_cartesian(spark):
    """Plan gates: none of the round-7 operators may degrade to a
    nested-loop/cartesian join (the rolling-distinct day emission and
    the blocked edit-distance join are equi-joins by construction;
    benford's only cross join is the 1-row broadcast total)."""
    from institutional_fx_etl_spark.operators.dedup import editdistance_pairs
    from institutional_fx_etl_spark.operators.profiling import benford_profile
    from institutional_fx_etl_spark.operators.timeseries import (
        rolling_distinct,
    )

    docs = spark.createDataFrame(
        [(1, "abc def"), (2, "abc deg")], "doc_id long, text string"
    )
    ev = spark.createDataFrame(
        [(datetime(2024, 1, 1), "u")], "ts timestamp, user_id string"
    )
    nums = spark.createDataFrame([(123.0,)], "v double")
    for df in (
        editdistance_pairs(docs),
        rolling_distinct(ev, "ts", "user_id"),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
    bplan = benford_profile(nums, "v")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in bplan


def test_incremental_minhash_equals_full_restriction(spark):
    """dedup_incremental's contract: incremental output == full-run
    pairs restricted to new-involving, as SETS (cap on combined
    corpus makes this exact)."""
    from institutional_fx_etl_spark.operators.dedup import minhash_lsh_pairs

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .withColumn("__isnew", F.expr("doc_id % 5 = 0"))
    )
    full = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in minhash_lsh_pairs(docs, jaccard_threshold=0.2).collect()
    }
    want = {t for t in full if t[0] % 5 == 0 or t[1] % 5 == 0}
    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in minhash_lsh_pairs(
            docs, jaccard_threshold=0.2, new_col="__isnew"
        ).collect()
    }
    assert got == want and len(full) > len(want) > 0


def test_leakage_safe_split_groups_cohere(spark):
    from institutional_fx_etl_spark.operators.dedup import leakage_safe_split

    docs = spark.createDataFrame(
        [(1, "Same Text"), (2, "same text"), (3, "other words"),
         (4, "same text")],
        "doc_id long, text string",
    )
    rows = leakage_safe_split(docs).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["group_key"], set()).add(r["split"])
    # every duplicate group lands in exactly one split
    assert all(len(s) == 1 for s in by_key.values())
    assert len(by_key) == 2  # case-folded dups share a group


def _hash_corpus(spark, n, dims=64):
    return spark.range(n).selectExpr(
        "id AS vec_id",
        f"transform(sequence(0, {dims - 1}), j -> CAST((abs(hash(id, j))"
        " % 2001 - 1000) / 1000.0 AS FLOAT)) AS embedding",
    )


def test_assign_numpy_equals_literal_hof(spark):
    """The Arrow assignment regime must be bit-identical to the
    literal-HOF scoring (fold-order-matched accumulation + exact
    rounding fallback) — the invariant that lets _assign_to switch
    regimes without moving any oracle hash."""
    from institutional_fx_etl_spark.operators import similarity as S

    emb = _hash_corpus(spark, 1200)
    v = emb.selectExpr("vec_id AS vid", S._as_double("embedding") + " AS vv")
    cents = v.filter("vid < 24").selectExpr("vid AS cid", "vv AS cv")
    cells = S._scored_cells_expr(cents)
    lit = {
        r["vid"]: r["cid"]
        for r in v.selectExpr(
            "vid", f"element_at({cells}, 1).cid AS cid"
        ).collect()
    }
    rows = sorted(cents.collect(), key=lambda r: r["cid"])
    got = {
        r["vid"]: r["cid"]
        for r in S._assign_numpy(v, rows, "bigint").collect()
    }
    assert got == lit


def test_knn_pair_numpy_equals_sql(spark):
    """Pair-stage regime equality: full output tuples (ids, rank,
    cosine) identical between the self-join+window SQL path and the
    per-cell Arrow kernel."""
    from institutional_fx_etl_spark.operators.similarity import knn_join

    emb = _hash_corpus(spark, 1500)
    a = sorted(
        tuple(r)
        for r in knn_join(
            emb, k=3, num_centroids=24, pair_strategy="sql"
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in knn_join(
            emb, k=3, num_centroids=24, pair_strategy="numpy"
        ).collect()
    )
    assert a == b and len(a) > 0


# --- round-7 continuation: indicator/profiling widening --------------


def test_ewma_head_renormalizes(spark):
    """First rows of a series must renormalize over the lags present:
    a constant series yields EWMA == the constant from row 1 onward
    (any weight leakage to missing lags would pull it toward 0)."""
    from institutional_fx_etl_spark.operators.timeseries import ewma_exprs

    df = spark.createDataFrame(
        [("s", i, 5.0) for i in range(12)], "sym string, i int, value double"
    )
    e = ewma_exprs("value", "(PARTITION BY sym ORDER BY i)")
    rows = df.selectExpr("i", f"{e} AS ewma").collect()
    assert all(r["ewma"] == 5.0 for r in rows)


def test_ewma_matches_python_reference(spark):
    """Truncated-EWMA values must equal an independent Python fold of
    the same weights (6-dp agreement; the oracle gate separately pins
    bit-identity vs DuckDB)."""
    from institutional_fx_etl_spark.operators.timeseries import ewma_exprs

    vals = [1.0, 4.0, 2.0, 8.0, 3.0, 7.0, 5.0, 6.0, 9.0, 2.5]
    df = spark.createDataFrame(
        [("s", i, v) for i, v in enumerate(vals)],
        "sym string, i int, value double",
    )
    e = ewma_exprs("value", "(PARTITION BY sym ORDER BY i)")
    got = [
        r["ewma"]
        for r in df.selectExpr("i", f"{e} AS ewma").orderBy("i").collect()
    ]
    alpha = 0.25
    w = [alpha * (1 - alpha) ** j for j in range(8)]
    for t, g in enumerate(got):
        num = sum(w[j] * vals[t - j] for j in range(8) if t - j >= 0)
        den = sum(w[j] for j in range(8) if t - j >= 0)
        assert abs(g - num / den) < 1e-6, (t, g, num / den)


def test_candle_patterns_flags(spark):
    """Hand-built candles exercise each pattern flag."""
    from institutional_fx_etl_spark.operators.timeseries import (
        candle_pattern_exprs,
    )

    #       open  high  low   close          expected
    rows = [
        ("s", 0, 10.0, 20.0, 0.0, 10.5),   # doji: body .5 <= range*0.1=2
        ("s", 1, 10.0, 10.5, 2.0, 11.0),   # hammer: dnsh 8 >= 2, upsh 0
        ("s", 2, 10.0, 18.0, 9.5, 9.0),    # shooting star: upsh 8, dnsh .5
        ("s", 3, 12.0, 12.1, 7.9, 8.0),    # big down candle
        ("s", 4, 7.5, 12.6, 7.4, 12.5),    # bull engulf of row 3
        ("s", 5, 13.0, 13.1, 6.9, 7.0),    # bear engulf of row 4
    ]
    df = spark.createDataFrame(
        rows, "sym string, i int, open double, high double,"
        " low double, close double"
    )
    flags = candle_pattern_exprs("(PARTITION BY sym ORDER BY i)")
    out = {
        r["i"]: r
        for r in df.selectExpr("i", *flags).collect()
    }
    assert out[0]["doji"]
    assert out[1]["hammer"] and not out[1]["doji"]
    assert out[2]["shooting_star"]
    assert out[4]["bull_engulf"]
    assert out[5]["bear_engulf"]


def test_chisq_independent_uniform_is_zero(spark):
    """A perfectly balanced contingency table has chi2 == 0; dof and
    cell count come out exact."""
    from institutional_fx_etl_spark.operators.profiling import (
        chisq_independence,
    )

    rows = [(a, b) for a in "xyz" for b in range(4) for _ in range(7)]
    df = spark.createDataFrame(rows, "a string, b int")
    r = chisq_independence(df, "a", "b").collect()[0]
    assert r["n_cells"] == 12 and r["dof"] == 6 and r["chi2"] == 0.0


def test_chisq_matches_closed_form(spark):
    """2x2 table vs the hand-computed statistic."""
    from institutional_fx_etl_spark.operators.profiling import (
        chisq_independence,
    )

    counts = {("a", 0): 10, ("a", 1): 20, ("b", 0): 30, ("b", 1): 5}
    rows = [(k[0], k[1]) for k, n in counts.items() for _ in range(n)]
    df = spark.createDataFrame(rows, "a string, b int")
    r = chisq_independence(df, "a", "b").collect()[0]
    n = sum(counts.values())
    expected = 0.0
    for (a, b), o in counts.items():
        ra = sum(v for k, v in counts.items() if k[0] == a)
        cb = sum(v for k, v in counts.items() if k[1] == b)
        e = ra * cb / n
        expected += (o - e) ** 2 / e
    assert abs(r["chi2"] - expected) < 1e-5
    assert r["dof"] == 1


def test_containment_candidate_stage_has_no_join(spark):
    """The grouped-array candidate stage must plan WITHOUT any join
    operator (the round-7 restructure: one shuffle to shingle groups,
    in-array pair emission, one shuffle to pair counts)."""
    from institutional_fx_etl_spark.operators.dedup import containment_pairs

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(6)]
        + [(10, "totally different words here now yes")],
        "doc_id long, text string",
    )
    out = containment_pairs(docs, threshold=0.5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert got == {(i, j) for i in range(6) for j in range(i + 1, 6)}


def test_containment_hot_shingle_cap(spark):
    """Shingles above max_df must drop from candidate generation but
    full denominators stay (the cap prunes, never inflates)."""
    from institutional_fx_etl_spark.operators.dedup import containment_pairs

    boiler = "one two three four five six"
    docs = spark.createDataFrame(
        [(i, boiler) for i in range(5)],
        "doc_id long, text string",
    )
    # df=5 > max_df=4 -> every shingle is hot -> no pairs at all
    assert containment_pairs(docs, threshold=0.1, max_df=4).count() == 0
    # df=5 <= max_df=5 -> all pairs with containment 1.0
    out = containment_pairs(docs, threshold=0.99, max_df=5)
    rows = out.collect()
    assert len(rows) == 10
    assert all(r["containment_a"] == 1.0 for r in rows)


def test_anova_matches_scipy_formula(spark):
    """Hand-computed one-way ANOVA on a small fixture (values chosen
    micro-exact so fix-pointing is lossless)."""
    from institutional_fx_etl_spark.operators.profiling import anova_oneway

    data = {"a": [1.0, 2.0, 3.0], "b": [2.0, 3.0, 4.0], "c": [5.0, 6.0, 7.0]}
    rows = [(g, v) for g, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    r = anova_oneway(df, "v", "g").collect()[0]
    import statistics

    all_v = [v for vs in data.values() for v in vs]
    gm = statistics.mean(all_v)
    ssb = sum(len(vs) * (statistics.mean(vs) - gm) ** 2 for vs in data.values())
    ssw = sum(
        (v - statistics.mean(vs)) ** 2 for vs in data.values() for v in vs
    )
    f = (ssb / 2) / (ssw / 6)
    assert r["k"] == 3 and r["n"] == 9
    assert abs(r["ssb"] - ssb) < 1e-5
    assert abs(r["ssw"] - ssw) < 1e-5
    assert abs(r["f_stat"] - f) < 1e-4


def test_ks_two_sample_exact(spark):
    """KS distance vs a brute-force Python ECDF computation, and the
    identical-distribution zero case."""
    from institutional_fx_etl_spark.operators.profiling import ks_two_sample

    a = [1.0, 2.0, 3.0, 4.0, 10.0]
    b = [2.5, 3.5, 4.5, 20.0]
    rows = [("A", v) for v in a] + [("B", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    r = ks_two_sample(df, "v", "g", "A", "B", bucket_width=2.0).collect()[0]
    vals = sorted(set(a + b))
    d = max(
        abs(
            sum(1 for x in a if x <= v) / len(a)
            - sum(1 for x in b if x <= v) / len(b)
        )
        for v in vals
    )
    assert r["n_a"] == 5 and r["n_b"] == 4
    assert abs(r["ks_d"] - d) < 1e-6

    same = spark.createDataFrame(
        [("A", v) for v in a] + [("B", v) for v in a], "g string, v double"
    )
    assert (
        ks_two_sample(same, "v", "g", "A", "B").collect()[0]["ks_d"] == 0.0
    )


def test_ks_bucket_width_invariance(spark):
    """The two-level range prefix must give the same D for any bucket
    width (decomposition invariance of integer cumsums)."""
    from institutional_fx_etl_spark.operators.profiling import ks_two_sample

    rows = [("A", float(i % 17) + 0.25) for i in range(40)] + [
        ("B", float((i * 7) % 23) / 2) for i in range(35)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    outs = {
        w: ks_two_sample(df, "v", "g", "A", "B", bucket_width=w)
        .collect()[0]["ks_d"]
        for w in (0.5, 3.0, 1000.0)
    }
    assert len(set(outs.values())) == 1, outs


def test_gini_known_values(spark):
    """Gini = 0 for perfectly equal values; hand-checked value for a
    skewed fixture; negatives clip to zero."""
    from institutional_fx_etl_spark.operators.profiling import gini_by_group

    rows = [(1, i, 10.0) for i in range(4)] + [
        (2, 10, 0.0),
        (2, 11, 0.0),
        (2, 12, 0.0),
        (2, 13, 100.0),
    ]
    df = spark.createDataFrame(rows, "grp int, k int, bal double")
    out = {r["grp"]: r for r in gini_by_group(df, "bal", "grp", "k").collect()}
    assert out[1]["gini"] == 0.0
    # one holder of everything among n=4: G = (n-1)/n = 0.75
    assert out[2]["gini"] == 0.75
    assert out[2]["total"] == 100.0


def test_crosscorr_lag0_is_pearson(spark):
    """ccf at lag 0 must equal the plain Pearson correlation of the
    aligned hourly series; a shifted copy peaks at its shift."""
    from institutional_fx_etl_spark.plans.driver_queries import (
        q_crosscorr_lags,
    )
    import datetime
    import math
    import tempfile

    base = datetime.datetime(2024, 1, 1)
    xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]
    rows = []
    eid = 0
    for t, x in enumerate(xs):
        ts = base + datetime.timedelta(hours=t)
        for _ in range(x):
            rows.append((eid, ts, eid % 50, "click", 1.0, "{}"))
            eid += 1
        # purchase series = click series shifted one hour later
        if t >= 1:
            for _ in range(xs[t - 1]):
                rows.append((eid, ts, eid % 50, "purchase", 1.0, "{}"))
                eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = {
            r["lag_h"]: r["ccf"]
            for r in q_crosscorr_lags(spark, d).collect()
        }

    def pearson(a, b):
        n = len(a)
        sx, sy = sum(a), sum(b)
        sxy = sum(p * q for p, q in zip(a, b))
        sxx = sum(p * p for p in a)
        syy = sum(q * q for q in b)
        return (n * sxy - sx * sy) / math.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )

    y = [0] + xs[:-1]
    assert abs(out[0] - pearson(xs, y)) < 1e-6
    # y leads x by -1: corr(x_t, y_{t-1}) ... the shifted copy aligns
    # at lag +1 (y_{t+1} == x_t)
    assert out[1] == 1.0


def test_zorder_write_prunes_both_dims(spark, tmp_path):
    """write_zordered must produce files whose per-file min/max ranges
    are narrow on BOTH dimensions: a point-ish predicate on either
    column overlaps only a minority of files (parquet footer pruning),
    while a hash layout overlaps ~all of them. Also: the layout is a
    pure reorder — the row multiset is unchanged."""
    from pyspark.sql import functions as F

    from institutional_fx_etl_spark.operators.zorder import write_zordered

    df = spark.range(4096).selectExpr(
        "id % 64 AS x", "CAST(floor(id / 64) AS BIGINT) AS y", "id AS payload"
    )
    zpath = str(tmp_path / "z")
    write_zordered(df, zpath, "x", "y", bits=6, num_files=16)
    back = spark.read.parquet(zpath)
    assert back.count() == 4096
    assert back.selectExpr("sum(payload)").collect()[0][0] == sum(range(4096))

    stats = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(
            F.min("x").alias("minx"),
            F.max("x").alias("maxx"),
            F.min("y").alias("miny"),
            F.max("y").alias("maxy"),
        )
        .collect()
    )
    n_files = len(stats)
    assert n_files >= 8
    # predicate x IN [0, 7] — an eighth of the x domain
    hit_x = sum(1 for s in stats if s["minx"] <= 7 and s["maxx"] >= 0)
    hit_y = sum(1 for s in stats if s["miny"] <= 7 and s["maxy"] >= 0)
    assert hit_x <= n_files / 2, (hit_x, n_files)
    assert hit_y <= n_files / 2, (hit_y, n_files)


def test_sorted_neighborhood_pairs_complete_and_unique(spark):
    """Every (a, b) with rank distance in [1, window] must appear
    EXACTLY once (block double-emission can neither drop boundary
    pairs nor double-count), for bucket widths that do and don't align
    with the blocks."""
    from institutional_fx_etl_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    # 30 docs, identical text (jaccard 1.0 everywhere) but varying
    # lengths so ranks spread across n_chars buckets
    rows = [
        (i, ("tok%d " % (i % 3)) * 3 + "x" * (i * 7 % 50))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for bw in (8, 64):
        out = sorted_neighborhood_pairs(
            df, window=3, jaccard_threshold=0.0, bucket_width=bw
        ).collect()
        got = sorted((r["id_a"], r["id_b"], r["rank_dist"]) for r in out)
        assert len(got) == len(set(got)), "duplicate pair emitted"
        # expected: every rank pair at distance 1..3 over the total
        # (n_chars, id) order
        order = sorted(rows, key=lambda x: (len(x[1]), x[0]))
        exp = sorted(
            (order[i][0], order[i + d][0], d)
            for i in range(len(order))
            for d in (1, 2, 3)
            if i + d < len(order)
        )
        assert got == exp, (bw, len(got), len(exp))
