"""Round-12 additions + the five round-11 ADVICE fixes.

ADVICE fixes under test:
1. ``label_prop_communities``: self-loops excluded from the vote;
   string node ids survive (type-agnostic min tie-break); isolated /
   self-loop-only nodes keep their seed label.
2. ``mmr_select`` / ``kcenter_select``: non-default ``id_col``
   honored end-to-end (schema id type follows the input).
3. ``semdedup_incremental``: append-only id contract is enforced, not
   trusted.
4. ``prefix_filter_pairs``: the ``max_bucket`` cap no longer drops
   pairs — over-cap buckets escalate through exact-set cohorts and the
   result equals the uncapped run.

New operators: quality_c4, temperature_resample, adamic_adar,
kcore_decomposition, clustering_coefficient, roll_spread,
parkinson_vol, theil_sen_slope, fdr_bh, t_closeness.
"""

import math

import pytest
from pyspark.sql import functions as F

from institutional_fx_etl_spark.operators.graph import (
    adamic_adar,
    clustering_coefficient,
    kcore_decomposition,
    label_prop_communities,
)


# ----------------------------------------------------- ADVICE #1
def test_label_prop_string_ids_and_self_loops(spark):
    edges = spark.createDataFrame(
        [
            # clique 1 (strings) + a self-loop that must not vote
            ("a", "b"), ("b", "c"), ("a", "c"), ("a", "a"),
            # clique 2
            ("x", "y"), ("y", "z"), ("x", "z"),
            # isolated self-loop-only node keeps its own label
            ("q", "q"),
        ],
        "src string, dst string",
    )
    out = {r["node"]: r for r in label_prop_communities(edges).collect()}
    assert set(out) == {"a", "b", "c", "x", "y", "z", "q"}
    assert len({out[n]["label"] for n in "abc"}) == 1
    assert len({out[n]["label"] for n in "xyz"}) == 1
    assert out["a"]["label"] != out["x"]["label"]
    # min-label tie-break works on strings: clique labels converge to
    # the smallest member id
    assert out["a"]["label"] == "a"
    assert out["x"]["label"] == "x"
    assert out["q"]["label"] == "q" and out["q"]["n_members"] == 1


# ----------------------------------------------------- ADVICE #2
def test_mmr_and_kcenter_custom_id_col(spark):
    from institutional_fx_etl_spark.operators.selection import (
        kcenter_select,
        mmr_select,
    )

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [0.0, 1.0]),
            (3, [0.1, 0.9]),
        ],
        "item_id bigint, embedding array<float>",
    )
    m = mmr_select(
        emb, query_id=0, k=2, shortlist=4, lam_tenths=5, id_col="item_id"
    ).collect()
    assert {r["item_id"] for r in m} <= {0, 1, 2, 3}
    assert "item_id" in m[0].asDict()
    k = kcenter_select(emb, k=2, seed_id=0, id_col="item_id").collect()
    assert [r["rank"] for r in k] == [1, 2]
    assert k[0]["item_id"] == 0
    # farthest point from vec 0 is vec 2 (orthogonal)
    assert k[1]["item_id"] == 2


# ----------------------------------------------------- ADVICE #3
def test_semdedup_incremental_rejects_id_overlap(spark):
    from institutional_fx_etl_spark.operators.similarity import (
        semdedup_incremental,
    )

    old = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)],
        "vec_id bigint, embedding array<float>",
    )
    bad_new = spark.createDataFrame(
        [(5, [0.5, 1.0])], "vec_id bigint, embedding array<float>"
    )
    with pytest.raises(ValueError, match="append-only"):
        semdedup_incremental(old, bad_new, num_centroids=2)


# ----------------------------------------------------- ADVICE #4 / task #3
def test_prefix_filter_cap_equals_uncapped(spark):
    from institutional_fx_etl_spark.operators.dedup import (
        prefix_filter_pairs,
    )

    # boilerplate cohort: 12 identical docs (every shingle shared →
    # every prefix token bucket is hot) + near-dup pair + distinct doc
    rows = [(i, "alpha beta gamma delta epsilon zeta eta") for i in range(12)]
    rows += [
        (100, "one two three four five six seven eight nine"),
        (101, "one two three four five six seven eight ten"),
        (200, "totally unrelated words nothing shared here at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    def key(df):
        return {
            (r["id_a"], r["id_b"], r["jaccard"]) for r in df.collect()
        }

    uncapped = key(prefix_filter_pairs(docs, jaccard_threshold=0.5))
    capped = key(
        prefix_filter_pairs(docs, jaccard_threshold=0.5, max_bucket=4)
    )
    assert capped == uncapped
    # the cohort's C(12,2)=66 identity pairs are all present at 1.0
    assert sum(1 for a, b, j in uncapped if a < 12 and j == 1.0) == 66


# ----------------------------------------------------- new: graph
def _petersen_ish(spark):
    # two triangles joined by a bridge + a pendant vertex
    return spark.createDataFrame(
        [
            (1, 2), (2, 3), (1, 3),
            (4, 5), (5, 6), (4, 6),
            (3, 4),
            (6, 7),  # 7 is degree-1 (peeled by 2-core)
        ],
        "src bigint, dst bigint",
    )


def test_clustering_coefficient_triangle_graph(spark):
    out = {r["node"]: r for r in
           clustering_coefficient(_petersen_ish(spark)).collect()}
    # node 1: deg 2, one triangle → lcc 1.0
    assert out[1]["lcc"] == 1.0 and out[1]["triangles"] == 1
    # node 3: deg 3 (1,2,4), one triangle of 3 possible pairs → 1/3
    assert out[3]["degree"] == 3
    assert abs(out[3]["lcc"] - round(1 / 3, 6)) < 1e-9
    # pendant vertex 7 has deg 1 → absent
    assert 7 not in out


def test_kcore_peels_pendants(spark):
    out = {r["node"]: r["degree"] for r in
           kcore_decomposition(_petersen_ish(spark), k=2, rounds=3)
           .collect()}
    # 7 peeled; then 6 still has deg 2 (4,5) — everything else survives
    assert set(out) == {1, 2, 3, 4, 5, 6}
    assert out[6] == 2


def test_adamic_adar_scores(spark):
    # 4-cycle 1-2-3-4: the two diagonals (1,3) and (2,4) each share
    # both their neighbors and are non-adjacent
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 4), (3, 4)], "src bigint, dst bigint"
    )
    out = {(r["id_a"], r["id_b"]): r
           for r in adamic_adar(edges, min_common=2).collect()}
    assert set(out) == {(1, 3), (2, 4)}
    for r in out.values():
        assert r["common_neighbors"] == 2
        # both middles have degree 2 → AA = 2/ln(2)
        assert abs(r["adamic_adar"] - round(2 / math.log(2), 6)) < 2e-6
        # deg sums: 2+2-2 = 2 → jaccard 1.0
        assert r["jaccard_nbr"] == 1.0


# ----------------------------------------------------- new: timeseries
def test_roll_spread_known_cov(spark):
    from institutional_fx_etl_spark.operators.timeseries import roll_spread

    # alternating bounce: price 10, 11, 10, 11 ... → Δp = ±1,
    # cov(d_t, d_{t-1}) = -1 → spread = 2
    rows = [
        ("A", i, float(10 + (i % 2))) for i in range(1, 9)
    ]
    df = spark.createDataFrame(rows, "sym string, seq bigint, px double")
    out = roll_spread(df, "px", ("seq",), ("sym",)).collect()[0]
    assert out["n_pairs"] == 6
    assert out["autocov"] == -1.0
    assert out["roll_spread"] == 2.0


def test_parkinson_vol_zero_when_flat(spark):
    from institutional_fx_etl_spark.operators.timeseries import (
        parkinson_vol,
    )

    df = spark.createDataFrame(
        [("A", "2024-01-01 10:00:00", 5.0),
         ("A", "2024-01-01 11:00:00", 5.0)],
        "sym string, ts string, px double",
    ).selectExpr("sym", "CAST(ts AS TIMESTAMP) AS ts", "px")
    out = parkinson_vol(df, "px", "ts", ("sym",)).collect()[0]
    assert out["hi"] == out["lo"] == 5.0 and out["park_vol"] == 0.0


def test_theil_sen_exact_line(spark):
    from institutional_fx_etl_spark.operators.timeseries import (
        theil_sen_slope,
    )

    # y = 3x + noise-free → every pairwise slope is 3
    rows = [("A", f"2024-01-01 00:00:{s:02d}", 3.0 * s) for s in range(10)]
    df = spark.createDataFrame(
        rows, "sym string, ts string, y double"
    ).selectExpr("sym", "CAST(ts AS TIMESTAMP) AS ts", "y")
    out = theil_sen_slope(df, "y", "ts", ("ts",), ("sym",)).collect()[0]
    assert out["n_points"] == 10 and out["n_pairs"] == 45
    assert out["ts_slope"] == 3.0


# ----------------------------------------------------- new: profiling
def test_fdr_bh_step_up(spark):
    from institutional_fx_etl_spark.operators.profiling import fdr_bh

    # symmetric extremes keep the global mean at 0: "hi" sits fully
    # above it, "lo" fully below (both tiny p), "mid" is balanced
    # (p = 1) — the BH frontier rejects the extremes only
    rows = [("hi", 100.0 + i) for i in range(32)]
    rows += [("lo", -100.0 - i) for i in range(32)]
    rows += [("mid", 1.0), ("mid", -1.0)] * 32
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r for r in fdr_bh(df, "g", "v", alpha_pct=5).collect()}
    assert out["hi"]["reject"] is True
    assert out["lo"]["reject"] is True
    assert out["mid"]["reject"] is False
    assert out["mid"]["p_value"] == 1.0


def test_t_closeness_uniform_vs_skewed(spark):
    from institutional_fx_etl_spark.operators.profiling import t_closeness

    # group "u" mirrors the global 50/50 mix (t=0 against itself
    # won't hold exactly because the OTHER group skews the global);
    # group "s" is single-valued → larger t
    rows = [("u", 0), ("u", 1)] * 20 + [("s", 0)] * 20
    df = spark.createDataFrame(rows, "g string, sv int")
    out = {r["g"]: r["t_closeness"] for r in
           t_closeness(df, ["g"], "sv").collect()}
    # global: p(0)=40/60, p(1)=20/60; group u: 1/2 each → TVD = 1/6
    assert abs(out["u"] - round(1 / 6, 6)) < 1e-9
    # group s: (1, 0) → TVD = 1/3
    assert abs(out["s"] - round(1 / 3, 6)) < 1e-9


# ----------------------------------------------------- new: text/selection
def test_quality_c4_rules(spark):
    from institutional_fx_etl_spark.operators.text import quality_c4

    df = spark.createDataFrame(
        [
            (1, "this is a good sentence. here is another one. and a third one."),
            (2, "too short. ok. fine."),          # kept sentences < 3 words
            (3, "lorem ipsum dolor sit amet. real text follows here. more words here. final sentence here."),
            (4, "unterminated trailing fragment with many words but no period"),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in quality_c4(df).collect()}
    assert out[1]["keep"] is True and out[1]["n_kept_sentences"] == 3
    assert out[2]["keep"] is False and out[2]["n_kept_sentences"] == 0
    assert out[3]["keep"] is False and out[3]["has_lorem"] is True
    assert out[4]["n_sentences"] == 1 and out[4]["n_kept_sentences"] == 0


def test_temperature_resample_upweights_tail(spark):
    from institutional_fx_etl_spark.operators.selection import (
        temperature_resample,
    )

    rows = [("big", 900)] * 9 + [("small", 100)]
    df = spark.createDataFrame(rows, "lang string, n_chars bigint")
    out = {r["lang"]: r for r in
           temperature_resample(df, "lang", "n_chars", 70).collect()}
    assert out["small"]["weight_mult"] > 1.0 > out["big"]["weight_mult"]
    s = out["big"]["temp_share"] + out["small"]["temp_share"]
    assert abs(s - 1.0) < 1e-4


# ----------------------------------------------------- new: similarity/stats
def test_matryoshka_recall_identity_when_full_dim(spark):
    from institutional_fx_etl_spark.operators.similarity import (
        matryoshka_recall,
    )

    emb = spark.createDataFrame(
        [(i, [float(i % 5), float(i % 3), float(i % 7), 1.0])
         for i in range(30)],
        "vec_id bigint, embedding array<float>",
    )
    # truncation to the FULL dimension must recover the full top-k
    out = matryoshka_recall(
        emb, emb.filter("vec_id < 2"), trunc_dim=4, k=5
    ).collect()
    assert {r["recall"] for r in out} == {1.0}
    # a 1-dim prefix loses information: recall is defined and <= 1
    out1 = matryoshka_recall(
        emb, emb.filter("vec_id < 2"), trunc_dim=1, k=5
    ).collect()
    assert all(0.0 <= r["recall"] <= 1.0 for r in out1)


def test_bootstrap_ci_brackets_the_mean(spark):
    from institutional_fx_etl_spark.operators.profiling import (
        bootstrap_ci_mean,
    )

    rows = [("g", i, 10.0 + (i % 7)) for i in range(400)]
    df = spark.createDataFrame(rows, "g string, id bigint, v double")
    out = bootstrap_ci_mean(df, "g", "v", "id", n_resamples=40).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n"] == 400 and r["n_resamples"] == 40
    assert r["ci_lo"] <= r["mean"] <= r["ci_hi"]
    # replicate determinism: identical inputs give identical CI
    again = bootstrap_ci_mean(df, "g", "v", "id", n_resamples=40).collect()[0]
    assert (again["ci_lo"], again["ci_hi"]) == (r["ci_lo"], r["ci_hi"])


def test_herfindahl_monopoly_vs_uniform(spark):
    from institutional_fx_etl_spark.operators.profiling import (
        herfindahl_concentration,
    )

    rows = [("mono", "s1")] * 10
    rows += [("uni", f"s{i % 4}") for i in range(40)]
    df = spark.createDataFrame(rows, "g string, src string")
    out = {r["g"]: r for r in
           herfindahl_concentration(df, "g", "src").collect()}
    assert out["mono"]["hhi"] == 1.0
    assert out["mono"]["effective_members"] == 1.0
    assert out["uni"]["hhi"] == 0.25 and out["uni"]["n_members"] == 4
    assert out["uni"]["effective_members"] == 4.0
