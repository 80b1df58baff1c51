"""Round-7 continuation operators: CUSUM changepoint (reflected-walk
prefix identity + two-level bucket decomposition), market-basket
association rules, Mann-Whitney U — hand-computed fixtures; the
contract queries add the sf0.01 oracle equivalence on top."""

from datetime import datetime, timedelta

import pytest  # noqa: F401
from pyspark.sql import functions as F


def _cusum_reference(values, target):
    """The sequential recursion the operator must reproduce."""
    s, out = 0, []
    for v in values:
        d = int(round(v * 1_000_000)) - int(round(target * 1_000_000))
        s = max(0, s + d)
        out.append(s)
    return out


def _cusum_frame(spark, values_by_group, step_seconds=40_000):
    t0 = datetime(2024, 1, 1)
    rows, eid = [], 0
    for grp, vals in values_by_group.items():
        for i, v in enumerate(vals):
            rows.append(
                (eid, t0 + timedelta(seconds=i * step_seconds), grp, v)
            )
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )


def test_cusum_matches_sequential_reference(spark):
    from institutional_fx_etl_spark.operators.timeseries import (
        cusum_changepoint,
    )

    series = {
        "a": [10.0, 80.0, 90.0, 5.0, 5.0, 70.0, 200.0, 1.0],
        "b": [100.0, 100.0, 1.0, 1.0, 1.0, 300.0],
    }
    # 40 ks steps + 86400 s buckets → roughly one bucket boundary every
    # other row: the two-level path is exercised, not just one bucket
    df = _cusum_frame(spark, series)
    got = cusum_changepoint(df, target=55.0, threshold=100.0)
    by_group = {
        grp: [
            r["cusum_micro"]
            for r in sorted(
                got.filter(f"grp = '{grp}'").collect(), key=lambda r: r["id"]
            )
        ]
        for grp in series
    }
    for grp, vals in series.items():
        assert by_group[grp] == _cusum_reference(vals, 55.0), grp


def test_cusum_bucket_decomposition_invariant(spark):
    from institutional_fx_etl_spark.operators.timeseries import (
        cusum_changepoint,
    )

    series = {"a": [10.0, 80.0, 90.0, 5.0, 5.0, 70.0, 200.0, 1.0] * 3}
    df = _cusum_frame(spark, series)
    one_bucket = cusum_changepoint(df, bucket_seconds=10**9)
    many_buckets = cusum_changepoint(df, bucket_seconds=60_000)
    key = lambda r: r["id"]  # noqa: E731
    assert sorted(one_bucket.collect(), key=key) == sorted(
        many_buckets.collect(), key=key
    )


def test_cusum_alarm_threshold(spark):
    from institutional_fx_etl_spark.operators.timeseries import (
        cusum_changepoint,
    )

    df = _cusum_frame(spark, {"a": [56.0, 56.0, 56.0]})
    got = sorted(
        cusum_changepoint(df, target=55.0, threshold=2.5).collect(),
        key=lambda r: r["id"],
    )
    # S = 1, 2, 3 units; alarm strictly above 2.5
    assert [r["cusum_micro"] for r in got] == [1_000_000, 2_000_000, 3_000_000]
    assert [r["alarm"] for r in got] == [False, False, True]


def test_basket_rules_hand(spark):
    from institutional_fx_etl_spark.operators.basket import (
        basket_assoc_rules,
    )

    rows = [
        (1, "milk"), (1, "bread"), (1, "eggs"),
        (2, "milk"), (2, "bread"),
        (3, "milk"), (3, "bread"),
        (4, "eggs"),
        (4, "eggs"),  # duplicate line — distinct() collapses it
        (5, "milk"),
    ]
    df = spark.createDataFrame(rows, "o long, p string")
    got = {
        (r["item_a"], r["item_b"]): r
        for r in basket_assoc_rules(df, "o", "p").collect()
    }
    # only (bread, milk) co-occurs ≥ 2 times (orders 1, 2, 3)
    assert set(got) == {("bread", "milk")}
    r = got[("bread", "milk")]
    assert r["pair_orders"] == 3
    assert r["orders_a"] == 3 and r["orders_b"] == 4
    assert r["confidence_ab"] == 1.0
    assert r["confidence_ba"] == 0.75
    assert r["lift"] == round(3 * 5 / (3 * 4), 6)


def test_basket_cap_drops_degenerate_basket(spark):
    from institutional_fx_etl_spark.operators.basket import (
        basket_assoc_rules,
    )

    rows = [(1, f"i{k}") for k in range(10)] + [
        (2, "i0"), (2, "i1"),
        (3, "i0"), (3, "i1"),
    ]
    df = spark.createDataFrame(rows, "o long, p string")
    # basket 1 (10 items) over the cap → contributes no pairs; the
    # (i0, i1) pair keeps only orders 2 and 3
    got = basket_assoc_rules(df, "o", "p", max_basket=8).collect()
    assert len(got) == 1 and got[0]["pair_orders"] == 2


def test_mannwhitney_ties_reference(spark):
    from institutional_fx_etl_spark.operators.profiling import mannwhitney_u

    a = [1.0, 2.0, 2.0, 5.0]
    b = [2.0, 3.0, 5.0]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    got = mannwhitney_u(df, "v", "g", "a", "b").collect()[0]
    # midranks: 1.0→1; 2.0,2.0,2.0→3; 3.0→5; 5.0,5.0→6.5
    # R_a = 1 + 3 + 3 + 6.5 = 13.5 ; U_a = 13.5 - 4*5/2 = 3.5
    assert got["n_a"] == 4 and got["n_b"] == 3
    assert got["u_a"] == 3.5
    assert got["u_b"] == 4 * 3 - 3.5


def test_sssp_weighted_hand_graph(spark):
    from institutional_fx_etl_spark.operators.graph import sssp_weighted

    # 1 -2- 2 -3- 3 ; 1 -10- 3 ; 3 -1- 4 : shortest 1→3 is 5 via 2
    edges = spark.createDataFrame(
        [(1, 2, 2), (2, 3, 3), (1, 3, 10), (3, 4, 1)],
        "src long, dst long, w long",
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r["node"]: r["dist"] for r in sssp_weighted(edges, seeds).collect()}
    assert got == {1: 0, 2: 2, 3: 5, 4: 6}


def test_sssp_weighted_bounded_rounds(spark):
    from institutional_fx_etl_spark.operators.graph import sssp_weighted

    # path 1-2-3-4-5, unit weights; 2 rounds reach only 3 hops... no:
    # 2 relaxations reach nodes ≤ 2 edges away
    edges = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (3, 4, 1), (4, 5, 1)],
        "src long, dst long, w long",
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r["node"]: r["dist"]
        for r in sssp_weighted(edges, seeds, rounds=2).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2}


def test_sssp_cheaper_longer_path_needs_enough_rounds(spark):
    from institutional_fx_etl_spark.operators.graph import sssp_weighted

    # direct edge 1→4 costs 10; the 3-edge path costs 3 — found only
    # once rounds ≥ 3 (Bellman-Ford bounded-relaxation semantics)
    edges = spark.createDataFrame(
        [(1, 4, 10), (1, 2, 1), (2, 3, 1), (3, 4, 1)],
        "src long, dst long, w long",
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    one = {
        r["node"]: r["dist"]
        for r in sssp_weighted(edges, seeds, rounds=1).collect()
    }
    three = {
        r["node"]: r["dist"]
        for r in sssp_weighted(edges, seeds, rounds=3).collect()
    }
    assert one[4] == 10 and three[4] == 3


def test_referential_integrity_finds_orphans(spark):
    from institutional_fx_etl_spark.operators.profiling import (
        referential_integrity,
    )

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, 98), (5, 98), (6, None)],
        "id long, fk long",
    )
    parent = spark.createDataFrame([(10,), (11,)], "pk long")
    r = referential_integrity(child, "fk", parent, "pk", "c.fk->p.pk").collect()[0]
    # NULL fk excluded; 99 (1 row) and 98 (2 rows) are orphans
    assert r["fk"] == "c.fk->p.pk"
    assert r["child_rows"] == 5
    assert r["orphan_rows"] == 3
    assert r["orphan_keys"] == 2


def test_cramers_v_perfect_association(spark):
    from institutional_fx_etl_spark.operators.profiling import cramers_v

    # b is a function of a → V = 1 exactly
    rows = [("x", "p")] * 5 + [("y", "q")] * 7 + [("z", "r")] * 3
    df = spark.createDataFrame(rows, "a string, b string")
    r = cramers_v(df, "a", "b").collect()[0]
    assert r["n"] == 15 and r["n_cells"] == 3 and r["dof"] == 4
    assert r["cramers_v"] == 1.0


def test_cramers_v_independence_zero(spark):
    from institutional_fx_etl_spark.operators.profiling import cramers_v

    # perfectly balanced 2×2 → chi2 = 0 → V = 0
    rows = [("x", "p"), ("x", "q"), ("y", "p"), ("y", "q")] * 4
    df = spark.createDataFrame(rows, "a string, b string")
    r = cramers_v(df, "a", "b").collect()[0]
    assert r["chi2"] == 0.0 and r["cramers_v"] == 0.0


def test_chisq_sparse_table_counts_zero_cells(spark):
    """A diagonal (perfect-association) table: only k of the k² cells
    are observed, but the χ² must include the zero-cell mass — the
    textbook value is n·(k−1)."""
    from institutional_fx_etl_spark.operators.profiling import (
        chisq_independence,
    )

    rows = [("x", "p")] * 5 + [("y", "q")] * 7 + [("z", "r")] * 3
    df = spark.createDataFrame(rows, "a string, b string")
    r = chisq_independence(df, "a", "b").collect()[0]
    assert r["n_cells"] == 3 and r["dof"] == 4
    assert abs(r["chi2"] - 15 * 2) < 1e-4


def test_countmin_never_underestimates_and_exact_when_sparse(spark):
    from institutional_fx_etl_spark.operators.sketches import (
        countmin_estimate,
    )

    rows = [(k,) for k in [1] * 50 + [2] * 30 + [3] * 20 + [4] * 5]
    df = spark.createDataFrame(rows, "user_id long")
    got = {r["key"]: r for r in countmin_estimate(df, "user_id").collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[1]["true_cnt"] == 50
    for r in got.values():
        assert r["cms_est"] >= r["true_cnt"]
        assert r["overestimate"] == r["cms_est"] - r["true_cnt"]
    # 4 distinct keys in 4×256 counters: collisions are impossible per
    # row, so the estimate is exact
    assert all(r["overestimate"] == 0 for r in got.values())


def test_countmin_collision_overestimates(spark):
    from institutional_fx_etl_spark.operators.sketches import (
        countmin_estimate,
    )

    # width=1: every key shares the single counter per row → every
    # estimate equals the total stream length
    rows = [(k,) for k in [1] * 7 + [2] * 3]
    df = spark.createDataFrame(rows, "user_id long")
    got = {
        r["key"]: r
        for r in countmin_estimate(df, "user_id", width=1).collect()
    }
    assert got[1]["cms_est"] == 10 and got[2]["cms_est"] == 10
    assert got[2]["overestimate"] == 7


def test_proportion_ztest_hand(spark):
    from institutional_fx_etl_spark.operators.profiling import (
        proportion_ztest,
    )

    # cohort 0: 10 trials 4 successes; cohort 1: 20 trials 5 successes
    rows = [(0, 1)] * 4 + [(0, 0)] * 6 + [(1, 1)] * 5 + [(1, 0)] * 15
    df = spark.createDataFrame(rows, "c int, s int")
    r = proportion_ztest(df, "s = 1", "c = 1").collect()[0]
    assert (r["n_0"], r["x_0"], r["n_1"], r["x_1"]) == (10, 4, 20, 5)
    import math

    p = 9 / 30
    z = (0.4 - 0.25) / math.sqrt(p * (1 - p) * (1 / 10 + 1 / 20))
    assert abs(r["z"] - z) < 1e-6


def test_pareto_topshare_hand(spark):
    from institutional_fx_etl_spark.operators.profiling import (
        pareto_topshare,
    )

    # group g: values 50, 30, 10, 10 → top-2 (80.0) carry exactly 80%
    rows = [("g", "a", 50.0), ("g", "b", 30.0), ("g", "c", 10.0),
            ("g", "d", 10.0)]
    df = spark.createDataFrame(rows, "grp string, k string, v double")
    r = pareto_topshare(df, "grp", "k", "v").collect()[0]
    assert r["n_keys"] == 4 and r["total_value"] == 100.0
    assert r["k_top"] == 2 and r["k_share"] == 0.5


def test_streaming_cusum_state_across_batches(spark, tmp_path):
    """Two file drops → two micro-batches; the statistic must carry
    across the boundary through persisted state and equal the batch
    operator row-for-row."""
    from institutional_fx_etl_spark.operators.timeseries import (
        cusum_changepoint,
    )
    from institutional_fx_etl_spark.streaming.stateful import streaming_cusum

    series = {
        "a": [10.0, 80.0, 90.0, 5.0, 5.0, 70.0, 200.0, 1.0],
        "b": [100.0, 100.0, 1.0, 1.0, 1.0, 300.0],
    }
    df = _cusum_frame(spark, series)
    batch = {
        (r["grp"], r["id"]): (r["cusum_micro"], r["alarm"])
        for r in cusum_changepoint(df, target=55.0, threshold=100.0).collect()
    }

    src = tmp_path / "cusum_events"
    src.mkdir()
    schema = (
        "event_id long, ts timestamp, event_type string, value double"
    )
    # the split must respect per-key event-time order (the operator's
    # documented stream contract) — so cut on TIME, not on id parity
    cut = datetime(2024, 1, 1) + timedelta(seconds=4 * 40_000)
    df.filter(F.col("ts") < F.lit(cut)).coalesce(1).write.parquet(
        str(src / "batch1")
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src) + "/*")
    )
    q = (
        streaming_cusum(stream, target=55.0, threshold=100.0)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("cusum_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        df.filter(F.col("ts") >= F.lit(cut)).coalesce(1).write.parquet(
            str(src / "batch2")
        )
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["grp"], r["id"]): (r["cusum_micro"], r["alarm"])
        for r in spark.table("cusum_stream").collect()
    }
    assert got == batch


def test_hll_registers_merge_by_max(spark):
    """The defining sketch property: registers built on two halves,
    merged with MAX, equal the registers built on the union — so the
    estimate is identical however the data was partitioned."""
    from institutional_fx_etl_spark.operators.sketches import hll_estimate

    rows = [("g", k) for k in range(2000)]
    df = spark.createDataFrame(rows, "grp string, k long")
    whole = hll_estimate(df, "k", "grp").collect()[0]
    # same data written as two disjoint halves into one frame — the
    # distributed MAX(rho) must see through any split
    split = df.repartition(7)
    split_r = hll_estimate(split, "k", "grp").collect()[0]
    assert whole["sum_scaled"] == split_r["sum_scaled"]
    assert whole["est"] == split_r["est"]


def test_hll_estimate_accuracy(spark):
    """HLL with m=256 has ~6.5% relative standard error — assert the
    estimate lands within 20% of truth at two cardinalities (fixed
    hashes: this is a deterministic regression gate, not a flake)."""
    from institutional_fx_etl_spark.operators.sketches import hll_estimate

    rows = [("small", k) for k in range(300)] + [
        ("large", 10_000 + k) for k in range(20_000)
    ]
    df = spark.createDataFrame(rows, "grp string, k long")
    got = {r["grp"]: r for r in hll_estimate(df, "k", "grp").collect()}
    for grp, true in (("small", 300), ("large", 20_000)):
        est = got[grp]["est"]
        assert abs(est - true) / true < 0.20, (grp, est)
        assert got[grp]["true_distinct"] == true


def test_cusum_plan_has_no_single_partition_exchange(spark):
    """The two-level bucket decomposition must keep every window
    partitioned — no full-data single-partition stage even though the
    statistic is a global running prefix per group."""
    from institutional_fx_etl_spark.operators.timeseries import (
        cusum_changepoint,
    )

    df = _cusum_frame(spark, {"a": [1.0] * 20, "b": [2.0] * 20})
    plan = (
        cusum_changepoint(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange SinglePartition" not in plan, plan


def test_minhash_candidate_stage_has_no_semi_join(spark):
    """The grouped-bucket restructure removed the hot-bucket semi-join
    and the candidate self-join: the only joins left in the whole plan
    are the two Jaccard-verify lookups."""
    import re

    from institutional_fx_etl_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta") for i in range(4)],
        "doc_id long, text string",
    )
    out = minhash_lsh_pairs(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" not in plan, plan
    assert len(re.findall(r"Join", plan)) == 2, plan
    assert out.count() == 6  # all 4 identical docs pair up


def test_fuzzy_best_match_hand(spark):
    from institutional_fx_etl_spark.operators.linkage import fuzzy_best_match

    catalog = spark.createDataFrame(
        [("red widget",), ("blue bolt",), ("small ring",)], "name string"
    )
    queries = spark.createDataFrame(
        [(1, "rd widget"), (2, "blue blot"), (3, "xyzzyq")],
        "qid long, qtext string",
    )
    got = {
        r["qid"]: r["match_text"]
        for r in fuzzy_best_match(
            queries, catalog, "qid", "qtext", "name"
        ).collect()
    }
    assert got[1] == "red widget"
    assert got[2] == "blue bolt"
    assert 3 not in got  # zero shared trigrams → no match row


def test_fuzzy_hot_trigram_cap_prunes(spark):
    from institutional_fx_etl_spark.operators.linkage import fuzzy_best_match

    # every catalog entry shares the 'aaa' trigrams; max_df=2 drops
    # them all → no candidates at all
    catalog = spark.createDataFrame(
        [("aaaa x",), ("aaaa y",), ("aaaa z",)], "name string"
    )
    queries = spark.createDataFrame([(1, "aaaa q")], "qid long, qtext string")
    pruned = fuzzy_best_match(
        queries, catalog, "qid", "qtext", "name", max_df=2
    )
    full = fuzzy_best_match(queries, catalog, "qid", "qtext", "name")
    assert pruned.count() == 0 and full.count() == 1


def test_decay_score_hand(spark):
    from institutional_fx_etl_spark.operators.timeseries import decay_score

    rows = [
        (7, datetime(2024, 1, 31), 8.0),   # age 1 → 4.0
        (7, datetime(2024, 1, 30), 8.0),   # age 2 → 2.0
        (7, datetime(2024, 1, 1), 8.0),    # age 31 → ~0 (micro-floor)
        (9, datetime(2024, 2, 1), 3.5),    # age 0 → 3.5
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        r["key"]: r for r in decay_score(
            df, "user_id", "value", "ts", "2024-02-01"
        ).collect()
    }
    assert got[9]["decayed_score"] == 3.5
    assert abs(got[7]["decayed_score"] - (4.0 + 2.0 + 8.0 / 2**31)) < 1e-5
    assert got[7]["n_events"] == 3


def test_dedup_recall_eval_counts(spark, tmp_path):
    """Hand corpus: 3 identical docs (+1 unrelated) → truth = 3 pairs,
    LSH finds all (identical signatures always collide), precision 1."""
    import __spark_entry__ as entry

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(3)]
        + [(9, "unrelated words appear only here today")],
        "doc_id long, text string",
    )
    docs = docs.selectExpr(
        "doc_id", "text", "'en' AS lang", "'s' AS source",
        "length(text) AS n_chars",
    )
    out = tmp_path / "documents.parquet"
    docs.coalesce(1).write.parquet(str(out))
    # the contract fn reads <sf_dir>/documents.parquet
    r = entry.queries()["dedup_recall_eval"](spark, str(tmp_path)).collect()[0]
    assert r["n_truth"] == 3 and r["n_found"] == 3
    assert r["true_positives"] == 3
    assert r["precision"] == 1.0 and r["recall"] == 1.0


def test_compact_small_files(spark, tmp_path):
    from institutional_fx_etl_spark.sources.writers import (
        compact_small_files,
    )

    path = str(tmp_path / "tbl")
    df = spark.range(10_000).selectExpr(
        "id", "id % 3 AS part", "md5(CAST(id AS STRING)) AS payload"
    )
    # 64 shuffle partitions × 3 hive partitions → a small-file mess
    df.repartition(64).write.partitionBy("part").parquet(path)
    before = spark.read.parquet(path).orderBy("id").collect()

    stats = compact_small_files(spark, path, partition_col="part")
    after_df = spark.read.parquet(path)
    assert stats["files_after"] < stats["files_before"]
    assert stats["files_after"] <= 3  # one file per hive partition here
    # partition layout (and pruning) preserved
    assert [d.name for d in sorted((tmp_path / "tbl").glob("part=*"))] == [
        "part=0", "part=1", "part=2",
    ]
    assert after_df.orderBy("id").collect() == before


def test_diff_in_diff_hand(spark):
    from institutional_fx_etl_spark.operators.profiling import diff_in_diff

    # control: 10 → 12 (+2); treated: 20 → 27 (+7) → DiD = +5
    rows = (
        [(0, 0, 10.0)] * 3 + [(0, 1, 12.0)] * 3
        + [(1, 0, 20.0)] * 2 + [(1, 1, 27.0)] * 4
    )
    df = spark.createDataFrame(rows, "t int, p int, value double")
    r = diff_in_diff(df, "value", "t = 1", "p = 1").collect()[0]
    assert (r["n_c_pre"], r["n_c_post"], r["n_t_pre"], r["n_t_post"]) == (
        3, 3, 2, 4,
    )
    assert r["mean_t_post"] == 27.0 and r["mean_c_pre"] == 10.0
    assert r["did"] == 5.0


def test_erase_keys(spark, tmp_path):
    from institutional_fx_etl_spark.sources.writers import erase_keys

    path = str(tmp_path / "events_tbl")
    df = spark.range(1000).selectExpr(
        "id AS event_id", "id % 50 AS user_id", "md5(CAST(id AS STRING)) AS payload"
    )
    df.write.parquet(path)
    subjects = spark.createDataFrame([(7,), (13,), (999,)], "user_id long")
    audit = erase_keys(spark, path, "user_id", subjects)
    # users 7 and 13 have 20 rows each; 999 matches nothing
    assert audit == {
        "rows_before": 1000,
        "rows_after": 960,
        "rows_erased": 40,
    }
    left = spark.read.parquet(path)
    assert left.filter("user_id IN (7, 13)").count() == 0
    assert left.count() == 960


def test_quarantine_write(spark, tmp_path):
    from institutional_fx_etl_spark.sources.writers import quarantine_write

    df = spark.createDataFrame(
        [(1, 10.0), (2, -3.0), (3, None), (4, 7.0)],
        "id long, v double",
    )
    audit = quarantine_write(
        df,
        {"v_positive": F.col("v") > 0, "v_present": F.col("v").isNotNull()},
        str(tmp_path / "good"),
        str(tmp_path / "quarantine"),
    )
    assert audit == {"rows_good": 2, "rows_quarantined": 3}
    bad = spark.read.parquet(str(tmp_path / "quarantine"))
    got = {(r["id"], r["rule"]) for r in bad.collect()}
    # id 2 breaks v_positive; id 3 breaks both (NULL fails both rules)
    assert got == {(2, "v_positive"), (3, "v_positive"), (3, "v_present")}


def test_quantile_sketch_accuracy_and_merge_invariance(spark):
    from institutional_fx_etl_spark.operators.sketches import quantile_sketch

    rows = [(float(k % 997) + 0.25,) for k in range(20_000)]
    df = spark.createDataFrame(rows, "value double")
    got = {r["q"]: r for r in quantile_sketch(df, "value").collect()}
    for q, r in got.items():
        # sub_bits=4 ⇒ ≤ ~1/16 relative error, est from below
        assert r["est"] <= r["exact"]
        assert r["exact"] == 0 or (r["exact"] - r["est"]) / r["exact"] < 1 / 8
        assert r["n"] == 20_000
    # partitioning must not change the sketch (mergeable state)
    re = {
        r["q"]: r["est"]
        for r in quantile_sketch(df.repartition(13), "value").collect()
    }
    assert re == {q: r["est"] for q, r in got.items()}


def test_bloom_membership_no_false_negatives_and_fp_when_tiny(spark):
    from institutional_fx_etl_spark.operators.sketches import (
        bloom_membership,
    )

    keys = spark.createDataFrame([(k,) for k in range(100)], "user_id long")
    probes = spark.createDataFrame(
        [(p,) for p in range(200)], "probe long"
    )
    got = {r["probe"]: r for r in bloom_membership(keys, "user_id", probes).collect()}
    assert len(got) == 200
    # Bloom never false-negatives
    for p in range(100):
        assert got[p]["maybe_present"] and got[p]["actually_present"]
        assert not got[p]["false_positive"]
    for p in range(100, 200):
        assert not got[p]["actually_present"]
        assert got[p]["false_positive"] == got[p]["maybe_present"]
    # width=1: every bit set → everything "maybe", absent = all FPs
    tiny = {
        r["probe"]: r
        for r in bloom_membership(
            keys, "user_id", probes, width=1
        ).collect()
    }
    assert all(r["maybe_present"] for r in tiny.values())
    assert sum(r["false_positive"] for r in tiny.values()) == 100
