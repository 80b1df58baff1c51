"""Round-11 fixes: the four round-10 ADVICE findings.

1. ``contamination_audit`` lexical leg broadcasts the EVAL side
   (``decontaminate_eval_broadcast``) — equality with the benchmark-
   broadcast operator and plan-side broadcast direction.
2/3/4. NULL group keys are first-class in ``quantile_align``,
   ``kfold_assign`` and ``perplexity_buckets`` (null-safe rejoins —
   no silent row drops).
5. ``boilerplate_purge`` (+ incremental): tokenless docs emit no ''
   segment, can't inflate doc frequency, and still get their zero-
   count output row.
"""

import pytest
from pyspark.sql import functions as F

from institutional_fx_etl_spark.operators.selection import (
    kfold_assign,
    quantile_align,
)
from institutional_fx_etl_spark.operators.text import (
    boilerplate_purge,
    boilerplate_purge_incremental,
    decontaminate_against,
    decontaminate_eval_broadcast,
    perplexity_buckets,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


# --------------------------------------------------------------- #1
def test_eval_broadcast_equals_benchmark_broadcast(spark):
    corpus = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "an entirely different sentence with no overlap at all"),
            (3, "the quick brown fox jumps over the lazy dog again"),
        ],
    )
    ev = _docs(
        spark,
        [
            (100, "the quick brown fox jumps over the lazy dog sometimes"),
            (101, "completely novel eval text nothing shared here ever"),
            (102, ""),  # tokenless eval doc: zero matches, still a row
        ],
    )
    a = decontaminate_against(ev, corpus, n=5).orderBy("doc_id").collect()
    b = decontaminate_eval_broadcast(ev, corpus, n=5).orderBy(
        "doc_id"
    ).collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
    got = {r["doc_id"]: r["n_matched"] for r in b}
    assert got[100] > 0 and got[101] == 0 and got[102] == 0


def test_eval_broadcast_broadcasts_the_eval_side(spark):
    corpus = _docs(spark, [(1, "a b c d e f g h")])
    ev = _docs(spark, [(9, "a b c d e f g h")])
    plan = decontaminate_eval_broadcast(ev, corpus)._jdf.queryExecution(
    ).executedPlan().toString()
    # exactly the hint's broadcast: the eval (doc_id, gram) pairs
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


# ------------------------------------------------------------ #2/3/4
def test_quantile_align_keeps_null_group_and_score(spark):
    df = spark.createDataFrame(
        [
            (1, "web", 10),
            (2, "web", 20),
            (3, None, 30),
            (4, None, 40),
            (5, "web", None),
        ],
        "doc_id bigint, source string, n_chars int",
    )
    out = quantile_align(df).collect()
    assert len(out) == 5, "NULL-keyed documents must not be dropped"
    by_id = {r["doc_id"]: r for r in out}
    # NULL group is its own group of 2
    assert by_id[3]["grp_rank"] == 1 and by_id[4]["grp_rank"] == 2
    # NULL score ranks lowest inside its group (ASC NULLS FIRST)
    assert by_id[5]["grp_rank"] == 1 and by_id[1]["grp_rank"] == 2


def test_kfold_assign_keeps_null_stratum(spark):
    df = spark.createDataFrame(
        [(i, "s" if i % 2 else None) for i in range(20)],
        "doc_id bigint, source string",
    )
    out = kfold_assign(df, k=3, stratum_expr="source").collect()
    assert len(out) == 20
    null_rows = [r for r in out if r["stratum"] is None]
    assert len(null_rows) == 10
    # folds inside the NULL stratum stay balanced (±1)
    from collections import Counter

    c = Counter(r["fold"] for r in null_rows)
    assert max(c.values()) - min(c.values()) <= 1


def test_perplexity_buckets_keeps_null_lang(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a", "en"),
            (2, "a a a a a", "en"),
            (3, "b b a a b", None),
            (4, "a b b b a", None),
            (5, "b a b a b", None),
        ],
        "doc_id bigint, text string, lang string",
    )
    out = perplexity_buckets(df).collect()
    assert len(out) == 5, "NULL-lang documents must not be dropped"
    nulls = [r for r in out if r["lang"] is None]
    assert sorted(r["lang_rank"] for r in nulls) == [1, 2, 3]
    assert {r["bucket"] for r in nulls} == {"head", "middle", "tail"}


# --------------------------------------------------------------- #5
def test_boilerplate_purge_ignores_empty_docs(spark):
    # three empty docs would previously make '' a df=3 "boilerplate"
    # segment; n_segments counted it too
    df = _docs(
        spark,
        [
            (1, ""),
            (2, "   "),
            (3, ""),
            (4, "one two three four five six seven eight"),
            (5, "unique nine ten eleven twelve thirteen fourteen fifteen"),
        ],
    )
    out = {r["doc_id"]: r for r in boilerplate_purge(df).collect()}
    assert len(out) == 5, "one row per input document"
    for d in (1, 2, 3):
        assert out[d]["n_segments"] == 0
        assert out[d]["n_purged"] == 0
        assert out[d]["clean_text"] == ""
    assert out[4]["n_segments"] == 1 and out[4]["n_purged"] == 0
    assert out[5]["n_segments"] == 1


def test_boilerplate_incremental_equals_full_with_empty_docs(spark):
    rows = [
        (1, ""),
        (2, "shared boiler plate text one two three eight"),
        (3, "shared boiler plate text one two three eight"),
        (4, "fresh words only here nothing shared at all"),
        (5, ""),
        (6, "shared boiler plate text one two three eight"),
    ]
    df = _docs(spark, rows)
    old = df.filter("doc_id <= 3")
    new = df.filter("doc_id > 3")  # includes an empty NEW doc (5)
    inc = boilerplate_purge_incremental(old, new).orderBy("doc_id")
    full = boilerplate_purge(df).orderBy("doc_id")
    assert [r.asDict() for r in inc.collect()] == [
        r.asDict() for r in full.collect()
    ]


# ---------------------------------------------------- verdict ask #4
def test_thousand_day_backfill_distributed_dayset(spark, tmp_path):
    """A 1000-day backfill batch must take the DISTRIBUTED day-set
    path (no 1000-literal IN-list in any plan) and still converge to
    the exact from-scratch state. Days > max_inlist_days (default
    256), so both the affected-day and refresh-day filters become
    broadcast semi-joins; equality is checked via count + order-free
    row hash (the spine spans ~1.4M rows - too big to collect)."""
    from datetime import datetime, timedelta

    from institutional_fx_etl_spark.plans.incremental import (
        IncrementalHybridPipeline,
    )
    from institutional_fx_etl_spark.plans.pipeline import HybridMergerSpark

    t0 = datetime(2020, 1, 6)  # Monday

    def ticks(day_range):
        rows = []
        for d in day_range:
            base = t0 + timedelta(days=d)
            if base.weekday() >= 5:  # skip weekends (F2 drops them)
                continue
            for m in (600, 601):  # two minutes per day, 10:00-10:01
                mid = 1.0 + (d % 64) / 16 + m / 4096
                rows.append(
                    (
                        base + timedelta(minutes=m),
                        mid + 0.125,
                        mid - 0.125,
                    )
                )
        return spark.createDataFrame(
            rows, "datetime timestamp, ask double, bid double"
        )

    def m1(day_range):
        rows = []
        for d in day_range:
            base = t0 + timedelta(days=d)
            if base.weekday() >= 5:
                continue
            v = 1.0 + (d % 32) / 16
            rows.append(
                (base + timedelta(minutes=599), v, v + 0.25, v - 0.25,
                 v + 0.125, 7.0, None)
            )
        return spark.createDataFrame(
            rows,
            "datetime timestamp, open double, high double, low double,"
            " close double, volume double, spread double",
        )

    all_m1 = m1(range(0, 1002))
    recent = ticks(range(1000, 1002))
    backfill = ticks(range(0, 1000))

    inc = IncrementalHybridPipeline(
        spark,
        str(tmp_path / "state1000"),
        spike_threshold=1e9,
        consensus_threshold=1e9,
    )
    inc.update(all_m1, recent)
    inc.update(all_m1, backfill)  # 1000-day backfill
    assert inc._last_update_inlist == {
        "days_affected": False,
        "refresh": False,
    }, "1000-day batch must NOT inline literal day lists"

    eng = HybridMergerSpark(spike_threshold=1e9, consensus_threshold=1e9)
    full, _ = eng.run(all_m1, recent.unionByName(backfill))

    def sig(df):
        cols = sorted(df.columns)
        return (
            df.selectExpr(
                "count(1) AS n",
                f"sum(xxhash64({', '.join(cols)})) AS h",
            ).collect()[0].asDict()
        )

    assert sig(inc.read_final()) == sig(full)


# ------------------------------------------------- round-11 new ops
def test_stupid_backoff_levels(spark):
    train = _docs(
        spark,
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat on the rug"),
        ],
    )
    score = _docs(
        spark,
        [
            # seen trigram ("the cat sat" is in train)
            (10, "the cat sat"),
            # bigram backoff: "cat sat on" trigram unseen as a whole?
            # it IS in train (doc 1). Use an unseen trigram with seen
            # bigram tail: "dog sat on" is in train; "mat dog sat" is
            # not, but "dog sat" is
            (11, "mat dog sat"),
            # unigram backoff: "rug mat cat": no trigram, "mat cat"
            # unseen bigram, "cat" seen unigram
            (12, "rug mat cat"),
            # floor: unseen final token
            (13, "the cat zebra"),
        ],
    )
    from institutional_fx_etl_spark.operators.text import stupid_backoff_lm

    out = {r["doc_id"]: r for r in stupid_backoff_lm(train, score).collect()}
    assert out[10]["n_tri"] == 1 and out[10]["n_positions"] == 1
    assert out[11]["n_bi_backoff"] == 1
    assert out[12]["n_uni_backoff"] == 1
    assert out[13]["n_floor"] == 1
    # seen trigram scores strictly better than the floor
    assert out[10]["avg_log2_s"] > out[13]["avg_log2_s"]


def test_mmr_prefers_diversity_over_pure_topk(spark):
    # query q=(1,0); a-cluster hugs q, 9 is orthogonal. Pure top-3 =
    # {0, 1, 2} (the clones). With the query itself in the candidate
    # set, rel(d) == sim(d, selected_1), so lambda = 0.5 makes every
    # step-2 score ~0 (ties -> min id: the faithful-formula outcome);
    # a diversity-leaning lambda = 0.3 must bring vector 9 in at
    # step 2 (clones score 3*rel - 7*rel < 0, the orthogonal one 0).
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.999, 0.01]),
        (2, [0.998, 0.02]),
        (9, [0.0, 1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    from institutional_fx_etl_spark.operators.selection import mmr_select

    out = (
        mmr_select(emb, query_id=0, k=3, shortlist=4, lam_tenths=3)
        .orderBy("rank")
        .collect()
    )
    picked = [r["vec_id"] for r in out]
    assert picked[0] == 0
    assert picked[1] == 9, f"MMR must pick the diverse vector, got {picked}"
    assert out[0]["rel_cosine"] == 1.0
    # pure-relevance degenerate check: lambda=0.5 with q in the set
    # ties step 2 at 0 and the min id wins
    out5 = (
        mmr_select(emb, query_id=0, k=2, shortlist=4, lam_tenths=5)
        .orderBy("rank")
        .collect()
    )
    assert [r["vec_id"] for r in out5] == [0, 1]


def test_label_prop_two_cliques(spark):
    # two triangles joined by nothing: labels converge to each
    # clique's min node id
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)],
        "src bigint, dst bigint",
    )
    from institutional_fx_etl_spark.operators.graph import (
        label_prop_communities,
    )

    out = {r["node"]: r for r in label_prop_communities(edges).collect()}
    assert {out[n]["label"] for n in (1, 2, 3)} == {1}
    assert {out[n]["label"] for n in (10, 11, 12)} == {10}
    assert out[1]["n_members"] == 3 and out[10]["n_members"] == 3


def test_l_diversity_flags_single_valued_groups(spark):
    df = spark.createDataFrame(
        [
            ("en", 0, "web"), ("en", 0, "forum"), ("en", 0, "wiki"),
            ("de", 0, "web"), ("de", 0, "web"), ("de", 0, "web"),
        ],
        "lang string, len_bucket int, source string",
    )
    from institutional_fx_etl_spark.operators.profiling import l_diversity

    r = l_diversity(df, ["lang", "len_bucket"], "source", l=3).collect()[0]
    assert r["n_groups"] == 2 and r["l_min"] == 1
    assert r["groups_below_l"] == 1 and r["rows_below_l"] == 3
    assert r["at_risk_share"] == 0.5


def test_heaps_law_fit_monotone_growth(spark):
    # vocabulary that grows sublinearly: doc i contributes i distinct
    # new words plus repeats of word "the"
    rows = []
    for i in range(1, 33):
        words = ["the"] * 8 + [f"w{i}_{j}" for j in range(i)]
        rows.append((i, " ".join(words)))
    df = _docs(spark, rows)
    from institutional_fx_etl_spark.operators.text import heaps_law_fit

    r = heaps_law_fit(df, checkpoints=8).collect()[0]
    assert r["n_points"] == 8
    assert 0.0 < r["beta"] <= 1.5
    assert r["vocab_total"] == 1 + sum(range(1, 33))
    assert r["tokens_total"] == sum(8 + i for i in range(1, 33))
    assert r["r2"] > 0.9


def test_graph_modularity_two_cliques_vs_random(spark):
    from institutional_fx_etl_spark.operators.graph import (
        graph_modularity,
        label_prop_communities,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)],
        "src bigint, dst bigint",
    )
    labels = label_prop_communities(edges).select("node", "label")
    r = graph_modularity(edges, labels).collect()[0]
    # two perfect cliques: Q = 1 - 1/k with k communities -> 0.5
    assert r["n_communities"] == 2 and r["n_edges"] == 6
    assert r["internal_edges"] == 6
    assert abs(r["modularity"] - 0.5) < 1e-9
    # everything in ONE community: Q = 0 by definition
    one = labels.selectExpr("node", "CAST(1 AS BIGINT) AS label")
    r1 = graph_modularity(edges, one).collect()[0]
    assert abs(r1["modularity"]) < 1e-9


def test_kcenter_picks_farthest_first(spark):
    # seed at (1,0); farthest point is (-1,0) (cosine distance 2),
    # then (0,1) / (0,-1) split the remaining coverage
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (2, [-1.0, 0.0]),
        (3, [0.0, 1.0]),
        (4, [0.0, -1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    from institutional_fx_etl_spark.operators.selection import kcenter_select

    out = kcenter_select(emb, k=3, seed_id=0).orderBy("rank").collect()
    assert [r["vec_id"] for r in out][:2] == [0, 2]
    assert out[1]["dist_micro"] == 2_000_000  # cos = -1 -> 1e6 - (-1e6)
    # third pick: one of the orthogonal pair (dist 1e6), min id breaks
    # the tie
    assert out[2]["vec_id"] == 3 and out[2]["dist_micro"] == 1_000_000


def test_kl_divergence_zero_for_identical_distributions(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c", "s1"), (2, "a b c", "s1"),
            (3, "a b c", "s2"), (4, "a b c", "s2"),
        ],
        "doc_id bigint, text string, source string",
    )
    from institutional_fx_etl_spark.operators.text import ngram_kl_divergence

    out = {r["grp"]: r for r in ngram_kl_divergence(df).collect()}
    # both sources match the corpus distribution exactly -> KL ~ 0
    # (add-one smoothing over identical supports keeps it tiny)
    for s in ("s1", "s2"):
        assert abs(out[s]["kl_bits"]) < 0.01
        assert out[s]["vocab_present"] == 3


def test_kl_divergence_ranks_the_shifted_source_higher(spark):
    rows = [(i, "common words shared here", "base") for i in range(8)]
    rows += [(100 + i, "utterly different vocabulary entirely", "shift")
             for i in range(2)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    from institutional_fx_etl_spark.operators.text import ngram_kl_divergence

    out = {r["grp"]: r for r in ngram_kl_divergence(df).collect()}
    assert out["shift"]["kl_bits"] > out["base"]["kl_bits"] > 0


def test_semdedup_incremental_cap_flip_equals_full(spark):
    """The max_cell path: the new batch pushes one cell over the cap,
    so its old members' verdicts FLIP to keep=true - the incremental
    rewrite must still equal the full rebuild bit-for-bit."""
    import math

    from institutional_fx_etl_spark.operators.similarity import (
        semdedup,
        semdedup_incremental,
    )

    def vec(angle_millis):
        a = angle_millis / 1000.0
        return [math.cos(a), math.sin(a)]

    # cell seeds: ids 0 (angle 0) and 1 (angle ~pi/2). Old: 4 tight
    # near-dups around seed 0 (cap 6 holds: with cell size 5 <= 6 the
    # compare runs and ids 3,4,5 drop). New: 3 more vectors land in
    # the same cell -> size 8 > cap -> whole cell flips to keep.
    old_rows = [(0, vec(0)), (1, vec(1571))] + [
        (i, vec(i)) for i in (3, 4, 5, 6)
    ]
    new_rows = [(100, vec(7)), (101, vec(8)), (102, vec(1570))]
    old = spark.createDataFrame(
        old_rows, "vec_id bigint, embedding array<float>"
    )
    new = spark.createDataFrame(
        new_rows, "vec_id bigint, embedding array<float>"
    )
    both = old.unionByName(new)
    for cap in (6, None):
        inc = semdedup_incremental(
            old, new, num_centroids=2, min_cosine=0.95, max_cell=cap
        )
        full = semdedup(
            both, num_centroids=2, min_cosine=0.95, max_cell=cap
        )
        got = sorted(
            (r["vec_id"], r["cid"], r["keep"]) for r in inc.collect()
        )
        exp = sorted(
            (r["vec_id"], r["cid"], r["keep"]) for r in full.collect()
        )
        assert got == exp, f"cap={cap}: {got} != {exp}"
    # sanity: under cap=6 the big cell flipped all-keep
    capped = dict(
        (r["vec_id"], r["keep"])
        for r in semdedup_incremental(
            old, new, num_centroids=2, min_cosine=0.95, max_cell=6
        ).collect()
    )
    assert all(capped[i] for i in (3, 4, 5, 6, 100, 101))
    # and WITHOUT the cap the near-dups drop
    uncapped = dict(
        (r["vec_id"], r["keep"])
        for r in semdedup_incremental(
            old, new, num_centroids=2, min_cosine=0.95
        ).collect()
    )
    assert not uncapped[100] and not uncapped[101]


def test_prefix_filter_complete_vs_brute_force(spark):
    """Completeness is the operator's contract: every pair with
    Jaccard >= tau must appear (compare against brute-force all-pairs
    on a small corpus)."""
    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta zeta"),     # J(1,2) = 4/6 = 0.667
        (3, "alpha beta gamma delta epsilon"),  # J(1,3) = 1.0
        (4, "one two three four five"),
        (5, "one two three four six"),          # J(4,5) = 4/6
        (6, "totally unrelated words here now"),
    ]
    df = _docs(spark, rows)
    from institutional_fx_etl_spark.operators.dedup import (
        prefix_filter_pairs,
    )

    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in prefix_filter_pairs(
            df, jaccard_threshold=0.6, shingle_n=None
        ).collect()
    }
    # brute force truth
    toks = {i: set(t.split()) for i, t in rows}
    exp = {}
    ids = sorted(toks)
    for i in ids:
        for j in ids:
            if i < j:
                jac = len(toks[i] & toks[j]) / len(toks[i] | toks[j])
                if jac >= 0.6:
                    exp[(i, j)] = round(jac, 6)
    assert got == exp
    assert (1, 3) in got and got[(1, 3)] == 1.0
    assert (1, 2) in got  # 0.667 >= 0.6 must NOT be missed


def test_merge_fused_checkpoint_policies_identical(spark):
    """The round-11 `checkpoints` knob (auto|last|none) must not
    change a single byte of output - it only moves stage-boundary
    materialization."""
    from datetime import datetime, timedelta

    from institutional_fx_etl_spark.plans.pipeline import HybridMergerSpark
    from institutional_fx_etl_spark.plans.pipeline_fused import merge_fused

    t0 = datetime(2024, 1, 1)
    ticks = spark.createDataFrame(
        [
            (t0 + timedelta(minutes=m, seconds=s), 1.0 + (m % 16) / 16 + 0.125, 1.0 + (m % 16) / 16 - 0.125)
            for m in range(0, 600, 3)
            for s in (5, 40)
        ],
        "datetime timestamp, ask double, bid double",
    )
    m1 = spark.createDataFrame(
        [
            (t0 + timedelta(minutes=m), 1.5, 1.75, 1.25, 1.5, 7.0, None)
            for m in range(100, 300, 2)
        ],
        "datetime timestamp, open double, high double, low double,"
        " close double, volume double, spread double",
    )
    eng = HybridMergerSpark(spike_threshold=1e9, consensus_threshold=50.0)
    rc = eng.resample_ticks(ticks)
    outs = {}
    for policy in ("auto", "last", "none"):
        final, _ = merge_fused(
            m1, rc, spike_threshold=1e9, consensus_threshold=50.0,
            chunk_seconds=3600, checkpoints=policy,
        )
        outs[policy] = sorted(
            tuple(r) for r in final.collect()
        )
    assert outs["auto"] == outs["last"] == outs["none"]
    assert len(outs["auto"]) > 0


def test_prefix_filter_shingle_grain_finds_exact_dup(spark):
    df = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),  # exact dup
            (3, "alpha beta gamma other words here"),    # shares 1 shingle
            (4, "nothing in common at all friend"),
        ],
    )
    from institutional_fx_etl_spark.operators.dedup import (
        prefix_filter_pairs,
    )

    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in prefix_filter_pairs(
            df, jaccard_threshold=0.5, shingle_n=3
        ).collect()
    }
    assert got == {(1, 2): 1.0}


def test_selection_ops_invariant_under_repartition(spark):
    """Distributed determinism: mmr_select and kcenter_select must
    produce identical picks regardless of the input's physical
    partitioning (micro-int argmaxes with total-order tie-breaks may
    not leak any partition-order dependence)."""
    import math

    rows = [
        (i, [math.cos(i / 7.0), math.sin(i / 7.0)]) for i in range(60)
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    from institutional_fx_etl_spark.operators.selection import (
        kcenter_select,
        mmr_select,
    )

    def run(df):
        m = sorted(
            tuple(r)
            for r in mmr_select(
                df, query_id=0, k=4, shortlist=16, lam_tenths=4
            ).collect()
        )
        k = sorted(
            tuple(r) for r in kcenter_select(df, k=4, seed_id=0).collect()
        )
        return m, k

    base = run(emb)
    assert base == run(emb.repartition(17))
    assert base == run(emb.repartition(1))
    assert base == run(emb.repartitionByRange(5, "vec_id"))
