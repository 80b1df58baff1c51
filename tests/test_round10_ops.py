"""Round-10 regression tests — the new ivf_topk_incremental operator
(r9 verdict ask #8) plus this round's contract hardening."""

from __future__ import annotations

from pyspark.sql import functions as F


def _toy_embeddings(spark, n=60, d=8):
    import random

    rng = random.Random(10)
    rows = [
        (i, [rng.uniform(-1.0, 1.0) for _ in range(d)]) for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_ivf_incremental_equals_rebuild(spark):
    """With frozen centroids, ingesting a batch into the standing IVF
    index then searching must be ROW-IDENTICAL to a from-scratch
    ivf_topk over the union — including a query drawn from the new
    batch."""
    from institutional_fx_etl_spark.operators.similarity import (
        ivf_topk,
        ivf_topk_incremental,
    )

    emb = _toy_embeddings(spark)
    old = emb.filter("vec_id % 5 <> 0")
    new = emb.filter("vec_id % 5 = 0")
    centroids = old.filter("vec_id < 5").selectExpr(
        "vec_id AS cid", "embedding AS cv"
    )
    qids = [1, 2, 10]  # 10 is in the NEW batch
    inc = sorted(
        map(
            tuple,
            ivf_topk_incremental(
                old, new, query_ids=qids, k=4, nprobe=2,
                centroids=centroids,
            ).collect(),
        )
    )
    full = sorted(
        map(
            tuple,
            ivf_topk(
                emb, query_ids=qids, k=4, nprobe=2, centroids=centroids
            ).collect(),
        )
    )
    assert inc == full and len(inc) == 3 * 4


def test_ivf_incremental_reuses_standing_index(spark):
    """Passing the persisted old assignment relation (the real ingest
    path — old corpus never rescanned) gives the same answer as
    recomputing it."""
    from institutional_fx_etl_spark.operators.similarity import (
        _assign_to,
        ivf_topk_incremental,
    )

    emb = _toy_embeddings(spark)
    old = emb.filter("vec_id % 5 <> 0")
    new = emb.filter("vec_id % 5 = 0")
    centroids = old.filter("vec_id < 5").selectExpr(
        "vec_id AS cid", "embedding AS cv"
    )
    standing = _assign_to(old, centroids)
    with_index = sorted(
        map(
            tuple,
            ivf_topk_incremental(
                old, new, query_ids=[1, 10], k=3, nprobe=2,
                centroids=centroids, old_index=standing,
            ).collect(),
        )
    )
    recomputed = sorted(
        map(
            tuple,
            ivf_topk_incremental(
                old, new, query_ids=[1, 10], k=3, nprobe=2,
                centroids=centroids,
            ).collect(),
        )
    )
    assert with_index == recomputed and with_index


def test_ivf_incremental_new_vectors_visible(spark):
    """A vector from the new batch must be findable: its own top-1 is
    itself (cosine 1.0) once ingested."""
    from institutional_fx_etl_spark.operators.similarity import (
        ivf_topk_incremental,
    )

    emb = _toy_embeddings(spark)
    old = emb.filter("vec_id % 5 <> 0")
    new = emb.filter("vec_id % 5 = 0")
    centroids = old.filter("vec_id < 5").selectExpr(
        "vec_id AS cid", "embedding AS cv"
    )
    out = ivf_topk_incremental(
        old, new, query_ids=[10], k=1, nprobe=1, centroids=centroids
    ).collect()
    assert len(out) == 1
    assert out[0]["vec_id"] == 10 and out[0]["cosine"] == 1.0


# ---------------------------------------------------------------------
# round-10 wave-1 operators
# ---------------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def test_boilerplate_purge_drops_every_occurrence(spark):
    """A segment shared by >= min_df distinct docs vanishes from ALL of
    them (including the first), while a segment repeated only WITHIN
    one doc survives (doc frequency 1)."""
    from institutional_fx_etl_spark.operators.text import boilerplate_purge

    nav = "home about contact"  # 3-token boilerplate in docs 1 and 2
    rows = [
        (1, f"{nav} alpha beta gamma", "en", "a"),
        (2, f"{nav} delta epsilon zeta", "en", "a"),
        (3, "eta theta iota eta theta iota", "en", "b"),
    ]
    out = {
        r["doc_id"]: r
        for r in boilerplate_purge(
            _docs(spark, rows), segment_tokens=3, min_df=2
        ).collect()
    }
    assert out[1]["clean_text"] == "alpha beta gamma"
    assert out[2]["clean_text"] == "delta epsilon zeta"
    assert out[1]["n_purged"] == 1 and out[2]["n_purged"] == 1
    # intra-doc repeat: df = 1, kept twice
    assert out[3]["clean_text"] == "eta theta iota eta theta iota"
    assert out[3]["n_purged"] == 0 and out[3]["n_segments"] == 2


def test_boilerplate_purge_vs_segment_dedup_first_copy(spark):
    """Contrast with segment_dedup: the first occurrence is purged too."""
    from institutional_fx_etl_spark.operators.text import (
        boilerplate_purge,
        segment_dedup,
    )

    rows = [(1, "x y", "en", "a"), (2, "x y", "en", "a")]
    purged = boilerplate_purge(
        _docs(spark, rows), segment_tokens=2, min_df=2
    ).collect()
    assert all(r["clean_text"] == "" for r in purged)
    deduped = {
        r["doc_id"]: r["clean_text"]
        for r in segment_dedup(_docs(spark, rows), segment_tokens=2).collect()
    }
    assert deduped[1] == "x y" and deduped[2] == ""


def test_perplexity_buckets_tercile_sizes_and_order(spark):
    """Within each language: tercile sizes differ by <= 1, ranks are a
    permutation of 1..n, and no tail doc outscores a head doc."""
    from institutional_fx_etl_spark.operators.text import perplexity_buckets

    words = ["a", "b", "c", "d", "e", "f", "g"]
    rows = [
        (i, " ".join(words[(i + j) % 7] for j in range(2 + i % 5)),
         "en" if i % 3 else "fr", "s")
        for i in range(40)
    ]
    out = perplexity_buckets(_docs(spark, rows)).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        n = len(rs)
        sizes = {"head": 0, "middle": 0, "tail": 0}
        for r in rs:
            sizes[r["bucket"]] += 1
        assert max(sizes.values()) - min(sizes.values()) <= 1, (lang, sizes)
        assert sorted(r["lang_rank"] for r in rs) == list(range(1, n + 1))
        worst_head = min(
            r["avg_log2_prob"] for r in rs if r["bucket"] == "head"
        )
        best_tail = max(
            r["avg_log2_prob"] for r in rs if r["bucket"] == "tail"
        )
        assert best_tail <= worst_head


def test_kfold_assign_balance_and_determinism(spark):
    """Per-stratum fold sizes are exact to +/-1, assignment is a pure
    function of the id, and k < 2 raises."""
    import pytest

    from institutional_fx_etl_spark.operators.selection import kfold_assign

    rows = [(i, "t", "en", f"s{i % 3}") for i in range(101)]
    df = _docs(spark, rows)
    out = kfold_assign(df, k=5).collect()
    assert len(out) == 101
    sizes = {}
    for r in out:
        sizes.setdefault(r["stratum"], [0] * 5)[r["fold"]] += 1
    for stratum, folds in sizes.items():
        assert max(folds) - min(folds) <= 1, (stratum, folds)
    again = {r["doc_id"]: r["fold"] for r in kfold_assign(df, k=5).collect()}
    assert all(again[r["doc_id"]] == r["fold"] for r in out)
    with pytest.raises(ValueError, match="k must be >= 2"):
        kfold_assign(df, k=1)


def test_kfold_assign_subset_stability_of_order(spark):
    """The md5 deal order is global: a doc's sort position among its
    stratum-mates is id-derived, so folds for the SAME ids permute
    consistently when the corpus is the same."""
    from institutional_fx_etl_spark.operators.selection import kfold_assign

    rows = [(i, "t", "en", "s") for i in range(50)]
    df = _docs(spark, rows)
    a = {r["doc_id"]: r["fold"] for r in kfold_assign(df, k=4).collect()}
    b = {r["doc_id"]: r["fold"] for r in kfold_assign(df, k=4).collect()}
    assert a == b


def test_record_linkage_fs_scores_and_guards(spark):
    """Two records agreeing on every field get the maximal score
    (sum of agree weights); total disagreement gets the minimal one;
    validation rejects empty fields and out-of-range m."""
    import math

    import pytest

    from institutional_fx_etl_spark.operators.dedup import record_linkage_fs

    rows = [
        (1, 10, "A", "x"),
        (2, 10, "A", "x"),   # exact agree with 1
        (3, 10, "B", "y"),   # disagrees with both on everything
        (4, 20, "A", "x"),   # other block: never paired with 1-3
    ]
    df = spark.createDataFrame(rows, "id long, blk int, f string, g string")
    fields = [("f", "f", 0.9375), ("g", "g", 0.875)]
    out = record_linkage_fs(
        df, id_col="id", block_expr="blk", fields=fields, top_n=10
    ).collect()
    pairs = {(r["id_a"], r["id_b"]): r for r in out}
    assert set(pairs) == {(1, 2), (1, 3), (2, 3)}
    n = 4
    # value histograms: f: A=3,B=1; g: x=3,y=1 -> sq = 10 each
    def w(m, sq):
        return round(math.log2(m * n * n / sq) * 1e6)

    def wd(m, sq):
        return round(math.log2((1.0 - m) * n * n / (n * n - sq)) * 1e6)

    top = pairs[(1, 2)]
    assert top["agree_f"] == 1 and top["agree_g"] == 1
    assert top["score"] == (w(0.9375, 10) + w(0.875, 10)) / 1e6
    lo = pairs[(1, 3)]
    assert lo["agree_f"] == 0 and lo["agree_g"] == 0
    assert lo["score"] == (wd(0.9375, 10) + wd(0.875, 10)) / 1e6
    with pytest.raises(ValueError, match="at least one field"):
        record_linkage_fs(df, "id", "blk", [])
    with pytest.raises(ValueError, match="m_prob"):
        record_linkage_fs(df, "id", "blk", [("f", "f", 1.0)])


def test_record_linkage_fs_hot_block_cap(spark):
    """max_block drops pairs from oversized blocks entirely (the LSH
    hot-bucket discipline)."""
    from institutional_fx_etl_spark.operators.dedup import record_linkage_fs

    rows = [(i, 1 if i < 5 else 2, "A", "x") for i in range(7)]
    df = spark.createDataFrame(rows, "id long, blk int, f string, g string")
    out = record_linkage_fs(
        df, "id", "blk", [("f", "f", 0.9), ("g", "g", 0.9)],
        top_n=100, max_block=2,
    ).collect()
    # block 1 has 5 members (capped out); block 2 has 2 -> one pair
    assert {(r["id_a"], r["id_b"]) for r in out} == {(5, 6)}


def test_bitext_margin_matches_python_reference(spark):
    """Single-cell corpus: the operator's margins equal a pure-Python
    reference implementing the same round6 + micro-int arithmetic."""
    import math

    from institutional_fx_etl_spark.operators.similarity import bitext_margin

    emb = _toy_embeddings(spark, n=30, d=6)
    out = {
        r["src_id"]: r
        for r in bitext_margin(
            emb, side_expr="vid % 2 = 0", k=3, num_centroids=1
        ).collect()
    }
    rows = {r["vec_id"]: r["embedding"] for r in emb.collect()}

    def unit(v):
        nrm = math.sqrt(math.fsum(x * x for x in v))
        return [x / nrm for x in v]

    def dot6(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return round(s, 6)

    A = {i: unit(v) for i, v in rows.items() if i % 2 == 0}
    B = {i: unit(v) for i, v in rows.items() if i % 2 == 1}
    pairs = {(i, j): dot6(a, b) for i, a in A.items() for j, b in B.items()}
    k = 3
    fwd = {
        i: sorted(B, key=lambda j: (-pairs[(i, j)], j))[:k] for i in A
    }
    bwd = {
        j: sorted(A, key=lambda i: (-pairs[(i, j)], i))[:k] for j in B
    }
    micro = {p: round(c * 1e6) for p, c in pairs.items()}
    best = {}
    for i in A:
        fs, ka = sum(micro[(i, j)] for j in fwd[i]), len(fwd[i])
        cands = []
        for j in fwd[i]:
            bs, kb = sum(micro[(x, j)] for x in bwd[j]), len(bwd[j])
            den = fs * kb + bs * ka
            if den > 0:
                m = round(2 * micro[(i, j)] * ka * kb / den, 6)
                cands.append((-m, j))
        if cands:
            mneg, j = min(cands)
            best[i] = (j, -mneg)
    assert set(out) == set(best)
    for i, (j, m) in best.items():
        assert out[i]["tgt_id"] == j, (i, out[i], j)
        assert out[i]["margin"] == m
        assert out[i]["cosine"] == pairs[(i, j)]


def test_bitext_margin_sides_never_mix(spark):
    """Every emitted pair crosses sides: src even, tgt odd."""
    from institutional_fx_etl_spark.operators.similarity import bitext_margin

    emb = _toy_embeddings(spark, n=40, d=6)
    out = bitext_margin(emb, side_expr="vid % 2 = 0", k=2,
                        num_centroids=4).collect()
    assert out and all(
        r["src_id"] % 2 == 0 and r["tgt_id"] % 2 == 1 for r in out
    )


# ---------------------------------------------------------------------
# round-10 wave-2 operators
# ---------------------------------------------------------------------


def test_hard_negatives_labels_always_differ(spark):
    """Every mined pair crosses labels; NULL-label vectors mine
    negatives from labeled cellmates but two NULLs never pair."""
    from institutional_fx_etl_spark.operators.similarity import (
        hard_negatives,
    )

    emb = _toy_embeddings(spark, n=24, d=6).selectExpr(
        "vec_id",
        "embedding",
        "CASE WHEN vec_id % 4 = 3 THEN NULL"
        " ELSE CAST(vec_id % 2 AS INT) END AS label",
    )
    labels = {r["vec_id"]: r["label"] for r in emb.collect()}
    out = hard_negatives(emb, k=3, num_centroids=2).collect()
    assert out
    for r in out:
        la, lb = labels[r["vec_id"]], labels[r["neg_id"]]
        assert not (la is None and lb is None)
        if la is not None and lb is not None:
            assert la != lb
    # null-label vectors still appear as queries
    assert any(labels[r["vec_id"]] is None for r in out)


def test_hard_negatives_ranks_over_negatives_only(spark):
    """Ranks are 1..k per query with no same-label vector intervening:
    against a brute-force same-cell reference."""
    from institutional_fx_etl_spark.operators.similarity import (
        hard_negatives,
    )

    emb = _toy_embeddings(spark, n=20, d=5).selectExpr(
        "vec_id", "embedding", "CAST(vec_id % 3 AS INT) AS label"
    )
    out = {}
    for r in hard_negatives(emb, k=2, num_centroids=1).collect():
        out.setdefault(r["vec_id"], []).append((r["rank"], r["neg_id"]))
    for vid, rows in out.items():
        assert sorted(r for r, _ in rows) == list(range(1, len(rows) + 1))


def test_corpus_diversity_orders_clone_heavy_above_diverse(spark):
    """A source of near-clones scores a higher mean Jaccard than a
    source of disjoint documents (which scores exactly 0)."""
    from institutional_fx_etl_spark.operators.text import corpus_diversity

    clone = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, clone + f" tail{i % 2}", "en", "clones") for i in range(8)]
    rows += [
        (100 + i, " ".join(f"w{i}x{j}" for j in range(12)), "en", "fresh")
        for i in range(8)
    ]
    out = {r["grp"]: r for r in corpus_diversity(
        _docs(spark, rows), sample_per_group=8
    ).collect()}
    assert out["fresh"]["mean_jaccard"] == 0.0
    assert out["clones"]["mean_jaccard"] > 0.5
    assert out["clones"]["n_pairs"] == 28 and out["clones"]["n_sampled"] == 8


def test_corpus_diversity_short_docs_ineligible(spark):
    """Documents under the shingle width never enter the sample; a
    group with <2 eligible docs emits no row."""
    from institutional_fx_etl_spark.operators.text import corpus_diversity

    rows = [
        (1, "a b", "en", "tiny"),       # 2 tokens < 3 — ineligible
        (2, "c d", "en", "tiny"),
        (3, "one two three four", "en", "ok"),
        (4, "one two three five", "en", "ok"),
    ]
    out = {r["grp"]: r for r in corpus_diversity(
        _docs(spark, rows), sample_per_group=4
    ).collect()}
    assert "tiny" not in out
    assert out["ok"]["n_sampled"] == 2 and out["ok"]["n_pairs"] == 1


def test_zipf_token_fit_two_points_exact(spark):
    """n=2 head: the OLS line passes through both points — verify
    slope/intercept against the same micro-int arithmetic in Python."""
    import math

    from institutional_fx_etl_spark.operators.text import zipf_token_fit

    # 'aa' x4, 'bb' x2 -> ranks 1, 2
    rows = [(1, "aa aa aa aa bb bb", "en", "s")]
    got = zipf_token_fit(_docs(spark, rows), top_r=2).collect()[0]
    x = [round(math.log(1) * 1e6), round(math.log(2) * 1e6)]
    y = [round(math.log(4) * 1e6), round(math.log(2) * 1e6)]
    n = 2
    num = n * sum(a * b for a, b in zip(x, y)) - sum(x) * sum(y)
    den = n * sum(a * a for a in x) - sum(x) ** 2
    slope = round(num / den, 6)
    intercept = round((sum(y) - num / den * sum(x)) / n / 1e6, 6)
    assert got["n_tokens_ranked"] == 2
    assert got["slope"] == slope
    assert got["intercept"] == intercept
    assert got["r2"] == 1.0


def test_zipf_token_fit_flat_corpus_r2(spark):
    """All tokens equally frequent: slope 0, r2 NULL-safe (den 0 ->
    NULL in non-ANSI division) or 0 — accept the engine's NULL."""
    from institutional_fx_etl_spark.operators.text import zipf_token_fit

    rows = [(1, "a b c d", "en", "s"), (2, "a b c d", "en", "s")]
    got = zipf_token_fit(_docs(spark, rows), top_r=4).collect()[0]
    assert got["slope"] == 0.0
    assert got["r2"] is None or got["r2"] == 0.0


def test_probe_calibration_partitions_the_corpus(spark):
    """Bins tile the corpus: sizes sum to the doc count, bin ids stay
    in [0, 9], n_pos <= n_docs, and rates are consistent."""
    from institutional_fx_etl_spark.operators.selection import (
        probe_calibration,
    )

    rows = [
        (i, " ".join(f"w{(i * 7 + j) % 13}" for j in range(6)),
         "en" if i % 2 else "fr", "s")
        for i in range(60)
    ]
    df = _docs(spark, rows)
    out = probe_calibration(
        df, target_expr="lang = 'en'", n_bins=10, buckets=4, steps=2,
        lr_shift=3,
    ).collect()
    assert sum(r["n_docs"] for r in out) == 60
    for r in out:
        assert 0 <= r["bin"] <= 9
        assert 0 <= r["n_pos"] <= r["n_docs"]
        assert r["pos_rate"] == round(r["n_pos"] / r["n_docs"], 6)


def test_hard_negatives_kernel_equals_sql_twin(spark):
    """Regime equality gate: the Arrow label-masked kernel must match
    the pure-JVM cell self-join bit-for-bit, including NULL labels."""
    from institutional_fx_etl_spark.operators.similarity import (
        hard_negatives,
    )

    emb = _toy_embeddings(spark, n=50, d=8).selectExpr(
        "vec_id",
        "embedding",
        "CASE WHEN vec_id % 5 = 4 THEN NULL"
        " ELSE CAST(vec_id % 3 AS INT) END AS label",
    )
    kw = dict(k=3, num_centroids=4)
    got = sorted(map(tuple, hard_negatives(
        emb, pair_strategy="numpy", **kw
    ).collect()))
    ref = sorted(map(tuple, hard_negatives(
        emb, pair_strategy="sql", **kw
    ).collect()))
    assert got == ref and got


# ---------------------------------------------------------------------
# round-10 wave-3 operators
# ---------------------------------------------------------------------


def test_dedup_weights_cluster_mass_is_one(spark):
    """Each near-dup cluster contributes ~1 unit of mass: weights are
    1/|cluster| and singletons weigh exactly 1.0."""
    from institutional_fx_etl_spark.operators.dedup import dedup_weights

    ids = spark.createDataFrame(
        [(i,) for i in range(6)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "id_a long, id_b long"
    )
    out = {r["doc_id"]: r for r in dedup_weights(ids, pairs).collect()}
    assert len(out) == 6
    for i in (0, 1, 2):
        assert out[i]["cluster_size"] == 3
        assert out[i]["weight"] == round(1 / 3, 6)
    assert out[3]["cluster_size"] == 1 and out[3]["weight"] == 1.0
    for i in (4, 5):
        assert out[i]["cluster_size"] == 2 and out[i]["weight"] == 0.5


def test_contamination_audit_union_verdict(spark):
    """The union flag fires iff either leg fires; per-signal columns
    carry the reason."""
    from institutional_fx_etl_spark.plans.corpus import contamination_audit

    # eval ids: 0, 10, 20. Doc 10 lexically copies corpus doc 3;
    # embedding 20 semantically equals training embedding 7.
    docs = spark.createDataFrame(
        [
            (0, "zero unique text with many distinct tokens here ok"),
            (10, "alpha beta gamma delta epsilon zeta common run"),
            (20, "totally fresh words nothing shared at all here"),
            (3, "alpha beta gamma delta epsilon zeta common run"),
            (7, "irrelevant corpus text filling space for realism"),
        ],
        "doc_id long, text string",
    )
    import random

    rng = random.Random(3)
    base = {i: [rng.uniform(-1, 1) for _ in range(6)] for i in range(30)}
    base[20] = base[7]  # semantic twin
    emb = spark.createDataFrame(
        [(i, v) for i, v in base.items()],
        "vec_id long, embedding array<double>",
    )
    out = {r["eval_id"]: r for r in contamination_audit(
        docs, emb, min_cosine=0.99, num_centroids=2
    ).collect()}
    assert out[10]["ngram_hit"] == 1 and out[10]["contaminated"] == 1
    assert out[20]["ngram_hit"] == 0
    assert out[20]["emb_matches"] >= 1 and out[20]["contaminated"] == 1
    assert out[0]["contaminated"] == 0
    assert out[0]["emb_max_cosine"] is None


def test_ann_hot_cell_caps(spark):
    """max_cell drops oversized cells from both new ANN ops (the
    semdedup/knn_join hot-cell discipline): one giant cell -> empty
    output; generous cap -> normal output."""
    from institutional_fx_etl_spark.operators.similarity import (
        bitext_margin,
        hard_negatives,
    )

    emb = _toy_embeddings(spark, n=30, d=6)
    lab = emb.selectExpr(
        "vec_id", "embedding", "CAST(vec_id % 2 AS INT) AS label"
    )
    # num_centroids=1 -> every vector lands in ONE cell of 30
    assert hard_negatives(
        lab, k=2, num_centroids=1, max_cell=10
    ).count() == 0
    assert hard_negatives(lab, k=2, num_centroids=1, max_cell=64).count() > 0
    assert bitext_margin(
        emb, side_expr="vid % 2 = 0", k=2, num_centroids=1, max_cell=10
    ).count() == 0
    assert bitext_margin(
        emb, side_expr="vid % 2 = 0", k=2, num_centroids=1, max_cell=64
    ).count() > 0


def test_bitext_margin_kernel_equals_sql_twin(spark):
    """Regime equality gate: the all-in-one Arrow margin kernel must
    match the pure-JVM pair pipeline bit-for-bit across cells."""
    from institutional_fx_etl_spark.operators.similarity import (
        bitext_margin,
    )

    emb = _toy_embeddings(spark, n=60, d=8)
    kw = dict(side_expr="vid % 2 = 0", k=4, num_centroids=4)
    got = sorted(map(tuple, bitext_margin(
        emb, pair_strategy="numpy", **kw
    ).collect()))
    ref = sorted(map(tuple, bitext_margin(
        emb, pair_strategy="sql", **kw
    ).collect()))
    assert got == ref and got


def test_boilerplate_purge_rejects_degenerate_min_df(spark):
    import pytest

    from institutional_fx_etl_spark.operators.text import boilerplate_purge

    with pytest.raises(ValueError, match="min_df"):
        boilerplate_purge(_docs(spark, [(1, "a b", "en", "s")]), min_df=1)


def test_boilerplate_incremental_equals_full(spark):
    """Append-only incremental purge is row-identical to the full
    recompute over old ∪ new — including the case where the batch
    pushes an OLD segment over min_df (verdict flip on old docs)."""
    from institutional_fx_etl_spark.operators.text import (
        boilerplate_purge,
        boilerplate_purge_incremental,
    )

    nav = "home about contact us"
    old = [
        (1, f"{nav} alpha beta gamma delta", "en", "a"),  # nav df=1 (clean)
        (2, "unique one two three four five six seven", "en", "a"),
    ]
    new = [
        (3, f"{nav} epsilon zeta eta theta", "en", "b"),  # nav df -> 2: FLIP
        (4, "fresh words only nothing shared here at all", "en", "b"),
    ]
    inc = sorted(map(tuple, boilerplate_purge_incremental(
        _docs(spark, old), _docs(spark, new), segment_tokens=4, min_df=2
    ).collect()))
    full = sorted(map(tuple, boilerplate_purge(
        _docs(spark, old + new), segment_tokens=4, min_df=2
    ).collect()))
    assert inc == full and len(inc) == 4
    # doc 1's nav segment must have been purged by the flip
    doc1 = dict((r[0], r) for r in inc)[1]
    assert "home" not in doc1[1]


def test_tokenizer_fertility_ratios(spark):
    """Fertility counts BPE-grain pieces per whitespace word:
    punctuation-heavy text scores higher fertility than plain words,
    and the sums are exact."""
    from institutional_fx_etl_spark.operators.text import (
        tokenizer_fertility,
    )

    rows = [
        (1, "plain words only here", "en", "s"),        # 4 words, 4 pieces
        (2, "it's a test, really!", "fr", "s"),         # punctuation splits
    ]
    out = {r["lang"]: r for r in tokenizer_fertility(
        _docs(spark, rows)
    ).collect()}
    assert out["en"]["n_words"] == 4 and out["en"]["fertility"] == 1.0
    fr = out["fr"]
    assert fr["n_bpe_tokens"] > fr["n_words"]
    assert fr["fertility"] == round(
        fr["n_bpe_tokens"] / fr["n_words"], 6
    )


def test_streaming_lm_score_equals_batch_integer_twin(spark, tmp_path):
    """The streamed per-doc LM score equals a batch computation of the
    same integer-sum formula — ingestion-order-free by construction."""
    from institutional_fx_etl_spark.plans import driver_queries as dq

    import pyspark.sql.functions as F

    rows = [
        (i, " ".join(["tok%d" % ((i * 3 + j) % 6) for j in range(5)]),
         "en", "s")
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    sf_dir = str(tmp_path)
    # single FILE named documents.parquet (the driver-testdata layout
    # the pathGlobFilter stream reader expects), not a directory
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.Table.from_pandas(df.toPandas()),
        f"{sf_dir}/documents.parquet",
    )
    out = {r["doc_id"]: r for r in dq.REGISTRY["streaming_lm_score"][0](
        spark, sf_dir
    ).collect()}
    assert len(out) == 30
    # batch twin with the same micro-int arithmetic
    from institutional_fx_etl_spark.operators.text import shingles_expr

    bi = (
        df.withColumn("__toks", F.split(F.lower(F.col("text")), r"\s+"))
        .filter("size(__toks) >= 2")
        .selectExpr("doc_id", f"explode({shingles_expr('__toks', 2)}) AS bg")
        .selectExpr("doc_id", "bg", "substring_index(bg, ' ', 1) AS w1")
    )
    cb = bi.groupBy("bg").agg(F.count(F.lit(1)).alias("cb"),
                              F.expr("max(w1) AS w1"))
    cu = cb.groupBy("w1").agg(F.sum("cb").alias("cu"))
    batch = {
        r["doc_id"]: r
        for r in bi.join(cb.select("bg", "cb"), "bg")
        .join(cu.join(cb.select("bg", "w1"), "w1").select("bg", "cu")
              .distinct(), "bg")
        .selectExpr(
            "doc_id",
            "CAST(round(log2(CAST(cb AS DOUBLE) / CAST(cu AS DOUBLE))"
            " * 1e6, 0) AS BIGINT) AS lpm",
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("round(CAST(CAST(SUM(lpm) AS BIGINT) AS DOUBLE)"
                   " / count(1) / 1e6, 6) AS avg"),
        )
        .collect()
    }
    for i, r in out.items():
        assert r["n_bigrams"] == batch[i]["n"]
        assert r["avg_log2_prob"] == batch[i]["avg"]


def test_quantile_align_uniform_threshold(spark):
    """Percentile ranks are exact within each group: a global
    'top 50%' cut takes half of EVERY group regardless of raw score
    scale, and ranks are a permutation of 1..n per group."""
    from institutional_fx_etl_spark.operators.selection import (
        quantile_align,
    )

    rows = [(i, "t", "en", "small") for i in range(10)]
    rows += [(100 + i, "t", "en", "big") for i in range(20)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).selectExpr("doc_id", "text", "lang", "source",
                 "doc_id * 7 % 100 AS n_chars")
    out = quantile_align(df).collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r["grp"], []).append(r)
    for grp, rs in by_grp.items():
        n = len(rs)
        assert sorted(r["grp_rank"] for r in rs) == list(range(1, n + 1))
        kept = [r for r in rs if r["pct_rank"] <= 0.5]
        assert len(kept) == n // 2
        # rank order respects score order
        srt = sorted(rs, key=lambda r: (r["score"], r["doc_id"]))
        assert [r["grp_rank"] for r in srt] == list(range(1, n + 1))
