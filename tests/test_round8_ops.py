"""Round-8 regression tests — the ADVICE fixes and the width-mirror
discipline.

Covers: fuzzy_best_match exact re-scoring under a firing cap (scores
must come from the FULL trigram sets, not the capped posting list),
bloom_membership with a non-default probe column name, the
three-rename dataset swap's always-recoverable invariant, and the
DECIMAL(38,0) Mann-Whitney intermediates (value-unchanged on small
data; no silent int64 wrap on mega-tied data).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_fuzzy_cap_cannot_flip_argmax(spark):
    """A hot trigram shared by the whole catalog must not understate
    scores: the capped posting generates candidates, but the Jaccard
    must equal the full-set value (round-7 ADVICE — the pre-fix code
    counted `shared` from the capped list and could flip the winner).
    """
    from institutional_fx_etl_spark.operators.linkage import (
        fuzzy_best_match,
    )

    # 'zzz ' prefix trigrams are in all 3 entries → df=3 > max_df=2 →
    # capped away. The winner for "zzzz alpha" must still be
    # "zzzz alpha" with the FULL intersection score, not the capped one.
    catalog = spark.createDataFrame(
        [("zzzz alpha",), ("zzzz beta",), ("zzzz gamma",)], "name string"
    )
    queries = spark.createDataFrame(
        [(1, "zzzz alpha")], "qid long, qtext string"
    )
    rows = fuzzy_best_match(
        queries, catalog, "qid", "qtext", "name", max_df=2
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["match_text"] == "zzzz alpha"
    # full trigram set of "zzzz alpha" has 7 distinct trigrams ("zzz"
    # dedupes), all shared with itself → jaccard exactly 1.0; the capped
    # posting alone would have reported a smaller shared count
    assert r["shared"] == 7
    assert r["jaccard"] == 1.0


def test_bloom_membership_nondefault_probe_col(spark):
    """probe_col != 'probe' used to hit an unresolved-column error:
    the bit expressions referenced the sibling alias (round-7 ADVICE).
    """
    from institutional_fx_etl_spark.operators.sketches import (
        bloom_membership,
    )

    stream = spark.createDataFrame(
        [("a",), ("b",), ("c",)], "k string"
    )
    probes = spark.createDataFrame(
        [("a",), ("z",)], "lookup_key string"
    )
    got = {
        r["probe"]: r
        for r in bloom_membership(
            stream, "k", probes, probe_col="lookup_key"
        ).collect()
    }
    assert got["a"]["maybe_present"] and got["a"]["actually_present"]
    assert not got["z"]["actually_present"]
    # Bloom never false-negatives
    assert got["a"]["maybe_present"]


def test_swap_dataset_recoverable(tmp_path):
    """The three-rename swap keeps a live copy at every crash point:
    after a simulated crash between the two renames, the old data
    still exists at <path>__old (the pre-fix rmtree-then-move left
    nothing)."""
    from institutional_fx_etl_spark.sources.writers import _swap_dataset

    path = str(tmp_path / "tbl")
    tmp = str(tmp_path / "tbl__rewrite")
    os.makedirs(path)
    os.makedirs(tmp)
    with open(os.path.join(path, "old.parquet"), "w") as f:
        f.write("old")
    with open(os.path.join(tmp, "new.parquet"), "w") as f:
        f.write("new")

    # happy path: new data in place, no leftovers
    _swap_dataset(path, tmp)
    assert os.listdir(path) == ["new.parquet"]
    assert not os.path.exists(path + "__old")
    assert not os.path.exists(tmp)

    # crash simulation: first rename done, second never happened —
    # recovery is a single rename of the preserved __old copy
    os.rename(path, path + "__old")
    assert os.path.exists(path + "__old")
    os.rename(path + "__old", path)
    assert os.listdir(path) == ["new.parquet"]


def test_mannwhitney_decimal_matches_small(spark):
    """DECIMAL(38,0) intermediates change nothing at small scale —
    the z statistic equals the hand value for a known split."""
    from institutional_fx_etl_spark.operators.profiling import (
        mannwhitney_u,
    )

    rows = [("a", float(v)) for v in (1, 2, 3, 4, 5)] + [
        ("b", float(v)) for v in (6, 7, 8, 9, 10)
    ]
    df = spark.createDataFrame(rows, "grp string, v double")
    r = mannwhitney_u(df, "v", "grp", "a", "b").collect()[0]
    # complete separation: U_a = 0, U_b = 25
    assert r["u_a"] == 0.0
    assert r["u_b"] == 25.0
    assert r["n_a"] == 5 and r["n_b"] == 5


def test_mannwhitney_mega_ties_no_wrap(spark):
    """2.5M rows tied on one value: t³ ≈ 1.5e19 overflows int64
    (max 9.2e18) — the DECIMAL tie term must keep z finite and sane
    instead of silently wrapping negative under non-ANSI mode."""
    from institutional_fx_etl_spark.operators.profiling import (
        mannwhitney_u,
    )

    n = 2_500_000
    half = spark.range(n).selectExpr(
        "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS grp",
        "CAST(1.0 AS DOUBLE) AS v",  # every row tied on v=1.0
    )
    r = mannwhitney_u(half, "v", "grp", "a", "b").collect()[0]
    # all tied → U_a = U_b = n_a*n_b/2 and the tie correction removes
    # ~all variance; z must be NaN/0-ish, never a wrapped huge value
    assert r["n_a"] == n // 2 and r["n_b"] == n // 2
    assert r["u_a"] == r["u_b"]
    import math

    assert r["z"] is None or math.isnan(r["z"]) or abs(r["z"]) < 1e-6


def test_mixture_sampling_rates_hand(spark):
    """4-vs-16 docs at alpha=0.5, budget 50%: B=10, micro-weights
    2e6/4e6, denom 6e6 → rate_a = 10·(2/6)/4 = 0.833333,
    rate_b = 10·(4/6)/16 = 0.416667 — exact ppm values."""
    from institutional_fx_etl_spark.operators.selection import (
        mixture_sampling,
    )

    rows = [(i, "a") for i in range(4)] + [(100 + i, "b") for i in range(16)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = {
        r["grp_name"]: r
        for r in mixture_sampling(df, "source", "doc_id").collect()
    }
    assert got["a"]["n_docs"] == 4 and got["b"]["n_docs"] == 16
    assert got["a"]["rate_ppm"] == 833333
    assert got["b"]["rate_ppm"] == 416667
    for g in ("a", "b"):
        assert 0 <= got[g]["n_sampled"] <= got[g]["n_docs"]
    # determinism: identical second run
    again = {
        r["grp_name"]: r["n_sampled"]
        for r in mixture_sampling(df, "source", "doc_id").collect()
    }
    assert again == {g: got[g]["n_sampled"] for g in got}


def test_mixture_sampling_rejects_nonsqrt_alpha(spark):
    import pytest

    from institutional_fx_etl_spark.operators.selection import (
        mixture_sampling,
    )

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError):
        mixture_sampling(df, "source", "doc_id", alpha=0.3)


def test_dsir_weights_sign_and_counts(spark):
    """Docs made of the target token score positive, docs made of the
    source token negative; token counts are exact; an empty doc is
    absent from the output."""
    from institutional_fx_etl_spark.operators.selection import (
        dsir_weights,
    )

    rows = [
        (1, "aaa aaa aaa", "en"),
        (2, "aaa aaa", "en"),
        (3, "bbb bbb bbb", "de"),
        (4, "bbb bbb", "de"),
        (5, "aaa aaa aaa aaa", None),  # probe: target-looking, no lang
        (6, "", "en"),  # empty → absent
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        r["doc_id"]: r
        for r in dsir_weights(
            df, target_expr="COALESCE(lang = 'en', false)"
        ).collect()
    }
    assert 6 not in got
    assert got[1]["n_toks"] == 3 and got[5]["n_toks"] == 4
    assert got[1]["log_weight"] > 0 and got[5]["log_weight"] > 0
    assert got[3]["log_weight"] < 0 and got[4]["log_weight"] < 0
    # micro column is the exact integer the double derives from
    for r in got.values():
        assert r["log_weight"] == r["log_weight_micro"] / 1e6


def test_random_projection_hand(spark):
    """±1 projection of a basis vector returns exactly the plane's
    sign in every coordinate; long form has out_dim rows per vector."""
    import hashlib

    from institutional_fx_etl_spark.operators.similarity import (
        random_projection,
    )

    # e_0: picks out component 0 of every plane
    vec = [1.0] + [0.0] * 63
    df = spark.createDataFrame(
        [(7, vec)], "vec_id long, embedding array<double>"
    )
    rows = random_projection(df, out_dim=16).collect()
    assert len(rows) == 16
    got = {r["p"]: r["proj"] for r in rows}
    for j in range(16):
        h = int(hashlib.md5(f"plane{j}_0".encode()).hexdigest()[:8], 16)
        expect = 1.0 if h % 2 == 0 else -1.0
        assert got[j + 1] == expect


def test_knn_incremental_equals_rebuild(spark):
    """Incremental maintenance == from-scratch rebuild under frozen
    centroids, on a fixture where the batch touches a strict subset
    of cells (so the keep-path actually carries rows)."""
    import hashlib

    from institutional_fx_etl_spark.operators.similarity import (
        knn_join,
        knn_join_incremental,
    )

    def vec(seed, dim=8):
        out = []
        for j in range(dim):
            h = int(
                hashlib.md5(f"v{seed}_{j}".encode()).hexdigest()[:8], 16
            )
            out.append((h % 2001 - 1000) / 1000.0)
        return out

    # two well-separated centroid anchors
    c0 = [10.0] + [0.0] * 7
    c1 = [0.0] * 7 + [10.0]
    old_rows = [(0, c0), (1, c1)] + [
        (i, [a + b for a, b in zip((c0 if i % 2 == 0 else c1), vec(i))])
        for i in range(2, 30)
    ]
    # batch lands ONLY near c1 → cell 0 must keep its old rows verbatim
    new_rows = [
        (100 + i, [a + b for a, b in zip(c1, vec(100 + i))])
        for i in range(5)
    ]
    old = spark.createDataFrame(
        old_rows, "vec_id long, embedding array<double>"
    )
    new = spark.createDataFrame(
        new_rows, "vec_id long, embedding array<double>"
    )
    centroids = spark.createDataFrame(
        [(0, c0), (1, c1)], "cid long, cv array<double>"
    )
    old_topk = knn_join(old, k=3, centroids=centroids)
    inc = knn_join_incremental(old, new, old_topk, centroids, k=3)
    full = knn_join(old.unionByName(new), k=3, centroids=centroids)
    a = sorted(map(tuple, inc.collect()))
    b = sorted(map(tuple, full.collect()))
    assert a == b
    # the untouched cell really was carried, not recomputed trivially:
    # batch ids all assigned to cell 1
    from institutional_fx_etl_spark.operators.similarity import _assign_to

    cells = {r["vid"]: r["cid"] for r in _assign_to(new, centroids).collect()}
    assert set(cells.values()) == {1}


def test_shuffle_shards_invariants(spark):
    """Every doc appears exactly once; positions are a gapless 0..m-1
    sequence per shard; the assignment is identical across runs and
    partitionings."""
    from institutional_fx_etl_spark.operators.selection import (
        shuffle_shards,
    )

    df = spark.range(200).selectExpr("id AS doc_id")
    out = shuffle_shards(df, id_col="doc_id", n_shards=8).collect()
    assert len(out) == 200
    assert len({r["doc_id"] for r in out}) == 200
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss))), shard
    again = {
        (r["doc_id"], r["shard"], r["pos"])
        for r in shuffle_shards(
            df.repartition(13), id_col="doc_id", n_shards=8
        ).collect()
    }
    assert again == {(r["doc_id"], r["shard"], r["pos"]) for r in out}


def _dsir_reference(rows, buckets=64, salt="dsir"):
    """Pure-Python mirror of dsir_weights' md5-bucket math — the
    hypothesis property's independent oracle."""
    import hashlib
    import math

    def bucket(w):
        return (
            int(hashlib.md5(f"{salt}{w}".encode()).hexdigest()[:8], 16)
            % buckets
        )

    ct = [0] * buckets
    cs = [0] * buckets
    toks = {}
    for doc_id, text, is_target in rows:
        ws = [w for w in text.lower().split() if w]
        toks[doc_id] = ws
        for w in ws:
            if is_target:
                ct[bucket(w)] += 1
            else:
                cs[bucket(w)] += 1
    tt, ts = sum(ct), sum(cs)
    lr = [
        math.floor(
            (
                math.log((ct[b] + 1.0) / (tt + float(buckets)))
                - math.log((cs[b] + 1.0) / (ts + float(buckets)))
            )
            * 1e6
            + 0.5
        )
        for b in range(buckets)
    ]
    out = {}
    for doc_id, ws in toks.items():
        if not ws:
            continue
        micro = sum(lr[bucket(w)] for w in ws)
        out[doc_id] = (len(ws), micro)
    return out


def test_dsir_weights_matches_python_reference(spark):
    """dsir_weights == the independent pure-Python implementation on
    a mixed fixture (multi-token docs, shared vocab, whitespace runs,
    empty doc)."""
    from institutional_fx_etl_spark.operators.selection import (
        dsir_weights,
    )

    rows = [
        (1, "alpha beta gamma alpha", True),
        (2, "beta beta  delta", True),
        (3, "gamma delta epsilon", False),
        (4, "alpha epsilon epsilon zeta", False),
        (5, "zeta", False),
        (6, "", True),
        (7, "alpha ALPHA Alpha", True),  # case folding
    ]
    df = spark.createDataFrame(
        [(i, t, tgt) for i, t, tgt in rows],
        "doc_id long, text string, is_target boolean",
    )
    got = {
        r["doc_id"]: (r["n_toks"], r["log_weight_micro"])
        for r in dsir_weights(df, target_expr="is_target").collect()
    }
    assert got == _dsir_reference(rows)
