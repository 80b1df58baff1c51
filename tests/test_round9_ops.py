"""Round-9 regression tests — the round-8 ADVICE fixes plus the new
round-9 machinery (semdedup Arrow kernel equality, auto-planes ANN
contract, chaos coverage for the three-rename swap lives in
test_io_and_skew.py).

ADVICE coverage: random_projection width assertion + num_dims
parameter (silent NULL-pad → loud failure), knn_join pair_strategy
validation, _shuffle_partitions non-numeric conf fallback.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_random_projection_width_mismatch_raises(spark):
    """A vector narrower than num_dims must FAIL the job, not emit
    all-NULL projections (round-8 ADVICE: zip_with NULL-pads the
    shorter side silently)."""
    from institutional_fx_etl_spark.operators.similarity import (
        random_projection,
    )

    ok = spark.createDataFrame(
        [(1, [float(i) for i in range(64)])],
        "vec_id long, embedding array<double>",
    )
    rows = random_projection(ok, out_dim=4).collect()
    assert len(rows) == 4
    assert all(r["proj"] is not None for r in rows)

    bad = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="random_projection"):
        random_projection(bad, out_dim=4).collect()


def test_random_projection_num_dims_param(spark):
    """num_dims sizes the plane matrix — a 10-dim corpus projects
    cleanly when declared, instead of being silently NULL-padded."""
    from institutional_fx_etl_spark.operators.similarity import (
        random_projection,
    )

    df = spark.createDataFrame(
        [(1, [float(i + 1) for i in range(10)])],
        "vec_id long, embedding array<double>",
    )
    rows = random_projection(df, out_dim=3, num_dims=10).collect()
    assert len(rows) == 3
    assert all(r["proj"] is not None for r in rows)


def test_knn_join_rejects_unknown_pair_strategy(spark):
    from institutional_fx_etl_spark.operators.similarity import knn_join

    df = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="pair_strategy"):
        knn_join(df, pair_strategy="bogus")


def test_semdedup_numpy_kernel_equals_sql(spark):
    """The Arrow drop-set kernel must reproduce the SQL cell self-join
    bit-for-bit — same fold-order doubles, same 6-dp half-up rounding,
    same smaller-id-wins drop rule (round-9: semdedup joins knn_join
    on the Arrow pair path; the SQL twin stays as the reference)."""
    import random

    from institutional_fx_etl_spark.operators.similarity import semdedup

    rng = random.Random(9)
    rows = []
    for i in range(120):
        base = [rng.uniform(-1, 1) for _ in range(16)]
        rows.append((i, base))
        # plant exact + near duplicates so drops actually fire
        if i % 7 == 0:
            rows.append((1000 + i, list(base)))
        if i % 11 == 0:
            rows.append(
                (2000 + i, [x + rng.uniform(-1e-4, 1e-4) for x in base])
            )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kw = dict(min_cosine=0.95, num_centroids=4)
    got_sql = sorted(
        tuple(r) for r in semdedup(df, pair_strategy="sql", **kw).collect()
    )
    got_np = sorted(
        tuple(r) for r in semdedup(df, pair_strategy="numpy", **kw).collect()
    )
    assert got_np == got_sql
    assert any(not keep for (_, _, keep) in got_sql)  # drops fired


def test_semdedup_rejects_unknown_pair_strategy(spark):
    from institutional_fx_etl_spark.operators.similarity import semdedup

    df = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="pair_strategy"):
        semdedup(df, pair_strategy="bogus")


def test_token_budget_fit_invariants(spark):
    """Σ alloc must equal the integer budget EXACTLY, no source may
    exceed its own total, and small sources are taken whole."""
    from institutional_fx_etl_spark.operators.selection import (
        token_budget_fit,
    )

    rows = []
    sizes = {"tiny": 3, "small": 10, "mid": 40, "big": 100, "huge": 400}
    i = 0
    for src, per_doc in sizes.items():
        for _ in range(5):
            rows.append((i, src, per_doc))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = {r["source"]: r for r in token_budget_fit(df).collect()}
    total = sum(5 * v for v in sizes.values())
    budget = total // 2
    assert sum(r["alloc"] for r in out.values()) == budget
    for src, r in out.items():
        assert r["alloc"] <= r["toks"]
    # tiny + small fit whole under the cap
    assert out["tiny"]["alloc"] == out["tiny"]["toks"]
    assert out["small"]["alloc"] == out["small"]["toks"]
    # the largest source is capped
    assert out["huge"]["alloc"] < out["huge"]["toks"]


def test_curriculum_order_tie_stable_and_partition_independent(spark):
    """Equal scores never split across stages; stages are monotone in
    score; the full output is identical under a different input
    partitioning (the md5-draw determinism contract)."""
    from institutional_fx_etl_spark.operators.selection import (
        curriculum_order,
    )

    rows = [(i, (i * 7) % 13 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    out = curriculum_order(df, stages=4, n_shards=4).collect()
    by_score = {}
    for r in out:
        by_score.setdefault(r["score"], set()).add(r["stage"])
    for score, stages in by_score.items():
        assert len(stages) == 1, f"score {score} split across {stages}"
    ordered = sorted(by_score.items())
    st = [next(iter(s)) for _, s in ordered]
    assert st == sorted(st)
    assert set(st) == {1, 2, 3, 4}
    out2 = curriculum_order(
        df.repartition(13), stages=4, n_shards=4
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
    # positions are gapless 0..k-1 within each (stage, shard)
    by_bucket = {}
    for r in out:
        by_bucket.setdefault((r["stage"], r["shard"]), []).append(r["pos"])
    for bucket, poss in by_bucket.items():
        assert sorted(poss) == list(range(len(poss)))


def test_ngram_novelty_semantics(spark):
    """First occurrence scores 1.0; an exact duplicate scores 0.0; a
    half-overlapping doc scores the fraction of its new shingles."""
    from institutional_fx_etl_spark.operators.text import ngram_novelty

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),      # exact dup of 1
            (3, "alpha beta gamma epsilon"),    # shares 2 of 2... partial
            (4, "zz yy xx ww vv"),              # all new
            (5, "a b"),                         # too short: excluded
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_novelty(df).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["novelty"] == 1.0
    assert out[2]["novelty"] == 0.0
    assert out[4]["novelty"] == 1.0
    # doc 3: shingles {alpha beta gamma, beta gamma epsilon} — first is
    # doc 1's, second is new
    assert out[3]["n_ngrams"] == 2 and out[3]["n_novel"] == 1
    assert out[3]["novelty"] == 0.5


def test_emb_pca_power_matches_numpy_direction(spark):
    """The micro-quantized power iterate must align with numpy's true
    dominant eigenvector of the sample covariance (|cos| > 0.99 on a
    well-separated spectrum)."""
    import numpy as np

    from institutional_fx_etl_spark.operators.embstats import (
        embedding_pca_power,
    )

    rng = np.random.default_rng(7)
    d, n = 16, 400
    direction = rng.normal(size=d)
    direction /= np.linalg.norm(direction)
    X = rng.normal(scale=0.05, size=(n, d)) + np.outer(
        rng.normal(scale=1.0, size=n), direction
    )
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    rows = embedding_pca_power(df, dim=d, scale=1000, iters=5).collect()
    v = np.zeros(d)
    for r in rows:
        v[int(r["i"])] = float(r["v"])
    v /= np.linalg.norm(v)
    C = np.cov(X.T, bias=True)
    evals, evecs = np.linalg.eigh(C)
    top = evecs[:, -1]
    assert abs(float(v @ top)) > 0.99


def test_ngram_novelty_incremental_equals_full(spark):
    """The incremental path scored against (old state + new batch)
    must equal the FULL run restricted to new ids — under an id split
    where old and new ids interleave (the larger-old-owner edge the
    min-across-both rule must handle)."""
    from institutional_fx_etl_spark.operators.text import (
        ngram_novelty,
        ngram_novelty_incremental,
    )

    words = ["w%d" % i for i in range(30)]
    rows = []
    for i in range(80):
        txt = " ".join(words[(i * 3 + j) % 30] for j in range(8))
        rows.append((i, txt))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # new = every 4th id → old ids both above and below new ids
    tagged = df.withColumn("is_new", F.expr("doc_id % 4 = 1"))
    inc = sorted(
        tuple(r)
        for r in ngram_novelty_incremental(tagged, "is_new").collect()
    )
    full = sorted(
        tuple(r)
        for r in ngram_novelty(df).filter("doc_id % 4 = 1").collect()
    )
    assert inc == full and len(inc) > 0


def test_nearest_text_dupes_matches_bruteforce_rank(spark):
    """On a corpus small enough that LSH candidates = all true pairs,
    the per-doc ranking must equal the brute-force Jaccard ranking."""
    from institutional_fx_etl_spark.operators.dedup import (
        nearest_text_dupes,
    )

    from institutional_fx_etl_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    base = " ".join("tok%d" % i for i in range(30))
    docs = [
        (1, base),
        (2, base.replace("tok29", "changed")),
        (3, base.replace("tok0", "altered")),
        (5, base.replace("tok29", "changed other")),
        (4, "completely different words entirely here now"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    k = 2
    out = nearest_text_dupes(df, k=k, jaccard_threshold=0.01).collect()
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append(
            (r["rank"], r["nn_id"], r["jaccard"])
        )
    # expectation: rank the operator's own pair relation per doc —
    # the test pins the SYMMETRIZE+RANK logic, not LSH recall
    pairs = minhash_lsh_pairs(df, jaccard_threshold=0.01).collect()
    assert len(pairs) >= 3  # the near-identical family did pair up
    sym = {}
    for p in pairs:
        sym.setdefault(p["id_a"], []).append((p["id_b"], p["jaccard"]))
        sym.setdefault(p["id_b"], []).append((p["id_a"], p["jaccard"]))
    want = {}
    for doc, lst in sym.items():
        lst = sorted(lst, key=lambda t: (-t[1], t[0]))[:k]
        want[doc] = [(i + 1, nn, j) for i, (nn, j) in enumerate(lst)]
    assert {d: sorted(v) for d, v in got.items()} == {
        d: sorted(v) for d, v in want.items()
    }
    assert 4 not in got  # the unrelated doc has no neighbors


def test_minhash_estimate_error_bounds(spark):
    """est_jaccard must be k/16 grid values in [0,1]; abs_err
    consistent with |est − exact|; and for an exact duplicate the
    estimate is exactly 1.0 (all minhashes agree)."""
    from institutional_fx_etl_spark.operators.dedup import (
        minhash_estimate_error,
    )

    docs = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),
        (3, "alpha beta gamma delta epsilon zeta eta iota"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = minhash_estimate_error(df, jaccard_threshold=0.01).collect()
    assert rows
    by_pair = {(r["id_a"], r["id_b"]): r for r in rows}
    dup = by_pair[(1, 2)]
    assert dup["jaccard"] == 1.0 and dup["est_jaccard"] == 1.0
    assert dup["abs_err"] == 0.0
    for r in rows:
        assert 0.0 <= r["est_jaccard"] <= 1.0
        k16 = r["est_jaccard"] * 16
        assert abs(k16 - round(k16)) < 1e-6
        assert abs(r["abs_err"] - round(abs(r["est_jaccard"] - r["jaccard"]), 6)) < 1e-9


def test_multiprobe_recall_dominates_single_bucket(spark):
    """Multi-probe candidates are a SUPERSET of single-bucket pairs
    (the main bucket is always probed), and recall vs brute-force
    truth is strictly better or equal — on the real sf0.001 corpus."""
    from institutional_fx_etl_spark.operators.similarity import (
        lsh_ann_pairs,
        lsh_multiprobe_pairs,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    single = {
        (r["id_a"], r["id_b"])
        for r in lsh_ann_pairs(emb, min_cosine=0.3).collect()
    }
    multi = {
        (r["id_a"], r["id_b"])
        for r in lsh_multiprobe_pairs(emb, min_cosine=0.3).collect()
    }
    assert single <= multi
    # the 2 extra probes must actually buy pairs on this corpus
    assert len(multi) > len(single)


def test_pca_project_consistent_with_power_vector(spark):
    """proj_q must equal the integer dot of the quantized vector with
    the collected eigenvector — recomputed independently in Python."""
    import numpy as np

    from institutional_fx_etl_spark.operators.embstats import (
        embedding_pca_power,
        embedding_pca_project,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).limit(50)
    v = {int(r["i"]): int(r["v"]) for r in
         embedding_pca_power(emb, dim=64, iters=3).collect()}
    got = {
        int(r["vec_id"]): int(r["proj_q"])
        for r in embedding_pca_project(emb, dim=64, iters=3).collect()
    }
    rows = emb.collect()
    for r in rows:
        q = [int(np.floor(float(x) * 1000.0 + 0.5)) for x in r["embedding"]]
        want = sum(q[i] * v[i] for i in range(64))
        assert got[int(r["vec_id"])] == want


def test_ivfpq_is_adc_scan_restricted_to_probe_cells(spark):
    """IVF-PQ's hits must (a) come only from the query's nprobe
    nearest cells and (b) agree with the full pq_adc_topk ranking
    restricted to those cells — the composition contract."""
    from institutional_fx_etl_spark.operators.similarity import (
        _assign_to,
        ivfpq_topk,
        pq_adc_topk,
    )
    from pyspark.sql import functions as SF

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = ivfpq_topk(emb, k=10, num_centroids=8, nprobe=2).collect()
    assert len(out) == 10
    cells = {r["cid"] for r in out}
    assert len(cells) <= 2
    # full ADC scan restricted to the same cells gives the same ids
    v = emb.selectExpr("vec_id AS vid",
                       "transform(embedding, x -> CAST(x AS DOUBLE)) AS vv")
    cents = v.filter("vid < 8").selectExpr("vid AS cid", "vv AS cv")
    assigned = _assign_to(emb, cents)
    keep = {r["vid"] for r in assigned.collect() if r["cid"] in cells}
    full = pq_adc_topk(
        emb.filter(SF.col("vec_id").isin([int(x) for x in keep])), k=10
    ).collect()
    assert [r["id"] for r in out] == [r["id"] for r in full]
    got_adc = {r["id"]: r["adc_dist"] for r in out}
    for r in full:
        assert abs(got_adc[r["id"]] - r["adc_dist"]) < 1e-9


def test_pca_incremental_equals_full(spark):
    """Gram-partial state merge must reproduce the full eigenvector
    EXACTLY under an arbitrary old/new split."""
    from institutional_fx_etl_spark.operators.embstats import (
        embedding_pca_power,
        embedding_pca_power_incremental,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    tagged = emb.withColumn("is_new", F.expr("vec_id % 5 < 2"))
    full = sorted(
        tuple(r) for r in embedding_pca_power(emb, iters=4).collect()
    )
    inc = sorted(
        tuple(r)
        for r in embedding_pca_power_incremental(
            tagged, "is_new", iters=4
        ).collect()
    )
    assert inc == full


def test_cross_source_overlap_containment_semantics(spark):
    """A source whose vocabulary is a subset of another's must show
    containment 1.0 on its side; shared never exceeds min(n_a, n_b)."""
    from institutional_fx_etl_spark.operators.text import (
        cross_source_overlap,
    )

    rows = [
        (1, "alpha beta gamma delta epsilon", "small"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota", "big"),
        (3, "totally unrelated words over here instead", "other"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {(r["src_a"], r["src_b"]): r for r in cross_source_overlap(df).collect()}
    r = out[("big", "small")]
    # 'small' has 3 shingles, all inside 'big' (prefix): containment_b = 1
    assert r["n_b"] == 3 and r["shared"] == 3
    assert r["containment_b"] == 1.0
    assert r["containment_a"] < 1.0
    for r in out.values():
        assert r["shared"] <= min(r["n_a"], r["n_b"])
    assert ("big", "other") not in out  # zero overlap emits no row


def test_lsh_tuning_report_thresholds_and_monotonicity(spark):
    """S-thresholds equal (1/b)^(1/r) (nested-sqrt exact), and more
    rows per band is strictly more selective: candidate volume is
    non-increasing from (16,1) to (2,8) on a real corpus."""
    from institutional_fx_etl_spark.operators.dedup import (
        lsh_tuning_report,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = {r["bands"]: r for r in lsh_tuning_report(docs).collect()}
    assert set(rows) == {16, 8, 4, 2}
    import math

    for b, r in ((16, 1), (8, 2), (4, 4), (2, 8)):
        x = 1.0 / b
        k = r
        while k > 1:
            x = math.sqrt(x)
            k //= 2
        assert abs(rows[b]["s_threshold"] - round(x, 6)) < 1e-9
        assert rows[b]["rows_per_band"] == r
    cands = [rows[b]["n_candidates"] for b in (16, 8, 4, 2)]
    assert cands == sorted(cands, reverse=True)
    assert cands[0] > cands[-1]  # the knob actually moves on this corpus


def test_survivorship_majority_and_tiebreak(spark):
    """Majority value wins per field; exact ties break value-asc;
    keep_id is the min member id; singletons pass through."""
    from institutional_fx_etl_spark.operators.dedup import (
        survivorship_merge,
    )

    docs = spark.createDataFrame(
        [
            (1, "en", "web"),
            (2, "en", "wiki"),
            (3, "fr", "wiki"),
            (9, "de", "books"),
        ],
        "doc_id long, lang string, source string",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (9, 9)], "doc_id long, comp long"
    )
    out = {r["comp"]: r for r in
           survivorship_merge(docs, clusters, ["lang", "source"]).collect()}
    big = out[1]
    assert big["n_members"] == 3 and big["keep_id"] == 1
    assert big["lang"] == "en"          # 2-vs-1 majority
    assert big["source"] == "wiki"      # 2-vs-1 majority
    single = out[9]
    assert single["n_members"] == 1 and single["lang"] == "de"
    # tie case: two values with equal counts -> lexicographically first
    docs2 = spark.createDataFrame(
        [(1, "b"), (2, "a")], "doc_id long, lang string"
    )
    cl2 = spark.createDataFrame([(1, 1), (2, 1)], "doc_id long, comp long")
    out2 = survivorship_merge(docs2, cl2, ["lang"]).collect()
    assert out2[0]["lang"] == "a"
    # tied-NULL case (r9 ADVICE): a majority-count tie between NULL
    # and a real value must elect the REAL value on every engine —
    # Spark's plain ASC is NULLS FIRST, ANSI/DuckDB's is NULLS LAST,
    # so the operator pins NULLS LAST explicitly.
    docs3 = spark.createDataFrame(
        [(1, None), (2, "zz")], "doc_id long, lang string"
    )
    cl3 = spark.createDataFrame([(1, 1), (2, 1)], "doc_id long, comp long")
    out3 = survivorship_merge(docs3, cl3, ["lang"]).collect()
    assert out3[0]["lang"] == "zz"


def test_shuffle_partitions_nonnumeric_fallback():
    """Databricks sets spark.sql.shuffle.partitions='auto'; the pair
    generators must degrade to the default, not ValueError."""
    from types import SimpleNamespace

    from institutional_fx_etl_spark.operators.dedup import (
        _shuffle_partitions,
    )

    def fake(value):
        return SimpleNamespace(
            sparkSession=SimpleNamespace(
                conf=SimpleNamespace(get=lambda k, d=None: value)
            )
        )

    assert _shuffle_partitions(fake("auto")) == 200
    assert _shuffle_partitions(fake(None)) == 200
    assert _shuffle_partitions(fake("64")) == 64


def _probe_reference(rows, buckets=8, steps=3, lr_shift=4, salt="probe"):
    """Pure-Python twin of linear_probe_gd's integer recurrence —
    hashlib md5 == both engines' md5, float(int64) is IEEE
    round-to-nearest everywhere, so the walk is bit-identical."""
    import hashlib
    import math

    feats, ys = {}, {}
    for doc_id, text, label in rows:
        toks = [t for t in (text or "").lower().split() if t]
        if not toks:
            continue
        bs = {
            int(hashlib.md5((salt + t).encode()).hexdigest()[:8], 16)
            % buckets
            for t in toks
        }
        bs.add(buckets)  # bias
        feats[doc_id] = bs
        ys[doc_id] = int(bool(label)) * 1_000_000
    n = len(feats)
    present = sorted({b for bs in feats.values() for b in bs})
    w = {b: 0 for b in present}
    for _ in range(steps):
        g = {b: 0 for b in present}
        for doc_id, bs in feats.items():
            resid = ys[doc_id] - sum(w[b] for b in bs)
            for b in bs:
                g[b] += resid
        for b in present:
            w[b] += math.floor(
                float(g[b]) / (float(n) * float(1 << lr_shift)) + 0.5
            )
    return w


def test_linear_probe_gd_matches_reference_and_partitioning(spark):
    """The distributed 3-step GD walk lands on EXACTLY the reference
    weights, independent of input partitioning, and the learned
    weights separate the classes (docs whose tokens mark label=1 get
    positive bucket weight)."""
    from institutional_fx_etl_spark.operators.selection import (
        linear_probe_gd,
    )

    rows = []
    for i in range(120):
        good = i % 3 == 0
        text = (
            "alpha beta gamma quality signal" if good
            else "zz%d junk filler noise spam" % (i % 7)
        )
        rows.append((i, text + " common", good))
    df = spark.createDataFrame(rows, "doc_id long, text string, lab boolean")
    ref = _probe_reference(rows)
    out = {
        r["b"]: r["w_micro"]
        for r in linear_probe_gd(df, "lab", lr_shift=4).collect()
    }
    assert out == ref
    out2 = {
        r["b"]: r["w_micro"]
        for r in linear_probe_gd(df.repartition(7), "lab", lr_shift=4)
        .collect()
    }
    assert out2 == ref
    # the probe learned something: scoring a good doc beats a junk doc
    import hashlib

    def score(text):
        bs = {
            int(hashlib.md5(("probe" + t).encode()).hexdigest()[:8], 16) % 8
            for t in text.lower().split()
        }
        return sum(out.get(b, 0) for b in bs) + out.get(8, 0)

    assert score("alpha beta gamma quality signal common") > score(
        "zz1 junk filler noise spam common"
    )


def test_linear_probe_gd_lr_guard():
    """2^lr_shift must exceed (buckets+1)/2 or the descent is not
    contractive — the operator refuses the divergent configuration."""
    from institutional_fx_etl_spark.operators.selection import (
        linear_probe_gd,
    )

    with pytest.raises(ValueError, match="lr_shift"):
        linear_probe_gd(None, "true", buckets=64, lr_shift=2)


def test_linear_probe_score_exact_rank_and_ties(spark):
    """kept must equal the brute-force rank rule
    (score DESC, id ASC) <= n*top_ppm//1e6 — including the boundary
    score group where ties are broken by id — and Σ kept == k."""
    from institutional_fx_etl_spark.operators.selection import (
        linear_probe_score,
    )

    rows = []
    for i in range(90):
        good = i % 3 == 0
        # three identical texts per class → heavy score ties, so the
        # boundary group is exercised
        text = "alpha beta quality" if good else "junk filler spam"
        rows.append((i, text, good))
    df = spark.createDataFrame(rows, "doc_id long, text string, lab boolean")
    out = linear_probe_score(df, "lab", top_ppm=400_000).collect()
    n = len(out)
    k = n * 400_000 // 1_000_000
    ranked = sorted(out, key=lambda r: (-r["score_micro"], r["doc_id"]))
    expect = {r["doc_id"]: (1 if i < k else 0) for i, r in enumerate(ranked)}
    got = {r["doc_id"]: r["kept"] for r in out}
    assert got == expect
    assert sum(got.values()) == k
    # the boundary really did split a tie group (test is vacuous
    # otherwise): the last kept doc's score equals the first dropped's
    assert k < n and ranked[k - 1]["score_micro"] == ranked[k]["score_micro"]


def test_dup_span_coverage_semantics(spark):
    """Overlapping duplicated shingles merge to exact position
    coverage; intra-doc repetition counts as duplication; a fully
    unique doc scores 0; a doc that IS a repeated sentence scores
    ~full coverage."""
    from institutional_fx_etl_spark.operators.text import (
        dup_span_coverage,
    )

    rows = [
        # docs 1 and 2 share the 5-token prefix "a b c d e":
        # dup 3-gram starts 0,1,2 cover positions 0..4 (merged), doc1
        # has 8 tokens -> coverage 5/8
        (1, "a b c d e x1 y1 z1"),
        (2, "a b c d e x2 y2 z2"),
        # all-unique doc -> 0
        (3, "u1 u2 u3 u4 u5"),
        # one sentence repeated twice INSIDE the doc: every 3-gram of
        # "r s t r s t" window... starts: (r s t),(s t r),(t r s),
        # (r s t) -> "r s t" dupes itself, covering 0..2 and 3..5;
        # the middle shingles are unique -> but their positions are
        # already covered; coverage = 6/6
        (4, "r s t r s t"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dup_span_coverage(df).collect()}
    assert out[1]["n_dup_pos"] == 5 and out[1]["n_tokens"] == 8
    assert out[1]["dup_coverage"] == 0.625
    assert out[2]["n_dup_pos"] == 5
    assert out[3]["n_dup_pos"] == 0 and out[3]["dup_coverage"] == 0.0
    assert out[4]["n_dup_pos"] == 6 and out[4]["dup_coverage"] == 1.0


def test_kmeans_inertia_matches_numpy_and_improves_with_training(spark):
    """Total inertia equals the brute-force numpy assignment (to
    micro precision), centroid members score d²=0, and kmeans-trained
    centroids never do worse than the stride seeding."""
    import numpy as np

    from institutional_fx_etl_spark.operators.similarity import (
        kmeans_centroids,
        kmeans_inertia,
    )

    rng = np.random.RandomState(3)
    vecs = rng.randn(200, 8).round(3)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = kmeans_inertia(df, num_centroids=4).collect()
    got_total = sum(r["inertia_micro"] for r in out)
    cents = vecs[:4]
    d2 = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    ref_total = int(
        sum(np.floor(d2.min(axis=1) * 1e6 + 0.5).astype(np.int64))
    )
    # folds differ between numpy and the SQL identity in last ulps —
    # allow 1 micro per vector
    assert abs(got_total - ref_total) <= 200
    assert sum(r["n_vectors"] for r in out) == 200
    trained = kmeans_centroids(df, num_centroids=4, seed=7)
    out_t = kmeans_inertia(df, num_centroids=4, centroids=trained).collect()
    assert sum(r["inertia_micro"] for r in out_t) <= got_total


def test_quota_sample_exact_invariants(spark):
    """Σ kept == K exactly; per-group takes differ from exact
    proportionality by < 1 (largest-remainder property); output is
    identical under a different input partitioning."""
    from institutional_fx_etl_spark.operators.selection import (
        quota_sample_exact,
    )

    rows = []
    i = 0
    for src, n in [("a", 7), ("b", 13), ("c", 29), ("d", 51)]:
        for _ in range(n):
            rows.append((i, src))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = quota_sample_exact(df, budget_ppm=300_000).collect()
    n_total = 100
    k = n_total * 300_000 // 1_000_000
    assert len(out) == k
    by_grp = {}
    for r in out:
        by_grp.setdefault(r["grp"], []).append(r)
    for src, n in [("a", 7), ("b", 13), ("c", 29), ("d", 51)]:
        take = len(by_grp.get(src, []))
        ideal = k * n / n_total
        assert ideal - 1 < take < ideal + 1
        # ranks are 1..take with no gaps
        assert sorted(r["rk"] for r in by_grp.get(src, [])) == list(
            range(1, take + 1)
        )
    out2 = quota_sample_exact(df.repartition(11), budget_ppm=300_000).collect()
    assert sorted((r["doc_id"], r["grp"], r["rk"]) for r in out2) == sorted(
        (r["doc_id"], r["grp"], r["rk"]) for r in out
    )


def test_domain_reweight_mw_matches_reference(spark):
    """The integer MW walk matches a pure-Python reference; weight
    mass moves toward the high-loss domain and Σ w stays ~1e6."""
    from institutional_fx_etl_spark.operators.selection import (
        domain_reweight_mw,
    )

    rows = []
    i = 0
    for src, n, n_bad in [("clean", 50, 5), ("noisy", 30, 24), ("mid", 20, 10)]:
        for j in range(n):
            rows.append((i, src, j < n_bad))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, source string, bad boolean")
    out = {
        r["grp"]: r
        for r in domain_reweight_mw(df, "bad", steps=3, eta_shift=2).collect()
    }

    # pure-Python twin of the integer recurrence
    doms = {"clean": (50, 5), "noisy": (30, 24), "mid": (20, 10)}
    w = {g: 1_000_000 for g in doms}
    loss = {g: (bad * 1_000_000) // n for g, (n, bad) in doms.items()}
    for _ in range(3):
        grown = {g: w[g] + (w[g] * loss[g]) // 4_000_000 for g in doms}
        tw = sum(grown.values())
        w = {g: (grown[g] * 1_000_000) // tw for g in doms}
    for g in doms:
        assert out[g]["w_micro"] == w[g]
        assert out[g]["loss_micro"] == loss[g]
    assert out["noisy"]["w_micro"] > out["mid"]["w_micro"] > out["clean"]["w_micro"]
    assert abs(sum(r["w_micro"] for r in out.values()) - 1_000_000) <= 3


def test_embedding_decontaminate_semantics(spark):
    """A planted near-copy across the split is flagged with the right
    match_id; clean vectors are absent; flagged cosines are correct
    vs numpy; same-cell recall is 100% (every missed pair crosses a
    cell boundary)."""
    import numpy as np

    from institutional_fx_etl_spark.operators.similarity import (
        embedding_decontaminate,
    )

    rng = np.random.RandomState(11)
    train_vecs = rng.randn(40, 16).round(3)
    rows = [(i, [float(x) for x in train_vecs[i]]) for i in range(40)]
    train = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    # test 1000 = near-copy of train 25; test 1001 = fresh random
    leak = (train_vecs[25] + 0.01).round(3)
    fresh = rng.randn(16).round(3)
    test = spark.createDataFrame(
        [(1000, [float(x) for x in leak]), (1001, [float(x) for x in fresh])],
        "vec_id long, embedding array<double>",
    )
    out = {
        r["test_id"]: r
        for r in embedding_decontaminate(
            train, test, min_cosine=0.95, num_centroids=4
        ).collect()
    }
    assert 1000 in out and out[1000]["match_id"] == 25
    u = lambda v: v / np.linalg.norm(v)
    want = round(float(u(leak) @ u(train_vecs[25])), 6)
    assert abs(out[1000]["max_cosine"] - want) <= 1e-6
    assert 1001 not in out


def test_kmeans_inertia_numpy_regime_equals_hof(spark):
    """Above MAX_HOF_CENTROIDS the inertia scan runs as the Arrow
    kernel — per-cell results must be IDENTICAL to the literal-HOF
    path on the same corpus (the _assign_numpy equality discipline)."""
    import numpy as np

    from institutional_fx_etl_spark.operators import similarity as sim

    rng = np.random.RandomState(5)
    vecs = rng.randn(300, 12).round(3)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # 24 centroids > MAX_HOF_CENTROIDS=16 -> numpy regime
    out_np = {
        r["cid"]: (r["n_vectors"], r["inertia_micro"], r["mean_d2"])
        for r in sim.kmeans_inertia(df, num_centroids=24).collect()
    }
    # force the HOF path by monkey-lowering nothing: call the literal
    # branch via a raised threshold
    orig = sim.MAX_HOF_CENTROIDS
    sim.MAX_HOF_CENTROIDS = 1000
    try:
        out_hof = {
            r["cid"]: (r["n_vectors"], r["inertia_micro"], r["mean_d2"])
            for r in sim.kmeans_inertia(df, num_centroids=24).collect()
        }
    finally:
        sim.MAX_HOF_CENTROIDS = orig
    assert out_np == out_hof
    assert len(out_np) == 24


def test_quota_sample_exact_random_property(spark):
    """Seeded random group sizes × budgets: Σ kept == K exactly and
    every per-group take is within 1 of exact proportionality."""
    import random

    from institutional_fx_etl_spark.operators.selection import (
        quota_sample_exact,
    )

    rng = random.Random(42)
    for trial in range(3):
        sizes = {f"s{j}": rng.randint(1, 40) for j in range(rng.randint(2, 9))}
        ppm = rng.choice([100_000, 333_333, 500_000, 777_000])
        rows, i = [], 0
        for src, n in sizes.items():
            for _ in range(n):
                rows.append((i, src))
                i += 1
        df = spark.createDataFrame(rows, "doc_id long, source string")
        out = quota_sample_exact(df, budget_ppm=ppm).collect()
        n_total = sum(sizes.values())
        k = n_total * ppm // 1_000_000
        assert len(out) == k, (trial, sizes, ppm)
        takes = {}
        for r in out:
            takes[r["grp"]] = takes.get(r["grp"], 0) + 1
        for src, n in sizes.items():
            ideal = k * n / n_total
            assert ideal - 1 < takes.get(src, 0) < ideal + 1, (
                trial, src, sizes, ppm,
            )


def test_dup_span_coverage_full_duplication_property(spark):
    """Duplicating every document makes EVERY shingle corpus-dup, so
    every doc's coverage must be exactly 1.0; and coverage is always
    within [0, 1]."""
    import random

    from institutional_fx_etl_spark.operators.text import (
        dup_span_coverage,
    )

    rng = random.Random(7)
    vocab = [f"w{j}" for j in range(50)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 30))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    base = dup_span_coverage(df).collect()
    assert all(0.0 <= r["dup_coverage"] <= 1.0 for r in base)
    dup_rows = rows + [(i + 1000, t) for i, t in rows]
    df2 = spark.createDataFrame(dup_rows, "doc_id long, text string")
    out = dup_span_coverage(df2).collect()
    assert len(out) == 120
    assert all(r["dup_coverage"] == 1.0 for r in out)


def test_embedding_decontaminate_numpy_equals_sql(spark):
    """The Arrow cross-table kernel (default) must match the JVM cell
    join bit-for-bit on a random corpus — counts, max cosines and
    argmax train ids."""
    import numpy as np

    from institutional_fx_etl_spark.operators.similarity import (
        embedding_decontaminate,
    )

    rng = np.random.RandomState(17)
    vecs = rng.randn(400, 16).round(3)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(400)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    train = df.filter("vec_id % 5 <> 0")
    test = df.filter("vec_id % 5 = 0")

    def snap(strategy):
        return sorted(
            (r["test_id"], r["n_matches"], r["max_cosine"], r["match_id"])
            for r in embedding_decontaminate(
                train, test, min_cosine=0.3, num_centroids=6,
                pair_strategy=strategy,
            ).collect()
        )

    got_np, got_sql = snap("numpy"), snap("sql")
    assert got_np == got_sql
    assert len(got_np) > 0


def test_embedding_decontaminate_rejects_unknown_strategy():
    from institutional_fx_etl_spark.operators.similarity import (
        embedding_decontaminate,
    )

    with pytest.raises(ValueError, match="pair_strategy"):
        embedding_decontaminate(None, None, pair_strategy="fast")


def test_token_quota_take_prefix_semantics(spark):
    """Each source's take is the maximal md5-ordered PREFIX fitting
    its water-filled allocation: Σ w per group <= alloc, adding the
    next doc in order would overflow, and the result is
    partition-independent."""
    import hashlib

    from institutional_fx_etl_spark.operators.selection import (
        token_budget_fit,
        token_quota_take,
    )

    rows = []
    i = 0
    for src, n, per in [("a", 20, 10), ("b", 10, 50), ("c", 5, 200)]:
        for _ in range(n):
            rows.append((i, src, per))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    alloc = {
        r["source"]: r["alloc"] for r in token_budget_fit(df).collect()
    }
    out = token_quota_take(df).collect()
    by = {}
    for r in out:
        by.setdefault(r["grp"], []).append(r)
    weights = {"a": 10, "b": 50, "c": 200}
    for src, rs in by.items():
        got = sum(r["w"] for r in rs)
        assert got <= alloc[src]
        # prefix-maximality: one more doc would overflow (or the
        # source is taken whole)
        n_src = {"a": 20, "b": 10, "c": 5}[src]
        assert len(rs) == n_src or got + weights[src] > alloc[src]
        # the kept set IS the md5-order prefix
        def draw(d):
            return int(
                hashlib.md5(b"tq" + str(d).encode()).hexdigest()[:15], 16
            )
        ids_in_src = [r[0] for r in rows if r[1] == src]
        order = sorted(ids_in_src, key=lambda d: (draw(d), d))
        kept = sorted(r["doc_id"] for r in rs)
        assert kept == sorted(order[: len(rs)])
    out2 = token_quota_take(df.repartition(13)).collect()
    assert sorted(map(tuple, out2)) == sorted(map(tuple, out))


def test_probe_mask_regime_equals_distributed(spark):
    """The mask-sufficient-statistic GD (default regime) must land on
    EXACTLY the distributed feature-matrix loop's weights and kept
    set — the same int64 walk through a different plan."""
    from institutional_fx_etl_spark.operators import selection as sel

    rows = []
    for i in range(150):
        good = i % 3 == 0
        text = (
            "alpha beta gamma quality signal" if good
            else "zz%d junk filler noise spam" % (i % 7)
        )
        rows.append((i, text + " common", good))
    df = spark.createDataFrame(rows, "doc_id long, text string, lab boolean")

    def snap():
        w = {
            r["b"]: r["w_micro"]
            for r in sel.linear_probe_gd(df, "lab").collect()
        }
        kept = sorted(
            (r["doc_id"], r["score_micro"], r["kept"])
            for r in sel.linear_probe_score(df, "lab").collect()
        )
        return w, kept

    got_mask = snap()
    orig = sel.MAX_MASK_BUCKETS
    sel.MAX_MASK_BUCKETS = -1  # force the distributed twin
    try:
        got_dist = snap()
    finally:
        sel.MAX_MASK_BUCKETS = orig
    assert got_mask == got_dist


def test_domain_reweight_mw_fractional_loss(spark):
    """r9 ADVICE: a fractional [0,1] hardness signal must carry its
    mass (micro-rounded before summing), not truncate to 0 through an
    INT cast — 0.7 loss on every doc must beat 0.2 loss."""
    from institutional_fx_etl_spark.operators.selection import (
        domain_reweight_mw,
    )

    rows = []
    for i in range(40):
        rows.append((i, "hard" if i < 20 else "easy"))
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = {
        r["grp"]: r
        for r in domain_reweight_mw(
            df, "CASE WHEN source = 'hard' THEN 0.7 ELSE 0.2 END"
        ).collect()
    }
    assert out["hard"]["loss_micro"] == 700_000
    assert out["easy"]["loss_micro"] == 200_000
    assert out["hard"]["w_micro"] > out["easy"]["w_micro"]


def test_token_budget_fit_rejects_bad_budget(spark):
    """r9 ADVICE: budget > total (num/den > 1) or den <= 0 must raise
    a clear ValueError instead of emitting NULL allocs."""
    import pytest

    from institutional_fx_etl_spark.operators.selection import (
        token_budget_fit,
        token_quota_take,
    )

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "doc_id long, source string, n_chars long"
    )
    for num, den in [(3, 2), (1, 0), (0, 2), (-1, 2), (1, -2)]:
        with pytest.raises(ValueError, match="budget"):
            token_budget_fit(df, budget_num=num, budget_den=den)
        with pytest.raises(ValueError, match="budget"):
            token_quota_take(df, budget_num=num, budget_den=den)
    # the full-corpus edge (num == den) is legal: everyone allocated whole
    out = {r["source"]: r["alloc"]
           for r in token_budget_fit(df, budget_num=1, budget_den=1).collect()}
    assert out == {"a": 10, "b": 20}


def test_probe_gd_null_labels_regimes_agree(spark):
    """r9 ADVICE: NULL target labels count as 0 in BOTH GD regimes —
    the doc stays in n and contributes y=0, mask == distributed."""
    from institutional_fx_etl_spark.operators import selection as sel

    rows = []
    for i in range(90):
        lab = None if i % 5 == 0 else i % 3 == 0
        text = "alpha beta good" if i % 3 == 0 else "zz%d junk" % (i % 7)
        rows.append((i, text + " common", lab))
    df = spark.createDataFrame(rows, "doc_id long, text string, lab boolean")

    def weights():
        return {
            r["b"]: r["w_micro"]
            for r in sel.linear_probe_gd(df, "lab").collect()
        }

    got_mask = weights()
    orig = sel.MAX_MASK_BUCKETS
    sel.MAX_MASK_BUCKETS = -1
    try:
        got_dist = weights()
    finally:
        sel.MAX_MASK_BUCKETS = orig
    assert got_mask == got_dist
    # and the NULL-coalesced run equals an explicitly-coalesced target
    got_explicit = {
        r["b"]: r["w_micro"]
        for r in sel.linear_probe_gd(df, "COALESCE(lab, false)").collect()
    }
    assert got_mask == got_explicit
