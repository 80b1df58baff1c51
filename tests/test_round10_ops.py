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
