"""Round-6 operator tests: near-dup cell blocking recall fix, plus the
new round-6 operators.

Reference provenance: the near-dup family extends the reference's
dedup surface (SURVEY.md §2 LLM-pipeline extension); no reference
file implements these — they are Spark-first additions.
"""

import math

import pytest
from pyspark.sql import functions as F


def test_embedding_near_dup_finds_cross_id_block_pair(spark):
    """Round-5 verdict ask #2: the old id-range blocking
    (block = id / 50) made a near-dup pair with ids 49 and 50
    structurally invisible (different blocks). Cell blocking must
    find it: both vectors point the same way, so they share a
    nearest centroid regardless of their ids."""
    from institutional_fx_etl_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    rows = []
    # two orthogonal-ish "background" directions plus the planted pair
    for i in range(8):
        v = [0.0] * 8
        v[i] = 1.0
        rows.append((i, v))
    rows.append((49, [0.6, 0.8, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]))
    rows.append((50, [0.6, 0.799, 0.001, 0.0, 0.0, 0.0, 0.0, 0.0]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_dup_pairs(df, num_centroids=4).collect()
    }
    assert (49, 50) in pairs, (
        "cross-id-block near-dup pair must be found by cell blocking"
    )
    assert pairs[(49, 50)] > 0.999


def test_embedding_near_dup_max_cell_cap(spark):
    """Cells above max_cell skip the compare entirely (hot-bucket
    policy) — no pairs emitted from an oversized cell."""
    from institutional_fx_etl_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    rows = [(i, [1.0, float(i) * 1e-4, 0.0, 0.0]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = embedding_near_dup_pairs(df, num_centroids=1, max_cell=5).collect()
    assert out == [], "oversized cell must be skipped, not exploded"


def test_assign_to_broadcast_path_matches_literal(spark, monkeypatch):
    """Round-5 advice: past MAX_LITERAL_CENTROIDS the assignment falls
    back to a broadcast join + max_by argmax. Both regimes must assign
    identically (same ccos rounding, same cid-asc tiebreak)."""
    from institutional_fx_etl_spark.operators import similarity

    rows = [
        (i, [math.cos(i * 0.37 + d * 0.11) for d in range(8)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = similarity.kmeans_centroids(df, num_centroids=6)
    lit = {
        r["vid"]: r["cid"]
        for r in similarity._assign_to(df, cents).collect()
    }
    monkeypatch.setattr(similarity, "MAX_LITERAL_CENTROIDS", 2)
    bc = {
        r["vid"]: r["cid"]
        for r in similarity._assign_to(df, cents).collect()
    }
    assert bc == lit


def test_asof_nearest_equal_ts_right_rows_deterministic(spark):
    """Round-5 advice: two right rows at the identical timestamp must
    resolve reproducibly (max payload) regardless of physical layout."""
    from institutional_fx_etl_spark.operators.asof import asof_join_nearest

    from datetime import datetime

    t = datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame([(1, t)], "id long, datetime timestamp")
    right_rows = [(t, 10.0), (t, 30.0), (t, 20.0)]
    for n_parts in (1, 3):
        right = spark.createDataFrame(
            right_rows, "datetime timestamp, quote double"
        ).repartition(n_parts)
        out = asof_join_nearest(left, right).collect()
        assert len(out) == 1
        assert out[0]["quote_near"] == 30.0, (
            "equal-ts right rows must resolve to the max payload"
        )
