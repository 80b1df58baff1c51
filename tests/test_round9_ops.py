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
