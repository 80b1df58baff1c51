"""Gates for the second round-4 operator batch: grouping sets, the
broadcast-bitmap prune join, funnel/streak analytics and the two new
streaming entries (sliding windows, stream-stream interval join).

The driver's correctness gate will produce their first rows next run;
these tests keep an oracle check in CI at sf0.001 plus behavioral
properties the row-hash can't express (pruning soundness and
effectiveness, plan shape)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from check_contract import compare, duck_connection  # noqa: E402

from institutional_fx_etl_spark.operators.bloomjoin import (  # noqa: E402
    bitmap_filter,
    bitmap_prune_join,
)
from institutional_fx_etl_spark.plans import driver_queries  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

NEW_BATCH = [
    "doc_chunking",
    "winnow_pairs",
    "skew_salted_join",
    "winnow_fingerprint",
    "decontaminate_ngram",
    "pii_redact",
    "grouping_sets_agg",
    "bitmap_prune_join",
    "funnel_analysis",
    "consecutive_streaks",
    "streaming_sliding_window",
    "streaming_stream_join",
]


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", NEW_BATCH)
def test_new_batch_matches_oracle(spark, duck, name):
    fn, oracle = driver_queries.REGISTRY[name]
    sdf = fn(spark, SF_DIR).toPandas()
    ddf = duck.sql(oracle).df()
    problems = compare(name, sdf, ddf)
    assert not problems, f"{name}: {problems}"


def test_bitmap_filter_is_sound_and_selective(spark):
    """Pruning must keep EVERY joinable row (no false negatives) and,
    for a selective build side, actually drop most of the probe side
    before the join."""
    probe = spark.range(0, 20_000).select(F.col("id").alias("k"))
    build = spark.range(0, 20_000, 1000).select(F.col("id").alias("bk"))

    pruned = bitmap_filter(probe, build, "k", "bk", m=4096)
    kept = {r["k"] for r in pruned.collect()}
    build_keys = {r["bk"] for r in build.collect()}
    assert build_keys <= kept, "pruning dropped joinable rows"
    # 20 build keys in 4096 buckets → occupancy ≈ 0.5%; expect the
    # pruned probe to be a small fraction of the input even with
    # collisions (generous 10× slack on the expected ~100 rows)
    assert len(kept) < 2_000

    exact = probe.join(build, F.col("k") == F.col("bk"), "inner")
    via_bitmap = bitmap_prune_join(probe, build, "k", "bk", m=4096)
    assert sorted(r["k"] for r in via_bitmap.collect()) == sorted(
        r["k"] for r in exact.collect()
    )


def test_bitmap_prune_rejects_outer_joins(spark):
    df = spark.range(1).select(F.col("id").alias("k"))
    df2 = spark.range(1).select(F.col("id").alias("bk"))
    with pytest.raises(ValueError, match="inner/left_semi"):
        bitmap_prune_join(df, df2, "k", "bk", how="left")


def test_bitmap_filter_runs_before_exchange(spark):
    """The bitmap predicate must sit in the probe-side scan stage —
    BELOW the join's exchange — so pruned rows never shuffle."""
    probe = spark.range(0, 10_000).select(F.col("id").alias("k"))
    build = spark.range(0, 100).select(F.col("id").alias("bk"))
    out = bitmap_prune_join(
        probe, build.hint("merge"), "k", "bk", m=1024
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    filt = next(
        (i for i, l in enumerate(lines) if "shiftright" in l.lower()), None
    )
    exch = next(
        (i for i, l in enumerate(lines) if "Exchange hashpartitioning" in l),
        None,
    )
    assert filt is not None, f"no bitmap filter in plan:\n{plan}"
    if exch is not None:
        # tree prints root-first: deeper (earlier-executing) operators
        # have LARGER line numbers, so the filter must print after
        assert filt > exch, f"bitmap filter above the exchange:\n{plan}"


def test_funnel_stage_ordering(spark):
    """Planted sequences: a user who purchases before clicking must
    stop at stage 1 (view only); the full ordered path reaches 3."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: view → click → purchase, in order → stage 3
        (1, t0, "view"),
        (1, t0 + dt.timedelta(minutes=1), "click"),
        (1, t0 + dt.timedelta(minutes=2), "purchase"),
        # user 2: purchase BEFORE the first view's click → stage 1
        (2, t0 + dt.timedelta(minutes=1), "view"),
        (2, t0, "purchase"),
        # user 3: click only, never viewed → stage 0
        (3, t0, "click"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )

    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    g = ev.withColumn("t1", t1)
    g = g.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") >= F.col("t1")),
                F.col("ts"),
            )
        ).over(w),
    )
    g = g.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") >= F.col("t2")),
                F.col("ts"),
            )
        ).over(w),
    )
    stages = {
        r["user_id"]: r["stage"]
        for r in g.groupBy("user_id")
        .agg(
            F.when(F.max("t3").isNotNull(), 3)
            .when(F.max("t2").isNotNull(), 2)
            .when(F.max("t1").isNotNull(), 1)
            .otherwise(0)
            .alias("stage")
        )
        .collect()
    }
    assert stages == {1: 3, 2: 1, 3: 0}


def test_chunking_covers_every_token_and_overlap(spark):
    """Every token index must fall in ≥1 chunk; consecutive chunks of
    a long doc overlap by exactly chunk_tokens − stride; rebuilding
    the document from stride-aligned chunk prefixes reproduces it."""
    from institutional_fx_etl_spark.operators.text import chunk_documents

    text = " ".join(f"w{i}" for i in range(150))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        (r["start_tok"], r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(df, chunk_tokens=64, stride=48).collect()
    )
    starts = [s for s, _, _ in rows]
    assert starts == [0, 48, 96, 144]
    covered = set()
    for s, _, n in rows:
        covered.update(range(s, s + n))
    assert covered == set(range(150))
    # overlap: chunk k's tokens [48k, 48k+64) — 16 tokens shared
    toks0 = rows[0][1].split(" ")
    toks1 = rows[1][1].split(" ")
    assert toks0[48:] == toks1[:16]
    # stride-aligned prefixes reassemble the document
    rebuilt = []
    for s, chunk, _ in rows:
        rebuilt.extend(chunk.split(" ")[:48])
    assert rebuilt[:150] == text.split(" ")


def test_winnowing_robust_to_local_edit(spark):
    """SIGMOD'03 winnowing guarantee: an edit at one position changes
    only the fingerprints of windows overlapping it — two documents
    sharing a long suffix share (most of) its fingerprints."""
    from institutional_fx_etl_spark.operators.text import winnow_fingerprints

    base = " ".join(f"tok{i}" for i in range(100))
    edited = "CHANGED " + " ".join(f"tok{i}" for i in range(1, 100))
    df = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id long, text string"
    )
    fps = winnow_fingerprints(df)
    by_doc = {1: set(), 2: set()}
    for r in fps.collect():
        by_doc[r["doc_id"]].add(r["fp"])
    shared = by_doc[1] & by_doc[2]
    # the edit perturbs at most shingle_n + window_w − 1 leading
    # windows; everything after must coincide
    assert len(shared) >= 0.8 * min(len(by_doc[1]), len(by_doc[2]))
    # and a completely different doc shares (almost) nothing
    other = " ".join(f"zzz{i}" for i in range(100))
    df2 = spark.createDataFrame(
        [(1, base), (3, other)], "doc_id long, text string"
    )
    by2 = {1: set(), 3: set()}
    for r in winnow_fingerprints(df2).collect():
        by2[r["doc_id"]].add(r["fp"])
    assert not (by2[1] & by2[3])
