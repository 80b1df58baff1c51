"""Round-4 operator tests: banded range join, salted aggregation,
repetition quality signals, TF-IDF top terms."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from institutional_fx_etl_spark.functions.skew import salted_agg
from institutional_fx_etl_spark.operators.rangejoin import banded_self_pairs
from institutional_fx_etl_spark.operators.text import (
    repetition_stats,
    tfidf_top_terms,
)

T0 = datetime(2024, 3, 1)


def test_banded_range_join_equals_naive(spark):
    """The banded plan must return exactly the naive O(n²) join's
    pairs — including pairs that straddle a band boundary (the case
    the (b, b+1) neighbor join exists for) — each exactly once."""
    rows = []
    eid = 0
    # user 1: a burst straddling the 300s band edge at t=300
    for sec in [0, 10, 290, 305, 310, 599, 601, 1200]:
        rows.append((eid, 1, T0 + timedelta(seconds=sec)))
        eid += 1
    # user 2: sparse — only one in-range pair
    for sec in [0, 250, 5000]:
        rows.append((eid, 2, T0 + timedelta(seconds=sec)))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp"
    )

    got = sorted(
        (r.key, r.id_a, r.id_b, r.dt_sec)
        for r in banded_self_pairs(df, band_seconds=300).collect()
    )

    a = df.selectExpr(
        "user_id AS key", "event_id AS id_a", "cast(ts as double) AS ta"
    )
    b = df.selectExpr(
        "user_id AS bkey", "event_id AS id_b", "cast(ts as double) AS tb"
    )
    want = sorted(
        (r.key, r.id_a, r.id_b, r.dt_sec)
        for r in a.join(b, (a.key == b.bkey) & (a.id_a < b.id_b))
        .filter(F.abs(F.col("tb") - F.col("ta")) <= 300)
        .selectExpr("key", "id_a", "id_b", "round(tb - ta, 6) AS dt_sec")
        .collect()
    )
    assert got == want
    assert len(got) > 0
    # duplicates would break the exactly-once claim
    assert len({(k, x, y) for k, x, y, _ in got}) == len(got)


def test_salted_agg_equals_direct_groupby(spark):
    """Salted two-phase aggregation must be value-identical to the
    direct groupBy for sum/count/min/max — including a pathologically
    hot key."""
    rows = [(1, float(i % 97), i) for i in range(5000)]  # hot key 1
    rows += [(k, float(k), k) for k in range(2, 40)]
    df = spark.createDataFrame(rows, "k int, v double, n long")
    aggs = {
        "sum_v": ("sum", "v"),
        "cnt": ("count", "*"),
        "min_v": ("min", "v"),
        "max_v": ("max", "v"),
    }
    got = {
        r.k: (round(r.sum_v, 6), r.cnt, r.min_v, r.max_v)
        for r in salted_agg(df, ["k"], aggs, factor=8).collect()
    }
    want = {
        r.k: (round(r.sum_v, 6), r.cnt, r.min_v, r.max_v)
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("sum_v"),
            F.count("*").alias("cnt"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
        .collect()
    }
    assert got == want

    with pytest.raises(ValueError, match="unsupported"):
        salted_agg(df, ["k"], {"avg_v": ("avg", "v")})


def test_repetition_stats_planted(spark):
    """rep_ratio and top_token_share on hand-computable fixtures,
    including the short-doc guards."""
    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),     # 3 bigrams, 1 distinct
            (2, "all words here differ"),   # 3 bigrams, all distinct
            (3, "one"),                     # no bigrams → guard path
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_stats(docs).collect()}
    assert out[1].n_bigrams == 3 and out[1].n_distinct_bigrams == 1
    assert out[1].rep_ratio == pytest.approx(1 - 1 / 3, abs=1e-6)
    assert out[1].top_token_share == 1.0
    assert out[2].rep_ratio == 0.0
    assert out[2].top_token_share == pytest.approx(0.25, abs=1e-6)
    assert out[3].n_bigrams == 0 and out[3].rep_ratio == 0.0


def test_tfidf_top_terms_ranks_distinctive_words(spark):
    """A term unique to one doc must outrank corpus-wide stopwords;
    ties break lexicographically; k bounds the output."""
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog ate the bone"),
            (3, "the cat and the dog met"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(docs, k=2)
    rows = out.collect()
    assert all(r.rk <= 2 for r in rows)
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append((r.rk, r.term, r.tfidf))
    # 'the' appears in every doc → idf = ln(4/4) = 0 → never a top term
    for d, terms in per_doc.items():
        assert all(t != "the" for _, t, _ in terms), (d, terms)
    # doc 1's top terms are its unique words, lexicographic on the tie
    d1 = sorted(per_doc[1])
    assert [t for _, t, _ in d1] == ["mat", "on"]


def test_sketch_accuracy_vs_exact(spark):
    """HLL++ distinct counts and t-digest quantiles (the mergeable
    bounded-memory path) must land within tight bounds of the exact
    answers on the driver testdata."""
    from institutional_fx_etl_spark.plans.driver_queries import (
        REGISTRY,
        sketch_stats_raw,
    )
    from institutional_fx_etl_spark.sources.readers import load_table

    sf_dir = "/root/testdata/sf0.001"
    got = {
        r.event_type: r for r in sketch_stats_raw(spark, sf_dir).collect()
    }
    # the registered contract wraps the same bounds as in-query
    # verdicts (r9 verdict ask #4) — every flag must be TRUE
    contract = REGISTRY["sketch_stats"][0](spark, sf_dir).collect()
    assert contract and all(
        r.users_ok and r.p50_ok and r.p99_ok for r in contract
    )
    ev = load_table(spark, sf_dir, "events")
    # rank-error gate, not value-error: the t-digest returns an ACTUAL
    # data value whose rank is within the sketch's rank tolerance —
    # in a sparse tail the value gap between adjacent ranks can be
    # large even when the rank error is tiny, so the right bound is
    # "lands between nearby exact quantiles"
    exact = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("nd"),
            F.expr("percentile(value, 0.45)").alias("p45"),
            F.expr("percentile(value, 0.55)").alias("p55"),
            F.expr("percentile(value, 0.97)").alias("p97"),
            F.max("value").alias("pmax"),
        )
        .collect()
    }
    assert set(got) == set(exact) and got
    for et, e in exact.items():
        g = got[et]
        assert abs(g.approx_users - e.nd) <= max(2, 0.05 * e.nd), (et, g, e)
        assert e.p45 <= g.approx_p50 <= e.p55, (et, g, e)
        assert e.p97 <= g.approx_p99 <= e.pmax, (et, g, e)
