"""Semantic tests for the round-5 operators: hierarchical candle
rollup, sequence packing, token entropy, linear interpolation, and
embedding centroids — planted fixtures with hand-computed answers."""

from datetime import datetime

from pyspark.sql import functions as F

from institutional_fx_etl_spark.functions.windows import interpolate_linear
from institutional_fx_etl_spark.operators.ohlc import resample_candles
from institutional_fx_etl_spark.operators.similarity import (
    embedding_centroids,
)
from institutional_fx_etl_spark.operators.text import (
    pack_chunks,
    token_entropy,
)


def test_resample_candles_merges_ohlc_partials(spark):
    rows = [
        # bucket 00:00-04:00
        (datetime(2024, 1, 1, 0), 10.0, 12.0, 9.0, 11.0, 5.0),
        (datetime(2024, 1, 1, 2), 11.0, 15.0, 10.0, 14.0, 3.0),
        # bucket 04:00-08:00
        (datetime(2024, 1, 1, 5), 14.0, 14.5, 13.0, 13.5, 2.0),
    ]
    candles = spark.createDataFrame(
        rows, "datetime timestamp, open double, high double, low double,"
        " close double, volume double"
    )
    out = {
        r["datetime"]: r
        for r in resample_candles(candles, window_duration="4 hours").collect()
    }
    b0 = out[datetime(2024, 1, 1, 0)]
    assert (b0["open"], b0["close"]) == (10.0, 14.0)  # by sub-candle time
    assert (b0["high"], b0["low"]) == (15.0, 9.0)
    assert b0["volume"] == 8.0
    b1 = out[datetime(2024, 1, 1, 4)]
    assert (b1["open"], b1["close"], b1["volume"]) == (14.0, 13.5, 2.0)


def test_pack_chunks_prefix_sum_and_shard_isolation(spark):
    rows = [
        (1, 0, 100), (1, 48, 100), (1, 96, 60),  # doc 1: 260 tokens
        (2, 0, 100),
    ]
    chunks = spark.createDataFrame(
        rows, "doc_id long, start_tok int, n_tokens int"
    )
    out = pack_chunks(chunks, seq_len=256, num_shards=4)
    got = {
        (r["doc_id"], r["start_tok"]): r for r in out.collect()
    }
    # within doc 1's shard (single doc per shard here unless hashes
    # collide): offsets follow the running sum, pack rolls at 256
    d1 = [got[(1, s)] for s in (0, 48, 96)]
    if got[(2, 0)]["shard"] != d1[0]["shard"]:
        assert [r["pack_offset"] for r in d1] == [0, 100, 200]
        assert d1[0]["pack_id"] == d1[1]["pack_id"]
        # third chunk starts at cumulative 200 < 256 -> same pack
        assert d1[2]["pack_id"] == d1[0]["pack_id"]
    # pack ids embed the shard -> globally unique across shards
    assert all(
        r["pack_id"] // 1099511627776 == r["shard"] for r in got.values()
    )
    # offsets always inside a pack
    assert all(0 <= r["pack_offset"] < 256 for r in got.values())


def test_pack_chunks_rolls_over_seq_len(spark):
    rows = [(1, i * 48, 100) for i in range(5)]  # 500 tokens, one doc
    chunks = spark.createDataFrame(
        rows, "doc_id long, start_tok int, n_tokens int"
    )
    out = sorted(
        pack_chunks(chunks, seq_len=256, num_shards=1).collect(),
        key=lambda r: r["start_tok"],
    )
    # cumulative starts: 0,100,200,300,400 -> packs 0,0,0,1,1
    assert [r["pack_id"] for r in out] == [0, 0, 0, 1, 1]
    assert [r["pack_offset"] for r in out] == [0, 100, 200, 44, 144]


def test_token_entropy_known_values(spark):
    import math

    docs = spark.createDataFrame(
        [
            (1, "a a b b"),        # H = 1 bit, TTR 0.5
            (2, "x x x x"),        # H = 0
            (3, "a b c d"),        # H = 2 bits, TTR 1
            (4, "a a a b"),        # H = 2 - 0.75*log2(3) ≈ 0.811278
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in token_entropy(docs).collect()}
    assert out[1]["entropy"] == 1.0 and out[1]["type_token_ratio"] == 0.5
    assert out[2]["entropy"] == 0.0 and out[2]["n_types"] == 1
    assert out[3]["entropy"] == 2.0
    expect = round(2 - 0.75 * math.log2(3), 6)
    assert abs(out[4]["entropy"] - expect) < 1e-9


def test_interpolate_linear_time_weighted(spark):
    rows = [
        (datetime(2024, 1, 1, 0, 0), 1.0),
        (datetime(2024, 1, 1, 0, 1), None),
        (datetime(2024, 1, 1, 0, 2), None),
        (datetime(2024, 1, 1, 0, 3), 4.0),
        (datetime(2024, 1, 1, 0, 4), None),  # trailing -> stays null
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    out = {
        r["ts"].minute: r["f"]
        for r in df.select(
            "ts",
            interpolate_linear("v", ts_col="ts", order_cols=("ts",)).alias(
                "f"
            ),
        ).collect()
    }
    assert out[0] == 1.0 and out[3] == 4.0
    assert out[1] == 2.0 and out[2] == 3.0  # time-weighted thirds
    assert out[4] is None


def test_embedding_centroids_exact_mean(spark):
    rows = [
        (1, [1.0, 2.0], 0),
        (2, [3.0, 4.0], 0),
        (3, [10.0, 20.0], 1),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {r["label"]: r for r in embedding_centroids(df).collect()}
    assert out[0]["centroid"] == [2.0, 3.0] and out[0]["n_vectors"] == 2
    assert out[1]["centroid"] == [10.0, 20.0] and out[1]["n_vectors"] == 1


def test_dedup_apply_keeps_cluster_representatives(spark):
    """The kept corpus = cluster representatives + singletons: doc 2
    (exact dup of 1) and 3 (near dup) drop; 1, 4, 5 survive."""
    from institutional_fx_etl_spark.plans.driver_queries import REGISTRY

    out = REGISTRY["dedup_apply"][0](spark, "/root/testdata/sf0.001")
    kept = {r["doc_id"] for r in out.collect()}
    from institutional_fx_etl_spark.operators.dedup import (
        dedup_clusters,
        minhash_lsh_pairs,
    )
    from institutional_fx_etl_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    labels = dedup_clusters(
        docs.select("doc_id"), minhash_lsh_pairs(docs, jaccard_threshold=0.2)
    )
    reps = {r["doc_id"] for r in labels.collect() if r["doc_id"] == r["comp"]}
    assert kept == reps and len(kept) > 0


def test_corpus_rebalance_deterministic_and_balanced(spark):
    """The md5 coin makes the sample identical across runs and
    partitionings, and each language lands near the rarest language's
    count in expectation."""
    from institutional_fx_etl_spark.plans.driver_queries import REGISTRY

    fn = REGISTRY["corpus_rebalance"][0]
    a = {r["doc_id"] for r in fn(spark, "/root/testdata/sf0.001").collect()}
    b = {
        r["doc_id"]
        for r in fn(spark, "/root/testdata/sf0.001")
        .repartition(13)
        .collect()
    }
    assert a == b
    from collections import Counter

    langs = Counter(
        r["lang"] for r in fn(spark, "/root/testdata/sf0.001").collect()
    )
    lo, hi = min(langs.values()), max(langs.values())
    assert hi <= 3 * lo, f"rebalanced mix still skewed: {langs}"


def test_semdedup_drops_near_identical_keeps_distinct(spark):
    """Two nearly-identical vectors in the same cell: the larger id is
    dropped; a distinct vector in the same cell survives; max_cell
    skips oversized cells (everything kept)."""
    from institutional_fx_etl_spark.operators.similarity import semdedup

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),     # centroid seed / keeper
        (1, [0.999, 0.01, 0.0, 0.0]),  # near-dup of 0 -> dropped
        (2, [0.0, 1.0, 0.0, 0.0]),     # distinct direction
        (3, [0.0, 0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r["vec_id"]: r["keep"]
        for r in semdedup(df, num_centroids=1, min_cosine=0.95).collect()
    }
    assert out[0] is True and out[1] is False
    assert out[2] is True and out[3] is True

    capped = semdedup(df, num_centroids=1, min_cosine=0.95, max_cell=2)
    assert all(r["keep"] for r in capped.collect()), (
        "cells over max_cell must skip the compare, not explode"
    )


def test_bpe_token_stats_pretokenizer_grain(spark):
    """GPT-2-pretokenizer grain: contractions, punctuation and digit
    runs count separately from words; whitespace runs don't count."""
    from institutional_fx_etl_spark.operators.text import bpe_token_stats

    docs = spark.createDataFrame(
        [
            (1, "Hello, world's 42 tests!"),
            # Hello | , | world | 's | 42 | tests | !  -> 7
            (2, "   "),  # whitespace only -> 0, ratio NULL
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bpe_token_stats(docs).collect()}
    assert out[1]["n_bpe_tokens"] == 7
    assert out[2]["n_bpe_tokens"] == 0
    assert out[2]["chars_per_token"] is None
