"""Training-corpus pipeline semantics on a planted fixture."""

from institutional_fx_etl_spark.plans.corpus import build_training_corpus

LONG = " ".join(["the quick brown fox jumps over the lazy dog"] * 5)


def test_corpus_dedup_quality_and_packing(spark):
    rows = [
        (1, LONG, "en"),
        (2, LONG, "en"),                       # exact dup of 1 → dropped
        (3, LONG + " extra tail words", "en"),  # near dup of 1 → dropped
        (4, "spark engine " * 30, "en"),        # distinct, kept
        (5, "le chat " * 30, "fr"),             # other language, kept
        (6, "query plan " * 10, "en"),          # starts past 2 budgets
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {
        r["doc_id"]: r
        for r in build_training_corpus(
            docs, min_quality=-1.0, tokens_per_shard=50
        ).collect()
    }
    # cluster {1,2,3} → canonical 1 only; 4, 5, 6 survive
    assert set(out) == {1, 4, 5, 6}
    # greedy packing by start offset, per language, 50 tokens/shard
    assert out[1]["shard_id"] == 0          # starts at 0
    assert out[4]["shard_id"] == 0          # starts at 45 (straddles)
    assert out[6]["shard_id"] == 2          # starts at 106
    assert out[5]["shard_id"] == 0          # fr packs independently
    # 61, not 60: the trailing space makes \s+ split yield a final
    # empty token — the whitespace tokenizer counts it, like pandas
    assert out[1]["n_tokens"] == 45 and out[4]["n_tokens"] == 61
