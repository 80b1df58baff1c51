"""Training-corpus pipeline — the extension-side flagship.

Composes the LLM-data-pipeline operators into the standard corpus-prep
flow, as ONE lazy plan per stage family (the iterative CC step is the
only materialization point):

  1. near-dup clustering (MinHash LSH pairs → connected components),
  2. canonical-representative selection (min doc id per cluster),
  3. quality gate (stopword/punctuation/length score),
  4. language partitioning,
  5. shard packing: greedy token-budget assignment — cumulative token
     counts per language over deterministic doc order, shard index =
     floor(cum_tokens / budget). At scale each language packs
     independently (window partitioned by lang), and shard assignment
     is a pure window function — no driver-side loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from institutional_fx_etl_spark.operators.dedup import (
    dedup_clusters,
    minhash_lsh_pairs,
)
from institutional_fx_etl_spark.operators.text import quality_score, tokens


def build_training_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    jaccard_threshold: float = 0.2,
    min_quality: float = 0.05,
    tokens_per_shard: int = 20_000,
) -> DataFrame:
    """Return the packed corpus: ``doc_id, lang, n_tokens, quality,
    shard_id`` — deduplicated, quality-filtered, shard-packed per
    language."""
    pairs = minhash_lsh_pairs(
        docs, text_col=text_col, id_col=id_col, jaccard_threshold=jaccard_threshold
    )
    clusters = dedup_clusters(docs.select(id_col), pairs, id_col=id_col)
    canonical = clusters.filter(F.col(id_col) == F.col("comp")).select(id_col)

    scored = quality_score(
        docs.join(canonical, on=id_col), text_col=text_col
    ).filter(F.col("quality") >= min_quality)

    w = (
        Window.partitionBy(lang_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        scored.withColumn("__cum_tokens", F.sum("n_tokens").over(w))
        .select(
            id_col,
            lang_col,
            F.col("n_tokens").cast("int").alias("n_tokens"),
            "quality",
            # shard by the doc's START offset (greedy packing: the first
            # doc of a language is always shard 0; a doc straddling the
            # budget stays in the shard it started in)
            F.floor(
                (F.col("__cum_tokens") - F.col("n_tokens"))
                / F.lit(tokens_per_shard)
            )
            .cast("int")
            .alias("shard_id"),
        )
    )


def contamination_audit(
    docs: DataFrame,
    embeddings: DataFrame,
    eval_pred: str = "doc_id % 10 = 0",
    emb_eval_pred: str = "vec_id % 10 = 0",
    min_cosine: float = 0.35,
    num_centroids: int | None = None,
    ngram_n: int = 5,
) -> DataFrame:
    """Composite eval-contamination audit — ONE row per held-out
    document carrying BOTH leakage verdicts a pretraining release
    checks: the lexical one (shares any word ``ngram_n``-gram with the
    training corpus — ``decontaminate_against``) and the semantic one
    (a training embedding within ``min_cosine`` —
    ``embedding_decontaminate``, which catches paraphrases the n-gram
    rule can't see). ``contaminated`` is the union verdict; the
    per-signal columns say WHY, which is what an audit reader acts on.

    Both legs keep their own scale shapes: the lexical leg broadcasts
    the EVAL-side (doc_id, gram) pairs — eval-suite-sized — and
    streams the training-corpus grams once
    (``decontaminate_eval_broadcast``; the naive
    ``decontaminate_against(ev, corpus)`` call would broadcast a
    corpus-sized gram set, round-10 ADVICE #1); the semantic leg is
    the auto-celled cross-table cosine. The audit itself adds one
    eval-sized left join. Output: eval_id, ngram_matched, ngram_hit,
    emb_matches, emb_max_cosine, contaminated.
    """
    from institutional_fx_etl_spark.operators.similarity import (
        embedding_decontaminate,
    )
    from institutional_fx_etl_spark.operators.text import (
        decontaminate_eval_broadcast,
    )
    from institutional_fx_etl_spark.plans.driver_queries import _auto_cells

    ev_docs = docs.filter(eval_pred)
    corpus_docs = docs.filter(f"NOT ({eval_pred})")
    train = embeddings.filter(f"NOT ({emb_eval_pred})")
    test = embeddings.filter(emb_eval_pred)
    # round-10 ADVICE #1: the per-doc report side here is the EVAL set
    # (small) and the scanned side is the TRAINING corpus (~90% of
    # docs) — the flipped-broadcast variant keeps the broadcast
    # eval-suite-sized instead of shipping a corpus-sized gram set
    ng = decontaminate_eval_broadcast(ev_docs, corpus_docs, n=ngram_n)
    emb = embedding_decontaminate(
        train,
        test,
        min_cosine=min_cosine,
        num_centroids=num_centroids or _auto_cells(train.count()),
    )
    return (
        ng.join(emb, ng["doc_id"] == emb["test_id"], "left")
        .selectExpr(
            "doc_id AS eval_id",
            "CAST(n_matched AS INT) AS ngram_matched",
            "CAST(n_matched > 0 AS INT) AS ngram_hit",
            "CAST(COALESCE(n_matches, 0) AS BIGINT) AS emb_matches",
            "max_cosine AS emb_max_cosine",
            "CAST(n_matched > 0 OR test_id IS NOT NULL AS INT)"
            " AS contaminated",
        )
    )
