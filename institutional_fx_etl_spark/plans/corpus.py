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
