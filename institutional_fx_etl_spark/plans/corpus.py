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
from institutional_fx_etl_spark.functions.localrel import local_rows_df
from pyspark.sql import functions as F

from institutional_fx_etl_spark.operators.dedup import (
    dedup_clusters,
    minhash_lsh_pairs,
)
from institutional_fx_etl_spark.operators.text import quality_score, tokens
from institutional_fx_etl_spark.functions.cachereg import cached, cached_deser, cached_disk


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


def corpus_flagship(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_pred: str = "doc_id % 20 = 0",
    ngram_n: int = 3,
    dirty_ratio: float = 0.5,
    min_tokens: int = 5,
    max_tokens: int = 10_000,
    max_mean_token_len: float = 12.0,
    seq_len: int = 256,
    bucket_docs: int = 1024,
) -> DataFrame:
    """Round-14 flagship chain — the four stages every pretraining
    corpus release runs, in order, with a five-row AUDIT LEDGER as
    the output (the hybrid pipeline's never-a-silent-drop
    discipline):

      1. DECONTAMINATE: drop training docs whose word-``ngram_n``-gram
         overlap ratio against the held-out split reaches
         ``dirty_ratio`` (:func:`~institutional_fx_etl_spark.operators
         .text.ngram_overlap_contamination` — the graded rule, so a
         stray idiom survives but an eval leak does not);
      2. EXACT DEDUP: keep the min-id doc per md5(text);
      3. QUALITY GATE: token count in [min_tokens, max_tokens] and
         mean token length ≤ ``max_mean_token_len`` (the cheap
         Gopher-style length cuts);
      4. PACK: concat-and-chunk sequence packing — docs in id order,
         pack = cum_tokens_before div ``seq_len`` (what an LLM
         dataloader consumes).

    Scale shapes: stage 1 broadcasts the eval-sized gram set; stages
    2-3 are hash aggregates/filters; stage 4's global prefix sum is
    TWO-LEVEL (per-bucket subtotals + a bucket-count-sized offset
    window + a within-bucket window partitioned by bucket — the
    ks_two_sample discipline), so no full-data single-partition sort
    exists anywhere in the chain. Integer token counts make the
    decomposition exact on any partitioning.

    The ledger is 5 rows by construction, so the survivor relations
    persist only within this call: the rows materialize eagerly and
    every cache handle is released before returning (the
    prefix_filter_cap_report ownership pattern).

    Output: stage, n_rows, n_tokens, max_unit — where max_unit is
    the max per-doc token count for doc stages and the max per-pack
    token total for the packed row.
    """
    from pyspark import StorageLevel

    from institutional_fx_etl_spark.operators.text import (
        ngram_overlap_contamination,
        tokens,
    )

    train = docs.filter(f"NOT ({eval_pred})")
    bench = docs.filter(eval_pred)
    base = train.select(
        F.col(id_col).alias("__id"),
        F.size(tokens(text_col)).alias("__nt"),
        F.length(F.col(text_col)).alias("__nc"),
        F.md5(F.col(text_col)).alias("__h"),
    ).transform(cached)

    contam = ngram_overlap_contamination(
        train, bench, text_col=text_col, id_col=id_col, n=ngram_n,
        dirty_ratio=dirty_ratio,
    ).selectExpr(f"`{id_col}` AS __id", "overlap_ratio")
    s1 = (
        base.join(contam, "__id")
        .filter(f"overlap_ratio < {float(dirty_ratio)!r}D")
        .drop("overlap_ratio")
        .transform(cached)
    )
    keep = s1.groupBy("__h").agg(F.expr("min(__id) AS __id"))
    s2 = s1.join(keep.select("__id"), "__id", "left_semi").transform(cached)
    s3 = s2.filter(
        f"__nt BETWEEN {int(min_tokens)} AND {int(max_tokens)}"
        f" AND CAST(__nc AS DOUBLE) / __nt <= {float(max_mean_token_len)!r}D"
    ).transform(cached)

    # stage 4: two-level exact prefix sum -> pack assignment
    bucketed = s3.selectExpr(
        "__id", "__nt", f"__id div {int(bucket_docs)} AS __b"
    )
    bsub = bucketed.groupBy("__b").agg(F.expr("SUM(__nt) AS __bt"))
    off_w = (
        Window.orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bsub.withColumn(
        "__off", F.coalesce(F.sum("__bt").over(off_w), F.lit(0))
    ).select("__b", "__off")
    in_w = (
        Window.partitionBy("__b")
        .orderBy("__id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        bucketed.withColumn("__w", F.sum("__nt").over(in_w))
        .join(F.broadcast(offsets), "__b")
        .selectExpr("__id", "__nt", "__off + __w - __nt AS __cb")
    )
    packs = cum.selectExpr(
        f"__cb div {int(seq_len)} AS __pack", "__nt"
    ).groupBy("__pack").agg(F.expr("SUM(__nt) AS __ptok"))

    def _stage_row(name, rel):
        r = rel.agg(
            F.expr("CAST(count(*) AS BIGINT) AS n_rows"),
            F.expr("CAST(coalesce(SUM(__nt), 0) AS BIGINT) AS n_tokens"),
            F.expr("CAST(coalesce(MAX(__nt), 0) AS BIGINT) AS max_unit"),
        ).collect()[0]
        return (name, r["n_rows"], r["n_tokens"], r["max_unit"])

    rows = [
        _stage_row("00_input", base),
        _stage_row("01_decontaminated", s1),
        _stage_row("02_deduped", s2),
        _stage_row("03_quality", s3),
    ]
    pr = packs.agg(
        F.expr("CAST(count(*) AS BIGINT) AS n_rows"),
        F.expr("CAST(coalesce(SUM(__ptok), 0) AS BIGINT) AS n_tokens"),
        F.expr("CAST(coalesce(MAX(__ptok), 0) AS BIGINT) AS max_unit"),
    ).collect()[0]
    rows.append(("04_packed", pr["n_rows"], pr["n_tokens"], pr["max_unit"]))
    for h in (base, s1, s2, s3):
        h.unpersist()
    return local_rows_df(
        docs.sparkSession,
        rows,
        "stage string, n_rows bigint, n_tokens bigint, max_unit bigint",
    )
