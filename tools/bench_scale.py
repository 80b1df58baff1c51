"""Round-6 verdict ask #7: the heavy operator family at 10× sf0.1.

At sf0.1 the embedding corpus is 2,000 rows and the co-purchase graph
~600k edges — small enough that fixed overhead (session, _auto_cells
count job, literal broadcast) dominates the bench walls and would hide
quadratic creep. This probe scales each heavy input 10× SYNTHETICALLY
(scan-side, no driver materialization):

- embeddings ×10: each vector explodes into 10 copies with a
  deterministic hash perturbation (offset ids) — near-dup structure
  stays realistic instead of degenerate exact duplicates;
- graphs ×10: 10 DISJOINT copies via per-copy key offsets — node
  degree distribution is preserved exactly, total edges 10×.

For a linear-in-n operator the 10× wall should land well under 10×
(fixed overhead amortizes); a super-linear wall ratio >> 10 flags
quadratic creep. Results → BENCH_scale.json.

Usage: python tools/bench_scale.py [--factor=10] [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from institutional_fx_etl_spark import get_spark  # noqa: E402


def scaled_embeddings(spark, sf_dir: str, factor: int) -> DataFrame:
    """×factor perturbed copies, ids offset by copy·10^7, each
    component nudged by a deterministic hash in [-0.1, 0.1]."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    if factor == 1:
        return emb.select("vec_id", "embedding")
    return (
        emb.select(
            "vec_id",
            "embedding",
            F.explode(F.expr(f"sequence(0, {factor - 1})")).alias("__c"),
        )
        .selectExpr(
            "vec_id + __c * 10000000 AS vec_id",
            "transform(embedding, (x, j) -> CAST(x + (abs(hash(vec_id,"
            " __c, j)) % 2001 - 1000) / 10000.0 AS FLOAT)) AS embedding",
        )
    )


def scaled_copurchase_edges(spark, sf_dir: str, factor: int) -> DataFrame:
    """Part co-purchase graph (same construction as the contract
    query), ×factor disjoint copies via partkey/orderkey offsets."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    )
    if factor > 1:
        li = li.select(
            "o",
            "p",
            F.explode(F.expr(f"sequence(0, {factor - 1})")).alias("__c"),
        ).selectExpr(
            "o + __c * 100000000 AS o", "p + __c * 100000000 AS p"
        )
    items = li.distinct()
    a = items.selectExpr("o", "p AS src")
    b = items.selectExpr("o", "p AS dst")
    return a.join(b, "o").filter("src < dst").select("src", "dst")


def scaled_trade_edges(spark, sf_dir: str, factor: int) -> DataFrame:
    """Customer↔supplier bipartite trade graph (contract-query
    construction), ×factor disjoint copies."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .selectExpr("o_custkey AS c", "l_suppkey AS s")
        .distinct()
    )
    if factor > 1:
        pairs = pairs.select(
            "c",
            "s",
            F.explode(F.expr(f"sequence(0, {factor - 1})")).alias("__c"),
        ).selectExpr("c + __c * 10000000 AS c", "s + __c * 10000000 AS s")
    return pairs.selectExpr("2 * c AS src", "2 * s + 1 AS dst")


def scaled_documents(spark, sf_dir: str, factor: int) -> DataFrame:
    """×factor perturbed document copies, ids offset by copy·10^7;
    each copy appends a per-copy suffix token so copies are near- (not
    exact-) duplicates and the shingle/length blocking structure stays
    realistic."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    if factor == 1:
        return docs
    return (
        docs.select(
            "doc_id",
            "text",
            F.explode(F.expr(f"sequence(0, {factor - 1})")).alias("__c"),
        )
        .selectExpr(
            "doc_id + __c * 10000000 AS doc_id",
            "CASE WHEN __c = 0 THEN text"
            " ELSE concat(text, ' copyvariant', CAST(__c AS STRING)) END"
            " AS text",
        )
    )


def main() -> None:
    factor = 10
    sf_dir = "/root/testdata/sf0.1"
    for a in sys.argv[1:]:
        if a.startswith("--factor="):
            factor = int(a.split("=", 1)[1])
        else:
            sf_dir = a

    from institutional_fx_etl_spark.operators.graph import (
        pagerank_fixed,
        triangle_count,
    )
    from institutional_fx_etl_spark.operators.similarity import (
        knn_join,
        lsh_ann_pairs,
        semdedup,
    )
    from institutional_fx_etl_spark.plans.driver_queries import _auto_cells

    spark = get_spark(app_name="bench_scale")
    out: dict[str, dict] = {}

    def run(name: str, fn) -> None:
        walls = {}
        for f in (1, factor):
            t0 = time.perf_counter()
            n = fn(f).count()
            walls[f"x{f}"] = round(time.perf_counter() - t0, 2)
            walls[f"rows_x{f}"] = n
        walls["wall_ratio"] = round(walls[f"x{factor}"] / max(walls["x1"], 1e-9), 1)
        out[name] = walls
        print(f"[scale:{name}] {walls}", flush=True)

    emb = {f: scaled_embeddings(spark, sf_dir, f) for f in (1, factor)}
    n_emb = {f: emb[f].count() for f in (1, factor)}
    run(
        "semdedup",
        lambda f: semdedup(emb[f], min_cosine=0.9, num_centroids=_auto_cells(n_emb[f])),
    )
    run(
        "knn_join",
        lambda f: knn_join(emb[f], k=3, num_centroids=_auto_cells(n_emb[f])),
    )
    # planes scale with n (auto_planes holds E[rows/bucket] constant);
    # round-7's ×10.6 wall at pinned planes=8 was the fixed-bucket
    # quadratic term, not the operator — this is the scale-correct call
    from institutional_fx_etl_spark.operators.similarity import auto_planes

    run(
        "lsh_ann_pairs",
        lambda f: lsh_ann_pairs(
            emb[f], min_cosine=0.3, num_planes=auto_planes(n_emb[f])
        ),
    )
    from institutional_fx_etl_spark.operators.dedup import (
        containment_pairs,
        editdistance_pairs,
    )

    docs = {f: scaled_documents(spark, sf_dir, f) for f in (1, factor)}
    run(
        "dedup_containment",
        lambda f: containment_pairs(docs[f], threshold=0.2),
    )
    run(
        "dedup_editdistance",
        lambda f: editdistance_pairs(docs[f]),
    )
    run(
        "pagerank_fixed",
        lambda f: pagerank_fixed(scaled_trade_edges(spark, sf_dir, f)),
    )
    run(
        "triangle_count",
        lambda f: triangle_count(scaled_copurchase_edges(spark, sf_dir, f)),
    )

    # round-9 additions: the new selection/eval family. All are
    # designed linear-in-n (scan maps + narrow aggregates); the probe
    # guards that no hidden quadratic term crept in.
    from institutional_fx_etl_spark.operators.selection import (
        linear_probe_score,
        quota_sample_exact,
    )
    from institutional_fx_etl_spark.operators.similarity import (
        kmeans_inertia,
    )
    from institutional_fx_etl_spark.operators.text import dup_span_coverage

    run(
        "dup_span_coverage",
        lambda f: dup_span_coverage(docs[f]),
    )
    run(
        "linear_probe_score",
        # deterministic label derived from the id so the ×10 corpus
        # keeps a fixed class balance
        lambda f: linear_probe_score(docs[f], "doc_id % 3 = 0"),
    )
    run(
        "quota_sample_exact",
        lambda f: quota_sample_exact(
            docs[f].selectExpr(
                "doc_id", "CAST(doc_id % 7 AS STRING) AS source"
            ),
        ),
    )
    run(
        "kmeans_inertia",
        lambda f: kmeans_inertia(emb[f], num_centroids=8),
    )
    from institutional_fx_etl_spark.operators.similarity import (
        embedding_decontaminate,
    )

    run(
        "embedding_decontaminate",
        # cells scale with the train side (pinned cells = quadratic
        # creep, the lsh_ann_pairs lesson; first probe measured 36.6×
        # at 8 pinned cells vs data ×10)
        lambda f: embedding_decontaminate(
            emb[f].filter("vec_id % 10 <> 0"),
            emb[f].filter("vec_id % 10 = 0"),
            min_cosine=0.35,
            num_centroids=_auto_cells(n_emb[f] * 9 // 10),
        ),
    )

    artifact = {"factor": factor, "sf_dir": sf_dir, "results": out}
    with open("BENCH_scale.json", "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps({"bench_scale": out}))


if __name__ == "__main__":
    raise SystemExit(main())
