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

Round 10 (r9 verdict asks #2/#5): every probe also records the
OUTPUT-normalized view — ``rows_ratio`` (output rows at ×F over ×1)
and ``wall_per_output_row_us`` — so an output-bound result like
lsh_ann_pairs (wall ×7 on output ×42) reads as the sub-linear result
it is, and ``tests/test_bench_scale_contract.py`` fails loudly when a
committed probe's wall ratio exceeds ``max(3, rows_ratio,
input_ratio)`` (input_ratio applies only to the declared INPUT_BOUND
scalar-aggregate probes). And a
``--skew=100`` mode runs the three scale-critical LLM ops
(minhash_lsh_pairs, semdedup, ivfpq_topk) at 100× under a REALISTIC
Zipfian-duplicate / hot-cluster generator — the regime where the
hot-bucket cap and the cell cap earn their keep — recording each
cap's hit-rate next to the wall.

Usage: python tools/bench_scale.py [--factor=10] [--skew=100] [sf_dir]
  (--skew runs ONLY the skewed 100× section, merging into the
   existing BENCH_scale.json)
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


def skewed_documents(spark, sf_dir: str, factor: int) -> DataFrame:
    """×factor document copies under a ZIPFIAN-DUPLICATE skew: 5% of
    all (doc, copy) slots collapse onto THREE boilerplate texts (the
    shared-footer / licence-block cohort every web crawl has — at
    ×100 on sf0.1 that is ~8k exact copies PER boilerplate, a hot LSH
    bucket two orders of magnitude over ``max_bucket``), the rest are
    per-copy near-duplicates. Deterministic (hash-gated), scan-side."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    boiler = (
        "CASE abs(hash(doc_id, __c)) % 3"
        " WHEN 0 THEN 'all rights reserved this content is provided"
        " as is without warranty of any kind express or implied'"
        " WHEN 1 THEN 'cookie policy we use cookies to improve your"
        " experience by continuing you agree to our terms of service'"
        " ELSE 'subscribe to our newsletter for the latest updates"
        " delivered straight to your inbox every single week' END"
    )
    return (
        docs.select(
            "doc_id",
            "text",
            F.explode(F.expr(f"sequence(0, {factor - 1})")).alias("__c"),
        )
        .selectExpr(
            "doc_id + __c * 10000000 AS doc_id",
            f"CASE WHEN abs(hash(doc_id, __c, 42)) % 100 < 5"
            f" THEN {boiler}"
            " WHEN __c = 0 THEN text"
            " ELSE concat(text, ' copyvariant', CAST(__c AS STRING)) END"
            " AS text",
        )
    )


def skewed_embeddings(spark, sf_dir: str, factor: int) -> DataFrame:
    """×factor embedding copies under HOT-CLUSTER skew: 80% of all
    rows collapse to a tiny neighborhood of four hot directions (the
    near-duplicate mass a crawl's template pages produce), 20% keep
    the perturbed original — so the id-seeded cells go massively
    uneven and the ``max_cell`` policy is what's actually measured."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    hot = (
        "transform(embedding, (x, j) -> CAST("
        " CASE abs(hash(vec_id, __c)) % 4"
        "  WHEN 0 THEN 0.8 + (abs(hash(vec_id, __c, j)) % 101) / 1000.0"
        "  WHEN 1 THEN -0.7 + (abs(hash(vec_id, __c, j)) % 101) / 1000.0"
        "  WHEN 2 THEN CASE WHEN j % 2 = 0 THEN 0.9 ELSE -0.9 END"
        "   + (abs(hash(vec_id, __c, j)) % 101) / 1000.0"
        "  ELSE CASE WHEN j % 3 = 0 THEN 1.0 ELSE 0.1 END"
        "   + (abs(hash(vec_id, __c, j)) % 101) / 1000.0"
        " END AS FLOAT))"
    )
    cold = (
        "transform(embedding, (x, j) -> CAST(x + (abs(hash(vec_id,"
        " __c, j)) % 2001 - 1000) / 10000.0 AS FLOAT))"
    )
    return (
        emb.select(
            "vec_id",
            "embedding",
            F.explode(F.expr(f"sequence(0, {factor - 1})")).alias("__c"),
        )
        .selectExpr(
            "vec_id + __c * 10000000 AS vec_id",
            f"CASE WHEN abs(hash(vec_id, __c, 7)) % 10 < 8"
            f" THEN {hot} ELSE {cold} END AS embedding",
        )
    )


#: probes whose OUTPUT is a scalar/fixed-size aggregate while their
#: WORK is provably linear in the scaled input (disjoint-copy graphs,
#: full-corpus scans): the output-normalized bound misreads them — a
#: count can't grow with the data — so the gate bounds their wall by
#: the INPUT ratio instead (still fails loudly on super-linear creep).
INPUT_BOUND = {"triangle_count", "kmeans_inertia", "zipf_token_fit"}


def _normalize(walls: dict, factor: int, name: str | None = None) -> None:
    """Attach the output-normalized view (r9 verdict ask #5): wall
    ratio alone misreads output-bound probes — lsh_ann_pairs' ×7 wall
    on ×42 output rows IS sub-linear work per pair."""
    rows_f, rows_1 = walls[f"rows_x{factor}"], walls["rows_x1"]
    walls["wall_ratio"] = round(
        walls[f"x{factor}"] / max(walls["x1"], 1e-9), 1
    )
    walls["rows_ratio"] = round(rows_f / max(rows_1, 1), 1)
    walls["wall_per_output_row_us"] = round(
        walls[f"x{factor}"] * 1e6 / max(rows_f, 1), 1
    )
    if name in INPUT_BOUND:
        walls["input_ratio"] = float(factor)


def run_skewed(spark, sf_dir: str, factor: int) -> dict:
    """The three scale-critical LLM ops at ×factor under realistic
    skew (r9 verdict ask #2), each with its cap hit-rate recorded —
    the 100-TB claim rests on the caps absorbing exactly this shape."""
    from institutional_fx_etl_spark.operators.dedup import (
        lsh_tuning_report,
        minhash_lsh_pairs,
    )
    from institutional_fx_etl_spark.operators.similarity import (
        ivfpq_topk,
        semdedup,
    )
    from institutional_fx_etl_spark.plans.driver_queries import _auto_cells

    out: dict[str, dict] = {}

    # persist the synthetic inputs: they stand in for a parquet table
    # a real job would scan with pushdown — unpersisted, every corpus
    # reference re-runs the hash-transform GENERATOR (ivfpq's probe
    # measured 110 s of which ~75 s was generator re-derivation), so
    # walls would grade the harness, not the operator
    docs = {
        f: skewed_documents(spark, sf_dir, f).persist()
        for f in (1, factor)
    }
    for d in docs.values():
        d.count()
    walls: dict = {}
    for f in (1, factor):
        t0 = time.perf_counter()
        n = minhash_lsh_pairs(docs[f], jaccard_threshold=0.5).count()
        walls[f"x{f}"] = round(time.perf_counter() - t0, 2)
        walls[f"rows_x{f}"] = n
    _normalize(walls, factor)
    # cap hit-rate from the certified tuning report (bands=4 is the
    # operator's banding): buckets dropped by max_bucket vs kept
    tuning = {
        r["bands"]: r for r in lsh_tuning_report(docs[factor]).collect()
    }
    cfg = tuning[4]
    walls["cap"] = {
        "max_bucket": 64,
        "n_hot_buckets_dropped": cfg["n_buckets"] and cfg["n_hot_buckets"],
        "n_buckets_kept": cfg["n_buckets"],
        "candidates_after_cap": cfg["n_candidates"],
        "note": "each boilerplate cohort lands ~8k docs per band"
        " bucket; the cap drops those buckets inside the discovering"
        " aggregate, so candidate volume stays #buckets*cap^2-bounded",
    }
    out["minhash_lsh_pairs_skew"] = walls
    print(f"[skew:minhash_lsh_pairs] {walls}", flush=True)
    for d in docs.values():
        d.unpersist()

    # round-12: prefix_filter_pairs under the same Zipfian-boilerplate
    # skew — the three hot boilerplate texts share EVERY shingle, so
    # every one of their shingles becomes a hot prefix bucket. Since
    # r12 the cap ESCALATES through dedup-collapse: hot-bucket docs
    # collapse to exact token-set cohort representatives before
    # generation, verified rep pairs expand back, and within-cohort
    # pairs stream from a distributed self-join — so rows_x100 now
    # INCLUDES the boilerplate cohorts' C(n,2) identity pairs (the
    # duplication-driven part of the skew is complete under the cap).
    # The near-duplicate 'copyvariant' cohorts are DISTINCT sets, so
    # their post-collapse buckets still exceed the cap and drop —
    # counted by prefix_filter_cap_report (never silent).
    from institutional_fx_etl_spark.operators.dedup import (
        prefix_filter_cap_report,
        prefix_filter_pairs,
    )

    docs2 = {
        f: skewed_documents(spark, sf_dir, f).persist()
        for f in (1, factor)
    }
    for d in docs2.values():
        d.count()
    walls = {}
    for f in (1, factor):
        t0 = time.perf_counter()
        n = prefix_filter_pairs(
            docs2[f], jaccard_threshold=0.5, shingle_n=3, max_bucket=64
        ).count()
        walls[f"x{f}"] = round(time.perf_counter() - t0, 2)
        walls[f"rows_x{f}"] = n
    _normalize(walls, factor)
    rep = prefix_filter_cap_report(
        docs2[factor], jaccard_threshold=0.5, shingle_n=3, max_bucket=64
    ).collect()[0]
    walls["cap"] = {
        "max_bucket": 64,
        "n_buckets_kept": rep["n_buckets_kept"],
        "n_hot_buckets_dropped": rep["n_hot_buckets_dropped"],
        "candidates_kept": rep["candidates_kept"],
        "candidates_dropped": rep["candidates_dropped"],
        "n_exact_cohorts": rep["n_exact_cohorts"],
        "n_collapsed_docs": rep["n_collapsed_docs"],
        "note": "r12 escalation: exact-duplicate cohorts collapse to"
        " representatives before generation and expand back, so the"
        " duplication-driven skew (the boilerplate cohorts) is"
        " COMPLETE under the cap (capped==uncapped property-gated);"
        " residual over-cap buckets hold >64 genuinely DISTINCT"
        " 'copyvariant' near-dup sets whose D^2 candidates drop with"
        " the accounting above",
    }
    out["prefix_filter_skew"] = walls
    print(f"[skew:prefix_filter] {walls}", flush=True)
    for d in docs2.values():
        d.unpersist()

    emb = {
        f: skewed_embeddings(spark, sf_dir, f).persist()
        for f in (1, factor)
    }
    n_emb = {f: emb[f].count() for f in (1, factor)}
    max_cell = 512
    walls = {}
    sd_out = {}
    for f in (1, factor):
        t0 = time.perf_counter()
        sd = semdedup(
            emb[f],
            min_cosine=0.9,
            num_centroids=_auto_cells(n_emb[f]),
            max_cell=max_cell,
        )
        sd.persist()
        n = sd.count()
        walls[f"x{f}"] = round(time.perf_counter() - t0, 2)
        walls[f"rows_x{f}"] = n
        sd_out[f] = sd
    _normalize(walls, factor)
    # cap hit-rate straight from the output: cells whose member count
    # exceeds max_cell skipped the in-cell compare (all kept)
    cells = (
        sd_out[factor]
        .groupBy("cid")
        .count()
        .selectExpr(
            "count(1) AS n_cells",
            f"SUM(CASE WHEN count > {max_cell} THEN 1 ELSE 0 END)"
            " AS n_capped",
            "max(count) AS max_cell_size",
        )
        .collect()[0]
    )
    walls["cap"] = {
        "max_cell": max_cell,
        "n_cells": cells["n_cells"],
        "n_cells_capped": cells["n_capped"],
        "max_cell_size": cells["max_cell_size"],
        "note": "80% of the corpus collapses onto 4 hot directions;"
        " capped cells skip the pairwise compare (recall traded for"
        " the #cells*max_cell^2 bound)",
    }
    for f in (1, factor):
        sd_out[f].unpersist()
    out["semdedup_skew"] = walls
    print(f"[skew:semdedup] {walls}", flush=True)

    # r12 verdict task #5: the ADC scan's skew exposure is now (a)
    # MEASURED — ivfpq_probe_report records the probed fraction and
    # the hot-cell ledger from the same assignment scan — and (b)
    # BOUNDABLE — max_cell skips probed cells over the cap (the
    # semdedup discipline), with recall of the capped vs uncapped
    # top-k recorded right here so the trade is never silent.
    from institutional_fx_etl_spark.operators.similarity import (
        ivfpq_probe_report,
    )

    walls = {}
    ivf_cap = max(512, (n_emb[1] * 2) // 8)  # ~an even 2-of-8 share
    for f in (1, factor):
        t0 = time.perf_counter()
        un = ivfpq_topk(emb[f], k=10, num_centroids=8, nprobe=2)
        un_ids = [r["id"] for r in un.collect()]
        walls[f"x{f}"] = round(time.perf_counter() - t0, 2)
        walls[f"rows_x{f}"] = len(un_ids)
        rep = ivfpq_probe_report(
            emb[f], num_centroids=8, nprobe=2, max_cell=ivf_cap
        ).collect()[0]
        t0 = time.perf_counter()
        cap_ids = [
            r["id"]
            for r in ivfpq_topk(
                emb[f], k=10, num_centroids=8, nprobe=2,
                max_cell=ivf_cap,
            ).collect()
        ]
        walls[f"capped_x{f}"] = round(time.perf_counter() - t0, 2)
        hits = len(set(un_ids) & set(cap_ids))
        walls[f"report_x{f}"] = {
            "probed_fraction": rep["probed_fraction"],
            "max_probed_cell": rep["max_probed_cell"],
            "n_probed_over_cap": rep["n_probed_over_cap"],
            "rows_skipped_by_cap": rep["rows_skipped_by_cap"],
            "capped_recall_vs_uncapped": round(
                hits / max(1, len(un_ids)), 3
            ),
        }
    _normalize(walls, factor)
    walls["cap"] = {
        "max_cell": ivf_cap,
        "note": "probed fraction + skip ledger from ivfpq_probe_report;"
        " capped scan skips over-cap probed cells (semdedup policy)"
        " with its recall vs the uncapped answer recorded per factor"
        " — under duplication-free direction skew the hot cell IS the"
        " nearest content, so the cap is a wall/recall dial, not free",
    }
    out["ivfpq_topk_skew"] = walls
    print(f"[skew:ivfpq_topk] {walls}", flush=True)

    # round-10 addition: hard_negatives under the same hot-cluster
    # skew — the label-masked Arrow kernel behind the max_cell cap
    from institutional_fx_etl_spark.operators.similarity import (
        hard_negatives,
    )

    walls = {}
    hn_out = {}
    for f in (1, factor):
        lab = emb[f].selectExpr(
            "vec_id", "embedding", "CAST(vec_id % 5 AS INT) AS label"
        )
        t0 = time.perf_counter()
        hn = hard_negatives(
            lab, k=3, num_centroids=_auto_cells(n_emb[f]),
            max_cell=max_cell,
        )
        hn.persist()
        n = hn.count()
        walls[f"x{f}"] = round(time.perf_counter() - t0, 2)
        walls[f"rows_x{f}"] = n
        hn_out[f] = hn
    _normalize(walls, factor)
    hn_cells = (
        hn_out[factor]
        .groupBy("vec_id")
        .count()
        .agg(
            F.expr("count(1) AS n_queries_served"),
        )
        .collect()[0]
    )
    walls["cap"] = {
        "max_cell": max_cell,
        "n_queries_served": hn_cells["n_queries_served"],
        "served_frac": round(
            hn_cells["n_queries_served"] / n_emb[factor], 3
        ),
        "note": "80% of rows collapse onto 4 hot directions; their"
        " cells exceed max_cell and skip mining (recall traded for"
        " the #cells*max_cell^2 bound) — served_frac is the honest"
        " coverage under this skew",
    }
    for f in (1, factor):
        hn_out[f].unpersist()
    out["hard_negatives_skew"] = walls
    print(f"[skew:hard_negatives] {walls}", flush=True)

    for d in emb.values():
        d.unpersist()
    return out




def run_breadth(spark, factor: int) -> dict:
    """Multi-symbol BREADTH probe (r11 verdict task #4): the 100 TB
    shape of the flagship pipeline is ~10^4 symbols x partition_cols,
    not one deep history. Run ``HybridMergerSpark(partition_cols=
    ('symbol',))`` at S and S*factor symbols with CONSTANT per-symbol
    rows — the embarrassingly-parallel claim
    (``plans/pipeline.py::HybridMergerSpark``) says wall tracks
    ~input, because every shuffle/window/spine keys on the symbol."""
    from institutional_fx_etl_spark.operators.ohlc import ticks_to_candles
    from institutional_fx_etl_spark.plans.pipeline import HybridMergerSpark

    base_epoch = 1_262_304_000  # 2010-01-01 UTC
    minutes = 720
    per_sym_ticks = 2_000

    def tick_stream(n_symbols: int, salt: int) -> DataFrame:
        n = n_symbols * per_sym_ticks
        return (
            spark.range(n)
            .select(
                F.concat(
                    F.lit("S"), (F.col("id") % n_symbols).cast("string")
                ).alias("symbol"),
                F.timestamp_seconds(
                    F.lit(base_epoch).cast("long")
                    + (F.abs(F.hash(F.col("id") + salt)) % (minutes * 60))
                ).alias("datetime"),
                (
                    1.30
                    + (F.abs(F.hash(F.col("id") + salt + 13)) % 10_000
                       - 5_000)
                    / 1_000_000.0
                ).alias("mid"),
            )
            .select(
                "symbol",
                "datetime",
                (F.col("mid") + 0.0001).alias("ask"),
                (F.col("mid") - 0.0001).alias("bid"),
            )
        )

    walls: dict = {}
    s0 = 10
    for f in (1, factor):
        n_sym = s0 * f
        ticks = tick_stream(n_sym, salt=0)
        m1 = ticks_to_candles(
            tick_stream(n_sym, salt=101), partition_cols=("symbol",)
        ).withColumn("spread", F.lit(None).cast("double"))
        eng = HybridMergerSpark(
            spike_threshold=1e9,
            consensus_threshold=50.0,
            partition_cols=("symbol",),
        )
        t0 = time.perf_counter()
        final, _ = eng.run(m1, ticks)
        n_rows = final.count()
        walls[f"x{f}"] = round(time.perf_counter() - t0, 2)
        walls[f"rows_x{f}"] = n_rows
        walls[f"symbols_x{f}"] = n_sym
    _normalize(walls, factor)
    walls["input_ratio"] = float(factor)
    walls["note"] = (
        "constant per-symbol rows (2k ticks / 720 min spine), symbols"
        f" {s0} -> {s0 * factor}; every exchange keys on symbol so the"
        " wall should track input, not symbols^2 — the embarrassingly-"
        "parallel breadth claim of partition_cols"
    )
    print(f"[breadth:hybrid_pipeline_multisym] {walls}", flush=True)
    return walls


def main() -> None:
    factor = 10
    skew = 0
    sf_dir = "/root/testdata/sf0.1"
    for a in sys.argv[1:]:
        if a.startswith("--factor="):
            factor = int(a.split("=", 1)[1])
        elif a.startswith("--skew="):
            skew = int(a.split("=", 1)[1])
        else:
            sf_dir = a

    breadth = 0
    for a in sys.argv[1:]:
        if a.startswith("--breadth="):
            breadth = int(a.split("=", 1)[1])
    if breadth:
        spark = get_spark(app_name="bench_scale_breadth")
        b_out = run_breadth(spark, breadth)
        try:
            artifact = json.load(open("BENCH_scale.json"))
        except FileNotFoundError:
            artifact = {"factor": factor, "sf_dir": sf_dir, "results": {}}
        artifact["breadth_factor"] = breadth
        artifact["breadth_results"] = {"hybrid_pipeline_multisym": b_out}
        with open("BENCH_scale.json", "w") as fh:
            json.dump(artifact, fh, indent=1)
        print(json.dumps({"bench_scale_breadth": b_out}))
        return

    if skew:
        spark = get_spark(app_name="bench_scale_skew")
        skew_out = run_skewed(spark, sf_dir, skew)
        try:
            artifact = json.load(open("BENCH_scale.json"))
        except FileNotFoundError:
            artifact = {"factor": factor, "sf_dir": sf_dir, "results": {}}
        artifact["skew_factor"] = skew
        artifact["skew_results"] = skew_out
        with open("BENCH_scale.json", "w") as fh:
            json.dump(artifact, fh, indent=1)
        print(json.dumps({"bench_scale_skew": skew_out}))
        return

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
        _normalize(walls, factor, name)
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

    # round-10 additions: the wave-1/2 training-data ops. Documents
    # reuse the perturbed-copy generator; record_linkage gets ×factor
    # DISJOINT blocking keys (more data ⇒ more blocks — the operator's
    # stated scale assumption; within-block growth is what max_block
    # caps) so the probe measures the linear regime.
    from institutional_fx_etl_spark.operators.dedup import (
        record_linkage_fs,
    )
    from institutional_fx_etl_spark.operators.selection import kfold_assign
    from institutional_fx_etl_spark.operators.similarity import (
        bitext_margin,
        hard_negatives,
    )
    from institutional_fx_etl_spark.operators.text import (
        boilerplate_purge,
        corpus_diversity,
        perplexity_buckets,
        zipf_token_fit,
    )

    run("boilerplate_purge", lambda f: boilerplate_purge(docs[f]))
    run(
        "perplexity_buckets",
        lambda f: perplexity_buckets(
            docs[f], lang_expr="CAST(doc_id % 5 AS STRING)"
        ),
    )
    run(
        "kfold_assign",
        lambda f: kfold_assign(
            docs[f], k=5, stratum_expr="CAST(doc_id % 7 AS STRING)"
        ),
    )
    run("zipf_token_fit", lambda f: zipf_token_fit(docs[f]))
    run(
        "corpus_diversity",
        # groups scale with the corpus (a source catalog grows with
        # data); per-group sample stays bounded
        lambda f: corpus_diversity(
            docs[f].selectExpr(
                "doc_id", "text",
                f"CAST(doc_id % {20 * f} AS STRING) AS source",
            )
        ),
    )
    run(
        "bitext_margin",
        lambda f: bitext_margin(
            emb[f], side_expr="vid % 2 = 0", k=4,
            num_centroids=_auto_cells(n_emb[f]),
        ),
    )
    run(
        "hard_negatives",
        lambda f: hard_negatives(
            emb[f].selectExpr(
                "vec_id", "embedding", "CAST(vec_id % 5 AS INT) AS label"
            ),
            k=3,
            num_centroids=_auto_cells(n_emb[f]),
        ),
    )

    def scaled_customers(f: int) -> DataFrame:
        cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
            "c_custkey", "c_name", "c_nationkey", "c_acctbal",
            "c_mktsegment",
        )
        if f == 1:
            return cust
        return cust.select(
            "*", F.explode(F.expr(f"sequence(0, {f - 1})")).alias("__c")
        ).selectExpr(
            "c_custkey + __c * 10000000 AS c_custkey",
            "c_name",
            "c_nationkey + __c * 25 AS c_nationkey",
            "c_acctbal",
            "c_mktsegment",
        )

    run(
        "record_linkage_fs",
        lambda f: record_linkage_fs(
            scaled_customers(f),
            id_col="c_custkey",
            block_expr="c_nationkey",
            fields=[
                ("seg", "c_mktsegment", 0.9375),
                ("bal", "CAST(floor(c_acctbal / 1000.0) AS INT)", 0.875),
                ("nsx", "right(c_name, 2)", 0.75),
            ],
            # the review queue scales with the corpus: work here is
            # candidate-bound (10× blocks), not output-bound, so a
            # pinned top-N would misread the linear regime as a wall
            # blowup on a 1× output
            top_n=200 * f,
        ),
    )

    # round-11 additions: the new selection/graph/text ops. kcenter is
    # k distributed scans (linear ×k); label_prop is 3 join+agg rounds
    # (linear in edges); KL is one tokenize pass + vocab-bounded tail;
    # the incremental-SemDeDup probe measures the REAL claim — update
    # cost tracks the batch's cells, not the corpus — by timing the
    # incremental path against the full rebuild on the same ×factor
    # corpus (old = ids below the batch cut, new = the rest).
    from institutional_fx_etl_spark.operators.graph import (
        label_prop_communities,
    )
    from institutional_fx_etl_spark.operators.selection import (
        kcenter_select,
    )
    from institutional_fx_etl_spark.operators.similarity import (
        semdedup_incremental,
    )
    from institutional_fx_etl_spark.operators.text import (
        ngram_kl_divergence,
    )

    run("kcenter_select", lambda f: kcenter_select(emb[f], k=6, seed_id=0))
    run(
        "kl_source_divergence",
        lambda f: ngram_kl_divergence(
            docs[f].selectExpr(
                "doc_id", "text",
                f"CAST(doc_id % {20 * f} AS STRING) AS source",
            )
        ),
    )
    run(
        "label_prop_communities",
        lambda f: label_prop_communities(
            scaled_copurchase_edges(spark, sf_dir, f)
        ),
    )

    # incremental-vs-rebuild at ×factor (not a run() probe: the
    # comparison is update wall ÷ rebuild wall on the SAME corpus)
    walls = {}
    for f in (1, factor):
        corpus = emb[f].persist()
        n = corpus.count()
        # append-only batch cut (the operator CONTRACT since the
        # validation landed: max(old id) < min(new id)) — the last
        # ~10% of the id range is the delivered batch, the rest the
        # standing corpus; the old modulo split violated append-only
        # and the probe crashed on the contract check
        mx = corpus.agg(F.expr("max(vec_id)")).collect()[0][0]
        cut = (int(mx) * 9) // 10
        old = corpus.filter(f"vec_id < {cut}").persist()
        new = corpus.filter(f"vec_id >= {cut}").persist()
        cells = _auto_cells(n)
        t0 = time.perf_counter()
        semdedup(old.unionByName(new), min_cosine=0.9, num_centroids=cells).count()
        rebuild = time.perf_counter() - t0
        from institutional_fx_etl_spark.operators.similarity import semdedup as _sd

        standing = _sd(old, min_cosine=0.9, num_centroids=cells)
        standing = standing.persist()
        standing.count()  # the standing state a real pipeline holds
        t0 = time.perf_counter()
        semdedup_incremental(
            old, new, old_result=standing, min_cosine=0.9,
            num_centroids=cells,
        ).count()
        update = time.perf_counter() - t0
        walls[f"rebuild_x{f}"] = round(rebuild, 2)
        walls[f"update_x{f}"] = round(update, 2)
        walls[f"update_over_rebuild_x{f}"] = round(
            update / max(rebuild, 1e-9), 2
        )
        for d in (corpus, old, new, standing):
            d.unpersist()
    print(f"[scale:semdedup_incremental] {walls}", flush=True)

    # incremental probe lives OUTSIDE results: its contract is
    # update ≪ rebuild, not the ×factor wall-vs-output bound the
    # normalized probes carry (test_bench_scale_contract.py)
    artifact = {
        "factor": factor,
        "sf_dir": sf_dir,
        "results": out,
        "incremental_results": {"semdedup_incremental_vs_rebuild": walls},
    }
    try:  # keep an existing skewed-100× section across 10× reruns
        prior = json.load(open("BENCH_scale.json"))
        for k in ("skew_factor", "skew_results"):
            if k in prior:
                artifact[k] = prior[k]
    except (FileNotFoundError, json.JSONDecodeError):
        pass
    with open("BENCH_scale.json", "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps({"bench_scale": out}))


if __name__ == "__main__":
    raise SystemExit(main())
