"""Generate PLANS.md: the formatted physical plans of the flagship
queries, so plan quality (pushdown, pruning, join strategies, exchange
counts) is reviewable without running Spark.

Usage: python tools/explain_report.py
"""

from __future__ import annotations

import contextlib
import io
import re
import sys
from collections import Counter

sys.path.insert(0, ".")

from institutional_fx_etl_spark import get_spark  # noqa: E402
from institutional_fx_etl_spark.plans.driver_queries import REGISTRY  # noqa: E402

REPORT_QUERIES = [
    "hybrid_pipeline",
    "hybrid_pipeline_chunked",
    "hybrid_pipeline_multisym",
    "tumbling_ohlc",
    "groupby_agg",
    "dedup_minhash_lsh",
    "corpus_pipeline",
    "range_join_banded",
    "skew_salted_agg",
    "tfidf_topterms",
    "ann_topk",
    "doc_packing",
    "equidepth_histogram",
    "linear_interpolate",
    "dedup_containment",
    "ks_two_sample",
    "cusum_changepoint",
    "fuzzy_lookup_join",
    "hll_estimate",
    "assoc_rules",
    "triangle_count",
    "mixture_sampling",
    "dsir_weights",
    "semdedup",
    "lsh_ann_pairs_scaled",
    "curriculum_order",
    "token_budget_fit",
    "ngram_novelty",
    "emb_pca_power",
    "linear_probe_score",
    "dup_span_coverage",
    "quota_sample_exact",
    "embedding_decontaminate",
    # round-10 family
    "boilerplate_purge",
    "perplexity_buckets",
    "kfold_assign",
    "record_linkage_fs",
    "bitext_margin",
    "hard_negatives",
]

SF = "/root/testdata/sf0.1"

#: per-section caveats rendered under the operator counts
NOTES = {
    "linear_probe_score": (
        "Train + score + exact top-take: the GD steps sync a "
        "(buckets+1)-row parameter vector through the driver (the "
        "bounded transfer every distributed trainer makes); selection "
        "rank comes from a score HISTOGRAM plus one boundary-tie "
        "window — the corpus is never globally sorted. The lone "
        "single-partition window in this plan runs on the histogram "
        "(distinct scores), not the corpus."
    ),
    "quota_sample_exact": (
        "Largest-remainder quotas computed on the source-cardinality "
        "relation (its ordering window is group-level, bounded); the "
        "corpus sees one group-partitioned rank window over (id, "
        "draw) rows — payloads never shuffle."
    ),
    "embedding_decontaminate": (
        "Both tables assign to ONE shared centroid set, so the "
        "cross-table compare joins on the cell id — Σ|train_cell|·"
        "|test_cell|, never |train|·|test|."
    ),
    "dedup_containment": (
        "Grouped candidate stage: NO join anywhere — one exchange to "
        "shingle groups (df cap in the same aggregate), a cheap "
        "round-robin re-spread of the bounded group arrays (round 8: "
        "AQE's pre-explode coalesce had serialized the C(df,2) pair "
        "fan-out), in-array ordered pair emission, one exchange to "
        "pair counts. Was a 4-exchange posting self-join."
    ),
    "fuzzy_lookup_join": (
        "Capped trigram posting generates CANDIDATES ONLY (round 8): "
        "survivors re-score exactly against the full trigram arrays, "
        "so the hot cap can never flip the argmax; the oracle mirrors "
        "the df>cap stoplist as the candidate rule."
    ),
    "triangle_count": (
        "Edge-iterator regime (round 8, ≤ broadcast cap): the degree-"
        "ordered out-adjacency broadcasts onto both endpoints and "
        "array_intersect counts run scan-side — zero wedge rows. "
        "Above the cap: the SAME edge-iterator, with the out-adjacency "
        "shuffled onto both endpoints instead of broadcast (see "
        "operators/graph.py — the intersections still run scan-side)."
    ),
    "mixture_sampling": (
        "Corpus mixing as a scan decoration: ONE tiny per-source "
        "aggregate, rates broadcast back, md5 Bernoulli filter "
        "scan-side — the corpus itself never shuffles."
    ),
    "semdedup": (
        "Round 9: the in-cell compare is the Arrow drop-set kernel "
        "(FlatMapGroupsInPandas per cell, bit-identical to the SQL "
        "self-join twin which stays forceable via "
        "pair_strategy='sql') — the Σ|cell|²·d interpreted-HOF dot "
        "was the operator's cost center, same as knn_join's round-8 "
        "win. Cell assignment remains one broadcast/literal pass."
    ),
    "lsh_ann_pairs_scaled": (
        "The production ANN shape: plane count DERIVED from corpus "
        "size (auto_planes — Σ|bucket|² stays linear in n); one "
        "bucket-keyed self-join on normalized vectors, no other "
        "corpus shuffle. The pinned-planes demo query certifies the "
        "constant-plane oracle; this one certifies the knob."
    ),
    "curriculum_order": (
        "Stage thresholds come from the BOUNDED score histogram "
        "(the single-partition window is over distinct scores, not "
        "documents — same acceptance as ks_two_sample's offsets); "
        "the corpus takes one scan plus one (stage, shard)-keyed "
        "ranking window over (id, draw) pairs."
    ),
    "token_budget_fit": (
        "ONE corpus aggregate (per-source totals); every "
        "water-filling step — ranked cumsum, crossing rank, cap + "
        "remainder — runs on the bounded source dimension, so the "
        "single-partition windows hold #sources rows."
    ),
    "ngram_novelty": (
        "Shuffles carry 8-byte shingle hashes only: explode → "
        "groupBy(hash) first-owner → hash-keyed join back "
        "(co-partitioned, no extra exchange) → per-doc aggregate."
    ),
    "emb_pca_power": (
        "Corpus touched ONCE (integer Gram partials, one partial row "
        "per Arrow batch); the three unrolled iterations join/agg the "
        "d² matrix rows — data-size-independent. Iterates are "
        "micro-quantized so both engines walk identical integers."
    ),
    "dsir_weights": (
        "One explode feeds the bucket-distribution aggregate "
        "(buckets rows, broadcast back) and the (doc, bucket) count "
        "matrix; only (id, bucket, count) triples shuffle — text "
        "never leaves the scan."
    ),
    "ks_two_sample": (
        "Distributed exact ECDF: the only SinglePartition exchanges "
        "feed the BUCKET-count-sized offset table and the one-row "
        "totals; the per-value cumulative window is partitioned by "
        "range bucket with offsets broadcast back."
    ),
    "cusum_changepoint": (
        "Two-level day-bucket prefix: ZERO SinglePartition exchanges "
        "— data-grain windows partition by (group, bucket), the "
        "rollup windows by group over one-row-per-bucket relations, "
        "offsets broadcast back (machine-gated in "
        "test_round7b_ops.py)."
    ),
    "hll_estimate": (
        "Sketch shape: the registers aggregate bounds the shuffle at "
        "groups·m rows; the harmonic sum is an exact scaled-BIGINT "
        "aggregate, so no recombination drift at any parallelism."
    ),
    "assoc_rules": (
        "In-array pair emission from one groupBy-transaction "
        "exchange; item supports broadcast onto the AGGREGATED pair "
        "relation — no self-join of the basket relation. The one "
        "SinglePartition exchange is the N-transactions scalar "
        "(partial counts only — one row per task crosses it)."
    ),
    "hybrid_pipeline": (
        "The one `Exchange SinglePartition` feeds the single-symbol "
        "whole-series windows — the reference's semantics. Above the "
        "size crossover, `HybridMergerSpark.merge` (engine='auto') "
        "routes to the fused chunked engine below, which has no "
        "full-row single-partition stage (150-year proof: "
        "`tools/scale_sanity.py --years=150 --engine=auto`)."
    ),
    "hybrid_pipeline_chunked": (
        "LAZY plan (`materialize=False`): shared stages are inlined "
        "once per reference, so operator counts here are the SUM over "
        "duplicated subtrees. The EXECUTED path cuts them with 2 "
        "localCheckpoints — 3 full-row hash exchanges total "
        "(consensus join, pass-1 padded window, pass-2 survivor "
        "window). Every `Exchange SinglePartition` below feeds only "
        "C-row chunk-summary windows (`__cidx` ordering), never "
        "full-row datetime sorts — machine-asserted in "
        "tests/test_chunked.py."
    ),
    "incremental_recompute": (
        "The per-update windowed recompute of plans/incremental.py, "
        "built lazy like the section above (same duplicated-subtree "
        "caveat): the fused engine over a day-bounded slice, with the "
        "full-history scalars injected as a broadcast 1-row literal "
        "and the day filters pushed into both scans."
    ),
    "corpus_pipeline": (
        "The connected-components label frame enters checkpointed "
        "(lineage cut at loop exit), so the plan shows only the "
        "post-CC stages; per-round shape is one join + one aggregate, "
        "flatness asserted in tests/test_plans.py."
    ),
    "ann_topk": (
        "Two-level top-k (r4 ask #7): the first Window prunes per "
        "(q_id, scan-partition id) behind a balanced composite-key "
        "exchange, so the global per-query ranking window ingests at "
        "most partitions×k rows per query — never the whole scored "
        "corpus. Gated in tests/test_plans.py."
    ),
    "doc_packing": (
        "The packing prefix sum runs as one window PER md5 SHARD — "
        "the only exchange hashes on the shard key, so the inherently "
        "sequential cumsum parallelizes across 64 shards instead of a "
        "global single-partition ordering."
    ),
    "equidepth_histogram": (
        "No ntile: interpolated-percentile boundaries from one "
        "aggregate broadcast back onto the scan, bucket assignment "
        "scan-side, then one hash aggregate — no per-group full sort "
        "in a single window partition."
    ),
    "linear_interpolate": (
        "Two running-last windows (ASC + DESC) over the same "
        "partitioning — no currentRow..unboundedFollowing shrinking "
        "frame (WindowExec re-scans those to the partition end per "
        "row), no self-join against the non-null subset. The one "
        "`Exchange SinglePartition` is the single global series "
        "(reference semantics, same caveat as hybrid_pipeline); "
        "per-key series pass partition_cols and the windows run "
        "per key."
    ),
    "boilerplate_purge": (
        "Doc frequency is ONE hash aggregate over DISTINCT "
        "(digest, doc) pairs — partial aggregation collapses a "
        "document's internal repeats before the exchange, so a hot "
        "boilerplate digest reduces as one row per doc; verdicts "
        "join back on the 32-byte digest and the per-doc regroup is "
        "bounded by each document's own segment count."
    ),
    "perplexity_buckets": (
        "No per-language global sort: ranks come from a "
        "(lang, score) histogram window (bounded by distinct scores "
        "per language) plus a row_number inside each tie group — the "
        "heavy window keys are (lang, score) pairs, never a whole "
        "language."
    ),
    "kfold_assign": (
        "The only row-level window partitions by (stratum, md5 "
        "2-hex-prefix) — 256-way parallel even when one stratum is "
        "the whole corpus; global md5-order ranks reassemble from "
        "the tiny (stratum x 256) offset relation broadcast."
    ),
    "record_linkage_fs": (
        "Candidate pairs come from the block-keyed self-join (never "
        "all-pairs; max_block caps degenerate keys); u-probability "
        "weights are a 1-row broadcast; top-N is "
        "TakeOrderedAndProject, not a global sort."
    ),
    "bitext_margin": (
        "Default regime is the all-in-one per-cell Arrow kernel "
        "(ArrowEvalPython/FlatMapGroupsInPandas over cid): the "
        "sum|A|x|B| pair relation never materializes — the kernel "
        "emits |A| best-margin rows per cell. The 'sql' twin (pair "
        "join + two rank windows + margin join) is the equality "
        "gate's reference."
    ),
    "hard_negatives": (
        "Label-masked per-cell Arrow kernel (same discipline as "
        "knn_join's): same-label columns drop to -inf before the "
        "stable top-k, so ranks are over negatives only; cells come "
        "from the scan-side centroid assignment and max_cell caps "
        "hot cells."
    ),
}


def main() -> None:
    spark = get_spark(app_name="explain_report")
    out = [
        "# PLANS — physical plans of the flagship queries (sf0.1)",
        "",
        "Generated by `tools/explain_report.py`. Summary counts first,",
        "then the formatted plan per query.",
        "",
    ]
    for name in [*REPORT_QUERIES, "incremental_recompute"]:
        if name == "incremental_recompute":
            # the incremental update's windowed recompute, built LAZY:
            # merge_fused over a day-bounded slice with the full-history
            # scalars injected as a 1-row literal (exactly what
            # plans/incremental.py runs per update) — the plan shows
            # the fused engine shape plus the day partition filters
            from pyspark.sql import functions as F

            from institutional_fx_etl_spark.plans.driver_queries import (
                _pipeline_inputs,
            )
            from institutional_fx_etl_spark.plans.pipeline import (
                HybridMergerSpark,
            )
            from institutional_fx_etl_spark.plans.pipeline_fused import (
                merge_fused,
            )

            m1, ticks = _pipeline_inputs(spark, SF)
            eng = HybridMergerSpark(spike_threshold=1e9, consensus_threshold=50.0)
            scalars = spark.range(1).select(
                F.lit(0.02).cast("double").alias("__med"),
                F.lit(1000).cast("long").alias("__ntick"),
                F.lit(0).cast("int").alias("__anyfix"),
            )
            cut = "2024-06-01"
            df, _ = merge_fused(
                m1.filter(F.to_date("datetime") >= F.lit(cut)),
                eng.resample_ticks(ticks).filter(
                    F.to_date("datetime") >= F.lit(cut)
                ),
                spike_threshold=1e9,
                consensus_threshold=50.0,
                chunk_seconds=6 * 3600,
                materialize=False,
                scalars_override=scalars,
            )
        elif name == "hybrid_pipeline_chunked":
            # build the LAZY variant: the executing path's stage
            # checkpoints would hide everything upstream of the last
            # stage from the plan
            from institutional_fx_etl_spark.plans.driver_queries import (
                _pipeline_inputs,
            )
            from institutional_fx_etl_spark.plans.pipeline import (
                HybridMergerSpark,
            )
            from institutional_fx_etl_spark.plans.pipeline_fused import (
                merge_fused,
            )

            m1, ticks = _pipeline_inputs(spark, SF)
            eng = HybridMergerSpark(spike_threshold=1e9, consensus_threshold=50.0)
            df, _ = merge_fused(
                m1,
                eng.resample_ticks(ticks),
                spike_threshold=1e9,
                consensus_threshold=50.0,
                chunk_seconds=6 * 3600,
                materialize=False,
            )
        else:
            df = REGISTRY[name][0](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        counts = Counter(
            re.findall(
                r"\b(Exchange hashpartitioning|Exchange SinglePartition|"
                r"BroadcastExchange|Window|SortMergeJoin|BroadcastHashJoin|"
                r"HashAggregate)\b",
                plan,
            )
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        out.append(f"## {name}")
        out.append("")
        out.append(
            "**operator counts:** "
            + ", ".join(f"{k}×{v}" for k, v in sorted(counts.items()))
        )
        out.append("")
        if name in NOTES:
            out.append(NOTES[name])
            out.append("")
        out.append("```")
        # the node tree (before the 'detail' section) is the readable
        # part; cap pathological trees (iterative lineages) at 120 lines
        formatted = buf.getvalue().split("\n\n")[0].strip().splitlines()
        if len(formatted) > 120:
            formatted = formatted[:120] + [f"... ({len(formatted) - 120} more lines)"]
        out.extend(formatted)
        out.append("```")
        out.append("")
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(out)} lines)")


if __name__ == "__main__":
    main()
