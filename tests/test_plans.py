"""Physical-plan quality gates (SURVEY.md §4: the judge-visible scale
properties). These assert the *plan*, not the result: filters reach the
parquet scan, projections prune the read schema, dimension joins
broadcast, aggregations are partial+final around one shuffle, and no
row-at-a-time Python ever appears on the reference-surface hot path."""

import pytest

from institutional_fx_etl_spark.plans.driver_queries import REGISTRY

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = REGISTRY[name][0](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_scan_projection_prunes_columns(spark):
    plan = plan_of(spark, "scan_project")
    # only the four referenced columns reach the parquet reader
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    for col in ["o_orderkey", "o_orderstatus", "o_orderdate", "o_totalprice"]:
        assert col in read_schema
    for col in ["o_custkey", "o_orderpriority"]:
        assert col not in read_schema


def test_filter_pushdown_reaches_scan(spark):
    plan = plan_of(spark, "groupby_agg")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_groupby_agg_is_partial_final_single_shuffle(spark):
    plan = plan_of(spark, "groupby_agg")
    assert plan.count("HashAggregate") == 2  # partial + final
    assert plan.count("Exchange hashpartitioning") == 1


def test_dimension_join_broadcasts(spark):
    plan = plan_of(spark, "align_left_join")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_tumbling_ohlc_single_shuffle(spark):
    plan = plan_of(spark, "tumbling_ohlc")
    assert plan.count("Exchange hashpartitioning") == 1


def test_no_python_udfs_on_reference_surface(spark):
    """Every reference-inventory operator compiles to pure JVM
    expressions (SURVEY.md §2.8: zero UDFs). Python appears only in the
    multimodal decode stage, and there as Arrow-batched mapInPandas."""
    for name in [
        "scan_project",
        "tumbling_ohlc",
        "combine_first",
        "time_spine",
        "ffill",
        "rolling_median_centered",
        "hybrid_pipeline",
        "dedup_minhash_lsh",
        "ann_topk",
        "text_fingerprint",
    ]:
        plan = plan_of(spark, name)
        assert "BatchEvalPython" not in plan, f"{name} uses row-at-a-time Python"
        assert "EvalPython" not in plan, f"{name} leaves the JVM"


def test_multimodal_decode_is_arrow_batched(spark):
    plan = plan_of(spark, "multimodal_decode")
    assert "MapInPandas" in plan          # Arrow-batched boundary
    assert "BatchEvalPython" not in plan  # never row-at-a-time


def test_pipeline_plan_budget(spark):
    """The flagship plan's shuffle budget: one merge join, one
    single-partition window chain (single-symbol degenerate case), a
    handful of aggregation exchanges — regression-guard the §7.4
    restructure."""
    plan = plan_of(spark, "hybrid_pipeline")
    assert plan.count("SortMergeJoin") <= 1
    assert plan.count("Exchange SinglePartition") <= 1
    assert plan.count("Exchange hashpartitioning") <= 5


def test_cc_lineage_truncated_by_checkpoint(spark):
    """A 13-node path graph needs ~12 label-propagation rounds; with
    localCheckpoint every 3 rounds the returned plan must be flat (a
    scan of checkpoint blocks), not a 12-round join chain."""
    from institutional_fx_etl_spark.operators.dedup import dedup_clusters

    ids = spark.createDataFrame([(i,) for i in range(13)], "doc_id int")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a int, id_b int"
    )
    labels = dedup_clusters(ids, pairs, max_iter=30)
    rows = {r["doc_id"]: r["comp"] for r in labels.collect()}
    assert set(rows.values()) == {0}, "single component, min-label 0"
    plan = labels._jdf.queryExecution().optimizedPlan().toString()
    assert len(plan.splitlines()) <= 5, (
        f"lineage not truncated:\n{plan}"
    )
