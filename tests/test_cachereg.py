"""The bounded cache ledger (functions/cachereg.py): caller-owned
persists must not accumulate live InMemoryRelations without bound
across a long-lived session (r14 VERDICT item 3 / ADVICE)."""

import pyspark.sql.utils  # noqa: F401  (ensure session classes load)
from pyspark.storagelevel import StorageLevel

from institutional_fx_etl_spark.functions import cachereg
from institutional_fx_etl_spark.functions.cachereg import cached, release


def _fresh_ledger():
    cachereg._LEDGER.clear()


def test_ledger_caps_live_entries_and_evicts_lru(spark, monkeypatch):
    _fresh_ledger()
    monkeypatch.setattr(cachereg, "_CAP", 4)
    dfs = [
        cached(spark.range(1000 + i).selectExpr("id", f"id * {i + 1} AS v"))
        for i in range(7)
    ]
    assert cachereg.live_count() == 4
    # oldest three were evicted (storage level reset to NONE) ...
    for df in dfs[:3]:
        assert df.storageLevel == StorageLevel.NONE
    # ... newest four stay persisted
    for df in dfs[3:]:
        assert df.storageLevel != StorageLevel.NONE
    for df in dfs[3:]:
        release(df)
    assert cachereg.live_count() == 0


def test_reregistering_same_plan_refreshes_not_duplicates(spark, monkeypatch):
    _fresh_ledger()
    monkeypatch.setattr(cachereg, "_CAP", 4)
    a = cached(spark.range(50).selectExpr("id AS k"))
    n0 = cachereg.live_count()
    # an identical plan built twice is ONE ledger entry (plan-keyed,
    # like the cache manager itself) — warm re-invocations refresh
    # recency instead of growing the ledger
    b = cached(spark.range(50).selectExpr("id AS k"))
    assert cachereg.live_count() == n0
    # still persisted and correct either way
    assert b.count() == 50
    release(a)
    release(b)
    _fresh_ledger()


def test_eviction_is_performance_only(spark, monkeypatch):
    _fresh_ledger()
    monkeypatch.setattr(cachereg, "_CAP", 1)
    a = cached(spark.range(10).selectExpr("id AS x"))
    assert a.count() == 10
    b = cached(spark.range(20).selectExpr("id AS y"))  # evicts a
    assert a.storageLevel == StorageLevel.NONE
    # evicted relations recompute from lineage — identical results
    assert a.count() == 10
    assert b.count() == 20
    release(b)
    _fresh_ledger()
