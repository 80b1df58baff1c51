"""Market-basket association mining — pairwise support / confidence /
lift over a (transaction, item) relation.

Reference parity: the reference engine ships no basket miner; this is
part of the analytics widening the 100 TB engine needs (affinity
analysis over order lines, co-occurring error codes, co-read corpora).
The shape mirrors the engine's other pair miners
(``dedup.containment_pairs``): ONE groupBy-transaction shuffle collects
each basket as a sorted in-row array, pairs are emitted inside the row
(no self-join, no join-key skew), and the pair fan-out is bounded by
Σ C(|basket|, 2) — basket size is physically bounded (an order has a
handful of lines), so candidate volume is linear in transactions, never
n² in items.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from institutional_fx_etl_spark.functions.cachereg import cached, cached_deser, cached_disk


def basket_assoc_rules(
    df: DataFrame,
    txn_col: str,
    item_col: str,
    min_pair_count: int = 2,
    max_basket: int = 1024,
    broadcast_supports: bool = True,
) -> DataFrame:
    """Pairwise association rules A→B over transactions.

    For every unordered item pair {a, b} (a < b) co-occurring in at
    least ``min_pair_count`` transactions:

    - ``pair_orders``  — transactions containing both,
    - ``orders_a/b``   — transactions containing each item,
    - ``confidence_ab`` = pair/orders_a (the rule a→b),
    - ``confidence_ba`` = pair/orders_b,
    - ``lift``          = pair·N / (orders_a·orders_b).

    Plan: dedup to distinct (txn, item) → groupBy txn collecting the
    sorted item array (baskets larger than ``max_basket`` are dropped
    in the same aggregate — a "transaction" touching 10^5 items is a
    degenerate feed artifact whose C(n,2) fan-out would dominate the
    stage, same cap discipline as the LSH hot-bucket cap) → in-array
    combination emit (id_a < id_b by construction) → one pair-count
    aggregate. Item supports are a second narrow aggregate joined back
    (items are a bounded dimension — broadcast); N is a one-row scalar
    broadcast. All counts integer; the three ratios divide exact
    BIGINTs once at the end, mirrored verbatim in the oracle.
    

    Eager note: BUILDING this plan launches Spark jobs — internal
    persist + count() barriers materialize shared subtrees race-free
    at construction time (r14 ADVICE; the caches are plan-keyed and
    ledger-bounded, functions/cachereg.py).
    """
    from pyspark.storagelevel import StorageLevel

    basket = df.selectExpr(
        f"{txn_col} AS txn", f"{item_col} AS item"
    ).distinct()
    # r14: the distinct basket relation feeds THREE consumers (the
    # basket grouping, the item supports, the transaction total) and
    # exchange reuse did NOT dedup the distinct across them under AQE
    # (profiled: two identical 6.2 MB map stages per pass) — persist +
    # count barrier materializes it once; key-only rows, cheap cache.
    basket = basket.transform(cached)
    basket.count()
    # distinct() already shuffles on (txn, item); the basket grouping
    # re-shuffles on txn only — both narrow key-only rows.
    groups = (
        basket.groupBy("txn")
        .agg(F.collect_list("item").alias("m"))
        .filter(f"size(m) BETWEEN 2 AND {max_basket}")
        .selectExpr("array_sort(m) AS m")
    )
    pairs = (
        groups.selectExpr(
            "explode(flatten(transform(m, (x, i) ->"
            " transform(slice(m, i + 2, size(m) - i - 1), y ->"
            " struct(x AS id_a, y AS id_b))))) AS p"
        )
        .groupBy("p.id_a", "p.id_b")
        .agg(F.count(F.lit(1)).alias("pair_orders"))
        .filter(f"pair_orders >= {min_pair_count}")
    )
    supports = basket.groupBy("item").agg(
        F.count(F.lit(1)).alias("item_orders")
    )
    total = basket.agg(
        F.countDistinct("txn").cast("bigint").alias("n_txn")
    )
    # item supports: one row per distinct item. Catalog-sized item
    # dimensions broadcast (the default); an unbounded item universe
    # (e.g. items are document shingles) sets broadcast_supports=False
    # and the two lookups become key-partitioned shuffle joins on the
    # already-aggregated pair relation.
    sup = (lambda c: F.broadcast(c)) if broadcast_supports else (lambda c: c)
    return (
        pairs.join(
            sup(supports.selectExpr("item AS id_a", "item_orders AS orders_a")),
            "id_a",
        )
        .join(
            sup(supports.selectExpr("item AS id_b", "item_orders AS orders_b")),
            "id_b",
        )
        .crossJoin(F.broadcast(total))
        .selectExpr(
            "id_a AS item_a",
            "id_b AS item_b",
            "pair_orders",
            "orders_a",
            "orders_b",
            "round(CAST(pair_orders AS DOUBLE) / orders_a, 6)"
            " AS confidence_ab",
            "round(CAST(pair_orders AS DOUBLE) / orders_b, 6)"
            " AS confidence_ba",
            "round(CAST(pair_orders AS DOUBLE) * n_txn"
            " / (CAST(orders_a AS DOUBLE) * orders_b), 6) AS lift",
        )
    )
