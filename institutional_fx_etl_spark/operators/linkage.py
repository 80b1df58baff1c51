"""Entity resolution / record linkage — fuzzy best-match lookup of
dirty strings against a canonical catalog.

Spark has no fuzzy-join operator; the scalable composition is the same
capped-inverted-index discipline as ``dedup.containment_pairs``: block
on shared trigrams (a candidate must share at least one — exactly the
pairs with Jaccard > 0, so the blocking is LOSSLESS for any positive
threshold), cap degenerate trigrams, score only the candidates, and
take the per-query argmax with a deterministic tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def trigram_set_expr(col: str) -> str:
    """Distinct character-trigram set of ``lower(col)`` — plain SQL
    shared shape-for-shape with the DuckDB oracle (list comprehension
    there, ``transform(sequence(...))`` here)."""
    return (
        f"array_distinct(transform(sequence(1, length(lower({col})) - 2),"
        f" i -> substring(lower({col}), i, 3)))"
    )


def fuzzy_best_match(
    queries: DataFrame,
    catalog: DataFrame,
    query_id: str,
    query_text: str,
    catalog_text: str,
    max_df: int = 1024,
) -> DataFrame:
    """Best catalog match per query string by trigram Jaccard.

    Plan: the capped posting list generates CANDIDATES ONLY — the
    catalog explodes its trigrams once, one count aggregate drops
    trigrams in more than ``max_df`` catalog entries (stopword-grade
    blockers that fan candidates without discriminating), and the
    query trigrams BROADCAST onto what survives (the lookup side is
    small by construction — that asymmetry is what distinguishes this
    from the pair-mining dedups). Surviving (query, entity) pairs are
    then RE-SCORED EXACTLY against the full uncapped trigram sets
    (``array_intersect`` on the arrays both rows already carry — the
    same exact-verify discipline as ``dedup.minhash_lsh_pairs``), so
    the cap can never understate a score or flip the argmax among
    candidates (round-7 ADVICE). ONE composite-key ``min_by`` picks
    the winner (highest rounded Jaccard, then lexicographically
    smallest entity — fully deterministic under score ties).

    Blocking contract: a pair becomes a candidate iff it shares at
    least one trigram with catalog df ≤ ``max_df``. Pairs whose EVERY
    shared trigram is hot are dropped by design; any oracle must
    mirror that predicate (the registered ``fuzzy_lookup_join`` oracle
    does, via the same df > ``max_df`` stoplist).

    Output: <query_id>, query_text, match_text, shared (BIGINT, exact
    full-set intersection), jaccard (round 6, exact).

    Scale caveat (probed at 1M catalog × 50k queries, 38.9 s): a
    low-entropy key space (serial numbers, digits-only codes — few
    distinct trigrams, all hot) caps away every blocker and matches
    nothing. Such catalogs need a higher-entropy blocking key (word
    grams, longer q-grams) — raising ``max_df`` instead re-opens the
    candidate fan the cap exists to bound.
    """
    # length guard BEFORE the trigram sequence (sequence(1, n-2) with
    # n < 3 would be a descending range — an error, not an empty set)
    q = (
        queries.filter(f"length({query_text}) >= 3")
        .selectExpr(
            f"{query_id} AS qid",
            f"{query_text} AS qtext",
            f"{trigram_set_expr(query_text)} AS qg",
        )
        .filter("size(qg) > 0")
    )
    c = (
        catalog.filter(f"length({catalog_text}) >= 3")
        .selectExpr(
            f"{catalog_text} AS ctext",
            f"{trigram_set_expr(catalog_text)} AS cg",
        )
        .filter("size(cg) > 0")
    )

    posting = c.selectExpr("ctext", "explode(cg) AS g")
    cool = (
        posting.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(f"df <= {max_df}")
        .select("g")
    )
    posting = posting.join(cool, "g", "left_semi")

    qg = q.selectExpr("qid", "explode(qg) AS g")
    # candidate generation only — ONE distinct bounds the fan; scores
    # come from the exact re-verify below, never from capped counts
    cand = (
        posting.join(F.broadcast(qg), "g")
        .select("qid", "ctext")
        .distinct()
    )
    scored = (
        cand.join(F.broadcast(q.select("qid", "qg")), "qid")
        .join(c, "ctext")
        .selectExpr(
            "qid",
            "ctext",
            "CAST(size(array_intersect(qg, cg)) AS BIGINT) AS shared",
            "size(qg) AS nq",
            "size(cg) AS nc",
        )
        .selectExpr(
            "qid",
            "ctext",
            "shared",
            "round(CAST(shared AS DOUBLE) / (nq + nc - shared), 6) AS j",
        )
    )
    best = scored.groupBy("qid").agg(
        F.expr("min_by(ctext, struct(-j, ctext)) AS match_text"),
        F.expr("CAST(min_by(shared, struct(-j, ctext)) AS BIGINT) AS shared"),
        F.expr("min_by(j, struct(-j, ctext)) AS jaccard"),
    )
    return (
        q.select("qid", "qtext")
        .join(best, "qid")
        .selectExpr("qid", "qtext AS query_text", "match_text", "shared", "jaccard")
    )
