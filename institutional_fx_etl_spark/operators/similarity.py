"""Similarity search over embedding columns (``array<float>``).

Two paths (BASELINE.json north star):

- **brute-force cosine top-k** — the exactness baseline: broadcast the
  (small) query set against the corpus, compute cosine with built-in
  array expressions (``zip_with`` + ``aggregate`` — JVM-side, no UDF),
  rank per query with a two-level window: a per-(query,
  scan-partition) ``row_number`` prune first (balanced exchange, no
  hot partition), then a global ranking window whose input is at most
  partitions·k rows per query. Corpus scan is embarrassingly
  parallel; no operator ever holds |corpus| rows for one query in a
  single partition.
- **LSH-bucketed ANN** — the scale path: deterministic random-
  hyperplane signatures (signs of dot products with md5-derived ±1
  planes) bucket the corpus; candidates meet only within a bucket, so
  the join fans out by bucket size, not |corpus|×|queries|.

Determinism: planes derive from md5 (reproducible in the DuckDB
oracle); ranking ties break on vec_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from institutional_fx_etl_spark.functions.localrel import local_rows_df
from pyspark.sql import functions as F

from institutional_fx_etl_spark.functions.identifiers import bq, let1
from institutional_fx_etl_spark.functions.cachereg import cached, cached_deser, cached_disk

#: deterministic ±1 hyperplane component for (plane j, dimension i):
#: parity of a md5-derived bit — reproducible in any engine with md5.
def _plane_sign(j: str, i: str) -> str:
    return (
        f"CASE WHEN cast(conv(substr(md5(concat('plane', {j}, '_', {i})),1,8),16,10)"
        f" as bigint) % 2 = 0 THEN 1.0 ELSE -1.0 END"
    )


def _plane_matrix_literal(num_planes: int, num_dims: int, table: int = 0) -> str:
    """The same ±1 planes precomputed driver-side (hashlib md5 ==
    Spark/DuckDB md5) and emitted as a nested array LITERAL — the
    expression form would re-run ~planes×dims md5 calls per ROW, since
    the per-row lambda can't know the values are row-independent.
    ``table`` > 0 prefixes the seed for an independent plane set
    (table 0 keeps the original seed string)."""
    import hashlib

    pre = "" if table == 0 else f"t{table}"
    rows = []
    for j in range(num_planes):
        signs = []
        for i in range(num_dims):
            h = int(
                hashlib.md5(f"{pre}plane{j}_{i}".encode()).hexdigest()[:8], 16
            )
            signs.append("1.0D" if h % 2 == 0 else "-1.0D")
        rows.append("array(" + ", ".join(signs) + ")")
    return "array(" + ", ".join(rows) + ")"


def _as_double(col: str) -> str:
    # caller-supplied name → backtick-quoted (names needing escaping
    # must parse as identifiers in the SQL-string subtrees)
    return f"transform({bq(col)}, x -> cast(x as double))"


#: unit-normalized copy of the assignment frame's ``vv`` column, and
#: the pair-stage dot over two such columns. Pair-heavy cell compares
#: (semdedup / knn_join / embedding_near_dup) normalize each vector
#: ONCE — O(n·d) — so the O(pairs·d) stage needs only the dot, not
#: two norms per pair: measured 6.9 s → ~3 s on 503k 64-dim pairs
#: (interpreted HOF cost scales with lambda invocations). The oracles
#: mirror with list_transform-normalize + list_dot_product, the same
#: fold-association pairing every existing cosine oracle uses.
#: The norm is LET-BOUND (``let1``) so it evaluates once per VECTOR:
#: written inline inside the transform lambda it evaluates once per
#: ELEMENT (O(d²) interpreted work — same value, d× the cost).


def _unit_expr(arr: str) -> str:
    return let1(
        f"sqrt(aggregate({arr}, 0.0d, (a, x) -> a + x*x))",
        "__nv",
        f"transform({arr}, x -> x / __nv)",
    )


_UNIT = _unit_expr("vv")
_PAIR_DOT = "aggregate(zip_with(va, vb, (x, y) -> x*y), 0.0d, (a, x) -> a + x)"


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.selectExpr(
        "*",
        f"sqrt(aggregate({_as_double(vec_col)}, 0.0d, (a, x) -> a + x*x)) AS __norm",
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force cosine top-k: for each query vector, the k most
    similar corpus vectors (cosine desc, id asc tiebreak).

    Output: q_id, vec_id, rank, cosine (rounded 6dp — ranking uses the
    rounded value so ordering is reproducible across engines)."""
    c = with_norm(corpus, vec_col).selectExpr(
        f"{bq(id_col)} AS vec_id", f"{_as_double(vec_col)} AS v", "__norm AS nv"
    )
    q = with_norm(queries, vec_col).selectExpr(
        f"{bq(id_col)} AS q_id", f"{_as_double(vec_col)} AS qv", "__norm AS nq"
    )
    dot = "aggregate(zip_with(v, qv, (x, y) -> x*y), 0.0d, (a, x) -> a + x)"
    scored = (
        c.crossJoin(F.broadcast(q))
        .selectExpr("q_id", "vec_id", f"round({dot} / (nv * nq), 6) AS cosine")
    )
    # two-level top-k (round-4 verdict ask #7): a global
    # per-query window would funnel ALL |corpus| scored rows for a
    # query into one window partition. Instead, prune per
    # (q_id, scan-partition): the local window's exchange hashes on
    # (q_id, __pid) — |partitions|× more keys, no hot partition — and
    # only the per-partition top-k survivors (≤ partitions·k rows per
    # query) reach the global ranking window.
    local = Window.partitionBy("q_id", "__pid").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    pruned = (
        scored.withColumn("__pid", F.spark_partition_id())
        .withColumn("__lrank", F.row_number().over(local))
        .filter(F.col("__lrank") <= k)
        .drop("__pid", "__lrank")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", "rank", "cosine")
    )


def hyperplane_signatures(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 8,
    table: int = 0,
) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector: bit j = sign of
    ⟨v, plane_j⟩ with deterministic md5-derived ±1 planes (precomputed
    as a literal matrix — see :func:`_plane_matrix_literal`).
    Cosine-similar vectors collide with probability 1 − θ/π per bit.

    ``table`` selects an independent plane set (seed-prefixed md5;
    table 0 keeps the original seeding so existing oracles are
    unchanged) — the L in standard (b, L) multi-table LSH.

    ``num_dims`` must cover the embedding length (defaults to 64, the
    driver tables' dimension); extra plane components are harmless.
    """
    num_dims = 64
    planes = _plane_matrix_literal(num_planes, num_dims, table=table)
    # __u let-binds the vector INSIDE the bucket expression: referencing
    # the named __v column from the per-plane lambda would inline the
    # element-wise double cast once per (plane, element) after project
    # collapse — O(planes·d²) interpreted work per row for the same
    # value. The plane matrix literal is constant-folded, so its
    # single textual inlining is free.
    proj = (
        f"aggregate(zip_with(__u, element_at({planes}, j+1),"
        " (x, s) -> x*s), 0.0d, (a, x) -> a + x)"
    )
    bucket = (
        f"aggregate(transform(sequence(0, {num_planes - 1}), j -> "
        f"CASE WHEN {proj} > 0 THEN shiftleft(1L, j) ELSE 0L END),"
        f" 0L, (a, x) -> a + x)"
    )
    return df.selectExpr(
        bq(id_col), f"{_as_double(vec_col)} AS __v"
    ).selectExpr(bq(id_col), "__v", f"{let1('__v', '__u', bucket)} AS bucket")


def knn_join_incremental(
    df_old: DataFrame,
    df_new: DataFrame,
    old_topk: DataFrame,
    centroids: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Incremental maintenance of an all-pairs KNN table when a batch
    of new vectors arrives: only the cells TOUCHED by the batch
    recompute their pairs; every other vector keeps its existing
    ``old_topk`` row verbatim. With right-sized cells the update does
    Σ|affected cell|² pair work instead of the full corpus's Σ|cell|²
    — the :func:`dedup.minhash_lsh_pairs` ``new_col`` discipline
    applied to the ANN table (incremental top-k maintenance à la the
    interactive-session literature).

    Correctness contract (what the registered query's oracle proves
    cross-engine): with a FROZEN ``centroids`` table — assignments
    never move, so an untouched cell's membership and therefore its
    top-k are unchanged — the incremental result is row-identical to
    :func:`knn_join` over old ∪ new with the same centroids. The
    centroid set must be the same one ``old_topk`` was built with;
    re-fitting centroids is a full rebuild by definition.

    Plan shape: two broadcast assignment passes (old + new, linear),
    ONE tiny distinct for the affected-cell set, the Arrow pair
    kernel over affected-cell members only, and a broadcast anti-join
    that keeps unaffected ``old_topk`` rows without shuffling them.

    Output: <id_col>, nn_id, rank, cosine — same contract as
    :func:`knn_join`.
    """
    a_old = _assign_to(df_old, centroids, vec_col, id_col)
    a_new = _assign_to(df_new, centroids, vec_col, id_col)
    affected = a_new.select("cid").distinct()
    members = a_old.join(
        F.broadcast(affected), "cid", "left_semi"
    ).unionByName(a_new)
    normed = members.selectExpr("vid", "cid", f"{_UNIT} AS vn")
    id_type = dict(normed.dtypes)["vid"]
    fresh = _knn_pairs_numpy(normed, k, id_type).selectExpr(
        f"vid AS {bq(id_col)}", "nn_id", "rank", "cosine"
    )
    keep = (
        old_topk.join(
            a_old.selectExpr(f"vid AS {bq(id_col)}", "cid"), id_col
        )
        .join(F.broadcast(affected), "cid", "left_anti")
        .drop("cid")
    )
    return keep.unionByName(fresh)


def random_projection(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_dim: int = 16,
    table: int = 0,
    num_dims: int = 64,
) -> DataFrame:
    """Johnson-Lindenstrauss random projection to ``out_dim``
    dimensions with deterministic md5-derived ±1 planes (Achlioptas
    2003 sign matrices — distance-preserving in expectation, and the
    cheap dense-sketch front-end for ANN / clustering over wide
    embeddings). Reuses the LSH plane machinery
    (:func:`_plane_matrix_literal`), so the projection is reproducible
    across engines and partitions.

    Pure scan-side map — zero shuffles: the plane matrix is a
    constant-folded literal and each output coordinate is one
    let-bound fold over the vector. Output LONG FORM (one row per
    (vector, coordinate)): <id_col>, p (1-based BIGINT), proj
    (round 6, sign-bit-normalized) — long form keeps the contract
    output array-free (the compare's column sort chokes on ndarray
    cells) and feeds coordinate-wise stats directly.

    ``num_dims`` must equal the embedding width: the plane matrix is
    materialized at that width, and a mismatch would otherwise let
    ``zip_with`` NULL-pad every projection silently (round-8 advice)
    — so the width is asserted scan-side and a wrong width fails the
    job loudly instead of emitting all-NULL rows.
    """
    planes = _plane_matrix_literal(out_dim, num_dims, table=table)
    checked = (
        f"CASE WHEN size({_as_double(vec_col)}) = {num_dims}"
        f" THEN {_as_double(vec_col)}"
        f" ELSE raise_error(concat('random_projection: embedding width ',"
        f" size({_as_double(vec_col)}), ' != num_dims {num_dims}')) END"
    )
    projs = let1(
        checked,
        "__u",
        f"transform(sequence(1, {out_dim}), p ->"
        f" round(aggregate(zip_with(__u, element_at({planes}, p),"
        " (x, s) -> x*s), 0.0d, (a, x) -> a + x), 6) + 0.0d)",
    )
    return df.selectExpr(
        f"{bq(id_col)}", f"posexplode({projs}) AS (__p0, proj)"
    ).selectExpr(
        f"{bq(id_col)}", "CAST(__p0 + 1 AS BIGINT) AS p", "proj"
    )


def auto_planes(
    n_rows: int,
    target_bucket_rows: int = 8,
    min_planes: int = 8,
    max_planes: int = 24,
) -> int:
    """Hyperplane count that holds E[rows per bucket] ≈
    ``target_bucket_rows`` as the corpus grows: ``ceil(log2(n /
    target))`` clamped to [min, max].

    The in-bucket verify work is Σ|bucket|² ≈ n·(n/2^planes), so a
    FIXED plane count turns 10× data into ~100× join fan (measured:
    the round-7 scale probe's wall ×10.6 at data ×10 with planes
    pinned at 8). Scaling planes with log2(n) is what keeps the
    candidate stage linear in n — the same discipline as
    ``_auto_cells`` for the IVF/semdedup cell count.
    """
    import math

    if n_rows <= target_bucket_rows:
        return min_planes
    return max(
        min_planes,
        min(max_planes, math.ceil(math.log2(n_rows / target_bucket_rows))),
    )


def lsh_ann_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 8,
    min_cosine: float = 0.3,
    num_tables: int = 1,
) -> DataFrame:
    """Scale-path near-neighbor pairs: candidates meet only inside an
    LSH bucket (8 planes → 256 buckets), then exact cosine verifies.
    Output: id_a < id_b, bucket, cosine.

    ``num_tables`` > 1 enables standard (b, L) multi-table LSH: a pair
    is a candidate if it collides in ANY of the L independent plane
    sets, lifting recall from p^b to 1 − (1 − p^b)^L (recall-gated in
    tests/test_extensions.py). Candidate pairs are deduped NARROW
    (ids only — vectors never cross the distinct), then the vectors
    join back for the single exact-cosine verify; ``bucket`` reports
    the smallest (table ≪ planes | bucket) collision key for
    determinism. The default L=1 keeps the original single-join plan
    (and the SQL oracle) byte-identical.

    Scale contract: work is Σ|bucket|² ≈ n²/2^planes, so
    ``num_planes`` MUST grow with the corpus — pass
    ``auto_planes(n)`` to hold expected bucket occupancy constant
    (then wall tracks data size; pinning planes at 8 made the 10×
    probe go ×10.6 super-linear in round 7). The registered contract
    query keeps planes=8 because its oracle mirrors that constant."""
    sigs = hyperplane_signatures(df, vec_col, id_col, num_planes)
    # normalize once per vector so the in-bucket verify is a bare dot
    # (same 3x HOF saving as the cell-blocked compares; bucket signs
    # are scale-invariant, so the signatures stay on the raw vectors)
    unit = _unit_expr("__v")
    if num_tables == 1:
        normed = sigs.selectExpr(bq(id_col), "bucket", f"{unit} AS vn")
        a = normed.selectExpr(f"{bq(id_col)} AS id_a", "vn AS va", "bucket")
        b = normed.selectExpr(f"{bq(id_col)} AS id_b", "vn AS vb", "bucket")
        return (
            a.join(b, on="bucket")
            .filter(F.col("id_a") < F.col("id_b"))
            .selectExpr(
                "bucket", "id_a", "id_b", f"round({_PAIR_DOT}, 6) AS cosine"
            )
            .filter(F.col("cosine") >= min_cosine)
        )

    all_sigs = None
    for t in range(num_tables):
        s = hyperplane_signatures(
            df, vec_col, id_col, num_planes, table=t
        ).selectExpr(
            bq(id_col),
            f"bucket + {t}L * shiftleft(1L, {num_planes}) AS tbucket",
        )
        all_sigs = s if all_sigs is None else all_sigs.unionByName(s)
    a = all_sigs.selectExpr(f"{bq(id_col)} AS id_a", "tbucket")
    b = all_sigs.selectExpr(f"{bq(id_col)} AS id_b", "tbucket")
    cands = (
        a.join(b, on="tbucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.min("tbucket").alias("bucket"))
    )
    vunit = let1(_as_double(vec_col), "__u", _unit_expr("__u"))
    va = df.selectExpr(f"{bq(id_col)} AS id_a", f"{vunit} AS va")
    vb = df.selectExpr(f"{bq(id_col)} AS id_b", f"{vunit} AS vb")
    return (
        cands.join(va, on="id_a")
        .join(vb, on="id_b")
        .selectExpr(
            "bucket", "id_a", "id_b", f"round({_PAIR_DOT}, 6) AS cosine"
        )
        .filter(F.col("cosine") >= min_cosine)
    )


def ivf_assign(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_centroids: int = 8,
    centroid_stride: int | None = None,
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest
    centroid (max cosine, centroid-id tiebreak).

    Centroids are picked deterministically from the corpus itself
    (every ``stride``-th vector) instead of k-means — the assignment
    and search machinery is identical, and seeding this way keeps the
    operator reproducible across engines; swap in `ml.clustering`
    KMeans centroids for quality at scale (ROADMAP). The centroid set
    is tiny and broadcast; assignment is one scan-side pass.
    """
    v = df.selectExpr(f"{bq(id_col)} AS vid", f"{_as_double(vec_col)} AS vv")
    if centroid_stride is None:
        # stride chosen so ~num_centroids centroids exist at any corpus
        # size is the caller's concern; default: ids 0..num_centroids-1
        centroids = v.filter(F.col("vid") < num_centroids).selectExpr(
            "vid AS cid", "vv AS cv"
        )
    else:
        centroids = v.filter(
            (F.col("vid") % centroid_stride == 0)
        ).selectExpr("vid AS cid", "vv AS cv")
    return _assign_to(df, centroids, vec_col, id_col)


def kmeans_centroids(
    corpus: DataFrame,
    num_centroids: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
    max_iter: int = 20,
) -> DataFrame:
    """Real k-means centroids for IVF (``pyspark.ml.clustering.KMeans``
    with a fixed seed — the quality upgrade over deterministic
    stride-seeding; ROADMAP #5 item). Returns ``(cid, cv)`` — tiny,
    meant to be broadcast into :func:`ivf_topk`'s ``centroids=``.

    The k-rows collect of cluster centers is the one place driver-side
    data transfer is correct: k vectors, not corpus rows.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = corpus.selectExpr(f"{_as_double(vec_col)} AS __v").select(
        array_to_vector("__v").alias("features")
    )
    model = KMeans(k=num_centroids, seed=seed, maxIter=max_iter).fit(feats)
    centers = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return local_rows_df(
        corpus.sparkSession, centers, "cid int, cv array<double>"
    )


def ivf_topk(
    corpus: DataFrame,
    query_ids: list[int],
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_centroids: int = 8,
    nprobe: int = 1,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF search: each query probes its ``nprobe`` nearest cells —
    ``nprobe/num_centroids`` of the corpus per query instead of a full
    scan; recall grows with nprobe (exactness baseline is
    :func:`cosine_topk`, recall asserted in tests/test_extensions.py).

    ``centroids`` (``cid, cv`` — e.g. :func:`kmeans_centroids`)
    overrides the deterministic first-N seeding; the default stays
    id-seeded so the operator is bit-reproducible in the SQL oracle.
    """
    v = corpus.selectExpr(f"{bq(id_col)} AS vid", f"{_as_double(vec_col)} AS vv")
    if centroids is None:
        centroids = v.filter(F.col("vid") < num_centroids).selectExpr(
            "vid AS cid", "vv AS cv"
        )
    # scan-side cell ranking against the centroid literal (see
    # _assign_to): per row, score every centroid and sort by
    # (ccos desc, cid asc) INSIDE the row — no corpus x k crossJoin
    # rows, no per-vid window shuffle
    cells = _scored_cells_expr(centroids)
    ranked = v.selectExpr("vid", "vv", f"{cells} AS __cells")
    # normalize once at assignment so the probe join scores with a
    # bare dot (assignment itself stays on the raw vectors)
    unit = _UNIT
    assigned = ranked.selectExpr(
        "vid", f"{unit} AS va", "element_at(__cells, 1).cid AS cid"
    )
    q_cells = ranked.filter(F.col("vid").isin(query_ids)).selectExpr(
        "vid AS q_id",
        f"{unit} AS vb",
        f"explode(transform(slice(__cells, 1, {nprobe}), c -> c.cid)) AS cid",
    )
    scored = assigned.join(F.broadcast(q_cells), on="cid").selectExpr(
        "q_id", "vid AS vec_id", f"round({_PAIR_DOT}, 6) AS cosine"
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", "rank", "cosine")
    )


def ivf_topk_incremental(
    df_old: DataFrame,
    df_new: DataFrame,
    query_ids: list[int],
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_centroids: int = 8,
    nprobe: int = 1,
    centroids: DataFrame | None = None,
    old_index: DataFrame | None = None,
) -> DataFrame:
    """Append-only IVF ingest (r9 verdict ask #8 — the one shape the
    batch ANN family lacked): a batch of new embeddings joins an
    EXISTING IVF index without touching the old corpus. The quantizer
    is frozen (``centroids`` — default: id-seeded from the OLD corpus,
    the index's original seeding; re-fitting centroids is a rebuild by
    definition, exactly :func:`knn_join_incremental`'s rule), so the
    standing index relation ``old_index`` (vid, vv, cid — e.g. the
    persisted output of a prior :func:`_assign_to`) stays valid
    verbatim and per-batch work is ONE linear assignment scan over the
    new batch plus the union. Search over the merged index probes the
    query's ``nprobe`` nearest cells exactly like :func:`ivf_topk`.

    Correctness contract (what the registered query's oracle proves
    cross-engine): with frozen centroids, assignment is a pure per-row
    map, so assign(old) ∪ assign(new) ≡ assign(old ∪ new) and the
    incremental search is ROW-IDENTICAL to a from-scratch
    :func:`ivf_topk` over the union with the same centroids —
    the driver hash match IS the incremental ≡ rebuild proof.

    ``old_index=None`` recomputes the old assignment from ``df_old``
    (keeps the operator pure for the contract query); a real ingest
    pipeline passes the persisted index and pays only the new-batch
    scan. Output: q_id, vec_id, rank, cosine — same as
    :func:`ivf_topk`. Query ids may come from either batch.
    """
    v_old = df_old.selectExpr(
        f"{bq(id_col)} AS vid", f"{_as_double(vec_col)} AS vv"
    )
    if centroids is None:
        centroids = v_old.filter(F.col("vid") < num_centroids).selectExpr(
            "vid AS cid", "vv AS cv"
        )
    a_old = (
        old_index
        if old_index is not None
        else _assign_to(df_old, centroids, vec_col, id_col)
    )
    a_new = _assign_to(df_new, centroids, vec_col, id_col)
    index = a_old.unionByName(a_new)
    assigned = index.selectExpr("vid", f"{_UNIT} AS va", "cid")
    # query rows rank the bounded centroid set scan-side (ivf_topk's
    # probe stage) — drawn from the union so a NEW vector can query
    # the merged index in the same batch it arrives
    cells = _scored_cells_expr(centroids)
    v_all = v_old.unionByName(
        df_new.selectExpr(
            f"{bq(id_col)} AS vid", f"{_as_double(vec_col)} AS vv"
        )
    )
    q_cells = (
        v_all.filter(F.col("vid").isin(query_ids))
        .selectExpr("vid", "vv", f"{cells} AS __cells")
        .selectExpr(
            "vid AS q_id",
            f"{_UNIT} AS vb",
            f"explode(transform(slice(__cells, 1, {nprobe}),"
            " c -> c.cid)) AS cid",
        )
    )
    scored = assigned.join(F.broadcast(q_cells), on="cid").selectExpr(
        "q_id", "vid AS vec_id", f"round({_PAIR_DOT}, 6) AS cosine"
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", "rank", "cosine")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    top_n: int = 20,
    num_centroids: int = 8,
    max_cell: int | None = None,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup candidate pairs: candidates are
    generated inside SemDeDup-style nearest-centroid CELLS (the same
    data-dependent blocking :func:`semdedup` uses — similar vectors
    land in the same cell regardless of id), then exact cosine
    verifies; output is the global top-n most-similar pairs in
    deterministic (cosine desc, id asc) order.

    Round-5 verdict fix: the previous id-range blocking
    (``block = id / block_size``) was data-independent, so a near-dup
    pair straddling a block boundary was structurally invisible — a
    recall hole, not just a perf smell. Cell blocking removes it:
    recall now depends on embedding geometry (near-identical vectors
    share a nearest centroid except on knife-edge ties), and the
    compare fans by CELL size, never corpus². ``max_cell`` hard-caps
    skewed cells exactly like :func:`semdedup` / MinHash hot buckets;
    ``centroids`` (cid, cv) swaps in k-means cells at scale. The
    global top-n is a ``TakeOrderedAndProject`` partial top-k — no
    full sort of the pair relation."""
    assigned = (
        ivf_assign(df, vec_col, id_col, num_centroids)
        if centroids is None
        else _assign_to(df, centroids, vec_col, id_col)
    )
    if max_cell is not None:
        small = (
            assigned.groupBy("cid")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") <= max_cell)
            .select("cid")
        )
        assigned = assigned.join(small, "cid", "left_semi")
    normed = assigned.selectExpr("vid", "cid", f"{_UNIT} AS vn")
    a = normed.selectExpr("vid AS id_a", "vn AS va", "cid")
    b = normed.selectExpr("vid AS id_b", "vn AS vb", "cid")
    pairs = (
        a.join(b, on="cid")
        .filter(F.col("id_a") < F.col("id_b"))
        .selectExpr("id_a", "id_b", f"round({_PAIR_DOT}, 6) AS cosine")
    )
    return pairs.orderBy(
        F.desc("cosine"), F.asc("id_a"), F.asc("id_b")
    ).limit(top_n)


#: frozen product-quantization codebook: 4 subspaces × 4 centroids ×
#: 16 dims (64-dim embeddings), deterministic literals (seeded once,
#: data-independent) so the DuckDB oracle can mirror the exact
#: quantizer. Real deployments would k-means-fit per subspace — the
#: assignment/encode plan shape (the part that must scale) is
#: identical either way.
_PQ_CODEBOOK = [
    [
        [0.0335, -0.114, -0.054, -0.0664, 0.0568, 0.0424, 0.0941, -0.0991, -0.0187, -0.1128, -0.0675, 0.0013, -0.1136, -0.0723, 0.036, 0.0108],
        [-0.0671, 0.0214, 0.0743, -0.1184, 0.0734, 0.0476, -0.0383, -0.0827, 0.1097, -0.0392, -0.0977, -0.0968, 0.0834, 0.0249, 0.0737, 0.0551],
        [0.0087, 0.1135, -0.0292, 0.0125, 0.0791, 0.0284, 0.0868, 0.0186, 0.0491, -0.109, -0.0653, -0.0505, -0.1008, -0.0641, -0.0958, -0.0533],
        [0.0326, -0.0324, -0.0312, -0.0697, -0.0559, 0.1048, 0.0355, 0.0262, -0.0789, 0.055, -0.0808, -0.0289, 0.1175, 0.0336, 0.0137, 0.0443],
    ],
    [
        [0.0823, 0.0662, -0.065, -0.1123, -0.0443, -0.0557, -0.0694, 0.1063, 0.0903, -0.0445, 0.0373, -0.025, 0.0995, -0.0099, -0.0564, -0.0608],
        [0.0147, -0.0569, 0.0203, 0.0955, -0.0241, -0.0674, 0.1194, 0.0023, -0.0982, -0.1087, -0.0937, 0.0306, 0.0701, -0.0187, -0.1048, -0.0284],
        [0.1191, 0.007, 0.1131, 0.0866, -0.1172, 0.053, 0.0436, 0.0089, -0.056, 0.0338, -0.0932, -0.0157, -0.0111, 0.1089, 0.0902, -0.0568],
        [0.0001, -0.0771, 0.099, 0.0889, -0.0484, 0.0333, 0.0262, -0.0833, 0.063, 0.0095, 0.0669, 0.0073, -0.1199, -0.0422, -0.1153, 0.103],
    ],
    [
        [0.0909, 0.0796, -0.0462, -0.1061, 0.0907, 0.1073, -0.0994, -0.0034, -0.1034, 0.0625, 0.0638, -0.0892, -0.0059, 0.012, -0.0564, 0.0894],
        [-0.0184, -0.0692, 0.0094, 0.0552, -0.0717, -0.0452, 0.1188, 0.036, -0.0149, 0.0042, -0.091, -0.0661, -0.0389, 0.0212, -0.0648, -0.0671],
        [-0.103, 0.0315, -0.0651, 0.0973, 0.0863, -0.103, -0.0629, 0.0406, -0.0686, -0.0882, 0.1045, 0.0171, -0.0066, 0.0683, 0.0738, -0.0743],
        [-0.0967, -0.0165, -0.0183, -0.0079, 0.055, 0.0416, 0.1162, -0.0964, -0.0234, -0.0386, 0.0868, -0.0603, -0.0743, -0.0123, -0.0187, -0.0531],
    ],
    [
        [-0.06, 0.1016, -0.0136, 0.0867, 0.0121, -0.1079, 0.1198, 0.0806, 0.1126, 0.1023, 0.0837, -0.0801, -0.0034, -0.0687, -0.0238, -0.1059],
        [-0.029, 0.1165, -0.0564, 0.0682, -0.0108, -0.0185, 0.1098, 0.1189, 0.0134, 0.0524, -0.0828, -0.0488, 0.1125, 0.019, 0.0101, 0.0595],
        [-0.1063, 0.0202, 0.0007, 0.0847, -0.0822, 0.1106, -0.1008, -0.0754, 0.0228, 0.0421, -0.0636, -0.0912, 0.0937, -0.0609, 0.0227, 0.0287],
        [-0.0194, 0.0201, 0.0055, 0.1043, -0.071, 0.0519, -0.0627, -0.025, 0.0412, -0.048, -0.0441, 0.0604, -0.1026, -0.01, 0.1196, 0.1191],
    ],
]


def kmeans_pq_codebook(
    corpus: DataFrame,
    vec_col: str = "embedding",
    num_subspaces: int = 4,
    num_centroids: int = 4,
    dims: int = 64,
    seed: int = 7,
    max_iter: int = 20,
) -> list:
    """Fit a product-quantization codebook on real data: one fixed-seed
    ``pyspark.ml.clustering.KMeans`` per subspace over that subspace's
    vector slices (the standard PQ training recipe — subspaces are
    quantized independently). Returns the nested
    ``[subspace][centroid][dim]`` list :func:`pq_encode` takes as
    ``codebook=``, so the encode plan is unchanged: the fitted centers
    are frozen into scan-side literals exactly like ``_PQ_CODEBOOK``.

    Scale notes: each fit aggregates sub-vectors of ``dims /
    num_subspaces`` floats — Lloyd iterations are map-side partial sums
    per centroid, and only ``num_centroids`` centers ever reach the
    driver (the same k-row transfer :func:`kmeans_centroids` makes).
    Fit on a sample at 100 TB; codebook quality saturates long before
    corpus size does.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    sub_d = dims // num_subspaces
    v = corpus.selectExpr(f"{_as_double(vec_col)} AS __v")
    codebook = []
    for m in range(num_subspaces):
        feats = v.selectExpr(
            f"slice(__v, {m * sub_d + 1}, {sub_d}) AS __s"
        ).select(array_to_vector("__s").alias("features"))
        model = KMeans(
            k=num_centroids, seed=seed + m, maxIter=max_iter
        ).fit(feats)
        codebook.append(
            [[float(x) for x in c] for c in model.clusterCenters()]
        )
    return codebook


def pq_encode(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    codebook: list | None = None,
) -> DataFrame:
    """Product quantization: split each vector into M subvectors, store
    only the id of each subvector's nearest codebook centroid — the
    compressed representation behind billion-scale ANN indexes (M
    bytes per vector instead of 4·dims).

    Scan-only plan: per row, M×K squared-distance expressions over the
    frozen codebook literal (JVM codegen'd higher-order array
    functions, no UDF, no shuffle, no join — at 100 TB this is a pure
    map stage). Output: ``(id, code_0..code_{M-1}, recon_err)`` where
    ``recon_err`` is the total squared quantization error (rounded to
    6; ties in the argmin break on the lowest centroid id).

    Round 10: every subspace's K-fold distance array is LET-BOUND and
    the row's codes + error emit through ONE ``inline`` generator —
    the original per-column form re-evaluated each ``darr`` (K
    d-element folds) three times per subspace (argmin, min, error
    sum) with the subvector slice inlined into every fold, the exact
    CollapseProject trap ``let1`` documents. Same expressions, same
    fold order ⇒ bit-identical codes/error (oracle hashes unmoved);
    ~3× less per-row work — measured on the 100×-skew IVF-PQ probe
    where this map IS the wall.
    """
    cb = codebook if codebook is not None else _PQ_CODEBOOK
    m_sub = len(cb)
    k_cent = len(cb[0])
    dims = len(cb[0][0])

    def lit(vals: list[float]) -> str:
        return "array(" + ", ".join(f"{v!r}D" for v in vals) + ")"

    # innermost body: the output struct over the bound __d{m} arrays
    code_fields = []
    err_terms = []
    for m in range(m_sub):
        code_fields.append(
            f"'code_{m}', cast(array_position(__d{m},"
            f" array_min(__d{m})) - 1 as int)"
        )
        err_terms.append(f"array_min(__d{m})")
    body = (
        "named_struct("
        + ", ".join(code_fields)
        + f", 'recon_err', round({' + '.join(err_terms)}, 6))"
    )
    # wrap inside-out: bind __d{m} (the K distance folds over the
    # let-bound subvector __s{m}) for every subspace
    for m in reversed(range(m_sub)):
        dists = [
            f"aggregate(zip_with(__s{m}, {lit(cb[m][k])},"
            " (x, y) -> (x-y)*(x-y)), 0.0D, (a, x) -> a + x)"
            for k in range(k_cent)
        ]
        darr = "array(" + ", ".join(dists) + ")"
        sub = (
            f"transform(slice({bq(vec_col)}, {m * dims + 1}, {dims}),"
            " x -> cast(x as double))"
        )
        body = let1(sub, f"__s{m}", let1(darr, f"__d{m}", body))
    return df.selectExpr(
        f"{bq(id_col)} AS id", f"inline(array({body}))"
    )


def embedding_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    group_col: str = "label",
) -> DataFrame:
    """Element-wise mean embedding per group — the centroid build step
    of IVF training / SemDeDup-style cluster dedup, as a first-class
    operator. posexplode → per-(group, dim) partial sums → re-assemble
    the centroid array sorted by dimension. The explode fans rows ×
    dims, but the aggregate is partial+final around ONE shuffle whose
    key space is |groups| · dims (vocabulary-bounded, thousands), so
    map-side combine collapses the fan-out before the exchange — at
    100 TB the shuffled relation is the centroid table, not the
    corpus. Component sums go through the decimal trick so the mean is
    bit-identical across engines regardless of summation order."""
    d = df.select(
        F.col(group_col).alias(group_col),
        F.posexplode(_as_double_col(vec_col)).alias("pos", "x"),
    )
    agg = d.groupBy(group_col, "pos").agg(
        F.sum(F.col("x").cast("decimal(27,10)")).alias("__s"),
        F.count("x").alias("__n"),
    )
    return (
        agg.groupBy(group_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("pos"),
                        F.round(
                            (F.col("__s") / F.col("__n")).cast("double"), 6
                        ).alias("m"),
                    )
                )
            ).alias("__cm"),
            F.max("__n").alias("n_vectors"),
        )
        .selectExpr(
            bq(group_col),
            "transform(__cm, s -> s.m) AS centroid",
            "n_vectors",
        )
    )


def _as_double_col(col: str):
    return F.expr(_as_double(col))


def semdedup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_centroids: int = 8,
    min_cosine: float = 0.95,
    max_cell: int | None = None,
    centroids: DataFrame | None = None,
    pair_strategy: str = "auto",
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023): cluster the
    corpus by nearest centroid, compare embeddings ONLY within a cell,
    and drop every vector that has a more-canonical (smaller-id)
    near-duplicate (cosine ≥ ``min_cosine``) in its cell.

    Output: vec_id, cid, keep (boolean) — keep=false means a smaller
    id in the same cell is semantically near-identical.

    Scale contract: the pairwise compare fans by CELL size, never
    corpus² — pick ``num_centroids`` ≈ n / target_cell so cells stay
    bounded (SemDeDup uses ~100k clusters at web scale), and/or set
    ``max_cell`` to hard-cap the fan-out (cells above the cap skip the
    in-cell compare — their members are all kept, trading recall for a
    guaranteed (#cells · max_cell²) bound, the same hot-bucket policy
    as ``dedup.minhash_lsh_pairs``). Assignment is one broadcast pass;
    the only corpus shuffle is the cell-keyed self-join. ``centroids``
    (cid, cv) overrides the deterministic first-N seeding (e.g.
    :func:`kmeans_centroids` output).

    ``pair_strategy`` mirrors :func:`knn_join` (round 9 — the same
    Σ|cell|²·d interpreted-HOF dot was this operator's cost center):
    ``auto``/``numpy`` runs the in-cell compare as one Arrow pass per
    cell (:func:`_semdedup_drops_numpy` — fold-order-matched doubles,
    exact-rounding fallback, so the drop set is bit-identical);
    ``sql`` forces the pure-JVM cell self-join, which stays as the
    equality gate's reference (tests/test_round9_ops.py)."""
    if pair_strategy not in ("auto", "numpy", "sql"):
        raise ValueError(
            f"pair_strategy must be 'auto', 'numpy' or 'sql', got "
            f"{pair_strategy!r}"
        )
    assigned = (
        ivf_assign(df, vec_col, id_col, num_centroids)
        if centroids is None
        else _assign_to(df, centroids, vec_col, id_col)
    )
    if max_cell is not None:
        small = (
            assigned.groupBy("cid")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") <= max_cell)
            .select("cid")
        )
        compared = assigned.join(small, "cid", "left_semi")
    else:
        compared = assigned
    normed = compared.selectExpr("vid", "cid", f"{_UNIT} AS vn")
    if pair_strategy != "sql":
        id_type = dict(compared.dtypes)["vid"]
        dup_of_smaller = _semdedup_drops_numpy(
            normed, min_cosine, id_type
        ).withColumnRenamed("vid", "id_b")
    else:
        a = normed.selectExpr("vid AS id_a", "vn AS va", "cid")
        b = normed.selectExpr("vid AS id_b", "vn AS vb", "cid")
        dup_of_smaller = (
            a.join(b, on="cid")
            .filter(F.col("id_a") < F.col("id_b"))
            .selectExpr("id_b", f"round({_PAIR_DOT}, 6) AS cosine")
            .filter(F.col("cosine") >= min_cosine)
            .select("id_b")
            .distinct()
        )
    return (
        assigned.join(
            dup_of_smaller.withColumnRenamed("id_b", "vid").withColumn(
                "__drop", F.lit(True)
            ),
            "vid",
            "left",
        )
        .selectExpr(
            f"vid AS {bq(id_col)}",
            "cid",
            "coalesce(NOT __drop, true) AS keep",
        )
    )


#: above this many centroids the literal-expression assignment form is
#: refused: a 100k×dims literal would blow up SQL parsing/codegen long
#: before the corpus does (round-5 advice) — callers fall back to the
#: broadcast-join path in :func:`_assign_to`.
MAX_LITERAL_CENTROIDS = 256

#: regime thresholds for :func:`_assign_to` (round 7): ≤16 centroids
#: the literal HOF expression wins (no Arrow transfer, zero overhead);
#: 17..4096 the numpy kernel wins (one interpreter dispatch per element
#: vs one vectorized pass per dimension); above that the centroid
#: collect itself is no longer a sensible driver transfer and the
#: broadcast-join regime takes over.
MAX_HOF_CENTROIDS = 16
MAX_NUMPY_CENTROIDS = 4096


def _assign_numpy(v: DataFrame, rows: list, cid_type: str) -> DataFrame:
    """Arrow-batched nearest-centroid assignment, bit-identical to the
    literal-HOF scoring: dimension-ordered fold accumulation, the same
    a/(b·c) division shape, 6-dp half-up rounding with the exact
    decimal fallback for boundary-risky cells, and first-max argmax
    over cid-ascending columns (== the (ccos desc, cid asc) sort).
    ``v`` must be ``(vid, vv array<double>)``."""
    import numpy as np
    import pandas as pd

    from institutional_fx_etl_spark.functions import npexact as npe

    cids = np.array([int(r["cid"]) for r in rows], dtype=np.int64)
    C = np.array([[float(x) for x in r["cv"]] for r in rows], dtype=np.float64)
    nc = npe.centroid_norms([r["cv"] for r in rows])
    vid_type = dict(v.dtypes)["vid"]
    schema = f"vid {vid_type}, vv array<double>, cid {cid_type}"

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(pdf["vv"].tolist(), dtype=np.float64)
            cc = npe.fold_dot(X, C) / (
                np.sqrt(npe.fold_sqnorm(X))[:, None] * nc[None, :]
            )
            rc, risky = npe.round6_block(cc)
            win = rc.argmax(axis=1)
            for i in np.nonzero(risky.any(axis=1))[0]:
                win[i] = int(npe.exact_row_round(cc[i]).argmax())
            yield pd.DataFrame(
                {"vid": pdf["vid"], "vv": pdf["vv"], "cid": cids[win]}
            )

    return v.mapInPandas(assign, schema=schema)


def _bounded_centroid_rows(centroids: DataFrame) -> list:
    """Collect the centroid table with a cap+1 limit — ONE bounded
    action that both sizes the table and fetches it. Raises past the
    literal-expression cap (callers that can fall back — ``_assign_to``
    — probe with this before choosing a path)."""
    rows = centroids.select("cid", "cv").limit(MAX_LITERAL_CENTROIDS + 1).collect()
    if len(rows) > MAX_LITERAL_CENTROIDS:
        raise ValueError(
            f">{MAX_LITERAL_CENTROIDS} centroids exceed the "
            "literal-expression cap; use the broadcast-join assignment "
            "path (_assign_to falls back automatically)"
        )
    return rows


def _scored_cells_expr(centroids: DataFrame) -> str:
    """SQL expr: for the current row's ``vv``, every centroid scored
    and sorted by (cosine desc, cid asc) — an array of
    ``struct(cid, ccos)`` computed entirely scan-side.

    The centroid table is collected (bounded: k rows — the same
    k-vectors driver transfer ``kmeans_centroids`` already makes) and
    embedded as a LITERAL with each centroid's norm precomputed, so
    assignment is a pure map over the corpus: no corpus x k crossJoin
    relation, no per-vid window shuffle. ``repr(float)`` round-trips
    doubles exactly and the fold order matches the former pairwise
    expression, so scores are bit-identical to the crossJoin form
    (oracle-hash-checked)."""
    import math

    rows = sorted(
        _bounded_centroid_rows(centroids), key=lambda r: r["cid"]
    )
    lits = []
    for r in rows:
        cv = ", ".join(f"{float(x)!r}D" for x in r["cv"])
        # nc via the same left fold as the SQL aggregate (not fsum —
        # order matters in the last ulp)
        acc = 0.0
        for x in r["cv"]:
            acc += float(x) * float(x)
        nc = math.sqrt(acc)
        lits.append(
            f"named_struct('cid', {int(r['cid'])}, 'cv', array({cv}),"
            f" 'nc', {nc!r}D)"
        )
    cents = "array(" + ", ".join(lits) + ")"
    # the row vector's norm is let-bound: inlined in the per-centroid
    # lambda it would re-aggregate vv once per centroid (k·d instead
    # of d interpreted ops); same value, so scores stay bit-identical
    dotc = "aggregate(zip_with(vv, c.cv, (x, y) -> x*y), 0.0d, (a, x) -> a + x)"
    nv = "sqrt(aggregate(vv, 0.0d, (a, x) -> a + x*x))"
    scored = (
        f"array_sort(transform({cents}, c -> named_struct('cid', c.cid,"
        f" 'ccos', round({dotc}/(__nv*c.nc), 6))),"
        " (l, r) -> CASE WHEN l.ccos > r.ccos THEN -1"
        " WHEN l.ccos < r.ccos THEN 1"
        " WHEN l.cid < r.cid THEN -1 WHEN l.cid > r.cid THEN 1"
        " ELSE 0 END)"
    )
    from institutional_fx_etl_spark.functions.identifiers import let1

    return let1(nv, "__nv", scored)


def _assign_to(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Nearest-centroid assignment against a bounded (cid, cv) table —
    shared by :func:`semdedup`, :func:`ivf_assign` and the k-means IVF
    paths.

    Two regimes (round-5 advice): up to
    :data:`MAX_LITERAL_CENTROIDS` centroids, a pure scan-side map over
    the centroid literal (see :func:`_scored_cells_expr` — zero
    shuffle). Above that — SemDeDup-scale cell counts (~100k) would
    blow up SQL parsing/codegen as a literal — a broadcast hash join
    scores every (vector, centroid) pair JVM-side and ``max_by`` picks
    the argmax per vector with the same (ccos desc, cid asc) tiebreak.
    The broadcast join emits the k scored rows for a vector inside its
    scan partition, so the partial aggregate collapses them to one row
    per vector before the single vid-keyed exchange.

    Round-7 third regime: between :data:`MAX_HOF_CENTROIDS` and
    :data:`MAX_NUMPY_CENTROIDS` the assignment runs as an
    Arrow-batched numpy kernel (:func:`_assign_numpy`) — the
    O(n·cells·d) score matrix is the quadratic-creep term the 10×
    heavy-family bench flagged (interpreted HOF dispatch per element),
    and the kernel computes bit-identical doubles (fold-order-matched
    accumulation + exact half-up rounding fallback,
    ``functions/npexact.py``), so no oracle hash moves across the
    regime switch (equality machine-gated in tests/test_round7_ops.py).
    """
    v = df.selectExpr(f"{bq(id_col)} AS vid", f"{_as_double(vec_col)} AS vv")
    probe = centroids.select("cid", "cv").limit(MAX_NUMPY_CENTROIDS + 1).collect()
    if len(probe) <= MAX_HOF_CENTROIDS:
        cells = _scored_cells_expr(centroids)
        return v.selectExpr("vid", "vv", f"element_at({cells}, 1).cid AS cid")
    if len(probe) <= MAX_NUMPY_CENTROIDS:
        cid_type = dict(centroids.dtypes)["cid"]
        return _assign_numpy(
            v, sorted(probe, key=lambda r: r["cid"]), cid_type
        )
    dotc = "aggregate(zip_with(vv, cv, (x, y) -> x*y), 0.0d, (a, x) -> a + x)"
    nv = "sqrt(aggregate(vv, 0.0d, (a, x) -> a + x*x))"
    ncv = "sqrt(aggregate(cv, 0.0d, (a, x) -> a + x*x))"
    scored = v.crossJoin(F.broadcast(centroids)).selectExpr(
        "vid", "vv", "cid", f"round({dotc}/({nv}*{ncv}), 6) AS ccos"
    )
    return scored.groupBy("vid").agg(
        F.first("vv").alias("vv"),
        F.expr("max_by(cid, named_struct('c', ccos, 'n', -cid))").alias("cid"),
    ).select("vid", "vv", "cid")


def emb_quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric int8 embedding quantization (the serving-side
    compression step between full PQ and raw floats): per vector,
    ``scale = max|x| / 127`` and ``code_i = floor(x_i/scale + 0.5)``
    (explicit half-up fixed-point — ``round()`` tie rules differ
    across engines). Pure scan-side array expressions — no shuffle,
    no UDF; at 100 TB this is a map stage that shrinks the vector
    payload 4×. Codes serialize comma-joined so the contract compare
    is array-free; ``recon_err`` is the rounded max absolute
    reconstruction error.

    scale/codes/recon are LET-BOUND (``let1``) and emitted through one
    ``inline`` generator: chained named columns collapse into a single
    projection where ``__scale`` re-evaluates per code element and
    ``__codes`` (with its embedded per-element scale) re-evaluates per
    recon element — O(d²)+ interpreted work per row for the same
    values. The generator surfaces all three output columns from ONE
    evaluation of the bound chain."""
    v = _as_double(vec_col)
    struct = (
        "named_struct("
        "'scale', round(__scale, 6), "
        "'codes', array_join(__codes, ','), "
        "'recon_err', round(array_max(zip_with(__u, __codes,"
        " (x, c) -> abs(x - c * __scale))), 6))"
    )
    full = let1(
        v,
        "__u",
        let1(
            "array_max(transform(__u, x -> abs(x))) / 127.0D",
            "__scale",
            let1(
                "transform(__u, x -> CAST(floor(x / __scale + 0.5D)"
                " AS INT))",
                "__codes",
                struct,
            ),
        ),
    )
    return df.selectExpr(bq(id_col), f"inline(array({full}))")


def knn_join(
    df: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_centroids: int = 8,
    max_cell: int | None = None,
    centroids: DataFrame | None = None,
    pair_strategy: str = "auto",
) -> DataFrame:
    """All-pairs k-nearest-neighbor join, cell-bounded: EVERY vector
    gets its ``k`` most cosine-similar neighbors from its own
    nearest-centroid cell (the contrastive-pair / hard-negative
    mining primitive — a full corpus×corpus KNN is quadratic, the
    IVF-cell restriction makes it Σ|cell|² with the usual
    num_centroids ≈ n/target_cell sizing and the same ``max_cell``
    hot-cell cap as :func:`semdedup`). One cell-keyed self-join, then
    a per-vector row_number rank — the rank window's keys are the
    corpus ids, so no hot partition. Output: vec_id, nn_id, rank,
    cosine (desc, nn_id-asc tiebreak)."""
    assigned = (
        ivf_assign(df, vec_col, id_col, num_centroids)
        if centroids is None
        else _assign_to(df, centroids, vec_col, id_col)
    )
    if max_cell is not None:
        small = (
            assigned.groupBy("cid")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") <= max_cell)
            .select("cid")
        )
        assigned = assigned.join(small, "cid", "left_semi")
    from pyspark import StorageLevel

    # both self-join branches consume the assigned+normalized vectors;
    # persist so centroid scoring + normalization run once, not twice
    # (n×(d+2) doubles — bounded by the corpus, never pairs)
    normed = assigned.selectExpr("vid", "cid", f"{_UNIT} AS vn").transform(
        cached
    )
    # pair stage — two regimes with identical results (round 7; the
    # 10× heavy-family bench showed the Σ|cell|²·d interpreted-HOF
    # dots as the operator's quadratic-creep term):
    #   sql   — cell-keyed self-join + per-pair HOF dot + rank window
    #   numpy — one Arrow pass per cell: fold-order-matched (m,m)
    #           score block in row chunks, stable top-k per row
    #           (== (cosine desc, nn_id asc)); exact-rounding fallback
    #           for boundary-risky cells. Equality machine-gated in
    #           tests/test_round7_ops.py.
    # auto: ALWAYS numpy (round 8) — A/B at 500/2000/20000 vectors put
    # the Arrow kernel 1.3-4x ahead at every size (the per-pair
    # interpreted HOF dot never beats a vectorized (m,m) block once a
    # cell holds more than a handful of vectors; Arrow fixed cost is
    # already amortized at 500 rows). "sql" stays forceable — it is
    # the pure-JVM twin the equality gate checks the kernel against.
    if pair_strategy not in ("auto", "numpy", "sql"):
        raise ValueError(
            f"pair_strategy must be 'auto', 'numpy' or 'sql', got "
            f"{pair_strategy!r}"
        )
    use_numpy = pair_strategy != "sql"
    if use_numpy:
        id_type = dict(normed.dtypes)["vid"]
        return _knn_pairs_numpy(normed, k, id_type).selectExpr(
            f"vid AS {bq(id_col)}", "nn_id", "rank", "cosine"
        )
    a = normed.selectExpr("vid", "vn AS va", "cid")
    b = normed.selectExpr("vid AS nn_id", "vn AS vb", "cid")
    scored = (
        a.join(b, on="cid")
        .filter(F.col("vid") != F.col("nn_id"))
        .selectExpr(
            "vid", "nn_id", f"round({_PAIR_DOT}, 6) AS cosine"
        )
    )
    w = Window.partitionBy("vid").orderBy(F.desc("cosine"), F.asc("nn_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .selectExpr(f"vid AS {bq(id_col)}", "nn_id", "rank", "cosine")
    )


def _semdedup_drops_numpy(
    normed: DataFrame, min_cosine: float, id_type: str
) -> DataFrame:
    """Per-cell Arrow kernel for the semdedup drop set: emit every vid
    that has a SMALLER-id cellmate with round6(cosine) ≥ threshold.

    Same exactness discipline as :func:`_knn_pairs_numpy` — the (m, m)
    cosine block accumulates with the dimension-ordered fold of
    ``_PAIR_DOT`` over the SAME Spark-normalized ``vn`` vectors, 6-dp
    half-up block rounding with the exact decimal fallback for
    boundary-risky rows — so the drop decisions match the SQL cell
    self-join bit-for-bit (equality-gated in tests/test_round9_ops.py).
    Chunked in 1024-row blocks: memory stays O(chunk·m), and only
    columns j < global row index are ever consulted (the id_a < id_b
    triangle), so each chunk's block is (chunk, hi) not (chunk, m)."""
    import numpy as np
    import pandas as pd

    from institutional_fx_etl_spark.functions import npexact as npe

    def per_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vid").reset_index(drop=True)
        m = len(pdf)
        drops = []
        if m >= 2:
            X = np.array(pdf["vn"].tolist(), dtype=np.float64)
            vids = pdf["vid"].to_numpy()
            for lo in range(0, m, 1024):
                hi = min(lo + 1024, m)
                if hi <= 1:
                    continue
                # columns 0..hi-2 suffice: row g consults j < g only
                cc = npe.fold_dot(X[lo:hi], X[:hi])
                rc, risky = npe.round6_block(cc)
                for r in range(hi - lo):
                    g = lo + r
                    if g == 0:
                        continue
                    if risky[r, :g].any():
                        row = npe.exact_row_round(cc[r])[:g]
                    else:
                        row = rc[r, :g]
                    if (row >= min_cosine).any():
                        drops.append(vids[g])
        return pd.DataFrame({"vid": drops})

    schema = f"vid {id_type}"
    return normed.groupBy("cid").applyInPandas(per_cell, schema=schema)


def _knn_pairs_numpy(normed: DataFrame, k: int, id_type: str) -> DataFrame:
    """Per-cell Arrow KNN kernel over pre-normalized vectors
    (``vid, cid, vn``): the (m, m) cosine block is accumulated with
    the same dimension-ordered fold as ``_PAIR_DOT`` and processed in
    1024-row chunks so memory stays O(chunk·m), never O(m²) for a hot
    cell. Stable argsort over cid-sorted columns reproduces the SQL
    (cosine desc, nn_id asc) rank exactly; boundary-risky cells
    re-round through the exact decimal path."""
    import numpy as np
    import pandas as pd

    from institutional_fx_etl_spark.functions import npexact as npe

    def per_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vid").reset_index(drop=True)
        m = len(pdf)
        out = {"vid": [], "nn_id": [], "rank": [], "cosine": []}
        if m >= 2:
            X = np.array(pdf["vn"].tolist(), dtype=np.float64)
            vids = pdf["vid"].to_numpy()
            kk = min(k, m - 1)
            for lo in range(0, m, 1024):
                hi = min(lo + 1024, m)
                cc = npe.fold_dot(X[lo:hi], X)
                rc, risky = npe.round6_block(cc)
                for r in range(hi - lo):
                    risky[r, lo + r] = False
                    rc[r, lo + r] = -np.inf
                order = np.argsort(-rc, axis=1, kind="stable")[:, :kk]
                bad = set(np.nonzero(risky.any(axis=1))[0].tolist())
                for r in range(hi - lo):
                    if r in bad:
                        er = npe.exact_row_round(cc[r])
                        er[lo + r] = -np.inf
                        idx = np.argsort(-er, kind="stable")[:kk]
                        vals = er
                    else:
                        idx = order[r]
                        vals = rc[r]
                    for rank0, j in enumerate(idx):
                        out["vid"].append(vids[lo + r])
                        out["nn_id"].append(vids[j])
                        out["rank"].append(rank0 + 1)
                        out["cosine"].append(float(vals[j]))
        return pd.DataFrame(out)

    schema = f"vid {id_type}, nn_id {id_type}, rank int, cosine double"
    return normed.groupBy("cid").applyInPandas(per_cell, schema=schema)


#: Frozen 64-dim ADC demo query vector: pure integer-arithmetic
#: rationals ((i·37+11) mod 97 − 48)/97 so no libm call is involved —
#: the same decimal literals parse to the same doubles on both
#: engines.
_ADC_QUERY = [((i * 37 + 11) % 97 - 48) / 97.0 for i in range(64)]


def pq_adc_topk(
    df: DataFrame,
    query: list | None = None,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    codebook: list | None = None,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k search over PQ codes — the scan
    stage of an IVF-PQ index: the query is NOT quantized; instead a
    per-subspace lookup table ``lut[m][c] = ‖q_m − centroid_{m,c}‖²``
    is computed ONCE (M·K doubles, driver-side, frozen into literals)
    and each row's approximate distance is M table lookups + an add
    chain — no per-row vector math at all, which is why PQ scans rate
    billions of vectors per node.

    Plan: :func:`pq_encode`'s pure scan map → ``element_at`` lookups
    into the LUT literal arrays → ``TakeOrderedAndProject`` partial
    top-k (per-partition k, then a k-row final merge — no global
    sort). Ordering uses the UNROUNDED adc (bit-identical on both
    engines: same literals, same left-assoc add chain) with the id as
    total-order tiebreak.

    Output: ``id``, ``code_0..code_{M-1}``, ``adc_dist`` (round 6) —
    the ``k`` nearest by approximate distance.
    """
    cb = codebook if codebook is not None else _PQ_CODEBOOK
    q = query if query is not None else _ADC_QUERY
    m_sub, k_cent = len(cb), len(cb[0])
    dims = len(cb[0][0])
    codes = pq_encode(df, vec_col=vec_col, id_col=id_col, codebook=cb)
    luts = [
        [
            sum(
                (q[m * dims + d] - cb[m][c][d]) ** 2
                for d in range(dims)
            )
            for c in range(k_cent)
        ]
        for m in range(m_sub)
    ]
    terms = [
        "element_at(array("
        + ", ".join(f"{v!r}D" for v in luts[m])
        + f"), code_{m} + 1)"
        for m in range(m_sub)
    ]
    adc = " + ".join(terms)
    code_cols = [f"code_{m}" for m in range(m_sub)]
    return (
        codes.selectExpr("id", *code_cols, f"{adc} AS __adc")
        .orderBy("__adc", "id")
        .limit(k)
        .selectExpr("id", *code_cols, "round(__adc, 6) AS adc_dist")
    )


def lsh_multiprobe_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 8,
    num_probes: int = 2,
    min_cosine: float = 0.3,
) -> DataFrame:
    """Multi-probe LSH near-neighbor pairs (Lv et al., VLDB 2007):
    besides its own bucket, every vector probes the buckets reached
    by flipping its ``num_probes`` LOWEST-MARGIN hyperplane bits —
    the planes its projection barely cleared, exactly where a true
    neighbor most likely landed on the other side. Recall rises like
    multi-table LSH's L>1 without building or storing extra tables:
    the index side stays ONE bucket per vector; only the probe side
    fans out (1 + num_probes rows per vector).

    Candidates are (probe bucket of a) = (main bucket of b), ids
    deduped unordered before the single exact-cosine verify — the
    same narrow-shuffle discipline as :func:`lsh_ann_pairs`. Margins
    are the raw projection folds (bit-identical across engines), so
    the probe choice is deterministic and the oracle mirrors it.

    Scale contract: candidate work is (1 + num_probes) · Σ|bucket|²
    — the multiplier is a constant, and ``num_planes`` still must
    grow with n (pass :func:`auto_planes`).

    Output: bucket (the smallest matched index bucket), id_a < id_b,
    cosine (6dp, ≥ ``min_cosine``).
    """
    planes = _plane_matrix_literal(num_planes, 64)
    projs = (
        f"transform(sequence(0, {num_planes - 1}), j ->"
        f" aggregate(zip_with(__u, element_at({planes}, j+1),"
        " (x, s) -> x*s), 0.0d, (a, x) -> a + x))"
    )
    bucket = (
        f"aggregate(transform(sequence(0, {num_planes - 1}), j ->"
        " CASE WHEN element_at(__pj, j+1) > 0 THEN shiftleft(1L, j)"
        " ELSE 0L END), 0L, (a, x) -> a + x)"
    )
    flips = (
        f"transform(slice(array_sort(transform(sequence(0, {num_planes - 1}),"
        " j -> struct(abs(element_at(__pj, j+1)) AS m, j AS j))),"
        f" 1, {num_probes}), s -> __b ^ shiftleft(1L, s.j))"
    )
    full = let1(
        _as_double(vec_col),
        "__u",
        let1(
            projs,
            "__pj",
            let1(
                bucket,
                "__b",
                f"named_struct('bucket', __b, 'probes',"
                f" concat(array(__b), {flips}))",
            ),
        ),
    )
    sigs = df.selectExpr(
        bq(id_col), f"inline(array({full}))"
    ).localCheckpoint(eager=False)
    p = sigs.selectExpr(
        f"{bq(id_col)} AS pid", "explode(probes) AS pb"
    )
    mn = sigs.selectExpr(f"{bq(id_col)} AS mid", "bucket AS pb")
    cands = (
        p.join(mn, "pb")
        .filter("pid <> mid")
        .selectExpr(
            "least(pid, mid) AS id_a",
            "greatest(pid, mid) AS id_b",
            "pb",
        )
        .groupBy("id_a", "id_b")
        .agg(F.min("pb").alias("bucket"))
    )
    vunit = let1(_as_double(vec_col), "__u", _unit_expr("__u"))
    va = df.selectExpr(f"{bq(id_col)} AS id_a", f"{vunit} AS va")
    vb = df.selectExpr(f"{bq(id_col)} AS id_b", f"{vunit} AS vb")
    return (
        cands.join(va, on="id_a")
        .join(vb, on="id_b")
        .selectExpr(
            "bucket", "id_a", "id_b", f"round({_PAIR_DOT}, 6) AS cosine"
        )
        .filter(F.col("cosine") >= min_cosine)
    )


def ivfpq_topk(
    df: DataFrame,
    query: list | None = None,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_centroids: int = 8,
    nprobe: int = 2,
    codebook: list | None = None,
    max_cell: int | None = None,
) -> DataFrame:
    """IVF-PQ search — the full billion-scale ANN index architecture
    (Jégou et al., TPAMI 2011; the FAISS ``IVFPQ`` default): the
    coarse IVF quantizer restricts the scan to the query's ``nprobe``
    nearest cells, and inside those cells distance is the PQ
    asymmetric-distance (ADC) lookup-table scan — so cost is
    ``(nprobe/num_centroids) · n`` table lookups, with neither a full
    corpus scan (IVF's win) nor per-row vector math (PQ's win).

    Composition of the certified pieces: :func:`_assign_to` cell
    assignment (id-seeded deterministic centroids), the
    :func:`pq_adc_topk` LUT scan, a driver-frozen rational query.
    The probe-cell choice ranks the BOUNDED centroid relation against
    the query literal (cosine, 6dp, cid tiebreak) — no corpus
    involvement. Output: id, cid (the cell each hit came from),
    adc_dist (6dp), the k nearest by (unrounded adc, id).

    ``max_cell`` is the family's standard hot-cell cap (r12 verdict
    task #5 — under direction skew a hot cell makes the probed
    fraction of the corpus grow with the skew, 28.2× wall for
    constant output in the x100 probe): a probed cell whose
    population exceeds the cap is SKIPPED by the ADC scan, exactly
    the semdedup/knn_join discipline, and the skipped mass is
    first-class accounted by :func:`ivfpq_probe_report` on the same
    inputs (never a silent drop). Default None — unconditionally
    complete over the probed cells.
    """
    cb = codebook if codebook is not None else _PQ_CODEBOOK
    q = query if query is not None else _ADC_QUERY
    m_sub, k_cent = len(cb), len(cb[0])
    dims = len(cb[0][0])
    v = df.selectExpr(f"{bq(id_col)} AS vid", f"{_as_double(vec_col)} AS vv")
    centroids = v.filter(F.col("vid") < num_centroids).selectExpr(
        "vid AS cid", "vv AS cv"
    )
    assigned = _assign_to(df, centroids, vec_col, id_col)
    qlit = "array(" + ", ".join(f"{x!r}D" for x in q) + ")"
    probe = (
        centroids.selectExpr(
            "cid",
            f"round(aggregate(zip_with(cv, {qlit}, (x, y) -> x*y),"
            " 0.0d, (a, x) -> a + x)"
            " / (sqrt(aggregate(cv, 0.0d, (a, x) -> a + x*x))"
            f" * sqrt(aggregate({qlit}, 0.0d, (a, x) -> a + x*x))), 6)"
            " AS ccos",
        )
        .orderBy(F.desc("ccos"), F.asc("cid"))
        .limit(nprobe)
        .select("cid")
    )
    if max_cell is not None:
        small = (
            assigned.groupBy("cid")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") <= int(max_cell))
            .select("cid")
        )
        probe = probe.join(F.broadcast(small), "cid", "left_semi")
    sub = assigned.join(F.broadcast(probe), "cid")
    codes = pq_encode(
        sub.selectExpr(f"vid AS {bq(id_col)}", f"vv AS {bq(vec_col)}"),
        vec_col=vec_col,
        id_col=id_col,
        codebook=cb,
    )
    luts = [
        [
            sum((q[m * dims + d] - cb[m][c][d]) ** 2 for d in range(dims))
            for c in range(k_cent)
        ]
        for m in range(m_sub)
    ]
    terms = [
        "element_at(array("
        + ", ".join(f"{val!r}D" for val in luts[m])
        + f"), code_{m} + 1)"
        for m in range(m_sub)
    ]
    adc = " + ".join(terms)
    return (
        codes.selectExpr("id", f"{adc} AS __adc")
        .join(assigned.selectExpr("vid AS id", "cid"), "id")
        .orderBy("__adc", "id")
        .limit(k)
        # BIGINT: the literal-HOF assignment emits cid as INT while the
        # oracle's vec_id-seeded cid is BIGINT (width-sensitive hash)
        .selectExpr(
            "id", "CAST(cid AS BIGINT) AS cid", "round(__adc, 6) AS adc_dist"
        )
    )


def ivfpq_probe_report(
    df: DataFrame,
    query: list | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_centroids: int = 8,
    nprobe: int = 2,
    max_cell: int | None = None,
) -> DataFrame:
    """Probed-fraction accounting for :func:`ivfpq_topk` (r12 verdict
    task #5 — the one ANN family member whose skew exposure had
    neither a cap nor a visible cost): for the SAME corpus, query and
    probe parameters, one row reporting how much of the corpus the
    ADC scan will actually touch, so a skew-driven blowup
    (hot cells absorbing the distribution) is measured, not
    discovered in the wall clock.

    With ``max_cell`` set, also accounts what the capped scan SKIPS
    (probed cells over the cap — the :func:`prefix_filter_cap_report`
    policy: a bounded operator always ships its drop ledger).

    Cost: the same cell-assignment scan ivfpq_topk already pays plus
    one centroid-bounded aggregate — never the ADC work itself.
    Output: n_corpus, n_cells (populated), n_cells_probed,
    n_probed_rows, probed_fraction (6 dp), max_probed_cell,
    n_probed_over_cap, rows_skipped_by_cap.
    """
    q = query if query is not None else _ADC_QUERY
    cap = int(max_cell) if max_cell is not None else None
    v = df.selectExpr(f"{bq(id_col)} AS vid", f"{_as_double(vec_col)} AS vv")
    centroids = v.filter(F.col("vid") < num_centroids).selectExpr(
        "vid AS cid", "vv AS cv"
    )
    assigned = _assign_to(df, centroids, vec_col, id_col)
    qlit = "array(" + ", ".join(f"{x!r}D" for x in q) + ")"
    probe = (
        centroids.selectExpr(
            "cid",
            f"round(aggregate(zip_with(cv, {qlit}, (x, y) -> x*y),"
            " 0.0d, (a, x) -> a + x)"
            " / (sqrt(aggregate(cv, 0.0d, (a, x) -> a + x*x))"
            f" * sqrt(aggregate({qlit}, 0.0d, (a, x) -> a + x*x))), 6)"
            " AS ccos",
        )
        .orderBy(F.desc("ccos"), F.asc("cid"))
        .limit(nprobe)
        .select("cid")
    )
    sizes = assigned.groupBy("cid").agg(F.count(F.lit(1)).alias("__n"))
    tot = assigned.agg(
        F.expr("CAST(count(1) AS BIGINT) AS n_corpus"),
        F.expr("CAST(count(DISTINCT cid) AS BIGINT) AS n_cells"),
    )
    over = (
        f"CASE WHEN __n > {cap} THEN" if cap is not None else
        "CASE WHEN FALSE THEN"
    )
    # coalesce discipline (r13 ADVICE, mirrors
    # prefix_filter_cap_report): with NO populated probed cell (e.g.
    # a corpus with no vec_id < num_centroids) the join relation is
    # EMPTY and bare SUM/MAX would report NULL instead of 0; an empty
    # corpus would divide probed_fraction by n_corpus = 0.
    return (
        sizes.join(F.broadcast(probe), "cid")
        .agg(
            F.expr("CAST(count(1) AS BIGINT) AS n_cells_probed"),
            F.expr(
                "CAST(coalesce(SUM(__n), 0) AS BIGINT) AS n_probed_rows"
            ),
            F.expr(
                "CAST(coalesce(MAX(__n), 0) AS BIGINT)"
                " AS max_probed_cell"
            ),
            F.expr(
                f"CAST(coalesce(SUM({over} 1 ELSE 0 END), 0) AS BIGINT)"
                " AS n_probed_over_cap"
            ),
            F.expr(
                f"CAST(coalesce(SUM({over} __n ELSE 0 END), 0)"
                " AS BIGINT) AS rows_skipped_by_cap"
            ),
        )
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "n_corpus",
            "n_cells",
            "n_cells_probed",
            "n_probed_rows",
            "CASE WHEN n_corpus > 0 THEN"
            " round(CAST(n_probed_rows AS DOUBLE) / n_corpus, 6)"
            " ELSE CAST(0 AS DOUBLE) END AS probed_fraction",
            "max_probed_cell",
            "n_probed_over_cap",
            "rows_skipped_by_cap",
        )
    )


def _inertia_numpy(v: DataFrame, rows: list) -> DataFrame:
    """Arrow-batched (vid, cid, d2_micro) assignment for
    :func:`kmeans_inertia`, bit-identical to the literal-HOF scan:
    d² = nv² + nc² − 2·dot with dimension-ordered folds
    (``npexact.fold_dot``/``fold_sqnorm``; nc² is the same scalar
    left fold as the literal), elementwise ``(a+b)-(2·c)`` in the
    HOF's association, first-min argmin over cid-ascending columns
    (== the (d2 asc, cid asc) sort), and the identical
    ``floor(d2·1e6 + 0.5)`` quantization. ``rows`` must be
    cid-sorted."""
    import numpy as np
    import pandas as pd

    from institutional_fx_etl_spark.functions import npexact as npe

    cids = np.array([int(r["cid"]) for r in rows], dtype=np.int64)
    C = np.array(
        [[float(x) for x in r["cv"]] for r in rows], dtype=np.float64
    )
    nc2 = np.empty(len(rows), dtype=np.float64)
    for i, r in enumerate(rows):
        acc = 0.0
        for x in r["cv"]:
            acc += float(x) * float(x)
        nc2[i] = acc
    vid_type = dict(v.dtypes)["vid"]
    schema = f"vid {vid_type}, cid bigint, d2_micro bigint"

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(pdf["vv"].tolist(), dtype=np.float64)
            d2 = (npe.fold_sqnorm(X)[:, None] + nc2[None, :]) - (
                2.0 * npe.fold_dot(X, C)
            )
            win = d2.argmin(axis=1)
            best = d2[np.arange(len(d2)), win]
            yield pd.DataFrame(
                {
                    "vid": pdf["vid"],
                    "cid": cids[win],
                    "d2_micro": np.floor(best * 1e6 + 0.5).astype(
                        np.int64
                    ),
                }
            )

    return v.mapInPandas(score, schema=schema)


def kmeans_inertia(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_centroids: int = 8,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Clustering-quality evaluation: per-cell inertia (Σ of each
    member's squared L2 distance to its nearest centroid) — the
    number you watch when sizing an IVF index or comparing centroid
    seedings. Assignment = arg min over (d², cid); default centroids
    are the deterministic vid < ``num_centroids`` seeding, so the
    whole statistic is SQL-oracle-exact (pass
    :func:`kmeans_centroids` output for the trained variant).

    Determinism discipline: d² uses the norm identity
    ``|v|² + |c|² − 2·v·c`` with the SAME fold and association in
    Spark, DuckDB (``list_dot_product``) and the Python literal
    pre-computation — the proven cosine-pairing trick — and each
    vector's d² is micro-quantized to int64 BEFORE the Σ, so per-cell
    inertia is an exact integer sum, immune to aggregation order.

    Plan: centroid literal (bounded k-row collect, the
    ``_scored_cells_expr`` transfer), ONE scan-side map over the
    corpus, one cell-keyed aggregate — no corpus×k join relation, no
    per-vid window. Above :data:`MAX_HOF_CENTROIDS` the scan map runs
    as the Arrow kernel (:func:`_inertia_numpy` — the
    ``_assign_numpy`` regime: the k·d interpreted-HOF dispatches per
    row are the cost term; 64 centroids × 1M docs measured 27.7 s HOF
    vs the vectorized pass), computing bit-identical doubles
    (dimension-ordered folds), so the oracle hash is regime-free
    (equality machine-gated in tests/test_round9_ops.py).

    Output: cid (BIGINT), n_vectors (BIGINT), inertia_micro (BIGINT),
    mean_d2 (DOUBLE, 6dp).
    """
    v = df.selectExpr(
        f"{bq(id_col)} AS vid", f"{_as_double(vec_col)} AS vv"
    )
    if centroids is None:
        centroids = v.filter(F.col("vid") < num_centroids).selectExpr(
            "vid AS cid", "vv AS cv"
        )
    rows = sorted(
        _bounded_centroid_rows(centroids), key=lambda r: r["cid"]
    )
    if len(rows) > MAX_HOF_CENTROIDS:
        assigned = _inertia_numpy(v, rows)
    else:
        lits = []
        for r in rows:
            cv = ", ".join(f"{float(x)!r}D" for x in r["cv"])
            acc = 0.0  # |c|² via the same left fold as the SQL aggregate
            for x in r["cv"]:
                acc += float(x) * float(x)
            lits.append(
                f"named_struct('cid', CAST({int(r['cid'])} AS BIGINT),"
                f" 'cv', array({cv}), 'nc2', {acc!r}D)"
            )
        cents = "array(" + ", ".join(lits) + ")"
        dot = (
            "aggregate(zip_with(vv, c.cv, (x, y) -> x*y), 0.0d,"
            " (a, x) -> a + x)"
        )
        scored = (
            f"array_sort(transform({cents}, c -> named_struct('cid',"
            f" c.cid, 'd2', __nv2 + c.nc2 - 2.0D*{dot})),"
            " (l, r) -> CASE WHEN l.d2 < r.d2 THEN -1"
            " WHEN l.d2 > r.d2 THEN 1"
            " WHEN l.cid < r.cid THEN -1 WHEN l.cid > r.cid THEN 1"
            " ELSE 0 END)"
        )
        best = let1(
            "aggregate(vv, 0.0d, (a, x) -> a + x*x)",
            "__nv2",
            f"element_at({scored}, 1)",
        )
        assigned = v.selectExpr("vid", f"{best} AS __best").selectExpr(
            "vid",
            "__best.cid AS cid",
            "CAST(floor(__best.d2 * 1000000.0D + 0.5D) AS BIGINT)"
            " AS d2_micro",
        )
    return (
        assigned.groupBy("cid")
        .agg(
            F.expr("CAST(count(1) AS BIGINT) AS n_vectors"),
            F.expr("CAST(SUM(d2_micro) AS BIGINT) AS inertia_micro"),
        )
        .selectExpr(
            "cid",
            "n_vectors",
            "inertia_micro",
            "round(CAST(inertia_micro AS DOUBLE)"
            " / CAST(n_vectors AS DOUBLE) / 1000000.0D, 6) AS mean_d2",
        )
    )


def embedding_decontaminate(
    train: DataFrame,
    test: DataFrame,
    min_cosine: float = 0.8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_centroids: int = 8,
    centroids: DataFrame | None = None,
    pair_strategy: str = "auto",
) -> DataFrame:
    """Embedding-level eval-set decontamination: flag every TEST
    vector whose cosine to ANY train vector reaches ``min_cosine`` —
    the semantic complement of the n-gram
    ``text.decontaminate_against`` (paraphrased leakage has no shared
    13-gram, but its embedding sits next to the train doc).

    Cell-blocked like :func:`semdedup`: both tables assign to the
    SAME centroid set (default: deterministic first-N seeding from
    the TRAIN side; pass :func:`kmeans_centroids` for trained cells),
    and the cross-table compare joins on the cell id — cost is
    Σ |train_cell|·|test_cell|, never |train|·|test|. A paraphrase
    whose nearest cell differs from its source's is the recall
    boundary, the standard IVF trade (raise num_centroids' nprobe
    twin :func:`ivf_topk` for the search-grade variant).

    ``pair_strategy`` mirrors :func:`semdedup`/:func:`knn_join`:
    ``auto``/``numpy`` runs the cross-table compare as one Arrow pass
    per cell (:func:`_decontaminate_numpy` — fold-order-matched
    doubles, exact-rounding fallback, so the flagged set is
    bit-identical); ``sql`` forces the pure-JVM cell join, the
    equality gate's reference.

    Output (contaminated rows only): test_id, n_matches (BIGINT),
    max_cosine (DOUBLE, 6dp), match_id (argmax train id, min-id
    tiebreak).
    """
    if pair_strategy not in ("auto", "numpy", "sql"):
        raise ValueError(
            f"pair_strategy must be 'auto', 'numpy' or 'sql', got "
            f"{pair_strategy!r}"
        )
    v = train.selectExpr(
        f"{bq(id_col)} AS vid", f"{_as_double(vec_col)} AS vv"
    )
    if centroids is None:
        centroids = v.filter(F.col("vid") < num_centroids).selectExpr(
            "vid AS cid", "vv AS cv"
        )
    ta = _assign_to(train, centroids, vec_col, id_col).selectExpr(
        "cid", "vid AS train_id", f"{_UNIT} AS va"
    )
    tb = _assign_to(test, centroids, vec_col, id_col).selectExpr(
        "cid", "vid AS test_id", f"{_UNIT} AS vb"
    )
    if pair_strategy != "sql":
        id_type = dict(ta.dtypes)["train_id"]
        return _decontaminate_numpy(ta, tb, min_cosine, id_type)
    scored = (
        ta.join(tb, "cid")
        .selectExpr(
            "test_id", "train_id", f"round({_PAIR_DOT}, 6) AS cosine"
        )
        .filter(F.col("cosine") >= min_cosine)
    )
    return scored.groupBy("test_id").agg(
        F.expr("CAST(count(1) AS BIGINT) AS n_matches"),
        F.expr("MAX(cosine) AS max_cosine"),
        F.expr(
            "min_by(train_id, named_struct('c', -cosine, 'i', train_id))"
            " AS match_id"
        ),
    )


def _decontaminate_numpy(
    ta: DataFrame, tb: DataFrame, min_cosine: float, id_type: str
) -> DataFrame:
    """Per-cell Arrow kernel for :func:`embedding_decontaminate`: the
    (tests, trains) cosine block per cell, accumulated with the
    dimension-ordered ``_PAIR_DOT`` fold over the SAME Spark-normalized
    unit vectors, 6-dp half-up block rounding with the exact decimal
    fallback — per-test (count ≥ t, max, first-max train id over
    id-ascending columns) matches the SQL cell join + min_by aggregate
    bit-for-bit (equality-gated in tests/test_round9_ops.py). A test
    vector lives in exactly ONE cell, so per-cell emission IS the
    final grain — no cross-cell merge. Chunked in 1024 test rows:
    memory O(chunk·m_train)."""
    import numpy as np
    import pandas as pd

    from institutional_fx_etl_spark.functions import npexact as npe

    a = ta.selectExpr("cid", "train_id AS id", "va AS u", "1 AS side")
    b = tb.selectExpr("cid", "test_id AS id", "vb AS u", "2 AS side")
    both = a.unionByName(b)

    def per_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        tr = pdf[pdf["side"] == 1].sort_values("id")
        te = pdf[pdf["side"] == 2].sort_values("id")
        out = {"test_id": [], "n_matches": [], "max_cosine": [],
               "match_id": []}
        if len(tr) and len(te):
            T = np.array(tr["u"].tolist(), dtype=np.float64)
            tids = tr["id"].to_numpy()
            Q = np.array(te["u"].tolist(), dtype=np.float64)
            qids = te["id"].to_numpy()
            for lo in range(0, len(Q), 1024):
                hi = min(lo + 1024, len(Q))
                cc = npe.fold_dot(Q[lo:hi], T)
                rc, risky = npe.round6_block(cc)
                for r in range(hi - lo):
                    row = (
                        npe.exact_row_round(cc[r])
                        if risky[r].any()
                        else rc[r]
                    )
                    mask = row >= min_cosine
                    n = int(mask.sum())
                    if n == 0:
                        continue
                    mx = row[mask].max()
                    # first max over id-ascending columns == the
                    # (-cosine, train_id) min_by tiebreak
                    arg = int(np.argmax(np.where(mask, row, -np.inf)))
                    out["test_id"].append(qids[lo + r])
                    out["n_matches"].append(n)
                    out["max_cosine"].append(float(mx))
                    out["match_id"].append(tids[arg])
        return pd.DataFrame(out)

    schema = (
        f"test_id {id_type}, n_matches bigint, max_cosine double,"
        f" match_id {id_type}"
    )
    return both.groupBy("cid").applyInPandas(per_cell, schema=schema)


def bitext_margin(
    df: DataFrame,
    side_expr: str = "vid % 2 = 0",
    k: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_centroids: int = 8,
    centroids: DataFrame | None = None,
    max_cell: int | None = None,
    pair_strategy: str = "auto",
) -> DataFrame:
    """Margin-based parallel-pair mining (Artetxe & Schwenk 2019 — the
    LASER/CCMatrix bitext-mining criterion): the corpus splits into a
    source side A (``side_expr`` over the id, e.g. one language's
    vectors) and a target side B; a candidate pair's raw cosine is
    normalized by the mean similarity of each endpoint's k nearest
    cross-side neighbors — ``margin(a,b) = cos(a,b) / ((fwd_k(a) +
    bwd_k(b)) / 2)`` — which cancels hubness (a vector that is close
    to EVERYTHING scores no pair highly). Emitted: each source
    vector's best target by margin.

    Candidates are IVF-cell-bounded exactly like :func:`knn_join`
    (shared centroids over BOTH sides, Σ|cell_A|·|cell_B| pairs —
    never |A|·|B|), so the same num_centroids ≈ n/512 sizing keeps the
    pair stage linear in the corpus; ``max_cell`` is the standard
    hot-cell cap for skewed (template-heavy) embedding corpora. The pair relation persists once
    and feeds the forward top-k, the backward top-k and the margin
    join.

    Determinism: per-pair cosines round to 6 dp then micro-quantize to
    BIGINT; forward/backward means stay exact integer sums with
    explicit counts, and the margin is ONE division of exact integers
    — ``2·cos·ka·kb / (Σfwd·kb + Σbwd·ka)`` — rounded to 6.

    Output: src_id, tgt_id, cosine, margin.

    Cache lifetime (SQL pair strategy): the candidate-pair relation
    is persisted because the forward and backward top-k windows both
    read it; the returned DataFrame is lazy, so the CALLER owns the
    cache (``spark.catalog.clearCache()`` between repeated calls — the
    ``dedup_clusters`` discipline, round-10 ADVICE #4).
    """
    assigned = (
        ivf_assign(df, vec_col, id_col, num_centroids)
        if centroids is None
        else _assign_to(df, centroids, vec_col, id_col)
    )
    if max_cell is not None:
        small = (
            assigned.groupBy("cid")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") <= max_cell)
            .select("cid")
        )
        assigned = assigned.join(small, "cid", "left_semi")
    from pyspark import StorageLevel

    normed = assigned.selectExpr("vid", "cid", f"{_UNIT} AS vn")
    # pair stage — two regimes with identical results (the knn_join
    # discipline): the Arrow kernel computes the whole margin pipeline
    # CELL-LOCALLY (fwd/bwd top-k, integer margin arithmetic, best per
    # source) and emits only |A| rows — no pair relation ever
    # materializes; "sql" is the pure-JVM twin the equality gate
    # checks the kernel against.
    if pair_strategy not in ("auto", "numpy", "sql"):
        raise ValueError(
            f"pair_strategy must be 'auto', 'numpy' or 'sql', got "
            f"{pair_strategy!r}"
        )
    if pair_strategy != "sql":
        id_type = dict(normed.dtypes)["vid"]
        sided = normed.selectExpr(
            "vid", "cid", "vn", f"({side_expr}) AS __side"
        )
        return _bitext_margin_numpy(sided, k, id_type).selectExpr(
            "src_id", "tgt_id", "cosine", "margin"
        )
    a = normed.filter(side_expr).selectExpr("cid", "vid AS src", "vn AS va")
    b = normed.filter(f"NOT ({side_expr})").selectExpr(
        "cid", "vid AS tgt", "vn AS vb"
    )
    pairs = (
        a.join(b, "cid")
        .selectExpr("src", "tgt", f"round({_PAIR_DOT}, 6) AS cosine")
        .selectExpr(
            "src",
            "tgt",
            "cosine",
            "CAST(round(cosine * 1e6, 0) AS BIGINT) AS __cm",
        )
        .transform(cached)
    )
    wf = Window.partitionBy("src").orderBy(F.desc("cosine"), F.asc("tgt"))
    fwd = pairs.withColumn("__fr", F.row_number().over(wf)).filter(
        F.col("__fr") <= k
    )
    fstat = fwd.groupBy("src").agg(
        F.sum("__cm").alias("__fs"), F.count(F.lit(1)).alias("__ka")
    )
    wb = Window.partitionBy("tgt").orderBy(F.desc("cosine"), F.asc("src"))
    bstat = (
        pairs.withColumn("__br", F.row_number().over(wb))
        .filter(F.col("__br") <= k)
        .groupBy("tgt")
        .agg(F.sum("__cm").alias("__bs"), F.count(F.lit(1)).alias("__kb"))
    )
    cand = (
        fwd.join(fstat, "src")
        .join(bstat, "tgt")
        .filter("__fs * __kb + __bs * __ka > 0")
        .selectExpr(
            "src",
            "tgt",
            "cosine",
            "round(CAST(2 * __cm * __ka * __kb AS DOUBLE)"
            " / (__fs * __kb + __bs * __ka), 6) AS margin",
        )
    )
    wm = Window.partitionBy("src").orderBy(F.desc("margin"), F.asc("tgt"))
    return (
        cand.withColumn("__mr", F.row_number().over(wm))
        .filter(F.col("__mr") == 1)
        .selectExpr("src AS src_id", "tgt AS tgt_id", "cosine", "margin")
    )


def _bitext_margin_numpy(
    sided: DataFrame, k: int, id_type: str
) -> DataFrame:
    """Per-cell Arrow kernel for :func:`bitext_margin`: the ENTIRE
    margin computation is cell-local, so the kernel runs it in one
    pass — (|A|, |B|) cosine block with the dimension-ordered fold and
    exact 6-dp rounding (risky rows re-round through the decimal
    path), micro-int quantization, forward/backward top-k sums as
    exact int64, the ``2·cm·ka·kb / (Σf·kb + Σb·ka)`` margin as one
    correctly-rounded double division (all operands < 2^53), and the
    per-source argmax with the (margin desc, tgt asc) tiebreak.
    Emits |A| rows per cell — the Σ|A|·|B| pair relation of the SQL
    twin never materializes. Equality with the twin is machine-gated
    in tests/test_round10_ops.py."""
    import numpy as np
    import pandas as pd

    from institutional_fx_etl_spark.functions import npexact as npe

    def per_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        out = {"src_id": [], "tgt_id": [], "cosine": [], "margin": []}
        av = pdf[pdf["__side"]].sort_values("vid")
        bv = pdf[~pdf["__side"]].sort_values("vid")
        ma, mb = len(av), len(bv)
        if ma and mb:
            XA = np.array(av["vn"].tolist(), dtype=np.float64)
            XB = np.array(bv["vn"].tolist(), dtype=np.float64)
            a_ids = av["vid"].to_numpy()
            b_ids = bv["vid"].to_numpy()
            cc = npe.fold_dot(XA, XB)
            rc, risky = npe.round6_block(cc)
            for r in np.nonzero(risky.any(axis=1))[0]:
                rc[r] = npe.exact_row_round(cc[r])
            cm = np.rint(rc * 1e6).astype(np.int64)
            ka, kb = min(k, mb), min(k, ma)
            # forward top-k per source row (cosine desc, tgt asc ==
            # ascending col index under stable sort)
            fidx = np.argsort(-rc, axis=1, kind="stable")[:, :ka]
            fs = np.take_along_axis(cm, fidx, axis=1).sum(axis=1)
            # backward top-k per target column
            bidx = np.argsort(-rc, axis=0, kind="stable")[:kb, :]
            bs = np.take_along_axis(cm, bidx, axis=0).sum(axis=0)
            for r in range(ma):
                num = 2 * cm[r, fidx[r]].astype(object) * ka * kb
                den = int(fs[r]) * kb + bs[fidx[r]].astype(object) * ka
                best = None
                for pos in range(ka):
                    d = int(den[pos])
                    if d <= 0:
                        continue
                    marg = npe.round6_exact(int(num[pos]) / d)
                    j = int(fidx[r, pos])
                    cand = (-marg, int(b_ids[j]), float(rc[r, j]))
                    if best is None or cand < best:
                        best = cand
                if best is not None:
                    out["src_id"].append(int(a_ids[r]))
                    out["tgt_id"].append(best[1])
                    out["cosine"].append(best[2])
                    out["margin"].append(-best[0])
        return pd.DataFrame(out)

    schema = (
        f"src_id {id_type}, tgt_id {id_type}, cosine double, margin double"
    )
    return sided.groupBy("cid").applyInPandas(per_cell, schema=schema)


def hard_negatives(
    df: DataFrame,
    label_col: str = "label",
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_centroids: int = 8,
    centroids: DataFrame | None = None,
    pair_strategy: str = "auto",
    max_cell: int | None = None,
) -> DataFrame:
    """Hard-negative mining for contrastive training (the in-batch /
    ANN-negative recipe of DPR, Karpukhin et al. 2020): for EVERY
    vector, its ``k`` most cosine-similar cellmates whose label
    DIFFERS — the near-miss examples a contrastive loss learns most
    from. Same IVF-cell bounding as :func:`knn_join` (Σ|cell|² pairs,
    never corpus²); the label-mismatch predicate applies INSIDE the
    cell join, before the rank window, so ranks are over negatives
    only. NULL labels never match anything (null-safe inequality), so
    unlabeled vectors still mine negatives from labeled cellmates.
    ``max_cell`` is the standard hot-cell cap (semdedup/knn_join
    discipline) for skewed corpora.

    Output: vec_id, neg_id, rank, cosine (desc, neg_id-asc tiebreak).

    Cache lifetime: the normalized-vector relation is persisted
    because both pair sides read it; the returned DataFrame is lazy,
    so the CALLER owns the cache (``spark.catalog.clearCache()``
    between repeated calls — the ``dedup_clusters`` discipline,
    round-10 ADVICE #4).
    """
    assigned = (
        ivf_assign(df, vec_col, id_col, num_centroids)
        if centroids is None
        else _assign_to(df, centroids, vec_col, id_col)
    )
    if max_cell is not None:
        small = (
            assigned.groupBy("cid")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") <= max_cell)
            .select("cid")
        )
        assigned = assigned.join(small, "cid", "left_semi")
    labels = df.selectExpr(
        f"{bq(id_col)} AS vid", f"{bq(label_col)} AS __lbl"
    )
    from pyspark import StorageLevel

    normed = (
        assigned.join(labels, "vid")
        .selectExpr("vid", "cid", "__lbl", f"{_UNIT} AS vn")
        .transform(cached)
    )
    # pair stage — the knn_join two-regime discipline: the Arrow
    # kernel computes the per-cell (m, m) cosine block vectorized and
    # masks same-label columns before the stable top-k (4.1 s -> SQL
    # twin was the round-10 bench's slowest query at sf0.1); "sql" is
    # the pure-JVM twin the equality gate checks the kernel against.
    if pair_strategy not in ("auto", "numpy", "sql"):
        raise ValueError(
            f"pair_strategy must be 'auto', 'numpy' or 'sql', got "
            f"{pair_strategy!r}"
        )
    if pair_strategy != "sql":
        id_type = dict(normed.dtypes)["vid"]
        return _hard_neg_pairs_numpy(normed, k, id_type).selectExpr(
            f"vid AS {bq(id_col)}", "neg_id", "rank", "cosine"
        )
    a = normed.selectExpr("cid", "vid", "vn AS va", "__lbl AS la")
    b = normed.selectExpr("cid", "vid AS neg_id", "vn AS vb", "__lbl AS lb")
    scored = (
        a.join(b, "cid")
        .filter("NOT (la <=> lb)")
        .selectExpr("vid", "neg_id", f"round({_PAIR_DOT}, 6) AS cosine")
    )
    w = Window.partitionBy("vid").orderBy(F.desc("cosine"), F.asc("neg_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .selectExpr(f"vid AS {bq(id_col)}", "neg_id", "rank", "cosine")
    )


def _hard_neg_pairs_numpy(
    normed: DataFrame, k: int, id_type: str
) -> DataFrame:
    """Per-cell Arrow kernel for :func:`hard_negatives`: identical
    exactness discipline to :func:`_knn_pairs_numpy` (dimension-ordered
    fold, 6-dp half-up block rounding, exact decimal fallback for
    boundary-risky rows), with SAME-LABEL columns masked to -inf
    before the stable top-k — the null-safe label-equality mask
    (NULL <=> NULL is a match, NULL <=> value is not) reproduces the
    SQL twin's ``NOT (la <=> lb)`` predicate exactly."""
    import numpy as np
    import pandas as pd

    from institutional_fx_etl_spark.functions import npexact as npe

    def per_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vid").reset_index(drop=True)
        m = len(pdf)
        out = {"vid": [], "neg_id": [], "rank": [], "cosine": []}
        if m >= 2:
            X = np.array(pdf["vn"].tolist(), dtype=np.float64)
            vids = pdf["vid"].to_numpy()
            lab = pdf["__lbl"].to_numpy(dtype=object)
            isna = np.array([v is None or v != v for v in lab], dtype=bool)
            filled = np.array(
                [0 if (v is None or v != v) else v for v in lab]
            )
            # same[i, j] == the SQL la <=> lb (null-safe equality)
            same = (
                (filled[:, None] == filled[None, :])
                & ~isna[:, None]
                & ~isna[None, :]
            ) | (isna[:, None] & isna[None, :])
            for lo in range(0, m, 1024):
                hi = min(lo + 1024, m)
                cc = npe.fold_dot(X[lo:hi], X)
                rc, risky = npe.round6_block(cc)
                blk_same = same[lo:hi]
                risky = risky & ~blk_same
                rc = np.where(blk_same, -np.inf, rc)
                order = np.argsort(-rc, axis=1, kind="stable")
                bad = set(np.nonzero(risky.any(axis=1))[0].tolist())
                for r in range(hi - lo):
                    if r in bad:
                        er = npe.exact_row_round(cc[r])
                        er[blk_same[r]] = -np.inf
                        idx = np.argsort(-er, kind="stable")
                        vals = er
                    else:
                        idx = order[r]
                        vals = rc[r]
                    emitted = 0
                    for j in idx:
                        if emitted >= k or vals[j] == -np.inf:
                            break
                        emitted += 1
                        out["vid"].append(vids[lo + r])
                        out["neg_id"].append(vids[j])
                        out["rank"].append(emitted)
                        out["cosine"].append(float(vals[j]))
        return pd.DataFrame(out)

    schema = f"vid {id_type}, neg_id {id_type}, rank int, cosine double"
    return normed.groupBy("cid").applyInPandas(per_cell, schema=schema)


def semdedup_incremental(
    old: DataFrame,
    new: DataFrame,
    old_result: DataFrame | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_centroids: int = 8,
    min_cosine: float = 0.95,
    max_cell: int | None = None,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Append-only incremental :func:`semdedup`: when a batch of new
    embeddings arrives (ids strictly above the standing corpus — the
    append-only id contract every ``*_incremental`` op here shares),
    the drop rule "a SMALLER id in my cell is within ``min_cosine``"
    means an old vector's verdict can only change through the
    ``max_cell`` cap, never through a comparison (new ids are larger
    than everything old). So the update touches exactly:

    1. NEW vectors — compared against the members of their own cell
       only (old ∪ smaller-id new), under the frozen quantizer;
    2. old rows of cells the batch pushes OVER ``max_cell`` — the cap
       skips the in-cell compare for such cells, so every member
       flips to keep=true (cheap verdict rewrite, no compare);
    3. everything else keeps its standing ``old_result`` row — at
       scale that is the corpus minus the batch's cells.

    The quantizer is FROZEN (the ``ivf_incremental`` discipline):
    ``centroids`` defaults to the ``num_centroids`` smallest-id
    vectors of ``old``, which equals the full-run seeding exactly
    when those ids are the corpus' smallest overall — true under the
    append-only contract. Output is bit-identical to
    ``semdedup(old ∪ new)`` with the same centroids (the registered
    oracle IS the full-run SQL; equality also pytest-gated).
    """
    v_old = old.selectExpr(
        f"{bq(id_col)} AS vid", f"{_as_double(vec_col)} AS vv"
    )
    # the whole incremental argument rests on the append-only id
    # contract (every new id > every old id) — enforce it with one
    # column-pruned min/max aggregate instead of trusting the caller
    # (r11 ADVICE: a violating batch silently diverged from the
    # rebuild). Scalar-attach crossJoin: both sides are 1 row.
    bounds = (
        v_old.agg(F.max("vid").alias("__mx"))
        .crossJoin(
            F.broadcast(
                new.selectExpr(f"{bq(id_col)} AS vid").agg(
                    F.min("vid").alias("__mn")
                )
            )
        )
        .collect()[0]
    )
    if (
        bounds["__mx"] is not None
        and bounds["__mn"] is not None
        and bounds["__mx"] >= bounds["__mn"]
    ):
        raise ValueError(
            "semdedup_incremental requires append-only ids: "
            f"max(old {id_col})={bounds['__mx']} >= "
            f"min(new {id_col})={bounds['__mn']}"
        )
    if centroids is None:
        centroids = (
            v_old.orderBy("vid")
            .limit(int(num_centroids))
            .selectExpr("vid AS cid", "vv AS cv")
        )
    # one driver-local materialization serves the THREE downstream
    # assignment passes (old, new, and the old_result rebuild) — each
    # _assign_to call re-collected the centroid probe, an executeTake
    # over the corpus scan per call (guide §5 job overhead); a VALUES
    # LocalRelation makes those probes job-free. Bounded: falls back
    # to the distributed relation above 1000 rows.
    from institutional_fx_etl_spark.functions.localrel import (
        localized_if_small,
    )

    centroids = localized_if_small(centroids)
    if old_result is None:
        old_result = semdedup(
            old,
            vec_col,
            id_col,
            num_centroids,
            min_cosine,
            max_cell,
            centroids=centroids,
        )
    from pyspark import StorageLevel

    a_old = _assign_to(old, centroids, vec_col, id_col)
    a_new = _assign_to(new, centroids, vec_col, id_col).transform(cached)
    new_cells = a_new.select("cid").distinct()
    # only the batch's cells ever need old rows again — one semi-join
    # prunes the standing corpus to the affected slice
    old_aff = a_old.join(F.broadcast(new_cells), "cid", "left_semi").transform(
        cached
    )
    if max_cell is not None:
        n_old = old_aff.groupBy("cid").agg(F.count(F.lit(1)).alias("__no"))
        n_new = a_new.groupBy("cid").agg(F.count(F.lit(1)).alias("__nn"))
        sizes = (
            n_new.join(n_old, "cid", "left")
            .selectExpr("cid", "coalesce(__no, 0) + __nn AS __nt")
        )
        overcap = sizes.filter(f"__nt > {int(max_cell)}").select("cid")
        undercap = sizes.filter(f"__nt <= {int(max_cell)}").select("cid")
    else:
        overcap = new_cells.limit(0)
        undercap = new_cells
    mem = (
        old_aff.unionByName(a_new)
        .join(F.broadcast(undercap), "cid", "left_semi")
        .selectExpr("vid", "cid", f"{_UNIT} AS vn")
    )
    newm = a_new.join(F.broadcast(undercap), "cid", "left_semi").selectExpr(
        "vid AS id_b", "cid", f"{_UNIT} AS vb"
    )
    dropped = (
        mem.selectExpr("vid AS id_a", "cid", "vn AS va")
        .join(newm, "cid")
        .filter(F.col("id_a") < F.col("id_b"))
        .selectExpr("id_b", f"round({_PAIR_DOT}, 6) AS cosine")
        .filter(F.col("cosine") >= min_cosine)
        .select("id_b")
        .distinct()
        .withColumn("__drop", F.lit(True))
    )
    new_under = (
        a_new.join(F.broadcast(undercap), "cid", "left_semi")
        .join(dropped.withColumnRenamed("id_b", "vid"), "vid", "left")
        .selectExpr(
            f"vid AS {bq(id_col)}",
            "cid",
            "coalesce(NOT __drop, true) AS keep",
        )
    )
    new_over = a_new.join(F.broadcast(overcap), "cid", "left_semi").selectExpr(
        f"vid AS {bq(id_col)}", "cid", "true AS keep"
    )
    # old rows in newly-over-cap cells flip to keep=true (cells already
    # over cap before were all-keep already — the rewrite is idempotent)
    old_flip = old_result.join(
        F.broadcast(overcap), "cid", "left_semi"
    ).selectExpr(bq(id_col), "cid", "true AS keep")
    untouched = old_result.join(F.broadcast(overcap), "cid", "left_anti")
    return (
        untouched.unionByName(old_flip)
        .unionByName(new_under)
        .unionByName(new_over)
    )


def matryoshka_recall(
    emb: DataFrame,
    queries: DataFrame,
    trunc_dim: int = 16,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Matryoshka truncation diagnostic (Kusupati et al. 2022): MRL
    embeddings promise that the FIRST ``trunc_dim`` coordinates are
    themselves a usable embedding — the retrieval question is how
    much of the full-dimension top-k the truncated vectors recover.
    Per query: recall@k of truncated-cosine top-k against
    full-cosine top-k (both exact brute force — the ANN baseline
    discipline; rank ties broken (cosine desc, id asc) on 6-dp
    values, so both rankings are reproducible cross-engine).

    Plan shape: two :func:`cosine_topk` passes (each the two-level
    pruned window — no hot partition) + one (q_id, vec_id) inner
    join at k·|queries| grain + one per-query count — the expensive
    legs are the scans, both embarrassingly parallel. Output per
    query: q_id, n_overlap, recall (6 dp).
    """
    if trunc_dim < 1:
        raise ValueError(f"trunc_dim must be >= 1, got {trunc_dim}")
    full = cosine_topk(emb, queries, k=k, vec_col=vec_col, id_col=id_col)
    t_emb = emb.selectExpr(
        bq(id_col), f"slice(`{vec_col}`, 1, {int(trunc_dim)}) AS __tv"
    )
    t_q = queries.selectExpr(
        bq(id_col), f"slice(`{vec_col}`, 1, {int(trunc_dim)}) AS __tv"
    )
    trunc = cosine_topk(t_emb, t_q, k=k, vec_col="__tv", id_col=id_col)
    hits = (
        full.select("q_id", "vec_id")
        .join(trunc.select("q_id", "vec_id"), ["q_id", "vec_id"])
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        full.select("q_id")
        .distinct()
        .join(hits, "q_id", "left")
        .selectExpr(
            "q_id",
            "coalesce(n_overlap, 0) AS n_overlap",
            f"round(CAST(coalesce(n_overlap, 0) AS DOUBLE) / {int(k)}, 6)"
            " AS recall",
        )
    )


def ndcg_eval(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """nDCG@k of the brute-cosine ranking against label-match
    relevance (Järvelin & Kekäläinen, TOIS 2002) — the GRADED
    retrieval-quality metric next to ``ann_recall_eval``'s set
    recall: rel_i = 1 when the i-th retrieved vector shares the
    query's label, DCG = Σ rel_i / log2(i+1) over rank positions,
    normalized by the ideal ordering's IDCG.

    The query itself is excluded from its own ranking (it is always
    rank 1 at cosine 1.0 and would award free gain); surviving
    positions renumber densely. Per-position gain terms micro-
    quantize to DECIMAL before the per-query sum — a float hash
    aggregate's accumulation order is partition-dependent, integer
    sums are not (the repo-wide discipline). Cost: one
    :func:`cosine_topk` (queries-bounded) + two broadcast label
    joins + one query-bounded aggregate.

    Output per query: q_id, n_rel, dcg, idcg, ndcg (6dp).
    """
    topk = cosine_topk(
        df, queries, k=k, vec_col=vec_col, id_col=id_col
    ).filter("vec_id <> q_id")
    lab = df.selectExpr(
        f"{bq(id_col)} AS vec_id", f"{bq(label_col)} AS __ld"
    )
    qlab = df.selectExpr(
        f"{bq(id_col)} AS q_id", f"{bq(label_col)} AS __lq"
    )
    rel = (
        topk.join(F.broadcast(lab), "vec_id")
        .join(F.broadcast(qlab), "q_id")
        .selectExpr(
            "q_id",
            "rank",
            "CASE WHEN __ld = __lq THEN 1 ELSE 0 END AS rel",
        )
    )
    pos = rel.selectExpr(
        "q_id",
        "rel",
        "row_number() OVER (PARTITION BY q_id ORDER BY rank) AS pos",
        "row_number() OVER (PARTITION BY q_id ORDER BY rel DESC, rank)"
        " AS ipos",
    )
    # gain terms quantized to micro-units; the ideal ordering reuses
    # the SAME terms at the rel-sorted positions
    g = pos.selectExpr(
        "q_id",
        "rel",
        "CAST(floor(CAST(rel AS DOUBLE) / log2(pos + 1) * 1e6 + 0.5)"
        " AS DECIMAL(18,0)) AS gq",
        "CAST(floor(CAST(rel AS DOUBLE) / log2(ipos + 1) * 1e6 + 0.5)"
        " AS DECIMAL(18,0)) AS iq",
    )
    return (
        g.groupBy("q_id")
        .agg(
            F.expr("CAST(SUM(rel) AS BIGINT) AS n_rel"),
            F.expr("CAST(SUM(gq) AS DOUBLE) / 1e6 AS __dcg"),
            F.expr("CAST(SUM(iq) AS DOUBLE) / 1e6 AS __idcg"),
        )
        .selectExpr(
            "q_id",
            "n_rel",
            "round(__dcg, 6) AS dcg",
            "round(__idcg, 6) AS idcg",
            "CASE WHEN __idcg > 0 THEN round(__dcg / __idcg, 6)"
            " ELSE CAST(0 AS DOUBLE) END AS ndcg",
        )
    )
