"""Training-data selection operators — corpus mixing and importance
weighting, the two levers a pretraining pipeline pulls after
dedup/quality filtering decide WHAT is admissible: how much of each
source to take (``mixture_sampling``) and which documents look most
like a target distribution (``dsir_weights``).

Both are md5-deterministic end to end — every sampled id and every
weight is reproducible and cross-engine oracle-checkable, the same
discipline as the sketch family. The reference pipeline
(``/root/reference/src/hybrid_merger.py``) has no corpus-selection
surface; these extend the engine for the 100 TB training-data use the
commission names as first-class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from institutional_fx_etl_spark.functions.localrel import local_rows_df
from pyspark.sql import functions as F

from institutional_fx_etl_spark.functions.identifiers import bq
from institutional_fx_etl_spark.functions.cachereg import cached, cached_deser, cached_disk

#: 2^60 — md5's leading 15 hex chars as a uniform draw denominator
_U60 = 1 << 60


def _uniform_expr(col: str, salt: str) -> str:
    """Deterministic uniform draw in [0, 1): the md5 prefix of the
    salted key, 60 bits, over 2^60. Identical construction works in
    DuckDB (``CAST(concat('0x', substr(md5(..),1,15)) AS BIGINT)``),
    so inclusion decisions are bit-reproducible across engines."""
    return (
        f"CAST(conv(substr(md5(concat('{salt}', CAST({col} AS STRING))),"
        f" 1, 15), 16, 10) AS BIGINT) / CAST({_U60} AS DOUBLE)"
    )


def mixture_rates(
    df: DataFrame, group_col: str = "source", budget_frac: float = 0.5
) -> DataFrame:
    """The per-source temperature rates of :func:`mixture_sampling`
    (sqrt-share micro-weights, exact integer denominator, fixed
    float association) as a standalone bounded relation — fit once
    offline, then applied to a batch corpus or broadcast onto a
    stream (the ``streaming_mixture`` twin). Extracted verbatim so
    the batch operator's plan and oracle are unchanged.
    Output: grp, n_docs, w_micro, rate."""
    counts = (
        df.groupBy(F.col(group_col).alias("grp"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .selectExpr(
            "grp",
            "n_docs",
            # integer micro-weights: the Σ below stays exact
            "CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000.0 + 0.5)"
            " AS BIGINT) AS w_micro",
        )
    )
    tot = counts.agg(
        F.expr("CAST(SUM(n_docs) AS BIGINT) AS n_total"),
        F.expr("CAST(SUM(w_micro) AS BIGINT) AS w_denom"),
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .selectExpr(
            "grp",
            "n_docs",
            "w_micro",
            # fixed left-to-right association, mirrored in the oracle:
            # rate = min(1, B * w_micro / w_denom / n_s)
            f"least(1.0D, CAST(floor({budget_frac!r}D *"
            " CAST(n_total AS DOUBLE)) AS DOUBLE)"
            " * CAST(w_micro AS DOUBLE) / CAST(w_denom AS DOUBLE)"
            " / CAST(n_docs AS DOUBLE)) AS rate",
        )
    )


def mixture_sampling(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    budget_frac: float = 0.5,
    salt: str = "mix",
) -> DataFrame:
    """Temperature-weighted source mixing: per-source sampling rates
    that flatten the corpus distribution toward ``n_s^alpha`` (the
    multilingual-pretraining temperature trick — alpha < 1 upsamples
    rare sources relative to their natural share), realized by a
    deterministic per-document md5 Bernoulli draw.

    Math: target share ``w_s = n_s^alpha / Σ n_t^alpha``; with a total
    budget ``B = floor(budget_frac · N)`` documents, source s keeps
    ``rate_s = min(1, B·w_s / n_s)``. With alpha = 0.5 the weight is
    ``sqrt`` — computed as integer micro-units (``floor(sqrt(n)·1e6 +
    0.5)``) so the normalizing denominator is an EXACT integer sum
    (float Σ over sources would be order-nondeterministic); the rest
    of the rate pipeline is correctly-rounded IEEE ops in a fixed
    association, identical in the oracle.

    Plan shape: ONE count aggregate over ``group_col`` (tiny — one row
    per source), rates derived scalar-side on that tiny relation, a
    broadcast join back onto the corpus, and the md5-draw filter runs
    scan-side — the corpus itself is never shuffled, which is the
    whole point at 100 TB (sampling must be a scan decoration, not a
    repartition).

    Output (audit grain, one row per source): group, n_docs,
    rate_ppm (BIGINT micro-rate — integer output, immune to float
    hashing), n_sampled.

    Only alpha = 0.5 is cross-engine exact (sqrt is a correctly-
    rounded IEEE op; ``pow`` is not guaranteed to be) — other alphas
    work but carry last-ulp oracle risk.
    """
    if alpha != 0.5:
        raise ValueError(
            "mixture_sampling: only alpha=0.5 (sqrt weighting) is "
            "supported — pow(x, alpha) is not correctly rounded and "
            "breaks cross-engine determinism"
        )
    rates = mixture_rates(df, group_col, budget_frac)
    u = _uniform_expr("__id", salt)
    sampled = (
        df.selectExpr(
            f"{group_col} AS grp", f"{id_col} AS __id"
        )
        .join(F.broadcast(rates.select("grp", "rate")), "grp")
        .filter(f"{u} < rate")
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
    return (
        # both sides are source-cardinality tiny; broadcast keeps the
        # audit join off the shuffle service
        rates.join(F.broadcast(sampled), "grp", "left")
        .selectExpr(
            "grp AS grp_name",
            "n_docs",
            "CAST(floor(rate * 1000000.0 + 0.5) AS BIGINT) AS rate_ppm",
            "CAST(COALESCE(n_sampled, 0) AS BIGINT) AS n_sampled",
        )
    )


def shuffle_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 16,
    salt: str = "shuf",
) -> DataFrame:
    """Deterministic global training shuffle: every document gets a
    shard and an in-shard position from one md5 draw — the "shuffle
    the corpus once, then every epoch streams shards sequentially"
    export layout a pretraining data loader consumes. Reproducible
    (same salt ⇒ same order, any partitioning, any engine) and
    stateless, unlike ``rand()``-based shuffles that change under
    retry or re-planning.

    Shard = draw mod ``n_shards`` (uniform); position = rank of the
    draw within the shard (md5 ties broken by id — total order).
    Plan: one scan expression + ONE ranking window PARTITIONED BY
    shard — at scale pick n_shards ≳ cluster parallelism so no shard
    serializes; rows carry only (id, draw), never payloads (the
    writer joins payloads back or writes with
    ``partitionBy(shard) sortBy(pos)``).

    Output: <id_col>, shard (BIGINT), pos (BIGINT, 0-based).
    """
    u = (
        f"CAST(conv(substr(md5(concat('{salt}',"
        f" CAST({id_col} AS STRING))), 1, 15), 16, 10) AS BIGINT)"
    )
    return (
        df.selectExpr(id_col, f"{u} AS __draw")
        .selectExpr(id_col, "__draw", f"__draw % {n_shards} AS shard")
        .selectExpr(
            id_col,
            "shard",
            "CAST(row_number() OVER (PARTITION BY shard"
            f" ORDER BY __draw, {id_col}) - 1 AS BIGINT) AS pos",
        )
    )


def dsir_weights(
    df: DataFrame,
    target_expr: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 64,
    salt: str = "dsir",
) -> DataFrame:
    """Data Selection with Importance Resampling (DSIR) weights:
    per-document log importance ``log p_target(doc) − log p_source
    (doc)`` under hashed-unigram bag-of-words models — the public
    importance-resampling recipe for picking pretraining data that
    looks like a target domain (Xie et al., 2023). Documents matching
    ``target_expr`` define the target distribution; all other
    documents define the source distribution.

    Features are md5-hashed token buckets (cross-engine
    reproducible); both distributions are add-one smoothed. The
    per-bucket log-ratio is micro-quantized to a BIGINT
    (``floor(x·1e6 + 0.5)``) so the per-document Σ over buckets is
    EXACT integer arithmetic — float accumulation order can never
    shift a hash, and a last-ulp ``ln`` divergence between engines is
    absorbed unless it lands within ~1e-10 of a rounding boundary
    (the cramers_v micro-term discipline).

    Plan shape: one explode over the corpus feeding TWO aggregates —
    the (bucket → target/source counts) distribution (``buckets``
    rows, broadcast back) and the (doc, bucket) count matrix — then
    one broadcast join and one final per-doc sum. Only (id, bucket,
    count) triples shuffle; text never leaves the scan. Documents
    with zero tokens have no distribution evidence and are absent
    from the output (mirrored in the oracle).

    Output: <id_col>, n_toks, log_weight_micro (BIGINT — exact),
    log_weight (double, micro/1e6 for readability).
    """
    bucket = (
        f"CAST(conv(substr(md5(concat('{salt}', w)), 1, 8), 16, 10)"
        f" AS BIGINT) % {buckets}"
    )
    tok = (
        df.selectExpr(
            f"{id_col} AS __id",
            f"CAST(({target_expr}) AS INT) AS __t",
            f"explode(split(lower({text_col}), '\\\\s+')) AS w",
        )
        .filter("w <> ''")
        .selectExpr("__id", "__t", f"{bucket} AS b")
    )
    dist = tok.groupBy("b").agg(
        F.expr("CAST(SUM(__t) AS BIGINT) AS ct"),
        F.expr("CAST(SUM(1 - __t) AS BIGINT) AS cs"),
    )
    tots = dist.agg(
        F.expr("CAST(SUM(ct) AS BIGINT) AS tt"),
        F.expr("CAST(SUM(cs) AS BIGINT) AS ts"),
    )
    lr = dist.crossJoin(F.broadcast(tots)).selectExpr(
        "b",
        # identical expression shape in the oracle: smoothed
        # log-ratio, micro-quantized
        "CAST(floor((ln((CAST(ct AS DOUBLE) + 1.0D)"
        f" / (CAST(tt AS DOUBLE) + {buckets}.0D))"
        " - ln((CAST(cs AS DOUBLE) + 1.0D)"
        f" / (CAST(ts AS DOUBLE) + {buckets}.0D)))"
        " * 1000000.0D + 0.5D) AS BIGINT) AS lr_micro",
    )
    docb = tok.groupBy("__id", "b").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        docb.join(F.broadcast(lr), "b")
        .groupBy("__id")
        .agg(
            F.expr("CAST(SUM(c) AS BIGINT) AS n_toks"),
            F.expr(
                "CAST(SUM(c * lr_micro) AS BIGINT) AS log_weight_micro"
            ),
        )
        .selectExpr(
            f"__id AS {id_col}",
            "n_toks",
            "log_weight_micro",
            "CAST(log_weight_micro AS DOUBLE) / 1000000.0D"
            " AS log_weight",
        )
    )


def curriculum_order(
    df: DataFrame,
    score_col: str = "n_chars",
    id_col: str = "doc_id",
    stages: int = 4,
    n_shards: int = 8,
    salt: str = "curr",
) -> DataFrame:
    """Curriculum export layout: every document gets a difficulty
    STAGE (score-quantile bucket — curricula order training short→
    long / easy→hard) plus a deterministic within-stage shuffle
    (md5 draw → shard + position, the :func:`shuffle_shards`
    layout), so a loader streams stage 1's shards, then stage 2's, …

    Stage assignment is TIE-STABLE: it is computed per DISTINCT score
    from the score histogram (stage of score s = ``1 + (docs_below(s)
    · stages) div n`` — the NTILE boundary of s's first row), so
    equal-difficulty documents never split across stages and the
    result is independent of partitioning. The histogram is the only
    driver-bounded piece (distinct scores, not documents); the corpus
    itself takes one scan + ONE (stage, shard)-partitioned ranking
    window over (id, draw) pairs — payloads never enter the window.
    At scale grow ``n_shards`` ≳ cluster parallelism, exactly the
    :func:`shuffle_shards` contract.

    Output: <id_col>, score, stage (BIGINT 1-based), shard (BIGINT),
    pos (BIGINT, 0-based within (stage, shard)).
    """
    from pyspark.sql import Window

    sc = bq(score_col)
    hist = df.groupBy(F.col(score_col).alias("score")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # cumulative docs BELOW each distinct score: a window over the
    # bounded histogram (distinct scores), not the corpus
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    staged = (
        hist.withColumn("below", F.coalesce(F.sum("cnt").over(w), F.lit(0)))
        .crossJoin(F.broadcast(df.agg(F.count(F.lit(1)).alias("__n"))))
        .selectExpr(
            "score",
            f"CAST(1 + (below * {stages}) div __n AS BIGINT) AS stage",
        )
    )
    u = (
        f"CAST(conv(substr(md5(concat('{salt}',"
        f" CAST({bq(id_col)} AS STRING))), 1, 15), 16, 10) AS BIGINT)"
    )
    d = df.selectExpr(
        bq(id_col), f"{sc} AS score", f"{u} AS __draw"
    ).withColumn("shard", F.expr(f"__draw % {n_shards}"))
    return (
        d.join(F.broadcast(staged), "score")
        .selectExpr(
            bq(id_col),
            "score",
            "stage",
            "shard",
            "CAST(row_number() OVER (PARTITION BY stage, shard"
            f" ORDER BY __draw, {bq(id_col)}) - 1 AS BIGINT) AS pos",
        )
    )


def token_budget_fit(
    df: DataFrame,
    weight_col: str = "n_chars",
    group_col: str = "source",
    budget_num: int = 1,
    budget_den: int = 2,
) -> DataFrame:
    """Water-filling token-budget allocation: given per-source token
    totals and a global budget (``total · budget_num/budget_den``),
    find the unique cap ``c`` with ``Σ min(T_s, c) = B`` and allocate
    ``min(T_s, c)`` to every source — the standard way a pretraining
    mix caps over-represented sources while taking small sources
    whole. Exact INTEGER arithmetic end to end: the floor-division
    remainder is distributed +1 to the first sources in (T asc, name)
    order, so ``Σ alloc = B`` exactly and the result is engine- and
    partitioning-independent.

    The corpus is touched by ONE aggregate (per-source totals); all
    water-filling math runs on the bounded source dimension (windows
    over #sources rows). Output: <group_col>, toks (BIGINT),
    alloc (BIGINT).

    ``budget_num/budget_den`` must lie in (0, 1]: a budget above the
    corpus total has no crossing rank (the capped_here filter would
    match nothing and every alloc would silently go NULL — r9 ADVICE)
    and a non-positive denominator is meaningless; both raise.
    """
    from pyspark.sql import Window

    if budget_den <= 0 or budget_num <= 0 or budget_num > budget_den:
        raise ValueError(
            "token_budget_fit: budget_num/budget_den must be in"
            f" (0, 1], got {budget_num}/{budget_den}"
        )

    s = df.groupBy(group_col).agg(
        F.expr(f"CAST(SUM({bq(weight_col)}) AS BIGINT) AS toks")
    )
    wo = Window.orderBy("toks", group_col)
    o = s.select(
        group_col,
        "toks",
        F.row_number().over(wo).alias("rk"),
        F.sum("toks").over(wo).alias("cum"),
    )
    tot = o.agg(
        F.expr("SUM(toks) AS total"),
        F.count(F.lit(1)).alias("m"),
    ).selectExpr(f"total * {budget_num} div {budget_den} AS budget", "m")
    # crossing rank: first k where capping everyone >= k at T_k meets
    # the budget; guaranteed to exist for budget <= total
    f = o.crossJoin(F.broadcast(tot)).withColumn(
        "capped_here",
        F.expr("(cum - toks) + (m - rk + 1) * toks >= budget"),
    )
    x = f.filter("capped_here").agg(
        F.min("rk").alias("xk"),
        F.expr("min_by(cum - toks, rk) AS cum_below"),
        F.expr("min_by(budget, rk) AS budget"),
        F.expr("min_by(m, rk) AS m"),
    ).selectExpr(
        "xk",
        "(budget - cum_below) div (m - xk + 1) AS cap",
        "(budget - cum_below) % (m - xk + 1) AS bonus",
    )
    return (
        f.crossJoin(F.broadcast(x))
        .selectExpr(
            bq(group_col),
            "toks",
            "CAST(CASE WHEN rk < xk THEN toks"
            " WHEN rk < xk + bonus THEN cap + 1"
            " ELSE cap END AS BIGINT) AS alloc",
        )
    )


def _probe_feats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    buckets: int,
    salt: str,
) -> tuple[DataFrame, DataFrame]:
    """The probe family's (doc × hashed-bucket) presence matrix:
    (__id, b, x=1) rows plus a bias row b=``buckets`` per doc, and the
    doc spine — built once and lazily checkpointed so the multi-step
    GD lineage re-reads the matrix, not the tokenizer."""
    bucket = (
        f"CAST(conv(substr(md5(concat('{salt}', w)), 1, 8), 16, 10)"
        f" AS BIGINT) % {buckets}"
    )
    tok = (
        df.selectExpr(
            f"{id_col} AS __id",
            f"explode(split(lower({text_col}), '\\\\s+')) AS w",
        )
        .filter("w <> ''")
        .selectExpr("__id", f"{bucket} AS b")
    )
    xb = tok.distinct().selectExpr("__id", "b", "CAST(1 AS BIGINT) AS x")
    docs = xb.select("__id").distinct()
    bias = docs.selectExpr(
        "__id", f"CAST({buckets} AS BIGINT) AS b", "CAST(1 AS BIGINT) AS x"
    )
    feats = xb.unionByName(bias).localCheckpoint(eager=False)
    return feats, docs


#: the mask-statistic GD path collects one row per DISTINCT bucket
#: mask (≤ 2^buckets) — cap the exponent so the collect stays bounded
MAX_MASK_BUCKETS = 12


def _probe_masks(
    df: DataFrame,
    text_col: str,
    id_col: str,
    buckets: int,
    salt: str,
) -> DataFrame:
    """Per-document bucket bitmask (bias bit ``buckets`` always set):
    one tokenize pass + one groupBy(id). Docs with no tokens are
    excluded — the probe family's domain rule."""
    bucket = (
        f"CAST(conv(substr(md5(concat('{salt}', w)), 1, 8), 16, 10)"
        f" AS BIGINT) % {buckets}"
    )
    tok = (
        df.selectExpr(
            f"{id_col} AS __id",
            f"explode(split(lower({text_col}), '\\\\s+')) AS w",
        )
        .filter("w <> ''")
        .selectExpr("__id", f"{bucket} AS b")
        .distinct()
    )
    return tok.groupBy("__id").agg(
        F.expr(
            f"bit_or(shiftleft(CAST(1 AS BIGINT), CAST(b AS INT)))"
            f" | shiftleft(CAST(1 AS BIGINT), {buckets}) AS mask"
        )
    )


def _probe_mask_stats(
    df: DataFrame,
    target_expr: str,
    text_col: str,
    id_col: str,
    buckets: int,
    salt: str,
) -> DataFrame:
    """The probe family's SUFFICIENT STATISTIC: with presence
    features, a document is fully described by its bucket BITMASK, so
    (mask → n docs, Σ y_micro) — at most 2^buckets rows — carries
    everything the least-squares gradient needs:

        p(mask)  = Σ_{b ∈ mask} w_b            (bias bit always set)
        g_b      = Σ_{mask ∋ b} (Y(mask) − n(mask)·p(mask))

    One tokenize pass + one groupBy(id) to build masks + one
    groupBy(mask) — the corpus is touched ONCE for the whole training
    run, vs once per GD step for the explicit feature matrix.
    Output: mask (BIGINT, bit ``buckets`` = bias), n (BIGINT),
    y_sum (BIGINT Σ of 0/10⁶ labels)."""
    masks = _probe_masks(df, text_col, id_col, buckets, salt)
    y = df.selectExpr(
        f"{id_col} AS __id",
        f"CAST(COALESCE(CAST(({target_expr}) AS INT), 0) * 1000000"
            " AS BIGINT)"
        " AS y_micro",
    )
    return (
        masks.join(y, "__id")
        .groupBy("mask")
        .agg(
            F.expr("CAST(count(1) AS BIGINT) AS n"),
            F.expr("CAST(SUM(y_micro) AS BIGINT) AS y_sum"),
        )
    )


def _mask_gd_weights(
    stats: list, buckets: int, lr_shift: int, steps: int
) -> dict:
    """The GD recurrence over collected mask statistics — pure int64
    Python, identical numbers to the distributed loop (the float cast
    + one division per (step, bucket) mirrors `_probe_gd_weights`'s
    ``CAST(g AS DOUBLE) / (n·2^shift)`` exactly). Returns {b: w}."""
    import math

    n_total = sum(n for _, n, _ in stats)
    denom = float(n_total) * float(1 << lr_shift)
    present = set()
    for mask, _, _ in stats:
        for b in range(buckets + 1):
            if mask >> b & 1:
                present.add(b)
    w = {b: 0 for b in sorted(present)}
    for _ in range(steps):
        g = {b: 0 for b in w}
        for mask, n, y_sum in stats:
            p = 0
            for b in w:
                if mask >> b & 1:
                    p += w[b]
            resid_sum = y_sum - n * p
            for b in w:
                if mask >> b & 1:
                    g[b] += resid_sum
        for b in w:
            w[b] += math.floor(float(g[b]) / denom + 0.5)
    return w


def linear_probe_gd(
    df: DataFrame,
    target_expr: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 8,
    steps: int = 3,
    lr_shift: int = 4,
    salt: str = "probe",
) -> DataFrame:
    """Train a LINEAR quality probe distributed: fixed-unroll batch
    gradient descent for least-squares on hashed-unigram bucket
    PRESENCE indicators (+ bias), labels from ``target_expr`` — the
    fastText-style "train a cheap classifier on a labeled slice,
    score the corpus" step of a pretraining data pipeline, expressed
    so every engine reaches the SAME weights:

    - features are 0/1 presence of each md5 token bucket (the dsir
      bucket hash); labels are 0/10⁶ micro-units — a NULL
      ``target_expr`` counts as label 0 (COALESCE'd in BOTH regimes,
      so the mask sufficient-statistic and the distributed loop see
      identical gradients on nullable targets — r9 ADVICE); w₀ = 0;
    - each step's prediction ``p = Σ x·w`` and gradient
      ``g_b = Σ x·(y − p)`` are pure int64 sums (no float order);
    - the update ``w += floor(g / (n·2^lr_shift) + 0.5)`` casts both
      int64 operands to DOUBLE (IEEE round-to-nearest, identical in
      every engine) and divides once, so the rounding is the
      deterministic pca/dsir discipline, with the learning rate a
      power of two over n.

    Presence (not count) features bound the Gram spectrum:
    ``λmax ≤ buckets+1``, so any ``2^lr_shift > (buckets+1)/2``
    (shift ≥ 3 for the default 8 buckets) makes the descent
    contractive at EVERY corpus size — counts would diverge on
    long documents and overflow the int64 residuals.

    Plan (``buckets ≤ MAX_MASK_BUCKETS``, the default regime): the
    corpus is touched ONCE — one tokenize pass into per-doc bucket
    BITMASKS and one groupBy(mask) sufficient statistic
    (:func:`_probe_mask_stats`, ≤ 2^buckets rows) — and the whole GD
    loop runs on that bounded relation driver-side
    (:func:`_mask_gd_weights`), emitting identical int64 weights.
    Above the cap (mask space too wide to collect), the distributed
    twin :func:`_probe_gd_weights` runs instead: per step one
    broadcast of the (buckets+1)-row weight vector, one id-keyed and
    one bucket-keyed aggregate over the explicit feature matrix, with
    the weight vector materialized between steps. The two regimes are
    equality-gated in tests/test_round9_ops.py. Squared loss (not
    logistic) is deliberate: ``exp`` is not correctly rounded
    cross-engine, the :func:`mixture_sampling` alpha rule.

    Output: b (BIGINT; ``buckets`` = bias), w_micro (BIGINT) — the
    trained weights after ``steps`` unrolled steps.
    """
    if (1 << lr_shift) * 2 <= buckets + 1:
        raise ValueError(
            "lr_shift too small for bucket count: need"
            f" 2^lr_shift > (buckets+1)/2, got 2^{lr_shift}"
            f" vs {buckets + 1} features"
        )
    if buckets <= MAX_MASK_BUCKETS:
        stats = [
            (r["mask"], r["n"], r["y_sum"])
            for r in _probe_mask_stats(
                df, target_expr, text_col, id_col, buckets, salt
            ).collect()
        ]
        w = _mask_gd_weights(stats, buckets, lr_shift, steps)
        return local_rows_df(
            df.sparkSession, sorted(w.items()), "b bigint, w_micro bigint"
        )
    feats, docs = _probe_feats(df, text_col, id_col, buckets, salt)
    return _probe_gd_weights(
        df, feats, docs, target_expr, id_col, lr_shift, steps
    ).selectExpr("b", "w AS w_micro")


def _probe_gd_weights(
    df: DataFrame,
    feats: DataFrame,
    docs: DataFrame,
    target_expr: str,
    id_col: str,
    lr_shift: int,
    steps: int,
) -> DataFrame:
    """The GD loop of :func:`linear_probe_gd` over a prebuilt feature
    matrix — shared with :func:`linear_probe_score` so train+score
    builds the matrix once. Returns (b, w)."""
    spark = df.sparkSession
    y = (
        df.selectExpr(
            f"{id_col} AS __id",
            f"CAST(COALESCE(CAST(({target_expr}) AS INT), 0) * 1000000"
            " AS BIGINT)"
            " AS y_micro",
        )
        .join(docs, "__id")
    )
    n = docs.count()
    denom = float(n) * float(1 << lr_shift)
    w = feats.select("b").distinct().selectExpr(
        "b", "CAST(0 AS BIGINT) AS w"
    )
    for _ in range(steps):
        p = (
            feats.join(F.broadcast(w), "b")
            .groupBy("__id")
            .agg(F.expr("SUM(x * w) AS p"))
        )
        r = y.join(p, "__id").selectExpr("__id", "y_micro - p AS resid")
        g = (
            feats.join(r, "__id")
            .groupBy("b")
            .agg(F.expr("SUM(x * resid) AS g"))
        )
        stepped = w.join(g, "b", "left").selectExpr(
            "b",
            "CAST(w + floor(CAST(COALESCE(g, 0) AS DOUBLE)"
            f" / {denom!r}D + 0.5D) AS BIGINT) AS w",
        )
        # parameter-vector sync: buckets+1 rows to the driver, then a
        # fresh local relation — keeps each step ONE pass over feats
        # instead of re-running every earlier step per reference
        rows = [(r2["b"], r2["w"]) for r2 in stepped.collect()]
        w = local_rows_df(spark, rows, "b bigint, w bigint")
    return w


def linear_probe_score(
    df: DataFrame,
    target_expr: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 8,
    steps: int = 3,
    lr_shift: int = 4,
    salt: str = "probe",
    top_ppm: int = 250_000,
) -> DataFrame:
    """Train the :func:`linear_probe_gd` quality probe, score EVERY
    document, and keep the top ``top_ppm``/10⁶ fraction — the full
    classifier-based data-selection loop (train on a labeled slice →
    score the corpus → take the best tranche) as one deterministic
    plan.

    Selection is exact rank semantics — kept iff
    ``rank by (score DESC, id ASC) ≤ k``, ``k = n·top_ppm div 10⁶`` —
    but computed WITHOUT a global sort: a score histogram (one tiny
    aggregate) decides every non-boundary document by its
    strictly-better count alone; only the single boundary score group
    ranks its ties by id (one window over that group). At 100 TB the
    global-window alternative is a single-partition sort of the
    corpus; this plan's driver-free equivalent touches per-score
    counts plus one tie group.

    Output: <id_col>, score_micro (BIGINT), kept (INT 0/1).
    """
    from pyspark.sql import Window

    if (1 << lr_shift) * 2 <= buckets + 1:
        raise ValueError(
            "lr_shift too small for bucket count: need"
            f" 2^lr_shift > (buckets+1)/2, got 2^{lr_shift}"
            f" vs {buckets + 1} features"
        )
    if buckets <= MAX_MASK_BUCKETS:
        # mask regime (linear_probe_gd's default): ONE corpus pass
        # into (id, mask) — pinned, then shared by the training
        # statistic AND the scoring join; the sufficient statistic
        # trains the weights driver-side, per-MASK scores come back
        # as a tiny broadcast lookup — no feature-matrix shuffle
        masks = _probe_masks(
            df, text_col, id_col, buckets, salt
        ).localCheckpoint(eager=False)
        y = df.selectExpr(
            f"{id_col} AS __id",
            f"CAST(COALESCE(CAST(({target_expr}) AS INT), 0) * 1000000"
            " AS BIGINT)"
            " AS y_micro",
        )
        stats = [
            (r["mask"], r["n"], r["y_sum"])
            for r in masks.join(y, "__id")
            .groupBy("mask")
            .agg(
                F.expr("CAST(count(1) AS BIGINT) AS n"),
                F.expr("CAST(SUM(y_micro) AS BIGINT) AS y_sum"),
            )
            .collect()
        ]
        wd = _mask_gd_weights(stats, buckets, lr_shift, steps)
        mask_scores = [
            (m, sum(wv for b, wv in wd.items() if m >> b & 1))
            for m, _, _ in stats
        ]
        lookup = local_rows_df(
            df.sparkSession, mask_scores, "mask bigint, score_micro bigint"
        )
        scored = masks.join(F.broadcast(lookup), "mask").select(
            "__id", "score_micro"
        )
    else:
        feats, docs = _probe_feats(df, text_col, id_col, buckets, salt)
        w = _probe_gd_weights(
            df, feats, docs, target_expr, id_col, lr_shift, steps
        ).selectExpr("b", "w AS __w")
        scored = feats.join(F.broadcast(w), "b").groupBy("__id").agg(
            F.expr("SUM(x * __w) AS score_micro")
        )
    # three consumers (histogram, n, tag join) — pin the narrow
    # (id, score) relation so scoring runs once
    scored = scored.localCheckpoint(eager=False)
    hist = scored.groupBy("score_micro").agg(
        F.expr("CAST(count(1) AS BIGINT) AS c")
    )
    # histogram-level cumulative: rows = distinct scores, ids-free
    better = F.coalesce(
        F.sum("c").over(
            Window.orderBy(F.desc("score_micro")).rowsBetween(
                Window.unboundedPreceding, -1
            )
        ),
        F.lit(0).cast("long"),
    )
    n = scored.agg(F.expr("CAST(count(1) AS BIGINT) AS n"))
    hist = (
        hist.withColumn("better", better)
        .crossJoin(F.broadcast(n))
        .selectExpr(
            "score_micro",
            "c",
            "better",
            f"CAST(n * {int(top_ppm)} AS BIGINT) div 1000000 AS k",
        )
    )
    tagged = scored.join(hist, "score_micro")
    full = tagged.filter("better + c <= k").selectExpr(
        "score_micro", "__id", "CAST(1 AS INT) AS kept"
    )
    out_ = tagged.filter("better >= k").selectExpr(
        "score_micro", "__id", "CAST(0 AS INT) AS kept"
    )
    tie_rank = F.row_number().over(
        Window.partitionBy("score_micro").orderBy("__id")
    )
    boundary = (
        tagged.filter("better < k AND better + c > k")
        .withColumn("__r", tie_rank)
        .selectExpr(
            "score_micro",
            "__id",
            "CAST(CASE WHEN better + __r <= k THEN 1 ELSE 0 END AS INT)"
            " AS kept",
        )
    )
    return (
        full.unionByName(out_)
        .unionByName(boundary)
        .selectExpr(f"__id AS {id_col}", "score_micro", "kept")
    )


def quota_sample_exact(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    budget_ppm: int = 250_000,
    salt: str = "quota",
) -> DataFrame:
    """EXACT-count stratified sampling: keep precisely
    ``K = N·budget_ppm div 10⁶`` documents, allocated across groups by
    largest-remainder (Hamilton) apportionment — Σ of the per-group
    takes equals K exactly, unlike the Bernoulli
    ``stratified_sample``/``mixture_sampling`` family whose realized
    counts are binomial around the target. This is the op you need
    when the downstream contract is "exactly K documents, source
    shares as proportional as integers allow".

    All allocation math is integer-exact: ``base_g = K·n_g div N``,
    remainders ranked (DESC, group ASC) hand out the ``K − Σ base``
    leftovers. Within a group, members are ranked by an md5 draw
    (id tiebreak) — reproducible at any partitioning, no rand().

    Plan: one tiny group-count aggregate (+ group-level window on that
    source-cardinality relation), broadcast of the quota table, and
    ONE ranking window partitioned by group over (id, draw) rows —
    payloads never shuffle. Group skew = the shuffle_shards caveat:
    a single group's rank serializes that group, so at 100 TB keep
    groups ≪ corpus (sources/domains do) or pre-split hot groups.

    Output: <id_col>, grp, rk (BIGINT, 1-based in-group rank) for the
    K kept documents only.
    """
    from pyspark.sql import Window

    g = df.groupBy(F.expr(f"{group_col}").alias("grp")).agg(
        F.expr("CAST(count(1) AS BIGINT) AS n")
    )
    tot = g.agg(F.expr("CAST(SUM(n) AS BIGINT) AS nn"))
    alloc = (
        g.crossJoin(F.broadcast(tot))
        .selectExpr(
            "grp",
            "n",
            "nn",
            f"CAST(nn * {int(budget_ppm)} AS BIGINT) div 1000000 AS K",
        )
        .selectExpr(
            "grp", "n", "K",
            "(K * n) div nn AS base",
            "(K * n) % nn AS rem",
        )
    )
    leftover = alloc.groupBy("K").agg(
        F.expr("CAST(K - SUM(base) AS BIGINT) AS L")
    )
    bonus_rank = F.row_number().over(
        Window.orderBy(F.desc("rem"), F.asc("grp"))
    )
    quota = (
        alloc.crossJoin(F.broadcast(leftover.select("L")))
        .withColumn("__br", bonus_rank)
        .selectExpr(
            "grp",
            "CAST(base + CASE WHEN __br <= L THEN 1 ELSE 0 END"
            " AS BIGINT) AS k_g",
        )
    )
    draw = (
        f"CAST(conv(substr(md5(concat('{salt}',"
        f" CAST({id_col} AS STRING))), 1, 15), 16, 10) AS BIGINT)"
    )
    ranked = df.selectExpr(
        id_col, f"{group_col} AS grp", f"{draw} AS __draw"
    ).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("grp").orderBy("__draw", id_col)
        ).cast("long"),
    )
    return (
        ranked.join(F.broadcast(quota), "grp")
        .filter("rk <= k_g")
        .selectExpr(id_col, "grp", "rk")
    )


def domain_reweight_mw(
    df: DataFrame,
    loss_expr: str,
    group_col: str = "source",
    steps: int = 3,
    eta_shift: int = 2,
) -> DataFrame:
    """DoReMi-style domain reweighting (Xie et al. 2023, simplified):
    multiplicative-weights updates that shift mixture mass toward
    high-loss domains — the "reweight the pretraining mix by how hard
    each domain is" step — in EXACT integer arithmetic so every
    engine lands on identical weights.

    ``loss_expr`` is a per-document [0,1] hardness signal (a probe
    misclassification flag, a quality deficit). Each document's loss
    is half-up micro-rounded BEFORE summing — ``floor(loss·10⁶+0.5)``
    — so fractional signals (e.g. 0.7) carry their mass instead of
    truncating to 0 (r9 ADVICE fix); a 0/1 boolean signal sums to
    identical totals either way. Per domain:
    ``loss_d = Σ round(loss·10⁶) div n_d`` (integer micro). Updates,
    from uniform ``w⁰ = 10⁶`` micro:

        w ← w + (w · loss_d) div 2^eta_shift·10⁶   (grow on hard)
        w ← w · 10⁶ div Σ w                         (renormalize)

    — multiplication before division keeps every intermediate an
    int64 (w ≤ 10⁶, loss ≤ 10⁶, domains ≤ 10⁶ ⇒ products < 2⁶³), and
    integer division is exact by definition. η = 2^-eta_shift.

    Plan: ONE corpus aggregate (count + loss sum per domain); the MW
    loop runs on the domain-cardinality relation (tiny — broadcast
    territory), corpus never reshuffles. Output: grp, n_docs,
    loss_micro, w_micro (the final normalized mixture weight).
    """
    g = df.groupBy(F.expr(group_col).alias("grp")).agg(
        F.expr("CAST(count(1) AS BIGINT) AS n_docs"),
        F.expr(
            "CAST(SUM(CAST(floor(CAST(({0}) AS DOUBLE) * 1000000"
            " + 0.5) AS BIGINT)) AS BIGINT) AS n_loss_micro".format(
                loss_expr
            )
        ),
    )
    w = g.selectExpr(
        "grp",
        "n_docs",
        "n_loss_micro div n_docs AS loss_micro",
        "CAST(1000000 AS BIGINT) AS w",
    )
    for _ in range(steps):
        grown = w.selectExpr(
            "grp",
            "n_docs",
            "loss_micro",
            f"w + (w * loss_micro) div {(1 << eta_shift) * 1_000_000}"
            " AS w",
        )
        tot = grown.agg(F.expr("CAST(SUM(w) AS BIGINT) AS tw"))
        w = grown.crossJoin(F.broadcast(tot)).selectExpr(
            "grp", "n_docs", "loss_micro",
            "(w * 1000000) div tw AS w",
        )
    return w.selectExpr("grp", "n_docs", "loss_micro", "w AS w_micro")


def token_quota_take(
    df: DataFrame,
    weight_col: str = "n_chars",
    group_col: str = "source",
    id_col: str = "doc_id",
    budget_num: int = 1,
    budget_den: int = 2,
    salt: str = "tq",
) -> DataFrame:
    """The executable half of :func:`token_budget_fit`: materialize
    WHICH documents fill each source's token allocation. Per source,
    documents are ordered by an md5 draw (id tiebreak) and the
    maximal PREFIX whose running token sum fits the allocation is
    kept — the "stream the shuffled source until its budget is spent"
    rule a data loader applies, deterministic at any partitioning
    (a knapsack would pack tighter but is order-dependent; the prefix
    rule is reproducible and single-pass).

    Plan: the water-filling aggregate (ONE corpus pass, math on the
    source dimension), a broadcast of the quota table, and ONE
    running-sum window partitioned by source over (id, weight, draw)
    rows — payloads never shuffle, the shuffle_shards skew caveat
    applies to hot sources.

    Output (kept docs only): <id_col>, grp, w (BIGINT),
    cum_w (BIGINT running total within the source's take).
    """
    from pyspark.sql import Window

    alloc = token_budget_fit(
        df, weight_col, group_col, budget_num, budget_den
    ).selectExpr(f"{group_col} AS grp", "alloc")
    draw = (
        f"CAST(conv(substr(md5(concat('{salt}',"
        f" CAST({id_col} AS STRING))), 1, 15), 16, 10) AS BIGINT)"
    )
    ranked = df.selectExpr(
        id_col,
        f"{group_col} AS grp",
        f"CAST({bq(weight_col)} AS BIGINT) AS w",
        f"{draw} AS __draw",
    )
    cum = (
        F.sum("w")
        .over(
            Window.partitionBy("grp")
            .orderBy("__draw", id_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .cast("long")
    )
    return (
        ranked.withColumn("cum_w", cum)
        .join(F.broadcast(alloc), "grp")
        .filter("cum_w <= alloc")
        .selectExpr(id_col, "grp", "w", "cum_w")
    )


def kfold_assign(
    df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    stratum_expr: str = "source",
) -> DataFrame:
    """Deterministic STRATIFIED k-fold assignment (the evaluation-split
    primitive behind cross-validated data ablations): within every
    stratum, documents are ordered by the md5 of their id and dealt
    round-robin into ``k`` folds, so per-stratum fold sizes differ by
    at most one — exact balance, not hash-mod-k's binomial wobble —
    and the assignment is reproducible from the id alone.

    The per-stratum rank is computed WITHOUT a per-stratum global
    sort: the first two hex chars of the md5 key split each stratum
    into 256 sub-buckets whose lexicographic order IS the md5 order
    (the bucket is a prefix of the sort key), so a tiny
    (stratum × 256) count relation yields each bucket's global offset
    and the only row-level window is a row_number inside
    (stratum, bucket) — 256-way parallel, no hot partition when one
    stratum is the whole corpus.

    NULL strata are first-class: documents whose ``stratum_expr``
    evaluates to NULL form their own stratum (null-safe rejoin) and
    get folds like any other — they are never silently dropped.

    Output: id, stratum, fold (0-based).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    from pyspark.sql import Window

    base = df.selectExpr(
        bq(id_col),
        f"({stratum_expr}) AS stratum",
        f"md5(CAST({bq(id_col)} AS STRING)) AS __h",
    ).withColumn("__b", F.expr("substr(__h, 1, 2)"))
    offsets = (
        base.groupBy("stratum", "__b")
        .agg(F.count(F.lit(1)).alias("__c"))
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__c").over(
                    Window.partitionBy("stratum")
                    .orderBy("__b")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("stratum", "__b", "__off")
    )
    wb = Window.partitionBy("stratum", "__b").orderBy("__h", id_col)
    # null-safe stratum rejoin (round-10 ADVICE #2): a NULL stratum is
    # a real stratum (groupBy/window already treat it as one group) —
    # an equi-join here would silently drop those documents
    ranked = base.withColumn("__rn", F.row_number().over(wb)).alias("__kf_b")
    off = F.broadcast(offsets).alias("__kf_o")
    return (
        ranked.join(
            off,
            F.col("__kf_b.stratum").eqNullSafe(F.col("__kf_o.stratum"))
            & (F.col("__kf_b.__b") == F.col("__kf_o.__b")),
        )
        .select(
            F.col(f"__kf_b.{id_col}").alias(id_col),
            F.col("__kf_b.stratum").alias("stratum"),
            F.col("__kf_b.__rn").alias("__rn"),
            F.col("__kf_o.__off").alias("__off"),
        )
        .selectExpr(
            bq(id_col),
            "stratum",
            f"CAST((__off + __rn - 1) % {int(k)} AS INT) AS fold",
        )
    )


def probe_calibration(
    df: DataFrame,
    target_expr: str,
    eval_expr: str | None = None,
    n_bins: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    **probe_kwargs,
) -> DataFrame:
    """Reliability diagram for the linear quality probe: train with
    :func:`linear_probe_score`'s pipeline on ``target_expr``, score
    every document, then bin the scores into ``n_bins`` equal-width
    bins over the OBSERVED score range and report each bin's size,
    mean score and positive rate against ``eval_expr`` (defaults to
    the training target — self-calibration). A well-calibrated probe
    shows positive rate rising monotonically with the bin's mean
    score; the flat or non-monotone profile is the classic
    selection-model red flag.

    Binning is exact integer arithmetic: scores are the probe's int64
    micro-scores, the min/max come from one 2-value aggregate
    (broadcast), and the bin index is
    ``(score − min)·n_bins div (max − min + 1)`` — integer division
    of non-negative ints, identical cross-engine, no float boundary.
    All per-bin stats are integer sums until one final division each.

    Output: bin (0-based), n_docs, n_pos, pos_rate, mean_score_micro.
    """
    scores = linear_probe_score(
        df, target_expr, text_col=text_col, id_col=id_col, **probe_kwargs
    ).select(id_col, "score_micro")
    y = df.selectExpr(
        bq(id_col),
        f"CAST(COALESCE(({eval_expr or target_expr}), false) AS INT) AS __y",
    )
    lab = scores.join(y, id_col)
    mm = lab.agg(
        F.min("score_micro").alias("__mn"), F.max("score_micro").alias("__mx")
    )
    binned = lab.crossJoin(F.broadcast(mm)).selectExpr(
        f"CAST((score_micro - __mn) * {int(n_bins)}"
        " div (__mx - __mn + 1) AS INT) AS bin",
        "score_micro",
        "__y",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("__y").cast("bigint").alias("n_pos"),
            F.expr(
                "round(CAST(SUM(__y) AS DOUBLE) / count(1), 6) AS pos_rate"
            ),
            F.expr(
                "CAST(SUM(score_micro) AS BIGINT) AS __ssum"
            ),
        )
        .selectExpr(
            "bin",
            "n_docs",
            "n_pos",
            "pos_rate",
            "round(CAST(__ssum AS DOUBLE) / n_docs, 6) AS mean_score_micro",
        )
    )


def quantile_align(
    df: DataFrame,
    score_expr: str = "n_chars",
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-group quantile normalization of a quality score: every
    document gets its exact within-group percentile rank, so a single
    global threshold ("keep the top 30%") applies uniformly across
    sources whose raw score DISTRIBUTIONS differ — the calibration
    step before mixing heterogeneous feeds (a web crawl's length
    distribution is not a forum dump's).

    Rank without a per-group global sort (the ``perplexity_buckets``
    discipline): one (group, score) histogram aggregate, a window
    over that BOUNDED relation for the strictly-less count, and a
    row_number inside each (group, score) tie group ordered by id.
    ``pct_rank`` is the single exact division rank/n rounded to 6.

    NULL keys are first-class (round-10 ADVICE #2): a NULL group is
    its own group and a NULL score ranks lowest within its group
    (Spark ASC NULLS FIRST) — the histogram rejoin uses null-safe
    (``<=>``) keys, so every input document appears in the output
    exactly once. SQL mirrors must use ``IS NOT DISTINCT FROM`` join
    keys and ``NULLS FIRST`` cumulative ordering to match.

    Output: id, group, score, grp_rank, pct_rank.
    """
    from pyspark.sql import Window

    base = df.selectExpr(
        bq(id_col),
        f"({group_col}) AS grp",
        f"CAST(({score_expr}) AS BIGINT) AS score",
    )
    g = base.groupBy("grp", "score").agg(F.count(F.lit(1)).alias("__c"))
    wgrp = Window.partitionBy("grp")
    wcum = (
        Window.partitionBy("grp")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = g.select(
        "grp",
        "score",
        F.coalesce(F.sum("__c").over(wcum), F.lit(0)).alias("__lt"),
        F.sum("__c").over(wgrp).alias("__n"),
    )
    wtie = Window.partitionBy("grp", "score").orderBy(id_col)
    b, c = base.alias("__qa_b"), cum.alias("__qa_c")
    return (
        b.join(
            c,
            F.col("__qa_b.grp").eqNullSafe(F.col("__qa_c.grp"))
            & F.col("__qa_b.score").eqNullSafe(F.col("__qa_c.score")),
        )
        .select(
            F.col(f"__qa_b.{id_col}").alias(id_col),
            F.col("__qa_b.grp").alias("grp"),
            F.col("__qa_b.score").alias("score"),
            F.col("__qa_c.__lt").alias("__lt"),
            F.col("__qa_c.__n").alias("__n"),
        )
        .withColumn("__rn", F.row_number().over(wtie))
        .selectExpr(
            bq(id_col),
            "grp",
            "score",
            "CAST(__lt + __rn AS BIGINT) AS grp_rank",
            "round(CAST(__lt + __rn AS DOUBLE) / __n, 6) AS pct_rank",
        )
    )


def mmr_select(
    emb: DataFrame,
    query_id: int,
    k: int = 8,
    shortlist: int = 128,
    lam_tenths: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Maximal-marginal-relevance selection (Carbonell & Goldstein
    1998): pick ``k`` items that balance RELEVANCE to a query vector
    against REDUNDANCY with what is already picked —
    ``argmax λ·sim(d, q) − (1−λ)·max_{s∈S} sim(d, s)`` per step. The
    standard recipe for building diverse eval/demo sets from an
    embedding corpus (pure top-k returns k near-duplicates of the
    best hit; MMR spends the budget on coverage).

    Two-regime shape (the ``dedup_clusters`` discipline): the
    DISTRIBUTED stages do all corpus-scale work — the relevance
    top-``shortlist`` prune (``cosine_topk``: two-level window, no
    hot partition) and the shortlist's pairwise cosine matrix (an
    O(shortlist²) self-join, ≤ 65k rows at the 256 cap) — and the
    driver runs only the inherently SEQUENTIAL k-step argmax over
    the collected INTEGER matrix. Every number that crosses the
    boundary is a micro-quantized BIGINT (cosines round to 6dp then
    ×1e6 — the ``bitext_margin`` convention), so the greedy loop is
    pure integer arithmetic with (score desc, id asc) tie-break —
    bit-reproducible, and the oracle unrolls the same k steps as
    CTEs over the same micro-ints (the ``emb_pca_power``
    discipline). The final output re-joins the k selected ids
    against the distributed shortlist relation, so values come from
    the cluster, not the driver.

    score = (λ₁₀·rel_m − (10−λ₁₀)·maxsim_m) — an exact ×1e7-scaled
    integer (λ = lam_tenths/10); step 1 maximizes relevance alone
    (empty-set redundancy = 0).

    Output: rank (1-based INT), id, rel_cosine, mmr_score.
    """
    from institutional_fx_etl_spark.operators.similarity import (
        cosine_topk,
        with_norm,
    )

    if not 1 <= int(lam_tenths) <= 9:
        raise ValueError(f"lam_tenths must be in 1..9, got {lam_tenths}")
    if not 1 <= k <= shortlist:
        raise ValueError(f"need 1 <= k <= shortlist, got {k}/{shortlist}")
    if shortlist > 256:
        # the driver collects the shortlist² sim matrix — keep it
        # bounded (256² = 65,536 micro-int rows, the documented cap)
        raise ValueError(f"shortlist is capped at 256, got {shortlist}")
    lam = int(lam_tenths)

    qdf = emb.filter(F.col(id_col) == F.lit(query_id))
    # cosine_topk's output id column is named ``vec_id`` by contract —
    # re-alias it to the caller's id_col so every downstream join and
    # the final schema honor a non-default id column (r11 ADVICE)
    short = cosine_topk(
        emb, qdf, k=shortlist, vec_col=vec_col, id_col=id_col
    ).selectExpr(
        f"vec_id AS {bq(id_col)}",
        "CAST(round(cosine * 1e6, 0) AS BIGINT) AS rel_m",
    )
    from pyspark import StorageLevel

    short = short.transform(cached)

    sv = (
        with_norm(emb, vec_col)
        .join(F.broadcast(short.select(id_col)), id_col, "left_semi")
        .selectExpr(
            f"{bq(id_col)} AS vid",
            f"transform(`{vec_col}`, x -> CAST(x AS DOUBLE)) AS vv",
            "__norm AS nv",
        )
    )
    a = sv.selectExpr("vid AS ida", "vv AS va", "nv AS na")
    b = sv.selectExpr("vid AS idb", "vv AS vb", "nv AS nb")
    dot = "aggregate(zip_with(va, vb, (x, y) -> x*y), 0.0d, (a, x) -> a + x)"
    sims_rows = (
        a.crossJoin(b)
        .filter("ida < idb")
        .selectExpr(
            "ida",
            "idb",
            f"CAST(round(round({dot} / (na * nb), 6) * 1e6, 0) AS BIGINT)"
            " AS sim_m",
        )
        .collect()
    )
    cand = [(r[id_col], r["rel_m"]) for r in short.collect()]
    sims: dict[tuple, int] = {}
    for r in sims_rows:
        sims[(r["ida"], r["idb"])] = r["sim_m"]
        sims[(r["idb"], r["ida"])] = r["sim_m"]

    selected: list[tuple] = []  # (rank, vid, score_m10)
    chosen: set = set()
    for step in range(1, k + 1):
        best = None
        for vid, rel_m in cand:
            if vid in chosen:
                continue
            ms = (
                max(sims.get((vid, s), 0) for _, s, _ in selected)
                if selected
                else 0
            )
            sc = lam * rel_m - (10 - lam) * ms
            if best is None or sc > best[2] or (sc == best[2] and vid < best[1]):
                best = (step, vid, sc)
        selected.append(best)
        chosen.add(best[1])

    spark = emb.sparkSession
    # the picks schema id type follows the INPUT's id column (r11
    # ADVICE: hardcoded bigint broke non-default id columns)
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    picks = local_rows_df(
        spark,
        selected,
        StructType(
            [
                StructField("rank", IntegerType()),
                StructField(id_col, emb.schema[id_col].dataType),
                StructField("score_m10", LongType()),
            ]
        ),
    )
    return (
        F.broadcast(picks)
        .join(short, id_col)
        .selectExpr(
            "rank",
            bq(id_col),
            "CAST(rel_m AS DOUBLE) / 1000000.0D AS rel_cosine",
            "CAST(score_m10 AS DOUBLE) / 10000000.0D AS mmr_score",
        )
    )


def kcenter_select(
    emb: DataFrame,
    k: int = 5,
    seed_id: int = 0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Greedy k-center coreset selection (Gonzalez 1985; the farthest-
    point heuristic behind coreset/active-learning picks): start from
    ``seed_id``, then k−1 times add the point FARTHEST from the
    current selection (max over points of min cosine-distance to any
    selected point). Where :func:`mmr_select` balances relevance and
    diversity over a capped shortlist, k-center is pure coverage over
    the WHOLE corpus — its 2-approximation guarantee is the reason
    it's the default coreset baseline.

    Scale shape — stronger than the shortlist regime: each of the k−1
    steps is ONE distributed scan (min-distance to ≤ k broadcast
    centers, computed inline) ending in a 1-row argmax
    (``max_by``-style struct max with the (distance desc, id asc)
    tie-break); only that single winner row reaches the driver per
    step. Nothing is ever collected beyond k rows, so the operator
    holds at any corpus size; cost is k scans (k is small by
    definition of a coreset seed set).

    Distances are micro-quantized BIGINTs (cosine rounds to 6dp then
    ×1e6 — the ``mmr_select`` convention), so every argmax compares
    exact integers and the oracle can unroll the same k−1 scans as
    CTEs. d(x, y) = 1e6 − cos_micro(x, y); min over selected; max
    over corpus.

    Output: rank (1-based INT), id, dist_micro (BIGINT — distance to
    the selection at pick time; 0 for the seed).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from institutional_fx_etl_spark.operators.similarity import with_norm

    base = (
        with_norm(emb, vec_col)
        .selectExpr(
            f"{bq(id_col)} AS vid",
            f"transform(`{vec_col}`, x -> CAST(x AS DOUBLE)) AS vv",
            "__norm AS nv",
        )
    )
    from pyspark import StorageLevel

    base = base.transform(cached)

    spark = emb.sparkSession
    picked: list[tuple] = [(1, seed_id, 0)]
    for step in range(2, k + 1):
        centers = base.filter(
            F.col("vid").isin([p[1] for p in picked])
        ).selectExpr("vid AS cid", "vv AS cv", "nv AS nc")
        dot = (
            "aggregate(zip_with(vv, cv, (x, y) -> x*y), 0.0d,"
            " (a, x) -> a + x)"
        )
        # min distance to the (<= k-row, broadcast) selection, then a
        # 1-row global argmax via struct max — no sort, no window
        winner = (
            base.join(
                F.broadcast(centers),
                F.col("vid") != F.col("cid"),
            )
            .selectExpr(
                "vid",
                "1000000 - CAST(round(round("
                f"{dot} / (nv * nc), 6) * 1e6, 0) AS BIGINT) AS dm",
            )
            .groupBy("vid")
            .agg(F.min("dm").alias("dmin"))
            .filter(~F.col("vid").isin([p[1] for p in picked]))
            .agg(
                # (distance desc, id asc) as min(struct(-dist, id)):
                # negation sits on the bigint distance, so the id
                # column keeps any orderable type (r11 ADVICE)
                F.min(
                    F.struct(
                        (-F.col("dmin")).alias("nd"),
                        F.col("vid").alias("vid"),
                    )
                ).alias("w")
            )
            .selectExpr("-w.nd AS dmin", "w.vid AS vid")
            .collect()[0]
        )
        picked.append((step, winner["vid"], winner["dmin"]))
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    # id type follows the input's id column (r11 ADVICE: hardcoded
    # bigint broke non-default id columns)
    return local_rows_df(
        spark,
        picked,
        StructType(
            [
                StructField("rank", IntegerType()),
                StructField(id_col, emb.schema[id_col].dataType),
                StructField("dist_micro", LongType()),
            ]
        ),
    )


def temperature_resample(
    df: DataFrame,
    group_col: str = "lang",
    weight_expr: str = "n_chars",
    alpha_pct: int = 70,
) -> DataFrame:
    """Temperature-based corpus rebalancing weights (the multilingual
    sampling rule from mBERT/XLM-R: sample group g with probability
    ``q_g ∝ p_g^α`` where ``p_g`` is its natural share and α < 1
    up-weights the tail): the per-group multiplier ``q_g / p_g`` is
    what a sampler applies per document so low-resource groups are
    seen more often without changing any document's content.

    One map-side-combinable aggregate over the corpus (group sums in
    DECIMAL — order-invariant), one scalar-attach crossJoin of the
    two global one-row totals, pure built-ins. ``alpha_pct`` keeps α
    a rational (70 → 0.7) so both engines evaluate ``pow`` on the
    identical literal; shares round to 6 dp.

    Output per group: group col, n_rows, mass (BIGINT — the raw
    weight sum), nat_share (p, 6 dp), temp_share (q, 6 dp),
    weight_mult (q/p, 6 dp).
    """
    if not 1 <= int(alpha_pct) <= 100:
        raise ValueError(f"alpha_pct in 1..100, got {alpha_pct}")
    alpha = f"{int(alpha_pct)} / 100.0D"
    g = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr(
            f"CAST(SUM(CAST(({weight_expr}) AS DECIMAL(38,0)))"
            " AS BIGINT) AS mass"
        ),
    )
    tot = g.agg(
        F.expr("CAST(SUM(CAST(mass AS DECIMAL(38,0))) AS BIGINT) AS __tm")
    )
    shares = g.crossJoin(F.broadcast(tot)).selectExpr(
        bq(group_col),
        "n_rows",
        "mass",
        f"pow(CAST(mass AS DOUBLE) / __tm, {alpha}) AS __q_raw",
        "CAST(mass AS DOUBLE) / __tm AS __p",
    )
    qtot = shares.agg(
        # q normalizer: micro-fixed partials so the sum is
        # order-invariant before the final double division
        F.expr(
            "CAST(SUM(CAST(floor(__q_raw * 1e6 + 0.5)"
            " AS DECIMAL(38,0))) AS DOUBLE) / 1e6 AS __qt"
        )
    )
    return shares.crossJoin(F.broadcast(qtot)).selectExpr(
        bq(group_col),
        "n_rows",
        "mass",
        "round(__p, 6) AS nat_share",
        "round(__q_raw / __qt, 6) AS temp_share",
        "round((__q_raw / __qt) / __p, 6) AS weight_mult",
    )


def pareto_skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    maximize: tuple[bool, bool] = (False, False),
    keep_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Exact 2-D Pareto skyline (Börzsönyi et al., ICDE 2001 — the
    SKYLINE operator): the rows no other row dominates, where q
    dominates p iff q is at-least-as-good on both dimensions and
    strictly better on at least one (per-dimension sense from
    ``maximize``). Identical points do not dominate each other, so
    every duplicate of a frontier point is returned — multi-objective
    selection's "no row is strictly worse" cut.

    Plan shape (the reason 2-D skyline needs no pairwise join): with
    both dims canonicalized to MINIMIZE, p is on the skyline iff
    p.y == min y at p.x AND min y over all STRICTLY smaller x is
    > p.y. So: one hash aggregate to the per-x minima (bounded by the
    x DOMAIN, not the row count), one strict-prefix running min over
    that relation (a ROWS frame ending 1 PRECEDING — exact because
    the per-x relation holds each x once), and one broadcast semi-join back
    to the full table. No O(n²) dominance pairs, no global sort of the
    data — the only window runs over the distinct-x relation. At
    100 TB the frontier relation is kilobytes; everything row-scaled
    is a scan or a hash aggregate.

    ``x_col`` must be numeric-orderable (cast timestamps first).
    Output: ``keep_cols`` (default all input columns) of the skyline
    rows.
    """
    if keep_cols is None:
        keep_cols = tuple(df.columns)
    from pyspark.sql import Window

    sx = f"(CAST({bq(x_col)} AS DOUBLE) * {-1.0 if maximize[0] else 1.0})"
    sy = f"(CAST({bq(y_col)} AS DOUBLE) * {-1.0 if maximize[1] else 1.0})"
    pts = df.selectExpr(f"{sx} AS __x", f"{sy} AS __y", *map(bq, keep_cols))
    per_x = pts.groupBy("__x").agg(F.expr("min(__y) AS __ymin"))
    w = (
        Window.orderBy("__x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = (
        per_x.withColumn("__pm", F.min("__ymin").over(w))
        .filter("__pm IS NULL OR __pm > __ymin")
        .select("__x", "__ymin")
    )
    return (
        pts.join(
            F.broadcast(frontier),
            (pts["__x"] == frontier["__x"])
            & (pts["__y"] == frontier["__ymin"]),
            "left_semi",
        )
        .select(*[bq(c) for c in keep_cols])
    )
