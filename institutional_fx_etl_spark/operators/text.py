"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's surface (BASELINE.json north star): language ID,
quality scoring, token counting, and document fingerprinting over a
``documents(text)`` relation. Everything is built-in Spark SQL array /
string expressions — zero Python UDFs, fully whole-stage-codegen'd, so
the operators scan-parallelize at 100 TB with no serialization wall.

Determinism contract: all hashing is md5-based (``_token_hash``) so an
external engine (the DuckDB oracle) reproduces values exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from institutional_fx_etl_spark.functions.identifiers import bq
from institutional_fx_etl_spark.functions.cachereg import cached, cached_deser, cached_disk

#: deterministic 32-bit token hash: first 8 hex chars of md5 → bigint.
#: DuckDB twin: CAST(concat('0x', substr(md5(t),1,8)) AS BIGINT)
def _token_hash(expr: str) -> str:
    return f"cast(conv(substr(md5({expr}),1,8),16,10) as bigint)"


def tokens(col: str = "text") -> Column:
    """Whitespace tokenization of lowercased text."""
    return F.split(F.lower(F.col(col)), r"\s+")


def shingles_expr(toks: str, n: int = 3) -> str:
    """SQL expr: word n-gram shingles of a token array expression.

    The input expression is LET-BOUND once as a lambda variable
    (``transform(array(x), __t -> ...)`` — the SQL ``let``): naming it
    as a projected column instead is NOT safe, because CollapseProject
    inlines the producing expression (typically the ``split``
    tokenizer) into every ``element_at`` reference inside the shingle
    lambda — 3 references × ~28 shingles ≈ 84 re-tokenizations per
    document. Measured at 200k docs: 53.2 s named-column vs 1.3 s
    let-bound (41×) for the identical result. Lambda variables are
    evaluated once per outer element, so the binding is
    collapse-proof by construction.
    """
    parts = ", ".join(f"element_at(__t, i+{j+1})" for j in range(n))
    return (
        f"element_at(transform(array({toks}), __t -> "
        f"transform(sequence(0, greatest(size(__t)-{n}, -1)),"
        f" i -> concat_ws(' ', {parts}))), 1)"
    )


def shingle_hashes_expr(toks: str, n: int = 3) -> str:
    """SQL expr: distinct hashed word n-gram shingles (the set MinHash /
    Jaccard operate on)."""
    return f"array_distinct(transform({shingles_expr(toks, n)}, s -> {_token_hash('s')}))"


#: per-language stopword lists for the n-gram/stopword language-ID
#: heuristic (public-knowledge closed-class words).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "es": ["el", "la", "de", "que", "y", "los"],
    "fr": ["le", "la", "et", "les", "des", "un"],
    "de": ["der", "die", "und", "das", "ein", "zu"],
    "zh": ["的", "是", "了", "我", "不"],
}


def _hits(toks: str, words: list[str]) -> str:
    quoted = ", ".join(f"'{w}'" for w in words)
    return f"size(filter({toks}, t -> t IN ({quoted})))"


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token count + length stats: the cheap per-document features every
    corpus pipeline computes first."""
    return df.withColumn("__toks", tokens(text_col)).selectExpr(
        "*",
        "size(__toks) AS n_tokens",
        f"length({text_col}) AS n_chars_computed",
        "cast(aggregate(__toks, 0L, (a, t) -> a + length(t)) as double)"
        " / size(__toks) AS avg_token_len",
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality scoring: stopword density (fluency proxy),
    punctuation ratio (boilerplate/noise proxy), length saturation."""
    stop = _hits("__toks", STOPWORDS["en"])
    return (
        df.withColumn("__toks", tokens(text_col))
        .selectExpr(
            "*",
            "size(__toks) AS n_tokens",
            f"cast(length(regexp_replace({text_col}, '[^.,!?;:]', '')) as double)"
            f" / length({text_col}) AS punct_ratio",
            f"cast({stop} as double) / size(__toks) AS stopword_ratio",
        )
        .selectExpr(
            "*",
            "round(0.4 * stopword_ratio - 0.3 * punct_ratio"
            " + 0.3 * least(n_tokens, 100) / 100.0, 6) AS quality",
        )
        .drop("__toks")
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit language ID with a deterministic priority tiebreak
    (en > es > fr > de > zh on equal scores)."""
    hits = {lang: _hits("__toks", ws) for lang, ws in STOPWORDS.items()}
    predicted = f"""
      CASE
        WHEN {hits['zh']} > greatest({hits['en']}, {hits['es']}, {hits['fr']}, {hits['de']}) THEN 'zh'
        WHEN {hits['de']} > greatest({hits['en']}, {hits['es']}, {hits['fr']}) THEN 'de'
        WHEN {hits['fr']} > greatest({hits['en']}, {hits['es']}) THEN 'fr'
        WHEN {hits['es']} > {hits['en']} THEN 'es'
        ELSE 'en'
      END
    """
    return (
        df.withColumn("__toks", tokens(text_col))
        .selectExpr("*", f"{predicted} AS predicted_lang")
        .drop("__toks")
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints: an order-insensitive content fingerprint
    (md5 of the sorted distinct token set — catches shuffled near-dups)
    and a winnowing-style min-shingle-hash (stable under small edits)."""
    return df.withColumn("__toks", tokens(text_col)).selectExpr(
        "*",
        "md5(array_join(array_sort(array_distinct(__toks)), ' ')) AS set_fingerprint",
        f"array_min({shingle_hashes_expr('__toks')}) AS min_shingle_hash",
    ).drop("__toks")


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Repetition-based quality signals (the boilerplate/spam detector
    used by large-corpus filters — e.g. Gopher/MassiveText-style
    repetition rules): per document, the word-bigram multiset size, its
    distinct count, the duplicate-bigram fraction, and the frequency
    share of the single most common token. Scan-side array expressions
    only — no shuffle, no UDF.

    ``rep_ratio`` = 1 − distinct/total bigrams (0 for docs shorter
    than 2 tokens); ``top_token_share`` = max token frequency / token
    count. Both rounded to 6dp for cross-engine hashing."""
    toks = "__toks"
    # guard: shingles_expr's sequence(0, size-2) runs DESCENDING for a
    # 1-token doc (Spark sequence(0,-1) = [0,-1] → element_at(,0)
    # error); the lazy CASE skips it entirely
    bi = (
        f"CASE WHEN size({toks}) >= 2 THEN {shingles_expr(toks, 2)}"
        " ELSE array() END"
    )
    top_cnt = (
        f"array_max(transform(array_distinct({toks}),"
        f" t -> size(filter({toks}, x -> x = t))))"
    )
    return (
        df.withColumn(toks, tokens(text_col))
        .selectExpr(
            "*",
            f"size({bi}) AS n_bigrams",
            f"size(array_distinct({bi})) AS n_distinct_bigrams",
        )
        .selectExpr(
            "*",
            "CASE WHEN n_bigrams <= 0 THEN cast(0.0 as double) ELSE"
            " round(1.0 - cast(n_distinct_bigrams as double) / n_bigrams, 6)"
            " END AS rep_ratio",
            f"round(cast({top_cnt} as double) / size({toks}), 6)"
            " AS top_token_share",
        )
        .drop(toks)
    )


def tfidf_top_terms(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Per-document top-k characteristic terms by smoothed TF-IDF
    (``tf · ln((N+1)/(df+1))``, ties → lexicographic term order). The
    classic two-aggregate shape: explode tokens → per-(doc, term)
    counts → per-term document frequency — both hash aggregates with
    map-side partial combine — then a scalar-broadcast N and a per-doc
    window top-k. At 100 TB the explode fans out scan-side (no
    pre-shuffle), df is a term-keyed aggregate (bounded by vocabulary,
    not corpus size), and only k rows per document survive the rank."""
    from pyspark.sql import Window

    toks = (
        df.select(F.col(id_col), tokens(text_col).alias("__t"))
        .select(F.col(id_col), F.explode("__t").alias("term"))
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.countDistinct(id_col).alias("__n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log((F.col("__n") + 1) / (F.col("df") + 1)),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            id_col,
            "term",
            F.col("tf").cast("int").alias("tf"),
            F.col("df").cast("int").alias("df"),
            "tfidf",
            F.col("rk").cast("int").alias("rk"),
        )
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    window_w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03): hash every word ``shingle_n``-gram, then keep the MIN
    hash of each sliding window of ``window_w`` consecutive shingles.
    The selected set is position-robust — a local edit perturbs only
    the windows it overlaps, so two documents sharing a long span
    share most of its fingerprints, which makes the (id, fp) relation
    directly joinable for plagiarism/overlap detection.

    All scan-side array expressions (no shuffle, no UDF) — the only
    fan-out is the final explode, bounded by tokens-per-doc. Guards:
    docs shorter than ``shingle_n`` tokens emit nothing; docs with
    fewer than ``window_w`` shingles emit their single global min.
    Hashes are md5-based (``_token_hash``) so an external engine
    reproduces them exactly.

    The shingle-hash array is materialized as its OWN projection
    before the sliding windows slice it: inlining the ``transform``
    expression into every ``slice`` call would re-evaluate the md5 of
    the whole document once per window — O(tokens²) hashing per doc
    (measured 31 s → 0.6 s at sf0.1)."""
    toks = "__toks"
    hs = (
        f"transform({shingles_expr(toks, shingle_n)},"
        f" s -> {_token_hash('s')})"
    )
    fps = f"""
      CASE
        WHEN size(__hs) = 0 THEN array()
        WHEN size(__hs) < {window_w} THEN array(array_min(__hs))
        ELSE array_distinct(transform(
               sequence(0, size(__hs) - {window_w}),
               j -> array_min(slice(__hs, j + 1, {window_w}))))
      END
    """
    return (
        df.withColumn(toks, tokens(text_col))
        .selectExpr(
            f"`{id_col}`",
            f"CASE WHEN size({toks}) < {shingle_n}"
            " THEN array() ELSE "
            + hs
            + " END AS __hs",
        )
        .selectExpr(f"`{id_col}`", f"explode({fps}) AS fp")
    )


def decontaminate_against(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any
    word ``n``-gram with a benchmark/eval set (the overlap rule used
    to scrub eval contamination from pretraining corpora — e.g. the
    GPT-3/PaLM 8-to-13-gram checks). Returns one row per corpus doc:
    ``n_matched`` distinct shared n-grams and a ``contaminated`` flag.

    Plan shape at 100 TB: the benchmark's distinct n-gram set is
    eval-suite-sized (small) — broadcast it; the corpus side explodes
    scan-side and the match count is one partial/final hash aggregate,
    so the corpus is read exactly once with no corpus-sized shuffle.
    N-grams join as STRINGS (no hash) — zero false positives."""
    grams = (
        f"array_distinct(CASE WHEN size(__toks) >= {n}"
        f" THEN {shingles_expr('__toks', n)} ELSE array() END)"
    )
    c = (
        corpus.withColumn("__toks", tokens(text_col))
        .selectExpr(f"`{id_col}`", f"explode_outer({grams}) AS g")
    )
    b = (
        benchmark.withColumn("__toks", tokens(text_col))
        .selectExpr(f"explode({grams}) AS g")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    return (
        c.join(F.broadcast(b), "g", "left")
        .groupBy(id_col)
        .agg(F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("int").alias("n_matched"))
        .select(
            id_col,
            "n_matched",
            (F.col("n_matched") > 0).alias("contaminated"),
        )
    )


def ngram_overlap_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    suspect_ratio: float = 0.1,
    dirty_ratio: float = 0.5,
) -> DataFrame:
    """GRADED benchmark contamination: where
    :func:`decontaminate_against` flags any shared n-gram (the binary
    scrub rule), this reports the contamination FRACTION — the share
    of each corpus document's distinct word n-grams that appear in
    the benchmark set — and classifies clean / suspect / dirty by
    ratio thresholds (the Llama-style graded contamination audit:
    a stray idiom is noise, a majority-overlap doc is an eval leak).

    Same 100 TB plan as the binary scrub: the benchmark's distinct
    n-gram set broadcasts, the corpus explodes scan-side once, one
    partial/final hash aggregate — no corpus-sized shuffle, strings
    joined exactly (zero false positives). Documents with fewer than
    ``n`` tokens have no n-grams: ratio 0, verdict 'clean'.

    The verdict compares the ROUNDED ratio (6dp) against the
    thresholds so the classification is bit-stable cross-engine.
    Output: <id_col>, n_ngrams, n_hit, overlap_ratio, verdict.
    """
    grams = (
        f"array_distinct(CASE WHEN size(__toks) >= {n}"
        f" THEN {shingles_expr('__toks', n)} ELSE array() END)"
    )
    c = (
        corpus.withColumn("__toks", tokens(text_col))
        .selectExpr(f"`{id_col}`", f"explode_outer({grams}) AS g")
    )
    b = (
        benchmark.withColumn("__toks", tokens(text_col))
        .selectExpr(f"explode({grams}) AS g")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    sus = float(suspect_ratio)
    dirty = float(dirty_ratio)
    return (
        c.join(F.broadcast(b), "g", "left")
        .groupBy(id_col)
        .agg(
            F.expr("CAST(count(g) AS BIGINT) AS n_ngrams"),
            F.expr(
                "CAST(SUM(CASE WHEN __hit IS NOT NULL THEN 1 ELSE 0"
                " END) AS BIGINT) AS n_hit"
            ),
        )
        .selectExpr(
            f"`{id_col}`",
            "n_ngrams",
            "n_hit",
            "CASE WHEN n_ngrams > 0 THEN round(CAST(n_hit AS DOUBLE)"
            " / CAST(n_ngrams AS DOUBLE), 6)"
            " ELSE CAST(0 AS DOUBLE) END AS overlap_ratio",
        )
        .selectExpr(
            f"`{id_col}`",
            "n_ngrams",
            "n_hit",
            "overlap_ratio",
            f"CASE WHEN overlap_ratio >= {dirty!r}D THEN 'dirty'"
            f" WHEN overlap_ratio >= {sus!r}D THEN 'suspect'"
            " ELSE 'clean' END AS verdict",
        )
    )


def decontaminate_eval_broadcast(
    eval_docs: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """:func:`decontaminate_against` with the JOIN DIRECTION flipped
    for the audit use-case where the PER-DOC report is wanted for the
    SMALL (eval) side and the streamed side is the TRAINING corpus.

    ``decontaminate_against(corpus, benchmark)`` broadcasts the
    *benchmark*'s distinct gram set — correct when the benchmark is
    eval-suite-sized. ``contamination_audit`` needs the same
    ``(eval_id, n_matched)`` output but against a corpus that is ~90%
    of the data: broadcasting the corpus-side gram relation would OOM
    the driver at any real scale (round-10 ADVICE #1). Here the EVAL
    ``(doc_id, gram)`` pairs — eval-suite-sized by construction — are
    the broadcast side; the training-corpus gram stream is scanned
    once, matches collapse map-side via partial aggregation, and
    ``count(DISTINCT gram)`` per eval doc reproduces
    ``decontaminate_against``'s n_matched exactly (its corpus side is
    per-doc-distinct too). Eval docs with zero hits are restored by a
    final left join against the eval id relation (small-small).

    Output schema and semantics are IDENTICAL to
    ``decontaminate_against(eval_docs, corpus)``: one row per eval
    doc, ``n_matched`` distinct shared word n-grams, ``contaminated``
    flag. Equality is pytest-gated (test_round11_ops.py).
    """
    grams = (
        f"array_distinct(CASE WHEN size(__toks) >= {n}"
        f" THEN {shingles_expr('__toks', n)} ELSE array() END)"
    )
    ev_pairs = (
        eval_docs.withColumn("__toks", tokens(text_col))
        .selectExpr(f"`{id_col}`", f"explode({grams}) AS g")
        .distinct()
    )
    corpus_grams = (
        corpus.withColumn("__toks", tokens(text_col))
        # per-doc distinct is enough here (array_distinct above); the
        # cross-corpus duplicates collapse in the aggregate below
        .selectExpr(f"explode({grams}) AS g")
    )
    hits = (
        corpus_grams.join(F.broadcast(ev_pairs), "g", "inner")
        # two-level exact distinct count: the (doc, gram) distinct is
        # a partial/final hash aggregate (map-side combine), then the
        # per-doc count is eval-sized
        .select(id_col, "g")
        .distinct()
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("int").alias("__n"))
    )
    return (
        eval_docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("__n"), F.lit(0)).alias("n_matched"),
            (F.coalesce(F.col("__n"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


#: public-pattern PII regexes (kept intentionally simple and
#: RE2/Java-compatible so an external engine applies them identically)
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?\d[\d -]{7,}\d",
}


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrubbing: replace email addresses and phone-number-shaped
    digit runs with ``[EMAIL]`` / ``[PHONE]`` placeholders and count
    the matches per document (the redaction audit). Pure
    ``regexp_replace``/``regexp_extract_all`` string expressions —
    scan-side, codegen'd, order-preserving (email first so phone
    digits inside a local-part are not double-counted)."""
    email, phone = PII_PATTERNS["email"], PII_PATTERNS["phone"]
    # Column-based regex args (NOT F.expr): SQL string literals eat
    # backslashes, the Python API passes the pattern through verbatim
    no_email = F.regexp_replace(F.col(text_col), email, "[EMAIL]")
    return (
        df.withColumn(
            "n_emails",
            F.size(
                F.regexp_extract_all(F.col(text_col), F.lit(email), F.lit(0))
            ),
        )
        .withColumn(
            "n_phones",
            F.size(F.regexp_extract_all(no_email, F.lit(phone), F.lit(0))),
        )
        .withColumn(text_col, F.regexp_replace(no_email, phone, "[PHONE]"))
    )


def winnow_overlap_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int = 10,
    min_shared: int = 3,
) -> DataFrame:
    """Document-overlap candidate pairs from winnowing fingerprints:
    docs sharing ≥ ``min_shared`` selected fingerprints (the
    plagiarism/near-dup retrieval winnowing exists for). Fingerprints
    appearing in more than ``max_df`` documents are dropped BEFORE the
    self-join — boilerplate shingles otherwise fan a hot fingerprint
    into df² pair rows, the same band-bucket cap the MinHash-LSH path
    applies. With the cap, pair generation is bounded by
    (#fingerprints · max_df²) regardless of corpus size."""
    fps = winnow_fingerprints(df, text_col, id_col)
    rare = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") <= max_df)
        .select("fp")
    )
    fpr = fps.join(rare, "fp")
    a = fpr.selectExpr("fp", f"`{id_col}` AS doc_a")
    b = fpr.selectExpr("fp", f"`{id_col}` AS doc_b")
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Fixed-window document chunking with overlap (``chunk_tokens`` −
    ``stride`` tokens shared between neighbours) — the standard
    pretraining-prep split of long documents into training sequences.
    Chunk starts step by ``stride`` from 0 while inside the document;
    the final chunk may be short. One scan-side array slice + explode
    per document — no shuffle, no UDF; at corpus scale the fan-out is
    tokens/stride per doc and rides the scan partitioning."""
    toks = "__toks"
    chunks = (
        f"transform(sequence(0, greatest(size({toks}) - 1, 0), {stride}),"
        f" s -> named_struct("
        f"'start_tok', s,"
        f" 'chunk_text', array_join(slice({toks}, s + 1, {chunk_tokens}), ' '),"
        f" 'n_tokens', least({chunk_tokens}, size({toks}) - s)))"
    )
    return (
        df.withColumn(toks, tokens(text_col))
        .selectExpr(f"`{id_col}`", f"explode({chunks}) AS __c")
        .selectExpr(
            f"`{id_col}`",
            "cast(__c.start_tok as int) AS start_tok",
            "__c.chunk_text AS chunk_text",
            "cast(__c.n_tokens as int) AS n_tokens",
        )
    )


def pack_chunks(
    chunks: DataFrame,
    id_col: str = "doc_id",
    start_col: str = "start_tok",
    len_col: str = "n_tokens",
    seq_len: int = 256,
    num_shards: int = 64,
) -> DataFrame:
    """Concatenate-and-split sequence packing — the GPT-style step
    after :func:`chunk_documents`: chunks are laid end-to-end in a
    deterministic order and cut into ``seq_len``-token training
    sequences; each chunk learns which pack it starts in and at what
    offset (a chunk may straddle two packs; the trainer's collate
    reads the tail from pack_id + 1).

    Packing is a prefix sum, which is inherently sequential — so it
    runs PER SHARD (``hash(doc_id) % num_shards``): one running-sum
    window per shard, all shards in parallel, pack ids globally unique
    via ``shard · 2^40 + local``. No global single-partition window
    ever sees the corpus; resizing ``num_shards`` trades pack-boundary
    waste against parallelism. Deterministic order inside a shard:
    (doc, chunk start). The shard hash is md5-based (``_token_hash``)
    so external engines reproduce the assignment exactly."""
    shard = f"{_token_hash(f'cast({bq(id_col)} as string)')} % {num_shards}"
    return (
        chunks.selectExpr("*", f"{shard} AS shard")
        .selectExpr(
            "*",
            f"""sum(`{len_col}`) OVER (
                  PARTITION BY shard ORDER BY `{id_col}`, `{start_col}`
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                ) - `{len_col}` AS __before""",
        )
        .selectExpr(
            f"`{id_col}`",
            f"`{start_col}`",
            f"`{len_col}`",
            "cast(shard as int) AS shard",
            f"shard * 1099511627776 + cast(floor(__before / {seq_len}) as bigint)"
            " AS pack_id",
            f"cast(__before % {seq_len} as int) AS pack_offset",
        )
    )


def token_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document unigram token entropy and type/token ratio — the
    information-density quality signal (low entropy ⇒ repetitive /
    templated text; complements the Gopher-style repetition ratios in
    :func:`repetition_stats`).

    H = log2(n) − Σ c·log2(c) / n over within-document token counts.
    Computed with scan-side array expressions only — no explode +
    per-(doc, token) shuffle; rows never leave their scan partition.
    The counts come from run-length encoding a SORTED token array
    (run-start positions → diffs), O(n log n) per doc — NOT from a
    per-distinct-token ``filter`` scan, which is O(types · tokens):
    the same accidentally-quadratic expression class as the winnowing
    bug fixed in d6c3fa3."""
    toks = "__toks"
    srt = "__srt"
    # run-start positions in the sorted array, then counts by diffing
    # consecutive starts (appending the one-past-the-end sentinel)
    starts = (
        f"filter(sequence(1, size({srt})),"
        f" i -> i = 1 OR element_at({srt}, i) != element_at({srt}, i-1))"
    )
    counts = (
        "zip_with(__starts,"
        f" concat(slice(__starts, 2, size(__starts) - 1),"
        f" array(size({srt}) + 1)),"
        " (a, b) -> b - a)"
    )
    return (
        df.withColumn(toks, tokens(text_col))
        .filter(f"size({toks}) >= 1 AND NOT ({toks} = array(''))")
        .selectExpr(
            f"`{id_col}`", f"size({toks}) AS n_tokens",
            f"array_sort({toks}) AS {srt}",
        )
        .selectExpr(f"`{id_col}`", "n_tokens", srt, f"{starts} AS __starts")
        .selectExpr(
            f"`{id_col}`",
            "n_tokens",
            "size(__starts) AS n_types",
            f"{counts} AS __c",
        )
        .selectExpr(
            f"`{id_col}`",
            "n_tokens",
            "n_types",
            "round(cast(n_types as double) / n_tokens, 6) AS type_token_ratio",
            "round(log2(cast(n_tokens as double)) - aggregate(__c, 0.0d,"
            " (a, c) -> a + cast(c as double) * log2(cast(c as double)))"
            " / n_tokens, 6) AS entropy",
        )
    )


#: GPT-2-style pretokenizer (ASCII classes so Java and RE2 regex
#: engines agree byte-for-byte): contraction suffixes, space-prefixed
#: letter runs, digit runs, punctuation runs, whitespace runs.
BPE_PRETOKEN_RE = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"
)


def bpe_token_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """BPE-grain token counting: the GPT-2 pretokenizer regex splits
    text the way a BPE tokenizer's pre-tokenization does, so
    ``n_bpe_tokens`` tracks real LM token counts far better than
    whitespace words (punctuation, contractions and digit runs count
    separately) — the number token budgets and pack sizing are
    computed from. Scan-side ``regexp_extract_all``; whitespace runs
    are excluded from the count. ``chars_per_token`` is the
    compression-ratio quality signal (outliers ⇒ non-text)."""
    pat = BPE_PRETOKEN_RE.replace("'", chr(92) + "'")
    toks = f"regexp_extract_all({bq(text_col)}, '{pat}', 0)"
    nonws = f"filter({toks}, t -> trim(t) != '')"
    return df.selectExpr(
        bq(id_col),
        f"cast(size({nonws}) as int) AS n_bpe_tokens",
        f"round(CASE WHEN size({nonws}) > 0 THEN"
        f" cast(length({bq(text_col)}) as double) / size({nonws}) END, 6)"
        " AS chars_per_token",
    )


def segment_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    segment_tokens: int = 16,
) -> DataFrame:
    """Segment-grain exact substring dedup (the scalable approximation
    of Lee et al. 2022's exact-substring dedup, at fixed token-window
    grain): split every document into non-overlapping
    ``segment_tokens``-token segments, keep each distinct segment text
    only at its FIRST occurrence corpus-wide (smallest (doc, start)),
    and reassemble the cleaned text per document.

    One shuffle keyed on the segment digest (md5 — 32-byte keys, the
    segment text itself never re-shuffles for ranking), then one
    per-document regroup bounded by the document's own segment count.
    Boilerplate that repeats across millions of documents collapses to
    its single first copy; at 100 TB the hot digest is one reduce key
    whose group is ids-only. Output: id, clean_text (kept segments in
    order), n_segments, n_kept."""
    toks = "__toks"
    segs = (
        f"transform(sequence(0, greatest(size({toks}) - 1, 0),"
        f" {segment_tokens}), s -> named_struct('start', s, 'seg',"
        f" array_join(slice({toks}, s + 1, {segment_tokens}), ' ')))"
    )
    seg_rows = (
        df.withColumn(toks, tokens(text_col))
        .selectExpr(bq(id_col), f"explode({segs}) AS __s")
        .selectExpr(
            bq(id_col),
            "cast(__s.start as int) AS start",
            "__s.seg AS seg",
            "md5(__s.seg) AS __h",
        )
    )
    w = Window.partitionBy("__h").orderBy(id_col, "start")
    ranked = seg_rows.withColumn("__rn", F.row_number().over(w))
    return (
        ranked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum((F.col("__rn") == 1).cast("int")).alias("n_kept"),
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("__rn") == 1,
                        F.struct(F.col("start"), F.col("seg")),
                    )
                )
            ).alias("__kept"),
        )
        .selectExpr(
            bq(id_col),
            "array_join(transform(__kept, s -> s.seg), ' ') AS clean_text",
            "cast(n_segments as int) AS n_segments",
            "cast(n_kept as int) AS n_kept",
        )
    )


def inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_postings: int = 10,
    min_df: int = 1,
) -> DataFrame:
    """Term → posting-list build (the search-index / data-exploration
    primitive): distinct (term, doc) pairs, one hash aggregate per
    term producing the document frequency and the first
    ``max_postings`` doc ids ascending (a bounded prefix — the full
    list for a stopword-grade term would be corpus-sized; the df count
    stays exact regardless). Postings serialize to a comma-joined
    string so the contract compare is array-free. Scan-side explode +
    ONE term-keyed shuffle whose combiner collapses per-partition
    duplicates first."""
    pairs = (
        df.withColumn("__t", F.explode(tokens(text_col)))
        .filter(F.col("__t") != "")
        .select(F.col("__t").alias("term"), F.col(id_col).alias("__id"))
        .distinct()
    )
    return (
        pairs.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.array_join(
                F.slice(
                    F.array_sort(F.collect_list("__id")), 1, max_postings
                ),
                ",",
            ).alias("postings"),
        )
        .filter(F.col("df") >= min_df)
        .select("term", F.col("df").cast("int").alias("df"), "postings")
    )


def gopher_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, §A1.1 —
    public paper), as named boolean flags plus the conjunction. All
    scan-side array/string expressions (whole-stage codegen, no UDF,
    no shuffle): the filter decision is computable in the scan stage
    of a 100 TB corpus read.

    Rules (the subset expressible over plain text; the canonical
    thresholds):
      * 50 ≤ word count ≤ 100 000
      * 3 ≤ mean word length ≤ 10
      * ≥ 80 % of words contain at least one alphabetic character
      * symbol-to-word ratio (``#`` or ``...``) ≤ 0.1
      * ≥ 2 distinct required stopwords present
        (the/of/and/to/be — fluency proxy)

    Output: doc_id plus one BOOLEAN per rule and ``gopher_pass``.
    """
    toks = "__toks"
    n = f"size({toks})"
    mean_len = (
        f"CAST(aggregate({toks}, 0L, (a, t) -> a + length(t)) AS DOUBLE)"
        f" / {n}"
    )
    alpha_frac = (
        f"CAST(size(filter({toks}, t -> t rlike '[a-z]')) AS DOUBLE)"
        f" / {n}"
    )
    sym_ratio = (
        f"CAST(size(filter({toks},"
        f" t -> t rlike '#' OR t rlike '\\\\.\\\\.\\\\.')) AS DOUBLE)"
        f" / {n}"
    )
    req = ["the", "of", "and", "to", "be"]
    quoted = ", ".join(f"'{w}'" for w in req)
    stop_distinct = (
        f"size(array_distinct(filter({toks}, t -> t IN ({quoted}))))"
    )
    flags = {
        "rule_word_count": f"{n} >= 50 AND {n} <= 100000",
        "rule_mean_word_len": f"({mean_len}) >= 3.0 AND ({mean_len}) <= 10.0",
        "rule_alpha_words": f"({alpha_frac}) >= 0.8",
        "rule_symbol_ratio": f"({sym_ratio}) <= 0.1",
        "rule_stopwords": f"{stop_distinct} >= 2",
    }
    out = df.withColumn(toks, tokens(text_col)).selectExpr(
        "*", *(f"({e}) AS {name}" for name, e in flags.items())
    )
    conj = " AND ".join(flags)
    return out.selectExpr("*", f"({conj}) AS gopher_pass").drop(toks)


def bigram_lm_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-fit bigram language-model scoring — the classic
    perplexity quality signal: fit P(w2|w1) = C(w1 w2)/C(w1 ·) by
    counting over the WHOLE corpus, then score each document by its
    mean log2 bigram probability and perplexity.

    Plan shape (the 100 TB story): one explode pass produces the
    (doc, bigram-occurrence) stream (persisted — three logical
    consumers must not re-tokenize the corpus); ONE vocabulary-bounded
    hash aggregate builds the bigram table, and the unigram table
    derives FROM it (``cu = Σ cb per w1`` — a vocabulary-sized
    aggregate, never a second stream pass); the two count tables
    pre-join at vocabulary size so the stream shuffles exactly ONCE to
    pick up both counts (bigram table can exceed broadcast size at web
    scale — the join key is the bigram, text never moves twice); one
    final per-doc aggregate. Every stage is JVM codegen, no UDF.
    (Round 7: this replaced 3 tokenize passes + 2 stream shuffles with
    1 + 1 — counts are identical, the oracle is untouched.)

    Probabilities are ratios of exact integer counts; the per-doc sum
    of log2 ratios is a ≤n_tokens-term double sum rounded to 6
    (the text_entropy precedent — cross-engine log2 agrees well under
    the rounding at these term counts). Perplexity is computed FROM
    the rounded mean so both engines exponentiate the same value.

    Output: doc_id, n_bigrams, avg_log2_prob, perplexity.
    

    Eager note: BUILDING this plan launches Spark jobs — internal
    persist + count() barriers materialize shared subtrees race-free
    at construction time (r14 ADVICE; the caches are plan-keyed and
    ledger-bounded, functions/cachereg.py).
    """
    from pyspark import StorageLevel

    toks = tokens(text_col)
    doc_bi = (
        df.withColumn("__toks", toks)
        .filter("size(__toks) >= 2")
        .selectExpr(
            id_col,
            # shingles_expr let-binds the token array so the split is
            # evaluated once per doc, not once per element_at reference
            f"explode({shingles_expr('__toks', 2)}) AS bg",
        )
        .selectExpr(id_col, "bg", "substring_index(bg, ' ', 1) AS w1")
    )
    doc_bi = doc_bi.transform(cached)
    # count barrier (r14, the pagerank race lesson): the bigram-table
    # build and the score join consume this relation from concurrently
    # submitted stages — a cold lazy persist is raced and the
    # tokenize+explode pass runs twice
    doc_bi.count()
    # w1 is functional on bg (the bigram's first token), so max(w1) is
    # a constant pick, and the unigram count is the bigram-table
    # rollup — both aggregates after the first are vocabulary-sized
    cb = doc_bi.groupBy("bg").agg(
        F.count(F.lit(1)).alias("cb"), F.expr("max(w1) AS w1")
    )
    cu = cb.groupBy("w1").agg(F.sum("cb").alias("cu"))
    ref = cb.join(cu, "w1").select("bg", "cb", "cu")
    return (
        doc_bi.join(ref, "bg")
        .selectExpr(
            id_col,
            "log2(CAST(cb AS DOUBLE) / CAST(cu AS DOUBLE)) AS __lp",
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum("__lp") / F.count(F.lit(1)), 6
            ).alias("avg_log2_prob"),
        )
        .selectExpr(
            id_col,
            "n_bigrams",
            "avg_log2_prob",
            "round(power(2.0, -avg_log2_prob), 6) AS perplexity",
        )
    )


def kneser_ney_bigram(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
    top_k: int = 200,
) -> DataFrame:
    """Interpolated Kneser–Ney bigram model table (Kneser & Ney,
    ICASSP 1995; Chen & Goodman 1998 eq. 4.26 — THE standard n-gram
    smoothing):

        P_KN(w2|w1) = max(c(w1 w2) − D, 0) / c(w1 ·)
                      + (D · N1+(w1 ·) / c(w1 ·)) · P_cont(w2)
        P_cont(w2)  = N1+(· w2) / N1+(· ·)

    with fixed discount ``D`` — the continuation probability ranks a
    word by how many DISTINCT contexts it follows, not how often (the
    "San Francisco" correction: "Francisco" is frequent but occurs in
    one context, so its continuation mass is tiny).

    Everything derives from ONE vocabulary-bounded bigram count table
    (the :func:`bigram_lm_score` discipline): c(w1 ·) and the forward
    type count N1+(w1 ·) roll up per w1, the backward type count
    N1+(· w2) per w2, N1+(· ·) is the table's row count — no second
    pass over the corpus stream, no window. The released table is the
    ``top_k`` bigrams by count (total-ordered: count desc, bigram
    asc), i.e. a sort over the COUNT table, never the stream.

    Probabilities are pinned-association doubles over exact integer
    counts, rounded to 6. Output: bg, cb, p_mle, p_kn.
    """
    d = float(discount)
    toks = tokens(text_col)
    bi = (
        df.withColumn("__toks", toks)
        .filter("size(__toks) >= 2")
        .selectExpr(f"explode({shingles_expr('__toks', 2)}) AS bg")
        .selectExpr(
            "bg",
            "substring_index(bg, ' ', 1) AS w1",
            "substring_index(bg, ' ', -1) AS w2",
        )
    )
    cb = bi.groupBy("bg").agg(
        F.expr("max(w1) AS w1"),
        F.expr("max(w2) AS w2"),
        F.expr("CAST(count(*) AS BIGINT) AS cb"),
    )
    cu = cb.groupBy("w1").agg(
        F.expr("CAST(SUM(cb) AS BIGINT) AS cu"),
        F.expr("CAST(count(*) AS BIGINT) AS n1f"),
    )
    bwd = cb.groupBy("w2").agg(
        F.expr("CAST(count(*) AS BIGINT) AS n1b")
    )
    tot = cb.agg(F.expr("CAST(count(*) AS BIGINT) AS n_types"))
    return (
        cb.join(cu, "w1")
        .join(bwd, "w2")
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "bg",
            "cb",
            "round(CAST(cb AS DOUBLE) / CAST(cu AS DOUBLE), 6)"
            " AS p_mle",
            f"round(greatest(CAST(cb AS DOUBLE) - {d!r}D,"
            " CAST(0 AS DOUBLE)) / CAST(cu AS DOUBLE)"
            f" + (({d!r}D * CAST(n1f AS DOUBLE)) / CAST(cu AS DOUBLE))"
            "   * (CAST(n1b AS DOUBLE) / CAST(n_types AS DOUBLE)), 6)"
            " AS p_kn",
        )
        .orderBy(F.desc("cb"), F.asc("bg"))
        .limit(int(top_k))
    )


def stupid_backoff_lm(
    train: DataFrame,
    score: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha_tenths: int = 4,
) -> DataFrame:
    """Trigram stupid-backoff scoring (Brants et al. 2007, §3 — the
    web-scale LM recipe: unnormalized score
    ``S(w3|w1 w2) = C(w1w2w3)/C(w1w2)`` when the trigram was seen,
    else ``α·C(w2w3)/C(w2)``, else ``α²·C(w3)/N``, with α = 0.4;
    "stupid" because no discounting/normalization — at corpus scale
    the backoff chain is what matters, and it needs only raw count
    tables). Counts fit on ``train``; every ``score`` document with
    ≥3 tokens gets its mean log2 S over trigram positions plus the
    per-level hit counts (the OOV-pressure diagnostic). A token
    unseen even as a unigram scores the deterministic floor ``α³/N``
    (never log2(0)).

    Plan shape (the 100 TB story): the train corpus tokenizes ONCE
    (persisted narrow (doc, toks) frame), then three vocabulary-
    bounded hash aggregates build the trigram/bigram/unigram tables
    and one 1-row total; the scoring stream explodes to trigram
    positions and shuffles on n-gram STRING keys through left joins
    against the count tables (never broadcastable at web scale — the
    position stream moves once per grain), then one per-doc
    aggregate. No UDF anywhere.

    Determinism: every S is a product of an exact power of α (a
    dyadic-exact CASE branch constant CAST to DOUBLE) and ONE
    division of two exact BIGINT counts; the per-doc mean rounds to
    6dp (the ``bigram_lm_score`` discipline — the oracle mirrors the
    association token for token).

    Output: id, n_positions, n_tri, n_bi_backoff, n_uni_backoff,
    n_floor, avg_log2_s, score_ppl (2^-avg — unnormalized
    "perplexity" under S).
    """
    from pyspark import StorageLevel

    a = int(alpha_tenths)  # α numerator over 10 (default 4 → α = 0.4)
    if not 1 <= a <= 9:
        # the branch constants are built as decimal literals 0.a /
        # 0.(a²) / 0.(a³); a ≥ 10 would silently shift the scale
        raise ValueError(f"alpha_tenths must be in 1..9, got {alpha_tenths}")
    toked = (
        train.withColumn("__toks", tokens(text_col))
        .selectExpr("__toks")
        .transform(cached)
    )
    t3 = (
        toked.filter("size(__toks) >= 3")
        .selectExpr(f"explode({shingles_expr('__toks', 3)}) AS g")
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("c3"))
    )
    t2 = (
        toked.filter("size(__toks) >= 2")
        .selectExpr(f"explode({shingles_expr('__toks', 2)}) AS g")
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    t1 = (
        toked.selectExpr("explode(__toks) AS g")
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    total = toked.selectExpr("explode(__toks) AS g").agg(
        F.count(F.lit(1)).alias("__N")
    )
    pos = (
        score.withColumn("__toks", tokens(text_col))
        .filter("size(__toks) >= 3")
        .selectExpr(
            bq(id_col),
            f"explode({shingles_expr('__toks', 3)}) AS g3",
        )
        .selectExpr(
            bq(id_col),
            "g3",
            # context bigram (w1 w2), backoff bigram (w2 w3), w2, w3
            "substring_index(g3, ' ', 2) AS gc",
            "substring_index(g3, ' ', -2) AS gb",
            "substring_index(substring_index(g3, ' ', 2), ' ', -1) AS w2",
            "substring_index(g3, ' ', -1) AS w3",
        )
    )
    j = (
        pos.join(t3.withColumnRenamed("g", "g3"), "g3", "left")
        .join(
            t2.selectExpr("g AS gc", "c2 AS c2ctx"), "gc", "left"
        )
        .join(t2.selectExpr("g AS gb", "c2 AS c2b"), "gb", "left")
        .join(t1.selectExpr("g AS w2", "c1 AS c1w2"), "w2", "left")
        .join(t1.selectExpr("g AS w3", "c1 AS c1w3"), "w3", "left")
        .crossJoin(F.broadcast(total))
    )
    lp = (
        "CASE"
        " WHEN coalesce(c3, 0) > 0 THEN"
        "  log2(CAST(c3 AS DOUBLE) / CAST(c2ctx AS DOUBLE))"
        " WHEN coalesce(c2b, 0) > 0 THEN"
        f"  log2(CAST(0.{a} AS DOUBLE)"
        "   * (CAST(c2b AS DOUBLE) / CAST(c1w2 AS DOUBLE)))"
        " WHEN coalesce(c1w3, 0) > 0 THEN"
        f"  log2(CAST(0.{a * a:02d} AS DOUBLE)"
        "   * (CAST(c1w3 AS DOUBLE) / CAST(__N AS DOUBLE)))"
        f" ELSE log2(CAST(0.{a * a * a:03d} AS DOUBLE)"
        "   / CAST(__N AS DOUBLE)) END"
    )
    lvl = (
        "CASE WHEN coalesce(c3, 0) > 0 THEN 0"
        " WHEN coalesce(c2b, 0) > 0 THEN 1"
        " WHEN coalesce(c1w3, 0) > 0 THEN 2 ELSE 3 END"
    )
    return (
        j.selectExpr(bq(id_col), f"{lp} AS __lp", f"{lvl} AS __lvl")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_positions"),
            F.sum((F.col("__lvl") == 0).cast("int"))
            .cast("bigint")
            .alias("n_tri"),
            F.sum((F.col("__lvl") == 1).cast("int"))
            .cast("bigint")
            .alias("n_bi_backoff"),
            F.sum((F.col("__lvl") == 2).cast("int"))
            .cast("bigint")
            .alias("n_uni_backoff"),
            F.sum((F.col("__lvl") == 3).cast("int"))
            .cast("bigint")
            .alias("n_floor"),
            F.round(F.sum("__lp") / F.count(F.lit(1)), 6).alias(
                "avg_log2_s"
            ),
        )
        .selectExpr(
            bq(id_col),
            "n_positions",
            "n_tri",
            "n_bi_backoff",
            "n_uni_backoff",
            "n_floor",
            "avg_log2_s",
            "round(power(2.0, -avg_log2_s), 6) AS score_ppl",
        )
    )


def bpe_merge_candidates(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = 20,
) -> DataFrame:
    """First BPE merge iteration over the corpus: the most frequent
    ADJACENT CHARACTER PAIRS, weighted by word frequency — the
    classic tokenizer-training recipe (Sennrich et al. 2016) computes
    pair counts over the DISTINCT word vocabulary × word frequency,
    never over raw running text, and that is exactly the scale path
    here: one vocabulary-bounded shuffle collapses the corpus to
    (word, count), the pair explode then fans over distinct words
    only (len(word)−1 pairs each), and a second vocabulary-bounded
    aggregate sums the weighted pair counts. At 100 TB the corpus is
    touched once; everything after the first combine is
    vocabulary-sized. Top-k by (freq desc, pair asc) is a partial
    TakeOrderedAndProject, fully tie-broken. Output: pair, freq.
    """
    words = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .filter("w <> ''")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.length("w") >= 2)
    )
    pairs = words.selectExpr(
        "explode(transform(sequence(1, length(w) - 1),"
        " i -> substring(w, i, 2))) AS pair",
        "cnt",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("cnt").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("pair"))
        .limit(top_k)
    )


def cooccurrence_lift(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    max_tokens: int = 40,
) -> DataFrame:
    """Document-level token co-occurrence LIFT (the PMI association
    measure without its logarithm): for token pair (a, b),
    ``lift = n_ab · N / (n_a · n_b)`` over document frequencies —
    > 1 means the tokens attract, < 1 they repel.

    Determinism engineering: PMI's ``log`` is libm territory (JVM vs
    DuckDB may differ in the last ulp); lift is a SINGLE IEEE division
    of exact integers — bit-identical everywhere, and monotone in PMI
    so rankings agree. Per-doc token sets are ``array_sort(
    array_distinct(tokens))`` truncated to ``max_tokens`` —
    lexicographic, so the truncation is engine-independent (DuckDB's
    ``list_distinct`` does not preserve order; sort-then-slice
    sidesteps that). Pairs below ``min_count`` docs drop.

    Scale shape: pair fan-out is C(max_tokens, 2) per doc — a
    CONSTANT, not O(vocab²); counts are two hash aggregates
    (vocabulary-bounded) and the final lift joins token counts back by
    key. No text shuffles beyond the per-doc token arrays.

    Output: tok_a < tok_b, n_ab, n_a, n_b, lift (6 dp).
    """
    toked = df.select(
        F.col(id_col).alias("id"),
        F.expr(
            f"slice(array_sort(array_distinct(split(lower({text_col}),"
            f" '\\\\s+'))), 1, {max_tokens})"
        ).alias("ts"),
    ).transform(cached_deser)
    n_docs = toked.count()
    tok = toked.select(F.explode("ts").alias("t")).filter("t <> ''")
    df_counts = tok.groupBy("t").agg(F.count(F.lit(1)).alias("n_t"))
    pairs = (
        toked.select(
            F.explode(
                F.expr(
                    "flatten(transform(ts, (a, i) ->"
                    " transform(slice(ts, i + 2, size(ts)), b ->"
                    " struct(a AS ta, b AS tb))))"
                )
            ).alias("p")
        )
        .selectExpr("p.ta AS tok_a", "p.tb AS tok_b")
        .filter("tok_a <> '' AND tok_b <> ''")
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_count)
    )
    return (
        pairs.join(df_counts.selectExpr("t AS tok_a", "n_t AS n_a"), "tok_a")
        .join(df_counts.selectExpr("t AS tok_b", "n_t AS n_b"), "tok_b")
        .selectExpr(
            "tok_a",
            "tok_b",
            "n_ab",
            "n_a",
            "n_b",
            f"floor(CAST(n_ab AS DOUBLE) * {n_docs}.0D"
            " / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) * 1e6 + 0.5D)"
            " / 1e6 AS lift",
        )
    )


def tokenizer_coverage(
    df: DataFrame,
    vocab: list[str],
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Vocabulary coverage per group: what share of a corpus' token
    OCCURRENCES a frozen tokenizer vocabulary covers — the go/no-go
    check before committing a tokenizer to a 100 TB pretraining run
    (high OOV ⇒ wasted context length on byte-fallback).

    The vocabulary broadcasts as an array literal; membership is a
    scan-side ``array_contains`` fold — one aggregate, no join, no
    UDF. Exact integer counts; coverage is one final division.

    Output per group: group, n_tokens, n_covered, coverage (6 dp).
    """
    vlit = "array(" + ", ".join(f"'{w}'" for w in sorted(vocab)) + ")"
    toks = f"filter(split(lower({text_col}), '\\\\s+'), x -> x <> '')"
    return (
        df.selectExpr(
            f"{group_col} AS grp",
            f"size({toks}) AS n",
            f"size(filter({toks}, x -> array_contains({vlit}, x)))"
            " AS c",
        )
        .groupBy("grp")
        .agg(
            F.sum("n").alias("n_tokens"),
            F.sum("c").alias("n_covered"),
        )
        .selectExpr(
            "grp",
            "n_tokens",
            "n_covered",
            "floor(CAST(n_covered AS DOUBLE) / CAST(n_tokens AS DOUBLE)"
            " * 1e6 + 0.5D) / 1e6 AS coverage",
        )
    )

def bm25_rank(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> DataFrame:
    """BM25 ranked retrieval for a fixed query — the IR scoring
    classic (Robertson-Spärck Jones, public formula):
    ``Σ_t idf_t · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`` with
    ``idf = ln((N−df+0.5)/(df+0.5)+1)``.

    Plan: ONE corpus scan computes (dl, tf per term) scan-side — term
    frequencies via ``size(filter(tokens, = term))``, no posting-list
    explode/shuffle for a bounded query — all emitted from a single
    let-bound token evaluation through an ``inline`` generator; one
    one-row global aggregate (N, Σdl, df per term) broadcasts back;
    the final top-k is a partial TakeOrdered. At 100 TB: one pass,
    one scalar broadcast, no full sort.

    Determinism: ordering key is (round(score, 6) DESC, id ASC) on
    BOTH engines, so last-ulp ``ln`` differences cannot flip the
    cutoff: rounded ties break on the unique id.
    """
    from institutional_fx_etl_spark.functions.identifiers import let1

    tf_fields = ", ".join(
        f"'tf{i}', size(filter(__t, x -> x = '{t}'))"
        for i, t in enumerate(query_terms)
    )
    struct = f"named_struct('dl', size(__t), {tf_fields})"
    split_expr = "split(lower(" + text_col + "), '\\\\s+')"
    per_doc = df.selectExpr(
        id_col,
        f"inline(array({let1(split_expr, '__t', struct)}))",
    )
    df_aggs = [
        F.expr(
            f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS df{i}"
        )
        for i in range(len(query_terms))
    ]
    g = per_doc.agg(
        F.expr("CAST(count(*) AS BIGINT) AS n"),
        F.expr("CAST(SUM(dl) AS BIGINT) AS sum_dl"),
        *df_aggs,
    )
    c_k1 = f"CAST('{k1!r}' AS DOUBLE)"
    c_k11 = f"CAST('{k1 + 1.0!r}' AS DOUBLE)"
    c_1b = f"CAST('{1.0 - b!r}' AS DOUBLE)"
    c_b = f"CAST('{b!r}' AS DOUBLE)"
    terms = []
    for i in range(len(query_terms)):
        idf = (
            f"ln((CAST(n AS DOUBLE) - CAST(df{i} AS DOUBLE) + 0.5)"
            f" / (CAST(df{i} AS DOUBLE) + 0.5) + 1.0)"
        )
        terms.append(
            f"{idf} * (CAST(tf{i} AS DOUBLE) * {c_k11})"
            f" / (CAST(tf{i} AS DOUBLE) + {c_k1} * ({c_1b} + {c_b}"
            f" * CAST(dl AS DOUBLE)"
            f" / (CAST(sum_dl AS DOUBLE) / CAST(n AS DOUBLE))))"
        )
    score = " + ".join(terms)
    scored = per_doc.crossJoin(F.broadcast(g)).selectExpr(
        id_col,
        "dl",
        *[f"tf{i}" for i in range(len(query_terms))],
        f"round({score}, 6) AS score",
    )
    return scored.orderBy(
        F.desc("score"), F.asc(id_col)
    ).limit(top_k)


def bm25_score_sql(query_terms: list[str], k1: float = 1.2, b: float = 0.75) -> str:
    """The oracle-side mirror of :func:`bm25_rank`'s score expression
    (identical text modulo engine-shared syntax) — kept adjacent so
    the two cannot drift."""
    c_k1 = f"CAST('{k1!r}' AS DOUBLE)"
    c_k11 = f"CAST('{k1 + 1.0!r}' AS DOUBLE)"
    c_1b = f"CAST('{1.0 - b!r}' AS DOUBLE)"
    c_b = f"CAST('{b!r}' AS DOUBLE)"
    terms = []
    for i in range(len(query_terms)):
        idf = (
            f"ln((CAST(n AS DOUBLE) - CAST(df{i} AS DOUBLE) + 0.5)"
            f" / (CAST(df{i} AS DOUBLE) + 0.5) + 1.0)"
        )
        terms.append(
            f"{idf} * (CAST(tf{i} AS DOUBLE) * {c_k11})"
            f" / (CAST(tf{i} AS DOUBLE) + {c_k1} * ({c_1b} + {c_b}"
            f" * CAST(dl AS DOUBLE)"
            f" / (CAST(sum_dl AS DOUBLE) / CAST(n AS DOUBLE))))"
        )
    return " + ".join(terms)


def ngram_novelty(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a document's
    distinct word n-grams whose FIRST corpus occurrence (min doc id)
    is this document — the cheap "how much genuinely new text does
    this doc add" signal used to down-weight boilerplate-heavy
    sources when composing a pretraining mix (the corpus-level
    complement of pairwise dedup: novelty ≈ 1 − containment in
    everything before you).

    Plan: one scan explodes each doc's DISTINCT hashed shingles
    (md5-int — the shuffle carries 8-byte hashes, never text), one
    groupBy(hash) finds each n-gram's first owner, one hash-keyed
    join back (co-partitioned with the groupBy — no extra exchange)
    and one per-doc aggregate. Docs with fewer than ``shingle_n``
    tokens have no shingles and are excluded, mirroring the MinHash
    family's domain.

    Output: <id_col>, n_ngrams (BIGINT), n_novel (BIGINT),
    novelty (DOUBLE, 6dp).
    

    Eager note: BUILDING this plan launches Spark jobs — internal
    persist + count() barriers materialize shared subtrees race-free
    at construction time (r14 ADVICE; the caches are plan-keyed and
    ledger-bounded, functions/cachereg.py).
    """
    from pyspark.storagelevel import StorageLevel


    ic = bq(id_col)
    # r14 (guide §1.2 + §2.4): the exploded shingle relation feeds TWO
    # consumers (the first-owner aggregate and the join-back), and the
    # tokenize+hash derivation ran once per consumer — on a
    # single-row-group input that was two sequential single-core
    # passes (profiled: two identical 0.54 s one-task stages). The
    # per-doc hash-ARRAY relation is persisted + count-materialized so
    # both consumers explode from cache instead of re-tokenizing
    # (arrays, not exploded rows — the smaller cache; the explode
    # re-runs per consumer but is plain JVM fan-out). A scan-spread
    # variant was measured and REJECTED: with the base persisted, the
    # tokenize runs once per session, so the repartition only taxed
    # every warm cached scan with 32-task overhead.
    base = (
        df.withColumn("__toks", tokens(text_col))
        .filter(f"size(__toks) >= {shingle_n}")
        .selectExpr(
            ic, f"{shingle_hashes_expr('__toks', shingle_n)} AS __hs"
        )
        .transform(cached)
    )
    base.count()
    ex = base.selectExpr(ic, "explode(__hs) AS h")
    own = ex.groupBy("h").agg(F.min(id_col).alias("first_doc"))
    return (
        ex.join(own, "h")
        .groupBy(id_col)
        .agg(
            F.expr("CAST(count(1) AS BIGINT) AS n_ngrams"),
            F.expr(
                f"CAST(SUM(CASE WHEN first_doc = {ic} THEN 1 ELSE 0 END)"
                " AS BIGINT) AS n_novel"
            ),
        )
        .selectExpr(
            ic,
            "n_ngrams",
            "n_novel",
            "round(CAST(n_novel AS DOUBLE) / n_ngrams, 6) AS novelty",
        )
    )


def ngram_novelty_incremental(
    df: DataFrame,
    new_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Incremental :func:`ngram_novelty`: score ONLY the documents
    where ``new_col`` is true against the prior corpus's first-owner
    STATE plus the new batch itself — the merge-a-batch shape where
    re-exploding the existing corpus per delivery would be the
    dominant cost. At scale the ``(h, first_doc)`` state is a
    precomputed relation loaded from storage (exactly the
    ``minhash_lsh_pairs(new_col=...)`` / ``knn_join_incremental``
    maintenance pattern); here it is derived from the old partition
    so the contract oracle — the FULL run restricted to new ids —
    proves incremental ≡ full by hash equality.

    A new doc owns a shingle iff it is the minimum id across BOTH
    populations: no old owner or a larger-id old owner (ids may
    interleave), and it is the first among the new batch. Work is
    one explode of the NEW docs plus one hash-keyed semi-state join;
    the old corpus contributes only its bounded state relation.

    Output: <id_col>, n_ngrams, n_novel, novelty — identical schema
    and values to the full run's rows for the new ids.
    """
    ic = bq(id_col)
    ex_all = (
        df.withColumn("__toks", tokens(text_col))
        .filter(f"size(__toks) >= {shingle_n}")
        .selectExpr(
            ic,
            f"{bq(new_col)} AS __new",
            f"explode({shingle_hashes_expr('__toks', shingle_n)}) AS h",
        )
    )
    state = (
        ex_all.filter("NOT __new")
        .groupBy("h")
        .agg(F.min(id_col).alias("old_first"))
    )
    exn = ex_all.filter("__new").select(id_col, "h")
    new_first = exn.groupBy("h").agg(F.min(id_col).alias("new_first"))
    return (
        exn.join(new_first, "h")
        .join(state, "h", "left")
        .groupBy(id_col)
        .agg(
            F.expr("CAST(count(1) AS BIGINT) AS n_ngrams"),
            F.expr(
                f"CAST(SUM(CASE WHEN new_first = {ic} AND"
                f" (old_first IS NULL OR old_first > {ic})"
                " THEN 1 ELSE 0 END) AS BIGINT) AS n_novel"
            ),
        )
        .selectExpr(
            ic,
            "n_ngrams",
            "n_novel",
            "round(CAST(n_novel AS DOUBLE) / n_ngrams, 6) AS novelty",
        )
    )


def cross_source_overlap(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    shingle_n: int = 3,
) -> DataFrame:
    """Source-pair n-gram containment matrix: for every pair of
    sources, how much of each one's distinct shingle vocabulary the
    other already covers — the corpus-composition diagnostic that
    tells you which feeds are near-copies of each other (mirror
    sites, syndicated wires) BEFORE you spend pairwise-dedup budget
    on them.

    Plan: one explode to DISTINCT (source, shingle-hash) rows — the
    per-source vocabulary, 8-byte hashes only — one hash-keyed
    self-join whose fan-out per shingle is bounded by the number of
    sources carrying it (≤ #sources, a catalog-sized constant, never
    corpus rows), one pair aggregate. Totals ride a second tiny
    aggregate on the same vocabulary relation.

    Output: src_a < src_b, shared (BIGINT), n_a, n_b,
    containment_a = shared/n_a, containment_b = shared/n_b (6dp).
    

    Eager note: BUILDING this plan launches Spark jobs — internal
    persist + count() barriers materialize shared subtrees race-free
    at construction time (r14 ADVICE; the caches are plan-keyed and
    ledger-bounded, functions/cachereg.py).
    """
    from pyspark.storagelevel import StorageLevel


    # r14 (guide §2.4): the per-source vocabulary feeds THREE
    # consumers (totals + both self-join arms) and the distinct's
    # exchange was NOT reused across them (profiled: two identical
    # 0.83 s single-task tokenize stages per pass) — persist + count
    # materializes it once
    voc = (
        df.withColumn("__toks", tokens(text_col))
        .filter(f"size(__toks) >= {shingle_n}")
        .selectExpr(
            f"{bq(group_col)} AS src",
            f"explode({shingle_hashes_expr('__toks', shingle_n)}) AS h",
        )
        .distinct()
        .transform(cached)
    )
    voc.count()
    totals = voc.groupBy("src").agg(
        F.expr("CAST(count(1) AS BIGINT) AS n")
    )
    a = voc.selectExpr("src AS src_a", "h")
    b = voc.selectExpr("src AS src_b", "h")
    shared = (
        a.join(b, "h")
        .filter("src_a < src_b")
        .groupBy("src_a", "src_b")
        .agg(F.expr("CAST(count(1) AS BIGINT) AS shared"))
    )
    return (
        shared.join(
            F.broadcast(totals.selectExpr("src AS src_a", "n AS n_a")),
            "src_a",
        )
        .join(
            F.broadcast(totals.selectExpr("src AS src_b", "n AS n_b")),
            "src_b",
        )
        .selectExpr(
            "src_a",
            "src_b",
            "shared",
            "n_a",
            "n_b",
            "round(CAST(shared AS DOUBLE) / n_a, 6) AS containment_a",
            "round(CAST(shared AS DOUBLE) / n_b, 6) AS containment_b",
        )
    )


def dup_span_coverage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Positional duplicated-span coverage: the fraction of each
    document's TOKEN POSITIONS covered by at least one word n-gram
    that occurs ≥ 2 times anywhere in the corpus (cross-doc or
    intra-doc) — the ExactSubstr-style signal of "Deduplicating
    Training Data Makes Language Models Better" (Lee et al. 2022),
    approximated at n-gram granularity so it stays a pure
    shuffle-on-8-byte-hash plan. Unlike :func:`ngram_novelty` (set
    semantics over DISTINCT shingles), this is positional: a doc that
    repeats one boilerplate sentence fifty times scores ~100%
    coverage here but high novelty there — coverage is what you trim
    on, novelty is what you weight on.

    Plan: one scan emits (id, shingle position, hash) — positions are
    dense 0..size-n so ``n_tokens`` never travels; one groupBy(hash)
    finds duplicated shingles (partial-agg count); one hash-keyed
    join back restricted to dup hashes; each surviving start explodes
    to its ``shingle_n`` covered positions (bounded ×n fan) and one
    per-doc distinct-count merges overlapping spans exactly. Docs
    shorter than ``shingle_n`` tokens are excluded (the MinHash
    family's domain rule).

    Output: <id_col>, n_tokens (BIGINT), n_dup_pos (BIGINT),
    dup_coverage (DOUBLE, 6dp).
    

    Eager note: BUILDING this plan launches Spark jobs — internal
    persist + count() barriers materialize shared subtrees race-free
    at construction time (r14 ADVICE; the caches are plan-keyed and
    ledger-bounded, functions/cachereg.py).
    """
    from pyspark.storagelevel import StorageLevel


    ic = bq(id_col)
    # r14 (guide §1.2): tokenize ONCE into a persisted per-doc
    # (id, n_tokens, positional-hash array) base — the former shape
    # tokenized the corpus three times (the dup-count leg, the
    # join-back leg, and the lens branch), each a single-core pass on
    # a single-row-group input; both downstream legs explode from
    # cache.
    base = (
        df.withColumn("__toks", tokens(text_col))
        .filter(f"size(__toks) >= {shingle_n}")
        .selectExpr(
            ic,
            "CAST(size(__toks) AS BIGINT) AS n_tokens",
            "transform("
            f"{shingles_expr('__toks', shingle_n)},"
            f" s -> {_token_hash('s')}) AS __phs",
        )
        .transform(cached)
    )
    base.count()
    ex = base.selectExpr(ic, "posexplode(__phs) AS (pos, h)")
    dup = ex.groupBy("h").agg(F.count(F.lit(1)).alias("__c")).filter(
        "__c >= 2"
    )
    covered = (
        ex.join(dup.select("h"), "h")
        .selectExpr(ic, f"explode(sequence(pos, pos + {shingle_n - 1})) AS p")
        .groupBy(id_col)
        .agg(F.expr("CAST(count(DISTINCT p) AS BIGINT) AS n_dup_pos"))
    )
    lens = base.selectExpr(ic, "n_tokens")
    return (
        lens.join(covered, id_col, "left")
        .selectExpr(
            ic,
            "n_tokens",
            "CAST(COALESCE(n_dup_pos, 0) AS BIGINT) AS n_dup_pos",
            "round(CAST(COALESCE(n_dup_pos, 0) AS DOUBLE) / n_tokens, 6)"
            " AS dup_coverage",
        )
    )


def boilerplate_purge(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    segment_tokens: int = 8,
    min_df: int = 2,
) -> DataFrame:
    """C4-style boilerplate removal at fixed segment grain (Raffel et
    al. 2020, §2.2 drop any line occurring on ≥3 pages; this corpus is
    newline-free, so the "line" is the non-overlapping
    ``segment_tokens``-token window): a segment whose text occurs in
    at least ``min_df`` DISTINCT documents is boilerplate and EVERY
    occurrence of it is purged — unlike :func:`segment_dedup`, which
    keeps the first copy, a navigation bar's first page is as much
    junk as its millionth.

    Plan shape (the 100 TB story): scan-side segment explode; the doc
    frequency is ONE digest-keyed aggregate over DISTINCT
    (digest, doc) pairs — the partial aggregate collapses a document's
    internal repeats before the exchange, so a hot boilerplate digest
    arrives as one row per doc and reduces on a single bounded key;
    verdicts join back on the 32-byte digest (the segment text itself
    never re-shuffles); one per-doc regroup bounded by the document's
    own segment count reassembles the kept text. No UDF, no all-pairs.

    Tokenless documents (empty/whitespace-only text) contribute NO
    segments — in particular the degenerate '' segment is filtered
    BEFORE the doc-frequency aggregate, so a corpus with ≥ ``min_df``
    empty documents cannot count '' as boilerplate and inflate
    n_segments/n_purged (round-10 ADVICE #3). They still appear in the
    output (one row per input document) with n_segments = 0,
    n_purged = 0, clean_text = ''.

    Cache lifetime: the segment relation is persisted
    (MEMORY_AND_DISK) because it feeds both the doc-frequency
    aggregate and the verdict join; the returned DataFrame is lazy, so
    the CALLER owns the cache — unpersist via
    ``spark.catalog.clearCache()`` (or re-create the session) between
    repeated invocations in a long-lived session, as with
    ``dedup_clusters``'s documented discipline.

    Output: id, clean_text (kept segments in order), n_segments,
    n_purged.
    """
    if min_df < 2:
        # df >= 1 holds for every segment (its own doc), so min_df < 2
        # silently purges the whole corpus — always a caller bug
        raise ValueError(f"min_df must be >= 2, got {min_df}")
    toks = "__toks"
    segs = (
        f"transform(sequence(0, greatest(size({toks}) - 1, 0),"
        f" {segment_tokens}), s -> named_struct('start', s, 'seg',"
        f" array_join(slice({toks}, s + 1, {segment_tokens}), ' ')))"
    )
    from pyspark import StorageLevel

    # seg_rows feeds BOTH the doc-frequency aggregate and the verdict
    # join; persist so the explode+md5 pass over the corpus runs once.
    # seg <> '' drops the degenerate empty segment a tokenless doc
    # emits (sequence(0, greatest(size-1, 0), k) yields [0] at size 0)
    seg_rows = (
        df.withColumn(toks, tokens(text_col))
        .selectExpr(bq(id_col), f"explode({segs}) AS __s")
        .selectExpr(
            bq(id_col),
            "cast(__s.start as int) AS start",
            "__s.seg AS seg",
            "md5(__s.seg) AS __h",
        )
        .where("trim(seg) <> ''")
    ).transform(cached)
    dfreq = (
        seg_rows.select("__h", id_col)
        .distinct()
        .groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__df"))
    )
    agg = (
        seg_rows.join(dfreq, "__h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("__ns"),
            F.sum((F.col("__df") >= min_df).cast("int")).alias("__np"),
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("__df") < min_df,
                        F.struct(F.col("start"), F.col("seg")),
                    )
                )
            ).alias("__kept"),
        )
    )
    # one row per INPUT document: tokenless docs (no surviving
    # segments) come back with zero counts and empty clean_text
    return (
        df.select(bq(id_col))
        .join(agg, id_col, "left")
        .selectExpr(
            bq(id_col),
            "COALESCE(array_join(transform(__kept, s -> s.seg), ' '), '')"
            " AS clean_text",
            "cast(COALESCE(__ns, 0) as int) AS n_segments",
            "cast(COALESCE(__np, 0) as int) AS n_purged",
        )
    )


def perplexity_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_expr: str = "lang",
) -> DataFrame:
    """CCNet-style per-language perplexity bucketing (Wenzek et al.
    2020, §4.3: score every document with a language model, split each
    language's distribution into head / middle / tail terciles — the
    standard curriculum/quality partition for web-scale corpora).
    The LM is the corpus-fit bigram model of :func:`bigram_lm_score`;
    "head" is the best-scoring (least perplex) third.

    Rank WITHOUT a per-language global sort (the
    ``linear_probe_score`` discipline): documents group to
    (lang, score) — scores are 6-dp-rounded, so grouping is exact —
    and a window over that BOUNDED per-language score histogram
    assigns each distinct score its count of strictly-better docs;
    the only per-document window is row_number inside a
    (lang, score) tie group ordered by id. A hot language never
    becomes one sort partition: the heavy window keys are
    (lang, score) pairs.

    Bucket boundaries are pure integer comparisons
    (``(rank-1)*3 < n`` …), identical cross-engine. Output: doc_id,
    lang, avg_log2_prob, perplexity, lang_rank, bucket.
    """
    from pyspark import StorageLevel

    scored = bigram_lm_score(df, text_col, id_col)
    # j carries the whole bigram-LM pipeline and feeds BOTH the
    # (lang, score) histogram and the final rank join — persist so the
    # model fit runs once, not twice
    j = scored.join(
        df.selectExpr(bq(id_col), f"({lang_expr}) AS lang"), id_col
    ).transform(cached)
    g = j.groupBy("lang", "avg_log2_prob").agg(
        F.count(F.lit(1)).alias("__c")
    )
    wlang = Window.partitionBy("lang")
    wcum = (
        Window.partitionBy("lang")
        .orderBy(F.desc("avg_log2_prob"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = g.select(
        "lang",
        "avg_log2_prob",
        F.coalesce(F.sum("__c").over(wcum), F.lit(0)).alias("__better"),
        F.sum("__c").over(wlang).alias("__n"),
    )
    wtie = Window.partitionBy("lang", "avg_log2_prob").orderBy(id_col)
    # null-safe rejoin (round-10 ADVICE #2): a NULL lang is its own
    # language bucket and a NULL score (empty doc under a degenerate
    # model) ranks inside it — an equi-join would drop those docs from
    # the "one row per document" output
    jb, cb = j.alias("__pb_j"), cum.alias("__pb_c")
    return (
        jb.join(
            cb,
            F.col("__pb_j.lang").eqNullSafe(F.col("__pb_c.lang"))
            & F.col("__pb_j.avg_log2_prob").eqNullSafe(
                F.col("__pb_c.avg_log2_prob")
            ),
        )
        .select(
            F.col(f"__pb_j.{id_col}").alias(id_col),
            F.col("__pb_j.lang").alias("lang"),
            F.col("__pb_j.avg_log2_prob").alias("avg_log2_prob"),
            F.col("__pb_j.perplexity").alias("perplexity"),
            F.col("__pb_c.__better").alias("__better"),
            F.col("__pb_c.__n").alias("__n"),
        )
        .withColumn("__rn", F.row_number().over(wtie))
        .selectExpr(
            bq(id_col),
            "lang",
            "avg_log2_prob",
            "perplexity",
            "CAST(__better + __rn AS INT) AS lang_rank",
            "CASE WHEN (__better + __rn - 1) * 3 < __n THEN 'head' "
            "WHEN (__better + __rn - 1) * 3 < 2 * __n THEN 'middle' "
            "ELSE 'tail' END AS bucket",
        )
    )


def corpus_diversity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    sample_per_group: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Per-group corpus diversity as MEAN PAIRWISE JACCARD over a
    deterministic md5 sample (the self-BLEU-style redundancy signal:
    a source whose sampled documents overlap heavily is producing
    near-clones, a diverse one scores ~0). Unlike the dedup family —
    which only surfaces pairs ABOVE a threshold — the mean here must
    include the zero-overlap pairs, so the pair skeleton comes from a
    bounded ``sample_per_group``² self-join of SAMPLED ids per group
    and the shared-shingle counts left-join onto it.

    Scale shape: the md5-rank sample is one per-group window over
    (group, md5) — at most ``sample_per_group`` docs per group
    survive, so every later stage is bounded by groups·m² pairs and
    groups·m shingle sets, independent of corpus size; the only
    corpus-sized work is the scan + the sampling window.

    Jaccard per pair micro-quantizes via integer division
    (``shared·10⁶ div union`` — exact, identical cross-engine), so
    the group mean is one division of exact integers. Output: group,
    n_sampled, n_pairs, mean_jaccard.
    """
    from pyspark.sql import Window

    base = (
        df.selectExpr(
            f"{bq(id_col)} AS __id",
            f"{bq(group_col)} AS grp",
            f"md5(CAST({bq(id_col)} AS STRING)) AS __h",
            f"{bq(text_col)} AS __txt",
        )
        .withColumn("__toks", tokens("__txt"))
        # shingling needs >= n tokens; eligibility precedes sampling so
        # the sample is a deterministic function of the eligible set
        .filter(f"size(__toks) >= {shingle_n}")
    )
    w = Window.partitionBy("grp").orderBy("__h", "__id")
    sampled = (
        base.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= sample_per_group)
        .selectExpr(
            "grp", "__id", f"{shingle_hashes_expr('__toks', shingle_n)} AS __sh"
        )
        .selectExpr("grp", "__id", "__sh", "size(__sh) AS n_sh")
    )
    from pyspark import StorageLevel

    sampled = sampled.transform(cached)
    ids = sampled.select("grp", "__id", "n_sh")
    skel = (
        ids.selectExpr("grp", "__id AS id_a", "n_sh AS n_a")
        .join(ids.selectExpr("grp", "__id AS id_b", "n_sh AS n_b"), "grp")
        .filter("id_a < id_b")
    )
    ex = sampled.selectExpr("grp", "__id", "explode(__sh) AS h")
    shared = (
        ex.selectExpr("grp", "__id AS id_a", "h")
        .join(ex.selectExpr("grp", "__id AS id_b", "h"), ["grp", "h"])
        .filter("id_a < id_b")
        .groupBy("grp", "id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    jacc = (
        skel.join(shared, ["grp", "id_a", "id_b"], "left")
        .selectExpr(
            "grp",
            "COALESCE(shared, 0) AS sh",
            "n_a + n_b - COALESCE(shared, 0) AS un",
        )
        .selectExpr(
            "grp",
            "CASE WHEN un = 0 THEN 0 ELSE CAST(sh AS BIGINT) * 1000000"
            " div un END AS jm",
        )
    )
    return jacc.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.expr(
            "round(CAST(SUM(jm) AS DOUBLE) / count(1) / 1e6, 6)"
        ).alias("mean_jaccard"),
    ).join(
        sampled.groupBy("grp").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sampled")
        ),
        "grp",
    ).select("grp", "n_sampled", "n_pairs", "mean_jaccard")


def zipf_token_fit(
    df: DataFrame,
    text_col: str = "text",
    top_r: int = 1000,
) -> DataFrame:
    """Zipf's-law fit over the corpus token histogram: OLS of
    ln(frequency) on ln(rank) across the ``top_r`` most frequent
    tokens — the standard corpus-health profile (natural text slopes
    ≈ −1; templated/boilerplate corpora flatten, token-salad
    steepens).

    The regression is EXACT integer arithmetic until three final
    divisions: x = ln(rank) and y = ln(freq) micro-quantize to 1e-6
    BIGINTs (ln of an integer argument — both engines evaluate libm
    ln on identical inputs), the five OLS sums accumulate as
    DECIMAL(38,0) (nΣxy-grade products overflow int64 at r=1000;
    decimal128 keeps them exact and sum-order-free), and slope /
    intercept / r² are rounded from single divisions of those exact
    sums. The token histogram is one vocabulary-bounded aggregate;
    the top-r head is taken with ``orderBy().limit()`` — Catalyst
    plans it as TakeOrderedAndProject (per-partition top-k + merge,
    NEVER a global sort of a web-scale vocabulary) — and the rank
    window runs over those r rows only.

    Output: 1 row — n_tokens_ranked, slope, intercept, r2.
    """
    from pyspark.sql import Window

    hist = (
        df.withColumn("__t", F.explode(tokens(text_col)))
        .filter("__t <> ''")
        .groupBy("__t")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    top = hist.orderBy(F.desc("freq"), F.asc("__t")).limit(int(top_r))
    w = Window.orderBy(F.desc("freq"), F.asc("__t"))
    head = (
        top.withColumn("rank", F.row_number().over(w))
        .selectExpr(
            "CAST(round(ln(rank) * 1e6, 0) AS DECIMAL(38,0)) AS x",
            "CAST(round(ln(freq) * 1e6, 0) AS DECIMAL(38,0)) AS y",
        )
    )
    sums = head.agg(
        F.expr("CAST(count(1) AS DECIMAL(38,0)) AS n"),
        F.expr("CAST(SUM(x) AS DECIMAL(38,0)) AS sx"),
        F.expr("CAST(SUM(y) AS DECIMAL(38,0)) AS sy"),
        F.expr("CAST(SUM(x*x) AS DECIMAL(38,0)) AS sxx"),
        F.expr("CAST(SUM(y*y) AS DECIMAL(38,0)) AS syy"),
        F.expr("CAST(SUM(x*y) AS DECIMAL(38,0)) AS sxy"),
    )
    return sums.selectExpr(
        "CAST(n AS BIGINT) AS n_tokens_ranked",
        # slope = (nΣxy − ΣxΣy) / (nΣxx − Σx²); micro scaling cancels
        "round(CAST(n*sxy - sx*sy AS DOUBLE)"
        " / CAST(n*sxx - sx*sx AS DOUBLE), 6) AS slope",
        # intercept = (Σy − slope·Σx)/n, in ln units (y was ×1e6)
        "round((CAST(sy AS DOUBLE) - CAST(n*sxy - sx*sy AS DOUBLE)"
        " / CAST(n*sxx - sx*sx AS DOUBLE) * CAST(sx AS DOUBLE))"
        " / CAST(n AS DOUBLE) / 1e6, 6) AS intercept",
        "round(POWER(CAST(n*sxy - sx*sy AS DOUBLE), 2)"
        " / (CAST(n*sxx - sx*sx AS DOUBLE)"
        " * CAST(n*syy - sy*sy AS DOUBLE)), 6) AS r2",
    )


def boilerplate_purge_incremental(
    old_docs: DataFrame,
    new_docs: DataFrame,
    old_result: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    segment_tokens: int = 8,
    min_df: int = 2,
) -> DataFrame:
    """Append-only incremental :func:`boilerplate_purge`: when a batch
    of new documents arrives, doc frequencies only ever INCREASE, so a
    segment's verdict can flip exactly one way (clean → boilerplate).
    Only three slices need work: (1) the new batch itself, (2) old
    documents containing a digest whose df CROSSED ``min_df`` because
    of the batch, (3) everything else keeps its standing ``old_result``
    row untouched — at scale that is the entire corpus minus a sliver,
    and the reassembly regroup (the operator's heavy stage) never
    re-runs for it.

    The standing state a production pipeline would persist is
    (digest → df) plus the per-doc results; here ``old_result``
    defaults to recomputing :func:`boilerplate_purge` over
    ``old_docs`` so the equality contract is self-contained. Output
    is bit-identical to the full recompute over old ∪ new (the
    ``ivf_incremental`` / ``knn_incremental`` proof discipline —
    the registered oracle IS the full-run SQL).
    

    Eager note: BUILDING this plan launches Spark jobs — internal
    persist + count() barriers materialize shared subtrees race-free
    at construction time (r14 ADVICE; the caches are plan-keyed and
    ledger-bounded, functions/cachereg.py).
    """
    if min_df < 2:
        raise ValueError(f"min_df must be >= 2, got {min_df}")
    if old_result is None:
        old_result = boilerplate_purge(
            old_docs, text_col, id_col, segment_tokens, min_df
        )
    toks = "__toks"
    segs = (
        f"transform(sequence(0, greatest(size({toks}) - 1, 0),"
        f" {segment_tokens}), s -> named_struct('start', s, 'seg',"
        f" array_join(slice({toks}, s + 1, {segment_tokens}), ' ')))"
    )

    def seg_rows(df: DataFrame) -> DataFrame:
        # seg <> '' mirrors boilerplate_purge: tokenless docs emit no
        # segments (they are restored with zero counts below)
        return (
            df.withColumn(toks, tokens(text_col))
            .selectExpr(bq(id_col), f"explode({segs}) AS __s")
            .selectExpr(
                bq(id_col),
                "cast(__s.start as int) AS start",
                "__s.seg AS seg",
                "md5(__s.seg) AS __h",
            )
            .where("trim(seg) <> ''")
        )

    from pyspark import StorageLevel

    # old_rows feeds the df table, the affected-doc probe and the redo
    # slice; new_rows feeds its df table and the redo union — persist
    # + count barriers (r14): concurrently submitted consumer stages
    # race a cold lazy persist and re-ran the tokenize+segment explode
    # ~3× per pass (profiled: four near-identical 1.2 MB map stages)
    old_rows = seg_rows(old_docs).transform(cached)
    old_rows.count()
    new_rows = seg_rows(new_docs).transform(cached)
    new_rows.count()
    df_old = (
        old_rows.select("__h", id_col)
        .distinct()
        .groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__dfo"))
    )
    df_new = (
        new_rows.select("__h", id_col)
        .distinct()
        .groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__dfn"))
    )
    merged = df_old.join(df_new, "__h", "outer").selectExpr(
        "__h",
        "COALESCE(__dfo, 0) AS __dfo",
        "COALESCE(__dfo, 0) + COALESCE(__dfn, 0) AS __df",
    )
    # digests whose verdict flipped: clean under the old corpus,
    # boilerplate under old+new — the only ones that can change an
    # OLD document's row
    flipped = merged.filter(
        f"__dfo < {min_df} AND __df >= {min_df}"
    ).select("__h")
    affected_old = (
        old_rows.join(flipped, "__h", "left_semi")
        .select(id_col)
        .distinct()
    )
    redo_rows = old_rows.join(
        affected_old, id_col, "left_semi"
    ).unionByName(new_rows)
    redone_agg = (
        redo_rows.join(merged.select("__h", "__df"), "__h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("__ns"),
            F.sum((F.col("__df") >= min_df).cast("int")).alias("__np"),
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("__df") < min_df,
                        F.struct(F.col("start"), F.col("seg")),
                    )
                )
            ).alias("__kept"),
        )
    )
    # one row per redo doc — a tokenless NEW doc has no segment rows
    # but still owes its zero-count output row (affected_old ids all
    # have segments by construction: they matched a flipped digest)
    redo_ids = new_docs.select(bq(id_col)).unionByName(affected_old)
    redone = (
        redo_ids.join(redone_agg, id_col, "left")
        .selectExpr(
            bq(id_col),
            "COALESCE(array_join(transform(__kept, s -> s.seg), ' '), '')"
            " AS clean_text",
            "cast(COALESCE(__ns, 0) as int) AS n_segments",
            "cast(COALESCE(__np, 0) as int) AS n_purged",
        )
    )
    untouched = old_result.join(affected_old, id_col, "left_anti")
    return untouched.unionByName(redone)


def tokenizer_fertility(
    df: DataFrame,
    text_col: str = "text",
    lang_expr: str = "lang",
) -> DataFrame:
    """Per-language tokenizer fertility — BPE-grain tokens per
    whitespace word (the standard multilingual tokenizer-efficiency
    audit: a language whose fertility is 2× another's pays 2× the
    context budget for the same content, the signal behind
    vocabulary-rebalancing decisions). Also reports the
    chars-per-token compression ratio at the language grain.

    One scan computes per-doc word / BPE-token / char counts with the
    shared :data:`BPE_PRETOKEN_RE` pretokenizer (pure
    ``regexp_extract_all`` — no UDF), then ONE language-keyed hash
    aggregate of exact BIGINT sums; both ratios are single divisions
    of those exact integers, rounded to 6.

    Output: lang, n_docs, n_words, n_bpe_tokens, fertility,
    chars_per_token.
    """
    pat = BPE_PRETOKEN_RE.replace("'", chr(92) + "'")
    toks = f"regexp_extract_all({bq(text_col)}, '{pat}', 0)"
    nonws = f"filter({toks}, t -> trim(t) != '')"
    words = f"filter(split(lower({bq(text_col)}), '\\\\s+'), t -> t != '')"
    per_doc = df.selectExpr(
        f"({lang_expr}) AS lang",
        f"cast(size({words}) as bigint) AS __w",
        f"cast(size({nonws}) as bigint) AS __b",
        f"cast(length({bq(text_col)}) as bigint) AS __c",
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("__w").cast("bigint").alias("n_words"),
        F.sum("__b").cast("bigint").alias("n_bpe_tokens"),
        F.expr(
            "round(CASE WHEN CAST(SUM(__b) AS BIGINT) > 0 AND"
            " CAST(SUM(__w) AS BIGINT) > 0 THEN"
            " CAST(CAST(SUM(__b) AS BIGINT) AS DOUBLE)"
            " / CAST(SUM(__w) AS BIGINT) END, 6) AS fertility"
        ),
        F.expr(
            "round(CASE WHEN CAST(SUM(__b) AS BIGINT) > 0 THEN"
            " CAST(CAST(SUM(__c) AS BIGINT) AS DOUBLE)"
            " / CAST(SUM(__b) AS BIGINT) END, 6) AS chars_per_token"
        ),
    )


def heaps_law_fit(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    checkpoints: int = 16,
) -> DataFrame:
    """Heaps'-law fit of vocabulary growth — V(N) = k·N^β over corpus
    prefixes in ``id_col`` order (Heaps 1978; natural text sits around
    β ≈ 0.4-0.6: a flat curve means the corpus stopped contributing
    new vocabulary — the diminishing-returns signal for data
    acquisition; a steep one means token-salad/noise).

    Prefixes are ``checkpoints`` equal-width id slices (pure integer
    bucket arithmetic off one (min, max) aggregate — no global sort,
    no row_number over the corpus). One token-stream pass feeds BOTH
    curves: cumulative token count N_c per checkpoint, and vocabulary
    V_c as the rollup of each token's FIRST checkpoint (a
    vocabulary-bounded min aggregate — the "when was this word first
    seen" relation). The OLS of ln V on ln N follows the
    ``zipf_token_fit`` discipline exactly: ln of integer args
    micro-quantized to BIGINT, DECIMAL(38,0) sums, single final
    divisions.

    Output: 1 row — n_points, beta (slope), ln_k (intercept, ln
    units), r2, tokens_total, vocab_total.
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    c = int(checkpoints)
    mm = df.agg(
        F.min(id_col).alias("__mn"), F.max(id_col).alias("__mx")
    )
    stream = (
        df.crossJoin(F.broadcast(mm))
        .withColumn("__t", F.explode(tokens(text_col)))
        .filter("__t <> ''")
        .selectExpr(
            f"CAST(((`{id_col}` - __mn) * {c}) div (__mx - __mn + 1)"
            " AS INT) + 1 AS c",
            "__t",
        )
        .transform(cached)
    )
    per_c = stream.groupBy("c").agg(F.count(F.lit(1)).alias("__nt"))
    news = (
        stream.groupBy("__t")
        .agg(F.min("c").alias("c"))
        .groupBy("c")
        .agg(F.count(F.lit(1)).alias("__nv"))
    )
    w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    pts = (
        per_c.join(news, "c", "full_outer")
        .select(
            "c",
            F.sum(F.coalesce("__nt", F.lit(0))).over(w).alias("n_cum"),
            F.sum(F.coalesce("__nv", F.lit(0))).over(w).alias("v_cum"),
        )
        .filter("n_cum > 0 AND v_cum > 0")
        .selectExpr(
            "CAST(round(ln(n_cum) * 1e6, 0) AS DECIMAL(38,0)) AS x",
            "CAST(round(ln(v_cum) * 1e6, 0) AS DECIMAL(38,0)) AS y",
            "n_cum",
            "v_cum",
        )
    )
    sums = pts.agg(
        F.expr("CAST(count(1) AS DECIMAL(38,0)) AS n"),
        F.expr("CAST(SUM(x) AS DECIMAL(38,0)) AS sx"),
        F.expr("CAST(SUM(y) AS DECIMAL(38,0)) AS sy"),
        F.expr("CAST(SUM(x*x) AS DECIMAL(38,0)) AS sxx"),
        F.expr("CAST(SUM(y*y) AS DECIMAL(38,0)) AS syy"),
        F.expr("CAST(SUM(x*y) AS DECIMAL(38,0)) AS sxy"),
        F.expr("CAST(MAX(n_cum) AS BIGINT) AS tokens_total"),
        F.expr("CAST(MAX(v_cum) AS BIGINT) AS vocab_total"),
    )
    return sums.selectExpr(
        "CAST(n AS BIGINT) AS n_points",
        "round(CAST(n*sxy - sx*sy AS DOUBLE)"
        " / CAST(n*sxx - sx*sx AS DOUBLE), 6) AS beta",
        "round((CAST(sy AS DOUBLE) - CAST(n*sxy - sx*sy AS DOUBLE)"
        " / CAST(n*sxx - sx*sx AS DOUBLE) * CAST(sx AS DOUBLE))"
        " / CAST(n AS DOUBLE) / 1e6, 6) AS ln_k",
        "round(POWER(CAST(n*sxy - sx*sy AS DOUBLE), 2)"
        " / (CAST(n*sxx - sx*sx AS DOUBLE)"
        "    * CAST(n*syy - sy*sy AS DOUBLE)), 6) AS r2",
        "tokens_total",
        "vocab_total",
    )


def ngram_kl_divergence(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-group token-distribution divergence: KL(P_group ||
    P_corpus) in bits, add-one smoothed over the corpus vocabulary —
    the token-level domain-shift audit (psi_drift is feature-level;
    this ranks which SOURCES' language differs most from the mixture,
    the signal behind per-domain LM-filter thresholds à la CCNet).

    Exactness at scale (the distributed-float-sum problem): the sum
    over the vocabulary is decomposed into (a) PRESENT words — each
    per-word term is one fixed-shape double expression, micro-
    quantized to a 1e-12-grain BIGINT and summed EXACTLY — and (b)
    the ABSENT remainder, which collapses in closed form to scalar
    arithmetic over three exact integers (global log-count sum T,
    the group's present log-count sum S2, and the absent word count
    V − Vs): Σ_absent = a·(V−Vs)·log2((Ng+V)/(Ns+V)) − a·(T−S2),
    a = 1/(Ns+V). No vocabulary-order-dependent float accumulation
    survives; the oracle mirrors every expression token for token.

    Plan: one corpus tokenize pass → (group, word) counts; everything
    after is vocabulary-bounded (global rollup FROM the group counts,
    never a second stream pass — the ``bigram_lm_score`` trick).

    Output: one row per group — grp, n_tokens, vocab_present,
    kl_bits (6 dp).
    """
    from pyspark import StorageLevel

    sw = (
        df.selectExpr(f"({group_col}) AS s", f"lower(`{text_col}`) AS __x")
        .withColumn("w", F.explode(F.split(F.col("__x"), r"\s+")))
        .filter("w <> ''")
        .groupBy("s", "w")
        .agg(F.count(F.lit(1)).alias("cs"))
        .transform(cached)
    )
    g = sw.groupBy("w").agg(F.sum("cs").alias("cg"))
    gs = g.agg(
        F.expr("CAST(SUM(cg) AS BIGINT) AS ng"),
        F.expr("CAST(count(1) AS BIGINT) AS v"),
        F.expr(
            "CAST(SUM(CAST(round(log2(cg + 1) * 1e6, 0) AS BIGINT))"
            " AS BIGINT) AS t6"
        ),
    )
    ss = sw.groupBy("s").agg(
        F.expr("CAST(SUM(cs) AS BIGINT) AS ns"),
        F.expr("CAST(count(1) AS BIGINT) AS vs"),
    )
    term = (
        "(CAST(cs + 1 AS DOUBLE) / CAST(ns + v AS DOUBLE))"
        " * log2((CAST(cs + 1 AS DOUBLE) / CAST(ns + v AS DOUBLE))"
        " / (CAST(cg + 1 AS DOUBLE) / CAST(ng + v AS DOUBLE)))"
    )
    present = (
        sw.join(g, "w")
        .join(F.broadcast(ss), "s")
        .crossJoin(F.broadcast(gs))
        .selectExpr(
            "s",
            f"CAST(round(({term}) * 1e12, 0) AS BIGINT) AS __t12",
            "CAST(round(log2(cg + 1) * 1e6, 0) AS BIGINT) AS __l6",
        )
        .groupBy("s")
        .agg(
            F.expr("CAST(SUM(__t12) AS BIGINT) AS s1"),
            F.expr("CAST(SUM(__l6) AS BIGINT) AS s2"),
        )
    )
    kl = (
        "round(CAST(s1 AS DOUBLE) / 1e12"
        " + (CAST(v - vs AS DOUBLE) / CAST(ns + v AS DOUBLE))"
        "   * log2(CAST(ng + v AS DOUBLE) / CAST(ns + v AS DOUBLE))"
        " - (CAST(t6 - s2 AS DOUBLE) / 1e6) / CAST(ns + v AS DOUBLE)"
        ", 6)"
    )
    return (
        ss.join(present, "s")
        .crossJoin(F.broadcast(gs))
        .selectExpr(
            "s AS grp",
            "ns AS n_tokens",
            "vs AS vocab_present",
            f"{kl} AS kl_bits",
        )
    )


def quality_c4(df: DataFrame, text_col: str = "text") -> DataFrame:
    """C4-style heuristic cleaning signals (Raffel et al. 2020 §2.2),
    the other canonical rule set next to :func:`gopher_quality`: C4
    keeps sentences that end in terminal punctuation and have enough
    words, and drops whole documents containing boilerplate markers
    (``lorem ipsum``, curly braces from leaked code/templates,
    ``javascript`` warnings).

    Sentence grain here is the terminal-punctuation split (``.!?``),
    matching C4's "line" rule for plain-text corpora without
    newlines. All signals are one projection over the tokenizer — no
    shuffle, no UDF; the verdict rule mirrors C4: ≥ ``min_sentences``
    qualifying sentences (≥ ``min_words_per_sentence`` words, ends in
    terminal punctuation in the ORIGINAL text), no marker hits.

    Output: id cols passthrough + n_sentences, n_kept_sentences,
    n_words, has_lorem, has_brace, has_js, keep.
    """
    # a sentence "ends in terminal punctuation" iff the regex match
    # INCLUDES the terminator — regexp_extract_all('[^.!?]+[.!?]')
    # yields exactly the qualifying candidates (the unterminated tail
    # fragment never matches); n_sentences counts every non-empty
    # piece either way. Identical regex semantics on DuckDB (RE2) and
    # Spark (java.util.regex) for this pattern class.
    terminated = f"regexp_extract_all(`{text_col}`, '[^.!?]+[.!?]', 0)"
    return df.selectExpr(
        "*",
        f"CAST(size(filter(transform(split(`{text_col}`, '[.!?]'),"
        " s -> trim(s)), s -> s <> '')) AS BIGINT) AS n_sentences",
        f"CAST(size(filter({terminated},"
        " s -> size(split(trim(s), '\\\\s+')) >= 3))"
        " AS BIGINT) AS n_kept_sentences",
        f"CAST(size(split(trim(`{text_col}`), '\\\\s+')) AS BIGINT)"
        " AS n_words",
        f"contains(lower(`{text_col}`), 'lorem ipsum') AS has_lorem",
        f"contains(`{text_col}`, '{{') AS has_brace",
        f"contains(lower(`{text_col}`), 'javascript') AS has_js",
    ).selectExpr(
        "*",
        "(n_kept_sentences >= 3 AND NOT has_lorem AND NOT has_brace"
        " AND NOT has_js) AS keep",
    )


def ccnet_perplexity_bucket(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al., LREC 2020 —
    the web-corpus curation recipe behind CCNet/LLaMA data: score
    every document with a corpus-fit LM and split the corpus into
    head/middle/tail perplexity TERCILES; downstream mixtures then
    sample head-heavy): composes :func:`bigram_lm_score` and assigns
    each scored document its tercile by THRESHOLD, the way CCNet
    applies its cutoffs.

    The tercile cuts are exact order statistics of the (rounded)
    perplexity distribution computed WITHOUT a global sort: one
    value-distinct aggregate, a cumulative count over the distinct
    values (a relation bounded by value cardinality, not corpus
    rows), and the two cut values are the smallest perplexities whose
    cumulative count reaches ⌈n/3⌉ and ⌈2n/3⌉ (pure integer
    predicates — ``3·cum ≥ n``); assignment is then a broadcast
    scalar compare, map-side. Ties at a cut share a bucket by value —
    threshold semantics, deterministic cross-engine.

    Documents with <2 tokens have no bigram and inherit the LM's
    exclusion (documented there). Output: id, n_bigrams, perplexity,
    ppl_bucket ('head' < cut1 ≤ 'middle' ≤ cut2 < 'tail').
    

    Eager note: BUILDING this plan launches Spark jobs — internal
    persist + count() barriers materialize shared subtrees race-free
    at construction time (r14 ADVICE; the caches are plan-keyed and
    ledger-bounded, functions/cachereg.py).
    """
    from pyspark import StorageLevel

    # r14: the scored relation (a multi-join LM subtree) feeds the
    # distribution aggregate AND the final assignment — persist +
    # count barrier so the LM runs once (profiled: six duplicate
    # map stages per pass without it); the corpus total derives from
    # the value-distinct distribution (Σ __c == count(scored)), which
    # drops the third scored consumer outright (guide §1.2, §2.4)
    scored = bigram_lm_score(df, text_col, id_col).transform(cached)
    scored.count()
    dist = scored.groupBy("perplexity").agg(
        F.count(F.lit(1)).alias("__c")
    )
    wc = (
        Window.orderBy("perplexity")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = dist.withColumn("__cum", F.sum("__c").over(wc))
    tot = dist.agg(F.expr("CAST(coalesce(SUM(__c), 0) AS BIGINT) AS __n"))
    cuts = (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.expr(
                "min(CASE WHEN __cum * 3 >= __n THEN perplexity END)"
                " AS __v1"
            ),
            F.expr(
                "min(CASE WHEN __cum * 3 >= 2 * __n THEN perplexity"
                " END) AS __v2"
            ),
        )
    )
    return (
        scored.crossJoin(F.broadcast(cuts))
        .selectExpr(
            id_col,
            "n_bigrams",
            "perplexity",
            "CASE WHEN perplexity <= __v1 THEN 'head'"
            " WHEN perplexity <= __v2 THEN 'middle'"
            " ELSE 'tail' END AS ppl_bucket",
        )
    )
