from institutional_fx_etl_spark.operators.asof import (
    asof_join,
    asof_join_nearest,
    asof_join_tolerance,
)
from institutional_fx_etl_spark.operators.clean import validate_and_clean
from institutional_fx_etl_spark.operators.consensus import consensus_filter
from institutional_fx_etl_spark.operators.dedup import (
    dedup_clusters,
    exact_dedup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_near_pairs,
)
from institutional_fx_etl_spark.operators.densify import (
    densify_gaps_explode,
    densify_grid,
)
from institutional_fx_etl_spark.operators.multimodal import (
    attach_binary_payload,
    decode_features,
    frame_sample,
)
from institutional_fx_etl_spark.operators.ohlc import ticks_to_candles
from institutional_fx_etl_spark.operators.similarity import (
    cosine_topk,
    emb_quantize_int8,
    embedding_near_dup_pairs,
    ivf_topk,
    knn_join,
    lsh_ann_pairs,
)
from institutional_fx_etl_spark.operators.spread import (
    repair_spread,
    repair_spread_windowed,
)
from institutional_fx_etl_spark.operators.text import (
    fingerprint,
    inverted_index,
    kneser_ney_bigram,
    lang_id,
    ngram_overlap_contamination,
    quality_score,
    segment_dedup,
    with_text_stats,
)
from institutional_fx_etl_spark.operators.profiling import (
    profile_columns,
    welch_ttest,
)
from institutional_fx_etl_spark.operators.selection import (
    pareto_skyline_2d,
)
from institutional_fx_etl_spark.operators.timeseries import (
    autocorr_exact,
    mad_robust,
    max_drawdown,
    minmax_normalize,
    psi_drift,
    realized_volatility,
    rsi_cutler,
    vwap,
    winsorize,
)

__all__ = [
    "asof_join",
    "asof_join_nearest",
    "asof_join_tolerance",
    "kneser_ney_bigram",
    "ngram_overlap_contamination",
    "pareto_skyline_2d",
    "welch_ttest",
    "validate_and_clean",
    "consensus_filter",
    "dedup_clusters",
    "exact_dedup_groups",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_fingerprints",
    "simhash_near_pairs",
    "densify_gaps_explode",
    "densify_grid",
    "attach_binary_payload",
    "decode_features",
    "frame_sample",
    "ticks_to_candles",
    "cosine_topk",
    "embedding_near_dup_pairs",
    "emb_quantize_int8",
    "ivf_topk",
    "knn_join",
    "lsh_ann_pairs",
    "repair_spread",
    "repair_spread_windowed",
    "fingerprint",
    "inverted_index",
    "lang_id",
    "quality_score",
    "segment_dedup",
    "with_text_stats",
    "autocorr_exact",
    "mad_robust",
    "max_drawdown",
    "minmax_normalize",
    "profile_columns",
    "psi_drift",
    "realized_volatility",
    "rsi_cutler",
    "vwap",
    "winsorize",
]
