"""Operators: table-level transformations (SURVEY.md §2).

Flat re-exports so ``from anofox_forecast_spark.operators import
ts_forecast_by`` works for every public operator, mirroring the reference's
single SQL namespace (each macro there also carries an ``anofox_fcst_``
alias — in Python the module path serves that role).
"""

from .conformal import (  # noqa: F401
    ts_adaptive_conformal_by,
    ts_bootstrap_intervals_by,
    ts_conformal_apply_by,
    ts_conformal_apply_profile,
    ts_conformal_by,
    ts_conformal_calibrate,
    ts_conformal_coverage_by,
    ts_conformal_evaluate,
    ts_conformal_intervals,
    ts_conformal_learn_by,
    ts_conformal_per_step_by,
    ts_conformal_quantile,
    ts_interval_width_by,
    ts_winkler_score,
)
from .cv import (  # noqa: F401
    ts_backtest_auto_by,
    ts_cv_folds_by,
    ts_cv_forecast_by,
    ts_cv_hydrate_by,
    ts_cv_split_by,
    ts_cv_split_folds_by,
    ts_cv_split_index_by,
    ts_estimate_backtest_memory,
)
from .dedup import (  # noqa: F401
    dedup_exact,
    exact_dedup_keep_best,
    embedding_cosine_pairs,
    embedding_cosine_pairs_exact,
    exact_dup_groups,
    minhash_lsh_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from .detect import (  # noqa: F401
    ts_analyze_peak_timing_by,
    ts_detect_anomalies_by,
    ts_detect_anomalies_online_by,
    ts_analyze_seasonality_by,
    ts_classify_seasonality_by,
    ts_decompose_seasonal_by,
    ts_detect_amplitude_modulation_by,
    ts_detect_changepoints_by,
    ts_detect_peaks_by,
    ts_detect_periods_by,
    ts_detect_seasonality_changes_by,
    ts_detrend_by,
    ts_instantaneous_period_by,
    ts_mstl_decomposition_by,
    ts_seasonal_strength_by,
    ts_seasonal_strength_windowed_by,
)
from .features import (  # noqa: F401
    ts_features_by,
    ts_features_list,
    ts_features_table,
)
from .forecast import (  # noqa: F401
    ts_forecast,
    ts_forecast_agg,
    ts_forecast_by,
)
from .forecast_ext import (  # noqa: F401
    ts_forecast_exog,
    ts_forecast_exog_by,
    ts_forecast_explain_by,
    ts_forecast_inspect_by,
)
from .hierarchy import (  # noqa: F401
    ts_aggregate_hierarchy,
    ts_combine_keys,
    ts_split_keys,
    ts_validate_separator,
)
from .events import (  # noqa: F401
    asof_join,
    event_transitions,
    funnel,
    interval_overlap_join,
    range_join_points,
    retention,
    session_stats,
    sessionize,
    time_rollup,
)
from .pipeline import (  # noqa: F401
    build_vocab,
    c4_stats,
    chunk_text,
    decontaminate_ngrams,
    decontaminate_ngrams_bloom,
    dedup_lines,
    dsir_weights,
    dup_span_stats,
    dup_spans,
    gopher_stats,
    lm_score,
    mix_sources,
    pack_chunked,
    remove_dup_spans,
    sample_by_hash,
    sample_stratified,
    sample_weighted,
    temperature_weights,
    token_budget_filter,
)
from .regression import (  # noqa: F401
    ols_fit_predict_by,
)
from .search import (  # noqa: F401
    bm25_score,
    bm25_topk,
    tfidf_top_terms,
    top_terms,
)
from .prep import (  # noqa: F401
    ts_check_leakage,
    ts_diff_by,
    ts_drop_constant_by,
    ts_drop_edge_zeros_by,
    ts_drop_gappy_by,
    ts_drop_leading_zeros_by,
    ts_drop_short_by,
    ts_drop_trailing_zeros_by,
    ts_drop_zeros_by,
    ts_fill_forward_by,
    ts_fill_gaps_by,
    ts_fill_nulls_backward_by,
    ts_fill_nulls_const_by,
    ts_fill_nulls_forward_by,
    ts_fill_nulls_mean_by,
    ts_fill_unknown_by,
    ts_interpolate_by,
    ts_mark_unknown_by,
    ts_scale_by,
    ts_unscale_by,
    ts_validate_timestamps_by,
    ts_validate_timestamps_summary_by,
    ts_winsorize_by,
)
from .similarity import (  # noqa: F401
    cosine_topk,
    cosine_topk_ivf,
    ivf_build,
    ivf_search,
    knn_join_lsh,
    semdedup,
    semdedup_pairs,
)
from .stats import (  # noqa: F401
    bloom_contains,
    bottomk_sample,
    bloom_merge_registers,
    bloom_registers,
    bloom_stats,
    cm_collapse_emissions,
    cm_estimate,
    cm_merge_registers,
    cm_registers,
    group_quantiles,
    hll_count_distinct,
    hll_estimate_from_registers,
    hll_merge_registers,
    hll_registers,
    salted_join,
    sampled_quantiles,
    skew_report,
    ts_data_quality,
    ts_data_quality_by,
    ts_data_quality_summary,
    ts_quality_report,
    ts_stats,
    ts_stats_by,
    ts_stats_summary,
)
from .text import (  # noqa: F401
    language_id,
    pii_redact,
    text_analysis,
    text_fingerprint,
    text_quality,
    text_token_counts,
)
