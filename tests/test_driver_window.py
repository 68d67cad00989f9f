"""Policy invariants for the driver correctness window rotation.

docs/DRIVER_WINDOW.md documents the policy; these tests enforce it so a
future edit can't silently re-stamp already-certified queries or slip a
non-SQL entry into the hashed window.
"""

from thor_ray.queries import QUERIES, driver_window, oracle_sql

# Every SQL twin stamped by a PRIOR round's driver (the union of
# CORRECTNESS_r01..r04 green rows). The r5 window must be disjoint.
R4_STAMPED = {
    "q100_dense_rank", "q109_pivot", "q110_grouping_sets",
    "q112_percentile_disc", "q115_skew_kurt", "q118_join_chain",
    "q120_ratio_to_report", "q124_levenshtein", "q136_multikey_join",
    "q142_islands", "q143_interval_concurrency", "q149_span_dedup",
    "q151_span_strip", "q154_inverted_search", "q165_rolling_median",
    "q170_forward_window", "q188_regr", "q190_triangles", "q203_locf",
    "q215_not_in_null", "q217_relational_division", "q218_band_self_join",
    "q272_bm25", "q279_spearman", "q287_fisher_exact",
    "q291_connected_components", "q292_logistic_irls", "q295_jw_fuzzy_join",
    "q297_naive_bayes", "q299_anova_f", "q304_envelope_roundtrip",
    "q317_wasserstein", "q362_cheapest_per_type", "q363_value_share_parts",
    "q364_supplier_counts_not_in", "q365_exists_not_exists",
    "q366_rich_inactive_customers", "q367_bulk_suppliers",
    "q368_asym_window", "q369_union_distinct", "q370_string_agg_distinct",
    "q371_quarter_having", "q396_epoch_shuffle", "q64_rollup",
    "q70_unpivot", "q72_range_join", "q73_percentile_cont", "q94_ntile",
    "q96_percent_rank", "q97_cube",
}

PRIOR_STAMPED = R4_STAMPED | {
    "q01_pricing_summary", "q02_filter_project", "q03_join_orders_customer",
    "q04_broadcast_dims", "q05_left_join_count", "q06_semi_join",
    "q07_anti_join", "q08_global_agg", "q09_count_distinct",
    "q10_topk_orders", "q11_sort_limit", "q12_union_all", "q13_intersect",
    "q14_except", "q15_exact_dedup", "q16_string_fns", "q17_date_parts",
    "q18_json_extract", "q19_window_tumbling", "q20_sessions",
    "q21_mask_case", "q22_cast", "q23_top1_per_group", "q24_partial_agg",
    "q25_asof_join", "q26_minmax_group", "q27_distinct_pairs",
    "q28_token_count", "q29_lang_stats", "q30_md5_fingerprint",
    "q31_ann_brute", "q32_sessionize", "q33_bpe_tokens",
    "q35_hopping_window", "q36_full_outer", "q38_group_median",
    "q39_auto_join", "q44_quality_score", "q45_langid",
    "q51_hoist_flatten", "q52_regex_router", "q53_timestamp_router",
    "q68_tfidf", "q69_stratified_sample", "q76_bloom_semi",
    "q77_salted_join", "q83_decontam", "q91_train_split",
    "q107_asof_forward", "q114_asof_tolerance", "q117_except_all",
    "q127_math_fns", "q141_paragraph_dedup", "q148_scd2",
    "q152_token_ids", "q153_pagerank", "q155_zorder_range",
    "q159_right_outer", "q164_union_align", "q166_vector_norm",
    "q395_wire_roundtrip",
}


def test_window_is_50_unique():
    w = driver_window()
    assert len(w) == 50
    assert len(set(w)) == 50


def test_window_entries_all_sql_twinned():
    sql = oracle_sql()
    missing = [q for q in driver_window() if q not in sql]
    assert not missing, f"window entries without SQL twin: {missing}"


def test_window_disjoint_from_prior_rounds():
    overlap = set(driver_window()) & PRIOR_STAMPED
    assert not overlap, (
        f"rotation policy violated — already-stamped entries back in "
        f"the window: {sorted(overlap)}"
    )
    assert len(PRIOR_STAMPED) == 111  # 61 from r1-r3 + 50 from r4


def test_window_occupies_registry_front():
    """The driver hashes the first 50 SQL-checked entries in registry
    order; the window must therefore be exactly that prefix."""
    first_50_sql = [name for name, (_, sql) in QUERIES.items()
                    if sql is not None][:50]
    assert first_50_sql == driver_window()


def test_rotation_does_not_alter_values():
    """Reordering must not drop or duplicate registry entries."""
    names = list(QUERIES)
    assert len(names) == len(set(names))
    assert len(names) == 401  # 400 queries + cdc_replay
