"""Policy invariants for the driver correctness window rotation.

docs/DRIVER_WINDOW.md documents the policy; these tests enforce it so a
future edit can't silently re-stamp already-certified queries or slip a
non-SQL entry into the hashed window.
"""

from thor_ray.queries import QUERIES, driver_window, oracle_sql

# Every SQL twin stamped by a PRIOR round's driver (r1-r3: the union of
# CORRECTNESS_r01/r02/r03 green rows). The r4 window must be disjoint.
PRIOR_STAMPED = {
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
    assert len(names) == 400  # 399 queries + cdc_replay
