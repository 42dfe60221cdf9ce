"""Digest bundles: driver-slot consolidation for the correctness gate.

The round-1 driver checked exactly the first 50 ``queries()`` entries
(CORRECTNESS_r01.json), leaving 42 of 92 catalog queries unverified.
Rather than drop coverage, cheap single-operator queries are *bundled*:
each bundle runs every member query and reduces it to one row of

    (part: string, n_rows: bigint, digest: bigint)

where ``digest`` is the order-insensitive sum of a 40-bit portable
row hash (first 15 hex chars of md5 over a canonical serialization,
masked so a 64-bit sum cannot overflow). The DuckDB oracle replays the
identical serialization + hash over the member's oracle SQL, so a
single flipped value anywhere in any member's full result set flips
the bundle digest — the verification strength of the per-query hash
check is preserved while 55 queries occupy 11 driver slots.

Canonical serialization (identical on both engines, columns sorted by
name, chr(31) separator, chr(30) NULL sentinel):

- doubles  -> ``cast(x * 1e6 as bigint)`` (truncation toward zero).
  Both engines run the same IEEE multiply on bit-identical inputs, so
  the result is deterministic; values are bounded well inside the
  long range at every test SF (checked in tests/test_digests.py).
- everything else (string/int/bigint/boolean) -> plain varchar cast.

The member queries themselves remain registered in ``CATALOG`` (the
per-part parity test still compares each against its own oracle); only
the public ``catalog_queries()`` / ``catalog_oracles()`` view folds
them into bundles.

Scale note: a bundle is a UNION ALL of independent single-row
aggregates — each member keeps its own (already reviewed) distributed
plan, and the digest adds one map-side projection + a scalar agg, no
extra shuffle.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEP = "\x1f"  # chr(31) unit separator
NUL = "\x1e"  # chr(30) NULL sentinel
MASK = (1 << 40) - 1  # 40-bit row hash => sum of ~8M rows fits a long

# digest bundle name -> member catalog-query names (registration names)
GROUPS: dict[str, list[str]] = {
    "rel_core_digest": [
        "region_revenue",
        "countdistinct_audit",
        "cleanse_normalize_dedup",
        "hwm_incremental",
        "null_or_newer",
    ],
    "join_set_digest": [
        "top_revenue_orders",
        "semi_join_hot_orders",
        "anti_join_quiet_customers",
        "nullsafe_join",
        "broadcast_remap",
        "union_by_name",
        "intersect_buyers",
        "except_unordered_parts",
    ],
    "window_page_digest": [
        "distinct_on_first_order",
        "topk_per_group",
        "running_total",
        "lag_lead_events",
        "keyset_pagination",
        # round 11: W2 seeded-random pagination folded here (a
        # pagination-window shape) to free its standalone slot for
        # ann_point_api_digest under the 50-slot cap
        "seeded_random_page",
        # round 12: the multi-space hybrid page seats here — both ann
        # digests are at the 8-member cap, and what this member
        # actually checks beyond them IS a window composition: two
        # per-leg rank windows + the RRF-fused top-k page (each leg's
        # probe replay is covered by the collection members)
        "collection_hybrid_fused_page",
    ],
    "shape_gallery_digest": [
        "rollup_order_status",
        "pivot_status_by_priority",
        "unpivot_customer_metrics",
        "from_json_extract",
        "scalar_function_gallery",
        # round-8 rebalance: NFC normalization is a scalar text
        # function — moved here to keep text_profile at 8 after
        # bm25_search joined it (bm25_index_search took its old
        # text_model slot; every registered query must hold a seat)
        "nfc_normalize_docs",
        # round-9 rebalance: vector concat+normalize is a scalar
        # function gallery shape (vector_codec_digest was at 8)
        "vector_concat_norm",
    ],
    "subquery_digest": [
        "correlated_exists",
        "outer_join_distribution",
        "in_subquery_having",
        "scalar_subquery_anti",
        "correlated_scalar_min",
    ],
    "misc_relational_digest": [
        "filtered_revenue",
        "conditional_share",
        "multi_or_predicates",
        "table_profile",
        "right_join_orders",
        "cube_status_priority",
        "scd2_orders",
        "merge_with_delete",
    ],
    "analytic_windows_digest": [
        "ntile_quartiles",
        "global_sort_nulls",
        "statistical_moments",
        "rank_distributions",
    ],
    "complex_types_digest": [
        "explode_tokens_distinct",
        "arrays_overlap_filter",
        "flatten_distinct_union",
        "complex_types_gallery",
        "temporal_scalar_gallery",
        # round-9 rebalance: the posexplode chunking shape lives with
        # the other array/explode queries (text_model_digest was at 8)
        "chunk_documents",
    ],
    "landing_roundtrip_digest": [
        "json_landing_roundtrip",
        "keyed_landing_roundtrip",
        "partitioned_landing_prune",
        "csv_landing_roundtrip",
        "orc_landing_roundtrip",
    ],
    "pandas_udf_digest": [
        "canonical_grouping",
        "pandas_grouped_agg",
        "apply_in_pandas_normalize",
        "udtf_token_explode",
        # round 8: folded out of its own driver slot (freed for
        # hybrid_rrf_search); thematically at home here — the hash
        # embedder IS the digest's mapInPandas model-per-executor shape
        "hash_embed_knn",
    ],
    # round-7 rebalance (round-6 VERDICT item 7): no digest carries more
    # than 8 members, so a digest hash-mismatch localizes to at most 8
    # candidate queries instead of 16-17
    "scale_patterns_digest": [
        "skew_salted_agg",
        "bucketed_colocated_join",
        "approx_stats",
        "key_skew_profile",
        "zorder_keys",
        "stream_upsert_view",
        "stream_stream_outer_join",
        "stream_scd2_asof_enrich",
    ],
    "lakehouse_txn_digest": [
        "time_travel_versions",
        "version_diff",
        "change_feed_ivm",
        "data_skipping_read",
        "point_lookup_read",
        "batch_merge_commits",
        "change_feed_cursor",
        "cdc_replication",
    ],
    "text_profile_digest": [
        "text_stats",
        "vocabulary_top_tokens",
        "hash_ordered_sample",
        "pii_scrub",
        "quality_rule_filter",
        "bm25_search",
        "line_quality_filter",
        "paragraph_dedup",
    ],
    "text_model_digest": [
        # round 10: the two index serves moved to text_serving_digest
        # (the lexical serving family got its own slot when the
        # grouped serve joined the checked window), dropping this
        # digest from its 8-member ceiling — the r8 rebalance rule
        "charlm_quality",
        "duplicate_spans",
        "ccnet_buckets",
        "train_charlm_profile",
        "bpe_word_counts",
        "bpe_token_histogram",
        # round 10: language_id folded here (a text-model shape) to
        # free its standalone slot for text_serving_digest under the
        # 50-slot cap; its own parity test still checks it per-row
        "language_id",
    ],
    # round 10: the lexical serving family — the text twin of
    # ann_serving_digest: flat index serve, filtered serve, and the
    # grouped (search-groups) serve over stored payload, all replaying
    # the SAME post-upsert + post-set_payload fixture state
    "text_serving_digest": [
        "bm25_index_search",
        "bm25_filtered_search",
        "text_grouped_search",
        # round 11: the BATCH hybrid joined the checked window — it
        # reads both persisted indexes once per query batch, and its
        # lexical branch replays through this family's fixture state
        "hybrid_batch_search",
    ],
    "dedup_digest": [
        "exact_dedup_docs",
        "fingerprint_dedup",
        "ngram_jaccard_pairs",
        "simhash_dedup",
        "winnow_dup_pairs",
        "incremental_dedup_snapshot",
        "substring_dedup_clean",
    ],
    "corpus_sampling_digest": [
        "hash_split_sets",
        "corpus_mix_weighted",
        "domain_cap_sample",
        "corpus_temperature_mix",
        "dsir_select",
        "corpus_shard_assign",
        "token_budget_select",
        "epoch_upsample",
    ],
    # round 9: the Qdrant serving-API parity family — round-11
    # rebalance (the digest hit the 8-member ceiling): the RANKED
    # serves stay here, the point-management APIs moved to
    # ann_point_api_digest, and the two promoted indexed-hybrid
    # serves (which compose the ANN serve with the text index over
    # the same replayable state) took the freed seats — a digest
    # hash-mismatch still localizes to one serving family
    "ann_serving_digest": [
        "ann_index_topk",
        "ann_payload_topk",
        "ann_recommend_topk",
        "ann_grouped_topk",
        # round 10: index-served MMR promoted into the checked window
        # (exhaustive probe = exact over the post-upsert state; the
        # pruned-probe path is recall-tested in tests/test_retrieval)
        "mmr_rerank_indexed",
        # round 11: the indexed hybrid family promoted (r10 verdict
        # item 1) — flat RRF fusion + the grouped dashboard page,
        # both replaying the text AND ANN fixture states in one oracle
        "hybrid_indexed_search",
        "hybrid_grouped_page",
        # round 12: the collection-surface recommend (the reference
        # dashboard's combined-space 'more like these' flow at the
        # pinned pair) fills the digest to the 8-member cap
        "collection_recommend_topk",
    ],
    # round 11: Qdrant point-management APIs split out of
    # ann_serving_digest (scroll / set_payload page / count share the
    # _ANN_IDX_CTES state replay but exercise the live fold, not the
    # probe path); the named-vector collection members live here too —
    # collections ARE the point-model parity family (one point,
    # several spaces, one shared payload)
    "ann_point_api_digest": [
        "ann_scroll_page",
        "ann_set_payload_page",
        "ann_index_count",
        "collection_image_search",
        "collection_relabel_page",
        # round 12: the grouped collection page, the whole dedup-purge
        # job's loser set, and the post-purge state replay fill the
        # digest to the 8-member cap — the complete collection
        # lifecycle (serve / relabel / group / purge) is oracle-checked
        "collection_grouped_page",
        "collection_dedup_purge",
        "collection_purged_scroll",
    ],
    "vector_codec_digest": [
        # round-9 rebalance: vector_concat_norm (a scalar-function
        # gallery shape) moved to shape_gallery_digest to seat the MMR
        # re-rank here under the 8-member cap
        "mmr_rerank_topk",
        "pq_ann_topk",
        "semdedup_prune",
        "hard_negative_mining",
        "retrieval_metrics",
        "retrieval_metrics_ivf",
        "sq8_ann_topk",
        "bq_ann_topk",
    ],
}

GROUPED_PARTS: dict[str, str] = {
    part: group for group, parts in GROUPS.items() for part in parts
}

# Canonical column spec per member: (column, kind) sorted by column name.
# kind 'f' = double (trunc * 1e6 serialization), 's' = varchar cast.
# Generated from live query schemas; tests/test_digests.py re-derives and
# asserts this table matches, so schema drift fails loudly.
PART_COLS: dict[str, tuple[tuple[str, str], ...]] = {
    "region_revenue": (("n_lineitems", "s"), ("n_name", "s"), ("revenue", "f")),
    "countdistinct_audit": (("distinct_keys", "s"), ("total_rows", "s")),
    "cleanse_normalize_dedup": (("brand", "s"), ("key", "s"), ("ptype", "s")),
    "hwm_incremental": (("event_id", "s"), ("event_type", "s"), ("ts_us", "s")),
    "null_or_newer": (("event_id", "s"), ("mark_us", "s")),
    "top_revenue_orders": (
        ("o_orderkey", "s"),
        ("orderdate_us", "s"),
        ("revenue", "f"),
    ),
    "semi_join_hot_orders": (("o_orderkey", "s"), ("o_totalprice", "f")),
    "anti_join_quiet_customers": (("c_custkey", "s"), ("c_name", "s")),
    "nullsafe_join": (("n_nationkey", "s"), ("r_name", "s")),
    "broadcast_remap": (
        ("n_customers", "s"),
        ("nation_name", "s"),
        ("total_acctbal", "f"),
    ),
    "union_by_name": (("okey", "s"), ("price", "f"), ("prio", "s")),
    "intersect_buyers": (("c_custkey", "s"),),
    "except_unordered_parts": (("p_partkey", "s"),),
    "distinct_on_first_order": (
        ("o_custkey", "s"),
        ("o_orderkey", "s"),
        ("orderdate_us", "s"),
    ),
    "topk_per_group": (
        ("o_orderkey", "s"),
        ("o_orderpriority", "s"),
        ("o_totalprice", "f"),
    ),
    "running_total": (
        ("o_custkey", "s"),
        ("o_orderkey", "s"),
        ("running_spend", "f"),
    ),
    "lag_lead_events": (
        ("event_id", "s"),
        ("next_event_id", "s"),
        ("prev_value", "f"),
        ("user_id", "s"),
        ("value", "f"),
    ),
    "keyset_pagination": (("event_id", "s"), ("event_type", "s")),
    "rollup_order_status": (
        ("n_orders", "s"),
        ("o_orderpriority", "s"),
        ("o_orderstatus", "s"),
        ("total_price", "f"),
    ),
    "pivot_status_by_priority": (
        ("n_filled", "s"),
        ("n_open", "s"),
        ("n_partial", "s"),
        ("o_orderpriority", "s"),
    ),
    "unpivot_customer_metrics": (
        ("c_custkey", "s"),
        ("metric", "s"),
        ("value", "f"),
    ),
    "from_json_extract": (("event_type", "s"), ("n_events", "s"), ("sum_k", "s")),
    "scalar_function_gallery": (
        ("acctbal_int", "s"),
        ("c_custkey", "s"),
        ("name_md5", "s"),
        ("prompt", "s"),
        ("sanitized", "s"),
    ),
    "correlated_exists": (("n_orders", "s"), ("o_orderpriority", "s")),
    "outer_join_distribution": (("n_customers", "s"), ("n_orders", "s")),
    "in_subquery_having": (
        ("o_orderkey", "s"),
        ("o_totalprice", "f"),
        ("total_qty", "f"),
    ),
    "scalar_subquery_anti": (
        ("c_mktsegment", "s"),
        ("n_idle_rich", "s"),
        ("total_bal", "f"),
    ),
    "correlated_scalar_min": (
        ("p_brand", "s"),
        ("p_partkey", "s"),
        ("p_retailprice", "f"),
    ),
    "filtered_revenue": (("n_rows", "s"), ("revenue_effect", "f")),
    "conditional_share": (("promo_revenue", "f"), ("total_revenue", "f")),
    "multi_or_predicates": (("n_rows", "s"), ("revenue", "f")),
    "table_profile": (
        ("column_name", "s"),
        ("max_str", "s"),
        ("min_str", "s"),
        ("n_distinct", "s"),
        ("n_nulls", "s"),
    ),
    "right_join_orders": (
        ("c_custkey", "s"),
        ("c_name", "s"),
        ("o_orderkey", "s"),
    ),
    "cube_status_priority": (
        ("n_orders", "s"),
        ("o_orderpriority", "s"),
        ("o_orderstatus", "s"),
    ),
    "scd2_orders": (
        ("is_current", "s"),
        ("o_orderkey", "s"),
        ("o_orderstatus", "s"),
        ("o_totalprice", "f"),
        ("valid_from", "s"),
        ("valid_to", "s"),
    ),
    "ntile_quartiles": (
        ("o_orderkey", "s"),
        ("o_orderpriority", "s"),
        ("price_quartile", "s"),
    ),
    "global_sort_nulls": (("etype", "s"), ("event_id", "s"), ("value", "f")),
    "statistical_moments": (
        ("cov_qty_price", "f"),
        ("l_returnflag", "s"),
        ("n", "s"),
        ("stddev_qty", "f"),
        ("var_qty", "f"),
    ),
    "rank_distributions": (
        ("cd", "f"),
        ("dr", "s"),
        ("o_orderkey", "s"),
        ("o_orderpriority", "s"),
        ("pr", "f"),
    ),
    "explode_tokens_distinct": (("lang", "s"), ("token", "s")),
    "arrays_overlap_filter": (("doc_id", "s"), ("lang", "s")),
    "flatten_distinct_union": (("n_distinct_guids", "s"), ("n_total", "s")),
    "complex_types_gallery": (
        ("dec_doubled", "s"),
        ("due_us", "s"),
        ("nested_price", "f"),
        ("o_orderkey", "s"),
        ("status_name", "s"),
    ),
    "temporal_scalar_gallery": (
        ("o_orderkey", "s"),
        ("order_date_str", "s"),
        ("order_quarter", "s"),
        ("order_year", "s"),
        ("priority_code", "s"),
        ("reparsed_us", "s"),
    ),
    "json_landing_roundtrip": (
        ("event_type", "s"),
        ("n_events", "s"),
        ("sum_value", "f"),
    ),
    "keyed_landing_roundtrip": (
        ("landed_key", "s"),
        ("n_total", "s"),
        ("o_custkey", "s"),
    ),
    "partitioned_landing_prune": (
        ("n_orders", "s"),
        ("o_orderpriority", "s"),
        ("order_year", "s"),
    ),
    "csv_landing_roundtrip": (
        ("c_mktsegment", "s"),
        ("n_customers", "s"),
        ("total_bal", "f"),
    ),
    "orc_landing_roundtrip": (
        ("n_parts", "s"),
        ("p_brand", "s"),
        ("total_price", "f"),
    ),
    "canonical_grouping": (
        ("canonical_group", "s"),
        ("member_guids", "s"),
        ("n_members", "s"),
        ("representative", "s"),
    ),
    "pandas_grouped_agg": (
        ("acctbal_spread", "f"),
        ("c_mktsegment", "s"),
        ("n_customers", "s"),
    ),
    "apply_in_pandas_normalize": (
        ("o_orderkey", "s"),
        ("o_orderpriority", "s"),
        ("price_norm", "f"),
    ),
    "udtf_token_explode": (("doc_id", "s"), ("position", "s"), ("token", "s")),
    "hash_embed_knn": (("cosine_sim", "f"), ("doc_id", "s")),
    "substring_dedup_clean": (
        ("clean_text", "s"),
        ("doc_id", "s"),
        ("n_removed_tokens", "s"),
        ("n_tokens", "s"),
    ),
    "skew_salted_agg": (
        ("cnt_items", "s"),
        ("l_returnflag", "s"),
        ("max_price", "f"),
        ("min_price", "f"),
        ("sum_qty", "f"),
    ),
    "bucketed_colocated_join": (
        ("n_items", "s"),
        ("o_orderkey", "s"),
        ("o_totalprice", "f"),
        ("total_qty", "f"),
    ),
    "approx_stats": (
        ("approx_median_ok", "s"),
        ("approx_orders_ok", "s"),
        ("l_returnflag", "s"),
        ("n_orders_exact", "s"),
        ("n_rows", "s"),
    ),
    "text_stats": (
        ("avg_token_len", "f"),
        ("distinct_ratio", "f"),
        ("doc_id", "s"),
        ("lang", "s"),
        ("n_distinct_tokens", "s"),
        ("n_tokens", "s"),
        ("n_tokens_bpe", "s"),
        ("quality_score", "f"),
        ("stopword_ratio", "f"),
    ),
    "vocabulary_top_tokens": (
        ("doc_freq", "s"),
        ("term_freq", "s"),
        ("token", "s"),
    ),
    "hash_ordered_sample": (
        ("doc_id", "s"),
        ("lang", "s"),
        ("n_chars", "s"),
    ),
    "winnow_dup_pairs": (
        ("a_id", "s"),
        ("b_id", "s"),
        ("n_shared", "s"),
        ("n_union", "s"),
    ),
    "ngram_jaccard_pairs": (
        ("a_id", "s"),
        ("b_id", "s"),
        ("jaccard", "f"),
    ),
    "simhash_dedup": (
        ("a_id", "s"),
        ("b_id", "s"),
        ("hamming", "s"),
    ),
    "fingerprint_dedup": (
        ("canonical_id", "s"),
        ("fingerprint", "s"),
        ("n_members", "s"),
    ),
    "exact_dedup_docs": (
        ("canonical_id", "s"),
        ("fingerprint", "s"),
        ("n_members", "s"),
    ),
    "pii_scrub": (
        ("doc_id", "s"),
        ("n_email", "s"),
        ("n_ip", "s"),
        ("n_phone", "s"),
        ("scrub_md5", "s"),
    ),
    "key_skew_profile": (
        ("avg_key_rows", "f"),
        ("max_key_rows", "s"),
        ("n_keys", "s"),
        ("n_rows", "s"),
        ("skew_ratio", "f"),
        ("top_share", "f"),
    ),
    "time_travel_versions": (
        ("n_orders", "s"),
        ("o_orderstatus", "s"),
        ("version", "s"),
    ),
    "chunk_documents": (
        ("chunk_idx", "s"),
        ("chunk_len", "s"),
        ("chunk_md5", "s"),
        ("chunk_text", "s"),
        ("doc_id", "s"),
    ),
    "quality_rule_filter": (
        ("distinct_ok", "s"),
        ("distinct_ratio", "f"),
        ("doc_id", "s"),
        ("keep", "s"),
        ("mean_word_len", "f"),
        ("n_words", "s"),
        ("stop_hits", "s"),
        ("stop_ok", "s"),
        ("word_len_ok", "s"),
        ("words_ok", "s"),
    ),
    "bm25_search": (
        ("bm25", "f"),
        ("doc_id", "s"),
        ("n_terms_hit", "s"),
    ),
    "bm25_index_search": (
        ("bm25", "f"),
        ("doc_id", "s"),
        ("n_terms_hit", "s"),
    ),
    "language_id": (
        ("doc_id", "s"),
        ("lang_pred", "s"),
        ("score_de", "f"),
        ("score_en", "f"),
        ("score_es", "f"),
        ("score_fr", "f"),
    ),
    "text_grouped_search": (
        ("bm25", "f"),
        ("doc_id", "s"),
        ("group_rank", "s"),
        ("lang", "s"),
        ("rank_in_group", "s"),
    ),
    "bm25_filtered_search": (
        ("bm25", "f"),
        ("doc_id", "s"),
        ("n_terms_hit", "s"),
    ),
    "mmr_rerank_topk": (
        ("cosine_sim", "f"),
        ("mmr_rank", "s"),
        ("mmr_score", "f"),
        ("vec_id", "s"),
    ),
    "mmr_rerank_indexed": (
        ("cosine_sim", "f"),
        ("mmr_rank", "s"),
        ("mmr_score", "f"),
        ("vec_id", "s"),
    ),
    "ann_index_topk": (
        ("adc_micro", "s"),
        ("cosine_sim", "f"),
        ("vec_id", "s"),
    ),
    "ann_recommend_topk": (
        ("adc_micro", "s"),
        ("cosine_sim", "f"),
        ("vec_id", "s"),
    ),
    "ann_payload_topk": (
        ("adc_micro", "s"),
        ("cosine_sim", "f"),
        ("vec_id", "s"),
    ),
    "ann_grouped_topk": (
        ("cosine_sim", "f"),
        ("group_rank", "s"),
        ("label", "s"),
        ("rank_in_group", "s"),
        ("vec_id", "s"),
    ),
    "ann_scroll_page": (
        ("ann_list", "s"),
        ("vec_id", "s"),
    ),
    "ann_set_payload_page": (
        ("ann_list", "s"),
        ("label", "s"),
        ("vec_id", "s"),
    ),
    "ann_index_count": (
        ("n_points", "s"),
    ),
    "charlm_quality": (
        ("avg_logprob", "f"),
        ("doc_id", "s"),
        ("n_trigrams", "s"),
    ),
    "duplicate_spans": (
        ("a_id", "s"),
        ("b_id", "s"),
        ("n_shared_spans", "s"),
    ),
    "nfc_normalize_docs": (
        ("changed", "s"),
        ("doc_id", "s"),
        ("text_nfc", "s"),
    ),
    "line_quality_filter": (
        ("doc_id", "s"),
        ("n_lines", "s"),
        ("n_lines_kept", "s"),
        ("text_clean", "s"),
    ),
    "paragraph_dedup": (
        ("doc_id", "s"),
        ("n_lines", "s"),
        ("n_lines_kept", "s"),
        ("text_clean", "s"),
    ),
    "domain_cap_sample": (
        ("doc_id", "s"),
        ("lang", "s"),
        ("source", "s"),
    ),
    "dsir_select": (
        ("avg_log_ratio", "f"),
        ("doc_id", "s"),
        ("n_matched", "s"),
        ("n_trigrams", "s"),
    ),
    "zorder_keys": (
        ("d1", "s"),
        ("d2", "s"),
        ("o_orderkey", "s"),
        ("zkey", "s"),
    ),
    "version_diff": (
        ("change", "s"),
        ("new_o_orderstatus", "s"),
        ("new_o_totalprice", "f"),
        ("o_orderkey", "s"),
        ("old_o_orderstatus", "s"),
        ("old_o_totalprice", "f"),
    ),
    "change_feed_ivm": (
        ("n_rows", "s"),
        ("o_orderpriority", "s"),
        ("units", "f"),
    ),
    "stream_upsert_view": (
        ("event_type", "s"),
        ("n_rows", "s"),
        ("value_fl", "f"),
    ),
    "data_skipping_read": (
        ("o_custkey", "s"),
        ("o_orderkey", "s"),
        ("o_orderstatus", "s"),
        ("o_totalprice_i", "s"),
    ),
    "point_lookup_read": (
        ("o_custkey", "s"),
        ("o_orderkey", "s"),
        ("o_orderstatus", "s"),
    ),
    "stream_stream_outer_join": (
        ("click_id", "s"),
        ("gap_us", "s"),
        ("purchase_id", "s"),
        ("user_id", "s"),
    ),
    "stream_scd2_asof_enrich": (
        ("event_id", "s"),
        ("tier", "s"),
        ("ts_us", "s"),
        ("user_id", "s"),
    ),
    "batch_merge_commits": (
        ("o_custkey", "s"),
        ("o_orderkey", "s"),
        ("o_orderpriority", "s"),
    ),
    "change_feed_cursor": (
        ("batch", "s"),
        ("epoch", "s"),
        ("o_custkey", "s"),
        ("o_orderkey", "s"),
        ("o_orderstatus", "s"),
    ),
    "cdc_replication": (
        ("o_custkey", "s"),
        ("o_orderkey", "s"),
        ("o_orderstatus", "s"),
    ),
    "retrieval_metrics": (
        ("mrr", "f"),
        ("ndcg_at_k", "f"),
        ("q_id", "s"),
        ("recall_at_k", "f"),
    ),
    "retrieval_metrics_ivf": (
        ("mrr", "f"),
        ("ndcg_at_k", "f"),
        ("q_id", "s"),
        ("recall_at_k", "f"),
    ),
    "train_charlm_profile": (
        ("cnt", "s"),
        ("lnw_nano", "s"),
        ("trigram", "s"),
    ),
    "bpe_word_counts": (
        ("cnt", "s"),
        ("word", "s"),
    ),
    "bpe_token_histogram": (
        ("occurrences", "s"),
        ("token", "s"),
    ),
    "ccnet_buckets": (
        ("avg_logprob", "f"),
        ("bucket", "s"),
        ("doc_id", "s"),
        ("lang", "s"),
        ("n_trigrams", "s"),
    ),
    "epoch_upsample": (
        ("doc_id", "s"),
        ("epoch", "s"),
        ("lang", "s"),
    ),
    "corpus_shard_assign": (
        ("doc_id", "s"),
        ("pos", "s"),
        ("shard", "s"),
    ),
    "merge_with_delete": (
        ("o_orderkey", "s"),
        ("origin", "s"),
        ("price", "f"),
    ),
    "token_budget_select": (
        ("cum_tokens", "s"),
        ("doc_id", "s"),
        ("n_tokens", "s"),
    ),
    "vector_concat_norm": (
        ("combined_dim", "s"),
        ("combined_norm", "f"),
        ("vec_id", "s"),
    ),
    "hard_negative_mining": (
        ("cosine_sim", "f"),
        ("label", "s"),
        ("q_id", "s"),
        ("rank", "s"),
        ("vec_id", "s"),
    ),
    "pq_ann_topk": (
        ("adc_micro", "s"),
        ("cosine_sim", "f"),
        ("vec_id", "s"),
    ),
    "sq8_ann_topk": (
        ("approx_micro", "s"),
        ("cosine_sim", "f"),
        ("vec_id", "s"),
    ),
    "bq_ann_topk": (
        ("cosine_sim", "f"),
        ("hamming", "s"),
        ("vec_id", "s"),
    ),
    "semdedup_prune": (
        ("label", "s"),
        ("vec_id", "s"),
    ),
    "hash_split_sets": (
        ("doc_id", "s"),
        ("lang", "s"),
        ("split", "s"),
    ),
    "incremental_dedup_snapshot": (
        ("doc_id", "s"),
        ("lang", "s"),
        ("n_chars", "s"),
    ),
    "corpus_mix_weighted": (
        ("doc_id", "s"),
        ("n_chars", "s"),
        ("source", "s"),
    ),
    "corpus_temperature_mix": (
        ("doc_id", "s"),
        ("lang", "s"),
        ("source", "s"),
    ),
    "seeded_random_page": (
        ("c_custkey", "s"),
        ("c_name", "s"),
    ),
    "hybrid_indexed_search": (
        ("doc_id", "s"),
        ("lex_rank", "s"),
        ("rrf_score", "f"),
        ("sem_rank", "s"),
    ),
    "hybrid_grouped_page": (
        ("doc_id", "s"),
        ("group_rank", "s"),
        ("label", "s"),
        ("rank_in_group", "s"),
        ("rrf_score", "f"),
    ),
    "collection_image_search": (
        ("adc_micro", "s"),
        ("cosine_sim", "f"),
        ("vec_id", "s"),
    ),
    "collection_relabel_page": (
        ("label", "s"),
        ("status", "s"),
        ("vec_id", "s"),
    ),
    "collection_grouped_page": (
        ("cosine_sim", "f"),
        ("group_rank", "s"),
        ("label", "s"),
        ("rank_in_group", "s"),
        ("vec_id", "s"),
    ),
    "collection_dedup_purge": (("vec_id", "s"),),
    "collection_recommend_topk": (
        ("adc_micro", "s"),
        ("cosine_sim", "f"),
        ("vec_id", "s"),
    ),
    "collection_hybrid_fused_page": (
        ("rank_combined", "s"),
        ("rank_image", "s"),
        ("rrf_score", "f"),
        ("status", "s"),
        ("vec_id", "s"),
    ),
    "collection_purged_scroll": (
        ("label", "s"),
        ("status", "s"),
        ("vec_id", "s"),
    ),
    "hybrid_batch_search": (
        ("doc_id", "s"),
        ("lex_rank", "s"),
        ("q_id", "s"),
        ("rrf_score", "f"),
        ("sem_rank", "s"),
    ),
}


def _ser_col_spark(name: str, kind: str) -> F.Column:
    if kind == "f":
        return F.coalesce(
            (F.col(name).cast("double") * F.lit(1000000.0))
            .cast("long")
            .cast("string"),
            F.lit(NUL),
        )
    return F.coalesce(F.col(name).cast("string"), F.lit(NUL))


def _row_hash_spark(cols: tuple[tuple[str, str], ...]) -> F.Column:
    ser = F.concat_ws(SEP, *[_ser_col_spark(n, k) for n, k in cols])
    h60 = F.conv(F.substring(F.md5(ser.cast("binary")), 1, 15), 16, 10).cast("long")
    return h60.bitwiseAND(F.lit(MASK))


def digest_part_df(df: DataFrame, tag: str) -> DataFrame:
    """Reduce one member's result to (part, n_rows, digest)."""
    cols = PART_COLS[tag]
    missing = [n for n, _ in cols if n not in df.columns]
    if missing:
        raise ValueError(f"digest part {tag!r}: missing columns {missing}")
    return (
        df.select(_row_hash_spark(cols).alias("row_h"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.coalesce(F.sum("row_h"), F.lit(0).cast("long")).alias("digest"),
        )
        .select(F.lit(tag).alias("part"), "n_rows", "digest")
    )


def build_digest_fn(parts: list[tuple[str, object]]):
    """(tag, member_fn) list -> a catalog QueryFn unioning member digests."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        outs = [digest_part_df(member(spark, sf_dir), tag) for tag, member in parts]
        return reduce(lambda a, b: a.unionByName(b), outs)

    return fn


def _ser_col_sql(name: str, kind: str) -> str:
    if kind == "f":
        return (
            f"coalesce(cast(cast(trunc(cast({name} AS DOUBLE) * 1000000.0) "
            f"AS BIGINT) AS VARCHAR), chr(30))"
        )
    return f"coalesce(cast({name} AS VARCHAR), chr(30))"


def digest_part_sql(oracle: str, tag: str) -> str:
    """DuckDB digest of one member's oracle SQL — same hash as Spark."""
    cols = PART_COLS[tag]
    sers = ", ".join(_ser_col_sql(n, k) for n, k in cols)
    return (
        f"SELECT '{tag}' AS part, count(*) AS n_rows,\n"
        f"       cast(coalesce(sum(('0x' || substr(md5(concat_ws(chr(31), {sers})), 1, 15))::BIGINT & {MASK}), 0) AS BIGINT) AS digest\n"
        f"FROM (\n{oracle.strip()}\n) AS q_{tag}"
    )


def build_digest_sql(parts: list[tuple[str, str]]) -> str:
    """(tag, member_oracle_sql) list -> one UNION ALL digest oracle."""
    return "\nUNION ALL\n".join(digest_part_sql(sql, tag) for tag, sql in parts)
