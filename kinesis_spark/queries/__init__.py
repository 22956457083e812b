"""Query registry: every analytics operator the engine claims is registered
here with (a) a Spark callable ``(spark, sf_dir) -> DataFrame`` and (b) where
SQL-expressible, an equivalent DuckDB oracle SQL string (driver contract in
``__spark_entry__.py``).

Determinism rules (so the driver's order-insensitive value-hash matches):

- Every computed column is aliased identically in Spark and the oracle.
- Monetary/double aggregates are computed in exact DECIMAL(18,2) arithmetic
  on BOTH engines, then cast to DOUBLE — identical bit patterns regardless
  of partial-aggregation order (double summation order differs between
  engines; decimal summation is exact and associative).
- Ratios/averages are derived from those exact sums (sum/count), never from
  the engines' native double ``avg``.
- Scale-2 decimals can never hit a rounding tie when cast from double
  (an exact tie needs an odd multiple of 1/200, which is not a dyadic
  rational), so HALF_UP (Spark) vs round-half-even engines agree.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

# The engine-identical whitespace class: Java's \s includes U+000B while
# RE2's excludes it, so every tokenizer spells the class explicitly. The
# raw string renders the SAME literal text for Spark (Java regex) and the
# DuckDB oracles (RE2), so f-string-interpolating it into an oracle keeps
# the two engines byte-for-byte aligned. WS_CHARS is the class body, for
# composing larger classes (e.g. t9's [A-Za-z0-9<ws>] symbol filter).
WS_CHARS = r" \t\n\f\r\x0B"
WS_RE = rf"[{WS_CHARS}]+"


@dataclass(frozen=True)
class Query:
    name: str
    spark_fn: SparkQuery
    oracle: str | None = None  # DuckDB SQL; None → driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a Spark query (and its DuckDB oracle) by name."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, spark_fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def load_all_modules() -> None:
    """Import every query module so registrations run."""
    from kinesis_spark.queries import (  # noqa: F401
        aggregates,
        companions,
        dedup,
        events,
        graph,
        ingest_ops,
        joins,
        lineage,
        mllib_lsh,
        multimodal,
        pipelines,
        scalars,
        setops,
        similarity,
        textstats,
        tpch,
        udf_ops,
        windows,
    )


def get_registry() -> dict[str, Query]:
    load_all_modules()
    return REGISTRY


# The external correctness driver verifies a fixed-size window of queries per
# round, walking the dict returned by ``__spark_entry__.queries()`` in
# insertion order. Round 1 (CORRECTNESS_r01.json) covered the first 50
# registered names; the 50 below got no driver row. They are promoted to the
# front of the dict for round 2 so that across rounds every family earns a
# driver-green CORRECTNESS entry. Queries added after round 1 slot in after
# these (but before the already-verified round-1 names) so they enter the
# window in a later round.
DRIVER_PRIORITY: tuple[str, ...] = (
    # scalars (sc1/sc2 were driver-verified in r1; the rest were not)
    "sc3_math_funcs",
    "sc4_array_funcs",
    "sc5_json_funcs",
    "sql1_pure_sql_api",
    "sc6_null_safety",
    "sc7_url_parsing",
    # set operations
    "s1_union_segments",
    "s2_intersect_repeat_buyers",
    "s3_except_churned",
    "s4_union_all_order_events",
    "s5_deterministic_sample",
    "s6_dataset_diff",
    # similarity search
    "sim1_topk_cosine",
    "sim2_lsh_bucketed_ann",
    "sim3_label_centroids",
    "sim4_topk_pandas",
    "sim6_ivf_ann",
    # text analysis
    "t1_token_stats",
    "t2_quality_score",
    "t3_lang_id",
    "t4_char_bigrams",
    "t5_doc_fingerprint",
    "t6_tfidf_top_terms",
    "t7_decontamination",
    # TPC-H analogs
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_revenue_change",
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q18_large_volume_customer",
    "q19_discounted_revenue",
    "q10_returned_items",
    "q17_small_quantity_revenue",
    "q13_customer_distribution",
    "q16_supplier_part_counts",
    # UDF/UDTF
    "u1_word_chunk_udtf",
    "u2_grouped_rank_pandas",
    # window functions
    "w1_top_orders_per_customer",
    "w2_running_revenue",
    "w3_order_gaps",
    "w4_moving_avg_quantity",
    "w5_nation_revenue_rank",
    "w6_distribution_funcs",
    "w7_value_navigation",
    "w8_range_frame_trailing",
    # ---- round-2 backlog (never driver-verified through r02; VERDICT r2
    # task 3 wants these closed in r03, so they outrank queries first
    # registered in round 3, which can wait for the r04 window) ----
    "a12_hll_sketch_union",
    "a13_heavy_hitters_countmin",
    "d12_url_canonical_dedup",
    "d13_canonical_selection",
    "d14_capped_lsh_pairs",
    "d15_bloom_incremental_dedup",
    "d8c_mllib_pairs_exact_jaccard",
    "sim5c_brp_recall_vs_exact",
    "a8c_sketch_error_bounds",
    "e12_value_anomalies",
    "e13_rolling_weekly_active",
    "e14_typed_props_rollup",
    "e15_scd2_state_history",
    "i4_unframed_rechunk",
    "j7_asof_forward_fulfillment",
    "j8_asof_nearest_click",
    "j9_interval_overlap_join",
    "prov1_file_lineage",
    "prov2_shard_manifest",
    "dq1_validation_rules",
    "prov3_dataset_fingerprint",
    "dq2_column_profile",
    "p1_llm_prep_pipeline",
    "p2_sequence_packing",
    "sc8_map_funcs",
    "sc9_bitwise_funcs",
    "s7_stratified_sample",
    "s8_domain_mix_rebalance",
    "s9_train_val_test_split",
    "s10_reproducible_shuffle",
    "s11_exact_k_sample",
    "s12_weighted_sample",
    "sim7_int8_quantization",
    "sim8_dim_truncation_recall",
    "sim9_semdedup_prune",
    "t9_repetition_signals",
    "t10_pii_redaction",
    "t8_bpe_token_count",
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q12_late_shipment_priority",
    "q20_excess_inventory_suppliers",
    "q21_waiting_suppliers",
    "q22_global_sales_opportunity",
    "u3_grouped_agg_pandas",
)

# Queries whose SEMANTICS changed after earning a driver-green row,
# mapped to the LAST round whose CORRECTNESS rows validated the OLD
# definition. A row from a LATER round re-verifies the new semantics
# and clears the entry automatically — no manual edit, no permanently
# burned window slots.
FORCE_REVERIFY: dict[str, int] = {
    # changed in r4: sim9 re-blocked on (label, scaled sign-LSH
    # sub-bucket); sim12 assignment rerouted through the hierarchical
    # two-level quantizer (cluster ids now coarse*2^20+fine); sim6's
    # cell argmin now ranks on the ROUNDED squared distance (the
    # file-wide fp bridge, oracle changed in lockstep). Rows from
    # rounds <= 3 validated the old definitions.
    "sim9_semdedup_prune": 3,
    "sim12_semdedup_bounded": 3,
    "sim6_ivf_ann": 3,
    # changed in r4 (events review round): e1's oracle day column is
    # CAST to TIMESTAMP (DuckDB date_trunc('day') yields DATE, Spark
    # yields TIMESTAMP — the r1 row passed because the driver hashed
    # string forms that happened to agree); e10's oracle session
    # numbering gained the (ts, event_id) tie-break the Spark side
    # always had; e14's oracle now mirrors from_json's integer-only
    # strictness (json_type gate) instead of CAST-coercing strings.
    # Rows from rounds <= 3 validated the old oracle definitions.
    "e1_daily_type_rollup": 3,
    "e10_session_window_builtin": 3,
    "e14_typed_props_rollup": 3,
    # changed in r4 (tpch review round): q11's 0.1%-of-total threshold
    # compare moved from an order-dependent double window sum to an
    # exact decimal compare (pv*1000 > total) on both engines.
    "q11_important_stock": 3,
    # changed in r4 (setops review round): s12's A-Res priority now
    # rounds ln(u) to 6 dp through an exact decimal before the /w
    # division (JVM Math.log vs libm differ in the last ulp on ~7% of
    # inputs — measured; the rounded chain is bit-identical).
    "s12_weighted_sample": 3,
    # changed in r4 (scalars review round): sc1 gained trim/pad/split
    # columns (schema change); sc2's oracle month_start is CAST to
    # TIMESTAMP (DuckDB DATE_TRUNC yields DATE — e1's fix, same class).
    "sc1_string_funcs": 3,
    "sc2_date_funcs": 3,
    # changed in r5: s16's gram->bucket hash moved from md5 to the
    # code-point multiplicative hash (bucket assignments, hence scores,
    # changed — oracle in lockstep); sim16 ships UNROUNDED ip/rankings
    # (the half-tie fix). Rows from rounds <= 4 validated the old
    # definitions.
    "s16_dsir_reweight": 4,
    "sim16_mips_norm_augment": 4,
}


def _driver_verified_names() -> frozenset[str]:
    """Names that already have a CORRECTNESS row validating their
    CURRENT semantics — read from the CORRECTNESS_r*.json files the
    harness drops in the repo root. Used to rotate never-verified
    queries into the driver's fixed-size window automatically each
    round; falls back to the static round-1 list when the files are
    unreadable. A FORCE_REVERIFY name counts only when its green row
    comes from a round AFTER the semantics change, so the entry
    self-clears the moment the driver re-verifies it."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    seen: set[str] = set()
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            # a row counts as verified only if it PASSED (or is the
            # deliberate rows-only kind); a failed/errored row keeps the
            # query in the front of the window for re-verification
            if not isinstance(row, dict):
                continue
            if rnd <= FORCE_REVERIFY.get(name, 0):
                continue  # row validated the OLD semantics
            err = row.get("err")
            if err is None or err == "no_oracle":
                seen.add(name)
    if not seen:
        return R1_VERIFIED - {n for n, r in FORCE_REVERIFY.items() if r >= 1}
    return frozenset(seen)


# Names the driver verified in round 1 (keys of CORRECTNESS_r01.json). These
# go LAST so new queries (not in either list) land ahead of them and reach
# the driver window before any re-verification.
R1_VERIFIED: frozenset[str] = frozenset(
    {
        "a1_distinct_counts", "a2_rollup_order_status", "a3_cube_lineitem_flags",
        "a4_grouping_sets", "a5_conditional_agg", "a6_pivot_event_types",
        "a7_exact_percentiles", "a8_sketch_aggregates", "a9_unpivot_nation_metrics",
        "a10_windowed_distinct_users", "a11_weighted_avg",
        "d1_exact_dedup", "d2_content_hash_dedup", "d3_minhash_lsh_pairs",
        "d4_jaccard_verify", "d5_embedding_near_dup", "d6_simhash_signature",
        "d7_simhash_pairs", "d8_minhash_lsh_mllib", "d9_dedup_components",
        "d10_edit_distance_verify", "d11_bag_dedup",
        "e1_daily_type_rollup", "e2_tumbling_window_counts",
        "e3_sliding_window_counts", "e4_sessionization",
        "e5_user_activity_profile", "e6_funnel_analysis", "e7_cohort_retention",
        "e8_gap_filled_hourly", "e9_transition_matrix",
        "e10_session_window_builtin", "e11_interarrival_stats",
        "i1_chunk_payloads", "i2_request_batching",
        "i3_partition_key_distribution",
        "j1_left_outer_order_counts", "j2_anti_inactive_customers",
        "j3_range_join_price_bands", "j4_asof_click_before_purchase",
        "j5_full_outer_nation_activity", "j6_salted_skew_join",
        "mm1_media_catalog", "mm2_decode_features", "mm3_frame_sample",
        "mm4_nibble_histogram", "mm5_frame_energy",
        "sc1_string_funcs", "sc2_date_funcs",
        "sim5_brp_ann_mllib",
    }
)


def get_registry_ordered() -> dict[str, Query]:
    """Registry reordered for the driver's fixed-size per-round window:
    (1) DRIVER_PRIORITY names still lacking a CORRECTNESS row, (2) every
    other never-verified query in registration order, (3) already-
    verified queries last. Verification state comes from the
    CORRECTNESS_r*.json files on disk, so the rotation advances itself
    each round without editing this file. Content identical to
    ``get_registry()``."""
    reg = get_registry()
    verified = _driver_verified_names()
    ordered: dict[str, Query] = {}
    for name in DRIVER_PRIORITY:
        if name in reg and name not in verified:
            ordered[name] = reg[name]
    for name, q in reg.items():  # other never-verified, registration order
        if name not in ordered and name not in verified:
            ordered[name] = q
    for name, q in reg.items():  # already driver-verified
        if name not in ordered:
            ordered[name] = q
    assert len(ordered) == len(reg)
    return ordered
