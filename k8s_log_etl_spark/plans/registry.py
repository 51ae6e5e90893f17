"""Query registry powering __spark_entry__.py.

Each operator from SURVEY.md §2 registers a named query: a callable
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a DuckDB
oracle SQL string computing the same result on the same inputs. The
driver hash-compares the two at sf0.01.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: Optional[str] = None
    tags: tuple[str, ...] = ()
    bench: bool = False  # include in bench.py's headline set


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = QuerySpec(name, fn, oracle, tuple(tags), bench)
        return fn

    return deco


# The round driver hard-checks only the FIRST 50 registered queries.
# Round 3 rotation: every query that had never received a driver
# CORRECTNESS row through round 2 (the 20 listed first) gets a slot, so
# after this round all r2-era queries are driver-verified at least
# once. The permanently-dead `agg_approx_events` slot (no oracle by
# construction — bounded against exact answers in tests/test_approx
# instead) is freed for a checkable query. The remaining slots go to
# (a) queries whose implementation changed this round — a green r2 row
# says nothing about new code — (b) the 11 queries ADDED this round,
# which have no driver row yet, and (c) a standing regression core:
# the full log-ETL parity chain plus one similarity and one multimodal
# representative. Everything rotated out keeps its r1/r2 green row, is
# unchanged since, and stays continuously covered by the full-surface
# pytest oracle run (tests/test_oracle_parity.py runs every oracled
# query every time).
_CHECKED_FIRST = [
    # --- never driver-checked before round 3 (20) ---
    # events analytics
    "events_funnel", "events_retention_cohorts", "events_rolling_1h",
    "events_value_histogram", "events_anomaly_zscore", "rfm_segments",
    # text / pii
    "text_repetition_scores", "pii_scan_documents", "redact_documents",
    # custom-function taxonomy
    "udaf_embedding_norm", "udtf_sentence_split",
    # dedup scale paths
    "dedup_embedding_lsh", "dedup_cluster_components",
    # sampling / corpus curation
    "sample_bernoulli_seeded", "sample_domain_balanced",
    "ann_recall_eval", "benchmark_contamination",
    "domain_mix_weights", "profile_documents",
    # streaming
    "stream_sliding_avg",
    # --- implementation changed in round 3 (re-verify) (6) ---
    "pack_chunks_budget", "corpus_clean_pipeline", "dedup_ngram_jaccard",
    "dedup_minhash_lsh", "dedup_simhash_banded", "knn_lsh_hyperplane",
    # --- NEW in round 3 (11): first driver check for the new surface ---
    # llmprep additions
    "split_train_holdout", "chunk_sliding_windows", "text_perplexity_proxy",
    "decontam_filter_corpus", "embedding_quantize_int8",
    # dedup / events additions
    "dedup_containment", "events_dau_wau",
    # relational join shapes
    "q7_volume_shipping", "q10_returned_items", "promo_revenue_share",
    "q19_disjunctive_revenue",
    # iterative ML (kmeans took knn_ivf_grid's core slot: that query is
    # r2-green and unchanged; kmeans is new code with no driver row)
    "kmeans_ivf_train",
    # --- standing regression core (12) ---
    # log-ETL reference parity (O1-O13 composed)
    "normalize", "normalize_fields", "ts_validate", "filter_level",
    "redact", "transform_chain", "agg_by_level",
    "agg_filter_reason", "report_summary",
    "pipeline_events", "pipeline_events_report",
    # one multimodal representative (streaming keeps stream_sliding_avg
    # above, similarity keeps knn_lsh_hyperplane + kmeans; the remaining
    # r2 greens rotate out on their green rows — the full-surface pytest
    # oracle run keeps covering them every time)
    "multimodal_decode_stats",
]
# ROUND-4 ROTATION NOTE: 44 queries registered after the 50-slot
# window filled this round have no driver row yet (union of r1+r2 rows
# + this round's 50 covers the rest) and should take slots next round,
# prioritized below in registration order — with 50 slots, cover all
# 44 plus a small regression core, and queue the remainder for r5:
# text_boilerplate_phrases, events_markov_transitions,
# bpe_pair_stats, dedup_incremental_batch, dedup_edit_distance,
# sample_weighted_topn, pq_codebook_train, q4_order_priority,
# q12_late_shipments, events_bot_rate_flags, orders_price_percentiles,
# supplier_rank_dense, events_activity_streaks, nation_revenue_yoy,
# part_price_outliers_mad, training_mix_pipeline, events_top_paths,
# q8_market_share, q15_top_supplier, q17_small_qty_revenue,
# q18_large_volume_orders, q21_sole_late_supplier,
# q22_dormant_customers, text_gopher_rules, orders_vs_peer_avg,
# set_ops_multiset_orders, knn_sq8_adc, parts_copurchased,
# events_time_to_convert, text_zipf_slope, knn_ivfpq_adc,
# orders_window_analytics, decontam_bloom_prescreen,
# events_weekly_seasonality, multimodal_curation_pipeline,
# multimodal_feature_extract, agg_null_semantics, join_null_safe,
# dq_constraint_checks, corpus_snapshot_diff, orders_page_offset,
# orders_price_range_frame, nation_top_customer_roster (all green in
# tools/drive_entry.py and tests/test_oracle_parity.py).
# agg_countmin_events is sketch-only (no oracle, bounded in
# tests/test_approx.py) — do NOT give it a checked slot.


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (imports trigger registration), then
    order the result: the 50 driver-checked slots first (explicit
    priority list), everything else after in registration order."""
    from k8s_log_etl_spark.queries import (  # noqa: F401
        dedup,
        llmprep,
        log_queries,
        multimodal,
        relational,
        similarity,
        streaming_batch,
        text,
        udx,
    )

    ordered: dict[str, QuerySpec] = {}
    for name in _CHECKED_FIRST:
        ordered[name] = _QUERIES[name]
    for name, spec in _QUERIES.items():
        ordered.setdefault(name, spec)
    return ordered


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in load_all().items() if spec.oracle}


def bench_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in load_all().items() if spec.bench}
