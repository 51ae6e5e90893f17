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
# Round 4 rotation (executes the round-3 plan verbatim): the 43 oracled
# queries that were registered after round 3's 50-slot window filled and
# therefore have NO driver CORRECTNESS row yet all get slots, so after
# this round EVERY registered query has had a green driver row in some
# round (union of r1+r2+r3 rows + these 50). The remaining 7 slots form
# the regression core: the log-ETL parity chain heads (normalize /
# pipeline_events / report_summary), the corpus_clean_pipeline capstone,
# dedup_minhash_lsh as the dedup head, and the two queries whose
# implementation CHANGED this round for the ANN-recall lift
# (knn_lsh_hyperplane multi-table OR-amplification, ann_recall_eval now
# also scoring the IVF-PQ index) — a green r3 row says nothing about new
# code. Everything rotated out keeps its r1/r2/r3 green row, is
# unchanged since, and stays continuously covered by the full-surface
# pytest oracle run (tests/test_oracle_parity.py runs every oracled
# query every time).
_CHECKED_FIRST = [
    # --- never driver-checked through round 3 (43), in registration
    #     order within family ---
    # similarity: PQ / SQ8 / IVF-PQ index family (round-3c additions)
    "pq_codebook_train", "knn_sq8_adc", "knn_ivfpq_adc",
    # dedup additions
    "dedup_edit_distance", "dedup_incremental_batch",
    # llmprep / curation additions incl. the two capstones
    "bpe_pair_stats", "sample_weighted_topn", "training_mix_pipeline",
    "decontam_bloom_prescreen",
    # warehouse ops capstone
    "corpus_snapshot_diff",
    # multimodal capstone
    "multimodal_curation_pipeline", "multimodal_feature_extract",
    # relational: remaining TPC-H shapes + window/null/set-op taxonomy
    "q4_order_priority", "q12_late_shipments", "orders_price_percentiles",
    "supplier_rank_dense", "nation_revenue_yoy", "part_price_outliers_mad",
    "q15_top_supplier", "q17_small_qty_revenue", "q18_large_volume_orders",
    "q21_sole_late_supplier", "q22_dormant_customers", "q8_market_share",
    "orders_vs_peer_avg", "set_ops_multiset_orders", "parts_copurchased",
    "orders_window_analytics", "agg_null_semantics", "join_null_safe",
    "dq_constraint_checks", "orders_page_offset", "orders_price_range_frame",
    "nation_top_customer_roster",
    # events analytics additions
    "events_markov_transitions", "events_bot_rate_flags",
    "events_activity_streaks", "events_top_paths", "events_time_to_convert",
    "events_weekly_seasonality",
    # text analysis additions
    "text_boilerplate_phrases", "text_gopher_rules", "text_zipf_slope",
    # --- regression core + round-4-modified code (7) ---
    "normalize", "pipeline_events", "report_summary",
    "corpus_clean_pipeline", "dedup_minhash_lsh",
    "knn_lsh_hyperplane", "ann_recall_eval",
]
# agg_countmin_events is sketch-only (no oracle by construction,
# bounded against exact answers in tests/test_approx.py) — it never
# takes a checked slot.
# ROUND-5 ROTATION NOTE: the queries ADDED in round 4 registered
# after the 50-slot window and have no driver row yet — give them
# slots next round: dedup_semantic_cells, contamination_spans,
# join_skew_salted, events_sessionize, minhash_estimate_quality,
# dedup_keep_best, knn_ivfpq_refine, dedup_substring_spans,
# events_quantile_sketch, rag_retrieval_pipeline, corpus_scd2_history,
# corpus_scd2_as_of — plus profile_documents, whose implementation was
# REWORKED in round 4c (one-pass Expand profile) after its r3 green
# row (all green in
# tools/drive_entry.py and tests/test_oracle_parity.py). Also re-slot
# any query whose implementation changes in round 5, plus the standing
# log-ETL regression core; everything else keeps its r1-r4 green row
# and the full-surface pytest oracle run.


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (imports trigger registration), then
    order the result: the 50 driver-checked slots first (explicit
    priority list), everything else after in registration order."""
    from k8s_log_etl_spark.queries import (  # noqa: F401
        dedup,
        graph,
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
