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
# Round 5 rotation (executes the round-4 verdict's plan verbatim):
# (a) the 13 round-4 additions that registered after round 4's 50-slot
# window and therefore have no driver row yet, plus profile_documents
# (reworked in r4c after its r3 green row); (b) the thirteen queries
# ADDED in round 5 (SCD2 schema evolution, the two span-excision
# applies, integer PageRank, bounded BFS, LOCF gap fill, the
# fact-to-SCD2 temporal dimension join, prefix-filtered exact jaccard,
# and the five shapes completing TPC-H's 22 — Q2/Q9/Q11/Q16/Q20 on the
# derived supplier-part catalog); (c) every query whose
# implementation CHANGED in
# round 5 — dedup_cluster_components (cc_star self-pair node fix),
# corpus_snapshot_diff (schema-union alignment), and the similarity
# queries routed through the parameterized _lsh_search /
# _kmeans_train / _ivfpq_scored_frames refactor (knn_lsh_hyperplane,
# knn_ivfpq_adc, kmeans_ivf_train, ann_recall_eval; knn_ivfpq_refine
# is already in (a)) — a green r4 row says nothing about new code;
# (d) the standing log-ETL regression core plus the multimodal and
# sampling family representatives; (e) the remaining slots REFRESH
# the queries whose latest green row is oldest (10 of the 20
# r1-latest). Everything rotated out keeps its r1-r4 green
# row, is unchanged since, and stays continuously covered by the
# full-surface pytest oracle run (tests/test_oracle_parity.py runs
# every oracled query every time).
_CHECKED_FIRST = [
    # --- (a) round-4 additions without a driver row + profile_documents (14) ---
    "dedup_semantic_cells", "contamination_spans", "join_skew_salted",
    "events_sessionize", "minhash_estimate_quality", "dedup_keep_best",
    "knn_ivfpq_refine", "dedup_substring_spans", "events_quantile_sketch",
    "rag_retrieval_pipeline", "corpus_scd2_history", "corpus_scd2_as_of",
    "q6_forecast_revenue", "profile_documents",
    # --- (b) round-5 additions (13) ---
    "corpus_scd2_schema_evolution", "dedup_excise_spans",
    "decontam_excise_spans", "graph_pagerank_copurchase",
    "graph_bfs_hops", "events_gap_fill_locf",
    "join_scd2_dimension", "dedup_prefix_filter_jaccard",
    "q2_min_cost_supplier", "q9_product_profit", "q11_important_stock",
    "q16_supplier_counts", "q20_recent_demand_suppliers",
    # --- (c) round-5 modified implementations (6) ---
    "dedup_cluster_components", "corpus_snapshot_diff",
    "knn_lsh_hyperplane", "knn_ivfpq_adc", "kmeans_ivf_train",
    "ann_recall_eval",
    # --- (d) regression core + family representatives (7): the
    # multimodal and sampling families have no round-5-new/modified
    # query, but every capability family keeps a hard driver signal
    # (tests/test_registry_order.py), so their capstone reps hold
    # slots ---
    "normalize", "pipeline_events", "report_summary",
    "corpus_clean_pipeline", "dedup_minhash_lsh",
    "multimodal_curation_pipeline", "sample_weighted_topn",
    # --- (e) oldest-green refresh: 10 of the 20 r1-latest (the agg_*,
    # join-variant and set-op refreshes yield their slots to the
    # family reps and round-5 additions above — every rotated-out r1
    # row stays covered by the full-surface pytest oracle run) ---
    "agg_distinct_customers",
    "dedup_events_exact", "dedup_simhash", "filter_service",
    "join_range_binned", "parse_json",
    "scan_jsonl", "topk_global_orders",
    "unpivot_order_metrics", "window_lag_gap",
]
# agg_countmin_events is sketch-only (no oracle by construction,
# bounded against exact answers in tests/test_approx.py) — it never
# takes a checked slot. agg_approx_events likewise has no oracle (its
# r2 CORRECTNESS row is a dead `no_oracle` artifact, not a failure —
# the query is bounded against exact answers in tests/test_approx.py).


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
