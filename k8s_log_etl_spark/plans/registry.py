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
    #: declared empty-input behavior (round-10 verdict #6): True means
    #: the query REFUSES schema-correct zero-row corpora with an
    #: explicit ValueError (training/selection on an empty corpus is
    #: undefined by contract). The empty-tables sweep
    #: (tests/test_short_docs.py) derives its expected refusal set
    #: from this flag, so a new query cannot land without declaring
    #: its empty-input behavior — an undeclared refusal AND a declared
    #: refusal that completes both fail the sweep.
    refuses_empty: bool = False


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
    refuses_empty: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = QuerySpec(
            name, fn, oracle, tuple(tags), bench, refuses_empty
        )
        return fn

    return deco


# The round driver hard-checks only the FIRST 50 registered queries.
# Round 10 rotation: (1) round-10 additions (no driver row yet —
# outrank everything), (2) round-10 modified implementations, (3) the
# r4-latest refresh tranche — ALL 34 rows whose newest green is round
# 4, now the oldest greens on the books (PLANS.md round-10 lead #1),
# (4) family-representative slots for capabilities with no organic
# tranche member, pointed at their STALEST (r5) members so the rep
# slot doubles as a refresh, and (5) the stalest remaining r5 rows in
# the leftover slots. Everything rotated out keeps its r5-r9 green
# row, is unchanged since, and stays continuously covered by the
# full-surface pytest oracle run (tests/test_oracle_parity.py runs
# every oracled query every time).
_CHECKED_FIRST = [
    # --- (a) round-10 additions ---
    # BM25 serving probe against the persisted inverted index — the
    # steady-state face proving text_bm25_retrieval's "the index is
    # the thing you persist" claim (round-9 verdict #4); probe cost
    # measured near-flat across the 1x/10x/100x corpus decades
    "bm25_index_serve",
    # greedy k-center coreset (Gonzalez farthest-point; Sener &
    # Savarese 2018) — the diversity-maximizing selector beside the
    # density-seeking ones; displaces corpus_clean_pipeline's (e)
    # slot (bench-measured every round anyway)
    "select_kcenter_coreset",
    # BM25 incremental index maintenance (merge == rebuild proven by
    # the full-recompute oracle); displaces rag_retrieval_pipeline's
    # (e) slot
    "bm25_index_delta_serve",
    # --- (b) round-10 modified implementations: the CCNet tercile
    # rank moved onto the distributed prefix-sum ranking discipline
    # (plan changed — the round-9 verdict's one acknowledged
    # 100x-scale hazard); both perceptual kernels gained the
    # defensive 16-byte payload slice (outputs identical, modified
    # code gets a row); the tokenizer-compare oracle's import-time
    # CTE guard was rescoped per-chain (composition path changed) ---
    "corpus_ccnet_buckets", "dedup_perceptual_ahash",
    "dedup_perceptual_phash_dct", "tokenizer_compare",
    # --- (c) the r4-latest refresh tranche: all 34 rows whose newest
    # green is round 4, displaced round after round by addition waves
    # — the complete cohort, one-for-one as PLANS.md lead #1 asks ---
    "agg_null_semantics", "bpe_pair_stats", "dedup_edit_distance",
    "dq_constraint_checks", "events_activity_streaks",
    "events_bot_rate_flags", "events_markov_transitions",
    "events_time_to_convert", "events_top_paths",
    "events_weekly_seasonality", "join_null_safe", "knn_sq8_adc",
    "multimodal_feature_extract", "nation_revenue_yoy",
    "nation_top_customer_roster", "orders_page_offset",
    "orders_price_percentiles", "orders_price_range_frame",
    "orders_vs_peer_avg", "orders_window_analytics",
    "part_price_outliers_mad", "parts_copurchased",
    "pq_codebook_train", "q12_late_shipments", "q15_top_supplier",
    "q17_small_qty_revenue", "q18_large_volume_orders",
    "q21_sole_late_supplier", "q22_dormant_customers",
    "q4_order_priority", "q8_market_share",
    "set_ops_multiset_orders", "supplier_rank_dense",
    "text_zipf_slope",
    # --- (d) family representatives for capabilities with no organic
    # tranche member this round, each pointed at the family's STALEST
    # (r5) green so the rep slot doubles as a refresh
    # (tests/test_registry_order.py pins the mapping) ---
    "scan_jsonl",                    # log
    "multimodal_curation_pipeline",  # capstone
    "sample_weighted_topn",          # sampling
    "join_scd2_dimension",           # warehouse
    "knn_ivfpq_adc",                 # ann-index
    "ann_recall_eval",               # ann-eval
    "graph_bfs_hops",                # graph
    # --- (e) stalest remaining r5 rows in the leftover slots ---
    "kmeans_ivf_train", "dedup_cluster_components",
]
# agg_heavyhitters_events is sketch-only (no oracle by construction —
# Misra-Gries merge is partition-order-dependent; bounded against
# exact answers in tests/test_approx.py) and never takes a checked
# slot. agg_approx_events likewise has no oracle (its r2 CORRECTNESS
# row is a dead `no_oracle` artifact, not a failure — bounded in
# tests/test_approx.py). agg_countmin_events WAS in this club until
# round 7, when its registers were hand-rolled over md5 buckets and
# ORACLED — it now rotates through checked slots like any other query
# (first green row: r7, section (a) above).


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
