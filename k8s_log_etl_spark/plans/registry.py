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
# Round 6 rotation: after round 5, the union of r1-r5 driver rows
# covers every registered query except the by-design no-oracle
# agg_countmin_events, with all 50 r5 slots green — so round 6 spends
# the window on (a) the fifteen round-6 ADDITIONS (BPE encode,
# perceptual near-dup, incremental near-dup, epoch shuffle, hard
# negatives, retrieval NDCG, skew profiler, leakage guard,
# tokenizer-aware packing, interval-overlap sweep, record linkage,
# score calibration, keeper remap, FK-integrity audit, mixture
# drift), (b) the
# one round-6 MODIFIED implementation (dedup_prefix_filter_jaccard —
# PPJoin length+positional filters; a green r5 row says nothing about
# new code), and (c)-(d) the OLDEST-green refresh: every r1-latest
# query (10) and 7 of the 31 oracled r2-latest (the no-oracle
# agg_approx_events stays out of the window with agg_countmin_events,
# both bounded in tests/test_approx.py instead).
# (f) Families whose members are all r4/r5-latest
# keep a hard driver signal through their reps
# (tests/test_registry_order.py): training_mix_pipeline (capstone),
# corpus_snapshot_diff (warehouse), ann_recall_eval (ann-eval),
# graph_pagerank_copurchase (graph). Everything rotated out keeps its
# r3-r5 green row, is unchanged since, and stays continuously covered
# by the full-surface pytest oracle run (tests/test_oracle_parity.py
# runs every oracled query every time).
_CHECKED_FIRST = [
    # --- (a) round-6 additions (15) ---
    "bpe_encode_corpus", "dedup_perceptual_ahash",
    "dedup_minhash_incremental", "epoch_shuffle_order",
    "knn_hard_negatives", "retrieval_eval_ndcg",
    "profile_key_skew", "eval_holdout_decontaminated",
    "pack_chunks_bpe_budget", "supplier_shipment_overlap",
    "entity_resolve_parts", "quality_score_calibration",
    "dedup_keeper_remap", "dq_referential_integrity",
    "corpus_mix_drift",
    # --- (a') round-6 late additions (13): these take the slots of
    # thirteen r2-latest refreshes whose families keep other in-window
    # members (multimodal_resize_stats, text_top_bigrams,
    # q5_regional_revenue, stream_tumbling_counts,
    # text_langid_confusion, text_token_bpeish,
    # multimodal_frame_sample, q3_top_unshipped,
    # text_fingerprint_clusters, text_token_stats, and tfidf_top_terms
    # + window_topk_per_customer + stream_session_windows which
    # additionally stay bench-measured every round; the streaming
    # family also stays equivalence-tested in every pytest run — all
    # stay covered by the full-surface pytest oracle run) ---
    "dedup_lines_corpus", "split_group_aware", "corpus_merge_upsert",
    "agg_hll_events", "layout_zorder_stats",
    "curriculum_difficulty_bins", "dq_psi_value_drift",
    "events_attribution_last_touch", "text_bigram_lm_score",
    "sample_kmv_bottomk", "events_forecast_holt",
    "events_ab_test_analysis", "graph_triangle_count",
    # --- (b) round-6 modified implementations (1) ---
    "dedup_prefix_filter_jaccard",
    # --- (c) oldest-green refresh: all 10 r1-latest ---
    "agg_by_service", "agg_cube_orders", "agg_grouping_sets",
    "agg_minmax_by", "agg_stats_events", "join_anti_customers",
    "join_full_outer_nations", "join_semi_customers",
    "pivot_status_by_year", "set_ops_customers",
    # --- (d) oldest-green refresh: 7 of the 31 oracled r2-latest
    # (agg_rollup_orders, q13_order_distribution, having_large_orders,
    # window_running_total, correlated_not_exists, events_props_typed,
    # scalar_subquery_outliers, embedding_centroids,
    # dedup_embedding_cosine — the documented brute baseline — and
    # join_asof_last_purchase and knn_brute_cosine (the other brute
    # baseline; ann-index family keeps knn_ivf_grid) yield their slots
    # to the last eleven round-6 additions; their families keep
    # multiple in-window members and all eleven stay covered by the
    # full-surface pytest oracle run) ---
    "dedup_exact",
    "events_resample_1h",
    "knn_ivf_grid",
    "multimodal_blob_meta",
    "q1_pricing_summary",
    "sample_stratified_topk",
    "text_quality_score",
    # (the two r3 log-core slots from the first round-6 cut yielded to
    # the later round-6 additions above; the log family keeps its hard
    # signal through agg_by_service (r1, slot (c)) and the r3 core
    # rotates in next round) —
    # --- (f) family representatives whose families are wholly
    # r4/r5-latest (capstone, warehouse, ann-eval, graph) ---
    "training_mix_pipeline", "corpus_snapshot_diff",
    "ann_recall_eval", "graph_pagerank_copurchase",
]
# agg_countmin_events and agg_heavyhitters_events are sketch-only (no
# oracle by construction, bounded against exact answers in
# tests/test_approx.py) — they never take checked slots.
# agg_approx_events likewise has no oracle (its r2 CORRECTNESS row is
# a dead `no_oracle` artifact, not a failure — the query is bounded
# against exact answers in tests/test_approx.py).


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
