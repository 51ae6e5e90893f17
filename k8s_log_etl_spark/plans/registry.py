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
# Round 12 rotation (a maintenance round, PLANS.md round-12 lead #1):
# (a) round-12 modified implementations, (b) the r6-latest refresh
# tranche — ALL 26 rows whose newest green is round 6, the oldest
# greens on the books, (c) family-representative slots for
# capabilities with no organic tranche member, pointed at their
# STALEST remaining greens so the rep slot doubles as a refresh, and
# (d) the leftover 18 slots reaching into the 35-row r7 cohort
# (stalest-next; chosen for capability spread — streaming, windows,
# multimodal, subqueries, approx — the 17 r7 rows left over lead
# round 13's tranche). Everything rotated out keeps its r7-r11 green
# row, is unchanged since, and stays continuously covered by the
# full-surface pytest oracle run (tests/test_oracle_parity.py runs
# every oracled query every time).
_CHECKED_FIRST = [
    # --- (a) round-12 modified implementations: the BM25 staged
    # publish's lost-race fallback is now itself race-safe (round-11
    # ADVICE — both index builders share _bm25_index_build); the
    # CCNet bucket grid gained the corpus-quantile range-skew
    # fallback (round-11 verdict watch item — partitioning lever,
    # rank semantics unchanged) ---
    "bm25_index_serve", "bm25_index_delta_serve",
    "corpus_ccnet_buckets",
    # --- (b) the r6-latest refresh tranche: all 26 rows whose newest
    # green is round 6 — the complete cohort, one-for-one as PLANS.md
    # lead #1 asks ---
    "agg_by_service", "agg_grouping_sets", "agg_minmax_by",
    "agg_stats_events", "corpus_mix_drift", "corpus_snapshot_diff",
    "curriculum_difficulty_bins", "dedup_exact", "dedup_keeper_remap",
    "dq_psi_value_drift", "eval_holdout_decontaminated",
    "events_ab_test_analysis", "events_attribution_last_touch",
    "events_forecast_holt", "join_anti_customers",
    "join_full_outer_nations", "join_semi_customers",
    "knn_hard_negatives", "layout_zorder_stats", "profile_key_skew",
    "q1_pricing_summary", "quality_score_calibration",
    "sample_stratified_topk", "set_ops_customers",
    "supplier_shipment_overlap", "text_quality_score",
    # --- (c) family representatives for capabilities with no organic
    # tranche member this round, each pointed at the family's STALEST
    # remaining green so the rep slot doubles as a refresh
    # (tests/test_registry_order.py pins the mapping) ---
    "knn_ivf_grid",             # ann-index (r9 — family's stalest)
    "ann_recall_eval",          # ann-eval (r10 — family's stalest)
    "graph_triangle_estimate",  # graph (r9 — family's stalest)
    # --- (d) stalest r7 rows in the leftover 18 slots (the r7 cohort
    # is next after (b); picked for capability spread) ---
    "agg_by_level", "agg_countmin_events", "agg_rollup_orders",
    "correlated_not_exists", "crossmodal_retrieval",
    "dedup_embedding_cosine", "dedup_simhash_banded",
    "domain_mix_by_loss", "embedding_centroids",
    "events_exact_percentiles", "events_funnel", "events_props_typed",
    "filter_level", "multimodal_frame_sample",
    "pipeline_events_report", "stream_session_windows",
    "stream_tumbling_counts", "window_spend_deciles",
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
