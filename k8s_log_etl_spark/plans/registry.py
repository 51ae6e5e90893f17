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
# Round 11 rotation (a maintenance round; the round's other new
# surface, the BM25 streaming ingest face, is a streaming twin
# verified by tests/test_bm25_ingest.py's stream == batch ==
# oracle-verified-index identity, like the other ingest faces):
# (0) the one round-11 addition, (1) round-11 modified
# implementations, (2) the r5-latest
# refresh tranche — ALL 33 rows whose newest green is round 5, the
# oldest greens on the books (PLANS.md round-11 lead #1), (3)
# family-representative slots for capabilities with no organic
# tranche member, pointed at their STALEST remaining greens so the
# rep slot doubles as a refresh, and (4) the stalest r6 rows in the
# leftover slots. Everything rotated out keeps its r6-r10 green row,
# is unchanged since, and stays continuously covered by the
# full-surface pytest oracle run (tests/test_oracle_parity.py runs
# every oracled query every time).
_CHECKED_FIRST = [
    # --- (0) round-11 addition: AMS tug-of-war F2 / self-join-size
    # sketch (Alon-Matias-Szegedy 1996, bucketed fast-AMS layout) —
    # the second frequency moment joining the oracled sketch family
    # (F0=HLL, point counts=CMS, KMV, quantile rank); displaces
    # q1_pricing_summary's (d) slot (a bench head, measured every
    # round anyway)
    "agg_ams_f2_events",
    # --- (a) round-11 modified implementations: the BM25 index
    # builders moved onto the atomic staged-publish path and the
    # shared bm25_doc_stats segment builder (round-10 ADVICE + the
    # streaming-face refactor); the CCNet range bucket moved to
    # integer div; the tokenizer-compare oracle guard regained
    # cross-chain coverage (composition path changed) ---
    "bm25_index_serve", "bm25_index_delta_serve",
    "corpus_ccnet_buckets", "tokenizer_compare",
    # --- (b) the r5-latest refresh tranche: all 33 rows whose newest
    # green is round 5 — the complete cohort, one-for-one as PLANS.md
    # lead #1 asks ---
    "agg_distinct_customers", "corpus_clean_pipeline",
    "corpus_scd2_as_of", "corpus_scd2_history",
    "corpus_scd2_schema_evolution", "decontam_excise_spans",
    "dedup_events_exact", "dedup_keep_best", "dedup_semantic_cells",
    "dedup_simhash", "events_gap_fill_locf", "events_sessionize",
    "filter_service", "join_range_binned", "join_skew_salted",
    "knn_ivfpq_refine", "knn_lsh_hyperplane",
    "minhash_estimate_quality", "normalize", "parse_json",
    "pipeline_events", "profile_documents", "q11_important_stock",
    "q16_supplier_counts", "q20_recent_demand_suppliers",
    "q2_min_cost_supplier", "q6_forecast_revenue",
    "q9_product_profit", "rag_retrieval_pipeline", "report_summary",
    "topk_global_orders", "unpivot_order_metrics", "window_lag_gap",
    # --- (c) family representatives for capabilities with no organic
    # tranche member this round, each pointed at the family's STALEST
    # remaining green (r6, graph r9) so the rep slot doubles as a
    # refresh (tests/test_registry_order.py pins the mapping) ---
    "multimodal_blob_meta",       # multimodal (r6)
    "sample_kmv_bottomk",         # sampling (r6)
    "retrieval_eval_ndcg",        # ann-eval (r6)
    "graph_pagerank_copurchase",  # graph (r9 — family's stalest)
    # --- (d) stalest r6 rows in the leftover slots (the r6 cohort
    # leads round 12's tranche; these nine start it early) ---
    "agg_cube_orders", "agg_hll_events", "dq_referential_integrity",
    "entity_resolve_parts", "epoch_shuffle_order",
    "events_resample_1h", "pivot_status_by_year",
    "split_group_aware",
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
