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
# Round 14 rotation (round-13 verdict #6: ALL 50 slots point at ORACLED
# queries — the two bounds-only sketches leave the driver window and
# stay pinned by tests/test_approx.py; their r13 rows-only driver
# fingerprints stand): (a) the 16 leftover r8 rows that the r13
# rotation plan promised would lead this round's tranche, (b) this
# round's STRUCTURALLY modified implementations (k-space posting keys,
# keyed scan spreads, cc_star exchange cuts, one-parse signature/argmax
# SQL rewrites, graph edge-build keying — each family's members get a
# fresh driver fingerprint through the changed code), and (c) stale-r9
# refreshes doubling as family representatives for every capability
# (tests/test_registry_order.py pins the mapping; approx-sketch's rep
# is the ORACLED countmin sketch, not the bounds-only pair).
_CHECKED_FIRST_R14 = [
    # --- (a) the 16 leftover r8 rows (stalest greens on the books) ---
    "corpus_ngram_saturation", "dedup_containment", "dedup_excise_spans",
    "dedup_minhash_incremental", "dedup_ngram_jaccard",
    "dedup_substring_spans", "holdout_novelty_scan",
    "pack_chunks_bpe_budget", "quality_gate_serve", "text_bigram_lm_score",
    "text_boilerplate_phrases", "text_collocations_pmi",
    "text_fingerprint_clusters", "text_keyword_rake", "text_readability_fk",
    "text_repetition_scores",
    # --- (b) round-14 structurally modified implementations ---
    "corpus_clean_pipeline", "dedup_edit_distance",
    "graph_triangle_estimate", "graph_pagerank_copurchase",
    "graph_bfs_hops", "graph_triangle_count", "parts_copurchased",
    "split_group_aware", "dedup_cluster_components", "dedup_keeper_remap",
    "dedup_lines_corpus", "wordpiece_encode_corpus",
    "wordpiece_train_merges", "bpe_encode_corpus",
    "quality_classifier_train", "dedup_simhash", "dedup_simhash_banded",
    "dedup_minhash_lsh", "dedup_minhash_index_serve",
    "minhash_estimate_quality",
    # --- (c) fixed-dim-unroll consumers + stale-r9 refreshes, doubling
    # as family representatives ---
    "knn_brute_cosine", "knn_ivfpq_adc", "ann_recall_eval",
    "rag_retrieval_pipeline", "crossmodal_retrieval",
    "retrieval_hybrid_rrf", "dedup_embedding_lsh", "udaf_embedding_norm",
    "events_rolling_1h", "transform_chain", "sample_domain_balanced",
    "agg_countmin_events", "join_scd2_dimension", "events_gap_fill_locf",
]

# Round 13 rotation (kept for the rotation log; superseded by
# _CHECKED_FIRST_R14 above — PLANS.md round-13 lead #1, round-12
# verdict #1/#2):
# (a) round-13 modified implementations, (b) the two never-driver-
# checked sketch queries as rows-only slots (retiring
# agg_approx_events' stale r2 `no_oracle` artifact and giving
# agg_heavyhitters_events its first driver fingerprint — both remain
# legitimately oracle-less, so the driver records the weaker
# rows-only check), (c) the COMPLETE 17-row r7-latest cohort — the
# stalest greens on the books, (d) family-representative slots for
# capabilities with no organic tranche member, pointed at their
# STALEST remaining greens so the rep slot doubles as a refresh, and
# (e) 20 slots reaching into the 36-row r8 cohort (capability
# spread; the 16 r8 rows left over lead round 14's tranche).
# Everything rotated out keeps its r8-r12 green row, is unchanged
# since, and stays continuously covered by the full-surface pytest
# oracle run (tests/test_oracle_parity.py runs every oracled query
# every time).
_CHECKED_FIRST_R13 = [
    # --- (a) round-13 modified implementations: the BM25 builder's
    # publish is now re-checked-and-retried after the lost-race
    # fallback (round-12 ADVICE — both serve faces share
    # _bm25_index_build); the two brute all-pairs baselines gained
    # the fail-fast size gate (round-12 verdict #3 — behavior at
    # driver scale unchanged, but the input path now runs through
    # the guard) ---
    "bm25_index_serve", "bm25_index_delta_serve",
    "dedup_simhash", "dedup_embedding_cosine",
    # --- (b) rows-only slots for the oracle-less sketches (round-12
    # verdict #2): Misra-Gries merge is partition-order-dependent and
    # t-digest/HLL++ state is engine-specific, so no hash oracle can
    # exist — both are bounds-tested against exact answers in
    # tests/test_approx.py; the driver row pins rows/schema ---
    "agg_approx_events", "agg_heavyhitters_events",
    # --- (c) the r7-latest refresh tranche: all 17 rows whose newest
    # green is round 7 — the complete cohort, one-for-one as PLANS.md
    # round-13 lead #1 asks ---
    "having_large_orders", "join_asof_last_purchase",
    "multimodal_resize_stats", "q13_order_distribution",
    "q3_top_unshipped", "q5_regional_revenue",
    "sample_bernoulli_seeded", "sample_temperature_lang",
    "scalar_subquery_outliers", "text_gopher_rules",
    "text_langid_confusion", "text_token_bpeish", "text_token_stats",
    "text_top_bigrams", "tfidf_top_terms", "window_running_total",
    "window_topk_per_customer",
    # --- (d) family representatives for capabilities with no organic
    # tranche member this round, each pointed at the family's STALEST
    # remaining green so the rep slot doubles as a refresh
    # (tests/test_registry_order.py pins the mapping) ---
    "knn_brute_cosine",        # knn (r9 — family's stalest)
    "knn_ivfpq_adc",           # ann-index (r10 — family's stalest)
    "ann_recall_eval",         # ann-eval (sole member)
    "graph_triangle_count",    # graph (r9 — family's stalest)
    "corpus_shard_rendezvous", # warehouse (r9 — family's stalest)
    "training_mix_pipeline",   # capstone (r9 — family's stalest)
    "stream_sliding_avg",      # streaming (r9 — family's stalest)
    # --- (e) 20 slots into the 36-row r8 cohort (stalest-next after
    # (c); picked for capability spread — log, contamination,
    # tokenizers, near-dup lifecycle, events, classifier train, and
    # dedup_prefix_filter_jaccard doubly so: it is also this round's
    # median re-adjudication target) ---
    "agg_filter_reason", "benchmark_contamination",
    "bpe_encode_corpus", "contamination_spans", "corpus_quality_gate",
    "corpus_source_overlap_neardup", "decontam_bloom_prescreen",
    "decontam_filter_corpus", "dedup_cdc_chunks", "dedup_lines_corpus",
    "dedup_minhash_lsh", "dedup_minhash_index_serve",
    "dedup_prefix_filter_jaccard", "events_changepoint_cusum",
    "events_dau_wau", "q7_volume_shipping", "quality_classifier_train",
    "text_kneser_ney_lm", "unigram_tokenize_corpus",
    "wordpiece_train_merges",
]
# agg_approx_events / agg_heavyhitters_events are sketch-only (no
# oracle by construction — Misra-Gries merge is partition-order-
# dependent; engine-specific t-digest/HLL++ state) and held ROWS-ONLY
# checked slots in round 13 — the driver pinned rows/schema once;
# round 14 returns their slots to oracled queries (r13 verdict #6) and
# tests/test_approx.py keeps pinning the error bounds every run.
# agg_countmin_events WAS in this club until round 7, when its
# registers were hand-rolled over md5 buckets and ORACLED — it
# rotates through checked slots like any other query.
_CHECKED_FIRST = _CHECKED_FIRST_R14


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
