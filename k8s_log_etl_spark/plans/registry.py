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
# Round 9 rotation: CORRECTNESS_r08 closed 50/50 green, so every one
# of the 225 oracled queries now holds a green driver row and the
# window's job is (1) re-driving code MODIFIED this round, (2) the
# long-promised r3-latest refresh tranche (the 24 rows displaced by
# round-8's additions — the oldest greens on the books), and (3) new
# additions as they land (an addition with NO driver row outranks
# refreshing any green row). Everything rotated out keeps its r4-r8
# green row, is unchanged since, and stays continuously covered by
# the full-surface pytest oracle run (tests/test_oracle_parity.py
# runs every oracled query every time).
_CHECKED_FIRST = [
    # --- (a) round-9 modified implementations: the three ADVICE fixes
    # (NULL-text guard in the exact source-overlap matrix; DECIMAL-cast
    # cents replacing round(double*100) in the k-anonymity and Benford
    # audits — VALUES may legally shift on half-cent doubles) and the
    # WordPiece de-literal (piece vocabulary now a one-row broadcast
    # map frame, plan changed, in both the standalone encode and the
    # tokenizer capstone) ---
    # --- (a0) round-9 additions: the DOULION triangle estimator (the
    # documented exactness-tradeable path beside the wedge-byte-bound
    # exact count; deterministic md5 coin makes the whole estimate
    # oracle-exact, accuracy band pinned in tests/test_approx.py) ---
    "graph_triangle_estimate",
    # (a0, cont.) keyset pagination — the deep-page alternative to the
    # OFFSET frontier, contract-pinned to no global sort
    "orders_page_keyset",
    # (a0, cont.) BM25 ranked retrieval (the lexical baseline beside
    # the embedding RAG path; integer-exact via the single-ln idf),
    # winnowing fingerprints (MOSS — the LOCAL fingerprint sketch with
    # the shared-run guarantee), rendezvous corpus sharding (minimal-
    # disruption shard growth, the property pinned by test), and
    # CCNet head/middle/tail perplexity buckets
    "text_bm25_retrieval", "text_winnow_fingerprints",
    "corpus_shard_rendezvous", "corpus_ccnet_buckets",
    # (a0, cont.) reciprocal-rank fusion of the BM25 and embedding
    # rankers — the hybrid-search capstone (rank-based, so the ANN
    # swap at scale changes nothing downstream) — and DSIR importance
    # resampling (Xie et al. 2023: hashed-feature target/raw LM log
    # ratios, the modern pretraining data-selection op)
    "retrieval_hybrid_rrf", "select_dsir_importance",
    # --- (a) round-9 modified implementations ---
    "corpus_source_overlap", "dq_k_anonymity", "dq_benford_first_digit",
    "wordpiece_encode_corpus", "tokenizer_compare",
    # (a, cont.) the perceptual rework closing SCALE.md cliff #7: both
    # kernels + both oracles moved to the full-entropy 32x32 decode
    # channel and gained the PHASH_BUCKET_CAP hot-bucket drop — VALUES
    # legally changed (new signatures), so both need fresh rows; the
    # exact triangle count's body was refactored into the helpers the
    # estimator shares (output identical, but modified code gets a row)
    "dedup_perceptual_ahash", "dedup_perceptual_phash_dct",
    "graph_triangle_count",
    # --- (b) the r3-latest refresh tranche (all 24 remaining rows
    # whose newest green is round 3 — displaced twice by addition
    # waves; stream_sliding_avg leads as streaming's only displaced
    # slot) ---
    "stream_sliding_avg",
    "transform_chain", "ts_validate", "normalize_fields", "redact",
    "dedup_embedding_lsh", "domain_mix_weights", "embedding_quantize_int8",
    "pack_chunks_budget", "pii_scan_documents", "rfm_segments",
    "text_perplexity_proxy", "chunk_sliding_windows", "split_train_holdout",
    "events_anomaly_zscore", "events_retention_cohorts", "events_rolling_1h",
    "events_value_histogram", "promo_revenue_share", "q10_returned_items",
    "q19_disjunctive_revenue", "redact_documents",
    "udaf_embedding_norm", "udtf_sentence_split",
    # --- (c) streaming-twin batch faces (round-8 verdict #6): the
    # quantile-sketch read-side recovery and the incremental-ingest
    # near-dup face keep a driver-level signal on the streaming store
    # formats (their streaming twins are pytest-equivalence-pinned) ---
    "events_quantile_sketch", "dedup_incremental_batch",
    # --- (d) family representatives whose families otherwise have no
    # in-window member this round (tests/test_registry_order.py pins
    # coverage; most reps are organic tranche members this round) ---
    "multimodal_decode_stats", "knn_brute_cosine", "training_mix_pipeline",
    "sample_domain_balanced", "corpus_merge_upsert", "knn_ivf_grid",
    "ann_recall_eval", "graph_pagerank_copurchase",
    # (backfill exhausted: round-9 additions/modifications filled
    # every displaced slot; agg_null_semantics and the other r4 rows
    # stay covered by the full pytest oracle sweep and lead round 10's
    # refresh tranche)
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
