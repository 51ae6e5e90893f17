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
# Round 8 rotation: after round 7 the r1-r7 union covers 210 of 211
# then-registered queries with every latest row green (the one without
# a row is the permanently-no-oracle Misra-Gries). Round 8's window is
# dominated by MODIFIED code: the textops.bind O(words²) sweep changed
# the plan of the entire shingle/contamination/tokenizer/text-census
# surface, and the classifier re-pin (QC_ROUNDS=8, lr=1/2) changed the
# VALUES of the trained-weights family — all of it re-driven in (b).
# (a) holds the round-8 additions (grown to 14 by the closing block),
# (c) shrank to the five pinned family reps as additions displaced
# refreshes, (d) holds family coverage. Everything rotated out keeps its r4-r7
# green row, is unchanged since, and stays continuously covered by the
# full-surface pytest oracle run (tests/test_oracle_parity.py runs
# every oracled query every time).
_CHECKED_FIRST = [
    # --- (a) round-8 additions (16): the unigram-LM tokenizer (full
    # cross-engine Viterbi-EM replay — BPE's taxonomy sibling), the
    # n-gram saturation curve (dedup-ROI diagnostic), CDC chunk
    # dedup (content-defined chunking, the storage-class granularity
    # between whole-doc exact dedup and n-gram spans), the WordPiece
    # tokenizer pair (merge table + greedy longest-match encode —
    # the THIRD tokenizer family, normalized-score argmax replayed
    # cross-engine), PMI collocations (integer-lift ranked), and the
    # k-anonymity audit (privacy face of the DQ gate), plus RAKE and
    # CUSUM below ---
    "unigram_tokenize_corpus", "corpus_ngram_saturation", "dedup_cdc_chunks",
    "wordpiece_train_merges", "wordpiece_encode_corpus",
    "text_collocations_pmi", "dq_k_anonymity",
    # (a, cont.) RAKE keyword extraction (phrase-level keyword signal
    # beside tf-idf and PMI), the CUSUM changepoint detector
    # (prefix-sum/running-min identity distributes Page's recursion),
    # the interpolated Kneser-Ney bigram LM (the smoothing-taxonomy
    # sibling of the add-one bigram LM — P stays one integer ratio so
    # nll is a single cross-engine ln), and the Benford first-digit
    # audit (fraud/synthetic-amount screen; digits read from exact
    # cents-integer strings, never float log10)
    "text_keyword_rake", "events_changepoint_cusum",
    "text_kneser_ney_lm", "dq_benford_first_digit",
    # (a, cont.) cross-source exact-overlap matrix (provenance audit;
    # grouped expansion from per-hash source sets — NOTE it returns 0
    # rows at sf0.01 because the synthetic corpus has no cross-source
    # exact dups; semantics carried by tests/test_overlap_readability)
    # and Flesch-Kincaid readability (integer milli-grades map-side),
    # plus the NEAR-dup source matrix (rides the LSH pair stream; 39
    # real cross-source pairs at sf0.01, unlike its exact sibling)
    "corpus_source_overlap", "text_readability_fk",
    "corpus_source_overlap_neardup",
    # (a, cont.) DCT pHash — the frequency-domain perceptual sibling
    # (integer 1/1024 DCT basis hardcoded in both engines) — and the
    # tokenizer-taxonomy capstone (all three replay chains in ONE
    # oracle WITH clause via CTE prefixing)
    "dedup_perceptual_phash_dct", "tokenizer_compare",
    # --- (b) round-8 modified implementations (26): every registered
    # query whose PLAN changed in round 8 — the textops.bind O(words²)
    # sweep rewrote the gram build of the whole shingle/contamination/
    # tokenizer/text-census surface (output identical, plan new), the
    # classifier was re-pinned to QC_ROUNDS=8 at lr=1/2 (weights, and
    # therefore all three consumers, changed VALUES), the novelty scan
    # was restructured, and the serve index moved to the fingerprinted
    # cache path. A green r7 row says nothing about new code. ---
    "quality_classifier_train", "corpus_quality_gate", "quality_gate_serve",
    "holdout_novelty_scan",
    "dedup_ngram_jaccard", "dedup_minhash_lsh",
    # (minhash_estimate_quality yields its slot to the 15th addition:
    # its shingle-build sweep class is covered by dedup_minhash_lsh)
    # (dedup_edit_distance yields its slot to the 16th addition: its
    # verify-side sweep class is covered by dedup_prefix_filter_jaccard)
    "dedup_containment", "dedup_prefix_filter_jaccard",
    "dedup_minhash_incremental", "dedup_minhash_index_serve",
    "dedup_substring_spans", "dedup_excise_spans", "dedup_lines_corpus",
    "benchmark_contamination", "contamination_spans",
    "decontam_filter_corpus", "decontam_bloom_prescreen",
    "text_bigram_lm_score", "bpe_encode_corpus", "pack_chunks_bpe_budget",
    "text_fingerprint_clusters",
    # (text_top_bigrams yields its slot to the 14th addition: its
    # bind-sweep gram-build change is the same code path as
    # text_repetition_scores/text_boilerplate_phrases, which stay)
    "text_repetition_scores", "text_boilerplate_phrases",
    # --- (c) stalest refresh (5 of the 29 remaining r3-latest rows;
    # the 24 left over — transform_chain, ts_validate,
    # dedup_embedding_lsh, domain_mix_weights, embedding_quantize_int8,
    # pack_chunks_budget, pii_scan_documents, rfm_segments,
    # normalize_fields, redact, stream_sliding_avg,
    # text_perplexity_proxy and the rest, displaced by the twelve late
    # round-8 additions (every addition has NO driver row at all,
    # strictly ahead of refreshing a green r3 row) — lead round 9's
    # tranche, which MUST start with stream_sliding_avg (streaming's
    # only candidate slot; its coverage this round rides the two
    # streaming bench heads + the pytest equivalence twins): the five
    # remaining rows are exactly the family representatives the
    # registry-order test pins ---
    "agg_filter_reason", "events_dau_wau", "multimodal_decode_stats",
    "q7_volume_shipping", "sample_domain_balanced",
    # --- (d) family representatives whose families otherwise have no
    # in-window member this round (knn, capstone, warehouse, ann-index,
    # ann-eval, graph — tests/test_registry_order.py pins coverage) ---
    "knn_brute_cosine", "training_mix_pipeline", "corpus_merge_upsert",
    "knn_ivf_grid", "ann_recall_eval", "graph_pagerank_copurchase",
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
