"""retrieval_hybrid_rrf: fused scores must equal the RRF formula over
the two legs' ranks, and the both-systems-beats-either property must
hold (with K=60 and k=5-deep lists, the worst both-lists score
2*1e6//65 = 30768 exceeds the best single-list score 1e6//61 = 16393)."""

from __future__ import annotations

from k8s_log_etl_spark.queries.llmprep import (
    BM25_TOPK,
    RRF_K,
    RRF_SEM_TOPK,
    retrieval_hybrid_rrf,
    text_bm25_retrieval,
)


def test_rrf_fuses_ranks_exactly(spark, sf_dir):
    bm = {
        (r["query_id"], r["doc_id"]): r["rn"]
        for r in text_bm25_retrieval(spark, sf_dir).collect()
    }
    fused = retrieval_hybrid_rrf(spark, sf_dir).collect()
    assert fused, "hybrid retrieval returned no rows at sf0.01"
    floor_single = 1_000_000 // (RRF_K + max(BM25_TOPK, RRF_SEM_TOPK))
    both_min = 2 * (1_000_000 // (RRF_K + BM25_TOPK))
    for r in fused:
        key = (r["query_id"], r["doc_id"])
        score = r["rrf_micro"]
        # every fused score decomposes into at most two RRF terms
        assert score >= floor_single
        bm_term = 1_000_000 // (RRF_K + bm[key]) if key in bm else 0
        sem_term = score - bm_term
        assert sem_term == 0 or 1_000_000 // (RRF_K + RRF_SEM_TOPK) <= sem_term <= 1_000_000 // (RRF_K + 1)
    # robustness: any doc present in BOTH lists outranks any
    # single-list doc — scores separate cleanly
    in_both = [r for r in fused if r["rrf_micro"] >= both_min]
    singles = [r for r in fused if r["rrf_micro"] < both_min]
    if in_both and singles:
        assert min(r["rrf_micro"] for r in in_both) > max(
            r["rrf_micro"] for r in singles
        )
