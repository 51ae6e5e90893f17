"""The round driver hard-checks only the first 50 registered queries —
pin the ordering so every capability family keeps a hard correctness
signal (round-1 lesson: text/similarity/streaming got zero rows)."""

from __future__ import annotations

from k8s_log_etl_spark.plans.registry import _CHECKED_FIRST, load_all

DRIVER_CAP = 50

# Round-9 rotation: the window is dominated by the r3-latest refresh
# tranche (see plans/registry.py), so most reps are their family's
# organic tranche member; families with no organic member this round
# (multimodal, knn, capstone, sampling, warehouse, ann-index,
# ann-eval, graph) hold explicit slots via their reps. Rotated-out
# greens stay covered by the full pytest oracle run.
FAMILY_REPRESENTATIVES = {
    "log": "normalize_fields",
    "dedup": "dedup_embedding_lsh",
    "multimodal": "multimodal_decode_stats",
    "knn": "knn_brute_cosine",
    "text": "text_perplexity_proxy",
    "capstone": "training_mix_pipeline",
    "relational": "rfm_segments",
    "events": "events_anomaly_zscore",
    "llmprep": "pack_chunks_budget",
    "sampling": "sample_domain_balanced",
    "warehouse": "corpus_merge_upsert",
    "ann-index": "knn_ivf_grid",
    "ann-eval": "ann_recall_eval",
    "graph": "graph_pagerank_copurchase",
}


def test_checked_window_is_exactly_the_priority_list():
    names = list(load_all())
    assert len(_CHECKED_FIRST) == DRIVER_CAP
    assert names[:DRIVER_CAP] == _CHECKED_FIRST


def test_priority_names_all_exist():
    specs = load_all()
    missing = [n for n in _CHECKED_FIRST if n not in specs]
    assert not missing, missing


def test_every_family_lands_in_checked_window():
    window = set(list(load_all())[:DRIVER_CAP])
    out = {fam: rep for fam, rep in FAMILY_REPRESENTATIVES.items() if rep not in window}
    assert not out, f"capability families outside the driver's checked window: {out}"


def test_every_query_documented():
    """Every registered query must explain itself: a substantive
    docstring is the contract that lets the plan-audit tables and the
    operator inventory be checked against intent (a bare function is
    unreviewable surface)."""
    from k8s_log_etl_spark.plans.registry import load_all

    for name, spec in load_all().items():
        doc = (spec.fn.__doc__ or "").strip()
        assert len(doc) >= 40, f"{name} lacks a substantive docstring"
