"""The round driver hard-checks only the first 50 registered queries —
pin the ordering so every capability family keeps a hard correctness
signal (round-1 lesson: text/similarity/streaming got zero rows)."""

from __future__ import annotations

from k8s_log_etl_spark.plans.registry import _CHECKED_FIRST, load_all

DRIVER_CAP = 50

# Round-14 rotation: the window is the 16 leftover r8 rows + this
# round's structurally modified implementations + stale-r9 refreshes
# (see plans/registry.py). Every capability family keeps a hard driver
# signal; reps with no organic member point at stale greens so the
# slot doubles as a refresh. approx-sketch's rep is the ORACLED
# countmin sketch — the two bounds-only sketches left the driver
# window per the r13 verdict (#6) and stay pinned by test_approx.py.
FAMILY_REPRESENTATIVES = {
    "log": "transform_chain",
    "dedup": "dedup_minhash_lsh",
    "multimodal": "crossmodal_retrieval",
    "knn": "knn_brute_cosine",
    "text": "text_repetition_scores",
    "capstone": "corpus_clean_pipeline",
    "relational": "parts_copurchased",
    "events": "events_rolling_1h",
    "llmprep": "pack_chunks_bpe_budget",
    "sampling": "sample_domain_balanced",
    "warehouse": "join_scd2_dimension",
    "ann-index": "knn_ivfpq_adc",
    "ann-eval": "ann_recall_eval",
    "graph": "graph_triangle_count",
    "streaming": "events_gap_fill_locf",
    "approx-sketch": "agg_countmin_events",
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
