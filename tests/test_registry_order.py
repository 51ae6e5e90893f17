"""The round driver hard-checks only the first 50 registered queries —
pin the ordering so every capability family keeps a hard correctness
signal (round-1 lesson: text/similarity/streaming got zero rows)."""

from __future__ import annotations

from k8s_log_etl_spark.plans.registry import _CHECKED_FIRST, load_all

DRIVER_CAP = 50

# Round-12 rotation: the window is the full r6-latest refresh tranche
# plus 18 stalest-r7 rows (see plans/registry.py), so most reps are
# their family's organic tranche member; families with no organic
# member this round (ann-index, ann-eval, graph) hold explicit slots
# pointed at their STALEST remaining greens (r9/r10) so the rep slot
# doubles as a refresh. Rotated-out greens stay covered by the full
# pytest oracle run.
FAMILY_REPRESENTATIVES = {
    "log": "agg_by_service",
    "dedup": "dedup_exact",
    "multimodal": "multimodal_frame_sample",
    "knn": "knn_hard_negatives",
    "text": "text_quality_score",
    "capstone": "pipeline_events_report",
    "relational": "q1_pricing_summary",
    "events": "events_attribution_last_touch",
    "llmprep": "curriculum_difficulty_bins",
    "sampling": "sample_stratified_topk",
    "warehouse": "layout_zorder_stats",
    "ann-index": "knn_ivf_grid",
    "ann-eval": "ann_recall_eval",
    "graph": "graph_triangle_estimate",
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
