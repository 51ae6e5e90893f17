"""The round driver hard-checks only the first 50 registered queries —
pin the ordering so every capability family keeps a hard correctness
signal (round-1 lesson: text/similarity/streaming got zero rows)."""

from __future__ import annotations

from k8s_log_etl_spark.plans.registry import _CHECKED_FIRST, load_all

DRIVER_CAP = 50

# Round-13 rotation: the window is the full r7-latest refresh tranche
# plus 20 stalest-r8 rows (see plans/registry.py), so most reps are
# their family's organic tranche member; families with no organic
# member this round (knn, ann-index, graph, warehouse, capstone,
# streaming) hold explicit slots pointed at their STALEST remaining
# greens (r9/r10) so the rep slot doubles as a refresh (ann-eval is a
# single-member family). Rotated-out greens stay covered by the full
# pytest oracle run.
FAMILY_REPRESENTATIVES = {
    "log": "agg_filter_reason",
    "dedup": "dedup_minhash_lsh",
    "multimodal": "multimodal_resize_stats",
    "knn": "knn_brute_cosine",
    "text": "text_gopher_rules",
    "capstone": "training_mix_pipeline",
    "relational": "q7_volume_shipping",
    "events": "events_dau_wau",
    "llmprep": "bpe_encode_corpus",
    "sampling": "sample_bernoulli_seeded",
    "warehouse": "corpus_shard_rendezvous",
    "ann-index": "knn_ivfpq_adc",
    "ann-eval": "ann_recall_eval",
    "graph": "graph_triangle_count",
    "streaming": "stream_sliding_avg",
    "approx-sketch": "agg_heavyhitters_events",
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
