"""operators.spans.excise_spans: semantics (inclusive word-index ends,
overlap union, affected-docs-only) and the apply-step plan contract —
one keyed join, map-side rewrite, no window, no loop join."""

from __future__ import annotations

from k8s_log_etl_spark.operators.spans import excise_spans


def _frames(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g"),
            (2, "x y z"),
            (3, "p q r s"),
        ],
        "doc_id long, text string",
    )
    spans = spark.createDataFrame(
        [
            (1, 1, 3, 3),   # cuts b c d
            (1, 3, 5, 3),   # overlaps: cuts d e f -> union removes b..f
            (3, 0, 3, 4),   # cuts the whole doc
        ],
        "doc_id long, span_start long, span_end_word long, n_grams long",
    )
    return docs, spans


def test_excise_semantics(spark):
    docs, spans = _frames(spark)
    rows = {
        r["doc_id"]: (r["clean_text"], r["n_words_removed"], r["n_spans"])
        for r in excise_spans(docs, spans).collect()
    }
    # overlapping spans remove the UNION of covered indices (inclusive)
    assert rows[1] == ("a g", 5, 2)
    # a span covering everything leaves empty text, not a dropped row
    assert rows[3] == ("", 4, 1)
    # doc 2 has no spans: affected-docs-only contract
    assert set(rows) == {1, 3}


def test_excise_plan_is_one_keyed_join_map_side_apply(spark):
    docs, spans = _frames(spark)
    plan = (
        excise_spans(docs, spans)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # exactly one join (keyed), and the rewrite adds no window or loop
    # join; the only aggregate is the per-doc span collect_list
    n_joins = sum(plan.count(j) for j in
                  ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"))
    assert n_joins == 1, plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "Window" not in plan
