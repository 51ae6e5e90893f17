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


def test_excise_randomized_batch_against_python_model(spark):
    """Property-style check in ONE Spark round trip: 40 seeded random
    documents with random (possibly overlapping, possibly
    whole-doc) span sets — the operator's output must equal a plain
    Python model: keep words whose index no span covers, join with
    single spaces, count removals as |union of covered indices|."""
    import random

    rng = random.Random(0xC0FFEE)
    docs, spans, expected = [], [], {}
    for doc_id in range(40):
        n = rng.randint(1, 30)
        words = [f"w{doc_id}_{i}" for i in range(n)]
        docs.append((doc_id, " ".join(words)))
        n_spans = rng.randint(0, 4)
        covered = set()
        for _ in range(n_spans):
            s = rng.randint(0, n - 1)
            e = min(n - 1, s + rng.randint(0, 6))
            spans.append((doc_id, s, e, e - s + 1))
            covered |= set(range(s, e + 1))
        if n_spans:
            kept = [w for i, w in enumerate(words) if i not in covered]
            expected[doc_id] = (" ".join(kept), len(covered), n_spans)
    assert expected, "seed produced no spanned docs"

    d = spark.createDataFrame(docs, "doc_id long, text string")
    sp = spark.createDataFrame(
        spans, "doc_id long, span_start long, span_end_word long, n_grams long"
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_words_removed"], r["n_spans"])
        for r in excise_spans(d, sp).collect()
    }
    assert got == expected
