"""Property tests: merge_upsert and dedup_lines_corpus against
pure-Python models on Hypothesis-generated inputs (examples bounded to
keep JVM round-trips cheap; each example is a full randomized
batch/corpus, not a row)."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from k8s_log_etl_spark.operators.merge import merge_upsert
from k8s_log_etl_spark.queries.dedup import (
    LINE_DUP_MIN_DOCS,
    LINE_WORDS,
    dedup_lines_corpus,
)

KEYS = st.integers(min_value=0, max_value=9)
VALS = st.sampled_from(["a", "b", "c", None])

change_row = st.tuples(KEYS, VALS, st.booleans())


def _merge_model(target, batches):
    state = dict(target)
    audit_last = {}
    for batch in batches:
        seen = {}
        for k, v, is_del in batch:  # one row per key: LAST wins in the
            seen[k] = (v, is_del)   # model; the operator gets deduped input
        audit_last = {}
        for k, (v, is_del) in seen.items():
            if is_del:
                if k in state:
                    del state[k]
                    audit_last[k] = ("deleted", None)
                # unmatched delete: no-op
            else:
                audit_last[k] = ("updated" if k in state else "inserted", v)
                state[k] = v
    return state


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    target=st.dictionaries(KEYS, st.sampled_from(["x", "y"]), max_size=6),
    batches=st.lists(
        st.lists(change_row, min_size=1, max_size=6), min_size=1, max_size=3
    ),
)
def test_merge_fold_matches_dict_model(spark, target, batches):
    state = dict(target)
    for batch in batches:
        # one row per key (last wins), mirroring the streaming sink's
        # within-batch contract
        seen = {}
        for k, v, is_del in batch:
            seen[k] = (v, is_del)
        tdf = spark.createDataFrame(
            [(k, v) for k, v in state.items()] or [(None, None)],
            "k long, v string",
        )
        if not state:
            tdf = tdf.filter("k IS NOT NULL")
        cdf = spark.createDataFrame(
            [(k, v, d) for k, (v, d) in seen.items()],
            "k long, v string, is_delete boolean",
        )
        out = merge_upsert(tdf, cdf, ["k"]).collect()
        # apply the model step
        for k, (v, is_del) in seen.items():
            if is_del:
                state.pop(k, None)
            else:
                state[k] = v
        nxt = {r["k"]: r["v"] for r in out if r["action"] != "deleted"}
        assert nxt == state


WORDS = ["w1", "w2", "w3"]


def _lines_model(docs):
    lines_by_doc = {
        i: [
            " ".join(ws[j : j + LINE_WORDS])
            for j in range(0, len(ws), LINE_WORDS)
        ]
        for i, ws in enumerate(docs)
    }
    df = {}
    for i, lines in lines_by_doc.items():
        for ln in set(lines):
            df[ln] = df.get(ln, 0) + 1
    out = {}
    for i, lines in lines_by_doc.items():
        kept = [ln for ln in lines if df[ln] < LINE_DUP_MIN_DOCS]
        out[i] = (
            len(lines),
            len(lines) - len(kept),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(WORDS), min_size=1, max_size=2 * LINE_WORDS + 3),
        min_size=1,
        max_size=8,
    )
)
def test_line_dedup_matches_model_on_random_corpora(spark, tmp_path_factory, docs):
    import pandas as pd

    d = tmp_path_factory.mktemp("prop_lines")
    pd.DataFrame(
        {
            "doc_id": range(len(docs)),
            "text": [" ".join(ws) for ws in docs],
            "lang": ["en"] * len(docs),
            "source": ["unit"] * len(docs),
            "n_chars": [0] * len(docs),
        }
    ).to_parquet(d / "documents.parquet", index=False)
    got = {
        r["doc_id"]: (r["n_lines"], r["removed_lines"], r["cleaned_hash"])
        for r in dedup_lines_corpus(spark, str(d)).collect()
    }
    assert got == _lines_model(docs)
