"""dedup_lines_corpus semantics against a hand-written Python model:
fixed 10-word segmentation, cross-document frequency >= 2 marks a line
as boilerplate, rebuild hash covers the surviving lines in order.
Includes the all-lines-removed and short/ragged-tail documents."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from k8s_log_etl_spark.queries.dedup import (
    LINE_DUP_MIN_DOCS,
    LINE_WORDS,
    dedup_lines_corpus,
)

BOILER = " ".join(f"nav{i}" for i in range(LINE_WORDS))  # exactly one line
FOOTER = " ".join(f"foot{i}" for i in range(LINE_WORDS))

DOCS = pd.DataFrame(
    {
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            # boilerplate line + unique body + ragged 3-word tail
            BOILER + " " + " ".join(f"a{i}" for i in range(13)),
            # same boilerplate + different unique body
            BOILER + " " + " ".join(f"b{i}" for i in range(LINE_WORDS)),
            # doc that is NOTHING BUT shared lines -> empty rebuild
            BOILER + " " + FOOTER,
            # footer shared with doc 3
            FOOTER + " " + " ".join(f"c{i}" for i in range(LINE_WORDS)),
            # short doc, no duplicates anywhere
            "lonely words here",
        ],
        "lang": ["en"] * 5,
        "source": ["unit"] * 5,
        "n_chars": [0, 0, 0, 0, 0],
    }
)


def _model():
    """Python reference: same segmentation + threshold + rebuild."""
    lines_by_doc = {}
    for _, r in DOCS.iterrows():
        w = r.text.split()
        lines_by_doc[r.doc_id] = [
            " ".join(w[i : i + LINE_WORDS]) for i in range(0, len(w), LINE_WORDS)
        ]
    df = {}
    for d, lines in lines_by_doc.items():
        for ln in set(lines):
            df[ln] = df.get(ln, 0) + 1
    out = {}
    for d, lines in lines_by_doc.items():
        kept = [ln for ln in lines if df[ln] < LINE_DUP_MIN_DOCS]
        removed = len(lines) - len(kept)
        h = hashlib.md5(" ".join(kept).encode()).hexdigest()
        out[d] = (len(lines), removed, h)
    return out


@pytest.fixture(scope="module")
def lines_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("line_dedup")
    DOCS.to_parquet(d / "documents.parquet", index=False)
    return str(d)


def test_line_dedup_matches_python_model(spark, lines_sf_dir):
    got = {
        r["doc_id"]: (r["n_lines"], r["removed_lines"], r["cleaned_hash"])
        for r in dedup_lines_corpus(spark, lines_sf_dir).collect()
    }
    want = _model()
    assert got == want
    # spot-check the model itself: doc 3 is pure boilerplate
    assert want[3][1] == want[3][0] == 2
    assert want[3][2] == hashlib.md5(b"").hexdigest()
    # doc 5 keeps everything
    assert want[5] == (1, 0, hashlib.md5(b"lonely words here").hexdigest())


def test_line_dedup_no_pair_join(spark, lines_sf_dir):
    plan = (
        dedup_lines_corpus(spark, lines_sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "NestedLoop" not in plan
