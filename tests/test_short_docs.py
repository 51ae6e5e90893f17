"""Regression: documents shorter than the n-gram width must produce an
EMPTY shingle set, not crash.

Spark's sequence(start, stop) steps DOWNWARD when start > stop —
sequence(0, -1) is [0, -1], not [] — so the naive n-gram index range
made w[i+2] throw INVALID_ARRAY_INDEX under Spark 4's default ANSI mode
for any 1-2 word document (advisor finding, round 2). All fixture docs
are long, which masked it. The DuckDB oracles' range(greatest(...,0))
is empty for short docs; functions.textops.ngram_indices now matches.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from conftest import run_surface
from k8s_log_etl_spark.functions.textops import ngram_indices
from k8s_log_etl_spark.plans.registry import load_all

SHORT_DOCS = pd.DataFrame(
    {
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": [
            "one",
            "two words",
            "",
            "   ",
            "exactly three words",
            # one doc long enough to clear corpus_clean_pipeline's
            # MIN_TOKENS quality gate
            " ".join(f"tok{i}" for i in range(25)),
        ],
        "lang": ["en"] * 6,
        "source": ["unit"] * 6,
        "n_chars": [3, 9, 0, 3, 19, 150],
    }
)

# Every registered query that shingles/tokenizes the documents table.
NGRAM_QUERIES = [
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "text_fingerprint_clusters",
    "text_top_bigrams",
    "corpus_clean_pipeline",
    # round-4c tokenizing additions
    "dedup_substring_spans",
    "rag_retrieval_pipeline",
    # round-6 tokenizing additions
    "dedup_lines_corpus",
    "curriculum_difficulty_bins",
    "text_bigram_lm_score",
    # round-7 tokenizing/labeling additions — the _gopher_flags ANSI
    # divide-by-zero on 0-word docs (found by exactly this corpus) is
    # pinned by these entries
    "text_gopher_rules",
    "quality_score_calibration",
    "quality_classifier_train",
    "corpus_quality_gate",
    "holdout_novelty_scan",
    "sample_temperature_lang",
]


@pytest.fixture(scope="module")
def short_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("short_docs")
    SHORT_DOCS.to_parquet(d / "documents.parquet", index=False)
    return str(d)


def test_ngram_indices_short_arrays(spark):
    df = spark.createDataFrame(
        [("a b c d",), ("a b",), ("a",), ("",)], "text string"
    )
    w = F.split(F.col("text"), r"\s+")
    out = df.select(F.size(ngram_indices(w, 3)).alias("n")).collect()
    assert [r["n"] for r in out] == [2, 0, 0, 0]


@pytest.mark.parametrize("name", NGRAM_QUERIES)
def test_ngram_queries_survive_short_docs(spark, short_sf_dir, name):
    spec = load_all()[name]
    rows = spec.fn(spark, short_sf_dir).collect()  # must not raise
    if spec.oracle:
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{short_sf_dir}/documents.parquet')"
        )
        d_rows = con.execute(spec.oracle).fetchall()
        con.close()
        assert len(rows) == len(d_rows), (name, rows, d_rows)


def test_substring_spans_semantics_on_crafted_corpus(spark, tmp_path):
    """Two verbatim-identical 12-word documents must each yield exactly
    ONE maximal span covering every gram position (grams 0..7 for 12
    words at k=5, last covered word 11); a disjoint third document
    yields none. Pins the islands merge and the cross-doc (not
    intra-doc) duplication semantics on a corpus where the answer is
    computable by hand."""
    import pandas as pd

    from k8s_log_etl_spark.queries.dedup import dedup_substring_spans

    dup_text = " ".join(f"w{i}" for i in range(12))
    other = " ".join(f"z{i}" for i in range(12))
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [dup_text, dup_text, other],
            "lang": ["en"] * 3,
            "source": ["unit"] * 3,
            "n_chars": [len(dup_text), len(dup_text), len(other)],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)

    rows = dedup_substring_spans(spark, str(tmp_path)).collect()
    got = {(r.doc_id, r.span_start, r.span_end_word, r.n_grams) for r in rows}
    assert got == {(1, 0, 11, 8), (2, 0, 11, 8)}


def test_every_query_survives_pathological_documents(spark, tmp_path):
    """Full-surface robustness sweep (round-7 discipline, after the
    _gopher_flags ANSI divide-by-zero finding): EVERY registered query
    must run to completion when the documents table is pathological
    (empty/whitespace/1-2 word docs) and all other tables are normal.
    Slow-but-thorough: one collect per query on tiny data."""
    import os

    import pandas as pd

    from k8s_log_etl_spark.plans.registry import load_all

    d = str(tmp_path / "patho")
    os.makedirs(d)
    SHORT_DOCS.to_parquet(os.path.join(d, "documents.parquet"), index=False)
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings",
    ]:
        os.symlink(
            f"/root/testdata/sf0.001/{t}.parquet", os.path.join(d, f"{t}.parquet")
        )
    specs = load_all()
    res = run_surface(specs, lambda n: specs[n].fn(spark, d).collect())
    fails = [
        (n, str(e).split("\n")[0][:120]) for n, (ok, e) in res.items() if not ok
    ]
    assert not fails, fails


def test_every_query_survives_empty_tables(spark, tmp_path):
    """Empty-partition/day robustness (round-7 sweep): with EMPTY
    documents/events/embeddings tables (schema-correct, zero rows),
    every registered query must either complete (empty or degenerate
    result) or raise the documented explicit ValueError — never a
    cryptic KeyError/arithmetic crash. The quantizer-training family
    (k-means / PQ and their consumers) is the only surface allowed to
    refuse: training on an empty corpus is undefined by contract."""
    import os

    import duckdb

    from k8s_log_etl_spark.plans.registry import load_all

    d = str(tmp_path / "empty")
    os.makedirs(d)
    con = duckdb.connect()
    for t in ["documents", "events", "embeddings"]:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('/root/testdata/sf0.001/{t}.parquet')"
            f" LIMIT 0) TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]:
        os.symlink(
            f"/root/testdata/sf0.001/{t}.parquet", os.path.join(d, f"{t}.parquet")
        )
    specs = load_all()
    res = run_surface(specs, lambda n: specs[n].fn(spark, d).collect())
    unexpected = []
    refused = []
    for n, (ok, e) in res.items():
        if ok:
            continue
        if isinstance(e, ValueError) and "non-empty embeddings corpus" in str(e):
            refused.append(n)
        else:
            unexpected.append((n, str(e).split("\n")[0][:120]))
    assert not unexpected, unexpected
    # The expected refusal set is REGISTRY METADATA (round-10 verdict
    # #6): every query declares its empty-input behavior at
    # registration via refuses_empty=True. The two-sided equality
    # means a new query can't land refusing without declaring it
    # (shows up in `refused`, missing from `declared`) NOR declare a
    # refusal it doesn't enforce (in `declared`, completes anyway).
    declared = {n for n, s in load_all().items() if s.refuses_empty}
    assert set(refused) == declared, (sorted(refused), sorted(declared))


def test_every_query_survives_null_text(spark, tmp_path):
    """NULL-text robustness (round-7 sweep #3): real corpora carry NULL
    text fields. The multimodal decode kernels previously crashed the
    Python worker on the resulting NULL payloads — the decode gate now
    DROPS undecodable (NULL) payloads in both engines
    (operators/multimodal._drop_null_payloads; oracles carry
    `WHERE text IS NOT NULL`). Every registered query must run to
    completion (quantizer training refuses only on EMPTY corpora — two
    non-null docs remain here, so it trains)."""
    import os

    import pandas as pd

    from k8s_log_etl_spark.plans.registry import load_all

    d = str(tmp_path / "nulltext")
    os.makedirs(d)
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                None,
                "two words here we go fine and long enough to pass gates maybe",
                None,
                "another normal document with plenty of words to work with today",
            ],
            "lang": ["en"] * 4,
            "source": ["unit"] * 4,
            "n_chars": [0, 62, 0, 64],
        }
    ).to_parquet(os.path.join(d, "documents.parquet"), index=False)
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings",
    ]:
        os.symlink(
            f"/root/testdata/sf0.001/{t}.parquet", os.path.join(d, f"{t}.parquet")
        )
    specs = load_all()
    res = run_surface(specs, lambda n: specs[n].fn(spark, d).collect())
    fails = [
        (n, str(e).split("\n")[0][:120]) for n, (ok, e) in res.items() if not ok
    ]
    assert not fails, fails


UNICODE_TEXTS = [
    "café naïve résumé touché über straße garçon fiancé more words to pass the gates today okay fine",
    "日本語 テスト 中文 测试 한국어 테스트 mixed with english words for good measure here now",
    "emoji \U0001f600 \U0001f680 \U0001f409 and zwj \U0001f468‍\U0001f469‍\U0001f467 sequences plus skin tone \U0001f44d\U0001f3fd markers in text",
    "regex specials (a|b) [c-d] {1,2} a+ b* c? ^start end$ back\\slash dot. and tab\there plus \"quotes\" 'single' `tick`",
    "a" * 500 + " single very long word then normal words follow here to make the document long enough for most gates",
    "rtl مرحبا بالعالم hebrew שלום עולם mixed directionality words and more filler to pass gates",
    "combining áéíóú vs precomposed áéíóú normalization divergence probe with extra words for length today",
]


def test_every_query_survives_unicode_and_metachars(spark, tmp_path):
    """Unicode/metachar robustness (round-7 sweep #4): emoji + ZWJ,
    CJK, RTL, combining accents, regex metacharacters, 500-char words.
    Every registered query must complete, and every oracled
    documents-tokenizing query must agree with DuckDB on row count
    (the full value-hash agreement across all 208 oracles on this
    corpus was verified by a drive_entry run — this pins the cheap
    invariant per-commit; the one real finding, the single-class-AUC
    division, is guarded in both engines)."""
    import os

    import duckdb
    import pandas as pd

    from k8s_log_etl_spark.plans.registry import load_all

    d = str(tmp_path / "unicode")
    os.makedirs(d)
    texts = UNICODE_TEXTS * 10
    df = pd.DataFrame(
        {
            "doc_id": list(range(len(texts))),
            "text": texts,
            "lang": (["en", "zh", "en", "en", "en", "ar", "fr"] * 10),
            "source": [f"s{i % 4}" for i in range(len(texts))],
        }
    )
    df["n_chars"] = df["text"].str.len()
    df.to_parquet(os.path.join(d, "documents.parquet"), index=False)
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings",
    ]:
        os.symlink(
            f"/root/testdata/sf0.001/{t}.parquet", os.path.join(d, f"{t}.parquet")
        )
    specs = load_all()
    # Spark side concurrently (run_surface); the DuckDB row-count
    # cross-checks stay on this thread afterwards (one connection is
    # not thread-safe) — same queries, same assertions.
    res = run_surface(specs, lambda n: specs[n].fn(spark, d).collect())
    fails = [
        (n, str(e).split("\n")[0][:120]) for n, (ok, e) in res.items() if not ok
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet')"
    )
    for n, spec in specs.items():
        if spec.oracle and n in NGRAM_QUERIES and res[n][0]:
            o = con.execute(spec.oracle).fetchall()
            assert len(res[n][1]) == len(o), (n, len(res[n][1]), len(o))
    con.close()
    assert not fails, fails


def test_every_query_survives_pathological_vectors_and_null_event_fields(
    spark, tmp_path
):
    """Pathological-vector robustness (round-7 sweep #5): a NULL
    embedding, a zero-norm vector (cosine would divide by zero under
    ANSI), and NULL event ts/value/props fields. The vector INGEST
    validity contract (similarity.load_vectors) drops invalid vectors
    before any similarity math, quantizer init re-keys by rank so a
    dropped vector below K leaves no hole, and PQ sizes its distance
    matrices by the actual codebook. Every registered query must run
    to completion."""
    import os

    import duckdb

    from k8s_log_etl_spark.plans.registry import load_all

    d = str(tmp_path / "vecs")
    os.makedirs(d)
    con = duckdb.connect()
    con.execute(
        f"""
COPY (
  SELECT event_id, user_id,
         CASE WHEN event_id % 13 = 0 THEN NULL ELSE ts END AS ts,
         event_type,
         CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value,
         CASE WHEN event_id % 11 = 0 THEN NULL ELSE props END AS props
  FROM read_parquet('/root/testdata/sf0.001/events.parquet')
) TO '{d}/events.parquet' (FORMAT PARQUET)
"""
    )
    con.execute(
        f"""
COPY (
  SELECT vec_id,
         CASE WHEN vec_id = 3 THEN NULL
              WHEN vec_id = 5 THEN list_transform(embedding, x -> CAST(0.0 AS FLOAT))
              ELSE embedding END AS embedding,
         * EXCLUDE (vec_id, embedding)
  FROM read_parquet('/root/testdata/sf0.001/embeddings.parquet')
) TO '{d}/embeddings.parquet' (FORMAT PARQUET)
"""
    )
    con.close()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents",
    ]:
        os.symlink(
            f"/root/testdata/sf0.001/{t}.parquet", os.path.join(d, f"{t}.parquet")
        )
    specs = load_all()
    res = run_surface(specs, lambda n: specs[n].fn(spark, d).collect())
    fails = [
        (n, str(e).split("\n")[0][:120]) for n, (ok, e) in res.items() if not ok
    ]
    assert not fails, fails


def test_every_query_survives_duplicate_ids(spark, tmp_path):
    """Duplicate-id robustness (round-7 sweep #6): re-ingestion
    produces verbatim duplicate rows and conflicting same-id variants;
    duplicated vec_ids below K previously inflated the quantizer init
    past k_cells (KeyError in the centroid rebuild). Init now dedupes
    by id and caps at K; every registered query must complete."""
    import os

    import duckdb

    from k8s_log_etl_spark.plans.registry import load_all

    d = str(tmp_path / "dups")
    os.makedirs(d)
    con = duckdb.connect()
    con.execute(
        f"""
COPY (
  SELECT * FROM read_parquet('/root/testdata/sf0.001/documents.parquet')
  UNION ALL
  SELECT * FROM read_parquet('/root/testdata/sf0.001/documents.parquet')
  WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id, text || ' conflicting re-ingested variant', lang, source,
         n_chars + 30 AS n_chars
  FROM read_parquet('/root/testdata/sf0.001/documents.parquet')
  WHERE doc_id % 17 = 0
) TO '{d}/documents.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""
COPY (
  SELECT * FROM read_parquet('/root/testdata/sf0.001/embeddings.parquet')
  UNION ALL
  SELECT * FROM read_parquet('/root/testdata/sf0.001/embeddings.parquet')
  WHERE vec_id % 5 = 0
) TO '{d}/embeddings.parquet' (FORMAT PARQUET)"""
    )
    con.close()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events",
    ]:
        os.symlink(
            f"/root/testdata/sf0.001/{t}.parquet", os.path.join(d, f"{t}.parquet")
        )
    specs = load_all()
    res = run_surface(specs, lambda n: specs[n].fn(spark, d).collect())
    fails = [
        (n, str(e).split("\n")[0][:120]) for n, (ok, e) in res.items() if not ok
    ]
    assert not fails, fails
