"""Property-style invariant tests for the round-3 training-data-prep
operators — pure-Python models of the documented semantics checked
against the Spark implementations on synthetic frames (Hypothesis
generates the document shapes; Spark runs once per generated corpus
batch, so examples are bundled to keep JVM round-trips bounded).
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from k8s_log_etl_spark.queries import llmprep

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]


def _doc_frame(spark, docs):
    return spark.createDataFrame(
        [(i, " ".join(words), "en", "src", len(" ".join(words))) for i, words in enumerate(docs)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(
        st.lists(st.sampled_from(WORDS), min_size=0, max_size=120),
        min_size=1,
        max_size=12,
    )
)
def test_chunk_windows_cover_every_token_exactly_once_per_window_set(spark, docs):
    """Window starts are 0, stride, 2*stride, ...; the union of
    [start, start+len) intervals covers [0, n) with the documented
    overlap; the last window is truncated, never empty."""
    d = _doc_frame(spark, docs)
    sized = d.select("doc_id", F.size(llmprep._words()).alias("n_tokens")).filter(
        F.col("n_tokens") > 0
    )
    starts = F.sequence(F.lit(0), F.col("n_tokens") - 1, F.lit(llmprep.CHUNK_STRIDE))
    rows = (
        sized.select("doc_id", F.explode(starts).alias("i"), "n_tokens")
        .select(
            "doc_id",
            F.col("i").cast("bigint").alias("win_start"),
            F.least(F.lit(llmprep.CHUNK_WINDOW), F.col("n_tokens") - F.col("i"))
            .cast("bigint")
            .alias("win_len"),
        )
        .collect()
    )
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["win_start"], r["win_len"]))
    for i, words in enumerate(docs):
        n = len(words)
        got = sorted(by_doc.get(i, []))
        if n == 0:
            assert got == []
            continue
        expect = [
            (s, min(llmprep.CHUNK_WINDOW, n - s))
            for s in range(0, n, llmprep.CHUNK_STRIDE)
        ]
        assert got == expect
        assert all(ln > 0 for _, ln in got)
        covered = set()
        for s, ln in got:
            covered.update(range(s, s + ln))
        assert covered == set(range(n))


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(n_docs=st.integers(min_value=1, max_value=200))
def test_split_assignment_is_a_partition(spark, n_docs):
    """Every doc lands in exactly one split, and the assignment is a
    pure function of doc_id (stable under re-ingestion: computing it
    twice, or on a shuffled frame, gives the same mapping)."""
    d = _doc_frame(spark, [["alpha"]] * n_docs)
    from k8s_log_etl_spark.functions import xengine as X

    bucket = X.md5_long(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(bucket < llmprep.TRAIN_PCT, "train")
        .when(bucket < llmprep.VAL_PCT, "val")
        .otherwise("test")
    )
    a = {r["doc_id"]: r["s"] for r in d.select("doc_id", split.alias("s")).collect()}
    b = {
        r["doc_id"]: r["s"]
        for r in d.orderBy(F.desc("doc_id")).select("doc_id", split.alias("s")).collect()
    }
    assert a == b
    assert set(a) == set(range(n_docs))
    assert set(a.values()) <= {"train", "val", "test"}


def test_perplexity_matches_pure_python_model(spark):
    """avg_nll agrees with an independent Python unigram model on a
    small corpus (exercises the integer micro-nat quantization)."""
    docs = [
        ["alpha", "alpha", "beta"],
        ["beta", "gamma"],
        ["alpha", "delta", "delta", "delta"],
    ]
    d = _doc_frame(spark, docs)

    from collections import Counter

    toks = [w for ws in docs for w in ws]
    vocab = Counter(toks)
    n, v = sum(vocab.values()), len(vocab)

    def nll_q(word: int) -> int:
        p_inv = (n + v) / (vocab[word] + 1)
        return round(math.log(p_inv) * llmprep.NLL_QUANT)

    def round6_half_up(x: float) -> float:
        # Spark's round() and DuckDB's round() are both half-up on the
        # shortest decimal repr; Python's round() is banker's on the
        # binary double — mirror the engines, not Python.
        from decimal import ROUND_HALF_UP, Decimal

        return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))

    expect = {
        i: round6_half_up(sum(nll_q(w) for w in ws) / len(ws) / llmprep.NLL_QUANT)
        for i, ws in enumerate(docs)
    }

    toks_df = d.select("doc_id", F.explode(llmprep._words()).alias("raw")).select(
        "doc_id", F.lower(F.col("raw")).alias("term")
    )
    vocab_df = toks_df.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    tot = vocab_df.agg(F.sum("c").alias("n"), F.count(F.lit(1)).alias("v"))
    scored = vocab_df.crossJoin(F.broadcast(tot)).select(
        "term",
        F.round(
            F.log((F.col("n") + F.col("v")) / (F.col("c") + F.lit(1.0)))
            * llmprep.NLL_QUANT
        )
        .cast("bigint")
        .alias("nll_q"),
    )
    got = {
        r["doc_id"]: r["avg_nll"]
        for r in toks_df.join(scored, "term")
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("nll_q") / F.count(F.lit(1)) / llmprep.NLL_QUANT, 6).alias(
                "avg_nll"
            )
        )
        .collect()
    }
    assert got == expect


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    vals=st.lists(
        st.floats(min_value=-50.0, max_value=700.0, allow_nan=False, width=32),
        min_size=1,
        max_size=60,
    ),
    split=st.integers(min_value=0, max_value=60),
)
def test_quantile_sketch_bound_on_arbitrary_distributions(spark, vals, split):
    """For ANY value distribution — including values below 0 and above
    the sketch domain, which clamp into the edge bins — each estimate
    must land in the same bin as the ceil(p*n)-th order statistic
    (clamped into the domain), i.e. within one bin width of the
    inverse-CDF quantile, and n_events must be exact. Two event types
    split the values to exercise the per-group partitioning."""
    import math

    from k8s_log_etl_spark.queries.streaming_batch import (
        QSK_BINS,
        QSK_VMIN,
        QSK_W,
        quantile_sketch_frame,
    )

    split = min(split, len(vals))
    rows = [("a", float(v)) for v in vals[:split]] + [
        ("b", float(v)) for v in vals[split:]
    ]
    groups: dict[str, list[float]] = {}
    for t, v in rows:
        groups.setdefault(t, []).append(v)

    df = spark.createDataFrame(rows, "event_type string, value double")
    got = {r.event_type: r for r in quantile_sketch_frame(df).collect()}
    assert set(got) == {t for t, vs in groups.items() if vs}

    def clamped_bin(v: float) -> int:
        return min(max(int(math.floor((v - QSK_VMIN) / QSK_W)), 0), QSK_BINS - 1)

    for t, vs in groups.items():
        if not vs:
            continue
        v_sorted = sorted(vs)
        n = len(v_sorted)
        r = got[t]
        assert r.n_events == n
        for ep, p in ((r.est_p50, 0.5), (r.est_p90, 0.9), (r.est_p99, 0.99)):
            b = clamped_bin(v_sorted[math.ceil(p * n) - 1])
            lo, hi = QSK_VMIN + QSK_W * b, QSK_VMIN + QSK_W * (b + 1)
            assert lo <= ep <= hi, (t, p, ep, lo, hi)


def _py_bpe(texts: list[str], rounds: int):
    """Pure-Python reference for bpe_encode_corpus: Sennrich-style
    training (most frequent adjacent pair, ties (weight DESC, pair
    ASC)) with greedy leftmost non-overlapping merge application."""
    from collections import Counter

    vocab: Counter = Counter()
    for text in texts:
        for w in text.strip().split():
            if w:
                vocab[w.lower()] += 1
    seqs = {term: list(term) for term in vocab}
    for _ in range(rounds):
        pc: Counter = Counter()
        for term, syms in seqs.items():
            f = vocab[term]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        (a, b), _w = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        for term, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[term] = out
    return vocab, seqs


def test_bpe_encode_matches_python_model(spark, tmp_path):
    """bpe_encode_corpus == the pure-Python greedy BPE on a corpus
    built to stress exactly the cases where a string-replace-based
    merge application can silently diverge from greedy leftmost
    semantics: runs of a self-pair ('aaaa' -> [aa, aa], never
    [a, aa, a]), adjacent repeats of a two-symbol pair ('ababab' ->
    both sites merged in one round, not every other one), and merges
    whose result is a prefix of a later candidate."""
    texts = [
        "aaaa aaaa aaa aa a",
        "ababab abab ab ab ab",
        "banana bananana ban and bandana",
        "aaaa ababab banana banana",
        "internationalization nation national",
    ]
    rows = [
        (i, t, "en", "src", len(t)) for i, t in enumerate(texts)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    got = llmprep.bpe_encode_corpus(spark, str(tmp_path)).collect()

    vocab, seqs = _py_bpe(texts, llmprep.BPE_MERGE_ROUNDS)
    corpus_tokens = sum(f * len(seqs[t]) for t, f in vocab.items())
    expect = sorted(
        (
            (t, " ".join(seqs[t]), len(seqs[t]), f, corpus_tokens)
            for t, f in vocab.items()
        ),
        key=lambda r: (-r[3], r[0]),
    )[: llmprep.BPE_ENCODE_TOP]
    assert [
        (r["term"], r["token_seq"], r["n_tokens"], r["freq"], r["corpus_tokens"])
        for r in got
    ] == expect


def test_epoch_shuffle_is_seeded_permutation(spark, tmp_path):
    """epoch_shuffle_order == the single-window form, each epoch's
    positions are exactly the permutation 1..N, epochs order the
    corpus differently, shards are round-robin balanced, and a re-run
    reproduces the same order (seeded, no RNG state)."""
    texts = [(i, f"doc number {i}", "en", "src", 10) for i in range(1, 101)]
    spark.createDataFrame(
        texts, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    sf = str(tmp_path)

    got = llmprep.epoch_shuffle_order(spark, sf).collect()
    n = len(texts)
    by_epoch: dict[int, dict[int, int]] = {}
    for r in got:
        by_epoch.setdefault(r["epoch"], {})[r["doc_id"]] = r["pos"]
        assert r["shard"] == (r["pos"] - 1) % llmprep.EPOCH_SHARDS
    assert set(by_epoch) == set(range(llmprep.EPOCHS))
    for ep, m in by_epoch.items():
        assert sorted(m.values()) == list(range(1, n + 1))  # a permutation
    orders = [
        tuple(sorted(m, key=m.get)) for ep, m in sorted(by_epoch.items())
    ]
    assert len(set(orders)) == llmprep.EPOCHS  # epochs differ

    # single-window reference form (the oracle's shape, in Spark)
    from pyspark.sql import Window as W

    d = spark.read.parquet(str(tmp_path / "documents.parquet"))
    e = d.select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.lit(llmprep.EPOCHS - 1))).alias("ep")
    ).select(
        "doc_id",
        F.col("ep").cast("bigint").alias("epoch"),
        F.md5(
            F.concat(F.col("ep").cast("string"), F.lit(":"), F.col("doc_id").cast("string"))
        ).alias("k"),
    )
    ref = e.withColumn(
        "pos", F.row_number().over(W.partitionBy("epoch").orderBy("k", "doc_id"))
    )
    ref_map = {(r["epoch"], r["doc_id"]): r["pos"] for r in ref.collect()}
    assert {(r["epoch"], r["doc_id"]): r["pos"] for r in got} == ref_map

    # deterministic re-run
    again = {
        (r["epoch"], r["doc_id"]): r["pos"]
        for r in llmprep.epoch_shuffle_order(spark, sf).collect()
    }
    assert again == ref_map


def test_retrieval_eval_metric_invariants(spark):
    """NDCG in [0, 1] with dcg <= idcg (ideal re-ordering can only
    help), rr_q only from the quantized {1e6, 5e5, 333333, 0} set, and
    one row per query that retrieved anything."""
    import os

    import pytest as _pytest

    sf = "/root/testdata/sf0.01"
    if not os.path.exists(os.path.join(sf, "documents.parquet")):
        _pytest.skip("sf0.01 testdata not present")
    rows = llmprep.retrieval_eval_ndcg(spark, sf).collect()
    assert rows
    retrieved = {
        r["query_doc"]
        for r in llmprep.rag_retrieval_pipeline(spark, sf)
        .select("query_doc")
        .distinct()
        .collect()
    }
    assert {r["query_doc"] for r in rows} == retrieved
    allowed_rr = {0, 1_000_000, 500_000, 333_333}
    for r in rows:
        assert 0 <= r["dcg_q"] <= r["idcg_q"] or r["idcg_q"] == 0
        assert 0.0 <= r["ndcg"] <= 1.0
        assert r["rr_q"] in allowed_rr
        assert 1 <= r["n_retrieved"] <= 3


def test_pack_bpe_budget_matches_python_model(spark, tmp_path):
    """pack_chunks_bpe_budget == a pure-Python model: train merges
    with _py_bpe, price each word by its final symbol count, pack docs
    per lang in doc_id order by running-offset chunks."""
    texts = [
        (1, "aaaa aaaa banana band bandana", "en"),
        (2, "ababab abab banana nation", "en"),
        (3, "internationalization nation national aaaa", "en"),
        (4, "banana banana banana aaaa ab", "de"),
        (5, "band bandana international", "de"),
    ]
    rows = [(i, t, lang, "src", len(t)) for i, t, lang in texts]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    got = {
        (r["lang"], r["chunk_id"]): (r["n_docs"], r["n_tokens"])
        for r in llmprep.pack_chunks_bpe_budget(spark, str(tmp_path)).collect()
    }

    vocab, seqs = _py_bpe([t for _, t, _ in texts], llmprep.BPE_MERGE_ROUNDS)
    price = {t: len(s) for t, s in seqs.items()}
    by_lang: dict[str, list[tuple[int, int]]] = {}
    for i, t, lang in texts:
        n_tok = sum(price[w.lower()] for w in t.split() if w)
        by_lang.setdefault(lang, []).append((i, n_tok))
    expect: dict[tuple[str, int], list[int]] = {}
    for lang, docs in by_lang.items():
        off = 0
        for _i, n_tok in sorted(docs):
            chunk = off // llmprep.PACK_BUDGET
            agg = expect.setdefault((lang, chunk), [0, 0])
            agg[0] += 1
            agg[1] += n_tok
            off += n_tok
    assert got == {k: tuple(v) for k, v in expect.items()}


def test_entity_resolution_accuracy_floor(spark):
    """entity_resolve_parts: every dirty record resolves (lossless
    blocking for the corruption model), and entity-level accuracy
    (matched name == source name) clears a 0.9 floor — char-trigram
    scoring must recover one-character typos against a catalog with
    heavy name reuse."""
    import os

    import pytest as _pytest

    from k8s_log_etl_spark.queries.relational import entity_resolve_parts

    sf = "/root/testdata/sf0.01"
    if not os.path.exists(os.path.join(sf, "part.parquet")):
        _pytest.skip("sf0.01 testdata not present")
    n_parts = spark.read.parquet(os.path.join(sf, "part.parquet")).count()
    rows = entity_resolve_parts(spark, sf).collect()
    assert len(rows) == n_parts  # every dirty record found a block
    acc = sum(1 for r in rows if r["is_true"]) / len(rows)
    assert acc >= 0.9, acc
    assert all(0.0 < r["score"] <= 1.0 for r in rows)


def test_bpe_oracle_fixpoint_on_fully_merged_vocab(spark, tmp_path):
    """Round-6 ADVICE regression: when the vocabulary fully merges
    before BPE_MERGE_ROUNDS, the oracle's per-round merge table m{r}
    is EMPTY — a cross join there would empty the whole encoding while
    the Spark twin breaks out of its loop and keeps it. The LEFT JOIN
    + coalesce-to-absent-pattern fix must make the exhausted round a
    fixpoint: both engines agree, non-empty, on a 2-word corpus whose
    vocab is single-symbol after 2 merges (<< 6 rounds)."""
    import duckdb
    import pandas as pd

    from k8s_log_etl_spark.plans.registry import load_all

    pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["ab ab ab cd", "ab cd"],
            "lang": ["en", "en"],
            "source": ["unit", "unit"],
            "n_chars": [11, 5],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    spec = load_all()["bpe_encode_corpus"]
    s_rows = sorted(
        (r["term"], r["token_seq"], r["n_tokens"], r["freq"], r["corpus_tokens"])
        for r in spec.fn(spark, str(tmp_path)).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    d_rows = sorted(tuple(r) for r in con.execute(spec.oracle).fetchall())
    con.close()
    assert s_rows == d_rows
    # non-degenerate: both words encode to ONE fully-merged token
    # (corpus_tokens = sum(freq * len(s)) = 4*1 + 2*1)
    assert s_rows == [("ab", "ab", 1, 4, 6), ("cd", "cd", 1, 2, 6)]


def test_bpe_encode_round_trip(spark):
    """Structural invariant of the BPE encoder: for every emitted
    vocabulary row, the token sequence concatenates back to exactly the
    term (merges never drop, duplicate, or reorder characters) and
    n_tokens equals the sequence length — the decode direction of the
    tokenizer pair, pinned without an oracle."""
    from k8s_log_etl_spark.plans.registry import load_all

    rows = load_all()["bpe_encode_corpus"].fn(
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert rows
    for r in rows:
        toks = r["token_seq"].split(" ")
        assert "".join(toks) == r["term"], r
        assert r["n_tokens"] == len(toks)
