"""Trained quality classifier (round-6 verdict #5): the learned
complement of the Gopher rule gate. The driver row pins cross-engine
training-replay exactness; these tests pin that the model actually
LEARNED something (vs the base rate) and the split-constant contract.
"""

from __future__ import annotations

import k8s_log_etl_spark.queries.text as T
from k8s_log_etl_spark.queries.llmprep import TRAIN_PCT


def test_split_constant_matches_llmprep():
    """QC_TRAIN_PCT is a local copy of llmprep.TRAIN_PCT (kept local to
    avoid an import-order dependency) — they must never drift."""
    assert T.QC_TRAIN_PCT == TRAIN_PCT


def test_classifier_beats_base_rate(spark):
    """On the held-out split the trained model must rank well (AUC) and
    beat the majority-class base rate (accuracy) — an untrained or
    saturated model fails one of these (measured at sf0.01:
    acc 0.935 vs base 0.674, AUC 0.983)."""
    r = T.quality_classifier_train(spark, "/root/testdata/sf0.01").collect()[0]
    base = max(r["n_pos_test"], r["n_test"] - r["n_pos_test"]) / r["n_test"]
    assert r["auc"] >= 0.9
    assert r["accuracy"] > base
    assert r["tp"] + r["fp"] + r["tn"] + r["fn"] == r["n_test"]


def test_structural_features_are_bounded(spark):
    """Feature ids must stay inside [0, QC_NTOT) (plus the -1 bias) —
    an out-of-range id would silently contribute NULL to the Spark-side
    zq fold (element_at past the literal weight array)."""
    from pyspark.sql import functions as F

    from k8s_log_etl_spark.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.01", "documents")
    w = T._words()
    n = F.size(w)
    word_chars = F.aggregate(
        F.transform(w, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n_short = F.size(F.filter(w, lambda x: F.length(x) <= 2))
    stop_arr = F.array(*[F.lit(s) for s in T.STOPWORDS])
    n_stop = F.size(
        F.filter(w, lambda x: F.array_contains(stop_arr, F.lower(x)))
    )
    n1 = F.greatest(n, F.lit(1))
    ids = d.select(
        F.explode(
            F.array(
                (F.lit(64) + F.least(F.floor(n / 8), F.lit(15))).cast("long"),
                (F.lit(80) + F.least(F.floor(word_chars * 4 / n1), F.lit(47).cast("long"))).cast("long"),
                (F.lit(128) + F.least(F.floor(n_short * 10 / n1), F.lit(10))).cast("long"),
                (F.lit(139) + F.least(n_stop, F.lit(12))).cast("long"),
            )
        ).alias("j")
    ).agg(F.min("j").alias("lo"), F.max("j").alias("hi")).collect()[0]
    assert 64 <= ids["lo"] and ids["hi"] < T.QC_NTOT


def test_tdiv_matches_duckdb_integer_division():
    """_qc_tdiv must reproduce DuckDB's `//` (truncation toward zero)
    for every sign combination the gradient update can produce —
    Python's // floors, which differs on negative numerators; a silent
    divergence here would corrupt every training round."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    con = duckdb.connect()

    @settings(max_examples=200, deadline=None)
    @given(
        a=st.integers(min_value=-10**15, max_value=10**15),
        b=st.integers(min_value=1, max_value=10**9),
    )
    def check(a: int, b: int):
        duck = con.execute(f"SELECT CAST({a} AS BIGINT) // CAST({b} AS BIGINT)").fetchone()[0]
        assert T._qc_tdiv(a, b) == duck, (a, b)

    check()
    con.close()
