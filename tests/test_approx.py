"""Approximate aggregates have no cross-engine oracle; bound them
against exact answers instead (HLL++ rsd=0.02 → assert within 5%;
percentile_approx with high accuracy → within the value spread)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k8s_log_etl_spark.queries.relational import agg_approx_events
from k8s_log_etl_spark.tables import load_table


def test_approx_within_bounds(spark, sf_dir):
    approx = {r["event_type"]: r for r in agg_approx_events(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for etype, row in approx.items():
        ex = exact[etype]
        assert row["approx_users"] == pytest.approx(ex["users"], rel=0.05)
        p50, p95, p99 = row["value_p50"], row["value_p95"], row["value_p99"]
        assert ex["lo"] <= p50 <= ex["hi"]
        assert p50 == pytest.approx(ex["p50"], rel=0.05, abs=1.0)
        assert p50 <= p95 <= p99 <= ex["hi"]


def test_countmin_bounds(spark, sf_dir):
    """CMS never under-counts; over-counts by at most eps*N (w.h.p.)."""
    from k8s_log_etl_spark.queries.relational import CMS_EPS, agg_countmin_events

    est = {
        r["event_type"]: r["est_count"]
        for r in agg_countmin_events(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    n = ev.count()
    exact = {
        r["event_type"]: r["count"]
        for r in ev.groupBy("event_type").count().collect()
    }
    assert set(est) == set(exact)
    for etype, e in est.items():
        assert e >= exact[etype]
        assert e <= exact[etype] + CMS_EPS * n + 1


def test_sq8_adc_recall_vs_exact(spark, sf_dir):
    """Search over int8 scalar-quantized codes must agree with the
    exact float scan almost everywhere — int8 reconstruction error only
    perturbs near-ties (measured: recall@5 = 1.0 at sf0.001, 0.98 at
    sf0.01)."""
    from k8s_log_etl_spark.queries.similarity import knn_brute_cosine, knn_sq8_adc

    exact = {(r.query_id, r.vec_id) for r in knn_brute_cosine(spark, sf_dir).collect()}
    adc = {(r.query_id, r.vec_id) for r in knn_sq8_adc(spark, sf_dir).collect()}
    assert exact, "exact baseline returned nothing"
    assert len(exact & adc) / len(exact) >= 0.9


def test_ivfpq_adc_structure_and_recall_floor(spark, sf_dir):
    """IVF-PQ ADC search returns a full, well-formed top-k per query
    (ranks 1..k, no duplicates) and beats the random-pick floor. The
    absolute recall vs the exact scan is MODEST on this synthetic
    near-random embedding table (cosine structure is weak; round 4's
    PQ_K=16 codebooks lifted recall@5 from 0.10 to 0.28, now tracked
    per-query by ann_recall_eval) — exactness of the whole
    train+probe+ADC procedure is pinned by the driver hash-match
    against the unrolled SQL oracle."""
    from k8s_log_etl_spark.queries.similarity import (
        TOP_K,
        knn_brute_cosine,
        knn_ivfpq_adc,
    )

    rows = knn_ivfpq_adc(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert len(by_q) == 10
    for q, rs in by_q.items():
        assert sorted(x.rnk for x in rs) == list(range(1, TOP_K + 1))
        assert len({x.vec_id for x in rs}) == TOP_K
        # ADC distances are sorted by rank
        dists = [x.adc_dist for x in sorted(rs, key=lambda x: x.rnk)]
        assert dists == sorted(dists)

    exact = {(r.query_id, r.vec_id) for r in knn_brute_cosine(spark, sf_dir).collect()}
    got = {(r.query_id, r.vec_id) for r in rows}
    assert len(exact & got) / len(exact) >= 0.2


def test_ivfpq_refine_recall_and_structure(spark, sf_dir):
    """The two-stage refine search must (a) return a well-formed top-k
    per query ranked by exact cosine, (b) strictly dominate the plain
    ADC search on recall (refinement can only remove ADC ordering
    errors, and REFINE_NPROBE > NPROBE raises the candidate ceiling),
    and (c) hold mean recall@5 >= 0.5 — the round-3 verdict bar —
    making it the second sub-quadratic index above the bar (measured
    0.78 at sf0.01 with the 10x-k shortlist vs ADC's 0.28)."""
    from k8s_log_etl_spark.queries.similarity import (
        TOP_K,
        knn_brute_cosine,
        knn_ivfpq_adc,
        knn_ivfpq_refine,
    )

    rows = knn_ivfpq_refine(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert len(by_q) == 10
    for q, rs in by_q.items():
        assert sorted(x.rnk for x in rs) == list(range(1, TOP_K + 1))
        assert len({x.vec_id for x in rs}) == TOP_K
        sims = [x.cos_sim for x in sorted(rs, key=lambda x: x.rnk)]
        assert sims == sorted(sims, reverse=True)

    exact = {(r.query_id, r.vec_id) for r in knn_brute_cosine(spark, sf_dir).collect()}
    refine = {(r.query_id, r.vec_id) for r in rows}
    adc = {(r.query_id, r.vec_id) for r in knn_ivfpq_adc(spark, sf_dir).collect()}
    assert exact, "exact baseline returned nothing"
    r_refine = len(exact & refine) / len(exact)
    r_adc = len(exact & adc) / len(exact)
    assert r_refine >= r_adc
    assert r_refine >= 0.5


def test_lsh_or_amplified_recall_floor(spark, sf_dir):
    """Round-4 recall lift: the OR-amplified multi-table hyperplane LSH
    must hold mean recall@5 >= 0.5 against the exact scan (measured
    0.60 at sf0.01 with 8 tables x 8 planes x Hamming-1 probes — the
    round-3 single-table index sat at 0.18). Pins the round-3 verdict's
    'lift ANN recall to a defensible number' acceptance bar in CI."""
    from k8s_log_etl_spark.queries.similarity import knn_brute_cosine, knn_lsh_hyperplane

    exact = {(r.query_id, r.vec_id) for r in knn_brute_cosine(spark, sf_dir).collect()}
    approx = {(r.query_id, r.vec_id) for r in knn_lsh_hyperplane(spark, sf_dir).collect()}
    assert exact, "exact baseline returned nothing"
    assert len(exact & approx) / len(exact) >= 0.5


def test_bloom_prescreen_no_false_negatives_and_fp_bound(spark, sf_dir):
    """Bloom membership can over-approximate but never miss: every
    exact benchmark-gram hit must also be a bloom hit, and the measured
    false-positive rate stays within a generous multiple of the
    (1 - e^(-kn/m))^k estimate (n ~ 1k bench grams, m = 64Ki, k = 3
    -> theory ~1e-4; assert <= 1%)."""
    from k8s_log_etl_spark.queries.llmprep import decontam_bloom_prescreen

    rows = decontam_bloom_prescreen(spark, sf_dir).collect()
    assert rows
    tot = sum(r.n_grams for r in rows)
    true_hits = sum(r.true_hits for r in rows)
    fp = sum(r.bloom_hits - r.true_hits for r in rows)
    for r in rows:
        assert r.bloom_hits >= r.true_hits, f"false negative in {r.source}"
    assert fp / max(tot - true_hits, 1) <= 0.01


def test_quantile_sketch_error_bounded_by_bin_width(spark, sf_dir):
    """The histogram estimator's crossing bin b satisfies
    cum(b-1) < p*n <= cum(b), so the ceil(p*n)-th ORDER STATISTIC
    (the inverse-CDF / percentile_disc quantile) lies inside bin b —
    and the interpolated estimate lies in the same bin, giving the
    rigorous guarantee |est - order_stat| < QSK_W. (The bound does NOT
    hold against percentile_cont, whose interpolation between two
    order statistics can straddle a bin boundary — observed 9.45 > W
    at p99 on the sparse click tail.) Also pins the sketch's totals
    against exact group counts."""
    import math

    from k8s_log_etl_spark.queries.streaming_batch import (
        QSK_W,
        events_quantile_sketch,
    )
    from k8s_log_etl_spark.tables import load_table

    est = {r.event_type: r for r in events_quantile_sketch(spark, sf_dir).collect()}
    vals: dict[str, list[float]] = {}
    for r in load_table(spark, sf_dir, "events").select("event_type", "value").collect():
        vals.setdefault(r.event_type, []).append(r.value)
    assert set(est) == set(vals) and est
    for etype, e in est.items():
        v = sorted(vals[etype])
        n = len(v)
        assert e.n_events == n
        for ep, p in ((e.est_p50, 0.5), (e.est_p90, 0.9), (e.est_p99, 0.99)):
            order_stat = v[math.ceil(p * n) - 1]
            assert abs(ep - order_stat) < QSK_W, (etype, p, ep, order_stat)


def test_policy_anchors_reproduce_registered_constants():
    """The index-parameter growth rules (functions of corpus size,
    round-4 verdict #2) must reproduce the registered queries' fixed
    constants at the correctness-gate corpus size — the policy IS the
    source of truth, the constants its anchored evaluation."""
    from k8s_log_etl_spark.queries import similarity as S

    n0 = S.REGISTERED_CORPUS_N
    assert S.lsh_planes_for(n0) == S.N_PLANES == 8
    assert S.lsh_tables_for(n0) == S.N_TABLES == 8
    assert S.ivf_cells_for(n0) == S.KMEANS_K == 4
    assert S.ivf_nprobe_for(S.ivf_cells_for(n0)) == S.REFINE_NPROBE == 3
    assert S.refine_shortlist_for(n0) == S.REFINE_N == 50
    # and they genuinely GROW with the corpus
    assert S.lsh_planes_for(20_000) > S.N_PLANES
    assert S.lsh_tables_for(20_000) > S.N_TABLES
    assert S.ivf_cells_for(20_000) > S.KMEANS_K
    assert S.refine_shortlist_for(20_000) > S.REFINE_N
    # the LSH candidate fraction SHRINKS even as tables grow
    frac = lambda n: (  # noqa: E731
        S.lsh_tables_for(n)
        * (S.lsh_planes_for(n) + 1)
        / 2 ** S.lsh_planes_for(n)
    )
    assert frac(20_000) < frac(n0)


def _synth_sf1_embeddings(spark, replicas: int = 10):
    """The synthetic-sf1 embeddings table, built exactly like
    tools/synth_scale.py's embeddings replica rule: vec_id shifts by
    replica*stride, each element offset by replica*1e-3 (float32), so
    replicas are near- but not exact duplicates."""
    src = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    stride = src.agg(F.max("vec_id")).collect()[0][0] + 1
    parts = [
        src.withColumn("vec_id", F.col("vec_id") + F.lit(k * stride)).withColumn(
            "embedding",
            F.transform("embedding", lambda x: x + F.lit(k * 1e-3).cast("float")),
        )
        for k in range(replicas)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.repartition(32).localCheckpoint(eager=True)


def test_ann_recall_survives_scale(spark):
    """Round-4 verdict #2: the recall@5 >= 0.5 bar, held at sf0.01
    with anchored constants, must hold on the synthetic-sf1 corpus
    (20k vectors, the tools/synth_scale.py construction) with the
    policy-GROWN parameters — P/T for the OR-amplified LSH, coarse
    cells / nprobe / shortlist for the IVF-PQ refine — proving the
    documented growth rules actually purchase scale-stable recall,
    not just prose. Ground truth is an exact float64 cosine top-5
    computed driver-side (20k x 64 = 5 MB)."""
    import os

    import numpy as np
    import pytest

    if not os.path.exists("/root/testdata/sf0.1/embeddings.parquet"):
        pytest.skip("sf0.1 testdata not present")

    from k8s_log_etl_spark.queries import similarity as S

    e = _synth_sf1_embeddings(spark)
    n = e.count()
    assert n == 20_000

    rows = e.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    V = np.array([r["embedding"] for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    ids, V = ids[order], V[order]
    norms = np.linalg.norm(V, axis=1)
    exact: dict[int, set[int]] = {}
    for qi in range(S.N_QUERIES):
        cos = (V @ V[qi]) / (norms * norms[qi])
        cos[: S.N_QUERIES] = -np.inf  # corpus = vec_id >= N_QUERIES
        top = np.argpartition(-cos, S.TOP_K)[: S.TOP_K]
        exact[qi] = {int(ids[t]) for t in top}

    planes, tables = S.lsh_planes_for(n), S.lsh_tables_for(n)
    cells = S.ivf_cells_for(n)
    nprobe, shortlist = S.ivf_nprobe_for(cells), S.refine_shortlist_for(n)

    lsh = S._lsh_search(e, tables, planes).collect()
    refine = S._refine_search(e, nprobe, shortlist, cells).collect()

    def recall(rows) -> float:
        got: dict[int, set[int]] = {}
        for r in rows:
            got.setdefault(int(r["query_id"]), set()).add(int(r["vec_id"]))
        return sum(
            len(got.get(q, set()) & exact[q]) / len(exact[q]) for q in exact
        ) / len(exact)

    r_lsh, r_refine = recall(lsh), recall(refine)
    print(f"synth-sf1 recall@5: lsh={r_lsh:.2f} (T={tables},P={planes}) "
          f"refine={r_refine:.2f} (K={cells},nprobe={nprobe},shortlist={shortlist})")
    assert r_lsh >= 0.5, f"LSH recall@5 {r_lsh} below bar at n={n}"
    assert r_refine >= 0.5, f"refine recall@5 {r_refine} below bar at n={n}"


def test_ann_recall_policy_midpoint_near_random(spark):
    """The harder recall-vs-scale point: sf0.1's 2000 vectors keep the
    NEAR-RANDOM neighbor structure (true top-5 sit near cos 0.3 — no
    synthetic near-duplicates to find), so this measures what the
    growth policy buys where recall is genuinely hard. With
    policy(2000) = (P=10, T=18 | K=8, nprobe=6, shortlist=200):
    measured recall@5 LSH 0.70, refine 0.92 — both ABOVE their
    anchored sf0.01 values (0.60 / 0.78), i.e. the grown parameters
    hold recall while the LSH candidate fraction shrinks 0.28 → 0.19
    and the refine shortlist stays a 10% corpus fraction."""
    import os

    import numpy as np
    import pytest

    if not os.path.exists("/root/testdata/sf0.1/embeddings.parquet"):
        pytest.skip("sf0.1 testdata not present")

    from k8s_log_etl_spark.queries import similarity as S

    e = (
        spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
        .repartition(32)
        .localCheckpoint(eager=True)
    )
    n = e.count()
    assert n == 2000

    rows = e.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    V = np.array([r["embedding"] for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    ids, V = ids[order], V[order]
    norms = np.linalg.norm(V, axis=1)
    exact: dict[int, set[int]] = {}
    for qi in range(S.N_QUERIES):
        cos = (V @ V[qi]) / (norms * norms[qi])
        cos[: S.N_QUERIES] = -np.inf
        top = np.argpartition(-cos, S.TOP_K)[: S.TOP_K]
        exact[qi] = {int(ids[t]) for t in top}

    planes, tables = S.lsh_planes_for(n), S.lsh_tables_for(n)
    cells = S.ivf_cells_for(n)
    nprobe, shortlist = S.ivf_nprobe_for(cells), S.refine_shortlist_for(n)

    def recall(rows) -> float:
        got: dict[int, set[int]] = {}
        for r in rows:
            got.setdefault(int(r["query_id"]), set()).add(int(r["vec_id"]))
        return sum(
            len(got.get(q, set()) & exact[q]) / len(exact[q]) for q in exact
        ) / len(exact)

    r_lsh = recall(S._lsh_search(e, tables, planes).collect())
    r_refine = recall(S._refine_search(e, nprobe, shortlist, cells).collect())
    print(f"sf0.1 recall@5: lsh={r_lsh:.2f} (T={tables},P={planes}) "
          f"refine={r_refine:.2f} (K={cells},nprobe={nprobe},shortlist={shortlist})")
    assert r_lsh >= 0.5
    assert r_refine >= 0.5


def test_heavy_hitters_misra_gries_bounds(spark):
    """agg_heavyhitters_events: estimates never exceed true counts,
    undershoot by at most n/k, and every key with true frequency
    > n/k is reported — the Misra-Gries guarantee surviving the
    per-partition build + mergeable-summaries merge."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from k8s_log_etl_spark.queries.relational import HH_K, agg_heavyhitters_events

    sf = "/root/testdata/sf0.01"
    if not os.path.exists(os.path.join(sf, "events.parquet")):
        _pytest.skip("sf0.01 testdata not present")
    ev = spark.read.parquet(os.path.join(sf, "events.parquet"))
    exact = {
        r["event_type"]: r["cnt"]
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    n = sum(exact.values())
    est = {
        r["event_type"]: r["est_count"]
        for r in agg_heavyhitters_events(spark, sf).collect()
    }
    assert est  # non-degenerate at this SF
    bound = n / HH_K
    for k, e in est.items():
        assert e <= exact[k], (k, e, exact[k])
        assert e >= exact[k] - bound, (k, e, exact[k], bound)
    for k, c in exact.items():
        if c > bound:
            assert k in est, (k, c, bound)


def test_hll_corrected_estimate_within_5pct(spark, sf_dir):
    """The oracled HLL registers feed a corrected estimate (raw HLL
    above 2.5m, linear counting below): assert <=5% relative error
    against the exact distinct count — ~3 sigma for p=12
    (1.04/sqrt(4096) ~ 1.6%), and far tighter in the linear regime."""
    import math

    from k8s_log_etl_spark.queries.relational import (
        HLL_M,
        HLL_NUM,
        agg_hll_events,
    )

    rows = agg_hll_events(spark, sf_dir).collect()
    assert rows
    for r in rows:
        est = HLL_NUM / r["denom_scaled"]
        if est <= 2.5 * HLL_M and r["used_buckets"] < HLL_M:
            est = HLL_M * math.log(HLL_M / (HLL_M - r["used_buckets"]))
        assert est == pytest.approx(r["exact_distinct"], rel=0.05)


def test_hll_registers_merge_associatively(spark, sf_dir):
    """Mergeability: registers of (A union B) == merge of registers(A)
    and registers(B) — split events by id parity, recombine via max per
    bucket, and require the IDENTICAL (used_buckets, denom_scaled)
    state the single-pass build produces. This is the property that
    lets 1000 executors sketch independently at 100 TB."""
    from k8s_log_etl_spark.queries.relational import HLL_M, hll_registers

    ev = load_table(spark, sf_dir, "events").withColumn(
        "half", (F.col("event_id") % 2).cast("int")
    )
    whole = {
        r["event_type"]: (r["used_buckets"], r["denom_scaled"])
        for r in hll_registers(ev, ["event_type"], F.col("user_id")).collect()
    }
    # rebuild per-half register tables, then merge by max(reg)
    h = ev.select("event_type", "half", "user_id")
    from k8s_log_etl_spark.functions import xengine as X

    hh = X.md5_long(F.col("user_id").cast("string"))
    t = F.floor((hh - hh % HLL_M) / HLL_M).cast("bigint")
    rho = F.when(t == 0, F.lit(49)).otherwise(F.lit(49) - F.length(F.bin(t)))
    per_half = (
        h.select("event_type", "half", (hh % HLL_M).alias("b"), rho.alias("rho"))
        .groupBy("event_type", "half", "b")
        .agg(F.max("rho").alias("reg"))
    )
    merged = (
        per_half.groupBy("event_type", "b")
        .agg(F.max("reg").alias("reg"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("used_buckets"),
            (
                F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(49 - reg AS INT))"))
                + (F.lit(HLL_M) - F.count(F.lit(1))) * F.lit(1 << 49)
            ).alias("denom_scaled"),
        )
    )
    got = {
        r["event_type"]: (r["used_buckets"], r["denom_scaled"])
        for r in merged.collect()
    }
    assert got == whole


def test_kmv_estimate_and_merge(spark, sf_dir):
    """KMV: estimate within ~3 sigma (rsd ~ 1/sqrt(k-2) ~ 12.6% at
    k=64) in the estimator regime, exact below k; and MERGEABILITY —
    bottom-k of the union equals bottom-k of the concatenated
    per-shard bottom-ks, the property that lets shards sketch
    independently."""
    from pyspark.sql import Window

    from k8s_log_etl_spark.functions import xengine as X
    from k8s_log_etl_spark.queries.relational import (
        KMV_K,
        KMV_SPACE,
        sample_kmv_bottomk,
    )

    # exact-or-bounded over the registered query (user_id cardinality)
    for r in sample_kmv_bottomk(spark, sf_dir).collect():
        if r["exact_distinct"] <= KMV_K:
            assert r["est_distinct"] == float(r["exact_distinct"])
        else:
            assert r["est_distinct"] == pytest.approx(
                r["exact_distinct"], rel=0.4
            )

    # estimator regime + merge on a high-cardinality column (event_id)
    ev = load_table(spark, sf_dir, "events").select(
        X.md5_long(F.col("event_id").cast("string")).alias("h"),
        (F.col("event_id") % 2).alias("shard"),
    )
    exact = ev.select("h").distinct().count()
    assert exact > KMV_K

    def bottomk(df):
        w = Window.orderBy("h")
        return (
            df.select("h")
            .distinct()
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= KMV_K)
            .select("h")
        )

    whole = sorted(r["h"] for r in bottomk(ev).collect())
    per_shard = bottomk(ev.filter("shard = 0")).unionAll(
        bottomk(ev.filter("shard = 1"))
    )
    merged = sorted(r["h"] for r in bottomk(per_shard).collect())
    assert merged == whole
    est = (KMV_K - 1) * KMV_SPACE / whole[-1]
    assert est == pytest.approx(exact, rel=0.4)


def test_ann_recall_fourth_scale_point(spark):
    """Round-8 verdict #4: extend the recall-vs-scale series one order
    past the 20k point — 100k vectors (50 sf0.1 replicas), policy-grown
    parameters (measured: P=16, T=228 | K=57, nprobe=43,
    shortlist=10k). Honest caveat, recorded in PLANS.md round-8: at
    this replica count the true top-5 of every query are its own
    near-duplicate replicas (element offsets <= 0.05), so recall is
    structurally easy (measured 1.00 for both paths; 200k measured
    1.00 / 1.00 as well, not pinned — the LSH side costs ~6 min there).
    The pin is therefore a non-regression FLOOR at the fourth scale
    point, not a challenge bar — the hard recall points remain sf0.01
    (anchor), sf0.1 (near-random structure) and 20k. The meaningful
    scale signal here is that the policy-grown index still RUNS with
    bounded candidate lists (cand fraction 0.048 at 200k, shrinking)
    while IVF-PQ refine stays ~flat-cost — the measured table-growth
    economics are in PLANS.md/SCALE.md."""
    import os

    import numpy as np
    import pytest

    if not os.path.exists("/root/testdata/sf0.1/embeddings.parquet"):
        pytest.skip("sf0.1 testdata not present")

    from k8s_log_etl_spark.queries import similarity as S

    e = _synth_sf1_embeddings(spark, replicas=50)
    n = e.count()
    assert n == 100_000

    rows = e.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    V = np.array([r["embedding"] for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    ids, V = ids[order], V[order]
    norms = np.linalg.norm(V, axis=1)
    exact: dict[int, set[int]] = {}
    for qi in range(S.N_QUERIES):
        cos = (V @ V[qi]) / (norms * norms[qi])
        cos[: S.N_QUERIES] = -np.inf
        top = np.argpartition(-cos, S.TOP_K)[: S.TOP_K]
        exact[qi] = {int(ids[t]) for t in top}

    planes, tables = S.lsh_planes_for(n), S.lsh_tables_for(n)
    cells = S.ivf_cells_for(n)
    nprobe, shortlist = S.ivf_nprobe_for(cells), S.refine_shortlist_for(n)

    lsh = S._lsh_search(e, tables, planes).collect()
    refine = S._refine_search(e, nprobe, shortlist, cells).collect()

    def recall(rows) -> float:
        got: dict[int, set[int]] = {}
        for r in rows:
            got.setdefault(int(r["query_id"]), set()).add(int(r["vec_id"]))
        return sum(
            len(got.get(q, set()) & exact[q]) / len(exact[q]) for q in exact
        ) / len(exact)

    r_lsh, r_refine = recall(lsh), recall(refine)
    print(
        f"100k recall@5: lsh={r_lsh:.2f} (T={tables},P={planes}) "
        f"refine={r_refine:.2f} (K={cells},nprobe={nprobe},shortlist={shortlist})"
    )
    assert r_lsh >= 0.5, f"LSH recall@5 {r_lsh} below floor at n={n}"
    assert r_refine >= 0.5, f"refine recall@5 {r_refine} below floor at n={n}"


def test_triangle_estimate_tracks_exact_count(spark, sf_dir):
    """DOULION estimator (graph_triangle_estimate): the p=1/4
    deterministic-coin sparsification must land within a tight band of
    the exact compact-forward count on the dense co-purchase graph
    (measured 410,752 vs 413,718 at sf0.01 — 0.7% relative error; the
    band leaves room for other fixtures), kept_edges must be ~p of the
    edge set, and the integer scaling must be exact."""
    from k8s_log_etl_spark.queries.graph import (
        TRI_EST_SCALE,
        graph_triangle_count,
        graph_triangle_estimate,
    )

    exact = graph_triangle_count(spark, sf_dir).collect()[0]
    est = graph_triangle_estimate(spark, sf_dir).collect()[0]
    assert est["est_triangles"] == est["sampled_triangles"] * TRI_EST_SCALE
    # coin fairness: kept edges within 10% of p * |E|
    expected_kept = exact["n_edges"] / 4
    assert abs(est["kept_edges"] - expected_kept) <= 0.1 * expected_kept
    # estimator accuracy: within 25% of the exact count (0.7% measured)
    t = exact["n_triangles"]
    assert 0.75 * t <= est["est_triangles"] <= 1.25 * t


def test_keyset_page_equals_offset_page(spark, sf_dir):
    """orders_page_keyset must return EXACTLY offset-pagination's
    page 2 (same fully-tie-broken total order, cursor = last row of
    page 1) — the correctness contract that lets a client switch from
    OFFSET to keyset mid-scroll without skipping or repeating rows."""
    from k8s_log_etl_spark.queries.relational import (
        orders_page_keyset,
        orders_page_offset,
    )

    off = [tuple(r) for r in orders_page_offset(spark, sf_dir).collect()]
    key = [tuple(r) for r in orders_page_keyset(spark, sf_dir).collect()]
    assert key == off and len(key) == 20


def test_ams_f2_pure_python_replay_and_bound(spark, sf_dir):
    """AMS F2: (a) the whole sketch — registers, per-row estimates,
    exact-median selection — replayed in pure Python off the raw rows
    must equal the query's output bit-for-bit (the state is a pure
    function of the data multiset); (b) the median estimate lands
    within 5 relative standard deviations (sqrt(2/W)) of exact F2."""
    import hashlib

    from k8s_log_etl_spark.queries.relational import (
        AMS_D,
        AMS_W,
        agg_ams_f2_events,
    )

    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .collect()
    )
    reg: dict = {}
    exact_cnt: dict = {}
    for r in rows:
        t, u = r["event_type"], r["user_id"]
        exact_cnt.setdefault(t, {}).setdefault(u, 0)
        exact_cnt[t][u] += 1
        for i in range(AMS_D):
            h = int(hashlib.md5(f"{i}:{u}".encode()).hexdigest()[:15], 16)
            b = (h >> 1) % AMS_W
            s = -1 if h % 2 == 0 else 1
            key = (t, i, b)
            reg[key] = reg.get(key, 0) + s
    expected = {}
    for t in exact_cnt:
        ests = sorted(
            (
                sum(c * c for (tt, ii, _b), c in reg.items() if tt == t and ii == i),
                i,
            )
            for i in range(AMS_D)
        )
        f2_est = ests[(AMS_D + 1) // 2 - 1][0]
        f2_exact = sum(c * c for c in exact_cnt[t].values())
        expected[t] = (f2_est, f2_exact, f2_est - f2_exact)
    got = {
        r["event_type"]: (r["f2_est"], r["f2_exact"], r["err"])
        for r in agg_ams_f2_events(spark, sf_dir).collect()
    }
    assert got == expected
    for t, (est, ex, _e) in got.items():
        rel_std = (2.0 / AMS_W) ** 0.5
        assert abs(est - ex) <= 5 * rel_std * ex, (t, est, ex)
