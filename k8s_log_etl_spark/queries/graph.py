"""Graph analytics over relationship structures derived from the
warehouse tables — the iterative linear-algebra surface complementing
dedup's connected components (cc_star / label propagation).

Cross-engine determinism discipline: PageRank is normally a float
fixpoint, whose additions are order-sensitive and therefore NOT
reproducible across engines (or even across partitionings). Here every
rank is an integer in Q-units (Q = 1e12): integer division for the
per-edge contribution, exact BIGINT sums, integer damping
((85 * s) div 100) — so Spark and DuckDB produce bit-identical ranks
at every iteration, and the oracle pins the whole iterative
computation, not a rounded echo of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from k8s_log_etl_spark.functions import xengine as X
from k8s_log_etl_spark.plans.registry import register
from k8s_log_etl_spark.tables import (
    ensure_min_parallelism,
    load_table,
    spill_checkpoint,
)

PR_Q = 10**12       # rank quantization (integer Q-units)
PR_ITERS = 3        # fixed unrolled iterations (oracle matches)
PR_DAMP_NUM = 85    # damping 0.85 as an integer ratio
PR_DAMP_DEN = 100


def _ordered_copurchase_pairs(
    spark: SparkSession, sf_dir: str, pre_filter=None
) -> DataFrame:
    """Distinct co-purchase pairs with src < dst (each undirected edge
    ONCE), expanded MAP-SIDE from per-order sorted part lists (the
    parts_copurchased grouped-expansion discipline, bounded by TPC-H's
    <= 7 lines/order) — never a posting self-join. Emitting only the
    upper triangle halves the pre-distinct pair stream (239M instead
    of 478M rows at synth-sf10), which is the dominant shuffle of the
    whole graph family's edge build; consumers symmetrize map-side."""
    # Round-14 (guide §2.5 input skew, the r13 q1/q7 policy): the
    # driver parquet is ONE row-group, so the scan + the per-order
    # collect_set's partial (map-side) aggregation — the heavy half of
    # the edge build — ran on a single core (time_head: the 0.5 s
    # 3-task job dominating every graph head). ensure_min_parallelism
    # is a no-op at production scale (splits >> cores) and collect_set
    # is order-insensitive here (sort_array canonicalizes).
    li = ensure_min_parallelism(
        load_table(spark, sf_dir, "lineitem"), spark, "l_orderkey"
    )
    # collect_set IS the per-order distinct — the former explicit
    # po.distinct() pre-pass shuffled the full (orderkey, partkey)
    # stream a second time for a dedup the set-aggregate already
    # performs, and partial (map-side) collect_set combines before the
    # exchange, so this is strictly one lineitem-sized shuffle instead
    # of two (guide §2.4: "a distinct on data that is already unique"
    # — here, unique-ified by the very next operator).
    per_order = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    ps = F.col("ps")
    # sorted distinct [p1..pk]: emit (pi, pj) for i < j only
    idx = F.when(
        F.size(ps) >= 2, F.sequence(F.lit(1), F.size(ps) - 1)
    ).otherwise(F.array().cast("array<int>"))
    pair_list = F.flatten(
        F.transform(
            idx,
            lambda i: F.transform(
                F.slice(ps, i + 1, F.size(ps) - i),
                lambda y: F.struct(
                    F.element_at(ps, i).alias("src"), y.alias("dst")
                ),
            ),
        )
    )
    pairs = per_order.select(F.explode(pair_list).alias("p")).select(
        F.col("p.src").alias("src"), F.col("p.dst").alias("dst")
    )
    if pre_filter is not None:
        # push a pair-keyed predicate BELOW the distinct: the distinct
        # is the graph family's dominant shuffle (239M rows at
        # synth-sf10), and a filter on (src, dst) commutes with it —
        # the DOULION coin rides here so the sparsified run shuffles
        # ~p of the pair stream instead of sparsifying after paying it
        pairs = pairs.filter(pre_filter(F.col("src"), F.col("dst")))
    return pairs.distinct()


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric distinct co-purchase edges (src, dst), checkpointed —
    the shared graph behind PageRank and BFS. Built from the ordered
    pair set and symmetrized MAP-SIDE (a unionAll of the two column
    orders after ONE half-sized distinct — round-8 second-decade
    rework; the former both-directions distinct shuffled 2x the
    rows for the identical result)."""
    # checkpoint the HALF list (serialized+spillable: data-sized — the
    # deserialized default OOM'd a 64 GiB heap at synth-sf10, see
    # tables.spill_checkpoint), then symmetrize map-side: stores half
    # the bytes, and the unionAll branches read the same materialized
    # blocks instead of re-running the distinct per branch
    half = spill_checkpoint(_ordered_copurchase_pairs(spark, sf_dir))
    return half.unionAll(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def _pr_sql() -> str:
    """Unrolled integer PageRank: the same CTE-chain discipline as the
    k-means and PQ training oracles — r{it} computed from r{it-1} with
    integer-exact arithmetic."""
    parts = [
        "po AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)",
        """e AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM po a JOIN po b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
)""",
        "deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY src)",
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg)",
        f"r0 AS (SELECT src AS node, {PR_Q} // n AS rank_q FROM deg, nn)",
    ]
    for it in range(1, PR_ITERS + 1):
        parts.append(f"""r{it} AS (
  SELECT e.dst AS node,
         CAST((15 * ({PR_Q} // nn.n)) // {PR_DAMP_DEN}
           + ({PR_DAMP_NUM} * sum(r.rank_q // deg.d)) // {PR_DAMP_DEN}
           AS BIGINT) AS rank_q
  FROM e
  JOIN r{it - 1} r ON r.node = e.src
  JOIN deg ON deg.src = e.src
  CROSS JOIN nn
  GROUP BY e.dst, nn.n
)""")
    return f"""
WITH {', '.join(parts)}
SELECT node AS part, rank_q,
       round(rank_q * 1.0 / {PR_Q}, 9) AS rank
FROM r{PR_ITERS}
"""


@register("graph_pagerank_copurchase", oracle=_pr_sql(), tags=("graph",), bench=True)
def graph_pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the part co-purchase graph (parts are linked when
    bought in the same order — the symmetrized edge set behind
    parts_copurchased), damping 0.85, PR_ITERS unrolled iterations:
    which parts sit at the center of the co-purchase network. The
    engine's second iterative-algorithm family after connected
    components — power iteration with a per-round shuffle instead of a
    shrinking star forest.

    Integer-exact throughout (see module docstring): ranks live in
    Q-units, per-edge contributions use BIGINT division, damping is
    (85*s) div 100 — both engines produce bit-identical ranks, so the
    oracle verifies all PR_ITERS iterations, not a tolerance band.

    Scale shape — Pregel-style distributed PageRank: edges are built
    map-side from per-order sorted part lists (the parts_copurchased
    grouped-expansion discipline, bounded by TPC-H's <= 7 lines/order)
    and folded into a checkpointed ADJACENCY frame (one row per node:
    degree + out-neighbor list), so each iteration is ONE node-sized
    keyed join of the rank vector onto the adjacency (co-partitionable
    — a cluster hash-partitions the adjacency by node once and ships
    only the rank vector per round), a map-side explode of per-edge
    contributions computed AFTER the division, and ONE dst-keyed
    aggregate. Driver sync per round: nothing — the only driver scalar
    is the node count N, fetched once before the loop (same role as
    the k-means centroid sync). Dangling nodes cannot exist (the edge
    set is symmetric, so in-degree = out-degree >= 1 for every node).

    Reference surface: none (the Go reference has no joins at all);
    this extends SURVEY §2c's iterative family. PageRank itself is
    public literature (Page et al. 1999)."""
    e = _copurchase_edges(spark, sf_dir)
    # Pregel-style adjacency-list representation: ONE row per node
    # (src, degree, out-neighbor array), checkpointed. Each round then
    # joins the rank vector onto a NODE-sized frame (not the edge
    # list) and the per-edge contributions explode map-side AFTER the
    # division — the join shrinks from |E| to |V| rows (measured
    # 5.7 -> 3.7 s at sf0.1, 23.1 -> 14.2 s at synth sf1). Supernode
    # caveat: a node's array is its degree — for power-law graphs use
    # pagerank_chunked (below), which splits supernode adjacency into
    # bounded chunks with bit-identical ranks; the co-purchase graph's
    # degrees are basket-bounded so one row per node is right here.
    adj = (
        e.groupBy("src")
        .agg(
            F.count(F.lit(1)).cast("long").alias("d"),
            F.collect_list("dst").alias("dsts"),
        )
        .transform(spill_checkpoint)
    )
    n_nodes = adj.count()  # the single driver scalar (pre-loop, like k-means)
    base = PR_Q // n_nodes
    teleport = (15 * base) // PR_DAMP_DEN

    # Rounds FUSE into one job (round-6 same-session A/B): each round's
    # aggregate feeds exactly one consumer (the next round), so the
    # linear 3-round chain executes once with no recompute — dropping
    # the per-round eager checkpoints (3 jobs + 3 materializations)
    # measured 3.58 -> 2.82 s at sf0.1 and 21.5 -> 16.6 s at synth-sf1,
    # bit-identical ranks. Only the FINAL rank vector checkpoints: the
    # serving contract (projection over a materialized frame, exch=0)
    # is unchanged, and PR_ITERS is small enough that plan depth is a
    # non-issue (a 50-round production run would re-insert a checkpoint
    # every ~10 rounds purely for lineage bounds).
    ranks = adj.select(F.col("src").alias("node"), F.lit(base).alias("rank_q"))
    for it in range(PR_ITERS):
        contrib = (
            adj.join(ranks, adj.src == ranks.node)
            .select(F.explode("dsts").alias("dst"), F.expr("rank_q div d").alias("c"))
        )
        ranks = contrib.groupBy(F.col("dst").alias("node")).agg(
            (
                F.lit(teleport)
                + F.expr(f"({PR_DAMP_NUM} * sum(c)) div {PR_DAMP_DEN}")
            ).alias("rank_q")
        )
        if it == PR_ITERS - 1:
            ranks = ranks.transform(spill_checkpoint)
    return ranks.select(
        F.col("node").alias("part"),
        "rank_q",
        F.round(F.col("rank_q") / PR_Q, 9).alias("rank"),
    )


PR_CHUNK_CAP = 256  # default neighbor-chunk size for the supernode variant


def pagerank_chunked(e: DataFrame, chunk_cap: int = PR_CHUNK_CAP) -> DataFrame:
    """The production variant for POWER-LAW graphs the registered
    query's docstring documents (round-5 verdict #6): identical
    integer PageRank, but adjacency rows are split into <=chunk_cap
    neighbor chunks, each carrying the node's FULL degree. A supernode
    with 10M neighbors is then S/chunk_cap rows instead of one
    unsplittable task: the per-round rank join fans out per chunk (the
    rank vector row replicates to each chunk — tiny), the explode
    stays map-side, and no single task ever materializes a
    degree-sized array. Contributions are rank div FULL degree exactly
    as in the one-row form, and the dst aggregate sums the same
    multiset — ranks are BIT-IDENTICAL to the unchunked form
    (tests/test_scale_patterns.py proves it on a manufactured
    supernode graph).

    Shape per round: one keyed join (rank vector onto the chunked
    adjacency, |chunks| rows ~ |E|/chunk_cap), map-side explode, one
    dst-keyed aggregate — same as the registered query, plus the
    chunk split amortized once behind the checkpoint."""
    deg = e.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("d"),
        F.collect_list("dst").alias("dsts"),
    )
    n_chunks = F.ceil(F.size("dsts") / F.lit(chunk_cap)).cast("int")
    adj = (
        deg.select(
            "src",
            "d",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n_chunks - 1),
                    lambda i: F.slice(
                        F.col("dsts"), i * chunk_cap + 1, F.lit(chunk_cap)
                    ),
                )
            ).alias("dsts"),
        )
    ).transform(spill_checkpoint)
    n_nodes = adj.select("src").distinct().count()
    base = PR_Q // n_nodes
    teleport = (15 * base) // PR_DAMP_DEN

    ranks = (
        adj.select("src")
        .distinct()
        .select(F.col("src").alias("node"), F.lit(base).alias("rank_q"))
    )
    # same round-fusing as the registered query: only the final vector
    # checkpoints
    for it in range(PR_ITERS):
        contrib = adj.join(ranks, adj.src == ranks.node).select(
            F.explode("dsts").alias("dst"), F.expr("rank_q div d").alias("c")
        )
        ranks = contrib.groupBy(F.col("dst").alias("node")).agg(
            (
                F.lit(teleport)
                + F.expr(f"({PR_DAMP_NUM} * sum(c)) div {PR_DAMP_DEN}")
            ).alias("rank_q")
        )
        if it == PR_ITERS - 1:
            ranks = ranks.transform(spill_checkpoint)
    return ranks.select(
        F.col("node").alias("part"),
        "rank_q",
        F.round(F.col("rank_q") / PR_Q, 9).alias("rank"),
    )


# ---------------------------------------------------------------------------
# bounded multi-source BFS (shortest hop counts)
# ---------------------------------------------------------------------------

BFS_SOURCES = 3     # the BFS_SOURCES smallest part keys in the edge set
BFS_MAX_HOPS = 3    # bounded frontier expansion (production: diameter cap)

_BFS_SQL = f"""
WITH RECURSIVE po AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM po a JOIN po b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
srcs AS (
  SELECT src AS s FROM (SELECT DISTINCT src FROM e) ORDER BY src LIMIT {BFS_SOURCES}
),
walk(s, node, d) AS (
  SELECT s, s, 0 FROM srcs
  UNION
  SELECT w.s, e.dst, w.d + 1
  FROM walk w JOIN e ON e.src = w.node
  WHERE w.d < {BFS_MAX_HOPS}
)
SELECT s AS source, node AS part, CAST(min(d) AS BIGINT) AS hops
FROM walk GROUP BY s, node
"""


@register("graph_bfs_hops", oracle=_BFS_SQL, tags=("graph",))
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded multi-source BFS over the co-purchase graph: minimum
    hop count from each of the BFS_SOURCES smallest part keys to every
    part reachable within BFS_MAX_HOPS — the reachability/distance
    primitive (recommendation radius, blast-radius analysis) and the
    engine's third iterative-shape after cc_star's shrinking star
    forest (O(log n) rounds) and PageRank's fixed power iterations:
    here each round expands a FRONTIER and a min-aggregate folds it
    into the label set, the textbook distributed BFS.

    Integer hop counts make every step engine-exact; the oracle is a
    recursive CTE whose UNION-dedup guarantees termination (same
    discipline as the connected-components oracle), re-deriving the
    same minimum over all <=BFS_MAX_HOPS walks.

    Scale shape: per round ONE keyed join of the current label frame
    onto the checkpointed edge list (src-partitionable, edges shipped
    once on a cluster) and one (source, node) min-aggregate; frontier
    frames are checkpointed so lineage stays flat. The hop bound caps
    rounds at BFS_MAX_HOPS regardless of graph size; label-frame width
    is (source, node, hop) triples — never paths."""
    e = _copurchase_edges(spark, sf_dir)
    srcs = (
        e.select("src").distinct().orderBy("src").limit(BFS_SOURCES)
    )
    labels = srcs.select(
        F.col("src").alias("s"), F.col("src").alias("node"), F.lit(0).alias("d")
    ).transform(spill_checkpoint)
    frontier = labels
    for _ in range(BFS_MAX_HOPS):
        steps = (
            frontier.join(e, frontier.node == e.src)
            .select("s", F.col("dst").alias("node"), (F.col("d") + 1).alias("d"))
        )
        new_labels = (
            labels.unionByName(steps)
            .groupBy("s", "node")
            .agg(F.min("d").alias("d"))
            .transform(spill_checkpoint)
        )
        # next frontier: nodes whose label changed this round (a plain
        # anti-join on the (s, node, d) triple)
        frontier = new_labels.join(labels, ["s", "node", "d"], "left_anti")
        labels = new_labels
    return labels.select(
        F.col("s").alias("source"),
        F.col("node").alias("part"),
        F.col("d").cast("long").alias("hops"),
    )


# ---------------------------------------------------------------------------
# triangle counting (degree-ordered orientation) + clustering coefficient
# ---------------------------------------------------------------------------

def _undirected_degrees(e_id: DataFrame) -> DataFrame:
    """Undirected degrees from the half-sized ordered pair list via a
    skinny union-agg — the symmetric edge list is never materialized."""
    return (
        e_id.select(F.col("src").alias("node"))
        .unionAll(e_id.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )


def _cf_triangles(e_id: DataFrame, deg: DataFrame) -> DataFrame:
    """COMPACT-FORWARD exact triangle count over an ordered (src<dst)
    edge list: broadcast degree re-orientation, per-node sorted
    out-neighbor arrays, triangles per oriented edge (a, b) =
    |N+(a) ∩ N+(b)| via map-side array_intersect — ONE array-carrying
    shuffle join (the wedge-byte floor), shared by the exact query and
    the DOULION estimator (which feeds it the sparsified edges).
    Returns a 1-row frame with column ``t``."""
    # degree-(then id-)ordered orientation; src < dst already holds,
    # so ties keep the id order and only dd < ds swaps
    keep = F.col("ds") <= F.col("dd")
    e_o = (
        e_id.join(
            F.broadcast(deg.select(F.col("node").alias("src"), F.col("d").alias("ds"))),
            "src",
        )
        .join(
            F.broadcast(deg.select(F.col("node").alias("dst"), F.col("d").alias("dd"))),
            "dst",
        )
        .select(
            F.when(keep, F.col("src")).otherwise(F.col("dst")).alias("src"),
            F.when(keep, F.col("dst")).otherwise(F.col("src")).alias("dst"),
        )
    )
    adj = (
        e_o.groupBy(F.col("src").alias("node"))
        .agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))
        .transform(spill_checkpoint)
    )
    wedge_carrier = adj.select(
        F.col("nbrs").alias("na"), F.explode("nbrs").alias("dst")
    )
    return (
        wedge_carrier.join(
            adj.select(F.col("node").alias("dst"), F.col("nbrs").alias("nb")), "dst"
        )
        .select(F.size(F.array_intersect("na", "nb")).alias("k"))
        .agg(F.sum("k").alias("t"))
    )


_TRI_SQL = """
WITH po AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM po a JOIN po b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY src),
ori AS (
  SELECT e.src, e.dst
  FROM e
  JOIN deg ds ON ds.node = e.src
  JOIN deg dd ON dd.node = e.dst
  WHERE (ds.d, e.src) < (dd.d, e.dst)
),
wedges AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM ori e1 JOIN ori e2 ON e1.dst = e2.src
),
tri AS (
  SELECT count(*) AS t
  FROM wedges w JOIN ori e3 ON w.a = e3.src AND w.c = e3.dst
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(sum(d) // 2 AS BIGINT) AS n_edges,
         CAST(sum(d * (d - 1) // 2) AS BIGINT) AS n_wedges
  FROM deg
)
SELECT n_nodes, n_edges, n_wedges,
       CAST(t AS BIGINT) AS n_triangles,
       round(3.0 * t / n_wedges, 6) AS global_clustering
FROM stats, tri
"""


# bench demotion (round-10, verdict #5): the exact count held a bench
# slot from round 7 (round-6 verdict #2 — heaviest query, invisible to
# BENCH comparisons) but its wedge-byte floor makes it the documented
# NON-scale path; the headline set should reflect the plan you'd run
# at 100x, which is the DOULION estimator below (bench=True there).
# The exact count stays registered + oracled + rotation-checked.
@register("graph_triangle_count", oracle=_TRI_SQL, tags=("graph",))
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient of the
    co-purchase graph via DEGREE-ORDERED edge orientation — the
    standard distributed-triangle trick (each undirected edge points
    from its lower-(degree, id) endpoint to the higher one, so every
    triangle closes through exactly ONE wedge at its lowest-rank
    vertex, and wedge fan-out is bounded by out-degrees that are
    O(sqrt(m)) on any graph — hub nodes never enumerate their
    neighborhood squares). Wedges come from one oriented self-join,
    closure from one more keyed join; the clustering denominator
    (sum d(d-1)/2) comes from the degree table, not the join. All
    counts exact integers; the coefficient is one rounded division.

    The SPARK side ships the COMPACT-FORWARD form instead of the
    literal wedge join (the oracle keeps the wedge join to pin
    equivalence): per-node sorted out-neighbor arrays, then triangles
    per oriented edge (a, b) = |N+(a) ∩ N+(b)| via map-side
    array_intersect — the wedge stream (sum of out-degrees squared,
    13.8M rows at sf0.1, 8.3B at synth-sf10) is never shuffled as
    ROWS; only the neighbor arrays travel through one keyed join.

    Scale shape (round-8 second-decade rework, PLANS.md): half-sized
    ordered pair distinct → skinny union-agg for undirected degrees →
    BROADCAST degree re-orientation (the node table is
    dimension-sized at every SF; a shuffle join is the documented
    fallback past broadcast limits) → adj build (one edge-keyed agg)
    → ONE array-carrying closure join (adj exploded IS e⋈adj(src),
    so the first closure join of the former plan is free). Degree
    orientation bounds out-degrees (and hence the arrays the join
    carries) by O(sqrt(m)) on any graph — hub nodes never enumerate
    their neighborhood squares. Runtime is wedge-byte-bound: ~linear
    in data growth, the known price of EXACT triangle enumeration
    (edge-sampling estimators are the documented cheaper path when
    exactness can be traded)."""
    # Round-8 second-decade rework (PLANS.md): the former plan built
    # the SYMMETRIC edge list, degree-ordered it through two
    # shuffle joins of the full edge stream, and then ran TWO
    # array-carrying closure joins (e⋈adj(src), then ⋈adj(dst)) —
    # 682 s and a filled disk at synth-sf10. This form starts from the
    # half-sized ordered pair set, gets undirected degrees from a
    # skinny union-agg (never materializing the symmetric list),
    # re-orients by BROADCASTing the degree table (nodes are
    # dimension-sized: parts ≪ edges at every SF — the shuffle-join
    # fallback applies only if the node table ever outgrows broadcast),
    # and derives the wedge carrier by EXPLODING adj (e⋈adj(src) is
    # definitionally adj re-exploded — zero shuffle), leaving exactly
    # ONE array-carrying shuffle join, whose volume is the wedge-byte
    # floor any exact distributed triangle count pays.
    e_id = spill_checkpoint(_ordered_copurchase_pairs(spark, sf_dir))
    deg = _undirected_degrees(e_id)
    tri = _cf_triangles(e_id, deg)
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.floor(F.sum("d") / 2).cast("bigint").alias("n_edges"),
        F.sum(F.floor(F.col("d") * (F.col("d") - 1) / 2)).alias("n_wedges"),
    )
    return stats.crossJoin(F.broadcast(tri)).select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        F.col("t").cast("bigint").alias("n_triangles"),
        F.round(3.0 * F.col("t") / F.col("n_wedges"), 6).alias("global_clustering"),
    )


# ---------------------------------------------------------------------------
# triangle ESTIMATION via edge sparsification (DOULION — Tsourakakis,
# Kang, Miller & Faloutsos, KDD 2009)
# ---------------------------------------------------------------------------

TRI_EST_KEEP_NUM = 1   # keep probability p = NUM/DEN per undirected edge
TRI_EST_KEEP_DEN = 4
# each surviving triangle needed all 3 edges kept -> unbiased estimator
# T_hat = t_sparse / p^3; with p = 1/4 the scale factor is an exact
# integer, so the estimate stays in BIGINT cross-engine
TRI_EST_SCALE = TRI_EST_KEEP_DEN**3 // TRI_EST_KEEP_NUM**3

_TRI_EST_COIN = (
    "CAST(least(src, dst) AS VARCHAR) || '_' || CAST(greatest(src, dst) AS VARCHAR)"
)

_TRI_EST_SQL = f"""
WITH po AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM po a JOIN po b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
es AS (
  SELECT src, dst FROM e
  WHERE {X.md5_long_sql(_TRI_EST_COIN)} % {TRI_EST_KEEP_DEN} < {TRI_EST_KEEP_NUM}
),
deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS d FROM es GROUP BY src),
ori AS (
  SELECT es.src, es.dst
  FROM es
  JOIN deg ds ON ds.node = es.src
  JOIN deg dd ON dd.node = es.dst
  WHERE (ds.d, es.src) < (dd.d, es.dst)
),
wedges AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM ori e1 JOIN ori e2 ON e1.dst = e2.src
),
tri AS (
  SELECT count(*) AS t
  FROM wedges w JOIN ori e3 ON w.a = e3.src AND w.c = e3.dst
),
kept AS (SELECT CAST(count(*) // 2 AS BIGINT) AS kept_edges FROM es)
SELECT kept_edges,
       CAST(t AS BIGINT) AS sampled_triangles,
       CAST(t * {TRI_EST_SCALE} AS BIGINT) AS est_triangles
FROM kept, tri
"""


# bench=True: took the exact count's headline slot in round 10 — the
# estimator IS the 100x plan (data-linear, 0.7% error at sf0.1), so
# it's what the BENCH comparison should track (set stays at 29 heads;
# BASELINE.md round-10 notes the swap per the comparability rule).
@register("graph_triangle_estimate", oracle=_TRI_EST_SQL, tags=("graph",), bench=True)
def graph_triangle_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOULION triangle estimator (Tsourakakis et al., KDD 2009) — the
    documented cheaper path beside graph_triangle_count when exactness
    is tradeable (SCALE.md cliff #6): sparsify the edge set by keeping
    each undirected edge with probability p = 1/4, count triangles
    EXACTLY on the sparsified graph (the same compact-forward
    machinery, _cf_triangles), and scale by p^-3 = 64 — each surviving
    triangle needed all three of its edges kept, so the estimator is
    unbiased; variance vanishes as wedge work shrinks by ~p^2 and
    closure work by ~p^3. The coin is DETERMINISTIC — md5_long of the
    ordered edge key modulo 4 — so the sample is reproducible across
    engines and the whole estimate (sparsification, orientation,
    wedges, closure, scaling) is oracle-exact, not bounds-only like
    the sketch family; the accuracy-vs-exact band is pinned separately
    in tests/test_approx.py against graph_triangle_count.

    Scale shape: identical plan skeleton to the exact query but every
    volume term is scaled — the coin is pushed map-side BELOW the pair
    distinct (a (src, dst) predicate commutes with it; the oracle
    applies it above, output-equivalent), so the graph family's
    dominant shuffle moves ~p of the pair stream, the adjacency
    arrays carry ~p of the out-neighbors, and the one array-carrying
    closure join (the exact query's wedge-byte floor, ~67 GB at
    synth-sf10) moves ~p^2 of the bytes. p is the single
    cost/variance knob; DOULION's guarantee (relative error ~
    1/sqrt(p^3 T)) holds for any fixed p."""
    def coin(src: F.Column, dst: F.Column) -> F.Column:
        return (
            X.md5_long(
                F.concat_ws("_", src.cast("string"), dst.cast("string"))
            )
            % TRI_EST_KEEP_DEN
            < TRI_EST_KEEP_NUM
        )

    e_id = spill_checkpoint(
        _ordered_copurchase_pairs(spark, sf_dir, pre_filter=coin)
    )
    deg = _undirected_degrees(e_id)
    tri = _cf_triangles(e_id, deg)
    kept = e_id.agg(F.count(F.lit(1)).alias("kept_edges"))
    return kept.crossJoin(F.broadcast(tri)).select(
        F.col("kept_edges").cast("bigint").alias("kept_edges"),
        F.col("t").cast("bigint").alias("sampled_triangles"),
        (F.col("t") * TRI_EST_SCALE).cast("bigint").alias("est_triangles"),
    )
