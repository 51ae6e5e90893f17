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

from k8s_log_etl_spark.plans.registry import register
from k8s_log_etl_spark.tables import load_table

PR_Q = 10**12       # rank quantization (integer Q-units)
PR_ITERS = 3        # fixed unrolled iterations (oracle matches)
PR_DAMP_NUM = 85    # damping 0.85 as an integer ratio
PR_DAMP_DEN = 100


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


@register("graph_pagerank_copurchase", oracle=_pr_sql(), tags=("graph",))
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

    Scale shape — the standard distributed PageRank: edges are built
    map-side from per-order sorted part lists (the parts_copurchased
    grouped-expansion discipline, bounded by TPC-H's <= 7 lines/order),
    then each iteration is ONE join of ranks onto the edge list keyed
    on src (co-partitionable: the edge frame is checkpointed once and
    reused every round, so a cluster would hash-partition it by src
    once and ship only the rank vector per round) plus ONE dst-keyed
    aggregate. Driver sync per round: nothing — the only driver scalar
    is the node count N, fetched once before the loop (same role as
    the k-means centroid sync). Dangling nodes cannot exist (the edge
    set is symmetric, so in-degree = out-degree >= 1 for every node).

    Reference surface: none (the Go reference has no joins at all);
    this extends SURVEY §2c's iterative family. PageRank itself is
    public literature (Page et al. 1999)."""
    li = load_table(spark, sf_dir, "lineitem")
    po = li.select("l_orderkey", "l_partkey").distinct()
    per_order = po.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    ps = F.col("ps")
    # symmetric directed pairs expanded map-side: for the sorted list
    # [p1..pk] emit every ordered pair (pi, pj), i != j
    pair_list = F.flatten(
        F.transform(
            ps,
            lambda x: F.transform(
                F.array_remove(ps, x),
                lambda y: F.struct(x.alias("src"), y.alias("dst")),
            ),
        )
    )
    e = (
        per_order.select(F.explode(pair_list).alias("p"))
        .select(F.col("p.src").alias("src"), F.col("p.dst").alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("d"))
    n_nodes = deg.count()  # the single driver scalar (pre-loop, like k-means)
    base = PR_Q // n_nodes
    teleport = (15 * base) // PR_DAMP_DEN

    ranks = deg.select(F.col("src").alias("node"), F.lit(base).alias("rank_q"))
    for _ in range(PR_ITERS):
        contrib = (
            e.join(ranks, e.src == ranks.node)
            .join(deg, "src")
            .select("dst", F.expr("rank_q div d").alias("c"))
        )
        ranks = (
            contrib.groupBy(F.col("dst").alias("node"))
            .agg(
                (
                    F.lit(teleport)
                    + F.expr(f"({PR_DAMP_NUM} * sum(c)) div {PR_DAMP_DEN}")
                ).alias("rank_q")
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(
        F.col("node").alias("part"),
        "rank_q",
        F.round(F.col("rank_q") / PR_Q, 9).alias("rank"),
    )
