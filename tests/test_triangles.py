"""graph_triangle_count on a hand-built graph: one K3, one pendant
edge, one K4 — 5 triangles, 17 wedges, clustering 15/17."""

from __future__ import annotations

import pandas as pd
import pytest

from k8s_log_etl_spark.queries.graph import graph_triangle_count

# orders (baskets) -> co-purchase cliques: {1,2,3} K3, {3,4} edge,
# {5,6,7,8} K4
BASKETS = {10: [1, 2, 3], 20: [3, 4], 30: [5, 6, 7, 8]}

LINEITEM = pd.DataFrame(
    [(ok, pk) for ok, parts in BASKETS.items() for pk in parts],
    columns=["l_orderkey", "l_partkey"],
)


@pytest.fixture(scope="module")
def tri_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tri_graph")
    LINEITEM.to_parquet(d / "lineitem.parquet", index=False)
    return str(d)


def test_triangles_hand_graph(spark, tri_sf_dir):
    r = graph_triangle_count(spark, tri_sf_dir).collect()[0]
    assert r["n_nodes"] == 8
    assert r["n_edges"] == 10           # 3 (K3) + 1 + 6 (K4)
    assert r["n_wedges"] == 17          # 1+1+3+0 + 4*3
    assert r["n_triangles"] == 5        # 1 (K3) + 4 (K4)
    assert r["global_clustering"] == pytest.approx(15 / 17, abs=1e-6)
