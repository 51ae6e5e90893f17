"""select_kcenter_coreset: the greedy farthest-point traversal must
match a pure-Python Gonzalez reference exactly (quantized integer
distances, vec_id tie-breaks), and the selection radii must obey
Gonzalez's non-increasing invariant."""

from __future__ import annotations

import pandas as pd

from k8s_log_etl_spark.queries.similarity import (
    DIST_QUANT,
    KC_K,
    select_kcenter_coreset,
)


def _qd(a: list[float], b: list[float]) -> int:
    acc = 0.0
    for x, c in zip(a, b):
        acc += (float(x) - float(c)) * (float(x) - float(c))
    # fixture coordinates are integers, so acc * QUANT is exact — no
    # rounding-mode ambiguity to replicate
    return int(round(acc * DIST_QUANT))


def py_kcenter(vecs: dict[int, list[float]]):
    ids = sorted(vecs)
    seed = ids[0]
    out = [(0, seed, 0)]
    dq = {i: _qd(vecs[i], vecs[seed]) for i in ids}
    for r in range(1, KC_K + 1):
        top = sorted(ids, key=lambda i: (-dq[i], i))[0]
        out.append((r, top, dq[top]))
        if r < KC_K:
            for i in ids:
                dq[i] = min(dq[i], _qd(vecs[i], vecs[top]))
    return out


def test_kcenter_matches_python_reference(spark, tmp_path):
    # three well-separated integer clusters + outliers in 4-d: the
    # traversal must hop between clusters before densifying any
    vecs = {
        0: [0.0, 0.0, 0.0, 0.0],
        1: [1.0, 0.0, 0.0, 0.0],
        2: [0.0, 1.0, 0.0, 0.0],
        3: [100.0, 0.0, 0.0, 0.0],
        4: [101.0, 1.0, 0.0, 0.0],
        5: [0.0, 0.0, 100.0, 0.0],
        6: [1.0, 0.0, 101.0, 0.0],
        7: [50.0, 50.0, 50.0, 50.0],
        8: [0.0, 0.0, 0.0, 200.0],
        9: [2.0, 2.0, 0.0, 0.0],
        10: [100.0, 0.0, 1.0, 0.0],
        11: [0.0, 1.0, 100.0, 0.0],
    }
    pd.DataFrame(
        {
            "vec_id": list(vecs),
            "embedding": [list(v) for v in vecs.values()],
            "label": [0] * len(vecs),
        }
    ).to_parquet(tmp_path / "embeddings.parquet", index=False)
    got = sorted(
        (r["sel_round"], r["vec_id"], r["radius_q"])
        for r in select_kcenter_coreset(spark, str(tmp_path)).collect()
    )
    expected = sorted(py_kcenter(vecs))
    assert got == expected
    # Gonzalez invariant: selection radius is non-increasing in the
    # round (each pick can only shrink the remaining coverage gap)
    radii = [rad for rnd, _v, rad in sorted(got)][1:]
    assert radii == sorted(radii, reverse=True)
    # the witness row's radius is the k-center objective of the full
    # coreset and must be no larger than the last pick's
    assert got[-1][0] == KC_K
    # distinct centers (no point selected twice while coverage > 0)
    picked = [v for rnd, v, _rad in got if rnd < KC_K]
    assert len(set(picked)) == len(picked)
