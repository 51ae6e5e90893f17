"""Pin the bench cross-round artifact machinery (round 12): the full
BENCH_full_r{N}.json artifact is preferred for previous-round medians,
a sub-scale (smoke) artifact is distrusted, and a driver wrapper whose
JSON line overflowed the 2000-char tail capture is reconstructed from
the surviving tail by balanced-brace extraction. Next round's
medians-vs-medians comparison rides on these paths — a silent fallthrough
to the wrong source would corrupt the adjudication, so every branch is
pinned here (pure Python, no Spark session).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _write(tmp_path, name, obj):
    p = tmp_path / name
    p.write_text(json.dumps(obj))
    return str(p)


def test_full_artifact_preferred(tmp_path):
    _write(
        tmp_path,
        "BENCH_full_r11.json",
        {
            "sf": 0.1,
            "queries": {"q": 2.0},
            "calibration": {
                "start": {"wide32_sec": 1.24},
                "end": {"wide32_sec": 1.24},
            },
        },
    )
    # a driver wrapper also exists with DIFFERENT numbers — full wins
    _write(
        tmp_path,
        "BENCH_r11.json",
        {"parsed": {"queries": {"q": 9.0}, "calibration": None}},
    )
    prev, factor = bench._load_prev_bench(str(tmp_path), "BENCH_r11.json")
    assert prev == {"q": 2.0}
    assert factor == 1.0


def test_smoke_scale_artifact_distrusted(tmp_path):
    # an sf0.001 full artifact must NOT be used: fall through to the
    # driver wrapper's parsed block
    _write(
        tmp_path, "BENCH_full_r11.json", {"sf": 0.001, "queries": {"q": 0.1}}
    )
    _write(
        tmp_path,
        "BENCH_r11.json",
        {"parsed": {"queries": {"q": 9.0}, "calibration": None}},
    )
    prev, factor = bench._load_prev_bench(str(tmp_path), "BENCH_r11.json")
    assert prev == {"q": 9.0}
    assert factor is None


def test_tail_reconstruction_from_truncated_wrapper(tmp_path):
    # the round-11 failure mode: parsed null, only the LAST 2000 chars
    # of the JSON line survive — containing the samples block and the
    # calibration factor. Medians come back as sorted(v)[len//2].
    line = json.dumps(
        {
            "samples": {"a": [1.0, 3.0, 2.0], "b": [5.0, 4.0, 6.0]},
            "calibration": {"factor": 1.194},
        }
    )
    _write(
        tmp_path,
        "BENCH_r11.json",
        {"parsed": None, "tail": "…truncated head…" + line},
    )
    prev, factor = bench._load_prev_bench(str(tmp_path), "BENCH_r11.json")
    assert prev == {"a": 2.0, "b": 5.0}
    assert factor == 1.194


def test_tail_without_samples_is_unrecoverable(tmp_path):
    _write(tmp_path, "BENCH_r11.json", {"parsed": None, "tail": "no json here"})
    assert bench._load_prev_bench(str(tmp_path), "BENCH_r11.json") == (
        None,
        None,
    )


def test_balanced_object_ignores_unbalanced_garbage():
    # a tail cut INSIDE the samples block must not half-parse
    text = '"samples": {"a": [1.0, 2.'
    assert bench._balanced_object_after(text, "samples") is None


def test_committed_r11_wrapper_reconstructs():
    """The real committed BENCH_r11.json must reconstruct to the 29
    medians summing to the round-11 verdict's 52.07 s — the actual
    basis of the round-12 medians comparison."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if not os.path.exists(os.path.join(here, "BENCH_r11.json")):
        return  # fresh checkout without driver artifacts
    prev, factor = bench._load_prev_bench(here, "BENCH_r11.json")
    assert prev is not None and len(prev) == 29
    assert abs(sum(prev.values()) - 52.07 ) < 0.02
    assert factor == 1.194


def test_operator_metrics_vs_prev_flags_drift(tmp_path, monkeypatch):
    """The round-12 verdict #5 drift flagger: exchange-count changes
    and parallelism collapses surface in `drift`; stable heads don't.
    Pure artifact machinery — previous round's operator_metrics come
    from its BENCH_full file, the round boundary from the same
    strictly-below rule the medians comparison uses."""
    monkeypatch.setenv("SPARK_GRAFT_ROUND", "13")
    _write(tmp_path, "BENCH_r12.json", {"tail": ""})
    _write(
        tmp_path,
        "BENCH_full_r12.json",
        {
            "sf": 0.1,
            "queries": {"stable": 2.0, "shuffly": 2.0, "collapsed": 2.0},
            "operator_metrics": {
                "stable": {
                    "n_nodes": 10,
                    "n_exchanges": 2,
                    "ops": [{"i": 1, "op": "WholeStageCodegen (1)",
                             "pipelineTime": 4000}],
                },
                "shuffly": {"n_nodes": 12, "n_exchanges": 3, "ops": []},
                "collapsed": {
                    "n_nodes": 8,
                    "n_exchanges": 1,
                    "ops": [{"i": 1, "op": "WholeStageCodegen (1)",
                             "pipelineTime": 20000}],
                },
            },
        },
    )
    cur = {
        "stable": {
            "n_nodes": 10,
            "n_exchanges": 2,
            "ops": [{"i": 1, "op": "WholeStageCodegen (1)",
                     "pipelineTime": 4100}],
        },
        "shuffly": {"n_nodes": 14, "n_exchanges": 5, "ops": []},
        "collapsed": {
            "n_nodes": 8,
            "n_exchanges": 1,
            "ops": [{"i": 1, "op": "WholeStageCodegen (1)",
                     "pipelineTime": 2000}],
        },
    }
    timings = {"stable": 2.1, "shuffly": 2.1, "collapsed": 2.0}
    out = bench._operator_metrics_vs_prev(cur, timings, str(tmp_path))
    assert out["prev"] == "BENCH_full_r12.json"
    assert out["heads"]["stable"]["n_exchanges"] == [2, 2]
    assert out["heads"]["shuffly"]["n_exchanges"] == [3, 5]
    # collapsed: 20000ms/2.0s = 10x -> 2000ms/2.0s = 1x
    assert out["heads"]["collapsed"]["parallelism"] == [10.0, 1.0]
    drift = "\n".join(out["drift"])
    assert "shuffly: exchanges 3 -> 5" in drift
    assert "collapse" in drift and "collapsed" in drift
    assert "stable" not in drift


def test_operator_metrics_vs_prev_absent_when_no_prev(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_ROUND", "13")
    assert bench._operator_metrics_vs_prev({}, {}, str(tmp_path)) is None


def test_inferred_round_never_overwrites_existing_artifact(tmp_path, monkeypatch):
    """Round-13 verdict #8: re-running bench.py on a judged tree (no
    SPARK_GRAFT_ROUND, this round's artifact already committed) must
    NOT overwrite it — the write is redirected to
    BENCH_full_inferred.json. A pinned round keeps the canonical name
    (overwriting your own round's artifact mid-round is the normal
    measure/re-measure flow)."""
    existing = tmp_path / "BENCH_full_r14.json"
    existing.write_text("{}")
    # inferred + exists -> side file
    assert bench._artifact_target(str(tmp_path), 14, True).endswith(
        "BENCH_full_inferred.json"
    )
    # pinned round -> canonical name even though it exists
    assert bench._artifact_target(str(tmp_path), 14, False) == str(existing)
    # inferred but nothing committed yet -> canonical name
    assert bench._artifact_target(str(tmp_path), 15, True).endswith(
        "BENCH_full_r15.json"
    )


def test_current_round_ex_flags_inference(tmp_path, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_ROUND", raising=False)
    monkeypatch.setattr(bench.sys, "argv", ["bench.py"])
    (tmp_path / "BENCH_r13.json").write_text("{}")
    assert bench._current_round_ex(str(tmp_path)) == (14, True)
    monkeypatch.setenv("SPARK_GRAFT_ROUND", "14")
    assert bench._current_round_ex(str(tmp_path)) == (14, False)
