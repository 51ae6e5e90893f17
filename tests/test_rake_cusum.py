"""Semantics tests for text_keyword_rake and events_changepoint_cusum
against pure-Python references on hand-built inputs."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from k8s_log_etl_spark.queries.streaming_batch import CUSUM_H_MULT, CUSUM_SLACK_DIV
from k8s_log_etl_spark.queries.text import (
    RAKE_MAX_PHRASE,
    RAKE_SCORE_Q,
    RAKE_TOP,
    STOPWORDS,
)


def py_rake(texts):
    """Reference RAKE: stopword-split phrases (capped), word scores
    deg/freq in integer micro-units, phrase score = sum of its words'
    scores (per occurrence, divided back by occurrence count)."""
    phrases: list[list[str]] = []
    for t in texts:
        words = [x.lower() for x in t.strip().split() if x]
        cur: list[str] = []
        for w in words:
            if w in STOPWORDS:
                if cur:
                    phrases.append(cur)
                cur = []
            else:
                cur.append(w)
        if cur:
            phrases.append(cur)
    phrases = [p for p in phrases if len(p) <= RAKE_MAX_PHRASE]
    freq: dict[str, int] = {}
    deg: dict[str, int] = {}
    for p in phrases:
        for w in p:
            freq[w] = freq.get(w, 0) + 1
            deg[w] = deg.get(w, 0) + len(p)
    ws = {w: (deg[w] * RAKE_SCORE_Q) // freq[w] for w in freq}
    agg: dict[str, list[int]] = {}
    for p in phrases:
        text = " ".join(p)
        sc = sum(ws[w] for w in p)
        agg.setdefault(text, []).append(sc)
    out = [
        (text, len(text.split()), len(scs), sum(scs) // len(scs))
        for text, scs in agg.items()
    ]
    out.sort(key=lambda r: (-r[3], r[0]))
    return out[:RAKE_TOP]


def _write_docs(tmp_path, texts):
    pd.DataFrame(
        {
            "doc_id": range(1, len(texts) + 1),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    return str(tmp_path)


def test_rake_matches_python_reference(spark, tmp_path):
    from k8s_log_etl_spark.queries.text import text_keyword_rake

    texts = [
        "deep learning of neural networks is the future of machine learning",
        "machine learning and deep learning in production systems",
        "the quick brown fox is a fox and the fox runs",
        "neural networks neural networks a really long run without stops here",
    ]
    d = _write_docs(tmp_path, texts)
    got = [
        (r.phrase, r.n_words, r.n_occurrences, r.score_micro)
        for r in text_keyword_rake(spark, d).collect()
    ]
    assert got == py_rake(texts)
    # RAKE's defining property: multi-word phrases outscore their
    # component single words (degree rewards co-occurrence)
    scores = {p: s for p, _, _, s in got}
    assert scores["deep learning"] > scores.get("fox", 0)


def test_rake_caps_long_runs(spark, tmp_path):
    from k8s_log_etl_spark.queries.text import text_keyword_rake

    # one run of RAKE_MAX_PHRASE + 1 non-stopwords -> excluded entirely
    long_run = " ".join(f"w{i}" for i in range(RAKE_MAX_PHRASE + 1))
    texts = [f"the {long_run} is short phrase", "short phrase of short phrase"]
    d = _write_docs(tmp_path, texts)
    got = {r.phrase for r in text_keyword_rake(spark, d).collect()}
    assert long_run not in got
    assert "short phrase" in got


def py_cusum(series, mean_milli):
    slack = mean_milli // CUSUM_SLACK_DIV
    s, mx, alarms, first = 0, 0, 0, None
    for hour, x in series:
        s = max(0, s + (x * 1000 - mean_milli - slack))
        mx = max(mx, s)
        if s >= CUSUM_H_MULT * mean_milli:
            alarms += 1
            if first is None:
                first = hour
    return alarms, first, mx


def test_cusum_detects_rate_shift(spark, tmp_path):
    from k8s_log_etl_spark.queries.streaming_batch import events_changepoint_cusum

    # type "shift": 12 quiet hours at 2/h then 6 loud hours at 10/h;
    # type "flat": 18 steady hours at 3/h (never alarms)
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    eid = 0
    series = []
    for h in range(18):
        n = 2 if h < 12 else 10
        series.append((base + dt.timedelta(hours=h), n))
        for i in range(n):
            eid += 1
            rows.append((eid, base + dt.timedelta(hours=h, minutes=i), 1, "shift", 1.0, "{}"))
    flat = []
    for h in range(18):
        flat.append((base + dt.timedelta(hours=h), 3))
        for i in range(3):
            eid += 1
            rows.append((eid, base + dt.timedelta(hours=h, minutes=i), 1, "flat", 1.0, "{}"))
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).to_parquet(tmp_path / "events.parquet", index=False)

    got = {
        r.event_type: r.asDict()
        for r in events_changepoint_cusum(spark, str(tmp_path)).collect()
    }
    total_shift = sum(n for _, n in series)
    mean_shift = (total_shift * 1000) // 18
    alarms, first, mx = py_cusum(series, mean_shift)
    assert got["shift"]["mean_milli"] == mean_shift
    assert got["shift"]["n_alarm_hours"] == alarms and alarms > 0
    assert got["shift"]["first_alarm"] == first
    assert got["shift"]["max_cusum_milli"] == mx
    # the changepoint fires AFTER the shift (hour >= 12)
    assert got["shift"]["first_alarm"] >= base + dt.timedelta(hours=12)

    mean_flat = 3000
    a2, f2, m2 = py_cusum(flat, mean_flat)
    assert got["flat"]["n_alarm_hours"] == a2 == 0
    assert got["flat"]["first_alarm"] is None and f2 is None
    assert got["flat"]["max_cusum_milli"] == m2
