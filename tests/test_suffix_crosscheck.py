"""Suffix-LCP cross-check for dedup_substring_spans (round-9 verdict
lead #7): the registered query derives duplicated passages from runs
of repeated 5-grams; Lee et al. 2021 derive them from a suffix array.
The docstring's equivalence claim — "every repeated substring of
>= SPAN_NGRAM words is a run of repeated 5-grams" — is checked here by
an INDEPENDENT suffix-based model: a word position starts a duplicated
gram iff its suffix has word-LCP >= SPAN_NGRAM with some suffix of a
DIFFERENT document (the quantity a suffix array reads off its LCP
neighbors; computed brute-force over suffix pairs at test scale —
identical maxima, no shared code path with the query)."""

from __future__ import annotations

import random

import pandas as pd

from k8s_log_etl_spark.queries.dedup import SPAN_NGRAM, dedup_substring_spans


def _lcp(a: list[str], b: list[str], cap: int) -> int:
    n = 0
    for x, y in zip(a, b):
        if x != y or n >= cap:
            break
        n += 1
    return n


def py_suffix_spans(texts: dict[int, str]):
    """Maximal duplicated spans via the suffix-LCP definition."""
    words = {d: t.strip().split() for d, t in texts.items()}
    suffixes = [
        (d, i, ws[i:]) for d, ws in words.items() for i in range(len(ws))
    ]
    dup_start: dict[int, set] = {d: set() for d in words}
    for d, i, s in suffixes:
        if len(s) < SPAN_NGRAM:
            continue
        for d2, _j, s2 in suffixes:
            if d2 == d:
                continue
            if _lcp(s, s2, SPAN_NGRAM) >= SPAN_NGRAM:
                dup_start[d].add(i)
                break
    out = set()
    for d, starts in dup_start.items():
        for i in sorted(starts):
            if i - 1 in starts:
                continue  # not a run head
            j = i
            while j + 1 in starts:
                j += 1
            out.add((d, i, j + SPAN_NGRAM - 1, j - i + 1))
    return out


def _run(spark, tmp_path, texts):
    pd.DataFrame(
        {
            "doc_id": list(texts),
            "text": list(texts.values()),
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts.values()],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    got = {
        (r["doc_id"], r["span_start"], r["span_end_word"], r["n_grams"])
        for r in dedup_substring_spans(spark, str(tmp_path)).collect()
    }
    assert got == py_suffix_spans(texts)


def test_crafted_cases(spark, tmp_path):
    shared7 = "alpha beta gamma delta epsilon zeta eta"  # 7 words: 1 span
    shared4 = "one two three four"  # 4 words: BELOW threshold, no span
    texts = {
        0: f"intro words here {shared7} and a tail",
        1: f"{shared7} leading elsewhere {shared4} trailing bits again",
        2: f"padding {shared4} more padding stuff keeps going onward",
        # two overlapping shared passages must merge into ONE span
        3: "p q r s t u v w x y z unique0 filler0",
        4: "p q r s t u v moreA moreB",
        5: "junkA junkB t u v w x y z junkC",
    }
    _run(spark, tmp_path, texts)


def test_randomized_corpora(spark, tmp_path):
    rng = random.Random(4242)
    vocab = [f"w{k}" for k in range(12)]  # tiny vocab forces repeats
    texts = {
        d: " ".join(rng.choice(vocab) for _ in range(rng.randint(8, 28)))
        for d in range(18)
    }
    _run(spark, tmp_path, texts)
