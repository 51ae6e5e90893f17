"""Semantics tests for the WordPiece tokenizer family
(wordpiece_train_merges / wordpiece_encode_corpus) on corpora small
enough that the expected answer is computable by a pure-Python
reference implementation of Schuster & Nakajima's algorithm."""

from __future__ import annotations

import pandas as pd
import pytest

from k8s_log_etl_spark.queries.llmprep import (
    WP_MAX_PIECE,
    WP_MERGE_ROUNDS,
    WP_SCORE_Q,
)


def py_wp_train(words_freq: dict[str, int], rounds: int):
    """Reference WordPiece trainer: per round, count corpus-weighted
    adjacent symbol pairs and symbol occurrences over the current
    encodings, pick argmax of (w * Q) // (c_a * c_b) with
    (score DESC, a ASC, b ASC) tie-break, merge greedily leftmost
    non-overlapping everywhere."""
    enc = {t: list(t) for t in words_freq}
    merges = []
    for r in range(rounds):
        pw: dict[tuple[str, str], int] = {}
        cnt: dict[str, int] = {}
        for t, syms in enc.items():
            f = words_freq[t]
            for s in syms:
                cnt[s] = cnt.get(s, 0) + f
            for a, b in zip(syms, syms[1:]):
                pw[(a, b)] = pw.get((a, b), 0) + f
        if not pw:
            break
        scored = [
            ((w * WP_SCORE_Q) // (cnt[a] * cnt[b]), a, b, w)
            for (a, b), w in pw.items()
        ]
        scored.sort(key=lambda x: (-x[0], x[1], x[2]))
        sq, a, b, w = scored[0]
        merges.append((r, a, b, w, sq))
        for t, syms in enc.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            enc[t] = out
    return enc, merges


def py_wp_greedy(term: str, pieces: set[str]) -> list[str]:
    """Reference greedy longest-match-first encode with ## rendering."""
    out, p = [], 0
    while p < len(term):
        for j in range(min(WP_MAX_PIECE, len(term) - p), 0, -1):
            sub = term[p : p + j]
            if sub in pieces:
                out.append(sub if p == 0 else "##" + sub)
                p += j
                break
        else:  # pragma: no cover — single chars are always in pieces
            raise AssertionError("no piece matched")
    return out


def _write_docs(tmp_path, rows):
    pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": ["en"] * len(rows),
            "source": ["s"] * len(rows),
            "n_chars": [len(r[1]) if r[1] else 0 for r in rows],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    return str(tmp_path)


CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog the fox"),
    (2, "the unhappiness of the hugging face tokenizer"),
    (3, "hugging hugging hugging bug bug rug"),
    (4, "UPPER Case Words lower case words"),
]


def _vocab(rows) -> dict[str, int]:
    freq: dict[str, int] = {}
    for _, text in rows:
        for w in text.strip().split():
            w = w.lower()
            if w:
                freq[w] = freq.get(w, 0) + 1
    return freq


def test_wordpiece_merges_match_python_reference(spark, tmp_path):
    from k8s_log_etl_spark.queries.llmprep import wordpiece_train_merges

    d = _write_docs(tmp_path, CORPUS)
    got = [
        (r.rnd, r.a, r.b, r.w, r.score_q)
        for r in wordpiece_train_merges(spark, d).collect()
    ]
    _, want = py_wp_train(_vocab(CORPUS), WP_MERGE_ROUNDS)
    assert got == want


def test_wordpiece_encode_matches_python_reference(spark, tmp_path):
    from k8s_log_etl_spark.queries.llmprep import wordpiece_encode_corpus

    d = _write_docs(tmp_path, CORPUS)
    got = {
        r.term: (r.token_seq, r.n_tokens, r.freq)
        for r in wordpiece_encode_corpus(spark, d).collect()
    }
    vocab = _vocab(CORPUS)
    enc, _ = py_wp_train(vocab, WP_MERGE_ROUNDS)
    pieces = {s for syms in enc.values() for s in syms if len(s) <= WP_MAX_PIECE}
    pieces |= {c for t in vocab for c in t}
    for term, freq in vocab.items():
        seq = py_wp_greedy(term, pieces)
        assert got[term] == (" ".join(seq), len(seq), freq), term
    assert len(got) == len(vocab)  # corpus has < WP_ENCODE_TOP words


def test_wordpiece_score_prefers_rare_pair_over_raw_count(spark, tmp_path):
    """The family-defining property: BPE would merge the most frequent
    pair; WordPiece normalizes by symbol counts and prefers the pair
    whose parts occur ONLY together. 'zq' appears 3x but z and q occur
    nowhere else (score ~ Q/3); 'ab' appears 6x but a and b are
    everywhere (score << Q/3)."""
    from k8s_log_etl_spark.queries.llmprep import wordpiece_train_merges

    rows = [
        (1, "zq zq zq ab ab ab"),
        (2, "ab ab ab ax bx ax bx ax bx"),
    ]
    d = _write_docs(tmp_path, rows)
    first = wordpiece_train_merges(spark, d).orderBy("rnd").collect()[0]
    assert (first.a, first.b) == ("z", "q")
    # and the raw-count winner would have been ('a', 'b'): 6 > 3
    freq = _vocab(rows)
    pw: dict[tuple[str, str], int] = {}
    for t, f in freq.items():
        for a, b in zip(t, t[1:]):
            pw[(a, b)] = pw.get((a, b), 0) + f
    assert max(pw.items(), key=lambda kv: kv[1])[0] == ("a", "b")


def test_wordpiece_encode_is_not_merge_replay(spark, tmp_path):
    """Greedy longest-match can segment a word into pieces its own
    merge history never produced — pin one such case so the encode
    face stays genuinely greedy. With merges building up 'abcd' from
    docs full of 'abcd', the word 'xabcdy' (seen once) greedily grabs
    the full ##abcd piece even though its own merge replay (frequency
    too low to drive merges) would leave it as characters."""
    from k8s_log_etl_spark.queries.llmprep import wordpiece_encode_corpus

    rows = [
        (1, "abcd abcd abcd abcd abcd abcd xabcdy"),
    ]
    d = _write_docs(tmp_path, rows)
    got = {r.term: r.token_seq for r in wordpiece_encode_corpus(spark, d).collect()}
    vocab = _vocab(rows)
    enc, _ = py_wp_train(vocab, WP_MERGE_ROUNDS)
    pieces = {s for syms in enc.values() for s in syms if len(s) <= WP_MAX_PIECE}
    pieces |= {c for t in vocab for c in t}
    for term in vocab:
        want = py_wp_greedy(term, pieces)
        assert got[term] == " ".join(want), term
    # the property itself: if training fused abcd, the rare word reuses it
    if "abcd" in pieces:
        assert "##abcd" in got["xabcdy"] or got["xabcdy"].startswith("xabcd") or (
            "abcd" in got["xabcdy"]
        )
