"""Span excision: APPLY detected word-index spans to documents.

`dedup_substring_spans` (cross-doc duplicated passages, Lee et al.
2021) and `contamination_spans` (benchmark leakage) DETECT spans;
production pipelines must also apply them — cut the flagged word
ranges out of the text and keep the rest, the same detect→apply pair
as pii_scan_documents → redact_documents. This module is the apply
step, shared by both detectors (their outputs share the
(doc_id, span_start, span_end_word) schema).

Scale shape: one keyed join of the (small, hit-sparse) span frame
grouped per doc onto documents, then a purely map-side rewrite —
split, indexed-filter against the collected span list, reassemble.
The per-word coverage test is O(words x spans_in_doc) inside a JVM
higher-order function; spans per doc are bounded by hits, not doc
length, so the rewrite stays linear in corpus size with no extra
shuffle beyond the single join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def excise_spans(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cut inclusive word-index ranges out of each affected document.

    `spans` rows are (id_col, span_start, span_end_word): 0-based word
    indices into whitespace-split(trim(text)), both ends inclusive —
    exactly what the span detectors emit. Overlapping spans are
    handled (a word is removed if ANY span covers it). Returns one row
    per AFFECTED doc: the cleaned text, words-removed count, and span
    count; untouched docs pass through the calling pipeline unchanged
    (inner join — same affected-rows-only contract as
    redact_documents).
    """
    sp = spans.groupBy(id_col).agg(
        F.collect_list(
            F.struct(
                F.col("span_start").alias("s"), F.col("span_end_word").alias("e")
            )
        ).alias("_spans")
    )
    j = docs.join(sp, id_col)
    words = F.split(F.trim(F.col(text_col)), r"\s+")

    def uncovered(w: Column, i: Column) -> Column:
        return ~F.exists(
            "_spans", lambda s: (s.getField("s") <= i) & (i <= s.getField("e"))
        )

    kept = F.filter(words, uncovered)
    return j.select(
        id_col,
        F.concat_ws(" ", kept).alias("clean_text"),
        (F.size(words) - F.size(kept)).cast("long").alias("n_words_removed"),
        F.size("_spans").cast("long").alias("n_spans"),
    )
