"""Snapshot comparison and slowly-changing-dimension history.

Two warehouse staples a 100 TB pipeline runs between table versions:

* `snapshot_diff` — CDC-style diff of two snapshots of the same table:
  which keys were added, removed, or changed. One full-outer join on
  the key plus a row-fingerprint comparison — both sides shuffle on the
  key exactly once; the fingerprint (xxhash64 over the non-key columns)
  collapses arbitrary row width into one 64-bit compare, so the join
  carries keys + hashes, not whole rows.

* `scd2_apply` — type-2 slowly-changing-dimension merge: fold a new
  snapshot into a (valid_from, valid_to) history. Current rows whose
  attributes changed are closed out at the batch timestamp; changed and
  brand-new keys open new current rows; vanished keys close without a
  successor. Expressed as joins + unions (no MERGE INTO — no table
  format here); every step is keyed on the natural key, so the whole
  fold is two hash joins and a union at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OPEN_TO = "9999-12-31 00:00:00"


def _align_attrs(
    old: DataFrame, new: DataFrame, key_cols: list[str]
) -> tuple[DataFrame, DataFrame, list[str]]:
    """Project both snapshots onto the UNION of their attribute columns
    (null-filling each side's missing ones, typed from the side that has
    them), so schema evolution between drops — the most common real CDC
    event — diffs instead of breaking. Semantics: a column added with
    NULLs leaves rows unchanged; a non-NULL value in an added (or a
    dropped non-NULL) column flags the row as changed, because NULL is
    exactly what the other snapshot's null-fill carries. Column order is
    old's order then new-only columns in new's order, so the fingerprint
    layout is deterministic."""
    old_attrs = [c for c in old.columns if c not in key_cols]
    new_attrs = [c for c in new.columns if c not in key_cols]
    union_attrs = old_attrs + [c for c in new_attrs if c not in old_attrs]
    new_types = dict(new.dtypes)
    old_types = dict(old.dtypes)

    def project(df: DataFrame, have: list[str], other_types: dict) -> DataFrame:
        cols = [F.col(c) for c in key_cols]
        for c in union_attrs:
            if c in have:
                cols.append(F.col(c))
            else:
                cols.append(F.lit(None).cast(other_types[c]).alias(c))
        return df.select(*cols)

    return (
        project(old, old_attrs, new_types),
        project(new, new_attrs, old_types),
        union_attrs,
    )


def _fingerprint(df: DataFrame, key_cols: list[str]) -> DataFrame:
    # Each attribute contributes an explicit is-null flag alongside its
    # string form, so NULL and any literal value (including one that
    # stringifies to a would-be sentinel like '\x00') hash differently;
    # the fixed two-args-per-column layout keeps column boundaries
    # unambiguous even though xxhash64 folds NULL args as identity.
    attrs = [c for c in df.columns if c not in key_cols]
    parts: list = []
    for c in attrs:
        parts.append(F.col(c).isNull().cast("int"))
        parts.append(F.col(c).cast("string"))
    return df.withColumn("_fp", F.xxhash64(*parts))


def snapshot_diff(
    old: DataFrame, new: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Rows of (key..., change_type) with change_type in
    {'added', 'removed', 'changed'}; unchanged keys are omitted.
    Snapshot schemas may differ (columns added/dropped between drops):
    attributes are aligned onto their union first, NULL-filled, so an
    added column only marks rows changed where it actually carries a
    value."""
    old, new, _ = _align_attrs(old, new, key_cols)
    o = _fingerprint(old, key_cols).select(
        *key_cols, F.col("_fp").alias("_fp_old")
    )
    n = _fingerprint(new, key_cols).select(
        *key_cols, F.col("_fp").alias("_fp_new")
    )
    joined = o.join(n, key_cols, "full_outer")
    change = (
        F.when(F.col("_fp_old").isNull(), "added")
        .when(F.col("_fp_new").isNull(), "removed")
        .when(F.col("_fp_old") != F.col("_fp_new"), "changed")
    )
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(*key_cols, "change_type")
    )


def scd2_init(snapshot: DataFrame, ts: str) -> DataFrame:
    """Open a fresh history from the first snapshot."""
    return snapshot.withColumn(
        "valid_from", F.lit(ts).cast("timestamp")
    ).withColumn("valid_to", F.lit(OPEN_TO).cast("timestamp"))


def scd2_apply(
    history: DataFrame, snapshot: DataFrame, key_cols: list[str], ts: str
) -> DataFrame:
    """Fold `snapshot` (the table's state at `ts`) into the SCD2
    history: closed rows pass through; current rows close at `ts` when
    their key changed or vanished; changed and new keys open fresh
    current rows. The snapshot's schema may have evolved since the
    history was opened: the diff aligns attribute schemas internally,
    and the final union is by name with missing columns NULL-filled, so
    an added column appears (NULL) on pre-existing history rows and a
    dropped column survives (NULL on new rows) — history accretes the
    union of all schemas it has seen."""
    ts_col = F.lit(ts).cast("timestamp")
    closed = history.filter(F.col("valid_to") != F.lit(OPEN_TO).cast("timestamp"))
    current = history.filter(F.col("valid_to") == F.lit(OPEN_TO).cast("timestamp"))

    # The diff frame feeds THREE consumers (still-current anti-join,
    # closing semi-join, opening semi-join); without a checkpoint each
    # consumer re-executes the full-outer fingerprint join (measured:
    # 21 -> 9 exchanges on the corpus_scd2_history plan). On a cluster
    # this materialization is a staged intermediate instead.
    diff = snapshot_diff(
        current.drop("valid_from", "valid_to"), snapshot, key_cols
    ).localCheckpoint(eager=False)
    changed_or_removed = diff.filter(
        F.col("change_type").isin("changed", "removed")
    ).select(*key_cols)
    changed_or_added = diff.filter(
        F.col("change_type").isin("changed", "added")
    ).select(*key_cols)

    still_current = current.join(changed_or_removed, key_cols, "left_anti")
    closing = current.join(changed_or_removed, key_cols, "left_semi").withColumn(
        "valid_to", ts_col
    )
    opening = snapshot.join(changed_or_added, key_cols, "left_semi").select(
        *snapshot.columns,
        ts_col.alias("valid_from"),
        F.lit(OPEN_TO).cast("timestamp").alias("valid_to"),
    )
    return (
        closed.unionByName(still_current, allowMissingColumns=True)
        .unionByName(closing, allowMissingColumns=True)
        .unionByName(opening, allowMissingColumns=True)
    )
