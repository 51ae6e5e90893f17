"""MERGE INTO (upsert + delete) as one keyed full-outer join.

The warehouse mutation primitive between snapshot_diff (which only
DESCRIBES drift) and the SCD2 fold (which keeps history): apply a
change batch carrying upserts and delete markers to a target table and
produce the next table version in a single pass — exactly the logical
plan Delta Lake / Iceberg MERGE INTO lowers to, expressed directly on
DataFrames:

  WHEN MATCHED AND source.is_delete        THEN DELETE
  WHEN MATCHED                             THEN UPDATE SET *
  WHEN NOT MATCHED AND NOT source.is_delete THEN INSERT *
  (unmatched deletes are no-ops, per standard MERGE)

Scale shape (100 TB): ONE full-outer equi-join on the merge key —
change batches are delta-sized, so AQE plans the source side as the
small build; everything else is a map-side CASE projection. No window,
no second pass, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: the per-row outcome column added to the merged output
ACTION = "action"


def merge_upsert(
    target: DataFrame,
    changes: DataFrame,
    keys: list[str],
    delete_col: str = "is_delete",
) -> DataFrame:
    """Apply `changes` (same columns as `target` plus a boolean
    `delete_col`) to `target` on `keys`. Returns the NEXT table
    version annotated with `action`:

    * ``kept``     — target row untouched by the batch (values kept)
    * ``updated``  — matched upsert (values from the batch)
    * ``inserted`` — unmatched upsert (values from the batch)
    * ``deleted``  — matched delete marker: the row is REMOVED from the
      next version; it stays in this audit frame with every value
      column NULL so a caller can either count deletions or
      ``filter(action != 'deleted')`` to get the clean next version.

    Unmatched delete markers are dropped entirely (MERGE no-op)."""
    value_cols = [c for c in target.columns if c not in keys]
    t = target.withColumn("_t_present", F.lit(True)).alias("t")
    s = changes.withColumn("_s_present", F.lit(True)).alias("s")
    j = t.join(s, keys, "full_outer")

    in_t = F.col("t._t_present").isNotNull()
    in_s = F.col("s._s_present").isNotNull()
    # round-6 ADVICE: coalesce the delete flag — a NULL is_delete on an
    # UNMATCHED change row would otherwise make every branch NULL
    # (in_s & ~NULL is NULL) and silently DROP the row, while the
    # registered query's oracle (COALESCE(is_delete, FALSE)) calls it
    # "inserted". NULL marker == not a delete, matching the oracle.
    is_del = in_s & F.coalesce(F.col(f"s.{delete_col}"), F.lit(False))

    action = (
        F.when(in_t & is_del, "deleted")
        .when(in_t & in_s, "updated")
        .when(in_s & ~is_del, "inserted")
        .when(in_t & ~in_s, "kept")
    )
    merged_vals = [
        F.when(action == "deleted", F.lit(None))
        .when(in_s, F.col(f"s.{c}"))
        .otherwise(F.col(f"t.{c}"))
        .alias(c)
        for c in value_cols
    ]
    return (
        j.select(*keys, action.alias(ACTION), *merged_vals)
        .filter(F.col(ACTION).isNotNull())
    )
