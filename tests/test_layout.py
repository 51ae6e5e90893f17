"""layout_zorder_stats: pin the design claim — the z-order layout
prunes on BOTH probe dimensions while the single-sort layout degrades
to a full scan on the non-sort dimension."""

from __future__ import annotations

from k8s_log_etl_spark.queries.relational import layout_zorder_stats


def test_zorder_prunes_both_dims_linear_only_one(spark, sf_dir):
    rows = {r["layout"]: r for r in layout_zorder_stats(spark, sf_dir).collect()}
    zo, lx = rows["zorder"], rows["linear_x"]
    total_rows = None  # linear_x scans everything for the y predicate
    # the sort-key predicate prunes under BOTH layouts
    assert lx["files_scanned_x"] < lx["files_total"]
    assert zo["files_scanned_x"] < zo["files_total"]
    # the non-sort-key predicate: linear must scan every file...
    assert lx["files_scanned_y"] == lx["files_total"]
    total_rows = lx["rows_scanned_y"]
    # ...while z-order skips most of the data
    assert zo["files_scanned_y"] < zo["files_total"]
    assert zo["rows_scanned_y"] < total_rows
