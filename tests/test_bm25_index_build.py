"""_bm25_index_build's atomic staged publish (round-10 ADVICE): the
three-table index only ever becomes visible as a whole — a reader can
never observe a partially-written index under the completion marker,
a stale partial destination (killed pre-atomic build) is cleared and
republished, and no staging litter survives a successful build."""

from __future__ import annotations

import os
import shutil

import pytest

from k8s_log_etl_spark.queries.llmprep import _bm25_index_build
from k8s_log_etl_spark.tables import dataset_cache_path

SRC_SF = "/root/testdata/sf0.001"
KIND = "bm25index_buildtest"


@pytest.fixture()
def sf_dir(tmp_path):
    if not os.path.exists(os.path.join(SRC_SF, "documents.parquet")):
        pytest.skip("sf0.001 testdata not present")
    d = str(tmp_path / "sf")
    os.makedirs(d)
    shutil.copy(
        os.path.join(SRC_SF, "documents.parquet"),
        os.path.join(d, "documents.parquet"),
    )
    return d


def _no_stage_litter(path: str) -> bool:
    parent = os.path.dirname(path)
    return not [n for n in os.listdir(parent) if ".stage-" in n]


def test_build_publishes_all_three_tables_atomically(spark, sf_dir):
    path = _bm25_index_build(spark, sf_dir, KIND, None)
    for sub in ("postings", "terms", "totals"):
        assert os.path.exists(os.path.join(path, sub, "_SUCCESS")), sub
    assert _no_stage_litter(path)
    tot = spark.read.parquet(os.path.join(path, "totals")).collect()
    assert len(tot) == 1 and tot[0]["n"] > 0


def test_stale_partial_destination_is_cleared_and_republished(
    spark, sf_dir
):
    """A killed PRE-atomic build could leave a marker-less partial at
    the destination; the staged publish must clear it rather than fail
    the rename forever."""
    path = dataset_cache_path(sf_dir, KIND, "documents")
    os.makedirs(os.path.join(path, "postings"), exist_ok=True)
    with open(os.path.join(path, "postings", "junk.parquet"), "w") as f:
        f.write("not parquet")
    assert not os.path.exists(os.path.join(path, "totals", "_SUCCESS"))
    out = _bm25_index_build(spark, sf_dir, KIND, None)
    assert out == path
    assert os.path.exists(os.path.join(path, "totals", "_SUCCESS"))
    assert not os.path.exists(os.path.join(path, "postings", "junk.parquet"))
    assert _no_stage_litter(path)
    # df counts exactly the published postings (terms derived from the
    # staged table, not a second pipeline run)
    postings = spark.read.parquet(os.path.join(path, "postings"))
    terms = spark.read.parquet(os.path.join(path, "terms"))
    assert terms.count() == postings.select("term").distinct().count()


def test_completed_index_is_not_rebuilt(spark, sf_dir):
    path = _bm25_index_build(spark, sf_dir, KIND, None)
    marker = os.path.join(path, "totals", "_SUCCESS")
    mtime = os.path.getmtime(marker)
    again = _bm25_index_build(spark, sf_dir, KIND, None)
    assert again == path
    assert os.path.getmtime(marker) == mtime  # untouched, no rebuild
