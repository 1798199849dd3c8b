"""Line-repairing reader + tail/sampling counters vs reference
semantics (kgtk/io/kgtkreader.py:832-960)."""

from __future__ import annotations

import pytest

from kgtk_spark.indexing import zip_with_index
from kgtk_spark.schema import read_kgtk_tsv_repair

RAGGED = (
    "node1\tlabel\tnode2\n"
    "a\tp\tb\n"
    "short\tp\n"              # 2 columns
    "long\tp\tx\textra\n"     # 4 columns
    "# a comment\n"
    "\n"
    "   \n"
    "c\tp\td\n"
)


@pytest.fixture()
def ragged_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("ragged") / "in.tsv"
    p.write_text(RAGGED)
    return str(p)


def test_rejects_without_repair(spark, ragged_path):
    good, rejects = read_kgtk_tsv_repair(spark, ragged_path)
    assert {tuple(r) for r in good.collect()} == {("a", "p", "b"), ("c", "p", "d")}
    reasons = sorted(r["reason"] for r in rejects.collect())
    assert reasons == [
        "comment line",
        "empty line",
        "long line",
        "short line",
        "whitespace line",
    ]


def test_fill_and_truncate(spark, ragged_path):
    good, rejects = read_kgtk_tsv_repair(
        spark, ragged_path, fill_short_lines=True, truncate_long_lines=True
    )
    rows = {tuple(r) for r in good.collect()}
    assert ("short", "p", "") in rows     # padded
    assert ("long", "p", "x") in rows     # truncated
    assert len(rows) == 4
    assert rejects.count() == 3  # only the comment/empty/whitespace lines


def test_record_limit_and_tail(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("tail") / "in.tsv"
    p.write_text("c1\n" + "\n".join(f"r{i}" for i in range(1, 11)) + "\n")
    good, _ = read_kgtk_tsv_repair(spark, str(p), record_limit=8, tail_count=3)
    assert {r["c1"] for r in good.collect()} == {"r6", "r7", "r8"}
    good, _ = read_kgtk_tsv_repair(spark, str(p), record_limit=4)
    assert {r["c1"] for r in good.collect()} == {"r1", "r2", "r3", "r4"}
    good, _ = read_kgtk_tsv_repair(spark, str(p), every_nth_record=3)
    assert {r["c1"] for r in good.collect()} == {"r3", "r6", "r9"}
    good, _ = read_kgtk_tsv_repair(spark, str(p), initial_skip_count=8)
    assert {r["c1"] for r in good.collect()} == {"r9", "r10"}


def test_zip_with_index_is_contiguous(spark):
    df = spark.range(0, 1000).repartition(7)
    out = zip_with_index(df, "idx")
    idxs = sorted(r["idx"] for r in out.collect())
    assert idxs == list(range(1000))
    # order within a partition is preserved
    rows = out.collect()
    assert len({r["idx"] for r in rows}) == 1000
