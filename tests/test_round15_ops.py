"""Round-15 operator and fix tests.

Covers the round-14 advice fixes (plan-doctor direct-chain limit rule,
fidx empty-directory read) and the operators added this round.
"""

from __future__ import annotations

from redpanda_iceberg_duckdb_spark.plans.doctor import _subtree_has_limit

_CHAIN_PLAN = """\
Window (5)
+- * Sort (4)
   +- Exchange (3)
      +- * Project (2)
         +- GlobalLimit (1)
"""

_BRANCH_PLAN = """\
Window (9)
+- * Project (8)
   +- SortMergeJoin (7)
      :- GlobalLimit (3)
      :  +- Scan parquet (2)
      +- Scan parquet (6)
"""

_SECOND_BRANCH_PLAN = """\
Window (9)
+- SortMergeJoin (7)
   :- Scan parquet (2)
   +- TakeOrderedAndProject (6)
"""


def test_doctor_limit_on_direct_chain_exempts():
    assert _subtree_has_limit(_CHAIN_PLAN, "Window", "5")


def test_doctor_limit_in_join_branch_does_not_exempt():
    """A GlobalLimit bounding only ONE branch of a join must not exempt a
    global window over the joined (unbounded) result — the scan stops at
    the first multi-child node (round-14 advice, doctor.py)."""
    assert not _subtree_has_limit(_BRANCH_PLAN, "Window", "9")
    assert not _subtree_has_limit(_SECOND_BRANCH_PLAN, "Window", "9")


def test_fidx_empty_directory_reads_empty(spark, tmp_path):
    """format('fidx') over a directory with no containers must return an
    empty frame, not crash on Spark's read(None) placeholder partition
    (round-14 advice, pydatasource.py)."""
    from redpanda_iceberg_duckdb_spark.sources.pydatasource import (
        register_python_sources)

    register_python_sources(spark)
    df = (spark.read.format("fidx")
          .option("path", str(tmp_path)).load())
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "frame_idx", "frame"]
