"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``  — flagship query on /root/testdata/sf0.001
- ``queries()``     — one entry per implemented operator (SURVEY.md §2)
- ``oracle_sql()``  — DuckDB-runnable ANSI-SQL twin per query

The catalog lives in kgtk_spark.queries; this module stays thin.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: derive a KGTK edge file from the sf0.001 tables, run
    filter → compact → add-id (the Phase-1 end-to-end slice of
    SURVEY.md §7), and attach per-subject degree statistics."""
    from kgtk_spark.operators import add_id, kgtk_compact, kgtk_filter
    from kgtk_spark.queries import tpch_edges

    sf_dir = "/root/testdata/sf0.001"
    edges = tpch_edges(spark, sf_dir)
    filtered = kgtk_filter(edges, ";placed,contains;")
    compacted = kgtk_compact(filtered, keys=["node1", "label"])
    return add_id(compacted, style="node1-label-num")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from kgtk_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from kgtk_spark.queries import ORACLES

    return dict(ORACLES)
