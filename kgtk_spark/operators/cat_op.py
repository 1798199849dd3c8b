"""`kgtk cat` — alias-aware concatenation of KGTK files.

Reference: kgtk/join/kgtkcat.py:53-249 (column merge via
kgtk/join/kgtkmergecolumns.py:36-86): alias headers (sub/pred/obj, from/to,
...) map onto the canonical column; columns missing from a file fill empty.

Spark: canonicalize alias headers then chain
``unionByName(allowMissingColumns=True)`` — a zero-shuffle operation.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame

from kgtk_spark.schema import canonicalize_columns


def kgtk_cat(*dfs: DataFrame) -> DataFrame:
    if not dfs:
        raise ValueError("kgtk_cat needs at least one input")
    canon = [canonicalize_columns(df) for df in dfs]
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), canon)
