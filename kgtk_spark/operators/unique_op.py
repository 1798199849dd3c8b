"""`kgtk unique` — distinct-value counts of a column.

Reference: kgtk/join/unique.py:50-154 — optional ``--where col --in values``
prefilter, empty-value substitute, output as KGTK edges
``(value, 'count', n)`` ordered by value, or wide node-file format.

Spark: filter → groupBy().count() → orderBy. The wide format is a pivot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kgtk_unique(
    df: DataFrame,
    column: str,
    where_column: str | None = None,
    where_values: list[str] | None = None,
    empty_value: str = "",
    label_value: str = "count",
    prefix: str = "",
    output_format: str = "edge",
) -> DataFrame:
    """Count distinct values of ``column``; emit KGTK count edges."""
    src = df
    if where_column is not None and where_values:
        src = src.filter(F.col(where_column).isin(where_values))

    vals = src.select(
        F.coalesce(
            F.when(F.col(column) == "", F.lit(empty_value) if empty_value else None),
            F.col(column),
        ).alias("value")
    ).filter(F.col("value") != "")

    counts = vals.groupBy("value").agg(F.count(F.lit(1)).alias("count"))

    if output_format == "node":
        # Wide: one row, one column per value (prefixing applies to names).
        return counts.groupBy().pivot("value").sum("count")

    return counts.select(
        F.concat(F.lit(prefix), F.col("value")).alias("node1"),
        F.lit(label_value).alias("label"),
        F.col("count").cast("string").alias("node2"),
    ).orderBy("node1")
