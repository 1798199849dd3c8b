"""`kgtk compact` / deduplicate — group-by-key with KGTK-list merge.

Reference: kgtk/reshape/kgtkcompact.py — key columns :234-258 (edge:
node1,label,node2[,id]; node: id; plus user columns), list merge
:77-168 (every non-key column becomes the sorted-unique ``|``-join of
all its values across the group, each of which may itself be a list).

Spark: one hash aggregation —
``groupBy(keys).agg(merge_list_cells(collect_list(c)) …)``. Map-side
partial aggregation applies automatically; the reference's sorted-input
streaming mode (kgtk/reshape/kgtkcompact.py:281-338) is subsumed by
Spark's hash/sort-agg choice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgtk_spark.lists import merge_list_cells
from kgtk_spark.schema import detect_mode, resolve_column


def default_compact_keys(columns: list[str], compact_id: bool = False) -> list[str]:
    mode = detect_mode(columns)
    if mode == "edge":
        keys = [
            resolve_column(columns, "node1") or "node1",
            resolve_column(columns, "label") or "label",
            resolve_column(columns, "node2") or "node2",
        ]
        idc = resolve_column(columns, "id")
        if idc and not compact_id:
            keys.append(idc)
        return keys
    if mode == "node":
        return [resolve_column(columns, "id") or "id"]
    raise ValueError("cannot determine compact keys for quasi-KGTK input; pass keys")


def kgtk_compact(
    df: DataFrame,
    keys: list[str] | None = None,
    compact_id: bool = True,
) -> DataFrame:
    """One row per key group; non-key columns merged to sorted-unique lists.

    ``compact_id=True`` merges the id column too (it is NOT part of the key),
    matching `kgtk compact --compact-id`.
    """
    if keys is None:
        keys = default_compact_keys(df.columns, compact_id=compact_id)
    rest = [c for c in df.columns if c not in keys]
    aggs = [
        merge_list_cells(F.collect_list(F.coalesce(F.col(c), F.lit("")))).alias(c)
        for c in rest
    ]
    out = df.groupBy(*keys).agg(*aggs) if aggs else df.select(*keys).dropDuplicates()
    return out.select(*df.columns)  # original column order


def deduplicate(df: DataFrame) -> DataFrame:
    """Exact duplicate removal — compact with all columns as key
    (docs/specification.md:24 declares duplicate edges redundant)."""
    return df.dropDuplicates()
