"""`kgtk ifexists` / `ifnotexists` / `ifempty` / `ifnotempty`.

Reference: kgtk/iff/kgtkifexists.py (default key rules :5-11, invert
:173-184), kgtk/iff/kgtkifempty.py:1-189.

ifexists is a left SEMI-join of the input against the distinct composite
key of the filter file; ifnotexists is the ANTI-join. Default keys:
edge×edge = (node1,label,node2); node×node = (id); edge×node =
(node1 = id). The reference's two in-memory strategies (cache filter
keys vs cache input, kgtk/iff/kgtkifexists.py:145-260) collapse into
one declarative plan: Spark/AQE picks broadcast-hash when the distinct
key set is small — exactly the reference's "cache the smaller side",
but chosen at runtime from actual sizes.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgtk_spark.schema import detect_mode, resolve_column

EDGE_KEY = ["node1", "label", "node2"]


def _default_keys(cols: list[str]) -> list[str]:
    mode = detect_mode(cols)
    if mode == "edge":
        return [resolve_column(cols, c) or c for c in EDGE_KEY]
    if mode == "node":
        return [resolve_column(cols, "id") or "id"]
    raise ValueError("cannot determine default keys for quasi-KGTK input; pass keys")


def if_exists(
    input_df: DataFrame,
    filter_df: DataFrame,
    input_keys: list[str] | None = None,
    filter_keys: list[str] | None = None,
    invert: bool = False,
    with_reject: bool = False,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Keep input rows whose composite key exists in the filter file."""
    if input_keys is None and filter_keys is None:
        in_mode = detect_mode(input_df.columns)
        f_mode = detect_mode(filter_df.columns)
        if in_mode == "edge" and f_mode == "node":
            input_keys = [resolve_column(input_df.columns, "node1") or "node1"]
            filter_keys = [resolve_column(filter_df.columns, "id") or "id"]
        elif in_mode == "node" and f_mode == "edge":
            input_keys = [resolve_column(input_df.columns, "id") or "id"]
            filter_keys = [resolve_column(filter_df.columns, "node1") or "node1"]
        else:
            input_keys = _default_keys(input_df.columns)
            filter_keys = _default_keys(filter_df.columns)
    elif input_keys is None:
        input_keys = list(filter_keys or [])
    elif filter_keys is None:
        filter_keys = list(input_keys)
    if len(input_keys) != len(filter_keys):
        raise ValueError("input and filter key lists must have equal length")

    # Distinct key projection of the filter side → semi/anti join.
    keyset = filter_df.select(
        *[F.col(fk).alias(ik) for ik, fk in zip(input_keys, filter_keys)]
    ).dropDuplicates()

    how = "left_anti" if invert else "left_semi"
    kept = input_df.join(keyset, on=input_keys, how=how)
    if with_reject:
        other = "left_semi" if invert else "left_anti"
        return kept, input_df.join(keyset, on=input_keys, how=other)
    return kept


def if_not_exists(
    input_df: DataFrame,
    filter_df: DataFrame,
    input_keys: list[str] | None = None,
    filter_keys: list[str] | None = None,
    with_reject: bool = False,
):
    """Anti-join variant (kgtk/cli/ifnotexists.py)."""
    return if_exists(
        input_df, filter_df, input_keys, filter_keys, invert=True, with_reject=with_reject
    )


def if_empty(
    df: DataFrame,
    columns: list[str],
    all_are: bool = False,
    invert: bool = False,
) -> DataFrame:
    """`ifempty` (invert=False) / `ifnotempty` (invert=True).

    Keep rows where any (default) / all of ``columns`` are empty
    (non-empty when inverted). Reference: kgtk/iff/kgtkifempty.py:1-189.
    """
    def empty(c: str):
        col = F.col(c)
        return col.isNull() | (col == "")

    tests = [(~empty(c) if invert else empty(c)) for c in columns]
    op = (lambda a, b: a & b) if all_are else (lambda a, b: a | b)
    return df.filter(reduce(op, tests))
