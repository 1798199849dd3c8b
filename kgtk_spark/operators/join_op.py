"""`kgtk join` — KGTK's key-set union join (NOT a relational join).

Reference: kgtk/join/kgtkjoiner.py — join-type truth table :33-36, key
construction :80-106 (default key: node1 for edge files, id for node
files; optionally + label and/or + node2, or explicit column lists),
key-set intersection :180-217, two-pass emit :239-349.

Semantics: compute the key set of each file, pick the qualifying key set
by join type, then emit rows of BOTH files whose key qualifies, unioned
into the alias-aware merged schema:

- inner  → keys = left ∩ right
- left   → keys = left key set (right rows filtered by it)
- right  → symmetric
- outer  → everything (plain concat)

Spark notes: each side is filtered with a left_semi join against the
(distinct) qualifying key projection — map-side broadcast when small —
then combined with unionByName(allowMissingColumns=True), matching the
reference's column merge (kgtk/join/kgtkmergecolumns.py:36-86).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgtk_spark.schema import canonicalize_columns, detect_mode, resolve_column

_KEY_HASH_COL = "__kgtk_join_key__"


def _join_key_cols(
    df: DataFrame,
    join_columns: list[str] | None,
    join_on_label: bool,
    join_on_node2: bool,
) -> list[str]:
    cols = df.columns
    if join_columns:
        return join_columns
    mode = detect_mode(cols)
    if mode == "edge":
        key = [resolve_column(cols, "node1") or "node1"]
        if join_on_label:
            key.append(resolve_column(cols, "label") or "label")
        if join_on_node2:
            key.append(resolve_column(cols, "node2") or "node2")
        return key
    return [resolve_column(cols, "id") or "id"]


def _translate_keys(keys: list[str] | None, canon_cols: list[str]) -> list[str] | None:
    """Map user-passed alias key names (e.g. 'sub') onto the canonical column
    name present after canonicalization."""
    if keys is None:
        return None
    from kgtk_spark.schema import ALIAS_GROUPS

    out = []
    for k in keys:
        if k in canon_cols:
            out.append(k)
            continue
        mapped = k
        for canonical, aliases in ALIAS_GROUPS.items():
            if k.lower() in [a.lower() for a in aliases] and canonical in canon_cols:
                mapped = canonical
                break
        out.append(mapped)
    return out


def _with_key(df: DataFrame, key_cols: list[str]) -> DataFrame:
    # Composite key as a single concat column so left/right key column
    # names need not match (the reference pairs them positionally).
    return df.withColumn(
        _KEY_HASH_COL, F.concat_ws("\x1f", *[F.coalesce(F.col(c), F.lit("")) for c in key_cols])
    )


def kgtk_join(
    left: DataFrame,
    right: DataFrame,
    how: str = "inner",
    left_join_columns: list[str] | None = None,
    right_join_columns: list[str] | None = None,
    join_on_label: bool = False,
    join_on_node2: bool = False,
) -> DataFrame:
    """KGTK join: semi-join-filtered union of both files."""
    if how not in ("inner", "left", "right", "outer"):
        raise ValueError(f"unknown join type {how!r}")

    lc = canonicalize_columns(left)
    rc = canonicalize_columns(right)

    lkey = _join_key_cols(lc, _translate_keys(left_join_columns, lc.columns), join_on_label, join_on_node2)
    rkey = _join_key_cols(rc, _translate_keys(right_join_columns, rc.columns), join_on_label, join_on_node2)
    if len(lkey) != len(rkey):
        raise ValueError("left and right join column lists must have equal length")

    if how == "outer":
        return lc.unionByName(rc, allowMissingColumns=True)

    lk = _with_key(lc, lkey)
    rk = _with_key(rc, rkey)

    if how == "inner":
        # The qualifying key set feeds BOTH semi-joins; without the
        # checkpoint Catalyst re-executes the whole two-sided
        # distinct+intersect subtree per consumer (the r5 plan carried
        # 12 scans for one join). Materialized it is |left keys ∩
        # right keys| rows — bounded by the smaller side, executor-
        # resident, and small enough for AQE to broadcast the probes.
        keys = (
            lk.select(_KEY_HASH_COL)
            .intersect(rk.select(_KEY_HASH_COL))
            .localCheckpoint()
        )
        lout = lk.join(keys, on=_KEY_HASH_COL, how="left_semi")
        rout = rk.join(keys, on=_KEY_HASH_COL, how="left_semi")
    elif how == "left":
        keys = lk.select(_KEY_HASH_COL).dropDuplicates()
        lout = lk
        rout = rk.join(keys, on=_KEY_HASH_COL, how="left_semi")
    else:  # right
        keys = rk.select(_KEY_HASH_COL).dropDuplicates()
        lout = lk.join(keys, on=_KEY_HASH_COL, how="left_semi")
        rout = rk

    return (
        lout.drop(_KEY_HASH_COL)
        .unionByName(rout.drop(_KEY_HASH_COL), allowMissingColumns=True)
    )
