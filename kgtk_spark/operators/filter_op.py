"""`kgtk filter` — pattern filter over (node1, label, node2).

Reference: kgtk/cli/filter.py (pattern parse :332-339, general loop
:262-328, --or/--invert flags :44-48). A pattern is ``subj ; pred ; obj``
where each part is a comma-separated value set; a row passes a clause if
the column value ∈ set; empty clause = always true. Default combine is
AND over supplied clauses; ``or_=True`` is OR; ``invert`` flips.

Spark notes: the whole predicate is a pure Column expression —
``isin`` folds to ``=`` for single values (the reference's hand-written
fast paths, kgtk/cli/filter.py:138-260, fall out of Catalyst constant
folding for free) and is pushed down to the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kgtk_spark.schema import resolve_column


def parse_pattern(pattern: str) -> tuple[set[str], set[str], set[str]]:
    parts = pattern.split(";")
    if len(parts) != 3:
        raise ValueError(
            "The pattern must have three sections separated by semicolons."
        )

    def prep(p: str) -> set[str]:
        return {v.strip() for v in p.split(",") if v.strip() != ""}

    return prep(parts[0]), prep(parts[1]), prep(parts[2])


def kgtk_filter(
    df: DataFrame,
    pattern: str,
    or_: bool = False,
    invert: bool = False,
    subj_col: str | None = None,
    pred_col: str | None = None,
    obj_col: str | None = None,
    with_reject: bool = False,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Filter rows by the KGTK pattern; returns kept rows (and rejects)."""
    subj_filter, pred_filter, obj_filter = parse_pattern(pattern)

    subj_col = subj_col or resolve_column(df.columns, "node1") or "node1"
    pred_col = pred_col or resolve_column(df.columns, "label") or "label"
    obj_col = obj_col or resolve_column(df.columns, "node2") or "node2"

    clauses: list[Column] = []
    for col, values in (
        (subj_col, subj_filter),
        (pred_col, pred_filter),
        (obj_col, obj_filter),
    ):
        if values:
            clauses.append(F.col(col).isin(sorted(values)))

    if not clauses:
        predicate = F.lit(True)
    elif or_:
        predicate = clauses[0]
        for c in clauses[1:]:
            predicate = predicate | c
    else:
        predicate = clauses[0]
        for c in clauses[1:]:
            predicate = predicate & c

    if invert:
        predicate = ~predicate

    kept = df.filter(predicate)
    if with_reject:
        return kept, df.filter(~predicate)
    return kept
