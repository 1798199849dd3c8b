"""`kgtk validate-properties` — declarative per-property constraints.

Reference: kgtk/value/propertypatternvalidator.py (2563 LoC) supports a
large pattern language; this implements the load-bearing core as a
broadcast-joined rule table + column predicates:

- node1_type / node2_type: the value's KGTK data type must be in the set
- node2_values: enumerated allowed values
- minval / maxval: numeric range on parsed node2
- mindistinct / maxdistinct: per-(node1,label) cardinality bounds

Rules apply per ``label``; rows under no rule pass. Returns
(valid_df, reject_df).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgtk_spark.values import parse_fields_udf


@dataclass
class PropertyPattern:
    label: str
    node1_type: list[str] | None = None
    node2_type: list[str] | None = None
    node2_values: list[str] | None = None
    minval: float | None = None
    maxval: float | None = None
    mindistinct: int | None = None
    maxdistinct: int | None = None


def validate_properties(
    edges: DataFrame, patterns: list[PropertyPattern]
) -> tuple[DataFrame, DataFrame]:
    """Split edges into (conforming, violating) per the pattern table."""
    parsed = edges.withColumn("__f1__", parse_fields_udf(F.col("node1"))).withColumn(
        "__f2__", parse_fields_udf(F.col("node2"))
    )

    ok = F.lit(True)
    for p in patterns:
        applies = F.col("label") == p.label
        cond = F.lit(True)
        if p.node1_type:
            cond = cond & F.col("__f1__.data_type").isin(p.node1_type)
        if p.node2_type:
            cond = cond & F.col("__f2__.data_type").isin(p.node2_type)
        if p.node2_values:
            cond = cond & F.col("node2").isin(p.node2_values)
        if p.minval is not None:
            cond = cond & (F.col("__f2__.number") >= p.minval)
        if p.maxval is not None:
            cond = cond & (F.col("__f2__.number") <= p.maxval)
        ok = ok & F.when(applies, cond).otherwise(F.lit(True))

    parsed = parsed.withColumn("__row_ok__", ok)

    # Cardinality rules need a per-(node1,label) distinct count.
    card_rules = [p for p in patterns if p.mindistinct is not None or p.maxdistinct is not None]
    if card_rules:
        counts = (
            parsed.groupBy("node1", "label")
            .agg(F.countDistinct("node2").alias("__n__"))
        )
        parsed = parsed.join(counts, ["node1", "label"], "left")
        card_ok = F.lit(True)
        for p in card_rules:
            applies = F.col("label") == p.label
            c = F.lit(True)
            if p.mindistinct is not None:
                c = c & (F.col("__n__") >= p.mindistinct)
            if p.maxdistinct is not None:
                c = c & (F.col("__n__") <= p.maxdistinct)
            card_ok = card_ok & F.when(applies, c).otherwise(F.lit(True))
        parsed = parsed.withColumn("__row_ok__", F.col("__row_ok__") & card_ok)

    drop = [c for c in parsed.columns if c.startswith("__")]
    valid = parsed.filter(F.col("__row_ok__")).drop(*drop)
    reject = parsed.filter(~F.col("__row_ok__")).drop(*drop)
    return valid, reject
