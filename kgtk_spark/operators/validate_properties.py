"""`kgtk validate-properties` — declarative per-property constraints.

Reference: kgtk/value/propertypatternvalidator.py (2563 LoC, ~60 rule
actions). This implements the load-bearing rule families as broadcast
rule predicates over the value kernel's parsed fields:

value rules      node1_type / node2_type / node2_not_type,
                 node1_values / node2_values / node2_not_values,
                 node1_pattern / label_pattern / node2_pattern /
                 node2_not_pattern, node2_blank / node2_not_blank
numeric rules    minval / maxval (>= / <=), greater_than / less_than,
                 equal_to / not_equal_to
date rules       mindate / maxdate on the parsed date_and_times field
cardinality      mindistinct / maxdistinct (distinct node2 per
                 (node1, label)), minoccurs / maxoccurs (rows per
                 (node1, label))
co-occurrence    requires / prohibits: other properties that must /
                 must not appear on the same node1

Rules apply per ``label``; rows under no rule pass. Returns
(valid_df, reject_df); the reject side carries a ``reject_reasons``
array column naming every failed ``label:rule`` so rejects are
actionable (the reference writes similar complaints to its log).

All predicates are Catalyst expressions; the only shuffles are the
aggregations that cardinality / co-occurrence rules genuinely need
(skipped entirely when no such rule is present).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kgtk_spark.values import parse_fields_udf


@dataclass
class PropertyPattern:
    label: str
    node1_type: list[str] | None = None
    node2_type: list[str] | None = None
    node2_not_type: list[str] | None = None
    node1_values: list[str] | None = None
    node2_values: list[str] | None = None
    node2_not_values: list[str] | None = None
    node1_pattern: str | None = None
    label_pattern: str | None = None
    node2_pattern: str | None = None
    node2_not_pattern: str | None = None
    node2_blank: bool = False
    node2_not_blank: bool = False
    minval: float | None = None
    maxval: float | None = None
    greater_than: float | None = None
    less_than: float | None = None
    equal_to: list[float] | None = None
    not_equal_to: list[float] | None = None
    mindate: str | None = None
    maxdate: str | None = None
    mindistinct: int | None = None
    maxdistinct: int | None = None
    minoccurs: int | None = None
    maxoccurs: int | None = None
    requires: list[str] | None = None
    prohibits: list[str] | None = None


def _row_rules(p: PropertyPattern) -> list[tuple[str, Column]]:
    """(rule_name, ok_condition) pairs evaluable per row."""
    n2num = F.col("__f2__.number")
    n2date = F.col("__f2__.date_and_times")
    rules: list[tuple[str, Column]] = []
    if p.node1_type:
        rules.append(("node1_type", F.col("__f1__.data_type").isin(p.node1_type)))
    if p.node2_type:
        rules.append(("node2_type", F.col("__f2__.data_type").isin(p.node2_type)))
    if p.node2_not_type:
        rules.append(
            ("node2_not_type", ~F.col("__f2__.data_type").isin(p.node2_not_type))
        )
    if p.node1_values:
        rules.append(("node1_values", F.col("node1").isin(p.node1_values)))
    if p.node2_values:
        rules.append(("node2_values", F.col("node2").isin(p.node2_values)))
    if p.node2_not_values:
        rules.append(("node2_not_values", ~F.col("node2").isin(p.node2_not_values)))
    if p.node1_pattern:
        rules.append(("node1_pattern", F.col("node1").rlike(p.node1_pattern)))
    if p.label_pattern:
        rules.append(("label_pattern", F.col("label").rlike(p.label_pattern)))
    if p.node2_pattern:
        rules.append(("node2_pattern", F.col("node2").rlike(p.node2_pattern)))
    if p.node2_not_pattern:
        rules.append(("node2_not_pattern", ~F.col("node2").rlike(p.node2_not_pattern)))
    if p.node2_blank:
        rules.append(("node2_blank", F.col("node2") == ""))
    if p.node2_not_blank:
        rules.append(("node2_not_blank", F.col("node2") != ""))
    if p.minval is not None:
        rules.append(("minval", n2num >= p.minval))
    if p.maxval is not None:
        rules.append(("maxval", n2num <= p.maxval))
    if p.greater_than is not None:
        rules.append(("greater_than", n2num > p.greater_than))
    if p.less_than is not None:
        rules.append(("less_than", n2num < p.less_than))
    if p.equal_to:
        rules.append(("equal_to", n2num.isin(p.equal_to)))
    if p.not_equal_to:
        rules.append(("not_equal_to", ~n2num.isin(p.not_equal_to)))
    # ISO-8601 strings compare lexicographically within one format.
    if p.mindate is not None:
        rules.append(("mindate", n2date >= p.mindate))
    if p.maxdate is not None:
        rules.append(("maxdate", n2date <= p.maxdate))
    return rules


def validate_properties(
    edges: DataFrame, patterns: list[PropertyPattern]
) -> tuple[DataFrame, DataFrame]:
    """Split edges into (conforming, violating); violations carry a
    ``reject_reasons`` array naming each failed ``label:rule``."""
    parsed = edges.withColumn("__f1__", parse_fields_udf(F.col("node1"))).withColumn(
        "__f2__", parse_fields_udf(F.col("node2"))
    )

    need_distinct = any(
        p.mindistinct is not None or p.maxdistinct is not None for p in patterns
    )
    need_occurs = any(
        p.minoccurs is not None or p.maxoccurs is not None for p in patterns
    )
    need_labels = any(p.requires or p.prohibits for p in patterns)

    if need_distinct or need_occurs:
        counts = parsed.groupBy("node1", "label").agg(
            F.countDistinct("node2").alias("__nd__"),
            F.count(F.lit(1)).alias("__nr__"),
        )
        parsed = parsed.join(counts, ["node1", "label"], "left")
    if need_labels:
        label_sets = parsed.groupBy("node1").agg(
            F.collect_set("label").alias("__labels__")
        )
        parsed = parsed.join(label_sets, "node1", "left")

    reason_arrays: list[Column] = []

    def add(applies: Column, label: str, name: str, ok: Column):
        reason_arrays.append(
            F.when(
                applies & ~F.coalesce(ok, F.lit(False)),
                F.array(F.lit(f"{label}:{name}")),
            ).otherwise(F.array().cast("array<string>"))
        )

    for p in patterns:
        applies = F.col("label") == p.label
        for name, ok in _row_rules(p):
            add(applies, p.label, name, ok)
        if p.mindistinct is not None:
            add(applies, p.label, "mindistinct", F.col("__nd__") >= p.mindistinct)
        if p.maxdistinct is not None:
            add(applies, p.label, "maxdistinct", F.col("__nd__") <= p.maxdistinct)
        if p.minoccurs is not None:
            add(applies, p.label, "minoccurs", F.col("__nr__") >= p.minoccurs)
        if p.maxoccurs is not None:
            add(applies, p.label, "maxoccurs", F.col("__nr__") <= p.maxoccurs)
        for req in p.requires or []:
            add(
                applies,
                p.label,
                f"requires:{req}",
                F.array_contains(F.col("__labels__"), req),
            )
        for pro in p.prohibits or []:
            add(
                applies,
                p.label,
                f"prohibits:{pro}",
                ~F.array_contains(F.col("__labels__"), pro),
            )

    if reason_arrays:
        parsed = parsed.withColumn("__reasons__", F.concat(*reason_arrays))
    else:
        parsed = parsed.withColumn("__reasons__", F.array().cast("array<string>"))

    drop = [c for c in parsed.columns if c.startswith("__")]
    valid = parsed.filter(F.size("__reasons__") == 0).drop(*drop)
    reject = (
        parsed.filter(F.size("__reasons__") > 0)
        .withColumn("reject_reasons", F.col("__reasons__"))
        .drop(*drop)
    )
    return valid, reject
