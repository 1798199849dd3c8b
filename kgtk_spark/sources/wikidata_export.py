"""KGTK → Wikidata-style entity JSON export.

Reference: kgtk/exports/exportwikidata.py (796 LoC) — a sequential
reader grouping edges by qnode to assemble one JSON document per
entity. Spark twin: two hash aggregations (claims per (entity,
property), then properties per entity) + ``to_json`` — fully JVM-side,
one shuffle keyed on the entity id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def export_wikidata_json(edges: DataFrame) -> DataFrame:
    """Edge file → (id, json) with {"id", "type", "claims": {P: [v...]}}."""
    per_prop = (
        edges.groupBy(F.col("node1").alias("id"), F.col("label").alias("property"))
        .agg(F.array_sort(F.collect_list("node2")).alias("values"))
    )
    per_entity = per_prop.groupBy("id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("property", "values")))
        ).alias("claims")
    )
    return per_entity.select(
        "id",
        F.to_json(
            F.struct(F.col("id"), F.lit("item").alias("type"), F.col("claims"))
        ).alias("json"),
    )
