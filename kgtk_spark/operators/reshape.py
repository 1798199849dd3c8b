"""Reshape operators: expand, explode, implode, normalize-nodes.

- expand (kgtk/reshape/kgtkexpand.py:95-139): explode ``|`` lists into
  rows with ZIP semantics — non-key list columns are consumed
  positionally in parallel, padded with "" (not a cross product).
- explode (kgtk/reshape/kgtkexplode.py:55-218): parse one column into
  per-field typed columns ``prefix+field`` per the value-field catalog.
- implode (kgtk/reshape/kgtkimplode.py:485-536): rebuild a KGTK value
  from data_type + field columns.
- normalize-nodes (kgtk/cli/normalize_nodes.py:128-158): node file →
  edge file, one (id, column, value) per non-empty cell, lists split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgtk_spark.lists import split_list, split_list_nonempty
from kgtk_spark.schema import resolve_column
from kgtk_spark.values import FIELD_NAMES, parse_fields_udf, stringify


def kgtk_expand(df: DataFrame, key_columns: list[str] | None = None) -> DataFrame:
    """Explode list cells into rows, zipping non-key lists positionally."""
    if key_columns is None:
        key_columns = [
            c
            for c in (
                resolve_column(df.columns, "node1"),
                resolve_column(df.columns, "id"),
            )
            if c is not None
        ]
    value_columns = [c for c in df.columns if c not in key_columns]
    if not value_columns:
        return df

    arrays = [split_list(F.coalesce(F.col(c), F.lit(""))).alias(f"__arr_{c}") for c in value_columns]
    zipped = df.select(*df.columns, F.arrays_zip(*arrays).alias("__zipped__"))
    exploded = zipped.select(*key_columns, F.explode("__zipped__").alias("__z__"))
    # arrays_zip pads shorter arrays with null → KGTK pads with "".
    out = exploded.select(
        *key_columns,
        *[
            F.coalesce(F.col(f"__z__.__arr_{c}"), F.lit("")).alias(c)
            for c in value_columns
        ],
    )
    return out.select(*df.columns)


def kgtk_explode(
    df: DataFrame,
    column: str = "node2",
    prefix: str = "node2;kgtk:",
    fields: list[str] | None = None,
    expand_list: bool = False,
) -> DataFrame:
    """Parse ``column`` into typed per-field columns via the value kernel."""
    fields = fields or [f for f in FIELD_NAMES if f not in ("decoded_text",)]
    src = df
    target = F.col(column)
    if expand_list:
        src = src.withColumn(column, F.explode(split_list_nonempty(F.coalesce(target, F.lit("")))))
        target = F.col(column)
    parsed = src.withColumn("__fields__", parse_fields_udf(target))
    out = parsed.select(
        *src.columns,
        *[
            F.col(f"__fields__.{f}").cast("string").alias(prefix + f)
            for f in fields
        ],
    )
    return out


def kgtk_implode(
    df: DataFrame,
    column: str = "node2",
    prefix: str = "node2;kgtk:",
    drop_field_columns: bool = True,
) -> DataFrame:
    """Rebuild a KGTK value from data_type + field columns.

    Per-type imploder dispatch (kgtk/reshape/kgtkimplode.py:485-536) as a
    single ``when`` chain — all JVM-side except string escaping, which
    reuses the value kernel's translate table via format strings.
    """
    def fld(name):
        return F.col(prefix + name)

    dt = fld("data_type")
    # number formatting: keep integral values integral for round-trip.
    numd = fld("number").cast("double")
    num = F.when(
        numd == F.floor(numd), F.floor(numd).cast("long").cast("string")
    ).otherwise(numd.cast("string"))

    quantity = F.concat(
        num,
        F.when(
            fld("low_tolerance").isNotNull() & (fld("low_tolerance") != ""),
            F.concat(F.lit("["), fld("low_tolerance"), F.lit(","), fld("high_tolerance"), F.lit("]")),
        ).otherwise(F.lit("")),
        F.coalesce(fld("si_units"), F.lit("")),
        F.coalesce(fld("units_node"), F.lit("")),
    )

    string_v = F.concat(F.lit('"'), F.coalesce(fld("text"), F.lit("")), F.lit('"'))
    lq_v = F.concat(
        F.lit("'"),
        F.coalesce(fld("text"), F.lit("")),
        F.lit("'@"),
        F.coalesce(fld("language"), F.lit("")),
        F.coalesce(fld("language_suffix"), F.lit("")),
    )
    # Canonical degree format per the reference's format_degrees
    # (kgtk/value/kgtkvalue.py:1157): zero-padded %011.6f.
    coords = F.concat(
        F.lit("@"),
        F.format_string("%011.6f", fld("latitude").cast("double")),
        F.lit("/"),
        F.format_string("%011.6f", fld("longitude").cast("double")),
    )
    dates = F.concat(
        F.lit("^"),
        F.coalesce(fld("date_and_times"), F.lit("")),
        F.when(
            fld("precision").isNotNull() & (fld("precision") != ""),
            F.concat(F.lit("/"), fld("precision")),
        ).otherwise(F.lit("")),
    )

    value = (
        F.when(dt == "number", num)
        .when(dt == "quantity", quantity)
        .when(dt == "string", string_v)
        .when(dt == "language_qualified_string", lq_v)
        .when(dt == "location_coordinates", coords)
        .when(dt == "date_and_times", dates)
        .when(dt == "boolean", F.when(fld("truth").cast("boolean"), "True").otherwise("False"))
        .when(dt == "symbol", F.coalesce(fld("symbol"), F.lit("")))
        .otherwise(F.lit(""))
    )

    out = df.withColumn(column, value)
    if drop_field_columns:
        out = out.drop(*[c for c in df.columns if c.startswith(prefix)])
    return out


def normalize_nodes(
    df: DataFrame,
    id_column: str | None = None,
    columns: list[str] | None = None,
    labels: dict[str, str] | None = None,
) -> DataFrame:
    """Node file → edge file: (id, column-name-or-custom-label, value)."""
    id_column = id_column or resolve_column(df.columns, "id") or "id"
    columns = columns or [c for c in df.columns if c != id_column]
    labels = labels or {}

    parts = [
        df.select(
            F.col(id_column).alias("node1"),
            F.lit(labels.get(c, c)).alias("label"),
            F.explode(split_list_nonempty(F.coalesce(F.col(c), F.lit("")))).alias("node2"),
        )
        for c in columns
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


__all__ = ["kgtk_expand", "kgtk_explode", "kgtk_implode", "normalize_nodes", "stringify"]
