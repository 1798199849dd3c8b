"""`kgtk lift` / `kgtk lower` — attach/detach label columns.

lift (kgtk/lift/kgtklift.py, 917 LoC): build a map match_value →
label_value from label rows (rows whose ``label`` column equals the
label-select value, default "label"; map node1 → node2), then for each
input row add ``<col>;label`` columns for node1/label/node2 (or custom
columns). Multiple labels per key merge to a sorted-unique ``|`` list;
lifted label rows are removed from the output by default.

Spark: the label map is a groupBy + sort_array(collect_set) aggregate,
then a broadcast left join per lifted column — the reference's three
strategies (in-memory hash :466-575, sorted merge :576-690, input
prefilter :443-465) all collapse into broadcast-hash-join + Catalyst
column pruning.

lower (kgtk/cli/lower.py:147-260): inverse — remove ``<base>;label``
columns, emitting their values (split on ``|``) as new label edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgtk_spark.lists import split_list_nonempty
from kgtk_spark.schema import resolve_column


def build_label_map(
    label_df: DataFrame,
    label_select_value: str = "label",
    match_column: str = "node1",
    value_column: str = "node2",
    label_column: str = "label",
) -> DataFrame:
    """(match_value, lifted_value) map with sorted-unique ``|`` merge."""
    return (
        label_df.filter(F.col(label_column) == label_select_value)
        .groupBy(F.col(match_column).alias("__match__"))
        .agg(
            F.array_join(
                F.array_sort(F.collect_set(F.col(value_column))), "|"
            ).alias("__lifted__")
        )
    )


def kgtk_lift(
    input_df: DataFrame,
    label_df: DataFrame | None = None,
    columns_to_lift: list[str] | None = None,
    label_select_value: str = "label",
    lift_suffix: str = ";label",
    remove_label_rows: bool = True,
    default_value: str = "",
    broadcast: bool = True,
) -> DataFrame:
    """Attach ``<col>;label`` columns.

    ``broadcast=True`` (default) hints the label map for a map-side
    join — right for label dictionaries that fit executor memory. Pass
    ``broadcast=False`` for label tables at corpus scale; the joins
    then shuffle on the lifted key (still one shuffle per lifted
    column, matching the reference's sorted-merge strategy,
    kgtk/lift/kgtklift.py:576-690)."""
    lbl = resolve_column(input_df.columns, "label") or "label"
    if label_df is None:
        label_df = input_df
        labels_from_input = True
    else:
        labels_from_input = False

    label_map = build_label_map(label_df, label_select_value)
    if broadcast:
        label_map = F.broadcast(label_map)

    out = input_df
    if remove_label_rows and (labels_from_input or label_df is input_df):
        out = out.filter(F.col(lbl) != label_select_value)

    if columns_to_lift is None:
        columns_to_lift = [
            c
            for c in (
                resolve_column(out.columns, "node1"),
                resolve_column(out.columns, "label"),
                resolve_column(out.columns, "node2"),
            )
            if c is not None
        ]

    for c in columns_to_lift:
        out = (
            out.join(label_map, out[c] == label_map["__match__"], "left")
            .withColumn(
                c + lift_suffix, F.coalesce(F.col("__lifted__"), F.lit(default_value))
            )
            .drop("__match__", "__lifted__")
        )
    return out


def kgtk_lower(
    df: DataFrame,
    columns_to_lower: list[str] | None = None,
    label_value: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Split off ``<base>;<label>`` columns as label edges.

    Returns (main_df_without_lowered_columns, new_label_edges) where the
    label edges are ``(base_value, label_name, item)`` with ``|`` lists
    exploded — kgtk/cli/lower.py:147-260.
    """
    if columns_to_lower is None:
        columns_to_lower = [c for c in df.columns if ";" in c]
    edges = None
    for c in columns_to_lower:
        base, _, lab = c.partition(";")
        if base not in df.columns:
            raise ValueError(f"lowered column {c!r} has no base column {base!r}")
        part = (
            df.select(
                F.col(base).alias("node1"),
                F.lit(label_value or lab).alias("label"),
                F.explode(split_list_nonempty(F.col(c))).alias("node2"),
            )
        ).dropDuplicates()
        edges = part if edges is None else edges.unionByName(part)
    main = df.drop(*columns_to_lower)
    if edges is None:
        edges = df.sparkSession.createDataFrame(
            [], "node1 string, label string, node2 string"
        )
    return main, edges.orderBy("node1", "label", "node2")
