"""`kgtk unreify-rdf-statements` — collapse RDF reification.

Reference: kgtk/unreify/kgtkunreifyrdfstatements.py:1-571 — groups of
edges rooted at a statement node (triggered by
``rdf:type = rdf:Statement``) carrying ``rdf:subject`` /
``rdf:predicate`` / ``rdf:object`` collapse into one direct edge;
any OTHER edge on the statement node becomes a qualifier edge whose
node1 is the new direct edge's id.

The reference needs its input grouped by node1 (in-memory sort buffer,
kgtk/unreify/kgtksortbuffer.py); here the grouping is three broadcast-
friendly self-joins on the (small) statement-id set — no sort, no
buffering, and the non-statement stream passes through untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unreify_rdf_statements(
    edges: DataFrame,
    trigger_label: str = "rdf:type",
    trigger_node2: str = "rdf:Statement",
    subject_label: str = "rdf:subject",
    predicate_label: str = "rdf:predicate",
    object_label: str = "rdf:object",
) -> DataFrame:
    """Returns the unreified edge file (direct edges + qualifiers + rest)."""
    cols = ["node1", "label", "node2"]
    e = edges.select(*cols, *[c for c in edges.columns if c not in cols])

    stmt_ids = (
        e.filter((F.col("label") == trigger_label) & (F.col("node2") == trigger_node2))
        .select(F.col("node1").alias("stmt"))
        .distinct()
    )

    def part(lbl: str, out: str) -> DataFrame:
        return (
            e.filter(F.col("label") == lbl)
            .join(F.broadcast(stmt_ids), e["node1"] == stmt_ids["stmt"], "left_semi")
            .select(F.col("node1").alias("stmt"), F.col("node2").alias(out))
        )

    direct = (
        part(subject_label, "s")
        .join(part(predicate_label, "p"), "stmt")
        .join(part(object_label, "o"), "stmt")
        .withColumn("new_id", F.concat_ws("-", "s", "p", "o"))
    )

    direct_edges = direct.select(
        F.col("s").alias("node1"),
        F.col("p").alias("label"),
        F.col("o").alias("node2"),
        F.col("new_id").alias("id"),
    )

    reif_labels = [trigger_label, subject_label, predicate_label, object_label]
    qualifiers = (
        e.join(F.broadcast(stmt_ids), e["node1"] == stmt_ids["stmt"], "inner")
        .filter(~F.col("label").isin(reif_labels))
        .join(F.broadcast(direct.select("stmt", "new_id")), "stmt")
        .select(
            F.col("new_id").alias("node1"),
            F.col("label"),
            F.col("node2"),
            F.concat_ws("-", "new_id", "label").alias("id"),
        )
    )

    rest = (
        e.join(F.broadcast(stmt_ids), e["node1"] == stmt_ids["stmt"], "left_anti")
        .select("node1", "label", "node2")
        .withColumn("id", F.lit(""))
    )

    return direct_edges.unionByName(qualifiers).unionByName(rest)


def unreify_values(
    edges: DataFrame,
    trigger_label: str,
    trigger_node2: str,
    value_label: str,
) -> DataFrame:
    """`kgtk unreify-values` (kgtk/unreify/kgtkunreifyvalues.py, 537 LoC).

    Same collapse pattern with configurable trigger: nodes whose
    ``trigger_label = trigger_node2`` are value-reification nodes; the
    edge pointing at them is rewired to the node's ``value_label``
    value, other edges on the node become qualifiers on the new edge.
    """
    value_nodes = (
        edges.filter(
            (F.col("label") == trigger_label) & (F.col("node2") == trigger_node2)
        )
        .select(F.col("node1").alias("vnode"))
        .distinct()
    )
    values = (
        edges.filter(F.col("label") == value_label)
        .join(F.broadcast(value_nodes), edges["node1"] == value_nodes["vnode"], "left_semi")
        .select(F.col("node1").alias("vnode"), F.col("node2").alias("value"))
    )

    # Edges POINTING AT a value node get node2 rewritten to the value;
    # keep the vnode so qualifiers can find their new anchor id.
    incoming = edges.join(
        F.broadcast(values), edges["node2"] == values["vnode"], "inner"
    ).select(
        "node1",
        "label",
        F.col("value").alias("node2"),
        F.concat_ws("-", "node1", "label", "value").alias("id"),
        "vnode",
    )
    anchor = incoming.select("vnode", F.col("id").alias("anchor_id")).dropDuplicates(["vnode"])

    # Other edges ON the value node become qualifiers of the new edge.
    qualifiers = (
        edges.filter(~F.col("label").isin([trigger_label, value_label]))
        .join(F.broadcast(anchor), edges["node1"] == anchor["vnode"], "inner")
        .select(
            F.col("anchor_id").alias("node1"),
            "label",
            "node2",
            F.concat_ws("-", "anchor_id", "label").alias("id"),
        )
    )

    vset = values.select("vnode")
    rest = (
        edges.join(F.broadcast(vset), edges["node1"] == vset["vnode"], "left_anti")
        .join(F.broadcast(vset), F.col("node2") == vset["vnode"], "left_anti")
        .select("node1", "label", "node2")
        .withColumn("id", F.lit(""))
    )
    return incoming.drop("vnode").unionByName(qualifiers).unionByName(rest)
