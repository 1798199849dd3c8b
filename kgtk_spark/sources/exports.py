"""Export formats: Neo4j Cypher, GitHub markdown.

Reference: kgtk/cli/export_neo4j.py (CREATE statements per node/edge),
kgtk/cli/md.py + kgtk/io/kgtkwriter.py:476-482 (markdown tables,
report-only → driver-side by design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def export_cypher(edges: DataFrame, rel_default: str = "RELATES") -> DataFrame:
    """KGTK edges → Cypher MERGE statements (column ``cypher``).

    Node ids/labels are escaped into backticked identifiers; relation
    type = the KGTK label sanitized to a legal Cypher rel-type.
    """
    def q(col):
        return F.regexp_replace(col, r"(['\\])", r"\\$1")

    rel = F.upper(F.regexp_replace(F.coalesce(F.col("label"), F.lit(rel_default)), r"[^A-Za-z0-9_]", "_"))
    return edges.select(
        F.concat(
            F.lit("MERGE (a:Node {id: '"), q(F.col("node1")),
            F.lit("'}) MERGE (b:Node {id: '"), q(F.col("node2")),
            F.lit("'}) MERGE (a)-[:`"), rel, F.lit("`]->(b);"),
        ).alias("cypher")
    )


def to_markdown(df: DataFrame, max_rows: int = 100) -> str:
    """Driver-side GitHub-markdown rendering (report output only —
    never part of a distributed plan)."""
    rows = df.limit(max_rows).collect()
    cols = df.columns
    lines = [
        "| " + " | ".join(cols) + " |",
        "| " + " | ".join("--" for _ in cols) + " |",
    ]
    for r in rows:
        lines.append("| " + " | ".join("" if r[c] is None else str(r[c]) for c in cols) + " |")
    return "\n".join(lines)
