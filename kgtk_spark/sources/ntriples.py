"""N-Triples ↔ KGTK edges.

Import (kgtk/imports/kgtkntriples.py): each line
``<subj> <pred> <obj> .`` becomes a KGTK edge; IRIs are namespace-
compressed to ``prefix:local`` via a caller-supplied prefix map;
literals convert to KGTK values ("text" strings, 'text'@lang
language-qualified strings, numbers for xsd numeric types).

All parsing is JVM-side (regexp_extract / when-chains over
``spark.read.text``) — the reference's per-row Python loop and its
parallel-mapper pool are replaced by input-split parallelism and
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# <s> <p> o .   (o = rest, parsed separately)
_LINE = r"^\s*<([^>]*)>\s+<([^>]*)>\s+(.*?)\s*\.\s*$"

_NUMERIC_TYPES = [
    "http://www.w3.org/2001/XMLSchema#integer",
    "http://www.w3.org/2001/XMLSchema#decimal",
    "http://www.w3.org/2001/XMLSchema#double",
    "http://www.w3.org/2001/XMLSchema#float",
    "http://www.w3.org/2001/XMLSchema#int",
    "http://www.w3.org/2001/XMLSchema#long",
]


def _compress(col: Column, namespaces: dict[str, str]) -> Column:
    """IRI → prefix:local for the longest matching namespace."""
    out = col
    # longest namespace first so nested prefixes resolve correctly
    for ns, prefix in sorted(namespaces.items(), key=lambda kv: -len(kv[0])):
        out = F.when(
            out.startswith(ns), F.concat(F.lit(prefix + ":"), F.substring(out, len(ns) + 1, 10_000))
        ).otherwise(out)
    return out


def _convert_object(obj: Column, namespaces: dict[str, str]) -> Column:
    """RDF object term → KGTK value."""
    iri = F.regexp_extract(obj, r"^<([^>]*)>$", 1)
    lit = F.regexp_extract(obj, r'^"((?:[^"\\]|\\.)*)"', 1)
    lang = F.regexp_extract(obj, r'^"(?:[^"\\]|\\.)*"@([a-zA-Z-]+)$', 1)
    dtype = F.regexp_extract(obj, r'^"(?:[^"\\]|\\.)*"\^\^<([^>]*)>$', 1)

    return (
        F.when(iri != "", _compress(iri, namespaces))
        .when(lang != "", F.concat(F.lit("'"), lit, F.lit("'@"), lang))
        .when(dtype.isin(_NUMERIC_TYPES), lit)
        .when(
            dtype == "http://www.w3.org/2001/XMLSchema#dateTime",
            F.concat(F.lit("^"), lit),
        )
        .otherwise(F.concat(F.lit('"'), lit, F.lit('"')))
    )


DEFAULT_NAMESPACES = {
    "http://www.w3.org/1999/02/22-rdf-syntax-ns#": "rdf",
    "http://www.w3.org/2000/01/rdf-schema#": "rdfs",
    "http://www.w3.org/2002/07/owl#": "owl",
    "http://www.w3.org/2001/XMLSchema#": "xsd",
    "http://schema.org/": "schema",
    "http://www.wikidata.org/entity/": "wd",
    "http://www.wikidata.org/prop/direct/": "wdt",
}


def import_ntriples(
    spark: SparkSession,
    path_or_df: str | DataFrame,
    namespaces: dict[str, str] | None = None,
) -> DataFrame:
    """N-Triples file(s) → KGTK edge DataFrame (node1, label, node2)."""
    ns = namespaces or DEFAULT_NAMESPACES
    lines = (
        spark.read.text(path_or_df) if isinstance(path_or_df, str) else path_or_df
    )
    col = lines.columns[0]
    parsed = lines.select(
        F.regexp_extract(col, _LINE, 1).alias("s"),
        F.regexp_extract(col, _LINE, 2).alias("p"),
        F.regexp_extract(col, _LINE, 3).alias("o"),
    ).filter(F.col("s") != "")
    return parsed.select(
        _compress(F.col("s"), ns).alias("node1"),
        _compress(F.col("p"), ns).alias("label"),
        _convert_object(F.col("o"), ns).alias("node2"),
    )


def export_ntriples(
    edges: DataFrame, namespaces: dict[str, str] | None = None
) -> DataFrame:
    """KGTK edges → one N-Triples line per row (column ``ntriple``).

    Inverse of the import for symbols and plain strings; prefixed names
    re-expand via the namespace map.
    """
    ns = namespaces or DEFAULT_NAMESPACES
    inv = {prefix: iri for iri, prefix in ns.items()}

    def expand(col: Column) -> Column:
        out = F.concat(F.lit("<"), col, F.lit(">"))
        for prefix, iri in inv.items():
            out = F.when(
                col.startswith(prefix + ":"),
                F.concat(
                    F.lit("<" + iri), F.substring(col, len(prefix) + 2, 10_000), F.lit(">")
                ),
            ).otherwise(out)
        return out

    n2 = F.col("node2")
    obj = (
        F.when(n2.startswith('"'), n2)  # KGTK string == NT literal syntax
        .when(
            n2.startswith("'"),
            F.concat(
                F.lit('"'),
                F.regexp_extract(n2, r"^'(.*)'@[\w-]+$", 1),
                F.lit('"@'),
                F.regexp_extract(n2, r"@([\w-]+)$", 1),
            ),
        )
        .when(n2.startswith("^"), F.concat(F.lit('"'), F.substring(n2, 2, 10_000),
              F.lit('"^^<http://www.w3.org/2001/XMLSchema#dateTime>')))
        .otherwise(expand(n2))
    )
    return edges.select(
        F.concat_ws(" ", expand(F.col("node1")), expand(F.col("label")), obj, F.lit(".")).alias(
            "ntriple"
        )
    )
