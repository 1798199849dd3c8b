"""kgtk-style command-line surface over the Spark operators.

The reference is driven as ``kgtk <command> -i in.tsv -o out.tsv ...``
(kgtk/cli_entry.py + one argparse module per command under kgtk/cli/).
This module reproduces that surface for the core edge-file commands so
a reference user can run the same invocations against the Spark engine:

    python -m kgtk_spark filter -i edges.tsv -p ';P31;' -o out
    python -m kgtk_spark ifexists -i e.tsv --filter-on f.tsv -o out
    python -m kgtk_spark cat -i a.tsv b.tsv.gz -o all
    python -m kgtk_spark connected-components -i e.tsv -o cc

I/O rules:
- inputs are KGTK TSV (optionally .gz/.bz2/.xz via Hadoop codecs);
- ``-o PATH`` writes a directory of part files (``--single-file`` for
  one part); ``-o -`` streams TSV lines to stdout like the reference's
  default stdout behavior (driver-side toLocalIterator, bounded
  memory);
- ``--output-format`` picks the KgtkWriter format family (kgtk, tsv,
  csv, md, jsonl, jsonl-map, ...).

Flag names follow the reference commands' argparse (citations per
subcommand builder).
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import DataFrame, SparkSession


def _spark(args) -> SparkSession:
    from kgtk_spark.session import get_spark

    return get_spark(app_name=f"kgtk_spark_{args.command}")


def _read(spark: SparkSession, path: str, mode: str = "auto") -> DataFrame:
    from kgtk_spark.schema import read_kgtk_tsv

    return read_kgtk_tsv(spark, path, mode=mode)


def _write(df: DataFrame, args, path: str | None = None) -> None:
    path = path or args.output_file
    fmt = getattr(args, "output_format", "kgtk") or "kgtk"
    if path == "-":
        # Dispatch by format family like the file branch — format_lines
        # only understands kgtk/tsv*/csv cell reformatting.
        if fmt == "md":
            from kgtk_spark.sources.exports import to_markdown

            sys.stdout.write(to_markdown(df))
            return
        if fmt.startswith("json"):
            import json as _json

            from kgtk_spark.sources.json_writer import kgtk_json_lines

            lines = kgtk_json_lines(df, fmt)
            if fmt.startswith("jsonl"):
                if fmt == "jsonl":
                    sys.stdout.write(
                        _json.dumps(df.columns, separators=(",", ":")) + "\n"
                    )
                for row in lines.toLocalIterator():
                    sys.stdout.write(row["line"] + "\n")
            else:
                sys.stdout.write("[\n")
                if fmt == "json":
                    sys.stdout.write(
                        _json.dumps(df.columns, separators=(",", ":")) + ",\n"
                    )
                for row in lines.toLocalIterator():
                    sys.stdout.write(row["line"] + ",\n")
                sys.stdout.write("]\n")
            return
        from kgtk_spark.sources.tsv_writer import format_lines

        sep = "," if fmt == "csv" else "\t"
        sys.stdout.write(sep.join(df.columns) + "\n")
        render = format_lines(df, "tsv" if fmt == "kgtk" else fmt)
        for row in render.toLocalIterator():
            sys.stdout.write(row["line"] + "\n")
        return
    single = getattr(args, "single_file", False)
    if fmt == "kgtk":
        from kgtk_spark.schema import write_kgtk_tsv

        write_kgtk_tsv(df, path, single_file=single)
    elif fmt == "md":
        from kgtk_spark.sources.exports import to_markdown

        with open(path, "w", encoding="utf-8") as fp:
            fp.write(to_markdown(df))
    elif fmt.startswith("json"):
        from kgtk_spark.sources.json_writer import write_kgtk_json

        write_kgtk_json(df, path, fmt=fmt, single_file=single)
    else:
        from kgtk_spark.sources.tsv_writer import write_kgtk_formatted

        write_kgtk_formatted(df, path, fmt=fmt, single_file=single)


def _maybe_reject(args, reject_df: DataFrame | None) -> None:
    rf = getattr(args, "reject_file", None)
    if rf and reject_df is not None:
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        from kgtk_spark.schema import write_kgtk_tsv

        # array columns (e.g. reject_reasons) flatten to |-list cells
        for f in reject_df.schema.fields:
            if isinstance(f.dataType, T.ArrayType):
                reject_df = reject_df.withColumn(
                    f.name, F.array_join(F.col(f.name), "|")
                )
        write_kgtk_tsv(reject_df, rf, single_file=getattr(args, "single_file", False))


def _add_io(p: argparse.ArgumentParser, multi_input: bool = False) -> None:
    if multi_input:
        p.add_argument("-i", "--input-file", nargs="+", required=True)
    else:
        p.add_argument("-i", "--input-file", required=True)
    p.add_argument("-o", "--output-file", required=True)
    p.add_argument("--output-format", default="kgtk")
    p.add_argument("--single-file", action="store_true")
    p.add_argument("--mode", default="auto", choices=["auto", "edge", "node", "none"])


def _columns_list(val: str) -> list[str]:
    return [c for c in val.split(",") if c]


# --------------------------------------------------------------------------
# subcommand runners: each returns the output DataFrame
# --------------------------------------------------------------------------

def run_cat(spark, args):
    from kgtk_spark.operators import kgtk_cat

    return kgtk_cat(*[_read(spark, p, args.mode) for p in args.input_file])


def run_filter(spark, args):
    from kgtk_spark.operators import kgtk_filter

    df = _read(spark, args.input_file, args.mode)
    out, reject = kgtk_filter(
        df, args.pattern, or_=getattr(args, "or_", False),
        invert=args.invert, with_reject=True,
    )
    _maybe_reject(args, reject)
    return out


def run_ifexists(spark, args, invert: bool = False):
    from kgtk_spark.operators import if_exists, if_not_exists

    df = _read(spark, args.input_file, args.mode)
    flt = _read(spark, args.filter_on, args.mode)
    fn = if_not_exists if invert else if_exists
    out, reject = fn(
        df, flt,
        input_keys=args.input_keys, filter_keys=args.filter_keys,
        with_reject=True,
    )
    _maybe_reject(args, reject)
    return out


def run_join(spark, args):
    from kgtk_spark.operators import kgtk_join

    left = _read(spark, args.input_file, args.mode)
    right = _read(spark, args.with_file, args.mode)
    how = "outer" if args.left_join and args.right_join else (
        "left" if args.left_join else ("right" if args.right_join else "inner")
    )
    return kgtk_join(
        left, right, how=how,
        left_join_columns=args.left_join_columns,
        right_join_columns=args.right_join_columns,
        join_on_label=args.join_on_label, join_on_node2=args.join_on_node2,
    )


def run_lift(spark, args):
    from kgtk_spark.operators import kgtk_lift

    df = _read(spark, args.input_file, args.mode)
    labels = _read(spark, args.label_file, args.mode) if args.label_file else None
    return kgtk_lift(
        df, labels,
        columns_to_lift=args.columns_to_lift,
        label_select_value=args.label_select_value,
        lift_suffix=args.lift_suffix,
        remove_label_rows=not args.keep_label_rows,
    )


def run_lower(spark, args):
    from kgtk_spark.operators import kgtk_lower

    return kgtk_lower(_read(spark, args.input_file, args.mode))


def run_compact(spark, args):
    from kgtk_spark.operators import kgtk_compact

    return kgtk_compact(_read(spark, args.input_file, args.mode), keys=args.key_columns)


def run_deduplicate(spark, args):
    from kgtk_spark.operators import deduplicate

    return deduplicate(_read(spark, args.input_file, args.mode))


def run_unique(spark, args):
    from kgtk_spark.operators import kgtk_unique

    return kgtk_unique(
        _read(spark, args.input_file, args.mode), args.column,
        where_column=args.where, where_values=args.in_values,
        output_format=args.format,
    )


def run_add_id(spark, args):
    from kgtk_spark.operators import add_id

    return add_id(
        _read(spark, args.input_file, args.mode),
        style=args.id_style, prefix=args.id_prefix,
        initial_id=args.initial_id, overwrite=args.overwrite_id,
    )


def run_sort(spark, args):
    from kgtk_spark.operators import kgtk_sort

    df = _read(spark, args.input_file, args.mode)
    return kgtk_sort(df, args.columns or df.columns, reverse=args.reverse)


def run_head(spark, args):
    from kgtk_spark.operators import kgtk_head

    return kgtk_head(_read(spark, args.input_file, args.mode), args.n)


def run_remove_columns(spark, args):
    from kgtk_spark.operators import remove_columns

    return remove_columns(_read(spark, args.input_file, args.mode), args.columns)


def run_rename_columns(spark, args):
    from kgtk_spark.operators import rename_columns

    return rename_columns(
        _read(spark, args.input_file, args.mode),
        output_columns=args.output_columns,
        old_columns=args.old_columns, new_columns=args.new_columns,
    )


def run_reorder_columns(spark, args):
    from kgtk_spark.operators import reorder_columns

    return reorder_columns(
        _read(spark, args.input_file, args.mode), args.columns, trim=args.trim
    )


def run_calc(spark, args):
    from kgtk_spark.operators import kgtk_calc

    return kgtk_calc(
        _read(spark, args.input_file, args.mode),
        operation=args.do, columns=args.columns or [], into=args.into,
    )


def run_expand(spark, args):
    from kgtk_spark.operators import kgtk_expand

    return kgtk_expand(_read(spark, args.input_file, args.mode),
                       key_columns=args.key_columns)


def run_explode(spark, args):
    from kgtk_spark.operators import kgtk_explode

    return kgtk_explode(
        _read(spark, args.input_file, args.mode), column=args.column,
    )


def run_implode(spark, args):
    from kgtk_spark.operators import kgtk_implode

    df = _read(spark, args.input_file, args.mode)
    out, reject = kgtk_implode(df, column=args.column, with_reject=True)
    _maybe_reject(args, reject)
    return out


def run_normalize_nodes(spark, args):
    from kgtk_spark.operators import normalize_nodes

    return normalize_nodes(_read(spark, args.input_file, args.mode))


def run_unreify(spark, args):
    from kgtk_spark.operators import unreify_rdf_statements

    return unreify_rdf_statements(_read(spark, args.input_file, args.mode))


def run_ifempty(spark, args, invert: bool = False):
    from kgtk_spark.operators import if_empty

    return if_empty(
        _read(spark, args.input_file, args.mode), args.columns,
        all_are=args.all, invert=invert,
    )


def run_unreify_values(spark, args):
    from kgtk_spark.operators import unreify_values

    return unreify_values(_read(spark, args.input_file, args.mode))


def run_export_ntriples(spark, args):
    from kgtk_spark.sources.ntriples import export_ntriples

    return export_ntriples(_read(spark, args.input_file, args.mode))


def run_export_cypher(spark, args):
    from kgtk_spark.sources.exports import export_cypher

    return export_cypher(_read(spark, args.input_file, args.mode))


def run_export_graphml(spark, args):
    # CLI face of sources/graphml.export_graphml (the interchange half
    # of the reference's export-gt; the .gt binary itself is
    # graph-tool-internal and intentionally not reproduced)
    from kgtk_spark.sources.graphml import export_graphml

    export_graphml(
        _read(spark, args.input_file, args.mode),
        args.output_file,
        edge_attrs=args.edge_attr or None,
    )
    return None


def run_generate_wikidata_triples(spark, args):
    from kgtk_spark.sources.wikidata_rdf import generate_wikidata_triples

    return generate_wikidata_triples(
        _read(spark, args.input_file, args.mode),
        _read(spark, args.property_types_file, "none"),
        truthy=not args.not_truthy,
    )


def run_generate_mediawiki_jsons(spark, args):
    from kgtk_spark.sources.wikidata_json import generate_wikidata_json

    return generate_wikidata_json(
        _read(spark, args.input_file, args.mode),
        _read(spark, args.property_types_file, "none"),
    )


def run_validate_properties(spark, args):
    from kgtk_spark.operators.validate_properties import (
        load_property_patterns,
        validate_properties,
    )

    df = _read(spark, args.input_file, args.mode)
    patterns = load_property_patterns(_read(spark, args.pattern_file, "none"))
    valid, reject = validate_properties(df, patterns)
    _maybe_reject(args, reject)
    return valid


def run_validate(spark, args):
    from kgtk_spark.operators import kgtk_clean

    df = _read(spark, args.input_file, args.mode)
    valid, reject = kgtk_clean(df)
    _maybe_reject(args, reject)
    return valid


def run_connected_components(spark, args):
    from kgtk_spark.graph.connected_components import connected_components

    return connected_components(
        _read(spark, args.input_file, args.mode),
        properties=args.properties,
        minimum_cluster_size=args.minimum_cluster_size,
        cluster_name_method=args.cluster_name_method,
        cluster_name_prefix=args.cluster_name_prefix,
        cluster_name_separator=args.cluster_name_separator,
        cluster_name_zfill=args.cluster_name_zfill,
        strong=args.strong,
    )


def run_reachable_nodes(spark, args):
    from kgtk_spark.graph.reachable import reachable_nodes

    roots: list[str] | DataFrame = args.root or []
    if args.rootfile:
        roots = _read(spark, args.rootfile, "none").select(args.rootfilecolumn)
    return reachable_nodes(
        _read(spark, args.input_file, args.mode), roots,
        properties=args.props, label_value=args.label,
    )


def run_paths(spark, args):
    from kgtk_spark.graph.reachable import paths

    return paths(
        _read(spark, args.input_file, args.mode),
        args.source_nodes, args.target_nodes, max_hops=args.max_hops,
    )


def run_graph_statistics(spark, args):
    from kgtk_spark.graph.stats import graph_statistics

    return graph_statistics(
        _read(spark, args.input_file, args.mode),
        compute_pagerank=args.pagerank, compute_hits=args.hits,
    )


def run_import_ntriples(spark, args):
    from kgtk_spark.sources.ntriples import import_ntriples

    return import_ntriples(spark, args.input_file)


# --------------------------------------------------------------------------
# CSKG / Wikidata import-export family (kgtk/cli/import_*.py siblings)
# --------------------------------------------------------------------------

def run_import_conceptnet(spark, args):
    from kgtk_spark.sources.cskg import import_conceptnet, read_conceptnet_csv

    raw = read_conceptnet_csv(spark, args.input_file)
    return import_conceptnet(raw, english_only=args.english_only)


def run_import_concept_pairs(spark, args):
    from pyspark.sql import functions as F

    from kgtk_spark.sources.cskg import import_concept_pairs

    # reference input: one whitespace-separated concept pair per line
    raw = (
        spark.read.text(args.input_file)
        .select(F.split(F.trim("value"), r"\s+").alias("p"))
        .select(F.col("p")[0].alias("w1"), F.col("p")[1].alias("w2"))
    )
    return import_concept_pairs(raw, relation=args.relation, source=args.source)


def run_import_atomic(spark, args):
    from kgtk_spark.sources.cskg import import_atomic

    # reference input: the ATOMIC v4 CSV (event + JSON-list relation cols)
    raw = spark.read.csv(args.input_file, header=True, quote='"', escape='"')
    if "event" not in raw.columns and raw.columns:
        raw = raw.withColumnRenamed(raw.columns[0], "event")
    return import_atomic(raw)


def run_import_wordnet(spark, args):
    from kgtk_spark.sources.cskg import import_wordnet

    # synset table as JSON lines: name, lemmas[], hypernyms[], ... —
    # the shape the reference builds from nltk (get_wn_data()); nltk is
    # not in this container, so the dump is the CLI's input contract.
    return import_wordnet(spark.read.json(args.input_file))


def run_import_framenet(spark, args):
    from kgtk_spark.sources.cskg import import_framenet

    read = lambda p: spark.read.json(p) if p else None  # noqa: E731
    return import_framenet(
        frame_relations=read(args.frame_relations),
        lex_units=read(args.lex_units),
        frame_elements=read(args.frame_elements),
    )


def run_import_visualgenome(spark, args):
    from kgtk_spark.sources.cskg import (
        import_visualgenome,
        read_visualgenome_scene_graphs,
    )

    scenes = read_visualgenome_scene_graphs(spark, args.input_file)
    attrs = spark.read.json(args.attr_synsets)
    return import_visualgenome(scenes, attrs)


def run_import_wikidata(spark, args):
    from kgtk_spark.schema import write_kgtk_tsv
    from kgtk_spark.sources.wikidata import import_wikidata_jsonl

    nodes, edges = import_wikidata_jsonl(spark, args.input_file)
    if getattr(args, "node_file", None):
        write_kgtk_tsv(nodes, args.node_file,
                       single_file=getattr(args, "single_file", False))
    return edges


def run_export_wikidata(spark, args):
    from kgtk_spark.sources.wikidata_export import export_wikidata_json

    out = export_wikidata_json(_read(spark, args.input_file, args.mode))
    # one entity-JSON per line (the reference's dump shape), sorted for
    # reproducible output; written here as raw text, not a KGTK table
    lines = out.orderBy("id").select("json")
    if args.output_file == "-":
        for row in lines.toLocalIterator():
            sys.stdout.write(row["json"] + "\n")
        return None
    w = lines.coalesce(1) if getattr(args, "single_file", False) else lines
    w.write.mode("overwrite").text(args.output_file)
    return None


def run_text_embedding(spark, args):
    from pyspark.sql import functions as F

    from kgtk_spark.graph.embedding import text_embedding

    out = text_embedding(
        _read(spark, args.input_file, args.mode),
        dim=args.dim,
        backend=args.backend,
    )
    # KGTK writers carry string cells: render the vector as csv text
    return out.select(
        "node",
        "sentence",
        F.array_join(
            F.transform("embedding",
                        lambda x: F.round(x.cast("double"), 6).cast("string")),
            ",",
        ).alias("embedding"),
    )


# --------------------------------------------------------------------------
# parser
# --------------------------------------------------------------------------

def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="kgtk_spark", description="KGTK command surface on Spark"
    )
    sub = ap.add_subparsers(dest="command", required=True)

    def cmd(name, runner, multi_input=False):
        p = sub.add_parser(name)
        p.set_defaults(runner=runner)
        _add_io(p, multi_input=multi_input)
        return p

    cmd("cat", run_cat, multi_input=True)

    p = cmd("filter", run_filter)  # kgtk/cli/filter.py
    p.add_argument("-p", "--pattern", required=True)
    p.add_argument("--or", dest="or_", action="store_true")
    p.add_argument("--invert", action="store_true")
    p.add_argument("--reject-file")

    for name, inv in (("ifexists", False), ("ifnotexists", True)):
        p = sub.add_parser(name)  # kgtk/cli/ifexists.py
        p.set_defaults(runner=lambda s, a, inv=inv: run_ifexists(s, a, invert=inv))
        _add_io(p)
        p.add_argument("--filter-on", required=True)
        p.add_argument("--input-keys", nargs="*", default=None)
        p.add_argument("--filter-keys", nargs="*", default=None)
        p.add_argument("--reject-file")

    p = cmd("join", run_join)  # kgtk/join/kgtkjoiner.py
    p.add_argument("--with-file", required=True)
    p.add_argument("--left-join", action="store_true")
    p.add_argument("--right-join", action="store_true")
    p.add_argument("--left-join-columns", nargs="*", default=None)
    p.add_argument("--right-join-columns", nargs="*", default=None)
    p.add_argument("--join-on-label", action="store_true")
    p.add_argument("--join-on-node2", action="store_true")

    p = cmd("lift", run_lift)  # kgtk/cli/lift.py
    p.add_argument("--label-file", default=None)
    p.add_argument("--columns-to-lift", nargs="*", default=None)
    p.add_argument("--label-select-value", default="label")
    p.add_argument("--lift-suffix", default=";label")
    p.add_argument("--keep-label-rows", action="store_true")

    cmd("lower", run_lower)

    p = cmd("compact", run_compact)  # kgtk/cli/compact.py
    p.add_argument("--key-columns", nargs="*", default=None)

    cmd("deduplicate", run_deduplicate)

    p = cmd("unique", run_unique)  # kgtk/cli/unique.py
    p.add_argument("--column", required=True)
    p.add_argument("--where", default=None)
    p.add_argument("--in", dest="in_values", nargs="*", default=None)
    p.add_argument("--format", default="edge", choices=["edge", "node"])

    p = cmd("add-id", run_add_id)  # kgtk/cli/add_id.py
    p.add_argument("--id-style", default="prefix###")
    p.add_argument("--id-prefix", default="E")
    p.add_argument("--initial-id", type=int, default=1)
    p.add_argument("--overwrite-id", action="store_true")

    # kgtk has BOTH `sort` and `sort2` (kgtk/cli/sort.py, sort2.py) —
    # same semantics, different native implementations; on Spark they
    # are one external sort, registered under both names.
    for sort_name in ("sort", "sort2"):
        p = cmd(sort_name, run_sort)
        p.add_argument("-c", "--columns", nargs="*", default=None)
        p.add_argument("-r", "--reverse", action="store_true")

    p = cmd("head", run_head)
    p.add_argument("-n", type=int, default=10)

    p = cmd("remove-columns", run_remove_columns)  # kgtk/cli/remove_columns.py
    p.add_argument("-c", "--columns", type=_columns_list, required=True)

    p = cmd("rename-columns", run_rename_columns)  # kgtk/cli/rename_columns.py
    p.add_argument("--output-columns", nargs="*", default=None)
    p.add_argument("--old-columns", nargs="*", default=None)
    p.add_argument("--new-columns", nargs="*", default=None)

    p = cmd("reorder-columns", run_reorder_columns)  # kgtk/cli/reorder_columns.py
    p.add_argument("-c", "--columns", nargs="+", required=True)
    p.add_argument("--trim", action="store_true")

    p = cmd("calc", run_calc)  # kgtk/cli/calc.py
    p.add_argument("--do", required=True)
    p.add_argument("-c", "--columns", nargs="*", default=None)
    p.add_argument("--into", required=True)

    p = cmd("expand", run_expand)  # kgtk/cli/expand.py
    p.add_argument("--key-columns", nargs="*", default=None)

    p = cmd("explode", run_explode)  # kgtk/cli/explode.py
    p.add_argument("--column", default="node2")

    p = cmd("implode", run_implode)  # kgtk/cli/implode.py
    p.add_argument("--column", default="node2")
    p.add_argument("--reject-file")

    cmd("normalize-nodes", run_normalize_nodes)
    cmd("unreify-rdf-statements", run_unreify)

    for name, inv in (("ifempty", False), ("ifnotempty", True)):
        p = sub.add_parser(name)  # kgtk/cli/ifempty.py, ifnotempty.py
        p.set_defaults(runner=lambda s, a, inv=inv: run_ifempty(s, a, invert=inv))
        _add_io(p)
        p.add_argument("-c", "--columns", nargs="+", required=True)
        p.add_argument("--all", action="store_true")

    def run_md(spark, args):
        args.output_format = "md"
        return run_cat(spark, args)

    cmd("md", run_md, multi_input=True)  # kgtk/cli/md.py (markdown table)
    cmd("unreify-values", run_unreify_values)
    cmd("zconcat", run_cat, multi_input=True)  # codec-auto concat
    cmd("export-ntriples", run_export_ntriples)
    cmd("export-neo4j", run_export_cypher)  # kgtk/cli/export_neo4j.py

    p = cmd("export-graphml", run_export_graphml)
    p.add_argument("--edge-attr", action="append")

    p = cmd("generate-wikidata-triples", run_generate_wikidata_triples)
    p.add_argument("--property-types-file", required=True)
    p.add_argument("--not-truthy", action="store_true")

    p = cmd("generate-mediawiki-jsons", run_generate_mediawiki_jsons)
    p.add_argument("--property-types-file", required=True)

    p = cmd("validate-properties", run_validate_properties)
    p.add_argument("--pattern-file", required=True)
    p.add_argument("--reject-file")

    p = cmd("validate", run_validate)  # kgtk/cli/validate.py
    p.add_argument("--reject-file")
    sub_clean = cmd("clean-data", run_validate)  # kgtk/cli/clean_data.py
    sub_clean.add_argument("--reject-file")

    p = cmd("connected-components", run_connected_components)
    p.add_argument("--properties", nargs="*", default=None)
    p.add_argument("--minimum-cluster-size", type=int, default=2)
    p.add_argument("--cluster-name-method", default="hash",
                   choices=["cat", "hash", "first", "last", "shortest",
                            "longest", "numbered", "prefixed", "lowest",
                            "highest"])
    p.add_argument("--cluster-name-prefix", default="CLUS")
    p.add_argument("--cluster-name-separator", default="+")
    p.add_argument("--cluster-name-zfill", type=int, default=4)
    p.add_argument("--strong", action="store_true")

    p = cmd("reachable-nodes", run_reachable_nodes)  # kgtk/cli/reachable_nodes.py
    p.add_argument("--root", nargs="*", default=None)
    p.add_argument("--rootfile", default=None)
    p.add_argument("--rootfilecolumn", default="node1")
    p.add_argument("--props", nargs="*", default=None)
    p.add_argument("--label", default="reachable")

    p = cmd("paths", run_paths)  # kgtk/cli/paths.py
    p.add_argument("--source-nodes", nargs="+", required=True)
    p.add_argument("--target-nodes", nargs="+", required=True)
    p.add_argument("--max-hops", type=int, default=3)

    p = cmd("graph-statistics", run_graph_statistics)  # kgtk/cli/graph_statistics.py
    p.add_argument("--pagerank", action="store_true")
    p.add_argument("--hits", action="store_true")

    cmd("import-ntriples", run_import_ntriples)

    # import/export family (kgtk/cli/import_conceptnet.py:16 + siblings)
    p = cmd("import-conceptnet", run_import_conceptnet)
    p.add_argument("--english-only", action="store_true")

    p = cmd("import-concept-pairs", run_import_concept_pairs)
    p.add_argument("--relation", default="/r/RelatedTo")
    p.add_argument("--source", default="CN")

    cmd("import-atomic", run_import_atomic)
    cmd("import-wordnet", run_import_wordnet)

    p = sub.add_parser("import-framenet")
    p.set_defaults(runner=run_import_framenet)
    p.add_argument("--frame-relations")
    p.add_argument("--lex-units")
    p.add_argument("--frame-elements")
    p.add_argument("-o", "--output-file", required=True)
    p.add_argument("--output-format", default="kgtk")
    p.add_argument("--single-file", action="store_true")
    p.add_argument("--mode", default="auto",
                   choices=["auto", "edge", "node", "none"])

    p = cmd("import-visualgenome", run_import_visualgenome)
    p.add_argument("--attr-synsets", required=True)

    p = cmd("import-wikidata", run_import_wikidata)
    p.add_argument("--node-file")

    p = cmd("export-wikidata", run_export_wikidata)

    p = cmd("text-embedding", run_text_embedding)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--backend", default="hash_kernel")

    return ap


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    spark = _spark(args)
    out = args.runner(spark, args)
    if out is not None:  # some runners (export-wikidata) write directly
        _write(out, args)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
