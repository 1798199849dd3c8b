"""MediaWiki entity-JSON generator: KGTK edges → SQID-style JSON docs.

Reference: kgtk/generator.py:521-1100 (JsonGenerator). The reference
accumulates one big dict per entity while streaming lines; here each
entity document is assembled with groupBy aggregations and the
qualifier → statement attachment is a join on the statement edge id
(the reference relies on input adjacency).

Bug-compatible with the reference where its output is quirky, since
consumers (SQID) were built against that output — each mirrored quirk
is cited:

- the label/description/alias language key is ``languange`` [sic]
  (generator.py:714-729);
- each alias list entry is wrapped in an extra ``{lang: {...}}`` dict
  (generator.py:727);
- yyyy-mm-dd times get ``-00-00T00:00:00Z`` appended to the full date
  (generator.py:834-836);
- the quantity upper bound key is ``UpperBound`` [sic]
  (generator.py:966).

Output: one row per entity, (id, doc) with ``doc`` the JSON document
string. All assembly is JVM (to_json / collect_list / concat); the
qualifiers-order within a statement is deterministic (sorted) rather
than input order, since a distributed engine has no line order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kgtk_spark.sources.wikidata_rdf import _clean_number, _text_and_lang

_TIME_YMD = r"^[12]\d{3}-(0[1-9]|1[0-2])-(0[1-9]|[12]\d|3[01])$"
_TIME_Y = r"^[12]\d{3}$"
_QUANTITY = r"^([+-]?[0-9]+\.?[0-9]*[eE]?[-]?[0-9]*)(?:\[([+-]?[0-9]+\.?[0-9]*),([+-]?[0-9]+\.?[0-9]*)\])?([UQ].*)?$"

# SQID datatype names (generator.py:529-557)
JSON_DATATYPES = {
    "item": "wikibase-item",
    "WikibaseItem": "wikibase-item",
    "property": "wikibase-item",
    "WikibaseProperty": "wikibase-item",
    "time": "time",
    "Time": "time",
    "globe-coordinate": "globe-coordinate",
    "GlobeCoordinate": "globe-coordinate",
    "quantity": "quantity",
    "Quantity": "quantity",
    "monolingualtext": "monolingualtext",
    "Monolingualtext": "monolingualtext",
    "string": "string",
    "String": "string",
    "external-identifier": "external-id",
    "ExternalId": "external-id",
    "url": "url",
    "Url": "url",
}


def _json_quote(c: Column) -> Column:
    c = F.replace(c, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit('"'), F.lit('\\"'))
    c = F.replace(c, F.lit("\n"), F.lit("\\n"))
    c = F.replace(c, F.lit("\t"), F.lit("\\t"))
    c = F.replace(c, F.lit("\r"), F.lit("\\r"))
    return F.concat(F.lit('"'), c, F.lit('"'))


def _datavalue(node2: Column, dtype: Column, prop: Column) -> Column:
    """The snak JSON body per SQID datatype; NULL = corrupted edge."""
    # wikibase-item (generator.py:795-830)
    item = F.concat(
        F.lit('{"value":{"entity-type":"item","numeric-id":0,"id":'),
        _json_quote(node2),
        F.lit('},"type":"wikibase-entityid"}'),
    )
    # time (generator.py:832-894) — quirks mirrored, see module doc
    iso = F.regexp_replace(F.regexp_replace(F.element_at(F.split(node2, "/"), 1), r"^\^", ""), r"^\+", "")
    precision = F.element_at(F.split(node2, "/"), 2)
    time_string = (
        F.when(node2.rlike(_TIME_YMD), F.concat(node2, F.lit("-00-00T00:00:00Z")))
        .when(node2.rlike(_TIME_Y), F.concat(node2, F.lit("-01-01T00:00:00Z")))
        .when(node2.contains("/"), iso)
    )
    time_precision = (
        F.when(node2.rlike(_TIME_YMD), F.lit("11"))
        .when(node2.rlike(_TIME_Y), F.lit("9"))
        .when(node2.contains("/") & precision.rlike(r"^\d+$"), precision)
    )
    time = F.when(
        time_string.isNotNull() & time_precision.isNotNull(),
        F.concat(
            F.lit('{"value":{"time":'),
            _json_quote(time_string),
            F.lit(',"timezone":0,"before":0,"after":0,"precision":'),
            time_precision,
            F.lit(
                ',"calendarmodel":"http://www.wikidata.org/entity/Q1985727"},"type":"time"}'
            ),
        ),
    )
    # globe-coordinate (generator.py:896-944)
    lat = F.element_at(F.split(F.substring(node2, 2, 2_000_000), "/"), 1).cast("double")
    lon = F.element_at(F.split(F.substring(node2, 2, 2_000_000), "/"), 2).cast("double")
    coord = F.when(
        node2.startswith("@") & lat.isNotNull() & lon.isNotNull(),
        F.concat(
            F.lit('{"value":{"latitude":'),
            lat.cast("string"),
            F.lit(',"longitude":'),
            lon.cast("string"),
            F.lit(
                ',"altitude":null,"precision":0.01,"globe":"http://www.wikidata.org/entity/Q2"},"type":"globecoordinate"}'
            ),
        ),
    )
    # quantity (generator.py:946-995)
    amount = _clean_number(F.regexp_extract(node2, _QUANTITY, 1))
    lower = F.regexp_extract(node2, _QUANTITY, 2)
    upper = F.regexp_extract(node2, _QUANTITY, 3)
    unit = F.regexp_extract(node2, _QUANTITY, 4)
    opt = lambda c: F.when(c != "", _json_quote(_clean_number(c))).otherwise(  # noqa: E731
        F.lit("null")
    )
    quantity = F.when(
        F.regexp_extract(node2, _QUANTITY, 1) != "",
        F.concat(
            F.lit('{"value":{"amount":'),
            _json_quote(amount),
            F.lit(',"unit":'),
            F.when(
                unit != "",
                _json_quote(F.concat(F.lit("http://www.wikidata.org/entity/"), unit)),
            ).otherwise(F.lit("null")),
            F.lit(',"lowerBound":'),
            opt(lower),
            F.lit(',"UpperBound":'),
            opt(upper),
            F.lit('},"type":"quantity"}'),
        ),
    )
    # monolingualtext (generator.py:997-1040)
    text, lang = _text_and_lang(node2)
    mono = F.concat(
        F.lit('{"value":{"text":'),
        _json_quote(text),
        F.lit(',"language":'),
        _json_quote(lang),
        F.lit('},"type":"monolingualtext"}'),
    )
    # string datavalues run process_text_string (KGTK quotes stripped,
    # generator.py:1038-1046); external-id/url keep node2 verbatim
    # (:1066-1101).
    s_text, _s_lang = _text_and_lang(node2)
    string_v = F.concat(F.lit('{"value":'), _json_quote(s_text), F.lit(',"type":"string"}'))
    plain = F.concat(F.lit('{"value":'), _json_quote(node2), F.lit(',"type":"string"}'))

    return (
        F.when(dtype == "wikibase-item", item)
        .when(dtype == "time", time)
        .when(dtype == "globe-coordinate", coord)
        .when(dtype == "quantity", quantity)
        .when(dtype == "monolingualtext", mono)
        .when(dtype == "string", string_v)
        .otherwise(plain)  # external-id / url
    )


def _snak(node2: Column, dtype: Column, prop: Column) -> Column:
    dv = _datavalue(node2, dtype, prop)
    # the reference's coordinate builder hardcodes 'globecoordinate'
    # (no hyphen) as the snak datatype (generator.py:896-917)
    snak_dtype = F.when(
        dtype == "globe-coordinate", F.lit("globecoordinate")
    ).otherwise(dtype)
    return F.when(
        dv.isNotNull(),
        F.concat(
            F.lit('{"snaktype":"value","property":'),
            _json_quote(prop),
            F.lit(',"hash":"","datavalue":'),
            dv,
            F.lit(',"datatype":'),
            _json_quote(snak_dtype),
            F.lit("}"),
        ),
    )


def _lang_entry(node2: Column) -> tuple[Column, Column]:
    """(lang, '{"languange":...,"value":...}') — typo mirrored."""
    text, lang = _text_and_lang(node2)
    return lang, F.concat(
        F.lit('{"languange":'),
        _json_quote(lang),
        F.lit(',"value":'),
        _json_quote(text),
        F.lit("}"),
    )


def generate_wikidata_json(
    edges: DataFrame,
    property_types: DataFrame,
    label_set: tuple[str, ...] = ("label",),
    description_set: tuple[str, ...] = ("descriptions",),
    alias_set: tuple[str, ...] = ("aliases",),
    rank: str = "normal",
    use_rank_column: bool = False,
) -> DataFrame:
    """KGTK edge file (node1, label, node2, id) → (id, doc) MediaWiki
    entity JSON documents.

    ``use_rank_column=True`` is the reference's ``has_rank`` mode:
    each statement takes its own rank from the edge file's ``rank``
    column; the default ignores the column (matching the reference
    default and its golden outputs) and stamps the constant ``rank``."""
    props = F.broadcast(
        property_types.select(
            F.col("node1").alias("__prop__"), F.col("node2").alias("__kgtk_dt__")
        )
        .distinct()
        .withColumn(
            "__dtype__",
            F.create_map(*[F.lit(x) for kv in JSON_DATATYPES.items() for x in kv])[
                F.col("__kgtk_dt__")
            ],
        )
    )
    meta = [*label_set, *description_set, *alias_set, "data_type"]

    claims_edges = edges.filter(~F.col("label").isin(meta)).join(
        props, edges["label"] == props["__prop__"], "inner"
    )
    stmt_ids = claims_edges.select(F.col("id").alias("__sid__")).distinct()
    qual_edges = claims_edges.join(
        stmt_ids, claims_edges["node1"] == stmt_ids["__sid__"], "left_semi"
    )
    stmt_edges = claims_edges.join(
        stmt_ids, claims_edges["node1"] == stmt_ids["__sid__"], "left_anti"
    )

    # qualifiers per statement id → {"P1":[snaks],...} + qualifiers-order
    q = qual_edges.withColumn(
        "__snak__", _snak(F.col("node2"), F.col("__dtype__"), F.col("label"))
    ).filter(F.col("__snak__").isNotNull())
    q_by_prop = q.groupBy(F.col("node1").alias("__qsid__"), "label").agg(
        F.concat_ws(",", F.sort_array(F.collect_list("__snak__"))).alias("__snaks__")
    )
    q_obj = q_by_prop.groupBy("__qsid__").agg(
        F.concat_ws(
            ",",
            F.sort_array(
                F.collect_list(
                    F.concat(_json_quote(F.col("label")), F.lit(":["), F.col("__snaks__"), F.lit("]"))
                )
            ),
        ).alias("__quals__"),
        F.concat_ws(
            ",", F.sort_array(F.collect_list(_json_quote(F.col("label"))))
        ).alias("__qorder__"),
    )

    st = stmt_edges.withColumn(
        "__snak__", _snak(F.col("node2"), F.col("__dtype__"), F.col("label"))
    ).filter(F.col("__snak__").isNotNull())
    st = st.join(q_obj, st["id"] == q_obj["__qsid__"], "left")
    stmt_json = F.concat(
        F.lit('{"mainsnak":'),
        F.col("__snak__"),
        F.lit(',"type":"statement","id":'),
        _json_quote(F.concat(F.col("node1"), F.col("label"), F.col("node2"))),
        F.lit(',"rank":'),
        _json_quote(
            F.coalesce(F.col("rank"), F.lit(rank))
            if use_rank_column and "rank" in edges.columns
            else F.lit(rank)
        ),
        F.lit(',"references":[],"qualifiers":{'),
        F.coalesce(F.col("__quals__"), F.lit("")),
        F.lit('},"qualifiers-order":['),
        F.coalesce(F.col("__qorder__"), F.lit("")),
        F.lit("]}"),
    )
    claims_by_prop = st.groupBy("node1", "label").agg(
        F.concat_ws(",", F.sort_array(F.collect_list(stmt_json))).alias("__stmts__")
    )
    claims = claims_by_prop.groupBy("node1").agg(
        F.concat_ws(
            ",",
            F.sort_array(
                F.collect_list(
                    F.concat(_json_quote(F.col("label")), F.lit(":["), F.col("__stmts__"), F.lit("]"))
                )
            ),
        ).alias("__claims__")
    )

    def lang_map(labels: list[str], alias: bool = False) -> DataFrame:
        e = edges.filter(F.col("label").isin(list(labels)))
        lang, entry = _lang_entry(F.col("node2"))
        e = e.select("node1", lang.alias("__lang__"), entry.alias("__entry__"))
        if alias:
            # aliases[lang] is a LIST of {lang: entry} wrappers (:727)
            wrapped = F.concat(
                F.lit("{"), _json_quote(F.col("__lang__")), F.lit(":"), F.col("__entry__"), F.lit("}")
            )
            per_lang = e.groupBy("node1", "__lang__").agg(
                F.concat_ws(",", F.sort_array(F.collect_list(wrapped))).alias("__v__")
            )
            val = F.concat(F.lit("["), F.col("__v__"), F.lit("]"))
        else:
            per_lang = e.groupBy("node1", "__lang__").agg(
                F.max("__entry__").alias("__v__")
            )
            val = F.col("__v__")
        return per_lang.groupBy("node1").agg(
            F.concat_ws(
                ",",
                F.sort_array(
                    F.collect_list(F.concat(_json_quote(F.col("__lang__")), F.lit(":"), val))
                ),
            ).alias("__m__")
        )

    entities = (
        edges.filter(~F.col("label").isin(meta))
        .join(stmt_ids, edges["node1"] == stmt_ids["__sid__"], "left_anti")
        .select("node1")
        .union(edges.filter(F.col("label").isin(meta[:-1])).select("node1"))
        .distinct()
    )
    out = (
        entities.join(lang_map(list(label_set)).withColumnRenamed("__m__", "__labels__"), "node1", "left")
        .join(lang_map(list(description_set)).withColumnRenamed("__m__", "__descs__"), "node1", "left")
        .join(lang_map(list(alias_set), alias=True).withColumnRenamed("__m__", "__aliases__"), "node1", "left")
        .join(claims, "node1", "left")
        .join(props, F.col("node1") == props["__prop__"], "left")
    )
    is_prop = F.col("__kgtk_dt__").isNotNull()
    doc = F.concat(
        F.lit('{"labels":{'),
        F.coalesce("__labels__", F.lit("")),
        F.lit('},"descriptions":{'),
        F.coalesce("__descs__", F.lit("")),
        F.lit('},"aliases":{'),
        F.coalesce("__aliases__", F.lit("")),
        F.lit('},"claims":{'),
        F.coalesce("__claims__", F.lit("")),
        F.lit('},"sitelinks":{},"type":'),
        F.when(is_prop, F.lit('"property"')).otherwise(F.lit('"item"')),
        F.when(
            is_prop, F.concat(F.lit(',"datatype":'), _json_quote(F.col("__kgtk_dt__")))
        ).otherwise(F.lit("")),
        F.lit(',"id":'),
        _json_quote(F.col("node1")),
        F.lit(',"pageid":-1,"ns":-1,"title":'),
        _json_quote(
            F.when(is_prop, F.concat(F.lit("Property:"), F.col("node1"))).otherwise(
                F.col("node1")
            )
        ),
        F.lit(',"lastrevid":"2000-01-01T00:00:00Z"}'),
    )
    return out.select(F.col("node1").alias("id"), doc.alias("doc"))
