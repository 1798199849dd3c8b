"""Wikidata RDF TripleGenerator vs the reference's triple-level output
(kgtk/generator.py:156-520; golden shapes from
kgtk/tests/data/P10_truthy.ttl and dates_truthy.ttl)."""

from __future__ import annotations

from kgtk_spark.sources.wikidata_rdf import (
    generate_wikidata_triples,
    serialize_prefixes,
)


def _props(spark):
    rows = [
        ("P10", "string"),
        ("P1628", "url"),
        ("P1629", "item"),
        ("P569", "time"),
        ("P1114", "quantity"),
        ("P625", "globe-coordinate"),
        ("P1476", "monolingualtext"),
        ("P582", "time"),
        ("P856", "url"),
        ("P212", "external-identifier"),
    ]
    return spark.createDataFrame(rows, "node1 string, node2 string")


def _triples(spark, edges):
    df = spark.createDataFrame(edges, "node1 string, label string, node2 string, id string")
    out = generate_wikidata_triples(df, _props(spark))
    return {(r["subject"], r["predicate"], r["object"]) for r in out.collect()}


def test_property_entity_and_item_statement(spark):
    got = _triples(
        spark,
        [
            ("P10", "label", "'video'@en", "P10-label-1"),
            ("P10", "aliases", "'media'@en", "P10-alias-0"),
            ("P10", "descriptions", "'relevant video'@en", "P10-description-0"),
            ("P10", "P1629", "Q34508", "P10-P1629-1"),
            ("P10", "P1628", "http://schema.org/video", "P10-P1628-1"),
        ],
    )
    # label family (golden: rdfs:label + schema:name + skos:prefLabel)
    assert ("wd:P10", "rdfs:label", '"video"@en') in got
    assert ("wd:P10", "schema:name", '"video"@en') in got
    assert ("wd:P10", "skos:prefLabel", '"video"@en') in got
    assert ("wd:P10", "skos:altLabel", '"media"@en') in got
    assert ("wd:P10", "schema:description", '"relevant video"@en') in got
    # P10 is a declared property → Property typing + system block
    assert ("wd:P10", "rdf:type", "wikibase:Property") in got
    assert ("wd:P10", "wikibase:propertyType", "wikibase:String") in got
    assert ("wd:P10", "wikibase:claim", "p:P10") in got
    assert ("wd:P10", "wikibase:directClaim", "wdt:P10") in got
    assert ("wd:P10", "wikibase:statementProperty", "ps:P10") in got
    # item-valued statement: p:/wds:/ps:/wdt: + BestRank (truthy)
    sid = "wds:P10-P10-P1629-1"
    assert ("wd:P10", "p:P1629", sid) in got
    assert (sid, "rdf:type", "wikibase:Statement") in got
    assert (sid, "wikibase:rank", "wikibase:BestRank") in got
    assert (sid, "ps:P1629", "wd:Q34508") in got
    assert ("wd:P10", "wdt:P1629", "wd:Q34508") in got
    assert ("wd:Q34508", "rdf:type", "wikibase:Item") in got
    # url-valued statement renders as an xsd:string literal (golden)
    assert ("wd:P10", "wdt:P1628", '"http://schema.org/video"^^xsd:string') in got


def test_time_quantity_coordinate_monolingual(spark):
    got = _triples(
        spark,
        [
            ("Q1", "P569", "^2020-06-04T00:00:00Z/11", "fakeid12"),
            ("Q1", "P569", "1989-06-04", "fakeid7"),
            ("Q1", "P569", "2010", "fakeid8"),
            ("Q1", "P1114", "+70[+60,+80]Q743895", "q1"),
            ("Q1", "P1114", "0.5", "q2"),
            ("Q1", "P625", "@39.9/116.4", "c1"),
            ("Q1", "P1476", "'a title'@en", "m1"),
            ("Q1", "P212", "978-3-16", "x1"),
        ],
    )
    assert ("wd:Q1", "rdf:type", "wikibase:Item") in got
    # ISO form: strip ^/+/Z and the precision suffix (dates_truthy.ttl)
    assert ("wd:Q1", "wdt:P569", '"2020-06-04T00:00:00"^^xsd:dateTime') in got
    # yyyy-mm-dd kept as-is; yyyy padded to Jan 1 (generator.py:341-360)
    assert ("wd:Q1", "wdt:P569", '"1989-06-04"^^xsd:dateTime') in got
    assert ("wd:Q1", "wdt:P569", '"2010-01-01"^^xsd:dateTime') in got
    # quantity: amount extracted from amount[lower,upper]Unit, + trimmed
    assert ("wd:Q1", "wdt:P1114", '"70"^^xsd:decimal') in got
    assert ("wd:Q1", "wdt:P1114", '"0.5"^^xsd:decimal') in got
    assert ("wd:Q1", "wdt:P625", '"Point(116.4 39.9)"^^geo:wktLiteral') in got
    assert ("wd:Q1", "wdt:P1476", '"a title"@en') in got
    assert ("wd:Q1", "wdt:P212", '"978-3-16"^^xsd:string') in got


def test_qualifier_attaches_to_statement_node(spark):
    got = _triples(
        spark,
        [
            ("Q1", "P1629", "Q2", "Q1-P1629-1"),
            ("Q1-P1629-1", "P582", "^1999-01-01T00:00:00Z/9", "Q1-P1629-1-P582"),
        ],
    )
    sid = "wds:Q1-Q1-P1629-1"
    assert (sid, "pq:P582", '"1999-01-01T00:00:00"^^xsd:dateTime') in got
    # the qualifier edge's node1 is NOT an entity
    assert not any(s == "wd:Q1-P1629-1" for s, _, _ in got)


def test_invalid_url_drops_statement_and_its_qualifiers(spark):
    got = _triples(
        spark,
        [
            ("Q1", "P856", "not a url", "bad1"),
            ("bad1", "P582", "^1999-01-01T00:00:00Z/9", "bad1-q"),
            ("Q1", "P856", "https://example.org/x", "ok1"),
        ],
    )
    assert ("wd:Q1", "wdt:P856", '"https://example.org/x"^^xsd:string') in got
    assert not any("bad1" in s or "bad1" in o for s, _, o in got)
    assert not any(p == "pq:P582" for _, p, _ in got)


def test_bad_chars_replaced_in_ids(spark):
    got = _triples(spark, [("Q1", "P1629", "Q2:b c", "id (1)")])
    assert ("wd:Q1", "wdt:P1629", "wd:Q2_b_c") in got
    assert ("wd:Q1", "p:P1629", "wds:Q1-id__1_") in got


def test_prefix_header():
    hdr = serialize_prefixes()
    assert "@prefix wd: <http://www.wikidata.org/entity/> ." in hdr
    assert "@prefix wikibase: <http://wikiba.se/ontology#> ." in hdr
