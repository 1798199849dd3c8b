"""Tests for the coverage-closing operators: unreify-values,
validate-properties, text-embedding (stub), wikidata export."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from kgtk_spark.graph.embedding import build_sentences, text_embedding
from kgtk_spark.operators.unreify import unreify_values
from kgtk_spark.operators.validate_properties import PropertyPattern, validate_properties
from kgtk_spark.sources.wikidata_export import export_wikidata_json


def test_unreify_values(spark):
    edges = spark.createDataFrame(
        [
            ("Q1", "P39", "V1"),                # edge pointing at value node
            ("V1", "rdf:type", "wikibase:TimeValue"),
            ("V1", "value", "^1999"),
            ("V1", "P585", "^2000"),            # qualifier on the value node
            ("Q2", "P31", "Q5"),                # untouched
        ],
        ["node1", "label", "node2"],
    )
    out = unreify_values(
        edges, trigger_label="rdf:type", trigger_node2="wikibase:TimeValue",
        value_label="value",
    ).collect()
    rows = {(r["node1"], r["label"], r["node2"]) for r in out}
    assert ("Q1", "P39", "^1999") in rows
    assert ("Q1-P39-^1999", "P585", "^2000") in rows
    assert ("Q2", "P31", "Q5") in rows
    assert not any(r["node1"] == "V1" or r["node2"] == "V1" for r in out)
    assert len(rows) == 3


def test_validate_properties(spark):
    edges = spark.createDataFrame(
        [
            ("Q1", "P2044", "8848"),      # ok: number in range
            ("Q2", "P2044", "999999"),    # too big
            ("Q3", "P2044", '"text"'),    # wrong type
            ("Q4", "P31", "Q5"),          # ok: symbol
            ("Q5", "P31", "42"),          # wrong type for P31
            ("Q6", "other", "anything"),  # no rule → pass
        ],
        ["node1", "label", "node2"],
    )
    patterns = [
        PropertyPattern("P2044", node2_type=["number", "quantity"], minval=-500, maxval=10000),
        PropertyPattern("P31", node2_type=["symbol"]),
    ]
    valid, reject = validate_properties(edges, patterns)
    assert {r["node1"] for r in valid.collect()} == {"Q1", "Q4", "Q6"}
    assert {r["node1"] for r in reject.collect()} == {"Q2", "Q3", "Q5"}


def test_validate_properties_cardinality(spark):
    edges = spark.createDataFrame(
        [("Q1", "P18", "a.jpg"), ("Q1", "P18", "b.jpg"), ("Q2", "P18", "c.jpg")],
        ["node1", "label", "node2"],
    )
    valid, reject = validate_properties(edges, [PropertyPattern("P18", maxdistinct=1)])
    assert {r["node1"] for r in valid.collect()} == {"Q2"}
    assert {r["node1"] for r in reject.collect()} == {"Q1"}


def test_validate_properties_patterns_and_reasons(spark):
    edges = spark.createDataFrame(
        [
            ("Q1", "P856", "http://example.org"),   # ok
            ("X9", "P856", "http://example.org"),   # node1_pattern fails
            ("Q2", "P856", "ftp://example.org"),    # node2_pattern fails
        ],
        ["node1", "label", "node2"],
    )
    patterns = [
        PropertyPattern("P856", node1_pattern=r"^Q\d+$", node2_pattern=r"^https?://")
    ]
    valid, reject = validate_properties(edges, patterns)
    assert {r["node1"] for r in valid.collect()} == {"Q1"}
    reasons = {r["node1"]: set(r["reject_reasons"]) for r in reject.collect()}
    assert reasons["X9"] == {"P856:node1_pattern"}
    assert reasons["Q2"] == {"P856:node2_pattern"}


def test_validate_properties_requires_prohibits(spark):
    edges = spark.createDataFrame(
        [
            ("Q1", "P569", "^1950"),  # birth; Q1 also has death → ok
            ("Q1", "P570", "^2000"),
            ("Q2", "P569", "^1950"),  # birth without required death
            ("Q3", "P570", "^2000"),  # death prohibited without birth
        ],
        ["node1", "label", "node2"],
    )
    patterns = [
        PropertyPattern("P569", requires=["P570"]),
        PropertyPattern("P570", prohibits=["P9999"], requires=["P569"]),
    ]
    valid, reject = validate_properties(edges, patterns)
    assert {(r["node1"], r["label"]) for r in valid.collect()} == {
        ("Q1", "P569"),
        ("Q1", "P570"),
    }
    reasons = {(r["node1"], r["label"]): set(r["reject_reasons"]) for r in reject.collect()}
    assert reasons[("Q2", "P569")] == {"P569:requires:P570"}
    assert reasons[("Q3", "P570")] == {"P570:requires:P569"}


def test_validate_properties_occurs_and_dates(spark):
    edges = spark.createDataFrame(
        [
            ("Q1", "P18", "a.jpg"),
            ("Q1", "P18", "b.jpg"),   # maxoccurs=1 violated for Q1
            ("Q2", "P18", "c.jpg"),
            ("Q3", "P569", "^1990-05-01T00:00:00/11"),
            ("Q4", "P569", "^1800-01-01T00:00:00/11"),  # before mindate
        ],
        ["node1", "label", "node2"],
    )
    patterns = [
        PropertyPattern("P18", maxoccurs=1),
        PropertyPattern("P569", mindate="1900-01-01"),
    ]
    valid, reject = validate_properties(edges, patterns)
    assert {r["node1"] for r in valid.collect()} == {"Q2", "Q3"}
    reasons = {r["node1"]: set(r["reject_reasons"]) for r in reject.collect()}
    assert reasons["Q1"] == {"P18:maxoccurs"}
    assert reasons["Q4"] == {"P569:mindate"}


def test_build_sentences_and_embedding(spark):
    edges = spark.createDataFrame(
        [
            ("Q1", "label", '"gold"'),
            ("Q1", "description", '"chemical element"'),
            ("Q1", "P31", "Q11344"),
            ("Q2", "label", '"iron"'),
        ],
        ["node1", "label", "node2"],
    )
    sents = {r["node"]: r["sentence"] for r in build_sentences(edges).collect()}
    assert sents["Q1"] == "gold, chemical element, is a Q11344"
    assert sents["Q2"] == "iron"

    emb = text_embedding(edges, dim=16).collect()
    assert all(len(r["embedding"]) == 16 for r in emb)
    # deterministic: same sentence → same vector
    emb2 = {r["node"]: r["embedding"] for r in text_embedding(edges, dim=16).collect()}
    emb1 = {r["node"]: r["embedding"] for r in emb}
    assert emb1 == emb2


def test_export_wikidata_json(spark):
    edges = spark.createDataFrame(
        [("Q1", "P31", "Q5"), ("Q1", "P31", "Q6"), ("Q1", "P18", "img")],
        ["node1", "label", "node2"],
    )
    out = export_wikidata_json(edges).collect()
    doc = json.loads(out[0]["json"])
    assert doc["id"] == "Q1" and doc["type"] == "item"
    assert doc["claims"]["P31"] == ["Q5", "Q6"]
    assert doc["claims"]["P18"] == ["img"]


def test_text_embedding_hash_kernel_semantics(spark):
    from kgtk_spark.graph.embedding import text_embedding
    import numpy as np

    edges = spark.createDataFrame(
        [
            ("Q1", "label", '"gold"'),
            ("Q1", "description", '"yellow precious metal"'),
            ("Q2", "label", '"silver"'),
            ("Q2", "description", '"grey precious metal"'),
            ("Q3", "label", '"photosynthesis"'),
            ("Q3", "description", '"plant energy process"'),
        ],
        ["node1", "label", "node2"],
    )
    out = {r["node"]: np.array(r["embedding"]) for r in text_embedding(edges, dim=128).collect()}

    def cos(a, b):
        return float(a @ b)  # vectors are L2-normalized

    # shared vocabulary ("precious metal") pulls Q1/Q2 together
    assert cos(out["Q1"], out["Q2"]) > cos(out["Q1"], out["Q3"]) + 0.1
    for v in out.values():
        assert abs(np.linalg.norm(v) - 1.0) < 1e-5
    # deterministic
    again = {r["node"]: np.array(r["embedding"]) for r in text_embedding(edges, dim=128).collect()}
    assert all(np.allclose(out[k], again[k]) for k in out)


def test_validate_properties_field_rules(spark):
    # field_* rules over the parsed node2 fields
    # (propertypatternvalidator.py:1490-1597)
    edges = spark.createDataFrame(
        [
            ("Q1", "P569", "^1990-05-01T00:00:00/11"),  # precision 11 ok
            ("Q2", "P569", "^1990-05-01T00:00:00/9"),   # precision 9 too low
            ("Q3", "P1082", "123[120,130]"),            # tolerance bounds ok
            ("Q4", "P625", "'hi'@en"),                  # language ok
            ("Q5", "P625", "'hi'@zz"),                  # language not allowed
        ],
        ["node1", "label", "node2"],
    )
    patterns = [
        PropertyPattern("P569", field_name=["precision"], field_minval=10),
        PropertyPattern(
            "P1082", field_name=["low_tolerance"], field_minval=100, field_maxval=125
        ),
        PropertyPattern("P625", field_name=["language"], field_values=["en", "fr"]),
    ]
    valid, reject = validate_properties(edges, patterns)
    assert {r["node1"] for r in valid.collect()} == {"Q1", "Q3", "Q4"}
    reasons = {r["node1"]: set(r["reject_reasons"]) for r in reject.collect()}
    assert reasons["Q2"] == {"P569:field:precision:minval"}
    assert reasons["Q5"] == {"P625:field:language:values"}

    # field rules demand field_name
    with pytest.raises(ValueError):
        validate_properties(edges, [PropertyPattern("P569", field_minval=1)])[0].count()
    with pytest.raises(ValueError):
        validate_properties(
            edges, [PropertyPattern("P569", field_name=["nope"], field_minval=1)]
        )[0].count()


def test_validate_properties_id_and_chain_rules(spark):
    edges = spark.createDataFrame(
        [
            ("Q1", "P31", "Q5", "E1"),    # ok; Q5 occurs as node1 below
            ("Q2", "P31", "Q99", "E2"),   # node2_chain: Q99 never a node1
            ("Q5", "P31", "Q1", "e3"),    # id_pattern fails (lowercase)
            ("Q99x", "P17", "Q1", ""),    # id_not_blank fails
        ],
        ["node1", "label", "node2", "id"],
    )
    patterns = [
        PropertyPattern("P31", node2_chain=True, id_pattern=r"^E\d+$"),
        PropertyPattern("P17", id_not_blank=True),
    ]
    valid, reject = validate_properties(edges, patterns)
    assert {r["node1"] for r in valid.collect()} == {"Q1"}
    reasons = {r["node1"]: set(r["reject_reasons"]) for r in reject.collect()}
    assert reasons["Q2"] == {"P31:node2_chain"}
    assert reasons["Q5"] == {"P31:id_pattern"}
    assert reasons["Q99x"] == {"P17:id_not_blank"}


def test_validate_properties_isa_and_switch(spark):
    edges = spark.createDataFrame(
        [
            ("Q1", "P2044", "8848"),    # number in range → ok via isa
            ("Q2", "P2044", "-600"),    # below inherited minval
            ("Q3", "P999", "42"),       # switch: matches numeric case
            ("Q4", "P999", '"txt"'),    # switch: matches string case
            ("Q5", "P999", "^2020"),    # switch: matches neither
        ],
        ["node1", "label", "node2"],
    )
    patterns = [
        PropertyPattern("elevation", datatype=True, minval=-500, maxval=10000),
        PropertyPattern("P2044", node2_type=["number", "quantity"], isa=["elevation"]),
        PropertyPattern("numcase", datatype=True, node2_type=["number"]),
        PropertyPattern(
            "strcase", datatype=True, node2_type=["string"], nextcase="numcase"
        ),
        PropertyPattern("P999", switch=["strcase"]),
    ]
    valid, reject = validate_properties(edges, patterns)
    assert {r["node1"] for r in valid.collect()} == {"Q1", "Q3", "Q4"}
    reasons = {r["node1"]: set(r["reject_reasons"]) for r in reject.collect()}
    # inherited rule is tagged with the owning datatype's name
    assert reasons["Q2"] == {"elevation:minval"}
    assert reasons["Q5"] == {"P999:switch"}

    # isa loops are detected at plan-build time
    loop = [
        PropertyPattern("a", datatype=True, isa=["b"]),
        PropertyPattern("b", datatype=True, isa=["a"]),
        PropertyPattern("P1", isa=["a"]),
    ]
    with pytest.raises(ValueError):
        validate_properties(edges, loop)


def test_validate_properties_mustoccur(spark):
    from kgtk_spark.operators.validate_properties import dataset_violations

    edges = spark.createDataFrame(
        [("Q1", "P31", "Q5"), ("Q2", "P17", "Q30")],
        ["node1", "label", "node2"],
    )
    patterns = [
        PropertyPattern("P31", mustoccur=True),
        PropertyPattern("P569", mustoccur=True),  # absent from the file
        PropertyPattern("P17"),
    ]
    out = dataset_violations(edges, patterns).collect()
    assert [(r["property"], r["rule"]) for r in out] == [("P569", "mustoccur")]
    assert dataset_violations(edges, [PropertyPattern("P31")]).count() == 0


def test_validate_properties_validity_lists_dates_matches_reject(spark):
    edges = spark.createDataFrame(
        [
            ("Q1", "P569", "^1990-05-01T00:00:00/11"),   # after gt-date → ok
            ("Q2", "P569", "^1900-01-01T00:00:00/11"),   # exactly gt bound → fail
            ("Q3", "P999", '"ok"'),                      # valid string
            ("Q4", "P999", '"broken'),                   # invalid value
            ("Q5", "P999", '"a"|"b"'),                   # list not allowed
            ("Q6", "P856", "https://example.org"),       # matches one pattern
            ("Q7", "P856", "gopher://example.org"),      # matches none
            ("Q8", "P9999", "anything"),                 # property rejected
        ],
        ["node1", "label", "node2"],
    )
    patterns = [
        PropertyPattern("P569", greater_than_date="1900-01-01T00:00:00"),
        PropertyPattern("P999", node2_is_valid=True, node2_allow_list=False),
        PropertyPattern("P856", matches=[r"^https?://", r"^ftp://"]),
        PropertyPattern("P9999", reject=True),
    ]
    valid, rej = validate_properties(edges, patterns)
    assert {r["node1"] for r in valid.collect()} == {"Q1", "Q3", "Q6"}
    reasons = {r["node1"]: set(r["reject_reasons"]) for r in rej.collect()}
    assert reasons["Q2"] == {"P569:greater_than_date"}
    assert reasons["Q4"] == {"P999:node2_is_valid"}
    assert reasons["Q5"] == {"P999:node2_allow_list"}
    assert reasons["Q7"] == {"P856:matches"}
    assert reasons["Q8"] == {"P9999:reject"}
