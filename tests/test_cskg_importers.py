"""CSKG-family importers vs reference row semantics
(kgtk/cli/import_{conceptnet,concept_pairs,atomic,wordnet,framenet,
visualgenome}.py) on hand-checked fixtures."""

from __future__ import annotations

import pyspark.sql.types as T

from kgtk_spark.sources import (
    CSKG_COLUMNS,
    import_atomic,
    import_concept_pairs,
    import_conceptnet,
    import_framenet,
    import_visualgenome,
    import_wordnet,
)


def _by_triple(rows):
    return {(r["node1"], r["relation"], r["node2"]): r for r in rows}


def test_import_conceptnet(spark):
    rows = [
        (
            "/a/[/r/UsedFor/,/c/en/example_node/,/c/en/thing/]",
            "/r/UsedFor",
            "/c/en/example_node",
            "/c/en/thing",
            '{"surfaceText": "An [[example node]] is used for [[thing]]", "weight": 1.0}',
        ),
        (
            "/a/[/r/RelatedTo/,/c/fr/chat/,/c/fr/animal/]",
            "/r/RelatedTo",
            "/c/fr/chat",
            "/c/fr/animal",
            '{"weight": 0.5}',
        ),
    ]
    raw = spark.createDataFrame(
        rows, "assertion string, rel string, subj string, obj string, metadata string"
    )
    out = import_conceptnet(raw)
    assert out.columns == CSKG_COLUMNS
    got = _by_triple(out.collect())
    e = got[("/c/en/example_node", "/r/UsedFor", "/c/en/thing")]
    assert e["node1;label"] == '"example node"'
    assert e["node2;label"] == '"thing"'
    assert e["relation;label"] == '"used for"'
    assert e["source"] == '"CN"'
    assert e["sentence"] == '"An [[example node]] is used for [[thing]]"'
    f = got[("/c/fr/chat", "/r/RelatedTo", "/c/fr/animal")]
    assert f["sentence"] == ""  # no surfaceText
    assert f["relation;label"] == '"related to"'

    only_en = import_conceptnet(raw, english_only=True)
    assert only_en.count() == 1


def test_import_concept_pairs(spark):
    raw = spark.createDataFrame(
        [("cn_example", "cn_other")], "w1 string, w2 string"
    )
    out = import_concept_pairs(raw, relation="/r/RelatedTo", source="CP").collect()
    assert len(out) == 1
    e = out[0]
    assert e["node1"] == "cp:cn_example"
    assert e["node2"] == "cp:cn_other"
    assert e["node1;label"] == '"example"'  # strips the 3-char prefix
    assert e["relation;label"] == '"related to"'
    assert e["source"] == '"CP"'


def test_import_atomic(spark):
    raw = spark.createDataFrame(
        [
            (
                "PersonX buys a coffee.",
                '["generous", "none"]',
                '["to drink it"]',
            )
        ],
        "event string, xAttr string, xWant string",
    )
    out = import_atomic(raw)
    got = _by_triple(out.collect())
    a = got[("at:personx_buys_a_coffee", "at:xAttr", "at:generous")]
    # e1 keeps the mention, e2 drops it → piped double label
    assert a["node1;label"] == '"personx buys a coffee"|"buys a coffee"'
    assert a["node2;label"] == '"generous"'
    assert a["relation;label"] == '"person x has attribute"'
    assert a["source"] == '"AT"'
    w = got[("at:personx_buys_a_coffee", "at:xWant", "at:to_drink_it")]
    assert w["relation;label"] == '"person x wants"'
    # 'none' values are dropped
    assert len(got) == 2


def test_import_wordnet(spark):
    schema = T.StructType(
        [
            T.StructField("name", T.StringType()),
            T.StructField("lemmas", T.ArrayType(T.StringType())),
            T.StructField("hypernyms", T.ArrayType(T.StringType())),
            T.StructField("member_holonyms", T.ArrayType(T.StringType())),
            T.StructField("part_holonyms", T.ArrayType(T.StringType())),
            T.StructField("substance_meronyms", T.ArrayType(T.StringType())),
        ]
    )
    rows = [
        ("dog.n.01", ["dog", "domestic_dog"], ["canine.n.02"], ["pack.n.06"], [], []),
        ("canine.n.02", ["canine"], [], [], [], []),
        ("pack.n.06", ["pack"], [], [], [], []),
        ("water.n.01", ["water"], [], [], [], ["hydrogen.n.01"]),
        ("hydrogen.n.01", ["hydrogen", "H"], [], [], [], []),
    ]
    out = import_wordnet(spark.createDataFrame(rows, schema))
    got = _by_triple(out.collect())
    isa = got[("wn:dog.n.01", "/r/IsA", "wn:canine.n.02")]
    assert isa["node1;label"] == '"dog"|"domestic dog"'
    assert isa["node2;label"] == '"canine"'
    assert isa["relation;label"] == '"is a"'
    assert isa["source"] == '"WN"'
    member = got[("wn:dog.n.01", "/r/PartOf", "wn:pack.n.06")]
    assert member["relation;label"] == '"is a part of"'
    made = got[("wn:water.n.01", "/r/MadeOf", "wn:hydrogen.n.01")]
    assert made["node2;label"] == '"hydrogen"|"H"'
    assert len(got) == 3


def test_import_framenet(spark):
    fr = spark.createDataFrame(
        [("Event", "Getting", "Inheritance"), ("Giving", "Getting", "See also")],
        "super_frame string, sub_frame string, type string",
    )
    lus = spark.createDataFrame(
        [("Getting", "acquire.v")], "frame string, lu string"
    )
    fes = spark.createDataFrame(
        [("Getting", "Recipient", "Sentient", "Entity", "Animate being", None, None)],
        "frame string, fe string, sem_type string, sem_root string, "
        "sem_super string, requires_fe string, excludes_fe string",
    )
    got = _by_triple(import_framenet(fr, lus, fes).collect())
    inh = got[("fn:event", "fn:IsInheritedBy", "fn:getting")]
    assert inh["relation;label"] == '"is inherited by"'
    assert inh["node1;label"] == '"event"'
    assert ("fn:getting", "fn:InheritsFrom", "fn:event") in got
    # 'See also' maps to the single SeeAlso edge (no reverse)
    assert ("fn:giving", "fn:SeeAlso", "fn:getting") in got
    assert ("fn:getting", "fn:SeeAlso", "fn:giving") not in got
    lu = got[("fn:getting", "fn:HasLexicalUnit", "fn:lu:getting:acquire")]
    assert lu["node2;label"] == '"acquire"'
    assert lu["relation;label"] == '"has lexical unit"'
    sem = got[("fn:fe:recipient", "fn:HasSemType", "fn:st:sentient")]
    assert sem["source"] == '"FN"'
    assert ("fn:st:sentient", "fn:st:RootType", "fn:st:entity") in got
    assert ("fn:st:sentient", "fn:st:SuperType", "fn:st:animate_being") in got
    assert ("fn:getting", "fn:HasFrameElement", "fn:fe:recipient") in got


def test_import_visualgenome(spark):
    obj_t = T.StructType(
        [
            T.StructField("object_id", T.LongType()),
            T.StructField("names", T.ArrayType(T.StringType())),
            T.StructField("synsets", T.ArrayType(T.StringType())),
            T.StructField("attributes", T.ArrayType(T.StringType())),
        ]
    )
    rel_t = T.StructType(
        [
            T.StructField("predicate", T.StringType()),
            T.StructField("subject_id", T.LongType()),
            T.StructField("object_id", T.LongType()),
        ]
    )
    schema = T.StructType(
        [
            T.StructField("image_id", T.LongType()),
            T.StructField("objects", T.ArrayType(obj_t)),
            T.StructField("relationships", T.ArrayType(rel_t)),
        ]
    )
    scene = spark.createDataFrame(
        [
            (
                1,
                [
                    (1, ["Dog."], ["dog.n.01"], ["running", "brown"]),
                    (2, ["grass"], ["grass.n.01"], None),
                ],
                [("ON.", 1, 2), ("ON.", 1, 2)],  # dup relationship, deduped
            )
        ],
        schema,
    )
    attr_syn = spark.createDataFrame(
        [("running", "run.v.01"), ("brown", "brown.a.01"), ("tall", "tall.a.01")],
        "attr string, synset string",
    )
    got = _by_triple(import_visualgenome(scene, attr_syn).collect())
    cap = got[("wn:dog.n.01", "/r/CapableOf", "wn:run.v.01")]
    assert cap["node1;label"] == '"dog"'  # 'Dog.' cleaned
    assert cap["node2;label"] == '"running"'
    assert cap["relation;label"] == '"capable of"'
    prop = got[("wn:dog.n.01", "mw:MayHaveProperty", "wn:brown.a.01")]
    assert prop["relation;label"] == '"may have property"'
    near = got[("wn:dog.n.01", "/r/LocatedNear", "wn:grass.n.01")]
    assert near["relation;label"] == '"on"'
    assert near["node2;label"] == '"grass"'
    assert near["source"] == '"VG"'
    assert len(got) == 3


def test_stringify_col_matches_python_stringify(spark):
    """The JVM escape chain (cskg.stringify_col) and the Python value
    kernel (values.stringify) implement the same translate table —
    pin them equal over adversarial inputs."""
    from kgtk_spark.sources.cskg import stringify_col
    from kgtk_spark.values import stringify
    from pyspark.sql import functions as F

    samples = [
        "plain",
        'quo"te',
        "single'quote",
        "back\\slash",
        "pipe|sep",
        "tab\there",
        "new\nline",
        "cr\rreturn",
        "bell\x07",
        "bs\x08",
        "ff\x0c",
        "vt\x0b",
        'mix\\"\'|\t\n\\\\end',
        "",
        "\\",
        "||",
        '"""',
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)], "i long, s string")
    got = {
        r["i"]: r["out"]
        for r in df.select("i", stringify_col(F.col("s")).alias("out")).collect()
    }
    for i, s in enumerate(samples):
        assert got[i] == stringify(s), (s, got[i], stringify(s))
