"""CSKG-family dataset importers: ConceptNet, concept pairs, ATOMIC,
WordNet, FrameNet, Visual Genome.

All six emit the reference's 9-column commonsense-KG edge layout
(``node1, relation, node2, node1;label, node2;label, relation;label,
relation;dimension, source, sentence``) with KGTK-stringified labels.

Reference semantics (behavior only, re-expressed as Catalyst column
expressions — the reference streams rows through Python string code):
- kgtk/cli/import_conceptnet.py:36-82 (TSV assertions, surfaceText)
- kgtk/cli/import_concept_pairs.py:37-79 (space-separated pairs)
- kgtk/cli/import_atomic.py:36-119 (event CSV, JSON-list columns)
- kgtk/cli/import_wordnet.py:37-133 (synset lemma/hypernym/holonym maps)
- kgtk/cli/import_framenet.py:33-184 (frame relations / LUs / FEs)
- kgtk/cli/import_visualgenome.py:39-144 (scene graphs + attr synsets)

WordNet/FrameNet in the reference pull from nltk corpora (not present
in this container); here the corpus-shaped tables come in as
DataFrames, so the import logic — ID minting, label building, relation
mapping, per-image dedup — is fully implemented and testable while the
corpus download stays the caller's concern. Everything is JVM-side:
no Python UDFs anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

CSKG_COLUMNS = [
    "node1",
    "relation",
    "node2",
    "node1;label",
    "node2;label",
    "relation;label",
    "relation;dimension",
    "source",
    "sentence",
]

# KgtkFormat.stringify escape table (kgtk/kgtkformat.py:65-77), JVM-side.
_STRINGIFY_ESCAPES = [
    ("\\", "\\\\"),
    ('"', '\\"'),
    ("'", "\\'"),
    ("|", "\\|"),
    ("\t", "\\t"),
    ("\n", "\\n"),
    ("\r", "\\r"),
    ("\x07", "\\a"),
    ("\x08", "\\b"),
    ("\x0c", "\\f"),
    ("\x0b", "\\v"),
]


def stringify_col(c: Column) -> Column:
    """KGTK double-quoted string of a column (KgtkFormat.stringify)."""
    for raw, esc in _STRINGIFY_ESCAPES:
        c = F.replace(c, F.lit(raw), F.lit(esc))
    return F.concat(F.lit('"'), c, F.lit('"'))


def split_camel_case_col(c: Column) -> Column:
    """'RelatedTo' → 'related to' (import_conceptnet.py:43-45)."""
    c = F.regexp_replace(c, "([A-Z]+)", " $1")
    c = F.regexp_replace(c, "([A-Z][a-z]+)", " $1")
    return F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))


def _relation_label(rel: Column) -> Column:
    """stringify(split_camel_case(last path segment of the relation))."""
    last = F.element_at(F.split(rel, "/"), -1)
    return stringify_col(split_camel_case_col(last))


def _finish(df: DataFrame) -> DataFrame:
    return df.select(*[F.col(c).alias(c) for c in CSKG_COLUMNS])


# ---------------------------------------------------------------------------
# ConceptNet
# ---------------------------------------------------------------------------

def read_conceptnet_csv(spark: SparkSession, path: str) -> DataFrame:
    """Raw ConceptNet assertion TSV → (assertion, rel, subj, obj, metadata)."""
    return (
        spark.read.csv(path, sep="\t", quote='"')
        .toDF("assertion", "rel", "subj", "obj", "metadata")
    )


def import_conceptnet(raw: DataFrame, english_only: bool = False) -> DataFrame:
    """ConceptNet assertions → CSKG edges (import_conceptnet.py:50-82).

    node labels come from path segment 3 of the concept URI with
    underscores respaced; the sentence is the assertion's surfaceText
    with backslashes removed, when present.
    """
    if english_only:
        raw = raw.filter(
            F.col("subj").startswith("/c/en/") & F.col("obj").startswith("/c/en/")
        )

    def node_label(c: Column) -> Column:
        seg = F.element_at(F.split(F.trim(c), "/"), 4)
        return stringify_col(F.replace(seg, F.lit("_"), F.lit(" ")))

    surface = F.get_json_object("metadata", "$.surfaceText")
    return _finish(
        raw.select(
            F.col("subj").alias("node1"),
            F.col("rel").alias("relation"),
            F.col("obj").alias("node2"),
            node_label(F.col("subj")).alias("node1;label"),
            node_label(F.col("obj")).alias("node2;label"),
            _relation_label(F.col("rel")).alias("relation;label"),
            F.lit("").alias("relation;dimension"),
            F.lit('"CN"').alias("source"),
            F.when(
                surface.isNotNull(),
                stringify_col(F.replace(surface, F.lit("\\"), F.lit(""))),
            )
            .otherwise("")
            .alias("sentence"),
        )
    )


# ---------------------------------------------------------------------------
# Concept pairs
# ---------------------------------------------------------------------------

def import_concept_pairs(
    raw: DataFrame, relation: str = "/r/RelatedTo", source: str = "CN"
) -> DataFrame:
    """Space-separated concept pairs → CSKG edges
    (import_concept_pairs.py:51-79). Node ids get a lowercase source
    prefix; labels strip the 3-character concept prefix."""
    prefix = source.lower() + ":"

    def node_label(c: Column) -> Column:
        return stringify_col(F.substring(c, 4, 2_000_000))

    return _finish(
        raw.select(
            F.concat(F.lit(prefix), F.col("w1")).alias("node1"),
            F.lit(relation).alias("relation"),
            F.concat(F.lit(prefix), F.col("w2")).alias("node2"),
            node_label(F.col("w1")).alias("node1;label"),
            node_label(F.col("w2")).alias("node2;label"),
            _relation_label(F.lit(relation)).alias("relation;label"),
            F.lit("").alias("relation;dimension"),
            stringify_col(F.lit(source)).alias("source"),
            F.lit("").alias("sentence"),
        )
    )


# ---------------------------------------------------------------------------
# ATOMIC
# ---------------------------------------------------------------------------

ATOMIC_RELATION_LABELS = {
    "xAttr": "person x has attribute",
    "oAttr": "others have attribute",
    "xReact": "person x feels",
    "oReact": "others feel",
    "xIntent": "person x wants",
    "xWant": "person x wants",
    "oWant": "others want",
    "xNeed": "person x needs",
    "xEffect": "effect on person x",
    "oEffect": "the effect on others",
}

_PEOPLE_MENTIONS = [
    "personx",
    "persony",
    "person x",
    "person y",
    "the ___",
    "___",
    "'s",
    "to y",
]


def _atomic_base(c: Column) -> Column:
    """e1 of produce_node_labels: pre-tab part, lowercased, trailing
    dots stripped, trimmed (import_atomic.py:57-62)."""
    c = F.element_at(F.split(c, "\t"), 1)
    return F.trim(F.regexp_replace(F.lower(c), r"\.+$", ""))


def _atomic_depersoned(c: Column) -> Column:
    """e2: people mentions removed, whitespace collapsed (:45-64)."""
    for m in _PEOPLE_MENTIONS:
        c = F.trim(F.replace(c, F.lit(m), F.lit("")))
    return F.regexp_replace(c, " {2,}", " ")


def _atomic_label(c: Column) -> Column:
    e1 = _atomic_base(c)
    e2 = _atomic_depersoned(e1)
    return F.when(
        (e1 != e2) & (e2 != ""),
        F.concat(stringify_col(e1), F.lit("|"), stringify_col(e2)),
    ).otherwise(stringify_col(e1))


def _atomic_node(c: Column) -> Column:
    """'at:' + first label text with spaces → underscores (:40-43)."""
    return F.concat(F.lit("at:"), F.replace(_atomic_base(c), F.lit(" "), F.lit("_")))


def import_atomic(raw: DataFrame, relation_cols: list[str] | None = None) -> DataFrame:
    """ATOMIC event table → CSKG edges (import_atomic.py:85-119).

    ``raw`` carries an ``event`` column plus one JSON-encoded
    ``array<string>`` column per relation (xAttr, oWant, ...); 'none'
    values are dropped, event/value labels keep both the raw and the
    de-personed variant when they differ.
    """
    rels = relation_cols or [c for c in raw.columns if c in ATOMIC_RELATION_LABELS]
    stacked = raw.select(
        "event",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("rel"),
                        F.from_json(F.col(c), "array<string>").alias("vals"),
                    )
                    for c in rels
                ]
            )
        ).alias("rv"),
    ).select("event", F.col("rv.rel").alias("rel"), F.explode("rv.vals").alias("val"))
    stacked = stacked.filter(F.col("val") != "none")

    rel_label = F.create_map(
        *[F.lit(x) for kv in ATOMIC_RELATION_LABELS.items() for x in kv]
    )[F.col("rel")]
    return _finish(
        stacked.select(
            _atomic_node(F.col("event")).alias("node1"),
            F.concat(F.lit("at:"), F.col("rel")).alias("relation"),
            _atomic_node(F.col("val")).alias("node2"),
            _atomic_label(F.col("event")).alias("node1;label"),
            _atomic_label(F.col("val")).alias("node2;label"),
            stringify_col(rel_label).alias("relation;label"),
            F.lit("").alias("relation;dimension"),
            F.lit('"AT"').alias("source"),
            F.lit("").alias("sentence"),
        )
    )


# ---------------------------------------------------------------------------
# WordNet
# ---------------------------------------------------------------------------

_WORDNET_RELATIONS = [
    ("hypernyms", "/r/IsA", "is a"),
    ("member_holonyms", "/r/PartOf", "is a part of"),
    ("part_holonyms", "/r/PartOf", "is a part of"),
    ("substance_meronyms", "/r/MadeOf", "is made of"),
]


def import_wordnet(synsets: DataFrame) -> DataFrame:
    """WordNet synset table → CSKG edges (import_wordnet.py:99-133).

    ``synsets``: (name, lemmas array<string>, hypernyms array<string>,
    member_holonyms array<string>, part_holonyms array<string>,
    substance_meronyms array<string>) — the shape get_wn_data() builds
    from nltk. Labels are the |-joined stringified lemmas (underscores
    respaced); both endpoints resolve labels through the synset table
    (broadcast join — the synset dictionary is small relative to any
    edge corpus built on it).
    """
    labels = synsets.select(
        F.col("name").alias("__syn__"),
        F.array_join(
            F.transform(
                "lemmas",
                lambda x: stringify_col(F.replace(x, F.lit("_"), F.lit(" "))),
            ),
            "|",
        ).alias("__label__"),
    )

    parts = []
    for col, rel, rel_label in _WORDNET_RELATIONS:
        if col not in synsets.columns:
            continue
        e = synsets.select(
            F.col("name").alias("n1"), F.explode(col).alias("n2")
        )
        e = (
            e.join(F.broadcast(labels), e["n1"] == labels["__syn__"])
            .select("n1", "n2", F.col("__label__").alias("l1"))
            .join(F.broadcast(labels), F.col("n2") == labels["__syn__"])
            .select("n1", "n2", "l1", F.col("__label__").alias("l2"))
        )
        parts.append(
            e.select(
                F.concat(F.lit("wn:"), "n1").alias("node1"),
                F.lit(rel).alias("relation"),
                F.concat(F.lit("wn:"), "n2").alias("node2"),
                F.col("l1").alias("node1;label"),
                F.col("l2").alias("node2;label"),
                stringify_col(F.lit(rel_label)).alias("relation;label"),
                F.lit("").alias("relation;dimension"),
                F.lit('"WN"').alias("source"),
                F.lit("").alias("sentence"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return _finish(out)


# ---------------------------------------------------------------------------
# FrameNet
# ---------------------------------------------------------------------------

_FRAME_EDGE_PAIRS = {
    "inheritance": ("fn:IsInheritedBy", "fn:InheritsFrom"),
    "using": ("fn:IsUsedBy", "fn:Uses"),
    "subframe": ("fn:HasSubframe", "fn:SubframeOf"),
    "precedes": ("fn:Precedes", "fn:IsPrecededBy"),
    "perspective_on": ("fn:IsPerspectivizedIn", "fn:PerspectiveOn"),
}
_FRAME_EDGE_SINGLE = {
    "is_inchoative_of": "fn:IsInchoativeOf",
    "inchoative_of": "fn:IsInchoativeOf",
    "is_causative_of": "fn:IsCausativeOf",
    "causative_of": "fn:IsCausativeOf",
    "see_also": "fn:SeeAlso",
    "reframing_mapping": "fn:ReframingMapping",
    "metaphor": "fn:Metaphor",
}


def _nosp(c: Column) -> Column:
    """import_framenet.py:111-112: spaces→underscores, pre-dot, lower."""
    return F.lower(
        F.element_at(F.split(F.replace(c, F.lit(" "), F.lit("_")), r"\."), 1)
    )


def _fn_clean(c: Column) -> Column:
    """clean(): last ':' part, '_'→' ', camel-boundary space, lower
    (import_framenet.py:49-51)."""
    c = F.element_at(F.split(c, ":"), -1)
    c = F.replace(c, F.lit("_"), F.lit(" "))
    c = F.regexp_replace(c, "([a-z])([A-Z])", "$1 $2")
    return stringify_col(F.lower(F.trim(c)))


def _fn_edges_to_cskg(edges: DataFrame) -> DataFrame:
    """(node1, relation, node2) → full CSKG layout with clean() labels."""
    return _finish(
        edges.select(
            "node1",
            "relation",
            "node2",
            _fn_clean(F.col("node1")).alias("node1;label"),
            _fn_clean(F.col("node2")).alias("node2;label"),
            _fn_clean(F.col("relation")).alias("relation;label"),
            F.lit("").alias("relation;dimension"),
            F.lit('"FN"').alias("source"),
            F.lit("").alias("sentence"),
        )
    )


def import_framenet(
    frame_relations: DataFrame | None = None,
    lex_units: DataFrame | None = None,
    frame_elements: DataFrame | None = None,
) -> DataFrame:
    """FrameNet tables → CSKG edges (import_framenet.py:65-174).

    - ``frame_relations``: (super_frame, sub_frame, type) — each typed
      relation expands to its directed edge pair (Inheritance →
      IsInheritedBy + InheritsFrom, etc.) or single edge;
    - ``lex_units``: (frame, lu) → fn:HasLexicalUnit with
      ``fn:lu:<frame>:<lu>`` ids;
    - ``frame_elements``: (frame, fe, sem_type, sem_root, sem_super,
      sem_subtypes array, requires_fe, excludes_fe) → HasFrameElement
      plus the semtype/requires/excludes family (nulls skipped).
    """
    spark = (frame_relations or lex_units or frame_elements).sparkSession
    parts: list[DataFrame] = []

    def triple(df, n1, rel, n2):
        parts.append(
            df.select(n1.alias("node1"), F.lit(rel).alias("relation"), n2.alias("node2"))
        )

    if frame_relations is not None:
        fr = frame_relations.select(
            F.concat(F.lit("fn:"), _nosp(F.col("super_frame"))).alias("s"),
            F.concat(F.lit("fn:"), _nosp(F.col("sub_frame"))).alias("o"),
            _nosp(F.col("type")).alias("t"),
        )
        for tname, (fwd, back) in _FRAME_EDGE_PAIRS.items():
            m = fr.filter(F.col("t") == tname)
            triple(m, F.col("s"), fwd, F.col("o"))
            triple(m, F.col("o"), back, F.col("s"))
        for tname, rel in _FRAME_EDGE_SINGLE.items():
            m = fr.filter(F.col("t") == tname)
            triple(m, F.col("s"), rel, F.col("o"))

    if lex_units is not None:
        triple(
            lex_units,
            F.concat(F.lit("fn:"), _nosp(F.col("frame"))),
            "fn:HasLexicalUnit",
            F.concat(
                F.lit("fn:lu:"), _nosp(F.col("frame")), F.lit(":"), _nosp(F.col("lu"))
            ),
        )

    if frame_elements is not None:
        fe = frame_elements
        fe_id = F.concat(F.lit("fn:fe:"), _nosp(F.col("fe")))
        st = lambda c: F.concat(F.lit("fn:st:"), _nosp(c))  # noqa: E731
        has_sem = fe.filter(F.col("sem_type").isNotNull())
        triple(has_sem, fe_id, "fn:HasSemType", st(F.col("sem_type")))
        triple(has_sem, st(F.col("sem_type")), "fn:st:RootType", st(F.col("sem_root")))
        triple(has_sem, st(F.col("sem_type")), "fn:st:SuperType", st(F.col("sem_super")))
        if "sem_subtypes" in fe.columns:
            subs = has_sem.select(
                st(F.col("sem_type")).alias("n1"), F.explode("sem_subtypes").alias("sub")
            )
            triple(subs, F.col("n1"), "fn:st:SubType", st(F.col("sub")))
        if "requires_fe" in fe.columns:
            triple(
                fe.filter(F.col("requires_fe").isNotNull()),
                fe_id,
                "fn:fe:RequiresFE",
                F.concat(F.lit("fn:fe:"), _nosp(F.col("requires_fe"))),
            )
        if "excludes_fe" in fe.columns:
            triple(
                fe.filter(F.col("excludes_fe").isNotNull()),
                fe_id,
                "fn:fe:ExcludesFE",
                F.concat(F.lit("fn:fe:"), _nosp(F.col("excludes_fe"))),
            )
        triple(fe, F.concat(F.lit("fn:"), _nosp(F.col("frame"))), "fn:HasFrameElement", fe_id)

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return _fn_edges_to_cskg(out)


# ---------------------------------------------------------------------------
# Visual Genome
# ---------------------------------------------------------------------------

def read_visualgenome_scene_graphs(spark: SparkSession, path: str) -> DataFrame:
    """Scene-graph JSON (one array of images) → one row per image."""
    return spark.read.json(path, multiLine=True)


def import_visualgenome(scene_graphs: DataFrame, attr_synsets: DataFrame) -> DataFrame:
    """Visual Genome scene graphs → CSKG edges
    (import_visualgenome.py:58-144).

    ``scene_graphs``: (image_id, objects array<struct<object_id, names
    array, synsets array, attributes array>>, relationships
    array<struct<predicate, subject_id, object_id>>).
    ``attr_synsets``: (attr, synset) — the attribute→synset dictionary
    (broadcast; it is a small lexicon).

    Attribute edges: verbs → /r/CapableOf, other non-nouns →
    mw:MayHaveProperty (self-loops dropped); relationship edges →
    /r/LocatedNear labelled with the predicate. Edges are deduplicated
    per image, mirroring the reference's per-image row set.
    """
    objs = scene_graphs.select(
        "image_id", F.explode("objects").alias("o")
    ).select(
        "image_id",
        F.col("o.object_id").alias("object_id"),
        F.col("o.synsets").alias("synsets"),
        F.col("o.names").alias("names"),
        F.col("o.attributes").alias("attributes"),
    )
    # objid2names: stringified cleaned names, empties dropped (:79-85).
    clean_name = lambda x: F.regexp_replace(  # noqa: E731
        F.lower(F.trim(x)), r"\.+$", ""
    )
    objs = objs.withColumn(
        "label",
        F.array_join(
            F.transform(
                F.filter(F.transform("names", clean_name), lambda x: x != ""),
                lambda x: stringify_col(x),
            ),
            "|",
        ),
    )

    attrs = F.broadcast(
        attr_synsets.select(F.col("attr").alias("__attr__"), F.col("synset").alias("asyn"))
    )
    obj_attr = (
        objs.select(
            "image_id", "synsets", "label", F.explode_outer("attributes").alias("attr")
        )
        .withColumn("attr", F.lower("attr"))
        .join(attrs, F.col("attr") == F.col("__attr__"))
        .withColumn("apos", F.element_at(F.split("asyn", r"\."), 2))
        .filter(F.col("apos") != "n")
        .select(
            "image_id",
            "label",
            "attr",
            "asyn",
            F.when(F.col("apos") == "v", F.lit("/r/CapableOf"))
            .otherwise(F.lit("mw:MayHaveProperty"))
            .alias("relation"),
            F.when(F.col("apos") == "v", F.lit('"capable of"'))
            .otherwise(F.lit('"may have property"'))
            .alias("relation;label"),
            F.explode("synsets").alias("osyn"),
        )
        .filter(F.col("osyn") != F.col("asyn"))
        .select(
            "image_id",
            F.concat(F.lit("wn:"), "osyn").alias("node1"),
            "relation",
            F.concat(F.lit("wn:"), "asyn").alias("node2"),
            F.col("label").alias("node1;label"),
            stringify_col(F.col("attr")).alias("node2;label"),
            F.col("relation;label"),
        )
    )

    rels = scene_graphs.select(
        "image_id", F.explode("relationships").alias("r")
    ).select(
        "image_id",
        F.col("r.predicate").alias("predicate"),
        F.col("r.subject_id").alias("subject_id"),
        F.col("r.object_id").alias("object_id"),
    )
    side = objs.select(
        F.col("image_id").alias("__img__"),
        F.col("object_id").alias("__oid__"),
        "synsets",
        "label",
    )
    rel_edges = (
        rels.join(
            side,
            (rels["image_id"] == side["__img__"])
            & (rels["subject_id"] == side["__oid__"]),
        )
        .select(
            "image_id",
            "predicate",
            "object_id",
            F.col("synsets").alias("ssyns"),
            F.col("label").alias("slabel"),
        )
        .join(
            side,
            (F.col("image_id") == side["__img__"])
            & (F.col("object_id") == side["__oid__"]),
        )
        .select(
            "image_id",
            "predicate",
            "ssyns",
            "slabel",
            F.col("synsets").alias("osyns"),
            F.col("label").alias("olabel"),
        )
        .select(
            "image_id",
            "slabel",
            "olabel",
            stringify_col(
                F.regexp_replace(F.trim(F.lower("predicate")), r"^\.+|\.+$", "")
            ).alias("relation;label"),
            F.explode("ssyns").alias("ssyn"),
            "osyns",
        )
        .select(
            "image_id",
            "slabel",
            "olabel",
            "relation;label",
            "ssyn",
            F.explode("osyns").alias("osyn"),
        )
        .filter(F.col("osyn") != F.col("ssyn"))
        .select(
            "image_id",
            F.concat(F.lit("wn:"), "ssyn").alias("node1"),
            F.lit("/r/LocatedNear").alias("relation"),
            F.concat(F.lit("wn:"), "osyn").alias("node2"),
            F.col("slabel").alias("node1;label"),
            F.col("olabel").alias("node2;label"),
            F.col("relation;label"),
        )
    )

    edges = obj_attr.unionByName(rel_edges)
    edges = edges.withColumn("relation;dimension", F.lit(""))
    edges = edges.withColumn("source", F.lit('"VG"')).withColumn("sentence", F.lit(""))
    # The reference dedups the row set within each image (:105,141).
    edges = edges.dropDuplicates(["image_id", *CSKG_COLUMNS])
    return _finish(edges)
