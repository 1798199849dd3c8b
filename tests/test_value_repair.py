"""Value repair flags vs reference option behavior
(kgtk/value/kgtkvalueoptions.py:28-105)."""

from __future__ import annotations

from kgtk_spark.operators import ValueRepairOptions, repair_values


def _run(spark, values, opts):
    df = spark.createDataFrame([(v,) for v in values], "node2 string")
    out = repair_values(df, opts)
    return [r["node2"] for r in out.collect()]


def test_repair_month_or_day_zero(spark):
    opts = ValueRepairOptions(repair_month_or_day_zero=True)
    got = _run(
        spark,
        ["^1990-00-00T00:00:00/11", "^1990-05-00T00:00:00/11", "^1990-05-06", "plain"],
        opts,
    )
    assert got == [
        "^1990-01-01T00:00:00/11",
        "^1990-05-01T00:00:00/11",
        "^1990-05-06",
        "plain",
    ]


def test_end_of_day_rolls_forward(spark):
    opts = ValueRepairOptions(end_of_day_as_next_day=True)
    got = _run(
        spark,
        [
            "^2020-12-31T24:00:00/11",
            "^2020-06-04T12:00:00/11",
            # shape-valid but calendar-invalid: must pass through, not null
            "^2020-02-30T24:00:00/11",
        ],
        opts,
    )
    assert got == [
        "^2021-01-01T00:00:00/11",
        "^2020-06-04T12:00:00/11",
        "^2020-02-30T24:00:00/11",
    ]


def test_clamp_years(spark):
    opts = ValueRepairOptions(clamp_minimum_year=True, clamp_maximum_year=True)
    got = _run(spark, ["^1001-01-01", "^2345-01-01", "^1999-01-01"], opts)
    assert got == ["^1583-01-01", "^2100-01-01", "^1999-01-01"]


def test_clamp_coordinates(spark):
    opts = ValueRepairOptions(
        clamp_minimum_lat=True,
        clamp_maximum_lat=True,
        clamp_minimum_lon=True,
        clamp_maximum_lon=True,
    )
    got = _run(spark, ["@95.0/200.0", "@39.9/116.4"], opts)
    # reference format_degrees is '{:011.6f}' (kgtk/value/kgtkvalue.py:1156)
    assert got == ["@0090.000000/0180.000000", "@39.9/116.4"]


def test_modulo_repair_lon(spark):
    opts = ValueRepairOptions(modulo_repair_lon=True)
    got = _run(spark, ["@10.0/190.0", "@10.0/-190.0"], opts)
    assert got == ["@0010.000000/-170.000000", "@0010.000000/0170.000000"]


def test_lq_string_language_list_validation(spark):
    from kgtk_spark.values import parse_fields

    assert parse_fields("'hello'@en")["valid"]
    assert parse_fields("'hallo'@de-AT")["valid"]
    assert parse_fields("'x'@qx")["valid"] is False  # shape ok, not ISO-639


def test_implode_reject_and_escape(spark):
    from kgtk_spark.operators.reshape import kgtk_implode

    df = spark.createDataFrame(
        [
            ("number", 4.5, None),
            ("string", None, 'say "hi"'),
            ("bogus_type", None, None),
            ("number", None, None),  # missing required field
        ],
        '`node2;kgtk:data_type` string, `node2;kgtk:number` double, `node2;kgtk:text` string',
    )
    good, reject = kgtk_implode(df, with_reject=True, escape_text=True)
    vals = sorted(r["node2"] for r in good.collect())
    assert vals == ['"say \\"hi\\""', "4.5"]
    rej = reject.collect()
    assert len(rej) == 2


def test_connected_components_numbered(spark):
    from kgtk_spark.graph.connected_components import connected_components

    edges = spark.createDataFrame(
        [("a", "e", "b"), ("c", "e", "d"), ("x", "e", "y")],
        "node1 string, label string, node2 string",
    )
    out = connected_components(edges, cluster_name_method="numbered")
    clusters = {r["node2"] for r in out.collect()}
    # NUMBERED is the bare component number (reference :79-81 passes
    # the graph-tool id through); PREFIXED adds CLUS + zfill
    assert clusters == {"0", "1", "2"}
    out = connected_components(edges, cluster_name_method="prefixed")
    clusters = {r["node2"] for r in out.collect()}
    assert clusters == {"CLUS0000", "CLUS0001", "CLUS0002"}
