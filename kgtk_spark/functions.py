"""SQL function surface — the engine's user-facing UDF registry.

The reference has no user-extensible function surface (SURVEY §2.13);
ours is the value kernel exposed to Spark SQL so any query can call:

    kgtk_data_type(v)  — classify a KGTK literal
    kgtk_valid(v)      — validate it
    kgtk_fields(v)     — full typed field struct
    kgtk_stringify(s)  — raw text → KGTK string
    kgtk_unstringify(v)— KGTK string → raw text

Register once per session with ``register_functions(spark)``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from kgtk_spark.values import (
    classify_udf,
    is_valid_udf,
    parse_fields_udf,
    stringify_udf,
    unstringify_udf,
)


def register_functions(spark: SparkSession) -> None:
    spark.udf.register("kgtk_data_type", classify_udf)
    spark.udf.register("kgtk_valid", is_valid_udf)
    spark.udf.register("kgtk_fields", parse_fields_udf)
    spark.udf.register("kgtk_stringify", stringify_udf)
    spark.udf.register("kgtk_unstringify", unstringify_udf)
