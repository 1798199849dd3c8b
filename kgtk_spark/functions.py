"""SQL function surface — the engine's user-facing UDF registry.

The reference has no user-extensible function surface (SURVEY §2.13);
ours is the value kernel exposed to Spark SQL so any query can call:

    kgtk_data_type(v)  — classify a KGTK literal
    kgtk_valid(v)      — validate it
    kgtk_fields(v)     — full typed field struct
    kgtk_stringify(s)  — raw text → KGTK string
    kgtk_unstringify(v)— KGTK string → raw text
    kgtk_lang_valid(c) — ISO-639 language-code membership

Register once per session with ``register_functions(spark)``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

import pandas as pd
from pyspark.sql.functions import pandas_udf

from kgtk_spark.languages import validate_lang
from kgtk_spark.values import (
    classify_udf,
    is_valid_udf,
    parse_fields_udf,
    stringify_udf,
    unstringify_udf,
)


def _lang_valid_udf():
    # built lazily: pandas_udf needs an active session at creation time
    @pandas_udf("boolean")
    def lang_valid_udf(s: pd.Series) -> pd.Series:
        return s.map(lambda v: validate_lang(v) if v is not None else None)

    return lang_valid_udf


def register_functions(spark: SparkSession) -> None:
    spark.udf.register("kgtk_data_type", classify_udf)
    spark.udf.register("kgtk_valid", is_valid_udf)
    spark.udf.register("kgtk_fields", parse_fields_udf)
    spark.udf.register("kgtk_stringify", stringify_udf)
    spark.udf.register("kgtk_unstringify", unstringify_udf)
    spark.udf.register("kgtk_lang_valid", _lang_valid_udf())
