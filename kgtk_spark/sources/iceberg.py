"""Iceberg table sink/source, gated on catalog availability.

The production design (BASELINE.json north_rule) writes every pipeline
stage to an Iceberg table so reruns resume from the last committed
snapshot. This container has no Iceberg runtime jars, so:

- with a configured Iceberg catalog (``spark.sql.catalog.<name>``),
  writes go through ``df.writeTo(...)`` V2 commits and reads through
  ``spark.table`` — snapshot-atomic;
- without one, the SAME call sites fall back to parquet directories +
  the manifest table (kgtk_spark/pipeline/runner.py), which the parquet
  committer makes atomic-per-directory.

The pipeline runner uses write_table/read_table so flipping to Iceberg
is a config change, not a code change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession, catalog: str = "iceberg") -> bool:
    return spark.conf.get(f"spark.sql.catalog.{catalog}", None) is not None


def write_table(
    df: DataFrame,
    identifier: str,
    path_fallback: str,
    catalog: str = "iceberg",
    partition_by: list[str] | None = None,
) -> str:
    """Write to ``catalog.identifier`` if Iceberg is configured, else to
    ``path_fallback`` parquet. Returns the location written."""
    spark = df.sparkSession
    if iceberg_available(spark, catalog):
        writer = df.writeTo(f"{catalog}.{identifier}")
        if partition_by:
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        writer.createOrReplace()
        return f"{catalog}.{identifier}"
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path_fallback)
    return path_fallback


def read_table(
    spark: SparkSession, identifier: str, path_fallback: str, catalog: str = "iceberg"
) -> DataFrame:
    if iceberg_available(spark, catalog):
        return spark.table(f"{catalog}.{identifier}")
    return spark.read.parquet(path_fallback)
