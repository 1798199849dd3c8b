"""Streaming KG ingest: web pages arrive as files; edges leave as a stream.

Batch/stream parity by construction: the stream pipeline calls the SAME
stage functions (extract_text → extract_triples) per micro-batch via
``foreachBatch``, so a row that flows through the batch pipeline and the
stream produces identical edges. Watermarked windows handle late pages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgtk_spark.pipeline.webgen import PAGES_SCHEMA


def stream_edges_from_pages(
    spark: SparkSession,
    pages_dir: str,
    alias_dict: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """File-source stream of page parquet → KGTK edge parquet.

    Returns the StreamingQuery. ``trigger_once`` processes the backlog
    and stops (test/batch-catchup mode); otherwise micro-batches run
    continuously. Exactly-once via the checkpoint + parquet sink.
    """
    from kgtk_spark.pipeline import stages as S

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(pages_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        text_df = S.extract_text(batch_df)
        triples = S.extract_triples(text_df, alias_dict)
        edges = S.canonicalize(triples)
        (
            edges.dropDuplicates(["node1", "label", "node2"])
            .withColumn("id", F.concat_ws("-", "node1", "label", "node2"))
            .write.mode("append")
            .parquet(output_dir)
        )

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_edge_counts(
    pages_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked event-time windowed page counts by language.

    Late pages beyond the watermark are dropped deterministically;
    output mode append emits finalized windows only.
    """
    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), F.col("lang"))
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_pages",
        )
    )
