"""Streaming ingestion — the rebuild of Verum's "minions".

The reference's minions are daemon threads polling a feed in a
``while True: fetch; enrich; sleep`` loop ([R minions/*,
verum/__init__.py::app.start_minions — reconstructed, SURVEY.md Table A
N1]). The Spark-native mapping is Structured Streaming: a file source
watches a feed directory for new source-file batches; each micro-batch is
derived into name-space edges and upserted into the persistent edge store
via ``foreachBatch`` (merge-on-read: append + dedup view, the same
MERGE-on-uri semantics as the reference's store_graph, Table A M1).

At production scale the sink is an Iceberg table (``MERGE INTO`` in
foreachBatch); offline it is a Parquet append directory whose reader
deduplicates — both behind ``read_edge_store``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from engine.derive import derive_structural_edges

SOURCE_SCHEMA = "repo string, path string, commit string, lang string, content string"


def feed_stream(spark: SparkSession, feed_dir: str, max_files: int = 16) -> DataFrame:
    """File-source stream over a feed directory of parquet drops."""
    return (
        spark.readStream.schema(SOURCE_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(feed_dir)
    )


def start_edge_ingest(
    spark: SparkSession,
    feed_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously derive structural edges from feed drops and append them
    to the edge store. ``available_now=True`` drains the backlog and stops
    (the testable form); ``False`` keeps polling like a minion daemon.
    """
    stream = feed_stream(spark, feed_dir)

    def upsert(batch: DataFrame, batch_id: int) -> None:
        edges = derive_structural_edges(batch).withColumn(
            "batch_id", F.lit(batch_id)
        )
        edges.write.mode("append").parquet(store_dir)

    writer = stream.writeStream.foreachBatch(upsert).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_edge_store(spark: SparkSession, store_dir: str) -> DataFrame:
    """Merge-on-read view of the streamed edge store: appends deduplicated
    on (src_name, dst_name, rel) keeping the earliest batch (Verum keeps the
    earliest start_time on merge, Table A M1)."""
    raw = spark.read.parquet(store_dir)
    return (
        raw.groupBy("src_name", "dst_name", "rel")
        .agg(F.min("batch_id").alias("first_batch"), F.max("weight").alias("weight"))
        .select("src_name", "dst_name", "rel", "weight", "first_batch")
    )
