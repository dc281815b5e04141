"""t1: streaming ingest (Verum minions -> Structured Streaming mapping)."""

from pyspark.sql import functions as F

from engine.datagen import source_files
from engine.streaming import read_edge_store, start_edge_ingest


def test_feed_ingest_and_merge_on_read(spark, tmp_path):
    feed = str(tmp_path / "feed")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    # two feed drops, the second overlaps the first (same repo/path rows)
    src = source_files(spark, 200, 5).cache()
    src.limit(120).write.mode("append").parquet(feed)
    src.write.mode("append").parquet(feed)  # full superset -> duplicates

    q = start_edge_ingest(spark, feed, store, ckpt, available_now=True)
    q.awaitTermination(300)

    merged = read_edge_store(spark, store)
    # merge-on-read dedups on (src_name, dst_name, rel)
    assert (
        merged.groupBy("src_name", "dst_name", "rel").count().filter("count > 1").count()
        == 0
    )
    # the merged store equals the batch derivation over the full corpus
    from engine.derive import derive_structural_edges

    expect = derive_structural_edges(src)
    assert merged.count() == expect.count()
    missing = expect.join(
        merged.select("src_name", "dst_name", "rel"),
        ["src_name", "dst_name", "rel"],
        "left_anti",
    )
    assert missing.count() == 0

    # resuming the stream with no new files adds nothing (checkpointed)
    q2 = start_edge_ingest(spark, feed, store, ckpt, available_now=True)
    q2.awaitTermination(300)
    assert read_edge_store(spark, store).count() == expect.count()
