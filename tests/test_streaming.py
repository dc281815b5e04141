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


def test_windowed_counts_with_watermark(spark):
    """Deterministic check of the windowing math (batch mode — watermark is
    a no-op there; streaming-mode state bounding is Spark's contract)."""
    from engine.streaming import windowed_edge_counts

    rows = [
        (0, "click", 0.0), (1, "click", 120.0), (2, "view", 540.0),
        (3, "click", 660.0), (4, "view", 1900.0),
    ]
    ev = spark.createDataFrame(rows, "event_id long, event_type string, t double").select(
        "event_id", "event_type", F.timestamp_seconds("t").alias("ts")
    )
    got = {
        (r.window_start.minute, r.event_type): r.n
        for r in windowed_edge_counts(ev, window="10 minutes").collect()
    }
    assert got == {(0, "click"): 2, (0, "view"): 1, (10, "click"): 1, (30, "view"): 1}


def test_stateful_degree_tracker_accumulates(spark, tmp_path):
    """applyInPandasWithState keyed state survives across micro-batches:
    cumulative degrees after two drops equal the batch groupBy count."""
    from engine.streaming import read_degree_store, start_degree_tracker

    feed = str(tmp_path / "feed2")
    out = str(tmp_path / "deg")
    ckpt = str(tmp_path / "ckpt2")
    src = source_files(spark, 300, 6).cache()
    # deterministic split (limit() is re-evaluation-unstable)
    a = src.filter(F.abs(F.xxhash64("repo", "path")) % 3 == 0)
    b = src
    a.write.mode("append").parquet(feed)
    q = start_degree_tracker(spark, feed, out, ckpt, available_now=True)
    q.awaitTermination(300)
    b.write.mode("append").parquet(feed)
    q = start_degree_tracker(spark, feed, out, ckpt, available_now=True)
    q.awaitTermination(300)

    got = {r.vertex: r.degree for r in read_degree_store(spark, out).collect()}
    want = {
        "repo:" + r.repo: r.n
        for r in a.unionByName(b).groupBy("repo").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want
