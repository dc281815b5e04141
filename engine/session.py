"""SparkSession factory — the single place execution config is decided.

Every entry point (tests, bench, ``__spark_entry__``) builds its session
here so the N-vs-4N scaling bench is literally a parameter change
(SURVEY.md §7.1 step 0).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    parallelism: int | None = None,
    app_name: str = "verum-spark",
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for the engine.

    Parameters
    ----------
    parallelism:
        Number of local cores, i.e. ``local[parallelism]``. ``None`` means
        ``local[*]``. On a real cluster the same code ships via
        ``spark-submit --py-files engine.zip`` and ``master`` is simply not
        overridden (see bench/SCALING.md).
    shuffle_partitions:
        Defaults to ``2 * parallelism`` (or 32) — small enough that the
        per-iteration fixed cost stays low at test scale, large enough that
        AQE can coalesce rather than starve. At 100 TB scale this is set to
        O(total-input-bytes / 128MB) instead; AQE coalescing makes the
        over-provisioned value cheap.
    """
    master = f"local[{parallelism}]" if parallelism else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = 2 * parallelism if parallelism else 32
    cores = parallelism or (os.cpu_count() or 16)
    heap = os.environ.get("SPARK_DRIVER_MEM", f"{max(16, 2 * cores)}g")

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Arrow everywhere: pandas UDFs and toPandas go through Arrow batches.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Content strings are fat (up to ~3 KB); keep Arrow batches modest so
        # a batch stays comfortably in the Python worker's memory.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "5000")
        # AQE: runtime partition coalescing + skew-join splitting are the
        # first line of defense for skew; explicit salting (graph.py) covers
        # the groupBy hot keys AQE cannot touch.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        # Iterative DataFrame algorithms re-plan every iteration; keep the
        # UI/retained-stage bookkeeping light.
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # Measured on this (virtualized) host (r1): lazily-committed heap
        # pages turned young GCs into page-fault storms — pre-touched fixed
        # heap fixes that. Measured r2: a 16g heap serving 32 executor
        # threads throttles allocation (3.3 s/iter -> 2.1 s/iter at 10M
        # edges when raised to 64g), so the heap SCALES WITH PARALLELISM:
        # 2 GiB/core, floor 16g — the local-mode analogue of sizing
        # spark.executor.memory per executor core count on a cluster.
        # ParallelGC vs G1 measured equal here; ParallelGC kept.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "SPARK_GC_OPTS",
                f"-XX:+UseParallelGC -Xms{heap} -XX:+AlwaysPreTouch",
            ),
        )
        .config("spark.driver.memory", heap)
        .config("spark.local.dir", os.environ.get("SPARK_LOCAL_DIRS", "/tmp"))
        # Bucketed tables (graph.save_edges_bucketed) need a warehouse;
        # keep it out of the repo tree.
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/verum_spark_warehouse"),
        )
    )
    if extra:
        for k, v in extra.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_all() -> None:
    """Stop the active session if any (used between N-vs-4N bench runs)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
