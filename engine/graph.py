"""Graph tables: schemas, dense vertex ids, CSR-like layout, hubs, salting.

The engine's graph representation is a pair of immutable columnar tables
(SURVEY.md §1.2) — the idiomatic Spark form of the reference's single
in-memory ``networkx.MultiDiGraph`` [R verum/__init__.py, reconstructed]:

    vertices(vid: long, name: string, vtype: string)
    edges(src: long, dst: long, rel: string, weight: double)

``name`` plays the role of Verum's ``uri`` node identity
("class=attribute&key=ip&value=..." [R CAGS node helpers]) as ``vtype:value``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

EDGE_RELS = ("repo_path", "path_lang", "repo_commit", "cooccur")


# Above this many distinct names the window path's single-reducer global
# sort becomes the job's bottleneck task; switch to the range-partitioned
# prefix-sum path (identical output, measured crossover well below this).
SCALABLE_VID_MIN_NAMES = 1_000_000


def assign_vertex_ids(names: DataFrame, scalable: bool | None = None) -> DataFrame:
    """Dense, deterministic ``vid`` in 0..N-1 from a ``name`` column.

    ``vid`` is the global rank of ``name`` in lexicographic order — identical
    at any parallelism. Two physical strategies produce that same output:

    - window path (small N): ``row_number() over (order by name)`` — one
      global sort through a single reducer. Cheapest below ~10^6 names.
    - scalable path (large N): range-partition on name, per-partition counts
      -> driver prefix-sum offsets (P scalars), vid = offset[pid] + local
      row_number. The heaviest task is one range bucket, not the whole
      vertex set — this is what survives 10^9 vertices (VERDICT r1 item 6).
      Output is independent of where the sampled range boundaries fall,
      because global rank is invariant to the partition cut points.

    ``scalable=None`` picks by a cheap count; pass True/False to force.
    """
    distinct = names.select("name").distinct()
    cached = False
    if scalable is None:
        # The dispatch count would otherwise recompute the distinct for the
        # assignment pass — cache it across both.
        distinct = distinct.persist()
        cached = True
        scalable = distinct.count() >= SCALABLE_VID_MIN_NAMES
    if not scalable:
        w = Window.orderBy("name")
        out = distinct.select(
            (F.row_number().over(w) - 1).cast("long").alias("vid"),
            F.col("name"),
            F.split(F.col("name"), ":", 2).getItem(0).alias("vtype"),
        )
        if cached:
            out = out.localCheckpoint(eager=True)
            distinct.unpersist()
        return out
    out = _assign_vertex_ids_scalable(distinct)
    if cached:
        distinct.unpersist()
    return out


def _assign_vertex_ids_scalable(distinct_names: DataFrame) -> DataFrame:
    """Range-partitioned prefix-sum vid assignment (no single-task sort).

    The pid column is frozen by an eager persist before it is consumed by
    two jobs (counts, final select) so range-boundary sampling cannot
    diverge between them.

    The local rank within a range partition comes from
    ``monotonically_increasing_id`` over the in-partition sort — mid is
    pid*2^33 + a per-partition row counter, so (mid - pid*2^33) IS the
    0-based rank of the row in its sorted partition. A window
    ``partitionBy(pid)`` would demand hashpartitioning(pid) and re-shuffle
    every row — rows that are ALREADY physically grouped by pid (guide
    §2.4: the exchange bought nothing; measured 8.4 s -> 4.6 s for the
    whole assignment at V=1.46M, output row-set identical). Determinism:
    rank is read off the frozen persisted layout, same discipline as the
    pid column itself."""
    spark = distinct_names.sparkSession
    P = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = (
        distinct_names.repartitionByRange(P, "name")
        .sortWithinPartitions("name")
        .select(
            "name",
            F.spark_partition_id().alias("pid"),
            F.monotonically_increasing_id().alias("mid"),
        )
        .persist()
    )
    counts = {r["pid"]: r["n"] for r in
              ranged.groupBy("pid").agg(F.count(F.lit(1)).alias("n")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = F.broadcast(
        spark.createDataFrame(
            [(pid, off) for pid, off in offsets.items()], "pid int, off long"
        )
    )
    local_rank = F.col("mid") - F.col("pid").cast("long") * F.lit(1 << 33)
    out = (
        ranged.join(off_df, "pid")
        .select(
            (F.col("off") + local_rank).cast("long").alias("vid"),
            F.col("name"),
            F.split(F.col("name"), ":", 2).getItem(0).alias("vtype"),
        )
        # Materialize (cuts lineage to the pid-sampling) so the ranged cache
        # can be released immediately; otherwise it must stay pinned forever
        # to keep recomputation deterministic.
        .localCheckpoint(eager=True)
    )
    ranged.unpersist()
    return out


def encode_edges(name_edges: DataFrame, vertices: DataFrame) -> DataFrame:
    """Replace string endpoints with dense long vids (two shuffle joins, once
    per derivation — long-key joins are what every iteration then pays for,
    SURVEY.md §4.3.3)."""
    v = vertices.select("vid", "name")
    return (
        name_edges.join(v.withColumnRenamed("vid", "src"), name_edges.src_name == v.name)
        .drop("name", "src_name")
        .join(
            v.withColumnRenamed("vid", "dst").withColumnRenamed("name", "dst_n"),
            F.col("dst_name") == F.col("dst_n"),
        )
        .drop("dst_n", "dst_name")
        .select("src", "dst", "rel", "weight")
    )


def out_degrees(edges: DataFrame) -> DataFrame:
    """Weighted out-degree per source vertex: (vid, out_w, out_deg)."""
    return edges.groupBy(F.col("src").alias("vid")).agg(
        F.sum("weight").alias("out_w"), F.count(F.lit(1)).alias("out_deg")
    )


def in_degrees(edges: DataFrame) -> DataFrame:
    return edges.groupBy(F.col("dst").alias("vid")).agg(
        F.sum("weight").alias("in_w"), F.count(F.lit(1)).alias("in_deg")
    )


def hub_vertices(edges: DataFrame, threshold: int = 10_000) -> DataFrame:
    """Vertices whose in-degree exceeds ``threshold`` — the salting target
    list (popular langs/commits, BASELINE.json north_star). Computed once at
    derivation; tiny (O(#langs + #hot commits)), always broadcastable."""
    return in_degrees(edges).filter(F.col("in_deg") > threshold).select("vid", "in_deg")


def symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected simple view: edges ∪ reversed, self-loops dropped,
    parallel edges collapsed (weights summed). Used by CC/LPA/triangles."""
    fwd = edges.select("src", "dst", "weight")
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    return (
        fwd.unionByName(rev)
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("weight"))
    )


def scoring_projection(edges: DataFrame, reverse_damping: float = 0.5) -> DataFrame:
    """Verum's multigraph->scoring-graph projection (SURVEY.md Table A S1,
    [R plugins/networkx.py digraph projection, reconstructed]): collapse
    parallel edges (sum weights) and add reverse edges at reduced weight so
    relevance also flows against edge direction."""
    collapsed = edges.groupBy("src", "dst").agg(F.sum("weight").alias("weight"))
    rev = collapsed.select(
        F.col("dst").alias("src"),
        F.col("src").alias("dst"),
        (F.col("weight") * reverse_damping).alias("weight"),
    )
    return (
        collapsed.unionByName(rev)
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("weight"))
    )


# ---------------------------------------------------------------- CSR layout


def save_edges_csr(edges: DataFrame, path: str, buckets: int = 32) -> None:
    """Persist edges in the CSR-like layout (BASELINE.json north_star):
    hash-partitioned on src into ``buckets`` directories, each file sorted
    by (src, dst) — src-sorted runs are the columnar analogue of CSR
    adjacency.

    What this layout buys on re-read: Parquet min/max stats on the sorted
    src column give rowgroup skipping for subgraph reads, and directory
    pruning serves single-bucket scans. It does NOT carry hash-partitioning
    metadata into the next session's query plans — ``partitionBy`` writes
    directories, not a bucketed table — so joins over a re-read still
    shuffle the edge side once. For the shuffle-free re-read guarantee use
    :func:`save_edges_bucketed` (ADVICE r1).
    """
    (
        edges.withColumn("src_bucket", F.pmod(F.xxhash64("src"), F.lit(buckets)))
        .repartition(buckets, "src_bucket")
        # src_bucket leads the sort so the dynamic-partition writer's
        # required ordering is already satisfied — otherwise it re-sorts by
        # src_bucket alone (unstably) and destroys the (src, dst) runs.
        .sortWithinPartitions("src_bucket", "src", "dst")
        .write.mode("overwrite")
        .partitionBy("src_bucket")
        .parquet(path)
    )


def load_edges_csr(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).select("src", "dst", "rel", "weight")


def save_edges_bucketed(
    edges: DataFrame, table: str, buckets: int = 32, narrow: bool = True
) -> None:
    """Persist edges as a BUCKETED table: ``bucketBy(src) + sortBy(src,dst)``.

    Unlike the directory layout above, bucket metadata survives in the
    catalog, so a re-read exposes ``HashPartitioning(src, buckets)`` to the
    planner: ``groupBy(src)`` aggregations and equi-joins on src run with
    NO exchange on the edge side — the per-iteration shuffle of a PageRank
    loop then moves only the O(V) rank state, never the O(E) edges. Set
    ``buckets`` equal to the loop's ``spark.sql.shuffle.partitions`` so the
    rank side's hash partitioning lines up with the bucket count.

    ``narrow`` (default on): when every vid fits in int32, src/dst are cast
    to int BEFORE the write. Casting must happen here, at ingest, because a
    cast on top of the bucketed scan would invalidate HashPartitioning(src)
    (Murmur3 hash(int) != hash(long)) and re-introduce the O(E) exchange;
    narrowing at save time gives readers rows a third smaller AND the
    shuffle-free scan (measured 27%/iteration on the bigint layout at 3.4M
    edges). One extra O(E) max() aggregation at ingest pays for it.
    """
    if narrow:
        max_vid = edges.agg(
            F.greatest(F.max("src"), F.max("dst"))
        ).collect()[0][0]
        if max_vid is not None and int(max_vid) < 2**31 - 1:
            edges = edges.withColumn(
                "src", F.col("src").cast("int")
            ).withColumn("dst", F.col("dst").cast("int"))
    (
        # Cluster by the bucket key BEFORE the write: the bucket id is
        # pmod(Murmur3(src), buckets) — the same function repartition
        # uses — so each writer task holds exactly one bucket and emits
        # ONE file. Without it every input partition writes into every
        # bucket: up to partitions x buckets small files, each task
        # sorting all its bucket groups (guide §6: small files hurt the
        # writer AND every subsequent scan). The repartition runs after
        # the narrowing cast so the write-side hash matches the int
        # layout readers see.
        edges.repartition(buckets, "src")
        .write.mode("overwrite")
        .bucketBy(buckets, "src")
        .sortBy("src", "dst")
        .format("parquet")
        .saveAsTable(table)
    )


def load_edges_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table).select("src", "dst", "rel", "weight")


def project_bipartite(
    edges: DataFrame,
    on: str = "src",
    cap: int | None = None,
    log_dropped: bool = True,
) -> DataFrame:
    """(a, b, weight) — the weighted one-mode projection of a bipartite
    edge table onto its ``on`` side: a and b are connected with weight =
    number of shared neighbors on the other side
    (``networkx.bipartite.weighted_projected_graph`` semantics, public).
    Verum's repo<->repo co-occurrence IS this projection specialized to
    (content_hash, repo); this operator exposes the same capped machinery
    (engine/derive.py cooccur_pairs — per-group cap applied BEFORE the
    pair explode, dropped groups counted and logged, never silent) for
    any bipartite relation (user<->item, doc<->term, host<->resource).

    ``cap``: max group size on the other side (default: derive's
    COOCCUR_CAP); a hub neighbor shared by m vertices would otherwise
    explode into m^2/2 pairs.
    """
    from engine.derive import COOCCUR_CAP, cooccur_pairs

    if on not in ("src", "dst"):
        raise ValueError(f"project_bipartite: on must be src|dst, got {on!r}")
    other = "dst" if on == "src" else "src"
    membership = edges.select(
        F.col(other).alias("content_hash"), F.col(on).alias("repo")
    ).distinct()
    return cooccur_pairs(
        membership, cap if cap is not None else COOCCUR_CAP, log_dropped
    )


def save_edges_locality(
    edges: DataFrame, assignment: DataFrame, path: str
) -> None:
    """Persist edges in the LOCALITY layout: directories keyed by the
    balanced-partitioner label of ``src`` (engine/algos/partition.py
    ``partition_graph`` output (vid, part)), files sorted by (src, dst).

    This is the storage half of the Spinner story: hash buckets
    (save_edges_csr / save_edges_bucketed) balance perfectly but scatter
    every neighborhood over all directories; the locality layout puts
    ~(1 - cut/E) of each community's edges in ONE directory, so a
    neighborhood-scoped scan (incident edges of a community, k-hop
    context around a seed whose part is known) reads one partition
    directory instead of all of them — directory-level partition
    pruning the planner applies from a plain ``part = N`` filter.

    Vertices missing from ``assignment`` (isolated at partition time,
    or added since) land in part = -1: visible, queryable, and an
    explicit signal to re-partition rather than a silent drop.
    """
    tagged = edges.join(
        assignment.select(F.col("vid").alias("src"), "part"), "src", "left"
    ).withColumn("part", F.coalesce("part", F.lit(-1)))
    (
        tagged.repartition("part")
        # part leads the sort: the dynamic-partition writer's required
        # ordering is then already satisfied (same trap as save_edges_csr)
        .sortWithinPartitions("part", "src", "dst")
        .write.mode("overwrite")
        .partitionBy("part")
        .parquet(path)
    )


def load_edges_locality(
    spark: SparkSession, path: str, parts: list[int] | None = None
) -> DataFrame:
    """Re-read the locality layout; ``parts`` pushes a partition filter
    (directory pruning) into the scan."""
    df = spark.read.parquet(path)
    if parts is not None:
        df = df.filter(F.col("part").isin([int(p) for p in parts]))
    return df


def degree_histogram(edges: DataFrame) -> DataFrame:
    """(degree, n_vertices) over the undirected simple view — the
    first-look profile of any link graph (how heavy is the tail, where do
    the hubs start). Two aggregates; matches ``networkx.degree_histogram``
    for every non-zero degree (tests/test_graph_layout.py)."""
    und = (
        edges.select(F.least("src", "dst").alias("a"),
                     F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("vid"))
        .unionByName(und.select(F.col("b").alias("vid")))
        .groupBy("vid")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_vertices"))


def degree_assortativity(edges: DataFrame) -> float:
    """Pearson degree-degree correlation over the undirected simple view
    (Newman 2002, "Assortative mixing in networks" — public knowledge):
    do hubs link to hubs (r > 0) or to leaves (r < 0)? Computed as plain
    moment aggregates over the symmetric edge list (each edge contributes
    both orientations, the convention ``networkx.
    degree_assortativity_coefficient`` uses) — one join, one scalar job.
    Returns nan for degree-regular graphs (zero variance), like networkx.
    """
    und = (
        edges.select(F.least("src", "dst").alias("a"),
                     F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("vid"))
        .unionByName(und.select(F.col("b").alias("vid")))
        .groupBy("vid")
        .agg(F.count(F.lit(1)).cast("double").alias("deg"))
    )
    sym = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    paired = (
        sym.join(deg.select(F.col("vid").alias("a"), F.col("deg").alias("dx")), "a")
        .join(deg.select(F.col("vid").alias("b"), F.col("deg").alias("dy")), "b")
    )
    row = paired.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dx").alias("sx"), F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
    ).collect()[0]
    n = float(row["n"])
    if n == 0:
        return float("nan")
    cov = row["sxy"] / n - (row["sx"] / n) * (row["sy"] / n)
    vx = row["sxx"] / n - (row["sx"] / n) ** 2
    vy = row["syy"] / n - (row["sy"] / n) ** 2
    denom = (vx * vy) ** 0.5
    if denom == 0:
        return float("nan")
    return float(cov / denom)


def reciprocity(edges: DataFrame) -> float:
    """Fraction of directed edges whose reverse also exists (Newman et al.
    2002 convention — == ``networkx.reciprocity``): the basic directed-
    graph shape statistic (a link graph of mutual endorsements looks very
    different from a strict hierarchy at the same density). One distinct
    pass + one self-join on the reversed key + two scalar counts.
    Self-loops are excluded (networkx counts a self-loop as reciprocal;
    the derived link graphs here never contain one — documented
    divergence, asserted in tests on loop-free graphs). Returns nan for
    an edgeless graph, like networkx raising on empty."""
    simple = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = simple.count()
    if n == 0:
        simple.unpersist()
        return float("nan")
    mutual = simple.join(
        simple.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        ["src", "dst"],
        "semi",
    ).count()
    simple.unpersist()
    return float(mutual) / float(n)


def graph_density(edges: DataFrame, directed: bool = True) -> float:
    """|E| / (|V|·(|V|-1)) (halved denominator when undirected) over the
    simple loop-free view — == ``networkx.density``. Two scalar jobs."""
    simple = edges.select("src", "dst").filter(
        F.col("src") != F.col("dst")
    )
    if not directed:
        simple = simple.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
    simple = simple.distinct().localCheckpoint(eager=True)
    m = simple.count()
    nv = (
        simple.select(F.col("src").alias("vid"))
        .unionByName(simple.select(F.col("dst").alias("vid")))
        .distinct()
        .count()
    )
    simple.unpersist()
    if nv <= 1:
        return 0.0
    pairs = nv * (nv - 1) if directed else nv * (nv - 1) / 2
    return float(m) / pairs


def powerlaw_alpha(edges: DataFrame, dmin: int = 1) -> dict:
    """MLE power-law exponent of the degree distribution (undirected
    simple view): alpha = 1 + n / Σ ln(d / (dmin - 1/2)) over degrees
    >= dmin — the discrete-MLE approximation of Clauset, Shalizi &
    Newman, SIAM Review 2009, eq. 3.7, with the standard error
    (alpha - 1)/sqrt(n) from eq. 3.6. The one-number answer to "how
    heavy is this tail" next to :func:`degree_histogram`; drives salting
    decisions (engine/diagnostics.py) — alpha < 2.5 means hub degree
    grows superlinearly in graph size and every per-key operator needs
    a skew plan. Two scalar aggregates, nothing collected but moments.

    Returns {alpha, sigma, n_tail, dmin} — n_tail = #vertices with
    degree >= dmin. Raises on an empty tail (no MLE from no data)."""
    if dmin < 1:
        raise ValueError(f"powerlaw_alpha: dmin must be >= 1, got {dmin}")
    und = (
        edges.select(F.least("src", "dst").alias("a"),
                     F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("vid"))
        .unionByName(und.select(F.col("b").alias("vid")))
        .groupBy("vid")
        .agg(F.count(F.lit(1)).cast("double").alias("deg"))
    )
    row = (
        deg.filter(F.col("deg") >= dmin)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.log(F.col("deg") / (dmin - 0.5))).alias("slog"),
        )
        .collect()[0]
    )
    n = int(row["n"] or 0)
    if n == 0:
        raise ValueError(
            f"powerlaw_alpha: no vertices with degree >= dmin={dmin}"
        )
    slog = float(row["slog"])
    if slog <= 0:
        raise ValueError(
            f"powerlaw_alpha: degenerate tail (all degrees == dmin={dmin}"
            f" yield Σlog=0); raise dmin or inspect degree_histogram"
        )
    alpha = 1.0 + n / slog
    return {
        "alpha": alpha,
        "sigma": (alpha - 1.0) / (n ** 0.5),
        "n_tail": n,
        "dmin": dmin,
    }


def rich_club(edges: DataFrame) -> DataFrame:
    """(k, n_nodes, n_edges, phi) rich-club coefficient of the undirected
    simple view for every integer k with at least two richer-than-k nodes:
    phi(k) = 2 E_k / (N_k (N_k - 1)), N_k = #nodes of degree > k, E_k =
    #edges whose min endpoint degree > k (Colizza et al., Nature Physics
    2006; McAuley et al. 2007 — ``networkx.rich_club_coefficient``
    semantics, normalized=False). Do hubs form their own densely wired
    club, or only fan out to the periphery?

    Spark shape — no per-k passes, no peeling loop: one degree groupBy,
    one edge min-degree join, then BOTH step functions fall out of
    suffix sums over the merged degree HISTOGRAM. The histogram has at
    most 2*sqrt(E) rows (distinct degree values d1<d2<... satisfy
    sum(di) <= 2E), so its single-partition window is bounded by the
    input's square root, not its size — same contract as the
    vocabulary window in sampling.weighted_draws. The only output-sized
    step is the final sequence() explode to dense k, which IS the
    answer. Self-loops are dropped by the simple view (networkx raises
    on them instead); vertices appear via their incident edges, which
    matches networkx exactly because degree-0 nodes can never enter
    N_k. phi uses the same integer-product double division as networkx,
    so parity tests need no tolerance."""
    und = (
        edges.select(F.least("src", "dst").alias("a"),
                     F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("vid"))
        .unionByName(und.select(F.col("b").alias("vid")))
        .groupBy("vid")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    hist = deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_v"))
    mdeg = (
        und.join(deg.select(F.col("vid").alias("a"),
                            F.col("degree").alias("da")), "a")
        .join(deg.select(F.col("vid").alias("b"),
                         F.col("degree").alias("db")), "b")
        .select(F.least("da", "db").alias("degree"))
    )
    ehist = mdeg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_e"))
    bp = (
        hist.join(ehist, "degree", "full")
        .select(
            "degree",
            F.coalesce("n_v", F.lit(0)).alias("n_v"),
            F.coalesce("n_e", F.lit(0)).alias("n_e"),
        )
    )
    # Suffix sums (counts at degree >= this breakpoint) + the previous
    # breakpoint: rows k in [prev, degree-1] all see these counts,
    # because N_{>k} / E_{>k} change only at breakpoint degrees.
    w_desc = (
        Window.orderBy(F.desc("degree"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_asc = Window.orderBy("degree")
    steps = bp.select(
        "degree",
        F.sum("n_v").over(w_desc).alias("nodes_ge"),
        F.sum("n_e").over(w_desc).alias("edges_ge"),
        F.coalesce(F.lag("degree").over(w_asc), F.lit(0)).alias("prev"),
    )
    return (
        steps.filter(F.col("nodes_ge") >= 2)
        .select(
            F.explode(
                F.sequence("prev", F.col("degree") - 1)
            ).alias("k"),
            F.col("nodes_ge").alias("n_nodes"),
            F.col("edges_ge").alias("n_edges"),
        )
        .withColumn(
            "phi",
            (F.lit(2) * F.col("n_edges"))
            / (F.col("n_nodes") * (F.col("n_nodes") - F.lit(1))),
        )
    )
