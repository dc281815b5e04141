"""Node embeddings from the walk corpus — the DeepWalk recipe end to end.

Perozzi, Al-Rfou, Skiena 2014 ("DeepWalk: online learning of social
representations" — public knowledge): treat truncated random walks as
sentences and train skip-gram word vectors over them; node2vec (Grover &
Leskovec 2016) is the same recipe over the biased walks. Both walk
generators already exist set-oriented (engine/algos/walks.py — hash-
derived, bit-deterministic); this module closes the loop with Spark
MLlib's distributed skip-gram (``pyspark.ml.feature.Word2Vec``, JVM-side,
hierarchical softmax — public Spark API) and hands the resulting vectors
straight to the ANN operators (engine/similarity.py), so
"walks -> embeddings -> nearest neighbors" is one pipeline with no
driver-side detour.

Scale honesty (documented constraint, not a silent cap): MLlib's Word2Vec
broadcasts the full model — vocabulary * vectorSize floats * 2 (syn0 +
syn1) — to every executor each iteration and averages partition-local
updates. That is the right architecture up to vocabularies of ~10^7
vertices at dim 128 (~10 GiB model); at the 10^9-vertex extreme the
skip-gram model itself is a parameter-server problem no stock Spark
operator solves, and the supported path is training per community /
per hash-bucket subgraph (engine/algos/louvain.py labels -> one model per
partition of the vertex set) or downsampling the walk corpus to the
vertices of interest. ``train_node_embeddings`` raises above
``max_vocab`` instead of silently thrashing executor memory.

Determinism: with ``num_partitions=1`` MLlib's skip-gram is deterministic
for a fixed seed (single training partition, fixed walk corpus — the
tests rely on this); multi-partition training trades bit-reproducibility
for throughput exactly like the upstream API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.ml.feature import Word2Vec
from pyspark.ml.functions import vector_to_array

from engine import similarity as _sim


def walks_to_sentences(walks: DataFrame) -> DataFrame:
    """(sentence: array<string>) — stringify walk paths for skip-gram.

    Input is the (walk_id, path array<long>) corpus of
    engine.algos.walks.random_walks / node2vec_walks; Word2Vec tokens are
    strings, so vids are rendered base-10 (reversed exactly in
    ``train_node_embeddings``)."""
    return walks.select(
        F.transform("path", lambda v: v.cast("string")).alias("sentence")
    )


def train_node_embeddings(
    spark: SparkSession,
    walks: DataFrame,
    dim: int = 64,
    window: int = 5,
    min_count: int = 0,
    max_iter: int = 1,
    num_partitions: int = 1,
    seed: int = 42,
    max_vocab: int = 10_000_000,
) -> DataFrame:
    """(vid: long, embedding: array<float>) — DeepWalk vectors.

    One skip-gram model over the whole walk corpus. ``max_vocab`` is the
    fail-loudly guard on the broadcast-model architecture described in the
    module docstring: the distinct-vertex count is measured first (one
    cheap aggregate over the walk corpus) and training refuses to start
    when the model would not fit the broadcast budget — partition the
    graph (per-community training) instead of letting executors thrash.
    """
    n_vocab = (
        walks.select(F.explode("path").alias("vid")).agg(
            F.approx_count_distinct("vid").alias("n")
        ).collect()[0].n
    )
    if n_vocab > max_vocab:
        raise ValueError(
            f"train_node_embeddings: ~{n_vocab} distinct vertices exceeds "
            f"max_vocab={max_vocab}; MLlib Word2Vec broadcasts the full "
            f"model per iteration — train per community/bucket instead "
            f"(see module docstring) or raise max_vocab deliberately"
        )
    w2v = Word2Vec(
        vectorSize=dim,
        windowSize=window,
        minCount=min_count,
        maxIter=max_iter,
        numPartitions=num_partitions,
        seed=seed,
        inputCol="sentence",
        outputCol="vec",
    )
    model = w2v.fit(walks_to_sentences(walks))
    return model.getVectors().select(
        F.col("word").cast("long").alias("vid"),
        vector_to_array(F.col("vector")).cast("array<float>").alias("embedding"),
    )


def similar_vertices(
    embeddings: DataFrame,
    query_vids: DataFrame | list[int],
    k: int = 10,
    exact: bool = True,
    **ann_kwargs,
) -> DataFrame:
    """(query_id, rank, neighbor_id, cos) — nearest vertices by embedding.

    The walks->Word2Vec->ANN splice: ``embeddings`` is the output of
    ``train_node_embeddings``; queries are vids whose rows are looked up
    from the same table. ``exact=True`` uses the brute-force scorer
    (small query sets — engine/similarity.cosine_topk broadcasts the
    queries); ``exact=False`` routes to SRP-LSH (srp_topk) for corpus-
    scale query sets, forwarding ``ann_kwargs`` (dim, n_planes, bands,
    bucket_cap, seed)."""
    if isinstance(query_vids, list):
        spark = embeddings.sparkSession
        query_vids = spark.createDataFrame(
            [(int(v),) for v in query_vids], "vid long"
        )
    queries = embeddings.join(query_vids.select("vid"), "vid", "semi")
    fn = _sim.cosine_topk if exact else _sim.srp_topk
    return fn(
        embeddings, queries, k=k, id_col="vid", emb_col="embedding",
        **ann_kwargs,
    )
