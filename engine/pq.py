"""Product quantization — compressed vectors + asymmetric distance for
ANN at the 10^9-vector scale (Jégou, Douze, Schmid 2011, "Product
quantization for nearest neighbor search" — public knowledge; the FAISS
IVF-PQ building block).

Why it exists next to SRP/IVF (engine/similarity.py): those bound the
CANDIDATE volume; PQ bounds the BYTES. 10^9 x 64-dim float32 embeddings
are 256 GB — unjoinable working state — while m=8 one-byte codes are
8 GB, a broadcast-adjacent table. Search never decodes: the query builds
an (m x k) lookup table of sub-distances once, and each corpus vector's
asymmetric distance (ADC) is m table lookups summed.

Spark split, same discipline as the IVF fit (VERDICT r2 item 5):

- **fit_pq** — ONE bounded sample collect, then the shared driver-side
  Lloyd (engine/similarity.lloyd_fit) per subspace. Codebook size is
  m*k*(dim/m) doubles — KBs.
- **pq_encode** — pure codegen: per subspace an array of k literal
  squared distances on the sliced sub-vector, argmin via ``array_min``
  over (dist, code) structs (struct ordering = lowest-code tie-break).
  No UDF, no shuffle.
- **pq_topk** — queries are collected (small-Q contract, same as
  cosine_topk) and their LUTs shipped as literal columns; the corpus
  scan computes ADC as one ``aggregate`` over the code array and a
  per-query window takes the top k. At scale this composes with IVF:
  route queries to cells first, ADC-scan within the probed cells only.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from engine.similarity import lloyd_fit


@dataclass(frozen=True)
class PQCodebook:
    """centroids: (m, k, dim/m) float64. Codes are ints in [0, k)."""

    centroids: np.ndarray
    dim: int
    m: int
    k: int


def fit_pq(
    emb: DataFrame,
    dim: int = 64,
    m: int = 8,
    k: int = 16,
    emb_col: str = "embedding",
    sample_cap: int = 1_000_000,
    iters: int = 10,
    seed: int = 11,
) -> PQCodebook:
    """Per-subspace Lloyd on one bounded sample (subspace j trains with
    seed+j so codebooks differ deterministically)."""
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m} subspaces")
    rows = emb.select(F.col(emb_col).cast("array<double>").alias("v"))
    n_total = rows.count()
    if n_total > sample_cap:
        rows = rows.sample(False, sample_cap / n_total, seed=seed)
    x = np.array(rows.toPandas()["v"].tolist(), dtype=np.float64)
    if x.ndim != 2 or x.shape[1] != dim:
        raise ValueError(f"embeddings are not uniform dim={dim} vectors")
    sub = dim // m
    cents = np.empty((m, k, sub), dtype=np.float64)
    for j in range(m):
        cents[j] = lloyd_fit(x[:, j * sub:(j + 1) * sub], k, iters, seed + j)
    return PQCodebook(centroids=cents, dim=dim, m=m, k=k)


def _sub_sqdist(emb_col, lo: int, cvec) -> F.Column:
    """Squared L2 of the [lo, lo+len) slice vs a literal centroid — the
    same left-associative double fold as similarity._sqdist."""
    lit = F.array(*[F.lit(float(v)) for v in cvec])
    sl = F.slice(F.col(emb_col), lo + 1, len(cvec))
    return F.aggregate(
        F.zip_with(sl, lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_encode(
    emb: DataFrame,
    codebook: PQCodebook,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — nearest sub-centroid per subspace; ties
    break to the lowest code via (dist, code) struct ordering."""
    sub = codebook.dim // codebook.m
    code_cols = []
    for j in range(codebook.m):
        cands = F.array(*[
            F.struct(
                _sub_sqdist(emb_col, j * sub, codebook.centroids[j][c])
                .alias("d"),
                F.lit(c).alias("c"),
            )
            for c in range(codebook.k)
        ])
        code_cols.append(F.array_min(cands)["c"])
    return emb.select(
        F.col(id_col), F.array(*code_cols).alias("codes")
    )


def pq_decode(codes: list[int], codebook: PQCodebook) -> np.ndarray:
    """Driver-side reconstruction of one code vector (tests/diagnostics)."""
    return np.concatenate(
        [codebook.centroids[j][c] for j, c in enumerate(codes)]
    )


def _collect_queries(queries, codebook, id_col, emb_col, op):
    rows = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).cast("array<double>").alias("v"),
    ).collect()
    if not rows:
        raise ValueError(f"{op}: empty query set")
    out = []
    for r in rows:
        q = np.asarray(r.v, dtype=np.float64)
        if q.shape[0] != codebook.dim:
            raise ValueError(
                f"query {r.query_id}: dim {q.shape[0]} != {codebook.dim}"
            )
        out.append((r.query_id, q))
    return out


def _query_luts(spark, qvecs, codebook) -> DataFrame:
    """(query_id, lut array<array<double>>) — per-query sub-distance
    tables, broadcast into the ADC scan."""
    sub = codebook.dim // codebook.m
    lut_rows = []
    for qid, q in qvecs:
        lut = [
            [
                float(((q[j * sub:(j + 1) * sub]
                        - codebook.centroids[j][c]) ** 2).sum())
                for c in range(codebook.k)
            ]
            for j in range(codebook.m)
        ]
        lut_rows.append((qid, lut))
    return spark.createDataFrame(
        lut_rows, "query_id long, lut array<array<double>>"
    )


def _adc(codebook) -> F.Column:
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(codebook.m - 1)),
        F.lit(0.0),
        lambda acc, j: acc + F.element_at(
            F.element_at("lut", j + 1), F.element_at("codes", j + 1) + 1
        ),
    )


def _topk_window(scored, k) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "adc")
    )


def pq_topk(
    codes: DataFrame,
    codebook: PQCodebook,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """(query_id, rank, neighbor_id, adc) — smallest asymmetric distances
    over the WHOLE code table (flat ADC scan). ``codes`` is pq_encode
    output; ``queries`` carries raw vectors (small-Q contract: collected
    to build the LUTs). The query itself is excluded when ids collide,
    matching cosine_topk."""
    qvecs = _collect_queries(queries, codebook, id_col, emb_col, "pq_topk")
    luts = _query_luts(codes.sparkSession, qvecs, codebook)
    scored = (
        codes.select(F.col(id_col).alias("neighbor_id"), "codes")
        .crossJoin(F.broadcast(luts))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", _adc(codebook).alias("adc"))
    )
    return _topk_window(scored, k)


def ivfpq_topk(
    emb: DataFrame,
    queries: DataFrame,
    codebook: PQCodebook,
    coarse_centroids: np.ndarray,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    codes: DataFrame | None = None,
    cells: DataFrame | None = None,
) -> DataFrame:
    """FAISS-style IVFADC: coarse cells bound the CANDIDATE volume, PQ
    codes bound the BYTES — the composition that searches 10^9 vectors.

    Each query routes (driver-side numpy, same small-Q contract) to its
    ``nprobe`` nearest coarse cells; the ADC scan then touches only the
    code rows of the probed cells (one equi-join on cid against the
    cell-keyed index — at scale, the cid is the bucketing/partition key,
    so the probe is a pruned scan). With nprobe == n_centroids the
    result is EXACTLY pq_topk's flat scan (tested).

    ``codes``/``cells``: precomputed pq_encode / ivf_assignments output
    to reuse across query batches (the production pattern — the index is
    built once); both default to computing here."""
    from engine.similarity import ivf_assignments

    if codes is None:
        codes = pq_encode(emb, codebook, id_col, emb_col)
    if cells is None:
        cells = ivf_assignments(
            emb, dim=codebook.dim, id_col=id_col, emb_col=emb_col,
            centroids=coarse_centroids,
        )
    qvecs = _collect_queries(queries, codebook, id_col, emb_col, "ivfpq_topk")
    nprobe = min(nprobe, len(coarse_centroids))
    probe_rows = []
    for qid, q in qvecs:
        d = ((coarse_centroids - q) ** 2).sum(axis=1)
        # lowest-cid tie-break, same discipline as ivf_assignments
        order = np.lexsort((np.arange(len(d)), d))
        probe_rows += [(qid, int(c)) for c in order[:nprobe]]
    spark = codes.sparkSession
    probes = spark.createDataFrame(probe_rows, "query_id long, cid int")
    luts = _query_luts(spark, qvecs, codebook)
    index = codes.withColumnRenamed(id_col, "neighbor_id").join(
        cells.withColumnRenamed("id", "neighbor_id"), "neighbor_id"
    )
    scored = (
        index.join(F.broadcast(probes), "cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .join(F.broadcast(luts), "query_id")
        .select("query_id", "neighbor_id", _adc(codebook).alias("adc"))
    )
    return _topk_window(scored, k)
