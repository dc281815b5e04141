"""Product quantization (engine/pq.py): encode matches a numpy argmin
oracle exactly, ADC matches the numpy lookup-table sum, reconstruction
error shrinks with codebook size, top-k recall on clustered data beats
the random baseline by a wide margin, and the contracts fail loudly."""

from __future__ import annotations

import numpy as np
import pytest

from engine.pq import PQCodebook, fit_pq, pq_decode, pq_encode, pq_topk


def _blobs(n=400, dim=16, n_blobs=8, seed=3):
    rng = np.random.RandomState(seed)
    centers = rng.uniform(-10, 10, size=(n_blobs, dim))
    x = np.vstack([
        centers[i % n_blobs] + rng.normal(0, 0.4, size=dim)
        for i in range(n)
    ])
    return x


def _emb_df(spark, x):
    rows = [(i, [float(v) for v in row]) for i, row in enumerate(x)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.fixture(scope="module")
def fitted(spark):
    x = _blobs()
    emb = _emb_df(spark, x).localCheckpoint(eager=True)
    cb = fit_pq(emb, dim=16, m=4, k=16, iters=10, seed=5)
    codes = pq_encode(emb, cb).localCheckpoint(eager=True)
    return x, emb, cb, codes


def test_encode_matches_numpy_argmin(fitted):
    x, _, cb, codes = fitted
    got = {r.vec_id: list(r.codes) for r in codes.collect()}
    sub = cb.dim // cb.m
    # float32 storage: the engine computes distances on the float-cast
    # vectors, so the oracle must quantize identically
    x32 = x.astype(np.float32).astype(np.float64)
    for i, row in enumerate(x32):
        want = [
            int(np.argmin(((cb.centroids[j]
                            - row[j * sub:(j + 1) * sub]) ** 2).sum(axis=1)))
            for j in range(cb.m)
        ]
        assert got[i] == want, i


def test_adc_matches_numpy_lut(spark, fitted):
    x, emb, cb, codes = fitted
    queries = emb.filter("vec_id < 3")
    out = pq_topk(codes, cb, queries, k=400)
    got = {(r.query_id, r.neighbor_id): r.adc for r in out.collect()}
    sub = cb.dim // cb.m
    x32 = x.astype(np.float32).astype(np.float64)
    code_map = {r.vec_id: list(r.codes) for r in codes.collect()}
    for q in range(3):
        for nb, cs in code_map.items():
            if nb == q:
                assert (q, nb) not in got  # self excluded
                continue
            want = sum(
                ((x32[q][j * sub:(j + 1) * sub]
                  - cb.centroids[j][cs[j]]) ** 2).sum()
                for j in range(cb.m)
            )
            assert got[(q, nb)] == pytest.approx(want, rel=1e-9), (q, nb)


def test_topk_on_blobs_candidate_quality(spark, fitted):
    """PQ is a CANDIDATE generator (FAISS pairs it with exact rerank):
    within a code cell points tie, so exact-NN-in-top-10 is the wrong
    bar. The right bars: ADC separates the blobs (top-10 stays in the
    query's blob), and the true NN survives into a rerank-sized
    candidate set."""
    x, emb, cb, codes = fitted
    n_q = 20
    queries = emb.filter(f"vec_id < {n_q}")
    out10 = pq_topk(codes, cb, queries, k=10)
    blob = {i: i % 8 for i in range(len(x))}
    same = tot = 0
    by_q10: dict[int, list[int]] = {}
    for r in out10.collect():
        by_q10.setdefault(r.query_id, []).append(r.neighbor_id)
        same += blob[r.neighbor_id] == blob[r.query_id]
        tot += 1
    assert same / tot >= 0.9, same / tot  # blobs separate in ADC space
    for q, nbs in by_q10.items():
        assert len(nbs) == 10 and len(set(nbs)) == 10

    out50 = pq_topk(codes, cb, queries, k=50)
    by_q50: dict[int, set[int]] = {}
    for r in out50.collect():
        by_q50.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = 0
    for q in range(n_q):
        d = ((x - x[q]) ** 2).sum(axis=1)
        d[q] = np.inf
        hits += int(np.argmin(d)) in by_q50[q]
    assert hits / n_q >= 0.9, hits / n_q  # candidate recall for rerank


def test_reconstruction_error_shrinks_with_k(spark, fitted):
    x, emb, _, _ = fitted

    def mse(k):
        cb = fit_pq(emb, dim=16, m=4, k=k, iters=10, seed=5)
        cm = {r.vec_id: list(r.codes) for r in pq_encode(emb, cb).collect()}
        x32 = x.astype(np.float32).astype(np.float64)
        return np.mean([
            ((pq_decode(cm[i], cb) - x32[i]) ** 2).sum()
            for i in range(len(x32))
        ])

    assert mse(16) < 0.5 * mse(2)


def test_contracts(spark, fitted):
    _, emb, cb, codes = fitted
    with pytest.raises(ValueError, match="divisible"):
        fit_pq(emb, dim=16, m=5)
    with pytest.raises(ValueError, match="empty query"):
        pq_topk(codes, cb, emb.filter("vec_id < 0"))
    bad_q = emb.sparkSession.createDataFrame(
        [(0, [1.0, 2.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="dim"):
        pq_topk(codes, cb, bad_q)


def test_ivfpq_equals_flat_scan_at_full_probe(spark, fitted):
    from engine.pq import ivfpq_topk
    from engine.similarity import fit_ivf_centroids

    x, emb, cb, codes = fitted
    coarse = fit_ivf_centroids(emb, dim=16, n_centroids=8, iters=8, seed=2)
    queries = emb.filter("vec_id < 8")
    flat = pq_topk(codes, cb, queries, k=10)
    full = ivfpq_topk(
        emb, queries, cb, coarse, k=10, nprobe=8, codes=codes
    )
    a = sorted((r.query_id, r.rank, r.neighbor_id, r.adc) for r in flat.collect())
    b = sorted((r.query_id, r.rank, r.neighbor_id, r.adc) for r in full.collect())
    assert a == b


def test_ivfpq_probe_restricts_candidates(spark, fitted):
    from engine.pq import ivfpq_topk
    from engine.similarity import fit_ivf_centroids, ivf_assignments

    x, emb, cb, codes = fitted
    coarse = fit_ivf_centroids(emb, dim=16, n_centroids=8, iters=8, seed=2)
    cells = ivf_assignments(emb, dim=16, centroids=coarse)
    queries = emb.filter("vec_id < 10")
    out = ivfpq_topk(
        emb, queries, cb, coarse, k=50, nprobe=2, codes=codes, cells=cells
    )
    cell_of = {r.id: r.cid for r in cells.collect()}
    import numpy as np
    allowed = {}
    for r in queries.collect():
        q = np.asarray([float(v) for v in r.embedding], dtype=np.float64)
        d = ((coarse - q) ** 2).sum(axis=1)
        order = np.lexsort((np.arange(len(d)), d))
        allowed[r.vec_id] = set(int(c) for c in order[:2])
    rows = out.collect()
    assert rows, "no candidates survived the probe"
    for r in rows:
        assert cell_of[r.neighbor_id] in allowed[r.query_id], r
    # blob structure still resolved within the probed cells
    blob = {i: i % 8 for i in range(len(x))}
    top1 = {r.query_id: r.neighbor_id for r in rows if r.rank == 1}
    same = sum(blob[q] == blob[n] for q, n in top1.items())
    assert same >= 0.8 * len(top1), (same, len(top1))
