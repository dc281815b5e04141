"""Delta (frontier-filtered / push-residual) PageRank — fixpoint parity.

The push invariant (value + (I - alpha*G)^-1 resid = v*) is exact for ANY
activation schedule, so the core assertion is fixpoint EQUALITY vs the
dense loop at 1e-9 (VERDICT r3 item 2), not closeness-to-oracle with slack.
Hand graphs run at alpha=0.5 like test_pagerank.py (fast convergence under
the sandbox's ~0.4 s/job floor); one nx-oracle case guards against both
loops sharing a bug.
"""

import numpy as np
import pytest

from engine.algos.pagerank import pagerank, pagerank_delta
from tests.conftest import edges_df, vertices_df
from tests.oracles import nx_digraph, pagerank_oracle

# chain + hub + cycle + dangling + weights: every algebra branch at once
VIDS = list(range(10))
PAIRS = [
    (0, 1, 3.0), (1, 2, 1.0), (2, 0, 2.0),  # weighted cycle
    (3, 0, 1.0), (4, 0, 1.0), (5, 0, 1.0),  # hub fan-in
    (5, 6, 1.0), (6, 7, 1.0),               # chain into dangling 7
    (8, 8, 1.0),                            # self-loop
    # 9 isolated (dangling, no in-edges)
]


def _ranks(res):
    return {r.vid: r.value for r in res.ranks.collect()}


def _assert_same(a: dict, b: dict, atol=1e-9):
    assert set(a) == set(b)
    ks = sorted(a)
    x = np.array([a[k] for k in ks])
    y = np.array([b[k] for k in ks])
    assert np.allclose(x, y, atol=atol), f"max diff {np.abs(x - y).max()}"


def test_same_fixpoint_as_dense(spark):
    v = vertices_df(spark, VIDS)
    e = edges_df(spark, PAIRS)
    dense = pagerank(spark, e, vertices=v, alpha=0.5, tol=1e-12, max_iter=300)
    delta = pagerank_delta(
        spark, e, vertices=v, alpha=0.5, tol=1e-10, max_iter=600
    )
    assert dense.converged and delta.converged
    _assert_same(_ranks(dense), _ranks(delta))
    # and against the reference scorer
    g = nx_digraph(VIDS, PAIRS)
    ref = pagerank_oracle(g, alpha=0.5)
    got = _ranks(delta)
    ks = sorted(got)
    assert np.allclose(
        np.array([got[k] for k in ks]), np.array([ref[k] for k in ks]), atol=1e-6
    )


def test_personalized_same_fixpoint(spark):
    v = vertices_df(spark, VIDS)
    e = edges_df(spark, PAIRS)
    pers = spark.createDataFrame([(0, 1.0), (5, 3.0)], "vid long, mass double")
    dense = pagerank(
        spark, e, vertices=v, alpha=0.5, tol=1e-12, max_iter=300,
        personalization=pers,
    )
    delta = pagerank_delta(
        spark, e, vertices=v, alpha=0.5, tol=1e-10, max_iter=600,
        personalization=pers,
    )
    assert dense.converged and delta.converged
    _assert_same(_ranks(dense), _ranks(delta))


def test_warm_start_converges_in_few_rounds(spark):
    """Warm-started from the converged dense vector, the equation residual
    is ~0 everywhere: the loop must stop almost immediately with almost no
    edges gathered, and at the same fixpoint."""
    v = vertices_df(spark, VIDS)
    e = edges_df(spark, PAIRS)
    dense = pagerank(spark, e, vertices=v, alpha=0.5, tol=1e-12, max_iter=300)
    cold = pagerank_delta(
        spark, e, vertices=v, alpha=0.5, tol=1e-9, max_iter=600
    )
    warm = pagerank_delta(
        spark, e, vertices=v, alpha=0.5, tol=1e-9, max_iter=600,
        initial_ranks=dense.ranks,
    )
    assert warm.converged
    assert warm.iterations <= 3
    assert warm.edges_gathered < cold.edges_gathered / 5
    _assert_same(_ranks(dense), _ranks(warm))


def test_frontier_c_zero_is_dense_equivalent(spark):
    """c=0 activates everything every round — same fixpoint, rounds
    comparable to dense iterations (the schedule degenerates)."""
    v = vertices_df(spark, VIDS)
    e = edges_df(spark, PAIRS)
    dense = pagerank(spark, e, vertices=v, alpha=0.5, tol=1e-12, max_iter=300)
    d0 = pagerank_delta(
        spark, e, vertices=v, alpha=0.5, tol=1e-10, max_iter=600,
        frontier_c=0.0,
    )
    assert d0.converged
    _assert_same(_ranks(dense), _ranks(d0))


def test_metrics_and_gathered_accounting(spark):
    v = vertices_df(spark, VIDS)
    e = edges_df(spark, PAIRS)
    res = pagerank_delta(spark, e, vertices=v, alpha=0.5, tol=1e-9)
    assert res.edges_gathered == sum(m["frontier_edges"] for m in res.metrics)
    assert len(res.metrics) == res.iterations
    # residual mass is monotonically summable evidence of progress
    masses = [m["resid_mass"] for m in res.metrics]
    assert masses[-1] <= masses[0]


def test_invalid_frontier_c(spark):
    e = edges_df(spark, [(0, 1)])
    with pytest.raises(ValueError):
        pagerank_delta(spark, e, frontier_c=1.0)
    with pytest.raises(ValueError):
        pagerank_delta(spark, e, frontier_c=-0.1)


def test_adaptive_tail_same_fixpoint(spark):
    """The adaptive tail schedule (c drops to tail_c once the frontier is
    small — VERDICT r4 item 4) is pure scheduling: the push invariant is
    activation-independent, so the fixpoint must equal the dense loop's
    and the pinned-c run's exactly, while taking no MORE rounds than the
    pinned-c schedule."""
    v = vertices_df(spark, VIDS)
    e = edges_df(spark, PAIRS)
    dense = pagerank(spark, e, vertices=v, alpha=0.5, tol=1e-12, max_iter=300)
    pinned = pagerank_delta(
        spark, e, vertices=v, alpha=0.5, tol=1e-10, max_iter=600,
        tail_c=None,
    )
    adaptive = pagerank_delta(
        spark, e, vertices=v, alpha=0.5, tol=1e-10, max_iter=600,
        tail_c=0.0, tail_trigger_frac=10.0,  # force tail mode from round 2
    )
    assert pinned.converged and adaptive.converged
    _assert_same(_ranks(dense), _ranks(adaptive))
    _assert_same(_ranks(pinned), _ranks(adaptive))
    assert adaptive.iterations <= pinned.iterations
    # the schedule switch is recorded per round
    assert adaptive.metrics[0]["c"] == 0.8  # round 1 has no frontier signal
    assert all(m["c"] == 0.0 for m in adaptive.metrics[1:])
    # accounting still balances under the adaptive schedule
    assert adaptive.edges_gathered == sum(
        m["frontier_edges"] for m in adaptive.metrics
    )
    assert len(adaptive.metrics) == adaptive.iterations


def test_adaptive_tail_personalized_and_warm(spark):
    """tail_c composes with personalization and warm starts."""
    v = vertices_df(spark, VIDS)
    e = edges_df(spark, PAIRS)
    pers = spark.createDataFrame([(0, 1.0), (5, 3.0)], "vid long, mass double")
    dense = pagerank(
        spark, e, vertices=v, alpha=0.5, tol=1e-12, max_iter=300,
        personalization=pers,
    )
    adaptive = pagerank_delta(
        spark, e, vertices=v, alpha=0.5, tol=1e-10, max_iter=600,
        personalization=pers, tail_c=0.2, tail_trigger_frac=10.0,
    )
    assert adaptive.converged
    _assert_same(_ranks(dense), _ranks(adaptive))
    warm = pagerank_delta(
        spark, e, vertices=v, alpha=0.5, tol=1e-10, max_iter=600,
        personalization=pers, initial_ranks=dense.ranks,
        tail_c=0.2, tail_trigger_frac=10.0,
    )
    assert warm.converged
    _assert_same(_ranks(dense), _ranks(warm))


def test_invalid_tail_c(spark):
    e = edges_df(spark, [(0, 1)])
    with pytest.raises(ValueError):
        pagerank_delta(spark, e, tail_c=1.0)
    with pytest.raises(ValueError):
        pagerank_delta(spark, e, tail_c=-0.5)
