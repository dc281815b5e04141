"""Time-respecting earliest-arrival reachability vs a brute-force Python
label-correction oracle (exact double equality); strict vs non-strict,
durations, per-source t0, horizon pruning, null rejection, convergence."""

from __future__ import annotations

import pytest

from engine.algos.temporal import earliest_arrival, temporal_reachable


def _tedges_df(spark, rows):
    """(src, dst, ts[, dur]) tuples -> DataFrame."""
    full = [
        (int(r[0]), int(r[1]), float(r[2]), float(r[3]) if len(r) > 3 else 0.0)
        for r in rows
    ]
    return spark.createDataFrame(full, "src long, dst long, ts double, dur double")


def _src_df(spark, pairs):
    """[(vid, t0)] or [vid] -> sources DataFrame."""
    if pairs and isinstance(pairs[0], tuple):
        return spark.createDataFrame(
            [(int(v), float(t)) for v, t in pairs], "vid long, t0 double"
        )
    return spark.createDataFrame([(int(v),) for v in pairs], "vid long")


def _oracle(edges, sources, strict=False, dur=False, horizon=None):
    """Brute-force earliest arrival: relax every edge until fixpoint.

    O(V*E) — fine at test scale, and order-independent because arrival
    times only decrease (same argument the distributed loop relies on).
    """
    arr = {}
    for s in sources:
        v, t0 = s if isinstance(s, tuple) else (s, float("-inf"))
        arr[v] = min(arr.get(v, float("inf")), t0)
    changed = True
    while changed:
        changed = False
        for e in edges:
            u, v, ts = e[0], e[1], float(e[2])
            d = float(e[3]) if dur and len(e) > 3 else 0.0
            if u == v or u not in arr:
                continue
            ok = ts > arr[u] if strict else ts >= arr[u]
            if not ok:
                continue
            t_in = ts + d
            if horizon is not None and t_in > horizon:
                continue
            if t_in < arr.get(v, float("inf")):
                arr[v] = t_in
                changed = True
    return arr


def _collect(res):
    return {r.vid: r.t_arr for r in res.arrivals.collect()}


def test_nonstrict_matches_oracle(spark):
    # Diamond with a time-infeasible shortcut: 0->1 at t=5, 1->3 at t=3
    # (unusable), 0->2 at t=1, 2->3 at t=2 (usable).
    rows = [(0, 1, 5.0), (1, 3, 3.0), (0, 2, 1.0), (2, 3, 2.0), (3, 4, 2.0)]
    res = earliest_arrival(spark, _tedges_df(spark, rows), _src_df(spark, [0]))
    assert res.converged
    got = _collect(res)
    want = _oracle(rows, [0])
    assert got == want
    assert got[3] == 2.0 and got[4] == 2.0  # non-strict: equal ts chains


def test_strict_breaks_equal_timestamp_chain(spark):
    rows = [(0, 1, 1.0), (1, 2, 1.0), (1, 3, 2.0)]
    res = earliest_arrival(
        spark, _tedges_df(spark, rows), _src_df(spark, [0]), strict=True
    )
    got = _collect(res)
    want = _oracle(rows, [0], strict=True)
    assert got == want
    assert 2 not in got  # 1->2 at t=1 needs ts > arr(1)=1
    assert got[3] == 2.0


def test_durations_and_t0(spark):
    # dur delays arrival past later edges' timestamps.
    rows = [(0, 1, 1.0, 3.0), (1, 2, 2.0, 0.0), (1, 3, 5.0, 1.0)]
    srcs = [(0, 0.0), (9, 100.0)]
    res = earliest_arrival(
        spark, _tedges_df(spark, rows), _src_df(spark, srcs), dur_col="dur"
    )
    got = _collect(res)
    want = _oracle(rows, srcs, dur=True)
    assert got == want
    assert 2 not in got  # arr(1)=4.0 > ts=2 of 1->2
    assert got[3] == 6.0 and got[9] == 100.0


def test_random_graph_matches_oracle(spark):
    import random

    rng = random.Random(73)
    rows = [
        (rng.randrange(40), rng.randrange(40), float(rng.randrange(20)),
         float(rng.randrange(3)))
        for _ in range(300)
    ]
    for strict in (False, True):
        res = earliest_arrival(
            spark,
            _tedges_df(spark, rows),
            _src_df(spark, [(0, 0.0), (7, 5.0)]),
            dur_col="dur",
            strict=strict,
        )
        assert res.converged
        assert _collect(res) == _oracle(
            rows, [(0, 0.0), (7, 5.0)], strict=strict, dur=True
        )


def test_horizon_prunes(spark):
    rows = [(0, 1, 1.0), (1, 2, 5.0), (2, 3, 9.0)]
    res = earliest_arrival(
        spark, _tedges_df(spark, rows), _src_df(spark, [(0, 0.0)]), horizon=5.0
    )
    got = _collect(res)
    assert got == _oracle(rows, [(0, 0.0)], horizon=5.0)
    assert 3 not in got and got[2] == 5.0


def test_null_timestamp_rejected(spark):
    df = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, None)], "src long, dst long, ts double"
    )
    with pytest.raises(ValueError, match="non-null"):
        earliest_arrival(spark, df, _src_df(spark, [0]))


def test_reachable_raises_on_cap(spark):
    rows = [(i, i + 1, float(i)) for i in range(12)]  # 12-hop chain
    with pytest.raises(RuntimeError, match="not converged"):
        temporal_reachable(
            spark, _tedges_df(spark, rows), _src_df(spark, [(0, 0.0)]),
            max_iter=3,
        )
    got = temporal_reachable(
        spark, _tedges_df(spark, rows), _src_df(spark, [(0, 0.0)])
    )
    assert got.count() == 13


def test_null_t0_rejected(spark):
    edges = _tedges_df(spark, [(0, 1, 1.0)])
    srcs = spark.createDataFrame([(0, None)], "vid long, t0 double")
    with pytest.raises(ValueError, match="t0"):
        earliest_arrival(spark, edges, srcs)
