"""sessionize / session_stats (engine/relational.py) vs a DuckDB mirror —
the same lag + running-sum formulation in ANSI SQL, value-for-value — plus
boundary semantics (ties at exactly the gap stay in-session)."""

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F

from engine.relational import session_stats, sessionize

SCHEMA = "user_id long, ts timestamp, event_type string"


def _t(minute, second=0):
    return dt.datetime(2026, 1, 1, 12, minute, second)


ROWS = [
    # user 1: two sessions split by a 31-min gap
    (1, _t(0), "a"), (1, _t(5), "b"), (1, _t(36), "c"), (1, _t(40), "d"),
    # user 2: one session, including a tie at EXACTLY the gap (stays)
    (2, _t(0), "a"), (2, _t(30), "b"),
    # user 3: single event
    (3, _t(59), "z"),
]


@pytest.fixture(scope="module")
def events(spark):
    df = spark.createDataFrame(ROWS, SCHEMA).cache()
    df.count()
    return df


def test_sessionize_boundaries(events):
    out = sessionize(events, by=["user_id"], gap_seconds=1800.0)
    got = {
        (r.user_id, r.ts.minute): r.session_id for r in out.collect()
    }
    assert got[(1, 0)] == "1#1" and got[(1, 5)] == "1#1"
    assert got[(1, 36)] == "1#2" and got[(1, 40)] == "1#2"
    # 30 min == gap exactly -> same session (<= semantics)
    assert got[(2, 0)] == "2#1" and got[(2, 30)] == "2#1"
    assert got[(3, 59)] == "3#1"


def test_session_stats_values(events):
    got = {
        (r.user_id, r.session_id): (r.n_events, r.duration_s)
        for r in session_stats(events, by=["user_id"], gap_seconds=1800.0).collect()
    }
    assert got[(1, "1#1")] == (2, 300.0)
    assert got[(1, "1#2")] == (2, 240.0)
    assert got[(2, "2#1")] == (2, 1800.0)
    assert got[(3, "3#1")] == (1, 0.0)


def test_sessionize_duckdb_mirror(spark):
    """Random-ish (deterministic) event stream: the full session assignment
    must match the identical lag+running-sum SQL in DuckDB."""
    rows = []
    for u in range(20):
        t = dt.datetime(2026, 1, 1, 0, 0, 0)
        for i in range(50):
            # deterministic pseudo-gaps: 1..3599 s, occasionally > gap
            step = ((u * 7919 + i * 104729) % 3600) + 1
            t = t + dt.timedelta(seconds=step)
            rows.append((u, t, "e"))
    df = spark.createDataFrame(rows, SCHEMA)
    got = sorted(
        (r.user_id, r.ts, r.session_id)
        for r in sessionize(df, by=["user_id"], gap_seconds=1800.0).collect()
    )
    con = duckdb.connect()
    con.register("ev", df.toPandas())
    want = sorted(
        (r[0], r[1], r[2])
        for r in con.execute(
            """
            WITH lagged AS (
                SELECT user_id, ts,
                       CASE WHEN lag(ts) OVER w IS NULL
                            OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                               > 1800000000
                       THEN 1 ELSE 0 END AS is_new
                FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            )
            SELECT user_id, ts,
                   user_id || '#' || CAST(sum(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS VARCHAR) AS sid
            FROM lagged
            """
        ).fetchall()
    )
    assert got == want


def test_sessionize_global_no_by(spark):
    rows = [(1, _t(0), "a"), (2, _t(10), "b"), (3, _t(50), "c")]
    out = sessionize(spark.createDataFrame(rows, SCHEMA), gap_seconds=1800.0)
    got = {r.user_id: r.session_id for r in out.collect()}
    assert got == {1: "1", 2: "1", 3: "2"}
