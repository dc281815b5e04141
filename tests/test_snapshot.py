"""Snapshot diff vs exact python dict comparison, plus a DuckDB value
mirror of the full-outer classification."""

from __future__ import annotations

import duckdb
import pytest

from engine.snapshot import diff_snapshots, diff_stats

SCHEMA = "k long, a string, b long"
OLD = [(1, "x", 10), (2, "y", 20), (3, "z", 30), (4, "w", 40)]
NEW = [(2, "y", 20), (3, "Z", 30), (4, "w", 41), (5, "v", 50)]
WANT = {1: "removed", 2: "unchanged", 3: "changed", 4: "changed", 5: "added"}


@pytest.fixture(scope="module")
def frames(spark):
    return (
        spark.createDataFrame(OLD, SCHEMA).cache(),
        spark.createDataFrame(NEW, SCHEMA).cache(),
    )


@pytest.mark.parametrize("thin", [True, False])
def test_diff_classification(frames, thin):
    old, new = frames
    got = {
        r.k: r.status
        for r in diff_snapshots(old, new, ["k"], thin=thin).collect()
    }
    assert got == WANT


def test_diff_duckdb_mirror(frames):
    old, new = frames
    got = sorted(
        (r.k, r.status) for r in diff_snapshots(old, new, ["k"]).collect()
    )
    con = duckdb.connect()
    con.register("o", old.toPandas())
    con.register("n", new.toPandas())
    want = con.execute(
        """
        SELECT coalesce(o.k, n.k) AS k,
               CASE WHEN o.k IS NULL THEN 'added'
                    WHEN n.k IS NULL THEN 'removed'
                    WHEN o.a = n.a AND o.b = n.b THEN 'unchanged'
                    ELSE 'changed' END AS status
        FROM o FULL OUTER JOIN n USING (k) ORDER BY k
        """
    ).fetchall()
    assert got == [tuple(r) for r in want]


def test_compare_cols_subset(frames):
    old, new = frames
    got = {
        r.k: r.status
        for r in diff_snapshots(old, new, ["k"], compare_cols=["b"]).collect()
    }
    # ignoring column a: key 3 (z -> Z) becomes unchanged
    assert got == {**WANT, 3: "unchanged"}


def test_null_safety(spark):
    old = spark.createDataFrame([(1, None), (2, "x")], "k long, a string")
    new = spark.createDataFrame([(1, None), (2, None)], "k long, a string")
    got = {r.k: r.status for r in diff_snapshots(old, new, ["k"]).collect()}
    assert got == {1: "unchanged", 2: "changed"}


def test_duplicate_keys_rejected(spark, frames):
    old, new = frames
    dup = spark.createDataFrame([(1, "x", 1), (1, "x", 2)], SCHEMA)
    with pytest.raises(ValueError, match="duplicate keys"):
        diff_snapshots(dup, new, ["k"]).collect()


def test_diff_stats(frames):
    old, new = frames
    st = {
        r.status: r.n
        for r in diff_stats(diff_snapshots(old, new, ["k"])).collect()
    }
    assert st == {"added": 1, "removed": 1, "changed": 2, "unchanged": 1}
