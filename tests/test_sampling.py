"""Deterministic sampling operators (engine/sampling.py).

The contract under test is DETERMINISM AS A ROW PROPERTY: the same row is
kept under any partitioning, any engine (DuckDB mirrors the portable-hash
pipeline value-for-value), and across independent runs — plus statistical
sanity (fractions land near their targets) and the split/reservoir
exactness guarantees."""

import duckdb
import pytest
from pyspark.sql import functions as F

from engine import sampling as SA

SCHEMA = "doc_id long, source string, text string"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"src{i % 3}", f"document body {i} {'x' * (i % 7)}")
        for i in range(1000)
    ]
    df = spark.createDataFrame(rows, SCHEMA).cache()
    df.count()
    return df


def test_hash_sample_fraction_and_determinism(docs):
    s1 = SA.hash_sample(docs, 0.3, ["doc_id"])
    n = s1.count()
    assert 230 <= n <= 370  # ~binomial(1000, .3), wide bound
    # same rows on a rerun and under different partitioning
    ids1 = {r.doc_id for r in s1.collect()}
    ids2 = {r.doc_id for r in SA.hash_sample(docs.repartition(13), 0.3, ["doc_id"]).collect()}
    assert ids1 == ids2
    # different salt -> a genuinely different draw
    ids3 = {r.doc_id for r in SA.hash_sample(docs, 0.3, ["doc_id"], salt="other").collect()}
    assert ids3 != ids1


def test_hash_sample_duckdb_mirror(docs):
    """The portable-hash path is value-identical in DuckDB — the whole
    keep/drop decision is re-derived by another engine."""
    got = sorted(
        r.doc_id for r in SA.hash_sample(docs, 0.25, ["doc_id"], portable=True).collect()
    )
    pdf = docs.select("doc_id").toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    want = [
        r[0]
        for r in con.execute(
            """
            SELECT doc_id FROM docs
            WHERE CAST(('0x' || substr(
                      md5(concat_ws(chr(31), 'sample', CAST(doc_id AS VARCHAR))),
                  1, 15)) AS BIGINT) % 1000000 < 250000
            ORDER BY doc_id
            """
        ).fetchall()
    ]
    assert got == want


def test_split_disjoint_exhaustive(docs):
    parts = SA.split(docs, {"train": 0.8, "val": 0.1, "test": 0.1}, ["doc_id"])
    ids = {k: {r.doc_id for r in v.collect()} for k, v in parts.items()}
    assert ids["train"] | ids["val"] | ids["test"] == set(range(1000))
    assert not (ids["train"] & ids["val"])
    assert not (ids["train"] & ids["test"])
    assert not (ids["val"] & ids["test"])
    assert 700 <= len(ids["train"]) <= 880


def test_stratified_sample(docs):
    out = SA.stratified_sample(
        docs, {"src0": 1.0, "src1": 0.2}, "source", ["doc_id"]
    )
    by_src = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_src.get("src0") == 334          # 100% of stratum kept
    assert 30 <= by_src.get("src1", 0) <= 110  # ~20% of 333
    assert "src2" not in by_src               # default_fraction=0 drops


def test_reservoir_per_key_exact_k(docs):
    out = SA.reservoir_per_key(docs, 5, ["source"], ["doc_id"])
    sizes = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert sizes == {"src0": 5, "src1": 5, "src2": 5}
    # deterministic under repartitioning
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(
        r.doc_id
        for r in SA.reservoir_per_key(
            docs.repartition(17), 5, ["source"], ["doc_id"]
        ).collect()
    )
    assert a == b
    # small groups come back whole
    tiny = docs.filter(F.col("doc_id") < 3)
    assert SA.reservoir_per_key(tiny, 5, ["source"], ["doc_id"]).count() == 3


def test_fraction_validation(docs):
    with pytest.raises(ValueError):
        SA.hash_sample(docs, 1.5, ["doc_id"])
    with pytest.raises(ValueError):
        SA.stratified_sample(docs, {"src0": -0.1}, "source", ["doc_id"])
    with pytest.raises(ValueError):
        SA.reservoir_per_key(docs, 0, ["source"], ["doc_id"])
    with pytest.raises(ValueError):
        SA.split(docs, {"a": 0.0}, ["doc_id"])
