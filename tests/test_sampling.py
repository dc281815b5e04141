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


def test_weighted_resample_expected_multiplicity(docs):
    """copies ∈ {floor(w), ceil(w)} per row; exact determinism under
    repartitioning; weight-0 stratum vanishes."""
    w = {"src0": 2.5, "src1": 0.4, "src2": 0.0}
    out = SA.weighted_resample(docs, w, "source", ["doc_id"])
    per_row = (
        out.groupBy("doc_id", "source").agg(F.count("*").alias("c")).collect()
    )
    for r in per_row:
        lo = int(w[r.source])
        assert r.c in (lo, lo + 1), (r.doc_id, r.source, r.c)
    assert not [r for r in per_row if r.source == "src2"]
    # src0 rows appear 2 or 3 times and average near 2.5
    src0 = [r.c for r in per_row if r.source == "src0"]
    assert set(src0) <= {2, 3} and 2.3 < sum(src0) / len(src0) < 2.7
    # copy column enumerates 1..c per source row
    copies = {
        (r.doc_id, r.copy) for r in out.filter(F.col("source") == "src0").collect()
    }
    d0 = next(r.doc_id for r in per_row if r.source == "src0")
    c0 = next(r.c for r in per_row if r.doc_id == d0)
    assert {(d0, i) for i in range(1, c0 + 1)} <= copies
    # determinism as a row property
    again = SA.weighted_resample(docs.repartition(17), w, "source", ["doc_id"])
    assert sorted((r.doc_id, r.copy) for r in out.collect()) == sorted(
        (r.doc_id, r.copy) for r in again.collect()
    )


def test_weighted_resample_duckdb_mirror(docs):
    """The fractional-copy decision is value-identical in DuckDB."""
    out = SA.weighted_resample(
        docs, {"src0": 1.3}, "source", ["doc_id"],
        default_weight=0.0, portable=True,
    )
    got = sorted((r.doc_id, r.copy) for r in out.collect())
    con = duckdb.connect()
    con.register("docs", docs.select("doc_id", "source").toPandas())
    want = [
        (r[0], r[1])
        for r in con.execute(
            """
            WITH b AS (
              SELECT doc_id,
                     CAST(('0x' || substr(
                         md5(concat_ws(chr(31), 'resample',
                                       CAST(doc_id AS VARCHAR))),
                     1, 15)) AS BIGINT) % 1000000 AS bucket
              FROM docs WHERE source = 'src0'
            )
            SELECT doc_id, u.c AS copy
            FROM b, UNNEST(range(1, CASE WHEN bucket < 300000
                                         THEN 3 ELSE 2 END)) AS u(c)
            ORDER BY doc_id, copy
            """
        ).fetchall()
    ]
    assert got == want


def test_temperature_weights():
    counts = {"en": 900_000, "sw": 1_000}
    # T=1: natural proportions -> every weight 1
    w1 = SA.temperature_weights(counts, 1.0)
    assert all(abs(v - 1.0) < 1e-12 for v in w1.values())
    # T>1 flattens: low-resource stratum upsampled, high-resource down
    w3 = SA.temperature_weights(counts, 3.0)
    assert w3["sw"] > 1.0 > w3["en"]
    # expected total preserved
    exp_total = sum(w3[s] * n for s, n in counts.items())
    assert exp_total == pytest.approx(sum(counts.values()))
    # T -> inf approaches uniform shares
    winf = SA.temperature_weights(counts, 1e9)
    share_sw = winf["sw"] * counts["sw"] / sum(counts.values())
    assert share_sw == pytest.approx(0.5, abs=1e-3)
    with pytest.raises(ValueError, match="temperature"):
        SA.temperature_weights(counts, 0.0)
    with pytest.raises(ValueError, match="weight"):
        SA.weighted_resample(None, {"a": -1.0}, "s", ["k"])


def test_weighted_draws_exact_oracle(spark):
    """Every draw lands in EXACTLY the interval the cumulative-weight
    layout assigns it: recompute each draw's target from the same hash and
    binary-search a driver-side cumsum (same item ordering). This verifies
    the bucketized equi-join end-to-end — bucket routing, the open upper
    bound, multi-bucket spans for heavy items — not just a statistical
    shape."""
    import bisect

    items = spark.createDataFrame(
        [("alpha", 5), ("bravo", 1), ("china", 0), ("delta", 400), ("echo", 2)],
        "word string, n long",
    )
    draws = spark.range(5000).select(F.col("id").alias("draw_id"))
    got = {
        r.draw_id: r.item
        for r in SA.weighted_draws(
            items, draws, power=0.75, seed=7, n_buckets=64
        ).collect()
    }
    # exactly one item per draw, zero-weight item never drawn
    assert len(got) == 5000
    assert "china" not in got.values()

    # driver-side oracle: same ordering (orderBy word), same hash
    names = ["alpha", "bravo", "delta", "echo"]
    ws = [5 ** 0.75, 1.0, 400 ** 0.75, 2 ** 0.75]
    cum, t = [], 0.0
    for w in ws:
        t += w
        cum.append(t)
    hashes = {
        r.draw_id: r.h
        for r in draws.select(
            "draw_id", F.pmod(F.xxhash64("draw_id", F.lit(7)), F.lit(1_000_003)).alias("h")
        ).collect()
    }
    for d, item in got.items():
        target = hashes[d] / 1_000_003.0 * t
        want = names[bisect.bisect_right(cum, target)] if target < t else names[-1]
        assert item == want, f"draw {d}: got {item}, oracle {want}"

    # heavy item dominates: w(delta)^.75 ≈ 89 of ≈96 total mass
    frac_delta = sum(1 for v in got.values() if v == "delta") / 5000
    assert 0.88 <= frac_delta <= 0.97


def test_weighted_draws_determinism_and_validation(spark):
    items = spark.createDataFrame(
        [(f"w{i}", i + 1) for i in range(50)], "word string, n long"
    )
    draws = spark.range(2000).select(F.col("id").alias("draw_id"))
    a = sorted(map(tuple, SA.weighted_draws(items, draws, seed=3).collect()))
    b = sorted(map(tuple, SA.weighted_draws(
        items.repartition(17), draws.repartition(5), seed=3
    ).collect()))
    assert a == b  # partitioning-invariant, like every sampler here
    c = sorted(map(tuple, SA.weighted_draws(items, draws, seed=4).collect()))
    assert a != c  # a different seed is a different draw
    # power=0 -> uniform over positive-weight items (loose bound: 2000
    # draws over 50 items, expect 40 each)
    u = SA.weighted_draws(items, draws, power=0.0, seed=3)
    per = [r.c for r in u.groupBy("item").agg(F.count("*").alias("c")).collect()]
    assert len(per) == 50 and min(per) > 10 and max(per) < 90
    with pytest.raises(ValueError, match="power"):
        SA.weighted_draws(items, draws, power=-1.0)
    zero = spark.createDataFrame([("a", 0)], "word string, n long")
    with pytest.raises(ValueError, match="positive weight"):
        SA.weighted_draws(zero, draws)
