"""t0/t1: fixture-generator invariants (FIXTURES.md §4)."""

from pyspark.sql import functions as F

from engine.datagen import EXT_LANG, source_files


def test_schema_and_row_count(tiny_source):
    assert tiny_source.columns == ["repo", "path", "commit", "lang", "content"]
    assert tiny_source.count() == 1_000


def test_triples_unique(tiny_source):
    assert (
        tiny_source.select("repo", "path", "commit").distinct().count() == 1_000
    )


def test_path_lang_functional(tiny_source):
    # one lang per path (ext is embedded in the path string)
    assert (
        tiny_source.groupBy("path")
        .agg(F.countDistinct("lang").alias("n"))
        .filter("n > 1")
        .count()
        == 0
    )
    langs = {r.lang for r in tiny_source.select("lang").distinct().collect()}
    assert langs <= {l for _, l in EXT_LANG}


def test_lang_skew_top_exceeds_20pct(tiny_source):
    # FIXTURES.md §4.4: top lang holds >20% of path->lang edges
    by_lang = (
        tiny_source.select("path", "lang").distinct().groupBy("lang").count()
    ).collect()
    total = sum(r["count"] for r in by_lang)
    assert max(r["count"] for r in by_lang) / total > 0.20


def test_content_duplication_pool(tiny_source):
    # ~8% of rows share pool contents -> at least one sha256 group > 2
    groups = (
        tiny_source.select(F.sha2("content", 256).alias("h"), "repo")
        .distinct()
        .groupBy("h")
        .count()
        .filter("count > 2")
    )
    assert groups.count() >= 1


def test_content_length_bounds(tiny_source):
    # non-pool contents are 30..3000 chars; pool adds a few short outliers
    n_long = tiny_source.filter(F.length("content") > 3000).count()
    assert n_long == 0


def test_determinism_across_partitioning(spark, tiny_source):
    """FIXTURES.md: same (seed, scale) at any parallelism -> identical table."""
    again = source_files(spark, 1_000, 20, partitions=3)
    a = tiny_source.orderBy("repo", "path").collect()
    b = again.orderBy("repo", "path").collect()
    assert a == b


def test_rmat_determinism_and_ranges(spark):
    from engine.datagen import rmat_edges

    e1 = rmat_edges(spark, scale=8, n_edges=5000, seed=3)
    e2 = rmat_edges(spark, scale=8, n_edges=5000, seed=3).repartition(13)
    a = sorted((r.src, r.dst) for r in e1.collect())
    b = sorted((r.src, r.dst) for r in e2.collect())
    assert a == b and len(a) == 5000  # partitioning-invariant, exact count
    assert all(0 <= s < 256 and 0 <= d < 256 for s, d in a)
    # a different seed is a different graph
    c = sorted((r.src, r.dst) for r in
               rmat_edges(spark, scale=8, n_edges=5000, seed=4).collect())
    assert c != a


def test_rmat_quadrant_frequencies(spark):
    from engine.datagen import rmat_edges
    import pyspark.sql.functions as F

    # top-level bit pair frequencies ~ (a, b, c, d) — check the marginals
    # P(src top half) = c + d and P(dst top half) = b + d on 40k edges
    a_, b_, c_ = 0.57, 0.19, 0.19
    e = rmat_edges(spark, scale=10, n_edges=40_000, a=a_, b=b_, c=c_, seed=7)
    top = 1 << 9
    r = e.agg(
        F.avg((F.col("src") >= top).cast("double")).alias("ps"),
        F.avg((F.col("dst") >= top).cast("double")).alias("pd"),
    ).collect()[0]
    import math
    sig = 3 * math.sqrt(0.25 / 40_000)
    assert abs(r.ps - (c_ + (1 - a_ - b_ - c_))) < sig, r.ps
    assert abs(r.pd - (b_ + (1 - a_ - b_ - c_))) < sig, r.pd


def test_rmat_skew_grows_with_a(spark):
    from engine.datagen import rmat_edges
    import pyspark.sql.functions as F

    def max_outdeg(a, b, c):
        e = rmat_edges(spark, scale=10, n_edges=30_000, a=a, b=b, c=c, seed=9)
        return (
            e.groupBy("src").count().agg(F.max("count")).collect()[0][0]
        )

    uniform = max_outdeg(0.25, 0.25, 0.25)
    skewed = max_outdeg(0.7, 0.1, 0.1)
    assert skewed > 3 * uniform, (uniform, skewed)


def test_rmat_contracts(spark):
    from engine.datagen import rmat_edges
    import pytest

    with pytest.raises(ValueError, match="scale"):
        rmat_edges(spark, scale=0)
    with pytest.raises(ValueError, match="a,b,c"):
        rmat_edges(spark, scale=4, a=0.5, b=0.3, c=0.3)
