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
