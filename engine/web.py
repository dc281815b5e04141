"""URL / domain operators for web-corpus curation — the per-document
provenance layer every large-scale crawl pipeline keys on (C4, CCNet,
RefinedWeb and Dolma all filter and aggregate by registered domain —
public knowledge).

Everything here is pure codegen'd column expressions — zero shuffle for
the feature pass, one broadcast anti-join for blocklist filtering, one
hash groupBy for domain rollups. URL parsing is done with regular
expressions restricted to constructs Java regex (Spark) and python `re`
treat identically (the engine/text.py PII discipline), so the pytest
oracle applies the SAME pattern strings via `re` and asserts exact
equality; Spark's builtin ``parse_url`` (java.net.URI semantics) is
deliberately not used because its failure modes aren't mirrorable.

Registered-domain extraction uses a curated literal subset of the
Mozilla Public Suffix List (public knowledge) covering the common
two-level suffixes; at production scale the seam is the same column
expression with the suffix set swapped for a broadcast-joined full PSL
table. `host_rev` (labels reversed: ``org.example.www``) is the classic
web-table layout key — range-partitioning on it co-locates a domain's
documents (BigTable/Common Crawl practice), which is what makes
per-domain aggregation and dedup shuffle-light at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Pattern strings shared verbatim with the pytest oracle. Constructs are
# the Java/python-identical subset: character classes, alternation,
# non-capturing groups, anchors. No lookaround, no possessives.
SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://(?:[^/?#@]*@)?([^/?#]*)"
HOST_RE = r"^([^:]*)"
PORT_RE = r":([0-9]+)$"
PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)"
FRAGMENT_RE = r"#.*$"
QUERY_RE = r"\?(.*)$"
IPV4_RE = r"^([0-9]{1,3}\.){3}[0-9]{1,3}$"

# Curated two-level public suffixes (subset of the Mozilla PSL). A host's
# registered domain takes THREE labels when its last two match this set
# (bbc.co.uk, not co.uk), else two.
MULTI_SUFFIXES = [
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "com.br", "net.br", "org.br", "gov.br",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "co.in", "net.in", "org.in", "ac.in", "gov.in",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "com.ar", "com.tr", "com.tw", "com.sg", "com.hk",
    "co.kr", "or.kr", "co.za", "co.nz", "co.id", "co.th",
    "com.my", "com.ph", "com.vn", "com.eg", "com.sa", "com.pk",
]


def url_features(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append parsed URL columns: scheme, host (lowercased), port,
    path, query, registered_domain, host_rev, path_depth, n_params.

    Absent components are empty strings (port: null int) — never null
    strings, so downstream groupBys need no coalesce. Scheme-less or
    otherwise unparseable URLs yield empty host and '' registered
    domain; they are kept, not dropped, so a filter decision stays with
    the caller.
    """
    u = F.col(url_col)
    pre = F.regexp_replace(u, FRAGMENT_RE, "")  # strip fragment first
    hostport = F.regexp_extract(u, HOSTPORT_RE, 1)
    host = F.lower(F.regexp_extract(hostport, HOST_RE, 1))
    labels = F.split(host, r"\.")
    n_lab = F.size(labels)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    reg = (
        F.when(host == "", F.lit(""))
        .when(host.rlike(IPV4_RE), host)
        .when((n_lab >= 3) & last2.isin(MULTI_SUFFIXES), last3)
        .when(n_lab >= 2, last2)
        .otherwise(host)
    )
    path = F.regexp_extract(pre, PATH_RE, 1)
    query = F.regexp_extract(pre, QUERY_RE, 1)
    return (
        df.withColumn("scheme", F.lower(F.regexp_extract(u, SCHEME_RE, 1)))
        .withColumn("host", host)
        .withColumn(
            "port",
            F.nullif(F.regexp_extract(hostport, PORT_RE, 1), F.lit(""))
            .cast("int"),
        )
        .withColumn("path", path)
        .withColumn("query", query)
        .withColumn("registered_domain", reg)
        .withColumn(
            "host_rev",
            F.when(host == "", F.lit("")).otherwise(
                F.concat_ws(".", F.reverse(labels))
            ),
        )
        .withColumn(
            "path_depth",
            F.size(F.filter(F.split(path, "/"), lambda x: x != "")),
        )
        .withColumn(
            "n_params",
            F.when(query == "", F.lit(0)).otherwise(
                F.size(F.split(query, "&"))
            ),
        )
    )


def domain_stats(df: DataFrame, size_col: str | None = None) -> DataFrame:
    """Per-registered-domain rollup over ``url_features`` output:
    (registered_domain, n_docs, n_hosts, total_size?). One hash groupBy —
    partial-aggregated map-side, so the shuffle carries one row per
    (partition, domain), not per document."""
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("host").alias("n_hosts"),
    ]
    if size_col is not None:
        aggs.append(F.sum(size_col).alias("total_size"))
    return df.groupBy("registered_domain").agg(*aggs)


def filter_domains(
    df: DataFrame,
    domains: DataFrame,
    mode: str = "drop",
    domain_col: str = "registered_domain",
) -> DataFrame:
    """Blocklist (mode='drop', anti-join) or allowlist (mode='keep',
    semi-join) filtering against a (domain) DataFrame. The domain list is
    broadcast — blocklists are thousands-to-millions of rows, always the
    small side against a 100 TB corpus; the corpus never shuffles."""
    if mode not in ("drop", "keep"):
        raise ValueError(f"mode must be 'drop' or 'keep', got {mode!r}")
    # No distinct on the list side: semi/anti joins are insensitive to
    # build-side duplicates, and dropping the dedup keeps the whole filter
    # a single broadcast stage with zero exchanges.
    d = F.broadcast(
        domains.select(F.col(domains.columns[0]).alias(domain_col))
    )
    how = "anti" if mode == "drop" else "semi"
    return df.join(d, domain_col, how)
