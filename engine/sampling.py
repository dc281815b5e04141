"""Deterministic sampling operators for training-data pipelines.

Random sampling at 100 TB has two requirements ordinary ``df.sample``
doesn't meet: (1) REPRODUCIBILITY independent of partitioning — a re-run,
a resume, or a different cluster size must pick the SAME rows (Spark's
``sample`` is seed-stable only for identical partitioning); (2) per-group
control — training mixes are specified per source/language/quality bucket,
not globally. Both fall out of hash-threshold sampling (public knowledge —
the standard "salted hash bucket" trick): a row is kept iff
``pmod(xxhash64(key, salt), M) < frac*M``. The decision is a pure function
of the row's key, so it commutes with any partitioning, survives resume,
and is expressible in any engine with a 64-bit hash (tests mirror the
whole pipeline in DuckDB via the portable md5-family hash from
engine.dedup).

No shuffles anywhere: every operator here is a filter or a windowed
aggregation the optimizer places; stratified counts are one partial-agg
groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from engine.dedup import _h64

# Denominator for the hash threshold. 1e6 gives ppm resolution on the
# sampling fraction — fractions are quantized to 1/M, documented, exact.
M = 1_000_000


def _bucket(cols: list[str], salt: str, portable: bool = False):
    """Uniform bucket in [0, M) from the row key — xxhash64 in production,
    engine.dedup's md5-family portable hash when a cross-engine mirror
    must verify values. The key is the \\x1f-joined string form of the
    columns (cast explicitly: concat_ws wants strings), so the identical
    expression exists in any SQL engine."""
    s = F.concat_ws(
        "\x1f", F.lit(salt), *[F.col(c).cast("string") for c in cols]
    )
    return F.pmod(_h64(s, None, portable), F.lit(M))


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_cols: list[str],
    salt: str = "sample",
    portable: bool = False,
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided by a hash of ``key_cols``.

    Deterministic under repartitioning, resume, and cluster resizing; a
    row's fate never changes between runs with the same salt. Different
    ``salt`` values draw INDEPENDENT samples (disjoint-ish, overlapping at
    ~f1*f2), which is how train/validation splits stay leak-free:
    ``hash_sample(df, 0.9, keys, salt="train")`` and the 0.1 complement
    share no derivation. Quantized to 1/M = 1e-6."""
    if not (0.0 <= fraction <= 1.0):
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    thr = int(round(fraction * M))
    return df.filter(_bucket(key_cols, salt, portable) < thr)


def split(
    df: DataFrame,
    weights: dict[str, float],
    key_cols: list[str],
    salt: str = "split",
    portable: bool = False,
) -> dict[str, DataFrame]:
    """Disjoint, exhaustive named splits (train/val/test) by hash range.

    Unlike ``randomSplit`` the assignment is a row property, not a
    partition-order property: every run, engine, and cluster size puts
    each row in the same split. Weights are normalized; ranges are
    half-open [lo, hi) over the hash bucket so the splits partition the
    input exactly."""
    total = sum(weights.values())
    if not (total > 0):
        raise ValueError("split weights must sum > 0")
    b = _bucket(key_cols, salt, portable)
    out: dict[str, DataFrame] = {}
    lo = 0
    names = list(weights)
    for i, name in enumerate(names):
        hi = M if i == len(names) - 1 else lo + int(round(weights[name] / total * M))
        out[name] = df.filter((b >= lo) & (b < hi))
        lo = hi
    return out


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    stratum_col: str,
    key_cols: list[str],
    default_fraction: float = 0.0,
    salt: str = "stratified",
    portable: bool = False,
) -> DataFrame:
    """Per-stratum hash sampling — the training-mix operator: keep 100% of
    one source, 5% of another. ``fractions`` maps stratum value -> keep
    fraction; strata not listed get ``default_fraction``. One filter, no
    shuffle, same determinism contract as ``hash_sample``."""
    for k, f in fractions.items():
        if not (0.0 <= f <= 1.0):
            raise ValueError(f"fraction for stratum {k!r} must be in [0,1], got {f}")
    thr = F.lit(int(round(default_fraction * M)))
    expr = thr
    for val, frac in fractions.items():
        expr = F.when(
            F.col(stratum_col) == F.lit(val), F.lit(int(round(frac * M)))
        ).otherwise(expr)
    return df.filter(_bucket(key_cols, salt, portable) < expr)


def weighted_resample(
    df: DataFrame,
    weights: dict[str, float],
    stratum_col: str,
    key_cols: list[str],
    default_weight: float = 1.0,
    salt: str = "resample",
    portable: bool = False,
) -> DataFrame:
    """Per-stratum multiplicity resampling — the training-mix operator for
    weights ABOVE 1 (epoch upsampling) as well as below: each row is
    emitted floor(w) times, plus one more iff its hash bucket falls under
    frac(w), so E[copies] = w exactly and the variance is the minimum
    achievable for integer copy counts (copies only ever takes the two
    values floor(w) and ceil(w) — "stochastic rounding", public knowledge
    from multilingual-corpus temperature sampling, e.g. the XLM-R /
    mC4 recipes).

    Adds a ``copy`` column (1..n per source row) so downstream shuffles
    and dedup can distinguish — or collapse — repeats. Deterministic as a
    row property: same copies under any partitioning, resume, or engine
    (the fractional decision reuses the hash_sample bucket). Weight 0
    drops the stratum; strata absent from ``weights`` get
    ``default_weight``. No shuffle — one when-chain, one explode."""
    for k, w in weights.items():
        if w < 0:
            raise ValueError(f"weight for stratum {k!r} must be >= 0, got {w}")
    if default_weight < 0:
        raise ValueError(f"default_weight must be >= 0, got {default_weight}")

    def _base_thr(w: float) -> tuple[int, int]:
        base = int(w)
        return base, int(round((w - base) * M))

    db, dt = _base_thr(default_weight)
    base_expr, thr_expr = F.lit(db), F.lit(dt)
    for val, w in weights.items():
        b, t = _base_thr(w)
        cond = F.col(stratum_col) == F.lit(val)
        base_expr = F.when(cond, F.lit(b)).otherwise(base_expr)
        thr_expr = F.when(cond, F.lit(t)).otherwise(thr_expr)
    copies = base_expr + F.when(
        _bucket(key_cols, salt, portable) < thr_expr, F.lit(1)
    ).otherwise(F.lit(0))
    # sequence(1, 0) would generate a DESCENDING [1, 0] — guard explicitly.
    seq = F.when(copies > 0, F.sequence(F.lit(1), copies)).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn("copy", F.explode(seq))


def temperature_weights(
    counts: dict[str, int], temperature: float, total: int | None = None
) -> dict[str, float]:
    """Per-stratum multipliers realizing temperature-sampled mixture shares
    q_s ∝ n_s^(1/T) (T=1 keeps natural proportions; T>1 flattens toward
    uniform — the standard multilingual-training knob). Returns weights
    w_s = q_s * total / n_s for ``weighted_resample``; ``total`` defaults
    to sum(counts) so the expected output size equals the input size."""
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    if any(n <= 0 for n in counts.values()):
        raise ValueError("stratum counts must be positive")
    n_total = sum(counts.values())
    if total is None:
        total = n_total
    alpha = 1.0 / temperature
    z = sum(n**alpha for n in counts.values())
    return {s: (n**alpha / z) * total / n for s, n in counts.items()}


def reservoir_per_key(
    df: DataFrame,
    k: int,
    group_cols: list[str],
    key_cols: list[str],
    salt: str = "reservoir",
    portable: bool = False,
) -> DataFrame:
    """Exactly min(k, group size) rows per group — a deterministic
    reservoir: rank rows within each group by their hash and keep the k
    smallest. Equivalent in distribution to uniform k-of-n sampling (the
    hash order is a uniform random permutation of the group), but
    reproducible and engine-portable.

    Cost: one hash-partitioned window per group (the same shuffle an
    aggregation over the groups would pay). For the 100-TB case prefer
    pre-filtering with ``hash_sample`` at a generous fraction first so the
    window input is O(k * groups), not O(corpus): sampling THEN reservoir
    is still exactly uniform, conditioned on the survivor set."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(
        _bucket(key_cols, salt, portable).asc(), *[F.col(c) for c in key_cols]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def weighted_draws(
    items: DataFrame,
    draws: DataFrame,
    weight_col: str = "n",
    item_col: str = "word",
    draw_col: str = "draw_id",
    power: float = 1.0,
    seed: int = 13,
    n_buckets: int = 1024,
) -> DataFrame:
    """(draw_id, item) — one weighted categorical draw per input row,
    P(item) ∝ weight^power. ``power=0.75`` is word2vec's negative-sampling
    distribution (Mikolov et al. 2013 — public knowledge); the draws are
    hash-derived row properties, so the table is reproducible under any
    partitioning/resume, like every sampler in this module.

    Spark shape: the item table gets cumulative-weight intervals
    [lo, hi) via ONE single-partition window — deliberate and bounded:
    this is a VOCABULARY-sized table (the aggregated dict, not the
    corpus; same contract as learn_bpe and the report windows). Matching
    a draw's target to its interval is a bucketized EQUI join (the
    interval side explodes to the ~(w_i/total)*n_buckets+1 buckets it
    spans — total explode volume is n_buckets + |V| rows), never a
    per-draw scan of the vocabulary. Exactly one item matches per draw.
    """
    from pyspark.sql import Window

    if power < 0:
        raise ValueError(f"power must be >= 0, got {power}")
    w = F.pow(F.col(weight_col).cast("double"), F.lit(float(power)))
    ordered = Window.orderBy("item")
    iv = (
        items.select(F.col(item_col).alias("item"), w.alias("w"))
        .filter(F.col("w") > 0)
        .withColumn("hi", F.sum("w").over(
            ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ))
        .withColumn("lo", F.col("hi") - F.col("w"))
        .localCheckpoint(eager=True)
    )
    row = iv.agg(F.max("hi").alias("t"), F.count(F.lit(1)).alias("v")).collect()[0]
    if row.v == 0:
        raise ValueError("weighted_draws: no item has positive weight")
    total, bw = float(row.t), float(row.t) / n_buckets
    buckets = iv.select(
        "item", "lo", "hi",
        F.explode(F.sequence(
            F.floor(F.col("lo") / bw).cast("int"),
            # hi is exclusive: a zero-width landing exactly on hi belongs
            # to the NEXT item, so the span end uses the open bound
            F.floor((F.col("hi") - F.lit(total) * 1e-15) / bw).cast("int"),
        )).alias("b"),
    )
    u = (
        F.pmod(F.xxhash64(F.col(draw_col), F.lit(seed)), F.lit(1_000_003))
        / F.lit(1_000_003.0)
    )
    targets = draws.select(
        F.col(draw_col).alias("draw_id"), (u * total).alias("target")
    ).withColumn("b", F.floor(F.col("target") / bw).cast("int"))
    out = (
        targets.join(buckets, "b")
        .filter((F.col("lo") <= F.col("target")) & (F.col("target") < F.col("hi")))
        .select("draw_id", "item")
    )
    iv.unpersist()
    return out
