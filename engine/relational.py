"""As-of (point-in-time) join — SURVEY.md §2 Table B op J6.

The reference needs no as-of semantics (SURVEY marks J6 out of scope), but
a complete engine surface ships it: it is THE join shape for event-stream
enrichment ("state as of this event's timestamp") and the one relational
operator Spark lacks as a builtin.

Spark-first design — no per-row Python, no broadcast requirement:

    union(tagged left, tagged right)
      -> ONE shuffle on the by-keys
      -> ONE within-partition sort on (time, side-tag)
      -> running ``last(value, ignorenulls)`` window carries the most
         recent right-side payload forward onto each left row
      -> filter back to left rows

All right-side payload columns ride the SAME window spec, so Catalyst
plans a single Window node over a single sort — the whole join is one
exchange + one sort regardless of how many columns are carried. This is
the merge-join formulation of as-of (the same plan pandas.merge_asof and
kdb's aj use), and it scales exactly like any keyed window: partitions are
bounded by the per-key event volume, hot keys can be salted upstream.

Tie semantics match DuckDB/pandas backward as-of: a right row at exactly
the left timestamp matches (``>=``); among equal right timestamps the last
by sort order wins (deterministic given a unique right-side column in
``order_tiebreak``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_LEFT_TAG = "__asof_is_left"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join: for each left row, the most recent right row with
    ``right.on <= left.on`` (direction="backward"; "forward" flips to the
    nearest ``right.on >= left.on``), matching within ``by`` groups.

    Parameters
    ----------
    on: ordering column name, present in both sides (timestamp or numeric).
    by: equality keys (the shuffle keys). None means a single global
        timeline — valid, but forces one partition; prefer keys at scale.
    right_cols: right payload columns to carry (default: all non-key,
        non-``on`` columns). Each lands as ``col + suffix``; the matched
        right timestamp is always carried as ``on + suffix``.
    tolerance_seconds: if set, matches further than this from the left
        timestamp are nulled out (pandas ``merge_asof(tolerance=...)``).
    order_tiebreak: optional right-side column appended to the sort for
        deterministic choice among equal-timestamp right rows.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = list(by or [])
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in by and c != on]
    out_cols = [c + suffix for c in right_cols] + [on + suffix]

    r = right.select(
        *by,
        F.col(on),
        *[F.col(c).alias(c + suffix) for c in right_cols],
        F.col(on).alias(on + suffix),
        F.lit(0).alias(_LEFT_TAG),
    )
    if order_tiebreak is not None:
        r = r.withColumn("__asof_tb", F.col(order_tiebreak + suffix))
    l = left.withColumn(_LEFT_TAG, F.lit(1))
    if order_tiebreak is not None:
        l = l.withColumn("__asof_tb", F.lit(None).cast(r.schema["__asof_tb"].dataType))
    u = l.unionByName(r, allowMissingColumns=True)

    asc = direction == "backward"
    time_ord = F.col(on).asc() if asc else F.col(on).desc()
    # Right rows sort before left rows at equal timestamps, so an exact-
    # timestamp right row is visible to the left row (inclusive >= / <=).
    order = [time_ord, F.col(_LEFT_TAG).asc()]
    if order_tiebreak is not None:
        order.insert(1, F.col("__asof_tb").asc_nulls_last())
    w = (
        Window.partitionBy(*by).orderBy(*order)
        if by
        else Window.orderBy(*order)
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)

    for c in out_cols:
        u = u.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))

    out = u.filter(F.col(_LEFT_TAG) == 1).drop(_LEFT_TAG, "__asof_tb")
    if tolerance_seconds is not None:
        gap = F.abs(
            F.col(on).cast("double") - F.col(on + suffix).cast("double")
        )
        keep = gap <= F.lit(float(tolerance_seconds))
        for c in out_cols:
            out = out.withColumn(c, F.when(keep, F.col(c)))
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    lower_seconds: float = -600.0,
    upper_seconds: float = 0.0,
    suffix: str = "_r",
    right_cols: list[str] | None = None,
) -> DataFrame:
    """Interval (range) join: every (left, right) pair within the same
    ``by`` group with ``right.on`` in ``[left.on + lower, left.on + upper]``
    (bounds inclusive).

    Spark-first plan — a non-equi time join rewritten as an EQUI join:
    both sides are bucketed on ``floor(time / window_width)``; a left row
    can only match right rows in the ~2 buckets its window spans, so it is
    exploded to exactly those bucket keys (``F.sequence`` — bounded, never
    data-dependent), equi-joined on (by..., bucket) and finished with the
    exact range filter. This is the standard shuffle-safe form of an
    interval join: without it Catalyst plans a per-key cross join whose
    reducers blow up quadratically in events-per-key; with it the shuffle
    key is (key, bucket) so skew is bounded by events-per-bucket, tunable
    via the window width. Time arithmetic is integer MICROSECONDS
    (``unix_micros``) end to end — exact, portable, no float epoch.
    """
    if upper_seconds < lower_seconds:
        raise ValueError("upper_seconds must be >= lower_seconds")
    by = list(by or [])
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in by]
    lo = int(round(lower_seconds * 1_000_000))
    hi = int(round(upper_seconds * 1_000_000))
    width = max(hi - lo, 1_000_000)  # ≥1s so empty windows still bucket

    # unix_micros needs TIMESTAMP; NTZ casts through the session zone —
    # safe here because both sides shift identically and every predicate is
    # on time DIFFERENCES (translation-invariant).
    def _us(c):
        return F.unix_micros(c.cast("timestamp"))

    lm = _us(F.col(on))
    l = left.withColumn("__us", lm).withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.floor((lm + F.lit(lo)) / F.lit(width)),
                F.floor((lm + F.lit(hi)) / F.lit(width)),
            )
        ),
    )
    r = right.select(
        *by,
        *[F.col(c).alias(c + suffix) for c in right_cols],
        _us(F.col(on)).alias("__rus"),
    ).withColumn("__bkt", F.floor(F.col("__rus") / F.lit(width)))
    out = (
        l.join(r, [*by, "__bkt"])
        .filter(
            (F.col("__rus") >= F.col("__us") + F.lit(lo))
            & (F.col("__rus") <= F.col("__us") + F.lit(hi))
        )
        # no dedup needed: only the LEFT side is exploded; each right row
        # has exactly one bucket, so a (left, right) pair matches at most
        # one (bucket) key — the join emits it once.
        .drop("__bkt", "__us", "__rus")
    )
    return out


def sessionize(
    events: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    gap_seconds: float = 1800.0,
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization: rows within a ``by`` group belong to the
    same session while consecutive ``on`` timestamps are <= ``gap_seconds``
    apart; a larger gap starts a new session (the classic web-analytics
    session window, and the batch mirror of Structured Streaming's
    ``session_window`` aggregation).

    Spark-first plan: ONE shuffle (partitionBy ``by``) feeding one sort and
    two chained window functions over the same frame — lag() marks session
    starts, a running sum numbers them — with no self-join and no
    per-session explode; Catalyst plans both windows in a single Window
    node over a single sort. Session ids are deterministic and meaningful:
    (by..., ordinal) with the ordinal 1-based in timestamp order, so two
    runs (or two engines — the oracle mirrors this exactly in SQL) assign
    identical ids. Gap comparison uses integer-microsecond timestamp
    arithmetic (the same convention as range_join/asof_join): ties at
    exactly ``gap_seconds`` stay in the session (<=).
    """
    by = list(by or [])
    w = (
        Window.partitionBy(*by).orderBy(F.col(on))
        if by
        else Window.orderBy(F.col(on))
    )
    gap_us = int(round(float(gap_seconds) * 1_000_000))
    prev = F.lag(F.col(on)).over(w)

    # unix_micros needs TIMESTAMP; NTZ casts through the session zone —
    # safe because the predicate is on a time DIFFERENCE (same _us
    # convention as range_join).
    def _us(c):
        return F.unix_micros(c.cast("timestamp"))

    is_new = F.when(
        prev.isNull() | ((_us(F.col(on)) - _us(prev)) > F.lit(gap_us)),
        F.lit(1),
    ).otherwise(F.lit(0))
    ordinal = F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sid = F.concat_ws(
        "#", *[F.col(c).cast("string") for c in by], ordinal.cast("string")
    )
    return events.withColumn(session_col, sid)


def session_stats(
    events: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    gap_seconds: float = 1800.0,
) -> DataFrame:
    """Per-session rollup over ``sessionize``: (by..., session_id,
    n_events, t_start, t_end, duration_s). One extra partial-aggregated
    groupBy on top of the sessionization shuffle — the aggregation keys
    extend the window keys, so under the same partitioning the groupBy
    combines map-side."""
    by = list(by or [])
    s = sessionize(events, on=on, by=by, gap_seconds=gap_seconds)
    return s.groupBy(*by, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(on).alias("t_start"),
        F.max(on).alias("t_end"),
        (
            (
                F.unix_micros(F.max(on).cast("timestamp"))
                - F.unix_micros(F.min(on).cast("timestamp"))
            )
            / F.lit(1_000_000.0)
        ).alias("duration_s"),
    )
