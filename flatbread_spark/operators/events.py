"""Event-sequence analytics: ordered funnels and cohort retention.

The two classic product-analytics operators a large event store needs
(reference surface has sessionize/rollup in ``streaming/windows.py``; these
complete the batch family). Both are single-pass declarative plans:

- ``funnel``: per-user ordered step matching folded JVM-side with
  ``F.aggregate`` over the user's time-sorted events — one shuffle (groupBy
  user), no UDF, no iterative self-joins. Equivalent to the sequential
  "min timestamp of step k strictly after step k-1" definition.
- ``cohort_retention``: first-seen week per user joined back to distinct
  active weeks — two aggregations and one equi-join, all keyed on the user
  id so co-partitioning holds at scale.

Skew note (100 TB): both group on the user id; a bot-grade user with
millions of events makes ``collect_list`` the hazard in ``funnel``. Cap the
per-user event list upstream (e.g. ``sampling.topk_by_group`` on recency)
for open-web corpora — the funnel semantics only need events of the step
types, which the operator pre-filters before collecting.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Ordered-funnel conversion over ``steps`` (strictly increasing
    timestamps between consecutive steps).

    A user reaches step k when there exist events e1..ek of the step types
    with t(e1) < t(e2) < ... < t(ek); matching is greedy-earliest, which
    reaches the maximal step (standard funnel semantics). Returns one row
    per step: (step int, step_name, n_users, pct_of_first).

    ``ts_col`` must be an orderable column (long epoch or timestamp); ties
    across types at the same timestamp do NOT advance two steps (strict
    inequality), so the result is insensitive to within-tie sort order.
    """
    if not steps:
        raise ValueError("funnel requires at least one step")
    k = len(steps)
    ts_dtype = df.schema[ts_col].dataType
    steps_lit = F.array(*[F.lit(s) for s in steps])

    ev = df.filter(F.col(type_col).isin(list(steps))).select(
        F.col(user_col).alias("__u"),
        F.struct(F.col(ts_col).alias("t"), F.col(type_col).alias("y")).alias("__e"),
    )
    per_user = ev.groupBy("__u").agg(F.array_sort(F.collect_list("__e")).alias("__es"))

    folded = F.aggregate(
        F.col("__es"),
        F.struct(
            F.lit(0).alias("step"), F.lit(None).cast(ts_dtype).alias("t")
        ),
        lambda acc, e: F.when(
            (acc["step"] < k)
            & (e["y"] == F.element_at(steps_lit, acc["step"] + 1))
            & (acc["t"].isNull() | (e["t"] > acc["t"])),
            F.struct((acc["step"] + 1).alias("step"), e["t"].alias("t")),
        ).otherwise(acc),
    )
    # Alias the HOF fold once (HOF expressions re-evaluate per reference).
    reached = per_user.select(folded["step"].alias("__reached"))

    counts = reached.agg(
        *[
            F.sum((F.col("__reached") >= i + 1).cast("long")).alias(f"__s{i + 1}")
            for i in range(k)
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step"),
                F.lit(steps[i]).alias("step_name"),
                F.coalesce(F.col(f"__s{i + 1}"), F.lit(0)).alias("n_users"),
            )
            for i in range(k)
        ]
    )
    return (
        counts.select(F.explode(rows).alias("r"), F.col("__s1"))
        .select(
            "r.step",
            "r.step_name",
            "r.n_users",
            # NULL (not an ANSI divide-by-zero crash) when no user reached
            # step 1 — caught by the round-7 event property sweep
            F.when(
                F.col("__s1") > 0,
                F.round(F.col("r.n_users") / F.col("__s1"), 6),
            ).alias("pct_of_first"),
        )
    )


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Weekly cohort retention: users bucketed by the week of their first
    event; for each (cohort_week, week_offset) the count of cohort members
    active that week.

    ``ts_col`` must be a timestamp column. Weeks are Monday-truncated
    (``date_trunc('week', ...)`` — same convention in ANSI SQL engines), so
    offsets are exact day-difference/7 with no partial-week ambiguity.
    Returns (cohort_week date, week_offset int, n_active long).
    """
    ts = F.col(ts_col)
    firsts = (
        df.groupBy(F.col(user_col).alias("__u"))
        .agg(F.min(ts).alias("__first"))
        .select(
            "__u", F.date_trunc("week", F.col("__first")).cast("date").alias("cohort_week")
        )
    )
    active = (
        df.select(
            F.col(user_col).alias("__u"),
            F.date_trunc("week", ts).cast("date").alias("__week"),
        )
        .distinct()
    )
    return (
        firsts.join(active, "__u")
        .groupBy(
            "cohort_week",
            F.expr("CAST(datediff(__week, cohort_week) DIV 7 AS INT)").alias(
                "week_offset"
            ),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
    )


def event_transitions(
    df: DataFrame,
    key_col: str,
    order_col: str,
    state_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """First-order (Markov) transition matrix over per-key event
    sequences: for every observed ``(from_state, to_state)`` pair of
    CONSECUTIVE events within a key, the transition count, the from-state
    outgoing total, and the exact probability
    ``p_ppm = n·1e6 div n_from`` — the third classic batch
    sequence-analytics operator next to :func:`funnel` and
    :func:`cohort_retention` (what follows what: navigation flows,
    session drop-off structure, crawler behavior signatures).

    Consecutiveness is per key over ``(order_col, tiebreak_col)`` —
    pass a unique tiebreaker (the event id) when timestamps can collide,
    or the pairing is not a total order. Keys with one event contribute
    nothing. One per-key window (the same per-stratum bound funnel has,
    and the same bot-user skew note) + one pair-vocabulary-bounded
    aggregation; probabilities are windows over the PAIR table, never
    the corpus. All-BIGINT.
    """
    from pyspark.sql import Window

    order = [F.col(order_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    nxt = F.lead(F.col(state_col)).over(w)
    pairs = (
        df.withColumn("__to", nxt)
        .filter(F.col("__to").isNotNull())
        .groupBy(
            F.col(state_col).alias("from_state"),
            F.col("__to").alias("to_state"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    wf = Window.partitionBy("from_state")
    return (
        pairs.withColumn("n_from", F.sum("n").over(wf).cast("bigint"))
        .withColumn(
            "p_ppm",
            F.expr("n * CAST(1000000 AS BIGINT) div n_from").cast("bigint"),
        )
    )


def session_paths(
    df: DataFrame,
    key_col: str,
    order_col: str,
    state_col: str,
    k: int = 5,
    tiebreak_col: str | None = None,
    sep: str = ">",
) -> DataFrame:
    """Ordered first-``k`` event-path frequency table: for each key the
    first ``k`` states in ``(order_col, tiebreak_col)`` order are joined
    into one ``sep``-delimited path string, then paths are counted across
    keys — the onboarding-flow / navigation-prefix report that completes
    the batch sequence family (:func:`funnel` is unordered-milestone,
    :func:`event_transitions` is pairwise; this is the full ordered
    prefix).

    Dataflow: one per-key window ranks events (same per-key bound and
    bot-user skew note as :func:`funnel`); rows with rank > ``k`` are
    DROPPED BEFORE the collect, so the per-key list is bounded by ``k``
    regardless of how many events a key has — the collect can never
    balloon on a bot user. Path assembly sorts the (rank, state) structs
    row-locally (rank is unique within a key, so the order is total);
    the share denominator is a 1-row scalar frame (broadcast corner, the
    sanctioned shape). ``share_ppm = n_keys * 1e6 div total_keys`` is
    all-BIGINT and byte-identical across engines.

    Returns ``(path, n_keys, share_ppm)`` — one row per distinct path.

    Pass a unique ``tiebreak_col`` (the event id) when ``order_col`` can
    collide, or the prefix is not deterministic.
    """
    if k < 1:
        raise ValueError("session_paths requires k >= 1")
    from pyspark.sql import Window

    order = [F.col(order_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    per_key = (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .groupBy(key_col)
        .agg(
            F.concat_ws(
                sep,
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("__rn").alias("rn"),
                                F.col(state_col).alias("s"),
                            )
                        )
                    ),
                    lambda x: x["s"],
                ),
            ).alias("path")
        )
    )
    # the denominator branch and the path-count branch both consume the
    # per-key frame: pin it so the window+groupBy run once, not twice
    from flatbread_spark.operators.dedup import _pin

    per_key = _pin(per_key)
    total = per_key.agg(
        F.count(F.lit(1)).cast("bigint").alias("__total")
    )
    return (
        per_key.groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_keys"))
        .crossJoin(F.broadcast(total))
        .withColumn(
            "share_ppm",
            F.expr("n_keys * CAST(1000000 AS BIGINT) div __total").cast(
                "bigint"
            ),
        )
        .drop("__total")
    )


def conversion_lag(
    df: DataFrame,
    key_col: str,
    order_col: str,
    state_col: str,
    from_state: str,
    to_state: str,
    q_ppm: "tuple[int, ...]" = (250_000, 500_000, 750_000, 900_000, 990_000),
    num_partitions: int | None = None,
) -> DataFrame:
    """Time-to-convert distribution: per key, the lag between the FIRST
    ``from_state`` event and the FIRST ``to_state`` event, summarized as
    EXACT nearest-rank percentiles — "how long from first view to first
    purchase, p50/p95/p99" (product analytics) or "first crawl to first
    re-crawl" (ingestion freshness). Completes the event family: funnel
    answers *whether* users convert, this answers *how fast*.

    Dataflow: ONE conditional-min groupBy on the key (two ``min(when)``
    aggregates — a single shuffle, map-side partial); keys missing either
    endpoint or converting "backwards" (to before from) are dropped; the
    lag frame (one BIGINT row per converting key) feeds
    :func:`flatbread_spark.operators.ranking.exact_percentiles` — the
    two-phase range-partitioned rank, so no unpartitioned window even
    when billions of keys convert. All-BIGINT lag arithmetic and integer
    ppm targets replay byte-identically across engines.

    ``order_col`` must be integral (epoch ns via
    ``functions.eventtime.ensure_epoch_ns`` at the load boundary, or an
    ordinal). Returns one row per requested quantile:
    ``(q_ppm, pos, n, lag)``.
    """
    from flatbread_spark.operators.ranking import exact_percentiles

    firsts = df.groupBy(key_col).agg(
        F.min(
            F.when(F.col(state_col) == from_state, F.col(order_col))
        ).alias("__ta"),
        F.min(
            F.when(F.col(state_col) == to_state, F.col(order_col))
        ).alias("__tb"),
    )
    lags = (
        firsts.filter(
            F.col("__ta").isNotNull()
            & F.col("__tb").isNotNull()
            & (F.col("__tb") >= F.col("__ta"))
        )
        .select(
            F.col(key_col),
            (F.col("__tb") - F.col("__ta")).cast("bigint").alias("lag"),
        )
    )
    return exact_percentiles(
        lags, "lag", key_col, q_ppm, num_partitions=num_partitions
    )


def rolling_counts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    window: int,
    value_col: str | None = None,
) -> DataFrame:
    """Per-key TRAILING-window aggregate at event granularity: for every
    event, how many events the same key produced in the inclusive
    ``[ts - window, ts]`` interval (and the decimal-exact sum of
    ``value_col`` over that interval when given) — the sliding-window
    burst profile. Complements the two existing rate views: tumbling
    buckets (``streaming/windows.py`` rollup, ``events_hourly``) snap to
    a grid and :func:`rate_anomaly` compares gridded buckets; this is the
    exact per-event trailing count with no grid quantization.

    One RANGE window partitioned by the key — state is bounded per key
    (the frame holds only events inside ``window``), billions of keys
    parallelize, and Spark's range frame is streaming within the
    partition (no per-key materialization beyond the frame). Duplicate
    timestamps are frame PEERS — every row with equal ts gets the same
    inclusive count, so the result is deterministic without a tiebreak.
    ``ts_col`` must be integral (epoch ns at the load boundary); the
    count is BIGINT and the optional sum rides DECIMAL(27,6) before the
    final double cast — the established cross-engine-exact shape.

    Returns the input keys plus ``(n_win[, sum_win])``, one row per event.
    """
    if window <= 0:
        raise ValueError("rolling_counts requires a positive window")
    from pyspark.sql import Window

    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col))
        .rangeBetween(-int(window), 0)
    )
    out = df.withColumn(
        "n_win", F.count(F.lit(1)).over(w).cast("bigint")
    )
    if value_col is not None:
        out = out.withColumn(
            "sum_win",
            F.sum(F.col(value_col).cast("decimal(27,6)"))
            .over(w)
            .cast("double"),
        )
    return out
