"""Window / ordered-pattern operators (SURVEY.md §2.7 O3+O5, §2.9 T1/T4
batch-checkable forms).

The reference's only ordered-per-group logic is "first entry wins" dedup
(src/etl/facilities.py:67-69); the driver's `events` table extends the
surface to ranking, lag/running aggregates, tumbling windows, and
sessionization. All ordering keys carry an explicit unique tie-break so
results are hash-deterministic — at any scale, a window without a total
order is a nondeterminism bug, not a performance choice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graph_etl_pipeline_spark.functions.numeric import dec
from graph_etl_pipeline_spark.io import table
from graph_etl_pipeline_spark.queries._sql import osum, sdec
from graph_etl_pipeline_spark.registry import register


@register(
    "win_row_number_dedup",
    oracle="""
    SELECT c_nationkey, c_custkey, c_name, c_acctbal
    FROM (
        SELECT c_nationkey, c_custkey, c_name, c_acctbal,
               row_number() OVER (
                   PARTITION BY c_nationkey
                   ORDER BY c_acctbal DESC, c_custkey
               ) AS rn
        FROM customer
    )
    WHERE rn = 1
    """,
    tags=("window", "dedup"),
)
def win_row_number_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: keep-one-row-per-group (reference: src/etl/facilities.py:67-69 —
    first-seen facility wins per name). row_number over an explicit
    deterministic ordering replaces the reference's implicit file order:
    richest customer per nation, key tie-break."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.select("c_nationkey", "c_custkey", "c_name", "c_acctbal")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "win_lag_running_sum",
    oracle=f"""
    SELECT event_id, user_id, value,
           lag(value) OVER w AS prev_value,
           CAST(CAST(SUM({sdec('value')}) OVER w AS VARCHAR) AS DOUBLE) AS running_value
    FROM events
    WINDOW w AS (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    )
    """,
    tags=("window",),
)
def win_lag_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5: per-group ordered patterns — lag + running sum over the event
    stream (SURVEY §2.7; no reference analogue, driver-mandated). The
    running sum is an exact decimal so the prefix values are
    order-of-evaluation independent."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wlag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(wlag).alias("prev_value"),
        F.sum(dec("value")).over(w).cast("double").alias("running_value"),
    )


@register(
    "win_tumbling_hourly",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {osum(sdec('value'), "sum_value")}
    FROM events
    GROUP BY 1, 2
    """,
    tags=("window", "streaming"),
)
def win_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1: tumbling-window aggregation (SURVEY §2.9 — the streaming
    surface's batch-checkable form; the same groupBy(window(...)) plan runs
    under Structured Streaming in
    graph_etl_pipeline_spark.streaming.jobs)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


@register(
    "win_session_batch",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
                    OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, ts, value,
               CAST(SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id,
           MIN(ts) AS session_start,
           COUNT(*) AS n_events,
           {osum(sdec('value'), "session_value")}
    FROM sessions
    GROUP BY user_id, session_id
    """,
    tags=("window", "streaming"),
)
def win_session_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4: sessionization, batch form (SURVEY §2.9 — gap-based sessions;
    the streaming twin uses session_window in streaming/jobs.py). Classic
    gaps-and-islands: flag gap starts with lag, prefix-sum the flags into
    session ids, aggregate per session. Gap compare is integer
    microseconds so both engines agree exactly."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    us = F.unix_micros(F.col("ts"))
    new_session = (
        F.when(
            (us - F.lag(us).over(w) > SESSION_GAP_US) | F.lag("ts").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_session")
    )
    return (
        ev.select("user_id", "ts", "event_id", "value", new_session)
        .withColumn("session_id", F.sum("new_session").over(wrun))
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("session_value"),
        )
    )


@register(
    "win_rank_frames",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS bal_rank,
           CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) OVER (
               PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
               ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING
           ) AS VARCHAR) AS DOUBLE) AS neighborhood_bal
    FROM customer
    """,
    tags=("window",),
)
def win_rank_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking + sliding ROWS frame in one pass: dense_rank per nation and
    a 3-row neighborhood sum (exact decimal) over the balance ordering —
    the remaining window shapes (beyond row_number/lag/unbounded) a
    reference user would reach for."""
    c = table(spark, sf_dir, "customer")
    w_rank = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    w_frame = (
        Window.partitionBy("c_nationkey")
        .orderBy("c_acctbal", "c_custkey")
        .rowsBetween(-1, 1)
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.dense_rank().over(w_rank).alias("bal_rank"),
        F.sum(dec("c_acctbal")).over(w_frame).cast("double").alias("neighborhood_bal"),
    )


@register(
    "win_asof_last_click",
    oracle="""
    WITH tagged AS (
        SELECT event_id, user_id, ts, event_type,
               CASE WHEN event_type = 'click' THEN ts END AS click_ts,
               CASE WHEN event_type = 'click' THEN event_id END AS click_id
        FROM events
        WHERE event_type IN ('click', 'purchase')
    ),
    filled AS (
        SELECT event_id, user_id, ts, event_type,
               last_value(click_ts IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS last_click_ts,
               last_value(click_id IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS last_click_id
        FROM tagged
    )
    SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
           last_click_ts, last_click_id
    FROM filled WHERE event_type = 'purchase'
    """,
    tags=("window", "asof"),
)
def win_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join, Spark-first: attach to every purchase the user's most
    recent click at or before it (attribution — the canonical as-of
    lookup). Spark has no ASOF JOIN operator; the naive translation is a
    non-equi range join (quadratic per user). This instead UNIONS both
    event roles into one stream and fill-forwards the click columns with
    last(..., ignorenulls) over (user_id, ts) — as-of semantics from ONE
    window over ONE shuffle on user_id, no join at all. At 100 TB the
    exchange carries each event exactly once, and skew follows user
    activity (bounded, saltable) rather than candidate-pair counts.

    Tie discipline: ordering is (ts, event_id) — a click at the exact
    purchase timestamp counts as "before" iff its event_id is lower,
    identically in both engines, so the row hash is deterministic."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    filled = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.last(click_ts, ignorenulls=True).over(w).alias("last_click_ts"),
        F.last(click_id, ignorenulls=True).over(w).alias("last_click_id"),
    )
    return filled.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "last_click_ts",
        "last_click_id",
    )


@register(
    "win_funnel_conversion",
    oracle="""
    WITH base AS (
        SELECT user_id, ts, event_id, event_type FROM events
        WHERE event_type IN ('signup', 'click', 'purchase')
    ),
    s1 AS (
        SELECT *, MIN(CASE WHEN event_type = 'signup' THEN ts END) OVER w AS t1p
        FROM base
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    s2 AS (
        SELECT *, MIN(CASE WHEN event_type = 'click' AND t1p IS NOT NULL
                           THEN ts END) OVER w AS t2p
        FROM s1
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    s3 AS (
        SELECT *, MIN(CASE WHEN event_type = 'purchase' AND t2p IS NOT NULL
                           THEN ts END) OVER w AS t3p
        FROM s2
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT user_id,
           MIN(t1p) AS t_signup,
           MIN(t2p) AS t_first_click,
           MIN(t3p) AS t_first_purchase,
           MIN(t3p) IS NOT NULL AS converted
    FROM s3
    GROUP BY user_id
    """,
    tags=("window", "funnel"),
)
def win_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-event funnel (signup → click → purchase) per user: each
    stage's attainment time is the earliest event of that type that
    happens AT OR AFTER the previous stage was attained. Implemented as
    three chained prefix-minimum windows over the same (user_id; ts,
    event_id) total order — a stage-k row is eligible only when the
    prefix already contains stage k-1 — then a per-user aggregate.
    Because every window AND the final groupBy share the user_id
    partitioning, Catalyst plans ONE exchange and ONE sort for the whole
    funnel: the scale cost is a single shuffle of the filtered event
    stream, not one join per stage (the naive funnel is k-1 self-joins).
    The prefix minima are monotonically non-increasing, so the group MIN
    equals the last row's value — no argmax trick needed."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("signup", "click", "purchase")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s1 = ev.withColumn(
        "t1p", F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w)
    )
    s2 = s1.withColumn(
        "t2p",
        F.min(
            F.when(
                (F.col("event_type") == "click") & F.col("t1p").isNotNull(),
                F.col("ts"),
            )
        ).over(w),
    )
    s3 = s2.withColumn(
        "t3p",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & F.col("t2p").isNotNull(),
                F.col("ts"),
            )
        ).over(w),
    )
    return s3.groupBy("user_id").agg(
        F.min("t1p").alias("t_signup"),
        F.min("t2p").alias("t_first_click"),
        F.min("t3p").alias("t_first_purchase"),
        F.min("t3p").isNotNull().alias("converted"),
    )


@register(
    "win_retention_cohorts",
    oracle="""
    WITH e AS (
        SELECT user_id,
               CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS wk
        FROM events
    ),
    c AS (
        SELECT user_id, wk, MIN(wk) OVER (PARTITION BY user_id) AS cohort_wk
        FROM e
    )
    SELECT cohort_wk AS cohort_week,
           wk - cohort_wk AS week_offset,
           COUNT(DISTINCT user_id) AS n_users
    FROM c
    GROUP BY cohort_wk, wk - cohort_wk
    """,
    tags=("window", "analytics"),
)
def win_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen week, counted in
    each later week they return — the canonical activity-analytics query
    over an event log.

    Week indexes are integer epoch-second divisions (epoch_day-style
    arithmetic), not date_trunc: an integer week index is timezone- and
    week-origin-independent, so Spark and the oracle agree bit-for-bit
    and results don't shift when a cluster runs in a different zone.

    Scale shape: ONE shuffle on user_id serves the first-seen window;
    the cohort/offset rollup re-aggregates (cohort, offset, user) partial
    distincts — both exchanges move integer triples, never event rows'
    payload columns (pruned at the scan)."""
    e = table(spark, sf_dir, "events").select(
        "user_id",
        # integer DIV, not double division + truncate: a double quotient
        # one ulp under an exact week boundary would round into the wrong
        # week; BIGINT // matches the oracle exactly
        F.expr("unix_timestamp(ts) DIV 604800").alias("wk"),
    )
    w = Window.partitionBy("user_id")
    c = e.withColumn("cohort_wk", F.min("wk").over(w))
    return (
        c.groupBy(
            F.col("cohort_wk").alias("cohort_week"),
            (F.col("wk") - F.col("cohort_wk")).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@register(
    "win_sliding_hourly",
    oracle=f"""
    WITH e AS (
        SELECT CAST(floor(epoch(ts)) AS BIGINT) // 900 AS e900,
               event_type, value
        FROM events
    ),
    x AS (
        SELECT make_timestamp(((e900 - k) * 900) * 1000000) AS window_start,
               event_type, value
        FROM e, generate_series(0, 3) AS g(k)
    )
    SELECT window_start, event_type,
           COUNT(*) AS n_events,
           {osum(sdec('value'), "sum_value")}
    FROM x
    GROUP BY window_start, event_type
    """,
    tags=("window", "streaming"),
)
def win_sliding_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 sibling: SLIDING (hopping) window aggregation — 1-hour windows
    advancing every 15 minutes, so each event lands in exactly 4
    overlapping windows (the oracle unrolls the same 4 memberships with
    integer epoch arithmetic). Completes the window family: tumbling
    (win_tumbling_hourly), session (win_session_batch), sliding (here).

    Scale shape: Spark expands each row to its 4 windows BEFORE the
    exchange and partial-aggregates per (window, type) map-side, so the
    shuffle carries partial sums, not a 4x event copy; the same plan runs
    under Structured Streaming where the watermark bounds how many open
    windows hold state."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "win_gapfill_hourly",
    oracle=f"""
    WITH bounds AS (
        SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
        FROM events
    ),
    grid AS (
        SELECT unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS window_start,
               et.event_type
        FROM bounds b, (SELECT DISTINCT event_type FROM events) et
    ),
    agg AS (
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               COUNT(*) AS n_events, {osum(sdec('value'), "sum_value")}
        FROM events GROUP BY 1, 2
    )
    SELECT g.window_start, g.event_type,
           COALESCE(a.n_events, 0) AS n_events,
           COALESCE(a.sum_value, 0.0) AS sum_value
    FROM grid g LEFT JOIN agg a
      ON a.window_start = g.window_start AND a.event_type = g.event_type
    """,
    tags=("window", "timeseries"),
)
def win_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series GAP FILL: the hourly per-type aggregate densified onto
    the full hour grid — missing (hour, type) cells emitted with zero
    counts (the hypertable `time_bucket_gapfill` operator; dashboards and
    window-over-time models need dense series, and silently absent rows
    are the classic downstream bug).

    Scale shape: the dense grid is GENERATED, not shuffled — one tiny
    global min/max aggregate (map-combined to a single row) feeds a
    sequence() explode of hours cross the distinct type list (both
    broadcast-sized: hours ≈ range/3600, types = domain cardinality);
    the real data contributes only its aggregated (hour, type) cells via
    a LEFT join from the grid. Cost is the hourly aggregate itself plus a
    grid-sized join — the fill never touches raw events a second time."""
    ev = table(spark, sf_dir, "events")
    agg = ev.groupBy(
        F.date_trunc("hour", "ts").alias("window_start"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec("value")).cast("double").alias("sum_value"),
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("window_start")
    )
    types = ev.select("event_type").distinct()
    grid = F.broadcast(hours).crossJoin(F.broadcast(types))
    return grid.join(agg, ["window_start", "event_type"], "left").select(
        "window_start",
        "event_type",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
    )


@register(
    "win_ohlc_resample",
    oracle="""
    WITH ordered AS (
        SELECT date_trunc('hour', ts) AS bar_ts, event_type, value,
               row_number() OVER (
                   PARTITION BY date_trunc('hour', ts), event_type
                   ORDER BY ts, event_id
               ) AS rn_a,
               row_number() OVER (
                   PARTITION BY date_trunc('hour', ts), event_type
                   ORDER BY ts DESC, event_id DESC
               ) AS rn_d
        FROM events
    )
    SELECT bar_ts, event_type,
           MIN(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MIN(CASE WHEN rn_d = 1 THEN value END) AS close,
           COUNT(*) AS n_ticks
    FROM ordered
    GROUP BY bar_ts, event_type
    """,
    tags=("window", "timeseries"),
)
def win_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series OHLC resampling — the bar-building primitive of every
    metrics/market pipeline: per (hour, series) emit the first (open),
    max (high), min (low), and last (close) value plus tick count. First/
    last are ORDER-DEFINED (ts, then event_id as the deterministic
    tiebreak for same-microsecond ticks), implemented with min_by/max_by
    over the composite (ts, event_id) key — one aggregation with map-side
    partials and ONE exchange, no window function (min_by/max_by plan as
    SortAggregate, so the per-partition grouping sorts are the
    aggregation's own): at 100 TB the bar table build is a plain
    shuffle-agg whose partial states are 4 scalars per bar. The oracle derives open/close independently via dual
    row_numbers."""
    ev = table(spark, sf_dir, "events")
    bar = F.date_trunc("hour", "ts").alias("bar_ts")
    okey = F.struct(F.col("ts"), F.col("event_id"))
    return ev.groupBy(bar, "event_type").agg(
        F.min_by("value", okey).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", okey).alias("close"),
        F.count(F.lit(1)).alias("n_ticks"),
    )


EWMA_ALPHA_NUM, EWMA_ALPHA_DEN = 1, 4  # α = 0.25 as an exact ratio


@register(
    "win_ewma_by_user",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, ts, event_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    ),
    folded AS (
        SELECT user_id,
               list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                                list(CAST(value AS DOUBLE) ORDER BY rn)),
                   (acc, v) -> acc + ({EWMA_ALPHA_NUM}.0 / {EWMA_ALPHA_DEN}) * (v - acc)
               ) AS ewma,
               COUNT(*) AS n
        FROM ordered GROUP BY user_id
    )
    SELECT user_id, n, ewma FROM folded
    """,
    tags=("window", "timeseries"),
)
def win_ewma_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average per user — the smoothing
    recurrence s ← s + α(v − s) that window frames cannot express (each
    step depends on the previous OUTPUT, not a frame of inputs). Both
    engines run the IDENTICAL SEQUENTIAL FOLD over the identically-ordered
    (ts, event_id) value list — the engine's established determinism tool
    for order-dependent float math (same as the cosine folds), so the
    result is bit-stable across engines and partitionings even though
    float addition is not associative.

    Scale shape: one user_id exchange; collect_list is per-user bounded
    (a user's event history), and the fold is map-side on the aggregated
    array. Seeded at 0.0 so the recurrence is total with no
    first-element special case."""
    ev = table(spark, sf_dir, "events")
    alpha = F.lit(EWMA_ALPHA_NUM / EWMA_ALPHA_DEN)
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("value")))
    )
    vals = F.transform(ordered, lambda s: s.getField("value").cast("double"))
    ewma = F.aggregate(
        vals, F.lit(0.0), lambda acc, v: acc + alpha * (v - acc)
    )
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), ewma.alias("ewma")
    )


@register(
    "win_running_distinct",
    oracle="""
    SELECT user_id, event_id, ts,
           CAST(SUM(first_seen) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_distinct_types
    FROM (
        SELECT user_id, event_id, ts,
               CASE WHEN ROW_NUMBER() OVER (
                   PARTITION BY user_id, event_type ORDER BY ts, event_id
               ) = 1 THEN 1 ELSE 0 END AS first_seen
        FROM events
    )
    """,
    tags=("window", "distinct"),
)
def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RUNNING DISTINCT count per user — "how many distinct event types
    has this user touched as of each event", the feature-engineering
    window SQL engines refuse head-on (COUNT(DISTINCT) OVER a running
    frame is unsupported in Spark and most engines because distinct
    state per frame is unbounded). The standard rewrite makes it two
    cheap windows: flag each row that is the FIRST occurrence of its
    (user, type) — row_number = 1 over the (user, type) ordering — then
    a running SUM of the flags over the (user) ordering. Distinct state
    never materializes; both windows are exact integers with total
    (ts, event_id) tie-breaks.

    Scale shape: ONE exchange. Left to EnsureRequirements, Spark plans
    hashpartitioning(user, type) for the first window and then a SECOND
    user-only exchange for the running sum; the explicit
    repartition(user_id) below satisfies BOTH windows' clustering
    (hash(user) ⊆ hash(user, type) in Spark's satisfaction rule), so the
    plan degrades to one shuffle + two in-partition sorts —
    test_plans.test_running_distinct_single_exchange pins it. Per-task
    memory is one counter; the 100 TB caveat is a single user with
    unbounded history — the same hot-key story every per-user window in
    the module shares (win_lag_running_sum)."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events").repartition("user_id")
    first_seen = F.when(
        F.row_number().over(
            W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
        )
        == 1,
        1,
    ).otherwise(0)
    run = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return ev.select(
        "user_id", "event_id", "ts", first_seen.alias("first_seen")
    ).select(
        "user_id",
        "event_id",
        "ts",
        F.sum("first_seen").over(run).alias("n_distinct_types"),
    )


@register(
    "win_max_drawdown",
    oracle="""
    WITH c AS (
        SELECT user_id, ts, event_id,
               SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER w AS equity
        FROM events WHERE event_type = 'purchase'
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    d AS (
        SELECT user_id, ts, equity,
               MAX(equity) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        FROM c
    )
    SELECT user_id,
           CAST(MAX(peak - equity) AS BIGINT) AS max_drawdown_cents,
           CAST(MAX(equity) AS BIGINT) AS peak_equity_cents,
           CAST(COUNT(*) AS BIGINT) AS n_points
    FROM d GROUP BY user_id
    """,
    tags=("window", "timeseries"),
)
def win_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAXIMUM DRAWDOWN per user — the risk metric every equity-curve /
    KPI-trend monitor reports: the deepest peak-to-trough drop of the
    cumulative series. Three chained exact steps on integer cents: a
    running sum builds the equity curve, a running MAX tracks the peak,
    and max(peak − equity) per user is the drawdown — the two running
    windows and the final aggregate all share ONE user-keyed sort
    (Spark plans a single Exchange + in-partition sorts, the
    win_running_distinct pattern; same hot-user caveat).

    Quantization is floor(x·100 + 0.5) pinned identically in both
    engines (the sink_time_travel_read convention) so the running sums
    never see a float."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).repartition("user_id")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    run = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    curve = ev.select(
        "user_id", "ts", "event_id", F.sum(cents).over(run).alias("equity")
    )
    curve = curve.select(
        "user_id",
        "ts",
        "equity",
        F.max("equity").over(
            W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
                W.unboundedPreceding, W.currentRow
            )
        ).alias("peak"),
    )
    return curve.groupBy("user_id").agg(
        F.max(F.col("peak") - F.col("equity")).alias("max_drawdown_cents"),
        F.max("equity").alias("peak_equity_cents"),
        F.count(F.lit(1)).alias("n_points"),
    )


@register(
    "win_rolling_range_1h",
    oracle="""
    SELECT user_id, event_id, ts,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS roll_1h_cents,
           CAST(COUNT(*) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS roll_1h_n
    FROM events WHERE event_type = 'purchase'
    """,
    tags=("window", "timeseries"),
)
def win_rolling_range_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVENT-ANCHORED rolling window — RANGE frames, the third windowing
    semantics after tumbling/sliding grids (win_sliding_hourly) and row
    frames (win_lag_running_sum): each event looks back exactly one
    hour FROM ITS OWN timestamp, so the frame boundary moves with the
    data, not a grid — the "spend in the last hour" fraud/velocity
    check that grid windows approximate with up-to-one-bucket error.
    Spark has no INTERVAL range frames, but an integer range frame over
    epoch seconds is the same thing exactly (rangeBetween(-3600, 0) on
    unix_timestamp); DuckDB runs the genuine INTERVAL frame — the hash
    row proves the two formulations coincide row for row, ties
    included (RANGE frames include ALL rows at equal ts, so no
    event_id tie-break is needed — or valid — in the ORDER BY).

    Integer cents (the pinned floor(x·100+0.5) quantize) keep the sums
    exact; one user-keyed exchange, one sort, both aggregates share
    the frame."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(cents).over(w).alias("roll_1h_cents"),
        F.count(F.lit(1)).over(w).alias("roll_1h_n"),
    )


@register(
    "win_share_of_parent",
    oracle=f"""
    WITH rev AS (
        SELECT r_name, n_name,
               SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                   * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS rv
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    )
    SELECT r_name, n_name,
           CAST(CAST(rv AS VARCHAR) AS DOUBLE) AS revenue,
           CAST((100000 * CAST(CAST(rv * 1000000 AS HUGEINT) AS HUGEINT))
                // SUM(CAST(rv * 1000000 AS HUGEINT))
                   OVER (PARTITION BY r_name) AS BIGINT) AS share_of_region_c%,
           CAST((100000 * CAST(CAST(rv * 1000000 AS HUGEINT) AS HUGEINT))
                // SUM(CAST(rv * 1000000 AS HUGEINT)) OVER () AS BIGINT)
               AS share_of_total_c%
    FROM rev
    """.replace("c%", "permyriad"),
    tags=("window", "agg"),
)
def win_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTRIBUTION analysis — percent-of-parent and percent-of-total in
    one pass, the report-layer verb behind every drill-down ("France is
    31% of Europe, 6% of world revenue"): unordered window SUMs over
    the AGGREGATED nation×region table partition by region and
    globally, and each share is an exact integer division of exact
    decimal sums (scaled to 1/100 of a percent — permyriad×10 — so no
    float ratio enters the hash).

    Plan: the heavy work is the star join + 25-row aggregation the
    flagship already prices; both window sums then run over 25 rows —
    the global one is the documented single-partition small-profile
    trade. Exact decimals make share_of_region sum to ≤100 000 per
    region by construction."""
    from pyspark.sql import Window as W

    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey", "n_name")
    r = table(spark, sf_dir, "region")
    rev = (
        li.select("l_orderkey", (dec(li.l_extendedprice) * (F.lit(1) - dec(li.l_discount))).alias("rv"))
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum("rv").alias("rv"))
    )
    w_region = W.partitionBy("r_name")
    w_all = W.partitionBy()
    # Integer micros for the share division: DuckDB's `//` on DECIMAL
    # routes through doubles (off-by-one at quotient boundaries); exact
    # int128/decimal integer division matches bit-for-bit.
    rev = rev.withColumn(
        "rv_micros", (F.col("rv") * 1000000).cast("decimal(38,0)")
    )
    return rev.select(
        "r_name",
        "n_name",
        F.col("rv").cast("double").alias("revenue"),
        F.expr(
            "CAST((100000 * rv_micros)"
            " DIV SUM(rv_micros) OVER (PARTITION BY r_name) AS BIGINT)"
        ).alias("share_of_region_permyriad"),
        F.expr(
            "CAST((100000 * rv_micros) DIV SUM(rv_micros) OVER () AS BIGINT)"
        ).alias("share_of_total_permyriad"),
    )


# --- Rolling z-score anomaly flags -------------------------------------------
ZSCORE_LOOKBACK = 10  # trailing events per user forming the reference window
ZSCORE_MIN_N = 5      # minimum history before a verdict is allowed
ZSCORE_T2 = 9         # z² threshold (3σ)


@register(
    "win_rolling_zscore_outliers",
    oracle=f"""
    WITH c AS (
        SELECT event_id, user_id, ts,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    w AS (
        SELECT event_id, user_id, cents,
               CAST(COUNT(*) OVER win AS BIGINT) AS n,
               CAST(COALESCE(SUM(cents) OVER win, 0) AS BIGINT) AS s1,
               CAST(COALESCE(SUM(cents * cents) OVER win, 0) AS BIGINT) AS s2
        FROM c
        WINDOW win AS (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN {ZSCORE_LOOKBACK} PRECEDING AND 1 PRECEDING
        )
    )
    SELECT event_id, user_id, cents, n AS n_prior,
           (n * cents - s1) * (n * cents - s1) AS z2_num,
           {ZSCORE_T2} * (n * s2 - s1 * s1) AS z2_den,
           (n >= {ZSCORE_MIN_N}
            AND n * s2 - s1 * s1 > 0
            AND (n * cents - s1) * (n * cents - s1)
                > {ZSCORE_T2} * (n * s2 - s1 * s1)) AS is_anomaly
    FROM w
    """,
    tags=("window", "stats", "quality"),
)
def win_rolling_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity rolling z-score anomaly flags — the velocity/outlier
    check a monitoring pipeline runs on every event stream ("is this
    value 3σ off the user's own recent behavior?"), complementing the
    corpus-global robust stats of ``agg_mad_outliers``. The reference
    window is the {ZSCORE_LOOKBACK} events BEFORE the current one
    (ROWS ... 1 PRECEDING — the verdict never sees the value it
    judges), and the test is the exact integer inequality
    (n·x − s1)² > {ZSCORE_T2}·(n·s2 − s1²), which is z² > {ZSCORE_T2}
    with both sides multiplied by n²·σ² — no division, no sqrt, no
    floats, so the flags are bit-identical across engines and
    partitionings. Degenerate histories (n < {ZSCORE_MIN_N}, zero
    variance) flag false rather than dividing by zero.

    Plan: ONE window exchange on user_id; the frame is row-bounded so
    state per task is O({ZSCORE_LOOKBACK}), and magnitudes are bounded
    by the frame (|n·x−s1| ≤ 2·n·max_cents ⇒ int64 holds to
    max_cents ~ 10⁸ at this lookback) independent of corpus size —
    the same plan runs at 100 TB with per-user history parallelism.
    The streaming twin is the applyInPandasWithState running-aggregate
    job (streaming/jobs.py) with a ring buffer per key."""
    c = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    win = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-ZSCORE_LOOKBACK, -1)
    )
    w = c.select(
        "event_id",
        "user_id",
        "cents",
        F.count(F.lit(1)).over(win).alias("n"),
        F.coalesce(F.sum("cents").over(win), F.lit(0)).alias("s1"),
        F.coalesce(F.sum(F.col("cents") * F.col("cents")).over(win), F.lit(0)).alias(
            "s2"
        ),
    )
    num = (F.col("n") * F.col("cents") - F.col("s1")) * (
        F.col("n") * F.col("cents") - F.col("s1")
    )
    den = F.lit(ZSCORE_T2) * (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
    return w.select(
        "event_id",
        "user_id",
        "cents",
        F.col("n").alias("n_prior"),
        num.alias("z2_num"),
        den.alias("z2_den"),
        (
            (F.col("n") >= ZSCORE_MIN_N)
            & (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1") > 0)
            & (num > den)
        ).alias("is_anomaly"),
    )


# --- Interval-union coverage ---------------------------------------------------
COVER_HOLD_US = 600 * 1_000_000  # each event holds a resource for 10 minutes


@register(
    "win_interval_union_length",
    oracle=f"""
    WITH iv AS (
        SELECT user_id,
               epoch_us(ts) AS s,
               epoch_us(ts) + {COVER_HOLD_US} AS e,
               event_id
        FROM events
    ),
    marked AS (
        SELECT user_id, s, e, event_id,
               CASE WHEN s > COALESCE(MAX(e) OVER (
                        PARTITION BY user_id ORDER BY s, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        CAST('-9223372036854775808' AS BIGINT))
                    THEN 1 ELSE 0 END AS new_island
        FROM iv
    ),
    islands AS (
        SELECT user_id, s, e,
               SUM(new_island) OVER (
                   PARTITION BY user_id ORDER BY s, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM marked
    ),
    per_island AS (
        SELECT user_id, island,
               MAX(e) - MIN(s) AS len_us
        FROM islands GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(len_us) AS BIGINT) AS covered_us
    FROM per_island GROUP BY user_id
    """,
    tags=("window", "interval"),
)
def win_interval_union_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL-UNION coverage — total time actually covered by
    overlapping per-event hold intervals, per user (usage metering,
    license/seat billing, on-call coverage: double-booked minutes must
    count ONCE). Each event holds [ts, ts+10 min); the union length is
    the classic interval-merge: an interval starts a new ISLAND when its
    start exceeds the running max end of everything before it (the
    gaps-and-islands trick win_session_batch uses for inactivity gaps,
    here applied to interval OVERLAP), islands then aggregate to
    max(end) − min(start). A naive formulation self-joins intervals per
    user (quadratic in events/user); this is ONE ordered window + one
    aggregation on a single user_id exchange.

    Integer epoch-MICROSECOND arithmetic end to end (epoch() seconds are
    a DOUBLE with fractional parts in DuckDB while Spark's
    unix_timestamp floors — the ±1 s drift the first cut of this query
    hit); ordering carries the
    (s, event_id) unique tie-break, so island numbering — and therefore
    the hash row — is engine-identical under any partitioning. At
    100 TB: the exchange carries each event once, skew follows per-user
    event counts (saltable the usual way); the running-max frame is
    O(1) state per row."""
    us = F.unix_micros("ts")
    iv = table(spark, sf_dir, "events").select(
        "user_id",
        us.alias("s"),
        (us + COVER_HOLD_US).alias("e"),
        "event_id",
    )
    w_prior = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = iv.select(
        "user_id",
        "s",
        "e",
        "event_id",
        F.when(
            F.col("s")
            > F.coalesce(
                F.max("e").over(w_prior),
                F.lit(-9223372036854775808).cast("long"),
            ),
            1,
        )
        .otherwise(0)
        .alias("new_island"),
    )
    # BOTH windows share the (s, event_id) total order: island numbering
    # under an (s, e)-tie would otherwise be engine-dependent (two events
    # at one timestamp give one new_island=1 row and one =0 row — an
    # arbitrary tie order could attach the 0-row to the PREVIOUS island).
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    islands = marked.select(
        "user_id", "s", "e", F.sum("new_island").over(w_run).alias("island")
    )
    per_island = islands.groupBy("user_id", "island").agg(
        (F.max("e") - F.min("s")).alias("len_us")
    )
    return per_island.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum("len_us").alias("covered_us"),
    )


# --- Exact rolling median ------------------------------------------------------
ROLLMED_PRECEDING = 6  # window = 6 preceding events + current (7 total)


@register(
    "win_rolling_median_exact",
    oracle=f"""
    WITH v AS (
        SELECT event_id, user_id, ts,
               CAST(FLOOR(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    w AS (
        SELECT event_id, user_id, cents,
               list(cents) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN {ROLLMED_PRECEDING} PRECEDING AND CURRENT ROW
               ) AS l
        FROM v
    )
    SELECT event_id, user_id, cents,
           CAST(len(l) AS BIGINT) AS n_in_window,
           CAST(list_extract(list_sort(l),
                             CAST((len(l) + 1) // 2 AS BIGINT)) AS BIGINT)
               AS med_cents
    FROM w
    """,
    tags=("window", "robust"),
)
def win_rolling_median_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT rolling median of event value over the trailing
    {ROLLMED_PRECEDING}+1-row window per user — the robust smoother a
    monitoring pipeline wants where a rolling MEAN is one spike away
    from useless (win_ewma_by_user decays outliers; this IGNORES them
    outright). Median of an even-sized prefix is pinned to the LOWER
    middle order statistic (element (n+1) div 2 of the sorted frame), so
    every output is a value that actually occurred — no between-engines
    midpoint averaging, no floats: values ride as floor-cents integers
    (IEEE double multiply + floor is bit-identical in both engines) and
    the frame order carries the (ts, event_id) unique tie-break.

    Plan: collect_list over a BOUNDED ROWS frame + array_sort +
    element_at — O(k) state per row and k log k work inside whole-stage
    codegen, one exchange on user_id. This is the right shape precisely
    BECAUSE the frame is bounded (k = {ROLLMED_PRECEDING}+1); for
    unbounded or range frames the sort cost compounds and the scale
    path is percentile_approx's mergeable sketch
    (agg_approx_quantiles' contract pattern)."""
    v = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-ROLLMED_PRECEDING, Window.currentRow)
    )
    frame = v.select(
        "event_id",
        "user_id",
        "cents",
        F.collect_list("cents").over(w).alias("l"),
    )
    sorted_l = F.array_sort(F.col("l"))
    return frame.select(
        "event_id",
        "user_id",
        "cents",
        F.size("l").cast("long").alias("n_in_window"),
        F.element_at(sorted_l, ((F.size("l") + 1) / 2).cast("int")).alias(
            "med_cents"
        ),
    )


# --- Multi-touch attribution --------------------------------------------------
ATTR_UNIT = 1_000_000  # conversion value quantized once to micro-units


@register(
    "win_attribution_multitouch",
    oracle=f"""
    WITH base AS (
        SELECT event_id, user_id, ts, event_type,
               CAST(FLOOR(value * {ATTR_UNIT} + 0.5) AS BIGINT) AS vmic
        FROM events
        WHERE event_type IN ('click', 'view', 'purchase')
    ),
    assigned AS (
        SELECT event_id, user_id, ts, event_type,
               last_value(CASE WHEN event_type = 'purchase' THEN event_id END
                          IGNORE NULLS) OVER w AS purchase_id,
               last_value(CASE WHEN event_type = 'purchase' THEN vmic END
                          IGNORE NULLS) OVER w AS value_micro
        FROM base
        WINDOW w AS (PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    touches AS (
        SELECT event_id AS touch_id, user_id, ts,
               event_type AS touch_type, purchase_id, value_micro
        FROM assigned
        WHERE event_type <> 'purchase' AND purchase_id IS NOT NULL
    ),
    pos AS (
        SELECT *,
               row_number() OVER (PARTITION BY purchase_id
                                  ORDER BY ts, touch_id) AS pos,
               COUNT(*) OVER (PARTITION BY purchase_id) AS n_touches
        FROM touches
    )
    SELECT purchase_id, user_id, touch_id, touch_type, pos, n_touches,
           value_micro * (CASE WHEN pos = n_touches THEN n_touches + 2
                               ELSE pos + 1 END) // (n_touches + 2)
           - value_micro * (CASE WHEN pos = 1 THEN 0 ELSE pos END)
             // (n_touches + 2) AS credit_micro
    FROM pos
    """,
    tags=("window", "analytics", "attribution"),
)
def win_attribution_multitouch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-SHAPED MULTI-TOUCH ATTRIBUTION with exact credit conservation —
    the one-to-many generalization of win_asof_last_click's last-touch
    lookup: every click/view is credited to the user's NEXT purchase
    (the inter-conversion scope), and the purchase's value splits across
    its touches positionally — first and last touch carry double weight
    (w=2), middles w=1, the canonical U-shape.

    Two exactness disciplines make the row hash-stable at any scale:
    (1) the value is quantized ONCE to integer micro-units; (2) credits
    come from the CUMULATIVE-FLOOR TELESCOPE — credit(pos) =
    v·cumw(pos) DIV W − v·cumw(pos−1) DIV W, where cumw is the running
    weight prefix and W = n+2 the total. The telescope collapses to
    v·W DIV W = v, so per-purchase credits sum EXACTLY to the purchase
    value with no remainder bookkeeping, no second pass, and no
    largest-remainder tie rules — conservation is an algebraic identity,
    not a reconciliation step.

    Scale shape: the naive formulation is a per-user range join
    (touch × next purchase — quadratic in bursts). This is two windows
    instead: touch→purchase assignment rides ONE shuffle on user_id
    (reverse-order last_value fill, the as-of trick), positioning rides
    ONE shuffle on purchase_id. Each event crosses the wire once per
    exchange; per-task width is bounded by one user's / one
    inter-purchase gap's events, never by candidate pairs. Touches after
    a user's final purchase attribute to nothing and drop out, same as
    the oracle."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view", "purchase")
    )
    vmic = F.floor(F.col("value") * ATTR_UNIT + F.lit(0.5)).cast("long")
    wdesc = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_p = F.col("event_type") == "purchase"
    assigned = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.last(F.when(is_p, F.col("event_id")), ignorenulls=True)
        .over(wdesc)
        .alias("purchase_id"),
        F.last(F.when(is_p, vmic), ignorenulls=True)
        .over(wdesc)
        .alias("value_micro"),
    )
    touches = assigned.filter(
        (F.col("event_type") != "purchase") & F.col("purchase_id").isNotNull()
    ).select(
        F.col("event_id").alias("touch_id"),
        "user_id",
        "ts",
        F.col("event_type").alias("touch_type"),
        "purchase_id",
        "value_micro",
    )
    wpos = Window.partitionBy("purchase_id").orderBy("ts", "touch_id")
    wall = Window.partitionBy("purchase_id")
    pos = F.row_number().over(wpos).cast("long")
    n = F.count(F.lit(1)).over(wall)
    ranked = touches.select(
        "purchase_id",
        "user_id",
        "touch_id",
        "touch_type",
        pos.alias("pos"),
        n.alias("n_touches"),
        "value_micro",
    )
    w_tot = F.col("n_touches") + F.lit(2)
    cumw = F.when(F.col("pos") == F.col("n_touches"), w_tot).otherwise(
        F.col("pos") + 1
    )
    cumw_prev = F.when(F.col("pos") == 1, F.lit(0)).otherwise(F.col("pos"))
    credit = F.expr(
        "value_micro * cw DIV wt - value_micro * cwp DIV wt"
    )
    return (
        ranked.withColumn("cw", cumw)
        .withColumn("cwp", cumw_prev)
        .withColumn("wt", w_tot)
        .select(
            "purchase_id",
            "user_id",
            "touch_id",
            "touch_type",
            "pos",
            "n_touches",
            credit.alias("credit_micro"),
        )
    )


# --- CUSUM drift alarm ----------------------------------------------------------
CUSUM_DRIFT_CENTS = 5_000  # per-event reference drift k (allowance), in cents
CUSUM_ALARM_CENTS = 50_000  # alarm threshold h, in cents


@register(
    "win_cusum_alarm",
    oracle=f"""
    WITH x AS (
        SELECT user_id, ts, event_id,
               CAST(round(value * 100) AS BIGINT) - {CUSUM_DRIFT_CENTS} AS exc
        FROM events
    ),
    pref AS (
        SELECT user_id, ts, event_id,
               SUM(exc) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
        FROM x
    ),
    floored AS (
        SELECT user_id, ts, event_id, p,
               LEAST(MIN(p) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ), 0) AS floor_p
        FROM pref
    )
    SELECT user_id, ts, event_id,
           CAST(p - floor_p AS BIGINT) AS cusum_cents,
           p - floor_p >= {CUSUM_ALARM_CENTS} AS alarm
    FROM floored
    """,
    tags=("window", "analytics", "drift"),
)
def win_cusum_alarm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-SIDED CUSUM DRIFT DETECTOR (Page's cumulative-sum chart) per
    user: S_0 = 0, S_n = max(0, S_{{n-1}} + (x_n − k)) with allowance
    k = {CUSUM_DRIFT_CENTS} cents, alarm when S_n ≥ h =
    {CUSUM_ALARM_CENTS} — the classic sequential change-point monitor
    for spend/latency drift that a mean-shift z-score misses.

    The recurrence looks inherently sequential (each S_n needs
    S_{{n-1}}), but it has a closed form over prefixes: with
    P_n = Σ_{{i≤n}}(x_i − k) and P_0 = 0,
        S_n = P_n − min(0, min_{{j≤n}} P_j)
    — the reflected-at-zero walk equals the walk minus its running
    floor (S_n = max_{{0≤j≤n}}(P_n − P_j), the j=n term giving the
    max(0, ·) clamp). So the whole detector is TWO chained window
    functions (running sum, then running min of that sum, clamped to
    the empty-prefix 0) on ONE (user_id) exchange —
    the win_max_drawdown machinery pointed at drift — instead of a
    per-user sequential fold. Everything is exact integer cents, so the
    alarm bit is hash-identical in both engines at any partitioning.

    At 100 TB: one shuffle on user_id, per-task width bounded by one
    user's history; the production variant windows the same expressions
    over a bounded trailing frame to cap state."""
    ev = table(spark, sf_dir, "events")
    exc = (F.round(F.col("value") * 100).cast("long") - F.lit(CUSUM_DRIFT_CENTS))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_p = ev.select(
        "user_id", "ts", "event_id", F.sum(exc).over(w).alias("p")
    )
    floor_p = F.least(F.min("p").over(w), F.lit(0))
    s = F.col("p") - floor_p
    return with_p.select(
        "user_id",
        "ts",
        "event_id",
        s.cast("long").alias("cusum_cents"),
        (s >= CUSUM_ALARM_CENTS).alias("alarm"),
    )
