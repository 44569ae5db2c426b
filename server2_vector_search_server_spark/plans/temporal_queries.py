"""Temporal-join queries: as-of join and bucketed range join over events.

DuckDB's native ``ASOF JOIN`` and a plain inequality join serve as oracles
for the distributed implementations in ``operators/temporal.py`` — the Spark
side must produce the same pairs through its shuffle-friendly rewrites
(union + carry-forward window; bucket equi-join + refine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from server2_vector_search_server_spark.operators.temporal import (
    asof_join, bucketed_range_join,
)
from server2_vector_search_server_spark.plans.registry import (
    exact_sum,
    query,
    sql_exact_sum,
    tbl,
)


@query(
    "events_asof_join",
    survey="C-extension(as-of join: latest right row at-or-before each left ts)",
    oracle="""
    WITH purch AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MAX(value) AS last_purchase
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, ts)
    SELECT e.event_id, e.user_id, e.event_type, p.last_purchase
    FROM (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
          FROM events) e
    ASOF LEFT JOIN purch p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    ORDER BY e.event_id
    """,
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attach each event's most recent purchase value (same user, ts <= event
    ts). One shuffle on user_id; checked against DuckDB's native ASOF JOIN."""
    events = tbl(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase") \
                      .select("user_id", "ts", "value")
    return (
        asof_join(events.select("event_id", "user_id", "event_type", "ts"),
                  purchases, on="ts", by="user_id",
                  value_col="value", out_col="last_purchase")
        .select("event_id", "user_id", "event_type", "last_purchase")
        .orderBy("event_id")
    )


@query(
    "events_range_join_counts",
    survey="C-extension(range join: trailing-band pairs via bucket equi-join)",
    oracle="""
    SELECT p.event_id, COUNT(c.event_id) AS n_recent_clicks
    FROM events p
    LEFT JOIN events c
      ON c.user_id = p.user_id AND c.event_type = 'click'
     AND CAST(c.ts AS TIMESTAMP)
         BETWEEN CAST(p.ts AS TIMESTAMP) - INTERVAL 600 SECOND
             AND CAST(p.ts AS TIMESTAMP)
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id
    ORDER BY p.event_id
    """,
)
def events_range_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clicks in the 10 minutes before each purchase (same user). The naive
    inequality join is quadratic (BroadcastNestedLoopJoin); the bucketed
    rewrite shuffles each side ≤2× on (user_id, bucket)."""
    events = tbl(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase") \
                      .select("event_id", "user_id", "ts")
    clicks = events.filter(F.col("event_type") == "click") \
                   .select("event_id", "user_id", "ts")
    pairs = bucketed_range_join(purchases, clicks, on="ts", by="user_id",
                                width_seconds=600)
    counts = pairs.groupBy("event_id") \
                  .agg(F.count(F.col("event_id_r")).alias("n_recent_clicks"))
    return (
        purchases.join(counts, "event_id", "left")
        .select("event_id",
                F.coalesce("n_recent_clicks", F.lit(0)).alias("n_recent_clicks"))
        .orderBy("event_id")
    )


# --- gaps-and-islands + multi-granularity rollup (wave 6) -------------------

_EPOCH = "2024-01-01"


@query(
    "events_longest_streak",
    survey="north-star event analytics (gaps-and-islands: longest run of "
           "consecutive active days per user)",
    oracle=f"""
    WITH days AS (
      SELECT DISTINCT user_id,
             date_diff('day', DATE '{_EPOCH}', CAST(ts AS DATE)) AS d
      FROM events),
    isl AS (
      SELECT user_id, d,
             d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS grp
      FROM days),
    streaks AS (
      SELECT user_id, grp, COUNT(*) AS len
      FROM isl GROUP BY user_id, grp)
    SELECT user_id,
           CAST(MAX(len) AS INTEGER) AS longest_streak_days,
           CAST(COUNT(*) AS INTEGER) AS n_streaks
    FROM streaks GROUP BY user_id ORDER BY user_id
    """,
)
def events_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic gaps-and-islands rewrite: day_index − row_number() is
    constant exactly within a consecutive run, so islands fall out of one
    window + one aggregate — no self-join, no iteration. All three hops
    (distinct, window, groupBy) partition on user_id, so AQE coalesces them
    onto one exchange of (user, day) rows."""
    from pyspark.sql import Window

    ev = tbl(spark, sf_dir, "events")
    days = (ev.select(
        "user_id",
        F.datediff(F.col("ts").cast("date"),
                   F.lit(_EPOCH).cast("date")).alias("d"))
        .distinct())
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.withColumn("grp", F.col("d") - F.row_number().over(w))
    streaks = (isl.groupBy("user_id", "grp")
               .agg(F.count(F.lit(1)).alias("len")))
    return (streaks.groupBy("user_id")
            .agg(F.max("len").cast("int").alias("longest_streak_days"),
                 F.count(F.lit(1)).cast("int").alias("n_streaks"))
            .orderBy("user_id"))


@query(
    "events_multi_grain_rollup",
    survey="I-extension(hypertable-style continuous aggregate: day/week/"
           "month grains from ONE scan via GROUPING SETS)",
    oracle=f"""
    WITH g AS (
      SELECT date_diff('day', DATE '{_EPOCH}', CAST(ts AS DATE)) AS day_idx,
             CAST(floor(date_diff('day', DATE '{_EPOCH}',
                                  CAST(ts AS DATE)) / 7.0) AS BIGINT)
               AS week_idx,
             ((EXTRACT(year FROM CAST(ts AS DATE)) - 2024) * 12
              + EXTRACT(month FROM CAST(ts AS DATE)) - 1) AS month_idx,
             value
      FROM events)
    SELECT CASE WHEN GROUPING(day_idx) = 0 THEN 'day'
                WHEN GROUPING(week_idx) = 0 THEN 'week'
                ELSE 'month' END AS grain,
           CAST(COALESCE(day_idx, week_idx, month_idx) AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_exact_sum('value', 2)} AS total_value
    FROM g
    GROUP BY GROUPING SETS ((day_idx), (week_idx), (month_idx))
    ORDER BY grain, bucket
    """,
)
def events_multi_grain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TimescaleDB-style multi-granularity rollup (day + week + month) in
    ONE scan: GROUPING SETS Expands each row 3× — but counts and the scaled
    exact sum are partial-aggregable, so each exchange carries only
    bucket-sized partials, not the 3× row blowup (SCALE.md §17 logic). At
    100 TB this replaces three separate scans with one."""
    ev = tbl(spark, sf_dir, "events")
    day = F.datediff(F.col("ts").cast("date"), F.lit(_EPOCH).cast("date"))
    g = ev.select(
        day.alias("day_idx"),
        F.floor(day / 7.0).alias("week_idx"),
        ((F.year(F.col("ts").cast("date")) - 2024) * 12
         + F.month(F.col("ts").cast("date")) - 1).cast("long")
        .alias("month_idx"),
        "value")
    return (g.groupingSets([["day_idx"], ["week_idx"], ["month_idx"]],
                           "day_idx", "week_idx", "month_idx")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 exact_sum(F.col("value"), 2).alias("total_value"),
                 # grouping() is an aggregate-context expression in Spark —
                 # materialize the bits here, build the label outside
                 F.grouping("day_idx").alias("g_day"),
                 F.grouping("week_idx").alias("g_week"))
            .select(
                F.when(F.col("g_day") == 0, F.lit("day"))
                .when(F.col("g_week") == 0, F.lit("week"))
                .otherwise(F.lit("month")).alias("grain"),
                F.coalesce("day_idx", "week_idx", "month_idx")
                .cast("long").alias("bucket"),
                "n_events", "total_value")
            .orderBy("grain", "bucket"))


@query(
    "events_ewma_by_user",
    survey="E/I-extension(inherently-sequential per-entity state: EWMA as "
           "a JVM higher-order aggregate fold over the per-key ordered "
           "array, vs an ordered list_reduce oracle)",
    oracle="""
    -- same left fold: seed = first value in (ts, event_id) order, then
    -- acc' = alpha*x + (1-alpha)*acc — identical float op sequence
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(list_reduce(list(value ORDER BY ts, event_id),
                             (acc, x) -> 0.2 * x + 0.8 * acc), 6) AS ewma
    FROM events
    WHERE user_id < 300
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def events_ewma_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA (alpha=0.2) of each user's event values — a loop-carried
    recursion no window frame expresses, run as a JVM higher-order
    ``aggregate`` fold over the per-user ordered array
    (operators/temporal.ewma_by_key): one shuffle on user_id, the fold
    entirely inside codegen'd expressions — the round-10 guide-§4 rewrite
    of the former applyInPandas form, whose Python boundary was 84% of
    the pillar wall. The oracle folds the same ordered list with
    list_reduce; both sides execute the identical float sequence, so the
    rounded values hash-match."""
    from server2_vector_search_server_spark.operators.temporal import (
        ewma_by_key,
    )

    events = tbl(spark, sf_dir, "events").filter(F.col("user_id") < 300)
    out = ewma_by_key(events, alpha=0.2)
    return (out.select("user_id", "n_events",
                       F.round("ewma", 6).alias("ewma"))
            .orderBy("user_id"))


@query(
    "events_transition_matrix",
    survey="E-extension(first-order Markov transitions: per-user lag over "
           "event time, global transition counts + row-normalized "
           "probabilities)",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_type
      FROM events),
    counts AS (
      SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM ordered WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type)
    SELECT prev_type, event_type, n,
           ROUND(CAST(n AS DOUBLE)
                 / SUM(n) OVER (PARTITION BY prev_type), 6) AS p
    FROM counts
    ORDER BY prev_type, event_type
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What follows what: per-user event sequences (lag over (ts, event_id)
    — the id tie-break makes same-timestamp order deterministic), rolled
    into the global first-order transition matrix with row-normalized
    probabilities. One shuffle on user_id for the lag, one tiny
    (types x types) aggregate — the matrix itself is bounded by the event
    vocabulary, so the normalization window runs on a broadcast-scale
    table no matter the corpus."""
    from pyspark.sql import Window

    events = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = events.withColumn("prev_type",
                                F.lag("event_type").over(w))
    counts = (ordered.filter(F.col("prev_type").isNotNull())
              .groupBy("prev_type", "event_type")
              .agg(F.count(F.lit(1)).cast("long").alias("n")))
    w_row = Window.partitionBy("prev_type")
    return (counts.withColumn(
                "p", F.round(F.col("n").cast("double")
                             / F.sum("n").over(w_row), 6))
            .orderBy("prev_type", "event_type"))


@query(
    "events_asof_cogroup",
    survey="J(cogrouped applyInPandas) + C-extension(as-of join via "
           "pd.merge_asof per cogrouped key)",
    oracle="""
    WITH purch AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MAX(value) AS last_purchase
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, ts)
    SELECT e.event_id, e.user_id, e.event_type, p.last_purchase
    FROM (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
          FROM events) e
    ASOF LEFT JOIN purch p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    ORDER BY e.event_id
    """,
)
def events_asof_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same contract as events_asof_join, exercised through the cogrouped
    Arrow path (operators/temporal.asof_join_cogrouped): one shuffle per
    side on user_id, pd.merge_asof inside each cogroup batch. Identical
    oracle — the two implementations must agree bit-for-bit."""
    from server2_vector_search_server_spark.operators.temporal import (
        asof_join_cogrouped,
    )

    events = tbl(spark, sf_dir, "events")
    purchases = (events.filter(F.col("event_type") == "purchase")
                 .select("user_id", "ts", "value"))
    return (asof_join_cogrouped(
                events.select("event_id", "user_id", "event_type", "ts"),
                purchases, on="ts", by="user_id",
                value_col="value", out_col="last_purchase")
            .select("event_id", "user_id", "event_type", "last_purchase")
            .orderBy("event_id"))


# ---------------------------------------------------------------------------
# CUSUM change detection: loop-carried recursion closed into two windows

_CUSUM_K = "0.5"          # slack (allowance) per step, shared literal
_CUSUM_H = "3.0"          # decision threshold


@query(
    "events_cusum_drift",
    survey="H/I-extension(CUSUM change-point detection per event type: "
           "the loop-carried max(0, S+x-k) recursion closed into "
           "prefix-sum minus running-min — two windows, no stateful fold)",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type,
             time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS hour,
             ROUND((SUM(CAST(ROUND(value * 1000000) AS BIGINT))
                    / 1000000.0) / COUNT(*), 6) AS x
      FROM events
      WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-05' AND DATE '2024-01-07'
      GROUP BY event_type, hour),
    pref AS (
      SELECT event_type, hour,
             SUM(CAST(ROUND((x - {_CUSUM_K}) * 1000000) AS BIGINT))
               OVER (PARTITION BY event_type ORDER BY hour
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               / 1000000.0 AS p
      FROM hourly),
    cusum AS (
      SELECT event_type, hour,
             ROUND(p - LEAST(0.0, MIN(p) OVER (
               PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6) AS s
      FROM pref)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_hours,
           ROUND(MAX(s), 6) AS max_cusum,
           CAST(COUNT(CASE WHEN s > {_CUSUM_H} THEN 1 END) AS BIGINT)
             AS n_alarm_hours,
           MIN(CASE WHEN s > {_CUSUM_H} THEN hour END) AS first_alarm
    FROM cusum
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift detector (Page 1954, public method) over
    hourly mean event values: the textbook recursion
    S_i = max(0, S_{i-1} + (x_i − k)) is loop-carried — no window frame
    expresses it directly — but it has an exact closed form:
    S_i = P_i − min(0, min_{j<i} P_j) where P is the running prefix sum
    of (x − k). So the 'inherently sequential' detector becomes TWO
    ordinary windows (prefix sum + running min), fully parallel per
    series — the same class of rewrite as the sweep-line prefix sum,
    where the EWMA fold genuinely has no such form and keeps its
    grouped-map shape. Hourly means and the prefix go through scaled-
    BIGINT micro-units so shuffle order can't move an alarm by an ulp.
    Output per type: hours observed, peak CUSUM, alarm-hour count, first
    alarm time (threshold h={_CUSUM_H}, slack k={_CUSUM_K})."""
    from pyspark.sql import Window

    from server2_vector_search_server_spark.plans.registry import exact_sum

    events = tbl(spark, sf_dir, "events")
    hourly = (
        events.filter((F.to_date("ts") >= F.lit("2024-01-05"))
                      & (F.to_date("ts") <= F.lit("2024-01-07")))
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.round(exact_sum(F.col("value"), 6) / F.count(F.lit(1)), 6)
             .alias("x")))
    w_all = (Window.partitionBy("event_type").orderBy("hour")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    k = float(_CUSUM_K)
    pref = hourly.withColumn(
        "p",
        F.sum(F.round((F.col("x") - k) * 1_000_000).cast("long"))
        .over(w_all) / 1_000_000.0)
    # the running min INCLUDES the current row: S_i = P_i − min(0,
    # min_{j≤i} P_j) — with 1-PRECEDING the clamp fails on new-minimum
    # rows (S would go negative where the true CUSUM resets to 0)
    cusum = pref.withColumn(
        "s",
        F.round(F.col("p")
                - F.least(F.lit(0.0), F.min("p").over(w_all)), 6))
    h = float(_CUSUM_H)
    return (cusum.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_hours"),
                 F.round(F.max("s"), 6).alias("max_cusum"),
                 F.count(F.when(F.col("s") > h, 1)).alias("n_alarm_hours"),
                 F.min(F.when(F.col("s") > h, F.col("hour")))
                 .alias("first_alarm"))
            .orderBy("event_type"))


@query(
    "events_pattern_match_users",
    survey="I-extension (MATCH_RECOGNIZE-style event-sequence regex: "
           "per-user ordered type string, leftmost non-overlapping "
           "matches of view->clicks*->purchase)",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), ''
                        ORDER BY CAST(ts AS TIMESTAMP), event_id) AS s
      FROM events GROUP BY user_id)
    SELECT user_id, CAST(length(s) AS BIGINT) AS seq_len,
           CAST(len(regexp_extract_all(s, 'vc*p')) AS BIGINT) AS n_matches,
           md5(s) AS seq_md5
    FROM seq
    WHERE len(regexp_extract_all(s, 'vc*p')) > 0
    ORDER BY user_id
    """,
)
def events_pattern_match_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence pattern matching — the SQL:2016 MATCH_RECOGNIZE /
    Flink CEP use case, Spark-native: each user's event types collapse to
    one ordered character string (one char per type — the five fixture
    types have distinct initials), then a plain regex finds leftmost
    non-overlapping ``view (click)* purchase`` journeys. The string IS
    the per-user state: bounded by that user's event count, exactly the
    sessionization bound; at 100 TB you window the sequence (per day /
    per session id) before collecting, and the regex stays linear in
    sequence length. ``seq_md5`` pins the full event ORDERING into the
    hash — any tie-break or shuffle-order bug reds every row, not just
    match counts."""
    events = tbl(spark, sf_dir, "events")
    seq = (events.groupBy("user_id")
           .agg(F.array_join(F.transform(
               F.array_sort(F.collect_list(F.struct(
                   "ts", "event_id",
                   F.substring("event_type", 1, 1).alias("ch")))),
               lambda x: x["ch"]), "").alias("s")))
    return (seq.select(
                "user_id",
                F.length("s").cast("long").alias("seq_len"),
                F.regexp_count(F.col("s"), F.lit("vc*p")).cast("long")
                .alias("n_matches"),
                F.md5("s").alias("seq_md5"))
            .filter(F.col("n_matches") > 0)
            .orderBy("user_id"))


# ---------------------------------------------------------------------------
# Autocorrelation of the hourly event-count series

_ACF_N = 720            # 30 days x 24 h spine, Jan 2024
_ACF_MAX_LAG = 24
_ACF_ORIGIN = "2024-01-01 00:00:00"


@query(
    "events_hourly_autocorrelation",
    survey="temporal extension(autocorrelation function of the gap-filled "
           "hourly count series at lags 1..24 — the seasonality "
           "diagnostic; exact integer-scaled covariance identity, no "
           "float summation anywhere)",
    oracle=f"""
    WITH spine AS (SELECT unnest(range(0, {_ACF_N})) AS t),
    raw AS (
      SELECT CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 3600.0) AS BIGINT)
             - CAST(FLOOR(epoch(TIMESTAMP '{_ACF_ORIGIN}') / 3600.0)
                    AS BIGINT) AS t,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1),
    c AS (
      SELECT s.t, COALESCE(r.n, 0) AS n
      FROM spine s LEFT JOIN raw r ON r.t = s.t),
    tot AS (
      SELECT SUM(n) AS s, SUM(n * n) AS sq FROM c),
    lags AS (SELECT unnest(range(1, {_ACF_MAX_LAG + 1})) AS lag),
    pairs AS (
      SELECT l.lag,
             SUM(a.n * b.n) AS sum_prod,
             SUM(a.n) AS sum_a, SUM(b.n) AS sum_b
      FROM lags l
      JOIN c a ON a.t <= {_ACF_N - 1} - l.lag
      JOIN c b ON b.t = a.t + l.lag
      GROUP BY l.lag)
    SELECT lag,
           ROUND(CAST({_ACF_N} * {_ACF_N} * sum_prod
                      - {_ACF_N} * tot.s * (sum_a + sum_b)
                      + ({_ACF_N} - lag) * tot.s * tot.s AS DOUBLE)
                 / CAST({_ACF_N} * {_ACF_N} * tot.sq
                        - {_ACF_N} * tot.s * tot.s AS DOUBLE), 6) AS acf
    FROM pairs, tot ORDER BY lag
    """,
)
def events_hourly_autocorrelation(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """ACF of the hourly event-rate series at lags 1..24 h — the
    seasonality/periodicity diagnostic behind the seasonal-naive forecast
    (orders_seasonal_naive_backtest): a daily cycle shows as a peak at
    lag 24. Computed by the INTEGER-scaled covariance identity
    N^2*cov = N^2*sum(ab) - N*S*(sum_a+sum_b) + (N-L)*S^2, so both
    engines divide the same two exact integers — there is no float
    accumulation to drift (the exact-sum rule taken to its conclusion).

    Scale shape: ONE scan groups events onto the bounded hour spine
    (720 keys); the lag self-join and everything after run on
    spine x 24 <= 17k bounded rows. Gap hours enter as real zeros via
    the generated spine (groupBy alone silently drops them and biases
    the ACF — the gap-fill gotcha)."""
    ev = tbl(spark, sf_dir, "events")
    origin_h = F.floor(
        F.unix_timestamp(F.lit(_ACF_ORIGIN).cast("timestamp")) / 3600.0)
    raw = (ev.select((F.floor(F.unix_timestamp("ts") / 3600.0)
                      - origin_h).cast("long").alias("t"))
           .groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("n")))
    spine = spark.range(_ACF_N).select(F.col("id").alias("t"))
    c = (spine.join(raw, "t", "left")
         .select("t", F.coalesce("n", F.lit(0)).cast("long").alias("n"))
         .localCheckpoint(eager=True))       # bounded; reused three times
    tot = c.agg(F.sum("n").alias("s"),
                F.sum(F.col("n") * F.col("n")).alias("sq"))
    lags = spark.range(1, _ACF_MAX_LAG + 1).select(F.col("id").alias("lag"))
    a = c.select(F.col("t").alias("ta"), F.col("n").alias("na"))
    b = c.select(F.col("t").alias("tb"), F.col("n").alias("nb"))
    pairs = (lags.join(a, F.col("ta") <= F.lit(_ACF_N - 1) - F.col("lag"))
             .join(b, F.col("tb") == F.col("ta") + F.col("lag"))
             .groupBy("lag")
             .agg(F.sum(F.col("na") * F.col("nb")).alias("sum_prod"),
                  F.sum("na").alias("sum_a"), F.sum("nb").alias("sum_b")))
    n2 = _ACF_N * _ACF_N
    return (pairs.join(F.broadcast(tot))
            .select("lag",
                    F.round(
                        (F.lit(n2) * F.col("sum_prod")
                         - F.lit(_ACF_N) * F.col("s")
                         * (F.col("sum_a") + F.col("sum_b"))
                         + (F.lit(_ACF_N) - F.col("lag"))
                         * F.col("s") * F.col("s")).cast("double")
                        / (F.lit(n2) * F.col("sq")
                           - F.lit(_ACF_N) * F.col("s") * F.col("s"))
                        .cast("double"), 6).alias("acf"))
            .orderBy("lag"))


# ---------------------------------------------------------------------------
# Split-conformal prediction interval for the seasonal-naive forecaster

_CP_N = 720
_CP_LAG = 24
_CP_CAL_LO, _CP_CAL_HI = 168, 504      # calibration hours [lo, hi)
_CP_ALPHA_NUM, _CP_ALPHA_DEN = 9, 10   # 1 - alpha = 9/10, kept rational


@query(
    "events_conformal_interval",
    survey="temporal extension(split-conformal interval for the "
           "seasonal-naive hourly forecaster: calibration-quantile "
           "nonconformity radius + exact test coverage — "
           "distribution-free uncertainty, Vovk/Papadopoulos 2002, all "
           "integer arithmetic)",
    oracle=f"""
    WITH spine AS (SELECT unnest(range(0, {_CP_N})) AS t),
    raw AS (
      SELECT CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 3600.0) AS BIGINT)
             - CAST(FLOOR(epoch(TIMESTAMP '{_ACF_ORIGIN}') / 3600.0)
                    AS BIGINT) AS t,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1),
    c AS (SELECT s.t, COALESCE(r.n, 0) AS n
          FROM spine s LEFT JOIN raw r ON r.t = s.t),
    scored AS (
      SELECT a.t, abs(a.n - b.n) AS score
      FROM c a JOIN c b ON b.t = a.t - {_CP_LAG}),
    cal AS (
      SELECT score, row_number() OVER (ORDER BY score, t) AS rn
      FROM scored WHERE t >= {_CP_CAL_LO} AND t < {_CP_CAL_HI}),
    ncal AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cal FROM cal),
    q AS (
      SELECT cal.score AS q_hat FROM cal, ncal
      WHERE cal.rn = CAST(CEIL((ncal.n_cal + 1) * {_CP_ALPHA_NUM}.0
                               / {_CP_ALPHA_DEN}) AS BIGINT)),
    test AS (
      SELECT COUNT(*) AS n_test,
             SUM(CASE WHEN score <= q.q_hat THEN 1 ELSE 0 END) AS covered
      FROM scored, q WHERE t >= {_CP_CAL_HI})
    SELECT ncal.n_cal, CAST(test.n_test AS BIGINT) AS n_test,
           CAST(q.q_hat AS BIGINT) AS q_hat,
           ROUND(CAST(test.covered AS DOUBLE)
                 / CAST(test.n_test AS DOUBLE), 6) AS coverage
    FROM ncal, q, test
    """,
)
def events_conformal_interval(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Split-conformal uncertainty for the seasonal-naive forecaster
    (prediction for hour t = count at t-24): the calibration set's
    ceil((n+1)(1-alpha))-th smallest |residual| becomes the interval
    radius, and test-window coverage is then guaranteed >= 1-alpha
    distribution-free — the model-agnostic uncertainty wrapper modern
    forecasting pipelines bolt onto ANY predictor.

    Scale shape: the series lives on the bounded 720-hour spine (gap
    hours are real zeros); the lag join, calibration ranking, and
    coverage check all run on spine-bounded tables with INTEGER scores —
    nothing here can drift by a ulp. Per-entity conformal radii at scale
    partition the same plan by entity key."""
    ev = tbl(spark, sf_dir, "events")
    origin_h = F.floor(
        F.unix_timestamp(F.lit(_ACF_ORIGIN).cast("timestamp")) / 3600.0)
    raw = (ev.select((F.floor(F.unix_timestamp("ts") / 3600.0)
                      - origin_h).cast("long").alias("t"))
           .groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("n")))
    spine = spark.range(_CP_N).select(F.col("id").alias("t"))
    c = (spine.join(raw, "t", "left")
         .select("t", F.coalesce("n", F.lit(0)).cast("long").alias("n"))
         .localCheckpoint(eager=True))
    b = c.select((F.col("t") + _CP_LAG).alias("t"),
                 F.col("n").alias("pred"))
    scored = (c.join(b, "t")
              .select("t", F.abs(F.col("n") - F.col("pred")).alias("score")))
    from pyspark.sql import Window
    cal = (scored.filter((F.col("t") >= _CP_CAL_LO)
                         & (F.col("t") < _CP_CAL_HI))
           .withColumn("rn", F.row_number().over(
               Window.orderBy("score", "t"))))
    ncal = cal.agg(F.count(F.lit(1)).cast("long").alias("n_cal"))
    q = (cal.join(F.broadcast(ncal))
         .filter(F.col("rn") == F.ceil((F.col("n_cal") + 1)
                                       * float(_CP_ALPHA_NUM)
                                       / _CP_ALPHA_DEN).cast("long"))
         .select(F.col("score").alias("q_hat")))
    test = (scored.filter(F.col("t") >= _CP_CAL_HI)
            .join(F.broadcast(q))
            .agg(F.count(F.lit(1)).alias("n_test"),
                 F.sum((F.col("score") <= F.col("q_hat")).cast("int"))
                 .alias("covered"),
                 F.first("q_hat").alias("q_hat")))
    return (ncal.join(F.broadcast(test))
            .select("n_cal",
                    F.col("n_test").cast("long").alias("n_test"),
                    F.col("q_hat").cast("long").alias("q_hat"),
                    F.round(F.col("covered").cast("double")
                            / F.col("n_test").cast("double"), 6)
                    .alias("coverage")))


# ---------------------------------------------------------------------------
# Cross-correlation (lead-lag) between two event-type series

_CCF_MAX_LAG = 12


@query(
    "events_crosscorrelation_lead_lag",
    survey="temporal extension(cross-correlation between the hourly view "
           "and purchase series at lags -12..12 — the lead-lag "
           "diagnostic; same integer-scaled covariance identity as the "
           "ACF, two series)",
    oracle=f"""
    WITH spine AS (SELECT unnest(range(0, {_ACF_N})) AS t),
    raw AS (
      SELECT CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 3600.0) AS BIGINT)
             - CAST(FLOOR(epoch(TIMESTAMP '{_ACF_ORIGIN}') / 3600.0)
                    AS BIGINT) AS t,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS y
      FROM events GROUP BY 1),
    c AS (
      SELECT s.t, COALESCE(r.x, 0) AS x, COALESCE(r.y, 0) AS y
      FROM spine s LEFT JOIN raw r ON r.t = s.t),
    tot AS (
      SELECT SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy FROM c),
    lags AS (SELECT unnest(range(-{_CCF_MAX_LAG}, {_CCF_MAX_LAG + 1}))
               AS lag),
    pairs AS (
      SELECT l.lag,
             COUNT(*) AS np,
             SUM(a.x * b.y) AS sum_xy,
             SUM(a.x) AS sum_a, SUM(b.y) AS sum_b
      FROM lags l
      JOIN c a ON a.t + l.lag >= 0 AND a.t + l.lag <= {_ACF_N - 1}
      JOIN c b ON b.t = a.t + l.lag
      GROUP BY l.lag)
    SELECT lag,
           ROUND(CAST({_ACF_N} * {_ACF_N} * sum_xy
                      - {_ACF_N} * tot.sy * sum_a
                      - {_ACF_N} * tot.sx * sum_b
                      + np * tot.sx * tot.sy AS DOUBLE)
                 / sqrt(CAST({_ACF_N} * {_ACF_N} * tot.sxx
                             - {_ACF_N} * tot.sx * tot.sx AS DOUBLE)
                        * CAST({_ACF_N} * {_ACF_N} * tot.syy
                               - {_ACF_N} * tot.sy * tot.sy AS DOUBLE)),
                 6) AS ccf
    FROM pairs, tot ORDER BY lag
    """,
)
def events_crosscorrelation_lead_lag(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """Cross-correlation between hourly view counts and purchase counts
    at lags -12..+12 hours: a peak at positive lag means views LEAD
    purchases by that many hours — the standard lead-lag screen before
    any causal/attribution claim. The numerator expands to pure BIGINTs
    (N^2*cov identity, two-series form with per-lag pair counts); the
    only float ops are one sqrt and one division over identical
    integers.

    Scale shape: identical to events_hourly_autocorrelation — one scan
    to the bounded 720-hour spine (a CONDITIONAL aggregate builds both
    series in that single pass), then bounded lag joins."""
    ev = tbl(spark, sf_dir, "events")
    origin_h = F.floor(
        F.unix_timestamp(F.lit(_ACF_ORIGIN).cast("timestamp")) / 3600.0)
    raw = (ev.select((F.floor(F.unix_timestamp("ts") / 3600.0)
                      - origin_h).cast("long").alias("t"),
                     (F.col("event_type") == "view").cast("long")
                     .alias("xv"),
                     (F.col("event_type") == "purchase").cast("long")
                     .alias("yv"))
           .groupBy("t").agg(F.sum("xv").alias("x"),
                             F.sum("yv").alias("y")))
    spine = spark.range(_ACF_N).select(F.col("id").alias("t"))
    c = (spine.join(raw, "t", "left")
         .select("t", F.coalesce("x", F.lit(0)).cast("long").alias("x"),
                 F.coalesce("y", F.lit(0)).cast("long").alias("y"))
         .localCheckpoint(eager=True))
    tot = c.agg(F.sum("x").alias("sx"), F.sum("y").alias("sy"),
                F.sum(F.col("x") * F.col("x")).alias("sxx"),
                F.sum(F.col("y") * F.col("y")).alias("syy"))
    lags = (spark.range(-_CCF_MAX_LAG, _CCF_MAX_LAG + 1)
            .select(F.col("id").alias("lag")))
    a = c.select(F.col("t").alias("ta"), F.col("x").alias("xa"))
    b = c.select(F.col("t").alias("tb"), F.col("y").alias("yb"))
    pairs = (lags.join(a, (F.col("ta") + F.col("lag") >= 0)
                       & (F.col("ta") + F.col("lag") <= _ACF_N - 1))
             .join(b, F.col("tb") == F.col("ta") + F.col("lag"))
             .groupBy("lag")
             .agg(F.count(F.lit(1)).alias("np"),
                  F.sum(F.col("xa") * F.col("yb")).alias("sum_xy"),
                  F.sum("xa").alias("sum_a"), F.sum("yb").alias("sum_b")))
    n = _ACF_N
    num = (F.lit(n * n) * F.col("sum_xy")
           - F.lit(n) * F.col("sy") * F.col("sum_a")
           - F.lit(n) * F.col("sx") * F.col("sum_b")
           + F.col("np") * F.col("sx") * F.col("sy"))
    den = F.sqrt((F.lit(n * n) * F.col("sxx")
                  - F.lit(n) * F.col("sx") * F.col("sx")).cast("double")
                 * (F.lit(n * n) * F.col("syy")
                    - F.lit(n) * F.col("sy") * F.col("sy")).cast("double"))
    return (pairs.join(F.broadcast(tot))
            .select("lag", F.round(num.cast("double") / den, 6)
                    .alias("ccf"))
            .orderBy("lag"))


# ---------------------------------------------------------------------------
# Allen interval algebra over user-day activity intervals

_ALLEN_CASE = """
    CASE WHEN e1 < s2 THEN 'precedes'
         WHEN e1 = s2 THEN 'meets'
         WHEN e2 < s1 THEN 'preceded_by'
         WHEN e2 = s1 THEN 'met_by'
         WHEN s1 = s2 AND e1 = e2 THEN 'equals'
         WHEN s1 = s2 AND e1 < e2 THEN 'starts'
         WHEN s1 = s2 THEN 'started_by'
         WHEN e1 = e2 AND s1 > s2 THEN 'finishes'
         WHEN e1 = e2 THEN 'finished_by'
         WHEN s1 > s2 AND e1 < e2 THEN 'during'
         WHEN s1 < s2 AND e1 > e2 THEN 'contains'
         WHEN s1 < s2 THEN 'overlaps'
         ELSE 'overlapped_by' END
"""


@query(
    "events_allen_interval_relations",
    survey="temporal extension(Allen 1983 interval algebra: classify "
           "every same-day user-pair of activity intervals into the 13 "
           "relations — the reasoning vocabulary under interval joins; "
           "exhaustive deterministic CASE, day-bucketed pair generation)",
    oracle=f"""
    WITH iv AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             MIN(ts) AS s, MAX(ts) AS e
      FROM events GROUP BY user_id, CAST(ts AS DATE)
      HAVING COUNT(*) >= 2),
    pairs AS (
      SELECT a.s AS s1, a.e AS e1, b.s AS s2, b.e AS e2
      FROM iv a JOIN iv b
        ON a.day = b.day AND a.user_id < b.user_id)
    SELECT {_ALLEN_CASE} AS relation,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM pairs GROUP BY 1 ORDER BY relation
    """,
)
def events_allen_interval_relations(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Allen's interval algebra: each same-day pair of user activity
    intervals lands in exactly one of the 13 mutually-exclusive
    relations (precedes/meets/overlaps/starts/during/finishes, their
    inverses, equals) — the temporal-reasoning vocabulary that interval
    joins and concurrency sweeps implicitly special-case; the
    distribution over relations is a data profile (mostly-'during'
    means nested sessions; mostly-'overlaps' means staggered shifts).

    Scale shape: pair generation is bucketed by the day key (the 1-D
    grid-join: candidates = per-day co-occupancy, never all-pairs
    across days); the classification is a single exhaustive CASE on
    exact timestamps — branch order makes the relations mutually
    exclusive by construction on both engines."""
    ev = tbl(spark, sf_dir, "events")
    iv = (ev.groupBy("user_id", F.to_date("ts").alias("day"))
          .agg(F.min("ts").alias("s"), F.max("ts").alias("e"),
               F.count(F.lit(1)).alias("n"))
          .filter(F.col("n") >= 2))
    a = iv.select("day", F.col("user_id").alias("ua"),
                  F.col("s").alias("s1"), F.col("e").alias("e1"))
    b = iv.select("day", F.col("user_id").alias("ub"),
                  F.col("s").alias("s2"), F.col("e").alias("e2"))
    pairs = a.join(b, "day").filter(F.col("ua") < F.col("ub"))
    return (pairs.select(F.expr(_ALLEN_CASE).alias("relation"))
            .groupBy("relation")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
            .orderBy("relation"))


# ---------------------------------------------------------------------------
# Holt-Winters triple exponential smoothing (additive, daily season)

_HW_M = 24                      # season length: 24 hours
_HW_N = 720                     # 30-day hourly spine
_HW_SCALE = 1_000_000
# smoothing constants as FIFTHS so every update is an exact integer
# floor-division: alpha = 1/5, beta = 1/5, gamma = 2/5. numerator*2 + 5 is
# always odd, so (2*n*x + 5)/10 is never an integer nor a half — IEEE
# division is correctly rounded, hence FLOOR is engine-exact. (A float
# ROUND recursion is NOT portable: DuckDB's ROUND sent -234482.49999999997
# away from zero while std-round semantics keep it — found by parity.)


def _sql_fdiv5(num_expr: str, mult: int) -> str:
    return (f"CAST(FLOOR((2.0 * ({mult} * ({num_expr})) + 5) / 10.0) "
            f"AS BIGINT)")


@query(
    "events_holt_winters_forecast",
    survey="temporal extension(Holt-Winters additive triple smoothing "
           "over the hourly series with a 24h season: exact integer "
           "fifth-fraction recursion for level/trend/seasonal state, "
           "24h-ahead forecast — completes the forecasting family; "
           "oracle is a recursive CTE carrying the seasonal ring as a "
           "list)",
    oracle=f"""
    WITH RECURSIVE spine AS (
      SELECT unnest(range(1, {_HW_N + 1})) AS t),
    raw AS (
      SELECT CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 3600.0) AS BIGINT)
             - CAST(FLOOR(epoch(TIMESTAMP '{_ACF_ORIGIN}') / 3600.0)
                    AS BIGINT) + 1 AS t,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1),
    y AS (
      SELECT s.t, COALESCE(r.n, 0) * {_HW_SCALE} AS y
      FROM spine s LEFT JOIN raw r ON r.t = s.t),
    l0 AS (
      SELECT CAST(FLOOR((2.0 * SUM(y) + {_HW_M}) / {2 * _HW_M}.0)
                  AS BIGINT) AS l
      FROM y WHERE t <= {_HW_M}),
    b0 AS (
      SELECT CAST(FLOOR((2.0 * (SUM(CASE WHEN t > {_HW_M} THEN y END)
                                - SUM(CASE WHEN t <= {_HW_M} THEN y END))
                         + {_HW_M * _HW_M}) / {2 * _HW_M * _HW_M}.0)
                  AS BIGINT) AS b
      FROM y WHERE t <= {2 * _HW_M}),
    seed AS (
      SELECT CAST({_HW_M} AS BIGINT) AS t, l0.l, b0.b,
             (SELECT list(y.y - l0.l ORDER BY y.t)
              FROM y WHERE y.t <= {_HW_M}) AS sl
      FROM l0, b0),
    hw AS (
      SELECT * FROM seed
      UNION ALL
      SELECT hw.t + 1,
             {_sql_fdiv5("y.y - hw.sl[1]", 1)}
               + {_sql_fdiv5("hw.l + hw.b", 4)},
             {_sql_fdiv5(f"({_sql_fdiv5('y.y - hw.sl[1]', 1)} "
                         f"+ {_sql_fdiv5('hw.l + hw.b', 4)}) - hw.l", 1)}
               + {_sql_fdiv5("hw.b", 4)},
             hw.sl[2:] ||
               [{_sql_fdiv5(f"y.y - ({_sql_fdiv5('y.y - hw.sl[1]', 1)} "
                            f"+ {_sql_fdiv5('hw.l + hw.b', 4)})", 2)}
                + {_sql_fdiv5("hw.sl[1]", 3)}]
      FROM hw JOIN y ON y.t = hw.t + 1
      WHERE hw.t < {_HW_N}),
    final AS (SELECT * FROM hw WHERE t = {_HW_N})
    SELECT h.h AS horizon_h,
           ROUND((final.l + h.h * final.b + final.sl[h.h])
                 / {_HW_SCALE}.0, 6) AS forecast
    FROM final, UNNEST(range(1, {_HW_M + 1})) AS h(h)
    ORDER BY h.h
    """,
)
def events_holt_winters_forecast(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Holt-Winters additive smoothing (level + trend + 24h seasonal ring,
    alpha = 1/5, beta = 1/5, gamma = 2/5) over the gap-filled hourly
    series, forecasting the next 24 hours — the seasonality-aware member
    the forecasting family was missing. Every update is the exact integer
    floor-division (2*n*x + 5) // 10, so the Spark-side fold and the
    oracle's recursive CTE (seasonal ring as a 24-element list) agree
    BIT-exactly over 696 steps — a float-ROUND recursion drifted one
    micro-unit because DuckDB's ROUND and std-round disagree a few ulp
    below a half boundary (see the module comment).

    Scale shape: the data-proportional work is the hourly aggregate; the
    fold is a single bounded pass (mapInPandas single-partition — the
    EWMA/Holt discipline; per-entity series partition the same fold).
    Initialization is the standard first-season mean / season-difference
    seed, in the same exact-rational form."""
    import pandas as pd

    ev = tbl(spark, sf_dir, "events")
    origin_h = F.floor(
        F.unix_timestamp(F.lit(_ACF_ORIGIN).cast("timestamp")) / 3600.0)
    raw = (ev.select(((F.floor(F.unix_timestamp("ts") / 3600.0)
                       - origin_h) + 1).cast("long").alias("t"))
           .groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("n")))
    spine = spark.range(1, _HW_N + 1).select(F.col("id").alias("t"))
    y = (spine.join(raw, "t", "left")
         .select("t", (F.coalesce("n", F.lit(0)) * _HW_SCALE)
                 .cast("long").alias("y")))

    def fdiv5(x: int, mult: int) -> int:
        return (2 * mult * x + 5) // 10

    def fold(pdf_iter):
        for pdf in pdf_iter:
            pdf = pdf.sort_values("t", ignore_index=True)
            ys = pdf["y"].tolist()
            m = _HW_M
            l = (2 * sum(ys[:m]) + m) // (2 * m)
            b = ((2 * (sum(ys[m:2 * m]) - sum(ys[:m])) + m * m)
                 // (2 * m * m))
            sl = [v - l for v in ys[:m]]
            for t in range(m, _HW_N):
                yv = ys[t]
                s_old = sl[0]
                l2 = fdiv5(yv - s_old, 1) + fdiv5(l + b, 4)
                b = fdiv5(l2 - l, 1) + fdiv5(b, 4)
                s_new = fdiv5(yv - l2, 2) + fdiv5(s_old, 3)
                sl = sl[1:] + [s_new]
                l = l2
            out = {"horizon_h": list(range(1, m + 1)),
                   "f_micro": [l + h * b + sl[h - 1]
                               for h in range(1, m + 1)]}
            yield pd.DataFrame(out)

    folded = (y.repartition(1).mapInPandas(
        fold, "horizon_h long, f_micro long"))
    return (folded.select("horizon_h",
                          F.round(F.col("f_micro") / float(_HW_SCALE), 6)
                          .alias("forecast"))
            .orderBy("horizon_h"))


# ---------------------------------------------------------------------------
# Mann-Kendall trend test on the daily series

@query(
    "events_mann_kendall_trend",
    survey="temporal extension(Mann-Kendall nonparametric trend test on "
           "daily event counts: exact integer S over the bounded day-"
           "pair set, tie-corrected variance, normal z — the "
           "distribution-free 'is there a trend' gate before fitting "
           "anything)",
    oracle="""
    WITH d AS (
      SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS t,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1),
    s AS (
      SELECT CAST(SUM(CASE WHEN b.n > a.n THEN 1
                           WHEN b.n < a.n THEN -1 ELSE 0 END) AS BIGINT)
               AS s,
             CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM d a JOIN d b ON a.t < b.t),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
    ties AS (
      SELECT COALESCE(CAST(SUM(tc * (tc - 1) * (2 * tc + 5)) AS BIGINT), 0)
               AS tie_term
      FROM (SELECT COUNT(*) AS tc FROM d GROUP BY n HAVING COUNT(*) > 1)),
    var AS (
      SELECT (nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_term) / 18.0
               AS v
      FROM nn, ties)
    SELECT nn.n AS n_days, s.s, s.n_pairs,
           ROUND(CASE WHEN s.s > 0 THEN (s.s - 1) / sqrt(var.v)
                      WHEN s.s < 0 THEN (s.s + 1) / sqrt(var.v)
                      ELSE 0.0 END, 6) AS z_stat
    FROM s, nn, var
    """,
)
def events_mann_kendall_trend(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test: S = sum of sign(x_j - x_i) over all day
    pairs i < j — a pure rank statistic, so heavy tails and outliers
    can't fake or hide a trend (the gate to run BEFORE Holt/Holt-Winters
    fitting assumes one). S folds as exact integers over the bounded
    30-day pair set; the tie-corrected variance and continuity-corrected
    z divide shared-op-order doubles.

    Scale shape: the series is the bounded daily aggregate (one scan);
    the pair join is |days|^2/2 over bounded rows — for long series the
    equivalent Kendall formulation via distributed merge-sort inversion
    counting applies, which the docstring names rather than fakes."""
    ev = tbl(spark, sf_dir, "events")
    d = (ev.groupBy(F.datediff(F.to_date("ts"),
                               F.lit("2024-01-01").cast("date"))
                    .alias("t"))
         .agg(F.count(F.lit(1)).cast("long").alias("n"))
         .localCheckpoint(eager=True))
    a = d.select(F.col("t").alias("ta"), F.col("n").alias("na"))
    b = d.select(F.col("t").alias("tb"), F.col("n").alias("nb"))
    s = (a.join(b, F.col("ta") < F.col("tb"))
         .agg(F.sum(F.when(F.col("nb") > F.col("na"), 1)
                    .when(F.col("nb") < F.col("na"), -1)
                    .otherwise(0)).cast("long").alias("s"),
              F.count(F.lit(1)).cast("long").alias("n_pairs")))
    nn = d.agg(F.count(F.lit(1)).cast("long").alias("n"))
    ties = (d.groupBy("n").agg(F.count(F.lit(1)).alias("tc"))
            .filter(F.col("tc") > 1)
            .agg(F.coalesce(
                F.sum(F.col("tc") * (F.col("tc") - 1)
                      * (2 * F.col("tc") + 5)), F.lit(0)).cast("long")
                .alias("tie_term")))
    joined = s.join(F.broadcast(nn)).join(F.broadcast(ties))
    v = ((F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
          - F.col("tie_term")) / 18.0)
    z = (F.when(F.col("s") > 0, (F.col("s") - 1) / F.sqrt(v))
         .when(F.col("s") < 0, (F.col("s") + 1) / F.sqrt(v))
         .otherwise(F.lit(0.0)))
    return joined.select(F.col("n").alias("n_days"), "s", "n_pairs",
                         F.round(z, 6).alias("z_stat"))


# ---------------------------------------------------------------------------
# CUSUM changepoint scan on the daily purchase series

@query(
    "events_cusum_changepoint",
    survey="temporal extension(CUSUM changepoint scan on daily purchase "
           "counts — the level-shift detector a data-quality monitor "
           "runs over ingest volume; argmax |S_t| located with EXACT "
           "integers via the n·prefix − rank·total scaling, no float "
           "enters the ranking)",
    oracle="""
    WITH d AS (
      SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS t,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    tot AS (
      SELECT CAST(SUM(x) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS n FROM d),
    pre AS (
      SELECT t, x,
             CAST(SUM(x) OVER (ORDER BY t) AS BIGINT) AS prefix,
             CAST(ROW_NUMBER() OVER (ORDER BY t) AS BIGINT) AS r
      FROM d)
    SELECT p.t AS day_index, p.x AS n_events,
           CAST(tot.n * p.prefix - p.r * tot.total AS BIGINT)
             AS cusum_scaled,
           ROUND(CAST(tot.n * p.prefix - p.r * tot.total AS DOUBLE)
                 / (tot.n * tot.total), 6) AS cusum_rel
    FROM pre p, tot
    ORDER BY ABS(CAST(tot.n * p.prefix - p.r * tot.total AS BIGINT)) DESC,
             p.t
    LIMIT 5
    """,
)
def events_cusum_changepoint(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan (Page 1954, public): the classic detector
    for a level shift in a counting series — the monitor a training-data
    pipeline points at daily ingest volume before trusting a mixture
    ratio. The textbook statistic S_t = Σ_{k≤t}(x_k − x̄) needs the float
    mean; multiplying through by n gives the integer-exact scaled form
    S'_t = n·prefix_t − rank_t·total, so the argmax ranking (top-5 here,
    |S'| desc, earliest day tie-break) is decided entirely in BIGINTs —
    the same no-float-in-the-decision trick as the BMP block-mean hash.
    ``cusum_rel`` divides the same integers once for a human-readable
    magnitude. Scale shape: one scan to the bounded daily aggregate;
    prefix/rank windows run over day-grain rows (bounded by calendar
    span, never event count) — at 100 TB the window state is still a few
    thousand rows; only the first aggregate touches the corpus."""
    ev = tbl(spark, sf_dir, "events")
    d = (ev.filter(F.col("event_type") == "purchase")
         .groupBy(F.datediff(F.to_date("ts"),
                             F.lit("2024-01-01").cast("date")).alias("t"))
         .agg(F.count(F.lit(1)).cast("long").alias("x")))
    w = Window.orderBy("t")
    pre = d.select(
        "t", "x",
        F.sum("x").over(w.rowsBetween(Window.unboundedPreceding, 0))
         .cast("long").alias("prefix"),
        F.row_number().over(w).cast("long").alias("r"))
    tot = d.agg(F.sum("x").cast("long").alias("total"),
                F.count(F.lit(1)).cast("long").alias("n"))
    joined = pre.crossJoin(F.broadcast(tot))
    s = (F.col("n") * F.col("prefix") - F.col("r") * F.col("total"))
    return (joined.select(
        F.col("t").alias("day_index"),
        F.col("x").alias("n_events"),
        s.cast("long").alias("cusum_scaled"),
        F.round(s.cast("double") / (F.col("n") * F.col("total")), 6)
         .alias("cusum_rel"))
        .orderBy(F.abs(F.col("cusum_scaled")).desc(), "day_index")
        .limit(5))


# ---------------------------------------------------------------------------
# Theil-Sen robust trend slope on the daily series

@query(
    "events_theil_sen_trend",
    survey="temporal extension(Theil-Sen estimator: median of all "
           "pairwise day slopes — the robust trend line that pairs with "
           "the Mann-Kendall test above (Sen 1968); bounded day-pair "
           "set, median selected by deterministic rank, no global row "
           "sort of the corpus)",
    oracle="""
    WITH d AS (
      SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS t,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1),
    slopes AS (
      SELECT a.t AS ti, b.t AS tj,
             ROUND(CAST(b.y - a.y AS DOUBLE) / (b.t - a.t), 9) AS s
      FROM d a JOIN d b ON a.t < b.t),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS np FROM slopes),
    ranked AS (
      SELECT s, ROW_NUMBER() OVER (ORDER BY s, ti, tj) AS r FROM slopes),
    med AS (
      SELECT (SELECT s FROM ranked WHERE r = (n.np + 1) // 2) AS lo,
             (SELECT s FROM ranked WHERE r = n.np // 2 + 1) AS hi
      FROM n),
    ic AS (
      SELECT ROUND(d.y - (med.lo + med.hi) / 2.0 * d.t, 9) AS c, d.t
      FROM d, med),
    icn AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM ic),
    icr AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c, t) AS r FROM ic)
    SELECT (SELECT nd FROM icn) AS n_days,
           n.np AS n_pairs,
           ROUND((med.lo + med.hi) / 2.0, 6) AS sen_slope,
           ROUND(((SELECT c FROM icr, icn WHERE r = (icn.nd + 1) // 2)
                  + (SELECT c FROM icr, icn WHERE r = icn.nd // 2 + 1))
                 / 2.0, 6) AS sen_intercept
    FROM n, med
    """,
)
def events_theil_sen_trend(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Theil-Sen trend (Sen 1968, public): slope = the median of all
    pairwise slopes (y_j − y_i)/(t_j − t_i) over the daily series — the
    robust line whose breakdown point (~29%) survives the outliers that
    wreck OLS, and the natural effect-size companion to the rank-based
    Mann-Kendall significance test above. Intercept = median of
    y_i − slope·t_i (Conover's form).

    Determinism: each pairwise slope is one IEEE division of exact ints
    rounded to 9 decimals; the median is selected by RANK over the
    bounded pair set (value order, (ti, tj) tie-break so row_number is
    total; for even counts the two central VALUES average — identical on
    both engines because the central multiset values are order-free).
    Scale shape: one scan to the bounded daily aggregate; the |days|²/2
    pair join and both medians run on day-grain rows only. For long
    series the published O(n log n) randomized median-of-slopes
    (Matoušek) is the drop-in, named not faked — same contract."""
    ev = tbl(spark, sf_dir, "events")
    d = (ev.groupBy(F.datediff(F.to_date("ts"),
                               F.lit("2024-01-01").cast("date")).alias("t"))
         .agg(F.count(F.lit(1)).cast("long").alias("y"))
         .localCheckpoint(eager=True))
    a = d.select(F.col("t").alias("ti"), F.col("y").alias("yi"))
    b = d.select(F.col("t").alias("tj"), F.col("y").alias("yj"))
    slopes = (a.join(b, F.col("ti") < F.col("tj"))
              .select("ti", "tj",
                      F.round((F.col("yj") - F.col("yi")).cast("double")
                              / (F.col("tj") - F.col("ti")), 9).alias("s")))
    from pyspark.sql import Window

    w = Window.orderBy("s", "ti", "tj")
    ranked = slopes.select("s", F.row_number().over(w).alias("r"))
    np_df = slopes.agg(F.count(F.lit(1)).cast("long").alias("np"))
    # integer median ranks: r == (np+1) DIV 2  OR  r == np DIV 2 + 1 — for
    # odd np both predicates select the SAME row (sum/count = its value);
    # for even np the two central rows (sum/count = their mean)
    lo_hi = (ranked.crossJoin(F.broadcast(np_df))
             .filter((F.col("r") == F.expr("(np + 1) DIV 2"))
                     | (F.col("r") == F.expr("np DIV 2 + 1")))
             .agg((F.sum("s") / F.count(F.lit(1))).alias("slope_raw")))
    ic = (d.crossJoin(F.broadcast(lo_hi))
          .select(F.round(F.col("y") - F.col("slope_raw") * F.col("t"), 9)
                  .alias("c"), "t"))
    icw = Window.orderBy("c", "t")
    icr = ic.select("c", F.row_number().over(icw).alias("r"))
    nd_df = ic.agg(F.count(F.lit(1)).cast("long").alias("nd"))
    intercept = (icr.crossJoin(F.broadcast(nd_df))
                 .filter((F.col("r") == F.expr("(nd + 1) DIV 2"))
                         | (F.col("r") == F.expr("nd DIV 2 + 1")))
                 .agg((F.sum("c") / F.count(F.lit(1)))
                      .alias("intercept_raw")))
    return (np_df.crossJoin(F.broadcast(nd_df))
            .crossJoin(F.broadcast(lo_hi))
            .crossJoin(F.broadcast(intercept))
            .select(F.col("nd").alias("n_days"),
                    F.col("np").alias("n_pairs"),
                    F.round("slope_raw", 6).alias("sen_slope"),
                    F.round("intercept_raw", 6).alias("sen_intercept")))


# ---------------------------------------------------------------------------
# Spearman rank correlation between daily activity and daily revenue

@query(
    "events_spearman_daily_rank_corr",
    survey="temporal extension(Spearman rank correlation between daily "
           "event count and daily purchase value — Pearson on DOUBLED "
           "midranks so tie handling stays in exact integers; the "
           "monotone-association companion to Mann-Kendall / Theil-Sen)",
    oracle="""
    WITH d AS (
      SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS t,
             CAST(COUNT(*) AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(ROUND(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL GROUP BY 1),
    r AS (
      SELECT t,
             2 * RANK() OVER (ORDER BY x)
               + COUNT(*) OVER (PARTITION BY x) - 1 AS rx2,
             2 * RANK() OVER (ORDER BY y)
               + COUNT(*) OVER (PARTITION BY y) - 1 AS ry2
      FROM d),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(rx2) AS BIGINT) AS sx,
             CAST(SUM(ry2) AS BIGINT) AS sy,
             CAST(SUM(rx2 * ry2) AS BIGINT) AS sxy,
             CAST(SUM(rx2 * rx2) AS BIGINT) AS sxx,
             CAST(SUM(ry2 * ry2) AS BIGINT) AS syy
      FROM r)
    SELECT n AS n_days,
           CAST(n * sxy - sx * sy AS BIGINT) AS num,
           CAST(n * sxx - sx * sx AS BIGINT) AS den_x,
           CAST(n * syy - sy * sy AS BIGINT) AS den_y,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 6)
             AS spearman_rho
    FROM s
    """,
)
def events_spearman_daily_rank_corr(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Spearman rank correlation between the daily event count and the
    daily purchase-value total — the tie-robust monotone-association
    measure, computed as Pearson over DOUBLED midranks: the midrank of a
    tie group is fractional (.5), but 2·midrank = 2·rank + ties − 1 is
    always an integer (rank = competition rank, ties = group size), so
    every sum (Σr, Σr², Σrxry) folds as exact BIGINTs and the
    hash-checked columns are the exact covariance numerator and the two
    variance denominators; only the final ρ divides-and-sqrts those
    integers once. Doubling cancels: the 2s scale numerator and both
    denominator factors by 4, leaving ρ unchanged. Rank windows run over
    the bounded day-grain spine, never the event corpus. NULL values
    filtered on both engines (the r7 window-sort lesson)."""
    from pyspark.sql import Window

    ev = tbl(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    d = (ev.groupBy(F.datediff(F.to_date("ts"),
                               F.lit("2024-01-01").cast("date")).alias("t"))
         .agg(F.count(F.lit(1)).cast("long").alias("x"),
              F.sum(F.when(F.col("event_type") == "purchase",
                           F.round(F.col("value") * 100).cast("long"))
                    .otherwise(F.lit(0).cast("long")))
              .cast("long").alias("y")))
    rx2 = (2 * F.rank().over(Window.orderBy("x"))
           + F.count(F.lit(1)).over(Window.partitionBy("x")) - 1)
    ry2 = (2 * F.rank().over(Window.orderBy("y"))
           + F.count(F.lit(1)).over(Window.partitionBy("y")) - 1)
    r = d.select(rx2.cast("long").alias("rx2"),
                 ry2.cast("long").alias("ry2"))
    s = r.agg(F.count(F.lit(1)).cast("long").alias("n"),
              F.sum("rx2").cast("long").alias("sx"),
              F.sum("ry2").cast("long").alias("sy"),
              F.sum(F.col("rx2") * F.col("ry2")).cast("long").alias("sxy"),
              F.sum(F.col("rx2") * F.col("rx2")).cast("long").alias("sxx"),
              F.sum(F.col("ry2") * F.col("ry2")).cast("long").alias("syy"))
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    den_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return s.select(
        F.col("n").alias("n_days"),
        num.cast("long").alias("num"),
        den_x.cast("long").alias("den_x"),
        den_y.cast("long").alias("den_y"),
        F.round(num.cast("double")
                / F.sqrt(den_x.cast("double") * den_y.cast("double")), 6)
        .alias("spearman_rho"))


# ---------------------------------------------------------------------------
# Kendall tau-b between daily activity and daily revenue

@query(
    "events_kendall_tau_daily",
    survey="temporal extension(Kendall tau-b rank correlation between "
           "daily event count and daily purchase value: concordant/"
           "discordant/tie pair counts as EXACT integers over the "
           "bounded day-pair set, tie-corrected denominator — closing "
           "the rank-statistics family: Mann-Kendall (trend), Theil-Sen "
           "(slope), Spearman (midranks), tau-b (pair concordance))",
    oracle="""
    WITH d AS (
      SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS t,
             CAST(COUNT(*) AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(ROUND(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL GROUP BY 1),
    pairs AS (
      -- sign tests via comparisons, NOT the (Δx·Δy) product: daily
      -- aggregates are unbounded BIGINTs at corpus scale and the product
      -- can overflow where the signs cannot
      SELECT CASE WHEN (b.x > a.x AND b.y > a.y)
                    OR (b.x < a.x AND b.y < a.y) THEN 1 ELSE 0 END
               AS conc,
             CASE WHEN (b.x > a.x AND b.y < a.y)
                    OR (b.x < a.x AND b.y > a.y) THEN 1 ELSE 0 END
               AS disc,
             CASE WHEN b.x = a.x AND b.y <> a.y THEN 1 ELSE 0 END AS tx,
             CASE WHEN b.y = a.y AND b.x <> a.x THEN 1 ELSE 0 END AS ty
      FROM d a JOIN d b ON a.t < b.t),
    s AS (
      SELECT CAST(SUM(conc) AS BIGINT) AS nc,
             CAST(SUM(disc) AS BIGINT) AS nd,
             CAST(SUM(tx) AS BIGINT) AS ntx,
             CAST(SUM(ty) AS BIGINT) AS nty,
             CAST(COUNT(*) AS BIGINT) AS n0
      FROM pairs)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n_days,
           nc AS n_concordant, nd AS n_discordant,
           ntx AS n_ties_x_only, nty AS n_ties_y_only,
           ROUND(CAST(nc - nd AS DOUBLE)
                 / sqrt(CAST(n0 - ntx AS DOUBLE)
                        * CAST(n0 - nty AS DOUBLE)), 6) AS tau_b
    FROM s
    """,
)
def events_kendall_tau_daily(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Kendall tau-b between daily event count and daily purchase value
    (Kendall 1938; the tau-b tie correction of Kendall 1945): over all
    day pairs, concordant minus discordant pairs normalized by the
    geometric mean of non-tied pair counts — the pair-concordance view
    of the same association Spearman measures through midranks; reported
    side by side they diagnose whether a relationship is driven by broad
    monotonicity (both high) or a few extreme days (they diverge).

    Exactness: conc/disc/tie indicators are sign tests on integer
    products, summed as exact BIGINTs over the bounded |days|²/2 pair
    set (the ``events_mann_kendall_trend`` join shape); the hash-checked
    columns are those integers, with only the final tau dividing them.
    At corpus scale the published O(n log n) merge-sort inversion count
    replaces the pair join — named, not faked."""
    ev = tbl(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    d = (ev.groupBy(F.datediff(F.to_date("ts"),
                               F.lit("2024-01-01").cast("date")).alias("t"))
         .agg(F.count(F.lit(1)).cast("long").alias("x"),
              F.sum(F.when(F.col("event_type") == "purchase",
                           F.round(F.col("value") * 100).cast("long"))
                    .otherwise(F.lit(0).cast("long")))
              .cast("long").alias("y"))
         .localCheckpoint(eager=True))
    a = d.select(F.col("t").alias("ta"), F.col("x").alias("xa"),
                 F.col("y").alias("ya"))
    b = d.select(F.col("t").alias("tb"), F.col("x").alias("xb"),
                 F.col("y").alias("yb"))
    # sign tests via comparisons, not the (Δx·Δy) product — the product of
    # two unbounded BIGINT day-aggregates can overflow LongType silently
    # at corpus scale; the signs cannot (r9 self-review)
    up_up = ((F.col("xb") > F.col("xa")) & (F.col("yb") > F.col("ya")))
    dn_dn = ((F.col("xb") < F.col("xa")) & (F.col("yb") < F.col("ya")))
    up_dn = ((F.col("xb") > F.col("xa")) & (F.col("yb") < F.col("ya")))
    dn_up = ((F.col("xb") < F.col("xa")) & (F.col("yb") > F.col("ya")))
    pairs = (a.join(b, F.col("ta") < F.col("tb"))
             .select((up_up | dn_dn).cast("int").alias("conc"),
                     (up_dn | dn_up).cast("int").alias("disc"),
                     ((F.col("xb") == F.col("xa"))
                      & (F.col("yb") != F.col("ya"))).cast("int")
                     .alias("tx"),
                     ((F.col("yb") == F.col("ya"))
                      & (F.col("xb") != F.col("xa"))).cast("int")
                     .alias("ty")))
    s = pairs.agg(F.sum("conc").cast("long").alias("nc"),
                  F.sum("disc").cast("long").alias("nd"),
                  F.sum("tx").cast("long").alias("ntx"),
                  F.sum("ty").cast("long").alias("nty"),
                  F.count(F.lit(1)).cast("long").alias("n0"))
    nd_days = d.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    return (s.crossJoin(F.broadcast(nd_days))
            .select("n_days",
                    F.col("nc").alias("n_concordant"),
                    F.col("nd").alias("n_discordant"),
                    F.col("ntx").alias("n_ties_x_only"),
                    F.col("nty").alias("n_ties_y_only"),
                    F.round((F.col("nc") - F.col("nd")).cast("double")
                            / F.sqrt((F.col("n0") - F.col("ntx"))
                                     .cast("double")
                                     * (F.col("n0") - F.col("nty"))
                                     .cast("double")), 6).alias("tau_b")))
