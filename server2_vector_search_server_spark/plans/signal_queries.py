"""Signal-shaped analytics over the event stream: survival analysis,
symbolic time-series (SAX), dynamic time warping, and spectral power.

Four classic families a telemetry/training-data pipeline needs that the
registry did not yet cover (probed round 9: no ``surv``/``sax``/``dtw``/
``fft`` keys).  All four follow the FIXTURES determinism rules: exact
BIGINT carriers wherever sums cross a shuffle (value cents, scaled trig
terms, log-nano survival steps), doubles only through IEEE-deterministic
op chains (+,-,*,/,sqrt, comparisons) written with IDENTICAL structure on
both engines, and ln/exp only on identical exact inputs with rounding
(the ``F.round(F.log(...), 9)`` precedent from curation/insight queries).

Scale notes per query in the docstrings; the common shape is: per-key
series are reduced map-side to exact integer segment sums (one shuffle on
the key), and every "table" that a window must scan in one partition is
bounded by the OBSERVATION WINDOW (hours/durations), not by the corpus.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from server2_vector_search_server_spark.plans.registry import query, tbl

# ---------------------------------------------------------------------------
# shared: per-user 4-segment z-normalized PAA over the event value series
# (the front half of both SAX and DTW).  Exactness chain: value -> cents
# (exact BIGINT), per-segment and per-user sums as BIGINT (shuffle-safe),
# then one identical double expression on both engines.

_MIN_EVENTS = 8

_PAA4_SQL = f"""
evs AS (
    SELECT user_id, ts, event_id,
           CAST(ROUND(value * 100) AS BIGINT) AS cents
    FROM events WHERE value IS NOT NULL
), idxd AS (
    SELECT user_id, cents,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) - 1 AS idx,
           COUNT(*) OVER (PARTITION BY user_id) AS n
    FROM evs
), segs AS (
    SELECT user_id, (idx * 4) // n AS seg, n,
           SUM(cents) AS sk, COUNT(*) AS nk,
           SUM(cents * cents) AS qk,
           MIN(cents) AS mnk, MAX(cents) AS mxk
    FROM idxd WHERE n >= {_MIN_EVENTS}
    GROUP BY user_id, (idx * 4) // n, n
), stats AS (
    SELECT user_id, seg, sk, nk, n,
           SUM(sk) OVER (PARTITION BY user_id) AS su,
           SUM(qk) OVER (PARTITION BY user_id) AS ssq,
           MIN(mnk) OVER (PARTITION BY user_id) AS mn,
           MAX(mxk) OVER (PARTITION BY user_id) AS mx
    FROM segs
), zrows AS (
    SELECT user_id, seg, n,
           (sk / (100.0 * nk)
            - su / (100.0 * n))
           / sqrt(ssq / (10000.0 * n)
                  - (su / (100.0 * n)) * (su / (100.0 * n))) AS z
    FROM stats WHERE mn <> mx
), paa AS (
    SELECT user_id, MAX(n) AS n_events,
           MAX(CASE WHEN seg = 0 THEN z END) AS z1,
           MAX(CASE WHEN seg = 1 THEN z END) AS z2,
           MAX(CASE WHEN seg = 2 THEN z END) AS z3,
           MAX(CASE WHEN seg = 3 THEN z END) AS z4
    FROM zrows GROUP BY user_id
)"""


def _paa4_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of ``_PAA4_SQL``: (user_id, n_events, z1..z4).

    One shuffle on user_id (the groupBy); the per-user window runs inside
    the same hash partitioning.  Segment sums are exact BIGINTs, so the
    only doubles are the final per-user expression — identical op order
    to the SQL text above.
    """
    evs = (tbl(spark, sf_dir, "events")
           .filter(F.col("value").isNotNull())
           .select("user_id", "ts", "event_id",
                   F.round(F.col("value") * 100).cast("long").alias("cents")))
    w_u = Window.partitionBy("user_id")
    idxd = evs.select(
        "user_id", "cents",
        (F.row_number().over(w_u.orderBy("ts", "event_id")) - 1).alias("idx"),
        F.count("*").over(w_u).alias("n"))
    segs = (idxd.filter(F.col("n") >= _MIN_EVENTS)
            .groupBy("user_id", F.expr("(idx * 4) DIV n").alias("seg"), "n")
            .agg(F.sum("cents").alias("sk"), F.count("*").alias("nk"),
                 F.sum(F.col("cents") * F.col("cents")).alias("qk"),
                 F.min("cents").alias("mnk"), F.max("cents").alias("mxk")))
    stats = segs.select(
        "user_id", "seg", "sk", "nk", "n",
        F.sum("sk").over(w_u).alias("su"),
        F.sum("qk").over(w_u).alias("ssq"),
        F.min("mnk").over(w_u).alias("mn"),
        F.max("mxk").over(w_u).alias("mx"))
    mu = F.col("su") / (100.0 * F.col("n"))
    sigma = F.sqrt(F.col("ssq") / (10000.0 * F.col("n")) - mu * mu)
    zrows = (stats
             .filter(F.col("mn") != F.col("mx"))
             .select("user_id", "seg", "n",
                     ((F.col("sk") / (100.0 * F.col("nk")) - mu) / sigma)
                     .alias("z")))
    agg = [F.max("n").alias("n_events")] + [
        F.max(F.when(F.col("seg") == k, F.col("z"))).alias(f"z{k + 1}")
        for k in range(4)]
    return zrows.groupBy("user_id").agg(*agg)


# ---------------------------------------------------------------------------
# SAX: symbolic aggregate approximation (Lin, Keogh et al. 2003)

_SAX_CASE = ("CASE WHEN {z} < -0.6745 THEN 'a' WHEN {z} < 0.0 THEN 'b' "
             "WHEN {z} < 0.6745 THEN 'c' ELSE 'd' END")


def _sax_sym(z: F.Column) -> F.Column:
    return (F.when(z < -0.6745, "a").when(z < 0.0, "b")
            .when(z < 0.6745, "c").otherwise("d"))


@query(
    "events_sax_words",
    survey="beyond-reference (SAX symbolic time-series: z-normalized PAA-4 "
           "over per-user value series, Gaussian-breakpoint alphabet)",
    oracle="WITH " + _PAA4_SQL + f"""
    SELECT user_id, n_events,
           {_SAX_CASE.format(z='z1')} || {_SAX_CASE.format(z='z2')}
           || {_SAX_CASE.format(z='z3')} || {_SAX_CASE.format(z='z4')}
           AS sax_word
    FROM paa ORDER BY user_id
    """,
)
def events_sax_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX words over each user's event-value series: order by (ts,
    event_id), PAA to 4 equal segments, z-normalize with the user's own
    mean/std, map to a 4-letter alphabet at the standard N(0,1)
    breakpoints (-0.6745, 0, 0.6745).  Downstream these words power
    motif/novelty mining with plain string equality instead of numeric
    distance.  Exact-int carriers end at the per-user stage; the z
    expression is one identical IEEE chain on both engines, and constant
    series (sigma = 0) are excluded by the exact min≠max test (an earlier
    n·ssq ≠ su² form was equivalent but its products overflow BIGINT for
    users past ~10⁶ events).  Scale: one shuffle on user_id; everything
    after is 4 rows per user."""
    z = _paa4_df(spark, sf_dir)
    word = F.concat(*[_sax_sym(F.col(f"z{k}")) for k in (1, 2, 3, 4)])
    return (z.select("user_id", "n_events", word.alias("sax_word"))
            .orderBy("user_id"))


# ---------------------------------------------------------------------------
# DTW: dynamic time warping distance to a literal query pattern, DP fully
# unrolled over the 4x4 grid as column expressions — no UDF, no recursion.

_DTW_PATTERN = (-1.2, -0.4, 0.4, 1.2)   # "steady rise" query shape


def _dtw_sql() -> str:
    b = _DTW_PATTERN
    d = {(i, j): f"abs(z{i} - ({b[j - 1]!r}))" for i in (1, 2, 3, 4)
         for j in (1, 2, 3, 4)}
    c: dict[tuple[int, int], str] = {}
    for i in (1, 2, 3, 4):
        for j in (1, 2, 3, 4):
            if i == 1 and j == 1:
                c[i, j] = d[i, j]
            elif i == 1:
                c[i, j] = f"({c[i, j - 1]} + {d[i, j]})"
            elif j == 1:
                c[i, j] = f"({c[i - 1, j]} + {d[i, j]})"
            else:
                c[i, j] = (f"(least({c[i - 1, j]}, {c[i, j - 1]}, "
                           f"{c[i - 1, j - 1]}) + {d[i, j]})")
    return c[4, 4]


def _dtw_col() -> F.Column:
    b = _DTW_PATTERN
    d = {(i, j): F.abs(F.col(f"z{i}") - F.lit(b[j - 1])) for i in (1, 2, 3, 4)
         for j in (1, 2, 3, 4)}
    c: dict[tuple[int, int], F.Column] = {}
    for i in (1, 2, 3, 4):
        for j in (1, 2, 3, 4):
            if i == 1 and j == 1:
                c[i, j] = d[i, j]
            elif i == 1:
                c[i, j] = c[i, j - 1] + d[i, j]
            elif j == 1:
                c[i, j] = c[i - 1, j] + d[i, j]
            else:
                c[i, j] = (F.least(c[i - 1, j], c[i, j - 1], c[i - 1, j - 1])
                           + d[i, j])
    return c[4, 4]


@query(
    "events_dtw_pattern_match",
    survey="beyond-reference (dynamic time warping distance to a query "
           "pattern; DP unrolled as column expressions, no UDF)",
    oracle="WITH " + _PAA4_SQL + f"""
    SELECT user_id, n_events, ROUND({_dtw_sql()}, 9) AS dtw
    FROM paa ORDER BY user_id
    """,
)
def events_dtw_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DTW distance from each user's z-PAA(4) series to the literal
    'steady rise' pattern.  The 4x4 DP grid is UNROLLED into one column
    expression (cell(i,j) = |a_i - b_j| + min of the three predecessors),
    so the whole operator is a projection over the PAA frame — Catalyst
    sees plain arithmetic, whole-stage-codegens it, and the cost per user
    is O(w^2) with w fixed by the PAA width, independent of series
    length.  Every op is IEEE-deterministic (abs/+/least on doubles from
    the shared exact-int chain), so both engines produce bit-identical
    distances; ROUND(,9) is belt-and-braces.  Scale: inherits the single
    user_id shuffle from the PAA stage."""
    z = _paa4_df(spark, sf_dir)
    return (z.select("user_id", "n_events",
                     F.round(_dtw_col(), 9).alias("dtw"))
            .orderBy("user_id"))


# ---------------------------------------------------------------------------
# Kaplan-Meier survival over inter-event gaps with right censoring

@query(
    "events_survival_km",
    survey="beyond-reference (Kaplan-Meier survival estimator over "
           "inter-event gaps, right-censored at the observation horizon)",
    oracle="""
    WITH horizon AS (SELECT MAX(epoch_us(ts)) AS tmax FROM events),
    gaps AS (
        SELECT user_id,
               LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS nxt,
               epoch_us(ts) AS cur
        FROM events
    ), durs AS (
        SELECT CASE WHEN nxt IS NULL
                    THEN ((SELECT tmax FROM horizon) - cur) // 3600000000
                    ELSE (nxt - cur) // 3600000000 END AS dur_hours,
               CASE WHEN nxt IS NULL THEN 0 ELSE 1 END AS observed
        FROM gaps
    ), per_dur AS (
        SELECT dur_hours, CAST(SUM(observed) AS BIGINT) AS n_done,
               CAST(SUM(1 - observed) AS BIGINT) AS n_censored_at,
               COUNT(*) AS cnt
        FROM durs GROUP BY dur_hours
    ), risk AS (
        SELECT dur_hours, n_done, n_censored_at,
               CAST(SUM(cnt) OVER (ORDER BY dur_hours DESC) AS BIGINT)
                   AS n_risk
        FROM per_dur
    ), steps AS (
        SELECT dur_hours, n_done, n_censored_at, n_risk,
               CASE WHEN n_done = n_risk THEN NULL
                    ELSE CAST(ROUND(LN((n_risk - n_done)
                                       / CAST(n_risk AS DOUBLE))
                                    * 1000000000) AS BIGINT) END AS log_nano
        FROM risk WHERE n_done > 0
    )
    SELECT dur_hours, n_risk, n_done, n_censored_at,
           CASE WHEN n_done = n_risk THEN 0.0
                ELSE ROUND(EXP(SUM(log_nano) OVER (ORDER BY dur_hours)
                               / 1000000000.0), 6) END AS survival
    FROM steps ORDER BY dur_hours
    """,
)
def events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier estimate of 'time to next event': each inter-event gap
    (hours, exact integer from microsecond timestamps) is an observed
    duration; each user's final gap to the corpus horizon is right-
    censored.  n_risk(d) is the suffix count of subjects with duration
    >= d (one window over the PER-DURATION table, bounded by the
    observation window in hours — NOT by corpus size); the survival curve
    is the KM product, carried as an exact cumulative BIGINT of log-nano
    step factors (shuffle-safe) and exponentiated once (rounded ln/exp on
    identical inputs — the repo's established pattern).  The n_done =
    n_risk terminal step (factor 0, ln undefined) is pinned to survival
    0.0 on both engines.  Scale: one shuffle on user_id for the LEAD,
    one aggregation keyed by duration; the windows run over <= #hours
    rows."""
    events = tbl(spark, sf_dir, "events")
    horizon = events.agg(F.max(F.unix_micros("ts")).alias("tmax"))
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = events.select(
        "user_id",
        F.lead(F.unix_micros("ts")).over(w_u).alias("nxt"),
        F.unix_micros("ts").alias("cur"))
    durs = (gaps.crossJoin(F.broadcast(horizon))
            .select(
                F.when(F.col("nxt").isNull(),
                       F.expr("(tmax - cur) DIV 3600000000"))
                .otherwise(F.expr("(nxt - cur) DIV 3600000000"))
                .alias("dur_hours"),
                F.when(F.col("nxt").isNull(), 0).otherwise(1)
                .cast("long").alias("observed")))
    per_dur = durs.groupBy("dur_hours").agg(
        F.sum("observed").alias("n_done"),
        F.sum(1 - F.col("observed")).alias("n_censored_at"),
        F.count("*").alias("cnt"))
    w_desc = (Window.orderBy(F.col("dur_hours").desc())
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    risk = per_dur.select(
        "dur_hours", "n_done", "n_censored_at",
        F.sum("cnt").over(w_desc).alias("n_risk"))
    terminal = F.col("n_done") == F.col("n_risk")
    steps = (risk.filter(F.col("n_done") > 0)
             .withColumn(
                 "log_nano",
                 F.when(terminal, F.lit(None).cast("long"))
                 .otherwise(F.round(
                     F.log((F.col("n_risk") - F.col("n_done"))
                           / F.col("n_risk").cast("double"))
                     * 1000000000).cast("long"))))
    w_asc = (Window.orderBy("dur_hours")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (steps.select(
        "dur_hours", "n_risk", "n_done", "n_censored_at",
        F.when(terminal, F.lit(0.0))
        .otherwise(F.round(F.exp(F.sum("log_nano").over(w_asc)
                                 / F.lit(1000000000.0)), 6))
        .alias("survival"))
        .orderBy("dur_hours"))


# ---------------------------------------------------------------------------
# Spectral power at candidate daily/sub-daily periods (Goertzel-style DFT
# bins with a LITERAL trig table, so both engines use identical doubles)

_PERIODS = (24, 12, 8, 6)


def _trig_rows() -> list[tuple[int, int, float, float]]:
    rows = []
    for p in _PERIODS:
        for r in range(p):
            ang = 2.0 * math.pi * r / p
            rows.append((p, r, math.cos(ang), -math.sin(ang)))
    return rows


def _trig_values_sql() -> str:
    return ",\n      ".join(
        f"({p}, {r}, {c!r}, {s!r})" for p, r, c, s in _trig_rows())


@query(
    "events_spectral_peak_hourly",
    survey="beyond-reference (DFT power at candidate periods over the "
           "dense hourly count series; literal trig table, exact-int "
           "term sums)",
    oracle=f"""
    WITH b AS (
        SELECT MIN(epoch_us(ts)) // 3600000000 AS mn,
               MAX(epoch_us(ts)) // 3600000000 AS mx
        FROM events
    ), spine AS (
        SELECT UNNEST(generate_series(mn, mx)) AS hr FROM b
    ), types AS (SELECT DISTINCT event_type FROM events),
    counts AS (
        SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
               COUNT(*) AS c
        FROM events GROUP BY 1, 2
    ), dense AS (
        SELECT t.event_type, s.hr, COALESCE(c.c, 0) AS x
        FROM spine s CROSS JOIN types t
        LEFT JOIN counts c ON c.event_type = t.event_type AND c.hr = s.hr
    ), stats AS (
        SELECT event_type, SUM(x) AS tot, COUNT(*) AS h
        FROM dense GROUP BY 1
    ), trig(p, r, cosv, sinv) AS (VALUES
      {_trig_values_sql()}
    ), sums AS (
        SELECT d.event_type, g.p,
               CAST(SUM(CAST(ROUND(((CAST(d.x AS DOUBLE)
                                - st.tot / CAST(st.h AS DOUBLE)) * g.cosv)
                              * 1000000.0) AS BIGINT)) AS BIGINT) AS re_micro,
               CAST(SUM(CAST(ROUND(((CAST(d.x AS DOUBLE)
                                - st.tot / CAST(st.h AS DOUBLE)) * g.sinv)
                              * 1000000.0) AS BIGINT)) AS BIGINT) AS im_micro,
               MAX(st.h) AS h
        FROM dense d
        JOIN stats st ON st.event_type = d.event_type
        JOIN trig g ON g.r = d.hr % g.p
        GROUP BY d.event_type, g.p
    )
    SELECT event_type, CAST(p AS BIGINT) AS period, re_micro, im_micro,
           ROUND(((re_micro / 1000000.0) * (re_micro / 1000000.0)
                  + (im_micro / 1000000.0) * (im_micro / 1000000.0))
                 / (CAST(h AS DOUBLE) * CAST(h AS DOUBLE)), 6) AS power,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY event_type
               ORDER BY ((re_micro / 1000000.0) * (re_micro / 1000000.0)
                         + (im_micro / 1000000.0) * (im_micro / 1000000.0))
                        DESC, p) AS BIGINT) AS power_rank
    FROM sums ORDER BY event_type, period
    """,
)
def events_spectral_peak_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which sub-daily period dominates each event type's activity?  DFT
    power at candidate periods (24/12/8/6 h) over the DENSE hourly count
    series (missing hours are real zeros — a sparse groupBy would bias
    the mean).  The trig basis is a LITERAL (period, phase) table built
    once in the driver, so both engines multiply identical doubles; the
    mean-removed terms are rounded to exact micro-units per row and
    summed as BIGINTs, making the reduction shuffle-order-proof.  Scale:
    the spine is bounded by the observation window (hours), the trig
    table by sum of periods (50 rows, broadcast); the only corpus-sized
    shuffle is the (type, hour) count."""
    events = tbl(spark, sf_dir, "events")
    # ONE corpus scan: the (type, hour) count table is the only stage that
    # sees raw events; it is observation-window-bounded (≤ types × hours
    # rows), so it is localCheckpointed and every downstream input —
    # bounds, type list, per-type totals, the dense spine — derives from
    # it.  (First version derived those from `events` directly: the
    # executed plan scanned the corpus SIX times, with no ReusedExchange.)
    counts = (events
              .groupBy("event_type",
                       F.expr("unix_micros(ts) DIV 3600000000").alias("hr"))
              .agg(F.count("*").alias("c"))
              .localCheckpoint())
    bounds = counts.agg(F.min("hr").alias("mn"), F.max("hr").alias("mx"))
    spine = bounds.select(
        F.explode(F.sequence("mn", "mx")).alias("hr"))
    types = counts.select("event_type").distinct()
    dense = (spine.crossJoin(F.broadcast(types))
             .join(counts, ["event_type", "hr"], "left")
             .select("event_type", "hr",
                     F.coalesce("c", F.lit(0)).alias("x")))
    stats = dense.groupBy("event_type").agg(
        F.sum("x").alias("tot"), F.count("*").alias("h"))
    trig = F.broadcast(spark.createDataFrame(
        _trig_rows(), "p int, r int, cosv double, sinv double"))
    term = ((F.col("x").cast("double")
             - F.col("tot") / F.col("h").cast("double")))
    sums = (dense
            .join(F.broadcast(stats), "event_type")
            .join(trig, F.col("r") == F.col("hr") % F.col("p"))
            .groupBy("event_type", "p")
            .agg(F.sum(F.round((term * F.col("cosv")) * 1000000.0)
                       .cast("long")).alias("re_micro"),
                 F.sum(F.round((term * F.col("sinv")) * 1000000.0)
                       .cast("long")).alias("im_micro"),
                 F.max("h").alias("h")))
    power_raw = ((F.col("re_micro") / 1000000.0)
                 * (F.col("re_micro") / 1000000.0)
                 + (F.col("im_micro") / 1000000.0)
                 * (F.col("im_micro") / 1000000.0))
    w_rank = Window.partitionBy("event_type").orderBy(
        power_raw.desc(), F.col("p"))
    return (sums.select(
        "event_type", F.col("p").cast("long").alias("period"),
        "re_micro", "im_micro",
        F.round(power_raw / (F.col("h").cast("double")
                             * F.col("h").cast("double")), 6).alias("power"),
        F.row_number().over(w_rank).cast("long").alias("power_rank"))
        .orderBy("event_type", "period"))
