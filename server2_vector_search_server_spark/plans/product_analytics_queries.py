"""Product-analytics query surface: multi-stage conversion funnels and
cohort retention over the events stream.

These are the two canonical event-analytics shapes every warehouse engine
ships (Mixpanel/Amplitude-style); they exercise ordered multi-stage
semantics (stage N must happen strictly AFTER stage N−1) and
self-referential cohort grouping — neither is a plain groupBy.

Scale notes (SCALE.md §18): each funnel stage filters on event_type (pushed
into the parquet scan) and partial-aggregates MIN(ts) per user — the
exchange carries one row per surviving user per stage, never raw events.
Cohort retention shuffles (user, week) pairs once for the first-touch
aggregate and re-joins user-sized output; the distinct-user count is a
single count_distinct (no Expand — ROUND_NOTES.md gotcha)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from server2_vector_search_server_spark.plans.registry import query, tbl

_STAGES = ("view", "click", "purchase")


@query(
    "events_funnel_conversion",
    survey="north-star event analytics (ordered multi-stage conversion "
           "funnel: view -> click -> purchase, strictly time-ordered)",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t1
      FROM events WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.t1
      GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > c.t2
      GROUP BY e.user_id)
    SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_click,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchase,
           ROUND((SELECT COUNT(*) FROM c)
                 / CAST((SELECT COUNT(*) FROM v) AS DOUBLE), 6)
             AS click_rate,
           ROUND((SELECT COUNT(*) FROM p)
                 / CAST((SELECT COUNT(*) FROM c) AS DOUBLE), 6)
             AS purchase_rate
    """,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel: a user converts at stage N only via an event
    strictly after their stage-N−1 time. Three type-filtered scans (the
    event_type predicate reaches the parquet scan) each reduced to one
    MIN(ts) row per user; stage joins are user-sized, not event-sized."""
    events = tbl(spark, sf_dir, "events")
    v = (events.filter(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("ts").alias("t1")))
    c = (events.filter(F.col("event_type") == "click")
         .join(v, "user_id")
         .filter(F.col("ts") > F.col("t1"))
         .groupBy("user_id").agg(F.min("ts").alias("t2")))
    p = (events.filter(F.col("event_type") == "purchase")
         .join(c, "user_id")
         .filter(F.col("ts") > F.col("t2"))
         .groupBy("user_id").agg(F.min("ts").alias("t3")))
    nv = v.agg(F.count(F.lit(1)).alias("n_view"))
    nc = c.agg(F.count(F.lit(1)).alias("n_click"))
    np_ = p.agg(F.count(F.lit(1)).alias("n_purchase"))
    return (nv.crossJoin(nc).crossJoin(np_)
            .select(
                "n_view", "n_click", "n_purchase",
                F.round(F.col("n_click")
                        / F.col("n_view").cast("double"), 6)
                .alias("click_rate"),
                F.round(F.col("n_purchase")
                        / F.col("n_click").cast("double"), 6)
                .alias("purchase_rate")))


_EPOCH = "2024-01-01"


@query(
    "events_cohort_retention",
    survey="north-star event analytics (weekly cohort retention triangle)",
    oracle=f"""
    WITH weeks AS (
      SELECT user_id,
             CAST(floor(date_diff('day', DATE '{_EPOCH}',
                                  CAST(ts AS DATE)) / 7.0) AS INTEGER) AS wk
      FROM events),
    first_touch AS (
      SELECT user_id, MIN(wk) AS cohort_wk FROM weeks GROUP BY user_id)
    SELECT f.cohort_wk,
           CAST(w.wk - f.cohort_wk AS INTEGER) AS week_offset,
           CAST(COUNT(DISTINCT w.user_id) AS BIGINT) AS n_active
    FROM weeks w JOIN first_touch f USING (user_id)
    GROUP BY f.cohort_wk, week_offset
    ORDER BY f.cohort_wk, week_offset
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: cohort = a user's first active week
    (integer weeks since a fixed epoch — pure integer arithmetic, no
    engine-specific week-truncation semantics), activity counted as
    distinct users per (cohort, offset). ONE event-sized shuffle: a
    per-user ``collect_set(wk)`` (map-side partial dedup; state bounded by
    calendar weeks, not events) yields each user's active-week set, whose
    ``array_min`` IS the cohort week — no first-touch self-join, and the
    final aggregate is a plain ``count(*)`` over already-distinct
    (user, week) pairs instead of a ``count_distinct`` that re-dedups the
    join fan-out (VERDICT r9 #1a)."""
    events = tbl(spark, sf_dir, "events")
    wk = F.floor(
        F.datediff(F.col("ts").cast("date"), F.lit(_EPOCH).cast("date"))
        / 7.0).cast("int")
    per_user = (events.select("user_id", wk.alias("wk"))
                .groupBy("user_id")
                .agg(F.collect_set("wk").alias("wks")))
    pairs = per_user.select(
        F.array_min("wks").cast("int").alias("cohort_wk"),
        F.explode("wks").alias("wk"))
    return (pairs
            .groupBy("cohort_wk",
                     (F.col("wk") - F.col("cohort_wk")).cast("int")
                     .alias("week_offset"))
            .agg(F.count(F.lit(1)).alias("n_active"))
            .orderBy("cohort_wk", "week_offset"))


@query(
    "customer_rfm_segments",
    survey="D/E-extension(RFM segmentation: recency/frequency/monetary "
           "quartile scores via BROADCAST thresholds — never a "
           "single-partition ntile)",
    oracle="""
    WITH rfm AS (
      SELECT o_custkey AS custkey,
             CAST(date_diff('day', DATE '1990-01-01',
                            MAX(o_orderdate)) AS BIGINT) AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS freq,
             (SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0)
               AS monetary
      FROM orders GROUP BY o_custkey),
    thr AS (
      SELECT
        ROUND(CAST(quantile_cont(recency_days, 0.5) AS DOUBLE), 4) AS r50,
        ROUND(CAST(quantile_cont(freq, 0.5) AS DOUBLE), 4) AS f50,
        ROUND(CAST(quantile_cont(monetary, 0.5) AS DOUBLE), 4) AS m50
      FROM rfm)
    SELECT CONCAT(CASE WHEN recency_days > r50 THEN 'R+' ELSE 'R-' END,
                  CASE WHEN freq > f50 THEN 'F+' ELSE 'F-' END,
                  CASE WHEN monetary > m50 THEN 'M+' ELSE 'M-' END)
             AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(MIN(custkey) AS BIGINT) AS min_custkey
    FROM rfm CROSS JOIN thr
    GROUP BY segment
    ORDER BY segment
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency/frequency/monetary) segmentation, the retention
    workhorse. The scale trap is `ntile(4) OVER (ORDER BY metric)` — a
    GLOBAL window is a single-partition sort of every customer; instead the
    median thresholds are ONE scalar row (broadcast cross join) and scoring
    is a stateless CASE per customer — fully partial-aggregable. Monetary
    uses the scaled-BIGINT exact sum so the thresholds are shuffle-order
    independent."""
    orders = tbl(spark, sf_dir, "orders")
    rfm = (orders.groupBy(F.col("o_custkey").alias("custkey"))
           .agg(F.datediff(F.max("o_orderdate").cast("date"),
                           F.lit("1990-01-01").cast("date"))
                .cast("long").alias("recency_days"),
                F.count(F.lit(1)).cast("long").alias("freq"),
                (F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                 / 100.0).alias("monetary")))
    thr = rfm.agg(
        F.round(F.expr("percentile(recency_days, 0.5)"), 4).alias("r50"),
        F.round(F.expr("percentile(freq, 0.5)"), 4).alias("f50"),
        F.round(F.expr("percentile(monetary, 0.5)"), 4).alias("m50"))
    seg = F.concat(
        F.when(F.col("recency_days") > F.col("r50"),
               F.lit("R+")).otherwise(F.lit("R-")),
        F.when(F.col("freq") > F.col("f50"),
               F.lit("F+")).otherwise(F.lit("F-")),
        F.when(F.col("monetary") > F.col("m50"),
               F.lit("M+")).otherwise(F.lit("M-")))
    return (rfm.crossJoin(F.broadcast(thr))
            .groupBy(seg.alias("segment"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_customers"),
                 F.min("custkey").cast("long").alias("min_custkey"))
            .orderBy("segment"))


@query(
    "events_concurrency_sweep",
    survey="north-star event analytics (interval-overlap sweep line: max "
           "concurrent 5-minute sessions per hour — O(n log n) event-point "
           "prefix sum, never the O(n²) self-range-join)",
    oracle="""
    WITH pts AS (
      SELECT t, SUM(delta) AS net FROM (
        SELECT CAST(ts AS TIMESTAMP) AS t, 1 AS delta FROM events
        UNION ALL
        SELECT CAST(ts AS TIMESTAMP) + INTERVAL 5 MINUTE AS t, -1 AS delta
        FROM events) u
      GROUP BY t),
    cum AS (
      SELECT t, SUM(net) OVER (ORDER BY t) AS conc FROM pts)
    SELECT time_bucket(INTERVAL '1 hour', t) AS hour_start,
           CAST(MAX(conc) AS BIGINT) AS max_concurrent
    FROM cum GROUP BY hour_start ORDER BY hour_start
    """,
)
def events_concurrency_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line concurrency: every event opens a [ts, ts+5min) interval;
    +1/−1 boundary points are pre-aggregated per distinct instant (so the
    running state is tie-order independent: with the half-open convention,
    peak concurrency at instant t equals the post-t running sum), then the
    running sum uses the two-pass range-partitioned prefix scan
    (operators/text_analysis.exclusive_prefix_sum) — NO single-reducer
    global window, the thing that dies first at 100 TB. The naive
    alternative (self-join on range overlap) is quadratic in the densest
    hour. DuckDB oracle uses the plain window form — bit-identical by the
    prefix-sum parity contract."""
    from server2_vector_search_server_spark.operators.text_analysis import (
        exclusive_prefix_sum,
    )

    ev = tbl(spark, sf_dir, "events")
    starts = ev.select(F.col("ts").alias("t"), F.lit(1).alias("delta"))
    ends = ev.select(
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("t"),
        F.lit(-1).alias("delta"))
    pts = (starts.unionByName(ends)
           .groupBy("t").agg(F.sum("delta").alias("net")))
    cum = exclusive_prefix_sum(pts, order_col="t", value_col="net",
                               out_col="net_before")
    return (cum.withColumn(
                "conc", (F.col("net_before") + F.col("net")).cast("long"))
            .groupBy(F.date_trunc("hour", F.col("t")).alias("hour_start"))
            .agg(F.max("conc").alias("max_concurrent"))
            .orderBy("hour_start"))


# ---------------------------------------------------------------------------
# Kaplan-Meier survival (user retention with right-censoring)

_KM_CHURN_DAYS = 7   # inactive for > 7 days before observation end = churned


@query(
    "events_kaplan_meier_retention",
    survey="product-analytics extension(Kaplan-Meier survival estimator "
           "over user lifetimes with right-censoring: churn = death, "
           "still-active-at-window-end = censored; the standard retention "
           "curve product analytics publishes)",
    oracle=f"""
    WITH spans AS (
      SELECT user_id, MIN(ts) AS first_ts, MAX(ts) AS last_ts
      FROM events GROUP BY user_id),
    bounds AS (SELECT MAX(ts) AS obs_end FROM events),
    life AS (
      SELECT datediff('day', CAST(first_ts AS DATE), CAST(last_ts AS DATE))
               AS duration_days,
             CASE WHEN last_ts < obs_end - INTERVAL {_KM_CHURN_DAYS} DAY
                  THEN 1 ELSE 0 END AS died
      FROM spans, bounds),
    grp AS (
      SELECT duration_days,
             CAST(SUM(died) AS BIGINT) AS deaths,
             CAST(COUNT(*) - SUM(died) AS BIGINT) AS censored,
             CAST(COUNT(*) AS BIGINT) AS total
      FROM life GROUP BY duration_days),
    risk AS (
      SELECT *,
             SUM(total) OVER (ORDER BY duration_days ASC
                              ROWS BETWEEN CURRENT ROW
                              AND UNBOUNDED FOLLOWING) AS at_risk
      FROM grp),
    terms AS (
      SELECT *,
             CASE WHEN deaths = 0 THEN 0
                  WHEN deaths < at_risk THEN
                    CAST(ROUND(ROUND(ln(1.0 - CAST(deaths AS DOUBLE)
                                          / CAST(at_risk AS DOUBLE)), 12)
                               * 1000000000000) AS BIGINT)
                  ELSE NULL END AS term_pico
      FROM risk),
    surv AS (
      SELECT *,
             SUM(term_pico) OVER (ORDER BY duration_days ASC
                                  ROWS UNBOUNDED PRECEDING) AS cum_pico,
             MAX(CASE WHEN term_pico IS NULL THEN 1 ELSE 0 END)
               OVER (ORDER BY duration_days ASC
                     ROWS UNBOUNDED PRECEDING) AS extinct
      FROM terms)
    SELECT duration_days, deaths, censored, CAST(at_risk AS BIGINT) AS at_risk,
           CASE WHEN extinct = 1 THEN 0.0
                ELSE ROUND(exp(cum_pico / 1000000000000.0), 6) END
             AS survival
    FROM surv ORDER BY duration_days
    """,
)
def events_kaplan_meier_retention(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Kaplan-Meier product-limit estimator (Kaplan & Meier 1958) over user
    lifetimes: S(t) = prod over death-times s<=t of (1 - d_s/n_s), with
    users still active near the observation end right-censored (they leave
    the risk set without counting as churn — dropping them instead is the
    classic retention-curve bias).

    Scale shape: one user-keyed shuffle builds lifetimes (partial-agg
    min/max), then everything downstream operates on the DURATION-keyed
    aggregate whose row count is bounded by the observation window in days
    (~31 here, never data-proportional) — the unpartitioned windows that
    chain the risk set and the cumulative hazard run over that bounded
    table, the same bounded-domain justification as the skyline/level
    queries. The product folds as exact pico-unit ln sums (registry
    exact-sum rule) so shuffle order cannot perturb the curve; total
    extinction (d = n) short-circuits to 0 instead of ln(0)."""
    from pyspark.sql import Window

    ev = tbl(spark, sf_dir, "events")
    spans = (ev.groupBy("user_id")
             .agg(F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")))
    bounds = ev.agg(F.max("ts").alias("obs_end"))
    life = (spans.join(F.broadcast(bounds))
            .select(
                F.datediff(F.to_date("last_ts"), F.to_date("first_ts"))
                .alias("duration_days"),
                F.when(F.col("last_ts")
                       < F.col("obs_end")
                       - F.expr(f"INTERVAL {_KM_CHURN_DAYS} DAYS"), 1)
                .otherwise(0).alias("died")))
    grp = (life.groupBy("duration_days")
           .agg(F.sum("died").cast("long").alias("deaths"),
                (F.count(F.lit(1)) - F.sum("died")).cast("long")
                .alias("censored"),
                F.count(F.lit(1)).cast("long").alias("total")))
    w_fwd = (Window.orderBy(F.col("duration_days").asc())
             .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    w_cum = (Window.orderBy(F.col("duration_days").asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    risk = grp.withColumn("at_risk", F.sum("total").over(w_fwd))
    term = (F.when(F.col("deaths") == 0, F.lit(0).cast("long"))
            .when(F.col("deaths") < F.col("at_risk"),
                  F.round(F.round(F.log(F.lit(1.0)
                                        - F.col("deaths").cast("double")
                                        / F.col("at_risk").cast("double")),
                                  12) * 1_000_000_000_000).cast("long"))
            .otherwise(F.lit(None).cast("long")))
    surv = (risk.withColumn("term_pico", term)
            .withColumn("cum_pico", F.sum("term_pico").over(w_cum))
            .withColumn("extinct",
                        F.max(F.when(F.col("term_pico").isNull(), 1)
                              .otherwise(0)).over(w_cum)))
    return (surv.select(
        "duration_days", "deaths", "censored",
        F.col("at_risk").cast("long").alias("at_risk"),
        F.when(F.col("extinct") == 1, F.lit(0.0))
        .otherwise(F.round(F.exp(F.col("cum_pico") / 1_000_000_000_000.0), 6))
        .alias("survival"))
        .orderBy("duration_days"))


# ---------------------------------------------------------------------------
# Weight-of-evidence / information-value feature binning

_WOE_BIN_LO, _WOE_BIN_HI = -7, 8   # log2 bins over value in (0.01, ~500]


@query(
    "events_woe_value_bins",
    survey="product-analytics extension(weight-of-evidence / information-"
           "value binning of event value against the purchase label — the "
           "credit-scoring feature diagnostic, Laplace-smoothed)",
    oracle=f"""
    WITH base AS (
      SELECT GREATEST({_WOE_BIN_LO}, LEAST({_WOE_BIN_HI},
               CAST(FLOOR(ROUND(ln(CAST(value AS DOUBLE)) / ln(2.0), 9))
                    AS INTEGER))) AS bin,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS good
      FROM events WHERE value > 0),
    grp AS (
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(good) AS BIGINT) AS goods,
             CAST(COUNT(*) - SUM(good) AS BIGINT) AS bads
      FROM base GROUP BY bin),
    tot AS (SELECT SUM(goods) AS g_tot, SUM(bads) AS b_tot,
                   COUNT(*) AS k FROM grp),
    woe AS (
      SELECT bin, n, goods, bads,
             ROUND(ln(((goods + 0.5) / (g_tot + 0.5 * k))
                      / ((bads + 0.5) / (b_tot + 0.5 * k))), 6) AS woe,
             ROUND(((goods + 0.5) / (g_tot + 0.5 * k)
                    - (bads + 0.5) / (b_tot + 0.5 * k))
                   * ROUND(ln(((goods + 0.5) / (g_tot + 0.5 * k))
                              / ((bads + 0.5) / (b_tot + 0.5 * k))), 6), 6)
               AS iv_contrib
      FROM grp, tot)
    SELECT * FROM woe ORDER BY bin
    """,
)
def events_woe_value_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence binning (the credit-risk / feature-engineering
    standard; Siddiqi 2006): bucket the value feature into log2 bins,
    score each bin by WoE = ln(P(bin|good)/P(bin|bad)) with Laplace
    smoothing so empty cells stay finite, and report each bin's
    information-value contribution IV_i = (g%_i - b%_i) * WoE_i.

    Scale shape: one partial-aggregable groupBy on a BOUNDED bin key
    (16 log2 bins); the totals join is a broadcast of one row. The log2
    bin index goes through round(.,9) before floor on BOTH engines so
    values landing exactly on power-of-two boundaries (money-like inputs)
    cannot straddle an ulp seam."""
    ev = tbl(spark, sf_dir, "events").filter(F.col("value") > 0)
    bin_col = F.greatest(
        F.lit(_WOE_BIN_LO),
        F.least(F.lit(_WOE_BIN_HI),
                F.floor(F.round(F.log(F.col("value").cast("double"))
                                / F.log(F.lit(2.0)), 9)).cast("int")))
    grp = (ev.select(bin_col.alias("bin"),
                     F.when(F.col("event_type") == "purchase", 1)
                     .otherwise(0).alias("good"))
           .groupBy("bin")
           .agg(F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("good").cast("long").alias("goods"),
                (F.count(F.lit(1)) - F.sum("good")).cast("long")
                .alias("bads")))
    tot = grp.agg(F.sum("goods").alias("g_tot"), F.sum("bads").alias("b_tot"),
                  F.count(F.lit(1)).alias("k"))
    g_rate = (F.col("goods") + 0.5) / (F.col("g_tot") + 0.5 * F.col("k"))
    b_rate = (F.col("bads") + 0.5) / (F.col("b_tot") + 0.5 * F.col("k"))
    woe = F.round(F.log(g_rate / b_rate), 6)
    return (grp.join(F.broadcast(tot))
            .select("bin", "n", "goods", "bads", woe.alias("woe"),
                    F.round((g_rate - b_rate) * woe, 6).alias("iv_contrib"))
            .orderBy("bin"))


# ---------------------------------------------------------------------------
# Gini / Lorenz revenue concentration

@query(
    "customer_gini_revenue",
    survey="product-analytics extension(Gini coefficient + Lorenz shares "
           "of customer revenue — inequality/concentration measurement "
           "with DISTRIBUTED exact ranks via the two-pass prefix sum, "
           "never a single-reducer global window)",
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders GROUP BY o_custkey),
    ranked AS (
      SELECT cents,
             row_number() OVER (ORDER BY cents, o_custkey) AS r
      FROM rev),
    tot AS (SELECT COUNT(*) AS n, SUM(cents) AS s,
                   SUM(r * cents) AS s1 FROM ranked)
    SELECT CAST(n AS BIGINT) AS n_customers,
           CAST(s AS BIGINT) AS total_cents,
           ROUND(CAST(2 * s1 - (n + 1) * s AS DOUBLE)
                 / CAST(n * s AS DOUBLE), 6) AS gini,
           ROUND(CAST((SELECT SUM(cents) FROM ranked
                       WHERE r > n - CAST(FLOOR(n / 10.0) AS BIGINT))
                      AS DOUBLE) / CAST(s AS DOUBLE), 6) AS top_decile_share,
           ROUND(CAST((SELECT SUM(cents) FROM ranked
                       WHERE r <= CAST(FLOOR(n / 2.0) AS BIGINT))
                      AS DOUBLE) / CAST(s AS DOUBLE), 6)
             AS bottom_half_share
    FROM tot
    """,
)
def customer_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration report: the Gini coefficient by its exact
    rank identity G = (2*sum(r*x_r) - (n+1)*sum(x)) / (n*sum(x)) over
    ascending-sorted customer revenues, plus the top-decile and
    bottom-half Lorenz shares.

    Scale shape: ranks come from operators/text_analysis.
    exclusive_prefix_sum — the two-pass range-partitioned prefix scan —
    NOT a global-ORDER row_number window (which collapses onto one
    reducer; the oracle uses it only because DuckDB runs single-node
    anyway). Every aggregate folds exact BIGINT cents; the final ratios
    divide identical integers. The rank-weighted sum r*cents stays under
    2^63 through ~sf1000; beyond that the identity needs 128-bit or
    per-partition pre-reduction (documented, not hit here)."""
    from server2_vector_search_server_spark.operators.text_analysis import (
        exclusive_prefix_sum,
    )

    orders = tbl(spark, sf_dir, "orders")
    rev = (orders.groupBy("o_custkey")
           .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                .alias("cents")))
    # composite order key (cents, custkey) packed so the distributed
    # prefix scan ranks on a UNIQUE key: cents <= ~3e9 at bench SFs,
    # custkey <= 1.5e6 -> key = cents * 10^7 + custkey fits bigint
    keyed = (rev.withColumn("okey", F.col("cents") * 10_000_000
                            + F.col("o_custkey"))
             .withColumn("one", F.lit(1).cast("long")))
    ranked = exclusive_prefix_sum(keyed, order_col="okey",
                                  value_col="one", out_col="r0")
    ranked = ranked.withColumn("r", F.col("r0") + 1)
    tot = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(F.col("r") * F.col("cents")).cast("long").alias("s1"))
    shares = (ranked.join(F.broadcast(tot.select("n")))
              .agg(
        F.sum(F.when(F.col("r") > F.col("n")
                     - F.floor(F.col("n") / 10.0).cast("long"),
                     F.col("cents"))).cast("long").alias("top_cents"),
        F.sum(F.when(F.col("r") <= F.floor(F.col("n") / 2.0).cast("long"),
                     F.col("cents"))).cast("long").alias("bot_cents")))
    return (tot.join(F.broadcast(shares))
            .select(
        F.col("n").alias("n_customers"),
        F.col("s").alias("total_cents"),
        F.round((2 * F.col("s1") - (F.col("n") + 1) * F.col("s"))
                .cast("double") / (F.col("n") * F.col("s")).cast("double"),
                6).alias("gini"),
        F.round(F.col("top_cents").cast("double")
                / F.col("s").cast("double"), 6).alias("top_decile_share"),
        F.round(F.col("bot_cents").cast("double")
                / F.col("s").cast("double"), 6).alias("bottom_half_share")))


# ---------------------------------------------------------------------------
# Weekday x hour activity profile (calendar seasonality)

@query(
    "events_weekday_hour_profile",
    survey="product-analytics extension(weekday x hour-of-day activity "
           "heatmap with exact seasonality index vs the uniform-rate "
           "baseline — the calendar profile behind staffing/alerting "
           "baselines; one bounded-key aggregate)",
    oracle="""
    WITH cell AS (
      SELECT CAST(EXTRACT(isodow FROM CAST(ts AS TIMESTAMP)) AS INTEGER)
               AS weekday,
             CAST(EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) AS INTEGER)
               AS hour,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2),
    tot AS (SELECT SUM(n) AS t, COUNT(*) AS k FROM cell)
    SELECT weekday, hour, CAST(n AS BIGINT) AS n_events,
           ROUND(CAST(n AS DOUBLE) * k / t, 6) AS seasonality_index
    FROM cell, tot ORDER BY weekday, hour
    """,
)
def events_weekday_hour_profile(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Calendar heatmap: event volume per (ISO weekday, hour-of-day) cell
    with the seasonality index n * k / total (1.0 = uniform rate) — the
    profile that seeds staffing forecasts and anomaly baselines (an
    alert threshold that ignores the Monday-9am cell fires every
    Monday). One groupBy onto a <= 168-cell key; the index divides exact
    integers with shared op order."""
    ev = tbl(spark, sf_dir, "events")
    cell = (ev.groupBy(
        F.dayofweek("ts").alias("dw_raw"),
        F.hour("ts").alias("hour"))
        .agg(F.count(F.lit(1)).alias("n")))
    # Spark dayofweek: 1=Sunday..7=Saturday; ISO dow: 1=Monday..7=Sunday
    iso = F.when(F.col("dw_raw") == 1, 7).otherwise(F.col("dw_raw") - 1)
    cell = cell.select(iso.cast("int").alias("weekday"),
                       F.col("hour").cast("int").alias("hour"), "n")
    tot = cell.agg(F.sum("n").alias("t"), F.count(F.lit(1)).alias("k"))
    return (cell.join(F.broadcast(tot))
            .select("weekday", "hour",
                    F.col("n").cast("long").alias("n_events"),
                    F.round(F.col("n").cast("double") * F.col("k")
                            / F.col("t"), 6).alias("seasonality_index"))
            .orderBy("weekday", "hour"))


# ---------------------------------------------------------------------------
# Session-timeout sensitivity sweep (one scan, all thresholds)

_STS_MINUTES = (5, 15, 30, 60)


@query(
    "events_session_timeout_sweep",
    survey="product-analytics extension(session-count sensitivity to the "
           "inactivity timeout: all four thresholds from ONE ordered "
           "pass — gap > t starts a session, so count = 1 + gaps>t per "
           "user; the tuning curve behind every sessionization config)",
    oracle=f"""
    WITH gaps AS (
      SELECT user_id,
             epoch_us(CAST(ts AS TIMESTAMP))
             - epoch_us(lag(CAST(ts AS TIMESTAMP))
                        OVER (PARTITION BY user_id ORDER BY ts, event_id))
               AS gap_us
      FROM events)
    SELECT {", ".join(
        f"CAST(COUNT(DISTINCT user_id) + SUM(CASE WHEN gap_us > "
        f"CAST({m * 60 * 1_000_000} AS BIGINT) "
        f"THEN 1 ELSE 0 END) AS BIGINT) AS sessions_{m}m"
        for m in _STS_MINUTES)}
    FROM gaps
    """,
)
def events_session_timeout_sweep(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """How many sessions each inactivity timeout yields — the sweep every
    sessionization config decision needs (too-low timeouts shred visits,
    too-high merge days): sessions(t) = users + gaps-exceeding-t, all
    four thresholds evaluated as conditional sums over ONE lag pass
    (re-running the sessionizer per threshold scans the table four
    times; the gap identity makes the sweep one window + one aggregate).

    Scale shape: one user-keyed window exchange; the sweep is four
    conditional sums over the same gap column — cost independent of the
    threshold count.

    Gaps are EXACT MICROSECOND integers (unix_micros / epoch_us) on both
    engines: the fixture timestamps carry sub-second parts, and the
    original second-truncated Spark form vs the fractional-epoch oracle
    disagreed whenever a gap straddled a threshold within 1 s — latent at
    the small SFs, caught by the 10× synthetic-corpus spot sweep (r9)."""
    from pyspark.sql import Window

    ev = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        (F.unix_micros("ts")
         - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"))
    aggs = [F.count_distinct("user_id").alias("_u")] + [
        F.sum(F.when(F.col("gap_us") > m * 60 * 1_000_000, 1).otherwise(0))
        .alias(f"_g{m}") for m in _STS_MINUTES]
    row = gaps.agg(*aggs)
    return row.select(*[
        (F.col("_u") + F.col(f"_g{m}")).cast("long")
        .alias(f"sessions_{m}m") for m in _STS_MINUTES])


# ---------------------------------------------------------------------------
# DAU / WAU / MAU stickiness

_DAU_SAMPLE_EVERY = 7      # report one day a week to keep output bounded


@query(
    "events_dau_wau_mau_stickiness",
    survey="product-analytics extension(DAU/WAU/MAU + stickiness ratios "
           "per report day from ONE (day, user) pre-aggregate fanned to "
           "its trailing windows — the engagement dashboard staple)",
    oracle=f"""
    WITH du AS (
      SELECT DISTINCT
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             user_id
      FROM events),
    dau AS (
      SELECT d, COUNT(*) AS dau FROM du GROUP BY d),
    wau AS (
      SELECT du.d + o.o AS rep_d, COUNT(DISTINCT user_id) AS wau
      FROM du, UNNEST(range(0, 7)) AS o(o)
      GROUP BY du.d + o.o),
    mau AS (
      SELECT du.d + o.o AS rep_d, COUNT(DISTINCT user_id) AS mau
      FROM du, UNNEST(range(0, 30)) AS o(o)
      GROUP BY du.d + o.o)
    SELECT dau.d AS day_idx, CAST(dau.dau AS BIGINT) AS dau,
           CAST(wau.wau AS BIGINT) AS wau, CAST(mau.mau AS BIGINT) AS mau,
           ROUND(CAST(dau.dau AS DOUBLE) / wau.wau, 6) AS dau_wau,
           ROUND(CAST(dau.dau AS DOUBLE) / mau.mau, 6) AS dau_mau
    FROM dau JOIN wau ON wau.rep_d = dau.d
             JOIN mau ON mau.rep_d = dau.d
    WHERE dau.d % {_DAU_SAMPLE_EVERY} = 6
    ORDER BY dau.d
    """,
)
def events_dau_wau_mau_stickiness(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """DAU/WAU/MAU with the stickiness ratios (DAU/WAU, DAU/MAU) — the
    engagement dashboard every product ships. Trailing windows come from
    the (day, user) DISTINCT pre-aggregate fanned forward to the report
    days it covers (the sliding-HLL pattern with exact counts: the fan-
    out is pre-aggregate rows x window days, never event rows), so one
    scan feeds all three grains.

    Scale shape: one shuffle to (day, user) distincts; two bounded
    explodes + count-distinct per report day (user-bounded); report days
    sampled weekly (early days carry partially-filled trailing
    windows — deterministic, and what a live dashboard shows too)."""
    ev = tbl(spark, sf_dir, "events")
    du = (ev.select(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .alias("d"), "user_id").distinct()
        .localCheckpoint(eager=True))
    dau = du.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))

    def trailing(days, name):
        return (du.select(F.explode(F.sequence(
            F.col("d"), F.col("d") + days - 1)).alias("rep_d"), "user_id")
            .groupBy("rep_d")
            .agg(F.count_distinct("user_id").alias(name)))

    wau = trailing(7, "wau")
    mau = trailing(30, "mau")
    return (dau.join(wau, dau.d == wau.rep_d)
            .join(mau, dau.d == mau.rep_d)
            .filter(F.col("d") % _DAU_SAMPLE_EVERY == 6)
            .select(F.col("d").alias("day_idx"),
                    F.col("dau").cast("long").alias("dau"),
                    F.col("wau").cast("long").alias("wau"),
                    F.col("mau").cast("long").alias("mau"),
                    F.round(F.col("dau").cast("double") / F.col("wau"), 6)
                    .alias("dau_wau"),
                    F.round(F.col("dau").cast("double") / F.col("mau"), 6)
                    .alias("dau_mau"))
            .orderBy("day_idx"))


# ---------------------------------------------------------------------------
# Week-over-week movers

@query(
    "events_top_movers_wow",
    survey="product-analytics extension(week-over-week movers: per-type "
           "weekly counts pivoted by a conditional aggregate, exact "
           "deltas and shared-order relative change — the anomaly "
           "triage list after an alert fires)",
    oracle="""
    WITH w AS (
      SELECT event_type,
             CAST(FLOOR(datediff('day', DATE '2024-01-01',
                                 CAST(ts AS DATE)) / 7.0) AS INTEGER) AS wk,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2),
    piv AS (
      SELECT event_type,
             SUM(CASE WHEN wk = 2 THEN n ELSE 0 END) AS prev_n,
             SUM(CASE WHEN wk = 3 THEN n ELSE 0 END) AS cur_n
      FROM w GROUP BY event_type)
    SELECT event_type, CAST(prev_n AS BIGINT) AS prev_n,
           CAST(cur_n AS BIGINT) AS cur_n,
           CAST(cur_n - prev_n AS BIGINT) AS delta,
           ROUND(CAST(cur_n - prev_n AS DOUBLE)
                 / CAST(prev_n AS DOUBLE), 6) AS rel_change
    FROM piv
    ORDER BY abs(cur_n - prev_n) DESC, event_type
    """,
)
def events_top_movers_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week movers per event type (weeks 2 vs 3 of the window):
    the triage list an on-call pulls after a volume alert — exact
    integer deltas, relative change dividing identical integers, ranked
    by absolute movement. One bounded-key aggregate + conditional pivot;
    no second scan per week."""
    ev = tbl(spark, sf_dir, "events")
    wk = F.floor(F.datediff(F.to_date("ts"),
                            F.lit("2024-01-01").cast("date")) / 7.0)
    w = (ev.select("event_type", wk.cast("int").alias("wk"))
         .groupBy("event_type", "wk").agg(F.count(F.lit(1)).alias("n")))
    piv = (w.groupBy("event_type")
           .agg(F.sum(F.when(F.col("wk") == 2, F.col("n")).otherwise(0))
                .alias("prev_n"),
                F.sum(F.when(F.col("wk") == 3, F.col("n")).otherwise(0))
                .alias("cur_n")))
    return (piv.select("event_type",
                       F.col("prev_n").cast("long").alias("prev_n"),
                       F.col("cur_n").cast("long").alias("cur_n"),
                       (F.col("cur_n") - F.col("prev_n")).cast("long")
                       .alias("delta"),
                       F.round((F.col("cur_n") - F.col("prev_n"))
                               .cast("double")
                               / F.col("prev_n").cast("double"), 6)
                       .alias("rel_change"))
            .orderBy(F.abs(F.col("delta")).desc(), "event_type"))


# ---------------------------------------------------------------------------
# MATCH_RECOGNIZE-style sequence pattern via exact cumulative windows

_SEQ_USER_CAP = 300


@query(
    "events_sequence_pattern_match",
    survey="D/E-extension(sequence pattern matching a la MATCH_RECOGNIZE: "
           "'view then later purchase with no error between', counted per "
           "user from cumulative windows over the time-ordered stream — "
           "no per-user arrays, no quadratic pair join, no float)",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP), event_id)
               AS idx
      FROM events WHERE user_id < {_SEQ_USER_CAP}),
    cum AS (
      SELECT user_id, event_type, idx,
             SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY idx) AS cumv
      FROM ev),
    marked AS (
      SELECT user_id, event_type, cumv,
             MAX(CASE WHEN event_type = 'error' THEN cumv END)
               OVER (PARTITION BY user_id ORDER BY idx) AS err_cumv
      FROM cum)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN event_type = 'purchase'
                         THEN cumv - COALESCE(err_cumv, 0)
                         ELSE 0 END) AS BIGINT) AS clean_vp_pairs,
           SUM(CASE WHEN event_type = 'purchase'
                    THEN cumv - COALESCE(err_cumv, 0)
                    ELSE 0 END) > 0 AS has_pattern
    FROM marked GROUP BY user_id ORDER BY user_id
    """,
)
def events_sequence_pattern_match(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Per-user sequence pattern count — SQL:2016 MATCH_RECOGNIZE
    semantics ('view' … 'purchase' with no 'error' strictly between, all
    occurrences) without the operator and without per-user arrays: with
    cumv = running view count and err_cumv = cumv at the most recent
    error (a running MAX works because cumv is nondecreasing, so the max
    over error positions IS the latest one), each purchase contributes
    exactly cumv − err_cumv clean pairs. Three windows per user over the
    time-ordered stream (total order via the unique event_id tie-break),
    every value an exact integer — hash-stable at any parallelism, and
    the naive formulation's quadratic (i, j) pair join never appears.

    Engineering note (ROUND_NOTES r8): the first implementation folded a
    per-user code ARRAY with DuckDB ``list_reduce`` — which silently
    returns a corrupted accumulator for longer lists when many rows flow
    through one vector (user 14's 88-element fold returned 21 instead of
    14 at sf0.001; single-row evaluation of the SAME list is correct).
    The window form avoids the primitive entirely on both engines and is
    the better 100 TB shape anyway: state per user is three running
    scalars, not a collected array."""
    from pyspark.sql import Window

    ev = (tbl(spark, sf_dir, "events")
          .filter(F.col("user_id") < _SEQ_USER_CAP))
    w_ord = (Window.partitionBy("user_id")
             .orderBy("ts", "event_id")
             .rowsBetween(Window.unboundedPreceding, 0))
    cum = ev.select(
        "user_id", "event_type",
        F.sum((F.col("event_type") == "view").cast("long"))
         .over(w_ord).alias("cumv"))
    # reuse the same frame for the running last-error cumv: cumv is
    # nondecreasing, so MAX over the prefix of error-row cumv values is
    # the cumv at the most recent error
    marked = ev.select(
        "user_id", "event_type",
        F.sum((F.col("event_type") == "view").cast("long"))
         .over(w_ord).alias("cumv"),
        F.max(F.when(F.col("event_type") == "error",
                     F.sum((F.col("event_type") == "view").cast("long"))
                      .over(w_ord)))
         .over(w_ord).alias("err_cumv"))
    pair_contrib = F.when(
        F.col("event_type") == "purchase",
        F.col("cumv") - F.coalesce(F.col("err_cumv"), F.lit(0))
    ).otherwise(F.lit(0))
    return (marked.groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
                 F.sum(pair_contrib).cast("long").alias("clean_vp_pairs"),
                 (F.sum(pair_contrib) > 0).alias("has_pattern"))
            .orderBy("user_id"))
