"""Distributed hypothesis testing over the event stream: Mann-Whitney U,
one-way ANOVA, and mutual information.

The experimentation half of a telemetry pipeline (A/B comparisons,
treatment-effect checks, feature relevance) — probed round 9: no
``mann_whitney``/``anova``/``mutual_info`` keys existed.  (Two-sample KS
already exists as ``events_ks_two_sample_drift`` in quality_queries.py with
the same cleared-denominator exact-integer technique the MWU query uses.)

The distributed shape all three share: reduce the corpus to a
VALUE-DOMAIN-bounded table (distinct cents ≤ ~56k, type×hour ≤ 120 cells)
with exact BIGINT counts, then run the order statistics / test arithmetic
on that small table.  Windows that must see "everything" therefore scan
the value domain, not the corpus — the property that holds at 100 TB.
Exactness: MWU carries ranks in half-units (2× scaling keeps tied-rank
averages integral); ANOVA rounds each group's s²/n term to an integer
before the cross-group sum (5 doubles summed in shuffle order would not
be deterministic); MI uses the repo's rounded-ln pattern with per-cell
nano-units summed as BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from server2_vector_search_server_spark.plans.registry import query, tbl

_KS_A, _KS_B = "view", "purchase"


# ---------------------------------------------------------------------------
# Mann-Whitney U — exact half-unit ranks, tie-corrected normal z

@query(
    "events_mann_whitney_u",
    survey="beyond-reference (Mann-Whitney U rank-sum test with tied-rank "
           "averaging in exact half-units and tie-corrected z)",
    oracle=f"""
    WITH cells AS (
        SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
               CAST(SUM(CASE WHEN event_type = '{_KS_A}' THEN 1 ELSE 0 END)
                    AS BIGINT) AS c1,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events
        WHERE event_type IN ('{_KS_A}', '{_KS_B}') AND value IS NOT NULL
        GROUP BY 1
    ), ranked AS (
        SELECT cents, c1, c,
               CAST(COALESCE(SUM(c) OVER (ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS before
        FROM cells
    ), tot AS (
        SELECT CAST(SUM(c1) AS BIGINT) AS n1,
               CAST(SUM(c - c1) AS BIGINT) AS n2,
               CAST(SUM(c1 * (2 * before + c + 1)) AS BIGINT) AS r1_x2,
               CAST(SUM(CAST(c AS HUGEINT) * c * c - c) AS DOUBLE)
                   AS tie_cubes
        FROM ranked
    )
    SELECT n1, n2,
           r1_x2 - n1 * (n1 + 1) AS u1_x2,
           (r1_x2 - n1 * (n1 + 1)) / 2.0 AS u1,
           ROUND(((r1_x2 - n1 * (n1 + 1)) / 2.0
                  - (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) / 2.0)
                 / sqrt((CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) / 12.0
                        * ((n1 + n2 + 1)
                           - tie_cubes / (CAST(n1 + n2 AS DOUBLE)
                                          * (n1 + n2 - 1.0)))), 6) AS z
    FROM tot
    """,
)
def events_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U comparing two event types' value distributions.
    Ranks are assigned on the value-domain table: a tied group of c
    observations starting after ``before`` earlier ones has average rank
    before + (c+1)/2, kept integral as 2·before + c + 1 half-units, so
    the rank sum R1 and U are EXACT BIGINTs (valid to N ≈ 1.5e9 per
    comparison — past that U would need the decimal path); the normal
    approximation applies the standard tie correction Σ(t³-t), carried in
    DECIMAL/HUGEINT so a single tie group past ~2.1M observations (e.g. a
    spike value at corpus scale) cannot overflow-diverge the engines, and
    cast to double only where the variance formula needs it.  Scale: one
    groupBy on cents; the exclusive prefix window is value-domain
    bounded."""
    cells = (tbl(spark, sf_dir, "events")
             .filter(F.col("event_type").isin(_KS_A, _KS_B)
                     & F.col("value").isNotNull())
             .groupBy(F.round(F.col("value") * 100).cast("long")
                      .alias("cents"))
             .agg(F.sum(F.when(F.col("event_type") == _KS_A, 1)
                        .otherwise(0)).alias("c1"),
                  F.count("*").alias("c")))
    w_excl = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, -1)
    ranked = cells.select(
        "cents", "c1", "c",
        F.coalesce(F.sum("c").over(w_excl), F.lit(0)).alias("before"))
    c_dec = F.col("c").cast("decimal(12,0)")
    tot = ranked.agg(
        F.sum("c1").alias("n1"),
        F.sum(F.col("c") - F.col("c1")).alias("n2"),
        F.sum(F.col("c1") * (2 * F.col("before") + F.col("c") + 1))
        .alias("r1_x2"),
        F.sum(c_dec * c_dec * c_dec - c_dec).cast("double")
        .alias("tie_cubes"))
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    u1_x2 = F.col("r1_x2") - F.col("n1") * (F.col("n1") + 1)
    u1 = u1_x2 / 2.0
    var = ((n1d * n2d) / 12.0
           * ((F.col("n1") + F.col("n2") + 1)
              - F.col("tie_cubes") / ((F.col("n1") + F.col("n2"))
                                      .cast("double")
                                      * (F.col("n1") + F.col("n2") - 1.0))))
    return tot.select(
        "n1", "n2", u1_x2.alias("u1_x2"), u1.alias("u1"),
        F.round((u1 - (n1d * n2d) / 2.0) / F.sqrt(var), 6).alias("z"))


# ---------------------------------------------------------------------------
# one-way ANOVA across all event types

@query(
    "events_anova_f_by_type",
    survey="beyond-reference (one-way ANOVA F across event types; "
           "per-group s²/n rounded to integer cents² before the "
           "cross-group sum so the reduction is shuffle-order-proof)",
    oracle="""
    WITH grp AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_g,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS s_g,
               CAST(SUM(CAST(CAST(ROUND(value * 100) AS BIGINT)
                             * CAST(ROUND(value * 100) AS BIGINT)
                             AS HUGEINT)) AS HUGEINT) AS q_g
        FROM events WHERE value IS NOT NULL GROUP BY event_type
    ), folded AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(n_g) AS BIGINT) AS n,
               CAST(SUM(s_g) AS BIGINT) AS s,
               CAST(SUM(q_g) AS DOUBLE) AS q,
               CAST(SUM(CAST(ROUND((CAST(s_g AS DOUBLE) / n_g) * s_g)
                             AS HUGEINT)) AS DOUBLE) AS between_raw
        FROM grp
    )
    SELECT k, n,
           ROUND((between_raw - (CAST(s AS DOUBLE) / n) * s) / 10000.0, 4)
               AS ssb,
           ROUND((q - between_raw) / 10000.0, 4) AS ssw,
           ROUND(((between_raw - (CAST(s AS DOUBLE) / n) * s) / (k - 1.0))
                 / ((q - between_raw) / (n - CAST(k AS DOUBLE))), 6) AS f_stat
    FROM folded
    """,
)
def events_anova_f_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA: does mean event value differ across event types?
    Per-group exact sums (n, Σcents, Σcents²) reduce map-side; each
    group's between-term s²/n is computed once in doubles FROM exact ints
    and rounded to integer cents² BEFORE the cross-group sum (a float sum
    over groups would depend on shuffle order), so SSB/SSW/F derive from
    exact integers through one identical expression on both engines.
    s² itself is never materialized as an integer ((Σcents)² can pass
    2⁶³ at corpus scale — the Kendall tau-b lesson); the division comes
    first.  Σcents² and the rounded between-terms ride DECIMAL/HUGEINT
    (a per-type Σcents² passes 2⁶³ around 3e9 rows of max value, where
    Spark's non-ANSI BIGINT sum would wrap silently while DuckDB's
    promotes — an engine DIVERGENCE, not just an overflow) and are cast
    to double only at the final formula.  Scale: one groupBy on
    event_type, then a 5-row fold."""
    cents = F.round(F.col("value") * 100).cast("long")
    grp = (tbl(spark, sf_dir, "events")
           .filter(F.col("value").isNotNull())
           .select(F.col("event_type"), cents.alias("cents"))
           .groupBy("event_type")
           .agg(F.count("*").alias("n_g"), F.sum("cents").alias("s_g"),
                F.sum((F.col("cents") * F.col("cents"))
                      .cast("decimal(38,0)")).alias("q_g")))
    folded = grp.agg(
        F.count("*").alias("k"), F.sum("n_g").alias("n"),
        F.sum("s_g").alias("s"),
        F.sum("q_g").cast("double").alias("q"),
        F.sum(F.round((F.col("s_g").cast("double") / F.col("n_g"))
                      * F.col("s_g")).cast("decimal(38,0)"))
        .cast("double").alias("between_raw"))
    ssb_raw = (F.col("between_raw")
               - (F.col("s").cast("double") / F.col("n")) * F.col("s"))
    ssw_raw = F.col("q") - F.col("between_raw")
    return folded.select(
        "k", "n",
        F.round(ssb_raw / 10000.0, 4).alias("ssb"),
        F.round(ssw_raw / 10000.0, 4).alias("ssw"),
        F.round((ssb_raw / (F.col("k") - 1.0))
                / (ssw_raw / (F.col("n") - F.col("k").cast("double"))), 6)
        .alias("f_stat"))


# ---------------------------------------------------------------------------
# mutual information between event type and hour-of-day

@query(
    "events_mutual_info_type_hour",
    survey="beyond-reference (mutual information of the type × hour-of-day "
           "contingency table; per-cell rounded-ln nano-units summed as "
           "BIGINT)",
    oracle="""
    WITH cell AS (
        SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr,
               CAST(COUNT(*) AS BIGINT) AS n_th
        FROM events GROUP BY 1, 2
    ), margins AS (
        SELECT event_type, hr, n_th,
               CAST(SUM(n_th) OVER (PARTITION BY event_type) AS BIGINT) AS r_t,
               CAST(SUM(n_th) OVER (PARTITION BY hr) AS BIGINT) AS c_h,
               CAST(SUM(n_th) OVER () AS BIGINT) AS n
        FROM cell
    )
    SELECT event_type,
           CAST(SUM(n_th) AS BIGINT) AS n_type,
           ROUND(CAST(SUM(CAST(n_th AS HUGEINT)
                          * CAST(ROUND(LN((CAST(n_th AS DOUBLE) / r_t)
                                          * (CAST(n AS DOUBLE) / c_h))
                                       * 1000000000) AS BIGINT))
                      AS DOUBLE)
                 / (MAX(n) * 1000000000.0), 9) AS mi_contrib
    FROM margins GROUP BY event_type ORDER BY event_type
    """,
)
def events_mutual_info_type_hour(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Mutual information between event type and hour-of-day — the
    feature-relevance statistic (does WHEN predict WHAT?).  The
    contingency table is type × 24 cells with exact BIGINT counts and
    window-summed margins; each cell's pointwise ln is computed DIVISION-
    FIRST — (n/r)·(N/c), two exact-int divisions that can never overflow,
    where the textbook n·N/(r·c) form overflows BIGINT products at corpus
    scale — rounded to nano-units (the repo's rounded-ln pattern) and
    weighted by the exact cell count in DECIMAL/HUGEINT.  Scale: one
    corpus shuffle on (type, hour); everything after is ≤ 120 rows."""
    cell = (tbl(spark, sf_dir, "events")
            .groupBy("event_type",
                     F.hour("ts").cast("long").alias("hr"))
            .agg(F.count("*").alias("n_th")))
    margins = cell.select(
        "event_type", "hr", "n_th",
        F.sum("n_th").over(Window.partitionBy("event_type")).alias("r_t"),
        F.sum("n_th").over(Window.partitionBy("hr")).alias("c_h"),
        F.sum("n_th").over(Window.partitionBy()).alias("n"))
    nano = (F.col("n_th").cast("decimal(20,0)")
            * F.round(F.log((F.col("n_th").cast("double") / F.col("r_t"))
                            * (F.col("n").cast("double") / F.col("c_h")))
                      * 1000000000).cast("long"))
    return (margins.groupBy("event_type")
            .agg(F.sum("n_th").alias("n_type"),
                 F.round(F.sum(nano).cast("double")
                         / (F.max("n") * 1000000000.0), 9)
                 .alias("mi_contrib"))
            .orderBy("event_type"))


# ---------------------------------------------------------------------------
# Welch's unequal-variance t-test — exact moment carriers

@query(
    "events_welch_ttest",
    survey="beyond-reference (Welch unequal-variance t-test with "
           "Welch-Satterthwaite df, every moment an exact integer "
           "carrier before one double evaluation)",
    oracle=f"""
    WITH g AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS s1,
               CAST(SUM(CAST(ROUND(value * 100) AS HUGEINT)
                        * CAST(ROUND(value * 100) AS HUGEINT)) AS DOUBLE)
                   AS s2
        FROM events
        WHERE event_type IN ('{_KS_A}', '{_KS_B}') AND value IS NOT NULL
        GROUP BY event_type
    ), w AS (
        SELECT
          MAX(CASE WHEN event_type = '{_KS_A}' THEN n END) AS n1,
          MAX(CASE WHEN event_type = '{_KS_B}' THEN n END) AS n2,
          MAX(CASE WHEN event_type = '{_KS_A}' THEN s1 END) AS a1,
          MAX(CASE WHEN event_type = '{_KS_B}' THEN s1 END) AS b1,
          MAX(CASE WHEN event_type = '{_KS_A}' THEN s2 END) AS a2,
          MAX(CASE WHEN event_type = '{_KS_B}' THEN s2 END) AS b2
        FROM g
    ), m AS (
        SELECT n1, n2,
               CAST(a1 AS DOUBLE) / 100.0 / n1 AS m1,
               CAST(b1 AS DOUBLE) / 100.0 / n2 AS m2,
               (a2 / 10000.0 - (CAST(a1 AS DOUBLE) / 100.0)
                * (CAST(a1 AS DOUBLE) / 100.0) / n1) / (n1 - 1) AS v1,
               (b2 / 10000.0 - (CAST(b1 AS DOUBLE) / 100.0)
                * (CAST(b1 AS DOUBLE) / 100.0) / n2) / (n2 - 1) AS v2
        FROM w
    )
    SELECT n1, n2, ROUND(m1 - m2, 6) AS mean_diff,
           ROUND((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) AS t_stat,
           ROUND((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)
                 / ((v1 / n1) * (v1 / n1) / (n1 - 1)
                    + (v2 / n2) * (v2 / n2) / (n2 - 1)), 6) AS df_welch
    FROM m
    """,
)
def events_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's t between two event types' value distributions.  Each
    group's n, Σv and Σv² travel as EXACT integers (cents as BIGINT,
    cents² as DECIMAL — a cents² row is ~1e10, so a BIGINT sum saturates
    around 1e9 rows per group; the decimal carrier is good to 1e38 and
    the DuckDB twin uses HUGEINT), then mean/variance/t/df are ONE double
    expression evaluated identically on both engines.  Scale: a single
    2-group conditional aggregate — the map-side combine reduces
    everything, no second scan, no window."""
    cents = F.round(F.col("value") * 100).cast("long")
    cents_dec = cents.cast("decimal(18,0)")
    g = (tbl(spark, sf_dir, "events")
         .filter(F.col("event_type").isin(_KS_A, _KS_B)
                 & F.col("value").isNotNull())
         .groupBy("event_type")
         .agg(F.count("*").alias("n"),
              F.sum(cents).alias("s1"),
              F.sum(cents_dec * cents_dec).cast("double").alias("s2")))
    w = g.agg(
        F.max(F.when(F.col("event_type") == _KS_A, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("event_type") == _KS_B, F.col("n"))).alias("n2"),
        F.max(F.when(F.col("event_type") == _KS_A, F.col("s1"))).alias("a1"),
        F.max(F.when(F.col("event_type") == _KS_B, F.col("s1"))).alias("b1"),
        F.max(F.when(F.col("event_type") == _KS_A, F.col("s2"))).alias("a2"),
        F.max(F.when(F.col("event_type") == _KS_B, F.col("s2"))).alias("b2"))
    m1 = F.col("a1").cast("double") / 100.0 / F.col("n1")
    m2 = F.col("b1").cast("double") / 100.0 / F.col("n2")
    v1 = ((F.col("a2") / 10000.0
           - (F.col("a1").cast("double") / 100.0)
           * (F.col("a1").cast("double") / 100.0) / F.col("n1"))
          / (F.col("n1") - 1))
    v2 = ((F.col("b2") / 10000.0
           - (F.col("b1").cast("double") / 100.0)
           * (F.col("b1").cast("double") / 100.0) / F.col("n2"))
          / (F.col("n2") - 1))
    se2_1 = v1 / F.col("n1")
    se2_2 = v2 / F.col("n2")
    return w.select(
        "n1", "n2",
        F.round(m1 - m2, 6).alias("mean_diff"),
        F.round((m1 - m2) / F.sqrt(se2_1 + se2_2), 6).alias("t_stat"),
        F.round((se2_1 + se2_2) * (se2_1 + se2_2)
                / (se2_1 * se2_1 / (F.col("n1") - 1)
                   + se2_2 * se2_2 / (F.col("n2") - 1)), 6)
        .alias("df_welch"))


# ---------------------------------------------------------------------------
# Benjamini-Hochberg FDR adjustment over the (type, hour) cell family

_FDR_Q = 0.05


@query(
    "events_fdr_bh_adjust",
    survey="beyond-reference (Benjamini-Hochberg step-up FDR adjustment "
           "over the per-(type,hour) mean-shift z family: ranked p·m/i "
           "with the backwards running min — the multiple-comparisons "
           "control every metrics platform needs once it tests 120 "
           "cells at once)",
    oracle=f"""
    WITH base AS (
        SELECT event_type, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hr,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events WHERE value IS NOT NULL
    ), cells AS (
        SELECT event_type, hr, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS s1
        FROM base GROUP BY event_type, hr
    ), gtot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS ng,
               CAST(SUM(cents) AS BIGINT) AS g1,
               CAST(SUM(CAST(cents AS HUGEINT) * cents) AS DOUBLE) AS g2
        FROM base
    ), z AS (
        SELECT event_type, hr, n,
               (CAST(s1 AS DOUBLE) / 100.0 / n
                - CAST(g1 AS DOUBLE) / 100.0 / ng)
               / sqrt(((g2 / 10000.0 - (CAST(g1 AS DOUBLE) / 100.0)
                        * (CAST(g1 AS DOUBLE) / 100.0) / ng) / (ng - 1))
                      / n) AS zv
        FROM cells, gtot
    ), p AS (
        SELECT event_type, hr, n, zv,
               2.0 * exp(-(1.702 * abs(zv)))
                 / (1.0 + exp(-(1.702 * abs(zv)))) AS pv,
               CAST(COUNT(*) OVER () AS BIGINT) AS m,
               CAST(ROW_NUMBER() OVER (ORDER BY
                   2.0 * exp(-(1.702 * abs(zv)))
                     / (1.0 + exp(-(1.702 * abs(zv)))),
                   event_type, hr) AS BIGINT) AS rk
        FROM z
    ), adj AS (
        SELECT event_type, hr, n, zv, pv, m, rk,
               LEAST(1.0, MIN(pv * m / rk) OVER (
                   ORDER BY rk DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                 AS p_adj
        FROM p
    )
    SELECT event_type, hr, n, ROUND(zv, 6) AS z,
           ROUND(pv, 9) AS p_raw, ROUND(p_adj, 9) AS p_bh,
           p_adj <= {_FDR_Q} AS reject
    FROM adj ORDER BY event_type, hr
    """,
)
def events_fdr_bh_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One mean-shift z per (event_type, hour-of-day) cell against the
    global mean, then Benjamini-Hochberg: sort the m p-values ascending,
    take p·m/rank, and run a min BACKWARDS from the largest rank (the
    step-up), capped at 1.  The p-value uses the logistic approximation
    to the normal CDF (p = 2σ(-1.702|z|)) — a closed form both engines
    evaluate bit-identically, where erf exists in neither; the
    exp(-a)/(1+exp(-a)) arrangement underflows gracefully instead of
    overflowing at extreme z.  The rank tiebreak is (p, type, hour) so
    duplicate p-values order deterministically.  Scale: one corpus
    aggregate onto ≤ type×24 cells + one global aggregate; the BH windows
    order the bounded cell table, never the corpus."""
    base = (tbl(spark, sf_dir, "events")
            .filter(F.col("value").isNotNull())
            .select("event_type", F.hour("ts").cast("long").alias("hr"),
                    F.round(F.col("value") * 100).cast("long")
                    .alias("cents")))
    cents_dec = F.col("cents").cast("decimal(18,0)")
    # ONE corpus scan: the global moments are exact-integer sums of the
    # per-cell sums (cells carry s2 solely so glob derives from them —
    # the spectral-peak lesson: re-deriving scalars from raw events
    # costs a second full scan that AQE will not reuse)
    cells_full = (base.groupBy("event_type", "hr")
                  .agg(F.count("*").alias("n"), F.sum("cents").alias("s1"),
                       F.sum(cents_dec * cents_dec).alias("s2"))
                  .localCheckpoint(eager=False))
    cells = cells_full.select("event_type", "hr", "n", "s1")
    glob = cells_full.agg(F.sum("n").alias("ng"),
                          F.sum("s1").alias("g1"),
                          F.sum("s2").cast("double").alias("g2"))
    g1d = F.col("g1").cast("double") / 100.0
    gvar = (F.col("g2") / 10000.0 - g1d * g1d / F.col("ng")) \
        / (F.col("ng") - 1)
    zv = ((F.col("s1").cast("double") / 100.0 / F.col("n")
           - g1d / F.col("ng"))
          / F.sqrt(gvar / F.col("n")))
    z = cells.join(F.broadcast(glob)).select(
        "event_type", "hr", "n", zv.alias("zv"))
    ea = F.exp(-(F.lit(1.702) * F.abs(F.col("zv"))))
    pv = 2.0 * ea / (1.0 + ea)
    p = z.select(
        "event_type", "hr", "n", "zv", pv.alias("pv"),
        F.count("*").over(Window.partitionBy()).cast("long").alias("m"),
        F.row_number().over(
            Window.orderBy(pv, "event_type", "hr")).cast("long")
        .alias("rk"))
    w_back = (Window.orderBy(F.col("rk").desc())
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    adj = p.select(
        "event_type", "hr", "n", "zv", "pv", "m", "rk",
        F.least(F.lit(1.0),
                F.min(F.col("pv") * F.col("m") / F.col("rk")).over(w_back))
        .alias("p_adj"))
    return (adj.select(
        "event_type", "hr", "n",
        F.round("zv", 6).alias("z"),
        F.round("pv", 9).alias("p_raw"),
        F.round("p_adj", 9).alias("p_bh"),
        (F.col("p_adj") <= _FDR_Q).alias("reject"))
        .orderBy("event_type", "hr"))


# ---------------------------------------------------------------------------
# CUPED variance reduction (pre-period covariate adjustment)

_CUPED_SPLIT = "2024-01-16"


@query(
    "events_cuped_variance_reduction",
    survey="beyond-reference (CUPED, Deng et al. WSDM'13: per-user "
           "pre-period covariate, optimal theta from exact cross-moment "
           "carriers, the variance-reduction number an experimentation "
           "platform quotes)",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN CAST(ts AS DATE) < DATE '{_CUPED_SPLIT}'
                    THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
                    AS BIGINT) AS x,
               CAST(SUM(CASE WHEN CAST(ts AS DATE) >= DATE '{_CUPED_SPLIT}'
                    THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
                    AS BIGINT) AS y
        FROM events WHERE value IS NOT NULL
        GROUP BY user_id
    ), mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy,
               CAST(SUM(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy
        FROM per_user
    ), v AS (
        SELECT n,
               (sxx - CAST(sx AS DOUBLE) * sx / n) / (n - 1) AS var_x,
               (syy - CAST(sy AS DOUBLE) * sy / n) / (n - 1) AS var_y,
               (sxy - CAST(sx AS DOUBLE) * sy / n) / (n - 1) AS cov_xy
        FROM mom
    )
    SELECT n AS n_users,
           ROUND(cov_xy / var_x, 6) AS theta,
           ROUND(var_y / 10000.0, 4) AS var_post,
           ROUND((var_y - cov_xy * cov_xy / var_x) / 10000.0, 4)
               AS var_cuped,
           ROUND(1.0 - (var_y - cov_xy * cov_xy / var_x) / var_y, 6)
               AS reduction
    FROM v
    """,
)
def events_cuped_variance_reduction(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """CUPED: regress each user's post-period total on their pre-period
    total and quote how much metric variance the adjustment removes —
    the standard lever for shrinking A/B confidence intervals without
    more traffic.  Per-user x (pre) and y (post) fold as exact cents;
    the five cross-moments are exact integer sums (DECIMAL carriers —
    an x² term is ~1e14, so BIGINT would saturate near 1e4 heavy users
    at 100× scale; DECIMAL/HUGEINT hold 1e38) evaluated once in double:
    theta = cov/var_x and var_cuped = var_y − cov²/var_x (the optimal-
    theta identity).  Users absent from a period contribute 0 for it —
    stated, deterministic, and what a real platform does when the
    covariate is missing.  Scale: one user-keyed aggregate (the shuffle)
    + one 1-row moment reduce."""
    cents = F.round(F.col("value") * 100).cast("long")
    split = F.lit(_CUPED_SPLIT).cast("date")
    per_user = (tbl(spark, sf_dir, "events")
                .filter(F.col("value").isNotNull())
                .groupBy("user_id")
                .agg(F.sum(F.when(F.to_date("ts") < split, cents)
                           .otherwise(F.lit(0))).alias("x"),
                     F.sum(F.when(F.to_date("ts") >= split, cents)
                           .otherwise(F.lit(0))).alias("y")))
    xd = F.col("x").cast("decimal(18,0)")
    yd = F.col("y").cast("decimal(18,0)")
    mom = per_user.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(xd * xd).cast("double").alias("sxx"),
        F.sum(yd * yd).cast("double").alias("syy"),
        F.sum(xd * yd).cast("double").alias("sxy"))
    var_x = (F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
             / F.col("n")) / (F.col("n") - 1)
    var_y = (F.col("syy") - F.col("sy").cast("double") * F.col("sy")
             / F.col("n")) / (F.col("n") - 1)
    cov = (F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
           / F.col("n")) / (F.col("n") - 1)
    return mom.select(
        F.col("n").alias("n_users"),
        F.round(cov / var_x, 6).alias("theta"),
        F.round(var_y / 10000.0, 4).alias("var_post"),
        F.round((var_y - cov * cov / var_x) / 10000.0, 4).alias("var_cuped"),
        F.round(1.0 - (var_y - cov * cov / var_x) / var_y, 6)
        .alias("reduction"))


# ---------------------------------------------------------------------------
# Stratified IPW average treatment effect (causal-inference family)

def _sql_u16_of(expr: str, offset: int) -> str:
    """DuckDB: hex digits [offset, offset+3] of md5(expr) as 0..65535
    (strpos arithmetic — the portable-hash rule; no conv())."""
    return "(" + " + ".join(
        f"(strpos('0123456789abcdef', substr(md5({expr}), {offset + i}, 1))"
        f" - 1) * {16 ** (3 - i)}" for i in range(4)) + ")"


_IPW_PTREAT = (lambda u: f"(0.2 + 0.6 * ({u}) / 65536.0)")


@query(
    "events_stratified_ipw_ate",
    survey="beyond-reference (stratified inverse-propensity-weighted "
           "ATE, Horvitz-Thompson with stratum-estimated propensities: "
           "treatment assignment CONFOUNDED with event_type by "
           "construction, so the naive treated-minus-control difference "
           "is biased and IPW de-biases it — the causal-adjustment "
           "primitive next to diff-in-diff)",
    oracle=f"""
    WITH base AS (
        SELECT event_type,
               CAST(ROUND(value * 100) AS BIGINT)
               + CAST(ROUND(10000.0
                      * {_IPW_PTREAT(_sql_u16_of("event_type", 1))})
                      AS BIGINT) AS cents,
               CASE WHEN {_sql_u16_of("CAST(event_id AS VARCHAR) || 't'", 1)}
                    / 65536.0
                    < {_IPW_PTREAT(_sql_u16_of("event_type", 1))}
                    THEN 1 ELSE 0 END AS t
        FROM events WHERE value IS NOT NULL
    ), strata AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_s,
               CAST(SUM(t) AS BIGINT) AS n_t,
               CAST(SUM(CASE WHEN t = 1 THEN cents ELSE 0 END) AS BIGINT)
                   AS y_t,
               CAST(SUM(CASE WHEN t = 0 THEN cents ELSE 0 END) AS BIGINT)
                   AS y_c
        FROM base GROUP BY event_type
    ), tot AS (
        SELECT CAST(SUM(n_s) AS BIGINT) AS n,
               CAST(SUM(n_t) AS BIGINT) AS nt,
               CAST(SUM(y_t) AS BIGINT) AS yt,
               CAST(SUM(y_c) AS BIGINT) AS yc,
               SUM(CAST(ROUND((CAST(y_t AS DOUBLE) / 100.0
                        / (CAST(n_t AS DOUBLE) / n_s)
                        - CAST(y_c AS DOUBLE) / 100.0
                        / (1.0 - CAST(n_t AS DOUBLE) / n_s))
                       * 1000000) AS BIGINT)) AS ipw_micro
        FROM strata
    )
    SELECT n,
           ROUND(CAST(yt AS DOUBLE) / 100.0 / nt
                 - CAST(yc AS DOUBLE) / 100.0 / (n - nt), 6) AS naive_diff,
           ROUND(ipw_micro / 1000000.0 / n, 6) AS ipw_ate
    FROM tot
    """,
)
def events_stratified_ipw_ate(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """IPW causal adjustment with a planted confounder: each event's
    treatment probability depends on its event_type (a deterministic
    md5-derived propensity in [0.2, 0.8)), and since value distributions
    also differ by type, the NAIVE treated-vs-control mean difference is
    biased away from the true null effect.  The Horvitz-Thompson
    estimator re-weights each stratum's treated/control sums by the
    stratum's estimated propensity n_t/n_s and lands near zero — the
    de-biasing a platform applies when assignment wasn't uniform.
    The confound is PLANTED: outcomes carry a per-stratum shift of
    100·p_s dollars, so treated rows over-represent high-shift strata
    and the naive difference sits dollars above the true null, while
    the within-stratum contrasts IPW aggregates are shift-free.
    Exactness: outcomes fold as exact cents; each stratum's IPW term is
    ONE shared-op-order double rounded to micro-units before the
    cross-stratum integer sum (the ANOVA discipline — per-stratum float
    terms summed raw would be shuffle-order-dependent).  Scale: one
    aggregate onto the type-bounded stratum table, then ≤|types|-row
    arithmetic."""
    ev = (tbl(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull()))
    u_event = (F.conv(F.substring(
        F.md5(F.concat(F.col("event_id").cast("string"), F.lit("t"))),
        1, 4), 16, 10).cast("double"))
    u_type = (F.conv(F.substring(F.md5(F.col("event_type")), 1, 4), 16, 10)
              .cast("double"))
    p_treat = 0.2 + 0.6 * u_type / 65536.0
    base = ev.select(
        "event_type",
        (F.round(F.col("value") * 100).cast("long")
         + F.round(10000.0 * p_treat).cast("long")).alias("cents"),
        (u_event / 65536.0 < p_treat).cast("int").alias("t"))
    strata = (base.groupBy("event_type")
              .agg(F.count("*").alias("n_s"),
                   F.sum("t").alias("n_t"),
                   F.sum(F.when(F.col("t") == 1, F.col("cents"))
                         .otherwise(F.lit(0))).alias("y_t"),
                   F.sum(F.when(F.col("t") == 0, F.col("cents"))
                         .otherwise(F.lit(0))).alias("y_c")))
    phat = F.col("n_t").cast("double") / F.col("n_s")
    ipw_term = (F.col("y_t").cast("double") / 100.0 / phat
                - F.col("y_c").cast("double") / 100.0 / (1.0 - phat))
    tot = strata.agg(
        F.sum("n_s").alias("n"),
        F.sum("n_t").alias("nt"),
        F.sum("y_t").alias("yt"),
        F.sum("y_c").alias("yc"),
        F.sum(F.round(ipw_term * 1_000_000).cast("long")).alias("ipw_micro"))
    return tot.select(
        F.col("n").cast("long").alias("n"),
        F.round(F.col("yt").cast("double") / 100.0 / F.col("nt")
                - F.col("yc").cast("double") / 100.0
                / (F.col("n") - F.col("nt")), 6).alias("naive_diff"),
        F.round(F.col("ipw_micro") / 1_000_000.0 / F.col("n"), 6)
        .alias("ipw_ate"))


# ---------------------------------------------------------------------------
# GPD peaks-over-threshold tail fit via probability-weighted moments

_GPD_U = 100.0            # POT threshold on event value


@query(
    "events_gpd_tail_pwm",
    survey="beyond-reference (extreme-value theory: generalized Pareto "
           "fit to threshold exceedances by probability-weighted "
           "moments, Hosking & Wallis 1987 — closed-form, no iteration; "
           "order-statistic sums exact over the tied value domain)",
    oracle=f"""
    WITH cells AS (
        SELECT CAST(ROUND((value - {_GPD_U}) * 100) AS BIGINT) AS x,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events WHERE value IS NOT NULL AND value > {_GPD_U}
        GROUP BY 1
    ), ranked AS (
        SELECT x, c,
               CAST(COALESCE(SUM(c) OVER (ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS before
        FROM cells
    ), mom AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n,
               CAST(SUM(x * c) AS BIGINT) AS s1,
               CAST(SUM(CAST(x AS HUGEINT)
                        * (CAST(before AS HUGEINT) * c
                           + CAST(c AS HUGEINT) * (c - 1) // 2)) AS DOUBLE)
                   AS rw
        FROM ranked
    ), pwm AS (
        SELECT n,
               CAST(s1 AS DOUBLE) / 100.0 / n AS b0,
               rw / 100.0 / n / (n - 1) AS b1
        FROM mom
    )
    SELECT n AS n_exceed,
           ROUND(b0, 6) AS b0, ROUND(b1, 6) AS b1,
           ROUND(2.0 * b0 * b1 / (b0 - 2.0 * b1), 6) AS sigma,
           ROUND(b0 / (b0 - 2.0 * b1) - 2.0, 6) AS kappa
    FROM pwm
    """,
)
def events_gpd_tail_pwm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalized Pareto tail fit to the exceedances of value over the
    POT threshold, by probability-weighted moments: b0 is the mean
    exceedance and b1 = Σ x₍ᵢ₎·(i−1) / (n(n−1)) the rank-weighted
    moment, from which σ̂ = 2b0b1/(b0−2b1) and κ̂ = b0/(b0−2b1) − 2 in
    closed form (Hosking & Wallis 1987; ξ = −κ) — the capacity-planning
    / risk-tail estimator next to the Hill index, with no iterative
    optimizer to reproduce cross-engine.  Ties carry exactly: within a
    tie group of c equal exceedances after ``before`` smaller ones,
    Σ(rank−1) = before·c + c(c−1)/2 whatever the intra-tie order, so
    the rank-weighted sum is an exact integer (HUGEINT/DECIMAL — x·rank
    reaches n²·x at corpus scale) and b0/b1/σ/κ evaluate once in
    shared-op doubles.  Scale: one groupBy on the exceedance domain +
    a domain-bounded prefix window (the MWU shape)."""
    cells = (tbl(spark, sf_dir, "events")
             .filter(F.col("value").isNotNull()
                     & (F.col("value") > _GPD_U))
             .groupBy(F.round((F.col("value") - _GPD_U) * 100)
                      .cast("long").alias("x"))
             .agg(F.count("*").alias("c")))
    w_excl = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    ranked = cells.select(
        "x", "c",
        F.coalesce(F.sum("c").over(w_excl), F.lit(0)).alias("before"))
    x_dec = F.col("x").cast("decimal(20,0)")
    rank_sum = (F.col("before").cast("decimal(20,0)") * F.col("c")
                + F.expr("(c * (c - 1)) div 2").cast("decimal(20,0)"))
    mom = ranked.agg(
        F.sum("c").alias("n"),
        F.sum(F.col("x") * F.col("c")).alias("s1"),
        F.sum(x_dec * rank_sum).cast("double").alias("rw"))
    b0 = F.col("s1").cast("double") / 100.0 / F.col("n")
    b1 = F.col("rw") / 100.0 / F.col("n") / (F.col("n") - 1)
    return mom.select(
        F.col("n").cast("long").alias("n_exceed"),
        F.round(b0, 6).alias("b0"), F.round(b1, 6).alias("b1"),
        F.round(2.0 * b0 * b1 / (b0 - 2.0 * b1), 6).alias("sigma"),
        F.round(b0 / (b0 - 2.0 * b1) - 2.0, 6).alias("kappa"))


# ---------------------------------------------------------------------------
# Yuen's trimmed t (robust two-sample location test)

_YUEN_G = 0.2          # trim proportion per tail


@query(
    "events_yuen_trimmed_t",
    survey="beyond-reference (Yuen 1974 trimmed t: 20%-trimmed means "
           "with winsorized variances and Welch-style df — the robust "
           "two-sample test that survives the heavy tail Welch's t "
           "chokes on; order statistics exact over the tied value "
           "domain)",
    oracle=f"""
    WITH cells AS (
        SELECT event_type,
               CAST(ROUND(value * 100) AS BIGINT) AS x,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events
        WHERE event_type IN ('{_KS_A}', '{_KS_B}') AND value IS NOT NULL
        GROUP BY 1, 2
    ), ranked AS (
        SELECT event_type, x, c,
               CAST(COALESCE(SUM(c) OVER (PARTITION BY event_type ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS before,
               CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
        FROM cells
    ), marked AS (
        SELECT *,
               CAST(FLOOR({_YUEN_G} * n) AS BIGINT) AS g,
               GREATEST(CAST(0 AS BIGINT),
                 LEAST(before + c, n - CAST(FLOOR({_YUEN_G} * n) AS BIGINT))
                 - GREATEST(before + 1,
                            CAST(FLOOR({_YUEN_G} * n) AS BIGINT) + 1)
                 + 1) AS c_in
        FROM ranked
    ), grp AS (
        SELECT event_type, MAX(n) AS n, MAX(g) AS g,
               CAST(SUM(x * c_in) AS BIGINT) AS int_sum,
               CAST(SUM(CAST(x AS HUGEINT) * x * c_in) AS DOUBLE)
                   AS int_ssq,
               MIN(CASE WHEN before + c >= g + 1 THEN x END) AS x_lo,
               MIN(CASE WHEN before + c >= n - g THEN x END) AS x_hi
        FROM marked GROUP BY event_type
    ), win AS (
        SELECT event_type, n, g, n - 2 * g AS h,
               CAST(int_sum + g * x_lo + g * x_hi AS DOUBLE) / 100.0
                   AS w_sum,
               (int_ssq
                + CAST(g AS DOUBLE) * x_lo * x_lo
                + CAST(g AS DOUBLE) * x_hi * x_hi) / 10000.0 AS w_ssq,
               CAST(int_sum AS DOUBLE) / 100.0 AS t_sum
        FROM grp
    ), stats AS (
        SELECT event_type, n, h,
               t_sum / h AS tmean,
               (n - 1.0) * ((w_ssq - w_sum * w_sum / n) / (n - 1))
                 / (h * (h - 1.0)) AS d
        FROM win
    ), wide AS (
        SELECT
          MAX(CASE WHEN event_type = '{_KS_A}' THEN h END) AS h1,
          MAX(CASE WHEN event_type = '{_KS_B}' THEN h END) AS h2,
          MAX(CASE WHEN event_type = '{_KS_A}' THEN tmean END) AS m1,
          MAX(CASE WHEN event_type = '{_KS_B}' THEN tmean END) AS m2,
          MAX(CASE WHEN event_type = '{_KS_A}' THEN d END) AS d1,
          MAX(CASE WHEN event_type = '{_KS_B}' THEN d END) AS d2
        FROM stats
    )
    SELECT CAST(h1 AS BIGINT) AS h1, CAST(h2 AS BIGINT) AS h2,
           ROUND(m1 - m2, 6) AS trimmed_diff,
           ROUND((m1 - m2) / sqrt(d1 + d2), 6) AS t_yuen,
           ROUND((d1 + d2) * (d1 + d2)
                 / (d1 * d1 / (h1 - 1.0) + d2 * d2 / (h2 - 1.0)), 6)
               AS df_yuen
    FROM wide
    """,
)
def events_yuen_trimmed_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yuen's robust t between two event types: trim the bottom/top 20%
    of each sample (interior sums computed EXACTLY on the tied value
    domain — each cell contributes the overlap of its rank interval
    [before+1, before+c] with the kept band), estimate variance from
    the WINSORIZED sample (tails clamped to the band-edge order
    statistics x_(g+1), x_(n−g), both exact rank lookups), and form
    t = (tm₁−tm₂)/√(d₁+d₂) with Welch-Satterthwaite df on the trimmed
    counts (Yuen 1974).  Every carrier into the final expression is an
    exact integer.  Scale: the MWU shape — one groupBy on (type, cents),
    domain-bounded prefix windows, 2-row arithmetic."""
    cells = (tbl(spark, sf_dir, "events")
             .filter(F.col("event_type").isin(_KS_A, _KS_B)
                     & F.col("value").isNotNull())
             .groupBy("event_type",
                      F.round(F.col("value") * 100).cast("long").alias("x"))
             .agg(F.count("*").alias("c")))
    w_excl = (Window.partitionBy("event_type").orderBy("x")
              .rowsBetween(Window.unboundedPreceding, -1))
    w_grp = Window.partitionBy("event_type")
    ranked = cells.select(
        "event_type", "x", "c",
        F.coalesce(F.sum("c").over(w_excl), F.lit(0)).alias("before"),
        F.sum("c").over(w_grp).cast("long").alias("n"))
    g = F.floor(_YUEN_G * F.col("n")).cast("long")
    c_in = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("before") + F.col("c"), F.col("n") - g)
        - F.greatest(F.col("before") + 1, g + 1) + 1)
    marked = ranked.select(
        "event_type", "x", "c", "before", "n",
        g.alias("g"), c_in.alias("c_in"))
    x_dec = F.col("x").cast("decimal(20,0)")
    grp = (marked.groupBy("event_type")
           .agg(F.max("n").alias("n"), F.max("g").alias("g"),
                F.sum(F.col("x") * F.col("c_in")).alias("int_sum"),
                F.sum(x_dec * x_dec * F.col("c_in")).cast("double")
                .alias("int_ssq"),
                F.min(F.when(F.col("before") + F.col("c")
                             >= F.col("g") + 1, F.col("x")))
                .alias("x_lo"),
                F.min(F.when(F.col("before") + F.col("c")
                             >= F.col("n") - F.col("g"), F.col("x")))
                .alias("x_hi")))
    h = F.col("n") - 2 * F.col("g")
    w_sum = ((F.col("int_sum") + F.col("g") * F.col("x_lo")
              + F.col("g") * F.col("x_hi")).cast("double") / 100.0)
    w_ssq = ((F.col("int_ssq")
              + F.col("g").cast("double") * F.col("x_lo") * F.col("x_lo")
              + F.col("g").cast("double") * F.col("x_hi") * F.col("x_hi"))
             / 10000.0)
    t_sum = F.col("int_sum").cast("double") / 100.0
    stats = grp.select(
        "event_type", "n", h.alias("h"),
        (t_sum / h).alias("tmean"),
        ((F.col("n") - 1.0)
         * ((w_ssq - w_sum * w_sum / F.col("n")) / (F.col("n") - 1))
         / (h * (h - 1.0))).alias("d"))
    wide = stats.agg(
        F.max(F.when(F.col("event_type") == _KS_A, F.col("h"))).alias("h1"),
        F.max(F.when(F.col("event_type") == _KS_B, F.col("h"))).alias("h2"),
        F.max(F.when(F.col("event_type") == _KS_A, F.col("tmean")))
        .alias("m1"),
        F.max(F.when(F.col("event_type") == _KS_B, F.col("tmean")))
        .alias("m2"),
        F.max(F.when(F.col("event_type") == _KS_A, F.col("d"))).alias("d1"),
        F.max(F.when(F.col("event_type") == _KS_B, F.col("d"))).alias("d2"))
    return wide.select(
        F.col("h1").cast("long").alias("h1"),
        F.col("h2").cast("long").alias("h2"),
        F.round(F.col("m1") - F.col("m2"), 6).alias("trimmed_diff"),
        F.round((F.col("m1") - F.col("m2"))
                / F.sqrt(F.col("d1") + F.col("d2")), 6).alias("t_yuen"),
        F.round((F.col("d1") + F.col("d2")) * (F.col("d1") + F.col("d2"))
                / (F.col("d1") * F.col("d1") / (F.col("h1") - 1.0)
                   + F.col("d2") * F.col("d2") / (F.col("h2") - 1.0)), 6)
        .alias("df_yuen"))


# ---------------------------------------------------------------------------
# Huber M-estimator of location (3 IRLS rounds, round-scalar transfer)

_HUB_K = 50.0          # clipping width in value units
_HUB_ROUNDS = 3


def _sql_huber() -> str:
    parts = [f"""
    cells AS (
        SELECT CAST(ROUND(value * 100) AS BIGINT) AS x,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events WHERE value IS NOT NULL GROUP BY 1
    ), m0 AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n,
               ROUND(CAST(SUM(x * c) AS DOUBLE) / 100.0 / SUM(c), 6) AS mu
        FROM cells)"""]
    for r in range(1, _HUB_ROUNDS + 1):
        w = (f"LEAST(1.0, {_HUB_K} / "
             f"GREATEST(1e-9, ABS(x / 100.0 - m.mu)))")
        parts.append(f"""
    m{r} AS (
        SELECT MAX(m.n) AS n,
               ROUND((SUM(CAST(ROUND({w} * (x / 100.0) * c * 1000000)
                               AS BIGINT)) * 1.0)
                     / SUM(CAST(ROUND({w} * c * 1000000) AS BIGINT)), 6)
                   AS mu
        FROM cells CROSS JOIN m{r - 1} m)""")
    parts.append(f"""
    SELECT m0.n,
           m0.mu AS mean_value,
           m{_HUB_ROUNDS}.mu AS huber_location,
           ROUND(m0.mu - m{_HUB_ROUNDS}.mu, 6) AS outlier_pull
    FROM m0, m{_HUB_ROUNDS}""")
    return "WITH " + ",".join(parts[:-1]) + parts[-1]


@query(
    "events_huber_location",
    survey="beyond-reference (Huber 1964 M-estimator of location: "
           "fixed-round IRLS with min(1, k/|x−μ|) weights on the exact "
           "value-domain table — the robust mean whose outlier_pull "
           "column quantifies what the tail does to the plain mean)",
    oracle=_sql_huber(),
)
def events_huber_location(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Huber's robust location for event value: three IRLS rounds, each
    re-weighting every distinct value by min(1, k/|x−μ|) around the
    previous round's estimate and taking the weighted mean.  Cross-
    engine determinism: μ is ROUNDED to 6 decimals between rounds (the
    PageRank per-round discipline — one number is the whole inter-round
    state, the bounded-centroid-transfer pattern), and each round's
    numerator/denominator terms round to exact micro-ints per VALUE
    CELL before the sum, so shuffle order cannot move the estimate.
    The |x−μ| = 0 cell gets weight 1 via an epsilon guard on BOTH
    engines.  Scale: rounds × one aggregate over the bounded value
    domain; the corpus is scanned once into the cell table."""
    cells = (tbl(spark, sf_dir, "events")
             .filter(F.col("value").isNotNull())
             .groupBy(F.round(F.col("value") * 100).cast("long").alias("x"))
             .agg(F.count("*").alias("c"))
             .localCheckpoint(eager=False))
    first = cells.agg(
        F.sum("c").alias("n"),
        F.round(F.sum(F.col("x") * F.col("c")).cast("double") / 100.0
                / F.sum("c"), 6).alias("mu")).collect()[0]
    n, mu = int(first["n"]), float(first["mu"])
    mean_value = mu
    for _ in range(_HUB_ROUNDS):
        w = F.least(F.lit(1.0),
                    _HUB_K / F.greatest(F.lit(1e-9),
                                        F.abs(F.col("x") / 100.0 - mu)))
        row = cells.agg(
            F.sum(F.round(w * (F.col("x") / 100.0) * F.col("c")
                          * 1_000_000).cast("long")).alias("num"),
            F.sum(F.round(w * F.col("c") * 1_000_000).cast("long"))
            .alias("den")).collect()[0]
        mu = float(spark.sql(
            f"SELECT ROUND(({row['num']} * 1.0) / {row['den']}, 6)"
        ).collect()[0][0])
    return spark.createDataFrame(
        [(n, mean_value, mu, None)],
        "n long, mean_value double, huber_location double, _d double"
    ).select(
        "n", "mean_value", "huber_location",
        F.round(F.col("mean_value") - F.col("huber_location"), 6)
        .alias("outlier_pull"))


# ---------------------------------------------------------------------------
# Effect sizes: rank-biserial / Cliff's delta / CLES from the exact U

@query(
    "events_mwu_effect_sizes",
    survey="beyond-reference (nonparametric effect sizes from the exact "
           "Mann-Whitney U: rank-biserial r, Cliff's delta, "
           "common-language effect size — the magnitude report the "
           "significance test alone omits)",
    oracle=f"""
    WITH cells AS (
        SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
               CAST(SUM(CASE WHEN event_type = '{_KS_A}' THEN 1 ELSE 0 END)
                    AS BIGINT) AS c1,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events
        WHERE event_type IN ('{_KS_A}', '{_KS_B}') AND value IS NOT NULL
        GROUP BY 1
    ), ranked AS (
        SELECT cents, c1, c,
               CAST(COALESCE(SUM(c) OVER (ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS before
        FROM cells
    ), tot AS (
        SELECT CAST(SUM(c1) AS BIGINT) AS n1,
               CAST(SUM(c - c1) AS BIGINT) AS n2,
               CAST(SUM(c1 * (2 * before + c + 1)) AS BIGINT) AS r1_x2
        FROM ranked
    )
    SELECT n1, n2,
           ROUND((r1_x2 - n1 * (n1 + 1)) / 2.0
                 / (CAST(n1 AS DOUBLE) * n2), 6) AS cles,
           ROUND(2.0 * ((r1_x2 - n1 * (n1 + 1)) / 2.0
                 / (CAST(n1 AS DOUBLE) * n2)) - 1.0, 6) AS cliffs_delta,
           ROUND(1.0 - 2.0 * (CAST(n1 AS DOUBLE) * n2
                 - (r1_x2 - n1 * (n1 + 1)) / 2.0)
                 / (CAST(n1 AS DOUBLE) * n2), 6) AS rank_biserial
    FROM tot
    """,
)
def events_mwu_effect_sizes(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """The magnitude companions to events_mann_whitney_u, all derived
    from the same EXACT half-unit rank sum: CLES = U/(n₁n₂) (the
    probability a random group-1 value exceeds a random group-2 value,
    ties counting half), Cliff's delta = 2·CLES − 1, and the
    rank-biserial r = 1 − 2U'/(n₁n₂) — algebraically equal to delta,
    kept because literatures quote both forms and the equality is
    itself a cross-check (the two columns must agree to the rounding).
    Scale: identical physics to the U query — value-domain-bounded
    everything."""
    cells = (tbl(spark, sf_dir, "events")
             .filter(F.col("event_type").isin(_KS_A, _KS_B)
                     & F.col("value").isNotNull())
             .groupBy(F.round(F.col("value") * 100).cast("long")
                      .alias("cents"))
             .agg(F.sum(F.when(F.col("event_type") == _KS_A, 1)
                        .otherwise(0)).alias("c1"),
                  F.count("*").alias("c")))
    w_excl = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, -1)
    ranked = cells.select(
        "cents", "c1", "c",
        F.coalesce(F.sum("c").over(w_excl), F.lit(0)).alias("before"))
    tot = ranked.agg(
        F.sum("c1").alias("n1"),
        F.sum(F.col("c") - F.col("c1")).alias("n2"),
        F.sum(F.col("c1") * (2 * F.col("before") + F.col("c") + 1))
        .alias("r1_x2"))
    u1 = (F.col("r1_x2") - F.col("n1") * (F.col("n1") + 1)) / 2.0
    n1n2 = F.col("n1").cast("double") * F.col("n2")
    cles = u1 / n1n2
    return tot.select(
        "n1", "n2",
        F.round(cles, 6).alias("cles"),
        F.round(2.0 * cles - 1.0, 6).alias("cliffs_delta"),
        F.round(1.0 - 2.0 * (n1n2 - u1) / n1n2, 6).alias("rank_biserial"))


# ---------------------------------------------------------------------------
# Bias-corrected Cramér's V over the type×hour contingency

@query(
    "events_cramers_v_type_hour",
    survey="beyond-reference (Cramér's V with the Bergsma 2013 bias "
           "correction over the type×hour contingency table — the "
           "bounded 0..1 association effect size next to the mutual "
           "information; per-cell chi² terms exact-rounded)",
    oracle="""
    WITH cell AS (
        SELECT event_type, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hr,
               CAST(COUNT(*) AS BIGINT) AS n_th
        FROM events GROUP BY 1, 2
    ), margins AS (
        SELECT event_type, hr, n_th,
               CAST(SUM(n_th) OVER (PARTITION BY event_type) AS BIGINT)
                   AS r_t,
               CAST(SUM(n_th) OVER (PARTITION BY hr) AS BIGINT) AS c_h,
               CAST(SUM(n_th) OVER () AS BIGINT) AS n
        FROM cell
    ), chi AS (
        SELECT MAX(n) AS n,
               CAST(COUNT(DISTINCT event_type) AS BIGINT) AS r,
               CAST(COUNT(DISTINCT hr) AS BIGINT) AS c,
               SUM(CAST(ROUND(
                   (n_th - CAST(r_t AS DOUBLE) * c_h / n)
                   * (n_th - CAST(r_t AS DOUBLE) * c_h / n)
                   / (CAST(r_t AS DOUBLE) * c_h / n) * 1000000)
                   AS BIGINT)) AS chi2_micro
        FROM margins
    )
    SELECT n, r, c,
           ROUND(chi2_micro / 1000000.0, 6) AS chi2,
           ROUND(sqrt((chi2_micro / 1000000.0 / n)
                      / (LEAST(r, c) - 1)), 6) AS cramers_v,
           ROUND(sqrt(
               GREATEST(0.0, chi2_micro / 1000000.0 / n
                        - (r - 1.0) * (c - 1.0) / (n - 1))
               / (LEAST(r - (r - 1.0) * (r - 1.0) / (n - 1),
                        c - (c - 1.0) * (c - 1.0) / (n - 1))
                  - 1)), 6) AS cramers_v_corrected
    FROM chi
    """,
)
def events_cramers_v_type_hour(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Association strength between event type and hour of day as
    Cramér's V = √(φ²/(min(r,c)−1)) plus the Bergsma bias-corrected
    form (φ² shrunk by (r−1)(c−1)/(n−1), dimensions shrunk likewise) —
    the bounded effect size that says WHETHER the type×hour dependence
    the chi²/MI queries detect is large or trivial.  Per-cell χ² terms
    round to exact micro-ints before the sum (margins are exact window
    sums over the 120-cell table).  Scale: one corpus shuffle onto
    (type, hour); everything else is cell-table arithmetic."""
    cell = (tbl(spark, sf_dir, "events")
            .groupBy("event_type", F.hour("ts").cast("long").alias("hr"))
            .agg(F.count("*").alias("n_th")))
    margins = cell.select(
        "event_type", "hr", "n_th",
        F.sum("n_th").over(Window.partitionBy("event_type")).alias("r_t"),
        F.sum("n_th").over(Window.partitionBy("hr")).alias("c_h"),
        F.sum("n_th").over(Window.partitionBy()).alias("n"))
    e = F.col("r_t").cast("double") * F.col("c_h") / F.col("n")
    term = (F.col("n_th") - e) * (F.col("n_th") - e) / e
    chi = margins.agg(
        F.max("n").alias("n"),
        F.count_distinct("event_type").alias("r"),
        F.count_distinct("hr").alias("c"),
        F.sum(F.round(term * 1_000_000).cast("long")).alias("chi2_micro"))
    nd = F.col("n").cast("double")
    rd = F.col("r").cast("double")
    cd = F.col("c").cast("double")
    phi2 = F.col("chi2_micro") / 1_000_000.0 / nd
    phi2c = F.greatest(F.lit(0.0),
                       phi2 - (rd - 1.0) * (cd - 1.0) / (nd - 1))
    rc_ = F.least(rd - (rd - 1.0) * (rd - 1.0) / (nd - 1),
                  cd - (cd - 1.0) * (cd - 1.0) / (nd - 1))
    return chi.select(
        "n", "r", "c",
        F.round(F.col("chi2_micro") / 1_000_000.0, 6).alias("chi2"),
        F.round(F.sqrt(phi2 / (F.least(rd, cd) - 1)), 6)
        .alias("cramers_v"),
        F.round(F.sqrt(phi2c / (rc_ - 1)), 6)
        .alias("cramers_v_corrected"))


# ---------------------------------------------------------------------------
# Distributed IRLS logistic regression (3 Newton rounds, binned design)

_LRG_ROUNDS = 3


def _lrg_eta(b0: str, b1: str, b2: str) -> str:
    """One linear-predictor text both engines parse: features are the
    intercept, hour/24, and (bin+7)/16 — all exact rationals of ints."""
    return f"({b0} + {b1} * (hr / 24.0) + {b2} * ((bin + 7) / 16.0))"


def _sql_logistic() -> str:
    cells = """
    cells AS (
        SELECT CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hr,
               GREATEST(-7, LEAST(8,
                 CAST(FLOOR(ROUND(ln(CAST(value AS DOUBLE)) / ln(2.0), 9))
                      AS INTEGER))) AS bin,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS k
        FROM events WHERE value > 0 GROUP BY 1, 2),
    b0r AS (SELECT 0.0 AS b0, 0.0 AS b1, 0.0 AS b2)"""
    parts = [cells]
    for r in range(1, _LRG_ROUNDS + 1):
        eta = _lrg_eta("b.b0", "b.b1", "b.b2")
        p = f"ROUND(1.0 / (1.0 + exp(-{eta})), 12)"
        x1, x2 = "(hr / 24.0)", "((bin + 7) / 16.0)"
        terms = {
            "g0": f"(k - n * {p})",
            "g1": f"(k - n * {p}) * {x1}",
            "g2": f"(k - n * {p}) * {x2}",
            "h00": f"n * {p} * (1.0 - {p})",
            "h01": f"n * {p} * (1.0 - {p}) * {x1}",
            "h02": f"n * {p} * (1.0 - {p}) * {x2}",
            "h11": f"n * {p} * (1.0 - {p}) * {x1} * {x1}",
            "h12": f"n * {p} * (1.0 - {p}) * {x1} * {x2}",
            "h22": f"n * {p} * (1.0 - {p}) * {x2} * {x2}",
        }
        sums = ",\n               ".join(
            f"SUM(CAST(ROUND(({e}) * 1000000000) AS BIGINT)) / 1000000000.0"
            f" AS {k}" for k, e in terms.items())
        parts.append(f"""
    s{r} AS (
        SELECT {sums}
        FROM cells CROSS JOIN b{r - 1}r b)""")
        det = ("(h00 * (h11 * h22 - h12 * h12) "
               "- h01 * (h01 * h22 - h12 * h02) "
               "+ h02 * (h01 * h12 - h11 * h02))")
        d0 = ("(g0 * (h11 * h22 - h12 * h12) "
              "- h01 * (g1 * h22 - h12 * g2) "
              "+ h02 * (g1 * h12 - h11 * g2))")
        d1 = ("(h00 * (g1 * h22 - g2 * h12) "
              "- g0 * (h01 * h22 - h12 * h02) "
              "+ h02 * (h01 * g2 - g1 * h02))")
        d2 = ("(h00 * (h11 * g2 - h12 * g1) "
              "- h01 * (h01 * g2 - g1 * h02) "
              "+ g0 * (h01 * h12 - h11 * h02))")
        parts.append(f"""
    b{r}r AS (
        SELECT ROUND(b.b0 + {d0} / {det}, 9) AS b0,
               ROUND(b.b1 + {d1} / {det}, 9) AS b1,
               ROUND(b.b2 + {d2} / {det}, 9) AS b2
        FROM s{r} CROSS JOIN b{r - 1}r b)""")
    final_eta = _lrg_eta("b.b0", "b.b1", "b.b2")
    final_p = f"ROUND(1.0 / (1.0 + exp(-{final_eta})), 12)"
    parts.append(f"""
    ll AS (
        SELECT SUM(CAST(ROUND(
                 (k * ln({final_p}) + (n - k) * ln(1.0 - {final_p}))
                 * 1000000) AS BIGINT)) AS ll_micro,
               CAST(SUM(n) AS BIGINT) AS n_obs
        FROM cells CROSS JOIN b{_LRG_ROUNDS}r b)
    SELECT n_obs,
           ROUND(b.b0, 6) AS beta0, ROUND(b.b1, 6) AS beta1,
           ROUND(b.b2, 6) AS beta2,
           ROUND(ll_micro / 1000000.0, 4) AS log_likelihood
    FROM ll CROSS JOIN b{_LRG_ROUNDS}r b""")
    return "WITH " + ",".join(parts)


@query(
    "events_logistic_irls_binned",
    survey="beyond-reference (distributed logistic regression: 3 exact "
           "Newton/IRLS rounds on the binned (hour, log2-value) design "
           "predicting purchase — gradient/Hessian as nano-rounded cell "
           "sums, the 3x3 solve in closed cofactor form, inter-round "
           "betas rounded scalars; the GLM the MLlib classifier "
           "abstracts, here fully hash-checked)",
    oracle=_sql_logistic(),
)
def events_logistic_irls_binned(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Logistic regression P(purchase | hour, value-bin) trained by
    three Newton rounds, every arithmetic step pinned cross-engine:
    the corpus reduces ONCE to ≤ 24×16 design cells (n, k); each round
    evaluates p = σ(β·x) per cell (rounded to 12 decimals — the DoReMi
    exp discipline, so a last-ulp libm difference cannot leak),
    accumulates gradient and Hessian entries as nano-rounded integer
    sums (shuffle-order-proof), solves the 3×3 system by ONE cofactor
    expression, and rounds β to 9 decimals — the single inter-round
    scalar state (PageRank discipline).  The oracle unrolls the same
    three rounds as CTEs; β and the final binned log-likelihood match
    to the output rounding.  Scale: rounds × one aggregate over the
    bounded cell table; the corpus is scanned once."""
    ev = tbl(spark, sf_dir, "events").filter(F.col("value") > 0)
    bin_col = F.greatest(
        F.lit(-7), F.least(F.lit(8), F.floor(
            F.round(F.log(F.col("value").cast("double"))
                    / F.log(F.lit(2.0)), 9)).cast("int")))
    cells = (ev.groupBy(F.hour("ts").cast("long").alias("hr"),
                        bin_col.alias("bin"))
             .agg(F.count("*").alias("n"),
                  F.sum((F.col("event_type") == "purchase").cast("long"))
                  .alias("k"))
             .localCheckpoint(eager=False))
    x1 = F.col("hr") / 24.0
    x2 = (F.col("bin") + 7) / 16.0

    def nano_sum(col):
        return F.sum(F.round(col * 1_000_000_000).cast("long")) \
            / 1_000_000_000.0

    beta = (0.0, 0.0, 0.0)
    for _ in range(_LRG_ROUNDS):
        b0, b1, b2 = beta
        eta = F.lit(b0) + F.lit(b1) * x1 + F.lit(b2) * x2
        p = F.round(1.0 / (1.0 + F.exp(-eta)), 12)
        w = F.col("n") * p * (1.0 - p)
        resid = F.col("k") - F.col("n") * p
        row = cells.agg(
            nano_sum(resid).alias("g0"),
            nano_sum(resid * x1).alias("g1"),
            nano_sum(resid * x2).alias("g2"),
            nano_sum(w).alias("h00"),
            nano_sum(w * x1).alias("h01"),
            nano_sum(w * x2).alias("h02"),
            nano_sum(w * x1 * x1).alias("h11"),
            nano_sum(w * x1 * x2).alias("h12"),
            nano_sum(w * x2 * x2).alias("h22")).collect()[0]
        g0, g1, g2 = row["g0"], row["g1"], row["g2"]
        h00, h01, h02 = row["h00"], row["h01"], row["h02"]
        h11, h12, h22 = row["h11"], row["h12"], row["h22"]
        det = (h00 * (h11 * h22 - h12 * h12)
               - h01 * (h01 * h22 - h12 * h02)
               + h02 * (h01 * h12 - h11 * h02))
        d0 = (g0 * (h11 * h22 - h12 * h12)
              - h01 * (g1 * h22 - h12 * g2)
              + h02 * (g1 * h12 - h11 * g2))
        d1 = (h00 * (g1 * h22 - g2 * h12)
              - g0 * (h01 * h22 - h12 * h02)
              + h02 * (h01 * g2 - g1 * h02))
        d2 = (h00 * (h11 * g2 - h12 * g1)
              - h01 * (h01 * g2 - g1 * h02)
              + g0 * (h01 * h12 - h11 * h02))
        # ENGINE-side half-away rounding for the inter-round scalars
        nb = spark.sql(
            f"SELECT ROUND({b0!r} + {d0!r} / {det!r}, 9) AS b0, "
            f"ROUND({b1!r} + {d1!r} / {det!r}, 9) AS b1, "
            f"ROUND({b2!r} + {d2!r} / {det!r}, 9) AS b2").collect()[0]
        beta = (float(nb["b0"]), float(nb["b1"]), float(nb["b2"]))
    b0, b1, b2 = beta
    eta = F.lit(b0) + F.lit(b1) * x1 + F.lit(b2) * x2
    p = F.round(1.0 / (1.0 + F.exp(-eta)), 12)
    out = cells.agg(
        F.sum("n").cast("long").alias("n_obs"),
        (F.sum(F.round((F.col("k") * F.log(p)
                        + (F.col("n") - F.col("k")) * F.log(1.0 - p))
                       * 1_000_000).cast("long")) / 1_000_000.0)
        .alias("ll"))
    return out.select(
        "n_obs",
        F.lit(b0).alias("_b0"), F.lit(b1).alias("_b1"),
        F.lit(b2).alias("_b2"), "ll"
    ).select(
        "n_obs",
        F.round(F.col("_b0"), 6).alias("beta0"),
        F.round(F.col("_b1"), 6).alias("beta1"),
        F.round(F.col("_b2"), 6).alias("beta2"),
        F.round(F.col("ll"), 4).alias("log_likelihood"))
