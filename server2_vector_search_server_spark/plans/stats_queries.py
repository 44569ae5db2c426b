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
