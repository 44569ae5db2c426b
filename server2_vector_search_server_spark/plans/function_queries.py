"""Function-surface breadth (SURVEY.md §2 E/H/D extensions).

The reference's scalar surface is tiny (§2.H); a drop-in engine needs the
full everyday function set. Each query here packs a family into one
oracle-checked pass so parity covers semantics, not just names:

  * windows — distribution functions (ntile/percent_rank/cume_dist/
    dense_rank) and value-bounded RANGE frames;
  * grouping — explicit GROUPING SETS with GROUPING() bits, histograms,
    single-pass table profiling, winsorization;
  * scalars — string family, regex family, date/interval family, NULLIF /
    null-safe-equality three-valued-logic corners, native DECIMAL
    aggregation, array higher-order functions;
  * expansion — time-spine gap fill (sequence + explode), Python UDTF
    lateral shingles.

Most are narrow projections or single-shuffle aggregates/windows; the only
joins are broadcast (gap-fill spine, winsorize stats). Function evaluation
stays inside whole-stage codegen except the UDTF, which exists precisely to
cover the Python-table-function API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from server2_vector_search_server_spark.plans.registry import query, tbl


@query(
    "order_rank_distributions",
    survey="E-extension(distribution window functions: ntile/percent_rank/"
           "cume_dist/dense_rank)",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(ntile(4) OVER w AS INTEGER) AS price_quartile,
           CAST(dense_rank() OVER w AS BIGINT) AS price_dense_rank,
           ROUND(percent_rank() OVER w, 9) AS price_pct_rank,
           ROUND(cume_dist() OVER w, 9) AS price_cume_dist
    FROM orders
    WHERE o_orderkey % 20 = 0
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey ASC)
    ORDER BY o_orderkey
    """,
)
def order_rank_distributions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The four distribution/ranking windows in one partitioned pass. The
    (price, orderkey) compound sort key removes peer ties, making
    percent_rank/cume_dist exact rationals — identical doubles on both
    engines. One shuffle on the partition key; the pre-filter shrinks it
    20× before the exchange."""
    orders = tbl(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        orders.select(
            "o_orderkey", "o_orderpriority",
            F.ntile(4).over(w).alias("price_quartile"),
            F.dense_rank().over(w).cast("long").alias("price_dense_rank"),
            F.round(F.percent_rank().over(w), 9).alias("price_pct_rank"),
            F.round(F.cume_dist().over(w), 9).alias("price_cume_dist"))
        .orderBy("o_orderkey")
    )


@query(
    "string_functions_breadth",
    survey="H-extension(string function family: split_part/translate/lpad/"
           "reverse/instr/right/repeat)",
    oracle="""
    SELECT p_partkey,
           split_part(p_name, '_', 1) AS first_token,
           translate(p_type, 'AEO', 'aeo') AS type_translated,
           lpad(p_brand, 12, '*') AS brand_padded,
           reverse(p_name) AS name_reversed,
           CAST(strpos(p_name, '_') AS INTEGER) AS underscore_pos,
           right(p_name, 3) AS name_tail,
           repeat(left(p_type, 2), 2) AS type_echo
    FROM part
    WHERE p_partkey < 50
    ORDER BY p_partkey
    """,
)
def string_functions_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row-parallel projection covering the everyday string family.
    Spark instr == DuckDB strpos (1-based, 0 when absent); the rest are
    name-for-name equivalents — asserted by value, not by docs."""
    part = tbl(spark, sf_dir, "part").filter(F.col("p_partkey") < 50)
    return (
        part.select(
            "p_partkey",
            F.split_part(F.col("p_name"), F.lit("_"), F.lit(1))
            .alias("first_token"),
            F.translate(F.col("p_type"), "AEO", "aeo")
            .alias("type_translated"),
            F.lpad(F.col("p_brand"), 12, "*").alias("brand_padded"),
            F.reverse(F.col("p_name")).alias("name_reversed"),
            F.instr(F.col("p_name"), "_").alias("underscore_pos"),
            F.expr("right(p_name, 3)").alias("name_tail"),
            F.repeat(F.expr("left(p_type, 2)"), 2).alias("type_echo"))
        .orderBy("p_partkey")
    )


@query(
    "null_semantics_stats",
    survey="H-extension(three-valued logic: NULLIF, COUNT over nulls, "
           "null-safe equality)",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           COUNT(NULLIF(l_discount, 0.0)) AS n_discounted,
           COUNT(*) - COUNT(NULLIF(l_discount, 0.0)) AS n_zero_discount,
           CAST(SUM(CASE WHEN NULLIF(l_discount, 0.0)
                         IS NOT DISTINCT FROM NULLIF(l_tax, 0.0)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_equal,
           CAST(SUM(CASE WHEN NULLIF(l_discount, 0.0) = NULLIF(l_tax, 0.0)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_plain_equal
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def null_semantics_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued logic parity: NULLIF manufactures nulls, COUNT(col)
    skips them, `<=>` (IS NOT DISTINCT FROM) treats null=null as true while
    plain `=` yields null (so the CASE counts only non-null trues). The gap
    between the two equality counts is exactly the both-null row count —
    the semantic a migrating user most often trips over."""
    li = tbl(spark, sf_dir, "lineitem")
    disc = F.nullif(F.col("l_discount"), F.lit(0.0))
    tax = F.nullif(F.col("l_tax"), F.lit(0.0))
    return (
        li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.count(disc).alias("n_discounted"),
             (F.count(F.lit(1)) - F.count(disc)).alias("n_zero_discount"),
             F.sum(F.when(disc.eqNullSafe(tax), 1).otherwise(0))
             .alias("n_nullsafe_equal"),
             F.sum(F.when(disc == tax, 1).otherwise(0))
             .alias("n_plain_equal"))
        .orderBy("l_returnflag")
    )


@query(
    "doc_token_array_functions",
    survey="H-extension(array higher-order functions: transform/filter/"
           "exists/aggregate over token arrays)",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
           CAST(len(list_filter(string_split(text, ' '),
                                x -> length(x) > 4)) AS INTEGER)
             AS n_long_tokens,
           CAST(list_sum(list_transform(string_split(text, ' '),
                                        x -> length(x))) AS BIGINT)
             AS total_token_chars,
           CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER)
             AS n_distinct_tokens,
           list_contains(string_split(text, ' '), 'the') AS has_the,
           CAST(list_max(list_transform(string_split(text, ' '),
                                        x -> length(x))) AS INTEGER)
             AS longest_token
    FROM documents
    WHERE doc_id < 100
    ORDER BY doc_id
    """,
)
def doc_token_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions over tokenized text — transform, filter,
    exists, aggregate, array_distinct, array_max — all JVM lambda
    expressions inside codegen (the same machinery the vector ops use),
    mirrored by DuckDB's list_* family. No shuffle: one projection."""
    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = F.split(F.col("text"), " ")
    return (
        docs.select(
            "doc_id",
            F.size(toks).alias("n_tokens"),
            F.size(F.filter(toks, lambda x: F.length(x) > 4))
            .alias("n_long_tokens"),
            F.aggregate(F.transform(toks, lambda x: F.length(x)),
                        F.lit(0).cast("long"),
                        lambda acc, x: acc + x.cast("long"))
            .alias("total_token_chars"),
            F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
            F.array_contains(toks, "the").alias("has_the"),
            F.array_max(F.transform(toks, lambda x: F.length(x)))
            .alias("longest_token"))
        .orderBy("doc_id")
    )


@query(
    "events_gap_filled_hours",
    survey="H/I-extension(time-series gap fill: sequence generation + "
           "left join + zero-fill)",
    oracle="""
    WITH hours AS (
      SELECT unnest(generate_series(TIMESTAMP '2024-01-05 00:00:00',
                                    TIMESTAMP '2024-01-05 23:00:00',
                                    INTERVAL 1 HOUR)) AS hour),
    counts AS (
      SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS hour,
             COUNT(*) AS n
      FROM events
      WHERE event_type = 'purchase'
        AND CAST(ts AS DATE) = DATE '2024-01-05'
      GROUP BY hour)
    SELECT h.hour, COALESCE(c.n, 0) AS n_events
    FROM hours h LEFT JOIN counts c ON h.hour = c.hour
    ORDER BY h.hour
    """,
)
def events_gap_filled_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly series: generate the complete hour spine with
    F.sequence + explode, left-join the sparse counts, zero-fill. The spine
    is generated (never scanned) and the join is broadcast — the standard
    dense-report shape missing from plain GROUP BY (which silently drops
    empty buckets)."""
    events = tbl(spark, sf_dir, "events")
    spine = (events.sparkSession.range(1).select(
        F.explode(F.sequence(
            F.lit("2024-01-05 00:00:00").cast("timestamp"),
            F.lit("2024-01-05 23:00:00").cast("timestamp"),
            F.expr("INTERVAL 1 HOUR"))).alias("hour")))
    counts = (
        events.filter((F.col("event_type") == "purchase")
                      & (F.to_date("ts") == F.lit("2024-01-05")))
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count(F.lit(1)).alias("n")))
    return (
        spine.join(counts, "hour", "left")
        .select("hour", F.coalesce("n", F.lit(0)).alias("n_events"))
        .orderBy("hour")
    )


@query(
    "event_value_histogram",
    survey="D-extension(explicit-bin histogram over a measure)",
    oracle="""
    SELECT event_type,
           CAST(floor(value / 50.0) AS INTEGER) AS value_bin,
           COUNT(*) AS n,
           ROUND(SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 / COUNT(*),
                 6) AS bin_avg
    FROM events
    GROUP BY event_type, value_bin
    ORDER BY event_type, value_bin
    """,
)
def event_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram binning as pure column arithmetic (floor of
    the scaled measure) — one aggregate pass, bins computable without a
    distinct-values job, the shape dashboards batch over 100 TB."""
    events = tbl(spark, sf_dir, "events")
    return (
        events.withColumn("value_bin",
                          F.floor(F.col("value") / 50.0).cast("int"))
        .groupBy("event_type", "value_bin")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round((F.sum(F.round(F.col("value") * 100).cast("long"))
                      / 100.0) / F.count(F.lit(1)), 6).alias("bin_avg"))
        .orderBy("event_type", "value_bin")
    )


@query(
    "doc_shingles_udtf",
    survey="J-extension(Python UDTF: lateral one-row-to-N expansion)",
    oracle="""
    SELECT doc_id,
           CAST(i AS INTEGER) AS pos,
           array_to_string(toks[i:i+2], ' ') AS shingle
    FROM (SELECT doc_id, string_split(text, ' ') AS toks
          FROM documents WHERE doc_id < 30) d
    CROSS JOIN unnest(generate_series(1, len(toks) - 2)) AS t(i)
    ORDER BY doc_id, pos
    """,
)
def doc_shingles_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A real Python table function driven through SQL LATERAL: each
    document row fans out to its word-3-gram shingles with positions. The
    UDTF runs Arrow-batched; the oracle reproduces the expansion with
    generate_series + list slicing."""
    from server2_vector_search_server_spark.operators.udtf_ops import (
        register_udtfs,
    )

    register_udtfs(spark)
    tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 30) \
        .createOrReplaceTempView("udtf_docs")
    return spark.sql("""
        SELECT d.doc_id, s.pos, s.shingle
        FROM udtf_docs d, LATERAL word_shingles(d.text) s
        ORDER BY d.doc_id, s.pos
    """)


@query(
    "regex_functions_breadth",
    survey="H-extension(regex family: extract/replace/match)",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_brand, '#(\\d+)', 1) AS brand_num,
           regexp_replace(p_name, '_', '-', 'g') AS name_dashed,
           regexp_matches(p_name, '\\d\\d$') AS ends_two_digits,
           CAST(len(regexp_extract_all(p_name, '\\d')) AS INTEGER) AS n_digits
    FROM part
    WHERE p_partkey < 60
    ORDER BY p_partkey
    """,
)
def regex_functions_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar family in one projection: group extraction, global
    replace, anchored match, match counting. Spark and DuckDB both speak
    Java/RE2-compatible syntax for this subset; parity is asserted on
    values (regexp_replace in Spark is global by default — DuckDB needs
    the explicit 'g' flag)."""
    part = tbl(spark, sf_dir, "part").filter(F.col("p_partkey") < 60)
    return (
        part.select(
            "p_partkey",
            F.regexp_extract(F.col("p_brand"), r"#(\d+)", 1)
            .alias("brand_num"),
            F.regexp_replace(F.col("p_name"), "_", "-").alias("name_dashed"),
            F.col("p_name").rlike(r"\d\d$").alias("ends_two_digits"),
            F.size(F.expr(r"regexp_extract_all(p_name, '\\d', 0)"))
            .alias("n_digits"))
        .orderBy("p_partkey")
    )


@query(
    "decimal_exact_totals",
    survey="H-extension(native DECIMAL arithmetic: exact money totals "
           "without the scaled-integer workaround)",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
             AS total_discounted,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                      / COUNT(*), 4) AS DOUBLE) AS avg_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def decimal_exact_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine-native answer to float-sum nondeterminism: DECIMAL
    aggregation is exact integer arithmetic under the hood, so totals are
    reproducible at any parallelism WITHOUT the scaled-BIGINT pattern the
    double columns need (plans/registry.exact_sum). This is how a 100 TB
    money pipeline should store prices in the first place."""
    li = tbl(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
    return (
        li.groupBy("l_returnflag")
        .agg(F.sum(price).cast("double").alias("total_price"),
             F.sum(price * disc).cast("double").alias("total_discounted"),
             F.round(F.sum(price) / F.count(F.lit(1)), 4)
             .cast("double").alias("avg_price"))
        .orderBy("l_returnflag")
    )


@query(
    "date_functions_breadth",
    survey="H-extension(date/interval family: interval add, last_day, "
           "day-of-week, month trunc)",
    oracle="""
    SELECT o_orderkey,
           strftime(CAST(o_orderdate AS DATE) + 90, '%Y-%m-%d')
             AS due_date,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')
             AS month_end,
           CAST(dayofweek(CAST(o_orderdate AS DATE)) AS INTEGER) AS dow,
           strftime(date_trunc('month', CAST(o_orderdate AS DATE)),
                    '%Y-%m-%d') AS month_start
    FROM orders
    WHERE o_orderkey < 200
    ORDER BY o_orderkey
    """,
)
def date_functions_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/interval scalars in one projection, normalized where the
    engines disagree by convention: Spark dayofweek is 1-based
    Sunday-first, DuckDB 0-based — emitted on the DuckDB convention;
    dates serialized to strings so the pandas bridge can't reinterpret
    them."""
    orders = tbl(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    d = F.col("o_orderdate").cast("date")
    return (
        orders.select(
            "o_orderkey",
            F.date_format(F.date_add(d, 90), "yyyy-MM-dd").alias("due_date"),
            F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
            (F.dayofweek(d) - 1).alias("dow"),
            F.date_format(F.trunc(d, "month"), "yyyy-MM-dd")
            .alias("month_start"))
        .orderBy("o_orderkey")
    )


_PROFILE_COLS = ["doc_id", "lang", "n_chars", "source", "text"]

_SQL_PROFILE = "\nUNION ALL\n".join(f"""
    SELECT '{c}' AS col_name,
           COUNT(*) AS n_rows,
           COUNT(*) - COUNT({c}) AS n_nulls,
           COUNT(DISTINCT {c}) AS n_distinct,
           CAST(MIN({c}) AS VARCHAR) AS min_value,
           CAST(MAX({c}) AS VARCHAR) AS max_value
    FROM documents""" for c in _PROFILE_COLS) + "\nORDER BY col_name"


@query(
    "documents_profile",
    survey="D-extension(single-pass table profiling: nulls/distinct/min/max "
           "for every column in one scan)",
    oracle=_SQL_PROFILE,
)
def documents_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre/post-stage data-quality audit: all per-column statistics in
    ONE aggregate pass (the oracle's UNION ALL scans once per column — the
    Spark plan scans once, period), then a one-row unpivot into report
    shape."""
    from server2_vector_search_server_spark.operators.profile import profile

    return profile(tbl(spark, sf_dir, "documents"), _PROFILE_COLS,
                   exact_distinct=True)


@query(
    "events_value_winsorized",
    survey="D-extension(winsorization: percentile stats pass + broadcast "
           "clip pass)",
    oracle="""
    WITH stats AS (
      SELECT event_type,
             ROUND(quantile_cont(value, 0.01), 6) AS lo,
             ROUND(quantile_cont(value, 0.99), 6) AS hi
      FROM events GROUP BY event_type)
    SELECT e.event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN e.value < s.lo THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clipped_low,
           CAST(SUM(CASE WHEN e.value > s.hi THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clipped_high,
           ROUND(SUM(CAST(ROUND(least(greatest(e.value, s.lo), s.hi) * 100)
                          AS BIGINT)) / 100.0 / COUNT(*), 6)
             AS winsorized_avg
    FROM events e JOIN stats s USING (event_type)
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
)
def events_value_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier handling for training-feature hygiene: a per-group stats
    pass (exact p01/p99), broadcast back, clip, re-aggregate. Two scans
    total; the stats side is group-count-sized so the join is always a
    broadcast — the canonical two-pass normalize shape (same plan as
    standardization or min-max scaling)."""
    events = tbl(spark, sf_dir, "events")
    stats = (events.groupBy("event_type")
             .agg(F.round(F.expr("percentile(value, 0.01)"), 6).alias("lo"),
                  F.round(F.expr("percentile(value, 0.99)"), 6).alias("hi")))
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        events.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.when(F.col("value") < F.col("lo"), 1).otherwise(0))
             .alias("n_clipped_low"),
             F.sum(F.when(F.col("value") > F.col("hi"), 1).otherwise(0))
             .alias("n_clipped_high"),
             F.round((F.sum(F.round(clipped * 100).cast("long")) / 100.0)
                     / F.count(F.lit(1)), 6).alias("winsorized_avg"))
        .orderBy("event_type")
    )


@query(
    "events_trailing_hour_counts",
    survey="E-extension(RANGE window frame: interval-bounded trailing "
           "aggregation)",
    oracle="""
    SELECT event_id,
           COUNT(*) OVER (
             PARTITION BY user_id
             ORDER BY CAST(ts AS TIMESTAMP)
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
             AS n_last_hour
    FROM events
    ORDER BY event_id
    """,
)
def events_trailing_hour_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame bounded by VALUE distance, not row count — how many of
    this user's events fall in the trailing hour. Spark expresses the
    interval bound on the epoch-micros ordering key (rangeBetween takes
    numeric offsets); DuckDB on the timestamp directly — identical frames
    because micros ordering == timestamp ordering. The running_spend query
    covers ROWS frames; this covers the value-bounded kind."""
    from pyspark.sql import Window

    events = tbl(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy(F.unix_micros("ts"))
         .rangeBetween(-3_600_000_000, 0))
    return (
        events.select("event_id",
                      F.count(F.lit(1)).over(w).alias("n_last_hour"))
        .orderBy("event_id")
    )


_GROUPING_SETS_SQL = """
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           CAST(GROUPING(o_orderstatus) AS INTEGER) * 2
             + CAST(GROUPING(o_orderpriority) AS INTEGER) AS gid,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY gid, status, priority
"""


@query(
    "grouping_sets_order_counts",
    survey="D-extension(explicit GROUPING SETS + GROUPING() disambiguation; "
           "same literal SQL on both engines)",
    oracle=_GROUPING_SETS_SQL,
)
def grouping_sets_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hand-picked grouping sets (each dimension alone + grand total —
    neither ROLLUP nor CUBE produces exactly this) with GROUPING() bits
    distinguishing 'the NULL group' from 'the aggregated-away dimension'.
    The identical ANSI text runs on both engines, completing the
    rollup_revenue / cube_order_stats grouping-sets family."""
    from server2_vector_search_server_spark.session import load_tables

    load_tables(spark, sf_dir, "orders")
    return spark.sql(_GROUPING_SETS_SQL)


@query(
    "lineitem_stat_moments",
    survey="D-extension(statistical aggregates: corr/covar/stddev/variance)",
    oracle="""
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_extendedprice), 4)
             AS covar_qty_price,
           ROUND(stddev_samp(l_extendedprice), 4) AS stddev_price,
           ROUND(var_samp(l_quantity), 4) AS var_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def lineitem_stat_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistical aggregates — correlation, sample
    covariance/stddev/variance — one partial-aggregable pass (both engines
    use numerically stable merge formulas; parity verified at 4-6 rounded
    decimals). The feature-screening pass a training pipeline runs before
    picking columns."""
    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.round(F.corr("l_quantity", "l_extendedprice"), 6)
             .alias("corr_qty_price"),
             F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4)
             .alias("covar_qty_price"),
             F.round(F.stddev_samp("l_extendedprice"), 4)
             .alias("stddev_price"),
             F.round(F.var_samp("l_quantity"), 4).alias("var_qty"))
        .orderBy("l_returnflag")
    )


@query(
    "events_forward_fill",
    survey="E-extension(forward fill: last non-null carry-forward via "
           "IGNORE NULLS window)",
    oracle="""
    SELECT event_id,
           ROUND(LAST_VALUE(CASE WHEN event_type = 'purchase'
                                 THEN value END IGNORE NULLS)
                 OVER (PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 2) AS last_purchase_value
    FROM events
    ORDER BY event_id
    """,
)
def events_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill — each event carries the user's most recent purchase
    value (null until their first purchase). IGNORE NULLS last_value over
    an ordered running frame is THE sparse-to-dense time-series move;
    deterministic frame order via (ts, event_id)."""
    from pyspark.sql import Window

    events = tbl(spark, sf_dir, "events")
    sparse = F.when(F.col("event_type") == "purchase", F.col("value"))
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        events.select(
            "event_id",
            F.round(F.last(sparse, ignorenulls=True).over(w), 2)
            .alias("last_purchase_value"))
        .orderBy("event_id")
    )


@query(
    "date_functions_breadth2",
    survey="H-extension(date family wave 2: months_between fractional "
           "semantics, add_months end-of-month clamping, next_day, "
           "make_date, epoch round-trip)",
    oracle="""
    -- months_between mirrors Spark's exact spec: whole months plus
    -- (d1-d2)/31 fractional days, integral when both dates are month-末
    -- or share the day-of-month; next_day = smallest strictly-later Monday
    WITH base AS (
      SELECT o_orderkey,
             CAST(o_orderdate AS DATE) AS d1,
             CAST(o_orderdate AS DATE) + 37 AS d2
      FROM orders WHERE o_orderkey < 150)
    SELECT o_orderkey,
           ROUND((EXTRACT(year FROM d2) - EXTRACT(year FROM d1)) * 12
                 + (EXTRACT(month FROM d2) - EXTRACT(month FROM d1))
                 + CASE WHEN EXTRACT(day FROM d2) = EXTRACT(day FROM d1)
                          OR (d2 = last_day(d2) AND d1 = last_day(d1))
                        THEN 0.0
                        ELSE (EXTRACT(day FROM d2) - EXTRACT(day FROM d1))
                             / 31.0 END, 8) * -1.0 AS months_back,
           strftime(d1 + INTERVAL 2 MONTH, '%Y-%m-%d') AS plus_two_months,
           strftime(d1 + CAST(CASE WHEN (1 - dayofweek(d1) % 7 + 7) % 7 = 0
                              THEN 7
                              ELSE (1 - dayofweek(d1) % 7 + 7) % 7 END
                              AS INTEGER),
                    '%Y-%m-%d') AS next_monday,
           strftime(make_date(CAST(EXTRACT(year FROM d1) AS INTEGER),
                              CAST(EXTRACT(month FROM d1) AS INTEGER), 15),
                    '%Y-%m-%d') AS mid_month,
           CAST(epoch(CAST(d1 AS TIMESTAMP)) AS BIGINT) AS epoch_s,
           strftime(CAST(to_timestamp(epoch(CAST(d1 AS TIMESTAMP)))
                         AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS rt
    FROM base ORDER BY o_orderkey
    """,
)
def date_functions_breadth2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second date wave: months_between's FRACTIONAL contract (whole months
    + (day1-day2)/31, integral when both dates are month-ends or share the
    day — the subtle spec users port wrong), add_months' end-of-month
    clamping, next_day (strictly later), make_date from parts, and the
    unix-epoch round-trip. Dates serialize as strings (pandas bridge)."""
    orders = tbl(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 150)
    d1 = F.col("o_orderdate").cast("date")
    d2 = F.date_add(d1, 37)
    base = orders.select("o_orderkey", d1.alias("d1"), d2.alias("d2"))
    return (
        base.select(
            "o_orderkey",
            F.round(F.months_between(F.col("d1"), F.col("d2")), 8)
            .alias("months_back"),
            F.date_format(F.add_months(F.col("d1"), 2), "yyyy-MM-dd")
            .alias("plus_two_months"),
            F.date_format(F.next_day(F.col("d1"), "Mon"), "yyyy-MM-dd")
            .alias("next_monday"),
            F.date_format(
                F.make_date(F.year("d1"), F.month("d1"), F.lit(15)),
                "yyyy-MM-dd").alias("mid_month"),
            F.unix_timestamp(F.col("d1").cast("timestamp")).alias("epoch_s"),
            F.date_format(
                F.from_unixtime(
                    F.unix_timestamp(F.col("d1").cast("timestamp"))),
                "yyyy-MM-dd HH:mm:ss").alias("rt"))
        .orderBy("o_orderkey")
    )


@query(
    "part_pattern_matching_breadth",
    survey="H-extension(pattern matching: LIKE with ESCAPE, case-"
           "insensitive ILIKE, try_cast failure-to-NULL)",
    oracle="""
    SELECT p_partkey,
           p_name LIKE '%\\_1%' ESCAPE '\\' AS has_underscore_one,
           p_type ILIKE '%sTeEl%' AS steel_any_case,
           lower(p_brand) LIKE 'brand%' AS brand_prefix,
           TRY_CAST(split_part(p_name, '_', 2) AS BIGINT) AS second_as_num,
           CAST(TRY_CAST(p_type AS DOUBLE) IS NULL AS BOOLEAN)
             AS type_not_numeric
    FROM part
    WHERE p_partkey < 120
    ORDER BY p_partkey
    """,
)
def part_pattern_matching_breadth(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Pattern-matching contracts: LIKE with an explicit ESCAPE (matching a
    literal underscore — `_` is a wildcard, the classic silent-match bug),
    ILIKE case-insensitivity, and try_cast's failure-to-NULL (the
    ANSI-safe way to probe 'is this token numeric' without a crash)."""
    part = tbl(spark, sf_dir, "part").filter(F.col("p_partkey") < 120)
    return (
        part.select(
            "p_partkey",
            F.expr(r"p_name LIKE '%\\_1%' ESCAPE '\\'")
            .alias("has_underscore_one"),
            F.col("p_type").ilike("%sTeEl%").alias("steel_any_case"),
            F.lower(F.col("p_brand")).like("brand%").alias("brand_prefix"),
            F.expr("TRY_CAST(split_part(p_name, '_', 2) AS BIGINT)")
            .alias("second_as_num"),
            F.expr("TRY_CAST(p_type AS DOUBLE)").isNull()
            .alias("type_not_numeric"))
        .orderBy("p_partkey")
    )


@query(
    "events_iqr_grouped_agg",
    survey="J(GROUPED_AGG pandas UDF: vectorized Arrow aggregate — the one "
           "pandas-UDF flavor the rest of the surface didn't exercise)",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.75) - quantile_cont(value, 0.25), 4)
             AS iqr
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def events_iqr_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interquartile range per event type through a GROUPED_AGG pandas UDF:
    each group's values arrive as ONE Arrow batch and reduce to a scalar in
    numpy (np.percentile's linear interpolation == DuckDB quantile_cont) —
    the vectorized-UDAF surface. Rounding happens JVM-side (Python round is
    banker's — ROUND_NOTES gotcha). Partial aggregation does not apply to
    grouped-agg UDFs (whole group must meet), so the shuffle carries raw
    rows — acceptable for percentile-family aggregates, which are
    non-decomposable anyway (the decomposable path is the KLL sketch query).
    """
    import numpy as np
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit functionType: `from __future__ import annotations` stringizes
    # the Series->float hints this module-level decorator would infer from
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def iqr(v):
        vals = v.dropna().to_numpy()
        if vals.size == 0:
            return None
        q75, q25 = np.percentile(vals, [75.0, 25.0])
        return float(q75 - q25)

    ev = tbl(spark, sf_dir, "events")
    return (ev.groupBy("event_type")
            .agg(F.round(iqr(F.col("value")), 4).alias("iqr"))
            .orderBy("event_type"))


@query(
    "udtf_polymorphic_parse",
    survey="J5-extension(polymorphic Python UDTF: analyze() computes the "
           "output schema at plan time from the column-spec argument — "
           "Spark 4 dynamic-schema table function)",
    oracle="""
    SELECT event_id, event_type,
           CAST(ROUND(value, 3) AS DOUBLE) AS value
    FROM events WHERE event_id < 100
    ORDER BY event_id
    """,
)
def udtf_polymorphic_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip proof of the dynamic schema: serialize events to
    pipe-delimited lines, parse them back through ``parse_delimited`` whose
    output columns come from the spec literal via analyze() — the parsed
    relation must equal the source projection. A second call site with a
    different spec would plan a different schema from the SAME function
    (that polymorphism is unit-tested in tests/test_sketch_dsir_skyline.py).
    """
    from server2_vector_search_server_spark.operators.udtf_ops import (
        register_udtfs,
    )

    register_udtfs(spark)
    ev = tbl(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    lines = ev.select(
        F.concat_ws("|", F.col("event_id"), F.col("event_type"),
                    F.round(F.col("value"), 3)).alias("line"))
    lines.createOrReplaceTempView("udtf_lines")
    return spark.sql("""
        SELECT p.event_id, p.event_type, p.value
        FROM udtf_lines l,
             LATERAL parse_delimited(
               l.line, 'event_id bigint, event_type string, value double') p
        ORDER BY p.event_id
    """)


@query(
    "events_anomaly_mad",
    survey="D/H-extension(robust anomaly detection: median absolute "
           "deviation per group — outlier counts immune to the outliers "
           "themselves, unlike stddev z-scores)",
    oracle="""
    WITH med AS (
      SELECT event_type, ROUND(quantile_cont(value, 0.5), 6) AS med
      FROM events GROUP BY event_type),
    dev AS (
      SELECT e.event_type, e.value, m.med,
             ABS(e.value - m.med) AS adev
      FROM events e JOIN med m USING (event_type)),
    mad AS (
      SELECT event_type, ROUND(quantile_cont(adev, 0.5), 6) AS mad
      FROM dev GROUP BY event_type)
    SELECT d.event_type, ANY_VALUE(d.med) AS med, ANY_VALUE(m.mad) AS mad,
           CAST(SUM(CASE WHEN d.adev > 5.0 * m.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
           COUNT(*) AS n_rows
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    ORDER BY d.event_type
    """,
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation outlier screen per event type: median and
    MAD are each one grouped exact-percentile pass whose per-group results
    broadcast back over the fact scan (group count is tiny — the join
    never shuffles the events), then outliers are a conditional count.
    Robust statistics matter for data-quality gates precisely because a
    corrupted feed inflates stddev and hides its own anomalies; the
    median/MAD pair is unmoved by the tail it is hunting. Both medians
    rounded to 6 on both engines (percentile == quantile_cont)."""
    ev = tbl(spark, sf_dir, "events")
    med = (ev.groupBy("event_type")
           .agg(F.round(F.percentile("value", F.lit(0.5)), 6).alias("med")))
    dev = (ev.join(F.broadcast(med), "event_type")
           .withColumn("adev", F.abs(F.col("value") - F.col("med"))))
    mad = (dev.groupBy("event_type")
           .agg(F.round(F.percentile("adev", F.lit(0.5)), 6).alias("mad")))
    return (dev.join(F.broadcast(mad), "event_type")
            .groupBy("event_type")
            .agg(F.any_value("med").alias("med"),
                 F.any_value("mad").alias("mad"),
                 F.sum((F.col("adev") > 5.0 * F.col("mad")).cast("int"))
                 .cast("long").alias("n_outliers"),
                 F.count(F.lit(1)).alias("n_rows"))
            .orderBy("event_type"))


@query(
    "events_interpolated_hours",
    survey="H/I-extension(time-series LINEAR interpolation over a gapped "
           "hourly grid: LOCF carry of the previous known (hour, value) + "
           "first following known point, exact-fraction blend — the "
           "resample-and-interpolate primitive zero-fill can't express)",
    oracle="""
    WITH hours AS (
      SELECT unnest(generate_series(TIMESTAMP '2024-01-05 00:00:00',
                                    TIMESTAMP '2024-01-05 23:00:00',
                                    INTERVAL 1 HOUR)) AS hour),
    known AS (
      SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS hour,
             ROUND((SUM(CAST(ROUND(value * 1000000) AS BIGINT)) / 1000000.0)
                   / COUNT(*), 6) AS v
      FROM events
      WHERE user_id = 7 AND CAST(ts AS DATE) = DATE '2024-01-05'
      GROUP BY hour),
    grid AS (
      SELECT h.hour, k.v FROM hours h LEFT JOIN known k ON k.hour = h.hour),
    fenced AS (
      SELECT hour, v,
             last_value(CASE WHEN v IS NOT NULL
                             THEN struct_pack(h := hour, x := v) END
                        IGNORE NULLS)
               OVER (ORDER BY hour
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS prev,
             first_value(CASE WHEN v IS NOT NULL
                              THEN struct_pack(h := hour, x := v) END
                         IGNORE NULLS)
               OVER (ORDER BY hour
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS nxt
      FROM grid)
    SELECT hour,
           v AS observed,
           CASE
             WHEN v IS NOT NULL THEN v
             WHEN prev IS NULL OR nxt IS NULL THEN NULL
             ELSE ROUND(prev.x + (nxt.x - prev.x)
                        * (CAST(epoch(hour) - epoch(prev.h) AS DOUBLE)
                           / CAST(epoch(nxt.h) - epoch(prev.h) AS DOUBLE)),
                        6)
           END AS interpolated
    FROM fenced
    ORDER BY hour
    """,
)
def events_interpolated_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over a gapped hourly series (user 7's mean
    event value on one day): generate the full spine, LOCF-carry the
    previous known (hour, value) struct and mirror-carry the next known
    one with IGNORE NULLS windows, then blend by the exact hour fraction.
    Hours before the first / after the last observation stay NULL (no
    extrapolation). Known hourly means go through the scaled-BIGINT
    exact-sum so shuffle order can't move an input by an ulp, and the
    blend arithmetic is the same literal expression on both engines. At
    100 TB the same plan runs per entity: the windows partition by the
    series key, state one struct each way."""
    from server2_vector_search_server_spark.plans.registry import exact_sum

    events = tbl(spark, sf_dir, "events")
    spine = (events.sparkSession.range(1).select(
        F.explode(F.sequence(
            F.lit("2024-01-05 00:00:00").cast("timestamp"),
            F.lit("2024-01-05 23:00:00").cast("timestamp"),
            F.expr("INTERVAL 1 HOUR"))).alias("hour")))
    known = (
        events.filter((F.col("user_id") == 7)
                      & (F.to_date("ts") == F.lit("2024-01-05")))
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.round(exact_sum(F.col("value"), 6) / F.count(F.lit(1)), 6)
             .alias("v")))
    grid = spine.join(known, "hour", "left")
    from pyspark.sql import Window

    point = F.when(F.col("v").isNotNull(),
                   F.struct(F.col("hour").alias("h"), F.col("v").alias("x")))
    w_prev = (Window.orderBy("hour")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_next = (Window.orderBy("hour")
              .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    fenced = grid.select(
        "hour", "v",
        F.last(point, ignorenulls=True).over(w_prev).alias("prev"),
        F.first(point, ignorenulls=True).over(w_next).alias("nxt"))
    frac = (F.unix_timestamp("hour") - F.unix_timestamp("prev.h")) \
        .cast("double") / (F.unix_timestamp("nxt.h")
                           - F.unix_timestamp("prev.h")).cast("double")
    interp = (F.when(F.col("v").isNotNull(), F.col("v"))
              .when(F.col("prev").isNull() | F.col("nxt").isNull(),
                    F.lit(None).cast("double"))
              .otherwise(F.round(
                  F.col("prev.x")
                  + (F.col("nxt.x") - F.col("prev.x")) * frac, 6)))
    return (fenced.select("hour", F.col("v").alias("observed"),
                          interp.alias("interpolated"))
            .orderBy("hour"))


# ---------------------------------------------------------------------------
# Null-safe join semantics (<=> / IS NOT DISTINCT FROM)

@query(
    "null_safe_join_semantics",
    survey="H-extension(null-safe equality joins: <=> treats NULL as a "
           "joinable value where = silently drops every null-keyed row "
           "— the pair-count identity safe = standard + nullA*nullB "
           "pinned exactly)",
    oracle="""
    WITH a AS (
      SELECT event_id,
             CASE WHEN event_id % 10 = 0 THEN NULL
                  ELSE event_id % 7 END AS k
      FROM events WHERE event_id < 300),
    b AS (
      SELECT event_id,
             CASE WHEN (event_id - 300) % 10 = 0 THEN NULL
                  ELSE (event_id - 300) % 7 END AS k
      FROM events WHERE event_id >= 300 AND event_id < 600),
    std AS (SELECT COUNT(*) AS n FROM a JOIN b ON a.k = b.k),
    nsafe AS (SELECT COUNT(*) AS n FROM a JOIN b
              ON a.k IS NOT DISTINCT FROM b.k),
    nulls AS (
      SELECT (SELECT COUNT(*) FROM a WHERE k IS NULL)
             * (SELECT COUNT(*) FROM b WHERE k IS NULL) AS cross_n)
    SELECT CAST(std.n AS BIGINT) AS n_pairs_standard,
           CAST(nsafe.n AS BIGINT) AS n_pairs_null_safe,
           CAST(nulls.cross_n AS BIGINT) AS n_null_cross,
           (nsafe.n = std.n + nulls.cross_n) AS identity_ok
    FROM std, nsafe, nulls
    """,
)
def null_safe_join_semantics(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """The null-key join trap, pinned: a standard equi-join evaluates
    NULL = NULL to NULL and silently drops every null-keyed row (the
    classic missing-rows bug in SCD and dedup joins on nullable business
    keys); the null-safe operator (<=>, SQL's IS NOT DISTINCT FROM)
    matches them, adding exactly nullA x nullB pairs — an identity both
    engines must reproduce bit-exactly. Null-safe equality compiles to a
    plain hash join key (null hashes as a value), so the fix costs
    nothing at scale."""
    ev = tbl(spark, sf_dir, "events")
    a = (ev.filter(F.col("event_id") < 300)
         .select("event_id",
                 F.when(F.col("event_id") % 10 == 0, None)
                 .otherwise(F.col("event_id") % 7).alias("ka")))
    b = (ev.filter((F.col("event_id") >= 300) & (F.col("event_id") < 600))
         .select("event_id",
                 F.when((F.col("event_id") - 300) % 10 == 0, None)
                 .otherwise((F.col("event_id") - 300) % 7).alias("kb")))
    std = a.join(b, a.ka == b.kb).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs_standard"))
    nsafe = a.join(b, a.ka.eqNullSafe(b.kb)).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs_null_safe"))
    nulls = (a.filter(F.col("ka").isNull())
             .agg(F.count(F.lit(1)).alias("na"))
             .join(b.filter(F.col("kb").isNull())
                   .agg(F.count(F.lit(1)).alias("nb")))
             .select((F.col("na") * F.col("nb")).cast("long")
                     .alias("n_null_cross")))
    return (std.join(F.broadcast(nsafe)).join(F.broadcast(nulls))
            .select("n_pairs_standard", "n_pairs_null_safe",
                    "n_null_cross",
                    (F.col("n_pairs_null_safe")
                     == F.col("n_pairs_standard") + F.col("n_null_cross"))
                    .alias("identity_ok")))


# ---------------------------------------------------------------------------
# Arrow-native vectorized UDF (Spark 4.0 @arrow_udf — the J-family's
# newest batch-UDF API, one generation past pandas_udf)

_ARROW_Q_SCALE = 1000


@query(
    "udf_arrow_vectorized",
    survey="J-extension(@arrow_udf vectorized scalar UDF, SPARK-48459: "
           "Arrow RecordBatch in/out with NO pandas conversion — exact "
           "integer quantization folds over the flat list buffer, so "
           "the float-sum-order trap of Arrow scorers never applies)",
    oracle=f"""
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(list_sum(list_transform(embedding,
                v -> CAST(ROUND(CAST(v AS DOUBLE) * {_ARROW_Q_SCALE})
                     AS BIGINT)))) AS BIGINT) AS checksum,
           CAST(SUM(list_sum(list_transform(embedding,
                v -> CAST(ROUND(CAST(v AS DOUBLE) * {_ARROW_Q_SCALE})
                          AS BIGINT)
                     * CAST(ROUND(CAST(v AS DOUBLE) * {_ARROW_Q_SCALE})
                            AS BIGINT)))) AS BIGINT) AS energy
    FROM embeddings
    GROUP BY label ORDER BY label
    """,
)
def udf_arrow_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label quantized checksum/energy of the embedding corpus where
    the per-vector fold runs inside an ``@arrow_udf`` — Spark 4's
    Arrow-native scalar UDF: the worker hands the function a
    ``pyarrow.Array`` straight from the wire (no pandas materialization,
    no object boxing), and the implementation reduces the FLAT values
    buffer with ``np.add.reduceat`` over the list offsets — the shape
    that makes Python worth calling at 100 TB.  Floats never fold:
    each element is quantized to an exact int (half-away-from-zero,
    mirroring SQL ROUND — numpy's own round is banker's) and the sums
    are int64, so batch boundaries and reduction order cannot move the
    result (the ROUND_NOTES Arrow-scorer trap, dodged by construction).
    Scale: one scan, map-side Arrow batches, label-bounded reduce."""
    from pyspark.sql.functions import arrow_udf

    @arrow_udf("long")
    def quant_checksum(emb):
        import numpy as np
        import pyarrow as pa

        flat = emb.values.to_numpy(zero_copy_only=False).astype("float64")
        q = np.where(flat >= 0,
                     np.floor(flat * _ARROW_Q_SCALE + 0.5),
                     -np.floor(-flat * _ARROW_Q_SCALE + 0.5)).astype("int64")
        offs = emb.offsets.to_numpy(zero_copy_only=False).astype("int64")
        q = q[:offs[-1]]        # a SLICED array's values can run past the
        starts = offs[:-1]      # last offset; reduceat's final group must
        sums = (np.add.reduceat(q, starts) if len(q)  # stop at offs[-1]
                else np.array([], "int64"))
        # reduceat over equal consecutive offsets (empty lists) would
        # mis-slice; embeddings are fixed-length so starts are strictly
        # increasing by construction
        return pa.array(sums, type=pa.int64())

    @arrow_udf("long")
    def quant_energy(emb):
        import numpy as np
        import pyarrow as pa

        flat = emb.values.to_numpy(zero_copy_only=False).astype("float64")
        q = np.where(flat >= 0,
                     np.floor(flat * _ARROW_Q_SCALE + 0.5),
                     -np.floor(-flat * _ARROW_Q_SCALE + 0.5)).astype("int64")
        offs = emb.offsets.to_numpy(zero_copy_only=False).astype("int64")
        q = q[:offs[-1]]
        starts = offs[:-1]
        sums = (np.add.reduceat(q * q, starts) if len(q)
                else np.array([], "int64"))
        return pa.array(sums, type=pa.int64())

    emb = tbl(spark, sf_dir, "embeddings")
    return (emb.select("label",
                       quant_checksum("embedding").alias("cks"),
                       quant_energy("embedding").alias("nrg"))
            .groupBy("label")
            .agg(F.count(F.lit(1)).cast("long").alias("n_vecs"),
                 F.sum("cks").cast("long").alias("checksum"),
                 F.sum("nrg").cast("long").alias("energy"))
            .orderBy("label"))
