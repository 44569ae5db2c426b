"""Function-breadth wave 5: inverse-distribution aggregates (median / mode),
fault-tolerant try_* arithmetic, map higher-order functions, and array
construction/reshaping breadth.

Each query exists to pin one family's cross-engine contract — the exact
null/tie/overflow semantics a user migrating a SQL workload depends on —
with the DuckDB twin as the independent referee.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from server2_vector_search_server_spark.plans.registry import query, tbl


@query(
    "order_median_mode",
    survey="D-extension(inverse-distribution aggregates: exact median, "
           "deterministic mode)",
    oracle="""
    -- mode tie-break: DuckDB's mode() is first-seen (order-dependent), so
    -- the portable contract is min-value-among-most-frequent, computed
    -- relationally on both engines
    WITH price_counts AS (
      SELECT o_orderpriority, o_totalprice, COUNT(*) AS c
      FROM orders GROUP BY o_orderpriority, o_totalprice),
    modes AS (
      SELECT o_orderpriority, MIN(o_totalprice) AS mode_price FROM (
        SELECT o_orderpriority, o_totalprice,
               RANK() OVER (PARTITION BY o_orderpriority
                            ORDER BY c DESC) AS r
        FROM price_counts) WHERE r = 1 GROUP BY o_orderpriority)
    SELECT o.o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(MEDIAN(o.o_totalprice), 6) AS median_price,
           ROUND(ANY_VALUE(m.mode_price), 6) AS mode_price
    FROM orders o JOIN modes m USING (o_orderpriority)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def order_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact MEDIAN (linear-interpolated 0.5-quantile — a full sort per
    group at scale, which is why percentile_approx exists as the one-pass
    sketch twin) and a DETERMINISTIC mode: both engines' native mode() is
    first-seen under ties, so the portable contract computes
    min-among-most-frequent via a count + rank — the only mode definition
    that survives a distributed shuffle unchanged."""
    orders = tbl(spark, sf_dir, "orders")
    counts = (orders.groupBy("o_orderpriority", "o_totalprice")
              .agg(F.count(F.lit(1)).alias("c")))
    from pyspark.sql import Window
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("c").desc())
    modes = (counts.withColumn("r", F.rank().over(w)).filter("r = 1")
             .groupBy("o_orderpriority")
             .agg(F.min("o_totalprice").alias("mode_price")))
    return (
        orders.join(modes, "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.round(F.median("o_totalprice"), 6).alias("median_price"),
             F.round(F.any_value("mode_price"), 6).alias("mode_price"))
        .orderBy("o_orderpriority")
    )


@query(
    "lineitem_try_arithmetic",
    survey="H-extension(fault-tolerant arithmetic: try_divide semantics — "
           "NULL on division by zero instead of error/Inf)",
    oracle="""
    SELECT l_linenumber,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN l_discount = 0.0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_zero_discount,
           CAST(SUM(CASE WHEN l_discount = 0.0 THEN NULL
                     ELSE CAST(ROUND(l_extendedprice / l_discount)
                               AS BIGINT) END) AS BIGINT)
             AS sum_price_per_discount,
           CAST(COUNT(CASE WHEN l_discount = 0.0 THEN NULL
                      ELSE l_extendedprice / l_discount END)
                AS BIGINT) AS n_defined
    FROM lineitem
    GROUP BY l_linenumber
    ORDER BY l_linenumber
    """,
)
def lineitem_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_divide: NULL on zero denominator (ANSI-mode-safe arithmetic).
    DuckDB double division by zero yields Inf, not NULL, so the oracle spells
    the same semantics with CASE — the point is the CONTRACT (nulls flow
    through SUM/COUNT silently), which both engines then aggregate
    identically. Ratios are rounded to integers before summing: summing
    raw doubles in different orders drifts at the last ulp."""
    li = tbl(spark, sf_dir, "lineitem")
    ratio = F.try_divide(F.col("l_extendedprice"), F.col("l_discount"))
    return (
        li.groupBy("l_linenumber")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.sum((F.col("l_discount") == 0.0).cast("long"))
             .alias("n_zero_discount"),
             F.sum(F.round(ratio).cast("long"))
             .alias("sum_price_per_discount"),
             F.count(ratio).alias("n_defined"))
        .orderBy("l_linenumber")
    )


@query(
    "event_map_higher_order",
    survey="H-extension(map higher-order functions: transform_keys/values, "
           "map_filter, map_zip_with)",
    oracle="""
    -- the map is rebuilt as sorted key/value CSV strings (the only portable
    -- representation of an unordered MAP value across engines)
    WITH base AS (
      SELECT user_id % 50 AS user_bucket, event_type, COUNT(*) AS c
      FROM events GROUP BY user_bucket, event_type),
    m AS (
      SELECT user_bucket,
             list_sort(list(upper(event_type))) AS uk,
             list_sort(list(event_type) FILTER (WHERE c >= 10)) AS big_keys,
             list_sort(list(event_type || '=' || CAST(c * 2 AS VARCHAR)))
               AS doubled
      FROM base GROUP BY user_bucket)
    SELECT user_bucket,
           array_to_string(uk, ',') AS upper_keys,
           coalesce(array_to_string(big_keys, ','), '') AS frequent_keys,
           array_to_string(doubled, ',') AS doubled_counts
    FROM m ORDER BY user_bucket
    """,
)
def event_map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP higher-order functions over a genuinely map-typed column:
    transform_keys (upper-case), map_filter (count >= 10), transform_values
    (double) — then serialized to sorted CSV because a MAP has no defined
    order anywhere (Spark, DuckDB, or parquet) and sorted-string form is the
    only hashable cross-engine contract."""
    events = tbl(spark, sf_dir, "events")
    base = (events.withColumn("user_bucket", F.col("user_id") % 50)
            .groupBy("user_bucket", "event_type")
            .agg(F.count(F.lit(1)).alias("c")))
    m = (base.groupBy("user_bucket")
         .agg(F.map_from_entries(
             F.sort_array(F.collect_list(F.struct("event_type", "c"))))
             .alias("counts")))
    upper_keys = F.map_keys(
        F.transform_keys(F.col("counts"), lambda k, v: F.upper(k)))
    frequent = F.map_keys(
        F.map_filter(F.col("counts"), lambda k, v: v >= 10))
    doubled = F.transform_values(F.col("counts"), lambda k, v: v * 2)
    doubled_csv = F.transform(
        F.map_entries(doubled),
        lambda e: F.concat_ws("=", e["key"], e["value"].cast("string")))
    return (
        m.select(
            "user_bucket",
            F.array_join(F.sort_array(upper_keys), ",").alias("upper_keys"),
            F.array_join(F.sort_array(frequent), ",").alias("frequent_keys"),
            F.array_join(F.sort_array(doubled_csv), ",")
            .alias("doubled_counts"))
        .orderBy("user_bucket")
    )


@query(
    "doc_array_reshaping",
    survey="H-extension(array construction/reshaping: slice, flatten, "
           "array_repeat, array_compact, array_position)",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         t -> t != '') AS w
      FROM documents WHERE doc_id < 100)
    SELECT doc_id,
           array_to_string(w[1:5], ',') AS first5,
           array_to_string(flatten([w[1:2], w[3:4]]), ',') AS flat4,
           array_to_string(list_transform(range(3),
             i -> list_extract(w, 1)), ',') AS head_x3,
           CAST(len(list_filter(w, t -> t = 'the')) AS INTEGER)
             AS n_the,
           CAST(coalesce(list_position(w, 'the'), 0) AS INTEGER)
             AS first_the_pos
    FROM toks ORDER BY doc_id
    """,
)
def doc_array_reshaping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array reshaping family: slice (1-based, both engines), flatten of
    nested slices, array_repeat, occurrence count, and 1-based
    array_position with 0 = absent (Spark's native convention; the oracle
    coalesces DuckDB's NULL to the same sentinel)."""
    from server2_vector_search_server_spark.functions.text import tokens

    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    w = tokens(F.col("text"))
    return (
        docs.select(
            "doc_id",
            F.array_join(F.slice(w, 1, 5), ",").alias("first5"),
            F.array_join(F.flatten(F.array(F.slice(w, 1, 2),
                                           F.slice(w, 3, 2))), ",")
            .alias("flat4"),
            F.array_join(F.array_repeat(F.element_at(w, 1), 3), ",")
            .alias("head_x3"),
            F.size(F.filter(w, lambda t: t == "the")).cast("int")
            .alias("n_the"),
            F.array_position(w, "the").cast("int").alias("first_the_pos"))
        .orderBy("doc_id")
    )


@query(
    "lineitem_moment_aggregates",
    survey="D-extension(statistical moment aggregates: corr, covariance, "
           "stddev, skewness, kurtosis)",
    oracle="""
    -- Spark's skewness/kurtosis are POPULATION g1 / excess g2; DuckDB's
    -- natives are bias-corrected sample forms, so the oracle derives the
    -- population definitions from central moments — the oracle is the
    -- semantic spec, not a function-name mirror.
    WITH mu AS (
      SELECT l_returnflag, AVG(l_quantity) AS m
      FROM lineitem GROUP BY l_returnflag),
    cm AS (
      SELECT l.l_returnflag,
             AVG(POW(l.l_quantity - mu.m, 2)) AS m2,
             AVG(POW(l.l_quantity - mu.m, 3)) AS m3,
             AVG(POW(l.l_quantity - mu.m, 4)) AS m4
      FROM lineitem l JOIN mu USING (l_returnflag)
      GROUP BY l.l_returnflag)
    SELECT l.l_returnflag,
           ROUND(corr(l.l_quantity, l.l_extendedprice), 6) AS qty_price_corr,
           ROUND(covar_samp(l.l_quantity, l.l_extendedprice), 4)
             AS qty_price_covar,
           ROUND(covar_pop(l.l_quantity, l.l_extendedprice), 4)
             AS qty_price_covar_pop,
           ROUND(stddev_samp(l.l_quantity), 6) AS qty_stddev,
           ROUND(ANY_VALUE(cm.m3) / POW(ANY_VALUE(cm.m2), 1.5), 6)
             AS qty_skewness,
           ROUND(ANY_VALUE(cm.m4) / POW(ANY_VALUE(cm.m2), 2) - 3, 6)
             AS qty_kurtosis
    FROM lineitem l JOIN cm USING (l_returnflag)
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
)
def lineitem_moment_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher statistical moments as native one-pass aggregates: corr /
    covar_samp / covar_pop / stddev_samp / skewness / kurtosis. All are
    partial-aggregable (merged via the pairwise moment-update formulas), so
    the shuffle carries one moment tuple per group regardless of corpus
    size — the reason these run as ONE pass where the textbook definition
    needs two (mean first, then centered powers; the oracle takes the
    two-pass route and lands on the same rounded values)."""
    li = tbl(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    return (
        li.groupBy("l_returnflag")
        .agg(F.round(F.corr(q, F.col("l_extendedprice")), 6)
             .alias("qty_price_corr"),
             F.round(F.covar_samp(q, F.col("l_extendedprice")), 4)
             .alias("qty_price_covar"),
             F.round(F.covar_pop(q, F.col("l_extendedprice")), 4)
             .alias("qty_price_covar_pop"),
             F.round(F.stddev_samp(q), 6).alias("qty_stddev"),
             F.round(F.skewness(q), 6).alias("qty_skewness"),
             F.round(F.kurtosis(q), 6).alias("qty_kurtosis"))
        .orderBy("l_returnflag")
    )


@query(
    "events_window_navigation",
    survey="E-extension(window navigation: first/last/nth_value, "
           "IGNORE NULLS)",
    oracle="""
    -- 'error' events carry no usable value (NULLIF) — IGNORE NULLS
    -- navigation must skip them while plain navigation sees NULL
    WITH base AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      FROM events WHERE user_id < 200)
    SELECT user_id, event_id,
           ROUND(first_value(v IGNORE NULLS) OVER w, 6) AS first_valid,
           ROUND(last_value(v IGNORE NULLS) OVER w, 6) AS last_valid,
           ROUND(nth_value(v, 2 IGNORE NULLS) OVER w, 6) AS second_valid,
           ROUND(last_value(v) OVER w, 6) AS last_raw
    FROM base
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
)
def events_window_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window navigation family under a running frame: first_value /
    last_value / nth_value with IGNORE NULLS (skip the error events) vs the
    null-propagating default — per-user ordered state that shards by
    user_id across executors (same partitioning as every other per-entity
    window here, so at scale these chain without re-shuffles)."""
    from pyspark.sql import Window

    events = tbl(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    v = F.when(F.col("event_type") == "error", None) \
        .otherwise(F.col("value"))
    base = events.select("user_id", "ts", "event_id", v.alias("v"))
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        base.select(
            "user_id", "event_id",
            F.round(F.first("v", ignorenulls=True).over(w), 6)
            .alias("first_valid"),
            F.round(F.last("v", ignorenulls=True).over(w), 6)
            .alias("last_valid"),
            F.round(F.nth_value("v", 2, ignoreNulls=True).over(w), 6)
            .alias("second_valid"),
            F.round(F.last("v").over(w), 6).alias("last_raw"))
        .orderBy("user_id", "event_id")
    )


@query(
    "order_extremes_by",
    survey="D-extension(argument-extremum aggregates: max_by / min_by, the "
           "arg_max/arg_min family)",
    oracle="""
    -- tie-safe: the comparison value is made unique by folding the key in
    -- at 1e-6 scale, so both engines' arg-extremum pick the same row
    SELECT o_orderpriority,
           arg_max(o_orderkey, o_totalprice + o_orderkey / 1000000.0)
             AS biggest_order,
           arg_min(o_orderkey, o_totalprice + o_orderkey / 1000000.0)
             AS smallest_order,
           ROUND(MAX(o_totalprice), 6) AS max_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def order_extremes_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by / min_by (SQL-2023 arg-extremum aggregates): fetch the KEY of
    the extreme row without a self-join or window — one partial-aggregable
    pass, the idiom that replaces the row_number()=1 pattern for single-row
    extremes. Ties are undefined in both engines, so the contract makes the
    ordering value unique (price + key·1e-6) — the portable discipline for
    deterministic arg-extremum results."""
    orders = tbl(spark, sf_dir, "orders")
    u = F.col("o_totalprice") + F.col("o_orderkey") / 1_000_000.0
    return (
        orders.groupBy("o_orderpriority")
        .agg(F.max_by("o_orderkey", u).alias("biggest_order"),
             F.min_by("o_orderkey", u).alias("smallest_order"),
             F.round(F.max("o_totalprice"), 6).alias("max_price"))
        .orderBy("o_orderpriority")
    )


@query(
    "part_string_formatting",
    survey="H-extension(string formatting family: printf, pad, translate, "
           "reverse, chr/ascii round-trip)",
    oracle="""
    SELECT p_partkey,
           printf('%s #%d [size %d]', p_brand, p_partkey, p_size) AS label,
           lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded_key,
           rpad(p_brand, 12, '.') AS padded_brand,
           translate(p_type, 'AEIOU', 'aeiou') AS folded_type,
           reverse(p_name) AS reversed_name,
           chr(65 + CAST(p_partkey % 26 AS INTEGER)) AS bucket_letter,
           ascii(p_brand) AS brand_first_code
    FROM part WHERE p_partkey < 200
    ORDER BY p_partkey
    """,
)
def part_string_formatting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """printf-style formatting, fixed-width padding, character translation,
    reverse, and the chr/ascii round-trip — the deterministic string-prep
    family (all fuse into the scan; the classic use is building composite
    keys and display labels without UDFs)."""
    part = tbl(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    return (
        part.select(
            "p_partkey",
            F.format_string("%s #%d [size %d]", F.col("p_brand"),
                            F.col("p_partkey"), F.col("p_size"))
            .alias("label"),
            F.lpad(F.col("p_partkey").cast("string"), 8, "0")
            .alias("padded_key"),
            F.rpad(F.col("p_brand"), 12, ".").alias("padded_brand"),
            F.translate(F.col("p_type"), "AEIOU", "aeiou")
            .alias("folded_type"),
            F.reverse(F.col("p_name")).alias("reversed_name"),
            F.chr(F.lit(65) + (F.col("p_partkey") % 26)).alias("bucket_letter"),
            F.ascii(F.col("p_brand")).alias("brand_first_code"))
        .orderBy("p_partkey")
    )


@query(
    "doc_explode_outer_semantics",
    survey="H-extension(explode vs explode_outer: empty-collection row "
           "preservation — the LEFT JOIN LATERAL contract)",
    oracle="""
    -- docs are given a digits-only token array (often EMPTY): plain UNNEST
    -- drops those docs, the outer form keeps them with a NULL token
    WITH toks AS (
      SELECT doc_id,
             list_filter(list_filter(string_split_regex(trim(text), '\\s+'),
                         t -> t != ''), t -> regexp_matches(t, '^[0-9]+$'))
               AS digit_toks
      FROM documents WHERE doc_id < 150),
    plain AS (
      SELECT COUNT(*) AS n FROM toks, UNNEST(digit_toks) AS u(t)),
    outer_form AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CASE WHEN t.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null_rows
      FROM toks LEFT JOIN LATERAL UNNEST(toks.digit_toks) AS t(tok)
                ON TRUE)
    SELECT (SELECT n FROM plain) AS n_plain_rows,
           (SELECT n FROM outer_form) AS n_outer_rows,
           (SELECT n_null_rows FROM outer_form) AS n_empty_docs
    """,
)
def doc_explode_outer_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode vs explode_outer on a frequently-empty array column: the
    outer form preserves empty-collection rows as NULL (LEFT JOIN LATERAL
    semantics) — the difference between silently losing documents and
    keeping them through a tokenize-then-flatten pipeline."""
    from server2_vector_search_server_spark.functions.text import tokens

    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    toks = docs.select(
        "doc_id",
        F.filter(tokens(F.col("text")),
                 lambda t: t.rlike("^[0-9]+$")).alias("digit_toks"))
    n_plain = (toks.select(F.explode("digit_toks").alias("tok"))
               .agg(F.count(F.lit(1)).alias("n_plain_rows")))
    outer = (toks.select(F.explode_outer("digit_toks").alias("tok"))
             .agg(F.count(F.lit(1)).alias("n_outer_rows"),
                  F.sum(F.col("tok").isNull().cast("long"))
                  .alias("n_empty_docs")))
    return n_plain.crossJoin(outer)


@query(
    "events_json_roundtrip",
    survey="H-extension(typed JSON round-trip: to_json of nested "
           "struct/array -> from_json with explicit schema -> nested "
           "field access)",
    oracle=f"""
    -- rebuild the same document with DuckDB's json_object, then extract
    -- the same paths: the CONTRACT is that values survive the round-trip,
    -- not that the two engines' JSON text is byte-identical
    WITH built AS (
      SELECT json_object('id', event_id,
                         'who', json_object('type', event_type,
                                            'uid', user_id),
                         'vals', [value, value * 2]) AS doc
      FROM events WHERE user_id < 500),
    parsed AS (
      SELECT CAST(json_extract_string(doc, '$.who.type') AS VARCHAR)
               AS etype,
             CAST(json_extract(doc, '$.who.uid') AS BIGINT) % 100
               AS uid_bucket,
             CAST(json_extract(doc, '$.vals[1]') AS DOUBLE) AS v2
      FROM built)
    SELECT etype, uid_bucket,
           COUNT(*) AS n,
           {{exact_v2}} AS total_v2
    FROM parsed
    GROUP BY etype, uid_bucket
    ORDER BY etype, uid_bucket
    """.replace("{exact_v2}", "(SUM(CAST(ROUND(v2 * 100) AS BIGINT)) "
                              "/ 100.0)"),
)
def events_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON round-trip: serialize a nested struct + array document
    with to_json, parse it back with from_json under an EXPLICIT schema
    (the production contract — schema-on-read, not schemaless), then
    navigate parsed.who.* / vals[2]. Both engines re-extract the same
    values regardless of their JSON text formatting; doubles survive
    because both serializers emit shortest-round-trip decimals."""
    events = tbl(spark, sf_dir, "events").filter(F.col("user_id") < 500)
    doc = F.to_json(F.struct(
        F.col("event_id").alias("id"),
        F.struct(F.col("event_type").alias("type"),
                 F.col("user_id").alias("uid")).alias("who"),
        F.array(F.col("value"), F.col("value") * 2).alias("vals")))
    parsed = F.from_json(
        doc, "id bigint, who struct<type:string,uid:bigint>, "
             "vals array<double>")
    base = events.select(
        parsed["who"]["type"].alias("etype"),
        (parsed["who"]["uid"] % 100).alias("uid_bucket"),
        F.element_at(parsed["vals"], 2).alias("v2"))
    return (
        base.groupBy("etype", "uid_bucket")
        .agg(F.count(F.lit(1)).alias("n"),
             (F.sum(F.round(F.col("v2") * 100).cast("long")) / 100.0)
             .alias("total_v2"))
        .orderBy("etype", "uid_bucket")
    )


@query(
    "order_percentile_disc",
    survey="D-extension(ANSI inverse distribution: percentile_disc WITHIN "
           "GROUP — smallest value with cume_dist >= p)",
    oracle="""
    -- the ANSI definition spelled relationally: for each p, the smallest
    -- value whose cumulative distribution reaches p
    WITH cd AS (
      SELECT o_orderpriority, o_totalprice,
             cume_dist() OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice) AS cd
      FROM orders)
    SELECT o_orderpriority,
           ROUND(MIN(CASE WHEN cd >= 0.25 THEN o_totalprice END), 6) AS p25,
           ROUND(MIN(CASE WHEN cd >= 0.50 THEN o_totalprice END), 6) AS p50,
           ROUND(MIN(CASE WHEN cd >= 0.75 THEN o_totalprice END), 6) AS p75
    FROM cd
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def order_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_disc WITHIN GROUP: the DISCRETE inverse distribution —
    always returns an actual data value (smallest with cume_dist >= p),
    unlike percentile_cont's interpolation (order_value_percentiles). The
    oracle spells the ANSI definition with a cume_dist window, so Spark's
    native aggregate is checked against the standard's semantics, not
    another engine's implementation choice."""
    orders = tbl(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(F.round(F.expr(
            "percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice)"),
            6).alias("p25"),
             F.round(F.expr(
            "percentile_disc(0.50) WITHIN GROUP (ORDER BY o_totalprice)"),
            6).alias("p50"),
             F.round(F.expr(
            "percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice)"),
            6).alias("p75"))
        .orderBy("o_orderpriority")
    )


@query(
    "nation_customer_listagg",
    survey="H(native LISTAGG ... WITHIN GROUP — the ANSI ordered string "
           "aggregation Spark 4.1 added; deterministic ORDER BY is the "
           "portability contract)",
    oracle="""
    SELECT n.n_name,
           COUNT(*) AS n_customers,
           string_agg(CAST(c.c_custkey AS VARCHAR), ','
                      ORDER BY c.c_custkey) AS custkeys,
           string_agg(c.c_mktsegment, '|'
                      ORDER BY c.c_mktsegment DESC, c.c_custkey)
             AS segments_desc
    FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE c.c_custkey < 120
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
)
def nation_customer_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``listagg(expr, sep) WITHIN GROUP (ORDER BY ...)`` (Spark 4.1)
    — including a DESC multi-key ordering — against DuckDB's
    ``string_agg(expr, sep ORDER BY ...)``. Ordered string aggregation is
    only portable when the order is total (c_custkey tiebreak on the
    second aggregate); the earlier `segment_nation_roster` pins the
    sorted-collect_set fallback contract, this pins the ANSI clause
    itself."""
    load_tables = tbl(spark, sf_dir, "customer"), tbl(spark, sf_dir, "nation")
    for name, df in zip(("customer", "nation"), load_tables):
        df.createOrReplaceTempView(name)
    return spark.sql("""
        SELECT n.n_name,
               COUNT(*) AS n_customers,
               listagg(CAST(c.c_custkey AS STRING), ',')
                 WITHIN GROUP (ORDER BY c.c_custkey) AS custkeys,
               listagg(c.c_mktsegment, '|')
                 WITHIN GROUP (ORDER BY c.c_mktsegment DESC, c.c_custkey)
                 AS segments_desc
        FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
        WHERE c.c_custkey < 120
        GROUP BY n.n_name
        ORDER BY n.n_name
    """)


@query(
    "sql_session_variables",
    survey="H(SQL session variables: DECLARE / SET VAR / IDENTIFIER-free "
           "parameterized SQL — the Spark 4 surface for value "
           "parameterization without string interpolation)",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           (SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0)
             AS total_value
    FROM orders
    WHERE o_totalprice > 150000.0 AND o_orderdate >= DATE '1995-01-01'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def sql_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL session variables (Spark 4): thresholds DECLAREd and SET once,
    referenced by name in the query — the engine-level analog of the
    reference's request-scoped parameters (k, score thresholds), without
    string interpolation or driver-side plan rebuilds. The oracle is the
    same query with the values inlined: variable references must be
    constant-folded into identical predicates (pushdown still applies)."""
    tbl(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    spark.sql("DECLARE OR REPLACE VARIABLE price_floor DOUBLE")
    spark.sql("DECLARE OR REPLACE VARIABLE cutoff_date DATE")
    spark.sql("SET VAR price_floor = 150000.0")
    spark.sql("SET VAR cutoff_date = DATE '1995-01-01'")
    return spark.sql("""
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               (SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0D)
                 AS total_value
        FROM orders
        WHERE o_totalprice > price_floor AND o_orderdate >= cutoff_date
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """)


# ---------------------------------------------------------------------------
# Benford first-digit conformance (fraud/data-quality screen)

@query(
    "orders_benford_digit_test",
    survey="breadth extension(Benford's-law first-digit screen over order "
           "totals: digit extraction by guarded log10 arithmetic, exact "
           "counts, per-digit chi-square contributions — the classic "
           "fabricated-data detector)",
    oracle="""
    WITH d AS (
      SELECT CAST(FLOOR(ROUND(o_totalprice
               / pow(10.0, FLOOR(ROUND(log10(o_totalprice), 9))), 9))
             AS INTEGER) AS digit
      FROM orders WHERE o_totalprice > 0),
    obs AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS observed
            FROM d GROUP BY digit),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
    e AS (
      SELECT dd.digit,
             CAST(ROUND(ROUND(log10(1.0 + 1.0 / dd.digit), 9) * 1000000)
                  AS BIGINT) AS exp_micro
      FROM UNNEST(range(1, 10)) AS dd(digit))
    SELECT e.digit, COALESCE(obs.observed, 0) AS observed,
           ROUND(e.exp_micro / 1000000.0, 6) AS expected_share,
           ROUND(pow(COALESCE(obs.observed, 0)
                     - n.n * (e.exp_micro / 1000000.0), 2)
                 / (n.n * (e.exp_micro / 1000000.0)), 6) AS chi2_term
    FROM e LEFT JOIN obs ON obs.digit = e.digit CROSS JOIN n
    ORDER BY e.digit
    """,
)
def orders_benford_digit_test(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Benford's-law conformance of order totals: leading-digit counts vs
    the log10(1 + 1/d) law, with per-digit chi-square contributions — the
    standard screen for fabricated or truncated numeric columns in data-
    quality audits. Digit extraction guards both FLOOR steps with
    round(.,9) so values at exact powers of ten cannot straddle an engine
    ulp seam (the WoE log2-bin discipline).

    Scale shape: one projection + one groupBy onto a NINE-value key;
    everything else is a bounded join against the generated digit
    spine."""
    orders = tbl(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digit = F.floor(F.round(
        F.col("o_totalprice")
        / F.pow(F.lit(10.0), F.floor(F.round(F.log10("o_totalprice"), 9))),
        9)).cast("int")
    obs = (orders.select(digit.alias("digit"))
           .groupBy("digit").agg(F.count(F.lit(1)).cast("long")
                                 .alias("observed")))
    n = obs.agg(F.sum("observed").cast("long").alias("n"))
    e = (spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
         .withColumn("exp_micro",
                     F.round(F.round(F.log10(1.0 + 1.0 / F.col("digit")), 9)
                             * 1_000_000).cast("long")))
    return (e.join(obs, "digit", "left").join(F.broadcast(n))
            .select("digit",
                    F.coalesce("observed", F.lit(0)).alias("observed"),
                    F.round(F.col("exp_micro") / 1_000_000.0, 6)
                    .alias("expected_share"),
                    F.round(F.pow(F.coalesce("observed", F.lit(0))
                                  - F.col("n")
                                  * (F.col("exp_micro") / 1_000_000.0), 2)
                            / (F.col("n")
                               * (F.col("exp_micro") / 1_000_000.0)), 6)
                    .alias("chi2_term"))
            .orderBy("digit"))


# ---------------------------------------------------------------------------
# Simpson's-paradox screen: aggregate vs per-stratum regression slopes



def _sql_simpson_slope(group_cols: str, label: str) -> str:
    """Exact-integer OLS slope of extendedprice on quantity: cents/scaled
    units so n*Sxy - Sx*Sy and n*Sxx - Sx^2 are BIGINTs (the Zipf normal-
    equations pattern, per stratum)."""
    return f"""
    SELECT {label} AS stratum,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND((CAST(COUNT(*) AS DOUBLE) * CAST(SUM(qx * py) AS DOUBLE)
                  - CAST(SUM(qx) AS DOUBLE) * CAST(SUM(py) AS DOUBLE))
                 / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(qx * qx) AS DOUBLE)
                    - CAST(SUM(qx) AS DOUBLE) * CAST(SUM(qx) AS DOUBLE))
                 / 100.0, 6) AS slope
    FROM (SELECT CAST(ROUND(l_quantity) AS BIGINT) AS qx,
                 CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                   AS py{', ' + group_cols if group_cols else ''}
          FROM lineitem)
    {f'GROUP BY {group_cols}' if group_cols else ''}
    """


@query(
    "lineitem_simpsons_screen",
    survey="breadth extension(Simpson's-paradox screen: price-on-quantity "
           "OLS slope computed overall AND per return-flag stratum from "
           "exact integer normal equations; flags any stratum whose "
           "slope sign disagrees with the aggregate)",
    oracle=f"""
    WITH overall AS ({_sql_simpson_slope('', "'__all__'")}),
    strata AS ({_sql_simpson_slope('l_returnflag', 'l_returnflag')})
    SELECT s.stratum, s.n_rows, s.slope,
           o.slope AS overall_slope,
           (s.slope * o.slope < 0) AS sign_flip
    FROM (SELECT * FROM overall UNION ALL SELECT * FROM strata) s
    CROSS JOIN overall o
    ORDER BY s.stratum
    """,
)
def lineitem_simpsons_screen(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Simpson's-paradox audit: the aggregate regression slope of
    extended price on quantity next to each return-flag stratum's slope,
    flagging sign reversals — the lurking-variable screen every
    observational metric review should run before trusting a pooled
    trend. The moment sums fold as exact BIGINTs; the normal-equation
    products then run in DOUBLE with identical op order on both engines
    (at fact-table n the n*Sxy product overflows int64 — the Zipf form
    only stays integral because its point count is bounded).

    Scale shape: ONE scan feeds both grains (the overall row re-uses the
    stratum aggregates' physics — a second partial-agg pass over the
    same projection); everything else is bounded-row arithmetic."""
    li = tbl(spark, sf_dir, "lineitem")
    # quantity is integral and price has cents — minimal exact scales
    # keep SUM(qx*py) inside int64 out to ~sf100 (1e4 scaling overflowed
    # the product sum at sf0.1 under ANSI mode)
    base = li.select(
        "l_returnflag",
        F.round(F.col("l_quantity")).cast("long").alias("qx"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("py"))

    def slopes(grouped):
        agg = grouped.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("qx").alias("sx"), F.sum("py").alias("sy"),
            F.sum(F.col("qx") * F.col("py")).alias("sxy"),
            F.sum(F.col("qx") * F.col("qx")).alias("sxx"))
        nd = F.col("n_rows").cast("double")
        return agg.select(
            "*",
            (F.round((nd * F.col("sxy").cast("double")
                      - F.col("sx").cast("double")
                      * F.col("sy").cast("double"))
                     / (nd * F.col("sxx").cast("double")
                        - F.col("sx").cast("double")
                        * F.col("sx").cast("double"))
                     / 100.0, 6)).alias("slope"))

    overall = (slopes(base.groupBy())
               .select(F.lit("__all__").alias("stratum"), "n_rows",
                       "slope"))
    strata = (slopes(base.groupBy("l_returnflag"))
              .select(F.col("l_returnflag").alias("stratum"), "n_rows",
                      "slope"))
    o = overall.select(F.col("slope").alias("overall_slope"))
    return (overall.unionByName(strata).join(F.broadcast(o))
            .select("stratum", "n_rows", "slope", "overall_slope",
                    (F.col("slope") * F.col("overall_slope") < 0)
                    .alias("sign_flip"))
            .orderBy("stratum"))


# ---------------------------------------------------------------------------
# Spearman rank correlation (distributed ranks)

@query(
    "lineitem_spearman_rank_corr",
    survey="breadth extension(Spearman rank correlation of quantity vs "
           "extended price with deterministic tie-breaks: DISTRIBUTED "
           "two-pass prefix-scan ranks on both axes, exact integer "
           "sum-of-squared-rank-differences)",
    oracle="""
    WITH base AS (
      SELECT l_orderkey, l_linenumber,
             CAST(ROUND(l_quantity) AS BIGINT) AS q,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS p
      FROM lineitem),
    rx AS (
      SELECT l_orderkey, l_linenumber,
             row_number() OVER (ORDER BY q, l_orderkey, l_linenumber)
               AS r_q
      FROM base),
    ry AS (
      SELECT l_orderkey, l_linenumber,
             row_number() OVER (ORDER BY p, l_orderkey, l_linenumber)
               AS r_p
      FROM base),
    d AS (
      -- sd2 <= n^3/3 outgrows BIGINT past ~3M rows; DuckDB's SUM widens
      -- to HUGEINT on its own, and the double conversion of the exact
      -- integer is IEEE-identical to Spark's decimal->double cast
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM((rx.r_q - ry.r_p) * (rx.r_q - ry.r_p)) AS DOUBLE)
               AS sd2
      FROM rx JOIN ry USING (l_orderkey, l_linenumber))
    SELECT n, sd2,
           ROUND(1.0 - 6.0 * sd2
                 / (CAST(n AS DOUBLE)
                    * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - 1.0)), 6)
             AS spearman_rho
    FROM d
    """,
)
def lineitem_spearman_rank_corr(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Spearman's rho between quantity and price — the robust (monotone,
    outlier-insensitive) correlation next to the Pearson machinery in
    lineitem_regression_family. Ties break deterministically by row key,
    so the rank permutations are engine-identical and sum((r_q - r_p)^2)
    folds as one exact BIGINT; the classic 1 - 6*S/(n(n^2-1)) identity
    then divides shared-op-order doubles.

    Scale shape: BOTH rank passes use operators/text_analysis.
    exclusive_prefix_sum (range-partitioned two-pass scan — never a
    single-reducer global window; the oracle's row_number is DuckDB's
    single-node luxury); the rank join is key-partitioned. S <= n^3/3
    outgrows int64 past ~3M rows (the 10× synthetic-corpus spot sweep
    caught the long overflow under ANSI mode, r9), so the per-row d² is
    summed in DECIMAL(38,0) — exact to ~3·10¹² rows — and reported as
    the IEEE double of that exact integer, identical to DuckDB's
    HUGEINT→DOUBLE. Packing-key domains: the rank keys embed
    (orderkey·8 + linenumber) below the value shift, valid to orderkey
    ≈ 2·10¹² (q-axis, shift 44) / 10⁹ (p-axis, shift 33); past that,
    range-partition on a (value, orderkey, linenumber) struct instead of
    a packed long."""
    from server2_vector_search_server_spark.operators.text_analysis import (
        exclusive_prefix_sum,
    )

    li = tbl(spark, sf_dir, "lineitem")
    base = li.select(
        "l_orderkey", "l_linenumber",
        F.round("l_quantity").cast("long").alias("q"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("p"))
    # packed unique order keys: value * 2^shift + orderkey*8 + linenumber
    # stays monotone in (value, orderkey, linenumber) while
    # orderkey*8 + linenumber < 2^shift (bounds in the docstring)
    kx = (F.col("q") * F.lit(1 << 44)
          + F.col("l_orderkey") * 8 + F.col("l_linenumber"))
    ky = (F.col("p") * F.lit(1 << 33)
          + F.col("l_orderkey") * 8 + F.col("l_linenumber"))

    def ranks(keyed, okey, rname):
        df = (keyed.withColumn("okey", okey)
              .withColumn("one", F.lit(1).cast("long")))
        r = exclusive_prefix_sum(df, order_col="okey", value_col="one",
                                 out_col="r0")
        return r.select("l_orderkey", "l_linenumber",
                        (F.col("r0") + 1).alias(rname))
    rx = ranks(base, kx, "r_q")
    ry = ranks(base, ky, "r_p")
    diff = (F.col("r_q") - F.col("r_p")).cast("decimal(19,0)")
    d = (rx.join(ry, ["l_orderkey", "l_linenumber"])
         .agg(F.count(F.lit(1)).cast("long").alias("n"),
              F.sum(diff * diff).cast("double").alias("sd2")))
    nd = F.col("n").cast("double")
    return d.select(
        "n", "sd2",
        F.round(1.0 - 6.0 * F.col("sd2")
                / (nd * (nd * nd - 1.0)), 6).alias("spearman_rho"))


# ---------------------------------------------------------------------------
# Duplicate-payment screen (same payer, same amount, close dates)

_DUP_PAY_DAYS = 7


@query(
    "orders_duplicate_payment_screen",
    survey="breadth extension(duplicate-payment audit: same customer + "
           "identical amount + order dates within 7 days — the classic "
           "AP fraud/error screen; candidates from an exact (customer, "
           "cents) equi-join, never a window scan)",
    oracle=f"""
    WITH o AS (
      SELECT o_orderkey, o_custkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(o_orderdate AS DATE) AS d
      FROM orders
      UNION ALL
      -- planted double payments: every 40th order re-keyed, two days later
      SELECT o_orderkey + 10000000, o_custkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 DAY AS DATE)
      FROM orders WHERE o_orderkey % 40 = 0)
    SELECT a.o_custkey AS custkey, a.cents AS cents,
           a.o_orderkey AS orderkey_a, b.o_orderkey AS orderkey_b,
           CAST(abs(datediff('day', a.d, b.d)) AS BIGINT) AS days_apart
    FROM o a JOIN o b
      ON a.o_custkey = b.o_custkey AND a.cents = b.cents
     AND a.o_orderkey < b.o_orderkey
     AND abs(datediff('day', a.d, b.d)) <= {_DUP_PAY_DAYS}
    ORDER BY custkey, cents, orderkey_a, orderkey_b
    """,
)
def orders_duplicate_payment_screen(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Accounts-payable duplicate screen: two orders by the same customer
    for the identical amount within a week are flagged for review — the
    audit-analytics staple. Candidates come from the exact (customer,
    cents) equi-join (duplicate amounts are the necessary condition, so
    the join key IS the blocking key); the date-proximity predicate
    refines candidates only. Shuffle is keyed by (customer, cents) —
    pairs are bounded by per-key multiplicity, never order-count
    quadratic."""
    base = tbl(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.to_date("o_orderdate").alias("d"))
    planted = (base.filter(F.col("o_orderkey") % 40 == 0)
               .select((F.col("o_orderkey") + 10_000_000)
                       .alias("o_orderkey"),
                       "o_custkey", "cents",
                       F.date_add("d", 2).alias("d")))
    o = base.unionByName(planted)
    a = o.select(F.col("o_orderkey").alias("orderkey_a"),
                 F.col("o_custkey").alias("custkey"), "cents",
                 F.col("d").alias("da"))
    b = o.select(F.col("o_orderkey").alias("orderkey_b"),
                 F.col("o_custkey").alias("custkey"), "cents",
                 F.col("d").alias("db"))
    return (a.join(b, ["custkey", "cents"])
            .filter((F.col("orderkey_a") < F.col("orderkey_b"))
                    & (F.abs(F.datediff("da", "db")) <= _DUP_PAY_DAYS))
            .select("custkey", "cents", "orderkey_a", "orderkey_b",
                    F.abs(F.datediff("da", "db")).cast("long")
                    .alias("days_apart"))
            .orderBy("custkey", "cents", "orderkey_a", "orderkey_b"))


# ---------------------------------------------------------------------------
# Laspeyres price index between two shipping months

@query(
    "lineitem_laspeyres_price_index",
    survey="breadth extension(Laspeyres price index: month-2 prices at "
           "month-1 quantity weights over the common part basket — the "
           "inflation-measurement identity, exact cents x quantity "
           "folds)",
    oracle="""
    WITH m AS (
      SELECT l_partkey,
             CAST(EXTRACT(month FROM CAST(l_shipdate AS DATE)) AS INTEGER)
               AS mo,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents,
             CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) >= DATE '2024-01-01'
        AND CAST(l_shipdate AS DATE) < DATE '2024-03-01'
      GROUP BY 1, 2),
    basket AS (
      SELECT a.l_partkey,
             a.cents AS c0, a.qty AS q0, b.cents AS c1, b.qty AS q1
      FROM m a JOIN m b ON a.l_partkey = b.l_partkey
      WHERE a.mo = 1 AND b.mo = 2 AND a.qty > 0 AND b.qty > 0)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(CAST(ROUND(CAST(c1 AS DOUBLE) / q1 * q0) AS BIGINT))
                AS BIGINT) AS p1q0_cents,
           CAST(SUM(c0) AS BIGINT) AS p0q0_cents,
           ROUND(CAST(SUM(CAST(ROUND(CAST(c1 AS DOUBLE) / q1 * q0)
                               AS BIGINT)) AS DOUBLE)
                 / CAST(SUM(c0) AS DOUBLE), 6) AS laspeyres_index
    FROM basket
    """,
)
def lineitem_laspeyres_price_index(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """The Laspeyres price index between January and February shipments:
    month-2 unit prices weighted by month-1 quantities over the common
    part basket, divided by the month-1 spend — the fixed-basket
    inflation measure (CPI's formula). Unit prices are exact-cents /
    exact-quantity divisions with shared op order; the p1*q0 products
    round to cents before the integer fold.

    Scale shape: one scan to (part, month) aggregates (partial-
    aggregable), a part-keyed self-join for the common basket, one
    bounded re-aggregate."""
    li = (tbl(spark, sf_dir, "lineitem")
          .filter((F.to_date("l_shipdate") >= F.lit("2024-01-01"))
                  & (F.to_date("l_shipdate") < F.lit("2024-03-01"))))
    m = (li.groupBy("l_partkey",
                    F.month(F.to_date("l_shipdate")).alias("mo"))
         .agg(F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
              .alias("cents"),
              F.sum(F.round("l_quantity").cast("long")).alias("qty")))
    a = (m.filter((F.col("mo") == 1) & (F.col("qty") > 0))
         .select("l_partkey", F.col("cents").alias("c0"),
                 F.col("qty").alias("q0")))
    b = (m.filter((F.col("mo") == 2) & (F.col("qty") > 0))
         .select("l_partkey", F.col("cents").alias("c1"),
                 F.col("qty").alias("q1")))
    basket = a.join(b, "l_partkey")
    p1q0 = F.round(F.col("c1").cast("double") / F.col("q1")
                   * F.col("q0")).cast("long")
    agg = basket.agg(F.count(F.lit(1)).cast("long").alias("n_parts"),
                     F.sum(p1q0).cast("long").alias("p1q0_cents"),
                     F.sum("c0").cast("long").alias("p0q0_cents"))
    return agg.select(
        "n_parts", "p1q0_cents", "p0q0_cents",
        F.round(F.col("p1q0_cents").cast("double")
                / F.col("p0q0_cents").cast("double"), 6)
        .alias("laspeyres_index"))
