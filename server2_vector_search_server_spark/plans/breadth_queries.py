"""Second breadth wave: window medians, anomaly flags, unpivot, bitwise
aggregates, equi-depth histograms, outer-join reconciliation, edit-distance
fuzzy dedup, and PMI collocations.

Same design rules as ``function_queries.py``: each query packs a function
family into one oracle-checked pass; aggregates that sum floats go through
the exact-sum contract; every computed column is aliased identically on both
engines; ties are broken deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from server2_vector_search_server_spark.plans.registry import query, tbl


@query(
    "events_rolling_median",
    survey="E-extension(exact percentile as a window aggregate: rolling "
           "median over a bounded ROWS frame)",
    oracle="""
    SELECT event_id,
           ROUND(median(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6)
             AS rolling_median
    FROM events
    """,
)
def events_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median (exact, interpolated) per user over the trailing five
    events — robust smoothing for noisy metrics. The ROWS frame is bounded,
    so state per window is O(frame), and the partition key spreads the work
    across users: one shuffle on user_id, no global sort. Spark's
    ``percentile`` and DuckDB's ``median`` share linear-interpolation
    semantics."""
    events = tbl(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-4, 0))
    return events.select(
        "event_id",
        F.round(F.expr("percentile(value, 0.5)").over(w), 6)
        .alias("rolling_median"))


@query(
    "events_anomaly_zscore",
    survey="D-extension(two-pass anomaly detection: per-group z-score "
           "outlier flags)",
    oracle="""
    WITH stats AS (
      SELECT event_type,
             ROUND(avg(value), 6) AS mu,
             ROUND(stddev_samp(value), 6) AS sigma
      FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type,
           ROUND((e.value - s.mu) / s.sigma, 6) AS zscore
    FROM events e JOIN stats s USING (event_type)
    WHERE abs((e.value - s.mu) / s.sigma) > 3
    ORDER BY e.event_id
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier detection for data-quality gating: per-type mean/stddev pass
    (group-count-sized → broadcast), then a flag pass keeping |z| > 3. The
    stats are ROUNDED before the z computation so both engines derive z from
    identical inputs — the same two-pass normalize shape as winsorization,
    with the broadcast join keeping the big side shuffle-free."""
    events = tbl(spark, sf_dir, "events")
    stats = (events.groupBy("event_type")
             .agg(F.round(F.avg("value"), 6).alias("mu"),
                  F.round(F.stddev_samp("value"), 6).alias("sigma")))
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        events.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 3)
        .select("event_id", "event_type", F.round(z, 6).alias("zscore"))
        .orderBy("event_id")
    )


@query(
    "events_unpivot_metrics",
    survey="G-extension(UNPIVOT/stack: wide aggregate row to long "
           "metric/value pairs)",
    oracle="""
    WITH agg AS (
      SELECT event_type,
             ROUND(SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0
                   / COUNT(*), 6) AS avg_value,
             CAST(COUNT(*) AS DOUBLE) AS n_events,
             CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS n_users
      FROM events GROUP BY event_type)
    SELECT event_type, metric, metric_value FROM (
      SELECT event_type, 'avg_value' AS metric, avg_value AS metric_value
      FROM agg
      UNION ALL
      SELECT event_type, 'n_events', n_events FROM agg
      UNION ALL
      SELECT event_type, 'n_users', n_users FROM agg)
    ORDER BY event_type, metric
    """,
)
def events_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshaping with ``stack()`` (Spark's UNPIVOT): one metrics
    row per event_type becomes three (metric, metric_value) rows — the shape
    reporting sinks and ML feature stores want. The expensive part (the
    aggregate) runs once; the unpivot is a zero-shuffle generator over the
    tiny result. The float average goes through the exact-sum contract."""
    events = tbl(spark, sf_dir, "events")
    agg = (events.groupBy("event_type")
           .agg(F.round((F.sum(F.round(F.col("value") * 100).cast("long"))
                         / 100.0) / F.count(F.lit(1)), 6).alias("avg_value"),
                F.count(F.lit(1)).cast("double").alias("n_events"),
                F.count_distinct("user_id").cast("double").alias("n_users")))
    return (
        agg.select(
            "event_type",
            F.expr("stack(3, 'avg_value', avg_value, 'n_events', n_events, "
                   "'n_users', n_users) AS (metric, metric_value)"))
        .orderBy("event_type", "metric")
    )


@query(
    "order_bitwise_aggregates",
    survey="D-extension(bitwise aggregates: bit_and/bit_or/bit_xor + "
           "bit_count scalar)",
    oracle="""
    SELECT o_orderpriority,
           bit_and(o_orderkey & 1023) AS and_low10,
           bit_or(o_orderkey & 1023) AS or_low10,
           bit_xor(o_orderkey) AS xor_all,
           CAST(bit_count(bit_or(o_orderkey & 1023)) AS INTEGER)
             AS or_popcount,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def order_bitwise_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate family — the primitive behind bitmap indexes,
    feature-flag rollups, and membership masks. All integer arithmetic:
    associative+commutative folds with map-side partial aggregation, fully
    shuffle-order-independent (unlike float sums)."""
    orders = tbl(spark, sf_dir, "orders")
    low10 = F.expr("o_orderkey & 1023")
    return (
        orders.groupBy("o_orderpriority")
        .agg(F.expr("bit_and(o_orderkey & 1023)").alias("and_low10"),
             F.expr("bit_or(o_orderkey & 1023)").alias("or_low10"),
             F.expr("bit_xor(o_orderkey)").alias("xor_all"),
             F.expr("CAST(bit_count(bit_or(o_orderkey & 1023)) AS INT)")
             .alias("or_popcount"),
             F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderpriority")
    )


@query(
    "event_value_equidepth_histogram",
    survey="D-extension(equi-depth histogram: ntile bucketing per group)",
    oracle="""
    WITH bucketed AS (
      SELECT event_type, value,
             ntile(4) OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS bucket
      FROM events)
    SELECT event_type, CAST(bucket AS INTEGER) AS bucket,
           ROUND(min(value), 6) AS lo,
           ROUND(max(value), 6) AS hi,
           COUNT(*) AS n
    FROM bucketed
    GROUP BY event_type, bucket
    ORDER BY event_type, bucket
    """,
)
def event_value_equidepth_histogram(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Equi-depth (equal-count) histogram per event type — the optimizer-
    statistics twin of the equi-width ``event_value_histogram``. Exact ntile
    needs a total order per group, so parallelism here is per event_type
    (each group one window partition). For a GLOBAL equi-depth profile at
    100 TB, don't sort: one `percentile_approx(value, array(...))` pass
    gives the bucket boundaries as a mergeable sketch
    (`approx_event_aggregates` covers that path); the ntile form is the
    exact, grouped variant."""
    events = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        events.withColumn("bucket", F.ntile(4).over(w))
        .groupBy("event_type", "bucket")
        .agg(F.round(F.min("value"), 6).alias("lo"),
             F.round(F.max("value"), 6).alias("hi"),
             F.count(F.lit(1)).alias("n"))
        .orderBy("event_type", "bucket")
    )


@query(
    "nation_balance_full_outer",
    survey="C-extension(FULL OUTER join reconciliation with coalesced key)",
    oracle="""
    WITH c AS (
      SELECT c_nationkey AS nationkey, COUNT(*) AS n_neg_customers
      FROM customer WHERE c_acctbal < -500 GROUP BY c_nationkey),
    s AS (
      SELECT s_nationkey AS nationkey, COUNT(*) AS n_neg_suppliers
      FROM supplier WHERE s_acctbal < -500 GROUP BY s_nationkey)
    SELECT n.n_name,
           COALESCE(c.n_neg_customers, 0) AS n_neg_customers,
           COALESCE(s.n_neg_suppliers, 0) AS n_neg_suppliers
    FROM c FULL OUTER JOIN s USING (nationkey)
    JOIN nation n ON COALESCE(c.nationkey, s.nationkey) = n.n_nationkey
    ORDER BY n.n_name
    """,
)
def nation_balance_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER reconciliation — the join type the rest of the surface
    doesn't cover. Negative-balance customers and suppliers are sparse and
    land in different nation subsets, so both null sides genuinely occur.
    Both inputs are pre-aggregated to group-count size BEFORE the full-outer
    join (aggregate-then-join): the outer join runs on dozens of rows, never
    on the raw tables, and the nation dim broadcasts."""
    customer = tbl(spark, sf_dir, "customer")
    supplier = tbl(spark, sf_dir, "supplier")
    nation = tbl(spark, sf_dir, "nation")
    c = (customer.filter(F.col("c_acctbal") < -500)
         .groupBy(F.col("c_nationkey").alias("nationkey"))
         .agg(F.count(F.lit(1)).alias("n_neg_customers")))
    s = (supplier.filter(F.col("s_acctbal") < -500)
         .groupBy(F.col("s_nationkey").alias("nationkey"))
         .agg(F.count(F.lit(1)).alias("n_neg_suppliers")))
    return (
        c.join(s, "nationkey", "full_outer")
        .join(F.broadcast(nation),
              F.col("nationkey") == F.col("n_nationkey"))
        .select(F.col("n_name"),
                F.coalesce("n_neg_customers", F.lit(0))
                .alias("n_neg_customers"),
                F.coalesce("n_neg_suppliers", F.lit(0))
                .alias("n_neg_suppliers"))
        .orderBy("n_name")
    )


@query(
    "dedup_fuzzy_prefix_pairs",
    survey="north-star dedup (edit-distance fuzzy matching: blocked "
           "candidate join + levenshtein refine)",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, lang, source, substr(text, 1, 24) AS prefix
      FROM documents)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(levenshtein(a.prefix, b.prefix) AS INTEGER) AS edit_dist
    FROM keyed a JOIN keyed b
      ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
    WHERE levenshtein(a.prefix, b.prefix) <= 8
    ORDER BY id_a, id_b
    """,
)
def dedup_fuzzy_prefix_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy near-dup pairs by edit distance on the 24-char text prefix —
    the classic record-linkage shape: BLOCK first (equi-join on lang+source
    keeps the candidate set quadratic only within a block, never across the
    corpus), REFINE second (levenshtein only on candidates). At 100 TB the
    block key is the shuffle key, and refining cost is Σ block² — choose
    blocks accordingly (the same economics as LSH banding, which
    `dedup_minhash_lsh` covers for unordered token sets; edit distance adds
    the order-sensitive complement)."""
    docs = tbl(spark, sf_dir, "documents")
    keyed = docs.select("doc_id", "lang", "source",
                        F.substring("text", 1, 24).alias("prefix"))
    a = keyed.alias("a")
    b = keyed.alias("b")
    dist = F.levenshtein(F.col("a.prefix"), F.col("b.prefix"))
    return (
        a.join(b, [F.col("a.lang") == F.col("b.lang"),
                   F.col("a.source") == F.col("b.source"),
                   F.col("a.doc_id") < F.col("b.doc_id")])
        .filter(dist <= 8)
        .select(F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"),
                dist.cast("int").alias("edit_dist"))
        .orderBy("id_a", "id_b")
    )


@query(
    "text_collocations_pmi",
    survey="north-star text analysis (collocation mining: document-level "
           "PMI over word bigrams)",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_distinct(
               string_split_regex(trim(text), '\\s+'))) AS tok
      FROM documents),
    df AS (SELECT tok, COUNT(*) AS df FROM toks GROUP BY tok),
    bg AS (
      SELECT doc_id, unnest(list_distinct((
        SELECT list_transform(range(1, len(__tk)),
                              i -> __tk[i] || ' ' || __tk[i + 1])
        FROM (SELECT string_split_regex(trim(text), '\\s+') AS __tk)
      ))) AS bigram
      FROM documents),
    bdf AS (SELECT bigram, COUNT(*) AS df_ab FROM bg GROUP BY bigram),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT bigram, df_ab,
           ROUND(ln(CAST(df_ab AS DOUBLE) * n_docs
                    / (CAST(a.df AS DOUBLE) * b.df)), 6) AS pmi
    FROM bdf CROSS JOIN n
    JOIN df a ON a.tok = string_split(bigram, ' ')[1]
    JOIN df b ON b.tok = string_split(bigram, ' ')[2]
    WHERE df_ab >= 5
    ORDER BY pmi DESC, bigram ASC LIMIT 20
    """,
)
def text_collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: pointwise mutual information of adjacent word
    pairs at document granularity — pmi = ln(df(ab)·N / (df(a)·df(b))).
    Corpus-linguistics standard (Church & Hanks 1990). Two explode+count
    passes (unigram DF, bigram DF) and two joins of the bigram table against
    the unigram DF table; all counts are integers so the log argument is
    bit-identical across engines. At scale both DF tables are
    aggregate-sized; the joins hash-partition on the token — the TF-IDF
    vocabulary-join shape (`text_tfidf_top_terms`) with a pair numerator."""
    docs = tbl(spark, sf_dir, "documents")
    toks = F.array_distinct(
        F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != ""))
    tok_df = (docs.select(F.explode(toks).alias("tok"))
              .groupBy("tok").agg(F.count(F.lit(1)).alias("df")))
    raw = F.split(F.trim(F.col("text")), r"\s+")
    bigrams = F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.size(raw) - 1),
        lambda i: F.concat_ws(" ", F.element_at(raw, i),
                              F.element_at(raw, i + 1))))
    bdf = (docs.select(F.explode(bigrams).alias("bigram"))
           .groupBy("bigram").agg(F.count(F.lit(1)).alias("df_ab")))
    n_docs = docs.count()
    w1 = F.split(F.col("bigram"), " ").getItem(0)
    w2 = F.split(F.col("bigram"), " ").getItem(1)
    a = tok_df.select(F.col("tok").alias("tok_a"),
                      F.col("df").alias("df_a"))
    b = tok_df.select(F.col("tok").alias("tok_b"),
                      F.col("df").alias("df_b"))
    pmi = F.round(F.log(F.col("df_ab").cast("double") * F.lit(n_docs)
                        / (F.col("df_a").cast("double") * F.col("df_b"))), 6)
    return (
        bdf.filter(F.col("df_ab") >= 5)
        .join(a, w1 == F.col("tok_a"))
        .join(b, w2 == F.col("tok_b"))
        .select("bigram", "df_ab", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), F.col("bigram").asc())
        .limit(20)
    )
