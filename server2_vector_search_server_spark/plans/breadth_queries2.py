"""Third breadth wave: positional explode, MAP-typed columns, and the
linear-regression aggregate family.

Same design rules as the earlier waves: one oracle-checked pass per function
family, identical aliases on both engines, deterministic ordering. DuckDB
dialect notes are inline where the twin expression differs (0- vs 1-based
indexes, map extraction returning a list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from server2_vector_search_server_spark.plans.registry import (
    query,
    sql_sq_l2,
    tbl,
)
from server2_vector_search_server_spark.plans.text_queries import _SQL_TOKS


@query(
    "doc_tokens_positional",
    survey="J-extension(posexplode: ordinal-preserving lateral explode)",
    oracle=f"""
    SELECT doc_id,
           CAST(unnest(range(len({_SQL_TOKS}))) AS INTEGER) AS pos,
           unnest({_SQL_TOKS}) AS tok
    FROM documents WHERE doc_id < 50
    ORDER BY doc_id, pos
    """,
)
def doc_tokens_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinal-preserving tokenization — token streams where POSITION is
    data (n-gram windows, positional encodings, span labeling).
    ``posexplode`` emits (pos, value) pairs 0-based; the DuckDB twin zips
    two parallel ``unnest``s (range + list), which DuckDB aligns
    positionally. The explode is a per-row generator: no shuffle at all
    until the final presentation sort, and at 100 TB the generator's output
    never materializes wider than one input row's tokens at a time."""
    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"),
                    lambda t: t != "")
    return (
        docs.select("doc_id", F.posexplode(toks).alias("pos", "tok"))
        .orderBy("doc_id", "pos")
    )


@query(
    "event_map_functions",
    survey="H-extension(MAP type: construction, cardinality, key/value "
           "extraction, lookup)",
    oracle="""
    SELECT event_id,
           CAST(cardinality(m) AS INTEGER) AS n_keys,
           array_to_string(map_keys(m), ',') AS keys,
           m['et'][1] AS et_val,
           m['bucket'][1] AS bucket_val
    FROM (
      SELECT event_id,
             MAP(['et', 'bucket'],
                 [event_type, CAST(user_id % 5 AS VARCHAR)]) AS m
      FROM events WHERE event_id < 200)
    ORDER BY event_id
    """,
)
def event_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-typed column surface: build a map from row values, then
    cardinality / key enumeration / point lookup — the property-bag shape
    semi-structured pipelines use when the key set is dynamic. Spark's
    ``element_at(m, k)`` returns the value; DuckDB's ``m[k]`` returns a
    LIST, unwrapped with ``[1]`` in the oracle. All per-row expressions:
    zero shuffles besides the presentation sort, and Catalyst prunes the
    scan to the three source columns."""
    events = tbl(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    m = F.create_map(
        F.lit("et"), F.col("event_type"),
        F.lit("bucket"), (F.col("user_id") % 5).cast("string"))
    return (
        events.select(
            "event_id",
            F.size(m).alias("n_keys"),
            F.array_join(F.map_keys(m), ",").alias("keys"),
            F.element_at(m, "et").alias("et_val"),
            F.element_at(m, "bucket").alias("bucket_val"))
        .orderBy("event_id")
    )


@query(
    "lineitem_regression_family",
    survey="D-extension(linear-regression aggregates: regr_slope/"
           "intercept/r2/count per group)",
    oracle="""
    SELECT l_returnflag,
           ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 6)
             AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           regr_count(l_extendedprice, l_quantity) AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def lineitem_regression_family(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares fit as a pure aggregate:
    price ~ quantity per returnflag. regr_* aggregates reduce to the five
    classic sufficient statistics (n, Σx, Σy, Σxy, Σx²) — partial-
    aggregable, so the fit runs map-side combine + one small shuffle, the
    same economics as SUM. That makes per-group trend fitting viable at
    100 TB where a per-group Python OLS (collect → numpy) would not be.
    Both engines use the same closed forms; ROUND(…, 6) absorbs the
    last-ulp accumulation-order difference, as with corr/covar."""
    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.round(F.expr("regr_slope(l_extendedprice, l_quantity)"), 6)
             .alias("slope"),
             F.round(
                 F.expr("regr_intercept(l_extendedprice, l_quantity)"), 6)
             .alias("intercept"),
             F.round(F.expr("regr_r2(l_extendedprice, l_quantity)"), 6)
             .alias("r2"),
             F.expr("regr_count(l_extendedprice, l_quantity)").alias("n"))
        .orderBy("l_returnflag")
    )


_DIM = 64
_CSCALE = 1_000_000

def _sql_centroid_elems(col: str = "embedding") -> str:
    """Exact scaled-integer per-component mean, parameterized so the same
    contract can aggregate over any (possibly aliased) vector column."""
    return ", ".join(
        f"ROUND(SUM(CAST(ROUND(CAST({col}[{i + 1}] AS DOUBLE) * {_CSCALE}) "
        f"AS BIGINT)) / {_CSCALE}.0 / COUNT(*), 6)"
        for i in range(_DIM))


_SQL_CENTROID_ELEMS = _sql_centroid_elems()


def _sql_centroid_micro_elems(col: str = "embedding") -> str:
    """Each rounded centroid component re-scaled to a micro-unit BIGINT —
    integers stringify identically on both engines, so the CSV form dodges
    BOTH the driver's list-cell hash gap and double->string formatting."""
    return ", ".join(
        f"CAST(ROUND((ROUND(SUM(CAST(ROUND(CAST({col}[{i + 1}] AS DOUBLE) "
        f"* {_CSCALE}) AS BIGINT)) / {_CSCALE}.0 / COUNT(*), 6)) "
        f"* {_CSCALE}) AS BIGINT)"
        for i in range(_DIM))


def _label_centroids(emb: DataFrame, label_col: str = "label") -> DataFrame:
    """Per-label centroid via posexplode + two-phase aggregate — measured
    FASTER than 64 per-component aggregate columns (SCALE.md §17: 3.9 s vs
    5.1 s at 200 k×64), because AVG/SUM are partial-aggregable either way
    (map-side combine collapses the exploded rows to #labels × dim partials
    before the shuffle — the explode never crosses the network), while the
    single-aggregate form pays 64 element_at+round+cast expression chains
    per ROW in one projection. Exact scaled-integer sums; the component
    array is reassembled in pos order (array_sort on struct(pos, …))."""
    parts = (
        emb.select(label_col, F.posexplode("embedding").alias("pos", "v"))
        .groupBy(label_col, "pos")
        .agg(F.sum(F.round(F.col("v").cast("double") * _CSCALE)
                   .cast("long")).alias("s"),
             F.count(F.lit(1)).alias("n")))
    return (
        parts.groupBy(label_col)
        .agg(F.max("n").alias("n_vectors"),
             F.transform(
                 F.array_sort(F.collect_list(F.struct("pos", "s", "n"))),
                 lambda x: F.round(x["s"] / float(_CSCALE) / x["n"], 6))
             .alias("centroid")))


@query(
    "embedding_label_centroids",
    survey="north-star similarity search (per-group vector centroid: the "
           "k-means M-step as a partial-aggregable SQL aggregate)",
    oracle=f"""
    SELECT label,
           COUNT(*) AS n_vectors,
           array_to_string(
             [{_sql_centroid_micro_elems()}], ',') AS centroid_micro_csv
    FROM embeddings
    GROUP BY label
    ORDER BY label
    """,
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the 64-dim embedding column — the M-step of
    k-means / the class-prototype builder. Shipped plan: posexplode +
    two-phase aggregate (`_label_centroids`); the shuffle carries only
    #labels × dim partial sums regardless of corpus size because the
    component sums are partial-aggregable — the property that makes
    distributed k-means iterations cheap at 100 TB. (A collect-to-driver
    numpy mean would not distribute at all; SCALE.md §17 has the measured
    comparison against the 64-aggregate-columns form.) Component sums use
    the exact scaled-integer contract so shuffle order cannot perturb the
    mean; floats are upcast to double before scaling on both engines."""
    emb = tbl(spark, sf_dir, "embeddings")
    return (_label_centroids(emb)
            .select("label", "n_vectors",
                    F.array_join(
                        F.transform("centroid",
                                    lambda x: F.round(x * _CSCALE)
                                    .cast("long").cast("string")), ",")
                    .alias("centroid_micro_csv"))
            .orderBy("label"))


@query(
    "kmeans_iteration_assignments",
    survey="north-star similarity search (one full k-means EM iteration: "
           "M-step centroid aggregate + E-step argmin assignment)",
    oracle=f"""
    WITH cent AS (
      SELECT label AS c_label, [{_SQL_CENTROID_ELEMS}] AS centroid
      FROM embeddings GROUP BY label),
    d AS (
      SELECT e.vec_id, e.label, c.c_label,
             {sql_sq_l2('e.embedding', 'c.centroid')} AS dist
      FROM embeddings e CROSS JOIN cent c),
    a AS (
      SELECT vec_id, label, c_label,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY dist, c_label) AS rn
      FROM d)
    SELECT label, c_label AS assigned_label, COUNT(*) AS n
    FROM a WHERE rn = 1
    GROUP BY label, assigned_label
    ORDER BY label, assigned_label
    """,
)
def kmeans_iteration_assignments(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """One complete k-means iteration over the corpus, distributed: the
    M-step is the `embedding_label_centroids` aggregate (shuffle carries
    #labels × dim numbers); the E-step embeds the 10 centroids as literals
    and assigns each vector by argmin projection (`operators/ann.ivf_assign`
    — zero joins, zero row blow-up; the oracle's CROSS JOIN + row_number is
    the semantic spec, not the plan). Output is the label↔assignment
    contingency table — the convergence diagnostic a driver loop would
    inspect between iterations. Centroid components are rounded to 6
    decimals on both engines BEFORE distance computation, so the argmin
    compares bit-identical doubles; ties break to the lowest centroid
    label on both sides."""
    from server2_vector_search_server_spark.operators.ann import ivf_assign

    emb = tbl(spark, sf_dir, "embeddings")
    centroids = (_label_centroids(emb)
                 .select(F.col("label").alias("centroid_id"), "centroid"))
    assigned = ivf_assign(emb, centroids)
    return (
        assigned.groupBy("label",
                         F.col("centroid_id").alias("assigned_label"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("label", "assigned_label")
    )


@query(
    "segment_nation_roster",
    survey="D-extension(ordered string aggregation: deterministic "
           "string_agg / listagg twin)",
    oracle="""
    SELECT c_mktsegment,
           string_agg(DISTINCT CAST(c_nationkey AS VARCHAR), ','
                      ORDER BY CAST(c_nationkey AS VARCHAR)) AS nations_csv,
           COUNT(*) AS n_customers
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def segment_nation_roster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation — the LISTAGG/STRING_AGG shape reporting
    layers want. Concatenating in SHUFFLE order is nondeterministic on any
    parallel engine, so the contract is: collect distinct, SORT, then join —
    `concat_ws(sort_array(collect_set(…)))`, mirrored by DuckDB's
    `string_agg(DISTINCT … ORDER BY …)`. The sort is per-group over the
    distinct value set (nation-count-sized), not over rows — cheap even
    when groups are huge."""
    cust = tbl(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_mktsegment")
        .agg(F.concat_ws(
                ",", F.sort_array(
                    F.collect_set(F.col("c_nationkey").cast("string"))))
             .alias("nations_csv"),
             F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


@query(
    "doc_token_set_ops",
    survey="H-extension(array set algebra: union / intersect / except "
           "with deterministic ordering)",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_distinct(list_filter(
               string_split_regex(trim(lower(text)), '\\s+'),
               x -> x != '')) AS toks
      FROM documents WHERE doc_id < 100)
    SELECT doc_id,
           CAST(len(list_distinct(list_cat(toks,
             ['the','and','of','to','in']))) AS INTEGER) AS n_union,
           COALESCE(array_to_string(list_sort(list_intersect(toks,
             ['the','and','of','to','in'])), ','), '') AS stop_overlap,
           COALESCE(array_to_string(list_sort(list_filter(toks,
             x -> NOT list_contains(['the','and','of','to','in'], x)))[1:5],
             ','), '') AS content_head
    FROM t ORDER BY doc_id
    """,
)
def doc_token_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra over token sets — union cardinality, stopword
    overlap, head of the stopword-stripped vocabulary. Engines disagree on
    the ORDER these functions emit (Spark preserves first-argument order,
    DuckDB doesn't specify), so every set result is explicitly sorted
    before leaving the query — the only portable contract for set-valued
    columns. All per-row expressions: no shuffle except the presentation
    sort."""
    stop = ["the", "and", "of", "to", "in"]
    stop_lit = F.array(*[F.lit(s) for s in stop])
    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = F.array_distinct(F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
        lambda t: t != ""))
    t = docs.select("doc_id", toks.alias("toks"))
    return (
        t.select(
            "doc_id",
            F.size(F.array_distinct(
                F.array_union(F.col("toks"), stop_lit))).alias("n_union"),
            F.array_join(
                F.sort_array(F.array_intersect(F.col("toks"), stop_lit)),
                ",").alias("stop_overlap"),
            F.array_join(
                F.slice(F.sort_array(F.array_except(F.col("toks"),
                                                    stop_lit)), 1, 5),
                ",").alias("content_head"))
        .orderBy("doc_id")
    )


@query(
    "kmeans_lloyd_assignments",
    survey="north-star similarity search (full Lloyd's k-means: TWO EM "
           "iterations distributed, vs an unrolled two-round SQL oracle)",
    oracle=f"""
    WITH cent0 AS (
      SELECT label AS cid, [{_sql_centroid_elems('embedding')}] AS c
      FROM embeddings GROUP BY label),
    a1 AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {sql_sq_l2('e.embedding', 'c.c')}, c.cid) AS rn
        FROM embeddings e CROSS JOIN cent0 c) WHERE rn = 1),
    cent1 AS (
      SELECT a1.cid AS cid, [{_sql_centroid_elems('e.embedding')}] AS c
      FROM a1 JOIN embeddings e USING (vec_id) GROUP BY a1.cid),
    a2 AS (
      SELECT e.vec_id, e.label, c.cid,
             ROW_NUMBER() OVER (PARTITION BY e.vec_id
               ORDER BY {sql_sq_l2('e.embedding', 'c.c')}, c.cid) AS rn
      FROM embeddings e CROSS JOIN cent1 c)
    SELECT label, cid AS assigned_label, COUNT(*) AS n
    FROM a2 WHERE rn = 1
    GROUP BY label, assigned_label
    ORDER BY label, assigned_label
    """,
)
def kmeans_lloyd_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means run for TWO full EM iterations
    (operators/ann.kmeans_lloyd): per-iteration cost is one corpus scan
    (argmin E-step, zero joins) plus one k × dim partial-aggregable shuffle
    (M-step); the driver holds only the centroid table between rounds. The
    oracle unrolls both rounds relationally (CROSS JOIN + ROW_NUMBER argmin,
    grouped exact scaled-integer means) — same rounded-component contract,
    same lowest-id tie-break, so the final label↔cluster contingency table
    hash-matches."""
    from server2_vector_search_server_spark.operators import ann

    emb = tbl(spark, sf_dir, "embeddings")
    init = (_label_centroids(emb)
            .select(F.col("label").alias("centroid_id"), "centroid"))
    assigned = ann.kmeans_lloyd(emb, init, n_iter=2)
    return (
        assigned.groupBy("label",
                         F.col("centroid_id").alias("assigned_label"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("label", "assigned_label")
    )
