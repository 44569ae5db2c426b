"""Spark-4 SQL dialect surface + physical co-location contracts.

Round-9 continuation probe: no ``pipe``/``collat``/``bucket`` keys existed
in the registry (the bucketed-join plan shape was unit-tested in
tests/test_bucketing.py but never a registered query a reference user
could run).  Three additions:

* ``sql_pipe_syntax`` — the SQL pipe operators (`|>`) Spark 4.0 added
  (SPARK-49555): the same declarative plan as the classic form, so
  Catalyst output is identical; the query exists to pin that the dialect
  door works and stays working.
* ``sql_collation_semantics`` — column-level collation (SPARK-46830):
  grouping under ``UTF8_LCASE`` equivalence while aggregates stay binary,
  mirrored by a ``lower()`` oracle (exactly equivalent for ASCII data).
* ``store_bucketed_join_colocation`` — bucketed write → shuffle-free
  sort-merge join, the physical contract that makes repeated large-key
  joins affordable at 100 TB (both sides pre-hashed into the same bucket
  layout, EnsureRequirements inserts no Exchange; asserted in
  tests/test_plan_audits.py, correctness hash-checked here).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from server2_vector_search_server_spark.plans.registry import (
    build_memo,
    exact_sum,
    query,
    scratch_dir,
    sql_exact_sum,
    tbl,
)

_PIPE_CUTOFF = "1998-09-02"


@query(
    "sql_pipe_syntax",
    survey="dialect extension(SQL pipe syntax |> WHERE / AGGREGATE / "
           "ORDER BY — Spark 4.0 SPARK-49555; same Catalyst plan as the "
           "classic form)",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {sql_exact_sum('CAST(l_extendedprice AS DOUBLE) '
                          '* (1 - CAST(l_discount AS DOUBLE))', 2)}
               AS revenue
    FROM lineitem
    WHERE l_shipdate <= DATE '{_PIPE_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pricing-summary shape written in Spark 4's pipe syntax: each
    ``|>`` stage is a logical operator in evaluation order, so the text
    reads the way Catalyst plans it.  The exact-sum discipline is the
    registry's (per-row round → scaled BIGINT → integer SUM); ``100.0D``
    forces a double divide — a bare ``100.0`` literal is DECIMAL in
    Spark SQL and would change the output dtype (round-3 gotcha).
    Scale: identical plan to the classic GROUP BY — one pushed-filter
    scan, partial/final hash aggregate, 6-row result."""
    tbl(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_pipe_v")
    return spark.sql(f"""
        FROM lineitem_pipe_v
        |> WHERE l_shipdate <= DATE '{_PIPE_CUTOFF}'
        |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n_rows,
               (SUM(CAST(ROUND((CAST(l_extendedprice AS DOUBLE)
                                * (1 - CAST(l_discount AS DOUBLE))) * 100)
                         AS BIGINT)) / 100.0D) AS revenue
           GROUP BY l_returnflag, l_linestatus
        |> ORDER BY l_returnflag, l_linestatus
        """)


@query(
    "sql_collation_semantics",
    survey="dialect extension(column-level UTF8_LCASE collation: "
           "case-insensitive GROUP BY equivalence classes with "
           "binary-order representatives — SPARK-46830)",
    oracle="""
    WITH mixed AS (
        SELECT CASE WHEN doc_id % 2 = 1 THEN upper(source) ELSE source END
                   AS src_mixed,
               n_chars
        FROM documents
    )
    SELECT min(src_mixed) AS src_repr,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT src_mixed) AS BIGINT) AS n_variants,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM mixed
    GROUP BY lower(src_mixed)
    ORDER BY src_repr
    """,
)
def sql_collation_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive grouping via a collated column, not ``lower()``:
    odd doc_ids get an upper-cased source, then the group key is
    ``source COLLATE UTF8_LCASE`` so 'SRC3' and 'src3' land in one group
    while ``n_variants`` (a BINARY count-distinct over the original
    strings) proves both spellings really reached it.  The group's output
    representative is ``min`` over the NON-collated column — binary
    comparison, deterministic — because min/first over the collated key
    would tie between equal-under-collation spellings and hash
    differently run to run.  Oracle: ``GROUP BY lower(...)``, the exact
    same equivalence relation for ASCII.  Scale: one hash aggregate; the
    collation sits in the group-key comparator, no extra pass."""
    docs = tbl(spark, sf_dir, "documents")
    mixed = docs.select(
        F.when(F.col("doc_id") % 2 == 1, F.upper("source"))
        .otherwise(F.col("source")).alias("src_mixed"),
        "n_chars")
    return (mixed
            .groupBy(F.expr("src_mixed COLLATE UTF8_LCASE").alias("src_ci"))
            .agg(F.min("src_mixed").alias("src_repr"),
                 F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.count_distinct("src_mixed").cast("long")
                 .alias("n_variants"),
                 F.sum("n_chars").cast("long").alias("total_chars"))
            .drop("src_ci")
            .orderBy("src_repr"))


def _bucketed_pair(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write lineitem+orders bucketed by orderkey (8 buckets, sorted) into
    session-scoped catalog tables; memoized — the layout is immutable so
    repeated calls (bench median-of-3) measure the JOIN, which is the
    point of paying for bucketing at write time."""

    def fresh() -> tuple[str, str]:
        suffix = uuid.uuid4().hex[:8]
        li_name = f"li_bucketed_{suffix}"
        ord_name = f"ord_bucketed_{suffix}"
        li = tbl(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount")
        orders = tbl(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority")
        (li.repartition(8, "l_orderkey")
         .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
         .option("path", scratch_dir("bucketed_li_"))
         .saveAsTable(li_name))
        (orders.repartition(8, "o_orderkey")
         .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
         .option("path", scratch_dir("bucketed_ord_"))
         .saveAsTable(ord_name))
        return li_name, ord_name

    def build() -> tuple[str, str]:
        return fresh()

    names = build_memo(("bucketed_orderkey_pair", sf_dir), build)
    # build_memo revalidates vanished PATHS, but table NAMES are bound to
    # the session catalog — a process that stopped and recreated its
    # SparkSession would be served dangling names; rebuild in that case
    if not all(spark.catalog.tableExists(n) for n in names):
        names = fresh()
        from server2_vector_search_server_spark.plans import registry as _r
        _r._BUILD_MEMO[("bucketed_orderkey_pair", sf_dir)] = names
    return names


@query(
    "store_bucketed_join_colocation",
    survey="A-extension(write-time bucketing: both join sides pre-hashed "
           "into the same bucket layout, sort-merge join with no "
           "Exchange on either side — plan asserted in "
           "tests/test_plan_audits.py)",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           {sql_exact_sum('CAST(l_extendedprice AS DOUBLE) '
                          '* (1 - CAST(l_discount AS DOUBLE))', 2)}
               AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def store_bucketed_join_colocation(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Revenue per order priority off the BUCKETED lineitem⋈orders join.
    Both tables were written ``bucketBy(8, orderkey).sortBy(orderkey)``,
    so each bucket i of lineitem joins only bucket i of orders: the
    sort-merge join (hinted — at fixture scale the optimizer would
    broadcast and the co-location contract would go untested) needs no
    Exchange and no Sort on either side.  At 100 TB this converts every
    repeated orderkey join from a full dual shuffle (the single biggest
    cost in the plan) into a local merge per bucket — the lakehouse
    bucketed-layout contract (Spark SQL bucketing / Iceberg bucket
    transform).  Correctness: identical rows to the plain parquet join
    the oracle runs."""
    li_name, ord_name = _bucketed_pair(spark, sf_dir)
    li = spark.table(li_name).hint("merge")
    orders = spark.table(ord_name)
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).cast("long").alias("n_items"),
                 exact_sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount")), 2).alias("revenue"))
            .orderBy("o_orderpriority"))


@query(
    "sql_udf_functions",
    survey="dialect extension(declarative SQL UDFs, SPARK-46246: a "
           "scalar CREATE FUNCTION ... RETURN expression and a "
           "table-valued SQL function as a bucket spine — both inline "
           "into the Catalyst plan, unlike Python UDFs)",
    oracle=f"""
    WITH spine AS (
        SELECT CAST(v AS BIGINT) AS bucket
        FROM UNNEST(range(0, 6)) AS t(v)
    ), bucketed AS (
        SELECT CAST(FLOOR((l_quantity - 1) / 10.0) AS BIGINT) AS bucket,
               CAST(ROUND((CAST(l_extendedprice AS DOUBLE)
                           * (1 - CAST(l_discount AS DOUBLE))) * 100)
                    AS BIGINT) AS rev_cents
        FROM lineitem
    )
    SELECT s.bucket,
           CAST(COALESCE(COUNT(b.rev_cents), 0) AS BIGINT) AS n_rows,
           (COALESCE(SUM(b.rev_cents), 0) / 100.0) AS revenue
    FROM spine s LEFT JOIN bucketed b ON b.bucket = s.bucket
    GROUP BY s.bucket ORDER BY s.bucket
    """,
)
def sql_udf_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-bucket revenue rollup built from two DECLARATIVE SQL
    functions: a scalar ``li_rev(p, d)`` (the revenue expression — SQL
    UDFs inline into the plan, so whole-stage codegen keeps running,
    the property Python UDFs give up) and a table-valued
    ``bucket_spine(k)`` generating the dense bucket domain so the empty
    top bucket still prints a zero row (the LEFT-join-to-spine
    contract).  The oracle inlines both definitions — a hash match
    proves the function bodies, not just the rollup.  Scale: the spine
    is 6 rows; the fact side is one scan + one aggregate; identical
    physical plan to the inlined form."""
    tbl(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_udf_v")
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION li_rev(p DOUBLE, d DOUBLE)
        RETURNS DOUBLE RETURN p * (1 - d)
        """)
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION bucket_spine(k INT)
        RETURNS TABLE (bucket BIGINT)
        RETURN SELECT CAST(b AS BIGINT) AS bucket
               FROM (SELECT explode(sequence(0, k - 1)) AS b)
        """)
    return spark.sql("""
        WITH bucketed AS (
            SELECT CAST(FLOOR((l_quantity - 1) / 10.0) AS BIGINT) AS bucket,
                   CAST(ROUND(li_rev(CAST(l_extendedprice AS DOUBLE),
                                     CAST(l_discount AS DOUBLE)) * 100)
                        AS BIGINT) AS rev_cents
            FROM lineitem_udf_v
        )
        SELECT s.bucket,
               CAST(COALESCE(COUNT(b.rev_cents), 0) AS BIGINT) AS n_rows,
               (COALESCE(SUM(b.rev_cents), 0L) / 100.0D) AS revenue
        FROM bucket_spine(6) s LEFT JOIN bucketed b ON b.bucket = s.bucket
        GROUP BY s.bucket ORDER BY s.bucket
        """)


_EXI_THRESHOLD = 180_000.0


@query(
    "sql_execute_immediate",
    survey="dialect extension(EXECUTE IMMEDIATE with USING parameters "
           "bound from session variables — SPARK-44840; the dynamic-SQL "
           "door next to sql_parameterized_query's args binding)",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_big_orders,
           {sql_exact_sum('CAST(o_totalprice AS DOUBLE)', 2)}
               AS total_value
    FROM orders
    WHERE CAST(o_totalprice AS DOUBLE) > {_EXI_THRESHOLD}
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def sql_execute_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big-order counts per priority where the price threshold arrives
    through a SESSION VARIABLE bound into EXECUTE IMMEDIATE's USING
    clause — dynamic SQL with engine-side parameter binding (no string
    splicing, no injection surface), the pattern dashboards and stored
    procedures compile to.  The parameter marker becomes a literal in
    the resolved plan, so the filter still pushes to the scan.  Scale:
    identical plan to the static form — one pushed-filter scan, one
    bounded aggregate."""
    tbl(spark, sf_dir, "orders").createOrReplaceTempView("orders_exi_v")
    spark.sql("DECLARE OR REPLACE VARIABLE exi_threshold DOUBLE")
    spark.sql(f"SET VAR exi_threshold = {_EXI_THRESHOLD}")
    return spark.sql("""
        EXECUTE IMMEDIATE
        'SELECT o_orderpriority,
                CAST(COUNT(*) AS BIGINT) AS n_big_orders,
                (SUM(CAST(ROUND(CAST(o_totalprice AS DOUBLE) * 100)
                          AS BIGINT)) / 100.0D) AS total_value
         FROM orders_exi_v
         WHERE CAST(o_totalprice AS DOUBLE) > ?
         GROUP BY o_orderpriority ORDER BY o_orderpriority'
        USING exi_threshold
        """)
