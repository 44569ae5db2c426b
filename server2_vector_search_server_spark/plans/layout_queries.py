"""Physical-layout query surface (operators/layout.py): prove that
write-time layout turns predicates into file/partition pruning.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from server2_vector_search_server_spark.operators import layout
from server2_vector_search_server_spark.plans.registry import (
    scratch_dir,
    exact_sum,
    query,
    sql_exact_sum,
    tbl,
)


@query(
    "events_time_partitioned_scan",
    survey="A-extension(write-time layout: date-partitioned events, "
           "partition-pruned window scan)",
    oracle=f"""
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_date, event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           {sql_exact_sum('value', 2)} AS total_value
    FROM events
    WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-10' AND DATE '2024-01-12'
    GROUP BY event_date, event_type
    ORDER BY event_date, event_type
    """,
)
def events_time_partitioned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The append-only event-stream layout: materialize events partitioned
    by day, then answer a 3-day window query. The date predicate becomes
    PartitionFilters — the scan lists and reads 3 of 30 partition
    directories (asserted in tests/test_layout.py); at 100 TB that is the
    difference between scanning 10 TB and 100 TB for a daily report."""
    events = tbl(spark, sf_dir, "events")
    path = scratch_dir("events_by_day_")
    part_col = layout.write_time_partitioned(events, path, ts_col="ts")
    stored = spark.read.parquet(path)
    return (
        stored.filter(F.col(part_col).between("2024-01-10", "2024-01-12"))
        .groupBy(F.date_format(part_col, "yyyy-MM-dd").alias("event_date"),
                 "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.count_distinct("user_id").alias("n_users"),
             exact_sum(F.col("value"), 2).alias("total_value"))
        .orderBy("event_date", "event_type")
    )


@query(
    "lineitem_zorder_clustered_scan",
    survey="A-extension(write-time layout: Z-order clustering — one file "
           "set serves narrow predicates on BOTH key columns)",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           {sql_exact_sum(
               'CAST(l_extendedprice AS DOUBLE) * '
               '(1 - CAST(l_discount AS DOUBLE))', 2)} AS revenue
    FROM lineitem
    WHERE l_partkey BETWEEN 40 AND 80 AND l_suppkey BETWEEN 2 AND 5
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def lineitem_zorder_clustered_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout cashing in: materialize lineitem clustered by the
    Morton interleave of (l_partkey, l_suppkey), then answer a query with a
    narrow band predicate on BOTH columns. Every file covers a small
    rectangle in (partkey, suppkey) space, so parquet row-group min/max
    stats skip files for either predicate — single-column sorting can only
    serve one (tests/test_layout.py asserts the skip geometry). At 100 TB
    this is the Delta/Iceberg OPTIMIZE ZORDER move, done with plain
    DataFrame ops: range-repartition on the Morton key + sort within
    partitions."""
    li = tbl(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_returnflag",
        "l_extendedprice", "l_discount")
    path = scratch_dir("lineitem_zorder_")
    layout.write_zordered(li, path, "l_partkey", "l_suppkey",
                          bits=16, n_files=16)
    stored = spark.read.parquet(path)
    return (
        stored
        .filter(F.col("l_partkey").between(40, 80)
                & F.col("l_suppkey").between(2, 5))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             exact_sum(F.col("l_extendedprice")
                       * (1 - F.col("l_discount")), 2).alias("revenue"))
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# ANALYZE-style one-pass column statistics

_ANALYZE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
_ANALYZE_SCALE = 10_000


def _sql_analyze_branch(col: str) -> str:
    return f"""
    SELECT '{col}' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT({col}) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT {col}) AS BIGINT) AS ndv,
           ROUND(MIN(CAST({col} AS DOUBLE)), 6) AS min_val,
           ROUND(MAX(CAST({col} AS DOUBLE)), 6) AS max_val,
           ROUND(SUM(CAST(ROUND(CAST({col} AS DOUBLE) * {_ANALYZE_SCALE})
                          AS BIGINT)) / {_ANALYZE_SCALE}.0
                 / COUNT({col}), 6) AS avg_val
    FROM lineitem"""


@query(
    "lineitem_analyze_column_stats",
    survey="store extension(ANALYZE TABLE column statistics: per-column "
           "row/null/NDV/min/max/avg computed from ONE table scan via "
           "melt — the stats a cost-based optimizer and a data catalog "
           "both feed on)",
    oracle=" UNION ALL ".join(_sql_analyze_branch(c) for c in _ANALYZE_COLS)
    + " ORDER BY column_name",
)
def lineitem_analyze_column_stats(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """ANALYZE-style statistics for the optimizer/catalog: every column's
    count, null count, exact NDV, min/max, and exact-sum average.

    Scale shape: the melt (explode of (name, value) structs) reads the
    table ONCE and fans out k rows per input row — at 100 TB that is one
    scan + one groupBy on a k-bounded key instead of k full scans (the
    naive per-column loop) or one k-way Expand of COUNT(DISTINCT x, y, z)
    in a single aggregate (the multi-distinct planner trap,
    ROUND_NOTES.md). NDV per column is exact via the two-level aggregate:
    distinct (column, value) pairs first (partial-aggregable), then
    counts. The oracle unions per-column scans — oracle clarity, engine
    efficiency."""
    li = tbl(spark, sf_dir, "lineitem")
    melted = li.select(F.explode(F.array(*[
        F.struct(F.lit(c).alias("column_name"),
                 F.col(c).cast("double").alias("v"))
        for c in _ANALYZE_COLS])).alias("m")).select("m.*")
    # exact NDV without Expand: distinct pairs, then count per column
    ndv = (melted.filter(F.col("v").isNotNull())
           .select("column_name", "v").distinct()
           .groupBy("column_name")
           .agg(F.count(F.lit(1)).cast("long").alias("ndv")))
    stats = (melted.groupBy("column_name")
             .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                  (F.count(F.lit(1)) - F.count("v")).cast("long")
                  .alias("n_nulls"),
                  F.round(F.min("v"), 6).alias("min_val"),
                  F.round(F.max("v"), 6).alias("max_val"),
                  (F.sum(F.round(F.col("v") * _ANALYZE_SCALE).cast("long"))
                   / float(_ANALYZE_SCALE)).alias("_sum"),
                  F.count("v").alias("_nn")))
    return (stats.join(ndv, "column_name")
            .select("column_name", "n_rows", "n_nulls", "ndv",
                    "min_val", "max_val",
                    F.round(F.col("_sum") / F.col("_nn"), 6)
                    .alias("avg_val"))
            .orderBy("column_name"))


# ---------------------------------------------------------------------------
# Run-length profile: what sorting buys the encoder

@query(
    "lineitem_rle_run_profile",
    survey="layout extension(run-length profile of low-cardinality "
           "columns under shipdate-sorted vs key-sorted layout — the "
           "direct measure of what sort order buys parquet's RLE/dict "
           "encoder; runs counted by the lag-mismatch identity)",
    oracle="""
    WITH ordered1 AS (
      -- the fixture does NOT enforce TPC-H (orderkey, linenumber)
      -- uniqueness (143k dup pairs at sf0.1), so the run value itself is
      -- the FINAL tiebreak: rows tied on the layout keys sort by v,
      -- making the v-sequence — and hence the run count — total-order
      -- deterministic on both engines (caught by the 10x spot sweep)
      SELECT l_returnflag AS v,
             row_number() OVER (ORDER BY l_shipdate, l_orderkey,
                                l_linenumber, l_returnflag) AS rn
      FROM lineitem),
    runs1 AS (
      SELECT COUNT(*) + 1 AS n_rows,
             1 + SUM(CASE WHEN v <> lag_v THEN 1 ELSE 0 END) AS n_runs
      FROM (SELECT v, lag(v) OVER (ORDER BY rn) AS lag_v FROM ordered1)
      WHERE lag_v IS NOT NULL),
    ordered2 AS (
      SELECT l_returnflag AS v,
             row_number() OVER (ORDER BY l_orderkey, l_linenumber,
                                l_returnflag) AS rn
      FROM lineitem),
    runs2 AS (
      SELECT 1 + SUM(CASE WHEN v <> lag_v THEN 1 ELSE 0 END) AS n_runs
      FROM (SELECT v, lag(v) OVER (ORDER BY rn) AS lag_v FROM ordered2)
      WHERE lag_v IS NOT NULL),
    sorted3 AS (
      SELECT 1 + SUM(CASE WHEN v <> lag_v THEN 1 ELSE 0 END) AS n_runs
      FROM (SELECT v, lag(v) OVER (ORDER BY v) AS lag_v
            FROM (SELECT l_returnflag AS v FROM lineitem))
      WHERE lag_v IS NOT NULL)
    SELECT CAST(runs1.n_rows AS BIGINT) AS n_rows,
           CAST(runs2.n_runs AS BIGINT) AS runs_key_order,
           CAST(runs1.n_runs AS BIGINT) AS runs_shipdate_order,
           CAST(sorted3.n_runs AS BIGINT) AS runs_value_sorted,
           ROUND(CAST(runs2.n_runs AS DOUBLE)
                 / CAST(sorted3.n_runs AS DOUBLE), 6) AS sort_gain
    FROM runs1, runs2, sorted3
    """,
)
def lineitem_rle_run_profile(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """How much run-length encoding each layout buys: count value RUNS of
    the returnflag column under three orders — the natural key order, the
    shipdate clustering, and fully value-sorted (the floor: runs =
    cardinality). Runs fall out of the lag-mismatch identity
    1 + sum(v != lag(v)) — the same gaps-and-islands trick, pointed at
    storage: parquet RLE pages cost O(runs), so sort_gain IS the
    compression headroom a layout rewrite (zorder/sort) unlocks.

    Scale shape: at 100 TB the run counting happens per output FILE
    (this global window is the fixture-scale proxy; per-file the same
    expression runs partition-local after the layout write) — the point
    pinned here is the exact run arithmetic and the ordering of the
    three layouts, which no engine difference may perturb."""
    from pyspark.sql import Window

    li = tbl(spark, sf_dir, "lineitem")

    def runs(order_cols):
        w = Window.orderBy(*order_cols)
        lagged = li.select(F.col("l_returnflag").alias("v"),
                           F.lag("l_returnflag").over(w).alias("lag_v"))
        return (lagged.filter(F.col("lag_v").isNotNull())
                .agg((F.lit(1)
                      + F.sum((F.col("v") != F.col("lag_v")).cast("int")))
                     .cast("long").alias("n_runs"),
                     (F.count(F.lit(1)) + 1).cast("long").alias("n_rows")))

    # l_returnflag last: the fixture has duplicate (orderkey, linenumber)
    # pairs, so the run VALUE is the final tiebreak — run counts are then
    # total-order deterministic (see the oracle comment; 10x spot sweep)
    r_ship = runs(["l_shipdate", "l_orderkey", "l_linenumber",
                   "l_returnflag"]) \
        .select(F.col("n_runs").alias("runs_shipdate_order"), "n_rows")
    r_key = runs(["l_orderkey", "l_linenumber", "l_returnflag"]) \
        .select(F.col("n_runs").alias("runs_key_order"))
    r_val = runs(["l_returnflag"]) \
        .select(F.col("n_runs").alias("runs_value_sorted"))
    return (r_ship.join(F.broadcast(r_key)).join(F.broadcast(r_val))
            .select("n_rows", "runs_key_order", "runs_shipdate_order",
                    "runs_value_sorted",
                    F.round(F.col("runs_key_order").cast("double")
                            / F.col("runs_value_sorted").cast("double"), 6)
                    .alias("sort_gain")))


# ---------------------------------------------------------------------------
# Delta-protocol table: action-log fold + time travel (no delta-spark)

_DL_KEYS = 100
_DL_BUMP = 10.0


def _delta_table_root(spark: SparkSession, sf_dir: str) -> str:
    """Build a two-commit Delta-protocol table from orders (memoized):
    v0 = keys < 100 split by parity into two data files; v1 = an UPDATE
    of the even-parity file (remove + re-add with o_totalprice bumped) —
    the copy-on-write commit every Delta writer produces."""
    from server2_vector_search_server_spark.plans.registry import build_memo
    from server2_vector_search_server_spark.sources import deltalog

    def build() -> str:
        root = scratch_dir("delta_table_")
        orders = (tbl(spark, sf_dir, "orders")
                  .filter(F.col("o_orderkey") < _DL_KEYS)
                  .select("o_orderkey",
                          F.col("o_totalprice").cast("double")
                          .alias("total_price")))
        even = orders.filter(F.col("o_orderkey") % 2 == 0)
        odd = orders.filter(F.col("o_orderkey") % 2 == 1)
        a_even = deltalog.write_data_file(even, root, "part-even.parquet")
        a_odd = deltalog.write_data_file(odd, root, "part-odd.parquet")
        deltalog.write_commit(root, 0, [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": {"id": "spark-graft-delta-demo",
                          "format": {"provider": "parquet"}}},
            a_even, a_odd])
        bumped = even.withColumn("total_price",
                                 F.col("total_price") + _DL_BUMP)
        a_upd = deltalog.write_data_file(bumped, root, "part-even-v1.parquet")
        deltalog.write_commit(root, 1, [
            deltalog.remove_action("part-even.parquet"), a_upd])
        return root

    return build_memo(("delta_log_table", sf_dir), build)


@query(
    "store_delta_log_time_travel",
    survey="A-extension(Delta-Lake PROTOCOL reader: numbered JSON action "
           "log folded into live file sets, copy-on-write update commit, "
           "time travel by version — interchange-format interop with no "
           "delta-spark dependency; snapshot reads are ordinary "
           "pushdown-capable parquet scans)",
    oracle=f"""
    SELECT 0 AS version, CAST(COUNT(*) AS BIGINT) AS n_rows,
           {sql_exact_sum('CAST(o_totalprice AS DOUBLE)', 2)} AS total_value
    FROM orders WHERE o_orderkey < {_DL_KEYS}
    UNION ALL
    SELECT 1 AS version, CAST(COUNT(*) AS BIGINT) AS n_rows,
           {sql_exact_sum(
               f'CAST(o_totalprice AS DOUBLE) + CASE WHEN o_orderkey % 2 = 0 '
               f'THEN {_DL_BUMP} ELSE 0.0 END', 2)} AS total_value
    FROM orders WHERE o_orderkey < {_DL_KEYS}
    ORDER BY version
    """,
)
def store_delta_log_time_travel(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Read BOTH versions of a Delta-protocol table the engine wrote
    itself: version 0 (initial two-file snapshot) and version 1 (a
    copy-on-write UPDATE — remove one file, add its rewritten twin).
    The reader is the open protocol's fold: list commits ≤ v, apply
    add/remove in order, read the surviving parquet files — so the
    oracle can state each snapshot's content directly from the source
    table.  At 100 TB the fold is manifest-sized driver work (real
    readers checkpoint it) and the snapshot scan is a plain parquet
    scan — pushdown, pruning and AQE all apply as if the log never
    existed."""
    from server2_vector_search_server_spark.sources import deltalog

    root = _delta_table_root(spark, sf_dir)
    out = []
    for v in (0, 1):
        snap = deltalog.read_snapshot(spark, root, v)
        out.append(snap.agg(
            F.lit(v).cast("int").alias("version"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            exact_sum(F.col("total_price"), 2).alias("total_value")))
    return out[0].unionByName(out[1]).orderBy("version")
