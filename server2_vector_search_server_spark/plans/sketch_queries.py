"""Mergeable-sketch query surface: HLL distinct counting, KLL quantiles,
theta set expressions (Spark 4's Apache DataSketches integration).

These are the 100-TB summary primitives: a sketch is a bounded-size state
that merges associatively, so per-partition partial sketches roll up through
any shuffle/rollup tree without ever materializing the distinct set — the
pattern every petabyte warehouse uses for distinct-user and quantile
dashboards. The queries here prove three things end-to-end:

  * per-group sketches REAGGREGATE (``hll_union_agg`` over per-type
    sketches == sketching the whole table),
  * estimates land inside the published error bound (checked as hashed
    boolean columns: the oracle asserts TRUE, so a drifted estimate fails
    the driver's value hash),
  * the exact companion values (hash-checked BIGINTs/doubles) come from
    shapes that stay scale-safe: one distinct agg per pass (never the
    multi-count_distinct Expand blowup — ROUND_NOTES gotcha), per-user
    pre-aggregation for set cardinalities.

Sketch estimates themselves are engine-internal (DuckDB has no DataSketches
twin), hence the bound-check design instead of value equality — same pattern
as ``ann_ivf_recall_at_k``'s self-evaluation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from server2_vector_search_server_spark.plans.registry import (
    link_table_files,
    scratch_dir,
    state_partitions,
    query, tbl,
)


def _within_pct(est, exact, pct: float = 0.05):
    """|est − exact| ≤ max(1, pct·exact) as a Column (both args Columns)."""
    tol = F.greatest(F.lit(1.0), exact.cast("double") * pct)
    return (F.abs(est.cast("double") - exact.cast("double")) <= tol)


@query(
    "events_hll_distinct_rollup",
    survey="north-star sketches (HLL distinct users per event type + merged "
           "global rollup via hll_union_agg; estimates bound-checked "
           "against exact distinct counts)",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS est_within_5pct
    FROM events GROUP BY event_type
    UNION ALL
    SELECT '__all__' AS event_type, COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS est_within_5pct
    FROM events
    ORDER BY event_type
    """,
)
def events_hll_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type HLL sketches plus their MERGE: the '__all__' row's estimate
    comes from ``hll_union_agg`` over the five per-type sketches, not from
    rescanning — the rollup contract that lets a 100-TB pipeline keep one
    sketch per (day, type) partition and answer any coarser grain by union.
    Exact distinct counts ride along as the hash-checked ground truth."""
    ev = tbl(spark, sf_dir, "events")
    per = (ev.groupBy("event_type")
           .agg(F.hll_sketch_agg("user_id").alias("sk"),
                F.count_distinct("user_id").alias("exact_users")))
    glob = (per.agg(F.hll_union_agg("sk").alias("sk"))
            .crossJoin(ev.agg(F.count_distinct("user_id")
                              .alias("exact_users")))
            .withColumn("event_type", F.lit("__all__")))
    both = per.select("event_type", "exact_users", "sk").unionByName(
        glob.select("event_type", "exact_users", "sk"))
    est = F.hll_sketch_estimate("sk")
    return (both.select(
                "event_type", "exact_users",
                _within_pct(est, F.col("exact_users"))
                .alias("est_within_5pct"))
            .orderBy("event_type"))


@query(
    "streaming_kll_quantile_rollup",
    survey="I × north-star sketches (incremental quantile maintenance: "
           "per-micro-batch partial KLL sketches persisted per event "
           "type, merged at read — the streaming latency-dashboard "
           "pattern; exact percentiles hash-checked, merged estimates "
           "rank-bound-checked)",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 4) AS p50,
           ROUND(quantile_cont(value, 0.9), 4) AS p90,
           ROUND(quantile_cont(value, 0.99), 4) AS p99,
           TRUE AS p50_rank_ok, TRUE AS p90_rank_ok, TRUE AS p99_rank_ok
    FROM events WHERE value IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
)
def streaming_kll_quantile_rollup(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """``events_kll_value_quantiles`` maintained INCREMENTALLY — the
    quantile twin of ``streaming_hll_distinct_rollup``: each micro-batch
    writes one partial KLL sketch per event type into its own
    ingest_batch partition (KLL is a MERGEABLE summary — Karnin, Lang &
    Liberty 2016 — so partials compose exactly like HLL's), and the
    serving read merges partials with ``kll_merge_agg_double``.  No
    value set is ever re-sorted or rescanned: refresh cost ∝ batch size,
    query cost ∝ partial count, state per (batch, type) ~KB at any input
    size.  Exact per-type percentiles (Spark ``percentile`` == DuckDB
    ``quantile_cont`` at 4 decimals) are the hash-checked companions;
    each merged estimate's TRUE rank must sit within 5% of its target
    (≫ the k=200 sketch's ~1.65% bound, so the boolean is deterministic
    in practice — the events_kll_value_quantiles check, per type)."""
    import uuid as _uuid

    from server2_vector_search_server_spark.session import (
        read_events_stream, read_table,
    )

    src = scratch_dir("kll_stream_")
    link_table_files(sf_dir, "events", src)
    state = scratch_dir("kll_state_") + "/sketches"

    def process(batch, batch_id: int) -> None:
        (batch.groupBy("event_type")
         .agg(F.kll_sketch_agg_double("value").alias("sk"))
         .withColumn("ingest_batch", F.lit(int(batch_id)))
         .write.mode("overwrite").partitionBy("ingest_batch")
         .option("partitionOverwriteMode", "dynamic")
         .parquet(state))

    with state_partitions(spark):
        q = (read_events_stream(spark, src)
             .filter(F.col("value").isNotNull())
             .select("event_type", "value")
             .writeStream.foreachBatch(process)
             .option("checkpointLocation",
                     scratch_dir(f"kll_ckpt_{_uuid.uuid4().hex[:6]}"))
             .trigger(availableNow=True).start())
        q.awaitTermination()

    qs = ((0.5, "p50"), (0.9, "p90"), (0.99, "p99"))
    merged = (spark.read.parquet(state)
              .groupBy("event_type")
              .agg(F.kll_merge_agg_double("sk").alias("sk")))
    ests = merged.select(
        "event_type",
        *[F.kll_sketch_get_quantile_double("sk", F.lit(q))
          .alias(f"_est_{tag}") for q, tag in qs])
    ev = (read_table(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull())
          .select("event_type", "value"))
    joined = ev.join(F.broadcast(ests), "event_type")
    cols = []
    for q, tag in qs:
        cols.append(F.round(F.percentile("value", F.lit(q)), 4).alias(tag))
    for q, tag in qs:
        rank = F.avg((F.col("value") <= F.col(f"_est_{tag}"))
                     .cast("double"))
        cols.append((F.abs(rank - F.lit(q)) <= 0.05).alias(f"{tag}_rank_ok"))
    return (joined.groupBy("event_type").agg(*cols)
            .select("event_type", "p50", "p90", "p99",
                    "p50_rank_ok", "p90_rank_ok", "p99_rank_ok")
            .orderBy("event_type"))


_KLL_QS = ((0.25, "p25"), (0.5, "p50"), (0.75, "p75"), (0.95, "p95"))


@query(
    "events_kll_value_quantiles",
    survey="north-star sketches (KLL quantile sketch over event values; "
           "estimated quantiles bound-checked by true rank error ≤ 5%, "
           "exact interpolated percentiles hash-checked)",
    oracle="SELECT "
           + ", ".join(
               f"ROUND(quantile_cont(value, {q}), 4) AS {tag}, "
               f"TRUE AS {tag}_rank_ok" for q, tag in _KLL_QS)
           + " FROM events",
)
def events_kll_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One KLL sketch pass answers all quantiles with bounded state (~KB at
    any input size — vs exact percentile's full sort). Self-check: the true
    rank of each estimated quantile (one broadcast + one avg pass) must sit
    within 5% of the target rank — ≫ the k=200 sketch's ~1.65% bound, so
    the boolean is deterministic in practice. Exact percentiles (Spark
    ``percentile`` == DuckDB ``quantile_cont`` at 4 decimals) are the
    hash-checked companions."""
    ev = tbl(spark, sf_dir, "events")
    ests = (ev.agg(F.kll_sketch_agg_double("value").alias("sk"))
            .select(*[F.kll_sketch_get_quantile_double("sk", F.lit(q))
                      .alias(f"_est_{tag}") for q, tag in _KLL_QS]))
    joined = ev.crossJoin(F.broadcast(ests))
    cols = []
    for q, tag in _KLL_QS:
        cols.append(F.round(F.percentile("value", F.lit(q)), 4).alias(tag))
        rank = F.avg((F.col("value") <= F.col(f"_est_{tag}")).cast("double"))
        cols.append((F.abs(rank - F.lit(q)) <= 0.05).alias(f"{tag}_rank_ok"))
    return joined.agg(*cols)


@query(
    "events_theta_set_users",
    survey="north-star sketches (theta sketches: distinct-user set algebra "
           "— union/intersection/difference of click vs purchase audiences "
           "without materializing either set)",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             bool_or(event_type = 'click') AS c,
             bool_or(event_type = 'purchase') AS p
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY user_id)
    SELECT COUNT(*) AS exact_union,
           SUM(CASE WHEN c AND p THEN 1 ELSE 0 END) :: BIGINT
             AS exact_intersection,
           SUM(CASE WHEN c AND NOT p THEN 1 ELSE 0 END) :: BIGINT
             AS exact_difference,
           TRUE AS union_est_ok, TRUE AS inter_est_ok, TRUE AS diff_est_ok
    FROM per_user
    """,
)
def events_theta_set_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience set algebra on sketches: build one theta sketch per segment
    in a single scan (null-skipping conditional agg), then union /
    intersection / difference are O(sketch) driver-free scalar expressions
    — the only sketch family with closed set operations (HLL unions but
    cannot intersect). Exact companions come from a per-user pre-aggregate
    (one shuffle, no Expand), the segment-membership shape that stays
    linear at any corpus size."""
    ev = tbl(spark, sf_dir, "events")
    per_user = (ev.filter(F.col("event_type").isin("click", "purchase"))
                .groupBy("user_id")
                .agg(F.bool_or(F.col("event_type") == "click").alias("c"),
                     F.bool_or(F.col("event_type") == "purchase")
                     .alias("p")))
    exact = per_user.agg(
        F.count(F.lit(1)).alias("exact_union"),
        F.sum((F.col("c") & F.col("p")).cast("int")).cast("long")
        .alias("exact_intersection"),
        F.sum((F.col("c") & ~F.col("p")).cast("int")).cast("long")
        .alias("exact_difference"))
    sks = ev.agg(
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "click", F.col("user_id")))
        .alias("sk_c"),
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "purchase", F.col("user_id")))
        .alias("sk_p"))
    ests = sks.select(
        F.theta_sketch_estimate(F.theta_union("sk_c", "sk_p"))
        .alias("_eu"),
        F.theta_sketch_estimate(F.theta_intersection("sk_c", "sk_p"))
        .alias("_ei"),
        F.theta_sketch_estimate(F.theta_difference("sk_c", "sk_p"))
        .alias("_ed"))
    return (exact.crossJoin(ests)
            .select("exact_union", "exact_intersection", "exact_difference",
                    _within_pct(F.col("_eu"), F.col("exact_union"))
                    .alias("union_est_ok"),
                    _within_pct(F.col("_ei"), F.col("exact_intersection"))
                    .alias("inter_est_ok"),
                    _within_pct(F.col("_ed"), F.col("exact_difference"))
                    .alias("diff_est_ok")))


@query(
    "streaming_hll_distinct_rollup",
    survey="I × north-star sketches (incremental distinct-count "
           "maintenance: per-micro-batch partial HLL sketches persisted, "
           "merged at read — the streaming dashboard pattern; exact "
           "companions hash-checked, estimate bound-checked)",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS est_within_5pct
    FROM events GROUP BY event_type
    UNION ALL
    SELECT '__all__' AS event_type, COUNT(DISTINCT user_id), TRUE
    FROM events
    ORDER BY event_type
    """,
)
def streaming_hll_distinct_rollup(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """events_hll_distinct_rollup maintained INCREMENTALLY: each micro-batch
    writes one partial sketch per event type into its own ingest_batch
    partition (bytes, not ids — state per (batch, type) is ~KB regardless
    of user cardinality; replay overwrites its own partition, the
    streaming/ivm.py discipline), and the serving read merges partials
    with hll_union_agg. No distinct set is ever materialized or rescanned
    — refresh cost ∝ batch size, query cost ∝ partial count. Exact
    companions come from one batch pass over the drained table; the merged
    estimates must land within 5% (hash-checked booleans)."""
    import os
    import uuid as _uuid

    from server2_vector_search_server_spark.session import (
        read_events_stream, read_table,
    )

    # dynamic overwrite goes on the write options (ADVICE r3: a session-
    # level set with no restore leaks into every later overwrite)
    src = scratch_dir("hll_stream_")
    link_table_files(sf_dir, "events", src)
    state = scratch_dir("hll_state_") + "/sketches"

    def process(batch, batch_id: int) -> None:
        (batch.groupBy("event_type")
         .agg(F.hll_sketch_agg("user_id").alias("sk"))
         .withColumn("ingest_batch", F.lit(int(batch_id)))
         .write.mode("overwrite").partitionBy("ingest_batch")
         .option("partitionOverwriteMode", "dynamic")
         .parquet(state))

    with state_partitions(spark):
        q = (read_events_stream(spark, src)
             .select("event_type", "user_id")
             .writeStream.foreachBatch(process)
             .option("checkpointLocation",
                     scratch_dir(f"hll_ckpt_{_uuid.uuid4().hex[:6]}"))
             .trigger(availableNow=True).start())
        q.awaitTermination()

    partials = spark.read.parquet(state)
    per = (partials.groupBy("event_type")
           .agg(F.hll_union_agg("sk").alias("sk")))
    glob = (per.agg(F.hll_union_agg("sk").alias("sk"))
            .withColumn("event_type", F.lit("__all__")))
    merged = per.unionByName(glob.select("event_type", "sk"))
    ev = read_table(spark, sf_dir, "events")
    exact = (ev.groupBy("event_type")
             .agg(F.count_distinct("user_id").alias("exact_users")))
    exact_all = (ev.agg(F.count_distinct("user_id").alias("exact_users"))
                 .withColumn("event_type", F.lit("__all__")))
    exacts = exact.unionByName(exact_all.select("event_type", "exact_users"))
    est = F.hll_sketch_estimate("sk")
    return (merged.join(exacts, "event_type")
            .select("event_type", "exact_users",
                    _within_pct(est, F.col("exact_users"))
                    .alias("est_within_5pct"))
            .orderBy("event_type"))


# ---------------------------------------------------------------------------
# Count-Min sketch: point-frequency estimates with a one-sided error

_CMS_D = 4            # depth: independent hash rows
_CMS_W = 64           # width: cells per row
_CMS_PROBES = ("hot_0", "hot_1", "hot_2", "cold_45")


def _cms_params():
    from server2_vector_search_server_spark.operators import dedup

    return dedup.PERMS[:_CMS_D], dedup.MERSENNE31


_SQL_CMS_VALS = """
      SELECT CASE WHEN event_id % 10 < 3
                  THEN 'hot_' || CAST(event_id % 3 AS VARCHAR)
                  ELSE 'cold_' || CAST(event_id AS VARCHAR) END AS v
      FROM events WHERE event_id < 20000
"""


def _sql_cms() -> str:
    from server2_vector_search_server_spark.functions.text import (
        sql_token_hash,
    )

    perms, m31 = _cms_params()
    cell = lambda j: (f"(({perms[j][0]} * {sql_token_hash('v')} "  # noqa: E731
                      f"+ {perms[j][1]}) % {m31}) % {_CMS_W}")
    cells = "\n      UNION ALL ".join(
        f"SELECT v, {j} AS j, {cell(j)} AS cell FROM vals"
        for j in range(_CMS_D))
    probe_cells = "\n      UNION ALL ".join(
        f"SELECT v, {j} AS j, {cell(j)} AS cell FROM probes"
        for j in range(_CMS_D))
    probes = ", ".join(f"('{p}')" for p in _CMS_PROBES)
    return f"""
    WITH vals AS ({_SQL_CMS_VALS}),
    cells AS (
      {cells}),
    sketch AS (
      SELECT j, cell, CAST(COUNT(*) AS BIGINT) AS c
      FROM cells GROUP BY j, cell),
    probes AS (SELECT * FROM (VALUES {probes}) AS p(v)),
    probe_cells AS (
      {probe_cells}),
    est AS (
      SELECT pc.v, MIN(s.c) AS cms_estimate
      FROM probe_cells pc JOIN sketch s ON s.j = pc.j AND s.cell = pc.cell
      GROUP BY pc.v),
    truth AS (
      SELECT p.v, CAST(COUNT(vals.v) AS BIGINT) AS true_count
      FROM probes p LEFT JOIN vals ON vals.v = p.v GROUP BY p.v)
    SELECT t.v, t.true_count, e.cms_estimate,
           e.cms_estimate >= t.true_count AS never_undercounts,
           e.cms_estimate - t.true_count AS overcount
    FROM truth t JOIN est e ON e.v = t.v
    ORDER BY t.v
    """


def _cms_val_expr():
    return (F.when(F.col("event_id") % 10 < 3,
                   F.concat(F.lit("hot_"),
                            (F.col("event_id") % 3).cast("string")))
            .otherwise(F.concat(F.lit("cold_"),
                                F.col("event_id").cast("string")))
            .alias("v"))


def _cms_cells(df):
    """(v, j, cell) rows for every value × depth — shared by the batch
    query and the streaming upkeep twin."""
    from server2_vector_search_server_spark.functions.text import token_hash

    perms, m31 = _cms_params()
    h = token_hash(F.col("v"))
    return df.select(
        "v",
        F.posexplode(F.array(*[
            ((F.lit(a) * h + F.lit(b)) % m31) % _CMS_W
            for a, b in perms])).alias("j", "cell"))


def _cms_report(spark: SparkSession, sf_dir: str, sketch) -> DataFrame:
    """Probe the sketch and join exact truth — the shared tail of both
    CMS queries (same output contract as the _sql_cms oracle)."""
    ev = tbl(spark, sf_dir, "events").filter(F.col("event_id") < 20000)
    vals = ev.select(_cms_val_expr())
    probes = spark.createDataFrame([(p,) for p in _CMS_PROBES], "v string")
    est = (_cms_cells(probes).join(sketch, ["j", "cell"])
           .groupBy("v").agg(F.min("c").alias("cms_estimate")))
    truth = (probes.join(vals.groupBy("v")
                         .agg(F.count(F.lit(1)).alias("n")), "v", "left")
             .select("v", F.coalesce("n", F.lit(0)).cast("long")
                     .alias("true_count")))
    return (truth.join(est, "v")
            .select("v", "true_count", "cms_estimate",
                    (F.col("cms_estimate") >= F.col("true_count"))
                    .alias("never_undercounts"),
                    (F.col("cms_estimate") - F.col("true_count"))
                    .alias("overcount"))
            .orderBy("v"))



@query(
    "events_countmin_estimates",
    survey="north-star sketches (Count-Min point-frequency estimates: "
           "depth-4 x width-64 deterministic-hash sketch, min-over-rows "
           "lookup; estimates AND the one-sided-error guarantee both "
           "hash-pinned exactly)",
    oracle=_sql_cms(),
)
def events_countmin_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005, public algorithm)
    over the hot/long-tail value mix: ``d`` independent 31-poly hash rows
    of ``w`` counter cells; a point estimate is the MIN over its row
    cells, which can only over-count (collisions add, never subtract).
    The hashes are the repo's deterministic affine family, so unlike HLL
    the ENTIRE sketch is engine-reproducible: the oracle rebuilds the
    cells bit-for-bit and hash-checks the estimates themselves plus the
    never-undercounts guarantee and each probe's exact overcount. Scale:
    the sketch is one groupBy over d·n rows into ≤ d·w cells — mergeable
    bounded state (cell-wise SUM merges partitions/days), the same
    rollup contract as the HLL family."""
    ev = tbl(spark, sf_dir, "events").filter(F.col("event_id") < 20000)
    sketch = (_cms_cells(ev.select(_cms_val_expr()))
              .groupBy("j", "cell").agg(F.count(F.lit(1)).alias("c")))
    return _cms_report(spark, sf_dir, sketch)


@query(
    "streaming_countmin_upkeep",
    survey="I × north-star sketches (incremental Count-Min maintenance: "
           "per-micro-batch cell partials persisted per ingest_batch "
           "partition, SUM-merged at read, batch-0 replay folded in — "
           "the streaming sketch hash-pins to the SAME oracle as the "
           "batch build, because cell-wise SUM merge is exact)",
    oracle=_sql_cms(),
)
def streaming_countmin_upkeep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events_countmin_estimates maintained INCREMENTALLY: each micro-batch
    writes its (j, cell, count) partials into its own ingest_batch
    partition (state per batch ≤ d·w rows regardless of batch size);
    replay of batch 0 is simulated by re-committing its exact rows under
    the original batch id — dynamic partition overwrite makes it
    idempotent, and the final estimates prove it by hash-matching the
    batch oracle EXACTLY (unlike HLL, the CMS merge is plain SUM, so
    streaming-vs-batch equality is bit-exact, not bound-checked). Serving
    merges ≤ batches·d·w cell rows — never rescans the stream."""
    import os
    import uuid as _uuid

    from server2_vector_search_server_spark.session import (
        read_events_stream,
    )

    src = scratch_dir("cms_stream_")
    link_table_files(sf_dir, "events", src)
    state = scratch_dir("cms_state_") + "/cells"

    def process(batch, batch_id: int) -> None:
        vals = (batch.filter(F.col("event_id") < 20000)
                .select(_cms_val_expr()))
        (_cms_cells(vals).groupBy("j", "cell")
         .agg(F.count(F.lit(1)).alias("c"))
         .withColumn("ingest_batch", F.lit(int(batch_id)))
         .write.mode("overwrite").partitionBy("ingest_batch")
         .option("partitionOverwriteMode", "dynamic")
         .parquet(state))

    with state_partitions(spark):
        q = (read_events_stream(spark, src)
             .select("event_id")
             .writeStream.foreachBatch(process)
             .option("checkpointLocation",
                     scratch_dir(f"cms_ckpt_{_uuid.uuid4().hex[:6]}"))
             .trigger(availableNow=True).start())
        q.awaitTermination()

    # at-least-once replay: re-commit batch 0's exact partials under its
    # original id; localCheckpoint decouples the read from the same-path
    # dynamic overwrite (the ann-upkeep discipline)
    b0 = (spark.read.parquet(state)
          .filter(F.col("ingest_batch") == 0)
          .select("j", "cell", "c").localCheckpoint(eager=True))
    (b0.withColumn("ingest_batch", F.lit(0))
     .write.mode("overwrite").partitionBy("ingest_batch")
     .option("partitionOverwriteMode", "dynamic").parquet(state))

    sketch = (spark.read.parquet(state)
              .groupBy("j", "cell").agg(F.sum("c").alias("c")))
    return _cms_report(spark, sf_dir, sketch)


# ---------------------------------------------------------------------------
# Lossy counting (Manku & Motwani 2002): bounded-state frequent items

_LC_ROUNDS = 6          # 30 days of events -> 6 five-day buckets
_LC_DAYS_PER_BUCKET = 5

_SQL_LC_CNT = f"""
    SELECT CAST(FLOOR(datediff('day',
                         (SELECT MIN(CAST(ts AS DATE)) FROM events),
                         CAST(ts AS DATE))
                      / {_LC_DAYS_PER_BUCKET}.0) AS INTEGER) AS b,
           CAST(ROUND(CAST(value AS DOUBLE)) AS INTEGER) AS item,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
"""


def _sql_lossy_counting() -> str:
    parts = [f"cnt AS ({_SQL_LC_CNT})",
             "st1 AS (SELECT item, c AS f, CAST(0 AS BIGINT) AS delta "
             "FROM cnt WHERE b = 0 AND c + 0 > 1)"]
    for r in range(2, _LC_ROUNDS + 1):
        parts.append(f"""
    st{r} AS (
      SELECT COALESCE(s.item, c.item) AS item,
             COALESCE(s.f, 0) + COALESCE(c.c, 0) AS f,
             COALESCE(s.delta, {r - 1}) AS delta
      FROM st{r - 1} s FULL OUTER JOIN (SELECT * FROM cnt WHERE b = {r - 1}) c
        ON s.item = c.item
      WHERE COALESCE(s.f, 0) + COALESCE(c.c, 0)
            + COALESCE(s.delta, {r - 1}) > {r})""")
    parts.append("""
    truth AS (
      SELECT CAST(ROUND(CAST(value AS DOUBLE)) AS INTEGER) AS item,
             CAST(COUNT(*) AS BIGINT) AS true_count
      FROM events GROUP BY 1)""")
    return ("WITH " + ",".join(parts) + f"""
    SELECT s.item, CAST(s.f AS BIGINT) AS f, CAST(s.delta AS BIGINT) AS delta,
           t.true_count,
           (s.f <= t.true_count AND t.true_count <= s.f + s.delta)
             AS error_bound_ok
    FROM st{_LC_ROUNDS} s JOIN truth t ON s.item = t.item
    ORDER BY s.f DESC, s.item LIMIT 50""")


@query(
    "events_lossy_counting",
    survey="north-star sketches (lossy counting, Manku & Motwani 2002: "
           "bucketed frequent-item summary with bounded state and the "
           "f <= true <= f + delta guarantee hash-pinned per survivor)",
    oracle=_sql_lossy_counting(),
)
def events_lossy_counting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lossy counting over the event value stream: 6 five-day buckets; per
    bucket, merge counts into the summary and PRUNE entries whose
    f + delta <= bucket index — state stays O(1/eps) regardless of stream
    length, the one-pass frequent-items contract. The survivors'
    deterministic (f, delta) state AND the per-item error-bound boolean
    (f <= true <= f + delta) are hash-checked against a round-unrolled
    oracle.

    Scale shape: one shuffle builds (bucket, item) counts; each of the 6
    maintenance rounds is a full-outer join between the BOUNDED summary
    (pruned every round) and one bucket's counts — never stream-sized
    state. Only the (bucket, item) count table is checkpointed: the round
    count is fixed, so the 6-round lineage is a bounded plan evaluated in
    ONE job (per-round checkpoints are for unbounded iteration — pagerank;
    they cost a driver-blocking job per round here). Buckets are DATA-derived
    (event days), so the result is independent of partitioning and
    micro-batch boundaries — the property that makes the summary
    replayable in the WAL/streaming path."""
    ev = tbl(spark, sf_dir, "events")
    min_day = ev.agg(F.min(F.to_date("ts")).alias("d0"))
    cnt = (ev.join(F.broadcast(min_day))
           .select((F.floor(F.datediff(F.to_date("ts"), F.col("d0"))
                            / _LC_DAYS_PER_BUCKET)).cast("int").alias("b"),
                   F.round(F.col("value").cast("double")).cast("int")
                   .alias("item"))
           .groupBy("b", "item").agg(F.count(F.lit(1)).alias("c"))
           .localCheckpoint(eager=True))
    state = (cnt.filter((F.col("b") == 0) & (F.col("c") + 0 > 1))
             .select("item", F.col("c").alias("f"),
                     F.lit(0).cast("long").alias("delta")))
    for r in range(2, _LC_ROUNDS + 1):
        batch = (cnt.filter(F.col("b") == r - 1)
                 .select(F.col("item").alias("b_item"), "c"))
        merged = (state.join(batch, state.item == batch.b_item, "full_outer")
                  .select(
                      F.coalesce("item", "b_item").alias("item"),
                      (F.coalesce("f", F.lit(0))
                       + F.coalesce("c", F.lit(0))).alias("f"),
                      F.coalesce("delta", F.lit(r - 1)).cast("long")
                      .alias("delta")))
        # NO per-round checkpoint (round 10): the round count is FIXED (6)
        # and every branch reads the one checkpointed `cnt`, so the chained
        # lineage is a bounded 6-join plan evaluated once — the iterative-
        # lineage rule only demands barriers where depth grows with data
        # or unbounded rounds (betweenness docstring). The old per-round
        # eager checkpoint paid 5 extra driver-blocking jobs per call.
        state = merged.filter(F.col("f") + F.col("delta") > r)
    truth = (ev.select(F.round(F.col("value").cast("double")).cast("int")
                       .alias("item"))
             .groupBy("item").agg(F.count(F.lit(1)).cast("long")
                                  .alias("true_count")))
    out = (state.join(truth, "item")
           .select("item", F.col("f").cast("long").alias("f"),
                   F.col("delta").cast("long").alias("delta"),
                   "true_count",
                   ((F.col("f") <= F.col("true_count"))
                    & (F.col("true_count") <= F.col("f") + F.col("delta")))
                   .alias("error_bound_ok")))
    return out.orderBy(F.col("f").desc(), "item").limit(50)


def _lc_bucket_counts(df):
    """(b, item, c) bucket counts for a batch — shared by the batch query
    and the streaming upkeep twin (buckets derive from EVENT DAYS, so any
    micro-batch slicing produces mergeable partials)."""
    return (df.select(
        F.floor(F.datediff(F.to_date("ts"),
                           F.lit("2024-01-01").cast("date"))
                / _LC_DAYS_PER_BUCKET).cast("int").alias("b"),
        F.round(F.col("value").cast("double")).cast("int").alias("item"))
        .groupBy("b", "item").agg(F.count(F.lit(1)).alias("c")))


@query(
    "streaming_lossy_counting_upkeep",
    survey="I x north-star sketches (incremental lossy-counting "
           "maintenance: per-micro-batch (bucket, item) partials in "
           "ingest_batch partitions, SUM-merged at read, the bounded-"
           "state fold applied at serve time; batch-0 replay idempotent "
           "— hash-pins to the SAME oracle as events_lossy_counting "
           "because bucket counts merge exactly)",
    oracle=_sql_lossy_counting(),
)
def streaming_lossy_counting_upkeep(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """events_lossy_counting maintained incrementally: micro-batches write
    (bucket, item, count) partials into per-ingest_batch partitions —
    bucket identity comes from the EVENT DAY, not the batch id, so
    arbitrary micro-batch boundaries slice buckets without changing the
    merged counts (the property the batch query's docstring promises).
    Batch-0 replay re-commits its exact partials under the original id
    (dynamic partition overwrite -> idempotent, the countmin/bloom
    discipline). Serving SUM-merges the bounded partials and runs the
    6-round prune fold on the merged bucket table — identical to the
    batch build, hence the identical oracle."""
    import os
    import uuid as _uuid

    from server2_vector_search_server_spark.session import (
        read_events_stream,
    )

    src = scratch_dir("lc_stream_")
    link_table_files(sf_dir, "events", src)
    state = scratch_dir("lc_state_") + "/cells"

    def process(batch, batch_id: int) -> None:
        (_lc_bucket_counts(batch)
         .withColumn("ingest_batch", F.lit(int(batch_id)))
         .write.mode("overwrite").partitionBy("ingest_batch")
         .option("partitionOverwriteMode", "dynamic")
         .parquet(state))

    with state_partitions(spark):
        q = (read_events_stream(spark, src)
             .select("ts", "value")
             .writeStream.foreachBatch(process)
             .option("checkpointLocation",
                     scratch_dir(f"lc_ckpt_{_uuid.uuid4().hex[:6]}"))
             .trigger(availableNow=True).start())
        q.awaitTermination()

    b0 = (spark.read.parquet(state)
          .filter(F.col("ingest_batch") == 0)
          .select("b", "item", "c").localCheckpoint(eager=True))
    (b0.withColumn("ingest_batch", F.lit(0))
     .write.mode("overwrite").partitionBy("ingest_batch")
     .option("partitionOverwriteMode", "dynamic").parquet(state))

    cnt = (spark.read.parquet(state)
           .groupBy("b", "item").agg(F.sum("c").alias("c"))
           .localCheckpoint(eager=True))
    state_df = (cnt.filter((F.col("b") == 0) & (F.col("c") + 0 > 1))
                .select("item", F.col("c").alias("f"),
                        F.lit(0).cast("long").alias("delta")))
    for r in range(2, _LC_ROUNDS + 1):
        batch = (cnt.filter(F.col("b") == r - 1)
                 .select(F.col("item").alias("b_item"), "c"))
        merged = (state_df.join(batch, state_df.item == batch.b_item,
                                "full_outer")
                  .select(
                      F.coalesce("item", "b_item").alias("item"),
                      (F.coalesce("f", F.lit(0))
                       + F.coalesce("c", F.lit(0))).alias("f"),
                      F.coalesce("delta", F.lit(r - 1)).cast("long")
                      .alias("delta")))
        state_df = (merged.filter(F.col("f") + F.col("delta") > r)
                    .localCheckpoint(eager=True))
    ev = tbl(spark, sf_dir, "events")
    truth = (ev.select(F.round(F.col("value").cast("double")).cast("int")
                       .alias("item"))
             .groupBy("item").agg(F.count(F.lit(1)).cast("long")
                                  .alias("true_count")))
    out = (state_df.join(truth, "item")
           .select("item", F.col("f").cast("long").alias("f"),
                   F.col("delta").cast("long").alias("delta"),
                   "true_count",
                   ((F.col("f") <= F.col("true_count"))
                    & (F.col("true_count") <= F.col("f") + F.col("delta")))
                   .alias("error_bound_ok")))
    return out.orderBy(F.col("f").desc(), "item").limit(50)


# ---------------------------------------------------------------------------
# Sliding-window distinct users from mergeable hourly sketches

_SLW_HOURS = 24
_SLW_ORIGIN = "2024-01-01 00:00:00"


@query(
    "events_sliding_distinct_hll",
    survey="north-star sketches (trailing-24h distinct users per report "
           "hour from MERGED hourly HLL sketches — the windowed-sketch "
           "pattern: one sketch per hour, any window answered by union, "
           "never a per-window rescan; exact companions hash-checked, "
           "estimates bound-checked)",
    oracle=f"""
    WITH hu AS (
      SELECT DISTINCT
             CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 3600.0) AS BIGINT)
             - CAST(FLOOR(epoch(TIMESTAMP '{_SLW_ORIGIN}') / 3600.0)
                    AS BIGINT) AS h,
             user_id
      FROM events),
    contrib AS (
      SELECT hu.h + o.o AS rep_h, hu.user_id
      FROM hu, UNNEST(range(0, {_SLW_HOURS})) AS o(o)),
    win AS (
      SELECT rep_h, COUNT(DISTINCT user_id) AS exact_users
      FROM contrib WHERE rep_h % 24 = 23 AND rep_h < 720
      GROUP BY rep_h)
    SELECT rep_h, CAST(exact_users AS BIGINT) AS exact_users,
           TRUE AS est_within_5pct
    FROM win ORDER BY rep_h
    """,
)
def events_sliding_distinct_hll(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Trailing-24-hour distinct users, reported daily — answered from
    PER-HOUR HLL sketches merged across each window (720 sketches ->
    any trailing window by hll_union_agg), the pattern that makes
    sliding distinct-count dashboards feasible at 100 TB: the raw stream
    is touched once, windows cost sketch-merge only. Exact companions
    come from the distinct (hour, user) pre-aggregate fanned to its
    windows (a bounded 24x explode), hash-checked; the estimate rides as
    a 5%-bound boolean (the HLL family contract).

    Scale shape: one shuffle to (hour, user) distincts, one to hourly
    sketches; the window fan-out is sketch-rows x 24, never event rows."""
    ev = tbl(spark, sf_dir, "events")
    origin_h = F.floor(
        F.unix_timestamp(F.lit(_SLW_ORIGIN).cast("timestamp")) / 3600.0)
    hcol = (F.floor(F.unix_timestamp("ts") / 3600.0) - origin_h) \
        .cast("long")
    hu = ev.select(hcol.alias("h"), "user_id").distinct() \
        .localCheckpoint(eager=True)
    rep_filter = (F.col("rep_h") % 24 == 23) & (F.col("rep_h") < 720)
    exact = (hu.select(F.explode(F.sequence(
        F.col("h"), F.col("h") + _SLW_HOURS - 1)).alias("rep_h"),
        "user_id")
        .filter(rep_filter)
        .groupBy("rep_h")
        .agg(F.count_distinct("user_id").cast("long")
             .alias("exact_users")))
    hourly_sk = (ev.select(hcol.alias("h"), "user_id")
                 .groupBy("h").agg(F.hll_sketch_agg("user_id").alias("sk")))
    win_sk = (hourly_sk.select(F.explode(F.sequence(
        F.col("h"), F.col("h") + _SLW_HOURS - 1)).alias("rep_h"), "sk")
        .filter(rep_filter)
        .groupBy("rep_h").agg(F.hll_union_agg("sk").alias("sk"))
        .select("rep_h", F.hll_sketch_estimate("sk").alias("est")))
    tol = F.greatest(F.lit(1.0), F.col("exact_users").cast("double") * 0.05)
    return (exact.join(win_sk, "rep_h")
            .select("rep_h", "exact_users",
                    (F.abs(F.col("est") - F.col("exact_users")
                           .cast("double")) <= tol)
                    .alias("est_within_5pct"))
            .orderBy("rep_h"))
