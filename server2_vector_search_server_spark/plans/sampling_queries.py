"""Sampling + approximate-aggregate query surface (training-pipeline ops;
see operators/sampling.py for the scale rationale of each).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from server2_vector_search_server_spark.operators import sampling
from server2_vector_search_server_spark.plans.registry import query, tbl
from server2_vector_search_server_spark.plans.text_queries import _SQL_QUALITY


@query(
    "hash_sample_documents",
    survey="north-star sampling (value-deterministic content-hash split)",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS min_doc_id
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
    GROUP BY lang
    ORDER BY lang
    """,
)
def hash_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A ~2/16 held-out split selected by md5(doc_id) prefix, summarized per
    language. The predicate depends only on row values, so the same docs are
    chosen at any partitioning/parallelism — exactly reproducible here by
    DuckDB's md5. The filter sits directly on the scan (no shuffle before
    it); the summary is one small aggregate."""
    docs = tbl(spark, sf_dir, "documents")
    return (
        sampling.hash_sample(docs, "doc_id", ("0", "1"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_chars").alias("total_chars"),
             F.min("doc_id").alias("min_doc_id"))
        .orderBy("lang")
    )


_FRACTIONS = {"en": 0.3, "de": 1.0, "fr": 1.0, "es": 1.0, "zh": 1.0}


@query(
    "stratified_sample_documents",
    survey="north-star sampling (per-stratum rebalance via sampleBy; "
           "realized fractions pinned to engine-independent bounds — "
           "exact-keep strata must match exactly, the Bernoulli stratum "
           "must land inside its 4σ CI)",
    oracle="""
    SELECT lang, COUNT(*) AS n_source, TRUE AS sample_ok
    FROM documents WHERE lang IN ('de', 'en', 'es', 'fr', 'zh')
    GROUP BY lang ORDER BY lang
    """,
)
def stratified_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language rebalancing for a training mix: downsample the dominant
    'en' stratum to 30%, keep the rest — the canonical curation move before
    expensive downstream stages. The seed-dependent sample itself is not
    SQL-reproducible, so the CHECKED contract is the invariant pair
    (VERDICT r4 item 5): fraction-1.0 strata keep every row (Bernoulli at
    p=1 is deterministic), and the 0.3 stratum's realized fraction sits
    inside the 4σ binomial CI. ``n_source`` stays engine-exact; a sampler
    drift flips ``sample_ok`` and reds the hash."""
    docs = tbl(spark, sf_dir, "documents")
    src = (docs.filter(F.col("lang").isin(*_FRACTIONS))
           .groupBy("lang").agg(F.count(F.lit(1)).alias("n_source")))
    smp = (sampling.stratified_sample(docs, "lang", _FRACTIONS, seed=42)
           .groupBy("lang").agg(F.count(F.lit(1)).alias("n_sample")))
    frac = F.create_map(
        *[F.lit(x) for kv in _FRACTIONS.items() for x in kv])[F.col("lang")]
    realized = F.col("n_sample") / F.col("n_source")
    ci = 4.0 * F.sqrt(frac * (F.lit(1.0) - frac) / F.col("n_source"))
    return (src.join(smp, "lang", "left").na.fill({"n_sample": 0})
            .select("lang", "n_source",
                    F.when(frac == 1.0,
                           F.col("n_sample") == F.col("n_source"))
                    .otherwise(F.abs(realized - frac) <= ci)
                    .alias("sample_ok"))
            .orderBy("lang"))


@query(
    "approx_event_aggregates",
    survey="D-extension(approximate aggregates: HLL distinct + sketch "
           "percentiles, pinned to error bounds against the exact answers "
           "in the same hash-checked row)",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS approx_users_ok, TRUE AS p50_ok, TRUE AS p95_ok
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def approx_event_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type approximate cardinality (HyperLogLog++, rsd=0.02) and
    approximate percentiles (mergeable sketch, accuracy=10000). One pass,
    constant state per group — the 100 TB substitute for exact
    count-distinct (which shuffles every distinct value) and exact
    percentiles (which sort each group). Sketch internals aren't
    SQL-reproducible, so the checked contract bounds them against exact
    twins computed alongside (VERDICT r4 item 5): HLL within 3·rsd of the
    exact distinct count; each approx percentile (an actual data value
    whose rank error is ≤ n/accuracy) between the exact ±0.01-quantile
    neighbors. The exact columns exist only to pin the sketch — at 100 TB
    the approx columns ARE the product."""
    events = tbl(spark, sf_dir, "events")
    agg = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        F.percentile_approx("value", [0.5, 0.95], 10000).alias("ap"),
        F.expr("percentile(value, array(0.49, 0.51, 0.94, 0.96))")
        .alias("ex"))
    return (agg.select(
        "event_type", "exact_users",
        (F.abs(F.col("approx_users") - F.col("exact_users"))
         <= 0.06 * F.col("exact_users")).alias("approx_users_ok"),
        F.col("ap")[0].between(F.col("ex")[0], F.col("ex")[1])
        .alias("p50_ok"),
        F.col("ap")[1].between(F.col("ex")[2], F.col("ex")[3])
        .alias("p95_ok"))
        .orderBy("event_type"))


@query(
    "events_heavy_hitters",
    survey="north-star approx (exact heavy hitters at sketch cost: "
           "per-partition Misra-Gries candidates -> exact rescore; the "
           "sketch bounds work, the rescore restores hash-exact semantics)",
    oracle="""
    WITH vals AS (
      SELECT CASE WHEN event_id % 10 < 3
                  THEN 'hot_' || CAST(event_id % 3 AS VARCHAR)
                  ELSE 'cold_' || CAST(event_id AS VARCHAR) END AS v
      FROM events WHERE event_id < 20000)
    SELECT v, COUNT(*) AS n_occurrences
    FROM vals
    GROUP BY v
    HAVING COUNT(*) > CAST((SELECT COUNT(*) FROM vals) / 50 AS BIGINT)
    ORDER BY n_occurrences DESC, v
    """,
)
def events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``operators/sampling.heavy_hitters`` over a planted hot/long-tail
    mix (3 hot values ≈ 2 000 occurrences each, ~14 000 singletons): the
    per-partition Misra-Gries pass (k=50 counters, no shuffle) provably
    cannot evict a value with global frequency > n/50, and the exact
    rescore over the bounded candidate set makes the result hash-identical
    to the full GROUP BY ... HAVING — while the wide aggregate only ever
    sees candidate rows. Same prune-then-rescore architecture as the ANN
    tiers, applied to frequency."""
    from server2_vector_search_server_spark.operators.sampling import (
        heavy_hitters,
    )

    events = tbl(spark, sf_dir, "events").filter(F.col("event_id") < 20000)
    vals = events.select(
        F.when(F.col("event_id") % 10 < 3,
               F.concat(F.lit("hot_"),
                        (F.col("event_id") % 3).cast("string")))
        .otherwise(F.concat(F.lit("cold_"),
                            F.col("event_id").cast("string")))
        .alias("v"))
    return heavy_hitters(vals, "v", k=50)


_WS_K = 50
_WS_HEX = "0123456789abcdef"
# dyadic-rational place values 16^-1 .. 16^-8: exact in double on both
# engines (emitted as Python-repr literals, never computed via pow/exp)
_WS_PLACES = [16 ** -(i + 1) for i in range(8)]


def _sql_ws_u(id_expr: str) -> str:
    terms = [
        f"(strpos('{_WS_HEX}', substr(md5(CAST({id_expr} AS VARCHAR)), "
        f"{i + 1}, 1)) - 1) * {place!r}"
        for i, place in enumerate(_WS_PLACES)]
    return "(" + " + ".join(terms) + ")"


@query(
    "documents_weighted_sample",
    survey="north-star curation (weighted sampling without replacement: "
           "Efraimidis-Spirakis A-Res keys u^(1/w) with DETERMINISTIC "
           "md5-derived uniforms — quality-proportional corpus sampling "
           "that is reproducible and oracle-checkable)",
    oracle=f"""
    SELECT doc_id, {_SQL_QUALITY} AS weight,
           ROUND(pow({_sql_ws_u('doc_id')}, 1.0 / {_SQL_QUALITY}), 6)
             AS es_key
    FROM documents
    ORDER BY es_key DESC, doc_id ASC LIMIT {_WS_K}
    """,
)
def documents_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k by key = u^(1/w) is an exact weighted sample without
    replacement (Efraimidis & Spirakis 2006, public method); u comes from
    the first 8 hex digits of md5(doc_id) — exactly uniform on the 16^-8
    lattice and identical on both engines (digit value via position in the
    hex alphabet; place values are dyadic-rational literals, never
    pow/exp). One scan + a TakeOrderedAndProject: the sampler is a
    projection, not a shuffle. Weight = the quality score, so curation
    keeps high-quality docs with proportionally higher probability."""
    from server2_vector_search_server_spark.operators import (
        text_analysis as ta,
    )

    docs = tbl(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    u = None
    for i, place in enumerate(_WS_PLACES):
        term = ((F.instr(F.lit(_WS_HEX), F.substring(h, i + 1, 1)) - 1)
                .cast("double") * place)
        u = term if u is None else u + term
    w = ta.quality_score(F.col("text"))
    key = F.round(F.pow(u, F.lit(1.0) / w), 6)
    return (docs.select("doc_id", w.alias("weight"), key.alias("es_key"))
            .orderBy(F.col("es_key").desc(), F.col("doc_id").asc())
            .limit(_WS_K))


# ---------------------------------------------------------------------------
# Neyman (optimal) stratified-sample allocation

_NEY_BUDGET = 100


@query(
    "documents_neyman_allocation",
    survey="sampling extension(Neyman-optimal stratified allocation: "
           "per-stratum sample sizes proportional to N_h*sigma_h from "
           "exact moment sums — the design step BEFORE "
           "stratified_sample_documents draws)",
    oracle=f"""
    WITH m AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(n_chars) AS BIGINT) AS s1,
             CAST(SUM(n_chars * n_chars) AS BIGINT) AS s2
      FROM documents GROUP BY source),
    sd AS (
      SELECT source, n,
             ROUND(sqrt((CAST(s2 AS DOUBLE)
                         - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                           / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)), 6)
               AS sigma
      FROM m),
    wt AS (
      SELECT source, n, sigma,
             CAST(ROUND(n * sigma * 1000000) AS BIGINT) AS w_micro
      FROM sd),
    tot AS (SELECT SUM(w_micro) AS wt FROM wt)
    SELECT source, n AS n_rows, sigma,
           CAST(ROUND({_NEY_BUDGET}.0 * w_micro / tot.wt) AS BIGINT)
             AS alloc,
           ROUND(CAST(w_micro AS DOUBLE) / CAST(tot.wt AS DOUBLE), 6)
             AS share
    FROM wt, tot ORDER BY source
    """,
)
def documents_neyman_allocation(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Neyman-optimal allocation (Neyman 1934): given a total sample
    budget, allocate to each stratum proportionally to N_h * sigma_h —
    minimizing the variance of the stratified mean estimator. The design
    companion to stratified_sample_documents (which draws with GIVEN
    fractions).

    Scale shape: one partial-aggregable groupBy computes exact integer
    moment sums per stratum; sigma derives from those sums with identical
    op order on both engines, then rounds — and the cross-stratum
    normalizer folds MICRO-UNIT integers (a raw SUM of sigma doubles is
    summation-order-dependent; the rounded-int detour is what makes a
    5-row sum reproducible too)."""
    docs = tbl(spark, sf_dir, "documents")
    m = (docs.groupBy("source")
         .agg(F.count(F.lit(1)).cast("long").alias("n"),
              F.sum("n_chars").cast("long").alias("s1"),
              F.sum(F.col("n_chars") * F.col("n_chars")).cast("long")
              .alias("s2")))
    sigma = F.round(F.sqrt(
        (F.col("s2").cast("double")
         - F.col("s1").cast("double") * F.col("s1").cast("double")
         / F.col("n").cast("double")) / F.col("n").cast("double")), 6)
    wt = m.select("source", "n", sigma.alias("sigma")).withColumn(
        "w_micro", F.round(F.col("n") * F.col("sigma") * 1_000_000)
        .cast("long"))
    tot = wt.agg(F.sum("w_micro").alias("wt_tot"))
    return (wt.join(F.broadcast(tot))
            .select("source", F.col("n").alias("n_rows"), "sigma",
                    F.round(F.lit(float(_NEY_BUDGET)) * F.col("w_micro")
                            / F.col("wt_tot")).cast("long").alias("alloc"),
                    F.round(F.col("w_micro").cast("double")
                            / F.col("wt_tot").cast("double"), 6)
                    .alias("share"))
            .orderBy("source"))
