"""End-to-end corpus curation: the composed training-data pipeline.

The individual north-star stages (language-ID, quality scoring, exact dedup,
deterministic sampling) each have their own oracle-checked query; these two
queries prove they COMPOSE — the shape a real pretraining-data pipeline runs:

    raw corpus → language filter → quality filter → dedup (keep canonical)
               → deterministic sample → curated corpus

A planted exact-duplicate copy of every document (doc_id + 1_000_000) makes
the dedup stage observable: every copy must fall to its lower-id canonical.

Oracle SQL is assembled from the SAME fragments as the per-stage queries
(`text_queries._SQL_PRED_LANG`, `_SQL_QUALITY`) — one source of truth for
the thresholds on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from server2_vector_search_server_spark.operators import text_analysis as ta
from server2_vector_search_server_spark.plans.registry import query, tbl
from server2_vector_search_server_spark.plans.text_queries import (
    _SQL_PRED_LANG,
    _SQL_QUALITY,
)

_QUALITY_MIN = 0.9

_SQL_CORPUS = """
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text FROM documents
"""

# Stage flags as one CTE chain: scored (per-row expressions) -> canon (adds
# the window) — mirrors the Spark plan one-to-one.
_SQL_STAGED = f"""
    WITH corpus AS ({_SQL_CORPUS}),
    scored AS (
      SELECT doc_id, text,
             {_SQL_PRED_LANG} AS predicted_lang,
             {_SQL_QUALITY} AS quality
      FROM corpus),
    canon AS (
      SELECT *,
             (doc_id = MIN(CASE WHEN predicted_lang <> 'und'
                                 AND quality >= {_QUALITY_MIN}
                                THEN doc_id END)
                       OVER (PARTITION BY md5(text))) AS is_canonical,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
               IN ('0','1','2','3','4','5','6','7') AS sampled
      FROM scored)
"""


@query(
    "curate_corpus",
    survey="north-star pipeline composition (language filter -> quality "
           "filter -> exact dedup -> deterministic sample)",
    oracle=f"""
    {_SQL_STAGED}
    SELECT doc_id, predicted_lang, quality
    FROM canon
    WHERE predicted_lang <> 'und' AND quality >= {_QUALITY_MIN}
      AND is_canonical AND sampled
    ORDER BY doc_id
    """,
)
def curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curated corpus itself: survivors of language-ID ∧ quality ≥ 0.9
    ∧ canonical-of-its-content-hash ∧ md5(doc_id) half-sample. One scan of
    the (doubled) corpus; the ONLY shuffle is the content-hash window for
    canonicality — language, quality, and the sample predicate are per-row
    expressions that ride the scan, and at 100 TB they filter BEFORE the
    dedup shuffle moves data (the window's MIN is conditional on the earlier
    stages, so stage order is preserved without a second pass). Planted
    +1e6-id copies all lose canonicality to their originals, proving the
    dedup stage fires."""
    docs = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.select((F.col("doc_id") + 1000000).alias("doc_id"), "text"))
    scored = corpus.select(
        "doc_id", "text",
        ta.detect_language(F.col("text")).alias("predicted_lang"),
        ta.quality_score(F.col("text")).alias("quality"))
    passes = ((F.col("predicted_lang") != "und")
              & (F.col("quality") >= _QUALITY_MIN))
    w = Window.partitionBy(F.md5("text"))
    canon = scored.withColumn(
        "is_canonical",
        F.col("doc_id") == F.min(F.when(passes, F.col("doc_id"))).over(w))
    sampled = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin(
        "0", "1", "2", "3", "4", "5", "6", "7")
    return (
        canon.filter(passes & F.col("is_canonical") & sampled)
        .select("doc_id", "predicted_lang", "quality")
        .orderBy("doc_id")
    )


@query(
    "curation_funnel",
    survey="north-star pipeline composition (per-stage survivor funnel in "
           "ONE scan)",
    oracle=f"""
    {_SQL_STAGED},
    agg AS (
      SELECT COUNT(*) AS n_input,
             CAST(SUM(CASE WHEN predicted_lang <> 'und' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_lang,
             CAST(SUM(CASE WHEN predicted_lang <> 'und'
                       AND quality >= {_QUALITY_MIN} THEN 1 ELSE 0 END)
               AS BIGINT) AS n_quality,
             CAST(SUM(CASE WHEN predicted_lang <> 'und'
                       AND quality >= {_QUALITY_MIN}
                       AND is_canonical THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dedup,
             CAST(SUM(CASE WHEN predicted_lang <> 'und'
                       AND quality >= {_QUALITY_MIN}
                       AND is_canonical AND sampled THEN 1 ELSE 0 END)
               AS BIGINT) AS n_sample
      FROM canon)
    SELECT stage_no, stage, n_docs FROM (
      SELECT 1 AS stage_no, 'input' AS stage, n_input AS n_docs FROM agg
      UNION ALL SELECT 2, 'language', n_lang FROM agg
      UNION ALL SELECT 3, 'quality', n_quality FROM agg
      UNION ALL SELECT 4, 'dedup', n_dedup FROM agg
      UNION ALL SELECT 5, 'sample', n_sample FROM agg)
    ORDER BY stage_no
    """,
)
def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation yield report — how many documents survive each stage —
    computed in ONE scan: every stage predicate becomes a flag column, the
    cumulative conjunctions become conditional SUMs in a single aggregate,
    and the 5-stage funnel is an unpivot of that one row. The alternative
    (re-running the pipeline prefix per stage) scans the corpus 5× — this
    shape is how you audit a 100 TB curation run for the cost of one pass
    plus the dedup window's shuffle."""
    docs = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.select((F.col("doc_id") + 1000000).alias("doc_id"), "text"))
    scored = corpus.select(
        "doc_id", "text",
        ta.detect_language(F.col("text")).alias("predicted_lang"),
        ta.quality_score(F.col("text")).alias("quality"))
    lang_ok = F.col("predicted_lang") != "und"
    qual_ok = lang_ok & (F.col("quality") >= _QUALITY_MIN)
    w = Window.partitionBy(F.md5("text"))
    canon = scored.withColumn(
        "is_canonical",
        F.col("doc_id") == F.min(F.when(qual_ok, F.col("doc_id"))).over(w))
    dedup_ok = qual_ok & F.col("is_canonical")
    sample_ok = dedup_ok & F.substring(
        F.md5(F.col("doc_id").cast("string")), 1, 1).isin(
        "0", "1", "2", "3", "4", "5", "6", "7")
    agg = canon.agg(
        F.count(F.lit(1)).alias("n_input"),
        F.sum(lang_ok.cast("long")).alias("n_lang"),
        F.sum(qual_ok.cast("long")).alias("n_quality"),
        F.sum(dedup_ok.cast("long")).alias("n_dedup"),
        F.sum(sample_ok.cast("long")).alias("n_sample"))
    return (
        agg.select(F.expr(
            "stack(5, 1, 'input', n_input, 2, 'language', n_lang, "
            "3, 'quality', n_quality, 4, 'dedup', n_dedup, "
            "5, 'sample', n_sample) AS (stage_no, stage, n_docs)"))
        .orderBy("stage_no")
    )


@query(
    "curation_temperature_mixing",
    survey="north-star curation (temperature-based source mixing: "
           "p(source) ∝ n^alpha, realized as a value-deterministic "
           "hash subsample per source)",
    oracle="""
    -- alpha=0.5 temperature weights over per-language corpus sizes, target
    -- budget 200 docs, realized by an md5-prefix threshold per language
    WITH counts AS (
      SELECT lang, COUNT(*) AS n_l FROM documents GROUP BY lang),
    w AS (
      SELECT lang, n_l, sqrt(CAST(n_l AS DOUBLE)) AS wt,
             SUM(sqrt(CAST(n_l AS DOUBLE))) OVER () AS wsum
      FROM counts),
    r AS (
      SELECT lang, n_l,
             ROUND(LEAST(1.0, 200.0 * wt / wsum / n_l), 6) AS sample_rate
      FROM w),
    c AS (
      SELECT lang, n_l, sample_rate,
             CASE WHEN sample_rate >= 1.0 THEN 'g'
                  ELSE lower(lpad(hex(CAST(floor(sample_rate * 65536)
                                           AS BIGINT)), 4, '0')) END AS cut
      FROM r)
    SELECT c.lang,
           CAST(c.n_l AS BIGINT) AS n_source_docs,
           c.sample_rate,
           CAST(COUNT(d.doc_id) AS BIGINT) AS n_selected
    FROM c LEFT JOIN documents d
      ON d.lang = c.lang
     AND substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) < c.cut
    GROUP BY c.lang, c.n_l, c.sample_rate
    ORDER BY c.lang
    """,
)
def curation_temperature_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature sampling across sources (the Gopher/LLaMA pretraining-mix
    recipe — public: Rae et al. 2021 §A1.3, Touvron et al. 2023 §2):
    source weight ∝ n^alpha (alpha=0.5) flattens the size distribution, the
    per-source rate spreads a 200-doc budget, and membership is decided by
    an md5(doc_id) prefix against the rate cutoff — value-deterministic, so
    the same docs are picked at any parallelism and the pick REPLICATES in
    SQL (same discipline as hash_sample_documents). Rates >= 1 short-circuit
    to keep-all ('g' outsorts every hex digit; lpad would otherwise
    TRUNCATE the 5-hex 65536 to a wrong 4-hex cutoff). Shape: one tiny
    per-source aggregate broadcast back onto the scan filter — no shuffle
    touches the corpus itself."""
    docs = tbl(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l"))
    w = (counts
         .withColumn("wt", F.sqrt(F.col("n_l").cast("double")))
         .withColumn("wsum", F.sum("wt").over(
             Window.partitionBy(F.lit(1))))
         .withColumn("sample_rate", F.round(
             F.least(F.lit(1.0),
                     F.lit(200.0) * F.col("wt") / F.col("wsum")
                     / F.col("n_l")), 6))
         .withColumn("cut", F.when(
             F.col("sample_rate") >= 1.0, F.lit("g"))
             .otherwise(F.lower(F.lpad(F.hex(
                 F.floor(F.col("sample_rate") * 65536).cast("long")),
                 4, "0")))))
    picked = (docs.join(F.broadcast(w), "lang")
              .filter(F.substring(F.md5(F.col("doc_id").cast("string")),
                                  1, 4) < F.col("cut")))
    sel = (picked.groupBy("lang")
           .agg(F.count(F.lit(1)).cast("long").alias("n_selected")))
    return (w.select("lang", F.col("n_l").cast("long")
                     .alias("n_source_docs"), "sample_rate")
            .join(sel, "lang", "left")
            .select("lang", "n_source_docs", "sample_rate",
                    F.coalesce("n_selected", F.lit(0)).cast("long")
                    .alias("n_selected"))
            .orderBy("lang"))


@query(
    "documents_pareto_skyline",
    survey="north-star curation (skyline / Pareto-frontier selection: docs "
           "not dominated on (quality, length) — the multi-criteria keep "
           "set a curation pipeline retains when no single score wins)",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, {_SQL_QUALITY} AS quality, n_chars FROM documents)
    SELECT a.doc_id, a.quality, a.n_chars
    FROM scored a
    WHERE NOT EXISTS (
      SELECT 1 FROM scored b
      WHERE b.quality >= a.quality AND b.n_chars >= a.n_chars
        AND (b.quality > a.quality OR b.n_chars > a.n_chars))
    ORDER BY a.quality DESC, a.n_chars DESC, a.doc_id
    """,
)
def documents_pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (maximal-vector) query without the quadratic NOT-EXISTS the
    oracle uses: aggregate to per-quality-level maxima first (one shuffle,
    ≤ |distinct quality| rows), then a running-max sweep over the level
    table decides which levels survive — a level is on the frontier iff its
    max length strictly exceeds every higher-quality level's. Docs rejoin
    the surviving (quality, n_max) pairs by broadcast. The window runs on
    the LEVEL table (bounded: quality is a rounded score, ≤10^d levels at
    any corpus size), never on the corpus — the standard sort-based skyline
    decomposition (Börzsönyi et al., ICDE'01).
    """
    docs = tbl(spark, sf_dir, "documents").select(
        "doc_id",
        ta.quality_score(F.col("text")).alias("quality"),
        "n_chars")
    lvl = docs.groupBy("quality").agg(F.max("n_chars").alias("n_max"))
    w = (Window.orderBy(F.col("quality").desc())
         .rowsBetween(Window.unboundedPreceding, -1))
    sky_lvl = (lvl.withColumn("prev_max", F.max("n_max").over(w))
               .filter(F.col("prev_max").isNull()
                       | (F.col("n_max") > F.col("prev_max")))
               # rename: sky_lvl shares lineage with docs (self-join) —
               # same-name join columns would resolve trivially-true
               .select(F.col("quality").alias("_q_lvl"),
                       F.col("n_max").alias("_n_lvl")))
    return (docs.join(F.broadcast(sky_lvl),
                      (F.col("quality") == F.col("_q_lvl"))
                      & (F.col("n_chars") == F.col("_n_lvl")))
            .select("doc_id", "quality", "n_chars")
            .orderBy(F.col("quality").desc(), F.col("n_chars").desc(),
                     "doc_id"))


@query(
    "text_dsir_importance",
    survey="north-star curation (DSIR importance weights: hashed-unigram "
           "log-likelihood ratio of target vs source distribution, "
           "Xie et al. 2023 — the data-selection scorer)",
    oracle="""
    WITH toks AS (
      SELECT doc_id, (lang = 'en') AS is_target, lower(t.term) AS tok
      FROM documents, UNNEST(list_filter(
             string_split_regex(trim(text), '\\s+'), x -> x <> ''))
           AS t(term)),
    b AS (
      SELECT doc_id, is_target,
             ((strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16
              + strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1)
               % 64 AS bucket
      FROM toks),
    counts AS (
      SELECT bucket, COUNT(*) AS cs,
             SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS ct
      FROM b GROUP BY bucket),
    tot AS (SELECT SUM(cs) AS ns, SUM(ct) AS nt FROM counts),
    weights AS (
      SELECT bucket,
             CAST(ROUND(ROUND(ln(ct + 1.0) - ln(nt + 64.0)
                              - ln(cs + 1.0) + ln(ns + 64.0), 6)
                        * 1000000) AS BIGINT) AS w_micro
      FROM counts, tot)
    SELECT b.doc_id, COUNT(*) AS n_tokens,
           ROUND(SUM(w.w_micro) / 1000000.0, 6) AS importance
    FROM b JOIN weights w USING (bucket)
    GROUP BY b.doc_id
    ORDER BY b.doc_id
    """,
)
def text_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data-selection scoring (operators/text_analysis.dsir_importance):
    target = English docs, source = whole corpus. Two token-stream scans +
    a 64-row broadcast; per-doc sums fold integer micro-units so the result
    is shuffle-order independent (registry parity rules)."""
    docs = tbl(spark, sf_dir, "documents")
    return (ta.dsir_importance(docs, F.col("lang") == "en")
            .orderBy("doc_id"))


_SHUF_SHARDS = 8


@query(
    "corpus_shuffle_shards",
    survey="north-star curation (deterministic global shuffle + sharding "
           "for training order: md5-keyed permutation, hash-assigned "
           "shards, within-shard positions — the export step after "
           "curate/dedup/pack)",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS shuffle_key,
             ((strpos('0123456789abcdef',
                      substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
              + strpos('0123456789abcdef',
                       substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
               % {_SHUF_SHARDS} AS shard
      FROM documents)
    SELECT doc_id, CAST(shard AS INTEGER) AS shard,
           CAST(row_number() OVER (PARTITION BY shard
                                   ORDER BY shuffle_key, doc_id) AS BIGINT)
             AS pos_in_shard
    FROM keyed
    ORDER BY shard, pos_in_shard
    """,
)
def corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-order export: a reproducible global shuffle is a SORT BY A
    KEYED HASH, not an RNG — md5(doc_id) gives every doc a pseudorandom
    but stable position, the shard is a hash bucket (md5_bucket — the
    portable arithmetic), and within-shard order is the hash order. At
    100 TB this is one hash-partitioned exchange on shard + a within-shard
    sort (each shard sorts independently — no global single-reducer sort),
    then a partitioned write; epochs and resumable readers get the same
    order every time. The window here is per-shard, bounded by shard size
    by construction."""
    from pyspark.sql import Window

    from server2_vector_search_server_spark.operators import (
        text_analysis as ta,
    )

    docs = tbl(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("shuffle_key"),
        ta.md5_bucket(F.col("doc_id").cast("string"),
                      _SHUF_SHARDS).alias("shard"))
    w = (Window.partitionBy("shard")
         .orderBy(F.col("shuffle_key").asc(), F.col("doc_id").asc()))
    return (keyed.select("doc_id", "shard",
                         F.row_number().over(w).cast("long")
                         .alias("pos_in_shard"))
            .orderBy("shard", "pos_in_shard"))


@query(
    "documents_source_drift_chi2",
    survey="north-star curation (ingest monitoring: per-source language-"
           "distribution drift vs the corpus baseline as a chi-square "
           "statistic — the per-feed alarm a production pipeline runs "
           "before a bad source pollutes training data)",
    oracle="""
    WITH per AS (
      SELECT source, lang, COUNT(*) AS n
      FROM documents GROUP BY source, lang),
    src_tot AS (SELECT source, SUM(n) AS ns FROM per GROUP BY source),
    langs AS (
      SELECT lang, SUM(n) AS nl FROM per GROUP BY lang),
    tot AS (SELECT SUM(n) AS nt FROM per),
    expected AS (
      SELECT s.source, g.lang,
             s.ns * (g.nl * 1.0 / t.nt) AS e
      FROM src_tot s CROSS JOIN langs g CROSS JOIN tot t),
    joined AS (
      SELECT ex.source, ex.lang, COALESCE(p.n, 0) AS o, ex.e
      FROM expected ex LEFT JOIN per p
        ON p.source = ex.source AND p.lang = ex.lang)
    SELECT source,
           CAST(SUM(CAST(ROUND(ROUND((o - e) * (o - e) / e, 6) * 1000000)
                         AS BIGINT)) AS BIGINT) AS chi2_micro,
           CAST(COUNT(*) - 1 AS INTEGER) AS dof
    FROM joined GROUP BY source ORDER BY source
    """,
)
def documents_source_drift_chi2(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Pearson chi-square of each source's language mix against the corpus
    baseline, computed from ONE (source, lang) contingency aggregate —
    counts shuffle once, everything downstream is arithmetic over a table
    of |sources|×|langs| rows (broadcast-sized at any corpus scale; the
    corpus itself is touched exactly once). Per-cell terms are rounded
    then scaled to integer micro-units before the per-source SUM so the
    statistic is shuffle-order exact. A monitoring job thresholds
    chi2/dof per feed to quarantine drifting sources."""
    docs = tbl(spark, sf_dir, "documents")
    per = (docs.groupBy("source", "lang")
           .agg(F.count(F.lit(1)).alias("n"))
           .localCheckpoint(eager=True))
    src_tot = per.groupBy("source").agg(F.sum("n").alias("ns"))
    glob = per.groupBy("lang").agg(F.sum("n").alias("nl"))
    nt = per.agg(F.sum("n")).collect()[0][0]
    expected = (src_tot.crossJoin(glob)
                .select("source", "lang",
                        (F.col("ns") * (F.col("nl") * 1.0
                                        / F.lit(float(nt)))).alias("e")))
    joined = (expected.join(per, ["source", "lang"], "left")
              .select("source",
                      F.coalesce(F.col("n"), F.lit(0)).alias("o"),
                      "e"))
    term = F.round((F.col("o") - F.col("e")) * (F.col("o") - F.col("e"))
                   / F.col("e"), 6)
    return (joined.groupBy("source")
            .agg(F.sum(F.round(term * 1_000_000).cast("long"))
                 .cast("long").alias("chi2_micro"),
                 (F.count(F.lit(1)) - 1).cast("int").alias("dof"))
            .orderBy("source"))



@query(
    "documents_source_drift_psi",
    survey="north-star curation (ingest monitoring: population stability "
           "index of each source's language mix vs the corpus baseline — "
           "the industry-standard drift score next to the chi-square "
           "alarm; exact nano-unit fold, zero-cells reported not fudged)",
    oracle="""
    WITH per AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY source, lang),
    src_tot AS (SELECT source, CAST(SUM(n) AS BIGINT) AS ns
                FROM per GROUP BY source),
    langs AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS nl
              FROM per GROUP BY lang),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM per),
    cells AS (
      SELECT s.source, g.lang, COALESCE(p.n, 0) AS o, s.ns, g.nl, t.nt
      FROM src_tot s CROSS JOIN langs g CROSS JOIN tot t
      LEFT JOIN per p ON p.source = s.source AND p.lang = g.lang),
    contrib AS (
      SELECT source,
             CASE WHEN o > 0 THEN
               CAST(ROUND(ROUND(
                 (CAST(o AS DOUBLE) / ns - CAST(nl AS DOUBLE) / nt)
                 * ROUND(ln((CAST(o AS DOUBLE) / ns)
                            / (CAST(nl AS DOUBLE) / nt)), 9),
                 9) * 1000000000) AS BIGINT)
             END AS c
      FROM cells)
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS psi_nano,
           ROUND(CAST(SUM(c) AS DOUBLE) / 1000000000.0, 6) AS psi,
           CAST(SUM(CASE WHEN c IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_cells,
           CAST(SUM(CASE WHEN c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_zero_cells
    FROM contrib GROUP BY source ORDER BY source
    """,
)
def documents_source_drift_psi(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Population Stability Index per source: PSI = sum over language
    cells of (p - q) * ln(p/q), p = the source's share, q = the corpus
    baseline share — the monitoring industry's standard drift score
    (>0.25 conventionally = action), complementing the chi-square above
    with a magnitude that is comparable across sources of different
    sizes. Cells the source has never emitted (o = 0) are REPORTED as
    ``n_zero_cells`` and excluded rather than epsilon-fudged — the
    epsilon choice changes PSI materially and silently, so surfacing the
    exclusion is the honest contract. Same scale shape as the chi-square:
    one (source, lang) contingency shuffle, then arithmetic over a
    broadcast-sized cell table; each cell's contribution runs through
    the ln-then-round-9 nano-unit pattern so per-source sums fold
    shuffle-order exact."""
    docs = tbl(spark, sf_dir, "documents")
    per = (docs.groupBy("source", "lang")
           .agg(F.count(F.lit(1)).cast("long").alias("n"))
           .localCheckpoint(eager=True))
    src_tot = per.groupBy("source").agg(F.sum("n").cast("long").alias("ns"))
    langs = per.groupBy("lang").agg(F.sum("n").cast("long").alias("nl"))
    tot = per.agg(F.sum("n").cast("long").alias("nt"))
    cells = (src_tot.crossJoin(langs).crossJoin(F.broadcast(tot))
             .join(per, ["source", "lang"], "left")
             .select("source",
                     F.coalesce(F.col("n"), F.lit(0)).alias("o"),
                     "ns", "nl", "nt"))
    p_share = F.col("o").cast("double") / F.col("ns")
    q_share = F.col("nl").cast("double") / F.col("nt")
    c = F.when(
        F.col("o") > 0,
        F.round(F.round((p_share - q_share)
                        * F.round(F.log(p_share / q_share), 9), 9)
                * 1_000_000_000).cast("long"))
    contrib = cells.select("source", c.alias("c"))
    return (contrib.groupBy("source")
            .agg(F.sum("c").cast("long").alias("psi_nano"),
                 F.round(F.sum("c").cast("double") / 1_000_000_000.0, 6)
                 .alias("psi"),
                 F.sum(F.col("c").isNotNull().cast("int")).cast("long")
                 .alias("n_cells"),
                 F.sum(F.col("c").isNull().cast("int")).cast("long")
                 .alias("n_zero_cells"))
            .orderBy("source"))

# --- leakage-safe train/val split -------------------------------------------
#
# Near-duplicate documents that straddle a train/val split leak training
# content into evaluation (the benchmark-contamination failure mode applied
# to one's OWN held-out set). The guard: split by DUP-CLUSTER, not by doc —
# assign every connected component of the near-dup graph to one side.

_SPLIT_MOD = 3    # doc/cluster ≡ 0 (mod 3) → val

from server2_vector_search_server_spark.plans.dedup_queries import (  # noqa: E402,E501
    _SQL_COSINE as _SQL_NEARDUP_PAIRS,
)

_SQL_LEAKAGE = f"""
    WITH RECURSIVE pairs AS ({_SQL_NEARDUP_PAIRS}),
    nodes AS (SELECT id_a AS node FROM pairs UNION SELECT id_b FROM pairs),
    edges_bi AS (SELECT id_a AS a, id_b AS b FROM pairs
                 UNION SELECT id_b AS a, id_a AS b FROM pairs),
    reach AS (
      SELECT node, node AS lbl FROM nodes
      UNION
      SELECT e.a AS node, r.lbl FROM edges_bi e JOIN reach r ON e.b = r.node),
    comp AS (SELECT node, MIN(lbl) AS component FROM reach GROUP BY node),
    sizes AS (
      SELECT
        CAST(SUM(CASE WHEN node % {_SPLIT_MOD} = 0 THEN 1 ELSE 0 END)
          AS BIGINT) AS nv_naive,
        CAST(SUM(CASE WHEN node % {_SPLIT_MOD} = 0 THEN 0 ELSE 1 END)
          AS BIGINT) AS nt_naive,
        CAST(SUM(CASE WHEN component % {_SPLIT_MOD} = 0 THEN 1 ELSE 0 END)
          AS BIGINT) AS nv_safe,
        CAST(SUM(CASE WHEN component % {_SPLIT_MOD} = 0 THEN 0 ELSE 1 END)
          AS BIGINT) AS nt_safe
      FROM comp),
    nl AS (
      SELECT CAST(SUM(CASE WHEN (id_a % {_SPLIT_MOD} = 0)
                             <> (id_b % {_SPLIT_MOD} = 0)
                      THEN 1 ELSE 0 END) AS BIGINT) AS leak
      FROM pairs),
    sl AS (
      SELECT CAST(SUM(CASE WHEN (ca.component % {_SPLIT_MOD} = 0)
                             <> (cb.component % {_SPLIT_MOD} = 0)
                      THEN 1 ELSE 0 END) AS BIGINT) AS leak
      FROM pairs p
      JOIN comp ca ON ca.node = p.id_a
      JOIN comp cb ON cb.node = p.id_b)
    SELECT * FROM (
      SELECT 'naive' AS method, nt_naive AS n_train, nv_naive AS n_val,
             (SELECT leak FROM nl) AS leaked_pairs FROM sizes
      UNION ALL
      SELECT 'cluster', nt_safe, nv_safe, (SELECT leak FROM sl) FROM sizes)
    ORDER BY method
"""




@query(
    "corpus_leakage_safe_split",
    survey="north-star pipeline composition (cluster-granular train/val "
           "split: near-dup components never straddle the split; the "
           "naive per-doc split's leaked-pair count is the counterfactual)",
    oracle=_SQL_LEAKAGE,
)
def corpus_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two split strategies over the planted near-dup corpus, one row each:
    ``naive`` assigns docs by ``doc_id % 3``, ``cluster`` assigns whole
    near-dup components by ``component % 3`` (component = min member id,
    from the same iterative min-label propagation the dedup family uses).
    ``leaked_pairs`` counts near-dup pairs with endpoints on opposite
    sides — 0 by construction for the cluster split, ~2/3 of all pairs for
    the naive one (the planted copy sits at id + 20000 ≡ id + 2 mod 3).

    Scale shape: components come from the shared iterative operator
    (shuffle ∝ edges per round); the split itself is pure arithmetic on
    the component id — no extra shuffle beyond the two pair⋈component
    joins, both broadcast-sized per cluster at any corpus scale."""
    from server2_vector_search_server_spark.operators import graph
    from server2_vector_search_server_spark.plans.dedup_queries import (
        _cosine_pairs,
    )

    pairs = (_cosine_pairs(spark, sf_dir).select("id_a", "id_b")
             .localCheckpoint(eager=True))
    comps = graph.connected_components(pairs, "id_a", "id_b")

    def _val(col):
        return (col % _SPLIT_MOD == 0).cast("long")

    sizes = comps.agg(
        F.sum(_val(F.col("node"))).alias("nv_naive"),
        F.sum(1 - _val(F.col("node"))).alias("nt_naive"),
        F.sum(_val(F.col("component"))).alias("nv_safe"),
        F.sum(1 - _val(F.col("component"))).alias("nt_safe"))
    naive_leak = pairs.agg(F.sum(
        (_val(F.col("id_a")) != _val(F.col("id_b"))).cast("long"))
        .alias("leak"))
    ca = comps.select(F.col("node").alias("id_a"),
                      F.col("component").alias("comp_a"))
    cb = comps.select(F.col("node").alias("id_b"),
                      F.col("component").alias("comp_b"))
    safe_leak = (pairs.join(ca, "id_a").join(cb, "id_b")
                 .agg(F.sum((_val(F.col("comp_a"))
                             != _val(F.col("comp_b"))).cast("long"))
                      .alias("leak")))
    row_naive = sizes.crossJoin(naive_leak).select(
        F.lit("naive").alias("method"),
        F.col("nt_naive").cast("long").alias("n_train"),
        F.col("nv_naive").cast("long").alias("n_val"),
        F.col("leak").cast("long").alias("leaked_pairs"))
    row_safe = sizes.crossJoin(safe_leak).select(
        F.lit("cluster").alias("method"),
        F.col("nt_safe").cast("long").alias("n_train"),
        F.col("nv_safe").cast("long").alias("n_val"),
        F.col("leak").cast("long").alias("leaked_pairs"))
    return row_naive.unionByName(row_safe).orderBy("method")

# ---------------------------------------------------------------------------
# k-anonymity screen over quasi-identifiers

_KANON_K = 5

_SQL_K_ANONYMITY = f"""
    WITH cells AS (
      SELECT lang, source,
             CAST(floor(n_chars / 200.0) AS BIGINT) AS len_bucket,
             COUNT(*) AS n_docs
      FROM documents GROUP BY lang, source, len_bucket)
    SELECT lang, source, len_bucket, CAST(n_docs AS BIGINT) AS n_docs
    FROM cells
    WHERE n_docs < {_KANON_K}
    ORDER BY lang, source, len_bucket
"""


@query(
    "documents_k_anonymity_screen",
    survey="north-star curation governance (k-anonymity over "
           "quasi-identifier cells: any (lang, source, size-bucket) "
           "combination matching fewer than k documents is a "
           "re-identification risk to suppress or generalize before "
           "release)",
    oracle=_SQL_K_ANONYMITY,
)
def documents_k_anonymity_screen(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """The release-gate screen run before publishing a corpus slice:
    group by the quasi-identifier tuple, keep cells with fewer than k
    members — those rows are suppressed or their identifiers generalized
    (widen the length bucket, drop `source`) until every cell clears k.
    One hash-partitioned aggregate; at 100 TB the QI cardinality (not the
    corpus) bounds the reduce side, and the same rollup feeds the
    generalization loop (re-aggregate on the coarsened tuple — each pass
    is the identical plan on a shrinking cell table)."""
    docs = tbl(spark, sf_dir, "documents")
    cells = (docs.groupBy(
        "lang", "source",
        F.floor(F.col("n_chars") / F.lit(200.0)).cast("long")
        .alias("len_bucket"))
        .agg(F.count(F.lit(1)).alias("n_docs")))
    return (cells.filter(F.col("n_docs") < _KANON_K)
            .select("lang", "source", "len_bucket",
                    F.col("n_docs").cast("long").alias("n_docs"))
            .orderBy("lang", "source", "len_bucket"))


# ---------------------------------------------------------------------------
# DoReMi-style domain reweighting step

_DRM_ETA = 1.0


@query(
    "curation_doremi_reweight",
    survey="north-star curation (DoReMi domain-weight update, Xie et al. "
           "2023: one multiplicative-weights step on source-domain "
           "mixture weights driven by per-domain excess loss — the "
           "data-mixture optimizer next to temperature mixing)",
    oracle=f"""
    WITH scored AS (
      SELECT source,
             CAST(ROUND(ROUND(1.0 - ({_SQL_QUALITY}), 6) * 1000000)
                  AS BIGINT) AS loss_micro
      FROM documents),
    dom AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(loss_micro) AS BIGINT) AS s_micro
      FROM scored GROUP BY source),
    gtot AS (
      SELECT SUM(n_docs) AS n_tot, SUM(s_micro) AS s_tot,
             COUNT(*) AS k FROM dom),
    upd AS (
      SELECT source, n_docs,
             ROUND(s_micro / 1000000.0 / n_docs, 6) AS domain_loss,
             ROUND(s_micro / 1000000.0 / n_docs
                   - s_tot / 1000000.0 / n_tot, 6) AS excess_loss,
             CAST(ROUND(ROUND(exp({_DRM_ETA}
                     * (s_micro / 1000000.0 / n_docs
                        - s_tot / 1000000.0 / n_tot)), 9) * 1000000
                     / k) AS BIGINT) AS w_micro
      FROM dom, gtot),
    norm AS (SELECT SUM(w_micro) AS w_tot FROM upd)
    SELECT source, n_docs, domain_loss, excess_loss,
           ROUND(CAST(w_micro AS DOUBLE) / CAST(norm.w_tot AS DOUBLE), 6)
             AS new_weight
    FROM upd, norm ORDER BY source
    """,
)
def curation_doremi_reweight(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """One DoReMi mirror-descent step on the source-domain mixture: start
    from uniform weights, multiply each domain by exp(eta * excess loss)
    (domain loss minus corpus loss — the quality heuristic stands in for
    the proxy-model loss signal, as in the distilled-classifier query),
    renormalize. Domains the proxy finds HARD gain weight — the published
    recipe for choosing pre-training mixtures.

    Scale shape: per-domain losses fold as exact micro-unit sums in one
    groupBy (domain-bounded reduce side); the update is arithmetic on the
    bounded domain table, with exp round-guarded and normalization over
    micro-unit integers (the Neyman-allocation discipline)."""
    from server2_vector_search_server_spark.operators.text_analysis import (
        quality_score,
    )

    docs = tbl(spark, sf_dir, "documents")
    loss_micro = (F.round(F.round(1.0 - quality_score(F.col("text")), 6)
                          * 1_000_000).cast("long"))
    dom = (docs.select("source", loss_micro.alias("lm"))
           .groupBy("source")
           .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("lm").cast("long").alias("s_micro")))
    glob = dom.agg(F.sum("n_docs").alias("n_tot"),
                   F.sum("s_micro").alias("s_tot"),
                   F.count(F.lit(1)).alias("k"))
    excess = (F.col("s_micro") / 1_000_000.0 / F.col("n_docs")
              - F.col("s_tot") / 1_000_000.0 / F.col("n_tot"))
    upd = (dom.join(F.broadcast(glob))
           .select("source", "n_docs",
                   F.round(F.col("s_micro") / 1_000_000.0
                           / F.col("n_docs"), 6).alias("domain_loss"),
                   F.round(excess, 6).alias("excess_loss"),
                   F.round(F.round(F.exp(F.lit(_DRM_ETA) * excess), 9)
                           * 1_000_000 / F.col("k")).cast("long")
                   .alias("w_micro")))
    norm = upd.agg(F.sum("w_micro").alias("w_tot"))
    return (upd.join(F.broadcast(norm))
            .select("source", "n_docs", "domain_loss", "excess_loss",
                    F.round(F.col("w_micro").cast("double")
                            / F.col("w_tot").cast("double"), 6)
                    .alias("new_weight"))
            .orderBy("source"))


# ---------------------------------------------------------------------------
# l-diversity screen (companion to k-anonymity)

_LDIV_L = 3


@query(
    "documents_l_diversity_screen",
    survey="north-star curation governance (l-diversity over the "
           "k-anonymity cells: a QI cell whose SENSITIVE attribute shows "
           "fewer than l distinct values invites attribute disclosure "
           "even when it clears k — Machanavajjhala et al. 2007)",
    oracle=f"""
    SELECT lang, source,
           CAST(FLOOR(n_chars / 200.0) AS BIGINT) AS len_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT length(trim(text)) % 7) AS BIGINT)
             AS n_sensitive_values
    FROM documents
    GROUP BY lang, source, CAST(FLOOR(n_chars / 200.0) AS BIGINT)
    HAVING COUNT(DISTINCT length(trim(text)) % 7) < {_LDIV_L}
    ORDER BY lang, source, len_bucket
    """,
)
def documents_l_diversity_screen(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """l-diversity audit over the same quasi-identifier cells as the
    k-anonymity screen: a cell where the sensitive attribute (a derived
    7-way category stands in) takes fewer than l distinct values lets an
    attacker who locates a person in the cell INFER their attribute even
    without re-identifying the row — the classic homogeneity attack
    k-anonymity misses. One aggregate with a single COUNT(DISTINCT) per
    group (no Expand, ROUND_NOTES rule); cells clearing k but failing l
    get generalized by the same coarsening loop."""
    docs = tbl(spark, sf_dir, "documents")
    sens = (F.length(F.trim(F.col("text"))) % 7)
    cells = (docs.groupBy(
        "lang", "source",
        F.floor(F.col("n_chars") / F.lit(200.0)).cast("long")
        .alias("len_bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
             F.count_distinct(sens).cast("long")
             .alias("n_sensitive_values")))
    return (cells.filter(F.col("n_sensitive_values") < _LDIV_L)
            .orderBy("lang", "source", "len_bucket"))


# ---------------------------------------------------------------------------
# t-closeness screen (completes the k-anonymity / l-diversity triad)

_TCLOSE_T = 0.15
_TCLOSE_K = 7          # sensitive attribute domain size (ordered 0..6)


@query(
    "documents_t_closeness_screen",
    survey="north-star curation governance (t-closeness, Li et al. "
           "ICDE'07: ordinal EMD between each QI cell's sensitive "
           "distribution and the global one — the attribute-disclosure "
           "screen l-diversity misses when values are distinct but "
           "skewed; exact cross-multiplied integer cumulatives)",
    oracle=f"""
    WITH counts AS (
        SELECT lang, source,
               CAST(length(trim(text)) % {_TCLOSE_K} AS BIGINT) AS sens,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM documents GROUP BY 1, 2, 3
    ), cells AS (
        SELECT DISTINCT lang, source FROM counts
    ), spine AS (
        SELECT lang, source, CAST(v AS BIGINT) AS sens
        FROM cells CROSS JOIN UNNEST(range(0, {_TCLOSE_K})) AS t(v)
    ), dense AS (
        SELECT s.lang, s.source, s.sens, COALESCE(c.c, 0) AS c
        FROM spine s LEFT JOIN counts c
          ON c.lang = s.lang AND c.source = s.source AND c.sens = s.sens
    ), cum AS (
        SELECT lang, source, sens,
               CAST(SUM(c) OVER (PARTITION BY lang, source ORDER BY sens)
                    AS BIGINT) AS cum_g,
               CAST(SUM(c) OVER (PARTITION BY lang, source) AS BIGINT)
                    AS n_g
        FROM dense
    ), gcum AS (
        SELECT sens,
               CAST(SUM(SUM(c)) OVER (ORDER BY sens) AS BIGINT) AS cum_tot,
               CAST(SUM(SUM(c)) OVER () AS BIGINT) AS n_tot
        FROM dense GROUP BY sens
    ), terms AS (
        SELECT cum.lang, cum.source, cum.n_g, gcum.n_tot,
               ABS(CAST(cum.cum_g AS HUGEINT) * gcum.n_tot
                   - CAST(gcum.cum_tot AS HUGEINT) * cum.n_g) AS term
        FROM cum JOIN gcum ON cum.sens = gcum.sens
    )
    SELECT lang, source, CAST(n_g AS BIGINT) AS n_docs,
           ROUND(CAST(SUM(term) AS DOUBLE)
                 / (CAST(n_g AS DOUBLE) * n_tot * ({_TCLOSE_K} - 1)), 9)
               AS emd,
           (CAST(SUM(term) AS DOUBLE)
            / (CAST(n_g AS DOUBLE) * n_tot * ({_TCLOSE_K} - 1)))
               > {_TCLOSE_T} AS breach
    FROM terms GROUP BY lang, source, n_g, n_tot
    ORDER BY lang, source
    """,
)
def documents_t_closeness_screen(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """t-closeness over the (lang, source) quasi-identifier cells: the
    ordered-attribute earth-mover distance Σ|P_cum − Q_cum|/(k−1)
    between each cell's sensitive distribution (the l-diversity screen's
    derived 7-way category) and the corpus-wide one.  A cell can clear
    both k-anonymity AND l-diversity yet leak — every value present but
    one dominant — which is exactly what the EMD catches.  Cumulative
    differences are compared as cross-multiplied integers
    |cum_g·N − cum_G·n_g| (DECIMAL/HUGEINT: the product reaches n_g·N
    which is ~N² for a dominant cell — 1e20 at 1e10 docs, past BIGINT),
    divided once at the end.  Scale: one aggregate onto (QI × k) cells;
    the dense value spine is a bounded explode over the cell table, the
    global distribution broadcasts, and no window ever orders more than
    k rows per cell."""
    docs = tbl(spark, sf_dir, "documents")
    sens = (F.length(F.trim(F.col("text"))) % _TCLOSE_K).cast("long")
    counts = (docs.groupBy("lang", "source", sens.alias("sens"))
              .agg(F.count(F.lit(1)).cast("long").alias("c")))
    spine = (counts.select("lang", "source").distinct()
             .select("lang", "source",
                     F.explode(F.sequence(F.lit(0), F.lit(_TCLOSE_K - 1)))
                     .alias("sens_i"))
             .select("lang", "source",
                     F.col("sens_i").cast("long").alias("sens")))
    dense = (spine.join(counts, ["lang", "source", "sens"], "left")
             .select("lang", "source", "sens",
                     F.coalesce(F.col("c"), F.lit(0)).alias("c")))
    w_cum = (Window.partitionBy("lang", "source").orderBy("sens")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_cell = Window.partitionBy("lang", "source")
    cum = dense.select(
        "lang", "source", "sens",
        F.sum("c").over(w_cum).cast("long").alias("cum_g"),
        F.sum("c").over(w_cell).cast("long").alias("n_g"))
    gscan = (dense.groupBy("sens").agg(F.sum("c").alias("cs")))
    w_gcum = (Window.orderBy("sens")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    gcum = gscan.select(
        "sens",
        F.sum("cs").over(w_gcum).cast("long").alias("cum_tot"),
        F.sum("cs").over(Window.partitionBy()).cast("long").alias("n_tot"))
    term = F.abs(F.col("cum_g").cast("decimal(20,0)") * F.col("n_tot")
                 - F.col("cum_tot").cast("decimal(20,0)") * F.col("n_g"))
    joined = cum.join(F.broadcast(gcum), "sens")
    emd = (F.col("term").cast("double")
           / (F.col("n_g").cast("double") * F.col("n_tot")
              * (_TCLOSE_K - 1)))
    return (joined
            .select("lang", "source", "n_g", "n_tot", term.alias("term"))
            .groupBy("lang", "source", "n_g", "n_tot")
            .agg(F.sum("term").alias("term"))
            .select("lang", "source",
                    F.col("n_g").cast("long").alias("n_docs"),
                    F.round(emd, 9).alias("emd"),
                    (emd > _TCLOSE_T).alias("breach"))
            .orderBy("lang", "source"))
