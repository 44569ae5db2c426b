"""Text-analysis query surface (north-star LLM-pipeline operators): token
counting, language-ID heuristic, quality scoring, document fingerprinting.

Oracle SQL generated from the same stopword lists / thresholds / hash
constants as the Spark operators — one source of truth, two engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from server2_vector_search_server_spark.functions.text import (
    sql_token_hash,
    sql_token_windows,
    sql_word_shingles,
    tokens,
)
from server2_vector_search_server_spark.operators import text_analysis as ta
from server2_vector_search_server_spark.plans.registry import query, spread, tbl

_SQL_TOKS = "list_filter(string_split_regex(trim(text), '\\s+'), t -> t != '')"


def _sql_stop_hits(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in ta.STOPWORDS[lang])
    return f"len(list_filter({_SQL_TOKS}, t -> lower(t) IN ({words})))"


@query(
    "text_token_stats",
    survey="north-star text analysis (token counting)",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_SQL_TOKS}) AS INTEGER) AS n_tokens,
           CAST(len(list_distinct({_SQL_TOKS})) AS INTEGER) AS n_distinct,
           CAST(CAST(len({_SQL_TOKS}) AS BIGINT) +
            list_sum(list_prepend(CAST(0 AS BIGINT),
              list_transform({_SQL_TOKS},
                t -> CAST(floor(length(t) / 4) AS BIGINT))))
            AS BIGINT) AS bpe_estimate,
           ROUND(CASE WHEN len({_SQL_TOKS}) = 0 THEN 0.0
                 ELSE CAST(list_sum(list_prepend(CAST(0 AS BIGINT),
                        list_transform({_SQL_TOKS},
                          t -> CAST(length(t) AS BIGINT)))) AS DOUBLE)
                      / len({_SQL_TOKS}) END, 6) AS mean_word_len
    FROM documents WHERE doc_id < 200 ORDER BY doc_id
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return docs.select(
        "doc_id",
        ta.token_count(F.col("text")).alias("n_tokens"),
        F.size(F.array_distinct(
            F.filter(F.split(F.trim("text"), r"\s+"), lambda t: t != ""))
        ).alias("n_distinct"),
        ta.approx_bpe_token_count(F.col("text")).alias("bpe_estimate"),
        F.round(ta.mean_word_length(F.col("text")), 6).alias("mean_word_len"),
    ).orderBy("doc_id")


_SQL_PRED_LANG = f"""
    CASE WHEN greatest({_sql_stop_hits('de')}, {_sql_stop_hits('en')},
                       {_sql_stop_hits('es')}) = 0 THEN 'und'
         WHEN {_sql_stop_hits('de')} >= {_sql_stop_hits('en')}
          AND {_sql_stop_hits('de')} >= {_sql_stop_hits('es')} THEN 'de'
         WHEN {_sql_stop_hits('en')} >= {_sql_stop_hits('es')} THEN 'en'
         ELSE 'es' END
"""


@query(
    "text_language_id",
    survey="north-star text analysis (language-ID heuristic)",
    oracle=f"""
    SELECT {_SQL_PRED_LANG} AS predicted_lang,
           COUNT(*) AS n_docs, MIN(doc_id) AS min_doc_id
    FROM documents GROUP BY predicted_lang ORDER BY predicted_lang
    """,
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    return (
        docs.withColumn("predicted_lang", ta.detect_language(F.col("text")))
        .groupBy("predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.min("doc_id").alias("min_doc_id"))
        .orderBy("predicted_lang")
    )


_SQL_STOP_RATIO = f"""
    (CASE WHEN len({_SQL_TOKS}) = 0 THEN 0.0
     ELSE CAST({_sql_stop_hits('en')} AS DOUBLE) / len({_SQL_TOKS}) END)
"""

_SQL_PUNCT_RATIO = r"""
    (CASE WHEN length(text) = 0 THEN 0.0
     ELSE CAST(length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g'))
               AS DOUBLE) / length(text) END)
"""

_SQL_MWL = f"""
    (CASE WHEN len({_SQL_TOKS}) = 0 THEN 0.0
     ELSE CAST(list_sum(list_prepend(CAST(0 AS BIGINT),
            list_transform({_SQL_TOKS}, t -> CAST(length(t) AS BIGINT))))
          AS DOUBLE) / len({_SQL_TOKS}) END)
"""

_SQL_QUALITY = f"""
    ROUND(
      (CASE WHEN length(text) BETWEEN 50 AND 10000 THEN 1.0 ELSE 0.3 END) * 0.3
    + (CASE WHEN {_SQL_STOP_RATIO} BETWEEN 0.01 AND 0.6 THEN 1.0 ELSE 0.5 END) * 0.3
    + (CASE WHEN {_SQL_PUNCT_RATIO} <= 0.2 THEN 1.0 ELSE 0.4 END) * 0.2
    + (CASE WHEN {_SQL_MWL} BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.5 END) * 0.2, 6)
"""


@query(
    "text_quality_scores",
    survey="north-star text analysis (quality scoring)",
    oracle=f"""
    SELECT doc_id,
           ROUND({_SQL_STOP_RATIO}, 6) AS stop_ratio,
           ROUND({_SQL_PUNCT_RATIO}, 6) AS punct_ratio,
           {_SQL_QUALITY} AS quality
    FROM documents WHERE doc_id < 200 ORDER BY doc_id
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return docs.select(
        "doc_id",
        F.round(ta.stopword_ratio(F.col("text")), 6).alias("stop_ratio"),
        F.round(ta.punct_ratio(F.col("text")), 6).alias("punct_ratio"),
        ta.quality_score(F.col("text")).alias("quality"),
    ).orderBy("doc_id")


_SQL_CONT_Q = f"""
    ROUND(CAST(0.5 AS DOUBLE) * {_SQL_STOP_RATIO}
        + CAST(0.3 AS DOUBLE) * ({_SQL_MWL} / CAST(12.0 AS DOUBLE))
        - CAST(0.2 AS DOUBLE) * {_SQL_PUNCT_RATIO}, 6)
"""


@query(
    "text_quality_percentile_filter",
    survey="north-star text analysis (per-language quality-percentile "
           "pruning: drop the bottom quartile WITHIN each language — the "
           "FineWeb/CCNet curation step)",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, {_SQL_PRED_LANG} AS predicted_lang,
             {_SQL_CONT_Q} AS q
      FROM documents),
    thr AS (
      SELECT predicted_lang,
             ROUND(CAST(quantile_cont(q, 0.25) AS DOUBLE), 4) AS threshold
      FROM scored GROUP BY predicted_lang)
    SELECT s.predicted_lang, t.threshold,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN s.q >= t.threshold THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN s.q >= t.threshold THEN s.doc_id ELSE 0 END)
                AS BIGINT) AS kept_doc_id_sum
    FROM scored s JOIN thr t USING (predicted_lang)
    GROUP BY s.predicted_lang, t.threshold
    ORDER BY s.predicted_lang
    """,
)
def text_quality_percentile_filter(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Quantile pruning WITHIN language strata — a flat global cutoff would
    gut whichever language scores systematically lower, so real curation
    pipelines (CCNet, FineWeb) threshold per language. One scan computes a
    continuous quality blend per doc; per-language p25 thresholds are a
    language-count-sized aggregate (broadcast back); the filter + audit
    rollup is map-side partial-aggregable. At 100 TB the only change is
    `approx_percentile` for the threshold pass (t-digest, mergeable)."""
    docs = tbl(spark, sf_dir, "documents")
    q = F.round(
        F.lit(0.5) * ta.stopword_ratio(F.col("text"))
        + F.lit(0.3) * (ta.mean_word_length(F.col("text")) / F.lit(12.0))
        - F.lit(0.2) * ta.punct_ratio(F.col("text")), 6)
    scored = docs.select(
        "doc_id", ta.detect_language(F.col("text")).alias("predicted_lang"),
        q.alias("q"))
    thr = (scored.groupBy("predicted_lang")
           .agg(F.round(F.expr("percentile(q, 0.25)"), 4)
                .alias("threshold")))
    keep = F.col("q") >= F.col("threshold")
    return (scored.join(F.broadcast(thr), "predicted_lang")
            .groupBy("predicted_lang", "threshold")
            .agg(F.count(F.lit(1)).cast("long").alias("n_total"),
                 F.sum(F.when(keep, 1).otherwise(0)).cast("long")
                 .alias("n_kept"),
                 F.sum(F.when(keep, F.col("doc_id")).otherwise(0))
                 .cast("long").alias("kept_doc_id_sum"))
            .orderBy("predicted_lang"))


@query(
    "text_fingerprint",
    survey="north-star text analysis (document fingerprinting)",
    oracle=f"""
    SELECT doc_id,
           coalesce(list_min(list_transform({sql_word_shingles('text', 3)},
                    s -> {sql_token_hash('s')})), -1) AS fingerprint
    FROM documents WHERE doc_id < 200 ORDER BY doc_id
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return docs.select(
        "doc_id",
        ta.doc_fingerprint(F.col("text")).alias("fingerprint"),
    ).orderBy("doc_id")


def _sql_chunking_stats(chunk_size: int = 120, chunk_overlap: int = 30,
                        words_per_sentence: int = 10) -> str:
    """Recursive-CTE twin of the H6 greedy merge (previously rows-only —
    'inherently iterative, no SQL twin'; VERDICT r3 listed it as the one
    non-oracle driver row). The key observation making it expressible: the
    current chunk is ALWAYS a contiguous range of sentences (append keeps
    it contiguous, the overlap seed is a suffix, oversize resets to empty),
    so the whole greedy state is (start index a, prefix-sum before a), and
    every emitted chunk's LENGTH is a prefix-sum difference:
    jl(a,b) = P_b − P_{a−1} + (b − a) for single-space joins.

    The recursion steps one sentence per round — all documents advance in
    parallel rows of the working table, so rounds ∝ max sentences per doc,
    not corpus size. The overlap seed start m_i (smallest m with
    jl(m,i) ≤ overlap) is state-independent modulo clamping to a — it only
    looks at the suffix ending at i — so it precomputes as a bounded
    self-join OUTSIDE the recursion, and the recursive term clamps with
    greatest(m_i, a). Branch map to operators/chunking.merge_sentences:
    oversize flush+solo-emit / append-fits / close+overlap-reseed /
    close+pure-overlap-flush; verified equal to the Python reference on
    all fixture docs at three SFs plus crafted oversize and pure-overlap
    corpora (tests/test_chunking.py)."""
    cs, co, wn = chunk_size, chunk_overlap, words_per_sentence
    pm1_eff = "(CASE WHEN m2.m >= w.a THEN m2.pm1 ELSE w.pa1 END)"
    m_eff = "greatest(m2.m, w.a)"
    fits = f"j.p - w.pa1 + (j.i - w.a) <= {cs}"
    with_ov = f"j.p - {pm1_eff} + (j.i - {m_eff}) <= {cs}"
    close_len = "(j.p - j.len) - w.pa1 + ((j.i - 1) - w.a)"
    return f"""
    WITH RECURSIVE base AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         w -> w <> '') AS toks
      FROM documents),
    persent AS (
      SELECT doc_id,
             list_transform(
               range(1, CAST(ceil(len(toks) / {wn}.0) AS BIGINT) + 1),
               i -> coalesce(list_sum(list_transform(
                      toks[((i-1)*{wn}+1):(i*{wn})], w -> length(w))), 0)
                    + len(toks[((i-1)*{wn}+1):(i*{wn})]) - 1) AS slens
      FROM base WHERE len(toks) > 0),
    sent AS (
      SELECT doc_id, generate_subscripts(slens, 1) AS i,
             CAST(unnest(slens) AS BIGINT) AS len
      FROM persent),
    psum AS (
      SELECT doc_id, i, len,
             SUM(len) OVER (PARTITION BY doc_id ORDER BY i) AS p
      FROM sent),
    smax AS (SELECT doc_id, MAX(i) AS n FROM sent GROUP BY doc_id),
    mstart AS (
      SELECT p1.doc_id, p1.i, MIN(p2.i) AS m
      FROM psum p1 JOIN psum p2
        ON p2.doc_id = p1.doc_id AND p2.i <= p1.i
       AND (p1.p - (p2.p - p2.len)) + (p1.i - p2.i) <= {co}
      GROUP BY p1.doc_id, p1.i),
    mstart2 AS (
      SELECT ms.doc_id, ms.i, ms.m, (pp.p - pp.len) AS pm1
      FROM mstart ms JOIN psum pp
        ON pp.doc_id = ms.doc_id AND pp.i = ms.m),
    walk AS (
      SELECT doc_id, 0 AS i, 0 AS a, CAST(0 AS BIGINT) AS pa1,
             CAST(NULL AS BIGINT) AS e1, CAST(NULL AS BIGINT) AS e2
      FROM smax
      UNION ALL
      SELECT w.doc_id, j.i,
             CASE WHEN j.len > {cs} THEN 0
                  WHEN w.a = 0 THEN j.i
                  WHEN {fits} THEN w.a
                  WHEN m2.m IS NULL THEN j.i
                  WHEN {with_ov} THEN {m_eff}
                  ELSE j.i END AS a,
             CASE WHEN j.len > {cs} THEN CAST(0 AS BIGINT)
                  WHEN w.a = 0 THEN j.p - j.len
                  WHEN {fits} THEN w.pa1
                  WHEN m2.m IS NULL THEN j.p - j.len
                  WHEN {with_ov} THEN {pm1_eff}
                  ELSE j.p - j.len END AS pa1,
             CASE WHEN j.len > {cs} AND w.a > 0 THEN {close_len}
                  WHEN j.len > {cs} THEN CAST(NULL AS BIGINT)
                  WHEN w.a = 0 THEN CAST(NULL AS BIGINT)
                  WHEN {fits} THEN CAST(NULL AS BIGINT)
                  ELSE {close_len} END AS e1,
             CASE WHEN j.len > {cs} THEN j.len
                  WHEN w.a = 0 THEN CAST(NULL AS BIGINT)
                  WHEN {fits} THEN CAST(NULL AS BIGINT)
                  WHEN m2.m IS NULL THEN CAST(NULL AS BIGINT)
                  WHEN {with_ov} THEN CAST(NULL AS BIGINT)
                  ELSE (j.p - j.len) - {pm1_eff} + ((j.i - 1) - {m_eff})
                  END AS e2
      FROM walk w
      JOIN psum j ON j.doc_id = w.doc_id AND j.i = w.i + 1
      LEFT JOIN mstart2 m2 ON m2.doc_id = w.doc_id AND m2.i = w.i),
    emitted AS (
      SELECT doc_id, e1 AS clen FROM walk WHERE e1 IS NOT NULL
      UNION ALL
      SELECT doc_id, e2 FROM walk WHERE e2 IS NOT NULL
      UNION ALL
      SELECT w.doc_id, pf.p - w.pa1 + (s.n - w.a)
      FROM walk w
      JOIN smax s ON s.doc_id = w.doc_id AND w.i = s.n AND w.a > 0
      JOIN psum pf ON pf.doc_id = w.doc_id AND pf.i = s.n)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(MAX(clen) AS INTEGER) AS max_chunk_len
    FROM emitted GROUP BY doc_id ORDER BY doc_id
    """


@query(
    "chunking_stats",
    survey="H5,H6 (sentence split + greedy merge, recursive-CTE oracle)",
    oracle=_sql_chunking_stats(),
)
def chunking_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document chunk count and max chunk length for the H6 greedy
    merge-with-overlap pipeline. Oracle-checked since round 4: the DuckDB
    twin replays the greedy walk as a recursive CTE over sentence prefix
    sums (see ``_sql_chunking_stats`` — the chunk state is a contiguous
    sentence range, which makes the 'inherently iterative' algorithm
    SQL-expressible after all)."""
    from server2_vector_search_server_spark.operators.chunking import (
        chunk_documents,
    )

    docs = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    chunks = chunk_documents(docs, chunk_size=120, chunk_overlap=30,
                             mode="words:10")
    return (
        chunks.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_chunks"),
             F.max(F.length("content")).alias("max_chunk_len"))
        .orderBy("doc_id")
    )


@query(
    "text_tfidf_top_terms",
    survey="north-star text analysis (TF-IDF top terms per document, SURVEY §7 M3)",
    oracle="""
    WITH docs AS (
      SELECT doc_id, lower(text) AS text FROM documents WHERE doc_id < 200),
    terms AS (
      SELECT doc_id, t.term
      FROM docs, UNNEST(list_filter(
             string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS t(term)),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM terms GROUP BY doc_id, term),
    df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM terms GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM docs),
    scored AS (
      SELECT tf.doc_id, tf.term,
             ROUND(tf.tf * (CAST(n.n_docs AS DOUBLE) / df.df), 6)
               AS tfidf,
             row_number() OVER (PARTITION BY tf.doc_id
                                ORDER BY tf.tf * (CAST(n.n_docs AS DOUBLE)
                                                  / df.df) DESC,
                                         tf.term ASC) AS rank
      FROM tf JOIN df USING (term) CROSS JOIN n)
    SELECT doc_id, rank, term, tfidf FROM scored
    WHERE rank <= 3
    ORDER BY doc_id, rank
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document. Rarity weight is the LOG-FREE form
    tf · (N/df): a single integer→double division is bit-identical across
    engines, where ln() is libm-dependent in its last ulp — the ranking is
    monotone-equivalent for term ordering within a document. Two shuffles
    (tf groupBy, df groupBy) + one term join; at 100 TB the df side is the
    vocabulary — broadcastable after a min-df cut."""
    from pyspark.sql import Window

    docs = (tbl(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < 200)
            .select("doc_id", F.lower(F.col("text")).alias("text")))
    # r10: df derives from the tf table (COUNT(*) per term over distinct
    # (doc, term) rows IS the distinct-doc count), so the corpus is
    # tokenized once and both branches share the tf exchange instead of
    # each re-exploding the token stream; the doc count rides as a
    # broadcast 1-row aggregate instead of a per-call driver count()
    # action (the bm25 batch-2 pattern). Identical arithmetic.
    nrow = docs.agg(F.count(F.lit(1)).cast("double").alias("_n_docs"))
    terms = docs.select("doc_id", F.explode(tokens(F.col("text")))
                        .alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # Catalyst rewrites this branch to a pure distinct over (doc, term)
    # (functions=[] in the executed plan) — lighter partials than the old
    # count_distinct(doc) buffers; the rewrite also means the two tf
    # subtrees canonicalize differently, so the exchange is not reused
    # (checked in the executed plan) — the win here is the removed
    # count() action plus the cheaper df aggregate, not a shared scan
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(df_, "term")
        .join(F.broadcast(nrow))
        .withColumn("tfidf_raw",
                    F.col("tf") * (F.col("_n_docs") / F.col("df")))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf_raw").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "rank", "term",
                F.round("tfidf_raw", 6).alias("tfidf"))
        .orderBy("doc_id", "rank")
    )


# --- training-data quality signals (wave 5) ---------------------------------

from server2_vector_search_server_spark.functions.text import (  # noqa: E402
    sql_word_shingles,
    word_shingles,
)


@query(
    "text_repetition_score",
    survey="north-star text analysis (within-document repetition fraction — "
           "the Gopher/ccnet duplicate-n-gram quality signal)",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             GREATEST(len({_SQL_TOKS}) - 2, 0) AS n_trigrams,
             len({sql_word_shingles('text', 3)}) AS n_distinct
      FROM documents WHERE doc_id < 200)
    SELECT doc_id, CAST(n_trigrams AS INTEGER) AS n_trigrams,
           CAST(n_distinct AS INTEGER) AS n_distinct,
           ROUND(CASE WHEN n_trigrams = 0 THEN 0.0
                 ELSE 1.0 - CAST(n_distinct AS DOUBLE) / n_trigrams END, 6)
             AS dup_fraction
    FROM d ORDER BY doc_id
    """,
)
def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraction of word-trigram occurrences that are repeats of an earlier
    trigram in the same document — a standard pre-training quality filter
    (high dup_fraction ⇒ boilerplate/spam). Pure per-row map over one scan:
    no shuffle at all, scales linearly with corpus bytes."""
    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    n_tri = F.greatest(F.size(tokens(F.col("text"))) - 2, F.lit(0))
    n_dis = F.size(word_shingles(F.col("text"), 3))
    return docs.select(
        "doc_id",
        n_tri.alias("n_trigrams"),
        n_dis.alias("n_distinct"),
        F.round(
            F.when(n_tri == 0, F.lit(0.0))
            .otherwise(1.0 - n_dis.cast("double") / n_tri), 6)
        .alias("dup_fraction"),
    ).orderBy("doc_id")


@query(
    "text_contamination_overlap",
    survey="north-star text analysis (benchmark decontamination: 8-gram "
           "overlap of corpus docs against a held-out set)",
    oracle=f"""
    WITH bench AS (
      SELECT DISTINCT s.sh
      FROM (SELECT {sql_word_shingles('text', 8)} AS shs
            FROM documents WHERE doc_id < 5) b, UNNEST(b.shs) AS s(sh)),
    corp AS (
      SELECT doc_id, {sql_word_shingles('text', 8)} AS shs
      FROM documents WHERE doc_id >= 5 AND doc_id < 300),
    hits AS (
      SELECT c.doc_id, COUNT(*) AS n_contaminated
      FROM corp c, UNNEST(c.shs) AS s(sh)
      WHERE s.sh IN (SELECT sh FROM bench)
      GROUP BY c.doc_id)
    SELECT c.doc_id,
           CAST(len(c.shs) AS INTEGER) AS n_shingles,
           CAST(COALESCE(h.n_contaminated, 0) AS INTEGER) AS n_contaminated,
           (COALESCE(h.n_contaminated, 0) > 0) AS contaminated
    FROM corp c LEFT JOIN hits h USING (doc_id)
    ORDER BY c.doc_id
    """,
)
def text_contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any distinct
    8-gram with a held-out benchmark set (doc_id < 5 stands in for the eval
    suite). The benchmark shingle set is tiny ⇒ broadcast hash join against
    the exploded corpus shingles — the 100 TB corpus side is one scan with
    NO shuffle of corpus rows; the per-doc hit count is partial-aggregable.
    (At real scale the broadcast set is the n-grams of every eval benchmark —
    a few million strings — still broadcast/bloom territory.)"""
    docs = tbl(spark, sf_dir, "documents")
    bench = (docs.filter(F.col("doc_id") < 5)
             .select(F.explode(word_shingles(F.col("text"), 8)).alias("sh"))
             .distinct().withColumn("hit", F.lit(1)))
    # single shingle pass: explode once, mark hits via the broadcast left
    # join, count rows (= n_shingles, shingles are distinct-per-doc) and
    # hits in ONE aggregate; docs too short for any 8-gram re-enter 0-filled
    corp_ids = (docs.filter((F.col("doc_id") >= 5) & (F.col("doc_id") < 300))
                .select("doc_id"))
    # spread the bounded 295-doc corpus slice before shingling: the word
    # 8-gram transform + explode is the pillar's dominant interpreted
    # compute and otherwise runs on the scan's single local partition
    exploded = (spread(docs.filter((F.col("doc_id") >= 5)
                                   & (F.col("doc_id") < 300))
                       .select("doc_id", "text"))
                .select("doc_id",
                        F.explode(word_shingles(F.col("text"), 8))
                        .alias("sh")))
    agg = (exploded.join(F.broadcast(bench), "sh", "left")
           .groupBy("doc_id")
           .agg(F.count(F.lit(1)).alias("n_shingles"),
                F.sum(F.coalesce("hit", F.lit(0))).alias("n_contaminated")))
    return (corp_ids.join(agg, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("n_shingles", F.lit(0)).cast("int")
                .alias("n_shingles"),
                F.coalesce("n_contaminated", F.lit(0)).cast("int")
                .alias("n_contaminated"),
                (F.coalesce("n_contaminated", F.lit(0)) > 0)
                .alias("contaminated"))
            .orderBy("doc_id"))


# ---------------------------------------------------------------------------
# Gopher rule-based quality filtering (Rae et al. 2021 §A1.1)

_SQL_NW = f"CASE WHEN len({_SQL_TOKS}) = 0 THEN 1 ELSE len({_SQL_TOKS}) END"
_SQL_LINES = ("list_filter(string_split(text, chr(10)), "
              "ln -> trim(ln) != '')")
_SQL_NL = f"CASE WHEN len({_SQL_LINES}) = 0 THEN 1 ELSE len({_SQL_LINES}) END"

_SQL_GOPHER = f"""
    SELECT doc_id,
           CAST(len({_SQL_TOKS}) AS INTEGER) AS n_words,
           ROUND(CAST(list_sum(list_prepend(CAST(0 AS BIGINT),
                   list_transform({_SQL_TOKS},
                     t -> CAST(length(t) AS BIGINT)))) AS DOUBLE)
                 / CAST({_SQL_NW} AS DOUBLE), 6) AS mean_word_len,
           ROUND(CAST(len(list_filter({_SQL_TOKS},
                   t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE)
                 / CAST({_SQL_NW} AS DOUBLE), 6) AS frac_alpha_words,
           ROUND(CAST(len(list_filter({_SQL_TOKS},
                   t -> contains(t, '#') OR contains(t, '...'))) AS DOUBLE)
                 / CAST({_SQL_NW} AS DOUBLE), 6) AS frac_symbol_words,
           ROUND(CAST(len(list_filter({_SQL_LINES},
                   ln -> starts_with(trim(ln), '-')
                         OR starts_with(trim(ln), '*'))) AS DOUBLE)
                 / CAST({_SQL_NL} AS DOUBLE), 6) AS frac_bullet_lines,
           ROUND(CAST(len(list_filter({_SQL_LINES},
                   ln -> ends_with(rtrim(ln), '...'))) AS DOUBLE)
                 / CAST({_SQL_NL} AS DOUBLE), 6) AS frac_ellipsis_lines,
           CAST({{stop_hits}} AS INTEGER) AS n_stop_hits,
           (len({_SQL_TOKS}) BETWEEN 50 AND 100000
            AND ROUND(CAST(list_sum(list_prepend(CAST(0 AS BIGINT),
                    list_transform({_SQL_TOKS},
                      t -> CAST(length(t) AS BIGINT)))) AS DOUBLE)
                  / CAST({_SQL_NW} AS DOUBLE), 6) BETWEEN 3.0 AND 10.0
            AND ROUND(CAST(len(list_filter({_SQL_TOKS},
                    t -> contains(t, '#') OR contains(t, '...'))) AS DOUBLE)
                  / CAST({_SQL_NW} AS DOUBLE), 6) <= 0.1
            AND ROUND(CAST(len(list_filter({_SQL_LINES},
                    ln -> starts_with(trim(ln), '-')
                          OR starts_with(trim(ln), '*'))) AS DOUBLE)
                  / CAST({_SQL_NL} AS DOUBLE), 6) <= 0.9
            AND ROUND(CAST(len(list_filter({_SQL_LINES},
                    ln -> ends_with(rtrim(ln), '...'))) AS DOUBLE)
                  / CAST({_SQL_NL} AS DOUBLE), 6) <= 0.3
            AND ROUND(CAST(len(list_filter({_SQL_TOKS},
                    t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE)
                  / CAST({_SQL_NW} AS DOUBLE), 6) >= 0.8
            AND {{stop_hits}} >= 2) AS keep
    FROM documents WHERE doc_id < 200 ORDER BY doc_id
"""


@query(
    "text_gopher_rules",
    survey="north-star text analysis (Gopher rule-based quality filter, "
           "Rae et al. 2021 §A1.1)",
    oracle=_SQL_GOPHER.replace("{stop_hits}", _sql_stop_hits("en")),
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full Gopher rule family per document — word-count bounds, mean
    word length, symbol/bullet/ellipsis fractions, alphabetic-word fraction,
    stopword gate, and the conjunctive keep verdict — in ONE narrow
    projection (operators/text_analysis.gopher_rule_columns)."""
    # NOT spread: A/B'd r10 (scripts/r10_ab5.py) — the 200-doc rule family
    # costs ~0.6 s on one core; the spread exchange + extra stage was +30%
    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return (docs.select("doc_id", *ta.gopher_rule_columns(F.col("text")))
            .withColumn("n_words", F.col("n_words").cast("int"))
            .withColumn("n_stop_hits", F.col("n_stop_hits").cast("int"))
            .orderBy("doc_id"))


# --- Gopher repetition rules (Rae et al. 2021 Table A1) ---------------------

_REP_LINE = "REPEAT ME PLEASE"
_REP_SPAM = " spam" * 10


def _sql_rep_wins(n: int) -> str:
    return (f"list_transform({sql_token_windows('text', n)}, "
            f"s -> s.win)")


def _sql_top_cover(n: int) -> str:
    w = f"w{n}"
    return (f"ROUND(CAST(coalesce(list_max(list_transform("
            f"list_distinct({w}), d -> len(list_filter({w}, x -> x = d)) "
            f"* (length(d) - {n - 1}))), 0) AS DOUBLE) / tc, 6)")


def _sql_dup_cover(n: int) -> str:
    w = f"w{n}"
    return (f"ROUND(CAST(coalesce(list_sum(list_transform("
            f"list_distinct({w}), d -> CASE "
            f"WHEN len(list_filter({w}, x -> x = d)) > 1 "
            f"THEN len(list_filter({w}, x -> x = d)) * (length(d) - {n - 1}) "
            f"ELSE 0 END)), 0) AS DOUBLE) / tc, 6)")


_SQL_GOPHER_REP = f"""
    WITH docs2 AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0
                  THEN text || chr(10) || '{_REP_LINE}' || chr(10) ||
                       '{_REP_LINE}' || chr(10) || '{_REP_LINE}'
                  WHEN doc_id % 3 = 1 THEN text || '{_REP_SPAM}'
                  ELSE text END AS text
      FROM documents WHERE doc_id < 120),
    feat AS (
      SELECT doc_id,
             list_filter(string_split(text, chr(10)),
                         ln -> trim(ln) != '') AS lines,
             {_SQL_TOKS} AS toks,
             {_sql_rep_wins(2)} AS w2, {_sql_rep_wins(3)} AS w3,
             {_sql_rep_wins(4)} AS w4, {_sql_rep_wins(5)} AS w5,
             {_sql_rep_wins(10)} AS w10
      FROM docs2),
    feat2 AS (
      SELECT *,
             CASE WHEN len(lines) = 0 THEN 1 ELSE len(lines) END AS nl,
             CAST(greatest(coalesce(list_sum(list_transform(lines,
                  ln -> length(ln))), 0), 1) AS DOUBLE) AS lc,
             CAST(greatest(coalesce(list_sum(list_transform(toks,
                  t -> length(t))), 0), 1) AS DOUBLE) AS tc,
             list_filter(lines, ln ->
                  len(list_filter(lines, x -> x = ln)) > 1) AS dup_lines
      FROM feat),
    m AS (
      SELECT doc_id,
             ROUND(CAST(len(dup_lines) AS DOUBLE) / nl, 6) AS dup_line_frac,
             ROUND(CAST(coalesce(list_sum(list_transform(dup_lines,
                   ln -> length(ln))), 0) AS DOUBLE) / lc, 6)
               AS dup_line_char_frac,
             {_sql_top_cover(2)} AS top_2gram_char_frac,
             {_sql_top_cover(3)} AS top_3gram_char_frac,
             {_sql_top_cover(4)} AS top_4gram_char_frac,
             {_sql_dup_cover(5)} AS dup_5gram_char_frac,
             {_sql_dup_cover(10)} AS dup_10gram_char_frac
      FROM feat2)
    SELECT *,
           (dup_line_frac <= 0.30 AND dup_line_char_frac <= 0.20
            AND top_2gram_char_frac <= 0.20 AND top_3gram_char_frac <= 0.18
            AND top_4gram_char_frac <= 0.16 AND dup_5gram_char_frac <= 0.15
            AND dup_10gram_char_frac <= 0.10) AS rep_keep
    FROM m ORDER BY doc_id
"""


@query(
    "text_gopher_repetition",
    survey="north-star text analysis (Gopher repetition filter family, "
           "Rae et al. 2021 Table A1: duplicate lines, top/duplicated "
           "n-gram character coverage — the RefinedWeb/FineWeb carry-over "
           "rules)",
    oracle=_SQL_GOPHER_REP,
)
def text_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition metrics per doc over a corpus with
    planted repetition (every 3rd doc gets a tripled line, the next a
    heavy bigram tail) — one narrow projection, no shuffle, no Python
    (operators/text_analysis.gopher_repetition_columns)."""
    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    planted = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.col("text"),
                        F.lit(f"\n{_REP_LINE}\n{_REP_LINE}\n{_REP_LINE}")))
        .when(F.col("doc_id") % 3 == 1,
              F.concat(F.col("text"), F.lit(_REP_SPAM)))
        .otherwise(F.col("text")).alias("text"))
    # widen before the O(doc_len²) per-document lambdas: the 120-doc slice
    # scans as one partition, which would single-core the whole family
    from server2_vector_search_server_spark.operators.dedup import _widen
    return (ta.add_gopher_repetition(_widen(planted)).drop("text")
            .orderBy("doc_id"))


@query(
    "text_inverted_index",
    survey="north-star retrieval infrastructure (inverted index build: "
           "term -> ordered posting list + document frequency)",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct({_SQL_TOKS})) AS term
      FROM documents WHERE doc_id < 300)
    SELECT term,
           CAST(COUNT(*) AS BIGINT) AS df,
           array_to_string(list_sort(list(doc_id)), ',') AS postings
    FROM toks
    GROUP BY term
    HAVING COUNT(*) >= 50
    ORDER BY term
    """,
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction — THE retrieval-serving data structure:
    per-document distinct terms exploded, grouped by term into (document
    frequency, ordered posting list). One shuffle keyed by term; postings
    serialize as sorted CSV (the grading canonicalizer cannot hash list
    cells). At 100 TB the same plan writes term-bucketed parquet so a
    query's term lookup is a partition-pruned scan — BM25/TF-IDF queries
    (text_bm25_topk) then join this index instead of re-tokenizing the
    corpus. The df >= 50 floor mirrors the stopword-pressure cutoff an
    index build applies to bound posting length skew."""
    from server2_vector_search_server_spark.functions.text import tokens

    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(tokens(F.col("text")))).alias("term"))
    return (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"),
             F.array_join(
                 F.transform(F.sort_array(F.collect_list("doc_id")),
                             lambda x: x.cast("string")), ",")
             .alias("postings"))
        .filter(F.col("df") >= 50)
        .orderBy("term")
    )


@query(
    "text_quality_classifier_mllib",
    survey="north-star text analysis (model-based quality filter: distill "
           "a HashingTF+IDF+LogisticRegression classifier from the "
           "rule-based quality signal — the fastText-recipe MLlib "
           "pipeline, pinned by a hash-checked train-set agreement bound)",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, TRUE AS agreement_ge_090
    FROM documents WHERE doc_id < 500
    """,
)
def text_quality_classifier_mllib(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Train the distilled quality classifier on documents labeled by the
    deterministic quality heuristic (the expensive-signal stand-in), score
    the same corpus, and return the calibration verdict a curation
    pipeline applies before trusting the cheap model: L-BFGS internals
    aren't SQL, so the checked contract is the engine-independent
    invariant (VERDICT r4 item 5) — train-set agreement ≥ 0.90 (measured
    ≈ 0.998 at fixture scale) over the exact document count. An optimizer
    or featurization drift flips the boolean and reds the hash."""
    docs = (tbl(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < 500)
            .select("doc_id", "text",
                    (ta.quality_score(F.col("text")) >= 0.8)
                    .cast("double").alias("label")))
    model = ta.train_quality_classifier(docs)
    scored = model.transform(docs)
    return scored.agg(
        F.count(F.lit(1)).alias("n_docs"),
        ((F.sum((F.col("label") == F.col("prediction")).cast("long"))
          / F.count(F.lit(1))) >= 0.90).alias("agreement_ge_090"))


@query(
    "text_sequence_packing",
    survey="north-star text analysis (pretraining sequence packing: "
           "concatenate the token stream in document order, cut every "
           "B tokens — bin assignment by exclusive prefix sum)",
    oracle=f"""
    -- bin = floor(tokens_before_this_doc / B): the GPT-style packing
    -- contract where the stream is concatenated and cut every B tokens,
    -- and a document belongs to the sequence its first token lands in
    WITH toks AS (
      SELECT doc_id, CAST(len({_SQL_TOKS}) AS BIGINT) AS n_tokens
      FROM documents WHERE doc_id < 400),
    offs AS (
      SELECT doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS tokens_before
      FROM toks)
    SELECT CAST(tokens_before // 512 AS BIGINT) AS seq_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc,
           (MIN(tokens_before) % 512 <> 0) AS starts_mid_sequence
    FROM offs
    GROUP BY seq_id
    ORDER BY seq_id
    """,
)
def text_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining sequence packing (budget 512 tokens): the corpus token
    stream is conceptually concatenated in document order and cut every B
    tokens; each document joins the sequence its first token lands in
    (floor of the EXCLUSIVE prefix sum / B). At fixture scale the prefix
    sum is one global window; at 100 TB the same quantity comes from the
    standard two-pass distributed prefix sum — per-partition token
    subtotals (tiny) broadcast back as partition offsets — so the contract
    is scale-independent. Output: per-sequence document count, token
    count, id span, and whether the sequence opens mid-document (the
    straddle a packed loader handles with attention masking)."""
    from pyspark.sql import Window

    from server2_vector_search_server_spark.functions.text import tokens

    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    toks = docs.select(
        "doc_id", F.size(tokens(F.col("text"))).cast("long")
        .alias("n_tokens"))
    w = (Window.orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    offs = toks.withColumn(
        "tokens_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return (
        offs.groupBy(F.floor(F.col("tokens_before") / 512)
                     .cast("long").alias("seq_id"))
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_tokens").alias("n_tokens"),
             F.min("doc_id").alias("first_doc"),
             F.max("doc_id").alias("last_doc"),
             ((F.min("tokens_before") % 512) != 0)
             .alias("starts_mid_sequence"))
        .orderBy("seq_id")
    )


@query(
    "text_sequence_packing_distributed",
    survey="north-star text analysis (sequence packing via the two-pass "
           "range-partitioned prefix sum — no single-partition global "
           "sort; same packing contract, scale-safe physical plan)",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, CAST(len({_SQL_TOKS}) AS BIGINT) AS n_tokens
      FROM documents WHERE doc_id < 400),
    offs AS (
      SELECT doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS tokens_before
      FROM toks)
    SELECT CAST(tokens_before // 512 AS BIGINT) AS seq_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM offs
    GROUP BY seq_id
    ORDER BY seq_id
    """,
)
def text_sequence_packing_distributed(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    """Same packing contract as ``text_sequence_packing``, but the prefix
    sum comes from ``operators/text_analysis.exclusive_prefix_sum`` — the
    two-pass range-partitioned scan whose per-stage state is O(partitions),
    not the one-reducer global window. The oracle is the window form: the
    two plans must be value-identical (the §22 scale proof measures why the
    physical difference matters at 100×)."""
    from server2_vector_search_server_spark.functions.text import tokens
    from server2_vector_search_server_spark.operators.text_analysis import (
        pack_sequences,
    )

    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    toks = docs.select(
        "doc_id", F.size(tokens(F.col("text"))).cast("long")
        .alias("n_tokens"))
    packed = pack_sequences(toks, budget=512, distributed=True)
    return (packed.groupBy("seq_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").alias("n_tokens"),
                 F.min("doc_id").alias("first_doc"),
                 F.max("doc_id").alias("last_doc"))
            .orderBy("seq_id"))


@query(
    "text_pii_redaction",
    survey="north-star text analysis (PII scrubbing pass: regex redaction "
           "of emails/phones with per-doc match accounting)",
    oracle=r"""
    -- deterministic plant: every doc gets an email and a phone; the
    -- redaction pass must strip both and account for each match
    WITH corpus AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or +1-555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               AS text
      FROM documents WHERE doc_id < 300),
    redacted AS (
      SELECT doc_id,
             regexp_replace(
               regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                 '[EMAIL]', 'g'),
               '\+1-\d{3}-\d{4}', '[PHONE]', 'g') AS clean,
             CAST(len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
               AS INTEGER) AS n_emails,
             CAST(len(regexp_extract_all(text, '\+1-\d{3}-\d{4}'))
               AS INTEGER) AS n_phones
      FROM corpus)
    SELECT doc_id, n_emails, n_phones,
           contains(clean, '[EMAIL]') AS has_email_token,
           contains(clean, '[PHONE]') AS has_phone_token,
           NOT regexp_matches(clean, '@') AS no_at_left,
           md5(clean) AS clean_hash
    FROM redacted ORDER BY doc_id
    """,
)
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PII scrubbing pass every distributed training corpus gets:
    regex redaction of emails and phone numbers (planted deterministically
    so the pass provably fires), with per-document match accounting and an
    md5 of the redacted text — proving byte-identical redaction output
    across engines, not just matching counts. Pure codegen'd regex
    projections; at 100 TB this fuses into the scan like every other
    rule-based pass."""
    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    email_re = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone_re = r"\+1-\d{3}-\d{4}"
    corpus = docs.select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" contact user"),
                 F.col("doc_id").cast("string"),
                 F.lit("@example.com or +1-555-"),
                 F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"))
        .alias("text"))
    clean = F.regexp_replace(
        F.regexp_replace(F.col("text"), email_re, "[EMAIL]"),
        phone_re, "[PHONE]")
    red = corpus.select(
        "doc_id", clean.alias("clean"),
        F.size(F.expr(f"regexp_extract_all(text, '{email_re}', 0)"))
        .cast("int").alias("n_emails"),
        F.size(F.expr(r"regexp_extract_all(text, '\\+1-\\d{3}-\\d{4}', 0)"))
        .cast("int").alias("n_phones"))
    return (
        red.select(
            "doc_id", "n_emails", "n_phones",
            F.col("clean").contains("[EMAIL]").alias("has_email_token"),
            F.col("clean").contains("[PHONE]").alias("has_phone_token"),
            (~F.col("clean").contains("@")).alias("no_at_left"),
            F.md5("clean").alias("clean_hash"))
        .orderBy("doc_id")
    )


_CT_K = 4   # clusters = centroid vectors embeddings[0..3]


@query(
    "text_cluster_topic_terms",
    survey="north-star text analysis × ANN (corpus exploration: embedding "
           "clusters labeled by c-TF-IDF top terms — the BERTopic shape)",
    oracle=f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS c
      FROM embeddings WHERE vec_id < {_CT_K}),
    assigned AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, cent.cid,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_sum(list_transform(
                     list_zip(e.embedding, cent.c),
                     p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                          * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))
                   ASC, cent.cid ASC) AS rn
        FROM embeddings e CROSS JOIN cent) t
      WHERE rn = 1),
    docs AS (
      SELECT a.cid, lower(d.text) AS text
      FROM documents d JOIN assigned a ON a.vec_id = d.doc_id),
    terms AS (
      SELECT cid, t.term
      FROM docs, UNNEST(list_filter(
             string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS t(term)),
    tf AS (
      SELECT cid, term, COUNT(*) AS tf FROM terms GROUP BY cid, term),
    df AS (
      SELECT term, COUNT(DISTINCT cid) AS df FROM terms GROUP BY term),
    scored AS (
      SELECT tf.cid, tf.term,
             ROUND(tf.tf * (CAST({_CT_K} AS DOUBLE) / df.df), 6) AS ctfidf,
             row_number() OVER (PARTITION BY tf.cid
                                ORDER BY tf.tf * (CAST({_CT_K} AS DOUBLE)
                                                  / df.df) DESC,
                                         tf.term ASC) AS rank
      FROM tf JOIN df USING (term))
    SELECT cid AS cluster_id, CAST(rank AS INTEGER) AS rank, term, ctfidf
    FROM scored WHERE rank <= 3
    ORDER BY cluster_id, rank
    """,
)
def text_cluster_topic_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus exploration end-to-end: documents cluster by embedding
    (argmin over {_CT_K} deterministic centroids — the IVF assign reused as
    k-means E-step), each cluster labeled by its top-3 c-TF-IDF terms
    (class-based TF-IDF: tf within the cluster x K/df across clusters —
    the BERTopic labeling scheme, public). One assignment scan + the tf/df
    shuffles at CLUSTER granularity: the df side is vocabulary-sized and
    the tf side has at most K x vocab rows, so the whole labeling stage is
    broadcast-friendly at any corpus size."""
    from pyspark.sql import Window

    from server2_vector_search_server_spark.operators.ann import ivf_assign

    emb = tbl(spark, sf_dir, "embeddings")
    cent = (emb.filter(F.col("vec_id") < _CT_K)
            .select(F.col("vec_id").alias("centroid_id"),
                    F.col("embedding").alias("centroid")))
    assigned = ivf_assign(emb, cent).select(
        "vec_id", F.col("centroid_id").alias("cid"))
    docs = (tbl(spark, sf_dir, "documents")
            .join(assigned, F.col("doc_id") == F.col("vec_id"))
            .select("cid", F.lower(F.col("text")).alias("text")))
    terms = docs.select("cid", F.explode(tokens(F.col("text")))
                        .alias("term"))
    tf = terms.groupBy("cid", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = terms.groupBy("term").agg(F.count_distinct("cid").alias("df"))
    raw = F.col("tf") * (F.lit(float(_CT_K)) / F.col("df"))
    w = Window.partitionBy("cid").orderBy(raw.desc(), F.col("term").asc())
    return (tf.join(df_, "term")
            .withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= 3)
            .select(F.col("cid").alias("cluster_id"), "rank", "term",
                    F.round(raw, 6).alias("ctfidf"))
            .orderBy("cluster_id", "rank"))


@query(
    "text_bpe_merge_pairs",
    survey="north-star text analysis (BPE tokenizer-training step: corpus "
           "adjacent-character-pair frequencies, the argmax of which is the "
           "next merge rule)",
    oracle="""
    WITH words AS (
      SELECT lower(t.term) AS w
      FROM documents, UNNEST(list_filter(
             string_split_regex(trim(text), '\\s+'), x -> x <> ''))
           AS t(term)),
    vocab AS (SELECT w, COUNT(*) AS freq FROM words GROUP BY w),
    pairs AS (
      SELECT p.pair, freq
      FROM vocab, UNNEST(list_transform(
             range(1, length(w)), i -> substr(w, i, 2))) AS p(pair)
      WHERE length(w) >= 2)
    SELECT pair, CAST(SUM(freq) AS BIGINT) AS n
    FROM pairs GROUP BY pair
    ORDER BY n DESC, pair LIMIT 20
    """,
)
def text_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE training round (Sennrich et al. 2016, public method): the
    top adjacent-symbol pair counts. The scale-critical shape: aggregate
    the corpus to its VOCABULARY first (one shuffle; vocab ≪ corpus), then
    explode character pairs only over unique words weighted by frequency —
    a 100-TB corpus explodes ~10M vocab rows, not 10^11 token rows. A full
    trainer loops this query, applying the argmax merge to the vocab
    between rounds (same plan each round over a shrinking symbol table)."""
    from server2_vector_search_server_spark.functions.text import tokens

    docs = tbl(spark, sf_dir, "documents")
    vocab = (docs.select(
                 F.explode(tokens(F.lower(F.col("text")))).alias("w"))
             .groupBy("w").agg(F.count(F.lit(1)).alias("freq")))
    pair_expr = F.transform(
        F.sequence(F.lit(1), F.length("w") - 1),
        lambda i: F.substring(F.col("w"), i, F.lit(2)))
    return (vocab.filter(F.length("w") >= 2)
            .select(F.explode(pair_expr).alias("pair"), "freq")
            .groupBy("pair").agg(F.sum("freq").cast("long").alias("n"))
            .orderBy(F.col("n").desc(), "pair").limit(20))


@query(
    "text_char_lm_score",
    survey="north-star text analysis (character-bigram LM scoring — the "
           "CCNet/KenLM-style perplexity-proxy quality filter: docs whose "
           "character statistics diverge from the target corpus score "
           "high negative log-likelihood)",
    oracle="""
    WITH chars AS (
      SELECT doc_id, (lang = 'en') AS is_target, lower(text) AS t
      FROM documents),
    bigrams AS (
      SELECT doc_id, is_target, g.bg
      FROM chars, UNNEST(list_transform(
             range(1, length(t)), i -> substr(t, i, 2))) AS g(bg)
      WHERE length(t) >= 2),
    tgt AS (
      SELECT bg, COUNT(*) AS ct FROM bigrams WHERE is_target GROUP BY bg),
    norm AS (
      SELECT (SELECT SUM(ct) FROM tgt) AS nt,
             (SELECT COUNT(DISTINCT bg) FROM bigrams) AS b),
    w AS (
      SELECT v.bg,
             CAST(ROUND(ROUND(ln(COALESCE(t.ct, 0) + 1.0)
                              - ln(n.nt + n.b), 6) * 1000000) AS BIGINT)
               AS lp_micro
      FROM (SELECT DISTINCT bg FROM bigrams) v
      LEFT JOIN tgt t USING (bg) CROSS JOIN norm n)
    SELECT bg0.doc_id, COUNT(*) AS n_bigrams,
           ROUND(-(SUM(w.lp_micro) / 1000000.0) / COUNT(*), 6)
             AS avg_neg_log_prob
    FROM bigrams bg0 JOIN w USING (bg)
    GROUP BY bg0.doc_id
    ORDER BY bg0.doc_id
    """,
)
def text_char_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality scoring without a model dependency: an
    add-1-smoothed character-bigram LM is FIT on the target slice (English
    docs) and every document is scored by average negative log-likelihood
    — high values flag text whose character statistics diverge from the
    target (the public CCNet recipe's LM filter, with the n-gram LM
    standing in for KenLM). Scale shape: two passes over the character
    stream (vocab counts, then scoring) + a vocab-sized broadcast; per-doc
    sums fold integer micro-units (registry parity rules). The same
    machinery generalizes to word n-grams by swapping the explode."""
    docs = tbl(spark, sf_dir, "documents")
    chars = docs.select(
        "doc_id", (F.col("lang") == "en").alias("is_target"),
        F.lower(F.col("text")).alias("t"))
    bg_expr = F.transform(
        F.sequence(F.lit(1), F.length("t") - 1),
        lambda i: F.substring(F.col("t"), i, F.lit(2)))
    bigrams = (chars.filter(F.length("t") >= 2)
               .select("doc_id", "is_target",
                       F.explode(bg_expr).alias("bg")))
    tgt = (bigrams.filter("is_target")
           .groupBy("bg").agg(F.count(F.lit(1)).alias("ct")))
    vocab = bigrams.select("bg").distinct().localCheckpoint(eager=True)
    totals = (tgt.agg(F.sum("ct").alias("nt")).collect()[0],
              vocab.count())
    nt, b = int(totals[0]["nt"]), int(totals[1])
    lp = F.round(
        F.log(F.coalesce(F.col("ct"), F.lit(0)) + 1.0)
        - F.log(F.lit(float(nt + b))), 6)
    w = (vocab.join(tgt, "bg", "left")
         .select("bg", F.round(lp * 1_000_000).cast("long")
                 .alias("lp_micro")))
    return (bigrams.join(F.broadcast(w), "bg")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.sum("lp_micro").alias("_s"))
            .select("doc_id", "n_bigrams",
                    F.round(-(F.col("_s") / 1_000_000.0)
                            / F.col("n_bigrams"), 6)
                    .alias("avg_neg_log_prob"))
            .orderBy("doc_id"))


# ---------------------------------------------------------------------------
# iterative BPE training: 3 merge rounds, argmax merge applied between rounds

_BPE_ROUNDS = 3
_BPE_DOCS = 100

# a word spaced into symbols: 'the' -> 't h e'; a merge is a literal
# replace whose leftmost non-overlapping greedy semantics are IDENTICAL in
# java.lang.String.replace (Spark `replace`) and DuckDB `replace` — that
# shared contract is what makes iterative BPE oracle-checkable without a
# UDF. The replace runs on a SENTINEL-DELIMITED render (\x01 around every
# symbol, pattern \x01A\x01 \x01B\x01): a bare 'A B' replace would also
# match across symbol boundaries once multi-char symbols exist (pattern
# 'e t' inside 'e th' fusing e with half of th — not a BPE merge); the
# sentinels are the subword-nmt (?<!\S)/(?!\S) guards in a form RE2-less
# DuckDB can run. Assumes corpus tokens never contain \x01.
_SQL_SPACED_VOCAB = f"""
      SELECT array_to_string(list_transform(
               range(1, length(w) + 1), i -> substr(w, i, 1)), ' ') AS w,
             COUNT(*) AS freq
      FROM (
        SELECT lower(t.term) AS w
        FROM documents, UNNEST(list_filter(
               string_split_regex(trim(text), '\\s+'), x -> x <> ''))
             AS t(term)
        WHERE doc_id < {_BPE_DOCS})
      GROUP BY w
"""


def bpe_apply_merge(w, pair: str):
    """Apply one BPE merge to a space-separated symbol string, guarded so
    the pattern only matches WHOLE adjacent symbols (see the sentinel
    comment above): 'e t' must not merge inside 'x e th'. Twin of the
    v{rnd} stage in :func:`_sql_bpe_round`."""
    sep = "\x01"
    delimited = F.concat(
        F.lit(sep),
        F.replace(w, F.lit(" "), F.lit(sep + " " + sep)),
        F.lit(sep))
    pattern = sep + pair.replace(" ", f"{sep} {sep}") + sep
    merged = sep + pair.replace(" ", "") + sep
    return F.replace(
        F.replace(delimited, F.lit(pattern), F.lit(merged)),
        F.lit(sep), F.lit(""))


def _sql_bpe_round(prev: str, rnd: int) -> str:
    """One unrolled BPE round: pair counts over ``prev`` -> 1-row argmax
    ``best{rnd}`` -> merged vocab ``v{rnd}``."""
    return f"""
    p{rnd} AS (
      SELECT pr.pair, CAST(SUM(freq) AS BIGINT) AS n
      FROM {prev}, UNNEST(list_transform(
             range(1, len(string_split({prev}.w, ' '))),
             i -> string_split({prev}.w, ' ')[i] || ' ' ||
                  string_split({prev}.w, ' ')[i + 1])) AS pr(pair)
      WHERE len(string_split({prev}.w, ' ')) >= 2
      GROUP BY pr.pair),
    best{rnd} AS (
      SELECT CAST({rnd} AS BIGINT) AS round, pair, n
      FROM p{rnd} ORDER BY n DESC, pair ASC LIMIT 1),
    v{rnd} AS (
      SELECT replace(
               replace(
                 chr(1) || replace(v.w, ' ', chr(1) || ' ' || chr(1))
                        || chr(1),
                 chr(1) || replace(b.pair, ' ', chr(1) || ' ' || chr(1))
                        || chr(1),
                 chr(1) || replace(b.pair, ' ', '') || chr(1)),
               chr(1), '') AS w, v.freq
      FROM {prev} v CROSS JOIN best{rnd} b)"""


_SQL_BPE_TRAIN = (
    "WITH v0 AS (" + _SQL_SPACED_VOCAB + "),"
    + ",".join(_sql_bpe_round(f"v{r - 1}", r)
               for r in range(1, _BPE_ROUNDS + 1))
    + "".join(f"""
    SELECT round, pair, n FROM best{r}
    {'UNION ALL' if r < _BPE_ROUNDS else ''}"""
              for r in range(1, _BPE_ROUNDS + 1))
    + " ORDER BY round")


@query(
    "text_bpe_train_merges",
    survey="north-star text analysis (ITERATIVE BPE tokenizer training: "
           "argmax merge applied to the vocabulary between rounds — the "
           "driver loop `text_bpe_merge_pairs` promises, run for real; "
           "oracle unrolls the same three rounds as CTE stages)",
    oracle=_SQL_BPE_TRAIN,
)
def text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three real BPE training rounds (Sennrich et al. 2016): count
    adjacent symbol pairs over the frequency-weighted VOCABULARY (never
    the token stream), take the (count DESC, pair ASC) argmax, apply it as
    a literal space-removing replace, repeat on the shrunk symbol table.

    Scale: each round is one vocab-sized aggregate (vocab ≪ corpus — the
    corpus is folded into word frequencies once, up front) plus a narrow
    map; the 1-row argmax collect per round is the same bounded driver
    transfer as an ANN centroid fetch. 50k merges over a 10M-word vocab is
    50k tiny jobs on an ever-shrinking table — driver loop cost, not data
    cost. The vocab is localCheckpointed between rounds so round r+1's
    lineage doesn't re-run rounds 1..r."""
    from server2_vector_search_server_spark.functions.text import tokens

    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < _BPE_DOCS)
    spaced = F.array_join(F.split(F.lower(F.col("w")), ""), " ")
    vocab = (docs.select(F.explode(tokens(F.lower(F.col("text"))))
                 .alias("w"))
             .groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
             .select(spaced.alias("w"), "freq")
             .localCheckpoint(eager=False))
    merges = _bpe_train_loop(vocab)
    return spark.createDataFrame(merges, "round long, pair string, n long") \
        .orderBy("round")


def _bpe_train_loop(vocab) -> list[tuple[int, str, int]]:
    """The shared training loop: (round, merged pair, count) per round."""
    merges = []
    for rnd in range(1, _BPE_ROUNDS + 1):
        syms = F.split(F.col("w"), " ")
        pair_expr = F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.concat(F.element_at(syms, i), F.lit(" "),
                               F.element_at(syms, i + 1)))
        best = (vocab.filter(F.size(syms) >= 2)
                .select(F.explode(pair_expr).alias("pair"), "freq")
                .groupBy("pair").agg(F.sum("freq").cast("long").alias("n"))
                .orderBy(F.col("n").desc(), F.col("pair").asc())
                .first())
        merges.append((rnd, best["pair"], int(best["n"])))
        vocab = (vocab.select(
            bpe_apply_merge(F.col("w"), best["pair"]).alias("w"),
            "freq").localCheckpoint(eager=False))
    return merges


_BPE_ENC_DOCS = 50

_SQL_BPE_ENCODE = (
    "WITH v0 AS (" + _SQL_SPACED_VOCAB + "),"
    + ",".join(_sql_bpe_round(f"v{r - 1}", r)
               for r in range(1, _BPE_ROUNDS + 1))
    + f""",
    enc0 AS (
      SELECT doc_id, array_to_string(list_transform(
               range(1, length(t.term) + 1),
               i -> substr(t.term, i, 1)), ' ') AS w
      FROM documents, UNNEST(list_filter(
             string_split_regex(trim(lower(text)), '\\s+'), x -> x <> ''))
           AS t(term)
      WHERE doc_id < {_BPE_ENC_DOCS}),"""
    + ",".join(f"""
    enc{r} AS (
      SELECT doc_id, replace(
               replace(
                 chr(1) || replace(e.w, ' ', chr(1) || ' ' || chr(1))
                        || chr(1),
                 chr(1) || replace(b.pair, ' ', chr(1) || ' ' || chr(1))
                        || chr(1),
                 chr(1) || replace(b.pair, ' ', '') || chr(1)),
               chr(1), '') AS w
      FROM enc{r - 1} e CROSS JOIN best{r} b)"""
                for r in range(1, _BPE_ROUNDS + 1))
    + f"""
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(len(string_split(w, ' '))) AS BIGINT) AS n_subwords
    FROM enc{_BPE_ROUNDS} GROUP BY doc_id ORDER BY doc_id""")


@query(
    "text_bpe_encode_tokens",
    survey="north-star text analysis (BPE tokenizer APPLY: encode the "
           "corpus with the trained merge list — per-doc subword counts, "
           "the token-budget pass every pretraining mix needs)",
    oracle=_SQL_BPE_ENCODE,
)
def text_bpe_encode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The apply side of the tokenizer lifecycle: train the 3-round merge
    list on the corpus vocabulary (same constants as
    ``text_bpe_train_merges``), then ENCODE documents by applying the
    merges in training order to each word's symbol string and counting
    surviving symbols per document. Encoding is a narrow projection — the
    merge list is a handful of literals folded into whole-stage codegen,
    so at 100 TB the encode pass costs one corpus scan regardless of how
    many merges were trained (each merge is a constant-pattern replace,
    composed, not joined). The oracle unrolls train + encode as one CTE
    chain, so the merges the encoder uses are themselves hash-pinned."""
    from server2_vector_search_server_spark.functions.text import tokens

    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < _BPE_DOCS)
    spaced = F.array_join(F.split(F.lower(F.col("w")), ""), " ")
    vocab = (docs.select(F.explode(tokens(F.lower(F.col("text"))))
                 .alias("w"))
             .groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
             .select(spaced.alias("w"), "freq")
             .localCheckpoint(eager=False))
    merges = _bpe_train_loop(vocab)
    enc_docs = tbl(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _BPE_ENC_DOCS)
    words = enc_docs.select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("w"))
    w = F.array_join(F.split(F.col("w"), ""), " ")
    for _, pair, _n in merges:
        w = bpe_apply_merge(w, pair)
    return (words.select("doc_id", F.size(F.split(w, " ")).alias("_n"))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_words"),
                 F.sum("_n").cast("long").alias("n_subwords"))
            .orderBy("doc_id"))


@query(
    "text_readability_flesch",
    survey="north-star text analysis (Flesch-Kincaid readability: "
           "vowel-group syllable estimate, sentence/word/syllable rates, "
           "grade + reading-ease as pure rational expressions)",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                  x -> x <> '')) AS BIGINT) AS n_words,
             GREATEST(CAST(len(regexp_extract_all(text, '[.!?]+'))
                           AS BIGINT), 1) AS n_sentences,
             GREATEST(CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                           AS BIGINT), 1) AS n_syllables
      FROM documents WHERE doc_id < 200)
    SELECT doc_id, n_words, n_sentences, n_syllables,
           ROUND(0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
                 + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words)
                 - 15.59, 4) AS fk_grade,
           ROUND(206.835
                 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                 - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 4)
             AS flesch_ease
    FROM m ORDER BY doc_id
    """,
)
def text_readability_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-Kincaid grade + Flesch reading ease (public formulas) per
    document: words from the whitespace tokenizer, sentences from
    terminal-punctuation runs, syllables estimated as vowel-group count
    (the standard cheap proxy — exact syllabification needs a dictionary).
    Everything is counts and rational literals, so both engines agree
    bit-for-bit; floors of 1 guard punctuation-free / vowel-free degenerate
    docs. A curation pipeline thresholds these alongside the Gopher rules:
    one narrow projection, no shuffle before the per-doc row."""
    from server2_vector_search_server_spark.functions.text import tokens

    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    n_words = F.size(tokens(F.col("text"))).cast("long")
    n_sentences = F.greatest(
        F.regexp_count(F.col("text"), F.lit(r"[.!?]+")).cast("long"),
        F.lit(1).cast("long"))
    n_syllables = F.greatest(
        F.regexp_count(F.lower(F.col("text")), F.lit(r"[aeiouy]+"))
        .cast("long"), F.lit(1).cast("long"))
    m = docs.select("doc_id", n_words.alias("n_words"),
                    n_sentences.alias("n_sentences"),
                    n_syllables.alias("n_syllables"))
    wps = F.col("n_words").cast("double") / F.col("n_sentences")
    spw = F.col("n_syllables").cast("double") / F.col("n_words")
    return (m.select(
        "doc_id", "n_words", "n_sentences", "n_syllables",
        F.round(0.39 * wps + 11.8 * spw - 15.59, 4).alias("fk_grade"),
        F.round(206.835 - 1.015 * wps - 84.6 * spw, 4)
        .alias("flesch_ease"))
        .orderBy("doc_id"))


# --- winnowing fingerprints (MOSS) -----------------------------------------

_WIN_K = 3      # word k-grams
_WIN_W = 4      # winnowing window over the hash stream


def _sql_winnow_sels(max_doc: int) -> str:
    """CTE text: per-doc winnowing selections as STRUCT(pos, fp)[] —
    twin of operators/text_analysis.winnow_fingerprints (same k, w,
    token hash, rightmost-minimum tie rule)."""
    k, w = _WIN_K, _WIN_W
    win_len = f"least({w}, len(h) - p + 1)"
    mn = f"list_min(list_slice(h, p, p + {win_len} - 1))"
    rpos = (f"list_max(list_transform(range(0, {win_len}), "
            f"j -> CASE WHEN h[CAST(p + j AS BIGINT)] = {mn} "
            f"THEN p + j ELSE -1 END))")
    return f"""
    hs AS (
      SELECT doc_id,
             list_transform({sql_token_windows('text', k)},
                            s -> {sql_token_hash('s.win')}) AS h
      FROM documents WHERE doc_id < {max_doc}),
    sel AS (
      SELECT doc_id,
             CASE WHEN len(h) = 0
               THEN CAST([] AS STRUCT(pos BIGINT, fp BIGINT)[])
             ELSE list_transform(
               range(1, (CASE WHEN len(h) >= {w} THEN len(h) - {w - 1}
                         ELSE 1 END) + 1),
               p -> {{'pos': CAST({rpos} AS BIGINT),
                      'fp': CAST({mn} AS BIGINT)}})
             END AS sels
      FROM hs)"""


@query(
    "text_winnowing_fingerprints",
    survey="north-star text analysis (winnowing fingerprint selection — "
           "Schleimer/Wilkerson/Aiken SIGMOD 2003, the MOSS rule: "
           "rightmost minimum per hash window, density 2/(w+1))",
    oracle=f"""
    WITH {_sql_winnow_sels(150)}
    SELECT DISTINCT doc_id, s.pos AS pos, s.fp AS fp
    FROM (SELECT doc_id, unnest(sels) AS s FROM sel)
    ORDER BY doc_id, pos, fp
    """,
)
def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional winnowing fingerprints per document — the selection
    stage of MOSS-style overlap detection. One narrow projection, no
    shuffle: at 100 TB the k-gram hashing and window minima fuse into the
    scan and only the ~2/(w+1)-density selections leave it."""
    docs = (tbl(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < 150)
            .withColumn("_h", ta.positional_kgram_hashes(F.col("text"),
                                                         k=_WIN_K)))
    sels = ta.winnow_select(F.col("_h"), w=_WIN_W)
    return (docs.select("doc_id", F.explode(sels).alias("s"))
            .select("doc_id", F.col("s.pos").alias("pos"),
                    F.col("s.fp").alias("fp"))
            .orderBy("doc_id", "pos", "fp"))


@query(
    "text_winnowing_overlap_pairs",
    survey="north-star dedup-adjacent (document overlap detection via "
           "winnowing-fingerprint equi-join: any shared run of >= w+k-1 "
           "tokens is guaranteed to collide on a selected fingerprint)",
    oracle=f"""
    WITH {_sql_winnow_sels(200)},
    fps AS (
      SELECT DISTINCT doc_id, s.fp AS fp
      FROM (SELECT doc_id, unnest(sels) AS s FROM sel))
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS shared_fps
    FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= 3
    ORDER BY shared_fps DESC, doc_a, doc_b
    """,
)
def text_winnowing_overlap_pairs(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """The MOSS join: distinct (doc, fingerprint) pairs equi-joined on the
    fingerprint, pairs ranked by shared selections. The shuffle is
    proportional to SELECTED fingerprints (2/(w+1) of the k-gram stream),
    not to document pairs — the same no-false-negative contract as the
    prefix-filter Jaccard join but at winnowing's guarantee threshold
    (shared runs >= w+k-1 tokens). Hot fingerprints (boilerplate) bound
    the blowup exactly like LSH bands: a frequency cap on ``fp`` is the
    documented skew valve at scale."""
    docs = (tbl(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < 200)
            .withColumn("_h", ta.positional_kgram_hashes(F.col("text"),
                                                         k=_WIN_K)))
    sels = ta.winnow_select(F.col("_h"), w=_WIN_W)
    fps = (docs.select("doc_id", F.explode(sels).alias("s"))
           .select("doc_id", F.col("s.fp").alias("fp")).distinct())
    a = fps.alias("a")
    b = fps.alias("b")
    return (a.join(b, (F.col("a.fp") == F.col("b.fp"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .groupBy(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"))
            .agg(F.count(F.lit(1)).cast("long").alias("shared_fps"))
            .filter(F.col("shared_fps") >= 3)
            .orderBy(F.col("shared_fps").desc(), "doc_a", "doc_b"))


# --- blocklist multi-pattern matching --------------------------------------

_BL_UNIGRAMS = ("merge", "vector")
_BL_BIGRAMS = ("batch batch", "the fast")
_BL_FLAG_HITS = 5


@query(
    "text_blocklist_matches",
    survey="north-star text analysis (multi-pattern blocklist matching — "
           "C4-style badwords filtering as positional n-gram equi-joins "
           "against a broadcast term table, not a backtracking "
           "alternation regex)",
    oracle=f"""
    WITH terms1(term) AS (VALUES {", ".join(f"('{t}')" for t in _BL_UNIGRAMS)}),
    terms2(term) AS (VALUES {", ".join(f"('{t}')" for t in _BL_BIGRAMS)}),
    g1 AS (
      SELECT doc_id, s.pos AS pos, s.win AS gram
      FROM (SELECT doc_id, unnest({sql_token_windows('lower(text)', 1)}) AS s
            FROM documents WHERE doc_id < 300)),
    g2 AS (
      SELECT doc_id, s.pos AS pos, s.win AS gram
      FROM (SELECT doc_id, unnest({sql_token_windows('lower(text)', 2)}) AS s
            FROM documents WHERE doc_id < 300)),
    m AS (
      SELECT doc_id, pos, term FROM g1 JOIN terms1 ON gram = term
      UNION ALL
      SELECT doc_id, pos, term FROM g2 JOIN terms2 ON gram = term)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits,
           CAST(COUNT(DISTINCT term) AS BIGINT) AS n_terms,
           CAST(SUM(pos) AS BIGINT) AS pos_sum,
           string_agg(DISTINCT term, ',' ORDER BY term) AS terms_csv,
           COUNT(*) >= {_BL_FLAG_HITS} AS flagged
    FROM m GROUP BY doc_id ORDER BY doc_id
    """,
)
def text_blocklist_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist scan over the corpus: every occurrence (with position) of
    every listed term — two single words and two 2-word phrases — found by
    exploding positional n-grams once per distinct phrase length and
    equi-joining the broadcast term table. Per-document fold: occurrence
    count, distinct terms (sorted CSV — list cells don't hash), exact
    position sum, and the flag verdict. The list scales without plan
    growth (it's join DATA, not expression text), unlike an alternation
    regex."""
    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    hits = ta.blocklist_matches(
        docs, list(_BL_UNIGRAMS) + list(_BL_BIGRAMS))
    return (hits.groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_hits"),
                 F.count_distinct("term").cast("long").alias("n_terms"),
                 F.sum("pos").cast("long").alias("pos_sum"),
                 F.concat_ws(",", F.sort_array(F.collect_set("term")))
                 .alias("terms_csv"),
                 (F.count(F.lit(1)) >= _BL_FLAG_HITS).alias("flagged"))
            .orderBy("doc_id"))


@query(
    "text_vocab_coverage",
    survey="north-star text analysis (vocabulary coverage curve: token-"
           "stream fraction covered by the top-N frequency-ranked terms — "
           "the tokenizer-budget / OOV-rate planning query)",
    oracle="""
    WITH toks AS (
      SELECT t.term
      FROM (SELECT lower(text) AS text FROM documents) d,
           UNNEST(list_filter(string_split_regex(trim(d.text), '\\s+'),
                              x -> x <> '')) AS t(term)),
    tf AS (SELECT term, COUNT(*) AS cnt FROM toks GROUP BY term),
    ranked AS (
      SELECT term, cnt,
             row_number() OVER (ORDER BY cnt DESC, term ASC) AS rnk,
             SUM(cnt) OVER (ORDER BY cnt DESC, term ASC
                            ROWS UNBOUNDED PRECEDING) AS cum
      FROM tf),
    total AS (SELECT SUM(cnt) AS tot FROM tf)
    SELECT r.rnk AS top_n, r.term AS boundary_term,
           CAST(r.cum AS BIGINT) AS covered_tokens,
           CAST(t.tot AS BIGINT) AS total_tokens,
           ROUND(CAST(r.cum AS DOUBLE) / t.tot, 6) AS coverage
    FROM ranked r CROSS JOIN total t
    WHERE r.rnk IN (5, 10, 20)
    ORDER BY top_n
    """,
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative coverage of the token stream by the top-N most frequent
    terms (ties rank alphabetically on both engines). Two shuffles: the
    term-frequency groupBy (map-side combinable) and ONE single-partition
    window over the VOCABULARY — safe at any corpus scale because the
    window input is distinct terms, not tokens; a 100 TB corpus still has
    a vocabulary that fits one partition after the tf fold (and if it
    didn't, the standard two-pass range-partitioned prefix sum —
    ``text_sequence_packing_distributed`` — applies)."""
    from pyspark.sql import Window

    docs = tbl(spark, sf_dir, "documents")
    tf = (docs.select(F.explode(tokens(F.lower(F.col("text"))))
                      .alias("term"))
          .groupBy("term").agg(F.count(F.lit(1)).alias("cnt")))
    w = Window.orderBy(F.col("cnt").desc(), F.col("term").asc())
    ranked = (tf.withColumn("rnk", F.row_number().over(w))
              .withColumn("cum", F.sum("cnt").over(
                  w.rowsBetween(Window.unboundedPreceding, 0))))
    total = tf.agg(F.sum("cnt").alias("tot"))
    return (ranked.filter(F.col("rnk").isin(5, 10, 20))
            .crossJoin(total)
            .select(F.col("rnk").alias("top_n"),
                    F.col("term").alias("boundary_term"),
                    F.col("cum").cast("long").alias("covered_tokens"),
                    F.col("tot").cast("long").alias("total_tokens"),
                    F.round(F.col("cum").cast("double") / F.col("tot"), 6)
                    .alias("coverage"))
            .orderBy("top_n"))


@query(
    "text_rake_keyphrases",
    survey="north-star text analysis (RAKE keyphrase extraction, Rose et "
           "al. 2010: stopword-delimited candidate phrases scored by "
           "corpus-wide word degree/frequency)",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, lower(text) AS text FROM documents WHERE doc_id < 200),
    tok AS (
      SELECT doc_id, s.pos AS pos, s.win AS word
      FROM (SELECT doc_id, unnest({sql_token_windows('text', 1)}) AS s
            FROM docs)),
    flagged AS (
      SELECT doc_id, pos, word,
             CASE WHEN word IN ({", ".join(f"'{w}'" for w in ta.STOPWORDS['en'])})
                  THEN 1 ELSE 0 END AS st
      FROM tok),
    grp AS (
      SELECT *, SUM(st) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS UNBOUNDED PRECEDING) AS g
      FROM flagged),
    cand AS (SELECT doc_id, g, pos, word FROM grp WHERE st = 0),
    plen AS (
      SELECT doc_id, g, COUNT(*) AS wlen FROM cand GROUP BY doc_id, g),
    cw AS (
      SELECT c.doc_id, c.g, c.pos, c.word, p.wlen
      FROM cand c JOIN plen p USING (doc_id, g)),
    ws AS (
      SELECT word, COUNT(*) AS freq, SUM(wlen) AS deg
      FROM cw GROUP BY word),
    scored AS (
      SELECT cw.doc_id, cw.g,
             CAST(ROUND(CAST(ws.deg AS DOUBLE) / ws.freq * 1000000.0)
                  AS BIGINT) AS sm
      FROM cw JOIN ws USING (word)),
    pscore AS (
      SELECT doc_id, g, SUM(sm) AS score_micro
      FROM scored GROUP BY doc_id, g),
    ptext AS (
      SELECT doc_id, g, string_agg(word, ' ' ORDER BY pos) AS phrase
      FROM cand GROUP BY doc_id, g),
    ranked AS (
      SELECT t.doc_id, t.phrase, s.score_micro,
             row_number() OVER (PARTITION BY t.doc_id
                                ORDER BY s.score_micro DESC,
                                         t.phrase ASC) AS rank
      FROM ptext t JOIN pscore s USING (doc_id, g))
    SELECT doc_id, CAST(rank AS BIGINT) AS rank, phrase,
           ROUND(CAST(score_micro AS DOUBLE) / 1000000.0, 6) AS score
    FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank
    """,
)
def text_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 RAKE keyphrases per document over the English stopword
    delimiters — the zero-model keyphrase extractor every curation
    pipeline can afford at corpus scale."""
    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    out = ta.rake_keyphrases(docs, stopwords=ta.STOPWORDS["en"], top_k=3)
    return out.withColumn("rank", F.col("rank").cast("long"))


# ---------------------------------------------------------------------------
# Zipf rank-frequency fit

_ZIPF_TOP = 50
_ZIPF_SCALE = 1_000_000


@query(
    "text_zipf_fit",
    survey="text extension(Zipf law rank-frequency diagnostic: log-log "
           "OLS slope/intercept/R^2 over the top-50 vocabulary, exact "
           "integer-scaled normal equations — the corpus-health check "
           "for synthetic/natural text mix)",
    oracle=f"""
    WITH toks AS (
      SELECT t.term FROM documents,
             UNNEST(list_filter(string_split_regex(trim(text), '\\s+'),
                                x -> x <> '')) AS t(term)),
    freq AS (SELECT term, COUNT(*) AS f FROM toks GROUP BY term),
    ranked AS (
      SELECT f, row_number() OVER (ORDER BY f DESC, term) AS r
      FROM freq),
    pts AS (
      SELECT CAST(ROUND(ROUND(ln(CAST(r AS DOUBLE)), 9) * {_ZIPF_SCALE})
                  AS BIGINT) AS x,
             CAST(ROUND(ROUND(ln(CAST(f AS DOUBLE)), 9) * {_ZIPF_SCALE})
                  AS BIGINT) AS y
      FROM ranked WHERE r <= {_ZIPF_TOP}),
    s AS (
      SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
      FROM pts)
    SELECT CAST(n AS BIGINT) AS n_terms,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
           ROUND((CAST(sy AS DOUBLE)
                  - CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE) / {_ZIPF_SCALE}.0, 6) AS intercept,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 * CAST(n * sxy - sx * sy AS DOUBLE)
                 / (CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r2
    FROM s
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law diagnostic: OLS of ln(frequency) on ln(rank) over the
    top-50 terms. Natural corpora fit slope near -1; a flat slope flags
    templated/synthetic text — a cheap corpus-health gate before
    training-mix decisions.

    Scale shape: one term-count shuffle (vocabulary-sized); the ranked
    top-50 window runs on the vocabulary aggregate, and the normal
    equations fold EXACT integer-scaled log points, so slope/intercept/R^2
    divide identical BIGINTs on both engines (the ACF identity pattern).
    Intercept is computed from the same integer sums as the slope —
    no second regression pass."""
    from server2_vector_search_server_spark.functions.text import tokens
    from pyspark.sql import Window

    docs = tbl(spark, sf_dir, "documents")
    freq = (docs.select(F.explode(tokens(F.col("text"))).alias("term"))
            .groupBy("term").agg(F.count(F.lit(1)).alias("f")))
    ranked = freq.withColumn(
        "r", F.row_number().over(Window.orderBy(F.col("f").desc(), "term")))
    pts = (ranked.filter(F.col("r") <= _ZIPF_TOP)
           .select(
        F.round(F.round(F.log(F.col("r").cast("double")), 9)
                * _ZIPF_SCALE).cast("long").alias("x"),
        F.round(F.round(F.log(F.col("f").cast("double")), 9)
                * _ZIPF_SCALE).cast("long").alias("y")))
    s = pts.agg(F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("x").alias("sx"), F.sum("y").alias("sy"),
                F.sum(F.col("x") * F.col("y")).alias("sxy"),
                F.sum(F.col("x") * F.col("x")).alias("sxx"),
                F.sum(F.col("y") * F.col("y")).alias("syy"))
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    deny = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    slope = num.cast("double") / den.cast("double")
    return s.select(
        F.col("n").alias("n_terms"),
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy").cast("double")
                 - slope * F.col("sx").cast("double"))
                / F.col("n").cast("double") / float(_ZIPF_SCALE), 6)
        .alias("intercept"),
        F.round(num.cast("double") * num.cast("double")
                / (den.cast("double") * deny.cast("double")), 6)
        .alias("r2"))


# ---------------------------------------------------------------------------
# Unigram-LM Viterbi tokenization (SentencePiece-style segmentation)

_UVT_MAX_WORD = 12     # DP depth cap (unrolled in the oracle)
_UVT_MAX_PIECE = 4
_UVT_TOP_MULTI = 20
_UVT_SCALE = 1_000_000


def _sql_unigram_viterbi() -> str:
    toks = ("SELECT t.term FROM documents, UNNEST(list_filter("
            "string_split_regex(trim(text), '\\s+'), x -> x <> '')) "
            "AS t(term)")
    head = f"""
    toks AS MATERIALIZED ({toks}),
    words AS MATERIALIZED (
      SELECT DISTINCT term AS word FROM toks
      WHERE length(term) <= {_UVT_MAX_WORD}),
    chars AS MATERIALIZED (
      SELECT substr(term, i.i, 1) AS piece, COUNT(*) AS cnt
      FROM toks, UNNEST(range(1, length(term) + 1)) AS i(i)
      GROUP BY 1),
    t AS (SELECT SUM(cnt) AS t FROM chars),
    multi AS MATERIALIZED (
      SELECT piece, cnt FROM (
        SELECT piece, cnt,
               row_number() OVER (ORDER BY cnt DESC, piece) AS rn
        FROM (
          SELECT substr(term, i.i, l.l) AS piece, COUNT(*) AS cnt
          FROM toks,
               UNNEST(range(2, {_UVT_MAX_PIECE + 1})) AS l(l),
               UNNEST(range(1, length(term) + 1)) AS i(i)
          WHERE i.i + l.l - 1 <= length(term)
          GROUP BY 1))
      WHERE rn <= {_UVT_TOP_MULTI}),
    vocab AS MATERIALIZED (
      SELECT piece,
             CAST(ROUND(ROUND(ln(CAST(cnt AS DOUBLE) / CAST(t.t AS DOUBLE)),
                              9) * {_UVT_SCALE}) AS BIGINT) AS score
      FROM (SELECT * FROM chars UNION ALL SELECT * FROM multi), t),
    dp0 AS MATERIALIZED (
      SELECT word, CAST(0 AS BIGINT) AS best FROM words)"""
    parts = [head]
    for i in range(1, _UVT_MAX_WORD + 1):
        branches = []
        for j in range(max(0, i - _UVT_MAX_PIECE), i):
            branches.append(f"""
        SELECT d.word, {j} AS j, d.best + v.score AS val
        FROM dp{j} d JOIN vocab v
          ON v.piece = substr(d.word, {j + 1}, {i - j})
        WHERE length(d.word) >= {i}""")
        parts.append(f"""
    cand{i} AS MATERIALIZED ({" UNION ALL ".join(branches)}),
    dp{i} AS MATERIALIZED (
      SELECT word, MAX(val) AS best FROM cand{i} GROUP BY word),
    bj{i} AS MATERIALIZED (
      SELECT word, {i} AS i, j FROM (
        SELECT word, j, row_number() OVER (PARTITION BY word
                       ORDER BY val DESC, j ASC) AS rn
        FROM cand{i}) WHERE rn = 1)""")
    allbj = " UNION ALL ".join(
        f"SELECT * FROM bj{i}" for i in range(1, _UVT_MAX_WORD + 1))
    alldp = " UNION ALL ".join(
        f"SELECT word, {i} AS i, best FROM dp{i}"
        for i in range(1, _UVT_MAX_WORD + 1))
    parts.append(f"""
    allbj AS MATERIALIZED ({allbj}),
    final_dp AS MATERIALIZED (
      SELECT d.word, d.best FROM ({alldp}) d
      JOIN words w ON w.word = d.word AND d.i = length(w.word)),
    p0 AS MATERIALIZED (
      SELECT word, length(word) AS i FROM words)""")
    for k in range(1, _UVT_MAX_WORD + 1):
        parts.append(f"""
    p{k} AS MATERIALIZED (
      SELECT p.word, b.j AS i,
             substr(p.word, b.j + 1, p.i - b.j) AS piece
      FROM p{k - 1} p JOIN allbj b ON b.word = p.word AND b.i = p.i
      WHERE p.i > 0)""")
    allp = " UNION ALL ".join(
        f"SELECT word, {k} AS k, piece FROM p{k}"
        for k in range(1, _UVT_MAX_WORD + 1))
    parts.append(f"""
    segs AS (
      SELECT word, COUNT(*) AS n_pieces,
             string_agg(piece, '|' ORDER BY k DESC) AS seg
      FROM ({allp}) GROUP BY word)
    SELECT s.word, CAST(s.n_pieces AS BIGINT) AS n_pieces, s.seg,
           ROUND(f.best / {_UVT_SCALE}.0, 6) AS score
    FROM segs s JOIN final_dp f ON f.word = s.word
    ORDER BY s.word""")
    return "WITH " + ",".join(parts)


@query(
    "text_unigram_viterbi_tokenize",
    survey="north-star text analysis (unigram-LM tokenization: Viterbi "
           "segmentation of each word under a corpus-fit piece "
           "vocabulary — the SentencePiece/Kudo-2018 decoding step, "
           "completing the tokenizer family next to BPE train/encode; "
           "integer-only DP, segmentation string and score hash-exact)",
    oracle=_sql_unigram_viterbi(),
)
def text_unigram_viterbi_tokenize(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Unigram-LM (SentencePiece-style) tokenization: fit piece scores
    ln(count/total) over the corpus (all single chars + the top-20
    frequent 2..4-char substrings), then Viterbi-segment each distinct
    word to the maximum-likelihood piece sequence. Ties break to the
    smallest split point — deterministic on both engines.

    Scale shape: vocabulary fitting is the data-proportional part — two
    substring-explode shuffles bounded by token-stream length x piece
    width; scores round to micro-units ENGINE-side before the bounded
    (<= singles + 20 rows) vocabulary is collected and broadcast. The
    segmentation pass is an Arrow-batched pandas UDF over the DISTINCT
    word table (vocabulary-sized here; millions of rows at corpus scale
    — still a single scan) running pure INTEGER DP, so no Python float
    rounding exists anywhere (ROUND_NOTES parity rule). The oracle
    unrolls the same DP level-by-level (MATERIALIZED CTEs, the Markov
    discipline) including backpointer reconstruction."""
    import pandas as pd

    from pyspark.sql import Window
    from server2_vector_search_server_spark.functions.text import tokens

    docs = tbl(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("term"))
    # ONE substring explode covers every piece length 1..4 (two separate
    # explode+shuffle passes measured ~2x this cost at sf0.1).
    # sequence(1, 0) DESCENDS in Spark (auto step -1) — words shorter than
    # the piece length must fan out to an EMPTY array, not bogus indices
    pieces = (toks.select(F.explode(F.expr(
        f"flatten(transform(sequence(1, {_UVT_MAX_PIECE}), l -> "
        f"case when length(term) >= l then "
        f"transform(sequence(1, length(term) - l + 1), "
        f"i -> substr(term, i, l)) else array() end))")).alias("piece"))
        .groupBy("piece").agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True))          # vocabulary-sized
    chars = pieces.filter(F.length("piece") == 1)
    tot = chars.agg(F.sum("cnt").alias("t"))
    multi = (pieces.filter(F.length("piece") >= 2).withColumn(
        "rn", F.row_number().over(Window.orderBy(F.col("cnt").desc(),
                                                 "piece")))
        .filter(F.col("rn") <= _UVT_TOP_MULTI).drop("rn"))
    vocab_rows = (chars.unionByName(multi).join(F.broadcast(tot))
                  .select("piece",
                          F.round(F.round(
                              F.log(F.col("cnt").cast("double")
                                    / F.col("t").cast("double")), 9)
                              * _UVT_SCALE).cast("long").alias("score"))
                  .collect())                       # bounded: chars + 20
    scores = {r["piece"]: r["score"] for r in vocab_rows}
    bscores = spark.sparkContext.broadcast(scores)
    max_piece = _UVT_MAX_PIECE

    def segment(batches):
        sc = bscores.value
        for pdf in batches:
            out = {"word": [], "n_pieces": [], "seg": [],
                   "score_micro": []}
            for w in pdf["word"]:
                L = len(w)
                best = [None] * (L + 1)
                bj = [0] * (L + 1)
                best[0] = 0
                for i in range(1, L + 1):
                    for j in range(max(0, i - max_piece), i):
                        if best[j] is None:
                            continue
                        s = sc.get(w[j:i])
                        if s is None:
                            continue
                        v = best[j] + s
                        if best[i] is None or v > best[i]:
                            best[i], bj[i] = v, j
                pieces = []
                i = L
                while i > 0:
                    pieces.append(w[bj[i]:i])
                    i = bj[i]
                pieces.reverse()
                out["word"].append(w)
                out["n_pieces"].append(len(pieces))
                out["seg"].append("|".join(pieces))
                out["score_micro"].append(best[L])
            yield pd.DataFrame(out)

    words = (toks.select(F.col("term").alias("word")).distinct()
             .filter(F.length("word") <= _UVT_MAX_WORD))
    segged = words.mapInPandas(
        segment, "word string, n_pieces long, seg string, score_micro long")
    return (segged.select("word", "n_pieces", "seg",
                          F.round(F.col("score_micro") / float(_UVT_SCALE),
                                  6).alias("score"))
            .orderBy("word"))


# ---------------------------------------------------------------------------
# Entropy-based secret scanning

_SECRET_MIN_LEN = 8
_SECRET_H_MICRO = 2_600_000      # ~ln(13.5) nats: high-entropy threshold


@query(
    "text_secret_scan",
    survey="north-star text analysis (secret/credential scanning: "
           "Shannon character entropy per token over planted key-like "
           "strings — the pre-training PII/secret filter next to "
           "text_pii_redaction; exact micro-unit entropy)",
    oracle=f"""
    WITH docs2 AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN
               text || ' sk' || 'live' || substr(md5(CAST(doc_id AS
                 VARCHAR)), 1, 24)
             ELSE text END AS text
      FROM documents),
    toks AS (
      SELECT doc_id, t.term FROM docs2,
             UNNEST(list_filter(string_split_regex(trim(text), '\\s+'),
                                x -> x <> '')) AS t(term)
      WHERE length(t.term) >= {_SECRET_MIN_LEN}),
    cf AS (
      SELECT doc_id, term, substr(term, i.i, 1) AS ch
      FROM toks, UNNEST(range(1, length(term) + 1)) AS i(i)),
    ent AS (
      SELECT doc_id, term,
             SUM(CAST(ROUND(ROUND(
                   -(CAST(c AS DOUBLE) / CAST(len AS DOUBLE))
                   * ln(CAST(c AS DOUBLE) / CAST(len AS DOUBLE)), 9)
                 * 1000000) AS BIGINT)) AS h_micro
      FROM (SELECT doc_id, term, ch, COUNT(*) AS c,
                   length(term) AS len
            FROM cf GROUP BY doc_id, term, ch, length(term))
      GROUP BY doc_id, term)
    SELECT doc_id, term AS flagged_token,
           ROUND(h_micro / 1000000.0, 6) AS entropy_nats
    FROM ent WHERE h_micro >= {_SECRET_H_MICRO}
    ORDER BY doc_id, flagged_token
    """,
)
def text_secret_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Secret/credential detection by character-level Shannon entropy —
    the standard heuristic (truffleHog-style) for catching API keys and
    tokens that regex PII rules miss: random-looking strings have near-
    maximal char entropy while natural words sit far lower. Every 5th doc
    gets a planted 24-hex 'sk-live…' credential, so the filter provably
    fires and the oracle reproduces the exact flag set.

    Scale shape: one projection fans tokens to characters (bounded by
    text length), two partial-aggregable groupBys compute per-token char
    distributions and entropy as exact micro-unit sums — no UDF, no
    regex catalog to maintain; the length >= 8 prefilter prunes the fan-
    out before it happens (pushed into the same scan)."""
    docs = tbl(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.col("text"), F.lit(" sk"), F.lit("live"),
                        F.substring(F.md5(F.col("doc_id").cast("string")),
                                    1, 24)))
        .otherwise(F.col("text")).alias("text"))
    from server2_vector_search_server_spark.functions.text import tokens
    toks = (planted.select("doc_id",
                           F.explode(tokens(F.col("text"))).alias("term"))
            .filter(F.length("term") >= _SECRET_MIN_LEN))
    cf = (toks.select("doc_id", "term",
                      F.explode(F.split("term", "")).alias("ch"))
          .filter(F.col("ch") != "")
          .groupBy("doc_id", "term", "ch")
          .agg(F.count(F.lit(1)).alias("c")))
    p = F.col("c").cast("double") / F.length("term").cast("double")
    ent = (cf.select("doc_id", "term",
                     F.round(F.round(-p * F.log(p), 9) * 1_000_000)
                     .cast("long").alias("hc"))
           .groupBy("doc_id", "term")
           .agg(F.sum("hc").alias("h_micro")))
    return (ent.filter(F.col("h_micro") >= _SECRET_H_MICRO)
            .select("doc_id", F.col("term").alias("flagged_token"),
                    F.round(F.col("h_micro") / 1_000_000.0, 6)
                    .alias("entropy_nats"))
            .orderBy("doc_id", "flagged_token"))


# ---------------------------------------------------------------------------
# Repeated n-gram masking (memorization guard)

_RNM_N = 5           # gram width
_RNM_K = 3           # corpus occurrences above which a gram is masked
_RNM_DOCS = 200


@query(
    "text_repeated_ngram_mask",
    survey="north-star text analysis (repeated-n-gram masking: every "
           "token covered by a 5-gram occurring > 3 times corpus-wide is "
           "masked — the memorization guard complementary to ExactSubstr "
           "dedup, which DROPS spans; masking keeps the document)",
    oracle=f"""
    WITH docs2 AS (
      SELECT doc_id, text FROM documents WHERE doc_id < {_RNM_DOCS}),
    arr AS (
      SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'),
                                 x -> x <> '') AS a
      FROM docs2),
    toks AS (
      -- no UNNEST WITH ORDINALITY in DuckDB: index via range (ROUND_NOTES)
      SELECT doc_id, p.pos, a[p.pos] AS term
      FROM arr, UNNEST(range(1, len(a) + 1)) AS p(pos)),
    grams AS (
      SELECT a.doc_id, a.pos AS start,
             a.term || ' ' || b1.term || ' ' || b2.term || ' '
               || b3.term || ' ' || b4.term AS gram
      FROM toks a
      JOIN toks b1 ON b1.doc_id = a.doc_id AND b1.pos = a.pos + 1
      JOIN toks b2 ON b2.doc_id = a.doc_id AND b2.pos = a.pos + 2
      JOIN toks b3 ON b3.doc_id = a.doc_id AND b3.pos = a.pos + 3
      JOIN toks b4 ON b4.doc_id = a.doc_id AND b4.pos = a.pos + 4),
    hot AS (
      SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) > {_RNM_K}),
    covered AS (
      SELECT DISTINCT g.doc_id, g.start + o.o AS pos
      FROM grams g JOIN hot h ON h.gram = g.gram,
           UNNEST(range(0, {_RNM_N})) AS o(o)),
    masked AS (
      SELECT t.doc_id, t.pos,
             CASE WHEN c.pos IS NOT NULL THEN '<m>' ELSE t.term END AS tok,
             CASE WHEN c.pos IS NOT NULL THEN 1 ELSE 0 END AS is_masked
      FROM toks t LEFT JOIN covered c
        ON c.doc_id = t.doc_id AND c.pos = t.pos)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(is_masked) AS BIGINT) AS n_masked,
           md5(string_agg(tok, ' ' ORDER BY pos)) AS masked_text_hash
    FROM masked GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def text_repeated_ngram_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-n-gram masking: tokens covered by any 5-gram that occurs
    more than 3 times corpus-wide are replaced with a mask token — the
    loss-masking treatment for boilerplate/memorization spans when
    dropping whole documents (dedup) is too blunt. The rebuilt masked
    text is pinned byte-exactly via md5 (the pii_redaction discipline).

    Scale shape: grams come from ONE positional explode + in-array window
    (no positional self-joins — the oracle's join chain is for SQL
    clarity); the hot set is a corpus-wide gram count > K (shuffle keyed
    by gram, partial-aggregable) joined back by equi-key; coverage
    positions explode from matched grams only. Same plan family as
    ExactSubstr (dedup_substring_spans) — this variant masks instead of
    dropping."""
    from server2_vector_search_server_spark.functions.text import tokens

    docs = (tbl(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < _RNM_DOCS))
    toks = docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos0", "term"))
    toks = toks.select("doc_id", (F.col("pos0") + 1).alias("pos"), "term")
    # grams in-array: one pass, no self-join
    grams = (docs.select(
        "doc_id",
        F.explode(F.expr(
            f"case when size(filter(split(trim(text), '\\\\s+'), "
            f"x -> x != '')) >= {_RNM_N} then "
            f"transform(sequence(1, size(filter(split(trim(text), "
            f"'\\\\s+'), x -> x != '')) - {_RNM_N - 1}), i -> "
            f"struct(i as start, concat_ws(' ', slice(filter(split("
            f"trim(text), '\\\\s+'), x -> x != ''), i, {_RNM_N})) as gram))"
            f" else array() end")).alias("g"))
        .select("doc_id", "g.start", "g.gram"))
    hot = (grams.groupBy("gram").agg(F.count(F.lit(1)).alias("c"))
           .filter(F.col("c") > _RNM_K).select("gram"))
    covered = (grams.join(hot, "gram")
               .select("doc_id",
                       F.explode(F.sequence(
                           F.col("start"),
                           F.col("start") + _RNM_N - 1)).alias("pos"))
               .distinct())
    masked = (toks.join(covered.withColumn("m", F.lit(1)),
                        ["doc_id", "pos"], "left")
              .select("doc_id", "pos",
                      F.when(F.col("m").isNotNull(), "<m>")
                      .otherwise(F.col("term")).alias("tok"),
                      F.coalesce("m", F.lit(0)).alias("is_masked")))
    return (masked.groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_tokens"),
                 F.sum("is_masked").cast("long").alias("n_masked"),
                 F.md5(F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.struct("pos", "tok"))),
                         lambda s: s["tok"]), " ")).alias("masked_text_hash"))
            .orderBy("doc_id"))


# ---------------------------------------------------------------------------
# Deterministic negative-sampling draws (unigram^0.75 table)

_NS_DRAWS = 1000
_NS_POW = 0.75
_NS_HEX = 12     # 48-bit uniforms

_SQL_NS_U48 = ("(" + " + ".join(
    f"(strpos('0123456789abcdef', substr(md5('ns' || CAST(d AS VARCHAR)), "
    f"{i + 1}, 1)) - 1) * {16 ** (11 - i)}"
    for i in range(_NS_HEX)) + ")")


@query(
    "text_negative_sampling_draws",
    survey="training extension(word2vec-style negative sampling: "
           "unigram^0.75 cumulative table + md5-uniform draws resolved "
           "by an interval join — the training-data sampler made "
           "deterministic, draw assignments hash-exact)",
    oracle=f"""
    WITH toks AS (
      SELECT t.term FROM documents,
             UNNEST(list_filter(string_split_regex(trim(text), '\\s+'),
                                x -> x <> '')) AS t(term)),
    freq AS (SELECT term, COUNT(*) AS cnt FROM toks GROUP BY term),
    w AS (
      SELECT term,
             CAST(ROUND(ROUND(pow(CAST(cnt AS DOUBLE), {_NS_POW}), 9)
                        * 1000000) AS BIGINT) AS wt
      FROM freq),
    cum AS (
      SELECT term, wt,
             COALESCE(SUM(wt) OVER (ORDER BY term
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS lo
      FROM w),
    tot AS (SELECT SUM(wt) AS total FROM w),
    draws AS (
      SELECT d.d, {_SQL_NS_U48} % tot.total AS v
      FROM UNNEST(range(0, {_NS_DRAWS})) AS d(d), tot),
    assigned AS (
      SELECT c.term FROM draws dr JOIN cum c
        ON dr.v >= c.lo AND dr.v < c.lo + c.wt)
    SELECT a.term, CAST(COUNT(*) AS BIGINT) AS n_drawn,
           ROUND({_NS_DRAWS}.0 * w.wt / tot.total, 6) AS expected
    FROM assigned a JOIN w ON w.term = a.term CROSS JOIN tot
    GROUP BY a.term, w.wt, tot.total
    ORDER BY n_drawn DESC, a.term LIMIT 30
    """,
)
def text_negative_sampling_draws(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """word2vec negative sampling (Mikolov et al. 2013): draw noise words
    proportional to count^0.75 — implemented as the cumulative-interval
    table + uniform-draw INTERVAL JOIN, with md5 uniforms instead of an
    RNG so both engines materialize identical draws and the sampler is
    hash-verified end-to-end (the bootstrap-CI discipline applied to the
    training sampler).

    Scale shape: the cumulative table is vocabulary-sized (window over
    the aggregate, bounded); draws are generated (no scan) and resolved
    against the BROADCAST interval table — with a huge vocabulary the
    resolve becomes the bucketed range join (events_range_join_counts
    pattern: quantized interval keys + residual predicate), never a
    nested-loop over draws x vocab."""
    from pyspark.sql import Window
    from server2_vector_search_server_spark.functions.text import tokens

    docs = tbl(spark, sf_dir, "documents")
    freq = (docs.select(F.explode(tokens(F.col("text"))).alias("term"))
            .groupBy("term").agg(F.count(F.lit(1)).alias("cnt")))
    w = freq.select(
        "term",
        F.round(F.round(F.pow(F.col("cnt").cast("double"), _NS_POW), 9)
                * 1_000_000).cast("long").alias("wt"))
    cum = w.withColumn(
        "lo", F.coalesce(
            F.sum("wt").over(Window.orderBy("term")
                             .rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0)))
    tot = w.agg(F.sum("wt").alias("total"))
    u48 = sum((F.conv(F.substring(F.md5(F.concat(F.lit("ns"),
                                                 F.col("d").cast("string"))),
                                  i + 1, 1), 16, 10).cast("long")
               * (16 ** (11 - i)) for i in range(12)),
              F.lit(0).cast("long"))
    draws = (spark.range(_NS_DRAWS).select(F.col("id").alias("d"))
             .join(F.broadcast(tot))
             .select((u48 % F.col("total")).alias("v")))
    assigned = draws.join(
        F.broadcast(cum),
        (F.col("v") >= F.col("lo")) & (F.col("v") < F.col("lo")
                                       + F.col("wt")))
    return (assigned.groupBy("term", "wt")
            .agg(F.count(F.lit(1)).cast("long").alias("n_drawn"))
            .join(F.broadcast(tot))
            .select("term", "n_drawn",
                    F.round(F.lit(float(_NS_DRAWS)) * F.col("wt")
                            / F.col("total"), 6).alias("expected"))
            .orderBy(F.col("n_drawn").desc(), "term").limit(30))


# ---------------------------------------------------------------------------
# Delta-gap compressed posting lists

@query(
    "text_inverted_index_delta_gaps",
    survey="north-star retrieval infrastructure (index compression: "
           "posting lists stored as delta gaps — first id + successive "
           "differences; reconstruction invariant and byte-count saving "
           "hash-pinned)",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct(
        list_filter(string_split_regex(trim(text), '\\s+'),
                    x -> x <> ''))) AS term
      FROM documents WHERE doc_id < 300),
    postings AS (
      SELECT term, list_sort(list(doc_id)) AS ids,
             CAST(COUNT(*) AS BIGINT) AS df
      FROM toks GROUP BY term HAVING COUNT(*) >= 50),
    gapped AS (
      SELECT term, df, ids,
             [ids[1]] || list_transform(range(2, len(ids) + 1),
                                        i -> ids[i] - ids[i - 1]) AS gaps
      FROM postings)
    SELECT term, df,
           array_to_string(gaps, ',') AS gap_list,
           (list_sum(gaps) = ids[len(ids)]) AS reconstructs_max_id,
           CAST(length(array_to_string(ids, ',')) AS BIGINT) AS raw_bytes,
           CAST(length(array_to_string(gaps, ',')) AS BIGINT) AS gap_bytes
    FROM gapped
    ORDER BY term
    """,
)
def text_inverted_index_delta_gaps(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Posting-list delta compression — the representation every real
    inverted index serializes (gaps are small, so varint/PForDelta bytes
    shrink ~3-10x): sorted postings become first-id + successive gaps,
    with the telescoping-sum invariant sum(gaps) = max(id) pinned per
    term and the textual byte saving reported (the CSV proxy for varint
    width — gap digits are what varint encodes).

    Scale shape: identical physics to text_inverted_index (one term-keyed
    shuffle); the gap transform is a pure in-array expression over each
    posting — no second pass, no window."""
    from server2_vector_search_server_spark.functions.text import tokens

    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(tokens(F.col("text")))).alias("term"))
    postings = (toks.groupBy("term")
                .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"),
                     F.count(F.lit(1)).cast("long").alias("df"))
                .filter(F.col("df") >= 50))
    gaps = F.concat(
        F.array(F.element_at("ids", 1)),
        F.expr("transform(sequence(2, size(ids)), "
               "i -> element_at(ids, i) - element_at(ids, i - 1))"))
    gapped = postings.withColumn("gaps", gaps)
    join_ids = F.array_join(F.transform(
        F.col("ids"), lambda x: x.cast("string")), ",")
    join_gaps = F.array_join(F.transform(
        F.col("gaps"), lambda x: x.cast("string")), ",")
    return (gapped.select(
        "term", "df",
        join_gaps.alias("gap_list"),
        (F.aggregate("gaps", F.lit(0).cast("long"),
                     lambda acc, x: acc + x)
         == F.element_at("ids", F.size("ids"))).alias("reconstructs_max_id"),
        F.length(join_ids).cast("long").alias("raw_bytes"),
        F.length(join_gaps).cast("long").alias("gap_bytes"))
        .orderBy("term"))


# ---------------------------------------------------------------------------
# Distributed bigram LM counts + interpolated Kneser-Ney

_KN_DOCS = 300
_KN_DISCOUNT = "0.75"   # Chen & Goodman 1998's fixed absolute discount
_KN_TOPK = 25

# lowercased twin of the canonical _SQL_TOKS tokenizer (single source of
# truth — code-review r8: an inlined copy would silently diverge if the
# canonical tokenization ever changes)
_SQL_KN_TOKS = f"list_transform({_SQL_TOKS}, t -> lower(t))"


@query(
    "text_kneser_ney_bigrams",
    survey="north-star text analysis extension(distributed bigram LM "
           "counts + interpolated Kneser-Ney probability — the Brants et "
           "al. 2007 distributed LM-count pipeline shape; continuation "
           "counts from the bigram TYPE table)",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_SQL_KN_TOKS} AS toks
      FROM documents WHERE doc_id < {_KN_DOCS}),
    bg AS (
      SELECT p.pair
      FROM toks, UNNEST(list_transform(range(1, len(toks)),
             i -> toks[i] || chr(9) || toks[i + 1])) AS p(pair)
      WHERE len(toks) >= 2),
    types AS (
      SELECT split_part(pair, chr(9), 1) AS w1,
             split_part(pair, chr(9), 2) AS w2,
             CAST(COUNT(*) AS BIGINT) AS c_bigram
      FROM bg GROUP BY 1, 2),
    lefts AS (
      SELECT w1, CAST(SUM(c_bigram) AS BIGINT) AS c_left,
             CAST(COUNT(*) AS BIGINT) AS n_right_types
      FROM types GROUP BY w1),
    rights AS (
      SELECT w2, CAST(COUNT(*) AS BIGINT) AS n_left_types
      FROM types GROUP BY w2),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types FROM types)
    SELECT t.w1, t.w2, t.c_bigram, l.c_left, l.n_right_types,
           r.n_left_types,
           ROUND((CASE WHEN t.c_bigram - {_KN_DISCOUNT} > 0
                       THEN t.c_bigram - {_KN_DISCOUNT} ELSE 0.0 END)
                   / l.c_left
                 + {_KN_DISCOUNT} * l.n_right_types / l.c_left
                   * (CAST(r.n_left_types AS DOUBLE) / tot.n_types),
                 6) AS p_kn
    FROM types t JOIN lefts l USING (w1) JOIN rights r USING (w2)
    CROSS JOIN tot
    ORDER BY t.c_bigram DESC, t.w1, t.w2 LIMIT {_KN_TOPK}
    """,
)
def text_kneser_ney_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 bigrams with exact counts, continuation counts, and the
    interpolated Kneser-Ney probability (Kneser & Ney 1995; Chen & Goodman
    1998 fixed absolute discount D=0.75):

        P_KN(w2|w1) = max(c - D, 0)/c(w1)
                    + D * N1+(w1,.)/c(w1) * N1+(.,w2)/|bigram types|

    This is the distributed LM-count pipeline of Brants et al. 2007
    ("Large Language Models in Machine Translation", trained at 2T
    tokens): ONE corpus-sized shuffle — the (w1, w2) count groupBy, which
    partial-aggregates map-side — after which every marginal
    (left-context totals, right/left continuation type counts, the global
    type count) is an aggregate over the bigram TYPE table, whose size is
    bounded by distinct-bigram vocabulary, orders of magnitude below
    corpus token count at 100 TB. The probability itself is computed on
    the type table only; no second corpus pass exists. Determinism: every
    count is an exact BIGINT; p_kn divides the same integer operands in
    the same order on both engines and is rounded once. Ties in the
    top-25 break on (w1, w2)."""
    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < _KN_DOCS)
    from server2_vector_search_server_spark.functions.text import tokens

    toks = F.transform(tokens(F.col("text")), lambda t: F.lower(t))
    pairs = F.when(
        F.size("_toks") >= 2,
        F.expr("transform(sequence(0, size(_toks) - 2), "
               "i -> struct(_toks[i] AS w1, _toks[i + 1] AS w2))")
    ).otherwise(F.expr("array()"))
    bg = (docs.select(toks.alias("_toks"))
          .select(F.explode(pairs).alias("bg"))
          .select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")))
    types = (bg.groupBy("w1", "w2")
             .agg(F.count(F.lit(1)).alias("c_bigram")))
    lefts = (types.groupBy("w1")
             .agg(F.sum("c_bigram").alias("c_left"),
                  F.count(F.lit(1)).alias("n_right_types")))
    rights = (types.groupBy("w2")
              .agg(F.count(F.lit(1)).alias("n_left_types")))
    tot = types.agg(F.count(F.lit(1)).alias("n_types"))
    d = float(_KN_DISCOUNT)
    p_kn = F.round(
        F.when(F.col("c_bigram") - d > 0, F.col("c_bigram") - d)
         .otherwise(F.lit(0.0)) / F.col("c_left")
        + F.lit(d) * F.col("n_right_types") / F.col("c_left")
          * (F.col("n_left_types").cast("double") / F.col("n_types")),
        6)
    return (types
            .join(lefts, "w1")
            .join(rights, "w2")
            .crossJoin(F.broadcast(tot))
            .select("w1", "w2", "c_bigram", "c_left", "n_right_types",
                    "n_left_types", p_kn.alias("p_kn"))
            .orderBy(F.col("c_bigram").desc(), "w1", "w2")
            .limit(_KN_TOPK))


# ---------------------------------------------------------------------------
# Stupid Backoff document scoring against the trained bigram table

_SB_TRAIN_DOCS = _KN_DOCS          # same training slice as the KN counts
_SB_SCORE_LO, _SB_SCORE_HI = 300, 340
_SB_ALPHA = "0.4"                  # Brants et al. 2007's fixed backoff


@query(
    "text_stupid_backoff_scores",
    survey="north-star text analysis extension(Stupid Backoff document "
           "scoring against the distributed bigram table — Brants et al. "
           "2007's serving algorithm: seen-bigram ratio else "
           "alpha * unigram ratio, per-doc exact micro-unit log fold; "
           "the word-level LM quality scorer next to the CCNet char-LM)",
    oracle=f"""
    WITH train AS (
      SELECT {_SQL_KN_TOKS} AS toks
      FROM documents WHERE doc_id < {_SB_TRAIN_DOCS}),
    tbg AS (
      SELECT split_part(pair, chr(9), 1) AS w1,
             split_part(pair, chr(9), 2) AS w2,
             CAST(COUNT(*) AS BIGINT) AS c12
      FROM train, UNNEST(list_transform(range(1, len(toks)),
             i -> toks[i] || chr(9) || toks[i + 1])) AS p(pair)
      WHERE len(toks) >= 2 GROUP BY 1, 2),
    tuni AS (
      SELECT u.w AS w, CAST(COUNT(*) AS BIGINT) AS c1
      FROM train, UNNEST(toks) AS u(w) GROUP BY 1),
    tn AS (SELECT CAST(SUM(c1) AS BIGINT) AS n FROM tuni),
    score_docs AS (
      SELECT doc_id, {_SQL_KN_TOKS} AS toks
      FROM documents
      WHERE doc_id >= {_SB_SCORE_LO} AND doc_id < {_SB_SCORE_HI}),
    sbg AS (
      SELECT doc_id, split_part(pair, chr(9), 1) AS w1,
             split_part(pair, chr(9), 2) AS w2
      FROM score_docs, UNNEST(list_transform(range(1, len(toks)),
             i -> toks[i] || chr(9) || toks[i + 1])) AS p(pair)
      WHERE len(toks) >= 2),
    scored AS (
      SELECT s.doc_id,
             CASE WHEN b.c12 IS NOT NULL THEN
                    CAST(b.c12 AS DOUBLE) / l.c1
                  WHEN u2.c1 IS NOT NULL THEN
                    {_SB_ALPHA} * u2.c1 / tn.n
                  ELSE NULL END AS s,
             CASE WHEN b.c12 IS NULL AND u2.c1 IS NOT NULL
                  THEN 1 ELSE 0 END AS is_backoff,
             CASE WHEN b.c12 IS NULL AND u2.c1 IS NULL
                  THEN 1 ELSE 0 END AS is_oov
      FROM sbg s
      LEFT JOIN tbg b ON b.w1 = s.w1 AND b.w2 = s.w2
      LEFT JOIN tuni l ON l.w = s.w1
      LEFT JOIN tuni u2 ON u2.w = s.w2
      CROSS JOIN tn)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(is_backoff) AS BIGINT) AS n_backoff,
           CAST(SUM(is_oov) AS BIGINT) AS n_oov,
           ROUND(CAST(SUM(CASE WHEN s IS NOT NULL THEN
                   CAST(ROUND(ROUND(ln(s), 9) * 1000000000) AS BIGINT)
                 ELSE 0 END) AS DOUBLE)
                 / (1000000000.0 * (COUNT(*) - SUM(is_oov))), 6)
             AS avg_logscore
    FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
)
def text_stupid_backoff_scores(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Stupid Backoff scoring (Brants et al. 2007 — the algorithm their
    2-trillion-token distributed LM actually SERVED, chosen over Kneser-
    Ney precisely because it needs only the raw count tables this module
    already builds): for each bigram of a held-out document,
    S(w2|w1) = c(w1 w2)/c(w1) when the bigram was seen in training, else
    alpha * c(w2)/N; bigrams whose w2 never occurred in training are
    counted as OOV and excluded from the average (ln(0) is undefined —
    the exclusion is part of the contract, reported as ``n_oov``).

    Determinism: each per-bigram score is a ratio of exact ints; its log
    goes through the house ln-then-round-9 pattern (ln agrees across
    engines at 1e-9 — the adamic-adar precedent) and folds as BIGINT
    micro-units, so the per-doc sum is shuffle-order exact. Scale shape:
    the train tables are vocabulary-bounded (broadcastable at any corpus
    size that fits a vocab); scoring is one pass over held-out bigrams
    with three equi-joins against them — the standard serve-side shape
    for count-based LM filters in training-data pipelines."""
    from server2_vector_search_server_spark.functions.text import tokens

    toks = F.transform(tokens(F.col("text")), lambda t: F.lower(t))
    pair_expr = F.when(
        F.size("_toks") >= 2,
        F.expr("transform(sequence(0, size(_toks) - 2), "
               "i -> struct(_toks[i] AS w1, _toks[i + 1] AS w2))")
    ).otherwise(F.expr("array()"))

    def bigrams(df):
        return (df.select("doc_id", toks.alias("_toks"))
                .select("doc_id", F.explode(pair_expr).alias("bg"))
                .select("doc_id", F.col("bg.w1").alias("w1"),
                        F.col("bg.w2").alias("w2")))

    docs = tbl(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") < _SB_TRAIN_DOCS)
    tbg = (bigrams(train).groupBy("w1", "w2")
           .agg(F.count(F.lit(1)).alias("c12")))
    tuni = (train.select(F.explode(toks).alias("w"))
            .groupBy("w").agg(F.count(F.lit(1)).alias("c1")))
    tn = tuni.agg(F.sum("c1").cast("long").alias("n"))
    sbg = bigrams(docs.filter((F.col("doc_id") >= _SB_SCORE_LO)
                              & (F.col("doc_id") < _SB_SCORE_HI)))
    left = tuni.select(F.col("w").alias("w1"), F.col("c1").alias("lc1"))
    right = tuni.select(F.col("w").alias("w2"), F.col("c1").alias("rc1"))
    alpha = float(_SB_ALPHA)
    joined = (sbg
              .join(F.broadcast(tbg), ["w1", "w2"], "left")
              .join(F.broadcast(left), "w1", "left")
              .join(F.broadcast(right), "w2", "left")
              .crossJoin(F.broadcast(tn)))
    s = (F.when(F.col("c12").isNotNull(),
                F.col("c12").cast("double") / F.col("lc1"))
         .when(F.col("rc1").isNotNull(),
               F.lit(alpha) * F.col("rc1") / F.col("n")))
    is_backoff = (F.col("c12").isNull()
                  & F.col("rc1").isNotNull()).cast("int")
    is_oov = (F.col("c12").isNull() & F.col("rc1").isNull()).cast("int")
    micro = F.when(
        s.isNotNull(),
        F.round(F.round(F.log(s), 9) * 1_000_000_000).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    scored = joined.select("doc_id", micro.alias("m"),
                           is_backoff.alias("is_backoff"),
                           is_oov.alias("is_oov"))
    return (scored.groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_bigrams"),
                 F.sum("is_backoff").cast("long").alias("n_backoff"),
                 F.sum("is_oov").cast("long").alias("n_oov"),
                 F.round(F.sum("m").cast("double")
                         / (1_000_000_000.0
                            * (F.count(F.lit(1)) - F.sum("is_oov"))), 6)
                 .alias("avg_logscore"))
            .orderBy("doc_id"))


# ---------------------------------------------------------------------------
# WordPiece tokenization (greedy longest-match-first with ## continuations)

_WP_DOCS = 100
_WP_MAX_WORD = 16
# (piece, is_continuation). Single letters in BOTH roles make [UNK] a
# policy for non-alpha input only; multi-char pieces are a fixed literal
# vocabulary (BERT-style), longest-match ties impossible (equal-length
# matches are the same string).
_WP_STARTS = ["the", "th", "he", "in", "re", "an", "on", "er", "at",
              "en", "es", "or", "te", "ti", "st", "ar", "nd", "to",
              "nt", "is", "of", "it", "al", "as", "ha"]
_WP_CONTS = ["ing", "ed", "er", "es", "ly", "ion", "ent", "al", "ar",
             "an", "or", "en", "th", "nd", "st", "te", "ti", "is",
             "at", "it", "on", "re", "in"]
_WP_VOCAB = ([(c, False) for c in "abcdefghijklmnopqrstuvwxyz"]
             + [(c, True) for c in "abcdefghijklmnopqrstuvwxyz"]
             + [(p, False) for p in _WP_STARTS]
             + [(p, True) for p in _WP_CONTS])


_WP_START_ORDER = sorted({p for p, c in _WP_VOCAB if not c},
                         key=len, reverse=True)
_WP_CONT_ORDER = sorted({p for p, c in _WP_VOCAB if c},
                        key=len, reverse=True)


def wordpiece_encode(w: str,
                     starts: "list[str]" = _WP_START_ORDER,
                     conts: "list[str]" = _WP_CONT_ORDER
                     ) -> "tuple[int, str, bool]":
    """Greedy longest-match-first WordPiece of one word: (n_pieces,
    segmentation string, is_unk).  A position with no matching piece
    voids the WHOLE word to [UNK] (the published policy).  Module-level
    so the [UNK] branch is unit-testable — the fixture corpus is
    all-lowercase-alpha and the single-char vocab covers a-z, so no
    fixture word can reach it."""
    pos = 0
    pieces: "list[str]" = []
    while pos < len(w):
        cands = conts if pos else starts
        hit = next((p for p in cands if w.startswith(p, pos)), None)
        if hit is None:
            return 1, "[UNK]", True
        pieces.append(("##" + hit) if pos else hit)
        pos += len(hit)
    return len(pieces), " ".join(pieces), False


def _sql_wordpiece() -> str:
    vocab_vals = ", ".join(f"('{p}', {str(c).lower()})"
                           for p, c in _WP_VOCAB)
    parts = [f"""
    vocab AS (SELECT * FROM (VALUES {vocab_vals}) AS v(piece, cont)),
    words AS MATERIALIZED (
      SELECT DISTINCT lower(t.w) AS word
      FROM documents, UNNEST(string_split_regex(text, '\\s+')) AS t(w)
      WHERE doc_id < {_WP_DOCS}
        AND regexp_matches(lower(t.w), '^[a-z]{{1,{_WP_MAX_WORD}}}$')),
    s0 AS MATERIALIZED (
      SELECT word, 1 AS pos, '' AS seg, 0 AS n_pieces FROM words)"""]
    for k in range(1, _WP_MAX_WORD + 1):
        parts.append(f"""
    s{k} AS MATERIALIZED (
      SELECT word, pos, seg, n_pieces FROM s{k - 1}
      WHERE pos > length(word)
      UNION ALL
      SELECT word, pos + length(piece) AS pos,
             seg || CASE WHEN pos > 1 THEN ' ##' || piece
                         WHEN pos = 1 AND seg = '' THEN piece
                         ELSE ' ' || piece END AS seg,
             n_pieces + 1 AS n_pieces
      FROM (
        SELECT s.word, s.pos, s.seg, s.n_pieces, v.piece,
               ROW_NUMBER() OVER (PARTITION BY s.word
                   ORDER BY length(v.piece) DESC) AS rk
        FROM s{k - 1} s JOIN vocab v
          ON v.cont = (s.pos > 1)
         AND substr(s.word, s.pos, length(v.piece)) = v.piece
        WHERE s.pos <= length(s.word))
      WHERE rk = 1)""")
    parts.append(f"""
    done AS (
      SELECT word, seg, n_pieces FROM s{_WP_MAX_WORD}
      WHERE pos > length(word))
    SELECT w.word,
           CAST(COALESCE(d.n_pieces, 1) AS BIGINT) AS n_pieces,
           COALESCE(d.seg, '[UNK]') AS seg,
           (d.word IS NULL) AS is_unk
    FROM words w LEFT JOIN done d ON d.word = w.word
    ORDER BY w.word""")
    return "WITH " + ",".join(parts)


@query(
    "text_wordpiece_tokenize",
    survey="north-star text analysis (WordPiece tokenization: greedy "
           "longest-match-first with ## continuation pieces and the "
           "[UNK] whole-word fallback — the BERT-family encoder, "
           "completing the tokenizer set next to BPE and "
           "unigram-Viterbi; segmentation strings hash-exact)",
    oracle=_sql_wordpiece(),
)
def text_wordpiece_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece-encode every distinct lowercase word (≤16 chars) of the
    first 100 documents under a fixed literal vocabulary: at each
    position take the LONGEST vocab piece whose continuation flag
    matches (## pieces only mid-word), emit it, advance; a position with
    no match voids the whole word to [UNK] — the published algorithm
    (Devlin et al. 2019, §4.1 of the original WordPiece paper lineage).
    Pure string ops — no floats anywhere, so the segmentation string,
    piece count and UNK flag are hash-exact by construction.

    Scale shape: tokenization is a pandas-UDF map over the DISTINCT word
    table with the vocabulary broadcast — the canonical 100 TB
    tokenizer deployment (vocab ~30k entries in production; a dict hit
    per position, cost linear in corpus characters).  Greedy matching is
    inherently per-word sequential — exactly what the Arrow batch UDF is
    for; there is no shuffle beyond the distinct.  The oracle unrolls
    the greedy loop level-by-level (16 MATERIALIZED steps, the Viterbi
    discipline) with a window argmax per step."""
    import pandas as pd

    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < _WP_DOCS)
    words = (docs.select(F.explode(tokens(F.col("text"))).alias("w"))
             .select(F.lower("w").alias("word"))
             .filter(F.col("word").rlike(f"^[a-z]{{1,{_WP_MAX_WORD}}}$"))
             .distinct())
    def encode(batches):
        for pdf in batches:
            out = {"word": [], "n_pieces": [], "seg": [], "is_unk": []}
            for w in pdf["word"]:
                n, seg, unk = wordpiece_encode(w)
                out["word"].append(w)
                out["n_pieces"].append(n)
                out["seg"].append(seg)
                out["is_unk"].append(unk)
            yield pd.DataFrame(out)

    return (words.mapInPandas(
        encode,
        schema="word string, n_pieces long, seg string, is_unk boolean")
        .orderBy("word"))


# ---------------------------------------------------------------------------
# S-stemmer (Harman 1991) — the light plural stemmer, one CASE chain

_SSTEM_CASE = """
    CASE
      WHEN length(word) <= 3 THEN word
      WHEN word LIKE '%ies' AND word NOT LIKE '%eies'
           AND word NOT LIKE '%aies'
        THEN substr(word, 1, length(word) - 3) || 'y'
      WHEN word LIKE '%es' AND word NOT LIKE '%aes'
           AND word NOT LIKE '%ees' AND word NOT LIKE '%oes'
        THEN substr(word, 1, length(word) - 1)
      WHEN word LIKE '%s' AND word NOT LIKE '%us' AND word NOT LIKE '%ss'
        THEN substr(word, 1, length(word) - 1)
      ELSE word
    END
"""


@query(
    "text_s_stemmer_groups",
    survey="north-star text analysis (Harman 1991 S-stemmer: the "
           "light plural-conflation rules as ONE portable CASE chain — "
           "the recall-cheap stemming step of a lexical retrieval "
           "pipeline, next to the tokenizer family)",
    oracle=f"""
    WITH base AS (
      SELECT lower(t.w) AS word, CAST(COUNT(*) AS BIGINT) AS n_occ
      FROM documents, UNNEST(string_split_regex(text, '\\s+')) AS t(w)
      WHERE doc_id < 200 AND regexp_matches(lower(t.w), '^[a-z]+$')
      GROUP BY 1
    ), words AS (
      SELECT word, n_occ FROM base
      UNION ALL
      SELECT CASE WHEN word LIKE '%y'
                  THEN substr(word, 1, length(word) - 1) || 'ies'
                  ELSE word || 's' END AS word,
             n_occ FROM base
    ), stemmed AS (
      SELECT word, n_occ, {_SSTEM_CASE} AS stem FROM words
    )
    SELECT stem,
           CAST(COUNT(*) AS BIGINT) AS n_variants,
           CAST(SUM(n_occ) AS BIGINT) AS n_occurrences,
           string_agg(word, ',' ORDER BY word) AS variants
    FROM stemmed GROUP BY stem
    HAVING COUNT(*) >= 1
    ORDER BY stem
    """,
)
def text_s_stemmer_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-stemmer conflation over the corpus vocabulary: the three Harman
    rules (-ies→y with e/a guards; -es→e with a/e/o guards; -s dropped
    unless -us/-ss; words ≤3 chars untouched) expressed as one CASE
    chain BOTH engines parse — plural variants collapse into stem
    groups ('table,tables' → table; 'query,queries' → query), the cheap
    recall lever a lexical retrieval stack applies before BM25.  The
    synthetic corpus carries no inflection, so each word's plural form
    (-y→-ies, else +s) is PLANTED as a deterministic echo — the planted-
    duplicate convention; without it the stemmer is an identity map and
    a hash match proves nothing.  Variant lists serialize to
    sorted CSV (the list-cell hashing rule).  Scale: one vocabulary
    aggregate then a vocabulary-sized projection + regroup — the corpus
    is touched once."""
    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    base = (docs.select(F.explode(tokens(F.col("text"))).alias("w"))
            .select(F.lower("w").alias("word"))
            .filter(F.col("word").rlike("^[a-z]+$"))
            .groupBy("word").agg(F.count(F.lit(1)).cast("long")
                                 .alias("n_occ")))
    plural = F.when(
        F.col("word").endswith("y"),
        F.concat(F.expr("substr(word, 1, length(word) - 1)"),
                 F.lit("ies"))).otherwise(F.concat("word", F.lit("s")))
    words = base.unionByName(base.select(plural.alias("word"), "n_occ"))
    stemmed = words.select("word", "n_occ",
                           F.expr(_SSTEM_CASE).alias("stem"))
    return (stemmed.groupBy("stem")
            .agg(F.count(F.lit(1)).cast("long").alias("n_variants"),
                 F.sum("n_occ").cast("long").alias("n_occurrences"),
                 F.concat_ws(",", F.sort_array(F.collect_list("word")))
                 .alias("variants"))
            .orderBy("stem"))


# ---------------------------------------------------------------------------
# Burrows' Delta (stylometry: source-pair distance over function-word z-scores)

_BD_TOPW = 20
_BD_DOCS = 500


@query(
    "text_burrows_delta_sources",
    survey="north-star text analysis (Burrows 2002 Delta: mean |z| "
           "difference of top-word relative frequencies between source "
           "pairs — the stylometric attribution distance; frequencies "
           "carried as exact nano-int rationals, z-moments as exact "
           "integer sums)",
    oracle=f"""
    WITH toks AS (
      SELECT source, lower(t.w) AS word
      FROM documents, UNNEST(string_split_regex(text, '\\s+')) AS t(w)
      WHERE doc_id < {_BD_DOCS}
        AND regexp_matches(lower(t.w), '^[a-z]+$')
    ), top_words AS (
      SELECT word FROM (
        SELECT word, COUNT(*) AS n,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, word) AS rk
        FROM toks GROUP BY word) WHERE rk <= {_BD_TOPW}
    ), src_tot AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS t_s
      FROM toks GROUP BY source
    ), cells AS (
      SELECT s.source, w.word,
             CAST(ROUND(1000000000.0 * COALESCE(c.n, 0) / st.t_s)
                  AS BIGINT) AS f_nano
      FROM (SELECT DISTINCT source FROM toks) s
      CROSS JOIN top_words w
      LEFT JOIN (SELECT source, word, CAST(COUNT(*) AS BIGINT) AS n
                 FROM toks GROUP BY source, word) c
        ON c.source = s.source AND c.word = w.word
      JOIN src_tot st ON st.source = s.source
    ), moments AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(f_nano) AS BIGINT) AS s1,
             CAST(SUM(CAST(f_nano AS HUGEINT) * f_nano) AS DOUBLE) AS s2
      FROM cells GROUP BY word
    ), z AS (
      SELECT c.source, c.word,
             (c.f_nano - CAST(m.s1 AS DOUBLE) / m.k)
             / sqrt((m.s2 - CAST(m.s1 AS DOUBLE) * m.s1 / m.k)
                    / (m.k - 1)) AS zv
      FROM cells c JOIN moments m ON m.word = c.word
    ), pairs AS (
      SELECT a.source AS s1, b.source AS s2,
             CAST(SUM(CAST(ROUND(ABS(a.zv - b.zv) * 1000000) AS BIGINT))
                  AS BIGINT) AS d_micro
      FROM z a JOIN z b ON a.word = b.word AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT s1, s2,
           ROUND(d_micro / 1000000.0 / {_BD_TOPW}, 6) AS delta
    FROM pairs ORDER BY s1, s2
    """,
)
def text_burrows_delta_sources(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Burrows' Delta between every source pair: take the corpus's top
    20 words, z-score each word's relative frequency across sources,
    and average |z(s1) − z(s2)| over the word panel — the classic
    stylometric distance (Burrows 2002; function-word profiles
    attribute authorship).  Determinism chain: relative frequencies
    round to exact nano-int rationals per (source, word) cell; the
    cross-source mean/std come from exact integer sums over those; each
    pair term rounds to micro before the 20-word integer sum (the ANOVA
    discipline — a raw double sum over shuffle order would drift).
    Scale: one corpus token scan; everything after lives on the
    (sources × 20) panel, and the pair join is sources² × 20 — catalog-
    bounded, never corpus-bounded."""
    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < _BD_DOCS)
    toks = (docs.select("source",
                        F.explode(tokens(F.col("text"))).alias("w"))
            .select("source", F.lower("w").alias("word"))
            .filter(F.col("word").rlike("^[a-z]+$"))
            .localCheckpoint(eager=False))
    top_words = (toks.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
                 .withColumn("rk", F.row_number().over(
                     Window.orderBy(F.col("n").desc(), "word")))
                 .filter(F.col("rk") <= _BD_TOPW).select("word"))
    src_tot = toks.groupBy("source").agg(F.count(F.lit(1)).alias("t_s"))
    counts = toks.groupBy("source", "word").agg(
        F.count(F.lit(1)).alias("n"))
    cells = (src_tot.select("source", "t_s")
             .crossJoin(F.broadcast(top_words))
             .join(counts, ["source", "word"], "left")
             .select("source", "word",
                     F.round(1_000_000_000.0
                             * F.coalesce(F.col("n"), F.lit(0))
                             / F.col("t_s")).cast("long").alias("f_nano")))
    f_dec = F.col("f_nano").cast("decimal(20,0)")
    moments = (cells.groupBy("word")
               .agg(F.count(F.lit(1)).alias("k"),
                    F.sum("f_nano").alias("s1"),
                    F.sum(f_dec * f_dec).cast("double").alias("s2")))
    zv = ((F.col("f_nano") - F.col("s1").cast("double") / F.col("k"))
          / F.sqrt((F.col("s2") - F.col("s1").cast("double") * F.col("s1")
                    / F.col("k")) / (F.col("k") - 1)))
    z = cells.join(F.broadcast(moments), "word").select(
        "source", "word", zv.alias("zv"))
    za = z.select(F.col("source").alias("s1"), "word",
                  F.col("zv").alias("z1"))
    zb = z.select(F.col("source").alias("s2"), "word",
                  F.col("zv").alias("z2"))
    pairs = (za.join(zb, "word")
             .filter(F.col("s1") < F.col("s2"))
             .groupBy("s1", "s2")
             .agg(F.sum(F.round(F.abs(F.col("z1") - F.col("z2"))
                                * 1_000_000).cast("long"))
                  .alias("d_micro")))
    return (pairs.select(
        "s1", "s2",
        F.round(F.col("d_micro") / 1_000_000.0 / _BD_TOPW, 6)
        .alias("delta"))
        .orderBy("s1", "s2"))
