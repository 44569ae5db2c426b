"""Record-linkage query surface (operators/linkage.py): blocked fuzzy
entity resolution with an exact DuckDB twin (both engines implement the
classic unit-cost Levenshtein distance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from server2_vector_search_server_spark.operators import linkage
from server2_vector_search_server_spark.plans.registry import query, tbl


@query(
    "er_fuzzy_part_match",
    survey="beyond-reference (record linkage: blocked fuzzy entity "
           "resolution; exact-identity analog is app.py:152-157)",
    oracle="""
    WITH catalog AS (
        SELECT p_partkey, p_name, p_brand,
               split_part(p_name, ' ', 1) AS blk
        FROM part
    ), mentions AS (
        SELECT p_partkey AS mention_id,
               substr(p_name, 1, length(p_name) - 1) AS mention,
               p_brand, split_part(p_name, ' ', 1) AS blk
        FROM part WHERE p_partkey % 4 = 0
    ), scored AS (
        SELECT m.mention_id, m.mention,
               c.p_partkey AS matched_partkey, c.p_name AS matched_name,
               CAST(levenshtein(m.mention, c.p_name) AS BIGINT) AS lev,
               ROW_NUMBER() OVER (
                   PARTITION BY m.mention_id
                   ORDER BY levenshtein(m.mention, c.p_name),
                            c.p_partkey) AS rn
        FROM mentions m
        JOIN catalog c ON m.blk = c.blk AND m.p_brand = c.p_brand
        WHERE levenshtein(m.mention, c.p_name) <= 3
    )
    SELECT mention_id, mention, matched_partkey, matched_name, lev
    FROM scored WHERE rn = 1 ORDER BY mention_id
    """,
)
def er_fuzzy_part_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution over the part catalog: 'mentions' are
    deterministically dirtied names (last character dropped — a truncation
    typo), matched back via (first token, brand) blocking + in-block
    Levenshtein, best (distance, partkey) per mention. The equi-join on
    the block key is the only shuffle; edit distance touches ≤17 catalog
    rows per mention at sf0.01 instead of the full 2,000 — the Σ(block²)
    vs n² gap that makes linkage feasible at catalog scale."""
    part = tbl(spark, sf_dir, "part")
    catalog = part.select(
        "p_partkey", "p_name", "p_brand",
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("blk"))
    mentions = (
        part.filter(F.col("p_partkey") % 4 == 0)
        .select(
            F.col("p_partkey").alias("mention_id"),
            F.expr("substring(p_name, 1, length(p_name) - 1)")
            .alias("mention"),
            "p_brand",
            F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("blk")))
    return (
        linkage.blocked_fuzzy_join(
            mentions, catalog,
            mention_id_col="mention_id", mention_text_col="mention",
            entity_id_col="p_partkey", entity_text_col="p_name",
            block_cols=("blk", "p_brand"), max_distance=3)
        .select("mention_id", "mention",
                F.col("p_partkey").alias("matched_partkey"),
                F.col("p_name").alias("matched_name"), "lev")
        .orderBy("mention_id")
    )


# ---------------------------------------------------------------------------
# Fellegi-Sunter match/unmatch weights over blocked candidate pairs

_FS_LEV = 2


@query(
    "er_fellegi_sunter_weights",
    survey="linkage extension(Fellegi-Sunter 1969 probabilistic record "
           "linkage: m/u probabilities per comparison field estimated "
           "from the planted truth, log-likelihood-ratio weights per "
           "agreement pattern — the scoring model ABOVE the blocked "
           "candidate generation er_fuzzy_part_match provides)",
    oracle=f"""
    WITH catalog AS (
        SELECT p_partkey, p_name, p_brand, p_type,
               split_part(p_name, ' ', 1) AS blk
        FROM part),
    mentions AS (
        SELECT p_partkey AS mention_id,
               substr(p_name, 1, length(p_name) - 1) AS mention,
               p_brand AS m_brand, p_type AS m_type,
               split_part(p_name, ' ', 1) AS blk
        FROM part WHERE p_partkey % 4 = 0),
    pairs AS (
        SELECT m.mention_id, c.p_partkey,
               CASE WHEN m.m_brand = c.p_brand THEN 1 ELSE 0 END AS g_brand,
               CASE WHEN m.m_type = c.p_type THEN 1 ELSE 0 END AS g_type,
               CASE WHEN levenshtein(m.mention, c.p_name) <= {_FS_LEV}
                    THEN 1 ELSE 0 END AS g_name,
               CASE WHEN m.mention_id = c.p_partkey THEN 1 ELSE 0 END
                 AS is_match
        FROM mentions m JOIN catalog c ON m.blk = c.blk),
    mu AS (
        SELECT
          SUM(CASE WHEN is_match = 1 THEN 1 ELSE 0 END) AS nm,
          SUM(CASE WHEN is_match = 0 THEN 1 ELSE 0 END) AS nu,
          SUM(CASE WHEN is_match = 1 THEN g_brand ELSE 0 END) AS mb,
          SUM(CASE WHEN is_match = 0 THEN g_brand ELSE 0 END) AS ub,
          SUM(CASE WHEN is_match = 1 THEN g_type ELSE 0 END) AS mt,
          SUM(CASE WHEN is_match = 0 THEN g_type ELSE 0 END) AS ut,
          SUM(CASE WHEN is_match = 1 THEN g_name ELSE 0 END) AS mn,
          SUM(CASE WHEN is_match = 0 THEN g_name ELSE 0 END) AS un
        FROM pairs),
    w AS (
        -- add-one smoothing keeps every weight finite; micro-rounded ln
        SELECT
          CAST(ROUND(ROUND(ln(((mb + 1.0) / (nm + 2.0))
                           / ((ub + 1.0) / (nu + 2.0))), 9) * 1000000)
               AS BIGINT) AS wb1,
          CAST(ROUND(ROUND(ln(((nm - mb + 1.0) / (nm + 2.0))
                           / ((nu - ub + 1.0) / (nu + 2.0))), 9) * 1000000)
               AS BIGINT) AS wb0,
          CAST(ROUND(ROUND(ln(((mt + 1.0) / (nm + 2.0))
                           / ((ut + 1.0) / (nu + 2.0))), 9) * 1000000)
               AS BIGINT) AS wt1,
          CAST(ROUND(ROUND(ln(((nm - mt + 1.0) / (nm + 2.0))
                           / ((nu - ut + 1.0) / (nu + 2.0))), 9) * 1000000)
               AS BIGINT) AS wt0,
          CAST(ROUND(ROUND(ln(((mn + 1.0) / (nm + 2.0))
                           / ((un + 1.0) / (nu + 2.0))), 9) * 1000000)
               AS BIGINT) AS wn1,
          CAST(ROUND(ROUND(ln(((nm - mn + 1.0) / (nm + 2.0))
                           / ((nu - un + 1.0) / (nu + 2.0))), 9) * 1000000)
               AS BIGINT) AS wn0
        FROM mu)
    SELECT g_brand, g_type, g_name,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(is_match) AS BIGINT) AS n_true_matches,
           ROUND((CASE WHEN g_brand = 1 THEN w.wb1 ELSE w.wb0 END
                  + CASE WHEN g_type = 1 THEN w.wt1 ELSE w.wt0 END
                  + CASE WHEN g_name = 1 THEN w.wn1 ELSE w.wn0 END)
                 / 1000000.0, 6) AS fs_score
    FROM pairs, w
    GROUP BY g_brand, g_type, g_name, w.wb1, w.wb0, w.wt1, w.wt0,
             w.wn1, w.wn0
    ORDER BY g_brand, g_type, g_name
    """,
)
def er_fellegi_sunter_weights(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic linkage scoring: per comparison field
    (brand, type, name-within-2-edits), estimate m = P(agree | match) and
    u = P(agree | non-match) from the planted ground truth, then score
    every agreement PATTERN with the summed log-likelihood-ratio weights
    — the decision model that turns er_fuzzy_part_match's candidates
    into accept/review/reject bands. Add-one smoothing keeps patterns
    finite; the report is per-pattern (8 bounded rows) with true-match
    counts so the weight ordering is auditable.

    Scale shape: candidates come from the same first-token block
    equi-join (never all-pairs); m/u estimation is ONE aggregate over
    candidates; pattern scoring joins the 1-row weight table. At real
    scale, truth comes from a labeled sample and the same plan applies
    unchanged."""
    part = tbl(spark, sf_dir, "part")
    catalog = part.select(
        "p_partkey", "p_name", "p_brand", "p_type",
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("blk"))
    mentions = (part.filter(F.col("p_partkey") % 4 == 0)
                .select(F.col("p_partkey").alias("mention_id"),
                        F.expr("substr(p_name, 1, length(p_name) - 1)")
                        .alias("mention"),
                        F.col("p_brand").alias("m_brand"),
                        F.col("p_type").alias("m_type"),
                        F.split_part(F.col("p_name"), F.lit(" "),
                                     F.lit(1)).alias("blk")))
    pairs = (mentions.join(catalog, "blk")
             .select(
        "mention_id", "p_partkey",
        (F.col("m_brand") == F.col("p_brand")).cast("int").alias("g_brand"),
        (F.col("m_type") == F.col("p_type")).cast("int").alias("g_type"),
        (F.levenshtein("mention", "p_name") <= _FS_LEV).cast("int")
        .alias("g_name"),
        (F.col("mention_id") == F.col("p_partkey")).cast("int")
        .alias("is_match")))
    mu = pairs.agg(
        F.sum("is_match").alias("nm"),
        F.sum(1 - F.col("is_match")).alias("nu"),
        F.sum(F.when(F.col("is_match") == 1, F.col("g_brand"))
              .otherwise(0)).alias("mb"),
        F.sum(F.when(F.col("is_match") == 0, F.col("g_brand"))
              .otherwise(0)).alias("ub"),
        F.sum(F.when(F.col("is_match") == 1, F.col("g_type"))
              .otherwise(0)).alias("mt"),
        F.sum(F.when(F.col("is_match") == 0, F.col("g_type"))
              .otherwise(0)).alias("ut"),
        F.sum(F.when(F.col("is_match") == 1, F.col("g_name"))
              .otherwise(0)).alias("mn"),
        F.sum(F.when(F.col("is_match") == 0, F.col("g_name"))
              .otherwise(0)).alias("un"))

    def w_agree(ma, ua):
        return F.round(F.round(F.log(
            ((ma + 1.0) / (F.col("nm") + 2.0))
            / ((ua + 1.0) / (F.col("nu") + 2.0))), 9)
            * 1_000_000).cast("long")

    w = mu.select(
        w_agree(F.col("mb"), F.col("ub")).alias("wb1"),
        w_agree(F.col("nm") - F.col("mb"),
                F.col("nu") - F.col("ub")).alias("wb0"),
        w_agree(F.col("mt"), F.col("ut")).alias("wt1"),
        w_agree(F.col("nm") - F.col("mt"),
                F.col("nu") - F.col("ut")).alias("wt0"),
        w_agree(F.col("mn"), F.col("un")).alias("wn1"),
        w_agree(F.col("nm") - F.col("mn"),
                F.col("nu") - F.col("un")).alias("wn0"))
    patt = (pairs.groupBy("g_brand", "g_type", "g_name")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"),
                 F.sum("is_match").cast("long").alias("n_true_matches")))
    score = (F.when(F.col("g_brand") == 1, F.col("wb1"))
             .otherwise(F.col("wb0"))
             + F.when(F.col("g_type") == 1, F.col("wt1"))
             .otherwise(F.col("wt0"))
             + F.when(F.col("g_name") == 1, F.col("wn1"))
             .otherwise(F.col("wn0")))
    return (patt.join(F.broadcast(w))
            .select("g_brand", "g_type", "g_name", "n_pairs",
                    "n_true_matches",
                    F.round(score / 1_000_000.0, 6).alias("fs_score"))
            .orderBy("g_brand", "g_type", "g_name"))


# ---------------------------------------------------------------------------
# Blocking-scheme quality evaluation (reduction ratio vs pairs completeness)

from server2_vector_search_server_spark.operators import dedup  # noqa: E402
from server2_vector_search_server_spark.plans.dedup_queries import (  # noqa: E402,E501
    _SQL_DOCS as _ER_SQL_DOCS,
    _docs_with_dups as _er_docs,
    _sql_simhash as _er_sql_simhash,
)
from server2_vector_search_server_spark.functions.text import (  # noqa: E402
    sql_token_hash as _er_sql_token_hash,
)

_ER_LEN_BUCKET = 50


def _er_sql_keys() -> str:
    return f"""
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         t -> t != '')[1] AS k_first_token,
             CAST(length(text) // {_ER_LEN_BUCKET} AS VARCHAR)
               AS k_len_bucket
      FROM docs2"""


def _er_sql_scheme(name: str, col: str) -> str:
    # NULL blocking keys (e.g. a whitespace-only text -> no first token)
    # are excluded from block stats on BOTH engines (ADVICE r8): a doc
    # without a key joins no block, so it contributes no candidates and
    # no block — COUNT(DISTINCT col) and the filtered GROUP BY agree by
    # construction.
    return f"""
    SELECT '{name}' AS scheme,
           (SELECT CAST(COUNT(DISTINCT {col}) AS BIGINT) FROM keys)
             AS n_blocks,
           (SELECT CAST(SUM((b * (b - 1)) // 2) AS BIGINT)
            FROM (SELECT COUNT(*) AS b FROM keys
                  WHERE {col} IS NOT NULL GROUP BY {col}))
             AS n_candidate_pairs,
           ROUND(1.0 - CAST((SELECT SUM((b * (b - 1)) // 2)
                             FROM (SELECT COUNT(*) AS b FROM keys
                                   WHERE {col} IS NOT NULL
                                   GROUP BY {col})) AS DOUBLE)
                 / ((SELECT COUNT(*) FROM keys)
                    * ((SELECT COUNT(*) FROM keys) - 1) // 2), 6)
             AS reduction_ratio,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_truth_pairs,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM truth t JOIN keys ka ON ka.doc_id = t.id_a
                         JOIN keys kb ON kb.doc_id = t.id_b
            WHERE ka.{col} = kb.{col}) AS n_truth_covered,
           ROUND(CAST((SELECT COUNT(*)
                       FROM truth t JOIN keys ka ON ka.doc_id = t.id_a
                                    JOIN keys kb ON kb.doc_id = t.id_b
                       WHERE ka.{col} = kb.{col}) AS DOUBLE)
                 / (SELECT COUNT(*) FROM truth), 6)
             AS pairs_completeness"""


@query(
    "er_blocking_quality_eval",
    survey="linkage extension(blocking-scheme evaluation: reduction "
           "ratio from block-size sums — candidate pairs COUNTED, never "
           "materialized — and pairs completeness against the SimHash "
           "hamming<=3 truth; the two-axis tradeoff every entity-"
           "resolution pipeline tunes before running its matcher)",
    oracle=f"""
    WITH docs2 AS ({_ER_SQL_DOCS}),
    hs AS (
      SELECT doc_id,
             list_transform(
               list_filter(string_split_regex(trim(text), '\\s+'),
                           t -> t != ''),
               t -> {_er_sql_token_hash('t')}) AS hashes
      FROM docs2),
    sh AS (SELECT doc_id, {_er_sql_simhash('hashes')} AS sh FROM hs),
    truth AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.sh, b.sh)) <= 3),
    keys AS ({_er_sql_keys()})
    {_er_sql_scheme('first_token', 'k_first_token')}
    UNION ALL
    {_er_sql_scheme('len_bucket', 'k_len_bucket')}
    ORDER BY scheme
    """,
)
def er_blocking_quality_eval(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Blocking-scheme evaluation (Christen 2012's standard metric pair,
    public): for each candidate blocking key — first token, and
    length//{bucket} bucket — the REDUCTION RATIO (1 − candidate/total
    pairs, with candidates counted as Σ b·(b−1)/2 over block sizes: the
    whole point of blocking is that pairs are never materialized, so the
    evaluation must not materialize them either) and the PAIRS
    COMPLETENESS against a measurable truth set (SimHash hamming ≤ 3
    over the planted-dup corpus — the same truth the dedup family hash-
    checks). On this corpus first_token keeps ~97% of true pairs while
    len_bucket keeps ~89% with a different candidate budget — exactly
    the tradeoff table an ER pipeline reads before committing a scheme.
    All counts exact BIGINTs; the two ratios divide the same integers
    once. Scale shape: keys are one scan; block sizes and the truth join
    are grouped/bounded; nothing quadratic in the corpus ever runs."""
    docs = _er_docs(spark, sf_dir).localCheckpoint(eager=True)
    truth = (dedup.simhash_near_duplicates(docs, max_hamming=3)
             .select("id_a", "id_b").localCheckpoint(eager=True))
    keys = docs.select(
        "doc_id",
        F.element_at(F.filter(F.split(F.trim("text"), r"\s+"),
                              lambda t: t != ""), 1).alias("k_first_token"),
        (F.length("text") / _ER_LEN_BUCKET).cast("int").cast("string")
        .alias("k_len_bucket")).localCheckpoint(eager=True)
    n_docs = keys.count()
    n_truth = truth.count()
    total_pairs = n_docs * (n_docs - 1) // 2

    def scheme(name: str, col: str) -> DataFrame:
        # NULL keys are unblockable — drop them BEFORE grouping so the
        # NULL group neither counts as a block nor contributes candidate
        # pairs, matching the oracle's COUNT(DISTINCT)/filtered GROUP BY
        # (ADVICE r8: Spark groupBy keeps a NULL group, COUNT(DISTINCT)
        # drops it — latent mismatch on whitespace-only docs)
        blocks = (keys.filter(F.col(col).isNotNull())
                  .groupBy(col).agg(F.count(F.lit(1)).alias("b")))
        stats = blocks.agg(
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
            F.sum((F.col("b") * (F.col("b") - 1) / 2).cast("long"))
            .cast("long").alias("n_candidate_pairs"))
        ka = keys.select(F.col("doc_id").alias("id_a"),
                         F.col(col).alias("ka"))
        kb = keys.select(F.col("doc_id").alias("id_b"),
                         F.col(col).alias("kb"))
        covered = (truth.join(ka, "id_a").join(kb, "id_b")
                   .filter(F.col("ka") == F.col("kb"))
                   .agg(F.count(F.lit(1)).cast("long")
                        .alias("n_truth_covered")))
        return (stats.crossJoin(F.broadcast(covered))
                .select(F.lit(name).alias("scheme"), "n_blocks",
                        "n_candidate_pairs",
                        F.round(1.0 - F.col("n_candidate_pairs")
                                .cast("double") / total_pairs, 6)
                        .alias("reduction_ratio"),
                        F.lit(n_truth).cast("long").alias("n_truth_pairs"),
                        "n_truth_covered",
                        F.round(F.col("n_truth_covered").cast("double")
                                / n_truth, 6).alias("pairs_completeness")))

    return (scheme("first_token", "k_first_token")
            .unionByName(scheme("len_bucket", "k_len_bucket"))
            .orderBy("scheme"))
