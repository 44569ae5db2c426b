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
