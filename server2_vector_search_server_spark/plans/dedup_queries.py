"""Deduplication query surface (north-star LLM-pipeline operators).

Each query plants known (near-)duplicates by unioning the corpus with a
shifted-id copy (exact) or a perturbed copy (near), so the dedup operators
provably fire and the DuckDB oracle reproduces the exact same pair sets.

The oracle SQL is *generated* from the same constants as the Spark operators
(`operators/dedup.py`: PERMS, band layout, thresholds) — one source of truth,
two engines.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from server2_vector_search_server_spark.functions.text import (
    MERSENNE31,
    sql_token_hash,
    sql_token_windows,
    sql_word_shingles,
    tokens,
    word_shingles,
)
from server2_vector_search_server_spark.operators import dedup
from server2_vector_search_server_spark.plans.registry import (
    scratch_dir,
    state_partitions,
    query,
    sql_dot,
    sql_l2_norm,
    sql_sq_l2,
    tbl,
)

# ---------------------------------------------------------------------------
# shared corpus construction: base ∪ exact copy (+20000) ∪ perturbed copy
# (+10000, two extra words) — the "documents with planted duplicates" table.

_PERTURB = " zz yy"
_N_BASE = 120

_SQL_DOCS = f"""
    SELECT doc_id, text FROM documents WHERE doc_id < {_N_BASE}
    UNION ALL
    SELECT doc_id + 20000 AS doc_id, text FROM documents WHERE doc_id < {_N_BASE}
    UNION ALL
    SELECT doc_id + 10000 AS doc_id, text || '{_PERTURB}' AS text
    FROM documents WHERE doc_id < {_N_BASE}
"""


def _docs_with_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    # base + planted exact dup + planted near dup, via ONE explode over ONE
    # parquet scan — the equivalent three-branch union re-scans the file
    # once per branch inside every downstream materialization job
    base = tbl(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _N_BASE).select("doc_id", "text")
    variants = F.array(
        F.struct(F.col("doc_id"), F.col("text")),
        F.struct((F.col("doc_id") + 20000).alias("doc_id"), F.col("text")),
        F.struct((F.col("doc_id") + 10000).alias("doc_id"),
                 F.concat(F.col("text"), F.lit(_PERTURB)).alias("text")))
    return (base.select(F.explode(variants).alias("v"))
            .select("v.doc_id", "v.text"))


# ---------------------------------------------------------------------------
# 1. exact dedup

@query(
    "dedup_exact",
    survey="north-star dedup (exact hash-groupBy)",
    oracle=f"""
    WITH docs2 AS ({_SQL_DOCS})
    SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id,
           COUNT(*) AS cluster_size,
           array_to_string(list_sort(list(doc_id)), ',') AS member_ids
    FROM docs2 GROUP BY content_hash HAVING COUNT(*) > 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # member_ids serialized to a CSV string: the grading canonicalizer
    # (pandas factorize) cannot hash list cells.
    return dedup.exact_duplicate_groups(_docs_with_dups(spark, sf_dir)).select(
        "content_hash", "keep_id", "cluster_size",
        F.array_join(F.transform("member_ids", lambda x: x.cast("string")),
                     ",").alias("member_ids"))


# ---------------------------------------------------------------------------
# 2. MinHash + LSH near-dup

def _sql_minhash_sig(hashes_expr: str) -> str:
    mins = ", ".join(
        f"coalesce(list_min(list_transform({hashes_expr}, "
        f"x -> ({a} * x + {b}) % {MERSENNE31})), {MERSENNE31})"
        for a, b in dedup.PERMS)
    return f"[{mins}]"


def _sql_band_selects(sig_table: str) -> str:
    rows = dedup.ROWS_PER_BAND
    selects = []
    for i in range(dedup.BANDS):
        key = " || '-' || ".join(
            f"CAST(sig[{i * rows + j + 1}] AS VARCHAR)"
            for j in range(rows))
        selects.append(
            f"SELECT doc_id, {i} AS band_index, {key} AS band_key "
            f"FROM {sig_table}")
    return " UNION ALL ".join(selects)


_MINHASH_THRESHOLD = 0.5

_SQL_MINHASH = f"""
    WITH docs2 AS ({_SQL_DOCS}),
    hs AS (
      SELECT doc_id,
             list_transform({sql_word_shingles('text', 3)},
                            s -> {sql_token_hash('s')}) AS hashes
      FROM docs2),
    sigs AS (SELECT doc_id, {_sql_minhash_sig('hashes')} AS sig FROM hs),
    bands AS ({_sql_band_selects('sigs')}),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b USING (band_index, band_key)
      WHERE a.doc_id < b.doc_id)
    SELECT p.id_a, p.id_b,
           ROUND(CAST(list_sum(list_transform(list_zip(sa.sig, sb.sig),
                 z -> CASE WHEN z[1] = z[2] THEN 1 ELSE 0 END)) AS DOUBLE)
                 / {dedup.NUM_PERM}, 6) AS est_jaccard
    FROM pairs p
    JOIN sigs sa ON sa.doc_id = p.id_a
    JOIN sigs sb ON sb.doc_id = p.id_b
    WHERE est_jaccard >= {_MINHASH_THRESHOLD}
"""


@query(
    "dedup_minhash_lsh",
    survey="north-star dedup (MinHash signatures, LSH bands, verify)",
    oracle=_SQL_MINHASH,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_near_duplicates(
        _docs_with_dups(spark, sf_dir), threshold=_MINHASH_THRESHOLD)


_SQL_KEEP_MIN = f"""
    WITH docs2 AS ({_SQL_DOCS}),
    hs AS (
      SELECT doc_id,
             list_transform({sql_word_shingles('text', 3)},
                            s -> {sql_token_hash('s')}) AS hashes
      FROM docs2),
    sigs AS (SELECT doc_id, {_sql_minhash_sig('hashes')} AS sig FROM hs),
    bands AS ({_sql_band_selects('sigs')}),
    bucket_min AS (
      SELECT band_index, band_key, MIN(doc_id) AS bucket_rep
      FROM bands GROUP BY band_index, band_key),
    rep AS (
      SELECT b.doc_id, MIN(m.bucket_rep) AS rep
      FROM bands b JOIN bucket_min m USING (band_index, band_key)
      GROUP BY b.doc_id)
    SELECT d.doc_id, md5(d.text) AS content_md5
    FROM docs2 d JOIN rep r ON r.doc_id = d.doc_id
    WHERE r.rep = d.doc_id
    ORDER BY d.doc_id
"""


@query(
    "dedup_minhash_keep_min",
    survey="north-star dedup (pairs-free bucket-min fuzzy dedup — the "
           "SlimPajama-style keep-one-per-LSH-bucket shape whose shuffle "
           "stays ∝ docs×bands under arbitrarily skewed dup clusters)",
    oracle=_SQL_KEEP_MIN,
)
def dedup_minhash_keep_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    kept = dedup.drop_minhash_near_duplicates(_docs_with_dups(spark, sf_dir))
    return (kept.select("doc_id", F.md5("text").alias("content_md5"))
            .orderBy("doc_id"))


# ---------------------------------------------------------------------------
# 3. SimHash near-dup

def _sql_simhash(hashes_expr: str, bits: int = dedup.SIMHASH_BITS) -> str:
    """Twin of operators/dedup.simhash: bits 0-30 vote with the token
    hash, bits 31-61 with the derived second hash (same A2/B2 literals)."""
    h2 = (f"list_transform({hashes_expr}, "
          f"x -> ({dedup.SIMHASH_A2} * x + {dedup.SIMHASH_B2}) "
          f"% {MERSENNE31})")
    terms = []
    for i in range(bits):
        src, shift = (hashes_expr, i) if i < 31 else (h2, i - 31)
        vote = (f"list_sum(list_transform({src}, "
                f"x -> ((x >> {shift}) & 1) * 2 - 1))")
        terms.append(f"(CASE WHEN {vote} > 0 THEN CAST({1 << i} AS BIGINT) "
                     f"ELSE CAST(0 AS BIGINT) END)")
    return "(" + " + ".join(terms) + ")"


_SQL_SIMHASH = f"""
    WITH docs2 AS ({_SQL_DOCS}),
    hs AS (
      SELECT doc_id,
             list_transform(
               list_filter(string_split_regex(trim(text), '\\s+'),
                           t -> t != ''),
               t -> {sql_token_hash('t')}) AS hashes
      FROM docs2),
    sh AS (SELECT doc_id, {_sql_simhash('hashes')} AS sh FROM hs)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.sh, b.sh)) AS hamming
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sh, b.sh)) <= 3
"""


@query(
    "dedup_simhash",
    survey="north-star dedup (SimHash fingerprints, hamming pairs)",
    oracle=_SQL_SIMHASH,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash_near_duplicates(
        _docs_with_dups(spark, sf_dir), max_hamming=3)


# ---------------------------------------------------------------------------
# 4. n-gram Jaccard

_JACCARD_THRESHOLD = 0.5

# ONE definition of the ground-truth pair metric — dedup_ngram_jaccard's
# oracle and dedup_minhash_quality_eval's truth must stay the same formula
_SQL_JACCARD_EXPR = """ROUND(CASE WHEN len(list_distinct(a.sh || b.sh)) = 0 THEN 0.0
                 ELSE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                      / CAST(len(list_distinct(a.sh || b.sh)) AS DOUBLE)
                 END, 6)"""

_SQL_JACCARD = f"""
    WITH docs2 AS ({_SQL_DOCS}),
    sh AS (SELECT doc_id, {sql_word_shingles('text', 3)} AS sh FROM docs2)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           {_SQL_JACCARD_EXPR} AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE jaccard >= {_JACCARD_THRESHOLD}
"""


@query(
    "dedup_ngram_jaccard",
    survey="north-star dedup (word 3-gram Jaccard verification)",
    oracle=_SQL_JACCARD,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(
        _docs_with_dups(spark, sf_dir), threshold=_JACCARD_THRESHOLD)


# ---------------------------------------------------------------------------
# 5. embedding-cosine near-dup

_COS_N = 200
_COS_THRESHOLD = 0.5

_SQL_COSINE = f"""
    -- mirrors operators/dedup.cosine_near_duplicates: normalize each vector
    -- ONCE (zero-norm -> divide by 1, vector stays all-zero), then the pair
    -- score is a plain dot product of the normalized vectors
    WITH vecs AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id < {_COS_N}
      UNION ALL
      SELECT vec_id + 20000 AS vec_id, embedding FROM embeddings
      WHERE vec_id < {_COS_N}),
    normed AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE) /
               (CASE WHEN {sql_l2_norm('embedding')} = 0 THEN 1.0
                     ELSE {sql_l2_norm('embedding')} END)) AS nv
      FROM vecs)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND({sql_dot('a.nv', 'b.nv')}, 6) AS cosine
    FROM normed a JOIN normed b ON a.vec_id < b.vec_id
    WHERE cosine >= {_COS_THRESHOLD}
"""


def _cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tbl(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < _COS_N).select("vec_id", "embedding")
    # planted-duplicate union via explode — ONE parquet scan; a two-branch
    # unionByName scans the file twice inside the operator's checkpoint job
    both = emb.select(
        F.explode(F.array(F.col("vec_id"),
                          F.col("vec_id") + 20000)).alias("vec_id"),
        "embedding")
    return dedup.cosine_near_duplicates(both, threshold=_COS_THRESHOLD)


@query(
    "dedup_embedding_cosine",
    survey="north-star dedup (embedding cosine near-dup)",
    oracle=_SQL_COSINE,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cosine_pairs(spark, sf_dir)


# ---------------------------------------------------------------------------
# 5b. embedding-cosine near-dup, sign-LSH scale path (bench pillar)
#
# VERDICT r4 item 4: the benched cosine pillar must exercise a 100 TB-shaped
# plan. This is Charikar-2002 multi-table hyperplane LSH candidate generation
# + exact verification; the quadratic form above stays as the bounded
# verification primitive and the recall oracle below pins the two together.

_LSH_TABLES = 4
_LSH_BITS = 8            # the honesty-eval geometry (borderline-measurable)
_LSH_PILLAR_BITS = 12    # the benched geometry: bits sized so bucket
                         # occupancy ~ n / 2^bits stays small at the pillar's
                         # 2x2,000-vector corpus (8 bits left ~16/bucket and a
                         # within-bucket quadratic tail - measured r5: 4.3 s
                         # -> 2.7 s by widening to 12)
_LSH_N = 2000           # corpus 2×N — affordable because nothing is quadratic
_LSH_THRESHOLD = 0.9


def _sql_hv(i: int) -> str:
    return f"(SELECT embedding FROM embeddings WHERE vec_id = {i})"


def _sql_lsh_bucket(vec_expr: str, t: int, bits: int = _LSH_BITS) -> str:
    terms = [
        f"(CASE WHEN {sql_dot(vec_expr, _sql_hv(t * bits + i))} > 0 "
        f"THEN CAST({1 << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for i in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


def _sql_cosine_lsh(n: int, threshold: float,
                    bits: int = _LSH_BITS) -> str:
    """Oracle twin of cosine_lsh_near_duplicates over the planted-dup corpus:
    bucket on raw-vector sign bits per table, candidate equi-join per table,
    DISTINCT pairs, then the same normalize-once-then-dot verification as
    the exact form."""
    buckets = "\n      UNION ALL ".join(
        f"SELECT vec_id, {t} AS tbl, "
        f"{_sql_lsh_bucket('embedding', t, bits)} AS bucket FROM vecs"
        for t in range(_LSH_TABLES))
    return f"""
    WITH vecs AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id < {n}
      UNION ALL
      SELECT vec_id + 20000 AS vec_id, embedding FROM embeddings
      WHERE vec_id < {n}),
    normed AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE) /
               (CASE WHEN {sql_l2_norm('embedding')} = 0 THEN 1.0
                     ELSE {sql_l2_norm('embedding')} END)) AS nv
      FROM vecs),
    buckets AS (
      {buckets}),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM buckets a JOIN buckets b
        ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
    SELECT c.id_a, c.id_b, ROUND({sql_dot('ka.nv', 'kb.nv')}, 6) AS cosine
    FROM cand c
    JOIN normed ka ON ka.vec_id = c.id_a
    JOIN normed kb ON kb.vec_id = c.id_b
    WHERE cosine >= {threshold}
"""


def _lsh_pairs(spark: SparkSession, sf_dir: str, n: int,
               threshold: float, bits: int = _LSH_BITS) -> DataFrame:
    from pyspark.sql import Window

    emb = tbl(spark, sf_dir, "embeddings")
    # r11: hyperplanes stay IN-PLAN as the bounded (plane_idx, plane)
    # frame (<= tables*bits rows; the row_number window is over that
    # bounded set only) — the old collect()+list comprehension cost one
    # driver-blocking job plus two pickle round trips per call, for rows
    # the broadcast build was going to ship right back (VERDICT r10 #4).
    # plane_idx = position in vec_id order, exactly the old enumerate().
    planes = (emb.filter(F.col("vec_id") < _LSH_TABLES * bits)
              .select("vec_id",
                      F.col("embedding").cast("array<double>")
                      .alias("plane"))
              .withColumn("plane_idx",
                          (F.row_number().over(Window.orderBy("vec_id"))
                           - 1).cast("int"))
              .select("plane_idx", "plane"))
    base = emb.filter(F.col("vec_id") < n).select("vec_id", "embedding")
    both = base.select(
        F.explode(F.array(F.col("vec_id"),
                          F.col("vec_id") + 20000)).alias("vec_id"),
        "embedding")
    return dedup.cosine_lsh_near_duplicates(
        both, planes, threshold=threshold,
        tables=_LSH_TABLES, bits=bits)


@query(
    "dedup_embedding_cosine_lsh",
    survey="north-star dedup (embedding cosine near-dup, sign-LSH scale "
           "path: multi-table bucket join + exact verify)",
    oracle=_sql_cosine_lsh(_LSH_N, _LSH_THRESHOLD, _LSH_PILLAR_BITS),
)
def dedup_embedding_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _lsh_pairs(spark, sf_dir, _LSH_N, _LSH_THRESHOLD,
                      bits=_LSH_PILLAR_BITS)


# eval threshold chosen where the corpus HAS borderline pairs: at 0.5 the
# only qualifying pairs are the planted identical copies (recall trivially
# 1.0 — identical vectors always collide); at 0.35 there are ~164 genuine
# non-identical pairs in the 0.35-0.45 band whose ~69° angle gives each
# sign-LSH table only a ~2% collision rate, so recall honestly measures the
# (tables, bits) geometry instead of a vacuous planted-copy sweep
_LSH_EVAL_THRESHOLD = 0.35

_SQL_LSH_QUALITY = f"""
    WITH ex AS ({_SQL_COSINE.replace(f"cosine >= {_COS_THRESHOLD}",
                                     f"cosine >= {_LSH_EVAL_THRESHOLD}")}),
    ls AS ({_sql_cosine_lsh(_COS_N, _LSH_EVAL_THRESHOLD)}),
    common AS (
      SELECT 1 FROM ls JOIN ex USING (id_a, id_b)),
    stats AS (
      SELECT (SELECT COUNT(*) FROM ex) AS n_exact,
             (SELECT COUNT(*) FROM ls) AS n_lsh,
             (SELECT COUNT(*) FROM common) AS n_common)
    SELECT n_exact, n_lsh, n_common,
           ROUND(CAST(n_common AS DOUBLE) / n_exact, 6) AS recall,
           ROUND(CAST(n_common AS DOUBLE) / n_lsh, 6) AS precision
    FROM stats
"""


@query(
    "dedup_cosine_lsh_quality_eval",
    survey="north-star dedup (LSH-vs-exact cosine recall/precision "
           "honesty check, hash-pinned)",
    oracle=_SQL_LSH_QUALITY,
)
def dedup_cosine_lsh_quality_eval(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Pins the LSH route to the exact truth at the SAME (n, threshold):
    precision must be 1.0 (verification is the identical arithmetic, so LSH
    pairs ⊆ exact pairs — computed, not assumed), recall is whatever the
    (tables, bits, θ) geometry gives and the hash check makes any drift a
    red row. Same pattern as dedup_minhash_quality_eval."""
    # materialize both pair sets ONCE (eager localCheckpoint, the repo's
    # no-persist-leak pattern) — counts + the intersection would otherwise
    # re-run the quadratic truth and the LSH pipeline twice each
    emb = tbl(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < _COS_N).select("vec_id", "embedding")
    both = emb.select(
        F.explode(F.array(F.col("vec_id"),
                          F.col("vec_id") + 20000)).alias("vec_id"),
        "embedding")
    exact = (dedup.cosine_near_duplicates(both,
                                          threshold=_LSH_EVAL_THRESHOLD)
             .select("id_a", "id_b").localCheckpoint(eager=True))
    lsh = (_lsh_pairs(spark, sf_dir, _COS_N, _LSH_EVAL_THRESHOLD)
           .select("id_a", "id_b").localCheckpoint(eager=True))
    n_exact = exact.count()
    n_lsh = lsh.count()
    n_common = lsh.join(exact, ["id_a", "id_b"]).count()
    counts = spark.createDataFrame(
        [(n_exact, n_lsh, n_common)],
        "n_exact long, n_lsh long, n_common long")
    # ratios rounded ENGINE-side: Python round() is banker's (ROUND_NOTES)
    return counts.select(
        "n_exact", "n_lsh", "n_common",
        F.round(F.col("n_common").cast("double") / F.col("n_exact"), 6)
        .alias("recall"),
        F.round(F.col("n_common").cast("double") / F.col("n_lsh"), 6)
        .alias("precision"))


# ---------------------------------------------------------------------------
# 6. transitive clustering: connected components over the near-dup pair graph

_SQL_COMPONENTS = f"""
    WITH RECURSIVE pairs AS ({_SQL_COSINE}),
    nodes AS (SELECT id_a AS node FROM pairs UNION SELECT id_b FROM pairs),
    edges_bi AS (SELECT id_a AS a, id_b AS b FROM pairs
                 UNION SELECT id_b AS a, id_a AS b FROM pairs),
    reach AS (
      SELECT node, node AS lbl FROM nodes
      UNION
      SELECT e.a AS node, r.lbl FROM edges_bi e JOIN reach r ON e.b = r.node),
    comp AS (SELECT node, MIN(lbl) AS component FROM reach GROUP BY node)
    SELECT component, COUNT(*) AS n_members, MAX(node) AS max_member
    FROM comp GROUP BY component ORDER BY component
"""


@query(
    "dedup_component_groups",
    survey="north-star dedup (transitive clustering: iterative connected "
           "components over near-dup pairs)",
    oracle=_SQL_COMPONENTS,
)
def dedup_component_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs → groups: iterative min-label propagation (operators/graph.py)
    resolves the near-dup pair graph into clusters with a deterministic
    canonical representative (min member id). The oracle computes the same
    closure via DuckDB's recursive CTE — an iterative DataFrame algorithm
    checked against recursive SQL."""
    from server2_vector_search_server_spark.operators import graph

    comps = graph.connected_components(
        _cosine_pairs(spark, sf_dir).select("id_a", "id_b"), "id_a", "id_b")
    return graph.component_summary(comps)


@query(
    "dedup_component_groups_star",
    survey="north-star dedup (large-star/small-star connected components: "
           "O(log^2 n) rounds, diameter-independent)",
    oracle=_SQL_COMPONENTS,
)
def dedup_component_groups_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same contract as dedup_component_groups, computed by the
    large-star/small-star algorithm (SCALE.md §12: 13 rounds on a
    4096-chain where propagation needs 4095) — same oracle, different
    physical algorithm, as with the IVF index variants."""
    from server2_vector_search_server_spark.operators import graph

    comps = graph.connected_components_star(
        _cosine_pairs(spark, sf_dir).select("id_a", "id_b"), "id_a", "id_b")
    comps = comps.select(F.col("node"), F.col("component"))
    return graph.component_summary(comps)


# ---------------------------------------------------------------------------
# 7. SemDeDup: cluster-then-prune semantic dedup (Abbas et al. 2023)

_SEM_C = 8           # coarse centroids = first 8 corpus vectors
_SEM_THRESHOLD = 0.95

# corpus: originals ∪ exact copies (+20000) — every copy has cosine 1.0 with
# its original, so the planted duplicates provably exceed the threshold
_SQL_SEM_NORM = f"""
    vecs AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id < {_COS_N}
      UNION ALL
      SELECT vec_id + 20000 AS vec_id, embedding FROM embeddings
      WHERE vec_id < {_COS_N}),
    normed AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE) /
               (CASE WHEN {sql_l2_norm('embedding')} = 0 THEN 1.0
                     ELSE {sql_l2_norm('embedding')} END)) AS nv
      FROM vecs),
    cent AS (SELECT vec_id AS cid, nv AS cv FROM normed
             WHERE vec_id < {_SEM_C}),
    assigned AS (
      SELECT vec_id, cid AS centroid_id FROM (
        SELECT n.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY n.vec_id
                 ORDER BY {sql_sq_l2('n.nv', 'c.cv')} ASC, c.cid ASC) AS rn
        FROM normed n CROSS JOIN cent c) WHERE rn = 1)
"""

_SQL_SEMANTIC = f"""
    WITH {_SQL_SEM_NORM}
    SELECT a.vec_id, a.centroid_id,
           NOT EXISTS (
             SELECT 1 FROM assigned b JOIN normed nb ON nb.vec_id = b.vec_id
             JOIN normed na ON na.vec_id = a.vec_id
             WHERE b.centroid_id = a.centroid_id AND b.vec_id < a.vec_id
               AND ROUND({sql_dot('na.nv', 'nb.nv')}, 6) >= {_SEM_THRESHOLD}
           ) AS is_kept
    FROM assigned a
    ORDER BY a.vec_id
"""


@query(
    "dedup_semantic",
    survey="north-star dedup (SemDeDup: cluster-then-prune — per-cluster "
           "cosine pruning after a coarse-quantizer assignment)",
    oracle=_SQL_SEMANTIC,
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (arXiv:2303.09540) over a corpus with planted exact
    duplicates: IVF-assign to frozen centroids, then drop any vector with a
    lower-id same-cluster neighbor at cosine >= 0.95. The quadratic pair
    problem becomes Σ(cluster²) — the LAION-scale semantic-dedup shape. The
    oracle replays assignment (argmin via ROW_NUMBER) and the drop rule
    (NOT EXISTS) on the same normalized vectors."""
    emb = tbl(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < _COS_N).select("vec_id", "embedding")
    corpus = emb.unionByName(
        emb.select((F.col("vec_id") + 20000).alias("vec_id"), "embedding"))
    centroids = (emb.filter(F.col("vec_id") < _SEM_C)
                 .select(F.col("vec_id").alias("centroid_id"),
                         F.col("embedding").alias("centroid")))
    return dedup.semantic_dedup(
        corpus, centroids, threshold=_SEM_THRESHOLD).orderBy("vec_id")


# ---------------------------------------------------------------------------
# 8. line-level dedup (C4/CCNet boilerplate removal)

_SQL_LINE_DEDUP = """
    WITH corpus AS (
      SELECT doc_id,
             'NAV MENU HOME ABOUT' || chr(10)
             || CASE WHEN doc_id % 2 = 0
                     THEN 'SUBSCRIBE NOW' || chr(10) ELSE '' END
             || CASE WHEN doc_id % 97 = 0
                     THEN 'RARE NOTICE' || chr(10) ELSE '' END
             || text || chr(10) || 'COPYRIGHT ALL RIGHTS RESERVED' AS text
      FROM documents WHERE doc_id < 200),
    split AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM corpus),
    lines AS (
      SELECT s.doc_id, t.i AS line_no,
             trim(list_extract(s.l, t.i)) AS line_key,
             list_extract(s.l, t.i) AS line
      FROM split s, UNNEST(generate_series(1, len(s.l))) AS t(i)
      WHERE trim(list_extract(s.l, t.i)) != ''),
    common AS (
      SELECT line_key FROM lines GROUP BY line_key
      HAVING COUNT(DISTINCT doc_id) >= 5),
    kept AS (SELECT * FROM lines
             WHERE line_key NOT IN (SELECT line_key FROM common)),
    totals AS (SELECT doc_id, COUNT(*) AS n_total FROM lines GROUP BY doc_id)
    SELECT k.doc_id, string_agg(k.line, chr(10) ORDER BY k.line_no) AS text,
           CAST(COUNT(*) AS INTEGER) AS n_kept,
           CAST(ANY_VALUE(t.n_total) - COUNT(*) AS INTEGER) AS n_removed
    FROM kept k JOIN totals t USING (doc_id)
    GROUP BY k.doc_id ORDER BY k.doc_id
"""


@query(
    "dedup_boilerplate_lines",
    survey="north-star dedup (line-level dedup across documents — the "
           "C4/CCNet boilerplate-removal pass)",
    oracle=_SQL_LINE_DEDUP,
)
def dedup_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level dedup: every doc gets injected nav/footer boilerplate
    (all docs), a half-corpus banner (100 docs), and a rare 3-doc notice;
    ``remove_boilerplate_lines(min_docs=5)`` must strip exactly the lines
    above threshold and keep the rare one — posexplode → distinct-doc count
    per line → anti-join → ordinal-ordered reassembly
    (operators/dedup.remove_boilerplate_lines)."""
    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    corpus = docs.select(
        "doc_id",
        F.concat(
            F.lit("NAV MENU HOME ABOUT\n"),
            F.when(F.col("doc_id") % 2 == 0, F.lit("SUBSCRIBE NOW\n"))
            .otherwise(F.lit("")),
            F.when(F.col("doc_id") % 97 == 0, F.lit("RARE NOTICE\n"))
            .otherwise(F.lit("")),
            F.col("text"),
            F.lit("\nCOPYRIGHT ALL RIGHTS RESERVED")).alias("text"))
    out = dedup.remove_boilerplate_lines(corpus, min_docs=5)
    return (out.select("doc_id", "text",
                       F.col("n_kept").cast("int").alias("n_kept"),
                       F.col("n_removed").cast("int").alias("n_removed"))
            .orderBy("doc_id"))


# ---------------------------------------------------------------------------
# 9. exact-substring dedup (Lee et al. 2022 ExactSubstr, windowed form)

_SUBSTR_K = 8
_SUBSTR_CAP = 100

_SQL_SUBSTR_BASE = f"""
    docs2 AS ({_SQL_DOCS}),
    w AS (
      SELECT doc_id, unnest({sql_token_windows('text', _SUBSTR_K)}) AS x
      FROM docs2),
    kw AS (SELECT doc_id, x.pos AS pos, md5(x.win) AS wh FROM w)"""

# pair form: cross-document, frequency-capped (the f² valve);
# span form: >= 2 TOTAL occurrences incl. intra-document, uncapped
_SQL_SUBSTR_COMMON = f"""{_SQL_SUBSTR_BASE},
    dup AS (
      SELECT wh FROM kw GROUP BY wh
      HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND {_SUBSTR_CAP})"""

_SQL_SUBSTR_COMMON_SPAN = f"""{_SQL_SUBSTR_BASE},
    dup AS (SELECT wh FROM kw GROUP BY wh HAVING COUNT(*) >= 2)"""


@query(
    "dedup_substring_pairs",
    survey="north-star dedup (exact-substring dedup, pair form: documents "
           "sharing an exact k-token run — the Lee et al. 2022 ExactSubstr "
           "criterion as a windowed equi-join, frequency-capped against "
           "boilerplate skew)",
    oracle=f"""
    WITH {_SQL_SUBSTR_COMMON},
    dw AS (SELECT DISTINCT doc_id, wh FROM kw JOIN dup USING (wh))
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(COUNT(*) AS BIGINT) AS shared_windows
    FROM dw a JOIN dw b USING (wh)
    WHERE a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    ORDER BY id_a, id_b
    """,
)
def dedup_substring_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc pairs sharing ≥1 exact 8-token window over the planted-dup
    corpus (base / byte-exact copy / perturbed near-copy): every pair of
    variants of the same base doc shares its interior windows, and the
    count of shared windows separates exact copies from tail-perturbed
    ones (operators/dedup.substring_duplicate_pairs)."""
    return (dedup.substring_duplicate_pairs(
        _docs_with_dups(spark, sf_dir),
        window_tokens=_SUBSTR_K, max_doc_freq=_SUBSTR_CAP)
        .orderBy("id_a", "id_b"))


@query(
    "dedup_substring_spans",
    survey="north-star dedup (exact-substring dedup, span form: per-doc "
           "merged duplicated-token intervals — the deletion unit of "
           "ExactSubstr; gaps-and-islands over flagged window starts)",
    oracle=f"""
    WITH {_SQL_SUBSTR_COMMON_SPAN},
    flagged AS (
      SELECT doc_id, pos, pos + {_SUBSTR_K} - 1 AS e
      FROM kw JOIN dup USING (wh)),
    isl AS (
      SELECT doc_id, pos, e,
             CASE WHEN MAX(e) OVER prior IS NULL
                       OR pos > MAX(e) OVER prior
                  THEN 1 ELSE 0 END AS brk
      FROM flagged
      WINDOW prior AS (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
    isl2 AS (
      SELECT doc_id, pos, e,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
      FROM isl)
    SELECT doc_id, MIN(pos) AS span_start, MAX(e) AS span_end,
           CAST(MAX(e) - MIN(pos) + 1 AS BIGINT) AS span_tokens
    FROM isl2 GROUP BY doc_id, island
    ORDER BY doc_id, span_start
    """,
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged duplicated-token spans per document — what ExactSubstr
    deletes. The near-dup variants share the base text but not the
    perturbed tail, so their spans stop short of the document end
    (operators/dedup.substring_duplicate_spans)."""
    return (dedup.substring_duplicate_spans(
        _docs_with_dups(spark, sf_dir), window_tokens=_SUBSTR_K)
        .orderBy("doc_id", "span_start"))


@query(
    "streaming_dedup_minhash",
    survey="I × north-star dedup (streaming FUZZY dedup: MinHash/LSH band "
           "state persisted across micro-batches; id-ordered arrival makes "
           "the online answer equal the batch keep-min oracle)",
    oracle=_SQL_KEEP_MIN,
)
def streaming_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The online twin of dedup_minhash_keep_min: three id-ordered
    micro-batches (originals, near-dup copies, exact copies) flow through
    streaming/fuzzy_dedup.run_minhash_dedup_stream — each batch equi-joins
    its bands against the band table accumulated from PRIOR batches, so
    near-duplicates arriving any number of batches later are suppressed
    without rescanning history. Same SQL oracle as the batch form: the
    stream must converge to the identical kept set."""

    from server2_vector_search_server_spark.streaming.fuzzy_dedup import (
        run_minhash_dedup_stream,
    )

    base = tbl(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _N_BASE).select("doc_id", "text")
    near = base.select((F.col("doc_id") + 10000).alias("doc_id"),
                       F.concat(F.col("text"), F.lit(_PERTURB)).alias("text"))
    exact = base.select((F.col("doc_id") + 20000).alias("doc_id"), "text")
    root = scratch_dir("fuzzy_dedup_stream_")
    src = os.path.join(root, "src")
    os.makedirs(src)
    for i, b in enumerate((base, near, exact)):
        b.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(root, f"stage{i}"))
        part = [p for p in os.listdir(os.path.join(root, f"stage{i}"))
                if p.endswith(".parquet")][0]
        dest = os.path.join(src, f"batch_{i}.parquet")
        os.rename(os.path.join(root, f"stage{i}", part), dest)
        # deterministic batch order: explicit increasing mtimes (the
        # file-stream source orders by modificationTime, path) instead
        # of sleeping past timestamp granularity
        os.utime(dest, (1_000_000_000 + i * 100,) * 2)
    with state_partitions(spark):
        run_minhash_dedup_stream(
            spark, src,
            state_dir=os.path.join(root, "state"),
            kept_dir=os.path.join(root, "kept"),
            checkpoint_dir=os.path.join(root, "ckpt"))
    kept = spark.read.parquet(os.path.join(root, "kept"))
    return (kept.select("doc_id", F.md5("text").alias("content_md5"))
            .orderBy("doc_id"))


# ---------------------------------------------------------------------------
# 12. bloom-gated incremental dedup (new batch vs. existing corpus)

@query(
    "dedup_bloom_incremental",
    survey="north-star dedup (bloom-gated incremental cross-corpus dedup) + "
           "B5-at-scale (batched existence probe, vector_store.py:56-89)",
    oracle="""
    WITH corpus AS (
        SELECT md5(text) AS content_hash FROM documents WHERE doc_id < 400
    ), batch AS (
        SELECT doc_id, md5(text) AS content_hash
        FROM documents WHERE doc_id >= 400
        UNION ALL
        SELECT doc_id + 30000 AS doc_id, md5(text) AS content_hash
        FROM documents WHERE doc_id < 50
    )
    SELECT b.doc_id, b.content_hash FROM batch b
    WHERE NOT EXISTS (
        SELECT 1 FROM corpus c WHERE c.content_hash = b.content_hash)
    ORDER BY b.doc_id
    """,
)
def dedup_bloom_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-crawl dedup: today's batch (genuine new docs + 50 replayed
    corpus docs) against the already-ingested corpus (doc_id < 400), keyed
    on the content digest. The Bloom stage answers "definitely new" with a
    map-side bit test (no join); only the bloom-positive candidates are
    anti-joined against corpus keys for exactness — at 100 TB the corpus is
    scanned once into an 8 KiB filter instead of being re-joined per batch.
    The result is EXACT (one-sided error + verify), so the oracle is the
    plain NOT EXISTS."""
    docs = tbl(spark, sf_dir, "documents")
    corpus = (docs.filter(F.col("doc_id") < 400)
              .select(F.md5("text").alias("content_hash")))
    genuine = docs.filter(F.col("doc_id") >= 400)
    replayed = (docs.filter(F.col("doc_id") < 50)
                .withColumn("doc_id", F.col("doc_id") + 30000))
    batch = (genuine.unionByName(replayed)
             .select("doc_id", F.md5("text").alias("content_hash")))
    return (dedup.bloom_incremental_new_docs(batch, corpus)
            .select("doc_id", "content_hash").orderBy("doc_id"))


# ---------------------------------------------------------------------------
# 10. LSH quality self-eval: candidate recall/precision vs true Jaccard

_SQL_LSH_EVAL = f"""
    WITH docs2 AS ({_SQL_DOCS}),
    sh AS (SELECT doc_id, {sql_word_shingles('text', 3)} AS sh FROM docs2),
    truth AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE {_SQL_JACCARD_EXPR} >= {_JACCARD_THRESHOLD}),
    hs AS (
      SELECT doc_id,
             list_transform({sql_word_shingles('text', 3)},
                            s -> {sql_token_hash('s')}) AS hashes
      FROM docs2),
    sigs AS (SELECT doc_id, {_sql_minhash_sig('hashes')} AS sig FROM hs),
    bands AS ({_sql_band_selects('sigs')}),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b USING (band_index, band_key)
      WHERE a.doc_id < b.doc_id),
    hits AS (SELECT id_a, id_b FROM truth INTERSECT
             SELECT id_a, id_b FROM cand)
    SELECT CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_truth,
           CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_candidates,
           CAST((SELECT COUNT(*) FROM hits) AS BIGINT) AS n_hits,
           ROUND(CAST((SELECT COUNT(*) FROM hits) AS DOUBLE)
                 / (SELECT COUNT(*) FROM truth), 6) AS recall,
           ROUND(CAST((SELECT COUNT(*) FROM hits) AS DOUBLE)
                 / (SELECT COUNT(*) FROM cand), 6) AS precision
"""


@query(
    "dedup_minhash_quality_eval",
    survey="north-star dedup (LSH honesty check: band-candidate recall & "
           "precision against ground-truth 3-gram Jaccard pairs — the "
           "dedup-side analog of the ann_*_recall_at_k family)",
    oracle=_SQL_LSH_EVAL,
)
def dedup_minhash_quality_eval(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Measure what the banded index actually buys: candidates from the
    (band_index, band_key) equi-join, truth from exact 3-gram Jaccard ≥
    0.5, and the confusion counts between them as one hash-checked row.
    Measured on the planted corpus (sf0.01): recall 0.994444 — banding
    misses 2 of 360 truth pairs, borderline ~0.5-Jaccard pairs whose
    signatures never collide in any of the 8 bands (the b·r S-curve is
    ~50% at 0.5 by design) — and precision 1.0 (every band collision was
    a true pair here; on adversarial corpora banding over-generates and
    the est-Jaccard verify prunes).

    Scale honesty: TRUTH here is the quadratic pair join — affordable only
    at eval subset size, which is exactly how production LSH is tuned
    (sample a slice, sweep bands×rows against exact Jaccard on the slice,
    deploy the banding that hits the recall target). The CANDIDATE side is
    the banded equi-join that scales; nothing in the deployed path is
    quadratic."""
    docs = _docs_with_dups(spark, sf_dir)
    # materialize both pair sets ONCE (eager localCheckpoint, the repo's
    # no-persist-leak pattern): three separate count() actions would
    # re-run the quadratic truth join and the band join twice each
    truth = (dedup.ngram_jaccard_pairs(docs, threshold=_JACCARD_THRESHOLD)
             .select("id_a", "id_b").localCheckpoint(eager=True))
    cand = (dedup.minhash_candidate_pairs(dedup.add_minhash(docs))
            .localCheckpoint(eager=True))
    hits = truth.join(cand, ["id_a", "id_b"])
    n_truth = truth.count()
    n_cand = cand.count()
    n_hits = hits.count()
    # ratios rounded ENGINE-side: Python round() is banker's, Spark/DuckDB
    # ROUND is half-away — the one-ulp trap ROUND_NOTES documents
    counts = spark.createDataFrame(
        [(n_truth, n_cand, n_hits)],
        "n_truth long, n_candidates long, n_hits long")
    return counts.select(
        "n_truth", "n_candidates", "n_hits",
        F.round(F.col("n_hits").cast("double") / F.col("n_truth"), 6)
        .alias("recall"),
        F.round(F.col("n_hits").cast("double") / F.col("n_candidates"), 6)
        .alias("precision"))


@query(
    "dedup_jaccard_prefix_filter",
    survey="north-star dedup (AllPairs/PPJoin prefix filtering: EXACT "
           "threshold-Jaccard pairs from a rare-token prefix equi-join — "
           "no false negatives, unlike LSH banding; same oracle as the "
           "quadratic reference, which IS the exactness proof)",
    oracle=_SQL_JACCARD,
)
def dedup_jaccard_prefix_filter(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Same answer as `dedup_ngram_jaccard`, different physics: candidates
    come from an equi-join on each document's rarest
    ``|x| − ceil(t·|x|) + 1`` shingles (global df order) instead of the
    all-pairs cross join; exact Jaccard verifies candidates only. The
    shared quadratic oracle hash-pins that prefix filtering dropped
    nothing — the lossless counterpart to `dedup_minhash_quality_eval`'s
    measured LSH recall of 0.994."""
    return dedup.prefix_filter_jaccard_pairs(
        _docs_with_dups(spark, sf_dir), threshold=_JACCARD_THRESHOLD)


@query(
    "dedup_tfidf_cosine_pairs",
    survey="north-star dedup (sparse TF-IDF cosine all-pairs via "
           "inverted-index self-join — Bayardo et al. WWW'07 DAAT shape; "
           "catches copy-edits that reordering hides from shingle "
           "methods)",
    oracle="""
    WITH docs AS (
      SELECT doc_id, lower(text) AS text FROM documents WHERE doc_id < 200),
    terms AS (
      SELECT doc_id, t.term
      FROM docs, UNNEST(list_filter(
             string_split_regex(trim(text), '\\s+'), x -> x <> ''))
           AS t(term)),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term),
    df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM terms GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM docs),
    w AS (
      SELECT tf.doc_id, tf.term,
             CAST(tf.tf AS DOUBLE)
               * (CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)) AS w
      FROM tf JOIN df USING (term) CROSS JOIN n),
    norms AS (
      SELECT doc_id,
             sqrt(SUM(CAST(ROUND(w * w * 1000000.0) AS BIGINT))
                  / 1000000.0) AS nrm
      FROM w GROUP BY doc_id),
    dots AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             SUM(CAST(ROUND(a.w * b.w * 1000000.0) AS BIGINT)) AS dot_micro
      FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT doc_a, doc_b,
           ROUND((CAST(dot_micro AS DOUBLE) / 1000000.0)
                 / (x.nrm * y.nrm), 6) AS cosine
    FROM dots
    JOIN norms x ON x.doc_id = doc_a
    JOIN norms y ON y.doc_id = doc_b
    WHERE ROUND((CAST(dot_micro AS DOUBLE) / 1000000.0)
                / (x.nrm * y.nrm), 6) >= 0.9
    ORDER BY doc_a, doc_b
    """,
)
def dedup_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse lexical near-dup pairs at cosine >= 0.9 over the raw
    documents table (not the planted-dup fixture — the corpus's own
    near-dups). The 0.9 threshold isolates true rewrites: at fixture
    scale the pair histogram drops from ~750 pairs at 0.8 to ~5 at 0.9.
    Exact integer micro-unit accumulation makes the float sums
    shuffle-order-proof on both engines."""
    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return (dedup.tfidf_cosine_pairs(docs, min_cosine=0.9)
            .orderBy("doc_a", "doc_b"))


_CDC_K = 4
_CDC_DIV = 8
_CDC_PREFIX = "qq ww "


@query(
    "dedup_cdc_chunks",
    survey="north-star dedup (content-defined chunking, LBFS/gear-CDC "
           "mod-rule: boundaries from local window hashes realign after "
           "a prefix edit, so chunk-level dedup survives edits that "
           "misalign fixed-size chunks)",
    oracle=f"""
    WITH docs2 AS (
      SELECT doc_id, text FROM documents WHERE doc_id < {_N_BASE}
      UNION ALL
      SELECT doc_id + 10000 AS doc_id, '{_CDC_PREFIX}' || text AS text
      FROM documents WHERE doc_id < {_N_BASE}),
    tk AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         x -> x <> '') AS toks,
             list_transform({sql_token_windows('text', _CDC_K)},
                            s -> {sql_token_hash('s.win')}) AS hl
      FROM docs2),
    bounds AS (
      SELECT doc_id, toks,
             list_sort(list_distinct(list_concat(
               list_transform(
                 list_filter(range(1, len(hl) + 1),
                             p -> hl[p] % {_CDC_DIV} = 0),
                 p -> p + {_CDC_K - 1}),
               [CAST(len(toks) AS BIGINT)]))) AS ends
      FROM tk),
    chunks AS (
      SELECT doc_id,
             md5(array_to_string(list_slice(toks, c.s, c.e), ' ')) AS digest
      FROM (
        SELECT doc_id, toks,
               unnest(list_filter(
                 list_transform(range(1, len(ends) + 1),
                   m -> {{'s': CASE WHEN m = 1 THEN CAST(1 AS BIGINT)
                               ELSE ends[m - 1] + 1 END,
                         'e': ends[m]}}),
                 c -> c.e >= c.s)) AS c
        FROM bounds)),
    pairs AS (SELECT DISTINCT doc_id, digest FROM chunks),
    realign AS (
      SELECT COUNT(*) AS realigned
      FROM pairs b JOIN pairs t
        ON t.doc_id = b.doc_id + 10000 AND t.digest = b.digest
      WHERE b.doc_id < 10000)
    SELECT CAST((SELECT COUNT(*) FROM docs2) AS BIGINT) AS n_docs,
           CAST((SELECT COUNT(*) FROM chunks) AS BIGINT) AS total_chunks,
           CAST((SELECT COUNT(DISTINCT digest) FROM chunks) AS BIGINT)
             AS distinct_digests,
           ROUND(1.0 - CAST((SELECT COUNT(DISTINCT digest) FROM chunks)
                            AS DOUBLE)
                       / (SELECT COUNT(*) FROM chunks), 6) AS dedup_ratio,
           CAST((SELECT realigned FROM realign) AS BIGINT)
             AS realigned_matches,
           CAST((SELECT COUNT(*) FROM pairs WHERE doc_id < 10000)
                AS BIGINT) AS base_chunk_pairs
    """,
)
def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level dedup over content-defined boundaries: every base
    document is paired with a PREFIX-edited copy (the edit class that
    defeats fixed-size chunking entirely), both are CDC-chunked, and the
    summary row proves the property — ``realigned_matches`` counts base
    (doc, chunk-digest) pairs that reappear verbatim in the edited twin
    (expected: nearly all chunks after the first boundary), and
    ``dedup_ratio`` is the storage win from digest-level dedup. All
    counts exact; the ratio is one deterministic division."""
    base = (tbl(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < _N_BASE).select("doc_id", "text"))
    variants = F.array(
        F.struct(F.col("doc_id"), F.col("text")),
        F.struct((F.col("doc_id") + 10000).alias("doc_id"),
                 F.concat(F.lit(_CDC_PREFIX), F.col("text"))
                 .alias("text")))
    docs2 = (base.select(F.explode(variants).alias("v"))
             .select("v.doc_id", "v.text"))
    # materialize the chunk digests ONCE (round 10): four summary branches
    # (stats, realign, base_pairs, and the distinct pair table twice) hang
    # off this frame, and Spark shares no subtrees across branches — the
    # unmaterialized form re-ran the CDC window-hash chunking per branch
    chunks = (dedup.cdc_chunks(docs2, k=_CDC_K, divisor=_CDC_DIV)
              .withColumn("digest", F.md5("chunk_text"))
              .select("doc_id", "digest")
              .localCheckpoint(eager=True))
    stats = chunks.agg(
        F.count(F.lit(1)).cast("long").alias("total_chunks"),
        F.count_distinct("digest").cast("long").alias("distinct_digests"))
    pairs = chunks.distinct()
    b = pairs.filter(F.col("doc_id") < 10000)
    t = (pairs.filter(F.col("doc_id") >= 10000)
         .select((F.col("doc_id") - 10000).alias("doc_id"), "digest"))
    realign = b.join(t, ["doc_id", "digest"]).agg(
        F.count(F.lit(1)).cast("long").alias("realigned_matches"))
    base_pairs = b.agg(
        F.count(F.lit(1)).cast("long").alias("base_chunk_pairs"))
    n_docs = docs2.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    return (n_docs.crossJoin(stats).crossJoin(realign)
            .crossJoin(base_pairs)
            .select("n_docs", "total_chunks", "distinct_digests",
                    F.round(F.lit(1.0)
                            - F.col("distinct_digests").cast("double")
                            / F.col("total_chunks"), 6)
                    .alias("dedup_ratio"),
                    "realigned_matches", "base_chunk_pairs"))


@query(
    "dedup_canonicalized",
    survey="north-star dedup (canonicalization-aware exact dedup: "
           "lower/strip-punctuation/collapse-whitespace before hashing — "
           "the C4/RefinedWeb normalization pass that catches trivial "
           "variants raw digests miss)",
    oracle=f"""
    WITH docs2 AS (
      SELECT doc_id, text FROM documents WHERE doc_id < {_N_BASE}
      UNION ALL
      SELECT doc_id + 30000 AS doc_id, upper(text) || ' !!' AS text
      FROM documents WHERE doc_id < {_N_BASE}),
    canon AS (
      SELECT doc_id, text,
             trim(regexp_replace(regexp_replace(lower(text),
                  '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS ctext
      FROM docs2),
    raw_groups AS (
      SELECT md5(text) AS h, COUNT(*) AS n FROM canon GROUP BY h),
    canon_groups AS (
      SELECT md5(ctext) AS h, COUNT(*) AS n FROM canon GROUP BY h)
    SELECT CAST((SELECT COUNT(*) FROM canon) AS BIGINT) AS n_docs,
           CAST((SELECT COALESCE(SUM(n), 0) FROM raw_groups WHERE n > 1)
                AS BIGINT) AS raw_dup_docs,
           CAST((SELECT COUNT(*) FROM raw_groups WHERE n > 1) AS BIGINT)
             AS raw_dup_groups,
           CAST((SELECT COALESCE(SUM(n), 0) FROM canon_groups WHERE n > 1)
                AS BIGINT) AS canon_dup_docs,
           CAST((SELECT COUNT(*) FROM canon_groups WHERE n > 1) AS BIGINT)
             AS canon_dup_groups
    """,
)
def dedup_canonicalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup AFTER text canonicalization (lowercase, punctuation →
    space, whitespace collapse, trim) vs on raw bytes, over a corpus
    where every base document has a case-flipped punctuation-appended
    twin. Raw digests see zero duplicate groups; canonical digests pair
    every twin — the checked row pins both counts, so a normalization
    regression (missed class, wrong collapse order) is a value diff, not
    a vibe. Same one-shuffle digest-groupBy shape as ``dedup_exact``;
    the canonicalization is a scan-fused projection, free at 100 TB."""
    base = (tbl(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < _N_BASE).select("doc_id", "text"))
    variants = F.array(
        F.struct(F.col("doc_id"), F.col("text")),
        F.struct((F.col("doc_id") + 30000).alias("doc_id"),
                 F.concat(F.upper(F.col("text")), F.lit(" !!"))
                 .alias("text")))
    docs2 = (base.select(F.explode(variants).alias("v"))
             .select("v.doc_id", "v.text"))
    canon = docs2.withColumn(
        "ctext",
        F.trim(F.regexp_replace(F.regexp_replace(
            F.lower(F.col("text")), "[^a-z0-9 ]", " "), " +", " ")))

    def dup_stats(col, prefix):
        g = canon.groupBy(F.md5(col).alias("h")) \
            .agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") > 1)
        return g.agg(
            F.coalesce(F.sum("n"), F.lit(0)).cast("long")
            .alias(f"{prefix}_dup_docs"),
            F.count(F.lit(1)).cast("long").alias(f"{prefix}_dup_groups"))

    n_docs = docs2.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    return (n_docs.crossJoin(dup_stats(F.col("text"), "raw"))
            .crossJoin(dup_stats(F.col("ctext"), "canon"))
            .select("n_docs", "raw_dup_docs", "raw_dup_groups",
                    "canon_dup_docs", "canon_dup_groups"))


@query(
    "dedup_containment_pairs",
    survey="north-star dedup (asymmetric Jaccard CONTAINMENT via shingle "
           "equi-join: catches excerpt/quote inclusion that symmetric "
           "Jaccard misses by construction)",
    oracle=f"""
    WITH docs2 AS (
      SELECT doc_id, text FROM documents WHERE doc_id < {_N_BASE}
      UNION ALL
      SELECT doc_id + 40000 AS doc_id,
             array_to_string(list_filter(string_split_regex(trim(text),
               '\\s+'), x -> x <> '')[1:15], ' ') AS text
      FROM documents WHERE doc_id < {_N_BASE}),
    sh AS (
      SELECT doc_id, unnest({sql_word_shingles('text', 3)}) AS s
      FROM docs2),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT doc_a, doc_b,
           ROUND(CAST(i AS DOUBLE)
                 / CASE WHEN x.sz < y.sz THEN x.sz ELSE y.sz END, 6)
             AS containment,
           ROUND(CAST(i AS DOUBLE) / (x.sz + y.sz - i), 6) AS jaccard
    FROM inter
    JOIN sizes x ON x.doc_id = doc_a
    JOIN sizes y ON y.doc_id = doc_b
    WHERE ROUND(CAST(i AS DOUBLE)
                / CASE WHEN x.sz < y.sz THEN x.sz ELSE y.sz END, 6) >= 0.9
      AND ROUND(CAST(i AS DOUBLE) / (x.sz + y.sz - i), 6) < 0.5
    ORDER BY doc_a, doc_b
    """,
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Excerpt detection: every base document gets a planted 15-token
    excerpt twin; the checked pairs have shingle CONTAINMENT >= 0.9 (the
    excerpt's shingles live almost entirely inside the source) while
    symmetric Jaccard stays < 0.5 (the size imbalance drowns the
    intersection) — the exact blind spot of every symmetric-threshold
    dedup stage, which is why contamination/quote screens key on
    containment. Same shingle equi-join shuffle as the Jaccard family
    (∝ Σ freq(shingle)²), one extra size join; the df-cap valve from
    the DAAT section applies unchanged at 100 TB."""
    docs2 = (tbl(spark, sf_dir, "documents")
             .filter(F.col("doc_id") < _N_BASE)
             .select(F.explode(F.array(
                 F.struct(F.col("doc_id"), F.col("text")),
                 F.struct((F.col("doc_id") + 40000).alias("doc_id"),
                          F.concat_ws(" ", F.slice(
                              tokens(F.col("text")), 1, 15))
                          .alias("text")))).alias("v"))
             .select("v.doc_id", "v.text"))
    sh = docs2.select("doc_id",
                      F.explode(word_shingles(F.col("text"), 3)).alias("s"))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (a.join(b, (F.col("a.s") == F.col("b.s"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .groupBy(F.col("a.doc_id").alias("doc_a"),
                      F.col("b.doc_id").alias("doc_b"))
             .agg(F.count(F.lit(1)).alias("i")))
    x = sizes.select(F.col("doc_id").alias("doc_a"),
                     F.col("sz").alias("sz_a"))
    y = sizes.select(F.col("doc_id").alias("doc_b"),
                     F.col("sz").alias("sz_b"))
    cont = F.round(F.col("i").cast("double")
                   / F.least("sz_a", "sz_b"), 6)
    jac = F.round(F.col("i").cast("double")
                  / (F.col("sz_a") + F.col("sz_b") - F.col("i")), 6)
    return (inter.join(x, "doc_a").join(y, "doc_b")
            .withColumn("containment", cont).withColumn("jaccard", jac)
            .filter((F.col("containment") >= 0.9)
                    & (F.col("jaccard") < 0.5))
            .select("doc_a", "doc_b", "containment", "jaccard")
            .orderBy("doc_a", "doc_b"))


# ---------------------------------------------------------------------------
# Sorted-neighborhood blocking (Hernandez & Stolfo 1995)

_SNM_WINDOW = 4          # compare each record with the next w-1 in key order
_SNM_KEY_LEN = 40
_SNM_THRESHOLD = 0.5


@query(
    "dedup_sorted_neighborhood",
    survey="north-star dedup (sorted-neighborhood blocking: fabricated "
           "sort key -> within-block sliding window of w=4 -> exact "
           "3-gram Jaccard verify; the merge/purge method, Hernandez & "
           "Stolfo 1995)",
    oracle=f"""
    WITH docs2 AS ({_SQL_DOCS}),
    keyed AS (
      SELECT doc_id, text,
             substr(trim(text), 1, {_SNM_KEY_LEN}) AS snm_key,
             substr(trim(text), 1, 1) AS blk
      FROM docs2),
    nbrs AS (
      SELECT doc_id, text, i,
             lead(doc_id, i) OVER (PARTITION BY blk, i
                                   ORDER BY snm_key, doc_id) AS nbr_id,
             lead(text, i) OVER (PARTITION BY blk, i
                                 ORDER BY snm_key, doc_id) AS nbr_text
      FROM keyed, UNNEST([1, 2, 3]) AS u(i)),
    cand AS (
      SELECT LEAST(doc_id, nbr_id) AS id_a,
             GREATEST(doc_id, nbr_id) AS id_b,
             {sql_word_shingles('text', 3)} AS sha,
             {sql_word_shingles('nbr_text', 3)} AS shb
      FROM nbrs WHERE nbr_id IS NOT NULL),
    verified AS (
      SELECT DISTINCT id_a, id_b,
             ROUND(CASE WHEN len(list_distinct(sha || shb)) = 0 THEN 0.0
                   ELSE CAST(len(list_intersect(sha, shb)) AS DOUBLE)
                        / CAST(len(list_distinct(sha || shb)) AS DOUBLE)
                   END, 6) AS jaccard
      FROM cand)
    SELECT id_a, id_b, jaccard FROM verified
    WHERE jaccard >= {_SNM_THRESHOLD}
    ORDER BY id_a, id_b
    """,
)
def dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood dedup blocking (the merge/purge method): sort by
    a fabricated key (text prefix), slide a w-record window, verify only
    window pairs with exact 3-gram Jaccard. The third classic blocking
    family next to the engine's LSH banding and prefix-filtering —
    near-identical records sort adjacent, so candidate count is w*n
    REGARDLESS of cluster size (LSH's hot-bucket quadratic risk doesn't
    exist here; the trade is recall for pairs whose keys diverge early).

    Scale shape: keys partition by a coarse block (first key char) so the
    sort + lead window is per-block distributed, never a single global
    partition; candidates are generated by w-1 lead() columns over ONE
    sorted pass (no self-join), and the Jaccard verify touches only the
    3(w-1)n candidate rows. At 100 TB this is a repartitionByRange + local
    sort — the exact shape Spark's own sort-merge machinery provides."""
    from pyspark.sql import Window

    docs = _docs_with_dups(spark, sf_dir)
    keyed = docs.select(
        "doc_id", "text",
        F.substring(F.trim(F.col("text")), 1, _SNM_KEY_LEN).alias("snm_key"),
        F.substring(F.trim(F.col("text")), 1, 1).alias("blk"))
    w = Window.partitionBy("blk").orderBy("snm_key", "doc_id")
    nbr = F.array(*[
        F.lead(F.struct(F.col("doc_id").alias("nid"),
                        F.col("text").alias("ntext")), i).over(w)
        for i in range(1, _SNM_WINDOW)])
    # window exprs can't nest under the explode in one projection
    # (UNSUPPORTED_EXPR_FOR_OPERATOR) — materialize the lead array first
    cand = (keyed.select("doc_id", "text", nbr.alias("nbrs"))
            .select("doc_id", "text", F.explode("nbrs").alias("n"))
            .filter(F.col("n.nid").isNotNull())
            # the blk windows coalesce to ~1 partition and the shingle
            # HOFs are interpreted per-row work — spread the verify
            # across cores BEFORE building the arrays (the _widen trap:
            # measured 12 s -> ~2 s at sf0.1 on one core vs 32)
            .repartition(keyed.sparkSession.sparkContext
                         .defaultParallelism)
            .select(F.least("doc_id", "n.nid").alias("id_a"),
                    F.greatest("doc_id", "n.nid").alias("id_b"),
                    word_shingles(F.col("text")).alias("sha"),
                    word_shingles(F.col("n.ntext")).alias("shb")))
    # one intersect per pair: |union| = |a| + |b| - |intersect| (shingle
    # arrays are distinct by construction). Every COLUMN REFERENCE to an
    # expression duplicates its subtree after projection collapse — the
    # WHEN/ratio form re-evaluated the set ops ~4x per row (measured 12 s
    # for 966 pairs at sf0.1) — so the set sizes materialize through a
    # localCheckpoint (966 scalar rows) before the ratio arithmetic.
    sized = (cand.select(
        "id_a", "id_b",
        F.size(F.array_intersect("sha", "shb")).alias("si"),
        F.size("sha").alias("sa"), F.size("shb").alias("sb"))
        .localCheckpoint(eager=True))
    su = F.col("sa") + F.col("sb") - F.col("si")
    jac = F.round(F.when(su == 0, F.lit(0.0))
                  .otherwise(F.col("si").cast("double")
                             / su.cast("double")), 6)
    return (sized.select("id_a", "id_b", jac.alias("jaccard")).distinct()
            .filter(F.col("jaccard") >= _SNM_THRESHOLD)
            .orderBy("id_a", "id_b"))


# ---------------------------------------------------------------------------
# B-cubed clustering quality vs the planted duplicate truth

_B3_PREFIX = 40


@query(
    "dedup_bcubed_cluster_eval",
    survey="north-star dedup (B-cubed precision/recall/F1 of a prefix-key "
           "clustering against the planted duplicate truth — the item-"
           "level cluster-quality metric, Bagga & Baldwin 1998; "
           "complements the pair-level dedup_minhash_pr_curve)",
    oracle=f"""
    WITH docs2 AS ({_SQL_DOCS}),
    items AS (
      SELECT doc_id,
             md5(substr(trim(text), 1, {_B3_PREFIX})) AS cl,
             doc_id % 10000 AS truth
      FROM docs2),
    ct AS (
      SELECT cl, truth, CAST(COUNT(*) AS BIGINT) AS n_ct
      FROM items GROUP BY cl, truth),
    csz AS (SELECT cl, SUM(n_ct) AS n_c FROM ct GROUP BY cl),
    tsz AS (SELECT truth, SUM(n_ct) AS n_t FROM ct GROUP BY truth),
    terms AS (
      SELECT ct.n_ct,
             CAST(ROUND(CAST(ct.n_ct AS DOUBLE) * ct.n_ct / csz.n_c
                        * 1000000) AS BIGINT) AS p_micro,
             CAST(ROUND(CAST(ct.n_ct AS DOUBLE) * ct.n_ct / tsz.n_t
                        * 1000000) AS BIGINT) AS r_micro
      FROM ct JOIN csz ON csz.cl = ct.cl
              JOIN tsz ON tsz.truth = ct.truth),
    agg AS (
      SELECT SUM(n_ct) AS n, SUM(p_micro) AS sp, SUM(r_micro) AS sr
      FROM terms)
    SELECT CAST(n AS BIGINT) AS n_items,
           ROUND(sp / 1000000.0 / n, 6) AS bcubed_precision,
           ROUND(sr / 1000000.0 / n, 6) AS bcubed_recall,
           ROUND(2.0 * (sp / 1000000.0 / n) * (sr / 1000000.0 / n)
                 / (sp / 1000000.0 / n + sr / 1000000.0 / n), 6)
             AS bcubed_f1
    FROM agg
    """,
)
def dedup_bcubed_cluster_eval(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """B-cubed evaluation of a dedup clustering: per-item precision
    |C(i) cap T(i)|/|C(i)| and recall |C(i) cap T(i)|/|T(i)| averaged over
    items — the cluster-quality metric that (unlike pair F1) doesn't let
    one giant cluster dominate. System clusters here are text-prefix keys
    (a deliberately imperfect fast clustering: planted near/exact copies
    share prefixes, but so do unrelated template docs — so precision
    measures real over-merging); truth is the planted variant family.

    Scale shape: B-cubed reduces EXACTLY to the (cluster, truth)
    contingency counts — three partial-aggregable groupBys and a bounded
    join; per-cell terms n_ct^2/|C| round to micro-units so the item
    average folds as integers. No per-item pair expansion exists at any
    scale."""
    docs = _docs_with_dups(spark, sf_dir)
    items = docs.select(
        "doc_id",
        F.md5(F.substring(F.trim(F.col("text")), 1, _B3_PREFIX))
        .alias("cl"),
        (F.col("doc_id") % 10000).alias("truth"))
    ct = (items.groupBy("cl", "truth")
          .agg(F.count(F.lit(1)).cast("long").alias("n_ct")))
    csz = ct.groupBy("cl").agg(F.sum("n_ct").alias("n_c"))
    tsz = ct.groupBy("truth").agg(F.sum("n_ct").alias("n_t"))
    terms = (ct.join(csz, "cl").join(tsz, "truth")
             .select("n_ct",
                     F.round(F.col("n_ct").cast("double") * F.col("n_ct")
                             / F.col("n_c") * 1_000_000).cast("long")
                     .alias("p_micro"),
                     F.round(F.col("n_ct").cast("double") * F.col("n_ct")
                             / F.col("n_t") * 1_000_000).cast("long")
                     .alias("r_micro")))
    agg = terms.agg(F.sum("n_ct").alias("n"),
                    F.sum("p_micro").alias("sp"),
                    F.sum("r_micro").alias("sr"))
    p = F.col("sp") / 1_000_000.0 / F.col("n")
    r = F.col("sr") / 1_000_000.0 / F.col("n")
    return agg.select(
        F.col("n").cast("long").alias("n_items"),
        F.round(p, 6).alias("bcubed_precision"),
        F.round(r, 6).alias("bcubed_recall"),
        F.round(2.0 * p * r / (p + r), 6).alias("bcubed_f1"))


# ---------------------------------------------------------------------------
# Homoglyph-skeleton dedup (adversarial evasion canonicalization)

# Cyrillic/Greek lookalikes -> ASCII skeleton (a bounded, public confusable
# subset of Unicode TR39; translate() handles the 1:1 mapping in one pass)
_HG_FROM = "аеорсхуοα"
_HG_TO = "aeopcxyoa"
_HG_N = 80


@query(
    "dedup_homoglyph_skeleton",
    survey="north-star dedup (homoglyph-evasion canonicalization: "
           "Unicode-confusable skeleton via translate(), TR39-style — "
           "raw digests MISS the planted Cyrillic-lookalike copies, "
           "skeleton digests catch them; both counts pinned)",
    oracle=f"""
    WITH docs2 AS (
      SELECT doc_id, text FROM documents WHERE doc_id < {_HG_N}
      UNION ALL
      SELECT doc_id + 40000 AS doc_id,
             translate(text, '{_HG_TO}', '{_HG_FROM}') AS text
      FROM documents WHERE doc_id < {_HG_N} AND doc_id % 2 = 0),
    keyed AS (
      SELECT doc_id, md5(text) AS raw_hash,
             md5(translate(text, '{_HG_FROM}', '{_HG_TO}')) AS skel_hash
      FROM docs2),
    raw_d AS (
      SELECT raw_hash FROM keyed GROUP BY raw_hash HAVING COUNT(*) > 1),
    skel AS (
      SELECT skel_hash, MIN(doc_id) AS keep_id, COUNT(*) AS cluster_size
      FROM keyed GROUP BY skel_hash HAVING COUNT(*) > 1)
    SELECT CAST((SELECT COUNT(*) FROM raw_d) AS BIGINT)
             AS raw_dup_clusters,
           CAST(COUNT(*) AS BIGINT) AS skeleton_dup_clusters,
           CAST(SUM(cluster_size - 1) AS BIGINT) AS evasive_copies_caught
    FROM skel
    """,
)
def dedup_homoglyph_skeleton(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Adversarial dedup evasion: copies rewritten with Cyrillic/Greek
    lookalike characters hash differently, so digest dedup silently
    re-admits them — the standard spam/content-farm trick. The skeleton
    transform (Unicode TR39 confusable folding, here the bounded
    high-frequency subset via one translate() pass) canonicalizes before
    hashing: the oracle pins that RAW digests find zero duplicate
    clusters among the planted evasive copies while skeleton digests
    catch every one.

    Scale shape: translate() is a per-row column expression inside the
    scan (no UDF, no join); the dedup itself stays the exact hash-groupBy.
    A full TR39 table at scale is the same plan with a longer mapping
    string."""
    docs = (tbl(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < _HG_N).select("doc_id", "text"))
    evasive = (docs.filter(F.col("doc_id") % 2 == 0)
               .select((F.col("doc_id") + 40000).alias("doc_id"),
                       F.translate("text", _HG_TO, _HG_FROM).alias("text")))
    corpus = docs.unionByName(evasive)
    keyed = corpus.select(
        "doc_id", F.md5("text").alias("raw_hash"),
        F.md5(F.translate("text", _HG_FROM, _HG_TO)).alias("skel_hash"))
    raw_d = (keyed.groupBy("raw_hash").agg(F.count(F.lit(1)).alias("c"))
             .filter(F.col("c") > 1)
             .agg(F.count(F.lit(1)).cast("long")
                  .alias("raw_dup_clusters")))
    skel = (keyed.groupBy("skel_hash")
            .agg(F.count(F.lit(1)).alias("cluster_size"))
            .filter(F.col("cluster_size") > 1)
            .agg(F.count(F.lit(1)).cast("long")
                 .alias("skeleton_dup_clusters"),
                 F.sum(F.col("cluster_size") - 1).cast("long")
                 .alias("evasive_copies_caught")))
    return raw_d.join(F.broadcast(skel)).select(
        "raw_dup_clusters", "skeleton_dup_clusters",
        "evasive_copies_caught")
