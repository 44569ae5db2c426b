"""Text analytics for training-data pipelines: language-ID heuristic, quality
scoring, token counting, document fingerprinting.

Part of the beyond-reference LLM-pipeline surface (BASELINE.json north star).
All pure column expressions — at 100 TB these are narrow projections fused
into the scan by whole-stage codegen; zero shuffles, zero Python.

Cross-engine parity: every scalar here has an exact DuckDB twin in
``plans/text_queries.py`` (shared stopword literals, the portable token hash,
identical cast/round order).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from server2_vector_search_server_spark.functions.text import (
    token_hash,
    token_windows,
    tokens,
    word_shingles,
)

# Minimal function-word lists for the language-ID heuristic. The fixture
# corpus is synthetic English-ish tokens, so the heuristic mostly votes 'en' —
# what matters is that the *mechanism* (per-language stopword hit-rate,
# argmax with deterministic tie-break) is real and scale-shaped.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "una", "por", "con"],
    "de": ["der", "die", "das", "und", "zu", "den", "von", "ist", "mit", "ein"],
}


def token_count(text: Column) -> Column:
    """Whitespace token count (the BPE-ish regex variant is
    ``approx_bpe_token_count``)."""
    return F.size(tokens(text))


def approx_bpe_token_count(text: Column) -> Column:
    """BPE-ish token estimate: words plus an extra token per 4 chars of long
    words (subword splits), plus punctuation runs — a deterministic,
    cross-engine-reproducible stand-in for a real tokenizer."""
    toks = tokens(text)
    subword_extra = F.aggregate(
        toks, F.lit(0).cast("long"),
        lambda acc, t: acc + F.floor(F.length(t) / 4).cast("long"))
    return (F.size(toks).cast("long") + subword_extra)


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = tokens(text)
    hits = F.size(F.filter(
        toks, lambda t: F.lower(t).isin(*STOPWORDS[lang])))
    return F.when(F.size(toks) == 0, F.lit(0.0)) \
            .otherwise(hits.cast("double") / F.size(toks).cast("double"))


def detect_language(text: Column) -> Column:
    """Language-ID heuristic: argmax of per-language stopword hit counts,
    ties broken by language code order, 'und' when no hits at all."""
    toks = tokens(text)

    def _hit_fn(sw):
        # single-arg closure: PySpark higher-order lambdas must match arity
        return lambda t: F.lower(t).isin(*sw)

    scores = [
        (lang, F.size(F.filter(toks, _hit_fn(sw))))
        for lang, sw in sorted(STOPWORDS.items())
    ]
    best = None
    best_score = None
    for lang, score in scores:
        if best is None:
            best, best_score = F.lit(lang), score
        else:
            cond = score > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, score).otherwise(best_score)
    return F.when(best_score > 0, best).otherwise(F.lit("und"))


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars (0.0 for empty)."""
    total = F.length(text)
    non_punct = F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    return F.when(total == 0, F.lit(0.0)) \
            .otherwise((total - non_punct).cast("double") / total.cast("double"))


def mean_word_length(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0).cast("long"),
                        lambda acc, t: acc + F.length(t).cast("long"))
    return F.when(F.size(toks) == 0, F.lit(0.0)) \
            .otherwise(total.cast("double") / F.size(toks).cast("double"))


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality heuristic combining length, stopword
    presence, punctuation balance and word-length sanity — the standard
    pre-training filter features (cf. Gopher/C4 rules, public recipes)."""
    length_ok = F.when(
        (F.length(text) >= 50) & (F.length(text) <= 10000), 1.0).otherwise(0.3)
    stop = stopword_ratio(text)
    stop_ok = F.when((stop >= 0.01) & (stop <= 0.6), 1.0).otherwise(0.5)
    punct = punct_ratio(text)
    punct_ok = F.when(punct <= 0.2, 1.0).otherwise(0.4)
    mwl = mean_word_length(text)
    mwl_ok = F.when((mwl >= 2.0) & (mwl <= 12.0), 1.0).otherwise(0.5)
    return F.round(
        (length_ok * 0.3 + stop_ok * 0.3 + punct_ok * 0.2 + mwl_ok * 0.2), 6)


def doc_fingerprint(text: Column, *, shingle_n: int = 3) -> Column:
    """Order-insensitive rolling-hash fingerprint: min token-hash over the
    doc's word shingles (winnowing-style minimum; stable under shuffle)."""
    hashes = F.transform(word_shingles(text, shingle_n), token_hash)
    return F.coalesce(F.array_min(hashes), F.lit(-1).cast("long"))


def gopher_rule_columns(text: Column) -> list[Column]:
    """The Gopher quality-filter rule family (Rae et al. 2021, §A1.1,
    arXiv:2112.11446) as pure column expressions — word-count bounds, mean
    word length, symbol-to-word ratio, bullet/ellipsis line fractions,
    alphabetic-word fraction, and a minimum-stopword gate, plus the
    conjunctive ``keep`` verdict. One narrow projection per document: at
    100 TB this fuses into the scan (no shuffle, no Python), which is why
    rule-based filtering is always the FIRST curation stage — it prunes the
    corpus before anything that costs a shuffle or a model.

    Thresholds follow the published recipe, adapted where the paper binds to
    its tokenizer: 50 <= n_words <= 100000, 3 <= mean_word_len <= 10,
    symbol-word fraction <= 0.1, bullet lines <= 0.9, ellipsis lines <= 0.3,
    alphabetic words >= 0.8, >= 2 English stopword hits.
    """
    toks = tokens(text)
    n_words = F.size(toks)
    nw = F.when(n_words == 0, F.lit(1)).otherwise(n_words)  # div-0 guard
    mean_word_len = F.round(
        F.aggregate(toks, F.lit(0).cast("long"),
                    lambda acc, t: acc + F.length(t)).cast("double")
        / nw.cast("double"), 6)
    frac_alpha = F.round(
        F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
        .cast("double") / nw.cast("double"), 6)
    frac_symbol = F.round(
        F.size(F.filter(toks, lambda t: t.contains("#") | t.contains("...")))
        .cast("double") / nw.cast("double"), 6)
    lines = F.filter(F.split(text, "\n"), lambda ln: F.trim(ln) != "")
    n_lines = F.when(F.size(lines) == 0, F.lit(1)).otherwise(F.size(lines))
    frac_bullet = F.round(
        F.size(F.filter(lines, lambda ln: F.trim(ln).startswith("-")
                        | F.trim(ln).startswith("*")))
        .cast("double") / n_lines.cast("double"), 6)
    frac_ellipsis = F.round(
        F.size(F.filter(lines, lambda ln: F.rtrim(ln).endswith("...")))
        .cast("double") / n_lines.cast("double"), 6)
    n_stop_hits = F.size(F.filter(
        toks, lambda t: F.lower(t).isin(*STOPWORDS["en"])))
    keep = ((n_words >= 50) & (n_words <= 100000)
            & (mean_word_len >= 3.0) & (mean_word_len <= 10.0)
            & (frac_symbol <= 0.1) & (frac_bullet <= 0.9)
            & (frac_ellipsis <= 0.3) & (frac_alpha >= 0.8)
            & (n_stop_hits >= 2))
    return [n_words.alias("n_words"),
            mean_word_len.alias("mean_word_len"),
            frac_alpha.alias("frac_alpha_words"),
            frac_symbol.alias("frac_symbol_words"),
            frac_bullet.alias("frac_bullet_lines"),
            frac_ellipsis.alias("frac_ellipsis_lines"),
            n_stop_hits.alias("n_stop_hits"),
            keep.alias("keep")]


_REP_TOP_NS = (2, 3, 4)
_REP_DUP_NS = (5, 10)


def add_gopher_repetition(docs: DataFrame, *, text_col: str = "text",
                          ) -> DataFrame:
    """Append the Gopher REPETITION filter family (Rae et al. 2021, Table
    A1 — the other half of the rule set, the one RefinedWeb/FineWeb carry
    forward): within-document repetition measured as

    - ``dup_line_frac`` — fraction of non-empty lines whose exact text
      occurs more than once in the document;
    - ``dup_line_char_frac`` — fraction of line characters inside those
      duplicated lines;
    - ``top_{2,3,4}gram_char_frac`` — fraction of token characters covered
      by the single heaviest n-gram, coverage = max over distinct n-grams
      of occurrences × n-gram token length (deterministic even under
      frequency ties, unlike "the most frequent n-gram");
    - ``dup_{5,10}gram_char_frac`` — fraction of token characters covered
      by ALL n-grams occurring more than once (summed without overlap
      correction — the standard curation-pipeline approximation), the two
      endpoints of the paper's 5..10 family;
    - conjunctive ``rep_keep`` at the paper's thresholds (dup lines ≤ 0.30,
      dup line chars ≤ 0.20, top 2/3/4-gram ≤ 0.20/0.18/0.16,
      dup 5/10-gram ≤ 0.15/0.10).

    Shaped as a DataFrame transform, NOT a bag of column expressions, for
    a load-bearing reason: each stage binds the expensive arrays (window
    lists, per-distinct-gram occurrence counts) to NAMED columns that later
    stages reference more than once. Catalyst's CollapseProject never
    inlines a multi-referenced non-trivial column, so every O(windows²)
    count-by-equality runs exactly once per document — the single-select
    form re-embedded the full tokenize→window subtree in every metric AND
    re-embedded all seven metrics inside ``rep_keep`` (measured 315 s for
    120 docs vs ~1 s staged). Same lesson as SCALE.md §2/§4/§37 but inside
    ONE projection pipeline: duplication happens at expression level, not
    just across joins. Still zero shuffles, zero Python — at 100 TB this
    fuses into the scan next to ``gopher_rule_columns``; per-doc cost is
    O(lines² + windows²), bounded by document length."""
    text = F.col(text_col)
    out = docs.withColumns({
        "_lines": F.filter(F.split(text, "\n"), lambda ln: F.trim(ln) != ""),
        "_toks": tokens(text),
        **{f"_w{n}": token_windows(text, n)
           for n in (*_REP_TOP_NS, *_REP_DUP_NS)},
    })
    # per-line / per-distinct-gram occurrence counts — each O(len²) lambda
    # is bound ONCE here
    out = out.withColumns({
        "_lcnt": F.transform(
            F.col("_lines"),
            lambda ln: F.size(F.filter(F.col("_lines"),
                                       lambda x: x == ln))),
        **{f"_d{n}": F.array_distinct(F.col(f"_w{n}"))
           for n in (*_REP_TOP_NS, *_REP_DUP_NS)},
    })
    def _count_in(w_name: str):
        # factory, not a default-arg lambda: PySpark reads lambda ARITY to
        # pick the (element) vs (element, index) HOF form, so a captured
        # `n=n` default would be parsed as the index parameter
        def fn(d):
            return F.size(
                F.filter(F.col(w_name), lambda x: x == d)).cast("long")
        return fn

    out = out.withColumns({
        f"_c{n}": F.transform(F.col(f"_d{n}"), _count_in(f"_w{n}"))
        for n in (*_REP_TOP_NS, *_REP_DUP_NS)
    })
    nl = F.when(F.size("_lines") == 0, F.lit(1)).otherwise(F.size("_lines"))
    line_chars = F.aggregate(F.col("_lines"), F.lit(0).cast("long"),
                             lambda a, ln: a + F.length(ln))
    tok_chars = F.aggregate(F.col("_toks"), F.lit(0).cast("long"),
                            lambda a, t: a + F.length(t))
    out = out.withColumns({
        "_nl": nl.cast("double"),
        "_lc": F.greatest(line_chars, F.lit(1).cast("long")).cast("double"),
        "_tc": F.greatest(tok_chars, F.lit(1).cast("long")).cast("double"),
    })

    def _cover(n: int) -> Column:
        # occurrences × token chars per distinct n-gram (string length
        # minus the n−1 joining spaces)
        return F.zip_with(F.col(f"_c{n}"), F.col(f"_d{n}"),
                          lambda c, d: c * (F.length(d) - F.lit(n - 1)))

    metrics = {
        "dup_line_frac": F.round(
            F.size(F.filter(F.col("_lcnt"), lambda c: c > 1))
            .cast("double") / F.col("_nl"), 6),
        "dup_line_char_frac": F.round(
            F.aggregate(
                F.zip_with(F.col("_lcnt"), F.col("_lines"),
                           lambda c, ln: F.when(c > 1, F.length(ln)
                                                .cast("long"))
                           .otherwise(F.lit(0).cast("long"))),
                F.lit(0).cast("long"), lambda a, x: a + x)
            .cast("double") / F.col("_lc"), 6),
        **{f"top_{n}gram_char_frac": F.round(
            F.coalesce(F.array_max(_cover(n)), F.lit(0).cast("long"))
            .cast("double") / F.col("_tc"), 6) for n in _REP_TOP_NS},
        **{f"dup_{n}gram_char_frac": F.round(
            F.aggregate(
                F.zip_with(F.col(f"_c{n}"), _cover(n),
                           lambda c, cov: F.when(c > 1, cov)
                           .otherwise(F.lit(0).cast("long"))),
                F.lit(0).cast("long"), lambda a, x: a + x)
            .cast("double") / F.col("_tc"), 6) for n in _REP_DUP_NS},
    }
    out = out.withColumns(metrics)
    out = out.withColumn(
        "rep_keep",
        (F.col("dup_line_frac") <= 0.30)
        & (F.col("dup_line_char_frac") <= 0.20)
        & (F.col("top_2gram_char_frac") <= 0.20)
        & (F.col("top_3gram_char_frac") <= 0.18)
        & (F.col("top_4gram_char_frac") <= 0.16)
        & (F.col("dup_5gram_char_frac") <= 0.15)
        & (F.col("dup_10gram_char_frac") <= 0.10))
    # drop exactly OUR scratch columns, not any caller column that happens
    # to start with '_'
    ns = (*_REP_TOP_NS, *_REP_DUP_NS)
    scratch = (["_lines", "_toks", "_lcnt", "_nl", "_lc", "_tc"]
               + [f"_{p}{n}" for n in ns for p in ("w", "d", "c")])
    return out.drop(*scratch)


def train_quality_classifier(docs, *, text_col: str = "text",
                             label_col: str = "label",
                             n_features: int = 4096,
                             seed: int = 42):
    """Distill a cheap bag-of-words quality classifier from labeled
    documents — the fastText-style model-based quality filter of LLM
    curation pipelines (CCNet / GPT-3 recipe: label a slice with an
    expensive signal, train a linear model, score the whole corpus for the
    price of a projection). Pipeline: tokenize → HashingTF (feature hashing
    — no vocabulary shuffle, executor-local) → IDF (one aggregate) →
    LogisticRegression (L-BFGS, a handful of corpus passes).

    Returns the fitted PipelineModel; scoring a 100 TB corpus with it is a
    single mapPartitions-shaped transform (broadcast coefficients), which is
    exactly why this beats running the expensive signal everywhere.
    """
    import os
    import shutil
    import tempfile

    from pyspark.ml import Pipeline, PipelineModel
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, IDF, RegexTokenizer

    pipe = Pipeline(stages=[
        RegexTokenizer(inputCol=text_col, outputCol="_toks",
                       pattern=r"\s+"),
        HashingTF(inputCol="_toks", outputCol="_tf",
                  numFeatures=n_features),
        IDF(inputCol="_tf", outputCol="_features"),
        LogisticRegression(featuresCol="_features", labelCol=label_col,
                           maxIter=25, regParam=0.01,
                           predictionCol="prediction",
                           probabilityCol="_prob"),
    ])
    fitted = pipe.fit(docs)
    # Return the model WITHOUT its training summary, via a save/load
    # roundtrip (the public API for summary-free models). The freshly
    # fitted LogisticRegressionModel keeps a trainingSummary that holds
    # the SparkSession; transform()'s prediction UDF captures the model,
    # so closure serialization walks model -> summary -> session -> the
    # session's ObservationManager — a non-Serializable lazy val that is
    # null until the FIRST df.observe() call in the session initializes
    # it. Result: scoring worked in a fresh session but failed with
    # java.io.NotSerializableException in any session that had ever run
    # an observe() query (the r4 "full-suite flake", reproduced
    # deterministically). A loaded model carries no summary, so the
    # closure never reaches the session.
    tmp = tempfile.mkdtemp(prefix="quality_clf_")
    try:
        path = os.path.join(tmp, "model")
        fitted.write().overwrite().save(path)
        return PipelineModel.load(path)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_RANGE_TARGET_BYTES = 2 << 20   # ~2 MiB of compressed input per range part


def _range_partition_count(df) -> int:
    """Scale-adaptive range-partition count for the two-pass prefix sum
    (r11, VERDICT r10 #6): one partition per ~2 MiB of the plan's input
    files, clamped to [1, 4·defaultParallelism].

    The old constant ``defaultParallelism`` over-split small inputs (32
    range partitions for ~200k boundary rows locally — 32 tasks × 3 stages
    of fixed overhead for sub-millisecond cumsums) and under-split nothing:
    the input-size derivation keeps growing with the data until the cap,
    which bounds the subtotal table (≤ 4·par rows) that the offsets window
    scans. ``inputFiles()`` is driver-side scan metadata — file listing,
    NO Spark job — and falls back to ``defaultParallelism`` when the plan
    has no file source (in-memory test frames)."""
    sc = df.sparkSession.sparkContext
    par = sc.defaultParallelism
    try:
        files = df.inputFiles()
        total = 0
        for f in files:
            p = f[len("file:"):] if f.startswith("file:") else f
            if os.path.exists(p):
                total += os.path.getsize(p)
        if total <= 0:
            return par
        return max(1, min(4 * par,
                          (total + _RANGE_TARGET_BYTES - 1)
                          // _RANGE_TARGET_BYTES))
    except Exception:
        return par


def exclusive_prefix_sum(df, *, order_col: str = "doc_id",
                         value_col: str = "n_tokens",
                         out_col: str = "tokens_before",
                         num_partitions: int | None = None):
    """Distributed two-pass exclusive prefix sum — the scale form of
    ``SUM(x) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING .. 1 PRECEDING)``.

    A global-ORDER window collapses the whole input onto ONE reducer
    (Catalyst plans a single-partition Sort + Window); fine at fixture
    scale, fatal at 100 TB. The classic fix is the two-pass scan:

      1. range-partition by the order key (partitions are globally ordered
         by construction), cumsum locally within each partition;
      2. per-partition subtotals (``num_partitions`` rows — tiny) get
         exclusive-cumsummed by a bounded in-plan window and rejoin as
         broadcast offsets (r10: no driver collect; the offsets build
         rides the final job's broadcast exchange).

    Pass 2's state is O(partitions), pass 1 streams — no stage ever holds
    more than one partition's rows. The output is bit-identical to the
    window form for any partitioning: range boundaries only decide WHERE
    the split points fall, not the running total (parity-tested in
    ``tests/test_dedup_ann_text.py``).
    """
    n = num_partitions or _range_partition_count(df)
    # The subtotal pass and the main path must read the SAME materialized
    # range partitions. The partitioning must be pinned because the two passes
    # run as separate jobs and repartitionByRange samples its boundaries —
    # a re-evaluated exchange with re-sampled boundaries would silently
    # misalign pid → offset. EAGER localCheckpoint materializes HERE —
    # pinning both the sampled range boundaries and the pid column before
    # either pass runs (the §22 races involved LAZY checkpoints; an eager
    # one is a deterministic barrier), and freeing on GC instead of
    # pinning session cache like the old unreleased persist(). Cluster
    # caveat: executor-local blocks — use a reliable checkpoint dir
    # under executor churn.
    ranged = (df.repartitionByRange(n, F.col(order_col))
              .sortWithinPartitions(order_col)
              .withColumn("_pid", F.spark_partition_id())
              .localCheckpoint(eager=True))

    # Local exclusive cumsum as one Arrow pass over the already-sorted
    # partition — NOT a Window.partitionBy(_pid): that form forces a second
    # full-data hash exchange on _pid (range partitioning does not satisfy
    # the window's clustering requirement), while mapInPandas is
    # partition-local. Net shuffle count for the whole prefix sum: ONE
    # (the range exchange); the offsets come back via broadcast.
    from pyspark.sql.types import LongType, StructField, StructType

    # copy — StructType.add would mutate the DataFrame's cached schema
    out_schema = StructType(
        list(ranged.schema.fields)
        + [StructField("_local_before", LongType())])

    def _cumsum(batches):
        run = 0
        for pdf in batches:
            vals = pdf[value_col].astype("int64")
            pdf = pdf.assign(
                _local_before=vals.cumsum() - vals + run)
            run += int(vals.sum())
            yield pdf

    local = ranged.mapInPandas(_cumsum, schema=out_schema)
    # r10: the per-partition subtotals stay IN-PLAN — the exclusive
    # cumsum over them is a window on a <= num_partitions-row frame
    # (bounded by construction, so the single-partition window is fine),
    # evaluated inside the broadcast build of the final job. The old
    # form collect()ed them to the driver and re-shipped a
    # createDataFrame per call: one extra driver-blocking job and two
    # pickle round trips for the same O(partitions) state.
    from pyspark.sql import Window

    w_off = (Window.orderBy("_pid")
             .rowsBetween(Window.unboundedPreceding, -1))
    off_df = (ranged.groupBy("_pid")
              .agg(F.sum(value_col).cast("long").alias("_subtotal"))
              .select("_pid",
                      F.coalesce(F.sum("_subtotal").over(w_off),
                                 F.lit(0)).cast("long").alias("_offset")))
    return (local.join(F.broadcast(off_df), "_pid")
            .withColumn(out_col, (F.col("_offset")
                                  + F.col("_local_before")).cast("long"))
            .drop("_pid", "_local_before", "_offset"))


def pack_sequences(docs, *, id_col: str = "doc_id",
                   tokens_col: str = "n_tokens", budget: int = 512,
                   distributed: bool = True):
    """Pretraining sequence packing: concatenate the corpus token stream in
    id order, cut every ``budget`` tokens; a document belongs to the
    sequence its first token lands in (floor of the exclusive prefix sum /
    budget — the GPT-style packing contract, same semantics as the
    ``text_sequence_packing`` query).

    ``distributed=True`` computes the prefix sum with the two-pass
    range-partitioned scan (no single-partition global sort);
    ``distributed=False`` uses the one-reducer window form (for parity
    testing and small inputs).
    """
    if distributed:
        offs = exclusive_prefix_sum(docs, order_col=id_col,
                                    value_col=tokens_col)
    else:
        from pyspark.sql import Window
        w = (Window.orderBy(id_col)
             .rowsBetween(Window.unboundedPreceding, -1))
        offs = docs.withColumn(
            "tokens_before",
            F.coalesce(F.sum(tokens_col).over(w), F.lit(0).cast("long")))
    return offs.withColumn(
        "seq_id", F.floor(F.col("tokens_before") / budget).cast("long"))


def md5_bucket(term: Column, n_buckets: int = 64) -> Column:
    """Portable hashed-feature bucket: first two hex chars of md5 read as a
    base-16 NUMBER (``conv(hex2, 16, 10)`` → uniform 0..255), mod
    ``n_buckets``. The DuckDB twin computes the same value digit-wise via
    ``(strpos(hexabc, c1)-1)*16 + (strpos(hexabc, c2)-1)``.

    The previous ascii-code form (``ascii(c1)*256 + ascii(c2)``) collapsed
    power-of-two bucket counts ≤ 256 to at most 16 effective buckets
    (256 ≡ 0 mod 2^k for k ≤ 8, so the first char contributed nothing and
    the second only 16 ascii codes) — ADVICE r3, verified: n=64 yielded 16
    distinct buckets. Hex-digit VALUES are uniform over 0..255, so all 64
    advertised DSIR features are live."""
    h = F.md5(term)
    return (F.conv(F.substring(h, 1, 2), 16, 10)
            .cast("int") % n_buckets).cast("int")


def dsir_importance(docs, target_pred: Column, *, id_col: str = "doc_id",
                    text_col: str = "text", n_buckets: int = 64,
                    weight_decimals: int = 6):
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling" — public method): score every
    document by how target-like its hashed-unigram distribution is.

      weight(bucket) = log p_target(bucket) − log p_source(bucket)
                       (add-1 smoothed over ``n_buckets`` hashed features)
      importance(doc) = Σ_tokens weight(bucket(token))

    Scale shape: two scans of the token stream (one to count buckets per
    side, one to score docs) + a ``n_buckets``-row broadcast join — never a
    doc×doc comparison. Per-bucket log-weights are rounded then scaled to
    integer micro-units so the per-doc sum is an exact BIGINT fold
    (shuffle-order independent; see plans/registry.py parity rules).

    Returns (id_col, n_tokens, importance) — importance in double units,
    derived from the exact integer sum.
    """
    toks = docs.select(
        F.col(id_col), target_pred.alias("_is_target"),
        F.explode(tokens(F.col(text_col))).alias("_tok"))
    toks = toks.withColumn(
        "_bucket", md5_bucket(F.lower(F.col("_tok")), n_buckets)).drop("_tok")

    # Fold the token stream to per-(doc, bucket) counts FIRST and
    # materialize THAT (docs × ≤ n_buckets rows): tokenize + md5-hash —
    # the dominant per-token cost — now runs ONCE; both the global bucket
    # counts and the per-doc scores are integer-exact folds of this table
    # (Σ_tokens w(bucket) = Σ_buckets n·w, same BIGINTs). The old form
    # re-exploded and re-hashed the whole token stream for the scoring
    # pass (guide §1.2: don't compute the expensive map twice).
    doc_buckets = (toks.groupBy(id_col, "_is_target", "_bucket")
                   .agg(F.count(F.lit(1)).alias("_n"))
                   .localCheckpoint(eager=True))
    counts = (doc_buckets.groupBy("_bucket")
              .agg(F.sum("_n").alias("_cs"),
                   F.sum(F.when(F.col("_is_target"), F.col("_n"))
                         .otherwise(0))
                   .cast("long").alias("_ct")))
    totals = counts.agg(F.sum("_cs").alias("_ns"),
                        F.sum("_ct").alias("_nt")).collect()[0]
    ns, nt = int(totals["_ns"]), int(totals["_nt"])
    # One fixed operation order on both engines; round before scaling, then
    # ROUND()+CAST (Spark CAST truncates, DuckDB CAST rounds — ROUND first
    # makes them agree).
    w = F.round(
        F.log(F.col("_ct") + 1.0) - F.log(F.lit(float(nt + n_buckets)))
        - F.log(F.col("_cs") + 1.0) + F.log(F.lit(float(ns + n_buckets))),
        weight_decimals)
    weights = counts.select(
        "_bucket",
        F.round(w * 1_000_000).cast("long").alias("_w_micro"))

    scored = (doc_buckets.join(F.broadcast(weights), "_bucket")
              .groupBy(id_col)
              .agg(F.sum("_n").alias("n_tokens"),
                   F.sum(F.col("_n") * F.col("_w_micro"))
                   .alias("_imp_micro")))
    return scored.select(
        F.col(id_col), F.col("n_tokens"),
        F.round(F.col("_imp_micro") / 1_000_000.0, weight_decimals)
        .alias("importance"))


def winnow_select(h: Column, *, w: int = 4) -> Column:
    """Winnowing selection over a PRE-MATERIALIZED positional hash array
    (Schleimer, Wilkerson & Aiken, SIGMOD 2003 — the MOSS algorithm,
    public): in every sliding window of ``w`` consecutive hashes select
    the minimum, breaking ties by the RIGHTMOST occurrence; the distinct
    selected ``(pos, fp)`` pairs are the fingerprints.

    Guarantees (the paper's): any shared token run of at least w+k-1
    tokens contributes at least one IDENTICAL selected fingerprint to both
    documents (no false negatives above the guarantee threshold), with
    expected density 2/(w+1) — so overlap detection becomes an equi-join
    on ``fp`` over ~2/(w+1) of the k-gram stream.

    ``h`` MUST be a materialized column reference (``withColumn`` first),
    not an inline expression: every ``element_at``/``slice`` here
    re-evaluates its argument, so an inline hash-pipeline argument would
    be recomputed O(m*w) times per row — measured as a timeout at fixture
    scale. Against a column reference the whole selection is per-document
    O(m*w) integer work in whole-stage codegen: no shuffle, no Python.
    Documents shorter than ``w`` hash windows degrade to the paper's
    boundary case (one window over the whole stream); empty streams yield
    an empty array.
    """
    m = F.size(h)
    n_win = F.when(m >= w, m - w + 1).otherwise(F.least(m, F.lit(1)))

    def _select(p):
        win_len = F.least(F.lit(w), m - p + 1)
        mn = F.array_min(F.slice(h, p, win_len))
        rpos = F.array_max(F.transform(
            F.sequence(F.lit(0), win_len - 1),
            lambda j: F.when(F.element_at(h, (p + j).cast("int")) == mn,
                             p + j).otherwise(F.lit(-1))))
        return F.struct(rpos.cast("long").alias("pos"),
                        mn.cast("long").alias("fp"))

    return F.when(m == 0, F.array().cast(
        "array<struct<pos:bigint,fp:bigint>>")).otherwise(
        F.array_distinct(F.transform(F.sequence(F.lit(1), n_win), _select)))


def positional_kgram_hashes(text: Column, *, k: int = 3) -> Column:
    """Positional word-k-gram hash stream — the winnowing input. Keep the
    result in its own column (one evaluation per row) before selecting."""
    from server2_vector_search_server_spark.functions.text import (
        token_hash,
        token_windows,
    )

    return F.transform(token_windows(text, k), token_hash)


def blocklist_matches(docs: DataFrame, terms: Sequence[str], *,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Multi-pattern blocklist matching — the content-safety filter stage
    of every pretraining pipeline (C4's badwords filter, public): find
    every occurrence of every blocklist term (single words AND multi-word
    phrases) in every document, as (id, pos, term) rows.

    NOT a giant alternation regex: ``rlike('(a|b|...|z)')`` scans each
    document once PER CHARACTER with backtracking and cannot be pushed
    into a join. Instead the corpus explodes into positional token
    n-grams (one pass per DISTINCT phrase length in the list) and
    equi-joins the broadcast term table — the Spark-native equivalent of
    Aho-Corasick's one-pass multi-match: cost ∝ corpus tokens x distinct
    phrase lengths + matches, shuffle only on the match stream. A
    10,000-term list costs the same scans as a 10-term list (the join is
    broadcast either way); matching is case-insensitive on whitespace
    tokens.
    """
    from server2_vector_search_server_spark.functions.text import (
        token_windows,
    )

    spark = docs.sparkSession
    by_n: dict[int, list[str]] = {}
    for t in terms:
        by_n.setdefault(len(t.split()), []).append(t.lower())
    parts = []
    for n, ts in sorted(by_n.items()):
        tdf = spark.createDataFrame([(t,) for t in sorted(ts)], ["term"])
        grams = (docs.select(
            id_col,
            F.posexplode(token_windows(F.lower(F.col(text_col)), n))
            .alias("pos0", "gram")))
        parts.append(
            grams.join(F.broadcast(tdf), F.col("gram") == F.col("term"))
            .select(id_col, (F.col("pos0") + 1).cast("long").alias("pos"),
                    "term"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def rake_keyphrases(docs: DataFrame, *, stopwords: Sequence[str],
                    top_k: int = 3, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010, "Automatic Keyword
    Extraction from Individual Documents" — public): candidate phrases
    are maximal token runs between stopwords; each word scores
    degree/frequency over the CORPUS-wide candidate stream (degree = sum
    of the lengths of phrases containing each occurrence, frequency =
    occurrence count); a phrase scores the sum of its words' scores;
    top-k phrases per document win.

    Plan shape: one gaps-and-islands window (phrase ids = running
    stopword count — shuffle ∝ tokens, the inherent cost of ordered
    segmentation), two partial-aggregable folds (phrase length, word
    stats), one broadcastable vocabulary join, and a per-document top-k
    window. Word scores accumulate as exact micro-units so the float
    division sums are shuffle-order-proof.
    """
    from pyspark.sql import Window

    from server2_vector_search_server_spark.functions.text import tokens

    tok = (docs.select(
        F.col(id_col),
        F.posexplode(tokens(F.lower(F.col(text_col))))
        .alias("pos0", "word"))
        .select(id_col, (F.col("pos0") + 1).alias("pos"), "word"))
    st = F.when(F.col("word").isin(*[w.lower() for w in stopwords]), 1) \
        .otherwise(0)
    wg = Window.partitionBy(id_col).orderBy("pos") \
        .rowsBetween(Window.unboundedPreceding, 0)
    cand = (tok.withColumn("st", st)
            .withColumn("g", F.sum("st").over(wg))
            .filter(F.col("st") == 0)
            .select(id_col, "g", "pos", "word"))
    plen = cand.groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("wlen"))
    cw = cand.join(plen, [id_col, "g"])
    ws = cw.groupBy("word").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("wlen").alias("deg"))
    sm = F.round(F.col("deg").cast("double") / F.col("freq")
                 * 1_000_000.0).cast("long")
    scored = cw.join(F.broadcast(ws.withColumn("sm", sm)
                                 .select("word", "sm")), "word")
    pscore = scored.groupBy(id_col, "g").agg(
        F.sum("sm").alias("score_micro"))
    ptext = (cand.groupBy(id_col, "g")
             .agg(F.concat_ws(" ", F.transform(
                 F.array_sort(F.collect_list(F.struct("pos", "word"))),
                 lambda x: x["word"])).alias("phrase")))
    wr = Window.partitionBy(id_col).orderBy(
        F.col("score_micro").desc(), F.col("phrase").asc())
    return (ptext.join(pscore, [id_col, "g"])
            .withColumn("rank", F.row_number().over(wr))
            .filter(F.col("rank") <= top_k)
            .select(id_col, "rank", "phrase",
                    F.round(F.col("score_micro").cast("double")
                            / 1_000_000.0, 6).alias("score"))
            .orderBy(id_col, "rank"))
