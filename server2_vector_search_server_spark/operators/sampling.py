"""Sampling + approximate aggregation for training-data pipelines.

Beyond-reference (the reference has no sampling or approximate operators);
these are the standard large-corpus curation moves:

  * **Content-hash sampling** — a DETERMINISTIC sample keyed on a stable id's
    md5 prefix. Unlike seeded ``df.sample`` (deterministic only per
    partitioning), the hash predicate depends on row VALUES alone, so the
    same rows are selected on any cluster, any partition layout, any engine —
    which is what makes held-out splits reproducible across reruns of a
    100 TB pipeline, and what lets DuckDB oracle-check the sample exactly.
    Selecting on a hex-prefix set gives k/16 granularity; two chars give
    k/256.

  * **Stratified sampling** — ``df.stat.sampleBy``: per-stratum Bernoulli
    fractions (e.g. rebalance languages for a training mix). Seeded;
    deterministic per Spark version but not value-deterministic → registered
    rows-only.

  * **Approximate aggregates** — ``approx_count_distinct`` (HyperLogLog++,
    relative error ``rsd``) and ``percentile_approx`` (mergeable sketch).
    Both are ONE-PASS and mergeable: partial sketches combine map-side, so
    cardinality/quantiles over 100 TB cost a scan plus constant-size state
    per group, where exact count-distinct shuffles every distinct value and
    exact percentiles sort each group. Sketch internals differ across
    engines → rows-only; tests bound the error against exact answers.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_sample_predicate(key: Column, prefix_chars: Sequence[str]) -> Column:
    """True iff md5(key)'s first hex char is in ``prefix_chars``."""
    return F.substring(F.md5(key.cast("string")), 1, 1).isin(*prefix_chars)


def hash_sample(df: DataFrame, key_col: str,
                prefix_chars: Sequence[str] = ("0", "1")) -> DataFrame:
    """Value-deterministic ~len(prefix_chars)/16 sample on a stable id."""
    return df.filter(hash_sample_predicate(F.col(key_col), prefix_chars))


def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: Mapping[str, float], *,
                      seed: int = 42) -> DataFrame:
    """Per-stratum Bernoulli sample (seeded). Strata absent from
    ``fractions`` are dropped — the rebalancing semantic."""
    return df.stat.sampleBy(strata_col, dict(fractions), seed)


def heavy_hitters(df, col_name: str, *, k: int = 50,
                  threshold_fraction: float | None = None):
    """Exact heavy hitters at sketch cost: per-partition Misra-Gries
    summaries (k counters, one Arrow pass, no shuffle) produce a candidate
    set that PROVABLY contains every value with frequency > n/k; the
    candidates (≤ k per partition — bounded, broadcastable) are then
    exact-counted in one semi-join-filtered aggregate and thresholded.

    The two-phase shape is the same architecture as the ANN tiers
    (approximate prune → exact rescore): the sketch bounds WORK, the
    rescore restores EXACT semantics, so the result is hash-identical to
    the full GROUP BY ... HAVING count > n/k — but the wide shuffle only
    carries candidate rows. Misra-Gries guarantee: decrements hit every
    counter equally, so a value occurring more than n/k times cannot be
    evicted from every partition summary it dominates.

    threshold_fraction defaults to 1/k (the guarantee bound); pass a larger
    fraction to keep the sketch margin while thresholding higher."""
    import pandas as pd
    from pyspark.sql import functions as F

    spark = df.sparkSession
    frac = threshold_fraction if threshold_fraction is not None else 1.0 / k

    def mg(batches):
        counters: dict = {}
        for pdf in batches:
            for v in pdf[col_name]:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    dead = [key for key in counters
                            if counters[key] == 1]
                    for key in counters:
                        counters[key] -= 1
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({col_name: list(counters.keys())})

    candidates = (df.select(col_name)
                  .mapInPandas(mg, schema=f"{col_name} string")
                  .distinct())
    n = df.count()
    floor = int(n * frac)
    return (df.join(F.broadcast(candidates), col_name, "left_semi")
            .groupBy(col_name)
            .agg(F.count(F.lit(1)).alias("n_occurrences"))
            .filter(F.col("n_occurrences") > floor)
            .orderBy(F.col("n_occurrences").desc(), col_name))
