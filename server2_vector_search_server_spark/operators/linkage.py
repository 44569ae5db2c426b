"""Record linkage / entity resolution: blocked fuzzy matching.

The reference's only identity notion is exact equality (upload dedup by
name, ``app.py:152-157``; existence probes, ``vector_store.py:56-89``).
A training-data pipeline also needs the FUZZY form: reconcile noisy
mentions (scraped product names, OCR'd titles, user-typed entities)
against a canonical catalog. Public technique: blocking + within-block
verification (Fellegi & Sunter 1969; Christen, "Data Matching", 2012).

Scale shape: candidate generation is an EQUI-join on cheap deterministic
block keys — one shuffle on the key, cost Σ(|mention-block| ×
|catalog-block|), never |mentions| × |catalog|. The expensive edit
distance runs only inside blocks; block keys built from stable attributes
(first token, brand/category) keep blocks small, and adding attributes to
the key is the skew valve when one block grows hot. A production matcher
runs several redundant blocking passes to recover recall lost to key
typos; the operator takes the key columns as a parameter so passes
compose with ``unionByName``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def blocked_fuzzy_join(mentions: DataFrame, catalog: DataFrame, *,
                       mention_id_col: str = "mention_id",
                       mention_text_col: str = "mention",
                       entity_id_col: str = "entity_id",
                       entity_text_col: str = "entity_name",
                       block_cols: Sequence[str] = ("blk",),
                       max_distance: int = 3) -> DataFrame:
    """Best catalog match per mention: equi-join on ``block_cols``,
    Levenshtein verify within blocks, keep the (distance, entity id)
    minimum. Output: one row per matched mention with the match and its
    edit distance; mentions with no catalog entry within ``max_distance``
    produce no row (compose passes / a left join at the call site for
    unmatched tracking)."""
    cands = mentions.join(catalog, on=list(block_cols))
    scored = (
        cands.withColumn("lev", F.levenshtein(
            F.col(mention_text_col), F.col(entity_text_col)).cast("long"))
        .filter(F.col("lev") <= max_distance))
    w = (Window.partitionBy(mention_id_col)
         .orderBy("lev", entity_id_col))
    return (scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", *block_cols))
