"""Skew mitigation: salted joins and salted heavy-hitter aggregation.

At 100 TB a handful of hot keys (one viral document, one default collection,
one null-ish user id) can pin a whole stage on one task. Three layers of
defense, in order of preference:

  1. **AQE skew-join** (`spark.sql.adaptive.skewJoin.enabled`, on in
     `session.get_spark`) — runtime split of oversized shuffle partitions;
     zero code. Covers sort-merge joins only.
  2. **Broadcast** the small side (`F.broadcast`) — no shuffle at all; the
     engine does this for dimension tables.
  3. **Explicit salting** (this module) — when the big side is skewed AND the
     other side is too large to broadcast: spread each hot key over N
     sub-keys; replicate the other side N×. Shuffle becomes uniform at the
     cost of a bounded blow-up of the smaller side.

Aggregation rarely needs salting (hash aggregation computes map-side
partials), EXCEPT for ``collect_list``/``collect_set``-style holistic
aggregates where every value of a hot key lands on one reducer —
``salted_collect_list`` two-phases those.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(big: DataFrame, small: DataFrame, on: str, *,
                num_salts: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join where ``big`` is skewed on ``on`` and ``small`` is too large
    to broadcast. ``big`` rows get a deterministic salt from a high-entropy
    sibling hash (uniform per row); ``small`` rows are replicated across all
    ``num_salts`` sub-keys. The shuffle key becomes (on, salt): a key holding
    30% of the table now spreads over ``num_salts`` reducers.

    Supported ``how``: inner / left joins (semantics preserved because every
    big row keeps exactly its original match set within its salt).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(num_salts))
    b = big.withColumn("_salt", salt)
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)])))
    return b.join(s, [on, "_salt"], how).drop("_salt")


def salted_collect_list(df: DataFrame, key: str, value: str, *,
                        num_salts: int = 16,
                        out_col: str = "values") -> DataFrame:
    """Two-phase collect_list for skewed keys: collect per (key, salt) — N
    reducers share a hot key's values — then flatten the N partial lists per
    key. One extra (cheap) shuffle of pre-aggregated lists instead of one
    reducer holding every value of the hot key. Order within the list is not
    defined (same as plain collect_list under shuffle)."""
    salt = F.pmod(F.hash(F.col(value).cast("string")), F.lit(num_salts))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.collect_list(value).alias("_part"))
    )
    return (
        partial.groupBy(key)
        .agg(F.flatten(F.collect_list("_part")).alias(out_col))
    )


def key_skew_profile(df: DataFrame, key: str, *, top: int = 10) -> DataFrame:
    """Diagnostic: row count of the ``top`` heaviest keys plus their share of
    the table — run this before choosing a mitigation."""
    total = df.count()
    return (
        df.groupBy(key).agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("share", F.round(F.col("n_rows") / F.lit(float(total)), 4))
        .orderBy(F.desc("n_rows"))
        .limit(top)
    )
