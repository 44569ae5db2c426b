"""Record-linkage tests (operators/linkage.py): blocked fuzzy join on
hand-built fixtures — block recall, distance threshold, tie-breaking."""
from __future__ import annotations

from pyspark.sql import functions as F

from server2_vector_search_server_spark.operators import linkage


def _catalog(spark):
    return spark.createDataFrame(
        [(1, "acme anvil", "a"), (2, "acme anvils", "a"),
         (3, "apex anvil", "a"), (4, "zephyr rope", "z")],
        "entity_id long, entity_name string, blk string")


def test_best_match_min_distance_then_min_id(spark):
    catalog = _catalog(spark)
    mentions = spark.createDataFrame(
        [(10, "acme anvil", "a")],   # lev 0 to #1, lev 1 to #2, 2 to #3
        "mention_id long, mention string, blk string")
    got = linkage.blocked_fuzzy_join(mentions, catalog).collect()
    assert len(got) == 1
    assert (got[0]["entity_id"], got[0]["lev"]) == (1, 0)


def test_distance_tie_breaks_on_entity_id(spark):
    catalog = spark.createDataFrame(
        [(7, "bolt", "b"), (5, "belt", "b")],
        "entity_id long, entity_name string, blk string")
    mentions = spark.createDataFrame(
        [(1, "balt", "b")],          # lev 1 to both -> keep id 5
        "mention_id long, mention string, blk string")
    got = linkage.blocked_fuzzy_join(mentions, catalog).collect()
    assert (got[0]["entity_id"], got[0]["lev"]) == (5, 1)


def test_threshold_and_block_misses_produce_no_row(spark):
    catalog = _catalog(spark)
    mentions = spark.createDataFrame(
        # far beyond max_distance inside its block; right text, wrong block
        [(1, "completely different", "a"), (2, "zephyr rope", "q")],
        "mention_id long, mention string, blk string")
    assert linkage.blocked_fuzzy_join(
        mentions, catalog, max_distance=3).count() == 0


def test_multi_pass_blocking_composes(spark):
    """A second pass with a different key recovers a mention whose first
    block key was itself corrupted — the redundant-blocking move the
    operator's docstring prescribes."""
    catalog = _catalog(spark).withColumn(
        "blk2", F.substring("entity_name", -4, 4))
    mentions = spark.createDataFrame(
        [(1, "acme anvil", "x")],    # blk corrupted ('x' != 'a')
        "mention_id long, mention string, blk string").withColumn(
        "blk2", F.substring("mention", -4, 4))
    p1 = linkage.blocked_fuzzy_join(
        mentions, catalog.drop("blk2"), block_cols=("blk",))
    p2 = linkage.blocked_fuzzy_join(
        mentions.drop("blk"), catalog.drop("blk"), block_cols=("blk2",))
    assert p1.count() == 0
    hits = p2.collect()
    assert len(hits) == 1 and hits[0]["entity_id"] == 1
