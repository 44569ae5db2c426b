"""Unit tests for the as-of join and bucketed range join
(operators/temporal.py); the full-scale oracle comparison runs in
test_oracle_parity via events_asof_join / events_range_join_counts."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from server2_vector_search_server_spark.operators.temporal import (
    asof_join, bucketed_range_join,
)


def _ts_df(spark, rows, schema):
    return spark.createDataFrame(rows, schema) \
        .withColumn("ts", F.to_timestamp("ts"))


def test_asof_join_semantics(spark):
    left = _ts_df(spark, [
        (1, "u1", "2024-01-01 00:00:00"),   # before any right -> null
        (2, "u1", "2024-01-01 01:00:00"),   # exactly at right ts -> that row
        (3, "u1", "2024-01-01 02:30:00"),   # between rights -> earlier one
        (4, "u2", "2024-01-01 05:00:00"),   # other key, no rights -> null
    ], "id long, user_id string, ts string")
    right = _ts_df(spark, [
        ("u1", "2024-01-01 01:00:00", 10.0),
        ("u1", "2024-01-01 01:00:00", 12.0),   # same-ts dup -> max wins
        ("u1", "2024-01-01 03:00:00", 99.0),
    ], "user_id string, ts string, value double")
    out = {r["id"]: r["asof_value"]
           for r in asof_join(left, right, on="ts", by="user_id").collect()}
    assert out == {1: None, 2: 12.0, 3: 12.0, 4: None}


def test_asof_join_no_key(spark):
    left = _ts_df(spark, [(1, "2024-01-01 02:00:00")], "id long, ts string")
    right = _ts_df(spark, [("2024-01-01 01:00:00", 7.0),
                           ("2024-01-01 03:00:00", 9.0)],
                   "ts string, value double")
    [row] = asof_join(left, right, on="ts").collect()
    assert row["asof_value"] == 7.0


def test_bucketed_range_join_boundaries(spark):
    left = _ts_df(spark, [(1, "k", "2024-01-01 00:20:00")],
                  "id long, key string, ts string")
    right = _ts_df(spark, [
        (10, "k", "2024-01-01 00:10:00"),    # exactly lower bound (600s) in
        (11, "k", "2024-01-01 00:20:00"),    # exactly upper bound in
        (12, "k", "2024-01-01 00:09:59"),    # 601s before -> out
        (13, "k", "2024-01-01 00:20:01"),    # after -> out
        (14, "x", "2024-01-01 00:15:00"),    # other key -> out
    ], "rid long, key string, ts string")
    got = sorted(r["rid_r"] for r in bucketed_range_join(
        left, right, on="ts", by="key", width_seconds=600).collect())
    assert got == [10, 11]


def test_bucketed_range_join_matches_naive(spark, tables):
    """Bucket rewrite == naive inequality join on real data (sf0.001)."""
    events = tables["events"]
    purchases = events.filter(F.col("event_type") == "purchase") \
                      .select("event_id", "user_id", "ts").limit(50)
    clicks = events.filter(F.col("event_type") == "click") \
                   .select(F.col("event_id").alias("cid"), "user_id", "ts")
    bucketed = bucketed_range_join(
        purchases, clicks.withColumnRenamed("cid", "event_id"),
        on="ts", by="user_id", width_seconds=600)
    got = sorted((r["event_id"], r["event_id_r"])
                 for r in bucketed.collect())
    naive = purchases.alias("p").join(
        clicks.alias("c"),
        (F.col("p.user_id") == F.col("c.user_id"))
        & (F.col("c.ts") >= F.col("p.ts") - F.expr("INTERVAL 600 SECONDS"))
        & (F.col("c.ts") <= F.col("p.ts")), "inner")
    want = sorted((r["event_id"], r["cid"])
                  for r in naive.select("event_id", "cid").collect())
    assert got == want


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_EVENT = st.tuples(st.integers(0, 2),          # key
                   st.integers(0, 1000),       # ts seconds
                   st.integers(0, 9))          # value


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(lefts=st.lists(_EVENT, min_size=1, max_size=12),
       rights=st.lists(_EVENT, min_size=0, max_size=12))
@pytest.mark.slow  # r11: driver-window tier, see OPTIMIZATION_r11.md
def test_asof_join_matches_bruteforce(spark, lefts, rights):
    """asof_join == per-row brute force: max value among right rows at the
    latest right ts <= left ts for the same key."""
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t, _) in enumerate(lefts)],
        "id long, key long, ts long",
    ).withColumn("ts", F.timestamp_seconds(F.col("ts")))
    rdf = spark.createDataFrame(
        [(k, t, float(v)) for k, t, v in rights] or [],
        "key long, ts long, value double",
    ).withColumn("ts", F.timestamp_seconds(F.col("ts")))
    got = {r["id"]: r["asof_value"]
           for r in asof_join(ldf, rdf, on="ts", by="key").collect()}

    want = {}
    for i, (k, t, _) in enumerate(lefts):
        prior = [(rt, v) for rk, rt, v in rights if rk == k and rt <= t]
        if not prior:
            want[i] = None
        else:
            best_ts = max(rt for rt, _ in prior)
            want[i] = float(max(v for rt, v in prior if rt == best_ts))
    assert got == want


def test_asof_cogrouped_equals_window_form(spark):
    """The two independent as-of implementations (union+window carry-forward
    vs cogrouped pd.merge_asof) must agree on a randomized-but-seeded input
    covering: dup timestamps on both sides, keys with no rights, keys with
    no lefts, exact-ts matches, and null-result rows."""
    import random

    from server2_vector_search_server_spark.operators.temporal import (
        asof_join_cogrouped,
    )

    rng = random.Random(1234)
    base = "2024-01-01 0{}:{:02d}:00"
    lefts, rights = [], []
    for i in range(300):
        key = f"u{rng.randint(1, 8)}"
        ts = base.format(rng.randint(0, 9), rng.randint(0, 59))
        lefts.append((i, key, ts))
    for j in range(150):
        key = f"u{rng.randint(3, 10)}"       # keys 9-10: rights only
        ts = base.format(rng.randint(0, 9), rng.randint(0, 59))
        rights.append((key, ts, float(rng.randint(1, 50))))
    left = _ts_df(spark, lefts, "id long, user_id string, ts string")
    right = _ts_df(spark, rights, "user_id string, ts string, value double")

    a = asof_join(left, right, on="ts", by="user_id",
                  value_col="value", out_col="v")
    b = asof_join_cogrouped(left, right, on="ts", by="user_id",
                            value_col="value", out_col="v")
    ra = {r["id"]: r["v"] for r in a.collect()}
    rb = {r["id"]: r["v"] for r in b.collect()}
    assert ra == rb and len(ra) == 300


def test_cusum_closed_form_equals_sequential_fold(spark):
    """The two-window closed form S_i = P_i − min(0, min_{j≤i} P_j) must
    equal the textbook sequential recursion max(0, S+d) exactly —
    including the new-running-minimum rows where a 1-PRECEDING frame
    would let S go negative instead of clamping (caught in r5: a shared
    formula error is invisible to oracle parity, only an independent
    fold exposes it)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    vals = [2.0, -5.0, 3.0, 1.0, -0.5, -9.0, 4.0, 4.0]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i long, d double")
    w = (Window.orderBy("i")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    pref = df.withColumn("p", F.sum("d").over(w))
    got = [r["s"] for r in pref.withColumn(
        "s", F.col("p") - F.least(F.lit(0.0), F.min("p").over(w)))
        .orderBy("i").collect()]
    s, want = 0.0, []
    for d in vals:
        s = max(0.0, s + d)
        want.append(s)
    assert got == want, (got, want)
