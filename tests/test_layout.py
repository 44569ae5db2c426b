"""Physical-layout tests (operators/layout.py): partition pruning and
Z-order file skipping, asserted on real plans/files."""
from __future__ import annotations

import glob

from pyspark.sql import functions as F

from server2_vector_search_server_spark.operators import layout


def test_time_partition_pruning(spark, tables, tmp_path):
    path = str(tmp_path / "events_by_day")
    part_col = layout.write_time_partitioned(tables["events"], path)
    stored = spark.read.parquet(path)
    windowed = stored.filter(
        F.col(part_col).between("2024-01-10", "2024-01-12"))
    plan = windowed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and part_col in plan
    # physical check, not just plan text: exactly 3 of the ~30 day
    # directories are read
    n_dirs = len(glob.glob(f"{path}/{part_col}=*"))
    assert n_dirs >= 25
    read_rows = windowed.count()
    expect = tables["events"].filter(
        F.to_date("ts").between("2024-01-10", "2024-01-12")).count()
    assert read_rows == expect > 0


def test_morton_key_golden(spark):
    df = spark.createDataFrame([(3, 1), (0, 0), (1, 0), (0, 1), (5, 2)],
                               "a long, b long")
    got = {(r["a"], r["b"]): r["z"] for r in
           df.withColumn("z", layout.morton_key(F.col("a"), F.col("b")))
           .collect()}
    # a's bit i -> position 2i+1, b's bit i -> position 2i
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 2
    assert got[(0, 1)] == 1
    assert got[(3, 1)] == 0b1011        # a bits 0,1 -> 1,3; b bit 0 -> 0
    assert got[(5, 2)] == 0b100110      # a bits 0,2 -> 1,5; b bit 1 -> 2


def test_zorder_files_skippable_on_both_dims(spark, tmp_path):
    """Each Z-ordered file covers a small rectangle in (a, b) space: a
    narrow predicate on EITHER column overlaps only a minority of files'
    min/max ranges — the property row-group skipping cashes in. A 64×64
    grid makes the geometry exact (the events fixture at sf0.001 has too
    few distinct user_ids to separate)."""
    grid = (spark.range(64 * 64)
            .select((F.col("id") % 64).alias("a"),
                    (F.col("id") / 64).cast("long").alias("b")))
    zpath = str(tmp_path / "z")
    layout.write_zordered(grid, zpath, "a", "b", bits=6, n_files=16)
    files = glob.glob(f"{zpath}/part-*.parquet")
    assert len(files) == 16
    spans = [spark.read.parquet(f).agg(
        F.min("a"), F.max("a"), F.min("b"), F.max("b")).first()
        for f in files]

    def overlapping(lo, hi, idx):
        return sum(1 for s in spans if not (s[idx + 1] < lo or s[idx] > hi))

    # an eighth-width band on either dimension touches at most half the
    # files (a perfect Z-layout of 16 files = 4x4 rectangles -> 2/8 files)
    assert overlapping(0, 7, 0) <= len(files) // 2
    assert overlapping(0, 7, 2) <= len(files) // 2
    # sanity: no information is lost
    assert spark.read.parquet(zpath).count() == 64 * 64
