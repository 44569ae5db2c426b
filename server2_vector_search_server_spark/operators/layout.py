"""Physical data layout for scan pruning — time partitioning and
multi-dimensional clustering.

The reference stores everything in per-collection sqlite+HNSW directories;
its only "layout" is the collection split (SURVEY.md §1.1). At 100 TB the
dominant cost of every query is the scan, and the scan's cost is decided at
WRITE time: a table partitioned/clustered to match the query predicates
reads only the files it must.

  * **Time partitioning** — `partitionBy(date)` on an event-time column.
    A time-window query then prunes whole partition directories
    (PartitionFilters in the plan, asserted in tests) — the standard layout
    for append-only event streams, and the same move `write_ivf_index`
    makes for ANN cells.

  * **Z-order clustering** — interleave the bits of two (or more) key
    columns into one Morton key, then range-repartition + sort files by it.
    Each parquet file then covers a small rectangle in (a, b) space, so
    min/max row-group statistics skip files for predicates on EITHER
    column — single-column range partitioning can only serve one. This is
    the public Z-order/space-filling-curve technique (Morton 1966; used by
    Delta OPTIMIZE ZORDER, Iceberg sort orders) implemented with plain
    DataFrame ops: no table format required.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def write_time_partitioned(df: DataFrame, path: str, *,
                           ts_col: str = "ts",
                           granularity: str = "day") -> str:
    """Materialize ``df`` partitioned by the date (or month/year) of
    ``ts_col``. Returns the partition column name."""
    part_col = f"{ts_col}_{granularity}"
    trunc = {"day": F.to_date(F.col(ts_col)),
             "month": F.trunc(F.col(ts_col), "month"),
             "year": F.trunc(F.col(ts_col), "year")}[granularity]
    (df.withColumn(part_col, trunc)
     .write.mode("overwrite").partitionBy(part_col).parquet(path))
    return part_col


def morton_key(a: Column, b: Column, *, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer columns
    into one Z-order key (a's bit i lands at 2i+1, b's at 2i). Pure integer
    column arithmetic — codegen'd, no UDF."""
    key = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftrightunsigned(a.cast("long"), i).bitwiseAND(F.lit(1))
        bbit = F.shiftrightunsigned(b.cast("long"), i).bitwiseAND(F.lit(1))
        key = (key
               + (abit * F.lit(1 << (2 * i + 1)))
               + (bbit * F.lit(1 << (2 * i))))
    return key


def write_zordered(df: DataFrame, path: str, col_a: str, col_b: str, *,
                   bits: int = 16, n_files: int = 16) -> None:
    """Cluster ``df`` into ``n_files`` files ordered by the Morton key of
    (col_a, col_b): range-repartition on the key (contiguous, balanced key
    ranges per file) and sort within partitions so row-group min/max stats
    are tight on BOTH columns."""
    keyed = df.withColumn("_zkey", morton_key(F.col(col_a), F.col(col_b),
                                              bits=bits))
    (keyed.repartitionByRange(n_files, "_zkey")
     .sortWithinPartitions("_zkey")
     .drop("_zkey")
     .write.mode("overwrite").parquet(path))
