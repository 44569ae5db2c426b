"""Single-pass table profiling — the data-quality summary every corpus
curation pipeline runs before and after each stage.

Beyond-reference (the reference trusts its loaders); at 100 TB you audit:
per column, the row count, null count, distinct count, and min/max. The
whole profile is ONE aggregate pass — every statistic for every column is
computed in the same map-side partial aggregation, so profiling a table
costs a single scan regardless of how many columns it has (versus the
naive one-query-per-column loop, which scans N times). The wide one-row
result is then unpivoted driver-side via ``stack`` into the tall
``(column, stat...)`` shape reports want — the unpivot touches one row, so
it is free.

Distinct counts are exact here (they dominate the profile's cost at scale;
swap ``count_distinct`` for ``approx_count_distinct`` when cardinalities
get huge — same plan shape, constant-memory sketch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Profile ``cols`` (default: all non-complex columns) in one pass.

    Returns one row per column: ``(col_name, n_rows, n_nulls, n_distinct,
    min_value, max_value)`` with min/max rendered as strings so mixed
    column types share one schema (the profile is a report, not an input).
    """
    if cols is None:
        cols = [f.name for f in df.schema.fields
                if f.dataType.typeName() not in
                ("array", "map", "struct", "binary")]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.extend([
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ])
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `{c}__nulls`, `{c}__distinct`, `{c}__min`, `{c}__max`"
        for c in cols)
    return (wide.select(
        F.expr(f"stack({len(cols)}, {stack_args}) AS "
               "(col_name, n_nulls, n_distinct, min_value, max_value)"),
        "n_rows")
        .select("col_name", "n_rows", "n_nulls", "n_distinct",
                "min_value", "max_value")
        .orderBy("col_name"))
