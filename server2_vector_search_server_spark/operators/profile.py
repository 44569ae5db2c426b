"""Single-pass table profiling — the data-quality summary every corpus
curation pipeline runs before and after each stage.

Beyond-reference (the reference trusts its loaders); at 100 TB you audit:
per column, the row count, null count, distinct count, and min/max. The
whole profile is ONE aggregate pass — every statistic for every column is
computed in the same map-side partial aggregation, so profiling a table
costs a single scan regardless of how many columns it has. The wide
one-row result is then unpivoted via ``stack`` into the tall
``(col_name, stat...)`` shape reports want — the unpivot touches one row,
so it is free.

**The distinct-count trap (measured, SCALE.md §13).** Multiple EXACT
``count_distinct`` columns in one aggregate make Catalyst plan an Expand:
every input row is replicated once per distinct aggregate, so an 11-column
profile turns a 6M-row scan into a 72M-row shuffle — 16× SLOWER than
scanning per column (179 s vs 11 s measured). Approximate distinct
(HyperLogLog++ sketches) has mergeable constant-size state, no Expand, and
restores the single-scan economics: 2.2 s for the same profile. Hence
``exact_distinct=False`` is the default and exact is the opt-in for
small/oracle-checked tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: list[str] | None = None, *,
            exact_distinct: bool = False, rsd: float = 0.02) -> DataFrame:
    """Profile ``cols`` (default: all non-complex columns) in one pass.

    Returns one row per column: ``(col_name, n_rows, n_nulls, n_distinct,
    min_value, max_value)`` with min/max rendered as strings so mixed
    column types share one schema (the profile is a report, not an input).
    ``exact_distinct=True`` swaps the HLL sketch for exact counts — only
    for small tables (see module docstring for why).
    """
    if cols is None:
        cols = [f.name for f in df.schema.fields
                if f.dataType.typeName() not in
                ("array", "map", "struct", "binary")]
    distinct = (F.count_distinct if exact_distinct
                else lambda c: F.approx_count_distinct(c, rsd))
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.extend([
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .alias(f"{c}__nulls"),
            distinct(F.col(c)).alias(f"{c}__distinct"),
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
