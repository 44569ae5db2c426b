"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The actual query surface lives in
``server2_vector_search_server_spark/plans/`` — each operator from
SURVEY.md §2 registers a named (Spark callable, DuckDB oracle) pair there;
this module just re-exports the registry in the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from server2_vector_search_server_spark.plans import load_registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the reference's ``/search_score`` pipeline
    (score = 1 − squared_l2, threshold, sort, top-k) over the embeddings
    corpus. Driver checks rows > 0 and a stable schema."""
    registry = load_registry()
    return registry["search_score_topk"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: rq.fn for name, rq in load_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each SQL-expressible query in ``queries()``."""
    return {name: rq.oracle for name, rq in load_registry().items()
            if rq.oracle is not None}
