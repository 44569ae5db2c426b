"""Local mirror of the driver's correctness gate.

For every registered query with an oracle: run the Spark DataFrame and the
DuckDB SQL on the same sf0.001 parquet, then compare row count, column names,
and exact values on rows sorted column-name-wise — the same shape as the
driver's order-insensitive value-hash. Exact (not approximate) float equality
is asserted: both sides round deterministically, so any drift here would also
break the driver's hash.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from server2_vector_search_server_spark.plans import load_registry
from tests.conftest import SF_SMOKE

REGISTRY = load_registry()
ORACLE_CASES = sorted(n for n, rq in REGISTRY.items() if rq.oracle is not None)
ROWS_ONLY_CASES = sorted(n for n, rq in REGISTRY.items() if rq.oracle is None)


def _shard(cases: list[str]) -> list[str]:
    """Optional registry-slice sharding for the parallel runner
    (scripts/partest.py): SPARK_GRAFT_TEST_SHARD="i/n" keeps every n-th
    case starting at i. Unset => the full list (single-process behavior
    unchanged). Stride slicing (not contiguous blocks) so each shard gets
    a representative mix of cheap and expensive queries."""
    import os

    spec = os.environ.get("SPARK_GRAFT_TEST_SHARD")
    if not spec:
        return cases
    i, n = (int(x) for x in spec.split("/"))
    return cases[i::n]


ORACLE_CASES = _shard(ORACLE_CASES)
ROWS_ONLY_CASES = _shard(ROWS_ONLY_CASES)

# r11 (VERDICT r10 #2): the full suite outgrew the driver's verify window
# (~31 min measured; the r10 run was truncated at ~96% with zero failures).
# The queries below each cost >= 9 s in the r11 duration profile — they run
# in the `slow` tier (`pytest -m slow`), excluded from the default run by
# the pyproject addopts. Coverage is NOT lost: every one of these is also
# checked at sf0.01 by scripts/full_sweep.py each round (PARITY_r{N}.json)
# and the slow tier is run and recorded in OPTIMIZATION_r11.md.
SLOW_ORACLE = {
    "embedding_whitening_zca", "embedding_procrustes_alignment",
    "store_compaction_invariance", "graph_beam_recall_at_k",
    "graph_beam_search_knn", "dedup_minhash_quality_eval",
    "graph_shortest_paths", "graph_beam_search_bucketed",
    "ingest_pipeline_e2e", "dedup_minhash_pr_curve",
    "ann_ivf_pq_rescore_frontier", "store_upsert_merge",
    "dedup_jaccard_prefix_filter", "dedup_ngram_jaccard",
    "store_delete_semantics",
}
ORACLE_CASES = [pytest.param(n, marks=pytest.mark.slow)
                if n in SLOW_ORACLE else n for n in ORACLE_CASES]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            import numpy as np

            df[c] = df[c].map(
                lambda v: tuple(v)
                if isinstance(v, (list, tuple, np.ndarray)) else v)
    return df.sort_values(list(df.columns), ignore_index=True)


def _values_equal(a, b) -> bool:
    import numpy as np

    a_float = isinstance(a, (float, np.floating))
    b_float = isinstance(b, (float, np.floating))
    a_int = isinstance(a, (int, np.integer)) and not isinstance(a, bool)
    b_int = isinstance(b, (int, np.integer)) and not isinstance(b, bool)
    # The driver's value hash is dtype-sensitive: int64 on one engine and
    # float64 on the other hash differently even when numerically equal
    # (DuckDB HUGEINT -> float via pandas vs Spark BIGINT). Mirror that.
    if (a_float and b_int) or (a_int and b_float):
        return False
    if a_float and b_float:
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_values_equal(x, y) for x, y in zip(a, b))
    return a == b


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_query_matches_oracle(name, spark, duck):
    rq = REGISTRY[name]
    got = rq.fn(spark, SF_SMOKE).toPandas()
    want = duck.execute(rq.oracle).df()
    assert sorted(got.columns) == sorted(want.columns), \
        f"{name}: column mismatch {sorted(got.columns)} vs {sorted(want.columns)}"
    assert len(got) == len(want), f"{name}: rowcount {len(got)} vs {len(want)}"
    # a 0-row match is vacuous — an empty result usually means the query's
    # fixture constants miss the data (caught live once: a query-id band
    # outside the embeddings range). Queries legitimately empty at the tiny
    # smoke SF must be allowlisted WITH their verified-at-sf0.01 row count.
    empty_ok_at_smoke = {
        "nation_pair_volume",   # NATION_1<->NATION_2 trade: 14 rows at sf0.01
        # mod-400 graph over only 200 parts peels to an empty 4-core at
        # the smoke SF (documented in the query); 3 communities at sf0.01
        "graph_kcore_influential_communities",
    }
    if name not in empty_ok_at_smoke:
        assert len(got) > 0, f"{name}: both sides empty — vacuous pass"
    g, w = _normalize(got), _normalize(want)
    for i in range(len(g)):
        for c in g.columns:
            a, b = g[c].iloc[i], w[c].iloc[i]
            assert _values_equal(a, b), \
                f"{name}: row {i} col {c}: spark={a!r} duckdb={b!r}"


@pytest.mark.parametrize("name", ROWS_ONLY_CASES)
def test_rows_only_query_runs(name, spark):
    rq = REGISTRY[name]
    df = rq.fn(spark, SF_SMOKE)
    assert df.count() >= 0       # runs, stable schema
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    names = set(e.queries())
    oracles = e.oracle_sql()
    assert set(oracles) <= names
