"""Mathematical invariants for the late second-continuation queries —
bounds that hold for ANY correct implementation, independent of the
oracle's algebra (the signal/stats-family test discipline)."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def _registry():
    from server2_vector_search_server_spark.plans import load_registry

    return load_registry()


def test_ece_bounds_and_mce_dominates(spark):
    row = (_registry()["events_calibration_ece"]
           .fn(spark, SF_SMOKE).collect()[0])
    assert 0.0 <= row["ece"] <= 1.0
    assert 0.0 <= row["mce"] <= 1.0
    # MCE is a max of the gaps ECE averages (weighted) — it dominates
    assert row["mce"] >= row["ece"] - 1e-9
    assert row["n_eval"] > 0 and row["n_bins"] > 0


def test_lcc_in_unit_interval_and_triangle_consistency(spark):
    rows = (_registry()["graph_clustering_coefficient"]
            .fn(spark, SF_SMOKE).collect())
    assert rows, "3-NN graph must have deg>=2 nodes"
    for r in rows:
        assert 0.0 <= r["lcc"] <= 1.0 + 1e-9
        # triangles through a node can't exceed its neighbor pairs
        assert r["n_triangles"] <= r["degree"] * (r["degree"] - 1) // 2


def test_assortativity_is_a_correlation(spark):
    row = (_registry()["graph_degree_assortativity"]
           .fn(spark, SF_SMOKE).collect()[0])
    assert -1.0 - 1e-9 <= row["assortativity"] <= 1.0 + 1e-9
    # both orientations => edge-end count is even and = 2x edges
    assert row["n_edge_ends"] % 2 == 0 and row["n_edge_ends"] > 0


def test_croston_levels_positive_and_bounded(spark):
    rows = (_registry()["part_croston_demand_forecast"]
            .fn(spark, SF_SMOKE).collect())
    assert rows
    for r in rows:
        # demand sizes are >=1 unit; EWMA of positives stays positive
        assert r["size_level"] > 0
        # interval EWMA seeded at 1, gaps >= 1 day => level >= ... well,
        # a convex combination of values >= 1 stays >= the min seed decay
        assert r["interval_level"] >= 0.2  # alpha * min_gap lower bound
        assert r["demand_per_day"] > 0
        assert r["n_demands"] >= 1


def test_hitrate_is_a_proportion(spark):
    row = (_registry()["recommend_eval_hitrate"]
           .fn(spark, SF_SMOKE).collect()[0])
    assert row["n_users"] > 0
    assert 0 <= row["n_hits"] <= row["n_users"]
    assert abs(row["hit_rate"] - row["n_hits"] / row["n_users"]) < 1e-6
    # the dense-catalog design exists so this is NOT structurally zero
    assert row["n_hits"] > 0


def test_sobel_energy_consistency(spark):
    rows = (_registry()["multimodal_image_sobel_edges"]
            .fn(spark, SF_SMOKE).collect())
    assert len(rows) == 48
    for r in rows:
        assert r["n_interior"] == (r["width"] - 2) * (r["height"] - 2)
        # mean L1 gradient cannot exceed the max; both bounded by 8*765
        assert 0 <= r["max_grad"] <= 8 * 765
        assert r["edge_energy"] <= r["max_grad"] * r["n_interior"]
        assert r["edge_energy"] >= r["max_grad"]    # max is one of the terms
