"""Mathematical invariants of the signal/stats family — properties the
oracle-parity hash can't express (parity proves both engines agree; these
prove what they agree ON is the right object)."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reg():
    from server2_vector_search_server_spark.plans import load_registry

    return load_registry()


def test_km_survival_monotone_and_bounded(spark, reg):
    rows = (reg["events_survival_km"].fn(spark, SF)
            .orderBy("dur_hours").collect())
    assert rows, "KM table empty"
    prev_s, prev_risk = 1.0 + 1e-12, None
    for r in rows:
        assert 0.0 <= r.survival <= 1.0
        assert r.survival <= prev_s + 1e-9, "survival must be non-increasing"
        assert r.n_risk >= r.n_done > 0
        assert r.n_censored_at >= 0
        if prev_risk is not None:
            assert r.n_risk <= prev_risk, "risk set must shrink over time"
        prev_s, prev_risk = r.survival, r.n_risk


def test_km_terminal_step_is_zero_if_everyone_fails(spark, reg):
    rows = (reg["events_survival_km"].fn(spark, SF)
            .orderBy("dur_hours").collect())
    for r in rows:
        if r.n_done == r.n_risk:
            assert r.survival == 0.0


def test_mwu_u_range_and_consistency(spark, duck, reg):
    row = reg["events_mann_whitney_u"].fn(spark, SF).collect()[0]
    n1, n2 = row.n1, row.n2
    want = duck.execute(
        "SELECT COUNT(*) FILTER (WHERE event_type='view'),"
        "       COUNT(*) FILTER (WHERE event_type='purchase')"
        " FROM events WHERE value IS NOT NULL").fetchone()
    assert (n1, n2) == want
    assert 0 <= row.u1 <= n1 * n2          # U1 + U2 = n1*n2, both >= 0
    assert row.u1_x2 == int(round(row.u1 * 2))
    mean_u = n1 * n2 / 2.0
    if row.u1 > mean_u:
        assert row.z > 0
    elif row.u1 < mean_u:
        assert row.z < 0


def test_anova_decomposition(spark, duck, reg):
    row = reg["events_anova_f_by_type"].fn(spark, SF).collect()[0]
    n, = duck.execute(
        "SELECT COUNT(*) FROM events WHERE value IS NOT NULL").fetchone()
    k, = duck.execute(
        "SELECT COUNT(DISTINCT event_type) FROM events"
        " WHERE value IS NOT NULL").fetchone()
    assert (row.k, row.n) == (k, n)
    assert row.ssb >= 0 and row.ssw >= 0 and row.f_stat >= 0
    # SSB + SSW == total sum of squares (within rounding of the carriers)
    tss, = duck.execute(
        "SELECT SUM(POWER(CAST(ROUND(value*100) AS BIGINT)/100.0 - "
        " (SELECT AVG(CAST(ROUND(value*100) AS BIGINT)/100.0) FROM events"
        "  WHERE value IS NOT NULL), 2)) FROM events"
        " WHERE value IS NOT NULL").fetchone()
    assert abs((row.ssb + row.ssw) - tss) < max(1e-3 * tss, 0.01)


def test_mutual_info_total_nonnegative(spark, reg):
    rows = reg["events_mutual_info_type_hour"].fn(spark, SF).collect()
    total = sum(r.mi_contrib for r in rows)
    assert total >= -1e-9, "MI of a joint distribution is non-negative"


def test_sax_words_shape(spark, duck, reg):
    rows = reg["events_sax_words"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert len(r.sax_word) == 4
        assert set(r.sax_word) <= set("abcd")
        assert r.n_events >= 8
    n_eligible, = duck.execute(
        "SELECT COUNT(*) FROM (SELECT user_id FROM events"
        " WHERE value IS NOT NULL GROUP BY user_id"
        " HAVING COUNT(*) >= 8 AND MIN(ROUND(value*100)) <>"
        " MAX(ROUND(value*100)))").fetchone()
    assert len(rows) == n_eligible


def test_dtw_bounded_by_diagonal_alignment(spark, reg):
    """DP minimum over warping paths can never exceed the plain diagonal
    (identity) alignment — the core correctness property of the unrolled
    grid."""
    from server2_vector_search_server_spark.plans.signal_queries import (
        _DTW_PATTERN,
        _paa4_df,
    )

    dtw = {r.user_id: r.dtw for r in
           reg["events_dtw_pattern_match"].fn(spark, SF).collect()}
    zs = {r.user_id: (r.z1, r.z2, r.z3, r.z4)
          for r in _paa4_df(spark, SF).collect()}
    assert set(dtw) == set(zs)
    for uid, z in zs.items():
        diag = sum(abs(z[i] - _DTW_PATTERN[i]) for i in range(4))
        assert dtw[uid] <= diag + 1e-9, uid
        assert dtw[uid] >= 0


def test_spectral_rank_permutation(spark, reg):
    rows = reg["events_spectral_peak_hourly"].fn(spark, SF).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
        assert r.power >= 0
    for t, rs in by_type.items():
        assert sorted(x.period for x in rs) == [6, 8, 12, 24], t
        assert sorted(x.power_rank for x in rs) == [1, 2, 3, 4], t
        best = min(rs, key=lambda x: x.power_rank)
        assert best.power == max(x.power for x in rs), t
