"""Independent third-formulation checks for the round-9 continuation
experimentation / governance / geo / resample queries.

Same discipline as tests/test_independent_checks.py: the oracle gate
proves Spark and DuckDB agree, but both run the SAME formulation — these
tests recompute each statistic from the raw parquet bytes in sequential
pure Python (dicts and loops, no SQL) so a shared algebraic mistake
cannot pass.  Floats compare within the rounding-bucket half-width;
integers and booleans compare exactly.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pandas as pd

from tests.conftest import SF_SMOKE

TOL = 5.0e-7 + 1e-9


def _close(a, b, tol=TOL):
    return math.isfinite(a) and math.isfinite(b) and abs(a - b) <= tol


def _cents(x: float) -> int:
    """Spark/DuckDB ROUND(x*100): half away from zero (Python round is
    banker's — never use it here)."""
    v = x * 100
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def _events_values() -> pd.DataFrame:
    pdf = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ts = pdf["ts"]
    if str(ts.dtype) == "int64":
        micros = ts.to_numpy() // 1000
    else:
        micros = (ts.astype("datetime64[ns]").to_numpy()
                  .astype("int64") // 1000)
    out = pdf.copy()
    out["ts_us"] = micros
    return out


def _registry():
    from server2_vector_search_server_spark.plans import load_registry

    return load_registry()


# ---------------------------------------------------------------------------
# Welch t-test


def test_welch_ttest_sequential_recompute(spark):
    row = _registry()["events_welch_ttest"].fn(spark, SF_SMOKE).collect()[0]
    ev = _events_values()
    groups = {"view": [], "purchase": []}
    for et, v in zip(ev["event_type"], ev["value"]):
        if et in groups and pd.notna(v):
            groups[et].append(_cents(float(v)))

    def mom(cs):
        n = len(cs)
        s1 = sum(cs)
        s2 = float(sum(c * c for c in cs))
        m = s1 / 100.0 / n
        v = (s2 / 10000.0 - (s1 / 100.0) * (s1 / 100.0) / n) / (n - 1)
        return n, m, v

    n1, m1, v1 = mom(groups["view"])
    n2, m2, v2 = mom(groups["purchase"])
    assert row["n1"] == n1 and row["n2"] == n2
    se1, se2 = v1 / n1, v2 / n2
    t = (m1 - m2) / math.sqrt(se1 + se2)
    df = (se1 + se2) ** 2 / (se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1))
    assert _close(row["mean_diff"], m1 - m2)
    assert _close(row["t_stat"], t)
    assert _close(row["df_welch"], df, tol=TOL * max(1.0, abs(df)))


# ---------------------------------------------------------------------------
# Benjamini-Hochberg over (type, hour) cells


def test_fdr_bh_sequential_recompute(spark):
    got = {(r["event_type"], r["hr"]): r for r in
           _registry()["events_fdr_bh_adjust"].fn(spark, SF_SMOKE)
           .collect()}
    ev = _events_values()
    cells_n = Counter()
    cells_s = Counter()
    g_n = 0
    g_s1 = 0
    g_s2 = 0
    for et, us, v in zip(ev["event_type"], ev["ts_us"], ev["value"]):
        if pd.isna(v):
            continue
        hr = (us // 3_600_000_000) % 24
        c = _cents(float(v))
        cells_n[(et, hr)] += 1
        cells_s[(et, hr)] += c
        g_n += 1
        g_s1 += c
        g_s2 += c * c
    g_mean = g_s1 / 100.0 / g_n
    g_var = (g_s2 / 10000.0
             - (g_s1 / 100.0) * (g_s1 / 100.0) / g_n) / (g_n - 1)
    assert set(got) == set(cells_n)
    ps = {}
    for key, n in cells_n.items():
        m_c = cells_s[key] / 100.0 / n
        z = (m_c - g_mean) / math.sqrt(g_var / n)
        ea = math.exp(-(1.702 * abs(z)))
        p = 2.0 * ea / (1.0 + ea)
        ps[key] = (p, z, n)
        assert _close(got[key]["z"], z)
        assert _close(got[key]["p_raw"], p)
        assert got[key]["n"] == n
    # BH step-up: rank ascending (p, type, hour); backwards running min
    order = sorted(ps, key=lambda k: (ps[k][0], k[0], k[1]))
    m = len(order)
    raw = [ps[k][0] * m / (i + 1) for i, k in enumerate(order)]
    adj = [0.0] * m
    run = float("inf")
    for i in range(m - 1, -1, -1):
        run = min(run, raw[i])
        adj[i] = min(1.0, run)
    for i, k in enumerate(order):
        assert _close(got[k]["p_bh"], adj[i])
        assert got[k]["reject"] == (adj[i] <= 0.05)


# ---------------------------------------------------------------------------
# CUPED


def test_cuped_sequential_recompute(spark):
    row = (_registry()["events_cuped_variance_reduction"]
           .fn(spark, SF_SMOKE).collect()[0])
    ev = _events_values()
    split_us = int(pd.Timestamp("2024-01-16 00:00:00").value // 1000)
    pre = Counter()
    post = Counter()
    users = set()
    for u, us, v in zip(ev["user_id"], ev["ts_us"], ev["value"]):
        if pd.isna(v):
            continue
        users.add(u)
        (pre if us < split_us else post)[u] += _cents(float(v))
    n = len(users)
    sx = sum(pre[u] for u in users)
    sy = sum(post[u] for u in users)
    sxx = float(sum(pre[u] * pre[u] for u in users))
    syy = float(sum(post[u] * post[u] for u in users))
    sxy = float(sum(pre[u] * post[u] for u in users))
    var_x = (sxx - float(sx) * sx / n) / (n - 1)
    var_y = (syy - float(sy) * sy / n) / (n - 1)
    cov = (sxy - float(sx) * sy / n) / (n - 1)
    assert row["n_users"] == n
    assert _close(row["theta"], cov / var_x)
    red = 1.0 - (var_y - cov * cov / var_x) / var_y
    assert _close(row["reduction"], red)
    assert 0.0 <= row["reduction"] < 1.0
    # rounded to 4 decimals in the query
    assert abs(row["var_post"] - var_y / 10000.0) <= 5e-5 + 1e-9
    assert abs(row["var_cuped"]
               - (var_y - cov * cov / var_x) / 10000.0) <= 5e-5 + 1e-9
    assert row["var_cuped"] <= row["var_post"]


# ---------------------------------------------------------------------------
# t-closeness


def test_t_closeness_sequential_recompute(spark):
    got = {(r["lang"], r["source"]): r for r in
           _registry()["documents_t_closeness_screen"]
           .fn(spark, SF_SMOKE).collect()}
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    k = 7
    cell = defaultdict(lambda: [0] * k)
    glob = [0] * k
    for lang, src, text in zip(docs["lang"], docs["source"], docs["text"]):
        sv = len(text.strip()) % k
        cell[(lang, src)][sv] += 1
        glob[sv] += 1
    n_tot = sum(glob)
    assert set(got) == set(cell)
    for key, counts in cell.items():
        n_g = sum(counts)
        cum_g = 0
        cum_t = 0
        term = 0
        for v in range(k):
            cum_g += counts[v]
            cum_t += glob[v]
            term += abs(cum_g * n_tot - cum_t * n_g)
        emd = term / (n_g * n_tot * (k - 1))
        assert got[key]["n_docs"] == n_g
        assert _close(got[key]["emd"], emd)
        assert got[key]["breach"] == (emd > 0.15)


# ---------------------------------------------------------------------------
# point-in-polygon ray casting


def _u16(key: str, offset: int) -> int:
    h = hashlib.md5(key.encode()).hexdigest()
    return int(h[offset - 1:offset + 3], 16)


def test_point_in_polygon_sequential_recompute(spark):
    from server2_vector_search_server_spark.plans.spatial_queries import (
        _PIP_POLYGONS,
    )

    got = {r["poly_id"]: r for r in
           _registry()["geo_point_in_polygon_join"]
           .fn(spark, SF_SMOKE).collect()}
    cust = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")
    counts = Counter()
    bal_cents = Counter()
    n_inside_any = 0
    for ck, bal in zip(cust["c_custkey"], cust["c_acctbal"]):
        key = f"{ck}c"
        px, py = _u16(key, 1), _u16(key, 5)
        for pid, verts in _PIP_POLYGONS.items():
            crossings = 0
            for (x1, y1), (x2, y2) in zip(verts, verts[1:] + verts[:1]):
                if (y1 > py) != (y2 > py):
                    cross = (py - y1) * (x2 - x1) - (px - x1) * (y2 - y1)
                    if (y2 > y1 and cross > 0) or (y2 < y1 and cross < 0):
                        crossings += 1
            if crossings % 2 == 1:
                counts[pid] += 1
                bal_cents[pid] += _cents(float(bal))
                n_inside_any += 1
    assert set(got) == {p for p in counts if counts[p] > 0}
    assert n_inside_any > 0, "fixture must land points inside zones"
    for pid in got:
        assert got[pid]["n_customers"] == counts[pid]
        assert _close(got[pid]["total_acctbal"], bal_cents[pid] / 100.0,
                      tol=1e-9)


# ---------------------------------------------------------------------------
# rational resample


def test_audio_resample_sequential_recompute(spark):
    got = {r["media_id"]: r for r in
           _registry()["multimodal_audio_resample"]
           .fn(spark, SF_SMOKE).collect()}
    l_f, m_f = 3, 4
    assert len(got) == 48
    for d in range(48):
        n = 800 + (d % 5) * 200
        s = [((d * 31 + i * 7) % 2001) - 1000 for i in range(n)]
        n_out = (n - 1) * l_f // m_f + 1
        res = []
        for j in range(n_out):
            i0, frac = divmod(j * m_f, l_f)
            s1 = s[i0 + 1] if frac else s[i0]
            res.append(s[i0] * (l_f - frac) + s1 * frac)
        row = got[str(d)]
        assert row["n_in"] == n
        assert row["n_out"] == n_out
        assert row["sumsq_scaled"] == sum(v * v for v in res)
        assert row["zero_crossings_out"] == sum(
            1 for a, b in zip(res, res[1:]) if (a >= 0) != (b >= 0))


def test_resample_identity_when_l_equals_m(spark):
    """L == M must reproduce the input samples exactly (frac == 0 at
    every output position ⇒ out_scaled == s[i]·L)."""
    from server2_vector_search_server_spark.operators.multimodal import (
        build_pcm16_wav,
        resample_audio_features,
    )

    samples = [((5 * 31 + i * 7) % 2001) - 1000 for i in range(400)]
    blob = build_pcm16_wav(samples, sample_rate=8000)
    media = spark.createDataFrame([("x", bytearray(blob))],
                                  "media_id string, content binary")
    row = resample_audio_features(media, l=2, m=2).collect()[0]
    assert row["n_in"] == 400 and row["n_out"] == 400
    assert row["sumsq_scaled"] == sum(4 * s * s for s in samples)
