"""Independent third-formulation checks for the round-6 statistical queries.

The oracle gate proves Spark and DuckDB agree — but both run the SAME
formulation, so a shared algebraic mistake passes it (this pattern caught
the Markov-chain bug in round 5). Each test here recomputes the statistic
from the raw parquet bytes in sequential pure Python (pandas read, dicts
and loops, no SQL on either engine) and compares against the registered
query's output.

Float comparison rule: the queries ROUND(x, 6) as their last step; the
pure-Python recompute keeps x unrounded and asserts
|py − engine| ≤ 5.0e-7 + 1e-9 (the half-width of the rounding bucket),
so the check never depends on matching the engines' half-up rounding,
only on the value itself. Integers and booleans compare exactly.
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_SMOKE

TOL = 5.0e-7 + 1e-9


def _events_pdf() -> pd.DataFrame:
    """events.parquet via pyarrow→pandas; ts normalized to integer
    MICROseconds since epoch (the resolution both engines compare at —
    Spark's nanos path does ts DIV 1000, DuckDB CAST truncates)."""
    pdf = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ts = pdf["ts"]
    if ts.dtype == np.int64 or str(ts.dtype) == "int64":
        micros = ts.to_numpy() // 1000               # nanos-as-long layout
    else:
        micros = ts.astype("datetime64[ns]").to_numpy().astype(np.int64) // 1000
    out = pdf.copy()
    out["ts_us"] = micros
    return out


def _close(a, b, tol=TOL):
    return math.isfinite(a) and math.isfinite(b) and abs(a - b) <= tol


# ---------------------------------------------------------------------------
# 1. seasonal decomposition


def test_seasonal_decompose_sequential_recompute(spark):
    from server2_vector_search_server_spark.plans import load_registry

    got = {(r["event_type"], r["hod"]): (r["seasonal"], r["n_hours"])
           for r in load_registry()["events_seasonal_decompose"]
           .fn(spark, SF_SMOKE).collect()}

    ev = _events_pdf()
    origin_h = int(pd.Timestamp("2024-01-01 00:00:00").value
                   // 10**9 // 3600)
    N, HALF = 720, 12
    counts: dict[tuple[str, int], int] = Counter()
    for et, us in zip(ev["event_type"], ev["ts_us"]):
        t = us // 10**6 // 3600 - origin_h
        counts[(et, int(t))] += 1
    want: dict[tuple[str, int], tuple[float, int]] = {}
    for et in sorted(ev["event_type"].unique()):
        series = [counts.get((et, t), 0) for t in range(N)]
        per_hod_sum: dict[int, int] = defaultdict(int)
        per_hod_n: dict[int, int] = defaultdict(int)
        for t in range(HALF, N - HALF):              # full windows only
            s25 = sum(series[t - HALF:t + HALF + 1])
            dm = (25 * series[t] - s25) * 40000      # exact integer micro
            per_hod_sum[t % 24] += dm
            per_hod_n[t % 24] += 1
        for hod in per_hod_sum:
            want[(et, hod)] = (per_hod_sum[hod] / (1e6 * per_hod_n[hod]),
                               per_hod_n[hod])
    assert set(got) == set(want)
    for key, (sea, nh) in want.items():
        assert got[key][1] == nh, key
        assert _close(got[key][0], sea), (key, got[key][0], sea)
    # sanity: seasonal indices of one type sum to ~0 (additive decompose)
    for et in {k[0] for k in want}:
        tot = sum(v[0] * v[1] for k, v in want.items() if k[0] == et)
        n = sum(v[1] for k, v in want.items() if k[0] == et)
        assert abs(tot / n) < 1.0      # bounded drift, not structural bias


# ---------------------------------------------------------------------------
# 2. Poisson two-period rate z-test


def test_poisson_ztest_sequential_recompute(spark):
    from server2_vector_search_server_spark.plans import load_registry

    got = {r["event_type"]: r for r in
           load_registry()["events_poisson_rate_ztest"]
           .fn(spark, SF_SMOKE).collect()}

    ev = _events_pdf()
    split_us = int(pd.Timestamp("2024-01-16 00:00:00").value // 1000)
    a = Counter()
    b = Counter()
    for et, us in zip(ev["event_type"], ev["ts_us"]):
        (a if us < split_us else b)[et] += 1
    assert set(got) == set(a) | set(b)
    for et in got:
        ca, cb = a[et], b[et]
        assert got[et]["n_before"] == ca
        assert got[et]["n_after"] == cb
        assert _close(got[et]["rate_before"], ca / 360.0)
        assert _close(got[et]["rate_after"], cb / 360.0)
        z = (ca - cb) / math.sqrt(ca + cb)
        assert _close(got[et]["z"], z)
        assert got[et]["significant_95"] == (abs(z) > 1.96)


# ---------------------------------------------------------------------------
# 3. difference-in-differences


def test_diff_in_diff_sequential_recompute(spark):
    from server2_vector_search_server_spark.plans import load_registry

    row = (load_registry()["events_diff_in_diff"]
           .fn(spark, SF_SMOKE).collect()[0])

    ev = _events_pdf()
    ev = ev[ev["event_type"] == "purchase"]
    split_us = int(pd.Timestamp("2024-01-16 00:00:00").value // 1000)
    s = defaultdict(int)
    n = defaultdict(int)
    for uid, us, val in zip(ev["user_id"], ev["ts_us"], ev["value"]):
        cell = (int(uid) % 2 == 0, us >= split_us)
        # half-away-from-zero to micro units, mirroring F.round(x*1e6)
        x = float(val) * 1e6
        s[cell] += int(math.floor(x + 0.5)) if x >= 0 \
            else -int(math.floor(-x + 0.5))
        n[cell] += 1
    mean = {c: s[c] / (1e6 * n[c]) for c in s}
    did = ((mean[(True, True)] - mean[(True, False)])
           - (mean[(False, True)] - mean[(False, False)]))
    assert row["n_purchases"] == sum(n.values())
    assert _close(row["treated_post"], mean[(True, True)])
    assert _close(row["treated_pre"], mean[(True, False)])
    assert _close(row["control_post"], mean[(False, True)])
    assert _close(row["control_pre"], mean[(False, False)])
    # did is a difference of four already-rounded means in the engine
    # output path vs unrounded here: widen by the four rounding buckets
    assert _close(row["did"], did, tol=4 * TOL)


# ---------------------------------------------------------------------------
# 4. Heaps'-law fit


def test_heaps_fit_sequential_recompute(spark):
    from server2_vector_search_server_spark.plans import load_registry

    row = (load_registry()["text_heaps_law_fit"]
           .fn(spark, SF_SMOKE).collect()[0])

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet",
                           columns=["doc_id", "text"])
    n_toks: dict[int, int] = {}
    first_doc: dict[str, int] = {}
    for doc_id, text in sorted(zip(docs["doc_id"], docs["text"])):
        toks = [t for t in re.split(r"\s+", str(text).strip().lower()) if t]
        n_toks[int(doc_id)] = len(toks)
        for t in toks:
            if t not in first_doc or first_doc[t] > int(doc_id):
                first_doc[t] = int(doc_id)
    pts = []
    for thr in range(50, 501, 50):
        ntok = sum(v for d, v in n_toks.items() if d < thr)
        vocab = sum(1 for d in first_doc.values() if d < thr)
        pts.append((ntok, vocab))

    def r9(x):       # the engines' pre-round of ln to 9 decimals
        return math.floor(x * 1e9 + 0.5) / 1e9 if x >= 0 \
            else -math.floor(-x * 1e9 + 0.5) / 1e9

    xs = [int(round(r9(math.log(p[0])) * 1e6)) for p in pts]
    ys = [int(round(r9(math.log(p[1])) * 1e6)) for p in pts]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    deny = n * syy - sy * sy
    beta = num / den
    r2 = 0.0 if deny == 0 else (num * num) / (den * deny)
    assert row["n_points"] == n
    assert _close(row["beta"], beta)
    assert _close(row["r2"], r2)
    # the documented saturation diagnostic on this synthetic corpus:
    # vocabulary fully saturates by the first checkpoint => beta == 0
    assert ys.count(ys[0]) == n and row["beta"] == 0.0


# ---------------------------------------------------------------------------
# 5. transition entropy rate


def test_transition_entropy_sequential_recompute(spark):
    from server2_vector_search_server_spark.plans import load_registry

    got = {r["from_type"]: r for r in
           load_registry()["events_transition_entropy_rate"]
           .fn(spark, SF_SMOKE).collect()}

    ev = _events_pdf()
    per_user: dict[int, list] = defaultdict(list)
    for uid, us, eid, et in zip(ev["user_id"], ev["ts_us"],
                                ev["event_id"], ev["event_type"]):
        per_user[int(uid)].append((us, eid, et))
    trans = Counter()
    for seq in per_user.values():
        seq.sort(key=lambda x: (x[0], x[1]))
        for (_, _, prev), (_, _, cur) in zip(seq, seq[1:]):
            trans[(prev, cur)] += 1
    rows = Counter()
    for (prev, _), c in trans.items():
        rows[prev] += c
    tot = sum(trans.values())
    assert set(got) == set(rows)
    for prev in rows:
        r = rows[prev]
        tm_sum = 0
        for (p0, _), c in trans.items():
            if p0 != prev:
                continue
            p = c / r
            tm = -p * math.log(p) * 1e9
            tm_sum += int(math.floor(tm + 0.5)) if tm >= 0 \
                else -int(math.floor(-tm + 0.5))
        h = tm_sum / 1e9
        assert got[prev]["n_transitions"] == r
        assert _close(got[prev]["row_entropy_nats"], h)
        assert _close(got[prev]["rate_contribution"], (r / tot) * h)
        # entropy bounds: 0 <= H <= ln(|next-state alphabet|)
        k = sum(1 for (p0, _) in trans if p0 == prev)
        assert -1e-9 <= h <= math.log(max(k, 1)) + 1e-9


# ---------------------------------------------------------------------------
# Round-10 wave (VERDICT r9 #4): the milestone statistics family.  Same
# philosophy — sequential pure-Python recomputes sharing NO algebra with the
# engine pipelines (raw per-row sorts and loops instead of value-domain
# tie-group identities; plain float Newton instead of nano-int sums).


def _haz(x: float) -> int:
    """Half-away-from-zero integer rounding (both engines' ROUND)."""
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


def _u16(s: str) -> int:
    import hashlib
    return int(hashlib.md5(s.encode()).hexdigest()[:4], 16)


def test_stratified_ipw_ate_sequential_recompute(spark):
    from server2_vector_search_server_spark.plans import load_registry

    row = load_registry()["events_stratified_ipw_ate"] \
        .fn(spark, SF_SMOKE).collect()[0]
    ev = _events_pdf().dropna(subset=["value"])
    strata: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0, 0])
    for et, eid, v in zip(ev["event_type"], ev["event_id"], ev["value"]):
        pt = 0.2 + 0.6 * _u16(et) / 65536.0
        cents = _haz(v * 100) + _haz(10000.0 * pt)
        t = 1 if _u16(f"{int(eid)}t") / 65536.0 < pt else 0
        s = strata[et]
        s[0] += 1
        s[1] += t
        s[2 if t else 3] += cents
    n = sum(s[0] for s in strata.values())
    nt = sum(s[1] for s in strata.values())
    yt = sum(s[2] for s in strata.values())
    yc = sum(s[3] for s in strata.values())
    naive = yt / 100.0 / nt - yc / 100.0 / (n - nt)
    ipw = sum(s[2] / 100.0 / (s[1] / s[0])
              - s[3] / 100.0 / (1.0 - s[1] / s[0])
              for s in strata.values()) / n
    assert row["n"] == n
    # stratum IPW terms are micro-rounded engine-side before the sum:
    # widen by the per-stratum half-bucket
    assert _close(row["naive_diff"], naive)
    assert _close(row["ipw_ate"], ipw,
                  tol=TOL + 0.5e-6 * len(strata) / n)
    # the planted confound must be visible: naive biased dollars above the
    # null while IPW lands closer to it (at smoke SF the HT estimator is
    # noisy — n=1000 gives ipw≈−2.6 vs naive≈+4.0 — so assert the ordering,
    # not a magnitude)
    assert row["naive_diff"] > 1.0
    assert abs(row["ipw_ate"]) < row["naive_diff"]


def test_gpd_tail_pwm_sequential_recompute(spark):
    from server2_vector_search_server_spark.plans import load_registry

    row = load_registry()["events_gpd_tail_pwm"] \
        .fn(spark, SF_SMOKE).collect()[0]
    ev = _events_pdf().dropna(subset=["value"])
    xs = sorted(_haz((v - 100.0) * 100) for v in ev["value"] if v > 100.0)
    n = len(xs)
    b0 = sum(xs) / 100.0 / n
    # direct order-statistic weighting: rank−1 = position in the sorted
    # list (ties contribute identically whatever their intra-tie order)
    b1 = sum(x * i for i, x in enumerate(xs)) / 100.0 / n / (n - 1)
    assert row["n_exceed"] == n
    assert _close(row["b0"], b0)
    assert _close(row["b1"], b1)
    assert _close(row["sigma"], 2.0 * b0 * b1 / (b0 - 2.0 * b1))
    assert _close(row["kappa"], b0 / (b0 - 2.0 * b1) - 2.0)


def _yuen_group(xs: list[int]) -> tuple[int, float, float]:
    """(h, trimmed_mean, d) from a sorted cents list — plain slicing."""
    n = len(xs)
    g = int(math.floor(0.2 * n))
    h = n - 2 * g
    tmean = sum(xs[g:n - g]) / 100.0 / h
    ws = [xs[g]] * g + xs[g:n - g] + [xs[n - g - 1]] * g   # winsorize
    w_sum = sum(ws) / 100.0
    w_ssq = sum(x * x for x in ws) / 10000.0
    d = (w_ssq - w_sum * w_sum / n) / (h * (h - 1.0))
    return h, tmean, d


def test_yuen_trimmed_t_sequential_recompute(spark):
    from server2_vector_search_server_spark.plans import load_registry

    row = load_registry()["events_yuen_trimmed_t"] \
        .fn(spark, SF_SMOKE).collect()[0]
    ev = _events_pdf().dropna(subset=["value"])
    grp = {et: sorted(_haz(v * 100)
                      for e, v in zip(ev["event_type"], ev["value"])
                      if e == et)
           for et in ("view", "purchase")}
    h1, m1, d1 = _yuen_group(grp["view"])
    h2, m2, d2 = _yuen_group(grp["purchase"])
    assert (row["h1"], row["h2"]) == (h1, h2)
    assert _close(row["trimmed_diff"], m1 - m2)
    assert _close(row["t_yuen"], (m1 - m2) / math.sqrt(d1 + d2))
    assert _close(row["df_yuen"],
                  (d1 + d2) ** 2 / (d1 * d1 / (h1 - 1.0)
                                    + d2 * d2 / (h2 - 1.0)))


def test_huber_location_sequential_recompute(spark):
    from server2_vector_search_server_spark.plans import load_registry

    row = load_registry()["events_huber_location"] \
        .fn(spark, SF_SMOKE).collect()[0]
    vals = list(_events_pdf().dropna(subset=["value"])["value"])
    mu = sum(vals) / len(vals)
    mean_value = mu
    for _ in range(3):       # plain float IRLS, no cell table, no rounding
        wts = [min(1.0, 50.0 / max(1e-9, abs(x - mu))) for x in vals]
        mu = sum(w * x for w, x in zip(wts, vals)) / sum(wts)
    assert row["n"] == len(vals)
    assert _close(row["mean_value"], mean_value)
    assert _close(row["huber_location"], mu)
    assert _close(row["outlier_pull"], mean_value - mu)
    # the heavy upper tail must pull the mean ABOVE the robust location
    assert row["outlier_pull"] > 0


def test_mwu_effect_sizes_sequential_recompute(spark):
    import bisect

    from server2_vector_search_server_spark.plans import load_registry

    row = load_registry()["events_mwu_effect_sizes"] \
        .fn(spark, SF_SMOKE).collect()[0]
    ev = _events_pdf().dropna(subset=["value"])
    a = [_haz(v * 100) for e, v in zip(ev["event_type"], ev["value"])
         if e == "view"]
    b = sorted(_haz(v * 100) for e, v in zip(ev["event_type"], ev["value"])
               if e == "purchase")
    n1, n2 = len(a), len(b)
    # win-count formulation (no rank-sum algebra): for each group-1 value,
    # count strictly-smaller group-2 values + half the ties
    wins = sum(bisect.bisect_left(b, x) + 0.5
               * (bisect.bisect_right(b, x) - bisect.bisect_left(b, x))
               for x in a)
    cles = wins / (n1 * n2)
    assert (row["n1"], row["n2"]) == (n1, n2)
    assert _close(row["cles"], cles)
    assert _close(row["cliffs_delta"], 2.0 * cles - 1.0)
    # rank-biserial == Cliff's delta (identity doubles as a cross-check)
    assert _close(row["rank_biserial"], 2.0 * cles - 1.0)
    assert row["cliffs_delta"] == row["rank_biserial"]


def test_logistic_irls_binned_sequential_recompute(spark):
    from server2_vector_search_server_spark.plans import load_registry

    row = load_registry()["events_logistic_irls_binned"] \
        .fn(spark, SF_SMOKE).collect()[0]
    ev = _events_pdf()
    ev = ev[ev["value"] > 0]

    def r9(x):           # the engines' pre-round of log2 to 9 decimals
        return math.floor(x * 1e9 + 0.5) / 1e9 if x >= 0 \
            else -math.floor(-x * 1e9 + 0.5) / 1e9

    cells: dict[tuple[int, int], list[int]] = defaultdict(lambda: [0, 0])
    for us, et, v in zip(ev["ts_us"], ev["event_type"], ev["value"]):
        hr = int(us // 3_600_000_000) % 24
        b = max(-7, min(8, int(math.floor(r9(math.log(v) / math.log(2.0))))))
        c = cells[(hr, b)]
        c[0] += 1
        c[1] += 1 if et == "purchase" else 0

    beta = np.zeros(3)
    feats = {(hr, b): np.array([1.0, hr / 24.0, (b + 7) / 16.0])
             for hr, b in cells}
    for _ in range(3):   # plain float Newton — no nano-ints, no β rounding
        g = np.zeros(3)
        H = np.zeros((3, 3))
        for key, (cn, ck) in cells.items():
            x = feats[key]
            p = 1.0 / (1.0 + math.exp(-float(beta @ x)))
            g += (ck - cn * p) * x
            H += cn * p * (1.0 - p) * np.outer(x, x)
        beta = beta + np.linalg.solve(H, g)
    ll = sum(ck * math.log(1.0 / (1.0 + math.exp(-float(beta @ feats[k]))))
             + (cn - ck) * math.log(1.0 - 1.0
                                    / (1.0 + math.exp(-float(beta
                                                             @ feats[k]))))
             for k, (cn, ck) in cells.items())
    assert row["n_obs"] == sum(cn for cn, _ in cells.values())
    assert _close(row["beta0"], beta[0])
    assert _close(row["beta1"], beta[1])
    assert _close(row["beta2"], beta[2])
    # ll is rounded to 4 decimals engine-side → half-bucket 5e-5
    assert _close(row["log_likelihood"], ll, tol=5.0e-5 + 1e-7)
    # β0 alone should sit near logit of the base purchase rate (~20%)
    base = sum(ck for _, ck in cells.values()) / sum(cn for cn, _
                                                    in cells.values())
    assert abs(beta[0]) < 5.0 and 0.05 < base < 0.5


def test_burrows_delta_sequential_recompute(spark):
    """Burrows' Delta from raw bytes: dict-of-Counter frequencies, plain
    float z-scores (no nano-int rationals), direct pairwise loop."""
    from server2_vector_search_server_spark.plans import load_registry

    got = {(r["s1"], r["s2"]): r["delta"]
           for r in load_registry()["text_burrows_delta_sources"]
           .fn(spark, SF_SMOKE).collect()}

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    docs = docs[docs["doc_id"] < 500]
    per_src: dict[str, Counter] = defaultdict(Counter)
    corpus = Counter()
    for src, text in zip(docs["source"], docs["text"]):
        for w in re.split(r"\s+", text.strip()):
            w = w.lower()
            if w and re.fullmatch(r"[a-z]+", w):
                per_src[src][w] += 1
                corpus[w] += 1
    top = [w for w, _ in sorted(corpus.items(),
                                key=lambda kv: (-kv[1], kv[0]))[:20]]
    srcs = sorted(per_src)
    k = len(srcs)
    freq = {(s, w): per_src[s][w] / sum(per_src[s].values())
            for s in srcs for w in top}
    z = {}
    for w in top:
        vals = [freq[(s, w)] for s in srcs]
        mean = sum(vals) / k
        sd = math.sqrt(sum((v - mean) ** 2 for v in vals) / (k - 1))
        for s in srcs:
            z[(s, w)] = (freq[(s, w)] - mean) / sd
    assert set(got) == {(a, b) for a in srcs for b in srcs if a < b}
    for a in srcs:
        for b in srcs:
            if a >= b:
                continue
            want = sum(abs(z[(a, w)] - z[(b, w)]) for w in top) / len(top)
            # engine carries freqs as nano-int rationals and micro-rounds
            # pair terms — widen by those buckets
            assert _close(got[(a, b)], want, tol=TOL + 5e-6), (a, b)
