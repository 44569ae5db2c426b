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
