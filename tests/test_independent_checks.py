"""Independent algorithmic verification for the bounded-math queries.

Oracle parity cannot catch a bug SHARED by the Spark implementation and
its generated SQL twin (both sides encode the same recurrence — the CUSUM
lesson in ROUND_NOTES). These tests verify the round-5-continuation
algorithmic queries against a THIRD formulation: brute-force enumeration,
sequential reference implementations, or closed forms — computed in plain
Python from DuckDB-extracted inputs.
"""

from __future__ import annotations

import math
from fractions import Fraction



from server2_vector_search_server_spark.plans import load_registry
from tests.conftest import SF_SMOKE

REGISTRY = load_registry()


def test_viterbi_dp_is_globally_optimal(spark, duck):
    """Enumerate EVERY segmentation of each word (pieces <= 4 chars) over
    the same vocabulary scores and confirm the DP's score is the true
    maximum and its reported segmentation is a valid witness."""
    out = (REGISTRY["text_unigram_viterbi_tokenize"].fn(spark, SF_SMOKE)
           .collect())
    # independent vocabulary build: DuckDB, not Spark
    rows = duck.execute("""
      WITH toks AS (
        SELECT t.term FROM documents,
          UNNEST(list_filter(string_split_regex(trim(text), '\\s+'),
                             x -> x <> '')) AS t(term)),
      pieces AS (
        SELECT substr(term, i.i, l.l) AS piece, COUNT(*) AS cnt
        FROM toks, UNNEST(range(1, 5)) AS l(l),
             UNNEST(range(1, length(term) + 1)) AS i(i)
        WHERE i.i + l.l - 1 <= length(term)
        GROUP BY 1),
      chars AS (SELECT SUM(cnt) AS t FROM pieces WHERE length(piece) = 1),
      multi AS (
        SELECT piece, cnt FROM (
          SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece)
                 AS rn
          FROM pieces WHERE length(piece) >= 2) WHERE rn <= 20)
      SELECT p.piece,
             CAST(ROUND(ROUND(ln(CAST(p.cnt AS DOUBLE)
                                 / CAST(chars.t AS DOUBLE)), 9) * 1000000)
                  AS BIGINT) AS score
      FROM (SELECT piece, cnt FROM pieces WHERE length(piece) = 1
            UNION ALL SELECT * FROM multi) p, chars
    """).fetchall()
    scores = {p: s for p, s in rows}

    def best_score(w: str) -> int:
        # brute force over all compositions (max piece 4, len <= 12)
        memo = {0: 0}
        for i in range(1, len(w) + 1):
            cands = [memo[j] + scores[w[j:i]]
                     for j in range(max(0, i - 4), i)
                     if j in memo and w[j:i] in scores]
            if cands:
                memo[i] = max(cands)
        return memo[len(w)]

    assert len(out) > 10
    for r in out[:200]:
        w, seg = r["word"], r["seg"].split("|")
        assert "".join(seg) == w                       # valid witness
        assert all(p in scores for p in seg)
        witness = sum(scores[p] for p in seg)
        assert witness == best_score(w), w             # global optimum
        assert abs(r["score"] - witness / 1e6) < 1e-9
        assert r["n_pieces"] == len(seg)


def test_shapley_matches_permutation_enumeration(spark, duck):
    """phi_i must equal the average marginal contribution over all 4!
    channel orderings — the DEFINITION, computed in exact Fractions."""
    from itertools import permutations

    out = {r["channel"]: r for r in
           REGISTRY["events_shapley_attribution"].fn(spark, SF_SMOKE)
           .collect()}
    rows = duck.execute("""
      SELECT mask, SUM(conv) AS c FROM (
        SELECT user_id, CAST(ts AS DATE) AS day,
               bit_or(CASE event_type WHEN 'click' THEN 1
                      WHEN 'error' THEN 2 WHEN 'signup' THEN 4
                      WHEN 'view' THEN 8 ELSE 0 END) AS mask,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS conv
        FROM events GROUP BY user_id, CAST(ts AS DATE))
      GROUP BY mask
    """).fetchall()
    n_j = duck.execute(
        "SELECT COUNT(*) FROM (SELECT DISTINCT user_id, CAST(ts AS DATE) "
        "FROM events)").fetchone()[0]
    conv_by_mask = dict(rows)
    bits = {"click": 1, "error": 2, "signup": 4, "view": 8}

    def v(s: int) -> int:
        return sum(c for m, c in conv_by_mask.items() if (m & s) == m)

    phi = {ch: Fraction(0) for ch in bits}
    for perm in permutations(bits):
        s = 0
        for ch in perm:
            phi[ch] += Fraction(v(s | bits[ch]) - v(s), 24)
            s |= bits[ch]
    for ch, b in bits.items():
        expected = phi[ch] / n_j
        assert abs(out[ch]["shapley_value"] - float(expected)) < 2e-6, ch


def test_kaplan_meier_matches_sequential_product(spark, duck):
    """S(t) recomputed by the plain sequential product over DuckDB-built
    lifetimes must match the window/exp-sum implementation."""
    out = REGISTRY["events_kaplan_meier_retention"].fn(spark, SF_SMOKE) \
        .collect()
    rows = duck.execute("""
      WITH spans AS (
        SELECT user_id, MIN(ts) AS f, MAX(ts) AS l FROM events
        GROUP BY user_id),
      b AS (SELECT MAX(ts) AS e FROM events)
      SELECT datediff('day', CAST(f AS DATE), CAST(l AS DATE)) AS d,
             CASE WHEN l < e - INTERVAL 7 DAY THEN 1 ELSE 0 END AS died
      FROM spans, b
    """).fetchall()
    from collections import Counter
    deaths, totals = Counter(), Counter()
    for d, died in rows:
        totals[d] += 1
        deaths[d] += died
    n_at_risk = sum(totals.values())
    s = 1.0
    expected = {}
    for d in sorted(totals):
        if deaths[d] > 0:
            s *= 1.0 - deaths[d] / n_at_risk
        expected[d] = s
        n_at_risk -= totals[d]
    for r in out:
        assert abs(r["survival"] - expected[r["duration_days"]]) < 1e-5


def test_isotonic_matches_sequential_pav(spark, duck):
    """The minimax closed form must equal the textbook sequential
    pool-adjacent-violators sweep."""
    out = REGISTRY["events_isotonic_calibration"].fn(spark, SF_SMOKE) \
        .collect()
    rows = duck.execute("""
      SELECT GREATEST(-7, LEAST(8,
               CAST(FLOOR(ROUND(ln(CAST(value AS DOUBLE)) / ln(2.0), 9))
                    AS INTEGER))) AS bin,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS g,
             COUNT(*) AS n
      FROM events WHERE value > 0 GROUP BY 1 ORDER BY 1
    """).fetchall()
    blocks = [[b, Fraction(g), Fraction(n)] for b, g, n in rows]
    # sequential PAV: merge adjacent blocks while decreasing
    stack: list[list] = []
    for b, g, n in blocks:
        stack.append([g, n, [b]])
        while (len(stack) >= 2
               and stack[-2][0] / stack[-2][1]
               >= stack[-1][0] / stack[-1][1]):
            g2, n2, bs2 = stack.pop()
            stack[-1][0] += g2
            stack[-1][1] += n2
            stack[-1][2].extend(bs2)
    expected = {}
    for g, n, bs in stack:
        for b in bs:
            expected[b] = float(g / n)
    for r in out:
        assert abs(r["iso_rate"] - expected[r["bin"]]) < 1e-5, r["bin"]


def test_markov_iteration_near_closed_form(spark, duck):
    """The truncated 16-round absorbing-chain iteration must approximate
    the exact (I - Q)^-1 R solve; removal effects keep their sign/order."""
    import numpy as np

    out = {r["channel"]: r for r in
           REGISTRY["events_markov_attribution"].fn(spark, SF_SMOKE)
           .collect()}
    rows = duck.execute("""
      WITH seq AS (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events),
      fp AS (SELECT user_id, MIN(rn) AS prn FROM seq
             WHERE event_type = 'purchase' GROUP BY user_id),
      j AS (SELECT s.user_id,
                   CASE WHEN s.event_type = 'purchase' THEN 'conv'
                        ELSE s.event_type END AS st, s.rn
            FROM seq s LEFT JOIN fp ON s.user_id = fp.user_id
            WHERE fp.prn IS NULL OR s.rn <= fp.prn),
      t AS (SELECT COALESCE(lag(st) OVER (PARTITION BY user_id
                                          ORDER BY rn), 'start') AS src,
                   st AS dst FROM j),
      term AS (
        SELECT st AS src, 'null' AS dst FROM (
          SELECT st, rn, MAX(rn) OVER (PARTITION BY user_id) AS mx,
                 MAX(CASE WHEN st = 'conv' THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id) AS hc FROM j)
        WHERE rn = mx AND hc = 0)
      SELECT src, dst, COUNT(*) FROM
        (SELECT * FROM t UNION ALL SELECT * FROM term)
      GROUP BY src, dst
    """).fetchall()
    totals: dict[str, int] = {}
    for s, d, c in rows:
        totals[s] = totals.get(s, 0) + c
    prob = {(s, d): c / totals[s] for s, d, c in rows}
    states = ["start", "click", "error", "signup", "view"]

    def solve(removed=None):
        live = [s for s in states if s != removed]
        idx = {s: i for i, s in enumerate(live)}
        q = np.zeros((len(live), len(live)))
        r = np.zeros(len(live))
        for s in live:
            r[idx[s]] = prob.get((s, "conv"), 0.0)
            for c in live[1:]:           # channels only (never 'start')
                if c != removed and (s, c) in prob:
                    q[idx[s], idx[c]] = prob[(s, c)]
        p = np.linalg.solve(np.eye(len(live)) - q, r)
        return p[idx["start"]]

    pf = solve()
    for ch in ("click", "error", "signup", "view"):
        exact_effect = pf - solve(ch)
        got = out[ch]["removal_effect"]
        # 16 truncated rounds under-estimate slightly; the tail is
        # bounded by the chain's spectral radius — 1e-3 is generous
        assert abs(got - exact_effect) < 1e-3, ch


# the shared `duck` fixture (tests/conftest.py) provides all table views
