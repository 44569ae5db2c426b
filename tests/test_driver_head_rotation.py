"""The driver-sample head: pinned core + self-rotating coverage window.

The per-round correctness gate samples the FIRST ~50 registry queries, so
the head ordering in ``plans/__init__`` IS the driver-facing contract for
which operators get driver-verified each round.  These tests pin its five
tiers (pure functions, no Spark):

  1. the small flagship core never moves;
  2. queries whose LAST committed driver record is a failure are pinned
     for re-sampling until a newer green record lands (derived, not
     hand-listed — ADVICE r8 / VERDICT r8 next-#1);
  3. a deterministic round-robin re-verifies previously-green queries so
     old surfaces keep getting driver-checked (ADVICE r8 medium);
  4. hand-picked never-sampled rotation entries drop automatically once a
     committed CORRECTNESS artifact shows the driver verified them;
  5. freed slots auto-fill with never-sampled queries in base order, and
     the window stays exactly ``_DRIVER_HEAD_SIZE`` even when the whole
     registry has been sampled.
"""

from __future__ import annotations

from server2_vector_search_server_spark import plans


def _base(n: int = 400) -> list[str]:
    return (list(plans._DRIVER_HEAD_CORE)
            + list(plans._DRIVER_HEAD_ROTATION)
            + [f"q{i:03d}" for i in range(n)])


def test_fresh_repo_head_is_core_plus_rotation():
    head = plans._driver_head(_base(), seen=set())
    want = (plans._DRIVER_HEAD_CORE
            + plans._DRIVER_HEAD_ROTATION)[:plans._DRIVER_HEAD_SIZE]
    assert head[:len(want)] == want
    assert len(head) == plans._DRIVER_HEAD_SIZE


def test_core_stays_pinned_even_when_sampled():
    # rotate, don't hide (VERDICT r7): the flagship core was sampled in
    # r1-r8 and must STAY in the window anyway
    head = plans._driver_head(_base(), seen=set(plans._DRIVER_HEAD_CORE))
    assert head[:len(plans._DRIVER_HEAD_CORE)] == plans._DRIVER_HEAD_CORE


def test_last_record_red_is_pinned_until_green():
    """A query whose most recent driver record is a failure re-enters the
    head right after the core, sorted, and leaves once re-verified."""
    base = _base()
    red = {"q007", "q003"}
    seen = set(base[:plans._DRIVER_HEAD_SIZE]) | red
    head = plans._driver_head(base, seen, red=red)
    ncore = len(plans._DRIVER_HEAD_CORE)
    assert head[ncore:ncore + 2] == ["q003", "q007"]
    # once the driver re-verifies them green, the pin drops
    head2 = plans._driver_head(base, seen, red=set())
    assert "q003" not in head2[ncore:ncore + 2]


def test_round_robin_reverify_is_deterministic_and_rotates():
    """_REVERIFY_SLOTS previously-green queries are re-sampled each round;
    the selection is a pure function of (sampled set, phase) and walks the
    whole pool as the phase advances."""
    base = _base(100)
    seen = set(base)  # everything sampled, nothing red
    ncore = len(plans._DRIVER_HEAD_CORE)
    k = plans._REVERIFY_SLOTS
    pool = sorted(set(base) - set(plans._DRIVER_HEAD_CORE))
    picked: set[str] = set()
    for phase in range(0, 1 + len(pool) // k):
        head = plans._driver_head(base, seen, phase=phase)
        slot = head[ncore:ncore + k]
        start = (phase * k) % len(pool)
        want = [pool[(start + i) % len(pool)] for i in range(k)]
        assert slot == want
        picked.update(slot)
    assert picked == set(pool)  # the walk covers every sampled query


def test_sampled_rotation_entries_are_replaced_by_autofill():
    base = _base()
    sampled = set(plans._DRIVER_HEAD_CORE) | set(plans._DRIVER_HEAD_ROTATION)
    head = plans._driver_head(base, seen=sampled)
    ncore = len(plans._DRIVER_HEAD_CORE)
    assert head[:ncore] == plans._DRIVER_HEAD_CORE
    k = plans._REVERIFY_SLOTS
    fill = head[ncore + k:]
    # every freed slot beyond the re-verify window goes to a never-sampled
    # query, in base order
    want = [n for n in base if n not in sampled][:len(fill)]
    assert fill == want
    assert len(head) == plans._DRIVER_HEAD_SIZE


def test_head_budget_leaves_at_least_40_fresh_slots():
    """VERDICT r8 next-#2 asks for >=40 first-time-sampled rows per round;
    the fixed overhead (core + re-verify slots) must leave that many."""
    fixed = len(plans._DRIVER_HEAD_CORE) + plans._REVERIFY_SLOTS
    assert plans._DRIVER_HEAD_SIZE - fixed >= 40


def test_rotation_converges_to_full_coverage():
    """Simulating the driver across rounds: every round samples the head,
    the union grows, and eventually every registry query has been
    driver-verified at least once — the property the static r7 prefix
    lacked."""
    base = _base(150)
    seen: set[str] = set()
    for phase in range(30):
        head = plans._driver_head(base, seen, phase=phase)
        seen.update(head)
        if set(base) <= seen:
            break
    assert set(base) <= seen


def test_exhausted_registry_still_fills_window():
    base = _base(100)
    head = plans._driver_head(base, seen=set(base))
    assert len(head) == plans._DRIVER_HEAD_SIZE
    assert head[:len(plans._DRIVER_HEAD_CORE)] == plans._DRIVER_HEAD_CORE
    assert len(set(head)) == len(head)


def test_red_names_not_in_registry_are_ignored():
    # a stale artifact may reference a renamed/removed query; the head must
    # not try to pin names the registry can't resolve
    base = _base()
    head = plans._driver_head(base, seen={"ghost"}, red={"ghost"})
    assert "ghost" not in head
    assert len(head) == plans._DRIVER_HEAD_SIZE


def test_sampled_so_far_reads_committed_artifacts():
    # ground truth comes from the repo's own CORRECTNESS_r*.json files;
    # r1-r8 are committed, so the union must contain the long-standing
    # flagship rows and currently count >= 107 distinct names (VERDICT r8)
    seen, red, n = plans._driver_record()
    assert "search_score_topk" in seen
    assert len(seen) >= 107
    assert n >= 8
    # the r8-era stale trio is exactly the last-record-red set until the
    # driver re-samples them (this assertion is intentionally >=0-shaped:
    # once CORRECTNESS_r09 lands green, red becomes empty and still passes)
    assert red <= seen
