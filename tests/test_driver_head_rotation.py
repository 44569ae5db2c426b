"""The driver-sample head: pinned core + self-rotating coverage window.

The per-round correctness gate samples the FIRST ~50 registry queries, so
the head ordering in ``plans/__init__`` IS the driver-facing contract for
which operators get driver-verified each round. These tests pin its three
tiers (pure functions, no Spark): the core never moves, rotation entries
drop once a committed CORRECTNESS artifact shows the driver sampled them,
freed slots auto-fill with never-sampled queries in base order, and the
window stays exactly ``_DRIVER_HEAD_SIZE`` even when the whole registry
has been sampled.
"""

from __future__ import annotations

from server2_vector_search_server_spark import plans


def _base(n: int = 400) -> list[str]:
    return (list(plans._DRIVER_HEAD_CORE)
            + list(plans._DRIVER_HEAD_ROTATION)
            + [f"q{i:03d}" for i in range(n)])


def test_fresh_repo_head_is_core_plus_rotation():
    head = plans._driver_head(_base(), seen=set())
    assert head == (plans._DRIVER_HEAD_CORE
                    + plans._DRIVER_HEAD_ROTATION)[:plans._DRIVER_HEAD_SIZE]
    assert len(head) == plans._DRIVER_HEAD_SIZE


def test_core_stays_pinned_even_when_sampled():
    # rotate, don't hide (VERDICT r7): core queries were sampled in r1-r7
    # and must STAY in the window anyway
    head = plans._driver_head(_base(), seen=set(plans._DRIVER_HEAD_CORE))
    assert head[:len(plans._DRIVER_HEAD_CORE)] == plans._DRIVER_HEAD_CORE


def test_sampled_rotation_entries_are_replaced_by_autofill():
    base = _base()
    sampled = set(plans._DRIVER_HEAD_CORE) | set(plans._DRIVER_HEAD_ROTATION)
    head = plans._driver_head(base, seen=sampled)
    assert head[:len(plans._DRIVER_HEAD_CORE)] == plans._DRIVER_HEAD_CORE
    fill = head[len(plans._DRIVER_HEAD_CORE):]
    # every freed slot goes to a never-sampled query, in base order
    want = [n for n in base if n not in sampled][:len(fill)]
    assert fill == want
    assert len(head) == plans._DRIVER_HEAD_SIZE


def test_rotation_converges_to_full_coverage():
    """Simulating the driver across rounds: every round samples the head,
    the union grows, and eventually every registry query has been
    driver-verified at least once — the property the static r7 prefix
    lacked."""
    base = _base(150)
    seen: set[str] = set()
    for _ in range(30):
        head = plans._driver_head(base, seen)
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


def test_sampled_so_far_reads_committed_artifacts():
    # ground truth comes from the repo's own CORRECTNESS_r*.json files;
    # r1-r7 are committed, so the union must contain the long-standing
    # flagship rows and currently count >= 77 distinct names (VERDICT r7)
    seen = plans._driver_sampled_so_far()
    assert "search_score_topk" in seen
    assert len(seen) >= 77
