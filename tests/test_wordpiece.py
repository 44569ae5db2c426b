"""WordPiece greedy-encode unit tests — including the [UNK] branch the
all-alpha fixture corpus can never reach (single-char vocab covers a-z,
and the word filter admits only ^[a-z]{1,16}$)."""

from __future__ import annotations

from server2_vector_search_server_spark.plans.text_queries import (
    _WP_CONT_ORDER,
    _WP_START_ORDER,
    wordpiece_encode,
)


def test_longest_match_first():
    # "the" is a start piece — must win over t + ##h + ##e
    assert wordpiece_encode("the") == (1, "the", False)
    # "order": "or" (len 2) beats "o"; then ##d; then ##er beats ##e
    assert wordpiece_encode("order") == (3, "or ##d ##er", False)


def test_continuation_flag_respected():
    # "##ing" exists only as a CONTINUATION: word-initially the matcher
    # must use start pieces ("in" then ##g), never the ## entry
    assert wordpiece_encode("ing") == (2, "in ##g", False)
    # and mid-word it does fire: "sing" -> s + ##ing (one cont piece)
    assert wordpiece_encode("sing") == (2, "s ##ing", False)


def test_unk_whole_word_policy():
    # a vocab hole mid-word voids the WHOLE word, not a partial prefix
    starts = ["a", "b"]
    conts = ["b"]                      # no ##a: "ab" ok, "aba" UNKs
    assert wordpiece_encode("ab", starts, conts) == (2, "a ##b", False)
    assert wordpiece_encode("aba", starts, conts) == (1, "[UNK]", True)
    # hole at position 0 also UNKs
    assert wordpiece_encode("ba", ["a"], ["a"]) == (1, "[UNK]", True)


def test_progress_guaranteed():
    # every vocab piece is non-empty, so each step advances: a 16-char
    # word terminates in <= 16 pieces
    n, seg, unk = wordpiece_encode("a" * 16)
    assert not unk and n <= 16
    assert seg.split(" ")[0] == "a" and all(
        p.startswith("##") for p in seg.split(" ")[1:])


def test_default_vocab_orders_are_longest_first():
    for order in (_WP_START_ORDER, _WP_CONT_ORDER):
        lens = [len(p) for p in order]
        assert lens == sorted(lens, reverse=True)
