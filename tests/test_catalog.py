"""Catalog rotation-scheduler guarantees (r8 verdict next #1).

The round driver hash-checks only the FIRST ~50 entries of
``catalog()`` each round, so the ordering function carries a coverage
contract: a static N-query catalog must be fully driver-checked within
ceil(N/50) rounds. Round 8 demonstrated the failure mode — the old
(last_round, green_count, name) key left ``w3_gap_detect`` at position
50, one past the window, for three consecutive rounds. These tests pin
the strict oldest-first ordering and simulate the rotation to prove
the coverage bound.
"""

from __future__ import annotations

import math

from agrobr_spark.queries import rotation_order

WINDOW = 50


def _simulate(names: list[str], window: int) -> dict[str, int]:
    """Run the driver rotation: each round, the first ``window``
    entries of rotation_order get a green row stamped with that round.
    Returns first-checked round per query."""
    hist: dict[str, tuple[int, int]] = {}
    first_seen: dict[str, int] = {}
    for rnd in range(1, 2 * math.ceil(len(names) / window) + 2):
        for name in rotation_order(names, hist)[:window]:
            last, count = hist.get(name, (-1, 0))
            hist[name] = (rnd, count + 1)
            first_seen.setdefault(name, rnd)
        if len(first_seen) == len(names):
            break
    return first_seen


def test_rotation_covers_catalog():
    """Any static N-query catalog is fully covered in ceil(N/W)
    rounds — including N = 148 (the exact r8 saturation point) and
    awkward N just over a window multiple."""
    for n in (1, 49, 50, 51, 100, 148, 151, 250):
        names = [f"q{i:03d}" for i in range(n)]
        first_seen = _simulate(names, WINDOW)
        bound = math.ceil(n / WINDOW)
        assert len(first_seen) == n
        assert max(first_seen.values()) <= bound, (
            f"N={n}: worst first-check round {max(first_seen.values())} "
            f"> ceil(N/W)={bound}"
        )


def test_rotation_recheck_period_is_bounded():
    """Steady state: once the catalog has been covered, every query is
    RE-checked at least every ceil(N/W) rounds (the 3-round guarantee
    the verdict audits for N=148)."""
    n, rounds = 148, 12
    names = [f"q{i:03d}" for i in range(n)]
    hist: dict[str, tuple[int, int]] = {}
    seen_rounds: dict[str, list[int]] = {name: [] for name in names}
    for rnd in range(1, rounds + 1):
        for name in rotation_order(names, hist)[:WINDOW]:
            last, count = hist.get(name, (-1, 0))
            hist[name] = (rnd, count + 1)
            seen_rounds[name].append(rnd)
    bound = math.ceil(n / WINDOW)
    for name, rs in seen_rounds.items():
        assert rs, f"{name} never checked"
        gaps = [b - a for a, b in zip(rs, rs[1:])]
        assert all(g <= bound for g in gaps), f"{name} recheck gaps {gaps}"


def test_never_green_preempts_but_stale_still_covered():
    """New queries (never green, round -1) jump the queue; as long as
    additions per round stay under the window slack W - (N mod W or W),
    the oldest stale query still lands in the next window. This pins
    the r8 regression: with history through r7, w3-like stragglers
    must sort strictly before anything greened in a later round."""
    hist = {"a_checked_r7": (7, 3), "z_stale_r5": (5, 3)}
    names = ["a_checked_r7", "z_stale_r5", "b_new"]
    order = rotation_order(names, hist)
    assert order == ["b_new", "z_stale_r5", "a_checked_r7"]


def test_rotation_order_is_deterministic_and_total():
    names = ["b", "a", "c"]
    hist = {"a": (3, 1), "b": (3, 2), "c": (2, 9)}
    # same last round → name tiebreak only (count is ignored)
    assert rotation_order(names, hist) == ["c", "a", "b"]
    assert rotation_order(names, hist) == rotation_order(sorted(names), hist)


def test_live_catalog_puts_stalest_first():
    """On the real repo history, the head of the window must be the
    least-recently-driver-green queries — i.e. w3_gap_detect (last
    green r5) sorts before anything greened in r6+."""
    from agrobr_spark.queries import _verification_history, catalog

    hist = _verification_history()
    names = list(catalog())
    if "w3_gap_detect" not in names:  # pragma: no cover
        return
    pos = names.index("w3_gap_detect")
    w3_last = hist.get("w3_gap_detect", (-1, 0))[0]
    ahead = [n for n in names[:pos] if hist.get(n, (-1, 0))[0] > w3_last]
    assert not ahead, f"queries greener than w3 sorted ahead: {ahead[:5]}"
