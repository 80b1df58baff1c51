"""Machine-enforced driver-certification freshness (r10 verdict ask #3).

The driver's correctness gate samples the FIRST 50 registry entries per
round at sf0.01; the pytest tail gate re-checks everything else, but
only at sf0.001 — scale-sensitive regressions (bucket caps, engine
crossovers) can hide below the tail gate's corpus size. The rotation of
the 50-slot window used to be hand-curated comments in
``plans/driver_queries.py``; this test turns the invariant into code so
staleness creates automatic rotation pressure.

Invariant: for every registered query, EITHER it sits in the upcoming
window (``REGISTRY`` entries [0:50] — it will be re-certified this
round), OR its latest green driver row is at most ``MAX_STALE`` rounds
behind the latest recorded round.

Why ``MAX_STALE = 5`` and not the verdict's suggested 4: the bound is
arithmetically forced. 257 registered queries through a 50-slot window
need ceil(257/50) = 6 rounds per full rotation, so the best achievable
worst-case gap between consecutive certifications of the same query is
5 rounds — a ≤4 invariant would need 257/5 ≈ 51.4 certifications per
round, more than the driver samples. 5 is therefore the TIGHTEST
enforceable threshold, and this test enforces it exactly (any slack
would have to come from shrinking the registry, which would delete
coverage). The window-exemption term is what makes the invariant
plannable: the test is evaluated against the committed _HEAD for the
round about to run.

ROTATION RETIREMENT (round 14 — capacity option (b)): queries in
``driver_queries.ROTATION_RETIRED`` (== CORE_TIER) are exempt from
every staleness/capacity count here, because their certification of
record is the pytest core-tier gate (tests/test_core_tier.py:
out-of-window core queries oracle-check at sf0.01 on EVERY pytest
run — more frequent than a driver row every ≤5 rounds). The rotation
invariants below therefore range over NON-RETIRED queries only.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from cert_history import WINDOW, ledger  # noqa: E402

MAX_STALE = 5


def test_every_query_fresh_or_in_window():
    led, latest = ledger()
    assert latest >= 10, "certification history missing from repo"
    stale = {
        name: row
        for name, row in led.items()
        # never-certified entries are a separate class (they have no
        # certification to be stale FROM — the tail test below keeps
        # them out of the demotion tail until their first window slot)
        if row["last_round"] is not None
        and not row["in_window"]
        and not row["retired"]
        and row["staleness"] > MAX_STALE
    }
    assert not stale, (
        f"{len(stale)} queries are >{MAX_STALE} rounds driver-stale and "
        f"not slated for the upcoming window — rotate them into _HEAD "
        f"in plans/driver_queries.py: "
        f"{sorted((n, r['last_round']) for n, r in stale.items())}"
    )


def test_window_is_exactly_driver_sized():
    led, _ = ledger()
    assert sum(1 for r in led.values() if r["in_window"]) == WINDOW


def test_never_certified_queries_never_hide_in_the_tail():
    """A query with NO green driver row ever must be in the upcoming
    window or first in line for the next one (the registry's middle
    section) — never parked in the demotion tail. Ops added AFTER a
    round's window froze legitimately wait one round (the round-10
    overflow precedent: dedup_weights et al. were judge-certified and
    pytest-tail-gated, then headed the next window)."""
    led, _ = ledger()
    from institutional_fx_etl_spark.plans.driver_queries import _TAIL

    never = [n for n, r in led.items() if r["last_round"] is None]
    parked = [n for n in never if n in _TAIL]
    assert not parked, (
        f"never-driver-certified queries parked in the demotion tail: "
        f"{parked}"
    )


def test_window_prioritizes_the_stalest():
    """No CERTIFIED out-of-window query may be staler than the stalest
    certified in-window query — the window must be the staleness
    frontier. Never-certified entries are their own class (previous
    test).

    Same-commit rotation coupling is INTENDED (r11 ADVICE noted it):
    the ledger reads every CORRECTNESS_r*.json in the worktree, so the
    moment a round's fresh results land, this test goes red until the
    _HEAD window is recomposed for the NEXT round in the same commit.
    That is the forcing function — the driver's results file and the
    window that answers it always travel together, and a round can
    never start with last round's window still in place."""
    led, _ = ledger()
    in_w = [r["staleness"] for r in led.values()
            if r["in_window"] and r["last_round"] is not None
            and not r["retired"]]
    out_w = [r["staleness"] for r in led.values()
             if not r["in_window"] and r["last_round"] is not None
             and not r["retired"]]
    if in_w and out_w:
        assert max(out_w) <= max(in_w) + 0, (
            "an out-of-window query is staler than everything in the "
            "window — the rotation is not picking the stalest first"
        )


# --- window-capacity policy (r12 verdict ask #2) ----------------------
# A 50-slot window re-certifying every query within MAX_STALE=5 rounds
# supports at most WINDOW*(MAX_STALE+1) = 300 registry entries at
# steady state. POLICY (ROADMAP "window capacity"): (a) hard ceiling
# 300; (b) new ops debut IN-WINDOW only (never parked post-window), and
# only as many as the round has slack after the forced cohort; (c) when
# the forced cohort is short of 50, the slack goes to new debuts first,
# then the stalest staleness-(MAX_STALE-1) rows to smooth future
# cohorts. These two tests make saturation fail ONE ROUND EARLY — at
# window-composition time, not at a future round's impossible
# composition.


def test_registry_fits_rotation_capacity():
    led, _ = ledger()
    cap = WINDOW * (MAX_STALE + 1)
    rotated = sum(1 for r in led.values() if not r["retired"])
    assert rotated <= cap, (
        f"registry rotates {rotated} queries; the {WINDOW}-slot/"
        f"MAX_STALE={MAX_STALE} rotation supports at most {cap} — "
        "retire queries into the pytest-certified core tier or "
        "re-prove the rotation arithmetic before growing further"
    )


def test_retired_queries_are_pytest_certified():
    """Option (b)'s soundness condition: every rotation-retired query
    must be a CORE_TIER member (the pytest sf0.01 gate in
    tests/test_core_tier.py is exactly the CORE_TIER surface)."""
    from institutional_fx_etl_spark.plans.driver_queries import (
        CORE_TIER,
        ROTATION_RETIRED,
    )

    not_gated = [n for n in ROTATION_RETIRED if n not in CORE_TIER]
    assert not not_gated, (
        f"rotation-retired queries without a pytest certification "
        f"gate: {not_gated}"
    )


def test_next_round_demand_fits_window():
    """Project ONE round ahead: after the upcoming window certifies,
    every query now at staleness MAX_STALE-1 and out-of-window will
    sit at the MAX_STALE ceiling and MUST head the next window
    (together with any never-certified query still waiting). If that
    forced cohort alone exceeds the window, next round's composition
    is infeasible no matter what — fail now, while there is still a
    round of slack to rebalance in."""
    led, _ = ledger()
    forced_next = [
        n
        for n, r in led.items()
        if not r["in_window"]
        and not r["retired"]
        and (
            r["last_round"] is None
            or r["staleness"] == MAX_STALE - 1
        )
    ]
    assert len(forced_next) <= WINDOW, (
        f"{len(forced_next)} queries are pinned for the NEXT round's "
        f"window (> {WINDOW} slots): {sorted(forced_next)[:10]}..."
    )
