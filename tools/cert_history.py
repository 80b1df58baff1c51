"""Certification ledger: per-query driver-certification history.

The driver writes ``CORRECTNESS_r{N}.json`` each round for the first 50
registry entries (the "window"). This tool folds the whole in-repo
history into one machine-readable ledger:

    {query: {"last_round": int | None,      # latest GREEN driver row
             "rounds": [int, ...],          # every green round
             "staleness": int,              # latest_round - last_round
             "in_window": bool}}            # slated for the next round

and renders it as a table (``--table``) or JSON (default). A query is
GREEN in a round when its row has ``err == null`` and ``rows_match``
(hash_match additionally holds for every oracle-paired query; rows-only
entries are the documented weaker gate).

``tests/test_cert_freshness.py`` imports :func:`ledger` to machine-
enforce the rotation invariant that was previously hand-curated in the
``_HEAD``/``_TAIL`` comments of ``plans/driver_queries.py``.

Usage::

    python tools/cert_history.py            # JSON ledger to stdout
    python tools/cert_history.py --table    # human table, stalest first
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Driver window size — the correctness gate samples the FIRST 50
#: registry entries each round (observed invariant of every
#: CORRECTNESS_r*.json on record).
WINDOW = 50


def _green(row: dict) -> bool:
    return row.get("err") is None and bool(row.get("rows_match"))


def history(repo: str = REPO) -> tuple[dict[str, list[int]], int]:
    """(query -> sorted green rounds, latest recorded round)."""
    hist: dict[str, list[int]] = {}
    latest = 0
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        latest = max(latest, rnd)
        with open(path) as f:
            rows = json.load(f)
        for q, row in rows.items():
            if _green(row):
                hist.setdefault(q, []).append(rnd)
    return {q: sorted(rs) for q, rs in hist.items()}, latest


def ledger(repo: str = REPO) -> tuple[dict[str, dict], int]:
    """Full per-query ledger for the CURRENT registry + latest round."""
    sys.path.insert(0, repo)
    from institutional_fx_etl_spark.plans import driver_queries as dq

    hist, latest = history(repo)
    names = list(dq.REGISTRY)
    window = set(names[:WINDOW])
    retired = set(getattr(dq, "ROTATION_RETIRED", ()))
    out = {}
    for n in names:
        rounds = hist.get(n, [])
        last = rounds[-1] if rounds else None
        out[n] = {
            "last_round": last,
            "rounds": rounds,
            "staleness": (latest - last) if last is not None else latest,
            "in_window": n in window,
            # retired from FORCED rotation (capacity option (b)):
            # certification of record is the pytest core-tier gate
            "retired": n in retired,
        }
    return out, latest


def main(argv: list[str]) -> int:
    led, latest = ledger()
    if "--table" in argv:
        rows = sorted(
            led.items(),
            key=lambda kv: (-(kv[1]["staleness"]), kv[0]),
        )
        print(f"latest recorded round: r{latest}; registry: {len(led)}")
        print(f"{'query':<34} {'last':>5} {'stale':>5} {'window':>6}")
        for name, row in rows:
            last = f"r{row['last_round']}" if row["last_round"] else "—"
            print(
                f"{name:<34} {last:>5} {row['staleness']:>5}"
                f" {'HEAD' if row['in_window'] else '':>6}"
            )
    else:
        print(json.dumps({"latest_round": latest, "queries": led}, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
