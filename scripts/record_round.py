#!/usr/bin/env python
"""Round-start bookkeeping: ingest the driver's CORRECTNESS artifact.

Usage: python scripts/record_round.py <round>   # e.g. 9

Reads ``CORRECTNESS_r0<round>.json`` (the driver's hard sf0.01 sweep of
the first 50 ``queries()`` entries) and updates
``driver_window_state.json``:

  * every fully-green row (rows+schema+hash) gets ``last_green = round``
    and leaves the never-verified pending list;
  * red rows keep their previous state (a failed re-check must not mint
    a green);
  * catalog queries the state file has never seen are appended to
    pending (new additions queue behind older debt).

This replaces the hand-maintained per-round ``_LAST_GREEN_R*`` lists
(round-8 verdict, "derive the window from git, not by hand"): the
rotation is now derived from the driver's own artifacts, so it cannot
silently drift.  After running this, reset ``_CHANGED_THIS_ROUND = []``
and ``_WINDOW_EXEMPT = {}`` in ``__spark_entry__.py`` for the new round.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STATE_PATH = os.path.join(REPO, "driver_window_state.json")


def main() -> int:
    if len(sys.argv) != 2 or not sys.argv[1].isdigit():
        print(__doc__)
        return 2
    rnd = int(sys.argv[1])
    art = os.path.join(REPO, f"CORRECTNESS_r{rnd:02d}.json")
    if not os.path.exists(art):
        print(f"missing {art}", file=sys.stderr)
        return 1
    with open(art, encoding="utf-8") as f:
        rows = json.load(f)
    with open(STATE_PATH, encoding="utf-8") as f:
        state = json.load(f)

    from openalex_walden_spark import queries as q

    q.load_all()

    greens = sorted(
        name for name, r in rows.items()
        if r.get("rows_match") and r.get("schema_match") and r.get("hash_match")
    )
    reds = sorted(set(rows) - set(greens))
    for name in greens:
        if name not in q.CATALOG:
            print(f"  note: green row for retired query {name!r} ignored")
            continue
        state["last_green"][name] = rnd
    state["pending"] = [
        n for n in state["pending"]
        if n in q.CATALOG and n not in state["last_green"]
    ]
    known = set(state["last_green"]) | set(state["pending"])
    fresh = [n for n in q.CATALOG if n not in known]
    state["pending"].extend(fresh)
    state["last_green"] = {
        k: v for k, v in sorted(state["last_green"].items())
        if k in q.CATALOG
    }

    with open(STATE_PATH, "w", encoding="utf-8") as f:
        json.dump(state, f, indent=1)
        f.write("\n")
    print(
        f"round {rnd}: {len(greens)} greens recorded, {len(reds)} reds "
        f"unchanged {reds if reds else ''}\n"
        f"state: {len(state['last_green'])} verified, "
        f"{len(state['pending'])} pending"
    )
    print(
        "now reset _CHANGED_THIS_ROUND = [] and _WINDOW_EXEMPT = {} in "
        "__spark_entry__.py for the new round"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
