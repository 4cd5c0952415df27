"""Rotation invariant for the driver's 50-query correctness window.

Round-6 verdict item #2: any query whose implementing code changed
since its last green driver row must sit INSIDE the first 50 entries of
``queries()`` so the next driver run re-certifies it with a hard row.
The ledger (``tools/driver_row_ledger.json``) records, per query, the
last green round, the sha256 of each implementing op module at that
round's code snapshot, and the sha256 of the query's own q_* wrapper
source; ``tools/rotation_ledger.py`` regenerates it from the
CORRECTNESS_r*.json history after each round's file lands.
"""

from __future__ import annotations

import importlib.util
import json
from pathlib import Path

import pytest

from tools.rotation_ledger import WINDOW, entry_hashes, file_hash, query_modules

REPO = Path(__file__).resolve().parent.parent


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "spark_entry_rotation", REPO / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _ledger():
    p = REPO / "tools" / "driver_row_ledger.json"
    if not p.is_file():
        pytest.fail("tools/driver_row_ledger.json missing — run tools/rotation_ledger.py")
    return json.loads(p.read_text())


def test_changed_or_unverified_queries_are_in_window():
    order = list(_load_entry().queries().keys())
    ledger = _ledger()
    current_entry = entry_hashes()

    offenders: list[str] = []
    for q in order[WINDOW:]:
        entry = ledger.get(q)
        if entry is None:
            offenders.append(f"{q}: no driver row in any round")
            continue
        stale = [m for m, h in entry["modules"].items() if file_hash(m) != h]
        if entry.get("entry_sha") and current_entry.get(q) != entry["entry_sha"]:
            stale.append("__spark_entry__.py:q_" + q)
        if stale:
            offenders.append(
                f"{q}: code changed since its r{entry['round']} row: {stale}"
            )
    assert not offenders, (
        "queries past the driver's 50-row cap need fresh driver rows "
        "(rotate them into the window):\n  " + "\n  ".join(offenders)
    )


def _latest_completed_round() -> int:
    """The latest round with a recorded CORRECTNESS_r{N}.json."""
    rounds = [
        int(p.stem.split("_r")[1]) for p in REPO.glob("CORRECTNESS_r*.json")
    ]
    return max(rounds) if rounds else 0


def test_deferred_certificates_within_freshness_budget():
    """Round-7 verdict item #2: unchanged code is necessary but not
    sufficient to sit past the cap — certificates must not age
    indefinitely.

    Age is measured against the latest COMPLETED round (max over the
    recorded CORRECTNESS_r*.json — the r8/r9 verdicts' prescription).
    The two prior formulations both flipped the suite red at a round
    boundary: age-at-now went red the instant the driver recorded the
    round (deferred rows aged retroactively), and the prospective
    ``max+1`` variant just moved the same red to post-record, because
    "deferred" by definition means "not certified in the round that
    just recorded". Against the completed round the steady state is
    clean: a deferred row must carry a row from the latest or the
    immediately previous completed round (age <= 1), the halves of the
    query set alternate through the 50-slot window round over round,
    and recording round N leaves every N-1-certified deferred row at
    age exactly 1."""
    order = list(_load_entry().queries().keys())
    ledger = _ledger()
    latest = _latest_completed_round()
    MAX_AGE = 1
    offenders = [
        f"{q}: last row r{ledger[q]['round']} is"
        f" {latest - ledger[q]['round']} rounds behind r{latest}"
        f" (budget {MAX_AGE})"
        for q in order[WINDOW:]
        if q in ledger and latest - ledger[q]["round"] > MAX_AGE
    ]
    assert not offenders, (
        "certificates past the 50-row cap are stale against the latest "
        "completed round — rotate these into the window:\n  "
        + "\n  ".join(offenders)
    )


def test_every_query_is_hash_covered():
    """Each query must be covered by a wrapper hash (all are) and the
    op-module mapping must resolve for every query that imports ops."""
    order = list(_load_entry().queries().keys())
    wrappers = entry_hashes()
    missing = [q for q in order if q not in wrappers]
    assert not missing, f"queries with no q_* wrapper source segment: {missing}"
    mapping = query_modules()
    # module mapping may legitimately be empty for wrapper-only queries,
    # but must exist as a key for any q_* function (and all gen_*).
    unmapped = [q for q in order if q not in mapping]
    assert not unmapped, f"queries missing from query_modules(): {unmapped}"
