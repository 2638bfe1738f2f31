"""Invariants of the driver-window ordering (registry.py).

The driver checks the first ~50 registry entries per round, so the
insertion order IS the hard-signal budget. These tests pin the
properties VERDICT r4/r5 asked for — and every assertion here must
survive the round's own CORRECTNESS file landing (the r5 failure mode
was a test that asserted the coverfill queries were NEVER checked,
which became false the moment they were):

1. the pinned set-cover is minimal (25 queries) and, together with
   the per-round computed coverage fill, covers every core SURVEY §2
   id — in THIS round's window and in every simulated future round;
2. the window gives min(25, remaining-fresh) slots to
   never-driver-checked queries (rotation throughput);
3. no rows-only (oracle=None) fresh query outranks an oracle-gated
   fresh query in the rotation;
4. every spotlight name resolves in the registry (no ghost debuts).
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from sql_data_warehouse_spark.analytics.registry import (
    _PINNED,
    _RENAMED_HISTORY,
    _SPOTLIGHT,
    _SPOTLIGHT_AS_OF,
    all_queries,
    core_ids,
    coverfill,
    driver_checked,
    ordered_names,
    spotlight,
)

ROOT = Path(__file__).resolve().parents[1]

WINDOW = 50  # driver truncation (CORRECTNESS_r01..r05 each hold 50 rows)


def _raw_checked() -> frozenset[str]:
    """Names with ANY recorded driver row (including err=no_oracle
    rows that predate a retrofitted oracle) — only the pinned-set
    provenance test wants this; freshness logic mirrors the real
    window through :func:`driver_checked` (ADVICE r6 #4)."""
    names: set[str] = set()
    for p in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        names.update(json.loads(p.read_text()).keys())
    return frozenset(names)


def _checked() -> frozenset[str]:
    return driver_checked()


@pytest.fixture(scope="module")
def registry():
    return all_queries()


def test_pinned_is_minimal_25(registry):
    assert len(_PINNED) == 25
    assert _PINNED <= set(registry)
    # every pinned query is proven: it has had a green driver row
    assert _PINNED <= _raw_checked()


def test_spotlight_names_resolve(registry):
    """VERDICT r5 ask #2: an announced debut that is not registered is
    a ghost the driver can never run — fail loudly."""
    ghosts = _SPOTLIGHT - set(registry)
    assert not ghosts, f"spotlight names missing from registry: {sorted(ghosts)}"


def test_checked_history_has_no_ghosts(registry):
    """VERDICT r8 ask #3: every name the driver ever recorded must be
    either registered today or a documented rename — a checked name
    that is neither means a window slot was burned on something users
    can't run, and that must be a loud failure, not archaeology."""
    ghosts = _raw_checked() - set(registry) - set(_RENAMED_HISTORY)
    assert not ghosts, f"checked-but-unregistered names: {sorted(ghosts)}"
    # the allowlist itself must not rot: a rename that re-enters the
    # registry under its old name should be dropped from the map
    stale = set(_RENAMED_HISTORY) & set(registry)
    assert not stale, f"renames that are registered again: {sorted(stale)}"
    # and every rename target cited in the rationale must resolve
    for old, why in _RENAMED_HISTORY.items():
        targets = [n for n in registry if n in why]
        assert targets, f"rename rationale for {old} cites no registered query"


def test_pinned_plus_coverfill_covers_all_core_ids(registry):
    got: set[str] = set()
    for name in _PINNED | coverfill(_checked()):
        got.update(registry[name].survey.split())
    missing = core_ids() - got
    assert not missing, f"core SURVEY ids uncovered: {sorted(missing)}"


def test_coverfill_is_oracle_gated_and_prefers_fresh(registry):
    """Round-stable form of the r5 assertion: every fill pick is
    oracle-gated, and a pick is allowed to be already-checked ONLY
    when no fresh oracle-gated query could cover any id it was picked
    for (the proven-green fallback)."""
    checked = _checked()
    fill = coverfill(checked)
    assert fill, "pin set covers everything — fill should be non-empty today"
    pinned_cover: set[str] = set()
    for name in _PINNED:
        pinned_cover.update(registry[name].survey.split())
    need = core_ids() - pinned_cover
    fresh_coverable = {
        i for i in need
        for n, q in registry.items()
        if q.oracle is not None and n not in checked
        and i in q.survey.split()
    }
    for name in fill:
        assert registry[name].oracle is not None, f"{name} is rows-only"
        if name in checked:
            ids = set(registry[name].survey.split()) & need
            assert not (ids & fresh_coverable), (
                f"checked pick {name} used while fresh coverers exist for "
                f"{sorted(ids & fresh_coverable)}"
            )
    # determinism: same history -> same picks
    assert coverfill(checked) == fill


def test_cover_survives_simulated_future_rounds(registry):
    """The r5 ADVICE regression: the static fill broke the 70-id cover
    by round 7 once its queries were checked. Simulate 12 rounds of
    the driver (window -> history -> recompute) and assert every
    round's window still covers all 70 core ids."""
    checked = set(_checked())
    recorded: set[str] = set()
    for rnd in range(6, 18):
        spot = spotlight(extra_recorded=frozenset(recorded))
        window = ordered_names(frozenset(checked), rnd, spot)[:WINDOW]
        recorded.update(window)
        got: set[str] = set()
        for name in window:
            got.update(registry[name].survey.split())
        missing = core_ids() - got
        assert not missing, f"round {rnd} window uncovered: {sorted(missing)}"
        checked.update(window)


def test_window_has_first_ever_names(registry):
    """Every non-pinned window slot buys a first-time hash row for
    the CURRENT gate: >= min(25, remaining-fresh) effectively-fresh
    names per round (never checked, or checked only before their
    oracle existed — ADVICE r6 #4), minus spotlight entries whose
    gate changed this round (they carry an old green row for retired
    semantics but still must face the driver — the
    semantic_dedup_clusters case) and minus PROMOTED coverfill picks:
    once every oracle-gated coverer of a core id has been driver
    checked, coverfill's documented proven-green fallback keeps the
    70-id cover through an already-checked name, and that guaranteed
    slot is by design no longer fresh (first fired after
    CORRECTNESS_r09 landed: S1/S2/S3/S6 fall back to
    etl_bronze_crm_cust_info)."""
    checked = _checked()
    remaining_fresh = [n for n in registry if n not in checked]
    window = list(registry)[:WINDOW]
    fresh = [n for n in window if n not in checked]
    regated = [n for n in window if n in spotlight() and n in checked]
    promoted = [n for n in coverfill(_checked())
                if n in checked and n not in spotlight()]
    quota = min(25 - len(regated) - len(promoted), len(remaining_fresh))
    assert len(fresh) >= quota, f"only {len(fresh)} fresh names in window"
    # the window itself still covers every core id
    got: set[str] = set()
    for name in window:
        got.update(registry[name].survey.split())
    assert not core_ids() - got


def test_spotlight_and_coverfill_inside_window(registry):
    """Spotlight outranks the checked test outright (a regated name
    with an old green row still debuts its NEW gate), so every
    EFFECTIVE spotlight name must sit inside the window."""
    checked = _checked()
    window = set(list(registry)[:WINDOW])
    expected = coverfill(checked) | spotlight()
    missing = expected - window
    assert not missing, f"debuts outside the driver window: {sorted(missing)}"


def test_spotlight_survives_post_close_history_landing(registry):
    """VERDICT r7 ask #3 regression test: at the r07 close, the
    driver's freshly committed CORRECTNESS file advanced the round
    while the hand-frozen spotlight still held the now-checked names,
    oversubscribing the 50-slot window by one. With automated aging
    the scenario must be a no-op: simulate the round's own driver
    file landing (every window name recorded, round number advanced)
    and assert the window invariants still hold."""
    checked = _checked()
    spot_now = spotlight()
    window_now = list(registry)[:WINDOW]
    # ... the driver records exactly this window in CORRECTNESS_r{N}:
    landed = frozenset(window_now)
    new_checked = frozenset(checked | landed)
    new_spot = spotlight(extra_recorded=landed)
    # every spotlighted name the driver recorded has aged out
    assert not (new_spot & landed)
    # the next-round window is not oversubscribed and still covers
    names = ordered_names(new_checked, _SPOTLIGHT_AS_OF + 2, new_spot)
    window = names[:WINDOW]
    expected = _PINNED | coverfill(new_checked, new_spot) | new_spot
    assert len(expected) <= WINDOW
    assert expected <= set(window)
    got: set[str] = set()
    for name in window:
        got.update(registry[name].survey.split())
    assert not core_ids() - got


def test_failed_rows_do_not_age_spotlight(tmp_path):
    """ADVICE r8 #3 regression: a post-freeze row with ``err`` set
    (driver crash, no_oracle) must NOT age a name out of the
    spotlight — it never got the hash row the slot exists to buy —
    while a clean row (err == null) must."""
    from sql_data_warehouse_spark.analytics.registry import (
        _recorded_after_freeze,
    )

    rnd = _SPOTLIGHT_AS_OF + 1
    (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(json.dumps({
        "crashed_debut": {"rows_match": False, "err": "driver crash"},
        "clean_debut": {"rows_match": True, "schema_match": True,
                        "hash_match": True, "err": None},
        "no_oracle_debut": {"rows_match": True, "err": "no_oracle"},
        "malformed_debut": "driver wrote a bare string",
    }))
    aged = _recorded_after_freeze(root=tmp_path)
    assert "clean_debut" in aged
    assert "crashed_debut" not in aged
    assert "no_oracle_debut" not in aged
    # a non-dict record is as unparseable as a crash — keeps its slot
    assert "malformed_debut" not in aged


def test_rows_only_fresh_sorts_after_oracle_gated_fresh(registry):
    checked = _checked()
    fill = coverfill(checked)
    names = list(registry)
    pos = {n: i for i, n in enumerate(names)}
    skip = _PINNED | spotlight() | fill
    fresh_oracle = [n for n, q in registry.items()
                    if n not in checked and q.oracle is not None
                    and n not in skip]
    fresh_rows_only = [n for n, q in registry.items()
                       if n not in checked and q.oracle is None
                       and n not in skip]
    if fresh_oracle and fresh_rows_only:
        assert max(pos[n] for n in fresh_oracle) < min(
            pos[n] for n in fresh_rows_only)
