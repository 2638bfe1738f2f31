"""Invariants of the driver-window ordering (registry.py).

The driver checks the first ~50 registry entries per round, so the
insertion order IS the hard-signal budget. These tests pin the three
properties VERDICT r4 asked for:

1. the pinned set-cover is minimal (25 queries) and, together with
   the deterministic coverage-fill, covers every core SURVEY §2 id;
2. at least 25 of the 50 window slots go to never-driver-checked
   queries (rotation throughput);
3. no rows-only (oracle=None) fresh query outranks an oracle-gated
   fresh query in the rotation.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from sql_data_warehouse_spark.analytics.registry import (
    _COVERFILL,
    _PINNED,
    _SPOTLIGHT,
    all_queries,
)

ROOT = Path(__file__).resolve().parents[1]

WINDOW = 50  # driver truncation (CORRECTNESS_r01..r04 each hold 50 rows)


def _core_ids() -> set[str]:
    ids: set[str] = set()
    for pref, n in [("S", 9), ("P", 9), ("J", 6), ("A", 9), ("W", 9),
                    ("O", 3), ("U", 1), ("V", 3), ("T", 6)]:
        ids.update(f"{pref}{i}" for i in range(1, n + 1))
    ids.update(f"Q{i:02d}" for i in range(1, 14))
    ids.update({"QC1", "QC2"})
    assert len(ids) == 70
    return ids


def _checked() -> set[str]:
    names: set[str] = set()
    for p in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        names.update(json.loads(p.read_text()).keys())
    return names


@pytest.fixture(scope="module")
def registry():
    return all_queries()


def test_pinned_is_minimal_25(registry):
    assert len(_PINNED) == 25
    assert _PINNED <= set(registry)
    # every pinned query is proven: it has had a green driver row
    assert _PINNED <= _checked()


def test_pinned_plus_coverfill_covers_all_core_ids(registry):
    got: set[str] = set()
    for name in _PINNED | _COVERFILL:
        got.update(registry[name].survey.split())
    missing = _core_ids() - got
    assert not missing, f"core SURVEY ids uncovered: {sorted(missing)}"


def test_coverfill_is_fresh_and_oracle_gated(registry):
    checked = _checked()
    for name in _COVERFILL:
        assert name not in checked, f"{name} already has a driver row"
        assert registry[name].oracle is not None


def test_window_has_25_first_ever_names(registry):
    checked = _checked()
    window = list(registry)[:WINDOW]
    fresh = [n for n in window if n not in checked]
    assert len(fresh) >= 25, f"only {len(fresh)} fresh names in window"
    # the window itself still covers every core id
    got: set[str] = set()
    for name in window:
        got.update(registry[name].survey.split())
    assert not _core_ids() - got


def test_spotlight_and_coverfill_inside_window(registry):
    checked = _checked()
    window = set(list(registry)[:WINDOW])
    expected = {n for n in (_SPOTLIGHT | _COVERFILL)
                if n in registry and n not in checked}
    missing = expected - window
    assert not missing, f"debuts outside the driver window: {sorted(missing)}"


def test_rows_only_fresh_sorts_after_oracle_gated_fresh(registry):
    checked = _checked()
    names = list(registry)
    pos = {n: i for i, n in enumerate(names)}
    fresh_oracle = [n for n, q in registry.items()
                    if n not in checked and q.oracle is not None
                    and n not in _PINNED | _SPOTLIGHT | _COVERFILL]
    fresh_rows_only = [n for n, q in registry.items()
                       if n not in checked and q.oracle is None
                       and n not in _PINNED | _SPOTLIGHT | _COVERFILL]
    if fresh_oracle and fresh_rows_only:
        assert max(pos[n] for n in fresh_oracle) < min(
            pos[n] for n in fresh_rows_only)
