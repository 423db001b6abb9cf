"""Driver-contract bookkeeping gates for __spark_entry__.py.

The driver verifies only a window from the FRONT of queries(); the
rotation machinery (_VERIFIED_R* tiers, _HIGH/_LOW_PRIORITY) decides
which operators get a CORRECTNESS row each round. A typo'd name in
any tuple silently drops a query out of its intended slot, so these
tests pin the bookkeeping itself — no Spark session needed.
"""

from __future__ import annotations

import importlib.util
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

_spec = importlib.util.spec_from_file_location(
    "spark_entry", os.path.join(_REPO, "__spark_entry__.py")
)
entry = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(entry)

from dpu_olap_spark import registry  # noqa: E402


def _tiers() -> dict[str, tuple[str, ...]]:
    return {
        name: getattr(entry, name)
        for name in dir(entry)
        if name.startswith("_VERIFIED_R")
    }


def test_every_bookkeeping_name_is_registered():
    known = set(registry.all_queries())
    for tier_name, tier in _tiers().items():
        stale = [n for n in tier if n not in known]
        assert not stale, f"{tier_name} names not in registry: {stale}"
    for tup_name in ("_HIGH_PRIORITY", "_LOW_PRIORITY"):
        stale = [n for n in getattr(entry, tup_name) if n not in known]
        assert not stale, f"{tup_name} names not in registry: {stale}"


def test_tiers_are_disjoint():
    seen: dict[str, str] = {}
    dupes = []
    for tier_name, tier in _tiers().items():
        for n in tier:
            if n in seen:
                dupes.append((n, seen[n], tier_name))
            seen[n] = tier_name
    assert not dupes, f"names in multiple verified tiers: {dupes}"


def test_ordering_covers_registry_exactly_once():
    names = entry._ordered_names()
    assert len(names) == len(set(names)), "duplicate names in ordering"
    assert set(names) == set(registry.all_queries()), (
        "ordering and registry diverge"
    )


def test_unverified_lead_the_window():
    """Every name without a driver CORRECTNESS row must sort before
    every already-verified name (except deliberate _LOW_PRIORITY
    deferrals) — otherwise a new operator can silently miss its
    verification window."""
    names = entry._ordered_names()
    low = set(entry._LOW_PRIORITY)
    verified_positions = [
        i for i, n in enumerate(names) if n in entry._DRIVER_VERIFIED
    ]
    unverified_positions = [
        i
        for i, n in enumerate(names)
        if n not in entry._DRIVER_VERIFIED and n not in low
    ]
    if verified_positions and unverified_positions:
        assert max(unverified_positions) < min(verified_positions), (
            "an unverified query sorts behind verified ones"
        )


def test_oracle_names_match_queries():
    """Every oracle key must be a registered query (a dangling oracle
    is dead weight; a query missing its oracle is rows-only and must
    be deliberate — the known rows-only set)."""
    rows_only_by_design = {
        "approx_distinct",
        "approx_percentile",
        "mm_decode",
        "mm_resize",
        "mm_frame_sample",
        "hll_mergeable",
    }
    q = set(registry.all_queries())
    o = set(registry.oracle_map())
    assert o <= q, f"oracles without queries: {sorted(o - q)}"
    assert q - o == rows_only_by_design, (
        f"rows-only set changed: {sorted(q - o)}"
    )
