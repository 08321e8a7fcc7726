"""Registry composition invariants. The driver's correctness gate runs
REGISTRY in insertion order and truncates at 50 entries per round, so
ORDER is load-bearing (CLAUDE.md): never-driver-verified queries must
sit ahead of the long-stable tail or they never earn a driver row."""

from __future__ import annotations

from mimic2ts_spark import harness


def test_gate_priority_queries_lead_the_registry():
    names = list(harness.REGISTRY)
    prio = [n for n in harness._GATE_PRIORITY if n in harness.REGISTRY]
    # every priority name must exist (a typo here silently loses a slot)
    missing = [n for n in harness._GATE_PRIORITY if n not in harness.REGISTRY]
    assert not missing, f"_GATE_PRIORITY names not in REGISTRY: {missing}"
    assert names[: len(prio)] == prio
    # the gate cut: everything never-yet-verified must fit in the first 50
    assert len(prio) <= 50


def test_registry_entries_are_well_formed():
    assert len(harness.REGISTRY) == len(set(harness.REGISTRY)) >= 139
    for name, (fn, sql) in harness.REGISTRY.items():
        assert callable(fn), name
        assert sql is None or isinstance(sql, str), name
