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
    # the gate cut: changed + re-check sets must fit in the first 50
    assert len(prio) <= 50


def test_changed_this_round_queries_lead_everything():
    """The r05 ordering rule: queries whose backing code changed since
    their last driver CORRECTNESS row run FIRST (the 50-entry gate cut
    must never leave an in-round change driver-stale, as r04 did for
    q_kmeans/q_dedup_semantic/q_graph_triangles)."""
    names = list(harness.REGISTRY)
    changed = [n for n in harness._GATE_CHANGED_THIS_ROUND if n in harness.REGISTRY]
    assert names[: len(changed)] == changed
    assert harness._GATE_PRIORITY[: len(harness._GATE_CHANGED_THIS_ROUND)] == (
        harness._GATE_CHANGED_THIS_ROUND
    )
    assert len(changed) <= 50


def test_registry_entries_are_well_formed():
    assert len(harness.REGISTRY) == len(set(harness.REGISTRY)) >= 139
    for name, (fn, sql) in harness.REGISTRY.items():
        assert callable(fn), name
        assert sql is None or isinstance(sql, str), name
