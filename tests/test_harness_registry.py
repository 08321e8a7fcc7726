"""Registry composition invariants. The driver's correctness gate runs
REGISTRY in insertion order and truncates at 50 entries per round, so
ORDER is load-bearing (CLAUDE.md): the r06 rule is changed-this-round
first, then STALEST-FIRST (ascending most-recent driver CORRECTNESS
row, computed from the committed CORRECTNESS_r*.json artifacts), so
every query re-earns a driver row at worst every ceil(n/50) rounds."""

from __future__ import annotations

from mimic2ts_spark import harness


def test_changed_this_round_queries_lead_everything():
    """Queries whose backing code changed this round run FIRST (the
    50-entry gate cut must never leave an in-round change driver-stale,
    as r04 did for q_kmeans/q_dedup_semantic/q_graph_triangles)."""
    names = list(harness.REGISTRY)
    missing = [
        n for n in harness._GATE_CHANGED_THIS_ROUND if n not in harness.REGISTRY
    ]
    assert not missing, f"_GATE_CHANGED_THIS_ROUND names not in REGISTRY: {missing}"
    changed = [n for n in harness._GATE_CHANGED_THIS_ROUND if n in harness.REGISTRY]
    assert names[: len(changed)] == changed
    assert len(changed) <= 50


def test_tail_is_stalest_first():
    """Beyond the changed set, the registry runs ascending by the round
    of each query's most recent driver CORRECTNESS row (never-verified
    = -1 sorts first). This is the r05 verdict's rotation rule: with a
    static tail the §2 core would stay r02-stale forever."""
    names = list(harness.REGISTRY)
    hist = harness._driver_verified_round()
    changed = set(harness._GATE_CHANGED_THIS_ROUND)
    tail_rounds = [hist.get(n, -1) for n in names if n not in changed]
    assert tail_rounds == sorted(tail_rounds)
    # the history artifacts exist in this repo, so the rule has teeth:
    # at least two distinct staleness classes must be present
    assert len(set(tail_rounds)) >= 2


def test_gate_window_covers_the_stalest_queries():
    """The 50-entry driver window must contain every query tied for
    stalest (after the changed set) — the whole point of the rotation."""
    names = list(harness.REGISTRY)
    hist = harness._driver_verified_round()
    changed = set(harness._GATE_CHANGED_THIS_ROUND)
    tail = [n for n in names if n not in changed]
    if not tail:
        return
    stalest = min(hist.get(n, -1) for n in tail)
    tied = [n for n in tail if hist.get(n, -1) == stalest]
    window = set(names[:50])
    expected_in_window = tied[: 50 - len(changed & set(names[:50]))]
    assert all(n in window for n in expected_in_window)


def test_registry_entries_are_well_formed():
    assert len(harness.REGISTRY) == len(set(harness.REGISTRY)) >= 139
    for name, (fn, sql) in harness.REGISTRY.items():
        assert callable(fn), name
        assert sql is None or isinstance(sql, str), name
