"""Registry rotation: never-checked first, then †→oracle conversions,
then changed-since-last-round, then least-checked (COVERAGE.md
'Registry rotation')."""

from metadata_enhanced_pretrain_datapipeline_spark import queries as q


def test_rotation_tiers(monkeypatch):
    reg = list(q._REGISTRY)
    never = [n for n in reg if n == "q_hf_snapshot_roundtrip"]  # r4, no rows yet
    assert never, "expected a never-checked name in the registry"

    def fake_counts():
        counts = {n: 1 for n in reg if n not in never}
        counts["q_scan_parquet"] = 3                          # checked often
        # q_pack_sequences: prior rows exist but none hash-checked AND it
        # now has an oracle -> conversion tier
        hash_checked = {n for n in counts if n != "q_pack_sequences"}
        return counts, hash_checked

    monkeypatch.setattr(q, "_checked_counts", fake_counts)
    # pin the changed set so the test doesn't depend on git state
    monkeypatch.setattr(q, "_changed_queries", lambda: {"q_join_inner"})
    monkeypatch.setattr(q, "_ROTATION", None)
    try:
        rot = q._rotated()
        # tier 0: never-checked lead
        assert rot[0] == "q_hf_snapshot_roundtrip"
        # tier 1: the conversion comes before every normally-checked name
        assert rot.index("q_pack_sequences") < rot.index("q_flagship")
        # tier 2: the changed query precedes unchanged equally-seen names
        assert rot.index("q_join_inner") < rot.index("q_flagship")
        assert rot.index("q_pack_sequences") < rot.index("q_join_inner")
        # most-checked sinks to the back half
        assert rot.index("q_scan_parquet") > len(rot) // 2
        assert sorted(rot) == sorted(reg)                     # a permutation
    finally:
        monkeypatch.setattr(q, "_ROTATION", None)


def test_changed_queries_flags_touched_function(monkeypatch):
    """_changed_queries must flag a query whose own function source (or a
    module it references) differs from the last-artifact-commit baseline —
    and must NOT flag the whole registry just because queries.py changed.

    This runs against the real git state: it asserts only the degenerate
    failure modes (all-flagged / crash), which hold in any round."""
    changed = q._changed_queries()
    assert isinstance(changed, set)
    reg = set(q._REGISTRY)
    assert changed <= reg
    # function-level granularity: a queries.py edit must never flag the
    # ENTIRE registry (that would re-create whole-file churn semantics)
    assert len(changed) < len(reg)


def test_queries_and_oracles_share_ordering():
    names_q = list(q.all_queries())
    names_o = list(q.all_oracles())
    # oracles must be a subsequence of the query ordering (same rotation)
    it = iter(names_q)
    assert all(n in it for n in names_o)
