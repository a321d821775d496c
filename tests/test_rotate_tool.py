"""Pure-logic tests for the PRIORITY rotation helper (no Spark)."""

from __future__ import annotations

from tools.rotate_priority import suggest


def test_rotation_rule_red_then_stale_then_green():
    names = ["a", "b", "c", "d", "e"]
    hist = {
        "a": {1: True, 3: True},    # green, fresh (r3)
        "b": {1: True},             # green but stale (r1)
        "c": {3: False},            # red last row -> first
        # d: never checked -> before any green
        "e": {2: True},             # green, mid (r2)
    }
    pri, table = suggest(names, hist, window=3)
    assert set(pri) == {"c", "d", "b"}
    assert pri == sorted(pri, key=names.index)  # registry order kept
    ranked = [n for n, _ in table]
    assert ranked[0] == "c" and ranked[1] == "d"
    assert ranked[-1] == "a"  # freshest green rotates out last


def test_rotation_matches_current_priority_shape():
    """Against the real r1-r3 history the tool must put the round-4
    front-load (fixed pair + ledger trio) at the head of the ranking."""
    import glob

    from tools.rotate_priority import load_history
    from zcode_iceberg_spark.suite import WINDOW, registry

    hist = load_history(sorted(glob.glob("CORRECTNESS_r0[123].json")))
    if not hist:  # fresh clone without driver artifacts
        return
    names = list(registry())
    pri, _ = suggest(names, hist, WINDOW)
    assert len(pri) == WINDOW == len(set(pri))
    for must in ("pii_scan", "doc_repetition", "position_ledger",
                 "ledger_daily_summary", "ledger_exit_stats"):
        assert must in pri
