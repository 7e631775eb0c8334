"""Driver-window rotation: computed from CORRECTNESS ledgers.

The external driver verifies the FIRST 50 entries of ``queries()``.
Round 5's window is a hand-pinned list (composed before this logic
existed); from round 6 on, ``_compute_priority`` derives the order
from the CORRECTNESS_r*.json ledgers so never-green and stalest
queries always lead without manual rotation (the round-4 judge's
top finding was a missed manual rotation).

No SparkSession needed — pure registry/ledger logic.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path

from pyconnect_spark import registry

REPO = Path(registry.__file__).resolve().parents[1]


def _green(name, oracles):
    return {
        "rows_match": True,
        "schema_match": True,
        "hash_match": name in oracles,
        "spark_rows": 5,
        "oracle_rows": 5,
        "err": None,
    }


def test_pinned_window_holds_while_newest_ledger_is_r04():
    """With only r01..r04 ledgers present, the hand-pinned round-5
    window is authoritative (its composition was vetted by hand)."""
    newest = max(r for r, _ in registry._ledger_rounds(REPO))
    order = list(registry.queries())
    if newest <= registry._PINNED_THROUGH_ROUND:
        assert order[:50] == registry._PRIORITY
    else:
        # a later round's ledger landed: computed order is in effect
        assert registry._compute_priority(registry._MERGED) is not None


def test_auto_rotation_after_r05(tmp_path):
    """Once a ledger newer than the pinned round lands: green queries
    rotate out, errored rows re-enter the window, never-checked lead."""
    for p in REPO.glob("CORRECTNESS_r0*.json"):
        shutil.copy(p, tmp_path / p.name)
    oracles = set(registry._MERGED.oracles())
    r5 = {n: _green(n, oracles) for n in registry._PRIORITY}
    r5["sm03_ann_lsh"]["hash_match"] = False
    r5["sm03_ann_lsh"]["err"] = "simulated driver error"
    (tmp_path / "CORRECTNESS_r05.json").write_text(json.dumps(r5))

    order = registry._compute_priority(registry._MERGED, root=tmp_path)
    assert order is not None and len(order) == len(registry._MERGED.queries())
    window = set(order[:50])
    # errored row is not evidence -> back in the window immediately
    assert "sm03_ann_lsh" in window
    # every r5-green query rotated out of the window
    assert not (window & (set(registry._PRIORITY) - {"sm03_ann_lsh"}))
    # rows-only-by-design queries count rows_match as evidence
    assert "tx27_compression_quality" not in window
    # the never-GREEN tier (never checked, or only errored rows — i.e.
    # sm03 here) leads the computed order as one block
    green_ever = set()
    for rnd, rows in registry._ledger_rounds(tmp_path):
        for n, row in rows.items():
            if not row.get("err") and (
                row.get("hash_match")
                or (row.get("rows_match") and n not in oracles)
            ):
                green_ever.add(n)
    never_green = [n for n in order if n not in green_ever]
    assert order[: len(never_green)] == never_green


def test_regression_reenters_window_immediately(tmp_path):
    """A query green in round N-1 whose NEWEST row is a real failure
    (hash mismatch or driver error) must reset to the never-green
    leading block — not coast on the stale green evidence and wait
    ~4 rounds for rotation to bring it back (ADVICE r05 finding)."""
    oracles = set(registry._MERGED.oracles())
    all_names = list(registry._MERGED.queries())
    # r05: everything green (so nothing else interferes with ordering)
    r5 = {n: _green(n, oracles) for n in all_names}
    (tmp_path / "CORRECTNESS_r05.json").write_text(json.dumps(r5))
    # r06: one regression — hash now mismatches; one driver error
    r6 = {n: _green(n, oracles) for n in all_names}
    r6["x43_recursive_hierarchy"]["hash_match"] = False
    r6["x45_value_histogram"]["hash_match"] = False
    r6["x45_value_histogram"]["err"] = "simulated timeout"
    (tmp_path / "CORRECTNESS_r06.json").write_text(json.dumps(r6))

    order = registry._compute_priority(registry._MERGED, root=tmp_path)
    window = set(order[:50])
    assert "x43_recursive_hierarchy" in window
    assert "x45_value_histogram" in window
    # the designed rows-only class (err == "no_oracle") is NOT a failure
    r6b = dict(r6)
    r6b["x49_hll_mergeable_rollup"] = {
        "rows_match": None, "schema_match": None, "hash_match": None,
        "spark_rows": 5, "oracle_rows": None, "err": "no_oracle",
    }
    (tmp_path / "CORRECTNESS_r06.json").write_text(json.dumps(r6b))
    order2 = registry._compute_priority(registry._MERGED, root=tmp_path)
    # still leads (no_oracle rows never accrue hash evidence) but the
    # two real regressions must ALSO both be in the window
    assert {"x43_recursive_hierarchy", "x45_value_histogram"} <= set(order2[:50])
    # and a later green clears an earlier failure: x43 green again in r07
    r7 = {"x43_recursive_hierarchy": _green("x43_recursive_hierarchy", oracles)}
    (tmp_path / "CORRECTNESS_r07.json").write_text(json.dumps(r7))
    order3 = registry._compute_priority(registry._MERGED, root=tmp_path)
    assert "x43_recursive_hierarchy" not in set(order3[:50])


def test_corrupt_ledger_never_breaks_import(tmp_path):
    (tmp_path / "CORRECTNESS_r99.json").write_text("{not json")
    (tmp_path / "CORRECTNESS_r98.json").write_text(json.dumps(["a", "list"]))
    assert list(registry._ledger_rounds(tmp_path)) == []
    # no usable ledger -> newest stays 0 -> pinned list in force
    assert registry._compute_priority(registry._MERGED, root=tmp_path) is None


def test_full_surface_is_always_declared():
    qs = registry.queries()
    assert len(qs) == len(registry._MERGED.queries())
    assert set(qs) == set(registry._MERGED.queries())


def test_new_declarations_never_displace_older_unledgered_wave():
    """Two never-green queries tie on evidence; the one declared in an
    OLDER round must verify first — this round's additions queue behind
    the previous round's still-unledgered wave, not ahead of it."""
    order = registry._compute_priority(registry._MERGED)
    if order is None:  # pinned window still in force — nothing to check
        return
    pos = {n: i for i, n in enumerate(order)}
    # Real-ledger invariant: every pre-round-6 never-green query sits
    # ahead of every round-6 declaration that is also never-green.
    oracles = set(registry._MERGED.oracles())
    green_ever = set()
    for _rnd, rows in registry._ledger_rounds(
        Path(registry.__file__).resolve().parents[1]
    ):
        for n, row in rows.items():
            if not isinstance(row, dict):
                continue
            if not row.get("err") and (
                row.get("hash_match")
                or (row.get("rows_match") and n not in oracles)
            ):
                green_ever.add(n)
            # declared rows-only class: a clean driver execution counts
            # (mirrors _compute_priority's no_oracle clause)
            elif (
                n not in oracles
                and row.get("err") == "no_oracle"
                and (row.get("spark_rows") or 0) > 0
            ):
                green_ever.add(n)
    old_wave = [
        n for n in order
        if n not in green_ever and n not in registry._DECLARED_IN_ROUND
    ]
    new_wave = [
        n for n in order
        if n not in green_ever and n in registry._DECLARED_IN_ROUND
    ]
    if old_wave and new_wave:
        assert max(pos[n] for n in old_wave) < min(pos[n] for n in new_wave)
