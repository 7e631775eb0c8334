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
