"""The suite-stamp partition (tools/suite_stamps.py) covers the tree.

If a new test directory or fem file lands outside the partition, no
group would ever run it and the green-stamp artifact would silently
overstate coverage — this guard fails instead.
"""
from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO / "tools"))


def test_partition_is_disjoint_and_covers_everything():
    import suite_stamps

    all_files = {str(p.relative_to(REPO))
                 for p in (REPO / "tests").rglob("test_*.py")}
    covered = suite_stamps.covered_files()
    assert covered == all_files, (
        f"uncovered: {sorted(all_files - covered)}; "
        f"phantom: {sorted(covered - all_files)}")

    # disjoint: no file claimed by two groups
    seen: dict[str, str] = {}
    for name, paths in suite_stamps.GROUPS.items():
        for p in paths:
            fp = REPO / p
            files = ([str(f.relative_to(REPO))
                      for f in fp.rglob("test_*.py")]
                     if fp.is_dir() else [p])
            for f in files:
                assert f not in seen, f"{f} in {seen[f]} AND {name}"
                seen[f] = name
