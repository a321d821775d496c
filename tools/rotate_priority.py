"""Suggest the next round's PRIORITY window from CORRECTNESS history.

The external driver hash-checks only the first ``WINDOW`` registry
entries, so the window must rotate to keep every query's driver row
fresh (SCALE.md "Verification-window rotation"). This tool encodes the
rotation rule so future rounds don't re-derive it by hand:

1. queries whose last driver row is red/err (must re-verify) first;
2. then queries by staleness — oldest (or no) driver-green row first;
3. ties broken by registry order (stable).

It prints a ready-to-paste PRIORITY list plus a freshness table.
Pure stdlib + registry import; run from the repo root:

    python tools/rotate_priority.py [CORRECTNESS_r*.json ...]
"""

from __future__ import annotations

import glob
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def load_history(paths: list[str]) -> dict[str, dict[int, bool]]:
    """name -> {round: green?} from CORRECTNESS_r{N}.json files."""
    hist: dict[str, dict[int, bool]] = {}
    for p in paths:
        m = re.search(r"_r(\d+)\.json$", p)
        if not m:
            continue
        rnd = int(m.group(1))
        data = json.loads(Path(p).read_text())
        for name, row in data.items():
            green = bool(isinstance(row, dict) and row.get("hash_match"))
            hist.setdefault(name, {})[rnd] = green
    return hist


def suggest(
    names: list[str], hist: dict[str, dict[int, bool]], window: int
) -> tuple[list[str], list[tuple[str, str]]]:
    def freshness(name: str) -> tuple[int, int, str]:
        """Sort key: (0=red-last-row, 1=never-checked, 2=green) then
        last-green round ascending (stalest first)."""
        h = hist.get(name, {})
        if not h:
            return (1, 0, "never driver-checked")
        last_round = max(h)
        greens = [r for r, g in h.items() if g]
        if not h[last_round]:
            return (0, max(greens, default=-1), f"non-green in r{last_round}")
        return (2, max(greens), f"green r{max(greens)}")

    ranked = sorted(
        range(len(names)), key=lambda i: (*freshness(names[i])[:2], i)
    )
    chosen = sorted(ranked[:window])  # registry order within the window
    table = [(names[i], freshness(names[i])[2]) for i in ranked]
    return [names[i] for i in chosen], table


def main() -> None:
    from zcode_iceberg_spark.suite import WINDOW, registry

    paths = sys.argv[1:] or sorted(glob.glob("CORRECTNESS_r*.json"))
    hist = load_history(paths)
    names = list(registry())
    priority, table = suggest(names, hist, WINDOW)
    print(f"# suggested PRIORITY ({len(priority)} of {len(names)}; "
          f"history: {', '.join(Path(p).name for p in paths)})")
    for name in priority:
        print(f'    "{name}",')
    print("\n# freshness (rotation order)")
    for name, why in table:
        mark = "->" if name in priority else "  "
        print(f" {mark} {name:32s} {why}")


if __name__ == "__main__":
    main()
