"""Mechanical graded-window rotation (round-9 verdict item 1).

The driver's correctness gate grades exactly the FIRST 50 entries of
``__spark_entry__.queries()``; evidence goes stale for anything that
sits past the cut. This tool derives the next window from the
CORRECTNESS_r*.json history instead of hand-ordering:

1. never-driver-graded queries first (registry order),
2. then ascending last-graded round (oldest evidence first),
   tie-broken by position in that round's grading file,
3. the tail = everything else, FRESHEST evidence first (the previous
   window rotates just past the cut, per the established convention).

Modes:
  python tools/next_window.py            # print the 50-name window
  python tools/next_window.py --full     # print the full registry ordering
  python tools/next_window.py --emit-dict
      # print a rebuilt queries() dict body (extracted from the
      # current source mapping) in the rotated order, ready to paste
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def history(files: list[str] | None = None) -> dict[str, tuple[int, int]]:
    """name -> (last_graded_round, position_in_that_round's_file).

    ``files`` pins the history to an explicit list (tests freeze the
    round-9 rotation to the r01–r08 files it was derived from, so the
    guard stays green after the driver writes new CORRECTNESS files)."""
    out: dict[str, tuple[int, int]] = {}
    if files is None:
        files = glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    # sort by PARSED round number, not caller/filesystem order — later
    # rounds must win the per-name overwrite below
    files = sorted(
        files,
        key=lambda f: int(re.search(r"r(\d+)", os.path.basename(f)).group(1)),
    )
    for f in files:
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        data = json.load(open(f))
        for pos, name in enumerate(data):
            out[name] = (rnd, pos)
    return out


def registry_order() -> list[str]:
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    return list(entry.queries())


def rotated(
    files: list[str] | None = None, registry: list[str] | None = None
) -> list[str]:
    hist = history(files)
    reg = registry if registry is not None else registry_order()
    reg_pos = {n: i for i, n in enumerate(reg)}
    never = [n for n in reg if n not in hist]
    graded = [n for n in reg if n in hist]
    stale_first = sorted(graded, key=lambda n: (hist[n][0], hist[n][1]))
    window = (never + stale_first)[:WINDOW]
    rest = [n for n in reg if n not in set(window)]
    fresh_first = sorted(
        rest,
        key=lambda n: (-hist[n][0] if n in hist else 0,
                       hist[n][1] if n in hist else reg_pos[n]),
    )
    return window + fresh_first


def emit_dict() -> str:
    """Rebuild the queries() dict body from the current source in the
    rotated order (entries keep their exact value expressions)."""
    src = open(os.path.join(REPO, "__spark_entry__.py")).read()
    entries = dict(
        re.findall(r'^        "([a-z0-9_]+)": (_q_[a-z0-9_]+),$', src, re.M)
    )
    order = rotated()
    missing = [n for n in order if n not in entries]
    if missing:
        raise SystemExit(f"no source entry line found for: {missing}")
    return "\n".join(f'        "{n}": {entries[n]},' for n in order)


def main() -> None:
    if "--emit-dict" in sys.argv:
        print(emit_dict())
        return
    names = rotated()
    hist = history()
    upto = len(names) if "--full" in sys.argv else WINDOW
    for i, n in enumerate(names[:upto]):
        last = hist.get(n)
        tag = f"r{last[0]}#{last[1]}" if last else "NEVER"
        marker = "| " if i < WINDOW else "  "
        print(f"{marker}{i:3d} {n:55s} {tag}")


if __name__ == "__main__":
    main()
