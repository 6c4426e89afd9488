"""Sweep-to-sweep per-entry cost regression gate (VERDICT r7 item 3).

Diffs two SWEEP_r{N}.json artifacts' per-entry ``spark_sec`` and flags
movers: entries whose cost changed by more than THRESHOLD in either
direction and whose slower side is at least MIN_SEC (sub-half-second
entries are dominated by fixed per-action cost and flap with ambient
load). Each flagged mover must be explained or fixed in PLANS.md before
the round closes.

Usage: python scripts/sweep_diff.py SWEEP_r07.json SWEEP_r08.json
Prints a markdown table plus new/removed entries; exit code 0 always
(the gate is editorial — the numbers feed PLANS.md, the calib/loadavg
stamps in the artifacts say whether a comparison is even meaningful).
"""

from __future__ import annotations

import json
import sys

THRESHOLD = 1.5
MIN_SEC = 0.5


def main() -> None:
    old_path, new_path = sys.argv[1], sys.argv[2]
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    oe, ne = old["entries"], new["entries"]
    print(
        f"old: calib {old.get('calib_sec')}s loadavg {old.get('loadavg_start')} | "
        f"new: calib {new.get('calib_sec')}s loadavg {new.get('loadavg_start')}"
    )
    movers = []
    for name in sorted(set(oe) & set(ne)):
        a, b = oe[name]["spark_sec"], ne[name]["spark_sec"]
        if max(a, b) < MIN_SEC or a <= 0:
            continue
        ratio = b / a
        if ratio > THRESHOLD or ratio < 1 / THRESHOLD:
            movers.append((name, a, b, ratio))
    movers.sort(key=lambda m: -m[3])
    print(f"\n{len(movers)} movers (> {THRESHOLD}x either way, slower side >= {MIN_SEC}s):")
    print("| entry | old s | new s | ratio |")
    print("|---|---|---|---|")
    for name, a, b, r in movers:
        print(f"| {name} | {a} | {b} | {r:.2f}x |")
    born = sorted(set(ne) - set(oe))
    gone = sorted(set(oe) - set(ne))
    if born:
        print(f"\nnew entries: {', '.join(born)}")
    if gone:
        print(f"removed entries: {', '.join(gone)}")
    tot_o = sum(e["spark_sec"] for e in oe.values())
    tot_n = sum(e["spark_sec"] for e in ne.values())
    print(f"\ntotal spark_sec: {tot_o:.1f} -> {tot_n:.1f}")


if __name__ == "__main__":
    main()
