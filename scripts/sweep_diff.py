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


def _calib_factor(old: dict, new: dict) -> float:
    """Host-speed normalization (VERDICT r8 item 3): per-entry comparisons
    divide the new reading by new_calib/old_calib before flagging, so a
    wholesale ambient-load delta (every entry moving together with the
    probe) does not read as per-entry regressions/optimizations. Prefers
    the warm-JVM probe (both artifacts r9+), falls back to the cold one;
    clamped to [0.5, 2.0] so a wild probe cannot overcorrect a real mover
    into silence.

    When BOTH warm probes sit inside the idle band, normalization is
    skipped (factor 1.0): two in-band readings differ only by probe noise
    (0.26 vs 0.37s is a 1.4x "factor" on an idle box, r11), and dividing
    by their ratio manufactures uniform pseudo-movers instead of removing
    ambient load — the correction is only meaningful when a stamp shows
    the host actually was loaded."""
    band = max(
        old.get("calib_band_sec") or 0.45, new.get("calib_band_sec") or 0.45
    )
    wa, wb = old.get("calib_warm_sec"), new.get("calib_warm_sec")
    if wa and wb and wa <= band and wb <= band:
        return 1.0
    for key in ("calib_warm_sec", "calib_sec"):
        a, b = old.get(key), new.get(key)
        if a and b and a > 0 and b > 0:
            return min(2.0, max(0.5, b / a))
    return 1.0


def main() -> None:
    old_path, new_path = sys.argv[1], sys.argv[2]
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    oe, ne = old["entries"], new["entries"]
    cf = _calib_factor(old, new)
    print(
        f"old: calib {old.get('calib_sec')}s warm {old.get('calib_warm_sec')} "
        f"loadavg {old.get('loadavg_start')} | "
        f"new: calib {new.get('calib_sec')}s warm {new.get('calib_warm_sec')} "
        f"loadavg {new.get('loadavg_start')} | calib factor {cf:.2f} "
        f"(per-entry ratios are normalized by it)"
    )
    for side, art in (("old", old), ("new", new)):
        if art.get("contaminated"):
            print(f"WARNING: {side} artifact is stamped contaminated — read movers accordingly")
    if old.get("timing_tier") != new.get("timing_tier"):
        print(
            f"NOTE: timing tiers differ (old={old.get('timing_tier')!r}, "
            f"new={new.get('timing_tier')!r}) — r1-r9 timed the cold first "
            "run, r10+ times the warm second run; cross-tier ratios mostly "
            "show cold-JIT disappearing, not code changes"
        )
    movers = []
    for name in sorted(set(oe) & set(ne)):
        a, b = oe[name]["spark_sec"], ne[name]["spark_sec"]
        if max(a, b) < MIN_SEC or a <= 0:
            continue
        ratio = (b / cf) / a
        if ratio > THRESHOLD or ratio < 1 / THRESHOLD:
            movers.append((name, a, b, b / a, ratio))
    movers.sort(key=lambda m: -m[4])
    print(f"\n{len(movers)} movers (> {THRESHOLD}x either way after calib "
          f"normalization, slower side >= {MIN_SEC}s):")
    print("| entry | old s | new s | raw | normalized |")
    print("|---|---|---|---|---|")
    for name, a, b, raw, r in movers:
        print(f"| {name} | {a} | {b} | {raw:.2f}x | {r:.2f}x |")
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
