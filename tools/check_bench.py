#!/usr/bin/env python3
"""Machine gate for bench regressions (SCALE.md: per-query MIN is the
round-over-round comparator — median still carries host noise on the
shared box; the min of N passes is the best available proxy for the
query's true cost).

Usage:
    python3 tools/check_bench.py OLD NEW [threshold]

OLD / NEW each accept either artifact shape:
  - tools/bench_spread.json   (Bench's side file: {"queries", "spread"})
  - BENCH_rNN.json            (harness artifact: {"parsed": {"queries"}})
For a spread file the per-query min is compared; for a harness artifact
(no spread) the median in "queries" is the fallback comparator — noisier,
so expect false positives when mixing shapes.

Exit 1 (gate fails) if any shared query regressed by more than
`threshold` (default 1.5x). New and removed queries are listed but do
not fail the gate.
"""
import json
import sys


def load(path):
    """-> ({query: (seconds, kind)}, sf) with kind 'min' or 'med'."""
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:  # harness artifact
        d = d["parsed"]
        if d is None:
            sys.exit(f"{path}: parsed is null (truncated artifact) — "
                     "use that round's tools/bench_spread.json instead")
    sf = d.get("sf")
    spread = d.get("spread")
    if spread:
        return {q: (v["min"], "min") for q, v in spread.items()}, sf
    return {q: (v, "med") for q, v in d["queries"].items() if v >= 0}, sf


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old_path, new_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    (old, old_sf), (new, new_sf) = load(old_path), load(new_path)
    if old_sf and new_sf and old_sf != new_sf:
        sys.exit(f"sf mismatch: {old_path} ran at {old_sf}, {new_path} at "
                 f"{new_sf} — timings across scale factors cannot gate")

    shared = sorted(set(old) & set(new))
    regressed = []
    for q in shared:
        (o, okind), (n, nkind) = old[q], new[q]
        if o > 0 and n / o > threshold:
            regressed.append((q, o, okind, n, nkind, n / o))

    for q in sorted(set(new) - set(old)):
        print(f"NEW      {q}: {new[q][0]:.3f}s")
    for q in sorted(set(old) - set(new)):
        print(f"REMOVED  {q} (was {old[q][0]:.3f}s)")
    for q, o, okind, n, nkind, r in sorted(regressed, key=lambda x: -x[5]):
        print(f"REGRESSED {q}: {o:.3f}s ({okind}) -> {n:.3f}s ({nkind})  {r:.2f}x")

    ok = len(shared) - len(regressed)
    print(f"{ok}/{len(shared)} shared queries within {threshold}x")
    if regressed:
        sys.exit(1)


if __name__ == "__main__":
    main()
