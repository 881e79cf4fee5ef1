#!/usr/bin/env python3
"""Machine gate for bench regressions (SCALE.md: per-query MIN is the
round-over-round comparator — median still carries host noise on the
shared box; the min of N passes is the best available proxy for the
query's true cost).

Usage:
    python3 tools/check_bench.py OLD NEW [threshold]
    python3 tools/check_bench.py --coverage [SPREAD [SPARKENTRY]]

--coverage gates bench COMPLETENESS instead of regressions: exit 1
unless the spread artifact's query key set equals SparkEntry.queries'
registered names (parsed from the registration pattern in the source).
Exists because round 9 shipped 11 queries that were never benched at
sf0.1 — one of them timed out the driver's run and no one had seen it
coming. Run it against tools/bench_spread.json after every full bench;
a SPARK_GRAFT_BENCH_ONLY-restricted spread legitimately fails it.

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


import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def registry_keys(src_path):
    """Registered query names, parsed from the uniform registration
    pattern `"name" -> ((s, dir)` — the only place that shape occurs."""
    with open(src_path) as f:
        names = re.findall(r'^\s*"([a-z0-9_]+)" -> \(\(s, dir\)', f.read(),
                           re.MULTILINE)
    if not names:
        sys.exit(f"{src_path}: no registration pattern matches — "
                 "registry parse broken, refusing to pass vacuously")
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        sys.exit(f"{src_path}: duplicate registrations: {sorted(dupes)}")
    return set(names)


def coverage(argv):
    spread_path = argv[0] if argv else os.path.join(REPO, "tools",
                                                    "bench_spread.json")
    src_path = argv[1] if len(argv) > 1 else os.path.join(
        REPO, "src", "main", "scala", "graft", "SparkEntry.scala")
    benched, _ = load(spread_path)
    registered = registry_keys(src_path)
    missing = sorted(registered - set(benched))
    extra = sorted(set(benched) - registered)
    for q in missing:
        print(f"UNBENCHED   {q}")
    for q in extra:
        print(f"UNREGISTERED {q}")
    print(f"{len(set(benched) & registered)}/{len(registered)} registered "
          f"queries present in {spread_path}")
    if missing or extra:
        sys.exit(1)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--coverage":
        return coverage(sys.argv[2:])
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
