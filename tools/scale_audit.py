#!/usr/bin/env python3
"""Full-spread scale audit: join a 1x and a 10x bench spread (per-query
MINS — the noise-robust comparator, SCALE.md "noise vs regression") and
rank queries by their 10x/1x min ratio. The LLM-pipeline tables
(documents/embeddings/events) are scaled by tools/scale_gen.py; the
TPC-H-ish tables are dimension-sized and copied verbatim, so queries
that touch only those legitimately sit near 1x and are listed but not
interesting. Queries whose plans are super-linear by construction
(pair-quadratic candidate generation, CC iterations) are the ones this
audit exists to catch when they exceed their documented shape.

Usage:
    python3 tools/scale_audit.py tools/full_spread_1x.json tools/full_spread_10x.json [top_n]

Output: a markdown table of the top_n worst ratios (default 20) plus
summary stats, ready to paste into SCALE.md; exit 1 if either run had
failures (a timed-out query at 10x IS a scale finding, not a skip).
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    spread = d.get("spread") or {}
    return ({q: v["min"] for q, v in spread.items()},
            {q: v.get("tag", "?") for q, v in spread.items()},
            d.get("failures", []), d)


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    p1, p10 = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    (m1, tags, f1, d1), (m10, _, f10, d10) = load(p1), load(p10)
    shared = sorted(set(m1) & set(m10))
    if not shared or sum(m1[q] for q in shared) <= 0:
        sys.exit(f"no comparable queries between {p1} and {p10} "
                 "(disjoint registries or empty spreads) — nothing to rank")
    rows = []
    for q in shared:
        if m1[q] > 0:
            rows.append((q, m1[q], m10[q], m10[q] / m1[q], tags.get(q, "?")))
    rows.sort(key=lambda r: -r[3])
    print(f"# scale audit: {len(shared)} shared queries "
          f"({p1} -> {p10})")
    print(f"1x total_min {sum(m1[q] for q in shared):.1f}s, "
          f"10x total_min {sum(m10[q] for q in shared):.1f}s, "
          f"aggregate ratio "
          f"{sum(m10[q] for q in shared)/sum(m1[q] for q in shared):.2f}x")
    ge = [r for r in rows if r[3] > 10.0]
    print(f"{len(ge)} queries super-linear (>10x at 10x data); "
          f"median ratio {sorted(r[3] for r in rows)[len(rows)//2]:.2f}x")
    print()
    print("| query | tag | 1x min (s) | 10x min (s) | ratio |")
    print("|---|---|---|---|---|")
    for q, a, b, r, t in rows[:top_n]:
        print(f"| `{q}` | {t} | {a:.2f} | {b:.2f} | {r:.1f}x |")
    bad = False
    for name, fs in (("1x", f1), ("10x", f10)):
        if fs:
            print(f"\nFAILURES at {name}: {fs} — a timeout at scale is a "
                  "finding; investigate before blessing the audit")
            bad = True
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
