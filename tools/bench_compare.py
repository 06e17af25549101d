"""Compare the current bench_full.json against a prior round's
BENCH_r{N}.json (or another bench_full.json): per-query ratios over the
common set, median ratio, worst offenders, and the new-query cost — the
drift-attribution arithmetic BENCH_NOTES entries are written from.

Usage: python tools/bench_compare.py [old.json] [new.json]
"""

from __future__ import annotations

import json
import sys


def _queries(path: str) -> dict[str, float]:
    d = json.load(open(path))
    q = d.get("queries", d)
    return {k: v for k, v in q.items() if isinstance(v, (int, float)) and v >= 0}


def main() -> None:
    old_p = sys.argv[1] if len(sys.argv) > 1 else "BENCH_r09.json"
    new_p = sys.argv[2] if len(sys.argv) > 2 else "bench_full.json"
    old, new = _queries(old_p), _queries(new_p)
    common = sorted(set(old) & set(new))
    ratios = sorted(
        ((new[k] / old[k] if old[k] > 0 else float("inf"), k) for k in common)
    )
    med = ratios[len(ratios) // 2][0] if ratios else float("nan")
    added = sorted(set(new) - set(old), key=lambda k: -new[k])
    print(f"common={len(common)} median_ratio={med:.3f}")
    print(f"old_total={sum(old[k] for k in common):.1f}s "
          f"new_total={sum(new[k] for k in common):.1f}s (common set)")
    print("worst 8 (ratio, new_s, old_s):")
    for r, k in ratios[-8:][::-1]:
        print(f"  {k:36s} {r:5.2f}  {new[k]:7.2f}s  {old[k]:7.2f}s")
    print("best 5:")
    for r, k in ratios[:5]:
        print(f"  {k:36s} {r:5.2f}  {new[k]:7.2f}s  {old[k]:7.2f}s")
    print(f"new queries ({len(added)}), total "
          f"{sum(new[k] for k in added):.1f}s:")
    for k in added:
        print(f"  {k:36s} {new[k]:7.2f}s")


if __name__ == "__main__":
    main()
