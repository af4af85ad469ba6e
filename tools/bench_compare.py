#!/usr/bin/env python3
"""Compare two Bench JSON lines: per-query median ratios, movers > a
threshold, and the common-query median ratio — the round-end
adjudication input (bench_ab_rN.md)."""
import json
import statistics
import subprocess
import sys


def load(ref: str) -> dict:
    import os
    if ":" in ref and not os.path.exists(ref):
        return json.loads(subprocess.check_output(["git", "show", ref]))
    with open(ref) as f:
        txt = f.read().strip()
    return json.loads(txt.splitlines()[-1])


def main() -> None:
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    qo, qn = old["queries"], new["queries"]
    common = sorted(set(qo) & set(qn))
    ratios = sorted((qn[q] / qo[q], q) for q in common if qo[q] > 0)
    if not ratios:
        print("no comparable queries (empty intersection or all old times 0)")
        sys.exit(1)
    med = statistics.median(r for r, _ in ratios)
    print(f"old total {old['value']}s ({len(qo)} q)  new total {new['value']}s ({len(qn)} q)")
    print(f"common {len(common)}  median ratio {med:.3f}")
    print(f"\nnew-only: {sorted(set(qn) - set(qo))}")
    print(f"\nmovers (ratio > {thr} and new >= 0.15s):")
    for r, q in reversed(ratios):
        if r > thr and qn[q] >= 0.15:
            print(f"  {q}: {qo[q]:.3f} -> {qn[q]:.3f}  ({r:.2f}x)")
    print(f"\nimprovements (ratio < {1/thr:.2f} and old >= 0.15s):")
    for r, q in ratios:
        if r < 1 / thr and qo[q] >= 0.15:
            print(f"  {q}: {qo[q]:.3f} -> {qn[q]:.3f}  ({r:.2f}x)")


if __name__ == "__main__":
    main()
