#!/usr/bin/env python3
"""Attribute a bench regression per query: diff two bench_details.json
files (or a details file against the BASELINE.md table).

Usage:
  tools/compare_bench.py NEW.json OLD.json          # json vs json
  tools/compare_bench.py NEW.json --baseline        # json vs BASELINE.md (min of A/B)

Prints queries/prepare steps whose delta exceeds --min-delta (default
0.3 s) sorted by regression size, plus the totals. A uniform inflation
across most queries is sibling load, not a plan change; a single
query jumping alone is the real signal.
"""
import json, re, sys, pathlib

def load_baseline_table():
    md = (pathlib.Path(__file__).parent.parent / "BASELINE.md").read_text()
    out = {}
    for m in re.finditer(r"\| ([a-z_0-9]+) \| ([0-9.]+) \| ([0-9.]+) \|", md):
        out[m.group(1)] = min(float(m.group(2)), float(m.group(3)))
    return out

def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    min_delta = 0.3
    for a in sys.argv[1:]:
        if a.startswith("--min-delta="):
            min_delta = float(a.split("=")[1])
    new = json.loads(open(args[0]).read())
    newq = dict(new["queries"], **new.get("prepare_steps", {}))
    if "--baseline" in sys.argv:
        oldq = load_baseline_table()
        old_total = None
    else:
        old = json.loads(open(args[1]).read())
        oldq = dict(old["queries"], **old.get("prepare_steps", {}))
        old_total = old["value"]
    rows = []
    for k, v in newq.items():
        if k in oldq:
            rows.append((v - oldq[k], k, oldq[k], v))
    rows.sort(reverse=True)
    flagged = [r for r in rows if abs(r[0]) >= min_delta]
    print(f"total: {new['value']:.1f}s" +
          (f" (was {old_total:.1f}s)" if old_total else " vs BASELINE.md best-of-two"))
    if not flagged:
        print(f"no per-query delta >= {min_delta}s")
    for d, k, o, n in flagged:
        print(f"{'+' if d >= 0 else ''}{d:5.2f}s  {k:28s} {o:6.2f} -> {n:6.2f}")
    n_up = sum(1 for d, *_ in rows if d > 0.05)
    print(f"\n{n_up}/{len(rows)} entries slower; "
          "uniform drift = load, isolated spikes = plan regressions")
    missing = set(newq) - set(oldq)
    if missing:
        print("new entries (no old number):", ", ".join(sorted(missing)))

if __name__ == "__main__":
    main()
