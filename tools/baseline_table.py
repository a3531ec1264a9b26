#!/usr/bin/env python3
"""Format BASELINE.md per-query / prepare / recall tables from two
bench_details.json runs: `baseline_table.py runA.json runB.json`."""
import json
import sys


def main() -> None:
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    print(f"run A total {a['value']} prepare {a['prepare']} "
          f"loads {a['load1_start']}/{a['load1_end']}")
    print(f"run B total {b['value']} prepare {b['prepare']} "
          f"loads {b['load1_start']}/{b['load1_end']}")
    print("\n| query | run A (s) | run B (s) |\n|---|---|---|")
    for k in sorted(set(a["queries"]) | set(b["queries"])):
        va, vb = a["queries"].get(k), b["queries"].get(k)
        fa = "—" if va is None else f"{va:.2f}"
        fb = "—" if vb is None else f"{vb:.2f}"
        print(f"| {k} | {fa} | {fb} |")
    print("\n| step | run A (s) | run B (s) |\n|---|---|---|")
    for k in a["prepare_steps"]:
        print(f"| {k} | {a['prepare_steps'][k]:.2f} | "
              f"{b['prepare_steps'].get(k, float('nan')):.2f} |")
    print("\n| variant | recall@3 run A | run B |\n|---|---|---|")
    for k in a.get("recall_at_3", {}):
        print(f"| {k} | {a['recall_at_3'][k]:.3f} | "
              f"{b['recall_at_3'].get(k, float('nan')):.3f} |")


if __name__ == "__main__":
    main()
