#!/usr/bin/env python3
"""Compare two graft bench records (full target/bench.json lines):
prints a markdown table of per-entry seconds sorted by the first
record's time, with the delta. Dotted phase entries are skipped.
Usage: bench_compare.py BASE.json AFTER.json [min_seconds]
"""
import json
import sys


def load(path):
    d = json.load(open(path))
    return {k: v for k, v in d["queries"].items()
            if "." not in k and v >= 0}, d


def main():
    base, bd = load(sys.argv[1])
    after, ad = load(sys.argv[2])
    floor = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0
    rows = sorted(base.items(), key=lambda kv: -kv[1])
    print(f"| entry | {sys.argv[1]} | {sys.argv[2]} | delta |")
    print("|---|---|---|---|")
    tb = ta = 0.0
    for k, v in rows:
        a = after.get(k)
        if a is None:
            print(f"| {k} | {v:.2f} | MISSING | |")
            continue
        tb += v
        ta += a
        if max(v, a) < floor:
            continue
        print(f"| {k} | {v:.2f} | {a:.2f} | {a - v:+.2f} |")
    new = set(after) - set(base)
    for k in sorted(new):
        print(f"| {k} (new) | | {after[k]:.2f} | |")
    print(f"\ntotal (shared entries): {tb:.1f} -> {ta:.1f}")
    print(f"env base: {bd['env']}\nenv after: {ad['env']}")


if __name__ == "__main__":
    main()
