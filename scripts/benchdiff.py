#!/usr/bin/env python3
"""Compare two Bench JSON lines (e.g. BENCH_r1.json vs a fresh run).

Usage: python3 scripts/benchdiff.py <old.json> <new.json> [threshold_pct]

Prints total delta and per-query regressions beyond the threshold
(default 50%), ignoring sub-200ms noise. Exit 1 if the new total exceeds
2x the old total (the driver's gate).
"""
import json
import sys


def load(path):
    text = open(path).read().strip()
    # tolerate sbt "[info] " prefixes if the raw log line was saved
    if "{" in text:
        text = text[text.index("{"):]
    return json.loads(text)


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 50.0
    print(f"total: {old['value']:.1f}s -> {new['value']:.1f}s "
          f"({(new['value'] / old['value'] - 1) * 100:+.0f}%)")
    regressions = []
    for k, nv in sorted(new["queries"].items()):
        ov = old["queries"].get(k)
        if ov is None:
            print(f"  [new]      {k}: {nv:.2f}s")
            continue
        if nv > 0.2 and ov > 0 and (nv / ov - 1) * 100 > thresh:
            regressions.append((k, ov, nv))
    for k, ov, nv in sorted(regressions, key=lambda t: t[2] - t[1], reverse=True):
        print(f"  [regressed] {k}: {ov:.2f}s -> {nv:.2f}s")
    for k in sorted(set(old["queries"]) - set(new["queries"])):
        print(f"  [removed]  {k}")
    if new["value"] > 2 * old["value"]:
        print("FAIL: new total exceeds 2x the recorded baseline")
        sys.exit(1)


if __name__ == "__main__":
    main()
