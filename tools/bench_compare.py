#!/usr/bin/env python3
"""Compare two graft bench artifacts per query.

Usage: python3 tools/bench_compare.py OLD NEW [ratio_threshold]

Accepts either `target/bench.json` (written by graft.Bench) or a
driver `BENCH_r*.json` (the final JSON line is extracted from its
'tail'). Prints totals, then every query whose NEW/OLD ratio exceeds
the threshold (default 1.5) or that appears/disappears — the fast way
to tell a code regression (one query, stable across samples) from
ambient CPU-steal noise (many queries, huge intra-query spreads; see
target/bench_samples.json for per-sample evidence).
"""
import json
import re
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return d
    # driver artifact: the bench JSON line lives in the raw tail; take
    # the LAST match non-greedily (a tail can capture several runs)
    tail = (d.get("tail") or "").replace("[info] ", "")
    ms = re.findall(r'\{"metric":.*?"sf":"[^"]*"\}', tail, re.S)
    if not ms:
        sys.exit(f"{path}: no bench JSON found (parsed={d.get('parsed')})")
    return json.loads(re.sub(r"\s*\n\s*", "", ms[-1]))


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    oq, nq = old["queries"], new["queries"]
    print(f"total: {old['value']:.1f}s ({len(oq)}q) -> "
          f"{new['value']:.1f}s ({len(nq)}q)")
    rows = []
    for name in sorted(set(oq) | set(nq)):
        a, b = oq.get(name), nq.get(name)
        if a is None:
            rows.append((float("inf"), f"{name:<28} NEW {b:7.2f}s"))
        elif b is None:
            rows.append((0.0, f"{name:<28} {a:7.2f}s REMOVED"))
        elif max(a, b) > 0.3 and (b / a > thr or a / b > thr):
            # sub-0.3s-on-BOTH-sides queries are scheduling noise on
            # this host; anything that ever exceeds 0.3s is reported
            rows.append((b / a, f"{name:<28} {a:7.2f}s -> {b:7.2f}s "
                                f"({b / a:4.1f}x)"))
    for _, line in sorted(rows, key=lambda r: -r[0]):
        print(line)
    if not rows:
        print(f"no per-query change beyond {thr}x "
              f"(queries under 0.3s on both sides ignored)")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # e.g. piped into head
        sys.exit(0)
