#!/usr/bin/env python3
"""Compare two Bench JSON lines (files containing the {"metric":...} object).

Usage: python3 tools/bench_diff.py OLD.json NEW.json [--top N]

Prints total delta, the N biggest regressions and improvements, and
queries present in only one run. Accepts either a bare JSON object file
(target/bench.json, BENCH_LOCAL_r*.json) or a log whose last
{"metric"... line is the record.
"""
import json
import sys


def load(path):
    txt = open(path).read()
    try:
        return json.loads(txt)
    except json.JSONDecodeError:
        for line in reversed(txt.splitlines()):
            if line.startswith('{"metric"'):
                return json.loads(line)
        raise SystemExit(f"no bench JSON found in {path}")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    top = 15
    if "--top" in sys.argv:
        top = int(sys.argv[sys.argv.index("--top") + 1])
    old, new = load(args[0]), load(args[1])
    oq, nq = old["queries"], new["queries"]
    both = sorted(set(oq) & set(nq))
    print(f"total: {old['value']:.1f}s -> {new['value']:.1f}s "
          f"({len(oq)} -> {len(nq)} queries)")
    shared_old = sum(oq[k] for k in both)
    shared_new = sum(nq[k] for k in both)
    print(f"shared {len(both)} queries: {shared_old:.1f}s -> {shared_new:.1f}s "
          f"(ratio {shared_new / shared_old:.3f})")
    deltas = sorted(((nq[k] - oq[k], k) for k in both), reverse=True)
    print(f"\nbiggest regressions (of {top}):")
    for d, k in deltas[:top]:
        if d <= 0:
            break
        print(f"  +{d:6.2f}s  {oq[k]:6.2f} -> {nq[k]:6.2f}  {k}")
    print(f"\nbiggest improvements (of {top}):")
    for d, k in sorted(deltas)[:top]:
        if d >= 0:
            break
        print(f"  {d:7.2f}s  {oq[k]:6.2f} -> {nq[k]:6.2f}  {k}")
    only_new = sorted(set(nq) - set(oq))
    only_old = sorted(set(oq) - set(nq))
    if only_new:
        t = sum(nq[k] for k in only_new)
        print(f"\nnew queries ({len(only_new)}, {t:.1f}s): " + ", ".join(
            f"{k}={nq[k]:.2f}" for k in only_new))
    if only_old:
        print(f"\ndropped queries ({len(only_old)}): " + ", ".join(only_old))
    if new.get("capped"):
        print(f"\nCAPPED in new run: {new['capped']}")


if __name__ == "__main__":
    main()
