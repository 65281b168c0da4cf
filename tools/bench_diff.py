#!/usr/bin/env python3
"""Compare two Bench JSON lines (files containing the {"metric":...} object).

Usage: python3 tools/bench_diff.py OLD.json NEW.json [--top N]

Prints total delta, the N biggest regressions and improvements, and
queries present in only one run. Accepts either a bare JSON object file
(target/bench.json, BENCH_LOCAL_r*.json) or a log whose last
{"metric"... line is the record. Capped queries (sentinel -2.0) are
excluded from every aggregate and ranking — a cap is not a duration —
and reported separately for both runs.
"""
import argparse
import json


def load(path):
    txt = open(path).read()
    try:
        return json.loads(txt)
    except json.JSONDecodeError:
        for line in reversed(txt.splitlines()):
            if line.startswith('{"metric"'):
                return json.loads(line)
        raise SystemExit(f"no bench JSON found in {path}")


def real_times(rec):
    """Query → seconds, with capped sentinels (negative values) removed."""
    return {k: v for k, v in rec["queries"].items() if v >= 0}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--top", type=int, default=15)
    ns = ap.parse_args()
    old, new = load(ns.old), load(ns.new)
    oq, nq = real_times(old), real_times(new)
    both = sorted(set(oq) & set(nq))
    print(f"total: {old['value']:.1f}s -> {new['value']:.1f}s "
          f"({len(old['queries'])} -> {len(new['queries'])} queries)")
    shared_old = sum(oq[k] for k in both)
    shared_new = sum(nq[k] for k in both)
    ratio = f"{shared_new / shared_old:.3f}" if shared_old else "n/a"
    print(f"shared {len(both)} uncapped queries: {shared_old:.1f}s -> "
          f"{shared_new:.1f}s (ratio {ratio})")
    deltas = sorted(((nq[k] - oq[k], k) for k in both), reverse=True)
    print(f"\nbiggest regressions (of {ns.top}):")
    for d, k in deltas[:ns.top]:
        if d <= 0:
            break
        print(f"  +{d:6.2f}s  {oq[k]:6.2f} -> {nq[k]:6.2f}  {k}")
    print(f"\nbiggest improvements (of {ns.top}):")
    for d, k in sorted(deltas)[:ns.top]:
        if d >= 0:
            break
        print(f"  {d:7.2f}s  {oq[k]:6.2f} -> {nq[k]:6.2f}  {k}")
    only_new = sorted(set(nq) - set(old["queries"]))
    only_old = sorted(set(old["queries"]) - set(new["queries"]))
    if only_new:
        t = sum(nq[k] for k in only_new)
        print(f"\nnew queries ({len(only_new)}, {t:.1f}s): " + ", ".join(
            f"{k}={nq[k]:.2f}" for k in only_new))
    if only_old:
        print(f"\ndropped queries ({len(only_old)}): " + ", ".join(only_old))
    for label, rec in (("old", old), ("new", new)):
        capped = rec.get("capped") or [
            k for k, v in rec["queries"].items() if v < 0]
        if capped:
            print(f"\nCAPPED in {label} run (excluded above): {sorted(capped)}")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # e.g. piped into head
        pass
