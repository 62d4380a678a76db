#!/usr/bin/env python3
"""Per-query bench regression gate.

Usage: python3 tools/bench_diff.py <prev_bench.json> <cur_bench.json>
       [--threshold 2.0] [--min-sec 1.0]

Compares two `graft.Bench` JSON artifacts (docs/bench_r{N}.json). A query
regresses when cur/prev > threshold AND cur >= min-sec (sub-second queries
are scheduling noise, not plans). New queries (absent from prev) are listed
informationally, never failed — the allowlist is implicit. Also reports the
two BASELINE.md SLA numbers: the frozen round-1 49-query subset total and
the per-query normalization.

Exit 1 on any regression, 0 otherwise.
"""
import argparse
import json

import sys


def load_queries(path):
    d = json.load(open(path))
    if "queries" in d and d["queries"]:
        return d["queries"], d.get("value")
    # driver BENCH_r{N}.json wraps the bench line inside a "tail" string
    tail = d.get("tail", "")
    start = tail.find('{"metric"')
    if start >= 0:
        inner, _ = json.JSONDecoder().raw_decode(tail[start:])
        if inner.get("queries"):
            return inner["queries"], inner.get("value")
    raise SystemExit(f"cannot find a queries map in {path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("prev")
    ap.add_argument("cur")
    ap.add_argument("--threshold", type=float, default=2.0)
    ap.add_argument("--min-sec", type=float, default=1.0)
    args = ap.parse_args()

    prev, prev_total = load_queries(args.prev)
    cur, cur_total = load_queries(args.cur)

    regressions, improved, new = [], [], []
    for q, t in sorted(cur.items()):
        if q not in prev:
            new.append((q, t))
            continue
        p = prev[q]
        if p > 0 and t / p > args.threshold and t >= args.min_sec:
            regressions.append((q, p, t, t / p))
        elif t > 0 and p / t > args.threshold and p >= args.min_sec:
            improved.append((q, p, t, p / t))

    print(f"prev: {len(prev)} queries, total {prev_total:.1f}s"
          if prev_total else f"prev: {len(prev)} queries")
    print(f"cur : {len(cur)} queries, total {cur_total:.1f}s"
          if cur_total else f"cur : {len(cur)} queries")
    if new:
        print(f"\nnew queries ({len(new)}, not gated):")
        for q, t in new:
            print(f"  {q}: {t:.2f}s")
    if improved:
        print(f"\nimproved >{args.threshold}x ({len(improved)}):")
        for q, p, t, r in improved:
            print(f"  {q}: {p:.2f}s -> {t:.2f}s ({r:.1f}x faster)")
    if regressions:
        print(f"\nREGRESSED >{args.threshold}x ({len(regressions)}):")
        for q, p, t, r in regressions:
            print(f"  {q}: {p:.2f}s -> {t:.2f}s ({r:.1f}x slower)")
    else:
        print("\nno per-query regressions")

    # BASELINE.md SLA bookkeeping (informational)
    shared = [q for q in cur if q in prev]
    if shared and cur_total and prev_total:
        print(f"\nshared-{len(shared)}-query totals: "
              f"prev {sum(prev[q] for q in shared):.1f}s, "
              f"cur {sum(cur[q] for q in shared):.1f}s")
        print(f"per-query mean: prev {prev_total / len(prev):.2f}s, "
              f"cur {cur_total / len(cur):.2f}s")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
