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

HOST-STATE NORMALIZATION (the BENCHNOTES.md recommendation): q01_agg is a
fixed-cost probe whose code never changes, so its cross-round ratio is pure
host noise. Every per-query ratio is therefore ALSO reported divided by the
rounds' q01 ratio, and the regression gate fires on the NORMALIZED number —
a round run on a 2x-loaded host no longer needs a manual code-identical
control run to dismiss uniform slowdowns. Raw ratios stay in the report.

Exit 1 on any normalized regression, 0 otherwise.
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
    ap.add_argument("--allow-host-factor", action="store_true",
                    help="do not fail when the q01 host factor itself "
                         "exceeds the threshold (contended-host runs)")
    args = ap.parse_args()

    prev, prev_total = load_queries(args.prev)
    cur, cur_total = load_queries(args.cur)

    # host-state factor: the q01 ratio (1.0 when q01 is missing either side)
    host = 1.0
    if prev.get("q01_agg", 0) > 0 and cur.get("q01_agg", 0) > 0:
        host = cur["q01_agg"] / prev["q01_agg"]
    print(f"host factor (q01 ratio): {host:.2f}x"
          + (" [unavailable, using 1.0]" if host == 1.0 and
             "q01_agg" not in cur else ""))

    regressions, improved, new = [], [], []
    for q, t in sorted(cur.items()):
        if q not in prev:
            new.append((q, t))
            continue
        p = prev[q]
        raw = t / p if p > 0 else float("inf")
        norm = raw / host
        if p > 0 and norm > args.threshold and t >= args.min_sec:
            regressions.append((q, p, t, raw, norm))
        elif t > 0 and (1.0 / norm if norm > 0 else 0) > args.threshold \
                and p >= args.min_sec:
            improved.append((q, p, t, 1.0 / norm))

    print(f"prev: {len(prev)} queries, total {prev_total:.1f}s"
          if prev_total else f"prev: {len(prev)} queries")
    print(f"cur : {len(cur)} queries, total {cur_total:.1f}s"
          if cur_total else f"cur : {len(cur)} queries")
    if new:
        print(f"\nnew queries ({len(new)}, not gated):")
        for q, t in new:
            print(f"  {q}: {t:.2f}s")
    if improved:
        print(f"\nimproved >{args.threshold}x host-normalized ({len(improved)}):")
        for q, p, t, r in improved:
            print(f"  {q}: {p:.2f}s -> {t:.2f}s ({r:.1f}x faster normalized)")
    if regressions:
        print(f"\nREGRESSED >{args.threshold}x host-normalized ({len(regressions)}):")
        for q, p, t, raw, norm in regressions:
            print(f"  {q}: {p:.2f}s -> {t:.2f}s "
                  f"({raw:.1f}x raw, {norm:.1f}x normalized)")
    else:
        print("\nno host-normalized per-query regressions")

    # The normalization is only noise-pure while shared infrastructure
    # (session conf, scan layer) is untouched: a framework-wide
    # regression slows q01 TOO and would otherwise be divided away. So
    # the host factor itself is gated — when it exceeds the threshold,
    # either the host was loaded (re-run on a quiet host, or pass
    # --allow-host-factor for a contended driver artifact) or the
    # regression is real and uniform.
    host_fail = False
    if host > args.threshold or (host > 0 and 1.0 / host > args.threshold):
        msg = (f"host factor {host:.2f}x exceeds threshold "
               f"{args.threshold}x: a UNIFORM slowdown (session conf / "
               f"scan layer) is indistinguishable from host noise here — "
               f"confirm on a quiet host")
        if args.allow_host_factor:
            print(f"\nWARNING (allowed): {msg}")
        else:
            print(f"\nFAIL: {msg}")
            host_fail = True

    # BASELINE.md SLA bookkeeping (informational)
    shared = [q for q in cur if q in prev]
    if shared and cur_total and prev_total:
        print(f"\nshared-{len(shared)}-query totals: "
              f"prev {sum(prev[q] for q in shared):.1f}s, "
              f"cur {sum(cur[q] for q in shared):.1f}s")
        print(f"per-query mean: prev {prev_total / len(prev):.2f}s, "
              f"cur {cur_total / len(cur):.2f}s")
    return 1 if regressions or host_fail else 0


if __name__ == "__main__":
    sys.exit(main())
