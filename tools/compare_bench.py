#!/usr/bin/env python3
"""Diff two graft.Bench full artifacts (driver-side analysis tool).

Usage: python3 tools/compare_bench.py <base.json> <new.json> [--ratio-floor R]

Prints per-query ratios (new/base) for the common query set, the slowest
queries of the new run, and flags ratios above --ratio-floor (default 1.5).
Reads only the artifact JSON — no Spark, no network. Used for
round-over-round regression triage and for the 1x-vs-10x scale audit
(VERDICT r8 item #6), where the interesting number is how far below the
data factor each query's time ratio sits.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    floor = 1.5
    for a in sys.argv[1:]:
        if a.startswith("--ratio-floor"):
            floor = float(a.split("=", 1)[1])
    base, new = load(args[0]), load(args[1])
    bq, nq = base["queries"], new["queries"]
    common = sorted(set(bq) & set(nq))
    only_base = sorted(set(bq) - set(nq))
    only_new = sorted(set(nq) - set(bq))

    ratios = []
    for q in common:
        b, n = bq[q], nq[q]
        if b <= 0 or n <= 0:  # -1 sentinel = failed run
            print(f"!! {q}: failed run (base={b}, new={n})")
            continue
        ratios.append((n / b, q, b, n))

    ratios.sort(reverse=True)
    med = sorted(r[0] for r in ratios)[len(ratios) // 2]
    tot_b = sum(r[2] for r in ratios)
    tot_n = sum(r[3] for r in ratios)
    print(f"common={len(common)}  median_ratio={med:.2f}  "
          f"total {tot_b:.1f}s -> {tot_n:.1f}s ({tot_n / tot_b:.2f}x)")

    # Contention-normalized comparison (VERDICT r10 item #3): each sweep's
    # control series (a fixed q01-shape query run throughout) measures how
    # fast THIS box was DURING THAT sweep; dividing every query time by
    # the sweep-median control (warmup sample at index 0 dropped) cancels
    # a uniformly slower/noisier host, so round deltas survive a noisy box.
    def ctrl_median(art):
        samples = sorted(c["sec"] for c in art.get("control", [])[1:])
        return samples[len(samples) // 2] if samples else None
    cb, cn = ctrl_median(base), ctrl_median(new)
    if cb and cn:
        norm = tot_n / cn / (tot_b / cb)
        print(f"control medians: base={cb:.3f}s new={cn:.3f}s  "
              f"contention-normalized total ratio: {norm:.2f}x "
              f"(raw {tot_n / tot_b:.2f}x)")
    if only_base:
        print(f"only in base: {', '.join(only_base)}")
    if only_new:
        print(f"only in new:  {', '.join(only_new)}")

    print(f"\n-- ratios above {floor} (new/base) --")
    for r, q, b, n in ratios:
        if r >= floor:
            runs = new.get("runs", {}).get(q)
            print(f"{q:32s} {b:8.3f} -> {n:8.3f}  x{r:5.2f}  runs={runs}")

    print("\n-- 12 slowest in new run --")
    for q in sorted(common, key=lambda q: -nq[q])[:12]:
        r = nq[q] / bq[q] if bq[q] > 0 else float("nan")
        print(f"{q:32s} {nq[q]:8.3f}  (x{r:5.2f} vs base)")

    ctrl = new.get("control")
    if ctrl:
        line = ", ".join(f"{c['after'] or 'start'}:{c['sec']:.2f}" for c in ctrl)
        print(f"\ncontrol series: {line}")


if __name__ == "__main__":
    main()
