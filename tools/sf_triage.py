#!/usr/bin/env python3
"""Scale-run triage: enumerate every row whose sfN/sf0.1 time ratio
exceeds the data factor (super-linear), plus errors and the run's host
context — the table BENCH_sf1.md / BENCH_sf3.md MUST contain (the r12
lesson: a triage written against a different run than the archived
artifact is self-inconsistent evidence).

Usage: tools/sf_triage.py <BENCH_full_1x.json> <BENCH_full_Nx.json> <N>
Prints a markdown table of rows with ratio > N (sorted desc), the run's
loadavg, total ratio, and any errored rows. Exit 0 always (reporting,
not gating).
"""
import json
import sys


def load(path):
    total, host, errors, refused = {}, {}, [], []
    for line in open(path):
        line = line.strip()
        if not line:
            continue
        d = json.loads(line)
        if d.get("metric") == "total":
            total = d.get("queries", {})
            host = d.get("host", {})
            refused = d.get("refused", [])
        elif d.get("metric") == "detail":
            errors = d.get("errors", [])
    return total, host, errors, refused


def main():
    if len(sys.argv) != 4:
        sys.exit(__doc__)
    base_t, base_h, base_e, base_r = load(sys.argv[1])
    big_t, big_h, big_e, big_r = load(sys.argv[2])
    n = float(sys.argv[3])
    print(f"base: total={sum(base_t.values()):.1f}s "
          f"loadavg_15m={base_h.get('loadavg_15m', '?')} errors={base_e} "
          f"refused={base_r}")
    print(f"{n:g}x:  total={sum(big_t.values()):.1f}s "
          f"loadavg_15m={big_h.get('loadavg_15m', '?')} errors={big_e} "
          f"refused={big_r}")
    if big_r:
        print(f"\ncontract refusals at {n:g}x (documented operator "
              f"behavior, not errors): {', '.join(big_r)}")
    common = sorted(set(base_t) & set(big_t))
    rows = []
    for q in common:
        if base_t[q] <= 0:
            continue
        r = big_t[q] / base_t[q]
        if r > n:
            rows.append((r, q, base_t[q], big_t[q]))
    rows.sort(reverse=True)
    print(f"\n{len(rows)} rows super-linear (ratio > {n:g}x) "
          f"of {len(common)} compared:\n")
    print("| row | 1x -> Nx | ratio | verdict |")
    print("|---|---|---|---|")
    for r, q, a, b in rows:
        print(f"| {q} | {a:.2f} -> {b:.2f} s | {r:.1f}x | TODO |")
    only_big = sorted(set(big_t) - set(base_t))
    if only_big:
        print(f"\nrows only in the Nx artifact: {', '.join(only_big)}")


if __name__ == "__main__":
    main()
