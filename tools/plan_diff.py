#!/usr/bin/env python3
"""Round-over-round plan-fingerprint diff for Bench artifacts.

Usage: tools/plan_diff.py <old_BENCH_full.json> <new_BENCH_full.json>

Each artifact is the 3-line file graft.Bench writes (detail / total /
plans). A query whose plan fingerprint changed between rounds is listed
with its best-of-2 times; rows whose plan changed WITHOUT a bench win
(new time not at least 10% better) are flagged REGRESSION-RISK — the
cases where a broadcast was silently lost or an exchange crept in.
Exit code 1 iff any flagged row exists, so a round script can gate on it.
"""
import json
import sys


def load(path):
    detail, total, plans = {}, {}, {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            d = json.loads(line)
            if d.get("metric") == "total":
                total = d.get("queries", {})
            elif d.get("metric") == "plans":
                plans = d.get("fingerprints", {})
            elif d.get("metric") == "detail":
                detail = d.get("queries_first", {})
    return detail, total, plans


def main():
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    _, old_t, old_p = load(sys.argv[1])
    _, new_t, new_p = load(sys.argv[2])
    if not old_p:
        sys.exit(f"no plan fingerprints in {sys.argv[1]} (pre-tripwire artifact?)")
    if not new_p:
        sys.exit(f"no plan fingerprints in {sys.argv[2]}")
    common = sorted(set(old_p) & set(new_p))
    changed, flagged = [], []
    for q in common:
        if old_p[q] == new_p[q]:
            continue
        ot, nt = old_t.get(q), new_t.get(q)
        won = ot is not None and nt is not None and nt <= 0.9 * ot
        changed.append((q, old_p[q], new_p[q], ot, nt, won))
        if not won:
            flagged.append(q)
    print(f"{len(common)} queries compared, {len(changed)} plan changes, "
          f"{len(flagged)} without a bench win")
    for q, op, np_, ot, nt, won in changed:
        mark = "ok (faster)" if won else "REGRESSION-RISK"
        print(f"  {q}: {op} -> {np_}  {ot}s -> {nt}s  [{mark}]")
    gone = sorted(set(old_p) - set(new_p))
    new_only = sorted(set(new_p) - set(old_p))
    if gone:
        print(f"dropped queries: {', '.join(gone)}")
    if new_only:
        print(f"new queries: {', '.join(new_only)}")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
