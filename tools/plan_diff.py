#!/usr/bin/env python3
"""Round-over-round plan-fingerprint + data-volume diff for Bench artifacts.

Usage: tools/plan_diff.py <old_BENCH_full.json> <new_BENCH_full.json>

Each artifact is the 3-4-line file graft.Bench writes (detail / total /
plans / volume). Two tripwires:

  1. SHAPE: a query whose plan fingerprint changed between rounds is
     listed with its best-of-2 times; rows whose plan changed WITHOUT a
     bench win (new time not at least 10% better) are flagged
     REGRESSION-RISK — the cases where a broadcast was silently lost or
     an exchange crept in.
  2. VOLUME (when both artifacts carry a volume line): a query whose
     plan shape is UNCHANGED but whose shuffled bytes grew >1.5x (+1 MB
     floor, so tiny rows don't trip on noise) without a bench win is
     flagged VOLUME-RISK — the same-shape regressions a fingerprint
     can't see (a filter that stopped pruning, a partial agg that
     stopped combining).

Exit code 1 iff any flagged row exists, so a round script can gate on it.
"""
import json
import sys


def load(path):
    detail, total, plans, volume = {}, {}, {}, {}
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
            elif d.get("metric") == "volume":
                volume = d.get("queries", {})
            elif d.get("metric") == "detail":
                detail = d.get("queries_first", {})
    return detail, total, plans, volume


def main():
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    _, old_t, old_p, old_v = load(sys.argv[1])
    _, new_t, new_p, new_v = load(sys.argv[2])
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

    # same-shape volume tripwire
    vol_flagged = []
    if old_v and new_v:
        for q in common:
            if old_p[q] != new_p[q] or q not in old_v or q not in new_v:
                continue
            os_, ns = old_v[q].get("shuffle_mb", 0.0), new_v[q].get("shuffle_mb", 0.0)
            if ns > 1.5 * os_ + 1.0:
                ot, nt = old_t.get(q), new_t.get(q)
                won = ot is not None and nt is not None and nt <= 0.9 * ot
                mark = "ok (faster)" if won else "VOLUME-RISK"
                if not won:
                    vol_flagged.append(q)
                print(f"  {q}: shuffle {os_:.2f} MB -> {ns:.2f} MB "
                      f"(same plan)  {ot}s -> {nt}s  [{mark}]")
        print(f"volume: {len(vol_flagged)} same-shape shuffle growths "
              f"without a bench win")

    gone = sorted(set(old_p) - set(new_p))
    new_only = sorted(set(new_p) - set(old_p))
    if gone:
        print(f"dropped queries: {', '.join(gone)}")
    if new_only:
        print(f"new queries: {', '.join(new_only)}")
    sys.exit(1 if (flagged or vol_flagged) else 0)


if __name__ == "__main__":
    main()
