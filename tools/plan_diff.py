#!/usr/bin/env python3
"""Round-over-round plan-fingerprint + data-volume diff for Bench artifacts.

Usage: tools/plan_diff.py <old_BENCH_full.json> <new_BENCH_full.json>

Each artifact is the 4-5-line file graft.Bench writes (detail / total /
plans / volume / rows). Tripwires:

  1. SHAPE: a query is a plan change only when the new run produced a
     shape OUTSIDE everything already adjudicated for it — the union of
     the old artifact's observed shapes (the `rows` line records BOTH
     runs' fingerprints, so AQE-multistable rows carry their flip set in
     the artifact) and the optional allowlist file
     `tools/plan_shapes.json` ({query: [fingerprints...]}, hand-extended
     when a flip is adjudicated as AQE-equivalent). Changed rows without
     a bench win (new time not at least 10% better) are flagged
     REGRESSION-RISK.
  2. VOLUME (when both artifacts carry a volume line): a query whose
     plan shape is UNCHANGED but whose shuffled bytes grew >1.5x (+1 MB
     floor) without a bench win is flagged VOLUME-RISK.
  3. STALL DISCOUNT: a host-stall window — >= 3 CONSECUTIVE rows (in
     execution order) all running > 2x their old time with unchanged
     shuffle volume — is the signature of a noisy neighbor, not a
     regression (the r12 q133-q136 incident). Rows inside a detected
     window are reported STALL-DISCOUNTED and excluded from the exit
     code; the window is printed with the rows' end timestamps and
     loadavg samples (from the `rows` line) so the adjudication is
     replayable from artifacts alone.

Exit code 1 iff any non-discounted flagged row exists.
"""
import json
import os
import sys


def load(path):
    detail, total, plans, volume, rows = {}, {}, {}, {}, {}
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
            elif d.get("metric") == "rows":
                rows = d.get("queries", {})
            elif d.get("metric") == "detail":
                detail = d.get("queries_first", {})
    return detail, total, plans, volume, rows


def shapes_of(q, plans, rows):
    """All plan shapes an artifact observed for q (set; may be empty)."""
    s = set(rows.get(q, {}).get("shapes", []))
    if q in plans:
        s.add(plans[q])
    return s


def load_allowlist():
    """Adjudicated multi-shape allowlist: {query: [fingerprints...]}.
    Looked up next to this script so the diff works from any cwd."""
    p = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "plan_shapes.json")
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return {q: set(v) for q, v in json.load(f).items()}


def stall_windows(order, old_t, new_t, old_v, new_v, min_len=3):
    """Indices (as a set of query names) inside detected stall windows:
    runs of >= min_len consecutive rows, in execution order, each > 2x
    its old time (old >= 0.2s) with shuffle volume unchanged (within
    1.5x + 1 MB both ways)."""
    def vol_same(q):
        if q not in old_v or q not in new_v:
            return True  # no volume evidence either way
        a = old_v[q].get("shuffle_mb", 0.0)
        b = new_v[q].get("shuffle_mb", 0.0)
        return b <= 1.5 * a + 1.0 and a <= 1.5 * b + 1.0

    def stalled(q):
        ot, nt = old_t.get(q), new_t.get(q)
        return (ot is not None and nt is not None and ot >= 0.2
                and nt > 2 * ot and vol_same(q))

    out, run = set(), []
    for q in order:
        if q in old_t and q in new_t:
            if stalled(q):
                run.append(q)
            else:
                if len(run) >= min_len:
                    out.update(run)
                run = []
    if len(run) >= min_len:
        out.update(run)
    return out


def main():
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    _, old_t, old_p, old_v, old_r = load(sys.argv[1])
    _, new_t, new_p, new_v, new_r = load(sys.argv[2])
    if not old_p:
        sys.exit(f"no plan fingerprints in {sys.argv[1]} (pre-tripwire artifact?)")
    if not new_p:
        sys.exit(f"no plan fingerprints in {sys.argv[2]}")
    allow = load_allowlist()
    common = sorted(set(old_p) & set(new_p))

    # execution order for the stall scan: the rows line preserves it;
    # fall back to the total line's order (also insertion-ordered)
    order = list(new_r) if new_r else list(new_t)
    stalled = stall_windows(order, old_t, new_t, old_v, new_v)
    if stalled:
        span = [q for q in order if q in stalled]
        print(f"STALL WINDOW detected ({len(span)} rows, all >2x with "
              f"unchanged volume): {', '.join(span)}")
        for q in span:
            meta = new_r.get(q, {})
            ot, nt = old_t.get(q), new_t.get(q)
            print(f"    {q}: {ot}s -> {nt}s  end_s={meta.get('end_s', '?')} "
                  f"load_1m={meta.get('load_1m', '?')}")

    changed, flagged, discounted = [], [], []
    for q in common:
        old_shapes = shapes_of(q, old_p, old_r) | allow.get(q, set())
        new_shapes = shapes_of(q, new_p, new_r)
        novel = new_shapes - old_shapes
        if not novel:
            continue
        ot, nt = old_t.get(q), new_t.get(q)
        won = ot is not None and nt is not None and nt <= 0.9 * ot
        changed.append((q, sorted(old_shapes), sorted(novel), ot, nt, won,
                        q in stalled))
        if not won:
            (discounted if q in stalled else flagged).append(q)
    print(f"{len(common)} queries compared, {len(changed)} plan changes, "
          f"{len(flagged)} without a bench win")
    for q, ops, nps, ot, nt, won, st in changed:
        mark = ("ok (faster)" if won
                else "STALL-DISCOUNTED" if st else "REGRESSION-RISK")
        print(f"  {q}: {'/'.join(ops)} -> NEW {'/'.join(nps)}  "
              f"{ot}s -> {nt}s  [{mark}]")

    # same-shape volume tripwire (volume growth is host-load-independent,
    # and a stall window requires UNCHANGED volume, so no stall discount
    # can apply here by construction)
    vol_flagged = []
    if old_v and new_v:
        for q in common:
            if q not in old_v or q not in new_v:
                continue
            if shapes_of(q, new_p, new_r) - (shapes_of(q, old_p, old_r)
                                             | allow.get(q, set())):
                continue  # shape changed: tripwire 1 owns this row
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

    if discounted:
        print(f"stall-discounted plan changes (not gating): "
              f"{', '.join(discounted)}")
    gone = sorted(set(old_p) - set(new_p))
    new_only = sorted(set(new_p) - set(old_p))
    if gone:
        print(f"dropped queries: {', '.join(gone)}")
    if new_only:
        print(f"new queries: {', '.join(new_only)}")
    sys.exit(1 if (flagged or vol_flagged) else 0)


if __name__ == "__main__":
    main()
