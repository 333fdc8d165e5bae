#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each <name>.parquet result dir written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over views of the
sfDir tables, sorts columns by name + rows by value, and compares
exactly (with a float near-miss report to distinguish real bugs from
last-ulp noise).
"""
import json, math, sys
import duckdb

def norm(rows):
    return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))

def main(sf_dir, out_dir):
    con = duckdb.connect()
    import os
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        # driver testdata is one file per table; GenScale corpora are
        # Spark-written DIRECTORIES of part files — glob those
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only is not None and name not in only:
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        gcols, wcols = sorted(got.columns), sorted(want.columns)
        if gcols != wcols:
            print(f"FAIL {name}: columns {gcols} != {wcols}")
            n_fail += 1
            continue
        # The driver hashes value STRINGS, so int64 vs float64 ("1011" vs
        # "1011.0") fails its gate even when values compare numerically
        # equal. Flag dtype drift (DuckDB ceil→DOUBLE, SUM(int)→HUGEINT→
        # float) as a hard fail here too.
        # Width drift (int32 vs int64) strs identically; only KIND drift
        # (int vs float vs object/bool/datetime) changes the string.
        dt = [(c, str(got[c].dtype), str(want[c].dtype)) for c in gcols
              if got[c].dtype.kind != want[c].dtype.kind]
        if dt:
            print(f"FAIL {name}: dtype drift (spark vs oracle): {dt}")
            n_fail += 1
            continue
        g = norm(got[gcols].values.tolist())
        w = norm(want[wcols].values.tolist())
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            n_fail += 1
            continue
        bad = None
        near = 0
        for i, (gr, wr) in enumerate(zip(g, w)):
            for j, (a, b) in enumerate(zip(gr, wr)):
                if a is None and b is None:
                    continue
                eq = (a == b)
                try:
                    if not eq and isinstance(a, float) and isinstance(b, float):
                        if math.isnan(a) and math.isnan(b):
                            eq = True
                        elif b != 0 and abs(a - b) / abs(b) < 1e-9:
                            near += 1
                            eq = True  # near-match: still counts as fail overall
                except Exception:
                    pass
                if not eq and bad is None:
                    bad = (i, gcols[j], a, b)
        if bad is None and near == 0:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        elif bad is None:
            print(f"NEAR {name}: {near} float near-misses (<1e-9 rel) — would FAIL exact hash")
            n_fail += 1
        else:
            i, c, a, b = bad
            print(f"FAIL {name}: row {i} col {c}: got={a!r} want={b!r}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
