#!/usr/bin/env python3
"""Dev-only harness mirroring the driver's correctness gate: reads the
parquet dumps written by `graft.Verify`, runs each oracle SQL in DuckDB over
the same testdata tables, and compares values (columns sorted by name, rows
as emitted). Not part of the shipped engine.

Usage: python3 tools/local_verify.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

    n_pass = n_fail = n_rowsonly = 0
    for qdir in sorted(glob.glob(os.path.join(out_dir, "q*"))):
        qname = os.path.basename(qdir)
        try:
            spark_rows = con.execute(
                f"SELECT * FROM '{qdir}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {qname}: cannot read spark output: {e}")
            n_fail += 1
            continue
        if qname not in oracles:
            print(f"ROWS-ONLY {qname}: {len(spark_rows)} rows")
            n_rowsonly += 1
            continue
        try:
            duck_rows = con.execute(oracles[qname]).fetchdf()
        except Exception as e:
            print(f"FAIL {qname}: oracle error: {e}")
            n_fail += 1
            continue
        s = spark_rows[sorted(spark_rows.columns)]
        d = duck_rows[sorted(duck_rows.columns)]
        if sorted(s.columns) != sorted(d.columns):
            print(f"FAIL {qname}: columns {sorted(s.columns)} vs {sorted(d.columns)}")
            n_fail += 1
            continue
        if len(s) != len(d):
            print(f"FAIL {qname}: rows {len(s)} vs {len(d)}")
            n_fail += 1
            continue
        mism = []
        for c in s.columns:
            sv, dv = list(s[c]), list(d[c])
            for i, (a, b) in enumerate(zip(sv, dv)):
                ax = None if (a != a) else a  # NaN→None
                bx = None if (b != b) else b
                if isinstance(ax, float) and isinstance(bx, float):
                    if ax != bx:
                        mism.append((c, i, ax, bx))
                elif ax is None and bx is None:
                    pass
                elif str(ax) != str(bx):
                    mism.append((c, i, ax, bx))
                if len(mism) > 3:
                    break
            if len(mism) > 3:
                break
        if mism:
            print(f"FAIL {qname}: {len(s)} rows, mismatches (col,row,spark,duck): {mism[:4]}")
            n_fail += 1
        else:
            print(f"PASS {qname}: {len(s)} rows")
            n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main())
