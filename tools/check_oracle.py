#!/usr/bin/env python3
"""Dev-only oracle checker mimicking the driver's DuckDB compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: load the Spark parquet result, run the
oracle SQL from oracle_sql.json in DuckDB (tables = <sfDir>/*.parquet views),
sort columns by name and rows by all columns, compare values.
"""
import json, math, sys
import duckdb

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
                if v == -0.0: v = 0.0
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [c for c in sorted(cols)], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            gcols, grows = canon(got.fetchall(), got.columns)
            want = con.sql(sql)
            wcols, wrows = canon(want.fetchall(), want.columns)
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        # The driver fetches DuckDB results via pandas, where HUGEINT
        # (e.g. any uncast SUM over BIGINT) becomes float64 and its
        # formatted value ("9549.0" vs Spark's "9549") hash-mismatches
        # even when ==-compare passes. Native fetchall() hides this, so
        # lint the oracle's declared types explicitly (the 4-round
        # q252/q282 red, root-caused in round 14).
        hug = [c for c, t in zip(want.columns, want.types)
               if "HUGEINT" in str(t).upper()]
        if hug:
            print(f"FAIL {name}: HUGEINT oracle columns {hug} — pandas "
                  f"renders these float64; CAST them to BIGINT")
            n_fail += 1
        elif gcols != wcols:
            print(f"FAIL {name}: columns {gcols} != {wcols}")
            n_fail += 1
        elif grows != wrows:
            diff = [(a, b) for a, b in zip(grows, wrows) if a != b][:3]
            extra = f" first diffs: {diff}" if len(grows) == len(wrows) else ""
            print(f"FAIL {name}: {len(grows)} vs {len(wrows)} rows;{extra}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(grows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
