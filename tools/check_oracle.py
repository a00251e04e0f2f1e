#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare graft.Verify
parquet dumps against the DuckDB oracle SQL on the same sf dir.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    """Sort columns by name, then rows; normalize values for comparison."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if v is None:
            return None
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return round(v, 9)
        if isinstance(v, (list, tuple)):
            return tuple(norm(x) for x in v)
        return v

    out = [tuple(norm(r[i]) for i in idx) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return [cols[i] for i in idx], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            s_cols = [d[0] for d in spark_rel.description]
            s_rows = spark_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            n_fail += 1
            continue
        try:
            o_rel = con.execute(sql)
            o_cols = [d[0] for d in o_rel.description]
            o_rows = o_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        sc, sr = canon(s_rows, s_cols)
        oc, orr = canon(o_rows, o_cols)
        if sc != oc:
            print(f"FAIL {name}: columns differ spark={sc} oracle={oc}")
            n_fail += 1
        elif sr != orr:
            n_fail += 1
            print(f"FAIL {name}: {len(sr)} spark rows vs {len(orr)} oracle rows")
            diffs = [i for i, (a, b) in enumerate(zip(sr, orr)) if a != b]
            for i in diffs[:3]:
                print(f"  row {i}: spark={sr[i]}")
                print(f"  row {i}: oracl={orr[i]}")
            if len(sr) != len(orr):
                only_s = set(sr) - set(orr)
                only_o = set(orr) - set(sr)
                for r in list(only_s)[:3]:
                    print(f"  only-spark: {r}")
                for r in list(only_o)[:3]:
                    print(f"  only-oracle: {r}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(sr)} rows)")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
